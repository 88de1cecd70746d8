package graft

import graft.sim.AnnIndex
import org.apache.spark.sql.functions._

/** IVF-PQ index persistence: registry round trip must be lossless and
  * searching with a reloaded index must be BIT-identical to the
  * in-session fit (float32 round-trips parquet exactly; assignment is
  * SQL argmin over literal centroids on both paths). */
class AnnIndexSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, TinySf)

  test("registry round trip is lossless: load(save(index)) == index") {
    val root = java.nio.file.Files.createTempDirectory("ann-spec").toString
    val idx = AnnIndex.train(emb)
    val v = AnnIndex.save(spark, idx, root, "ivfpq")
    assert(v == 1L)
    val back = AnnIndex.load(spark, root, "ivfpq")
    assert(back == idx, "reloaded index differs from the saved one")
    // versions are monotone; latest wins
    assert(AnnIndex.save(spark, idx, root, "ivfpq") == 2L)
    assert(AnnIndex.load(spark, root, "ivfpq") == idx)
  }

  test("search with a reloaded index is bit-identical to the in-session fit") {
    val root = java.nio.file.Files.createTempDirectory("ann-spec").toString
    val out = AnnIndex.reloadParity(emb, root).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty, "reload-parity search returned no rows")
      assert(rows.forall(_.getAs[Long]("reload_mismatches") == 0L),
        "reloaded index returned different neighbors/scores than the live fit")
      assert(rows.forall(_.getAs[Long]("index_version") == 1L))
      // every query got a full top-k
      val perQuery = out.groupBy("query_id").count().collect()
      assert(perQuery.forall(_.getLong(1) == 10L),
        s"expected 10 neighbors per query, got ${perQuery.map(_.getLong(1)).toSeq}")
    } finally out.unpersist(blocking = false)
  }

  test("slot parity counts a TRUNCATED reload as mismatches (full-outer, not inner)") {
    import spark.implicits._
    val live = Seq((1L, 1, 10L, 0.9), (1L, 2, 11L, 0.8), (1L, 3, 12L, 0.7))
      .toDF("query_id", "rank", "live_vec", "live_sim")
    val full = Seq((1L, 1, 10L, 0.9), (1L, 2, 11L, 0.8), (1L, 3, 12L, 0.7))
      .toDF("query_id", "rank", "vec_id", "cos_sim")
    assert(AnnIndex.slotMismatches(live, full) == 0L)
    // a reload that silently drops the tail slot: 1 mismatch, not 0
    assert(AnnIndex.slotMismatches(live, full.filter(col("rank") < 3)) == 1L)
    // and a reload that returns EXTRA slots the live search lacks
    val extra = full.union(Seq((1L, 4, 13L, 0.6)).toDF("query_id", "rank", "vec_id", "cos_sim"))
    assert(AnnIndex.slotMismatches(live, extra) == 1L)
    // a same-shape wrong neighbor still counts
    val wrong = full.withColumn("vec_id",
      when(col("rank") === 2, lit(99L)).otherwise(col("vec_id")))
    assert(AnnIndex.slotMismatches(live, wrong) == 1L)
  }

  test("quantizer fits are shared per (dataset, params): one coarse + one codebook fit serve every keyed ANN query") {
    import graft.sim.Similarity
    val key = Some(s"ann-shared-test:$TinySf")
    val coarse0 = Similarity.coarseShared.size
    val cb0 = Similarity.codebookShared.size
    // the four queries that share the artifact in Bench/Verify
    Similarity.knnIvf(emb, cacheKey = key).write.format("noop").mode("overwrite").save()
    Similarity.knnPq(emb, cacheKey = key).write.format("noop").mode("overwrite").save()
    Similarity.knnIvfPq(emb, cacheKey = key).write.format("noop").mode("overwrite").save()
    val idx = AnnIndex.train(emb, cacheKey = key)
    // one coarse entry (nlist=16) and one codebook entry (8x16) TOTAL
    assert(Similarity.coarseShared.size == coarse0 + 1,
      s"expected exactly one new coarse fit, cache grew by ${Similarity.coarseShared.size - coarse0}")
    assert(Similarity.codebookShared.size == cb0 + 1,
      s"expected exactly one new codebook fit, cache grew by ${Similarity.codebookShared.size - cb0}")
    // and the index is built from the SAME shared artifacts (bit-equal)
    val centKey = Similarity.coarseShared.keys.find(_._1 == key.get).get
    assert(idx.centroids == Similarity.coarseShared(centKey).clusterCenters
      .toIndexedSeq.map(_.toArray.toSeq.map(_.toFloat)))
  }

  test("incremental append: base+delta store searches bit-identically to a from-scratch union encode") {
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val delta = emb.filter(col("vec_id") % 4 === 3)
    val idx = AnnIndex.train(base)
    val incr = java.nio.file.Files.createTempDirectory("ann-incr").toString
    AnnIndex.buildEncoded(base, idx, incr)
    AnnIndex.appendEncoded(delta, idx, incr)
    val scratch = java.nio.file.Files.createTempDirectory("ann-scratch").toString
    AnnIndex.buildEncoded(emb, idx, scratch)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "vec_id", "label", "cos_sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          String.valueOf(r.get(3)), r.getDouble(4))).sortBy(t => (t._1, t._2))

    val viaAppend = rows(AnnIndex.searchEncoded(spark, incr, idx))
    val viaScratch = rows(AnnIndex.searchEncoded(spark, scratch, idx))
    assert(viaAppend.nonEmpty)
    assert(viaAppend.toSeq == viaScratch.toSeq,
      "appended store diverged from the from-scratch union encode")
    // the stored plan equals the in-memory encode of the same union
    val viaLive = rows(AnnIndex.search(emb, idx))
    assert(viaAppend.toSeq == viaLive.toSeq,
      "materialized store diverged from the in-session encode")
    // appended vectors are actually retrievable as neighbors
    assert(viaAppend.exists(_._3 % 4 == 3),
      "no delta vector ever surfaced in the top-k — append is inert")
  }

  test("index search preserves IVF-PQ recall vs brute force") {
    val idx = AnnIndex.train(emb)
    val golden = graft.sim.Similarity.knnBrute(emb)
      .select(col("query_id"), col("vec_id"))
    val got = AnnIndex.search(emb, idx).select(col("query_id"), col("vec_id"))
    val hits = got.join(golden, Seq("query_id", "vec_id")).count()
    val total = golden.count()
    val recall = hits.toDouble / total
    // same floor family as FunctionsSpec's ivfpq row (0.76 measured)
    assert(recall >= 0.5, f"index-search recall@10 $recall%.2f below floor 0.5")
  }
}
