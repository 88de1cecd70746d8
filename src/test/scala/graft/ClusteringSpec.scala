package graft

import graft.sim.Clustering
import org.apache.spark.sql.functions._

/** Invariant binds for the rows-only cluster-map queries
  * (q_kmeans_clusters, q_sample_balanced): learned centroids are
  * engine-local, so instead of a DuckDB oracle the spec proves the
  * properties that make the cluster map trustworthy as a curation
  * substrate — assignment is a true argmin, the cells partition the
  * corpus, the balanced sample fills each cell's quota exactly, and the
  * whole construction is deterministic across reruns and repartitions. */
class ClusteringSpec extends SparkSpec {

  private val Nlist = 16
  private def emb = Tables.embeddings(spark, TinySf)

  test("cells partition the corpus: profile sizes sum to the row count") {
    val total = emb.count()
    val prof = Clustering.profile(emb, Nlist).cache()
    try {
      val rows = prof.collect()
      assert(rows.map(_.getAs[Long]("n")).sum == total,
        "per-cell sizes must sum to the corpus size (every row in exactly one cell)")
      assert(rows.length <= Nlist)
      val cells = rows.map(_.getAs[Long]("cell"))
      assert(cells.distinct.length == cells.length, "duplicate cell rows")
      assert(cells.forall(c => c >= 0 && c < Nlist))
      // dispersion sanity: mean <= max, both non-negative
      assert(rows.forall(r => r.getAs[Double]("mean_dist2") >= 0.0 &&
        r.getAs[Double]("mean_dist2") <= r.getAs[Double]("max_dist2") + 1e-12))
    } finally prof.unpersist(blocking = false)
  }

  test("assignment is argmin over ALL centroids, for every row") {
    val assigned = Clustering.assignments(emb, Nlist)
    // recompute each row's distance to EVERY centroid independently of the
    // assignment path and take the min; the assigned dist2 must equal it
    // (equality of the MINIMUM is the argmin property — KMeans tie-breaks
    // are then irrelevant)
    val nv = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE) / " +
        "sqrt(aggregate(zip_with(embedding, embedding, (a,b) -> " +
        "CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0D, (acc,x) -> acc + x)))")
        .as("nv"))
    val best = nv.crossJoin(broadcast(Clustering.centroids(emb, Nlist)))
      .withColumn("d", expr("aggregate(zip_with(nv, centroid, " +
        "(x,y) -> (x - y) * (x - y)), 0D, (acc,x) -> acc + x)"))
      .groupBy("vec_id").agg(min("d").as("d_min"))
    val joined = assigned.join(best, "vec_id").cache()
    try {
      assert(joined.count() == emb.count())
      val bad = joined.filter(abs(col("dist2") - col("d_min")) > 1e-9).count()
      assert(bad == 0L,
        "some row was assigned to a cell that is not its nearest centroid")
    } finally joined.unpersist(blocking = false)
  }

  test("balanced sample fills min(quota, |cell|) exactly and is a subset") {
    val quota = 25
    val sizes = Clustering.profile(emb, Nlist)
      .select("cell", "n").collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n")).toMap
    val samp = Clustering.balancedSample(emb, Nlist, quota).cache()
    try {
      val got = samp.groupBy("cell").count().collect()
        .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("count")).toMap
      sizes.foreach { case (cell, n) =>
        assert(got.getOrElse(cell, 0L) == math.min(quota.toLong, n),
          s"cell $cell: expected min($quota, $n), got ${got.getOrElse(cell, 0L)}")
      }
      // subset of the corpus, no duplicated vec_id
      val ids = samp.select("vec_id").collect().map(_.getLong(0))
      assert(ids.distinct.length == ids.length)
      val known = emb.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(ids.forall(known))
      // ranks are 1..count within each cell
      val ranks = samp.groupBy("cell")
        .agg(min("samp_rank").as("lo"), max("samp_rank").as("hi"),
          count(lit(1)).as("c")).collect()
      assert(ranks.forall(r => r.getAs[Long]("lo") == 1L &&
        r.getAs[Long]("hi") == r.getAs[Long]("c")))
    } finally samp.unpersist(blocking = false)
  }

  test("embedding drift: uniform split shows none, label split trips PSI") {
    // even/odd vec_id split: both slices draw uniformly from every cell →
    // PSI far below the 0.2 major-shift rule of thumb
    val uniform = Clustering.embedDrift(emb, Nlist, col("vec_id") % 2 === 0)
      .agg(sum("psi_term").as("psi")).collect().head.getDouble(0)
    assert(uniform < 0.1, s"uniform split PSI=$uniform should be ~0")
    // label-conditioned split: embeddings cluster by label, so cell
    // occupancy shifts hard between the slices
    val shifted = Clustering.embedDrift(emb, Nlist, col("label") === 0)
      .agg(sum("psi_term").as("psi")).collect().head.getDouble(0)
    assert(shifted > 0.2, s"label split PSI=$shifted should trip the 0.2 rule")
    assert(shifted > uniform * 2,
      s"label-split PSI $shifted not clearly above uniform-split $uniform")
  }

  test("sample is deterministic across reruns and repartitions") {
    val quota = 25
    val a = Clustering.balancedSample(emb, Nlist, quota)
      .orderBy("cell", "samp_rank").collect().map(_.toString)
    val b = Clustering.balancedSample(emb.repartition(7), Nlist, quota)
      .orderBy("cell", "samp_rank").collect().map(_.toString)
    assert(a.sameElements(b),
      "cluster-balanced sample must not depend on input partitioning")
  }

  test("c-TF-IDF scoring matches hand math on planted counts") {
    val spark2 = spark
    import spark2.implicits._
    // two cells; "the" is corpus-common, "rare" concentrated in cell 1
    val counts = Seq(
      (0L, "the", 10L), (0L, "cat", 5L),
      (1L, "the", 10L), (1L, "rare", 8L)
    ).toDF("cell", "token", "tf")
    val out = Clustering.ctfidfLabels(counts, k = 2)
      .orderBy("cell", "label_rank").collect()
    val a = 33.0 / 2.0 // total tf / distinct cells
    def score(tf: Long, f: Long): Double = tf.toDouble * math.log(1.0 + a / f.toDouble)
    val byCellRank = out.map(r => (r.getAs[Long]("cell"), r.getAs[Long]("label_rank")) -> r).toMap
    // cell 0: cat (5, f=5) beats the (10, f=20)
    assert(byCellRank((0L, 1L)).getAs[String]("token") == "cat")
    assert(byCellRank((0L, 1L)).getAs[Double]("score") == score(5, 5))
    assert(byCellRank((0L, 2L)).getAs[String]("token") == "the")
    assert(byCellRank((0L, 2L)).getAs[Double]("score") == score(10, 20))
    // cell 1: rare (8, f=8) beats the
    assert(byCellRank((1L, 1L)).getAs[String]("token") == "rare")
    assert(byCellRank((1L, 1L)).getAs[Double]("score") == score(8, 8))
  }

  test("cluster labels are deterministic and occur in their cell") {
    val docs = Tables.documents(spark, TinySf)
    val labels = Clustering.clusterLabels(docs, emb, Nlist, k = 3)
      .orderBy("cell", "label_rank")
    val a = labels.collect().map(_.toString)
    val b = Clustering.clusterLabels(docs.repartition(5), emb, Nlist, k = 3)
      .orderBy("cell", "label_rank").collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b), "labels must be deterministic")
    // every label token occurs in at least one document of its cell
    val cells = Clustering.assignments(emb, Nlist).select(col("vec_id"), col("cell"))
    val cellTokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(cells, col("doc_id") === col("vec_id"))
      .select("cell", "token").distinct()
    val orphans = Clustering.clusterLabels(docs, emb, Nlist, k = 3)
      .join(cellTokens, Seq("cell", "token"), "left_anti").count()
    assert(orphans == 0, "a label must occur in its own cell")
  }

  test("bitext mining: mutual-best pairs are consistent and margin-ranked") {
    import graft.sim.Bitext
    val docs = Tables.documents(spark, TinySf)
    val mined = Bitext.minePairs(docs, emb, "en", "de", k = 4).cache()
    try {
      val rows = mined.collect()
      assert(rows.nonEmpty)
      // mutual-best means each x and each y appears at most once
      val xs = rows.map(_.getAs[Long]("x_id"))
      val ys = rows.map(_.getAs[Long]("y_id"))
      assert(xs.distinct.length == xs.length, "an x appears in two mined pairs")
      assert(ys.distinct.length == ys.length, "a y appears in two mined pairs")
      // endpoints actually come from the requested languages
      val langOf = docs.select("doc_id", "lang").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.forall(r => langOf(r.getAs[Long]("x_id")) == "en"))
      assert(rows.forall(r => langOf(r.getAs[Long]("y_id")) == "de"))
      // determinism across repartitioning
      val again = Bitext.minePairs(docs.repartition(5), emb.repartition(3),
        "en", "de", k = 4).orderBy("x_id").collect().map(_.toString)
      assert(mined.orderBy("x_id").collect().map(_.toString).sameElements(again))
    } finally mined.unpersist()
  }

  test("Procrustes recovers a planted block rotation: residuals collapse, R orthogonal") {
    import graft.sim.Procrustes
    val pairs = Procrustes.plantedVersionPair(emb)
    val d = 64
    val r = Procrustes.rotation(pairs, d)
    // orthogonality: R^T R == I (double-precision SVD)
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"R^T R [$i,$j] = $dot")
    }
    // recovery of the planted ground truth (float fixture => ~1e-4)
    val truth = Procrustes.plantedRotation(d)
    val maxErr = (for (i <- 0 until d; j <- 0 until d)
      yield math.abs(r(i)(j) - truth(i)(j))).max
    assert(maxErr < 1e-4, s"rotation recovery max err $maxErr")
    // residuals: aligned distance collapses vs raw distance
    val rep = Procrustes.alignReport(pairs).cache()
    try {
      val rows = rep.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Double]("dist_after") < 1e-3))
      val moved = rows.count(_.getAs[Double]("dist_before") > 0.1)
      assert(moved > rows.length / 2, "the planted rotation must actually move vectors")
      // determinism: partials sum in partition-index order, so the same
      // input partitioning reproduces R (and the report) bit-for-bit
      val again = Procrustes.alignReport(Procrustes.plantedVersionPair(emb))
        .orderBy("vec_id").collect().map(_.toString)
      assert(rep.orderBy("vec_id").collect().map(_.toString).sameElements(again))
    } finally rep.unpersist()
  }
}
