package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Transparent MV rewrite: queries written against the base table must be
  * served from the registered group-grain MV — same answers, MV scan in
  * the physical plan — and every soundness guard must block the rewrite
  * when derivability fails. */
class MvRewriteSpec extends SparkSpec {

  private val basePath = s"$TinySf/lineitem.parquet"
  private lazy val mvRoot =
    java.nio.file.Files.createTempDirectory("graft-mv-spec").toString

  /** Root paths of every file scan in the executed plan. */
  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // finalize AQE
    allNodes(finalPlan(df)).collect {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def registered(): String = {
    val mvPath = s"$mvRoot/lineitem_mv"
    val states = MvRewrite.materialize(
      Tables.lineitem(spark, TinySf),
      keys = Seq("l_returnflag", "l_linestatus"),
      specs = Seq(("sum", "l_quantity"), ("count", "l_quantity"),
        ("min", "l_discount"), ("max", "l_discount")),
      mvPath = mvPath)
    MvRewrite.register(spark, basePath, mvPath,
      Seq("l_returnflag", "l_linestatus"), states)
    mvPath
  }

  private def baseAgg() = Tables.lineitem(spark, TinySf)
    .groupBy("l_returnflag")
    .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"),
      avg("l_quantity").as("avg_qty"), count(col("l_quantity")).as("n_qty"),
      min("l_discount").as("min_disc"), max("l_discount").as("max_disc"))

  test("covered aggregate is served from the MV with identical results") {
    MvRewrite.clear()
    val expected = baseAgg().orderBy("l_returnflag").collect().toSeq
    val mvPath = registered()
    try {
      val got = baseAgg().orderBy("l_returnflag")
      assert(got.collect().toSeq == expected, "rewritten answer diverged")
      val paths = scanPaths(got)
      assert(paths.exists(_.contains("lineitem_mv")), s"no MV scan in $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")),
        s"base table still scanned: $paths")
      // schema (names + types) survives the rewrite exactly
      assert(got.schema == baseAgg().schema)
    } finally MvRewrite.clear()
  }

  test("key-column filters commute with the rollup and still hit the MV") {
    MvRewrite.clear()
    val q = () => Tables.lineitem(spark, TinySf)
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
    val expected = q().collect().toSeq
    registered()
    try {
      val got = q()
      assert(got.collect().toSeq == expected)
      assert(scanPaths(got).exists(_.contains("lineitem_mv")))
    } finally MvRewrite.clear()
  }

  test("soundness guards: uncovered column, non-key filter, distinct, disabled flag") {
    MvRewrite.clear()
    registered()
    try {
      // aggregate over a column with no registered state → base scan
      val uncovered = Tables.lineitem(spark, TinySf)
        .groupBy("l_returnflag").agg(sum("l_extendedprice").as("s"))
      assert(scanPaths(uncovered).exists(_.contains("lineitem.parquet")))
      // filter on a NON-key column needs row grain → base scan
      val rowFilter = Tables.lineitem(spark, TinySf)
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scanPaths(rowFilter).exists(_.contains("lineitem.parquet")))
      // DISTINCT aggregates are not derivable from sums
      val distinctAgg = Tables.lineitem(spark, TinySf)
        .groupBy("l_returnflag").agg(countDistinct(col("l_suppkey")).as("s"))
      assert(scanPaths(distinctAgg).exists(_.contains("lineitem.parquet")))
      // kill switch
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try assert(scanPaths(baseAgg()).exists(_.contains("lineitem.parquet")))
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    } finally MvRewrite.clear()
  }

  test("DISTINCT over MV KEY columns rewrites (one MV row per key combo)") {
    MvRewrite.clear()
    val q = () => Tables.lineitem(spark, TinySf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("n_status"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_pairs"),
        sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")
    val expected = q().collect().toSeq
    registered()
    try {
      val got = q()
      assert(got.collect().toSeq == expected,
        "distinct-over-keys rewrite diverged from the base answer")
      val paths = scanPaths(got)
      assert(paths.exists(_.contains("lineitem_mv")), s"no MV scan in $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")),
        s"base table still scanned: $paths")
    } finally MvRewrite.clear()

    // sum(DISTINCT numeric-key) on a numeric-key MV, incl. a NULL key row
    // (NULL-keyed base rows become a NULL-keyed MV group row; DISTINCT
    // sums ignore NULL on both sides)
    val numBase = s"$mvRoot/num_base"
    val numMv = s"$mvRoot/num_mv"
    val spark2 = spark
    import spark2.implicits._
    Seq((1, java.lang.Long.valueOf(10L), 1.0), (1, java.lang.Long.valueOf(10L), 2.0),
        (1, java.lang.Long.valueOf(20L), 3.0), (2, java.lang.Long.valueOf(10L), 4.0),
        (2, null.asInstanceOf[java.lang.Long], 5.0))
      .toDF("g", "k", "x").write.mode("overwrite").parquet(numBase)
    val states = MvRewrite.materialize(spark.read.parquet(numBase),
      keys = Seq("g", "k"), specs = Seq(("sum", "x")), mvPath = numMv)
    MvRewrite.register(spark, numBase, numMv, Seq("g", "k"), states)
    try {
      val q2 = () => spark.read.parquet(numBase).groupBy("g")
        .agg(sum_distinct(col("k")).as("sk"), sum("x").as("sx")).orderBy("g")
      val got2 = q2()
      val rows = got2.collect()
      assert(scanPaths(got2).exists(_.contains("num_mv")))
      assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((1, 30L, 6.0), (2, 10L, 9.0)))
    } finally MvRewrite.clear()
  }

  test("non-deterministic filter (rand sampling) blocks the rewrite") {
    MvRewrite.clear()
    registered()
    try {
      // rand() < p has NO attribute references, so the key-only reference
      // check alone would admit it — but sampling must see row grain, not
      // MV group grain
      val sampled = Tables.lineitem(spark, TinySf)
        .filter(rand(42) < 0.5)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scanPaths(sampled).exists(_.contains("lineitem.parquet")),
        "non-deterministic filter was commuted to MV group grain")
    } finally MvRewrite.clear()
  }

  test("global count over an EMPTY registered base is 0 through the rewrite") {
    MvRewrite.clear()
    val emptyBase = s"$mvRoot/empty_base"
    val emptyMv = s"$mvRoot/empty_mv"
    Tables.lineitem(spark, TinySf).limit(0)
      .write.mode("overwrite").parquet(emptyBase)
    val states = MvRewrite.materialize(
      spark.read.parquet(emptyBase),
      keys = Seq("l_returnflag", "l_linestatus"),
      specs = Seq(("sum", "l_quantity"), ("count", "l_quantity")),
      mvPath = emptyMv)
    MvRewrite.register(spark, emptyBase, emptyMv,
      Seq("l_returnflag", "l_linestatus"), states)
    try {
      val got = spark.read.parquet(emptyBase)
        .agg(count(lit(1)).as("n"), count(col("l_quantity")).as("n_qty"),
          sum("l_quantity").as("s"))
      val row = got.collect().head
      assert(row.getLong(0) == 0L, s"count(*) over empty base = ${row.get(0)}")
      assert(row.getLong(1) == 0L, s"count(x) over empty base = ${row.get(1)}")
      assert(row.isNullAt(2), "sum over empty base must stay NULL")
      assert(scanPaths(got).exists(_.contains("empty_mv")),
        "global agg over the empty base was not served from the MV")
    } finally MvRewrite.clear()
  }

  test("multi-path scan is never rewritten to one path's MV") {
    MvRewrite.clear()
    val otherPath = s"$mvRoot/lineitem_extra"
    Tables.lineitem(spark, TinySf).limit(10)
      .write.mode("overwrite").parquet(otherPath)
    val q = () => spark.read.parquet(basePath, otherPath)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    val expected = q().collect().toSeq
    registered()
    try {
      val got = q()
      assert(got.collect().toSeq == expected,
        "multi-path aggregate changed under a single-path MV registration")
      assert(scanPaths(got).exists(_.contains("lineitem.parquet")),
        "multi-path scan was rewritten — extra path's rows dropped")
    } finally MvRewrite.clear()
  }

  test("registration by file:-scheme URI serves queries on the bare path (and vice versa)") {
    MvRewrite.clear()
    val mvPath = s"$mvRoot/lineitem_mv_uri"
    val states = MvRewrite.materialize(
      Tables.lineitem(spark, TinySf),
      keys = Seq("l_returnflag", "l_linestatus"),
      specs = Seq(("sum", "l_quantity")), mvPath = mvPath)
    // register under the qualified URI, query via the bare path
    MvRewrite.register(spark, s"file:$basePath", mvPath,
      Seq("l_returnflag", "l_linestatus"), states)
    try {
      val got = Tables.lineitem(spark, TinySf)
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scanPaths(got).exists(_.contains("lineitem_mv_uri")),
        "scheme-qualified registration did not match the bare-path scan")
    } finally MvRewrite.clear()
    // and the reverse: bare-path registration, scheme-qualified read
    MvRewrite.register(spark, basePath, mvPath,
      Seq("l_returnflag", "l_linestatus"), states)
    try {
      val got = spark.read.parquet(s"file:$basePath")
        .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
      assert(scanPaths(got).exists(_.contains("lineitem_mv_uri")),
        "bare-path registration did not match the scheme-qualified scan")
    } finally MvRewrite.clear()
  }

  test("streaming mvSink maintains states batch-identically; serving registers the snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    MvRewrite.clear()
    val keys = Seq("l_returnflag", "l_linestatus")
    val specs = Seq(("sum", "l_quantity"), ("min", "l_discount"), ("max", "l_discount"))
    val li = Tables.lineitem(spark, TinySf)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_discount"), col("l_orderkey"))
    val rows = li.as[(String, String, Double, Double, Long)].collect().toSeq
    val (evenBatch, oddBatch) = rows.partition(_._5 % 2 == 0)

    val stream = MemoryStream[(String, String, Double, Double, Long)]
    val target = s"$mvRoot/stream_mv"
    val q = graft.streaming.StreamOps.mvSink(
      stream.toDF.toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_discount", "l_orderkey"),
      keys, specs, target, s"$mvRoot/stream_mv_ckpt")
    try {
      stream.addData(evenBatch); q.processAllAvailable()
      stream.addData(oddBatch); q.processAllAvailable()
    } finally q.stop()

    // the streamed store equals a batch build over everything ingested
    val latest = new java.io.File(target).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).max
    val streamed = spark.read.parquet(s"$target/v=$latest")
      .orderBy(keys.map(col): _*).collect().toSeq
    val batchBuilt = MvRewrite.partialStates(
        li.drop("l_orderkey"), keys, specs)
      .orderBy(keys.map(col): _*).collect().toSeq
    assert(streamed == batchBuilt, "streamed MV diverged from batch build")

    // a serving session registers the snapshot it reads (hot-reload seam)
    // and base-table aggregates are answered from it
    val q2 = () => Tables.lineitem(spark, TinySf)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
    val expected = q2().collect().toSeq
    MvRewrite.register(spark, basePath, s"$target/v=$latest", keys, MvRewrite.statesFor(specs))
    try {
      val got = q2()
      assert(got.collect().toSeq == expected)
      assert(scanPaths(got).exists(_.contains("stream_mv")),
        "query not served from the streamed MV")
    } finally MvRewrite.clear()
  }

  test("q_mv_rewrite (the driver-gated query) runs green and self-verifies the rewrite") {
    MvRewrite.clear()
    // the query body `require`s that the optimized plan scanned the MV and
    // not the base — so a plain successful run IS the plan-shape assert
    val out = Queries.all("q_mv_rewrite")(spark, TinySf).collect()
    assert(out.nonEmpty)
    // registration must not leak into the session after the query returns
    val after = Tables.orders(spark, TinySf)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(scanPaths(after).exists(_.contains("orders.parquet")),
      "q_mv_rewrite leaked its MV registration into the session")
  }

  test("two rewrites in ONE plan get independent scans (no exprId collision)") {
    MvRewrite.clear()
    // a union of two covered aggregates: transformUp rewrites both; each
    // must stamp fresh exprIds off the template or analysis would see
    // duplicate attribute ids across the two MV scans and throw
    val q = () => Tables.lineitem(spark, TinySf)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("qty"))
      .unionByName(
        Tables.lineitem(spark, TinySf)
          .groupBy("l_linestatus").agg(sum("l_quantity").as("qty"))
          .withColumnRenamed("l_linestatus", "l_returnflag"))
      .orderBy("l_returnflag", "qty")
    val expected = q().collect().toSeq
    registered()
    try {
      val got = q()
      assert(got.collect().toSeq == expected)
      val paths = scanPaths(got)
      assert(paths.count(_.contains("lineitem_mv")) == 2,
        s"expected 2 MV scans, saw $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")))
    } finally MvRewrite.clear()
  }

  test("grouping by BOTH keys re-aggregates at MV grain with exact equality") {
    MvRewrite.clear()
    val q = () => Tables.lineitem(spark, TinySf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
    val expected = q().collect().toSeq
    registered()
    try {
      val got = q()
      assert(got.collect().toSeq == expected)
      assert(scanPaths(got).exists(_.contains("lineitem_mv")))
    } finally MvRewrite.clear()
  }
}
