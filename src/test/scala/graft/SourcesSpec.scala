package graft

import graft.multimodal.MediaFiles
import graft.sources.MediaFileSource
import org.apache.spark.sql.functions._

/** Engine contracts of the graft-media DataSource V2 connector: filter
  * pushdown prunes FILES at planning time, column pruning skips the
  * open+decode entirely for metadata-only projections, residual filters
  * still evaluate, and the decoded content round-trips the writer. */
class SourcesSpec extends SparkSpec {

  private lazy val mediaDir: String = {
    val dir = graft.util.Scratch.dir("graft-sources-spec")
    MediaFiles.writePpm(Tables.documents(spark, TinySf), dir)
    dir
  }
  private lazy val nDocs = Tables.documents(spark, TinySf).count()

  test("metadata-only projection never opens a file") {
    val dir = mediaDir
    MediaFileSource.resetCounters()
    val rows = spark.read.format("graft-media").load(dir)
      .select("name", "size").collect()
    assert(rows.length == nDocs)
    assert(MediaFileSource.filesPlanned.get() == nDocs)
    assert(MediaFileSource.filesOpened.get() == 0L,
      "a path/name/size/mtime projection must be answered from the listing alone")
    assert(MediaFileSource.bytesRead.get() == 0L)
  }

  test("size pushdown prunes files at planning time") {
    val dir = mediaDir
    val sizes = spark.read.format("graft-media").load(dir)
      .select("size").collect().map(_.getLong(0)).sorted
    val cut = sizes(sizes.length / 2) // median: prunes roughly half
    MediaFileSource.resetCounters()
    val kept = spark.read.format("graft-media").load(dir)
      .filter(col("size") < cut)
      .select("name", "width").collect()
    val expected = sizes.count(_ < cut)
    assert(kept.length == expected)
    assert(MediaFileSource.filesPlanned.get() == expected,
      "planning must see only the files surviving the pushed size filter")
    assert(MediaFileSource.filesOpened.get() == expected)
  }

  test("name-prefix pushdown prunes to the exact file") {
    val dir = mediaDir
    MediaFileSource.resetCounters()
    val one = spark.read.format("graft-media").load(dir)
      .filter(col("name") === "doc_7.ppm").collect()
    assert(one.length == 1)
    assert(MediaFileSource.filesPlanned.get() == 1L)
  }

  test("residual content filters evaluate without pruning the listing") {
    val dir = mediaDir
    val all = spark.read.format("graft-media").load(dir)
      .select("width").collect().map(_.getInt(0))
    val wCut = all.max // width filter is NOT pushable -> planned == all
    MediaFileSource.resetCounters()
    val got = spark.read.format("graft-media").load(dir)
      .filter(col("width") === wCut).count()
    assert(got == all.count(_ == wCut))
    assert(MediaFileSource.filesPlanned.get() == nDocs,
      "content predicates must stay residual (no unsound file pruning)")
  }

  test("decoded content round-trips the writer bytes") {
    val dir = mediaDir
    val row = spark.read.format("graft-media").load(dir)
      .filter(col("name") === "doc_3.ppm")
      .select("width", "height", "pixels").collect().head
    val doc = Tables.documents(spark, TinySf)
      .filter(col("doc_id") === 3L).select("text").collect().head.getString(0)
    val (w, h) = MediaFiles.dims(3L)
    assert(row.getInt(0) == w && row.getInt(1) == h)
    val expected = MediaFiles.ppmBytes(3L, doc).drop(
      s"P6\n$w $h\n255\n".length)
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]](2), expected.toArray),
      "pixel buffer must round-trip the cycled text bytes")
  }

  test("partitions are byte-balanced and respect the partitions option") {
    val dir = mediaDir
    val df = spark.read.format("graft-media").option("partitions", 3).load(dir)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == nDocs)
  }

  test("format matrix round-trips ORC/CSV/JSON losslessly; ORC pushdown binds") {
    import graft.sources.FormatMatrix
    val li = Tables.lineitem(spark, TinySf)
    val root = graft.util.Scratch.dir("graft-fmt-spec")
    val out = FormatMatrix.roundTrip(li, root).collect()
      .map(r => r.getAs[String]("format") -> r).toMap
    assert(out.keySet == Set("orc", "csv", "json"))
    // truth from the parquet-backed frame itself
    val truth = li.agg(
      count(lit(1)), sum(col("l_quantity").cast("decimal(12,2)"))
        .cast("decimal(38,2)").cast("double"),
      countDistinct(col("l_orderkey"))).collect().head
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == truth.getLong(0))
      assert(r.getAs[Double]("sum_qty") == truth.getDouble(1),
        s"decimal sum drifted through ${r.getAs[String]("format")}")
      assert(r.getAs[Long]("n_orders") == truth.getLong(2))
    }
    // ORC predicate pushdown reaches the scan
    val plan = spark.read.orc(s"$root/orc")
      .filter(col("l_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"),
      s"ORC pushdown missing:\n$plan")
  }
}
