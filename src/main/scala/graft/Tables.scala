package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor. At 100 TB these
  * would be partitioned directories — all call sites therefore go through
  * `load` and never assume single-file layout, and every downstream
  * operator does an explicit `select` so column pruning reaches the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos (legacy conf) and floor-convert to a
    * µs timestamp — exactly DuckDB's behavior when it loads the same file
    * (DuckDB timestamps are µs), so oracles see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  /** documents/embeddings feed CPU-heavy per-row operators (regex, md5
    * shingling, dot products). The testdata ships as one parquet row group
    * = one input split, which would serialize that work on a single core;
    * an explicit round-robin repartition fans it out. (At 100 TB inputs
    * arrive as many splits and this is a no-op cost-wise — the repartition
    * write is a few MB here, and correctness never depends on layout.) */
  private def fanOut(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  def documents(s: SparkSession, d: String): DataFrame = fanOut(s, load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = fanOut(s, load(s, d, "embeddings"))
}
