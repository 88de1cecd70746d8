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

  /** events.parquet's `ts` column has shipped in three shapes across
    * parquet-writer/Spark-runtime combinations: raw int64 nanos (legacy
    * `nanosAsLong`), TIMESTAMP(NANOS) loaded as timestamp_ntz (Spark
    * 4.1+ native nanos support, truncated to µs), and plain timestamp[us].
    * Normalize all three to the schema every consumer expects:
    * `ts` TimestampType (µs, UTC session) + `ts_ns` long (epoch nanos),
    * with `ts_ns div 1000` == DuckDB's `epoch_us(ts)` on the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // raw int64 nanos since epoch
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // TimestampType / TimestampNTZType, µs precision
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
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
