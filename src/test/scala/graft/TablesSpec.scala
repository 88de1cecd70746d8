package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader-contract tests: pin the normalized schema every events consumer
  * relies on, so an engine-version drift in how parquet timestamps load
  * (int64-nanos vs TIMESTAMP(NANOS)-as-ntz vs timestamp[us]) fails ONE
  * named test here instead of ~70 downstream operator tests.
  */
class TablesSpec extends SparkSpec {

  test("events loader contract: ts is TimestampType, ts_ns is epoch nanos (long)") {
    val ev = Tables.events(spark, TinySf)
    val byName = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("ts") == TimestampType,
      s"ts must normalize to TimestampType regardless of parquet physical type, got ${byName("ts")}")
    assert(byName("ts_ns") == LongType, s"ts_ns must be long epoch nanos, got ${byName("ts_ns")}")
    // the two representations must agree: ts_ns div 1000 == epoch micros of ts
    val bad = ev.where(expr("ts_ns div 1000") =!= unix_micros(col("ts"))).count()
    assert(bad == 0L, s"$bad rows where ts_ns/1000 != unix_micros(ts)")
  }

  test("events loader contract: a tiny aggregation over ts runs end-to-end") {
    val ev = Tables.events(spark, TinySf)
    val agg = ev.groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count("*").as("n"), sum("value").as("v"))
    val rows = agg.collect()
    assert(rows.nonEmpty, "daily aggregation over events.ts returned no rows")
    assert(rows.map(_.getLong(1)).sum == ev.count())
  }

  test("events loader contract: ts values are sane (within 2000..2100)") {
    val r = Tables.events(spark, TinySf)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"event timestamps out of sane range: years ${r.getInt(0)}..${r.getInt(1)} — unit mix-up (ns vs µs vs ms) in the loader?")
  }
}
