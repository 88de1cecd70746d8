package graft

import graft.gold.Sketches
import graft.operators.Cleaning
import org.apache.spark.sql.functions._

/** Sketches have no cross-engine oracle; bound their error vs exact. */
class SketchesSpec extends SparkSpec {

  test("merged HLL distinct-user estimate within 5% of exact") {
    val events = Tables.events(spark, TinySf)
    val approx = Sketches.mergedDistinctUsers(events)
      .collect()(0).getLong(0).toDouble
    val exact = events.select(countDistinct(col("user_id")))
      .collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("daily HLL estimates within 5% of exact per day") {
    val events = Tables.events(spark, TinySf)
    val approx = Sketches.dailyUserSketches(events)
      .select(col("event_date"), col("approx_users"))
    val exact = events.select(col("ts").cast("date").as("event_date"), col("user_id"))
      .groupBy("event_date").agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_date").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) / e < 0.05, s"day ${r.get(0)}: approx=$a exact=$e")
    }
  }

  test("sketch rollup: merged per-type and grand-total estimates within 5%") {
    val events = Tables.events(spark, TinySf)
    val approx = Sketches.sketchRollup(events).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users").toDouble).toMap
    val exactPerType = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("e").toDouble).toMap
    val exactTotal = events.select(countDistinct(col("user_id")))
      .collect()(0).getLong(0).toDouble
    // rows: one per event_type + the rollup total
    assert(approx.keySet == exactPerType.keySet + "__total__")
    exactPerType.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e) / e < 0.05, s"$t: approx=${approx(t)} exact=$e")
    }
    assert(math.abs(approx("__total__") - exactTotal) / exactTotal < 0.05)
  }

  test("approx quantiles within 2% of exact") {
    val clean = Cleaning.cleanOrders(Tables.orders(spark, TinySf))
    val approx = Sketches.approxOrderQuantiles(clean)
    val exact = clean.groupBy(col("status_normalized"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("exact_p50"))
    val joined = approx.join(exact, "status_normalized").collect()
    joined.foreach { r =>
      val a = r.getAs[Double]("approx_p50")
      val e = r.getAs[Double]("exact_p50")
      assert(math.abs(a - e) / e < 0.02, s"p50 approx=$a exact=$e")
    }
  }
}
