package graft

import graft.functions.GraftFunctions
import graft.plans.NativeAsOf
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {

  private def eventSides = {
    val ev = Tables.events(spark, TinySf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("ts_ns div 1000").as("ts_us"))
    (ev.filter(col("event_type") === "error").drop("event_type"),
      ev.filter(col("event_type") === "purchase").drop("event_type"))
  }

  test("native as-of join matches the union+window implementation") {
    val (err, pur) = eventSides
    val native = NativeAsOf.asOf(err, pur, "user_id", "ts_us", "value")
      .select("event_id", "asof_value", "asof_ts_us")
      .orderBy("event_id").collect().toSeq
    val windowed = graft.operators.AsOfJoin.asOf(err, pur)
      .select("event_id", "asof_value", "asof_ts_us")
      .orderBy("event_id").collect().toSeq
    assert(native.nonEmpty)
    assert(native == windowed)
  }

  test("native as-of plan is the custom exec with one exchange+sort per side") {
    val (err, pur) = eventSides
    val df = NativeAsOf.asOf(err, pur, "user_id", "ts_us", "value")
    df.collect()
    // AQE's toString shows final + initial plans; inspect only the final
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin "), plan.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan.take(1200))
  }

  test("FuseVecDot rewrites the HOF dot pattern into the native expression") {
    GraftFunctions.installOptimizations(spark)
    val e = Tables.embeddings(spark, TinySf)
    val df = e.select(col("vec_id"),
      Similarity.dot(col("embedding"), col("embedding")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      df.queryExecution.optimizedPlan.toString.take(600))
    // and the rewrite preserves values bit-exactly
    GraftFunctions.register(spark)
    val direct = e.select(col("vec_id"), expr("vec_dot(embedding, embedding)").as("d"))
    assert(df.orderBy("vec_id").collect().toSeq ==
      direct.orderBy("vec_id").collect().toSeq)
  }
}
