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

  test("native as-of forward direction and tolerance semantics") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L), (2L, 1L, 12L), (3L, 1L, 25L), (4L, 2L, 5L))
      .toDF("event_id", "user_id", "ts_us")
    val r = Seq((1L, 12L, 1.5), (1L, 20L, 2.5), (2L, 1L, 9.0))
      .toDF("user_id", "ts_us", "value")
    // forward: probes 10 and 12 SHARE the ts=12 match (peek, not consume)
    val fwd = NativeAsOf.asOf(l, r, "user_id", "ts_us", "value", forward = true)
      .select("event_id", "asof_value", "asof_ts_us")
      .orderBy("event_id").collect().toSeq.map(x =>
        (x.getLong(0), Option(x.get(1)), Option(x.get(2))))
    assert(fwd == Seq(
      (1L, Some(1.5), Some(12L)), (2L, Some(1.5), Some(12L)),
      (3L, None, None), (4L, None, None)))
    // backward with tolerance 5: ts=25 matches 20 (gap 5), ts=5 matches 1
    // (gap 4); ts=10/12 have no at-or-before rows at all for user 1... the
    // earliest right row for user 1 is ts=12, so probe 12 matches exactly
    val tol = NativeAsOf.asOf(l, r, "user_id", "ts_us", "value", toleranceUs = 5L)
      .select("event_id", "asof_value").orderBy("event_id").collect().toSeq
      .map(x => (x.getLong(0), Option(x.get(1))))
    assert(tol == Seq(
      (1L, None), (2L, Some(1.5)), (3L, Some(2.5)), (4L, Some(9.0))))
    // tighter tolerance 3 drops the gap-5 and gap-4 matches
    val tol3 = NativeAsOf.asOf(l, r, "user_id", "ts_us", "value", toleranceUs = 3L)
      .select("event_id", "asof_value").orderBy("event_id").collect().toSeq
      .map(x => (x.getLong(0), Option(x.get(1))))
    assert(tol3 == Seq(
      (1L, None), (2L, Some(1.5)), (3L, None), (4L, None)))
  }

  test("native as-of generalizes to string keys and string payloads") {
    import spark.implicits._
    val l = Seq((1L, "alice", 10L), (2L, "alice", 30L), (3L, "bob", 10L), (4L, "carol", 10L))
      .toDF("event_id", "who", "ts_us")
    val r = Seq(("alice", 5L, "first"), ("alice", 25L, "second"), ("bob", 50L, "late"))
      .toDF("who", "ts_us", "note")
    val out = NativeAsOf.asOf(l, r, "who", "ts_us", "note")
      .select("event_id", "asof_value", "asof_ts_us")
      .orderBy("event_id").collect().toSeq
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2))))
    assert(out == Seq(
      (1L, Some("first"), Some(5L)),   // most recent at-or-before 10
      (2L, Some("second"), Some(25L)), // advanced past 'first' — copyValue kept it distinct
      (3L, None, None),                // bob's only note is after the probe
      (4L, None, None)))               // no rows for carol at all
    // the carried output attribute is typed to the payload column
    val schema = NativeAsOf.asOf(l, r, "who", "ts_us", "note").schema
    assert(schema("asof_value").dataType == org.apache.spark.sql.types.StringType)
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

  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def emptyPartitionWindows(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }

  test("ScalableRank matches global-window ranking exactly, incl. ties") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 37).toDouble)).toDF("k", "v")
    val got = graft.operators.ScalableRank
      .ranked(df, col("v"), col("k"), 10)
      .select("k", "v", "rn", "rank", "dense_rank", "ntile")
      .orderBy("k").collect().toSeq
    // rank/dense_rank rank the VALUE (ties are peers) — their window orders
    // by v alone; row_number/ntile need the total order incl. tiebreaker.
    val wT = org.apache.spark.sql.expressions.Window.orderBy(col("v").desc, col("k").asc)
    val wV = org.apache.spark.sql.expressions.Window.orderBy(col("v").desc)
    val want = df
      .withColumn("rn", row_number().over(wT).cast("long"))
      .withColumn("rank", rank().over(wV).cast("long"))
      .withColumn("dense_rank", dense_rank().over(wV).cast("long"))
      .withColumn("ntile", ntile(10).over(wT).cast("long"))
      .orderBy("k").collect().toSeq
    assert(got == want)
  }

  test("spendRanking plans no single-partition window over the data") {
    withoutAqe {
      val df = graft.operators.Features.spendRanking(
        graft.operators.Cleaning.cleanOrders(Tables.orders(spark, TinySf)))
      val wins = emptyPartitionWindows(df)
      assert(wins.nonEmpty) // the constant-size offset windows
      // every unpartitioned window must sit over the per-shuffle-partition
      // count frame (one row per partition), never over the data itself
      wins.foreach { w =>
        assert(w.child.toString.contains("_pid"), w.child.toString.take(600))
      }
    }
  }

  test("topCustomers ranks over a limit-bounded input, not a global sort") {
    withoutAqe {
      val df = graft.gold.Revenue.topCustomers(
        graft.operators.Cleaning.cleanOrders(Tables.orders(spark, TinySf)),
        Tables.customer(spark, TinySf), 25)
      val wins = emptyPartitionWindows(df)
      assert(wins.nonEmpty)
      wins.foreach { w =>
        assert(w.child.toString.contains("TakeOrderedAndProject"),
          w.child.toString.take(600))
      }
    }
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
