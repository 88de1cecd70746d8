package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Privacy/governance pack + Jaro–Winkler ER + scale-join operators. */
class PrivacyErSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    functions.JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches the pinned DuckDB-probed values") {
    // values probed from DuckDB 1.0 jaro_winkler_similarity (semantics
    // contract for the q_er_jarowinkler oracle)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0)            // window 0: no matches
    assert(jw("", "") == 0.0)                // DuckDB scores empty-empty 0
    assert(jw("", "abc") == 0.0)
    assert(jw("abcdefgh", "abzzzzzz") == 0.5) // jaro ≤ 0.7 → NO prefix boost
    assert(math.abs(jw("x", "xx") - 0.8500000000000001) < 1e-15)
    // prefix boost caps at 4 even with a longer common prefix
    assert(math.abs(jw("aaaaaabc", "aaaaaacb") - 0.975) < 1e-15)
  }

  test("jaro_winkler is symmetric and bounded on random strings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("jaro bitmap fast path is bit-identical to the boolean-array path") {
    val rnd = new scala.util.Random(7)
    // lengths straddle the 64-code-unit cutover (the fast path requires
    // n,m ≤ 64; similarity() itself only takes the bitmap branch below it)
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(64)
      val m = 1 + rnd.nextInt(64)
      // alphabet of 4 so matches/transpositions are dense
      val a = Seq.fill(n)("abcd" (rnd.nextInt(4))).mkString
      val b = Seq.fill(m)("abcd" (rnd.nextInt(4))).mkString
      val bits = functions.JaroWinkler.jaroSimBits(a, b, n, m)
      val arr = functions.JaroWinkler.jaroSim(a, b, n, m)
      assert(bits == arr, s"paths diverge on ($a, $b): $bits vs $arr")
    }
    // boundary: exactly 64 and 65 code units through the public surface
    val s64 = "ab" * 32
    val s65 = s64 + "c"
    assert(jw(s64, s64) == 1.0)
    assert(jw(s65, s65) == 1.0)
    assert(jw(s64, s65) == jw(s65, s64))
  }

  test("jaro_winkler SQL function runs inside codegen and agrees with the static impl") {
    // parquet-backed input so the optimizer cannot constant-fold the
    // expression into a LocalTableScan
    val df = Tables.customer(spark, TinySf).limit(200)
      .select(col("c_name").as("a"), reverse(col("c_name")).as("b"))
      .withColumn("s", expr("jaro_winkler(a, b)"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, s) => assert(s == jw(a, b)) }
    // the expression must not fall back to interpreted eval: its codegen
    // support is what keeps the ER verify in one whole-stage span —
    // assert the jaro_winkler Project sits INSIDE a WholeStageCodegenExec
    val inCodegen = allNodes(finalPlan(df)).exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString.contains("jaro_winkler")
      case _ => false
    }
    assert(inCodegen, s"jaro_winkler not in a codegen span:\n${finalPlan(df)}")
  }

  test("q_er_jarowinkler finds prefix-preserving near-duplicates above threshold") {
    val out = Queries.all("q_er_jarowinkler")(spark, TinySf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(4) >= 0.97))
    // every pair is within one blocking cell and ordered
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("k-anonymity group sizes sum to the table size; meets_k is consistent") {
    val customer = Tables.customer(spark, TinySf)
    val audit = gold.Privacy.kAnonymity(customer, k = 10).collect()
    assert(audit.map(_.getAs[Long]("group_size")).sum == customer.count())
    audit.foreach { r =>
      assert(r.getAs[Boolean]("meets_k") == (r.getAs[Long]("group_size") >= 10))
    }
  }

  test("suppressToK preserves total mass and only suppresses below-k combos") {
    val customer = Tables.customer(spark, TinySf)
    val rel = gold.Privacy.suppressToK(customer, k = 10).collect()
    assert(rel.map(_.getAs[Long]("group_size")).sum == customer.count())
    rel.foreach { r =>
      val star = r.getAs[String]("nation_qi") == "*"
      assert(star == r.getAs[Boolean]("suppressed"))
      if (!star) assert(r.getAs[Long]("group_size") >= 10)
    }
    // at most one residual group
    assert(rel.count(_.getAs[Boolean]("suppressed")) <= 1)
  }

  test("l-diversity: modal share and distinct counts are internally consistent") {
    val out = gold.Privacy.lDiversity(
      Tables.orders(spark, TinySf), Tables.customer(spark, TinySf), l = 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val share = r.getAs[Double]("modal_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("modal_count") <= r.getAs[Long]("group_size"))
      assert(r.getAs[Boolean]("meets_l") == (r.getAs[Long]("distinct_sensitive") >= 3))
    }
  }

  test("t-closeness: hand-computed EMD, zero for a mirror class, missing " +
    "domain values still contribute") {
    import graft.gold.Privacy
    val spark2 = spark
    import spark2.implicits._
    // sensitive domain {1-URGENT, 2-HIGH}, m=2, so EMD = |P1 - Q1|.
    // class (0,A): 3 urgent, 1 high; class (1,B): 1 urgent, 3 high.
    // global: 4 urgent, 4 high -> Q1 = 0.5.
    // EMD(0,A) = |3/4 - 1/2| = 0.25; EMD(1,B) = |1/4 - 1/2| = 0.25.
    val cust = Seq((1L, 0L, "A"), (2L, 1L, "B"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    def ords(ck: Long, urgent: Int, high: Int) =
      (Seq.fill(urgent)("1-URGENT") ++ Seq.fill(high)("2-HIGH"))
        .map(p => (ck, p))
    val orders = (ords(1L, 3, 1) ++ ords(2L, 1, 3))
      .toDF("o_custkey", "o_orderpriority")
    val out = Privacy.tCloseness(orders, cust, t = 0.3)
      .orderBy("c_nationkey").collect()
    assert(out.map(_.getAs[Double]("emd")).toSeq == Seq(0.25, 0.25))
    assert(out.forall(_.getAs[Boolean]("meets_t")))
    // a class missing a domain value entirely: P over {u,h,l} with the
    // third class holding all the '3-LOW's -> its EMD reflects the gap
    val orders2 = (ords(1L, 4, 0) ++ ords(2L, 0, 4)).toDF("o_custkey", "o_orderpriority")
    val skew = Privacy.tCloseness(orders2, cust, t = 0.3)
      .orderBy("c_nationkey").collect()
    // Q1 = 0.5; class (0,A) all urgent -> |1 - 0.5| = 0.5 > t
    assert(skew.map(_.getAs[Double]("emd")).toSeq == Seq(0.5, 0.5))
    assert(skew.forall(!_.getAs[Boolean]("meets_t")))
  }

  test("DP release: noise is deterministic across runs, symmetric-Laplace shaped") {
    def run() = gold.Privacy.dpRevenueByNation(Tables.orders(spark, TinySf),
      Tables.customer(spark, TinySf), Tables.nation(spark, TinySf)).collect()
    val a = run(); val b = run()
    // reproducible release: bit-identical noise both runs
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val noises = a.map(r => r.getAs[Double]("noised_revenue") - r.getAs[Double]("true_revenue"))
    assert(noises.forall(n => n != 0.0 && !n.isNaN))
    // both signs occur (u is hash-uniform; 25 nations make a one-sided
    // draw astronomically unlikely)
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
  }

  test("targeted salted join is bit-identical to the plain join") {
    val li = Tables.lineitem(spark, TinySf)
    val ord = Tables.orders(spark, TinySf)
    val salted = operators.SkewJoin.revenueByPriority(li, ord).collect()
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        graft.util.Cols.sumMoneyTimes(col("l_extendedprice"),
          lit(1) - col("l_discount")).as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
    // the hot set is non-empty at this threshold, so the salted path ran
    val hot = li.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5).count()
    assert(hot > 0, "hotThreshold admitted no keys; salted path untested")
  }

  test("delta-join MV maintenance equals the full recompute") {
    val ord = Tables.orders(spark, TinySf)
    val li = Tables.lineitem(spark, TinySf)
    val inc = gold.DeltaView.monthlyRevenueIncremental(ord, li).collect()
    val full = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(sum(col("l_extendedprice").cast(
        org.apache.spark.sql.types.DecimalType(18, 2))).cast("double").as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy("order_month").collect()
    assert(inc.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    // the delta split actually split: both sides non-empty
    val maxD = ord.agg(max(col("o_orderdate")).as("m"))
    val nDelta = ord.crossJoin(broadcast(maxD))
      .filter(col("o_orderdate") >= date_sub(col("m").cast("date"), 30)).count()
    assert(nDelta > 0 && nDelta < ord.count())
  }
}
