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

  private def corpusTokens = Tables.documents(spark, TinySf)
    .select(explode(split(col("text"), " ")).as("token"))
    .filter(col("token") =!= "")

  test("topk_freq with capacity above the vocab is EXACT") {
    graft.functions.GraftFunctions.register(spark)
    val tokens = corpusTokens
    val vocab = tokens.distinct().count()
    val cap = (vocab + 100).toInt
    val got = tokens
      .agg(expr(s"topk_freq(token, $cap, 20)").as("topk"))
      .select(explode(col("topk")).as("hh"))
      .select(col("hh.item"), col("hh.count_est"), col("hh.err_bound"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(x => (x._1, x._2)).toSeq == want.toSeq)
    assert(got.forall(_._3 == 0L), "no decrements below capacity")
  }

  test("topk_freq Misra–Gries error bound holds under tight capacity") {
    graft.functions.GraftFunctions.register(spark)
    val tokens = corpusTokens
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cap = 32
    val got = tokens
      .agg(expr(s"topk_freq(token, $cap, $cap)").as("topk"))
      .select(explode(col("topk")).as("hh"))
      .select(col("hh.item"), col("hh.count_est"), col("hh.err_bound"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (item, est, err) =>
      val f = exact(item)
      // MG invariant: f - errBound <= est <= f
      assert(est <= f, s"$item: est=$est > true=$f")
      assert(est >= f - err, s"$item: est=$est < $f - $err")
    }
    // every item more frequent than the error bound must be in the summary
    val err = got.head._3
    val mustAppear = exact.filter(_._2 > err).keySet
    val appeared = got.map(_._1).toSet
    assert(mustAppear.subsetOf(appeared),
      s"missing heavy hitters: ${mustAppear -- appeared}")
  }

  test("kmv_sketch is EXACT below k and identical under distributed merge") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = (1L to 100L).toDF("v")
    val single = df.repartition(1).agg(expr("kmv_sketch(v, 256)")).collect()(0).getSeq[Long](0)
    val merged = df.repartition(7).agg(expr("kmv_sketch(v, 256)")).collect()(0).getSeq[Long](0)
    // unfilled sketch IS the distinct hash set — exact, and merge-invariant
    assert(single.size == 100 && single == merged)
    val est = df.agg(graft.functions.Kmv.estimate(
      expr("kmv_sketch(v, 256)"), 256)).collect()(0).getDouble(0)
    assert(est == 100.0, s"below-k estimate must be exact, got $est")
  }

  test("kmv_sketch distinct estimate within 20% at k=256 over 20k values") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val est = (1L to 20000L).toDF("v").repartition(11)
      .agg(graft.functions.Kmv.estimate(expr("kmv_sketch(v, 256)"), 256))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"est=$est")
  }

  test("KMV union/intersection estimates track exact set cardinalities") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.Kmv
    val k = 512
    // |A|=10000, |B|=10000, |A∩B|=5000, |A∪B|=15000, J=1/3
    val df = (0L until 10000L).map(v => ("a", v))
      .++((5000L until 15000L).map(v => ("b", v))).toDF("side", "v")
    val sk = df.repartition(9).agg(
      expr(s"kmv_sketch(CASE WHEN side = 'a' THEN v END, $k)").as("a"),
      expr(s"kmv_sketch(CASE WHEN side = 'b' THEN v END, $k)").as("b"))
    val row = sk.select(
      Kmv.unionEstimate(col("a"), col("b"), k).as("u"),
      Kmv.intersectEstimate(col("a"), col("b"), k).as("i"),
      Kmv.jaccardEstimate(col("a"), col("b"), k).as("j")).collect()(0)
    val (u, i, j) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(math.abs(u - 15000.0) / 15000.0 < 0.15, s"union est=$u")
    assert(math.abs(i - 5000.0) / 5000.0 < 0.25, s"intersect est=$i")
    assert(math.abs(j - 1.0 / 3.0) < 0.1, s"jaccard est=$j")
  }

  test("kmv_merge_agg of daily sketches is bit-identical to sketching the " +
    "whole corpus directly") {
    graft.functions.GraftFunctions.register(spark)
    val events = Tables.events(spark, TinySf)
      .select(col("ts").cast("date").as("d"), col("user_id"))
    val k = 8 // tiny k so daily sketches FILL and eviction paths engage
    val direct = events.agg(expr(s"kmv_sketch(user_id, $k)"))
      .collect()(0).getSeq[Long](0)
    val merged = events.groupBy("d")
      .agg(expr(s"kmv_sketch(user_id, $k)").as("s"))
      .agg(expr(s"kmv_merge_agg(s, $k)"))
      .collect()(0).getSeq[Long](0)
    // the KMV closure property: k smallest of a union is computable from
    // per-part sketches alone — so the two paths cannot differ by a bit
    assert(direct == merged)
    assert(direct.size == k, "test corpus must overfill the sketch")
  }

  test("audienceOverlap is exact on a below-k corpus") {
    val events = Tables.events(spark, TinySf)
    val got = Sketches.audienceOverlap(events)
      .collect().map(r => r.getDate(0).toString ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    val purch = events.filter(col("event_type") === "purchase")
      .select(col("ts").cast("date").as("d"), col("user_id"))
    val errs = events.filter(col("event_type") === "error")
      .select(col("ts").cast("date").as("d"), col("user_id"))
    val exact = purch.select("d", "user_id").distinct()
      .withColumn("p", lit(1)).join(
        errs.select("d", "user_id").distinct().withColumn("e", lit(1)),
        Seq("d", "user_id"), "full")
      .groupBy("d").agg(
        sum(coalesce(col("p"), lit(0))).as("np"),
        sum(coalesce(col("e"), lit(0))).as("ne"),
        count(lit(1)).as("nu"),
        sum(when(col("p").isNotNull && col("e").isNotNull, 1).otherwise(0)).as("nb"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == exact.keySet)
    // tiny-corpus audiences never fill k=256, so every figure — including
    // the intersection — must equal the exact set cardinality
    got.foreach { case (day, (p, e, u, b)) =>
      val (ep, ee, eu, eb) = exact(day)
      assert(math.abs(p - ep) < 1e-6 && math.abs(e - ee) < 1e-6 &&
        math.abs(u - eu) < 1e-6 && math.abs(b - eb) < 1e-6,
        s"$day: got ($p,$e,$u,$b) exact ($ep,$ee,$eu,$eb)")
    }
  }

  test("audienceDifference is exact on a below-k corpus (A-not-B twin)") {
    val events = Tables.events(spark, TinySf)
    val got = Sketches.audienceDifference(events)
      .collect().map(r => r.getDate(0).toString ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    def users(t: String) = events.filter(col("event_type") === t)
      .select(col("ts").cast("date").as("d"), col("user_id")).distinct()
    val exact = users("purchase").withColumn("p", lit(1))
      .join(users("error").withColumn("e", lit(1)), Seq("d", "user_id"), "full")
      .groupBy("d").agg(
        sum(when(col("p").isNotNull && col("e").isNull, 1).otherwise(0)).as("po"),
        sum(when(col("e").isNotNull && col("p").isNull, 1).otherwise(0)).as("eo"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (day, (po, eo)) =>
      val (epo, eeo) = exact(day)
      assert(math.abs(po - epo) < 1e-6 && math.abs(eo - eeo) < 1e-6,
        s"$day: got ($po,$eo) exact ($epo,$eeo)")
    }
  }

  test("cms_sketch never undercounts, holds the e·N/width ceiling on EVERY " +
    "token, and is merge-invariant") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.Cms
    val (depth, width) = (4, 512)
    val tokens = Tables.documents(spark, TinySf)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val single = tokens.repartition(1)
      .agg(expr(s"cms_sketch(token, $depth, $width)")).collect()(0).getSeq[Long](0)
    val merged = tokens.repartition(13)
      .agg(expr(s"cms_sketch(token, $depth, $width)")).collect()(0).getSeq[Long](0)
    // counters add elementwise — partitioning cannot change a single bit
    assert(single == merged)

    val exact = tokens.groupBy("token").agg(count(lit(1)).as("exact"))
    val sketchDf = tokens.agg(expr(s"cms_sketch(token, $depth, $width)").as("sk"))
    val rows = exact.crossJoin(sketchDf)
      .select(col("token"), col("exact"),
        Cms.pointEstimate(col("sk"), col("token"), depth, width).as("est"),
        Cms.totalMass(col("sk")).as("n"),
        Cms.errorCeiling(col("sk"), width).as("ceil"))
      .collect()
    assert(rows.nonEmpty)
    var overCeiling = 0
    rows.foreach { r =>
      val (ex, est, ceil) = (r.getAs[Long]("exact"), r.getAs[Long]("est"),
        r.getAs[Double]("ceil"))
      assert(est >= ex, s"CMS undercounted ${r.getString(0)}: est=$est exact=$ex")
      if (est > ex + ceil) overCeiling += 1
    }
    // Pr[overshoot > e·N/width] ≤ e^−depth ≈ 1.8% per probe; allow the tail
    assert(overCeiling <= math.max(1, rows.length / 20),
      s"$overCeiling of ${rows.length} probes exceeded the CMS error ceiling")
  }

  test("CMS join-size estimate never undercounts, stays under the " +
    "collision ceiling, and is partition-invariant") {
    val orders = Tables.orders(spark, TinySf)
    val (depth, width) = (4, 1024)
    val row = gold.Sketches.joinSizeEstimate(orders, "o_custkey", depth, width)
      .collect()(0)
    val est = row.getAs[Long]("est_join_size")
    val exact = row.getAs[Long]("exact_join_size")
    val n = row.getAs[Long]("n_rows")
    // inner-product collisions only add positive cross terms
    assert(est >= exact, s"join-size estimate undercounted: $est < $exact")
    // expected overcount per sketch row is N²/width; min over depth rows
    // exceeding e·N²/width has probability ~e^-depth — deterministic here
    assert(est <= exact + math.E * n.toDouble * n.toDouble / width,
      s"est=$est exact=$exact n=$n exceeded the collision ceiling")
    // counters add elementwise — partitioning cannot change the estimate
    val rep = gold.Sketches.joinSizeEstimate(orders.repartition(13),
      "o_custkey", depth, width).collect()(0)
    assert(rep.getAs[Long]("est_join_size") == est)
    assert(rep.getAs[Long]("exact_join_size") == exact)
  }

  test("cms_merge_agg of per-lang sketches is bit-identical to sketching " +
    "the whole corpus, and an absent token estimates below the ceiling") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.Cms
    val (depth, width) = (4, 1024)
    val toks = Tables.documents(spark, TinySf)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val direct = toks.agg(expr(s"cms_sketch(token, $depth, $width)"))
      .collect()(0).getSeq[Long](0)
    val merged = toks.groupBy("lang")
      .agg(expr(s"cms_sketch(token, $depth, $width)").as("s"))
      .agg(expr(s"cms_merge_agg(s, $depth, $width)"))
      .collect()(0).getSeq[Long](0)
    assert(direct == merged)

    val out = Sketches.tokenFrequencyProbes(Tables.documents(spark, TinySf),
      Seq("the", "zzyzx-not-a-token")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("count_est"),
        r.getAs[Double]("err_ceiling"))).toMap
    // a token that never occurs can only carry collision mass ≤ ceiling whp
    assert(out("zzyzx-not-a-token")._1 <= out("zzyzx-not-a-token")._2,
      s"absent-token estimate ${out("zzyzx-not-a-token")._1} above ceiling")
    // a stopword certainly present must estimate at least its true count ≥ 1
    assert(out("the")._1 >= 1L)
  }

  test("cms_sketch rejects non-literal or missing shape arguments") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a", "b").toDF("v")
    val e1 = intercept[Exception](df.agg(expr("cms_sketch(v, v, 8)")).collect())
    assert(e1.getMessage.contains("literal int"))
    val e2 = intercept[Exception](df.agg(expr("cms_sketch(v, 4)")).collect())
    assert(e2.getMessage.contains("3 arguments"))
  }

  test("quantile sketch merge is exactly associative: merged days == direct month sketch") {
    val co = Cleaning.cleanOrders(Tables.orders(spark, TinySf))
      .withColumn("order_month", date_trunc("month", col("order_date")).cast("date"))
    val merged = graft.gold.QuantileSketch.merge(
      graft.gold.QuantileSketch.sketch(co, Seq("order_month", "order_date"),
        col("o_totalprice"), col("o_orderkey")),
      Seq("order_month"))
    val direct = graft.gold.QuantileSketch.sketch(co, Seq("order_month"),
      col("o_totalprice"), col("o_orderkey"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getDate(0).toString ->
        (r.getAs[Seq[org.apache.spark.sql.Row]]("qsk").toList, r.getAs[Long]("n_rows"))).toMap
    val m = toMap(merged.select("order_month", "qsk", "n_rows"))
    val dct = toMap(direct.select("order_month", "qsk", "n_rows"))
    assert(m.keySet == dct.keySet && m.nonEmpty)
    m.foreach { case (k, v) => assert(v == dct(k), s"month $k sketch mismatch") }
  }

  test("quantile sketch estimates: exact for small groups, bounded error overall") {
    val out = Queries.all("q_quantile_sketch")(spark, TinySf).collect()
    assert(out.nonEmpty)
    val co = Cleaning.cleanOrders(Tables.orders(spark, TinySf))
      .withColumn("order_month", date_trunc("month", col("order_date")).cast("date"))
    val exactVals = co.select("order_month", "o_totalprice").collect()
      .groupBy(_.getDate(0).toString)
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    def type1(v: Array[Double], q: Double): Double =
      v(math.max(1, math.ceil(q * v.length).toInt) - 1)
    out.foreach { r =>
      val (month, n, m) = (r.getDate(0).toString, r.getLong(1), r.getLong(2))
      val v = exactVals(month)
      assert(n == v.length)
      assert(m == math.min(n, graft.gold.QuantileSketch.DefaultK))
      val (p50, ex50) = (r.getDouble(3), type1(v, 0.5))
      if (n <= graft.gold.QuantileSketch.DefaultK)
        assert(p50 == ex50, s"$month: exact-regime p50 $p50 != $ex50")
      else
        assert(math.abs(p50 - ex50) / ex50 < 0.5, s"$month: p50 $p50 vs $ex50")
    }
  }

  test("bottomk_qsk fused sketch state == two-pass window reference, bit for bit") {
    // the pre-r13 sketch build, inlined as the reference: grouped top-k by
    // (pri, key) via ScalableRank + sort_array(collect_list) + a count
    // aggregate joined back — the fused aggregate must reproduce it exactly
    val co = Cleaning.cleanOrders(Tables.orders(spark, TinySf))
      .withColumn("order_month", date_trunc("month", col("order_date")).cast("date"))
    def reference(df: org.apache.spark.sql.DataFrame, groups: Seq[String],
                  value: org.apache.spark.sql.Column,
                  rowKey: org.apache.spark.sql.Column, k: Int) = {
      val prioritized = df.select(groups.map(col) ++ Seq(
          xxhash64(rowKey).as("_pri"), hash(rowKey).cast("long").as("_key"),
          value.cast("double").as("_v")): _*)
        .filter(col("_v").isNotNull)
      val kept = graft.operators.ScalableRank.topKPerGroup(prioritized,
        groups.map(col), Seq(col("_pri").asc, col("_key").asc), k, "_qsr")
      val counts = prioritized.groupBy(groups.map(col): _*)
        .agg(count(lit(1)).as("n_rows"))
      kept.groupBy(groups.map(col): _*)
        .agg(sort_array(collect_list(struct(col("_pri"), col("_key"), col("_v"))))
          .as("qsk"))
        .join(counts, groups)
    }
    // small k (17) forces the evict path; day grain exercises many groups
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .select("order_date", "qsk", "n_rows").collect()
      .map(r => r.getDate(0).toString ->
        (r.getAs[Seq[org.apache.spark.sql.Row]]("qsk").toList,
          r.getAs[Long]("n_rows"))).toMap
    val fused = toMap(graft.gold.QuantileSketch.sketch(
      co, Seq("order_date"), col("o_totalprice"), col("o_orderkey"), k = 17))
    val ref = toMap(reference(
      co, Seq("order_date"), col("o_totalprice"), col("o_orderkey"), k = 17))
    assert(fused.keySet == ref.keySet && fused.nonEmpty)
    fused.foreach { case (k0, v) => assert(v == ref(k0), s"day $k0 state mismatch") }
  }
}
