package graft

import graft.ml.Encodings
import graft.operators.Scd
import graft.text.Hybrid
import org.apache.spark.sql.functions._

/** Supervised encoders (WOE / K-fold OOF target encoding), the point-in-time
  * SCD2 read, and RRF hybrid retrieval fusion. */
class EncodingsSpec extends SparkSpec {

  test("priorStateJoin carries the strictly-previous state, null before the first") {
    import spark.implicits._
    val states = Seq(
      (1L, "2024-01-01", "bronze", 1L),
      (1L, "2024-01-10", "silver", 2L),
      (2L, "2024-02-01", "gold", 1L)
    ).toDF("k", "t", "tier", "version")
      .select(col("k"), col("t").cast("date").as("t"), col("tier"), col("version"))
    val events = Seq(
      (100L, 1L, "2024-01-01"), // ON the first state day -> strictly-before = none
      (101L, 1L, "2024-01-05"), // between v1 and v2 -> bronze
      (102L, 1L, "2024-01-10"), // ON the v2 day -> still bronze (strict <)
      (103L, 1L, "2024-01-20"), // after v2 -> silver
      (104L, 2L, "2024-01-15"), // before cust 2's first state -> none
      (105L, 2L, "2024-03-01")  // after -> gold
    ).toDF("id", "k", "et")
      .select(col("id"), col("k"), col("et").cast("date").as("et"))
    val out = Scd.priorStateJoin(events, states, "k", "et", "t",
        Seq("tier", "version"))
      .select("id", "prior_tier", "prior_version")
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out(100L) == (None, None))
    assert(out(101L) == (Some("bronze"), Some(1L)))
    assert(out(102L) == (Some("bronze"), Some(1L)))
    assert(out(103L) == (Some("silver"), Some(2L)))
    assert(out(104L) == (None, None))
    assert(out(105L) == (Some("gold"), Some(1L)))
  }

  test("q_pit_join prior tier agrees with a per-customer replay of the scd2 versions") {
    val pit = Queries.all("q_pit_join")(spark, TinySf)
    val rows = pit.select("o_custkey", "order_date", "prior_version", "amount_tier",
        "prior_amount_tier", "tier_changed").collect()
    assert(rows.nonEmpty)
    // tier_changed is never null and is false whenever there is no prior
    rows.foreach { r =>
      val changed = r.getBoolean(5)
      if (r.isNullAt(4)) assert(!changed)
      else assert(changed == (r.getString(4) != r.getString(3)))
    }
    // each customer's first order (min date) has no prior version
    val firstByCust = rows.groupBy(_.getLong(0)).values.map(rs =>
      rs.minBy(_.getDate(1).toLocalDate.toEpochDay))
    firstByCust.foreach(r => assert(r.isNullAt(2)))
  }

  test("woe matches a hand computation and iv contributions use the rounded woe") {
    import spark.implicits._
    // 10 rows: cat a -> 3 bad of 6; cat b -> 1 bad of 4
    val df = (Seq.fill(3)(("a", 1)) ++ Seq.fill(3)(("a", 0)) ++
        Seq.fill(1)(("b", 1)) ++ Seq.fill(3)(("b", 0)))
      .toDF("cat", "y")
    val out = Encodings.woe(df, "y", Seq("cat" -> col("cat")))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    val (badTot, goodTot) = (4.0, 6.0)
    def expWoe(nb: Double, ng: Double): Double =
      math.log(((nb + 0.5) / badTot) / ((ng + 0.5) / goodTot)).toFloat.toDouble
    val (na, nbadA, ngoodA, woeA, ivA) = out("a")
    assert((na, nbadA, ngoodA) == (6L, 3L, 3L))
    assert(woeA == expWoe(3, 3))
    assert(ivA == ((3.5 / badTot) - (3.5 / goodTot)) * woeA)
    val (_, _, _, woeB, _) = out("b")
    assert(woeB == expWoe(1, 3))
    // bad-heavier category has the higher woe
    assert(woeA > woeB)
  }

  test("targetEncodeOof excludes the row's own fold from its encoding") {
    import spark.implicits._
    // category x: fold 0 has 2 rows (both bad), fold 1 has 2 rows (none bad)
    val df = Seq(("x", 0L, 1), ("x", 0L, 1), ("x", 1L, 0), ("x", 1L, 0),
        ("y", 0L, 0), ("y", 1L, 1)).toDF("cat", "f", "y")
    val out = Encodings.targetEncodeOof(df, col("cat"), "y", col("f"), m = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // (x, fold 0): oof rows are x's fold-1 rows -> n_oof=2, sum_oof=0
    val (nOof, sumOof, prior, enc) = out(("x", 0L))
    assert((nOof, sumOof) == (2L, 0L))
    // prior excludes fold 0 globally: folds!=0 have 3 rows, 1 bad
    assert(prior == 1.0 / 3.0)
    assert(enc == (0.0 + 1.0 * prior) / (2.0 + 1.0))
    // (x, fold 1): oof = fold-0 rows -> 2 rows, 2 bad; prior over folds!=1 = 2/3...
    val (n1, s1, p1, e1) = out(("x", 1L))
    assert((n1, s1) == (2L, 2L))
    assert(p1 == 2.0 / 3.0)
    assert(e1 == (2.0 + 1.0 * p1) / (2.0 + 1.0))
  }

  test("scd2Apply over a split equals the batch build bit for bit") {
    import spark.implicits._
    val daily = graft.operators.Cleaning.cleanOrders(Tables.orders(spark, TinySf))
      .groupBy("o_custkey", "order_date")
      .agg(expr("max_by(amount_tier, o_orderkey)").as("amount_tier"))
    val cutoff = lit("1997-06-01").cast("date")
    val batch = Scd.scd2(daily, "o_custkey", "order_date", Seq("amount_tier"))
    val incr = Scd.scd2Apply(
      Scd.scd2(daily.filter(col("order_date") < cutoff),
        "o_custkey", "order_date", Seq("amount_tier")),
      daily.filter(col("order_date") >= cutoff),
      "o_custkey", "order_date", Seq("amount_tier"))
    val cols = Seq("o_custkey", "version", "amount_tier", "valid_from",
      "last_observed", "observation_count", "valid_to", "is_current")
    val b = batch.select(cols.map(col): _*).orderBy("o_custkey", "version").collect()
    val i = incr.select(cols.map(col): _*).orderBy("o_custkey", "version").collect()
    assert(b.length == i.length && b.length > 0)
    b.zip(i).foreach { case (x, y) => assert(x == y) }
  }

  test("scd2Apply extends the current run, opens new versions, admits new keys") {
    import spark.implicits._
    def obs(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", "t", "attr").select(col("k"), col("t").cast("date").as("t"), col("attr"))
    val existing = Scd.scd2(obs(Seq(
      (1L, "2024-01-01", "a"), (1L, "2024-01-02", "a"), (1L, "2024-01-05", "b"),
      (2L, "2024-01-01", "x"))), "k", "t", Seq("attr"))
    val out = Scd.scd2Apply(existing, obs(Seq(
        (1L, "2024-01-08", "b"), // same attr -> extends version 2
        (1L, "2024-01-09", "c"), // change -> version 3
        (3L, "2024-01-04", "z") // brand-new key
      )), "k", "t", Seq("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getDate(4).toString, r.getLong(5), r.getBoolean(6).asInstanceOf[Any], r.getDate(3).toString)).toMap
    // (k=1, v2): b extended through 01-08, count 2, no longer needs reopening
    assert(out((1L, 2L))._1 == "b" && out((1L, 2L))._2 == "2024-01-08"
      && out((1L, 2L))._3 == 2L)
    assert(out((1L, 3L))._1 == "c")
    // untouched key 2 passes through as current
    assert(out((2L, 1L))._1 == "x")
    // new key 3 appears with version 1
    assert(out((3L, 1L))._1 == "z" && out((3L, 1L))._5 == "2024-01-04")
  }

  test("hard negatives are the brute ranking minus near-duplicates") {
    val brute = graft.sim.Similarity.knnBrute(Tables.embeddings(spark, TinySf),
      numQueries = 5, k = 1000)
    val hard = graft.sim.Similarity.hardNegatives(Tables.embeddings(spark, TinySf),
      numQueries = 5, k = 10, dupThreshold = 0.95).collect()
    assert(hard.nonEmpty)
    // no negative is a near-duplicate, ranks contiguous from 1 per query
    hard.foreach(r => assert(r.getDouble(4) < 0.95))
    hard.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // equals filtering the full brute ranking then re-ranking
    val expected = brute.collect().filter(_.getDouble(4) < 0.95)
      .groupBy(_.getLong(0)).toSeq.flatMap { case (q, rs) =>
        rs.sortBy(r => (-r.getDouble(4), r.getLong(2))).take(10).zipWithIndex
          .map { case (r, i) => (q, i + 1L, r.getLong(2), r.getDouble(4)) }
      }.toSet
    val got = hard.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))).toSet
    assert(got == expected)
  }

  test("robust scaler matches a driver-side exact computation") {
    val out = Queries.all("q_robust_scaler")(spark, TinySf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("l_quantity", "l_extendedprice", "l_discount"))
    val vals = graft.operators.Cleaning.cleanLineitem(Tables.lineitem(spark, TinySf))
      .select("l_quantity").collect().map(_.getDouble(0)).sorted
    def interp(p: Double): Double = {
      val pos = p * (vals.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (lo == hi) vals(lo)
      else (hi - pos) * vals(lo) + (pos - lo) * vals(hi)
    }
    val r = out("l_quantity")
    assert(r.getLong(1) == vals.length)
    assert(r.getDouble(2) == vals.head && r.getDouble(3) == vals.last)
    assert(math.abs(r.getDouble(4) - vals.sum / vals.length) < 1e-9)
    assert(r.getDouble(6) == interp(0.25) && r.getDouble(7) == interp(0.5)
      && r.getDouble(8) == interp(0.75))
    assert(r.getDouble(9) == r.getDouble(8) - r.getDouble(6))
    // std positive and consistent with the population formula
    val mean = vals.sum / vals.length
    val popStd = math.sqrt(vals.map(v => v * v).sum / vals.length - mean * mean)
    assert(math.abs(r.getDouble(5) - popStd) < 1e-6)
  }

  test("epoch shuffle: exact permutations per epoch, independent across epochs") {
    val out = Queries.all("q_epoch_shuffle")(spark, TinySf).collect()
    val byEpoch = out.groupBy(_.getLong(0))
    assert(byEpoch.keySet == Set(0L, 1L))
    // each epoch is a complete 1..n permutation of the corpus
    byEpoch.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.map(_.getLong(2)).distinct.length == rs.length)
    }
    // the two epochs order the corpus differently (independent permutations)
    def order(e: Long) = byEpoch(e).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(order(0L) != order(1L))
    // and the shuffle is reproducible: a recompute yields the same order
    val again = Queries.all("q_epoch_shuffle")(spark, TinySf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("leakage-free split keeps every dedup cluster in one split") {
    val out = Queries.all("q_split_leakage_free")(spark, TinySf).collect()
    assert(out.nonEmpty)
    // one split per cluster — a near-dup can never straddle train/eval
    out.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getString(3)).distinct.length == 1)
    }
    // and the split assignment is the documented md5-bp rule on cluster_id
    out.foreach { r =>
      val bp = r.getLong(2)
      val expected = if (bp < 8000) "train" else if (bp < 9000) "validation" else "test"
      assert(r.getString(3) == expected)
    }
  }

  test("rrf fusion sums exactly the per-list reciprocal ranks") {
    val out = Queries.all("q_hybrid_rrf")(spark, TinySf).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val lex = Option(r.get(3)).map(_.asInstanceOf[Long])
      val sem = Option(r.get(4)).map(_.asInstanceOf[Long])
      assert(lex.isDefined || sem.isDefined)
      val exp = lex.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getDouble(2) == exp)
    }
    // ranks are 1..n with strictly non-increasing scores
    val scores = out.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(out.map(_.getLong(0)).sorted.toSeq == (1L to out.length).toSeq)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
