package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance reduction for revenue experiments (Deng, Xu, Kohavi &
  * Walker, WSDM 2013): adjust each unit's experiment-period metric by its
  * PRE-period covariate, y' = y − θ(x − x̄) with θ = cov(x,y)/var(x), so
  * the arm means keep their expectation while their variance drops by the
  * squared correlation — the standard trick that makes small revenue
  * effects detectable without more traffic.
  *
  * Exactness (§4): x and y are exact DECIMAL sums per customer; θ and x̄
  * come from exact decimal power sums (Sx, Sy, Sxx, Sxy) with one IEEE
  * chain; the adjusted metric is a double, so its per-arm sums are
  * micro/nano-quantized integers (the UnigramLm contract) — never a raw
  * float sum across rows. One customer-grain exchange, a 1-row scalar
  * broadcast back, one arm-grain rollup.
  */
object Experiment {

  /** Split `orders` into pre/experiment periods at `cutoff`, assign arms
    * by customer parity (the deterministic stand-in for a real assignment
    * table), and report per-arm n / mean / variance for the raw and the
    * CUPED-adjusted metric plus θ and the variance-reduction ratio. */
  def cuped(cleanOrders: DataFrame,
            cutoff: String = "1997-01-01"): DataFrame = {
    val cutoffD = to_date(lit(cutoff))
    val dec = "decimal(38,6)"
    val perCust = cleanOrders
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("order_date") < cutoffD,
          col("o_totalprice").cast("decimal(18,2)")).otherwise(lit(0)))
          .cast("decimal(18,2)").as("x"),
        sum(when(col("order_date") >= cutoffD,
          col("o_totalprice").cast("decimal(18,2)")).otherwise(lit(0)))
          .cast("decimal(18,2)").as("y"))
      .withColumn("arm",
        when(col("o_custkey") % 2 === 0, lit("A")).otherwise(lit("B")))
    // pooled moments as exact decimal sums, one IEEE chain for theta/xbar
    val moments = perCust.agg(
        count(lit(1)).cast("long").as("n_all"),
        sum(col("x").cast(dec)).cast(dec).as("sx"),
        sum(col("y").cast(dec)).cast(dec).as("sy"),
        sum((col("x") * col("x")).cast(dec)).cast(dec).as("sxx"),
        sum((col("x") * col("y")).cast(dec)).cast(dec).as("sxy"))
      .select(
        ((col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") /
            col("n_all").cast("double")) /
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("n_all").cast("double"))).as("theta"),
        (col("sx").cast("double") / col("n_all").cast("double")).as("xbar"))
    // quantization scales: means at micro (y ≤ ~1e7 ⇒ y·1e6 ≤ 1e13),
    // second moments at MILLI (y² ≤ ~1e14 ⇒ y²·1e3 ≤ 1e17 per row — a
    // micro scale would overflow the per-row long); sums as decimal(38,0)
    def micro(c: Column): Column = floor(c * lit(1e6)).cast("long")
    def milli2(c: Column): Column = floor(c * c * lit(1e3)).cast("long")
    val sumDec = "decimal(38,0)"
    val adjusted = perCust.crossJoin(broadcast(moments))
      .withColumn("y_adj", col("y").cast("double") -
        col("theta") * (col("x").cast("double") - col("xbar")))
      .select(col("arm"), col("theta"),
        col("y").cast("decimal(18,2)").as("y_dec"),
        micro(col("y_adj")).as("ya_micro"),
        milli2(col("y_adj")).as("ya2_milli"),
        milli2(col("y").cast("double")).as("y2_milli"))
    adjusted.groupBy("arm", "theta")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y_dec")).cast("decimal(38,2)").as("_ysum"),
        sum(col("y2_milli").cast(sumDec)).cast(sumDec).as("_y2"),
        sum(col("ya_micro").cast(sumDec)).cast(sumDec).as("_ya"),
        sum(col("ya2_milli").cast(sumDec)).cast(sumDec).as("_ya2"))
      .select(col("arm"), col("n"), col("theta"),
        (col("_ysum").cast("double") / col("n").cast("double")).as("mean_y"),
        (col("_ya").cast("double") / lit(1e6) / col("n").cast("double"))
          .as("mean_y_adj"),
        (col("_y2").cast("double") / lit(1e3) / col("n").cast("double") -
          (col("_ysum").cast("double") / col("n").cast("double")) *
            (col("_ysum").cast("double") / col("n").cast("double")))
          .as("var_y"),
        (col("_ya2").cast("double") / lit(1e3) / col("n").cast("double") -
          (col("_ya").cast("double") / lit(1e6) / col("n").cast("double")) *
            (col("_ya").cast("double") / lit(1e6) / col("n").cast("double")))
          .as("var_y_adj"))
      .withColumn("var_reduction",
        lit(1.0) - col("var_y_adj") / col("var_y"))
  }

  /** Difference-in-differences revenue estimator (Card & Krueger 1994
    * two-period panel form): each customer contributes a pre-period and a
    * post-period outcome (decimal sums, 0 when absent — the balanced-panel
    * convention); with d_i = post_i − pre_i, the effect is
    *   DiD = mean(d | treated) − mean(d | control),
    * which nets out both the stable unit level (differencing) and the
    * common time shock (the control arm). Arms by customer parity — the
    * same deterministic stand-in as [[cuped]]. Reported per arm: n,
    * mean_pre, mean_post, mean_diff, var_diff; the scalar did_estimate,
    * se_did = sqrt(varA/nA + varB/nB) and t_stat repeat on both rows.
    *
    * Exactness (§4): pre/post/d are exact decimal sums; d² is
    * milli-quantized per customer before the integer cell sum (the cuped
    * second-moment contract); means/vars/se are one fixed-order IEEE
    * chain (sqrt is IEEE-exact), so the output hash-matches the oracle.
    * Scale: one customer-grain exchange, one 2-row arm rollup, a 1-row
    * scalar broadcast back — same shape as cuped.
    */
  def diffInDiff(cleanOrders: DataFrame,
                 cutoff: String = "1997-01-01"): DataFrame = {
    val cutoffD = to_date(lit(cutoff))
    val perCust = cleanOrders
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("order_date") < cutoffD,
          col("o_totalprice").cast("decimal(18,2)")).otherwise(lit(0)))
          .cast("decimal(18,2)").as("pre"),
        sum(when(col("order_date") >= cutoffD,
          col("o_totalprice").cast("decimal(18,2)")).otherwise(lit(0)))
          .cast("decimal(18,2)").as("post"))
      .withColumn("arm",
        when(col("o_custkey") % 2 === 0, lit("A")).otherwise(lit("B")))
      .withColumn("d", (col("post") - col("pre")).cast("decimal(18,2)"))
      // d spans ±~1e6; d²·1e3 ≤ ~1e15 per row — safe in a long (the
      // cuped milli-scale reasoning)
      .withColumn("d2_milli",
        floor(col("d").cast("double") * col("d").cast("double") * lit(1e3))
          .cast("long"))
    val sumDec = "decimal(38,0)"
    val arms = perCust.groupBy("arm")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("pre")).cast("decimal(38,2)").as("_spre"),
        sum(col("post")).cast("decimal(38,2)").as("_spost"),
        sum(col("d")).cast("decimal(38,2)").as("_sd"),
        sum(col("d2_milli").cast(sumDec)).cast(sumDec).as("_sd2"))
      .select(col("arm"), col("n"),
        (col("_spre").cast("double") / col("n").cast("double")).as("mean_pre"),
        (col("_spost").cast("double") / col("n").cast("double")).as("mean_post"),
        (col("_sd").cast("double") / col("n").cast("double")).as("mean_diff"),
        (col("_sd2").cast("double") / lit(1e3) / col("n").cast("double") -
          (col("_sd").cast("double") / col("n").cast("double")) *
            (col("_sd").cast("double") / col("n").cast("double")))
          .as("var_diff"))
    val scalars = arms.agg(
        sum(when(col("arm") === "A", col("mean_diff"))).as("_mdA"),
        sum(when(col("arm") === "B", col("mean_diff"))).as("_mdB"),
        sum(when(col("arm") === "A", col("var_diff") / col("n").cast("double"))).as("_vnA"),
        sum(when(col("arm") === "B", col("var_diff") / col("n").cast("double"))).as("_vnB"))
      .select((col("_mdA") - col("_mdB")).as("did_estimate"),
        sqrt(col("_vnA") + col("_vnB")).as("se_did"))
      .withColumn("t_stat", col("did_estimate") / col("se_did"))
    arms.crossJoin(broadcast(scalars))
  }
}
