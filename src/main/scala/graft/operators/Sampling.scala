package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample()`-style RNG sampling is not reproducible across runs, engines,
  * or repartitionings — a corpus pipeline needs the SAME sample every time
  * the job reruns (and on every engine that audits it). Here membership is
  * a pure function of the row key: an md5-derived integer in [0, 10000)
  * ("basis points") compared against the stratum's threshold. Integer
  * compare, no floats, no RNG state; adding data never flips membership of
  * existing rows. Scale shape: a filter — no shuffle, pushes past column
  * pruning, linear.
  */
object Sampling {

  /** md5-derived uniform integer in [0, 10000) from the row key (same
    * 60-bit-hex-prefix construction as MinHash's portable hashing). */
  def hashBp(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 10000

  /** Stratified deterministic sample: per-stratum sampling rates in basis
    * points (e.g. "en" → 3000 keeps 30% of English docs), `defaultBp` for
    * unlisted strata. */
  def sampleStratified(df: DataFrame, stratum: Column, key: Column,
                       ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val threshold = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, bp)) =>
      when(stratum === s, lit(bp)).otherwise(acc)
    }
    df.filter(hashBp(key) < threshold)
  }

  /** Deterministic train/validation/test assignment — the split every
    * training pipeline needs to be a pure function of the row key: rerun,
    * engine, and partitioning invariant, and APPEND-STABLE (new data never
    * reassigns an existing row, so eval sets stay uncontaminated as the
    * corpus grows). Thresholds in basis points; the remainder is test.
    * Scale shape: a row-local projection, no shuffle. */
  def hashSplit(df: DataFrame, key: Column, trainBp: Int, valBp: Int): DataFrame = {
    require(trainBp > 0 && valBp >= 0 && trainBp + valBp < 10000,
      "split thresholds must leave room for a test remainder")
    df.withColumn("split_bp", hashBp(key))
      .withColumn("split",
        when(col("split_bp") < trainBp, lit("train"))
          .when(col("split_bp") < trainBp + valBp, lit("validation"))
          .otherwise(lit("test")))
  }

  /** Token-BUDGET sampling: per stratum, walk documents in deterministic
    * hash order and keep them while the EXCLUSIVE running token total
    * stays under the stratum's budget — how an LLM data mix is actually
    * specified ("20B tokens of English"), vs. the count/rate-based cuts
    * (`sampleStratified`, `mixtureSample`). Greedy floor-crossing rule:
    * the first document whose preceding total is still under budget is
    * kept, so the kept total is ≤ budget + one document.
    *
    * The running total is ScalableRank.withGroupedPrefixSum — the
    * distributed prefix-sum primitive — so a stratum spanning most of a
    * 100 TB corpus never funnels into one partition. Deterministic and
    * append-stable in the same sense as hashSplit: a document's hash
    * position never changes, so re-running over a grown corpus keeps a
    * superset-stable prefix order. */
  def sampleTokenBudget(df: DataFrame, stratum: Column, key: Column,
                        tokens: Column, budgets: Map[String, Long],
                        defaultBudget: Long): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (s, b)) => when(stratum === s, lit(b)).otherwise(acc)
    }
    ScalableRank.withGroupedPrefixSum(
        df.withColumn("_hbp", hashBp(key)),
        stratum, Seq(col("_hbp"), key), tokens, "tokens_before")
      .filter(col("tokens_before") < budget)
      .drop("_hbp")
  }

  /** Deterministic per-epoch corpus shuffle: every training epoch gets its
    * own uniform-random but REPRODUCIBLE permutation — position = rank of
    * md5(key ":" epoch), so reruns, resumed jobs, and other engines agree
    * on the exact order (the data-loader contract for reproducible
    * training), and each epoch is an independent permutation. The global
    * per-epoch position comes from ScalableRank.withGroupedPrefixSum over
    * unit weights (an epoch's permutation spans the whole corpus — never
    * a single-partition rank). */
  def epochShuffle(df: DataFrame, key: Column, epochs: Int): DataFrame = {
    require(epochs > 0, "epochs must be positive")
    val expanded = df
      .withColumn("epoch", explode(array((0 until epochs).map(e => lit(e)): _*)))
      .withColumn("_sk",
        md5(concat(key.cast("string"), lit(":"), col("epoch").cast("string"))))
    ScalableRank.withGroupedPrefixSum(expanded, col("epoch"),
        Seq(col("_sk"), key), lit(1L), "_pos0")
      .withColumn("position", col("_pos0") + lit(1L))
      .withColumn("epoch", col("epoch").cast("long"))
      .drop("_sk", "_pos0")
  }

  /** Exactly-k-per-stratum deterministic sample: rank rows within each
    * stratum by (hash, key) — a uniform but reproducible order — and keep
    * the first k. The deterministic replacement for reservoir sampling,
    * built on the two-phase grouped top-k (no per-stratum single-partition
    * window; a stratum can span most of a 100 TB corpus). */
  def sampleFixedPerStratum(df: DataFrame, stratum: Column, key: Column,
                            k: Int): DataFrame =
    ScalableRank.topKPerGroup(
        df.withColumn("_hbp", hashBp(key)),
        Seq(stratum), Seq(col("_hbp").asc, key.asc), k, "sample_rank")
      .drop("_hbp")

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis 2006): each row draws a reproducible uniform
    * u ∈ (0, 1] from its md5 hash and ranks by the A-ES key u^(1/w) —
    * the top-k per stratum is then an exact weighted sample without
    * replacement, inclusion probability proportional to `weight`.
    * Deterministic twin of reservoir algorithm A-ES: rerun/engine/
    * partitioning invariant, like every sampler here.
    *
    * Ranking happens on ln(u)/w (monotone in the A-ES key): ln(u) is
    * quantized once to micro-nats via the UnigramLm float32-round
    * contract, so the per-row sort key is ONE IEEE division of exact
    * inputs — identical doubles in every engine. Ties (only possible
    * via quantization) break on the row key. Scale shape: row-local
    * projection + the two-phase grouped top-k; no per-stratum
    * single-partition window. */
  def sampleWeighted(df: DataFrame, stratum: Column, key: Column,
                     weight: Column, k: Int): DataFrame = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val lnU = expr(
      // (h + 1) / 2^60 ∈ (0, 1]; the >2^53 rounding in the double cast is
      // IEEE-nearest in both engines.
      "CAST(CAST(ln((CAST(_h AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(1152921504606846976.0 AS DOUBLE)) AS FLOAT) AS DOUBLE)")
    val keyed = df
      .withColumn("_h", h)
      .withColumn("_ln_u_micro", floor(lnU * lit(1000000.0)).cast("long"))
      .withColumn("es_key",
        col("_ln_u_micro").cast("double") / weight.cast("double"))
    // A-ES keeps the LARGEST u^(1/w) ⇔ largest ln(u)/w (both negative).
    ScalableRank.topKPerGroup(
        keyed, Seq(stratum), Seq(col("es_key").desc, key.asc), k, "sample_rank")
      .drop("_h", "_ln_u_micro")
  }
}
