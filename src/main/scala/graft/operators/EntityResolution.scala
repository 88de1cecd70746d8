package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution: duplicate-account detection by
  * approximate identity match — the account-takeover / multi-account
  * signal next to [[graft.gold.Rings]]' shared-device view (ref
  * spark_jobs/silver/transform_transactions.py normalizes user records
  * but matches only on exact keys; real fraud rings vary one character).
  *
  * Shape: the canonical three-stage ER pipeline —
  *   1. BLOCK: candidate pairs only within a cheap equality block
  *      (nation × market segment), never a corpus cross join;
  *   2. GOVERN: blocks above `maxBlock` are excluded *before* any pair
  *      exists by a deterministic occupancy predicate (the LSH
  *      hot-bucket / Rings governor — pair volume is Σ m² over block
  *      occupancies, so one degenerate block is the quadratic hazard);
  *   3. VERIFY: exact pairwise rule on the candidates — Levenshtein
  *      edit distance on the name (a codegen'd built-in in both
  *      engines, unit costs, so cross-engine exact) AND an absolute
  *      account-balance band (double subtraction of identical parquet
  *      values — IEEE-exact).
  *
  * At 100 TB the blocking key would be a learned/sorted-neighborhood
  * key; the governor + verify contract is unchanged — candidates are
  * bounded per block, the verify is row-local per pair, and the plan
  * is one self-join at block grain plus a partial-agged occupancy
  * count. No stage sees node×node.
  */
object EntityResolution {

  /** Matched near-duplicate customer pairs (cust_a < cust_b). */
  def matchCustomers(customer: DataFrame,
                     maxEdit: Int = 2,
                     maxBalDiff: Double = 100.0,
                     maxBlock: Int = 500): DataFrame = {
    val c = customer.select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_mktsegment"), col("c_acctbal"))

    val sized = c.groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") >= 2 && col("_occ") <= maxBlock)
      .select("c_nationkey", "c_mktsegment")
    val admitted = c.join(sized, Seq("c_nationkey", "c_mktsegment"))

    val a = admitted.select(
      col("c_nationkey"), col("c_mktsegment"),
      col("c_custkey").as("cust_a"), col("c_name").as("name_a"),
      col("c_acctbal").as("bal_a"))
    val b = admitted.select(
      col("c_nationkey"), col("c_mktsegment"),
      col("c_custkey").as("cust_b"), col("c_name").as("name_b"),
      col("c_acctbal").as("bal_b"))
    // levenshtein_leq (functions/BandedLevenshtein): Ukkonen's banded DP —
    // O(maxEdit·|name|) per pair instead of the built-in's full O(n·m)
    // matrix. Above the band it returns maxEdit+1, which the filter drops;
    // on the band the value IS the exact distance, so the output is
    // bit-identical to the built-in (FunctionsSpec proves equality).
    a.join(b, Seq("c_nationkey", "c_mktsegment"))
      .filter(col("cust_a") < col("cust_b"))
      .withColumn("edit_dist",
        expr(s"levenshtein_leq(name_a, name_b, $maxEdit)"))
      .withColumn("bal_diff", abs(col("bal_a") - col("bal_b")))
      .filter(col("edit_dist") <= maxEdit && col("bal_diff") <= maxBalDiff)
      .select(col("cust_a"), col("cust_b"), col("c_nationkey"),
        col("c_mktsegment"), col("edit_dist"), col("bal_diff"))
      .orderBy("cust_a", "cust_b")
  }

  /** Jaro–Winkler-scored variant of the same BLOCK → GOVERN → VERIFY
    * pipeline: edit distance treats one typo anywhere equally, but
    * identity fraud concentrates edits in the suffix (prefix-preserving
    * mutations survive casual review), which Jaro–Winkler's prefix
    * boost weights exactly. Score is the codegen'd native
    * [[graft.functions.JaroWinkler]] expression — one static call per
    * pair inside the whole-stage-codegen span, no UDF boxing. The
    * float32 collapse makes the score hash-exact against DuckDB's
    * `jaro_winkler_similarity` (semantics probed and pinned; see the
    * expression's doc). */
  def matchCustomersJw(customer: DataFrame,
                       minSim: Double = 0.97,
                       maxBlock: Int = 500): DataFrame = {
    val c = customer.select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_mktsegment"))

    val sized = c.groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") >= 2 && col("_occ") <= maxBlock)
      .select("c_nationkey", "c_mktsegment")
    val admitted = c.join(sized, Seq("c_nationkey", "c_mktsegment"))

    val a = admitted.select(
      col("c_nationkey"), col("c_mktsegment"),
      col("c_custkey").as("cust_a"), col("c_name").as("name_a"))
    val b = admitted.select(
      col("c_nationkey"), col("c_mktsegment"),
      col("c_custkey").as("cust_b"), col("c_name").as("name_b"))
    a.join(b, Seq("c_nationkey", "c_mktsegment"))
      .filter(col("cust_a") < col("cust_b"))
      .withColumn("jw_sim",
        expr("jaro_winkler(name_a, name_b)").cast("float").cast("double"))
      .filter(col("jw_sim") >= minSim)
      .select(col("cust_a"), col("cust_b"), col("c_nationkey"),
        col("c_mktsegment"), col("jw_sim"))
      .orderBy("cust_a", "cust_b")
  }
}
