package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact all-pairs set-similarity self-join with prefix + positional
  * filtering — the All-Pairs / PPJoin family (Bayardo et al., WWW 2007;
  * Xiao et al., WWW 2008). The EXACT counterpart to the governed
  * MinHash-LSH path: same feature space (distinct word 3-gram shingles,
  * [[MinHash.shingles]]), but the output is provably ALL pairs with
  * Jaccard ≥ t — no probabilistic misses — while still never forming the
  * all-pairs product.
  *
  * How it avoids O(n²) at 100 TB:
  *
  *  1. every document's shingle set is reordered RAREST-FIRST by global
  *     document frequency (one vocab-grain exchange; the (df, shingle)
  *     struct sort makes the total order deterministic);
  *  2. only each document's PREFIX explodes into the candidate index —
  *     prefix length |d| − ⌈t·|d|⌉ + 1, so at t = 0.5 half the set, and
  *     the exploded tokens are by construction the RAREST in the corpus:
  *     posting lists stay short exactly where an equi-join would blow up
  *     (prefix-filter lemma: two sets with J ≥ t must share a prefix
  *     token — proof in the spec, verified property-style);
  *  3. candidates prune further by the Jaccard length bound
  *     t·|b| ≤ |a| ≤ |b|/t and the PPJoin positional bound
  *     o ≤ min(pa−1, pb−1) + 1 + min(|a|−pa, |b|−pb) taken at every
  *     shared prefix token (min-aggregated per pair, compared to the
  *     required overlap ⌈t/(1+t)·(|a|+|b|)⌉ in exact integer arithmetic);
  *  4. survivors verify with the O(|a|+|b|) `sorted_intersect_count`
  *     codegen expression on the lex-sorted sets; the final threshold is
  *     the integer comparison inter·q ≥ union·p (t = p/q), so no float
  *     edge can flip membership.
  *
  * All arithmetic before the output's jaccard column is integer-exact;
  * jaccard itself is one IEEE division of two exact BIGINTs → the result
  * hash-matches the oracle's brute-force all-pairs join at sf0.01 while
  * the Spark plan never materializes the quadratic pair space.
  */
object SetSimJoin {

  /** Previous call's rarest-first ordered-sets cache (released on the next
    * call and by the central CacheRegistry sweep between queries). The
    * ordered frame feeds FOUR consumers — both prefix sides of the
    * candidate self-join and both verify-array joins — and its final
    * aggregate (collect_list + struct sort per document) is the CPU-heavy
    * part above the reused exchange, so uncached it runs once per
    * consumer (guide §2.4/§5). */
  @volatile private var lastOrdered: Option[DataFrame] = None
  def releaseCache(): Unit = synchronized {
    lastOrdered.foreach(_.unpersist(blocking = false))
    lastOrdered = None
  }

  /** Jaccard threshold t = ThrNum/ThrDen (rational so every filter stays
    * in integer arithmetic). 0.5 keeps the planted near-dup families of
    * the synthetic corpus and nothing else. */
  val ThrNum = 1
  val ThrDen = 2

  /** Exact Jaccard-≥-t pairs over distinct word-3-gram shingle sets.
    * Output: (doc_a, doc_b, size_a, size_b, inter_size, union_size,
    * jaccard), doc_a < doc_b. */
  def ppJoin(documents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    val base = documents.select(col("doc_id"),
      array_distinct(MinHash.shingles(col("text"))).as("sh"))

    // Global rarest-first order: df per shingle (vocab-grain exchange),
    // then each doc's set rebuilt sorted by (df, shingle) — collect_list
    // order is free because array_sort on the struct pins it.
    val tok = base.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val dfreq = tok.groupBy("shingle").agg(count(lit(1)).as("df"))
    releaseCache()
    val ordered = tok.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ord"))
      .select(col("doc_id"),
        expr("transform(ord, x -> x.shingle)").as("toks"),
        size(col("ord")).cast("long").as("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized { lastOrdered = Some(ordered) }

    // Prefix length |d| − ⌈t|d|⌉ + 1 (integer ceil of t·sz).
    val ceilT = expr(s"(sz * $ThrNum + ${ThrDen - 1}) DIV $ThrDen")
    val prefixed = ordered
      .withColumn("plen", (col("sz") - ceilT + lit(1L)).cast("int"))
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("toks"), lit(1), col("plen"))).as(Seq("pos0", "shingle")))

    val a = prefixed.select(col("shingle"), col("doc_id").as("doc_a"),
      col("sz").as("sa"), (col("pos0") + 1).cast("long").as("pa"))
    val b = prefixed.select(col("shingle").as("sh_b"), col("doc_id").as("doc_b"),
      col("sz").as("sb"), (col("pos0") + 1).cast("long").as("pb"))

    // Equi-join on the (rare) prefix token; length bound in integers.
    val cand = a.join(b,
        col("shingle") === col("sh_b") && col("doc_a") < col("doc_b") &&
        col("sa") * ThrDen >= col("sb") * ThrNum &&
        col("sb") * ThrDen >= col("sa") * ThrNum)
      // PPJoin positional bound on the overlap, valid at every shared
      // token because both sides index positions in the SAME global order.
      .withColumn("ub",
        least(col("pa") - 1, col("pb") - 1) + 1 +
        least(col("sa") - col("pa"), col("sb") - col("pb")))
      .groupBy("doc_a", "doc_b", "sa", "sb")
      .agg(min(col("ub")).as("min_ub"))
      // required overlap α = ⌈t/(1+t)·(sa+sb)⌉ ⇒ keep iff ub·(p+q) ≥ p·(sa+sb)
      .filter(col("min_ub") * (ThrNum + ThrDen) >= (col("sa") + col("sb")) * ThrNum)

    // Exact verify on lex-sorted sets (O(n+m) merge intersect, codegen).
    // Derived from the SAME `ordered` subtree as the prefixes — all four
    // consumers (a/b prefix sides, a/b verify sides) share one
    // tokenize+df+rebuild lineage, so AQE stage reuse dedupes the heavy
    // exchanges instead of re-scanning the corpus for the verify arrays.
    val lex = ordered.select(col("doc_id"), array_sort(col("toks")).as("lexsh"))
    cand
      .join(lex.select(col("doc_id").as("doc_a"), col("lexsh").as("lex_a")), "doc_a")
      .join(lex.select(col("doc_id").as("doc_b"), col("lexsh").as("lex_b")), "doc_b")
      .withColumn("inter_size", expr("sorted_intersect_count(lex_a, lex_b)"))
      .withColumn("union_size", col("sa") + col("sb") - col("inter_size"))
      .filter(col("inter_size") * ThrDen >= col("union_size") * ThrNum)
      .select(col("doc_a"), col("doc_b"),
        col("sa").as("size_a"), col("sb").as("size_b"),
        col("inter_size"), col("union_size"),
        (col("inter_size").cast("double") / col("union_size")).as("jaccard"))
  }

  /** DuckDB oracle: brute-force all-pairs exact Jaccard over the SAME
    * shingle sets ([[MinHash.ShinglesSqlCte]]'s construction) — quadratic
    * is fine at oracle scale; equality with [[ppJoin]] is exactly the
    * algorithm's correctness claim (prefix/positional filters lose no
    * qualifying pair). */
  def ppJoinOracleSql: String =
    s"""WITH sh0 AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |      j -> array_to_string(string_split(text, ' ')[j:j+2], ' '))) AS s
       |  FROM documents
       |), pp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(a.s) AS BIGINT) AS size_a, CAST(len(b.s) AS BIGINT) AS size_b,
       |    CAST(len(list_filter(a.s, t -> list_contains(b.s, t))) AS BIGINT) AS inter_size
       |  FROM sh0 a JOIN sh0 b ON a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, size_a, size_b, inter_size,
       |  size_a + size_b - inter_size AS union_size,
       |  CAST(inter_size AS DOUBLE) / (size_a + size_b - inter_size) AS jaccard
       |FROM pp
       |WHERE inter_size * $ThrDen >= (size_a + size_b - inter_size) * $ThrNum
       |ORDER BY doc_a, doc_b""".stripMargin
}
