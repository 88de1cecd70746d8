package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate candidate graph: the
  * cluster step of an LLM-corpus dedup pipeline (LSH pairs → components →
  * one canonical document per component).
  *
  * Algorithm: iterative min-label propagation — every node starts labeled
  * with its own id; each round replaces a node's label with the minimum
  * over itself and its neighbors; fixpoint = every node carries its
  * component's minimum id. Rounds needed = graph diameter, and near-dup
  * components are dense/shallow (pairs share LSH buckets), so convergence
  * is a handful of rounds. Each round is one balanced edge-join shuffle +
  * a map-side-combined min aggregate — no single-partition stage; lineage
  * is truncated per round (localCheckpoint; at cluster scale a
  * reliable-storage checkpoint). Convergence is detected by the exact sum
  * of labels (strictly decreasing until fixpoint — one cheap scalar
  * aggregate per round, no change-count join).
  */
object Components {

  /** (id, cluster_id) for every node; cluster_id = min node id reachable.
    * `edges` is one row per undirected edge (src, dst).
    *
    * Throws if the fixpoint is not reached within `maxIter` rounds
    * (component diameter > maxIter) — a partial result would silently
    * mislabel clusters; failing loud keeps the correctness contract. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 64): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint()
    var prevSum = BigDecimal(-1)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym
        .join(labels.select(col("id").as("m_src"), col("label").as("m_label")),
          col("src") === col("m_src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("m_label")).as("nmin"))
      val next = labels
        .join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      val sumRaw = next.agg(org.apache.spark.sql.functions.sum(
        col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0)
      val sum = if (sumRaw == null) BigDecimal(0) else BigDecimal(sumRaw)
      labels = next
      converged = sum == prevSum
      prevSum = sum
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter) — refusing to return partial labels")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** The end-to-end dedup policy of a real corpus pipeline: LSH candidate
    * pairs → connected components → keep the HIGHEST-QUALITY document of
    * each cluster (not the lowest id — quality-aware representative
    * selection). Returns one row per kept document with its cluster
    * provenance; selection is a two-phase grouped top-1 (a boilerplate
    * cluster can be huge). */
  def dedupKeepBest(documents: DataFrame): DataFrame = {
    val clusters = dedupClusters(documents)
      .select(col("doc_id").as("c_doc_id"), col("cluster_id"), col("cluster_size"))
    val scored = TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .join(clusters, col("doc_id") === col("c_doc_id"))
    graft.operators.ScalableRank.topKPerGroup(
        scored, Seq(col("cluster_id")),
        Seq(col("quality_score").desc, col("doc_id").asc), 1, "keep_rank")
      .select(col("doc_id"), col("lang"), col("cluster_id"),
        col("cluster_size"), col("quality_score"))
  }

  /** Dedup clustering over documents: LSH candidate pairs → components →
    * cluster size + canonical flag (keep is_canonical, drop the rest — the
    * group-dedup contract of a corpus pipeline). */
  def dedupClusters(documents: DataFrame): DataFrame = {
    val nodes = documents.select(col("doc_id").as("id"))
    val edges = MinHash.candidatePairs(documents)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val cc = connectedComponents(nodes, edges)
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("id") === col("cluster_id")).as("is_canonical"))
  }
}
