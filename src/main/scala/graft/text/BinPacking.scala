package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.ScalableRank

/** Whole-document sequence packing ("packing without cross-contamination",
  * the SFT/instruction-tuning variant of [[Packing]]): short documents
  * share a fixed-capacity training sequence but are never split, so no
  * attention segment ever spans two documents — the `carryover_tokens`
  * that concat-and-chunk reports (q_pack_seq_stats) is zero by
  * construction here.
  *
  * Scale shape — histogram templates, then rank assignment:
  *
  *   1. ONE corpus pass builds the token-length histogram. Lengths are
  *      capped by `capacity`, so the histogram has ≤ capacity rows — a
  *      CONSTANT bound, independent of corpus size — and collecting it is
  *      a bounded scalar aggregate, same family as the hybrid BPE
  *      trainer's vocabulary collect (Bpe.scala).
  *   2. A deterministic greedy packer ([[packHistogram]]) runs driver-side
  *      over the histogram, producing bin composition TEMPLATES with
  *      multiplicities (how many identical bins instantiate each
  *      multiset of lengths). Each round exhausts at least one length
  *      class, so the loop is O(distinct lengths) rounds — O(capacity²)
  *      work total, corpus-independent.
  *   3. A second distributed pass ranks documents within their length
  *      class (grouped prefix sum over unit weights — the
  *      [[graft.operators.ScalableRank.withGroupedPrefixSum]] primitive,
  *      never a per-length single-partition window) and maps
  *      rank → (template, occurrence, slot) through a broadcast slot
  *      table of ≤ Σ template sizes rows. Bin ids are pure arithmetic.
  *
  * Everything is a deterministic function of the corpus: rerunning or
  * repartitioning cannot move a document to a different bin.
  *
  * Documents LONGER than capacity each get their own bin above the normal
  * id space, flagged `overflow = 1` — the caller chunks or drops them;
  * this operator never silently truncates.
  *
  * Reference scope: the reference repo stops at warehouse marts
  * (warehouse/init.sql); bin packing is part of the LLM-pipeline extension
  * surface alongside chunking, concat-and-chunk packing, token-budget
  * sampling and epoch shuffle.
  */
object BinPacking {

  private def tokenCount: Column = size(split(col("text"), " ")).cast("long")

  /** One packed-bin composition template: the multiset of slot lengths
    * (desc) and how many identical bins instantiate it. */
  private[graft] final case class Strategy(lengths: Seq[Int], count: Long)

  /** Deterministic greedy histogram packing (first-fit-decreasing over
    * length classes): open a composition at the largest remaining length,
    * fill greedily with the largest lengths that still fit (a length may
    * repeat in the composition up to its remaining count), then
    * instantiate the composition as many times as its scarcest member
    * allows. Every round exhausts at least one length class entirely, so
    * the loop runs at most `distinct lengths` times. Histogram entries
    * must satisfy 0 < length ≤ capacity, count > 0. */
  private[graft] def packHistogram(hist: Map[Int, Long], capacity: Int): Seq[Strategy] = {
    val remaining = scala.collection.mutable.TreeMap.empty[Int, Long](Ordering[Int].reverse)
    hist.foreach { case (l, c) =>
      require(l > 0 && l <= capacity && c > 0, s"bad histogram entry ($l, $c)")
      remaining(l) = c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Strategy]
    while (remaining.nonEmpty) {
      val comp = scala.collection.mutable.ArrayBuffer.empty[Int]
      val used = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
      var rem = capacity
      var more = true
      while (more) {
        // iteratorFrom under the reverse ordering starts at the LARGEST
        // length <= rem — a log-time jump instead of a linear scan from
        // the top (the difference between O(cap^2 log cap) and O(cap^3)
        // at 8k-token context sizes)
        remaining.iteratorFrom(rem).find { case (l, c) => used(l) < c } match {
          case Some((l, _)) => comp += l; used(l) += 1; rem -= l
          case None => more = false
        }
      }
      // instantiate as many identical bins as the scarcest member allows
      val times = used.map { case (l, k) => remaining(l) / k }.min
      out += Strategy(comp.toSeq, times)
      used.foreach { case (l, k) =>
        val left = remaining(l) - k * times
        if (left == 0L) remaining.remove(l) else remaining(l) = left
      }
    }
    out.toSeq
  }

  /** One row per document: (doc_id, n_tokens, bin_id, overflow). No
    * non-overflow bin's token sum exceeds `capacity`; no document is
    * split across bins. */
  def packBins(documents: DataFrame, capacity: Int = 128): DataFrame = {
    require(capacity > 0)
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents.select(col("doc_id"), tokenCount.as("n_tokens"))
    val inCap = col("n_tokens") <= capacity && col("n_tokens") > 0

    // pass 1: bounded histogram of in-capacity lengths (≤ capacity rows)
    val hist = toks.filter(inCap)
      .groupBy(col("n_tokens")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val strategies = if (hist.isEmpty) Seq.empty[Strategy]
                     else packHistogram(hist, capacity)

    // slot table: per (strategy, length), the contiguous 0-based rank
    // range of that length's docs it consumes, in strategy-creation
    // order. A doc of length l at rank r in [start, end) lands in
    // bin_id = bin_offset + (r - start) div slots_per_bin.
    val slotRows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    var binOffset = 0L
    val rankCursor = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    strategies.foreach { s =>
      s.lengths.groupBy(identity).toSeq.sortBy(-_._1).foreach { case (l, slots) =>
        val k = slots.size.toLong
        val start = rankCursor(l)
        slotRows += ((l.toLong, start, start + s.count * k, k, binOffset))
        rankCursor(l) = start + s.count * k
      }
      binOffset += s.count
    }
    val normalBins = binOffset
    val slots = slotRows.toSeq
      .toDF("_len", "_rank_start", "_rank_end", "_slots_per_bin", "_bin_offset")

    // pass 2: rank docs within their length class and map arithmetically
    val ranked = ScalableRank.withGroupedPrefixSum(
      toks.filter(inCap), col("n_tokens"), Seq(col("doc_id")), lit(1L), "_rank")
    val packed = ranked
      .join(broadcast(slots),
        col("n_tokens") === col("_len") &&
          col("_rank") >= col("_rank_start") && col("_rank") < col("_rank_end"))
      .select(col("doc_id"), col("n_tokens"),
        (col("_bin_offset") +
          expr("(_rank - _rank_start) div _slots_per_bin")).as("bin_id"),
        lit(0L).as("overflow"))
    // overlong docs: one bin each, above the normal-bin id space
    val over = ScalableRank.withGroupedPrefixSum(
        toks.filter(!inCap), lit(1), Seq(col("doc_id")), lit(1L), "_rank")
      .select(col("doc_id"), col("n_tokens"),
        (lit(normalBins) + col("_rank")).as("bin_id"), lit(1L).as("overflow"))
    packed.unionByName(over)
  }

  /** Bin-grain audit of [[packBins]]: per-bin doc count, token fill and
    * slack — the utilization surface a training-throughput dashboard
    * reads. Plain partial-agg shuffle at bin grain. */
  def packBinStats(documents: DataFrame, capacity: Int = 128): DataFrame =
    packBins(documents, capacity)
      .groupBy(col("bin_id"), col("overflow"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill_tokens"))
      .withColumn("slack_tokens",
        when(col("overflow") === 0L, lit(capacity.toLong) - col("fill_tokens"))
          .otherwise(lit(0L)))
}
