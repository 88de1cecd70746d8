package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: deflate each document once and use
  * compressed/raw bytes as a cheap, language-agnostic proxy for
  * repetitiveness — boilerplate and template farms compress far below
  * natural prose, while encrypted/binary junk barely compresses at all.
  * The same screen the Gopher/MassiveText and RefinedWeb curation stacks
  * run alongside the rule-based filters (Rae et al. 2021 use exact
  * duplicate-text fractions; deflate is the one-pass streaming stand-in
  * that needs no vocabulary and no second scan).
  *
  * Scale shape: a PURE COLUMNAR PROJECTION — the deflate runs inside
  * whole-stage codegen through the native `deflate_len` expression
  * ([[graft.functions.DeflateLen]]: one Deflater held as operator
  * mutable state, reset per row), so the plan keeps its codegen span and
  * column pruning instead of breaking at a mapPartitions encoder
  * boundary. No shuffle, no state; embarrassingly parallel.
  *
  * Determinism: fixed level + default strategy on the JDK's zlib gives
  * identical output lengths for identical bytes within an engine version —
  * enough for the rows-only contract (re-runs and repartitionings are
  * bit-stable; no cross-engine oracle because DuckDB cannot deflate).
  * Thresholds: ratio < 0.35 flags repetitive/templated text (prose at
  * these document sizes sits well above), ratio > 0.75 flags
  * incompressible payloads — random/encrypted text sits near its
  * alphabet's entropy bound (printable ASCII ≈ 6.6 bits/char ⇒ deflate
  * ratio ≈ 0.8+), while prose lands around 0.3–0.6.
  */
object CompressRatio {

  val RepetitiveBelow = 0.35
  val IncompressibleAbove = 0.75

  /** (doc_id, n_bytes, n_compressed, compress_ratio, is_repetitive,
    * is_incompressible) per document. */
  def compressionStats(documents: DataFrame,
                       textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        expr(s"deflate_len($textCol)").as("n_compressed"))
      .withColumn("compress_ratio",
        col("n_compressed").cast("double") / col("n_bytes").cast("double"))
      .withColumn("is_repetitive", col("compress_ratio") < RepetitiveBelow)
      .withColumn("is_incompressible", col("compress_ratio") > IncompressibleAbove)
  }
}
