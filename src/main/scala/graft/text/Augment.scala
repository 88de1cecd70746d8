package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text augmentation: per-epoch word dropout (the
  * denoising/contrastive view generator — word dropout is the text
  * analog of image cropping; BART/T5-style denoising and SimCSE-style
  * contrastive training both consume randomized-but-REPRODUCIBLE
  * corrupted views). Every (doc, epoch, position) draws an md5
  * basis-point uniform, so the same corpus + epoch always yields the
  * same view (the epochShuffle determinism contract), different epochs
  * yield independent views, and NO random state crosses executors.
  *
  * Entirely ROW-LOCAL: the token array is filtered in place with a
  * position-indexed HOF — no explode, no shuffle, no reassembly join.
  * The view ships as both the kept-token text and the drop mask
  * positions (a denoising objective needs to know WHAT was dropped).
  */
object Augment {

  /** Per-position keep decision, shared verbatim with the oracle:
    * md5(doc_id|epoch|pos) as basis points < keepBp. */
  private def keepBpSql(epoch: String, pos: String): String =
    s"CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|', " +
      s"CAST($epoch AS STRING), '|', CAST($pos AS STRING))), 1, 15), 16, 10) " +
      s"AS BIGINT) % 10000"

  /** One row per (doc, epoch) with the dropped view:
    * (doc_id, epoch, n_tokens, n_kept, dropped_pos, view_text). */
  def wordDropout(documents: DataFrame, epochs: Int = 2,
                  keepBp: Int = 8500): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val eps = (0 until epochs).map(_.toLong).toDF("epoch")
    documents
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .crossJoin(broadcast(eps))
      .withColumn("keep_mask", expr(
        s"transform(sequence(1, size(toks)), p -> ${keepBpSql("epoch", "p")} < $keepBp)"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_kept", expr(
        "CAST(size(filter(keep_mask, m -> m)) AS BIGINT)"))
      .withColumn("dropped_pos", expr(
        "concat_ws(',', filter(transform(sequence(1, size(toks)), " +
          "p -> IF(element_at(keep_mask, p), NULL, CAST(p AS STRING))), x -> x IS NOT NULL))"))
      .withColumn("view_text", expr(
        "concat_ws(' ', filter(transform(sequence(1, size(toks)), " +
          "p -> IF(element_at(keep_mask, p), element_at(toks, p), NULL)), x -> x IS NOT NULL))"))
      .select("doc_id", "epoch", "n_tokens", "n_kept", "dropped_pos",
        "view_text")
  }

  /** DuckDB mirror of [[wordDropout]]. */
  def oracleSql(epochs: Int = 2, keepBp: Int = 8500): String = {
    val keep = "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|', " +
      "CAST(epoch AS VARCHAR), '|', CAST(p AS VARCHAR))), 1, 15)) AS BIGINT) % 10000"
    s"""WITH tokd AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents
       |), ep AS (SELECT unnest(range(0, $epochs)) AS epoch
       |), pos AS (
       |  SELECT doc_id, epoch, toks, unnest(range(1, len(toks) + 1)) AS p
       |  FROM tokd CROSS JOIN ep
       |), dec AS (
       |  SELECT doc_id, epoch, p, toks[p] AS tok,
       |    ($keep) < $keepBp AS keep
       |  FROM pos
       |)
       |SELECT doc_id, epoch, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  coalesce(array_to_string(list(CASE WHEN NOT keep THEN CAST(p AS VARCHAR) END
       |    ORDER BY p) FILTER (WHERE NOT keep), ','), '') AS dropped_pos,
       |  coalesce(array_to_string(list(tok ORDER BY p) FILTER (WHERE keep), ' '), '')
       |    AS view_text
       |FROM dec GROUP BY 1, 2
       |ORDER BY doc_id, epoch""".stripMargin
  }
}
