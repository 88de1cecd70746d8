package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mixture (curriculum) sampling: draw a corpus whose
  * composition matches target per-group fractions — the "data mixture"
  * step of LLM corpus assembly (e.g. 40% en / 20% zh / …, or per-source
  * weights à la The Pile / Dolma mixture tables).
  *
  * Selection must be (a) pseudo-random — a prefix-of-files cut would
  * inherit the lakehouse's time/source clustering — and (b) reproducible
  * across engines and runs. Both come from ranking inside each group by
  * `md5(group:doc_id)`: a cryptographic hash is uniform over the corpus,
  * engine-portable (identical hex in Spark and DuckDB/ANSI SQL), and
  * seedless-deterministic, so the same call always draws the same corpus
  * — the property that makes training runs repeatable.
  *
  * Scale shape: the rank is [[graft.operators.ScalableRank.topKPerGroup]]
  * (two-phase ranked cut — per-partition heaps then a constant-size
  * offset join), never a one-partition-per-group window, so a group with
  * 10¹⁰ rows at 100 TB still ranks via balanced exchanges. The per-group
  * quota map is a plan literal (groups are few; rows are many).
  */
object Mixture {

  /** Default mixture: the lang shares a multilingual curation pass
    * typically rebalances toward (matches the testdata's lang skew —
    * en-heavy corpus, en capped at 40%). */
  val DefaultTargets: Map[String, Double] =
    Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1, "fr" -> 0.1)

  /** Sample ⌊total·share⌋ documents per `lang` group, ranked by the
    * portable hash. Groups absent from `targets` are dropped (their
    * quota is 0); a group smaller than its quota contributes all its
    * rows. Output: the sampled rows + their in-group `mix_rank`. */
  def mixtureSample(documents: DataFrame,
                    targets: Map[String, Double] = DefaultTargets,
                    total: Long = 200L): DataFrame = {
    val quotas: Map[String, Long] =
      targets.map { case (g, f) => g -> math.floor(total * f).toLong }
    val kMax = quotas.values.max.toInt
    val ranked = graft.operators.ScalableRank.topKPerGroup(
      documents.select(col("doc_id"), col("lang"), col("source"))
        .withColumn("h",
          expr("md5(cast(concat(lang, ':', cast(doc_id as string)) as binary))")),
      Seq(col("lang")), Seq(col("h").asc, col("doc_id").asc), kMax, "mix_rank")
    ranked
      .withColumn("quota", element_at(typedlit(quotas), col("lang")))
      .filter(col("mix_rank") <= col("quota"))
      .select("doc_id", "lang", "source", "mix_rank")
  }

  /** DuckDB mirror of [[mixtureSample]] with the default targets. */
  def mixtureOracleSql(targets: Map[String, Double] = DefaultTargets,
                       total: Long = 200L): String = {
    val values = targets.toSeq.sorted
      .map { case (g, f) => s"('$g', ${math.floor(total * f).toLong})" }
      .mkString(", ")
    s"""WITH tgt(lang, quota) AS (VALUES $values),
       |r AS (
       |  SELECT doc_id, lang, source,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id)
       |      AS BIGINT) AS mix_rank
       |  FROM documents
       |)
       |SELECT r.doc_id, r.lang, r.source, r.mix_rank
       |FROM r JOIN tgt USING (lang)
       |WHERE r.mix_rank <= tgt.quota
       |ORDER BY doc_id""".stripMargin
  }
}
