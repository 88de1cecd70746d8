package graft

import graft.text.QualityRules
import org.apache.spark.sql.functions._

/** Gopher hard quality rules: each synthetic document fails EXACTLY the
  * rule it was built to fail (the corpus-degenerate symbol/bullet/
  * ellipsis paths included), and the evidence counts are exact. */
class QualityRulesSpec extends SparkSpec {

  // 60 prose-ish words incl. stop words → passes every rule
  private val goodText = (("the quick brown fox jumps over the lazy dog " +
    "and runs to the hills with great speed that nobody can match have ") * 3).trim

  test("each rule fails exactly the document built to fail it") {
    import spark.implicits._
    val words60 = (0 until 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, goodText),                                          // passes all
      (2L, "the doc is far too short to pass and that is that"), // word count
      (3L, (0 until 60).map(_ => "a").mkString(" ") +
        " the to of and that have with be"),                   // mean word len < 3
      (4L, ("the of and to be that have with " +
        (0 until 52).map(i => s"#tag$i").mkString(" "))),      // symbol ratio
      (5L, ("the of and to be that have with " +
        (0 until 52).map(i => s"word$i...").mkString(" ") +
        " the end")),                                          // '...' symbols too
      (6L, ("the of and to be that have with " +
        (0 until 52).map(i => (i * 7919).toString).mkString(" "))), // alpha ratio
      (7L, words60),                                           // no stop words
      (8L, (0 until 60).map(i => s"- bullet item $i the of and that")
        .mkString("\n")),                                      // bullet lines
      (9L, (0 until 60).map(i =>
        s"the line number $i of and that have with more words trailing off...")
        .mkString("\n"))                                       // ellipsis lines
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))

    val out = QualityRules.gopherQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Boolean]("passes_gopher"), "good doc must pass")
    def failsOnly(id: Long, rule: String): Unit = {
      val r = out(id)
      assert(!r.getAs[Boolean]("passes_gopher"), s"doc $id must fail")
      assert(!r.getAs[Boolean](rule), s"doc $id must fail $rule")
      val others = Seq("pass_word_count", "pass_word_len", "pass_symbols",
        "pass_alpha", "pass_stops", "pass_lines").filterNot(_ == rule)
      others.foreach(o => assert(r.getAs[Boolean](o),
        s"doc $id must fail ONLY $rule but also fails $o"))
    }
    failsOnly(2L, "pass_word_count")
    failsOnly(3L, "pass_word_len")
    failsOnly(4L, "pass_symbols")
    failsOnly(5L, "pass_symbols")
    failsOnly(6L, "pass_alpha")
    failsOnly(7L, "pass_stops")
    failsOnly(8L, "pass_lines")
    failsOnly(9L, "pass_lines")

    // scan-speed filter: one projection chain over the scan — no join,
    // no shuffle introduced by the operator itself
    val plan = QualityRules.gopherQuality(docs).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      plan.take(800))

    // evidence counts are exact where hand-computable
    assert(out(2L).getAs[Long]("n_words") == 12L)
    assert(out(4L).getAs[Long]("n_symbol_words") == 52L)
    assert(out(6L).getAs[Long]("n_alpha_words") == 8L)
    assert(out(7L).getAs[Long]("n_stop_words") == 0L)
    assert(out(8L).getAs[Long]("n_lines") == 60L)
    assert(out(8L).getAs[Long]("n_bullet_lines") == 60L)
    assert(out(9L).getAs[Long]("n_ellipsis_lines") == 60L)
  }

  test("corpus run: evidence columns are consistent") {
    val out = QualityRules.gopherQuality(Tables.documents(spark, TinySf))
    val rows = out.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alpha_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_stop_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_symbol_words") == 0L) // punctuation-free corpus
      assert(r.getAs[Long]("n_lines") == 1L)
    }
  }

  test("langIdConfusion: diagonal counts, marginals, and accuracy match hand math") {
    import graft.text.TextAnalysis
    val spark2 = spark
    import spark2.implicits._
    // en markers: the/a/...; fr markers: query/join/... ; docs labeled
    // en: 2 correctly en-looking, 1 fr-looking (a planted confusion)
    val docs = Seq(
      (1L, "the fast key", "en"), (2L, "a key order", "en"),
      (3L, "query join filter", "en"),
      (4L, "query join sort", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdConfusion(docs)
      .orderBy("actual_lang", "predicted_lang").collect()
    val byCell = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byCell(("en", "en")).getAs[Long]("n") == 2L)
    assert(byCell(("en", "fr")).getAs[Long]("n") == 1L)
    assert(byCell(("en", "fr")).getAs[Long]("actual_n") == 3L)
    assert(byCell(("en", "fr")).getAs[Double]("share_of_actual") == 1.0 / 3.0)
    assert(byCell(("fr", "fr")).getAs[Long]("n") == 1L)
    // accuracy = 3 correct of 4, constant across cells
    assert(out.forall(_.getAs[Double]("accuracy") == 0.75))
  }
}
