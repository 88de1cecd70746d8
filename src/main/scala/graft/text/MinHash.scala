package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection.
  *
  * Pipeline: word 3-gram shingles → k=16 min-hashes (min over md5(seed|s))
  * → 4 bands of 4 → band-bucket self-join → candidate pairs → exact
  * n-gram Jaccard verification on candidates only.
  *
  * Scale shape: signatures are linear per document (shingling is a
  * projection, no shuffle); banding turns the O(n²) all-pairs problem into
  * per-bucket joins — the self-join shuffles 4 small (band_hash, doc_id)
  * rows per document, never the text. Exact Jaccard runs only on LSH
  * survivors. md5-based hashing keeps every stage reproducible across
  * engines and runs (no seed state).
  */
object MinHash {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  private def wordsCol: Column = split(col("text"), " ")

  /** Word 3-gram shingles (degenerates to the full text when < 3 words). */
  def shingles(text: Column): Column =
    expr("transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "j -> concat_ws(' ', slice(split(text, ' '), j, 3)))")

  /** doc_id + sig_0..sig_{k-1} minhash signature columns. */
  def signatures(documents: DataFrame): DataFrame = {
    val withShingles = documents.select(col("doc_id"), shingles(col("text")).as("sh"))
    val sigCols = (0 until NumHashes).map { i =>
      array_min(transform(col("sh"), s => md5(concat(lit(i.toString), lit("|"), s))))
        .as(s"sig_$i")
    }
    withShingles.select(col("doc_id") +: sigCols: _*)
  }

  /** (doc_id, band_idx, band_hash) — one row per band. */
  def bands(sigs: DataFrame): DataFrame = {
    val bandRows = (0 until Bands).map { b =>
      val cols = (b * RowsPerBand until (b + 1) * RowsPerBand).map(i => col(s"sig_$i"))
      sigs.select(col("doc_id"), lit(b.toLong).as("band_idx"),
        md5(concat_ws("|", cols: _*)).as("band_hash"))
    }
    bandRows.reduce(_.unionByName(_))
  }

  /** Candidate near-dup pairs: docs sharing any band bucket. */
  def candidatePairs(documents: DataFrame): DataFrame = {
    val b = bands(signatures(documents))
    val l = b.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val r = b.select(col("band_idx").as("r_band_idx"), col("band_hash").as("r_band_hash"),
      col("doc_id").as("doc_b"))
    l.join(r, col("band_idx") === col("r_band_idx") &&
        col("band_hash") === col("r_band_hash") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact shingle-Jaccard over bounded same-lang pairs (doc_id < maxDocId)
    * — the standalone n-gram Jaccard operator, bounded blocking keeps the
    * pair count constant per lang at any corpus size. */
  def exactJaccardPairs(documents: DataFrame, maxDocId: Long = 40): DataFrame = {
    val d = documents.filter(col("doc_id") < maxDocId)
      .select(col("doc_id"), col("lang"), array_distinct(shingles(col("text"))).as("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("lang"), col("sh").as("sha"))
    val b = d.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("sh").as("shb"))
    a.join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b"))
      .withColumn("inter_size",
        size(filter(col("sha"), t => array_contains(col("shb"), t))).cast("long"))
      .withColumn("union_size",
        size(col("sha")).cast("long") + size(col("shb")).cast("long") - col("inter_size"))
      .withColumn("jaccard", col("inter_size").cast("double") / col("union_size"))
      .select("doc_a", "doc_b", "lang", "inter_size", "union_size", "jaccard")
  }

  // ---- DuckDB oracle builders (generated from the same constants so the
  //      oracle can never drift from the Spark implementation) ----

  /** Shingle list in DuckDB list-function form. */
  val ShinglesSqlCte: String =
    """WITH sh AS (
      |  SELECT doc_id, lang,
      |    list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      |      j -> array_to_string(string_split(text, ' ')[j:j+2], ' ')) AS sh
      |  FROM documents
      |)""".stripMargin

  private def sigExpr(i: Int): String =
    s"list_aggregate(list_transform(sh, s -> md5('$i|' || s)), 'min') AS sig_$i"

  /** Oracle for `signatures`. */
  def signaturesOracleSql: String =
    ShinglesSqlCte +
      s"""
         |SELECT doc_id, ${(0 until NumHashes).map(sigExpr).mkString(",\n  ")}
         |FROM sh ORDER BY doc_id""".stripMargin

  /** Oracle for `nearDupPairs`. */
  def nearDupOracleSql: String = {
    val sigList = (0 until NumHashes).map(sigExpr).mkString(",\n    ")
    val bandSelects = (0 until Bands).map { bnd =>
      val cols = (bnd * RowsPerBand until (bnd + 1) * RowsPerBand)
        .map(i => s"sig_$i").mkString(" || '|' || ")
      s"SELECT doc_id, CAST($bnd AS BIGINT) AS band_idx, md5($cols) AS band_hash FROM sig"
    }.mkString("\n    UNION ALL ")
    val agreement = (0 until NumHashes)
      .map(i => s"(CASE WHEN sa.sig_$i = sb.sig_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    ShinglesSqlCte +
      s"""
         |, sig AS (
         |  SELECT doc_id, $sigList
         |  FROM sh
         |), band AS (
         |    $bandSelects
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM band a JOIN band b ON a.band_idx = b.band_idx
         |    AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |), est AS (
         |  SELECT doc_a, doc_b,
         |    CAST($agreement AS DOUBLE) / CAST(${NumHashes}.0 AS DOUBLE) AS est_jaccard
         |  FROM pairs JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id
         |), voc AS (
         |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS vocab FROM documents
         |), jac AS (
         |  SELECT e.doc_a, e.doc_b, e.est_jaccard,
         |    CAST(len(list_filter(va.vocab, t -> list_contains(vb.vocab, t))) AS BIGINT) AS inter_size,
         |    CAST(len(va.vocab) AS BIGINT) AS na, CAST(len(vb.vocab) AS BIGINT) AS nb
         |  FROM est e JOIN voc va ON e.doc_a = va.doc_id JOIN voc vb ON e.doc_b = vb.doc_id
         |)
         |SELECT doc_a, doc_b, est_jaccard, inter_size,
         |  na + nb - inter_size AS union_size,
         |  CAST(inter_size AS DOUBLE) / (na + nb - inter_size) AS exact_jaccard
         |FROM jac ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Oracle for `exactJaccardPairs`. */
  def exactJaccardOracleSql(maxDocId: Long = 40): String =
    ShinglesSqlCte.replace("FROM documents", s"FROM documents WHERE doc_id < $maxDocId") +
      s"""
         |, d AS (SELECT doc_id, lang, list_distinct(sh) AS sh FROM sh)
         |, j AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
         |    CAST(len(list_filter(a.sh, t -> list_contains(b.sh, t))) AS BIGINT) AS inter_size,
         |    CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb
         |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, lang, inter_size, na + nb - inter_size AS union_size,
         |  CAST(inter_size AS DOUBLE) / (na + nb - inter_size) AS jaccard
         |FROM j ORDER BY doc_a, doc_b""".stripMargin

  /** Candidates + estimated (signature agreement) and exact n-gram Jaccard.
    * Exact set ops run only on LSH candidates. */
  def nearDupPairs(documents: DataFrame): DataFrame = {
    val sigs = signatures(documents)
    val sigAgreement = (0 until NumHashes)
      .map(i => when(col(s"a.sig_$i") === col(s"b.sig_$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / lit(NumHashes.toDouble)
    val docsW = documents.select(col("doc_id"), array_distinct(wordsCol).as("vocab"))

    candidatePairs(documents)
      .join(sigs.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sigs.as("b"), col("doc_b") === col("b.doc_id"))
      .withColumn("est_jaccard", sigAgreement)
      .select("doc_a", "doc_b", "est_jaccard")
      .join(docsW.select(col("doc_id").as("doc_a"), col("vocab").as("va")), "doc_a")
      .join(docsW.select(col("doc_id").as("doc_b"), col("vocab").as("vb")), "doc_b")
      .withColumn("inter_size",
        size(filter(col("va"), t => array_contains(col("vb"), t))).cast("long"))
      .withColumn("union_size",
        size(col("va")).cast("long") + size(col("vb")).cast("long") - col("inter_size"))
      .withColumn("exact_jaccard",
        col("inter_size").cast("double") / col("union_size"))
      .select("doc_a", "doc_b", "est_jaccard", "inter_size", "union_size", "exact_jaccard")
  }
}
