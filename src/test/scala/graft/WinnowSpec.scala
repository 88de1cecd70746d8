package graft

import graft.text.Winnow
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer et al. 2003): selection must match a
  * brute-force in-memory winnow bit-for-bit, honor the shared-substring
  * guarantee, and keep the pair probe behind the occupancy governor. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  /** Reference winnow: same md5-7-hex-prefix hash, same rightmost-min
    * rule, computed with plain Scala collections. */
  private def bruteWinnow(text: String): Set[(Long, Long)] = {
    if (text.length < Winnow.K) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (1 to text.length - Winnow.K + 1).map { p =>
      val hex = md.digest(text.substring(p - 1, p - 1 + Winnow.K)
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
      (p.toLong, java.lang.Long.parseLong(hex.take(7), 16))
    }
    (Winnow.W to hs.length).flatMap { e =>
      val win = hs.slice(e - Winnow.W, e)
      val minH = win.map(_._2).min
      Seq(win.filter(_._2 == minH).maxBy(_._1)) // rightmost min
    }.map { case (p, h) => (p, h) }.toSet
  }

  private val loremA =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "magpies argue about parquet footers and shuffle partitions"
  private val loremB =
    "completely different preamble text here yet jumps over the lazy " +
      "dog too before diverging into watermark semantics entirely"

  test("fingerprint selection matches the brute-force winnow bit-for-bit") {
    val docs = Seq((1L, loremA), (2L, loremB), (3L, "short"), (4L, loremA.take(10)))
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
    assert(got.getOrElse(1L, Set.empty) === bruteWinnow(loremA))
    assert(got.getOrElse(2L, Set.empty) === bruteWinnow(loremB))
    assert(!got.contains(3L)) // shorter than K: no grams
    assert(!got.contains(4L)) // grams but no full window (10-8+1=3 < W)
  }

  test("shared substrings of length >= K+W-1 guarantee a shared fingerprint hash") {
    // loremA and loremB share "jumps over the lazy dog" (23 chars >= 11)
    val docs = Seq((1L, loremA), (2L, loremB)).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs)
    val shared = fp.filter(col("doc_id") === 1L).select("fp_hash")
      .intersect(fp.filter(col("doc_id") === 2L).select("fp_hash"))
    assert(shared.count() >= 1)
  }

  test("docSummary counts, density bounds, and digest determinism") {
    val docs = Seq((1L, loremA), (2L, "tiny")).toDF("doc_id", "text")
    val rows = Winnow.docSummary(docs).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    val nGrams = loremA.length - Winnow.K + 1
    val nWindows = nGrams - Winnow.W + 1
    assert(r1.getLong(1) === nGrams.toLong)
    assert(r1.getLong(2) === nWindows.toLong)
    val nFp = r1.getLong(3)
    // every window selects one; one selection covers at most W windows
    assert(nFp <= nWindows && nFp >= (nWindows + Winnow.W - 1) / Winnow.W)
    assert(r1.getDouble(4) === nFp.toDouble / nWindows.toDouble)
    // short docs are present with zero counts and a NULL digest
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getLong(1) === 0L && r2.getLong(3) === 0L && r2.isNullAt(5))
    // digest is a pure function of the selection
    val again = Winnow.docSummary(docs).collect().find(_.getLong(0) == 1L).get
    assert(again.getString(5) === r1.getString(5))
  }

  test("incremental store probe equals the full pair set restricted to the delta") {
    val docs = Tables.documents(spark, TinySf).select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    val store = s"$root/fp"
    Winnow.buildFingerprintStore(docs.filter(col("doc_id") % 3 =!= 0), store)
    Winnow.appendFingerprintStore(docs.filter(col("doc_id") % 3 === 0), store)
    val inc = Winnow.incrementalPairs(spark, store, col("doc_id") % 3 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Winnow.candidatePairs(docs)
      .filter(col("doc_a") % 3 === 0 || col("doc_b") % 3 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full, "incremental probe diverged from the full restricted set")
    assert(inc.nonEmpty, "fixture produced no delta-touching pairs")
    // an overlapping keyed slice (e.g. a replayed batch next to a flat
    // append of the same docs) duplicates store ROWS; the probe's
    // doc-grain distinct keeps both the governor occupancy and the
    // shared counts unchanged
    Winnow.writeFingerprintBatch(docs.filter(col("doc_id") % 3 === 0), store, 0L)
    val again = Winnow.incrementalPairs(spark, store, col("doc_id") % 3 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === full)
  }

  test("candidatePairs finds near-dups and the governor drops hot grams") {
    val common = "jumps over the lazy dog while seventeen magpies argue loudly"
    val docs = ((1L, "prefix one " + common) ::
      (2L, "prefix two " + common) ::
      (3L, "nothing in common with anyone else at all here truly") ::
      // 70 docs sharing ONE hot sentence (occupancy 70 > 16 governor);
      // the lead repeats a per-doc token so no 8-gram is shared by only
      // SOME of the cohort (e.g. "unique lead 4"/"unique lead 44" would
      // share digit-prefix grams below the governor)
      (4L to 73L).map(i => (i, s"q${i}z q${i}z q${i}z then " +
        "this boilerplate footer is identical across the whole corpus")).toList)
      .toDF("doc_id", "text")
    val pairs = Winnow.candidatePairs(docs).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 2L)))
    // the boilerplate cohort's shared grams exceed the occupancy governor:
    // no pair may rest on them alone — doc 3 pairs with nobody, and the
    // footer cohort produces no pair among its 70 members
    assert(!keys.exists { case (a, b) => a >= 4L && b >= 4L })
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L })
  }
}
