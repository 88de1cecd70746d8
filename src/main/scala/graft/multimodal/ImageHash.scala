package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + image near-duplicate retrieval — the image
  * twin of the text stack's SimHash → LSH-banded pairs. Extends the
  * multimodal family from decode/feature-extract to RETRIEVAL.
  *
  * Real path (payloads the strict [[Codecs]] recognize): classic
  * aHash/dHash over the REAL decoded pixels — nearest-neighbor resize to
  * an 8×8 (aHash) / 9×8 (dHash) grid, integer ITU-R 601 luma
  * (299R+587G+114B, kept ×1000 so everything stays exact integer math),
  * one bit per cell. Two encodings of the same pixels (PPM vs BMP) hash
  * identically because decode normalizes both to the same RGB contract.
  *
  * Stub path (opaque payloads, e.g. the documents-as-bytes corpus): the
  * text is treated as a 1×n "image" and resampled to a 33-point
  * nearest-neighbor grid of character intensities — the same declared
  * arithmetic as the SQL plan twins below, so the typed path and the
  * DuckDB oracle can never drift on ASCII corpora (Spark's `ascii` and
  * DuckDB's `ascii` agree on code points < 128; the synthetic corpus is
  * pure ASCII and the parity spec pins it).
  *
  * Near-dup pairs ride the repo's standard LSH-banding shape (MinHash
  * bands, shared-device buckets): band the hash into byte slices,
  * equi-join docs sharing a band under an occupancy governor, then keep
  * pairs within a Hamming radius — by pigeonhole, any pair within
  * `bands - 1` differing bits shares at least one intact band, so
  * banding loses nothing at radius ≤ 3 over 4 bands. Never all-pairs:
  * candidate generation is an equi-join on governed buckets, exactly the
  * plan that survives 100 TB.
  */
object ImageHash {

  /** Samples per stub grid: 33 points → 32 dHash bits (adjacent compares)
    * and 32 aHash bits (first 32 points vs the 33-point mean). */
  val StubSamples = 33
  val StubBits = 32

  // ---- real-pixel hashes -------------------------------------------------

  /** Integer luma (×1000) of the resized grid. */
  private def lumaGrid(img: DecodedImage, ow: Int, oh: Int): Array[Int] = {
    val px = Codecs.resizeNearest(img, ow, oh)
    Array.tabulate(ow * oh) { i =>
      299 * (px(3 * i) & 0xff) + 587 * (px(3 * i + 1) & 0xff) +
        114 * (px(3 * i + 2) & 0xff)
    }
  }

  /** 64-bit average hash: bit i set iff cell i of the 8×8 luma grid is
    * above the grid mean (integer compare: g·64 > Σg). */
  def aHash(img: DecodedImage): Long = {
    val g = lumaGrid(img, 8, 8)
    var sum = 0L
    g.foreach(sum += _)
    var h = 0L
    var i = 0
    while (i < 64) {
      if (g(i) * 64L > sum) h |= (1L << i)
      i += 1
    }
    h
  }

  /** 64-bit difference hash: bit (y·8+x) set iff luma(x,y) < luma(x+1,y)
    * on the 9×8 grid — the horizontal-gradient signature. */
  def dHash(img: DecodedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) h |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    h
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- stub hashes (the declared SQL-twin arithmetic) ---------------------

  /** 33-point nearest-neighbor resample of the text's character
    * intensities — `resizeNearest` for a 1×n "image". */
  private[multimodal] def stubGrays(text: String): Array[Int] = {
    val n = text.length
    Array.tabulate(StubSamples) { i =>
      if (n == 0) 0 else text.charAt((i.toLong * n / StubSamples).toInt).toInt
    }
  }

  private[multimodal] def stubAHash(text: String): Long = {
    val g = stubGrays(text)
    val tot = g.map(_.toLong).sum
    (0 until StubBits).foldLeft(0L)((h, i) =>
      if (g(i) * StubSamples.toLong > tot) h | (1L << i) else h)
  }

  private[multimodal] def stubDHash(text: String): Long = {
    val g = stubGrays(text)
    (0 until StubBits).foldLeft(0L)((h, i) =>
      if (g(i) < g(i + 1)) h | (1L << i) else h)
  }

  // ---- typed dataset path -------------------------------------------------

  case class ImagePHash(doc_id: Long, is_real_image: Boolean, width: Int,
                        height: Int, ahash: Long, dhash: Long)

  /** Per-partition decode + hash: real codecs first, declared stub
    * otherwise (same dispatch contract as [[Multimodal.extractFeatures]]). */
  def imageHashes(media: Dataset[Multimodal.MediaRecord]): Dataset[ImagePHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        Codecs.decodeImage(rec.payload) match {
          case Some(img) =>
            ImagePHash(rec.doc_id, is_real_image = true, img.width, img.height,
              aHash(img), dHash(img))
          case None =>
            val text = new String(rec.payload,
              java.nio.charset.StandardCharsets.UTF_8)
            ImagePHash(rec.doc_id, is_real_image = false, 0, 0,
              stubAHash(text), stubDHash(text))
        }
      }
    }
  }

  case class ImagePair(doc_a: Long, doc_b: Long, hamming: Int)

  /** Hamming-banded near-dup pairs over the typed hashes: 8 byte-bands of
    * the 64-bit dHash (pigeonhole-complete to radius 7), bucket governor
    * 2..`maxBucket`, exact Hamming verify. */
  def nearDupImages(hashes: Dataset[ImagePHash], maxHamming: Int = 7,
                    maxBucket: Int = 64): DataFrame = {
    val h = hashes.toDF.select("doc_id", "dhash")
    val bands = h.select(col("doc_id"), col("dhash"),
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("band_val", expr("shiftright(dhash, band * 8) & 255"))
    val ok = bands.groupBy("band", "band_val")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2 && col("c") <= maxBucket)
      .select("band", "band_val")
    val adm = bands.join(ok, Seq("band", "band_val"))
    adm.as("x").join(adm.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.dhash ^ y.dhash) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- SQL-expressible plan twins (the oracle surface) --------------------

  /** Shared generator core: the 33 sampled intensities as g0..g32.
    * `intDiv` is the engine's integer-division token (Spark `div`,
    * DuckDB `//`). */
  private def sampleColSeq(intDiv: String): Seq[String] =
    (0 until StubSamples).map { i =>
      s"ascii(substring(text, CAST(1 + ($i * CAST(n AS BIGINT)) $intDiv $StubSamples AS INT), 1)) AS g$i"
    }

  private def sampleCols(intDiv: String): String =
    sampleColSeq(intDiv).mkString(",\n    ")

  private def totExpr: String = (0 until StubSamples).map("g" + _).mkString(" + ")

  private def ahashTerms: String = (0 until StubBits).map { i =>
    s"CASE WHEN g$i * $StubSamples > tot THEN ${1L << i} ELSE 0 END"
  }.mkString("\n    + ")

  private def dhashTerms: String = (0 until StubBits).map { i =>
    s"CASE WHEN g$i < g${i + 1} THEN ${1L << i} ELSE 0 END"
  }.mkString("\n    + ")

  /** Declarative stub-phash plan: doc_id, n_chars, ahash, dhash — pure
    * projection (no shuffle at any scale), generated from the same
    * constants as the typed stub so Spark, the typed path, and the
    * DuckDB oracle agree bit-for-bit. */
  def phashPlan(documents: DataFrame): DataFrame =
    documents.selectExpr("doc_id", "length(text) AS n", "text")
      .selectExpr(Seq("doc_id", "n") ++ sampleColSeq("div"): _*)
      .selectExpr("*", s"$totExpr AS tot")
      .selectExpr("doc_id", "CAST(n AS BIGINT) AS n_chars",
        s"CAST($ahashTerms AS BIGINT) AS ahash",
        s"CAST($dhashTerms AS BIGINT) AS dhash")

  /** DuckDB mirror of [[phashPlan]]. */
  def phashOracleSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, length(text) AS n, text FROM documents
       |), s AS (
       |  SELECT doc_id, n,
       |    ${sampleCols("//")}
       |  FROM g
       |), s2 AS (
       |  SELECT *, $totExpr AS tot FROM s
       |)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
       |  CAST($ahashTerms AS BIGINT) AS ahash,
       |  CAST($dhashTerms AS BIGINT) AS dhash
       |FROM s2 ORDER BY doc_id""".stripMargin

  /** Declarative near-dup plan over the stub dHash: 4 byte-bands of the
    * 32-bit hash (pigeonhole-complete to radius 3), occupancy governor
    * 2..`maxBucket`, exact Hamming verify — doc_a, doc_b, hamming. */
  def nearDupPlan(documents: DataFrame, maxHamming: Int = 3,
                  maxBucket: Int = 64): DataFrame = {
    val h = phashPlan(documents).select("doc_id", "dhash")
    val bands = h.select(col("doc_id"), col("dhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("shiftright(dhash, band * 8) & 255"))
    val ok = bands.groupBy("band", "band_val")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2 && col("c") <= maxBucket)
      .select("band", "band_val")
    val adm = bands.join(ok, Seq("band", "band_val"))
    adm.as("x").join(adm.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.dhash ^ y.dhash) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB mirror of [[nearDupPlan]]. */
  /** The CTE chain ending in `dup_pairs` (doc_a < doc_b, hamming ≤ max) —
    * shared by the pair oracle and the recursive cluster oracle. */
  def nearDupSqlCtes(maxHamming: Int = 3, maxBucket: Int = 64): String =
    s"""g AS (
       |  SELECT doc_id, length(text) AS n, text FROM documents
       |), s AS (
       |  SELECT doc_id, n,
       |    ${sampleCols("//")}
       |  FROM g
       |), hsh AS (
       |  SELECT doc_id, $dhashTerms AS dhash FROM s
       |), b AS (
       |  SELECT doc_id, dhash, unnest(range(0, 4)) AS band FROM hsh
       |), bv AS (
       |  SELECT doc_id, dhash, band,
       |    (dhash >> CAST(band * 8 AS INT)) & 255 AS band_val
       |  FROM b
       |), ok AS (
       |  SELECT band, band_val FROM bv
       |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND $maxBucket
       |), adm AS (
       |  SELECT bv.* FROM bv JOIN ok USING (band, band_val)
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT) AS hamming
       |  FROM adm x JOIN adm y USING (band, band_val)
       |  WHERE x.doc_id < y.doc_id
       |), dup_pairs AS (
       |  SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= $maxHamming
       |)""".stripMargin

  def nearDupOracleSql(maxHamming: Int = 3, maxBucket: Int = 64): String =
    "WITH " + nearDupSqlCtes(maxHamming, maxBucket) +
      "\nSELECT doc_a, doc_b, hamming FROM dup_pairs ORDER BY doc_a, doc_b"

  /** Image near-dup CLUSTERS: connected components over the Hamming pair
    * graph, every document labeled with its cluster id (component
    * minimum), cluster size, and canonical flag — the image twin of
    * q_dedup_clusters, closing the hash → pairs → clusters pipeline.
    * Rides the star-contraction CC (O(log n) shuffle rounds regardless of
    * cluster diameter — a chain of successive near-edits is exactly the
    * high-diameter case), so the clustering scales with the governed pair
    * volume, never all-pairs. */
  def imageClusters(documents: DataFrame, maxHamming: Int = 3,
                    maxBucket: Int = 64): DataFrame =
    graft.text.Components.clustersFromEdges(
      documents.select(col("doc_id").as("id")),
      nearDupPlan(documents, maxHamming, maxBucket)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")))

  /** DuckDB mirror of [[imageClusters]]: the same pair CTEs + a recursive
    * reachability walk labeled by component minimum (the
    * q_dedup_clusters oracle pattern). */
  def imageClustersOracleSql(maxHamming: Int = 3, maxBucket: Int = 64): String =
    "WITH RECURSIVE " + nearDupSqlCtes(maxHamming, maxBucket) +
      s""",
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM dup_pairs
       |  UNION ALL SELECT doc_b, doc_a FROM dup_pairs
       |), walk(node, reach) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
       |), lab AS (
       |  SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
       |), sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM lab GROUP BY 1
       |)
       |SELECT l.doc_id, l.cluster_id, sz.cluster_size,
       |  l.doc_id = l.cluster_id AS is_canonical
       |FROM lab l JOIN sz USING (cluster_id)
       |ORDER BY l.doc_id""".stripMargin
}
