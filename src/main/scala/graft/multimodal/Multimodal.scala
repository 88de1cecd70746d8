package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step is STUBBED (no image/audio libs in this container) with
  * a deterministic fake decoder; everything around it — the binary column
  * schema, the typed Dataset plumbing, the mapPartitions batch shape (one
  * decoder instantiation per partition, not per row), partition sizing —
  * is the real production shape for running (e.g.) JNI or native decoders
  * on a 1000-executor cluster.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
                         source: String)
  case class MediaFeatures(doc_id: Long, mime: String, byte_count: Long,
                           checksum: String, width: Int, height: Int,
                           frame_count: Int)

  /** Documents re-cast as a media table: payload = utf-8 bytes standing in
    * for image/audio bytes. */
  def asMediaTable(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("application/octet-stream").as("mime"),
        col("source"))
      .as[MediaRecord]
  }

  /** STUB decoder: deterministic pseudo-decode of media bytes. A real
    * implementation would hand `bytes` to an image/audio codec here; the
    * signature (bytes => dimensions/frames) is the contract. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val w = 64 + (n % 1024)
    val h = 64 + ((n / 7) % 1024)
    val frames = 1 + (n % 16)
    (w, h, frames)
  }

  /** Per-partition decode + feature extraction. mapPartitions so a real
    * decoder is constructed once per partition (the expensive part with
    * native codecs), and rows stream through it. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real code: val decoder = NativeDecoder.acquire() — once per partition
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        val (w, h, f) = decodeStub(rec.payload)
        digest.reset()
        val sum = digest.digest(rec.payload).map("%02x".format(_)).mkString
        MediaFeatures(rec.doc_id, rec.mime, rec.payload.length.toLong, sum, w, h, f)
      }
    }
  }

  /** SQL-expressible metadata view (checksums/sizes) — the part of the
    * multimodal pipeline an oracle can check. */
  def mediaMetadata(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("source"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"), col("source"), col("lang"),
        lit("application/octet-stream").as("mime"),
        length(col("payload")).cast("long").as("byte_count"),
        sha2(col("payload"), 256).as("checksum"),
        (lit(64L) + (length(col("payload")) % 1024)).cast("long").as("stub_width"),
        (lit(64L) + (expr("length(payload) div 7") % 1024)).cast("long").as("stub_height"))
}
