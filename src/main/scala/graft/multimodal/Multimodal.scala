package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step dispatches through [[Codecs]]: payloads that are REAL
  * media containers (binary PPM / 24-bit BMP stills, PCM WAV audio — all
  * parsed by the zero-dep strict codecs in Codecs.scala) decode to real
  * pixels / real PCM and those bytes feed the downstream features
  * (dims, nearest-neighbor resize, per-segment checksums). Payloads no
  * codec recognizes fall back to the DECLARED deterministic stub — the
  * documents-as-bytes corpus takes that path, which keeps the typed
  * pipeline exactly parity with the SQL twins the DuckDB oracle checks.
  * The plumbing is the production shape either way: binary column schema,
  * typed Dataset encoders, mapPartitions batching (one decoder context
  * per partition, not per row), bounded row fan-out.
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

  /** STUB decoder: deterministic pseudo-decode for payloads no real codec
    * recognizes (opaque bytes standing in for formats this container has
    * no parser for). The signature (bytes => dimensions/frames) is the
    * codec contract; [[Codecs]] provides the real implementations. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val w = 64 + (n % 1024)
    val h = 64 + ((n / 7) % 1024)
    val frames = 1 + (n % 16)
    (w, h, frames)
  }

  /** Real-first dims: a decoded still is (w, h, 1 frame); decoded audio is
    * dimensionless with 0 frames; anything else takes the stub path. */
  private[multimodal] def decodeDims(bytes: Array[Byte]): (Int, Int, Int) =
    Codecs.decodeImage(bytes) match {
      case Some(img) => (img.width, img.height, 1)
      case None => Codecs.decodeAudio(bytes) match {
        case Some(_) => (0, 0, 0)
        case None => decodeStub(bytes)
      }
    }

  /** Per-partition decode + feature extraction. mapPartitions so a real
    * decoder is constructed once per partition (the expensive part with
    * native codecs), and rows stream through it. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // decoder context acquired once per partition (the codecs here are
      // stateless; a JNI decoder would be pooled at this point)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { rec =>
        val (w, h, f) = decodeDims(rec.payload)
        digest.reset()
        val sum = digest.digest(rec.payload).map("%02x".format(_)).mkString
        MediaFeatures(rec.doc_id, rec.mime, rec.payload.length.toLong, sum, w, h, f)
      }
    }
  }

  case class FrameFeature(doc_id: Long, frame_idx: Int, out_w: Int, out_h: Int,
                          frame_checksum: String)

  /** Frame sampling + resize planning: every `everyN`-th frame of each
    * decoded media record becomes its own row (flatMap = the explode after
    * the per-partition decode), with aspect-preserving integer resize dims
    * (longest side → `target`) and a per-frame deterministic stub checksum
    * (a real pipeline would emit the decoded+resized tensor bytes here).
    * Row amplification is frames/everyN per record — bounded by media
    * length, never by corpus size. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int = 4,
                   target: Int = 224): Dataset[FrameFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { rec =>
        Codecs.decodeImage(rec.payload) match {
          case Some(img) =>
            // REAL path: a still is its own single frame; the checksum is
            // of the actually-resized pixel bytes (what gets tensorized)
            val longest = math.max(img.width, img.height)
            val ow = img.width * target / longest
            val oh = img.height * target / longest
            digest.reset()
            val sum = digest.digest(Codecs.resizeNearest(img, ow, oh))
              .take(8).map("%02x".format(_)).mkString
            Iterator.single(FrameFeature(rec.doc_id, 0, ow, oh, sum))
          case None if Codecs.decodeAudio(rec.payload).isDefined =>
            Iterator.empty // audio has no frames to sample
          case None =>
            val (w, h, frames) = decodeStub(rec.payload)
            val longest = math.max(w, h)
            val (ow, oh) = (w * target / longest, h * target / longest)
            (0 until frames by everyN).iterator.map { f =>
              digest.reset()
              digest.update(rec.payload)
              // all 4 index bytes: a single truncated byte collides frame f
              // with f+256 once a video samples past 256 frames
              digest.update(java.nio.ByteBuffer.allocate(4).putInt(f).array())
              val sum = digest.digest().take(8).map("%02x".format(_)).mkString
              FrameFeature(rec.doc_id, f, ow, oh, sum)
            }
        }
      }
    }
  }

  /** SQL-expressible frame-sample/resize plan (stub dims are arithmetic on
    * byte_count, so the whole frame explosion is oracle-checkable). */
  def frameSamplePlan(documents: DataFrame, everyN: Int = 4,
                      target: Int = 224): DataFrame =
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        (lit(64L) + (length(col("payload")) % 1024)).as("w"),
        (lit(64L) + (expr("length(payload) div 7") % 1024)).as("h"),
        (lit(1L) + (length(col("payload")) % 16)).as("frame_count"))
      .select(col("doc_id"), col("w"), col("h"), col("frame_count"),
        explode(sequence(lit(0L), col("frame_count") - 1, lit(everyN.toLong)))
          .as("frame_idx"))
      .withColumn("out_w", expr(s"w * $target div greatest(w, h)"))
      .withColumn("out_h", expr(s"h * $target div greatest(w, h)"))
      .select("doc_id", "frame_idx", "frame_count", "w", "h", "out_w", "out_h")

  case class AudioSegment(doc_id: Long, seg_idx: Long, start_ms: Long,
                          end_ms: Long, seg_checksum: String)

  /** STUB audio "decode": duration from byte count (a real codec reads the
    * container header). The segmentation math downstream is the real
    * production shape: fixed windows with hop overlap, last window clipped
    * to the duration. */
  private[multimodal] def durationMsStub(byteCount: Long): Long =
    1000L + (byteCount % 60000L)

  /** Audio windowing: each media record explodes into hop-strided fixed
    * windows (the 1-D analog of frame sampling — whisper-style chunking).
    * Row amplification is duration/hop per record, bounded by media
    * length. Typed path runs the per-partition stub decoder; the
    * declarative twin below is the oracle surface. */
  def segmentAudio(media: Dataset[MediaRecord], windowMs: Long = 5000L,
                   hopMs: Long = 2500L): Dataset[AudioSegment] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { rec =>
        Codecs.decodeAudio(rec.payload) match {
          case Some(audio) =>
            // REAL path: duration from the PCM header, and each window's
            // checksum is of the actual sample bytes it covers — the
            // bytes an STT/embedding model would consume
            val dur = audio.durationMs
            val n = if (dur <= windowMs) 1L else (dur - windowMs) / hopMs + 1L
            (0L until n).iterator.map { s =>
              val start = s * hopMs
              val end = math.min(start + windowMs, dur)
              digest.reset()
              val sum = digest
                .digest(WavCodec.pcmSlice(rec.payload, audio, start, end))
                .take(8).map("%02x".format(_)).mkString
              AudioSegment(rec.doc_id, s, start, end, sum)
            }
          case None if Codecs.decodeImage(rec.payload).isDefined =>
            Iterator.empty // stills have no audio track to window
          case None =>
            val dur = durationMsStub(rec.payload.length.toLong)
            val n = if (dur <= windowMs) 1L else (dur - windowMs) / hopMs + 1L
            (0L until n).iterator.map { s =>
              digest.reset()
              digest.update(rec.payload)
              // all 8 bytes of the index: a single-byte update collides
              // seg_idx with seg_idx+256 for >255 segments per record
              digest.update(java.nio.ByteBuffer.allocate(8).putLong(s).array())
              val sum = digest.digest().take(8).map("%02x".format(_)).mkString
              AudioSegment(rec.doc_id, s, s * hopMs,
                math.min(s * hopMs + windowMs, dur), sum)
            }
        }
      }
    }
  }

  /** SQL-expressible audio segmentation (stub duration is arithmetic on
    * byte count, so the window explosion is oracle-checkable). */
  def audioSegmentPlan(documents: DataFrame, windowMs: Long = 5000L,
                       hopMs: Long = 2500L): DataFrame =
    documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        (lit(1000L) + (length(col("payload")).cast("long") % 60000L)).as("dur_ms"))
      .withColumn("n_seg",
        when(col("dur_ms") <= windowMs, 1L)
          .otherwise(expr(s"(dur_ms - ${windowMs}L) div ${hopMs}L") + 1L))
      .select(col("doc_id"), col("dur_ms"),
        explode(sequence(lit(0L), col("n_seg") - 1)).as("seg_idx"))
      .withColumn("start_ms", col("seg_idx") * hopMs)
      .withColumn("end_ms", least(col("start_ms") + windowMs, col("dur_ms")))
      .select("doc_id", "seg_idx", "start_ms", "end_ms", "dur_ms")

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
