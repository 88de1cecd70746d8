package graft.multimodal

/** Zero-dependency REAL media codecs: strict header+payload parsers for
  * three self-describing container formats (binary PPM stills, 24-bit
  * uncompressed BMP stills, PCM WAV audio), written against the public
  * format specs — no image/audio library required.
  *
  * These make the multimodal family's decode step honest: where the
  * payload IS a real media container, real pixels / real PCM samples flow
  * into feature extraction (dims, resize, segment checksums); anything
  * else falls back to the declared deterministic stub, so corpora whose
  * "media" column carries opaque bytes still flow through the same plan.
  *
  * Sniffing is STRICT — magic number AND a fully consistent header AND an
  * exact byte-length match — so arbitrary text/binary payloads cannot
  * false-positive into the real path (decode is a pure function of the
  * bytes; the dispatch is deterministic).
  *
  * Ref analog: the reference's ML side consumes real feature bytes
  * end-to-end (ml/models/fraud_detector.py:1-60 trains on real vectors);
  * this closes the same honesty bar for media payloads.
  */

/** A decoded still image: 8-bit RGB, row-major from the top-left. */
final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte]) {
  require(pixels.length == width * height * 3,
    s"pixel buffer ${pixels.length} != $width x $height x 3")
}

/** A decoded PCM audio clip. `dataOffset`/`dataLen` window the original
  * byte array, so slicing a time range never copies the whole payload. */
final case class DecodedAudio(sampleRate: Int, channels: Int,
                              bitsPerSample: Int, dataOffset: Int,
                              dataLen: Int) {
  def blockAlign: Int = channels * (bitsPerSample / 8)
  def byteRate: Int = sampleRate * blockAlign
  def durationMs: Long = dataLen.toLong * 1000L / byteRate
}

trait ImageCodec extends Serializable {
  def name: String
  /** Strict parse: Some(image) iff `bytes` is a complete, well-formed
    * container of this format; None otherwise (caller falls back). */
  def decode(bytes: Array[Byte]): Option[DecodedImage]
}

/** Binary PPM (P6): `P6 <ws> width <ws> height <ws> maxval <one ws>` then
  * exactly width*height*3 raw RGB bytes. `#` comments allowed in the
  * header per the netpbm spec. maxval must fit one byte. */
object PpmCodec extends ImageCodec {
  val name = "ppm"

  def decode(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes.length < 11 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // skip whitespace and '#'-to-newline comments
    def skipWs(): Boolean = {
      var progressed = false
      var looping = true
      while (looping && i < bytes.length) {
        if (isWs(bytes(i))) { i += 1; progressed = true }
        else if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          progressed = true
        } else looping = false
      }
      progressed
    }
    def readInt(): Option[Int] = {
      if (!skipWs()) return None // fields must be whitespace-separated
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
        if (v > Int.MaxValue) return None
      }
      if (i == start) None else Some(v.toInt)
    }
    for {
      w <- readInt(); h <- readInt(); maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte separates maxval from the raster
      if i < bytes.length && isWs(bytes(i))
      pixelStart = i + 1
      if bytes.length - pixelStart == w.toLong * h * 3 // strict: no trailing junk
    } yield DecodedImage(w, h,
      java.util.Arrays.copyOfRange(bytes, pixelStart, bytes.length))
  }
}

/** Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows are stored
  * bottom-up as BGR with 4-byte padding; decode normalizes to the
  * top-down RGB contract shared with PPM (so the two codecs agree on
  * identical images — the cross-codec test). Top-down files (negative
  * height) are also handled. */
object BmpCodec extends ImageCodec {
  val name = "bmp"

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  def decode(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    if (u32(bytes, 2) != bytes.length) return None // strict declared size
    val dataOffset = u32(bytes, 10)
    val dibSize = u32(bytes, 14)
    if (dibSize < 40) return None
    val w = i32(bytes, 18)
    val hRaw = i32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return None
    if (u16(bytes, 26) != 1) return None        // planes
    if (u16(bytes, 28) != 24) return None       // bpp
    if (u32(bytes, 30) != 0) return None        // BI_RGB only
    val rowBytes = ((w * 3 + 3) / 4) * 4        // 4-byte row padding
    if (dataOffset + rowBytes.toLong * h > bytes.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val src = dataOffset.toInt + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val d = (y * w + x) * 3
        out(d) = bytes(s + 2)     // R (BMP stores BGR)
        out(d + 1) = bytes(s + 1) // G
        out(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, out))
  }
}

/** PCM WAV (RIFF/WAVE): walks the chunk list to `fmt ` (audioFormat 1,
  * i.e. uncompressed PCM) and `data`; duration and time-range slicing
  * derive from the real byte rate, not the payload length. */
object WavCodec extends Serializable {
  val name = "wav"

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def decode(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    if (u32(bytes, 4) != bytes.length - 8) return None // strict RIFF size
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, i)
      val len = u32(bytes, i + 4)
      if (i + 8 + len > bytes.length) return None
      if (id == "fmt " && len >= 16) {
        if (u16(bytes, i + 8) != 1) return None // PCM only
        fmt = Some((u16(bytes, i + 10), u32(bytes, i + 12).toInt,
          u16(bytes, i + 22)))
      } else if (id == "data") {
        data = Some((i + 8, len.toInt))
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for {
      (ch, rate, bits) <- fmt
      (off, len) <- data
      if ch > 0 && rate > 0 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)
      if len % (ch * bits / 8) == 0
    } yield DecodedAudio(rate, ch, bits, off, len)
  }

  /** Byte window of the PCM data covering [startMs, endMs), aligned to
    * whole sample blocks — the real bytes a feature extractor (or an STT
    * model's chunker) would consume for that segment. */
  def pcmSlice(bytes: Array[Byte], audio: DecodedAudio,
               startMs: Long, endMs: Long): Array[Byte] = {
    val ba = audio.blockAlign
    val from = math.min((startMs * audio.byteRate / 1000L) / ba * ba,
      audio.dataLen.toLong).toInt
    val until = math.min((endMs * audio.byteRate / 1000L) / ba * ba,
      audio.dataLen.toLong).toInt
    java.util.Arrays.copyOfRange(bytes, audio.dataOffset + from,
      audio.dataOffset + math.max(until, from))
  }
}

object Codecs {
  /** Image codecs in sniff order. Each is strict, so order only matters
    * for performance. */
  val imageCodecs: Seq[ImageCodec] = Seq(PpmCodec, BmpCodec)

  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] =
    imageCodecs.iterator.map(_.decode(bytes)).collectFirst { case Some(i) => i }

  def decodeAudio(bytes: Array[Byte]): Option[DecodedAudio] =
    WavCodec.decode(bytes)

  /** Nearest-neighbor resize of real decoded pixels — the zero-dep
    * resize step of the frame pipeline (what a training-data pipeline
    * runs before tensorizing; bilinear would be a drop-in here). */
  def resizeNearest(img: DecodedImage, ow: Int, oh: Int): Array[Byte] = {
    require(ow > 0 && oh > 0, s"bad target ${ow}x$oh")
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * img.height / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * img.width / ow).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * ow + x) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1)
        out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
