package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs per
  * partition in batches.
  *
  * Header parsing for WAV/BMP ([[Headers]], [[extractMetadata]]) is REAL —
  * pure byte parsing, no libraries. The pixel/sample codec is STUBBED (no
  * image/audio libs in this container): [[FakeCodec.decode]] derives
  * deterministic pseudo-features from the bytes. Everything Spark-side —
  * schema, Encoders, partition-batch shape — is real.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class DecodedRow(id: Long, n_bytes: Long, first_byte: Int, format: String,
                              width: Int, height: Int, feature: Array[Double])

  /** STUB codec: a real deployment would swap this for an image/audio decoder
    * invoked per partition-batch. Deterministic on input bytes.
    */
  object FakeCodec {
    def decode(bytes: Array[Byte], format: String): (Int, Int, Array[Double]) = {
      val n = bytes.length
      val w = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(bytes(0)) % 64)
      val h = 16 + (n % 64)
      val feat = Array.tabulate(8) { i =>
        if (n == 0) 0.0
        else java.lang.Byte.toUnsignedInt(bytes(i % n)).toDouble / 255.0
      }
      (w, h, feat)
    }
  }

  /** REAL header decoders for container formats that need no external
    * libraries — pure byte parsing. A pipeline uses these for fast metadata
    * extraction / corruption triage before any (expensive, native) full
    * decode.
    */
  object Headers {
    final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                             dataBytes: Long, durationMs: Long)

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

    /** Parse a RIFF/WAVE header: walks chunks to `fmt ` and `data`. */
    def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
      if (bytes.length < 44) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
            bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
      var off = 12
      var channels = -1; var rate = -1; var bits = -1; var dataBytes = -1L
      while (off + 8 <= bytes.length && (channels < 0 || dataBytes < 0)) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val sz = le32(bytes, off + 4)
        if (id == "fmt " && off + 24 <= bytes.length) {
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12).toInt
          bits = le16(bytes, off + 22)
        } else if (id == "data") {
          dataBytes = sz
        }
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      if (channels <= 0 || rate <= 0 || bits <= 0 || dataBytes < 0) None
      else {
        val bytesPerMs = channels.toLong * rate * bits / 8 / 1000
        Some(WavInfo(channels, rate, bits, dataBytes,
          if (bytesPerMs == 0) 0L else dataBytes / bytesPerMs))
      }
    }

    final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int)

    /** Parse a BMP (BITMAPINFOHEADER) header. */
    def parseBmp(bytes: Array[Byte]): Option[BmpInfo] = {
      if (bytes.length < 30 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val w = le32(bytes, 18).toInt
      val h = le32(bytes, 22).toInt
      val bpp = le16(bytes, 28)
      if (w <= 0 || h == 0 || bpp <= 0) None else Some(BmpInfo(w, math.abs(h), bpp))
    }

    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) | ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

    final case class PngInfo(width: Int, height: Int, bitDepth: Int, colorType: Int)

    /** Parse a PNG signature + IHDR chunk (always first, fixed layout). */
    def parsePng(bytes: Array[Byte]): Option[PngInfo] = {
      if (bytes.length < 26) return None
      val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
      if ((0 until 8).exists(i => bytes(i) != sig(i))) return None
      if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')) return None
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some(PngInfo(w.toInt, h.toInt, bytes(24) & 0xFF, bytes(25) & 0xFF))
    }

    final case class JpegInfo(width: Int, height: Int, components: Int)

    /** SOF markers carrying frame dimensions (C0-CF minus DHT/JPG/DAC). */
    private def isSof(m: Int): Boolean =
      m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

    /** Parse a JPEG by walking marker segments to the first SOF. */
    def parseJpeg(bytes: Array[Byte]): Option[JpegInfo] = {
      if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
      var off = 2
      while (off + 4 <= bytes.length) {
        if ((bytes(off) & 0xFF) != 0xFF) return None
        val marker = bytes(off + 1) & 0xFF
        if (marker == 0xFF) { off += 1 } // fill byte
        else if ((marker >= 0xD0 && marker <= 0xD9) || marker == 0x01) { off += 2 } // standalone
        else {
          val segLen = be16(bytes, off + 2)
          if (segLen < 2) return None
          if (isSof(marker)) {
            if (off + 10 > bytes.length) return None
            val h = be16(bytes, off + 5)
            val w = be16(bytes, off + 7)
            val nc = bytes(off + 9) & 0xFF
            return if (w > 0 && h > 0) Some(JpegInfo(w, h, nc)) else None
          }
          off += 2 + segLen
        }
      }
      None
    }
  }

  final case class MediaMetaRow(id: Long, format: String, ok: Boolean,
                                width: Int, height: Int, channels: Int,
                                sample_rate: Int, duration_ms: Long)

  /** Metadata extraction over a media frame: REAL parsing for wav/bmp,
    * failure rows (ok=false) for corrupt/unknown payloads. Per-partition
    * batches, no shuffle — the triage step before expensive full decode.
    */
  def extractMetadata(spark: SparkSession, media: DataFrame): Dataset[MediaMetaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        r.format match {
          case "audio/wav" => Headers.parseWav(r.media) match {
            case Some(w) => MediaMetaRow(r.id, r.format, ok = true, -1, -1, w.channels, w.sampleRate, w.durationMs)
            case None => MediaMetaRow(r.id, r.format, ok = false, -1, -1, -1, -1, -1L)
          }
          case "image/bmp" => Headers.parseBmp(r.media) match {
            case Some(b) => MediaMetaRow(r.id, r.format, ok = true, b.width, b.height, -1, -1, -1L)
            case None => MediaMetaRow(r.id, r.format, ok = false, -1, -1, -1, -1, -1L)
          }
          case "image/png" => Headers.parsePng(r.media) match {
            case Some(p) => MediaMetaRow(r.id, r.format, ok = true, p.width, p.height, -1, -1, -1L)
            case None => MediaMetaRow(r.id, r.format, ok = false, -1, -1, -1, -1, -1L)
          }
          case "image/jpeg" => Headers.parseJpeg(r.media) match {
            case Some(j) => MediaMetaRow(r.id, r.format, ok = true, j.width, j.height, j.components, -1, -1L)
            case None => MediaMetaRow(r.id, r.format, ok = false, -1, -1, -1, -1, -1L)
          }
          case _ => MediaMetaRow(r.id, r.format, ok = false, -1, -1, -1, -1, -1L)
        }
      }
    }
  }

  /** Wrap a text/id frame as a media frame (binary payload + format tag) —
    * the ingestion shape a real pipeline would produce from raw files.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      col(payloadCol).cast(BinaryType).as("media"),
      lit(format).as("format"))

  /** Decode via mapPartitions — batch-per-partition, no shuffle; the decode
    * stub is the only non-Catalyst step (unavoidable for a native codec).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, feat) = FakeCodec.decode(r.media, r.format)
        DecodedRow(r.id, r.media.length.toLong,
          if (r.media.isEmpty) -1 else java.lang.Byte.toUnsignedInt(r.media(0)),
          r.format, w, h, feat)
      }
    }
  }

  final case class ResizedRow(id: Long, width: Int, height: Int, media: Array[Byte])

  /** Resize STUB: a real codec would decode → scale → re-encode; the fake
    * deterministically truncates/pads the payload to width*height bytes so
    * the Spark-side shape (binary in, binary out, per-partition batches) is
    * real and testable.
    */
  def resize(spark: SparkSession, media: DataFrame, width: Int, height: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val out = java.util.Arrays.copyOf(r.media, width * height)
        ResizedRow(r.id, width, height, out)
      }
    }
  }

  final case class FrameRow(id: Long, frameIdx: Int, frame: Array[Byte])

  /** Frame-sample STUB: treats the payload as `frameCount` fixed-size frames
    * and emits every `stride`-th one — the flatMap/explode shape of real
    * video sampling, with a deterministic fake splitter.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameCount: Int, stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val frameSize = math.max(1, r.media.length / math.max(1, frameCount))
      (0 until frameCount by stride).map { i =>
        val from = math.min(i * frameSize, r.media.length)
        val until = math.min(from + frameSize, r.media.length)
        FrameRow(r.id, i, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }
}
