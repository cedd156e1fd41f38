package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs per
  * partition in batches.
  *
  * Header parsing for WAV/BMP/PNG/JPEG ([[Headers]], [[extractMetadata]])
  * is REAL — pure byte parsing, no libraries — and so is the pixel/sample
  * decode for BMP (uncompressed 24/32-bpp), 16-bit PCM WAV, PNG
  * (zlib-inflated IDAT + scanline unfiltering via `java.util.zip`) AND
  * baseline JPEG (full Huffman + IDCT decode, [[JpegCodec]]) —
  * [[PixelCodec]]. [[FakeCodec]] remains only as the corrupt/unknown-
  * payload triage path (and for JPEG variants outside the baseline
  * envelope: progressive, arithmetic, 12-bit). Everything Spark-side —
  * schema, Encoders, partition-batch shape — is real.
  */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte], format: String)
  final case class DecodedRow(id: Long, n_bytes: Long, first_byte: Int, format: String,
                              width: Int, height: Int, feature: Array[Double])

  /** STUB codec for the corrupt/unknown-payload triage path (and for
    * formats outside the real codecs' envelopes, e.g. progressive JPEG):
    * deterministic pseudo-features derived from the bytes. A real
    * deployment swaps this for a native image/audio decoder invoked per
    * partition-batch.
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

  /** REAL pixel/sample feature extraction — pure byte decoding, JVM-only
    * (`java.util.zip` for PNG's zlib stream). These are actual signal
    * statistics, not byte-derived pseudo-features:
    *
    *  - BMP (24/32-bpp, uncompressed): per-channel mean and population std
    *    (R, G, B, each normalized to [0,1]) followed by an 8-bin Rec.601
    *    luminance histogram (fractions summing to 1) — 14 doubles;
    *  - PNG (8-bit grey/RGB/RGBA, non-interlaced): fully decoded
    *    (inflate + unfilter), same 14 doubles as BMP;
    *  - PCM WAV (16-bit): amplitude mean, RMS, zero-crossing rate, peak
    *    |amplitude| over [-1,1)-normalized samples, followed by an 8-bin
    *    |amplitude| histogram — 12 doubles.
    */
  object PixelCodec {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

    /** (width, height, features) of an uncompressed 24/32-bpp BMP, walking
      * every stored pixel. None on palettized/compressed/corrupt payloads.
      */
    def bmpFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val pixOff = le32(bytes, 10).toInt
      val srcW = le32(bytes, 18).toInt
      val srcH = math.abs(le32(bytes, 22).toInt)
      val bpp = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (srcW <= 0 || srcH == 0 || compression != 0L || (bpp != 24 && bpp != 32)) return None
      val px = bpp / 8
      val rowL = ((srcW.toLong * bpp + 31) / 32) * 4
      if (rowL <= 0 || rowL > Int.MaxValue) return None
      if (pixOff < 54 || pixOff.toLong + rowL * srcH > bytes.length) return None
      val row = rowL.toInt
      var sR = 0.0; var sG = 0.0; var sB = 0.0
      var qR = 0.0; var qG = 0.0; var qB = 0.0
      val hist = new Array[Double](8)
      var y = 0
      while (y < srcH) { // orientation is irrelevant for whole-image stats
        val base = pixOff + y * row
        var x = 0
        while (x < srcW) {
          val o = base + x * px
          val b = bytes(o) & 0xFF; val g = bytes(o + 1) & 0xFF; val r = bytes(o + 2) & 0xFF
          sR += r; sG += g; sB += b
          qR += r.toDouble * r; qG += g.toDouble * g; qB += b.toDouble * b
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          hist(math.min(7, (luma / 32.0).toInt)) += 1.0
          x += 1
        }
        y += 1
      }
      val n = srcW.toDouble * srcH
      def std(q: Double, s: Double) = math.sqrt(math.max(0.0, q / n - (s / n) * (s / n)))
      val feat = Array(
        sR / n / 255.0, sG / n / 255.0, sB / n / 255.0,
        std(qR, sR) / 255.0, std(qG, sG) / 255.0, std(qB, sB) / 255.0) ++
        hist.map(_ / n)
      Some((srcW, srcH, feat))
    }

    /** (width, height, features) of a REAL decoded PNG — pure JVM, no
      * native libraries: big-endian chunk walk, `java.util.zip.Inflater`
      * on the concatenated IDAT stream (zlib IS the PNG compression), then
      * scanline unfiltering (None/Sub/Up/Average/Paeth per the spec).
      * Supports the dominant shapes — 8-bit greyscale (color type 0),
      * truecolor (2) and truecolor+alpha (6), non-interlaced; anything
      * else (palette, 16-bit, Adam7) returns None for triage. Features are
      * the SAME 14 doubles as [[bmpFeatures]] (per-channel mean/std + 8-bin
      * Rec.601 luminance histogram; grey maps to all three channels, alpha
      * is ignored) so image features are comparable across formats.
      *
      * Safety on adversarial payloads: all sizes walk in Long, the decoded
      * size is computed from the header and capped (no zip-bomb — the
      * Inflater writes into an exactly-sized buffer), and a short or
      * corrupt deflate stream returns None rather than throwing.
      */
    def pngFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
      pngDecode(bytes).map { case (wi, hi, channels, raw, stride) =>
        var sR = 0.0; var sG = 0.0; var sB = 0.0
        var qR = 0.0; var qG = 0.0; var qB = 0.0
        val hist = new Array[Double](8)
        var y = 0
        while (y < hi) {
          val rowOff = y * stride + 1
          var xI = 0
          while (xI < wi) {
            val o = rowOff + xI * channels
            val r = raw(o) & 0xFF
            val g = if (channels >= 3) raw(o + 1) & 0xFF else r
            val bb = if (channels >= 3) raw(o + 2) & 0xFF else r
            sR += r; sG += g; sB += bb
            qR += r.toDouble * r; qG += g.toDouble * g; qB += bb.toDouble * bb
            val luma = 0.299 * r + 0.587 * g + 0.114 * bb
            hist(math.min(7, (luma / 32.0).toInt)) += 1.0
            xI += 1
          }
          y += 1
        }
        val n = wi.toDouble * hi
        def std(q: Double, s: Double) = math.sqrt(math.max(0.0, q / n - (s / n) * (s / n)))
        val feat = Array(
          sR / n / 255.0, sG / n / 255.0, sB / n / 255.0,
          std(qR, sR) / 255.0, std(qG, sG) / 255.0, std(qB, sB) / 255.0) ++
          hist.map(_ / n)
        (wi, hi, feat)
      }

    /** Full PNG pixel decode (chunk walk → inflate → unfilter) shared by
      * [[pngFeatures]] and the perceptual hash: (w, h, channels, raw,
      * stride) where `raw` holds unfiltered scanlines, each `stride` bytes
      * starting with the (now meaningless) filter byte.
      */
    private[ops] def pngDecode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte], Int)] = {
      val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      if (bytes.length < 8 + 25 || !(0 until 8).forall(i => (bytes(i) & 0xFF) == sig(i))) return None
      def be32(o: Int): Long =
        ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
          ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
      var off = 8L
      var w = -1L; var h = -1L; var bitDepth = -1; var colorType = -1
      var interlace = -1; var compression = -1; var filterMethod = -1
      var idatLen = 0L
      val idatChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var done = false
      while (!done && off + 8 <= bytes.length) {
        val len = be32(off.toInt)
        if (len < 0 || off + 12 + len > bytes.length) return None
        val ctype = new String(bytes, off.toInt + 4, 4, "US-ASCII")
        ctype match {
          case "IHDR" =>
            if (len != 13) return None
            val o = off.toInt + 8
            w = be32(o); h = be32(o + 4)
            bitDepth = bytes(o + 8) & 0xFF; colorType = bytes(o + 9) & 0xFF
            compression = bytes(o + 10) & 0xFF; filterMethod = bytes(o + 11) & 0xFF
            interlace = bytes(o + 12) & 0xFF
          case "IDAT" =>
            idatChunks += ((off.toInt + 8, len.toInt)); idatLen += len
          case "IEND" => done = true
          case _ => ()
        }
        off += 12L + len
      }
      if (w <= 0 || h <= 0 || bitDepth != 8 || compression != 0 || filterMethod != 0 ||
        interlace != 0 || idatChunks.isEmpty) return None
      val channels = colorType match {
        case 0 => 1
        case 2 => 3
        case 6 => 4
        case _ => return None
      }
      val strideL = 1L + w * channels
      val rawL = strideL * h
      if (rawL > (1L << 28)) return None // decoded-size cap, not a codec limit
      val raw = new Array[Byte](rawL.toInt)
      val inf = new java.util.zip.Inflater()
      try {
        val comp = new Array[Byte](idatLen.toInt)
        var p = 0
        idatChunks.foreach { case (o, l) => System.arraycopy(bytes, o, comp, p, l); p += l }
        inf.setInput(comp)
        var outAt = 0
        while (outAt < raw.length && !inf.finished()) {
          val got = inf.inflate(raw, outAt, raw.length - outAt)
          if (got == 0 && inf.needsInput()) return None // truncated stream
          outAt += got
        }
        if (outAt != raw.length) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()

      val stride = strideL.toInt
      val bpp = channels
      def paeth(a: Int, b: Int, c: Int): Int = {
        val pv = a + b - c
        val pa = math.abs(pv - a); val pb = math.abs(pv - b); val pc = math.abs(pv - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      var y = 0
      while (y < h.toInt) {
        val rowOff = y * stride
        val filter = raw(rowOff) & 0xFF
        if (filter > 4) return None
        var i = 1
        while (i < stride) {
          val x = raw(rowOff + i) & 0xFF
          val a = if (i > bpp) raw(rowOff + i - bpp) & 0xFF else 0
          val b = if (y > 0) raw(rowOff - stride + i) & 0xFF else 0
          val c = if (y > 0 && i > bpp) raw(rowOff - stride + i - bpp) & 0xFF else 0
          val v = filter match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + ((a + b) >> 1)
            case 4 => x + paeth(a, b, c)
          }
          raw(rowOff + i) = (v & 0xFF).toByte
          i += 1
        }
        y += 1
      }

      Some((w.toInt, h.toInt, channels, raw, stride))
    }

    /** Amplitude features of a 16-bit PCM WAV (interleaved channels treated
      * as one sample stream — deterministic and channel-agnostic). None on
      * non-PCM, non-16-bit, empty, or corrupt payloads.
      */
    /** Locate the 16-bit PCM sample stream of a WAV payload:
      * (dataOff, nSamples). Shared by [[wavFeatures]] and the audio
      * fingerprint. None on non-PCM/non-16-bit/corrupt payloads.
      */
    private[ops] def pcm16(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes.length < 44) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
            bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
      var off = 12L // Long chunk walk — see Headers.parseWav
      var fmtCode = -1; var bits = -1; var dataOff = -1; var dataBytes = -1L
      while (off + 8 <= bytes.length && (fmtCode < 0 || dataOff < 0)) {
        val o = off.toInt
        val id = new String(bytes, o, 4, "US-ASCII")
        val sz = le32(bytes, o + 4)
        if (id == "fmt " && off + 24 <= bytes.length) {
          fmtCode = le16(bytes, o + 8)
          bits = le16(bytes, o + 22)
        } else if (id == "data") {
          dataOff = o + 8
          dataBytes = sz
        }
        off += 8L + sz + (sz & 1L)
      }
      if (fmtCode != 1 || bits != 16 || dataOff < 0) return None
      if (dataOff.toLong + dataBytes > bytes.length) return None
      val nSamples = (dataBytes / 2).toInt
      if (nSamples <= 0) return None
      Some((dataOff, nSamples))
    }

    def wavFeatures(bytes: Array[Byte]): Option[Array[Double]] = {
      val located = pcm16(bytes)
      if (located.isEmpty) return None
      val (dataOff, nSamples) = located.get
      var sum = 0.0; var sumSq = 0.0; var peak = 0.0
      var zc = 0L; var prevNeg = false
      val hist = new Array[Double](8)
      var i = 0
      while (i < nSamples) {
        val o = dataOff + 2 * i
        val v = ((bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)).toShort
        val x = v / 32768.0
        sum += x; sumSq += x * x
        val ax = math.abs(x)
        if (ax > peak) peak = ax
        val neg = x < 0.0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        hist(math.min(7, (ax * 8.0).toInt)) += 1.0
        i += 1
      }
      val n = nSamples.toDouble
      val zcr = if (nSamples > 1) zc.toDouble / (nSamples - 1) else 0.0
      Some(Array(sum / n, math.sqrt(sumSq / n), zcr, peak) ++ hist.map(_ / n))
    }

    /** (width, height, features) of a REAL decoded baseline JPEG — full
      * entropy decode + IDCT via [[JpegCodec]] (pure JVM, no libraries).
      * Features are the SAME 14 doubles as [[bmpFeatures]]/[[pngFeatures]]
      * (per-channel mean/std + 8-bin Rec.601 luminance histogram) so image
      * features stay comparable across formats. None outside the baseline
      * envelope (progressive, arithmetic, 12-bit, CMYK) or on corruption —
      * those triage upstream.
      */
    def jpegFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
      JpegCodec.decode(bytes).map { case (w, h, rgb) =>
        var sR = 0.0; var sG = 0.0; var sB = 0.0
        var qR = 0.0; var qG = 0.0; var qB = 0.0
        val hist = new Array[Double](8)
        var o = 0
        while (o < rgb.length) {
          val r = rgb(o) & 0xFF; val g = rgb(o + 1) & 0xFF; val bb = rgb(o + 2) & 0xFF
          sR += r; sG += g; sB += bb
          qR += r.toDouble * r; qG += g.toDouble * g; qB += bb.toDouble * bb
          val luma = 0.299 * r + 0.587 * g + 0.114 * bb
          hist(math.min(7, (luma / 32.0).toInt)) += 1.0
          o += 3
        }
        val n = w.toDouble * h
        def std(q: Double, s: Double) = math.sqrt(math.max(0.0, q / n - (s / n) * (s / n)))
        val feat = Array(
          sR / n / 255.0, sG / n / 255.0, sB / n / 255.0,
          std(qR, sR) / 255.0, std(qG, sG) / 255.0, std(qB, sB) / 255.0) ++
          hist.map(_ / n)
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
      // offsets stay in Long: chunk sizes are unsigned 32-bit, and an
      // adversarial size >= 2^31 truncated to Int would advance by <= 0 and
      // hang the scan instead of falling off the end.
      var off = 12L
      var channels = -1; var rate = -1; var bits = -1; var dataBytes = -1L
      while (off + 8 <= bytes.length && (channels < 0 || dataBytes < 0)) {
        val o = off.toInt
        val id = new String(bytes, o, 4, "US-ASCII")
        val sz = le32(bytes, o + 4)
        if (id == "fmt " && off + 24 <= bytes.length) {
          channels = le16(bytes, o + 10)
          rate = le32(bytes, o + 12).toInt
          bits = le16(bytes, o + 22)
        } else if (id == "data") {
          dataBytes = sz
        }
        off += 8L + sz + (sz & 1L) // chunks are word-aligned
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

  /** Decode via mapPartitions — batch-per-partition, no shuffle (a native
    * codec genuinely doesn't fit a Catalyst Expression). BMP, PNG,
    * baseline JPEG and 16-bit PCM WAV payloads get REAL signal features
    * ([[PixelCodec]]); corrupt/unsupported payloads triage through the
    * declared [[FakeCodec]] stub.
    */
  /** Magic-byte format sniffer — classify a binary media column WITHOUT
    * trusting an upstream format label (crawled corpora routinely carry
    * wrong/missing content types): BMP ("BM"), PNG (8-byte signature),
    * JPEG (FF D8 FF), 16-bit-agnostic WAV (RIFF….WAVE); anything else →
    * `application/octet-stream`. Pure built-in Column (tier (a): binary
    * substring compares, whole-stage codegen) — compose as
    * `media.withColumn("format", sniffFormat(col("media")))` before
    * [[imageDhash]]/[[decodeFeatures]] so decoding routes on CONTENT.
    */
  def sniffFormat(media: Column): Column = {
    def bytesLit(xs: Int*): Column = lit(xs.map(_.toByte).toArray)
    when(substring(media, 1, 2) === bytesLit('B', 'M'), "image/bmp")
      .when(substring(media, 1, 8) ===
        bytesLit(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A), "image/png")
      .when(substring(media, 1, 3) === bytesLit(0xFF, 0xD8, 0xFF), "image/jpeg")
      .when(substring(media, 1, 4) === bytesLit('R', 'I', 'F', 'F') &&
        substring(media, 9, 4) === bytesLit('W', 'A', 'V', 'E'), "audio/wav")
      .otherwise("application/octet-stream")
  }

  /** 64-bit perceptual DIFFERENCE hash (dHash) of an image payload: the
    * image's luminance is nearest-neighbor-sampled onto a 9×8 grid from
    * the REAL decoders (BMP direct pixel reads — 72 samples, no full walk;
    * PNG via [[PixelCodec.pngDecode]]; JPEG via [[JpegCodec.decode]]), and
    * bit (row·8+col) is set iff luminance strictly increases left→right —
    * robust to rescaling/recompression, so near-identical images land
    * within a few bits. Luminance compares on INTEGER Rec.601 thousandths
    * (299r+587g+114b): deterministic, and the SAME image encoded as BMP,
    * PNG or lossless-path JPEG hashes IDENTICALLY (spec'd). None outside
    * the decoders' envelope — triage, never a throw.
    */
  def dhash64(bytes: Array[Byte], format: String): Option[Long] =
    sampledLuma(bytes, format).map { case (w, h, luma) =>
      val grid = Array.tabulate(8, 9) { (y, x) =>
        luma((x * w) / 9, (y * h) / 8) // floor NN sampling
      }
      var hash = 0L
      var bit = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (grid(y)(x + 1) > grid(y)(x)) hash |= (1L << bit)
          bit += 1
          x += 1
        }
        y += 1
      }
      hash
    }

  /** 64-bit DCT perceptual hash (pHash): 32×32 NN-sampled luma → 2D DCT-II
    * → the 8×8 low-frequency block; the 63 AC coefficients compare against
    * their own mean (bit set iff above; bit 63 stays 0). Because only AC
    * coefficients are used and the threshold is their own mean, the hash
    * is EXACTLY invariant under any positive linear brightness transform
    * (a·luma + b, a > 0) — the re-grade/re-exposure robustness [[dhash64]]
    * only has for monotone per-pixel comparisons — while crops and edits
    * move low-frequency structure and show up as hamming distance. Same
    * deterministic decode envelope as dhash (None outside it).
    */
  def phash64(bytes: Array[Byte], format: String): Option[Long] =
    sampledLuma(bytes, format).map { case (w, h, luma) =>
      val N = 32
      val g = Array.tabulate(N, N) { (y, x) =>
        luma((x * w) / N, (y * h) / N).toDouble
      }
      // separable DCT-II, orthonormal scaling irrelevant (mean-threshold)
      val cosT = Array.tabulate(8, N)((u, i) =>
        math.cos((2 * i + 1) * u * math.Pi / (2.0 * N)))
      val rows = Array.tabulate(N, 8) { (y, u) =>
        var s = 0.0; var x = 0
        while (x < N) { s += g(y)(x) * cosT(u)(x); x += 1 }
        s
      }
      val dct = Array.tabulate(8, 8) { (v, u) =>
        var s = 0.0; var y = 0
        while (y < N) { s += rows(y)(u) * cosT(v)(y); y += 1 }
        s
      }
      var sum = 0.0
      for (v <- 0 until 8; u <- 0 until 8; if v != 0 || u != 0) sum += dct(v)(u)
      val mean = sum / 63.0
      var hash = 0L
      var bit = 0
      for (v <- 0 until 8; u <- 0 until 8; if v != 0 || u != 0) {
        if (dct(v)(u) > mean) hash |= (1L << bit)
        bit += 1
      }
      hash
    }

  /** (w, h, luma lookup in integer thousandths) per decoded format — the
    * shared deterministic decode behind [[dhash64]] and [[phash64]].
    */
  private[ops] def sampledLuma(bytes: Array[Byte], format: String): Option[(Int, Int, (Int, Int) => Int)] = {
    val decoded: Option[(Int, Int, (Int, Int) => Int)] = format match {
      case "image/bmp" =>
        // direct sampled reads of the stored pixel array (no full decode)
        if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') None
        else {
          def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
          def le32(o: Int): Long =
            (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
              ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
          val pixOff = le32(10).toInt
          val srcW = le32(18).toInt
          val rawH = le32(22).toInt
          val srcH = math.abs(rawH)
          val topDown = rawH < 0
          val bpp = le16(28)
          val compression = le32(30)
          if (srcW <= 0 || srcH == 0 || compression != 0L || (bpp != 24 && bpp != 32)) None
          else {
            val px = bpp / 8
            val rowL = ((srcW.toLong * bpp + 31) / 32) * 4
            if (rowL <= 0 || rowL > Int.MaxValue ||
              pixOff < 54 || pixOff.toLong + rowL * srcH > bytes.length) None
            else {
              val row = rowL.toInt
              val luma = (x: Int, y: Int) => {
                val sy = if (topDown) y else srcH - 1 - y
                val o = pixOff + sy * row + x * px
                val b = bytes(o) & 0xFF; val g = bytes(o + 1) & 0xFF; val r = bytes(o + 2) & 0xFF
                299 * r + 587 * g + 114 * b
              }
              Some((srcW, srcH, luma))
            }
          }
        }
      case "image/png" =>
        PixelCodec.pngDecode(bytes).map { case (w, h, ch, raw, stride) =>
          val luma = (x: Int, y: Int) => {
            val o = y * stride + 1 + x * ch
            val r = raw(o) & 0xFF
            val g = if (ch >= 3) raw(o + 1) & 0xFF else r
            val b = if (ch >= 3) raw(o + 2) & 0xFF else r
            299 * r + 587 * g + 114 * b
          }
          (w, h, luma)
        }
      case "image/jpeg" =>
        JpegCodec.decode(bytes).map { case (w, h, rgb) =>
          val luma = (x: Int, y: Int) => {
            val o = (y * w + x) * 3
            299 * (rgb(o) & 0xFF) + 587 * (rgb(o + 1) & 0xFF) + 114 * (rgb(o + 2) & 0xFF)
          }
          (w, h, luma)
        }
      case _ => None
    }
    decoded
  }

  /** 64-bit audio fingerprint — the PCM analogue of [[dhash64]]: the sample
    * stream splits into 65 equal windows, each window's ENERGY Σv² is an
    * exact long, and bit i is set iff energy strictly rises window i→i+1.
    * Energy comparisons are invariant under uniform gain, so volume-
    * normalized copies of a clip hash identically (spec'd); time-shifted
    * clips don't — this is a whole-clip near-dup key, not an alignment
    * search. None outside the 16-bit PCM envelope.
    */
  def ahash64(bytes: Array[Byte]): Option[Long] = ahash64Trimmed(bytes, 0.0)

  /** [[ahash64]] over the stream with the leading `trimFraction` of samples
    * dropped — the probe primitive for ALIGNMENT-tolerant matching: a clip
    * whose copy carries leading silence/padding re-aligns when one side is
    * hashed at several trims ([[audioProbePairs]]).
    */
  def ahash64Trimmed(bytes: Array[Byte], trimFraction: Double): Option[Long] =
    PixelCodec.pcm16(bytes).flatMap { case (dataOff0, nSamples0) =>
      val skip = math.max(0, math.min(nSamples0 - 65, (trimFraction * nSamples0).toInt))
      val dataOff = dataOff0 + 2 * skip
      val nSamples = nSamples0 - skip
      if (nSamples < 65) None
      else Some {
        val energies = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val lo = (w.toLong * nSamples / 65).toInt
          val hi = ((w + 1).toLong * nSamples / 65).toInt
          var e = 0L
          var i = lo
          while (i < hi) {
            val o = dataOff + 2 * i
            val v = ((bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)).toShort.toLong
            e += v * v
            i += 1
          }
          energies(w) = e
          w += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (energies(b + 1) > energies(b)) hash |= (1L << b)
          b += 1
        }
        hash
      }
    }

  final case class DhashRow(id: Long, format: String, ok: Boolean, dhash: Long)

  /** Per-image dHash frame: (id, format, ok, dhash); out-of-envelope
    * payloads come back ok=false with dhash 0 (triage rows, never dropped
    * silently). Byte-level decode runs in `mapPartitions` — the one tier
    * where a Catalyst expression genuinely doesn't fit.
    */
  def imageDhash(spark: SparkSession, media: DataFrame): Dataset[DhashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        dhash64(r.media, r.format) match {
          case Some(hv) => DhashRow(r.id, r.format, ok = true, hv)
          case None => DhashRow(r.id, r.format, ok = false, 0L)
        }
      }
    }
  }

  /** IMAGE near-duplicate pairs: dHash signatures → the shared Hamming
    * bucket machinery ([[Dedup.hammingPairs]] — pigeonhole chunks, skinny
    * (chunk, id, sig) shuffle, row-local first-matching-chunk dedup).
    * Emits (id_a, id_b, hamming ≤ maxHamming) over decodable images —
    * resized/re-encoded copies of a picture land within a few bits while
    * unrelated pictures sit near the 32-bit random baseline.
    */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 6, nChunks: Int = 8): DataFrame = {
    val sigs = imageDhash(spark, media).filter(_.ok).toDF()
    graft.ops.Dedup.hammingPairs(sigs, "id", "dhash",
      maxHamming = maxHamming, nChunks = nChunks)
  }

  /** [[imageNearDupPairs]] over [[phash64]] signatures — the re-grade-
    * robust variant (same shared Hamming bucket machinery; pick pHash when
    * the corpus carries re-exposed/re-graded copies, dHash for raw
    * re-encodes).
    */
  def imagePhashPairs(spark: SparkSession, media: DataFrame,
                      maxHamming: Int = 6, nChunks: Int = 8): DataFrame = {
    import spark.implicits._
    val sigs = media.as[MediaRow].mapPartitions { it =>
      it.flatMap(r => phash64(r.media, r.format)
        .map(h => DhashRow(r.id, r.format, ok = true, h)))
    }.toDF().withColumnRenamed("dhash", "phash") // name the hash FAMILY, not the reused row shape
    graft.ops.Dedup.hammingPairs(sigs, "id", "phash",
      maxHamming = maxHamming, nChunks = nChunks)
  }

  /** Audio near-duplicate pairs over [[ahash64]] fingerprints — same shared
    * Hamming bucket machinery as the image path.
    */
  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 6, nChunks: Int = 8): DataFrame = {
    import spark.implicits._
    val sigs = media.as[MediaRow].mapPartitions { it =>
      it.flatMap(r => ahash64(r.media).map(h => DhashRow(r.id, r.format, ok = true, h)))
    }.toDF().withColumnRenamed("dhash", "ahash") // name the hash FAMILY, not the reused row shape
    graft.ops.Dedup.hammingPairs(sigs, "id", "ahash",
      maxHamming = maxHamming, nChunks = nChunks)
  }

  /** ALIGNMENT-tolerant audio retrieval (the multi-probe idiom pointed at
    * audio): each QUERY clip is fingerprinted at `probes` leading-trim
    * offsets (0, 1/(65·…), … of its length — the window grid re-aligns at
    * one of them when a corpus copy carries leading padding/silence),
    * while the CORPUS side stays ONE base hash per clip — probe cost lands
    * on the small query side only, index storage unchanged (the Lv et al.
    * multi-probe trade). Candidates via the bipartite chunk join
    * ([[graft.ops.Dedup.hammingJoin]]); per (query, corpus) pair the BEST
    * probe's distance is kept.
    *
    * @return (query_id, corpus_id, hamming = min over probes ≤ maxHamming).
    */
  def audioProbePairs(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                      probes: Int = 4, maxHamming: Int = 10,
                      nChunks: Int = 16): DataFrame = {
    require(probes >= 1)
    import spark.implicits._
    val qsigs = queries.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        (0 until probes).flatMap { p =>
          ahash64Trimmed(r.media, p.toDouble / (65.0 * probes) * 4.0)
            .map(h => DhashRow(r.id, r.format, ok = true, h))
        }
      }
    }.toDF().withColumnRenamed("dhash", "ahash")
    val csigs = corpus.as[MediaRow].mapPartitions { it =>
      it.flatMap(r => ahash64(r.media).map(h => DhashRow(r.id, r.format, ok = true, h)))
    }.toDF().withColumnRenamed("dhash", "ahash")
    graft.ops.Dedup.hammingJoin(qsigs, "id", "ahash", csigs, "id", "ahash",
        maxHamming = maxHamming, nChunks = nChunks)
      .groupBy(col("id_l").as("query_id"), col("id_r").as("corpus_id"))
      .agg(min(col("hamming")).as("hamming"))
  }

  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, feat) = r.format match {
          case "image/bmp" =>
            PixelCodec.bmpFeatures(r.media).getOrElse(FakeCodec.decode(r.media, r.format))
          case "image/png" =>
            PixelCodec.pngFeatures(r.media).getOrElse(FakeCodec.decode(r.media, r.format))
          case "image/jpeg" =>
            PixelCodec.jpegFeatures(r.media).getOrElse(FakeCodec.decode(r.media, r.format))
          case "audio/wav" =>
            PixelCodec.wavFeatures(r.media) match {
              case Some(f) => (-1, -1, f) // dims are an image concept
              case None => FakeCodec.decode(r.media, r.format)
            }
          case _ => FakeCodec.decode(r.media, r.format)
        }
        DecodedRow(r.id, r.media.length.toLong,
          if (r.media.isEmpty) -1 else java.lang.Byte.toUnsignedInt(r.media(0)),
          r.format, w, h, feat)
      }
    }
  }

  /** Byte-level media TRANSFORMS — real implementations in the spirit of the
    * header parsers: no libraries, deterministic, output payloads are valid
    * files the parsers above round-trip. Corrupt/unsupported inputs emit
    * ok=false rows with empty media (triage, not exceptions).
    */
  object Codecs {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) | ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def putLe32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
      b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
    }

    /** Nearest-neighbor scale of an uncompressed 24/32-bpp BMP to
      * (newW, newH); returns a VALID BMP (54-byte headers, bottom-up,
      * word-aligned rows). Source pixel for output (x, y) is
      * (x·srcW/newW, y·srcH/newH) — integer floor mapping, deterministic.
      * Top-down sources (negative height) are handled; palettized or
      * compressed BMPs return None.
      */
    def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
      if (newW <= 0 || newH <= 0) return None
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val pixOff = le32(bytes, 10).toInt
      val srcW = le32(bytes, 18).toInt
      val hRaw = le32(bytes, 22).toInt
      val topDown = hRaw < 0
      val srcH = math.abs(hRaw)
      val bpp = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (srcW <= 0 || srcH == 0 || compression != 0L || (bpp != 24 && bpp != 32)) return None
      val px = bpp / 8
      // source stride in Long: a large header width overflows Int to a
      // small/negative stride that passes the bounds check and then blows up
      // in arraycopy instead of triaging to None.
      val srcRowL = ((srcW.toLong * bpp + 31) / 32) * 4
      if (srcRowL <= 0 || srcRowL > Int.MaxValue) return None
      val srcRow = srcRowL.toInt
      if (pixOff < 54 || pixOff.toLong + srcRowL * srcH > bytes.length) return None
      val dstRowL = ((newW.toLong * bpp + 31) / 32) * 4
      // guard the OUTPUT size too: adversarial target dims would overflow
      // the Int array size and throw instead of triaging cleanly
      if (54L + dstRowL * newH > Int.MaxValue - 8) return None
      val dstRow = dstRowL.toInt
      val dataSize = dstRow * newH
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, 54L + dataSize) // file size
      putLe32(out, 10, 54L)           // pixel data offset
      putLe32(out, 14, 40L)           // BITMAPINFOHEADER size
      putLe32(out, 18, newW.toLong)
      putLe32(out, 22, newH.toLong)   // positive = bottom-up
      putLe16(out, 26, 1)             // planes
      putLe16(out, 28, bpp)
      putLe32(out, 34, dataSize.toLong)
      putLe32(out, 38, 2835L); putLe32(out, 42, 2835L) // 72 dpi
      var y = 0 // output STORED row; output is bottom-up, so logical row flips
      while (y < newH) {
        val yLog = newH - 1 - y
        val srcYLog = (yLog.toLong * srcH / newH).toInt
        val srcStored = if (topDown) srcYLog else srcH - 1 - srcYLog
        val srcBase = pixOff + srcStored * srcRow
        val dstBase = 54 + y * dstRow
        var x = 0
        while (x < newW) {
          val srcX = (x.toLong * srcW / newW).toInt
          System.arraycopy(bytes, srcBase + srcX * px, out, dstBase + x * px, px)
          x += 1
        }
        y += 1
      }
      Some(out)
    }

    /** Synthesize a VALID bottom-up 24-bpp grayscale BMP from a TOP-DOWN
      * luminance function `f(x, y) ∈ [0, 256)` — the deterministic frame
      * builder behind the video gate/specs (and a general test-image
      * factory). Round-trips through [[Headers.parseBmp]], [[PixelCodec
      * .bmpFeatures]] and [[dhash64]].
      */
    def grayBmp(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, "bad dims")
      val row = (w * 3 + 3) / 4 * 4
      val out = new Array[Byte](54 + row * h)
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, 54L + row * h)
      putLe32(out, 10, 54L)
      putLe32(out, 14, 40L)
      putLe32(out, 18, w.toLong)
      putLe32(out, 22, h.toLong) // positive = bottom-up
      putLe16(out, 26, 1)
      putLe16(out, 28, 24)
      putLe32(out, 34, (row * h).toLong)
      putLe32(out, 38, 2835L); putLe32(out, 42, 2835L)
      var sy = 0
      while (sy < h) {
        val y = h - 1 - sy // stored bottom-up
        val base = 54 + sy * row
        var x = 0
        while (x < w) {
          val v = (f(x, y) & 0xFF).toByte
          out(base + x * 3) = v; out(base + x * 3 + 1) = v; out(base + x * 3 + 2) = v
          x += 1
        }
        sy += 1
      }
      out
    }

    /** Fixed-stride PCM frame sampling: keep every `stride`-th audio frame
      * (one sample across all channels, `blockAlign` bytes) of a PCM WAV and
      * emit a VALID WAV whose sample rate is `rate/stride` — byte-exact
      * decimation, no resampling filter (this is the frame-SAMPLING op, the
      * cheap triage/preview transform; proper DSP needs a real codec).
      * Non-PCM, corrupt, or truncated payloads return None.
      */
    def decimateWav(bytes: Array[Byte], stride: Int): Option[Array[Byte]] = {
      if (stride < 1 || bytes.length < 44) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
            bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
      // Long chunk walk for the same reason as Headers.parseWav: an unsigned
      // 32-bit size truncated to Int can make the increment <= 0 (infinite
      // loop) instead of walking past the end.
      var off = 12L
      var fmtCode = -1; var channels = -1; var rate = -1; var bits = -1
      var dataOff = -1; var dataBytes = -1L
      while (off + 8 <= bytes.length && (fmtCode < 0 || dataOff < 0)) {
        val o = off.toInt
        val id = new String(bytes, o, 4, "US-ASCII")
        val sz = le32(bytes, o + 4)
        if (id == "fmt " && off + 24 <= bytes.length) {
          fmtCode = le16(bytes, o + 8)
          channels = le16(bytes, o + 10)
          rate = le32(bytes, o + 12).toInt
          bits = le16(bytes, o + 22)
        } else if (id == "data") {
          dataOff = o + 8
          dataBytes = sz
        }
        off += 8L + sz + (sz & 1L)
      }
      if (fmtCode != 1 || channels <= 0 || rate <= 0 || bits <= 0 || dataOff < 0) return None
      val blockAlign = channels * bits / 8
      if (blockAlign == 0 || dataOff.toLong + dataBytes > bytes.length) return None
      val nFrames = dataBytes / blockAlign
      val nOut = ((nFrames + stride - 1) / stride).toInt
      val outData = nOut * blockAlign
      val newRate = math.max(1, rate / stride)
      val out = new Array[Byte](44 + outData)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putLe32(out, 4, 36L + outData)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putLe32(out, 16, 16L); putLe16(out, 20, 1)
      putLe16(out, 22, channels); putLe32(out, 24, newRate.toLong)
      putLe32(out, 28, newRate.toLong * blockAlign); putLe16(out, 32, blockAlign)
      putLe16(out, 34, bits)
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putLe32(out, 40, outData.toLong)
      var f = 0
      while (f < nOut) {
        System.arraycopy(bytes, dataOff + f * stride * blockAlign, out, 44 + f * blockAlign, blockAlign)
        f += 1
      }
      Some(out)
    }
  }

  final case class ResizedRow(id: Long, ok: Boolean, width: Int, height: Int, media: Array[Byte])

  /** Nearest-neighbor BMP resize over a media frame — REAL byte transform
    * ([[Codecs.resizeBmp]]), per-partition batches, no shuffle. Output rows
    * carry a valid BMP payload; corrupt/unsupported inputs get ok=false.
    */
  def resize(spark: SparkSession, media: DataFrame, width: Int, height: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        Codecs.resizeBmp(r.media, width, height) match {
          case Some(b) => ResizedRow(r.id, ok = true, width, height, b)
          case None => ResizedRow(r.id, ok = false, -1, -1, Array.emptyByteArray)
        }
      }
    }
  }

  final case class SampledWavRow(id: Long, ok: Boolean, sampleRate: Int,
                                 nFrames: Long, media: Array[Byte])

  /** Fixed-stride WAV frame sampling over a media frame — REAL byte
    * transform ([[Codecs.decimateWav]]): every `stride`-th PCM frame into a
    * valid WAV at `rate/stride`. Per-partition batches, no shuffle.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): Dataset[SampledWavRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        Codecs.decimateWav(r.media, stride) match {
          case Some(b) =>
            val info = Headers.parseWav(b).get
            SampledWavRow(r.id, ok = true, info.sampleRate,
              info.dataBytes / math.max(1, info.channels * info.bitsPerSample / 8), b)
          case None => SampledWavRow(r.id, ok = false, -1, -1L, Array.emptyByteArray)
        }
      }
    }
  }

  /** VIDEO plumbing: a video travels as ONE opaque binary column holding a
    * simple length-prefixed frame container ("GVID"), each frame an
    * embedded still image (BMP/PNG/JPEG — the real codecs above). This is
    * the keyframe/shot layer a curation pipeline needs: per-frame
    * perceptual hashes, shot boundaries from consecutive-frame Hamming
    * distance, one keyframe per shot. Container format (all little-endian):
    * magic "GVID", u8 version (1), u32 frame count, then per frame
    * u32 payload length + payload bytes.
    */
  object Video {
    private def putLe32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = (v & 0xFF).toByte; b(o + 1) = ((v >> 8) & 0xFF).toByte
      b(o + 2) = ((v >> 16) & 0xFF).toByte; b(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

    def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
      val total = 9L + frames.map(f => 4L + f.length).sum
      require(total <= Int.MaxValue - 8, "container too large")
      val out = new Array[Byte](total.toInt)
      out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'; out(4) = 1
      putLe32(out, 5, frames.size.toLong)
      var o = 9
      frames.foreach { f =>
        putLe32(out, o, f.length.toLong)
        System.arraycopy(f, 0, out, o + 4, f.length)
        o += 4 + f.length
      }
      out
    }

    /** Frame payloads, or None for corrupt/foreign containers (triage, not
      * exceptions): bad magic/version, counts or lengths that walk past the
      * end. Long offsets so adversarial u32 lengths can't wrap Int.
      */
    def frames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
      if (bytes.length < 9 || bytes(0) != 'G' || bytes(1) != 'V' ||
        bytes(2) != 'I' || bytes(3) != 'D' || bytes(4) != 1) return None
      val n = le32(bytes, 5)
      if (n < 0 || n > Int.MaxValue) return None
      val out = new Array[Array[Byte]](n.toInt)
      var o = 9L
      var i = 0
      while (i < n) {
        if (o + 4 > bytes.length) return None
        val len = le32(bytes, o.toInt)
        if (len < 0 || o + 4 + len > bytes.length) return None
        out(i) = java.util.Arrays.copyOfRange(bytes, (o + 4).toInt, (o + 4 + len).toInt)
        o += 4 + len
        i += 1
      }
      if (o != bytes.length) return None // trailing garbage = corrupt
      Some(out)
    }

    /** Scala-side magic-byte sniffer (the byte-level twin of the Column
      * [[sniffFormat]]) — frames inside a container carry no format column.
      */
    def sniffBytes(b: Array[Byte]): String = {
      def at(o: Int, v: Int) = b.length > o && (b(o) & 0xFF) == v
      if (at(0, 'B') && at(1, 'M')) "image/bmp"
      else if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) "image/png"
      else if (at(0, 0xFF) && at(1, 0xD8)) "image/jpeg"
      else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
        at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "audio/wav"
      else "application/octet-stream"
    }
  }

  final case class FrameHashRow(id: Long, frame_idx: Int, format: String,
                                ok: Boolean, dhash: Long)

  /** Per-frame dHash over GVID containers: (video id, frame_idx, sniffed
    * format, ok, dhash). Corrupt containers and out-of-envelope frames come
    * back ok=false (triage rows, never dropped silently). Byte decode runs
    * in `mapPartitions` — row-local, no shuffle; frame count per video is
    * bounded, so no row explosion risk.
    */
  def videoFrameDhash(spark: SparkSession, media: DataFrame): Dataset[FrameHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        Video.frames(r.media) match {
          case None => Iterator.single(FrameHashRow(r.id, -1, "video/gvid-corrupt", ok = false, 0L))
          case Some(fs) => fs.iterator.zipWithIndex.map { case (f, i) =>
            val fmt = Video.sniffBytes(f)
            dhash64(f, fmt) match {
              case Some(hv) => FrameHashRow(r.id, i, fmt, ok = true, hv)
              case None => FrameHashRow(r.id, i, fmt, ok = false, 0L)
            }
          }
        }
      }
    }
  }

  /** Shot-boundary detection: a frame starts a new shot when the Hamming
    * distance between its dHash and the previous decodable frame's exceeds
    * `maxHamming` (re-encoded/lightly-edited continuations land within a
    * few bits; a cut lands near the 32-bit random baseline). Output per
    * decodable frame: (id, frame_idx, dhash, hamming_prev — −1 for the
    * first frame, is_boundary, shot_id — 0-based running shot counter).
    *
    * Scale shape: the lag/running-sum windows partition BY VIDEO — state is
    * one video's frame list, never a global sort; the only shuffle is the
    * hash partition on id.
    */
  def shotBoundaries(spark: SparkSession, media: DataFrame,
                     maxHamming: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("frame_idx")
    videoFrameDhash(spark, media).toDF().where(col("ok"))
      .withColumn("__prev", lag(col("dhash"), 1).over(w))
      .withColumn("hamming_prev",
        when(col("__prev").isNull, lit(-1))
          .otherwise(bit_count(expr("dhash ^ __prev"))).cast(IntegerType))
      .withColumn("is_boundary", col("hamming_prev") > lit(maxHamming))
      .withColumn("shot_id",
        sum(when(col("is_boundary"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("id"), col("frame_idx"), col("dhash"),
        col("hamming_prev"), col("is_boundary"), col("shot_id"))
  }

  /** VIDEO near-duplicate pairs via KEYFRAMES: two videos pair when enough
    * of their shots' keyframe dHashes land within `maxHamming` bits — the
    * re-encoded / re-containered / lightly-edited copy detector that
    * whole-file hashing misses, at keyframe (not frame) cost. Composes
    * [[keyframes]] with the shared Hamming bucket machinery
    * ([[graft.ops.Dedup.hammingPairs]] — pigeonhole chunks, skinny
    * shuffle, no all-pairs): keyframe ids encode as video·2²⁰ + shot (2²⁰
    * shots/video bound), matched shots count DISTINCT per side, and
    * `overlap` = min(matched_a, matched_b) / min(#keyframes) so a busy
    * video can't inflate its match against a short one.
    *
    * @return (video_a, video_b, matched, kf_a, kf_b, overlap ≥ minOverlap)
    */
  def videoNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 6, nChunks: Int = 8,
                        shotHamming: Int = 12,
                        minOverlap: Double = 0.5): DataFrame = {
    val SHIFT = 1L << 20
    val kf = keyframes(spark, media, shotHamming)
      .select((col("id") * SHIFT + col("shot_id")).as("kfid"), col("dhash"))
    val kfCounts = kf.select(expr(s"kfid div ${SHIFT}L").as("vid"))
      .groupBy("vid").agg(count(lit(1)).as("nkf"))
    val pairs = graft.ops.Dedup.hammingPairs(kf, "kfid", "dhash",
        maxHamming = maxHamming, nChunks = nChunks)
      .select(expr(s"id_a div ${SHIFT}L").as("video_a"),
        pmod(col("id_a"), lit(SHIFT)).as("shot_a"),
        expr(s"id_b div ${SHIFT}L").as("video_b"),
        pmod(col("id_b"), lit(SHIFT)).as("shot_b"))
      .where(col("video_a") =!= col("video_b"))
      // canonical orientation so (a,b) and (b,a) collapse
      .select(
        least(col("video_a"), col("video_b")).as("video_a"),
        when(col("video_a") < col("video_b"), col("shot_a")).otherwise(col("shot_b")).as("shot_a"),
        greatest(col("video_a"), col("video_b")).as("video_b"),
        when(col("video_a") < col("video_b"), col("shot_b")).otherwise(col("shot_a")).as("shot_b"))
      .groupBy("video_a", "video_b")
      .agg(countDistinct(col("shot_a")).as("m_a"), countDistinct(col("shot_b")).as("m_b"))
    pairs
      .join(kfCounts.select(col("vid").as("video_a"), col("nkf").as("kf_a")), Seq("video_a"))
      .join(kfCounts.select(col("vid").as("video_b"), col("nkf").as("kf_b")), Seq("video_b"))
      .withColumn("matched", least(col("m_a"), col("m_b")))
      .withColumn("overlap",
        col("matched").cast(DoubleType) / least(col("kf_a"), col("kf_b")).cast(DoubleType))
      .where(col("overlap") >= minOverlap)
      .select("video_a", "video_b", "matched", "kf_a", "kf_b", "overlap")
  }

  /** One keyframe per shot — the shot's FIRST frame (deterministic, no
    * decode-quality heuristic): (id, shot_id, frame_idx, dhash, n_frames =
    * frames in the shot). The downstream contract: image-tier ops
    * ([[imageNearDupPairs]], embeddings, captioning) run on keyframes only
    * — a 100-TB video corpus shrinks to its shot count before any
    * expensive per-frame work.
    */
  def keyframes(spark: SparkSession, media: DataFrame,
                maxHamming: Int = 12): DataFrame = {
    shotBoundaries(spark, media, maxHamming)
      .groupBy(col("id"), col("shot_id"))
      .agg(min(col("frame_idx")).as("frame_idx"),
        min_by(col("dhash"), col("frame_idx")).as("dhash"),
        count(lit(1)).cast(LongType).as("n_frames"))
  }
}
