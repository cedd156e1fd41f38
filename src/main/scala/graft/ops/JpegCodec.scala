package graft.ops

/** Baseline JPEG (ITU-T T.81) decoder — pure JVM, no libraries, in the
  * spirit of the other [[Multimodal.PixelCodec]] codecs: marker walk, DQT /
  * DHT / SOF0-1 / DRI / SOS parsing, Huffman-coded DCPM DC + run-length AC
  * entropy decode with FF00 unstuffing and RSTn restarts, dequantization,
  * separable float IDCT, box chroma upsampling and JFIF YCbCr→RGB.
  *
  * Scope (anything outside it returns None and triages upstream):
  * 8-bit precision, sequential DCT (SOF0/SOF1), Huffman coding, 1- or
  * 3-component frames with one interleaved scan, sampling factors 1..4.
  * Progressive (SOF2), arithmetic coding, hierarchical modes, 12-bit,
  * CMYK and multi-scan files are out — by declared triage, not error.
  *
  * Failure discipline: one internal control-flow exception type; every
  * corrupt/truncated/unsupported payload becomes None (never an uncaught
  * throw, never a hang — all loops advance a position that is bounds-
  * checked in Int after Long-guarded size math, the Headers.parseWav
  * lesson).
  */
private[graft] object JpegCodec {

  private final class Fail extends Exception(null, null, false, false)
  private def fail(): Nothing = throw new Fail

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cosT(x)(u) = C(u)/2 * cos((2x+1)uπ/16) — the separable IDCT kernel
  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table in the spec's mincode/maxcode/valptr form. */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        valptr(len) = k
        mincode(len) = code
        maxcode(len) = if (counts(len - 1) == 0) -1 else code + counts(len - 1) - 1
        code = (code + counts(len - 1)) << 1
        k += counts(len - 1)
        len += 1
      }
      if (k != vals.length) fail()
    }
    def decode(br: BitReader): Int = {
      var code = br.nextBit()
      var len = 1
      while (maxcode(len) < 0 || code > maxcode(len)) {
        code = (code << 1) | br.nextBit()
        len += 1
        if (len > 16) fail()
      }
      vals(valptr(len) + code - mincode(len)) & 0xFF
    }
  }

  /** MSB-first bit reader over the entropy-coded segment: FF00 unstuffs to
    * a literal FF; any other FFxx is a marker — remembered, then treated as
    * end-of-data for bit requests (restart handling reads it explicitly).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    private var marker = -1
    def nextBit(): Int = {
      if (cnt == 0) {
        if (marker >= 0 || pos >= b.length) fail()
        var v = b(pos) & 0xFF; pos += 1
        if (v == 0xFF) {
          if (pos >= b.length) fail()
          val m = b(pos) & 0xFF
          if (m == 0x00) pos += 1
          else { marker = m; fail() }
        }
        acc = v; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Discard partial bits, consume and return the next marker code. */
    def restartMarker(): Int = {
      cnt = 0
      if (marker >= 0) { val m = marker; marker = -1; return m }
      while (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF && (b(pos + 1) & 0xFF) == 0xFF)
        pos += 1 // fill bytes
      if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF) fail()
      val m = b(pos + 1) & 0xFF
      pos += 2
      m
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Decode to (width, height, interleaved RGB bytes — 3 per pixel, R G B).
    * Grayscale replicates Y into all three. None outside the supported
    * envelope or on any corruption.
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try Some(decodeOrFail(bytes))
    catch { case _: Fail | _: ArrayIndexOutOfBoundsException => None }

  private def decodeOrFail(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) fail()
    var pos = 2
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var dri = 0

    def u16(o: Int): Int = ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

    var scan: Array[(Int, Int, Int)] = null // (compIdx, dcTab, acTab)
    var brStart = -1
    while (brStart < 0) {
      // marker: skip fill FFs
      if (pos + 1 >= b.length) fail()
      if ((b(pos) & 0xFF) != 0xFF) fail()
      while (pos + 1 < b.length && (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      val m = b(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD9 => fail() // EOI before any scan
        case 0xDB => // DQT
          val len = u16(pos); val end = pos + len
          var o = pos + 2
          while (o < end) {
            val pq = (b(o) & 0xFF) >> 4; val tq = b(o) & 0x0F
            if (tq > 3 || pq > 1) fail()
            o += 1
            var i = 0
            while (i < 64) {
              qt(tq)(i) = if (pq == 0) b(o + i) & 0xFF else u16(o + 2 * i)
              i += 1
            }
            o += (if (pq == 0) 64 else 128)
            qtSeen(tq) = true
          }
          if (o != end) fail()
          pos = end
        case 0xC4 => // DHT
          val len = u16(pos); val end = pos + len
          var o = pos + 2
          while (o < end) {
            val tc = (b(o) & 0xFF) >> 4; val th = b(o) & 0x0F
            if (tc > 1 || th > 3) fail()
            o += 1
            val counts = Array.tabulate(16)(i => b(o + i) & 0xFF)
            o += 16
            val n = counts.sum
            if (n > 256 || o + n > end) fail()
            val vals = java.util.Arrays.copyOfRange(b, o, o + n)
            o += n
            val t = new Huff(counts, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
          }
          if (o != end) fail()
          pos = end
        case 0xC0 | 0xC1 => // SOF0 / SOF1 — baseline & extended sequential
          if (comps != null) fail()
          val len = u16(pos)
          val prec = b(pos + 2) & 0xFF
          h = u16(pos + 3); w = u16(pos + 5)
          val nc = b(pos + 7) & 0xFF
          if (prec != 8 || w <= 0 || h <= 0 || (nc != 1 && nc != 3)) fail()
          if (w > 65500 || h > 65500 || w.toLong * h > (1L << 26)) fail() // size cap
          if (len != 8 + 3 * nc) fail()
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = b(o + 1) & 0xFF
            val c = Comp(b(o) & 0xFF, hv >> 4, hv & 0x0F, b(o + 2) & 0x0F)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3) fail()
            c
          }
          pos += len
        case mm if (mm >= 0xC2 && mm <= 0xCF && mm != 0xC4 && mm != 0xC8 && mm != 0xCC) =>
          fail() // progressive / arithmetic / lossless / hierarchical
        case 0xDD => // DRI
          if (u16(pos) != 4) fail()
          dri = u16(pos + 2)
          pos += 4
        case 0xDA => // SOS
          if (comps == null) fail()
          val len = u16(pos)
          val ns = b(pos + 2) & 0xFF
          if (ns != comps.length || len != 6 + 2 * ns) fail()
          scan = Array.tabulate(ns) { i =>
            val o = pos + 3 + 2 * i
            val cid = b(o) & 0xFF
            val ci = comps.indexWhere(_.id == cid)
            if (ci < 0) fail()
            ((b(o + 1) & 0xFF) >> 4, b(o + 1) & 0x0F) match {
              case (td, ta) =>
                if (td > 3 || ta > 3) fail()
                (ci, td, ta)
            }
          }
          val ss = b(pos + 3 + 2 * ns) & 0xFF
          val se = b(pos + 4 + 2 * ns) & 0xFF
          if (ss != 0 || se != 63) fail() // baseline full-spectrum scan
          brStart = pos + len
        case _ => // APPn / COM / anything with a length we can skip
          if (pos + 2 > b.length) fail()
          pos += u16(pos)
      }
    }

    comps.foreach(c => if (!qtSeen(c.tq)) fail())
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    // single-component scans ignore sampling (T.81 A.2.2): 1 block per MCU
    val (eh, ev) = if (comps.length == 1) (1, 1) else (hmax, vmax)
    val effC: Array[Comp] =
      if (comps.length == 1) Array(comps(0).copy(h = 1, v = 1)) else comps
    val mcusX = (w + 8 * eh - 1) / (8 * eh)
    val mcusY = (h + 8 * ev - 1) / (8 * ev)
    val planes = effC.map { c =>
      val pw = mcusX * 8 * c.h; val ph = mcusY * 8 * c.v
      if (pw.toLong * ph > (1L << 28)) fail()
      (new Array[Byte](pw * ph), pw)
    }

    val br = new BitReader(b, brStart)
    val pred = new Array[Int](effC.length)
    val zz = new Array[Int](64)
    val blk = new Array[Double](64)
    val tmp = new Array[Double](64)

    def decodeBlock(ci: Int, dcT: Huff, acT: Huff, px: Int, py: Int): Unit = {
      java.util.Arrays.fill(zz, 0)
      val t = dcT.decode(br)
      if (t > 11) fail()
      pred(ci) += extend(br.receive(t), t)
      zz(0) = pred(ci)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = acT.decode(br)
        val r = rs >> 4; val s = rs & 0x0F
        if (s == 0) { if (r == 15) k += 16 else eob = true }
        else {
          k += r
          if (k > 63) fail()
          zz(k) = extend(br.receive(s), s)
          k += 1
        }
      }
      // dequantize (both in zigzag order), de-zigzag, IDCT
      val q = qt(effC(ci).tq)
      java.util.Arrays.fill(blk, 0.0)
      var i = 0
      while (i < 64) { blk(zigzag(i)) = (zz(i) * q(i)).toDouble; i += 1 }
      // rows then columns: tmp(x + 8v) = Σu cosT(x)(u) blk(u + 8v)
      var v = 0
      while (v < 8) {
        var x = 0
        while (x < 8) {
          var s2 = 0.0; var u = 0
          while (u < 8) { s2 += cosT(x)(u) * blk(u + 8 * v); u += 1 }
          tmp(x + 8 * v) = s2
          x += 1
        }
        v += 1
      }
      val (plane, pw) = planes(ci)
      val ph = plane.length / pw
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s2 = 0.0; var u = 0
          while (u < 8) { s2 += cosT(y)(u) * tmp(x + 8 * u); u += 1 }
          val pix = math.round(s2 + 128.0).toInt
          val cl = if (pix < 0) 0 else if (pix > 255) 255 else pix
          val yy = py + y; val xx = px + x
          if (yy < ph && xx < pw) plane(yy * pw + xx) = cl.toByte
          x += 1
        }
        y += 1
      }
    }

    val totalMcus = mcusX.toLong * mcusY
    var mi = 0L
    var rstIdx = 0
    while (mi < totalMcus) {
      if (dri > 0 && mi > 0 && mi % dri == 0) {
        val m = br.restartMarker()
        if (m != 0xD0 + rstIdx) fail()
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(pred, 0)
      }
      val mx = (mi % mcusX).toInt; val my = (mi / mcusX).toInt
      var si = 0
      while (si < scan.length) {
        val (ci, td, ta) = scan(si)
        val dcT = dcTabs(td); val acT = acTabs(ta)
        if (dcT == null || acT == null) fail()
        val c = effC(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            decodeBlock(ci, dcT, acT, (mx * c.h + bx) * 8, (my * c.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        si += 1
      }
      mi += 1
    }

    // upsample + color convert into interleaved RGB
    val out = new Array[Byte](w * h * 3)
    if (effC.length == 1) {
      val (plane, pw) = planes(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = plane(y * pw + x)
          val o = (y * w + x) * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val (py_, pwY) = planes(0); val (pcb, pwCb) = planes(1); val (pcr, pwCr) = planes(2)
      val cY = effC(0); val cCb = effC(1); val cCr = effC(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = py_((y * cY.v / vmax) * pwY + (x * cY.h / hmax)) & 0xFF
          val cb = (pcb((y * cCb.v / vmax) * pwCb + (x * cCb.h / hmax)) & 0xFF) - 128
          val cr = (pcr((y * cCr.v / vmax) * pwCr + (x * cCr.h / hmax)) & 0xFF) - 128
          def clamp(d: Double): Byte = {
            val r = math.round(d).toInt
            (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          }
          val o = (y * w + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    (w, h, out)
  }
}
