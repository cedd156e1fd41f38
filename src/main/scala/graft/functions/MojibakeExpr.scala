package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake (double-encoded UTF-8) detection and repair — the ftfy core
  * case: text was UTF-8 encoded, the BYTES were then mis-decoded as
  * Latin-1/Windows-1252, and "café" ships as "cafÃ©", "“x”" as "â€œxâ€�".
  * Crawled corpora are full of it; scoring/dedup see the garbled form as
  * distinct text unless repaired upstream.
  *
  * Repair rule (strict, so CLEAN text is never harmed):
  *  - scan maximal RUNS of consecutive chars that map back to a single
  *    mis-decoding byte — code points U+0080..U+00FF map to themselves
  *    (Latin-1 identity), plus the 27 Windows-1252 printables for bytes
  *    0x80..0x9F (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ);
  *    ASCII ends a run;
  *  - a run is repaired ONLY when its whole byte image is valid UTF-8
  *    consisting of complete multibyte sequences (strict table-driven
  *    validation, no overlongs, max U+10FFFF, no surrogates); otherwise the
  *    run is left byte-for-byte as it came — a genuine "é" alone is a lone
  *    0xE9 continuation-less byte and never validates, so real Latin text
  *    passes through untouched;
  *  - applied ONCE: "&amp;"-style double-mojibake resolves one level per
  *    call, matching the decode-one-layer contract.
  *
  * [[Mojibake.count]] reports the number of multibyte sequences a repair
  * decodes (0 on clean text) — the scan-level triage metric.
  */
object Mojibake {

  /** char → original byte under the cp1252-then-latin1 view, or -1. */
  private def byteFor(c: Char): Int = c match {
    case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
    case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
    case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
    case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
    case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
    case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
    case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
    case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
    case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
    case c if c >= 0x80 && c <= 0xFF => c.toInt
    case _ => -1
  }

  /** Validate bytes[from, until) as complete multibyte-only UTF-8; returns
    * the number of decoded sequences, or -1 when invalid. Multibyte-only:
    * a repairable run never contains ASCII (ASCII ends runs upstream).
    */
  private def validSequences(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    var seqs = 0
    while (i < until) {
      val b0 = b(i) & 0xFF
      val len =
        if (b0 >= 0xC2 && b0 <= 0xDF) 2
        else if (b0 >= 0xE0 && b0 <= 0xEF) 3
        else if (b0 >= 0xF0 && b0 <= 0xF4) 4
        else return -1
      if (i + len > until) return -1
      var k = 1
      var cp = b0 & (0x7F >> len)
      while (k < len) {
        val bk = b(i + k) & 0xFF
        if (bk < 0x80 || bk > 0xBF) return -1
        cp = (cp << 6) | (bk & 0x3F)
        k += 1
      }
      // overlong / surrogate / out-of-range checks
      if (len == 2 && cp < 0x80) return -1
      if (len == 3 && (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF))) return -1
      if (len == 4 && (cp < 0x10000 || cp > 0x10FFFF)) return -1
      seqs += 1
      i += len
    }
    seqs
  }

  /** Core: (repaired string, sequences decoded). */
  def repair(s: String): (String, Int) = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    val run = new Array[Byte](n) // byte image of the current run
    var fixed = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val b = if (c < 0x80) -1 else byteFor(c)
      if (b < 0) { sb.append(c); i += 1 }
      else {
        var m = 0
        val start = i
        var ok = true
        while (i < n && ok) {
          val bc = if (s.charAt(i) < 0x80) -1 else byteFor(s.charAt(i))
          if (bc < 0) ok = false
          else { run(m) = bc.toByte; m += 1; i += 1 }
        }
        val seqs = if (m >= 2) validSequences(run, 0, m) else -1
        if (seqs > 0) {
          sb.append(new String(run, 0, m, java.nio.charset.StandardCharsets.UTF_8))
          fixed += seqs
        } else sb.append(s, start, i)
      }
    }
    (sb.toString, fixed)
  }

  def fixEval(u: UTF8String): UTF8String = UTF8String.fromString(repair(u.toString)._1)
  def countEval(u: UTF8String): Long = repair(u.toString)._2.toLong

  /** Column API: `graft_fix_mojibake(text)` — repaired text. */
  def fix(text: Column): Column =
    GraftShim.toColumn(FixMojibakeExpr(GraftShim.toExpression(text)))

  /** Column API: `graft_mojibake_count(text)` — multibyte sequences a
    * repair would decode (0 = clean).
    */
  def count(text: Column): Column =
    GraftShim.toColumn(MojibakeCountExpr(GraftShim.toExpression(text)))
}

case class FixMojibakeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fix_mojibake expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"
  override def nullSafeEval(input: Any): Any =
    Mojibake.fixEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mojibake.fixEval($c)")
  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}

case class MojibakeCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mojibake_count expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mojibake_count"
  override def nullSafeEval(input: Any): Any =
    Mojibake.countEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mojibake.countEval($c)")
  override protected def withNewChildInternal(newChild: Expression): MojibakeCountExpr =
    copy(child = newChild)
}
