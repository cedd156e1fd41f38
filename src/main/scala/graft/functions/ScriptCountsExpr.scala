package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Unicode script letter counter — the native replacement for
  * [[graft.ops.TextAnalysis.scriptProfile]]'s 7 per-script
  * `length(regexp_replace(text, "[^range]", ""))` passes (up to 14 regex
  * traversals of every document once the dominance tree duplicated them;
  * the r16 examination measured the q_script/q_line_filter_cjk gates
  * regex-bound on exactly this).
  *
  * Returns `array<long>` of 7 counts in the canonical
  * [[graft.ops.TextAnalysis.ScriptRanges]] order: latin, cyrillic, cjk,
  * arabic, hangul, greek, devanagari.
  *
  * Semantics are IDENTICAL to the regex formulation (asserted
  * property-wise in ScriptCountsSpec against the live `regexp_replace`
  * trees): each count is the number of codepoints of the string inside
  * that script's ranges. All ranges are BMP and disjoint, so one walk
  * with range dispatch counts exactly what 7 independent
  * remove-the-complement regex passes count:
  *   - every matched codepoint is a single UTF-16 unit / ≤3 UTF-8 bytes;
  *   - non-BMP codepoints (surrogate pairs) are in no range either way;
  *   - malformed UTF-8 contributes nothing on both paths (java.String
  *     decodes it to U+FFFD, which no range contains; the byte walk skips
  *     it).
  * The walk runs over the UTF8String's bytes directly — zero allocation
  * per row beyond the 7-slot result.
  */
object ScriptCounts {
  final val N = 7

  @inline private def classify(cp: Int, c: Array[Long]): Unit = {
    // canonical ScriptRanges order; ranges are mutually disjoint so the
    // if/else chain equals 7 independent membership tests
    if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0x00C0 && cp <= 0x024F)) c(0) += 1               // latin
    else if (cp >= 0x0400 && cp <= 0x04FF) c(1) += 1            // cyrillic
    else if ((cp >= 0x4E00 && cp <= 0x9FFF) ||
             (cp >= 0x3040 && cp <= 0x30FF)) c(2) += 1          // cjk + kana
    else if (cp >= 0x0600 && cp <= 0x06FF) c(3) += 1            // arabic
    else if ((cp >= 0xAC00 && cp <= 0xD7AF) ||
             (cp >= 0x1100 && cp <= 0x11FF)) c(4) += 1          // hangul
    else if (cp >= 0x0370 && cp <= 0x03FF) c(5) += 1            // greek
    else if (cp >= 0x0900 && cp <= 0x097F) c(6) += 1            // devanagari
  }

  @inline private def cont(b: Int): Boolean = (b & 0xC0) == 0x80

  def counts(u: UTF8String): ArrayData = {
    val n = u.numBytes()
    val c = new Array[Long](N)
    var i = 0
    while (i < n) {
      val b0 = u.getByte(i) & 0xFF
      if (b0 < 0x80) { classify(b0, c); i += 1 }
      else if (b0 < 0xC0) i += 1 // stray continuation byte: no codepoint
      else if (b0 < 0xE0) {      // 2-byte sequence: U+0080..U+07FF
        val b1 = if (i + 1 < n) u.getByte(i + 1) & 0xFF else 0
        if (cont(b1)) classify(((b0 & 0x1F) << 6) | (b1 & 0x3F), c)
        i += 2
      } else if (b0 < 0xF0) {    // 3-byte sequence: U+0800..U+FFFF
        val b1 = if (i + 1 < n) u.getByte(i + 1) & 0xFF else 0
        val b2 = if (i + 2 < n) u.getByte(i + 2) & 0xFF else 0
        if (cont(b1) && cont(b2))
          classify(((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F), c)
        i += 3
      } else i += 4              // 4-byte: non-BMP, in no range
    }
    new GenericArrayData(c)
  }

  /** Column API: `graft_script_counts(text)` → array<long>[7]. */
  def counts(text: Column): Column =
    GraftShim.toColumn(ScriptCountsExpr(GraftShim.toExpression(text)))
}

/** Codegen'd wrapper around [[ScriptCounts.counts]] — a static call per
  * row, stays inside whole-stage codegen (TypeMaskExpr pattern).
  */
case class ScriptCountsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_script_counts expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_script_counts"

  override def nullSafeEval(input: Any): Any =
    ScriptCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptCountsExpr =
    copy(child = newChild)
}
