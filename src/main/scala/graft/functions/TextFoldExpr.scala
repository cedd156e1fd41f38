package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text folding for match keys: lowercase (root locale) →
  * NFD decomposition → strip combining marks → NFC recompose. "Café",
  * "CAFÉ" and "Café" all fold to "cafe" — the normalization step
  * before exact/fuzzy dedup, entity resolution and URL/name keying, where
  * byte-level equality would silently miss visually-identical strings.
  */
object TextFold {
  def fold(s: UTF8String): UTF8String = {
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nfd = java.text.Normalizer.normalize(lowered, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  /** Column API: `graft_fold_text(text)`. */
  def fold(text: Column): Column =
    GraftShim.toColumn(TextFoldExpr(GraftShim.toExpression(text)))
}

/** Codegen'd wrapper around [[TextFold.fold]] — a static call per row, no
  * reference objects, stays inside whole-stage codegen.
  */
case class TextFoldExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fold_text expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_text"

  override def nullSafeEval(input: Any): Any =
    TextFold.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFold.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): TextFoldExpr =
    copy(child = newChild)
}
