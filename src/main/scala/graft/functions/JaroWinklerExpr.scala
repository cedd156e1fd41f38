package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Textbook Jaro–Winkler similarity (Winkler 1990): Jaro = mean of
  * (m/|a|, m/|b|, (m−t)/m) over window-matched characters with half-counted
  * transpositions; Winkler boost p=0.1 on the common prefix capped at 4,
  * applied only when Jaro > 0.7. Both-empty and either-empty score 0 —
  * the SAME conventions DuckDB's `jaro_winkler_similarity` uses (spec'd
  * value-for-value on the standard literature pairs), so gates oracle
  * directly. THE name/title matcher of the record-linkage literature —
  * [[LevenshteinKExpr]] covers typo distance; JW weights shared prefixes,
  * which is what human-entered names need. ASCII-exact vs byte-oriented
  * engines; supplementary-plane codepoints count as two UTF-16 units here.
  */
object JaroWinkler {
  def similarity(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def sim(u: UTF8String, v: UTF8String): Double = similarity(u.toString, v.toString)

  /** Column API: `graft_jaro_winkler(a, b)`. */
  def sim(a: Column, b: Column): Column =
    GraftShim.toColumn(JaroWinklerExpr(GraftShim.toExpression(a), GraftShim.toExpression(b)))
}

/** Codegen'd wrapper — a static call per row, stays inside whole-stage
  * codegen.
  */
case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
