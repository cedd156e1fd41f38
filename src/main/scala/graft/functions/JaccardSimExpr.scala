package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Jaccard similarity |A∩B| / |A∪B| of two SORTED, DISTINCT arrays of
  * strings or longs (as produced by `array_sort(array_distinct(...))`): a
  * single merge-walk, O(n+m) comparisons, no hash-set allocation (the builtin
  * `array_intersect` builds a hash set per call). The long form is the hot
  * path for hash-based set similarity (token-hash sets).
  */
case class JaccardSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects two array<string> or two array<bigint>, got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  private def isLongForm: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    val longs = isLongForm
    while (i < n && j < m) {
      val c =
        if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      val cmp =
        if (isLongForm) s"Long.compare($x.getLong($i), $y.getLong($j))"
        else s"$x.getUTF8String($i).binaryCompare($y.getUTF8String($j))"
      s"""
         |final int $n = $x.numElements();
         |final int $m = $y.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  final int $c = $cmp;
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |final int $union = $n + $m - $inter;
         |${ev.value} = ($union == 0) ? 1.0 : (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSimExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def jaccard(a: Column, b: Column): Column =
    GraftShim.toColumn(JaccardSimExpr(GraftShim.toExpression(a), GraftShim.toExpression(b)))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_jaccard"),
    new ExpressionInfo(classOf[JaccardSimExpr].getName, "graft_jaccard"),
    (args: Seq[Expression]) => JaccardSimExpr(args(0), args(1))
  )
}
