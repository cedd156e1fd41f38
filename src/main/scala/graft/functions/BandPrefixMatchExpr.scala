package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** True iff the two long arrays agree at ANY index < `n` — allocation-free
  * (≤ n primitive compares), whole-stage-codegen'd.
  *
  * Used by LSH pair generation to emit each candidate pair only from the
  * FIRST band whose keys collide: a pair seen in band `b` is kept iff no
  * earlier band matched. This replaces a dropDuplicates shuffle over the
  * ~bands×-duplicated candidate stream with a row-local filter (the HOF
  * equivalent — exists(zip_with(slice,slice,_===_),id) — allocates three
  * arrays per joined row and was measured ~10× slower than the join itself).
  */
case class BandPrefixMatchExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_band_prefix_match expects (array<bigint>, array<bigint>, int), got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_band_prefix_match"

  override def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lim = n.asInstanceOf[Int]
    var i = 0
    while (i < lim) {
      if (x.getLong(i) == y.getLong(i)) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, n) => {
      val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      s"""
         |boolean $found = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) { $found = true; break; }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): BandPrefixMatchExpr =
    copy(first = f, second = s, third = t)
}

object BandPrefixMatch {
  /** True iff bkA[i] == bkB[i] for some i < n. */
  def matchesBefore(bkA: Column, bkB: Column, n: Column): Column =
    GraftShim.toColumn(BandPrefixMatchExpr(
      GraftShim.toExpression(bkA), GraftShim.toExpression(bkB), GraftShim.toExpression(n)))
}
