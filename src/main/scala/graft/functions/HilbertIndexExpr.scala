package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point: maps (x, y) ∈ [0, 2^order)² to the
  * point's distance along the order-`order` Hilbert curve. Like the Morton
  * code (graft.ops.ZOrder) it linearizes 2-D keys for range-partitioned
  * layout, but consecutive indices are ALWAYS unit-distance neighbours in
  * (x, y) — no Morton "jumps" across the plane — which makes the
  * per-file bounding rectangles tighter at the same file count.
  *
  * The per-row work is the standard quadrant-rotation walk (Hamilton's
  * convert-to-distance form): `order` iterations of pure long/branch
  * arithmetic — a native codegen'd loop; an expression-tree formulation
  * would need `order` chained CASE levels and defeat codegen.
  */
case class HilbertIndexExpr(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate quadrant
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $xa, $y = $ya, $d = 0L;
         |for (long $s = 1L << ${order - 1}; $s > 0; $s >>= 1) {
         |  final long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  final long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    final long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def hilbert(x: Column, y: Column, order: Int): Column =
    GraftShim.toColumn(HilbertIndexExpr(
      GraftShim.toExpression(x), GraftShim.toExpression(y), order))

  /** SQL form `graft_hilbert(x, y)` uses order 16 (keys masked to 16 bits
    * pair with the 32-bit index range used by the layout helpers).
    */
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertIndexExpr].getName, "graft_hilbert"),
    (args: Seq[Expression]) => HilbertIndexExpr(args(0), args(1), 16)
  )
}
