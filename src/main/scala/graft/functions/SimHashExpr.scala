package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Native SimHash: ONE fused pass over a token-hash array computing all
  * `bits` per-bit majorities (bit b of the result is set iff more than half
  * the hashes have bit b set). Replaces `bits` separate
  * `size(filter(...))` HOF folds — each of which allocated a filtered copy
  * of the array per row — with an n×bits loop over primitive longs.
  * Whole-stage-codegen'd; bit-identical to the HOF formulation.
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) * 2 > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $counts = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $arr.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counts[$b] * 2 > $n) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHash {
  /** Column API: fused SimHash signature over a materialized hash array. */
  def simhash(hashes: Column, bits: Int = 64): Column =
    GraftShim.toColumn(SimHashExpr(GraftShim.toExpression(hashes), bits))

  /** SQL registration payload: `graft_simhash(hashes, bits)`. */
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
    (args: Seq[Expression]) => args match {
      case Seq(h) => SimHashExpr(h, 64)
      case Seq(h, Literal(v: Int, IntegerType)) => SimHashExpr(h, v)
      case Seq(_, other) =>
        throw new IllegalArgumentException(s"graft_simhash: bits must be an int literal, got $other")
      case _ =>
        throw new IllegalArgumentException(
          s"graft_simhash expects (hashes[, bits]), got ${args.length} arguments")
    }
  )
}
