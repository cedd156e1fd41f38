package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Row-local `array<bigint>` minus a BOUND long set: keeps the elements NOT
  * in `dropSet` (order and multiplicity preserved; null elements dropped).
  *
  * The set is sorted once at construction and bound as a codegen reference
  * object, so membership is a binary search — O(|arr|·log|set|) per row
  * with zero per-row allocation beyond the output. This is what makes
  * broadcast-style semi-join FILTERING row-local for array columns: the
  * builtin `array_except(arr, lit(set))` rebuilds a hash set from the
  * literal EVERY ROW (O(|set|) per row), and an explode + anti-join +
  * re-collect pays a corpus-wide shuffle. Used by the MinHash shingle
  * doc-frequency prune, where `dropSet` is the measured high-DF
  * (boilerplate) shingle-hash set.
  */
case class LongSetFilterExpr(child: Expression, dropSet: Seq[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_long_set_filter expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_long_set_filter"

  @transient private lazy val sorted: Array[Long] = {
    val a = dropSet.toArray
    java.util.Arrays.sort(a)
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        if (java.util.Arrays.binarySearch(sorted, v) < 0) { buf(m) = v; m += 1 }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val setRef = ctx.addReferenceObj("longDropSet", sorted, "long[]")
      val n = ctx.freshName("n"); val buf = ctx.freshName("buf")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $buf = new long[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $v = $arr.getLong($i);
         |    if (java.util.Arrays.binarySearch($setRef, $v) < 0) { $buf[$m++] = $v; }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $m));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongSetFilterExpr =
    copy(child = newChild)
}

object LongSetFilter {
  /** Column API: `arr` minus the bound `dropSet` (row-local binary search). */
  def exceptSet(arr: Column, dropSet: Seq[Long]): Column =
    GraftShim.toColumn(LongSetFilterExpr(GraftShim.toExpression(arr), dropSet))
}
