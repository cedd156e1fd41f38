package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The n-token shingle strings of a token array, space-joined, in ONE pass
  * over ONE evaluation of the child.
  *
  * Semantics identical to the zip_with-fold formulation
  * (Shingles.shingleStringsHof): cnt >= n → the cnt-n+1 windows
  * `toks[i] + " " + ... + toks[i+n-1]` in order, windows containing a NULL
  * token dropped (the fold's concat propagates the null and filters it);
  * cnt < n → one whole-text shingle with nulls skipped (concat_ws
  * semantics). The fold, though safe from the per-ELEMENT re-evaluation trap,
  * still references the token array ~n+1 times TEXTUALLY (slice per shift +
  * size), and CollapseProject inlines the upstream `split` once per
  * reference — this expression evaluates it exactly once per row.
  * Whole-stage-codegen'd; cross-checked by property test.
  */
case class ShingleStringsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"use the token array directly for n=1, got n=$n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    val sep = UTF8String.fromString(" ")
    if (cnt < n) {
      // concatWs SKIPS nulls — same as the HOF's concat_ws whole-text case
      val all = new Array[UTF8String](cnt)
      var i = 0
      while (i < cnt) { all(i) = arr.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, all: _*)))
    } else {
      // a window containing a null token is DROPPED — same as the HOF form,
      // where concat propagates the null and the filter removes it
      val out = new Array[Any](cnt - n + 1)
      val w = new Array[UTF8String](n)
      var nOut = 0
      var i = 0
      while (i <= cnt - n) {
        var j = 0
        var hasNull = false
        while (j < n) {
          val s = arr.getUTF8String(i + j)
          if (s == null) hasNull = true
          w(j) = s
          j += 1
        }
        if (!hasNull) { out(nOut) = UTF8String.concatWs(sep, w: _*); nOut += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], nOut))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sep = ctx.addReferenceObj("shingleSep", UTF8String.fromString(" "),
        classOf[UTF8String].getName)
      val cnt = ctx.freshName("cnt"); val out = ctx.freshName("out")
      val w = ctx.freshName("w"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nOut = ctx.freshName("nOut"); val hasNull = ctx.freshName("hasNull")
      val u = classOf[UTF8String].getName
      s"""
         |final int $cnt = $arr.numElements();
         |Object[] $out;
         |if ($cnt < $n) {
         |  $u[] $w = new $u[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) $w[$i] = $arr.getUTF8String($i);
         |  $out = new Object[]{ $u.concatWs($sep, $w) };
         |} else {
         |  Object[] $w = new Object[$cnt - $n + 1];
         |  $u[] ${w}in = new $u[$n];
         |  int $nOut = 0;
         |  for (int $i = 0; $i <= $cnt - $n; $i++) {
         |    boolean $hasNull = false;
         |    for (int $j = 0; $j < $n; $j++) {
         |      ${w}in[$j] = $arr.getUTF8String($i + $j);
         |      if (${w}in[$j] == null) $hasNull = true;
         |    }
         |    if (!$hasNull) $w[$nOut++] = $u.concatWs($sep, ${w}in);
         |  }
         |  $out = java.util.Arrays.copyOf($w, $nOut);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleStringsExpr =
    copy(child = newChild)
}

object ShingleStrings {
  /** Column API: n-token shingle strings; n=1 returns the tokens as-is. */
  def shingles(tokens: Column, n: Int): Column =
    if (n == 1) tokens
    else GraftShim.toColumn(ShingleStringsExpr(GraftShim.toExpression(tokens), n))
}
