package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expression computing a full MinHash signature in ONE fused
  * pass over the shingle-hash array: for each of `numHashes` permutations
  * h_i(x) = (a_i * (x mod p) + b_i) mod p (p = 2^31-1), the minimum over the
  * array. Whole-stage-codegen'd; replaces `numHashes` separate
  * `array_min(transform(...))` HOF evaluations (k passes + k lambda closures
  * per row) with a single n×k loop over primitive longs.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  private val P = MinHash.P

  @transient private lazy val (aCoefs, bCoefs) = MinHash.coefs(numHashes, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      var m = arr.getLong(i) % P
      if (m < 0) m += P
      var j = 0
      while (j < numHashes) {
        // exact x mod (2³¹−1) via the Mersenne shift reduction (x ≡
        // (x & p) + (x >>> 31) for p = 2³¹−1): ~4 cycles where the long
        // `%` costs ~30 — this inner op runs n×k per row
        var v = m * aCoefs(j) + bCoefs(j)
        v = (v & P) + (v >>> 31)
        v = (v & P) + (v >>> 31)
        if (v >= P) v -= P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("aCoefs", aCoefs, "long[]")
    val b = ctx.addReferenceObj("bCoefs", bCoefs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $m = $arr.getLong($i) % ${P}L;
         |  if ($m < 0) $m += ${P}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    // exact mod 2^31-1 via Mersenne shift reduction (see nullSafeEval)
         |    long $v = $m * $a[$j] + $b[$j];
         |    $v = ($v & ${P}L) + ($v >>> 31);
         |    $v = ($v & ${P}L) + ($v >>> 31);
         |    if ($v >= ${P}L) $v -= ${P}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHash {
  val P: Long = 2147483647L // 2^31 - 1: keeps a*x + b < 2^62, no long overflow

  /** Deterministic permutation coefficients (same for every session/engine). */
  def coefs(numHashes: Int, seed: Long = 42L): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(math.abs(rng.nextLong()) % (P - 1) + 1)
    val b = Array.fill(numHashes)(math.abs(rng.nextLong()) % P)
    (a, b)
  }

  /** Column API: native minhash signature over a materialized hash array. */
  def signature(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    GraftShim.toColumn(MinHashSignatureExpr(GraftShim.toExpression(hashes), numHashes, seed))

  /** SQL registration payload for `SparkSessionExtensions.injectFunction` /
    * direct FunctionRegistry use: `graft_minhash_sig(hashes, k)`.
    */
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_minhash_sig"),
    new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "graft_minhash_sig"),
    (args: Seq[Expression]) => {
      val k = args(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(s"numHashes must be an int literal, got $other")
      }
      MinHashSignatureExpr(args.head, k, 42L)
    }
  )
}
