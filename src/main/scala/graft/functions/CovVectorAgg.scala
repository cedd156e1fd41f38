package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** ONE-PASS exact covariance sufficient statistics as a native
  * `TypedImperativeAggregate`: over a quantized long-vector column of
  * dimension `dim`, accumulates every marginal sum Σq_d and every
  * upper-triangle product sum Σq_d·q_e in a single d²-sized long-vector
  * state — the mergeable partial a 100-TB PCA/correlation pass needs
  * (state is O(d²) per partition, merge is element-wise; nothing
  * row-proportional ever shuffles).
  *
  * Accumulation is 93-bit-safe WITHOUT BigDecimal in the hot loop: each
  * slot is (hi, lo) with lo carrying into hi (units of 2³¹) whenever
  * |lo| ≥ 2⁶¹ — exact for any corpus whose per-row values satisfy
  * |q| < 2³⁰ (fixed-point scale 6 → |x| < 1073; embedding components are
  * unit-ish). Slot value = hi·2³¹ + lo, reassembled in DECIMAL by the
  * caller.
  *
  * Buffer layout: slot i < dim is the marginal Σq_i; slot dim + t is the
  * t-th upper-triangle pair (row-major (d,e), d ≤ e). Vectors whose
  * length ≠ `dim` are skipped (triage, matching the caller's filter).
  */
case class CovVectorAgg(child: Expression, dim: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CovVectorAgg.Buf] {

  require(dim >= 1, "dim must be >= 1")
  private val nSlots = dim + dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("hi", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("lo", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_cov_vector"

  override def createAggregationBuffer(): CovVectorAgg.Buf =
    new CovVectorAgg.Buf(new Array[Long](nSlots), new Array[Long](nSlots), 0L)

  @inline private def addSlot(buf: CovVectorAgg.Buf, i: Int, v: Long): Unit = {
    var lo = buf.lo(i) + v
    if (lo >= CovVectorAgg.CARRY || lo <= -CovVectorAgg.CARRY) {
      val c = lo >> 31
      buf.hi(i) += c
      lo -= c << 31
    }
    buf.lo(i) = lo
  }

  override def update(buf: CovVectorAgg.Buf, input: InternalRow): CovVectorAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (arr.numElements() == dim) {
        val q = arr.toLongArray()
        buf.n += 1
        var d = 0
        var t = dim
        while (d < dim) {
          addSlot(buf, d, q(d))
          var e = d
          while (e < dim) {
            addSlot(buf, t, q(d) * q(e))
            t += 1
            e += 1
          }
          d += 1
        }
      }
    }
    buf
  }

  override def merge(b1: CovVectorAgg.Buf, b2: CovVectorAgg.Buf): CovVectorAgg.Buf = {
    b1.n += b2.n
    var i = 0
    while (i < nSlots) {
      b1.hi(i) += b2.hi(i)
      addSlot(b1, i, b2.lo(i))
      i += 1
    }
    b1
  }

  override def eval(buf: CovVectorAgg.Buf): Any =
    new GenericInternalRow(Array[Any](buf.n,
      UnsafeArrayData.fromPrimitiveArray(buf.hi),
      UnsafeArrayData.fromPrimitiveArray(buf.lo)))

  override def serialize(buf: CovVectorAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * nSlots)
    bb.putLong(buf.n)
    var i = 0
    while (i < nSlots) { bb.putLong(buf.hi(i)); bb.putLong(buf.lo(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovVectorAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    buf.n = bb.getLong
    var i = 0
    while (i < nSlots) { buf.hi(i) = bb.getLong; buf.lo(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovVectorAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovVectorAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CovVectorAgg =
    copy(child = newChildren.head)
}

object CovVectorAgg {
  final val CARRY = 1L << 61
  final class Buf(val hi: Array[Long], val lo: Array[Long], var n: Long)
}

object CovVector {
  /** Column API: one-pass covariance stats over a long-vector column;
    * returns struct(n, hi, lo) per the [[CovVectorAgg]] slot layout.
    */
  def cov(qVec: Column, dim: Int): Column =
    GraftShim.toColumn(CovVectorAgg(GraftShim.toExpression(qVec), dim).toAggregateExpression())
}
