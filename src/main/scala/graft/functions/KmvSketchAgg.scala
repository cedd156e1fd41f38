package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct sketch as a native
  * `TypedImperativeAggregate`: keeps the `k` smallest DISTINCT hash values of
  * a column. Mergeable (map-side partials combine by keeping the union's k
  * smallest), tiny (k longs), and the basis for cross-table set estimates:
  *
  *  - distinct estimate: (k-1) / normalized k-th minimum;
  *  - union of two sketches = merge; intersection/Jaccard via the inclusion
  *    of the merged sketch's values in both inputs (standard KMV θ-sketch
  *    estimator).
  *
  * Unlike HLL, KMV sketches support set INTERSECTION — the cross-snapshot /
  * cross-table overlap question a data-quality engine gets asked.
  * The buffer is a bounded sorted long set; serialization is k longs.
  */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    buf.add(v)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long], b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Column API: `kmv(hashCol, k)` → sorted array<bigint> of the k smallest
    * distinct hash values. Feed non-negative hashes (e.g.
    * [[graft.ops.Shingles.md5Hash60]]) when the sketch must be
    * cross-engine-checkable; xxhash64 works for Spark-only use.
    */
  def kmv(hashCol: Column, k: Int): Column =
    GraftShim.toColumn(KmvSketchAgg(GraftShim.toExpression(hashCol), k).toAggregateExpression())

  /** Distinct-count estimate from a sketch over non-negative 60-bit hashes
    * (md5Hash60 space). Exact when the sketch is not full (size < k).
    */
  def estimateDistinct(sketch: Seq[Long], k: Int, hashSpace: Double = math.pow(2, 60)): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble / (sketch.last.toDouble / hashSpace)

  /** Jaccard estimate of two KMV sketches (θ-sketch style): among the k
    * smallest of the union, the fraction present in both.
    */
  def estimateJaccard(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val union = (a ++ b).distinct.sorted.take(k)
    if (union.isEmpty) 1.0
    else {
      val sa = a.toSet; val sb = b.toSet
      union.count(v => sa(v) && sb(v)).toDouble / union.size
    }
  }
}
