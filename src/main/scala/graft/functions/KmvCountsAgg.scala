package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bottom-k-with-counts sketch: the `k` smallest distinct hash values of a
  * column WITH their exact occurrence counts, as a native
  * `TypedImperativeAggregate`.
  *
  * The retained keys are a uniform random sample of the column's DISTINCT
  * value domain (bottom-k of a hash is order-statistics sampling), and each
  * retained key's count is EXACT: a key in the global bottom-k has < k
  * smaller distinct hashes overall, hence < k smaller hashes in every
  * partition it appears in, so no partial ever evicts it and merge sums its
  * full per-partition counts.
  *
  * That makes the sketch estimate the things plain KMV/HLL cannot: the
  * duplicates family. `unique_count` (values occurring exactly once) and
  * `duplicate_count` (values occurring more than once) are distinct-domain
  * fractions — estimated from the retained sample's fractions scaled by the
  * KMV distinct estimate. This is the scan's 100 TB duplicates path: the
  * exact family shuffles every (column, distinct value) pair; this rides the
  * single row-level pass with ≤ k entries per column per partial.
  *
  * Reference surface: the `duplicates` metric_group
  * (soda-sql metric engine; reference scan.py:292-370 measurement list).
  */
case class KmvCountsAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_kmv_counts"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Long], h: Long, c: Long): Unit = {
    val prev = buf.get(h)
    if (prev != null) buf.put(h, prev + c)
    else {
      buf.put(h, c)
      if (buf.size > k) buf.pollLastEntry()
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long], input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Long], b2: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(b1, e.getKey, e.getValue) }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvCountsAgg =
    copy(child = newChildren.head)
}

object KmvCounts {

  /** The hash-space size every estimator below normalizes by: 60-bit
    * non-negative hashes, the [[graft.ops.Shingles.md5Hash60]] space.
    * Production callers feed `xxhash60` (below); oracle-checkable callers
    * feed md5Hash60 — identical arithmetic either way.
    */
  val HashSpace: Double = math.pow(2, 60)

  /** 60-bit non-negative xxhash64: the production hasher (codegen'd; the
    * md5 twin exists only for cross-engine verification).
    */
  def xxhash60(c: Column): Column = {
    import org.apache.spark.sql.functions._
    shiftrightunsigned(xxhash64(c), 4)
  }

  /** Column API: `kmvCounts(hashCol, k)` → array<struct<h,cnt>> of the k
    * smallest distinct hashes with exact counts, sorted by hash.
    */
  def kmvCounts(hashCol: Column, k: Int): Column =
    GraftShim.toColumn(KmvCountsAgg(GraftShim.toExpression(hashCol), k).toAggregateExpression())

  /** Duplicates-family estimates from a collected sketch:
    * (distinct, uniqueCount, duplicateCount). Exact when the sketch is not
    * full. The fractions-of-retained scaling keeps every operation a plain
    * IEEE double op so a SQL oracle replays it bit-for-bit.
    */
  def estimates(pairs: Seq[(Long, Long)], k: Int, hashSpace: Double = HashSpace): (Double, Double, Double) = {
    val n = pairs.size
    if (n == 0) (0.0, 0.0, 0.0)
    else {
      val d =
        if (n < k) n.toDouble
        else (k - 1).toDouble / (pairs.last._1.toDouble / hashSpace)
      val uniq = pairs.count(_._2 == 1L)
      (d, d * (uniq.toDouble / n.toDouble), d * ((n - uniq).toDouble / n.toDouble))
    }
  }
}
