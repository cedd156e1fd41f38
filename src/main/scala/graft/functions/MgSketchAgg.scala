package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** Misra–Gries heavy-hitter summary as a native `TypedImperativeAggregate`:
  * at most `k` (item → count) entries; an unseen item arriving at a full
  * summary decrements EVERY counter (dropping zeros) instead of entering.
  * The classic guarantees:
  *
  *   - every retained count is a LOWER bound, short by at most n/(k+1);
  *   - every item with true frequency > n/(k+1) IS retained (no heavy
  *     hitter is ever missed);
  *   - with ≤ k distinct items no decrement ever fires and counts are
  *     EXACT — the property the oracle gate checks.
  *
  * Mergeable (Agarwal et al., "Mergeable Summaries", PODS'12): add counts,
  * then subtract the (k+1)-th largest combined count from every entry and
  * drop non-positives — the merged summary keeps the n/(k+1) bound, so
  * map-side partials combine like any algebraic aggregate. This is the
  * streaming-safe / bounded-memory complement to the exact vocabulary
  * heavy hitters (one shuffle of ≤ k entries per partial vs every distinct
  * token), at the price of order-dependent (but bounded) counts when the
  * summary overflows.
  */
case class MgSketchAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_mg_sketch"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  private def decrementAll(buf: java.util.HashMap[UTF8String, java.lang.Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue - by
      if (c <= 0L) it.remove() else e.setValue(c)
    }
  }

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long], input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val prev = buf.get(s)
      if (prev != null) buf.put(s, prev + 1L)
      else if (buf.size < k) buf.put(s.clone(), 1L) // clone: row buffers are reused
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[UTF8String, java.lang.Long], b2: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else java.lang.Long.valueOf(prev + e.getValue))
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives (<= k left)
      val counts = new Array[Long](b1.size)
      var i = 0
      val cit = b1.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(counts.length - k - 1))
    }
    b1
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    // deterministic output order: count desc, item asc
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.binaryCompare(b.getKey)
    }
    val out = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      out(i) = InternalRow(e.getKey, e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) { bytes += 12 + it0.next().getKey.numBytes() }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgSketchAgg =
    copy(child = newChildren.head)
}

object MgSketch {
  /** Column API: `mg(itemCol, k)` → array<struct<item,cnt>> sorted by
    * (cnt desc, item asc). Counts are exact iff the column has ≤ k distinct
    * values; otherwise lower bounds short by ≤ n/(k+1).
    */
  def mg(itemCol: Column, k: Int): Column =
    GraftShim.toColumn(MgSketchAgg(GraftShim.toExpression(itemCol), k).toAggregateExpression())
}
