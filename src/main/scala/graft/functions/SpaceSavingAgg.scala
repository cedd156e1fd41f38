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

/** SpaceSaving heavy-hitter summary (Metwally–Agrawal–El Abbadi, ICDT'05)
  * as a native `TypedImperativeAggregate` — the overwrite-min complement to
  * [[MgSketchAgg]]'s decrement-all, with PER-ITEM overestimate tracking:
  *
  *   - at most `k` (item → (cnt, err)) entries; an unseen item arriving at
  *     a full summary OVERWRITES the minimum-count entry (count m) with
  *     (m + 1, err = m) instead of decrementing everything;
  *   - `cnt` is an UPPER bound on the item's true frequency and
  *     `cnt - err` a LOWER bound, so every retained item carries its own
  *     error certificate — Misra–Gries offers only the global n/(k+1) slack;
  *   - err ≤ min-count ≤ n/k, and any item with true frequency > n/k is
  *     retained (single-stream guarantee);
  *   - with ≤ k distinct items no overwrite ever fires: counts EXACT,
  *     err 0 — the property the oracle gate checks.
  *
  * On adversarial streams (one heavy item + a long singleton tail) the
  * decrement-all rule erodes the heavy count by the whole tail mass, while
  * overwrite-min only ever touches the MINIMUM entry — the heavy count
  * stays exact with err 0 (property-spec'd against MgSketchAgg at equal k).
  *
  * Merge sums upper bounds and per-item lower bounds (cnt − err): an item
  * absent from a FULL other summary could have occurred up to that
  * summary's min-count times, so min-count is imputed into BOTH cnt and err
  * (the lower bound is unchanged — correct, since absence proves nothing
  * below min-count). The union is then cut to the k largest upper bounds.
  * Both bounds stay valid under merging and err stays ≤ n_total/k;
  * retention across a merge cut is heuristic for items within err of the
  * boundary — the standard distributed-SpaceSaving caveat.
  */
case class SpaceSavingAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_space_saving"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Array[Long]] =
    new java.util.HashMap[UTF8String, Array[Long]]()

  /** Minimum (cnt, item) entry — count first, item bytes break ties so the
    * eviction victim is deterministic for a given buffer content.
    */
  private def minEntry(buf: java.util.HashMap[UTF8String, Array[Long]]): java.util.Map.Entry[UTF8String, Array[Long]] = {
    var min: java.util.Map.Entry[UTF8String, Array[Long]] = null
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (min == null || e.getValue()(0) < min.getValue()(0) ||
          (e.getValue()(0) == min.getValue()(0) && e.getKey.binaryCompare(min.getKey) > 0)) {
        min = e
      }
    }
    min
  }

  override def update(buf: java.util.HashMap[UTF8String, Array[Long]], input: InternalRow): java.util.HashMap[UTF8String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val prev = buf.get(s)
      if (prev != null) prev(0) += 1L
      else if (buf.size < k) buf.put(s.clone(), Array(1L, 0L)) // clone: row buffers are reused
      else {
        val m = minEntry(buf)
        val mc = m.getValue()(0)
        buf.remove(m.getKey)
        buf.put(s.clone(), Array(mc + 1L, mc))
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[UTF8String, Array[Long]], b2: java.util.HashMap[UTF8String, Array[Long]]): java.util.HashMap[UTF8String, Array[Long]] = {
    if (b2.isEmpty) return b1
    // a FULL summary proves an absent item occurred at most min-count times
    def minCount(b: java.util.HashMap[UTF8String, Array[Long]]): Long =
      if (b.size < k) 0L else {
        var m = Long.MaxValue
        val it = b.values().iterator()
        while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
        m
      }
    val mA = minCount(b1)
    val mB = minCount(b2)
    // b1-only entries: impute b2's min into cnt AND err (lower bound fixed)
    if (mB > 0L) {
      val it1 = b1.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        if (!b2.containsKey(e.getKey)) { e.getValue()(0) += mB; e.getValue()(1) += mB }
      }
    }
    // fold b2 in: shared items add both bounds; b2-only items impute b1's min
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val a = b1.get(e.getKey)
      if (a != null) { a(0) += e.getValue()(0); a(1) += e.getValue()(1) }
      else b1.put(e.getKey, Array(e.getValue()(0) + mA, e.getValue()(1) + mA))
    }
    // cut back to the k largest upper bounds (item bytes break ties)
    if (b1.size > k) {
      val entries = new java.util.ArrayList(b1.entrySet())
      entries.sort { (x, y) =>
        val c = java.lang.Long.compare(y.getValue()(0), x.getValue()(0))
        if (c != 0) c else x.getKey.binaryCompare(y.getKey)
      }
      var i = k
      while (i < entries.size()) { b1.remove(entries.get(i).getKey); i += 1 }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[UTF8String, Array[Long]]): Any = {
    // deterministic output order: cnt desc, item asc
    val entries = new java.util.ArrayList(buf.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.binaryCompare(b.getKey)
    }
    val out = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      out(i) = InternalRow(e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Array[Long]]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) { bytes += 20 + it0.next().getKey.numBytes() }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSaving {
  /** Column API: `ss(itemCol, k)` → array<struct<item,cnt,err>> sorted by
    * (cnt desc, item asc). `cnt` is an upper bound, `cnt - err` a lower
    * bound; exact (err 0) iff the column has ≤ k distinct values.
    */
  def ss(itemCol: Column, k: Int): Column =
    GraftShim.toColumn(SpaceSavingAgg(GraftShim.toExpression(itemCol), k).toAggregateExpression())
}
