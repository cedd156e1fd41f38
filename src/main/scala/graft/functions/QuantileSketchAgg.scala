package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Deterministic mergeable quantile sketch: a bottom-k-by-hash row sample
  * (order-statistics sampling over a per-row key hash, the [[KmvCountsAgg]]
  * argument) carrying each sampled row's VALUE, as a native
  * `TypedImperativeAggregate`. Quantiles are then read off the sorted
  * sample.
  *
  * Why this shape instead of GK/KLL/t-digest: those sketches are either
  * randomized (not replayable by an independent engine) or merge-order
  * sensitive. Bottom-k by a fixed hash is BOTH mergeable and deterministic:
  * the union's bottom-k is a function of the inputs' bottom-k's
  * (a row in the global bottom-k has < k smaller hashes overall, hence
  * survives every partial's trim), and the result is independent of
  * partitioning, merge order, and arrival order. That buys, with ONE
  * sketch definition:
  *  - scan pass 1: O(k) state per (group, partial) instead of the full
  *    sort an exact percentile needs;
  *  - incremental scans: fold of slice sketches == the monolithic sketch,
  *    bit-for-bit;
  *  - streaming: the same aggregate at window grain (windowed groupBy),
  *    batch=streaming parity for free;
  *  - oracles: DuckDB recomputes the identical sample from the identical
  *    hash — FULL cross-engine verification of an "approximate" metric.
  *
  * Duplicate hashes (same key twice, or a 60-bit collision) keep the
  * SMALLEST value — an explicit rule so the sketch stays a pure function
  * of the input SET. NULL hashes and NULL values are skipped. Accuracy is
  * the standard uniform-sample bound (sample quantile of k rows ≈ true
  * quantile within O(1/√k)); k=256 gives ~±3% rank error.
  *
  * `keyHash` must identify rows ([[graft.ops.Shingles.md5Hash60]] of a key
  * for oracle-checkable gates, [[KmvCounts.xxhash60]] in production).
  */
case class QuantileSketchAgg(keyHash: Expression, value: Expression, k: Int,
                             emitState: Boolean = false,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(keyHash, value)
  override def nullable: Boolean = false
  /** Sorted sampled values by default; with `emitState`, the (h, v) pairs
    * in hash order — the EXACTLY FOLDABLE form: persist a slice's pairs,
    * `inline` any number of slices' pairs and re-run THIS aggregate over
    * (h, v) to get the union's sketch bit-for-bit (the incremental-scan
    * contract — see [[QuantileSketch.foldStates]]).
    */
  override def dataType: DataType =
    if (emitState) ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))), containsNull = false)
    else ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_quantile_sketch"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Double], h: Long, v: Double): Unit = {
    val prev = buf.get(h)
    if (prev != null) { if (v < prev) buf.put(h, v) }
    else {
      buf.put(h, v)
      if (buf.size > k) buf.pollLastEntry()
    }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double], input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = keyHash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Double], b2: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(b1, e.getKey, e.getValue) }
    b1
  }

  /** The sampled values sorted ASCENDING BY VALUE — quantile-extraction
    * order (the hash order that selected them is no longer needed).
    */
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    if (emitState) {
      val out = new Array[Any](buf.size)
      var i = 0
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out(i) = InternalRow(e.getKey.longValue(), e.getValue.doubleValue())
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Double](buf.size)
      var i = 0
      val it = buf.values().iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putDouble(e.getValue) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(keyHash = newChildren(0), value = newChildren(1))
}

object QuantileSketch {
  import org.apache.spark.sql.{DataFrame, functions => F}
  import org.apache.spark.sql.functions._

  /** Column API: the sorted sampled values of the k smallest key hashes. */
  def qsketch(hashCol: Column, valueCol: Column, k: Int): Column =
    GraftShim.toColumn(QuantileSketchAgg(
      GraftShim.toExpression(hashCol),
      GraftShim.toExpression(valueCol.cast(DoubleType)), k).toAggregateExpression())

  /** The foldable form: (h, v) pairs in hash order. Persist one per slice
    * (`array<struct<h,v>>` — an ordinary parquet column).
    */
  def qsketchState(hashCol: Column, valueCol: Column, k: Int): Column =
    GraftShim.toColumn(QuantileSketchAgg(
      GraftShim.toExpression(hashCol),
      GraftShim.toExpression(valueCol.cast(DoubleType)), k,
      emitState = true).toAggregateExpression())

  /** Fold any number of slice states (one `array<struct<h,v>>` row each,
    * same k) into the union's state: `inline` the pairs and re-run the
    * aggregate with the pairs THEMSELVES as (hash, value) input — bottom-k
    * closure makes the fold exact, so fold-then-quantile equals
    * sketch-everything-at-once bit-for-bit, in any fold order.
    */
  def foldStates(states: DataFrame, stateCol: String, k: Int): DataFrame =
    states.select(F.inline(F.col(stateCol)))
      .agg(qsketchState(F.col("h"), F.col("v"), k).as(stateCol))

  /** Sorted sample values of a state column (the [[qsketch]] view of a
    * folded state) — feed to [[quantile]].
    */
  def valuesOf(state: Column): Column =
    array_sort(transform(state, p => p.getField("v")))

  /** Lower-nearest-rank quantile of a sketch: element at
    * `floor(q·(n−1)) + 1` (1-based). Every operation is a plain IEEE
    * double op + integer index — a SQL oracle replays it exactly
    * (`sample[CAST(floor(q*(len(sample)-1)) AS INT) + 1]`). Returns an
    * actual sampled data value, never an interpolation artifact.
    */
  def quantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    element_at(sketch,
      (floor(lit(q) * (size(sketch) - 1).cast(DoubleType)).cast(IntegerType) + 1))
  }
}
