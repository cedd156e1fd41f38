package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM pretraining: lay the corpus out as ONE virtual
  * token stream (documents concatenated in a total order) and cut it into
  * fixed-`budget` training chunks. Each document's placement — its global
  * token offset, the chunks it spans, its offset inside the first chunk —
  * is a pure function of the exclusive prefix sum of token counts, so the
  * whole operator is a distributed prefix sum plus row-local arithmetic.
  *
  * The prefix sum is the textbook two-phase scan, NOT a global-order window
  * (`Window.orderBy` with no partitionBy funnels the corpus through ONE
  * partition — the classic scale-killer):
  *
  *   1. range-partition by the order column; per-partition totals (one tiny
  *      aggregate, `numPartitions` rows) are cumulated on the driver into
  *      partition offsets;
  *   2. a within-partition running sum (Window.partitionBy(pid)) plus the
  *      broadcast partition offset, looked up from a literal map — no join.
  *
  * Every stage is bounded by a range-partition's size; nothing is
  * single-partition. The result is identical to the naive global window
  * (prefix sums over a total order are unique), which is exactly what the
  * DuckDB oracle computes.
  */
object Packing {

  /** Adds `cumsumCol` = EXCLUSIVE prefix sum of `valueCol` over ascending
    * `orderCol` (must be unique — document ids). Long-typed, overflow-checked
    * by ANSI semantics.
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: Column,
                cumsumCol: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
    // The eager localCheckpoint is LOAD-BEARING, not an optimization: range
    // partitioning re-samples boundaries per job, so without freezing the
    // materialized layout the totals job and the window job could see
    // different __pid assignments — offsets computed for one layout applied
    // to another. (A cache() unpersisted before the returned lazy plan runs
    // has the same hole: the window job would recompute the partitioning
    // from scratch. Checkpointing truncates the lineage instead, so every
    // downstream job reads the SAME frozen blocks.)
    val withPid = parts
      .withColumn("__v", valueCol.cast(LongType))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = withPid.groupBy("__pid").agg(sum(col("__v")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids.zip(
      pids.scanLeft(0L)((acc, p) => acc + totals(p)).init).toMap
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L))
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid
      .withColumn(cumsumCol, coalesce(sum(col("__v")).over(w), lit(0L)) + offsetExpr)
      .drop("__v", "__pid")
  }

  /** Adds one INCLUSIVE prefix-sum column per (valueCol → outCol) entry
    * over ascending `orderCol` (unique keys — e.g. a distinct-value rollup's
    * key), in ONE two-phase pass: a single frozen range partitioning, one
    * per-partition totals collect serving every column's driver offsets,
    * one within-partition window. The multi-column generalization of
    * [[prefixSum]] for operators cumulating several counters over the same
    * order (PR curves, at-risk counts) — same scale shape, nothing
    * single-partition.
    */
  def prefixSumsInclusive(df: DataFrame, orderCol: String,
                          cols: Seq[(Column, String)]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to cumulate")
    val parts = df.repartitionByRange(col(orderCol))
    val vNames = cols.indices.map(i => s"__v$i")
    // eager checkpoint freezes the pid assignment across the totals job
    // and the window job — see prefixSum
    val withPid = cols.zip(vNames).foldLeft(parts) {
        case (d, ((c, _), v)) => d.withColumn(v, c.cast(LongType))
      }
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val aggs = vNames.map(v => sum(col(v)).as(v))
    val totals = withPid.groupBy("__pid").agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getInt(0) -> vNames.indices.map(i => r.getLong(i + 1)))
      .toMap
    val pids = totals.keys.toSeq.sorted
    def offsetExpr(i: Int) = {
      val m: Map[Int, Long] = pids.zip(
        pids.scanLeft(0L)((acc, p) => acc + totals(p)(i)).init).toMap
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    }
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    cols.indices.foldLeft(withPid) { (d, i) =>
        d.withColumn(cols(i)._2, sum(col(vNames(i))).over(w) + offsetExpr(i))
      }
      .drop(vNames :+ "__pid": _*)
  }

  /** Concat-and-chunk packing index: for each document, its global token
    * start, the first/last `budget`-token chunk it lands in, and its offset
    * inside the first chunk. Empty documents (0 tokens) occupy no chunk →
    * null chunk columns. `tokenCount` defaults to whitespace-token count of
    * `textCol`.
    */
  def packIndex(df: DataFrame, idCol: String, textCol: String, budget: Int,
                tokenCount: Option[Column] = None, numPartitions: Int = 0): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val n = tokenCount.getOrElse(TextAnalysis.tokenCount(col(textCol))).cast(LongType)
    val base = df.select(col(idCol).as("doc_id"), n.as("n_tokens"))
    val summed = prefixSum(base, "doc_id", col("n_tokens"), "tok_start", numPartitions)
    // `div` is LONG integer division — `/` on longs is double division,
    // which silently rounds past 2^53 tokens
    summed.select(
      col("doc_id"), col("n_tokens"), col("tok_start"),
      when(col("n_tokens") > 0, expr(s"tok_start div ${budget}L")).as("first_chunk"),
      when(col("n_tokens") > 0,
        expr(s"(tok_start + n_tokens - 1) div ${budget}L")).as("last_chunk"),
      when(col("n_tokens") > 0, pmod(col("tok_start"), lit(budget.toLong))).as("chunk_offset"))
  }
}
