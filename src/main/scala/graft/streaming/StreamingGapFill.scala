package graft.streaming

import graft.streaming.StreamingAnomaly.{OrderedFoldFlatProcessor, TimedEvent}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twin of [[graft.ops.Windows.gapFill]]: per-key LOCF over an
  * unbounded stream — CLOSED grid ticks emit as soon as a later-tick
  * observation is finalized by the watermark, each carrying the tick's last
  * observed value or the carried-forward one (`observed` flag preserved).
  *
  * Built on the watermark-buffered total-order fold
  * ([[StreamingAnomaly.OrderedFoldFlatProcessor]] — the 0..n-outputs base
  * this operator motivated): events drain in (ts, seq) order, so a
  * same-tick update emits NOTHING (it only replaces the held value), a
  * next-tick observation emits exactly the previous tick's row, and a jump
  * across g empty ticks emits the g carried rows. State beyond the pending
  * buffer is THREE longs (held tick, held fx, seeded flag) per key —
  * bounded forever.
  *
  * Batch parity (spec'd): the emitted rows equal the batch operator's grid
  * MINUS each key's final (still-open) tick row — a stream never knows its
  * last tick closed; the open tick lives in state and emits on the next
  * observation. Tie discipline on exact-ts duplicates follows the drain's
  * (ts, seq) order, so pass the VALUE as `seqCol` to replicate the batch
  * value-desc rule (or guarantee distinct timestamps, the usual case).
  * Values ride the fixed-point longs of the fold base; `fxScale` decimal
  * places survive the round trip exactly.
  */
object StreamingGapFill {

  final case class FilledTick(key: String, tick: Long, value_fx: Long,
                              observed: Boolean)
  final case class LocfState(tick: Long, fx: Long, seeded: Boolean)

  /** @param stepMs grid step in event-time milliseconds; ticks are
    *               epoch-FLOOR-aligned (`tsMs div stepMs`), the batch
    *               operator's convention.
    */
  class LocfProcessor(stepMs: Long)
      extends OrderedFoldFlatProcessor[LocfState, FilledTick](Encoders.product[LocfState]) {
    override protected def zero: LocfState = LocfState(0L, 0L, seeded = false)
    override protected def stepMany(st: LocfState,
                                    e: TimedEvent): (LocfState, IterableOnce[FilledTick]) = {
      val g = Math.floorDiv(e.tsMs, stepMs)
      if (!st.seeded) (LocfState(g, e.fx, seeded = true), Iterator.empty)
      else if (g == st.tick) (LocfState(g, e.fx, seeded = true), Iterator.empty)
      else {
        // close the held tick (observed), then every skipped tick carries
        // its value forward (gap rows), then hold the new observation
        val closed = Iterator.single(FilledTick(e.key, st.tick, st.fx, observed = true)) ++
          Iterator.range(st.tick + 1, g).map(t =>
            FilledTick(e.key, t, st.fx, observed = false))
        (LocfState(g, e.fx, seeded = true), closed)
      }
    }
  }

  /** Watermark-buffered streaming LOCF; caller must already have applied
    * `withWatermark(tsCol, …)`. Output ticks convert back to timestamps via
    * `timestamp_millis(tick * stepMs)` downstream.
    */
  def locfStream(spark: SparkSession, df: DataFrame, keyCol: String,
                 tsCol: String, seqCol: String, valueCol: String,
                 stepSeconds: Long, fxScale: Int = 2): Dataset[FilledTick] = {
    import spark.implicits._
    require(stepSeconds > 0, "stepSeconds must be positive")
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(new LocfProcessor(stepSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
