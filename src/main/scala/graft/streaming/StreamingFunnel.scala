package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twin of [[graft.ops.Events.funnel]]: per-user ordered stage
  * progression over a continuous event stream. Uses the watermark-buffered
  * total-order pattern ([[StreamingAnomaly.OrderedProcessor]]): events park
  * in a ListState buffer until the watermark finalizes them, then drain
  * through the per-user stage machine in (event-time, stage-priority)
  * order — so stage-reach decisions equal the batch operator's greedy-min
  * sequencing under ANY cross-batch arrival disorder, at watermark-delayed
  * emission. State per user: the pending buffer (watermark-bounded) plus
  * three longs.
  *
  * Emits one row per NEWLY-REACHED stage: (user, stage_index, stage,
  * ts_ms). Per-stage user counts == the batch funnel's `users` column
  * (parity-spec'd). The window bound compares truncated epoch SECONDS,
  * matching the batch operator's `unix_timestamp` arithmetic.
  */
object StreamingFunnel {

  final case class FunnelEvent(user: String, tsMs: Long, etype: String)
  final case class StageReach(user: String, stage_index: Int, stage: String, ts_ms: Long)
  final case class FunnelState(stage: Int, t1Ms: Long, tPrevMs: Long)

  class Processor(stages: Array[String], windowSec: Long)
      extends StatefulProcessor[String, FunnelEvent, StageReach] {
    @transient private var st: ValueState[FunnelState] = _
    @transient private var buf: ListState[FunnelEvent] = _
    @transient private var drainedTo: ValueState[Long] = _
    @transient private var armedAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[FunnelState]("st", Encoders.product[FunnelState], TTLConfig.NONE)
      buf = getHandle.getListState[FunnelEvent]("buf", Encoders.product[FunnelEvent], TTLConfig.NONE)
      drainedTo = getHandle.getValueState[Long]("drainedTo", Encoders.scalaLong, TTLConfig.NONE)
      armedAt = getHandle.getValueState[Long]("armedAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def stageIdx(t: String): Int = stages.indexOf(t)

    private def drain(watermarkMs: Long): Iterator[StageReach] = {
      if (watermarkMs <= 0) return Iterator.empty
      val all = buf.get().toSeq
      val (ready, pending) = all.partition(_.tsMs <= watermarkMs)
      if (ready.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get() else FunnelState(0, 0L, 0L)
      // same-timestamp events resolve in stage order (signup before click at
      // time T), matching the batch min-aggregate's ts >= t_prev semantics
      val out = Seq.newBuilder[StageReach]
      ready.sortBy(e => (e.tsMs, stageIdx(e.etype))).foreach { e =>
        if (s.stage < stages.length && e.etype == stages(s.stage)) {
          val inWindow = s.stage == 0 ||
            (e.tsMs >= s.tPrevMs &&
              e.tsMs / 1000L - s.t1Ms / 1000L <= windowSec)
          if (inWindow) {
            val t1 = if (s.stage == 0) e.tsMs else s.t1Ms
            s = FunnelState(s.stage + 1, t1, e.tsMs)
            out += StageReach(e.user, s.stage, stages(s.stage - 1), e.tsMs)
          }
        }
      }
      st.update(s)
      drainedTo.update(watermarkMs)
      buf.clear()
      if (pending.nonEmpty) buf.appendList(pending.toArray)
      out.result().iterator
    }

    private def armTimer(timerValues: TimerValues): Unit = {
      val prev = if (armedAt.exists()) armedAt.get() else -1L
      if (buf.get().hasNext) {
        val next = math.max(timerValues.getCurrentWatermarkInMs(), 0L) + 1L
        if (prev != next) {
          if (prev >= 0L) getHandle.deleteTimer(prev)
          getHandle.registerTimer(next)
          armedAt.update(next)
        }
      } else if (prev >= 0L) {
        getHandle.deleteTimer(prev)
        armedAt.clear()
      }
    }

    override def handleInputRows(key: String, rows: Iterator[FunnelEvent],
                                 timerValues: TimerValues): Iterator[StageReach] = {
      val floor = if (drainedTo.exists()) drainedTo.get() else Long.MinValue
      val fresh = rows.filter(_.tsMs > floor).toArray // drained-past = late data
      if (fresh.nonEmpty) buf.appendList(fresh)
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[StageReach] = {
      if (armedAt.exists() && armedAt.get() == expiredTimerInfo.getExpiryTimeInMs()) armedAt.clear()
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }
  }

  /** @param df streaming frame with `withWatermark(tsCol, delay)` already
    *           applied by the caller; events whose type is not a funnel
    *           stage are dropped here (they cannot affect sequencing).
    */
  def funnelStream(spark: SparkSession, df: DataFrame, tsCol: String,
                   userCol: String, typeCol: String, stages: Seq[String],
                   windowSec: Long = Long.MaxValue): Dataset[StageReach] = {
    import spark.implicits._
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "stages must be non-empty and distinct")
    df.select(
        col(userCol).cast("string").as("user"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"),
        col(typeCol).cast("string").as("etype"))
      .where(col("etype").isin(stages: _*))
      .as[FunnelEvent]
      .groupByKey(_.user)
      .transformWithState(new Processor(stages.toArray, windowSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
