package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twins of [[graft.ops.Events]] `transitions` / `cohortRetention`
  * — both on the watermark-buffered total-order pattern
  * ([[StreamingAnomaly.OrderedProcessor]]): events park per user until the
  * watermark finalizes them, then drain in event-time order, so emissions
  * equal the batch operators under any cross-batch arrival disorder within
  * the allowed lateness.
  */
object StreamingEvents {

  final case class UserEvent(user: String, tsMs: Long, seq: Long, etype: String)
  final case class Transition(user: String, from_type: String, to_type: String, ts_ms: Long)
  final case class CohortHit(user: String, cohort_week: Long, week_offset: Long)

  private abstract class OrderedUserProcessor[Out](implicit outEnc: org.apache.spark.sql.Encoder[Out])
      extends StatefulProcessor[String, UserEvent, Out] {
    @transient protected var buf: ListState[UserEvent] = _
    @transient private var drainedTo: ValueState[Long] = _
    @transient private var armedAt: ValueState[Long] = _

    protected def initState(): Unit
    /** Fold one finalized event (called in (tsMs, seq) order). */
    protected def onEvent(e: UserEvent, out: scala.collection.mutable.Builder[Out, Seq[Out]]): Unit

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[UserEvent]("buf", Encoders.product[UserEvent], TTLConfig.NONE)
      drainedTo = getHandle.getValueState[Long]("drainedTo", Encoders.scalaLong, TTLConfig.NONE)
      armedAt = getHandle.getValueState[Long]("armedAt", Encoders.scalaLong, TTLConfig.NONE)
      initState()
    }

    private def drain(watermarkMs: Long): Iterator[Out] = {
      if (watermarkMs <= 0) return Iterator.empty
      val all = buf.get().toSeq
      val (ready, pending) = all.partition(_.tsMs <= watermarkMs)
      if (ready.isEmpty) return Iterator.empty
      val out = Seq.newBuilder[Out]
      ready.sortBy(e => (e.tsMs, e.seq)).foreach(onEvent(_, out))
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

    override def handleInputRows(key: String, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[Out] = {
      val floor = if (drainedTo.exists()) drainedTo.get() else Long.MinValue
      val fresh = rows.filter(_.tsMs > floor).toArray
      if (fresh.nonEmpty) buf.appendList(fresh)
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Out] = {
      if (armedAt.exists() && armedAt.get() == expiredTimerInfo.getExpiryTimeInMs()) armedAt.clear()
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }
  }

  private class TransitionProcessor
      extends OrderedUserProcessor[Transition]()(Encoders.product[Transition]) {
    @transient private var last: ValueState[UserEvent] = _
    override protected def initState(): Unit =
      last = getHandle.getValueState[UserEvent]("last", Encoders.product[UserEvent], TTLConfig.NONE)
    override protected def onEvent(e: UserEvent,
        out: scala.collection.mutable.Builder[Transition, Seq[Transition]]): Unit = {
      if (last.exists()) {
        val p = last.get()
        out += Transition(e.user, p.etype, e.etype, e.tsMs)
      }
      last.update(e)
    }
  }

  private class CohortProcessor(maxWeeks: Int)
      extends OrderedUserProcessor[CohortHit]()(Encoders.product[CohortHit]) {
    @transient private var firstDay: ValueState[Long] = _
    @transient private var seen: ValueState[Long] = _ // bitmask of emitted offsets
    override protected def initState(): Unit = {
      firstDay = getHandle.getValueState[Long]("firstDay", Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    }
    override protected def onEvent(e: UserEvent,
        out: scala.collection.mutable.Builder[CohortHit, Seq[CohortHit]]): Unit = {
      val day = math.floorDiv(math.floorDiv(e.tsMs, 1000L), 86400L)
      if (!firstDay.exists()) { firstDay.update(day); seen.update(0L) }
      val d0 = firstDay.get()
      val off = (day - d0) / 7L
      if (off >= 0 && off <= maxWeeks) {
        val mask = seen.get()
        if ((mask & (1L << off)) == 0L) {
          seen.update(mask | (1L << off))
          out += CohortHit(e.user, d0 / 7L, off)
        }
      }
    }
  }

  /** Streaming [[graft.ops.Events.transitions]]: one row per consecutive
    * (from → to) pair per user in finalized event-time order; aggregate
    * `groupBy(from_type, to_type).count` downstream for the matrix. State
    * per user: the pending buffer + the last finalized event.
    *
    * @param df watermarked streaming frame (`withWatermark(tsCol, delay)`
    *           already applied); `seqCol` breaks equal-timestamp ties the
    *           same way the batch operator's (ts, id) ordering does.
    */
  def transitionsStream(spark: SparkSession, df: DataFrame, tsCol: String,
                        userCol: String, typeCol: String,
                        seqCol: String): Dataset[Transition] = {
    import spark.implicits._
    toUserEvents(df, tsCol, userCol, Some(typeCol), seqCol)
      .groupByKey(_.user)
      .transformWithState(new TransitionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming [[graft.ops.Events.cohortRetention]]: emits each (user,
    * cohort_week, week_offset) cell AT MOST ONCE as the watermark
    * finalizes the user's events — `groupBy(cohort_week, week_offset)
    * .count` downstream equals the batch triangle's distinct-user counts
    * (the dedup already happened per user). State per user: pending buffer
    * + first-day long + a ≤64-bit offset bitmask (hence maxWeeks ≤ 63).
    * Same integer day/week indices as the batch operator.
    */
  def cohortStream(spark: SparkSession, df: DataFrame, tsCol: String,
                   userCol: String, seqCol: String,
                   maxWeeks: Int = 8): Dataset[CohortHit] = {
    import spark.implicits._
    require(maxWeeks >= 0 && maxWeeks <= 63, "maxWeeks must fit the bitmask (0..63)")
    toUserEvents(df, tsCol, userCol, None, seqCol)
      .groupByKey(_.user)
      .transformWithState(new CohortProcessor(maxWeeks),
        TimeMode.EventTime(), OutputMode.Append())
  }

  private def toUserEvents(df: DataFrame, tsCol: String, userCol: String,
                           typeCol: Option[String], seqCol: String): Dataset[UserEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(userCol).cast("string").as("user"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"),
        col(seqCol).cast("long").as("seq"),
        typeCol.map(c => col(c).cast("string")).getOrElse(lit("")).as("etype"))
      .as[UserEvent]
  }
}
