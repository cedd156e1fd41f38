package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twin of [[graft.ops.Outliers.rollingZScore]]: per-key rolling
  * z-score anomaly flags over a CONTINUOUS event stream, via a
  * `transformWithState` ring buffer of the last `window` fixed-point values
  * (O(window) state per key, the [[RunningQuality]] pattern; RocksDB store).
  *
  * The flag is the SAME integer rule as the batch operator —
  * `(n·v − S)² > t²·(n·Q − S²)` with the `minDev` absolute floor, over the
  * PRECEDING ≤ window values — so on in-order input the streamed flags are
  * identical to the batch ones (parity-spec'd). The honest delta: events
  * are ordered by `seqCol` only WITHIN a micro-batch; cross-batch
  * out-of-order arrival evaluates against the state as of arrival (a
  * watermark-buffered total order would need a second stateful stage).
  * NULL values must be filtered upstream (the batch operator skips them).
  */
object StreamingAnomaly {

  final case class SeqEvent(key: String, seq: Long, fx: Long)
  final case class AnomalyFlag(key: String, seq: Long, is_anomaly: Boolean)
  final case class Ring(values: Seq[Long]) // oldest-first, size <= window

  class Processor(window: Int, tSquared: Long, minPoints: Int, minDevFx: Long)
      extends StatefulProcessor[String, SeqEvent, AnomalyFlag] {
    @transient private var ring: ValueState[Ring] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[Ring]("ring", Encoders.product[Ring], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SeqEvent],
                                 timerValues: TimerValues): Iterator[AnomalyFlag] = {
      var buf = if (ring.exists()) ring.get().values.toVector else Vector.empty[Long]
      val out = rows.toSeq.sortBy(_.seq).map { e =>
        val n = buf.size.toLong
        val flag = n >= minPoints && {
          var s = 0L; var q = 0L
          buf.foreach { v => s += v; q += v * v }
          val dev = n * e.fx - s
          dev * dev > tSquared * (n * q - s * s) && math.abs(dev) > n * minDevFx
        }
        buf = (buf :+ e.fx).takeRight(window)
        AnomalyFlag(key, e.seq, flag)
      }
      ring.update(Ring(buf))
      out.iterator
    }
  }

  /** @param df streaming frame; NULL `valueCol` rows are dropped here
    *           (matching the batch operator's null-skip)
    */
  def anomalyStream(spark: SparkSession, df: DataFrame, keyCol: String,
                    seqCol: String, valueCol: String, window: Int,
                    tSquared: Long, minPoints: Int = 5, minDev: Double = 0.0,
                    fxScale: Int = 3): Dataset[AnomalyFlag] = {
    import spark.implicits._
    require(window >= 2 && minPoints >= 2 && tSquared >= 0 && minDev >= 0, "bad parameters")
    val minDevFx = math.round(minDev * math.pow(10, fxScale))
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"))
      .where(col("fx").isNotNull)
      .as[SeqEvent]
      .groupByKey(_.key)
      .transformWithState(new Processor(window, tSquared, minPoints, minDevFx),
        TimeMode.None(), OutputMode.Append())
  }

  final case class TimedEvent(key: String, seq: Long, fx: Long, tsMs: Long)

  /** [[Processor]] upgraded to a WATERMARK-BUFFERED total order: incoming
    * events park in a ListState buffer; once the watermark passes an
    * event's time it is FINAL (no earlier event can still arrive), so
    * buffered events at or below the watermark drain through the ring in
    * seq order — flags under any cross-batch arrival disorder equal the
    * batch operator's, at the price of watermark-delayed emission. An
    * event-time timer drains keys that receive no further input. Events
    * arriving later than the watermark allows are dropped (standard
    * late-data semantics).
    */
  class OrderedProcessor(window: Int, tSquared: Long, minPoints: Int, minDevFx: Long)
      extends StatefulProcessor[String, TimedEvent, AnomalyFlag] {
    @transient private var ring: ValueState[Ring] = _
    @transient private var buf: ListState[TimedEvent] = _
    @transient private var drainedTo: ValueState[Long] = _
    @transient private var armedAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ring = getHandle.getValueState[Ring]("ring", Encoders.product[Ring], TTLConfig.NONE)
      buf = getHandle.getListState[TimedEvent]("buf", Encoders.product[TimedEvent], TTLConfig.NONE)
      drainedTo = getHandle.getValueState[Long]("drainedTo", Encoders.scalaLong, TTLConfig.NONE)
      armedAt = getHandle.getValueState[Long]("armedAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def drain(watermarkMs: Long): Iterator[AnomalyFlag] = {
      if (watermarkMs <= 0) return Iterator.empty
      val all = buf.get().toSeq
      val (ready, pending) = all.partition(_.tsMs <= watermarkMs)
      if (ready.isEmpty) return Iterator.empty
      var rbuf = if (ring.exists()) ring.get().values.toVector else Vector.empty[Long]
      val out = ready.sortBy(e => (e.tsMs, e.seq)).map { e =>
        val n = rbuf.size.toLong
        val flag = n >= minPoints && {
          var s = 0L; var q = 0L
          rbuf.foreach { v => s += v; q += v * v }
          val dev = n * e.fx - s
          dev * dev > tSquared * (n * q - s * s) && math.abs(dev) > n * minDevFx
        }
        rbuf = (rbuf :+ e.fx).takeRight(window)
        AnomalyFlag(e.key, e.seq, flag)
      }
      ring.update(Ring(rbuf))
      drainedTo.update(watermarkMs)
      buf.clear()
      if (pending.nonEmpty) buf.appendList(pending.toArray)
      out.iterator
    }

    // Exactly one pending timer per key: re-registering every batch without
    // deleting the previous one would accumulate stale timers in state, each
    // firing a redundant drain. The armed timestamp lives in state so the
    // old timer can be deleted (or re-registration skipped) on the next arm.
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

    override def handleInputRows(key: String, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[AnomalyFlag] = {
      val floor = if (drainedTo.exists()) drainedTo.get() else Long.MinValue
      val fresh = rows.filter(_.tsMs > floor).toArray // older-than-drained = late, dropped
      if (fresh.nonEmpty) buf.appendList(fresh)
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[AnomalyFlag] = {
      // the firing timer is consumed; forget it so armTimer doesn't try to
      // delete an already-expired registration
      if (armedAt.exists() && armedAt.get() == expiredTimerInfo.getExpiryTimeInMs()) armedAt.clear()
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }
  }

  final case class CusumFlag(key: String, seq: Long, s_up: Long, s_dn: Long,
                             alarm_up: Boolean, alarm_dn: Boolean)
  final case class CusumLevels(sUp: Long, sDn: Long)

  /** Watermark-buffered total-order FOLD base with 0..n outputs per event
    * (the [[OrderedFoldProcessor]] machinery, `stepMany` primitive):
    * incoming events park in a ListState buffer; once the watermark
    * finalizes them they drain through `stepMany` in (ts, seq) order.
    * Exists for folds whose per-event emission count varies — the LOCF
    * gap-fill twin emits one row per CLOSED grid tick (0 for a same-tick
    * update, many across a long gap). Single-output recurrences extend
    * [[OrderedFoldProcessor]] instead.
    */
  abstract class OrderedFoldFlatProcessor[S, O](stateEnc: org.apache.spark.sql.Encoder[S])
      extends StatefulProcessor[String, TimedEvent, O] {
    protected def zero: S
    protected def stepMany(st: S, e: TimedEvent): (S, IterableOnce[O])

    @transient private var lvl: ValueState[S] = _
    @transient private var buf: ListState[TimedEvent] = _
    @transient private var drainedTo: ValueState[Long] = _
    @transient private var armedAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lvl = getHandle.getValueState[S]("lvl", stateEnc, TTLConfig.NONE)
      buf = getHandle.getListState[TimedEvent]("buf", Encoders.product[TimedEvent], TTLConfig.NONE)
      drainedTo = getHandle.getValueState[Long]("drainedTo", Encoders.scalaLong, TTLConfig.NONE)
      armedAt = getHandle.getValueState[Long]("armedAt", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def drain(watermarkMs: Long): Iterator[O] = {
      if (watermarkMs <= 0) return Iterator.empty
      val all = buf.get().toSeq
      val (ready, pending) = all.partition(_.tsMs <= watermarkMs)
      if (ready.isEmpty) return Iterator.empty
      var st = if (lvl.exists()) lvl.get() else zero
      val out = ready.sortBy(e => (e.tsMs, e.seq)).flatMap { e =>
        val (st2, os) = stepMany(st, e)
        st = st2
        os.iterator
      }
      lvl.update(st)
      drainedTo.update(watermarkMs)
      buf.clear()
      if (pending.nonEmpty) buf.appendList(pending.toArray)
      out.iterator
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

    override def handleInputRows(key: String, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[O] = {
      val floor = if (drainedTo.exists()) drainedTo.get() else Long.MinValue
      val fresh = rows.filter(_.tsMs > floor).toArray
      if (fresh.nonEmpty) buf.appendList(fresh)
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[O] = {
      if (armedAt.exists() && armedAt.get() == expiredTimerInfo.getExpiryTimeInMs()) armedAt.clear()
      val out = drain(timerValues.getCurrentWatermarkInMs())
      armTimer(timerValues)
      out
    }
  }

  /** Watermark-buffered total-order FOLD base: incoming events park in a
    * ListState buffer; once the watermark finalizes them they drain through
    * `step` in (ts, seq) order — so any per-event recurrence (CUSUM, EWMA)
    * gets batch-identical results under cross-batch disorder by
    * implementing ONE method. State = pending buffer + the fold state S +
    * two bookkeeping longs; exactly one pending timer per key. (The
    * exactly-one-output specialization of [[OrderedFoldFlatProcessor]] —
    * all buffering/timer machinery lives there.)
    */
  abstract class OrderedFoldProcessor[S, O](stateEnc: org.apache.spark.sql.Encoder[S])
      extends OrderedFoldFlatProcessor[S, O](stateEnc) {
    protected def step(st: S, e: TimedEvent): (S, O)
    final override protected def stepMany(st: S, e: TimedEvent): (S, IterableOnce[O]) = {
      val (st2, o) = step(st, e)
      (st2, Iterator.single(o))
    }
  }

  /** Streaming twin of [[graft.ops.Outliers.cusum]] on the ordered-fold
    * base: per key the two Page recursions are TWO LONGS of state beyond
    * the pending buffer; levels and alarms equal the batch operator under
    * any cross-batch arrival disorder inside the allowed lateness.
    */
  class CusumProcessor(upRef: Long, dnRef: Long, hFx: Long)
      extends OrderedFoldProcessor[CusumLevels, CusumFlag](Encoders.product[CusumLevels]) {
    override protected def zero: CusumLevels = CusumLevels(0L, 0L)
    override protected def step(st: CusumLevels, e: TimedEvent): (CusumLevels, CusumFlag) = {
      val next = CusumLevels(
        math.max(0L, st.sUp + (e.fx - upRef)),
        math.max(0L, st.sDn + (dnRef - e.fx)))
      (next, CusumFlag(e.key, e.seq, next.sUp, next.sDn, next.sUp > hFx, next.sDn > hFx))
    }
  }

  final case class PhFlag(key: String, seq: Long, ph_fx: Long, alarm: Boolean)
  final case class PhState(i: Long, s: Long, u: Long, minU: Long)

  /** Streaming twin of [[graft.ops.Outliers.pageHinkley]] on the
    * ordered-fold base: FOUR longs of state (step count, value sum, the
    * micro-fx deviation sum U and its running min) beyond the pending
    * buffer; the per-event deviation replays the batch operator's exact
    * tree ((fx·i − S)/i − δ, micro-quantized), so ph levels and alarms
    * equal the batch operator under any cross-batch arrival disorder
    * inside the allowed lateness.
    */
  class PageHinkleyProcessor(deltaFx: Long, lambdaFx6: Long)
      extends OrderedFoldProcessor[PhState, PhFlag](Encoders.product[PhState]) {
    override protected def zero: PhState = PhState(0L, 0L, 0L, 0L)
    override protected def step(st: PhState, e: TimedEvent): (PhState, PhFlag) = {
      val i = st.i + 1
      val s = st.s + e.fx
      val dev = (e.fx * i - s).toDouble / i.toDouble - deltaFx.toDouble
      val devFx = (if (dev >= 0) math.floor(dev * 1e6 + 0.5)
                   else -math.floor(-dev * 1e6 + 0.5)).toLong
      val u = st.u + devFx
      val minU = math.min(st.minU, u)
      val ph = u - math.min(0L, minU)
      (PhState(i, s, u, minU), PhFlag(e.key, e.seq, ph, ph > lambdaFx6))
    }
  }

  final case class EwmaPoint(key: String, seq: Long, ewma_fx: Long)
  final case class EwmaLevel(level: Long, seeded: Boolean)

  /** Streaming twin of [[graft.ops.Outliers.ewma]] on the ordered-fold
    * base: one long of fold state; the emitted level after each event
    * equals the batch fold over that event's prefix, so the key's LAST
    * point equals the batch operator's final `ewma_fx` exactly.
    */
  class EwmaProcessor(alphaNum: Long, alphaDen: Long)
      extends OrderedFoldProcessor[EwmaLevel, EwmaPoint](Encoders.product[EwmaLevel]) {
    override protected def zero: EwmaLevel = EwmaLevel(0L, seeded = false)
    override protected def step(st: EwmaLevel, e: TimedEvent): (EwmaLevel, EwmaPoint) = {
      val next =
        if (!st.seeded) EwmaLevel(e.fx, seeded = true)
        else EwmaLevel(st.level + ((e.fx - st.level) * alphaNum) / alphaDen, seeded = true)
      (next, EwmaPoint(e.key, e.seq, next.level))
    }
  }

  final case class HoltPoint(key: String, seq: Long, level_fx: Long, trend_fx: Long)
  final case class HoltState(level: Long, trend: Long, seeded: Boolean)

  /** Streaming twin of [[graft.ops.Outliers.holt]] on the ordered-fold
    * base: TWO longs of fold state (level + trend, init l = first value,
    * b = 0); the emitted point after each event equals the batch fold over
    * that event's prefix, so the key's LAST point equals the batch
    * operator's final (level_fx, trend_fx) exactly — under any cross-batch
    * arrival disorder inside the allowed lateness.
    */
  class HoltProcessor(aNum: Long, aDen: Long, bNum: Long, bDen: Long)
      extends OrderedFoldProcessor[HoltState, HoltPoint](Encoders.product[HoltState]) {
    override protected def zero: HoltState = HoltState(0L, 0L, seeded = false)
    override protected def step(st: HoltState, e: TimedEvent): (HoltState, HoltPoint) = {
      val next =
        if (!st.seeded) HoltState(e.fx, 0L, seeded = true)
        else {
          val d = ((e.fx - st.level - st.trend) * aNum) / aDen
          HoltState(st.level + st.trend + d, st.trend + (d * bNum) / bDen, seeded = true)
        }
      (next, HoltPoint(e.key, e.seq, next.level, next.trend))
    }
  }

  final case class HwPoint(key: String, seq: Long, level_fx: Long,
                           trend_fx: Long, season_next_fx: Long)
  final case class HwState(level: Long, trend: Long, t: Long,
                           seasons: Seq[Long], seeded: Boolean)

  /** Streaming twin of [[graft.ops.Outliers.holtWinters]] on the
    * ordered-fold base: the (level, trend, counter, m seasons) state is
    * the batch fold's accumulator verbatim (Java `/` on longs ≡ the batch
    * `div`, truncation toward zero), so the key's LAST point equals the
    * batch operator's final state exactly under any cross-batch arrival
    * disorder inside the allowed lateness. Each point also carries the
    * NEXT slot's season — level + trend + season_next is the one-step
    * forecast through the cycle, the alarm-able number.
    */
  class HoltWintersProcessor(m: Int, aNum: Long, aDen: Long, bNum: Long,
                             bDen: Long, gNum: Long, gDen: Long)
      extends OrderedFoldProcessor[HwState, HwPoint](Encoders.product[HwState]) {
    override protected def zero: HwState =
      HwState(0L, 0L, 0L, Seq.fill(m)(0L), seeded = false)
    override protected def step(st: HwState, e: TimedEvent): (HwState, HwPoint) = {
      val next =
        if (!st.seeded) HwState(e.fx, 0L, 1L, Seq.fill(m)(0L), seeded = true)
        else {
          val j = (st.t % m).toInt
          val sj = st.seasons(j)
          val err = e.fx - st.level - st.trend - sj
          val d = (err * aNum) / aDen
          HwState(st.level + st.trend + d, st.trend + (d * bNum) / bDen,
            st.t + 1, st.seasons.updated(j, sj + ((err - d) * gNum) / gDen),
            seeded = true)
        }
      (next, HwPoint(e.key, e.seq, next.level, next.trend,
        next.seasons((next.t % m).toInt)))
    }
  }

  /** Watermark-buffered streaming Holt–Winters; caller must already have
    * applied `withWatermark(tsCol, …)`. Parameters mirror the batch
    * operator.
    */
  def holtWintersStream(spark: SparkSession, df: DataFrame, keyCol: String,
                        tsCol: String, seqCol: String, valueCol: String,
                        period: Int, alphaNum: Int, alphaDen: Int,
                        betaNum: Int, betaDen: Int, gammaNum: Int,
                        gammaDen: Int, fxScale: Int = 2): Dataset[HwPoint] = {
    import spark.implicits._
    require(period >= 2, "period must be >= 2")
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    require(betaNum > 0 && betaNum <= betaDen, "beta must be in (0, 1]")
    require(gammaNum > 0 && gammaNum <= gammaDen, "gamma must be in (0, 1]")
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(
        new HoltWintersProcessor(period, alphaNum, alphaDen, betaNum, betaDen,
          gammaNum, gammaDen),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Watermark-buffered streaming Holt smoothing; caller must already have
    * applied `withWatermark(tsCol, …)`. Parameters mirror the batch
    * operator.
    */
  def holtStream(spark: SparkSession, df: DataFrame, keyCol: String,
                 tsCol: String, seqCol: String, valueCol: String,
                 alphaNum: Int, alphaDen: Int, betaNum: Int, betaDen: Int,
                 fxScale: Int = 2): Dataset[HoltPoint] = {
    import spark.implicits._
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    require(betaNum > 0 && betaNum <= betaDen, "beta must be in (0, 1]")
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(new HoltProcessor(alphaNum, alphaDen, betaNum, betaDen),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Watermark-buffered streaming EWMA; caller must already have applied
    * `withWatermark(tsCol, …)`. Parameters mirror the batch operator.
    */
  def ewmaStream(spark: SparkSession, df: DataFrame, keyCol: String,
                 tsCol: String, seqCol: String, valueCol: String,
                 alphaNum: Int, alphaDen: Int, fxScale: Int = 2): Dataset[EwmaPoint] = {
    import spark.implicits._
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(new EwmaProcessor(alphaNum, alphaDen),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Watermark-buffered streaming CUSUM; caller must already have applied
    * `withWatermark(tsCol, …)`. Parameters mirror the batch operator.
    */
  def cusumStream(spark: SparkSession, df: DataFrame, keyCol: String,
                  tsCol: String, seqCol: String, valueCol: String,
                  target: Double, slack: Double, threshold: Double,
                  fxScale: Int = 2): Dataset[CusumFlag] = {
    import spark.implicits._
    require(slack >= 0 && threshold > 0, "bad parameters")
    def fx(x: Double): Long =
      (if (x >= 0) math.floor(x * math.pow(10, fxScale) + 0.5)
       else -math.floor(-x * math.pow(10, fxScale) + 0.5)).toLong
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(
        new CusumProcessor(fx(target) + fx(slack), fx(target) - fx(slack), fx(threshold)),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Watermark-buffered streaming Page–Hinkley; caller must already have
    * applied `withWatermark(tsCol, …)`. Parameters mirror the batch
    * operator; `ph_fx` is in value-fx·10⁻⁶ units (descale by
    * 10⁶·10^fxScale).
    */
  def pageHinkleyStream(spark: SparkSession, df: DataFrame, keyCol: String,
                        tsCol: String, seqCol: String, valueCol: String,
                        delta: Double, lambda: Double,
                        fxScale: Int = 2): Dataset[PhFlag] = {
    import spark.implicits._
    require(lambda > 0 && delta >= 0, "bad parameters")
    def fx(x: Double): Long =
      (if (x >= 0) math.floor(x * math.pow(10, fxScale) + 0.5)
       else -math.floor(-x * math.pow(10, fxScale) + 0.5)).toLong
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(
        new PageHinkleyProcessor(fx(delta), fx(lambda) * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Total-order variant of [[anomalyStream]]: `tsCol` is the event-time
    * column the stream is watermarked on (`withWatermark(tsCol, delay)`
    * must already be applied by the caller); flags are emitted once the
    * watermark finalizes each event, identical to the batch operator under
    * ANY arrival order within the watermark bound.
    */
  def orderedAnomalyStream(spark: SparkSession, df: DataFrame, keyCol: String,
                           tsCol: String, seqCol: String, valueCol: String,
                           window: Int, tSquared: Long, minPoints: Int = 5,
                           minDev: Double = 0.0, fxScale: Int = 3): Dataset[AnomalyFlag] = {
    import spark.implicits._
    require(window >= 2 && minPoints >= 2 && tSquared >= 0 && minDev >= 0, "bad parameters")
    val minDevFx = math.round(minDev * math.pow(10, fxScale))
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMs"))
      .where(col("fx").isNotNull)
      .as[TimedEvent]
      .groupByKey(_.key)
      .transformWithState(new OrderedProcessor(window, tSquared, minPoints, minDevFx),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
