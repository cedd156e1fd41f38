package graft.ops

import graft.metrics.MetricColumns
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Event-time window aggregations — identical semantics for batch DataFrames
  * and Structured Streaming (the streaming variant adds a watermark; state is
  * bounded by it).
  */
object Windows {

  /** Tumbling-window counts + decimal-exact sums per key. Epoch-aligned, so
    * `window(ts, '1 hour').start == date_trunc('hour', ts)` — oracle-friendly.
    */
  def tumbling(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
               duration: String): DataFrame =
    windowed(df, tsCol, keyCol, valueCol, window(col(tsCol), duration))

  /** Shared tumbling/sliding aggregate body (count + decimal-exact sum) —
    * the DuckDB oracles mirror this exact tree, so it lives in ONE place.
    */
  private def windowed(df: DataFrame, tsCol: String, keyCol: String,
                       valueCol: String, w: Column): DataFrame =
    df.groupBy(w.as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(MetricColumns.fixedPointLong(col(valueCol), scale = 2)
          .cast(DecimalType(38, 0))).cast(DoubleType) / 100.0).as("sum_value")
      )
      .select(col("w.start").as("window_start"), col(keyCol), col("n_events"), col("sum_value"))

  /** SLIDING window aggregation (batch): each event contributes to
    * duration/slide overlapping windows — Spark's `window(ts, duration,
    * slide)` explodes the event into its covering windows before the
    * grouped aggregate (shuffle size × duration/slide; the standard
    * overlap cost). Decimal-exact sums as in [[tumbling]].
    */
  def sliding(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
              duration: String, slide: String): DataFrame =
    windowed(df, tsCol, keyCol, valueCol, window(col(tsCol), duration, slide))

  /** Streaming variant: watermarked tumbling window (append mode). */
  def tumblingStream(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
                     duration: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value")
      )
      .select(col("w.start").as("window_start"), col(keyCol), col("n_events"), col("sum_value"))

  /** Gap-based sessionization, batch flavor: a new session starts when the
    * gap to the previous event of the same key exceeds `gapSeconds`.
    * One shuffle on the key; window functions stay within partitions.
    */
  def sessionizeBatch(df: DataFrame, tsCol: String, keyCol: String, gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byKey)
    val isBreak = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("brk", isBreak)
      .withColumn("session_id", sum(col("brk")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"), max(col(tsCol)).as("t_end"))
  }

  /** Interval coverage per key: merge overlapping/touching [start, end]
    * intervals (gaps-and-islands) and report per key the merged-island
    * count, total covered length and raw-interval sum — utilization /
    * "total active time from overlapping sessions" where naive SUM
    * double-counts overlap. Integer units throughout (pass epoch
    * seconds/micros) — engine-exact.
    *
    * Shape: one key shuffle; a new island starts where `start` exceeds the
    * running max of previous `end`s (key-bounded ordered windows, no
    * global sort); per-island spans then one per-key aggregate.
    */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
                       endCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val isBreak = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L)
    df.where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__brk", isBreak)
      .withColumn("__island",
        sum(col("__brk")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"),
        sum(col(endCol) - col(startCol)).as("__raw"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast(LongType).as("islands"),
        sum(col("__e") - col("__s")).cast(LongType).as("covered"),
        sum(col("__raw")).cast(LongType).as("raw_sum"))
  }

  final case class SessionEvent(key: Long, ts: Timestamp) {
    def tsMicros: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(key: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Streaming sessionization with explicit state: sessions close when the
    * event-time watermark passes last-event + gap (EventTimeTimeout, append
    * mode). State per key is O(1) — bounded by the watermark.
    */
  def sessionizeStream(spark: SparkSession, df: DataFrame, tsCol: String, keyCol: String,
                       gapSeconds: Long, watermark: String): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L

    def emit(state: SessionState): SessionOut =
      SessionOut(-1L, new Timestamp(state.start / 1000L), new Timestamp(state.last / 1000L), state.n)

    df.select(col(keyCol).cast(LongType).as("key"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => emit(s).copy(key = key)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = events.map(_.tsMicros).toSeq.sorted
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { ts =>
              cur match {
                case Some(s) if ts - s.last <= gapMicros =>
                  cur = Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
                case Some(s) =>
                  closed += emit(s).copy(key = key)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + gapMicros) / 1000L + 1L)
            }
            closed.result().iterator
          }
      }
  }

  /** Per-key time-grid FORWARD FILL (LOCF — last observation carried
    * forward): materialize an epoch-aligned grid at `stepSeconds` between
    * each key's first and last observation and fill every empty tick with
    * the latest earlier value — the gap-repair every downstream
    * window/trend/anomaly operator silently assumes ("no row" and "no
    * change" are different facts; rolling z-scores and Holt forecasts
    * misread missing ticks as discontinuities).
    *
    * Semantics (all deterministic): ticks are FLOOR-aligned to the epoch
    * (`g = unix_micros div step`, the q_window_sliding grid convention, so
    * two tables gap-filled independently share tick boundaries); a tick
    * holding ≥1 observation takes the LAST one (max (ts, value) — value
    * desc breaks exact-ts ties); empty ticks inherit the nearest earlier
    * tick's value (`observed = false`). No fill precedes a key's first
    * observation (grids start AT the first tick, so output rows are never
    * NULL-valued).
    *
    * Distributed shape: one (key, tick) shuffle with map-side combine for
    * the bucket reduction, one key-keyed grid join + one per-key ordered
    * window for the carry — everything linear in observations + emitted
    * grid rows. The GRID is the output's honest cost: span/step rows per
    * key, chosen by the caller (a year of hourly ticks = 8.8k rows/key);
    * nothing is driver-side or key-count-bounded.
    *
    * @return (key, grid_ts timestamp, value, observed) — one row per key
    *         per tick, ordered semantics-free (order downstream).
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
              valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val stepUs = stepSeconds * 1000000L
    val obs = df.select(col(keyCol).as("key"),
        unix_micros(col(tsCol).cast(TimestampType)).as("us"),
        col(valueCol).cast(DoubleType).as("v"))
      // null values are NON-observations (there is nothing to carry), not
      // "observed null" — they neither open a tick nor reset the carry
      .where(col("key").isNotNull && col("us").isNotNull && col("v").isNotNull)
    // per-(key, tick) last observation: max(struct) keeps the latest ts,
    // value-desc on exact-ts ties — one shuffle, map-side combined
    val buckets = obs
      .select(col("key"), (col("us") - pmod(col("us"), lit(stepUs))).as("g"),
        struct(col("us"), col("v")).as("o"))
      .groupBy("key", "g").agg(max(col("o")).getField("v").as("bv"))
    // per-key tick span → explode the grid; sequence is long-typed
    val grid = buckets.groupBy("key")
      .agg(min(col("g")).as("g0"), max(col("g")).as("g1"))
      .select(col("key"),
        explode(sequence(col("g0"), col("g1"), lit(stepUs))).as("g"))
    val w = Window.partitionBy("key").orderBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(buckets, Seq("key", "g"), "left")
      .select(col("key"), timestamp_micros(col("g")).as("grid_ts"),
        last(col("bv"), ignoreNulls = true).over(w).as("value"),
        col("bv").isNotNull.as("observed"))
  }

  /** OHLC / time-bar resampling per key — the standard downsample from
    * tick-level series to per-window bars (open / high / low / close /
    * count / sum / mean): the shape every monitoring dashboard and
    * financial feed consumes, and the variance-preserving alternative to
    * plain windowed means (a mean hides the intra-window spike; high−low
    * is the spread signal [[graft.ops.Outliers]] detectors band on).
    *
    * Determinism: open/close use TOTAL-ORDER selection — open is the value
    * of the minimum (ts, value) struct (earliest tick; value-asc on
    * exact-ts ties), close of the maximum (latest tick; value-desc on
    * ties) — so re-runs and engines agree even on tied timestamps. Values
    * quantize to scale-`scale` longs ([[MetricColumns.fixedPointLong]]);
    * the sum is decimal-exact; mean is ONE double division. Windows are
    * epoch-aligned like [[gapFill]] (floor semantics via pmod, so
    * independently-resampled tables share boundaries).
    *
    * Shape: ONE (key, window) shuffle with map-side combine — min/max of
    * structs and the decimal sum all partial-aggregate; no row window, no
    * sort.
    *
    * @return (key, window_start, open, high, low, close, n_ticks, sum_fx,
    *         mean) — open/high/low/close/sum_fx in fixed-point units.
    */
  /** Streaming twin of [[ohlcBars]] — the identical aggregate body
    * (total-order struct min/max for open/close, decimal-exact sum) under
    * a watermarked event-time window: every component is a partial
    * aggregate, so the bars maintain incrementally with bounded state
    * (one accumulator row per open (key, window)). Batch parity is by
    * construction (same expressions over `window()`, which is
    * epoch-aligned exactly like the batch pmod bucketing) and spec-
    * asserted under cross-batch arrival.
    */
  def ohlcBarsStream(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, windowSeconds: Long, watermark: String,
                     scale: Int = 2): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val rows = df.select(col(keyCol).as("key"),
        col(tsCol).cast(TimestampType).as("__ts"),
        MetricColumns.fixedPointLong(col(valueCol), scale).as("v"))
      .where(col("key").isNotNull && col("__ts").isNotNull && col("v").isNotNull)
    rows.withWatermark("__ts", watermark)
      .withColumn("us", unix_micros(col("__ts")))
      .groupBy(window(col("__ts"), s"$windowSeconds seconds").as("w"), col("key"))
      .agg(
        min(struct(col("us"), col("v"))).getField("v").as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max(struct(col("us"), col("v"))).getField("v").as("close"),
        count(lit(1)).as("n_ticks"),
        sum(col("v").cast(DecimalType(38, 0))).as("sv"))
      .select(col("key"), col("w.start").as("window_start"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"),
        col("sv").cast(LongType).as("sum_fx"),
        (col("sv").cast(DoubleType) / col("n_ticks").cast(DoubleType)).as("mean"))
  }

  /** Streaming twin of [[vwapBars]] — the same exact DECIMAL Σpw/Σw per
    * tumbling window on a watermarked stream, so the continuous VWAP feed
    * is BIT-EQUAL to a batch replay of the same ticks (spec-asserted).
    * State is one (count, Σpw, Σw) triple per open (key, window). */
  def vwapBarsStream(df: DataFrame, keyCol: String, tsCol: String,
                     priceCol: String, volCol: String, windowSeconds: Long,
                     watermark: String, scale: Int = 2): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val D = DecimalType(38, 0)
    val rows = df.select(col(keyCol).as("key"),
        col(tsCol).cast(TimestampType).as("__ts"),
        MetricColumns.fixedPointLong(col(priceCol), scale).as("p"),
        col(volCol).cast(LongType).as("w"))
      .where(col("key").isNotNull && col("__ts").isNotNull &&
        col("p").isNotNull && col("w").isNotNull)
    rows.withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$windowSeconds seconds").as("wd"), col("key"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(col("p").cast(D) * col("w").cast(D)).as("spv"),
        sum(col("w").cast(D)).as("sw"))
      .select(col("key"), col("wd.start").as("window_start"),
        col("n_ticks"),
        col("spv").cast(LongType).as("sum_pv"),
        col("sw").cast(LongType).as("sum_vol"),
        when(col("sw") > lit(0L).cast(D),
          col("spv").cast(DoubleType) / col("sw").cast(DoubleType) /
            lit(math.pow(10, scale))).as("vwap"))
  }

  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, windowSeconds: Long, scale: Int = 2): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val stepUs = windowSeconds * 1000000L
    val rows = df.select(col(keyCol).as("key"),
        unix_micros(col(tsCol).cast(TimestampType)).as("us"),
        MetricColumns.fixedPointLong(col(valueCol), scale).as("v"))
      .where(col("key").isNotNull && col("us").isNotNull && col("v").isNotNull)
    rows
      .select(col("key"), (col("us") - pmod(col("us"), lit(stepUs))).as("g"),
        col("us"), col("v"))
      .groupBy("key", "g").agg(
        min(struct(col("us"), col("v"))).getField("v").as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max(struct(col("us"), col("v"))).getField("v").as("close"),
        count(lit(1)).as("n_ticks"),
        sum(col("v").cast(DecimalType(38, 0))).as("sv"))
      .select(col("key"), timestamp_micros(col("g")).as("window_start"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"),
        col("sv").cast(LongType).as("sum_fx"),
        (col("sv").cast(DoubleType) / col("n_ticks").cast(DoubleType)).as("mean"))
  }

  /** VWAP bars — [[ohlcBars]]'s WEIGHTED companion: the per-window
    * volume-weighted average price Σ(p·w)/Σw, the downsample that a
    * tick-count mean misrepresents the moment volume is uneven (one
    * whale tick ≠ one retail tick). Same tumbling-window grain as
    * [[ohlcBars]] so the two frames join on (key, window_start).
    *
    * Exactness: fixed-point prices × long weights accumulate as exact
    * DECIMAL(38,0); the vwap is ONE fixed double tree (Σpw/Σw then
    * descale). One (key, window) shuffle with map-side partials.
    *
    * @return per (key, window): (key, window_start, n_ticks, sum_pv
    *         (exact, fx·weight units), sum_vol, vwap) — vwap null when
    *         the window's weight sum is 0.
    */
  def vwapBars(df: DataFrame, keyCol: String, tsCol: String,
               priceCol: String, volCol: String, windowSeconds: Long,
               scale: Int = 2): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val D = DecimalType(38, 0)
    val stepUs = windowSeconds * 1000000L
    val rows = df.select(col(keyCol).as("key"),
        unix_micros(col(tsCol).cast(TimestampType)).as("us"),
        MetricColumns.fixedPointLong(col(priceCol), scale).as("p"),
        col(volCol).cast(LongType).as("w"))
      .where(col("key").isNotNull && col("us").isNotNull &&
        col("p").isNotNull && col("w").isNotNull)
    rows
      .select(col("key"), (col("us") - pmod(col("us"), lit(stepUs))).as("g"),
        col("p"), col("w"))
      .groupBy("key", "g").agg(
        count(lit(1)).as("n_ticks"),
        sum(col("p").cast(D) * col("w").cast(D)).as("spv"),
        sum(col("w").cast(D)).as("sw"))
      .select(col("key"), timestamp_micros(col("g")).as("window_start"),
        col("n_ticks"),
        col("spv").cast(LongType).as("sum_pv"),
        col("sw").cast(LongType).as("sum_vol"),
        when(col("sw") > lit(0L).cast(D),
          col("spv").cast(DoubleType) / col("sw").cast(DoubleType) /
            lit(math.pow(10, scale))).as("vwap"))
  }
}
