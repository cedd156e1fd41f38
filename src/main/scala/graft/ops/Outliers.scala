package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group IQR-fence outlier flagging (Tukey fences): a row is an outlier
  * when its value falls outside [q1 - k·IQR, q3 + k·IQR] of its group — the
  * deterministic anomaly rule a data-quality scan can gate on.
  *
  * Scale shape: one grouped exact-percentile aggregate produces a
  * |groups|-row fence table which is BROADCAST back onto the rows — the data
  * passes twice but never shuffles on anything except the group key. Exact
  * `percentile` holds per-group value-count maps; for high-cardinality value
  * domains at extreme scale pass `approx = true` (t-digest
  * `approx_percentile`, mergeable, bounded memory) — fences shift slightly,
  * the flagging rule is unchanged.
  *
  * Exactness note for oracle parity: run fences on integer-valued inputs
  * (e.g. fixed-point cents longs) — quartile interpolation at .25/.5/.75 on
  * integers is exact in IEEE doubles, so `q1 - k·(q3 - q1)` is bit-identical
  * across engines.
  */
object Outliers {

  /** Rolling z-score anomaly flags over an ordered sequence per key (the
    * time-series twin of [[iqrOutliers]]): each row is compared against the
    * mean/stddev of its PRECEDING `window` rows (exclusive — a row inside
    * its own window can never exceed z² = (n−1)²/n, which caps z below 3
    * for n ≤ 11 and would make t = 3 unreachable), flagged when
    * |value − mean| > t·stddev AND |value − mean| > `minDev` (the absolute
    * floor that keeps an ε-blip over a perfectly constant history — sd = 0,
    * z = ∞ — from alarming; 0 disables it). ONE keyed window pass —
    * shuffled by `partCols`, per-key frames sorted within partitions, never
    * a global sort (the [[Constraints.monotonicityViolations]] shape).
    *
    * ENGINE-EXACT by integer arithmetic: values are fixed-point longs
    * (scale `fxScale`), and the flag is evaluated as
    * `(n·v − S)² > t²·(n·Q − S²)` over integer rolling sums S = Σv,
    * Q = Σv² — no division, no sqrt, no float accumulation, so any engine
    * with the same frame reproduces identical flags (`tSquared` must be an
    * integer). Overflow envelope: |v·10^fxScale| ≤ 1e6 with window ≤ 1e3
    * keeps every term < 2^62. Rows with fewer than `minPoints` preceding
    * rows are never flagged (warm-up). `orderCol` must be unique per key
    * (frame ties are engine-arbitrary otherwise).
    */
  def rollingZScore(df: DataFrame, partCols: Seq[String], orderCol: String,
                    valueCol: String, window: Int, tSquared: Long,
                    minPoints: Int = 5, minDev: Double = 0.0,
                    fxScale: Int = 3): DataFrame = {
    require(window >= 2 && minPoints >= 2 && tSquared >= 0 && minDev >= 0, "bad parameters")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-window, -1)
    val v = graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale)
    val minDevFx = math.round(minDev * math.pow(10, fxScale))
    df.withColumn("__v", v)
      .withColumn("__n", count(col("__v")).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__q", sum(col("__v") * col("__v")).over(w))
      .withColumn("is_anomaly",
        col("__n") >= minPoints && {
          val dev = col("__n") * col("__v") - col("__s")
          dev * dev > lit(tSquared) * (col("__n") * col("__q") - col("__s") * col("__s")) &&
            abs(dev) > col("__n") * lit(minDevFx)
        })
      .drop("__v", "__n", "__s", "__q")
  }

  /** Two-sided CUSUM changepoint detection per key — the sustained-shift
    * detector that point rules ([[rollingZScore]]) can't see: a process
    * drifting 1σ for 50 samples never trips a z-test but accumulates
    * linearly in CUSUM. Classic Page recurrence
    * S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − target − slack)), alarm when S⁺ > h, and
    * the mirrored S⁻ for downward shifts.
    *
    * The max(0,·) recurrence LOOKS sequential but is exactly
    * S⁺ₜ = Pₜ − min(0, min_{i≤t} Pᵢ) over prefix sums Pₜ of the
    * deviations — so both sides ride ordinary per-key ordered windows
    * (prefix sum + running min; group-bounded partitions, one shuffle,
    * never a global sort). ENGINE-EXACT: values/target/slack/threshold all
    * go through the portable fixed-point long (scale `fxScale`) and every
    * statistic is integer arithmetic; `s_up`/`s_dn` are the raw longs.
    * `orderCol` must be unique per key.
    */
  def cusum(df: DataFrame, partCols: Seq[String], orderCol: String,
            valueCol: String, target: Double, slack: Double, threshold: Double,
            fxScale: Int = 2): DataFrame = {
    require(slack >= 0 && threshold > 0, "bad parameters")
    import org.apache.spark.sql.expressions.Window
    def fx(x: Double): Long =
      (if (x >= 0) math.floor(x * math.pow(10, fxScale) + 0.5)
       else -math.floor(-x * math.pow(10, fxScale) + 0.5)).toLong
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale)
    val hFx = fx(threshold)
    df.withColumn("__v", v)
      .withColumn("__pu", sum(col("__v") - lit(fx(target) + fx(slack))).over(w))
      .withColumn("__pd", sum(lit(fx(target) - fx(slack)) - col("__v")).over(w))
      .withColumn("s_up", col("__pu") - least(lit(0L), min(col("__pu")).over(w)))
      .withColumn("s_dn", col("__pd") - least(lit(0L), min(col("__pd")).over(w)))
      .withColumn("alarm_up", col("s_up") > hFx)
      .withColumn("alarm_dn", col("s_dn") > hFx)
      .drop("__v", "__pu", "__pd")
  }

  /** Page–Hinkley upward-shift alarm per key — the SEQUENTIAL-mean drift
    * detector next to [[cusum]]: CUSUM tests against a FIXED target;
    * Page–Hinkley self-references the series' own running mean, so it
    * needs no prior target at all — U_t = Σᵢ(xᵢ − m̄ᵢ − δ) with m̄ᵢ the
    * running mean at step i, alarm when U_t − min_{s≤t}U_s > λ (the
    * standard concept-drift monitor in streaming-ML literature).
    *
    * Exactness: per step, xᵢ·i − Sᵢ is an EXACT DECIMAL(38,0) integer
    * (a raw long product of fx value × step index could wrap on long
    * high-magnitude series), the deviation (xᵢ·i − Sᵢ)/i − δ is one
    * fixed double tree micro-quantized (·10⁶) before the running sum, so
    * U and the running min are exact integers in fx·10⁻⁶ units and the
    * alarm threshold compares integers. Key-partitioned windows over
    * calendar-bounded series (the [[cusum]] contract).
    *
    * @return input rows + (ph — descaled to value units, alarm) ordered
    *         within each key by orderCol.
    */
  def pageHinkley(df: DataFrame, partCols: Seq[String], orderCol: String,
                  valueCol: String, delta: Double, lambda: Double,
                  fxScale: Int = 2): DataFrame = {
    require(lambda > 0 && delta >= 0, "bad parameters")
    import org.apache.spark.sql.expressions.Window
    def fx(x: Double): Long =
      (if (x >= 0) math.floor(x * math.pow(10, fxScale) + 0.5)
       else -math.floor(-x * math.pow(10, fxScale) + 0.5)).toLong
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRow = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    val v = graft.metrics.MetricColumns.fixedPointLong(
      col(valueCol).cast("double"), fxScale)
    // xᵢ·i − Sᵢ in DECIMAL(38,0): a raw long product of fx value × step
    // index wraps silently once |v_fx|·steps exceeds 2⁶³ (large fxScale ×
    // long per-key series) — the same decimal-first routing as the other
    // fixed-point cumulatives. The quotient is a double either way.
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dev = (col("__v").cast(D38) * col("__i").cast(D38) -
        col("__s").cast(D38)).cast("double") /
      col("__i").cast("double") - lit(fx(delta).toDouble)
    val devFx = when(dev >= 0, floor(dev * lit(1e6) + lit(0.5)))
      .otherwise(-floor(-dev * lit(1e6) + lit(0.5))).cast("long")
    df.withColumn("__v", v)
      .withColumn("__i", row_number().over(wRow).cast("long"))
      .withColumn("__s", sum(col("__v").cast(D38)).over(w))
      .withColumn("__u", sum(devFx).over(w))
      .withColumn("__ph", col("__u") - least(lit(0L), min(col("__u")).over(w)))
      .withColumn("ph", col("__ph").cast("double") /
        lit(1e6 * math.pow(10, fxScale)))
      .withColumn("alarm", col("__ph") > lit(fx(lambda)) * lit(1000000L))
      .drop("__v", "__i", "__s", "__u", "__ph")
  }

  /** Per-key EWMA (exponentially-weighted moving average) with a FULLY
    * REPLAYABLE integer recurrence: values go through the portable
    * fixed-point long, alpha is the rational `alphaNum/alphaDen`, and each
    * step is `s += (v − s)·alphaNum div alphaDen` with truncation-toward-
    * zero integer division (Java `div` ≡ DuckDB `//`, both verified on
    * negatives) — the smoothed level is bit-identical on any engine or
    * layout, unlike float EWMA which accumulates rounding in arrival
    * order. Seeded with the key's first value.
    *
    * EWMA is inherently sequential per key, so the series is folded
    * ROW-LOCALLY: one groupBy collects each key's (order, value) pairs,
    * `sort_array` orders them, and a codegen'd `aggregate` HOF runs the
    * fold — the right distributed shape while per-key series fit in task
    * memory (per-user/entity telemetry; for unbounded keys window the
    * input first). Returns (key…, n, ewma_fx, ewma).
    */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String,
           alphaNum: Int, alphaDen: Int, fxScale: Int = 2): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    val v = graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale)
    df.filter(col(valueCol).isNotNull)
      .select(keyCols.map(col) ++ Seq(col(orderCol).as("__o"), v.as("__v")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__o"), col("__v")))).as("__arr"),
        count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("n"))
      .withColumn("__vs", expr("transform(__arr, x -> x.__v)"))
      .withColumn("ewma_fx", expr(
        s"aggregate(slice(__vs, 2, greatest(size(__vs) - 1, 0)), element_at(__vs, 1), " +
          s"(acc, x) -> acc + ((x - acc) * ${alphaNum}L) div ${alphaDen}L)"))
      .withColumn("ewma",
        col("ewma_fx").cast(org.apache.spark.sql.types.DoubleType) /
          lit(math.pow(10, fxScale)))
      .drop("__arr", "__vs")
  }

  /** Holt double-exponential smoothing per key — level + TREND, the
    * forecast/trend reading EWMA can't give (EWMA lags a ramp forever; Holt
    * learns the slope). Fully integer recurrence on scale-`fxScale`
    * fixed-point longs, initialized (l = x₁, b = 0):
    *
    *   d  = ((x − l − b)·αn) div αd      (the innovation, one truncation)
    *   l' = l + b + d
    *   b' = b + (d·βn) div βd
    *
    * Truncating division is part of the definition (Spark `div` ≡ DuckDB
    * `//` toward zero, negative-operand spec'd at −57/10 → −5), so levels
    * and trends replay bit-for-bit on any engine/partitioning. Like
    * [[ewma]], the inherently-sequential fold runs ROW-LOCALLY over the
    * key's collected series (one groupBy collect + codegen'd aggregate
    * HOF) — the right distributed shape while per-key series fit task
    * memory. The fold state is an ARRAY accumulator on BOTH engines:
    * DuckDB v1.0 `list_reduce` mutates a STRUCT accumulator field-by-field
    * (the second field's expression sees the first's already-updated
    * value — measured, PLANS.md), while list elements evaluate against the
    * immutable accumulator.
    *
    * @return per key: n, level_fx, trend_fx (+ level / forecast doubles,
    *         forecast = one-step-ahead level + trend).
    */
  def holt(df: DataFrame, keyCols: Seq[String], orderCol: String, valueCol: String,
           alphaNum: Int, alphaDen: Int, betaNum: Int, betaDen: Int,
           fxScale: Int = 2): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    require(betaNum > 0 && betaNum <= betaDen, "beta must be in (0, 1]")
    val v = graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale)
    val d = s"((x - element_at(acc, 1) - element_at(acc, 2)) * ${alphaNum}L) div ${alphaDen}L"
    df.filter(col(valueCol).isNotNull)
      .select(keyCols.map(col) ++ Seq(col(orderCol).as("__o"), v.as("__v")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__o"), col("__v")))).as("__arr"),
        count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("n"))
      .withColumn("__vs", expr("transform(__arr, x -> x.__v)"))
      .withColumn("__st", expr(
        s"aggregate(slice(__vs, 2, greatest(size(__vs) - 1, 0)), " +
          "array(element_at(__vs, 1), 0L), " +
          s"(acc, x) -> array(element_at(acc, 1) + element_at(acc, 2) + $d, " +
          s"element_at(acc, 2) + (($d) * ${betaNum}L) div ${betaDen}L))"))
      .withColumn("level_fx", expr("element_at(__st, 1)"))
      .withColumn("trend_fx", expr("element_at(__st, 2)"))
      .withColumn("level",
        col("level_fx").cast(org.apache.spark.sql.types.DoubleType) /
          lit(math.pow(10, fxScale)))
      .withColumn("forecast",
        (col("level_fx") + col("trend_fx")).cast(org.apache.spark.sql.types.DoubleType) /
          lit(math.pow(10, fxScale)))
      .drop("__arr", "__vs", "__st")
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per key — level + trend +
    * an m-slot seasonal profile, the member [[holt]] can't express (a
    * daily/weekly cycle reads as "trend" to Holt and whipsaws it; HW
    * learns the cycle and forecasts THROUGH it). Error-correction form as
    * a fully integer recurrence on scale-`fxScale` longs (seed l = x₁,
    * b = 0, seasons 0; season slot j = t mod period):
    *
    *   e    = x − l − b − s_j               (one-step forecast error)
    *   d    = (e·αn) div αd                 (α·e)
    *   l'   = l + b + d
    *   b'   = b + (d·βn) div βd             ([[holt]]'s convention: β on d)
    *   s_j' = s_j + ((e − d)·γn) div γd     (γ·(1−α)·e, exact on the
    *                                         already-truncated d)
    *
    * Truncating `div` ≡ DuckDB `//` is part of the definition, so state
    * replays bit-for-bit cross-engine. Same row-local ordered fold as
    * [[ewma]]/[[holt]] (groupBy collect + codegen'd aggregate HOF); the
    * accumulator is array(l, b, t, s₀…s_{m−1}) — the element counter t
    * rides IN the state because the HOF has no index.
    *
    * @return per key: n, level_fx, trend_fx, season_fx (array of m longs),
    *         level, forecast — forecast = l + b + s_{n mod m} (one step
    *         ahead, through the cycle).
    */
  def holtWinters(df: DataFrame, keyCols: Seq[String], orderCol: String,
                  valueCol: String, period: Int,
                  alphaNum: Int, alphaDen: Int, betaNum: Int, betaDen: Int,
                  gammaNum: Int, gammaDen: Int, fxScale: Int = 2): DataFrame = {
    require(period >= 2, "period must be >= 2")
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha must be in (0, 1]")
    require(betaNum > 0 && betaNum <= betaDen, "beta must be in (0, 1]")
    require(gammaNum > 0 && gammaNum <= gammaDen, "gamma must be in (0, 1]")
    val m = period
    val v = graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale)
    val sj = s"element_at(acc, cast(4 + element_at(acc, 3) % ${m}L as int))"
    val e = s"(x - element_at(acc, 1) - element_at(acc, 2) - $sj)"
    val d = s"(($e) * ${alphaNum}L) div ${alphaDen}L"
    val fold =
      s"""aggregate(slice(__vs, 2, greatest(size(__vs) - 1, 0)),
         |  concat(array(element_at(__vs, 1), 0L, 1L), array_repeat(0L, $m)),
         |  (acc, x) -> concat(
         |    array(
         |      element_at(acc, 1) + element_at(acc, 2) + ($d),
         |      element_at(acc, 2) + (($d) * ${betaNum}L) div ${betaDen}L,
         |      element_at(acc, 3) + 1L),
         |    transform(sequence(0, ${m - 1}),
         |      k -> CASE WHEN k = cast(element_at(acc, 3) % ${m}L as int)
         |           THEN element_at(acc, cast(4 + k as int))
         |                + ((($e) - ($d)) * ${gammaNum}L) div ${gammaDen}L
         |           ELSE element_at(acc, cast(4 + k as int)) END)))""".stripMargin
    df.filter(col(valueCol).isNotNull)
      .select(keyCols.map(col) ++ Seq(col(orderCol).as("__o"), v.as("__v")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__o"), col("__v")))).as("__arr"),
        count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("n"))
      .withColumn("__vs", expr("transform(__arr, x -> x.__v)"))
      .withColumn("__st", expr(fold))
      .withColumn("level_fx", expr("element_at(__st, 1)"))
      .withColumn("trend_fx", expr("element_at(__st, 2)"))
      .withColumn("season_fx", expr(s"slice(__st, 4, $m)"))
      .withColumn("level",
        col("level_fx").cast(org.apache.spark.sql.types.DoubleType) /
          lit(math.pow(10, fxScale)))
      .withColumn("forecast", expr(
        s"cast(element_at(__st, 1) + element_at(__st, 2) " +
          s"+ element_at(__st, cast(4 + n % ${m}L as int)) as double)") /
        lit(math.pow(10, fxScale)))
      .drop("__arr", "__vs", "__st")
  }

  /** Exact interpolated percentiles with `quantile_cont` semantics (rank
    * (n−1)·p, linear interpolation — bit-matching Spark's built-in
    * `percentile` aggregate) computed WITHOUT the value multiset: the
    * (distinct value, count) frame + [[Binning]]'s cardinality-ROUTED
    * cumulative (local running sum ≤ `maxLocalDistinct` distinct values,
    * [[Packing.prefixSum]]'s two-phase distributed scan past it). The
    * built-in exact aggregate funnels the whole column's values into ONE
    * merge task — fine at sf0.1, an OOM at 100 TB; this path's largest
    * single-task state is a counts partition. Driver-side cost: the
    * covering rows for ≤ 2·|ps| rank positions (scalars).
    *
    * `valueCol` must be integer-valued (cast/quantize continuous domains
    * to fixed-point longs first — which also keeps the interpolation
    * arithmetic exact cross-engine). NULLs are excluded, matching the
    * built-in aggregate.
    */
  def exactPercentilesRouted(df: DataFrame, valueCol: Column, ps: Seq[Double],
                             maxLocalDistinct: Long = 1L << 20): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "bad percentiles")
    // the skinny (v, c) frame is consumed by three driver actions — persist
    // it so the base table is scanned and shuffled exactly ONCE (measured
    // 2.6 → ~1.4 s at sf0.1 on a distinct≈rows column)
    val counts = Binning.distinctValueCounts(df, valueCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val head = counts
        .agg(count(lit(1)).as("d"), sum("c").cast(org.apache.spark.sql.types.LongType).as("n"))
        .collect()(0)
      val distinct = head.getLong(0)
      require(distinct > 0, "no non-null values")
      val n = head.getLong(1)
      val cum = Binning.cumulativeFromCounts(counts, distinct, maxLocalDistinct)
      val ranks = ps.map { p =>
        val rk = (n - 1) * p
        (rk, math.floor(rk).toLong, math.ceil(rk).toLong)
      }
      val needed = ranks.flatMap { case (_, lo, hi) => Seq(lo, hi) }.distinct
      // one skinny filter over the counts frame collects the ≤ 2|ps| rows
      // whose [cum_lt, cum_le) span covers a needed 0-based rank position
      val covering = needed.map(i =>
        col("cum") > lit(i) && col("cum") - col("c") <= lit(i)).reduce(_ || _)
      val rows = cum.where(covering)
        .select(col("v"), (col("cum") - col("c")).as("lt"), col("cum")).collect()
      def valueAt(i: Long): Double =
        rows.find(r => r.getLong(1) <= i && i < r.getLong(2))
          .getOrElse(sys.error(s"rank $i uncovered")).getLong(0).toDouble
      ranks.map { case (rk, lo, hi) =>
        val vl = valueAt(lo)
        if (hi == lo) vl else vl + (rk - lo) * (valueAt(hi) - vl)
      }
    } finally counts.unpersist(blocking = false)
  }

  /** Grouped exact percentiles over the distinct-(group, value) rollup,
    * MEASURED route: the corpus reduces to cells once; at or under
    * `maxLocalDistinct` cells the per-group interpolation runs driver-side
    * (sort + cumulative walk — no window pass, no per-group value MAPS:
    * the builtin `percentile` aggregate builds a boxed OpenHashMap per
    * partial, ~3× slower on a distinct≈rows column); past the bound the
    * group-partitioned window fallback runs. Interpolation is the
    * quantile_cont tree (v_lo + (rk−⌊rk⌋)·(v_hi−v_lo), rk = (n−1)·p) —
    * the same fixed double tree as [[exactPercentilesRouted]].
    *
    * @return one row per group: (groupCol, p0, p1, …) aliased per `names`.
    */
  def groupedPercentilesRouted(df: DataFrame, valueCol: Column, groupCol: String,
                               ps: Seq[Double], names: Seq[String],
                               maxLocalDistinct: Long = 1L << 20): DataFrame = {
    require(ps.nonEmpty && ps.size == names.size && ps.forall(p => p >= 0 && p <= 1))
    val Dbl = org.apache.spark.sql.types.DoubleType
    val cells = df.select(col(groupCol).as("__g"), valueCol.cast(Dbl).as("__v"))
      .where(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true) // one corpus shuffle serves measure + compute
    val nCells = cells.count()
    if (nCells <= maxLocalDistinct) {
      val local = cells.collect().map(r => (r.get(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1)
      val spark = df.sparkSession
      val rows = local.iterator.map { case (g, arr) =>
        val sorted = arr.sortBy(_._2)
        val n = sorted.iterator.map(_._3).sum
        // value at 0-based rank i via the cumulative walk
        def valueAt(i: Long): Double = {
          var cum = 0L; var k = 0
          while (cum <= i && k < sorted.length) { cum += sorted(k)._3; k += 1 }
          sorted(k - 1)._2
        }
        val fences = ps.map { p =>
          val rk = (n - 1) * p
          val lo = math.floor(rk).toLong
          val hi = math.ceil(rk).toLong
          val vl = valueAt(lo)
          if (hi == lo) vl else vl + (rk - lo) * (valueAt(hi) - vl)
        }
        org.apache.spark.sql.Row.fromSeq(g +: fences)
      }.toSeq
      val schema = org.apache.spark.sql.types.StructType(
        df.schema(groupCol).copy(name = groupCol) +:
          names.map(n => org.apache.spark.sql.types.StructField(n, Dbl, nullable = false)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } else {
      import org.apache.spark.sql.expressions.Window
      val wRun = Window.partitionBy("__g").orderBy("__v")
      val wAll = Window.partitionBy("__g")
      val cum = cells.withColumn("__k", sum(col("__c")).over(wRun))
        .withColumn("__ng", sum(col("__c")).over(wAll))
      val aggs = ps.zip(names).flatMap { case (p, nm) =>
        val rk = (col("__ng") - 1).cast(Dbl) * lit(p)
        val lo = floor(rk).cast(org.apache.spark.sql.types.LongType)
        val hi = ceil(rk).cast(org.apache.spark.sql.types.LongType)
        Seq(min(when(col("__k") > lo, col("__v"))).as(s"__l_$nm"),
            min(when(col("__k") > hi, col("__v"))).as(s"__h_$nm"),
            max(rk - lo.cast(Dbl)).as(s"__f_$nm"))
      }
      cum.groupBy(col("__g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
        .select(col(groupCol) +: names.map(nm =>
          (col(s"__l_$nm") + col(s"__f_$nm") * (col(s"__h_$nm") - col(s"__l_$nm")))
            .as(nm)): _*)
    }
  }

  /** Winsorization: clamp `valueCol` into its own [pLow, pHigh] percentile
    * fences — the standard heavy-tail tamer before averaging / training on
    * a signal with spikes (clip, don't drop: row count and joins stay
    * intact). Adds `<col>_winsorized` and a `was_clipped` flag.
    *
    * Fence engine, routed by column shape:
    *  - integral-typed column (the recommended fixed-point-quantized form,
    *    which also makes the fences bit-exact cross-engine): the scale-safe
    *    [[exactPercentilesRouted]] counts path — no value multiset ever
    *    sits in one task, and the fences come back as plain literals so
    *    the clamp is a pure row-local projection (no crossJoin, no extra
    *    shuffle);
    *  - `approx = true`: `approx_percentile` (bounded-memory sketch) — the
    *    escape for continuous high-cardinality domains;
    *  - otherwise: the legacy exact `percentile` aggregate (value-multiset
    *    single merge task — fine locally, quantize or set `approx` at
    *    scale).
    */
  def winsorize(df: DataFrame, valueCol: String, pLow: Double = 0.01,
                pHigh: Double = 0.99, approx: Boolean = false,
                maxLocalDistinct: Long = 1L << 20): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh, "bad percentile bounds")
    val v = col(valueCol).cast(org.apache.spark.sql.types.DoubleType)
    val integral = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (!approx && integral) {
      val Seq(lo, hi) =
        exactPercentilesRouted(df, col(valueCol), Seq(pLow, pHigh), maxLocalDistinct)
      df.withColumn(s"${valueCol}_winsorized", least(greatest(v, lit(lo)), lit(hi)))
        .withColumn("was_clipped", v < lit(lo) || v > lit(hi))
    } else {
      // exact `percentile` partials carry the value MULTISET; repartitioning
      // the skinny value column first parallelizes the partials (measured
      // 5.1 → 3.1 s at sf0.1; the single merge task is inherent)
      val pAgg = (p: Double) =>
        if (approx) approx_percentile(col(valueCol), lit(p), lit(10000))
          .cast(org.apache.spark.sql.types.DoubleType)
        else percentile(col(valueCol), lit(p))
      val fences = df.select(col(valueCol))
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
        .agg(pAgg(pLow).as("__lo"), pAgg(pHigh).as("__hi"))
      df.crossJoin(broadcast(fences))
        .withColumn(s"${valueCol}_winsorized", least(greatest(v, col("__lo")), col("__hi")))
        .withColumn("was_clipped", v < col("__lo") || v > col("__hi"))
        .drop("__lo", "__hi")
    }
  }

  /** TRIMMED mean: the mean of the values strictly inside the exact
    * [pLow, pHigh] percentile fences — [[winsorize]]'s drop-don't-clip
    * sibling (winsorizing pulls tail mass ONTO the fences and keeps row
    * count; trimming discards the tails entirely — the estimator of choice
    * when tail values are garbage rather than merely extreme). `valueCol`
    * must be integer-valued (quantize via fixedPointLong first).
    *
    * Exact end-to-end: fences from the [[exactPercentilesRouted]] counts
    * path (quantile_cont semantics, no value multiset in any task), the
    * kept-sum as DECIMAL(38,0), ONE final double division — plus the
    * fence compares on exact half-representable doubles; everything
    * replays cross-engine bit-for-bit.
    *
    * @return one row: (n_total, n_kept, lo, hi, trimmed_mean).
    */
  def trimmedMean(df: DataFrame, valueCol: String, pLow: Double = 0.05,
                  pHigh: Double = 0.95,
                  maxLocalDistinct: Long = 1L << 20): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh, "bad percentile bounds")
    val Seq(lo, hi) =
      exactPercentilesRouted(df, col(valueCol), Seq(pLow, pHigh), maxLocalDistinct)
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val vd = col("__v").cast(DoubleType)
    val kept = vd >= lit(lo) && vd <= lit(hi)
    df.select(col(valueCol).cast(LongType).as("__v"))
      .where(col("__v").isNotNull)
      .agg(
        count(lit(1)).as("n_total"),
        count(when(kept, lit(1))).as("n_kept"),
        sum(when(kept, col("__v")).cast(DecimalType(38, 0))).as("__s"))
      .select(col("n_total"), col("n_kept"), lit(lo).as("lo"), lit(hi).as("hi"),
        when(col("n_kept") > 0,
          col("__s").cast(DoubleType) / col("n_kept").cast(DoubleType))
          .as("trimmed_mean"))
  }

  /** Robust per-group outlier flags via the MEDIAN / MAD rule (the Hampel
    * identifier): a row is an outlier when |x − median| > k·MAD, with
    * MAD = median(|x − median|). Unlike the mean/stddev z-score, a few
    * extreme values cannot drag the fences (breakdown point 50% vs 0%);
    * unlike the IQR fences ([[iqrOutliers]]) the cutoff scales with the
    * bulk's own dispersion on BOTH sides of the median symmetrically.
    * `k = 3·1.4826 ≈ 4.45` matches a 3-sigma rule under normality (the
    * 1.4826 consistency constant); the default leaves k raw.
    *
    * ONE distinct-(group, value) rollup serves both medians (MAD is the
    * weighted median of |v − med| over the same cells), broadcast back
    * onto the rows for the row-local flag — the corpus shuffles once (use
    * `approx = true` at extreme value cardinality). Feed fixed-point longs
    * for cross-engine bit-exactness: medians interpolate to halves and
    * deviations to quarters — all exactly representable, so the flag's
    * double compare replays in the oracle.
    *
    * Output: input + (__med, __mad, is_outlier).
    */
  def madOutliers(df: DataFrame, valueCol: Column, groupCol: String,
                  k: Double = 3.0, approx: Boolean = false,
                  maxLocalDistinct: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Dbl = org.apache.spark.sql.types.DoubleType
    // exact medians ride the distinct-value rollup + group-bounded
    // cumulative (the brownForsythe machinery) instead of percentile()'s
    // ObjectHashAggregate over raw rows — same interpolated value
    // ((lo+hi)/2 ≡ percentile(0.5) at exactly-representable inputs).
    // BOTH medians derive from ONE corpus rollup: MAD is the weighted
    // median of |v − med| over the (g, v, count) cells — the deviation
    // frame never touches the rows, so the corpus is shuffled once and
    // scanned twice (rollup + the row-local flag projection) instead of
    // the naive three rollup passes (measured 2.4 → 1.1 s at sf0.1).
    // `approx` keeps the sketch escape.
    def medFromCells(cells: DataFrame, out: String): DataFrame = {
      val wRun = Window.partitionBy("__g").orderBy("__v")
      val wAll = Window.partitionBy("__g")
      cells.withColumn("__k", sum(col("__c")).over(wRun))
        .withColumn("__ng", sum(col("__c")).over(wAll))
        .groupBy(col("__g").as(groupCol)).agg(
          ((min(when(col("__k") >= expr("(__ng + 1) div 2"), col("__v"))) +
            min(when(col("__k") >= expr("__ng div 2 + 1"), col("__v")))) /
            lit(2.0)).as(out))
    }
    val (med1, mad) =
      if (approx) {
        val m1 = df.groupBy(groupCol).agg(
          approx_percentile(valueCol, lit(0.5), lit(10000)).cast(Dbl).as("__med"))
        val dev = df.join(broadcast(m1), Seq(groupCol))
          .withColumn("__dev", abs(valueCol.cast(Dbl) - col("__med")))
        (m1, dev.groupBy(groupCol).agg(
          approx_percentile(col("__dev"), lit(0.5), lit(10000)).cast(Dbl).as("__mad")))
      } else {
        val cellsBase = df.groupBy(col(groupCol).as("__g"), valueCol.cast(Dbl).as("__v"))
          .agg(count(lit(1)).as("__c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nCells = cellsBase.count()
          if (nCells <= maxLocalDistinct) {
            // MEASURED local route: ONE collect of the (g, v, c) cells
            // serves BOTH medians — the deviation multiset |v − med| is a
            // driver-side remap of the same cells, so no second rollup, no
            // window sorts, no broadcast round-trips (measured 2.6 → ~1.6 s
            // at sf0.1 on a distinct≈rows column). Identical interpolation
            // formula as the window path — same doubles.
            val byG = cellsBase.collect()
              .map(r => (r.get(0), r.getDouble(1), r.getLong(2)))
              .groupBy(_._1)
            def wMed(arr: Array[(Double, Long)]): Double = {
              val sorted = arr.sortBy(_._1)
              val n = sorted.iterator.map(_._2).sum
              def at(rank: Long): Double = { // 1-based rank in the multiset
                var cum = 0L; var i = 0
                while (cum < rank && i < sorted.length) { cum += sorted(i)._2; i += 1 }
                sorted(i - 1)._1
              }
              (at((n + 1) / 2) + at(n / 2 + 1)) / 2.0
            }
            val rows = byG.iterator.map { case (g, arr) =>
              val med = wMed(arr.map(t => (t._2, t._3)).toArray)
              val mad = wMed(arr.map(t => (math.abs(t._2 - med), t._3)).toArray)
              org.apache.spark.sql.Row(g, med, mad)
            }.toSeq
            val spark = df.sparkSession
            val gf = df.select(col(groupCol)).schema.head
            def small(name: String, idx: Int) = spark.createDataFrame(
              spark.sparkContext.parallelize(rows.map(r =>
                org.apache.spark.sql.Row(r.get(0), r.getDouble(idx))), 1),
              org.apache.spark.sql.types.StructType(Seq(gf,
                org.apache.spark.sql.types.StructField(name, Dbl, nullable = false))))
            (small("__med", 1), small("__mad", 2))
          } else {
            val cells = cellsBase.localCheckpoint(true) // median + deviation rollup
            val m1 = medFromCells(cells, "__med")
            val devCells = cells
              .join(broadcast(m1.withColumnRenamed(groupCol, "__g")), Seq("__g"))
              .groupBy(col("__g"), abs(col("__v") - col("__med")).as("__v"))
              .agg(sum(col("__c")).as("__c"))
            (m1, medFromCells(devCells, "__mad"))
          }
        } finally cellsBase.unpersist(blocking = false)
      }
    df.join(broadcast(med1), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier",
        abs(valueCol.cast(Dbl) - col("__med")) > lit(k) * col("__mad"))
  }

  /** Per-group [[winsorize]]: clamp each row into ITS OWN group's
    * [pLow, pHigh] exact percentile fences — heterogeneous segments (per
    * language, per source) each get their own tail treatment instead of
    * the global fences flattening the small segments. One grouped
    * exact-percentile aggregate broadcast back + a row-local clamp.
    */
  def winsorizeByGroup(df: DataFrame, valueCol: String, groupCol: String,
                       pLow: Double = 0.01, pHigh: Double = 0.99,
                       approx: Boolean = false): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh, "bad percentile bounds")
    // exact fences ride the measured cells route (driver-local under the
    // bound, group window past it — see groupedPercentilesRouted: the
    // builtin `percentile` aggregate's boxed per-group value maps cost ~3×
    // on distinct≈rows columns); `approx` keeps the sketch escape
    val fences =
      if (approx) df.groupBy(groupCol).agg(
        approx_percentile(col(valueCol), lit(pLow), lit(10000))
          .cast(org.apache.spark.sql.types.DoubleType).as("__lo"),
        approx_percentile(col(valueCol), lit(pHigh), lit(10000))
          .cast(org.apache.spark.sql.types.DoubleType).as("__hi"))
      else groupedPercentilesRouted(df, col(valueCol), groupCol,
        Seq(pLow, pHigh), Seq("__lo", "__hi"))
    val v = col(valueCol).cast(org.apache.spark.sql.types.DoubleType)
    df.join(broadcast(fences), Seq(groupCol))
      .withColumn(s"${valueCol}_winsorized", least(greatest(v, col("__lo")), col("__hi")))
      .withColumn("was_clipped", v < col("__lo") || v > col("__hi"))
      .drop("__lo", "__hi")
  }

  def iqrOutliers(df: DataFrame, valueCol: Column, groupCol: String,
                  k: Double = 1.5, approx: Boolean = false): DataFrame = {
    // NOTE a counts-based exact quantile (groupBy value → running count →
    // interpolate) was benched against the builtin `percentile` aggregate on
    // this shape and LOST (4.6 s vs 2.3 s at sf0.1): price-like domains have
    // value cardinality ≈ row cardinality, so the counts frame is as big as
    // the data and adds a window pass. `percentile`'s per-group value map is
    // the right exact engine; `approx = true` is the bounded-memory escape.
    val ps = array(lit(0.25), lit(0.75))
    val qAgg = if (approx) approx_percentile(valueCol, ps, lit(10000))
               else percentile(valueCol, ps)
    val fences = df.groupBy(groupCol).agg(qAgg.as("__q"))
      .select(col(groupCol),
        element_at(col("__q"), 1).as("__q1"),
        element_at(col("__q"), 2).as("__q3"))
    df.join(broadcast(fences), Seq(groupCol))
      .withColumn("is_outlier",
        valueCol < col("__q1") - lit(k) * (col("__q3") - col("__q1")) ||
        valueCol > col("__q3") + lit(k) * (col("__q3") - col("__q1")))
      .drop("__q1", "__q3")
  }

  /** Forecast error metrics per key — MAE / RMSE / MAPE / MASE over an
    * (actual, predicted) tick series: the ACCEPTANCE layer for the
    * forecasting family ([[holt]]/[[holtWinters]]/seasonal-naive) — a
    * forecaster is only better if its MASE < 1 (it beat the naive lag-1
    * walk on the SAME series, Hyndman & Koehler 2006), which "low RMSE"
    * alone never establishes.
    *
    * Exactness: actual/predicted quantize to fixed-point longs; |e| and
    * e² sum as exact decimals; the MAPE percentage terms truncate to pico
    * fixed-point (order-free, zero-actual ticks excluded and counted);
    * the naive lag-1 denominator needs consecutive ticks (one key-bounded
    * lag window). Each output metric is ONE final double tree.
    *
    * @return per key: (keys…, n, mae, rmse, mape, mape_n, mase) — mase
    *         null when the naive denominator is 0.
    */
  def forecastErrors(df: DataFrame, keyCols: Seq[String], tickCol: String,
                     actualCol: String, predCol: String,
                     fxScale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val Dbl = org.apache.spark.sql.types.DoubleType
    val gc = keyCols.map(col)
    val s = df.select(gc ++ Seq(
        col(tickCol).cast(org.apache.spark.sql.types.LongType).as("__t"),
        graft.metrics.MetricColumns.fixedPointLong(col(actualCol).cast(Dbl), fxScale).as("__a"),
        graft.metrics.MetricColumns.fixedPointLong(col(predCol).cast(Dbl), fxScale).as("__p")): _*)
      .where(col("__t").isNotNull && col("__a").isNotNull && col("__p").isNotNull)
    val w = Window.partitionBy(gc: _*).orderBy(col("__t"))
    val e = col("__a") - col("__p")
    val naive = abs(col("__a") - lag(col("__a"), 1).over(w))
    val pct = when(col("__a") =!= 0L,
      graft.metrics.MetricColumns.fixedPointLong(
        abs(e).cast(Dbl) / abs(col("__a")).cast(Dbl), 12))
    val agg = s
      .withColumn("__nv", naive)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        sum(abs(e).cast(D)).as("__sae"),
        sum((e.cast(D) * e.cast(D))).as("__sse"),
        sum(pct).cast(org.apache.spark.sql.types.LongType).as("__spct"),
        count(pct).as("mape_n"),
        sum(col("__nv").cast(D)).as("__snv"),
        count(col("__nv")).as("__nnv"))
    val nD = col("n").cast(Dbl)
    val deScale = lit(math.pow(10, fxScale))
    agg.select(gc ++ Seq(col("n"),
      (col("__sae").cast(Dbl) / nD / deScale).as("mae"),
      (sqrt(col("__sse").cast(Dbl) / nD) / deScale).as("rmse"),
      when(col("mape_n") > 0L,
        col("__spct").cast(Dbl) / col("mape_n").cast(Dbl) / lit(1e12)).as("mape"),
      col("mape_n"),
      when(col("__nnv") > 0L && col("__snv").cast(Dbl) > 0.0,
        (col("__sae").cast(Dbl) / nD) /
          (col("__snv").cast(Dbl) / col("__nnv").cast(Dbl))).as("mase")): _*)
  }

  /** Classical seasonal profile per key (decomposition-lite): the
    * MEASURED seasonal indices [[holtWinters]] estimates adaptively and
    * [[graft.ops.Correlation.acf]] only detects — per (key, phase = tick
    * mod period), the mean DETRENDED value, where the trend is the
    * centered ±⌊period/2⌋ moving average (the classical MA detrend;
    * window width period+1 for even periods). Ticks without a FULL
    * centered window are excluded (series edges, gaps — feed
    * [[graft.ops.Windows.gapFill]] output for dense grids); tick unique
    * per key (the acf contract).
    *
    * Exactness: the trend ratio and detrended value are one fixed double
    * tree per row; detrended values quantize to scale-`fxScale`
    * fixed-point longs so the per-phase sums are EXACT and order-free;
    * the per-phase mean is one final double tree. One key-partitioned
    * RANGE window + one (key, phase) rollup.
    *
    * @return (keys…, phase, n, seasonal_fx, seasonal) ordered by caller.
    */
  def seasonalProfile(df: DataFrame, keyCols: Seq[String], tickCol: String,
                      valueCol: String, period: Int, fxScale: Int = 6): DataFrame = {
    require(period >= 2, "period must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val Dbl = org.apache.spark.sql.types.DoubleType
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val h = period / 2
    val gc = keyCols.map(col)
    val s = df.select(gc ++ Seq(
        col(tickCol).cast(org.apache.spark.sql.types.LongType).as("__t"),
        col(valueCol).cast(org.apache.spark.sql.types.LongType).as("__v")): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val w = Window.partitionBy(gc: _*).orderBy(col("__t"))
      .rangeBetween(-h, h)
    val det = col("__v").cast(Dbl) -
      col("__sw").cast(Dbl) / col("__cw").cast(Dbl)
    s.withColumn("__sw", sum(col("__v")).over(w))
      .withColumn("__cw", count(lit(1)).over(w))
      .where(col("__cw") === (2L * h + 1L))
      .withColumn("__fx", graft.metrics.MetricColumns.fixedPointLong(det, fxScale))
      .groupBy(gc :+ pmod(col("__t"), lit(period.toLong)).as("phase"): _*)
      .agg(count(lit(1)).as("n"), sum(col("__fx").cast(D)).as("__sfx"))
      .select(gc ++ Seq(col("phase"), col("n"),
        col("__sfx").cast(org.apache.spark.sql.types.LongType).as("seasonal_fx"),
        (col("__sfx").cast(Dbl) / col("n").cast(Dbl) /
          lit(math.pow(10, fxScale))).as("seasonal")): _*)
  }

  /** Changepoint LOCALIZATION per key — the "WHERE did the mean shift"
    * companion to [[cusum]]'s "did it shift" alarms: single best split of
    * each key's ordered series by the normalized CUSUM scan statistic
    * stat(k) = |S_k·n − k·S_n| / (n·√(k(n−k))) — equivalently
    * |mean_left − mean_right|·√(k(n−k))/n, the binary-segmentation
    * objective (Scott & Knott 1974 / standard BinSeg first split).
    *
    * Exactness: the numerator is an EXACT DECIMAL(38,0) integer over
    * fixed-point values; stat is ONE fixed double tree, and the argmax
    * breaks ties on the SMALLER k — both replay in any engine. Same
    * bounded-series contract as [[cusum]]/mannKendall (calendar-sized
    * series per key; key-partitioned windows, no global sort).
    *
    * @return one row per key with n ≥ 2: (keys…, n, k_split, split_tick,
    *         stat, mean_left, mean_right) — the left segment is ticks
    *         1..k_split (split_tick = its last tick), means de-scaled.
    */
  def changepointSplit(df: DataFrame, partCols: Seq[String], orderCol: String,
                       valueCol: String, fxScale: Int = 2): DataFrame = {
    require(partCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val gc = partCols.map(col)
    val v = graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale)
    val rows = df.select(gc ++ Seq(col(orderCol).cast(org.apache.spark.sql.types.LongType)
        .as("__t"), v.as("__v")): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val wRun = Window.partitionBy(gc: _*).orderBy(col("__t"))
    val wAll = Window.partitionBy(gc: _*)
    val kD = col("__k").cast(org.apache.spark.sql.types.DoubleType)
    val nD = col("__n").cast(org.apache.spark.sql.types.DoubleType)
    val num = (col("__sk").cast(D) * col("__n") - col("__sn").cast(D) * col("__k"))
    val stat = abs(num).cast(org.apache.spark.sql.types.DoubleType) /
      (nD * sqrt(kD * (nD - kD)))
    val deScale = lit(math.pow(10, fxScale))
    val cands = rows
      .withColumn("__k", row_number().over(wRun).cast(org.apache.spark.sql.types.LongType))
      .withColumn("__sk", sum(col("__v")).over(
        wRun.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sn", sum(col("__v")).over(wAll))
      .where(col("__k") < col("__n")) // splits 1..n−1
      .withColumn("__stat", stat)
    cands
      .groupBy(gc: _*)
      .agg(max(struct(col("__stat"), (-col("__k")).as("__negk"), col("__k"),
        col("__t"), col("__sk"), col("__n"), col("__sn"))).as("__best"))
      .select(gc ++ Seq(
        col("__best.__n").as("n"),
        col("__best.__k").as("k_split"),
        col("__best.__t").as("split_tick"),
        col("__best.__stat").as("stat"),
        (col("__best.__sk").cast(org.apache.spark.sql.types.DoubleType) /
          col("__best.__k").cast(org.apache.spark.sql.types.DoubleType) / deScale)
          .as("mean_left"),
        ((col("__best.__sn") - col("__best.__sk"))
          .cast(org.apache.spark.sql.types.DoubleType) /
          (col("__best.__n") - col("__best.__k"))
            .cast(org.apache.spark.sql.types.DoubleType) / deScale)
          .as("mean_right")): _*)
  }

  /** Split-conformal interval calibration per key — the DISTRIBUTION-FREE
    * uncertainty wrapper for any point forecaster: on a calibration
    * window the ⌈(n+1)(1−α)⌉-th smallest |residual| becomes the band
    * half-width q̂, and on the evaluation window the band |y−ŷ| ≤ q̂ is
    * GUARANTEED ≥ 1−α coverage under exchangeability — no model, no
    * variance assumption (the guarantee [[forecastErrors]]' point scores
    * and a Gaussian ±kσ band both lack). The measured eval coverage is
    * the health check: far below 1−α means the residual distribution
    * shifted between windows.
    *
    * Exactness: |residuals| are exact longs, the conformal rank
    * threshold ⌈(n+1)·aNum/aDen⌉ is integer arithmetic, q̂ selects via
    * the group-bounded cumulative (the median machinery at an arbitrary
    * rank), and coverage counts are exact; one rollup + one window + one
    * broadcast join back.
    *
    * @param splitT rows with tick < splitT calibrate; the rest evaluate
    * @param aNum/aDen target coverage 1−α = aNum/aDen (e.g. 9/10)
    * @return one row per key seen in EITHER window: (keyCols*, n_cal,
    *         qhat, n_eval, covered, coverage) — qhat/coverage null when
    *         the calibration window is smaller than the conformal rank
    *         requires; n_cal = 0 with null qhat for keys never
    *         calibrated; n_eval = 0 for keys with no evaluation rows.
    */
  def conformalCoverage(df: DataFrame, keyCols: Seq[String], tickCol: String,
                        actualCol: String, predCol: String, splitT: Long,
                        aNum: Int = 9, aDen: Int = 10,
                        fxScale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(aNum > 0 && aNum < aDen, "need 0 < aNum/aDen < 1")
    import org.apache.spark.sql.expressions.Window
    val Dbl = org.apache.spark.sql.types.DoubleType
    val gc = keyCols.map(col)
    val s = df.select(gc ++ Seq(
        col(tickCol).cast(org.apache.spark.sql.types.LongType).as("__t"),
        graft.metrics.MetricColumns.fixedPointLong(col(actualCol).cast(Dbl), fxScale).as("__a"),
        graft.metrics.MetricColumns.fixedPointLong(col(predCol).cast(Dbl), fxScale).as("__p")): _*)
      .where(col("__t").isNotNull && col("__a").isNotNull && col("__p").isNotNull)
      .withColumn("__r", abs(col("__a") - col("__p")))
      .localCheckpoint(true) // serves the calibration rollup AND the eval pass
    val cal = s.where(col("__t") < splitT)
    val cells = cal.groupBy(gc :+ col("__r"): _*).agg(count(lit(1)).as("__c"))
    val wRun = Window.partitionBy(gc: _*).orderBy("__r")
    val wAll = Window.partitionBy(gc: _*)
    // conformal rank ⌈(n+1)·aNum/aDen⌉ = ((n+1)·aNum + aDen−1) div aDen
    val qhat = cells
      .withColumn("__k", sum(col("__c")).over(wRun))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__thr",
        expr(s"((__n + 1) * $aNum + ${aDen - 1}) div $aDen"))
      .groupBy(gc: _*).agg(max(col("__n")).as("n_cal"),
        min(when(col("__k") >= col("__thr"), col("__r"))).as("qhat"))
    // key universe is BOTH windows' keys: eval rows LEFT-join the
    // calibration frame (a key with no calibration window surfaces with
    // n_cal = 0 and null qhat/coverage — 'never calibrated'), and the
    // full join back resurfaces calibrated keys with no eval rows
    // (n_eval = 0) — callers can tell 'never calibrated' from 'covered'
    // instead of both silently vanishing. Both sides are key-bounded.
    val eval = s.where(col("__t") >= splitT)
      .join(broadcast(qhat), keyCols, "left")
      .groupBy(gc: _*).agg(
        count(lit(1)).as("n_eval"),
        sum(when(col("qhat").isNotNull && col("__r") <= col("qhat"), 1L)
          .otherwise(0L)).as("covered"))
    qhat.join(eval, keyCols, "full")
      .select(gc ++ Seq(coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        col("qhat"),
        coalesce(col("n_eval"), lit(0L)).as("n_eval"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        when(col("qhat").isNotNull && col("n_eval") > 0L,
          col("covered").cast(Dbl) / col("n_eval").cast(Dbl)).as("coverage")): _*)
  }

  /** Pinball (quantile) loss per key — [[forecastErrors]] scores a POINT
    * forecast; pinball scores a QUANTILE forecast (the metric that makes a
    * p90 capacity forecast honest: under-prediction of the true value
    * costs q, over-prediction costs 1−q). Loss = mean of
    * q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺ with q = qNum/qDen.
    *
    * Exactness: with integer fixed-point y/ŷ and a RATIONAL q, the
    * per-row term qNum·(y−ŷ)⁺ + (qDen−qNum)·(ŷ−y)⁺ is an exact long, the
    * sum an exact DECIMAL(38,0), and the mean ONE fixed double tree
    * dividing by qDen·n. One grouped aggregate, no window.
    *
    * @return per key: (keyCols*, n, sum_q (exact, in fx·qDen units),
    *         pinball).
    */
  def pinballLoss(df: DataFrame, keyCols: Seq[String], actualCol: String,
                  predCol: String, qNum: Int, qDen: Int,
                  fxScale: Int = 2): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(qNum > 0 && qNum < qDen, "need 0 < qNum/qDen < 1")
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val Dbl = org.apache.spark.sql.types.DoubleType
    val gc = keyCols.map(col)
    val s = df.select(gc ++ Seq(
        graft.metrics.MetricColumns.fixedPointLong(col(actualCol).cast(Dbl), fxScale).as("__a"),
        graft.metrics.MetricColumns.fixedPointLong(col(predCol).cast(Dbl), fxScale).as("__p")): _*)
      .where(col("__a").isNotNull && col("__p").isNotNull)
    val under = greatest(col("__a") - col("__p"), lit(0L))
    val over = greatest(col("__p") - col("__a"), lit(0L))
    val term = lit(qNum.toLong) * under + lit((qDen - qNum).toLong) * over
    s.groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), sum(term.cast(D)).as("__sq"))
      .select(gc ++ Seq(col("n"), col("__sq").cast(Dbl).as("sum_q"),
        (col("__sq").cast(Dbl) / lit(qDen.toDouble) / col("n").cast(Dbl) /
          lit(math.pow(10, fxScale))).as("pinball")): _*)
  }
}
