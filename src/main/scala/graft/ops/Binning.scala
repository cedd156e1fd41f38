package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Equi-DEPTH binning (feature discretization / quantile bucketing): cut an
  * integer-valued column into `k` buckets of ~equal row count — the
  * complement of the scan's equi-WIDTH histogram, and the right
  * discretization for skewed domains where equi-width piles everything
  * into one bucket.
  *
  * Definition (exact, engine-portable, tie-stable): over the per-distinct-
  * value counts, a value with inclusive cumulative count `cum` of `n` total
  * rows lands in bin `((cum − 1) · k) div n` — pure integer arithmetic, so
  * any engine reproduces identical bins; equal values always share a bin
  * (their bin is decided by their last row's position). Built-in
  * `percentile_disc` is deliberately NOT used: Spark's SQL-standard
  * `ceil(n·p)−1` index and DuckDB's `floor((n−1)·p)` disagree whenever
  * frac(n·p) < p, so boundaries would drift cross-engine.
  *
  * Scale shape: one groupBy(value) shuffle (map-side combined), then the
  * cumulative count, ROUTED by measured distinct cardinality (the
  * `jaccardPairsAuto` measure-then-route discipline): up to
  * `maxLocalDistinct` values a single-partition running sum over the tiny
  * (v, c) frame is cheapest; past it — price-like domains where distinct ≈
  * rows — the cumulative goes through [[Packing.prefixSum]]'s two-phase
  * DISTRIBUTED scan (range partition → driver-cumulated partition totals →
  * per-partition window), so no value cardinality ever funnels through one
  * partition. Both routes compute the same unique prefix sums (route
  * equivalence is spec-asserted). Quantize continuous domains to
  * fixed-point longs first — that also keeps the arithmetic exact.
  */
object Binning {

  /** @param valueCol integer-valued column (cast/quantize continuous values
    *                 to fixed-point longs first); NULLs are excluded
    * @param maxLocalDistinct route threshold: counts frames at or under it
    *                         take the single-partition running sum (1M tiny
    *                         rows ≈ one cheap task), larger ones the
    *                         distributed prefix sum
    * @return (bin, n_rows, v_min, v_max) per non-empty bin, bins 0..k-1
    */
  /** Per-distinct-value counts with INCLUSIVE cumulative count, routed by
    * measured distinct cardinality (local running sum vs the two-phase
    * distributed prefix scan) — shared by [[equiDepthBins]] and
    * [[valueRanks]].
    */
  private[ops] def distinctValueCounts(df: DataFrame, valueCol: Column): DataFrame =
    df.select(valueCol.cast(LongType).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))

  /** The route itself, over a pre-built (v, c) counts frame whose distinct
    * cardinality the caller already measured — lets callers that need extra
    * scalar aggregates over the counts (e.g. [[Outliers
    * .exactPercentilesRouted]]) persist the frame and fuse their actions. */
  private[ops] def cumulativeFromCounts(counts: DataFrame, distinct: Long,
                                        maxLocalDistinct: Long): DataFrame =
    cumulativesFromCounts(counts, "v", Seq(col("c") -> "cum"),
      distinct, maxLocalDistinct)

  /** The routed bounded-cumulative pattern as a SHARED helper, generalized
    * to several counters over one ascending key (negate the key for a
    * descending cumulative): under `maxLocalDistinct` measured distinct
    * keys the cheap single-task local window; over it the two-phase
    * distributed prefix scan ([[Packing.prefixSumsInclusive]] — one frozen
    * range partitioning + driver offsets, nothing single-partition). Keys
    * must be unique (a rollup's group key). Serves the Binning family,
    * [[LinearProbe.prCurve]] and [[Events.logRank]].
    */
  private[ops] def cumulativesFromCounts(counts: DataFrame, orderCol: String,
                                         cols: Seq[(Column, String)],
                                         distinct: Long,
                                         maxLocalDistinct: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (distinct <= maxLocalDistinct) {
      val w = Window.orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, 0)
      cols.foldLeft(counts) { case (d, (c, out)) =>
        d.withColumn(out, sum(c).over(w))
      }
    } else Packing.prefixSumsInclusive(counts, orderCol, cols)
  }

  /** THE materialize-once policy for skinny measure-then-reuse frames —
    * every count-then-route site goes through here so the storage decision
    * is made (and documented) exactly once.
    *
    * Why: shuffle outputs are NOT reused across separate actions (each
    * action builds a fresh physical plan), so a routing `count()` would
    * re-run the caller's base scan+shuffle a second time inside the main
    * query (measured ~0.3–0.5 s per spine query at sf0.1; r16 plan dumps:
    * q_bins 25 → 16 operators). A LAZY `localCheckpoint(false)` makes the
    * count() materialize the frame once; the main query reads the stored
    * blocks.
    *
    * Why localCheckpoint and not persist(MEMORY_AND_DISK)+count (the
    * lineage-keeping alternative): these helpers RETURN a lazy frame the
    * caller executes later, so there is no correct unpersist point — a
    * persist here would pin an entry in CacheManager for the session's
    * life (365-query bench = unbounded growth; contrast
    * [[Outliers.exactPercentilesRouted]], which consumes all actions
    * internally and unpersists in `finally`). Checkpoint blocks are
    * GC-cleaned with the frame by the ContextCleaner.
    *
    * The priced trade (guide §5, ADVICE r16): checkpoint blocks are
    * non-replicated executor state AND lineage is truncated, so one lost
    * executor (spot kill, dynamic-allocation scale-down) fails the query
    * instead of recomputing — acceptable HERE because the frames are
    * skinny distinct-bounded rollups (bytes ≈ the shuffle files the second
    * execution would have written anyway) and the whole query simply
    * re-runs on failure; it is NOT a pattern for wide/expensive frames on
    * preemptible clusters.
    *
    * @return (materialized frame, its row count) — the count every caller
    *         routes on, taken from the same single materialization.
    */
  private[ops] def materializeOnce(df: DataFrame): (DataFrame, Long) = {
    val ck = df.localCheckpoint(false)
    (ck, ck.count())
  }

  private[ops] def cumulativeCounts(df: DataFrame, valueCol: Column,
                                    maxLocalDistinct: Long): DataFrame = {
    val (counts, distinct) = materializeOnce(distinctValueCounts(df, valueCol))
    cumulativeFromCounts(counts, distinct, maxLocalDistinct)
  }

  def equiDepthBins(df: DataFrame, valueCol: Column, k: Int,
                    maxLocalDistinct: Long = 1L << 20): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cum = cumulativeCounts(df, valueCol, maxLocalDistinct)
    val total = broadcast(cum.agg(sum("c").as("n")))
    cum.crossJoin(total)
      .withColumn("bin", expr(s"((cum - 1) * ${k}L) div n"))
      .groupBy("bin")
      .agg(sum("c").cast(LongType).as("n_rows"), min("v").as("v_min"), max("v").as("v_max"))
  }

  /** Exact empirical-CDF table per distinct value: (v, c, cum_lt, cum_le,
    * pct_below, cdf) — the corpus-relative score normalizer ("this quality
    * score is in the 93rd percentile"), the calibration step before mixing
    * heterogeneous quality signals. `pct_below` = strict fraction below,
    * `cdf` = inclusive fraction ≤ v; both one division of exact longs.
    *
    * Same scale shape as [[equiDepthBins]]: one value shuffle + the
    * cardinality-routed cumulative — no global row window ever; attach to
    * rows with [[withPercentileRank]] (skinny value join,
    * AQE-broadcastable).
    */
  def valueRanks(df: DataFrame, valueCol: Column,
                 maxLocalDistinct: Long = 1L << 20): DataFrame = {
    val cum = cumulativeCounts(df, valueCol, maxLocalDistinct)
    val total = broadcast(cum.agg(sum("c").as("n")))
    cum.crossJoin(total)
      .select(col("v"), col("c").cast(LongType).as("c"),
        (col("cum") - col("c")).cast(LongType).as("cum_lt"),
        col("cum").cast(LongType).as("cum_le"),
        ((col("cum") - col("c")).cast("double") / col("n").cast("double")).as("pct_below"),
        (col("cum").cast("double") / col("n").cast("double")).as("cdf"))
  }

  /** EXACT z-score standardization: adds `<col>_z` = (x − μ)/σ_pop — the
    * other standard feature normalizer next to [[valueRanks]]'s rank
    * normalization (ranks are robust; z-scores preserve distances).
    * Values quantize to scale-`scale` longs, every moment is an exact
    * decimal sum, and z = (x·n − s)/√(n·Σx² − s²) — ONE fixed double tree
    * over exact integers (the (x−μ)/σ algebra cleared of intermediate
    * divisions), so DuckDB replays the doubles bit-for-bit. Grouped:
    * per-group moment frame broadcast back (group-bounded aggregate, rows
    * never shuffle). NULL z when variance is 0 or the value is NULL.
    */
  def standardize(df: DataFrame, valueCol: String,
                  groupCols: Seq[String] = Nil, scale: Int = 2): DataFrame = {
    import graft.metrics.MetricColumns
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val base = df.withColumn("__fx", MetricColumns.fixedPointLong(col(valueCol), scale))
    val aggs = Seq(
      sum(when(col("__fx").isNotNull, 1L).otherwise(0L))
        .cast(DecimalType(38, 0)).as("__n"),
      sum(col("__fx").cast(DecimalType(38, 0))).as("__s")) ++
      MetricColumns.exactSumSqParts(col("__fx"), "__q")
    val moments =
      if (groupCols.isEmpty) base.agg(aggs.head, aggs.tail: _*)
      else base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val joined =
      if (groupCols.isEmpty) base.crossJoin(broadcast(moments))
      else base.join(broadcast(moments), groupCols)
    val num = (col("__fx").cast(DecimalType(38, 0)) * col("__n") - col("__s"))
      .cast(DoubleType)
    val den = (col("__n") * MetricColumns.sumsqTotal("__q") - col("__s") * col("__s"))
      .cast(DoubleType)
    joined
      .withColumn(s"${valueCol}_z", when(den > 0.0, num / sqrt(den)))
      .drop("__fx", "__n", "__s", "__q__sumsq_hi", "__q__sumsq_lo", "__q__sumsq_slow")
  }

  /** ROBUST scaling: `<col>_rz` = (x − median)/IQR — [[standardize]]'s
    * outlier-immune sibling (one wild value moves μ and σ; the median and
    * quartiles have 25-50% breakdown points). Fences come from
    * [[graft.ops.Outliers.exactPercentilesRouted]] — the cardinality-
    * routed counts cumulative, quantile_cont-exact, NO value multiset in
    * any single task — and return as literals, so the transform is a pure
    * row-local projection. Quantile interpolation on quantized longs
    * lands on exact halves, so the (x − med)/iqr double tree replays
    * bit-for-bit cross-engine. NULL when IQR is 0 or the value is NULL.
    */
  def robustScale(df: DataFrame, valueCol: String, scale: Int = 2,
                  maxLocalDistinct: Long = 1L << 20): DataFrame = {
    import graft.metrics.MetricColumns
    import org.apache.spark.sql.types.DoubleType
    val base = df.withColumn("__fx", MetricColumns.fixedPointLong(col(valueCol), scale))
    val Seq(q1, med, q3) = graft.ops.Outliers.exactPercentilesRouted(
      base, col("__fx"), Seq(0.25, 0.5, 0.75), maxLocalDistinct)
    val iqr = q3 - q1
    base
      .withColumn(s"${valueCol}_rz",
        if (iqr > 0.0) (col("__fx").cast(DoubleType) - lit(med)) / lit(iqr)
        else lit(null).cast(DoubleType))
      .drop("__fx")
  }

  /** WEIGHTED percentiles (inverted-CDF / left-continuous form): for each
    * p, the smallest value whose cumulative weight reaches p·W — the
    * importance-weighted fence the unweighted family can't express
    * (mixture-weighted length caps, importance-sampled quality
    * thresholds: "the token-weighted median document length" weights a
    * 10k-token doc 100× a 100-token one). With unit weights and the
    * inverted-CDF convention this is the classic type-1 quantile.
    *
    * Scale shape: [[distinctValueCounts]]-style (value, Σweight) frame +
    * the cardinality-routed cumulative — NO value multiset in any single
    * task; the p-selection is a tiny explode over the distinct-bounded
    * cumulative + one p-keyed min aggregate. Exactness: weights carry as
    * longs (quantize first), the only double op is the `cum ≥ p·W`
    * threshold compare — one fixed tree both engines replay identically.
    * Zero/negative/null weights are excluded (a zero-weight value is
    * invisible to a weighted quantile by definition).
    *
    * @return one row per p: (p, value, w_total), ordered by p.
    */
  def weightedPercentiles(df: DataFrame, valueCol: Column, weightCol: Column,
                          ps: Seq[Double],
                          maxLocalDistinct: Long = 1L << 20): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "bad percentiles")
    val (counts, distinct) = materializeOnce(df
      .select(valueCol.cast(LongType).as("v"), weightCol.cast(LongType).as("w"))
      .where(col("v").isNotNull && col("w").isNotNull && col("w") > 0L)
      .groupBy("v").agg(sum("w").as("c")))
    require(distinct > 0, "no rows with positive weight")
    val cum = cumulativeFromCounts(counts, distinct, maxLocalDistinct)
    val total = broadcast(counts.agg(sum("c").cast(LongType).as("w_total")))
    cum.crossJoin(total)
      .select(col("v"), col("cum"), col("w_total"),
        explode(typedlit(ps.sorted)).as("p"))
      .where(col("cum").cast(DoubleType) >=
        col("p") * col("w_total").cast(DoubleType))
      .groupBy("p")
      .agg(min("v").as("value"), max("w_total").as("w_total"))
      .orderBy("p")
  }

  /** Gini concentration coefficient of a non-negative mass column — "is
    * the corpus dominated by a few domains / the revenue by a few
    * customers?" in one [0, 1) number (0 = perfectly even, → 1 = one key
    * holds everything). Feed one row per key (aggregate per-key mass
    * first); G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted
    * masses, tie-stable by construction.
    *
    * NO global sort/rank window: runs of equal masses contribute
    * x·(c·r₀ + c(c+1)/2) to Σ i·xᵢ in closed form, so the whole statistic
    * rides the (mass, count) frame + the cardinality-routed cumulative
    * (r₀ = cum − c) — the [[equiDepthBins]] discipline. Every operand is
    * an exact DECIMAL(38,0) integer; ONE final double division.
    *
    * @return one row: (n_keys, total, gini); gini null when total = 0.
    */
  def giniCoefficient(df: DataFrame, valueCol: Column,
                      maxLocalDistinct: Long = 1L << 20): DataFrame = {
    val (counts, distinct) = materializeOnce(
      distinctValueCounts(df, valueCol).where(col("v") >= 0L))
    require(distinct > 0, "no non-negative masses")
    val cum = cumulativeFromCounts(counts, distinct, maxLocalDistinct)
    val dec = DecimalType(38, 0)
    val c = col("c").cast(dec); val v = col("v").cast(dec)
    val r0 = (col("cum") - col("c")).cast(dec)
    // 2·Σᵢ i·xᵢ carries the ×2 INSIDE the run term (2·c·r₀ + c(c+1)) so
    // every operand stays an exact decimal integer — no decimal division
    cum.agg(
        sum(c).cast(dec).as("n"),
        sum(v * c).as("sx"),
        sum(v * (lit(2) * c * r0 + c * (c + lit(1)))).as("six2"))
      .select(
        col("n").cast(LongType).as("n_keys"),
        col("sx").cast(LongType).as("total"),
        when(col("sx") > 0,
          (col("six2") - (col("n") + lit(1)) * col("sx")).cast(DoubleType) /
            (col("n") * col("sx")).cast(DoubleType)).as("gini"))
  }

  /** Per-GROUP [[giniCoefficient]]: concentration per segment — "which
    * language's corpus is dominated by a few domains", "which region's
    * revenue by a few customers". Group-bounded running-sum windows
    * replace the routed global cumulative (no funnel exists to avoid);
    * the same closed-form run terms, exact decimals, one double division
    * per group.
    */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(groupCol).as("g"), valueCol.cast(LongType).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull && col("v") >= 0L)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
    val wRun = Window.partitionBy("g").orderBy("v")
    val dec = DecimalType(38, 0)
    val c = col("c").cast(dec); val v = col("v").cast(dec)
    val r0 = (col("cum") - col("c")).cast(dec)
    counts
      .withColumn("cum", sum(col("c")).over(wRun))
      .groupBy(col("g").as(groupCol))
      .agg(
        sum(c).cast(dec).as("n"),
        sum(v * c).as("sx"),
        sum(v * (lit(2) * c * r0 + c * (c + lit(1)))).as("six2"))
      .select(col(groupCol),
        col("n").cast(LongType).as("n_keys"),
        col("sx").cast(LongType).as("total"),
        when(col("sx") > 0,
          (col("six2") - (col("n") + lit(1)) * col("sx")).cast(DoubleType) /
            (col("n") * col("sx")).cast(DoubleType)).as("gini"))
  }

  /** QUANTILE normalization: map each value onto the REFERENCE
    * distribution's value at the same CDF position (inverted-CDF form:
    * the smallest reference value whose cdf reaches the current value's
    * cdf) — the cross-distribution aligner ("express this shard's quality
    * scores in the reference shard's units") used when two scorers /
    * snapshots / sensors must be made comparable rank-for-rank.
    *
    * EXACT: both sides reduce to (value, inclusive-count) frames via the
    * cardinality-routed cumulative; the cdf comparison cross-multiplies
    * to integer positions (cum_cur·N_ref ≤ cum_ref·N_cur — no double
    * ever), and the forward as-of attach rides [[graft.ops.Joins.asOf]]
    * over the two DISTINCT-BOUNDED rank maps (the cheap-single-task
    * regime the route threshold governs). Rows join their normalized
    * value back by VALUE (AQE-broadcastable skinny map). NULL values stay
    * NULL.
    *
    * @return df + `<valueCol>_qnorm` (a reference-domain value).
    */
  def quantileNormalize(df: DataFrame, valueCol: String, ref: DataFrame,
                        refValueCol: String,
                        maxLocalDistinct: Long = 1L << 20): DataFrame = {
    // both rank maps feed two consumers each (the N aggregate + the
    // as-of); eagerly localCheckpoint the skinny distinct-bounded frames
    // so the base tables scan once (1.40 → 1.20 s at sf0.1) — checkpoint
    // blocks are ContextCleaner-freed once unreachable, unlike a persist
    // with no matching unpersist
    val cur = valueRanks(df, col(valueCol), maxLocalDistinct)
      .select(col("v"), col("cum_le"))
      .localCheckpoint(true)
    val refR = valueRanks(ref, col(refValueCol), maxLocalDistinct)
      .select(col("v").as("ref_v"), col("cum_le").as("ref_cum"))
      .localCheckpoint(true)
    val nCur = broadcast(cur.agg(max("cum_le").as("n_cur")))
    val nRef = broadcast(refR.agg(max("ref_cum").as("n_ref")))
    val curK = cur.crossJoin(nRef)
      .select(col("v"), (col("cum_le") * col("n_ref")).as("pos"), lit(1).as("__k"))
    val refK = refR.crossJoin(nCur)
      .select(col("ref_v"), (col("ref_cum") * col("n_cur")).as("ref_pos"),
        lit(1).as("__k"))
    val mapped = Joins.asOf(curK, refK, Seq("__k"), "pos", "ref_pos",
        Seq("ref_v"), forward = true)
      .select(col("v").as("__qn_v"), col("asof_ref_v").as(s"${valueCol}_qnorm"))
    df.join(mapped, col(valueCol).cast(LongType) === col("__qn_v"), "left")
      .drop("__qn_v")
  }

  /** Attach [[valueRanks]]'s normalization to the rows themselves: the
    * original frame plus (pct_below, cdf) for `valueCol`. */
  def withPercentileRank(df: DataFrame, valueCol: Column,
                         maxLocalDistinct: Long = 1L << 20): DataFrame = {
    val ranks = valueRanks(df, valueCol, maxLocalDistinct)
      .select(col("v").as("__rank_v"), col("pct_below"), col("cdf"))
    df.join(ranks, valueCol.cast(LongType) === col("__rank_v"), "left")
      .drop("__rank_v")
  }
}
