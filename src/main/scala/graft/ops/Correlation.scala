package graft.ops

import graft.metrics.MetricColumns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact Pearson correlation for column PAIRS in one scan pass — the
  * cross-column profiling layer past the reference's per-column stats
  * ("does discount track tax?", "is length correlated with quality?").
  *
  * The builtin `corr` accumulates floating-point co-moments in partition
  * order — nondeterministic across layouts and engines. Here every moment
  * (n, Σx, Σy, Σx², Σy², Σxy) is an EXACT integer over fixed-point longs —
  * squares/products via the hi/lo-split partial sums of the scan pass
  * ([[MetricColumns.exactSumSqParts]] / `exactSumProdParts`, signed-safe) —
  * and r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) is derived from
  * those integers with one fixed double expression tree: any engine, any
  * partitioning, same bits.
  *
  * ALL pairs ride ONE aggregate (single scan, 1-row exchange). Rows where
  * either side is NULL are excluded per pair. Zero variance ⇒ NULL r.
  */
object Correlation {

  /** @param pairs  (xCol, yCol) pairs; outputs one row per pair, in input
    *               order under the `pair` label "x~y"
    * @param scale  fixed-point decimal places (see
    *               [[MetricColumns.fixedPointLong]]); inputs must be decimal
    *               at ≤ scale places for exactness
    */
  /** The pair's co-moment aggregates over two pre-projected fixed-point
    * longs, aliased under `tag` — usable inside ANY aggregate (the Scanner
    * appends these to its pass-1 aggregation so a scan's correlation
    * matrix rides the single scan pass).
    */
  private[graft] def pairAggs(xFx: Column, yFx: Column, tag: String): Seq[Column] = {
    val both = xFx.isNotNull && yFx.isNotNull
    val x = when(both, xFx)
    val y = when(both, yFx)
    Seq(
      count(when(both, lit(1))).as(s"n_$tag"),
      sum(x.cast(DecimalType(38, 0))).as(s"sx_$tag"),
      sum(y.cast(DecimalType(38, 0))).as(s"sy_$tag")) ++
      MetricColumns.exactSumSqParts(x, s"xx_$tag") ++
      MetricColumns.exactSumSqParts(y, s"yy_$tag") ++
      MetricColumns.exactSumProdParts(x, y, s"xy_$tag")
  }

  /** r derived from [[pairAggs]]'s row — every term an exact integer; the
    * double tree is fixed: cast each exact co-moment once, then
    * num / (sqrt(dx) · sqrt(dy)). NULL when either variance is zero.
    */
  private[graft] def pairCorr(tag: String): Column = {
    val n = col(s"n_$tag").cast(DecimalType(38, 0))
    val sx = col(s"sx_$tag"); val sy = col(s"sy_$tag")
    val sxx = MetricColumns.sumsqTotal(s"xx_$tag")
    val syy = MetricColumns.sumsqTotal(s"yy_$tag")
    val sxy = MetricColumns.sumprodTotal(s"xy_$tag")
    val num = (n * sxy - sx * sy).cast(DoubleType)
    val dx = (n * sxx - sx * sx).cast(DoubleType)
    val dy = (n * syy - sy * sy).cast(DoubleType)
    when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy)))
  }

  /** Per-group least-squares trend y = intercept + slope·x from the same
    * EXACT integer co-moments as [[corrPairs]] — the drift-direction signal
    * ("is latency/price/quality trending up, per segment?") with
    * cross-engine bit-exact outputs. One groupBy aggregate; slope =
    * (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and the intercept derive from decimal-exact
    * sums via one fixed double tree. Both columns share `scale`, so the
    * slope is already in original y-per-x units; the intercept is
    * de-scaled by 10^scale. NULL slope/intercept when x has zero variance.
    */
  def trendByGroup(df: DataFrame, groupCols: Seq[String], xCol: String,
                   yCol: String, scale: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val base = df.select(groupCols.map(col) ++ Seq(
      MetricColumns.fixedPointLong(col(xCol), scale).as("__fx_x"),
      MetricColumns.fixedPointLong(col(yCol), scale).as("__fx_y")): _*)
    val aggs = pairAggs(col("__fx_x"), col("__fx_y"), "t")
    val g = base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val n = col("n_t").cast(DecimalType(38, 0))
    val sx = col("sx_t"); val sy = col("sy_t")
    val sxx = MetricColumns.sumsqTotal("xx_t")
    val sxy = MetricColumns.sumprodTotal("xy_t")
    val num = (n * sxy - sx * sy).cast(DoubleType)
    val den = (n * sxx - sx * sx).cast(DoubleType)
    val deScale = lit(math.pow(10, scale))
    g.select(groupCols.map(col) ++ Seq(
      col("n_t").as("n"),
      when(den > 0.0, num / den).as("slope"),
      when(den > 0.0,
        (sy.cast(DoubleType) - num / den * sx.cast(DoubleType)) /
          col("n_t").cast(DoubleType) / deScale).as("intercept")): _*)
  }

  /** Per-group Theil–Sen ROBUST trend (Sen 1968): slope = the exact MEDIAN
    * of all pairwise slopes (y_j−y_i)/(x_j−x_i) over x_i < x_j, intercept
    * = median(y_i − slope·x_i) — the ~29%-breakdown complement of
    * [[trendByGroup]]'s OLS (one corrupted day can steer a least-squares
    * slope arbitrarily; it moves a slope MEDIAN not at all). The monitoring
    * trend you want on real telemetry, where ingestion hiccups ARE the
    * outliers you're trending through.
    *
    * CONTRACT: pairwise enumeration is O(n²) per group — feed GROUP-BOUNDED
    * frames (the daily/hourly rollups this family trends), enforced against
    * `maxGroupRows` with one cheap count aggregate (measure, don't guess).
    * Groups spread across the cluster; within a group the pair join and
    * both median windows are group-local. The default cap of 20 000 rows
    * admits ≤ 2×10⁸ pair rows in one group's partitions (~3 GB of skinny
    * slope rows) — already generous; raise it EXPLICITLY only when you've
    * priced the O(n²) blow-up (100 k rows would mean 5×10⁹ pairs through a
    * single group — the §3 cartesian cliff this require() exists to stop).
    *
    * Cross-engine exactness: x and y quantize to scale-`scale` longs; each
    * pair slope is ONE double division of exact longs; the median is the
    * explicit rank rule (avg of ranks ⌈n/2⌉ and ⌊n/2⌋+1 — the same two
    * IEEE ops in the oracle SQL, never an engine's interpolation choice);
    * residuals are y − slope·x in doubles, same tree both sides. Groups
    * with < 2 distinct x yield NULL slope/intercept.
    *
    * @return one row per group: (groupCols…, n (points), n_slopes, slope,
    *         intercept).
    */
  def theilSenByGroup(df: DataFrame, groupCols: Seq[String], xCol: String,
                      yCol: String, scale: Int = 2,
                      maxGroupRows: Long = 20000L): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(groupCols.map(col) ++ Seq(
        MetricColumns.fixedPointLong(col(xCol), scale).as("__x"),
        MetricColumns.fixedPointLong(col(yCol), scale).as("__y")): _*)
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // read by the guard, the pair join (×2) and the residual pass
    val hottest = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n")).agg(max("n")).collect()(0)
    val maxN = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
    require(maxN <= maxGroupRows,
      s"theilSenByGroup: largest group has $maxN rows (> $maxGroupRows) — " +
        "pairwise slopes are O(n²); roll the series up (daily/hourly) first")
    val counts = base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("n"))
    def side(tag: String) = base.select(
      groupCols.map(col) ++ Seq(col("__x").as(s"__x$tag"), col("__y").as(s"__y$tag")): _*)
    val slopes = side("a").join(side("b"), groupCols)
      .where(col("__xa") < col("__xb"))
      .select(groupCols.map(col) :+
        ((col("__yb") - col("__ya")).cast(DoubleType) /
          (col("__xb") - col("__xa")).cast(DoubleType)).as("__s"): _*)
    // explicit rank-rule median: avg of the lower/upper middle ranks — the
    // association both engines replay verbatim (never median()'s
    // engine-specific interpolation)
    def medianOf(in: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
      val wc = Window.partitionBy(groupCols.map(col): _*)
      // NB Spark's `/` on longs is DOUBLE division — the rank rule needs
      // integer div or the lower middle of an even count never matches
      in.withColumn("__rn", row_number().over(w).cast(LongType))
        .withColumn("__cnt", count(lit(1)).over(wc))
        .where(col("__rn") === floor((col("__cnt") + 1L) / 2L).cast(LongType) ||
          col("__rn") === floor(col("__cnt") / 2L).cast(LongType) + 1L)
        .groupBy(groupCols.map(col): _*)
        .agg(avg(col(valueCol)).as(out), count(lit(1)).as(s"__k_$out"))
        .drop(s"__k_$out")
    }
    val slopeMed = medianOf(slopes, "__s", "slope")
    val slopeCnt = slopes.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("n_slopes"))
    val deScale = lit(math.pow(10, scale))
    val resid = base.join(slopeMed, groupCols)
      .select(groupCols.map(col) :+
        (col("__y").cast(DoubleType) - col("slope") * col("__x").cast(DoubleType)).as("__r"): _*)
    val interMed = medianOf(resid, "__r", "__i")
    counts
      .join(slopeCnt, groupCols, "left")
      .join(slopeMed, groupCols, "left")
      .join(interMed, groupCols, "left")
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        coalesce(col("n_slopes"), lit(0L)).as("n_slopes"),
        col("slope"),
        (col("__i") / deScale).as("intercept")): _*)
  }

  /** Autocorrelation function per group at lags 1..maxLag — the
    * seasonality/persistence detector over monitoring series ("does
    * today's volume predict tomorrow's; is there a weekly cycle"), the
    * diagnostic that picks [[graft.ops.Outliers.holtWinters]]' season
    * length instead of guessing it. Each lag's coefficient is the exact
    * Pearson r over the (v_t, v_{t+k}) overlap pairs (the
    * gap-robust estimator: missing ticks shrink the overlap instead of
    * misaligning it — feed [[graft.ops.Windows.gapFill]] output for the
    * dense-grid variant).
    *
    * Exactness: same machinery as [[corrPairs]] — exact integer
    * co-moments via the hi/lo split, r from ONE fixed double tree. Shape:
    * the series explodes ×maxLag (lag is calendar-bounded), one
    * (group, tick) equi-join, one (group, lag) rollup; nothing driver-side.
    *
    * @param tCol integer tick (unique per group), vCol integer value —
    *             quantize via `MetricColumns.fixedPointLong` first.
    * @return one row per (group, lag) with overlap: (groups…, lag,
    *         n_pairs, acf).
    */
  def acf(df: DataFrame, groupCols: Seq[String], tCol: String, vCol: String,
          maxLag: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(maxLag >= 1, "maxLag must be >= 1")
    val gc = groupCols.map(col)
    val s = df.select(gc ++ Seq(
        col(tCol).cast(LongType).as("__t"), col(vCol).cast(LongType).as("__v")): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val left = s.select(gc ++ Seq(col("__t"), col("__v").as("x")): _*)
      .withColumn("lag", explode(typedlit((1 to maxLag).map(_.toLong))))
      .withColumn("__t2", col("__t") + col("lag"))
      .drop("__t")
    val right = s.select(gc ++ Seq(col("__t").as("__t2"), col("__v").as("y")): _*)
    val aggs = pairAggs(col("x"), col("y"), "acf")
    left.join(right, groupCols :+ "__t2")
      .groupBy(gc :+ col("lag"): _*).agg(aggs.head, aggs.tail: _*)
      .select(gc ++ Seq(col("lag"), col("n_acf").as("n_pairs"),
        pairCorr("acf").as("acf")): _*)
  }

  /** Partial autocorrelation function per group (Durbin–Levinson
    * recursion over the [[acf]] estimates) — the AR-ORDER picker [[acf]]
    * alone can't be: an AR(1) process has geometric acf at EVERY lag but
    * pacf cuts off after lag 1, so "how many autoregressive terms does
    * this metric actually have" reads directly off the pacf plot (the
    * Box–Jenkins identification step before fitting [[graft.ops
    * .Outliers.holt]]/holtWinters-class models).
    *
    * Shape: the acf frame collects to the driver — it is (groups ×
    * maxLag)-sized BY CONSTRUCTION (lags are calendar-bounded, groups are
    * the bounded monitoring dimensions — the funnel/cohort contract,
    * guarded by `maxRows`); the recursion is pure driver double
    * arithmetic (deterministic — fixed operation order), re-emitted as a
    * frame. Lags with no overlap pairs (gaps) truncate the recursion at
    * the first missing lag.
    *
    * @return one row per (group, lag ≤ deepest contiguous acf lag):
    *         (groups…, lag, pacf).
    */
  def pacf(df: DataFrame, groupCols: Seq[String], tCol: String,
           vCol: String, maxLag: Int, maxRows: Int = 100000): DataFrame = {
    val ac = acf(df, groupCols, tCol, vCol, maxLag)
    val rows = ac.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"pacf collects the acf frame: > $maxRows rows — reduce groups or maxLag")
    val k = groupCols.length
    val byGroup = rows.groupBy(r => (0 until k).map(r.get).toSeq)
    val out = byGroup.toSeq.flatMap { case (g, rs) =>
      val r = rs.flatMap { row =>
        val lag = row.getLong(k).toInt
        if (row.isNullAt(k + 2)) None else Some(lag -> row.getDouble(k + 2))
      }.toMap
      // deepest contiguous prefix 1..m of available acf lags
      val m = Iterator.from(1).takeWhile(l => l <= maxLag && r.contains(l))
        .foldLeft(0)((_, l) => l)
      if (m == 0) Seq.empty
      else {
        // Durbin–Levinson: phi(k,k) is the lag-k pacf; a zero prediction
        // error (|pacf| = 1 — perfectly predicted series) truncates the
        // recursion instead of dividing by zero
        val phi = Array.ofDim[Double](m + 1, m + 1)
        var err = 1.0
        val pacfs = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
        var kk = 1
        while (kk <= m && err > 0.0) {
          val num = r(kk) - (1 until kk).map(j => phi(kk - 1)(j) * r(kk - j)).sum
          val p = num / err
          phi(kk)(kk) = p
          for (j <- 1 until kk) phi(kk)(j) = phi(kk - 1)(j) - p * phi(kk - 1)(kk - j)
          err = err * (1.0 - p * p)
          pacfs += (kk.toLong -> p)
          kk += 1
        }
        // Seq[Any] — Seq(lag, p) would numerically WIDEN the Long lag to
        // Double and break the LongType field encoding
        pacfs.map { case (lag, p) =>
          org.apache.spark.sql.Row.fromSeq(g ++ Seq[Any](lag, p)) }
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      ac.schema.fields.take(k) ++ Seq(
        org.apache.spark.sql.types.StructField("lag",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("pacf",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out, 1), schema)
  }

  /** Cross-correlation function per group at lags −maxLag..maxLag — the
    * LEAD/LAG detector between two monitoring series ("does click volume
    * predict purchase revenue two days later; which signal moves first"),
    * [[acf]]'s two-variable sibling: ccf(k) = exact Pearson r over the
    * (x_t, y_{t+k}) overlap pairs. A peak at positive k means x LEADS y
    * by k ticks; at negative k, y leads x. ccf(0) = corrPairs on the
    * aligned series.
    *
    * Same exactness and shape as [[acf]]: integer co-moments via the
    * hi/lo split, r from ONE fixed double tree; the series explodes
    * ×(2·maxLag+1), one (group, tick) equi-join, one (group, lag) rollup;
    * gap-robust overlap pairs (missing ticks shrink the overlap, never
    * misalign it).
    *
    * @param tCol integer tick unique per group; xCol/yCol integer values —
    *             quantize via `MetricColumns.fixedPointLong` first.
    * @return one row per (group, lag) with overlap: (groups…, lag,
    *         n_pairs, ccf), lag ∈ [−maxLag, maxLag].
    */
  def ccf(df: DataFrame, groupCols: Seq[String], tCol: String,
          xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(maxLag >= 0, "maxLag must be >= 0")
    val gc = groupCols.map(col)
    val s = df.select(gc ++ Seq(
        col(tCol).cast(LongType).as("__t"),
        col(xCol).cast(LongType).as("__x"),
        col(yCol).cast(LongType).as("__y")): _*)
      .where(col("__t").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
    val left = s.select(gc ++ Seq(col("__t"), col("__x").as("x")): _*)
      .withColumn("lag", explode(typedlit((-maxLag to maxLag).map(_.toLong))))
      .withColumn("__t2", col("__t") + col("lag"))
      .drop("__t", "__x", "__y")
    val right = s.select(gc ++ Seq(col("__t").as("__t2"), col("__y").as("y")): _*)
    val aggs = pairAggs(col("x"), col("y"), "ccf")
    left.join(right, groupCols :+ "__t2")
      .groupBy(gc :+ col("lag"): _*).agg(aggs.head, aggs.tail: _*)
      .select(gc ++ Seq(col("lag"), col("n_ccf").as("n_pairs"),
        pairCorr("ccf").as("ccf")): _*)
  }

  /** Kendall τ-b rank correlation per group — the TIE-AWARE ordinal
    * association next to [[spearmanByGroup]] (τ's pair-concordance form is
    * the statistic [[mannKendall]]'s S already is against time; this is
    * the two-variable version: "do daily volume and daily revenue move
    * together"). τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)) with n₀ = n(n−1)/2 and
    * n₁/n₂ the x/y tie-pair counts.
    *
    * Exactness: C−D = Σ sgn(xⱼ−xᵢ)·sgn(yⱼ−yᵢ) and the tie-pair counts are
    * exact longs (tie counts come from value-rollups, never the pair
    * join); τ-b is ONE final double tree. Same BOUNDED-SERIES pair-join
    * contract as [[mannKendall]] (`tCol` is the unique-per-group tick).
    *
    * @return one row per group: (groups…, n, n_pairs, cd, tie_x_pairs,
    *         tie_y_pairs, tau_b) — cd = C−D; τ-b null when either side is
    *         all-ties.
    */
  def kendallTauB(df: DataFrame, groupCols: Seq[String], tCol: String,
                  xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val gc = groupCols.map(col)
    val s = df.select(gc ++ Seq(col(tCol).cast(LongType).as("__t"),
        col(xCol).cast(LongType).as("__x"), col(yCol).cast(LongType).as("__y")): _*)
      .where(col("__t").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // serves n, both tie rollups and the pair join
    val nG = s.groupBy(gc: _*).agg(count(lit(1)).as("n"))
    def tiePairs(c: String, out: String) =
      s.groupBy(gc :+ col(c): _*).agg(count(lit(1)).as("__c"))
        .groupBy(gc: _*)
        .agg(sum(col("__c") * (col("__c") - 1L)).as(out)) // doubled tie pairs
    val tx = tiePairs("__x", "tx2")
    val ty = tiePairs("__y", "ty2")
    val pairs = s.select(gc ++ Seq(col("__t").as("t1"),
        col("__x").as("x1"), col("__y").as("y1")): _*)
      .join(s.select(gc ++ Seq(col("__t").as("t2"),
        col("__x").as("x2"), col("__y").as("y2")): _*), groupCols)
      .where(col("t1") < col("t2"))
    val sgnX = when(col("x2") > col("x1"), 1L)
      .when(col("x2") < col("x1"), -1L).otherwise(0L)
    val sgnY = when(col("y2") > col("y1"), 1L)
      .when(col("y2") < col("y1"), -1L).otherwise(0L)
    val cdG = pairs.groupBy(gc: _*).agg(
      sum(sgnX * sgnY).as("cd"), count(lit(1)).as("n_pairs"))
    val out = nG.join(tx, groupCols).join(ty, groupCols)
      .join(cdG, groupCols, "left")
    // n0, n1, n2 carried DOUBLED (n(n−1), Σt(t−1)) so everything stays an
    // exact long; the halving cancels inside the square root's product:
    // (n0−n1)(n0−n2) = (n0₂−n1₂)(n0₂−n2₂)/4, and τ = 2·cd/√(…₂·…₂)·… —
    // written as one fixed tree below
    val n02 = col("n") * (col("n") - 1L)
    val dx2 = (n02 - col("tx2")).cast(DoubleType)
    val dy2 = (n02 - col("ty2")).cast(DoubleType)
    out.select(gc ++ Seq(col("n"), col("n_pairs"), col("cd"),
      expr("tx2 div 2").as("tie_x_pairs"), expr("ty2 div 2").as("tie_y_pairs"),
      when(dx2 > 0.0 && dy2 > 0.0,
        col("cd").cast(DoubleType) / (sqrt(dx2) * sqrt(dy2)) * lit(2.0))
        .as("tau_b")): _*)
  }

  /** Mann–Kendall monotonic-trend test + Sen's slope per group — the
    * ROBUST trend detector next to [[trendByGroup]]'s least squares (one
    * outlier day can flip an OLS slope; MK counts concordant/discordant
    * pairs and Sen's slope is the MEDIAN pairwise slope, both
    * outlier-immune — the standard monitoring pair for "is this metric
    * actually trending"). S = Σ sign(vⱼ−vᵢ) over i<j; tie-corrected
    * 18·Var(S) = n(n−1)(2n+5) − Σ t(t−1)(2t+5); z with the ±1 continuity
    * correction; Sen slope = median{(vⱼ−vᵢ)/(tⱼ−tᵢ)}.
    *
    * Contract: one observation per (group, tick) — the shape
    * [[graft.ops.Windows.gapFill]] or any time-rollup emits — with integer
    * ticks and integer values (quantize via `MetricColumns.fixedPointLong`
    * first), so S, the tie term and Var are EXACT integers. Pairs are
    * O(n²) per group: this is the BOUNDED-SERIES member (calendar-sized
    * ticks — a decade of dailies is 6.7M pairs), same contract as the
    * other per-group rank operators; the pair generation is a group-keyed
    * self-join, never a cross-partition explosion.
    *
    * Exactness: sign counts and tie terms are exact longs; each pairwise
    * slope is ONE double division of exact longs; the median picks the
    * middle element(s) of the sorted slope multiset (avg of the two
    * middles on even counts — one commutative double add + halving), so
    * no order-dependent summation exists anywhere; z is one final double
    * tree.
    *
    * @return one row per group: (groups…, n, n_pairs, s_stat, tie_term,
    *         var18, z, sen_slope) — z/sen null for single-tick groups or
    *         zero variance.
    */
  def mannKendall(df: DataFrame, groupCols: Seq[String], tCol: String,
                  vCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val s = df.select(gc ++ Seq(
        col(tCol).cast(LongType).as("__t"), col(vCol).cast(LongType).as("__v")): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
      .localCheckpoint(true) // one materialization serves n, ties and pairs
    val nG = s.groupBy(gc: _*).agg(count(lit(1)).as("n"))
    val tiesG = s.groupBy(gc :+ col("__v"): _*).agg(count(lit(1)).as("c"))
      .groupBy(gc: _*)
      .agg(sum(when(col("c") > 1L,
          col("c") * (col("c") - 1L) * (col("c") * 2L + 5L))
        .otherwise(0L)).as("tie_term"))
    val pairs = s.select(gc ++ Seq(col("__t").as("t1"), col("__v").as("v1")): _*)
      .join(s.select(gc ++ Seq(col("__t").as("t2"), col("__v").as("v2")): _*),
        groupCols)
      .where(col("t1") < col("t2"))
      .withColumn("sgn",
        when(col("v2") > col("v1"), 1L).when(col("v2") < col("v1"), -1L)
          .otherwise(0L))
      .withColumn("slope",
        (col("v2") - col("v1")).cast(DoubleType) /
          (col("t2") - col("t1")).cast(DoubleType))
    // deterministic total order for the median ranks (slope ties broken by
    // the pair's ticks — boundary-tied slopes are equal-valued, so the
    // selected multiset positions are order-unique anyway)
    val wOrd = Window.partitionBy(gc: _*).orderBy("slope", "t1", "t2")
    val wAll = Window.partitionBy(gc: _*)
    val ranked = pairs
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__p", count(lit(1)).over(wAll))
    val sG = ranked.groupBy(gc: _*).agg(
      sum(col("sgn")).as("s_stat"),
      max(col("__p")).as("n_pairs"),
      avg(when(col("__rn") === expr("(__p + 1) div 2") ||
               col("__rn") === expr("__p div 2 + 1"), col("slope")))
        .as("sen_slope"))
    val out = nG.join(tiesG, groupCols).join(sG, groupCols, "left")
    val var18 = (col("n") * (col("n") - 1L) * (col("n") * 2L + 5L) -
      col("tie_term")).as("var18")
    val sd = col("s_stat").cast(DoubleType)
    val sig = sqrt(col("var18").cast(DoubleType) / lit(18.0))
    out.select(gc ++ Seq(col("n"), col("n_pairs"), col("s_stat"),
      col("tie_term"), var18, col("sen_slope")): _*)
      .withColumn("z",
        when(col("var18") > 0L && col("s_stat") > 0L, (sd - 1.0) / sig)
          .when(col("var18") > 0L && col("s_stat") < 0L, (sd + 1.0) / sig)
          .when(col("var18") > 0L && col("s_stat") === 0L, lit(0.0)))
      .select(gc ++ Seq(col("n"), col("n_pairs"), col("s_stat"),
        col("tie_term"), col("var18"), col("z"), col("sen_slope")): _*)
  }

  /** Cramér's V association between CATEGORICAL column pairs — the
    * discrete counterpart of [[corrPairs]] ("does return flag depend on
    * line status?"). V = √(χ² / (n·min(r−1, c−1))) ∈ [0, 1].
    *
    * Shape per pair: one groupBy(a, b) shuffle to the contingency cells
    * (map-side combined; ≤ r·c rows survive), marginals via
    * category-bounded window sums over the CELL frame (partitions ≤ the
    * other side's cardinality — never a global window), then one 1-row
    * aggregate. Payload never moves; scales in n for bounded-cardinality
    * categoricals, which is what the statistic is for.
    *
    * Cross-engine exactness: χ² = n·(Σᵢⱼ oᵢⱼ²/(rᵢ·cⱼ) − 1) — each cell
    * term is one double division of exact longs (engine-exact), but the
    * SUM over cells is order-dependent in doubles, so each term goes
    * through the portable fixed-point long at scale 12 (terms ≤ 1, cell
    * counts < 9·10⁶ stay in range) and the longs sum order-free. The
    * derived χ²/V doubles then follow one fixed tree; quantization error
    * ≤ 5·10⁻¹³/cell is documented behavior, and `greatest(χ², 0)` guards
    * the independent-exact corner where it would dip epsilon-negative.
    */
  def cramersV(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one pair")
    import org.apache.spark.sql.expressions.Window
    val frames = pairs.map { case (a, b) =>
      val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__o"))
      val withTotals = cells
        .withColumn("__ra", sum(col("__o")).over(Window.partitionBy("__a")))
        .withColumn("__cb", sum(col("__o")).over(Window.partitionBy("__b")))
      val term = (col("__o") * col("__o")).cast(DoubleType) /
        (col("__ra") * col("__cb")).cast(DoubleType)
      val m = withTotals
        .select(col("__o"), col("__a"), col("__b"),
          MetricColumns.fixedPointLong(term, 12).as("__tfx"))
        .agg(
          sum(col("__o")).cast(LongType).as("n"),
          count_distinct(col("__a")).as("r_levels"),
          count_distinct(col("__b")).as("c_levels"),
          sum(col("__tfx")).cast(LongType).as("sfx"))
      val nd = col("n").cast(DoubleType)
      val chi2 = greatest(nd * (col("sfx").cast(DoubleType) / lit(1000000000000.0) - lit(1.0)), lit(0.0))
      val md = least(col("r_levels") - 1L, col("c_levels") - 1L).cast(DoubleType)
      m.select(
        lit(s"$a~$b").as("pair"), col("n"), col("r_levels"), col("c_levels"),
        chi2.as("chi2"),
        when(col("n") > 0L && md > 0.0, sqrt(chi2 / (nd * md))).as("cramers_v"))
    }
    frames.reduce(_.unionAll(_))
  }

  /** Cohen's kappa: chance-corrected agreement between two label columns —
    * the LABEL-QUALITY member of the categorical family ([[cramersV]] asks
    * "are these associated", kappa asks "do these two ANNOTATORS agree
    * beyond luck" — the standard inter-rater gate before trusting training
    * labels; raw p_o alone flatters skewed label sets where agreeing by
    * chance is easy). κ = (n·agree − Σₖrₖcₖ)/(n² − Σₖrₖcₖ).
    *
    * Shape: one groupBy(a, b) cell shuffle (map-side combined), marginals
    * as label-bounded re-aggregates, Σrₖcₖ as a label-keyed join of the
    * two marginal frames. EXACT throughout — counts and both κ operands
    * carry as DECIMAL(38,0) integers (no fixed-point quantization needed,
    * unlike χ²/MI whose per-cell terms are transcendental), with the final
    * p_o/p_e/κ doubles one fixed tree both engines replay bit-for-bit.
    *
    * @return one row: (n, agree, p_o, p_e, kappa); kappa null when chance
    *         agreement is exact (n² = Σrc — constant identical labels).
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // eager localCheckpoint (not persist): five consumers reuse the
    // materialized cell frame, and the ContextCleaner frees the blocks
    // once the frame is unreachable — no session-lifetime cache growth
    // across repeated calls (a persist here had no matching unpersist)
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint(true)
    val dec = DecimalType(38, 0)
    val n = cells.agg(coalesce(sum(col("__o")), lit(0L)).cast(dec).as("n"))
    val agree = cells.where(col("__a") === col("__b"))
      .agg(coalesce(sum(col("__o")), lit(0L)).cast(dec).as("agree"))
    val rows = cells.groupBy("__a").agg(sum(col("__o")).as("__r"))
    val cols = cells.groupBy("__b").agg(sum(col("__o")).as("__c"))
    val rc = rows.join(cols, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__r").cast(dec) * col("__c")), lit(0L).cast(dec))
        .as("rc"))
    val nn = col("n") * col("n")
    n.crossJoin(agree).crossJoin(rc)
      .select(
        col("n").cast(LongType).as("n"),
        col("agree").cast(LongType).as("agree"),
        when(col("n") > 0, col("agree").cast(DoubleType) / col("n").cast(DoubleType))
          .as("p_o"),
        when(col("n") > 0, col("rc").cast(DoubleType) / nn.cast(DoubleType))
          .as("p_e"),
        when(nn =!= col("rc"),
          (col("n") * col("agree") - col("rc")).cast(DoubleType) /
            (nn - col("rc")).cast(DoubleType)).as("kappa"))
  }

  /** Seasonal Mann–Kendall trend test (Hirsch & Slack 1984) — the
    * periodicity-immune member next to [[mannKendall]]: a weekly cycle
    * makes plain MK compare Mondays to Sundays and read the cycle as
    * "trend noise"; the seasonal form runs MK WITHIN each phase
    * (t mod period) and sums the S statistics and variances, so only
    * like-vs-like comparisons enter — the standard form for daily/
    * monthly operational series.
    *
    * Exactness: pure composition over [[mannKendall]]'s exact integers
    * (per-phase S, tie terms and var18 are longs; the z continuity tree
    * is the same fixed form). Pair work is Σ_phases n_m² instead of n² —
    * the seasonal split also CUTS the quadratic pair cost by ~period×.
    *
    * @return per group: (groupCols*, n, seasons, s_stat, var18, z).
    */
  def seasonalMannKendall(df: DataFrame, groupCols: Seq[String], tCol: String,
                          vCol: String, period: Int): DataFrame = {
    require(period >= 2, "need period >= 2")
    val withPhase = df.withColumn("__phase",
      pmod(col(tCol).cast(LongType), lit(period.toLong)))
    val per = mannKendall(withPhase, groupCols :+ "__phase", tCol, vCol)
    val agg = per.groupBy(groupCols.map(col): _*).agg(
      sum(col("n")).as("n"),
      count(lit(1)).as("seasons"),
      sum(coalesce(col("s_stat"), lit(0L))).as("s_stat"),
      sum(col("var18")).as("var18"))
    val sd = col("s_stat").cast(DoubleType)
    val sig = sqrt(col("var18").cast(DoubleType) / lit(18.0))
    agg.withColumn("z",
      when(col("var18") > 0L && col("s_stat") > 0L, (sd - 1.0) / sig)
        .when(col("var18") > 0L && col("s_stat") < 0L, (sd + 1.0) / sig)
        .when(col("var18") > 0L && col("s_stat") === 0L, lit(0.0)))
  }

  /** WEIGHTED Cohen's kappa for ORDINAL labels — [[cohensKappa]] scores a
    * 1-vs-2 disagreement the same as 1-vs-5; with integer ordinal levels
    * the weighted form charges each cell w_ij = |i−j| (linear) or (i−j)²
    * (quadratic, the psychometrics default that matches an ICC):
    * κ_w = 1 − n·Σw·o / Σw·r·c. The agreement gate for RATING-scale
    * labels (quality 1-5, priority tiers).
    *
    * Exactness: with integer levels the weights are exact integers, so
    * BOTH operands are exact DECIMAL(38,0) sums — observed Σw·o over the
    * cell frame, expected Σw·r·c over the level-bounded marginal cross
    * join — and κ_w is ONE fixed double tree. Same one-cell-shuffle shape
    * as the unweighted operator.
    *
    * @return one row: (n, w_obs, w_exp, kappa_w) — kappa_w null when the
    *         expected weighted disagreement is 0 (all mass on one level
    *         pair).
    */
  def weightedKappa(df: DataFrame, aCol: String, bCol: String,
                    quadratic: Boolean = true): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast(LongType).as("__a"),
        col(bCol).cast(LongType).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .localCheckpoint(true)
    def w(i: Column, j: Column): Column = {
      val d = abs(i - j).cast(dec)
      if (quadratic) d * d else d
    }
    val n = cells.agg(coalesce(sum(col("__o")), lit(0L)).cast(dec).as("n"))
    val obs = cells.agg(coalesce(sum(w(col("__a"), col("__b")) *
      col("__o").cast(dec)), lit(0L).cast(dec)).as("w_obs"))
    val rows = cells.groupBy("__a").agg(sum(col("__o")).as("__r"))
    val colsM = cells.groupBy("__b").agg(sum(col("__o")).as("__c"))
    val exp = rows.crossJoin(colsM)
      .agg(coalesce(sum(w(col("__a"), col("__b")) *
        (col("__r").cast(dec) * col("__c").cast(dec))), lit(0L).cast(dec))
        .as("w_exp"))
    n.crossJoin(obs).crossJoin(exp)
      .select(col("n").cast(LongType).as("n"),
        col("w_obs").cast(DoubleType).as("w_obs"),
        col("w_exp").cast(DoubleType).as("w_exp"),
        when(col("w_exp") > lit(0L).cast(dec),
          lit(1.0) - (col("n") * col("w_obs")).cast(DoubleType) /
            col("w_exp").cast(DoubleType)).as("kappa_w"))
  }

  /** Marginal entropies and mutual information for categorical pairs — the
    * information-theoretic sibling of [[cramersV]] ("how many bits does
    * knowing the source tell you about the language?"). Per pair:
    * H(A), H(B), I(A;B) = Σᵢⱼ (oᵢⱼ/n)·ln(oᵢⱼ·n/(rᵢ·cⱼ)), and
    * NMI = 2I/(H(A)+H(B)) ∈ [0, 1].
    *
    * Shape: ONE groupBy(a, b) cell shuffle per pair; marginals, totals and
    * all three term sums ride the bounded cell frame (window sums +
    * re-aggregates — the data is scanned once). Every ln term is quantized
    * through the portable fixed-point long (scale 9) and summed order-free;
    * the derived doubles follow one fixed tree, so H/I/NMI replay
    * cross-engine (sub-1e-9 quantization is documented behavior).
    */
  def mutualInfo(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one pair")
    import org.apache.spark.sql.expressions.Window
    val frames = pairs.map { case (a, b) =>
      val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("__o"))
      val nF = cells.agg(sum(col("__o")).cast(LongType).as("__n"))
      val nd = col("__n").cast(DoubleType)
      def hAgg(keyCol: String, alias: String) = {
        val rd = col("__r").cast(DoubleType)
        cells.groupBy(keyCol).agg(sum(col("__o")).as("__r"))
          .crossJoin(broadcast(nF))
          .select(MetricColumns.fixedPointLong(-(rd / nd) * log(rd / nd), 9).as("__t"))
          .agg(sum(col("__t")).cast(LongType).as(alias))
      }
      val withTot = cells
        .withColumn("__ra", sum(col("__o")).over(Window.partitionBy("__a")))
        .withColumn("__cb", sum(col("__o")).over(Window.partitionBy("__b")))
        .crossJoin(broadcast(nF))
      val od = col("__o").cast(DoubleType)
      val rad = col("__ra").cast(DoubleType); val cbd = col("__cb").cast(DoubleType)
      val miAgg = withTot
        .select(MetricColumns.fixedPointLong(
          (od / nd) * log((od * nd) / (rad * cbd)), 9).as("__t"))
        .agg(sum(col("__t")).cast(LongType).as("mi_fx"))
      val one = miAgg.crossJoin(hAgg("__a", "ha_fx")).crossJoin(hAgg("__b", "hb_fx"))
        .crossJoin(nF)
      val sc = lit(1000000000.0)
      val ha = col("ha_fx").cast(DoubleType) / sc
      val hb = col("hb_fx").cast(DoubleType) / sc
      val mi = col("mi_fx").cast(DoubleType) / sc
      one.select(
        lit(s"$a~$b").as("pair"), col("__n").as("n"),
        ha.as("h_a"), hb.as("h_b"), mi.as("mi"),
        when(ha + hb > 0.0, lit(2.0) * mi / (ha + hb)).as("nmi"))
    }
    frames.reduce(_.unionAll(_))
  }

  /** FULL Pearson correlation matrix over `cols` in ONE pass: the columns
    * assemble into a quantized long vector and [[graft.functions
    * .CovVectorAgg]] accumulates every marginal and upper-triangle product
    * sum in its mergeable d²-long state — one aggregate instead of
    * k(k−1)/2 per-pair aggregate sets, and the column-pair count never
    * touches the shuffle (O(d²) state per partition, nothing
    * row-proportional). Listwise-complete semantics: a row with ANY null
    * among `cols` is excluded from the whole matrix (unlike
    * [[corrPairs]]'s pairwise-complete counts — both are standard; the
    * matrix needs one consistent n to stay positive semidefinite).
    * r derives from the exact integer moments via the [[pairCorr]] fixed
    * double tree; NULL when either variance is zero.
    *
    * @return (col_a, col_b, n, corr) for every a < b pair.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val dim = cols.size
    val base = df
      .select(array(cols.map(c => MetricColumns.fixedPointLong(col(c), scale)): _*).as("q"))
      .where(!exists(col("q"), x => x.isNull))
    val st = base.agg(graft.functions.CovVector.cov(col("q"), dim).as("st"))
      .select(col("st.n").as("n"), col("st.hi").as("hi"), col("st.lo").as("lo"))
    // CovVectorAgg slot layout: marginal d at slot d; pair (d ≤ e) at slot
    // dim + d·dim − d(d−1)/2 + (e−d)
    def pairSlot(d: Int, e: Int): Int = dim + d * dim - d * (d - 1) / 2 + (e - d)
    val pairs = for { d <- 0 until dim; e <- d + 1 until dim } yield (d, e)
    def slotDec(idx: Column): Column =
      element_at(col("hi"), idx + 1).cast(DecimalType(38, 0)) * lit(2147483648L) +
        element_at(col("lo"), idx + 1)
    val nameA = typedLit(pairs.map(p => cols(p._1)))
    val nameB = typedLit(pairs.map(p => cols(p._2)))
    val sDE = typedLit(pairs.map { case (d, e) => pairSlot(d, e) })
    val sDD = typedLit(pairs.map { case (d, _) => pairSlot(d, d) })
    val sEE = typedLit(pairs.map { case (_, e) => pairSlot(e, e) })
    val mD = typedLit(pairs.map(_._1))
    val mE = typedLit(pairs.map(_._2))
    val i1 = col("i") + 1
    val nDec = col("n").cast(DecimalType(38, 0))
    val num = (nDec * slotDec(element_at(sDE, i1)) -
      slotDec(element_at(mD, i1)) * slotDec(element_at(mE, i1))).cast(DoubleType)
    val dx = (nDec * slotDec(element_at(sDD, i1)) -
      slotDec(element_at(mD, i1)) * slotDec(element_at(mD, i1))).cast(DoubleType)
    val dy = (nDec * slotDec(element_at(sEE, i1)) -
      slotDec(element_at(mE, i1)) * slotDec(element_at(mE, i1))).cast(DoubleType)
    st.select(col("n"), col("hi"), col("lo"),
        posexplode(typedLit(pairs.indices.toList)).as(Seq("i", "__x")))
      .select(
        element_at(nameA, i1).as("col_a"),
        element_at(nameB, i1).as("col_b"),
        col("n"),
        when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy))).as("corr"))
  }

  /** EXACT Spearman rank correlation: Pearson r over tie-averaged ranks —
    * the monotone-association measure that ignores the marginal scales
    * Pearson is hostage to (one heavy-tailed column wrecks r; ranks
    * don't care). Tie-averaged ranks are half-integers, so everything
    * carries as DOUBLED ranks (exact longs; Pearson is affine-invariant,
    * so r over doubled ranks IS r over ranks — and both engines compute
    * the identical double tree over the exact integer moments).
    *
    * Scale shape: per-column (value, count) aggregates + the cumulative
    * give each distinct value its doubled rank (2·cum_lt + c + 1); ranks
    * attach back by VALUE join (rank maps are distinct-bounded,
    * AQE-broadcastable) — rows never carry a global sort. Listwise: rows
    * with either side NULL are excluded.
    *
    * @return one row (n, rho); rho NULL when either side is constant.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               scale: Int = 2): DataFrame = {
    val base = df.select(
        MetricColumns.fixedPointLong(col(xCol), scale).as("__x"),
        MetricColumns.fixedPointLong(col(yCol), scale).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    def rankMap(c: String) = {
      // the Binning cardinality-routed cumulative: distinct-bounded counts
      // frames take the cheap local running sum, anything past
      // maxLocalDistinct the two-phase distributed prefix scan — and the
      // rank map only broadcasts when it measured small
      // materialize-once: the routing count() and the rank-attach read the
      // same skinny (v, c) frame — single materialization via the shared
      // policy helper (storage trade documented on Binning.materializeOnce)
      val (counts, distinct) =
        Binning.materializeOnce(Binning.distinctValueCounts(base, col(c)))
      val m = Binning.cumulativeFromCounts(counts, distinct, 1L << 20)
        .select(col("v"), ((col("cum") - col("c")) * 2L + col("c") + 1L).as(s"dr$c"))
      if (distinct <= (1L << 20)) broadcast(m) else m
    }
    val ranked = base
      .join(rankMap("__x"), base("__x") === col("v")).drop("v")
      .join(rankMap("__y"), base("__y") === col("v")).drop("v")
    val m = ranked.agg(pairAggs(col("dr__x"), col("dr__y"), "sp").head,
      pairAggs(col("dr__x"), col("dr__y"), "sp").tail: _*)
    m.select(col("n_sp").cast(LongType).as("n"), pairCorr("sp").as("rho"))
  }

  /** Per-GROUP [[spearman]]: monotone association per segment — "does
    * quality track length in EVERY language, or only in English?" Doubled
    * tie-averaged ranks feed the exact pairAggs machinery; groups where
    * either side is constant report NULL rho; listwise NULLs.
    *
    * MEASURED route (staged: the Catalyst size estimate gates for FREE —
    * small corpora route to windows with zero extra passes and zero
    * materialization; only a large corpus pays the checkpoint + the
    * group/cell sketch aggregate that prices the cells decision):
    *  - `groups >= minWindowGroups` (default 4× shuffle partitions): the
    *    one-exchange WINDOW route — 2·rank + t − 1 ≡ (cum−c)·2 + c + 1,
    *    both columns' rank windows share one exchange on g; with that many
    *    groups the in-partition sorts spread over the full cluster.
    *  - fewer groups over a LARGE corpus (the "3 segments over 600M rows"
    *    shape): the window exchange collapses the corpus onto `groups`
    *    tasks and sorts it FOUR times there — instead roll up to distinct
    *    (g, col, value) CELLS (one full-parallelism shuffle; both columns
    *    ride one rollup via a 2-way explode), run the group-bounded
    *    cumulative on the skinny cell frame (`groups`·2 window partitions
    *    of distinct values), and attach doubled ranks back by (g, value)
    *    join — broadcast while the measured cell count fits
    *    `maxBroadcastCells`, hash join past it. Rows never sit in a
    *    `groups`-task sort.
    *  - fewer groups over a SMALL corpus (under `minCellsRouteBytes`): the
    *    window route again — at sf0.1 (3 groups, 600k rows) the two extra
    *    rollup/attach jobs cost more than the collapsed sorts save
    *    (measured interleaved min-of-4: windows 3.1 s vs cells 3.6 s);
    *    the crossover belongs to row volume, not group count.
    *    Routes are parity-spec'd bit-identical against each other.
    *
    * @return one row per group: (groupCol, n, rho).
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String, scale: Int = 2,
                      minWindowGroups: Long = -1L,
                      maxBroadcastCells: Long = 1L << 20,
                      minCellsRouteBytes: Long = 1L << 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rawBase = df.select(col(groupCol).as("g"),
        MetricColumns.fixedPointLong(col(xCol), scale).as("__x"),
        MetricColumns.fixedPointLong(col(yCol), scale).as("__y"))
      .where(col("g").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
    val windowMin =
      if (minWindowGroups >= 0L) minWindowGroups
      else 4L * df.sparkSession.sessionState.conf.numShufflePartitions
    // STAGED measure: the Catalyst size estimate is FREE (no job) and the
    // route is a perf crossover, not a correctness decision — order of
    // magnitude suffices (~6-7 estimated bytes/row on the 3-long
    // projection; the 32 MB default ≈ 5M rows). A small corpus takes the
    // window route with no measure job and no checkpoint; only a large
    // corpus pays ONE checkpoint (shared by the sketch pass, the rollup
    // and both attach sides) + the sketch aggregate pricing the cells
    // decision.
    val sizeEst = rawBase.queryExecution.optimizedPlan.stats.sizeInBytes
    val small = sizeEst < BigInt(minCellsRouteBytes)
    var cellsMeasured = Long.MaxValue
    lazy val base = rawBase.localCheckpoint(true)
    val useWindows = small || {
      val m = base.agg(approx_count_distinct(col("g")).as("gs"),
        greatest(approx_count_distinct(struct(col("g"), col("__x"))),
          approx_count_distinct(struct(col("g"), col("__y")))).as("cells"))
        .collect()(0)
      cellsMeasured = m.getLong(1)
      m.getLong(0) >= windowMin
    }
    val ranked = if (useWindows) {
      def dr(c: String) =
        rank().over(Window.partitionBy("g").orderBy(c)).cast(LongType) * 2L +
          count(lit(1)).over(Window.partitionBy("g", c)) - 1L
      val src = if (small) rawBase else base
      src.withColumn("dr__x", dr("__x")).withColumn("dr__y", dr("__y"))
    } else {
      val cellCounts = base.select(col("g"), explode(array(
          struct(lit(0).as("__k"), col("__x").as("__v")),
          struct(lit(1).as("__k"), col("__y").as("__v")))).as("kv"))
        .select(col("g"), col("kv.__k").as("__k"), col("kv.__v").as("__v"))
        .groupBy("g", "__k", "__v").agg(count(lit(1)).as("__c"))
      // cells are distinct per (g, __k) partition, so the RANGE frame's
      // tie handling is moot: cum is the inclusive per-group running count
      val wRun = Window.partitionBy("g", "__k").orderBy("__v")
      val drCells = cellCounts.select(col("g"), col("__k"), col("__v"),
          ((sum(col("__c")).over(wRun) - col("__c")) * 2L + col("__c") + 1L).as("__dr"))
        .localCheckpoint(true) // ONE window pass serves both attach sides
      def side(k: Int, vAs: String, drAs: String) = {
        val s = drCells.where(col("__k") === k)
          .select(col("g"), col("__v").as(vAs), col("__dr").as(drAs))
        // derated ×0.9: cellsMeasured is approx_count_distinct (~5% rsd),
        // so an underestimate could broadcast a larger-than-intended frame —
        // absorb the sketch error instead of documenting it away (routes are
        // parity-tested bit-identical; this only moves the perf crossover)
        if (cellsMeasured <= maxBroadcastCells - maxBroadcastCells / 10) broadcast(s) else s
      }
      base.join(side(0, "__x", "dr__x"), Seq("g", "__x"))
        .join(side(1, "__y", "dr__y"), Seq("g", "__y"))
    }
    val aggs = pairAggs(col("dr__x"), col("dr__y"), "sp")
    ranked.groupBy(col("g").as(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), col("n_sp").cast(LongType).as("n"),
        pairCorr("sp").as("rho"))
  }

  def corrPairs(df: DataFrame, pairs: Seq[(String, String)], scale: Int = 2): DataFrame = {
    require(pairs.nonEmpty, "need at least one pair")
    val needed = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val base = df.select(needed.map(c =>
      MetricColumns.fixedPointLong(col(c), scale).as(s"__fx_$c")): _*)
    val aggs: Seq[Column] = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      pairAggs(col(s"__fx_$a"), col(s"__fx_$b"), i.toString)
    }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(
        lit(s"$a~$b").as("pair"),
        col(s"n_$i").as("n"),
        pairCorr(i.toString).as("corr"))
    }
    m.select(inline(array(rows: _*)))
  }

  /** Cook's-distance influence for the per-group OLS trend — WHICH points
    * drive [[trendByGroup]]'s slope ("one bad day steers the line"; Dᵢ
    * combines residual size with leverage, the regression-diagnostics
    * reading an outlier fence can't give). Top-K per group by
    * Dᵢ = eᵢ²hᵢ/(p·s²(1−hᵢ)²), p = 2.
    *
    * Exactness: ONE grouped aggregate produces the exact integer
    * co-moments; every per-point quantity (residual, leverage, D) is a
    * fixed tree over n-scaled centered forms — no float mean anywhere;
    * ranking (D desc, t asc) is total. The moment row joins back
    * broadcast (group-count-sized).
    *
    * @return top-K rows per group: (groupCols*, t, v, resid, leverage,
    *         cooks_d, rnk).
    */
  def olsInfluence(df: DataFrame, groupCols: Seq[String], tCol: String,
                   vCol: String, topK: Int = 3): DataFrame = {
    val D = DecimalType(38, 0)
    val keys = groupCols.map(col)
    val rows = df.select(keys :+ col(tCol).cast(LongType).as("__t") :+
        col(vCol).cast(LongType).as("__v"): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val m = rows.groupBy(keys: _*).agg(count(lit(1)).as("__n"),
      sum(col("__t").cast(D)).as("__sx"), sum(col("__v").cast(D)).as("__sy"),
      sum(col("__t").cast(D) * col("__t").cast(D)).as("__sxx"),
      sum(col("__t").cast(D) * col("__v").cast(D)).as("__sxy"),
      sum(col("__v").cast(D) * col("__v").cast(D)).as("__syy"))
    val j = rows.join(broadcast(m), groupCols)
    val nD = col("__n").cast(DoubleType)
    val cxx = (col("__n").cast(D) * col("__sxx") - col("__sx") * col("__sx")).cast(DoubleType)
    val cxy = (col("__n").cast(D) * col("__sxy") - col("__sx") * col("__sy")).cast(DoubleType)
    val cyy = (col("__n").cast(D) * col("__syy") - col("__sy") * col("__sy")).cast(DoubleType)
    val b = cxy / cxx
    val dtN = nD * col("__t").cast(DoubleType) - col("__sx").cast(DoubleType)
    val e = (nD * col("__v").cast(DoubleType) - col("__sy").cast(DoubleType) -
      b * dtN) / nD
    val h = lit(1.0) / nD + dtN * dtN / (nD * cxx)
    val s2 = (cyy - cxy * cxy / cxx) / nD / (nD - lit(2.0))
    val d = e * e * h / (lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h))
    val ok = col("__n") > 2L && cxx > lit(0.0) && s2 > lit(0.0) && h < lit(1.0)
    val scored = j.withColumn("cooks_d", when(ok, d))
      .withColumn("resid", when(ok, e))
      .withColumn("leverage", when(ok, h))
      .where(col("cooks_d").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("cooks_d").desc, col("__t").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(keys :+ col("__t").as("t") :+ col("__v").as("v") :+
        col("resid") :+ col("leverage") :+ col("cooks_d") :+ col("rnk"): _*)
  }

  /** Chow structural-break test at a KNOWN split — the "did the trend
    * LINE change at the deploy/policy date" companion to
    * [[graft.ops.Outliers.changepointSplit]] (which LOCATES an unknown
    * mean shift): fit y~t separately before/after the split and pooled;
    * F = ((SSRₚ−SSR₁−SSR₂)/2)/((SSR₁+SSR₂)/(n−4)) rejects when the two
    * segments need different lines (slope OR intercept).
    *
    * Exactness: each segment's SSR = (Syy·Sxx − Sxy²)/Sxx derives from
    * exact integer co-moments (ONE grouped aggregate computes both
    * segments' moments via conditional sums — no second pass); F is one
    * fixed tree. SSRs use the n-scaled centered forms so no mean is ever
    * a float.
    *
    * @return per group: (groupCols*, n_before, n_after, f) — f null when
    *         either segment lacks 2 points or x-variance, or n ≤ 4.
    */
  def chowTest(df: DataFrame, groupCols: Seq[String], tCol: String,
               vCol: String, splitT: Long): DataFrame = {
    val D = DecimalType(38, 0)
    val keys = groupCols.map(col)
    val rows = df.select(keys :+ col(tCol).cast(LongType).as("__t") :+
        col(vCol).cast(LongType).as("__v"): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
      .withColumn("__a", col("__t") < lit(splitT))
    def seg(flag: Column, tag: String) = Seq(
      sum(when(flag, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(flag, col("__t")).otherwise(0L).cast(D)).as(s"sx_$tag"),
      sum(when(flag, col("__v")).otherwise(0L).cast(D)).as(s"sy_$tag"),
      sum(when(flag, col("__t").cast(D) * col("__t").cast(D)).otherwise(lit(0L).cast(D))).as(s"sxx_$tag"),
      sum(when(flag, col("__t").cast(D) * col("__v").cast(D)).otherwise(lit(0L).cast(D))).as(s"sxy_$tag"),
      sum(when(flag, col("__v").cast(D) * col("__v").cast(D)).otherwise(lit(0L).cast(D))).as(s"syy_$tag"))
    val aggs = seg(col("__a"), "a") ++ seg(!col("__a"), "b")
    val m = rows.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    // n-scaled centered moments: Cxx = n·Σx² − (Σx)² etc.; SSR·n = (Cyy·Cxx − Cxy²)/Cxx
    def ssrOver(nC: Column, sx: Column, sy: Column, sxx: Column,
                sxy: Column, syy: Column): (Column, Column) = {
      val cxx = (nC.cast(D) * sxx - sx * sx).cast(DoubleType)
      val cyy = (nC.cast(D) * syy - sy * sy).cast(DoubleType)
      val cxy = (nC.cast(D) * sxy - sx * sy).cast(DoubleType)
      // SSR = (Cyy − Cxy²/Cxx)/n
      ((cyy - cxy * cxy / cxx) / nC.cast(DoubleType), cxx)
    }
    val (ssrA, cxxA) = ssrOver(col("n_a"), col("sx_a"), col("sy_a"),
      col("sxx_a"), col("sxy_a"), col("syy_a"))
    val (ssrB, cxxB) = ssrOver(col("n_b"), col("sx_b"), col("sy_b"),
      col("sxx_b"), col("sxy_b"), col("syy_b"))
    val nP = col("n_a") + col("n_b")
    val (ssrP, cxxP) = ssrOver(nP,
      col("sx_a") + col("sx_b"), col("sy_a") + col("sy_b"),
      col("sxx_a") + col("sxx_b"), col("sxy_a") + col("sxy_b"),
      col("syy_a") + col("syy_b"))
    val nD = nP.cast(DoubleType)
    val f = (ssrP - ssrA - ssrB) / lit(2.0) / ((ssrA + ssrB) / (nD - lit(4.0)))
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && nP > 4L &&
      cxxA > lit(0.0) && cxxB > lit(0.0) && cxxP > lit(0.0) &&
      (ssrA + ssrB) > lit(0.0)
    m.select(keys :+ col("n_a").as("n_before") :+ col("n_b").as("n_after") :+
      when(ok, f).as("f"): _*)
  }

  /** First-order partial correlation — "is x still correlated with y
    * once z is controlled for": r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)
    * (1−r_yz²)) — the confounder check a raw correlation matrix invites
    * but can't answer (price~tax looks real until quantity is held
    * fixed). Listwise-complete over the triple so all three r's share
    * one n.
    *
    * Exactness: all three pairwise co-moment sets ride ONE aggregate
    * ([[pairAggs]] ×3 — exact integers, hi/lo split squares); each r and
    * the partial are fixed double trees.
    *
    * @return one row: (n, r_xy, r_xz, r_yz, partial) — partial null when
    *         either conditioning correlation is ±1 or any variance is 0.
    */
  def partialCorr(df: DataFrame, xCol: String, yCol: String, zCol: String,
                  scale: Int = 2): DataFrame = {
    def fx(c: String) =
      MetricColumns.fixedPointLong(col(c).cast(DoubleType), scale)
    val sel = df.select(fx(xCol).as("__x"), fx(yCol).as("__y"), fx(zCol).as("__z"))
      .where(col("__x").isNotNull && col("__y").isNotNull && col("__z").isNotNull)
    val aggs = pairAggs(col("__x"), col("__y"), "xy") ++
      pairAggs(col("__x"), col("__z"), "xz") ++
      pairAggs(col("__y"), col("__z"), "yz")
    val m = sel.agg(aggs.head, aggs.tail: _*)
    val rxy = pairCorr("xy"); val rxz = pairCorr("xz"); val ryz = pairCorr("yz")
    val dxz = lit(1.0) - rxz * rxz
    val dyz = lit(1.0) - ryz * ryz
    val pc = when(dxz > lit(0.0) && dyz > lit(0.0),
      (rxy - rxz * ryz) / (sqrt(dxz) * sqrt(dyz)))
    m.select(col("n_xy").as("n"), rxy.as("r_xy"), rxz.as("r_xz"),
      ryz.as("r_yz"), pc.as("partial"))
  }

  /** Pearson-residual drill-down of a contingency table — WHICH cells
    * drive a significant χ²/Cramér's V: per cell the standardized
    * residual (o−e)/√e with e = rₐ·c_b/N (|resid| > 2 flags the cell).
    * Exact counts and margins; e and the residual are fixed double
    * trees. One (a, b) rollup + margin windows.
    *
    * @return per cell: (a, b, o, e, std_resid) ordered by (a, b).
    */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast(StringType).as("a"),
        col(bCol).cast(StringType).as("b"))
      .agg(count(lit(1)).as("o"))
    val tot = cells.agg(sum(col("o")).cast(LongType).as("__n"))
    val withM = cells
      .withColumn("__ra", sum(col("o")).over(Window.partitionBy("a")))
      .withColumn("__cb", sum(col("o")).over(Window.partitionBy("b")))
      .crossJoin(broadcast(tot))
    val e = col("__ra").cast(DoubleType) * col("__cb").cast(DoubleType) /
      col("__n").cast(DoubleType)
    withM.select(col("a"), col("b"), col("o"), e.as("e"),
        ((col("o").cast(DoubleType) - e) / sqrt(e)).as("std_resid"))
      .orderBy("a", "b")
  }

  /** Theil's uncertainty coefficient — the ASYMMETRIC association
    * measure over [[mutualInfo]]'s machinery: U(A|B) = I(A;B)/H(A) reads
    * "the share of A's entropy that B explains" — directional where
    * [[cramersV]]/nmi are symmetric (a label column can fully determine a
    * coarse bucket while the bucket barely constrains the label; only U
    * exposes that asymmetry). Same fx-exact entropy/MI sums, so both
    * ratios are bit-portable.
    *
    * @return per pair: (pair, n, u_a_given_b, u_b_given_a) — null when
    *         the conditioned side's entropy is 0.
    */
  def theilsU(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val m = mutualInfo(df, pairs)
    m.select(col("pair"), col("n"),
      when(col("h_a") > 0.0, col("mi") / col("h_a")).as("u_a_given_b"),
      when(col("h_b") > 0.0, col("mi") / col("h_b")).as("u_b_given_a"))
  }

  /** Periodogram power at CANDIDATE periods per group — the frequency-
    * domain seasonality detector ([[acf]] sees self-similarity at integer
    * lags; the DFT power P(p) = (Σx·cos(2πt/p))² + (Σx·sin)² over n
    * scores a hypothesized period directly and is robust to phase).
    * Feed the candidate set (7, 30, …) and the winning period configures
    * Holt–Winters / [[graft.ops.Outliers.seasonalProfile]].
    *
    * Exactness contract: cos/sin are NOT bit-portable across libm
    * implementations — but the argument grid has only p distinct values,
    * so both engines consume the SAME literal trig table (generated once,
    * embedded as literals here and in the oracle SQL; round-trip-exact
    * decimal strings). Each row's x·cos term is micro-fx'd (one fixed
    * tree) → exact integer sums; power is one final tree. One grouped
    * aggregate per period over the phase-joined rows.
    *
    * @return per (group, period): (groupCols*, period, n, sc_fx, ss_fx,
    *         power).
    */
  def periodogram(df: DataFrame, groupCols: Seq[String], tCol: String,
                  vCol: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), "periods must be >= 2")
    val D = DecimalType(38, 0)
    val keys = groupCols.map(col)
    val rows = df.select(keys :+ col(tCol).cast(LongType).as("__t") :+
        col(vCol).cast(LongType).as("__v"): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val frames = periods.map { p =>
      val cosArr = array(trigTable(p)._1.map(lit): _*)
      val sinArr = array(trigTable(p)._2.map(lit): _*)
      val phase = (pmod(col("__t"), lit(p.toLong)) + 1L).cast("int")
      def fx(table: Column) = graft.metrics.MetricColumns.fixedPointLong(
        col("__v").cast(DoubleType) * element_at(table, phase), 6)
      val agg = rows.withColumn("__cfx", fx(cosArr)).withColumn("__sfx", fx(sinArr))
        .groupBy(keys: _*)
        .agg(count(lit(1)).as("n"),
          sum(col("__cfx").cast(D)).as("__sc"),
          sum(col("__sfx").cast(D)).as("__ss"))
      val scd = col("__sc").cast(DoubleType) / lit(1e6)
      val ssd = col("__ss").cast(DoubleType) / lit(1e6)
      agg.select(keys ++ Seq(lit(p).as("period"), col("n"),
        col("__sc").cast(LongType).as("sc_fx"),
        col("__ss").cast(LongType).as("ss_fx"),
        ((scd * scd + ssd * ssd) / col("n").cast(DoubleType)).as("power")): _*)
    }
    frames.reduce(_.unionAll(_))
  }

  /** The shared literal trig table for [[periodogram]] and its oracle:
    * (cos, sin) at the p phase points — generated in ONE place so both
    * engines consume identical doubles. */
  private[graft] def trigTable(p: Int): (Seq[Double], Seq[Double]) =
    (Seq.tabulate(p)(i => math.cos(2.0 * math.Pi * i / p)),
     Seq.tabulate(p)(i => math.sin(2.0 * math.Pi * i / p)))

  /** Durbin–Watson statistic per group over an ordered integer series —
    * the RESIDUAL-autocorrelation diagnostic ([[acf]] reports the lag
    * correlogram; DW is the single accept/reject number forecasting
    * pipelines gate on): DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² over mean residuals,
    * ≈2 under independence, →0 under positive lag-1 autocorrelation,
    * →4 under alternation.
    *
    * Exactness: with S = Σx over n rows, n·eₜ = n·xₜ − S, so
    * DW = n·Σ(Δx)²/(n·Σx² − S²) — numerator and denominator are exact
    * DECIMAL(38,0) from long inputs (Δx cancels S), the ratio ONE fixed
    * double tree. Consecutive = row-adjacent in the `tCol` order (gaps are
    * the caller's modeling choice, as in [[acf]]). One window + one
    * grouped aggregate, both partitioned by the group key.
    *
    * @return per group: (groupCols*, n, sum_d2, dw) — dw null when n < 2
    *         or the series is constant.
    */
  def durbinWatson(df: DataFrame, groupCols: Seq[String], tCol: String,
                   vCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val keys = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__t"))
    val rows = df.select(keys :+ col(tCol).cast(LongType).as("__t") :+
        col(vCol).cast(LongType).as("__v"): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val agg = rows
      .withColumn("__dx", col("__v") - lag(col("__v"), 1).over(w))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast(D)).as("s"),
        sum(col("__v").cast(D) * col("__v").cast(D)).as("q"),
        sum(when(col("__dx").isNotNull, col("__dx").cast(D) * col("__dx").cast(D))
          .otherwise(lit(0L).cast(D))).as("sdx2"))
    val num2 = col("n").cast(D) * col("sdx2")
    val den2 = col("n").cast(D) * col("q") - col("s") * col("s")
    val dw = when(col("n") >= 2L && den2 > lit(0L).cast(D),
      num2.cast(DoubleType) / den2.cast(DoubleType))
    agg.select(keys :+ col("n") :+ col("sdx2").cast(DoubleType).as("sum_d2") :+
      dw.as("dw"): _*)
  }
}
