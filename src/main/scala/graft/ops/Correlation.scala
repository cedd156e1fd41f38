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
      val counts = Binning.distinctValueCounts(base, col(c))
      val distinct = counts.count()
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
    * quality track length in EVERY language, or only in English?" Rank
    * maps become (group, value) counts with group-bounded running-sum
    * windows (no routing needed — the cumulative never crosses a group),
    * doubled tie-averaged ranks attach back by (group, value) join, and
    * the per-group moments ride the exact pairAggs machinery. Groups
    * where either side is constant report NULL rho; listwise NULLs.
    *
    * @return one row per group: (groupCol, n, rho).
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String, scale: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // three consumers (two rank maps + the join spine) — LAZY
    // localCheckpoint the three-column frame so the source scans once
    // (4.7 → ~3 s at sf0.1); unlike persist, the blocks are auto-freed by
    // the ContextCleaner when the frame goes unreachable, and unlike the
    // eager form the materialization rides the first consumer's job
    // (eager benched +0.5 s here: an extra job boundary on the widest
    // frame in the family)
    val base = df.select(col(groupCol).as("g"),
        MetricColumns.fixedPointLong(col(xCol), scale).as("__x"),
        MetricColumns.fixedPointLong(col(yCol), scale).as("__y"))
      .where(col("g").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(false)
    def rankMap(c: String) = {
      val wRun = Window.partitionBy("g").orderBy("v")
      base.groupBy(col("g"), col(c).as("v")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wRun))
        .select(col("g"), col("v"),
          ((col("cum") - col("c")) * 2L + col("c") + 1L).as(s"dr$c"))
    }
    val ranked = base
      .join(rankMap("__x").withColumnRenamed("v", "__x"), Seq("g", "__x"))
      .join(rankMap("__y").withColumnRenamed("v", "__y"), Seq("g", "__y"))
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
}
