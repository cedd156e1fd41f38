package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-sequence analytics: funnel conversion, cohort retention, transition
  * matrices. The per-user sequential semantics these need are expressed as
  * per-key aggregates and bounded windows — never a global sort.
  */
object Events {

  /** Ordered funnel analysis: for each user, stage i counts as reached only
    * if an event of stage i's type occurs AT OR AFTER the user's time of
    * reaching stage i-1 (strict happened-after sequencing, min-timestamp
    * greedy — the standard funnel definition, and greedy-min is optimal
    * here: taking the earliest qualifying event can only admit more
    * downstream matches). `windowSec` bounds the whole journey: stage i
    * must also fall within windowSec of the user's stage-1 time.
    *
    * Returns one row per stage: (stage_index, stage, users) with users =
    * count reaching that stage. Shape: one skinny (user, min-ts) aggregate
    * PER STAGE — k stages = k map-side-combined aggregates chained by
    * id-keyed joins on (user, ts) pairs only; event payload never moves,
    * no per-user sequence materialization, no window funnel. The per-stage
    * frames shrink monotonically (each is a subset of the previous).
    */
  /** Per-stage reached frames (u, t1, t_prev): frame i holds the users who
    * reached stage i, their stage-1 time and their stage-i reach time —
    * shared by [[funnel]] (counts) and [[stageGaps]] (reach-time deltas).
    */
  private def reachedFrames(df: DataFrame, tsCol: String, userCol: String,
                            typeCol: String, stages: Seq[String],
                            windowSec: Long): Seq[DataFrame] = {
    // stage 1: first event of the first type per user
    val first = df.where(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("t1"))
      .withColumn("t_prev", col("t1"))
    stages.drop(1).scanLeft(first) { (prev, stage) =>
      df.where(col(typeCol) === stage)
        .select(col(userCol).as("u"), col(tsCol).as("t"))
        .join(prev.select("u", "t1", "t_prev"), Seq("u"))
        .where(col("t") >= col("t_prev") &&
          unix_timestamp(col("t")) - unix_timestamp(col("t1")) <= windowSec)
        .groupBy("u")
        .agg(min(col("t1")).as("t1"), min(col("t")).as("t_prev"))
    }
  }

  def funnel(df: DataFrame, tsCol: String, userCol: String, typeCol: String,
             stages: Seq[String], windowSec: Long = Long.MaxValue): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    reachedFrames(df, tsCol, userCol, typeCol, stages, windowSec)
      .zip(stages).zipWithIndex.map { case ((frame, stage), i) =>
        frame.agg(count(lit(1)).cast(LongType).as("users"))
          .select(lit(i + 1).as("stage_index"), lit(stage).as("stage"),
            col("users"))
      }.reduce(_ unionByName _)
  }

  /** Time-to-convert between consecutive funnel stages: per adjacent stage
    * pair, the converting users' reach-time gaps in INTEGER SECONDS with
    * exact p25/p50/p75 and mean — "signup→click takes a median 40 s,
    * click→purchase a median 2 days" — the latency reading the count-only
    * funnel can't give. Quartile interpolation over integer seconds is
    * exact in IEEE doubles (the q_percentiles discipline); the mean is one
    * division of exact longs.
    *
    * Shape: the same chained skinny per-stage aggregates as [[funnel]],
    * plus one id-keyed join per pair and a 1-row percentile aggregate.
    */
  def stageGaps(df: DataFrame, tsCol: String, userCol: String, typeCol: String,
                stages: Seq[String], windowSec: Long = Long.MaxValue): DataFrame = {
    require(stages.size >= 2, "stage gaps need at least two stages")
    val frames = reachedFrames(df, tsCol, userCol, typeCol, stages, windowSec)
    frames.sliding(2).toSeq.zipWithIndex.map { case (Seq(a, b), i) =>
      val gaps = b.select(col("u"), col("t_prev").as("tb"))
        .join(a.select(col("u"), col("t_prev").as("ta")), Seq("u"))
        .select((unix_timestamp(col("tb")) - unix_timestamp(col("ta"))).as("gap"))
      val p = percentile(col("gap"), array(lit(0.25), lit(0.5), lit(0.75)))
      gaps.agg(count(lit(1)).cast(LongType).as("users"),
          sum(col("gap")).cast(LongType).as("gap_sum"), p.as("ps"))
        .select(
          lit(i + 1).as("stage_index"),
          lit(s"${stages(i)}->${stages(i + 1)}").as("transition"),
          col("users"),
          element_at(col("ps"), 1).as("p25"),
          element_at(col("ps"), 2).as("p50"),
          element_at(col("ps"), 3).as("p75"),
          when(col("users") > 0L,
            col("gap_sum").cast(DoubleType) / col("users").cast(DoubleType)).as("avg_sec"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by the week of their FIRST event
    * (cohort), counted as retained in week offsets 0..`maxWeeks` when they
    * have any event that many weeks later. All time arithmetic is integer
    * day/week indices off the epoch (`floor(epoch/86400) div 7`) — no
    * calendar functions, so every engine reproduces the exact buckets.
    *
    * Shape: one (user, min-day) aggregate, one skinny join back (events
    * project (user, day) only), one distinct-user count per (cohort, offset)
    * cell — two shuffles total, both on user/cohort keys.
    */
  def cohortRetention(df: DataFrame, tsCol: String, userCol: String,
                      maxWeeks: Int = 8): DataFrame = {
    // Spark unix_timestamp truncates to whole seconds; the DuckDB mirror is
    // floor(epoch(ts)) — then day/week indices are explicit floors (bare
    // double→int casts ROUND in DuckDB, so no implicit cast ever divides)
    val day = floor(unix_timestamp(col(tsCol)).cast(DoubleType) / 86400.0)
      .cast(LongType)
    val ev = df.select(col(userCol).as("u"), day.as("d"))
    val first = ev.groupBy("u").agg(min(col("d")).as("d0"))
    ev.join(first, Seq("u"))
      .withColumn("cohort_week",
        floor(col("d0").cast(DoubleType) / 7.0).cast(LongType))
      .withColumn("week_offset",
        floor((col("d") - col("d0")).cast(DoubleType) / 7.0).cast(LongType))
      .where(col("week_offset") <= maxWeeks)
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("u")).cast(LongType).as("users"))
  }

  /** Event-type transition matrix: counts of consecutive (from → to) event
    * pairs per user, ordered by (ts, tie-break id) so the sequence — and
    * therefore the matrix — is deterministic under any partitioning. The
    * per-user `lead` window is key-partitioned (bounded partitions, no
    * global sort); output is at most |types|² rows.
    */
  def transitions(df: DataFrame, tsCol: String, userCol: String,
                  typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(idCol).asc)
    df.withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).cast(LongType).as("n"))
  }

  /** RFM scoring — the classic per-entity behavioral segmentation
    * (recency / frequency / monetary, Hughes 1994): the three per-customer
    * aggregates plus exact k-quantile scores 1..k per dimension and the
    * composed `rfm` code (555 = recent + frequent + big spender; 111 =
    * churned). The summarization layer between raw events ([[funnel]],
    * [[cohortRetention]]) and campaign/sampling decisions.
    *
    * Exact, deterministic, tie-honest scoring: score = ⌊k·|{entities with
    * a strictly smaller value}| / n⌋ + 1 via integer `div` over the
    * cardinality-routed cumulative-count machinery
    * ([[graft.ops.Binning]]) — NO global row window, no ntile: tied
    * values always share a score (the property a marketer actually wants
    * — two identical customers can't land in different quintiles), and
    * the arithmetic replays in any engine. Recency scores on the NEGATED
    * day count so "more recent" = higher score, matching f/m orientation.
    *
    * Shape: one entity aggregate, three distinct-value cumulative frames
    * (each one value shuffle + the routed prefix), three skinny
    * AQE-broadcastable joins back.
    *
    * @param asOfUs "now" in epoch micros — recency anchor, caller-pinned
    *               for replayability.
    * @return (entity, recency_days, frequency, monetary_fx, r_score,
    *         f_score, m_score, rfm) — monetary in fixed-point units.
    */
  /** Touch attribution per conversion — the marketing-analytics member of
    * the event family: for every conversion event, the LAST and FIRST
    * touch (of the configured touch types, same user) inside the lookback
    * window, plus the touch count — last-touch and first-touch
    * attribution in one pass, deterministic under tied timestamps
    * (total-order (ts, id) struct min/max).
    *
    * Shape: conversions × touches join per user bounded by the lookback
    * window (the funnel per-user contract), one group-by per conversion;
    * no global sort. Conversions with NO touch in the window report null
    * attribution (direct conversions) — they stay in the output so rates
    * sum correctly.
    *
    * @return one row per conversion: (user, conv_id, conv_ts,
    *         last_touch_type, first_touch_type, n_touches).
    */
  def attribution(df: DataFrame, tsCol: String, userCol: String,
                  typeCol: String, idCol: String, touchTypes: Seq[String],
                  convType: String, lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty && lookbackSec > 0, "bad parameters")
    val base = df.select(col(userCol).as("user"), col(idCol).as("id"),
      unix_micros(col(tsCol).cast(TimestampType)).as("us"),
      col(typeCol).as("typ"))
    val convs = base.where(col("typ") === convType)
      .select(col("user"), col("id").as("conv_id"), col("us").as("conv_us"))
    val touches = base.where(col("typ").isin(touchTypes: _*))
      .select(col("user"), col("us").as("t_us"), col("id").as("t_id"),
        col("typ").as("t_typ"))
    val lookUs = lookbackSec * 1000000L
    val joined = convs.join(touches, Seq("user"), "left")
      .withColumn("__in", col("t_us").isNotNull &&
        col("t_us") <= col("conv_us") && col("t_us") > col("conv_us") - lookUs)
    joined.groupBy("user", "conv_id", "conv_us")
      .agg(
        max(when(col("__in"), struct(col("t_us"), col("t_id"), col("t_typ"))))
          .getField("t_typ").as("last_touch_type"),
        min(when(col("__in"), struct(col("t_us"), col("t_id"), col("t_typ"))))
          .getField("t_typ").as("first_touch_type"),
        sum(when(col("__in"), 1L).otherwise(0L)).as("n_touches"))
      .select(col("user"), col("conv_id"),
        timestamp_micros(col("conv_us")).as("conv_ts"),
        col("last_touch_type"), col("first_touch_type"), col("n_touches"))
  }

  /** Association rules over baskets (support / confidence / lift — the
    * Agrawal et al. 1993 pair-rule core): directed a→b rules from
    * co-occurrence counts, the "customers who X also Y" scorer for
    * recommendations, bundle design and co-curation diagnostics.
    * [[graft.ops.Components.coOccurrence]] gives the raw pair counts;
    * this derives the decision numbers — support = n(ab)/N,
    * confidence = n(ab)/n(a), lift = n(ab)·N/(n(a)·n(b)).
    *
    * Shape: distinct (basket, item) once (hot baskets over
    * `maxBasketItems` are EXCLUDED — the coOccurrence quadratic cap, part
    * of the operator definition and replayed by the oracle), one pair
    * shuffle, skinny item-count joins, ratios as one double tree each;
    * output bounded to the top-K rules by (lift desc, antecedent,
    * consequent).
    */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
                  minPairCount: Long = 1L, topK: Int = 100,
                  maxBasketItems: Int = 1000): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val ki = df.select(col(basketCol).as("k"), col(itemCol).as("i"))
      .where(col("k").isNotNull && col("i").isNotNull)
      .distinct()
    val hot = ki.groupBy("k").agg(count(lit(1)).as("f"))
      .where(col("f") > maxBasketItems).select("k")
    val capped = ki.join(broadcast(hot), Seq("k"), "left_anti")
      .localCheckpoint(true) // serves N, item counts and the pair join
    val n = capped.select("k").distinct().count()
    require(n > 0, "no baskets")
    val items = capped.groupBy("i").agg(count(lit(1)).as("ni"))
    // within-basket pairs join-free (Joins.withinKeyPairs): items are
    // DISTINCT per basket, so least/greatest replays the old a < b
    // orientation over the identical pair multiset
    val pairs = Joins.withinKeyPairs(capped, "k", Seq(col("i")))
      .select(least(col("x.i"), col("y.i")).as("a"),
        greatest(col("x.i"), col("y.i")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      .where(col("nab") >= minPairCount)
    val directed = pairs.select(col("a").as("antecedent"),
        col("b").as("consequent"), col("nab"))
      .unionAll(pairs.select(col("b").as("antecedent"),
        col("a").as("consequent"), col("nab")))
      .join(items.select(col("i").as("antecedent"), col("ni").as("na")),
        Seq("antecedent"))
      .join(items.select(col("i").as("consequent"), col("ni").as("nb")),
        Seq("consequent"))
    val nD = lit(n.toDouble)
    directed.select(col("antecedent"), col("consequent"), col("nab"),
        col("na"), col("nb"),
        (col("nab").cast(DoubleType) / nD).as("support"),
        (col("nab").cast(DoubleType) / col("na").cast(DoubleType)).as("confidence"),
        (col("nab").cast(DoubleType) * nD /
          (col("na").cast(DoubleType) * col("nb").cast(DoubleType))).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(topK)
  }

  /** Kaplan–Meier survival curve (product-limit estimator, Kaplan & Meier
    * 1958) — the CENSORING-AWARE lifetime summary the naive "average
    * lifetime" gets wrong: subjects still alive at observation end
    * (censored) leave the risk set without counting as deaths, so
    * retention/churn/TTL curves stay unbiased. S(t) = Π_{u ≤ t}
    * (1 − d_u/n_u) over distinct event times.
    *
    * Exactness: the cumulative PRODUCT is carried as a cumulative SUM of
    * pico fixed-point ln(1 − d/n) terms (each term ONE fixed double tree
    * from exact longs, truncated order-free — the jsDivergence
    * discipline), survival = exp of the exact sum (`exp` parity is
    * engine-proven by the categoryEntropy gate). A time where the whole
    * risk set dies (d = n) zeroes survival exactly from there on (null
    * ln_s_fx). Distinct event times are calendar-bounded (the mannKendall
    * contract), so the ordered window runs over the bounded distinct-time
    * rollup, never raw rows.
    *
    * @param observedCol true = event observed, false = censored.
    * @return one row per distinct duration: (t, n_risk, events, censored,
    *         ln_s_fx, survival) ordered by t.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  observedCol: Column): DataFrame = {
    val rows = df.select(col(durationCol).cast(LongType).as("t"),
        observedCol.cast("boolean").as("e"))
      .where(col("t").isNotNull && col("e").isNotNull)
    val cells = rows.groupBy("t").agg(
      sum(when(col("e"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("e"), 1L).otherwise(0L)).as("c"))
    val total = cells.agg(sum(col("d") + col("c")).cast(LongType).as("__n"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    val nRisk = col("__n") - (sum(col("d") + col("c")).over(w) - (col("d") + col("c")))
    val dD = col("d").cast(DoubleType)
    val nD = col("n_risk").cast(DoubleType)
    val term = when(col("d") > 0L && col("d") < col("n_risk"),
        graft.metrics.MetricColumns.fixedPointLong(
          log(lit(1.0) - dD / nD), 12))
      .otherwise(lit(0L))
    cells.crossJoin(broadcast(total))
      .withColumn("n_risk", nRisk)
      .withColumn("__term", term)
      .withColumn("__dead", when(col("d") === col("n_risk"), 1L).otherwise(0L))
      .withColumn("__lnfx", sum(col("__term")).over(w))
      .withColumn("__dd", sum(col("__dead")).over(w))
      .select(col("t"), col("n_risk"), col("d").as("events"),
        col("c").as("censored"),
        when(col("__dd") >= 1L, lit(null).cast(LongType))
          .otherwise(col("__lnfx")).as("ln_s_fx"),
        when(col("__dd") >= 1L, lit(0.0))
          .otherwise(exp(col("__lnfx").cast(DoubleType) / lit(1e12)))
          .as("survival"))
  }

  /** Nelson–Aalen cumulative-hazard estimator — [[kaplanMeier]]'s
    * additive companion: KM multiplies survival factors, NA sums hazard
    * increments H(t) = Σ_{s≤t} d/n (the quantity hazard-ratio models are
    * fit against, and better-behaved than −ln(KM) at small n). The
    * Breslow survival exp(−H) rides along for comparison with KM.
    *
    * Exactness: the same (t → d, c, n_risk) cells as [[kaplanMeier]];
    * each increment d/n is ONE fixed double tree truncated to pico
    * fixed-point, so the cumulative is an exact integer prefix sum
    * (order-free at equal cells) and H/exp(−H) are final trees. Distinct
    * event times are calendar-bounded, windows on the bounded rollup.
    *
    * @return per distinct duration: (t, n_risk, events, censored, h_fx
    *         (exact pico), h, s_breslow) ordered by t.
    */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  observedCol: Column): DataFrame = {
    val rows = df.select(col(durationCol).cast(LongType).as("t"),
        observedCol.cast("boolean").as("e"))
      .where(col("t").isNotNull && col("e").isNotNull)
    val cells = rows.groupBy("t").agg(
      sum(when(col("e"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("e"), 1L).otherwise(0L)).as("c"))
    val total = cells.agg(sum(col("d") + col("c")).cast(LongType).as("__n"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    val nRisk = col("__n") - (sum(col("d") + col("c")).over(w) - (col("d") + col("c")))
    val term = when(col("d") > 0L,
        graft.metrics.MetricColumns.fixedPointLong(
          col("d").cast(DoubleType) / col("n_risk").cast(DoubleType), 12))
      .otherwise(lit(0L))
    cells.crossJoin(broadcast(total))
      .withColumn("n_risk", nRisk)
      .withColumn("__term", term)
      .withColumn("h_fx", sum(col("__term")).over(w))
      .select(col("t"), col("n_risk"), col("d").as("events"),
        col("c").as("censored"), col("h_fx"),
        (col("h_fx").cast(DoubleType) / lit(1e12)).as("h"),
        exp(-col("h_fx").cast(DoubleType) / lit(1e12)).as("s_breslow"))
  }

  /** DAU/MAU stickiness per key and calendar month — the engagement
    * ratio ("what share of a month's users show up on an average day")
    * that a raw active-user count hides. Days with zero events simply
    * don't enter the daily average (the standard dashboard convention);
    * stickiness = (Σ daily-distinct / active-days) / monthly-distinct.
    *
    * Scale shape: ONE distinct-ification of (key, month, day, user) feeds
    * both the daily rollup and (re-projected) the monthly distinct — the
    * user id never appears in more than one shuffle stage; counts are
    * exact longs and the ratio is ONE fixed tree.
    *
    * @return per (key, month): (keyCols*, month, days_active, sum_dau,
    *         mau, stickiness).
    */
  def stickiness(df: DataFrame, tsCol: String, userCol: String,
                 keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val base = df.select(keys ++ Seq(
        date_trunc("MONTH", col(tsCol).cast(TimestampType)).as("month"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000L")
          .as("__day"),
        col(userCol).as("__u")): _*)
      .where(col("month").isNotNull && col("__u").isNotNull)
      .distinct()
    val gm = keys :+ col("month")
    val daily = base.groupBy(gm :+ col("__day"): _*)
      .agg(count(lit(1)).as("__dau"))
    val monthlyDays = daily.groupBy(gm: _*)
      .agg(count(lit(1)).as("days_active"), sum(col("__dau")).as("sum_dau"))
    val mau = base.select(gm :+ col("__u"): _*).distinct()
      .groupBy(gm: _*).agg(count(lit(1)).as("mau"))
    monthlyDays.join(mau, keyCols :+ "month")
      .select(gm ++ Seq(col("days_active"), col("sum_dau"), col("mau"),
        (col("sum_dau").cast(DoubleType) / col("days_active").cast(DoubleType) /
          col("mau").cast(DoubleType)).as("stickiness")): _*)
  }

  /** Harrell's concordance index — the RANKING eval for survival risk
    * scores ([[logRank]] compares two groups; the C-index scores a
    * CONTINUOUS risk model): over comparable pairs (subject i observed to
    * fail before j's time), the fraction where the model ranked i
    * riskier, score ties counting half. C = 1 perfect, 0.5 random.
    *
    * Exactness: everything reduces to integer pair counts over the
    * (duration, observed, score) cell rollup —
    * C = (2·concordant + tied)/(2·comparable) with an EXACT integer
    * numerator. The cell×cell range join is bounded by the rollup's
    * cardinality (quantize continuous scores upstream — the same contract
    * as every drift reference); comparable pairs use strict tᵢ < tⱼ
    * (equal-time pairs are excluded, the standard convention).
    *
    * @return one row: (comparable, concordant, tied_score, c).
    */
  def concordanceIndex(df: DataFrame, durationCol: String,
                       observedCol: Column, scoreCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cells = df.select(col(durationCol).cast(LongType).as("t"),
        observedCol.cast("boolean").as("e"),
        col(scoreCol).cast(LongType).as("sc"))
      .where(col("t").isNotNull && col("e").isNotNull && col("sc").isNotNull)
      .groupBy("t", "e", "sc").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val a = cells.where(col("e"))
      .select(col("t").as("ta"), col("sc").as("sa"), col("c").as("ca"))
    val b = cells.select(col("t").as("tb"), col("sc").as("sb"), col("c").as("cb"))
    val pair = (col("ca") * col("cb")).cast(D)
    val agg = a.join(b, col("ta") < col("tb"))
      .agg(sum(pair).as("__comp"),
        sum(when(col("sa") > col("sb"), pair).otherwise(lit(0L).cast(D))).as("__conc"),
        sum(when(col("sa") === col("sb"), pair).otherwise(lit(0L).cast(D))).as("__tied"))
    val compD = col("__comp").cast(DoubleType)
    val c = when(col("__comp") > lit(0L).cast(D),
      (lit(2.0) * col("__conc").cast(DoubleType) + col("__tied").cast(DoubleType)) /
        (lit(2.0) * compD))
    agg.select(col("__comp").cast(LongType).as("comparable"),
      col("__conc").cast(LongType).as("concordant"),
      col("__tied").cast(LongType).as("tied_score"),
      c.as("c"))
  }

  /** Two-sample log-rank test (Mantel 1966) — [[kaplanMeier]]'s
    * comparison companion: "are these two survival curves the same",
    * censoring-aware (a t-test on lifetimes is biased the moment anything
    * is censored). At each distinct event time, observed-vs-expected
    * events in the ref group under the shared-hazard null, with the
    * hypergeometric variance; χ² = (ΣO−E)²/ΣV, df = 1.
    *
    * Exactness: per-time O−E = d₁ − n₁d/n and V = n₁n₂d(n−d)/(n²(n−1))
    * are ONE fixed double tree each from exact longs, truncated to pico
    * fixed-point (order-free sums — the [[kaplanMeier]] discipline); χ²
    * is one final tree. Distinct event times calendar-bounded, windows on
    * the bounded rollup.
    *
    * @return one row: (n_ref, n_cur, events_ref, events_cur, oe_fx,
    *         var_fx, chi2) — chi2 null when the variance sum is 0.
    */
  def logRank(ref: DataFrame, cur: DataFrame, durationCol: String,
              observedCol: Column,
              maxLocalDistinct: Long = 1L << 20): DataFrame = {
    def side(df: DataFrame, tag: Int) =
      df.select(col(durationCol).cast(LongType).as("t"),
          observedCol.cast("boolean").as("e"))
        .where(col("t").isNotNull && col("e").isNotNull)
        .withColumn("s", lit(tag))
    val cells = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("t").agg(
        sum(when(col("s") === 1 && col("e"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("s") === 1 && !col("e"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2 && col("e"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("s") === 2 && !col("e"), 1L).otherwise(0L)).as("c2"))
      .localCheckpoint(true) // one layout serves totals AND the cumulative
    val totals = cells.agg(
        sum(col("d1") + col("c1")).cast(LongType).as("__n1"),
        sum(col("d2") + col("c2")).cast(LongType).as("__n2"),
        sum(col("d1")).cast(LongType).as("__e1"),
        sum(col("d2")).cast(LongType).as("__e2"),
        count(lit(1)).as("__k"))
      .collect()(0)
    val (totN1, totN2) = (totals.getLong(0), totals.getLong(1))
    require(totN1 > 0 && totN2 > 0, s"both sides need rows (ref=$totN1, cur=$totN2)")
    // at-risk counts from the routed shared cumulative (distinct event
    // times are calendar-bounded in the common case — single-task window;
    // the MEASURED route keeps an adversarial duration column off the
    // single-partition funnel)
    val cum = graft.ops.Binning.cumulativesFromCounts(cells, "t",
      Seq((col("d1") + col("c1")) -> "__cum1", (col("d2") + col("c2")) -> "__cum2"),
      totals.getLong(4), maxLocalDistinct)
    val n1 = lit(totN1) - (col("__cum1") - (col("d1") + col("c1")))
    val n2 = lit(totN2) - (col("__cum2") - (col("d2") + col("c2")))
    val d = col("d1") + col("d2")
    val n1D = col("__r1").cast(DoubleType); val n2D = col("__r2").cast(DoubleType)
    val nD = (col("__r1") + col("__r2")).cast(DoubleType)
    val dD = d.cast(DoubleType)
    val oe = when(d > 0L, graft.metrics.MetricColumns.fixedPointLong(
        col("d1").cast(DoubleType) - n1D * dD / nD, 12)).otherwise(lit(0L))
    val vv = when(d > 0L && (col("__r1") + col("__r2")) > 1L,
        graft.metrics.MetricColumns.fixedPointLong(
          n1D * n2D * dD * (nD - dD) / (nD * nD * (nD - lit(1.0))), 12))
      .otherwise(lit(0L))
    val sums = cum
      .withColumn("__r1", n1).withColumn("__r2", n2)
      .withColumn("__oe", oe).withColumn("__v", vv)
      .agg(sum(col("__oe")).cast(LongType).as("oe_fx"),
        sum(col("__v")).cast(LongType).as("var_fx"))
    val oeD = col("oe_fx").cast(DoubleType)
    val vD = col("var_fx").cast(DoubleType)
    sums.select(lit(totN1).as("n_ref"), lit(totN2).as("n_cur"),
      lit(totals.getLong(2)).as("events_ref"), lit(totals.getLong(3)).as("events_cur"),
      col("oe_fx"), col("var_fx"),
      when(vD > 0.0, oeD * oeD / (vD * lit(1e12))).as("chi2"))
  }

  def rfmScores(df: DataFrame, entityCol: String, tsCol: String,
                amountCol: String, asOfUs: Long, k: Int = 5,
                scale: Int = 2): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = df.select(col(entityCol).as("entity"),
        unix_micros(col(tsCol).cast(TimestampType)).as("us"),
        graft.metrics.MetricColumns.fixedPointLong(col(amountCol), scale).as("a"))
      .where(col("entity").isNotNull && col("us").isNotNull && col("a").isNotNull)
      .groupBy("entity").agg(
        expr(s"(${asOfUs}L - max(us)) div 86400000000L").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col("a").cast(DecimalType(38, 0))).cast(LongType).as("monetary_fx"))
      .localCheckpoint(true) // serves all three score frames + the joins
    val n = base.count()
    def scoreFrame(metric: Column, out: String): DataFrame = {
      val cum = Binning.cumulativeCounts(base, metric, 1L << 20)
      cum.select(col("v"),
        (expr(s"((cum - c) * ${k}L) div ${n}L") + 1L).as(out))
    }
    // recency negated: most-recent (smallest day count) = highest score
    val r = scoreFrame(-col("recency_days"), "r_score")
      .select((-col("v")).as("recency_days"), col("r_score"))
    val f = scoreFrame(col("frequency"), "f_score")
      .select(col("v").as("frequency"), col("f_score"))
    val m = scoreFrame(col("monetary_fx"), "m_score")
      .select(col("v").as("monetary_fx"), col("m_score"))
    base.join(r, Seq("recency_days"))
      .join(f, Seq("frequency"))
      .join(m, Seq("monetary_fx"))
      .select(col("entity"), col("recency_days"), col("frequency"),
        col("monetary_fx"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score")).as("rfm"))
  }
}
