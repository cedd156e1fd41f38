package graft.scan

import graft.api.{Measurement, ScanResult}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan-to-scan drift: compares two ScanResults (e.g. yesterday's and
  * today's run over the same table — anchored by `ScanResult.time`) and
  * reports per-(metric, column) deltas. This is the cross-run monitoring
  * loop the reference delegates to Soda Cloud, done locally.
  */
object Drift {

  final case class DriftRow(metric: String, columnName: Option[String],
                            before: Option[Double], after: Option[Double],
                            delta: Option[Double], relative: Option[Double],
                            status: String)

  private def numeric(m: Measurement): Option[Double] = m.value.flatMap {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }

  /** @param relThreshold |relative change| above which a row is `drifted`
    *        (metrics present on only one side are `added` / `removed`)
    */
  def compare(before: ScanResult, after: ScanResult,
              relThreshold: Double = 0.1): Seq[DriftRow] = {
    val b = before.measurements.flatMap(m => numeric(m).map((m.metric, m.columnName) -> _)).toMap
    val a = after.measurements.flatMap(m => numeric(m).map((m.metric, m.columnName) -> _)).toMap
    val keys = (b.keySet ++ a.keySet).toSeq.sortBy(k => (k._2.getOrElse(""), k._1))
    keys.map { case k @ (metric, col) =>
      (b.get(k), a.get(k)) match {
        case (Some(x), Some(y)) =>
          val delta = y - x
          val rel = if (x != 0.0) Some(delta / x) else if (delta == 0.0) Some(0.0) else None
          val drifted = rel.map(r => math.abs(r) > relThreshold).getOrElse(delta != 0.0)
          DriftRow(metric, col, Some(x), Some(y), Some(delta), rel,
            if (drifted) "drifted" else "stable")
        case (Some(x), None) => DriftRow(metric, col, Some(x), None, None, None, "removed")
        case (None, Some(y)) => DriftRow(metric, col, None, Some(y), None, None, "added")
        case _ => DriftRow(metric, col, None, None, None, None, "stable")
      }
    }
  }

  /** Only the rows that need attention. */
  def driftedOnly(before: ScanResult, after: ScanResult,
                  relThreshold: Double = 0.1): Seq[DriftRow] =
    compare(before, after, relThreshold).filterNot(_.status == "stable")

  /** Population Stability Index between a reference and a current
    * DISTRIBUTION of one numeric column (the standard "did yesterday's
    * feature distribution shift" monitor; PSI > 0.25 is the conventional
    * act threshold): equi-width bucket proportions p (ref) and q (cur),
    * PSI = Σ_buckets (p−q)·ln(p/q), empty-bucket proportions floored at
    * `eps` (the standard guard — ln(0) otherwise).
    *
    * Returns one row per bucket: (bucket, ref_cnt, cur_cnt, psi_fx) where
    * psi_fx is the bucket's contribution in FIXED POINT (scale 6) — integer
    * rows an engine-independent oracle can reproduce bit-for-bit; total PSI
    * = sum(psi_fx)/1e6 ([[psiTotal]]). Each side is ONE scan + a
    * buckets-sized aggregate; the bucket join is a broadcast of ≤ `buckets`
    * rows — corpus size never shuffles.
    *
    * Bucket arithmetic matches [[Scanner.histogramFrame]] (explicit double
    * ops) so oracles share the expression tree.
    */
  /** EXACT two-sample Kolmogorov–Smirnov statistic: max over all observed
    * values of |F_ref(v) − F_cur(v)| — the bucket-free complement of
    * [[psiBuckets]] (PSI needs a bucket design and misses within-bucket
    * shifts; KS is distribution-free and exact). One row:
    * (n_ref, n_cur, ks_stat).
    *
    * Distributed shape: per-side counts per distinct value (one value-keyed
    * shuffle with map-side combine), then INCLUSIVE cumulative counts via
    * the [[graft.ops.Packing.prefixSum]] two-phase scan — a global-order
    * `Window.orderBy` with no partition key would funnel every distinct
    * value through one partition, the classic scale-killer this repo bans.
    * The CDF gap is one fixed double tree (exact long counts, two
    * divisions, abs, max) so DuckDB reproduces the statistic bit-for-bit.
    */
  def ksStatistic(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    // ONE value-keyed shuffle for both sides' counts (side flag + conditional
    // sums; separate per-side groupBys would shuffle three times)
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    // fused two-column prefix scan (the Packing.prefixSum two-phase shape,
    // inlined so ONE range partition + checkpoint serves both cumulative
    // columns, and the per-partition totals give n_ref/n_cur for free —
    // three driver jobs fewer than composing prefixSum twice + an agg)
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // freeze pid assignment across the jobs below
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val pids = totals.keys.toSeq.sorted
    def offsets(part: ((Long, Long)) => Long): Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + part(totals(p))).init).toMap
    def offsetExpr(m: Map[Int, Long]) =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    // inclusive in-partition running sums (v is distinct, so the default
    // ties-inclusive frame is exact) + broadcast partition offsets
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    parts
      .withColumn("k1", sum(col("c1")).over(w) + offsetExpr(offsets(_._1)))
      .withColumn("k2", sum(col("c2")).over(w) + offsetExpr(offsets(_._2)))
      .agg(max(abs(
        col("k1").cast(DoubleType) / lit(n1.toDouble) -
        col("k2").cast(DoubleType) / lit(n2.toDouble))).as("ks_stat"))
      .select(lit(n1).as("n_ref"), lit(n2).as("n_cur"), col("ks_stat"))
  }

  /** EXACT two-sample Mann–Whitney U (Wilcoxon rank-sum) — the rank-based
    * drift test the KS gap complements: KS is sensitive to the largest
    * CDF gap anywhere, MWU to a stochastic SHIFT (P[ref > cur] ≠ 1/2),
    * and its AUC form (U/(n₁n₂) = P[ref value > cur value] + ½ ties) is
    * the directly interpretable "how often does a reference value beat a
    * current one" number. Tie-corrected normal z for the significance
    * readout.
    *
    * Exactness: tie-averaged ranks are half-integers, so everything
    * carries as DOUBLED ranks — exact integers end-to-end (u_doubled,
    * tie_term = Σ(t³−t)); only the final z/auc are fixed double trees.
    * Distributed shape: identical to [[ksStatistic]] — one value-keyed
    * shuffle with map-side combine + the fused two-phase prefix scan; no
    * global-order funnel.
    *
    * @return one row: (n_ref, n_cur, u_doubled, tie_term, auc, z) where
    *         u_doubled = 2·U_ref.
    */
  def mannWhitneyU(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val pids = totals.keys.toSeq.sorted
    def offsets(part: ((Long, Long)) => Long): Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + part(totals(p))).init).toMap
    def offsetExpr(m: Map[Int, Long]) =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val c = col("c1") + col("c2")
    val stats = parts
      .withColumn("k", sum(c).over(w) +
        offsetExpr(offsets(t => t._1 + t._2)))
      // doubled tie-averaged 1-based rank of value v: 2·cum_lt + c + 1
      .withColumn("dr", (col("k") - c) * 2L + c + 1L)
      .agg(
        sum((col("c1") * col("dr")).cast(DecimalType(38, 0))).as("r1d"),
        // c³ in DECIMAL from the first product — a long wraps past
        // c ≈ 2.1M rows tied on one value (value-identical in range)
        sum(when(c > 1L, c.cast(DecimalType(38, 0)) * c.cast(DecimalType(38, 0)) *
            c.cast(DecimalType(38, 0)) - c.cast(DecimalType(38, 0)))
          .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("ties"))
    val n = n1 + n2
    // u1d stays DECIMAL(38,0) so auc/z survive n1·n2 > 2^62 (multi-
    // billion-row sides); only the u_doubled OUTPUT column narrows to
    // BIGINT for gate portability.
    val u1d = (col("r1d") - lit(n1) * lit(n1 + 1L)).cast(DecimalType(38, 0))
    // fixed double trees (identical in the oracle): auc = U/(n1·n2),
    // z = (U − n1n2/2) / sqrt(n1n2/12 · ((n+1) − ties/(n(n−1))))
    val uD = u1d.cast(DoubleType) / 2.0
    val mu = lit(n1.toDouble) * lit(n2.toDouble) / 2.0
    val sig2 = lit(n1.toDouble) * lit(n2.toDouble) / 12.0 *
      (lit((n + 1).toDouble) -
        col("ties").cast(DoubleType) / (lit(n.toDouble) * lit((n - 1).toDouble)))
    // the BIGINT output narrowing goes NULL (not ANSI-error) past the
    // long range — the statistic itself stays decimal-exact above
    def narrow(c: Column) = when(
      c <= lit(Long.MaxValue).cast(DecimalType(38, 0)) &&
        c >= lit(Long.MinValue).cast(DecimalType(38, 0)), c.cast(LongType))
    stats.select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      narrow(u1d).as("u_doubled"),
      narrow(col("ties").cast(DecimalType(38, 0))).as("tie_term"),
      (uD / (lit(n1.toDouble) * lit(n2.toDouble))).as("auc"),
      when(sig2 > 0.0, (uD - mu) / sqrt(sig2)).as("z"))
  }

  /** Fleiss' kappa — MULTI-rater categorical agreement (Cohen's kappa
    * stops at two raters): with n raters per item, how much do the
    * raters agree beyond chance — the label-quality gate for
    * crowd/ensemble annotation pipelines (RLHF preference labels, LLM
    * judge panels). Items without exactly `raters` ratings are dropped
    * (the complete-design requirement, like [[friedman]]'s blocks).
    *
    * Exactness: with n_ij the per-(item, category) counts,
    * P̄ = (ΣᵢΣⱼn_ij² − N·n)/(N·n(n−1)) and P̄e = Σⱼc_j²/(N·n)² are RATIOS
    * OF EXACT INTEGERS (no per-item float mean — the whole statistic is
    * three exact decimal sums), and κ = (P̄−P̄e)/(1−P̄e) is ONE fixed
    * double tree. One (item, category) rollup + one item-bounded filter.
    *
    * @return one row: (items, raters, categories, p_bar, p_e, kappa) —
    *         kappa null when P̄e = 1 (all mass on one category).
    */
  def fleissKappa(df: DataFrame, itemCol: String, categoryCol: String,
                  raters: Int): DataFrame = {
    require(raters >= 2, "need at least 2 raters per item")
    val D = DecimalType(38, 0)
    val cells = df.select(col(itemCol).cast(StringType).as("i"),
        col(categoryCol).cast(StringType).as("j"))
      .where(col("i").isNotNull && col("j").isNotNull)
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    // complete-design filter: items with exactly `raters` ratings
    val keep = cells.groupBy("i").agg(sum(col("c")).as("nr"))
      .where(col("nr") === lit(raters.toLong)).select("i")
    val kept = cells.join(keep, Seq("i"), "left_semi")
      .localCheckpoint(true) // serves the item count, Σc² AND the margins
    val sums = kept.agg(
      countDistinct(col("i")).as("items"),
      sum(col("c").cast(D) * col("c").cast(D)).as("ss"))
    val margins = kept.groupBy("j").agg(sum(col("c")).as("cj"))
      .agg(count(lit(1)).as("categories"),
        sum(col("cj").cast(D) * col("cj").cast(D)).as("mm"))
    val joined = sums.crossJoin(broadcast(margins))
    val nD = lit(raters.toDouble)
    val itemsD = col("items").cast(DoubleType)
    val pBar = (col("ss").cast(DoubleType) - itemsD * nD) /
      (itemsD * nD * (nD - lit(1.0)))
    val pE = col("mm").cast(DoubleType) / (itemsD * nD * (itemsD * nD))
    val kappa = when(pE < lit(1.0), (pBar - pE) / (lit(1.0) - pE))
    joined.select(col("items"), lit(raters.toLong).as("raters"),
      col("categories"),
      when(col("items") > 0L, pBar).as("p_bar"),
      when(col("items") > 0L, pE).as("p_e"),
      when(col("items") > 0L, kappa).otherwise(lit(null).cast(DoubleType)).as("kappa"))
  }

  /** Krippendorff's alpha (nominal) — the agreement measure for the
    * INCOMPLETE designs [[fleissKappa]] must drop: real annotation runs
    * have items with 2 ratings next to items with 5; alpha weighs every
    * item with ≥ 2 ratings, α = 1 − D_o/D_e over the coincidence
    * algebra. The missing-data-tolerant label-quality gate.
    *
    * Exactness: per-(item, category) counts n_uc are exact; each item's
    * disagreement Σ_c n_uc(n_u−n_uc)/(n_u−1) is a ratio of exact
    * integers (one fixed tree → pico fx → ORDER-FREE sum); the expected
    * disagreement Σ_c n_c(n−n_c) is an exact DECIMAL over the margins;
    * α = 1 − (n−1)·D_o/D_e is ONE final tree. One (item, category)
    * rollup + item- and category-bounded re-aggregates.
    *
    * @return one row: (items, n, categories, alpha) — alpha null when
    *         the expected disagreement is 0 (all mass on one category)
    *         or no item has ≥ 2 ratings.
    */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        categoryCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cells = df.select(col(itemCol).cast(StringType).as("i"),
        col(categoryCol).cast(StringType).as("j"))
      .where(col("i").isNotNull && col("j").isNotNull)
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    val nu = cells.groupBy("i").agg(sum(col("c")).as("nu"))
      .where(col("nu") >= 2L)
    val kept = cells.join(nu, "i")
      .localCheckpoint(true) // serves the D_o pass AND the margins
    // observed disagreement, pico-fx per cell: n_uc·(n_u−n_uc)/(n_u−1)
    val term = (col("c") * (col("nu") - col("c"))).cast(DoubleType) /
      (col("nu") - 1L).cast(DoubleType)
    val dObs = kept.agg(
      coalesce(sum(floor(term * lit(1e12) + lit(0.5)).cast(D)), lit(0L).cast(D))
        .as("do_fx"),
      countDistinct(col("i")).as("items"))
    val margins = kept.groupBy("j").agg(sum(col("c")).as("nc"))
    val mAgg = margins
      .crossJoin(broadcast(margins.agg(sum(col("nc")).as("n"))))
      .agg(max(col("n")).as("n"), count(lit(1)).as("categories"),
        sum(col("nc").cast(D) * (col("n") - col("nc")).cast(D)).as("de"))
    val out = dObs.crossJoin(broadcast(mAgg))
    val alpha = lit(1.0) -
      (col("n") - 1L).cast(DoubleType) *
        (col("do_fx").cast(DoubleType) / lit(1e12)) /
        col("de").cast(DoubleType)
    out.select(col("items"), col("n"), col("categories"),
      when(col("items") > 0L && col("de") > lit(0L).cast(D), alpha)
        .as("alpha"))
  }

  /** Jarque–Bera normality test — "are these residuals/values even
    * approximately normal" before any ±kσ rule is trusted: JB =
    * n/6·(S² + (K−3)²/4) from sample skewness S and kurtosis K. Under
    * normality JB ~ χ²(2); a huge JB says σ-based fences are lying.
    *
    * Exactness: raw power sums center on the exact integer floor-mean μ
    * (Σd, Σd², Σd³, Σd⁴ as exact DECIMAL(38,0) — the anovaF discipline),
    * then the shift to the true mean happens in ONE fixed double tree
    * via the binomial expansion with δ = (Σd)/n (both engines compute
    * identical doubles from identical exact integers). One μ pass + one
    * moments pass over a checkpointed projection.
    *
    * @return one row: (n, skewness, kurtosis, jb) — null stats when
    *         n < 2 or the variance is 0.
    */
  def jarqueBera(df: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df.select(col(valueCol).cast(LongType).as("v"))
      .where(col("v").isNotNull)
      .localCheckpoint(true) // one scan serves the μ pass and the moments
    val tot = rows.agg(sum(col("v").cast(D)).as("s"), count(lit(1)).as("n"))
      .collect()(0)
    val n = tot.getLong(1)
    require(n > 0, "jarqueBera needs at least one non-null row")
    val sAll = BigInt(tot.getDecimal(0).toBigInteger)
    val q0 = sAll / n
    val mu = (if (sAll.sign < 0 && q0 * n != sAll) q0 - 1 else q0).toLong
    val d = (col("v") - lit(mu)).cast(D)
    val m = rows.agg(sum(d).as("s1"), sum(d * d).as("s2"),
      sum(d * d * d).as("s3"), sum(d * d * d * d).as("s4"))
    val nD = lit(n.toDouble)
    val s1 = col("s1").cast(DoubleType); val s2 = col("s2").cast(DoubleType)
    val s3 = col("s3").cast(DoubleType); val s4 = col("s4").cast(DoubleType)
    val del = s1 / nD
    // central moments about the true mean from the μ-centered sums
    val m2 = s2 / nD - del * del
    val m3 = s3 / nD - lit(3.0) * del * (s2 / nD) + lit(2.0) * del * del * del
    val m4 = s4 / nD - lit(4.0) * del * (s3 / nD) +
      lit(6.0) * del * del * (s2 / nD) - lit(3.0) * del * del * del * del
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    val jb = nD / lit(6.0) *
      (skew * skew + (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0))
    m.select(lit(n).as("n"),
      when(lit(n) > 1L && m2 > lit(0.0), skew).as("skewness"),
      when(lit(n) > 1L && m2 > lit(0.0), kurt).as("kurtosis"),
      when(lit(n) > 1L && m2 > lit(0.0), jb).as("jb"))
  }

  /** EXACT Wilcoxon signed-rank test — the PAIRED two-sample member the
    * rank battery was missing: [[mannWhitneyU]] assumes independent
    * samples; when each row carries its OWN before/after pair (actual vs
    * forecast, metric vs last week's metric on the same key), ranking
    * the |differences| removes the per-row level entirely and asks only
    * "do the paired differences tilt positive or negative" — far more
    * power against exactly that alternative than MWU on the pooled
    * columns. Zero differences drop (the classic Wilcoxon convention);
    * W⁺ = Σ ranks of positive differences, tie-corrected normal z.
    *
    * Exactness: differences are exact longs, tie-averaged ranks of |d|
    * carry DOUBLED (w_doubled = 2·W⁺ and the Σ(t³−t) tie term are exact
    * DECIMAL(38,0) integers); z is ONE fixed double tree
    * (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − ties/48). Distributed shape:
    * identical to [[mannWhitneyU]] — one |d|-keyed shuffle with map-side
    * combine + the fused two-phase prefix scan; no global-order funnel.
    *
    * @return one row: (n, w_doubled, tie_term, z) — n = non-zero pairs;
    *         z null when the variance is 0 (all differences tied at one
    *         magnitude... n < 1) or n = 0.
    */
  def wilcoxonSignedRank(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val counts = df.select((col(aCol).cast(LongType) -
        col(bCol).cast(LongType)).as("d"))
      .where(col("d").isNotNull && col("d") =!= 0L)
      .groupBy(abs(col("d")).as("v")).agg(
        sum(when(col("d") > 0L, 1L).otherwise(0L)).as("cp"),
        count(lit(1)).as("c"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // ONE collect serves the prefix offsets AND the n/tie totals
    val totRows = parts.groupBy("__pid").agg(sum(col("c")).as("t"),
        sum(when(col("c") > 1L, col("c").cast(D) * col("c").cast(D) *
            col("c").cast(D) - col("c").cast(D))
          .otherwise(lit(0L).cast(D))).as("tt"))
      .collect()
    val totals = totRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ties = totRows.map(r => Option(r.getDecimal(2))
      .map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))).sum
    val n = totals.valuesIterator.sum
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids.zip(
      pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val dr = (col("k") - col("c")) * 2L + col("c") + 1L
    val sums = parts
      .withColumn("k", sum(col("c")).over(w) + offsetExpr)
      .agg(coalesce(sum((col("cp") * dr).cast(D)), lit(0L).cast(D)).as("w2"))
    val nD = n.toDouble
    // doubled expectation 2·n(n+1)/4 = n(n+1)/2 — exact in BigInt
    val e2 = BigInt(n) * (n + 1) / 2
    val varW = nD * (nD + 1.0) * (2.0 * nD + 1.0) / 24.0 -
      ties.toDouble / 48.0
    val z = if (n > 0 && varW > 0.0)
      (col("w2").cast(DoubleType) - lit(e2.toDouble)) / 2.0 /
        math.sqrt(varW)
    else lit(null).cast(DoubleType)
    def narrow(c: Column) = when(
      c <= lit(Long.MaxValue).cast(D) && c >= lit(Long.MinValue).cast(D),
      c.cast(LongType))
    sums.select(lit(n).as("n"), narrow(col("w2")).as("w_doubled"),
      lit(BigDecimal(ties)).cast(D).cast(DoubleType).as("tie_term"),
      z.as("z"))
  }

  /** Per-GROUP Wilcoxon signed-rank — [[wilcoxonSignedRank]] computed
    * independently per `groupCol` value: WHICH segment's paired
    * differences tilt (the drill-down that screens thousands of keys at
    * once; feed the resulting z's through [[fdrControl]]'s BH correction
    * — α = .05 on 10k segments "finds" 500 drifts in noise otherwise).
    * Group-bounded windows replace the two-phase machinery; the same
    * doubled-rank DECIMAL term tree as the ungrouped operator, so a
    * group's statistic equals the ungrouped one on that slice
    * bit-for-bit. Groups whose differences are all zero are excluded
    * (no informative pairs).
    *
    * @return per group: (groupCol, n, w_doubled, tie_term, z).
    */
  def wilcoxonSignedRankByGroup(df: DataFrame, groupCol: String,
                                aCol: String, bCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val counts = df.select(col(groupCol).as("g"),
        (col(aCol).cast(LongType) - col(bCol).cast(LongType)).as("d"))
      .where(col("g").isNotNull && col("d").isNotNull && col("d") =!= 0L)
      .groupBy(col("g"), abs(col("d")).as("v")).agg(
        sum(when(col("d") > 0L, 1L).otherwise(0L)).as("cp"),
        count(lit(1)).as("c"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val dr = (col("k") - col("c")) * 2L + col("c") + 1L
    val agg = counts
      .withColumn("k", sum(col("c")).over(wRun))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n")).as("n"),
        sum((col("cp") * dr).cast(D)).as("w2"),
        sum(when(col("c") > 1L, col("c").cast(D) * col("c").cast(D) *
            col("c").cast(D) - col("c").cast(D))
          .otherwise(lit(0L).cast(D))).as("ties"))
    val nD = col("n").cast(DoubleType)
    // doubled expectation n(n+1)/2: the decimal product casts to double
    // and halves there — /2 is exact in IEEE, so this equals the
    // ungrouped operator's BigInt-halved tree bit-for-bit
    val e2D = (col("n").cast(D) * (col("n") + 1L).cast(D))
      .cast(DoubleType) / lit(2.0)
    val varW = nD * (nD + lit(1.0)) * (lit(2.0) * nD + lit(1.0)) / lit(24.0) -
      col("ties").cast(DoubleType) / lit(48.0)
    val z = when(col("n") > 0L && varW > lit(0.0),
      (col("w2").cast(DoubleType) - e2D) / lit(2.0) /
        sqrt(varW))
    def narrow(c: Column) = when(
      c <= lit(Long.MaxValue).cast(D) && c >= lit(Long.MinValue).cast(D),
      c.cast(LongType))
    agg.select(col(groupCol), col("n"), narrow(col("w2")).as("w_doubled"),
      col("ties").cast(DoubleType).as("tie_term"), z.as("z"))
  }

  /** EXACT two-sample Wasserstein-1 (earth mover's) distance over an
    * integer-valued column: W1 = Σᵢ |F_ref(vᵢ) − F_cur(vᵢ)|·(vᵢ₊₁ − vᵢ)
    * over the merged sorted distinct values — the MAGNITUDE member of the
    * drift family. KS reports the largest CDF gap anywhere (a 1-cent shift
    * of all mass and a $100 shift score the same), PSI a bucket-designed
    * divergence, MWU a rank shift; W1 answers "how far did probability
    * mass actually move", in the column's own units. Quantize continuous
    * columns via `MetricColumns.fixedPointLong` first.
    *
    * Exactness: each segment contributes |k₁·n₂ − k₂·n₁|·Δv — exact
    * integers summed as DECIMAL(38,0) (order-free, no float-summation
    * order hazard) — and W1 is that sum over n₁·n₂ in ONE final double
    * tree, so DuckDB replays the statistic bit-for-bit.
    *
    * Distributed shape: identical to [[ksStatistic]] — one value-keyed
    * shuffle with map-side combine + the fused two-phase prefix scan. The
    * successor-value gap needs one extra trick: per-partition `lead`
    * covers all but each partition's last row, whose gap closes against
    * the next non-empty partition's broadcast first value (range
    * partitions are pid-ordered). The global maximum's term is always 0
    * (both CDFs are 1 there), so its null successor drops out exactly.
    *
    * @return one row: (n_ref, n_cur, w1) — w1 in the integer column's
    *         units (divide by 10^scale for quantized inputs).
    */
  def wasserstein1(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(LongType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // freeze pid assignment across the jobs below
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"), min(col("v")).as("v0"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val pids = totals.keys.toSeq.sorted
    def offsets(part: ((Long, Long, Long)) => Long): Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + part(totals(p))).init).toMap
    def offsetExpr(m: Map[Int, Long]) =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    // each non-empty partition's successor partition's first value — the
    // gap closer for per-partition last rows; absent key (the max pid) →
    // null → zero term, exactly the global-maximum drop-out
    val nextFirst: Map[Int, Long] =
      pids.zip(pids.tail.map(p => totals(p)._3)).toMap
    val nextFirstExpr =
      if (nextFirst.isEmpty) lit(null).cast(LongType)
      else element_at(typedlit(nextFirst), col("__pid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val cross = abs(
      col("k1").cast(DecimalType(38, 0)) * lit(n2) -
      col("k2").cast(DecimalType(38, 0)) * lit(n1))
    parts
      .withColumn("k1", sum(col("c1")).over(w) + offsetExpr(offsets(_._1)))
      .withColumn("k2", sum(col("c2")).over(w) + offsetExpr(offsets(_._2)))
      .withColumn("vn", coalesce(lead(col("v"), 1).over(w), nextFirstExpr))
      .agg(sum(when(col("vn").isNotNull,
          cross * (col("vn") - col("v")).cast(DecimalType(38, 0)))
        .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("wfx"))
      .select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
        (col("wfx").cast(DoubleType) /
          lit((BigInt(n1) * BigInt(n2)).toDouble)).as("w1"))
  }

  /** Per-GROUP exact two-sample KS: [[ksStatistic]] computed independently
    * for every value of `groupCol` (drift per language / source / shard).
    * Unlike the global statistic — whose cumulative needs the two-phase
    * prefix scan — the per-group CDFs ride ordinary `Window.partitionBy
    * (group)` running sums: partitions are group-bounded, so there is no
    * global-order funnel to avoid. Groups present on only one side are
    * excluded (no CDF to compare against). One value-keyed shuffle + one
    * group-keyed window + one group aggregate.
    */
  def ksStatisticByGroup(ref: DataFrame, cur: DataFrame, valueCol: String,
                         groupCol: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(groupCol).as("g"), col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull && col("g").isNotNull)
        .withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("g", "v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    counts
      .withColumn("k1", sum(col("c1")).over(wRun))
      .withColumn("k2", sum(col("c2")).over(wRun))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .where(col("n1") > 0L && col("n2") > 0L)
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n1")).as("n_ref"), max(col("n2")).as("n_cur"),
        max(abs(
          col("k1").cast(DoubleType) / col("n1").cast(DoubleType) -
          col("k2").cast(DoubleType) / col("n2").cast(DoubleType))).as("ks_stat"))
  }

  /** Per-GROUP exact Wasserstein-1: [[wasserstein1]] computed independently
    * per `groupCol` value — WHICH segment's distribution moved and by HOW
    * MANY units (the magnitude drilldown next to [[ksStatisticByGroup]]'s
    * largest-gap). Like the per-group KS, group-bounded `lead`/running-sum
    * windows replace the global two-phase machinery — no funnel to avoid;
    * the per-group segment terms are the same exact |k₁·n₂−k₂·n₁|·Δv
    * integers summed as DECIMAL(38,0), one double division per group.
    * Groups present on only one side are excluded.
    */
  def wasserstein1ByGroup(ref: DataFrame, cur: DataFrame, valueCol: String,
                          groupCol: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(groupCol).as("g"), col(valueCol).cast(LongType).as("v"))
        .where(col("v").isNotNull && col("g").isNotNull)
        .withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("g", "v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val cross = abs(
      col("k1").cast(DecimalType(38, 0)) * col("n2") -
      col("k2").cast(DecimalType(38, 0)) * col("n1"))
    counts
      .withColumn("k1", sum(col("c1")).over(wRun))
      .withColumn("k2", sum(col("c2")).over(wRun))
      .withColumn("vn", lead(col("v"), 1).over(wRun))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .where(col("n1") > 0L && col("n2") > 0L)
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n1")).as("n_ref"), max(col("n2")).as("n_cur"),
        sum(when(col("vn").isNotNull,
            cross * (col("vn") - col("v")).cast(DecimalType(38, 0)))
          .otherwise(lit(0L).cast(DecimalType(38, 0)))).as("wfx"))
      .select(col(groupCol), col("n_ref"), col("n_cur"),
        (col("wfx").cast(DoubleType) /
          (col("n_ref").cast(DecimalType(38, 0)) * col("n_cur"))
            .cast(DoubleType)).as("w1"))
  }

  /** Mood's rank SCALE test (Mood 1954) — the nonparametric twin of
    * [[brownForsythe]]'s variance drift: M = Σ_ref (rᵢ − (N+1)/2)² scores
    * how far the reference sample's ranks sit from the pooled CENTER —
    * sensitive to dispersion shifts with no distributional assumptions
    * at all (BF still leans on |v − median| magnitudes; ranks don't).
    *
    * Exactness: with doubled tie-averaged ranks r̄₂ = 2k − c + 1 the
    * per-value term is c₁·(2k − c − N)² — exact integers end-to-end on
    * the [[ksStatistic]] prefix machinery; M₄ = 4M is exact and z is ONE
    * fixed tree from the classical moments E[M] = n₁(N²−1)/12,
    * Var = n₁n₂(N+1)(N²−4)/180 (exact under no ties; the standard
    * approximation under ties — the statistic itself stays exact).
    *
    * @return one row: (n_ref, n_cur, m4, z).
    */
  def moodScale(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val nn = n1 + n2
    val pids = totals.keys.toSeq.sorted
    val offs = pids.zip(pids.scanLeft(0L)((a, p) =>
      a + totals(p)._1 + totals(p)._2).init).toMap
    val off = coalesce(element_at(typedlit(offs), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val c = col("c1") + col("c2")
    val dev = (col("k") * 2L - c - lit(nn)).cast(D)
    val sums = parts
      .withColumn("k", sum(c).over(w) + off)
      .agg(sum(col("c1").cast(D) * dev * dev).as("m4"))
    val n1d = lit(n1.toDouble); val n2d = lit(n2.toDouble)
    val nD = lit(nn.toDouble)
    val eM4 = n1d * (nD * nD - lit(1.0)) / lit(3.0) // 4·E[M]
    val var16 = n1d * n2d * (nD + lit(1.0)) * (nD * nD - lit(4.0)) / lit(180.0) *
      lit(16.0)
    val z = when(lit(nn) > 2L && var16 > lit(0.0),
      (col("m4").cast(DoubleType) - eM4) / sqrt(var16))
    sums.select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      col("m4").cast(DoubleType).as("m4"), z.as("z"))
  }

  /** Scalar twin of [[moodScale]] over bounded samples — the same
    * distinct-value walk, exact term and final trees, BIT-EQUAL to the
    * distributed statistic on equal value multisets (spec-asserted).
    *
    * @return (m4, z) — z NaN when degenerate (n ≤ 2).
    */
  def moodScaleOfSamples(ref: Seq[Double], cur: Seq[Double]): (Double, Double) = {
    require(ref.nonEmpty && cur.nonEmpty, "both samples need values")
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val nn = n1 + n2
    val all = (ref.map((_, 1)) ++ cur.map((_, 2))).sortBy(_._1)
    var i = 0
    var k = 0L
    var m4 = BigInt(0)
    while (i < all.length) {
      var j = i
      var c1 = 0L
      while (j < all.length && all(j)._1 == all(i)._1) {
        if (all(j)._2 == 1) c1 += 1
        j += 1
      }
      val c = (j - i).toLong
      k += c
      val dev = BigInt(2 * k - c - nn)
      m4 += BigInt(c1) * dev * dev
      i = j
    }
    val n1d = n1.toDouble; val n2d = n2.toDouble; val nD = nn.toDouble
    val eM4 = n1d * (nD * nD - 1.0) / 3.0
    val var16 = n1d * n2d * (nD + 1.0) * (nD * nD - 4.0) / 180.0 * 16.0
    val z = if (nn > 2 && var16 > 0.0) (m4.toDouble - eM4) / math.sqrt(var16)
            else Double.NaN
    (m4.toDouble, z)
  }

  /** Friedman test — the REPEATED-MEASURES member of the rank battery:
    * [[kruskalWallis]] assumes independent groups; when every block
    * (day, user, site) measures ALL k treatments, ranking WITHIN blocks
    * removes the block effect entirely ("do event types keep a stable
    * volume ordering across days" — a day-level surge can't fake it).
    * Tie-corrected Conover form: χ²_F = (k−1)·Σ(Rⱼ−n(k+1))²/(A₄−C₄)
    * over doubled within-block ranks.
    *
    * Exactness: doubled tie-averaged ranks r₂ = 2·rank + t − 1 are exact
    * longs from block-bounded windows (blocks are k-sized — no funnel);
    * Σr₂ per treatment, A₄ = Σr₂², C₄ = n·k(k+1)² are exact integers and
    * the statistic is ONE final tree. INCOMPLETE blocks (missing a
    * treatment) are dropped — the standard complete-design requirement.
    *
    * @return one row: (treatments, blocks, chi2_f) — null when every
    *         block ranks fully tied (A₄ = C₄).
    */
  def friedman(df: DataFrame, blockCol: String, treatmentCol: String,
               valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df.select(col(blockCol).cast(StringType).as("b"),
        col(treatmentCol).cast(StringType).as("t"),
        col(valueCol).cast(LongType).as("v"))
      .where(col("b").isNotNull && col("t").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // serves the k-count, completeness AND ranks
    val k = rows.select("t").distinct().count()
    require(k >= 2, "need at least 2 treatments")
    val complete = rows
      .withColumn("__kb", size(collect_set(col("t")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("b"))))
      .withColumn("__nb", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("b")))
      .where(col("__kb") === lit(k) && col("__nb") === lit(k))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy("v")
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("b", "v")
    val ranked = complete
      .withColumn("__r2", rank().over(wB).cast(LongType) * 2L +
        count(lit(1)).over(wT) - 1L)
    val perT = ranked.groupBy("t").agg(sum(col("__r2")).as("r2"),
      count(lit(1)).as("nb"))
    val a4 = ranked.agg(sum((col("__r2") * col("__r2")).cast(D)).as("a4"))
    val agg = perT.crossJoin(broadcast(a4))
      .withColumn("__dev", col("r2").cast(D) -
        col("nb").cast(D) * lit(k + 1).cast(D))
      .agg(max(col("nb")).as("blocks"), max(col("a4")).as("a4d"),
        sum(col("__dev") * col("__dev")).as("sdev"))
    val c4 = col("blocks").cast(D) * lit(k).cast(D) *
      lit((k + 1) * (k + 1)).cast(D)
    val den = col("a4d") - c4
    val chi2 = when(den > lit(0L).cast(D),
      lit((k - 1).toDouble) * col("sdev").cast(DoubleType) /
        den.cast(DoubleType))
    agg.select(lit(k).as("treatments"), col("blocks"), chi2.as("chi2_f"))
  }

  /** Per-GROUP tie-adjusted Anderson–Darling — [[andersonDarling]]
    * computed independently per `groupCol` value: WHICH segment's tails
    * moved (the drill-down next to [[ksStatisticByGroup]]'s largest-gap
    * and [[wasserstein1ByGroup]]'s magnitude). Group-bounded windows
    * replace the global two-phase machinery; the same long-arithmetic
    * milli-fx term tree as the ungrouped operator below per-group
    * N ≤ 2³⁰ (the single-sample long-route bound), and past it the SAME
    * per-row decimal fallback the ungrouped operator takes — routed by a
    * per-row `when` on the group's N (the group size isn't known at plan
    * time, so the route rides the column instead of a driver measurement;
    * only the selected branch evaluates). A group's a2 therefore equals
    * the ungrouped statistic on that group's slice bit-for-bit at any
    * group size. Groups present on only one side are excluded.
    */
  def andersonDarlingByGroup(ref: DataFrame, cur: DataFrame, valueCol: String,
                             groupCol: String): DataFrame =
    andersonDarlingByGroupRouted(ref, cur, valueCol, groupCol, 1L << 30)

  /** [[andersonDarlingByGroup]] with the long→decimal route threshold
    * exposed — `longRouteMax = 0` forces every group onto the decimal
    * branch (route-parity specs). */
  private[graft] def andersonDarlingByGroupRouted(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      groupCol: String, longRouteMax: Long): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(groupCol).as("g"), col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull && col("g").isNotNull)
        .withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("g", "v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val l = col("c1") + col("c2")
    val nn = col("n1") + col("n2")
    // b2/m2 stay long on BOTH branches (≤ 2N — exact to N = 2⁶²,
    // mirroring the ungrouped decimal branch); only the quadratic
    // products route: g ≤ 2N², den₄ ≤ N² exceed a long past N = 2³⁰.
    val b2 = col("k") * 2L - l
    val m2 = col("k1") * 2L - col("c1")
    val (termFxL, termFxD) = {
      val gg = nn * m2 - col("n1") * b2
      val den4 = b2 * (nn * 2L - b2) - nn * l
      val termD = l.cast(DoubleType) * gg.cast(DoubleType) * gg.cast(DoubleType) /
        den4.cast(DoubleType)
      val ggD = nn.cast(D) * m2.cast(D) - col("n1").cast(D) * b2.cast(D)
      val den4D = b2.cast(D) * (nn.cast(D) * lit(2L).cast(D) - b2.cast(D)) -
        nn.cast(D) * l.cast(D)
      val termDD = l.cast(DoubleType) * ggD.cast(DoubleType) * ggD.cast(DoubleType) /
        den4D.cast(DoubleType)
      (when(den4 > lit(0L), floor(termD * lit(1000.0) + lit(0.5))).otherwise(lit(0L)),
       when(den4D > lit(0L).cast(D), floor(termDD * lit(1000.0) + lit(0.5))).otherwise(lit(0L)))
    }
    val termFx = when(nn <= lit(longRouteMax), termFxL)
      .otherwise(termFxD).cast(D)
    val agg = counts
      .withColumn("k", sum(l).over(wRun))
      .withColumn("k1", sum(col("c1")).over(wRun))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .where(col("n1") > 0L && col("n2") > 0L)
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n1")).as("n_ref"), max(col("n2")).as("n_cur"),
        sum(termFx).as("__sfx"))
    val nD = (col("n_ref") + col("n_cur")).cast(DoubleType)
    val a2 = (nD - lit(1.0)) / nD *
      (lit(1.0) / col("n_ref").cast(DoubleType) +
        lit(1.0) / col("n_cur").cast(DoubleType)) *
      (col("__sfx").cast(DoubleType) / lit(1000.0)) / nD
    agg.select(col(groupCol), col("n_ref"), col("n_cur"),
      col("__sfx").cast(DoubleType).as("sum_fx"), a2.as("a2"))
  }

  /** Per-GROUP Cramér–von Mises — [[cramerVonMises]] computed
    * independently per `groupCol` value: WHICH segment's whole CDF moved
    * (the uniform-weight drill-down completing the by-group battery next
    * to [[ksStatisticByGroup]]'s largest gap, [[wasserstein1ByGroup]]'s
    * magnitude and [[andersonDarlingByGroup]]'s tails). Group-bounded
    * windows replace the two-phase machinery; the same DECIMAL doubled-
    * rank term tree as the ungrouped operator, so a group's t equals the
    * ungrouped statistic on that group's slice bit-for-bit. Groups
    * present on only one side are excluded.
    */
  def cramerVonMisesByGroup(ref: DataFrame, cur: DataFrame, valueCol: String,
                            groupCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(groupCol).as("g"), col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull && col("g").isNotNull)
        .withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("g", "v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val c = col("c1") + col("c2")
    def drOf(k: Column, cc: Column) = (k - cc) * 2L + cc + 1L
    val d1 = (drOf(col("k"), c) - drOf(col("k1"), col("c1"))).cast(D)
    val d2 = (drOf(col("k"), c) - drOf(col("k2"), col("c2"))).cast(D)
    val zero = lit(0L).cast(D)
    val agg = counts
      .withColumn("k", sum(c).over(wRun))
      .withColumn("k1", sum(col("c1")).over(wRun))
      .withColumn("k2", sum(col("c2")).over(wRun))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .where(col("n1") > 0L && col("n2") > 0L)
      .groupBy(col("g").as(groupCol))
      .agg(max(col("n1")).as("n_ref"), max(col("n2")).as("n_cur"),
        sum(when(col("c1") > 0L, col("c1").cast(D) * d1 * d1).otherwise(zero)).as("a1"),
        sum(when(col("c2") > 0L, col("c2").cast(D) * d2 * d2).otherwise(zero)).as("a2"))
    val u4 = (col("n_ref").cast(D) * col("a1") + col("n_cur").cast(D) * col("a2"))
    val n1d = col("n_ref").cast(DoubleType)
    val n2d = col("n_cur").cast(DoubleType)
    val nD = (col("n_ref") + col("n_cur")).cast(DoubleType)
    val t = u4.cast(DoubleType) / lit(4.0) / (n1d * n2d * nD) -
      (lit(4.0) * n1d * n2d - lit(1.0)) / (lit(6.0) * nD)
    agg.select(col(groupCol), col("n_ref"), col("n_cur"),
      u4.cast(DoubleType).as("u4"), t.as("t"))
  }

  /** Mantel–Haenszel stratified 2×2 association — "is the exposure→
    * outcome association REAL once the stratifying confounder is held
    * fixed" (Simpson's-paradox insurance the pooled χ² famously lacks):
    * per stratum the 2×2 cells, the common odds ratio
    * OR = Σ(ad/n)/Σ(bc/n) and the MH χ² with the ½ continuity
    * correction, (|Σ(a−E)|−½)²/ΣV.
    *
    * Exactness: cells are exact longs from ONE grouped aggregate;
    * per-stratum a−E = (a·n − (a+b)(a+c))/n, V, ad/n and bc/n are each
    * ONE fixed tree truncated to nano fixed-point (order-free sums); OR
    * and χ² are final trees.
    *
    * @return one row: (strata, n, or_mh, chi2_mh) — null OR when the
    *         denominator mass is 0, null χ² when ΣV = 0.
    */
  def mantelHaenszel(df: DataFrame, stratumCol: String, exposure: Column,
                     outcome: Column): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df.select(col(stratumCol).cast(StringType).as("st"),
        exposure.cast("boolean").as("e"), outcome.cast("boolean").as("y"))
      .where(col("st").isNotNull && col("e").isNotNull && col("y").isNotNull)
    val cells = rows.groupBy("st").agg(
      sum(when(col("e") && col("y"), 1L).otherwise(0L)).as("a"),
      sum(when(col("e") && !col("y"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("e") && col("y"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("e") && !col("y"), 1L).otherwise(0L)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast(DoubleType)
    val aD = col("a").cast(DoubleType); val bD = col("b").cast(DoubleType)
    val cD = col("c").cast(DoubleType); val dD = col("d").cast(DoubleType)
    val aMinusE = (aD * n - (aD + bD) * (aD + cD)) / n
    val v = (aD + bD) * (cD + dD) * (aD + cD) * (bD + dD) /
      (n * n * (n - lit(1.0)))
    def fx(c: Column) = when(n > lit(1.0),
      when(c >= 0, floor(c * lit(1e9) + lit(0.5)))
        .otherwise(-floor(-c * lit(1e9) + lit(0.5)))).otherwise(lit(0L)).cast(D)
    val agg = cells.agg(count(lit(1)).as("strata"),
      sum(col("a") + col("b") + col("c") + col("d")).as("n"),
      sum(fx(aMinusE)).as("__ae"), sum(fx(v)).as("__v"),
      sum(fx(aD * dD / n)).as("__adn"), sum(fx(bD * cD / n)).as("__bcn"))
    val orMh = when(col("__bcn") > lit(0L).cast(D),
      col("__adn").cast(DoubleType) / col("__bcn").cast(DoubleType))
    val aeAbs = abs(col("__ae").cast(DoubleType) / lit(1e9)) - lit(0.5)
    val chi2 = when(col("__v") > lit(0L).cast(D),
      aeAbs * aeAbs / (col("__v").cast(DoubleType) / lit(1e9)))
    agg.select(col("strata"), col("n"), orMh.as("or_mh"), chi2.as("chi2_mh"))
  }

  /** Hill tail-index estimator — the heavy-tail diagnostic next to the
    * Zipf/Heaps corpus-health fits: over the top-k order statistics,
    * α = k / Σ ln(xᵢ/x₍k₊₁₎); α ≤ 2 means infinite variance (length
    * budgets and mean-based SLAs silently break), α large means thin
    * tails. Positive values only.
    *
    * Exactness: the top-(k+1) VALUE multiset is deterministic (ties at
    * the cut carry equal values); per-value ln terms truncate to pico
    * fixed-point and sum order-free; α is one final tree. The top-k sort
    * is a bounded limit (never a global collect of the column).
    *
    * @return one row: (k, x_tail, alpha) — null α when fewer than k+1
    *         positive values or a zero log-sum.
    */
  def hillEstimator(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "need k >= 2")
    val top = df.select(col(valueCol).cast(LongType).as("v"))
      .where(col("v").isNotNull && col("v") > 0L)
      .orderBy(col("v").desc).limit(k + 1)
      .localCheckpoint(true) // one bounded sort serves the tail min AND the sum
    val cnt = top.count()
    val lnFx = graft.metrics.MetricColumns.fixedPointLong(
      log(col("v").cast(DoubleType)), 12)
    val agg = top.agg(min(col("v")).as("x_tail"), sum(lnFx).as("__slog"),
      min(lnFx).as("__ltail"))
    val num = (col("__slog") - col("__ltail") - lit(k.toLong) * col("__ltail"))
      .cast(DoubleType) / lit(1e12)
    val alpha = when(lit(cnt) === lit((k + 1).toLong) && num > lit(0.0),
      lit(k.toDouble) / num)
    agg.select(lit(k.toLong).as("k"), col("x_tail"), alpha.as("alpha"))
  }

  /** Exact two-sample KS of two BOUNDED in-memory samples (merge walk over
    * the sorted values) — the driver-side companion of [[ksStatistic]] for
    * sketch-sized inputs (e.g. per-window bottom-k samples from
    * [[graft.streaming.StreamingMonitor.ksSketchStream]]). Same double tree
    * (count/size divisions, abs, max), so when a sample IS the full data
    * (k ≥ distinct keys) the result equals the distributed statistic
    * bit-for-bit.
    */
  def ksOfSamples(a: Seq[Double], b: Seq[Double]): Double = {
    require(a.nonEmpty && b.nonEmpty, "both samples need values")
    val sa = a.sorted.toArray
    val sb = b.sorted.toArray
    var i = 0; var j = 0; var ks = 0.0
    while (i < sa.length || j < sb.length) {
      val v = if (j >= sb.length || (i < sa.length && sa(i) <= sb(j))) sa(i) else sb(j)
      while (i < sa.length && sa(i) == v) i += 1
      while (j < sb.length && sb(j) == v) j += 1
      val gap = math.abs(i.toDouble / sa.length - j.toDouble / sb.length)
      if (gap > ks) ks = gap
    }
    ks
  }

  /** Two-sample χ² homogeneity test over a CATEGORICAL column — the
    * categorical member of the drift family (PSI/KS/MWU are numeric):
    * did the category MIX shift between reference and current? Expected
    * counts from the pooled margin; the statistic is the standard
    * Σ (observed − expected)²/expected over both sides.
    *
    * Exactness: a double Σ over arbitrary-order categories is
    * order-DEPENDENT in the low bits, so the statistic accumulates as
    * FIXED-POINT integers instead: per category and side,
    * term_ppm = ⌊(cᵢ·n − t·nᵢ)² · 10⁶ div (n·t·nᵢ)⌋ — exact integer
    * arithmetic, order-free, engine-portable (this is the scaled form of
    * (cᵢ − t·nᵢ/n)²/(t·nᵢ/n)). One category-keyed shuffle with map-side
    * combine; category cardinality bounds everything downstream.
    *
    * @return one row: (n_ref, n_cur, categories, chi2_ppm) — χ² · 10⁶ as
    *         BIGINT; df = categories − 1.
    */
  def chiSquareCategorical(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(colName).cast(StringType).as("k"))
        .where(col("k").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("k").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val tot = counts.agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        count(lit(1)).as("cats"))
      .collect()(0)
    val n1 = tot.getLong(0); val n2 = tot.getLong(1); val cats = tot.getLong(2)
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val n = n1 + n2
    val D = DecimalType(38, 0)
    // `div` (INTEGRAL division) on decimals truncates exactly like both
    // engines' `//` — a decimal `/` would round at its result scale BEFORE
    // a floor, an off-by-one-ppm trap at near-integer quotients
    def termSql(c: String, ni: Long) =
      s"(($c * ${n}L - t * ${ni}L) * ($c * ${n}L - t * ${ni}L) * 1000000L)" +
        s" div (t * ${n}L * ${ni}L)"
    counts
      .select((col("c1") + col("c2")).cast(D).as("t"),
        col("c1").cast(D).as("d1"), col("c2").cast(D).as("d2"))
      .selectExpr(s"${termSql("d1", n1)} as t1", s"${termSql("d2", n2)} as t2")
      .agg(sum(col("t1") + col("t2")).cast(LongType).as("chi2_ppm"))
      .select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
        lit(cats).as("categories"), col("chi2_ppm"))
  }

  /** Driver-side twin of [[mannWhitneyU]] over collected samples — the
    * per-window MWU for streaming drift: pair each
    * [[graft.streaming.StreamingMonitor.ksSketchStream]] window sample
    * against a static reference (exact when the sketches cover the
    * windows; a hash-uniform subsample's statistic otherwise). Same
    * doubled-rank exact arithmetic, same outputs (u_doubled, tie_term,
    * auc, z — None on zero variance). Sample sizes are sketch-bounded, so
    * the merge is trivially driver-safe.
    */
  def mwuOfSamples(ref: Seq[Double], cur: Seq[Double]): (Long, Long, Double, Option[Double]) = {
    require(ref.nonEmpty && cur.nonEmpty, "both samples need values")
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val all = (ref.map((_, 1)) ++ cur.map((_, 2))).sortBy(_._1)
    var i = 0
    var cumLt = 0L
    var r1d = 0L
    var ties = 0L
    while (i < all.length) {
      var j = i
      var c1 = 0L
      while (j < all.length && all(j)._1 == all(i)._1) {
        if (all(j)._2 == 1) c1 += 1
        j += 1
      }
      val c = (j - i).toLong
      val dr = 2 * cumLt + c + 1
      r1d += c1 * dr
      if (c > 1) ties += c * c * c - c
      cumLt += c
      i = j
    }
    val u1d = r1d - n1 * (n1 + 1)
    val n = n1 + n2
    val auc = u1d.toDouble / 2.0 / (n1.toDouble * n2.toDouble)
    val sig2 = n1.toDouble * n2.toDouble / 12.0 *
      ((n + 1).toDouble - ties.toDouble / (n.toDouble * (n - 1).toDouble))
    val z = if (sig2 > 0.0)
      Some((u1d.toDouble / 2.0 - n1.toDouble * n2.toDouble / 2.0) / math.sqrt(sig2))
    else None
    (u1d, ties, auc, z)
  }

  /** Scalar twin of [[cramerVonMises]] over bounded value samples — the
    * per-window integrated-CDF drift verdict for streaming (the same
    * coordinated bottom-k sample feed the ks/mwu/w1 monitors ride).
    * Identical doubled tie-averaged ranks on both levels and the
    * identical final tree, so it is BIT-EQUAL to the distributed
    * statistic on equal value multisets (spec-asserted); sample-exact
    * when the sketch covers the window.
    *
    * @return (u4, t) — u4 = 4U as a double of the exact integer.
    */
  def cvmOfSamples(ref: Seq[Double], cur: Seq[Double]): (Double, Double) = {
    require(ref.nonEmpty && cur.nonEmpty, "both samples need values")
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val all = (ref.map((_, 1)) ++ cur.map((_, 2))).sortBy(_._1)
    var i = 0
    var k = 0L; var k1 = 0L; var k2 = 0L
    var a1 = BigInt(0); var a2 = BigInt(0)
    while (i < all.length) {
      var j = i
      var c1 = 0L
      while (j < all.length && all(j)._1 == all(i)._1) {
        if (all(j)._2 == 1) c1 += 1
        j += 1
      }
      val c = (j - i).toLong
      val c2 = c - c1
      val dr = 2 * k + c + 1
      if (c1 > 0) { val d = dr - (2 * k1 + c1 + 1); a1 += BigInt(c1) * BigInt(d) * BigInt(d) }
      if (c2 > 0) { val d = dr - (2 * k2 + c2 + 1); a2 += BigInt(c2) * BigInt(d) * BigInt(d) }
      k += c; k1 += c1; k2 += c2
      i = j
    }
    val u4 = BigInt(n1) * a1 + BigInt(n2) * a2
    val n1d = n1.toDouble; val n2d = n2.toDouble; val nD = (n1 + n2).toDouble
    val t = u4.toDouble / 4.0 / (n1d * n2d * nD) -
      (4.0 * n1d * n2d - 1.0) / (6.0 * nD)
    (u4.toDouble, t)
  }

  /** Scalar twin of [[energyDistance]] over bounded INTEGER-VALUED
    * samples (same `.toLong` contract as [[w1OfSamples]]) — the
    * per-window all-moments drift verdict for streaming. The same
    * gap-weighted prefix-count products and final trees, so it is
    * BIT-EQUAL to the distributed statistic on equal value multisets
    * (spec-asserted).
    *
    * @return (e, t_stat).
    */
  def energyOfSamples(ref: Seq[Double], cur: Seq[Double]): (Double, Double) = {
    require(ref.nonEmpty && cur.nonEmpty, "both samples need values")
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val all = (ref.map(v => (v.toLong, 1)) ++ cur.map(v => (v.toLong, 2)))
      .sortBy(_._1)
    var i = 0; var k1 = 0L; var k2 = 0L
    var sab = BigInt(0); var saa = BigInt(0); var sbb = BigInt(0)
    while (i < all.length) {
      val v = all(i)._1
      var j = i
      while (j < all.length && all(j)._1 == v) {
        if (all(j)._2 == 1) k1 += 1 else k2 += 1
        j += 1
      }
      if (j < all.length) {
        val gap = BigInt(all(j)._1 - v)
        sab += gap * (BigInt(k1) * (n2 - k2) + BigInt(k2) * (n1 - k1))
        saa += gap * (BigInt(k1) * (n1 - k1))
        sbb += gap * (BigInt(k2) * (n2 - k2))
      }
      i = j
    }
    val n1d = n1.toDouble; val n2d = n2.toDouble
    val e = 2.0 * sab.toDouble / (n1d * n2d) - 2.0 * saa.toDouble / (n1d * n1d) -
      2.0 * sbb.toDouble / (n2d * n2d)
    (e, n1d * n2d / (n1d + n2d) * e)
  }

  /** Two-proportion z-test: did a RATE move between two populations —
    * conversion, validity, defect, match rate — the Bernoulli member of
    * the drift family (KS/MWU/W1 need a numeric column; this needs only a
    * boolean). Pooled-variance z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) with
    * p̂ the pooled rate — the classic A/B-test statistic. Counts are exact
    * longs from one 1-row aggregate per side; every derived double follows
    * one fixed tree, engine-portable. z NULL when the pooled variance is 0
    * (all-success/all-failure in both).
    *
    * @param successCol boolean Column evaluated on each side's rows; NULL
    *                   rows are excluded (not counted as failures).
    * @return one row: (n_ref, x_ref, n_cur, x_cur, p_ref, p_cur, diff, z).
    */
  def proportionTest(ref: DataFrame, cur: DataFrame,
                     successCol: Column): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select(successCol.cast("boolean").as("__b"))
        .where(col("__b").isNotNull)
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(when(col("__b"), 1L).otherwise(0L)).as(s"x_$tag"))
    val m = side(ref, "ref").crossJoin(side(cur, "cur"))
    val n1 = col("n_ref").cast(DoubleType); val x1 = col("x_ref").cast(DoubleType)
    val n2 = col("n_cur").cast(DoubleType); val x2 = col("x_cur").cast(DoubleType)
    val p1 = x1 / n1; val p2 = x2 / n2
    val pPool = (x1 + x2) / (n1 + n2)
    val varTerm = pPool * (lit(1.0) - pPool) * (lit(1.0) / n1 + lit(1.0) / n2)
    m.select(
      col("n_ref"), col("x_ref"), col("n_cur"), col("x_cur"),
      when(col("n_ref") > 0, p1).as("p_ref"),
      when(col("n_cur") > 0, p2).as("p_cur"),
      when(col("n_ref") > 0 && col("n_cur") > 0, p1 - p2).as("diff"),
      when(col("n_ref") > 0 && col("n_cur") > 0 && varTerm > 0.0,
        (p1 - p2) / sqrt(varTerm)).as("z"))
  }

  /** Scalar twin of [[proportionTest]] for bounded per-window counts (the
    * [[graft.streaming.StreamingMonitor.rateStream]] output vs a static
    * reference): the IDENTICAL double tree over the four exact counts, so
    * it is bit-equal to the distributed statistic on equal counts
    * (spec-asserted). Returns (p_ref, p_cur, diff, z) — z None when the
    * pooled variance is 0.
    */
  def propTestOfCounts(nRef: Long, xRef: Long, nCur: Long,
                       xCur: Long): (Double, Double, Double, Option[Double]) = {
    require(nRef > 0 && nCur > 0, "both sides need rows")
    val n1 = nRef.toDouble; val x1 = xRef.toDouble
    val n2 = nCur.toDouble; val x2 = xCur.toDouble
    val p1 = x1 / n1; val p2 = x2 / n2
    val pPool = (x1 + x2) / (n1 + n2)
    val varTerm = pPool * (1.0 - pPool) * (1.0 / n1 + 1.0 / n2)
    val z = if (varTerm > 0.0) Some((p1 - p2) / math.sqrt(varTerm)) else None
    (p1, p2, p1 - p2, z)
  }

  /** Benjamini–Hochberg FDR control over a battery of p-values — the
    * multiple-testing layer the drift family needs at scale: scanning
    * 10 000 columns/segments for drift at α=0.05 hands you ~500 false
    * alarms by construction; BH caps the FALSE-DISCOVERY fraction at α
    * while keeping far more power than Bonferroni. Adds the 1-based
    * p-rank, the BH-adjusted q-value (suffix-min of p·n/rank, capped at
    * 1), and the reject flag (q ≤ α — exactly the classic step-up rule).
    *
    * Distributed shape: the global ascending (p, tie) rank rides the
    * two-phase range-partition discipline ([[ksStatistic]]'s), and the
    * adjusted q needs a REVERSE running min — per-partition descending
    * running min + broadcast suffix-mins of the LATER partitions (the
    * prefix machinery mirrored). No global-order window anywhere. The
    * only arithmetic is p·n/rank and min — one fixed tree, engine-exact.
    *
    * @param tieCols deterministic tie-break for equal p (e.g. the test
    *                name) — makes ranks, q and the output replayable.
    * @return input + (p_rank, bh_q, reject), NULL-p rows excluded.
    */
  def fdrControl(df: DataFrame, pCol: String, alpha: Double,
                 tieCols: Seq[String]): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(tieCols.nonEmpty, "need a deterministic tie-break column")
    val orderCols = col(pCol) +: tieCols.map(col)
    val parts = df.where(col(pCol).isNotNull)
      .repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // freeze pid assignment across the jobs below
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(orderCols: _*)
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid")
      .orderBy((col(pCol).desc +: tieCols.map(col(_).desc)): _*)
    val totals = parts.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = totals.valuesIterator.sum
    require(n > 0, "no non-null p-values")
    val pids = totals.keys.toSeq.sorted
    val rankOffsets: Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val ranked = parts
      .withColumn("p_rank", row_number().over(w).cast(LongType) +
        coalesce(element_at(typedlit(rankOffsets), col("__pid")), lit(0L)))
      .withColumn("__f", least(
        col(pCol).cast(DoubleType) * lit(n.toDouble) /
          col("p_rank").cast(DoubleType), lit(1.0)))
    // suffix min of __f: per-partition min collected once, each partition
    // folds in the min over all LATER partitions (driver-bounded map)
    val partMins = ranked.groupBy("__pid").agg(min(col("__f")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val suffixAfter: Map[Int, Double] = pids.zip(
      pids.tail.scanRight(Double.MaxValue)((p, acc) =>
        math.min(partMins(p), acc))).toMap
    val suffixExpr =
      if (pids.size <= 1) lit(Double.MaxValue)
      else coalesce(element_at(typedlit(suffixAfter), col("__pid")),
        lit(Double.MaxValue))
    ranked
      .withColumn("bh_q", least(min(col("__f")).over(wDesc), suffixExpr))
      .withColumn("reject", col("bh_q") <= lit(alpha))
      .drop("__pid", "__f")
  }

  /** Scalar twin of [[wasserstein1]] for the sketch-bounded window samples
    * the KS/MWU monitors collect ([[graft.streaming.StreamingMonitor
    * .ksSketchStream]]) — per-window "how far did the mass move" against a
    * static reference, on the driver, at sample cost. Values truncate to
    * longs exactly like the distributed column cast; the accumulator is a
    * BigInt of the SAME |k₁·n₂−k₂·n₁|·Δv integer terms and the final
    * division replays the distributed decimal→double tree, so the twin is
    * BIT-EQUAL to [[wasserstein1]] on equal frames (spec-asserted).
    */
  def w1OfSamples(ref: Seq[Double], cur: Seq[Double]): Double = {
    require(ref.nonEmpty && cur.nonEmpty, "both samples need values")
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val all = (ref.map(v => (v.toLong, 1)) ++ cur.map(v => (v.toLong, 2)))
      .sortBy(_._1)
    var i = 0; var k1 = 0L; var k2 = 0L
    var acc = BigInt(0)
    while (i < all.length) {
      val v = all(i)._1
      var j = i
      while (j < all.length && all(j)._1 == v) {
        if (all(j)._2 == 1) k1 += 1 else k2 += 1
        j += 1
      }
      if (j < all.length)
        acc += BigInt(math.abs(k1 * n2 - k2 * n1)) * (all(j)._1 - v)
      i = j
    }
    acc.toDouble / (BigInt(n1) * BigInt(n2)).toDouble
  }

  /** Scalar twin of [[chiSquareCategorical]] over bounded (category → count)
    * maps — the per-window categorical drift verdict for streaming
    * ([[graft.streaming.StreamingMonitor.categoryCountStream]] windows vs a
    * static reference). The SAME truncated fixed-point terms
    * ((cᵢ·n − t·nᵢ)²·10⁶ div (n·t·nᵢ)) accumulate as BigInts (BigInt `/` on
    * the non-negative square truncates exactly like both engines' decimal
    * `div`), so the twin is BIT-EQUAL to the distributed statistic on equal
    * counts (spec-asserted). Zero-count entries are ignored (a category the
    * batch counts frame would never contain).
    *
    * @return (n_ref, n_cur, categories, chi2_ppm)
    */
  def chi2OfCounts(ref: Map[String, Long], cur: Map[String, Long]): (Long, Long, Long, Long) = {
    val n1 = ref.valuesIterator.sum
    val n2 = cur.valuesIterator.sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val n = n1 + n2
    def term(c: Long, ni: Long, t: Long): BigInt = {
      val d = BigInt(c) * n - BigInt(t) * ni
      d * d * 1000000 / (BigInt(t) * n * ni)
    }
    val cats = (ref.keySet ++ cur.keySet).filter(k =>
      ref.getOrElse(k, 0L) + cur.getOrElse(k, 0L) > 0)
    var acc = BigInt(0)
    cats.foreach { k =>
      val c1 = ref.getOrElse(k, 0L)
      val c2 = cur.getOrElse(k, 0L)
      val t = c1 + c2
      acc += term(c1, n1, t) + term(c2, n2, t)
    }
    (n1, n2, cats.size.toLong, acc.toLong)
  }

  def psiBuckets(ref: DataFrame, cur: DataFrame, valueCol: String,
                 lo: Double, hi: Double, buckets: Int,
                 eps: Double = 1e-6): DataFrame =
    psiOfCountFrames(ref.sparkSession,
      bucketCounts(ref, valueCol, lo, hi, buckets, "ref_cnt"),
      bucketCounts(cur, valueCol, lo, hi, buckets, "cur_cnt"), buckets, eps)

  /** Equi-width bucket counts of one side — ONE scan + a buckets-sized
    * aggregate. Shared by the two-frame PSI, the persisted reference, and
    * (arithmetic-wise) the streaming monitor.
    */
  private def bucketCounts(df: DataFrame, valueCol: String, lo: Double,
                           hi: Double, buckets: Int, cntName: String): DataFrame = {
    val c = col(valueCol).cast(DoubleType)
    val width = (hi - lo) / buckets.toDouble
    val b = when(c.isNull || lit(width) <= 0.0, lit(null).cast(LongType))
      .otherwise(least(floor((c - lit(lo)) / lit(width)).cast(LongType), lit(buckets.toLong - 1)))
    // clamp AFTER the null filter — greatest(null, 0) is 0 in Spark
    // (greatest skips nulls), which would silently bucket missing values
    df.select(b.as("b_raw")).where(col("b_raw").isNotNull)
      .select(greatest(col("b_raw"), lit(0L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(cntName))
  }

  /** The shared PSI tail: spine join of two (bucket, cnt) frames + the
    * fixed-point per-bucket contribution. Both callers run the IDENTICAL
    * expression tree, so a persisted reference reproduces the two-frame
    * result bit-for-bit.
    */
  private def psiOfCountFrames(spark: org.apache.spark.sql.SparkSession,
                               refCnt: DataFrame, curCnt: DataFrame,
                               buckets: Int, eps: Double): DataFrame = {
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    val joined = spine
      .join(refCnt, Seq("bucket"), "left")
      .join(curCnt, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"))
    val nRef = sum(col("ref_cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    val nCur = sum(col("cur_cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    def prop(cnt: Column, n: Column): Column =
      greatest(cnt.cast(DoubleType) / n.cast(DoubleType), lit(eps))
    val p = prop(col("ref_cnt"), nRef)
    val q = prop(col("cur_cnt"), nCur)
    joined.withColumn("psi_fx",
      graft.metrics.MetricColumns.fixedPointLong((p - q) * log(p / q), 6))
  }

  /** Total PSI from [[psiBuckets]] output. */
  def psiTotal(bucketsDf: DataFrame): Double =
    bucketsDf.agg(sum("psi_fx")).collect()(0).getLong(0) / 1e6

  /** A persisted PSI reference distribution: the bucket geometry plus the
    * buckets-sized count vector of the reference scan — the train-once /
    * serve-many artifact of the drift family (same pattern as the bigram-LM
    * and IVF-quantizer artifacts). Persisting COUNTS (not proportions)
    * keeps the eps floor and all divisions inside the one shared expression
    * tree, so a reloaded reference is bit-identical to the in-memory path.
    */
  final case class PsiReference(lo: Double, hi: Double, buckets: Int, counts: Seq[Long]) {
    /** The count vector [[graft.streaming.StreamingMonitor.psiOfWindows]]
      * bootstraps from.
      */
    def refCounts: Seq[Long] = counts
  }

  /** Build the reference from a scan of `ref` — bounded driver result
    * (`buckets` longs).
    */
  def buildPsiReference(ref: DataFrame, valueCol: String,
                        lo: Double, hi: Double, buckets: Int): PsiReference = {
    val byBucket = bucketCounts(ref, valueCol, lo, hi, buckets, "cnt")
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
    PsiReference(lo, hi, buckets, (0 until buckets).map(b => byBucket.getOrElse(b.toLong, 0L)))
  }

  def savePsiReference(spark: org.apache.spark.sql.SparkSession,
                       r: PsiReference, path: String): Unit = {
    import spark.implicits._
    r.counts.zipWithIndex.map { case (c, b) => (b.toLong, c) }
      .toDF("bucket", "cnt").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/buckets")
    Seq((r.lo, r.hi, r.buckets)).toDF("lo", "hi", "n_buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadPsiReference(spark: org.apache.spark.sql.SparkSession, path: String): PsiReference = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val n = meta.getAs[Int]("n_buckets")
    val byBucket = spark.read.parquet(s"$path/buckets")
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
    PsiReference(meta.getAs[Double]("lo"), meta.getAs[Double]("hi"), n,
      (0 until n).map(b => byBucket.getOrElse(b.toLong, 0L)))
  }

  /** PSI of `cur` against a (possibly reloaded) reference — the monitoring
    * shape where last month's scan is the baseline and only today's data is
    * scanned. Output schema and values identical to [[psiBuckets]] run on
    * the original reference frame.
    */
  def psiBucketsVsReference(reference: PsiReference, cur: DataFrame,
                            valueCol: String, eps: Double = 1e-6): DataFrame = {
    val spark = cur.sparkSession
    import spark.implicits._
    val refCnt = reference.counts.zipWithIndex
      .map { case (c, b) => (b.toLong, c) }.toDF("bucket", "ref_cnt")
    psiOfCountFrames(spark, refCnt,
      bucketCounts(cur, valueCol, reference.lo, reference.hi, reference.buckets, "cur_cnt"),
      reference.buckets, eps)
  }

  /** EXACT Kruskal–Wallis H — the K-SAMPLE member of the rank-drift family:
    * [[mannWhitneyU]] asks "did these TWO populations shift"; this asks
    * "are these k segments (languages, sources, shards) even drawn from
    * the same distribution" in ONE test, instead of k·(k−1)/2 pairwise
    * MWUs with a multiple-testing problem.
    *
    * Exactness discipline (same as [[chiSquareCategorical]]): tie-averaged
    * ranks carry as DOUBLED integer ranks; per-group terms use the
    * MEAN-CENTERED form H = 12/(N(N+1))·Σᵢ Dᵢ²/(4nᵢ) with
    * Dᵢ = Rᵢᵈ − nᵢ(N+1) (the doubled deviation from the expected doubled
    * rank sum — centering keeps the squares data-scaled, not N²-scaled),
    * truncated to ppm integers via decimal `div` so the cross-group sum is
    * order-free and engine-portable; tie correction C = 1 − Σ(t³−t)/(N³−N)
    * from exact integers; only the final H is a fixed double tree.
    *
    * Distributed shape: one (value, group) shuffle with map-side combine,
    * one value-keyed rollup + the fused prefix scan of [[ksStatistic]],
    * one broadcast-joined rank attach, one k-row group rollup. Nothing
    * driver-side beyond partition totals and the 1-row tie aggregate.
    *
    * Honest range: the ppm term (nᵢ(N+1))²·10⁶ must fit DECIMAL(38,0) ⇒
    * nᵢ·N ≲ 3·10¹⁵ — beyond ~10⁸ balanced rows drop the ppm scale (the
    * statistic's magnitude dwarfs ppm precision there anyway).
    *
    * @return one row: (groups, n, tie_term, h) — df = groups − 1.
    */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df.select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(DoubleType).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
    val cells = rows.groupBy("v", "g").agg(count(lit(1)).as("cg"))
    val vals = cells.groupBy("v").agg(sum(col("cg")).as("c"))
    val parts = vals.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // ONE collect serves the prefix offsets AND the tie term (the tie sum
    // rides the same per-pid aggregate — no second materialization of the
    // ranked frame and no separate tie job; values identical, Σ per-pid
    // ≡ the global Σ(c³−c))
    // c³−c evaluates in LONG codegen below c ≈ 2.1M ties on one value
    // (the common case) and in decimal past it; either way ONE decimal
    // cast feeds the sum instead of three per-row decimal products —
    // the sum itself stays decimal (Σc³ can pass BIGINT even when every
    // term fits). Value-identical to the all-decimal tree.
    val tieTerm = when(col("c") > 2000000L,
        col("c").cast(D) * col("c").cast(D) * col("c").cast(D) - col("c").cast(D))
      .otherwise((col("c") * col("c") * col("c") - col("c")).cast(D))
    val totRows = parts.groupBy("__pid").agg(sum(col("c")).as("t"),
        sum(when(col("c") > 1L, tieTerm).otherwise(lit(0L).cast(D))).as("tt"))
      .collect()
    val totals = totRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ties = totRows.map(r => Option(r.getDecimal(2))
      .map(d => BigInt(d.toBigInteger)).getOrElse(BigInt(0))).sum
      .bigInteger.longValueExact()
    val n = totals.valuesIterator.sum
    require(n > 0, "kruskalWallis needs at least one non-null row")
    val pids = totals.keys.toSeq.sorted
    val offs = pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val offExpr =
      if (offs.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offs), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val ranked = parts
      .withColumn("k", sum(col("c")).over(w) + offExpr)
      // doubled tie-averaged 1-based rank of value v: 2·cum_lt + c + 1
      .withColumn("dr", (col("k") - col("c")) * 2L + col("c") + 1L)
    // per-group doubled rank sums (values side is distinct-values-sized;
    // AQE broadcasts it under the threshold, shuffles otherwise). Σ cg·dr
    // ≤ n(2n+1), so below ~1.5e9 rows the products sum as PLAIN LONGS
    // (codegen) and cast to decimal once per group — the per-cell
    // decimal-cast+add tree only runs past that measured bound.
    // the rank side is distinct-values-sized; AQE converts the join under
    // its threshold (a FORCED broadcast was benched 0.5 s SLOWER here —
    // the build side serializes the whole window subplan through the
    // driver, where the shuffle join streams it)
    val rankSide = ranked.select("v", "dr")
    val byG =
      if (n < 1500000000L)
        cells.join(rankSide, Seq("v"))
          .groupBy("g").agg(
            sum(col("cg")).as("ng"),
            sum(col("cg") * col("dr")).cast(D).as("rd"))
      else
        cells.join(rankSide, Seq("v"))
          .groupBy("g").agg(
            sum(col("cg")).as("ng"),
            sum((col("cg") * col("dr")).cast(D)).as("rd"))
    // centered ppm term: ⌊(Rᵢᵈ − nᵢ(N+1))² · 10⁶ div (4nᵢ)⌋ — decimal `div`
    // truncates exactly like DuckDB's `//` (see chiSquareCategorical)
    val stats = byG
      .selectExpr("ng",
        s"((rd - CAST(ng AS DECIMAL(38,0)) * ${n + 1}L) * " +
          s"(rd - CAST(ng AS DECIMAL(38,0)) * ${n + 1}L) * 1000000L) " +
          "div (CAST(ng AS DECIMAL(38,0)) * 4L) as term_ppm")
      .agg(count(lit(1)).as("groups"),
        sum(col("term_ppm")).cast(D).as("h_num_ppm"))
    val nD = n.toDouble
    // fixed double trees (replicated in the oracle): centered H needs no
    // −3(N+1) term; tie correction divides once
    val hRaw = lit(12.0) / (lit(nD) * lit(nD + 1.0)) *
      (col("h_num_ppm").cast(DoubleType) / lit(1e6))
    val corr = lit(1.0) -
      lit(ties.toDouble) / (lit(nD) * lit(nD) * lit(nD) - lit(nD))
    stats.select(col("groups"), lit(n).as("n"), lit(ties).as("tie_term"),
      when(corr > 0.0, hRaw / corr).as("h"))
  }

  /** One-way ANOVA F — the MEAN-SHIFT k-sample member of the drift family
    * ([[kruskalWallis]] is its rank twin): did the group MEANS move apart
    * relative to within-group spread? Quantize continuous columns via
    * `MetricColumns.fixedPointLong` first (same contract as KS/MWU/W1).
    *
    * Exactness: values center by the integer grand mean μ = S div N first
    * (shift-invariance keeps SSB/SSW identical while the squared sums stay
    * data-scaled instead of N²·value²-scaled); per-group moments
    * (nᵢ, sᵢ=Σy, qᵢ=Σy²) are exact DECIMAL(38,0); the per-group terms
    * ssbᵢ = (sᵢN − S'nᵢ)²/(nᵢN²) and sswᵢ = (qᵢnᵢ − sᵢ²)/nᵢ evaluate as
    * ONE fixed double tree each and `floor` to integers (error ≤ 1 per
    * group on statistics of magnitude ~10¹⁵ — the chi2_ppm tradeoff), so
    * the cross-group sums are order-free; F is one final double tree.
    *
    * @return one row: (groups, n, ssb, ssw, f) — ssb/ssw as doubles
    *         round-nearest from the exact floored-integer sums (the sums
    *         exceed BIGINT past ~10⁸ rows·σ²; the double view is the
    *         scale-honest output); df = (groups−1, n−groups).
    */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df.select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(LongType).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // one scan serves the μ pass and the moments
    val tot = rows.agg(sum(col("v").cast(D)).as("s"), count(lit(1)).as("n"),
        max(abs(col("v"))).as("va")).collect()(0)
    val n = tot.getLong(1)
    require(n > 0, "anovaF needs at least one non-null row")
    val s = BigInt(tot.getDecimal(0).toBigInteger)
    // FLOOR division (DuckDB's `//`), not BigInt's truncate-toward-zero —
    // they differ on negative sums
    val q0 = s / n
    val mu = (if (s.sign < 0 && q0 * n != s) q0 - 1 else q0).toLong
    val sRem = (s - BigInt(mu) * n).toLong // S' = Σ(v−μ), 0 ≤ S' < N
    // Moment route, MEASURED off the same 1-row aggregate the μ pass
    // already pays (max|v| rides along): per-row DECIMAL y·y + decimal
    // sums cost ~20× the long path on a wide scan (the fixedPointLong
    // lesson), but Σy² exceeds BIGINT at corpus scale — so when the
    // measured |y| ≤ 2·max|v| and row count keep every partial in range,
    // sum y² as a SPLIT pair of longs (hi = q div 10⁹, lo = q mod 10⁹ —
    // both codegen'd) and recombine exactly; otherwise the decimal trees
    // run unchanged. Both routes produce the identical exact integers.
    val maxAbsY = 2.0 * tot.getLong(2).toDouble + 1.0
    val longSafe = maxAbsY <= 3.0e9 &&
      n.toDouble * maxAbsY < 8.0e18 && // Σ|y| partials fit a long
      n.toDouble * (maxAbsY * maxAbsY / 1e9 + 1.0) < 8.0e18 // Σhi, Σlo fit
    val byG = if (longSafe) {
      val yl = col("v") - lit(mu)
      // pre-project y and y² ONCE (no cross-aggregate CSE in Spark)
      rows.select(col("g"), yl.as("__y"), (yl * yl).as("__q"))
        .groupBy("g").agg(
          count(lit(1)).as("ng"),
          sum(col("__y")).cast(D).as("sg"),
          (sum(expr("__q div 1000000000")).cast(D) * lit(1000000000L).cast(D) +
            sum(expr("__q % 1000000000")).cast(D)).as("qg"))
    } else {
      val y = (col("v") - lit(mu)).cast(D)
      rows.groupBy("g").agg(
        count(lit(1)).as("ng"),
        sum(y).as("sg"),
        sum(y * y).as("qg"))
    }
    // per-group fixed double trees, floored to order-free integers
    val ngD = col("ng").cast(DoubleType)
    val sgD = col("sg").cast(DoubleType)
    val qgD = col("qg").cast(DoubleType)
    val nD = n.toDouble
    val dI = sgD * lit(nD) - lit(sRem.toDouble) * ngD
    val ssbTerm = floor(dI * dI / (ngD * lit(nD) * lit(nD))).cast(D)
    val sswTerm = floor((qgD * ngD - sgD * sgD) / ngD).cast(D)
    val stats = byG.agg(count(lit(1)).as("groups"),
      sum(ssbTerm).as("ssb"), sum(sswTerm).as("ssw"))
    stats.select(col("groups"), lit(n).as("n"),
        col("ssb").cast(DoubleType).as("ssb"),
        col("ssw").cast(DoubleType).as("ssw"),
        when(col("groups") > 1 && lit(n) > col("groups") &&
             col("ssw").cast(DoubleType) > 0.0,
          (col("ssb").cast(DoubleType) / (col("groups") - 1).cast(DoubleType)) /
          (col("ssw").cast(DoubleType) / (lit(nD) - col("groups").cast(DoubleType))))
          .as("f"))
  }

  /** Cliff's delta — the ORDINAL EFFECT SIZE companion to [[mannWhitneyU]]:
    * δ = (#(ref > cur) − #(ref < cur))/(n₁n₂) ∈ [−1, 1], the
    * "how big is the shift" number next to MWU's "is there a shift" z
    * (at 10⁹ rows everything is significant; δ says whether it matters).
    * Derived exactly from the doubled U: δ = u_d/(n₁n₂) − 1 (ties count
    * half in U, cancelling in the difference). Magnitude bands follow
    * Romano et al. 2006: |δ| < .147 negligible, < .33 small, < .474
    * medium, else large.
    *
    * Same distributed shape and exact integers as [[mannWhitneyU]]; one
    * extra fixed double tree for δ.
    *
    * @return one row: (n_ref, n_cur, u_doubled, delta, magnitude).
    */
  def cliffsDelta(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val mwu = mannWhitneyU(ref, cur, valueCol)
    val delta = col("u_doubled").cast(DoubleType) /
      (col("n_ref").cast(DoubleType) * col("n_cur").cast(DoubleType)) - lit(1.0)
    mwu.select(col("n_ref"), col("n_cur"), col("u_doubled"),
      delta.as("delta"),
      when(abs(delta) < 0.147, "negligible")
        .when(abs(delta) < 0.33, "small")
        .when(abs(delta) < 0.474, "medium")
        .otherwise("large").as("magnitude"))
  }

  /** McNemar's test over PAIRED booleans — the model-comparison member of
    * the drift family: [[proportionTest]] compares rates of two DIFFERENT
    * populations; McNemar compares two RULES on the SAME rows (old vs new
    * quality filter, two annotators, champion vs challenger classifier),
    * where only the DISAGREEING pairs carry information. χ² = (b−c)²/(b+c)
    * over b = #(a-only), c = #(b-only); the agreeing diagonal is reported
    * but never enters the statistic.
    *
    * Exactness: one 1-row aggregate of exact long counts (rows where
    * either side is NULL are excluded); χ² is ONE fixed double tree, NULL
    * when the rules never disagree. Distributed shape: a single scan with
    * conditional sums — nothing else.
    *
    * @param aCol,bCol boolean Columns evaluated on each row.
    * @return one row: (n, both, only_a, only_b, neither, chi2).
    */
  def mcnemar(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val valid = aCol.isNotNull && bCol.isNotNull
    def cnt(p: Column) = sum(when(valid && p, 1L).otherwise(0L))
    val agg = df.agg(
      cnt(lit(true)).as("n"),
      cnt(aCol && bCol).as("both"),
      cnt(aCol && !bCol).as("only_a"),
      cnt(!aCol && bCol).as("only_b"),
      cnt(!aCol && !bCol).as("neither"))
    val b = col("only_a").cast(DoubleType)
    val c = col("only_b").cast(DoubleType)
    agg.select(col("n"), col("both"), col("only_a"), col("only_b"),
      col("neither"),
      when(col("only_a") + col("only_b") > 0L,
        (b - c) * (b - c) / (b + c)).as("chi2"))
  }

  /** Jensen–Shannon divergence between two CATEGORICAL distributions — the
    * bounded, symmetric divergence member of the drift family:
    * [[chiSquareCategorical]] answers "is the mix shift significant",
    * JSD answers "how FAR apart are the mixes" on a fixed [0, ln 2] scale
    * that never blows up on categories one side lacks (KL's infinity),
    * so it's comparable across columns and over time.
    *
    * Exactness (the vocabKlBySlice discipline): per-category terms
    * ½(p·ln(p/m) + q·ln(q/m)) with m = (p+q)/2 evaluate as ONE fixed
    * double tree from exact integer counts, truncate to 10⁻¹² fixed-point
    * longs (terms are ≤ ln 2, so pico precision costs nothing), and sum
    * order-free; zero-count sides contribute their q·ln 2 term exactly.
    * One category-keyed shuffle with map-side combine.
    *
    * @return one row: (n_ref, n_cur, categories, js_fx, js) — js in nats,
    *         js_fx = ⌊js·10¹²⌋ summed per category.
    */
  def jsDivergence(ref: DataFrame, cur: DataFrame, colName: String): DataFrame = {
    def side(df: DataFrame, flag: Int) =
      df.select(col(colName).cast(StringType).as("k"))
        .where(col("k").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("k").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val tot = counts.agg(
        sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
        count(lit(1)).as("cats"))
      .collect()(0)
    val n1 = tot.getLong(0); val n2 = tot.getLong(1); val cats = tot.getLong(2)
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    // p = c1/n1, q = c2/n2, m = (p+q)/2; 0·ln(0/m) ≡ 0. One fixed tree:
    // term = ½(p·ln(2p/(p+q)) + q·ln(2q/(p+q))) — written exactly so in SQL
    val p = col("c1").cast(DoubleType) / lit(n1.toDouble)
    val q = col("c2").cast(DoubleType) / lit(n2.toDouble)
    val term =
      when(col("c1") > 0L, p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0)) * 0.5 +
      when(col("c2") > 0L, q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0)) * 0.5
    counts
      .select(graft.metrics.MetricColumns.fixedPointLong(term, 12).as("fx"))
      .agg(sum(col("fx")).cast(LongType).as("js_fx"))
      .select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
        lit(cats).as("categories"), col("js_fx"),
        (col("js_fx").cast(DoubleType) / lit(1e12)).as("js"))
  }

  /** Welch's t — the UNEQUAL-VARIANCE two-sample mean drift test, the
    * parametric member between [[proportionTest]] (rates) and [[anovaF]]
    * (k-sample, pooled variance): "did the mean move" when the two sides'
    * spreads differ (post-deploy latency, re-crawled doc lengths), where
    * the pooled-variance t is anticonservative. Quantize continuous
    * columns via `MetricColumns.fixedPointLong` first (the KS/MWU/W1
    * contract).
    *
    * Exactness ([[anovaF]]'s discipline): both sides center by the global
    * FLOOR-division grand mean (shift invariance keeps means-difference
    * and variances identical while squares stay data-scaled); per-side
    * moments (n, Σy, Σy²) are exact DECIMAL(38,0); t, the Welch–
    * Satterthwaite df and the sample variances are ONE fixed double tree
    * over those integers — any engine, same bits.
    *
    * Distributed shape: the union scans once (checkpoint serves the μ
    * pass and the moments), one 2-group aggregate; nothing driver-side
    * beyond the two moment rows.
    *
    * @return one row: (n_ref, n_cur, mean_ref, mean_cur, var_ref,
    *         var_cur, t, df) — means/variances in the input's fixed-point
    *         units; t/df null unless both sides have ≥ 2 rows and the
    *         combined standard error is positive.
    */
  def welchT(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(LongType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val rows = side(ref, 1).unionByName(side(cur, 2))
      .localCheckpoint(true) // one scan serves the μ pass and the moments
    val tot = rows.agg(sum(col("v").cast(D)).as("s"), count(lit(1)).as("n"))
      .collect()(0)
    val n = tot.getLong(1)
    require(n > 0, "welchT needs at least one non-null row")
    val sAll = BigInt(tot.getDecimal(0).toBigInteger)
    // FLOOR division (DuckDB's `//`) — see anovaF
    val q0 = sAll / n
    val mu = (if (sAll.sign < 0 && q0 * n != sAll) q0 - 1 else q0).toLong
    val y = (col("v") - lit(mu)).cast(D)
    val m = rows.groupBy("s").agg(count(lit(1)).as("ng"),
        sum(y).as("sg"), sum(y * y).as("qg"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)))))
      .toMap
    require(m.contains(1) && m.contains(2),
      s"both sides need rows (ref=${m.get(1).map(_._1).getOrElse(0L)}, " +
        s"cur=${m.get(2).map(_._1).getOrElse(0L)})")
    val (n1, s1, q1) = m(1); val (n2, s2, q2) = m(2)
    // fixed double trees (replicated verbatim in the oracle)
    val n1d = lit(n1.toDouble); val n2d = lit(n2.toDouble)
    val s1d = lit(s1.toDouble); val s2d = lit(s2.toDouble)
    val q1d = lit(q1.toDouble); val q2d = lit(q2.toDouble)
    val muD = lit(mu.toDouble)
    val var1 = (q1d * n1d - s1d * s1d) / (n1d * (n1d - lit(1.0)))
    val var2 = (q2d * n2d - s2d * s2d) / (n2d * (n2d - lit(1.0)))
    val se1 = var1 / n1d
    val se2 = var2 / n2d
    val se = se1 + se2
    val tStat = (s1d / n1d - s2d / n2d) / sqrt(se)
    val dfW = se * se / (se1 * se1 / (n1d - lit(1.0)) + se2 * se2 / (n2d - lit(1.0)))
    val ok = n1 >= 2 && n2 >= 2
    ref.sparkSession.range(1).select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      (muD + s1d / n1d).as("mean_ref"), (muD + s2d / n2d).as("mean_cur"),
      (if (n1 >= 2) var1 else lit(null).cast(DoubleType)).as("var_ref"),
      (if (n2 >= 2) var2 else lit(null).cast(DoubleType)).as("var_cur"),
      (if (ok) when(se > 0.0, tStat) else lit(null).cast(DoubleType)).as("t"),
      (if (ok) when(se > 0.0, dfW) else lit(null).cast(DoubleType)).as("df"))
  }

  /** Scalar twin of [[welchT]] over RAW integer moments (n, Σv, Σv²) —
    * the per-window half of the streaming `welch_reference:` monitor
    * ([[graft.streaming.StreamingMonitor.momentStream]] supplies the
    * window's moments; the reference's load once). Replays welchT
    * EXACTLY: the union grand mean μ = ⌊(S₁+S₂)/(N₁+N₂)⌋ (floor
    * division), centered moments via the integer identities
    * Σ(v−μ) = S − nμ and Σ(v−μ)² = Q − 2μS + nμ², then the IDENTICAL
    * double tree — bit-equal to the distributed statistic on the same
    * rows (spec-asserted), with no sample-coverage caveat (moments are
    * exact at any window size).
    *
    * @return (mean_ref, mean_cur, var_ref, var_cur, t, df) — variances
    *         None under 2 rows, t/df None unless both sides ≥ 2 and
    *         se > 0.
    */
  def welchOfMoments(n1: Long, s1Raw: BigInt, q1Raw: BigInt,
                     n2: Long, s2Raw: BigInt, q2Raw: BigInt)
      : (Double, Double, Option[Double], Option[Double], Option[Double], Option[Double]) = {
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val n = n1 + n2
    val sAll = s1Raw + s2Raw
    val q0 = sAll / n
    val mu = if (sAll.sign < 0 && q0 * n != sAll) q0 - 1 else q0
    def centered(nn: Long, s: BigInt, q: BigInt): (BigInt, BigInt) =
      (s - mu * nn, q - mu * s * 2 + mu * mu * nn)
    val (s1, q1) = centered(n1, s1Raw, q1Raw)
    val (s2, q2) = centered(n2, s2Raw, q2Raw)
    val n1d = n1.toDouble; val n2d = n2.toDouble
    val s1d = s1.toDouble; val s2d = s2.toDouble
    val q1d = q1.toDouble; val q2d = q2.toDouble
    val muD = mu.toDouble
    val var1 = (q1d * n1d - s1d * s1d) / (n1d * (n1d - 1.0))
    val var2 = (q2d * n2d - s2d * s2d) / (n2d * (n2d - 1.0))
    val se1 = var1 / n1d
    val se2 = var2 / n2d
    val se = se1 + se2
    val ok = n1 >= 2 && n2 >= 2
    val t = if (ok && se > 0.0) Some((s1d / n1d - s2d / n2d) / math.sqrt(se)) else None
    val dfW = if (ok && se > 0.0)
      Some(se * se / (se1 * se1 / (n1d - 1.0) + se2 * se2 / (n2d - 1.0))) else None
    (muD + s1d / n1d, muD + s2d / n2d,
      if (n1 >= 2) Some(var1) else None, if (n2 >= 2) Some(var2) else None,
      t, dfW)
  }

  /** CUPED covariate adjustment (Deng et al. WSDM 2013) — the
    * experimentation-platform variance reducer: ŷ = y − θ(x − x̄) with
    * θ = cov(x,y)/var(x) over a PRE-period covariate strips the variance
    * x explains, so the same A/B test needs ~(1 − ρ²)× the sample for
    * the same power, without biasing the treatment effect (E[ŷ] = E[y]).
    * The adjusted column feeds the existing drift tests
    * ([[welchT]]/[[mannWhitneyU]]) directly.
    *
    * Exactness: θ and x̄ derive from EXACT fixed-point co-moments (the
    * corrPairs hi/lo split) as one double tree each, bound as literals;
    * the per-row adjustment is one further fixed tree over the row's
    * fixed-point longs — every output bit engine-replayable. One scan for
    * the moments (1-row exchange), one row-local projection.
    *
    * @return df + `<metricCol>_adj` in the metric's fixed-point units
    *         (scale-descaled), null where either side is null.
    */
  def cuped(df: DataFrame, metricCol: String, covariateCol: String,
            scale: Int = 2): DataFrame = {
    import graft.ops.Correlation
    val Dbl = DoubleType
    val base = df
      .withColumn("__fx_x",
        graft.metrics.MetricColumns.fixedPointLong(col(covariateCol).cast(Dbl), scale))
      .withColumn("__fx_y",
        graft.metrics.MetricColumns.fixedPointLong(col(metricCol).cast(Dbl), scale))
    val aggs = Correlation.pairAggs(col("__fx_x"), col("__fx_y"), "c")
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val n = col("n_c").cast(DecimalType(38, 0))
    val sx = col("sx_c"); val sy = col("sy_c")
    val sxx = graft.metrics.MetricColumns.sumsqTotal("xx_c")
    val sxy = graft.metrics.MetricColumns.sumprodTotal("xy_c")
    val num = (n * sxy - sx * sy).cast(Dbl)
    val den = (n * sxx - sx * sx).cast(Dbl)
    val statsSel = stats.select(
      when(den > 0.0, num / den).as("__theta"),
      (sx.cast(Dbl) / col("n_c").cast(Dbl)).as("__mx"))
    val deScale = lit(math.pow(10, scale))
    base.crossJoin(broadcast(statsSel))
      .withColumn(s"${metricCol}_adj",
        when(col("__fx_x").isNotNull && col("__fx_y").isNotNull &&
             col("__theta").isNotNull,
          (col("__fx_y").cast(Dbl) -
            col("__theta") * (col("__fx_x").cast(Dbl) - col("__mx"))) / deScale))
      .drop("__fx_x", "__fx_y", "__theta", "__mx")
  }

  /** Brown–Forsythe test — the k-sample VARIANCE drift member (the
    * robust Levene variant): did the group SPREADS move apart, the
    * question [[anovaF]]/[[kruskalWallis]] (location) and [[welchT]]
    * (two-sample mean) don't ask — a quality score whose variance doubles
    * per segment is drifting even with stable means. W = the [[anovaF]] F
    * computed over zᵢⱼ = |vᵢⱼ − medianᵢ|.
    *
    * Exactness: group medians use the LOWER+UPPER-middle convention kept
    * DOUBLED (md = v⌈n/2⌉ + v⌊n/2⌋₊₁ over the per-group sorted values), so
    * z = |2v − md| stays an exact long — no .5 ever materializes; the
    * ANOVA stage is [[anovaF]] verbatim (grand-mean centering, floored
    * per-group terms).
    *
    * Distributed shape: one (group, value) rollup, per-group running
    * windows over the DISTINCT-VALUE frame (group-bounded — the
    * ksStatisticByGroup discipline), a skinny k-row median frame joined
    * back (AQE broadcast), then the anovaF pass. Values quantize via
    * `MetricColumns.fixedPointLong` first.
    *
    * @return one row: (groups, n, ssb, ssw, f) — f is the Brown–Forsythe
    *         W on the doubled deviations (scale-free as a test statistic).
    */
  def brownForsythe(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val rows = df.select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(LongType).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // serves the median rollup AND the z pass
    val cells = rows.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("v")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val meds = cells
      .withColumn("k", sum(col("c")).over(wRun))
      .withColumn("ng", sum(col("c")).over(wAll))
      // 1-based lower middle ⌈n/2⌉ = (n+1) div 2; upper middle n div 2 + 1
      // (integer div — Column./ on longs is DOUBLE division)
      .groupBy("g").agg(
        (min(when(col("k") >= expr("(ng + 1) div 2"), col("v"))) +
         min(when(col("k") >= expr("ng div 2 + 1"), col("v")))).as("md"))
    val z = rows.join(meds, Seq("g"))
      .select(col("g"), abs(col("v") * 2L - col("md")).as("z"))
    anovaF(z, "z", "g")
  }

  /** EXACT two-sample energy distance (Székely–Rizzo) — the
    * all-moments member of the drift family: KS sees the largest CDF gap,
    * W1 the mean mass transport; the energy statistic
    * E = 2·E|X−Y| − E|X−X′| − E|Y−Y′| responds to ANY distributional
    * difference (location, scale, shape) and its nm/(n+m)-scaled form is
    * the classic energy two-sample test statistic.
    *
    * Exactness: all three pairwise-|·| sums reduce to gap-weighted
    * prefix-count products over the merged distinct values —
    * Σ|x−y| = Σ_gaps gap·(k₁(n₂−k₂) + k₂(n₁−k₁)), Σ|x−x′| = Σ gap·k₁(n₁−k₁)
    * — exact DECIMAL(38,0) integers on [[wasserstein1]]'s two-phase
    * prefix machinery (range partition + per-partition running sums +
    * driver offsets); E and the test statistic are ONE fixed double tree.
    *
    * @return one row: (n_ref, n_cur, sum_cross, sum_ref, sum_cur, e,
    *         t_stat) — sums as doubles of the exact integers (they exceed
    *         BIGINT at scale), e in the input's fixed-point units,
    *         t_stat = n₁n₂/(n₁+n₂)·e.
    */
  def energyDistance(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(LongType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // freeze pid assignment across the jobs below
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"), min(col("v")).as("v0"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val pids = totals.keys.toSeq.sorted
    def offsets(part: ((Long, Long, Long)) => Long): Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + part(totals(p))).init).toMap
    def offsetExpr(m: Map[Int, Long]) =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    val nextFirst: Map[Int, Long] =
      pids.zip(pids.tail.map(p => totals(p)._3)).toMap
    val nextFirstExpr =
      if (nextFirst.isEmpty) lit(null).cast(LongType)
      else element_at(typedlit(nextFirst), col("__pid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val gap = (col("vn") - col("v")).cast(D)
    def pairTerm(kc: Column, nOther: Long, kOther: Column) =
      kc.cast(D) * (lit(nOther) - kOther)
    val zero = lit(0L).cast(D)
    val sums = parts
      .withColumn("k1", sum(col("c1")).over(w) + offsetExpr(offsets(_._1)))
      .withColumn("k2", sum(col("c2")).over(w) + offsetExpr(offsets(_._2)))
      .withColumn("vn", coalesce(lead(col("v"), 1).over(w), nextFirstExpr))
      .agg(
        sum(when(col("vn").isNotNull,
          gap * (pairTerm(col("k1"), n2, col("k2")) +
                 pairTerm(col("k2"), n1, col("k1")))).otherwise(zero)).as("sab"),
        sum(when(col("vn").isNotNull,
          gap * pairTerm(col("k1"), n1, col("k1"))).otherwise(zero)).as("saa"),
        sum(when(col("vn").isNotNull,
          gap * pairTerm(col("k2"), n2, col("k2"))).otherwise(zero)).as("sbb"))
    val n1d = lit(n1.toDouble); val n2d = lit(n2.toDouble)
    val e = lit(2.0) * col("sab").cast(DoubleType) / (n1d * n2d) -
      lit(2.0) * col("saa").cast(DoubleType) / (n1d * n1d) -
      lit(2.0) * col("sbb").cast(DoubleType) / (n2d * n2d)
    sums.select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      col("sab").cast(DoubleType).as("sum_cross"),
      col("saa").cast(DoubleType).as("sum_ref"),
      col("sbb").cast(DoubleType).as("sum_cur"),
      e.as("e"), (n1d * n2d / (n1d + n2d) * e).as("t_stat"))
  }

  /** Two-sample Cramér–von Mises — the INTEGRATED-CDF drift member: KS
    * scores only the single largest CDF gap (a narrow spike and a broad
    * shift can tie); CvM integrates the squared gap over the whole
    * distribution, so diffuse drift that KS under-weights scores
    * proportionally. T = U/(n₁n₂N) − (4n₁n₂−1)/(6N) with
    * U = n₁Σᵢ(rᵢ−i)² + n₂Σⱼ(sⱼ−j)² (Anderson's rank form).
    *
    * Exactness: combined AND own-sample ranks carry as DOUBLED
    * tie-averaged integers (the [[mannWhitneyU]] discipline — this
    * operator's tie convention: average ranks on both levels), so every
    * squared deviation is an exact integer; U rides DECIMAL(38,0) at 4×
    * scale (u4 = 4U); T is one final double tree. Same two-phase prefix
    * machinery and one extra per-side running sum.
    *
    * @return one row: (n_ref, n_cur, u4, t) — u4 = 4U as a double of the
    *         exact decimal (U ~ n²m² exceeds BIGINT at scale).
    */
  def cramerVonMises(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val pids = totals.keys.toSeq.sorted
    def offsets(part: ((Long, Long)) => Long): Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + part(totals(p))).init).toMap
    def offsetExpr(m: Map[Int, Long]) =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val c = col("c1") + col("c2")
    def drOf(k: Column, cc: Column) = (k - cc) * 2L + cc + 1L
    val d1 = (drOf(col("k"), c) - drOf(col("k1"), col("c1"))).cast(D)
    val d2 = (drOf(col("k"), c) - drOf(col("k2"), col("c2"))).cast(D)
    val zero = lit(0L).cast(D)
    val sums = parts
      .withColumn("k", sum(c).over(w) + offsetExpr(offsets(t => t._1 + t._2)))
      .withColumn("k1", sum(col("c1")).over(w) + offsetExpr(offsets(_._1)))
      .withColumn("k2", sum(col("c2")).over(w) + offsetExpr(offsets(_._2)))
      .agg(
        sum(when(col("c1") > 0L, col("c1").cast(D) * d1 * d1).otherwise(zero)).as("a1"),
        sum(when(col("c2") > 0L, col("c2").cast(D) * d2 * d2).otherwise(zero)).as("a2"))
    val u4 = (lit(n1).cast(D) * col("a1") + lit(n2).cast(D) * col("a2"))
    val n1d = lit(n1.toDouble); val n2d = lit(n2.toDouble)
    val nD = lit((n1 + n2).toDouble)
    val t = u4.cast(DoubleType) / lit(4.0) / (n1d * n2d * nD) -
      (lit(4.0) * n1d * n2d - lit(1.0)) / (lit(6.0) * nD)
    sums.select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      u4.cast(DoubleType).as("u4"), t.as("t"))
  }

  /** EXACT two-sample Anderson–Darling (Scholz–Stephens 1987 A²akN, the
    * tie-adjusted midrank version) — the TAIL-weighted member of the drift
    * family: [[cramerVonMises]] integrates the squared CDF gap uniformly,
    * AD weights it by 1/(F(1−F)) so departures in the tails (where
    * training-data contamination hides) score disproportionately. Under
    * the null E[A²] ≈ k−1 = 1.
    *
    * Exactness: over merged distinct values the doubled midrank pooled
    * cumulative B₂ = 2k−l and doubled ref cumulative M₂ = 2k₁−c₁ are exact
    * longs; g = N·M₂ − n₁·B₂ and den₄ = B₂(2N−B₂) − N·l are exact
    * DECIMAL(38,0) (two-sample symmetry: g₂ = −g₁, so ONE g² serves both
    * sides' Σ 1/nᵢ terms); each value's term l·g²/den₄ is ONE fixed double
    * tree → milli fixed-point → order-free integer sum (milli keeps
    * floor's long input bounded: term·10³ ≤ ~4·10¹⁴·l at sf0.1); A² is one
    * final tree. Same two-phase prefix machinery as [[cramerVonMises]]
    * (range partition + per-partition running sums + driver offsets — no
    * single-partition window at scale).
    *
    * @return one row: (n_ref, n_cur, sum_fx, a2) — a2 is A²akN.
    */
  def andersonDarling(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(DoubleType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val counts = side(ref, 1).unionByName(side(cur, 2))
      .groupBy("v").agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("s") === 2, 1L).otherwise(0L)).as("c2"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parts.groupBy("__pid")
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n1 = totals.valuesIterator.map(_._1).sum
    val n2 = totals.valuesIterator.map(_._2).sum
    require(n1 > 0 && n2 > 0, s"both sides need rows (ref=$n1, cur=$n2)")
    val nn = n1 + n2
    val pids = totals.keys.toSeq.sorted
    def offsets(part: ((Long, Long)) => Long): Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + part(totals(p))).init).toMap
    def offsetExpr(m: Map[Int, Long]) =
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val l = col("c1") + col("c2")
    // measured route on N: below 2^30 rows every intermediate
    // (g ≤ 2N², den₄ ≤ N²) fits a long EXACTLY — same values, no per-row
    // decimal arithmetic; past it the decimal path keeps exactness
    val (termD, den4Pos) =
      if (nn <= (1L << 30)) {
        val b2 = col("k") * 2L - l
        val m2 = col("k1") * 2L - col("c1")
        val g = lit(nn) * m2 - lit(n1) * b2
        val den4 = b2 * (lit(2L * nn) - b2) - lit(nn) * l
        (l.cast(DoubleType) * g.cast(DoubleType) * g.cast(DoubleType) /
          den4.cast(DoubleType), den4 > lit(0L))
      } else {
        val b2 = (col("k") * 2L - l).cast(D)
        val m2 = (col("k1") * 2L - col("c1")).cast(D)
        val g = lit(nn).cast(D) * m2 - lit(n1).cast(D) * b2
        val den4 = b2 * (lit(2L * nn).cast(D) - b2) - lit(nn).cast(D) * l.cast(D)
        (l.cast(DoubleType) * g.cast(DoubleType) * g.cast(DoubleType) /
          den4.cast(DoubleType), den4 > lit(0L).cast(D))
      }
    val termFx = when(den4Pos,
      floor(termD * lit(1000.0) + lit(0.5))).otherwise(lit(0L)).cast(D)
    val sums = parts
      .withColumn("k", sum(l).over(w) + offsetExpr(offsets(t => t._1 + t._2)))
      .withColumn("k1", sum(col("c1")).over(w) + offsetExpr(offsets(_._1)))
      .agg(sum(termFx).as("sfx"))
    val nD = lit(nn.toDouble); val n1d = lit(n1.toDouble); val n2d = lit(n2.toDouble)
    val a2 = (nD - lit(1.0)) / nD * (lit(1.0) / n1d + lit(1.0) / n2d) *
      (col("sfx").cast(DoubleType) / lit(1000.0)) / nD
    sums.select(lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      col("sfx").cast(DoubleType).as("sum_fx"), a2.as("a2"))
  }

  /** Scalar twin of [[andersonDarling]] over bounded samples — the same
    * distinct-value walk, milli fixed-point term tree and final tree, so
    * it is BIT-EQUAL to the distributed statistic on equal value multisets
    * (spec-asserted parity sweep).
    *
    * @return (sum_fx, a2).
    */
  def adOfSamples(ref: Seq[Double], cur: Seq[Double]): (Double, Double) = {
    require(ref.nonEmpty && cur.nonEmpty, "both samples need values")
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val nn = n1 + n2
    val all = (ref.map((_, 1)) ++ cur.map((_, 2))).sortBy(_._1)
    var i = 0
    var k = 0L; var k1 = 0L
    var sfx = BigInt(0)
    while (i < all.length) {
      var j = i
      var c1 = 0L
      while (j < all.length && all(j)._1 == all(i)._1) {
        if (all(j)._2 == 1) c1 += 1
        j += 1
      }
      val c = (j - i).toLong
      k += c; k1 += c1
      val b2 = BigInt(2 * k - c)
      val m2 = BigInt(2 * k1 - c1)
      val g = BigInt(nn) * m2 - BigInt(n1) * b2
      val den4 = b2 * (BigInt(2 * nn) - b2) - BigInt(nn) * BigInt(c)
      if (den4 > 0) {
        val termD = c.toDouble * g.toDouble * g.toDouble / den4.toDouble
        sfx += BigInt(math.floor(termD * 1000.0 + 0.5).toLong)
      }
      i = j
    }
    val nD = nn.toDouble
    val a2 = (nD - 1.0) / nD * (1.0 / n1 + 1.0 / n2) * (sfx.toDouble / 1000.0) / nD
    (sfx.toDouble, a2)
  }

  /** Cochran–Armitage trend test — [[jonckheereTerpstra]]'s BINARY
    * twin: with a success/failure outcome across ORDERED groups
    * (fulfilled-rate by priority tier, pass-rate by quality bucket), CA
    * tests whether the PROPORTION trends monotonically with integer
    * scores 0..k−1 — the test q_prop_test's two-group z and
    * [[chiSquareCategorical]]'s any-difference χ² both miss.
    *
    * Exactness: per-group (nᵢ, xᵢ) are exact longs from ONE k-wide
    * aggregate; T·N = Σsᵢxᵢ·N − X·Σsᵢnᵢ and B = N·Σsᵢ²nᵢ − (Σsᵢnᵢ)² are
    * exact DECIMAL(38,0); z = (TN/N)/√(X(N−X)·B/N³) is ONE fixed tree.
    *
    * @return one row: (groups, n, x, t_n, z) — z null when the outcome
    *         or score carries no variance.
    */
  def cochranArmitage(df: DataFrame, groupCol: String,
                      orderedGroups: Seq[String],
                      successCol: Column): DataFrame = {
    val k = orderedGroups.size
    require(k >= 2, "need at least 2 ordered groups")
    val D = DecimalType(38, 0)
    val rows = df.select(col(groupCol).cast(StringType).as("g"),
        successCol.cast("boolean").as("y"))
      .where(col("g").isin(orderedGroups: _*) && col("y").isNotNull)
    val aggs = orderedGroups.zipWithIndex.flatMap { case (gv, i) => Seq(
      sum(when(col("g") === gv, 1L).otherwise(0L)).as(s"n$i"),
      sum(when(col("g") === gv && col("y"), 1L).otherwise(0L)).as(s"x$i"))
    }
    val m = rows.agg(aggs.head, aggs.tail: _*)
    def comb(f: Int => Column) = (0 until k).map(f).reduce(_ + _)
    val n = comb(i => col(s"n$i"))
    val x = comb(i => col(s"x$i"))
    val ssn = comb(i => col(s"n$i") * lit(i.toLong))
    val ssx = comb(i => col(s"x$i") * lit(i.toLong))
    val ss2n = comb(i => col(s"n$i") * lit((i.toLong) * i))
    val tn = ssx.cast(D) * n.cast(D) - x.cast(D) * ssn.cast(D)
    val b = n.cast(D) * ss2n.cast(D) - ssn.cast(D) * ssn.cast(D)
    val nD = n.cast(DoubleType); val xD = x.cast(DoubleType)
    val varD = xD * (nD - xD) * b.cast(DoubleType) / (nD * nD * nD)
    val z = when(x > 0L && x < n && b > lit(0L).cast(D),
      tn.cast(DoubleType) / nD / sqrt(varD))
    m.select(lit(k.toLong).as("groups"), n.as("n"), x.as("x"),
      tn.cast(DoubleType).as("t_n"), z.as("z"))
  }

  /** Jonckheere–Terpstra ordered-alternative trend test — the k-sample
    * member [[kruskalWallis]] can't replace when the groups carry an
    * ORDER (priority tiers, quality buckets, date cohorts): KW asks "any
    * difference", JT asks "do the distributions shift MONOTONICALLY with
    * the group order" and has far more power against exactly that
    * alternative. J = Σ_{i<j} [#(xᵢ<xⱼ) + ½·ties] over ordered group
    * pairs; z via the tie-corrected Hollander–Wolfe variance.
    *
    * Exactness: carried DOUBLED (J₂ = Σ cⱼ(v)·(2Kᵢ(v)−cᵢ(v)) over the
    * pooled distinct-value rollup — exact DECIMAL(38,0)); all three tie
    * sums Σt(t−1)(2t+5)/Σt(t−1)(t−2)/Σt(t−1) and the group-size sums are
    * exact integers; E[J₂] = (N²−Σnᵢ²)/2 exact; z is ONE fixed tree. One
    * (value) shuffle + the fused per-group prefix scan (k cumulative
    * columns through the partition-offset machinery — no global-order
    * funnel).
    *
    * @param orderedGroups the group values in their hypothesized
    *        ascending order (rows outside the list are dropped)
    * @return one row: (groups, n, j2, e_j2, z) — z null when the
    *         variance is 0.
    */
  def jonckheereTerpstra(df: DataFrame, valueCol: String, groupCol: String,
                         orderedGroups: Seq[String]): DataFrame = {
    val k = orderedGroups.size
    require(k >= 2, "need at least 2 ordered groups")
    val D = DecimalType(38, 0)
    val rows = df.select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(LongType).as("v"))
      .where(col("g").isin(orderedGroups: _*) && col("v").isNotNull)
    val cAggs = orderedGroups.zipWithIndex.map { case (gv, i) =>
      sum(when(col("g") === gv, 1L).otherwise(0L)).as(s"c$i")
    }
    val counts = rows.groupBy("v").agg(cAggs.head, cAggs.tail: _*)
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val tAggs = (0 until k).map(i => sum(col(s"c$i")).as(s"t$i"))
    val totals = parts.groupBy("__pid").agg(tAggs.head, tAggs.tail: _*)
      .collect().map(r => r.getInt(0) -> (0 until k).map(i => r.getLong(i + 1)))
      .toMap
    val nG: Seq[Long] = (0 until k).map(i => totals.valuesIterator.map(_(i)).sum)
    val n = nG.sum
    require(n > 0, "need at least one in-group row")
    val pids = totals.keys.toSeq.sorted
    def offsetExpr(i: Int) = {
      val m = pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)(i)).init).toMap
      if (m.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(m), col("__pid")), lit(0L))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    var withK = parts
    for (i <- 0 until k)
      withK = withK.withColumn(s"k$i", sum(col(s"c$i")).over(w) + offsetExpr(i))
    // J₂ contribution at each value: Σ_{i<j} cⱼ·(2Kᵢ − cᵢ)
    val contrib = (for {
      i <- 0 until k; j <- (i + 1) until k
    } yield col(s"c$j").cast(D) *
      (col(s"k$i") * 2L - col(s"c$i")).cast(D)).reduce(_ + _)
    val t = (0 until k).map(i => col(s"c$i")).reduce(_ + _)
    // tie terms in DECIMAL from the first product: t³ exceeds a long once
    // a single distinct value carries ~1.6M rows (heavily tied fixed-point
    // columns at scale) — same cubic-overflow class as kruskalWallis's
    // c³−c; the decimal tree is value-identical in range.
    val tD = t.cast(D)
    val agg = withK.agg(sum(contrib).as("__j2"),
      sum(tD * (tD - lit(1L).cast(D)) * (tD * lit(2L).cast(D) + lit(5L).cast(D))).as("__ta"),
      sum(tD * (tD - lit(1L).cast(D)) * (tD - lit(2L).cast(D))).as("__tb"),
      sum(tD * (tD - lit(1L).cast(D))).as("__tc"))
    // group-size sums (driver BigInt — k-bounded)
    def gs(f: Long => BigInt): BigInt = nG.map(f).sum
    val sa = gs(m => BigInt(m) * (m - 1) * (2 * m + 5))
    val sb = gs(m => BigInt(m) * (m - 1) * (m - 2))
    val sc = gs(m => BigInt(m) * (m - 1))
    val sumSq = nG.map(m => BigInt(m) * m).sum
    val eJ2 = (BigInt(n) * n - sumSq) / 2 // even: N² and Σn² share parity
    val nD = lit(n.toDouble)
    val aD = (lit((BigInt(n) * (n - 1) * (2L * n + 5)).toDouble) -
      lit(sa.toDouble) - col("__ta").cast(DoubleType)) / lit(72.0)
    val bD = lit(sb.toDouble) * col("__tb").cast(DoubleType) /
      (lit(36.0) * nD * (nD - lit(1.0)) * (nD - lit(2.0)))
    val cD = lit(sc.toDouble) * col("__tc").cast(DoubleType) /
      (lit(8.0) * nD * (nD - lit(1.0)))
    val varJ = aD + bD + cD
    val z = when(varJ > lit(0.0),
      (col("__j2").cast(DoubleType) - lit(eJ2.toDouble)) / lit(2.0) /
        sqrt(varJ))
    agg.select(lit(k.toLong).as("groups"), lit(n).as("n"),
      col("__j2").cast(DoubleType).as("j2"),
      lit(eJ2.toDouble).as("e_j2"), z.as("z"))
  }

  /** Cohen's d / Hedges' g — the PARAMETRIC effect size next to
    * [[cliffsDelta]]'s ordinal one: at bench scale everything is
    * "significant" ([[welchT]] explodes with n); d says how many pooled
    * standard deviations the means moved, and g is its small-sample
    * unbiased correction. Same grand-mean-centered exact moments as
    * [[welchT]]; d and g are ONE fixed double tree each.
    *
    * @return one row: (n_ref, n_cur, d, g) — null when either side has
    *         < 2 rows or the pooled variance is 0.
    */
  def cohensD(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    def side(df: DataFrame, flag: Int) =
      df.select(col(valueCol).cast(LongType).as("v"))
        .where(col("v").isNotNull).withColumn("s", lit(flag))
    val rows = side(ref, 1).unionByName(side(cur, 2))
      .localCheckpoint(true) // one scan serves the μ pass and the moments
    val tot = rows.agg(sum(col("v").cast(D)).as("s"), count(lit(1)).as("n"))
      .collect()(0)
    val n = tot.getLong(1)
    require(n > 0, "cohensD needs at least one non-null row")
    val sAll = BigInt(tot.getDecimal(0).toBigInteger)
    // FLOOR division (DuckDB's `//`) — see anovaF
    val q0 = sAll / n
    val mu = (if (sAll.sign < 0 && q0 * n != sAll) q0 - 1 else q0).toLong
    val y = (col("v") - lit(mu)).cast(D)
    val m = rows.groupBy("s").agg(count(lit(1)).as("ng"),
        sum(y).as("sg"), sum(y * y).as("qg"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)))))
      .toMap
    require(m.contains(1) && m.contains(2), "both sides need rows")
    val (n1, s1, q1) = m(1); val (n2, s2, q2) = m(2)
    val n1d = lit(n1.toDouble); val n2d = lit(n2.toDouble)
    val s1d = lit(s1.toDouble); val s2d = lit(s2.toDouble)
    val q1d = lit(q1.toDouble); val q2d = lit(q2.toDouble)
    // (n−1)·var = (q·n − s²)/n exactly; pooled s² over n1+n2−2
    val ss1 = (q1d * n1d - s1d * s1d) / n1d
    val ss2 = (q2d * n2d - s2d * s2d) / n2d
    val sp2 = (ss1 + ss2) / (n1d + n2d - lit(2.0))
    val d = (s1d / n1d - s2d / n2d) / sqrt(sp2)
    val g = d * (lit(1.0) - lit(3.0) / (lit(4.0) * (n1d + n2d) - lit(9.0)))
    val ok = n1 >= 2 && n2 >= 2
    ref.sparkSession.range(1).select(
      lit(n1).as("n_ref"), lit(n2).as("n_cur"),
      (if (ok) when(sp2 > lit(0.0), d) else lit(null).cast(DoubleType)).as("d"),
      (if (ok) when(sp2 > lit(0.0), g) else lit(null).cast(DoubleType)).as("g"))
  }

  /** Quantile–quantile table — the per-quantile MAGNITUDE view of
    * two-sample drift: [[wasserstein1]] integrates the quantile gap into
    * one number, the QQ table shows WHERE the distributions diverge
    * (tails vs body) — the drill-down for every battery verdict. Type-1
    * lower quantiles over exact integer cumulatives (k·q ≥ p·n — no
    * floats anywhere), so every row is engine-exact.
    *
    * Same two-phase prefix machinery as [[wasserstein1]]; the q−1 cut
    * points ride ONE conditional-min aggregate per side (no spine join).
    *
    * @return per cut p ∈ 1..q−1: (p, q_ref, q_cur, gap) ordered by p.
    */
  def qqTable(ref: DataFrame, cur: DataFrame, valueCol: String,
              quantiles: Int = 10): DataFrame = {
    require(quantiles >= 2, "need at least 2 quantiles")
    def sideQ(df: DataFrame, outName: String): DataFrame = {
      val cells = df.select(col(valueCol).cast(LongType).as("v"))
        .where(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("c"))
        .repartitionByRange(col("v"))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(true)
      val totals = cells.groupBy("__pid").agg(sum(col("c")).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = totals.valuesIterator.sum
      require(n > 0, "both sides need rows")
      val pids = totals.keys.toSeq.sorted
      val offs = pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
      val off = coalesce(element_at(typedlit(offs), col("__pid")), lit(0L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__pid").orderBy("v")
      val withK = cells.withColumn("k", sum(col("c")).over(w) + off)
      val mins = (1 until quantiles).map(p =>
        min(when(col("k") * quantiles >= lit(p.toLong) * n, col("v"))).as(s"q$p"))
      val one = withK.agg(mins.head, mins.tail: _*)
      val rows = (1 until quantiles).map(p =>
        struct(lit(p).as("p"), col(s"q$p").as(outName)))
      one.select(inline(array(rows: _*)))
    }
    sideQ(ref, "q_ref").join(sideQ(cur, "q_cur"), "p")
      .select(col("p"), col("q_ref"), col("q_cur"),
        (col("q_cur") - col("q_ref")).as("gap"))
      .orderBy("p")
  }

  /** Mood's median test — the k-sample COUNTING member of the drift
    * family: [[kruskalWallis]] compares full rank distributions, this asks
    * only "do the groups split evenly around the POOLED median" — coarser
    * but immune to tail weirdness entirely (only the side of the median
    * matters), the right test when values are heavy-tailed or clipped.
    * Values equal to the pooled median are dropped (standard convention).
    *
    * Exactness: the doubled pooled median is an exact long (the
    * [[brownForsythe]] rollup, ungrouped); per-group above/below counts
    * are exact; with dg = ag·N − ng·A (so the below-cell residual is −dg),
    * χ² = Σg dg²/(ng·A·B) — per-group term dg²/ng is ONE fixed double tree
    * → micro fixed-point → order-free sum; χ² one final tree.
    *
    * @return one row: (groups, n, n_above, n_below, chi2) — χ² has
    *         groups−1 df; null when either margin is empty.
    */
  def moodMedian(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df.select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(LongType).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .localCheckpoint(true) // serves the median rollup AND the cell pass
    val cells = rows.groupBy("v").agg(count(lit(1)).as("c"))
      .repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = cells.groupBy("__pid").agg(sum(col("c")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = totals.valuesIterator.sum
    require(n > 0, "need at least one non-null row")
    val pids = totals.keys.toSeq.sorted
    val offs = pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val off = coalesce(element_at(typedlit(offs), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    // 1-based lower middle ⌈n/2⌉ = (n+1) div 2; upper middle n div 2 + 1
    val med2 = cells.withColumn("k", sum(col("c")).over(w) + off)
      .agg((min(when(col("k") >= lit((n + 1) / 2), col("v"))) +
            min(when(col("k") >= lit(n / 2 + 1), col("v")))).as("__md"))
    val sided = rows.crossJoin(broadcast(med2))
      .where(col("v") * 2L =!= col("__md"))
      .withColumn("__ab", (col("v") * 2L > col("__md")).cast(LongType))
    val perG = sided.groupBy("g").agg(
      sum(col("__ab")).as("a"), sum(lit(1L) - col("__ab")).as("b"))
    val m = perG.agg(sum("a").as("ta"), sum("b").as("tb"),
      count(lit(1)).as("groups"))
    val nn = (col("ta") + col("tb")).cast(D)
    val ng = (col("a") + col("b")).cast(D)
    val d = col("a").cast(D) * nn - ng * col("ta").cast(D)
    // per-group χ² contribution d²/(ng·A·B): ONE fixed tree, nano fx
    val termD = d.cast(DoubleType) * d.cast(DoubleType) /
      ng.cast(DoubleType) / col("ta").cast(DoubleType) /
      col("tb").cast(DoubleType)
    val agg = perG.crossJoin(broadcast(m))
      .where(col("ta") > 0L && col("tb") > 0L)
      .agg(max(col("groups")).as("groups"),
        max(col("ta") + col("tb")).as("n"),
        max(col("ta")).as("n_above"), max(col("tb")).as("n_below"),
        sum(floor(termD * lit(1e9) + lit(0.5)).cast(D)).as("sfx"))
    agg.select(col("groups"), col("n"), col("n_above"), col("n_below"),
      (col("sfx").cast(DoubleType) / lit(1e9)).as("chi2"))
  }

  /** Wald–Wolfowitz runs test per group — the SEQUENCE-randomness member
    * of the drift family: q_mann_kendall asks "is there a monotone
    * trend", this asks "is the above/below-median sign sequence random at
    * all" (clustered regimes AND over-alternation both reject). Values
    * equal to the group median are dropped (the standard convention);
    * ordering must be a total order per group (e.g. the daily tick).
    *
    * Exactness: the doubled group median (the [[brownForsythe]] rollup) is
    * an exact long, signs and the flip count are exact; z is ONE fixed
    * double tree from (n₊, n₋, R): μ = 2ab/n + 1,
    * σ² = 2ab(2ab−n)/(n²(n−1)). Groups whose values all equal the median
    * vanish (no informative signs). One rollup shuffle for the median +
    * one ordered window per group.
    *
    * @return per group: (groupCols*, n_pos, n_neg, runs, z) — z null when
    *         either sign is absent or σ² ≤ 0.
    */
  def runsTest(df: DataFrame, groupCols: Seq[String], tCol: String,
               vCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val rows = df.select(keys :+ col(tCol).cast(LongType).as("__t") :+
        col(vCol).cast(LongType).as("__v"): _*)
      .where(col("__t").isNotNull && col("__v").isNotNull)
      .localCheckpoint(true) // serves the median rollup AND the sign pass
    val cells = rows.groupBy(keys :+ col("__v"): _*).agg(count(lit(1)).as("c"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("__v")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val meds = cells
      .withColumn("k", sum(col("c")).over(wRun))
      .withColumn("ng", sum(col("c")).over(wAll))
      .groupBy(keys: _*).agg(
        (min(when(col("k") >= expr("(ng + 1) div 2"), col("__v"))) +
         min(when(col("k") >= expr("ng div 2 + 1"), col("__v")))).as("__md"))
    val signed = rows.join(meds, groupCols)
      .where(col("__v") * 2L =!= col("__md"))
      .withColumn("__sgn", (col("__v") * 2L > col("__md")).cast("int"))
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy("__t")
    val flips = signed
      .withColumn("__prev", lag(col("__sgn"), 1).over(wT))
      .groupBy(keys: _*).agg(
        sum(col("__sgn").cast(LongType)).as("n_pos"),
        sum(lit(1L) - col("__sgn")).as("n_neg"),
        (sum(when(col("__prev").isNotNull && col("__prev") =!= col("__sgn"),
          1L).otherwise(0L)) + 1L).as("runs"))
    val a = col("n_pos").cast(DoubleType); val b = col("n_neg").cast(DoubleType)
    val nD = a + b
    val mu = lit(2.0) * a * b / nD + lit(1.0)
    val sig2 = lit(2.0) * a * b * (lit(2.0) * a * b - nD) /
      (nD * nD * (nD - lit(1.0)))
    val z = when(col("n_pos") > 0L && col("n_neg") > 0L && sig2 > lit(0.0),
      (col("runs").cast(DoubleType) - mu) / sqrt(sig2))
    flips.select(keys :+ col("n_pos") :+ col("n_neg") :+ col("runs") :+
      z.as("z"): _*)
  }
}
