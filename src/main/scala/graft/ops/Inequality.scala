package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Concentration / inequality diagnostics over non-negative magnitudes —
  * the corpus-health questions a mixing pipeline asks before trusting a
  * source blend: "how concentrated is the token mass across sources?",
  * "do a handful of customers carry the revenue?", "did the long tail
  * collapse after filtering?".
  *
  * Scale shape: everything reduces to ONE distinct-value rollup (value
  * shuffle with map-side combine) + the two-phase prefix scan for the
  * rank-weighted Gini sum — the [[graft.scan.Drift.mannWhitneyU]]
  * discipline; Theil needs no order at all (grouped aggregates over the
  * rollup with fx-quantized log terms). Nothing single-partition, nothing
  * driver-sized beyond per-partition offsets.
  */
object Inequality {

  /** EXACT Gini coefficient of a non-negative integer column:
    * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the ascending sort —
    * 0 = perfectly equal, →1 = one row carries everything.
    *
    * Exactness: over the distinct-value rollup (v, c) with inclusive
    * cumulative count k, the tied block's rank sum is c·(2k − c + 1)/2,
    * carried DOUBLED so S₂ = 2·Σ i·x₍ᵢ₎ = Σ v·c·(2k − c + 1) is an exact
    * DECIMAL(38,0); G = (S₂ − (n+1)·X... one fixed double tree over the
    * exact integers (X = Σ v·c). Negative and null values are excluded
    * (Gini is defined for non-negative magnitudes); zeros participate.
    *
    * @return one row: (n, sum_value, gini) — gini null when n = 0 or
    *         Σx = 0.
    */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val counts = df.select(col(valueCol).cast(LongType).as("v"))
      .where(col("v").isNotNull && col("v") >= 0L)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val parts = counts.repartitionByRange(col("v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parts.groupBy("__pid").agg(sum(col("c")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = totals.valuesIterator.sum
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids.zip(
      pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("v")
    val k = sum(col("c")).over(w) + offsetExpr
    val sums = parts
      .withColumn("k", k)
      .agg(
        coalesce(sum(col("v").cast(D) * col("c").cast(D)), lit(0L).cast(D)).as("x"),
        coalesce(sum(col("v").cast(D) * col("c").cast(D) *
          (col("k").cast(D) * 2 - col("c").cast(D) + 1)), lit(0L).cast(D)).as("s2"))
    val xD = col("x").cast(DoubleType)
    val g = (col("s2").cast(DoubleType) - lit((n + 1).toDouble) * xD) /
      (lit(n.toDouble) * xD)
    sums.select(lit(n).as("n"), xD.as("sum_value"),
      when(lit(n) > 0L && col("x") > lit(0L).cast(D), g).as("gini"))
  }

  /** Theil T inequality index with the BETWEEN/WITHIN group decomposition
    * — the inequality measure that decomposes exactly: T = T_between +
    * Σ_g share_g·T_g, answering "is the concentration ACROSS sources or
    * INSIDE them" (Gini can't split this). T = Σᵢ (xᵢ/X)·ln(xᵢ/μ) over
    * positive values.
    *
    * Exactness: per distinct (group, v) cell the term
    * c·v·ln(v·n_g/X_g) quantizes to pico fixed-point relative units and
    * sums ORDER-FREE (a raw double Σ over arbitrary cell order would be
    * order-dependent); the between term is group-bounded. Every input to
    * the log is a ratio of exact integers, so both engines compute
    * identical doubles. Zero/negative/null values are excluded (Theil is
    * defined on positive magnitudes).
    *
    * @return one row: (n, groups, theil_total, theil_between,
    *         theil_within) — nulls when no positive rows.
    */
  def theilIndex(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val cells = df.select(col(groupCol).cast(StringType).as("g"),
        col(valueCol).cast(LongType).as("v"))
      .where(col("g").isNotNull && col("v").isNotNull && col("v") > 0L)
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // serves the group totals AND the term pass
    val gTot = cells.groupBy("g").agg(
      sum(col("c")).as("ng"), sum(col("v").cast(D) * col("c").cast(D)).as("xg"))
    val tots = gTot.agg(sum(col("ng")).as("n"), sum(col("xg")).as("x"),
        count(lit(1)).as("groups")).collect()(0)
    val n = tots.getLong(0)
    require(n > 0, "theilIndex needs at least one positive row")
    val x = BigDecimal(tots.getDecimal(1))
    val groups = tots.getLong(2)
    // within: Σ_cells c·(v/X)·ln(v·n_g/X_g) accumulated in pico fx of the
    // X-relative share (term·1e12); total: same with global n/X
    def fxTerm(num: Column, den: Column) =
      floorSigned((col("v").cast(DoubleType) * col("c").cast(DoubleType) /
        lit(x.toDouble)) *
        log(col("v").cast(DoubleType) * num / den) * lit(1e12))
    val withG = cells.join(broadcast(gTot), "g")
    val sums = withG.agg(
      sum(fxTerm(col("ng").cast(DoubleType), col("xg").cast(DoubleType))
        .cast(D)).as("w_fx"),
      sum(fxTerm(lit(n.toDouble), lit(x.toDouble)).cast(D)).as("t_fx"))
    // between: Σ_g (X_g/X)·ln((X_g/X)/(n_g/n)) — group-bounded
    val share = col("xg").cast(DoubleType) / lit(x.toDouble)
    val bTerm = floorSigned(share *
      log(share / (col("ng").cast(DoubleType) / lit(n.toDouble))) * lit(1e12))
    val bSum = gTot.agg(sum(bTerm.cast(D)).as("b_fx"))
    sums.crossJoin(broadcast(bSum)).select(
      lit(n).as("n"), lit(groups).as("groups"),
      (col("t_fx").cast(DoubleType) / lit(1e12)).as("theil_total"),
      (col("b_fx").cast(DoubleType) / lit(1e12)).as("theil_between"),
      (col("w_fx").cast(DoubleType) / lit(1e12)).as("theil_within"))
  }

  /** Sign-symmetric fx floor (round-half-up toward +∞ on the magnitude)
    * — the [[graft.metrics.MetricColumns.fixedPointLong]] rule applied to
    * an already-scaled double. */
  private def floorSigned(c: Column): Column =
    when(c >= 0, floor(c + lit(0.5))).otherwise(-floor(-c + lit(0.5)))
}
