package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Inequality DECOMPOSITION diagnostics over positive magnitudes — the
  * corpus-health question [[Binning.giniCoefficient]] can't answer: Gini
  * says HOW concentrated; Theil T decomposes EXACTLY into between-group
  * and within-group components, so a mixing pipeline can tell whether
  * the concentration lives across sources or inside them.
  *
  * Scale shape: one (group, value) rollup + group-bounded joins — no
  * order, no window; fx-quantized log terms sum order-free.
  */
object Inequality {

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
    if (n == 0L) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq((0L, 0L)).toDF("n", "groups").select(
        col("n"), col("groups"),
        lit(null).cast(DoubleType).as("theil_total"),
        lit(null).cast(DoubleType).as("theil_between"),
        lit(null).cast(DoubleType).as("theil_within"))
    }
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
