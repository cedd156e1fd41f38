package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Empirical-Bayes shrinkage of per-key Bernoulli rates (beta-binomial
  * method of moments) — the estimator a curation pipeline needs the moment
  * it ranks keys by a rate: a 1/1 key is NOT better than a 96/100 key, and
  * raw rates make exactly that mistake. Each key's rate is pulled toward
  * the corpus mean with strength α+β learned FROM the corpus (keys with
  * more trials move less) — James–Stein discipline for rates.
  *
  * Method of moments on the per-key rate distribution: with p̄ and v the
  * mean/variance of the per-key raw rates, α+β = p̄(1−p̄)/v − 1 and
  * α = p̄(α+β); the posterior-mean rate is (x+α)/(n+α+β). When the
  * between-key variance carries no signal (v ≤ 0 or α+β ≤ 0 — rates more
  * dispersed than a binomial allows no shrinkage target, or less than
  * sampling noise), every key collapses to p̄ (infinite-strength prior) —
  * the standard degenerate-case convention.
  *
  * Exactness: raw rates quantize to nano fixed-point by INTEGER division
  * (x·10⁹ div n — exact in any engine); the moment sums S₁ = Σr, S₂ = Σr²
  * are exact DECIMAL(38,0); p̄, v, α, α+β and each key's shrunk rate are
  * ONE fixed double tree from those integers. Scale shape: one grouped
  * aggregate for the per-key cells, one 1-row moment aggregate broadcast
  * back — the corpus never collects.
  */
object Shrinkage {

  /** @param trialsCol  per-row trial indicator is NOT expected — rows are
    *                   pre-aggregated: `trialsCol` = n (> 0), `successCol`
    *                   = x with 0 ≤ x ≤ n
    * @return per key: (keyCols*, n, x, rate_fx (exact nano), shrunk)
    */
  def ebBetaBinomial(df: DataFrame, keyCols: Seq[String], trialsCol: String,
                     successCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val D = DecimalType(38, 0)
    val keys = keyCols.map(col)
    val cells = df.select(keys ++ Seq(
        col(trialsCol).cast(LongType).as("n"),
        col(successCol).cast(LongType).as("x")): _*)
      .where(col("n").isNotNull && col("n") > 0L && col("x").isNotNull)
      .withColumn("rate_fx", expr("(x * 1000000000L) div n"))
    val m = cells.agg(count(lit(1)).as("__g"),
      sum(col("rate_fx").cast(D)).as("__s1"),
      sum(col("rate_fx").cast(D) * col("rate_fx").cast(D)).as("__s2"))
    val gd = col("__g").cast(DoubleType)
    val s1d = col("__s1").cast(DoubleType)
    val s2d = col("__s2").cast(DoubleType)
    val pbar = s1d / gd / lit(1e9)
    val v = (s2d * gd - s1d * s1d) / (gd * gd) / lit(1e18)
    val ab = pbar * (lit(1.0) - pbar) / v - lit(1.0)
    val alpha = pbar * ab
    val shrunk = when(v > lit(0.0) && ab > lit(0.0),
      (col("x").cast(DoubleType) + alpha) /
        (col("n").cast(DoubleType) + ab)).otherwise(pbar)
    cells.crossJoin(broadcast(m))
      .select(keys ++ Seq(col("n"), col("x"), col("rate_fx"),
        shrunk.as("shrunk")): _*)
  }
}
