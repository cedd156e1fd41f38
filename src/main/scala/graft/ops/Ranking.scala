package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ranking-comparison operators: how STABLE is a top-k list across
  * snapshots/sources — the question a set-overlap (Jaccard of the lists)
  * answers badly because it ignores where items sit (rank 1 churn matters
  * more than rank 50 churn).
  */
object Ranking {

  /** The (1−p)·p^(d−1)/d weight table and its suffix sums for [[rbo]] —
    * generated in ONE place so the Spark plan and the oracle SQL consume
    * identical doubles (p-powers via libm `pow` are not bit-portable;
    * repeated multiplication here is deterministic IEEE). */
  private[graft] def rboWeights(k: Int, p: Double): (Seq[Double], Seq[Double]) = {
    val w = new Array[Double](k)
    var pw = 1.0
    for (d <- 1 to k) {
      w(d - 1) = (1.0 - p) * pw / d
      pw = pw * p
    }
    val suffix = new Array[Double](k)
    var acc = 0.0
    for (d <- k to 1 by -1) { acc = acc + w(d - 1); suffix(d - 1) = acc }
    (w.toSeq, suffix.toSeq)
  }

  /** Truncated rank-biased overlap (Webber et al. 2010) at depth k — the
    * top-weighted similarity of two rankings: RBO@k = Σ_d (1−p)p^(d−1)·
    * overlap(d)/d ∈ [0, 1], with p tuning how much the head dominates
    * (p = 0.9 ≈ the top 10 carry ~86% of the weight). The snapshot-churn
    * metric for "did today's top tokens/domains/products move".
    *
    * Exactness: overlap enters only through each common item's
    * max(rank_a, rank_b) — RBO = Σ_items W(maxrank) with W the SUFFIX sums
    * of the weight table (no depth spine, no window: ONE aggregate over
    * the joined k-row lists); per-item terms are literal-table lookups
    * fx'd at 10⁻¹² before the order-free sum.
    *
    * @param a,b  ranked lists: (idCol, rankCol) with ranks 1..k
    * @return one row: (k, n_common, rbo).
    */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0.0 && p < 1.0, "need k >= 1 and 0 < p < 1")
    val (_, suffix) = rboWeights(k, p)
    val wArr = array(suffix.map(lit): _*)
    val ra = a.select(col(idCol).as("__id"), col(rankCol).cast(IntegerType).as("__ra"))
      .where(col("__ra") <= k)
    val rb = b.select(col(idCol).as("__id"), col(rankCol).cast(IntegerType).as("__rb"))
      .where(col("__rb") <= k)
    val joined = ra.join(rb, "__id")
      .withColumn("__w", element_at(wArr, greatest(col("__ra"), col("__rb"))))
    joined.agg(count(lit(1)).as("n_common"),
        sum(floor(col("__w") * lit(1e12) + lit(0.5)).cast(DecimalType(38, 0)))
          .as("__sfx"))
      .select(lit(k.toLong).as("k"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("__sfx").cast(DoubleType) / lit(1e12), lit(0.0)).as("rbo"))
  }
}
