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
}
