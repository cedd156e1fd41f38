package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * Scale shape: one groupBy(value) shuffle (map-side combined), then a
  * cumulative window over the DISTINCT-value frame. That window is a
  * single-partition pass over value cardinality — the same deliberate
  * trade as exact `percentile`'s per-group value map (see Outliers); for
  * continuous domains quantize first (fixed-point longs), which also keeps
  * the arithmetic exact. Row counts never funnel — only distinct values do.
  */
object Binning {

  /** @param valueCol integer-valued column (cast/quantize continuous values
    *                 to fixed-point longs first); NULLs are excluded
    * @return (bin, n_rows, v_min, v_max) per non-empty bin, bins 0..k-1
    */
  def equiDepthBins(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(valueCol.cast(LongType).as("v")).where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum("c").over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("c").over(Window.partitionBy()))
    cum.withColumn("bin", expr(s"((cum - 1) * ${k}L) div n"))
      .groupBy("bin")
      .agg(sum("c").cast(LongType).as("n_rows"), min("v").as("v_min"), max("v").as("v_max"))
  }
}
