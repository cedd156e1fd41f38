package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * RNG-based `df.sample` changes with partitioning and Spark version; these
  * operators key the keep-decision on a HASH of a stable key column instead:
  * the same row is kept in every run, on any cluster layout, and the sample
  * is refinable (fraction 0.2 ⊃ fraction 0.1). Row-local — no shuffle, no
  * RNG state; filters push down to the scan where possible.
  */
object Sampling {

  /** Keep rows whose `pmod(hash(key), buckets) < fraction*buckets`.
    * `hasher` defaults to xxhash64; pass [[Shingles.md5Hash60]] for the
    * cross-engine-checkable variant.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 buckets: Int = 10000,
                 hasher: Column => Column = xxhash64(_)): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val keep = math.round(fraction * buckets)
    df.where(pmod(hasher(col(keyCol).cast("string")), lit(buckets.toLong)) < lit(keep))
  }

  /** Per-stratum fractions (e.g. downsample dominant languages, keep rare
    * ones): strata not in `fractions` fall back to `defaultFraction`.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           fractions: Map[String, Double], defaultFraction: Double = 0.0,
                           buckets: Int = 10000,
                           hasher: Column => Column = xxhash64(_)): DataFrame = {
    val keepExpr = fractions.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultFraction * buckets))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.where(pmod(hasher(col(keyCol).cast("string")), lit(buckets.toLong)) < keepExpr)
  }
}
