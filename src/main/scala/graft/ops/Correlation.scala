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
  def corrPairs(df: DataFrame, pairs: Seq[(String, String)], scale: Int = 2): DataFrame = {
    require(pairs.nonEmpty, "need at least one pair")
    val needed = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val base = df.select(needed.map(c =>
      MetricColumns.fixedPointLong(col(c), scale).as(s"__fx_$c")): _*)
    val aggs: Seq[Column] = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val both = col(s"__fx_$a").isNotNull && col(s"__fx_$b").isNotNull
      val x = when(both, col(s"__fx_$a"))
      val y = when(both, col(s"__fx_$b"))
      Seq(
        count(when(both, lit(1))).as(s"n_$i"),
        sum(x.cast(DecimalType(38, 0))).as(s"sx_$i"),
        sum(y.cast(DecimalType(38, 0))).as(s"sy_$i")) ++
        MetricColumns.exactSumSqParts(x, s"xx_$i") ++
        MetricColumns.exactSumSqParts(y, s"yy_$i") ++
        MetricColumns.exactSumProdParts(x, y, s"xy_$i")
    }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      val n = col(s"n_$i").cast(DecimalType(38, 0))
      val sx = col(s"sx_$i"); val sy = col(s"sy_$i")
      val sxx = MetricColumns.sumsqTotal(s"xx_$i")
      val syy = MetricColumns.sumsqTotal(s"yy_$i")
      val sxy = MetricColumns.sumprodTotal(s"xy_$i")
      // every term below is an exact integer; the double tree is fixed:
      // cast each exact co-moment once, then num / (sqrt · sqrt)
      val num = (n * sxy - sx * sy).cast(DoubleType)
      val dx = (n * sxx - sx * sx).cast(DoubleType)
      val dy = (n * syy - sy * sy).cast(DoubleType)
      struct(
        lit(s"$a~$b").as("pair"),
        col(s"n_$i").as("n"),
        when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy))).as("corr"))
    }
    m.select(inline(array(rows: _*)))
  }
}
