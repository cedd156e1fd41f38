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
  /** The pair's co-moment aggregates over two pre-projected fixed-point
    * longs, aliased under `tag` — usable inside ANY aggregate (the Scanner
    * appends these to its pass-1 aggregation so a scan's correlation
    * matrix rides the single scan pass).
    */
  private[graft] def pairAggs(xFx: Column, yFx: Column, tag: String): Seq[Column] = {
    val both = xFx.isNotNull && yFx.isNotNull
    val x = when(both, xFx)
    val y = when(both, yFx)
    Seq(
      count(when(both, lit(1))).as(s"n_$tag"),
      sum(x.cast(DecimalType(38, 0))).as(s"sx_$tag"),
      sum(y.cast(DecimalType(38, 0))).as(s"sy_$tag")) ++
      MetricColumns.exactSumSqParts(x, s"xx_$tag") ++
      MetricColumns.exactSumSqParts(y, s"yy_$tag") ++
      MetricColumns.exactSumProdParts(x, y, s"xy_$tag")
  }

  /** r derived from [[pairAggs]]'s row — every term an exact integer; the
    * double tree is fixed: cast each exact co-moment once, then
    * num / (sqrt(dx) · sqrt(dy)). NULL when either variance is zero.
    */
  private[graft] def pairCorr(tag: String): Column = {
    val n = col(s"n_$tag").cast(DecimalType(38, 0))
    val sx = col(s"sx_$tag"); val sy = col(s"sy_$tag")
    val sxx = MetricColumns.sumsqTotal(s"xx_$tag")
    val syy = MetricColumns.sumsqTotal(s"yy_$tag")
    val sxy = MetricColumns.sumprodTotal(s"xy_$tag")
    val num = (n * sxy - sx * sy).cast(DoubleType)
    val dx = (n * sxx - sx * sx).cast(DoubleType)
    val dy = (n * syy - sy * sy).cast(DoubleType)
    when(dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy)))
  }

  def corrPairs(df: DataFrame, pairs: Seq[(String, String)], scale: Int = 2): DataFrame = {
    require(pairs.nonEmpty, "need at least one pair")
    val needed = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val base = df.select(needed.map(c =>
      MetricColumns.fixedPointLong(col(c), scale).as(s"__fx_$c")): _*)
    val aggs: Seq[Column] = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      pairAggs(col(s"__fx_$a"), col(s"__fx_$b"), i.toString)
    }
    val m = base.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(
        lit(s"$a~$b").as("pair"),
        col(s"n_$i").as("n"),
        pairCorr(i.toString).as("corr"))
    }
    m.select(inline(array(rows: _*)))
  }
}
