package graft.streaming

import graft.api.ColumnConfig
import graft.metrics.MetricColumns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality monitoring as a continuous computation: the same
  * missing/validity predicates the batch Scanner compiles, aggregated per
  * event-time window (batch) or per watermarked window (Structured
  * Streaming). Batch and streaming share one aggregate builder, so their
  * results are identical by construction.
  */
object StreamingMonitor {

  private def aggCols(cols: Seq[(String, ColumnConfig)]): Seq[Column] =
    cols.flatMap { case (name, cfg) =>
      val c = col(name)
      val missing = missingCond(c, cfg)
      val invalid = !missing && !validCond(c, cfg)
      Seq(
        countIf(missing).as(s"${name}_missing"),
        countIf(invalid).as(s"${name}_invalid"))
    }

  /** Per-window quality metrics over a batch frame. */
  def qualityByWindow(df: DataFrame, tsCol: String, duration: String,
                      cols: Seq[(String, ColumnConfig)]): DataFrame =
    df.groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("row_count"), aggCols(cols): _*)
      .select(col("w.start").as("window_start") +: col("row_count") +:
        cols.flatMap { case (n, _) => Seq(col(s"${n}_missing"), col(s"${n}_invalid")) }: _*)

  /** Streaming variant: watermarked, append-mode-safe. */
  def qualityStream(df: DataFrame, tsCol: String, watermark: String, duration: String,
                    cols: Seq[(String, ColumnConfig)]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("row_count"), aggCols(cols): _*)
      .select(col("w.start").as("window_start") +: col("row_count") +:
        cols.flatMap { case (n, _) => Seq(col(s"${n}_missing"), col(s"${n}_invalid")) }: _*)

  /** Quality metrics per dimension value (e.g. per market segment) — one
    * conditional-aggregate pass grouped by the dimension.
    */
  def qualityByDimension(df: DataFrame, dimCol: String,
                         cols: Seq[(String, ColumnConfig)]): DataFrame =
    df.groupBy(col(dimCol))
      .agg(count(lit(1)).as("row_count"), aggCols(cols): _*)
}
