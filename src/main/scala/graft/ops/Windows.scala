package graft.ops

import graft.metrics.MetricColumns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time window aggregations — identical semantics for batch DataFrames
  * and Structured Streaming (the streaming variant adds a watermark; state is
  * bounded by it).
  */
object Windows {

  /** Tumbling-window counts + decimal-exact sums per key. Epoch-aligned, so
    * `window(ts, '1 hour').start == date_trunc('hour', ts)` — oracle-friendly.
    */
  def tumbling(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
               duration: String): DataFrame =
    df.groupBy(window(col(tsCol), duration).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        MetricColumns.exactSum(col(valueCol), scale = 2).cast(DoubleType).as("sum_value")
      )
      .select(col("w.start").as("window_start"), col(keyCol), col("n_events"), col("sum_value"))

  /** Streaming variant: watermarked tumbling window (append mode). */
  def tumblingStream(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
                     duration: String, watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value")
      )
      .select(col("w.start").as("window_start"), col(keyCol), col("n_events"), col("sum_value"))
}
