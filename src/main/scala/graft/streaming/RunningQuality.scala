package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Running (all-time) per-key quality totals via the `transformWithState`
  * arbitrary-state API: unlike watermarked window aggregates, these totals
  * never age out — the continuous analogue of the Scanner's whole-table
  * missing/invalid counts, emitted after every batch.
  *
  * State per key is one O(1) row (`ValueState[QualityTotals]`); requires the
  * RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`).
  */
object RunningQuality {

  final case class QualityEvent(key: String, missing: Boolean, invalid: Boolean)
  final case class QualityTotals(key: String, n: Long, missing: Long, invalid: Long)

  class Processor extends StatefulProcessor[String, QualityEvent, QualityTotals] {
    @transient private var totals: ValueState[QualityTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[QualityTotals](
        "totals", Encoders.product[QualityTotals], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[QualityEvent],
                                 timerValues: TimerValues): Iterator[QualityTotals] = {
      var t = if (totals.exists()) totals.get() else QualityTotals(key, 0L, 0L, 0L)
      rows.foreach { e =>
        t = t.copy(n = t.n + 1,
          missing = t.missing + (if (e.missing) 1 else 0),
          invalid = t.invalid + (if (e.invalid) 1 else 0))
      }
      totals.update(t)
      Iterator.single(t)
    }
  }

  /** Monitor `valueCol` of a streaming frame keyed by `keyCol`: missing =
    * null, invalid = outside [validMin, validMax]. Emits updated all-time
    * totals per key each batch (Update mode).
    */
  def totalsStream(spark: SparkSession, df: DataFrame, keyCol: String, valueCol: String,
                   validMin: Double, validMax: Double): Dataset[QualityTotals] = {
    import spark.implicits._
    df.select(
        col(keyCol).cast("string").as("key"),
        col(valueCol).isNull.as("missing"),
        // coalesce: a non-null value whose double cast is null (uncastable
        // string) makes the range check NULL, which would break the
        // non-nullable Boolean encoder — an uncastable value counts invalid
        (col(valueCol).isNotNull &&
          coalesce(col(valueCol).cast("double") >= validMin &&
            col(valueCol).cast("double") <= validMax, lit(false)).unary_!).as("invalid"))
      .as[QualityEvent]
      .groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
