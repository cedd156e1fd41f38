package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twin of [[graft.ops.Outliers.rollingZScore]]: per-key rolling
  * z-score anomaly flags over a CONTINUOUS event stream, via a
  * `transformWithState` ring buffer of the last `window` fixed-point values
  * (O(window) state per key, the [[RunningQuality]] pattern; RocksDB store).
  *
  * The flag is the SAME integer rule as the batch operator —
  * `(n·v − S)² > t²·(n·Q − S²)` with the `minDev` absolute floor, over the
  * PRECEDING ≤ window values — so on in-order input the streamed flags are
  * identical to the batch ones (parity-spec'd). The honest delta: events
  * are ordered by `seqCol` only WITHIN a micro-batch; cross-batch
  * out-of-order arrival evaluates against the state as of arrival (a
  * watermark-buffered total order would need a second stateful stage).
  * NULL values must be filtered upstream (the batch operator skips them).
  */
object StreamingAnomaly {

  final case class SeqEvent(key: String, seq: Long, fx: Long)
  final case class AnomalyFlag(key: String, seq: Long, is_anomaly: Boolean)
  final case class Ring(values: Seq[Long]) // oldest-first, size <= window

  class Processor(window: Int, tSquared: Long, minPoints: Int, minDevFx: Long)
      extends StatefulProcessor[String, SeqEvent, AnomalyFlag] {
    @transient private var ring: ValueState[Ring] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[Ring]("ring", Encoders.product[Ring], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SeqEvent],
                                 timerValues: TimerValues): Iterator[AnomalyFlag] = {
      var buf = if (ring.exists()) ring.get().values.toVector else Vector.empty[Long]
      val out = rows.toSeq.sortBy(_.seq).map { e =>
        val n = buf.size.toLong
        val flag = n >= minPoints && {
          var s = 0L; var q = 0L
          buf.foreach { v => s += v; q += v * v }
          val dev = n * e.fx - s
          dev * dev > tSquared * (n * q - s * s) && math.abs(dev) > n * minDevFx
        }
        buf = (buf :+ e.fx).takeRight(window)
        AnomalyFlag(key, e.seq, flag)
      }
      ring.update(Ring(buf))
      out.iterator
    }
  }

  /** @param df streaming frame; NULL `valueCol` rows are dropped here
    *           (matching the batch operator's null-skip)
    */
  def anomalyStream(spark: SparkSession, df: DataFrame, keyCol: String,
                    seqCol: String, valueCol: String, window: Int,
                    tSquared: Long, minPoints: Int = 5, minDev: Double = 0.0,
                    fxScale: Int = 3): Dataset[AnomalyFlag] = {
    import spark.implicits._
    require(window >= 2 && minPoints >= 2 && tSquared >= 0 && minDev >= 0, "bad parameters")
    val minDevFx = math.round(minDev * math.pow(10, fxScale))
    df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        graft.metrics.MetricColumns.fixedPointLong(col(valueCol).cast("double"), fxScale).as("fx"))
      .where(col("fx").isNotNull)
      .as[SeqEvent]
      .groupByKey(_.key)
      .transformWithState(new Processor(window, tSquared, minPoints, minDevFx),
        TimeMode.None(), OutputMode.Append())
  }
}
