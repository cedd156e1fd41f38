package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming exact deduplication — the continuous form of `Dedup.exactGroups`
  * for ingest pipelines: only the FIRST occurrence of each document passes.
  *
  * Two strategies, both keyed on xxhash64 of the text (the body never enters
  * the dedup state — state per key is O(1) and 8-byte-keyed):
  *  - [[dropDuplicatesStream]]: Spark's built-in watermark-scoped dedup
  *    (state evicted when the watermark passes);
  *  - [[firstSeenStream]]: explicit state with an event-time TTL — survives
  *    out-of-order arrivals inside the TTL and re-admits a document once the
  *    TTL passes (re-crawl semantics).
  */
object StreamingDedup {

  /** Built-in: drop duplicate text hashes within the watermark window. */
  def dropDuplicatesStream(df: DataFrame, tsCol: String, textCol: String,
                           watermark: String): DataFrame =
    df.withColumn("text_hash", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  final case class SeenEvent(h: Long, ts: Timestamp, id: Long) {
    def tsMicros: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  final case class SeenState(firstMicros: Long)
  final case class SeenOut(id: Long, text_hash: Long, ts: Timestamp)

  /** Explicit first-seen filter: per text-hash, emit the earliest event of
    * the first batch that sees it; suppress everything else until the
    * event-time TTL expires (state removed ⇒ the next occurrence is "first"
    * again). Append mode; state bounded by TTL × arrival rate.
    */
  def firstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String, idCol: String,
                      textCol: String, ttlSeconds: Long, watermark: String): Dataset[SeenOut] = {
    import spark.implicits._
    df.select(xxhash64(col(textCol)).as("h"), col(tsCol).as("ts"), col(idCol).cast("long").as("id"))
      .withWatermark("ts", watermark)
      .as[SeenEvent]
      .groupByKey(_.h)
      .flatMapGroupsWithState[SeenState, SeenOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: Long, events: Iterator[SeenEvent], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = events.minBy(_.tsMicros)
                state.update(SeenState(first.tsMicros))
                Iterator.single(SeenOut(first.id, h, first.ts))
              }
            state.getOption.foreach { s =>
              // clamp vs the current watermark: a late arrival for a key whose
              // TTL deadline the watermark already passed (timeout not yet
              // processed) would otherwise make setTimeoutTimestamp throw and
              // kill the query — clamping fires the timeout on the next batch
              val deadline = s.firstMicros / 1000L + ttlSeconds * 1000L
              state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1L))
            }
            out
          }
      }
  }
}
