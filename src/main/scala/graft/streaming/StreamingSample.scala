package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DETERMINISTIC sampling — the continuous form of
  * [[graft.ops.Sampling.topNPerKeyExact]] for unbounded corpora: maintain a
  * uniform-by-hash sample of at most `k` rows per key ("keep a 100k-doc
  * sample of the crawl, per language") that any rerun, any batching and the
  * batch operator all agree on.
  *
  * The mechanism is the KMV bottom-k invariant: a row belongs to the final
  * sample iff its id-hash is among the key's `k` smallest overall. The
  * stream ADMITS a row the moment its hash enters the running bottom-k and
  * emits an admission record (append mode — emitted rows are never
  * retracted). Admissions are therefore a SUPERSET of the final sample
  * (an early row can be displaced later), but the superset is tight
  * (≤ k + churn per key) and the exact sample is recovered by running
  * [[graft.ops.Sampling.topNPerKeyExact]] over the admissions sink with
  * the same k — same hasher, same tie discipline, so the selection is
  * BIT-EQUAL to the batch operator over all data ever streamed, however
  * the stream was batched (spec-asserted).
  *
  * State per key is `k` longs (the bottom-k hashes) — bounded regardless
  * of stream length; within a batch events apply in (hash, id) order so
  * per-batch admissions are arrival-deterministic. No TTL: a corpus
  * sample persists (windowed samples belong to the ksSketchStream family).
  */
object StreamingSample {

  final case class AdmitEvent(key: String, ts: Timestamp, id: Long, h: Long)
  final case class BkState(hs: List[Long])
  final case class Admission(key: String, id: Long, ts: Timestamp, h: Long)

  /** Per-key running bottom-k admissions. `keyCol` is cast to string
    * (NULL keys form the "null" group of the cast — pass a pre-cleaned key
    * for stricter semantics); `idCol` must be unique per row (duplicate
    * ids share a hash and admit once, the batch operator's contract).
    */
  def bottomKAdmissionsStream(spark: SparkSession, df: DataFrame, tsCol: String,
                              keyCol: String, idCol: String, k: Int,
                              watermark: String): Dataset[Admission] = {
    require(k >= 1, "k must be >= 1")
    import spark.implicits._
    val events = df.select(
        col(keyCol).cast("string").as("key"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"),
        graft.functions.KmvCounts.xxhash60(col(idCol).cast("string")).as("h"))
      .withWatermark("ts", watermark)
      .as[AdmitEvent]
    events.groupByKey(_.key)
      .flatMapGroupsWithState[BkState, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[AdmitEvent], state: GroupState[BkState]) =>
          // sorted buffer + binary search: O(log k) membership and O(k)
          // insert-with-evict per admission — k can be 100k+ without the
          // per-event linear scan a List would cost
          val hs = new java.util.ArrayList[java.lang.Long](k)
          state.getOption.foreach(_.hs.foreach(h => hs.add(h)))
          val out = List.newBuilder[Admission]
          evs.toSeq.sortBy(e => (e.h, e.id)).foreach { e =>
            val pos = java.util.Collections.binarySearch(hs, e.h: java.lang.Long)
            val qualifies = hs.size < k || e.h < hs.get(hs.size - 1)
            if (qualifies && pos < 0) {
              hs.add(-pos - 1, e.h)
              if (hs.size > k) hs.remove(hs.size - 1)
              out += Admission(key, e.id, e.ts, e.h)
            }
          }
          state.update(BkState(
            scala.jdk.CollectionConverters.ListHasAsScala(hs).asScala.map(Long.unbox).toList))
          out.result().iterator
      }
  }
}
