package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff: which documents were added, removed, or
  * changed between two crawls/exports. The incremental-pipeline primitive —
  * at 100 TB you reprocess the diff, not the corpus.
  *
  * Scale shape: content hashes are projected BEFORE the join, so document
  * bodies never enter the shuffle — the full-outer join moves (id, 8-byte
  * hash) pairs only. Unchanged ids (the overwhelming majority between real
  * snapshots) are dropped immediately after the match.
  */
object Delta {

  /** @return (id, status) with status ∈ added | removed | changed; unchanged
    *         rows are omitted. `hasher` defaults to xxhash64; any
    *         deterministic Column => Column works.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                   textCol: String,
                   hasher: Column => Column = xxhash64(_)): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"), hasher(col(textCol)).as("__h_old"))
    val n = newSnap.select(col(idCol).as("id"), hasher(col(textCol)).as("__h_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed"))
      .where(col("status").isNotNull)
      .select("id", "status")
  }

  /** Apply a CDC change feed onto a snapshot (MERGE semantics): per key the
    * LATEST change by `seqCol` wins — `upsertOp` inserts-or-overwrites the
    * payload, `deleteOp` removes the key; keys without changes pass through.
    * Equal-seq ties break by `opCol` descending (upsert beats delete), so the
    * result is deterministic under duplicate sequence numbers.
    *
    * Scale shape: the latest-change-per-key reduction is ONE map-side-combined
    * `max_by` aggregate over the (small) change feed — no window funnel — and
    * the base snapshot is filtered with a `left_anti` join against the skinny
    * changed-key set (AQE broadcasts it when it fits), so base payload never
    * enters a shuffle. Change payload moves exactly once.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
                   seqCol: String, opCol: String, payloadCols: Seq[String],
                   upsertOp: String = "U", deleteOp: String = "D"): DataFrame = {
    val picked = (opCol +: payloadCols).map(col)
    val latest = changes.groupBy(col(idCol))
      .agg(max_by(struct(picked: _*), struct(col(seqCol), col(opCol))).as("__w"))
      .select(col(idCol) +: (opCol +: payloadCols).map(c => col(s"__w.$c").as(c)): _*)
    val out = (idCol +: payloadCols).map(col)
    base.select(out: _*)
      .join(latest.select(idCol), Seq(idCol), "left_anti")
      .unionByName(latest.where(col(opCol) === upsertOp).select(out: _*))
  }
}
