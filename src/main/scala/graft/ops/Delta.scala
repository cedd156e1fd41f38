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
}
