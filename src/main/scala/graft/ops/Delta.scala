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

  /** Derive a CDC change FEED from two snapshots — the inverse of
    * [[applyChanges]]: upserts (op "U") for added/changed ids carrying the
    * NEW snapshot's payload, deletes (op "D") for removed ids, all at
    * `seq` = 1 (one batch). Replaying the feed onto the OLD snapshot
    * reproduces the new one EXACTLY (`applyChanges(old, changeFeed(old,
    * new)) ≡ new` — the round-trip is oracle-gated and spec'd), which is
    * the correctness contract that lets a 100 TB pipeline ship diffs
    * instead of snapshots.
    *
    * Scale shape: [[snapshotDiff]]'s hash-projected join (bodies never
    * shuffle) + ONE id-keyed join to attach the new payload to the
    * (diff-sized, usually tiny) upsert set.
    */
  def changeFeed(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                 textCol: String, payloadCols: Seq[String],
                 hasher: Column => Column = xxhash64(_)): DataFrame = {
    val d = snapshotDiff(oldSnap, newSnap, idCol, textCol, hasher)
    val newPayload = newSnap.select(col(idCol).as("id") +: payloadCols.map(col): _*)
    val ups = d.where(col("status").isin("added", "changed"))
      .join(newPayload, Seq("id"))
      .select(col("id").as(idCol) +: lit(1L).as("seq") +: lit("U").as("op") +:
        payloadCols.map(col): _*)
    val dels = d.where(col("status") === "removed")
      .select(col("id").as(idCol) +: lit(1L).as("seq") +: lit("D").as("op") +:
        payloadCols.map(c => lit(null).cast(newSnap.schema(c).dataType).as(c)): _*)
    ups.unionByName(dels)
  }

  /** Build the SCD TYPE-2 history from a CDC change feed: one row per
    * (key, version) with [valid_from, valid_to) sequence bounds and an
    * `is_current` flag — [[applyChanges]] answers "what is true NOW", this
    * answers "what was true WHEN", the as-of dimension table behind
    * training-data provenance ("which license/quality label did this doc
    * carry when the snapshot shipped"). Consecutive upserts with IDENTICAL
    * payloads collapse into one version (`IS DISTINCT FROM` semantics via
    * null-safe struct compare — no hash, no collision risk); a delete
    * CLOSES the open version at the delete's seq without opening a new one
    * (re-upserts after a delete start a fresh version, payload equality
    * notwithstanding). Equal-seq ties collapse to one winner, upsert over
    * delete — [[applyChanges]]' tie rule, so `is_current` payloads here ≡
    * applyChanges' survivors.
    *
    * Scale shape: every window is KEY-bounded (`partitionBy(id)`) and the
    * island reduction is a (key, island) aggregate — no global-order
    * funnel anywhere; three shuffles of the skinny feed (dedup, key
    * window, island group), bodies move once.
    *
    * @return (id, version, valid_from, valid_to, is_current, payload...)
    *         — version 1-based per key in seq order; valid_to null on the
    *         open version.
    */
  def scd2(changes: DataFrame, idCol: String, seqCol: String, opCol: String,
           payloadCols: Seq[String], upsertOp: String = "U",
           deleteOp: String = "D"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val picked = (opCol +: payloadCols).map(col)
    // equal-seq tie rule "upsert over delete" as an EXPLICIT priority —
    // ordering by the raw op string would only hold because "U" > "D"
    // lexicographically and silently invert for custom op names
    val opPriority = when(col(opCol) === upsertOp, 1).otherwise(0)
    val evs = changes.groupBy(col(idCol), col(seqCol))
      .agg(max_by(struct(picked: _*), opPriority).as("__w"))
      .select(col(idCol) +: col(seqCol) +:
        (opCol +: payloadCols).map(c => col(s"__w.$c").as(c)): _*)
    val wk = Window.partitionBy(idCol).orderBy(seqCol)
    val pay = struct(payloadCols.map(col): _*)
    val started = evs
      .withColumn("__prev_op", lag(col(opCol), 1).over(wk))
      .withColumn("__prev_pay", lag(pay, 1).over(wk))
      .withColumn("__start",
        when(col(opCol) === upsertOp &&
          (col("__prev_op").isNull || col("__prev_op") === deleteOp ||
            !(pay <=> col("__prev_pay"))), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__start")).over(wk))
    val wi = Window.partitionBy(idCol).orderBy(col("__first.s"))
    started.groupBy(col(idCol), col("__island"))
      .agg(
        min(when(col(opCol) === upsertOp,
          struct(col(seqCol).as("s"), pay.as("p")))).as("__first"),
        min(when(col(opCol) === deleteOp, col(seqCol))).as("__del"))
      .where(col("__first").isNotNull) // leading deletes open no version
      .withColumn("valid_to",
        coalesce(col("__del"), lead(col("__first.s"), 1).over(wi)))
      .withColumn("version", row_number().over(wi))
      .select(col(idCol) +: col("version") +: col("__first.s").as("valid_from") +:
        col("valid_to") +: col("valid_to").isNull.as("is_current") +:
        payloadCols.map(c => col(s"__first.p.$c").as(c)): _*)
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
    // explicit upsert-over-delete tie priority (see scd2) — not the op
    // string, whose sort order is an accident of the default names
    val latest = changes.groupBy(col(idCol))
      .agg(max_by(struct(picked: _*),
        struct(col(seqCol), when(col(opCol) === upsertOp, 1).otherwise(0))).as("__w"))
      .select(col(idCol) +: (opCol +: payloadCols).map(c => col(s"__w.$c").as(c)): _*)
    val out = (idCol +: payloadCols).map(col)
    base.select(out: _*)
      .join(latest.select(idCol), Seq(idCol), "left_anti")
      .unionByName(latest.where(col(opCol) === upsertOp).select(out: _*))
  }
}
