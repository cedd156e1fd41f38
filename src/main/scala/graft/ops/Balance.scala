package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Balanced output writing — the "last mile" of a curation pipeline: after
  * filter/dedup/layout, the surviving corpus must land on disk as files of
  * a TARGET size, because both tails hurt at 100 TB (thousands of tiny
  * files per directory throttle listing and planning; multi-GB files defeat
  * parallelism and retry granularity).
  *
  * The assignment is EXACT, not best-effort: `file_id = rank div target`
  * where rank is the row's position in a caller-chosen total order —
  * computed with [[Packing.prefixSum]]'s two-phase distributed scan (NO
  * global-order window funnel; every stage stays range-partition-bounded).
  * Every file gets exactly `targetRows` rows except the last remainder, and
  * because the order column doubles as the layout key, each file is a
  * narrow interval in it — [[Manifest.fileManifest]] min/max skipping works
  * on the result (audit with [[Manifest.layoutAudit]] before/after).
  *
  * The physical write keys ONE hash shuffle on `file_id`, sorts within
  * partitions by (file_id, order), and sets `maxRecordsPerFile = targetRows`
  * so the parquet writer's record-count splits align EXACTLY with file-id
  * boundaries: ids are sorted within a task and all but the globally-last
  * id hold exactly `targetRows` rows, so every cut lands on an id boundary
  * and each file_id becomes one physical file.
  */
object Balance {

  /** Adds `file_id` (0-based, dense) = exclusive-prefix rank over ascending
    * `orderCol` div `targetRows`. `orderCol` must be unique (compose a
    * tiebreaker into it otherwise — equal keys are fine for correctness but
    * make the assignment depend on their relative order, which must then be
    * pinned for replay).
    */
  def assignFiles(df: DataFrame, orderCol: String, targetRows: Long,
                  numPartitions: Int = 0): DataFrame = {
    require(targetRows >= 1, s"targetRows=$targetRows must be >= 1")
    Packing.prefixSum(df, orderCol, lit(1L), "__rank", numPartitions)
      .withColumn("file_id", expr(s"__rank div ${targetRows}L"))
      .drop("__rank")
  }

  /** Rows-per-file target from a bytes target and a measured bytes/row
    * estimate (json-serialized width of a deterministic hash sample times
    * `compressionRatio` — parquet encoding typically lands well below 1.0;
    * pass a measured ratio for the actual table). One bounded aggregate.
    */
  def targetRowsForBytes(df: DataFrame, targetBytes: Long,
                         samplePermille: Int = 20,
                         compressionRatio: Double = 0.5): Long = {
    require(targetBytes >= 1 && samplePermille >= 1 && samplePermille <= 1000)
    val sampled = df.where(
      pmod(xxhash64(to_json(struct(df.columns.map(col): _*))), lit(1000)) < samplePermille)
    val avg = sampled.agg(
      coalesce(org.apache.spark.sql.functions.avg(
        octet_length(to_json(struct(df.columns.map(col): _*)))), lit(1.0)))
      .first().getDouble(0)
    math.max(1L, (targetBytes / math.max(avg * compressionRatio, 1.0)).toLong)
  }

  /** Write `df` to `path` as exactly `ceil(n / targetRows)` parquet files of
    * `targetRows` rows each (last = remainder), each a contiguous interval
    * in `orderCol`. Returns the file count. One prefix-sum pass + one
    * file-keyed shuffle; no stage sees more than a few files' worth of rows.
    */
  def writeBalanced(df: DataFrame, orderCol: String, targetRows: Long,
                    path: String, numPartitions: Int = 0): Long = {
    val assigned = assignFiles(df, orderCol, targetRows, numPartitions)
    // bounded: one long; the prefix-sum frame is already checkpointed, so
    // this reads frozen blocks rather than recomputing the scan
    val numFiles = assigned.agg(coalesce(max(col("file_id")), lit(-1L)))
      .first().getLong(0) + 1
    if (numFiles == 0) {
      df.limit(0).write.mode("overwrite").parquet(path)
      return 0
    }
    assigned
      .repartition(numFiles.toInt, col("file_id"))
      .sortWithinPartitions(col("file_id"), col(orderCol))
      .drop("file_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRows)
      .parquet(path)
    numFiles
  }
}
