package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-level statistics manifest — the data-skipping audit companion to
  * [[ZOrder]]: per parquet file, row count and per-column min/max/null
  * counts, computed with ONE scan + one (files)-sized aggregate keyed on
  * `input_file_name()`. This is the information parquet footers hold,
  * surfaced as a queryable frame, so a pipeline can:
  *
  *   - audit layout quality ("are my files narrow rectangles in the filter
  *     dimensions?" — the property `layoutZOrder`/`layoutHilbert` buy);
  *   - quantify skipping: [[prunableFiles]] counts the files a range
  *     predicate can never match, i.e. what partition pruning + min/max
  *     skipping would save at scan time;
  *   - detect stale/degenerate files (0-row, all-null, min == max).
  *
  * The aggregate is map-side combined; the shuffle carries files × columns
  * stat rows, never data. Spec-gated (input_file_name is not expressible
  * through the oracle harness's table views; the spec cross-checks the
  * manifest against per-file groundtruth read back file-by-file).
  */
object Manifest {

  /** @param cols columns to collect min/max/null stats for (orderable types)
    * @return one row per file: (file, n_rows, <c>_min, <c>_max, <c>_nulls …)
    *         with `file` the path basename.
    */
  def fileManifest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"${c}_nulls"))
    }
    df.withColumn("file", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Partition-VALUE manifest for hive-partitioned layouts: the same stats
    * keyed by the partition columns instead of the physical file — the
    * grain partition pruning operates on. One row per partition tuple:
    * (partitionCols…, n_rows, <c>_min/_max/_nulls…). Combined with
    * [[prunableFiles]]' envelope rule (on this frame) it audits whether a
    * predicate's partition pruning actually eliminates the directories a
    * layout promises.
    */
  def partitionManifest(df: DataFrame, partitionCols: Seq[String],
                        statCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty && statCols.nonEmpty, "need partition and stat columns")
    val aggs: Seq[Column] = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"${c}_nulls"))
    }
    df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Files whose [min, max] envelope for `c` cannot intersect [lo, hi] —
    * the files a scan with that range predicate skips entirely. All-null
    * files (null min/max) are conservatively NOT prunable here. Works on
    * [[partitionManifest]] rows too (then it counts prunable PARTITIONS).
    */
  def prunableFiles(manifest: DataFrame, c: String, lo: Column, hi: Column): DataFrame =
    manifest.where(col(s"${c}_max") < lo || col(s"${c}_min") > hi)

  /** Fraction of files [[prunableFiles]] removes — the one-number layout
    * quality score for a given predicate (bounded driver result).
    */
  def prunableFraction(manifest: DataFrame, c: String, lo: Column, hi: Column): Double = {
    val total = manifest.count()
    if (total == 0) 0.0 else prunableFiles(manifest, c, lo, hi).count().toDouble / total
  }

  /** Per-predicate layout audit over a manifest frame (file- OR
    * partition-grain): one row per `(column, lo, hi)` range predicate with
    * how many units (files / partitions) and rows that predicate's min/max
    * skipping can eliminate on this layout. Run it on the manifest of a
    * table BEFORE and AFTER [[ZOrder.layoutZOrder]]/[[ZOrder.layoutHilbert]]
    * to quantify what the rewrite buys. One bounded aggregate per predicate
    * over the units × stats manifest; all-null units are conservatively not
    * prunable ([[prunableFiles]]' rule).
    */
  def layoutAudit(manifest: DataFrame, predicates: Seq[(String, Double, Double)]): DataFrame = {
    require(predicates.nonEmpty, "need at least one predicate")
    predicates.map { case (c, lo, hi) =>
      val prunable = col(s"${c}_max") < lit(lo) || col(s"${c}_min") > lit(hi)
      manifest.agg(
        count(lit(1)).as("units_total"),
        sum(when(prunable, 1L).otherwise(0L)).cast("long").as("units_prunable"),
        sum(col("n_rows")).cast("long").as("rows_total"),
        sum(when(prunable, col("n_rows")).otherwise(0L)).cast("long").as("rows_prunable"))
        .select(lit(s"$c between $lo and $hi").as("predicate"), col("units_total"),
          col("units_prunable"), col("rows_total"), col("rows_prunable"))
    }.reduce(_ unionAll _)
  }
}
