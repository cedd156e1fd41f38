package graft.scan

import graft.api._
import graft.metrics.MetricColumns
import graft.metrics.MetricColumns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental / mergeable scans — the 100 TB operating mode: compute a
  * per-slice partial metric STATE (one row of mergeable aggregates) for each
  * new partition/day/batch, persist it, and FOLD states into corpus-level
  * measurements without ever rescanning history. Yesterday's corpus state +
  * today's delta scan = today's corpus metrics, bit-exactly.
  *
  * Exactly mergeable (fold = min/max/integer addition — order-independent,
  * so the folded result is IDENTICAL to a monolithic scan): row_count, the
  * missing/values/valid count family, min/max, length metrics, and — because
  * the scan pass keeps sums as fixed-point integers ([[MetricColumns
  * .fixedPointLong]]) — sum, avg, variance and stddev. NOT mergeable from
  * this state: the exact distinct family and frequent-values (their value
  * sets are not kept; use the mergeable KMV/theta sketches for distinct
  * estimates across slices) and `approx_distinct` (HLL finalizes to a count).
  * [[partialState]] rejects those up front rather than folding them wrong.
  *
  * State is an ordinary one-row DataFrame → persist with `.write.parquet`,
  * reload, union with new slices' states, [[mergeStates]], then
  * [[measurements]].
  */
object IncrementalScan {

  /** Row-level metrics whose partial state folds exactly. */
  val mergeableMetrics: Set[String] = Set(
    "row_count",
    "missing_count", "missing_percentage", "values_count", "values_percentage",
    "valid_count", "valid_percentage", "invalid_count", "invalid_percentage",
    "min", "max", "avg", "sum", "variance", "stddev",
    "min_length", "max_length", "avg_length")

  private def metricsOf(scan: ScanDefinition, f: StructField): Seq[String] = {
    val cfg = scan.columns.getOrElse(f.name, ColumnConfig())
    (expandMetrics(scan.metrics, scan.metricGroups) ++
      expandMetrics(cfg.metrics, cfg.metricGroups) ++
      cfg.tests.flatMap(graft.checks.TestEvaluator.referencedMetrics)).distinct
      .filter(rowLevelMetrics)
  }

  /** One slice's mergeable aggregate state: the same single-pass scan
    * aggregate as `Scanner.execute` pass 1 (pre-projected fixed-point longs,
    * whole-stage codegen), kept PRE-derivation — counts, min/max, and
    * fixed-point integer sums under their `<col>__<agg>` aliases.
    */
  def partialState(df: DataFrame, scan: ScanDefinition): DataFrame = {
    val bad = (expandMetrics(scan.metrics, scan.metricGroups) ++
      scan.columns.values.flatMap(c => expandMetrics(c.metrics, c.metricGroups)))
      .filterNot(mergeableMetrics)
    require(bad.isEmpty,
      s"metrics not exactly mergeable from partial state: ${bad.distinct.mkString(", ")} " +
        "(use KMV/theta sketches for mergeable distinct estimates)")
    val excluded = scan.excludedColumns.map(_.toLowerCase).toSet
    val fields = df.schema.fields.filterNot(f => excluded.contains(f.name.toLowerCase))
    def cfgOf(n: String) = scan.columns.getOrElse(n, ColumnConfig())
    val preCols = fields.toSeq.flatMap(f => preProjection(f, cfgOf(f.name), metricsOf(scan, f)))
    val aggInput = if (preCols.isEmpty) df else df.select(col("*") +: preCols: _*)
    val aggCols = fields.toSeq.flatMap(f => aggColumns(f, cfgOf(f.name), metricsOf(scan, f)))
    aggInput.agg(count(lit(1)).as("row_count"), aggCols: _*)
  }

  /** Fold any number of state rows (a union of [[partialState]] outputs —
    * same scan definition, same schema) into one: counts and fixed-point
    * sums ADD, mins MIN, maxes MAX. Null slices (e.g. an empty partition
    * contributed no values) are skipped by the aggregates, exactly as rows
    * are inside one slice.
    */
  def mergeStates(states: DataFrame): DataFrame = {
    val aggs = states.schema.fields.map { f =>
      val c = col(f.name)
      val merged: Column = f.name match {
        case n if n.endsWith("__min") || n.endsWith("__min_length") => min(c)
        case n if n.endsWith("__max") || n.endsWith("__max_length") => max(c)
        case _ => sum(c) // row_count + every count/len/fixed-point-sum state
      }
      (if (f.dataType == LongType || f.name == "row_count") merged.cast(LongType) else merged)
        .as(f.name)
    }
    states.agg(aggs.head, aggs.tail.toSeq: _*)
  }

  /** Derive the final measurements from a merged state row — the same
    * [[MetricColumns.derived]] expression trees a monolithic scan uses, so
    * fold-then-derive equals scan-all-at-once bit-for-bit.
    */
  def measurements(merged: DataFrame, schema: StructType, scan: ScanDefinition): Seq[Measurement] = {
    val excluded = scan.excludedColumns.map(_.toLowerCase).toSet
    val fields = schema.fields.filterNot(f => excluded.contains(f.name.toLowerCase))
    val derivedCols: Seq[Column] = col("row_count") +:
      fields.toSeq.flatMap(f => derived(f.name, metricsOf(scan, f), f.dataType))
    val row = merged.select(derivedCols: _*).collect()(0)
    val out = Seq.newBuilder[Measurement]
    out += Measurement("row_count", None, Some(row.getAs[Long]("row_count")))
    fields.foreach { f =>
      metricsOf(scan, f).foreach { m =>
        val alias = m match {
          case "missing_count" => s"${f.name}__missing_count_out"
          case "valid_count" => s"${f.name}__valid_count_out"
          case "min" | "max" | "min_length" | "max_length" => s"${f.name}__${m}_out"
          case other => s"${f.name}__$other"
        }
        if (row.schema.fieldNames.contains(alias)) {
          val v = row.getAs[Any](alias)
          if (v != null) out += Measurement(m, Some(f.name), Some(v))
        }
      }
    }
    out.result()
  }

  /** Convenience: fold a sequence of slice frames end-to-end. */
  def scanSlices(slices: Seq[DataFrame], scan: ScanDefinition): Seq[Measurement] = {
    require(slices.nonEmpty, "at least one slice")
    val states = slices.map(partialState(_, scan)).reduce(_ unionAll _)
    measurements(mergeStates(states), slices.head.schema, scan)
  }
}
