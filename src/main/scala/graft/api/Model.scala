package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Scan-definition model — the same shape as the reference's scan YAML
  * (see reference tests/test_scan.py:22-72 SCAN_DEFINITION): table name,
  * table-level metrics, per-column configs, tests, sql metrics, samples.
  */
final case class ScanDefinition(
    tableName: String,
    metrics: Seq[String] = Nil,
    metricGroups: Seq[String] = Nil,
    columns: Map[String, ColumnConfig] = Map.empty,
    excludedColumns: Seq[String] = Nil,
    tests: Seq[String] = Nil,
    sqlMetrics: Seq[SqlMetric] = Nil,
    samples: Option[Samples] = None,
    filter: Option[String] = None,
    /** Beyond the reference surface: row-level CROSS-COLUMN invariants
      * (`row_checks:` YAML list of boolean SQL expressions, e.g.
      * `l_shipdate <= l_receiptdate`). Each check's violation count rides
      * the single pass-1 aggregate as one conditional sum and is emitted
      * as a `row_check_violations` measurement keyed by the expression —
      * table tests gate on named checks via [[RowCheck.alias]].
      */
    rowChecks: Seq[RowCheck] = Nil,
    /** Beyond the reference surface: streaming execution config (`stream:`
      * YAML block). With it, the SAME scan definition also drives
      * `Scanner.executeStream` — the windowed quality monitor, per-column
      * streaming anomaly detection, and streaming PSI drift, continuously
      * over a watermarked stream.
      */
    stream: Option[StreamConfig] = None,
    /** Beyond the reference surface: table-level co-missingness audit
      * (`co_missingness:` YAML column list). The batch scan records each
      * pair's both-null count and null-set jaccard as measurements
      * (`co_null_both` / `co_null_jaccard`, column = "a~b"); a streaming
      * scan emits the same statistics per window.
      */
    coMissingness: Seq[String] = Nil,
    /** Beyond the reference surface: type-inference audit of string columns
      * (`infer_types:` YAML column list). The scan records each column's
      * tightest parse type covering ≥99% of non-null values as an
      * `inferred_type` measurement (value = the type name).
      */
    inferTypes: Seq[String] = Nil,
    /** Path to a persisted type audit ([[graft.ops.Constraints.saveTypeAudit]]
      * artifact; `types_reference:` YAML key). The scan re-infers the
      * audited columns and records per column a `type_drift` measurement
      * (1 when the tightest parse type changed or the column is new, else
      * 0) plus the current `inferred_type` — so tests gate on content-type
      * drift ("type_drift == 0") like any count.
      */
    typesReference: Option[String] = None
)

/** Streaming execution parameters of a scan: the event-time column the
  * stream is windowed on, the watermark delay, and the window duration.
  */
final case class StreamConfig(
    timeColumn: String,
    watermark: String = "10 minutes",
    window: String = "1 hour")

/** One row-level invariant: rows where `expression` is FALSE or NULL count
  * as violations (a check that cannot evaluate is a violation, not a pass).
  * `name` (optional) is the metric alias tests reference; it defaults to
  * `row_check_<index>`.
  */
final case class RowCheck(expression: String, name: Option[String] = None)

object RowCheck {
  def alias(rc: RowCheck, idx: Int): String =
    rc.name.getOrElse(s"row_check_$idx")
}

final case class ColumnConfig(
    metrics: Seq[String] = Nil,
    metricGroups: Seq[String] = Nil,
    tests: Seq[String] = Nil,
    missingValues: Seq[String] = Nil,
    missingFormat: Option[String] = None,
    missingRegex: Option[String] = None,
    validFormat: Option[String] = None,
    validRegex: Option[String] = None,
    validValues: Seq[String] = Nil,
    validMin: Option[Double] = None,
    validMax: Option[Double] = None,
    validMinLength: Option[Int] = None,
    validMaxLength: Option[Int] = None,
    anomaly: Option[AnomalyConfig] = None,
    /** Path to a persisted PSI reference ([[graft.scan.Drift.savePsiReference]]
      * artifact). In a streaming scan the column's per-window bucket counts
      * are monitored against it (`psi_reference:` YAML key).
      */
    psiReference: Option[String] = None,
    /** Path to a parquet of reference VALUES for this column (same column
      * name). The batch scan records the exact two-sample KS statistic
      * against it as a `ks_stat` measurement (`ks_reference:` YAML key).
      */
    ksReference: Option[String] = None,
    /** Path to a parquet of reference VALUES for this column (same column
      * name). The batch scan records the tie-corrected Mann–Whitney AUC
      * and z against it as `mwu_auc` / `mwu_z` measurements
      * (`mwu_reference:` YAML key) — the stochastic-SHIFT drift check next
      * to `ks_reference:`'s largest-gap one.
      */
    mwuReference: Option[String] = None,
    /** Path to a parquet of reference CATEGORY values for this column
      * (same column name). The batch scan records the two-sample χ²
      * homogeneity statistic (fixed-point ppm) as a `chi2_ppm` measurement
      * (`chi2_reference:` YAML key) — the CATEGORICAL drift check; gate
      * with e.g. `chi2_ppm < 20090000` (χ²(8) at p=0.01, scaled).
      */
    chi2Reference: Option[String] = None,
    /** Path to a parquet of INTEGER-VALUED reference values for this
      * column (same column name; quantize continuous domains upstream).
      * The batch scan records the exact Wasserstein-1 distance against it
      * as a `w1` measurement (`w1_reference:` YAML key) — the MAGNITUDE
      * drift check next to `ks_reference:`'s largest-gap and
      * `mwu_reference:`'s rank-shift ones: "how far did the mass move",
      * in the column's own units.
      */
    w1Reference: Option[String] = None,
    /** Path to a parquet of INTEGER-VALUED reference values for this
      * column (same column name; quantize continuous domains upstream).
      * The batch scan records Welch's unequal-variance t and its
      * Welch–Satterthwaite df against it as `welch_t` / `welch_df`
      * measurements (`welch_reference:` YAML key) — the parametric
      * MEAN-drift check next to the rank (`mwu_reference:`) and
      * shape (`ks_reference:`) ones; gate with e.g. `abs(welch_t) < 3`.
      */
    welchReference: Option[String] = None,
    /** Path to a parquet of reference values (same contract as
      * `welch_reference:`). The batch scan records the two-sample
      * Cramér–von Mises statistic as a `cvm_t` measurement
      * (`cvm_reference:` YAML key) — the INTEGRATED-CDF drift check where
      * `ks_reference:` takes only the largest gap.
      */
    cvmReference: Option[String] = None,
    /** Path to a parquet of reference values (same contract as
      * `welch_reference:`). The batch scan records the energy distance
      * and its nm/(n+m)-scaled test statistic as `energy` / `energy_t`
      * measurements (`energy_reference:` YAML key) — the ALL-MOMENTS
      * drift check (location + scale + shape in one number).
      */
    energyReference: Option[String] = None,
    /** Path to a parquet of reference values (same contract as
      * `welch_reference:`). The batch scan records the tie-adjusted
      * two-sample Anderson–Darling statistic as an `ad_a2` measurement
      * (`ad_reference:` YAML key) — the TAIL-weighted drift check next to
      * the uniform-weight `cvm_reference:` (contamination hides in tails;
      * under the null A² ≈ 1); gate with e.g. `ad_a2 < 4`.
      */
    adReference: Option[String] = None,
    /** Path to a parquet of reference values (same contract as
      * `welch_reference:`). The batch scan records Mood's rank scale
      * statistic and its z as `mood_m4` / `mood_z` measurements
      * (`mood_scale_reference:` YAML key) — the fully NONPARAMETRIC
      * dispersion-drift check (ranks only; no \|v−median\| magnitudes);
      * gate with e.g. `abs(mood_z) < 3`.
      */
    moodScaleReference: Option[String] = None,
    /** Fixed-point scale for a Benford first-digit audit of this column
      * (`benford:` YAML key; 2 for currency). The scan records the
      * chi-square vs Benford's law as a `benford_chi2` measurement —
      * compare to the chi-square(8) critical value (20.09 at p = 0.01) in
      * a test like `benford_chi2 < 20.09`.
      */
    benford: Option[Int] = None,
    /** Record the column's categorical concentration profile — `entropy`
      * (nats), `eff_exp_h` (perplexity) and `eff_simpson` (n²/Σc²)
      * measurements (`concentration: true` YAML key) — the "did this
      * dimension collapse" gate before mixture sampling keys on it.
      */
    concentration: Boolean = false
)

/** Beyond the reference surface: per-column rolling z-score anomaly
  * detection in the scan (`anomaly:` YAML key) — the column's values are
  * sequenced by `order` within each `key` group and each value compared
  * against its preceding `window` values ([[graft.ops.Outliers]]
  * `rollingZScore` semantics, integer-exact); the scan emits an
  * `anomaly_count` metric the tests can gate on (`anomaly_count < 10`).
  */
final case class AnomalyConfig(
    key: String,
    order: String,
    window: Int = 20,
    tSquared: Long = 9,
    minPoints: Int = 5,
    minDev: Double = 0.0
)

final case class SqlMetric(
    sql: String,
    tests: Seq[String] = Nil,
    groupFields: Seq[String] = Nil,
    metricNames: Seq[String] = Nil
)

final case class Samples(tableLimit: Option[Int] = None, failedLimit: Option[Int] = None)

/** Mirror of soda-sql's Measurement (reference scan.py:292-326). */
final case class Measurement(
    metric: String,
    columnName: Option[String],
    value: Option[Any],
    groupValues: Seq[GroupValue] = Nil
)

final case class GroupValue(group: Map[String, String], value: String)

/** Mirror of soda-sql's Test/TestResult (reference scan.py:329-370). */
final case class TestDef(
    id: String,
    title: String,
    expression: String,
    metrics: Seq[String],
    column: Option[String],
    source: String = "soda-sql"
)

final case class TestResult(
    test: TestDef,
    passed: Boolean,
    skipped: Boolean,
    values: Map[String, String],
    error: Option[String] = None,
    groupValues: Option[Map[String, String]] = None
)

final case class ScanError(message: String, exception: Option[String] = None)

final case class ScanResult(
    measurements: Seq[Measurement],
    testResults: Seq[TestResult],
    errors: Seq[ScanError],
    /** ISO8601 UTC scan timestamp (reference scan.py:252-289 `time=`). */
    time: Option[String] = None
) {
  def hasErrors: Boolean = errors.nonEmpty

  def measurement(metric: String, columnName: Option[String] = None): Option[Measurement] =
    measurements.find(m => m.metric == metric && m.columnName == columnName)
}

/** DataFrame conversions with the same schemas as the reference's
  * `_to_data_frame` functions (scan.py:292-395).
  */
object ScanResultFrames {
  private val groupValueType = StructType(Seq(
    StructField("group", MapType(StringType, StringType), nullable = true),
    StructField("value", StringType, nullable = true)
  ))

  val measurementSchema: StructType = StructType(Seq(
    StructField("metric", StringType, nullable = true),
    StructField("column_name", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("group_values", ArrayType(groupValueType, containsNull = true), nullable = true)
  ))

  private val testType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("expression", StringType, nullable = true),
    StructField("metrics", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("column", StringType, nullable = true),
    StructField("source", StringType, nullable = true)
  ))

  val testResultSchema: StructType = StructType(Seq(
    StructField("test", testType, nullable = true),
    StructField("passed", BooleanType, nullable = true),
    StructField("skipped", BooleanType, nullable = true),
    StructField("values", MapType(StringType, StringType), nullable = true),
    StructField("error", StringType, nullable = true),
    StructField("group_values", MapType(StringType, StringType), nullable = true)
  ))

  val scanErrorSchema: StructType = StructType(Seq(
    StructField("message", StringType, nullable = true),
    StructField("exception", StringType, nullable = true)
  ))

  private def fmt(v: Any): String = v match {
    case null => null
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case other => other.toString
  }

  def measurementsToDF(spark: SparkSession, ms: Seq[Measurement]): DataFrame = {
    val rows = ms.map { m =>
      Row(
        m.metric,
        m.columnName.orNull,
        m.value.map(fmt).orNull,
        if (m.groupValues.isEmpty) null else m.groupValues.map(g => Row(g.group, g.value))
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), measurementSchema)
  }

  def testResultsToDF(spark: SparkSession, ts: Seq[TestResult]): DataFrame = {
    val rows = ts.map { t =>
      Row(
        Row(t.test.id, t.test.title, t.test.expression, t.test.metrics, t.test.column.orNull, t.test.source),
        t.passed,
        t.skipped,
        t.values,
        t.error.orNull,
        t.groupValues.orNull
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), testResultSchema)
  }

  def scanErrorsToDF(spark: SparkSession, es: Seq[ScanError]): DataFrame = {
    val rows = es.map(e => Row(e.message, e.exception.orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), scanErrorSchema)
  }
}
