package graft.scan

import graft.api._
import graft.checks.TestEvaluator
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.metrics.MetricColumns._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable
import scala.util.control.NonFatal

/** Executes a scan (the reference's `scan.execute`, scan.py:424-474) against a
  * DataFrame, Spark-first:
  *
  *  - pass 1: ONE aggregation computes every row-level metric for every
  *    column (conditional aggregates → whole-stage codegen; single scan,
  *    map-side partials, one-row exchange);
  *  - pass 2 (only if a distinct-family / frequent-values metric is asked):
  *    ONE `posexplode → groupBy(colIdx, value)` job covering all such columns
  *    (one shuffle for C columns, map-side combine);
  *  - pass 3 (only if histograms are asked): ONE bucket-groupBy job covering
  *    all histogram columns;
  *  - sql metrics via `spark.sql`; tests via [[TestEvaluator]].
  */
object Scanner {

  /** Daemon pool for the scan's CONCURRENT passes (see `execute`): unbounded
    * cached threads so nested pass futures can never deadlock each other;
    * each thread spends its life blocked in a Spark action, so the pool
    * carries no CPU weight of its own.
    */
  private lazy val passEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => {
          val t = new Thread(r, "graft-scan-pass")
          t.setDaemon(true)
          t
        }))

  val FrequentValuesN = 5
  val MinsMaxsN = 5
  /** Minimum per-row workload (aggregate/exploded columns) before a narrow
    * input is widened with a full-row shuffle — below this the shuffle
    * costs more than the whole single-task pass (see `widened`).
    */
  val WideningMinWorkload = 24

  /** Column cap for the `correlation` metric group (pairs grow
    * quadratically: 10 columns = 45 pairs × 12 aggregates riding pass 1);
    * extra numeric columns are dropped in schema order.
    */
  val CorrelationMaxColumns = 10
  val HistogramBuckets = 10

  /** Sample size for the streaming `ks_reference:` monitor — both the
    * reference and each window keep the bottom-k values by VALUE hash
    * (coordinated sampling), so the per-window KS is exact whenever the
    * distinct-value count fits.
    */
  val KsSampleK = 256

  /** Top-n (value, cnt) of one column of the (colIdx, value, cnt) frame, by
    * frequency. orderBy.limit compiles to TakeOrderedAndProject
    * (per-partition top-n, merged once) — never a WindowExec funneling the
    * column's whole distinct-value set through one partition. Plan-asserted
    * in ScannerSpec.
    */
  private[graft] def topFrequent(counted: DataFrame, idx: Int, n: Int): DataFrame =
    counted.where(col("colIdx") === idx)
      .orderBy(col("cnt").desc, col("value").asc)
      .limit(n)

  /** Bottom-n (asc=true) or top-n (asc=false) numeric values of one column
    * of the counted frame — same TakeOrderedAndProject shape.
    */
  private[graft] def edgeValues(counted: DataFrame, idx: Int, n: Int, asc: Boolean): DataFrame = {
    val vals = counted.where(col("colIdx") === idx)
      .select(col("value").cast(DoubleType).as("v"))
    (if (asc) vals.orderBy(col("v").asc) else vals.orderBy(col("v").desc)).limit(n)
  }

  /** Scan-file CONTENT or PATH duality — same acceptance as the reference
    * (scan.py:204-233 `create_scan_yml`: `Path(scan_definition).is_file()`
    * routes to a file read).
    */
  private def yamlContent(scanYaml: String): String =
    try {
      val p = java.nio.file.Paths.get(scanYaml)
      if (java.nio.file.Files.isRegularFile(p)) java.nio.file.Files.readString(p)
      else scanYaml
    } catch { case _: java.nio.file.InvalidPathException => scanYaml }

  /** `scanYaml` is the scan-file CONTENT or a PATH to one. */
  def executeYaml(spark: SparkSession, df: DataFrame, scanYaml: String,
                  variables: Map[String, String] = Map.empty,
                  time: Option[String] = None): ScanResult =
    execute(spark, df,
      ScanYamlParser.parse(substituteVars(yamlContent(scanYaml), variables)), time)

  /** The continuously-running form of a scan, handed back as (streaming)
    * frames the caller starts with `writeStream`:
    *
    *  - `quality`: per-window row_count + per-configured-column
    *    missing/invalid counts (the windowed DQ monitor);
    *  - `anomalies`: per `anomaly:`-configured column, the rolling z-score
    *    flag stream (transformWithState ring buffer — flags identical to
    *    the batch operator on in-order input);
    *  - `psi`: per `psi_reference:`-configured column, the loaded reference
    *    plus the per-window bucket-count stream; pair collected windows
    *    with [[graft.streaming.StreamingMonitor.psiOfWindows]] for PSI
    *    values against the reference.
    */
  final case class StreamingScan(
      quality: DataFrame,
      anomalies: Map[String, org.apache.spark.sql.Dataset[graft.streaming.StreamingAnomaly.AnomalyFlag]],
      psi: Map[String, (Drift.PsiReference, DataFrame)],
      /** Per `ks_reference:`-configured column: the reference's coordinated
        * bottom-k value sample plus the per-window sample stream
        * ([[graft.streaming.StreamingMonitor.ksSketchStream]]); pair
        * collected windows with [[Drift.ksOfSamples]] for per-window KS.
        * Both sides sample by VALUE hash with the same k, so they keep the
        * same value subset where they overlap (coordinated sampling) —
        * exact when k covers the distinct values.
        */
      ks: Map[String, (Seq[Double], DataFrame)],
      /** Per `mwu_reference:`-configured column: the reference's coordinated
        * bottom-k sample plus the SAME per-window sample stream the KS
        * monitor rides; pair collected windows with [[Drift.mwuOfSamples]]
        * for the per-window AUC/z (bit-equal to the distributed
        * [[Drift.mannWhitneyU]] when the sketches cover the windows).
        */
      mwu: Map[String, (Seq[Double], DataFrame)],
      /** Per `w1_reference:`-configured column: same coordinated sample
        * feed; pair collected windows with [[Drift.w1OfSamples]] for the
        * per-window earth-mover distance in the column's own units.
        */
      w1: Map[String, (Seq[Double], DataFrame)],
      /** Per `welch_reference:`-configured column: the reference's RAW
        * integer moments (n, Σv, Σv²) plus the per-window moment stream
        * ([[graft.streaming.StreamingMonitor.momentStream]]); pair
        * collected windows with [[Drift.welchOfMoments]] for the
        * per-window Welch t/df — EXACT at any window size (moments are
        * plain partial aggregates), bit-equal to the batch statistic on
        * the window's slice.
        */
      welch: Map[String, ((Long, BigInt, BigInt), DataFrame)],
      /** Per `cvm_reference:`-configured column: same coordinated sample
        * feed as ks/mwu/w1; pair collected windows with
        * [[Drift.cvmOfSamples]] for the per-window integrated-CDF drift.
        */
      cvm: Map[String, (Seq[Double], DataFrame)],
      /** Per `energy_reference:`-configured column: same coordinated
        * sample feed; pair collected windows with
        * [[Drift.energyOfSamples]] for the per-window all-moments drift.
        */
      energy: Map[String, (Seq[Double], DataFrame)],
      /** Per `ad_reference:`-configured column: same coordinated sample
        * feed; pair collected windows with [[Drift.adOfSamples]] for the
        * per-window tail-weighted drift.
        */
      ad: Map[String, (Seq[Double], DataFrame)],
      /** Per `mood_scale_reference:`-configured column: same coordinated
        * sample feed; pair collected windows with
        * [[Drift.moodScaleOfSamples]] for the per-window rank-scale drift.
        */
      moodScale: Map[String, (Seq[Double], DataFrame)],
      /** Per `chi2_reference:`-configured column: the reference's category
        * counts (driver-bounded by category cardinality) plus the
        * per-window (category, cnt) stream
        * ([[graft.streaming.StreamingMonitor.categoryCountStream]]); pair
        * collected windows with [[Drift.chi2OfCounts]] for the per-window
        * χ² ppm statistic.
        */
      chi2: Map[String, (Map[String, Long], DataFrame)],
      /** Per `benford:`-configured column: (window_start, n, benford_chi2)
        * — the first-digit chi2 per event-time window, through the SAME
        * digit classifier and literal chi2 tree as the batch audit
        * ([[graft.ops.Constraints.benfordAudit]]; per-window values equal
        * the batch audit on the window's slice, spec-asserted).
        */
      benford: Map[String, DataFrame],
      /** Per-window co-missingness pair statistics when the scan carries a
        * `co_missingness:` list ([[graft.ops.Constraints.coMissingnessWindowed]]);
        * None otherwise.
        */
      coMissing: Option[DataFrame],
      /** Per-window pass/fail verdicts of the scan's `tests:` — see
        * [[windowTests]]; empty-schema frame when the scan has no tests.
        */
      tests: DataFrame)

  /** One scan.yml drives BOTH modes: the same YAML the batch [[executeYaml]]
    * reads — plus its `stream:` block (time_column/watermark/window) —
    * builds the continuous monitors here. `scanYaml` is CONTENT or a PATH.
    */
  def executeStreamYaml(spark: SparkSession, df: DataFrame, scanYaml: String,
                        variables: Map[String, String] = Map.empty): StreamingScan =
    executeStream(spark, df,
      ScanYamlParser.parse(substituteVars(yamlContent(scanYaml), variables)))

  /** Streaming twin of [[execute]]. Accepts a BATCH frame too — the same
    * definition then computes the identical per-window results on historical
    * data (backfill parity, the batch=streaming contract every streaming
    * operator in this repo keeps).
    */
  def executeStream(spark: SparkSession, df0: DataFrame, scan: ScanDefinition): StreamingScan = {
    val sc = scan.stream.getOrElse(throw new IllegalArgumentException(
      "scan definition has no stream: block (time_column / watermark / window)"))
    val df = scan.filter.map(f => df0.where(f)).getOrElse(df0)
    val excluded = scan.excludedColumns.map(_.toLowerCase).toSet
    // name-sorted: YAML map order is not significant, output columns are
    val cols = scan.columns.toSeq
      .filterNot { case (n, _) => excluded.contains(n.toLowerCase) }
      .sortBy(_._1)
    import graft.streaming.{StreamingAnomaly, StreamingMonitor}
    val quality =
      if (df.isStreaming)
        StreamingMonitor.qualityStream(df, sc.timeColumn, sc.watermark, sc.window, cols)
      else
        StreamingMonitor.qualityByWindow(df, sc.timeColumn, sc.window, cols)
    val anomalies = cols.collect { case (name, cfg) if cfg.anomaly.isDefined =>
      val a = cfg.anomaly.get
      val flags =
        if (df.isStreaming)
          StreamingAnomaly.anomalyStream(spark, df, a.key, a.order, name,
            a.window, a.tSquared, a.minPoints, a.minDev)
        else {
          // batch route: the windowed operator with the identical integer rule
          import spark.implicits._
          graft.ops.Outliers.rollingZScore(df, Seq(a.key), a.order, name,
              a.window, a.tSquared, a.minPoints, a.minDev)
            .select(col(a.key).cast("string").as("key"),
              col(a.order).cast("long").as("seq"), col("is_anomaly"))
            .as[StreamingAnomaly.AnomalyFlag]
        }
      name -> flags
    }.toMap
    val psi = cols.collect { case (name, cfg) if cfg.psiReference.isDefined =>
      val ref = Drift.loadPsiReference(spark, cfg.psiReference.get)
      name -> (ref, StreamingMonitor.bucketCountStream(df, sc.timeColumn, sc.watermark,
        sc.window, name, ref.lo, ref.hi, ref.buckets))
    }.toMap
    // shared by the ks/mwu/w1 monitors: a reference parquet's coordinated
    // bottom-k-by-value-hash sample (same k and hash as the window stream,
    // so both sides keep the same value subset where they overlap) and the
    // per-window sample stream itself
    def refValueSample(path: String, name: String): Seq[Double] = {
      import graft.functions.QuantileSketch
      val s = spark.read.parquet(path)
        .agg(QuantileSketch.qsketch(
          xxhash64(col(name).cast(DoubleType)), col(name), KsSampleK).as("s"))
        .collect()(0).getSeq[Double](0)
      require(s.nonEmpty, s"reference for '$name' has no values")
      s
    }
    // ONE sample stream per column, shared by every monitor configured on
    // it: a column with ks_reference + mwu_reference + w1_reference reads
    // the identical (window_start, sample) feed — consumers (graft.Main)
    // sink it once per column, not once per monitor kind
    val sampleStreams = scala.collection.mutable.Map.empty[String, DataFrame]
    def valueSampleStream(name: String): DataFrame =
      sampleStreams.getOrElseUpdate(name,
        StreamingMonitor.ksSketchStream(df, sc.timeColumn, sc.watermark,
          sc.window, xxhash64(col(name).cast(DoubleType)), col(name), KsSampleK))
    val ks = cols.collect { case (name, cfg) if cfg.ksReference.isDefined =>
      val refSample = refValueSample(cfg.ksReference.get, name)
      // per-window KS against the reference sample, computed row-locally in
      // the stream (reference bound as ONE literal; the merge walk is the
      // same count<=v / size double tree as Drift.ksOfSamples, so the
      // streamed ks_stat equals the driver-side helper bit-for-bit)
      val refLit = array(refSample.map(lit): _*)
      val refN = lit(refSample.size.toDouble)
      val allV = array_distinct(array_sort(concat(refLit, col("sample"))))
      val ksCol = array_max(transform(allV, v =>
        abs(size(filter(refLit, x => x <= v)).cast(DoubleType) / refN -
            size(filter(col("sample"), x => x <= v)).cast(DoubleType) /
              size(col("sample")).cast(DoubleType))))
      val stream = valueSampleStream(name).withColumn("ks_stat", ksCol)
      name -> (refSample, stream)
    }.toMap
    // `mwu_reference:` / `w1_reference:` — the stochastic-shift and
    // magnitude members of the numeric drift battery ride the SAME
    // coordinated sample feed; per-window verdicts via the driver-side
    // twins (Drift.mwuOfSamples / Drift.w1OfSamples), which are bit-equal
    // to the distributed statistics when the sketches cover the windows
    val mwu = cols.collect { case (name, cfg) if cfg.mwuReference.isDefined =>
      name -> (refValueSample(cfg.mwuReference.get, name), valueSampleStream(name))
    }.toMap
    val w1 = cols.collect { case (name, cfg) if cfg.w1Reference.isDefined =>
      name -> (refValueSample(cfg.w1Reference.get, name), valueSampleStream(name))
    }.toMap
    // `cvm_reference:` / `energy_reference:` — the integrated-CDF and
    // all-moments members ride the SAME coordinated sample feed as
    // ks/mwu/w1; per-window verdicts via Drift.cvmOfSamples /
    // Drift.energyOfSamples (bit-equal to the distributed statistics on
    // covered windows)
    val cvm = cols.collect { case (name, cfg) if cfg.cvmReference.isDefined =>
      name -> (refValueSample(cfg.cvmReference.get, name), valueSampleStream(name))
    }.toMap
    val energy = cols.collect { case (name, cfg) if cfg.energyReference.isDefined =>
      name -> (refValueSample(cfg.energyReference.get, name), valueSampleStream(name))
    }.toMap
    val ad = cols.collect { case (name, cfg) if cfg.adReference.isDefined =>
      name -> (refValueSample(cfg.adReference.get, name), valueSampleStream(name))
    }.toMap
    val moodScale = cols.collect { case (name, cfg) if cfg.moodScaleReference.isDefined =>
      name -> (refValueSample(cfg.moodScaleReference.get, name), valueSampleStream(name))
    }.toMap
    // `welch_reference:` — the parametric MEAN-drift member: the
    // reference's raw moments load once (three scalars), the window's
    // moments stream through one exact windowed aggregate, verdicts via
    // Drift.welchOfMoments (bit-equal to the batch welchT — no sketch)
    val welch = cols.collect { case (name, cfg) if cfg.welchReference.isDefined =>
      val D = DecimalType(38, 0)
      val v = col(name).cast(org.apache.spark.sql.types.LongType)
      val m = spark.read.parquet(cfg.welchReference.get)
        .select(v.as("__v")).where(col("__v").isNotNull)
        .agg(count(lit(1)).as("n"), sum(col("__v").cast(D)).as("s"),
          sum(col("__v").cast(D) * col("__v").cast(D)).as("q"))
        .collect()(0)
      require(m.getLong(0) > 0, s"welch_reference for '$name' has no values")
      val ref = (m.getLong(0), BigInt(m.getDecimal(1).toBigInteger),
        BigInt(m.getDecimal(2).toBigInteger))
      name -> (ref, StreamingMonitor.momentStream(df, sc.timeColumn,
        sc.watermark, sc.window, name))
    }.toMap
    // `chi2_reference:` — the CATEGORICAL drift member: reference category
    // counts load once (bounded by category cardinality); per-window counts
    // stream through one windowed aggregate, verdicts via Drift.chi2OfCounts
    val chi2 = cols.collect { case (name, cfg) if cfg.chi2Reference.isDefined =>
      val refCounts = spark.read.parquet(cfg.chi2Reference.get)
        .select(col(name).cast(StringType).as("k"))
        .where(col("k").isNotNull)
        .groupBy("k").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(refCounts.nonEmpty, s"chi2_reference for '$name' has no values")
      name -> (refCounts, StreamingMonitor.categoryCountStream(df,
        sc.timeColumn, sc.watermark, sc.window, name))
    }.toMap
    // per-window Benford chi2: the batch audit's digit classifier +
    // literal chi2 tree riding an ordinary (watermarked) window aggregate
    val benford = cols.collect { case (name, cfg) if cfg.benford.isDefined =>
      import graft.ops.Constraints
      val base = df.withColumn("__dg", Constraints.benfordDigit(col(name), cfg.benford.get))
      val src = if (df.isStreaming) base.withWatermark(sc.timeColumn, sc.watermark) else base
      val aggs =
        sum(when(col("__dg").isNotNull, 1L).otherwise(0L)).cast("long").as("n") +:
        (1 to 9).map(d =>
          sum(when(col("__dg") === d, 1L).otherwise(0L)).cast("long").as(s"c_$d"))
      val counts = src.groupBy(window(col(sc.timeColumn), sc.window).as("w"))
        .agg(aggs.head, aggs.tail: _*)
      name -> counts.select(col("w.start").as("window_start"), col("n"),
        when(col("n") > 0L,
          Constraints.benfordChi2(col("n"), d => col(s"c_$d"))).as("benford_chi2"))
    }.toMap
    val coMissing =
      if (scan.coMissingness.size >= 2)
        Some(graft.ops.Constraints.coMissingnessWindowed(df, sc.timeColumn,
          sc.window, if (df.isStreaming) Some(sc.watermark) else None,
          scan.coMissingness))
      else None
    StreamingScan(quality, anomalies, psi, ks, mwu, w1, welch, cvm, energy,
      ad, moodScale, chi2, benford,
      coMissing, windowTests(quality, scan.tests, cols))
  }

  /** Per-window evaluation of the scan's `tests:` over the quality frame's
    * measurements — the continuous monitor emits PASS/FAIL rows, not just
    * counts, so an alert sink can key on `passed = false` directly.
    *
    * Each test compiles ONCE (driver-side, [[TestEvaluator.compile]]) to a
    * boolean Column over the window's metric columns; all verdicts ride one
    * row-local `inline` projection on top of the (already aggregated)
    * quality stream — append-safe, no extra shuffle, bounded by
    * windows × tests. Metrics resolvable at window grain are the quality
    * frame's measurements and their derived forms (`row_count`; per column
    * `missing_count / values_count / invalid_count / valid_count` and their
    * percentages — the SAME `count·100/row_count` expression trees as the
    * batch [[graft.metrics.MetricColumns.derived]]). A test referencing
    * anything else (e.g. `avg`, a sql-metric name) is emitted with
    * `skipped = true` and a NULL verdict — the batch unmeasured-metric rule
    * at window grain. A NULL verdict on a non-skipped test counts as FAILED
    * (fail-safe: alert rather than silently pass).
    *
    * Output: (window_start, column_name, test, passed, skipped); table-level
    * tests carry a NULL column_name. Works identically on the batch
    * [[graft.streaming.StreamingMonitor.qualityByWindow]] frame (backfill
    * parity).
    */
  def windowTests(quality: DataFrame, tableTests: Seq[String],
                  cols: Seq[(String, ColumnConfig)]): DataFrame = {
    val rc = col("row_count").cast(DoubleType)
    def resolver(colName: Option[String]): String => Column = {
      val perColumn: Map[String, Column] = colName match {
        case None => Map.empty
        case Some(n) =>
          val miss = col(s"${n}_missing")
          val inv = col(s"${n}_invalid")
          val values = col("row_count") - miss
          val valid = values - inv
          Map(
            "missing_count" -> miss.cast(DoubleType),
            "missing_percentage" -> (miss.cast(DoubleType) * 100.0 / rc),
            "values_count" -> values.cast(DoubleType),
            "values_percentage" -> (values.cast(DoubleType) * 100.0 / rc),
            "invalid_count" -> inv.cast(DoubleType),
            "invalid_percentage" -> (inv.cast(DoubleType) * 100.0 / rc),
            "valid_count" -> valid.cast(DoubleType),
            "valid_percentage" -> (valid.cast(DoubleType) * 100.0 / rc))
      }
      name =>
        if (name == "row_count") rc
        else perColumn.getOrElse(name, throw new NoSuchElementException(
          s"metric '$name' is not measurable at window grain"))
    }
    val all: Seq[(Option[String], String)] =
      tableTests.map((None: Option[String]) -> _) ++
        cols.flatMap { case (n, cfg) => cfg.tests.map((Some(n): Option[String]) -> _) }
    val verdicts = all.map { case (cn, expr) =>
      val compiled =
        try Some(TestEvaluator.compile(expr, resolver(cn)))
        catch { case _: NoSuchElementException => None }
      struct(
        lit(cn.orNull).cast(StringType).as("column_name"),
        lit(expr).as("test"),
        compiled.map(c => coalesce(c, lit(false)))
          .getOrElse(lit(null).cast(BooleanType)).as("passed"),
        lit(compiled.isEmpty).as("skipped"))
    }
    if (verdicts.isEmpty)
      quality.select(col("window_start"),
          lit(null).cast(StringType).as("column_name"),
          lit(null).cast(StringType).as("test"),
          lit(null).cast(BooleanType).as("passed"),
          lit(false).as("skipped"))
        .where(lit(false))
    else
      quality.select(col("window_start"), inline(array(verdicts: _*)))
  }

  /** Reference-parity `as_frames` variant (scan.py:398-421): the scan result
    * as (measurements, testResults, errors) DataFrames.
    */
  def executeToFrames(spark: SparkSession, df: DataFrame, scanYaml: String,
                      variables: Map[String, String] = Map.empty): (DataFrame, DataFrame, DataFrame) = {
    val r = executeYaml(spark, df, scanYaml, variables)
    (ScanResultFrames.measurementsToDF(spark, r.measurements),
      ScanResultFrames.testResultsToDF(spark, r.testResults),
      ScanResultFrames.scanErrorsToDF(spark, r.errors))
  }

  def substituteVars(s: String, vars: Map[String, String]): String =
    vars.foldLeft(s) { case (acc, (k, v)) =>
      acc.replace("{{ " + k + " }}", v).replace("{{" + k + "}}", v).replace("${" + k + "}", v)
    }

  def execute(spark: SparkSession, df0: DataFrame, scan: ScanDefinition,
              time: Option[String] = None): ScanResult = {
    // reference parity (scan.py:252-289): every scan is stamped with an
    // ISO8601-seconds UTC timestamp, caller-overridable for reproducibility
    val scanTime = time.getOrElse(
      java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
        .truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME))
    val errors = mutable.ArrayBuffer.empty[ScanError]
    val measurements = mutable.ArrayBuffer.empty[Measurement]
    val testResults = mutable.ArrayBuffer.empty[TestResult]

    val df = scan.filter.map(f => df0.where(f)).getOrElse(df0)

    val excluded = scan.excludedColumns.map(_.toLowerCase).toSet
    val fields = df.schema.fields.filterNot(f => excluded.contains(f.name.toLowerCase))

    // schema measurement (like soda's first measurement, test_scan.py README `metric='schema'`)
    measurements += Measurement("schema", None,
      Some(fields.map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")))

    val tableMetrics = expandMetrics(scan.metrics, scan.metricGroups)
    def cfgOf(name: String): ColumnConfig = scan.columns.getOrElse(name, ColumnConfig())
    def metricsOf(f: StructField): Seq[String] = {
      val cfg = cfgOf(f.name)
      val declared = tableMetrics ++ expandMetrics(cfg.metrics, cfg.metricGroups)
      val fromTests = cfg.tests.flatMap(TestEvaluator.referencedMetrics)
      (declared ++ fromTests).distinct
    }

    // A single file / huge parquet row group arrives as a handful of input
    // partitions, pinning the whole per-row metric workload (fixed-point
    // projections, conditional aggregates, the explode of pass 2) on that
    // many tasks while the rest of the cluster idles. When the input is
    // more than 2× narrower than the available parallelism AND the per-row
    // workload is heavy enough to amortize a full-row shuffle, widening
    // wins (measured at sf0.1/local[32] on the wide scan: pass 1
    // 3.8→2.1 s, pass 2 2.2→1.4 s INCLUDING the shuffle). `weight` is the
    // pass's per-row workload — aggregate columns (pass 1) / exploded
    // columns (pass 2); LIGHT scans skip the shuffle, whose ~0.5 s at this
    // size exceeds their whole single-task pass (measured: q_tests
    // 0.33 s unwidened in r5 → 0.9-1.3 s widened in r6 — the widening tax,
    // reverted by this gate). On a real multi-file table partitions ≥
    // cores and all of this is a no-op. Cheap passes (samples, histograms)
    // stay on the raw frame. All pass-1/2 aggregates are order-independent
    // (fixed-point/integer sums, min/max, sketches), so results are
    // bit-identical either way.
    def widened(d: DataFrame, weight: Int): DataFrame = {
      val target = d.sparkSession.sparkContext.defaultParallelism
      // toRdd (internal rows) rather than .rdd: same partition count, no
      // DeserializeToObject conversion layer bolted onto the analyzed plan
      if (weight >= WideningMinWorkload &&
          d.queryExecution.toRdd.getNumPartitions * 2 < target) {
        // hash-partition on a row hash rather than round-robin: round-robin
        // output is position-dependent, so Spark SORTS each input
        // partition's full binary rows first (retry determinism) — a hash
        // partitioning skips that sort, measured ~15% faster on this path.
        // Hash expressions reject MapType children (AnalysisException), so
        // only hashable columns participate; the ordinal salt breaks up
        // mass-duplicate rows (common in data-quality scans), which a pure
        // content hash would re-funnel onto a few partitions. The salt makes
        // the stage indeterminate — safe here: a retry re-runs the whole
        // reduce stage, and every downstream aggregate in this scan is
        // placement-independent.
        def hashable(dt: DataType): Boolean = dt match {
          case _: MapType    => false
          case s: StructType => s.fields.forall(f => hashable(f.dataType))
          case a: ArrayType  => hashable(a.elementType)
          case _             => true
        }
        val hashCols = d.schema.fields.filter(f => hashable(f.dataType))
          .map(f => col(f.name)).toSeq
        if (hashCols.nonEmpty)
          d.repartition(target,
            xxhash64(hashCols :+ monotonically_increasing_id(): _*))
        else d.repartition(target) // all-map schema: Spark's safe round-robin
      } else d
    }

    // ---- pass 1: row-level metrics -------------------------------------
    // the `correlation` metric group (table-level): every numeric column
    // pair's exact co-moments RIDE this same single aggregate — no second
    // scan; pairs grow quadratically, so columns are capped (schema order)
    val corrFields =
      if (scan.metricGroups.contains("correlation"))
        fields.filter(f => isNumeric(f.dataType)).take(CorrelationMaxColumns).toSeq
      else Seq.empty
    val corrPairs = corrFields.combinations(2).map(p => (p(0), p(1))).toSeq
    val corrPreCols = corrFields.map(f =>
      graft.metrics.MetricColumns.fixedPointLong(col(f.name),
        graft.metrics.MetricColumns.sumsqScale(f.dataType)).as(s"__corrfx_${f.name}"))
    val preCols: Seq[Column] = fields.toSeq.flatMap { f =>
      preProjection(f, cfgOf(f.name), metricsOf(f).filter(rowLevelMetrics))
    } ++ corrPreCols
    val corrAggs: Seq[Column] = corrPairs.zipWithIndex.flatMap { case ((a, b), i) =>
      graft.ops.Correlation.pairAggs(
        col(s"__corrfx_${a.name}"), col(s"__corrfx_${b.name}"), s"corr_$i")
    }
    // row-level cross-column checks (`row_checks:`): each is ONE
    // conditional sum riding pass 1 — FALSE or NULL (can't-evaluate)
    // counts as a violation
    val rowCheckAggs: Seq[Column] = scan.rowChecks.zipWithIndex.map { case (rc, i) =>
      sum(when(!coalesce(expr(rc.expression), lit(false)), 1L).otherwise(0L))
        .cast(LongType).as(s"__rowcheck_$i")
    }
    val pass1Weight = fields.toSeq
      .map(f => aggColumns(f, cfgOf(f.name), metricsOf(f).filter(rowLevelMetrics)).size).sum +
      corrAggs.size + rowCheckAggs.size
    val wideDf = widened(df, pass1Weight)
    val aggInput = if (preCols.isEmpty) wideDf else wideDf.select(col("*") +: preCols: _*)
    val aggCols: Seq[Column] = fields.toSeq.flatMap { f =>
      aggColumns(f, cfgOf(f.name), metricsOf(f).filter(rowLevelMetrics))
    } ++ corrAggs ++ rowCheckAggs
    val base = aggInput.agg(count(lit(1)).as("row_count"), aggCols: _*)
    val derivedCols: Seq[Column] = (col("row_count") +: fields.toSeq.flatMap { f =>
      derived(f.name, metricsOf(f).filter(rowLevelMetrics), f.dataType)
    }) ++ corrPairs.zipWithIndex.map { case (_, i) =>
      graft.ops.Correlation.pairCorr(s"corr_$i").as(s"__corr_$i")
    } ++ scan.rowChecks.indices.map(i => col(s"__rowcheck_$i"))
    // ---- passes 1-3 run as CONCURRENT Spark actions ---------------------
    // They are independent jobs (pass 3 needs only pass 1's min/max bounds,
    // expressed as a future chained on pass 1), so serializing them on the
    // driver wastes wall-clock twice over: the cluster idles between
    // actions, and each pass's whole-stage codegen compiles in its own
    // exclusive window (measured: the cold q_scan_wide run spends more time
    // in serialized JIT/scheduling gaps than in tasks). Concurrent actions
    // on one SparkSession are a supported, standard pattern; result
    // PROCESSING below stays in the original deterministic order, so the
    // measurement stream is bit-identical to the sequential form.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = passEc

    val rowF = Future { base.select(derivedCols: _*).collect()(0) }

    // ---- pass 2 (launch): distinct family + frequent values (one shuffle)
    val groupFields = fields.filter(f => metricsOf(f).exists(groupMetrics))
    val needFreq = groupFields.zipWithIndex.filter { case (f, _) => metricsOf(f).contains("frequent_values") }
    val needMinsMaxs = groupFields.zipWithIndex.filter { case (f, _) =>
      isNumeric(f.dataType) && (metricsOf(f).contains("mins") || metricsOf(f).contains("maxs"))
    }
    val pass2F: Future[(Array[Row], Map[(String, Int), Array[Row]])] =
      if (groupFields.isEmpty) Future.successful((Array.empty[Row], Map.empty))
      else Future {
        // One explode+groupBy per TYPE CLASS (long / double / string)
        // instead of one cast-everything-to-string pass: grouping keys stay
        // NATIVE, so the group exchange carries 8-byte primitives instead of
        // value text and the corpus-sized Double.toString per value is gone
        // (injectivity argument at GroupMetrics.pass2Class — counts are
        // unchanged). Each class projects ONLY its columns before widening,
        // so the widening exchange narrows in step; the widening decision
        // keeps the GLOBAL pass weight so the route matches the old
        // single-pass form. Class frames are subtrees of the SAME fused
        // actions as before (one distinct-family union, one top-K union) —
        // the driver action count is unchanged.
        val pass2Weight = groupFields.length * 2
        // (field, GLOBAL colIdx) per class, classes in deterministic order
        val classed: Seq[Seq[(StructField, Int)]] = groupFields.zipWithIndex
          .groupBy { case (f, _) => GroupMetrics.pass2Class(f.dataType) }
          .toSeq.sortBy(_._1.typeName).map(_._2.toSeq)
        // the (colIdx = GLOBAL index, native value, cnt) frame over `cols`
        def countedOf(cols: Seq[(StructField, Int)]): DataFrame = {
          val valueExprs = cols.map { case (f, _) =>
            val cfg = cfgOf(f.name)
            when(!missingCond(col(f.name), cfg),
              GroupMetrics.pass2Encode(col(f.name), f.dataType))
          }
          val idxs = cols.map(_._2)
          val proj = df.select(cols.map { case (f, _) => col(f.name) }: _*)
          widened(proj, pass2Weight)
            .select(posexplode(array(valueExprs: _*)).as(Seq("ci", "value")))
            .where(col("value").isNotNull)
            .groupBy("ci", "value").agg(count(lit(1)).as("cnt"))
            .select(element_at(typedlit(idxs), col("ci") + 1).as("colIdx"),
              col("value"), col("cnt"))
        }
        // Only the frequent-values / mins / maxs top-K jobs re-read counted
        // rows; those jobs explode ONLY the requesting columns (the old
        // single-frame slice paid the full all-column explode before its
        // colIdx filter) and cache the ≤distinct-sized result.
        def wantsTopK(f: StructField): Boolean =
          metricsOf(f).contains("frequent_values") ||
            (isNumeric(f.dataType) &&
              (metricsOf(f).contains("mins") || metricsOf(f).contains("maxs")))
        val sliceFrames: Seq[(Seq[(StructField, Int)], DataFrame)] = classed
          .map(_.filter { case (f, _) => wantsTopK(f) }).filter(_.nonEmpty)
          .map(cls => cls -> countedOf(cls).cache())
        val sliceOf: Map[Int, DataFrame] =
          sliceFrames.flatMap { case (cls, d) => cls.map(_._2 -> d) }.toMap
        try {
          // the distinct-family aggregate and the fused top-K union are
          // independent actions — overlap them too. The per-class aggregates
          // share one schema, so ONE unioned collect serves every class.
          val distinctF = Future {
            classed.map { cls =>
              countedOf(cls).groupBy("colIdx").agg(
                count(lit(1)).as("distinct"),
                sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("unique_count"),
                sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("duplicate_count"),
                sum("cnt").as("values_cnt"))
            }.reduce(_.unionAll(_)).collect()
          }
          // frequent values / mins / maxs: every requesting column's bounded
          // slice rides ONE fused job — a union whose branches are each a
          // sort+limit over that column's slice of the CACHED counted frame.
          // Each branch is per-partition-top-n + an n-row merge exchange (the
          // TakeOrderedAndProject shape), so a high-cardinality column can
          // never funnel its whole distinct-value set through one partition
          // the way a Window.partitionBy("colIdx") pass does.
          // Branch output order is NOT relied on: rows re-sort driver-side
          // (≤ n rows each) by the same keys the branch sorted with.
          // Columns whose every value is missing produce NO measurement (the
          // pre-round-3 windowed pass emitted nothing for an absent colIdx).
          // The frequent-values text AND its count-tie ordering key are the
          // decoded string (pass2DecodeString), replicating the former
          // string pass's output and tie-breaks exactly.
          def freqBranch(f: StructField, idx: Int): DataFrame =
            sliceOf(idx).where(col("colIdx") === idx)
              .select(GroupMetrics.pass2DecodeString(col("value"), f.dataType)
                .as("value"), col("cnt"))
              .orderBy(col("cnt").desc, col("value").asc).limit(FrequentValuesN)
              .select(lit("freq").as("kind"), lit(idx).as("idx"),
                col("value"), col("cnt"), lit(null).cast(DoubleType).as("v"))
          // mins/maxs decode: long→double and double→double equal the former
          // string→double parse bit-for-bit (both correctly rounded /
          // identity); FLOAT must round-trip through its shortest string so
          // 0.1f stays 0.1, not the widened 0.10000000149011612.
          def edgeDecode(f: StructField, v: Column): Column = f.dataType match {
            case FloatType => v.cast(FloatType).cast(StringType).cast(DoubleType)
            case _         => v.cast(DoubleType)
          }
          def edgeBranch(f: StructField, idx: Int, asc: Boolean): DataFrame = {
            val vals = sliceOf(idx).where(col("colIdx") === idx)
              .select(edgeDecode(f, col("value")).as("v"))
            (if (asc) vals.orderBy(col("v").asc) else vals.orderBy(col("v").desc))
              .limit(MinsMaxsN)
              .select(lit(if (asc) "mins" else "maxs").as("kind"), lit(idx).as("idx"),
                lit(null).cast(StringType).as("value"), lit(null).cast(LongType).as("cnt"), col("v"))
          }
          val branches =
            needFreq.map { case (f, idx) => freqBranch(f, idx) } ++
            needMinsMaxs.flatMap { case (f, idx) =>
              val ms = metricsOf(f).toSet
              (if (ms("mins")) Seq(edgeBranch(f, idx, asc = true)) else Nil) ++
                (if (ms("maxs")) Seq(edgeBranch(f, idx, asc = false)) else Nil)
            }
          val slicedF: Future[Map[(String, Int), Array[Row]]] =
            if (branches.isEmpty) Future.successful(Map.empty)
            else Future {
              branches.reduce(_.unionAll(_)).collect()
                .groupBy(r => (r.getAs[String]("kind"), r.getAs[Int]("idx")))
            }
          (Await.result(distinctF, Duration.Inf), Await.result(slicedF, Duration.Inf))
        } finally sliceFrames.foreach(_._2.unpersist())
      }

    // ---- pass 3 (launch): histograms, chained on pass 1's bounds --------
    val histFields = fields.filter(f => isNumeric(f.dataType) && metricsOf(f).contains("histogram"))
    val histF: Future[Option[(Map[String, (Double, Double)], Array[Row])]] =
      if (histFields.isEmpty) Future.successful(None)
      else rowF.map { row =>
        // min/max ride pass 1 when requested as metrics (same alias
        // contract as the record loop below); compute the rest in one agg
        def fromRow(f: StructField, m: String): Option[Double] = {
          val alias = s"${f.name}__${m}_out"
          if (metricsOf(f).contains(m) && row.schema.fieldNames.contains(alias) &&
              row.getAs[Any](alias) != null)
            Some(toDouble(row.getAs[Any](alias)))
          else None
        }
        val need = histFields.filter(f => fromRow(f, "min").isEmpty || fromRow(f, "max").isEmpty)
        val extra: Map[String, (Double, Double)] = if (need.nonEmpty) {
          val aggs = need.flatMap(f => Seq(
            min(col(f.name)).cast(DoubleType).as(s"${f.name}__hmin"),
            max(col(f.name)).cast(DoubleType).as(s"${f.name}__hmax")))
          val r = df.agg(aggs.head, aggs.tail.toSeq: _*).collect()(0)
          need.map(f => f.name -> (r.getAs[Double](s"${f.name}__hmin"), r.getAs[Double](s"${f.name}__hmax"))).toMap
        } else Map.empty
        val bounds = histFields.map { f =>
          extra.get(f.name) match {
            case Some(b) => f.name -> b
            case None => f.name -> (fromRow(f, "min").get, fromRow(f, "max").get)
          }
        }.toMap
        val histBuckets = histogramFrame(df, histFields.map(f => (f.name, bounds(f.name))).toSeq, HistogramBuckets)
          .collect()
        Some((bounds, histBuckets))
      }

    // ---- pass 1 (process) ------------------------------------------------
    val row = Await.result(rowF, Duration.Inf)
    corrPairs.zipWithIndex.foreach { case ((a, b), i) =>
      val r = row.getAs[Any](s"__corr_$i")
      if (r != null)
        measurements += Measurement("correlation", Some(s"${a.name}~${b.name}"), Some(r))
    }

    val metricValues = mutable.Map.empty[(Option[String], String), Any] // (column, metric) -> value
    scan.rowChecks.zipWithIndex.foreach { case (rc, i) =>
      val alias = RowCheck.alias(rc, i)
      val v = row.getAs[Long](s"__rowcheck_$i")
      // table-level metric key: TABLE tests reference the check's alias
      metricValues((None, alias)) = v
      measurements += Measurement("row_check_violations", Some(alias), Some(v))
    }
    val rowCount = row.getAs[Long]("row_count")
    metricValues((None, "row_count")) = rowCount
    measurements += Measurement("row_count", None, Some(rowCount))

    def record(colName: String, metric: String, v: Any): Unit = {
      if (v != null) {
        metricValues((Some(colName), metric)) = v
        measurements += Measurement(metric, Some(colName), Some(v))
      }
    }

    fields.foreach { f =>
      val ms = metricsOf(f).filter(rowLevelMetrics)
      ms.foreach { m =>
        val alias = m match {
          case "missing_count" => s"${f.name}__missing_count_out"
          case "valid_count"   => s"${f.name}__valid_count_out"
          case "min" | "max"   => s"${f.name}__${m}_out"
          case "min_length" | "max_length" => s"${f.name}__${m}_out"
          case "min_tokens" | "max_tokens" => s"${f.name}__${m}_out"
          case "approx_distinct" => s"${f.name}__approx_distinct_out"
          case other => s"${f.name}__$other"
        }
        if (row.schema.fieldNames.contains(alias)) {
          val v = row.getAs[Any](alias)
          record(f.name, m, v)
        }
      }
    }

    // ---- pass 2 (process) ------------------------------------------------
    if (groupFields.nonEmpty) {
      val (distinctAgg, sliced) = Await.result(pass2F, Duration.Inf)
      distinctAgg.foreach { r =>
        val f = groupFields(r.getAs[Int]("colIdx"))
        val ms = metricsOf(f).toSet
        val d = r.getAs[Long]("distinct")
        val vc = r.getAs[Long]("values_cnt")
        if (ms("distinct")) record(f.name, "distinct", d)
        if (ms("unique_count")) record(f.name, "unique_count", r.getAs[Long]("unique_count"))
        if (ms("duplicate_count")) record(f.name, "duplicate_count", r.getAs[Long]("duplicate_count"))
        if (ms("uniqueness") && vc > 1)
          record(f.name, "uniqueness", (d - 1).toDouble * 100.0 / (vc - 1).toDouble)
      }
      needFreq.foreach { case (f, idx) =>
        val top = sliced.getOrElse(("freq", idx), Array.empty[Row])
          .sortBy(r => (-r.getAs[Long]("cnt"), r.getAs[String]("value")))
        if (top.nonEmpty) {
          val gvs = top.map(r => GroupValue(Map("value" -> r.getAs[String]("value")), r.getAs[Long]("cnt").toString))
          measurements += Measurement("frequent_values", Some(f.name), None, gvs.toSeq)
        }
      }
      needMinsMaxs.foreach { case (f, idx) =>
        val ms = metricsOf(f).toSet
        if (ms("mins")) {
          val mins = sliced.getOrElse(("mins", idx), Array.empty[Row]).map(_.getAs[Double]("v")).sorted
          if (mins.nonEmpty) measurements += Measurement("mins", Some(f.name), Some(mins.toSeq))
        }
        if (ms("maxs")) {
          val maxs = sliced.getOrElse(("maxs", idx), Array.empty[Row])
            .map(_.getAs[Double]("v")).sorted(Ordering[Double].reverse)
          if (maxs.nonEmpty) measurements += Measurement("maxs", Some(f.name), Some(maxs.toSeq))
        }
      }
    }

    // ---- pass 3 (process) ------------------------------------------------
    Await.result(histF, Duration.Inf).foreach { case (bounds, histBuckets) =>
      histBuckets.groupBy(_.getAs[Int]("colIdx")).foreach { case (idx, rows) =>
        val f = histFields(idx)
        val byBucket = rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
        val freqs = (0 until HistogramBuckets).map(b => byBucket.getOrElse(b.toLong, 0L))
        val (lo, hi) = bounds(f.name)
        measurements += Measurement("histogram", Some(f.name),
          Some(Map("boundaries" -> boundaries(lo, hi, HistogramBuckets), "frequencies" -> freqs)))
      }
    }

    // ---- anomaly checks (beyond the reference: `anomaly:` column key) ----
    // per configured column, the count of rolling z-score breaks over the
    // preceding-window frame (Outliers.rollingZScore — one keyed window
    // pass + a 1-row count) recorded as `anomaly_count`, so tests can gate
    // on time-series behavior ("anomaly_count < 10")
    fields.filter(f => cfgOf(f.name).anomaly.isDefined).foreach { f =>
      val ac = cfgOf(f.name).anomaly.get
      val n = graft.ops.Outliers.rollingZScore(df, Seq(ac.key), ac.order, f.name,
          ac.window, ac.tSquared, ac.minPoints, ac.minDev)
        .where(col("is_anomaly")).count()
      record(f.name, "anomaly_count", n)
    }

    // ---- drift checks (beyond the reference: `psi_reference:` /
    // `ks_reference:` column keys) ---- the batch halves of the continuous
    // monitors: PSI of this scan's data against a persisted bucket
    // reference (Drift.psiBucketsVsReference — fixed-point bucket terms,
    // oracle-exact total) and the exact two-sample KS against a persisted
    // reference value frame (Drift.ksStatistic). Both land as measurements
    // (`psi`, `ks_stat`) so scan tests gate on distribution drift the same
    // way they gate on counts ("psi < 0.25", "ks_stat < 0.2").
    fields.filter(f => cfgOf(f.name).psiReference.isDefined).foreach { f =>
      val ref = Drift.loadPsiReference(spark, cfgOf(f.name).psiReference.get)
      record(f.name, "psi", Drift.psiTotal(Drift.psiBucketsVsReference(ref, df, f.name)))
    }
    fields.filter(f => cfgOf(f.name).ksReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).ksReference.get)
      val ks = Drift.ksStatistic(refDf, df, f.name)
        .select("ks_stat").collect()(0).getDouble(0)
      record(f.name, "ks_stat", ks)
    }
    // `mwu_reference:` — the stochastic-shift drift companion to the KS
    // gap (AUC = P[reference value beats current] + half-ties, z for
    // significance); `chi2_reference:` — categorical mix drift as the
    // fixed-point ppm statistic. Same reference-parquet contract as
    // `ks_reference:`.
    fields.filter(f => cfgOf(f.name).mwuReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).mwuReference.get)
      val row = Drift.mannWhitneyU(refDf, df, f.name).collect()(0)
      record(f.name, "mwu_auc", row.getDouble(4))
      record(f.name, "mwu_z", if (row.isNullAt(5)) null else row.getDouble(5))
    }
    fields.filter(f => cfgOf(f.name).chi2Reference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).chi2Reference.get)
      val row = Drift.chiSquareCategorical(refDf, df, f.name).collect()(0)
      record(f.name, "chi2_ppm", row.getLong(3))
    }
    // `w1_reference:` — the MAGNITUDE drift companion: exact earth-mover
    // distance in the column's own units (integer-valued columns;
    // quantize continuous domains upstream). Same reference-parquet
    // contract; gate with e.g. `w1 < 50`.
    fields.filter(f => cfgOf(f.name).w1Reference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).w1Reference.get)
      val row = Drift.wasserstein1(refDf, df, f.name).collect()(0)
      record(f.name, "w1", row.getDouble(2))
    }
    // `welch_reference:` / `cvm_reference:` / `energy_reference:` — the
    // round-13 completions of the two-sample family: parametric MEAN
    // drift (Welch t + df), INTEGRATED-CDF drift (Cramér–von Mises) and
    // ALL-MOMENTS drift (energy distance). Same reference-parquet
    // contract; gate with e.g. `abs(welch_t) < 3`, `cvm_t < 0.5`,
    // `energy_t < 10`.
    fields.filter(f => cfgOf(f.name).welchReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).welchReference.get)
      val row = Drift.welchT(refDf, df, f.name).collect()(0)
      record(f.name, "welch_t", if (row.isNullAt(6)) null else row.getDouble(6))
      record(f.name, "welch_df", if (row.isNullAt(7)) null else row.getDouble(7))
    }
    fields.filter(f => cfgOf(f.name).cvmReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).cvmReference.get)
      val row = Drift.cramerVonMises(refDf, df, f.name).collect()(0)
      record(f.name, "cvm_t", row.getDouble(3))
    }
    fields.filter(f => cfgOf(f.name).energyReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).energyReference.get)
      val row = Drift.energyDistance(refDf, df, f.name).collect()(0)
      record(f.name, "energy", row.getDouble(5))
      record(f.name, "energy_t", row.getDouble(6))
    }
    fields.filter(f => cfgOf(f.name).adReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).adReference.get)
      val row = Drift.andersonDarling(refDf, df, f.name).collect()(0)
      record(f.name, "ad_a2", row.getDouble(3))
    }
    fields.filter(f => cfgOf(f.name).moodScaleReference.isDefined).foreach { f =>
      val refDf = spark.read.parquet(cfgOf(f.name).moodScaleReference.get)
      val row = Drift.moodScale(refDf, df, f.name).collect()(0)
      record(f.name, "mood_m4", row.getDouble(2))
      record(f.name, "mood_z", if (row.isNullAt(3)) null else row.getDouble(3))
    }

    // ---- Benford audit (beyond the reference: `benford:` column key,
    // value = fixed-point scale) ---- chi-square of the column's first
    // significant digits vs Benford's law (Constraints.benfordAudit — one
    // fused aggregate, literal-constant chi2 tree) as `benford_chi2`, so
    // tests gate on it like any count ("benford_chi2 < 20.09")
    {
      val benfordCols = fields.filter(f => cfgOf(f.name).benford.isDefined)
        .map(f => f.name -> cfgOf(f.name).benford.get)
      if (benfordCols.nonEmpty) {
        graft.ops.Constraints.benfordAudit(df, benfordCols)
          .select("col_name", "chi2").distinct().collect()
          .foreach(r => record(r.getString(0), "benford_chi2",
            if (r.isNullAt(1)) null else r.getDouble(1)))
      }
    }

    // ---- categorical concentration (beyond the reference:
    // `concentration: true` column key) ---- Shannon entropy + both
    // effective-category counts as `entropy` / `eff_exp_h` / `eff_simpson`
    // measurements — gate "this dimension collapsed" with e.g.
    // `eff_simpson > 3` before a mixture sampler keys on the column
    {
      val concCols = fields.filter(f => cfgOf(f.name).concentration).map(_.name)
      if (concCols.nonEmpty) {
        graft.ops.Constraints.categoryEntropy(df, concCols).collect().foreach { r =>
          record(r.getString(0), "entropy", r.getDouble(3))
          record(r.getString(0), "eff_exp_h", r.getDouble(4))
          record(r.getString(0), "eff_simpson",
            if (r.isNullAt(5)) null else r.getDouble(5))
        }
      }
    }

    // ---- co-missingness audit (beyond the reference: table-level
    // `co_missingness:` column list) ---- per pair the both-null count and
    // the null-set jaccard (Constraints.coMissingness — one fused
    // aggregate), recorded with column = "a~b" like the correlation matrix
    if (scan.coMissingness.size >= 2) {
      graft.ops.Constraints.coMissingness(df, scan.coMissingness).collect()
        .foreach { r =>
          val pair = r.getString(0) + "~" + r.getString(1)
          record(pair, "co_null_both", r.getLong(5))
          record(pair, "co_null_jaccard", if (r.isNullAt(6)) null else r.getDouble(6))
        }
    }

    // ---- type-inference audit (beyond the reference: table-level
    // `infer_types:` column list) ---- each column's tightest parse type
    // covering >=99% of non-null values (Constraints.inferTypes — one
    // fused aggregate), recorded as an `inferred_type` measurement
    if (scan.inferTypes.nonEmpty) {
      scan.typesReference match {
        case Some(ref) =>
          // drift mode: compare against the persisted audit; tests gate on
          // `type_drift` per column ("type_drift == 0")
          graft.ops.Constraints.typeDrift(spark, df, scan.inferTypes, ref)
            .collect().foreach { r =>
              record(r.getString(0), "inferred_type", r.getString(2))
              record(r.getString(0), "type_drift", if (r.getBoolean(3)) 1L else 0L)
            }
        case None =>
          graft.ops.Constraints.inferTypes(df, scan.inferTypes)
            .select("col_name", "suggested").collect()
            .foreach(r => record(r.getString(0), "inferred_type", r.getString(1)))
      }
    }

    // ---- samples (reference `samples:` config, tests/test_scan.py:24-26) --
    // table_limit: a deterministic head-by-all-columns table sample;
    // failed_limit: per configured column, the first N rows failing its
    // missing/validity config. Each sample is a TakeOrderedAndProject job
    // (per-partition top-N, one merge) — bounded driver result by design.
    scan.samples.foreach { smp =>
      val orderCols = fields.map(_.name).toSeq
      def rowsToGvs(rows: Array[Row]): Seq[GroupValue] =
        rows.map { r =>
          GroupValue(orderCols.zipWithIndex.map { case (cn, i) =>
            cn -> (if (r.isNullAt(i)) null else String.valueOf(r.get(i)))
          }.toMap, "sample")
        }.toSeq
      smp.tableLimit.foreach { lim =>
        val rows = tableSample(df.select(orderCols.map(col): _*), lim, orderCols).collect()
        measurements += Measurement("table_sample", None, Some(rows.length.toLong), rowsToGvs(rows))
      }
      smp.failedLimit.foreach { lim =>
        fields.foreach { f =>
          val cfg = cfgOf(f.name)
          if (MetricColumns.hasValidityConfig(cfg) || MetricColumns.hasMissingConfig(cfg)) {
            val rows = failedRows(df, f.name, cfg, lim, orderCols)
              .select(orderCols.map(col): _*).collect()
            measurements += Measurement("failed_rows", Some(f.name), Some(rows.length.toLong), rowsToGvs(rows))
          }
        }
      }
    }

    // ---- sql metrics -----------------------------------------------------
    df.createOrReplaceTempView(scan.tableName)
    scan.sqlMetrics.zipWithIndex.foreach { case (sm, idx) =>
      try {
        val res = spark.sql(sm.sql)
        if (sm.groupFields.isEmpty) {
          val r = res.collect().headOption
          r.foreach { row =>
            res.schema.fieldNames.foreach { fn =>
              val v = row.getAs[Any](fn)
              if (v != null) {
                metricValues((None, fn)) = v
                measurements += Measurement(fn, None, Some(v))
              }
            }
          }
          runTests(sm.tests, None, Some(idx), metricValues.toMap, testResults, errors)
        } else {
          val rows = res.collect()
          val metricCols = res.schema.fieldNames.filterNot(sm.groupFields.contains)
          metricCols.foreach { mc =>
            val gvs = rows.map { row =>
              val g = sm.groupFields.map(gf => gf -> String.valueOf(row.getAs[Any](gf))).toMap
              GroupValue(g, String.valueOf(row.getAs[Any](mc)))
            }
            measurements += Measurement(mc, None, None, gvs.toSeq)
          }
          // group-level tests: evaluate per group
          sm.tests.foreach { expr =>
            rows.foreach { row =>
              val vals = metricCols.flatMap { mc =>
                Option(row.getAs[Any](mc)).map(v => mc -> toDouble(v))
              }.toMap
              val g = sm.groupFields.map(gf => gf -> String.valueOf(row.getAs[Any](gf))).toMap
              evalOne(expr, None, Some(idx), vals, Some(g), testResults, errors)
            }
          }
        }
      } catch {
        case NonFatal(e) =>
          errors += ScanError(s"sql_metric $idx failed", Some(String.valueOf(e.getMessage)))
      }
    }

    // ---- tests -----------------------------------------------------------
    runTests(scan.tests, None, None, metricValues.toMap, testResults, errors)
    fields.foreach { f =>
      val cfg = cfgOf(f.name)
      if (cfg.tests.nonEmpty) runTests(cfg.tests, Some(f.name), None, metricValues.toMap, testResults, errors)
    }

    ScanResult(measurements.toSeq, testResults.toSeq, errors.toSeq, Some(scanTime))
  }

  /** Equi-width histogram frame for several columns in one pass:
    * (colIdx, bucket, cnt). Bucket arithmetic uses explicit double ops so an
    * oracle with the identical expression tree matches bit-for-bit.
    */
  def histogramFrame(df: DataFrame, cols: Seq[(String, (Double, Double))], buckets: Int): DataFrame = {
    val bucketExprs = cols.map { case (name, (lo, hi)) =>
      val c = col(name).cast(DoubleType)
      val width = (hi - lo) / buckets.toDouble
      when(c.isNull || lit(width) <= 0.0, lit(null).cast(LongType))
        .otherwise(least(floor((c - lit(lo)) / lit(width)).cast(LongType), lit(buckets.toLong - 1)))
    }
    df.select(posexplode(array(bucketExprs: _*)).as(Seq("colIdx", "bucket")))
      .where(col("bucket").isNotNull)
      .groupBy("colIdx", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  def boundaries(lo: Double, hi: Double, buckets: Int): Seq[Double] = {
    val width = (hi - lo) / buckets.toDouble
    (0 to buckets).map(i => lo + width * i)
  }

  /** Deterministic failed-rows sample: rows failing missing-ness or validity
    * for `colName`, ordered by `orderCols` (soda samples are unordered; graft
    * orders for reproducibility).
    */
  def failedRows(df: DataFrame, colName: String, cfg: ColumnConfig, limit: Int, orderCols: Seq[String]): DataFrame = {
    val c = col(colName)
    val bad = missingCond(c, cfg) || !validCond(c, cfg)
    df.where(bad).orderBy(orderCols.map(col): _*).limit(limit)
  }

  /** Deterministic table sample (soda `samples.table_limit`): first `limit`
    * rows by `orderCols`. A LIMIT after ORDER BY is a TakeOrderedAndProject —
    * no full sort, no full shuffle.
    */
  def tableSample(df: DataFrame, limit: Int, orderCols: Seq[String]): DataFrame =
    df.orderBy(orderCols.map(col): _*).limit(limit)

  private def runTests(exprs: Seq[String], column: Option[String], sqlMetricIndex: Option[Int],
                       values: Map[(Option[String], String), Any],
                       out: mutable.ArrayBuffer[TestResult],
                       errors: mutable.ArrayBuffer[ScanError]): Unit =
    exprs.foreach { expr =>
      // column tests see that column's metrics; table tests see table
      // metrics. NON-NUMERIC measurements (e.g. `inferred_type` strings)
      // are simply not test-visible — a test referencing one reports
      // SKIPPED (unmeasured-metric rule) rather than erroring the scan.
      val scoped: Map[String, Double] = values.flatMap {
        case ((c, m), v) if v != null && (c == column || (c.isEmpty && column.isDefined)) =>
          numericValue(v).map(m -> _)
        case _ => None
      }
      evalOne(expr, column, sqlMetricIndex, scoped, None, out, errors)
    }

  /** Numeric view of a measurement value, None for strings that aren't
    * numbers (those metrics are not test-addressable).
    */
  private def numericValue(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case b: Boolean => Some(if (b) 1.0 else 0.0)
    case ts: java.sql.Timestamp => Some(ts.getTime.toDouble)
    case d: java.sql.Date => Some(d.getTime.toDouble)
    case s: String => scala.util.Try(s.toDouble).toOption
    case _ => None
  }

  private def evalOne(expr: String, column: Option[String], sqlMetricIndex: Option[Int],
                      values: Map[String, Double], groupValues: Option[Map[String, String]],
                      out: mutable.ArrayBuffer[TestResult],
                      errors: mutable.ArrayBuffer[ScanError]): Unit = {
    val id = (column, sqlMetricIndex) match {
      case (Some(c), _) => s"""{"column":"$c","expression":"$expr"}"""
      case (None, Some(i)) => s"""{"sql_metric_index":$i,"expression":"$expr"}"""
      case _ => s"""{"expression":"$expr"}"""
    }
    val title = (column, sqlMetricIndex) match {
      case (Some(c), _) => s"column($c) test($expr)"
      case (None, Some(i)) => s"sqlmetric($i) test($expr)"
      case _ => s"test($expr)"
    }
    val metricsUsed = TestEvaluator.referencedMetrics(expr)
    val testDef = TestDef(id, title, expr, metricsUsed, column)
    // reference parity (scan.py:357): a test whose referenced metric was not
    // measured is SKIPPED, not errored
    val unavailable = metricsUsed.filterNot(values.contains)
    if (unavailable.nonEmpty) {
      out += TestResult(testDef, passed = false, skipped = true,
        values = metricsUsed.flatMap(m => values.get(m).map(v => m -> fmtDouble(v))).toMap,
        groupValues = groupValues)
      return
    }
    try {
      val r = TestEvaluator.evaluate(expr, values)
      val vals = Map("expression_result" -> fmtNum(r.expressionResult)) ++
        metricsUsed.flatMap(m => values.get(m).map(v => m -> fmtDouble(v)))
      out += TestResult(testDef, passed = r.passed, skipped = false, values = vals, groupValues = groupValues)
    } catch {
      case NonFatal(e) =>
        errors += ScanError(s"""Test "$expr" failed""", Some(String.valueOf(e.getMessage)))
        out += TestResult(testDef, passed = false, skipped = false,
          values = Map.empty, error = Some(String.valueOf(e.getMessage)), groupValues = groupValues)
    }
  }

  private def fmtNum(v: TestEvaluator.Value): String = v match {
    case TestEvaluator.Num(d) => fmtDouble(d)
    case TestEvaluator.Bool(b) => b.toString
  }

  private def fmtDouble(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def toDouble(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case s: String => s.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case ts: java.sql.Timestamp => ts.getTime.toDouble
    case d: java.sql.Date => d.getTime.toDouble
    case other => throw new IllegalArgumentException(s"non-numeric metric value: $other")
  }
}
