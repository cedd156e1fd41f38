package graft

import graft.scan.Scanner
import org.apache.spark.sql.SparkSession

/** Minimal CLI — the `soda scan`-style entry point (the reference ships as
  * an installable package; reference setup.cfg:1-24): run a YAML scan
  * definition against a parquet/CSV/JSON table and print the ScanResult.
  *
  * Usage:
  *   graft.Main <scan.yml> <table-path> [key=value ...]
  *   graft.Main sweep <scan-dir> <table-root> [--out <dir>]
  *              [--baseline <dir>] [--report <md-file>] [--post <url>]
  *              [key=value ...]
  *   graft.Main stream <scan.yml> <log-dir> <out-dir|console>
  *              [--schema <ddl>] [--max-files-per-trigger N] [key=value ...]
  *
  * The table format is inferred from the path suffix (.parquet default;
  * .csv with header; .json/.jsonl). Remaining args are `variables`
  * substituted into the scan's `filter:` like the reference's CLI `-v`
  * flags. Exit code: 0 all tests pass, 1 test failures, 2 scan errors /
  * bad invocation — so a scheduler can gate a pipeline on it.
  *
  * `stream` runs the SAME scan.yml (with its `stream:` block) continuously:
  * [[graft.streaming.StreamLog.FileLogSource]] segments in → per-window
  * quality / test-verdict / anomaly / PSI frames out, see [[runStream]].
  */
object Main {
  def main(args: Array[String]): Unit = sys.exit(run(args, None))

  /** Testable body: returns the exit code instead of exiting; `sparkIn`
    * lets tests inject their session (CLI builds a local one).
    */
  def run(args: Array[String], sparkIn: Option[SparkSession]): Int = {
    if (args.headOption.contains("stream")) return runStream(args.drop(1), sparkIn)
    if (args.headOption.contains("sweep")) return runSweep(args.drop(1), sparkIn)
    if (args.length < 2) {
      System.err.println("usage: graft.Main <scan.yml> <table-path> [key=value ...] | graft.Main stream ...")
      return 2
    }
    val Array(yamlPath, tablePath) = args.take(2)
    val variables = args.drop(2).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => System.err.println(s"ignoring malformed variable '$kv' (want key=value)"); None
      }
    }.toMap

    val spark = sparkIn.getOrElse {
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("graft-scan")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    try {
      val lower = tablePath.toLowerCase
      val df =
        if (lower.endsWith(".csv")) spark.read.option("header", "true")
          .option("inferSchema", "true").csv(tablePath)
        else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
          spark.read.json(tablePath)
        else spark.read.parquet(tablePath)

      val result = Scanner.executeYaml(spark, df, yamlPath, variables)

      result.time.foreach(t => println(s"scan time: $t"))
      println(s"-- measurements (${result.measurements.size}) --")
      result.measurements.foreach { m =>
        val col = m.columnName.map(c => s" $c").getOrElse("")
        val gv = if (m.groupValues.nonEmpty) s" groups=${m.groupValues.size}" else ""
        println(s"  ${m.metric}$col = ${m.value.getOrElse("")}$gv")
      }
      println(s"-- tests (${result.testResults.size}) --")
      result.testResults.foreach { t =>
        val status = if (t.skipped) "SKIP" else if (t.passed) "PASS" else "FAIL"
        val vals = if (t.values.nonEmpty) s"  [${t.values.map { case (k, v) => s"$k=$v" }.mkString(", ")}]" else ""
        println(s"  $status  ${t.test.expression}$vals")
      }
      if (result.errors.nonEmpty) {
        println(s"-- errors (${result.errors.size}) --")
        result.errors.foreach(e => println(s"  ${e.message}"))
      }
      val failed = result.testResults.count(t => !t.skipped && !t.passed)
      if (result.hasErrors) 2 else if (failed > 0) 1 else 0
    } catch {
      case e: Exception =>
        System.err.println(s"scan failed: ${e.getMessage}")
        2
    } finally if (sparkIn.isEmpty) spark.stop()
  }

  /** Multi-table sweep: run every scan yml in a directory against
    * `<table-root>/<table_name>.{parquet|csv|json|jsonl}` (the yml's own
    * `table_name` resolves the table — one config sweep gates a whole
    * dataset directory, where the single-table CLI mirrors `soda scan`).
    *
    * Output: a per-table PASS/FAIL summary plus ONE merged
    * measurements/tests report (the per-table ScanResult frames with a
    * leading `table` column). `--out <dir>` persists the merged frames as
    * parquet (`measurements/`, `tests/`); `--baseline <dir>` points at a
    * PREVIOUS sweep's `--out` dump and prints the per-table
    * [[graft.scan.Drift.compare]] rows that moved — the cross-run loop the
    * reference delegates to Soda Cloud, across every table in one command.
    * `--report <md-file>` additionally renders everything as one markdown
    * document ([[sweepReport]]) — the human-readable artifact.
    * `--post <url>` ships the merged results as one JSON document to an
    * HTTP endpoint (or a `file:` path — the test/automation sink): the
    * webhook analogue of the reference's `soda_server_client` Soda Cloud
    * callback (scan.py:430,463), pointed at a caller-owned endpoint.
    *
    * Exit code: 0 all tables pass, 1 any test failure, 2 any scan error /
    * unresolvable table / bad usage / failed --post — schedulers gate on
    * the worst table.
    */
  def runSweep(args: Array[String], sparkIn: Option[SparkSession]): Int = {
    import graft.api.ScanResultFrames
    import graft.scan.{Drift, ScanYamlParser, Scanner}
    import org.apache.spark.sql.functions.lit

    val usage = "usage: graft.Main sweep <scan-dir> <table-root> " +
      "[--out <dir>] [--baseline <dir>] [--report <md-file>] [--post <url>] [key=value ...]"
    if (args.length < 2) { System.err.println(usage); return 2 }
    val Array(scanDir, tableRoot) = args.take(2)
    var outDir = Option.empty[String]
    var baseline = Option.empty[String]
    var reportPath = Option.empty[String]
    var postUrl = Option.empty[String]
    val vars = scala.collection.mutable.Map.empty[String, String]
    var i = 2
    while (i < args.length) args(i) match {
      case "--out" if i + 1 < args.length => outDir = Some(args(i + 1)); i += 2
      case "--baseline" if i + 1 < args.length => baseline = Some(args(i + 1)); i += 2
      case "--report" if i + 1 < args.length => reportPath = Some(args(i + 1)); i += 2
      case "--post" if i + 1 < args.length => postUrl = Some(args(i + 1)); i += 2
      case kv => kv.split("=", 2) match {
        case Array(k, v) => vars(k) = v; i += 1
        case _ => System.err.println(s"unrecognized argument '$kv'\n$usage"); return 2
      }
    }
    val ymls = Option(new java.io.File(scanDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && (f.getName.endsWith(".yml") || f.getName.endsWith(".yaml")))
      .sortBy(_.getName)
    if (ymls.isEmpty) { System.err.println(s"no scan ymls under $scanDir"); return 2 }

    val spark = sparkIn.getOrElse {
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("graft-scan-sweep")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    try {
      def readTable(name: String): Option[org.apache.spark.sql.DataFrame] = {
        val candidates = Seq(s"$tableRoot/$name.parquet", s"$tableRoot/$name",
          s"$tableRoot/$name.csv", s"$tableRoot/$name.json", s"$tableRoot/$name.jsonl")
        candidates.find(p => new java.io.File(p).exists()).map { p =>
          if (p.endsWith(".csv"))
            spark.read.option("header", "true").option("inferSchema", "true").csv(p)
          else if (p.endsWith(".json") || p.endsWith(".jsonl")) spark.read.json(p)
          else spark.read.parquet(p)
        }
      }
      var anyError = false
      val results = ymls.toSeq.map { f =>
        val content = java.nio.file.Files.readString(f.toPath)
        val table = ScanYamlParser.parse(content).tableName
        readTable(table) match {
          case None =>
            System.err.println(s"  $table: no table under $tableRoot")
            anyError = true
            table -> graft.api.ScanResult(Nil, Nil,
              Seq(graft.api.ScanError(s"table $table not found under $tableRoot")))
          case Some(df) =>
            table -> Scanner.executeYaml(spark, df, content, vars.toMap)
        }
      }
      results.foreach { case (table, r) =>
        val failed = r.testResults.count(t => !t.skipped && !t.passed)
        val status =
          if (r.hasErrors) "ERROR" else if (failed > 0) "FAIL" else "PASS"
        println(f"  $status%-5s $table%-12s measurements=${r.measurements.size}%-4d " +
          s"tests=${r.testResults.size} failed=$failed errors=${r.errors.size}")
        r.testResults.filter(t => !t.skipped && !t.passed).foreach(t =>
          println(s"         FAIL ${t.test.expression} " +
            t.values.map { case (k, v) => s"$k=$v" }.mkString("[", ", ", "]")))
        r.errors.foreach(e => println(s"         ERROR ${e.message}"))
      }
      // ONE merged report: per-table frames unioned under a `table` column
      val measurements = results.map { case (t, r) =>
        ScanResultFrames.measurementsToDF(spark, r.measurements)
          .select(lit(t).as("table"), org.apache.spark.sql.functions.col("*"))
      }.reduce(_ unionByName _)
      val tests = results.map { case (t, r) =>
        ScanResultFrames.testResultsToDF(spark, r.testResults)
          .select(lit(t).as("table"), org.apache.spark.sql.functions.col("*"))
      }.reduce(_ unionByName _)
      outDir.foreach { d =>
        measurements.coalesce(1).write.mode("overwrite").parquet(s"$d/measurements")
        tests.coalesce(1).write.mode("overwrite").parquet(s"$d/tests")
        println(s"  merged report written under $d")
      }
      val driftLines: Seq[String] = baseline.toSeq.flatMap { b =>
        val prev = spark.read.parquet(s"$b/measurements").collect().toSeq
          .groupBy(_.getAs[String]("table"))
          .map { case (t, rows) =>
            t -> graft.api.ScanResult(rows.map { row =>
              val v = Option(row.getAs[String]("value")).map { s =>
                scala.util.Try(java.lang.Double.valueOf(s): Any).getOrElse(s: Any)
              }
              graft.api.Measurement(row.getAs[String]("metric"),
                Option(row.getAs[String]("column_name")), v)
            }, Nil, Nil)
          }
        results.flatMap { case (t, r) =>
          prev.get(t) match {
            case None => Seq(s"$t: no baseline")
            case Some(p) =>
              val moved = Drift.driftedOnly(p, r)
              if (moved.isEmpty) Seq(s"$t: stable")
              else moved.map(d => s"$t: ${d.status} ${d.metric}" +
                d.columnName.map(c => s" $c").getOrElse("") +
                s" ${d.before.getOrElse("-")} -> ${d.after.getOrElse("-")}")
          }
        }
      }
      if (baseline.nonEmpty) {
        println("  -- drift vs baseline --")
        driftLines.foreach(l => println(s"  $l"))
      }
      reportPath.foreach { p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
          sweepReport(results, driftLines, baseline))
        println(s"  markdown report written to $p")
      }
      val failedTotal = results.map(_._2.testResults.count(t => !t.skipped && !t.passed)).sum
      val errorsTotal = results.count(_._2.hasErrors)
      // --post: ship the merged results as ONE JSON document — the
      // machine-readable analogue of the reference's soda_server_client
      // callback (scan.py posts results to Soda Cloud), pointed at YOUR
      // endpoint instead of a proprietary service. The measurements/tests
      // arrays are the --out frames row-for-row (Spark's own toJSON
      // encoding); `file:` URLs write the body to the path — the
      // zero-network test/automation sink. Posting never masks the scan
      // verdict: test failures still exit 1; a transport failure is an
      // operational error (exit 2, like any other scan error).
      var postFailed = false
      postUrl.foreach { u =>
        def esc(s: String): String = s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        }
        val mJson = measurements.toJSON.collect().mkString("[", ",", "]")
        val tJson = tests.toJSON.collect().mkString("[", ",", "]")
        val eJson = results.flatMap { case (t, r) =>
          r.errors.map(e => s"""{"table":"${esc(t)}","message":"${esc(e.message)}"}""")
        }.mkString("[", ",", "]")
        val body = s"""{"tables":${results.size},"failed_tests":$failedTotal,""" +
          s""""tables_with_errors":$errorsTotal,"measurements":$mJson,""" +
          s""""tests":$tJson,"errors":$eJson}"""
        postJson(u, body) match {
          case None => println(s"  posted sweep results to $u")
          case Some(err) =>
            System.err.println(s"  post to $u failed: $err")
            postFailed = true
        }
      }
      println(s"sweep complete: ${results.size} tables, $failedTotal failed tests, " +
        s"$errorsTotal tables with errors")
      if (anyError || errorsTotal > 0 || postFailed) 2
      else if (failedTotal > 0) 1 else 0
    } catch {
      case e: Exception =>
        System.err.println(s"sweep failed: ${e.getMessage}")
        2
    } finally if (sparkIn.isEmpty) spark.stop()
  }

  /** Minimal JSON-POST transport for `sweep --post`. `file:` URLs write the
    * body to the path (zero-network tests/automation); http(s) URLs POST
    * with `Content-Type: application/json` and succeed on any 2xx. Returns
    * None on success, Some(error) otherwise — the caller decides exit-code
    * policy.
    */
  private def postJson(url: String, body: String): Option[String] =
    try {
      if (url.startsWith("file:")) {
        val p = java.nio.file.Paths.get(java.net.URI.create(url))
        Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(p,
          body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        None
      } else {
        val conn = java.net.URI.create(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        val out = conn.getOutputStream
        try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        val code = conn.getResponseCode
        if (code >= 200 && code < 300) None else Some(s"HTTP $code")
      }
    } catch { case e: Exception => Some(e.getMessage) }

  /** The human-readable half of the sweep: one markdown document with the
    * per-table status table, each table's failed tests / errors /
    * measurements, and the drift-vs-baseline section when a baseline was
    * given — the report the reference delegates to Soda Cloud's UI,
    * rendered from the sweep's own in-memory results (no re-scan).
    */
  private def sweepReport(results: Seq[(String, graft.api.ScanResult)],
                          driftLines: Seq[String],
                          baseline: Option[String]): String = {
    val sb = new StringBuilder
    def esc(s: String): String = s.replace("|", "\\|").replace("\n", " ")
    sb ++= "# Scan sweep report\n\n"
    val failedTotal = results.map(_._2.testResults.count(t => !t.skipped && !t.passed)).sum
    val errorTables = results.count(_._2.hasErrors)
    sb ++= s"${results.size} tables, $failedTotal failed tests, " +
      s"$errorTables tables with errors\n\n"
    sb ++= "| table | status | measurements | tests | failed | errors |\n"
    sb ++= "|---|---|---|---|---|---|\n"
    results.foreach { case (t, r) =>
      val failed = r.testResults.count(x => !x.skipped && !x.passed)
      val status = if (r.hasErrors) "ERROR" else if (failed > 0) "FAIL" else "PASS"
      sb ++= s"| ${esc(t)} | $status | ${r.measurements.size} | " +
        s"${r.testResults.size} | $failed | ${r.errors.size} |\n"
    }
    results.foreach { case (t, r) =>
      val failed = r.testResults.count(x => !x.skipped && !x.passed)
      val status = if (r.hasErrors) "ERROR" else if (failed > 0) "FAIL" else "PASS"
      sb ++= s"\n## $t — $status\n"
      val bad = r.testResults.filter(x => !x.skipped && !x.passed)
      if (bad.nonEmpty) {
        sb ++= "\n### Failed tests\n\n"
        bad.foreach { x =>
          val vals = if (x.values.nonEmpty)
            x.values.map { case (k, v) => s"$k=$v" }.mkString(" [", ", ", "]") else ""
          sb ++= s"- `${x.test.expression}`${esc(vals)}\n"
        }
      }
      if (r.errors.nonEmpty) {
        sb ++= "\n### Errors\n\n"
        r.errors.foreach(e => sb ++= s"- ${esc(e.message)}\n")
      }
      if (r.measurements.nonEmpty) {
        sb ++= "\n### Measurements\n\n| metric | column | value |\n|---|---|---|\n"
        r.measurements.foreach { m =>
          val v = m.value.map(_.toString)
            .getOrElse(if (m.groupValues.nonEmpty) s"groups=${m.groupValues.size}" else "")
          sb ++= s"| ${esc(m.metric)} | ${m.columnName.map(esc).getOrElse("")} | ${esc(v)} |\n"
        }
      }
    }
    baseline.foreach { b =>
      sb ++= s"\n## Drift vs baseline (`$b`)\n\n"
      driftLines.foreach(l => sb ++= s"- ${esc(l)}\n")
    }
    sb.result()
  }

  /** The continuous-monitor subcommand: drive the streaming scan from a
    * [[graft.streaming.StreamLog.FileLogSource]] (JSONL segment files — the
    * kafka-shaped replayable log; point the same code at a real kafka
    * source by swapping the envelope frame) and sink each monitor to
    * parquet under `<out-dir>/{quality,tests,anomaly_<col>,psi_<col>}`,
    * or to the console when out-dir is the literal `console`.
    *
    * Runs with `Trigger.AvailableNow`: each invocation processes exactly
    * the segments appended since the last run (checkpoints under
    * `<out-dir>/_checkpoints`) and exits — cron-able incremental
    * monitoring, not a resident daemon. `--max-files-per-trigger`
    * (default 1) paces replay one segment per micro-batch so the watermark
    * advances between segments — with everything in one batch no window
    * ever closes and append-mode sinks emit nothing.
    *
    * The payload schema comes from `--schema "<ddl>"` (e.g.
    * `"event_type STRING, value DOUBLE"`) or, when omitted, is inferred
    * from the log's existing payloads (batch JSON inference — convenient
    * locally; pass the DDL in production so a malformed segment can't
    * silently re-type a column).
    *
    * Exit code mirrors the batch CLI, evaluated over the test-verdict rows
    * WRITTEN BY THIS RUN (not historical ones): 0 none failed, 1 some
    * window's test failed, 2 errors/bad usage. Append-mode semantics
    * apply: a window's verdicts emit once the watermark passes its end —
    * the freshest (still-open) window is gated by the NEXT run.
    */
  def runStream(args: Array[String], sparkIn: Option[SparkSession]): Int = {
    import graft.streaming.StreamLog
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.StructType

    val usage = "usage: graft.Main stream <scan.yml> <log-dir> <out-dir|console> " +
      "[--schema <ddl>] [--max-files-per-trigger N] [key=value ...]"
    if (args.length < 3) { System.err.println(usage); return 2 }
    val Array(yamlPath, logDir, outDir) = args.take(3)
    var schemaDdl = Option.empty[String]
    var maxFiles = 1
    val vars = scala.collection.mutable.Map.empty[String, String]
    var i = 3
    while (i < args.length) args(i) match {
      case "--schema" if i + 1 < args.length => schemaDdl = Some(args(i + 1)); i += 2
      case "--max-files-per-trigger" if i + 1 < args.length => maxFiles = args(i + 1).toInt; i += 2
      case kv => kv.split("=", 2) match {
        case Array(k, v) => vars(k) = v; i += 1
        case _ => System.err.println(s"unrecognized argument '$kv'\n$usage"); return 2
      }
    }

    val spark = sparkIn.getOrElse {
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
        .appName("graft-scan-stream")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    val console = outDir == "console"
    try {
      val source = StreamLog.FileLogSource(logDir, Some(maxFiles))
      val schema = schemaDdl.map(StructType.fromDDL).getOrElse {
        import spark.implicits._
        spark.read.json(source.batch(spark).select("value").as[String]).schema
      }
      val scan = Scanner.executeStreamYaml(spark,
        StreamLog.parsed(source.stream(spark), schema), yamlPath, vars.toMap)

      // ONE coordinated-sample sink per COLUMN serves the whole numeric
      // drift battery on it: ks/mwu/w1 read the identical (window_start,
      // sample) feed (Scanner shares the stream), so a column configured
      // with all three runs ONE windowed aggregate with ONE checkpoint —
      // not three identical queries. The ks frame is the sample feed plus
      // its in-stream ks_stat column, so it serves as the sink when present.
      val sampleCols = (scan.ks.keySet ++ scan.mwu.keySet ++ scan.w1.keySet ++
        scan.cvm.keySet ++ scan.energy.keySet ++ scan.ad.keySet ++
        scan.moodScale.keySet).toSeq.sorted
      val sampleFeeds = sampleCols.map { c =>
        val feed = scan.ks.get(c).map(_._2)
          .orElse(scan.mwu.get(c).map(_._2))
          .orElse(scan.w1.get(c).map(_._2))
          .orElse(scan.cvm.get(c).map(_._2))
          .orElse(scan.energy.get(c).map(_._2))
          .orElse(scan.ad.get(c).map(_._2))
          .orElse(scan.moodScale.get(c).map(_._2)).get
        s"sample_$c" -> feed
      }
      val monitors: Seq[(String, org.apache.spark.sql.DataFrame)] =
        Seq("quality" -> scan.quality, "tests" -> scan.tests) ++
          scan.anomalies.toSeq.map { case (c, ds) => s"anomaly_$c" -> ds.toDF() } ++
          scan.psi.toSeq.map { case (c, (_, df)) => s"psi_$c" -> df } ++
          sampleFeeds ++
          scan.benford.toSeq.map { case (c, df) => s"benford_$c" -> df } ++
          scan.coMissing.toSeq.map(df => "co_missingness" -> df) ++
          // categorical drift: per-window category counts (chi2 verdicts
          // computed against the reference in the bounded post-pass below)
          scan.chi2.toSeq.map { case (c, (_, df)) => s"chi2_$c" -> df } ++
          // parametric mean drift: per-window EXACT raw moments (welch
          // verdicts derived in the post-pass — bit-equal to batch welchT)
          scan.welch.toSeq.map { case (c, (_, df)) => s"moments_$c" -> df }

      def parquetFiles(sub: String): Set[String] = {
        val d = new java.io.File(s"$outDir/$sub")
        if (!d.isDirectory) Set.empty
        else d.listFiles().iterator.map(_.getPath).filter(_.endsWith(".parquet")).toSet
      }
      val testsBefore = parquetFiles("tests")
      // high-water mark for the drift post-pass: verdicts run only over
      // windows whose files THIS run writes (the before/after diff), so a
      // long-lived monitored table doesn't make every run re-collect and
      // re-print its entire window history
      val monitorsBefore: Map[String, Set[String]] =
        monitors.map { case (n, _) => n -> parquetFiles(n) }.toMap

      val queries = monitors.map { case (name, df) =>
        val w = df.writeStream.queryName(name)
          .outputMode("append").trigger(Trigger.AvailableNow())
        if (console) w.format("console").option("truncate", "false").start()
        else w.format("parquet")
          .option("path", s"$outDir/$name")
          .option("checkpointLocation", s"$outDir/_checkpoints/$name")
          .start()
      }
      queries.foreach(_.awaitTermination())

      if (console) 0
      else {
        val fresh = (parquetFiles("tests") -- testsBefore).toSeq.sorted
        val failed =
          if (fresh.isEmpty) 0L
          else {
            val verdicts = spark.read.parquet(fresh: _*)
            val bad = verdicts.where(!col("skipped") && !col("passed"))
            val n = bad.count()
            if (n > 0) {
              println(s"-- failed window tests ($n) --")
              bad.orderBy("window_start", "column_name", "test").collect().take(50)
                .foreach(r => println(s"  FAIL  window=${r.get(0)} column=${r.get(1)} test=${r.get(2)}"))
            }
            n
          }
        // drift verdicts over THIS RUN's windows only: the per-window
        // halves of the mwu/w1/chi2 reference monitors, paired with the
        // loaded references through the driver-side twins (bit-equal to
        // the distributed statistics — StreamingSpec). Append-mode windows
        // emit once, so the fresh-file diff is exactly the new windows —
        // the driver collect stays bounded by one run's output however
        // long the table has been monitored.
        def windowsOf(sub: String): Seq[org.apache.spark.sql.Row] = {
          val fresh = (parquetFiles(sub) -- monitorsBefore.getOrElse(sub, Set.empty))
            .toSeq.sorted
          if (fresh.isEmpty) Seq.empty
          else spark.read.parquet(fresh: _*).collect().toSeq
        }
        scan.mwu.foreach { case (c, (ref, _)) =>
          windowsOf(s"sample_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val s = r.getSeq[Double](r.fieldIndex("sample"))
              if (s.nonEmpty) {
                val (_, _, auc, z) = graft.scan.Drift.mwuOfSamples(ref, s)
                println(f"  MWU   column=$c window=${r.getAs[Any]("window_start")} auc=$auc%.4f z=${z.map(v => f"$v%.2f").getOrElse("null")}")
              }
            }
        }
        scan.w1.foreach { case (c, (ref, _)) =>
          windowsOf(s"sample_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val s = r.getSeq[Double](r.fieldIndex("sample"))
              if (s.nonEmpty)
                println(f"  W1    column=$c window=${r.getAs[Any]("window_start")} w1=${graft.scan.Drift.w1OfSamples(ref, s)}%.4f")
            }
        }
        scan.cvm.foreach { case (c, (ref, _)) =>
          windowsOf(s"sample_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val s = r.getSeq[Double](r.fieldIndex("sample"))
              if (s.nonEmpty) {
                val (_, t) = graft.scan.Drift.cvmOfSamples(ref, s)
                println(f"  CVM   column=$c window=${r.getAs[Any]("window_start")} t=$t%.4f")
              }
            }
        }
        scan.energy.foreach { case (c, (ref, _)) =>
          windowsOf(s"sample_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val s = r.getSeq[Double](r.fieldIndex("sample"))
              if (s.nonEmpty) {
                val (e, t) = graft.scan.Drift.energyOfSamples(ref, s)
                println(f"  ENRGY column=$c window=${r.getAs[Any]("window_start")} e=$e%.4f t=$t%.4f")
              }
            }
        }
        scan.ad.foreach { case (c, (ref, _)) =>
          windowsOf(s"sample_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val s = r.getSeq[Double](r.fieldIndex("sample"))
              if (s.nonEmpty) {
                val (_, a2) = graft.scan.Drift.adOfSamples(ref, s)
                println(f"  AD    column=$c window=${r.getAs[Any]("window_start")} a2=$a2%.4f")
              }
            }
        }
        scan.moodScale.foreach { case (c, (ref, _)) =>
          windowsOf(s"sample_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val s = r.getSeq[Double](r.fieldIndex("sample"))
              if (s.nonEmpty) {
                val (m4, z) = graft.scan.Drift.moodScaleOfSamples(ref, s)
                println(f"  MOODS column=$c window=${r.getAs[Any]("window_start")} m4=$m4%.0f z=$z%.3f")
              }
            }
        }
        scan.welch.foreach { case (c, ((rn, rs, rq), _)) =>
          windowsOf(s"moments_$c").sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
            .foreach { r =>
              val n = r.getAs[Long]("n")
              if (n > 0) {
                val (_, _, _, _, t, df) = graft.scan.Drift.welchOfMoments(
                  rn, rs, rq, n,
                  BigInt(r.getDecimal(r.fieldIndex("s_raw")).toBigInteger),
                  BigInt(r.getDecimal(r.fieldIndex("q_raw")).toBigInteger))
                println(f"  WELCH column=$c window=${r.getAs[Any]("window_start")} t=${t.map(v => f"$v%.3f").getOrElse("null")} df=${df.map(v => f"$v%.1f").getOrElse("null")}")
              }
            }
        }
        scan.chi2.foreach { case (c, (ref, _)) =>
          windowsOf(s"chi2_$c")
            .groupBy(_.getAs[java.sql.Timestamp]("window_start"))
            .toSeq.sortBy(_._1.getTime)
            .foreach { case (w, rows) =>
              val cur = rows.map(r => r.getAs[String]("category") -> r.getAs[Long]("cnt")).toMap
              if (cur.valuesIterator.sum > 0) {
                val (_, _, _, ppm) = graft.scan.Drift.chi2OfCounts(ref, cur)
                println(s"  CHI2  column=$c window=$w chi2_ppm=$ppm")
              }
            }
        }
        println(s"stream scan complete: ${monitors.size} monitors, $failed failed window tests this run")
        if (failed > 0) 1 else 0
      }
    } catch {
      case e: Exception =>
        System.err.println(s"stream scan failed: ${e.getMessage}")
        2
    } finally if (sparkIn.isEmpty) spark.stop()
  }
}
