package graft

import org.apache.spark.sql.functions._

class MainSpec extends SparkSpec {
  import spark.implicits._

  private def withTable(test: (String, String) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toString
    val table = s"$dir/t.parquet"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0))
      .toDF("id", "name", "amount").write.mode("overwrite").parquet(table)
    val yml = s"$dir/scan.yml"
    test(table, yml)
  }

  private def runCli(yaml: String, yml: String, table: String, vars: String*): (Int, String) = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(yml), yaml)
    val buf = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(buf)) {
      Main.run(Array(yml, table) ++ vars, Some(spark))
    }
    (code, buf.toString)
  }

  test("CLI end-to-end: prints measurements/tests, exit 0 on pass, 1 on failure") {
    withTable { (table, yml) =>
      val passing =
        """table_name: t
          |metrics:
          |- row_count
          |- missing_count
          |tests:
          |- row_count > 0
          |columns:
          |  name:
          |    tests:
          |    - missing_count <= 1
          |""".stripMargin
      val (code, out) = runCli(passing, yml, table)
      assert(code == 0, out)
      assert(out.contains("row_count = 3"))
      assert(out.contains("PASS  row_count > 0"))
      assert(out.contains("PASS  missing_count <= 1"))

      val failing = passing.replace("missing_count <= 1", "missing_count == 0")
      val (code2, out2) = runCli(failing, yml, table)
      assert(code2 == 1, out2)
      assert(out2.contains("FAIL  missing_count == 0"))
    }
  }

  test("sweep subcommand: two tables one pass one fail, merged report, drift vs baseline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-sweep").toString
    val root = s"$dir/tables"; val scans = s"$dir/scans"
    new java.io.File(root).mkdirs(); new java.io.File(scans).mkdirs()
    Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "name").write.parquet(s"$root/good.parquet")
    Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "name").write.parquet(s"$root/bad.parquet")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$scans/a_good.yml"),
      """table_name: good
        |metrics:
        |- row_count
        |tests:
        |- row_count > 0
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$scans/b_bad.yml"),
      """table_name: bad
        |metrics:
        |- row_count
        |columns:
        |  name:
        |    tests:
        |    - missing_count == 0
        |""".stripMargin)
    def sweep(extra: String*): (Int, String) = {
      val buf = new java.io.ByteArrayOutputStream()
      val code = Console.withOut(new java.io.PrintStream(buf)) {
        Main.run(Array("sweep", scans, root) ++ extra, Some(spark))
      }
      (code, buf.toString)
    }
    val (code, out) = sweep("--out", s"$dir/run1")
    assert(code == 1, out) // bad's test fails -> worst-table exit
    assert(out.contains("PASS") && out.contains("good"))
    assert(out.contains("FAIL") && out.contains("bad"))
    assert(out.contains("missing_count == 0"))
    // ONE merged report with the table column
    val merged = spark.read.parquet(s"$dir/run1/measurements")
    assert(merged.columns.head == "table")
    assert(merged.select("table").distinct().as[String].collect().toSet ==
      Set("good", "bad"))
    val tests = spark.read.parquet(s"$dir/run1/tests")
    assert(tests.where(!col("passed") && !col("skipped")).count() == 1)
    // grow `good` -> drift vs the run1 baseline flags row_count, bad stable
    Seq((4L, "d"), (5L, "e"), (6L, "f"), (7L, "g")).toDF("id", "name")
      .write.mode("append").parquet(s"$root/good.parquet")
    val (code2, out2) = sweep("--baseline", s"$dir/run1")
    assert(code2 == 1, out2)
    assert(out2.contains("drift vs baseline"), out2)
    assert(out2.contains("good: drifted row_count 3.0 -> 7.0"), out2)
    assert(out2.contains("bad: stable"), out2)
    // --report renders the same results as one markdown document
    val md = s"$dir/report.md"
    val (code3, out3) = sweep("--baseline", s"$dir/run1", "--report", md)
    assert(code3 == 1, out3)
    assert(out3.contains(s"markdown report written to $md"), out3)
    val report = java.nio.file.Files.readString(java.nio.file.Paths.get(md))
    assert(report.startsWith("# Scan sweep report"), report)
    assert(report.contains("| good | PASS |"), report)
    assert(report.contains("| bad | FAIL |"), report)
    assert(report.contains("## bad — FAIL"), report)
    assert(report.contains("### Failed tests"), report)
    assert(report.contains("`missing_count == 0`"), report)
    // the passing table has no failed-tests section, but has measurements
    assert(!report.split("## bad")(0).contains("### Failed tests"), report)
    assert(report.contains("| row_count |  | 7 |"), report)
    // drift section carries the baseline comparison
    assert(report.contains("## Drift vs baseline"), report)
    assert(report.contains("good: drifted row_count 3.0 -> 7.0"), report)
    assert(report.contains("bad: stable"), report)
    // --post (file-URL transport): the sink receives ONE JSON document with
    // the merged measurements/tests row-for-row and the summary counts;
    // a failing test STILL exits 1 (posting never masks the verdict)
    val sink = s"$dir/posted/sweep.json"
    val (code4, out4) = sweep("--post", s"file://$sink")
    assert(code4 == 1, out4)
    assert(out4.contains(s"posted sweep results to file://$sink"), out4)
    val posted = java.nio.file.Files.readString(java.nio.file.Paths.get(sink))
    assert(posted.startsWith("""{"tables":2,"failed_tests":1,"tables_with_errors":0,"""),
      posted.take(200))
    // the measurements array is the --out frame row-for-row (Spark toJSON)
    val expectMs = spark.read.parquet(s"$dir/run1/measurements")
      .where(col("table") === "bad").toJSON.collect()
    expectMs.foreach(m => assert(posted.contains(m), s"missing $m"))
    assert(posted.contains(""""tests":[{"""), posted.take(400))
    assert(posted.contains(""""errors":[]"""), posted.takeRight(200))
    // unwritable sink -> operational error exit 2, verdict still printed
    val (code5, _) = sweep("--post", "file:///proc/nope/x.json")
    assert(code5 == 2)
    // a yml naming a missing table -> exit 2
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$scans/c_absent.yml"),
      "table_name: absent\nmetrics:\n- row_count\n")
    assert(sweep()._1 == 2)
  }

  test("stream subcommand: file-log in, parquet verdicts out, checkpointed incremental runs") {
    import graft.streaming.StreamLog
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def payload(et: String, v: Double) = s"""{"event_type":"$et","value":$v}"""

    val dir = java.nio.file.Files.createTempDirectory("graft-cli-stream").toString
    try {
      val logDir = s"$dir/log"; val outDir = s"$dir/out"; val yml = s"$dir/scan.yml"
      // drift references for the battery monitors riding the same scan.yml
      Seq(10.0, 20.0, 30.0).toDF("value").write.parquet(s"$dir/ref_vals")
      Seq("click", "click", "view").toDF("event_type").write.parquet(s"$dir/ref_cats")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(yml),
        s"""table_name: events
          |stream:
          |  time_column: timestamp
          |  watermark: 10 seconds
          |  window: 1 hour
          |tests:
          |- row_count > 0
          |columns:
          |  value:
          |    valid_max: 100
          |    mwu_reference: $dir/ref_vals
          |    w1_reference: $dir/ref_vals
          |    tests:
          |    - invalid_count == 0
          |  event_type:
          |    chi2_reference: $dir/ref_cats
          |""".stripMargin)
      // window 0 (hour 0): 3 events, one invalid (500 > valid_max)
      StreamLog.appendSegment(spark, logDir, Seq(
        ("u1", payload("click", 10.0), "events", 0, 0L, ts(0, 5)),
        ("u2", payload("view", 500.0), "events", 0, 1L, ts(0, 25)),
        ("u3", payload("click", 20.0), "events", 0, 2L, ts(0, 45))))
      // hour-2 sentinel: advances the watermark past window 0's end
      StreamLog.appendSegment(spark, logDir, Seq(
        ("u4", payload("view", 1.0), "events", 0, 3L, ts(2, 10))))

      val cliArgs = Array("stream", yml, logDir, outDir,
        "--schema", "event_type STRING, value DOUBLE")
      // run 1: window 0 closes -> its invalid_count test fails -> exit 1
      assert(Main.run(cliArgs, Some(spark)) == 1)
      val verdicts = spark.read.parquet(s"$outDir/tests")
        .select(col("window_start").cast("string"), col("column_name"),
          col("test"), col("passed"))
        .as[(String, String, String, Boolean)].collect().toSet
      assert(verdicts == Set(
        ("2024-01-01 00:00:00", null, "row_count > 0", true),
        ("2024-01-01 00:00:00", "value", "invalid_count == 0", false)))
      val quality = spark.read.parquet(s"$outDir/quality")
        .select(col("window_start").cast("string"), col("row_count"), col("value_invalid"))
        .as[(String, Long, Long)].collect().toSet
      assert(quality == Set(("2024-01-01 00:00:00", 3L, 1L)))

      // the drift-battery monitors sank window 0 alongside the verdicts:
      // ONE coordinated-sample sink per column serves BOTH mwu and w1
      // (keyed by column, not monitor kind — one aggregate, one checkpoint)
      val sample = spark.read.parquet(s"$outDir/sample_value")
        .select(col("window_start").cast("string"), col("sample"))
        .as[(String, Seq[Double])].collect().toSeq
      assert(sample.map(_._1) == Seq("2024-01-01 00:00:00") &&
        sample.head._2.sorted == Seq(10.0, 20.0, 500.0))
      assert(!new java.io.File(s"$outDir/mwu_value").exists() &&
        !new java.io.File(s"$outDir/w1_value").exists(),
        "per-monitor-kind duplicate sinks must not exist")
      val chi2Counts = spark.read.parquet(s"$outDir/chi2_event_type")
        .select(col("window_start").cast("string"), col("category"), col("cnt"))
        .as[(String, String, Long)].collect().toSet
      assert(chi2Counts == Set(("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 00:00:00", "view", 1L)))

      // run 2: nothing new appended -> checkpoint skips everything -> exit 0
      assert(Main.run(cliArgs, Some(spark)) == 0)
      assert(spark.read.parquet(s"$outDir/tests").count() == 2)

      // run 3: a later segment closes the (clean) sentinel window -> exit 0,
      // only that window's verdicts are new; the drift post-pass verdicts
      // ONLY the freshly-written window (high-water mark on the file diff) —
      // window 0's MWU/W1/CHI2 lines must NOT be recomputed and reprinted
      StreamLog.appendSegment(spark, logDir, Seq(
        ("u5", payload("click", 2.0), "events", 0, 4L, ts(4, 5))))
      val buf3 = new java.io.ByteArrayOutputStream()
      val code3 = Console.withOut(new java.io.PrintStream(buf3)) {
        Main.run(cliArgs, Some(spark))
      }
      assert(code3 == 0, buf3.toString)
      val out3 = buf3.toString
      assert(out3.contains("MWU   column=value window=2024-01-01 02:00:00"), out3)
      assert(!out3.contains("window=2024-01-01 00:00:00"),
        s"run 3 re-verdicted historical windows:\n$out3")
      val all = spark.read.parquet(s"$outDir/tests")
        .select(col("window_start").cast("string"), col("passed"))
        .as[(String, Boolean)].collect().toSeq
      assert(all.size == 4 && all.count(_._1 == "2024-01-01 02:00:00") == 2 &&
        all.filter(_._1 == "2024-01-01 02:00:00").forall(_._2))

      // bad usage exits 2
      assert(Main.run(Array("stream", yml), Some(spark)) == 2)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("CLI variables substitute into the filter; bad usage exits 2") {
    withTable { (table, yml) =>
      val yaml =
        """table_name: t
          |filter: amount >= {{ min_amount }}
          |metrics:
          |- row_count
          |tests:
          |- row_count == 2
          |""".stripMargin
      val (code, out) = runCli(yaml, yml, table, "min_amount=15")
      assert(code == 0, out)
      assert(out.contains("row_count = 2"))
      assert(Main.run(Array("only-one-arg"), Some(spark)) == 2)
      assert(Main.run(Array(yml, "/nonexistent/path.parquet"), Some(spark)) == 2)
    }
  }
}
