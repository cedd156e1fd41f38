package graft

import graft.api._
import graft.scan.Scanner
import org.apache.spark.sql.functions.{col, lit}

class ScannerSpec extends SparkSpec {
  import spark.implicits._

  // 6 rows: one NULL size, one bad uuid, one bad fee, two duplicate countries
  lazy val df = Seq(
    ("0b0e4a40-50c0-11eb-8be8-88e9fe6293fd", "alpha", Some(10), "12,5 %", "US"),
    ("1b0e4a40-50c0-11eb-8be8-88e9fe6293fd", "bravo", Some(20), "7,25 %", "US"),
    ("2b0e4a40-50c0-11eb-8be8-88e9fe6293fd", "charlie", Some(30), "99 %", "NL"),
    ("not-a-uuid", "delta", Some(40), "3,1 %", "UK"),
    ("4b0e4a40-50c0-11eb-8be8-88e9fe6293fd", "echo", None, "bad", "UK"),
    ("5b0e4a40-50c0-11eb-8be8-88e9fe6293fd", "foxtrot", Some(60), "1,0 %", "DE")
  ).toDF("id", "name", "size", "fee", "country")

  val yaml: String =
    """table_name: scannertest
      |metrics:
      |- row_count
      |- missing_count
      |- missing_percentage
      |- values_count
      |- valid_count
      |- invalid_count
      |- invalid_percentage
      |- min
      |- max
      |- avg
      |- sum
      |- min_length
      |- max_length
      |- avg_length
      |metric_groups:
      |- duplicates
      |tests:
      |- row_count > 0
      |columns:
      |  id:
      |    valid_format: uuid
      |    tests:
      |    - invalid_percentage < 20
      |  fee:
      |    valid_format: number_percentage
      |    tests:
      |    - invalid_count == 1
      |excluded_columns:
      |- name
      |sql_metrics:
      |- sql: |
      |    SELECT sum(size) as us_size
      |    FROM scannertest
      |    WHERE country = 'US'
      |  tests:
      |  - us_size > 25
      |""".stripMargin

  lazy val result: ScanResult = Scanner.executeYaml(spark, df, yaml)

  def m(metric: String, col: String = null): Any =
    result.measurement(metric, Option(col)).getOrElse(fail(s"missing $metric/$col")).value.get

  test("no scan errors") { assert(!result.hasErrors) }

  test("table metrics") {
    assert(m("row_count") == 6L)
    assert(result.measurements.head.metric == "schema")
  }

  test("missing metrics") {
    assert(m("missing_count", "size") == 1L)
    assert(m("values_count", "size") == 5L)
    assert(m("missing_percentage", "size").asInstanceOf[Double] > 16.0)
  }

  test("validity metrics") {
    assert(m("valid_count", "id") == 5L)
    assert(m("invalid_count", "id") == 1L)
    assert(m("invalid_count", "fee") == 1L)
  }

  test("numeric metrics on valid values") {
    assert(m("min", "size") == 10)
    assert(m("max", "size") == 60)
    assert(m("sum", "size").toString.toDouble == 160.0)
    assert(m("avg", "size").asInstanceOf[Double] == 32.0)
  }

  test("length metrics") {
    assert(m("min_length", "country") == 2)
    assert(m("max_length", "id") == 36)
  }

  test("distinct family") {
    assert(m("distinct", "country") == 4L)
    assert(m("unique_count", "country") == 2L)
    assert(m("duplicate_count", "country") == 2L)
  }

  test("excluded columns produce no measurements") {
    assert(!result.measurements.exists(_.columnName.contains("name")))
  }

  test("tests pass/fail as expected") {
    val byExpr = result.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("row_count > 0").passed)
    assert(byExpr("invalid_percentage < 20").passed)
    assert(byExpr("invalid_count == 1").passed)
    assert(byExpr("us_size > 25").passed)
    assert(byExpr("row_count > 0").values("expression_result") == "true")
  }

  test("sql metric measurement recorded") {
    assert(m("us_size") == 30L)
  }

  test("filter with variables") {
    val y =
      """table_name: t
        |filter: country = '{{ c }}'
        |metrics:
        |- row_count
        |""".stripMargin
    val r = Scanner.executeYaml(spark, df, y, Map("c" -> "UK"))
    assert(r.measurement("row_count").get.value.get == 2L)
  }

  test("mins/maxs measurements from the shared window job") {
    val y =
      """table_name: t
        |columns:
        |  size:
        |    metrics:
        |    - mins
        |    - maxs
        |""".stripMargin
    val r = Scanner.executeYaml(spark, df, y)
    assert(r.measurement("mins", Some("size")).get.value.get == Seq(10.0, 20.0, 30.0, 40.0, 60.0))
    assert(r.measurement("maxs", Some("size")).get.value.get == Seq(60.0, 40.0, 30.0, 20.0, 10.0))
  }

  test("approx_distinct rides the single scan pass") {
    val y =
      """table_name: t
        |columns:
        |  country:
        |    metrics:
        |    - approx_distinct
        |""".stripMargin
    val r = Scanner.executeYaml(spark, df, y)
    val v = r.measurement("approx_distinct", Some("country")).get.value.get.asInstanceOf[Long]
    assert(v == 4L) // HLL is exact at this cardinality
  }

  test("empty input does not crash the scan") {
    val r = Scanner.executeYaml(spark, df.where(lit(false)), yaml)
    assert(r.measurement("row_count").get.value.get == 0L)
    assert(!r.hasErrors || r.errors.forall(_.message.contains("Test")))
  }

  test("table sample is deterministic") {
    val s = Scanner.tableSample(df, 2, Seq("id")).select("name").as[String].collect()
    assert(s.toSeq == Seq("alpha", "bravo"))
  }

  test("failed rows sample is deterministic and correct") {
    val rows = Scanner.failedRows(df, "id", ColumnConfig(validFormat = Some("uuid")), 10, Seq("id"))
      .select("id").as[String].collect()
    assert(rows.toSeq == Seq("not-a-uuid"))
  }

  test("samples config drives failed-rows + table-sample collection in execute") {
    val yamlWithSamples =
      """table_name: scannertest
        |samples:
        |  table_limit: 3
        |  failed_limit: 10
        |columns:
        |  id:
        |    valid_format: uuid
        |""".stripMargin
    val r = Scanner.executeYaml(spark, df, yamlWithSamples)
    val ts = r.measurement("table_sample").getOrElse(fail("no table_sample"))
    assert(ts.value.contains(3L) && ts.groupValues.size == 3)
    val fr = r.measurement("failed_rows", Some("id")).getOrElse(fail("no failed_rows"))
    assert(fr.value.contains(1L))
    assert(fr.groupValues.head.group("id") == "not-a-uuid")
    // columns without missing/validity config collect no failed-rows sample
    assert(r.measurement("failed_rows", Some("country")).isEmpty)
  }

  test("scan time is stamped and caller-overridable") {
    assert(result.time.exists(_.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}.*""")))
    val r = Scanner.executeYaml(spark, df, "table_name: t\nmetrics:\n- row_count\n",
      time = Some("2026-01-02T03:04:05+00:00"))
    assert(r.time.contains("2026-01-02T03:04:05+00:00"))
  }

  test("test referencing an unmeasured metric is skipped, not errored") {
    val r = Scanner.executeYaml(spark, df,
      """table_name: scannertest
        |metrics:
        |- row_count
        |tests:
        |- distinct > 0
        |""".stripMargin)
    val tr = r.testResults.find(_.test.expression == "distinct > 0").getOrElse(fail("missing test"))
    assert(tr.skipped && !tr.passed && tr.error.isEmpty)
    assert(!r.hasErrors)
  }

  test("drift between two scans flags changed metrics") {
    import graft.scan.Drift
    val yaml2 =
      """table_name: scannertest
        |metrics:
        |- row_count
        |columns:
        |  size:
        |    metrics:
        |    - missing_count
        |    - avg
        |""".stripMargin
    val before = Scanner.executeYaml(spark, df, yaml2)
    val after = Scanner.executeYaml(spark, df.where(col("size").isNotNull && col("size") < 40), yaml2)
    val rows = Drift.compare(before, after).map(r => (r.metric, r.columnName, r.status))
    assert(rows.contains(("row_count", None, "drifted"))) // 6 -> 3
    val avg = Drift.compare(before, after).find(r => r.metric == "avg" && r.columnName.contains("size")).get
    assert(avg.before.contains(32.0) && avg.after.contains(20.0) && avg.status == "drifted")
    assert(Drift.driftedOnly(before, after).forall(_.status != "stable"))
  }

  test("executeYaml accepts a scan-file PATH like the reference") {
    val p = java.nio.file.Files.createTempFile("graft-scan", ".yml")
    try {
      java.nio.file.Files.writeString(p, yaml)
      val fromPath = Scanner.executeYaml(spark, df, p.toString, time = Some("2024-01-01T00:00:00Z"))
      val fromContent = Scanner.executeYaml(spark, df, yaml, time = Some("2024-01-01T00:00:00Z"))
      assert(fromPath.measurements == fromContent.measurements)
      assert(fromPath.testResults == fromContent.testResults)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("all-NULL column emits NO frequent_values/mins/maxs measurements") {
    val nulls = Seq((Option.empty[Int], "a"), (None, "b"), (None, "c"))
      .toDF("empty_col", "tag")
    val yaml2 =
      """table_name: nulltest
        |columns:
        |  empty_col:
        |    metrics:
        |    - frequent_values
        |    - mins
        |    - maxs
        |""".stripMargin
    val r = Scanner.executeYaml(spark, nulls, yaml2)
    assert(!r.measurements.exists(m =>
      m.columnName.contains("empty_col") &&
        Seq("frequent_values", "mins", "maxs").contains(m.metric)))
  }

  test("scan group-pass top-K compiles to TakeOrderedAndProject, never WindowExec") {
    val df = Seq((1, "a"), (2, "b"), (3, "a"), (4, "c")).toDF("n", "s")
    val counted = graft.metrics.GroupMetrics.countedFrame(df,
      Seq("n" -> ColumnConfig(), "s" -> ColumnConfig()))
    val freqPlan = Scanner.topFrequent(counted, 1, 5).queryExecution.executedPlan.toString
    assert(freqPlan.contains("TakeOrderedAndProject"), freqPlan)
    assert(!freqPlan.contains("Window"), freqPlan)
    val minsPlan = Scanner.edgeValues(counted, 0, 5, asc = true).queryExecution.executedPlan.toString
    assert(minsPlan.contains("TakeOrderedAndProject"), minsPlan)
    assert(!minsPlan.contains("Window"), minsPlan)
  }

  test("group-pass top-K slices of ALL columns run as ONE fused Spark job") {
    val wide = Seq((1, 10.0, "a"), (2, 20.0, "b"), (1, 10.0, "a"), (3, 30.0, "c"))
      .toDF("n1", "n2", "s1")
    val yaml3 =
      """table_name: fused
        |columns:
        |  n1:
        |    metrics:
        |    - frequent_values
        |    - mins
        |    - maxs
        |  n2:
        |    metrics:
        |    - mins
        |    - maxs
        |  s1:
        |    metrics:
        |    - frequent_values
        |""".stripMargin
    // count SQL EXECUTIONS (one per driver action; AQE sub-jobs share one)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          counter.incrementAndGet()
        case _ =>
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = Scanner.executeYaml(spark, wide, yaml3)
      Thread.sleep(300) // let queued listener events drain
      // pass 1 (row metrics) + distinct agg + ONE fused top-K collect = 3;
      // the pre-fusion shape ran 8 actions here (2 freq + 4 edge + 2)
      assert(counter.get() <= 4, s"expected <=4 driver actions, saw ${counter.get()}")
      // and the fused job still produced every slice
      assert(r.measurements.count(_.metric == "frequent_values") == 2)
      assert(r.measurements.count(_.metric == "mins") == 2)
      assert(r.measurements.count(_.metric == "maxs") == 2)
      val mins = r.measurements.find(m => m.metric == "mins" && m.columnName.contains("n2")).get
      assert(mins.value.contains(Seq(10.0, 20.0, 30.0)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("typed pass-2 classes replicate the string pass exactly: counts, tie order, decode text") {
    // mixed types across all three pass-2 classes (long: int/date/boolean,
    // double: float, string: string/decimal), with count TIES whose
    // string order differs from native order ("10" < "2" as text) — the
    // tie-break must still follow the DECODED STRING, as the old
    // cast-everything-to-string pass did.
    val rows = Seq(
      (Some(2),  Some("1995-12-31"), Some(0.1f),  Some(true),  Some(BigDecimal("1.50")), Some("a")),
      (Some(2),  Some("1995-12-31"), Some(0.1f),  Some(true),  Some(BigDecimal("1.50")), Some("a")),
      (Some(10), Some("2001-01-02"), Some(2.5f),  Some(false), Some(BigDecimal("2.00")), Some("b")),
      (Some(10), None,               None,        None,        None,                     Some("b")),
      (Some(1),  Some("2001-01-02"), Some(7.25f), Some(true),  Some(BigDecimal("2.00")), Some("c")),
      (None,     Some("2001-01-02"), Some(0.1f),  Some(true),  Some(BigDecimal("1.50")), None)
    ).toDF("i", "ds", "f", "b", "dec", "s")
      .withColumn("d", col("ds").cast("date")).drop("ds")
      .withColumn("dec", col("dec").cast("decimal(3,2)"))
    val yamlT =
      """table_name: typed
        |metric_groups:
        |- duplicates
        |columns:
        |  i:
        |    metrics:
        |    - frequent_values
        |    - mins
        |    - maxs
        |  f:
        |    metrics:
        |    - frequent_values
        |    - mins
        |  d:
        |    metrics:
        |    - frequent_values
        |  b:
        |    metrics:
        |    - frequent_values
        |  dec:
        |    metrics:
        |    - frequent_values
        |  s:
        |    metrics:
        |    - frequent_values
        |""".stripMargin
    val r = Scanner.executeYaml(spark, rows, yamlT)
    assert(!r.hasErrors, r.errors.mkString("; "))
    def mv(metric: String, c: String): Any =
      r.measurement(metric, Some(c)).getOrElse(fail(s"missing $metric/$c")).value.get
    def freq(c: String): Seq[(String, String)] =
      r.measurement("frequent_values", Some(c)).get.groupValues
        .map(gv => gv.group("value").toString -> gv.value)
    // distinct family per class (hand counts)
    assert(mv("distinct", "i") == 3L && mv("unique_count", "i") == 1L &&
      mv("duplicate_count", "i") == 2L)
    assert(mv("distinct", "d") == 2L && mv("duplicate_count", "d") == 2L)
    assert(mv("distinct", "f") == 3L && mv("unique_count", "f") == 2L)
    assert(mv("distinct", "b") == 2L)
    assert(mv("distinct", "dec") == 2L && mv("duplicate_count", "dec") == 2L)
    assert(mv("distinct", "s") == 3L)
    // count tie on i (2×"2", 2×"10"): STRING order puts "10" before "2"
    assert(freq("i") == Seq("10" -> "2", "2" -> "2", "1" -> "1"))
    // date decodes to its ISO text, not the unix_date long
    assert(freq("d") == Seq("2001-01-02" -> "3", "1995-12-31" -> "2"))
    // float decodes to the SHORTEST float text (0.1, not 0.10000000149011612)
    assert(freq("f") == Seq("0.1" -> "3", "2.5" -> "1", "7.25" -> "1"))
    assert(freq("b") == Seq("true" -> "4", "false" -> "1"))
    assert(freq("dec") == Seq("1.50" -> "3", "2.00" -> "2"))
    assert(freq("s") == Seq("a" -> "2", "b" -> "2", "c" -> "1"))
    // mins/maxs: i via native long→double; f parses the float's string form
    assert(r.measurement("mins", Some("i")).get.value.contains(Seq(1.0, 2.0, 10.0)))
    assert(r.measurement("maxs", Some("i")).get.value.contains(Seq(10.0, 2.0, 1.0)))
    assert(r.measurement("mins", Some("f")).get.value.contains(Seq(0.1, 2.5, 7.25)))
  }

  test("scan result frames have the reference schemas") {
    val mf = ScanResultFrames.measurementsToDF(spark, result.measurements)
    assert(mf.columns.toSeq == Seq("metric", "column_name", "value", "group_values"))
    assert(mf.count() == result.measurements.size)
    val tf = ScanResultFrames.testResultsToDF(spark, result.testResults)
    assert(tf.columns.toSeq == Seq("test", "passed", "skipped", "values", "error", "group_values"))
    val ef = ScanResultFrames.scanErrorsToDF(spark, result.errors)
    assert(ef.columns.toSeq == Seq("message", "exception"))
  }

  test("incremental scan: fold of slice states equals the monolithic scan bit-for-bit") {
    import graft.scan.IncrementalScan
    val ms = Seq("row_count", "missing_count", "values_count", "min", "max",
      "avg", "sum", "variance", "stddev", "min_length", "max_length", "avg_length")
    val sd = ScanDefinition(tableName = "inc", metrics = ms)
    val data = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.5, "aa"), (2L, -3.25, "bbb"), (3L, null, "c"),
      (4L, 7.75, null), (5L, 1e9, "dddd"), (6L, 0.0001, "ee"))
      .toDF("k", "v", "s")
    // slices: 2 rows / 4 rows / EMPTY — empty slices must fold as identity
    val slices = Seq(
      data.where(col("k") <= 2), data.where(col("k") > 2), data.where(lit(false)))
    val folded = IncrementalScan.scanSlices(slices, sd)
      .map(m => (m.metric, m.columnName) -> m.value.get).toMap
    val full = Scanner.execute(spark, data, sd).measurements
      .filter(m => m.metric != "schema")
      .map(m => (m.metric, m.columnName) -> m.value.get).toMap
    assert(folded == full)
    // variance crossed slices over mixed magnitudes (1e9 next to 1e-4) and
    // still reconstructed the exact fixed-point integers
    assert(folded.contains(("variance", Some("v"))))
  }

  test("mojibake_count rides scan pass 1: garbled rows counted, clean and null skipped") {
    val garbled = new String("café “x”".getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val df = Seq(Some(garbled), Some("clean ascii"), Some("café fine"), None)
      .toDF("t")
    val sd = ScanDefinition(tableName = "mj", metrics = Seq("mojibake_count"))
    val m = Scanner.execute(spark, df, sd).measurements
      .filter(_.metric == "mojibake_count")
      .map(m => m.columnName -> m.value.get).toMap
    assert(m == Map(Some("t") -> 1L))
  }

  test("incremental scan rejects metrics that cannot fold exactly") {
    import graft.scan.IncrementalScan
    val sd = ScanDefinition(tableName = "inc", metrics = Seq("distinct"))
    val e = intercept[IllegalArgumentException] {
      IncrementalScan.partialState(Seq((1L, "a")).toDF("k", "s"), sd)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("ksStatistic: exact max CDF gap, zero on identical, one on disjoint") {
    import graft.scan.Drift
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    // distinct values 1..4: F_a = 1/3,2/3,1,1; F_b = 0,1/3,2/3,1 -> max 1/3,
    // realized in doubles as 1.0 - 2/3 at v=3 (the largest of the three
    // not-quite-equal IEEE renderings of 1/3)
    val r = Drift.ksStatistic(a, b, "v").as[(Long, Long, Double)].collect()(0)
    assert(r == ((3L, 3L, 1.0 - 2.0 / 3.0)))
    val same = Drift.ksStatistic(a, a, "v").as[(Long, Long, Double)].collect()(0)
    assert(same._3 == 0.0)
    val disj = Drift.ksStatistic(a, Seq(9.0, 10.0).toDF("v"), "v")
      .as[(Long, Long, Double)].collect()(0)
    assert(disj == ((3L, 2L, 1.0)))
    // duplicated values collapse into one CDF step
    val dup = Drift.ksStatistic(Seq(1.0, 1.0, 2.0).toDF("v"),
      Seq(1.0, 2.0, 2.0).toDF("v"), "v").as[(Long, Long, Double)].collect()(0)
    assert(dup == ((3L, 3L, 2.0 / 3.0 - 1.0 / 3.0)))
  }

  test("proportionTest: hand z, equal-rate zero, degenerate null, null rows excluded") {
    import graft.scan.Drift
    import spark.implicits._
    // ref: 30/40 success; cur: 20/40 -> p1=.75, p2=.5, pooled=.625
    val ref = (Seq.fill(30)(true) ++ Seq.fill(10)(false)).toDF("b")
    val cur = (Seq.fill(20)(true) ++ Seq.fill(20)(false)).toDF("b")
    val r = Drift.proportionTest(ref, cur, col("b")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((40L, 30L, 40L, 20L)))
    assert(r.getDouble(4) == 0.75 && r.getDouble(5) == 0.5 && r.getDouble(6) == 0.25)
    val expZ = 0.25 / math.sqrt(0.625 * 0.375 * (1.0 / 40 + 1.0 / 40))
    assert(r.getDouble(7) == expZ && expZ > 2.3)
    // identical rates -> diff 0, z 0
    val same = Drift.proportionTest(ref, ref, col("b")).collect()(0)
    assert(same.getDouble(6) == 0.0 && same.getDouble(7) == 0.0)
    // all-success both sides: pooled variance 0 -> z null
    val allT = Seq(true, true).toDF("b")
    assert(Drift.proportionTest(allT, allT, col("b")).collect()(0).isNullAt(7))
    // null rows are excluded, not failures
    val withNull = Seq(Some(true), None, Some(false)).toDF("b")
    val nr = Drift.proportionTest(withNull, withNull, col("b")).collect()(0)
    assert(nr.getLong(0) == 2L && nr.getLong(1) == 1L)
  }

  test("fdrControl: textbook BH step-up, q monotone, cap at 1, layout invariance") {
    import graft.scan.Drift
    import spark.implicits._
    // classic example (n=5, alpha=0.25): p = .01,.04,.1,.3,.5
    // f = .05,.1,.166...,.375,.5; suffix-min q = .05,.1,.1666..,.375,.5
    // -> reject ranks 1-3 (q <= .25) even though p3=.1 > .25*3/5=.15? no:
    // q3 = 1/6 <= .25 -> rejected by step-up (p3 <= alpha*3/5 = .15 holds)
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.1), ("d", 0.3), ("e", 0.5))
      .toDF("id", "p")
    val r = Drift.fdrControl(df, "p", 0.25, Seq("id"))
      .orderBy("p_rank")
      .select("id", "p_rank", "bh_q", "reject")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(r.map(_._1) == Seq("a", "b", "c", "d", "e"))
    assert(r.map(_._2) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.map(_._3) == Seq(0.05, 0.1, 0.1 * 5 / 3, 0.3 * 5 / 4, 0.5))
    assert(r.map(_._4) == Seq(true, true, true, false, false))
    // step-up rescue: a large p ahead of a small one inherits the later
    // (smaller) f through the suffix min -> q is monotone non-decreasing
    val resc = Drift.fdrControl(
      Seq(("x", 0.04), ("y", 0.045)).toDF("id", "p"), "p", 0.05, Seq("id"))
      .orderBy("p_rank").select("bh_q").as[Double].collect().toSeq
    assert(resc == Seq(0.045, 0.045)) // min(.08, .045) = .045 for rank 1
    // q caps at 1.0
    val cap = Drift.fdrControl(Seq(("z", 0.9)).toDF("id", "p"), "p", 0.05, Seq("id"))
      .select("bh_q").as[Double].collect()(0)
    assert(cap == 0.9) // n=1: f = .9; a lone p stays itself
    // 0.99·4/1 caps at 1 within rank 1's own term, but rank 4's f = 0.99
    // flows back through the suffix min — all q = 0.99 (textbook BH)
    val cap2 = Drift.fdrControl(
      (1 to 4).map(i => (s"t$i", 0.99)).toDF("id", "p"), "p", 0.05, Seq("id"))
      .select("bh_q").as[Double].collect().toSeq
    assert(cap2.forall(_ == 0.99))
    // layout invariance: many partitions, same ranks/q/rejects
    val big = (1 to 2000).map(i => (s"t$i", ((i * 37) % 1999) / 1999.0 + 1e-6))
    val one = Drift.fdrControl(big.toDF("id", "p"), "p", 0.1, Seq("id"))
      .orderBy("p_rank").collect().map(_.toSeq).toSeq
    val two = Drift.fdrControl(big.toDF("id", "p").repartition(17), "p", 0.1, Seq("id"))
      .orderBy("p_rank").collect().map(_.toSeq).toSeq
    assert(one == two)
  }

  test("wasserstein1: hand EMD, shift linearity, zero on identical, layout invariance") {
    import graft.scan.Drift
    import spark.implicits._
    def w1(a: Seq[Long], b: Seq[Long]): Double =
      Drift.wasserstein1(a.toDF("v"), b.toDF("v"), "v")
        .as[(Long, Long, Double)].collect()(0)._3
    // point masses at 0 vs 7: all mass moves 7 units
    assert(w1(Seq(0L), Seq(7L)) == 7.0)
    // a pure shift of the whole sample moves every quantile by the shift
    assert(w1(Seq(1L, 2L, 5L), Seq(11L, 12L, 15L)) == 10.0)
    assert(w1(Seq(1L, 2L, 5L), Seq(1L, 2L, 5L)) == 0.0)
    // hand case with unequal n: ref {0,10}, cur {0,0,10,10,10}. distinct
    // 0,10: |k1·n2 − k2·n1|·Δv = |1·5 − 2·2|·10 = 10, over n1·n2 = 10 -> 1.0
    // (exact in doubles: integer/integer with a power-of-2-free exact hit)
    assert(w1(Seq(0L, 10L), Seq(0L, 0L, 10L, 10L, 10L)) == 1.0)
    // W1 dominates: KS sees the same 1-step gap for a 1-unit and a
    // 100-unit shift; W1 scales with the distance moved
    assert(w1(Seq(0L), Seq(1L)) == 1.0 && w1(Seq(0L), Seq(100L)) == 100.0)
    // layout invariance: many partitions + shuffled input, same statistic
    val big = (1 to 4000).map(i => (i * 37L) % 1000L)
    val shifted = big.map(_ + 13L)
    val a = scala.util.Random.shuffle(big).toDF("v").repartition(17)
    val b = scala.util.Random.shuffle(shifted).toDF("v").repartition(5)
    assert(w1(big, shifted) == 13.0)
    assert(Drift.wasserstein1(a, b, "v").as[(Long, Long, Double)]
      .collect()(0) == ((4000L, 4000L, 13.0)))
  }

  test("wasserstein1ByGroup: per-group parity with the global statistic, one-sided exclusion") {
    import graft.scan.Drift
    import spark.implicits._
    val ref = Seq(("a", 1L), ("a", 2L), ("a", 5L), ("b", 0L), ("b", 10L),
      ("only_ref", 3L)).toDF("g", "v")
    val cur = Seq(("a", 11L), ("a", 12L), ("a", 15L), ("b", 0L), ("b", 0L),
      ("b", 10L), ("b", 10L), ("b", 10L)).toDF("g", "v")
    val got = Drift.wasserstein1ByGroup(ref, cur, "v", "g")
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    // group a: pure +10 shift -> 10.0; group b: the unequal-n hand case -> 1.0
    assert(got == Seq(("a", 3L, 3L, 10.0), ("b", 2L, 5L, 1.0)))
    // each group's statistic equals the GLOBAL operator run on that slice
    for (g <- Seq("a", "b")) {
      val global = Drift.wasserstein1(
        ref.where(col("g") === g), cur.where(col("g") === g), "v")
        .select("w1").as[Double].collect()(0)
      assert(got.find(_._1 == g).get._4 == global)
    }
  }

  test("chiSquareCategorical: hand chi2, identical-mix zero, one-sided categories, layout invariance") {
    import graft.scan.Drift
    import spark.implicits._
    // ref: a=30 b=10; cur: a=10 b=30. totals: t_a=40, t_b=40, n1=n2=40, n=80.
    // e = 20 everywhere; chi2 = 4 * (10^2/20) = 20.0 -> 20_000_000 ppm
    val ref = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("k")
    val cur = (Seq.fill(10)("a") ++ Seq.fill(30)("b")).toDF("k")
    val r = Drift.chiSquareCategorical(ref, cur, "k").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((40L, 40L, 2L, 20000000L)))
    // identical mixes: exactly 0
    val same = Drift.chiSquareCategorical(ref, ref, "k").collect()(0)
    assert(same.getLong(3) == 0L)
    // a category present on ONE side only still contributes (expected > 0
    // from the pooled margin)
    val r2 = Drift.chiSquareCategorical(Seq("a", "a").toDF("k"), Seq("z", "z").toDF("k"), "k")
      .collect()(0)
    assert(r2.getLong(2) == 2L && r2.getLong(3) == 4000000L) // chi2 = 4
    // hand-truncation case: ref a,a,b cur a,b,b -> four terms of 1/6 each,
    // each truncated to 166666 ppm BEFORE summing -> 666664 (not 2/3 rounded)
    val r3 = Drift.chiSquareCategorical(Seq("a", "a", "b").toDF("k"),
      Seq("a", "b", "b").toDF("k"), "k").collect()(0)
    assert(r3.getLong(3) == 666664L, s"${r3.getLong(3)}")
    // layout invariance: the fixed-point sum is order-free
    val big = (1 to 500).map(i => s"c${i % 23}").toDF("k")
    val shift = (1 to 400).map(i => s"c${(i * 7) % 19}").toDF("k")
    val x = Drift.chiSquareCategorical(big, shift, "k").collect()(0)
    val y = Drift.chiSquareCategorical(big.repartition(17), shift.repartition(3), "k").collect()(0)
    assert(x == y)
  }

  test("mwu_reference / chi2_reference scan keys record drift measurements and gate tests") {
    import graft.scan.{Drift, Scanner}
    import spark.implicits._
    val refDir = java.nio.file.Files.createTempDirectory("scan-drift-ref").toString
    // numeric reference: steady around 10; current data sits higher
    (1 to 20).map(i => 10.0 + (i % 5) * 0.1).toDF("size").write.parquet(s"$refDir/vals")
    // categorical reference: balanced US/NL; current is US-heavy
    (Seq.fill(10)("US") ++ Seq.fill(10)("NL")).toDF("country")
      .write.parquet(s"$refDir/cats")
    val yaml =
      s"""table_name: t
         |columns:
         |  size:
         |    mwu_reference: $refDir/vals
         |    tests:
         |    - mwu_auc < 0.2
         |  country:
         |    chi2_reference: $refDir/cats
         |    tests:
         |    - chi2_ppm > 0
         |""".stripMargin
    val r = Scanner.executeYaml(spark, df, yaml)
    assert(!r.hasErrors, r.errors.mkString("; "))
    val auc = r.measurement("mwu_auc", Some("size")).get.value.get.asInstanceOf[Double]
    val z = r.measurement("mwu_z", Some("size")).get.value.get.asInstanceOf[Double]
    val chi2 = r.measurement("chi2_ppm", Some("country")).get.value.get.asInstanceOf[Long]
    // parity with the direct operators
    val direct = Drift.mannWhitneyU(
      spark.read.parquet(s"$refDir/vals"), df, "size").collect()(0)
    assert(auc == direct.getDouble(4) && z == direct.getDouble(5))
    assert(auc < 0.2 && z < 0.0, s"reference sits below current: auc=$auc z=$z")
    val directChi = Drift.chiSquareCategorical(
      spark.read.parquet(s"$refDir/cats"), df, "country").collect()(0)
    assert(chi2 == directChi.getLong(3) && chi2 > 0L)
    // the tests gate on the new measurements like any metric
    val byExpr = r.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("mwu_auc < 0.2").passed && byExpr("chi2_ppm > 0").passed)
  }

  test("concentration scan key records entropy/effective-category measurements and gates") {
    import graft.scan.Scanner
    import graft.ops.Constraints
    import spark.implicits._
    val df2 = (Seq.fill(99)("big") :+ "rare").toDF("segment")
    val yaml =
      """table_name: t
        |columns:
        |  segment:
        |    concentration: true
        |    tests:
        |    - eff_simpson < 1.5
        |""".stripMargin
    val r = Scanner.executeYaml(spark, df2, yaml)
    assert(!r.hasErrors, r.errors.mkString("; "))
    val eff = r.measurement("eff_simpson", Some("segment")).get.value.get
      .asInstanceOf[Double]
    val ent = r.measurement("entropy", Some("segment")).get.value.get
      .asInstanceOf[Double]
    // parity with the direct operator
    val direct = Constraints.categoryEntropy(df2, Seq("segment")).collect()(0)
    assert(eff == direct.getDouble(5) && ent == direct.getDouble(3))
    assert(eff < 1.05, s"99-1 skew collapses to ~1 effective category: $eff")
    val byExpr = r.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("eff_simpson < 1.5").passed)
  }

  test("w1_reference scan key records the earth-mover distance and gates tests") {
    import graft.scan.{Drift, Scanner}
    import spark.implicits._
    val refDir = java.nio.file.Files.createTempDirectory("scan-w1-ref").toString
    (1L to 20L).toDF("lat").write.parquet(s"$refDir/vals")
    val cur = (51L to 70L).toDF("lat") // pure +50 shift -> w1 exactly 50
    val yaml =
      s"""table_name: t
         |columns:
         |  lat:
         |    w1_reference: $refDir/vals
         |    tests:
         |    - w1 < 100
         |""".stripMargin
    val r = Scanner.executeYaml(spark, cur, yaml)
    assert(!r.hasErrors, r.errors.mkString("; "))
    val w1 = r.measurement("w1", Some("lat")).get.value.get.asInstanceOf[Double]
    assert(w1 == 50.0)
    // parity with the direct operator
    assert(w1 == Drift.wasserstein1(
      spark.read.parquet(s"$refDir/vals"), cur, "lat")
      .select("w1").as[Double].collect()(0))
    val byExpr = r.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("w1 < 100").passed)
  }

  test("welch/cvm/energy reference scan keys record drift measurements and gate tests") {
    import graft.scan.{Drift, Scanner}
    import spark.implicits._
    val refDir = java.nio.file.Files.createTempDirectory("scan-ts-ref").toString
    (1L to 20L).toDF("lat").write.parquet(s"$refDir/vals")
    val cur = (51L to 70L).toDF("lat") // pure +50 shift
    val yaml =
      s"""table_name: t
         |columns:
         |  lat:
         |    welch_reference: $refDir/vals
         |    cvm_reference: $refDir/vals
         |    energy_reference: $refDir/vals
         |    tests:
         |    - welch_t < 0
         |    - cvm_t > 0.3
         |    - energy_t > 10
         |""".stripMargin
    val r = Scanner.executeYaml(spark, cur, yaml)
    assert(!r.hasErrors, r.errors.mkString("; "))
    def m(name: String) =
      r.measurement(name, Some("lat")).get.value.get.asInstanceOf[Double]
    val ref = spark.read.parquet(s"$refDir/vals")
    // parity with the direct operators, bit-for-bit
    val dw = Drift.welchT(ref, cur, "lat").collect()(0)
    assert(m("welch_t") == dw.getDouble(6) && m("welch_df") == dw.getDouble(7))
    val dc = Drift.cramerVonMises(ref, cur, "lat").collect()(0)
    assert(m("cvm_t") == dc.getDouble(3))
    val de = Drift.energyDistance(ref, cur, "lat").collect()(0)
    assert(m("energy") == de.getDouble(5) && m("energy_t") == de.getDouble(6))
    // a +50 shift: negative t (ref below cur), near-max CvM, energy ≈ 2·50
    assert(m("welch_t") < -20.0 && m("cvm_t") > 0.3 && m("energy") > 80.0)
    val byExpr = r.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("welch_t < 0").passed && byExpr("cvm_t > 0.3").passed &&
      byExpr("energy_t > 10").passed)
  }

  test("ad_reference scan key records ad_a2 and gates tests, parity with the operator") {
    import graft.scan.{Drift, Scanner}
    import spark.implicits._
    val refDir = java.nio.file.Files.createTempDirectory("scan-ad-ref").toString
    (1L to 20L).toDF("lat").write.parquet(s"$refDir/vals")
    val cur = (51L to 70L).toDF("lat") // pure +50 shift
    val yaml =
      s"""table_name: t
         |columns:
         |  lat:
         |    ad_reference: $refDir/vals
         |    tests:
         |    - ad_a2 > 4
         |""".stripMargin
    val r = Scanner.executeYaml(spark, cur, yaml)
    assert(!r.hasErrors, r.errors.mkString("; "))
    val a2 = r.measurement("ad_a2", Some("lat")).get.value.get.asInstanceOf[Double]
    val d = Drift.andersonDarling(spark.read.parquet(s"$refDir/vals"), cur, "lat")
      .collect()(0)
    assert(a2 == d.getDouble(3)) // bit-parity with the direct operator
    // disjoint samples: far above the null's A² ≈ 1
    assert(a2 > 10.0, s"disjoint-sample A²: $a2")
    val byExpr = r.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("ad_a2 > 4").passed)
    // null case: same population → A² near 1 (and far from the shifted value)
    val same = Scanner.executeYaml(spark, (1L to 20L).toDF("lat"),
      s"table_name: t\ncolumns:\n  lat:\n    ad_reference: $refDir/vals\n")
    val a2same = same.measurement("ad_a2", Some("lat")).get.value.get.asInstanceOf[Double]
    assert(a2same < 1.0, s"identical-sample A² should be ~0: $a2same")
  }

  test("mood_scale_reference scan key records m4/z and gates tests, operator parity") {
    import graft.scan.{Drift, Scanner}
    import spark.implicits._
    val refDir = java.nio.file.Files.createTempDirectory("scan-moods-ref").toString
    (1L to 20L).toDF("lat").write.parquet(s"$refDir/vals")
    // current values wrap the reference range → dispersion grew
    val cur = ((-20L to -11L) ++ (31L to 40L)).toDF("lat")
    val yaml =
      s"""table_name: t
         |columns:
         |  lat:
         |    mood_scale_reference: $refDir/vals
         |    tests:
         |    - mood_z < 0
         |""".stripMargin
    val r = Scanner.executeYaml(spark, cur, yaml)
    assert(!r.hasErrors, r.errors.mkString("; "))
    def m(name: String) =
      r.measurement(name, Some("lat")).get.value.get.asInstanceOf[Double]
    val d = Drift.moodScale(spark.read.parquet(s"$refDir/vals"), cur, "lat")
      .collect()(0)
    assert(m("mood_m4") == d.getDouble(2) && m("mood_z") == d.getDouble(3))
    // ref is squeezed into the center of cur → ref ranks near center → z < 0
    assert(m("mood_z") < -3.0, s"z: ${m("mood_z")}")
    val byExpr = r.testResults.map(t => t.test.expression -> t).toMap
    assert(byExpr("mood_z < 0").passed)
  }

  test("mannWhitneyU: doubled-rank exactness, tie correction, AUC direction, layout invariance") {
    import graft.scan.Drift
    import spark.implicits._
    // disjoint, ref entirely below: R1 = 6 -> U = 0, auc = 0
    val lo = Seq(1.0, 2.0, 3.0).toDF("v")
    val hi = Seq(4.0, 5.0, 6.0).toDF("v")
    val r1 = Drift.mannWhitneyU(lo, hi, "v").collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((3L, 3L, 0L, 0L)))
    assert(r1.getDouble(4) == 0.0 && r1.getDouble(5) < -1.9) // z = -1.964...
    // flipped sides: U_doubled = 2*n1*n2, auc = 1
    val r2 = Drift.mannWhitneyU(hi, lo, "v").collect()(0)
    assert(r2.getLong(2) == 18L && r2.getDouble(4) == 1.0)
    // hand case with a tie: A=[1,3], B=[2,3] -> doubled ranks 2,4,7,7;
    // R1d = 2+7 = 9, U1d = 9 - 2*3 = 3 (U=1.5), auc = 0.375, ties = 2^3-2
    val r3 = Drift.mannWhitneyU(Seq(1.0, 3.0).toDF("v"), Seq(2.0, 3.0).toDF("v"), "v").collect()(0)
    assert((r3.getLong(2), r3.getLong(3)) == ((3L, 6L)))
    assert(r3.getDouble(4) == 1.5 / 4.0)
    // all values tied: auc exactly 1/2, zero variance -> z null
    val t = Seq(5.0, 5.0).toDF("v")
    val r4 = Drift.mannWhitneyU(t, t, "v").collect()(0)
    assert(r4.getDouble(4) == 0.5 && r4.isNullAt(5))
    // identical samples: U = n1*n2/2, auc 1/2, z = 0
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val r5 = Drift.mannWhitneyU(a, a, "v").collect()(0)
    assert(r5.getLong(2) == 25L && r5.getDouble(4) == 0.5 && r5.getDouble(5) == 0.0)
    // layout invariance (two-phase scan, no global funnel)
    val big = (1 to 500).map(i => ((i * 37 % 101).toDouble)).toDF("v")
    val cur = (1 to 400).map(i => ((i * 53 % 97 + 2).toDouble)).toDF("v")
    val x = Drift.mannWhitneyU(big, cur, "v").collect()(0)
    val y = Drift.mannWhitneyU(big.repartition(17), cur.repartition(3), "v").collect()(0)
    assert(x == y)
  }

  test("ksStatisticByGroup: per-group stats match per-group ksStatistic") {
    import graft.scan.Drift
    import spark.implicits._
    val ref = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("c", 9.0))
      .toDF("g", "v")
    val cur = Seq(("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 5.0), ("d", 1.0))
      .toDF("g", "v")
    val got = Drift.ksStatisticByGroup(ref, cur, "v", "g")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // one-sided groups c and d are excluded
    assert(got.keySet == Set("a", "b"))
    // each group equals the global statistic computed on that group alone
    for (g <- Seq("a", "b")) {
      val e = Drift.ksStatistic(ref.where(col("g") === g),
        cur.where(col("g") === g), "v")
        .as[(Long, Long, Double)].collect()(0)
      assert(got(g) == ((e._1, e._2, e._3)), s"group $g")
    }
    assert(got("b")._3 == 0.0) // identical single-point distributions
  }

  test("psiBuckets: identical distributions score ~0, shifted ones don't; nulls excluded") {
    import graft.scan.Drift
    val refDf = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 1000).map(i => org.apache.spark.sql.Row((i % 100).toDouble)) :+ org.apache.spark.sql.Row(null)),
      org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    val out = Drift.psiBuckets(refDf, refDf, "v", 0.0, 100.0, 10)
    // same frame on both sides: p == q in every bucket -> every contribution 0
    assert(out.collect().forall(_.getLong(3) == 0L))
    // null row excluded: counts sum to 1000, not 1001
    assert(out.agg(org.apache.spark.sql.functions.sum("ref_cnt")).collect()(0).getLong(0) == 1000L)
    assert(Drift.psiTotal(out) == 0.0)
    // shift the current distribution up by 50: mass moves between buckets
    val curDf = refDf.select((org.apache.spark.sql.functions.col("v") + 50.0).as("v"))
    val shifted = Drift.psiTotal(Drift.psiBuckets(refDf, curDf, "v", 0.0, 100.0, 10))
    assert(shifted > 0.25, s"psi $shifted")
  }

  test("correlation metric group rides pass 1 and matches the standalone operator bit-for-bit") {
    val data = (1 to 300).map(i =>
      (i.toDouble, 2.5 * i + 1.0, (i % 17).toDouble, s"tag$i")).toDF("a", "b", "c", "s")
    val yaml2 =
      """table_name: corrscan
        |metrics:
        |- row_count
        |metric_groups:
        |- correlation
        |""".stripMargin
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        // createOrReplaceTempView fires an execution-start event but runs
        // no job — count only data-reading actions
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
            if !s.description.contains("createOrReplaceTempView") =>
          descs.add(s.description); counter.incrementAndGet()
        case _ =>
      }
    }
    data.count() // materialize + let any straggler listener events drain
    Thread.sleep(300)
    spark.sparkContext.addSparkListener(listener)
    val r = try {
      val res = Scanner.executeYaml(spark, data, yaml2)
      Thread.sleep(300)
      assert(counter.get() == 1,
        s"correlation must RIDE pass 1, saw ${counter.get()} actions: ${java.util.Arrays.toString(descs.toArray)}")
      res
    } finally spark.sparkContext.removeSparkListener(listener)
    // string column excluded; 3 numeric columns -> 3 pairs
    val got = r.measurements.filter(_.metric == "correlation")
      .map(m => m.columnName.get -> m.value.get.asInstanceOf[Double]).toMap
    assert(got.keySet == Set("a~b", "a~c", "b~c"))
    val standalone = graft.ops.Correlation.corrPairs(data,
      Seq("a" -> "b", "a" -> "c", "b" -> "c"), scale = graft.metrics.MetricColumns.ScanSumScale)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    got.foreach { case (pair, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(standalone(pair)), s"$pair: $v vs ${standalone(pair)}")
    }
    assert(math.abs(got("a~b") - 1.0) < 1e-12) // exact affine pair
  }

  test("anomaly: column config runs the rolling z-score check and gates tests") {
    val rows = (1L to 9L).map(i => (1L, i, 10.0)) ++ Seq((1L, 10L, 50.0)) ++
      (1L to 8L).map(i => (2L, i, 5.0))
    val data = rows.toDF("user_id", "seq", "v")
    val yaml2 =
      """table_name: anomscan
        |columns:
        |  v:
        |    anomaly:
        |      key: user_id
        |      order: seq
        |      window: 10
        |      t_squared: 9
        |      min_points: 5
        |      min_dev: 1.0
        |    tests:
        |    - anomaly_count == 0
        |""".stripMargin
    val r = Scanner.executeYaml(spark, data, yaml2)
    // the 50.0 spike over user 1's constant history is the one anomaly
    assert(r.measurement("anomaly_count", Some("v")).get.value.contains(1L))
    val tr = r.testResults.head
    assert(!tr.passed && !tr.skipped)
    assert(tr.values("anomaly_count") == "1")
    // a scan WITHOUT the anomaly config leaves the metric unmeasured ->
    // the referencing test is SKIPPED, not an error (reference semantics)
    val r2 = Scanner.executeYaml(spark, data,
      """table_name: anomscan
        |columns:
        |  v:
        |    tests:
        |    - anomaly_count == 0
        |""".stripMargin)
    assert(r2.testResults.head.skipped)
  }

  test("row_checks: cross-column invariants ride pass 1; NULL counts as a violation") {
    val data = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 1.0, 2.0),   // a < b holds
      (2L, 3.0, 2.0),   // violated
      (3L, null, 2.0),  // can't evaluate -> violation
      (4L, 0.5, 0.6)
    ).toDF("id", "a", "b")
    val yaml2 =
      """table_name: rc
        |row_checks:
        |- check: a < b
        |  name: a_lt_b
        |- id > 0
        |tests:
        |- a_lt_b <= 1
        |""".stripMargin
    val r = Scanner.executeYaml(spark, data, yaml2)
    assert(r.measurement("row_check_violations", Some("a_lt_b")).get.value.contains(2L))
    assert(r.measurement("row_check_violations", Some("row_check_1")).get.value.contains(0L))
    val tr = r.testResults.head
    assert(!tr.passed && tr.values("a_lt_b") == "2") // 2 violations > 1
  }

  test("persisted PSI reference reproduces the two-frame PSI bit-for-bit") {
    import graft.scan.Drift
    val refDf = (0 until 500).map(i => ((i % 97) * 1.03)).toDF("v")
    val curDf = (0 until 400).map(i => ((i % 83) * 1.21 + 5.0)).toDF("v")
    val direct = Drift.psiBuckets(refDf, curDf, "v", 0.0, 100.0, 10)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val built = Drift.buildPsiReference(refDf, "v", 0.0, 100.0, 10)
    val dir = java.nio.file.Files.createTempDirectory("psi-ref").toString
    Drift.savePsiReference(spark, built, dir)
    val loaded = Drift.loadPsiReference(spark, dir)
    assert(loaded == built, "artifact round-trip must be lossless")

    val viaRef = Drift.psiBucketsVsReference(loaded, curDf, "v")
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viaRef.toSeq == direct.toSeq,
      "saved-reference PSI must equal the in-memory two-frame PSI bit-for-bit")
  }

  test("scan `benford:` family: chi2 measurement equals the standalone audit; tests gate") {
    import spark.implicits._
    // first digits heavily skewed to 9 -> large chi2, strict test fails
    val amounts = ((1 to 50).map(_ => 9000.0) ++ Seq(100.0, 200.0)).toDF("amt")
    val y =
      """table_name: t
        |columns:
        |  amt:
        |    benford: 2
        |    tests:
        |    - benford_chi2 < 20.09
        |    - benford_chi2 > 1
        |""".stripMargin
    val r = Scanner.executeYaml(spark, amounts, y)
    val chi2 = r.measurement("benford_chi2", Some("amt")).get.value.get.asInstanceOf[Double]
    val direct = graft.ops.Constraints.benfordAudit(amounts, Seq("amt" -> 2))
      .select("chi2").distinct().collect()(0).getDouble(0)
    assert(chi2 == direct, "scan path must equal the standalone audit bit-for-bit")
    assert(!r.testResults.find(_.test.expression == "benford_chi2 < 20.09").get.passed)
    assert(r.testResults.find(_.test.expression == "benford_chi2 > 1").get.passed)
  }
}
