package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference scan surface: soda metrics, sketches, scan-level gates. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object SodaQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_row_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("row_count"))),

    "q_missing" -> { (s, dir) =>
      val cfg = ColumnConfig(missingValues = Seq("3-MEDIUM"))
      scanRow(t(s, dir, "orders"), Seq("o_orderpriority" -> cfg),
        Seq("missing_count", "missing_percentage", "values_count", "values_percentage"))
        .select(
          out("o_orderpriority", "missing_count").as("missing_count"),
          out("o_orderpriority", "missing_percentage").as("missing_percentage"),
          out("o_orderpriority", "values_count").as("values_count"),
          out("o_orderpriority", "values_percentage").as("values_percentage"))
    },

    "q_missing_regex" -> { (s, dir) =>
      val cfg = ColumnConfig(missingRegex = Some("^src0$"))
      scanRow(t(s, dir, "documents"), Seq("source" -> cfg),
        Seq("missing_count", "values_count"))
        .select(
          out("source", "missing_count").as("missing_count"),
          out("source", "values_count").as("values_count"))
    },

    "q_stats" -> { (s, dir) =>
      val cols = Seq("l_quantity" -> ColumnConfig(), "l_extendedprice" -> ColumnConfig())
      val ms = Seq("min", "max", "avg", "sum")
      scanRow(t(s, dir, "lineitem"), cols, ms)
        .select(cols.flatMap { case (c, _) => ms.map(m => out(c, m)) }: _*)
    },

    "q_stats_var" -> { (s, dir) =>
      val cols = Seq("l_quantity" -> ColumnConfig(), "l_extendedprice" -> ColumnConfig())
      val ms = Seq("variance", "stddev")
      scanRow(t(s, dir, "lineitem"), cols, ms)
        .select(cols.flatMap { case (c, _) => ms.map(m => out(c, m)) }: _*)
    },

    "q_length" -> { (s, dir) =>
      val cols = Seq("text" -> ColumnConfig(), "lang" -> ColumnConfig())
      val ms = Seq("min_length", "max_length", "avg_length")
      scanRow(t(s, dir, "documents"), cols, ms)
        .select(cols.flatMap { case (c, _) => ms.map(m => out(c, m)) }: _*)
    },

    "q_valid_values" -> { (s, dir) =>
      val cfg = ColumnConfig(validValues = Seq("O", "F"))
      val ms = Seq("valid_count", "valid_percentage", "invalid_count", "invalid_percentage")
      scanRow(t(s, dir, "orders"), Seq("o_orderstatus" -> cfg), ms)
        .select(ms.map(m => out("o_orderstatus", m).as(m)): _*)
    },

    "q_valid_regex" -> { (s, dir) =>
      val cfg = ColumnConfig(validRegex = Some("^(en|es)$"))
      val ms = Seq("valid_count", "invalid_count", "invalid_percentage")
      scanRow(t(s, dir, "documents"), Seq("lang" -> cfg), ms)
        .select(ms.map(m => out("lang", m).as(m)): _*)
    },

    "q_valid_format" -> { (s, dir) =>
      val cfg = ColumnConfig(validFormat = Some("number_whole"))
      val ms = Seq("valid_count", "invalid_count")
      scanRow(t(s, dir, "part"), Seq("p_size" -> cfg), ms)
        .select(ms.map(m => out("p_size", m).as(m)): _*)
    },

    "q_valid_range" -> { (s, dir) =>
      val cfg = ColumnConfig(validMin = Some(5.0), validMax = Some(45.0))
      val ms = Seq("valid_count", "invalid_count", "invalid_percentage")
      scanRow(t(s, dir, "lineitem"), Seq("l_quantity" -> cfg), ms)
        .select(ms.map(m => out("l_quantity", m).as(m)): _*)
    },

    "q_valid_length" -> { (s, dir) =>
      val cfg = ColumnConfig(validMinLength = Some(150), validMaxLength = Some(400))
      val ms = Seq("valid_count", "invalid_count")
      scanRow(t(s, dir, "documents"), Seq("text" -> cfg), ms)
        .select(ms.map(m => out("text", m).as(m)): _*)
    },

    "q_distinct" -> ((s, dir) =>
      GroupMetrics.distinctFamily(t(s, dir, "part"),
        Seq("p_brand" -> ColumnConfig(), "p_type" -> ColumnConfig()))),

    "q_frequent_values" -> ((s, dir) =>
      GroupMetrics.frequentValues(t(s, dir, "orders"), "o_orderpriority", ColumnConfig(), 5)),

    "q_mins_maxs" -> ((s, dir) =>
      GroupMetrics.minsMaxs(t(s, dir, "part"), "p_size", 5)),

    "q_histogram" -> { (s, dir) =>
      val df = t(s, dir, "lineitem")
      val r = df.agg(min(col("l_quantity").cast(DoubleType)), max(col("l_quantity").cast(DoubleType))).collect()(0)
      Scanner.histogramFrame(df, Seq(("l_quantity", (r.getDouble(0), r.getDouble(1)))), 10)
        .select(col("bucket"), col("cnt")).orderBy("bucket")
    },

    "q_percentiles" -> { (s, dir) =>
      // exact percentiles; p ∈ {.25,.5,.75} on integer-valued doubles is
      // bit-exact across engines (interpolation arithmetic stays exact).
      // Routed counts-path engine — never the exact aggregate's
      // single-merge-task value multiset (scale path; same values)
      val Seq(p25, p50, p75) = Outliers.exactPercentilesRouted(
        t(s, dir, "lineitem"), col("l_quantity"), Seq(0.25, 0.5, 0.75))
      s.range(1).select(lit(p25).as("p25"), lit(p50).as("p50"), lit(p75).as("p75"))
    },

    "q_quantile_sketch" -> { (s, dir) =>
      import graft.functions.QuantileSketch
      // deterministic bottom-k-by-hash sample per group → quantiles from
      // the sample: O(k) state where exact percentiles sort everything,
      // mergeable across slices/windows, and the oracle recomputes the
      // IDENTICAL sample (hash-selected, not random)
      val key = Shingles.md5Hash60(concat(col("l_orderkey").cast(StringType),
        lit("|"), col("l_linenumber").cast(StringType)))
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(QuantileSketch.qsketch(key, col("l_extendedprice"), 64).as("sk"))
        .select(col("l_returnflag"), size(col("sk")).as("n_sample"),
          QuantileSketch.quantile(col("sk"), 0.25).as("p25"),
          QuantileSketch.quantile(col("sk"), 0.5).as("p50"),
          QuantileSketch.quantile(col("sk"), 0.75).as("p75"))
        .orderBy("l_returnflag")
    },

    "q_histogram_multi" -> { (s, dir) =>
      // two columns bucketized in ONE pass (shared posexplode->groupBy job)
      val df = t(s, dir, "lineitem")
      val r = df.agg(
        min(col("l_quantity").cast(DoubleType)), max(col("l_quantity").cast(DoubleType)),
        min(col("l_extendedprice").cast(DoubleType)), max(col("l_extendedprice").cast(DoubleType))).collect()(0)
      Scanner.histogramFrame(df, Seq(
          ("l_quantity", (r.getDouble(0), r.getDouble(1))),
          ("l_extendedprice", (r.getDouble(2), r.getDouble(3)))), 10)
        .select(col("colIdx"), col("bucket"), col("cnt")).orderBy("colIdx", "bucket")
    },

    "q_column_sketch" -> { (s, dir) =>
      // column-content MinHash sketch (mergeable Aggregator) exploded to
      // rows; md5Hash60 value hashing makes the signature oracle-checkable
      // (DuckDB recomputes the 32 permutation minima over the value set).
      val sig = t(s, dir, "orders").where(col("o_orderpriority").isNotNull).select(
        graft.functions.MinHashAgg.minhashAgg(Shingles.md5Hash60(col("o_orderpriority")), 32).as("sig"))
      sig.select(posexplode(col("sig")).as(Seq("pos", "sig_value"))).orderBy("pos")
    },

    "q_kmv_sketch" -> { (s, dir) =>
      // KMV distinct sketch (TypedImperativeAggregate) over the order keys:
      // the 64 smallest distinct md5-60 hashes — DuckDB recomputes them
      // exactly (SELECT DISTINCT h ORDER BY h LIMIT k).
      val sk = t(s, dir, "orders").select(
        graft.functions.KmvSketch.kmv(Shingles.md5Hash60(col("o_orderkey").cast(StringType)), 64).as("sk"))
      sk.select(posexplode(col("sk")).as(Seq("pos", "h"))).orderBy("pos")
    },

    "q_kmv_by_group" -> { (s, dir) =>
      // mergeable distinct sketch PER GROUP (one grouped aggregate of
      // bounded state) with the exact-path estimate: k = 64 covers each
      // priority's distinct custkey count? No — estimator path exercised,
      // and DuckDB replays both the sketch tail and the estimate formula
      val k = 64
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(graft.functions.KmvSketch.kmv(
          Shingles.md5Hash60(col("o_custkey").cast(StringType)), k).as("sk"))
        .select(col("o_orderpriority"),
          size(col("sk")).as("sk_size"),
          element_at(col("sk"), k).as("kth"),
          // the estimateDistinct tree: (k-1) / (kth / 2^60)
          when(size(col("sk")) < k, size(col("sk")).cast(DoubleType))
            .otherwise(lit((k - 1).toDouble) /
              (element_at(col("sk"), k).cast(DoubleType) / lit(1152921504606846976.0)))
            .as("distinct_est"))
        .orderBy("o_orderpriority")
    },

    "q_cms_table" -> { (s, dir) =>
      // Count-Min counter table over documents.lang (depth 4 × width 32,
      // md5-60 double hashing): every cell is an exact integer the oracle
      // rebuilds from the same position formula
      CountMin.table(t(s, dir, "documents"), Shingles.md5Hash60(col("lang")), 4, 32)
        .orderBy("row", "pos")
    },

    "q_cms_estimate" -> { (s, dir) =>
      // point estimates for every distinct lang: min over the 4 counters —
      // >= the true count by construction, replayed exactly in the oracle
      val docs = t(s, dir, "documents").where(col("lang").isNotNull)
      val cms = CountMin.table(docs, Shingles.md5Hash60(col("lang")), 4, 32)
      CountMin.estimates(cms, docs.select("lang").distinct(), Seq("lang"),
          Shingles.md5Hash60(col("lang")), 4, 32)
        .orderBy("lang")
    },

    "q_approx_duplicates" -> { (s, dir) =>
      import graft.functions.KmvCounts
      import s.implicits._
      // bottom-k-with-counts sketch → duplicates-family estimates, one
      // row-level pass for all three columns (the scan's 100 TB alternative
      // to pass 2's every-distinct-value shuffle). md5-60 hashing lets
      // DuckDB rebuild the identical sketch (GROUP BY value ORDER BY hash
      // LIMIT k — retained counts are exact) and replay the estimator.
      val k = 256
      def sk(c: Column) = KmvCounts.kmvCounts(
        when(c.isNotNull, Shingles.md5Hash60(c.cast(StringType))), k)
      val row = t(s, dir, "orders").agg(
        sk(col("o_custkey")).as("ck"), sk(col("o_orderkey")).as("ok"),
        sk(col("o_orderpriority")).as("pr")).collect()(0)
      def pairs(i: Int): Seq[(Long, Long)] =
        row.getSeq[org.apache.spark.sql.Row](i).map(r => (r.getLong(0), r.getLong(1)))
      Seq("o_custkey" -> pairs(0), "o_orderkey" -> pairs(1), "o_orderpriority" -> pairs(2))
        .map { case (name, p) =>
          val (d, u, dup) = KmvCounts.estimates(p, k)
          (name, p.size.toLong, d, u, dup)
        }
        .toDF("column_name", "retained", "approx_distinct", "approx_unique_count", "approx_duplicate_count")
        .orderBy("column_name")
    },

    "q_theta_sketch" -> { (s, dir) =>
      import graft.functions.{KmvSketch, ThetaSketch}
      import s.implicits._
      // theta sketches of orders.o_custkey vs customer.c_custkey: the
      // distributed KMV aggregate builds each table's sketch; union /
      // intersection / difference estimates are driver-side algebra on
      // <= k longs. DuckDB rebuilds the identical sketches from the shared
      // md5-60 hashes and applies the same theta rules — exact oracle.
      val k = 128
      def sketch(df: DataFrame, c: Column): ThetaSketch.Theta = {
        val kmv = df.where(c.isNotNull)
          .agg(KmvSketch.kmv(Shingles.md5Hash60(c.cast(StringType)), k))
          .collect()(0).getSeq[Long](0)
        ThetaSketch.fromKmv(kmv, k)
      }
      val a = sketch(t(s, dir, "orders"), col("o_custkey"))
      val b = sketch(t(s, dir, "customer"), col("c_custkey"))
      Seq(
        ("distinct_a", a), ("distinct_b", b),
        ("union", ThetaSketch.union(a, b, k)),
        ("intersection", ThetaSketch.intersection(a, b)),
        ("difference", ThetaSketch.difference(a, b)))
        .map { case (op, sk) => (op, sk.values.length.toLong, sk.theta, sk.estimate) }
        .toDF("set_op", "retained", "theta", "estimate")
        .orderBy("set_op")
    },

    "q_tests" -> { (s, dir) =>
      val yaml =
        """table_name: lineitem
          |metrics:
          |- row_count
          |tests:
          |- row_count > 0
          |columns:
          |  l_quantity:
          |    valid_max: 45
          |    tests:
          |    - invalid_percentage < 20
          |  l_returnflag:
          |    valid_values:
          |    - A
          |    - N
          |    - R
          |    tests:
          |    - invalid_count == 0
          |""".stripMargin
      val res = Scanner.executeYaml(s, t(s, dir, "lineitem"), yaml)
      val rows = res.testResults.map(tr => (tr.test.expression, tr.test.column.orNull, tr.passed))
      import s.implicits._
      rows.toDF("expression", "column_name", "passed").orderBy("expression")
    },

    "q_sql_metric" -> { (s, dir) =>
      val sql = "SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue FROM orders WHERE o_orderstatus = 'F'"
      val res = Scanner.execute(s, t(s, dir, "orders"),
        ScanDefinition(tableName = "orders", sqlMetrics = Seq(SqlMetric(sql))))
      val v = res.measurement("total_revenue").get.value.get.asInstanceOf[Double]
      s.range(1).select(lit(v).as("total_revenue"))
    },

    "q_sql_metric_group" -> { (s, dir) =>
      val sql = "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority"
      val res = Scanner.execute(s, t(s, dir, "orders"),
        ScanDefinition(tableName = "orders", sqlMetrics = Seq(SqlMetric(sql, groupFields = Seq("o_orderpriority")))))
      val gvs = res.measurement("cnt").get.groupValues
      import s.implicits._
      gvs.map(gv => (gv.group("o_orderpriority"), gv.value.toLong))
        .toDF("o_orderpriority", "cnt").orderBy("o_orderpriority")
    },

    "q_failed_rows" -> { (s, dir) =>
      val cfg = ColumnConfig(validMax = Some(10.0))
      Scanner.failedRows(t(s, dir, "lineitem"), "l_quantity", cfg, 20, Seq("l_orderkey", "l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    "q_scan_samples" -> { (s, dir) =>
      // samples.failed_limit wired through the full scan path: the scan
      // collects the first-N failing rows (deterministic all-column order)
      // into a failed_rows measurement; rebuild a typed frame from it.
      val yaml =
        """table_name: lineitem
          |samples:
          |  failed_limit: 15
          |columns:
          |  l_quantity:
          |    valid_max: 5
          |""".stripMargin
      val res = Scanner.executeYaml(s, t(s, dir, "lineitem"), yaml)
      val m = res.measurement("failed_rows", Some("l_quantity")).get
      import s.implicits._
      m.groupValues.map(g => (g.group("l_orderkey").toLong, g.group("l_linenumber").toLong,
          g.group("l_quantity").toDouble))
        .toDF("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    "q_filter_vars" -> { (s, dir) =>
      val yaml =
        """table_name: lineitem
          |filter: l_shipdate >= '{{ start }}'
          |metrics:
          |- row_count
          |""".stripMargin
      val res = Scanner.executeYaml(s, t(s, dir, "lineitem"), yaml, Map("start" -> "1998-06-01"))
      val v = res.measurement("row_count").get.value.get.asInstanceOf[Long]
      s.range(1).select(lit(v).as("row_count"))
    },

    "q_profile" -> ((s, dir) =>
      GroupMetrics.profile(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment").map(_ -> ColumnConfig()))),

    "q_schema" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem").schema.fields.zipWithIndex
        .map { case (f, i) => (i, f.name, f.dataType.simpleString) }.toSeq
        .toDF("position", "column_name", "data_type").orderBy("position")
    },

    "q_row_checks" -> { (s, dir) =>
      // cross-column row invariants riding the scan's pass 1: a holding
      // dates check and a violated arithmetic check, each one conditional
      // sum; the named alias is the metric the table test gates on
      val yaml =
        """table_name: lineitem
          |row_checks:
          |- check: l_quantity >= 1 AND l_quantity <= 50
          |  name: quantity_in_range
          |- l_discount < l_tax
          |tests:
          |- quantity_in_range == 0
          |""".stripMargin
      val r = Scanner.executeYaml(s, t(s, dir, "lineitem"), yaml)
      def v(alias: String) =
        r.measurement("row_check_violations", Some(alias)).get.value.get.asInstanceOf[Long]
      s.range(1).select(
        lit(v("quantity_in_range")).as("quantity_violations"),
        lit(v("row_check_1")).as("discount_violations"),
        lit(r.testResults.head.passed).as("test_passed"))
    },

    "q_scan_anomaly" -> { (s, dir) =>
      // the anomaly check wired through the full scan surface: the scan's
      // anomaly_count metric + the test verdict gating on it
      val yaml =
        """table_name: events
          |columns:
          |  value:
          |    anomaly:
          |      key: user_id
          |      order: event_id
          |      window: 10
          |      t_squared: 9
          |      min_points: 5
          |    tests:
          |    - anomaly_count > 0
          |""".stripMargin
      val r = Scanner.executeYaml(s, t(s, dir, "events"), yaml)
      val n = r.measurement("anomaly_count", Some("value")).get.value.get.asInstanceOf[Long]
      val passed = r.testResults.head.passed
      s.range(1).select(lit(n).as("anomaly_count"), lit(passed).as("test_passed"))
    },

    "q_scan_drift" -> { (s, dir) =>
      // the `drift:` check family through the full scan surface: persisted
      // PSI bucket reference + persisted KS value reference built from
      // src0, scan filtered to src1, tests gating on `psi` / `ks_stat`
      val docs = t(s, dir, "documents")
      val ref = docs.where(col("source") === "src0")
      val tmp = java.nio.file.Files.createTempDirectory("graft-driftref").toString
      graft.scan.Drift.savePsiReference(s,
        graft.scan.Drift.buildPsiReference(ref, "n_chars", 0.0, 2000.0, 10),
        s"$tmp/psi")
      ref.select("n_chars").write.mode("overwrite").parquet(s"$tmp/ks")
      val yaml =
        s"""table_name: docs
           |filter: source = 'src1'
           |columns:
           |  n_chars:
           |    psi_reference: $tmp/psi
           |    ks_reference: $tmp/ks
           |    tests:
           |    - psi < 0.25
           |    - ks_stat < 0.2
           |""".stripMargin
      val r = Scanner.executeYaml(s, docs, yaml)
      def m(name: String) =
        r.measurement(name, Some("n_chars")).get.value.get.asInstanceOf[Double]
      def passed(expr: String) =
        r.testResults.find(_.test.expression == expr).get.passed
      s.range(1).select(
        lit(m("psi")).as("psi"), lit(m("ks_stat")).as("ks_stat"),
        lit(passed("psi < 0.25")).as("psi_passed"),
        lit(passed("ks_stat < 0.2")).as("ks_passed"))
    },

    "q_interval_coverage" -> { (s, dir) =>
      // merged-interval utilization per user: event intervals of
      // floor(value) seconds; naive SUM double-counts overlap, coverage
      // doesn't — explicit floor dodges the double→long cast divergence
      val ev = t(s, dir, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("s"),
        (unix_timestamp(col("ts")) + floor(col("value")).cast(LongType)).as("e"))
      Windows.intervalCoverage(ev, "user_id", "s", "e").orderBy("user_id")
    },

    "q_scan_benford" -> { (s, dir) =>
      // the `benford:` check family through the full scan surface: chi2
      // measurements for two columns + one loose (passes) and one strict
      // (fails: synthetic prices are nothing like Benford) test
      val li = t(s, dir, "lineitem")
      val yaml =
        """table_name: li
          |columns:
          |  l_extendedprice:
          |    benford: 2
          |    tests:
          |    - benford_chi2 < 100000
          |    - benford_chi2 < 20.09
          |  l_quantity:
          |    benford: 2
          |""".stripMargin
      val r = Scanner.executeYaml(s, li, yaml)
      def m(c: String) =
        r.measurement("benford_chi2", Some(c)).get.value.get.asInstanceOf[Double]
      def passed(expr: String) =
        r.testResults.find(_.test.expression == expr).get.passed
      s.range(1).select(
        lit(m("l_extendedprice")).as("chi2_price"),
        lit(m("l_quantity")).as("chi2_qty"),
        lit(passed("benford_chi2 < 100000")).as("loose_passed"),
        lit(passed("benford_chi2 < 20.09")).as("strict_passed"))
    },

    "q_scan_conull" -> { (s, dir) =>
      // the table-level `co_missingness:` list through the full scan
      // surface: both-null count + null-set jaccard land as pair
      // measurements (column = "pri~st"), same derived-null frame as
      // q_conull
      val f = t(s, dir, "orders").select(
        expr("nullif(o_orderpriority, '3-MEDIUM')").as("pri"),
        expr("CASE WHEN o_orderpriority = '3-MEDIUM' OR o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END").as("st"))
      val yaml =
        """table_name: f
          |co_missingness:
          |- pri
          |- st
          |""".stripMargin
      val r = Scanner.executeYaml(s, f, yaml)
      def m(metric: String) = r.measurement(metric, Some("pri~st")).get.value.get
      s.range(1).select(
        lit(m("co_null_both").asInstanceOf[Long]).as("both_null"),
        lit(m("co_null_jaccard").asInstanceOf[Double]).as("null_jaccard"))
    },

    "q_scan_incremental" -> { (s, dir) =>
      // incremental scan: three disjoint slices scanned separately, their
      // mergeable states folded — the oracle computes the same metrics over
      // the FULL table in one pass, proving fold-then-derive == monolithic
      // bit-for-bit (including variance from folded fixed-point integers)
      val li = t(s, dir, "lineitem")
      val ms = Seq("min", "max", "avg", "sum", "variance", "stddev")
      val sd = ScanDefinition(tableName = "lineitem",
        columns = Map(
          "l_quantity" -> ColumnConfig(metrics = ms),
          "l_extendedprice" -> ColumnConfig(metrics = ms)))
      val slices = Seq(0, 1, 2).map(r => li.where(pmod(col("l_orderkey"), lit(3)) === r))
      val merged = graft.scan.IncrementalScan.mergeStates(
        slices.map(graft.scan.IncrementalScan.partialState(_, sd)).reduce(_ unionAll _))
      val fields = li.schema.fields.filter(f => Set("l_quantity", "l_extendedprice")(f.name))
      val derivedCols = fields.toSeq.flatMap(f => MetricColumns.derived(f.name, ms, f.dataType))
      merged.select(derivedCols: _*)
        .select(fields.toSeq.flatMap(f => ms.map(m => out(f.name, m))): _*)
    },

    "q_fd_check" -> ((s, dir) =>
      // functional-dependency audit: one holds (the key FD), two violated;
      // violation counts by group and by row, one shuffle per distinct lhs
      Constraints.fdCheck(t(s, dir, "orders"), Seq(
        Seq("o_orderkey") -> Seq("o_custkey"),
        Seq("o_custkey") -> Seq("o_orderpriority"),
        Seq("o_custkey") -> Seq("o_orderstatus", "o_orderpriority")))
        .orderBy("fd")),

    "q_fd_strength" -> ((s, dir) =>
      // g3 approximate-FD strength: the exact key FD scores 0; the noisy
      // ones score their minimum delete fraction
      Constraints.fdStrength(t(s, dir, "orders"), Seq(
        Seq("o_orderkey") -> Seq("o_custkey"),
        Seq("o_custkey") -> Seq("o_orderpriority"),
        Seq("o_orderstatus") -> Seq("o_orderpriority")))
        .orderBy("fd")),

    "q_fk_audit" -> { (s, dir) =>
      // referential integrity: the intact TPC-H FK (0 orphans proves the
      // audit doesn't false-positive) plus the same FK against a damaged
      // parent (every 3rd key removed) — orphan rows AND distinct orphan
      // keys quantify the break
      val orders = t(s, dir, "orders"); val cust = t(s, dir, "customer")
      Constraints.foreignKeyAudit(orders, Seq("o_custkey"), cust, Seq("c_custkey"))
        .unionAll(Constraints.foreignKeyAudit(orders, Seq("o_custkey"),
          cust.where(col("c_custkey") % 3 =!= 0), Seq("c_custkey"),
          label = "o_custkey->c_custkey_mod3"))
        .orderBy("fk")
    },

    "q_monotonic" -> ((s, dir) =>
      // ordering-invariant audit: per-user regressions of `value` in
      // event_id order — one keyed window pass, no global sort
      Constraints.monotonicityViolations(t(s, dir, "events"),
        Seq("user_id"), "event_id", "value")
        .orderBy("user_id")),

    "q_impute" -> { (s, dir) =>
      // deterministic per-group MODE imputation: lang nulled on every 7th
      // doc, refilled with the source's most-frequent language (min-value
      // ties — the goldenRecord survivorship rule); the categorical
      // gap-fill before grouping/joining on a null-bearing column
      val docs = t(s, dir, "documents")
        .withColumn("lang",
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("lang")))
      graft.ops.Constraints.imputeMode(docs, "lang", Seq("source"))
        .select("doc_id", "source", "lang", "lang_filled", "imputed")
        .orderBy("doc_id")
    },

    "q_impute_num" -> { (s, dir) =>
      // numeric twin of q_impute: n_chars nulled on every 11th doc,
      // refilled with the language's LOWER median (always an observed
      // value — no interpolated artifacts)
      val docs = t(s, dir, "documents")
        .withColumn("n_chars",
          when(col("doc_id") % 11 === 0, lit(null).cast("long"))
            .otherwise(col("n_chars")))
      graft.ops.Constraints.imputeMedian(docs, "n_chars", Seq("lang"))
        .select("doc_id", "lang", "n_chars", "n_chars_filled", "imputed")
        .orderBy("doc_id")
    },

    "q_type_infer" -> { (s, dir) =>
      // schema mining on stringly-typed columns: derived string renderings
      // of orders fields (identical exprs in the oracle); threshold 0.8 so
      // the 90%-bigint mixed column still tightens
      val base = t(s, dir, "orders").select(
        expr("cast(o_orderkey as string)").as("s_key"),
        expr("concat(cast(o_orderkey as string), '.', cast(o_custkey % 100 as string))").as("s_dec"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("s_date"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("s_ts"),
        expr("CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'FALSE' END").as("s_bool"),
        expr("CASE WHEN o_orderkey % 10 = 0 THEN 'N/A' ELSE cast(o_custkey as string) END").as("s_mixed"),
        expr("concat('u', cast(o_custkey as string), '@example.com')").as("s_email"),
        expr("concat(substr(md5(cast(o_orderkey as string)), 1, 8), '-', substr(md5(cast(o_orderkey as string)), 9, 4), '-', substr(md5(cast(o_orderkey as string)), 13, 4), '-', substr(md5(cast(o_orderkey as string)), 17, 4), '-', substr(md5(cast(o_orderkey as string)), 21, 12))").as("s_uuid"))
      Constraints.inferTypes(base,
        Seq("s_key", "s_dec", "s_date", "s_ts", "s_bool", "s_mixed", "s_email", "s_uuid"),
        threshold = 0.8)
        .orderBy("col_name")
    },

    "q_scan_text" -> { (s, dir) =>
      // the `text` metric group riding scan pass 1: whitespace-token stats
      // from ONE pre-projected token count per row
      val yaml =
        """table_name: documents
          |columns:
          |  text:
          |    metric_groups:
          |    - text
          |""".stripMargin
      val r = Scanner.executeYaml(s, t(s, dir, "documents"), yaml)
      def m(metric: String) = r.measurement(metric, Some("text")).get.value.get
      s.range(1).select(
        lit(m("token_count").asInstanceOf[Long]).as("token_count"),
        lit(m("avg_tokens").asInstanceOf[Double]).as("avg_tokens"),
        lit(m("min_tokens").asInstanceOf[Long]).as("min_tokens"),
        lit(m("max_tokens").asInstanceOf[Long]).as("max_tokens"))
    },

    "q_scan_types" -> { (s, dir) =>
      // the table-level `infer_types:` list through the full scan surface:
      // tightest-type measurements for three derived string columns
      val base = t(s, dir, "orders").select(
        expr("cast(o_orderkey as string)").as("s_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("s_date"),
        expr("concat('u', cast(o_custkey as string), '@example.com')").as("s_email"))
      val yaml =
        """table_name: base
          |infer_types:
          |- s_key
          |- s_date
          |- s_email
          |""".stripMargin
      val r = Scanner.executeYaml(s, base, yaml)
      def ty(c: String) =
        r.measurement("inferred_type", Some(c)).get.value.get.asInstanceOf[String]
      s.range(1).select(lit(ty("s_key")).as("t_key"),
        lit(ty("s_date")).as("t_date"), lit(ty("s_email")).as("t_email"))
    },

    "q_conull" -> { (s, dir) =>
      // co-missingness: the testdata has no native NULLs, so the gate
      // derives correlated missingness (priority-missing implies
      // status-missing ∪ more) via nullif / threshold — same exprs in the
      // oracle; one fused aggregate, three pairs
      val f = t(s, dir, "orders").select(
        expr("nullif(o_orderpriority, '3-MEDIUM')").as("pri"),
        expr("CASE WHEN o_orderpriority = '3-MEDIUM' OR o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END").as("st"),
        expr("CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END").as("px"))
      Constraints.coMissingness(f, Seq("pri", "st", "px"))
        .orderBy("col_a", "col_b")
    },

    "q_benford" -> ((s, dir) =>
      // Benford first-digit audit: one fused aggregate computes both
      // columns' digit histograms + chi-square; digits via exact
      // long-to-string, chi2 a left-folded literal-constant double tree
      Constraints.benfordAudit(t(s, dir, "lineitem"),
        Seq("l_extendedprice" -> 2, "l_quantity" -> 2))
        .orderBy("col_name", "digit")),

    "q_json_props" -> ((s, dir) =>
      // semi-structured extraction: parse the JSON props column row-locally
      // (codegen'd get_json_object — no UDF), aggregate per event type
      t(s, dir, "events").select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), count(col("k")).as("k_cnt"),
          sum("k").as("k_sum"), min("k").as("k_min"), max("k").as("k_max"))
        .orderBy("event_type")),

    "q_scan_wide" -> { (s, dir) =>
      // the END-TO-END scan surface (rows-only BY DESIGN: every constituent
      // metric is separately oracled via q_stats/q_stats_var/q_missing/
      // q_distinct/...; this entry exists so the bench times the real
      // Scanner.execute path — one scan pass + one group shuffle — rather
      // than only its pieces)
      val yaml =
        """table_name: lineitem_wide
          |metrics:
          |- row_count
          |- missing_count
          |- values_count
          |- min
          |- max
          |- avg
          |- sum
          |- variance
          |- stddev
          |- min_length
          |- max_length
          |- avg_length
          |metric_groups:
          |- duplicates
          |tests:
          |- row_count > 0
          |columns:
          |  l_quantity:
          |    valid_min: 1
          |    valid_max: 50
          |    metrics:
          |    - frequent_values
          |    - mins
          |    - maxs
          |    - histogram
          |    tests:
          |    - invalid_percentage == 0
          |  l_returnflag:
          |    valid_values:
          |    - A
          |    - N
          |    - R
          |""".stripMargin
      val r = Scanner.executeYaml(s, t(s, dir, "lineitem"), yaml,
        time = Some("2026-01-01T00:00:00Z"))
      // group_values is array<struct> — serialized to JSON so the harness's
      // rows-only pass (which sorts every column) never sees an array cell
      graft.api.ScanResultFrames.measurementsToDF(s, r.measurements)
        .withColumn("group_values", to_json(col("group_values")))
        .orderBy("metric", "column_name", "value")
    },

    "q_scan_wide_approx" -> { (s, dir) =>
      // q_scan_wide's 100 TB twin (rows-only BY DESIGN, like q_scan_wide;
      // the estimator itself is oracled via q_approx_duplicates): identical
      // scan but the duplicates family rides pass 1 as bottom-k-with-counts
      // sketches — no every-distinct-value shuffle. Pass 2 shrinks to the
      // one column asking for frequent_values/mins/maxs.
      val yaml =
        """table_name: lineitem_wide
          |metrics:
          |- row_count
          |- missing_count
          |- values_count
          |- min
          |- max
          |- avg
          |- sum
          |- variance
          |- stddev
          |- min_length
          |- max_length
          |- avg_length
          |metric_groups:
          |- duplicates_approx
          |tests:
          |- row_count > 0
          |columns:
          |  l_quantity:
          |    valid_min: 1
          |    valid_max: 50
          |    metrics:
          |    - frequent_values
          |    - mins
          |    - maxs
          |    - histogram
          |    tests:
          |    - invalid_percentage == 0
          |  l_returnflag:
          |    valid_values:
          |    - A
          |    - N
          |    - R
          |""".stripMargin
      val r = Scanner.executeYaml(s, t(s, dir, "lineitem"), yaml,
        time = Some("2026-01-01T00:00:00Z"))
      graft.api.ScanResultFrames.measurementsToDF(s, r.measurements)
        .withColumn("group_values", to_json(col("group_values")))
        .orderBy("metric", "column_name", "value")
    },

  )

  val oracleSql: Map[String, String] = Map(
    "q_benford" -> benfordOracle,

    "q_impute" ->
      """WITH d AS (SELECT doc_id, source,
        |                  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang
        |           FROM documents),
        |c AS (SELECT source, lang AS v, count(*) AS c FROM d
        |      WHERE lang IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT source, max(c) AS m FROM c GROUP BY source),
        |md AS (SELECT c.source, min(v) AS mode
        |       FROM c JOIN t ON t.source = c.source AND c.c = t.m GROUP BY c.source)
        |SELECT d.doc_id, d.source, d.lang, coalesce(d.lang, md.mode) AS lang_filled,
        |       (d.lang IS NULL AND md.mode IS NOT NULL) AS imputed
        |FROM d LEFT JOIN md USING (source)
        |ORDER BY doc_id""".stripMargin,

    "q_impute_num" ->
      """WITH d AS (SELECT doc_id, lang,
        |                  CASE WHEN doc_id % 11 = 0 THEN NULL ELSE n_chars END AS n_chars
        |           FROM documents),
        |c AS (SELECT lang, n_chars AS v, count(*) AS c FROM d
        |      WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |k AS (SELECT lang, v, sum(c) OVER (PARTITION BY lang ORDER BY v) AS k,
        |             sum(c) OVER (PARTITION BY lang) AS ng FROM c),
        |md AS (SELECT lang, min(CASE WHEN k >= (ng + 1) // 2 THEN v END) AS med
        |       FROM k GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |       coalesce(d.n_chars, md.med) AS n_chars_filled,
        |       (d.n_chars IS NULL AND md.med IS NOT NULL) AS imputed
        |FROM d LEFT JOIN md USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "q_type_infer" -> typeInferOracle,

    "q_interval_coverage" ->
      """WITH f AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |  CAST(floor(epoch(ts)) AS BIGINT) + CAST(floor(value) AS BIGINT) AS e
        |FROM events WHERE ts IS NOT NULL AND value IS NOT NULL AND floor(value) >= 0),
        |w AS (SELECT user_id, s, e,
        |  max(e) OVER (PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |FROM f),
        |b AS (SELECT user_id, s, e, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk FROM w),
        |i AS (SELECT user_id, s, e,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |FROM b),
        |g AS (SELECT user_id, island, min(s) AS i_s, max(e) AS i_e, sum(e - s) AS raw
        |      FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS islands,
        |       CAST(sum(i_e - i_s) AS BIGINT) AS covered,
        |       CAST(sum(raw) AS BIGINT) AS raw_sum
        |FROM g GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_scan_benford" -> {
      val noOrder = benfordOracle.replace("ORDER BY col_name, digit", "")
      s"""WITH b AS ($noOrder)
         |SELECT
         |  (SELECT DISTINCT chi2 FROM b WHERE col_name = 'l_extendedprice') AS chi2_price,
         |  (SELECT DISTINCT chi2 FROM b WHERE col_name = 'l_quantity') AS chi2_qty,
         |  (SELECT DISTINCT chi2 FROM b WHERE col_name = 'l_extendedprice') < 100000.0 AS loose_passed,
         |  (SELECT DISTINCT chi2 FROM b WHERE col_name = 'l_extendedprice') < 20.09 AS strict_passed""".stripMargin
    },

    "q_conull" ->
      """WITH f AS (SELECT
        |  nullif(o_orderpriority, '3-MEDIUM') AS pri,
        |  CASE WHEN o_orderpriority = '3-MEDIUM' OR o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS st,
        |  CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS px
        |FROM orders),
        |m AS (SELECT count(*) AS n,
        |  CAST(count(CASE WHEN pri IS NULL THEN 1 END) AS BIGINT) AS na_pri,
        |  CAST(count(CASE WHEN st IS NULL THEN 1 END) AS BIGINT) AS na_st,
        |  CAST(count(CASE WHEN px IS NULL THEN 1 END) AS BIGINT) AS na_px,
        |  CAST(count(CASE WHEN pri IS NULL AND st IS NULL THEN 1 END) AS BIGINT) AS b_pri_st,
        |  CAST(count(CASE WHEN pri IS NULL AND px IS NULL THEN 1 END) AS BIGINT) AS b_pri_px,
        |  CAST(count(CASE WHEN st IS NULL AND px IS NULL THEN 1 END) AS BIGINT) AS b_st_px
        |FROM f)
        |SELECT * FROM (
        |  SELECT 'pri' AS col_a, 'st' AS col_b, n, na_pri AS null_a, na_st AS null_b, b_pri_st AS both_null,
        |    CASE WHEN na_pri + na_st - b_pri_st > 0 THEN CAST(b_pri_st AS DOUBLE) / CAST(na_pri + na_st - b_pri_st AS DOUBLE) END AS null_jaccard,
        |    CASE WHEN na_pri > 0 AND na_st > 0 THEN (CAST(b_pri_st AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(na_pri AS DOUBLE) * CAST(na_st AS DOUBLE)) END AS lift
        |  FROM m
        |  UNION ALL
        |  SELECT 'pri', 'px', n, na_pri, na_px, b_pri_px,
        |    CASE WHEN na_pri + na_px - b_pri_px > 0 THEN CAST(b_pri_px AS DOUBLE) / CAST(na_pri + na_px - b_pri_px AS DOUBLE) END,
        |    CASE WHEN na_pri > 0 AND na_px > 0 THEN (CAST(b_pri_px AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(na_pri AS DOUBLE) * CAST(na_px AS DOUBLE)) END
        |  FROM m
        |  UNION ALL
        |  SELECT 'st', 'px', n, na_st, na_px, b_st_px,
        |    CASE WHEN na_st + na_px - b_st_px > 0 THEN CAST(b_st_px AS DOUBLE) / CAST(na_st + na_px - b_st_px AS DOUBLE) END,
        |    CASE WHEN na_st > 0 AND na_px > 0 THEN (CAST(b_st_px AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(na_st AS DOUBLE) * CAST(na_px AS DOUBLE)) END
        |  FROM m
        |) ORDER BY col_a, col_b""".stripMargin,

    "q_scan_types" -> scanTypesOracle,

    "q_scan_text" ->
      """SELECT
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS token_count,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS DOUBLE) /
        |    CAST(count(CASE WHEN text IS NOT NULL THEN 1 END) AS DOUBLE) AS avg_tokens,
        |  CAST(min(len(string_split_regex(text, '\s+'))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens
        |FROM documents""".stripMargin,

    "q_scan_conull" ->
      """WITH f AS (SELECT
        |  nullif(o_orderpriority, '3-MEDIUM') AS pri,
        |  CASE WHEN o_orderpriority = '3-MEDIUM' OR o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS st
        |FROM orders),
        |m AS (SELECT
        |  CAST(count(CASE WHEN pri IS NULL THEN 1 END) AS BIGINT) AS na,
        |  CAST(count(CASE WHEN st IS NULL THEN 1 END) AS BIGINT) AS nb,
        |  CAST(count(CASE WHEN pri IS NULL AND st IS NULL THEN 1 END) AS BIGINT) AS both_null
        |FROM f)
        |SELECT both_null,
        |  CAST(both_null AS DOUBLE) / CAST(na + nb - both_null AS DOUBLE) AS null_jaccard
        |FROM m""".stripMargin,

    "q_column_sketch" -> columnSketchOracleSql(32),

    "q_schema" ->
      """SELECT CAST(row_number() OVER () - 1 AS INT) AS position, column_name,
        |       CASE lower(column_type) WHEN 'varchar' THEN 'string'
        |                               WHEN 'integer' THEN 'int'
        |                               WHEN 'timestamp' THEN 'timestamp_ntz'
        |                               ELSE lower(column_type) END AS data_type
        |FROM (DESCRIBE SELECT * FROM lineitem)
        |ORDER BY position""".stripMargin,

    "q_row_count" -> "SELECT count(*) AS row_count FROM lineitem",

    "q_missing" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE o_orderpriority IS NULL OR o_orderpriority IN ('3-MEDIUM')) AS mc
        |  FROM orders)
        |SELECT mc AS missing_count,
        |       CAST(mc AS DOUBLE) * 100.0 / CAST(rc AS DOUBLE) AS missing_percentage,
        |       rc - mc AS values_count,
        |       CAST(rc - mc AS DOUBLE) * 100.0 / CAST(rc AS DOUBLE) AS values_percentage
        |FROM a""".stripMargin,

    "q_missing_regex" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE source IS NULL OR regexp_matches(source, '^src0$')) AS mc
        |  FROM documents)
        |SELECT mc AS missing_count, rc - mc AS values_count FROM a""".stripMargin,

    "q_stats" ->
      // fixed-point longs via sign-adjusted floor(x*1e4 + 0.5) — pure IEEE
      // double ops, bit-identical to MetricColumns.fixedPointLong BY
      // CONSTRUCTION (see its scaladoc); sum(BIGINT) is exact (HUGEINT)
      """WITH r AS (
        |  SELECT CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 10000.0 + 0.5)
        |                   ELSE -floor(-l_quantity * 10000.0 + 0.5) END AS BIGINT) AS vq,
        |         CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 10000.0 + 0.5)
        |                   ELSE -floor(-l_extendedprice * 10000.0 + 0.5) END AS BIGINT) AS vp,
        |         l_quantity, l_extendedprice
        |  FROM lineitem),
        |a AS (
        |  SELECT count(l_quantity) AS n1,
        |         min(l_quantity) AS mn1, max(l_quantity) AS mx1,
        |         CAST(sum(vq) AS DOUBLE) / 10000.0 AS s1,
        |         count(l_extendedprice) AS n2,
        |         min(l_extendedprice) AS mn2, max(l_extendedprice) AS mx2,
        |         CAST(sum(vp) AS DOUBLE) / 10000.0 AS s2
        |  FROM r)
        |SELECT mn1 AS l_quantity_min, mx1 AS l_quantity_max,
        |       s1 / CAST(n1 AS DOUBLE) AS l_quantity_avg, s1 AS l_quantity_sum,
        |       mn2 AS l_extendedprice_min, mx2 AS l_extendedprice_max,
        |       s2 / CAST(n2 AS DOUBLE) AS l_extendedprice_avg, s2 AS l_extendedprice_sum
        |FROM a""".stripMargin,

    "q_stats_var" ->
      // sum-of-squares in fixed-point integer units of 1e-8: the oracle
      // squares the SAME fixed-point long (sign-adjusted floor, see q_stats)
      // in exact decimal — the Spark side's hi/lo/slow split reassembles the
      // identical integer
      """WITH r AS (
        |  SELECT CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 10000.0 + 0.5)
        |                   ELSE -floor(-l_quantity * 10000.0 + 0.5) END AS BIGINT) AS vq,
        |         CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 10000.0 + 0.5)
        |                   ELSE -floor(-l_extendedprice * 10000.0 + 0.5) END AS BIGINT) AS vp,
        |         l_quantity, l_extendedprice
        |  FROM lineitem),
        |a AS (
        |  SELECT CAST(count(l_quantity) AS DOUBLE) AS n1,
        |         CAST(sum(vq) AS DOUBLE) / 10000.0 AS s1,
        |         CAST(sum(CAST(CAST(vq AS DECIMAL(19,0)) * CAST(vq AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) / 100000000.0 AS q1,
        |         CAST(count(l_extendedprice) AS DOUBLE) AS n2,
        |         CAST(sum(vp) AS DOUBLE) / 10000.0 AS s2,
        |         CAST(sum(CAST(CAST(vp AS DECIMAL(19,0)) * CAST(vp AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) / 100000000.0 AS q2
        |  FROM r)
        |SELECT (q1 - s1 * s1 / n1) / (n1 - 1.0) AS l_quantity_variance,
        |       sqrt((q1 - s1 * s1 / n1) / (n1 - 1.0)) AS l_quantity_stddev,
        |       (q2 - s2 * s2 / n2) / (n2 - 1.0) AS l_extendedprice_variance,
        |       sqrt((q2 - s2 * s2 / n2) / (n2 - 1.0)) AS l_extendedprice_stddev
        |FROM a""".stripMargin,

    "q_length" ->
      """WITH a AS (
        |  SELECT min(length(text)) AS mn1, max(length(text)) AS mx1,
        |         sum(length(text)) AS ls1, count(text) AS lc1,
        |         min(length(lang)) AS mn2, max(length(lang)) AS mx2,
        |         sum(length(lang)) AS ls2, count(lang) AS lc2
        |  FROM documents)
        |SELECT mn1 AS text_min_length, mx1 AS text_max_length,
        |       CAST(ls1 AS DOUBLE) / CAST(lc1 AS DOUBLE) AS text_avg_length,
        |       mn2 AS lang_min_length, mx2 AS lang_max_length,
        |       CAST(ls2 AS DOUBLE) / CAST(lc2 AS DOUBLE) AS lang_avg_length
        |FROM a""".stripMargin,

    "q_valid_values" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE o_orderstatus IS NULL) AS mc,
        |         count(*) FILTER (WHERE o_orderstatus IS NOT NULL AND o_orderstatus IN ('O','F')) AS vc
        |  FROM orders)
        |SELECT vc AS valid_count,
        |       CAST(vc AS DOUBLE) * 100.0 / CAST(rc AS DOUBLE) AS valid_percentage,
        |       rc - mc - vc AS invalid_count,
        |       CAST(rc - mc - vc AS DOUBLE) * 100.0 / CAST(rc AS DOUBLE) AS invalid_percentage
        |FROM a""".stripMargin,

    "q_valid_regex" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE lang IS NULL) AS mc,
        |         count(*) FILTER (WHERE lang IS NOT NULL AND regexp_matches(lang, '^(en|es)$')) AS vc
        |  FROM documents)
        |SELECT vc AS valid_count,
        |       rc - mc - vc AS invalid_count,
        |       CAST(rc - mc - vc AS DOUBLE) * 100.0 / CAST(rc AS DOUBLE) AS invalid_percentage
        |FROM a""".stripMargin,

    "q_valid_format" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE p_size IS NULL) AS mc,
        |         count(*) FILTER (WHERE p_size IS NOT NULL AND regexp_matches(CAST(p_size AS VARCHAR), '^-?[0-9]+$')) AS vc
        |  FROM part)
        |SELECT vc AS valid_count, rc - mc - vc AS invalid_count FROM a""".stripMargin,

    "q_valid_range" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE l_quantity IS NULL) AS mc,
        |         count(*) FILTER (WHERE l_quantity IS NOT NULL AND CAST(l_quantity AS DOUBLE) >= 5.0 AND CAST(l_quantity AS DOUBLE) <= 45.0) AS vc
        |  FROM lineitem)
        |SELECT vc AS valid_count,
        |       rc - mc - vc AS invalid_count,
        |       CAST(rc - mc - vc AS DOUBLE) * 100.0 / CAST(rc AS DOUBLE) AS invalid_percentage
        |FROM a""".stripMargin,

    "q_valid_length" ->
      """WITH a AS (
        |  SELECT count(*) AS rc,
        |         count(*) FILTER (WHERE text IS NULL) AS mc,
        |         count(*) FILTER (WHERE text IS NOT NULL AND length(text) >= 150 AND length(text) <= 400) AS vc
        |  FROM documents)
        |SELECT vc AS valid_count, rc - mc - vc AS invalid_count FROM a""".stripMargin,

    "q_distinct" ->
      """WITH cb AS (SELECT p_brand AS v, count(*) AS cnt FROM part WHERE p_brand IS NOT NULL GROUP BY 1),
        |sb AS (SELECT count(*) AS d, count(*) FILTER (WHERE cnt = 1) AS u,
        |              count(*) FILTER (WHERE cnt > 1) AS dup, sum(cnt) AS vc FROM cb),
        |ct AS (SELECT p_type AS v, count(*) AS cnt FROM part WHERE p_type IS NOT NULL GROUP BY 1),
        |st AS (SELECT count(*) AS d, count(*) FILTER (WHERE cnt = 1) AS u,
        |              count(*) FILTER (WHERE cnt > 1) AS dup, sum(cnt) AS vc FROM ct)
        |SELECT sb.d AS p_brand_distinct, sb.u AS p_brand_unique_count, sb.dup AS p_brand_duplicate_count,
        |       CAST(sb.d - 1 AS DOUBLE) * 100.0 / CAST(sb.vc - 1 AS DOUBLE) AS p_brand_uniqueness,
        |       st.d AS p_type_distinct, st.u AS p_type_unique_count, st.dup AS p_type_duplicate_count,
        |       CAST(st.d - 1 AS DOUBLE) * 100.0 / CAST(st.vc - 1 AS DOUBLE) AS p_type_uniqueness
        |FROM sb, st""".stripMargin,

    "q_frequent_values" ->
      """WITH c AS (SELECT o_orderpriority AS value, count(*) AS occurrences
        |           FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
        |r AS (SELECT value, occurrences,
        |             CAST(row_number() OVER (ORDER BY occurrences DESC, value ASC) AS INT) AS rank
        |      FROM c)
        |SELECT * FROM r WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "q_mins_maxs" ->
      """WITH v AS (SELECT DISTINCT CAST(p_size AS DOUBLE) AS value FROM part WHERE p_size IS NOT NULL),
        |m1 AS (SELECT 'mins' AS kind, CAST(row_number() OVER (ORDER BY value ASC) AS INT) AS rank, value FROM v),
        |m2 AS (SELECT 'maxs' AS kind, CAST(row_number() OVER (ORDER BY value DESC) AS INT) AS rank, value FROM v)
        |SELECT * FROM (SELECT * FROM m1 WHERE rank <= 5 UNION ALL SELECT * FROM m2 WHERE rank <= 5)
        |ORDER BY kind, rank""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT CAST(min(l_quantity) AS DOUBLE) AS lo, CAST(max(l_quantity) AS DOUBLE) AS hi FROM lineitem)
        |SELECT CAST(least(floor((CAST(l_quantity AS DOUBLE) - lo) / ((hi - lo) / 10.0)), 9.0) AS BIGINT) AS bucket,
        |       count(*) AS cnt
        |FROM lineitem, b
        |WHERE l_quantity IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_percentiles" ->
      """SELECT quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem""".stripMargin,

    "q_quantile_sketch" ->
      """WITH h AS (SELECT l_returnflag,
        |             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS h,
        |             l_extendedprice AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |d AS (SELECT l_returnflag, h, min(v) AS v FROM h GROUP BY l_returnflag, h),
        |r AS (SELECT l_returnflag, v,
        |             row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |      FROM d),
        |s AS (SELECT l_returnflag, list_sort(list(v)) AS sample
        |      FROM r WHERE rn <= 64 GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(len(sample) AS INT) AS n_sample,
        |       sample[CAST(floor(0.25 * (len(sample) - 1)) AS INT) + 1] AS p25,
        |       sample[CAST(floor(0.5 * (len(sample) - 1)) AS INT) + 1] AS p50,
        |       sample[CAST(floor(0.75 * (len(sample) - 1)) AS INT) + 1] AS p75
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_histogram_multi" ->
      """WITH b AS (SELECT CAST(min(l_quantity) AS DOUBLE) AS lo1, CAST(max(l_quantity) AS DOUBLE) AS hi1,
        |                  CAST(min(l_extendedprice) AS DOUBLE) AS lo2, CAST(max(l_extendedprice) AS DOUBLE) AS hi2
        |           FROM lineitem),
        |h1 AS (SELECT 0 AS colIdx,
        |              CAST(least(floor((CAST(l_quantity AS DOUBLE) - lo1) / ((hi1 - lo1) / 10.0)), 9.0) AS BIGINT) AS bucket,
        |              count(*) AS cnt
        |       FROM lineitem, b WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        |h2 AS (SELECT 1 AS colIdx,
        |              CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - lo2) / ((hi2 - lo2) / 10.0)), 9.0) AS BIGINT) AS bucket,
        |              count(*) AS cnt
        |       FROM lineitem, b WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2)
        |SELECT * FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2) ORDER BY colIdx, bucket""".stripMargin,

    "q_tests" ->
      """SELECT * FROM (
        |  SELECT 'row_count > 0' AS expression, CAST(NULL AS VARCHAR) AS column_name,
        |         (SELECT count(*) FROM lineitem) > 0 AS passed
        |  UNION ALL
        |  SELECT 'invalid_percentage < 20', 'l_quantity',
        |         (SELECT CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL AND NOT (CAST(l_quantity AS DOUBLE) <= 45.0)) AS DOUBLE) * 100.0
        |                 / CAST(count(*) AS DOUBLE) FROM lineitem) < 20.0
        |  UNION ALL
        |  SELECT 'invalid_count == 0', 'l_returnflag',
        |         (SELECT count(*) FILTER (WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R')) FROM lineitem) = 0
        |) ORDER BY expression""".stripMargin,

    "q_kmv_sketch" ->
      """WITH h AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |           FROM orders WHERE o_orderkey IS NOT NULL),
        |s AS (SELECT h FROM h ORDER BY h LIMIT 64),
        |g AS (SELECT list_sort(list(h)) AS sk FROM s)
        |SELECT CAST(unnest(range(0, len(sk))) AS INT) AS pos, unnest(sk) AS h
        |FROM g ORDER BY pos""".stripMargin,

    "q_kmv_by_group" ->
      """WITH h AS (SELECT DISTINCT o_orderpriority AS g,
        |       ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |       FROM orders WHERE o_custkey IS NOT NULL),
        |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
        |s AS (SELECT g, CAST(count(*) AS INT) AS sk_size, max(CASE WHEN rn = 64 THEN h END) AS kth
        |      FROM r WHERE rn <= 64 GROUP BY g)
        |SELECT g AS o_orderpriority, sk_size, kth,
        |  CASE WHEN sk_size < 64 THEN CAST(sk_size AS DOUBLE)
        |       ELSE CAST(63 AS DOUBLE) / (CAST(kth AS DOUBLE) / 1152921504606846976.0) END AS distinct_est
        |FROM s ORDER BY o_orderpriority""".stripMargin,

    "q_cms_table" ->
      """WITH h AS (SELECT ('0x' || substr(md5(lang), 1, 15))::BIGINT AS h
        |           FROM documents WHERE lang IS NOT NULL),
        |p AS (SELECT CAST(j AS INT) AS "row", (h + j * (1 + h % 31)) % 32 AS pos
        |      FROM h, generate_series(0, 3) t(j))
        |SELECT "row", pos, count(*) AS cnt
        |FROM p GROUP BY "row", pos ORDER BY "row", pos""".stripMargin,

    "q_cms_estimate" ->
      """WITH d AS (SELECT lang, ('0x' || substr(md5(lang), 1, 15))::BIGINT AS h
        |           FROM documents WHERE lang IS NOT NULL),
        |t AS (SELECT j, (h + j * (1 + h % 31)) % 32 AS pos, count(*) AS cnt
        |      FROM d, generate_series(0, 3) s(j) GROUP BY j, pos),
        |q AS (SELECT DISTINCT lang, h FROM d),
        |e AS (SELECT lang, j, (h + j * (1 + h % 31)) % 32 AS pos
        |      FROM q, generate_series(0, 3) s(j))
        |SELECT e.lang, min(t.cnt) AS estimate
        |FROM e JOIN t ON t.j = e.j AND t.pos = e.pos
        |GROUP BY e.lang ORDER BY e.lang""".stripMargin,

    "q_theta_sketch" -> thetaSketchOracleSql(128),

    "q_approx_duplicates" -> approxDupOracleSql(256,
      Seq("o_custkey", "o_orderkey", "o_orderpriority")),

    "q_sql_metric" ->
      "SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue FROM orders WHERE o_orderstatus = 'F'",

    "q_sql_metric_group" ->
      "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",

    "q_failed_rows" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity IS NULL OR NOT (CAST(l_quantity AS DOUBLE) <= 10.0)
        |ORDER BY l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "q_filter_vars" ->
      "SELECT count(*) AS row_count FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01'",

    "q_scan_samples" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT * FROM lineitem
        |  WHERE l_quantity IS NULL OR NOT (CAST(l_quantity AS DOUBLE) <= 5.0)
        |  ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |  LIMIT 15)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_profile" ->
      """SELECT 'c_acctbal' AS column_name, count(c_acctbal) AS values_count, count(DISTINCT c_acctbal) AS distinct_count FROM customer
        |UNION ALL SELECT 'c_custkey', count(c_custkey), count(DISTINCT c_custkey) FROM customer
        |UNION ALL SELECT 'c_mktsegment', count(c_mktsegment), count(DISTINCT c_mktsegment) FROM customer
        |UNION ALL SELECT 'c_name', count(c_name), count(DISTINCT c_name) FROM customer
        |UNION ALL SELECT 'c_nationkey', count(c_nationkey), count(DISTINCT c_nationkey) FROM customer
        |ORDER BY column_name""".stripMargin,

    "q_row_checks" ->
      """SELECT
        |  CAST(sum(CASE WHEN NOT coalesce(l_quantity >= 1 AND l_quantity <= 50, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS quantity_violations,
        |  CAST(sum(CASE WHEN NOT coalesce(l_discount < l_tax, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS discount_violations,
        |  sum(CASE WHEN NOT coalesce(l_quantity >= 1 AND l_quantity <= 50, FALSE) THEN 1 ELSE 0 END) = 0
        |    AS test_passed
        |FROM lineitem""".stripMargin,

    "q_scan_anomaly" ->
      """WITH f AS (SELECT user_id, event_id,
        |                  CAST(CASE WHEN value >= 0 THEN floor(value * 1000.0 + 0.5)
        |                            ELSE -floor(-value * 1000.0 + 0.5) END AS BIGINT) AS v
        |           FROM events),
        |r AS (SELECT v, count(v) OVER w AS n, sum(v) OVER w AS s, sum(v * v) OVER w AS q
        |      FROM f
        |      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT CAST(count(*) FILTER (WHERE n >= 5
        |              AND (n * v - s) * (n * v - s) > 9 * (n * q - s * s)) AS BIGINT)
        |         AS anomaly_count,
        |       count(*) FILTER (WHERE n >= 5
        |              AND (n * v - s) * (n * v - s) > 9 * (n * q - s * s)) > 0
        |         AS test_passed
        |FROM r""".stripMargin,

    "q_scan_incremental" ->
      // the FULL-table scan in one pass — if the Spark side's three-slice
      // fold were not exact, any of these eight values would hash-mismatch
      """WITH r AS (
        |  SELECT CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 10000.0 + 0.5)
        |                   ELSE -floor(-l_quantity * 10000.0 + 0.5) END AS BIGINT) AS vq,
        |         CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 10000.0 + 0.5)
        |                   ELSE -floor(-l_extendedprice * 10000.0 + 0.5) END AS BIGINT) AS vp,
        |         l_quantity, l_extendedprice
        |  FROM lineitem),
        |a AS (
        |  SELECT count(l_quantity) AS n1, min(l_quantity) AS mn1, max(l_quantity) AS mx1,
        |         CAST(sum(vq) AS DOUBLE) / 10000.0 AS s1,
        |         CAST(sum(CAST(CAST(vq AS DECIMAL(19,0)) * CAST(vq AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) / 100000000.0 AS q1,
        |         count(l_extendedprice) AS n2, min(l_extendedprice) AS mn2, max(l_extendedprice) AS mx2,
        |         CAST(sum(vp) AS DOUBLE) / 10000.0 AS s2,
        |         CAST(sum(CAST(CAST(vp AS DECIMAL(19,0)) * CAST(vp AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) / 100000000.0 AS q2
        |  FROM r)
        |SELECT mn1 AS l_quantity_min, mx1 AS l_quantity_max,
        |       s1 / CAST(n1 AS DOUBLE) AS l_quantity_avg, s1 AS l_quantity_sum,
        |       (q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) AS l_quantity_variance,
        |       sqrt((q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) AS l_quantity_stddev,
        |       mn2 AS l_extendedprice_min, mx2 AS l_extendedprice_max,
        |       s2 / CAST(n2 AS DOUBLE) AS l_extendedprice_avg, s2 AS l_extendedprice_sum,
        |       (q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) AS l_extendedprice_variance,
        |       sqrt((q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) AS l_extendedprice_stddev
        |FROM a""".stripMargin,

    "q_fk_audit" ->
      """WITH pk AS (SELECT DISTINCT c_custkey FROM customer),
        |pk3 AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 3 != 0),
        |a1 AS (SELECT 'o_custkey->c_custkey' AS fk, count(*) AS child_rows,
        |         CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_fk_rows,
        |         CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND pk.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows,
        |         count(DISTINCT CASE WHEN o.o_custkey IS NOT NULL AND pk.c_custkey IS NULL THEN o.o_custkey END) AS orphan_keys
        |       FROM orders o LEFT JOIN pk ON o.o_custkey = pk.c_custkey),
        |a2 AS (SELECT 'o_custkey->c_custkey_mod3' AS fk, count(*) AS child_rows,
        |         CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_fk_rows,
        |         CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND pk3.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows,
        |         count(DISTINCT CASE WHEN o.o_custkey IS NOT NULL AND pk3.c_custkey IS NULL THEN o.o_custkey END) AS orphan_keys
        |       FROM orders o LEFT JOIN pk3 ON o.o_custkey = pk3.c_custkey)
        |SELECT * FROM a1 UNION ALL SELECT * FROM a2 ORDER BY fk""".stripMargin,

    "q_fd_check" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey->o_orderpriority' AS fd, count(*) AS lhs_groups,
        |         count(*) FILTER (WHERE d > 1) AS violating_groups,
        |         CAST(coalesce(sum(n) FILTER (WHERE d > 1), 0) AS BIGINT) AS violating_rows
        |  FROM (SELECT o_custkey, count(*) AS n, count(DISTINCT row(o_orderpriority)) AS d
        |        FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'o_custkey->o_orderstatus,o_orderpriority', count(*),
        |         count(*) FILTER (WHERE d > 1),
        |         CAST(coalesce(sum(n) FILTER (WHERE d > 1), 0) AS BIGINT)
        |  FROM (SELECT o_custkey, count(*) AS n,
        |               count(DISTINCT row(o_orderstatus, o_orderpriority)) AS d
        |        FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'o_orderkey->o_custkey', count(*),
        |         count(*) FILTER (WHERE d > 1),
        |         CAST(coalesce(sum(n) FILTER (WHERE d > 1), 0) AS BIGINT)
        |  FROM (SELECT o_orderkey, count(*) AS n, count(DISTINCT row(o_custkey)) AS d
        |        FROM orders GROUP BY 1)
        |) ORDER BY fd""".stripMargin,

    "q_fd_strength" ->
      """WITH n AS (SELECT count(*) AS n FROM orders),
        |c1 AS (SELECT o_orderkey, o_custkey, count(*) AS c FROM orders GROUP BY 1, 2),
        |m1 AS (SELECT o_orderkey, max(c) AS m FROM c1 GROUP BY 1),
        |a1 AS (SELECT CAST(sum(m) AS BIGINT) AS kept, count(*) AS lhs_groups FROM m1),
        |c2 AS (SELECT o_custkey, o_orderpriority, count(*) AS c FROM orders GROUP BY 1, 2),
        |m2 AS (SELECT o_custkey, max(c) AS m FROM c2 GROUP BY 1),
        |a2 AS (SELECT CAST(sum(m) AS BIGINT) AS kept, count(*) AS lhs_groups FROM m2),
        |c3 AS (SELECT o_orderstatus, o_orderpriority, count(*) AS c FROM orders GROUP BY 1, 2),
        |m3 AS (SELECT o_orderstatus, max(c) AS m FROM c3 GROUP BY 1),
        |a3 AS (SELECT CAST(sum(m) AS BIGINT) AS kept, count(*) AS lhs_groups FROM m3)
        |SELECT * FROM (
        |  SELECT 'o_orderkey->o_custkey' AS fd, n, lhs_groups, kept,
        |    CAST(n - kept AS BIGINT) AS violating_rows,
        |    CASE WHEN n > 0 THEN CAST(n - kept AS DOUBLE) / CAST(n AS DOUBLE) END AS g3
        |  FROM a1 CROSS JOIN n
        |  UNION ALL
        |  SELECT 'o_custkey->o_orderpriority', n, lhs_groups, kept,
        |    CAST(n - kept AS BIGINT),
        |    CASE WHEN n > 0 THEN CAST(n - kept AS DOUBLE) / CAST(n AS DOUBLE) END
        |  FROM a2 CROSS JOIN n
        |  UNION ALL
        |  SELECT 'o_orderstatus->o_orderpriority', n, lhs_groups, kept,
        |    CAST(n - kept AS BIGINT),
        |    CASE WHEN n > 0 THEN CAST(n - kept AS DOUBLE) / CAST(n AS DOUBLE) END
        |  FROM a3 CROSS JOIN n
        |) ORDER BY fd""".stripMargin,

    "q_monotonic" ->
      """SELECT user_id, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END) AS BIGINT) AS regressions
        |FROM (SELECT user_id, value,
        |        lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_scan_drift" ->
      """WITH rb AS (SELECT greatest(least(CAST(floor((CAST(n_chars AS DOUBLE) - 0.0) / 200.0) AS BIGINT), 9), 0) AS bucket, count(*) AS cnt
        |       FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL GROUP BY 1),
        |cb AS (SELECT greatest(least(CAST(floor((CAST(n_chars AS DOUBLE) - 0.0) / 200.0) AS BIGINT), 9), 0) AS bucket, count(*) AS cnt
        |       FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 10)) AS bucket),
        |j AS (SELECT spine.bucket, coalesce(rb.cnt, 0) AS ref_cnt, coalesce(cb.cnt, 0) AS cur_cnt
        |      FROM spine LEFT JOIN rb USING (bucket) LEFT JOIN cb USING (bucket)),
        |tt AS (SELECT CAST(sum(ref_cnt) AS BIGINT) AS nr, CAST(sum(cur_cnt) AS BIGINT) AS nc FROM j),
        |x AS (SELECT (greatest(CAST(ref_cnt AS DOUBLE) / CAST(nr AS DOUBLE), 1e-6)
        |              - greatest(CAST(cur_cnt AS DOUBLE) / CAST(nc AS DOUBLE), 1e-6))
        |           * ln(greatest(CAST(ref_cnt AS DOUBLE) / CAST(nr AS DOUBLE), 1e-6)
        |              / greatest(CAST(cur_cnt AS DOUBLE) / CAST(nc AS DOUBLE), 1e-6)) AS y
        |      FROM j, tt),
        |psi AS (SELECT CAST(sum(CAST(CASE WHEN y >= 0 THEN floor(y * 1000000.0 + 0.5)
        |                                  ELSE -floor(-y * 1000000.0 + 0.5) END AS BIGINT)) AS BIGINT) / 1e6 AS psi
        |        FROM x),
        |u AS (SELECT CAST(n_chars AS DOUBLE) AS v, 1 AS side FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL
        |      UNION ALL
        |      SELECT CAST(n_chars AS DOUBLE), 2 FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL),
        |c AS (SELECT v, sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2 FROM u GROUP BY v),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT sum(c1) OVER (ORDER BY v) AS k1, sum(c2) OVER (ORDER BY v) AS k2 FROM c),
        |ks AS (SELECT (SELECT max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |                            - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))) FROM k, n) AS ks)
        |SELECT psi.psi AS psi, ks.ks AS ks_stat,
        |       psi.psi < 0.25 AS psi_passed, ks.ks < 0.2 AS ks_passed
        |FROM psi, ks""".stripMargin,

    "q_json_props" ->
      """SELECT event_type, count(*) AS cnt,
        |       count(k) AS k_cnt,
        |       CAST(sum(k) AS BIGINT) AS k_sum,
        |       min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

  )
}
