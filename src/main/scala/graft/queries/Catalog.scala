package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The gate catalog: every SURVEY.md §2 operator gets a query + (where
  * SQL-expressible) a DuckDB oracle. Float outputs are derived from
  * decimal-exact sums with identical expression trees on both sides
  * (SURVEY.md §3), so hash comparison is bit-exact.
  */
object Catalog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events")
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects natively
      graft.sources.Tables.parquet(s, s"$dir/$name.parquet", nanosTimestampCols = Seq("ts"))
    else s.read.parquet(s"$dir/$name.parquet")

  /** Row-level metrics through the library path (aggColumns + derived). */
  private def scanRow(df: DataFrame, cols: Seq[(String, ColumnConfig)], metrics: Seq[String]): DataFrame = {
    val fields = df.schema.fields.filter(f => cols.exists(_._1 == f.name))
    val preCols = fields.toSeq.flatMap { f =>
      MetricColumns.preProjection(f, cols.find(_._1 == f.name).get._2, metrics)
    }
    val aggInput = if (preCols.isEmpty) df else df.select(col("*") +: preCols: _*)
    val aggCols = fields.toSeq.flatMap { f =>
      MetricColumns.aggColumns(f, cols.find(_._1 == f.name).get._2, metrics)
    }
    val base = aggInput.agg(count(lit(1)).as("row_count"), aggCols: _*)
    val derivedCols = col("row_count") +: fields.toSeq.flatMap { f =>
      MetricColumns.derived(f.name, metrics, f.dataType)
    }
    base.select(derivedCols: _*)
  }

  /** Output alias of `metric` for column `c` as produced by MetricColumns.derived. */
  private def alias(c: String, metric: String): String = metric match {
    case "missing_count" | "valid_count" | "min" | "max" | "min_length" | "max_length" =>
      s"${c}__${metric}_out"
    case other => s"${c}__$other"
  }
  private def out(c: String, metric: String): Column =
    col(alias(c, metric)).as(s"${c}_$metric")

  // ==================================================================
  // Reference surface: soda metrics
  // ==================================================================

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

    // ==================================================================
    // Analytics headliners (TPC-H shapes)
    // ==================================================================

    "q1_agg" -> { (s, dir) =>
      // FIXED-POINT (cents) arithmetic: the 2-decimal money columns become
      // exact longs, so every sum is an order-independent primitive-long
      // aggregate inside codegen — 2.5-3x faster than decimal sums, still
      // bit-identical to the oracle (identical derivation trees). Products
      // stay well under 2^63 (price_c * disc_c * tax_c ~ 1e11/row).
      val qtyC = round(col("l_quantity") * 100.0).cast(LongType)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val taxC = round(col("l_tax") * 100.0).cast(LongType)
      val n = count(lit(1))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(qtyC).cast(DoubleType) / 100.0).as("sum_qty"),
          (sum(priceC).cast(DoubleType) / 100.0).as("sum_base_price"),
          (sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("sum_disc_price"),
          (sum(priceC * (lit(100L) - discC) * (lit(100L) + taxC)).cast(DoubleType) / 1000000.0).as("sum_charge"),
          (sum(qtyC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_qty"),
          (sum(priceC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_price"),
          (sum(discC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_disc"),
          n.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_topk" -> { (s, dir) =>
      // fixed-point revenue (see q1_agg)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").where(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem").where(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg((sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    },

    "q4_semijoin" -> { (s, dir) =>
      // TPC-H Q4 shape: order-priority counts over orders with at least one
      // late lineitem — the EXISTS form compiles to a left_semi join (no
      // payload duplication, AQE-broadcastable filter side)
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("o_orderdate") < lit("1996-04-01").cast(TimestampType))
      val late = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-06-01").cast(TimestampType))
        .select(col("l_orderkey"))
      o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    "q13_distribution" -> { (s, dir) =>
      // TPC-H Q13 shape: customer order-count distribution via LEFT OUTER
      // join + two-level aggregation (the classic histogram-of-groups)
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    "q5_join" -> { (s, dir) =>
      // fixed-point revenue (see q1_agg)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val r = t(s, dir, "region").where(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg((sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    "q6_filter" -> { (s, dir) =>
      // TPC-H Q6 shape: pure filter + global agg — every predicate must land
      // in the scan's DataFilters; fixed-point revenue (see q1_agg)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      // predicates on the RAW columns so they reach the parquet scan's
      // DataFilters (a predicate on round(col*100) cannot be pushed); the
      // midpoint thresholds are exactly the HALF_UP rounding boundaries, so
      // the selected rows are identical to the cents formulation. Cents
      // arithmetic appears only in the aggregate.
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
               col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
               col("l_discount") >= 0.045 && col("l_discount") < 0.075 &&
               col("l_quantity") < 23.995)
        .agg((sum(priceC * discC).cast(DoubleType) / 10000.0).as("revenue"))
    },

    "q_skew_agg" -> { (s, dir) =>
      // salted two-phase aggregation; oracle = the PLAIN group-by (the whole
      // point: salting must be result-invariant)
      Skew.saltedAggregate(t(s, dir, "events"), Seq("event_type"), 16,
          Seq("n_events" -> count(lit(1)),
              "value_cents" -> sum(round(col("value") * 100.0).cast(LongType))),
          n => sum(col(n)))
        .select(col("event_type"), col("n_events").cast(LongType).as("n_events"),
          (col("value_cents").cast(DoubleType) / 100.0).as("sum_value"))
        .orderBy("event_type")
    },

    // ==================================================================
    // Training-data pipeline operators
    // ==================================================================

    "q_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      Joins.asOf(errors, clicks, Seq("user_id"), "ts", "click_ts", Seq("click_ts"))
        .select(col("event_id"), col("user_id"), col("asof_click_ts"))
        .orderBy("event_id")
    },

    "q_asof_forward" -> { (s, dir) =>
      // FORWARD as-of with tolerance: the next view within 30 minutes of
      // each error ("did the user come back?") — same one-shuffle window
      // scan as q_asof_join, descending, over-age matches null out
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"))
      Joins.asOf(errors, views, Seq("user_id"), "ts", "view_ts", Seq("view_ts"),
          toleranceMicros = Some(30L * 60 * 1000000), forward = true)
        .select(col("event_id"), col("user_id"), col("asof_view_ts"))
        .orderBy("event_id")
    },

    "q_range_join" -> { (s, dir) =>
      // point-in-range via domain bucketization (RangeJoin.pointInRange):
      // overlapping price bands derived from nation (each covers 9000, strided
      // 2500 — a price can fall in up to 4 bands); the range predicate runs as
      // an EQUI-join on the 2048-wide bucket id, never a nested loop
      val bands = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("band"),
        (lit(900.0) + col("n_nationkey") * 2500.0).as("lo"),
        (lit(900.0) + col("n_nationkey") * 2500.0 + 9000.0).as("hi"))
      RangeJoin.pointInRange(
          t(s, dir, "lineitem").select("l_extendedprice", "l_quantity"),
          col("l_extendedprice"), bands, "lo", "hi", bucketWidth = 2048.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100.0 + 0.5).cast(LongType)).as("qty_cents"))
        .orderBy("band")
    },

    "q_interval_join" -> { (s, dir) =>
      // interval-overlap self-join per part: lineitems whose 7-day shipping
      // windows overlap. Equi key (partkey) + 7-day time bucket; the pair
      // survives only in its first common bucket (row-local filter — no
      // dedup shuffle). Quadratic only within (part, week) cells.
      val l = t(s, dir, "lineitem").select(
        col("l_partkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast(LongType).as("s"))
        .withColumn("e", col("s") + 7)
      // width 56 = 8x the interval: per-part cells are sparse (~0.08
      // items/day), so explosion factor dominates — swept in PLANS.md
      RangeJoin.intervalSelfJoin(l, Seq("l_partkey"), "s", "e", bucketWidth = 56.0)
        .where(col("id_a") < col("id_b"))
        .groupBy("l_partkey").agg(count(lit(1)).as("n_overlaps"))
        .orderBy("l_partkey")
    },

    "q_zorder" -> { (s, dir) =>
      // Morton interleave of (partkey, suppkey): per z-range bucket counts +
      // extrema prove the full bit-spread arithmetic; the layout operator
      // itself (range shuffle + in-partition sort) is plan/locality-asserted
      // in ZOrderSpec
      val z = ZOrder.interleave2(col("l_partkey"), col("l_suppkey"))
      t(s, dir, "lineitem").select(z.as("zv"))
        .groupBy(shiftright(col("zv"), 12).as("zbucket"))
        .agg(count(lit(1)).as("n"), min(col("zv")).as("z_min"), max(col("zv")).as("z_max"))
        .orderBy("zbucket")
    },

    "q_layout_audit" -> { (s, dir) =>
      // partition-grain manifest (keyed by l_returnflag as the partition
      // value) + per-predicate prunability report: one predicate entirely
      // below the domain (every partition prunable) and one inside it (none
      // prunable) — exact integer outputs, fully SQL-expressible
      val m = graft.ops.Manifest.partitionManifest(t(s, dir, "lineitem"),
        Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice"))
      graft.ops.Manifest.layoutAudit(m, Seq(
          ("l_quantity", -5.0, 0.5), ("l_quantity", 1.0, 10.0),
          ("l_extendedprice", 0.0, 2000.0)))
        .orderBy("predicate")
    },

    "q_balance" -> { (s, dir) =>
      // exact balanced-file assignment (distributed prefix rank div target)
      // over a (token-count, doc_id) composite layout key: every file gets
      // exactly 64 rows except the last remainder, contiguous in the key.
      // The physical writer (one file per id via aligned maxRecordsPerFile
      // cuts) is disk-asserted in BalanceSpec.
      val keyed = t(s, dir, "documents").select(
        (TextAnalysis.tokenCount(col("text")).cast(LongType) * lit(1000000L)
          + col("doc_id")).as("ord"))
      graft.ops.Balance.assignFiles(keyed, "ord", targetRows = 64)
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"), min("ord").as("ord_min"), max("ord").as("ord_max"))
        .orderBy("file_id")
    },

    "q_hilbert" -> { (s, dir) =>
      // native codegen'd Hilbert walk; the oracle re-runs the identical
      // quadrant-rotation state machine as a 16-step recursive CTE
      val h = ZOrder.hilbertIndex(col("l_partkey"), col("l_suppkey"), order = 16)
      t(s, dir, "lineitem").select(h.as("hv"))
        .groupBy(shiftright(col("hv"), 12).as("hbucket"))
        .agg(count(lit(1)).as("n"), min(col("hv")).as("h_min"), max(col("hv")).as("h_max"))
        .orderBy("hbucket")
    },

    "q_snapshot_diff" -> { (s, dir) =>
      // incremental-pipeline snapshot diff: old = docs not ≡0 mod 7,
      // new = docs not ≡0 mod 5 with every ≡0-mod-11 doc revised. The oracle
      // compares raw text; graft compares xxhash64 — identical output unless
      // the hash collides (it must not, and the gate would catch it)
      val docs = t(s, dir, "documents")
      val oldSnap = docs.where(col("doc_id") % 7 =!= 0).select("doc_id", "text")
      val newSnap = docs.where(col("doc_id") % 5 =!= 0).select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      Delta.snapshotDiff(oldSnap, newSnap, "doc_id", "text").orderBy("id")
    },

    "q_merge_upsert" -> { (s, dir) =>
      // CDC MERGE apply: every ≡0-mod-7 doc gets a delete at seq 1, every
      // ≡0-mod-5 doc an upsert (upper-cased text, lang 'xx') at seq 2 —
      // ≡0-mod-35 docs carry BOTH so latest-by-seq wins; all other docs
      // pass through untouched. Full oracle on the merged snapshot.
      val docs = t(s, dir, "documents")
      val changes = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit(1L).as("seq"), lit("D").as("op"),
          col("text"), col("lang"))
        .unionByName(docs.where(col("doc_id") % 5 === 0)
          .select(col("doc_id"), lit(2L).as("seq"), lit("U").as("op"),
            upper(col("text")).as("text"), lit("xx").as("lang")))
      Delta.applyChanges(docs, changes, "doc_id", "seq", "op",
          Seq("text", "lang"))
        .orderBy("doc_id")
    },

    "q_prop_test" -> { (s, dir) =>
      // did the fulfilled-rate move between high- and low-priority
      // orders? two-proportion pooled z — the Bernoulli drift member;
      // exact long counts, one fixed double tree
      val o = t(s, dir, "orders")
      graft.scan.Drift.proportionTest(
        o.where(col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        o.where(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")),
        col("o_orderstatus") === "F")
    },

    "q_roc_auc" -> { (s, dir) =>
      // exact ROC-AUC of the synthetic calibrated scorer (same score/
      // label construction as q_calibration) — the MWU machinery IS the
      // eval statistic; a calibrated uniform scorer lands near 2/3
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.rocAuc(scored, "score", "label")
    },

    "q_pr_curve" -> { (s, dir) =>
      // full precision/recall/F1 operating table of the same scorer —
      // every achievable threshold from the descending counts cumulative
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.prCurve(scored, "score", "label")
    },

    "q_confusion" -> { (s, dir) =>
      // thresholded confusion + MCC of the calibrated scorer at t=0.6 —
      // the imbalance-honest single number prCurve can't derive (no TN)
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.confusionAt(scored, "score", "label", 0.6)
    },

    "q_spearman_group" -> { (s, dir) =>
      // does price track quantity monotonically in EVERY return-flag
      // segment — per-group doubled-rank spearman on group-bounded
      // rank windows
      val li = t(s, dir, "lineitem")
      Correlation.spearmanByGroup(li, "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")
    },

    "q_brier" -> { (s, dir) =>
      // proper scoring rule over the same calibrated scorer: punishes
      // miscalibration AND non-discrimination in one number; exact
      // integer squared errors, one double division
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.brierScore(scored, "score", "label")
    },

    "q_avg_precision" -> { (s, dir) =>
      // single-number PR summary of the same scorer — the imbalance-proof
      // companion to q_roc_auc; step terms fx-12, order-free sum
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.averagePrecision(scored, "score", "label")
    },

    "q_calibration" -> { (s, dir) =>
      // reliability diagram over a synthetic calibrated scorer: score =
      // h1/1000, label = (h2 < h1) -> P(label|score) = score, so bucket
      // gaps are pure sampling noise; exact integer bucketing and sums
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(col("doc_id"),
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.calibrationTable(scored, "score", "label", 10)
    },

    "q_cat_entropy" -> { (s, dir) =>
      // effective-category profile of the corpus dimensions: entropy +
      // exp(H) + inverse-Simpson per column — the concentration reading
      // raw distinct counts flatter
      val docs = t(s, dir, "documents")
      Constraints.categoryEntropy(docs, Seq("lang", "source"))
        .orderBy("column")
    },

    "q_vocab_coverage" -> { (s, dir) =>
      // tokenizer-fit audit: src1 docs against src0's top-100 vocabulary —
      // coverage (vocab fraction exercised) + OOV occurrence rate
      val docs = t(s, dir, "documents")
      val refVocab = TextAnalysis.vocabulary(
        docs.where(col("source") === "src0"), "doc_id", "text", 100)
      TextAnalysis.vocabCoverage(
        docs.where(col("source") === "src1"), "text", refVocab, "token")
    },

    "q_budget_by_lang" -> { (s, dir) =>
      // mixture-weighted budgets: each language fills ITS OWN token
      // budget (2000·(lang-ordinal+1)) with its best quality-per-token
      // docs — group-bounded greedy, same md5 pseudo-quality as
      // q_budget_select
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tokens"),
        (graft.ops.Shingles.md5Hash60(
          concat(col("doc_id").cast("string"), lit("|q"))) % 1000L).as("score"))
      val budgets = docs.select(col("lang")).distinct()
        .withColumn("budget",
          (ascii(substring(col("lang"), 1, 1)).cast(LongType) % 5L + 1L) * 2000L)
      Sampling.budgetSelectByGroup(scored, "lang", "doc_id", "n_tokens",
          "score", budgets, "lang", "budget")
        .select("doc_id", "lang", "n_tokens", "score", "ratio", "cum_tokens")
        .orderBy("lang", "cum_tokens")
    },

    "q_embed_drift" -> { (s, dir) =>
      // did the embedding space move between even- and odd-label halves:
      // exact centroid cosine from per-dim decimal sums + mean norms —
      // the pre-flight before trusting cross-snapshot ANN artifacts
      val emb = t(s, dir, "embeddings")
      Embeddings.embeddingDrift(
        emb.where(col("label") % 2 === 0),
        emb.where(col("label") % 2 === 1), "embedding")
    },

    "q_qnorm" -> { (s, dir) =>
      // quantile-normalize src0 document lengths onto src1's length
      // distribution: rank-for-rank cross-shard alignment; integer
      // cross-multiplied positions, forward as-of over the rank maps
      val docs = t(s, dir, "documents")
      val src0 = docs.where(col("source") === "src0")
        .select("doc_id", "n_chars")
      val src1 = docs.where(col("source") === "src1").select("n_chars")
      Binning.quantileNormalize(src0, "n_chars", src1, "n_chars")
        .orderBy("doc_id")
    },

    "q_diversity_group" -> { (s, dir) =>
      // per-label diversity: which cluster collapsed to near-duplicates —
      // the same centroid identity with (label, dim)-bounded sums
      val emb = t(s, dir, "embeddings")
      Embeddings.diversityByGroup(emb, "label", "embedding").orderBy("label")
    },

    "q_diversity" -> { (s, dir) =>
      // average pairwise cosine of the whole embedding table in ONE pass
      // via |Σu|² − Σ|u|² — the diversity audit with no pair join; exact
      // integer arithmetic after per-vector quantization
      val emb = t(s, dir, "embeddings")
      Embeddings.diversity(emb, "embedding")
    },

    "q_neg_sample" -> { (s, dir) =>
      // contrastive negatives: every ≡0-mod-10 doc draws 3 deterministic
      // corpus negatives excluding itself and its synthetic positive
      // (doc_id+1); md5 draws through the two-phase corpus rank map
      val docs = t(s, dir, "documents")
      val anchors = docs.where(col("doc_id") % 10 === 0).select(col("doc_id"))
      val positives = anchors.select(col("doc_id").as("a"),
        (col("doc_id") + 1L).as("p"))
      Sampling.contrastiveNegatives(anchors, "doc_id", positives, "a", "p",
          docs.select("doc_id"), "doc_id", k = 3)
        .orderBy("anchor", "slot")
    },

    "q_budget_select" -> { (s, dir) =>
      // token-budget curation knapsack: fill 12k training tokens with the
      // best quality-per-token documents (greedy by ratio, boundary doc
      // dropped); pseudo-quality from the shared md5-60 hash so both
      // engines grade identically
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tokens"),
        (graft.ops.Shingles.md5Hash60(
          concat(col("doc_id").cast("string"), lit("|q"))) % 1000L).as("score"))
      Sampling.budgetSelect(scored, "doc_id", "n_tokens", "score", 12000L)
        .select("doc_id", "n_tokens", "score", "ratio", "cum_tokens")
        .orderBy("cum_tokens")
    },

    "q_gini_group" -> { (s, dir) =>
      // revenue concentration per market segment: which segment's revenue
      // is dominated by few customers — group-bounded windows, same
      // closed-form run terms as q_gini
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val perCust = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
        .agg(sum(MetricColumns.fixedPointLong(col("o_totalprice"), 2))
          .cast(LongType).as("cents"))
      Binning.giniByGroup(perCust, "seg", col("cents")).orderBy("seg")
    },

    "q_fdr" -> { (s, dir) =>
      // BH FDR over a deterministic p-value battery: uniform md5-hash p
      // per order, with a planted low-p signal block (≡0 mod 97) the
      // step-up rule must recover without flooding false alarms
      val o = t(s, dir, "orders").select(col("o_orderkey").as("test_id"))
      val u = (graft.ops.Shingles.md5Hash60(
        concat(col("test_id").cast("string"), lit("|fdr"))) % 1000003L)
        .cast(DoubleType) / lit(1000003.0)
      val withP = o.withColumn("p",
        when(col("test_id") % 97 === 0, u / lit(1000.0)).otherwise(u))
      graft.scan.Drift.fdrControl(withP, "p", 0.05, Seq("test_id"))
        .orderBy("p_rank")
    },

    "q_gini" -> { (s, dir) =>
      // revenue concentration across customers: Gini of per-customer
      // order totals (cents) — the "is the corpus dominated by a few
      // keys" diagnostic; closed-form run terms on the routed cumulative,
      // no global rank window
      val o = t(s, dir, "orders")
      val perCust = o.groupBy("o_custkey")
        .agg(sum(MetricColumns.fixedPointLong(col("o_totalprice"), 2))
          .cast(LongType).as("cents"))
      Binning.giniCoefficient(perCust, col("cents"))
    },

    "q_trimmed_mean" -> { (s, dir) =>
      // trimmed mean of price cents inside DYADIC [1/16, 15/16] fences:
      // drop-don't-clip robust center — dyadic p makes the interpolated
      // fence an exact rational, so Spark's vl+f·Δ and DuckDB's
      // vl(1−f)+vh·f trees agree bit-for-bit (non-dyadic p diverges in
      // the low bit); decimal kept-sum, one double division
      val li = t(s, dir, "lineitem").select(
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.trimmedMean(li, "cents", 0.0625, 0.9375)
    },

    "q_kl_slice" -> { (s, dir) =>
      // which language's token mix diverges from the corpus, in nats —
      // per-slice unigram KL with mutualInfo's bounded-window marginals;
      // transcendental terms quantize to fx-9 longs and sum order-free
      val docs = t(s, dir, "documents")
      TextAnalysis.vocabKlBySlice(docs, "text", "lang").orderBy("slice")
    },

    "q_kappa" -> { (s, dir) =>
      // chance-corrected label agreement: lang vs a "sloppy second
      // annotator" that mislabels every ≡0-mod-9 doc as 'zz' — the
      // inter-rater gate before trusting training labels; both κ operands
      // exact integers, one final double tree
      val docs = t(s, dir, "documents")
      Correlation.cohensKappa(
        docs.select(col("lang").as("a"),
          when(col("doc_id") % 9 === 0, "zz").otherwise(col("lang")).as("b")),
        "a", "b")
    },

    "q_scd2" -> { (s, dir) =>
      // SCD type-2 history from a synthetic feed: every doc opens at seq 1;
      // ≡0-mod-4 docs re-upsert the IDENTICAL payload at seq 2 (must
      // collapse), ≡1-mod-4 a CHANGED payload (new version); ≡0-mod-6 docs
      // delete at seq 3 (closes the version); ≡0-mod-12 re-open at seq 4.
      // Exercises collapse, close, gap and re-open in one history.
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      def ev(f: Column, seq: Long, op: String, lang: Column, nc: Column) =
        base.where(f).select(col("doc_id"), lit(seq).as("seq"),
          lit(op).as("op"), lang.as("lang"), nc.as("n_chars"))
      val changes = ev(lit(true), 1L, "U", col("lang"), col("n_chars"))
        .unionByName(ev(col("doc_id") % 4 === 0, 2L, "U", col("lang"), col("n_chars")))
        .unionByName(ev(col("doc_id") % 4 === 1, 2L, "U", col("lang"),
          col("n_chars") + 10L))
        .unionByName(ev(col("doc_id") % 6 === 0, 3L, "D",
          lit(null).cast(StringType), lit(null).cast(LongType)))
        .unionByName(ev(col("doc_id") % 12 === 0, 4L, "U", lit("re"),
          col("n_chars")))
      Delta.scd2(changes, "doc_id", "seq", "op", Seq("lang", "n_chars"))
        .withColumn("version", col("version").cast(LongType))
        .orderBy("doc_id", "version")
    },

    "q_ks" -> { (s, dir) =>
      // exact two-sample KS between returnflag populations, over fixed-point
      // cents (decimal→double conversion differs in the low bit between
      // engines; long→double is exact) — bucket-free drift, bit-for-bit
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.ksStatistic(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_standardize" -> ((s, dir) =>
      // per-flag exact z-score normalization of quantity cents: z =
      // (x·n − s)/√(n·Σx² − s²) — one fixed double tree over exact
      // integer moments, broadcast back; rows never shuffle
      Binning.standardize(
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
          "l_quantity", groupCols = Seq("l_returnflag"), scale = 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity_z"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity_z")),

    "q_chi2_drift" -> { (s, dir) =>
      // categorical mix drift: order-priority distribution, finished vs
      // open orders — the categorical member of the drift family; the
      // statistic sums as per-(category, side) truncated ppm integers,
      // order-free and engine-portable
      val o = t(s, dir, "orders")
      graft.scan.Drift.chiSquareCategorical(
        o.where(col("o_orderstatus") === "F"),
        o.where(col("o_orderstatus") === "O"), "o_orderpriority")
    },

    "q_mwu" -> { (s, dir) =>
      // exact tie-corrected Mann–Whitney U between the same returnflag
      // populations q_ks compares — the rank-shift complement of the CDF
      // gap, with the interpretable AUC (P[A beats R]); doubled ranks keep
      // every statistic an exact integer until the final z/auc trees
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.mannWhitneyU(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_weighted_median" -> { (s, dir) =>
      // QUANTITY-weighted price quartiles + p90: the importance-weighted
      // fences the unweighted family can't express (a 50-unit line weighs
      // 50× a 1-unit line); counts-frame routed, the only double op is the
      // cum ≥ p·W threshold compare
      val li = t(s, dir, "lineitem")
      Binning.weightedPercentiles(li,
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2),
        MetricColumns.fixedPointLong(col("l_quantity"), 0),
        Seq(0.25, 0.5, 0.75, 0.9))
    },

    "q_wasserstein" -> { (s, dir) =>
      // exact W1 (earth mover's) distance between the same returnflag
      // populations q_ks/q_mwu compare — the magnitude member of the drift
      // family ("how many cents did the mass move"); segment terms are
      // exact |k1·n2 − k2·n1|·Δv integers, one final double division
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.wasserstein1(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_wasserstein_group" -> { (s, dir) =>
      // per-language W1 of document length between the two sources — the
      // magnitude drilldown next to q_ks_group's largest-gap (how many
      // CHARS did each language's length distribution move)
      val docs = t(s, dir, "documents")
      graft.scan.Drift.wasserstein1ByGroup(
        docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "n_chars", "lang")
        .orderBy("lang")
    },

    "q_ks_group" -> { (s, dir) =>
      // per-language KS of document length between two sources — drift
      // localized to the segment that moved; n_chars is already integer
      val docs = t(s, dir, "documents")
      graft.scan.Drift.ksStatisticByGroup(
        docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "n_chars", "lang")
        .orderBy("lang")
    },

    "q_funnel" -> ((s, dir) =>
      // ordered signup→click→purchase funnel, 7-day conversion window:
      // greedy-min sequencing, one skinny aggregate per stage
      Events.funnel(t(s, dir, "events"), "ts", "user_id", "event_type",
          Seq("signup", "click", "purchase"), windowSec = 7L * 86400L)
        .orderBy("stage_index")),

    "q_funnel_gaps" -> ((s, dir) =>
      // time-to-convert between the same funnel's stages: exact quartiles
      // + mean of integer-second reach-time gaps per transition
      Events.stageGaps(t(s, dir, "events"), "ts", "user_id", "event_type",
          Seq("signup", "click", "purchase"), windowSec = 7L * 86400L)
        .orderBy("stage_index")),

    "q_cohort" -> ((s, dir) =>
      // weekly cohort retention triangle over integer epoch-day/week indices
      // (calendar-function-free, so both engines bucket identically)
      Events.cohortRetention(t(s, dir, "events"), "ts", "user_id",
          maxWeeks = 8)
        .orderBy("cohort_week", "week_offset")),

    "q_transitions" -> ((s, dir) =>
      // per-user consecutive event-type transition counts, (ts, event_id)
      // ordered so the matrix is deterministic under any partitioning
      Events.transitions(t(s, dir, "events"), "ts", "user_id", "event_type",
          "event_id")
        .orderBy("from_type", "to_type")),

    "q_stream_join" -> { (s, dir) =>
      // click→view attribution through StreamingJoin.intervalJoin in BATCH
      // mode — the identical code path the stream-stream watermarked join
      // runs (streaming parity is spec'd in StreamingSpec); view within the
      // 24 hours before each same-user click.
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
          col("user_id"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
      graft.streaming.StreamingJoin.intervalJoin(clicks, views, "user_id",
          "click_ts", "view_ts", lowerSec = -86400, upperSec = 0)
        .select("click_id", "view_id", "user_id")
        .orderBy("click_id", "view_id")
    },

    "q_outliers" -> { (s, dir) =>
      // Tukey-fence outliers per returnflag on fixed-point cents (integer
      // domain keeps quartile interpolation + fence arithmetic bit-exact)
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.iqrOutliers(li, col("cents"), "l_returnflag")
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).cast(LongType).as("n_outliers"),
          min(when(col("is_outlier"), col("cents"))).as("min_outlier_cents"),
          max(when(col("is_outlier"), col("cents"))).as("max_outlier_cents"))
        .orderBy("l_returnflag")
    },

    "q_anomaly" -> { (s, dir) =>
      // rolling z-score over each user's event sequence: flag events more
      // than 3 sigma (t^2 = 9) from their PRECEDING-10 window — the flag is
      // pure integer arithmetic on fixed-point longs ((nv-S)^2 > t^2(nQ-S^2)),
      // so the oracle window reproduces it exactly
      Outliers.rollingZScore(t(s, dir, "events"), Seq("user_id"), "event_id",
          "value", window = 10, tSquared = 9, minPoints = 5)
        .where(col("is_anomaly"))
        .select(col("user_id"), col("event_id"))
        .orderBy("user_id", "event_id")
    },

    "q_heavy_hitters" -> { (s, dir) =>
      // Misra-Gries summary over lang with k above the distinct-language
      // count -> counts EXACT and order-independent (the oracle is a plain
      // GROUP BY); the overflow/merge behavior is property-spec'd
      val sk = t(s, dir, "documents")
        .agg(graft.functions.MgSketch.mg(col("lang"), 16).as("hh"))
      sk.select(explode(col("hh")).as("e"))
        .select(col("e.item").as("lang"), col("e.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("lang").asc)
    },

    "q_heavy_hitters_group" -> { (s, dir) =>
      // the mergeable MG summary as a GROUPED aggregate: per source the
      // top languages — bounded k-entry state per group; k above the
      // distinct count keeps the exact-path oracle
      val sk = t(s, dir, "documents")
        .groupBy("source")
        .agg(graft.functions.MgSketch.mg(col("lang"), 16).as("hh"))
      sk.select(col("source"), explode(col("hh")).as("e"))
        .select(col("source"), col("e.item").as("lang"), col("e.cnt").as("cnt"))
        .orderBy(col("source"), col("cnt").desc, col("lang").asc)
    },

    "q_winsorize_group" -> { (s, dir) =>
      // per-group winsorization: clamp into each return flag's OWN 5/95
      // fences (iqrOutliers' grouped-percentile shape + winsorize's clamp)
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.winsorizeByGroup(base, "cents", "l_returnflag", 0.05, 0.95)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_clipped"), 1L).otherwise(0L)).cast(LongType).as("clipped"),
          sum(MetricColumns.fixedPointLong(col("cents_winsorized"), 2))
            .cast(LongType).as("wsum_fx"))
        .orderBy("l_returnflag")
    },

    "q_heavy_hitters_ss" -> { (s, dir) =>
      // SpaceSaving (overwrite-min) twin of q_heavy_hitters: k above the
      // distinct-language count -> no overwrite ever fires, counts EXACT and
      // err 0 (the oracle is a plain GROUP BY with a zero err column); the
      // overwrite/merge/error-bound behavior is property-spec'd
      val sk = t(s, dir, "documents")
        .agg(graft.functions.SpaceSaving.ss(col("lang"), 16).as("hh"))
      sk.select(explode(col("hh")).as("e"))
        .select(col("e.item").as("lang"), col("e.cnt").as("cnt"), col("e.err").as("err"))
        .orderBy(col("cnt").desc, col("lang").asc)
    },

    "q_corr" -> ((s, dir) =>
      // exact Pearson r for two pairs in one pass: quantity~price
      // (positively correlated by construction) and discount~tax (~0);
      // moments are exact integers, r derived with a fixed double tree
      Correlation.corrPairs(t(s, dir, "lineitem"), Seq(
          "l_quantity" -> "l_extendedprice",
          "l_discount" -> "l_tax"), scale = 2)
        .orderBy("pair")),

    "q_skew_report" -> ((s, dir) =>
      // hottest 10 sources + integer ppm share — the diagnostic that
      // decides whether salting/AQE skew handling is needed
      Skew.skewReport(t(s, dir, "documents"), "source", topK = 10)
        .orderBy(col("cnt").desc, col("key").asc)),

    "q_join_cardinality" -> { (s, dir) =>
      // pre-flight exact join sizing: clicks ⋈ views on user_id — total
      // output rows, shared keys, hottest key's contribution, from the
      // skinny count frames only (payload never moves)
      val ev = t(s, dir, "events")
      // Operator keeps DECIMAL(38,0) internally (hot-key squares overflow
      // BIGINT long before the join); the GATE casts to BIGINT because the
      // driver's hasher canonicalizes wide decimals differently from the
      // oracle engine (third DECIMAL-gate incident — see selfcheck lint).
      // Values fit comfortably in BIGINT at every gate SF.
      Skew.joinCardinality(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"), Seq("user_id"))
        .select(col("join_rows").cast("bigint").as("join_rows"),
          col("shared_keys"),
          col("max_key_rows").cast("bigint").as("max_key_rows"))
    },

    "q_bins" -> ((s, dir) =>
      // equi-depth discretization of extended price (cents): 8 ~75k-row
      // buckets where the equi-width histogram would be skew-lopsided;
      // integer bin formula reproduced exactly by the oracle
      Binning.equiDepthBins(t(s, dir, "lineitem"),
          MetricColumns.fixedPointLong(col("l_extendedprice"), 2), k = 8)
        .orderBy("bin")),

    "q_pct_rank" -> ((s, dir) =>
      // exact empirical CDF of quantity cents: the corpus-relative score
      // normalizer; same routed-cumulative shape as q_bins, no global row
      // window anywhere
      Binning.valueRanks(t(s, dir, "lineitem"),
        MetricColumns.fixedPointLong(col("l_quantity"), 2))
        .orderBy("v")),

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

    "q_mad" -> { (s, dir) =>
      // median/MAD robust outlier flags (Hampel rule) per return flag on
      // fixed-point cents: medians interpolate to exactly-representable
      // halves, so med/mad/flag all replay bit-for-bit in the oracle
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.madOutliers(base, col("cents"), "l_returnflag", k = 3.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).cast(LongType).as("n_outliers"),
          min(col("__med")).as("med"), min(col("__mad")).as("mad"))
        .orderBy("l_returnflag")
    },

    "q_winsorize" -> { (s, dir) =>
      // heavy-tail clipping into exact 5/95 percentile fences; summary per
      // flag with an order-free quantized sum of the clamped values
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.winsorize(base, "cents", 0.05, 0.95)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_clipped"), 1L).otherwise(0L)).cast(LongType).as("clipped"),
          sum(MetricColumns.fixedPointLong(col("cents_winsorized"), 2))
            .cast(LongType).as("wsum_fx"))
        .orderBy("l_returnflag")
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

    "q_rollup" -> { (s, dir) =>
      // hierarchical totals in one pass (Expand, not N aggregates)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          MetricColumns.fixedPointLong(col("l_quantity"), 2).as("qc"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("qc")).as("qty_cents"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "q_pivot" -> { (s, dir) =>
      // pivot = conditional aggregation; explicit value list keeps the plan
      // a single aggregate (no distinct-collect pre-pass)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          MetricColumns.fixedPointLong(col("l_quantity"), 2).as("qc"))
        .groupBy("l_linestatus").pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("qc")))
        .select(col("l_linestatus"), col("A").as("qty_a_cents"),
          col("N").as("qty_n_cents"), col("R").as("qty_r_cents"))
        .orderBy("l_linestatus")
    },

    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "events"), "event_id", "props").orderBy("keep_id")),

    "q_dedup_jaccard" -> ((s, dir) =>
      // all-pairs-in-block + native sorted-merge jaccard: blocks are small
      // and vocab overlap is huge, so the inverted-index strategy
      // (Dedup.jaccardPairs) degenerates here
      Dedup.jaccardPairsAllPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, blockCols = Seq("lang")).orderBy("id_a", "id_b")),

    "q_dedup_jaccard_inv" -> ((s, dir) =>
      // the inverted-index strategy over a stricter threshold — kept as its
      // own gate entry so both code paths stay oracle-checked
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"))
        .orderBy("id_a", "id_b")),

    "q_dedup_jaccard_prefix" -> ((s, dir) =>
      // prefix-filtered strategy: identical output contract to the
      // inverted-index gate (same oracle), ~(1-t) of tokens indexed
      Dedup.jaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"))
        .orderBy("id_a", "id_b")),

    "q_dedup_jaccard_pp" -> ((s, dir) =>
      // PPJoin positional filter on the prefix strategy: same output
      // contract (same oracle), candidates pruned by the first-collision
      // overlap bound before verification
      Dedup.jaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"), positional = true)
        .orderBy("id_a", "id_b")),

    "q_containment" -> ((s, dir) =>
      // asymmetric sub-document detection: directed containment ≥ 0.9 within
      // (lang, source) blocks — catches short-inside-long reuse that the
      // size-symmetric jaccard gates cannot. Full oracle incl. the double.
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"))
        .orderBy("id_sub", "id_sup")),

    "q_dedup_minhash" -> ((s, dir) =>
      // shingleLen=1: these synthetic docs are bags of common words, so the
      // MinHash set definition matches the token-set Jaccard verification.
      // md5Hash60 token hashing makes the FULL output (LSH banding included)
      // oracle-checkable: DuckDB recomputes the 64 permutation minima from
      // the same md5-derived hashes and applies the same 16-band equality.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, shingleLen = 1, tokenHasher = Shingles.md5Hash60)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),

    "q_dict_hits" -> { (s, dir) =>
      // Aho-Corasick gazetteer: ALL (overlapping) occurrences of 5
      // patterns (multi-word phrases included) in one automaton pass;
      // oracle re-counts via position enumeration
      val h = graft.functions.DictMatch.hits(col("text"), DictPatterns)
      t(s, dir, "documents").select(col("doc_id"), h.as("h"))
        .select(col("doc_id") +:
          DictPatterns.indices.map(i => element_at(col("h"), i + 1).as(s"n$i")): _*)
        .orderBy("doc_id")
    },

    "q_lsh_tuning" -> ((s, dir) =>
      // measure-don't-guess for LSH itself: empirical candidate
      // recall/precision vs exact jaccard on a 400-doc deterministic
      // sample, next to the analytic S-curve value
      Dedup.lshTuningAudit(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, numHashes = 64, bands = 16, shingleLen = 1,
        sampleSize = 400, tokenHasher = Shingles.md5Hash60)),

    "q_split_leakage" -> ((s, dir) =>
      // eval-contamination audit: near-dup pairs straddling splits. Split
      // labels are computed row-locally on the pair frame (assignment is a
      // pure function of the id) — no corpus join; md5-60 hashes on both
      // the tokens and the split decision make the FULL output oracled.
      // 3-token shingles = the operator default and the realistic
      // selectivity (the q_dedup_incremental lesson: token sets on this
      // ~50-word-vocabulary corpus make ~42% of cross pairs "similar" and
      // the output itself goes quadratic — 1.03M rows / 31-50 s at sf0.1
      // for zero extra coverage)
      Dedup.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.8,
        shingleLen = 3, tokenHasher = Shingles.md5Hash60,
        splitHasher = Shingles.md5Hash60)
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
        .orderBy("id_a", "id_b")),

    "q_dedup_minhash_xx" -> ((s, dir) =>
      // PRODUCTION-hash twin of q_dedup_minhash: the default xxhash64 token
      // hash users actually run (one codegen'd primitive op vs md5+hex
      // parse). No DuckDB oracle (xxhash64 isn't portable) → rows-only gate;
      // exists so the bench times the fast path, not only the md5 variant.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, shingleLen = 1)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),

    "q_dedup_simhash" -> ((s, dir) =>
      // md5Hash60/60-bit variant: DuckDB recomputes the per-bit majorities
      // and exact hamming distances — full-output oracle. The chunked
      // candidate stage guarantees recall for hamming <= 3 (pigeonhole),
      // so chunking is invisible in the output.
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3,
        tokenHasher = Shingles.md5Hash60, bits = 60)
        .select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")),

    "q_dedup_simhash_xx" -> ((s, dir) =>
      // PRODUCTION-hash twin of q_dedup_simhash (xxhash64/64-bit, rows-only —
      // see q_dedup_minhash_xx)
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")),

    "q_dedup_cosine" -> ((s, dir) =>
      Dedup.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.3)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),

    "q_dedup_components" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val edges = Dedup.jaccardPairsAllPairs(docs, "doc_id", "text",
        threshold = 0.8, blockCols = Seq("lang"))
      Components.connectedComponents(docs, "doc_id", edges, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    "q_dedup_incremental" -> { (s, dir) =>
      // cross-RUN dedup: "new crawl" (doc_id ≡ 0 mod 3) against the
      // persisted signature store of earlier batches (the rest) — store
      // bodies never touched; similarity is the signature estimate
      val docs = t(s, dir, "documents")
      val store = Dedup.minhashSignatures(docs.where(col("doc_id") % 3 =!= 0),
        "doc_id", "text", shingleLen = 3, tokenHasher = Shingles.md5Hash60)
      val fresh = Dedup.minhashSignatures(docs.where(col("doc_id") % 3 === 0),
        "doc_id", "text", shingleLen = 3, tokenHasher = Shingles.md5Hash60)
      Dedup.dedupAgainstStore(fresh, store, threshold = 0.7)
        .orderBy("new_id", "store_id")
    },

    "q_dedup_keep_best" -> { (s, dir) =>
      // canonical-doc selection: same clusters as q_dedup_components, but
      // each cluster keeps its LONGEST member (ties → smallest id), not the
      // min id — the policy a quality-aware pipeline actually wants
      val docs = t(s, dir, "documents")
      val edges = Dedup.jaccardPairsAllPairs(docs, "doc_id", "text",
        threshold = 0.8, blockCols = Seq("lang"))
      Dedup.keepBestPerComponent(docs, "doc_id", edges,
        size(TextAnalysis.tokens(col("text"))))
        .select("doc_id", "lang").orderBy("doc_id")
    },

    "q_semdedup" -> { (s, dir) =>
      // SemDeDup: cluster on the deterministic coarse quantizer (row-local
      // cell column, centroids bound once), cosine pairs within cells, keep
      // the highest-quality member per connected component (quality = first
      // embedding component here — any replayable column works)
      val emb = t(s, dir, "embeddings")
      Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.3,
        quality = element_at(col("embedding"), 1).cast(DoubleType), ncells = 16)
        .select("vec_id", "label").orderBy("vec_id")
    },

    "q_semdedup_guard" -> { (s, dir) =>
      // the measured hot-cell SPLIT route, forced by a deliberately small
      // pair budget (500): cells past the budget re-quantize k-ways on
      // their k smallest-id members; the oracle replays the k =
      // ceil(pairs/500) sub-quantizer end-to-end, so the guard's routing
      // arithmetic and the sub-assignment tie rule are both bit-gated
      val emb = t(s, dir, "embeddings")
      Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.3,
        quality = element_at(col("embedding"), 1).cast(DoubleType), ncells = 16,
        maxPairsPerCell = 500L)
        .select("vec_id", "label").orderBy("vec_id")
    },

    "q_embed_quantize" -> ((s, dir) =>
      // q8 is array<tinyint> — serialized to JSON text (the q_scan_wide
      // group_values pattern) so the harness's pandas compare, which sorts
      // every column, never sees an array cell
      Embeddings.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("scale"),
          to_json(col("q8")).as("q8"))
        .orderBy("vec_id")),

    "q_ann_bruteforce" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    "q_silhouette" -> ((s, dir) =>
      // exact per-point silhouette on int8-quantized vectors: integer
      // distances -> every value incl. the ratio is bit-oracled
      Embeddings.silhouetteQuantized(t(s, dir, "embeddings"), "vec_id",
          "embedding", nMedoids = 8)
        .withColumnRenamed("id", "id")
        .orderBy("id")),

    "q_ann_lsh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    "q_ann_lsh_mp" -> { (s, dir) =>
      // multi-probe: query also probes the flip of its lowest-margin
      // plane per table — recall of more tables at the index cost of few
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKMultiProbe(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, probes = 2)
        .orderBy("query_id", "rank")
    },

    "q_ann_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    "q_pq_encode" -> { (s, dir) =>
      // product quantization codes (m=8 subspaces × c=8 codewords over
      // dim 64): deterministic smallest-id seed codebook, row-local argmin
      // probes against the one codebook literal — the oracle replays every
      // distance with the identical left-fold association
      val emb = t(s, dir, "embeddings")
      val cb = graft.ops.Pq.trainCodebook(emb, "vec_id", "embedding", m = 8, c = 8)
      // wide code columns, not posexplode: a Generate over the (expensive)
      // codes expression makes InferFiltersFromGenerate clone the whole
      // pipeline into a per-row Filter; 8 element_at refs also pin the
      // codes projection (measured ~10x on the encode bench)
      graft.ops.Pq.encode(emb, "vec_id", "embedding", cb)
        .select(col("id").as("vec_id") +:
          (0 until 8).map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        .orderBy("vec_id")
    },

    "q_ivfpq_encode" -> { (s, dir) =>
      // IVFADC index build: coarse cell routing + residual PQ codes, one
      // row-local pass; cells, residuals and codes all replayed exactly
      val emb = t(s, dir, "embeddings")
      val cells = graft.ops.IvfPq.trainCells(emb, "vec_id", "embedding", ncells = 8)
      val cb = graft.ops.IvfPq.trainResidualCodebook(emb, "vec_id", "embedding",
        cells, m = 8, c = 8)
      // wide code columns for the same InferFiltersFromGenerate reason as
      // q_pq_encode
      graft.ops.IvfPq.encode(emb, "vec_id", "embedding", cells, cb)
        .select(Seq(col("id").as("vec_id"), col("cell")) ++
          (0 until 8).map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        .orderBy("vec_id")
    },

    "q_ivfpq_topk" -> { (s, dir) =>
      // IVFADC end-to-end: probe the 2 nearest cells per query, ADC-score
      // only their members against the per-(query, cell) residual lookup
      // tables — the oracle replays probes, luts and the ranked fold
      val emb = t(s, dir, "embeddings")
      graft.ops.IvfPq.ivfPqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, ncells = 8, m = 8, c = 8, nprobe = 2)
        .orderBy("query_id", "rank")
    },

    "q_pq_topk" -> { (s, dir) =>
      // ADC search over the codes: query-side m×c lookup tables, candidate
      // distance = m table lookups (left-fold), ranks oracled end-to-end
      val emb = t(s, dir, "embeddings")
      graft.ops.Pq.pqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, m = 8, c = 8)
        .orderBy("query_id", "rank")
    },

    "q_knn_graph" -> ((s, dir) =>
      // full-corpus kNN graph: every vector is a query; both sides
      // shuffle-join on the IVF cell (no broadcast of the corpus). Oracle
      // replicates the quantizer, probing and per-node top-k in SQL.
      Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, ncells = 16, nprobe = 2)
        .orderBy("query_id", "rank")),

    "q_mutual_knn" -> ((s, dir) =>
      // reciprocal top-3 pairs of the kNN graph: the hub-immune symmetric
      // core — the standard pair-mining filter before verification
      Similarity.mutualKnnPairs(
        Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 3, ncells = 16, nprobe = 2))
        .orderBy("id_a", "id_b")),

    "q_knn_hubs" -> ((s, dir) =>
      // hubness: in-degree over the kNN graph — one bounded shuffle
      Similarity.hubScores(
        Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 3, ncells = 16, nprobe = 2))
        .orderBy("id")),

    "q_knn_margin" -> ((s, dir) =>
      // ratio-margin re-ranking of the kNN graph (the bitext-mining
      // criterion): per-node neighborhood means attached via two skinny
      // id-keyed joins; oracle replays the full graph + margin algebra.
      // Rank-only output — the house rule for cosine-derived orderings.
      Similarity.knnMargin(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 3, ncells = 16, nprobe = 2)
        .orderBy("query_id", "margin_rank")),

    "q_hard_negatives" -> { (s, dir) =>
      // contrastive hard negatives: nearest non-positive neighbors, with
      // positives = same-label pairs (the embeddings table's cluster id) —
      // over-fetch 6, anti-join positives, keep top-3 negatives.
      val emb = t(s, dir, "embeddings")
      val pos = emb.select(col("vec_id").as("qid"), col("label"))
        .join(emb.select(col("vec_id").as("nid"), col("label")), "label")
        .where(col("qid") =!= col("nid"))
        .select("qid", "nid")
      Similarity.hardNegatives(emb, pos, "vec_id", "embedding",
          k = 3, fetchK = 6, ncells = 16, nprobe = 2)
        .orderBy("query_id", "neg_rank")
    },

    "q_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey")
        .orderBy("o_orderpriority", "rank")
    },

    "q_dedup_ngram" -> ((s, dir) =>
      // word-3-gram Jaccard (order-sensitive near-dup; distinct from the
      // token-SET jaccard of q_dedup_jaccard — shuffled copies don't match).
      // Routed through MinHash-LSH on 3-gram shingles — the scale-safe shape
      // (skinny band shuffle, no O(block²) join); the oracle recomputes the
      // same banding candidacy + exact shingle-hash jaccard. The all-pairs
      // strategy (jaccardPairsAllPairs(shingleLen=3)) remains the small-block
      // option and is equivalence-tested against this path in DedupSpec.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3, shingleLen = 3, tokenHasher = Shingles.md5Hash60)
        .select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")),

    "q_chunk_rescue" -> { (s, dir) =>
      // paragraph-level quality RESCUE: instead of dropping a whole document
      // that fails quality rules, chunk it (20 tokens, no overlap so
      // reassembly is lossless), judge each chunk with the Gopher rules, and
      // rebuild documents from only the passing chunks — the salvage stage
      // of a curation pipeline. Both operators are oracled alone
      // (q_chunk, q_gopher); this gate proves the composition.
      val chunks = TextAnalysis.chunkDocuments(t(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 20, overlapTokens = 0)
      val judged = TextAnalysis.gopherRules(
        chunks.withColumnRenamed("chunk_text", "text"), "text",
        minWords = 10, maxMeanWordLen = 12.0, minStopwordHits = 1)
      judged.where(col("keep"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("chunk_idx"), col("text")))),
              s => s.getField("text")), " ").as("text_rescued"))
        .orderBy("doc_id")
    },

    "q_substr_incremental" -> { (s, dir) =>
      // cross-run substring dedup: the store holds window hashes of the
      // ≡1,2-mod-3 history (bodies never re-read); the ≡0-mod-3 batch
      // rewrites against store hits plus its own internal duplicates
      val docs = t(s, dir, "documents")
      val store = Dedup.substringStore(docs.where(col("doc_id") % 3 =!= 0),
        "doc_id", "text", windowTokens = 20, tokenHasher = Shingles.md5Hash60)
      Dedup.substringDedupIncremental(docs.where(col("doc_id") % 3 === 0),
          "doc_id", "text", store, windowTokens = 20,
          tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_substr_provenance" -> ((s, dir) =>
      // spans + "copied from where": one example other occurrence of each
      // span's first window, via two bounded min aggregates per hash
      Dedup.substringSpansWithProvenance(t(s, dir, "documents"), "doc_id",
          "text", windowTokens = 20, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id", "span_start")),

    "q_substr_spans" -> ((s, dir) =>
      // the audit grain of substring dedup: maximal duplicated spans per
      // doc via gaps-and-islands over the duplicated window starts
      Dedup.substringSpans(t(s, dir, "documents"), "doc_id", "text",
          windowTokens = 20, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id", "span_start")),

    "q_substr_dedup" -> ((s, dir) =>
      // exact-substring dedup, sliding 20-token windows: any span whose
      // exact text occurs twice anywhere in the corpus is removed from
      // every occurrence; md5-60 window hashes -> fully oracled rewrite
      Dedup.substringDedup(t(s, dir, "documents"), "doc_id", "text",
          windowTokens = 20, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")),

    "q_line_dedup" -> { (s, dir) =>
      // C4 boilerplate-line rule: drop lines whose doc frequency > 1. The
      // synthetic docs are single-line, so the gate frames them with
      // per-doc header lines ("source: …", "lang: …") — cross-document
      // boilerplate by construction, which the rule must strip while the
      // unique bodies survive. md5-60 line hashes → fully oracled.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          concat(lit("source: "), col("source")),
          concat(lit("lang: "), col("lang")), col("text")).as("text"))
      Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 1,
          tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_para_dedup" -> ((s, dir) =>
      // cross-document passage dedup (10-token passages, drop any passage
      // seen in >1 document, reassemble). md5Hash60 passage hashing → the
      // full rewritten text is oracle-checkable.
      Dedup.passageDedup(t(s, dir, "documents"), "doc_id", "text",
        passageTokens = 10, maxDocFreq = 1, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")),

    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"), "text", n = 3)
        .select("doc_id", "n_tokens", "distinct_tokens", "top_token_count",
          "n_ngrams", "distinct_ngrams", "dup_token_frac", "top_token_frac",
          "dup_ngram_frac")
        .orderBy("doc_id")),

    "q_contamination" -> { (s, dir) =>
      // decontamination check: corpus docs sharing any 3-token shingle with
      // the "benchmark" set (stand-in: every 50th document)
      val docs = t(s, dir, "documents")
      TextAnalysis.contamination(
        docs.where(col("doc_id") % 50 =!= 0), docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")
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

    "q_bloom_join" -> { (s, dir) =>
      // bloom semi-join in the 100 TB direction: the FACT side (orders) is
      // filtered row-locally — no join, no shuffle — by a bloom built over
      // a selective dimension subset (high-balance customers, ~10% of
      // keys). m deliberately small so false positives OCCUR and the
      // oracle proves the exact bit arithmetic.
      val m = 4096; val k = 3
      val richCustomers = t(s, dir, "customer").where(col("c_acctbal") > 9000.0)
      val sketch = Bloom.build(richCustomers,
        Shingles.md5Hash60(col("c_custkey").cast(StringType)), m, k)
      t(s, dir, "orders")
        .withColumn("__h", Shingles.md5Hash60(col("o_custkey").cast(StringType)))
        .where(Bloom.mightContain(col("__h"), sketch, m, k))
        .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
    },

    "q_sample_hash" -> ((s, dir) =>
      // deterministic hash sample: reproducible across runs/partitionings;
      // md5Hash60 keying makes the exact kept-set oracle-checkable
      Sampling.hashSample(t(s, dir, "documents"), "doc_id", fraction = 0.1,
          hasher = Shingles.md5Hash60)
        .select("doc_id").orderBy("doc_id")),

    "q_cap_per_key" -> ((s, dir) =>
      // web-corpus domain capping: <= ~10 docs per source (25-250 exist per
      // source at gate SFs, so the fraction path is exercised), deterministic
      // hash-fraction rule; md5Hash60 keying makes the exact kept set
      // oracle-checkable
      Sampling.capPerKey(t(s, dir, "documents"), "source", "doc_id", maxRows = 10,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "source").orderBy("doc_id")),

    "q_url_domain" -> { (s, dir) =>
      // URL canonicalization + registrable domain over messy URLs
      // synthesized deterministically in-gate (the q_chunk_sentences
      // precedent): mixed-case schemes/hosts, default and non-default
      // ports, tracking params mixed into real ones, fragments, and both
      // generic and two-label-suffix TLDs. The oracle replays the entire
      // regexp chain (RE2-safe by construction) plus the suffix-lite rule.
      val docs = t(s, dir, "documents")
      val url = syntheticUrl
      docs.select(col("doc_id"), url.as("url"),
          graft.ops.Urls.canonicalizeUrl(url).as("url_canon"),
          graft.ops.Urls.domainOf(url).as("domain"))
        .orderBy("doc_id")
    },

    "q_domain_cap" -> { (s, dir) =>
      // the composition per-domain curation actually runs: registrable
      // domain as the capPerKey key — "at most N docs per domain"
      val docs = t(s, dir, "documents")
      Sampling.capPerKey(
          docs.withColumn("domain", graft.ops.Urls.domainOf(syntheticUrl)),
          "domain", "doc_id", maxRows = 12, hasher = Shingles.md5Hash60)
        .select("doc_id", "domain").orderBy("doc_id")
    },

    "q_url_dedup" -> { (s, dir) =>
      // URL-level exact dedup — the FIRST dedup of every web pipeline:
      // group by canonical URL, keep the smallest id. The synthesis here
      // varies ONLY canonicalization-removable noise (scheme/host case,
      // default port, tracking params, fragments) over colliding paths,
      // so the oracle derives the canonical ANALYTICALLY — an independent
      // derivation, not a replay of the same regexps
      val docs = t(s, dir, "documents")
      val m3 = col("doc_id") % 3
      val m4 = col("doc_id") % 4
      val m5 = col("doc_id") % 5
      val m6 = col("doc_id") % 6
      val scheme = when(m3 === 0, "http").when(m3 === 1, "HTTP").otherwise("hTtP")
      val host0 = concat(col("lang"), lit("-"), col("source"), lit(".com"))
      val host = when(col("doc_id") % 2 === 0, upper(host0)).otherwise(host0)
      val port = when(m4 === 0, ":80").otherwise(lit(""))
      val qs = when(m6 === 0, "?utm_source=feed&utm_medium=x")
        .when(m6 === 1, "?fbclid=zz").otherwise(lit(""))
      val frag = when(m5 === 1, "#top").otherwise(lit(""))
      val url = concat(scheme, lit("://"), host, port,
        lit("/p/"), col("doc_id") % 25, qs, frag)
      docs.select(col("doc_id"),
          graft.ops.Urls.canonicalizeUrl(url).as("url_canon"))
        .groupBy("url_canon")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("url_canon")
    },

    "q_domain_skew" -> { (s, dir) =>
      // per-domain concentration: counts, share, cumulative share of the
      // top 20 domains — "is this corpus three domains in a trenchcoat?".
      // The running-sum window is DOMAIN-bounded (hundreds of rows), never
      // row data; total attaches as a broadcast 1-row frame
      val docs = t(s, dir, "documents")
      val counts = docs.select(graft.ops.Urls.domainOf(syntheticUrl).as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum("n").as("tot"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("domain"))
      counts.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum_n", sum("n").over(w))
        .where(col("rank") <= 20)
        .select(col("rank"), col("domain"), col("n"),
          (col("n").cast(DoubleType) / col("tot").cast(DoubleType)).as("share"),
          (col("cum_n").cast(DoubleType) / col("tot").cast(DoubleType)).as("cum_share"))
        .orderBy("rank")
    },

    "q_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedHashSample(t(s, dir, "documents"), "doc_id", "lang",
          fractions = Map("en" -> 0.2, "es" -> 0.5), defaultFraction = 0.05,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_mixture_sample" -> ((s, dir) =>
      // data mixing: resample documents toward a 50/30/20 en/es/de target
      // mixture — exact stratum counts set integer keep thresholds the
      // oracle recomputes with the identical double tree; other langs drop
      Sampling.mixtureSample(t(s, dir, "documents"), "doc_id", "lang",
          targets = Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.2),
          hasher = Shingles.md5Hash60)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_dataset_card" -> ((s, dir) =>
      // the one-row corpus documentation artifact — every stat rides ONE
      // scan/aggregate pass; md5-60 text hashing makes the exact-dup rate
      // oracle-checkable
      Card.report(t(s, dir, "documents"), "text", "lang", "source",
        textHasher = Shingles.md5Hash60)),

    "q_card_by_lang" -> ((s, dir) =>
      // the per-segment card: same fused pass grouped by language —
      // the mixture documentation rows
      Card.reportBy(t(s, dir, "documents"), "lang", "text", "lang", "source",
        textHasher = Shingles.md5Hash60)
        .orderBy("grp")),

    "q_probe_weights" -> { (s, dir) =>
      // in-engine model training: 5 rounds of fixed-point full-batch GD
      // (one gradient aggregate + a 4-long driver update per round); the
      // integer dynamics replay bit-identically, so the oracle re-trains
      // the same model in SQL and the WEIGHTS themselves are the gate
      import s.implicits._
      val feat = LinearProbe.featureFrame(t(s, dir, "documents"), "doc_id", "text", "n_chars")
      val w = LinearProbe.train(feat, 4, rounds = 5, etaDen = 50000L).last
      Seq((w(0), w(1), w(2), w(3))).toDF("w0", "w1", "w2", "w3")
    },

    "q_probe_scores" -> { (s, dir) =>
      // row-local corpus scoring with the trained probe (weights bound as
      // literals — the serve path after training)
      val feat = LinearProbe.featureFrame(t(s, dir, "documents"), "doc_id", "text", "n_chars")
      val w = LinearProbe.train(feat, 4, rounds = 5, etaDen = 50000L).last
      LinearProbe.scores(feat, w).select(col("id").as("doc_id"), col("pred_fx")).orderBy("doc_id")
    },

    "q_mixture_temp" -> ((s, dir) =>
      // p^alpha temperature mixing at alpha=0.5: targets are sqrt(observed
      // counts), unnormalized (nmax scaling is factor-invariant), so the
      // whole decision replays in SQL with sqrt's correctly-rounded IEEE
      Sampling.temperatureSample(t(s, dir, "documents"), "doc_id", "source",
          alpha = 0.5, hasher = Shingles.md5Hash60)
        .select("doc_id", "source").orderBy("doc_id")),

    "q_top_per_key" -> ((s, dir) =>
      // EXACT per-source cap: the 8 smallest md5-60(doc_id) per source —
      // KMV bottom-n aggregate (bounded map-side partials) + semi-join
      // reassembly; contrast with q_cap_per_key's approximate fraction rule
      Sampling.topNPerKeyExact(t(s, dir, "documents"), "source", "doc_id", n = 8,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "source").orderBy("doc_id")),

    "q_split_assign" -> ((s, dir) =>
      // deterministic train/val/test assignment keyed on a salted hash of
      // doc_id (row-local, rerun-stable); the gate reports per-(source,
      // split) counts + an id checksum so every row's assignment is covered
      Sampling.assignSplit(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          hasher = Shingles.md5Hash60)
        .groupBy("source", "split")
        .agg(count(lit(1)).as("cnt"), sum("doc_id").as("id_sum"))
        .orderBy("source", "split")),

    "q_commonness" -> ((s, dir) =>
      TextAnalysis.docCommonness(t(s, dir, "documents"), "doc_id", "text", broadcastVocab = true)
        .select("doc_id", "tf_sum", "n_tokens", "commonness").orderBy("doc_id")),

    "q_commonness_cms" -> ((s, dir) =>
      // CMS-backed twin of q_commonness: the exact token→tf join replaced
      // by a 4×1024 Count-Min literal probed map-only — every estimate an
      // exact integer the oracle replays from the same position formula
      TextAnalysis.docCommonnessCms(t(s, dir, "documents"), "doc_id", "text",
          depth = 4, width = 1024)
        .select("doc_id", "tf_sum_est", "n_tokens", "commonness_est").orderBy("doc_id")),

    "q_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(t(s, dir, "documents"), "doc_id", "text", k = 20)
        .select("token", "tf", "df_docs").orderBy(col("tf").desc, col("token").asc)),

    "q_collocations" -> ((s, dir) =>
      // top-30 adjacent-pair collocations by quantized PMI (minCount 20):
      // two count shuffles + skinny unigram joins, TakeOrdered top-k
      TextAnalysis.collocations(t(s, dir, "documents"), "doc_id", "text",
        k = 30, minCount = 20L)),

    "q_tfidf" -> ((s, dir) =>
      // per-doc top-3 TF-IDF keywords: one (doc, token) shuffle + skinny
      // df join + doc-bounded window; score quantized once at scale 6
      TextAnalysis.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),

    "q_bpe_merges" -> { (s, dir) =>
      // distributed BPE training: corpus read once into a word-frequency
      // frame, then 4 vocabulary-sized merge rounds; lexicographic
      // tie-break makes the merge sequence engine-replayable — the oracle
      // unrolls the identical rounds as CTEs
      import s.implicits._
      val (_, merges) = Bpe.train(s, t(s, dir, "documents"), "text", nMerges = 4)
      merges.toDF().select("mrank", "mleft", "mright", "cnt").orderBy("mrank")
    },

    "q_bpe_tokens" -> { (s, dir) =>
      // the trained tokenizer's corpus token counts (weighted expansion of
      // the vocabulary frame — no second corpus pass)
      val (wf, _) = Bpe.train(s, t(s, dir, "documents"), "text", nMerges = 4)
      Bpe.tokenCounts(wf).orderBy("token")
    },

    "q_percentiles_group" -> { (s, dir) =>
      val p = percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75)))
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(p.as("ps"))
        .select(col("l_returnflag"),
          element_at(col("ps"), 1).as("p25"),
          element_at(col("ps"), 2).as("p50"),
          element_at(col("ps"), 3).as("p75"))
        .orderBy("l_returnflag")
    },

    "q_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(t(s, dir, "documents"), "text",
          minTokens = 30, maxAvgTokenLen = 5.0, minStopwordRatio = 0.02)
        .select("doc_id", "keep", "reason").orderBy("doc_id")),

    "q_gopher" -> ((s, dir) =>
      // Gopher rule set (Rae et al. 2021 Table A1): the standard pre-training
      // format/repetition heuristics, one row-local projection; every signal
      // and verdict oracled bit-for-bit (identical double trees).
      TextAnalysis.gopherRules(t(s, dir, "documents"), "text",
          minWords = 20, maxMeanWordLen = 12.0)
        .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
          "bullet_frac", "ellipsis_frac", "alpha_frac", "stop_hits",
          "r_words", "r_word_len", "r_symbol", "r_bullet", "r_ellipsis",
          "r_alpha", "r_stopwords", "keep")
        .orderBy("doc_id")),

    "q_pipeline_e2e" -> { (s, dir) =>
      // the COMPOSED curation pipeline, end-to-end in one lazy plan:
      // quality filter -> cross-doc passage dedup -> exact dedup on the
      // rewritten text -> deterministic 50% sample. Every stage is oracled
      // alone elsewhere; this gate proves they compose bit-exactly.
      val docs = t(s, dir, "documents")
      val kept = TextAnalysis.qualityFilter(docs, "text",
          minTokens = 30, maxAvgTokenLen = 5.0, minStopwordRatio = 0.02)
        .where(col("keep")).select("doc_id", "text")
      val cleaned = Dedup.passageDedup(kept, "doc_id", "text",
          passageTokens = 10, maxDocFreq = 1, tokenHasher = Shingles.md5Hash60)
        .where(length(col("text_clean")) > 0)
      val deduped = cleaned.groupBy("text_clean")
        .agg(min(col("doc_id")).as("doc_id"))
      Sampling.hashSample(deduped, "doc_id", fraction = 0.5,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "text_clean").orderBy("doc_id")
    },

    "q_redact" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
          TextAnalysis.redact(col("c_name"), Seq("[0-9]{6,}" -> "<ID>")).as("redacted"))
        .orderBy("c_custkey")),

    "q_embed_centroids" -> ((s, dir) =>
      Embeddings.centroids(t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("grp", "dim")),

    "q_robust_scale" -> ((s, dir) =>
      // median/IQR scaling of price cents: routed exact quantile fences as
      // literals, pure row-local transform; one value per distinct cents
      // keeps the gate output distinct-bounded
      Binning.robustScale(
          t(s, dir, "lineitem").select(col("l_extendedprice")),
          "l_extendedprice", scale = 2)
        .groupBy(col("l_extendedprice_rz").as("rz"))
        .agg(count(lit(1)).as("n"))
        .orderBy("rz")),

    "q_spearman" -> ((s, dir) =>
      // exact Spearman rho between quantity and price — the rank-based
      // association q_corr's Pearson can't see past marginal scales;
      // doubled tie-averaged ranks keep every moment an exact integer
      Correlation.spearman(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", scale = 2)),

    "q_corr_matrix" -> ((s, dir) =>
      // FULL 4x4 correlation matrix in ONE CovVectorAgg pass (6 pairs from
      // one d2-long mergeable state) - vs q_corr's two per-pair aggregates
      Correlation.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), scale = 2)
        .orderBy("col_a", "col_b")),

    "q_skyline" -> { (s, dir) =>
      // Pareto frontier over per-supplier aggregates: suppliers no other
      // supplier beats on (revenue max, volume max, discount burden min)
      // at once — the multi-criteria selection a weighted score can't
      // express; two-phase local-skyline + candidate anti-join
      val sup = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(
          sum(MetricColumns.fixedPointLong(col("l_extendedprice"), 2))
            .cast(LongType).as("revenue_c"),
          count(lit(1)).cast(LongType).as("n_items"),
          sum(MetricColumns.fixedPointLong(col("l_discount"), 2))
            .cast(LongType).as("disc_c"))
      Pareto.skyline(sup,
          Seq(("revenue_c", true), ("n_items", true), ("disc_c", false)))
        .orderBy("suppkey")
    },

    "q_embed_cov" -> ((s, dir) =>
      // PCA sufficient statistics in one pass: all 2080 upper-triangle
      // quantized product sums + marginals — the d²-bounded frame pcaFit
      // eigendecomposes on the driver; exact integers, fully oracled
      Embeddings.covarianceStats(t(s, dir, "embeddings"), "embedding",
          dim = 64, fxScale = 6)
        .orderBy("d", "e")),

    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextAnalysis.bpeishCount(col("text")).cast(LongType).as("n_bpeish"))
        .orderBy("doc_id")),

    "q_pack" -> ((s, dir) =>
      // sequence packing: two-phase distributed prefix sum (range partition
      // → per-partition totals cumulated on the driver → within-partition
      // window + broadcast offset), never a single-partition global window.
      // The oracle's naive global window computes the same unique prefix sums.
      Packing.packIndex(t(s, dir, "documents"), "doc_id", "text", budget = 128)
        .orderBy("doc_id")),

    "q_lm_perplexity" -> ((s, dir) =>
      // bigram-LM quality scoring; the gate compares the ORDER-INDEPENDENT
      // integer columns (fixed-point ln sums) — perplexity is a trivial
      // per-row derivation of the two
      TextAnalysis.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_bigrams", "sum_lnfx")
        .orderBy("doc_id")),

    "q_lang_margin" -> ((s, dir) =>
      // language-ID confidence: top/runner-up marker hits + margin +
      // mixed flag, one WordSetHits pass; the oracle ranks the same hit
      // counts by (hits DESC, lang ASC) — provably the fold's tie order
      TextAnalysis.langIdWithMargin(t(s, dir, "documents"), "text")
        .select("doc_id", "predicted_lang", "top_hits", "second_lang",
          "second_hits", "margin", "is_mixed")
        .orderBy("doc_id")),

    "q_dsir" -> { (s, dir) =>
      // DSIR importance weights vs the ≡0-mod-7 target subset: hashed
      // unigram+bigram models, quantized log-ratio table probed row-locally
      // — all-integer output, oracle rebuilds the models and every weight
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(docs, docs.where(col("doc_id") % 7 === 0),
        "doc_id", "text", buckets = 512, hasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_pipeline_pack" -> { (s, dir) =>
      // composition gate for the session's ops: deterministic split
      // assignment → length filter → sequence packing of the train split,
      // all ONE lazy plan; the oracle chains the same stages as CTEs
      val docs = t(s, dir, "documents")
      val withSplit = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), hasher = Shingles.md5Hash60)
      val train = withSplit.where(col("split") === "train" &&
        TextAnalysis.tokenCount(col("text")) >= 25)
      Packing.packIndex(train, "doc_id", "text", budget = 256).orderBy("doc_id")
    },

    "q_chunk" -> ((s, dir) =>
      // sliding-window chunking (20-token chunks, 5-token overlap):
      // row-local sequence-of-slices, one posexplode, no shuffle
      TextAnalysis.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 20, overlapTokens = 5)
        .orderBy("doc_id", "chunk_idx")),

    "q_chunk_sentences" -> { (s, dir) =>
      // sentence-boundary-aware chunking; the synthetic corpus carries no
      // punctuation, so the gate synthesizes it deterministically first
      // (every 'spark ' token ends a sentence, every 5-consecutive-word
      // run gets a period -> variable sentence lengths), then packs whole
      // sentences greedily into <=12-token chunks. The oracle replays the
      // same two regex rewrites and the greedy fold as a recursive CTE.
      val punct = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "spark ", "spark? "),
          "(\\w+ \\w+ \\w+ \\w+ \\w+) ", "$1. ").as("text"))
      TextAnalysis.chunkBySentences(punct, "doc_id", "text", maxTokens = 12)
        .orderBy("doc_id", "chunk_idx")
    },

    "q_bm25" -> ((s, dir) =>
      // retrieval scoring against a fixed query term set: corpus stats +
      // per-term dfs are bounded aggregates, scoring is row-local (one
      // WordSetHits pass); integer score column compared, bm25 derived
      TextAnalysis.bm25Score(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "data", "join"))
        .select("doc_id", "n_tokens", "score_fx")
        .orderBy("doc_id")),

    "q_inverted_topk" -> { (s, dir) =>
      // doc-to-doc sparse cosine retrieval through the inverted index:
      // postings join instead of dense all-pairs; integer-linear idf so
      // every dot/norm is an exact decimal sum the oracle replays
      val docs = t(s, dir, "documents")
      // maxDfPermille=1000: the synthetic corpus has a ~31-token vocabulary
      // (max df 402/500), so any df prune empties it; real corpora keep the
      // default 500 stopword guard
      TextAnalysis.invertedIndexTopK(docs, docs.where(col("doc_id") < 10),
          "doc_id", "text", k = 5, maxDfPermille = 1000)
        .orderBy("query_id", "rank")
    },

    "q_shard" -> { (s, dir) =>
      // rendezvous sharding of customers over 5 shards: argmax of
      // hash(key, shard) — the oracle replays the same md5-60 race
      Sampling.rendezvousShard(t(s, dir, "customer"), "c_custkey",
        (0 until 5).map(i => s"s$i"), hasher = Shingles.md5Hash60)
        .select(col("c_custkey").as("id"), col("shard"))
        .orderBy("id")
    },

    "q_snm_pairs" -> { (s, dir) =>
      // sorted-neighborhood ER blocking over customer names: global rank
      // via the two-phase prefix discipline, window-5 successor pairs —
      // the oracle replays ranks with a plain global row_number
      Joins.sortedNeighborhoodPairs(t(s, dir, "customer"), "c_custkey",
        col("c_name"), window = 5)
        .orderBy("rank_a", "rank_b")
    },

    "q_jaro_pairs" -> { (s, dir) =>
      // Jaro-Winkler name scoring over SNM-blocked candidates — the
      // name-matcher tier of the linkage family (LevenshteinK is typo
      // DISTANCE; JW weights shared prefixes as names need). Native
      // codegen'd expression, bit-identical to DuckDB's builtin
      // (verified on 20k random pairs)
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      Joins.sortedNeighborhoodPairs(c, "id", col("name"), window = 5)
        .join(c.select(col("id").as("id_a"), col("name").as("n_a")), Seq("id_a"))
        .join(c.select(col("id").as("id_b"), col("name").as("n_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.JaroWinkler.sim(col("n_a"), col("n_b")).as("jw"))
        .where(col("jw") >= 0.9)
        .orderBy("id_a", "id_b")
    },

    "q_er_pipeline" -> { (s, dir) =>
      // entity-resolution composition: sorted-neighborhood candidates →
      // levenshtein≤1 verification → connected components → canonical
      // record per cluster, ONE lazy plan over composed oracled operators
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val cand = Joins.sortedNeighborhoodPairs(c, "id", col("name"), window = 5)
      val edges = cand
        .join(c.select(col("id").as("id_a"), col("name").as("n_a")), Seq("id_a"))
        .join(c.select(col("id").as("id_b"), col("name").as("n_b")), Seq("id_b"))
        .where(expr("levenshtein(n_a, n_b) <= 1"))
        .select("id_a", "id_b")
      Components.connectedComponents(c.select("id"), "id", edges, "id_a", "id_b")
        .groupBy("component")
        .agg(count(lit(1)).cast(LongType).as("n_members"),
          min(col("id")).as("canonical"), max(col("id")).as("max_id"))
        .where(col("n_members") > 1)
        .orderBy("component")
    },

    "q_cdc_roundtrip" -> { (s, dir) =>
      // composition gate: snapshotDiff → changeFeed → applyChanges must
      // reproduce the new snapshot EXACTLY; the oracle builds the new
      // snapshot directly — equality proves the round-trip identity
      val old = t(s, dir, "documents").select("doc_id", "text")
      val newSnap = old.where(col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 5)
        .unionByName(old.where(col("doc_id") % 10 === 5)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text")))
        .unionByName(old.where(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
      val feed = Delta.changeFeed(old, newSnap, "doc_id", "text", Seq("text"))
      Delta.applyChanges(old, feed, "doc_id", "seq", "op", Seq("text"))
        .select(col("doc_id"), Shingles.md5Hash60(col("text")).as("text_h"))
        .orderBy("doc_id")
    },

    "q_rproject" -> { (s, dir) =>
      // JL random projection 64 → 8 dims: deterministic md5-parity sign
      // matrix, exact ±sums of scale-6 fixed-point longs — the oracle
      // rebuilds signs and projections from the same rule
      Embeddings.randomProject(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, inDim = 64).orderBy("id", "dim_out")
    },

    "q_rrf" -> { (s, dir) =>
      // reciprocal rank fusion of two genuinely different rankings per
      // query: sparse-cosine retrieval (inverted index) + a length-
      // similarity ranking; integer contributions scale div (rank+60)
      val docs = t(s, dir, "documents")
      val a = TextAnalysis.invertedIndexTopK(docs, docs.where(col("doc_id") < 10),
          "doc_id", "text", k = 5, maxDfPermille = 1000)
        .select("query_id", "doc_id", "rank")
      val q = docs.where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("n_chars").as("qn"))
      val cand = q.crossJoin(docs.select(col("doc_id"), col("n_chars")))
        .where(col("doc_id") =!= col("query_id"))
        .withColumn("dd", abs(col("n_chars") - col("qn")))
      val w = Window.partitionBy("query_id").orderBy(col("dd").asc, col("doc_id").asc)
      val b = cand.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5).select("query_id", "doc_id", "rank")
      TextAnalysis.rrfFuse(Seq(a, b), kConst = 60, topK = 8)
        .orderBy("query_id", "fused_rank")
    },

    "q_pagerank" -> { (s, dir) =>
      // integer-arithmetic PageRank over a graph derived from orders
      // (customer-block → order-block links): truncating long division is
      // part of the definition, so 5 rounds reproduce bit-identically in
      // any engine — the oracle unrolls the same 5 steps as CTEs
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 500).as("src"),
        (col("o_orderkey") % 500).as("dst")).distinct()
      Components.pageRank(s.range(500).toDF("id"), "id", edges, "src", "dst",
        iterations = 5).orderBy("id")
    },

    "q_ewma" -> ((s, dir) =>
      // replayable integer EWMA (alpha = 3/10) per user over event values;
      // the oracle refolds the identical recurrence via list_reduce
      Outliers.ewma(t(s, dir, "events"), Seq("user_id"), "event_id", "value",
        alphaNum = 3, alphaDen = 10)
        .orderBy("user_id")),

    "q_holt" -> ((s, dir) =>
      // Holt level+trend (alpha 3/10, beta 2/10) per user over the event
      // stream; the oracle refolds the identical array-state recurrence
      // via list_reduce over list accumulators
      Outliers.holt(t(s, dir, "events"), Seq("user_id"), "event_id", "value",
        alphaNum = 3, alphaDen = 10, betaNum = 2, betaDen = 10)
        .select("user_id", "n", "level_fx", "trend_fx", "level", "forecast")
        .orderBy("user_id")),

    "q_holt_winters" -> ((s, dir) =>
      // Holt-Winters ADDITIVE seasonal (period 4, alpha 3/10, beta 2/10,
      // gamma 5/10) per user: level + trend + a 4-slot cycle the plain
      // Holt reads as trend; seasons split into scalar columns for the
      // driver hash, oracle refolds the identical (3+m)-long list state
      Outliers.holtWinters(t(s, dir, "events"), Seq("user_id"), "event_id",
          "value", period = 4, alphaNum = 3, alphaDen = 10,
          betaNum = 2, betaDen = 10, gammaNum = 5, gammaDen = 10)
        .select(col("user_id"), col("n"), col("level_fx"), col("trend_fx"),
          expr("element_at(season_fx, 1)").as("s0"),
          expr("element_at(season_fx, 2)").as("s1"),
          expr("element_at(season_fx, 3)").as("s2"),
          expr("element_at(season_fx, 4)").as("s3"),
          col("level"), col("forecast"))
        .orderBy("user_id")),

    "q_cusum" -> ((s, dir) =>
      // two-sided CUSUM per user over the event stream: prefix-sum +
      // running-min windows (group-bounded), all-integer statistics
      Outliers.cusum(t(s, dir, "events"), Seq("user_id"), "event_id", "value",
        target = 60.0, slack = 10.0, threshold = 500.0)
        .select("user_id", "event_id", "s_up", "s_dn", "alarm_up", "alarm_dn")
        .orderBy("user_id", "event_id")),

    "q_kcore" -> { (s, dir) =>
      // 6-core of the (sparsified) part co-purchase graph: peeling runs 4
      // rounds at sf0.01; the 8-round cap makes Spark ≡ the unrolled
      // 8-round oracle at ANY scale (converged rounds are identity)
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = l.as("x").join(l.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .where(((col("x.pk") + col("y.pk")) % 11) === 0)
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      Components.kCore(e, "src", "dst", k = 6, maxRounds = 8).orderBy("node")
    },

    "q_triangles" -> { (s, dir) =>
      // per-node triangle counts over the mod-200 orders graph —
      // degree-ordered wedge generation, closed against canonical edges;
      // the oracle counts the same triangles via a 3-way self-join
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.triangleCounts(edges, "src", "dst").orderBy("node")
    },

    "q_clustering" -> { (s, dir) =>
      // local clustering coefficient on the same mod-200 graph as
      // q_triangles: cc = 2T/(d(d−1)) — density where raw triangle counts
      // blur hubs vs cliques; one exact-integer double tree per node
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.clusteringCoefficients(edges, "src", "dst").orderBy("node")
    },

    "q_assortativity" -> { (s, dir) =>
      // degree assortativity of the mod-200 graph: Pearson r of endpoint
      // degrees over symmetrized edges — like-to-like vs hub-to-leaf
      // wiring in one sign; exact decimal co-moments, one double tree
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.degreeAssortativity(edges, "src", "dst")
    },

    "q_ppr" -> { (s, dir) =>
      // PERSONALIZED PageRank: teleport only to the ≡0-mod-10 seed nodes —
      // rank = link-proximity to the seed set; same unrolled integer rounds
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 500).as("src"),
        (col("o_orderkey") % 500).as("dst")).distinct()
      val nodes = s.range(500).toDF("id")
      Components.personalizedPageRank(nodes, "id", edges, "src", "dst",
        seeds = nodes.where(col("id") % 10 === 0), iterations = 5)
        .orderBy("id")
    },

    "q_wpagerank" -> { (s, dir) =>
      // WEIGHTED PageRank over the supplier→part shipment graph: edge
      // weight = shipment multiplicity (the multigraph collapsed to
      // integer weights); contributions (pr·w) div Σw — truncating
      // division is the definition, oracle unrolls the same 5 rounds
      val l = t(s, dir, "lineitem")
      val edges = l.groupBy((col("l_suppkey") % 300).as("src"),
          (col("l_partkey") % 300).as("dst"))
        .agg(count(lit(1)).as("w"))
      Components.weightedPageRank(s.range(300).toDF("id"), "id", edges,
        "src", "dst", "w", iterations = 5).orderBy("id")
    },

    "q_cooc" -> { (s, dir) =>
      // co-purchase graph: parts (mod 150) co-occurring in an order become
      // weighted edges; count >= 2 prunes one-off pairs
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), (col("l_partkey") % 150).as("i"))
      Components.coOccurrence(l, "k", "i", maxKeyItems = 50, minCount = 2)
        .orderBy("item_a", "item_b")
    },

    "q_bfs" -> { (s, dir) =>
      // multi-source BFS: hop distance from the ≡0-mod-25 seed set along
      // the directed mod-400 order graph, 4 relaxation rounds; unreached
      // nodes stay NULL
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 400).as("src"),
        (col("o_orderkey") % 400).as("dst")).distinct()
      val nodes = s.range(400).toDF("id")
      Components.bfsDistances(nodes, "id", edges, "src", "dst",
        seeds = nodes.where(col("id") % 25 === 0), maxHops = 4)
        .orderBy("id")
    },

    "q_communities" -> { (s, dir) =>
      // deterministic synchronous label propagation (4 fixed rounds,
      // smallest-label ties) over the mod-300 order graph; the oracle
      // replays the identical rounds with window-ranked argmax
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 300).as("src"),
        (col("o_orderkey") % 300).as("dst")).distinct()
      Components.labelPropagation(s.range(300).toDF("id"), "id", edges,
        "src", "dst", iterations = 4).orderBy("id")
    },

    "q_hits" -> { (s, dir) =>
      // HITS hubs/authorities over the customer→order graph: L∞-normalized
      // integer rounds (truncating division is the definition); the oracle
      // unrolls the same 5 rounds with HUGEINT intermediates
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 400).as("src"),
        (col("o_orderkey") % 400).as("dst")).distinct()
      Components.hits(s.range(400).toDF("id"), "id", edges, "src", "dst",
        iterations = 5).orderBy("id")
    },

    "q_split_time" -> { (s, dir) =>
      // chronological split with a 3-day embargo purge at Jan 20: integer
      // counts + exact id-sum checksums per side; embargo rows NULL
      Sampling.assignSplitByTime(t(s, dir, "events"), "ts",
          java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), embargo = "3 days")
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).cast(LongType).as("ck"))
        .orderBy(col("split").asc_nulls_first)
    },

    "q_sample_weighted" -> { (s, dir) =>
      // Efraimidis–Spirakis weighted sample w/o replacement, k smallest
      // exponential-race priorities — TakeOrderedAndProject, no shuffle;
      // the fixed-point priority column makes selection auditable
      val out = Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
        col("n_chars"), k = 50, hasher = Shingles.md5Hash60)
      out.select(col("doc_id"),
          graft.metrics.MetricColumns.fixedPointLong(col("__pri"), 9).as("pri_fx"))
        .orderBy("doc_id")
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

    "q_trend" -> ((s, dir) =>
      // per-group OLS: price-vs-quantity slope/intercept per return flag
      // from decimal-exact co-moments, one grouped aggregate
      Correlation.trendByGroup(t(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    "q_mutual_info" -> { (s, dir) =>
      // entropy/MI on the same two categorical pairs as q_cramers_v — the
      // information-theoretic reading of the same contingency cells
      Correlation.mutualInfo(t(s, dir, "orders"),
        Seq("o_orderstatus" -> "o_orderpriority"))
        .unionAll(Correlation.mutualInfo(t(s, dir, "lineitem"),
          Seq("l_returnflag" -> "l_linestatus")))
        .orderBy("pair")
    },

    "q_cramers_v" -> { (s, dir) =>
      // categorical association: order status~priority (near-independent)
      // and returnflag~linestatus (strongly dependent — both track
      // shipdate); χ² via order-free fixed-point cell terms
      Correlation.cramersV(t(s, dir, "orders"),
        Seq("o_orderstatus" -> "o_orderpriority"))
        .unionAll(Correlation.cramersV(t(s, dir, "lineitem"),
          Seq("l_returnflag" -> "l_linestatus")))
        .orderBy("pair")
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

    "q_text_fold" -> { (s, dir) =>
      // canonical folding on derived accent/case variants of customer
      // names: the oracle folds with lower+strip_accents+nfc_normalize
      val v = expr("""CASE CAST(c_custkey % 4 AS INT)
        WHEN 0 THEN concat('Café ', c_name)
        WHEN 1 THEN concat('ÜBER ', c_name)
        WHEN 2 THEN concat('naïve—', c_name)
        ELSE upper(c_name) END""")
      t(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          graft.functions.TextFold.fold(v).as("folded"))
        .orderBy("id")
    },

    "q_html_text" -> { (s, dir) =>
      // HTML-to-text strip over messy pages synthesized in-gate around the
      // real document bodies: doctype, style/script blocks (with '<'/'>'
      // inside), comments, mixed-case tags, entities (incl. double-encoded
      // &amp;amp; and an unknown &unknown; kept literal), an unterminated
      // comment tail every 17th doc and an unterminated script every 13th.
      // The oracle replays the DEFINING regexp chain (HtmlText scaladoc);
      // the native scanner is spec'd equivalent to that chain.
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          graft.functions.HtmlText.htmlText(syntheticHtml).as("text_clean"))
        .orderBy("doc_id")
    },

    "q_html_quality" -> { (s, dir) =>
      // the web-pipeline composition end-to-end: HTML strip FEEDING the
      // quality features — the order every crawled-corpus pipeline runs
      // them in; the oracle chains the defining regexp chain into the
      // q_text_quality feature SQL
      val docs = t(s, dir, "documents")
      val cleaned = docs.select(col("doc_id"),
        graft.functions.HtmlText.htmlText(syntheticHtml).as("text"))
      TextAnalysis.qualityFeatures(cleaned, "text")
        .select("doc_id", "n_tokens", "alpha_chars", "stopword_hits",
          "avg_token_len", "stopword_ratio")
        .orderBy("doc_id")
    },

    "q_selfrep" -> { (s, dir) =>
      // in-document repeated-unit removal: pages synthesized to repeat
      // their own chrome (cookie banner between sections, doubled
      // subscribe block, blank-line runs, a trailing prefix echo that
      // only collides for short docs — the rule decides, not the gate)
      val docs = t(s, dir, "documents")
      val t2 = concat(
        substring(col("text"), 1, 100), lit("\nCOOKIE NOTICE\n"),
        substring(col("text"), 101, 100),
        lit("\nCOOKIE NOTICE\nsubscribe now\nsubscribe now\n\n\n"),
        substring(col("text"), 1, 40))
      Dedup.dropRepeatedUnitsInDoc(docs.select(col("doc_id"), t2.as("t2")), "t2")
        .select("doc_id", "text_clean", "n_units", "n_dropped")
        .orderBy("doc_id")
    },

    "q_text_clean" -> { (s, dir) =>
      // control/zero-width hygiene: C0 controls, DEL, CRLF/lone-CR line
      // endings, the zero-width family and NBSP injected around real text;
      // the oracle replays the identical RE2-safe regexp chain
      val docs = t(s, dir, "documents")
      val noisy = concat(
        lit("a\u0007b\r\nc\rd"), substring(col("text"), 1, 60),
        lit("e\u200Bf\u200Cg\u200Dh\uFEFFi\u00A0j\u001Fk\u007Fl\tm\n end"))
      docs.select(col("doc_id"),
          TextAnalysis.cleanText(noisy).as("cleaned"))
        .orderBy("doc_id")
    },

    "q_mojibake" -> { (s, dir) =>
      // double-encoded-UTF-8 repair: the gate GARBLES real text plus an
      // accent/cp1252 literal by the exact mis-decoding crawlers commit
      // (UTF-8 bytes read back as Latin-1 — built-in encode/decode, no
      // custom fixture files), repairs it with the native expression, and
      // the oracle simply rebuilds the ORIGINAL — repair must invert the
      // garbling bit-for-bit. n_bad (sequences decoded) cross-checks as
      // the original's non-ASCII codepoint count.
      val docs = t(s, dir, "documents")
      val orig = concat(substring(col("text"), 1, 80),
        lit(" café naïve piñata — “smart” ‘quotes’ … €9 Ÿ end"))
      val garbled = decode(encode(orig, "UTF-8"), "ISO-8859-1")
      docs.select(col("doc_id"),
          graft.functions.Mojibake.fix(garbled).as("fixed"),
          graft.functions.Mojibake.count(garbled).as("n_bad"))
        .orderBy("doc_id")
    },

    "q_record_linkage" -> { (s, dir) =>
      // Fellegi-Sunter-shape entity resolution on customers: fuzzy name +
      // exact segment/nation agreements, integer log-odds weights; blocked
      // on the 16-char name prefix like q_fuzzy_join
      val c = t(s, dir, "customer").withColumn("blk", expr("substr(c_name, 1, 16)"))
      Joins.linkagePairs(c, "c_custkey", Seq("blk"), Seq(
        Joins.LinkField("c_name", 4000L, -1000L, maxDist = 1),
        Joins.LinkField("c_mktsegment", 1000L, -500L),
        Joins.LinkField("c_nationkey", 800L, -400L)), minScoreFx = 4000L)
        .orderBy("id_a", "id_b")
    },

    "q_fuzzy_join" -> { (s, dir) =>
      // blocked edit-distance self-join (entity resolution): near-identical
      // customer names within a 16-char-prefix block; lossless length
      // prefilter before the codegen'd levenshtein
      val c = t(s, dir, "customer").withColumn("blk", substring(col("c_name"), 1, 16))
      Joins.fuzzyPairs(c, "c_custkey", "c_name", Seq("blk"), maxDist = 1)
        .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
    },

    "q_psi" -> { (s, dir) =>
      // distribution drift: PSI of l_extendedprice between early and late
      // ship dates; per-bucket fixed-point contributions (integer rows)
      val li = t(s, dir, "lineitem")
      val cut = lit("1996-01-01").cast(TimestampType)
      graft.scan.Drift.psiBuckets(
        li.where(col("l_shipdate") < cut), li.where(col("l_shipdate") >= cut),
        "l_extendedprice", lo = 900.0, hi = 105000.0, buckets = 10)
        .orderBy("bucket")
    },

    "q_lm_cross" -> { (s, dir) =>
      // cross-batch LM scoring: model trained on the "store" batch
      // (doc_id % 3 != 0), a fresh batch scored against it — unseen
      // bigrams/contexts take the same Laplace estimate with zero counts.
      // The artifact round-trip itself is spec-tested (LmSplitSpec).
      val docs = t(s, dir, "documents")
      val lm = TextAnalysis.trainBigramLm(docs.where(col("doc_id") % 3 =!= 0), "text")
      TextAnalysis.scoreWithBigramLm(docs.where(col("doc_id") % 3 === 0), "doc_id", "text", lm)
        .select("doc_id", "n_bigrams", "sum_lnfx").orderBy("doc_id")
    },

    "q_token_entropy" -> ((s, dir) =>
      // row-local run-length entropy: Spark never shuffles a (doc, token)
      // pair; the oracle re-derives the same counts via explode + GROUP BY
      TextAnalysis.tokenEntropy(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "sum_clnc_fx")
        .orderBy("doc_id")),

    "q_json_props" -> ((s, dir) =>
      // semi-structured extraction: parse the JSON props column row-locally
      // (codegen'd get_json_object — no UDF), aggregate per event type
      t(s, dir, "events").select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), count(col("k")).as("k_cnt"),
          sum("k").as("k_sum"), min("k").as("k_min"), max("k").as("k_max"))
        .orderBy("event_type")),

    "q_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "alpha_chars", "stopword_hits", "avg_token_len", "stopword_ratio")
        .orderBy("doc_id")),

    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"), "text")
        .select("doc_id", "predicted_lang").orderBy("doc_id")),

    "q_lang_scores" -> { (s, dir) =>
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenHits(txt, TextAnalysis.langMarkers("en")).cast(LongType).as("hits_en"),
        TextAnalysis.tokenHits(txt, TextAnalysis.langMarkers("es")).cast(LongType).as("hits_es"))
        .orderBy("doc_id")
    },

    "q_fingerprint" -> ((s, dir) =>
      // md5-hex winnowing fingerprint, posexploded to scalar rows so the
      // harness can compare; oracled bit-for-bit in DuckDB (shared md5).
      TextAnalysis.fingerprintHex(t(s, dir, "documents"), "text")
        .select(col("doc_id"), posexplode(col("fingerprint")).as(Seq("pos", "fp_hash")))
        .orderBy("doc_id", "pos")),

    "q_fingerprint_xx" -> ((s, dir) =>
      // PRODUCTION-hash twin of q_fingerprint: codegen'd xxhash64 winnowing
      // (~20× cheaper than md5+hex per shingle; rows-only — see
      // q_dedup_minhash_xx)
      TextAnalysis.fingerprint(t(s, dir, "documents"), "text")
        .select(col("doc_id"), posexplode(col("fingerprint")).as(Seq("pos", "fp_hash")))
        .orderBy("doc_id", "pos")),

    "q_multimodal" -> { (s, dir) =>
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "text/plain")
      Multimodal.decodeFeatures(s, media)
        .select(col("id"), col("n_bytes"), col("first_byte")).orderBy("id")
    },

    "q_video_shots" -> { (s, dir) =>
      import s.implicits._
      // video keyframe plumbing end-to-end from the BYTES up: one GVID
      // container per 20th order, one 9x8 grayscale BMP frame per lineitem
      // (Weyl-style multiplicative pixel field seeded by the price cents;
      // 9x8 makes the dHash grid sample pixels 1:1) -> parse + per-frame
      // dHash + consecutive-frame Hamming -> shot ids. The oracle
      // re-derives every dHash comparison from the same integer pixel
      // formula, so boundaries verify cross-engine bit-exactly.
      val seeds = t(s, dir, "lineitem").where(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("vid"),
          struct(col("l_linenumber"),
            (MetricColumns.fixedPointLong(col("l_extendedprice"), 2) % 256)
              .cast(IntegerType).as("s")).as("fs"))
        .groupBy("vid").agg(sort_array(collect_list(col("fs"))).as("fs"))
      val media = seeds.as[(Long, Seq[(Int, Int)])].map { case (vid, fs) =>
        val frames = fs.map { case (_, seed) =>
          Multimodal.Codecs.grayBmp(9, 8, (x, y) =>
            (((seed.toLong * 72 + y * 9 + x + 1) * 2654435761L) % 256).toInt)
        }
        Multimodal.MediaRow(vid, Multimodal.Video.pack(frames), "video/gvid")
      }.toDF()
      Multimodal.shotBoundaries(s, media, maxHamming = 20)
        .select(col("id").as("video_id"), col("frame_idx"), col("hamming_prev"),
          col("is_boundary"), col("shot_id"))
        .orderBy("video_id", "frame_idx")
    },

    "q_window_events" -> ((s, dir) =>
      Windows.tumbling(t(s, dir, "events"), "ts", "event_type", "value", "1 hour")
        .orderBy("window_start", "event_type")),

    "q_window_sliding" -> ((s, dir) =>
      // 1-hour windows every 15 minutes: each event lands in exactly 4
      // windows; the oracle reproduces the epoch-aligned slide grid
      Windows.sliding(t(s, dir, "events"), "ts", "event_type", "value",
        "1 hour", "15 minutes")
        .orderBy("window_start", "event_type")),

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

    "q_sessionize" -> ((s, dir) =>
      Windows.sessionizeBatch(t(s, dir, "events"), "ts", "user_id", gapSeconds = 1800)
        .orderBy("user_id", "session_id")),

    "q_stream_quality" -> { (s, dir) =>
      val cols = Seq(
        "value" -> ColumnConfig(validMin = Some(0.0), validMax = Some(150.0)),
        "event_type" -> ColumnConfig(validValues = Seq("click", "view", "purchase", "signup")))
      graft.streaming.StreamingMonitor.qualityByWindow(t(s, dir, "events"), "ts", "1 hour", cols)
        .orderBy("window_start")
    },

    "q_quality_by_dim" -> { (s, dir) =>
      val cols = Seq("c_acctbal" -> ColumnConfig(validMin = Some(0.0)))
      graft.streaming.StreamingMonitor.qualityByDimension(t(s, dir, "customer"), "c_mktsegment", cols)
        .orderBy("c_mktsegment")
    }
  )

  // ==================================================================
  // DuckDB oracles (identical expression trees; see SURVEY.md §3)
  // ==================================================================

  /** Shared md5-60-bit token hash (see graft.ops.Shingles.md5Hash60). */
  /** Deterministic messy-URL synthesis for the URL/domain gates — one
    * expression over `documents` (doc_id, lang, source), mirrored verbatim
    * by [[urlSqlPrefix]] so both engines derive the identical url column.
    */
  /** Deterministic messy-HTML synthesis for the HTML gates, mirrored by
    * [[htmlSqlCte]]: doctype, style/script blocks (with inner `<`/`>`),
    * comments, mixed-case tags, entity soup, unterminated tails.
    */
  private def syntheticHtml: Column = concat(
    lit("<!DOCTYPE html><html><head><title>T</title>"),
    lit("<STYLE type=\"text/css\">body { color: #fff; }</STYLE>"),
    lit("<script src=\"a.js\">if (a<b && c>d) { alert(\"x\"); }</script>"),
    lit("<!-- crawler note "), col("source"), lit(" -->"),
    lit("<body class=\"doc\"><h1>Doc</h1><P>"),
    substring(col("text"), 1, 160),
    lit("</p><p>A &amp;amp; B &lt;tag&gt; says &quot;hi&quot; " +
      "&apos;q&apos; &#39;z&#39;&nbsp;end&unknown;</p>"),
    when(col("doc_id") % 17 === 0, lit("<!-- unterminated trail"))
      .otherwise(lit("")),
    when(col("doc_id") % 13 === 0, lit("<script>var dangling = 1;"))
      .otherwise(lit("")),
    lit("</body></html>"))

  /** DuckDB twin of [[syntheticHtml]] + the defining strip chain, as CTEs
    * ending in `cleaned(doc_id, text_clean)`. Lines must survive a second
    * outer stripMargin (no leading-whitespace-then-pipe lines).
    */
  private def htmlSqlCte: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<!DOCTYPE html><html><head><title>T</title>' ||
      |    '<STYLE type="text/css">body { color: #fff; }</STYLE>' ||
      |    '<script src="a.js">if (a<b && c>d) { alert("x"); }</script>' ||
      |    '<!-- crawler note ' || source || ' -->' ||
      |    '<body class="doc"><h1>Doc</h1><P>' ||
      |    substr(text, 1, 160) ||
      |    '</p><p>A &amp;amp; B &lt;tag&gt; says &quot;hi&quot; &apos;q&apos; &#39;z&#39;&nbsp;end&unknown;</p>' ||
      |    (CASE WHEN doc_id % 17 = 0 THEN '<!-- unterminated trail' ELSE '' END) ||
      |    (CASE WHEN doc_id % 13 = 0 THEN '<script>var dangling = 1;' ELSE '' END) ||
      |    '</body></html>' AS html
      |  FROM documents),
      |cleaned AS (
      |  SELECT doc_id,
      |  trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(replace(
      |      regexp_replace(
      |        regexp_replace(html,
      |          '(?is)<!--.*?(-->|$)|<script[^>]*>.*?(</script[^>]*>|$)|<style[^>]*>.*?(</style[^>]*>|$)',
      |          '', 'g'),
      |        '(?s)<[^<>]*>', ' ', 'g'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
      |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
      |    '[ \t\n\r\f]+', ' ', 'g'), ' ') AS text_clean
      |  FROM h)""".stripMargin

  private def syntheticUrl: Column = syntheticUrlWithPath(
    concat(lit("/docs/"), col("doc_id")))

  /** `pathExpr` variant — the dedup gate collides paths on doc_id % 50 so
    * distinct RAW urls (case/port/tracking/fragment noise) share canonicals.
    */
  private def syntheticUrlWithPath(pathExpr: Column): Column = {
    val m3 = col("doc_id") % 3
    val m4 = col("doc_id") % 4
    val m5 = col("doc_id") % 5
    val m6 = col("doc_id") % 6
    val scheme = when(m3 === 0, "http").when(m3 === 1, "HTTPS").otherwise("https")
    val suffix = when(m5 === 0, ".co.uk").when(m5 === 1, ".com")
      .when(m5 === 2, ".org.au").when(m5 === 3, ".io").otherwise(".gov.in")
    val host = concat(
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("lang"), lit("-"), col("source"), suffix)
    val port = when(m4 === 0, ":80").when(m4 === 1, ":443")
      .when(m4 === 2, ":8080").otherwise(lit(""))
    val qs = when(m6 === 0,
        concat(lit("?utm_source=feed&id="), col("doc_id") % 100, lit("&fbclid=xyz")))
      .when(m6 === 1, concat(lit("?id="), col("doc_id") % 100, lit("&utm_medium=email")))
      .when(m6 === 2, lit("?gclid=abc"))
      .otherwise(lit(""))
    val frag = when(m5 === 1, lit("#section-2")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, pathExpr, qs, frag)
  }

  /** DuckDB twin of [[syntheticUrl]] + the full canonicalization chain, as
    * CTEs ending in `canon(doc_id, url, scheme, host, portout, path, cq)`.
    */
  private def urlSqlPrefix: String = {
    val suffixIn = graft.ops.Urls.MultiPartSuffixes.map(s => s"'$s'").mkString(", ")
    // NOTE: consuming oracle entries interpolate this prefix and then call
    // .stripMargin on the WHOLE string, so no line here may begin with
    // whitespace + '|' — concatenation operators stay at line ends.
    s"""WITH u AS (
       |  SELECT doc_id,
       |    (CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS' ELSE 'https' END) ||
       |    '://' || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
       |    lang || '-' || source ||
       |    (CASE doc_id % 5 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
       |        WHEN 2 THEN '.org.au' WHEN 3 THEN '.io' ELSE '.gov.in' END) ||
       |    (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
       |        WHEN 2 THEN ':8080' ELSE '' END) ||
       |    '/docs/' || doc_id ||
       |    (CASE doc_id % 6
       |        WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 100) || '&fbclid=xyz'
       |        WHEN 1 THEN '?id=' || (doc_id % 100) || '&utm_medium=email'
       |        WHEN 2 THEN '?gclid=abc' ELSE '' END) ||
       |    (CASE WHEN doc_id % 5 = 1 THEN '#section-2' ELSE '' END) AS url
       |  FROM documents),
       |q1 AS (
       |  SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u1 FROM u),
       |q2 AS (
       |  SELECT doc_id, url, u1,
       |    lower(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(u1, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM q1),
       |q3 AS (
       |  SELECT doc_id, url, scheme,
       |    regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
       |    regexp_replace(rest, '^[^/?]*', '') AS pathq
       |  FROM q2),
       |q4 AS (
       |  SELECT doc_id, url, scheme,
       |    regexp_replace(lower(regexp_replace(hostport, ':[0-9]+${"$"}', '')), '\\.${"$"}', '') AS host,
       |    regexp_extract(hostport, ':([0-9]+)${"$"}', 1) AS port,
       |    regexp_extract(pathq, '^([^?]*)', 1) AS path,
       |    regexp_extract(pathq, '[?](.*)', 1) AS qstr
       |  FROM q3),
       |canon AS (
       |  SELECT doc_id, url, scheme, host, path,
       |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |              OR (scheme = 'https' AND port = '443')
       |         THEN '' ELSE ':' || port END AS portout,
       |    array_to_string(list_filter(string_split(qstr, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x,
       |        '${graft.ops.Urls.TrackingParamPattern}')), '&') AS cq
       |  FROM q4),
       |dom AS (
       |  SELECT doc_id, url, scheme, host, portout, path, cq,
       |    string_split(host, '.') AS hp
       |  FROM canon),
       |dom2 AS (
       |  SELECT *, CASE
       |      WHEN regexp_matches(host, '^[0-9.]+${"$"}') THEN host
       |      WHEN len(hp) <= 2 THEN host
       |      WHEN (hp[-2] || '.' || hp[-1]) IN ($suffixIn)
       |        THEN hp[-3] || '.' || hp[-2] || '.' || hp[-1]
       |      ELSE hp[-2] || '.' || hp[-1] END AS domain
       |  FROM dom)""".stripMargin
  }

  private val duckTokenHash = "('0x' || substr(md5(t), 1, 15))::BIGINT"

  /** Squared-L2 between two subDim-element list slices, spelled as the
    * EXACT left-fold association Pq.sqDist uses (`(((0+d1)+d2)+…)`) so the
    * doubles match bit-for-bit.
    */
  private def pqDistSql(a: String, b: String, subDim: Int): String =
    (1 to subDim).foldLeft("0") { (acc, i) =>
      s"($acc + ($a[$i]-$b[$i])*($a[$i]-$b[$i]))" }

  /** Shared CTE prefix for the PQ oracles: doubles, subvectors (m×subDim),
    * the smallest-id seed codebook, and every vector's argmin codes.
    */
  private def pqCodesSqlPrefix(m: Int, c: Int, subDim: Int): String =
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |sv AS (SELECT vec_id, CAST(s AS INT) AS sub, v[(s*$subDim+1):((s+1)*$subDim)] AS sv
       |       FROM e, generate_series(0, ${m - 1}) t(s)),
       |cb AS (SELECT sub, CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS INT) AS code,
       |              sv AS cw
       |       FROM sv WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $c)),
       |a AS (SELECT s.vec_id, s.sub, c.code, ${pqDistSql("s.sv", "c.cw", subDim)} AS d
       |      FROM sv s JOIN cb c ON c.sub = s.sub),
       |codes AS (SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM a)
       |  WHERE rn = 1)""".stripMargin

  /** Shared CTE prefix for the IVFADC oracles: doubles, the smallest-id
    * coarse-cell codebook (`cc`), each vector's assigned cell + residual,
    * the smallest-id residual PQ codebook (`rcb`), and each vector's
    * per-subspace argmin codes — `codes` = (vec_id, cell, sub, code).
    * Replays IvfPq.trainCells/trainResidualCodebook/encode exactly.
    */
  private def ivfPqCodesSqlPrefix(ncells: Int, m: Int, c: Int, dim: Int): String = {
    val subDim = dim / m
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |cc AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS cw
       |       FROM e WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $ncells)),
       |ad AS (SELECT e.vec_id, cc.cell, ${pqDistSql("e.v", "cc.cw", dim)} AS d FROM e, cc),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM ad)
       |  WHERE rn = 1),
       |res AS (SELECT a.vec_id, a.cell, [e.v[i+1] - cc.cw[i+1] for i in range(0, $dim)] AS r
       |        FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN cc ON cc.cell = a.cell),
       |rsv AS (SELECT vec_id, cell, CAST(s AS INT) AS sub, r[(s*$subDim+1):((s+1)*$subDim)] AS sv
       |        FROM res, generate_series(0, ${m - 1}) t(s)),
       |rcb AS (SELECT sub, CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS INT) AS code,
       |               sv AS cw
       |        FROM rsv WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $c)),
       |a2 AS (SELECT r.vec_id, r.cell, r.sub, c.code, ${pqDistSql("r.sv", "c.cw", subDim)} AS d
       |       FROM rsv r JOIN rcb c ON c.sub = r.sub),
       |codes AS (SELECT vec_id, cell, sub, code FROM (
       |    SELECT vec_id, cell, sub, code,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM a2)
       |  WHERE rn = 1)""".stripMargin
  }

  /** The n-token shingle-string list of `string_split_regex(text,'\s+')` in
    * DuckDB — same semantics as Shingles.shingleStrings (shorter-than-n docs
    * yield one whole-text shingle).
    */
  private def duckShingles(n: Int): String =
    if (n == 1) "string_split_regex(text, '\\s+')"
    else s"""(CASE WHEN len(string_split_regex(text, '\\s+')) < $n
            | THEN [array_to_string(string_split_regex(text, '\\s+'), ' ')]
            | ELSE list_transform(range(1, len(string_split_regex(text, '\\s+')) - ${n - 2}),
            |        i -> array_to_string(string_split_regex(text, '\\s+')[i:i+${n - 1}], ' ')) END)"""
      .stripMargin.replace("\n", "")

  /** Full MinHash-LSH oracle: recompute the `numHashes` permutation minima
    * per doc from the md5-60 shingle hashes (same coefficients as
    * MinHashSignatureExpr), apply the same `bands`-band slice-equality
    * candidacy, then the same exact shingle-HASH-set jaccard >= threshold
    * verification (`shingleLen`=1 is the token set). `withJaccard` adds the
    * verified jaccard to the output.
    */
  private def minhashOracleSql(numHashes: Int, bands: Int, threshold: Double,
                               shingleLen: Int = 1, withJaccard: Boolean = false): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val jac = """CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) /
                |      CAST(len(da.toks) + len(db.toks) - len(list_intersect(da.toks, db.toks)) AS DOUBLE)"""
      .stripMargin
    val outCols = if (withJaccard) s"c.id_a, c.id_b, $jac AS jaccard" else "c.id_a, c.id_b"
    s"""WITH sh AS (SELECT doc_id, unnest(${duckShingles(shingleLen)}) AS t FROM documents),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
       |g AS (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
       |d AS (SELECT doc_id, list_distinct(list_transform(${duckShingles(shingleLen)},
       |        t -> $duckTokenHash)) AS toks FROM documents),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM g a JOIN g b ON a.doc_id < b.doc_id
       |         WHERE $bandClauses)
       |SELECT $outCols
       |FROM cand c JOIN d da ON da.doc_id = c.id_a JOIN d db ON db.doc_id = c.id_b
       |WHERE $jac >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q_dict_hits dictionary (shared by gate and oracle); multi-word phrases
    * and the self-overlapping "a a" exercise what replace-based counting
    * would miss. */
  private val DictPatterns =
    Seq("table", "fast sort", "a a", "scan", "value table part")

  private def dictHitsOracle: String = {
    val exprs = DictPatterns.zipWithIndex.map { case (p, i) =>
      val lp = p.length
      s"CAST(len(list_filter(range(1, len(text) - $lp + 2), i -> text[i:i + ${lp - 1}] = '$p')) AS INTEGER) AS n$i"
    }
    s"SELECT doc_id, ${exprs.mkString(", ")} FROM documents ORDER BY doc_id"
  }

  /** LSH tuning-audit oracle: deterministic bounded sample, exact jaccard
    * all-pairs ground truth, any-band signature collision flag, and the
    * same analytic S-curve literal computed by the same Scala function.
    */
  private def lshAuditOracleSql(numHashes: Int, bands: Int, threshold: Double,
                                sampleSize: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val pLit = Dedup.lshCollisionProb(threshold, bands, rows)
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    s"""WITH samp AS MATERIALIZED (SELECT doc_id, text FROM documents
       |  ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|lshaudit'), 1, 15))::BIGINT % 10000, doc_id
       |  LIMIT $sampleSize),
       |sh AS (SELECT doc_id, unnest(${duckShingles(1)}) AS t FROM samp),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
       |g AS MATERIALIZED (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
       |d AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(${duckShingles(1)},
       |        t -> $duckTokenHash)) AS toks FROM samp),
       |pr AS (SELECT
       |         CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) /
       |         CAST(len(da.toks) + len(db.toks) - len(list_intersect(da.toks, db.toks)) AS DOUBLE) AS j,
       |         ($bandClauses) AS cand
       |       FROM d da JOIN d db ON da.doc_id < db.doc_id
       |         JOIN g a ON a.doc_id = da.doc_id JOIN g b ON b.doc_id = db.doc_id),
       |m AS (SELECT
       |  CAST(count(CASE WHEN j >= $threshold THEN 1 END) AS BIGINT) AS true_pairs,
       |  CAST(count(CASE WHEN cand THEN 1 END) AS BIGINT) AS cand_pairs,
       |  CAST(count(CASE WHEN cand AND j >= $threshold THEN 1 END) AS BIGINT) AS hit_pairs
       |FROM pr)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM samp) AS sample_docs,
       |  true_pairs, cand_pairs, hit_pairs,
       |  CASE WHEN true_pairs > 0 THEN CAST(hit_pairs AS DOUBLE) / CAST(true_pairs AS DOUBLE) END AS recall,
       |  CASE WHEN cand_pairs > 0 THEN CAST(hit_pairs AS DOUBLE) / CAST(cand_pairs AS DOUBLE) END AS "precision",
       |  CAST('$pLit' AS DOUBLE) AS p_at_threshold
       |FROM m""".stripMargin
    // note the STRING cast: a bare decimal literal goes DECIMAL→DOUBLE in
    // DuckDB (two roundings, off by 1 ulp here); the varchar cast is strtod
  }

  /** Split-leakage oracle: the full MinHash pair oracle (jaccard included)
    * wrapped with the q_split_assign md5-bucket split formula applied to
    * both endpoints, keeping only cross-split pairs.
    */
  private def splitLeakageOracleSql(numHashes: Int, bands: Int, threshold: Double): String = {
    def bucket(id: String) =
      s"('0x' || substr(md5(CAST($id AS VARCHAR) || '|split'), 1, 15))::BIGINT % 10000"
    def splitCase(b: String) =
      s"CASE WHEN $b < 8000 THEN 'train' WHEN $b < 9000 THEN 'val' WHEN $b < 10000 THEN 'test' END"
    s"""WITH mh AS (${minhashOracleSql(numHashes, bands, threshold, shingleLen = 3, withJaccard = true)}),
       |lab AS (SELECT id_a, id_b, jaccard,
       |               ${splitCase(bucket("id_a"))} AS split_a,
       |               ${splitCase(bucket("id_b"))} AS split_b FROM mh)
       |SELECT id_a, id_b, jaccard, split_a, split_b FROM lab
       |WHERE split_a IS NOT NULL AND split_b IS NOT NULL AND split_a <> split_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Cross-run incremental dedup oracle: recompute both sides' signatures
    * from the shared md5-60 hashes, candidate on any-band equality, filter
    * on the signature estimate (agreeing components / numHashes).
    */
  private def incrementalDedupOracleSql(numHashes: Int, bands: Int,
                                        threshold: Double, shingleLen: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val estExpr = (0 until numHashes)
      .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sh AS (SELECT doc_id, unnest(${duckShingles(shingleLen)}) AS t FROM documents),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
       |g AS (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
       |cand AS (SELECT a.doc_id AS new_id, b.doc_id AS store_id,
       |                CAST($estExpr AS DOUBLE) / $numHashes.0 AS est
       |         FROM g a JOIN g b ON a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
       |         WHERE $bandClauses)
       |SELECT new_id, store_id, est FROM cand
       |WHERE est >= $threshold
       |ORDER BY new_id, store_id""".stripMargin
  }

  /** Full SimHash oracle: per-bit token-hash majorities → 60-bit signature →
    * exact hamming over ALL pairs (the Spark side's chunked candidacy is
    * recall-lossless for hamming <= maxHamming < nChunks, so brute force
    * produces the identical set).
    */
  private def simhashOracleSql(bits: Int, maxHamming: Int): String = {
    val bitSums = (0 until bits)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE 0 END) AS c$b").mkString(", ")
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN c$b * 2 > n THEN (1::BIGINT << $b) ELSE 0::BIGINT END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t FROM documents),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM tok),
       |s AS (SELECT doc_id, count(*) AS n, $bitSums FROM hh GROUP BY doc_id),
       |g AS (SELECT doc_id, $sigExpr AS sig FROM s)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM g a JOIN g b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Column-sketch oracle: the same `numHashes` permutation minima over the
    * md5-60 hashes of the column's values.
    */
  private def columnSketchOracleSql(numHashes: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val mins = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p)").mkString(", ")
    s"""WITH hh AS (SELECT ('0x' || substr(md5(o_orderpriority), 1, 15))::BIGINT AS h
       |            FROM orders WHERE o_orderpriority IS NOT NULL),
       |g AS (SELECT [$mins] AS sig FROM hh)
       |SELECT CAST(unnest(range(0, $numHashes)) AS INT) AS pos, unnest(sig) AS sig_value
       |FROM g ORDER BY pos""".stripMargin
  }

  /** Theta-sketch oracle: rebuild both KMV sketches from the shared md5-60
    * hashes, apply the identical theta rules (exclusive k-th-smallest
    * threshold, operations under min theta, union re-trim at overflow) and
    * the identical estimate division — see graft.functions.ThetaSketch.
    */
  /** DuckDB replay of the bottom-k-with-counts sketch + estimator for one
    * column: GROUP BY value-hash keeps retained counts exact, ORDER BY h
    * LIMIT k is the bottom-k, and the arithmetic mirrors
    * [[graft.functions.KmvCounts.estimates]] op for op.
    */
  private def approxDupOracleSql(k: Int, cols: Seq[String]): String = {
    val branches = cols.map { c =>
      s"""SELECT '$c' AS column_name, n AS retained,
         |       CASE WHEN n = 0 THEN 0.0
         |            WHEN n < $k THEN CAST(n AS DOUBLE)
         |            ELSE ${k - 1}.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0) END AS d,
         |       CAST(u AS DOUBLE) / CAST(n AS DOUBLE) AS fu,
         |       CAST(n - u AS DOUBLE) / CAST(n AS DOUBLE) AS fd
         |FROM (SELECT count(*) AS n, max(h) AS hk, count(*) FILTER (WHERE cnt = 1) AS u
         |      FROM (SELECT ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT AS h, count(*) AS cnt
         |            FROM orders WHERE $c IS NOT NULL GROUP BY 1 ORDER BY h LIMIT $k))""".stripMargin
    }
    s"""SELECT column_name, retained, d AS approx_distinct,
       |       d * fu AS approx_unique_count, d * fd AS approx_duplicate_count
       |FROM (${branches.mkString("\nUNION ALL\n")})
       |ORDER BY column_name""".stripMargin
  }

  /** Unrolled integer-arithmetic PageRank (one CTE per round) — DuckDB's
    * `//` and Spark's `div` truncate identically on non-negative longs.
    */
  /** Unrolled BPE training rounds as DuckDB CTEs — the same decomposition
    * as [[Bpe.train]]: wf0 = char-split word frequencies; per round r,
    * pair stats (parallel-unnest zip of the two shifted slices), the
    * lexicographic argmax, leftmost-greedy occurrence selection (islands of
    * consecutive positions keep odd ranks — exactly the scan semantics),
    * and the rebuilt symbol lists.
    */
  private def bpeOracleRounds(n: Int, pattern: String): String = {
    val base =
      s"""wf0 AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |         list_transform(range(1, length(word)+1), i -> substr(word, CAST(i AS INT), 1)) AS syms
         |  FROM (SELECT unnest(regexp_extract_all(lower(text), '$pattern')) AS word FROM documents)
         |  GROUP BY word)""".stripMargin
    val rounds = (1 to n).map { r =>
      val p = r - 1
      s"""pr$r AS (SELECT unnest(syms[1:len(syms)-1]) AS a, unnest(syms[2:len(syms)]) AS b, freq
         |  FROM wf$p WHERE len(syms) >= 2),
         |best$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM pr$r GROUP BY 1,2
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |occ$r AS (
         |  SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS rn
         |  FROM (SELECT word, unnest(range(1, len(syms))) AS i,
         |               unnest(syms[1:len(syms)-1]) AS sa, unnest(syms[2:len(syms)]) AS sb
         |        FROM wf$p WHERE len(syms) >= 2) o, best$r
         |  WHERE o.sa = best$r.a AND o.sb = best$r.b),
         |kept$r AS (
         |  SELECT word, i FROM (
         |    SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, i - rn ORDER BY i) AS rr
         |    FROM occ$r) WHERE rr % 2 = 1),
         |wf$r AS (
         |  SELECT e.word, any_value(e.freq) AS freq,
         |         list(CASE WHEN kj.i IS NOT NULL THEN e.sym || (SELECT b FROM best$r) ELSE e.sym END
         |              ORDER BY e.j) AS syms
         |  FROM (SELECT word, freq, unnest(range(1, len(syms)+1)) AS j, unnest(syms) AS sym FROM wf$p) e
         |  LEFT JOIN kept$r kj ON kj.word = e.word AND kj.i = e.j
         |  LEFT JOIN kept$r kp ON kp.word = e.word AND kp.i = e.j - 1
         |  WHERE kp.i IS NULL
         |  GROUP BY e.word)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  private def bpeMergesOracleSql(n: Int, pattern: String): String =
    s"WITH ${bpeOracleRounds(n, pattern)}\n" +
      (1 to n).map(r => s"SELECT $r AS mrank, a AS mleft, b AS mright, cnt FROM best$r")
        .mkString(" UNION ALL ") + " ORDER BY mrank"

  private def bpeTokensOracleSql(n: Int, pattern: String): String =
    s"WITH ${bpeOracleRounds(n, pattern)}\n" +
      s"SELECT token, CAST(sum(freq) AS BIGINT) AS cnt FROM " +
      s"(SELECT unnest(syms) AS token, freq FROM wf$n) GROUP BY 1 ORDER BY token"

  /** Unrolled fixed-point GD rounds for the linear probe oracle — same
    * dynamics as [[LinearProbe.train]]: HUGEINT gradient sums, truncating
    * `//` update (DuckDB `//` and Java `/` agree on truncation-toward-zero
    * for negatives — verified), weights as 1-row CTEs.
    */
  private def probeOracleRounds(rounds: Int, etaDen: Long): String = {
    val stopList = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
    val f =
      s"""f AS (SELECT doc_id,
         |  CAST(1 AS BIGINT) AS x0,
         |  least(len(string_split_regex(text, '\\s+')), 200) AS x1,
         |  least(len(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 6)), 200) AS x2,
         |  least(len(list_filter(string_split_regex(text, '\\s+'), t -> list_contains([$stopList], t))), 200) AS x3,
         |  least(n_chars, 2000) * ${graft.ops.LinearProbe.Scale} AS yfx
         |  FROM documents),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |              CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)""".stripMargin
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"""e$r AS (SELECT x0, x1, x2, x3,
         |              x0*w.w0 + x1*w.w1 + x2*w.w2 + x3*w.w3 - yfx AS e
         |       FROM f, w$p w),
         |g$r AS (SELECT sum(CAST(x0*e AS HUGEINT)) AS g0, sum(CAST(x1*e AS HUGEINT)) AS g1,
         |              sum(CAST(x2*e AS HUGEINT)) AS g2, sum(CAST(x3*e AS HUGEINT)) AS g3,
         |              count(*) AS n
         |       FROM e$r),
         |w$r AS (SELECT CAST(w.w0 - g.g0 // (g.n * $etaDen) AS BIGINT) AS w0,
         |              CAST(w.w1 - g.g1 // (g.n * $etaDen) AS BIGINT) AS w1,
         |              CAST(w.w2 - g.g2 // (g.n * $etaDen) AS BIGINT) AS w2,
         |              CAST(w.w3 - g.g3 // (g.n * $etaDen) AS BIGINT) AS w3
         |       FROM w$p w, g$r g)""".stripMargin
    }
    (f +: steps).mkString(",\n")
  }

  private def pageRankOracleSql(n: Int, iters: Int): String = {
    val initFx = 1000000000L / n
    val baseFx = (1000000000L * 15 / 100) / n
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT n.id, $baseFx + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, sum(p${i - 1}.pr // od.d) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN od ON e.src = od.src
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |n AS (SELECT unnest(range(0, $n)) AS id),
       |od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |p0 AS (SELECT id, $initFx AS pr FROM n),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(pr AS BIGINT) AS pr FROM p$iters ORDER BY id""".stripMargin
  }

  /** The q_inverted_topk CTE chain (postings, integer-linear idf, HUGEINT
    * dots/norms, ranked `r`) — shared verbatim by q_rrf's first ranking.
    */
  private val invertedTopkCtes: String =
    """tfd AS (SELECT did, token, count(*) AS tf FROM
      |        (SELECT doc_id AS did, unnest(string_split_regex(text, '\s+')) AS token
      |         FROM documents WHERE text IS NOT NULL) GROUP BY did, token),
      |nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
      |idf AS (SELECT token, (nn.n * 100) // df AS idf
      |        FROM (SELECT token, count(*) AS df FROM tfd GROUP BY token) d, nn
      |        WHERE d.df * 1000 <= nn.n * 1000),
      |dp AS (SELECT did, token, CAST(tf * idf AS HUGEINT) AS w FROM tfd JOIN idf USING (token)),
      |qp AS (SELECT did AS qid, token, w AS wq FROM dp WHERE did < 10),
      |nd AS (SELECT did, sum(w * w) AS n2d FROM dp GROUP BY did),
      |nq AS (SELECT qid, sum(wq * wq) AS n2q FROM qp GROUP BY qid),
      |dots AS (SELECT qp.qid, dp.did, sum(dp.w * qp.wq) AS dot
      |         FROM dp JOIN qp ON qp.token = dp.token AND dp.did != qp.qid
      |         GROUP BY qp.qid, dp.did),
      |sc AS (SELECT qid, did,
      |              CAST(dot AS DOUBLE) / (sqrt(CAST(n2d AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE))) AS cos
      |       FROM dots JOIN nd USING (did) JOIN nq USING (qid)),
      |r AS (SELECT qid, did,
      |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did ASC) AS INT) AS rank
      |      FROM sc)""".stripMargin

  /** BFS-distance oracle: the same fixed relaxation rounds with the
    * explicit NULL-CASE min tree. */
  private def bfsOracleSql(n: Int, seedMod: Int, hops: Int): String = {
    val steps = (1 to hops).map { i =>
      s"""d$i AS MATERIALIZED (SELECT p.id,
         |    CASE WHEN p.dist IS NULL THEN r.nd
         |         WHEN r.nd IS NULL THEN p.dist
         |         ELSE least(p.dist, r.nd) END AS dist
         |  FROM d${i - 1} p LEFT JOIN (
         |    SELECT e.dst AS id, min(d${i - 1}.dist + 1) AS nd
         |    FROM e JOIN d${i - 1} ON e.src = d${i - 1}.id
         |    WHERE d${i - 1}.dist IS NOT NULL GROUP BY 1) r USING (id))""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |d0 AS MATERIALIZED (SELECT id, CASE WHEN id % $seedMod = 0 THEN 0 END AS dist FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(dist AS BIGINT) AS dist FROM d$hops ORDER BY id""".stripMargin
  }

  /** q_scan_types oracle: recomputes the tightest type per column through
    * the same [[Constraints.TypePatterns]] regex counts at the scan's 0.99
    * default threshold (no hardcoded answers).
    */
  private def scanTypesOracle: String = {
    val cols = Seq("s_key" -> "t_key", "s_date" -> "t_date", "s_email" -> "t_email")
    val counts = cols.map(_._1).zipWithIndex.flatMap { case (c, i) =>
      s"  CAST(count(CASE WHEN $c IS NOT NULL THEN 1 END) AS BIGINT) AS nv_$i" +:
        Constraints.TypePatterns.map { case (tn, re) =>
          s"  CAST(count(CASE WHEN regexp_matches($c, '$re') THEN 1 END) AS BIGINT) AS c_${i}_$tn"
        }
    }.mkString(",\n")
    val picks = cols.zipWithIndex.map { case ((_, out), i) =>
      val sugg = Constraints.TypePatterns.map { case (tn, _) =>
        s"WHEN nv_$i > 0 AND CAST(c_${i}_$tn AS DOUBLE) >= CAST(0.99 AS DOUBLE) * CAST(nv_$i AS DOUBLE) THEN '$tn'"
      }.mkString("\n    ")
      s"CASE $sugg ELSE 'string' END AS $out"
    }.mkString(",\n")
    s"""WITH f AS (SELECT
       |  CAST(o_orderkey AS VARCHAR) AS s_key,
       |  strftime(o_orderdate, '%Y-%m-%d') AS s_date,
       |  concat('u', CAST(o_custkey AS VARCHAR), '@example.com') AS s_email
       |FROM orders),
       |m AS (SELECT
       |$counts
       |FROM f)
       |SELECT
       |$picks
       |FROM m""".stripMargin
  }

  /** Label-propagation oracle: the same deterministic synchronous rounds —
    * per node the most frequent neighbor label, ties to the smallest —
    * replayed with window-ranked argmax. MATERIALIZED per round (each
    * label frame is read twice: votes + the carry-forward left join).
    */
  private def labelPropOracleSql(n: Int, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""v$i AS MATERIALIZED (SELECT s.a, l.label, count(*) AS c
         |  FROM sym s JOIN l${i - 1} l ON s.b = l.id GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a AS id, label FROM (
         |  SELECT a, label, row_number() OVER (PARTITION BY a ORDER BY c DESC, label ASC) AS rn
         |  FROM v$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT p.id, coalesce(b.label, p.label) AS label
         |  FROM l${i - 1} p LEFT JOIN b$i b USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e)
       |  WHERE a != b),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |l0 AS MATERIALIZED (SELECT id, id AS label FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(label AS BIGINT) AS community FROM l$iters ORDER BY id""".stripMargin
  }

  /** HITS oracle: the same L∞-normalized truncating-integer rounds as
    * [[graft.ops.Components.hits]], unrolled as CTEs — products through
    * HUGEINT (Spark: DECIMAL(38,0)), `//` ≡ `div` on non-negative values.
    */
  private def hitsOracleSql(n: Int, iters: Int): String = {
    val S = 1000000000L
    // AS MATERIALIZED is load-bearing: every frame is referenced twice
    // (value + its max), so inlined CTEs would re-expand 4^iters times
    // (the q_kcore file-handle explosion)
    val steps = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT nn.id, coalesce(s.ar, 0) AS ar FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, sum(h${i - 1}.h) AS ar
         |    FROM e JOIN h${i - 1} ON e.src = h${i - 1}.id GROUP BY 1) s USING (id)),
         |a$i AS MATERIALIZED (SELECT id, CAST((CAST(ar AS HUGEINT) * $S) // greatest((SELECT max(ar) FROM ar$i), 1) AS BIGINT) AS a FROM ar$i),
         |hr$i AS MATERIALIZED (SELECT nn.id, coalesce(s.hr, 0) AS hr FROM nn LEFT JOIN (
         |    SELECT e.src AS id, sum(a$i.a) AS hr
         |    FROM e JOIN a$i ON e.dst = a$i.id GROUP BY 1) s USING (id)),
         |h$i AS MATERIALIZED (SELECT id, CAST((CAST(hr AS HUGEINT) * $S) // greatest((SELECT max(hr) FROM hr$i), 1) AS BIGINT) AS h FROM hr$i)""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |nn AS MATERIALIZED (SELECT unnest(range(0, $n)) AS id),
       |h0 AS (SELECT id, $S AS h FROM nn),
       |${steps.mkString(",\n")}
       |SELECT h$iters.id, h$iters.h AS hub, a$iters.a AS authority
       |FROM h$iters JOIN a$iters USING (id) ORDER BY id""".stripMargin
  }

  /** [[pageRankOracleSql]] with integer edge WEIGHTS: contributions are
    * `(pr · w) // Σw(src)` — the same truncating-integer rounds.
    */
  private def weightedPageRankOracleSql(n: Int, iters: Int): String = {
    val initFx = 1000000000L / n
    val baseFx = (1000000000L * 15 / 100) / n
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT nn.id, $baseFx + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, sum((p${i - 1}.pr * e.w) // sw.sw) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN sw ON e.src = sw.src
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT l_suppkey % $n AS src, l_partkey % $n AS dst, count(*) AS w
       |           FROM lineitem GROUP BY 1, 2),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |sw AS (SELECT src, sum(w) AS sw FROM e GROUP BY 1),
       |p0 AS (SELECT id, $initFx AS pr FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(pr AS BIGINT) AS pr FROM p$iters ORDER BY id""".stripMargin
  }

  /** [[pageRankOracleSql]] with teleport mass restricted to the seed
    * predicate (id % seedMod = 0) — the same truncating-integer rounds.
    */
  private def pprOracleSql(n: Int, iters: Int, seedMod: Int): String = {
    val nSeeds = n / seedMod
    val initFx = 1000000000L / nSeeds
    val baseFx = (1000000000L * 15 / 100) / nSeeds
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT n.id,
         |    (CASE WHEN n.id % $seedMod = 0 THEN $baseFx ELSE 0 END)
         |      + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, sum(p${i - 1}.pr // od.d) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN od ON e.src = od.src
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |n AS (SELECT unnest(range(0, $n)) AS id),
       |od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |p0 AS (SELECT id, CASE WHEN id % $seedMod = 0 THEN $initFx ELSE 0 END AS pr FROM n),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(pr AS BIGINT) AS pr FROM p$iters ORDER BY id""".stripMargin
  }

  private def thetaSketchOracleSql(k: Int): String = {
    val space = ThetaSketch60Space // 2^60 as a BIGINT literal
    s"""WITH ha AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
       |            FROM orders WHERE o_custkey IS NOT NULL),
       |hb AS (SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
       |       FROM customer WHERE c_custkey IS NOT NULL),
       |ka AS (SELECT h FROM ha ORDER BY h LIMIT $k),
       |kb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
       |ta AS (SELECT CASE WHEN (SELECT count(*) FROM ka) >= $k THEN (SELECT max(h) FROM ka) ELSE $space END AS th),
       |tb AS (SELECT CASE WHEN (SELECT count(*) FROM kb) >= $k THEN (SELECT max(h) FROM kb) ELSE $space END AS th),
       |va AS (SELECT h FROM ka WHERE h < (SELECT th FROM ta)),
       |vb AS (SELECT h FROM kb WHERE h < (SELECT th FROM tb)),
       |tm AS (SELECT least((SELECT th FROM ta), (SELECT th FROM tb)) AS th),
       |vam AS (SELECT h FROM va WHERE h < (SELECT th FROM tm)),
       |vbm AS (SELECT h FROM vb WHERE h < (SELECT th FROM tm)),
       |u0 AS (SELECT h FROM vam UNION SELECT h FROM vbm),
       |uk AS (SELECT h FROM u0 ORDER BY h LIMIT $k),
       |tu AS (SELECT CASE WHEN (SELECT count(*) FROM u0) >= $k THEN (SELECT max(h) FROM uk) ELSE (SELECT th FROM tm) END AS th),
       |ur AS (SELECT h FROM uk WHERE h < (SELECT th FROM tu)),
       |ir AS (SELECT h FROM vam INTERSECT SELECT h FROM vbm),
       |dr AS (SELECT h FROM vam EXCEPT SELECT h FROM vbm),
       |res AS (
       |  SELECT 'distinct_a' AS set_op, (SELECT count(*) FROM va) AS retained, (SELECT th FROM ta) AS theta
       |  UNION ALL SELECT 'distinct_b', (SELECT count(*) FROM vb), (SELECT th FROM tb)
       |  UNION ALL SELECT 'union', (SELECT count(*) FROM ur), (SELECT th FROM tu)
       |  UNION ALL SELECT 'intersection', (SELECT count(*) FROM ir), (SELECT th FROM tm)
       |  UNION ALL SELECT 'difference', (SELECT count(*) FROM dr), (SELECT th FROM tm))
       |SELECT set_op, CAST(retained AS BIGINT) AS retained, theta,
       |       CAST(retained AS DOUBLE) / (CAST(theta AS DOUBLE) / $space.0) AS estimate
       |FROM res ORDER BY set_op""".stripMargin
  }
  private val ThetaSketch60Space: String = (1L << 60).toString

  /** Exact-round-trip double literal for SQL (e-notation forces DOUBLE in
    * DuckDB; shortest-repr decimal parses back to the identical double).
    */
  private def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E")) s.replace("E", "e") else s + "e0"
  }

  /** LSH-ANN oracle: the hyperplane constants are generated by the SAME
    * seeded code as lshTopK and inlined as literals; DuckDB recomputes the
    * sign-bit buckets, candidate union and exact cosine top-k.
    */
  private def lshAnnOracleSql(k: Int, tables: Int, planes: Int, dim: Int, seed: Long): String = {
    val hps = graft.ops.Similarity.hyperplanes(tables, planes, dim, seed)
    def bucketExpr(t: Int): String = (0 until planes).map { i =>
      val hp = hps(t)(i).map(dlit).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(embedding, $hp) > 0.0e0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    def side(alias: String, filter: String): String = (0 until tables).map { t =>
      s"SELECT vec_id AS $alias, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings$filter"
    }.mkString(" UNION ALL ")
    s"""WITH c AS (${side("nid", "")}),
       |q AS (${side("qid", " WHERE vec_id < 10")}),
       |cand AS (SELECT DISTINCT q.qid, c.nid
       |         FROM c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.nid != q.qid),
       |s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(e.embedding, qe.embedding) AS cos
       |      FROM cand JOIN embeddings e ON e.vec_id = cand.nid
       |                JOIN embeddings qe ON qe.vec_id = cand.qid),
       |r AS (SELECT qid, nid,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
       |      FROM s)
       |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Multi-probe LSH oracle (probes = 2, planes = 4): corpus side identical
    * to [[lshAnnOracleSql]]; the query side emits its home bucket AND the
    * single-bit flip of its smallest-|dot| plane (sequential argmin CASE,
    * ties to the lower plane index — the gate's array_sort tie-break).
    */
  private def lshMultiProbeOracleSql(k: Int, tables: Int, dim: Int, seed: Long): String = {
    val planes = 4
    val hps = graft.ops.Similarity.hyperplanes(tables, planes, dim, seed)
    def dotE(t: Int, i: Int) =
      s"list_dot_product(embedding, ${hps(t)(i).map(dlit).mkString("[", ", ", "]")})"
    def bucketExpr(t: Int): String = (0 until planes).map { i =>
      s"(CASE WHEN ${dotE(t, i)} > 0.0e0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    def flipExpr(t: Int): String = {
      def a(i: Int) = s"abs(${dotE(t, i)})"
      s"CASE WHEN ${a(0)} <= ${a(1)} AND ${a(0)} <= ${a(2)} AND ${a(0)} <= ${a(3)} THEN 1 " +
        s"WHEN ${a(1)} <= ${a(2)} AND ${a(1)} <= ${a(3)} THEN 2 " +
        s"WHEN ${a(2)} <= ${a(3)} THEN 4 ELSE 8 END"
    }
    val cSide = (0 until tables).map { t =>
      s"SELECT vec_id AS nid, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings"
    }.mkString(" UNION ALL ")
    val qSide = (0 until tables).map { t =>
      s"""SELECT vec_id AS qid, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings WHERE vec_id < 10
         |UNION ALL
         |SELECT vec_id AS qid, $t AS tbl, xor(${bucketExpr(t)}, ${flipExpr(t)}) AS bucket FROM embeddings WHERE vec_id < 10""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH c AS ($cSide),
       |q AS ($qSide),
       |cand AS (SELECT DISTINCT q.qid, c.nid
       |         FROM c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.nid != q.qid),
       |s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(e.embedding, qe.embedding) AS cos
       |      FROM cand JOIN embeddings e ON e.vec_id = cand.nid
       |                JOIN embeddings qe ON qe.vec_id = cand.qid),
       |r AS (SELECT qid, nid,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
       |      FROM s)
       |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-ANN oracle: same deterministic coarse quantizer (the ncells
    * smallest-id vectors as seeds, argmax cosine with larger-cell tie-break),
    * nprobe probed cells, exact cosine top-k within probed cells.
    * `queryFilter` = "" makes every vector a query (the kNN-graph gate).
    */
  /** The IVF probe/score CTE chain up to ranked candidate edges
    * (`r` = qid, nid, cos, rank) — shared by the ANN rank oracles and the
    * margin-scoring oracle.
    */
  private def ivfAnnEdgesSql(ncells: Int, nprobe: Int, queryFilter: String): String =
    s"""seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS sv
       |               FROM embeddings ORDER BY vec_id LIMIT $ncells),
       |asg AS (SELECT e.vec_id AS nid, s.cell,
       |               row_number() OVER (PARTITION BY e.vec_id
       |                 ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
       |        FROM embeddings e CROSS JOIN seeds s),
       |best AS (SELECT nid, cell FROM asg WHERE rn = 1),
       |qprobe AS (SELECT qid, cell FROM (
       |             SELECT e.vec_id AS qid, s.cell,
       |                    row_number() OVER (PARTITION BY e.vec_id
       |                      ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
       |             FROM embeddings e CROSS JOIN seeds s$queryFilter)
       |           WHERE rn <= $nprobe),
       |cand AS (SELECT DISTINCT q.qid, b.nid FROM qprobe q JOIN best b ON b.cell = q.cell
       |         WHERE b.nid != q.qid),
       |s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(e.embedding, qe.embedding) AS cos
       |      FROM cand JOIN embeddings e ON e.vec_id = cand.nid
       |                JOIN embeddings qe ON qe.vec_id = cand.qid),
       |r AS (SELECT qid, nid, cos,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
       |      FROM s)""".stripMargin

  private def ivfAnnOracleSql(k: Int, ncells: Int, nprobe: Int,
                              queryFilter: String = " WHERE e.vec_id < 10"): String =
    s"""WITH ${ivfAnnEdgesSql(ncells, nprobe, queryFilter)}
       |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Ratio-margin oracle: the same IVF edges, per-node neighborhood means
    * summed in rank-slot order (the gate's fixed association), margin =
    * cos / (mean of endpoint means), re-ranked per query.
    */
  private def knnMarginOracleSql(k: Int, ncells: Int, nprobe: Int): String = {
    val slots = (1 to k)
      .map(r => s"coalesce(max(cos) FILTER (WHERE rank = $r), 0.0)")
      .mkString(" + ")
    s"""WITH ${ivfAnnEdgesSql(ncells, nprobe, "")},
       |g AS (SELECT qid, nid, cos, rank FROM r WHERE rank <= $k),
       |a AS (SELECT qid AS node_id,
       |             ($slots) / CAST(count(*) AS DOUBLE) AS avg_cos
       |      FROM g GROUP BY qid),
       |m AS (SELECT g.qid, g.nid,
       |             g.cos / ((qa.avg_cos + na.avg_cos) / 2.0) AS margin
       |      FROM g JOIN a qa ON qa.node_id = g.qid
       |             JOIN a na ON na.node_id = g.nid)
       |SELECT qid AS query_id,
       |       CAST(row_number() OVER (PARTITION BY qid
       |                               ORDER BY margin DESC, nid ASC) AS INT) AS margin_rank,
       |       nid AS neighbor_id
       |FROM m ORDER BY query_id, margin_rank""".stripMargin
  }

  /** Shared by q_dedup_jaccard_inv and q_dedup_jaccard_prefix: both
    * strategies contract to the identical (id_a, id_b, inter, union_size)
    * output at threshold 0.9 within (lang, source) blocks. */
  private val jaccardInvOracle: String =
    """WITH d AS (SELECT doc_id, lang, source, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
      |t AS (SELECT doc_id, lang, source, len(toks) AS nt, unnest(toks) AS tok FROM d)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |       a.nt + b.nt - count(*) AS union_size
      |FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
      |                 AND a.tok = b.tok AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id, a.nt, b.nt
      |HAVING CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /** q_benford oracle, generated from the same [[Constraints.BenfordP]]
    * literals the Spark side binds: Scala's Double.toString round-trips
    * (shortest repr), so the SQL literal parses back to the identical
    * double and the chi2 left-fold replays bit-for-bit.
    */
  private def benfordOracle: String = {
    val cols = Seq("l_extendedprice", "l_quantity")
    val p = Constraints.BenfordP.toMap
    val fx = cols.zipWithIndex.map { case (c, i) =>
      s"  CAST(CASE WHEN $c >= 0 THEN floor($c * 100.0 + 0.5) ELSE -floor(-$c * 100.0 + 0.5) END AS BIGINT) AS v$i"
    }.mkString(",\n")
    val dg = cols.indices.map { i =>
      s"  CASE WHEN v$i IS NOT NULL AND v$i != 0 THEN CAST(substr(CAST(abs(v$i) AS VARCHAR), 1, 1) AS INTEGER) END AS d$i"
    }.mkString(",\n")
    val counts = cols.indices.flatMap { i =>
      s"  count(CASE WHEN d$i IS NOT NULL THEN 1 END) AS n$i" +:
        (1 to 9).map(d => s"  count(CASE WHEN d$i = $d THEN 1 END) AS c${i}_$d")
    }.mkString(",\n")
    def term(i: Int, d: Int) =
      s"(CAST(c${i}_$d AS DOUBLE) - CAST(n$i AS DOUBLE) * ${p(d)}) * " +
        s"(CAST(c${i}_$d AS DOUBLE) - CAST(n$i AS DOUBLE) * ${p(d)}) / (CAST(n$i AS DOUBLE) * ${p(d)})"
    val branches = cols.zipWithIndex.flatMap { case (c, i) =>
      val chi2 = (1 to 9).map(d => term(i, d)).mkString(" + ")
      (1 to 9).map { d =>
        s"""SELECT '$c' AS col_name, $d AS digit, c${i}_$d AS observed, n$i AS n,
           |  CASE WHEN n$i > 0 THEN CAST(c${i}_$d AS DOUBLE) / CAST(n$i AS DOUBLE) END AS share,
           |  CAST(${p(d)} AS DOUBLE) AS benford_p,
           |  CASE WHEN n$i > 0 THEN ${term(i, d)} END AS chi2_term,
           |  CASE WHEN n$i > 0 THEN $chi2 END AS chi2
           |FROM m""".stripMargin
      }
    }.mkString("\nUNION ALL\n")
    s"WITH f AS (SELECT\n$fx\nFROM lineitem),\ng AS (SELECT\n$dg\nFROM f),\nm AS (SELECT\n$counts\nFROM g)\nSELECT * FROM (\n$branches\n) ORDER BY col_name, digit"
  }

  /** q_type_infer oracle, generated from the same [[Constraints.TypePatterns]]
    * regexes and precedence chain the Spark side binds. */
  private def typeInferOracle: String = {
    val cols = Seq("s_key", "s_dec", "s_date", "s_ts", "s_bool", "s_mixed", "s_email", "s_uuid")
    val counts = cols.zipWithIndex.flatMap { case (c, i) =>
      s"  CAST(count(CASE WHEN $c IS NOT NULL THEN 1 END) AS BIGINT) AS nv_$i" +:
        Constraints.TypePatterns.map { case (tn, re) =>
          s"  CAST(count(CASE WHEN regexp_matches($c, '$re') THEN 1 END) AS BIGINT) AS c_${i}_$tn"
        }
    }.mkString(",\n")
    val branches = cols.zipWithIndex.map { case (c, i) =>
      val sugg = Constraints.TypePatterns.map { case (tn, _) =>
        s"WHEN nv_$i > 0 AND CAST(c_${i}_$tn AS DOUBLE) >= CAST(0.8 AS DOUBLE) * CAST(nv_$i AS DOUBLE) THEN '$tn'"
      }.mkString("\n    ")
      val typeCols = Constraints.TypePatterns
        .map { case (tn, _) => s"c_${i}_$tn AS n_$tn" }.mkString(", ")
      s"""SELECT '$c' AS col_name, nv_$i AS n_values, $typeCols,
         |  CASE $sugg ELSE 'string' END AS suggested
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH f AS (SELECT
       |  CAST(o_orderkey AS VARCHAR) AS s_key,
       |  concat(CAST(o_orderkey AS VARCHAR), '.', CAST(o_custkey % 100 AS VARCHAR)) AS s_dec,
       |  strftime(o_orderdate, '%Y-%m-%d') AS s_date,
       |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS s_ts,
       |  CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'FALSE' END AS s_bool,
       |  CASE WHEN o_orderkey % 10 = 0 THEN 'N/A' ELSE CAST(o_custkey AS VARCHAR) END AS s_mixed,
       |  concat('u', CAST(o_custkey AS VARCHAR), '@example.com') AS s_email,
       |  concat(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 13, 4), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 17, 4), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 21, 12)) AS s_uuid
       |FROM orders),
       |m AS (SELECT
       |$counts
       |FROM f)
       |SELECT * FROM (
       |$branches
       |) ORDER BY col_name""".stripMargin
  }

  /** q_kcore oracle: `rounds` unrolled peel rounds (each = degree filter on
    * both endpoints); converged rounds are identity, so this equals the
    * capped Spark iteration exactly. */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    // MATERIALIZED: inlined CTEs would re-expand e0 ~5× per round
    val base = """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 |  FROM lineitem a JOIN lineitem b
                 |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                 |  WHERE (a.l_partkey + b.l_partkey) % 11 = 0)""".stripMargin
    val steps = (0 until rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v, count(*) AS dg FROM (SELECT a AS v FROM e$i UNION ALL SELECT b AS v FROM e$i) GROUP BY 1),
         |e${i + 1} AS MATERIALIZED (SELECT e$i.a, e$i.b FROM e$i
         |  JOIN d$i x ON x.v = e$i.a JOIN d$i y ON y.v = e$i.b
         |  WHERE x.dg >= $k AND y.dg >= $k)""".stripMargin
    }
    s"""WITH $base,
       |${steps.mkString(",\n")}
       |SELECT v AS node, CAST(count(*) AS BIGINT) AS degree
       |FROM (SELECT a AS v FROM e$rounds UNION ALL SELECT b AS v FROM e$rounds)
       |GROUP BY 1 ORDER BY node""".stripMargin
  }

  /** q_mutual_info oracle: one CTE block per pair replicating the cell
    * shuffle, window marginals, scale-9 sign-adjusted term quantization and
    * the derived double tree. */
  /** DuckDB twin of [[graft.ops.Outliers.holtWinters]] (period 4, α 3/10,
    * β 2/10, γ 5/10): list_reduce over (3+m)-long LIST state — the first
    * transformed element [v,0,1,0,0,0,0] is the seed, e/d inlined since
    * SQL lambdas have no lets.
    */
  private def holtWintersOracle: String = {
    val e = "(x[1] - acc[1] - acc[2] - acc[4 + acc[3] % 4])"
    val d = s"(($e) * 3) // 10"
    s"""WITH f AS (SELECT user_id, event_id,
       |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
       |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
       |FROM events WHERE value IS NOT NULL),
       |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |             list(v ORDER BY event_id) AS vs
       |      FROM f GROUP BY 1),
       |st AS (SELECT user_id, n, list_reduce(
       |    list_transform(vs, v -> [v, 0::BIGINT, 1::BIGINT,
       |                             0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT]),
       |    (acc, x) -> list_concat(
       |      [acc[1] + acc[2] + ($d),
       |       acc[2] + (($d) * 2) // 10,
       |       acc[3] + 1],
       |      list_transform(range(4), k -> CASE WHEN k = acc[3] % 4
       |        THEN acc[4 + k] + ((($e) - ($d)) * 5) // 10
       |        ELSE acc[4 + k] END))) AS s
       |  FROM g)
       |SELECT user_id, n,
       |  CAST(s[1] AS BIGINT) AS level_fx, CAST(s[2] AS BIGINT) AS trend_fx,
       |  CAST(s[4] AS BIGINT) AS s0, CAST(s[5] AS BIGINT) AS s1,
       |  CAST(s[6] AS BIGINT) AS s2, CAST(s[7] AS BIGINT) AS s3,
       |  CAST(CAST(s[1] AS BIGINT) AS DOUBLE) / 100.0 AS level,
       |  CAST(s[1] + s[2] + s[4 + n % 4] AS DOUBLE) / 100.0 AS forecast
       |FROM st ORDER BY user_id""".stripMargin
  }

  /** DuckDB twin of [[graft.ops.Constraints.categoryEntropy]] over the
    * documents table: per-column cells → exact n/Σc² + fx-9 entropy terms
    * (n staged in its own CTE — a window inside an aggregate is illegal).
    */
  private def catEntropyOracle(cols: Seq[String]): String = {
    val S = "1000000000.0"
    def block(i: Int, c: String): String = {
      val p = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
      val term = s"-$p * ln($p)"
      s"""c$i AS (SELECT CAST($c AS VARCHAR) AS v, count(*) AS c FROM documents
         |  WHERE $c IS NOT NULL GROUP BY 1),
         |n$i AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM c$i),
         |m$i AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS cats,
         |    CAST(sum(CASE WHEN $term >= 0
         |      THEN CAST(floor(($term) * $S + 0.5) AS BIGINT)
         |      ELSE -CAST(floor(-($term) * $S + 0.5) AS BIGINT) END) AS BIGINT) AS hfx,
         |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS c2
         |  FROM c$i, n$i)""".stripMargin
    }
    def sel(i: Int, c: String): String =
      s"""SELECT '$c' AS "column", n, cats AS categories,
         |  CAST(hfx AS DOUBLE) / $S AS entropy,
         |  exp(CAST(hfx AS DOUBLE) / $S) AS eff_exp_h,
         |  CASE WHEN c2 > 0 THEN CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
         |       / CAST(c2 AS DOUBLE) END AS eff_simpson
         |FROM m$i""".stripMargin
    s"""WITH ${cols.zipWithIndex.map { case (c, i) => block(i, c) }.mkString(",\n")}
       |SELECT * FROM (
       |${cols.zipWithIndex.map { case (c, i) => sel(i, c) }.mkString("\nUNION ALL\n")}
       |) ORDER BY "column"""".stripMargin
  }

  private def mutualInfoOracle: String = {
    val S = "1000000000.0"
    def fx(t: String) =
      s"CASE WHEN $t >= 0 THEN CAST(floor(($t) * $S + 0.5) AS BIGINT) ELSE -CAST(floor(-($t) * $S + 0.5) AS BIGINT) END"
    def block(i: Int, tbl: String, a: String, b: String): String = {
      val miT = s"(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))"
      val hT = s"-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
      s"""c$i AS (SELECT $a AS a, $b AS b, count(*) AS o FROM $tbl
         |  WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2),
         |n$i AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c$i),
         |w$i AS (SELECT o, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c$i),
         |mi$i AS (SELECT CAST(sum(${fx(miT)}) AS BIGINT) AS mi_fx FROM w$i CROSS JOIN n$i),
         |ha$i AS (SELECT CAST(sum(${fx(hT)}) AS BIGINT) AS ha_fx
         |  FROM (SELECT sum(o) AS r FROM c$i GROUP BY a) CROSS JOIN n$i),
         |hb$i AS (SELECT CAST(sum(${fx(hT)}) AS BIGINT) AS hb_fx
         |  FROM (SELECT sum(o) AS r FROM c$i GROUP BY b) CROSS JOIN n$i)""".stripMargin
    }
    def sel(i: Int, pair: String): String =
      s"""SELECT '$pair' AS pair, n,
         |  CAST(ha_fx AS DOUBLE) / $S AS h_a, CAST(hb_fx AS DOUBLE) / $S AS h_b,
         |  CAST(mi_fx AS DOUBLE) / $S AS mi,
         |  CASE WHEN CAST(ha_fx AS DOUBLE) / $S + CAST(hb_fx AS DOUBLE) / $S > 0.0
         |       THEN 2.0 * (CAST(mi_fx AS DOUBLE) / $S) / (CAST(ha_fx AS DOUBLE) / $S + CAST(hb_fx AS DOUBLE) / $S) END AS nmi
         |FROM mi$i CROSS JOIN ha$i CROSS JOIN hb$i CROSS JOIN n$i""".stripMargin
    s"""WITH ${block(1, "orders", "o_orderstatus", "o_orderpriority")},
       |${block(2, "lineitem", "l_returnflag", "l_linestatus")}
       |SELECT * FROM (
       |${sel(1, "o_orderstatus~o_orderpriority")}
       |UNION ALL
       |${sel(2, "l_returnflag~l_linestatus")}
       |) ORDER BY pair""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_mutual_info" -> mutualInfoOracle,
    "q_holt_winters" -> holtWintersOracle,
    "q_kcore" -> kCoreOracle(6, 8),

    "q_ewma" ->
      """WITH f AS (SELECT user_id, event_id,
        |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |FROM events WHERE value IS NOT NULL),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |             list(v ORDER BY event_id) AS vs
        |      FROM f GROUP BY 1)
        |SELECT user_id, n,
        |  CAST(list_reduce(vs, (acc, x) -> acc + ((x - acc) * 3) // 10) AS BIGINT) AS ewma_fx,
        |  CAST(CAST(list_reduce(vs, (acc, x) -> acc + ((x - acc) * 3) // 10) AS BIGINT) AS DOUBLE) / 100.0 AS ewma
        |FROM g ORDER BY user_id""".stripMargin,

    "q_holt" ->
      """WITH f AS (SELECT user_id, event_id,
        |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |FROM events WHERE value IS NOT NULL),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |             list(v ORDER BY event_id) AS vs
        |      FROM f GROUP BY 1),
        |st AS (SELECT user_id, n, list_reduce(
        |         list_transform(vs, v -> [v, 0::BIGINT]),
        |         (acc, x) -> [acc[1] + acc[2] + ((x[1] - acc[1] - acc[2]) * 3) // 10,
        |                      acc[2] + ((((x[1] - acc[1] - acc[2]) * 3) // 10) * 2) // 10]) AS s
        |       FROM g)
        |SELECT user_id, n, CAST(s[1] AS BIGINT) AS level_fx, CAST(s[2] AS BIGINT) AS trend_fx,
        |  CAST(CAST(s[1] AS BIGINT) AS DOUBLE) / 100.0 AS level,
        |  CAST(CAST(s[1] AS BIGINT) + CAST(s[2] AS BIGINT) AS DOUBLE) / 100.0 AS forecast
        |FROM st ORDER BY user_id""".stripMargin,

    "q_cusum" ->
      """WITH f AS (SELECT user_id, event_id,
        |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |FROM events),
        |p AS (SELECT user_id, event_id,
        |  sum(v - 7000) OVER w AS pu,
        |  sum(5000 - v) OVER w AS pd
        |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT user_id, event_id,
        |  pu - least(0, min(pu) OVER w) AS s_up,
        |  pd - least(0, min(pd) OVER w) AS s_dn
        |FROM p WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, CAST(s_up AS BIGINT) AS s_up, CAST(s_dn AS BIGINT) AS s_dn,
        |       s_up > 50000 AS alarm_up, s_dn > 50000 AS alarm_dn
        |FROM s ORDER BY user_id, event_id""".stripMargin,
    "q_benford" -> benfordOracle,
    "q_type_infer" -> typeInferOracle,

    "q_trend" ->
      """WITH f AS (SELECT l_returnflag AS g,
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y
        |FROM lineitem),
        |m AS (SELECT g,
        |  count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |  sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |FROM f GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  CASE WHEN den > 0.0 THEN num / den END AS slope,
        |  CASE WHEN den > 0.0 THEN (syd - num / den * sxd) / CAST(n AS DOUBLE) / 100.0 END AS intercept
        |FROM (SELECT g, n,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS den,
        |        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |      FROM m)
        |ORDER BY l_returnflag""".stripMargin,

    "q_cramers_v" ->
      """WITH c1 AS (SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS o
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL GROUP BY 1, 2),
        |w1 AS (SELECT o, a, b, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c1),
        |t1 AS (SELECT o, a, b,
        |  CAST(floor(CAST(o * o AS DOUBLE) / CAST(ra * cb AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS tfx FROM w1),
        |m1 AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT a) AS r_levels,
        |  count(DISTINCT b) AS c_levels, CAST(sum(tfx) AS BIGINT) AS sfx FROM t1),
        |c2 AS (SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL GROUP BY 1, 2),
        |w2 AS (SELECT o, a, b, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c2),
        |t2 AS (SELECT o, a, b,
        |  CAST(floor(CAST(o * o AS DOUBLE) / CAST(ra * cb AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS tfx FROM w2),
        |m2 AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT a) AS r_levels,
        |  count(DISTINCT b) AS c_levels, CAST(sum(tfx) AS BIGINT) AS sfx FROM t2)
        |SELECT * FROM (
        |  SELECT 'o_orderstatus~o_orderpriority' AS pair, n, r_levels, c_levels,
        |    greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0) AS chi2,
        |    CASE WHEN n > 0 AND CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE) > 0.0
        |         THEN sqrt(greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0)
        |                   / (CAST(n AS DOUBLE) * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))) END AS cramers_v
        |  FROM m1
        |  UNION ALL
        |  SELECT 'l_returnflag~l_linestatus', n, r_levels, c_levels,
        |    greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0),
        |    CASE WHEN n > 0 AND CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE) > 0.0
        |         THEN sqrt(greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0)
        |                   / (CAST(n AS DOUBLE) * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))) END
        |  FROM m2
        |) ORDER BY pair""".stripMargin,

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

    "q_mad" ->
      """WITH f AS (SELECT l_returnflag AS g,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |FROM lineitem),
        |m AS (SELECT g, quantile_cont(cents, 0.5) AS med FROM f GROUP BY 1),
        |d AS (SELECT f.g, m.med, abs(CAST(f.cents AS DOUBLE) - m.med) AS dev
        |      FROM f JOIN m USING (g)),
        |md AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.g AS l_returnflag, count(*) AS n,
        |  CAST(count(CASE WHEN d.dev > 3.0 * md.mad THEN 1 END) AS BIGINT) AS n_outliers,
        |  min(d.med) AS med, min(md.mad) AS mad
        |FROM d JOIN md USING (g)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_heavy_hitters_group" ->
      """SELECT source, lang, count(*) AS cnt
        |FROM documents GROUP BY source, lang
        |ORDER BY source, cnt DESC, lang""".stripMargin,

    "q_winsorize_group" ->
      """WITH f AS (SELECT l_returnflag,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |FROM lineitem),
        |q AS (SELECT l_returnflag, quantile_cont(cents, 0.05) AS lo, quantile_cont(cents, 0.95) AS hi
        |      FROM f GROUP BY 1),
        |w AS (SELECT f.l_returnflag,
        |        least(greatest(CAST(cents AS DOUBLE), lo), hi) AS wv,
        |        (CAST(cents AS DOUBLE) < lo OR CAST(cents AS DOUBLE) > hi) AS clip
        |      FROM f JOIN q USING (l_returnflag))
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(count(CASE WHEN clip THEN 1 END) AS BIGINT) AS clipped,
        |  CAST(sum(CAST(CASE WHEN wv >= 0 THEN floor(wv * 100.0 + 0.5)
        |                     ELSE -floor(-wv * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS wsum_fx
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_winsorize" ->
      """WITH f AS (SELECT l_returnflag,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |FROM lineitem),
        |q AS (SELECT quantile_cont(cents, 0.05) AS lo, quantile_cont(cents, 0.95) AS hi FROM f),
        |w AS (SELECT l_returnflag,
        |        least(greatest(CAST(cents AS DOUBLE), lo), hi) AS wv,
        |        (CAST(cents AS DOUBLE) < lo OR CAST(cents AS DOUBLE) > hi) AS clip
        |      FROM f CROSS JOIN q)
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(count(CASE WHEN clip THEN 1 END) AS BIGINT) AS clipped,
        |  CAST(sum(CAST(CASE WHEN wv >= 0 THEN floor(wv * 100.0 + 0.5)
        |                     ELSE -floor(-wv * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS wsum_fx
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

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
    "q_dedup_minhash" -> minhashOracleSql(64, 16, 0.8),

    "q_split_leakage" -> splitLeakageOracleSql(64, 16, 0.8),
    "q_lsh_tuning" -> lshAuditOracleSql(64, 16, 0.8, 400),
    "q_dict_hits" -> dictHitsOracle,

    "q_dedup_incremental" -> incrementalDedupOracleSql(64, 16, 0.7, shingleLen = 3),
    "q_dedup_simhash" -> simhashOracleSql(60, 3),
    "q_column_sketch" -> columnSketchOracleSql(32),
    "q_ann_lsh" -> lshAnnOracleSql(5, 4, 4, 64, 42L),
    "q_ann_lsh_mp" -> lshMultiProbeOracleSql(5, 4, 64, 42L),
    "q_ann_ivf" -> ivfAnnOracleSql(5, 16, 4),
    "q_knn_graph" -> ivfAnnOracleSql(3, 16, 2, queryFilter = ""),
    "q_mutual_knn" ->
      s"""WITH ${ivfAnnEdgesSql(16, 2, "")},
         |e AS (SELECT qid AS a, nid AS b FROM r WHERE rank <= 3 AND qid != nid),
         |c AS (SELECT least(a, b) AS id_a, greatest(a, b) AS id_b,
         |        max(CASE WHEN a < b THEN 1 ELSE 0 END) AS f,
         |        max(CASE WHEN a > b THEN 1 ELSE 0 END) AS bk
         |      FROM e GROUP BY 1, 2)
         |SELECT id_a, id_b FROM c WHERE f = 1 AND bk = 1
         |ORDER BY id_a, id_b""".stripMargin,
    "q_knn_margin" -> knnMarginOracleSql(3, 16, 2),
    "q_hard_negatives" ->
      s"""WITH ${ivfAnnEdgesSql(16, 2, "")},
         |g AS (SELECT qid, nid, cos FROM r WHERE rank <= 6),
         |f AS (SELECT g.qid, g.nid, g.cos FROM g
         |      JOIN embeddings qe ON qe.vec_id = g.qid
         |      JOIN embeddings ne ON ne.vec_id = g.nid
         |      WHERE qe.label != ne.label),
         |n AS (SELECT qid, nid,
         |             CAST(row_number() OVER (PARTITION BY qid
         |                 ORDER BY cos DESC, nid ASC) AS INT) AS neg_rank
         |      FROM f)
         |SELECT qid AS query_id, neg_rank, nid AS neighbor_id
         |FROM n WHERE neg_rank <= 3 ORDER BY query_id, neg_rank""".stripMargin,
    "q_knn_hubs" ->
      s"""WITH g AS (${ivfAnnOracleSql(3, 16, 2, queryFilter = "")})
         |SELECT neighbor_id AS id, count(*) AS in_degree
         |FROM g GROUP BY neighbor_id ORDER BY id""".stripMargin,

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

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT)) * (100 + CAST(round(l_tax * 100.0) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_price,
        |  CAST(sum(CAST(round(l_discount * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= TIMESTAMP '1996-06-01')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q13_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |JOIN lineitem ON l_suppkey = s_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_filter" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * CAST(round(l_discount * 100.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.045 AND l_discount < 0.075
        |  AND l_quantity < 23.995""".stripMargin,

    "q_skew_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, c.click_ts AS asof_click_ts
        |FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.click_ts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view')
        |SELECT e.event_id, e.user_id,
        |       CASE WHEN epoch_us(v.view_ts) - epoch_us(e.ts) <= 1800000000
        |            THEN v.view_ts END AS asof_view_ts
        |FROM e ASOF LEFT JOIN v ON e.user_id = v.user_id AND e.ts <= v.view_ts
        |ORDER BY e.event_id""".stripMargin,

    "q_range_join" ->
      // naive non-equi formulation — DuckDB plans it as it likes; graft's
      // bucketized equi-join must produce the identical match set
      """WITH r AS (SELECT CAST(n_nationkey AS BIGINT) AS band,
        |                  900.0 + n_nationkey * 2500.0 AS lo,
        |                  900.0 + n_nationkey * 2500.0 + 9000.0 AS hi
        |           FROM nation)
        |SELECT band, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM r JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q_interval_join" ->
      """WITH l AS (SELECT l_partkey,
        |                  l_orderkey * 10 + l_linenumber AS id,
        |                  CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS s
        |           FROM lineitem)
        |SELECT a.l_partkey, count(*) AS n_overlaps
        |FROM l a JOIN l b
        |  ON a.l_partkey = b.l_partkey AND a.id < b.id
        | AND a.s <= b.s + 7 AND b.s <= a.s + 7
        |GROUP BY a.l_partkey ORDER BY a.l_partkey""".stripMargin,

    "q_zorder" ->
      s"""WITH z AS (SELECT (${ZOrder.spreadSql("l_partkey")} |
         |                  (${ZOrder.spreadSql("l_suppkey")} << 1)) AS zv
         |           FROM lineitem)
         |SELECT zv >> 12 AS zbucket, count(*) AS n, min(zv) AS z_min, max(zv) AS z_max
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,

    "q_balance" ->
      // the global prefix rank is unique (composite key embeds doc_id), so
      // rank-div-target file ids replay exactly
      """WITH t AS (SELECT CAST(len(string_split_regex(text, '\s+')) AS BIGINT) * 1000000
        |                  + doc_id AS ord FROM documents),
        |r AS (SELECT ord, row_number() OVER (ORDER BY ord) - 1 AS rk FROM t)
        |SELECT rk // 64 AS file_id, count(*) AS n_rows, min(ord) AS ord_min, max(ord) AS ord_max
        |FROM r GROUP BY 1 ORDER BY file_id""".stripMargin,

    "q_silhouette" ->
      // identical quantization tree, then integer squared distances to the
      // first-8 medoids; (d2, cell) ranking replicates the struct sort
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |           FROM embeddings),
        |sc AS (SELECT vec_id, vv, list_max(list_transform(vv, x -> abs(x))) AS scale FROM v),
        |q AS (SELECT vec_id, list_transform(vv, x -> CAST(CAST(CASE
        |         WHEN scale = 0.0 THEN 0
        |         WHEN x >= 0 THEN floor(x / scale * 127.0 + 0.5)
        |         ELSE -floor(-x / scale * 127.0 + 0.5) END AS TINYINT) AS BIGINT)) AS qv
        |      FROM sc),
        |m AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, qv AS mv
        |      FROM (SELECT * FROM q ORDER BY vec_id LIMIT 8)),
        |d AS (SELECT q.vec_id, m.cell,
        |             CAST(list_sum(list_transform(range(1, 65),
        |               i -> (q.qv[i] - m.mv[i]) * (q.qv[i] - m.mv[i]))) AS BIGINT) AS d2
        |      FROM q CROSS JOIN m),
        |r AS (SELECT vec_id, cell, d2,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d),
        |ab AS (SELECT a.vec_id, a.cell, a.d2 AS a2, b.d2 AS b2
        |       FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2)
        |SELECT vec_id AS id, cell, a2, b2,
        |       CASE WHEN greatest(a2, b2) = 0 THEN 0.0
        |            ELSE CAST(b2 - a2 AS DOUBLE) / CAST(greatest(a2, b2) AS DOUBLE) END AS s
        |FROM ab ORDER BY id""".stripMargin,

    "q_embed_quantize" ->
      // identical IEEE tree: cast-to-double components, scale = max abs,
      // sign-adjusted floor(x/scale*127 + 0.5), zero vectors -> zeros
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |           FROM embeddings),
        |s AS (SELECT vec_id, vv, list_max(list_transform(vv, x -> abs(x))) AS scale FROM v)
        |SELECT vec_id, scale,
        |       '[' || COALESCE(list_aggregate(list_transform(vv, x -> CAST(CAST(CASE
        |         WHEN scale = 0.0 THEN 0
        |         WHEN x >= 0 THEN floor(x / scale * 127.0 + 0.5)
        |         ELSE -floor(-x / scale * 127.0 + 0.5) END AS TINYINT) AS VARCHAR)),
        |         'string_agg', ','), '') || ']' AS q8
        |FROM s ORDER BY vec_id""".stripMargin,

    "q_layout_audit" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n_rows,
        |                  min(l_quantity) AS q_min, max(l_quantity) AS q_max,
        |                  min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT * FROM (
        |  SELECT 'l_quantity between -5.0 and 0.5' AS predicate,
        |         count(*) AS units_total,
        |         CAST(sum(CASE WHEN q_max < -5.0 OR q_min > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS units_prunable,
        |         CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |         CAST(sum(CASE WHEN q_max < -5.0 OR q_min > 0.5 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_prunable
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_quantity between 1.0 and 10.0',
        |         count(*),
        |         CAST(sum(CASE WHEN q_max < 1.0 OR q_min > 10.0 THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(n_rows) AS BIGINT),
        |         CAST(sum(CASE WHEN q_max < 1.0 OR q_min > 10.0 THEN n_rows ELSE 0 END) AS BIGINT)
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_extendedprice between 0.0 and 2000.0',
        |         count(*),
        |         CAST(sum(CASE WHEN p_max < 0.0 OR p_min > 2000.0 THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(n_rows) AS BIGINT),
        |         CAST(sum(CASE WHEN p_max < 0.0 OR p_min > 2000.0 THEN n_rows ELSE 0 END) AS BIGINT)
        |  FROM m)
        |ORDER BY predicate""".stripMargin,

    "q_hilbert" ->
      // the same quadrant-rotation walk, one recursive step per order bit:
      // rx/ry from the current s-bit, d += s²·((3rx) xor ry), rotate/flip,
      // halve s; rows stop expanding at s = 0
      """WITH RECURSIVE h AS (
        |  SELECT CAST(l_partkey & 65535 AS BIGINT) AS x,
        |         CAST(l_suppkey & 65535 AS BIGINT) AS y,
        |         CAST(32768 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
        |  FROM lineitem
        |  UNION ALL
        |  SELECT CASE WHEN (y & s) = 0 THEN (CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END)
        |              ELSE x END AS x,
        |         CASE WHEN (y & s) = 0 THEN (CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END)
        |              ELSE y END AS y,
        |         s // 2 AS s,
        |         d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
        |                         (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)) AS d
        |  FROM h WHERE s > 0)
        |SELECT d >> 12 AS hbucket, count(*) AS n, min(d) AS h_min, max(d) AS h_max
        |FROM h WHERE s = 0
        |GROUP BY hbucket ORDER BY hbucket""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id AS id,
        |             CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.id, n.id) AS id,
        |       CASE WHEN o.id IS NULL THEN 'added'
        |            WHEN n.id IS NULL THEN 'removed'
        |            WHEN o.text <> n.text THEN 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.id = n.id
        |WHERE o.id IS NULL OR n.id IS NULL OR o.text <> n.text
        |ORDER BY id""".stripMargin,

    "q_merge_upsert" ->
      """WITH changes AS (
        |  SELECT doc_id, 1 AS seq, 'D' AS op, text, lang
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 2 AS seq, 'U' AS op, upper(text) AS text, 'xx' AS lang
        |  FROM documents WHERE doc_id % 5 = 0),
        |latest AS (SELECT doc_id, op, text, lang FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY seq DESC, op DESC) AS rn
        |  FROM changes) WHERE rn = 1)
        |SELECT * FROM (
        |  SELECT d.doc_id, d.text, d.lang FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM latest)
        |  UNION ALL
        |  SELECT doc_id, text, lang FROM latest WHERE op = 'U')
        |ORDER BY doc_id""".stripMargin,

    "q_prop_test" ->
      """WITH r AS (SELECT CAST(count(*) AS BIGINT) AS n_ref,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x_ref
        |       FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_cur,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x_cur
        |       FROM orders WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')),
        |m AS (SELECT * FROM r, c),
        |d AS (SELECT *,
        |        CAST(x_ref AS DOUBLE) / CAST(n_ref AS DOUBLE) AS p1,
        |        CAST(x_cur AS DOUBLE) / CAST(n_cur AS DOUBLE) AS p2,
        |        (CAST(x_ref AS DOUBLE) + CAST(x_cur AS DOUBLE))
        |          / (CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE)) AS pp
        |      FROM m)
        |SELECT n_ref, x_ref, n_cur, x_cur,
        |  CASE WHEN n_ref > 0 THEN p1 END AS p_ref,
        |  CASE WHEN n_cur > 0 THEN p2 END AS p_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN p1 - p2 END AS diff,
        |  CASE WHEN n_ref > 0 AND n_cur > 0
        |        AND pp * (1.0 - pp) * (1.0 / CAST(n_ref AS DOUBLE)
        |                               + 1.0 / CAST(n_cur AS DOUBLE)) > 0.0
        |  THEN (p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_ref AS DOUBLE)
        |                                           + 1.0 / CAST(n_cur AS DOUBLE))) END AS z
        |FROM d""".stripMargin,

    "q_cat_entropy" -> catEntropyOracle(Seq("lang", "source")),

    "q_roc_auc" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |u AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS v,
        |       CASE WHEN h2 < h1 THEN 1 ELSE 2 END AS side
        |  FROM f),
        |c AS (SELECT v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY v),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS kc FROM c),
        |m AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(CAST(c1 AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS r1d,
        |             sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS ties
        |      FROM k)
        |SELECT n1 AS n_pos, n2 AS n_neg,
        |       CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |         / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc,
        |       CASE WHEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) > 0.0
        |       THEN (CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |               - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |            / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))
        |       END AS z
        |FROM m""".stripMargin,

    "q_pr_curve" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS s,
        |       h2 < h1 AS y FROM f),
        |c AS (SELECT s AS threshold_fx,
        |        sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
        |        sum(CASE WHEN y THEN 0 ELSE 1 END) AS ng
        |      FROM q GROUP BY s),
        |t AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all FROM c),
        |k AS (SELECT threshold_fx,
        |        CAST(sum(p) OVER (ORDER BY threshold_fx DESC) AS BIGINT) AS tp,
        |        CAST(sum(ng) OVER (ORDER BY threshold_fx DESC) AS BIGINT) AS fp
        |      FROM c)
        |SELECT threshold_fx, tp, fp, t.tp_all - tp AS fn,
        |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
        |  CASE WHEN tp + (t.tp_all - tp) > 0
        |       THEN CAST(tp AS DOUBLE) / CAST(tp + (t.tp_all - tp) AS DOUBLE) END AS recall,
        |  CASE WHEN 2 * tp + fp + (t.tp_all - tp) > 0
        |       THEN CAST(2 * tp AS DOUBLE)
        |            / CAST(2 * tp + fp + (t.tp_all - tp) AS DOUBLE) END AS f1
        |FROM k, t ORDER BY threshold_fx DESC""".stripMargin,

    "q_confusion" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT)
        |         >= 600000 AS p,
        |       h2 < h1 AS y FROM f),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM q)
        |SELECT tp, fp, fn, tn,
        |  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE) AS accuracy,
        |  CASE WHEN CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) > 0
        |  THEN CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
        |       / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) AS DOUBLE))
        |  END AS mcc
        |FROM m""".stripMargin,

    "q_spearman_group" ->
      """WITH f AS (SELECT l_returnflag AS g,
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y
        |FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  AND l_returnflag IS NOT NULL),
        |cx AS (SELECT g, x AS v, count(*) AS c FROM f GROUP BY 1, 2),
        |rx AS (SELECT g, v,
        |        (sum(c) OVER (PARTITION BY g ORDER BY v) - c) * 2 + c + 1 AS dr FROM cx),
        |cy AS (SELECT g, y AS v, count(*) AS c FROM f GROUP BY 1, 2),
        |ry AS (SELECT g, v,
        |        (sum(c) OVER (PARTITION BY g ORDER BY v) - c) * 2 + c + 1 AS dr FROM cy),
        |j AS (SELECT f.g, rx.dr AS a, ry.dr AS b
        |      FROM f JOIN rx ON f.g = rx.g AND f.x = rx.v
        |             JOIN ry ON f.g = ry.g AND f.y = ry.v),
        |m AS (SELECT g, count(*) AS n,
        |  sum(CAST(a AS HUGEINT)) AS sx, sum(CAST(b AS HUGEINT)) AS sy,
        |  sum(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS sxx,
        |  sum(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS syy,
        |  sum(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sxy
        |FROM j GROUP BY g)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |       CASE WHEN dx > 0.0 AND dy > 0.0
        |            THEN num / (sqrt(dx) * sqrt(dy)) END AS rho
        |FROM (SELECT g, n,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m)
        |ORDER BY l_returnflag""".stripMargin,

    "q_brier" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS s,
        |       CASE WHEN h2 < h1 THEN 1000000 ELSE 0 END AS y FROM f),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(s - y AS HUGEINT) * (s - y)) AS se FROM q)
        |SELECT n, CASE WHEN n > 0
        |  THEN CAST(se AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000000.0 END AS brier
        |FROM m""".stripMargin,

    "q_avg_precision" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS s,
        |       h2 < h1 AS y FROM f),
        |c AS (SELECT s AS tf, sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
        |        sum(CASE WHEN y THEN 0 ELSE 1 END) AS ng FROM q GROUP BY s),
        |t AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all FROM c),
        |k AS (SELECT tf, CAST(sum(p) OVER (ORDER BY tf DESC) AS BIGINT) AS tp,
        |        CAST(sum(ng) OVER (ORDER BY tf DESC) AS BIGINT) AS fp FROM c),
        |g AS (SELECT tf, tp, fp,
        |        CAST(coalesce(lag(tp) OVER (ORDER BY tf DESC), 0) AS BIGINT) AS ptp
        |      FROM k),
        |terms AS (SELECT
        |    (CAST(tp - ptp AS DOUBLE) / CAST(t.tp_all AS DOUBLE))
        |      * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)) AS term
        |  FROM g, t),
        |fx AS (SELECT CAST(sum(CASE WHEN term >= 0
        |    THEN CAST(floor(term * 1000000000000.0 + 0.5) AS BIGINT)
        |    ELSE -CAST(floor(-term * 1000000000000.0 + 0.5) AS BIGINT) END) AS BIGINT) AS sfx
        |  FROM terms)
        |SELECT t.tp_all AS n_pos,
        |       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_thresholds,
        |       CAST(fx.sfx AS DOUBLE) / 1000000000000.0 AS avg_precision
        |FROM t, fx""".stripMargin,

    "q_calibration" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |g AS (SELECT CAST(h1 AS DOUBLE) / 1000.0 AS score, h2 < h1 AS label FROM f),
        |q AS (SELECT CAST(CASE WHEN score >= 0 THEN floor(score * 1000000.0 + 0.5)
        |          ELSE -floor(-score * 1000000.0 + 0.5) END AS BIGINT) AS sfx, label FROM g),
        |b AS (SELECT least(greatest((sfx * 10) // 1000000, 0), 9) AS bucket, sfx, label FROM q),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS tot FROM b),
        |m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CAST(sfx AS HUGEINT)) AS HUGEINT) AS ss,
        |        CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |      FROM b GROUP BY bucket)
        |SELECT bucket, n,
        |  CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean_score,
        |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
        |  abs(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        |      - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE)) AS ece_term
        |FROM m, t ORDER BY bucket""".stripMargin,

    "q_vocab_coverage" ->
      """WITH rt AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents WHERE source = 'src0'),
        |rv AS (SELECT token FROM (
        |    SELECT token, count(*) AS tf FROM rt GROUP BY token
        |    ORDER BY tf DESC, token ASC LIMIT 100)),
        |ct AS (SELECT unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents WHERE source = 'src1'),
        |c AS (SELECT token, count(*) AS c FROM ct GROUP BY token),
        |vs AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM rv),
        |cov AS (SELECT CAST(count(*) AS BIGINT) AS covered FROM c
        |        WHERE token IN (SELECT token FROM rv)),
        |oov AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS oov_tokens FROM c
        |        WHERE token NOT IN (SELECT token FROM rv)),
        |tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tokens FROM c)
        |SELECT vs.vocab_size, cov.covered,
        |  CASE WHEN vs.vocab_size > 0
        |       THEN CAST(cov.covered AS DOUBLE) / CAST(vs.vocab_size AS DOUBLE) END AS coverage,
        |  tot.n_tokens, oov.oov_tokens,
        |  CASE WHEN tot.n_tokens > 0
        |       THEN CAST(oov.oov_tokens AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE) END AS oov_rate
        |FROM vs, cov, oov, tot""".stripMargin,

    "q_budget_by_lang" ->
      """WITH f AS (SELECT doc_id, lang,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|q'), 1, 15))::BIGINT % 1000 AS score
        |  FROM documents WHERE lang IS NOT NULL),
        |b AS (SELECT lang,
        |    (CAST(ascii(substr(lang, 1, 1)) AS BIGINT) % 5 + 1) * 2000 AS budget
        |  FROM (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL)),
        |g AS (SELECT doc_id, lang, n_tokens, score,
        |        CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ratio
        |      FROM f WHERE n_tokens > 0),
        |r AS (SELECT g.*, b.budget,
        |        CAST(sum(n_tokens) OVER (PARTITION BY g.lang ORDER BY ratio DESC, doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |      FROM g JOIN b USING (lang))
        |SELECT doc_id, lang, n_tokens, CAST(score AS BIGINT) AS score, ratio, cum_tokens
        |FROM r WHERE cum_tokens <= budget ORDER BY lang, cum_tokens""".stripMargin,

    "q_embed_drift" ->
      """WITH s0 AS (SELECT embedding AS v FROM embeddings
        |  WHERE label % 2 = 0 AND embedding IS NOT NULL AND len(embedding) > 0),
        |s1 AS (SELECT embedding AS v FROM embeddings
        |  WHERE label % 2 = 1 AND embedding IS NOT NULL AND len(embedding) > 0),
        |u0 AS (SELECT list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) END) AS uu,
        |    CAST(floor(sqrt(list_reduce(list_transform(v,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x))
        |        * 1000000.0 + 0.5) AS BIGINT) AS nfx
        |  FROM s0),
        |u1 AS (SELECT list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) END) AS uu,
        |    CAST(floor(sqrt(list_reduce(list_transform(v,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x))
        |        * 1000000.0 + 0.5) AS BIGINT) AS nfx
        |  FROM s1),
        |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n_ref,
        |              CAST(sum(nfx) AS HUGEINT) AS nsum_ref FROM u0),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n_cur,
        |              CAST(sum(nfx) AS HUGEINT) AS nsum_cur FROM u1),
        |d0 AS (SELECT dim, CAST(sum(uv) AS HUGEINT) AS sa FROM (
        |    SELECT unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u0) GROUP BY dim),
        |d1 AS (SELECT dim, CAST(sum(uv) AS HUGEINT) AS sb FROM (
        |    SELECT unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u1) GROUP BY dim),
        |j AS (SELECT CAST(coalesce(sum(coalesce(sa, 0) * coalesce(sb, 0)), 0) AS HUGEINT) AS dot,
        |             CAST(coalesce(sum(coalesce(sa, 0) * coalesce(sa, 0)), 0) AS HUGEINT) AS aa,
        |             CAST(coalesce(sum(coalesce(sb, 0) * coalesce(sb, 0)), 0) AS HUGEINT) AS bb
        |      FROM d0 FULL OUTER JOIN d1 USING (dim))
        |SELECT n0.n_ref, n1.n_cur,
        |  CASE WHEN j.aa > 0 AND j.bb > 0
        |       THEN CAST(j.dot AS DOUBLE)
        |            / (sqrt(CAST(j.aa AS DOUBLE)) * sqrt(CAST(j.bb AS DOUBLE))) END AS centroid_cos,
        |  CASE WHEN n0.n_ref > 0 THEN CAST(n0.nsum_ref AS DOUBLE)
        |       / CAST(n0.n_ref AS DOUBLE) / 1000000.0 END AS mean_norm_ref,
        |  CASE WHEN n1.n_cur > 0 THEN CAST(n1.nsum_cur AS DOUBLE)
        |       / CAST(n1.n_cur AS DOUBLE) / 1000000.0 END AS mean_norm_cur
        |FROM n0, n1, j""".stripMargin,

    "q_qnorm" ->
      """WITH cur0 AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL GROUP BY 1),
        |cur AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM cur0),
        |ref0 AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL GROUP BY 1),
        |ref AS (SELECT v AS ref_v, sum(c) OVER (ORDER BY v) AS ref_cum FROM ref0),
        |n AS (SELECT (SELECT max(cum) FROM cur) AS n_cur,
        |             (SELECT max(ref_cum) FROM ref) AS n_ref),
        |m AS (SELECT cur.v, min(ref.ref_v) AS qn
        |      FROM cur, ref, n
        |      WHERE ref.ref_cum * n.n_cur >= cur.cum * n.n_ref
        |      GROUP BY cur.v)
        |SELECT d.doc_id, d.n_chars, m.qn AS n_chars_qnorm
        |FROM documents d LEFT JOIN m ON CAST(d.n_chars AS BIGINT) = m.v
        |WHERE d.source = 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    "q_diversity_group" ->
      """WITH b AS (SELECT label, embedding AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM embeddings
        |  WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(embedding) > 0),
        |u AS (SELECT label, list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) / nrm >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) / nrm * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-(CAST(x AS DOUBLE) / nrm) * 1000000.0 + 0.5) AS BIGINT)
        |    END) AS uu
        |  FROM b WHERE nrm > 0),
        |nq AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(list_reduce(list_transform(uu, y -> y * y), (a, x) -> a + x))
        |         AS HUGEINT) AS qq
        |  FROM u GROUP BY label),
        |dims AS (SELECT label, dim, CAST(sum(uv) AS HUGEINT) AS sd FROM (
        |    SELECT label, unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u)
        |  GROUP BY label, dim),
        |s2 AS (SELECT label, CAST(sum(sd * sd) AS HUGEINT) AS s2 FROM dims GROUP BY label)
        |SELECT nq.label, nq.n,
        |  CASE WHEN nq.n >= 2
        |       THEN CAST(s2.s2 - nq.qq AS DOUBLE)
        |            / CAST(CAST(nq.n AS HUGEINT) * (nq.n - 1) AS DOUBLE)
        |            / 1000000000000.0 END AS avg_pair_cos
        |FROM nq JOIN s2 USING (label) ORDER BY label""".stripMargin,

    "q_diversity" ->
      """WITH b AS (SELECT embedding AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |u AS (SELECT list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) / nrm >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) / nrm * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-(CAST(x AS DOUBLE) / nrm) * 1000000.0 + 0.5) AS BIGINT)
        |    END) AS uu
        |  FROM b WHERE nrm > 0),
        |nq AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(list_reduce(list_transform(uu, y -> y * y), (a, x) -> a + x))
        |         AS HUGEINT) AS qq
        |  FROM u),
        |dims AS (SELECT dim, CAST(sum(uv) AS HUGEINT) AS sd FROM (
        |    SELECT unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u)
        |  GROUP BY dim),
        |s2 AS (SELECT CAST(coalesce(sum(sd * sd), 0) AS HUGEINT) AS s2 FROM dims)
        |SELECT nq.n,
        |  CASE WHEN nq.n >= 2
        |       THEN CAST(s2.s2 - nq.qq AS DOUBLE)
        |            / CAST(CAST(nq.n AS HUGEINT) * (nq.n - 1) AS DOUBLE)
        |            / 1000000000000.0 END AS avg_pair_cos
        |FROM nq, s2""".stripMargin,

    "q_neg_sample" ->
      """WITH corpus AS (SELECT doc_id AS cid,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|corpus'), 1, 15))::BIGINT AS ch
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
        |ranked AS (SELECT cid,
        |    CAST(row_number() OVER (ORDER BY ch, cid) - 1 AS BIGINT) AS rnk FROM corpus),
        |anchors AS (SELECT doc_id AS a FROM documents WHERE doc_id % 10 = 0),
        |draws AS (SELECT a, CAST(unnest(range(7)) AS BIGINT) AS slot FROM anchors),
        |d2 AS (SELECT a, slot,
        |    ('0x' || substr(md5(CAST(a AS VARCHAR) || '|neg' || CAST(slot AS VARCHAR)), 1, 15))::BIGINT
        |      % nn.n AS draw
        |  FROM draws, nn),
        |cand AS (SELECT a, slot, cid FROM d2 JOIN ranked ON draw = rnk WHERE cid != a),
        |ex AS (SELECT * FROM cand WHERE cid != a + 1),
        |uniq AS (SELECT a, cid, CAST(min(slot) AS BIGINT) AS slot FROM ex GROUP BY a, cid),
        |keep AS (SELECT a, slot, cid,
        |    row_number() OVER (PARTITION BY a ORDER BY slot) AS rn FROM uniq)
        |SELECT a AS anchor, slot, cid AS negative
        |FROM keep WHERE rn <= 3 ORDER BY anchor, slot""".stripMargin,

    "q_budget_select" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|q'), 1, 15))::BIGINT % 1000 AS score
        |  FROM documents),
        |g AS (SELECT doc_id, n_tokens, score,
        |        CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ratio
        |      FROM f WHERE n_tokens > 0),
        |r AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY ratio DESC, doc_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM g)
        |SELECT doc_id, n_tokens, CAST(score AS BIGINT) AS score, ratio, cum_tokens
        |FROM r WHERE cum_tokens <= 12000 ORDER BY cum_tokens""".stripMargin,

    "q_gini_group" ->
      """WITH per AS (SELECT c.c_mktsegment AS seg, o.o_custkey,
        |    CAST(sum(CAST(CASE WHEN o_totalprice >= 0
        |         THEN floor(o_totalprice * 100.0 + 0.5)
        |         ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |c AS (SELECT seg, cents AS v, count(*) AS c FROM per
        |      WHERE cents >= 0 AND seg IS NOT NULL GROUP BY 1, 2),
        |k AS (SELECT seg, v, c, sum(c) OVER (PARTITION BY seg ORDER BY v) AS cum FROM c),
        |m AS (SELECT seg, CAST(sum(c) AS HUGEINT) AS n,
        |             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sx,
        |             CAST(sum(CAST(v AS HUGEINT)
        |                  * (2 * CAST(c AS HUGEINT) * (cum - c)
        |                     + CAST(c AS HUGEINT) * (c + 1))) AS HUGEINT) AS six2
        |      FROM k GROUP BY seg)
        |SELECT seg, CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS total,
        |  CASE WHEN sx > 0 THEN CAST(six2 - (n + 1) * sx AS DOUBLE)
        |       / CAST(n * sx AS DOUBLE) END AS gini
        |FROM m ORDER BY seg""".stripMargin,

    "q_fdr" ->
      """WITH t AS (SELECT o_orderkey AS test_id,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|fdr'), 1, 15))::BIGINT AS h
        |  FROM orders),
        |p0 AS (SELECT test_id,
        |    CASE WHEN test_id % 97 = 0
        |         THEN CAST(h % 1000003 AS DOUBLE) / 1000003.0 / 1000.0
        |         ELSE CAST(h % 1000003 AS DOUBLE) / 1000003.0 END AS p FROM t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p0),
        |r AS (SELECT test_id, p,
        |        CAST(row_number() OVER (ORDER BY p, test_id) AS BIGINT) AS p_rank
        |      FROM p0),
        |f AS (SELECT test_id, p, p_rank,
        |        least(CAST(p AS DOUBLE) * CAST(n.n AS DOUBLE)
        |              / CAST(p_rank AS DOUBLE), 1.0) AS ff
        |      FROM r, n),
        |q AS (SELECT test_id, p, p_rank,
        |        min(ff) OVER (ORDER BY p_rank DESC) AS bh_q FROM f)
        |SELECT test_id, p, p_rank, bh_q, bh_q <= 0.05 AS reject
        |FROM q ORDER BY p_rank""".stripMargin,

    "q_gini" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(sum(CAST(CASE WHEN o_totalprice >= 0
        |         THEN floor(o_totalprice * 100.0 + 0.5)
        |         ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |c AS (SELECT cents AS v, count(*) AS c FROM per WHERE cents >= 0 GROUP BY cents),
        |k AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM c),
        |m AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
        |             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sx,
        |             CAST(sum(CAST(v AS HUGEINT)
        |                  * (2 * CAST(c AS HUGEINT) * (cum - c)
        |                     + CAST(c AS HUGEINT) * (c + 1))) AS HUGEINT) AS six2
        |      FROM k)
        |SELECT CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS total,
        |  CASE WHEN sx > 0 THEN CAST(six2 - (n + 1) * sx AS DOUBLE)
        |       / CAST(n * sx AS DOUBLE) END AS gini
        |FROM m""".stripMargin,

    "q_trimmed_mean" ->
      """WITH f AS (SELECT CAST(CASE WHEN l_extendedprice >= 0
        |         THEN floor(l_extendedprice * 100.0 + 0.5)
        |         ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v
        |       FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT quantile_cont(v, 0.0625) AS lo, quantile_cont(v, 0.9375) AS hi,
        |             CAST(count(*) AS BIGINT) AS n_total FROM f),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
        |             sum(CAST(v AS HUGEINT)) AS s
        |      FROM f, b WHERE CAST(v AS DOUBLE) >= b.lo AND CAST(v AS DOUBLE) <= b.hi)
        |SELECT b.n_total, k.n_kept, b.lo, b.hi,
        |       CASE WHEN k.n_kept > 0
        |            THEN CAST(k.s AS DOUBLE) / CAST(k.n_kept AS DOUBLE) END AS trimmed_mean
        |FROM b, k""".stripMargin,

    "q_kl_slice" ->
      """WITH tok AS (SELECT lang AS slice,
        |         unnest(string_split_regex(text, '\s+')) AS token
        |       FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT slice, token, count(*) AS o FROM tok GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
        |w AS (SELECT slice, o,
        |             sum(o) OVER (PARTITION BY slice) AS ns,
        |             sum(o) OVER (PARTITION BY token) AS ct FROM c),
        |t AS (SELECT slice, ns,
        |  CASE WHEN (CAST(o AS DOUBLE) / CAST(ns AS DOUBLE))
        |            * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE))) >= 0
        |  THEN CAST(floor((CAST(o AS DOUBLE) / CAST(ns AS DOUBLE))
        |            * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE)))
        |            * 1000000000.0 + 0.5) AS BIGINT)
        |  ELSE -CAST(floor(-((CAST(o AS DOUBLE) / CAST(ns AS DOUBLE))
        |            * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE))))
        |            * 1000000000.0 + 0.5) AS BIGINT) END AS tfx
        |  FROM w CROSS JOIN n)
        |SELECT slice, CAST(max(ns) AS BIGINT) AS n_tokens, count(*) AS vocab,
        |       CAST(sum(tfx) AS BIGINT) AS kl_fx,
        |       CAST(CAST(sum(tfx) AS BIGINT) AS DOUBLE) / 1000000000.0 AS kl
        |FROM t GROUP BY slice ORDER BY slice""".stripMargin,

    "q_kappa" ->
      """WITH lab AS (SELECT lang AS a,
        |         CASE WHEN doc_id % 9 = 0 THEN 'zz' ELSE lang END AS b
        |       FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM lab GROUP BY a, b),
        |n AS (SELECT CAST(coalesce(sum(o), 0) AS HUGEINT) AS n FROM cells),
        |ag AS (SELECT CAST(coalesce(sum(o), 0) AS HUGEINT) AS agree
        |       FROM cells WHERE a = b),
        |r AS (SELECT a AS k, sum(o) AS r FROM cells GROUP BY a),
        |c AS (SELECT b AS k, sum(o) AS c FROM cells GROUP BY b),
        |rc AS (SELECT CAST(coalesce(sum(CAST(r.r AS HUGEINT) * c.c), 0) AS HUGEINT) AS rc
        |       FROM r JOIN c USING (k))
        |SELECT CAST(n.n AS BIGINT) AS n, CAST(ag.agree AS BIGINT) AS agree,
        |  CASE WHEN n.n > 0 THEN CAST(ag.agree AS DOUBLE) / CAST(n.n AS DOUBLE) END AS p_o,
        |  CASE WHEN n.n > 0 THEN CAST(rc.rc AS DOUBLE) / CAST(n.n * n.n AS DOUBLE) END AS p_e,
        |  CASE WHEN n.n * n.n <> rc.rc THEN CAST(n.n * ag.agree - rc.rc AS DOUBLE)
        |       / CAST(n.n * n.n - rc.rc AS DOUBLE) END AS kappa
        |FROM n, ag, rc""".stripMargin,

    "q_scd2" ->
      """WITH ch AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS seq, 'U' AS op, lang, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', lang, n_chars FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', lang, n_chars + 10 FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id, 3, 'D', NULL, NULL FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'U', 're', n_chars FROM documents WHERE doc_id % 12 = 0),
        |w AS (
        |  SELECT doc_id, seq, op, lang, n_chars,
        |         lag(op) OVER k AS p_op,
        |         lag(lang) OVER k AS p_lang,
        |         lag(n_chars) OVER k AS p_nc
        |  FROM ch WINDOW k AS (PARTITION BY doc_id ORDER BY seq)),
        |f AS (
        |  SELECT *, CASE WHEN op = 'U' AND (p_op IS NULL OR p_op = 'D'
        |                 OR (lang IS DISTINCT FROM p_lang)
        |                 OR (n_chars IS DISTINCT FROM p_nc))
        |            THEN 1 ELSE 0 END AS strt
        |  FROM w),
        |i AS (
        |  SELECT *, sum(strt) OVER (PARTITION BY doc_id ORDER BY seq) AS island
        |  FROM f),
        |g AS (
        |  SELECT doc_id, island,
        |         min(seq) FILTER (WHERE op = 'U') AS valid_from,
        |         arg_min(lang, seq) FILTER (WHERE op = 'U') AS lang,
        |         arg_min(n_chars, seq) FILTER (WHERE op = 'U') AS n_chars,
        |         min(seq) FILTER (WHERE op = 'D') AS del
        |  FROM i GROUP BY doc_id, island),
        |v AS (
        |  SELECT doc_id, valid_from, lang, n_chars,
        |         coalesce(del, lead(valid_from)
        |           OVER (PARTITION BY doc_id ORDER BY valid_from)) AS valid_to,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY valid_from) AS version
        |  FROM g WHERE valid_from IS NOT NULL)
        |SELECT doc_id, CAST(version AS BIGINT) AS version, valid_from, valid_to,
        |       valid_to IS NULL AS is_current, lang, n_chars
        |FROM v ORDER BY doc_id, version""".stripMargin,

    "q_ks" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT CAST(cents AS DOUBLE) AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2 FROM c)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       (SELECT max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |                     - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |        FROM k, n) AS ks_stat
        |FROM n""".stripMargin,

    "q_standardize" ->
      """WITH f AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS fx
        |FROM lineitem),
        |m AS (SELECT l_returnflag,
        |        CAST(count(fx) AS HUGEINT) AS n,
        |        sum(CAST(fx AS HUGEINT)) AS s,
        |        sum(CAST(fx AS HUGEINT) * CAST(fx AS HUGEINT)) AS q
        |      FROM f GROUP BY 1)
        |SELECT f.l_orderkey, f.l_linenumber, f.l_returnflag,
        |  CASE WHEN CAST(m.n * m.q - m.s * m.s AS DOUBLE) > 0.0
        |       THEN CAST(CAST(f.fx AS HUGEINT) * m.n - m.s AS DOUBLE)
        |            / sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) END AS l_quantity_z
        |FROM f JOIN m USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber, l_quantity_z""".stripMargin,

    "q_chi2_drift" ->
      """WITH u AS (SELECT o_orderpriority AS k,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS side
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |c AS (SELECT k, sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY 1),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             count(*) AS cats FROM c),
        |terms AS (SELECT
        |    ((CAST(c1 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n1)
        |     * (CAST(c1 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n1)
        |     * 1000000)
        |    // (CAST(c1 + c2 AS HUGEINT) * (n1 + n2) * n1) +
        |    ((CAST(c2 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n2)
        |     * (CAST(c2 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n2)
        |     * 1000000)
        |    // (CAST(c1 + c2 AS HUGEINT) * (n1 + n2) * n2) AS tt
        |  FROM c, n)
        |SELECT n.n1 AS n_ref, n.n2 AS n_cur, n.cats AS categories,
        |       (SELECT CAST(sum(tt) AS BIGINT) FROM terms) AS chi2_ppm
        |FROM n""".stripMargin,

    "q_mwu" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT cents AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS kc FROM c),
        |m AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(CAST(c1 AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS r1d,
        |             sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS ties
        |      FROM k)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u_doubled,
        |       CAST(ties AS BIGINT) AS tie_term,
        |       CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |         / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc,
        |       CASE WHEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) > 0.0
        |       THEN (CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |               - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |            / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))
        |       END AS z
        |FROM m""".stripMargin,

    "q_weighted_median" ->
      """WITH f AS (SELECT
        |    CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |         ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |    CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 1.0 + 0.5)
        |         ELSE -floor(-l_quantity * 1.0 + 0.5) END AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (SELECT v, sum(w) AS c FROM f WHERE w > 0 GROUP BY v),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS wt FROM c),
        |k AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM c),
        |p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS p)
        |SELECT p.p AS p, min(k.v) AS value, max(n.wt) AS w_total
        |FROM p, k, n
        |WHERE CAST(k.cum AS DOUBLE) >= p.p * CAST(n.wt AS DOUBLE)
        |GROUP BY p.p
        |ORDER BY p""".stripMargin,

    "q_wasserstein" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT cents AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT v, sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2,
        |             lead(v) OVER (ORDER BY v) AS vn FROM c)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       (SELECT CAST(sum(abs(CAST(k1 AS HUGEINT) * n2 - CAST(k2 AS HUGEINT) * n1)
        |                        * (vn - v)) AS DOUBLE)
        |        FROM k, n WHERE vn IS NOT NULL)
        |       / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) AS w1
        |FROM n""".stripMargin,

    "q_wasserstein_group" ->
      """WITH u AS (
        |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v, 1 AS side
        |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL AND lang IS NOT NULL
        |  UNION ALL
        |  SELECT lang, CAST(n_chars AS BIGINT), 2
        |  FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT g, v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY g, v),
        |k AS (SELECT g, v, c1, c2,
        |             sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
        |             sum(c2) OVER (PARTITION BY g ORDER BY v) AS k2,
        |             lead(v) OVER (PARTITION BY g ORDER BY v) AS vn,
        |             sum(c1) OVER (PARTITION BY g) AS n1,
        |             sum(c2) OVER (PARTITION BY g) AS n2
        |      FROM c)
        |SELECT g AS lang, CAST(max(n1) AS BIGINT) AS n_ref,
        |       CAST(max(n2) AS BIGINT) AS n_cur,
        |       CAST(sum(CASE WHEN vn IS NOT NULL
        |                THEN abs(CAST(k1 AS HUGEINT) * n2 - CAST(k2 AS HUGEINT) * n1)
        |                     * (vn - v) ELSE 0 END) AS DOUBLE)
        |       / CAST(CAST(max(n1) AS HUGEINT) * max(n2) AS DOUBLE) AS w1
        |FROM k WHERE n1 > 0 AND n2 > 0
        |GROUP BY g ORDER BY lang""".stripMargin,

    "q_ks_group" ->
      """WITH u AS (
        |  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v, 1 AS side
        |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL AND lang IS NOT NULL
        |  UNION ALL
        |  SELECT lang, CAST(n_chars AS DOUBLE), 2
        |  FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT g, v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY g, v),
        |k AS (SELECT g, v, c1, c2,
        |             sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
        |             sum(c2) OVER (PARTITION BY g ORDER BY v) AS k2,
        |             sum(c1) OVER (PARTITION BY g) AS n1,
        |             sum(c2) OVER (PARTITION BY g) AS n2
        |      FROM c)
        |SELECT g AS lang, CAST(max(n1) AS BIGINT) AS n_ref,
        |       CAST(max(n2) AS BIGINT) AS n_cur,
        |       max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |             - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_stat
        |FROM k WHERE n1 > 0 AND n2 > 0
        |GROUP BY g ORDER BY lang""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1
        |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id AS u, min(s1.t1) AS t1, min(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.u = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id AS u, min(s2.t1) AS t1, min(e.ts) AS t3
        |       FROM events e JOIN s2 ON s2.u = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s2.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS stage_index, 'signup' AS stage, count(*) AS users FROM s1
        |  UNION ALL
        |  SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY stage_index""".stripMargin,

    "q_funnel_gaps" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1
        |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id AS u, min(s1.t1) AS t1, min(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.u = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id AS u, min(s2.t1) AS t1, min(e.ts) AS t3
        |       FROM events e JOIN s2 ON s2.u = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s2.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id),
        |g1 AS (SELECT CAST(floor(epoch(s2.t2)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) AS gap
        |       FROM s2 JOIN s1 ON s1.u = s2.u),
        |g2 AS (SELECT CAST(floor(epoch(s3.t3)) AS BIGINT) - CAST(floor(epoch(s2.t2)) AS BIGINT) AS gap
        |       FROM s3 JOIN s2 ON s2.u = s3.u)
        |SELECT * FROM (
        |  SELECT 1 AS stage_index, 'signup->click' AS transition, CAST(count(*) AS BIGINT) AS users,
        |         quantile_cont(gap, 0.25) AS p25, quantile_cont(gap, 0.5) AS p50, quantile_cont(gap, 0.75) AS p75,
        |         CASE WHEN count(*) > 0 THEN CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS avg_sec
        |  FROM g1
        |  UNION ALL
        |  SELECT 2, 'click->purchase', CAST(count(*) AS BIGINT),
        |         quantile_cont(gap, 0.25), quantile_cont(gap, 0.5), quantile_cont(gap, 0.75),
        |         CASE WHEN count(*) > 0 THEN CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) END
        |  FROM g2)
        |ORDER BY stage_index""".stripMargin,

    "q_cohort" ->
      """WITH ev AS (SELECT user_id AS u,
        |                   CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS d
        |            FROM events),
        |f AS (SELECT u, min(d) AS d0 FROM ev GROUP BY u)
        |SELECT CAST(floor(d0 / 7.0) AS BIGINT) AS cohort_week,
        |       CAST(floor((d - d0) / 7.0) AS BIGINT) AS week_offset,
        |       count(DISTINCT ev.u) AS users
        |FROM ev JOIN f ON f.u = ev.u
        |WHERE CAST(floor((d - d0) / 7.0) AS BIGINT) <= 8
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                      ORDER BY ts ASC, event_id ASC) AS next_type
        |           FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |FROM o WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    "q_stream_join" ->
      """WITH c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, ts AS view_ts, user_id
        |      FROM events WHERE event_type = 'view')
        |SELECT c.click_id, v.view_id, c.user_id
        |FROM c JOIN v ON c.user_id = v.user_id
        |    AND v.view_ts >= c.click_ts - INTERVAL 86400 SECOND
        |    AND v.view_ts <= c.click_ts
        |ORDER BY click_id, view_id""".stripMargin,

    "q_outliers" ->
      """WITH v AS (SELECT l_returnflag,
        |                  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |           FROM lineitem),
        |q AS (SELECT l_returnflag, quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.75) AS q3
        |      FROM v GROUP BY l_returnflag)
        |SELECT v.l_returnflag, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN cents < q1 - 1.5 * (q3 - q1) OR cents > q3 + 1.5 * (q3 - q1)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       min(CASE WHEN cents < q1 - 1.5 * (q3 - q1) OR cents > q3 + 1.5 * (q3 - q1)
        |                THEN cents END) AS min_outlier_cents,
        |       max(CASE WHEN cents < q1 - 1.5 * (q3 - q1) OR cents > q3 + 1.5 * (q3 - q1)
        |                THEN cents END) AS max_outlier_cents
        |FROM v JOIN q USING (l_returnflag)
        |GROUP BY v.l_returnflag ORDER BY v.l_returnflag""".stripMargin,

    "q_anomaly" ->
      // identical integer flag over the identical ROWS frame; DuckDB's
      // HUGEINT window sums are exact, and only id columns are output
      """WITH f AS (SELECT user_id, event_id,
        |                  CAST(CASE WHEN value >= 0 THEN floor(value * 1000.0 + 0.5)
        |                            ELSE -floor(-value * 1000.0 + 0.5) END AS BIGINT) AS v
        |           FROM events),
        |r AS (SELECT user_id, event_id, v,
        |             count(v) OVER w AS n, sum(v) OVER w AS s, sum(v * v) OVER w AS q
        |      FROM f
        |      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id FROM r
        |WHERE n >= 5 AND (n * v - s) * (n * v - s) > 9 * (n * q - s * s)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_heavy_hitters" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang ASC""".stripMargin,

    "q_heavy_hitters_ss" ->
      """SELECT lang, count(*) AS cnt, CAST(0 AS BIGINT) AS err FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang ASC""".stripMargin,

    "q_corr" ->
      // identical moments as exact HUGEINT sums, identical double tree:
      // CAST each co-moment once, then num / (sqrt(dx) * sqrt(dy))
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x1,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y1,
        |  CAST(CASE WHEN l_discount >= 0 THEN floor(l_discount * 100.0 + 0.5)
        |            ELSE -floor(-l_discount * 100.0 + 0.5) END AS BIGINT) AS x2,
        |  CAST(CASE WHEN l_tax >= 0 THEN floor(l_tax * 100.0 + 0.5)
        |            ELSE -floor(-l_tax * 100.0 + 0.5) END AS BIGINT) AS y2
        |FROM lineitem),
        |m AS (SELECT
        |  count(CASE WHEN x1 IS NOT NULL AND y1 IS NOT NULL THEN 1 END) AS n1,
        |  sum(CAST(x1 AS HUGEINT)) AS sx1, sum(CAST(y1 AS HUGEINT)) AS sy1,
        |  sum(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS sxx1,
        |  sum(CAST(y1 AS HUGEINT) * CAST(y1 AS HUGEINT)) AS syy1,
        |  sum(CAST(x1 AS HUGEINT) * CAST(y1 AS HUGEINT)) AS sxy1,
        |  count(CASE WHEN x2 IS NOT NULL AND y2 IS NOT NULL THEN 1 END) AS n2,
        |  sum(CAST(x2 AS HUGEINT)) AS sx2, sum(CAST(y2 AS HUGEINT)) AS sy2,
        |  sum(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS sxx2,
        |  sum(CAST(y2 AS HUGEINT) * CAST(y2 AS HUGEINT)) AS syy2,
        |  sum(CAST(x2 AS HUGEINT) * CAST(y2 AS HUGEINT)) AS sxy2
        |FROM f)
        |SELECT pair, n, CASE WHEN dx > 0.0 AND dy > 0.0
        |                     THEN num / (sqrt(dx) * sqrt(dy)) END AS corr
        |FROM (
        |  SELECT 'l_quantity~l_extendedprice' AS pair, n1 AS n,
        |         CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE) AS num,
        |         CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE) AS dx,
        |         CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE) AS dy
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_discount~l_tax', n2,
        |         CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE),
        |         CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE),
        |         CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE)
        |  FROM m)
        |ORDER BY pair""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (SELECT source AS key, count(*) AS cnt FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT key, cnt, CAST((cnt * 1000000) // n AS BIGINT) AS share_ppm
        |FROM c, n ORDER BY cnt DESC, key ASC LIMIT 10""".stripMargin,

    "q_join_cardinality" ->
      """WITH l AS (SELECT user_id, count(*) AS cl FROM events
        |           WHERE event_type = 'click' GROUP BY user_id),
        |r AS (SELECT user_id, count(*) AS cr FROM events
        |      WHERE event_type = 'view' GROUP BY user_id)
        |SELECT CAST(sum(CAST(cl AS DECIMAL(19,0)) * CAST(cr AS DECIMAL(19,0))) AS BIGINT) AS join_rows,
        |       count(*) AS shared_keys,
        |       CAST(max(CAST(cl AS DECIMAL(19,0)) * CAST(cr AS DECIMAL(19,0))) AS BIGINT) AS max_key_rows
        |FROM l JOIN r USING (user_id)""".stripMargin,

    "q_pct_rank" ->
      """WITH c AS (SELECT CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |                            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS v,
        |                  count(*) AS c
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT v, c, sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |             sum(c) OVER () AS n
        |      FROM c)
        |SELECT v, CAST(c AS BIGINT) AS c,
        |       CAST(cum - c AS BIGINT) AS cum_lt, CAST(cum AS BIGINT) AS cum_le,
        |       CAST(cum - c AS DOUBLE) / CAST(n AS DOUBLE) AS pct_below,
        |       CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) AS cdf
        |FROM t ORDER BY v""".stripMargin,

    "q_bins" ->
      // the identical integer bin formula; DuckDB // == Spark div on the
      // non-negative (cum-1)*k
      """WITH c AS (SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |                  count(*) AS c
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM c)
        |SELECT CAST(((cum - 1) * 8) // n AS BIGINT) AS bin,
        |       CAST(sum(c) AS BIGINT) AS n_rows, min(v) AS v_min, max(v) AS v_max
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_a_cents,
        |       CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_n_cents,
        |       CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_r_cents
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_dedup_exact" ->
      "SELECT min(event_id) AS keep_id, count(*) AS copies FROM events GROUP BY props ORDER BY keep_id",

    "q_dedup_jaccard" ->
      """WITH d AS (SELECT doc_id, lang, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) AS jaccard
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nt, b.nt)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_jaccard_inv" -> jaccardInvOracle,
    // identical output contract, different Spark plan (prefix filtering)
    "q_dedup_jaccard_prefix" -> jaccardInvOracle,
    "q_dedup_jaccard_pp" -> jaccardInvOracle,

    "q_containment" ->
      """WITH d AS (SELECT doc_id, lang, source, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, source, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nt AS nt_a, b.nt AS nt_b,
        |             count(*) AS inter
        |      FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
        |                       AND a.tok = b.tok AND a.doc_id < b.doc_id
        |      GROUP BY a.doc_id, b.doc_id, a.nt, b.nt),
        |u AS (SELECT id_a AS id_sub, id_b AS id_sup, inter, nt_a AS nt_sub, nt_b AS nt_sup FROM p
        |      UNION ALL
        |      SELECT id_b, id_a, inter, nt_b, nt_a FROM p)
        |SELECT id_sub, id_sup, inter, nt_sub, nt_sup,
        |       CAST(inter AS DOUBLE) / CAST(nt_sub AS DOUBLE) AS containment
        |FROM u
        |WHERE CAST(inter AS DOUBLE) / CAST(nt_sub AS DOUBLE) >= 0.9
        |ORDER BY id_sub, id_sup""".stripMargin,

    "q_dedup_components" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, lang, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nt, b.nt
        |  HAVING CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) >= 0.8),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b)
        |SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id ORDER BY doc_id""".stripMargin,

    "q_dedup_keep_best" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, lang, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nt, b.nt
        |  HAVING CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) >= 0.8),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id),
        |q AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS q FROM documents),
        |ranked AS (
        |  SELECT c.doc_id, row_number() OVER (PARTITION BY c.component
        |           ORDER BY q.q DESC, c.doc_id ASC) AS rn
        |  FROM comp c JOIN q USING (doc_id))
        |SELECT d.doc_id, d.lang FROM documents d
        |JOIN ranked r ON d.doc_id = r.doc_id AND r.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    "q_semdedup" ->
      """WITH RECURSIVE
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS sv
        |          FROM embeddings ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, e.embedding, s.cell,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
        |        FROM embeddings e CROSS JOIN seeds s),
        |best AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |      FROM best a JOIN best b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, lbl) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT s.a, cc.lbl FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id AS vec_id, min(lbl) AS component FROM cc GROUP BY id),
        |q AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS q FROM embeddings),
        |ranked AS (SELECT c.vec_id, row_number() OVER (PARTITION BY c.component
        |             ORDER BY q.q DESC, c.vec_id ASC) AS rn
        |           FROM comp c JOIN q USING (vec_id))
        |SELECT e.vec_id, e.label FROM embeddings e
        |JOIN ranked r ON e.vec_id = r.vec_id AND r.rn = 1
        |ORDER BY e.vec_id""".stripMargin,

    "q_semdedup_guard" ->
      """WITH RECURSIVE
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS sv
        |          FROM embeddings ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, e.embedding, s.cell,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
        |        FROM embeddings e CROSS JOIN seeds s),
        |best AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |hot AS (SELECT cell,
        |               LEAST(count(*), LEAST((count(*)*(count(*)-1)//2 + 499) // 500, 256)) AS k
        |        FROM best GROUP BY cell
        |        HAVING count(*)*(count(*)-1)//2 > 500),
        |subseeds AS (
        |  SELECT cell, ssv, s FROM (
        |    SELECT b.cell, b.embedding AS ssv, h.k,
        |           CAST(row_number() OVER (PARTITION BY b.cell ORDER BY b.vec_id) AS INT) AS s
        |    FROM best b JOIN hot h USING (cell))
        |  WHERE s <= k),
        |subasg AS (SELECT b.vec_id, ss.s,
        |                  row_number() OVER (PARTITION BY b.vec_id
        |                    ORDER BY list_cosine_similarity(b.embedding, ss.ssv) DESC, ss.s DESC) AS rn
        |           FROM best b JOIN subseeds ss ON b.cell = ss.cell),
        |sub AS (SELECT vec_id, s FROM subasg WHERE rn = 1),
        |blk AS (SELECT b.vec_id, b.embedding, b.cell, COALESCE(sub.s, 0) AS sub
        |        FROM best b LEFT JOIN sub USING (vec_id)),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |      FROM blk a JOIN blk b ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, lbl) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT s.a, cc.lbl FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id AS vec_id, min(lbl) AS component FROM cc GROUP BY id),
        |q AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS q FROM embeddings),
        |ranked AS (SELECT c.vec_id, row_number() OVER (PARTITION BY c.component
        |             ORDER BY q.q DESC, c.vec_id ASC) AS rn
        |           FROM comp c JOIN q USING (vec_id))
        |SELECT e.vec_id, e.label FROM embeddings e
        |JOIN ranked r ON e.vec_id = r.vec_id AND r.rn = 1
        |ORDER BY e.vec_id""".stripMargin,

    "q_dedup_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(e.embedding, q.qv) AS cos
        |      FROM embeddings e, q WHERE e.vec_id != q.qid),
        |r AS (SELECT qid, nid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank FROM s)
        |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_pq_encode" ->
      s"""${pqCodesSqlPrefix(8, 8, 8)}
         |SELECT vec_id,
         |       MAX(code) FILTER (WHERE sub = 0) AS c0, MAX(code) FILTER (WHERE sub = 1) AS c1,
         |       MAX(code) FILTER (WHERE sub = 2) AS c2, MAX(code) FILTER (WHERE sub = 3) AS c3,
         |       MAX(code) FILTER (WHERE sub = 4) AS c4, MAX(code) FILTER (WHERE sub = 5) AS c5,
         |       MAX(code) FILTER (WHERE sub = 6) AS c6, MAX(code) FILTER (WHERE sub = 7) AS c7
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_ivfpq_encode" ->
      s"""${ivfPqCodesSqlPrefix(8, 8, 8, 64)}
         |SELECT vec_id, MAX(cell) AS cell,
         |       MAX(code) FILTER (WHERE sub = 0) AS c0, MAX(code) FILTER (WHERE sub = 1) AS c1,
         |       MAX(code) FILTER (WHERE sub = 2) AS c2, MAX(code) FILTER (WHERE sub = 3) AS c3,
         |       MAX(code) FILTER (WHERE sub = 4) AS c4, MAX(code) FILTER (WHERE sub = 5) AS c5,
         |       MAX(code) FILTER (WHERE sub = 6) AS c6, MAX(code) FILTER (WHERE sub = 7) AS c7
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_pq_topk" -> {
      val foldDs = (1 to 8).foldLeft("0") { (acc, i) => s"($acc + ds[$i])" }
      s"""${pqCodesSqlPrefix(8, 8, 8)},
         |qs AS (SELECT vec_id AS qid, sub, sv FROM sv WHERE vec_id < 10),
         |lut AS (SELECT q.qid, q.sub, c.code, ${pqDistSql("q.sv", "c.cw", 8)} AS d
         |        FROM qs q JOIN cb c ON c.sub = q.sub),
         |cand AS (SELECT l.qid, cd.vec_id AS nid, l.sub, l.d
         |         FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.code = cd.code
         |         WHERE cd.vec_id != l.qid),
         |g AS (SELECT qid, nid, list(d ORDER BY sub) AS ds FROM cand GROUP BY qid, nid),
         |r AS (SELECT qid, nid,
         |             CAST(row_number() OVER (PARTITION BY qid ORDER BY $foldDs, nid) AS INT) AS rank
         |      FROM g)
         |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },

    "q_ivfpq_topk" -> {
      // IVFADC search replayed end-to-end: coarse probes (2 nearest cells
      // by the same left-fold distance, ties to the smaller cell), the
      // per-(query, cell) residual lookup table, candidates restricted to
      // probed cells' members, and the m-lookup left-fold ADC distance.
      val foldDs = (1 to 8).foldLeft("0") { (acc, i) => s"($acc + ds[$i])" }
      s"""${ivfPqCodesSqlPrefix(8, 8, 8, 64)},
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |qcd AS (SELECT q.qid, cc.cell, ${pqDistSql("q.qv", "cc.cw", 64)} AS d FROM q, cc),
         |probe AS (SELECT qid, cell FROM (
         |    SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS rn FROM qcd)
         |  WHERE rn <= 2),
         |qres AS (SELECT p.qid, p.cell, [q.qv[i+1] - cc.cw[i+1] for i in range(0, 64)] AS qr
         |         FROM probe p JOIN q ON q.qid = p.qid JOIN cc ON cc.cell = p.cell),
         |qsv AS (SELECT qid, cell, CAST(s AS INT) AS sub, qr[(s*8+1):((s+1)*8)] AS sv
         |        FROM qres, generate_series(0, 7) t(s)),
         |lut AS (SELECT s.qid, s.cell, s.sub, c.code, ${pqDistSql("s.sv", "c.cw", 8)} AS d
         |        FROM qsv s JOIN rcb c ON c.sub = s.sub),
         |cand AS (SELECT l.qid, cd.vec_id AS nid, l.sub, l.d
         |         FROM codes cd JOIN lut l ON l.cell = cd.cell AND l.sub = cd.sub AND l.code = cd.code
         |         WHERE cd.vec_id != l.qid),
         |g AS (SELECT qid, nid, list(d ORDER BY sub) AS ds FROM cand GROUP BY qid, nid),
         |r AS (SELECT qid, nid,
         |             CAST(row_number() OVER (PARTITION BY qid ORDER BY $foldDs, nid) AS INT) AS rank
         |      FROM g)
         |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },

    "q_topk_per_group" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank,
        |         o_orderkey
        |  FROM orders)
        |SELECT o_orderpriority, rank, o_orderkey FROM r WHERE rank <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,

    "q_dedup_ngram" -> minhashOracleSql(64, 16, 0.3, shingleLen = 3, withJaccard = true),

    "q_chunk_rescue" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts,
        |              CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |       FROM documents),
        |nc AS (SELECT doc_id, ts,
        |         CASE WHEN n <= 20 THEN 1 ELSE ((n - 20 + 19) // 20) + 1 END AS k
        |       FROM toks),
        |idx AS (SELECT doc_id, ts, unnest(range(0, k)) AS i FROM nc),
        |ch AS (SELECT doc_id, i AS chunk_idx,
        |         array_to_string(ts[CAST(i * 20 + 1 AS BIGINT):CAST(i * 20 + 20 AS BIGINT)], ' ') AS t
        |       FROM idx),
        |f AS (SELECT doc_id, chunk_idx, t,
        |  CAST(len(string_split_regex(t, '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(t, '\s+', '', 'g')) AS DOUBLE) AS wchars,
        |  CAST(length(t) - length(replace(t, '#', '')) AS DOUBLE) AS hashes,
        |  CAST(length(t) - length(replace(t, '...', '')) AS DOUBLE) / 3.0 AS dots,
        |  string_split(t, chr(10)) AS lines,
        |  string_split_regex(t, '\s+') AS words
        |FROM ch),
        |g AS (SELECT doc_id, chunk_idx, t, n_words,
        |  wchars / CAST(n_words AS DOUBLE) AS mean_word_len,
        |  (hashes + dots) / CAST(n_words AS DOUBLE) AS symbol_ratio,
        |  CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
        |    / CAST(len(lines) AS DOUBLE) AS bullet_frac,
        |  CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.$'))) AS DOUBLE)
        |    / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
        |  CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |    / CAST(n_words AS DOUBLE) AS alpha_frac,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |       w -> list_contains(words, w))) AS BIGINT) AS stop_hits
        |FROM f),
        |kept AS (SELECT doc_id, chunk_idx, t FROM g
        |  WHERE n_words >= 10 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 12.0
        |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8 AND stop_hits >= 1)
        |SELECT doc_id, count(*) AS n_kept,
        |       string_agg(t, ' ' ORDER BY chunk_idx) AS text_rescued
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_substr_incremental" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts
        |           FROM documents WHERE doc_id % 3 = 0),
        |hist AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts
        |         FROM documents WHERE doc_id % 3 <> 0),
        |hw AS (SELECT DISTINCT ('0x' || substr(md5(unnest(
        |           CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |                ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |           END)), 1, 15))::BIGINT AS wh
        |       FROM hist),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |dn AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |d AS (SELECT wh FROM dn UNION SELECT wh FROM hw),
        |ds AS (SELECT doc_id, list_sort(list(pos)) AS starts
        |       FROM (SELECT DISTINCT doc_id, pos FROM e JOIN d USING (wh)) GROUP BY doc_id),
        |r AS (SELECT t.doc_id, t.ts,
        |             coalesce(ds.starts, CAST([] AS INTEGER[])) AS starts
        |      FROM t LEFT JOIN ds USING (doc_id)),
        |k AS (SELECT doc_id, ts,
        |             list_filter(range(0, len(ts)),
        |               j -> len(list_filter(starts, s -> s <= j AND j < s + 20)) = 0) AS kept
        |      FROM r)
        |SELECT doc_id,
        |       coalesce(array_to_string(list_transform(kept, j -> ts[j + 1]), ' '), '') AS text_clean,
        |       CAST(len(ts) AS BIGINT) AS n_tokens,
        |       CAST(len(ts) - len(kept) AS BIGINT) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_substr_provenance" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |p AS (SELECT doc_id, pos, wh FROM e JOIN d USING (wh)),
        |o AS (SELECT doc_id, pos, wh,
        |             row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn FROM p),
        |f1 AS (SELECT wh, doc_id AS ed, pos AS ep FROM o WHERE rn = 1),
        |f2 AS (SELECT wh, doc_id AS ed, pos AS ep FROM o WHERE rn = 2),
        |ex AS (SELECT o.doc_id, o.pos,
        |              CASE WHEN o.rn = 1 THEN f2.ed ELSE f1.ed END AS example_doc,
        |              CAST(CASE WHEN o.rn = 1 THEN f2.ep ELSE f1.ep END AS BIGINT) AS example_pos
        |       FROM o JOIN f1 USING (wh) JOIN f2 USING (wh)),
        |b AS (SELECT doc_id, pos,
        |             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM (SELECT DISTINCT doc_id, pos FROM p)),
        |i AS (SELECT doc_id, pos,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |      FROM b),
        |sp AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |              CAST(max(pos) + 20 AS BIGINT) AS span_end,
        |              count(*) AS n_windows
        |       FROM i GROUP BY doc_id, island)
        |SELECT sp.doc_id, sp.span_start, sp.span_end, sp.n_windows,
        |       ex.example_doc, ex.example_pos
        |FROM sp JOIN ex ON ex.doc_id = sp.doc_id AND ex.pos = sp.span_start
        |ORDER BY sp.doc_id, sp.span_start""".stripMargin,

    "q_substr_spans" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |p AS (SELECT doc_id, pos FROM e JOIN d USING (wh)),
        |b AS (SELECT doc_id, pos,
        |             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM p),
        |i AS (SELECT doc_id, pos,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |      FROM b)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |       CAST(max(pos) + 20 AS BIGINT) AS span_end,
        |       count(*) AS n_windows
        |FROM i GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    "q_substr_dedup" ->
      // sliding 20-token windows (short docs -> one whole-text window, the
      // shingleStrings rule), duplicate anywhere -> every covered token of
      // every occurrence drops; kept tokens rejoin in order
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |ds AS (SELECT doc_id, list_sort(list(pos)) AS starts
        |       FROM e JOIN d USING (wh) GROUP BY doc_id),
        |r AS (SELECT t.doc_id, t.ts,
        |             coalesce(ds.starts, CAST([] AS INTEGER[])) AS starts
        |      FROM t LEFT JOIN ds USING (doc_id)),
        |k AS (SELECT doc_id, ts,
        |             list_filter(range(0, len(ts)),
        |               j -> len(list_filter(starts, s -> s <= j AND j < s + 20)) = 0) AS kept
        |      FROM r)
        |SELECT doc_id,
        |       coalesce(array_to_string(list_transform(kept, j -> ts[j + 1]), ' '), '') AS text_clean,
        |       CAST(len(ts) AS BIGINT) AS n_tokens,
        |       CAST(len(ts) - len(kept) AS BIGINT) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_line_dedup" ->
      """WITH d AS (SELECT doc_id,
        |             'source: ' || source || chr(10) || 'lang: ' || lang || chr(10) || text AS text
        |           FROM documents),
        |t AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM d),
        |e AS (SELECT doc_id, unnest(lines) AS line,
        |             CAST(unnest(range(0, len(lines))) AS INT) AS chunk FROM t),
        |h AS (SELECT doc_id, chunk, line,
        |             ('0x' || substr(md5(line), 1, 15))::BIGINT AS ph FROM e),
        |f AS (SELECT ph FROM (SELECT ph, count(DISTINCT doc_id) AS df FROM h GROUP BY ph)
        |      WHERE df > 1)
        |SELECT doc_id,
        |       coalesce(string_agg(line, chr(10) ORDER BY chunk)
        |                FILTER (WHERE ph NOT IN (SELECT ph FROM f)), '') AS text_clean,
        |       count(*) AS n_lines,
        |       count(*) FILTER (WHERE ph IN (SELECT ph FROM f)) AS n_dropped
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_para_dedup" ->
      // identical chunking (ceil(n/10) passages of 10 tokens), identical
      // md5-60 passage hashes, doc-frequency > 1 → drop, reassembly in
      // chunk order; lockstep unnest pairs each passage with its index
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |p0 AS (SELECT doc_id,
        |         [array_to_string(toks[(i*10+1):((i+1)*10)], chr(32))
        |          for i in range(0, CAST(ceil(len(toks) / 10.0) AS INT))] AS ps
        |       FROM t),
        |e AS (SELECT doc_id, unnest(ps) AS passage,
        |             CAST(unnest(range(0, len(ps))) AS INT) AS chunk FROM p0),
        |h AS (SELECT doc_id, chunk, passage,
        |             ('0x' || substr(md5(passage), 1, 15))::BIGINT AS ph FROM e),
        |f AS (SELECT ph FROM (SELECT ph, count(DISTINCT doc_id) AS df FROM h GROUP BY ph)
        |      WHERE df > 1)
        |SELECT doc_id,
        |       coalesce(string_agg(passage, chr(32) ORDER BY chunk)
        |                FILTER (WHERE ph NOT IN (SELECT ph FROM f)), '') AS text_clean,
        |       count(*) AS n_passages,
        |       count(*) FILTER (WHERE ph IN (SELECT ph FROM f)) AS n_dropped
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |tt AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mult AS (SELECT doc_id, max(c) AS top FROM
        |           (SELECT doc_id, tok, count(*) AS c FROM tt GROUP BY 1, 2) GROUP BY 1),
        |g AS (SELECT doc_id, len(toks) AS nt, len(list_distinct(toks)) AS dt,
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks, chr(32))]
        |             ELSE [array_to_string(toks[i:i+2], chr(32)) for i in range(1, len(toks) - 1)]
        |        END AS sh
        |      FROM t)
        |SELECT g.doc_id, nt AS n_tokens, dt AS distinct_tokens, mult.top AS top_token_count,
        |       len(sh) AS n_ngrams, len(list_distinct(sh)) AS distinct_ngrams,
        |       CAST(nt - dt AS DOUBLE) / CAST(nt AS DOUBLE) AS dup_token_frac,
        |       CAST(mult.top AS DOUBLE) / CAST(nt AS DOUBLE) AS top_token_frac,
        |       CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE) AS dup_ngram_frac
        |FROM g JOIN mult ON g.doc_id = mult.doc_id ORDER BY g.doc_id""".stripMargin,

    "q_contamination" ->
      // same 3-token shingles (<3 tokens → one whole-text shingle), same
      // md5-60 hashes, distinct per doc BEFORE counting overlap
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        list_distinct(list_transform(
        |          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, chr(32))]
        |               ELSE [array_to_string(toks[i:i+2], chr(32)) for i in range(1, len(toks) - 1)]
        |          END,
        |          x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS gh
        |      FROM t),
        |ev AS (SELECT DISTINCT unnest(gh) AS g FROM s WHERE doc_id % 50 = 0),
        |co AS (SELECT doc_id, unnest(gh) AS g FROM s WHERE doc_id % 50 <> 0),
        |hits AS (SELECT doc_id, count(*) AS n_overlap FROM co JOIN ev USING (g) GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(hits.n_overlap, 0) AS n_overlap,
        |       coalesce(hits.n_overlap, 0) > 0 AS contaminated
        |FROM s LEFT JOIN hits ON s.doc_id = hits.doc_id
        |WHERE s.doc_id % 50 <> 0 ORDER BY s.doc_id""".stripMargin,

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

    "q_bloom_join" ->
      // the oracle rebuilds the EXACT filter: same 60-bit key hash, same
      // double-hashed probe positions (h + j*(1 + h mod (m-1))) mod m with
      // m=8192, k=3 — a customer passes iff all 3 probes hit the position
      // set, so false positives reproduce bit-for-bit
      """WITH ch AS (SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |            FROM customer WHERE c_acctbal > 9000.0),
        |pos AS (SELECT DISTINCT (h + j.i * (1 + h % 4095)) % 4096 AS p
        |        FROM ch, (SELECT unnest(range(3)) AS i) j),
        |oh AS (SELECT o_orderkey, o_custkey,
        |              ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |       FROM orders),
        |op AS (SELECT o_orderkey, o_custkey, (h + j.i * (1 + h % 4095)) % 4096 AS p
        |       FROM oh, (SELECT unnest(range(3)) AS i) j)
        |SELECT o_orderkey, any_value(o_custkey) AS o_custkey
        |FROM op JOIN pos USING (p)
        |GROUP BY o_orderkey HAVING count(*) = 3 ORDER BY o_orderkey""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 1000
        |ORDER BY doc_id""".stripMargin,

    "q_cap_per_key" ->
      """WITH n AS (SELECT source AS k, count(*) AS kn FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN n ON d.source IS NOT DISTINCT FROM n.k
        |WHERE n.kn <= 10
        |   OR ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |      < CAST(ceil(CAST(10 AS DOUBLE) / CAST(kn AS DOUBLE) * 10000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    "q_url_dedup" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    'http://' || lower(lang || '-' || source) || '.com/p/' || (doc_id % 25) AS url_canon
        |  FROM documents)
        |SELECT url_canon, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM c GROUP BY url_canon ORDER BY url_canon""".stripMargin,

    "q_domain_skew" ->
      s"""$urlSqlPrefix,
         |n AS (SELECT domain, count(*) AS n FROM dom2 GROUP BY domain),
         |t2 AS (SELECT domain, n,
         |         CAST(row_number() OVER (ORDER BY n DESC, domain) AS INT) AS rank,
         |         sum(n) OVER (ORDER BY n DESC, domain
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         |         (SELECT sum(n) FROM n) AS tot
         |       FROM n)
         |SELECT rank, domain, n,
         |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
         |  CAST(cum_n AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
         |FROM t2 WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_url_domain" ->
      s"""$urlSqlPrefix
         |SELECT doc_id, url,
         |  (CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END)
         |  || host || portout || path
         |  || (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS url_canon,
         |  domain
         |FROM dom2 ORDER BY doc_id""".stripMargin,

    "q_domain_cap" ->
      s"""$urlSqlPrefix,
         |n AS (SELECT domain AS k, count(*) AS kn FROM dom2 GROUP BY domain)
         |SELECT d.doc_id, d.domain
         |FROM dom2 d JOIN n ON d.domain IS NOT DISTINCT FROM n.k
         |WHERE n.kn <= 12
         |   OR ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
         |      < CAST(ceil(CAST(12 AS DOUBLE) / CAST(kn AS DOUBLE) * 10000) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 <
        |      CASE WHEN lang = 'en' THEN 2000 WHEN lang = 'es' THEN 5000 ELSE 500 END
        |ORDER BY doc_id""".stripMargin,

    "q_mixture_sample" ->
      // identical double tree as Sampling.mixtureSample: nmax =
      // min(n/t), keep threshold = round(t * nmax / n * buckets)
      """WITH tt AS (SELECT * FROM (VALUES ('en', 0.5), ('es', 0.3), ('de', 0.2)) t(lang, tgt)),
        |n AS (SELECT d.lang, tgt, count(*) AS n
        |      FROM documents d JOIN tt ON d.lang = tt.lang GROUP BY d.lang, tgt),
        |m AS (SELECT min(CAST(n AS DOUBLE) / tgt) AS nmax FROM n),
        |k AS (SELECT lang, CAST(round(tgt * nmax / CAST(n AS DOUBLE) * 10000) AS BIGINT) AS keep
        |      FROM n, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN k ON d.lang = k.lang
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < keep
        |ORDER BY d.doc_id""".stripMargin,

    "q_dataset_card" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT) AS distinct_texts,
        |  CAST(sum(CASE WHEN len(string_split_regex(text, '\s+')) < 30 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  CAST(min(len(string_split_regex(text, '\s+'))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens
        |FROM documents""".stripMargin,

    "q_card_by_lang" ->
      """SELECT lang AS grp, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT) AS distinct_texts,
        |  CAST(sum(CASE WHEN len(string_split_regex(text, '\s+')) < 30 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  CAST(min(len(string_split_regex(text, '\s+'))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens
        |FROM documents GROUP BY lang ORDER BY grp""".stripMargin,

    "q_probe_weights" ->
      s"""WITH ${probeOracleRounds(5, 50000L)}
         |SELECT w0, w1, w2, w3 FROM w5""".stripMargin,

    "q_probe_scores" ->
      s"""WITH ${probeOracleRounds(5, 50000L)}
         |SELECT f.doc_id, f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 AS pred_fx
         |FROM f, w5 w ORDER BY f.doc_id""".stripMargin,

    "q_mixture_temp" ->
      // identical double tree as temperatureSample -> mixtureSample:
      // tgt = sqrt(n), nmax = min(n/tgt), keep = round(tgt*nmax/n*10000)
      """WITH n AS (SELECT source, count(*) AS n FROM documents
        |           WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS tgt FROM n),
        |m AS (SELECT min(CAST(n AS DOUBLE) / tgt) AS nmax FROM t),
        |k AS (SELECT source, CAST(round(tgt * nmax / CAST(n AS DOUBLE) * 10000) AS BIGINT) AS keep
        |      FROM t, m)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN k ON d.source = k.source
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < keep
        |ORDER BY d.doc_id""".stripMargin,

    "q_top_per_key" ->
      // rank by the identical md5-60 hash per source; the KMV keeps the 8
      // smallest DISTINCT hashes, which over unique doc_ids is rank <= 8
      """WITH h AS (SELECT doc_id, source,
        |                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |           FROM documents),
        |r AS (SELECT doc_id, source,
        |             row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
        |      FROM h)
        |SELECT doc_id, source FROM r WHERE rn <= 8 ORDER BY doc_id""".stripMargin,

    "q_split_assign" ->
      """SELECT source, split, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (
        |  SELECT source, doc_id,
        |    CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val'
        |         WHEN b < 10000 THEN 'test' END AS split
        |  FROM (SELECT source, doc_id,
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))::BIGINT % 10000 AS b
        |        FROM documents))
        |GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q_commonness" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
        |g AS (SELECT t.doc_id, CAST(sum(tf.tf) AS BIGINT) AS tf_sum, count(*) AS n_tokens
        |      FROM t JOIN tf ON t.token = tf.token GROUP BY t.doc_id)
        |SELECT doc_id, tf_sum, n_tokens,
        |       CAST(tf_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS commonness
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_commonness_cms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |           FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM t),
        |cms AS (SELECT j, (h + j * (1 + h % 1023)) % 1024 AS pos, count(*) AS cnt
        |        FROM h, generate_series(0, 3) s(j) GROUP BY j, pos),
        |q AS (SELECT DISTINCT h FROM h),
        |e0 AS (SELECT h, j, (h + j * (1 + h % 1023)) % 1024 AS pos
        |       FROM q, generate_series(0, 3) s(j)),
        |e AS (SELECT h, min(cms.cnt) AS est
        |      FROM e0 JOIN cms ON cms.j = e0.j AND cms.pos = e0.pos GROUP BY h),
        |g AS (SELECT doc_id, CAST(sum(e.est) AS BIGINT) AS tf_sum_est, count(*) AS n_tokens
        |      FROM h JOIN e USING (h) GROUP BY doc_id)
        |SELECT doc_id, tf_sum_est, n_tokens,
        |       CAST(tf_sum_est AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS commonness_est
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_bpe_merges" -> bpeMergesOracleSql(4, "[a-z]+"),

    "q_bpe_tokens" -> bpeTokensOracleSql(4, "[a-z]+"),

    "q_collocations" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |u AS (SELECT t, count(*) AS cu FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1),
        |ut AS (SELECT CAST(sum(cu) AS BIGINT) AS u FROM u),
        |idx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks),
        |big AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM idx),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM big),
        |bc AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1, 2 HAVING count(*) >= 20),
        |j AS (SELECT bc.w1, bc.w2, bc.c_ab, a.cu AS c_a, b.cu AS c_b
        |      FROM bc JOIN u a ON a.t = bc.w1 JOIN u b ON b.t = bc.w2),
        |sc AS (SELECT w1, w2, c_ab, c_a, c_b,
        |  ln((CAST(c_ab AS DOUBLE) * (CAST(u AS DOUBLE) * CAST(u AS DOUBLE)))
        |     / (CAST(t AS DOUBLE) * (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)))) AS x
        |FROM j CROSS JOIN ut CROSS JOIN tt),
        |fx AS (SELECT w1, w2, c_ab, c_a, c_b,
        |  CAST(CASE WHEN x >= 0 THEN floor(x * 1000000000.0 + 0.5)
        |            ELSE -floor(-x * 1000000000.0 + 0.5) END AS BIGINT) AS pmi_fx
        |FROM sc)
        |SELECT w1, w2, c_ab, c_a, c_b, pmi_fx, CAST(pmi_fx AS DOUBLE) / 1000000000.0 AS pmi
        |FROM fx ORDER BY pmi_fx DESC, w1 ASC, w2 ASC LIMIT 30""".stripMargin,

    "q_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |pd AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfs AS (SELECT token, count(*) AS df_docs FROM pd GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM documents),
        |s AS (SELECT pd.doc_id, pd.token, pd.tf, dfs.df_docs,
        |  CAST(floor(CAST(pd.tf AS DOUBLE) * ln((CAST(nd AS DOUBLE) + 1.0) / (CAST(df_docs AS DOUBLE) + 1.0)) * 1000000.0 + 0.5) AS BIGINT) AS score_fx
        |FROM pd JOIN dfs USING (token) CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_fx DESC, token ASC) AS INTEGER) AS rank FROM s)
        |SELECT doc_id, rank, token, tf, df_docs, score_fx, CAST(score_fx AS DOUBLE) / 1000000.0 AS tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_vocab" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |g AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df_docs FROM t GROUP BY token)
        |SELECT token, tf, df_docs FROM g
        |ORDER BY tf DESC, token ASC LIMIT 20""".stripMargin,

    "q_percentiles_group" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_quality_filter" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS atl,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS sr
        |FROM documents),
        |r AS (SELECT doc_id, CASE
        |  WHEN nt < 30 THEN 'too_short'
        |  WHEN nt > 100000 THEN 'too_long'
        |  WHEN atl > 5.0 THEN 'avg_token_len_high'
        |  WHEN sr < 0.02 THEN 'low_stopword_ratio'
        |  ELSE 'ok' END AS reason FROM f)
        |SELECT doc_id, reason = 'ok' AS keep, reason FROM r ORDER BY doc_id""".stripMargin,

    "q_gopher" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS wchars,
        |  CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
        |  CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0 AS dots,
        |  string_split(text, chr(10)) AS lines,
        |  string_split_regex(text, '\s+') AS words
        |FROM documents),
        |g AS (SELECT doc_id, n_words,
        |  wchars / CAST(n_words AS DOUBLE) AS mean_word_len,
        |  (hashes + dots) / CAST(n_words AS DOUBLE) AS symbol_ratio,
        |  CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
        |    / CAST(len(lines) AS DOUBLE) AS bullet_frac,
        |  CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.$'))) AS DOUBLE)
        |    / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
        |  CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |    / CAST(n_words AS DOUBLE) AS alpha_frac,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |       w -> list_contains(words, w))) AS BIGINT) AS stop_hits
        |FROM f),
        |r AS (SELECT *,
        |  n_words >= 20 AND n_words <= 100000 AS r_words,
        |  mean_word_len >= 3.0 AND mean_word_len <= 12.0 AS r_word_len,
        |  symbol_ratio <= 0.1 AS r_symbol,
        |  bullet_frac <= 0.9 AS r_bullet,
        |  ellipsis_frac <= 0.3 AS r_ellipsis,
        |  alpha_frac >= 0.8 AS r_alpha,
        |  stop_hits >= 2 AS r_stopwords
        |FROM g)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |       ellipsis_frac, alpha_frac, stop_hits, r_words, r_word_len,
        |       r_symbol, r_bullet, r_ellipsis, r_alpha, r_stopwords,
        |       r_words AND r_word_len AND r_symbol AND r_bullet AND r_ellipsis
        |         AND r_alpha AND r_stopwords AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_pipeline_e2e" ->
      // composed: quality-keep ids -> passage dedup over survivors -> exact
      // dedup by rewritten text (min doc_id) -> md5-60 50% sample
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS atl,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS sr
        |FROM documents),
        |keepids AS (SELECT doc_id FROM f
        |            WHERE NOT (nt < 30) AND NOT (nt > 100000)
        |              AND NOT (atl > 5.0) AND NOT (sr < 0.02)),
        |t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
        |      WHERE doc_id IN (SELECT doc_id FROM keepids)),
        |p0 AS (SELECT doc_id,
        |         [array_to_string(toks[(i*10+1):((i+1)*10)], chr(32))
        |          for i in range(0, CAST(ceil(len(toks) / 10.0) AS INT))] AS ps
        |       FROM t),
        |e AS (SELECT doc_id, unnest(ps) AS passage,
        |             CAST(unnest(range(0, len(ps))) AS INT) AS chunk FROM p0),
        |h AS (SELECT doc_id, chunk, passage,
        |             ('0x' || substr(md5(passage), 1, 15))::BIGINT AS ph FROM e),
        |dropped AS (SELECT ph FROM (SELECT ph, count(DISTINCT doc_id) AS df FROM h GROUP BY ph)
        |            WHERE df > 1),
        |cleaned AS (SELECT doc_id,
        |              coalesce(string_agg(passage, chr(32) ORDER BY chunk)
        |                       FILTER (WHERE ph NOT IN (SELECT ph FROM dropped)), '') AS text_clean
        |            FROM h GROUP BY doc_id),
        |deduped AS (SELECT text_clean, min(doc_id) AS doc_id FROM cleaned
        |            WHERE length(text_clean) > 0 GROUP BY text_clean)
        |SELECT doc_id, text_clean FROM deduped
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 5000
        |ORDER BY doc_id""".stripMargin,

    "q_redact" ->
      """SELECT c_custkey, regexp_replace(c_name, '[0-9]{6,}', '<ID>', 'g') AS redacted
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_embed_centroids" ->
      """WITH e AS (SELECT label AS grp, CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
        |                  unnest(embedding) AS v
        |           FROM embeddings)
        |SELECT grp, dim,
        |       CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE) /
        |       CAST(count(*) AS DOUBLE) AS centroid
        |FROM e GROUP BY grp, dim ORDER BY grp, dim""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_robust_scale" ->
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS fx
        |FROM lineitem),
        |q AS (SELECT quantile_cont(fx, 0.25) AS q1, quantile_cont(fx, 0.5) AS med,
        |             quantile_cont(fx, 0.75) AS q3 FROM f)
        |SELECT (CAST(fx AS DOUBLE) - med) / (q3 - q1) AS rz, count(*) AS n
        |FROM f CROSS JOIN q
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_spearman" ->
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y
        |FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cx AS (SELECT x AS v, count(*) AS c FROM f GROUP BY 1),
        |rx AS (SELECT v, (sum(c) OVER (ORDER BY v) - c) * 2 + c + 1 AS dr FROM cx),
        |cy AS (SELECT y AS v, count(*) AS c FROM f GROUP BY 1),
        |ry AS (SELECT v, (sum(c) OVER (ORDER BY v) - c) * 2 + c + 1 AS dr FROM cy),
        |j AS (SELECT rx.dr AS a, ry.dr AS b
        |      FROM f JOIN rx ON f.x = rx.v JOIN ry ON f.y = ry.v),
        |m AS (SELECT count(*) AS n,
        |  sum(CAST(a AS HUGEINT)) AS sx, sum(CAST(b AS HUGEINT)) AS sy,
        |  sum(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS sxx,
        |  sum(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS syy,
        |  sum(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sxy
        |FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |       CASE WHEN dx > 0.0 AND dy > 0.0
        |            THEN num / (sqrt(dx) * sqrt(dy)) END AS rho
        |FROM (SELECT n,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m)""".stripMargin,

    "q_corr_matrix" ->
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5) ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS q0,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5) ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS q1,
        |  CAST(CASE WHEN l_discount >= 0 THEN floor(l_discount * 100.0 + 0.5) ELSE -floor(-l_discount * 100.0 + 0.5) END AS BIGINT) AS q2,
        |  CAST(CASE WHEN l_tax >= 0 THEN floor(l_tax * 100.0 + 0.5) ELSE -floor(-l_tax * 100.0 + 0.5) END AS BIGINT) AS q3
        |FROM lineitem),
        |m AS (SELECT
        |  count(*) AS n,
        |  sum(CAST(q0 AS HUGEINT)) AS s0,
        |  sum(CAST(q1 AS HUGEINT)) AS s1,
        |  sum(CAST(q2 AS HUGEINT)) AS s2,
        |  sum(CAST(q3 AS HUGEINT)) AS s3,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q0 AS HUGEINT)) AS p00,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q1 AS HUGEINT)) AS p01,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q2 AS HUGEINT)) AS p02,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p03,
        |  sum(CAST(q1 AS HUGEINT) * CAST(q1 AS HUGEINT)) AS p11,
        |  sum(CAST(q1 AS HUGEINT) * CAST(q2 AS HUGEINT)) AS p12,
        |  sum(CAST(q1 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p13,
        |  sum(CAST(q2 AS HUGEINT) * CAST(q2 AS HUGEINT)) AS p22,
        |  sum(CAST(q2 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p23,
        |  sum(CAST(q3 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p33
        |FROM f)
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
        |  CASE WHEN CAST(n * p00 - s0 * s0 AS DOUBLE) > 0.0 AND CAST(n * p11 - s1 * s1 AS DOUBLE) > 0.0
        |  THEN CAST(n * p01 - s0 * s1 AS DOUBLE) / (sqrt(CAST(n * p00 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * p11 - s1 * s1 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, n,
        |  CASE WHEN CAST(n * p00 - s0 * s0 AS DOUBLE) > 0.0 AND CAST(n * p22 - s2 * s2 AS DOUBLE) > 0.0
        |  THEN CAST(n * p02 - s0 * s2 AS DOUBLE) / (sqrt(CAST(n * p00 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * p22 - s2 * s2 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b, n,
        |  CASE WHEN CAST(n * p00 - s0 * s0 AS DOUBLE) > 0.0 AND CAST(n * p33 - s3 * s3 AS DOUBLE) > 0.0
        |  THEN CAST(n * p03 - s0 * s3 AS DOUBLE) / (sqrt(CAST(n * p00 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * p33 - s3 * s3 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, n,
        |  CASE WHEN CAST(n * p11 - s1 * s1 AS DOUBLE) > 0.0 AND CAST(n * p22 - s2 * s2 AS DOUBLE) > 0.0
        |  THEN CAST(n * p12 - s1 * s2 AS DOUBLE) / (sqrt(CAST(n * p11 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * p22 - s2 * s2 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b, n,
        |  CASE WHEN CAST(n * p11 - s1 * s1 AS DOUBLE) > 0.0 AND CAST(n * p33 - s3 * s3 AS DOUBLE) > 0.0
        |  THEN CAST(n * p13 - s1 * s3 AS DOUBLE) / (sqrt(CAST(n * p11 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * p33 - s3 * s3 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_discount' AS col_a, 'l_tax' AS col_b, n,
        |  CASE WHEN CAST(n * p22 - s2 * s2 AS DOUBLE) > 0.0 AND CAST(n * p33 - s3 * s3 AS DOUBLE) > 0.0
        |  THEN CAST(n * p23 - s2 * s3 AS DOUBLE) / (sqrt(CAST(n * p22 - s2 * s2 AS DOUBLE)) * sqrt(CAST(n * p33 - s3 * s3 AS DOUBLE))) END AS corr FROM m
        |ORDER BY col_a, col_b""".stripMargin,

    "q_skyline" ->
      """WITH a AS (SELECT l_suppkey AS suppkey,
        |    CAST(sum(CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                       ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS revenue_c,
        |    count(*) AS n_items,
        |    CAST(sum(CAST(CASE WHEN l_discount >= 0 THEN floor(l_discount * 100.0 + 0.5)
        |                       ELSE -floor(-l_discount * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS disc_c
        |  FROM lineitem GROUP BY 1)
        |SELECT suppkey, revenue_c, n_items, disc_c FROM a r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM a s
        |  WHERE s.revenue_c >= r.revenue_c AND s.n_items >= r.n_items AND s.disc_c <= r.disc_c
        |    AND (s.revenue_c > r.revenue_c OR s.n_items > r.n_items OR s.disc_c < r.disc_c))
        |ORDER BY suppkey""".stripMargin,

    "q_embed_cov" ->
      """WITH q AS (SELECT list_transform(embedding,
        |             x -> CAST(CASE WHEN x >= 0 THEN floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |                            ELSE -floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) END AS BIGINT)) AS qq
        |           FROM embeddings WHERE len(embedding) = 64),
        |g AS (SELECT d.d AS d, e.e AS e
        |      FROM (SELECT unnest(range(64)) AS d) d, (SELECT unnest(range(64)) AS e) e
        |      WHERE e.e >= d.d)
        |SELECT CAST(g.d AS INT) AS d, CAST(g.e AS INT) AS e,
        |       CAST(sum(q.qq[g.d + 1] * q.qq[g.e + 1]) AS BIGINT) AS spp,
        |       CAST(sum(q.qq[g.d + 1]) AS BIGINT) AS s_d,
        |       CAST(sum(q.qq[g.e + 1]) AS BIGINT) AS s_e,
        |       count(*) AS n
        |FROM q CROSS JOIN g GROUP BY g.d, g.e ORDER BY d, e""".stripMargin,

    "q_pack" ->
      """SELECT doc_id, n_tokens, tok_start,
        |  CASE WHEN n_tokens > 0 THEN tok_start // 128 END AS first_chunk,
        |  CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 128 END AS last_chunk,
        |  CASE WHEN n_tokens > 0 THEN tok_start % 128 END AS chunk_offset
        |FROM (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_lm_perplexity" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |idx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks),
        |big AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2 FROM idx),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM toks)),
        |bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM bc GROUP BY 1),
        |sc AS (SELECT big.doc_id,
        |         ln(CAST(bc.c + 1 AS DOUBLE) / CAST(ctx.cc + (SELECT v FROM v) AS DOUBLE)) AS x
        |       FROM big JOIN bc USING (w1, w2) JOIN ctx USING (w1)),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM sc),
        |agg AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(fx) AS BIGINT) AS sum_lnfx
        |        FROM fx GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |       coalesce(a.sum_lnfx, 0) AS sum_lnfx
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_dsir" -> {
      val B = 512
      s"""WITH feats AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_concat(string_split_regex(text, '\\s+'), ${duckShingles(2)})) AS t
         |  FROM documents),
         |fb AS MATERIALIZED (SELECT doc_id, $duckTokenHash % $B AS b FROM feats),
         |tc AS (SELECT b, count(*) AS c FROM fb WHERE doc_id % 7 = 0 GROUP BY 1),
         |rc AS (SELECT b, count(*) AS c FROM fb GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM tc),
         |tr AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM rc),
         |ratio AS (SELECT bs.b,
         |    ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / CAST((SELECT t FROM tt) + $B AS DOUBLE)) -
         |    ln(CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) / CAST((SELECT t FROM tr) + $B AS DOUBLE)) AS x
         |  FROM (SELECT unnest(range(0, $B)) AS b) bs
         |  LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)),
         |rfx AS (SELECT b, CAST(CASE WHEN x >= 0 THEN floor(x * 1000000000.0 + 0.5)
         |                            ELSE -floor(-x * 1000000000.0 + 0.5) END AS BIGINT) AS fx
         |        FROM ratio),
         |sc AS (SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |         CAST(sum(rfx.fx) AS BIGINT) AS weight_fx
         |       FROM fb JOIN rfx USING (b) GROUP BY 1)
         |SELECT d.doc_id, coalesce(sc.n_feats, 0) AS n_feats,
         |       coalesce(sc.weight_fx, 0) AS weight_fx
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "q_shard" ->
      """WITH s(s, pos) AS (VALUES ('s0', 0), ('s1', 1), ('s2', 2), ('s3', 3), ('s4', 4)),
        |h AS (SELECT c_custkey AS id, s.s, s.pos,
        |        ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|shard|' || s.s), 1, 15))::BIGINT AS h
        |      FROM customer, s),
        |r AS (SELECT id, s, row_number() OVER (PARTITION BY id ORDER BY h DESC, pos ASC) AS rn FROM h)
        |SELECT id, s AS shard FROM r WHERE rn = 1 ORDER BY id""".stripMargin,

    "q_snm_pairs" ->
      """WITH r AS (SELECT c_custkey AS id,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS rank
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b, a.rank AS rank_a, b.rank AS rank_b
        |FROM r a JOIN r b ON b.rank > a.rank AND b.rank < a.rank + 5
        |ORDER BY rank_a, rank_b""".stripMargin,

    "q_jaro_pairs" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |r AS (SELECT id, name,
        |    CAST(row_number() OVER (ORDER BY name, id) AS BIGINT) - 1 AS rank
        |  FROM c)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       jaro_winkler_similarity(a.name, b.name) AS jw
        |FROM r a JOIN r b ON b.rank > a.rank AND b.rank < a.rank + 5
        |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    "q_er_pipeline" ->
      """WITH RECURSIVE
        |r AS (SELECT c_custkey AS id, c_name AS name,
        |        CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS rank
        |      FROM customer),
        |p AS (SELECT a.id AS id_a, b.id AS id_b, a.name AS n_a, b.name AS n_b
        |      FROM r a JOIN r b ON b.rank > a.rank AND b.rank < a.rank + 5),
        |e AS (SELECT id_a, id_b FROM p WHERE levenshtein(n_a, n_b) <= 1),
        |sym AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
        |cc(id, label) AS (
        |  SELECT c_custkey, c_custkey FROM customer
        |  UNION
        |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id)
        |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
        |       min(id) AS canonical, max(id) AS max_id
        |FROM comp GROUP BY 1 HAVING count(*) > 1 ORDER BY component""".stripMargin,

    "q_cdc_roundtrip" ->
      """WITH newsnap AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3 AND doc_id % 10 != 5
        |  UNION ALL
        |  SELECT doc_id, text || ' v2' FROM documents WHERE doc_id % 10 = 5
        |  UNION ALL
        |  SELECT doc_id + 10000, 'new doc ' || CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 10 = 7)
        |SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_h
        |FROM newsnap ORDER BY doc_id""".stripMargin,

    "q_rproject" ->
      """WITH q AS (SELECT vec_id AS id, list_transform(embedding, x ->
        |    CAST(CASE WHEN CAST(x AS DOUBLE) >= 0 THEN floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |              ELSE -floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) END AS BIGINT)) AS qv
        |  FROM embeddings),
        |sg AS (SELECT b.b, d.d,
        |    CASE WHEN ('0x' || substr(md5('rp|' || CAST(b.b AS VARCHAR) || '|' || CAST(d.d AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(range(0, 8)) AS b) b, (SELECT unnest(range(0, 64)) AS d) d),
        |p AS (SELECT q.id, sg.b AS dim_out, CAST(sum(sg.s * q.qv[sg.d + 1]) AS BIGINT) AS p_fx
        |  FROM q, sg GROUP BY 1, 2)
        |SELECT id, CAST(dim_out AS INT) AS dim_out, p_fx
        |FROM p ORDER BY id, dim_out""".stripMargin,

    "q_pagerank" -> pageRankOracleSql(500, 5),
    "q_wpagerank" -> weightedPageRankOracleSql(300, 5),
    "q_hits" -> hitsOracleSql(400, 5),
    "q_communities" -> labelPropOracleSql(300, 4),
    "q_cooc" ->
      """WITH ki AS (SELECT DISTINCT l_orderkey AS k, l_partkey % 150 AS i FROM lineitem),
        |ok AS (SELECT k FROM ki GROUP BY k HAVING count(*) <= 50),
        |c AS (SELECT ki.k, ki.i FROM ki JOIN ok USING (k))
        |SELECT a.i AS item_a, b.i AS item_b, count(*) AS cnt
        |FROM c a JOIN c b ON a.k = b.k AND a.i < b.i
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY item_a, item_b""".stripMargin,
    "q_bfs" -> bfsOracleSql(400, 25, 4),

    "q_triangles" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (SELECT a AS v FROM e UNION SELECT b AS v FROM e),
        |cnt AS (SELECT v, count(*) AS t FROM (
        |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
        |) GROUP BY 1)
        |SELECT n.v AS node, CAST(coalesce(cnt.t, 0) AS BIGINT) AS triangles
        |FROM nodes n LEFT JOIN cnt ON cnt.v = n.v ORDER BY node""".stripMargin,
    "q_clustering" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |deg AS (SELECT v, count(*) AS dg FROM (
        |  SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |cnt AS (SELECT v, count(*) AS t FROM (
        |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
        |) GROUP BY 1)
        |SELECT deg.v AS node, CAST(deg.dg AS BIGINT) AS degree,
        |       CAST(coalesce(cnt.t, 0) AS BIGINT) AS triangles,
        |       CASE WHEN deg.dg >= 2 THEN CAST(coalesce(cnt.t, 0) * 2 AS DOUBLE)
        |            / CAST(deg.dg * (deg.dg - 1) AS DOUBLE) END AS cc
        |FROM deg LEFT JOIN cnt ON cnt.v = deg.v ORDER BY node""".stripMargin,

    "q_assortativity" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |deg AS (SELECT v, count(*) AS dg FROM (
        |  SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |ed AS (SELECT da.dg AS x, db.dg AS y
        |       FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
        |p AS (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             sum(CAST(x AS HUGEINT)) AS sx,
        |             sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(y AS HUGEINT) * y) AS syy,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy
        |      FROM p)
        |SELECT CAST(n // 2 AS BIGINT) AS m,
        |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
        |        AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0
        |  THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS assortativity
        |FROM m""".stripMargin,

    "q_ppr" -> pprOracleSql(500, 5, 10),

    "q_pipeline_pack" ->
      """WITH train AS (
        |  SELECT doc_id, CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))::BIGINT % 10000 < 8000
        |    AND len(string_split_regex(text, '\s+')) >= 25),
        |ps AS (SELECT doc_id, n_tokens,
        |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |       FROM train)
        |SELECT doc_id, n_tokens, tok_start,
        |  CASE WHEN n_tokens > 0 THEN tok_start // 256 END AS first_chunk,
        |  CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 256 END AS last_chunk,
        |  CASE WHEN n_tokens > 0 THEN tok_start % 256 END AS chunk_offset
        |FROM ps ORDER BY doc_id""".stripMargin,

    "q_chunk" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts,
        |              CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |       FROM documents),
        |nc AS (SELECT doc_id, ts,
        |         CASE WHEN n <= 20 THEN 1 ELSE ((n - 20 + 14) // 15) + 1 END AS k
        |       FROM toks),
        |idx AS (SELECT doc_id, ts, unnest(range(0, k)) AS i FROM nc),
        |ch AS (SELECT doc_id, i AS chunk_idx,
        |         array_to_string(ts[CAST(i * 15 + 1 AS BIGINT):CAST(i * 15 + 20 AS BIGINT)], ' ') AS chunk_text
        |       FROM idx)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text,
        |       CAST(len(string_split_regex(chunk_text, '\s+')) AS BIGINT) AS chunk_tokens
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_chunk_sentences" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text, 'spark ', 'spark? ', 'g'),
        |                   '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g') AS text
        |  FROM documents),
        |sp AS (SELECT doc_id,
        |    list_filter(string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |                x -> len(x) > 0) AS ss
        |  FROM p),
        |sen AS (SELECT doc_id, CAST(i AS INT) AS i, ss[i] AS s,
        |               CAST(len(string_split_regex(ss[i], '\s+')) AS INT) AS t
        |        FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM sp)),
        |rec AS (
        |  SELECT doc_id, i, s, t, 0 AS ci, t AS cur FROM sen WHERE i = 1
        |  UNION ALL
        |  SELECT n.doc_id, n.i, n.s, n.t,
        |         CASE WHEN r.cur + n.t > 12 THEN r.ci + 1 ELSE r.ci END,
        |         CASE WHEN r.cur + n.t > 12 THEN n.t ELSE r.cur + n.t END
        |  FROM rec r JOIN sen n ON n.doc_id = r.doc_id AND n.i = r.i + 1),
        |ch AS (SELECT doc_id, ci AS chunk_idx, string_agg(s, ' ' ORDER BY i) AS chunk_text
        |       FROM rec GROUP BY 1, 2)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text,
        |       CAST(len(string_split_regex(chunk_text, '\s+')) AS BIGINT) AS chunk_tokens
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |st AS (SELECT count(*) AS n, CAST(sum(len(ts)) AS BIGINT) AS tt FROM toks),
        |tfq AS (SELECT doc_id, t, count(*) AS tf
        |        FROM (SELECT doc_id, unnest(ts) AS t FROM toks)
        |        WHERE t IN ('spark', 'data', 'join') GROUP BY 1, 2),
        |dft AS (SELECT t, count(*) AS df FROM tfq GROUP BY 1),
        |c AS (SELECT tfq.doc_id,
        |        ln((CAST(st.n - dft.df AS DOUBLE) + 0.5) / (CAST(dft.df AS DOUBLE) + 0.5) + 1.0)
        |        * (CAST(tfq.tf AS DOUBLE) * (1.2 + 1.0))
        |        / (CAST(tfq.tf AS DOUBLE) +
        |           1.2 * (0.25 + 0.75 * (CAST(len(toks.ts) AS DOUBLE)
        |                                 / (CAST(st.tt AS DOUBLE) / CAST(st.n AS DOUBLE))))) AS x
        |      FROM tfq JOIN dft USING (t) JOIN toks USING (doc_id), st),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM c),
        |agg AS (SELECT doc_id, CAST(sum(fx) AS BIGINT) AS score_fx FROM fx GROUP BY 1)
        |SELECT t2.doc_id, CAST(len(t2.ts) AS BIGINT) AS n_tokens,
        |       coalesce(a.score_fx, 0) AS score_fx
        |FROM toks t2 LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_inverted_topk" ->
      s"""WITH $invertedTopkCtes
         |SELECT qid AS query_id, rank, did AS doc_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q_rrf" ->
      s"""WITH $invertedTopkCtes,
         |r5 AS (SELECT qid AS query_id, did AS doc_id, CAST(rank AS BIGINT) AS rank
         |       FROM r WHERE rank <= 5),
         |lq AS (SELECT doc_id AS query_id, n_chars AS qn FROM documents WHERE doc_id < 10),
         |lc AS (SELECT lq.query_id, d.doc_id, abs(d.n_chars - lq.qn) AS dd
         |       FROM lq, documents d WHERE d.doc_id != lq.query_id),
         |lr AS (SELECT query_id, doc_id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY dd ASC, doc_id ASC) AS BIGINT) AS rank
         |       FROM lc),
         |lr5 AS (SELECT query_id, doc_id, rank FROM lr WHERE rank <= 5),
         |uni AS (SELECT * FROM r5 UNION ALL SELECT * FROM lr5),
         |sc2 AS (SELECT query_id, doc_id,
         |          CAST(sum(1000000000000 // (rank + 60)) AS BIGINT) AS rrf_fx,
         |          CAST(count(*) AS BIGINT) AS n_lists
         |        FROM uni GROUP BY 1, 2),
         |fz AS (SELECT query_id, doc_id, rrf_fx, n_lists,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_fx DESC, doc_id ASC) AS INT) AS fused_rank
         |       FROM sc2)
         |SELECT query_id, doc_id, rrf_fx, n_lists, fused_rank
         |FROM fz WHERE fused_rank <= 8
         |ORDER BY query_id, fused_rank""".stripMargin,

    "q_split_time" ->
      """SELECT CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' THEN 'test'
        |            WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 3 DAY THEN NULL
        |            ELSE 'train' END AS split,
        |  count(*) AS n, CAST(sum(event_id) AS BIGINT) AS ck
        |FROM events GROUP BY 1 ORDER BY split NULLS FIRST""".stripMargin,

    "q_sample_weighted" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN pri >= 0 THEN floor(pri * 1000000000.0 + 0.5)
        |            ELSE -floor(-pri * 1000000000.0 + 0.5) END AS BIGINT) AS pri_fx
        |FROM (
        |  SELECT doc_id,
        |    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) + 1.0)
        |        / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS pri
        |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0.0
        |  ORDER BY pri, doc_id LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

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

    "q_text_fold" ->
      """SELECT c_custkey AS id,
        |  nfc_normalize(strip_accents(lower(
        |    CASE CAST(c_custkey % 4 AS INT)
        |      WHEN 0 THEN concat('Café ', c_name)
        |      WHEN 1 THEN concat('ÜBER ', c_name)
        |      WHEN 2 THEN concat('naïve—', c_name)
        |      ELSE upper(c_name) END))) AS folded
        |FROM customer ORDER BY id""".stripMargin,

    "q_html_text" ->
      s"""$htmlSqlCte
         |SELECT doc_id, text_clean FROM cleaned ORDER BY doc_id""".stripMargin,

    "q_html_quality" ->
      s"""$htmlSqlCte,
         |f AS (SELECT doc_id,
         |  CAST(len(string_split_regex(text_clean, '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(text_clean, '\\s+', '', 'g')) AS BIGINT) AS alpha_chars,
         |  CAST(len(list_filter(string_split_regex(text_clean, '\\s+'),
         |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS BIGINT) AS stopword_hits
         |FROM cleaned)
         |SELECT doc_id, n_tokens, alpha_chars, stopword_hits,
         |  CAST(alpha_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
         |  CAST(stopword_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
         |FROM f ORDER BY doc_id""".stripMargin,

    "q_selfrep" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substr(text, 1, 100) || chr(10) || 'COOKIE NOTICE' || chr(10) ||
        |    substr(text, 101, 100) || chr(10) || 'COOKIE NOTICE' || chr(10) ||
        |    'subscribe now' || chr(10) || 'subscribe now' || chr(10) || chr(10) || chr(10) ||
        |    substr(text, 1, 40) AS t2
        |  FROM documents),
        |l AS (SELECT doc_id, string_split(t2, chr(10)) AS u FROM s),
        |o AS (SELECT doc_id, u,
        |        list_filter(u, (x, i) -> list_position(u, x) = i) AS keep
        |      FROM l)
        |SELECT doc_id, array_to_string(keep, chr(10)) AS text_clean,
        |  CAST(len(u) AS BIGINT) AS n_units,
        |  CAST(len(u) - len(keep) AS BIGINT) AS n_dropped
        |FROM o ORDER BY doc_id""".stripMargin,

    "q_text_clean" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    'a' || chr(7) || 'b' || chr(13) || chr(10) || 'c' || chr(13) || 'd' ||
        |    substr(text, 1, 60) ||
        |    'e' || chr(8203) || 'f' || chr(8204) || 'g' || chr(8205) || 'h' ||
        |    chr(65279) || 'i' || chr(160) || 'j' || chr(31) || 'k' || chr(127) ||
        |    'l' || chr(9) || 'm' || chr(10) || ' end' AS noisy
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(noisy, '\r\n', chr(10), 'g'),
        |          '\r', chr(10), 'g'),
        |        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |    '\x{00A0}', ' ', 'g') AS cleaned
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_mojibake" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    substr(text, 1, 80) || ' café naïve piñata — “smart” ‘quotes’ … €9 Ÿ end' AS orig
        |  FROM documents)
        |SELECT doc_id, orig AS fixed,
        |  length(regexp_replace(orig, '[\x00-\x7F]', '', 'g')) AS n_bad
        |FROM o ORDER BY doc_id""".stripMargin,

    "q_record_linkage" ->
      """WITH b AS (SELECT c_custkey AS id, substr(c_name, 1, 16) AS blk,
        |                  c_name, c_mktsegment, c_nationkey FROM customer),
        |p AS (SELECT a.id AS id_a, b2.id AS id_b,
        |  CASE WHEN a.c_name IS NULL OR b2.c_name IS NULL THEN NULL
        |       ELSE (abs(len(a.c_name) - len(b2.c_name)) <= 1 AND levenshtein(a.c_name, b2.c_name) <= 1) END AS agree_c_name,
        |  CASE WHEN a.c_mktsegment IS NULL OR b2.c_mktsegment IS NULL THEN NULL
        |       ELSE a.c_mktsegment = b2.c_mktsegment END AS agree_c_mktsegment,
        |  CASE WHEN a.c_nationkey IS NULL OR b2.c_nationkey IS NULL THEN NULL
        |       ELSE a.c_nationkey = b2.c_nationkey END AS agree_c_nationkey
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.id < b2.id)
        |SELECT id_a, id_b, agree_c_name, agree_c_mktsegment, agree_c_nationkey,
        |  CAST((CASE WHEN agree_c_name IS NULL THEN 0 WHEN agree_c_name THEN 4000 ELSE -1000 END)
        |     + (CASE WHEN agree_c_mktsegment IS NULL THEN 0 WHEN agree_c_mktsegment THEN 1000 ELSE -500 END)
        |     + (CASE WHEN agree_c_nationkey IS NULL THEN 0 WHEN agree_c_nationkey THEN 800 ELSE -400 END) AS BIGINT) AS score_fx,
        |  (CASE WHEN agree_c_name IS NULL THEN 0 WHEN agree_c_name THEN 4000 ELSE -1000 END)
        |     + (CASE WHEN agree_c_mktsegment IS NULL THEN 0 WHEN agree_c_mktsegment THEN 1000 ELSE -500 END)
        |     + (CASE WHEN agree_c_nationkey IS NULL THEN 0 WHEN agree_c_nationkey THEN 800 ELSE -400 END) >= 4000 AS is_match
        |FROM p ORDER BY id_a, id_b""".stripMargin,

    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b
        |  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
        | AND a.c_custkey < b.c_custkey
        | AND abs(len(a.c_name) - len(b.c_name)) <= 1
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "q_psi" ->
      """WITH rb AS (SELECT greatest(least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0) / 10410.0) AS BIGINT), 9), 0) AS bucket,
        |              count(*) AS cnt
        |       FROM lineitem
        |       WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_extendedprice IS NOT NULL
        |       GROUP BY 1),
        |cb AS (SELECT greatest(least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0) / 10410.0) AS BIGINT), 9), 0) AS bucket,
        |              count(*) AS cnt
        |       FROM lineitem
        |       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_extendedprice IS NOT NULL
        |       GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 10)) AS bucket),
        |j AS (SELECT spine.bucket, coalesce(rb.cnt, 0) AS ref_cnt, coalesce(cb.cnt, 0) AS cur_cnt
        |      FROM spine LEFT JOIN rb USING (bucket) LEFT JOIN cb USING (bucket)),
        |tt AS (SELECT CAST(sum(ref_cnt) AS BIGINT) AS nr, CAST(sum(cur_cnt) AS BIGINT) AS nc FROM j),
        |x AS (SELECT bucket, ref_cnt, cur_cnt,
        |        greatest(CAST(ref_cnt AS DOUBLE) / CAST(nr AS DOUBLE), 1e-6) AS p,
        |        greatest(CAST(cur_cnt AS DOUBLE) / CAST(nc AS DOUBLE), 1e-6) AS q
        |      FROM j, tt)
        |SELECT bucket, ref_cnt, cur_cnt,
        |  CAST(CASE WHEN y >= 0 THEN floor(y * 1000000.0 + 0.5)
        |            ELSE -floor(-y * 1000000.0 + 0.5) END AS BIGINT) AS psi_fx
        |FROM (SELECT bucket, ref_cnt, cur_cnt, (p - q) * ln(p / q) AS y FROM x)
        |ORDER BY bucket""".stripMargin,

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

    "q_lm_cross" ->
      """WITH store AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        |fresh AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
        |stoks AS (SELECT string_split_regex(text, '\s+') AS ts FROM store),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM stoks)),
        |sidx AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM stoks),
        |bc AS (SELECT w1, w2, count(*) AS c
        |       FROM (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM sidx) GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM bc GROUP BY 1),
        |ftoks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM fresh),
        |fidx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM ftoks),
        |fbig AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2 FROM fidx),
        |sc AS (SELECT fbig.doc_id,
        |         ln(CAST(coalesce(bc.c, 0) + 1 AS DOUBLE) /
        |            CAST(coalesce(ctx.cc, 0) + (SELECT v FROM v) AS DOUBLE)) AS x
        |       FROM fbig LEFT JOIN bc USING (w1, w2) LEFT JOIN ctx USING (w1)),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM sc),
        |agg AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(fx) AS BIGINT) AS sum_lnfx
        |        FROM fx GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |       coalesce(a.sum_lnfx, 0) AS sum_lnfx
        |FROM fresh d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM (SELECT doc_id, CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS x FROM c)),
        |agg AS (SELECT doc_id, CAST(sum(fx) AS BIGINT) AS sfx FROM fx GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(len(string_split_regex(d.text, '\s+')) AS BIGINT) AS n_tokens,
        |       coalesce(a.sfx, 0) AS sum_clnc_fx
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_json_props" ->
      """SELECT event_type, count(*) AS cnt,
        |       count(k) AS k_cnt,
        |       CAST(sum(k) AS BIGINT) AS k_sum,
        |       min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_text_quality" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS alpha_chars,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS BIGINT) AS stopword_hits
        |FROM documents)
        |SELECT doc_id, n_tokens, alpha_chars, stopword_hits,
        |  CAST(alpha_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
        |  CAST(stopword_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH f AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], t))) AS h_de,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS h_en,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS h_es,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['le','la','de','et','les','des','en','un','du','que'], t))) AS h_fr,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], t))) AS h_zh
        |FROM documents)
        |SELECT doc_id, CASE
        |  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
        |  WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
        |  WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
        |  WHEN h_fr >= h_zh THEN 'fr'
        |  ELSE 'zh' END AS predicted_lang
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_lang_margin" ->
      """WITH f AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], t))) AS h_de,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS h_en,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS h_es,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['le','la','de','et','les','des','en','un','du','que'], t))) AS h_fr,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], t))) AS h_zh
        |FROM documents),
        |u AS (
        |  SELECT doc_id, 'de' AS lang, h_de AS h FROM f
        |  UNION ALL SELECT doc_id, 'en', h_en FROM f
        |  UNION ALL SELECT doc_id, 'es', h_es FROM f
        |  UNION ALL SELECT doc_id, 'fr', h_fr FROM f
        |  UNION ALL SELECT doc_id, 'zh', h_zh FROM f),
        |r AS (SELECT doc_id, lang, h,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) AS rn
        |      FROM u)
        |SELECT t.doc_id, t.lang AS predicted_lang, CAST(t.h AS BIGINT) AS top_hits,
        |  s.lang AS second_lang, CAST(s.h AS BIGINT) AS second_hits,
        |  CAST(t.h - s.h AS BIGINT) AS margin, (t.h - s.h) < 2 AS is_mixed
        |FROM r t JOIN r s ON t.doc_id = s.doc_id AND t.rn = 1 AND s.rn = 2
        |ORDER BY t.doc_id""".stripMargin,

    "q_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |       ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END AS sh
        |      FROM d),
        |f AS (SELECT doc_id, list_sort(list_distinct(list_transform(sh, x -> md5(x))))[1:8] AS fps FROM s)
        |SELECT doc_id, CAST(unnest(range(0, len(fps))) AS INT) AS pos, unnest(fps) AS fp_hash
        |FROM f ORDER BY doc_id, pos""".stripMargin,

    "q_lang_scores" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS BIGINT) AS hits_en,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS BIGINT) AS hits_es
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal" ->
      """SELECT doc_id AS id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
        |FROM documents ORDER BY id""".stripMargin,

    // dHash bit (y, x) of a frame with pixel p(x,y) = ((s*72+y*9+x+1)*K)%256
    // is p(x+1,y) > p(x,y) (the 9x8 frame makes the grid sample 1:1); the
    // Hamming distance between consecutive frames is the count of the 64
    // grid cells whose comparison flips between seeds
    "q_video_shots" ->
      """WITH f AS (
        |  SELECT l_orderkey AS vid, l_linenumber AS fi,
        |         CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                   ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) % 256 AS s
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |o AS (SELECT vid, s,
        |             row_number() OVER (PARTITION BY vid ORDER BY fi, s) - 1 AS idx,
        |             lag(s) OVER (PARTITION BY vid ORDER BY fi, s) AS sp
        |      FROM f),
        |g AS (SELECT y.y AS y, x.x AS x
        |      FROM (SELECT unnest(range(8)) AS y) y, (SELECT unnest(range(8)) AS x) x),
        |h AS (SELECT o.vid, o.idx, max(o.sp IS NULL) AS frst,
        |        CAST(sum(CASE WHEN o.sp IS NOT NULL AND
        |          ((((o.s  * 72 + g.y * 9 + g.x + 2) * 2654435761) % 256) >
        |           (((o.s  * 72 + g.y * 9 + g.x + 1) * 2654435761) % 256)) !=
        |          ((((o.sp * 72 + g.y * 9 + g.x + 2) * 2654435761) % 256) >
        |           (((o.sp * 72 + g.y * 9 + g.x + 1) * 2654435761) % 256))
        |          THEN 1 ELSE 0 END) AS INT) AS ham
        |      FROM o CROSS JOIN g GROUP BY o.vid, o.idx)
        |SELECT vid AS video_id, CAST(idx AS INT) AS frame_idx,
        |  CASE WHEN frst THEN -1 ELSE ham END AS hamming_prev,
        |  (NOT frst AND ham > 20) AS is_boundary,
        |  CAST(sum(CASE WHEN NOT frst AND ham > 20 THEN 1 ELSE 0 END)
        |       OVER (PARTITION BY vid ORDER BY idx
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shot_id
        |FROM h ORDER BY video_id, frame_idx""".stripMargin,

    "q_window_events" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                          ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_sliding" ->
      """WITH g AS (
        |  SELECT date_trunc('hour', ts) + to_minutes(15 * (EXTRACT(minute FROM ts) // 15)) AS grid,
        |         event_type, value
        |  FROM events),
        |e AS (SELECT grid - to_minutes(15 * s.i) AS window_start, event_type, value
        |      FROM g CROSS JOIN (SELECT unnest(range(4)) AS i) s)
        |SELECT window_start, event_type, count(*) AS n_events,
        |       CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                          ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_quality" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       count(*) AS row_count,
        |       count(*) FILTER (WHERE value IS NULL) AS value_missing,
        |       count(*) FILTER (WHERE value IS NOT NULL
        |             AND NOT (CAST(value AS DOUBLE) >= 0.0 AND CAST(value AS DOUBLE) <= 150.0)) AS value_invalid,
        |       count(*) FILTER (WHERE event_type IS NULL) AS event_type_missing,
        |       count(*) FILTER (WHERE event_type IS NOT NULL
        |             AND event_type NOT IN ('click','view','purchase','signup')) AS event_type_invalid
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_quality_by_dim" ->
      """SELECT c_mktsegment,
        |       count(*) AS row_count,
        |       count(*) FILTER (WHERE c_acctbal IS NULL) AS c_acctbal_missing,
        |       count(*) FILTER (WHERE c_acctbal IS NOT NULL
        |             AND NOT (CAST(c_acctbal AS DOUBLE) >= 0.0)) AS c_acctbal_invalid
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (
        |  SELECT user_id, ts,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM x)
        |SELECT user_id, session_id, count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
