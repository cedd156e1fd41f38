package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc phase profiler for the end-to-end scan surface (q_scan_wide).
  * Not part of the library; run with
  * `sbt "runMain graft.tools.ProfileScan /root/testdata/sf0.1"`.
  */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rowLevel =
      """table_name: li_p1
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
        |""".stripMargin
    val groupsOnly =
      """table_name: li_p2
        |metric_groups:
        |- duplicates
        |""".stripMargin
    val colExtras =
      """table_name: li_p3
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
        |""".stripMargin

    def yamlFor(ms: String*): String =
      "table_name: li_sub\nmetrics:\n" + ms.map("- " + _).mkString("\n") + "\n"

    // plan shape of the wide pass-1 aggregate: does it stay in WSCG?
    {
      val scan = graft.scan.ScanYamlParser.parse(rowLevel)
      val fields = lineitem.schema.fields
      val ms = scan.metrics.filter(graft.metrics.MetricColumns.rowLevelMetrics)
      val preCols = fields.toSeq.flatMap { f =>
        graft.metrics.MetricColumns.preProjection(f, graft.api.ColumnConfig(), ms)
      }
      val aggCols = fields.toSeq.flatMap { f =>
        graft.metrics.MetricColumns.aggColumns(f, graft.api.ColumnConfig(), ms)
      }
      val base = lineitem.select(org.apache.spark.sql.functions.col("*") +: preCols: _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("row_count"), aggCols: _*)
      println("pass1 agg expr count: " + (aggCols.size + 1))
      val phys = base.queryExecution.executedPlan.toString
      println("pass1 plan (head):")
      phys.linesIterator.take(12).foreach(l => println("  " + l))
    }

    (1 to 3).foreach { round =>
      println(s"-- round $round --")
      timed("full q_scan_wide") {
        graft.SparkEntry.queries("q_scan_wide")(spark, sfDir)
          .queryExecution.toRdd.count()
      }
      timed("pass1 row-level only")(graft.scan.Scanner.executeYaml(spark, lineitem, rowLevel))
      timed("pass2 duplicates only")(graft.scan.Scanner.executeYaml(spark, lineitem, groupsOnly))
      timed("col extras (freq/hist)")(graft.scan.Scanner.executeYaml(spark, lineitem, colExtras))
      timed("p1a min/max only")(graft.scan.Scanner.executeYaml(spark, lineitem, yamlFor("min", "max")))
      timed("p1b avg/sum")(graft.scan.Scanner.executeYaml(spark, lineitem, yamlFor("avg", "sum")))
      timed("p1c variance/stddev")(graft.scan.Scanner.executeYaml(spark, lineitem, yamlFor("variance", "stddev")))
      timed("p1d lengths")(graft.scan.Scanner.executeYaml(spark, lineitem, yamlFor("min_length", "max_length", "avg_length")))
      timed("p1e missing/values")(graft.scan.Scanner.executeYaml(spark, lineitem, yamlFor("missing_count", "values_count")))

      def varYaml(cols: String*): String =
        "table_name: li_var\ncolumns:\n" + cols.map { c =>
          s"  $c:\n    metrics:\n    - variance\n"
        }.mkString
      timed("var 1 double col")(graft.scan.Scanner.executeYaml(spark, lineitem, varYaml("l_quantity")))
      timed("var 4 double cols")(graft.scan.Scanner.executeYaml(spark, lineitem, varYaml("l_quantity", "l_extendedprice", "l_discount", "l_tax")))
      timed("var 1 bigint col")(graft.scan.Scanner.executeYaml(spark, lineitem, varYaml("l_orderkey")))
      timed("var 3 bigint cols")(graft.scan.Scanner.executeYaml(spark, lineitem, varYaml("l_orderkey", "l_partkey", "l_suppkey")))
      val F = org.apache.spark.sql.functions
      timed("floor: raw double sum x*x") {
        lineitem.agg(F.sum(F.col("l_quantity") * F.col("l_quantity")),
          F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")),
          F.sum(F.col("l_discount") * F.col("l_discount")),
          F.sum(F.col("l_tax") * F.col("l_tax"))).collect()
      }
      timed("raw round(x*1e4) long sum") {
        lineitem.agg(
          F.sum(F.round(F.col("l_quantity") * 10000.0).cast("long")),
          F.sum(F.round(F.col("l_extendedprice") * 10000.0).cast("long")),
          F.sum(F.round(F.col("l_discount") * 10000.0).cast("long")),
          F.sum(F.round(F.col("l_tax") * 10000.0).cast("long"))).collect()
      }
    }
    spark.stop()
  }
}
