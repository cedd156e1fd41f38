package graft

import graft.scan.Scanner
import org.apache.spark.sql.SparkSession

/** Minimal CLI — the `soda scan`-style entry point (the reference ships as
  * an installable package; reference setup.cfg:1-24): run a YAML scan
  * definition against a parquet/CSV/JSON table and print the ScanResult.
  *
  * Usage:
  *   graft.Main <scan.yml> <table-path> [key=value ...]
  *
  * The table format is inferred from the path suffix (.parquet default;
  * .csv with header; .json/.jsonl). Remaining args are `variables`
  * substituted into the scan's `filter:` like the reference's CLI `-v`
  * flags. Exit code: 0 all tests pass, 1 test failures, 2 scan errors /
  * bad invocation — so a scheduler can gate a pipeline on it.
  */
object Main {
  def main(args: Array[String]): Unit = sys.exit(run(args, None))

  /** Testable body: returns the exit code instead of exiting; `sparkIn`
    * lets tests inject their session (CLI builds a local one).
    */
  def run(args: Array[String], sparkIn: Option[SparkSession]): Int = {
    if (args.length < 2) {
      System.err.println("usage: graft.Main <scan.yml> <table-path> [key=value ...]")
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
}
