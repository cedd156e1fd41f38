package graft

import graft.queries.Catalog
import graft.scan.Scanner
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: a full soda-style scan (YAML → single-pass metrics → tests)
    * over lineitem at sf0.001; returns the measurements frame (rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val yaml =
      """table_name: lineitem
        |metrics:
        |- row_count
        |- missing_count
        |- values_count
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
        |  l_quantity:
        |    valid_min: 1
        |    valid_max: 50
        |    tests:
        |    - invalid_percentage == 0
        |  l_returnflag:
        |    valid_values:
        |    - A
        |    - N
        |    - R
        |    tests:
        |    - invalid_count == 0
        |""".stripMargin
    val result = Scanner.executeYaml(spark, df, yaml)
    graft.api.ScanResultFrames.measurementsToDF(spark, result.measurements)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
