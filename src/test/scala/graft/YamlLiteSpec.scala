package graft

import graft.scan.ScanYamlParser
import graft.yamllite._
import org.scalatest.funsuite.AnyFunSuite

class YamlLiteSpec extends AnyFunSuite {

  val scanYaml: String =
    """table_name: demodata
      |samples:
      |  table_limit: 50
      |  failed_limit: 50
      |metrics:
      |- row_count
      |- missing_count
      |- max
      |metric_groups:
      |- duplicates
      |tests:
      |- row_count > 0
      |columns:
      |  id:
      |    valid_format: uuid
      |    tests:
      |    - invalid_percentage == 0
      |  amount:
      |    missing_values:
      |    - -1
      |    - N/A
      |    valid_min: 0
      |excluded_columns:
      |- internal_ts
      |sql_metrics:
      |- sql: |
      |    SELECT sum(size) as total_size
      |    FROM demodata
      |    WHERE country = 'US'
      |  tests:
      |  - total_size > 5000
      |- sql: SELECT country, count(id) as cnt FROM demodata GROUP BY country
      |  group_fields:
      |  - country
      |""".stripMargin

  test("parses nested maps, lists, and block scalars") {
    val y = YamlLite.parse(scanYaml).asMap
    assert(y("table_name").asString == "demodata")
    assert(y("metrics").asList.map(_.asString) == Seq("row_count", "missing_count", "max"))
    assert(y("samples").asMap("table_limit").asString == "50")
    val sql0 = y("sql_metrics").asList.head.asMap("sql").asString
    assert(sql0.contains("SELECT sum(size) as total_size\nFROM demodata"))
  }

  test("ScanYamlParser maps to ScanDefinition") {
    val d = ScanYamlParser.parse(scanYaml)
    assert(d.tableName == "demodata")
    assert(d.metrics == Seq("row_count", "missing_count", "max"))
    assert(d.metricGroups == Seq("duplicates"))
    assert(d.tests == Seq("row_count > 0"))
    assert(d.columns("id").validFormat.contains("uuid"))
    assert(d.columns("id").tests == Seq("invalid_percentage == 0"))
    assert(d.columns("amount").missingValues == Seq("-1", "N/A"))
    assert(d.columns("amount").validMin.contains(0.0))
    assert(d.excludedColumns == Seq("internal_ts"))
    assert(d.sqlMetrics.size == 2)
    assert(d.sqlMetrics(0).tests == Seq("total_size > 5000"))
    assert(d.sqlMetrics(1).groupFields == Seq("country"))
    assert(d.samples.exists(_.failedLimit.contains(50)))
  }

  test("comments and quoted scalars") {
    val y = YamlLite.parse(
      """a: 'hello: world' # trailing comment
        |# full-line comment
        |b: "x # not a comment"
        |""".stripMargin).asMap
    assert(y("a").asString == "hello: world")
    assert(y("b").asString == "x # not a comment")
  }
}
