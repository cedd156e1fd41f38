package graft.scan

import graft.api._
import graft.yamllite._

/** Parses the reference's scan-YAML shape (tests/test_scan.py:22-72) into
  * a [[graft.api.ScanDefinition]].
  */
object ScanYamlParser {

  def parse(yaml: String): ScanDefinition = fromY(YamlLite.parse(yaml))

  private def strs(v: YValue): Seq[String] = v.asList.map(_.asString)

  private def optStr(m: Map[String, YValue], k: String): Option[String] =
    m.get(k).map(_.asString).filter(_.nonEmpty)

  private def optNum(m: Map[String, YValue], k: String): Option[Double] =
    optStr(m, k).map(_.toDouble)

  private def optInt(m: Map[String, YValue], k: String): Option[Int] =
    optStr(m, k).map(_.toInt)

  def fromY(root: YValue): ScanDefinition = {
    val m = root.asMap
    val cols = m.get("columns").map(_.asMap).getOrElse(Map.empty).map { case (name, v) =>
      name -> columnConfig(v.asMap)
    }
    val sqlMetrics = m.get("sql_metrics").map(_.asList).getOrElse(Nil).map { v =>
      val sm = v.asMap
      SqlMetric(
        sql = sm("sql").asString,
        tests = sm.get("tests").map(strs).getOrElse(Nil),
        groupFields = sm.get("group_fields").map(strs).getOrElse(Nil),
        metricNames = sm.get("metric_names").map(strs).getOrElse(Nil)
      )
    }
    val samples = m.get("samples").map(_.asMap).map { sm =>
      Samples(tableLimit = optInt(sm, "table_limit"), failedLimit = optInt(sm, "failed_limit"))
    }
    // row_checks entries are either a bare expression string or a map with
    // `check:` (the expression) and an optional `name:`
    val rowChecks = m.get("row_checks").map(_.asList).getOrElse(Nil).map {
      case YMap(cm) => RowCheck(cm("check").asString, optStr(cm, "name"))
      case v => RowCheck(v.asString)
    }
    val stream = m.get("stream").map(_.asMap).map { sm =>
      StreamConfig(
        timeColumn = sm("time_column").asString,
        watermark = optStr(sm, "watermark").getOrElse("10 minutes"),
        window = optStr(sm, "window").getOrElse("1 hour"))
    }
    ScanDefinition(
      tableName = m("table_name").asString,
      metrics = m.get("metrics").map(strs).getOrElse(Nil),
      metricGroups = m.get("metric_groups").map(strs).getOrElse(Nil),
      columns = cols,
      excludedColumns = m.get("excluded_columns").map(strs).getOrElse(Nil),
      tests = m.get("tests").map(strs).getOrElse(Nil),
      sqlMetrics = sqlMetrics,
      samples = samples,
      filter = optStr(m, "filter"),
      rowChecks = rowChecks,
      stream = stream,
      coMissingness = m.get("co_missingness").map(strs).getOrElse(Nil),
      inferTypes = m.get("infer_types").map(strs).getOrElse(Nil),
      typesReference = optStr(m, "types_reference")
    )
  }

  private def columnConfig(m: Map[String, YValue]): ColumnConfig =
    ColumnConfig(
      metrics = m.get("metrics").map(strs).getOrElse(Nil),
      metricGroups = m.get("metric_groups").map(strs).getOrElse(Nil),
      tests = m.get("tests").map(strs).getOrElse(Nil),
      missingValues = m.get("missing_values").map(strs).getOrElse(Nil),
      missingFormat = optStr(m, "missing_format"),
      missingRegex = optStr(m, "missing_regex"),
      validFormat = optStr(m, "valid_format"),
      validRegex = optStr(m, "valid_regex"),
      validValues = m.get("valid_values").map(strs).getOrElse(Nil),
      validMin = optNum(m, "valid_min"),
      validMax = optNum(m, "valid_max"),
      validMinLength = optInt(m, "valid_min_length"),
      validMaxLength = optInt(m, "valid_max_length"),
      anomaly = m.get("anomaly").map(_.asMap).map { am =>
        AnomalyConfig(
          key = am("key").asString,
          order = am("order").asString,
          window = optInt(am, "window").getOrElse(20),
          tSquared = optInt(am, "t_squared").map(_.toLong).getOrElse(9L),
          minPoints = optInt(am, "min_points").getOrElse(5),
          minDev = optNum(am, "min_dev").getOrElse(0.0))
      },
      psiReference = optStr(m, "psi_reference"),
      ksReference = optStr(m, "ks_reference"),
      mwuReference = optStr(m, "mwu_reference"),
      chi2Reference = optStr(m, "chi2_reference"),
      w1Reference = optStr(m, "w1_reference"),
      welchReference = optStr(m, "welch_reference"),
      cvmReference = optStr(m, "cvm_reference"),
      energyReference = optStr(m, "energy_reference"),
      adReference = optStr(m, "ad_reference"),
      moodScaleReference = optStr(m, "mood_scale_reference"),
      benford = optInt(m, "benford"),
      concentration = optStr(m, "concentration").exists(_.toBoolean)
    )
}
