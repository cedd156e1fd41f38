package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The gate catalog: every SURVEY.md §2 operator gets a query + (where
  * SQL-expressible) a DuckDB oracle. Float outputs are derived from
  * decimal-exact sums with identical expression trees on both sides
  * (SURVEY.md §3), so hash comparison is bit-exact.
  */
object Catalog {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    SodaQueries.queries ++
    RelationalQueries.queries ++
    DedupQueries.queries ++
    SimilarityQueries.queries ++
    TextQueries.queries ++
    StatsQueries.queries ++
    GraphQueries.queries ++
    SamplingQueries.queries ++
    EventsQueries.queries

  val oracleSql: Map[String, String] =
    SodaQueries.oracleSql ++
    RelationalQueries.oracleSql ++
    DedupQueries.oracleSql ++
    SimilarityQueries.oracleSql ++
    TextQueries.oracleSql ++
    StatsQueries.oracleSql ++
    GraphQueries.oracleSql ++
    SamplingQueries.oracleSql ++
    EventsQueries.oracleSql
}
