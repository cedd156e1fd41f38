package graft.metrics

import graft.api.ColumnConfig
import graft.metrics.MetricColumns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame-shaped group metrics (distinct family, frequent values, profile).
  *
  * All multi-column variants share ONE posexplode → groupBy(colIdx, value)
  * shuffle regardless of how many columns are scanned — the map-side combine
  * reduces the shuffle to (#distinct values × #columns) rows.
  */
object GroupMetrics {

  /** The (colIdx, value, cnt) frame underlying every group metric. */
  def countedFrame(df: DataFrame, cols: Seq[(String, ColumnConfig)]): DataFrame = {
    val valueExprs = cols.map { case (n, cfg) =>
      when(!missingCond(col(n), cfg), col(n).cast(StringType))
    }
    df.select(posexplode(array(valueExprs: _*)).as(Seq("colIdx", "value")))
      .where(col("value").isNotNull)
      .groupBy("colIdx", "value")
      .agg(count(lit(1)).as("cnt"))
  }

  /** One wide row: `<col>_distinct`, `<col>_unique_count`,
    * `<col>_duplicate_count`, `<col>_uniqueness` for every column.
    */
  def distinctFamily(df: DataFrame, cols: Seq[(String, ColumnConfig)]): DataFrame = {
    val counted = countedFrame(df, cols)
    val aggs = cols.zipWithIndex.flatMap { case ((n, _), i) =>
      val isCol = col("colIdx") === i
      Seq(
        sum(when(isCol, 1L).otherwise(0L)).cast(LongType).as(s"${n}_distinct"),
        sum(when(isCol && col("cnt") === 1, 1L).otherwise(0L)).cast(LongType).as(s"${n}_unique_count"),
        sum(when(isCol && col("cnt") > 1, 1L).otherwise(0L)).cast(LongType).as(s"${n}_duplicate_count"),
        sum(when(isCol, col("cnt")).otherwise(0L)).cast(LongType).as(s"${n}_values_cnt")
      )
    }
    val wide = counted.agg(aggs.head, aggs.tail: _*)
    val outCols = cols.flatMap { case (n, _) =>
      Seq(
        col(s"${n}_distinct"),
        col(s"${n}_unique_count"),
        col(s"${n}_duplicate_count"),
        ((col(s"${n}_distinct") - 1L).cast(DoubleType) * 100.0 /
          (col(s"${n}_values_cnt") - 1L).cast(DoubleType)).as(s"${n}_uniqueness")
      )
    }
    wide.select(outCols: _*)
  }

  /** Long profile: (column_name, values_count, distinct_count) per column. */
  def profile(df: DataFrame, cols: Seq[(String, ColumnConfig)]): DataFrame = {
    val counted = countedFrame(df, cols)
    val names = array(cols.map(c => lit(c._1)): _*)
    counted.groupBy("colIdx")
      .agg(sum("cnt").cast(LongType).as("values_count"), count(lit(1)).as("distinct_count"))
      .select(element_at(names, col("colIdx") + 1).as("column_name"),
        col("values_count"), col("distinct_count"))
      .orderBy("column_name")
  }

  /** Top-N frequent values of one column: (value, occurrences, rank). */
  def frequentValues(df: DataFrame, colName: String, cfg: ColumnConfig, n: Int): DataFrame = {
    val counted = countedFrame(df, Seq(colName -> cfg))
    val w = Window.orderBy(col("occurrences").desc, col("value").asc)
    counted.select(col("value"), col("cnt").as("occurrences"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .orderBy("rank")
  }

  /** Bottom-N and top-N distinct numeric values: (kind, rank, value). */
  def minsMaxs(df: DataFrame, colName: String, n: Int): DataFrame = {
    val vals = df.select(col(colName).cast(DoubleType).as("v"))
      .where(col("v").isNotNull).distinct()
    val wMin = Window.orderBy(col("v").asc)
    val wMax = Window.orderBy(col("v").desc)
    val mins = vals.withColumn("rank", row_number().over(wMin)).where(col("rank") <= n)
      .select(lit("mins").as("kind"), col("rank"), col("v").as("value"))
    val maxs = vals.withColumn("rank", row_number().over(wMax)).where(col("rank") <= n)
      .select(lit("maxs").as("kind"), col("rank"), col("v").as("value"))
    mins.unionAll(maxs).orderBy("kind", "rank")
  }
}
