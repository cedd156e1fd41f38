package graft.metrics

import graft.api.ColumnConfig
import graft.metrics.MetricColumns._
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Top-N frequent values of one column: (value, occurrences, rank).
    * Rank is 1 + count of strictly-better rows via a broadcast nested-loop
    * self-join on the ≤ n-row result — no window function anywhere.
    *
    * Scale shape: `orderBy.limit(n)` compiles to TakeOrderedAndProject
    * (per-partition top-n, merged once) — no single-partition window over the
    * full distinct-value set. Rank is derived on the ≤ n-row result.
    */
  def frequentValues(df: DataFrame, colName: String, cfg: ColumnConfig, n: Int): DataFrame = {
    val counted = countedFrame(df, Seq(colName -> cfg))
    val top = counted.select(col("value"), col("cnt").as("occurrences"))
      .orderBy(col("occurrences").desc, col("value").asc)
      .limit(n)
    val o = top.select(col("occurrences").as("o2"), col("value").as("v2"))
    top.join(broadcast(o),
        col("o2") > col("occurrences") || (col("o2") === col("occurrences") && col("v2") < col("value")),
        "left")
      .groupBy("value", "occurrences")
      .agg((count(col("v2")) + 1L).cast(IntegerType).as("rank"))
      .select("value", "occurrences", "rank")
      .orderBy("rank")
  }

  /** Bottom-N and top-N distinct numeric values: (kind, rank, value).
    * Same TakeOrderedAndProject shape as [[frequentValues]] — no
    * unpartitioned window.
    */
  def minsMaxs(df: DataFrame, colName: String, n: Int): DataFrame = {
    val vals = df.select(col(colName).cast(DoubleType).as("v"))
      .where(col("v").isNotNull).distinct()
    def ranked(kind: String, asc: Boolean): DataFrame = {
      val top = (if (asc) vals.orderBy(col("v").asc) else vals.orderBy(col("v").desc)).limit(n)
      val o = top.select(col("v").as("v2"))
      val better = if (asc) col("v2") < col("v") else col("v2") > col("v")
      top.join(broadcast(o), better, "left")
        .groupBy("v")
        .agg((count(col("v2")) + 1L).cast(IntegerType).as("rank"))
        .select(lit(kind).as("kind"), col("rank"), col("v").as("value"))
    }
    ranked("mins", asc = true).unionAll(ranked("maxs", asc = false)).orderBy("kind", "rank")
  }

  /** The native grouping type the scan's pass 2 uses for a column — the
    * typed replacement for the former cast-everything-to-string explode.
    * Columns sharing a class ride ONE explode+groupBy; the group exchange
    * then carries an 8-byte primitive instead of the value's decimal/date
    * text, and the per-value to-string conversion (a Double.toString-class
    * cost per row) disappears from the corpus-sized explode entirely —
    * display strings are decoded only on the ≤distinct-sized top-K slices.
    *
    * Injectivity vs the former string form (so every count is unchanged):
    * integral/boolean/date→long and float→double are exact embeddings;
    * double keeps its own value. The ONLY divergence is IEEE signed zero:
    * native grouping normalizes -0.0 == 0.0 into one group where the string
    * form kept "-0.0"/"0.0" apart — the native behavior is what a SQL
    * engine grouping the raw column computes (the DuckDB oracles included),
    * so the typed pass matches the oracles MORE closely; NaN was one group
    * under both forms. Timestamps, decimals and every other type keep the
    * string path (class = StringType): a timestamp→long cast truncates to
    * seconds (not injective) and decimal scales differ per column.
    */
  def pass2Class(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType | DateType => LongType
    case FloatType | DoubleType => DoubleType
    case _ => StringType
  }

  /** Encode a column into its [[pass2Class]] grouping value. */
  def pass2Encode(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType => c.cast(LongType)
    case DateType => unix_date(c).cast(LongType)
    case FloatType | DoubleType => c.cast(DoubleType)
    case _ => c.cast(StringType)
  }

  /** Decode an encoded grouping value back to EXACTLY the string the former
    * cast-to-string pass produced (the frequent-values display text and its
    * count-tie ordering key) — only ever evaluated on ≤distinct-sized
    * slices. Float round-trips through FloatType so the shortest-float text
    * ("0.1", not the widened double's "0.10000000149011612") is preserved.
    */
  def pass2DecodeString(v: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => v.cast(StringType)
    case BooleanType => (v === 1L).cast(StringType)
    case DateType => date_from_unix_date(v.cast(IntegerType)).cast(StringType)
    case FloatType => v.cast(FloatType).cast(StringType)
    case DoubleType => v.cast(StringType)
    case _ => v
  }
}
