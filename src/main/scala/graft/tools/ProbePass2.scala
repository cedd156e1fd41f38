package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Plan evidence for the typed pass-2 (scan group metrics): dumps the
  * explain of the OLD cast-everything-to-string counted frame
  * (GroupMetrics.countedFrame — still the small-gate path) next to the NEW
  * per-type-class frames (pass2Encode, the Scanner pass-2 shape) over the
  * same 16 lineitem columns, to `plans/r17/q_scan_wide_pass2_{before,after}.txt`.
  */
object ProbePass2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cols = li.schema.fields.toSeq
    import graft.api.ColumnConfig
    import graft.metrics.GroupMetrics

    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

    // BEFORE: one explode, every value cast to string (the pre-change shape)
    val before = GroupMetrics.countedFrame(li, cols.map(f => f.name -> ColumnConfig()))
      .groupBy("colIdx").agg(count(lit(1)).as("distinct"), sum("cnt").as("values_cnt"))

    // AFTER: one explode per type class, native grouping values (mirrors
    // Scanner pass-2's countedOf; colIdx remap elided — it does not change
    // the exchange)
    val classed = cols.zipWithIndex
      .groupBy { case (f, _) => GroupMetrics.pass2Class(f.dataType) }
      .toSeq.sortBy(_._1.typeName).map(_._2.toSeq)
    val after = classed.map { cls =>
      val exprs = cls.map { case (f, _) =>
        when(col(f.name).isNotNull, GroupMetrics.pass2Encode(col(f.name), f.dataType))
      }
      li.select(cls.map { case (f, _) => col(f.name) }: _*)
        .select(posexplode(array(exprs: _*)).as(Seq("ci", "value")))
        .where(col("value").isNotNull)
        .groupBy("ci", "value").agg(count(lit(1)).as("cnt"))
        .groupBy("ci").agg(count(lit(1)).as("distinct"), sum("cnt").as("values_cnt"))
    }.reduce(_.unionAll(_))

    new java.io.File("plans/r17").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r17/q_scan_wide_pass2_before.txt"),
      fmt(before).getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r17/q_scan_wide_pass2_after.txt"),
      fmt(after).getBytes("UTF-8"))
    println("wrote plans/r17/q_scan_wide_pass2_{before,after}.txt")
    spark.stop()
  }
}
