package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch: q1 decimal-sum vs long-cents fixed-point (not committed). */
object Prof4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      time("q1_decimal")(graft.SparkEntry.queries("q1_agg")(spark, sfDir).queryExecution.toRdd.count())
      // cents variant
      val qtyC = round(col("l_quantity") * 100.0).cast(LongType)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val taxC = round(col("l_tax") * 100.0).cast(LongType)
      val n = count(lit(1))
      val q = li
        .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(qtyC).cast(DoubleType) / 100.0).as("sum_qty"),
          (sum(priceC).cast(DoubleType) / 100.0).as("sum_base_price"),
          (sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("sum_disc_price"),
          (sum(priceC * (lit(100L) - discC) * (lit(100L) + taxC)).cast(DoubleType) / 1000000.0).as("sum_charge"),
          (sum(qtyC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_qty"),
          n.as("count_order"))
      time("q1_cents")(q.queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
