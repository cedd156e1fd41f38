package graft.tools

import graft.ops.{Shingles, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch: where does q_fingerprint spend 13s? (not committed) */
object Prof3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    df.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val toks = TextAnalysis.tokens(col("text"))
    val sh = Shingles.shingleStrings(toks, 3)
    time("shingles")(df.select(col("doc_id"), sh.as("s")).queryExecution.toRdd.count())
    val hashed = transform(sh, s => md5(s.cast(BinaryType)))
    time("md5")(df.select(col("doc_id"), hashed.as("s")).queryExecution.toRdd.count())
    val fp = slice(array_sort(array_distinct(hashed)), 1, 8)
    time("winnow")(df.select(col("doc_id"), fp.as("s")).queryExecution.toRdd.count())
    time("explode")(df.select(col("doc_id"), posexplode(fp).as(Seq("pos", "h")))
      .queryExecution.toRdd.count())
    time("full_gate")(graft.SparkEntry.queries("q_fingerprint")(spark, "/root/testdata/sf0.1")
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
