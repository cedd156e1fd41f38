package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiler - do not commit
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-30s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs.count())
    val q = graft.ops.Dedup.substringSpansWithProvenance(docs, "doc_id", "text",
      windowTokens = 20, tokenHasher = graft.ops.Shingles.md5Hash60)
    val plan = q.queryExecution.executedPlan.toString
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).size)
    println("Exchange count: " + "Exchange".r.findAllIn(plan).size)
    println("scan count: " + "Scan parquet".r.findAllIn(plan).size)
    time("provenance") { q.queryExecution.toRdd.count() }
    // pieces
    val spans = graft.ops.Dedup.substringSpans(docs, "doc_id", "text", 20,
      graft.ops.Shingles.md5Hash60)
    time("spans alone") { spans.queryExecution.toRdd.count() }
    spark.stop()
  }
}
