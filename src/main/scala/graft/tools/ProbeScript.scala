package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: same-session ABAB A/B of scriptProfile native vs regex on
  * the q_script input shape, plus a count of ScriptCounts.counts call sites
  * in the generated code (subexpression-elimination check). Delete after use.
  */
object ProbeScript {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m5 = col("doc_id") % 5
    val sample = when(m5 === 0, " привет мир как дела")
      .when(m5 === 1, " 你好世界早上好")
      .when(m5 === 2, " مرحبا بالعالم")
      .when(m5 === 3, " 안녕하세요 세계")
      .otherwise(lit(" γεια σου κόσμε"))
    val txt = concat(substring(col("text"), 1, 10), sample,
      when(col("doc_id") % 7 === 0, lit(" नमस्ते")).otherwise(lit("")))
    val native = docs.select(col("doc_id") +: TextAnalysis.scriptProfile(txt): _*).orderBy("doc_id")
    val regex = docs.select(col("doc_id") +: TextAnalysis.scriptProfileRegex(txt): _*).orderBy("doc_id")

    // how many times does the generated code call the counter?
    val gen = native.queryExecution.debug.codegenToSeq()
    gen.zipWithIndex.foreach { case ((_, code, _), i) =>
      val n = "graft\\.functions\\.ScriptCounts\\.counts\\(".r.findAllIn(code).size
      if (n > 0) println(s"CODEGEN stage $i: $n ScriptCounts.counts call sites")
    }

    def time(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (_ <- 1 to 4) { time("native", native); time("regex", regex) }
    spark.stop()
  }
}
