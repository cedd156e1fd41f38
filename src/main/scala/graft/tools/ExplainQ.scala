package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump `.explain("formatted")` for the named gates to
  * `$SPARK_GRAFT_PLAN_DIR/<q>_<tag>.txt` (default plans/r17).
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r17")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(dir).mkdirs()
    args.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/${q}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $dir/${q}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
