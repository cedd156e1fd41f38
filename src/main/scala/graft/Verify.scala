package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd+ args: only run these queries (local iteration aid)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // align Spark's whole-stage-codegen fallback with HotSpot's real
      // 8000-byte JIT limit (see Bench.scala) so verify exercises the same
      // physical paths the bench times
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // codegen-health gate: a janino compile failure is silently degraded to
    // interpreted eval by Spark — count those events and surface them, so a
    // de-optimized plan can't ship through a green round again (r15 lesson).
    graft.util.CodegenHealth.install()
    new java.io.File(outDir).mkdirs()
    // per-query hugeMethodLimit fallback counts: which gates run un-fused
    // stages under the 8000-byte limit (expected >0 for the widest plans;
    // the point is that the number is VISIBLE, not assumed zero)
    val hugeByQuery = scala.collection.mutable.LinkedHashMap[String, Long]()
    SparkEntry.queries.filter(q => only.isEmpty || only(q._1)).foreach { case (name, fn) =>
      val hugeBefore = graft.util.CodegenHealth.hugeFallbacks
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      val d = graft.util.CodegenHealth.hugeFallbacks - hugeBefore
      if (d > 0) hugeByQuery(name) = d
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val health = graft.util.CodegenHealth.summaryJson
    Files.writeString(Paths.get(s"$outDir/codegen_health.json"), health)
    // loud, greppable; non-fatal so one degraded plan can't zero the round's
    // 362 correctness gates — the spec suite is the hard gate per-operator.
    println(s"CODEGEN_HEALTH $health")
    if (hugeByQuery.nonEmpty) {
      val perQ = hugeByQuery.map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")
      println(s"CODEGEN_HUGE_FALLBACKS_BY_QUERY $perQ")
      Files.writeString(Paths.get(s"$outDir/codegen_huge_by_query.json"), perQ)
    }
    if (graft.util.CodegenHealth.failures > 0)
      System.err.println(s"[verify] CODEGEN FALLBACK DETECTED: $health")
    spark.stop()
  }
}
