package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-state probe for the in-context q_scan_wide degradation: run the
  * first N gates once each (bench order), dump session/RDD/memory state,
  * then time q_scan_wide three times. Bisecting N localizes which prefix
  * leaves the session state that makes the concurrent-pass scanner slow.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.ProbeLeak 150"
  */
object ProbeLeak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1).take(n)
    val t0 = System.nanoTime()
    names.foreach { case (name, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"prefix $name failed: ${e.getMessage}") }
    }
    println(f"prefix of $n queries: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val rdds = spark.sparkContext.getPersistentRDDs
    println(s"persistent RDDs: ${rdds.size}")
    val sm = spark.sparkContext.getExecutorMemoryStatus
    sm.foreach { case (k, (max, rem)) =>
      println(f"executor $k: max=${max / 1e9}%.2f GB remainingStorage=${rem / 1e9}%.2f GB") }
    val rt = Runtime.getRuntime
    println(f"heap used ${(rt.totalMemory - rt.freeMemory) / 1e9}%.2f GB committed ${rt.totalMemory / 1e9}%.2f GB")
    (1 to 3).foreach { i =>
      System.gc()
      val s0 = System.nanoTime()
      graft.SparkEntry.queries("q_scan_wide")(spark, sfDir).queryExecution.toRdd.count()
      println(f"q_scan_wide rep $i: ${(System.nanoTime() - s0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
