package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: count Spark JOBS launched by one gate (construction +
  * execution) — evidence for action-count optimizations that explain()
  * cannot show. Not part of the library; delete after use.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
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
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    args.foreach { q =>
      val before = jobs.get()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener events are async
      println(f"PROBE $q jobs=${jobs.get() - before} secs=$secs%.2f")
    }
    spark.stop()
  }
}
