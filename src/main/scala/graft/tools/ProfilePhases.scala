package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round profiler: splits a gate's wall time into
  * (a) DataFrame construction (builder-side expression-tree assembly),
  * (b) Catalyst analyze+optimize+physical-plan, and (c) execution, so
  * optimization effort lands on the phase that actually carries the time
  * (guide §1.1 — decide compute vs planning before touching either).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.ProfilePhases q_spearman q_dedup_minhash"
  * With no args: the 30 slowest gates per the committed BENCH_PARSED.json
  * are profiled (falls back to all if the file is absent).
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else {
        val f = java.nio.file.Paths.get("BENCH_PARSED.json")
        if (java.nio.file.Files.exists(f)) {
          val txt = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
          // match any "name":seconds pair against the catalog, not a "q"
          // name-prefix guess (a gate named differently must still profile)
          val known = graft.SparkEntry.queries.keySet
          val q = """"([^"]+)":([0-9][0-9.eE+-]*)""".r
          q.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble)
            .filter(kv => known(kv._1))
            .toSeq.sortBy(-_._2).take(30).map(_._1)
        } else graft.SparkEntry.queries.keys.toSeq.sorted
      }
    val qs = graft.SparkEntry.queries
    println(f"${"query"}%-28s ${"construct"}%9s ${"plan"}%9s ${"exec"}%9s  (medians of " + reps + " reps, sec)")
    names.foreach { name =>
      qs.get(name) match {
        case None => println(s"$name: NOT FOUND")
        case Some(fn) =>
          val cs = Array.fill(reps)(0.0); val ps = Array.fill(reps)(0.0); val es = Array.fill(reps)(0.0)
          var i = 0
          while (i < reps) {
            System.gc()
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan // force analysis + optimization + planning
            val t2 = System.nanoTime()
            df.queryExecution.toRdd.count()
            val t3 = System.nanoTime()
            cs(i) = (t1 - t0) / 1e9; ps(i) = (t2 - t1) / 1e9; es(i) = (t3 - t2) / 1e9
            i += 1
          }
          def med(a: Array[Double]) = { val s = a.sorted; s(s.length / 2) }
          println(f"$name%-28s ${med(cs)}%9.3f ${med(ps)}%9.3f ${med(es)}%9.3f")
      }
    }
    spark.stop()
  }
}
