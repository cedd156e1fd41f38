package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // median-of-N (default 3): a single-shot bench can't tell a real 2×
    // regression from a GC/JIT/scheduling swing — it misled two rounds of
    // regression adjudication. Per-run values are reported alongside the
    // median so variance is visible in the artifact itself.
    val nRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // HotSpot never JIT-compiles methods past 8000 bytecode bytes, so a
      // whole-stage-codegen method bigger than that runs INTERPRETED for
      // the query's whole life (measured here: the 76-expression wide-scan
      // pass-1 aggregate at 10-28 s vs ~3 s once the stage instead takes
      // the non-fused path whose per-expression methods all JIT). Align
      // Spark's fallback threshold with the JVM's real limit — a
      // scale-independent setting (same JIT behavior on any cluster JVM).
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT + file listing so the first measured query isn't
    // charged for session start
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    // toRdd.count() forces FULL materialization of every output column —
    // a plain count() would let Catalyst prune work the query claims to do.
    // Failures are recorded as failures, never as (fast) timings.
    // optional args: only time these queries (local iteration aid; the
    // driver passes none → full bench)
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).map { case (name, fn) =>
      val times = Seq.newBuilder[Double]
      var ok = true
      var i = 0
      while (i < nRuns && ok) {
        System.gc() // isolate runs from the previous run's garbage
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => ok = false }
        if (ok) times += (System.nanoTime() - t0) / 1e9
        i += 1
      }
      (name, times.result(), ok)
    }
    val qs = results.map { case (k, ts, _) =>
      s"\"" + k + "\":" + (if (ts.isEmpty) "null" else median(ts))
    }.mkString("{", ",", "}")
    val runsJson = results.map { case (k, ts, _) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, true) => median(ts) }.sum
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"n_runs":$nRuns,"failed":$failed,"sf":"$sfDir"}"""
    println(full)
    // The full line above is ~15 KB; a tail-capped log keeps only its end,
    // which parses as nothing. Persist the complete per-query map as a file
    // (committed per round → per-query history lives in git), then END
    // stdout with a compact summary line that survives any tail window.
    // Targeted runs (query-name args) skip the file so local iteration
    // never clobbers the committed full-sweep artifact.
    val parsedPath = java.nio.file.Paths.get("BENCH_PARSED.json")
    if (only.isEmpty) java.nio.file.Files.write(parsedPath, full.getBytes("UTF-8"))
    // Per-query medians in SMALL one-line JSON chunks (~50 queries each,
    // ~2 KB/line): the driver's round-over-round comparison has been
    // totals-only since r10 because the single 15 KB line above falls
    // outside its log tail window (VERDICT r16 "What's wrong" #6). Chunked
    // lines give any tail-capped reader at least the trailing chunks, and a
    // full-log reader all of them.
    results.grouped(50).zipWithIndex.foreach { case (chunk, ci) =>
      val part = chunk.map { case (k, ts, _) =>
        s"\"" + k + "\":" + (if (ts.isEmpty) "null" else median(ts))
      }.mkString("{", ",", "}")
      println(s"""{"metric":"queries_part","i":${ci + 1},"n_parts":${(results.size + 49) / 50},"queries":$part}""")
    }
    // fresh-JVM mode (tools/freshbench.sh): one gate per process, each
    // writing its own full JSON to an explicit path for the merger
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), full.getBytes("UTF-8"))
    }
    val nOk = results.count(_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_ok":$nOk,"n_runs":$nRuns,"failed":$failed,"sf":"$sfDir","queries_file":"${parsedPath.toAbsolutePath}"}""")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
