package graft

import graft.functions.{KmvCounts, QuantileSketch}
import graft.ops.Shingles
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def md5key(c: org.apache.spark.sql.Column) = Shingles.md5Hash60(c.cast("string"))

  test("sketch with k >= n is the exact sorted value set; quantiles are nearest-rank") {
    val d = Seq((1L, 50.0), (2L, 10.0), (3L, 40.0), (4L, 20.0), (5L, 30.0)).toDF("id", "v")
    val out = d.agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), 100).as("sk"))
      .select(col("sk"),
        QuantileSketch.quantile(col("sk"), 0.0).as("q0"),
        QuantileSketch.quantile(col("sk"), 0.5).as("q50"),
        QuantileSketch.quantile(col("sk"), 1.0).as("q100"))
      .as[(Seq[Double], Double, Double, Double)].collect()(0)
    assert(out._1 == Seq(10.0, 20.0, 30.0, 40.0, 50.0))
    assert(out._2 == 10.0 && out._3 == 30.0 && out._4 == 50.0)
  }

  test("partitioning invariance: 1, 7 and 32 partitions give the identical sample") {
    val base = spark.range(10000).select(col("id"), (col("id") * 37 % 9973).cast("double").as("v"))
    val sketches = Seq(1, 7, 32).map { p =>
      base.repartition(p)
        .agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), 256).as("sk"))
        .as[Seq[Double]].collect()(0)
    }
    assert(sketches(0).size == 256)
    assert(sketches(0) == sketches(1) && sketches(1) == sketches(2))
  }

  test("duplicate hash keeps the smallest value (set semantics)") {
    // same id twice with different values -> one sample slot, min value
    val d = Seq((1L, 9.0), (1L, 3.0), (2L, 5.0)).toDF("id", "v")
    val sk = d.agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), 10).as("sk"))
      .as[Seq[Double]].collect()(0)
    assert(sk == Seq(3.0, 5.0))
  }

  test("NULL hash and NULL value rows are skipped") {
    val d = Seq((Some(1L), Some(2.0)), (None, Some(9.0)), (Some(3L), None))
      .toDF("id", "v")
    val sk = d.agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), 10).as("sk"))
      .as[Seq[Double]].collect()(0)
    assert(sk == Seq(2.0))
  }

  test("uniform data: sampled median within the O(1/sqrt(k)) rank band") {
    val n = 100000
    val d = spark.range(n).select(col("id"), col("id").cast("double").as("v"))
    val p50 = d.agg(QuantileSketch.qsketch(KmvCounts.xxhash60(col("id")), col("v"), 256).as("sk"))
      .select(QuantileSketch.quantile(col("sk"), 0.5)).as[Double].collect()(0)
    // 256-row sample: rank error ~ 1/sqrt(256) ≈ 6%; allow 4 sigma
    assert(math.abs(p50 - n / 2.0) / n < 0.25, s"sample median $p50 too far from ${n / 2}")
  }

  test("incremental fold: slice states fold to the monolithic sketch bit-for-bit") {
    val whole = spark.range(5000).select(col("id"), (col("id") * 31 % 1009).cast("double").as("v"))
    val slices = Seq(
      whole.where(col("id") < 1500),
      whole.where(col("id") >= 1500 && col("id") < 1600), // tiny slice
      whole.where(col("id") >= 1600))
    val k = 128
    def state(df: org.apache.spark.sql.DataFrame) =
      df.agg(QuantileSketch.qsketchState(md5key(col("id")), col("v"), k).as("st"))

    val mono = whole.agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), k).as("sk"))
      .as[Seq[Double]].collect()(0)

    // one-shot fold of all three slice states
    val folded = QuantileSketch.foldStates(
        slices.map(state).reduce(_ union _), "st", k)
      .select(QuantileSketch.valuesOf(col("st")))
      .as[Seq[Double]].collect()(0)
    assert(folded == mono)

    // incremental fold (yesterday's folded state + today's slice) — same
    val day2 = QuantileSketch.foldStates(state(slices(0)).union(state(slices(1))), "st", k)
    val day3 = QuantileSketch.foldStates(day2.union(state(slices(2))), "st", k)
    val inc = day3.select(QuantileSketch.valuesOf(col("st"))).as[Seq[Double]].collect()(0)
    assert(inc == mono)

    // state round-trips through parquet (it's an ordinary array<struct> column)
    val dir = java.nio.file.Files.createTempDirectory("qsketch-state").toString
    try {
      day2.write.mode("overwrite").parquet(dir)
      val reloaded = QuantileSketch.foldStates(
          spark.read.parquet(dir).union(state(slices(2))), "st", k)
        .select(QuantileSketch.valuesOf(col("st"))).as[Seq[Double]].collect()(0)
      assert(reloaded == mono)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("per-group sketches: one aggregate, deterministic per group") {
    val d = spark.range(1000).select(
      (col("id") % 3).cast("string").as("g"), col("id"),
      (col("id") * col("id")).cast("double").as("v"))
    val a = d.groupBy("g").agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), 32).as("sk"))
      .orderBy("g").as[(String, Seq[Double])].collect()
    val b = d.repartition(13).groupBy("g")
      .agg(QuantileSketch.qsketch(md5key(col("id")), col("v"), 32).as("sk"))
      .orderBy("g").as[(String, Seq[Double])].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._2.size == 32))
  }
}
