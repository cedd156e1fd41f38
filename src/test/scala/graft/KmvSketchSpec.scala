package graft

import graft.functions.KmvSketch
import graft.ops.Shingles
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv keeps the k smallest distinct hashes; exact when under capacity") {
    val df = spark.range(0, 1000).select(col("id").cast("string").as("s"))
    val k = 32
    val sk = df.select(KmvSketch.kmv(Shingles.md5Hash60(col("s")), k))
      .as[Seq[Long]].collect()(0)
    val exact = df.select(Shingles.md5Hash60(col("s")).as("h"))
      .distinct().orderBy("h").limit(k).as[Long].collect().toSeq
    assert(sk == exact)
    // under capacity: sketch IS the distinct hash set
    val small = spark.range(0, 10).select(col("id").cast("string").as("s"))
    val sk2 = small.select(KmvSketch.kmv(Shingles.md5Hash60(col("s")), k)).as[Seq[Long]].collect()(0)
    assert(sk2.size == 10 && KmvSketch.estimateDistinct(sk2, k) == 10.0)
  }

  test("kmv distinct estimate is within 25% at n >> k") {
    val df = spark.range(0, 20000).select(col("id").cast("string").as("s"))
    val k = 256
    val sk = df.select(KmvSketch.kmv(Shingles.md5Hash60(col("s")), k)).as[Seq[Long]].collect()(0)
    val est = KmvSketch.estimateDistinct(sk, k)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"estimate $est")
  }

  test("kmv sketches merge and estimate jaccard of overlapping sets") {
    val k = 256
    def sketch(lo: Int, hi: Int): Seq[Long] =
      spark.range(lo, hi).select(col("id").cast("string").as("s"))
        .select(KmvSketch.kmv(Shingles.md5Hash60(col("s")), k)).as[Seq[Long]].collect()(0)
    val a = sketch(0, 10000)       // [0, 10000)
    val b = sketch(5000, 15000)    // [5000, 15000) -> true jaccard = 5000/15000 = 1/3
    val j = KmvSketch.estimateJaccard(a, b, k)
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard estimate $j")
  }
}
