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

class CountMinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.ops.{CountMin, Shingles}

  // zipf-ish: item i occurs 200/i times, 40 distinct items -> collisions
  // are forced at width 16
  private lazy val items: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(200 / i)(s"item$i"))
  private lazy val truth: Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("every estimate is an overestimate within the eps*n bound; exact when collision-free") {
    val df = items.toDF("v").repartition(7)
    val (d, w) = (4, 16)
    val cms = CountMin.table(df, Shingles.md5Hash60(col("v")), d, w)
    // table mass: every row's counters sum to n
    val mass = cms.groupBy("row").agg(sum("cnt").as("s")).select("s").as[Long].collect()
    assert(mass.length == d && mass.forall(_ == items.size.toLong))
    val est = CountMin.estimates(cms, items.distinct.toDF("v"), Seq("v"),
        Shingles.md5Hash60(col("v")), d, w)
      .as[(String, Long)].collect().toMap
    val n = items.size.toLong
    est.foreach { case (item, e) =>
      assert(e >= truth(item), s"$item: $e underestimates ${truth(item)}")
      // classic guarantee at the stated (eps, delta); generous slack factor
      assert(e <= truth(item) + 2 * n / w, s"$item: $e vs ${truth(item)} (bound ${2 * n / w})")
    }
    // an unseen item's estimate is the collision mass only (possibly 0)
    val unseen = CountMin.estimates(cms, Seq("never-there").toDF("v"), Seq("v"),
        Shingles.md5Hash60(col("v")), d, w)
      .as[(String, Long)].collect()(0)._2
    assert(unseen >= 0L && unseen <= 2 * n / w)
  }

  test("linearity: the sketch of a union is the per-cell sum of the parts") {
    val (half1, half2) = items.splitAt(items.size / 2)
    val (d, w) = (4, 16)
    def tbl(xs: Seq[String]) = CountMin.table(xs.toDF("v"), Shingles.md5Hash60(col("v")), d, w)
      .as[(Int, Long, Long)].collect().map { case (r, p, c) => (r, p) -> c }.toMap
    val whole = tbl(items)
    val merged = (tbl(half1).toSeq ++ tbl(half2).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(merged == whole)
  }
}
