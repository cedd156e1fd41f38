package graft

import graft.functions.{MinHash, MinHashAgg}
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("column sketch is partition-order independent and merges correctly") {
    val vals = (1 to 500).map(i => s"v$i")
    val a = vals.toDF("v").repartition(1)
    val b = vals.reverse.toDF("v").repartition(7)
    val sigA = a.select(MinHashAgg.minhashAgg(xxhash64(col("v")), 32)).as[Seq[Long]].collect()(0)
    val sigB = b.select(MinHashAgg.minhashAgg(xxhash64(col("v")), 32)).as[Seq[Long]].collect()(0)
    assert(sigA == sigB)
  }

  test("estimated jaccard tracks true overlap") {
    // sets share 900 of 1100 distinct values -> true J = 900/1100 ≈ 0.82
    val setA = (1 to 1000).map(i => s"x$i")
    val setB = (101 to 1200).map(i => s"x$i")
    val k = 128
    val sa = setA.toDF("v").select(MinHashAgg.minhashAgg(xxhash64(col("v")), k)).as[Seq[Long]].collect()(0)
    val sb = setB.toDF("v").select(MinHashAgg.minhashAgg(xxhash64(col("v")), k)).as[Seq[Long]].collect()(0)
    val est = MinHashAgg.estimateJaccard(sa, sb)
    assert(math.abs(est - 900.0 / 1100.0) < 0.15, s"estimate $est")
  }

  test("agg signature equals the row-local signature of the same set") {
    // aggregating single-value rows == computing the signature of the array
    val vals = Seq("a", "b", "c", "d", "e")
    val agg = vals.toDF("v").select(MinHashAgg.minhashAgg(xxhash64(col("v")), 16))
      .as[Seq[Long]].collect()(0)
    val arr = Seq(vals).toDF("vs")
      .select(MinHash.signature(transform(col("vs"), v => xxhash64(v)), 16))
      .as[Seq[Long]].collect()(0)
    assert(agg == arr)
  }
}
