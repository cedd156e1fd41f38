package graft

import graft.functions.MinHash
import graft.ops.{Dedup, Shingles, TextAnalysis}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class MinHashExprSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "sphinx of black quartz judge my vow")
  ).toDF("id", "text")

  test("native expression matches the HOF implementation exactly") {
    val h = docs.select(col("id"),
      Shingles.shingleHashes(TextAnalysis.tokens(col("text")), 1).as("h"))
    val native = h.select(col("id"), MinHash.signature(col("h"), 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = h.select(col("id"), Dedup.minhashSignatureFromHashesHof(col("h"), 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof)
  }

  test("interpreted eval matches codegen") {
    // force interpreted path by evaluating through a filter on a tiny frame
    val h = docs.select(Shingles.shingleHashes(TextAnalysis.tokens(col("text")), 1).as("h"))
    val expr = graft.functions.MinHashSignatureExpr(
      org.apache.spark.sql.graftshim.GraftShim.toExpression(col("h")), 16, 42L)
    val row = h.collect()(0)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(row.getSeq[Long](0).toArray)
    val interp = expr.nullSafeEval(arr).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val viaDf = h.select(MinHash.signature(col("h"), 16)).as[Seq[Long]].collect()(0)
    assert(interp.toSeq == viaDf)
  }

  test("SQL function registration via extensions") {
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val n = spark.sql(
      "SELECT graft_minhash_sig(transform(split(text, '\\\\s+'), t -> xxhash64(t)), 8) AS sig FROM mh_docs")
      .selectExpr("size(sig)").as[Int].collect()
    assert(n.toSeq == Seq(8, 8, 8))
  }
}
