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

  test("Mersenne shift reduction is exact against plain % over the coef space") {
    // the inner-loop (m·a + b) mod p replaced % with the 2³¹−1 shift
    // reduction; sweep boundary m values × every 64-perm coefficient pair
    val (as, bs) = MinHash.coefs(64)
    val P = MinHash.P
    val ms = Seq(0L, 1L, P - 1, P - 2, P / 2, 123456789L, 2100000000L)
    for (m <- ms; j <- as.indices) {
      var v = m * as(j) + bs(j)
      v = (v & P) + (v >>> 31)
      v = (v & P) + (v >>> 31)
      if (v >= P) v -= P
      assert(v == (m * as(j) + bs(j)) % P, s"m=$m j=$j")
    }
  }

  test("native md5-60 expression matches the composed builtin tree and DuckDB form") {
    // md5Hash60 switched from conv(substring(md5(x),1,15),16,10) to the
    // native digest+shift expression — bit-parity on varied inputs
    // (empty string, unicode, long text, numeric strings)
    val rows = Seq("", "a", "the quick brown fox", "héllo wörld ünïcode",
      "x" * 10000, "12345", "doc|42|split", "\ttabs\nnewlines\t")
      .toDF("s")
    val both = rows.select(
      Shingles.md5Hash60(col("s")).as("native"),
      Shingles.md5Hash60Builtin(col("s")).as("builtin"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, b) => assert(n == b) }
    assert(both.forall(_._1 >= 0L), "md5-60 must be non-negative (< 2^60)")
    assert(both.map(_._1).distinct.length == both.length, "distinct inputs hash apart")
  }

  test("md5-60 SQL registration + interpreted eval parity") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_md5_60(cast('the quick brown fox' AS BINARY))").as[Long].collect()(0)
    val interp = graft.functions.Md5Hash60.hash("the quick brown fox".getBytes("UTF-8"))
    assert(viaSql == interp)
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
