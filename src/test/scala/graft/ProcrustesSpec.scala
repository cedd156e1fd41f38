package graft

import graft.ops.Embeddings
import org.apache.spark.sql.functions._

/** Orthogonal Procrustes embedding-space alignment — the FIX for the drift
  * [[graft.ops.Embeddings.embeddingDrift]] detects (round 12).
  */
class ProcrustesSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Deterministic pseudo-random full-rank vectors. */
  private def corpus(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val rng = new scala.util.Random(1000 + i)
      (i.toLong, Seq.fill(dim)(rng.nextGaussian()))
    }

  /** A known rotation: product of three Givens rotations. */
  private val r0: Array[Array[Double]] = {
    def givens(i: Int, j: Int, theta: Double): Array[Array[Double]] = {
      val g = Array.tabulate(dim, dim)((a, b) => if (a == b) 1.0 else 0.0)
      g(i)(i) = math.cos(theta); g(j)(j) = math.cos(theta)
      g(i)(j) = -math.sin(theta); g(j)(i) = math.sin(theta)
      g
    }
    def mul(a: Array[Array[Double]], b: Array[Array[Double]]) =
      Array.tabulate(dim, dim)((i, j) => (0 until dim).map(k => a(i)(k) * b(k)(j)).sum)
    mul(mul(givens(0, 3, 0.7), givens(1, 5, -1.1)), givens(2, 6, 0.4))
  }

  private def rotate(v: Seq[Double]): Seq[Double] =
    (0 until dim).map(e => (0 until dim).map(d => v(d) * r0(d)(e)).sum)

  test("recovers a known rotation: aligned cosine ~1 where raw cosine is far off") {
    val a = corpus(300)
    val pairs = a.map { case (id, v) => (id, v, rotate(v)) }.toDF("id", "a", "b")
    val model = Embeddings.procrustesFit(pairs, "a", "b", dim)
    assert(model.n == 300)
    // R'R = I (orthogonality) and R ~ r0
    for (i <- 0 until dim; j <- 0 until dim) {
      val rtr = (0 until dim).map(k => model.rotation(k)(i) * model.rotation(k)(j)).sum
      assert(math.abs(rtr - (if (i == j) 1.0 else 0.0)) < 1e-6, s"R'R[$i][$j]=$rtr")
      assert(math.abs(model.rotation(i)(j) - r0(i)(j)) < 1e-3,
        s"R[$i][$j]=${model.rotation(i)(j)} vs ${r0(i)(j)}")
    }
    // applied row-locally, the aligned side matches b almost exactly while
    // the unaligned cosine is visibly off
    val aligned = Embeddings.procrustesApply(pairs, "id", "a", model)
    val check = pairs.join(aligned, Seq("id"))
      .select(
        avg(graft.ops.Similarity.cosine(
          transform(col("a"), x => x.cast("double")), col("aligned"))).as("raw_wrong"),
        avg(graft.ops.Similarity.cosine(col("aligned"),
          transform(col("b"), x => x.cast("double")))).as("aligned_cos"),
        avg(graft.ops.Similarity.cosine(
          transform(col("a"), x => x.cast("double")),
          transform(col("b"), x => x.cast("double")))).as("raw_cos"))
      .collect()(0)
    assert(check.getDouble(1) > 0.999999, s"aligned cos ${check.getDouble(1)}")
    assert(check.getDouble(2) < 0.9, s"raw cos should be visibly off: ${check.getDouble(2)}")
  }

  test("identity pairs recover the identity rotation; fit is deterministic") {
    val a = corpus(200)
    val pairs = a.map { case (id, v) => (id, v, v) }.toDF("id", "a", "b")
    val m1 = Embeddings.procrustesFit(pairs, "a", "b", dim)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(math.abs(m1.rotation(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-5)
    val m2 = Embeddings.procrustesFit(pairs, "a", "b", dim)
    assert(m1.rotation.map(_.toSeq).toSeq == m2.rotation.map(_.toSeq).toSeq &&
      m1.sigma.toSeq == m2.sigma.toSeq, "bit-identical refit")
  }

  test("apply is row-local matrix multiply (driver parity) and triages wrong-dim rows") {
    val a = corpus(50) :+ (999L, Seq(1.0, 2.0)) // wrong dim -> excluded
    val pairs = corpus(50).map { case (id, v) => (id, v, rotate(v)) }.toDF("id", "a", "b")
    val model = Embeddings.procrustesFit(pairs, "a", "b", dim)
    val got = Embeddings.procrustesApply(a.toDF("id", "v"), "id", "v", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(!got.contains(999L) && got.size == 50)
    val (id0, v0) = a.head
    val want = (0 until dim).map(e => (0 until dim).map(d => v0(d) * model.rotation(d)(e)).sum)
    got(id0).zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
  }

  test("ProcrustesModel parquet round-trip applies bit-identically") {
    val pairs = corpus(60).map { case (id, v) => (id, v, rotate(v)) }.toDF("id", "a", "b")
    val m = Embeddings.procrustesFit(pairs, "a", "b", dim)
    val tmp = java.nio.file.Files.createTempDirectory("graft-proc").toString
    Embeddings.saveProcrustesModel(spark, m, tmp)
    val l = Embeddings.loadProcrustesModel(spark, tmp)
    assert(l.dim == m.dim && l.n == m.n && l.fxScale == m.fxScale)
    assert(l.rotation.map(_.toSeq).toSeq == m.rotation.map(_.toSeq).toSeq)
    assert(l.sigma.toSeq == m.sigma.toSeq)
    val df = corpus(60).toDF("id", "v")
    def run(mm: Embeddings.ProcrustesModel) =
      Embeddings.procrustesApply(df, "id", "v", mm).orderBy("id")
        .select("aligned").collect().map(_.getSeq[Double](0)).toSeq
    assert(run(l) == run(m))
  }
}
