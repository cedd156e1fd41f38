package graft

import org.apache.spark.sql.functions._
import graft.ops.Embeddings

/** Native RandomProjectExpr: codegen health at gate scale (the r15 weak
  * plan), exact parity with the md5-parity sign rule, and the all-or-none
  * null contract.
  */
class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("randomProject 64x64 compiles (strict codegen, no interpreted fallback)") {
    // the unrolled expression-tree formulation blew janino's 64 KB method
    // limit at exactly this size and silently de-compiled the whole stage;
    // with fallback disabled, a compile failure now throws.
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    withConf(
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      graft.util.CodegenHealth.install()
      graft.util.CodegenHealth.reset()
      val n = Embeddings.randomProject(vecs, "id", "v", k = 64, inDim = 64).count()
      assert(n == 50L * 64)
      assert(graft.util.CodegenHealth.failures == 0,
        s"codegen fallback: ${graft.util.CodegenHealth.firstFailure}")
    }
  }

  test("randomProject: native expr matches a driver-side recomputation") {
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 10L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 10 - 5)))
    val k = 8; val inDim = 16; val fxScale = 3
    val got = Embeddings.randomProject(vecs.toDF("id", "v"), "id", "v",
        k = k, inDim = inDim, fxScale = fxScale)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def fx(x: Float): Long = {
      val d = x.toDouble * math.pow(10, fxScale)
      if (x >= 0) math.floor(d + 0.5).toLong else -math.floor(-d + 0.5).toLong
    }
    val signs = Array.tabulate(k, inDim) { (b, d) =>
      if (Embeddings.md5Hash60(s"rp|$b|$d") % 2 == 0L) 1L else -1L
    }
    vecs.foreach { case (id, v) =>
      val q = v.map(fx)
      (0 until k).foreach { b =>
        val want = (0 until inDim).map(d => signs(b)(d) * q(d)).sum
        assert(got((id, b)) == want, s"id=$id b=$b")
      }
    }
  }

  test("randomProject null contract: null / short / null-element → k null rows") {
    val df = Seq(
      (1L, Some(Seq[java.lang.Float](1.0f, 2.0f, 3.0f))),         // clean
      (2L, None),                                                  // null vector
      (3L, Some(Seq[java.lang.Float](1.0f, 2.0f))),                // short
      (4L, Some(Seq[java.lang.Float](1.0f, null, 3.0f)))           // null element
    ).toDF("id", "v")
    val out = Embeddings.randomProject(df, "id", "v", k = 4, inDim = 3, fxScale = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), if (r.isNullAt(2)) null else r.getLong(2)))
    // posexplode must emit k rows per input row either way
    assert(out.length == 4 * 4)
    val byId = out.groupBy(_._1)
    assert(byId(1L).forall(_._3 != null))
    Seq(2L, 3L, 4L).foreach { id =>
      assert(byId(id).length == 4 && byId(id).forall(_._3 == null), s"id=$id")
    }
  }
}
