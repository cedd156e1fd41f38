package graft

import graft.ops.Similarity
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
    (2L, Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
    (3L, Array(0.5, -0.25, 8.0), Array(-3.0, 0.125, 2.5))
  ).toDF("id", "a", "b")

  test("native cosine is bit-identical to the HOF formulation") {
    val rows = vecs.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("registered as SQL function") {
    GraftExtensions.register(spark)
    val v = spark.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))").as[Double].collect()
    assert(v.toSeq == Seq(1.0))
  }
}
