package graft

import graft.ops.Pq
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters in dim 8: center c at 10c in every dim,
  // deterministic jitter < 1 per vector/dim
  private lazy val clustered = {
    val rows = (0 until 200).map { i =>
      val cl = i % 4
      val vec = (0 until 8).map(d => 10.0 * cl + ((i * 31 + d * 7) % 10) / 10.0)
      (i.toLong, vec, cl)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("encode: m codes in [0,c), deterministic, partitioning-invariant, join-free plan") {
    val cb = Pq.trainCodebook(clustered, "vec_id", "embedding", m = 4, c = 4)
    val enc = Pq.encode(clustered, "vec_id", "embedding", cb)
    val rows = enc.as[(Long, Seq[Int])].collect().toMap
    assert(rows.size == 200)
    assert(rows.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 4)))

    val reparted = Pq.encode(clustered.repartition(13), "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(reparted == rows)

    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"),
      s"encode must be row-local:\n$plan")
  }

  test("same cluster, same codes: quantization collapses near-identical vectors") {
    // two vectors in the same tight cluster agree on every subspace code
    val cb = Pq.trainCodebook(clustered, "vec_id", "embedding", m = 4, c = 4,
      trainIterations = 2)
    val enc = Pq.encode(clustered, "vec_id", "embedding", cb)
      .join(clustered.select(col("vec_id").as("id"), col("cluster")), Seq("id"))
      .select(col("cluster"), col("codes")).as[(Int, Seq[Int])].collect()
    val byCluster = enc.groupBy(_._1).map { case (cl, xs) => cl -> xs.map(_._2).distinct.size }
    // after 2 Lloyd rounds each cluster maps to exactly one code tuple
    assert(byCluster.values.forall(_ == 1), s"codes per cluster: $byCluster")
  }

  test("Lloyd rounds reduce reconstruction error") {
    def reconstructionError(iters: Int): Double = {
      val cb = Pq.trainCodebook(clustered, "vec_id", "embedding", m = 4, c = 4, iters)
      val cwMap = cb.as[(Int, Int, Seq[Double])].collect()
        .map { case (s, c, w) => (s, c) -> w }.toMap
      val encoded = Pq.encode(clustered, "vec_id", "embedding", cb)
        .as[(Long, Seq[Int])].collect().toMap
      val vecs = clustered.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Double])].collect()
      vecs.map { case (id, v) =>
        encoded(id).zipWithIndex.map { case (code, s) =>
          val cw = cwMap((s, code))
          v.slice(s * 2, s * 2 + 2).zip(cw).map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
      }.sum / vecs.length
    }
    val e0 = reconstructionError(0)
    val e2 = reconstructionError(2)
    assert(e2 < e0, s"training should reduce error: iters0=$e0 iters2=$e2")
  }

  test("ADC search finds same-cluster neighbors; agrees with exact L2 on separated data") {
    val cb = Pq.trainCodebook(clustered, "vec_id", "embedding", m = 4, c = 4,
      trainIterations = 2)
    val queries = clustered.where(col("vec_id") < 8)
    val top = Pq.adcTopK(Pq.encode(clustered, "vec_id", "embedding", cb),
        queries, "vec_id", "embedding", k = 5, cb)
      .join(clustered.select(col("vec_id").as("neighbor_id"), col("cluster").as("ncl")), Seq("neighbor_id"))
      .join(clustered.select(col("vec_id").as("query_id"), col("cluster").as("qcl")), Seq("query_id"))
      .select(col("query_id"), col("ncl") === col("qcl")).as[(Long, Boolean)].collect()
    assert(top.length == 40)
    // every retrieved neighbor is from the query's own cluster (clusters
    // are 10 apart, jitter < 1 — PQ distances cannot confuse them)
    assert(top.forall(_._2), s"cross-cluster neighbor retrieved")
  }

  test("codebook round-trips through parquet; served codes identical") {
    val cb = Pq.trainCodebook(clustered, "vec_id", "embedding", m = 4, c = 4,
      trainIterations = 1)
    val dir = java.nio.file.Files.createTempDirectory("pq-cb").toString
    try {
      Pq.saveCodebook(cb, dir)
      val loaded = Pq.loadCodebook(spark, dir)
      val a = Pq.encode(clustered, "vec_id", "embedding", cb).as[(Long, Seq[Int])].collect().toMap
      val b = Pq.encode(clustered, "vec_id", "embedding", loaded).as[(Long, Seq[Int])].collect().toMap
      assert(a == b)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
