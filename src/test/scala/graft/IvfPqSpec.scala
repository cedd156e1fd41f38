package graft

import graft.ops.{IvfPq, Pq}
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated clusters in dim 8 (centers 10 apart, jitter < 1);
  // ids 0..3 land one per cluster, so iteration-0 cell seeds = the clusters
  private lazy val clustered = {
    val rows = (0 until 200).map { i =>
      val cl = i % 4
      val vec = (0 until 8).map(d => 10.0 * cl + ((i * 31 + d * 7) % 10) / 10.0)
      (i.toLong, vec, cl)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("routing: every vector lands in its own cluster's cell; index is partitioning-invariant") {
    val cells = IvfPq.trainCells(clustered, "vec_id", "embedding", ncells = 4)
    val cb = IvfPq.trainResidualCodebook(clustered, "vec_id", "embedding", cells, m = 4, c = 4)
    val idx = IvfPq.encode(clustered, "vec_id", "embedding", cells, cb)
    val routed = idx.join(clustered.select(col("vec_id").as("id"), col("cluster")), Seq("id"))
      .select(col("cell") === col("cluster")).as[Boolean].collect()
    assert(routed.length == 200 && routed.forall(identity),
      "seed cells are one per cluster; every member must route home")

    val again = IvfPq.encode(clustered.repartition(13), "vec_id", "embedding", cells, cb)
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(again == idx.as[(Long, Int, Seq[Int])].collect().toSet)
  }

  test("residual PQ reconstructs better than raw PQ at the same m x c budget") {
    def mse(recon: Map[Long, Seq[Double]]): Double = {
      val vecs = clustered.select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Double])].collect()
      vecs.map { case (id, v) =>
        v.zip(recon(id)).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / vecs.length
    }
    def codebookMap(cb: org.apache.spark.sql.DataFrame) =
      cb.as[(Int, Int, Seq[Double])].collect().map { case (s, c, w) => (s, c) -> w }.toMap

    // raw PQ reconstruction: concat of codewords
    val rawCb = Pq.trainCodebook(clustered, "vec_id", "embedding", m = 4, c = 4, trainIterations = 2)
    val rawMap = codebookMap(rawCb)
    val rawRecon = Pq.encode(clustered, "vec_id", "embedding", rawCb)
      .as[(Long, Seq[Int])].collect().toMap
      .map { case (id, codes) =>
        id -> codes.zipWithIndex.flatMap { case (c, s) => rawMap((s, c)) }.toSeq
      }

    // IVFADC reconstruction: cell centroid + concat of residual codewords
    val cells = IvfPq.trainCells(clustered, "vec_id", "embedding", ncells = 4)
    val cellMap = cells.as[(Int, Int, Seq[Double])].collect()
      .map { case (_, cell, w) => cell -> w }.toMap
    val resCb = IvfPq.trainResidualCodebook(clustered, "vec_id", "embedding", cells,
      m = 4, c = 4, trainIterations = 2)
    val resMap = codebookMap(resCb)
    val ivfRecon = IvfPq.encode(clustered, "vec_id", "embedding", cells, resCb)
      .as[(Long, Int, Seq[Int])].collect()
      .map { case (id, cell, codes) =>
        val resPart = codes.zipWithIndex.flatMap { case (c, s) => resMap((s, c)) }
        id -> cellMap(cell).zip(resPart).map { case (a, b) => a + b }.toSeq
      }.toMap

    val rawErr = mse(rawRecon)
    val ivfErr = mse(ivfRecon)
    assert(ivfErr < rawErr,
      s"residual quantization must beat raw at equal budget: ivf=$ivfErr raw=$rawErr")
  }

  test("search: nprobe=1 retrieves only same-cluster neighbors, all k of them") {
    val top = IvfPq.ivfPqTopK(clustered, clustered.where(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, ncells = 4, m = 4, c = 4, nprobe = 1,
        pqIterations = 2)
      .join(clustered.select(col("vec_id").as("neighbor_id"), col("cluster").as("ncl")), Seq("neighbor_id"))
      .join(clustered.select(col("vec_id").as("query_id"), col("cluster").as("qcl")), Seq("query_id"))
      .select(col("query_id"), col("ncl") === col("qcl"))
      .as[(Long, Boolean)].collect()
    assert(top.length == 40, s"8 queries x k=5 expected, got ${top.length}")
    assert(top.forall(_._2), "nprobe=1 must stay inside the query's own cell/cluster")
  }

  test("search: full probe equals an independent exact ADC recompute") {
    val cells = IvfPq.trainCells(clustered, "vec_id", "embedding", ncells = 4)
    val cb = IvfPq.trainResidualCodebook(clustered, "vec_id", "embedding", cells, m = 4, c = 4)
    val idx = IvfPq.encode(clustered, "vec_id", "embedding", cells, cb)
    val got = IvfPq.topK(idx, clustered.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, nprobe = 4, cells, cb)
      .as[(Long, Int, Long)].collect().map { case (q, r, n) => (q, r) -> n }.toMap

    // scalar-loop recompute: residual luts + code lookups, no Spark exprs
    val cellCw = cells.as[(Int, Int, Seq[Double])].collect()
      .map { case (_, c, w) => c -> w }.toMap
    val cwMap = cb.as[(Int, Int, Seq[Double])].collect()
      .map { case (s, c, w) => (s, c) -> w }.toMap
    val index = idx.as[(Long, Int, Seq[Int])].collect()
    val vecs = clustered.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    val expected = (0L until 8L).flatMap { qid =>
      val qv = vecs(qid)
      val ranked = index.filter(_._1 != qid).map { case (nid, cell, codes) =>
        val qr = qv.zip(cellCw(cell)).map { case (a, b) => a - b }
        val d = codes.zipWithIndex.map { case (code, s) =>
          qr.slice(s * 2, s * 2 + 2).zip(cwMap((s, code)))
            .map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
        (d, nid)
      }.sortBy(identity).take(5)
      ranked.zipWithIndex.map { case ((_, nid), i) => (qid, i + 1) -> nid }
    }.toMap
    assert(got == expected)
  }
}
