package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox leaps over the lazy dog"),
    (4L, "completely different words entirely unrelated content here")
  ).toDF("doc_id", "text")

  test("replicate: row count scales, ids disjoint, replica 0 is the original") {
    val r = ScaleUp.replicate(docs, 3, Seq("doc_id"), rotateCols = Seq("text"))
    assert(r.count() == 12)
    // replica id ranges never collide
    val perReplica = r.groupBy((col("doc_id") / ScaleUp.IdStride).cast("long").as("rep"))
      .count().as[(Long, Long)].collect().toMap
    assert(perReplica == Map(0L -> 4L, 1L -> 4L, 2L -> 4L))
    // replica 0 is byte-identical to the input
    val rep0 = r.where(col("doc_id") < ScaleUp.IdStride)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(rep0 == docs.orderBy("doc_id").as[(Long, String)].collect().toSeq)
  }

  test("rotateText preserves within-replica token structure, disjoint across replicas") {
    val r = ScaleUp.replicate(docs, 2, Seq("doc_id"), rotateCols = Seq("text"))
    val toks = r.select(col("doc_id"), split(col("text"), " ").as("t"))
    // within replica 1: docs 1 and 2 are still exact duplicates, and doc 3
    // still shares exactly 7 of 8 distinct tokens with doc 1 (jumps/leaps)
    val m = toks.as[(Long, Seq[String])].collect().toMap
    val s = ScaleUp.IdStride
    assert(m(s + 1L) == m(s + 2L))
    assert(m(s + 1L).toSet.intersect(m(s + 3L).toSet).size == 7)
    // token lengths are preserved (Caesar is length-preserving)
    assert(m(s + 1L).map(_.length) == m(1L).map(_.length))
    // across replicas: zero shared tokens
    assert(m(1L).toSet.intersect(m(s + 1L).toSet).isEmpty)
  }

  test("rotateText stays injective past the Caesar period (factor > 26)") {
    // round-14 incident: at factor 30 a plain rotation gave replicas 26..29
    // the SAME remap as 0..3, merging their clusters cross-replica and
    // quadrupling those classes' pair volume. The affine generalization
    // keeps all 312 remaps distinct; spot-check the wrap boundary and that
    // within-replica structure still holds for a high-r cipher.
    val texts = docs.select(col("doc_id"), ScaleUp.rotateText(col("text"), 26).as("t26"),
      ScaleUp.rotateText(col("text"), 0).as("t0"),
      ScaleUp.rotateText(col("text"), 27).as("t27"))
    val rows = texts.as[(Long, String, String, String)].collect()
      .map { case (k, a, b, c) => k -> (a, b, c) }.toMap
    val (t26, t0, t27) = rows(1L)
    def toks(s: String) = s.split(" ").toSet
    assert(toks(t26).intersect(toks(t0)).isEmpty, "r=26 must not repeat r=0")
    assert(toks(t26).intersect(toks(t27)).isEmpty, "r=26 vs r=27 disjoint")
    // length-preserving, exact-dup structure survives any cipher
    assert(t26.length == t0.length)
    val (a26, _, _) = rows(1L); val (b26, _, _) = rows(2L)
    assert(a26 == b26, "exact duplicates stay exact duplicates under r=26")
  }

  test("end-to-end workload preservation: dedup pairs replicate exactly, never merge") {
    // the property the slope measurement rests on: the replicated corpus's
    // exact-Jaccard pair set is the original's pair set once per replica
    // (shifted), with ZERO cross-replica pairs
    val rep = ScaleUp.replicate(docs, 3, Seq("doc_id"), rotateCols = Seq("text"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      graft.ops.Dedup.jaccardPairsAllPairs(df, "doc_id", "text", threshold = 0.5,
          blockCols = Nil)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val base = pairs(docs)
    val scaled = pairs(rep)
    val expected = (0 until 3).flatMap { r =>
      base.map { case (a, b) => (a + r * ScaleUp.IdStride, b + r * ScaleUp.IdStride) }
    }.toSet
    assert(base.nonEmpty) // docs 1-2 exact dups, 3 near-dup: pairs exist
    assert(scaled == expected, s"scaled pair set must be 3 disjoint copies")
  }

  test("shiftEmbedding is an isometry within replica, not identity across") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 2.0f, 0.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 2.0f, 0.0f, 3.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = ScaleUp.replicate(vecs, 2, Seq("vec_id"), shiftVecCols = Seq("embedding"))
    val m = r.as[(Long, Seq[Float])].collect().toMap
    val s = ScaleUp.IdStride
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    // dimension count and norms preserved; within-replica dot product exact
    assert(m(s + 1L).size == 8 && m(s + 2L).size == 8)
    assert(dot(m(s + 1L), m(s + 1L)) == dot(m(1L), m(1L)))
    assert(dot(m(s + 1L), m(s + 2L)) == dot(m(1L), m(2L)))
    // the shifted copy is a genuine permutation, not the same vector
    assert(m(s + 1L) != m(1L))
    assert(m(s + 1L).sorted == m(1L).sorted)
  }
}
