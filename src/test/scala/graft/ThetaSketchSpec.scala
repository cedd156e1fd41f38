package graft

import graft.functions.{KmvSketch, ThetaSketch}
import graft.functions.ThetaSketch.Theta
import graft.ops.Shingles
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32

  /** Sketch of an in-memory string set through the REAL distributed path:
    * md5Hash60 + the KmvSketchAgg aggregate, `parts` partitions (exercises
    * partial/merge).
    */
  private def sketchOf(items: Seq[String], parts: Int = 5): Theta = {
    val kmv = items.toDF("v").repartition(parts)
      .agg(KmvSketch.kmv(Shingles.md5Hash60(col("v")), K))
      .collect()(0).getSeq[Long](0)
    ThetaSketch.fromKmv(kmv, K)
  }

  private val a = (0 until 500).map(i => s"item-$i")
  private val b = (300 until 900).map(i => s"item-$i") // overlap = 200

  test("not-full sketches are exact for every set operation") {
    val xs = (0 until 20).map(i => s"item-$i")   // 20 items
    val ys = (12 until 30).map(i => s"item-$i")  // 18 items, overlap 8
    val sa = sketchOf(xs)
    val sb = sketchOf(ys)
    assert(sa.theta == ThetaSketch.HashSpace)
    assert(sa.estimate == 20.0)
    assert(ThetaSketch.intersection(sa, sb).estimate == 8.0)
    assert(ThetaSketch.union(sa, sb, K).estimate == 30.0)
    assert(ThetaSketch.difference(sa, sb).estimate == 12.0)
  }

  test("aggregation is partitioning-invariant (mergeable)") {
    assert(sketchOf(a, 1) == sketchOf(a, 7))
    assert(sketchOf(a, 2) == sketchOf(a.reverse, 5))
  }

  test("union is commutative and associative") {
    val sa = sketchOf(a)
    val sb = sketchOf(b)
    val sc = sketchOf((600 until 1100).map(i => s"item-$i"))
    assert(ThetaSketch.union(sa, sb, K) == ThetaSketch.union(sb, sa, K))
    assert(ThetaSketch.union(ThetaSketch.union(sa, sb, K), sc, K) ==
      ThetaSketch.union(sa, ThetaSketch.union(sb, sc, K), K))
  }

  test("estimates track true cardinalities on overlapping sets") {
    val sa = sketchOf(a) // 500
    val sb = sketchOf(b) // 600, overlap 200
    def rel(est: Double, truth: Double): Double = math.abs(est - truth) / truth
    assert(rel(sa.estimate, 500) < 0.5, s"a: ${sa.estimate}")
    assert(rel(ThetaSketch.union(sa, sb, K).estimate, 900) < 0.5,
      s"union: ${ThetaSketch.union(sa, sb, K).estimate}")
    // intersection/difference estimates are noisier at k=32 — sanity bounds
    val inter = ThetaSketch.intersection(sa, sb).estimate
    assert(inter > 0.0 && inter < 900.0, s"inter: $inter")
    val diff = ThetaSketch.difference(sa, sb).estimate
    assert(diff > 0.0 && diff < 900.0, s"diff: $diff")
    // consistency: |A| ≈ |A∩B| + |A\B| under the shared theta
    val interS = ThetaSketch.intersection(sa, sb)
    val diffS = ThetaSketch.difference(sa, sb)
    assert(interS.values.length + diffS.values.length ==
      sa.values.count(_ < math.min(sa.theta, sb.theta)))
  }

  test("cross-window sketch drift: exact new/dropped keys when sketches are not full") {
    import graft.streaming.StreamingMonitor
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    def kmvOf(items: Seq[String]): Seq[Long] = {
      val s = sketchOf(items)
      // reconstruct the raw kmv array (not-full sketch retains everything)
      s.values.toSeq
    }
    val w0 = (0 until 12).map(i => s"k$i")   // 12 keys
    val w1 = (6 until 20).map(i => s"k$i")   // 14 keys: 6 new dropped... 8 new, 6 shared, 6 dropped
    val drift = StreamingMonitor.sketchDrift(
      Seq(ts(0) -> kmvOf(w0), ts(1) -> kmvOf(w1)), K)
    assert(drift.size == 1)
    val d = drift.head
    assert(d.windowStart == ts(1))
    assert(d.distinctEstimate == 14.0)
    assert(d.newKeysEstimate == 8.0)     // k12..k19
    assert(d.droppedKeysEstimate == 6.0) // k0..k5
    assert(math.abs(d.jaccardVsPrev - 6.0 / 20.0) < 1e-12)
  }

  test("intersection and difference retain only values below the joint theta") {
    val sa = sketchOf(a)
    val sb = sketchOf(b)
    val th = math.min(sa.theta, sb.theta)
    val inter = ThetaSketch.intersection(sa, sb)
    assert(inter.theta == th && inter.values.forall(_ < th))
    val diff = ThetaSketch.difference(sa, sb)
    assert(diff.theta == th && diff.values.forall(_ < th))
    // partition: intersection and difference are disjoint
    assert(inter.values.toSet.intersect(diff.values.toSet).isEmpty)
  }
}
