package graft.functions

/** Theta sketch: a mergeable distinct-set sketch supporting UNION,
  * INTERSECTION and DIFFERENCE estimates — the cross-table set-operation
  * layer KMV's Jaccard estimate alone can't express (e.g. "how many
  * customers placed no order", "how many new documents since the last
  * snapshot").
  *
  * Representation: `theta` (the sampling threshold) + the retained distinct
  * hash values strictly below it. A sketch built from a column keeps the k
  * smallest distinct hashes (via the distributed, mergeable
  * [[KmvSketchAgg]]); if fewer than k values exist the sketch is EXACT
  * (theta = the full 2^60 hash space). Every set operation first lowers both
  * operands to the smaller theta — the standard theta-sketch rule that keeps
  * estimates unbiased — and union re-trims to the k-1 smallest under a new
  * theta when it overflows.
  *
  * The estimate for any derived sketch is |retained| / (theta / 2^60):
  * retained values are a uniform hash sample at rate theta/space of the
  * underlying distinct set. All operations are driver-side on <= k longs;
  * only the initial per-table aggregation touches data.
  *
  * Hash space: non-negative 60-bit ([[graft.ops.Shingles.md5Hash60]]) so a
  * DuckDB oracle can rebuild the identical sketch (see q_theta_sketch).
  */
object ThetaSketch {

  /** 2^60 — the md5Hash60 hash space; theta of a not-yet-full sketch. */
  val HashSpace: Long = 1L << 60

  /** `values`: sorted ascending, distinct, all strictly below `theta`. */
  final case class Theta(theta: Long, values: Array[Long]) {
    /** Estimated distinct count of the represented set. */
    def estimate: Double = values.length.toDouble / (theta.toDouble / HashSpace.toDouble)
    override def equals(o: Any): Boolean = o match {
      case t: Theta => t.theta == theta && java.util.Arrays.equals(t.values, values)
      case _ => false
    }
    override def hashCode(): Int = theta.hashCode * 31 + java.util.Arrays.hashCode(values)
  }

  /** Build from the sorted k-smallest-distinct-hashes array produced by
    * [[KmvSketch.kmv]]. Not-full sketches are exact; full sketches use the
    * k-th smallest as the (exclusive) threshold and retain k-1 values.
    */
  def fromKmv(kSmallest: Seq[Long], k: Int): Theta =
    if (kSmallest.size < k) Theta(HashSpace, kSmallest.toArray)
    else Theta(kSmallest.last, kSmallest.dropRight(1).toArray)

  /** Union estimate sketch — retains at most k-1 values (re-trims under a
    * tightened theta when the merged sample overflows k).
    */
  def union(a: Theta, b: Theta, k: Int): Theta = {
    val th = math.min(a.theta, b.theta)
    val merged = (a.values ++ b.values).distinct.filter(_ < th).sorted
    if (merged.length >= k) Theta(merged(k - 1), merged.take(k - 1))
    else Theta(th, merged)
  }

  /** Intersection estimate sketch (never overflows: |A∩B| <= min). */
  def intersection(a: Theta, b: Theta): Theta = {
    val th = math.min(a.theta, b.theta)
    val sb = b.values.toSet
    Theta(th, a.values.filter(v => v < th && sb(v)))
  }

  /** Difference (A \ B) estimate sketch. */
  def difference(a: Theta, b: Theta): Theta = {
    val th = math.min(a.theta, b.theta)
    val sb = b.values.toSet
    Theta(th, a.values.filter(v => v < th && !sb(v)))
  }
}
