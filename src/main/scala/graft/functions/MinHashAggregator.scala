package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Column-content MinHash sketch: aggregates a column of xxhash64 values into
  * a `numHashes`-long signature of the column's VALUE SET. Signatures of two
  * table snapshots estimate the Jaccard similarity of their column contents
  * (drift detection between runs) — a set sketch, so it is insensitive to row
  * order/partitioning and merges associatively (map-side partials).
  */
class MinHashAggregator(numHashes: Int, seed: Long = 42L)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {

  private val P = MinHash.P
  @transient private lazy val (aCoefs, bCoefs) = MinHash.coefs(numHashes, seed)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
    var m = hash % P
    if (m < 0) m += P
    var j = 0
    while (j < numHashes) {
      val v = (m * aCoefs(j) + bCoefs(j)) % P
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExprEncoders.longArray
}

private object ExprEncoders {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column API: `minhashAgg(xxhash64(col))` → array<bigint> signature. */
  def minhashAgg(hashCol: Column, numHashes: Int = 64): Column =
    udaf(new MinHashAggregator(numHashes), Encoders.scalaLong).apply(hashCol)

  /** Estimated Jaccard similarity of two column-content signatures. */
  def estimateJaccard(sigA: Seq[Long], sigB: Seq[Long]): Double = {
    require(sigA.length == sigB.length && sigA.nonEmpty)
    sigA.zip(sigB).count { case (a, b) => a == b }.toDouble / sigA.length
  }
}
