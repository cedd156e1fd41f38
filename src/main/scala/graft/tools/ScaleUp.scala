package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic in-engine corpus scale-up for slope measurement: replicate
  * a table `factor`× with per-replica transforms chosen so the WORKLOAD
  * structure scales linearly — each replica is a disjoint copy of the
  * original's similarity structure, never a pile of cross-replica
  * duplicates (which would blow up LSH buckets / kNN candidate sets and
  * make a linear operator read as quadratic).
  *
  *  - ids shift by `r * IdStride` — replicas never collide, joins and
  *    group-bys stay within-replica for salted keys;
  *  - text is Caesar-rotated per replica (a per-replica injective token
  *    remap): token lengths, token counts and WITHIN-replica Jaccard /
  *    shingle / MinHash relations are exactly preserved, while replicas
  *    share no tokens — so dedup finds 10× the clusters, not one giant one;
  *  - embeddings are circularly shifted per replica (a coordinate
  *    permutation = an isometry): within-replica cosines/distances are
  *    bit-identical, cross-replica similarity decays to corpus background.
  *
  * Replica 0 is the untransformed original. No randomness anywhere — two
  * runs produce byte-identical corpora.
  */
object ScaleUp {

  /** Gap between replica id ranges — far above any testdata id. */
  val IdStride: Long = 1L << 40

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  /** Per-replica injective token remap: rotate the alphabet by `r` (case
    * kept separate so case structure survives). Identity for r == 0.
    */
  def rotateText(c: Column, r: Int): Column = {
    val k = ((r % 26) + 26) % 26
    if (k == 0) c
    else translate(c,
      Lower + Upper,
      Lower.substring(k) + Lower.substring(0, k) +
        Upper.substring(k) + Upper.substring(0, k))
  }

  /** Per-replica coordinate permutation (circular shift by `shift`):
    * preserves norms and within-replica inner products exactly. Identity
    * for shift == 0 (mod dim).
    */
  def shiftEmbedding(c: Column, shift: Int): Column = {
    if (shift == 0) c
    else {
      val sz = size(c)
      val k = lit(shift) % sz
      when(k === 0, c)
        .otherwise(concat(slice(c, k + 1, sz - k), slice(c, lit(1), k)))
    }
  }

  /** Replicate `df` `factor`×, applying per-replica transforms: every
    * column in `saltIds` is shifted by `r * IdStride`, every column in
    * `rotateCols` is Caesar-rotated, every column in `shiftVecCols` is
    * circularly shifted by `7 r` coordinates. Output is range-partitioned
    * on `saltIds.head` into `factor` parts so the written layout mirrors
    * a real corpus (10× the data ⇒ 10× the files), not one giant file.
    */
  def replicate(df: DataFrame, factor: Int,
                saltIds: Seq[String],
                rotateCols: Seq[String] = Nil,
                shiftVecCols: Seq[String] = Nil): DataFrame = {
    require(factor >= 1 && saltIds.nonEmpty)
    val replicas = (0 until factor).map { r =>
      var d = df
      for (c <- saltIds) d = d.withColumn(c, col(c) + lit(r * IdStride))
      for (c <- rotateCols) d = d.withColumn(c, rotateText(col(c), r))
      for (c <- shiftVecCols) d = d.withColumn(c, shiftEmbedding(col(c), 7 * r))
      d
    }
    replicas.reduce(_ unionAll _)
      .repartitionByRange(factor, col(saltIds.head))
  }
}
