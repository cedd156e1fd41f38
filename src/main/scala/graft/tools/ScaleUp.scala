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
  *  - text goes through a per-replica affine letter cipher (a per-replica
  *    injective token remap, Caesar rotation for r < 26):
  *    token lengths, token counts and WITHIN-replica Jaccard /
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

  /** Multipliers coprime to 26 — each yields an injective affine letter map
    * i → (a·i + b) mod 26, so 12 × 26 = 312 DISTINCT length-preserving
    * token remaps are available before the cipher family repeats. */
  private val CoprimeA = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Per-replica injective token remap: affine letter cipher
    * i → (a·i + b) mod 26 with a = CoprimeA(r / 26), b = r mod 26 (case
    * kept separate so case structure survives). For r < 26 this is the
    * plain Caesar rotation (a = 1), byte-identical to earlier rounds'
    * corpora; r ≥ 26 switches multiplier instead of wrapping — a plain
    * rotation has PERIOD 26, so at factor > 26 replica r and r−26 would
    * share a rotation and their clusters would merge cross-replica,
    * breaking the documented "replicas share no tokens" contract (the
    * round-14 factor-30 corpus had 4 such doubled rotation classes —
    * 38/30 = 1.27× built-in super-linear pair volume). Identity for
    * r == 0; injective for 0 ≤ r < 312.
    */
  def rotateText(c: Column, r: Int): Column = {
    require(r >= 0 && r < 26 * CoprimeA.length,
      s"rotateText supports 0 <= r < ${26 * CoprimeA.length}")
    val a = CoprimeA(r / 26)
    val b = r % 26
    if (r == 0) c
    else {
      val mapped = (0 until 26).map(i => ('a' + (a * i + b) % 26).toChar).mkString
      translate(c, Lower + Upper, mapped + mapped.toUpperCase)
    }
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
