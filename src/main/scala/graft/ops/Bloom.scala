package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom-filter semi-join: build a compact bit-set sketch of the keys on one
  * side (typically a filtered dimension), then apply it as a row-local
  * membership predicate on the other side — the big side is filtered with
  * NO shuffle and NO join, the classic pre-filter that cuts a fact scan's
  * downstream exchange by the semi-join selectivity before any wide
  * operator runs. False positives only (rate set by m, k, n); never false
  * negatives.
  *
  * Deliberately tier (a) — composed from builtin codegen'd ops, no custom
  * aggregate: probe positions use Kirsch–Mitzenmacher double hashing
  * `p_j = (h + j·h2) mod m` with `h2 = 1 + (h mod (m-1))` over a
  * NON-NEGATIVE 60-bit key hash; the build side packs bits into 64-bit
  * words with a `bit_or` aggregate (≤ m/64 result rows — a bounded driver
  * collect by construction); the probe side is k unrolled bit tests
  * against the literal word array. Every step is integer arithmetic on a
  * portable hash, so a DuckDB oracle reproduces the EXACT accepted set —
  * including the false positives.
  */
object Bloom {

  /** 2^i for i = 0..63 (the i=63 entry is the sign bit — bit ops only). */
  private val pow2: Seq[Long] = (0 until 64).map(i => 1L << i)

  /** The j-th probe position of `h` in an m-bit filter (0-based, < m).
    * `h` MUST be non-negative (e.g. [[graft.ops.Shingles.md5Hash60]], or
    * `abs` of xxhash64) — the mods stay in positive long range.
    */
  def position(h: Column, j: Int, m: Int): Column = {
    val h2 = lit(1L) + (h % lit(m.toLong - 1L))
    (h + lit(j.toLong) * h2) % lit(m.toLong)
  }

  /** Build the m-bit filter over `keyHash` (one non-negative long hash per
    * row; nulls are skipped) as an Array[Long] of m/64 words — small enough
    * to ship as a literal into [[mightContain]].
    */
  def build(keys: DataFrame, keyHash: Column, m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0 && m > 64, s"m must be a positive multiple of 64, got $m")
    val hashed = keys.select(keyHash.as("h")).where(col("h").isNotNull)
    val positions = hashed.select(explode(array((0 until k).map(j => position(col("h"), j, m)): _*)).as("p"))
    val words = positions
      .groupBy(shiftright(col("p"), 6).cast(IntegerType).as("w"))
      .agg(bit_or(element_at(typedLit(pow2), col("p").bitwiseAND(63L).cast(IntegerType) + 1)).as("bits"))
      .collect()
    val out = new Array[Long](m / 64)
    words.foreach(r => out(r.getAs[Int]("w")) = r.getAs[Long]("bits"))
    out
  }

  /** Row-local membership predicate against a built filter: all k probe bits
    * set. `keyHash` is bound ONCE as a single-element-array lambda variable
    * (collection-argument position): the k probes reference the bound VALUE,
    * not the expression tree, so an expensive hash is evaluated once per row
    * even after predicate pushdown substitutes the alias into the filter —
    * the inline form re-ran md5 12× per row (measured 3.3 s → 0.4 s on the
    * q_bloom_join gate at sf0.1).
    */
  def mightContain(keyHash: Column, sketch: Array[Long], m: Int, k: Int): Column = {
    val words = typedLit(sketch.toSeq)
    val pw = typedLit(pow2)
    forall(array(keyHash), hh =>
      (0 until k).map { j =>
        val p = position(hh, j, m)
        val word = element_at(words, shiftright(p, 6).cast(IntegerType) + 1)
        val mask = element_at(pw, p.bitwiseAND(63L).cast(IntegerType) + 1)
        word.bitwiseAND(mask) =!= 0L
      }.reduce(_ && _))
  }

  /** End-to-end semi-join filter: keep `big` rows whose `bigKeyHash` might be
    * in `small`'s `smallKeyHash` set. Exact-membership re-verification (an
    * actual join on the survivors) is the caller's choice when false
    * positives matter.
    */
  def semiJoinFilter(big: DataFrame, bigKeyHash: Column,
                     small: DataFrame, smallKeyHash: Column,
                     m: Int = 1 << 20, k: Int = 3): DataFrame = {
    val sketch = build(small, smallKeyHash, m, k)
    big.withColumn("__bloom_h", bigKeyHash)
      .where(mightContain(col("__bloom_h"), sketch, m, k))
      .drop("__bloom_h")
  }
}
