package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode–Muthukrishnan, J.Alg'05) as a
  * COMPOSED frame — deliberately tier (a), like [[Bloom]]: the d×w counter
  * table is a plain `groupBy(row, pos).count` over Kirsch–Mitzenmacher
  * double-hashed positions, so it map-side combines, merges by ADDITION
  * (linearity — the sketch of a union is the per-cell sum of the parts'
  * sketches), and every cell is integer-exact and reproducible in an
  * engine-independent oracle. Point estimates are the min over the d rows —
  * always an OVERestimate, within εn (ε = e/w) with probability 1−δ
  * (δ = e^−d).
  *
  * Complements the heavy-hitter summaries: [[graft.functions.MgSketchAgg]] /
  * [[graft.functions.SpaceSavingAgg]] retain only the top items, the CMS
  * answers point queries for ANY item from O(d·w) state.
  *
  * `keyHash` must be a NON-NEGATIVE hash ([[Shingles.md5Hash60]] is the
  * oracle-checkable one, `abs(xxhash64(...))` the fast path) — the same
  * contract as [[Bloom.position]], whose probe formula these positions
  * share: `p_j = (h + j·h2) mod w` with `h2 = 1 + (h mod (w−1))`.
  */
object CountMin {

  /** The d position ids of `keyHash`, with the hash bound ONCE as a
    * single-element-array lambda variable (the Bloom.mightContain idiom) so
    * an expensive hash evaluates once per row, not d times after
    * CollapseProject re-inlines the alias.
    */
  private[graft] def positionsBound(keyHash: Column, depth: Int, width: Int): Column =
    element_at(transform(array(keyHash), hh =>
      transform(sequence(lit(0L), lit(depth - 1L)), j =>
        (hh + j * (lit(1L) + hh % lit(width.toLong - 1L))) % lit(width.toLong))), 1)

  /** The sketch itself: one row per NONZERO counter, (row, pos, cnt) with
    * row ∈ [0, depth), pos ∈ [0, width). NULL hashes are skipped. One
    * shuffle of depth×N skinny rows into ≤ depth×width counters (map-side
    * combined); the result is bounded by the sketch geometry, not the data.
    */
  def table(df: DataFrame, keyHash: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width > 1, s"need depth >= 1 and width > 1, got ($depth, $width)")
    df.select(keyHash.as("__h")).where(col("__h").isNotNull)
      .select(posexplode(positionsBound(col("__h"), depth, width)).as(Seq("row", "pos")))
      .groupBy("row", "pos").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the rows of `items`: min over the d counters each
    * item hashes to — ≥ the item's true count in the sketched frame, = it
    * when any of its d cells is collision-free. Missing cells count 0
    * (possible only for items absent from the sketched frame). `itemCols`
    * are carried through and grouped on; `keyHash` must be the SAME hash
    * expression (over the item column) the table was built with.
    */
  def estimates(cmsTable: DataFrame, items: DataFrame, itemCols: Seq[String],
                keyHash: Column, depth: Int, width: Int): DataFrame = {
    require(itemCols.nonEmpty, "need at least one item column")
    items
      .select(itemCols.map(col) :+
        posexplode(positionsBound(keyHash, depth, width)).as(Seq("row", "pos")): _*)
      .join(cmsTable, Seq("row", "pos"), "left")
      .groupBy(itemCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }
}
