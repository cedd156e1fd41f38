package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range and interval joins without nested loops.
  *
  * Spark compiles a non-equi range predicate (`low <= v AND v < high`, or an
  * interval overlap) to BroadcastNestedLoopJoin when one side fits the
  * broadcast budget and to a full CartesianProduct otherwise — O(|L|·|R|)
  * either way. The scale shape used here is domain bucketization: quantize
  * the joined dimension into fixed-width buckets so the range predicate
  * becomes an EQUI-join on the bucket id (hash-partitioned, AQE-planned,
  * skew-splittable), with the exact predicate re-checked on the matches.
  * Cost is |facts| + |ranges|·(span/width) exploded rows through one hash
  * shuffle — linear in the inputs, never quadratic.
  *
  * Width is the one tuning knob: too small explodes long ranges into many
  * buckets; too large piles unrelated rows into the same bucket. Which
  * side binds depends on per-key density (measured sweep in PLANS.md):
  * when (key, bucket) cells are SPARSE the in-cell quadratic never bites
  * and cost is linear in exploded rows — several× the range length
  * minimizes the explosion factor and wins; on DENSE keys the quadratic
  * binds first and width near the typical range length is right. When in
  * doubt, sweep on a sample: output is width-invariant by construction.
  */
object RangeJoin {

  /** Point-in-range join: fact rows (point `valueCol`) against ranges
    * `[lowCol, highCol)`. Each point lands in exactly ONE bucket, so every
    * matching (fact, range) pair is emitted exactly once — no dedup needed.
    * Ranges explode to `ceil(len/width)+1` buckets.
    *
    * Columns of both frames are carried through; the caller resolves name
    * clashes before joining. Numeric domains only (cast timestamps to epoch
    * seconds/days first).
    */
  def pointInRange(fact: DataFrame, valueCol: Column, ranges: DataFrame,
                   lowCol: String, highCol: String,
                   bucketWidth: Double): DataFrame = {
    val w = lit(bucketWidth)
    val r = ranges.withColumn("__bucket",
      explode(sequence(floor(col(lowCol) / w).cast("long"),
                       floor(col(highCol) / w).cast("long"))))
    val f = fact.withColumn("__bucket", floor(valueCol / w).cast("long"))
    f.join(r, Seq("__bucket"))
      .where(valueCol >= col(lowCol) && valueCol < col(highCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: (left, right) row pairs whose closed intervals
    * `[lStart,lEnd]`, `[rStart,rEnd]` overlap (`lStart <= rEnd AND
    * rStart <= lEnd`), optionally within equi `keyCols` present on both
    * sides. Both sides explode to their bucket span and candidates meet in
    * common buckets; a pair is KEPT only in its first common bucket
    * (`bucket == floor(max(lStart, rStart) / w)` — a row-local filter), so
    * no pair-level dedup shuffle is ever paid. Same idiom as the LSH
    * first-matching-band dedup (Dedup.scala).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   lStart: String, lEnd: String, rStart: String, rEnd: String,
                   bucketWidth: Double): DataFrame = {
    val w = lit(bucketWidth)
    def buckets(lo: String, hi: String): Column =
      explode(sequence(floor(col(lo) / w).cast("long"),
                       floor(col(hi) / w).cast("long")))
    val l = left.withColumn("__bucket", buckets(lStart, lEnd))
    val r = right.withColumn("__bucket", buckets(rStart, rEnd))
    l.join(r, keyCols :+ "__bucket")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bucket") === floor(greatest(col(lStart), col(rStart)) / w).cast("long"))
      .drop("__bucket")
  }

  /** Self interval-overlap join: overlapping pairs WITHIN one frame (same
    * semantics as [[intervalJoin]] with both sides = `df`, output columns
    * suffixed). Built as an aliased self-join of ONE exploded frame so the
    * two join inputs canonicalize identically and Spark's ReuseExchange
    * feeds both sides from a single shuffle — one exchange instead of two
    * (the generic two-frame form can't do this: differently-aliased
    * projections canonicalize apart). Caller filters `id_a < id_b` (or
    * equivalent) to de-mirror pairs.
    */
  def intervalSelfJoin(df: DataFrame, keyCols: Seq[String], startCol: String,
                       endCol: String, bucketWidth: Double,
                       suffixes: (String, String) = ("_a", "_b")): DataFrame = {
    val w = lit(bucketWidth)
    val ex = df.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / w).cast("long"),
                       floor(col(endCol) / w).cast("long"))))
    val a = ex.alias("__l")
    val b = ex.alias("__r")
    def ac(c: String) = col(s"__l.$c")
    def bc(c: String) = col(s"__r.$c")
    val keyCond = (keyCols :+ "__bucket").map(k => ac(k) === bc(k)).reduce(_ && _)
    val cond = keyCond &&
      ac(startCol) <= bc(endCol) && bc(startCol) <= ac(endCol) &&
      ac("__bucket") === floor(greatest(ac(startCol), bc(startCol)) / w).cast("long")
    val dataCols = df.columns.filterNot(keyCols.contains).toSeq
    a.join(b, cond).select(
      keyCols.map(k => ac(k).as(k)) ++
        dataCols.map(c => ac(c).as(s"$c${suffixes._1}")) ++
        dataCols.map(c => bc(c).as(s"$c${suffixes._2}")): _*)
  }

  /** [[intervalSelfJoin]] as bucket MATERIALIZATION instead of a self-join:
    * ONE shuffle of the exploded rows into per-(key, bucket) member lists,
    * then in-cell ordered-pair generation by double posexplode with the
    * overlap + first-common-bucket predicates applied row-locally — no join
    * machinery, no broadcast build, the input scanned and exploded ONCE
    * (the self-join form scans it once per side). The same shape that beat
    * the bucket self-join 4× on the LSH dedup path (Dedup.minhashLshPairs).
    * Measured (PLANS.md round-8 audit): on SPARSE cells (<~5 members) the
    * broadcast-join form wins — collect_list allocation outweighs the probe
    * — so this is the DENSE-cell / beyond-broadcast-scale option, not the
    * default.
    * Output schema matches [[intervalSelfJoin]]; rows are the same ordered
    * pairs including mirrors EXCEPT self-pairs (row paired with itself),
    * which the self-join form emits and this form never generates —
    * callers' `id_a < id_b` de-mirroring drops them either way.
    */
  def intervalSelfJoinBuckets(df: DataFrame, keyCols: Seq[String], startCol: String,
                              endCol: String, bucketWidth: Double,
                              suffixes: (String, String) = ("_a", "_b")): DataFrame = {
    val w = lit(bucketWidth)
    val dataCols = df.columns.filterNot(keyCols.contains).toSeq
    val ex = df.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / w).cast("long"),
                       floor(col(endCol) / w).cast("long"))))
    val cells = ex.groupBy((keyCols :+ "__bucket").map(col): _*)
      .agg(collect_list(struct(dataCols.map(col): _*)).as("ms"))
      .where(size(col("ms")) > 1)
    val pairs = cells
      .select(keyCols.map(col) ++ Seq(col("__bucket"), col("ms"),
        posexplode(col("ms")).as(Seq("i", "a"))): _*)
      .select(keyCols.map(col) ++ Seq(col("__bucket"), col("a"), col("i"),
        posexplode(col("ms")).as(Seq("j", "b"))): _*)
      .where(col("j") =!= col("i"))
      .where(col("a").getField(startCol) <= col("b").getField(endCol) &&
        col("b").getField(startCol) <= col("a").getField(endCol) &&
        col("__bucket") ===
          floor(greatest(col("a").getField(startCol), col("b").getField(startCol)) / w).cast("long"))
    pairs.select(
      keyCols.map(col) ++
        dataCols.map(c => col("a").getField(c).as(s"$c${suffixes._1}")) ++
        dataCols.map(c => col("b").getField(c).as(s"$c${suffixes._2}")): _*)
  }
}
