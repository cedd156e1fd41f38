package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTs <= leftTs within the same key ("attach the last click before this
  * error", "price as of trade time").
  *
  * Spark lacks the operator; per the compose-first rule it's built from a
  * union + one keyed window: tag both sides, sort by (ts, side) within key,
  * and carry the right side's values forward with `last(_, ignoreNulls)`.
  * ONE shuffle on the key, no join at all — survives any scale the window
  * sort survives (per-key data need not fit in memory; Spark spills sorts).
  */
object Joins {

  /** @param rightValueCols right columns carried to the left rows (as-of
    *                       values); emitted as `asof_<name>`. Ties on
    *                       (key, ts): the right row sorts first, so an
    *                       equal-timestamp right row IS visible to the left
    *                       row (matches DuckDB ASOF `left.ts >= right.ts`).
    */
  /** @param toleranceMicros max allowed |leftTs − matched rightTs| —
    *                        micros for timestamp columns, raw units for
    *                        numeric ones; an over-age match NULLs the
    *                        as-of values (row kept, standard
    *                        asof-with-tolerance semantics)
    * @param forward `true` flips direction: the EARLIEST right row with
    *                rightTs >= leftTs ("next fill after the order") — the
    *                same one-shuffle window scan, descending
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTsCol: String, rightTsCol: String,
           rightValueCols: Seq[String],
           toleranceMicros: Option[Long] = None,
           forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val leftCols = left.columns.toSeq
    def tsNum(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
      case _ => c.cast(LongType)
    }
    val l = left.select(
      (keyCols.map(col) :+ col(leftTsCol).as("__ts") :+
        tsNum(col(leftTsCol), left.schema(leftTsCol).dataType).as("__tsn") :+
        lit(1).as("__side") :+
        lit(null).cast(LongType).as("__rtsn")) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")) :+
        struct(leftCols.map(col): _*).as("__l"): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(rightTsCol).as("__ts") :+
        tsNum(col(rightTsCol), right.schema(rightTsCol).dataType).as("__tsn") :+
        lit(0).as("__side") :+
        tsNum(col(rightTsCol), right.schema(rightTsCol).dataType).as("__rtsn")) ++
        rightValueCols.map(c => col(c).as(s"__rv_$c")) :+
        lit(null).cast(l.schema("__l").dataType).as("__l"): _*)

    // ties on (key, ts): the right row sorts first in BOTH directions, so
    // an equal-timestamp right row is visible to the left row
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = l.unionByName(r).select(
      (col("__side") +: col("__l") +: col("__tsn") +:
        last(col("__rtsn"), ignoreNulls = true).over(w).as("__asof_tsn") +:
        rightValueCols.map(c => last(col(s"__rv_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)

    val age =
      if (forward) col("__asof_tsn") - col("__tsn") else col("__tsn") - col("__asof_tsn")
    val inTol = toleranceMicros
      .map(t => col("__asof_tsn").isNotNull && age <= t)
      .getOrElse(lit(true))
    carried.where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightValueCols.map(c => when(inTol, col(s"asof_$c")).as(s"asof_$c")): _*)
  }

  /** Blocked fuzzy self-join (entity resolution / near-duplicate records):
    * pairs within the same `blockCols` group whose `strCol` values are
    * within `maxDist` Levenshtein edits. Same contract as the blocked
    * dedup family (`cosinePairs`, `jaccardPairsAllPairs`): the caller's
    * blocking bounds the quadratic — pairs across blocks are out of scope
    * BY DEFINITION, and cost is Σ block². The |len_a − len_b| ≤ maxDist
    * prefilter is lossless (length difference lower-bounds edit distance)
    * and cheap enough to cut most candidates before the per-char DP.
    * The distance itself is graft's native banded-DP expression
    * ([[graft.functions.LevenshteinKExpr]]): reused instance buffers (the
    * builtin allocates its DP rows per pair), byte-level ASCII fast path,
    * early bail when a band row exceeds k — same contract and values as the
    * 3-arg builtin, which DuckDB's definition also matches.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+ col(strCol).as("s")): _*)
    val l = base.select(blockCols.map(col) :+ col("id").as("id_a") :+ col("s").as("s_a"): _*)
    val r = base.select(blockCols.map(col) :+ col("id").as("id_b") :+ col("s").as("s_b"): _*)
    l.join(r, blockCols)
      .where(col("id_a") < col("id_b") &&
        abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist",
        graft.functions.LevenshteinK.levenshteinK(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0)
      .select((col("id_a") +: col("id_b") +: col("dist") +: blockCols.map(col)): _*)
  }

  /** One comparison field of [[linkagePairs]]: agreement adds `agreeFx`,
    * disagreement adds `disagreeFx` (negative), either side NULL adds 0
    * (the Fellegi–Sunter missing-value convention). `maxDist > 0` makes
    * string fields agree under a Levenshtein tolerance.
    */
  final case class LinkField(col: String, agreeFx: Long, disagreeFx: Long,
                             maxDist: Int = 0)

  /** Record-linkage scoring (Fellegi–Sunter shape): candidate pairs from
    * equality blocking, then a per-field agreement score — log-odds-style
    * weights as INTEGER fixed-point literals summed to `score_fx`, so the
    * score and the match decision replay bit-for-bit on any engine. The
    * entity-resolution generalization of [[fuzzyPairs]] (which is the
    * single-field special case).
    *
    * Shape: all-pairs within block (the blocking key bounds the quadratic
    * — same discipline as fuzzy/jaccard all-pairs), per-field compare
    * row-local (codegen'd equality / banded Levenshtein), no further
    * shuffle. Returns (id_a, id_b, per-field booleans, score_fx, is_match).
    */
  def linkagePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                   fields: Seq[LinkField], minScoreFx: Long): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("id")) ++
        fields.map(f => col(f.col).as(s"__f_${f.col}")): _*)
    val l = base.select((blockCols.map(col) :+ col("id").as("id_a")) ++
      fields.map(f => col(s"__f_${f.col}").as(s"__a_${f.col}")): _*)
    val r = base.select((blockCols.map(col) :+ col("id").as("id_b")) ++
      fields.map(f => col(s"__f_${f.col}").as(s"__b_${f.col}")): _*)
    val withAgree = fields.foldLeft(
      l.join(r, blockCols).where(col("id_a") < col("id_b"))) { (acc, f) =>
      val a = col(s"__a_${f.col}"); val b = col(s"__b_${f.col}")
      val agree =
        if (f.maxDist == 0) a === b
        else abs(length(a) - length(b)) <= f.maxDist &&
          graft.functions.LevenshteinK.levenshteinK(a, b, f.maxDist) >= 0
      acc.withColumn(s"agree_${f.col}",
        when(a.isNull || b.isNull, lit(null).cast("boolean")).otherwise(agree))
    }
    val score = fields.map { f =>
      val ag = col(s"agree_${f.col}")
      when(ag.isNull, 0L).when(ag, lit(f.agreeFx)).otherwise(lit(f.disagreeFx))
    }.reduce(_ + _)
    withAgree
      .withColumn("score_fx", score)
      .withColumn("is_match", col("score_fx") >= minScoreFx)
      .select(col("id_a") +: col("id_b") +:
        fields.map(f => col(s"agree_${f.col}")) :+ col("score_fx") :+ col("is_match"): _*)
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo SIGMOD'95):
    * sort the corpus by a fuzzy key (name, normalized address, folded
    * title), slide a `window`-record window, emit every in-window pair —
    * the classic entity-resolution blocking COMPLEMENT to hash blocking:
    * near-boundary records ("Smith, J" / "Smith, John") land adjacent in
    * sort order even when no exact blocking key agrees. Candidate count is
    * exactly (n − w/2·…) ≈ n·(w−1) — linear, never quadratic.
    *
    * Scale shape: the GLOBAL rank comes from the two-phase prefix
    * discipline (range partition by (key, id) → per-partition row_number +
    * broadcast partition offsets — never a single-partition window; the
    * eager localCheckpoint freezes the range layout, the
    * [[graft.ops.Packing.prefixSum]] lesson); each record then claims its
    * `window−1` successor rank SLOTS (one posexplode) and ONE equi-join on
    * the slot attaches the successor — each pair emitted exactly once
    * (rank_a < rank_b by construction). Deterministic: ties in the sort
    * key break on id.
    *
    * @return (id_a, id_b, rank_a, rank_b) with 0 < rank_b − rank_a < window.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, sortKey: Column,
                              window: Int): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val base = df.select(col(idCol).as("id"), sortKey.as("__k"))
      .repartitionByRange(col("__k"), col("id"))
      .localCheckpoint(true)
      .withColumn("__pid", spark_partition_id())
    val counts = base.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetLit = array(offsets.take(maxPid + 1).map(lit(_)): _*)
    val w = Window.partitionBy("__pid").orderBy(col("__k").asc, col("id").asc)
    val ranked = base
      .withColumn("rank",
        row_number().over(w).cast("long") + element_at(offsetLit, col("__pid") + 1) - 1L)
      .localCheckpoint(true) // referenced twice below (slots + the join side)
    val slots = ranked.select(col("id").as("id_a"), col("rank").as("rank_a"),
      explode(sequence(col("rank") + 1L, col("rank") + (window - 1).toLong)).as("slot"))
    slots.join(ranked.select(col("rank").as("slot"), col("id").as("id_b"),
        col("rank").as("rank_b")), Seq("slot"))
      .select("id_a", "id_b", "rank_a", "rank_b")
  }

  /** Golden-record survivorship — the MERGE step after entity resolution:
    * matched-pair edges ([[linkagePairs]] / the ER pipeline / any dedup
    * pair source) collapse into entity clusters
    * ([[graft.ops.Components.connectedComponents]] min-id labels), and
    * each cluster emits ONE canonical row whose attributes survive by
    * MOST-FREQUENT-NON-NULL with ties broken by the MINIMUM value — the
    * standard deterministic survivorship rule, engine-replayable (no
    * "first seen" arrival-order dependence).
    *
    * Shape: the components rounds + per attribute one
    * (entity, value) rollup, a 1-row-per-entity max-count attach
    * (AQE-broadcastable) and a tie-resolving min — attributes never
    * shuffle together, so wide records cost one pass per SURVIVING column,
    * each over the skinny (entity, value, count) frame.
    *
    * @return one row per entity: (entity = min member id, n_members,
    *         attr…) — singletons pass through unchanged.
    */
  def goldenRecord(df: DataFrame, idCol: String, pairs: DataFrame,
                   pairACol: String, pairBCol: String,
                   attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute column")
    val comps = Components.connectedComponents(
        df.select(col(idCol).as("id")), "id", pairs, pairACol, pairBCol)
      .select(col("id"), col("component").as("entity"))
    val labeled = df.select(col(idCol).as("id") +: attrCols.map(col): _*)
      .join(comps, Seq("id"))
      .localCheckpoint(true) // one labeling serves every attribute pass
    val members = labeled.groupBy("entity")
      .agg(count(lit(1)).as("n_members"))
    attrCols.foldLeft(members) { (acc, a) =>
      val counts = labeled.where(col(a).isNotNull)
        .groupBy(col("entity"), col(a)).agg(count(lit(1)).as("__c"))
      val top = counts.groupBy("entity").agg(max(col("__c")).as("__m"))
      val survived = counts.join(top, Seq("entity"))
        .where(col("__c") === col("__m"))
        .groupBy("entity").agg(min(col(a)).as(a))
      acc.join(survived, Seq("entity"), "left")
    }
  }

  /** All unordered within-key row pairs WITHOUT a self-join: ONE
    * groupBy(key) collects each key's payload rows, then pairs enumerate
    * row-locally (posexplode position + a slice of the list's tail) — each
    * unordered row pair exactly once, n(n−1)/2 rows total, where the
    * `l.as("x").join(l.as("y"), key)` self-join shuffles and sorts the
    * input twice and builds n² rows before its dedup filter.
    *
    * Equivalence to the strict-order dedup (`x.c < y.c` on a per-row
    * attribute): positional enumeration yields the same pair multiset over
    * rows with DISTINCT attribute values; pairs whose attribute values are
    * EQUAL (excluded by the strict <, included positionally) must be
    * re-excluded by the caller (`x.c =!= y.c`). Downstream logic must be
    * orientation-independent or canonicalize with least/greatest — list
    * order is not deterministic.
    *
    * Skew note: a hot key's pairs expand inside one task — the same
    * single-partition fate the self-join's hash-by-key gave it — so cap
    * per-key rows upstream where keys can be unbounded (basketRules'
    * maxBasketItems pattern).
    *
    * @param payload pre-projected columns carried per row (keep skinny)
    * @return columns `x`, `y`: the pair's two payload structs
    */
  def withinKeyPairs(df: DataFrame, keyCol: String, payload: Seq[Column]): DataFrame = {
    val grouped = df.groupBy(col(keyCol))
      .agg(collect_list(struct(payload: _*)).as("__xs"))
    grouped
      .select(col("__xs"), posexplode(col("__xs")).as(Seq("__p", "x")))
      .select(col("x"),
        explode(slice(col("__xs"), col("__p") + lit(2),
          size(col("__xs")) - col("__p") - lit(1))).as("y"))
  }
}
