package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ranking-comparison operators: how STABLE is a top-k list across
  * snapshots/sources — the question a set-overlap (Jaccard of the lists)
  * answers badly because it ignores where items sit (rank 1 churn matters
  * more than rank 50 churn).
  */
object Ranking {

  /** The (1−p)·p^(d−1)/d weight table and its suffix sums for [[rbo]] —
    * generated in ONE place so the Spark plan and the oracle SQL consume
    * identical doubles (p-powers via libm `pow` are not bit-portable;
    * repeated multiplication here is deterministic IEEE). */
  private[graft] def rboWeights(k: Int, p: Double): (Seq[Double], Seq[Double]) = {
    val w = new Array[Double](k)
    var pw = 1.0
    for (d <- 1 to k) {
      w(d - 1) = (1.0 - p) * pw / d
      pw = pw * p
    }
    val suffix = new Array[Double](k)
    var acc = 0.0
    for (d <- k to 1 by -1) { acc = acc + w(d - 1); suffix(d - 1) = acc }
    (w.toSeq, suffix.toSeq)
  }

  /** Truncated rank-biased overlap (Webber et al. 2010) at depth k — the
    * top-weighted similarity of two rankings: RBO@k = Σ_d (1−p)p^(d−1)·
    * overlap(d)/d ∈ [0, 1], with p tuning how much the head dominates
    * (p = 0.9 ≈ the top 10 carry ~86% of the weight). The snapshot-churn
    * metric for "did today's top tokens/domains/products move".
    *
    * Exactness: overlap enters only through each common item's
    * max(rank_a, rank_b) — RBO = Σ_items W(maxrank) with W the SUFFIX sums
    * of the weight table (no depth spine, no window: ONE aggregate over
    * the joined k-row lists); per-item terms are literal-table lookups
    * fx'd at 10⁻¹² before the order-free sum.
    *
    * @param a,b  ranked lists: (idCol, rankCol) with ranks 1..k
    * @return one row: (k, n_common, rbo).
    */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          k: Int, p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0.0 && p < 1.0, "need k >= 1 and 0 < p < 1")
    val (_, suffix) = rboWeights(k, p)
    val wArr = array(suffix.map(lit): _*)
    val ra = a.select(col(idCol).as("__id"), col(rankCol).cast(IntegerType).as("__ra"))
      .where(col("__ra") <= k)
    val rb = b.select(col(idCol).as("__id"), col(rankCol).cast(IntegerType).as("__rb"))
      .where(col("__rb") <= k)
    val joined = ra.join(rb, "__id")
      .withColumn("__w", element_at(wArr, greatest(col("__ra"), col("__rb"))))
    joined.agg(count(lit(1)).as("n_common"),
        sum(floor(col("__w") * lit(1e12) + lit(0.5)).cast(DecimalType(38, 0)))
          .as("__sfx"))
      .select(lit(k.toLong).as("k"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("__sfx").cast(DoubleType) / lit(1e12), lit(0.0)).as("rbo"))
  }

  /** NDCG@k and reciprocal rank per query over an already-ranked result
    * list (rankCol 1-based, relCol a non-negative graded relevance).
    * DCG@k = Σ_{pos≤k} rel/log₂(pos+1); the ideal ordering re-sorts the
    * SAME list by (rel desc, rank asc) — deterministic ties.
    *
    * Exactness: each term rel/(ln(pos+1)/ln 2) is ONE fixed double tree
    * over exact integers, quantized to pico fixed-point and summed
    * ORDER-FREE per query; ndcg is one final ratio of the two fx sums.
    * Windows are query-bounded (a result LIST, not the corpus).
    *
    * @return per query: (queryCol, n_items, dcg, idcg, ndcg, rr) — ndcg
    *         null when idcg = 0 (no relevant item); rr = 1/rank of the
    *         first relevant item, null when none.
    */
  def ndcgAtK(df: DataFrame, queryCol: String, rankCol: String,
              relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val D = DecimalType(38, 0)
    val rows = df.select(col(queryCol).as("q"),
        col(rankCol).cast(LongType).as("rank"),
        col(relCol).cast(LongType).as("rel"))
      .where(col("q").isNotNull && col("rank").isNotNull &&
        col("rel").isNotNull && col("rel") >= 0L)
    val wIdeal = Window.partitionBy("q")
      .orderBy(col("rel").desc, col("rank").asc)
    def gain(pos: Column) = col("rel").cast(DoubleType) /
      (log(pos.cast(DoubleType) + lit(1.0)) / log(lit(2.0)))
    def fx(c: Column) = floor(c * lit(1e12) + lit(0.5)).cast(D)
    val terms = rows
      .withColumn("ipos", row_number().over(wIdeal).cast(LongType))
      .withColumn("__dcg", when(col("rank") <= k && col("rel") > 0L,
        fx(gain(col("rank")))).otherwise(lit(0L).cast(D)))
      .withColumn("__idcg", when(col("ipos") <= k && col("rel") > 0L,
        fx(gain(col("ipos")))).otherwise(lit(0L).cast(D)))
    val agg = terms.groupBy(col("q").as(queryCol)).agg(
      count(lit(1)).as("n_items"),
      sum(col("__dcg")).as("__d"),
      sum(col("__idcg")).as("__i"),
      min(when(col("rel") > 0L, col("rank"))).as("__first"))
    agg.select(col(queryCol), col("n_items"),
      (col("__d").cast(DoubleType) / lit(1e12)).as("dcg"),
      (col("__i").cast(DoubleType) / lit(1e12)).as("idcg"),
      when(col("__i") > lit(0L).cast(D),
        col("__d").cast(DoubleType) / col("__i").cast(DoubleType)).as("ndcg"),
      when(col("__first").isNotNull,
        lit(1.0) / col("__first").cast(DoubleType)).as("rr"))
  }

  /** Qini uplift curve over score buckets — the causal-eval member next
    * to the lift table: liftTable asks "does the score find CONVERTERS";
    * Qini asks "does it find people the TREATMENT actually moves" (the
    * A/B-targeting question a conversion model can't answer — a model
    * that targets sure-things scores great on lift and zero on Qini).
    * Units rank by score into k equal-count buckets; per cumulative
    * depth, qini = conv_t − conv_c·N_t/N_c (the standard Qini curve
    * points; the area under it is the Qini coefficient).
    *
    * Exactness: bucket = ((cum−1)·k) div n over the DESCENDING distinct-
    * score rollup (the equi-depth integer formula — tie-stable, engine-
    * portable); all counts exact longs, cumulatives over the k-bounded
    * bucket frame, qini one fixed double tree. One score rollup + one
    * bounded window.
    *
    * @return per bucket 0..k-1 (0 = highest scores): (bucket, n_t, n_c,
    *         conv_t, conv_c, cum_qini) — cum_qini null while the control
    *         cumulative is empty.
    */
  def qiniCurve(df: DataFrame, scoreCol: String, treatedCol: String,
                convertedCol: String, buckets: Int = 10,
                maxLocalDistinct: Long = 1L << 20): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val rows = df.select(col(scoreCol).cast(LongType).as("s"),
        col(treatedCol).cast("boolean").as("t"),
        col(convertedCol).cast("boolean").as("y"))
      .where(col("s").isNotNull && col("t").isNotNull && col("y").isNotNull)
    val cellsBase = rows.groupBy("s").agg(
      count(lit(1)).as("c"),
      sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
      sum(when(col("t") && col("y"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("t") && col("y"), 1L).otherwise(0L)).as("cc"))
      .withColumn("k", -col("s")) // descending score = ascending key
      .localCheckpoint(true) // one layout serves the count AND the cum
    val distinct = cellsBase.count()
    val total = rows.count()
    require(total > 0, "qiniCurve needs at least one usable row")
    val cum = graft.ops.Binning.cumulativesFromCounts(cellsBase, "k",
      Seq(col("c") -> "cum"), distinct, maxLocalDistinct)
    val bucketed = cum
      .withColumn("bucket", expr(s"((cum - 1) * ${buckets}L) div ${total}L"))
      .groupBy("bucket").agg(sum(col("nt")).as("n_t"),
        sum(col("c") - col("nt")).as("n_c"),
        sum(col("ct")).as("conv_t"), sum(col("cc")).as("conv_c"))
    // k-bounded cumulative over the bucket frame
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val qini = (sum(col("conv_t")).over(w).cast(DoubleType) -
      sum(col("conv_c")).over(w).cast(DoubleType) *
        sum(col("n_t")).over(w).cast(DoubleType) /
        sum(col("n_c")).over(w).cast(DoubleType))
    bucketed
      .withColumn("cum_qini",
        when(sum(col("n_c")).over(w) > 0L, qini))
      .orderBy("bucket")
  }

  /** Bradley–Terry pairwise-preference strengths via `rounds` fixed MM
    * iterations (Hunter 2004): π'_i = W_i / Σ_j n_ij/(π_i+π_j) — the
    * latent-strength model behind preference-label curation: which
    * items/policies/judges actually win once opponents' strength is
    * accounted for (raw win RATE flatters whoever met weak opponents).
    *
    * Exactness/determinism: the corpus reduces to the directed
    * (winner, loser) win rollup once; each round's per-pair term
    * n/(π_i+π_j) quantizes to pico fx and sums ORDER-FREE per item, so
    * π' = W·10¹²/den_fx is a fixed double tree and the whole iteration
    * replays cross-engine (the q_probe_weights unrolled-round
    * discipline). Items are bounded (teams/policies), so the per-round
    * join broadcasts; corpus size enters only the first rollup.
    *
    * @return per item: (item, wins, matches, pi, strength) — strength =
    *         π normalized to sum 1 (fx order-free total); items with 0
    *         wins keep π = 0 after round 1 (the MM fixed point).
    */
  def bradleyTerry(df: DataFrame, winnerCol: String, loserCol: String,
                   rounds: Int = 5, maxDriverItems: Int = 10000): DataFrame = {
    require(rounds >= 1, "need at least one MM round")
    val D = DecimalType(38, 0)
    val wins = df.select(col(winnerCol).cast(StringType).as("i"),
        col(loserCol).cast(StringType).as("j"))
      .where(col("i").isNotNull && col("j").isNotNull && col("i") =!= col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("w"))
      .localCheckpoint(true) // the one corpus-sized pass
    // undirected opponent frame, both directions: (i, j, n_ij)
    val rev = wins.select(col("j").as("i"), col("i").as("j"), col("w"))
    val pairs = wins.select(col("i"), col("j"), col("w"))
      .unionByName(rev)
      .groupBy("i", "j").agg(sum(col("w")).as("n"))
      .localCheckpoint(true)
    val wTot = wins.groupBy("i").agg(sum(col("w")).as("wins"))
    val items = pairs.select(col("i")).distinct()
      .join(wTot, Seq("i"), "left")
      .withColumn("wins", coalesce(col("wins"), lit(0L)))
      .localCheckpoint(true)
    def fx(c: Column) = floor(c * lit(1e12) + lit(0.5)).cast(D)
    val matches = pairs.groupBy("i").agg(sum(col("n")).as("matches"))
    // Items were ALWAYS driver-bounded here: every round broadcast π (one
    // row per item) twice. When they fit a literal map (the measured bound
    // below), run the MM loop driver-routed: π rides each round's den
    // aggregate as a map literal (no per-round broadcast builds, no π
    // checkpoint job — ONE aggregate job per round instead of three), and
    // the π update replays the exact per-item double tree driver-side
    // (wins·10¹²/den_fx with den_fx.toDouble — the identical IEEE ops, so
    // the route is bit-identical; route-parity spec'd). Past the bound the
    // broadcast-join route below is unchanged.
    val itemRows = items.collect()
    if (itemRows.length <= maxDriverItems) {
      val winsMap = itemRows.map(r => r.getString(0) -> r.getLong(1)).toMap
      var piMap: Map[String, Double] = winsMap.map { case (i, _) => i -> 1.0 }
      for (_ <- 1 to rounds) {
        val piLit = typedlit(piMap)
        val den = pairs
          .withColumn("__t", fx(col("n").cast(DoubleType) /
            (element_at(piLit, col("i")) + element_at(piLit, col("j")))))
          .groupBy("i").agg(sum(col("__t")).as("den_fx"))
          .collect()
        val denMap = den.map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
        piMap = piMap.map { case (i, _) =>
          i -> (denMap.get(i).flatten match {
            case Some(d) if d.signum > 0 =>
              winsMap(i).toDouble * 1e12 / d.doubleValue
            case _ => 0.0
          })
        }
      }
      // tot replays sum(fx(pi)) exactly: floor yields a LONG per item
      // (Math.floor then toLong, as Spark's Floor does), summed as BigInt
      // like the decimal(38,0) sum it replaces
      val tot = piMap.valuesIterator
        .map(v => BigInt(math.floor(v * 1e12 + 0.5).toLong)).sum
      val totDbl = new java.math.BigDecimal(tot.bigInteger).doubleValue
      val piCol = element_at(typedlit(piMap), col("i"))
      items.join(matches, Seq("i"), "left")
        .select(col("i").as("item"), col("wins"),
          coalesce(col("matches"), lit(0L)).as("matches"), piCol.as("pi"),
          (if (tot > 0) fx(piCol).cast(DoubleType) / lit(totDbl)
           else lit(null).cast(DoubleType)).as("strength"))
    } else {
      var pi = items.select(col("i"), lit(1.0).as("pi"))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val den = pairs
          .join(broadcast(pi.select(col("i"), col("pi").as("pi_i"))), Seq("i"))
          .join(broadcast(pi.select(col("i").as("j"), col("pi").as("pi_j"))), Seq("j"))
          .withColumn("__t", fx(col("n").cast(DoubleType) /
            (col("pi_i") + col("pi_j"))))
          .groupBy("i").agg(sum(col("__t")).as("den_fx"))
        pi = items.join(den, Seq("i"), "left")
          .select(col("i"),
            when(col("den_fx").isNotNull && col("den_fx") > lit(0L).cast(D),
              col("wins").cast(DoubleType) * lit(1e12) /
                col("den_fx").cast(DoubleType))
              .otherwise(lit(0.0)).as("pi"))
          .localCheckpoint(true) // truncate the per-round lineage
      }
      val tot = pi.agg(sum(fx(col("pi"))).as("t"))
      items.join(pi, "i").join(matches, Seq("i"), "left")
        .crossJoin(broadcast(tot))
        .select(col("i").as("item"), col("wins"),
          coalesce(col("matches"), lit(0L)).as("matches"), col("pi"),
          when(col("t") > lit(0L).cast(D),
            fx(col("pi")).cast(DoubleType) / col("t").cast(DoubleType))
            .as("strength"))
    }
  }
}
