package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * RNG-based `df.sample` changes with partitioning and Spark version; these
  * operators key the keep-decision on a HASH of a stable key column instead:
  * the same row is kept in every run, on any cluster layout, and the sample
  * is refinable (fraction 0.2 ⊃ fraction 0.1). Row-local — no shuffle, no
  * RNG state; filters push down to the scan where possible.
  */
object Sampling {

  /** Keep the top `pct` PERCENT of each group by `scoreCol` (descending,
    * ties broken by `tieCols` ascending — fully deterministic): the
    * quality-threshold calibration every curation pipeline runs ("keep the
    * best 20% per language") without choosing a global cutoff that
    * over-prunes weak groups. The keep rule is EXACT INTEGER math —
    * `rank·100 ≤ group_count·pct`, i.e. floor(n·pct/100) rows per group —
    * so it replays bit-identically on any engine (a double `frac`
    * multiply would flap on ties like 0.2·500).
    *
    * Scale shape: one group-BOUNDED window pair (row_number + count) —
    * the per-group-rank family discipline; rows never leave their group's
    * partitions, no global sort.
    */
  def topPercentByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                        tieCols: Seq[String], pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be 0..100")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc +: tieCols.map(col(_).asc): _*)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("__rk").cast("long") * 100L <= col("__n") * pct)
      .drop("__rk", "__n")
  }

  /** Keep rows whose `pmod(hash(key), buckets) < fraction*buckets`.
    * `hasher` defaults to xxhash64; pass [[Shingles.md5Hash60]] for the
    * cross-engine-checkable variant.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 buckets: Int = 10000,
                 hasher: Column => Column = xxhash64(_)): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val keep = math.round(fraction * buckets)
    df.where(pmod(hasher(col(keyCol).cast("string")), lit(buckets.toLong)) < lit(keep))
  }

  /** Per-stratum fractions (e.g. downsample dominant languages, keep rare
    * ones): strata not in `fractions` fall back to `defaultFraction`.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           fractions: Map[String, Double], defaultFraction: Double = 0.0,
                           buckets: Int = 10000,
                           hasher: Column => Column = xxhash64(_)): DataFrame = {
    val keepExpr = fractions.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultFraction * buckets))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.where(pmod(hasher(col(keyCol).cast("string")), lit(buckets.toLong)) < keepExpr)
  }

  /** Resample to a TARGET stratum mixture (the data-mixing step of corpus
    * curation: "make the training set 50% en / 30% es / 20% de"): the
    * largest total consistent with the targets is `nmax = min_s(n_s / t_s)`
    * — the binding stratum is kept whole and every other stratum is
    * deterministically hash-downsampled to `t_s · nmax` expected rows, so
    * kept shares match the targets. Strata not in `targets` are dropped.
    *
    * Fully declarative and engine-reproducible: stratum counts are ONE
    * bounded aggregate, the per-stratum keep thresholds
    * `round(t_s · nmax / n_s · buckets)` are integers broadcast back onto
    * the rows, and the keep decision is the same hash-bucket rule as
    * [[hashSample]] (row-local; refinable; stable across partitionings,
    * reruns, and engines). Expected share deviation is binomial,
    * ~sqrt(n)/n per stratum — the same contract as [[capPerKey]].
    */
  def mixtureSample(df: DataFrame, keyCol: String, stratumCol: String,
                    targets: Map[String, Double], buckets: Int = 10000,
                    hasher: Column => Column = xxhash64(_)): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0),
      "targets must be non-empty with positive shares")
    val tExpr = targets.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (s, t)) => when(col(stratumCol) === s, lit(t)).otherwise(acc)
    }
    val counts = df.select(col(stratumCol).as("__stratum"), tExpr.as("__t"))
      .where(col("__t").isNotNull)
      .groupBy("__stratum", "__t").agg(count(lit(1)).as("__n"))
    val nmax = counts.agg(min(col("__n").cast("double") / col("__t")).as("__nmax"))
    val keeps = counts.crossJoin(broadcast(nmax))
      .select(col("__stratum"),
        round(col("__t") * col("__nmax") / col("__n").cast("double") * buckets)
          .cast("long").as("__keep"))
    df.join(broadcast(keeps), col(stratumCol) === col("__stratum"))
      .where(pmod(hasher(col(keyCol).cast("string")), lit(buckets.toLong)) < col("__keep"))
      .drop("__stratum", "__keep")
  }

  /** Temperature-based mixture resampling — the `p^alpha` data-mixing rule
    * (multilingual / multi-source training standard): stratum targets are
    * the OBSERVED counts raised to `alpha` (alpha < 1 flattens the mixture
    * toward the tails, alpha > 1 sharpens it toward the head, alpha = 1 is
    * a no-op, alpha = 0 equalizes). Targets feed [[mixtureSample]]
    * UNNORMALIZED — its `nmax = min(n/t)` scaling is invariant to a global
    * factor, so the n^alpha sum never needs to be computed (and summation
    * order never becomes a replay hazard).
    *
    * The per-stratum counts collect is bounded by the number of strata.
    * alpha = 0.5 routes through `sqrt` (correctly rounded in IEEE 754,
    * hence bit-identical across engines — the oracle-checkable setting);
    * general `pow` is faithful to the last ulp only per-libm.
    */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
                        alpha: Double, buckets: Int = 10000,
                        hasher: Column => Column = xxhash64(_)): DataFrame = {
    require(alpha >= 0.0, s"alpha=$alpha must be >= 0")
    val counts = df.groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n")).collect()
    val targets = counts.filter(!_.isNullAt(0)).map { r =>
      val n = r.getLong(1).toDouble
      r.getString(0) -> (if (alpha == 0.5) math.sqrt(n) else math.pow(n, alpha))
    }.toMap
    mixtureSample(df, keyCol, stratumCol, targets, buckets, hasher)
  }

  /** Deterministic multi-way split assignment (train/val/test hygiene):
    * every row gets the split its key hashes into — stable across reruns,
    * Spark versions, partitionings, and machines, which is the property
    * that keeps evaluation data out of training data over the lifetime of
    * a corpus. `splits` are (name, fraction) in order, fractions summing to
    * ≤ 1; keys hashing past the last cumulative boundary get NULL (held
    * out). `salt` decorrelates the split decision from any other
    * hash-keyed decision (sampling, capping) on the same key. Row-local,
    * no shuffle.
    */
  def assignSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
                  out: String = "split", salt: String = "|split", buckets: Int = 10000,
                  hasher: Column => Column = xxhash64(_)): DataFrame =
    df.withColumn(out, splitExpr(col(keyCol), splits, salt, buckets, hasher))

  /** The split-assignment COLUMN for an arbitrary key expression — the
    * row-local core of [[assignSplit]], exposed so downstream audits (e.g.
    * [[Dedup.splitLeakage]]) can label any id column without a join: the
    * assignment is a pure function of the key.
    */
  def splitExpr(key: Column, splits: Seq[(String, Double)],
                salt: String = "|split", buckets: Int = 10000,
                hasher: Column => Column = xxhash64(_)): Column = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0), "fractions must be >= 0")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val b = pmod(hasher(concat(key.cast("string"), lit(salt))), lit(buckets.toLong))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.zip(cum).foldRight(lit(null).cast("string")) {
      case (((name, _), cumFrac), acc) =>
        when(b < lit(math.round(cumFrac * buckets)), lit(name)).otherwise(acc)
    }
  }

  /** CHRONOLOGICAL split assignment with embargo — the time-series
    * evaluation hygiene rule ([[assignSplit]]'s hash split is correct for
    * exchangeable corpora but LEAKS for temporal data: a random test set
    * interleaves with training history, and autocorrelation carries
    * information across the boundary). Rows at-or-after `boundary` are
    * `after`; rows in the embargo gap [boundary − embargo, boundary) get
    * NULL (held out entirely — the de Prado purge: samples whose
    * label/feature windows straddle the boundary belong to neither side);
    * earlier rows are `before`. Row-local, no shuffle; compose twice for
    * train/val/test.
    */
  def assignSplitByTime(df: DataFrame, tsCol: String,
                        boundary: java.sql.Timestamp,
                        embargo: String = "0 seconds",
                        beforeName: String = "train", afterName: String = "test",
                        out: String = "split"): DataFrame = {
    val ts = col(tsCol).cast("timestamp")
    val b = lit(boundary)
    df.withColumn(out,
      when(ts >= b, lit(afterName))
        .when(ts >= b - expr(s"INTERVAL $embargo"), lit(null).cast("string"))
        .otherwise(lit(beforeName)))
  }

  /** Rendezvous (highest-random-weight) shard assignment: every key goes to
    * the shard with the LARGEST hash(key, shard) — the sharding rule whose
    * assignments survive topology change: adding/removing one shard moves
    * only ~1/n of keys (only those whose winner was the removed shard or is
    * the new one), where modulo sharding reshuffles nearly everything. The
    * output-partitioning primitive for incremental 100 TB layouts: shard by
    * rendezvous, re-shard only the moved fraction.
    *
    * Row-local (one hash per shard per row — the shard LIST rides the
    * expression, use for shard counts in the tens/hundreds); ties
    * (astronomically rare with 60-bit hashes) break to the smallest shard
    * name via the max(struct(hash, shard)) on negated-name ordering — here
    * simply first-wins in fold order, deterministic either way.
    *
    * @param shards shard names, non-empty, distinct.
    */
  def rendezvousShard(df: DataFrame, keyCol: String, shards: Seq[String],
                      out: String = "shard",
                      hasher: Column => Column = xxhash64(_)): DataFrame =
    df.withColumn(out, rendezvousExpr(col(keyCol), shards, hasher))

  /** The rendezvous COLUMN for an arbitrary key expression — the pure
    * function of (key, shard list), exposed like [[splitExpr]].
    */
  def rendezvousExpr(key: Column, shards: Seq[String],
                     hasher: Column => Column = xxhash64(_)): Column = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "shards must be non-empty and distinct")
    val best = shards.map { s =>
      struct(hasher(concat(key.cast("string"), lit("|shard|" + s))).as("h"),
        lit(s).as("s"))
    }.reduce((a, b) => when(a("h") >= b("h"), a).otherwise(b))
    best("s")
  }

  /** Deterministic weighted sample WITHOUT replacement of `k` rows
    * (Efraimidis–Spirakis via the exponential race): each row gets priority
    * e = −ln(u)/w where u ∈ (0,1) is its key's hash fraction and w its
    * weight; the k smallest priorities are a weighted sample without
    * replacement. Pick quality/length as the weight to oversample what a
    * curation pass cares about — while staying reproducible (hash, not
    * RNG): reruns and backfills select the SAME rows.
    *
    * Distributed shape: priorities are row-local; the k smallest are a
    * TakeOrderedAndProject (per-partition top-k, one merge) — no shuffle,
    * no global sort. Zero/negative weights are excluded (their priority
    * would be +∞).
    *
    * Determinism contract: with UNIQUE `keyCol` values the selected rows
    * are fully reproducible. Duplicate keys share a hash fraction (hence a
    * priority), so the sort tie-breaks on `keyCol`: the selected KEY
    * multiset is still deterministic, but which physical row represents a
    * duplicated key at the boundary is arbitrary — pass a unique key when
    * rows carry distinct payloads.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column, k: Int,
                     hasher: Column => Column = graft.functions.KmvCounts.xxhash60(_),
                     hashSpace: Double = graft.functions.KmvCounts.HashSpace): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // u in (0,1]: (hash+1)/space over non-negative hashes; ln(u) <= 0
    val h = hasher(col(keyCol).cast("string"))
    val u = (h.cast("double") + 1.0) / hashSpace
    val pri = -log(u) / weight.cast("double")
    // keyCol tiebreaker: without it, equal-priority rows at the k boundary
    // are picked by partition arrival order (see determinism contract above)
    df.where(weight.cast("double") > 0.0)
      .withColumn("__pri", pri)
      .orderBy(col("__pri").asc, col(keyCol).asc)
      .limit(k)
  }

  /** Per-key row cap (web-corpus "max N documents per domain"): keys at or
    * under `maxRows` pass wholesale; over-cap keys keep a deterministic
    * hash fraction targeting `maxRows` (expected kept ≈ maxRows with
    * binomial deviation ~sqrt(maxRows) — an APPROXIMATE cap by design: an
    * exact per-key top-N would funnel each hot key through one partition,
    * which is exactly what a domain cap exists to protect against).
    *
    * Fully distributed: one count aggregate per key, one join of the
    * (key, count) frame back onto the rows (AQE broadcasts it while small),
    * then a row-local keep filter — no windows, no per-key sort, stable
    * under any partitioning. The kept set is deterministic in (idCol,
    * maxRows, buckets, hasher) — reruns and backfills keep the SAME rows.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, maxRows: Long,
                buckets: Int = 10000,
                hasher: Column => Column = xxhash64(_)): DataFrame = {
    require(maxRows > 0, "maxRows must be > 0")
    // null-safe key equality: NULL-keyed rows form their own capped group
    // instead of being silently dropped by the join
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__key_n"))
      .withColumnRenamed(keyCol, "__key")
    val keep = ceil(lit(maxRows).cast("double") / col("__key_n").cast("double") * buckets)
    df.join(counts, col(keyCol) <=> col("__key"))
      .where(col("__key_n") <= maxRows ||
        pmod(hasher(col(idCol).cast("string")), lit(buckets.toLong)) < keep)
      .drop("__key", "__key_n")
  }

  /** EXACT deterministic per-key cap: every key keeps its `n` rows with the
    * smallest `hash(id)` — the [[capPerKey]] guarantee upgraded from
    * expected-n to exactly-min(n, |key|), still without a window sort:
    * the per-key selection is a KMV bottom-n aggregate
    * ([[graft.functions.KmvSketchAgg]]), whose map-side partials keep ≤ n
    * hashes each — the shuffle carries at most n·partitions longs per key,
    * never the key's full row set, and a hot key can't funnel its rows
    * through one sort partition the way `row_number() OVER (PARTITION BY
    * key)` does. Selected ids then semi-join the rows back (hash join,
    * AQE-broadcast while small).
    *
    * Deterministic in (idCol, n, hasher) — reruns keep the SAME rows, and
    * n' > n keeps a superset (refinable, like [[hashSample]]). `idCol`
    * must be unique per row (duplicate ids share a hash and are kept or
    * dropped together); NULL keys form their own capped group.
    */
  def topNPerKeyExact(df: DataFrame, keyCol: String, idCol: String, n: Int,
                      hasher: Column => Column = graft.functions.KmvCounts.xxhash60(_)): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val withH = df.withColumn("__h", hasher(col(idCol).cast("string")))
    val kept = withH.groupBy(col(keyCol).as("__key"))
      .agg(graft.functions.KmvSketch.kmv(col("__h"), n).as("__hs"))
      .select(col("__key"), explode(col("__hs")).as("__kh"))
    withH.join(kept, col(keyCol) <=> col("__key") && col("__h") === col("__kh"), "left_semi")
      .drop("__h")
  }

  /** Per-STRATUM [[budgetSelect]]: an independent token budget per group —
    * the mixture-weighted form ("30% code, 60% web, 10% books" becomes
    * per-stratum token budgets, each filled with that stratum's best
    * quality-per-token docs). Group-bounded windows replace the global
    * two-phase machinery (the greedy order never crosses a stratum);
    * budgets arrive as a (group, budget) frame, broadcast onto the
    * running sums. Same boundary-drop semantics as the global operator.
    *
    * @param budgets (groupCol, budgetCol) rows — strata absent from it
    *                keep NOTHING (an unallocated stratum has budget 0).
    * @return kept rows + (ratio, cum_tokens), cum_tokens ≤ the stratum's
    *         budget.
    */
  def budgetSelectByGroup(df: DataFrame, groupCol: String, idCol: String,
                          tokenCol: String, scoreCol: String,
                          budgets: DataFrame, budgetGroupCol: String,
                          budgetCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val base = df
      .withColumn("__tok", col(tokenCol).cast(LongType))
      .where(col("__tok").isNotNull && col("__tok") > 0L && col(groupCol).isNotNull)
      .withColumn("__r",
        col(scoreCol).cast(DoubleType) / col("__tok").cast(DoubleType))
    val b = broadcast(budgets.select(col(budgetGroupCol).as(groupCol),
      col(budgetCol).cast(LongType).as("__budget")))
    val w = Window.partitionBy(groupCol).orderBy(col("__r").desc, col(idCol))
    base.join(b, Seq(groupCol))
      .withColumn("cum_tokens", sum(col("__tok")).over(w))
      .where(col("cum_tokens") <= col("__budget"))
      .withColumn("ratio", col("__r"))
      .drop("__r", "__tok", "__budget")
  }

  /** Deterministic NEGATIVE sampling for contrastive pairs: each anchor
    * draws `k` pseudo-random corpus documents that are neither itself nor
    * one of its positives — the (anchor, positive, negatives…) triplet
    * feed for contrastive/embedding training, reproducible on any layout
    * (vs RNG `sample`, which re-draws per run). Draw j for an anchor is
    * md5(anchor|j) mod n mapped through a global corpus rank; collisions
    * with self/positives/duplicate draws are skipped and later slots fill
    * in (draw `k + pad` slots; under-filled anchors keep fewer — raise
    * `pad` if positives are dense).
    *
    * Scale shape: the corpus rank map is the two-phase range-partition
    * rank (NO global window); draws explode anchors ×(k+pad) skinny rows;
    * candidate resolution is one rank equi-join; positive/self exclusion
    * one anti-join on (anchor, candidate); the keep-first-k window is
    * anchor-bounded.
    *
    * @param positives (anchorCol, posCol) pairs — excluded as negatives
    *                  for their anchor.
    * @return (anchor, slot, negative) — slot is the surviving draw's
    *         original index, ≤ k rows per anchor.
    */
  def contrastiveNegatives(anchors: DataFrame, anchorCol: String,
                           positives: DataFrame, posAnchorCol: String,
                           posCol: String, corpus: DataFrame, corpusIdCol: String,
                           k: Int, pad: Int = 4): DataFrame = {
    require(k >= 1 && pad >= 0, "bad k/pad")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    // global 0-based corpus rank in md5-hash order: range partition +
    // per-partition row_number + broadcast offsets (the SNM discipline)
    val hashed = corpus.select(col(corpusIdCol).as("__cid"))
      .withColumn("__ch", Shingles.md5Hash60(concat(col("__cid").cast("string"), lit("|corpus"))))
      .repartitionByRange(col("__ch"), col("__cid"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = hashed.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = totals.valuesIterator.sum
    require(n > 0, "empty corpus")
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L))
    val wRank = Window.partitionBy("__pid").orderBy(col("__ch"), col("__cid"))
    val ranked = hashed
      .withColumn("__rank", row_number().over(wRank).cast(LongType) - 1L + offsetExpr)
      .select(col("__rank"), col("__cid"))
    val draws = anchors.select(col(anchorCol).as("__a")).distinct()
      .select(col("__a"), explode(sequence(lit(0), lit(k + pad - 1))).as("slot"))
      .withColumn("__draw",
        pmod(Shingles.md5Hash60(
          concat(col("__a").cast("string"), lit("|neg"), col("slot").cast("string"))),
          lit(n)))
    val pos = positives.select(col(posAnchorCol).as("__a"), col(posCol).as("__cid"))
    val wKeep = Window.partitionBy("__a").orderBy("slot")
    draws.join(ranked, col("__draw") === col("__rank"))
      .where(col("__cid") =!= col("__a"))
      .join(pos, Seq("__a", "__cid"), "left_anti")
      // duplicate draws keep their EARLIEST slot (deterministic, unlike
      // dropDuplicates' arbitrary row)
      .groupBy(col("__a"), col("__cid"))
      .agg(min(col("slot")).cast(LongType).as("slot"))
      .withColumn("__keep", row_number().over(wKeep))
      .where(col("__keep") <= k)
      .select(col("__a").as("anchor"), col("slot"), col("__cid").as("negative"))
  }

  /** TOKEN-BUDGET selection: fill a token budget with the best documents
    * by quality-per-token — the greedy knapsack that turns "we can afford
    * 10B training tokens" into a concrete keep-set (greedy by ratio IS
    * optimal for the fractional relaxation; the one boundary doc that
    * would cross the budget is dropped, documented semantics). Keeps rows
    * in descending (score/tokens, id-tiebreak) order while the running
    * token total stays ≤ `budgetTokens`.
    *
    * Scale shape: the global greedy order rides the two-phase
    * range-partition discipline ([[graft.scan.Drift.fdrControl]]'s):
    * range-repartition on (ratio desc, id), per-partition running token
    * sums + broadcast prior-partition totals — no global-order window.
    * The ratio is ONE double division of exact longs (engine-portable);
    * everything else is integer.
    *
    * @return kept rows + (ratio, cum_tokens), cum_tokens ≤ budgetTokens.
    */
  def budgetSelect(df: DataFrame, idCol: String, tokenCol: String,
                   scoreCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val base = df
      .withColumn("__tok", col(tokenCol).cast(LongType))
      .where(col("__tok").isNotNull && col("__tok") > 0L)
      .withColumn("__r",
        col(scoreCol).cast(DoubleType) / col("__tok").cast(DoubleType))
    val parts = base.repartitionByRange(col("__r").desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // freeze pid assignment across the jobs below
    val totals = parts.groupBy("__pid").agg(sum(col("__tok")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] =
      pids.zip(pids.scanLeft(0L)((a, p) => a + totals(p)).init).toMap
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("__r").desc, col(idCol))
    parts
      .withColumn("cum_tokens", sum(col("__tok")).over(w) + offsetExpr)
      .where(col("cum_tokens") <= lit(budgetTokens))
      .withColumn("ratio", col("__r"))
      .drop("__pid", "__r", "__tok")
  }

  /** Poisson(1) CDF thresholds on the 60-bit hash range — the shared
    * literal table for [[bootstrapMeans]] and its oracle (generated in
    * ONE place, the periodogram trig-table discipline). A hash below
    * `poissonThresholds60(k)` draws weight ≤ k. */
  private[graft] val poissonThresholds60: Seq[Long] = {
    val cdf = Iterator.iterate((0, 1.0 / math.E, 1.0 / math.E)) {
      case (k, pk, acc) =>
        val p = pk / (k + 1); (k + 1, p, acc + p)
    }.take(9).map(_._3).toSeq
    cdf.map(c => math.floor(c * math.pow(2, 60)).toLong)
  }

  /** Deterministic multiplier bootstrap of a fixed-point mean — the
    * RESAMPLING uncertainty a single variance number understates for
    * skewed/heavy-tailed columns, without any data movement: each row
    * draws a Poisson(1) multiplicity PER RESAMPLE from its id-hash (the
    * classic multinomial→Poisson bootstrap approximation), so resample b
    * is a deterministic row-local function and the whole B-resample sweep
    * is ONE skinny (b, w, w·x) shuffle with map-side combine — no shuffle
    * of the data, no per-resample pass, replayable on any engine.
    *
    * Exactness: weights come from integer hash-threshold comparisons
    * (the shared [[poissonThresholds60]] literals), Σw and Σw·x are exact
    * longs-in-decimal, each resample mean is ONE final tree.
    *
    * @return per resample: (b, sum_w, sum_wx, mean) ordered by b —
    *         percentile CIs select from the sorted means.
    */
  def bootstrapMeans(df: DataFrame, idCol: String, valueCol: String,
                     resamples: Int = 20): DataFrame = {
    require(resamples >= 2, "need at least 2 resamples")
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val Dbl = org.apache.spark.sql.types.DoubleType
    val rows = df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast(org.apache.spark.sql.types.LongType).as("__v"))
      .where(col("__id").isNotNull && col("__v").isNotNull)
    val weighted = rows.select(posexplode(expr(s"sequence(0, ${resamples - 1})"))
        .as(Seq("__i", "b")), col("__id"), col("__v"))
      .withColumn("__h", graft.ops.Shingles.md5Hash60(
        concat(col("__id"), lit("|bs|"), col("b").cast("string"))))
      .withColumn("__w", poissonThresholds60.zipWithIndex.reverse
        .foldLeft(lit(poissonThresholds60.size.toLong)) { case (acc, (t, k)) =>
          when(col("__h") < lit(t), lit(k.toLong)).otherwise(acc)
        })
    weighted.groupBy("b")
      .agg(sum(col("__w").cast(D)).as("__sw"),
        sum((col("__w") * col("__v")).cast(D)).as("__swx"))
      .select(col("b").cast(org.apache.spark.sql.types.LongType).as("b"),
        col("__sw").cast(org.apache.spark.sql.types.LongType).as("sum_w"),
        col("__swx").cast(org.apache.spark.sql.types.LongType).as("sum_wx"),
        when(col("__sw") > lit(0L).cast(D),
          col("__swx").cast(Dbl) / col("__sw").cast(Dbl)).as("mean"))
      .orderBy("b")
  }
}
