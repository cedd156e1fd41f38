package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (100 TB):
  *  - exact dedup shuffles only (hash, id) — never the document body;
  *  - MinHash signatures are computed row-locally with array HOFs (no
  *    explode); only (band-bucket, id) pairs shuffle;
  *  - Jaccard verification uses an inverted-index join with a
  *    document-frequency cap so hot tokens can't create quadratic blow-up.
  */
object Dedup {

  /** Broadcast ceiling for [[minhashLshPairs]]'s verification token sets when
    * the caller lets the router measure (broadcastVerify = None): 1 GiB —
    * comfortably under Spark's 8 GB broadcast hard limit while leaving room
    * for the two verification sides to coexist per executor.
    */
  val DefaultVerifyBroadcastMaxBytes: Long = 1L << 30

  /** Sentinel for [[minhashLshPairs]]'s `maxBucket`: measure the hottest
    * band bucket first, then route (exact first-matching-band path under
    * [[DefaultHotBucketCap]], hot-bucket drop + pair-level dedup over it).
    */
  val AutoMaxBucket: Int = -1

  /** Bucket-size cap the AUTO route enforces when the measured hottest
    * bucket exceeds it: 2048 members ≈ 2.1M candidate pairs from the worst
    * single bucket — bounded work per bucket at any corpus size. Docs in a
    * hotter bucket collide in (nearly) EVERY band — they are boilerplate
    * near-dups of everything there, which cluster-representative handling
    * (components over the surviving pairs) resolves without the O(B²)
    * enumeration.
    */
  val DefaultHotBucketCap: Int = 2048

  /** Candidate-volume cap for the capped route's ENUMERATION strategy:
    * under it the row-local first-matching-band filter wins (no pair
    * exchange at all — measured 4.5 vs 6.2 s at sf0.1); over it, IF the
    * measured distinct-member-set collapse at least halves the volume,
    * the member-set bucket-dedup + pair-level exchange wins (a degenerate
    * corpus collides the SAME rep set in every band, so first-band pays
    * bands× the enumeration the collapse removes — the 30×-scale failure
    * mode). 2²⁷ ≈ 134M in-bucket candidate evaluations ≈ seconds of
    * row-local filter work per executor — comfortably inside the
    * first-band win region at bench scale, well under the 10⁹-evaluation
    * pressure measured at 30×.
    */
  val DefaultFirstBandVolumeCap: Long = 1L << 27

  /** Residual-drop threshold for the AUTO route AFTER the exact-dup
    * signature collapse: a rep-level bucket is dropped only past this
    * (8192 reps ≈ 34M candidate pairs from one bucket — the genuine
    * boilerplate regime). Decoupled from [[DefaultHotBucketCap]] (which
    * decides whether the collapse machinery engages at all): a corpus can
    * legitimately hold a few-thousand-strong near-dup cluster of DISTINCT
    * signatures (the factor-30 bench corpus has one), and dropping it
    * loses real pairs when enumerating it costs only seconds — the drop
    * is the last resort, not the first response. Forced positive
    * `maxBucket` keeps the user's explicit drop threshold.
    */
  val DefaultResidualDropCap: Int = 4 * DefaultHotBucketCap

  /** Max high-DF shingle-hash entries collected for the row-local DF-prune
    * filter (2^20 longs = 8 MB on the driver and in each task's reference
    * object). Boilerplate sets are heavy-hitter bounded — at most
    * total-shingle-instances / maxShingleDf entries can exceed the
    * threshold — so the broadcast route is the overwhelmingly common one;
    * past the cap the prune falls back to the anti-join pass.
    */
  val DefaultDfPruneBroadcastMax: Int = 1 << 20

  /** Exact dedup: one row per distinct `textCol` value, keeping the smallest
    * `idCol`, with the number of copies. Shuffles (hash, id) only; the text
    * body never crosses the wire (collision odds at 64-bit are ~n^2/2^65).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(xxhash64(col(textCol)).as("text_hash"), col(idCol).as("id"))
      .groupBy("text_hash")
      .agg(min("id").as("keep_id"), count(lit(1)).as("copies"))
      .select("keep_id", "copies")

  /** Exact dedup keep-rows: the surviving rows themselves. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Sorted distinct n-gram-shingle-HASH array: set-cardinality-preserving
    * (64-bit, collisions ~n²/2^65), so jaccard over it equals jaccard over
    * the shingle-string set — with long compares instead of string compares
    * in the merge walk and an 8-byte element in every shuffle/broadcast
    * instead of the shingle text. shingleLen=1 gives the token set.
    */
  private def tokenHashSet(text: Column, shingleLen: Int = 1): Column =
    array_sort(array_distinct(transform(
      Shingles.shingleStrings(TextAnalysis.tokens(text), shingleLen), t => xxhash64(t))))

  /** Exact token-set Jaccard near-dup pairs via inverted-index join.
    *
    * Emits (id_a, id_b, inter, union_size) with id_a < id_b and
    * jaccard >= `threshold`. `maxDf` drops tokens appearing in more than that
    * many documents (stop-token cap — bounds the quadratic candidate blow-up;
    * pass Int.MaxValue for exact behavior on small corpora).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, blockCols: Seq[String] = Nil,
                   maxDf: Int = Int.MaxValue): DataFrame = {
    // inverted index over token HASHES: the join key and shuffle rows carry
    // 8-byte longs, never the token text
    val docs = df.select((col(idCol).as("id") +: tokenHashSet(col(textCol)).as("toks") +: blockCols.map(col)): _*)
      .withColumn("nt", size(col("toks")))
    val inv = docs.select((col("id") +: col("nt") +: explode(col("toks")).as("tok") +: blockCols.map(col)): _*)
    val capped =
      if (maxDf == Int.MaxValue) inv
      else {
        val hot = inv.groupBy("tok").agg(count(lit(1)).as("df")).where(col("df") > maxDf).select("tok")
        inv.join(broadcast(hot), Seq("tok"), "left_anti")
      }
    val joinKeys = "tok" +: blockCols
    val a = capped.select((col("tok") +: col("id").as("id_a") +: col("nt").as("nt_a") +: blockCols.map(col)): _*)
    val b = capped.select((col("tok") +: col("id").as("id_b") +: col("nt").as("nt_b") +: blockCols.map(col)): _*)
    // size-ratio prefilter is LOSSLESS: jaccard >= t implies
    // min(|A|,|B|) / max(|A|,|B|) >= t, so incompatible-size pairs can be
    // dropped before the per-pair aggregation.
    a.join(b, joinKeys)
      .where(col("id_a") < col("id_b") &&
        col("nt_a").cast(DoubleType) >= lit(threshold) * col("nt_b").cast(DoubleType) &&
        col("nt_b").cast(DoubleType) >= lit(threshold) * col("nt_a").cast(DoubleType))
      .groupBy("id_a", "id_b", "nt_a", "nt_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("union_size", col("nt_a") + col("nt_b") - col("inter"))
      .where(col("inter").cast(DoubleType) / col("union_size").cast(DoubleType) >= threshold)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** Exact token-set Jaccard pairs via PREFIX FILTERING (Chaudhuri et al.
    * ICDE'06 / Xiao et al. PPJoin): index only each document's first
    * `n − ⌈t·n⌉ + 1` tokens in the global (hash) order. Completeness: two
    * sets with jaccard ≥ t share ≥ ⌈t·max(n_a,n_b)⌉ tokens, and sets
    * sharing that many tokens must collide within both prefixes — so
    * candidate generation loses nothing while the inverted index carries
    * only ~(1−t) of each document's tokens: at t = 0.9, a 10× smaller
    * index and ~100× fewer token-join rows than [[jaccardPairs]], the
    * difference between feasible and not at corpus scale.
    *
    * Candidates are verified with one exact set intersection against the
    * full token arrays (two skinny id-keyed joins). Output is identical to
    * [[jaccardPairs]] — (id_a, id_b, inter, union_size) — and the two
    * strategies are equivalence-spec'd.
    */
  /** @param positional PPJoin's POSITIONAL filter (Xiao et al. WWW'08) on
    *        top of the prefix filter: candidates collide at known sorted
    *        positions (i, j), and at the pair's FIRST collision in global
    *        token order every shared token lies in the suffixes from i and
    *        j, so overlap ≤ 1 + min(n_a−i−1, n_b−j−1). Pairs whose bound
    *        can't reach α = t·(n_a+n_b)/(1+t) are pruned BEFORE the
    *        verification joins. Lossless: for a qualifying pair the first
    *        prefix collision IS the globally first shared token (the
    *        prefix-filter theorem), so the bound holds; the prune only
    *        tightens candidate generation — verification is exact either
    *        way (equivalence spec'd). Same shuffle count (the min-struct
    *        aggregate replaces the pair dropDuplicates).
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, blockCols: Seq[String] = Nil,
                         positional: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val docs = df.select((col(idCol).as("id") +: tokenHashSet(col(textCol)).as("toks") +:
        blockCols.map(col)): _*)
      .withColumn("nt", size(col("toks")))
    val prefLen = col("nt") -
      ceil(lit(threshold) * col("nt").cast(DoubleType)).cast(IntegerType) + 1
    val joinKeys = "tok" +: blockCols
    val sizeCompatible = col("id_a") < col("id_b") &&
      col("nt_a").cast(DoubleType) >= lit(threshold) * col("nt_b").cast(DoubleType) &&
      col("nt_b").cast(DoubleType) >= lit(threshold) * col("nt_a").cast(DoubleType)
    val cand = if (!positional) {
      val inv = docs
        .select((col("id") +: col("nt") +:
          explode(slice(col("toks"), lit(1), prefLen)).as("tok") +: blockCols.map(col)): _*)
      val a = inv.select((col("tok") +: col("id").as("id_a") +: col("nt").as("nt_a") +: blockCols.map(col)): _*)
      val b = inv.select((col("tok") +: col("id").as("id_b") +: col("nt").as("nt_b") +: blockCols.map(col)): _*)
      a.join(b, joinKeys).where(sizeCompatible)
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    } else {
      // carry each prefix token's 0-based position in the doc's sorted
      // token array through the join
      val inv = docs
        .select((col("id") +: col("nt") +: blockCols.map(col)) :+
          posexplode(slice(col("toks"), lit(1), prefLen)): _*)
        .withColumnRenamed("col", "tok")
      val a = inv.select((col("tok") +: col("id").as("id_a") +: col("nt").as("nt_a") +:
        col("pos").as("pa") +: blockCols.map(col)): _*)
      val b = inv.select((col("tok") +: col("id").as("id_b") +: col("nt").as("nt_b") +:
        col("pos").as("pb") +: blockCols.map(col)): _*)
      // first collision = smallest shared token (struct min leads on tok);
      // bound: 1 + min(remaining-a, remaining-b) must reach the required
      // overlap α ⇔ (1+m)(1+t) ≥ t(n_a+n_b) (tiny slack so a 1-ulp float
      // error can only under-prune, never over-prune)
      a.join(b, joinKeys).where(sizeCompatible)
        .groupBy("id_a", "id_b")
        .agg(min(struct(col("tok"), col("pa"), col("pb"),
          col("nt_a"), col("nt_b"))).as("f"))
        .where((lit(1.0) + least(col("f.nt_a") - col("f.pa") - 1,
            col("f.nt_b") - col("f.pb") - 1).cast(DoubleType)) * lit(1.0 + threshold) >=
          lit(threshold) * (col("f.nt_a") + col("f.nt_b")).cast(DoubleType) - lit(1e-9))
        .select("id_a", "id_b")
    }
    cand
      .join(docs.select(col("id").as("id_a"), col("toks").as("toks_a"), col("nt").as("nt_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("toks").as("toks_b"), col("nt").as("nt_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("union_size", col("nt_a") + col("nt_b") - col("inter"))
      .where(col("inter").cast(DoubleType) / col("union_size").cast(DoubleType) >= threshold)
      .select("id_a", "id_b", "inter", "union_size")
  }

  /** Exact token-set CONTAINMENT pairs via the same inverted-index join:
    * C(sub → sup) = |sub ∩ sup| / |sub| — the asymmetric complement of
    * [[jaccardPairs]]. A short document wholly embedded in a much longer one
    * scores containment ≈ 1 where Jaccard ≈ |sub|/|sup| ≈ 0, so this is the
    * detector for quote-reuse / boilerplate-envelope / sub-document
    * duplication. Emits DIRECTED rows (id_sub, id_sup) for every direction
    * meeting `threshold` (mutual containment emits both).
    *
    * No size-ratio prefilter exists here ON PURPOSE: containment's whole
    * point is size-incompatible pairs, and for the smaller side inter ≥
    * t·|sub| is not size-boundable. The quadratic guard is therefore `maxDf`
    * (stop-token cap) + blocking, same discipline as [[jaccardPairs]]; the
    * per-pair shuffle rows are (8-byte hash, id, count) only. The
    * containment double is one division of two exact counts — oracle-exact.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, blockCols: Seq[String] = Nil,
                       maxDf: Int = Int.MaxValue, shingleLen: Int = 1): DataFrame = {
    val docs = df.select((col(idCol).as("id") +: tokenHashSet(col(textCol), shingleLen).as("toks") +: blockCols.map(col)): _*)
      .withColumn("nt", size(col("toks")))
    val inv = docs.select((col("id") +: col("nt") +: explode(col("toks")).as("tok") +: blockCols.map(col)): _*)
    val capped =
      if (maxDf == Int.MaxValue) inv
      else {
        val hot = inv.groupBy("tok").agg(count(lit(1)).as("df")).where(col("df") > maxDf).select("tok")
        inv.join(broadcast(hot), Seq("tok"), "left_anti")
      }
    val joinKeys = "tok" +: blockCols
    val a = capped.select((col("tok") +: col("id").as("id_a") +: col("nt").as("nt_a") +: blockCols.map(col)): _*)
    val b = capped.select((col("tok") +: col("id").as("id_b") +: col("nt").as("nt_b") +: blockCols.map(col)): _*)
    val pairs = a.join(b, joinKeys)
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "nt_a", "nt_b")
      .agg(count(lit(1)).as("inter"))
    val ab = pairs.select(col("id_a").as("id_sub"), col("id_b").as("id_sup"),
      col("inter"), col("nt_a").as("nt_sub"), col("nt_b").as("nt_sup"))
    val ba = pairs.select(col("id_b").as("id_sub"), col("id_a").as("id_sup"),
      col("inter"), col("nt_b").as("nt_sub"), col("nt_a").as("nt_sup"))
    ab.unionByName(ba)
      .withColumn("containment",
        col("inter").cast(DoubleType) / col("nt_sub").cast(DoubleType))
      .where(col("containment") >= threshold)
      .select("id_sub", "id_sup", "inter", "nt_sub", "nt_sup", "containment")
  }

  /** Exact blocked Jaccard via all-pairs-within-block + the native
    * sorted-merge [[graft.functions.JaccardSimExpr]]. The right strategy when
    * blocks are small or documents share most of their vocabulary — there the
    * inverted-index join ([[jaccardPairs]]) degenerates to ~sum(df(t)^2) rows,
    * while this is block² pairs × an O(n+m) merge walk. Output:
    * (id_a, id_b, jaccard). `broadcastRight`: broadcast the (id, token-set)
    * side — fine while token sets fit in executor memory.
    */
  /** `shingleLen` > 1 switches the set definition from tokens to n-gram
    * shingles (word n-gram Jaccard — order-sensitive near-dup detection).
    */
  def jaccardPairsAllPairs(df: DataFrame, idCol: String, textCol: String,
                           threshold: Double, blockCols: Seq[String],
                           broadcastRight: Boolean = true, shingleLen: Int = 1): DataFrame = {
    // shingle-HASH sets: long merge walk + 8-byte broadcast elements
    val docs = df.select((col(idCol).as("id") +: tokenHashSet(col(textCol), shingleLen).as("toks") +: blockCols.map(col)): _*)
    val a = docs.select((col("id").as("id_a") +: col("toks").as("toks_a") +: blockCols.map(col)): _*)
    val bRaw = docs.select((col("id").as("id_b") +: col("toks").as("toks_b") +: blockCols.map(col)): _*)
    val b = if (broadcastRight) broadcast(bRaw) else bRaw
    // LOSSLESS size-ratio prefilter (jaccard >= t ⟹ min|set| >= t·max|set|):
    // short-circuits the merge walk for size-incompatible pairs before any
    // element comparison happens.
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b") &&
        size(col("toks_a")).cast(DoubleType) >= lit(threshold) * size(col("toks_b")).cast(DoubleType) &&
        size(col("toks_b")).cast(DoubleType) >= lit(threshold) * size(col("toks_a")).cast(DoubleType))
      .select(col("id_a"), col("id_b"),
        graft.functions.JaccardSim.jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature: `numHashes` permutations h_i(s) = (a_i*x + b_i) mod p
    * over xxhash64 shingle hashes, each minimized with array HOFs — entirely
    * row-local, no explode, no shuffle.
    */
  /** Signature from a MATERIALIZED shingle-hash array column, via the native
    * codegen'd [[graft.functions.MinHashSignatureExpr]] (one fused n×k loop).
    * Keep the hash array a real column (not an inline expression) — Catalyst
    * inlines (recomputes) referenced expressions per use.
    */
  def minhashSignatureFromHashes(hashes: Column, numHashes: Int): Column =
    graft.functions.MinHash.signature(hashes, numHashes)

  /** Builtin-HOF fallback with identical semantics (k `array_min(transform)`
    * passes) — kept for cross-checking the native expression.
    */
  def minhashSignatureFromHashesHof(hashes: Column, numHashes: Int): Column = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    array(as.zip(bs).toSeq.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(pmod(h, lit(p)) * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** MinHash signature of raw text (convenience; for hot paths use
    * [[minhashSignatureFromHashes]] over a materialized hash column).
    */
  def minhashSignature(text: Column, shingleLen: Int, numHashes: Int): Column =
    minhashSignatureFromHashes(Shingles.shingleHashes(TextAnalysis.tokens(text), shingleLen), numHashes)

  /** Shingle doc-frequency prune over a hashed frame `(id, h: array<bigint>)`:
    * drops every shingle hash appearing in MORE than `maxDf` distinct docs,
    * and every doc whose pruned set is empty. DF is computed on distinct
    * (doc, shingle) pairs, so within-doc repetition doesn't inflate it.
    *
    * Measure-then-route: the high-DF set is collected when it fits under
    * `broadcastMax` entries (heavy-hitter bounded, the common case) and
    * bound into the row-local codegen'd [[graft.functions.LongSetFilterExpr]]
    * — no extra shuffle; otherwise an explode + anti-join + re-collect pass
    * runs, checkpointed once because both the signature and verification
    * branches read the pruned frame.
    */
  private[graft] def prunedShingleHashes(hashed: DataFrame, maxDf: Int,
                                         broadcastMax: Int): DataFrame = {
    val ex = hashed.select(col("id"), explode(array_distinct(col("h"))).as("sh"))
    val hot = ex.groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sh")
    val head = hot.limit(broadcastMax + 1).collect().map(_.getLong(0))
    if (head.length <= broadcastMax)
      hashed.select(col("id"),
          graft.functions.LongSetFilter.exceptSet(col("h"), head.toSeq).as("h"))
        .where(size(col("h")) > 0)
    else {
      val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")
      log.info(s"prunedShingleHashes: > $broadcastMax shingles over df=$maxDf — " +
        "taking the anti-join prune route")
      ex.join(hot, Seq("sh"), "left_anti")
        .groupBy("id").agg(collect_list(col("sh")).as("h"))
        .localCheckpoint(true)
    }
  }

  /** MinHash + LSH banded near-dup candidate pairs, verified with exact
    * token-set Jaccard. `numHashes` = `bands` * rows-per-band.
    */
  /** `broadcastVerify`: broadcast the per-doc token sets for the verification
    * joins — right whenever they fit in executor memory. `None` (default)
    * MEASURES instead of guessing: the router reads Catalyst's size estimate
    * of the (id, text) projection and broadcasts only when it fits under
    * `verifyBroadcastMaxBytes` — the token-set frame is the same order of
    * magnitude as the text it hashes (8 bytes per shingle hash vs the ~5-8
    * byte shingle source), so the corpus-side estimate is the right proxy and
    * costs nothing (no extra job). At 100 TB the estimate is corpus-sized,
    * the router picks skinny id-keyed shuffle joins, and AQE still converts
    * to broadcast at runtime if the post-filter side turns out tiny.
    * `Some(true|false)` forces a route (tests / known-shape callers).
    */
  /** `maxBucket`: drop band buckets larger than this before pair
    * generation. A bucket of size B contributes B²/2 candidates; pathological
    * clusters (boilerplate, empty docs) can make one bucket dominate the
    * whole job. Capping is the standard at-scale mitigation — docs in such
    * buckets are near-dups of *everything* there and are better handled by
    * cluster representatives (see [[Components.connectedComponents]]) than by
    * enumerating O(B²) pairs.
    *
    * Default [[AutoMaxBucket]] MEASURES instead of guessing (the
    * jaccardPairsAuto / semDedupBlocks / cosinePairsAuto discipline applied
    * to LSH's own buckets): the skinny banded frame is materialized once,
    * ONE bucket-size aggregate reads the hottest bucket, and the route is
    * picked from the measurement — under [[DefaultHotBucketCap]] the exact
    * first-matching-band path runs BIT-IDENTICALLY to the uncapped
    * semantics; over it the capped route runs: exact-duplicate signatures
    * PRE-COLLAPSE to min-id representatives (each group emits its linear
    * (rep, member) star — a degenerate bucket IS mostly an exact-dup
    * cluster, so its connectivity survives at linear cost), only the
    * representatives enter the bucket machinery, residual hot buckets drop
    * BEFORE member-list materialization (broadcast anti-join — the
    * degenerate collect_list row is never built) and the sound
    * pair-level-dedup fallback runs, with the route logged. Pass
    * `Int.MaxValue` to force exact uncapped semantics (no measurement), or
    * a positive cap to force the capped path.
    */
  /** `tokenHasher`: hash applied to each shingle string. xxhash64 (default)
    * is the fast path; [[Shingles.md5Hash60]] is the oracle-checkable one.
    */
  /** `memberSetExchange`: forces the capped route's enumeration strategy
    * (`Some(true)` = member-set bucket-dedup + pair exchange,
    * `Some(false)` = row-local first-matching-band). `None` (default)
    * MEASURES: the bucket histogram the residual-drop decision already
    * pays also yields total candidate volume Σ n(n−1)/2 and the volume
    * surviving a distinct-member-set collapse (order-free per-bucket
    * fingerprint); the exchange engages only when volume exceeds
    * `firstBandVolumeCap` AND the collapse at least halves it — a huge
    * but incompressible corpus keeps the exchange-free first-band path.
    */
  /** `maxShingleDf`: prune shingles whose corpus DOCUMENT FREQUENCY exceeds
    * this BEFORE signatures (Int.MaxValue = off). High-DF shingles are
    * boilerplate — headers, license blocks, navigation chrome — and they are
    * where LSH candidate volume comes from: a shingle shared by B docs seeds
    * buckets of size ~B across bands, i.e. O(B²) candidate pairs that exact
    * verification then rejects. Pruning them shrinks both the signature
    * universe and the pair enumeration; similarity becomes Jaccard over the
    * RARE-shingle sets (a SEMANTIC change — near-dups still share their
    * rare shingles, but boilerplate-only overlap no longer counts, which is
    * usually the intent). Docs whose entire shingle set is boilerplate drop
    * out (no signature, no pairs).
    *
    * Scale shape: the high-DF set is MEASURED (one distinct-(doc,shingle)
    * aggregate — skinny 16-byte rows); when it fits under
    * `dfPruneBroadcastMax` entries it binds into a row-local codegen'd
    * binary-search filter ([[graft.functions.LongSetFilterExpr]] — no
    * extra shuffle, the common case: boilerplate sets are heavy-hitter
    * sized by construction), else the prune falls back to an explode +
    * anti-join + re-collect pass (one extra corpus shuffle, materialized
    * once for both the signature and verification readers).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 64, bands: Int = 16,
                      shingleLen: Int = 3, broadcastVerify: Option[Boolean] = None,
                      maxBucket: Int = AutoMaxBucket,
                      tokenHasher: Column => Column = xxhash64(_),
                      verifyBroadcastMaxBytes: Long = DefaultVerifyBroadcastMaxBytes,
                      memberSetExchange: Option[Boolean] = None,
                      firstBandVolumeCap: Long = DefaultFirstBandVolumeCap,
                      maxShingleDf: Int = Int.MaxValue,
                      dfPruneBroadcastMax: Int = DefaultDfPruneBroadcastMax): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(maxBucket == AutoMaxBucket || maxBucket > 0,
      s"maxBucket must be positive or AutoMaxBucket ($AutoMaxBucket)")
    require(maxShingleDf >= 1, "maxShingleDf must be >= 1 (Int.MaxValue = no pruning)")
    val rowsPerBand = numHashes / bands
    // (id, sig) only — the document body never enters the LSH shuffle.
    // The repartition is a deliberate materialization barrier: it (a) keeps
    // the shingle-hash array from being inlined into all numHashes
    // permutation expressions, (b) keeps the signature from being inlined
    // into all band-key expressions, and (c) is reused (ReuseExchange) by
    // both sides of the self-join below.
    val hashedRaw = df.select(col(idCol).as("id"),
      transform(Shingles.shingleStrings(TextAnalysis.tokens(col(textCol)), shingleLen), tokenHasher).as("h"))
    val hashed =
      if (maxShingleDf == Int.MaxValue) hashedRaw
      else prunedShingleHashes(hashedRaw, maxShingleDf, dfPruneBroadcastMax)
    val sigs = hashed
      .repartition(col("id"))
      .select(col("id"), minhashSignatureFromHashes(col("h"), numHashes).as("sig"))

    // per-doc band-key array (hash of each signature slice); each doc then
    // explodes to (band, bkey) rows CARRYING the 16-long array — the array is
    // what lets pair generation dedup inline (below). Keys hash the slice
    // LONGS directly (multi-arg xxhash64) — bucket membership is decided by
    // slice equality either way, and the string form (concat_ws over a
    // slice) paid a per-band string build measured at ~1 s per 5k docs.
    val bandedRaw = sigs.select(col("id"),
      array((0 until bands).map(b =>
        xxhash64((0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)) :+ lit(b): _*)): _*).as("bk"))

    // Route resolution. Forced-exact (Int.MaxValue) keeps the single-pass
    // pipeline untouched. Auto/forced-cap materialize the SKINNY banded
    // frame once (id + bands longs, ~140 bytes/doc) so the bucket-size
    // measurement and the bucket build both read it without recomputing the
    // signature scan — the expensive per-doc shingle+hash work runs exactly
    // once either way.
    // effMax: Int.MaxValue = exact single-pass route; else the capped
    // machinery engages and dropAt is the rep-level bucket size past which
    // residual buckets are DROPPED (the user's explicit maxBucket, or
    // DefaultResidualDropCap on the auto route — see its scaladoc).
    val (banded, effMax, dropAt) =
      if (maxBucket == Int.MaxValue) (bandedRaw, Int.MaxValue, Int.MaxValue)
      else {
        val ck = bandedRaw.localCheckpoint(true)
        if (maxBucket > 0) (ck, maxBucket, maxBucket)
        else {
          // MEASURE: one aggregate over the exploded band keys → hottest
          // bucket size. Only the 1-row max comes back to the driver (bucket
          // COUNT is corpus-sized, so no per-bucket collect here — unlike
          // the cell/block routers whose key spaces are bounded).
          val r = ck.select(posexplode(col("bk")).as(Seq("band", "bkey")))
            .groupBy("band", "bkey").agg(count(lit(1)).as("n"))
            .agg(max(col("n"))).collect()(0)
          val hottest = if (r.isNullAt(0)) 0L else r.getLong(0)
          if (hottest <= DefaultHotBucketCap) (ck, Int.MaxValue, Int.MaxValue)
          else {
            val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")
            log.info(s"minhashLshPairs: hottest band bucket has $hottest members " +
              s"(> $DefaultHotBucketCap cap, ~${hottest * (hottest - 1) / 2} candidate " +
              s"pairs) — pre-collapsing exact-dup signatures; residual buckets " +
              s"past $DefaultResidualDropCap reps drop")
            (ck, DefaultHotBucketCap, DefaultResidualDropCap)
          }
        }
      }
    // Capped routes PRE-COLLAPSE exact-duplicate signatures before
    // bucketing — a degenerate bucket IS (mostly) an exact-dup cluster, so
    // instead of losing its pairs wholesale: docs sharing a signature
    // collapse to their min-id representative, each group emits its linear
    // (rep, member) star (B−1 pairs, verified like any candidate — a
    // sig-collision pair simply fails the exact-jaccard check), and only
    // the REPRESENTATIVES enter the bucket machinery — boilerplate buckets
    // shrink to size ~1, and the residual cap bites only buckets of
    // DISTINCT near-dup signatures. Connectivity through the reps is what
    // downstream components need; the exact (uncapped) route is untouched.
    val (lshSrc, groupCand) =
      if (effMax == Int.MaxValue) (banded, None)
      else {
        val keyed = banded.withColumn("__sk", xxhash64(col("bk")))
        val repOf = keyed.groupBy("__sk").agg(min(col("id")).as("__rep"))
        // materialized once: both the star pairs and the rep frame read it
        // (without the checkpoint the groupBy+join pass runs twice)
        val withRep = keyed.join(repOf, Seq("__sk")).localCheckpoint(true)
        val stars = withRep.where(col("id") =!= col("__rep"))
          .select(col("__rep").as("id_a"), col("id").as("id_b"))
        val reps = withRep.where(col("id") === col("__rep"))
          .select(col("id"), col("bk"))
        (reps, Some(stars))
      }
    val exploded = lshSrc.select(col("id"), col("bk"),
      posexplode(col("bk")).as(Seq("band", "bkey")))

    // Capped routes measure the REP-LEVEL bucket histogram: pre-collapse
    // usually shrinks the degenerate buckets under the cap, and when
    // NOTHING needs dropping the rep-level LSH is COMPLETE — both
    // enumeration strategies below are sound. ONE aggregate over the
    // exploded band keys yields all three routing numbers: the hottest
    // bucket (residual-drop decision), the total candidate VOLUME
    // Σ n(n−1)/2, and the volume surviving a distinct-member-set collapse
    // (order-free per-bucket fingerprint: bit_xor of member-id hashes +
    // size — two buckets holding the same member set share it, so the
    // fp-level rollup prices exactly what the __mh bucket-dedup below
    // would remove). Volumes sum in DOUBLE (routing needs magnitude, and
    // a degenerate corpus can push the exact sum past a long).
    val (residualDrop, memberExchange) =
      if (effMax == Int.MaxValue) (false, false)
      else {
        val hist = exploded.groupBy("band", "bkey")
          .agg(count(lit(1)).as("n"), bit_xor(xxhash64(col("id"))).as("fp"))
          .where(col("n") > 1L)
        val vol = (col("n").cast(DoubleType) * (col("n").cast(DoubleType) - 1.0)) / 2.0
        val r = hist.groupBy("fp", "n").agg(count(lit(1)).as("reps"))
          .agg(max(col("n")), sum(vol * col("reps").cast(DoubleType)), sum(vol))
          .collect()(0)
        val hottest = if (r.isNullAt(0)) 0L else r.getLong(0)
        val cVol = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
        val dVol = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
        if (hottest > dropAt) (true, false)
        else {
          val exch = memberSetExchange.getOrElse(
            cVol > firstBandVolumeCap.toDouble && dVol * 2.0 <= cVol)
          if (exch) {
            val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")
            log.info(f"minhashLshPairs: rep-level candidate volume $cVol%.3g " +
              f"(> cap $firstBandVolumeCap), distinct-member-set volume $dVol%.3g " +
              "— taking the member-set bucket-dedup + pair-exchange route")
          }
          (false, exch)
        }
      }

    // Bucket materialization: ONE skinny shuffle of (band, bkey, id, bk)
    // rows — ~bands rows per doc, ~140 bytes each — into per-bucket member
    // lists. When residual hot buckets remain, they are dropped BEFORE the
    // member-list aggregate (broadcast anti-join on the few hot keys), so
    // the degenerate collect_list row is never built at all.
    val buckets = {
      val src =
        if (!residualDrop) exploded
        else {
          val hot = exploded.groupBy("band", "bkey").agg(count(lit(1)).as("n"))
            .where(col("n") > dropAt).select("band", "bkey")
          exploded.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
        }
      val grouped = src.groupBy("band", "bkey")
        .agg(collect_list(struct(col("id"), col("bk"))).as("ms"))
        .where(size(col("ms")) > 1)
      // pair-exchange routes only (residual-drop, or measured member-set
      // exchange): a degenerate corpus collides the SAME member set in
      // every band — identical sets yield identical pairs, so enumerate
      // each distinct set once (one member-id hash + dropDuplicates over
      // bucket-count rows) instead of bands× the pairs into the
      // pair-level dedup exchange. The first-band routes dedup
      // row-locally without this.
      if (!residualDrop && !memberExchange) grouped
      else grouped
        .withColumn("__mh", xxhash64(concat_ws(",",
          array_sort(transform(col("ms"), m => m.getField("id").cast("string"))))))
        .dropDuplicates("__mh")
        .drop("__mh")
    }
    // Pair generation by double posexplode within each bucket (j > i), with
    // FIRST-MATCHING-BAND dedup, row-local: a pair colliding in b bands would
    // be emitted b times across bands; instead it is emitted only from the
    // first band where its keys match (no earlier-band match, checked by the
    // allocation-free codegen'd BandPrefixMatchExpr). No join machinery, no
    // dropDuplicates shuffle over the ~bands×-duplicated candidate stream —
    // measured 4× faster than the bucket self-join + dropDuplicates shape.
    //
    // First-matching-band dedup is only sound when NO bucket was dropped:
    // a pair whose earliest matching band fell in a dropped bucket would be
    // suppressed in every kept band (the bk arrays still match at the
    // dropped band's index) and never emitted at all. It therefore applies
    // on the exact route AND on the low-volume collapsed-complete route
    // (capped, every rep-level bucket fit the cap, measured candidate
    // volume under the first-band cap); residual-drop runs AND measured
    // high-volume collapsible runs take the member-set-dedup + pair-level
    // dropDuplicates exchange instead.
    val pairsRaw = buckets
      .select(col("band"), col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("band"), col("a"), col("i"), posexplode(col("ms")).as(Seq("j", "b")))
      .where(col("j") > col("i"))
    def firstBand(p: DataFrame): DataFrame = p
      .where(!graft.functions.BandPrefixMatch.matchesBefore(col("a.bk"), col("b.bk"), col("band")))
      .select(least(col("a.id"), col("b.id")).as("id_a"), greatest(col("a.id"), col("b.id")).as("id_b"))
    val cand =
      if (effMax == Int.MaxValue) firstBand(pairsRaw)
      else if (!residualDrop && !memberExchange)
        // rep-rep pairs (both endpoints reps) and rep-member stars are
        // disjoint by construction — no pair-level dedup needed
        firstBand(pairsRaw).unionAll(groupCand.get)
      else
        // residual-drop (first-band unsound: a dropped earliest band
        // suppresses pairs) or measured member-set exchange (no drops —
        // COMPLETE — but each surviving pair enumerates once per distinct
        // member set instead of once per band): distinct-set buckets +
        // pair-level dedup emit the same pair set as first-band would
        pairsRaw
          .select(least(col("a.id"), col("b.id")).as("id_a"), greatest(col("a.id"), col("b.id")).as("id_b"))
          .unionAll(groupCand.get)
          .dropDuplicates("id_a", "id_b")

    // exact-Jaccard verification on SORTED DISTINCT SHINGLE-HASH sets (the
    // same set definition the signatures are built from — shingleLen=1 is
    // the token set, >1 the order-sensitive n-gram set): attach each side's
    // precomputed hash set (narrow id-keyed joins), merge-walk row-locally
    // over primitive longs (JaccardSimExpr long form).
    val toks = hashed.select(col("id"),
      array_sort(array_distinct(col("h"))).as("toks"))
    // hash sets are small next to the candidate-pair set — broadcasting them
    // keeps the 10^6-10^7 candidate rows from being sort-merge shuffled. But
    // "small" must be MEASURED, not assumed: at corpus scale the token sets
    // are data-sized and an unconditional broadcast OOMs. Route on Catalyst's
    // free size estimate of the source projection (same measure-then-route
    // discipline as jaccardPairsAuto).
    val doBroadcast = broadcastVerify.getOrElse {
      val est = df.select(col(idCol), col(textCol))
        .queryExecution.optimizedPlan.stats.sizeInBytes
      est <= verifyBroadcastMaxBytes
    }
    def side(a: String, t: String) = {
      val s = toks.select(col("id").as(a), col("toks").as(t))
      if (doBroadcast) broadcast(s) else s
    }
    cand
      .join(side("id_a", "toks_a"), Seq("id_a"))
      .join(side("id_b", "toks_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.JaccardSim.jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Benchmark-contamination scores (the GPT-3/PaLM-style n-gram overlap
    * audit): for each EVAL document, the fraction of its distinct n-gram
    * shingle hashes that appear ANYWHERE in the train corpus — the
    * "did the eval set leak into training" number a model report has to
    * state. Distinct from [[splitLeakage]] (near-dup PAIRS straddling
    * splits): contamination is per-eval-doc partial overlap at the n-gram
    * grain, catching quotes and paraphrased fragments pair-level Jaccard
    * misses.
    *
    * Scale shape: the train side reduces ONCE to its distinct shingle-hash
    * set (skinny 8-byte rows — the only corpus-sized shuffle); eval docs
    * explode their distinct shingles and left-join it (AQE handles the
    * asymmetry); one per-doc aggregate after. Bodies never shuffle.
    *
    * @return per eval doc: (id, n_shingles, hits, contamination).
    */
  def contaminationScores(train: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, shingleLen: Int = 3,
                          tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    def hset(df: DataFrame) = df.select(col(idCol).as("id"),
      array_distinct(transform(
        Shingles.shingleStrings(TextAnalysis.tokens(col(textCol)), shingleLen),
        tokenHasher)).as("hs"))
    val trainH = hset(train).select(explode(col("hs")).as("h")).distinct()
    // Keep shingle-less eval docs (text shorter than shingleLen tokens):
    // explode would drop their rows, and an audit consumer would misread
    // absence as "clean" rather than "unmeasurable" — they come back via a
    // left join on the per-doc id set with n_shingles = 0, contamination null.
    val evH = hset(eval).localCheckpoint(true)
    val ev = evH.select(col("id"), explode(col("hs")).as("h"))
    val scored = ev.join(trainH.withColumn("__hit", lit(1L)), Seq("h"), "left")
      .groupBy("id").agg(coalesce(sum(col("__hit")), lit(0L)).as("hits"))
    evH.select(col("id"), size(col("hs")).cast(LongType).as("n_shingles"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(col("n_shingles") > 0L,
          coalesce(col("hits"), lit(0L)).cast(DoubleType) /
            col("n_shingles").cast(DoubleType)).as("contamination"))
  }

  /** Split-leakage audit — the eval-contamination check a training pipeline
    * runs AFTER splitting: near-duplicate pairs that straddle two different
    * splits (a test doc with a train near-dup inflates eval). Composes
    * [[minhashLshPairs]] with [[Sampling.splitExpr]]. Held-out rows (NULL
    * split) are not leakage and are excluded.
    *
    * The split label is evaluated ONCE PER DOCUMENT on a skinny (id, split)
    * frame and attached to the pairs with two id-keyed joins (AQE
    * broadcasts it while it fits). The tempting row-local alternative —
    * `splitExpr(id_a)` directly on the pair frame — is a measured 12×
    * regression: Catalyst pushes the filter (correctly) below the
    * verification joins, where the hash-based label expression re-runs per
    * CANDIDATE pair — tens of millions of md5 calls instead of one per
    * corpus row (7 s → 87 s at sf0.1). Pure-function labels belong on the
    * frame with the fewest rows, not the earliest usable projection.
    *
    * Output: (id_a, id_b, jaccard, split_a, split_b), split_a != split_b.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   splits: Seq[(String, Double)], threshold: Double,
                   numHashes: Int = 64, bands: Int = 16, shingleLen: Int = 3,
                   salt: String = "|split", buckets: Int = 10000,
                   tokenHasher: Column => Column = xxhash64(_),
                   splitHasher: Column => Column = xxhash64(_),
                   maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val labels = df.select(col(idCol).as("__sid"),
        Sampling.splitExpr(col(idCol), splits, salt, buckets, splitHasher).as("__ssplit"))
      .where(col("__ssplit").isNotNull)
    // measured-size broadcast routing (the minhashLshPairs verify-join
    // discipline): the label frame is (id, short string) — broadcast it
    // while the id projection's Catalyst estimate fits, else let the pairs
    // shuffle-join it
    val doBroadcast = df.select(col(idCol)).queryExecution
      .optimizedPlan.stats.sizeInBytes <= DefaultVerifyBroadcastMaxBytes
    def side(idAs: String, splitAs: String) = {
      val s = labels.select(col("__sid").as(idAs), col("__ssplit").as(splitAs))
      if (doBroadcast) broadcast(s) else s
    }
    minhashLshPairs(df, idCol, textCol, threshold, numHashes, bands, shingleLen,
      tokenHasher = tokenHasher, maxShingleDf = maxShingleDf)
      .join(side("id_a", "split_a"), Seq("id_a"))
      .join(side("id_b", "split_b"), Seq("id_b"))
      .where(col("split_a") =!= col("split_b"))
  }

  /** Strategy-ROUTING Jaccard near-dup: measures the largest block first
    * (one cheap count aggregate) and only then picks the all-pairs strategy
    * — which is O(maxBlock²) and a silent scale-killer on low-cardinality
    * block keys — falling back to MinHash-LSH + exact-Jaccard verification
    * (recall-bounded but shuffle-skinny at any corpus size) otherwise.
    * This is the guard that keeps `jaccardPairsAllPairs` from being invoked
    * blind on a 2-value block key at 100 TB.
    *
    * Output on either route: (id_a, id_b, jaccard) with jaccard >= threshold
    * over the same shingle-hash set definition. The LSH route can miss pairs
    * whose signatures never collide in a band (tune numHashes/bands); the
    * all-pairs route is exact.
    */
  def jaccardPairsAuto(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double, blockCols: Seq[String] = Nil,
                       shingleLen: Int = 1, maxBlockForAllPairs: Long = 5000,
                       numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val maxBlock =
      if (blockCols.isEmpty) Long.MaxValue
      else {
        val r = df.groupBy(blockCols.map(col): _*).agg(count(lit(1)).as("n"))
          .agg(max("n")).collect()(0)
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    if (blockCols.nonEmpty && maxBlock <= maxBlockForAllPairs)
      jaccardPairsAllPairs(df, idCol, textCol, threshold, blockCols,
        shingleLen = shingleLen)
        .select("id_a", "id_b", "jaccard")
    else
      minhashLshPairs(df, idCol, textCol, threshold, numHashes, bands, shingleLen)
        .select("id_a", "id_b", "jaccard")
  }

  /** Analytic LSH S-curve: P(candidate | jaccard = s) = 1 − (1 − s^r)^b
    * for b bands of r rows. The design curve behind [[minhashLshPairs]]'s
    * (bands, rowsPerBand) choice.
    */
  def lshCollisionProb(s: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

  /** LSH parameter planner: every (bands, rows) split of the `numHashes`
    * budget with its S-curve midpoint s50 (the jaccard where collision
    * probability crosses 0.5) and the collision probability at `threshold`,
    * ordered by |s50 − threshold| — the first entry is the split whose
    * steep region straddles the target threshold. Driver-side pure math;
    * pair with [[lshTuningAudit]] to check the chosen split EMPIRICALLY.
    */
  def lshPlan(numHashes: Int, threshold: Double): Seq[(Int, Int, Double, Double)] = {
    require(numHashes >= 1 && threshold > 0 && threshold < 1, "bad parameters")
    (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      val s50 = math.pow(1.0 - math.pow(0.5, 1.0 / b), 1.0 / r)
      (b, r, s50, lshCollisionProb(threshold, b, r))
    }.sortBy { case (_, _, s50, _) => math.abs(s50 - threshold) }
  }

  /** Measure, don't guess — for the approximate operator itself: empirical
    * recall/precision of the MinHash-LSH CANDIDATE set against exact
    * jaccard ground truth on a deterministic bounded sample. `sampleSize`
    * docs are chosen by lowest (hash-bucket, id) — stable across runs,
    * engines and layouts, and it CAPS the all-pairs ground-truth cost at
    * sampleSize² regardless of corpus size (the knob IS the audit budget).
    * Within the sample: every pair gets its exact shingle-hash-set jaccard
    * (truth: j ≥ threshold) and its any-band signature collision flag
    * (candidate); one row comes back —
    * (sample_docs, true_pairs, cand_pairs, hit_pairs, recall, precision,
    * p_at_threshold) where p_at_threshold is the analytic
    * [[lshCollisionProb]] the empirical recall should track. Recall here is
    * per-PAIR candidate recall — the quantity the S-curve predicts.
    */
  def lshTuningAudit(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, numHashes: Int = 64, bands: Int = 16,
                     shingleLen: Int = 1, sampleSize: Int = 500,
                     tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val bucket = pmod(tokenHasher(concat(col(idCol).cast("string"), lit("|lshaudit"))), lit(10000L))
    val sample = df
      .select(col(idCol).as("id"), col(textCol).as("text"), bucket.as("bk"))
      .orderBy(col("bk"), col("id")).limit(sampleSize)
      .select(col("id"),
        transform(Shingles.shingleStrings(TextAnalysis.tokens(col("text")), shingleLen),
          tokenHasher).as("h"))
      .repartition(col("id")) // materialization barrier (sig inlining)
    val docs = sample.select(col("id"),
      array_sort(array_distinct(col("h"))).as("toks"),
      minhashSignatureFromHashes(col("h"), numHashes).as("sig"))
    val nDocs = docs.count()
    val a = docs.select(col("id").as("id_a"), col("toks").as("toks_a"), col("sig").as("sig_a"))
    val b = docs.select(col("id").as("id_b"), col("toks").as("toks_b"), col("sig").as("sig_b"))
    val bandMatch = (0 until bands).map { bi =>
      slice(col("sig_a"), bi * rowsPerBand + 1, rowsPerBand) ===
        slice(col("sig_b"), bi * rowsPerBand + 1, rowsPerBand)
    }.reduce(_ || _)
    val jac = graft.functions.JaccardSim.jaccard(col("toks_a"), col("toks_b"))
    val m = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(jac.as("j"), bandMatch.as("cand"))
      .agg(
        sum(when(col("j") >= threshold, 1L).otherwise(0L)).cast(LongType).as("true_pairs"),
        sum(when(col("cand"), 1L).otherwise(0L)).cast(LongType).as("cand_pairs"),
        sum(when(col("cand") && col("j") >= threshold, 1L).otherwise(0L))
          .cast(LongType).as("hit_pairs"))
    m.select(
      lit(nDocs).as("sample_docs"),
      col("true_pairs"), col("cand_pairs"), col("hit_pairs"),
      when(col("true_pairs") > 0L,
        col("hit_pairs").cast(DoubleType) / col("true_pairs").cast(DoubleType)).as("recall"),
      when(col("cand_pairs") > 0L,
        col("hit_pairs").cast(DoubleType) / col("cand_pairs").cast(DoubleType)).as("precision"),
      lit(lshCollisionProb(threshold, bands, rowsPerBand)).as("p_at_threshold"))
  }

  /** End-to-end near-dedup: MinHash-LSH pairs → connected components → keep
    * the smallest-id representative of every near-dup cluster. This is the
    * user-facing "dedupe my corpus" call.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, numHashes: Int = 64, bands: Int = 16,
                         shingleLen: Int = 3, maxBucket: Int = AutoMaxBucket): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, threshold, numHashes, bands,
      shingleLen, maxBucket = maxBucket)
    val cc = Components.connectedComponents(df.select(col(idCol)), idCol, pairs, "id_a", "id_b")
    val keep = cc.where(col("id") === col("component")).select(col("id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** One-row corpus DUPLICATION diagnostic — the "how duplicated is this
    * crawl" report every dedup decision starts from: document count,
    * distinct-text count, duplicate rate, singleton share and the largest
    * cluster's size. Exact, from ONE hash-groupBy over text hashes (the
    * [[exactGroups]] shuffle) + one bounded re-aggregate over the
    * (cluster size) frame — cluster COUNT rows, never documents, reach
    * the second stage. [[dedupSizeHistogram]] is the per-bucket companion.
    */
  def dedupReport(df: DataFrame, idCol: String, textCol: String,
                  hasher: Column => Column = xxhash64(_)): DataFrame = {
    val sizes = df.select(hasher(col(textCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
    sizes
      .agg(
        sum(col("n")).cast(LongType).as("n_docs"),
        count(lit(1)).cast(LongType).as("n_distinct"),
        max(col("n")).cast(LongType).as("max_cluster"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).cast(LongType).as("n_singletons"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_distinct")).cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("singleton_share",
        col("n_singletons").cast(DoubleType) / col("n_distinct").cast(DoubleType))
  }

  /** [[dedupReport]] PER KEY — "which sources/domains are the most
    * duplicated": one row per `keyCol` value with the same duplication
    * stats, duplication counted WITHIN the key (a text shared by two
    * domains is each domain's own cluster). Same two-stage shape: one
    * (key, hash) groupBy + a key-keyed re-aggregate over cluster counts.
    */
  def dedupReportByKey(df: DataFrame, keyCol: String, idCol: String,
                       textCol: String,
                       hasher: Column => Column = xxhash64(_)): DataFrame =
    df.select(col(keyCol).as("key"), hasher(col(textCol)).as("h"))
      .groupBy("key", "h").agg(count(lit(1)).as("n"))
      .groupBy("key")
      .agg(
        sum(col("n")).cast(LongType).as("n_docs"),
        count(lit(1)).cast(LongType).as("n_distinct"),
        max(col("n")).cast(LongType).as("max_cluster"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).cast(LongType).as("n_singletons"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_distinct")).cast(DoubleType) / col("n_docs").cast(DoubleType))

  /** Cluster-size histogram companion to [[dedupReport]]: one row per log2
    * size bucket — (bucket, cluster_count, doc_count). Exact; bucket count
    * is ≤ 64 by construction. The bucket is `length(bin(n)) - 1` — the
    * INTEGER floor(log2): a float log2 would flap on exact powers of two
    * (Java computes log(n)/log(2), e.g. log2(8) = 2.999…96).
    */
  def dedupSizeHistogram(df: DataFrame, idCol: String, textCol: String,
                         hasher: Column => Column = xxhash64(_)): DataFrame =
    df.select(hasher(col(textCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
      .groupBy((length(bin(col("n"))) - 1).cast("int").as("bucket"))
      .agg(count(lit(1)).cast(LongType).as("n_clusters"),
        sum(col("n")).cast(LongType).as("n_docs"))

  /** Per-doc MinHash signature frame — the PERSISTABLE dedup artifact.
    * Write it per ingested batch (`.write.parquet(store)`): later batches
    * dedup against the accumulated store via [[dedupAgainstStore]] WITHOUT
    * the old bodies — at 100 TB the store is ~0.1% of the corpus (64 longs
    * per doc) and the old text is never re-read, re-shingled, or shuffled.
    * Same expression pipeline (and the same materialization barrier) as
    * [[minhashLshPairs]]'s internal signatures, so estimates are consistent
    * with in-batch LSH.
    */
  /** `pruneSet`: a PINNED high-DF shingle-hash frame (from
    * [[trainShingleDfPruneSet]] / [[loadPruneSet]]) dropped from every doc
    * before the signature. Incremental dedup compares SIGNATURES across
    * runs, so pruning must use the SAME set on both sides — re-measuring DF
    * on each month's batch would shift the shingle universe and silently
    * break [[dedupAgainstStore]]'s estimate. Fit once, persist, load
    * per run (the quantizer / bigram-LM / PSI-reference artifact
    * discipline applied to the prune rule).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, shingleLen: Int = 3,
                        tokenHasher: Column => Column = xxhash64(_),
                        pruneSet: Option[DataFrame] = None): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      transform(Shingles.shingleStrings(TextAnalysis.tokens(col(textCol)), shingleLen),
        tokenHasher).as("h"))
    val pruned = pruneSet match {
      case None => hashed
      case Some(set) =>
        val hot = set.select(col("sh")).limit(DefaultDfPruneBroadcastMax + 1)
          .collect().map(_.getLong(0))
        require(hot.length <= DefaultDfPruneBroadcastMax,
          s"pruneSet exceeds $DefaultDfPruneBroadcastMax entries — " +
            "train with a higher maxDf (a prune set IS a heavy-hitter set)")
        hashed.select(col("id"),
            graft.functions.LongSetFilter.exceptSet(col("h"), hot.toSeq).as("h"))
          .where(size(col("h")) > 0)
    }
    pruned
      .repartition(col("id"))
      .select(col("id"), minhashSignatureFromHashes(col("h"), numHashes).as("sig"))
  }

  /** Fit the high-DF (boilerplate) shingle prune set ONCE as a persistable
    * 1-column frame `(sh)` — every shingle hash appearing in more than
    * `maxDf` distinct docs of the FIT corpus. Pair with
    * [[minhashSignatures]]`(pruneSet = …)` so incremental runs sign new
    * batches against the store under one pinned universe.
    */
  def trainShingleDfPruneSet(df: DataFrame, idCol: String, textCol: String,
                             maxDf: Int, shingleLen: Int = 3,
                             tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    df.select(col(idCol).as("id"),
        explode(array_distinct(transform(
          Shingles.shingleStrings(TextAnalysis.tokens(col(textCol)), shingleLen),
          tokenHasher))).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("sh")
  }

  def savePruneSet(set: DataFrame, path: String): Unit =
    set.select(col("sh")).coalesce(1).write.mode("overwrite").parquet(path)

  def loadPruneSet(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("sh"))

  /** Cross-run incremental dedup: candidate (new, store) pairs by banded
    * LSH between two signature frames, similarity = the SIGNATURE ESTIMATE
    * (fraction of agreeing minhash components — the standard unbiased
    * Jaccard estimator), so the store's document bodies are never needed.
    * Both frames must come from [[minhashSignatures]] with the same
    * numHashes/shingleLen/hasher.
    *
    * Scale shape: band keys explode to `bands` skinny rows per doc; the
    * equi-join on (band, bkey) is the only wide operation; a pair matching
    * in several bands is emitted once via the row-local first-matching-band
    * filter (BandPrefixMatchExpr — no dropDuplicates shuffle); signatures
    * are attached to the surviving candidates by narrow id-keyed joins.
    *
    * @return (new_id, store_id, est) with est >= threshold.
    */
  def dedupAgainstStore(newSigs: DataFrame, storeSigs: DataFrame,
                        threshold: Double, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    def banded(sigs: DataFrame, idOut: String) = {
      val bk = sigs.select(col("id").as(idOut),
        array((0 until bands).map(b =>
          xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))): _*).as(s"bk_$idOut"))
      bk.select(col(idOut), col(s"bk_$idOut"),
        posexplode(col(s"bk_$idOut")).as(Seq("band", "bkey")))
    }
    val cand = banded(newSigs, "new_id")
      .join(banded(storeSigs, "store_id").withColumnRenamed("band", "band_s")
          .withColumnRenamed("bkey", "bkey_s"),
        col("band") === col("band_s") && col("bkey") === col("bkey_s"))
      .where(!graft.functions.BandPrefixMatch.matchesBefore(
        col("bk_new_id"), col("bk_store_id"), col("band")))
      .select("new_id", "store_id")
    cand
      .join(newSigs.select(col("id").as("new_id"), col("sig").as("sig_a")), Seq("new_id"))
      .join(storeSigs.select(col("id").as("store_id"), col("sig").as("sig_b")), Seq("store_id"))
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast(DoubleType) / numHashes.toDouble)
      .where(col("est") >= threshold)
      .select("new_id", "store_id", "est")
  }

  /** Canonical-document selection per near-duplicate cluster: keep the row
    * with the BEST `quality` score in each connected component of `pairs`
    * (ties broken by smallest id); docs in no pair keep themselves. The
    * quality-aware upgrade of [[dropNearDuplicates]] (which keeps the
    * min-id doc) — a RefinedWeb-style pipeline keeps the longest / highest-
    * scoring representative, not an arbitrary one.
    *
    * Scale shape: components run over (id, id) edges only; the argmax is a
    * component-keyed `max(struct(quality, -id))` — one skinny shuffle of
    * (id, component, quality); bodies move only in the final semi-join.
    */
  def keepBestPerComponent(df: DataFrame, idCol: String, pairs: DataFrame,
                           quality: Column): DataFrame = {
    val cc = Components.connectedComponents(df.select(col(idCol)), idCol,
      pairs, "id_a", "id_b")
    val q = df.select(col(idCol).as("id"), quality.as("__q"))
    val keep = cc.join(q, Seq("id"))
      .groupBy("component")
      .agg(max(struct(col("__q").as("q"), (-col("id")).as("nid"))).as("m"))
      .select((-col("m.nid")).as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** `bits`-wide SimHash from a MATERIALIZED token-hash array column: per bit
    * b, the bit is set iff more than half the tokens have it set
    * (sum of ±1 > 0  ⟺  2*popcount_b > n). One fused codegen'd pass over
    * the hash array ([[graft.functions.SimHashExpr]]).
    */
  def simhashBits(hashes: Column, bits: Int): Column =
    graft.functions.SimHash.simhash(hashes, bits)

  /** Builtin-HOF formulation with identical semantics (`bits` separate
    * filter-count folds) — kept for cross-checking the native expression.
    */
  def simhashBitsHof(hashes: Column, bits: Int): Column = {
    val n = size(hashes)
    (0 until bits).map { b =>
      val setCnt = size(filter(hashes, h => shiftright(h, b).bitwiseAND(lit(1L)) === 1L))
      when(setCnt * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** 64-bit SimHash (the xxhash64 fast path's width). */
  def simhashFromHashes(hashes: Column): Column = simhashBits(hashes, 64)

  /** SimHash of raw text (convenience; hot paths should materialize the hash
    * array first — see [[simhashPairs]]).
    */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  /** SimHash near-dup pairs: candidates share one of `nChunks` bit chunks
    * (pigeonhole: guarantees full recall for hamming distance < nChunks),
    * verified by exact hamming distance via bit_count(xor).
    * `tokenHasher`/`bits`: xxhash64/64 is the fast default;
    * [[Shingles.md5Hash60]]/60 is the oracle-checkable variant.
    *
    * Same shape as [[minhashLshPairs]]: one skinny (chunk, ckey, id, sig, ck)
    * shuffle into per-bucket member lists, in-bucket double-posexplode pair
    * generation with row-local FIRST-MATCHING-CHUNK dedup — no bucket
    * self-join, no dropDuplicates exchange. `maxBucket` drops chunk buckets
    * larger than this (near-identical corpora make one chunk value quadratic);
    * capped runs fall back to pair-level dropDuplicates because first-match
    * dedup would suppress pairs whose earliest chunk was capped.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
                   tokenHasher: Column => Column = xxhash64(_), bits: Int = 64,
                   nChunks: Int = 4, maxBucket: Int = AutoMaxBucket): DataFrame = {
    // materialize token hashes before the per-bit folds (see minhashLshPairs)
    val sigs = df.select(col(idCol).as("id"),
        transform(TextAnalysis.tokens(col(textCol)), tokenHasher).as("h"))
      .repartition(col("id"))
      .select(col("id"), simhashBits(col("h"), bits).as("sig"))
    hammingPairs(sigs, "id", "sig", maxHamming, bits, nChunks, maxBucket)
  }

  /** Hamming near-dup pairs over PRE-COMPUTED `bits`-bit signatures — the
    * bucket-generate machinery of [[simhashPairs]] factored out so ANY
    * signature source plugs in (image dHashes, audio fingerprints, custom
    * sketches). Pigeonhole completeness: hamming ≤ maxHamming < nChunks ⇒
    * at least one chunk is untouched ⇒ the pair collides in that chunk's
    * bucket. Shuffle rows carry (chunk key, id, sig) only; first-matching-
    * chunk dedup is row-local ([[graft.functions.BandPrefixMatchExpr]]).
    *
    * `maxBucket` defaults to [[AutoMaxBucket]] — the same measure-then-route
    * guard as [[minhashLshPairs]]: a corpus of near-identical signatures
    * (boilerplate pages, re-encoded media) collides whole clusters into one
    * chunk bucket, which is O(B²) pair generation under exact semantics.
    * The auto route measures the hottest bucket (one aggregate, 1-row max
    * back) and, past [[DefaultHotBucketCap]], drops hot buckets BEFORE the
    * member-list aggregate (broadcast anti-join) with the sound pair-level
    * dedup fallback. `Int.MaxValue` forces exact single-pass semantics.
    */
  def hammingPairs(sigFrame: DataFrame, idCol: String, sigCol: String,
                   maxHamming: Int = 3, bits: Int = 64, nChunks: Int = 4,
                   maxBucket: Int = AutoMaxBucket): DataFrame = {
    require(bits % nChunks == 0, "bits must be divisible by nChunks")
    require(maxHamming < nChunks, s"chunk recall guarantee needs maxHamming < nChunks")
    require(maxBucket == AutoMaxBucket || maxBucket > 0,
      s"maxBucket must be positive or AutoMaxBucket ($AutoMaxBucket)")
    val width = bits / nChunks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val sigs = sigFrame.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val withCkRaw = sigs.select(col("id"), col("sig"),
      array((0 until nChunks).map(i =>
        shiftright(col("sig"), i * width).bitwiseAND(lit(mask))): _*).as("ck"))
    // route resolution (the minhashLshPairs discipline): forced-exact keeps
    // the single-pass pipeline; auto/forced-cap materialize the skinny
    // (id, sig, ck) frame once so the measurement and the bucket build
    // share it
    val (withCk, effMax) =
      if (maxBucket == Int.MaxValue) (withCkRaw, Int.MaxValue)
      else {
        val ck = withCkRaw.localCheckpoint(true)
        if (maxBucket > 0) (ck, maxBucket)
        else {
          val r = ck.select(posexplode(col("ck")).as(Seq("chunk", "ckey")))
            .groupBy("chunk", "ckey").agg(count(lit(1)).as("n"))
            .agg(max(col("n"))).collect()(0)
          val hottest = if (r.isNullAt(0)) 0L else r.getLong(0)
          if (hottest <= DefaultHotBucketCap) (ck, Int.MaxValue)
          else {
            val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")
            log.info(s"hammingPairs: hottest chunk bucket has $hottest members " +
              s"(> $DefaultHotBucketCap cap) — dropping hot buckets and taking " +
              "the pair-level-dedup route")
            (ck, DefaultHotBucketCap)
          }
        }
      }
    // capped routes PRE-COLLAPSE identical signatures (the minhashLshPairs
    // discipline): each exact-dup group emits its linear (rep, member,
    // hamming=0) star and only the min-id representatives enter the bucket
    // machinery — the degenerate bucket shrinks to ~1 member and the
    // residual cap bites only buckets of DISTINCT near-dup signatures; the
    // capped pair set is a connectivity-preserving subset of exact
    val (lshSrc, groupCand) =
      if (effMax == Int.MaxValue) (withCk, None)
      else {
        val repOf = withCk.groupBy("sig").agg(min(col("id")).as("__rep"))
        val withRep = withCk.join(repOf, Seq("sig")).localCheckpoint(true)
        val stars = withRep.where(col("id") =!= col("__rep"))
          .select(col("__rep").as("id_a"), col("id").as("id_b"),
            lit(0).cast("int").as("hamming"))
        (withRep.where(col("id") === col("__rep"))
          .select(col("id"), col("sig"), col("ck")), Some(stars))
      }
    val exploded = lshSrc.select(col("id"), col("sig"), col("ck"),
      posexplode(col("ck")).as(Seq("chunk", "ckey")))
    // collapsed-complete vs residual-drop (the minhashLshPairs tree): when
    // every rep-level chunk bucket fits the cap, nothing is dropped and the
    // row-local first-matching-chunk dedup stays sound — no pair exchange
    val residualDrop: Boolean =
      effMax != Int.MaxValue && {
        val r = exploded.groupBy("chunk", "ckey").agg(count(lit(1)).as("n"))
          .agg(max(col("n"))).collect()(0)
        !r.isNullAt(0) && r.getLong(0) > effMax
      }
    val buckets = {
      val src =
        if (!residualDrop) exploded
        else {
          val hot = exploded.groupBy("chunk", "ckey").agg(count(lit(1)).as("n"))
            .where(col("n") > effMax).select("chunk", "ckey")
          exploded.join(broadcast(hot), Seq("chunk", "ckey"), "left_anti")
        }
      val grouped = src.groupBy("chunk", "ckey")
        .agg(collect_list(struct(col("id"), col("sig"), col("ck"))).as("ms"))
        .where(size(col("ms")) > 1)
      // residual-drop route: enumerate each distinct member set once (see
      // minhashLshPairs — identical sets across chunks yield identical pairs)
      if (!residualDrop) grouped
      else grouped
        .withColumn("__mh", xxhash64(concat_ws(",",
          array_sort(transform(col("ms"), m => m.getField("id").cast("string"))))))
        .dropDuplicates("__mh")
        .drop("__mh")
    }
    val pairsRaw = buckets
      .select(col("chunk"), col("ms"), posexplode(col("ms")).as(Seq("i", "a")))
      .select(col("chunk"), col("a"), col("i"), posexplode(col("ms")).as(Seq("j", "b")))
      .where(col("j") > col("i"))
    val firstMatch =
      if (!residualDrop)
        pairsRaw.where(!graft.functions.BandPrefixMatch.matchesBefore(col("a.ck"), col("b.ck"), col("chunk")))
      else pairsRaw
    val pairs = firstMatch
      .select(least(col("a.id"), col("b.id")).as("id_a"), greatest(col("a.id"), col("b.id")).as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
    if (effMax == Int.MaxValue) pairs
    else if (!residualDrop) pairs.unionAll(groupCand.get)
    else pairs.unionAll(groupCand.get).dropDuplicates("id_a", "id_b", "hamming")
  }

  /** BIPARTITE Hamming join: for every (left, right) pair within
    * `maxHamming` over `bits`-bit signatures — the two-frame companion of
    * [[hammingPairs]] (query-vs-corpus retrieval, probe-augmented audio
    * alignment). Same pigeonhole chunk completeness; pair dedup via
    * dropDuplicates on the id pair (a probe side may collide in several
    * chunks). Shuffle rows carry (chunk, ckey, id, sig) only.
    */
  def hammingJoin(left: DataFrame, leftId: String, leftSig: String,
                  right: DataFrame, rightId: String, rightSig: String,
                  maxHamming: Int = 3, bits: Int = 64,
                  nChunks: Int = 4): DataFrame = {
    require(bits % nChunks == 0, "bits must be divisible by nChunks")
    require(maxHamming < nChunks, s"chunk recall guarantee needs maxHamming < nChunks")
    val width = bits / nChunks
    val mask = if (width == 64) -1L else (1L << width) - 1L
    def chunked(d: DataFrame, idC: String, sigC: String, idAs: String, sigAs: String) =
      d.select(col(idC).as(idAs), col(sigC).as(sigAs),
          array((0 until nChunks).map(i =>
            shiftright(col(sigC), i * width).bitwiseAND(lit(mask))): _*).as("__ck"))
        .select(col(idAs), col(sigAs), posexplode(col("__ck")).as(Seq("chunk", "ckey")))
    // dedup on the SIGNATURE pair, not the id pair: an id may carry several
    // signatures (probe variants), and each variant's distance must survive
    // to the caller's min-aggregate — only same-pair multi-chunk collisions
    // are redundant
    chunked(left, leftId, leftSig, "id_l", "sig_l")
      .join(chunked(right, rightId, rightSig, "id_r", "sig_r"), Seq("chunk", "ckey"))
      .select(col("id_l"), col("id_r"), col("sig_l"), col("sig_r"),
        bit_count(col("sig_l").bitwiseXOR(col("sig_r"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_l", "id_r", "sig_l", "sig_r")
      .select("id_l", "id_r", "hamming")
  }

  /** Cross-document PASSAGE-level dedup (the RefinedWeb / Lee et al. 2022
    * "deduplicating training data" shape at passage granularity): split each
    * document into consecutive `passageTokens`-token passages, drop every
    * passage whose exact text occurs in more than `maxDocFreq` DISTINCT
    * documents (boilerplate, quoted headers, license blocks), and reassemble
    * the survivors in order. Returns (doc_id, text_clean, n_passages,
    * n_dropped); a fully-boilerplate document comes back with empty
    * text_clean rather than disappearing.
    *
    * Scale shape: the doc-frequency pass shuffles ONLY (hash, doc_id) pairs
    * — passage bodies stay out of it, and the per-doc distinct collapses
    * map-side. The dropped-hash frame is tiny after the `df > maxDocFreq`
    * filter, so AQE converts the flagging join to a broadcast at runtime.
    * The one unavoidable body shuffle is the reassembly groupBy(doc_id) —
    * inherent to rewriting documents, linear in corpus size.
    *
    * `tokenHasher`: xxhash64 (production) or [[Shingles.md5Hash60]] (the
    * oracle-checkable gate variant).
    */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
                   passageTokens: Int = 10, maxDocFreq: Int = 1,
                   tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    val K = passageTokens
    // split(text) yields at least [""], so nChunks >= 1 for every row
    val withP = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        transform(
          sequence(lit(0L), ceil(size(col("__toks")).cast(DoubleType) / K).cast(LongType) - 1L),
          i => array_join(slice(col("__toks"), (i * K + 1L).cast(IntegerType), lit(K)), " ")).as("passages"))
    unitDedup(withP.withColumnRenamed("passages", "units"), " ", maxDocFreq,
      tokenHasher, "n_passages")
  }

  /** EXACT-SUBSTRING dedup (Lee et al. 2021, arXiv:2107.06499 §4.1,
    * token-window formulation): remove every token covered by a
    * `windowTokens`-token window whose exact text occurs MORE THAN ONCE in
    * the corpus (anywhere — other documents or elsewhere in the same one).
    * Unlike [[passageDedup]]'s fixed chunk grid, the windows SLIDE, so a
    * duplicated span is caught at any alignment — the fixed grid misses
    * duplicates that straddle chunk boundaries.
    *
    * Shape: sliding windows come from the native [[Shingles.shingleStrings]]
    * (no per-element HOF re-evaluation), the duplicate pass shuffles
    * (window-hash, doc, pos) triples with map-side combine, duplicated
    * starts come back per doc as a bounded list, and coverage/rewrite is
    * row-local (token j drops iff some duplicated window starts in
    * (j-K, j]). Document bodies cross the wire once, in the final
    * reassembly only.
    *
    * Output: (doc_id, text_clean, n_tokens, n_removed).
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int = 50,
                     tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    rewriteFromDupPositions(df, idCol, textCol,
      substringDupPositions(df, idCol, textCol, windowTokens, tokenHasher),
      windowTokens)
  }

  /** INCREMENTAL [[substringDedup]]: rewrite only the NEW batch, treating a
    * window as duplicated when its hash is in the persisted `store`
    * (history — all window hashes of prior corpora, bodies never re-read)
    * OR it occurs more than once within the new batch itself. The
    * [[dedupAgainstStore]] pattern at substring granularity; grow the
    * store with [[substringStore]] of the new batch (union distinct).
    *
    * @param store 1-column frame of historical window hashes.
    */
  def substringDedupIncremental(newDocs: DataFrame, idCol: String,
                                textCol: String, store: DataFrame,
                                windowTokens: Int = 50,
                                tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    val wins = windowHashes(newDocs, idCol, textCol, windowTokens, tokenHasher)
    val dupInNew = wins.groupBy("wh").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("wh")
    val storeHashes = store.toDF("wh").select("wh")
    val dupPositions = wins
      .join(dupInNew.unionByName(storeHashes).distinct(), Seq("wh"), "left_semi")
      .select("doc_id", "pos")
    rewriteFromDupPositions(newDocs, idCol, textCol, dupPositions, windowTokens)
  }

  /** The distinct window-hash frame of a corpus slice — the unit the
    * incremental store persists and unions across runs.
    */
  def substringStore(df: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int,
                     tokenHasher: Column => Column = xxhash64(_)): DataFrame =
    windowHashes(df, idCol, textCol, windowTokens, tokenHasher)
      .select("wh").distinct()

  /** Coverage rewrite shared by the full and incremental substring dedup:
    * token j of a doc drops iff some duplicated window starts in (j-K, j].
    */
  private def rewriteFromDupPositions(df: DataFrame, idCol: String,
                                      textCol: String, dupPositions: DataFrame,
                                      windowTokens: Int): DataFrame = {
    val K = windowTokens
    val base = df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val dupStarts = dupPositions
      .groupBy("doc_id").agg(array_sort(collect_list(col("pos"))).as("starts"))
    base.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .withColumn("kept", filter(sequence(lit(0), size(col("toks")) - 1),
        j => !exists(col("starts"), s => s <= j && j < s + K)))
      .select(col("doc_id"),
        array_join(transform(col("kept"), j => element_at(col("toks"), j + 1)), " ").as("text_clean"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast(LongType).as("n_removed"))
  }

  /** (doc_id, pos, wh) sliding-window hash frame shared by the substring
    * family.
    */
  private def windowHashes(df: DataFrame, idCol: String, textCol: String,
                           windowTokens: Int,
                           tokenHasher: Column => Column): DataFrame =
    df.select(col(idCol).as("doc_id"),
        transform(Shingles.shingleStrings(
          TextAnalysis.tokens(col(textCol)), windowTokens), tokenHasher).as("whs"))
      .where(size(col("whs")) > 0)
      .select(col("doc_id"), posexplode(col("whs")).as(Seq("pos", "wh")))

  /** The (doc_id, pos) frame of window starts whose K-token window text is
    * duplicated anywhere in the corpus — the shared core of
    * [[substringDedup]] (coverage rewrite) and [[substringSpans]] (audit).
    */
  def substringDupPositions(df: DataFrame, idCol: String, textCol: String,
                            windowTokens: Int,
                            tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    val wins = windowHashes(df, idCol, textCol, windowTokens, tokenHasher)
    val dup = wins.groupBy("wh").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("wh")
    wins.join(dup, Seq("wh"), "left_semi").select("doc_id", "pos")
  }

  /** AUDIT view of [[substringDedup]]: duplicated window starts merged into
    * MAXIMAL token spans per document (gaps-and-islands: consecutive
    * K-length windows chain while each starts within K of the previous, so
    * an island break is `pos − lag(pos) > K`). One row per span:
    * (doc_id, span_start, span_end exclusive, n_windows) — what a human
    * reviews before committing to the rewrite, and the provenance grain
    * for "how much of this document is copied".
    *
    * Per-doc windows are key-partitioned (bounded, no global sort).
    */
  def substringSpans(df: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int = 50,
                     tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    val K = windowTokens
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    substringDupPositions(df, idCol, textCol, K, tokenHasher)
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > K, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        (max(col("pos")) + K).cast(LongType).as("span_end"),
        count(lit(1)).cast(LongType).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** [[substringSpans]] plus PROVENANCE: for each duplicated span, one
    * example OTHER occurrence of its first window — (example_doc,
    * example_pos) answers "copied from where?" without materializing the
    * full quadratic match list. Per window hash the two lexicographically
    * smallest (doc, pos) occurrences are found with two chained bounded
    * aggregates (min, then min-of-the-rest — never a collect_list of a hot
    * window's full occurrence set); each occurrence's example is the first
    * occurrence, or the second when it IS the first.
    */
  def substringSpansWithProvenance(df: DataFrame, idCol: String, textCol: String,
                                   windowTokens: Int = 50,
                                   tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    val K = windowTokens
    // ONE pass finds, per window hash, the occurrence count AND the two
    // lexicographically smallest occurrences: (doc, pos) encodes into a
    // single long ordering identically to the struct (pos < 2^22 tokens
    // per document — a ~20 MB text bound; the struct formulation is the
    // fallback past it), so the bounded KMV bottom-k aggregate IS the
    // "min and min-of-the-rest" — partial-aggregated, skew-robust, and
    // the round-7 three-aggregate chain (dup → first → second, each
    // re-deriving the window frame) collapses to one shuffle. The island
    // grouping then reuses the SAME duplicated-occurrence frame instead
    // of re-deriving it through substringSpans (measured 2.7 → ~1.2 s at
    // sf0.1; scan count 10 → 4).
    val ENC = 1L << 22
    val DOC_BOUND = 1L << 41 // doc_id·2^22 + pos must stay inside a signed long
    // row-local encode-bound guard (no extra job): a pos ≥ 2^22 window
    // position (~20 MB text) or doc_id ≥ 2^41 would silently corrupt the
    // packed ordering and return wrong provenance — fail loudly instead
    // and point at the struct fallback. Two long compares per row, codegen'd.
    def encChecked(doc: Column, pos: Column): Column =
      when(pos < 0 || pos >= ENC || doc < 0 || doc >= DOC_BOUND,
        raise_error(concat(
          lit("substringSpansWithProvenance: (doc_id,pos)=("), doc, lit(","), pos,
          lit(") exceeds the long-packing bounds (pos<2^22, 0<=doc_id<2^41); "),
          lit("re-key doc ids or use the struct formulation"))))
        .otherwise(doc * ENC + pos)
    val wins = windowHashes(df, idCol, textCol, K, tokenHasher)
    val bot = wins.groupBy("wh").agg(count(lit(1)).as("c"),
        graft.functions.KmvSketch.kmv(encChecked(col("doc_id"), col("pos")), 2).as("b2"))
      .where(col("c") > 1)
      .select(col("wh"), element_at(col("b2"), 1).as("e1"), element_at(col("b2"), 2).as("e2"))
    val occ = wins.join(bot, Seq("wh"))
    val enc = col("doc_id") * ENC + col("pos")
    val examples = occ
      .withColumn("ex", when(enc === col("e1"), col("e2")).otherwise(col("e1")))
      .select(col("doc_id").as("ex_doc"), col("pos").as("ex_pos"),
        expr(s"ex div ${ENC}L").as("example_doc"),
        pmod(col("ex"), lit(ENC)).cast(LongType).as("example_pos"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val spans = occ.select("doc_id", "pos")
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > K, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        (max(col("pos")) + K).cast(LongType).as("span_end"),
        count(lit(1)).cast(LongType).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
    spans.join(examples,
        spans("doc_id") === examples("ex_doc") &&
        spans("span_start") === examples("ex_pos"))
      .select(spans("doc_id"), col("span_start"), col("span_end"),
        col("n_windows"), col("example_doc"), col("example_pos"))
  }

  /** Line-level corpus dedup (the C4 boilerplate-line rule, Raffel et al.
    * 2020 §2.2): drop every LINE whose document frequency exceeds
    * `maxDocFreq` — navigation chrome, cookie banners, license footers and
    * other boilerplate repeat across pages at line granularity where
    * passage chunking straddles the boundaries. Same shape as
    * [[passageDedup]]: the doc-frequency pass shuffles (line-hash, doc)
    * pairs only, reassembly is per-document. Blank lines shared across
    * documents are boilerplate by this definition and drop with the rest.
    */
  /** In-DOCUMENT repeated-unit removal: within each document, keep only the
    * FIRST occurrence of every `sep`-delimited unit (line / paragraph) —
    * the within-page sibling of [[lineDedup]]'s cross-document rule.
    * Templated pages repeat their own chrome (cookie banners between
    * sections, duplicated subscribe blocks); cross-document frequency
    * can't see a unit that repeats only inside one page.
    *
    * ROW-LOCAL — zero shuffle at any corpus size: the keep-first rule is
    * one `filter((u, i) => array_position(units, u) == i+1)` over the
    * pre-projected unit array (projected ONCE so CollapseProject can't
    * re-inline the split per element). Empty units (consecutive
    * separators) are units too: a run of blank lines collapses to one.
    *
    * @return df + (`outCol`, n_units, n_dropped)
    */
  def dropRepeatedUnitsInDoc(df: DataFrame, textCol: String,
                             sep: String = "\n",
                             outCol: String = "text_clean"): DataFrame = {
    val q = java.util.regex.Pattern.quote(sep)
    df.withColumn("__units", split(col(textCol), q))
      .withColumn("__keep", filter(col("__units"),
        (u, i) => array_position(col("__units"), u) === (i.cast(LongType) + 1L)))
      .withColumn(outCol, array_join(col("__keep"), sep))
      .withColumn("n_units", size(col("__units")).cast(LongType))
      .withColumn("n_dropped",
        (size(col("__units")) - size(col("__keep"))).cast(LongType))
      .drop("__units", "__keep")
  }

  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                maxDocFreq: Int = 1,
                tokenHasher: Column => Column = xxhash64(_)): DataFrame =
    unitDedup(
      df.select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("units")),
      "\n", maxDocFreq, tokenHasher, "n_lines")

  /** Shared drop-units-by-document-frequency body of [[passageDedup]] /
    * [[lineDedup]]: input (doc_id, units: array<string>); emits
    * (doc_id, text_clean, `nUnitsName`, n_dropped) with surviving units
    * rejoined by `sep` in original order.
    */
  private def unitDedup(withUnits: DataFrame, sep: String, maxDocFreq: Int,
                        tokenHasher: Column => Column,
                        nUnitsName: String): DataFrame = {
    val exploded = withUnits
      .select(col("doc_id"), posexplode(col("units")).as(Seq("chunk", "unit")))
      .withColumn("ph", tokenHasher(col("unit")))
    val dropped = exploded.select("ph", "doc_id").distinct()
      .groupBy("ph").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDocFreq)
      .select(col("ph"), lit(true).as("__drop"))
    exploded.join(dropped, Seq("ph"), "left")
      .groupBy("doc_id").agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__drop").isNull, struct(col("chunk"), col("unit"))))),
            s => s.getField("unit")),
          sep).as("text_clean"),
        count(lit(1)).as(nUnitsName),
        sum(when(col("__drop").isNotNull, 1L).otherwise(0L)).cast(LongType).as("n_dropped"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup over
    * EMBEDDING clusters — cluster the corpus with the deterministic coarse
    * quantizer, flag within-cluster pairs whose cosine exceeds `threshold`,
    * and keep one representative per connected component (highest
    * `quality`, ties to the smallest id). Catches paraphrases and
    * re-renderings that token-level MinHash misses.
    *
    * Scale shape: cell assignment is row-local (centroid matrix bound as
    * one literal — [[Similarity.assignCells]]); the only corpus shuffle
    * keys on the cell. Within-cell comparison is quadratic IN THE CELL, so
    * `ncells` is the knob that bounds it — size it so n/ncells stays at
    * the 10^4 level (the paper runs 50k clusters at web scale); cells play
    * the role LSH buckets play in [[minhashLshPairs]]. GUARDED: the cell
    * histogram is MEASURED before the self-join (the [[jaccardPairsAuto]]
    * discipline) and hot cells are split by a deterministic sub-quantizer
    * ([[semDedupBlocks]]) so a skewed embedding distribution — boilerplate
    * clusters are common in web corpora — can no longer go silently
    * quadratic; `maxPairsPerCell` is the per-cell pair budget.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
               quality: Column, ncells: Int = 16,
               trainIterations: Int = 0,
               maxPairsPerCell: Long = 25000000L): DataFrame = {
    val withCell = Similarity.assignCells(df, idCol, vecCol, ncells, trainIterations)
    val blocked = semDedupBlocks(withCell, idCol, vecCol, maxPairsPerCell)
    val pairs = cosinePairs(blocked, idCol, vecCol, "__blk", threshold)
    keepBestPerComponent(df, idCol, pairs, quality)
  }

  /** Per-cell cap on [[semDedupBlocks]]'s sub-quantizer width: past 256
    * sub-seeds the per-row assignment cost (k cosines) dominates and the
    * honest fix is more coarse cells, not a wider split — the capped route
    * is logged so the ncells misconfiguration is visible, never silent.
    */
  val MaxSemDedupSubSeeds: Int = 256

  /** Measure-then-route guard for [[semDedup]]'s within-cell self-join:
    * ONE count aggregate over the cell frame decides the route. A cell
    * whose pair count n·(n−1)/2 exceeds `maxPairsPerCell` is split
    * k = ⌈pairs/budget⌉ ways (capped at [[MaxSemDedupSubSeeds]]) by a
    * deterministic sub-quantizer seeded with the cell's k smallest-id
    * vectors — the same argmax-cosine, ties-to-larger-id rule as the
    * coarse quantizer, so members of a TIGHT duplicate group share an
    * argmax and land in one sub-cell together (the split is
    * dedup-preserving on the clusters SemDeDup targets; route equivalence
    * is spec'd). Cold cells pass through as single blocks.
    *
    * Driver cost is bounded by construction: ncells count rows + at most
    * Σ min(k_c, 256) seed vectors collect; the seed table binds ONCE as a
    * literal (the `mightContain` bind-once idiom), so sub-assignment is
    * row-local — no join, no shuffle, exactly like the coarse pass.
    *
    * @return the input plus a `__blk` long column (cell · 2^20 + sub-cell)
    *         for the pair join to block on.
    */
  def semDedupBlocks(withCell: DataFrame, idCol: String, vecCol: String,
                     maxPairsPerCell: Long): DataFrame = {
    require(maxPairsPerCell > 0, "maxPairsPerCell must be positive")
    val SUB = 1L << 20
    def pairsOf(n: Long): Long = n * (n - 1) / 2
    val counts = withCell.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val splits: Map[Long, Int] = counts.collect {
      case (c, n) if pairsOf(n) > maxPairsPerCell =>
        val k = (pairsOf(n) + maxPairsPerCell - 1) / maxPairsPerCell
        c -> math.min(n, math.min(k, MaxSemDedupSubSeeds.toLong)).toInt
    }
    if (splits.isEmpty) withCell.withColumn("__blk", col("cell").cast(LongType) * SUB)
    else {
      val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")
      val capped = splits.collect { case (c, k)
        if k == MaxSemDedupSubSeeds && pairsOf(counts(c)) / k > maxPairsPerCell => c }
      log.info(s"semDedup: splitting ${splits.size} hot cell(s) " +
        s"${splits.toSeq.sortBy(_._1).map { case (c, k) => s"$c(n=${counts(c)},k=$k)" }
          .mkString(", ")} under pair budget $maxPairsPerCell")
      if (capped.nonEmpty)
        log.warn(s"semDedup: cell(s) ${capped.toSeq.sorted.mkString(", ")} hit the " +
          s"$MaxSemDedupSubSeeds-way split cap and may still exceed the pair " +
          "budget — raise ncells (finer coarse quantizer) for this corpus")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy(col(idCol))
      val kExpr = element_at(typedlit(splits), col("cell").cast(LongType))
      val seeds = withCell
        .where(col("cell").cast(LongType).isin(splits.keys.toSeq: _*))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= kExpr)
        .select(col("cell").cast(LongType).as("c"), col("__rn").as("s"),
          transform(col(vecCol), x => x.cast(DoubleType)).as("sv"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
      val seedLit = typedlit(seeds.toSeq) // ONE literal node, k×dim values
      val mySeeds = filter(seedLit, s => s.getField("_1") === col("cell").cast(LongType))
      val v = transform(col(vecCol), x => x.cast(DoubleType))
      val sub = array_max(transform(mySeeds,
          s => struct(Similarity.cosine(v, s.getField("_3")).as("cos"),
            s.getField("_2").as("s"))))
        .getField("s")
      // eager localCheckpoint: without a hard barrier CollapseProject
      // inlines the seed-literal expression into the pair join's keys on
      // BOTH sides and the optimizer/codegen re-chews the full literal per
      // appearance (measured 28 s vs 0.3 s at sf0.1; a repartition barrier
      // still leaves 15 s of per-stage planning). The split route pays one
      // corpus materialization — executor-local blocks, ContextCleaner-
      // freed — which the pair self-join would shuffle right after anyway.
      withCell.withColumn("__blk",
          col("cell").cast(LongType) * SUB + coalesce(sub.cast(LongType), lit(0L)))
        .localCheckpoint(true)
    }
  }

  /** [[cosinePairs]] with the measure-then-route guard ([[jaccardPairsAuto]]
    * / [[semDedupBlocks]] discipline) closing the last unguarded quadratic:
    * fixed LABEL blocking is only safe while every block's pair count
    * n·(n−1)/2 fits the budget, and a skewed label distribution (one
    * dominant language/domain) silently breaks that. ONE count aggregate
    * over the block column decides the route: cold corpora run the exact
    * within-block join unchanged (bit-identical to [[cosinePairs]],
    * spec-asserted); a hot block is split k = ⌈pairs/budget⌉ ways (cap
    * [[MaxSemDedupSubSeeds]], logged) by the deterministic sub-quantizer
    * seeded with the block's k smallest-id vectors — members of a TIGHT
    * duplicate cluster share an argmax and stay together, the split is
    * dedup-preserving on the clusters the threshold targets (cross-sub
    * pairs of merely-similar vectors are the documented recall trade;
    * [[semDedup]] is the first-class scale path when that matters).
    *
    * Block cardinality must be driver-bounded (it is a LABEL column by
    * contract — language, source, domain bucket), exactly like the
    * [[semDedupBlocks]] cell histogram.
    */
  def cosinePairsAuto(df: DataFrame, idCol: String, vecCol: String,
                      blockCol: String, threshold: Double,
                      maxPairsPerBlock: Long = 25000000L): DataFrame = {
    require(maxPairsPerBlock > 0, "maxPairsPerBlock must be positive")
    def pairsOf(n: Long): Long = n * (n - 1) / 2
    val counts = df.where(col(blockCol).isNotNull)
      .groupBy(col(blockCol).cast(StringType).as("b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val splits: Map[String, Int] = counts.collect {
      case (b, n) if pairsOf(n) > maxPairsPerBlock =>
        val k = (pairsOf(n) + maxPairsPerBlock - 1) / maxPairsPerBlock
        b -> math.min(n, math.min(k, MaxSemDedupSubSeeds.toLong)).toInt
    }
    if (splits.isEmpty) cosinePairs(df, idCol, vecCol, blockCol, threshold)
    else {
      val log = org.slf4j.LoggerFactory.getLogger("graft.ops.Dedup")
      log.info(s"cosinePairsAuto: splitting ${splits.size} hot block(s) " +
        s"${splits.toSeq.sorted.map { case (b, k) => s"$b(n=${counts(b)},k=$k)" }
          .mkString(", ")} under pair budget $maxPairsPerBlock")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(blockCol).orderBy(col(idCol))
      val kExpr = element_at(typedlit(splits), col(blockCol).cast(StringType))
      val seeds = df
        .where(col(blockCol).cast(StringType).isin(splits.keys.toSeq: _*))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= kExpr)
        .select(col(blockCol).cast(StringType).as("b"), col("__rn").as("s"),
          transform(col(vecCol), x => x.cast(DoubleType)).as("sv"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2)))
      val seedLit = typedlit(seeds.toSeq) // ONE literal node, Σk×dim values
      val mySeeds = filter(seedLit, s => s.getField("_1") === col(blockCol).cast(StringType))
      val v = transform(col(vecCol), x => x.cast(DoubleType))
      val sub = array_max(transform(mySeeds,
          s => struct(Similarity.cosine(v, s.getField("_3")).as("cos"),
            s.getField("_2").as("s"))))
        .getField("s")
      // same eager-barrier rationale as semDedupBlocks: without it the
      // seed-literal expression inlines into BOTH sides of the pair join
      val blocked = df.withColumn("__blk",
          concat_ws("#", col(blockCol).cast(StringType),
            coalesce(sub.cast(LongType), lit(0L)).cast(StringType)))
        .localCheckpoint(true)
      cosinePairs(blocked, idCol, vecCol, "__blk", threshold)
    }
  }

  /** Embedding-cosine near-dup pairs within blocks (e.g. same label).
    * Vectors are cast to double before any arithmetic; dot/norms use ordered
    * `aggregate` so results are reproducible.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, blockCol: String,
                  threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
    val l = base.select(col("blk"), col("id").as("id_a"), col("v").as("v_a"))
    val r = base.select(col("blk"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
