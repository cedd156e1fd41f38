package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming exact deduplication — the continuous form of `Dedup.exactGroups`
  * for ingest pipelines: only the FIRST occurrence of each document passes.
  *
  * Two strategies, both keyed on xxhash64 of the text (the body never enters
  * the dedup state — state per key is O(1) and 8-byte-keyed):
  *  - [[dropDuplicatesStream]]: Spark's built-in watermark-scoped dedup
  *    (state evicted when the watermark passes);
  *  - [[firstSeenStream]]: explicit state with an event-time TTL — survives
  *    out-of-order arrivals inside the TTL and re-admits a document once the
  *    TTL passes (re-crawl semantics).
  */
object StreamingDedup {

  /** Built-in: drop duplicate text hashes within the watermark window. */
  def dropDuplicatesStream(df: DataFrame, tsCol: String, textCol: String,
                           watermark: String): DataFrame =
    df.withColumn("text_hash", xxhash64(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  final case class PassEvent(h: Long, ts: Timestamp, doc_id: Long, idx: Int,
                             passage: String) {
    def tsMicros: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  final case class PassOut(doc_id: Long, idx: Int, passage: String, ts: Timestamp)

  /** Streaming passage-level dedup — the continuous form of
    * `Dedup.passageDedup` for ingest: each incoming document is split into
    * consecutive `passageTokens`-token passages (identical chunking to the
    * batch operator) and a passage passes ONLY the first time its hash is
    * seen; later documents arrive pre-shrunk of boilerplate already in the
    * corpus. First-seen semantics (the first crawl keeps the passage)
    * rather than the batch operator's drop-from-ALL-docs `maxDocFreq`
    * rule — the right asymmetry when earlier data is already committed.
    * Within a batch the earliest (ts, doc_id, idx) occurrence wins.
    *
    * State per passage hash is O(1) (8-byte key + first-seen micros; the
    * passage BODY never enters state), evicted by event-time TTL like
    * [[firstSeenStream]]. Emits surviving (doc_id, idx, passage) rows in
    * append mode; reassembly (groupBy doc_id, sort by idx) is the
    * consumer's batch-side concat, since a second stateful shuffle per
    * micro-batch buys nothing at ingest time.
    */
  def passageFirstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String,
                             idCol: String, textCol: String, passageTokens: Int,
                             ttlSeconds: Long, watermark: String): Dataset[PassOut] = {
    import spark.implicits._
    val K = passageTokens
    val exploded = df
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        graft.ops.TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("ts"),
        posexplode(transform(
          sequence(lit(0L), ceil(size(col("__toks")).cast("double") / K).cast("long") - 1L,
            lit(1L)),
          i => array_join(slice(col("__toks"), (i * K + 1L).cast("int"), lit(K)), " ")))
          .as(Seq("idx", "passage")))
      .select(xxhash64(col("passage")).as("h"), col("ts"), col("doc_id"),
        col("idx").cast("int").as("idx"), col("passage"))
      .withWatermark("ts", watermark)
      .as[PassEvent]
    exploded.groupByKey(_.h)
      .flatMapGroupsWithState[SeenState, PassOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: Long, events: Iterator[PassEvent], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = events.minBy(e => (e.tsMicros, e.doc_id, e.idx))
                state.update(SeenState(first.tsMicros))
                Iterator.single(PassOut(first.doc_id, first.idx, first.passage, first.ts))
              }
            state.getOption.foreach { s =>
              val deadline = s.firstMicros / 1000L + ttlSeconds * 1000L
              state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1L))
            }
            out
          }
      }
  }

  final case class SeenEvent(h: Long, ts: Timestamp, id: Long) {
    def tsMicros: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  final case class SeenState(firstMicros: Long)
  final case class SeenOut(id: Long, text_hash: Long, ts: Timestamp)

  /** Explicit first-seen filter: per text-hash, emit the earliest event of
    * the first batch that sees it; suppress everything else until the
    * event-time TTL expires (state removed ⇒ the next occurrence is "first"
    * again). Append mode; state bounded by TTL × arrival rate.
    */
  def firstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String, idCol: String,
                      textCol: String, ttlSeconds: Long, watermark: String): Dataset[SeenOut] = {
    import spark.implicits._
    hashedFirstSeenStream(spark,
      df.select(xxhash64(col(textCol)).as("h"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id")),
      ttlSeconds, watermark)
  }

  /** Continuous EXACT dedup of IMAGE payloads by perceptual dHash: per
    * 64-bit [[graft.ops.Multimodal.dhash64]] (formats sniffed from magic
    * bytes — no trusted label needed) the first-seen event passes, every
    * later visually-identical re-crawl is suppressed until the event-time
    * TTL expires. Exact HASH equality only — within-a-few-bits near-dups
    * remain the batch operator's job ([[graft.ops.Multimodal.imageNearDupPairs]]);
    * undecodable payloads pass through unsuppressed (triage, not loss).
    * State per distinct hash is one long.
    */
  def imageFirstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String,
                           idCol: String, mediaCol: String,
                           ttlSeconds: Long, watermark: String): Dataset[SeenOut] = {
    import spark.implicits._
    val hashed = df
      .select(col(mediaCol).as("media"),
        graft.ops.Multimodal.sniffFormat(col(mediaCol)).as("format"),
        col(tsCol).as("ts"), col(idCol).cast("long").as("id"))
      .as[(Array[Byte], String, Timestamp, Long)]
      .mapPartitions { it =>
        it.map { case (media, format, ts, id) =>
          // undecodable -> a unique per-id sentinel hash (never collides
          // with a real dHash space neighbor's suppression window)
          val h = graft.ops.Multimodal.dhash64(media, format)
            .getOrElse(Long.MinValue | id)
          (h, ts, id)
        }
      }.toDF("h", "ts", "id")
    hashedFirstSeenStream(spark, hashed, ttlSeconds, watermark)
  }

  /** Continuous exact dedup of AUDIO payloads by the energy-contour
    * fingerprint ([[graft.ops.Multimodal.ahash64]]) — the audio twin of
    * [[imageFirstSeenStream]] on the same factored state machine:
    * volume-normalized re-ingests of a clip suppress (gain-invariant
    * contour), undecodable payloads pass via unique sentinels.
    */
  def audioFirstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String,
                           idCol: String, mediaCol: String,
                           ttlSeconds: Long, watermark: String): Dataset[SeenOut] = {
    import spark.implicits._
    val hashed = df
      .select(col(mediaCol).as("media"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"))
      .as[(Array[Byte], Timestamp, Long)]
      .mapPartitions { it =>
        it.map { case (media, ts, id) =>
          val h = graft.ops.Multimodal.ahash64(media).getOrElse(Long.MinValue | id)
          (h, ts, id)
        }
      }.toDF("h", "ts", "id")
    hashedFirstSeenStream(spark, hashed, ttlSeconds, watermark)
  }

  /** Continuous exact dedup of VIDEO containers by their frame dHash
    * SEQUENCE: per GVID container the per-frame perceptual hashes fold
    * (order-sensitive FNV-style) into one 64-bit signature, so a
    * re-ingested copy suppresses even when every frame was TRANSCODED to
    * another format (dHash is pixel-level: a BMP frame and its PNG
    * re-encode hash identically — spec'd) or the container re-packed.
    * Near-duplicate videos (a few edited frames) remain the batch
    * keyframe machinery's job ([[graft.ops.Multimodal.shotBoundaries]]).
    * Corrupt containers and all-undecodable-frame videos pass via unique
    * per-id sentinels (triage, not loss). One long of state per distinct
    * signature.
    */
  def videoFirstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String,
                           idCol: String, mediaCol: String,
                           ttlSeconds: Long, watermark: String): Dataset[SeenOut] = {
    import spark.implicits._
    val hashed = df
      .select(col(mediaCol).as("media"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"))
      .as[(Array[Byte], Timestamp, Long)]
      .mapPartitions { it =>
        it.map { case (media, ts, id) =>
          val h = graft.ops.Multimodal.Video.frames(media) match {
            case None => Long.MinValue | id
            case Some(fs) =>
              val hs = fs.flatMap(f => graft.ops.Multimodal.dhash64(
                f, graft.ops.Multimodal.Video.sniffBytes(f)))
              if (hs.isEmpty) Long.MinValue | id
              else hs.foldLeft(-3750763034362895579L)((acc, x) =>
                (acc ^ x) * 1099511628211L)
          }
          (h, ts, id)
        }
      }.toDF("h", "ts", "id")
    hashedFirstSeenStream(spark, hashed, ttlSeconds, watermark)
  }

  final case class SemEvent(cell: Int, ts: Timestamp, id: Long, v: Array[Double]) {
    def tsMicros: Long = ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }
  final case class SemRep(id: Long, v: Array[Double])
  final case class SemState(reps: List[SemRep])
  final case class SemOut(id: Long, cell: Int, ts: Timestamp)

  /** Streaming SEMANTIC dedup — the continuous form of [[graft.ops.Dedup.semDedup]]
    * for embedding streams: each arriving vector is cell-assigned row-local
    * against a PRE-TRAINED persisted quantizer
    * ([[graft.ops.Similarity.trainIvfQuantizer]] /
    * [[graft.ops.Similarity.loadQuantizer]] — a stream can't train), then
    * compared ONLY against its cell's representative store; a vector within
    * `threshold` cosine of any representative is suppressed, otherwise it
    * passes AND joins the store. First-seen semantics (the first crawl
    * keeps the document), the online analogue of keep-one-per-component —
    * identical to the batch answer whenever semantic groups are tight
    * (all-pairs over threshold), which is exactly the regime SemDeDup
    * targets; on chains the greedy rule may keep more (never fewer) than
    * the batch transitive closure, the safe direction for dedup.
    *
    * A prior run's survivors seed the state via `initialReps`
    * ((id, cell, vector) rows — e.g. the persisted output of a batch
    * [[graft.ops.Dedup.semDedup]] pass or of this stream), so the store
    * GROWS across runs exactly like the MinHash signature store.
    *
    * State per cell is its representative list — the same memory class as
    * one IVF cell (corpus_reps/ncells vectors); size `ncells` so a cell's
    * representatives fit an executor, the knob [[graft.ops.Dedup.semDedup]]
    * already imposes. Within a batch events apply in (ts, id) order, so
    * results are arrival-deterministic. No TTL: a dedup store persists
    * (re-admission semantics belong to exact-hash TTL dedup, not semantic).
    */
  /** Stream-vs-STORE near-dup screen — the continuous twin of
    * [[graft.ops.Dedup.dedupAgainstStore]]: each arriving document is
    * signed ROW-LOCALLY (fused MinHash expr; optional PINNED DF prune set —
    * [[graft.ops.Dedup.loadPruneSet]], the row-457 cross-run consistency
    * contract: the store was signed under the same set), banded, and
    * equi-joined against the STATIC store signature frame (stream-static
    * join — no streaming state at all); similarity is the signature
    * component-agreement estimate, so store bodies are never read. A pair
    * colliding in several bands emits once via the row-local
    * first-matching-band filter (BandPrefixMatchExpr) — no streaming
    * dropDuplicates state. Append mode.
    *
    * @param storeSigs batch (id, sig) frame from [[graft.ops.Dedup.minhashSignatures]]
    *                  with the SAME numHashes/shingleLen/hasher/pruneSet.
    * @return streaming (new_id, ts, store_id, est) with est >= threshold.
    */
  def storeDedupStream(stream: DataFrame, idCol: String, tsCol: String,
                       textCol: String, storeSigs: DataFrame, threshold: Double,
                       numHashes: Int = 64, bands: Int = 16, shingleLen: Int = 3,
                       tokenHasher: org.apache.spark.sql.Column => org.apache.spark.sql.Column = xxhash64(_),
                       pruneSet: Option[DataFrame] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    def bandKeys(sigCol: org.apache.spark.sql.Column) =
      array((0 until bands).map(b =>
        xxhash64(concat_ws(",", slice(sigCol, b * rowsPerBand + 1, rowsPerBand)), lit(b))): _*)
    val hashed0 = stream.select(col(idCol).cast("long").as("new_id"),
      col(tsCol).as("ts"),
      transform(graft.ops.Shingles.shingleStrings(
        graft.ops.TextAnalysis.tokens(col(textCol)), shingleLen), tokenHasher).as("h"))
    val hashed = pruneSet match {
      case None => hashed0
      case Some(set) =>
        val hot = set.select(col("sh"))
          .limit(graft.ops.Dedup.DefaultDfPruneBroadcastMax + 1)
          .collect().map(_.getLong(0))
        require(hot.length <= graft.ops.Dedup.DefaultDfPruneBroadcastMax,
          "pruneSet exceeds the broadcast cap — train with a higher maxDf")
        hashed0.select(col("new_id"), col("ts"),
            graft.functions.LongSetFilter.exceptSet(col("h"), hot.toSeq).as("h"))
          .where(size(col("h")) > 0)
    }
    val sigd = hashed.select(col("new_id"), col("ts"),
      graft.functions.MinHash.signature(col("h"), numHashes).as("sig_a"))
    val banded = sigd.withColumn("bk_a", bandKeys(col("sig_a")))
      .select(col("new_id"), col("ts"), col("sig_a"), col("bk_a"),
        posexplode(col("bk_a")).as(Seq("band", "bkey")))
    val storeB = storeSigs
      .select(col("id").as("store_id"), col("sig").as("sig_b"))
      .withColumn("bk_b", bandKeys(col("sig_b")))
      .select(col("store_id"), col("sig_b"), col("bk_b"),
        posexplode(col("bk_b")).as(Seq("band_s", "bkey_s")))
    banded
      .join(storeB, col("band") === col("band_s") && col("bkey") === col("bkey_s"))
      .where(!graft.functions.BandPrefixMatch.matchesBefore(
        col("bk_a"), col("bk_b"), col("band")))
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
          .cast("double") / numHashes.toDouble)
      .where(col("est") >= threshold)
      .select("new_id", "ts", "store_id", "est")
  }

  def semanticFirstSeenStream(spark: SparkSession, df: DataFrame, tsCol: String,
                              idCol: String, vecCol: String,
                              quantizer: DataFrame, threshold: Double,
                              watermark: String,
                              initialReps: Option[DataFrame] = None): Dataset[SemOut] = {
    import spark.implicits._
    def localCos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) 0.0 else dot / d
    }
    val events = graft.ops.Similarity
      .assignCellsWithQuantizer(
        df.select(col(tsCol).as("ts"), col(idCol).cast("long").as("id"),
          transform(col(vecCol), x => x.cast("double")).as("v")),
        "v", quantizer)
      .select(col("cell").cast("int").as("cell"), col("ts"), col("id"), col("v"))
      .withWatermark("ts", watermark)
      .as[SemEvent]
    val grouped = events.groupByKey(_.cell)
    val step = (cell: Int, evs: Iterator[SemEvent], state: GroupState[SemState]) => {
      val reps = scala.collection.mutable.ListBuffer.empty[SemRep]
      reps ++= state.getOption.map(_.reps).getOrElse(Nil)
      val out = List.newBuilder[SemOut]
      evs.toSeq.sortBy(e => (e.tsMicros, e.id)).foreach { e =>
        if (!reps.exists(r => localCos(r.v, e.v) >= threshold)) {
          reps += SemRep(e.id, e.v)
          out += SemOut(e.id, cell, e.ts)
        }
      }
      state.update(SemState(reps.toList))
      out.result().iterator
    }
    initialReps match {
      case Some(reps) =>
        // contract: first column = id, second column = embedding (e.g. the
        // persisted survivors of a batch semDedup pass or of this stream)
        val init = graft.ops.Similarity
          .assignCellsWithQuantizer(
            reps.select(col(reps.columns(0)).cast("long").as("id"),
              transform(col(reps.columns(1)), x => x.cast("double")).as("v")),
            "v", quantizer)
          .select(col("cell").cast("int").as("cell"), col("id"), col("v"))
          .as[(Int, Long, Array[Double])]
          .groupByKey(_._1)
          .mapValues(t => SemRep(t._2, t._3))
          .mapGroups((c, rs) => (c, SemState(rs.toList.sortBy(_.id))))
          .groupByKey(_._1)
          .mapValues(_._2)
        grouped.flatMapGroupsWithState[SemState, SemOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout(), init)(step)
      case None =>
        grouped.flatMapGroupsWithState[SemState, SemOut](
          OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
    }
  }

  /** The shared first-seen state machine over a PRE-HASHED (h, ts, id)
    * frame — text hashes, perceptual hashes, any 64-bit key.
    */
  def hashedFirstSeenStream(spark: SparkSession, hashed: DataFrame,
                            ttlSeconds: Long, watermark: String): Dataset[SeenOut] = {
    import spark.implicits._
    hashed
      .withWatermark("ts", watermark)
      .as[SeenEvent]
      .groupByKey(_.h)
      .flatMapGroupsWithState[SeenState, SeenOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h: Long, events: Iterator[SeenEvent], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out =
              if (state.exists) Iterator.empty
              else {
                val first = events.minBy(_.tsMicros)
                state.update(SeenState(first.tsMicros))
                Iterator.single(SeenOut(first.id, h, first.ts))
              }
            state.getOption.foreach { s =>
              // clamp vs the current watermark: a late arrival for a key whose
              // TTL deadline the watermark already passed (timeout not yet
              // processed) would otherwise make setTimeoutTimestamp throw and
              // kill the query — clamping fires the timeout on the next batch
              val deadline = s.firstMicros / 1000L + ttlSeconds * 1000L
              state.setTimeoutTimestamp(math.max(deadline, state.getCurrentWatermarkMs() + 1L))
            }
            out
          }
      }
  }
}
