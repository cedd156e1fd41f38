package graft.streaming

import graft.api.ColumnConfig
import graft.metrics.MetricColumns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality monitoring as a continuous computation: the same
  * missing/validity predicates the batch Scanner compiles, aggregated per
  * event-time window (batch) or per watermarked window (Structured
  * Streaming). Batch and streaming share one aggregate builder, so their
  * results are identical by construction.
  */
object StreamingMonitor {

  private def aggCols(cols: Seq[(String, ColumnConfig)]): Seq[Column] =
    cols.flatMap { case (name, cfg) =>
      val c = col(name)
      val missing = missingCond(c, cfg)
      val invalid = !missing && !validCond(c, cfg)
      Seq(
        countIf(missing).as(s"${name}_missing"),
        countIf(invalid).as(s"${name}_invalid"))
    }

  /** Per-window quality metrics over a batch frame. */
  def qualityByWindow(df: DataFrame, tsCol: String, duration: String,
                      cols: Seq[(String, ColumnConfig)]): DataFrame =
    df.groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("row_count"), aggCols(cols): _*)
      .select(col("w.start").as("window_start") +: col("row_count") +:
        cols.flatMap { case (n, _) => Seq(col(s"${n}_missing"), col(s"${n}_invalid")) }: _*)

  /** Streaming variant: watermarked, append-mode-safe. */
  def qualityStream(df: DataFrame, tsCol: String, watermark: String, duration: String,
                    cols: Seq[(String, ColumnConfig)]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("row_count"), aggCols(cols): _*)
      .select(col("w.start").as("window_start") +: col("row_count") +:
        cols.flatMap { case (n, _) => Seq(col(s"${n}_missing"), col(s"${n}_invalid")) }: _*)

  /** Quality metrics per dimension value (e.g. per market segment) — one
    * conditional-aggregate pass grouped by the dimension.
    */
  def qualityByDimension(df: DataFrame, dimCol: String,
                         cols: Seq[(String, ColumnConfig)]): DataFrame =
    df.groupBy(col(dimCol))
      .agg(count(lit(1)).as("row_count"), aggCols(cols): _*)

  /** Per-window distinct-cardinality sketch of `keyCol`: the mergeable KMV
    * aggregate rides the normal watermarked window aggregation (map-side
    * partials merge like any agg — state per window is k longs, NOT the
    * distinct set), plus a closed-form estimate column. The streaming
    * cardinality-drift monitor: a window whose key cardinality collapses
    * (stuck producer) or explodes (key leak) shows immediately, at O(k)
    * state, where exact `approx_count_distinct` state would also work but
    * the KMV sketch additionally supports cross-window set algebra via
    * [[graft.functions.ThetaSketch]].
    *
    * Works identically on a batch frame (drop the watermark semantics) —
    * same aggregate, same estimate expression.
    */
  def distinctSketchStream(df: DataFrame, tsCol: String, watermark: String,
                           duration: String, keyCol: String, k: Int): DataFrame = {
    val sketched = df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(graft.functions.KmvSketch.kmv(
        graft.ops.Shingles.md5Hash60(col(keyCol).cast("string")), k).as("sketch"))
    // (k-1)/normalized k-th minimum; exact when the sketch is not full
    val est = when(size(col("sketch")) < k, size(col("sketch")).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(col("sketch"), k).cast("double") / lit(math.pow(2, 60))))
    sketched.select(col("w.start").as("window_start"), col("sketch"),
      est.as("distinct_estimate"))
  }

  /** Per-window heavy hitters ([[graft.functions.MgSketchAgg]] at window
    * grain): the Misra–Gries summary rides the watermarked window
    * aggregation — ≤ k entries of state per window however many rows or
    * distinct keys a window sees, each retained count within n/k of truth
    * (exact when a window has ≤ k distinct keys). Works identically on a
    * batch frame. Output: one row per retained (window, item).
    */
  def heavyHittersStream(df: DataFrame, tsCol: String, watermark: String,
                         duration: String, itemCol: String, k: Int): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(graft.functions.MgSketch.mg(col(itemCol), k).as("hh"))
      .select(col("w.start").as("window_start"), explode(col("hh")).as("e"))
      .select(col("window_start"), col("e.item").as("item"), col("e.cnt").as("cnt"))

  /** Per-window quantile sketch ([[graft.functions.QuantileSketchAgg]]):
    * the deterministic bottom-k-by-hash value sample at window grain, with
    * lower-nearest-rank p25/p50/p75 read off it. State is O(k) per window
    * however many rows a window sees; the sample — hence every quantile —
    * is EXACTLY what the batch twin computes on the same rows
    * (merge-order/partitioning invariance of bottom-k). Works identically
    * on a batch frame.
    */
  def quantileSketchStream(df: DataFrame, tsCol: String, watermark: String,
                           duration: String, keyHash: Column, valueCol: Column,
                           k: Int): DataFrame = {
    import graft.functions.QuantileSketch
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(QuantileSketch.qsketch(keyHash, valueCol, k).as("sketch"))
      .select(col("w.start").as("window_start"),
        size(col("sketch")).as("n_sample"),
        QuantileSketch.quantile(col("sketch"), 0.25).as("p25"),
        QuantileSketch.quantile(col("sketch"), 0.5).as("p50"),
        QuantileSketch.quantile(col("sketch"), 0.75).as("p75"))
  }

  /** Per-window VALUE sample for KS drift monitoring: the bottom-k-by-hash
    * sketch of [[quantileSketchStream]] emitted as the raw sorted sample, so
    * each closed window carries a deterministic, mergeable ≤k-value summary
    * of its distribution. Feed the collected windows + a static reference
    * sample to [[graft.scan.Drift.ksOfSamples]] for per-window KS — exact
    * when k covers the window's distinct keys, a hash-uniform subsample
    * otherwise. State per window is ≤ k (hash, value) pairs.
    */
  def ksSketchStream(df: DataFrame, tsCol: String, watermark: String,
                     duration: String, keyHash: Column, valueCol: Column,
                     k: Int): DataFrame = {
    import graft.functions.QuantileSketch
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(QuantileSketch.qsketch(keyHash, valueCol, k).as("sample"))
      .select(col("w.start").as("window_start"),
        size(col("sample")).as("n_sample"), col("sample"))
  }

  /** Per-window EXACT raw moments (n, Σv, Σv²) of an integer-valued
    * column — the streaming half of the `welch_reference:` monitor and,
    * unlike the bottom-k sample feeds, EXACT at any window size: moments
    * are plain partial aggregates, so the per-window Welch t derived from
    * them ([[graft.scan.Drift.welchOfMoments]]) is bit-equal to the batch
    * [[graft.scan.Drift.welchT]] on the window's slice — no sketch
    * coverage caveat. Sums ride DECIMAL(38,0) (v² up to ~10¹⁸ per row).
    * Works identically on a batch frame.
    */
  def momentStream(df: DataFrame, tsCol: String, watermark: String,
                   duration: String, colName: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = col(colName).cast(org.apache.spark.sql.types.LongType)
    val base = df.select(col(tsCol), v.as("__v")).where(col("__v").isNotNull)
    val src = if (df.isStreaming) base.withWatermark(tsCol, watermark) else base
    src.groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast(D)).as("s_raw"),
        sum(col("__v").cast(D) * col("__v").cast(D)).as("q_raw"))
      .select(col("w.start").as("window_start"), col("n"),
        col("s_raw"), col("q_raw"))
  }

  /** Per-window Count-Min counter table: [[graft.ops.CountMin]]'s groupBy
    * rides the normal watermarked window aggregation — streaming state is
    * ≤ depth×width cells per window, point estimates for ANY key from it
    * (the frequency complement of [[distinctSketchStream]]'s cardinality
    * sketch). Works identically on a batch frame.
    */
  def cmsTableStream(df: DataFrame, tsCol: String, watermark: String,
                     duration: String, keyHash: Column,
                     depth: Int, width: Int): DataFrame =
    df.withWatermark(tsCol, watermark)
      .select(col(tsCol), graft.ops.CountMin.positionsBound(keyHash, depth, width).as("__ps"))
      .where(col("__ps").isNotNull)
      .select(col(tsCol), posexplode(col("__ps")).as(Seq("row", "pos")))
      .where(col("pos").isNotNull)
      .groupBy(window(col(tsCol), duration).as("w"), col("row"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("row"), col("pos"), col("cnt"))

  final case class WindowDrift(windowStart: java.sql.Timestamp,
                               distinctEstimate: Double,
                               newKeysEstimate: Double,
                               droppedKeysEstimate: Double,
                               jaccardVsPrev: Double)

  /** Cross-window key-population drift from a collected
    * [[distinctSketchStream]] result (window counts are bounded by time, not
    * data — collecting them is fine): for each consecutive window pair,
    * theta-sketch estimates of the keys that appeared (`new`), vanished
    * (`dropped`), and the overlap ratio. Exact whenever the sketches are not
    * full. The "did my key population shift between windows" monitor — the
    * cross-run analogue of the batch scan's [[graft.scan.Drift]] report.
    */
  /** Per-window equi-width bucket counts of a numeric column — the
    * streaming half of a PSI drift monitor: ONE streaming aggregation
    * keyed by (window, bucket); pair each collected window with a static
    * reference via [[psiOfWindows]] (window results are bounded by time ×
    * buckets, so collecting them is fine — the same contract as
    * [[sketchDrift]]). Bucket arithmetic matches
    * [[graft.scan.Drift.psiBuckets]]. Works identically on a batch frame.
    */
  def bucketCountStream(df: DataFrame, tsCol: String, watermark: String,
                        duration: String, valueCol: String,
                        lo: Double, hi: Double, buckets: Int): DataFrame = {
    val c = col(valueCol).cast("double")
    val width = (hi - lo) / buckets.toDouble
    val bRaw = when(c.isNull || lit(width) <= 0.0, lit(null).cast("long"))
      .otherwise(least(floor((c - lit(lo)) / lit(width)).cast("long"), lit(buckets.toLong - 1)))
    df.withWatermark(tsCol, watermark)
      .withColumn("__b_raw", bRaw)
      .where(col("__b_raw").isNotNull)
      .withColumn("__bucket", greatest(col("__b_raw"), lit(0L)))
      .groupBy(window(col(tsCol), duration).as("w"), col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("bucket"), col("cnt"))
  }

  /** Windowed (category, count) feed for the CATEGORICAL drift monitor —
    * the streaming half of the `chi2_reference:` scan key: pair each
    * collected window's count map with [[graft.scan.Drift.chi2OfCounts]]
    * against a static reference for the per-window χ² ppm statistic (the
    * twin replays the batch statistic's truncated integer terms, so it is
    * bit-equal on equal counts). NULL categories are excluded, matching
    * the batch [[graft.scan.Drift.chiSquareCategorical]]. One windowed
    * aggregate with map-side combine; output bounded by windows × category
    * cardinality.
    */
  def categoryCountStream(df: DataFrame, tsCol: String, watermark: String,
                          duration: String, valueCol: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .select(col(tsCol), col(valueCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .groupBy(window(col(tsCol), duration).as("w"), col("k").as("category"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("category"), col("cnt"))

  /** Windowed SUCCESS/TOTAL counts of a boolean predicate — the feed for
    * per-window rate monitoring ("did this hour's validity/conversion/
    * match rate move vs the reference") via [[graft.scan.Drift
    * .propTestOfCounts]]. One windowed aggregate; NULL predicate rows are
    * excluded (not failures), matching the batch `proportionTest`.
    */
  def rateStream(df: DataFrame, tsCol: String, watermark: String,
                 duration: String, successCol: org.apache.spark.sql.Column): DataFrame =
    df.withWatermark(tsCol, watermark)
      .withColumn("__b", successCol.cast("boolean"))
      .where(col("__b").isNotNull)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("x"))
      .select(col("w.start").as("window_start"), col("n"), col("x"))

  /** Windowed OUT-OF-VOCABULARY rate: per-window fraction of token
    * occurrences outside a (bounded, broadcast-literal) reference
    * vocabulary — the STREAMING tokenizer-fit monitor next to the batch
    * [[graft.ops.TextAnalysis.vocabCoverage]] ("did tonight's crawl start
    * speaking a language our tokenizer fragments"). Tokens explode
    * row-locally BEFORE the windowed aggregate, so this is one windowed
    * count — [[rateStream]] pointed at token-level membership; same
    * output contract, here (window_start, n = tokens, x = in-vocab).
    */
  def oovStream(df: DataFrame, tsCol: String, watermark: String,
                duration: String, textCol: String,
                vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "need a non-empty vocabulary")
    val tokens = df.select(col(tsCol).as("__ts"),
      explode(graft.ops.TextAnalysis.tokens(col(textCol))).as("__t"))
    rateStream(tokens, "__ts", watermark, duration,
        col("__t").isInCollection(vocab))
  }

  /** Windowed per-doc benchmark-contamination screen — the STREAMING twin
    * of [[graft.ops.Dedup.contaminationScores]] ("is tonight's crawl
    * quoting the eval set"): each arriving doc's distinct n-gram shingle
    * hashes left-join a STATIC train/eval reference reduced ONCE to its
    * distinct hash set (a stream-static join — the reference never
    * re-shuffles per batch beyond its cached reduction), then one
    * watermarked per-(window, doc) aggregate. Shingle-less docs (shorter
    * than shingleLen tokens) survive via explode_outer with n_shingles = 0
    * and null contamination — same "unmeasurable ≠ clean" contract as the
    * batch operator.
    *
    * @return streaming frame (window_start, id, n_shingles, hits,
    *         contamination), append-mode ready (complete per closed window).
    */
  def contaminationStream(docs: DataFrame, tsCol: String, watermark: String,
                          duration: String, idCol: String, textCol: String,
                          reference: DataFrame, refTextCol: String,
                          shingleLen: Int = 3,
                          tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    import graft.ops.{Shingles, TextAnalysis}
    def hs(c: Column) = array_distinct(transform(
      Shingles.shingleStrings(TextAnalysis.tokens(c), shingleLen), tokenHasher))
    val refH = reference.select(explode(hs(col(refTextCol))).as("h")).distinct()
    val ev = docs.withWatermark(tsCol, watermark)
      .select(col(tsCol).as("__ts"), col(idCol).as("id"), hs(col(textCol)).as("hs"))
      .select(col("__ts"), col("id"),
        size(col("hs")).cast("long").as("n_shingles"),
        explode_outer(col("hs")).as("h"))
    ev.join(refH.withColumn("__hit", lit(1L)), Seq("h"), "left")
      .groupBy(window(col("__ts"), duration).as("w"), col("id"))
      .agg(max(col("n_shingles")).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("hits"))
      .select(col("w.start").as("window_start"), col("id"),
        col("n_shingles"), col("hits"),
        when(col("n_shingles") > 0L,
          col("hits").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"))
  }

  /** PSI of each collected window's bucket counts vs a static reference
    * distribution (e.g. last month's scan): driver-side over bounded
    * (window × bucket) rows, same eps-floored Σ (p−q)·ln(p/q) as the batch
    * [[graft.scan.Drift.psiBuckets]]. Returns (window_start, psi) sorted by
    * window.
    */
  def psiOfWindows(windows: Seq[(java.sql.Timestamp, Long, Long)],
                   refCounts: Seq[Long], eps: Double = 1e-6): Seq[(java.sql.Timestamp, Double)] = {
    val buckets = refCounts.size
    val nRef = refCounts.sum.toDouble
    windows.groupBy(_._1).toSeq.sortBy(_._1.getTime).map { case (ts, rows) =>
      val cur = Array.fill(buckets)(0L)
      rows.foreach { case (_, b, c) => if (b >= 0 && b < buckets) cur(b.toInt) = c }
      val nCur = cur.sum.toDouble
      val psi = (0 until buckets).map { i =>
        val p = math.max(refCounts(i) / nRef, eps)
        val q = math.max(cur(i) / nCur, eps)
        (p - q) * math.log(p / q)
      }.sum
      (ts, psi)
    }
  }

  def sketchDrift(windows: Seq[(java.sql.Timestamp, Seq[Long])], k: Int): Seq[WindowDrift] = {
    import graft.functions.ThetaSketch
    val sketches = windows.sortBy(_._1.getTime)
      .map { case (ts, vals) => (ts, ThetaSketch.fromKmv(vals, k)) }
    sketches.sliding(2).collect { case Seq((_, prev), (ts, cur)) =>
      val union = ThetaSketch.union(prev, cur, k)
      val inter = ThetaSketch.intersection(prev, cur)
      WindowDrift(ts, cur.estimate,
        ThetaSketch.difference(cur, prev).estimate,
        ThetaSketch.difference(prev, cur).estimate,
        if (union.values.isEmpty) 1.0 else inter.estimate / union.estimate)
    }.toSeq
  }
}
