package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A linear quality probe trained INSIDE the engine with full-batch
  * gradient descent in fixed-point integer arithmetic — the
  * integer-PageRank replay discipline applied to model training: every
  * round's state (the weight vector) is a deterministic integer function
  * of the data, so training replays bit-identically in any engine and the
  * DuckDB oracle can verify the whole trajectory, not just a final score.
  *
  * Shape per round (the Lloyd/PageRank discipline): ONE distributed
  * aggregate producing the `dim` gradient sums + the row count, then a
  * bounded driver update of `dim` longs. The corpus is never collected;
  * rounds² work never appears; lineage is per-round flat (the feature
  * frame is materialized once).
  *
  * Numeric contract:
  *  - features are BOUNDED integers (cap them when building the frame);
  *  - weights are fixed-point longs at [[Scale]];
  *  - per-row error `err_fx = x·w − y·Scale` stays in long;
  *  - gradient sums `Σ x_j·err_fx` are accumulated in DECIMAL(38,0)
  *    (Spark) / HUGEINT (DuckDB) — exact and order-independent;
  *  - the update divides with TRUNCATING integer division, which Java
  *    `/`, BigInteger.divide and DuckDB `//` all share.
  *
  * A linear probe over cheap count features is the classic fast quality
  * scorer a curation pipeline trains per-domain (the learned cousin of
  * the C4 heuristics): fit to any available integer signal, then score
  * the full corpus row-locally.
  */
object LinearProbe {

  /** Fixed-point weight scale: w_fx = round(w · Scale). */
  val Scale = 1000000L

  /** Bounded-integer feature frame over documents: x = [bias,
    * min(tokens, 200), min(long-words, 200), min(stopword-hits, 200)],
    * target y capped and scaled to y_fx. Tokenization and caps replay
    * exactly in SQL (the q_quality_filter conventions).
    */
  def featureFrame(df: DataFrame, idCol: String, textCol: String, targetCol: String,
                   stopwords: Seq[String] = TextAnalysis.stopwordsEn,
                   featureCap: Int = 200, targetCap: Int = 2000): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(targetCol).as("__y"),
      TextAnalysis.tokens(col(textCol)).as("__toks")) // pre-projected ONCE
    base.select(
      col("id"),
      array(
        lit(1L),
        least(size(col("__toks")), lit(featureCap)).cast(LongType),
        least(size(filter(col("__toks"), t => length(t) > 6)), lit(featureCap)).cast(LongType),
        least(graft.functions.WordSetHits.hits(col("__toks"), Seq(stopwords)).getItem(0),
          lit(featureCap)).cast(LongType)).as("x"),
      (least(col("__y"), lit(targetCap)).cast(LongType) * Scale).as("y_fx"))
  }

  /** `rounds` of full-batch GD from w = 0: w_j ← w_j − g_j / (n·etaDen)
    * (truncating), g_j = Σ_i x_ij·(x_i·w − y_fx_i). Returns the fixed-point
    * weight trajectory (one array per round, index 0 = after round 1) so
    * callers can audit convergence; the final entry is the model.
    */
  def train(feat: DataFrame, dim: Int, rounds: Int, etaDen: Long): Seq[Array[Long]] = {
    require(rounds >= 1 && dim >= 1 && etaDen >= 1)
    val f = feat.select(col("x"), col("y_fx")).localCheckpoint() // one materialization, flat lineage
    var w = Array.fill(dim)(0L)
    val trajectory = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (_ <- 1 to rounds) {
      val predFx = (0 until dim).map(j => col("x").getItem(j) * lit(w(j))).reduce(_ + _)
      val withErr = f.select(col("x"), (predFx - col("y_fx")).as("e"))
      val aggs = (0 until dim).map(j =>
        sum((col("x").getItem(j) * col("e")).cast(DecimalType(38, 0))).as(s"g$j")) :+
        count(lit(1)).as("n")
      val row = withErr.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = row.getLong(dim)
      require(n > 0, "empty feature frame")
      val den = java.math.BigInteger.valueOf(n * etaDen)
      w = Array.tabulate(dim) { j =>
        val g = row.getDecimal(j).toBigInteger
        w(j) - g.divide(den).longValueExact() // truncating, like DuckDB //
      }
      trajectory += w.clone()
    }
    trajectory.toSeq
  }

  /** Row-local scoring with a trained fixed-point weight vector. */
  def scores(feat: DataFrame, w: Array[Long]): DataFrame =
    feat.select(col("id"),
      w.indices.map(j => col("x").getItem(j) * lit(w(j))).reduce(_ + _).as("pred_fx"))

  /** Exact fixed-point mean squared error of a weight vector (audit /
    * convergence checks): Σ err² as DECIMAL(38,0), divided by n on the
    * driver.
    */
  def lossFx(feat: DataFrame, w: Array[Long]): BigInt = {
    val predFx = w.indices.map(j => col("x").getItem(j) * lit(w(j))).reduce(_ + _)
    val row = feat.select((predFx - col("y_fx")).as("e"))
      // cast BEFORE squaring: err² can exceed long range
      .agg(sum(col("e").cast(DecimalType(38, 0)) * col("e").cast(DecimalType(38, 0))).as("ss"),
        count(lit(1)).as("n"))
      .collect()(0)
    BigInt(row.getDecimal(0).toBigInteger) / BigInt(row.getLong(1))
  }

  /** EXACT ROC-AUC of a scorer against boolean labels — literally the
    * tie-corrected Mann–Whitney AUC with (ref, cur) = (positives,
    * negatives): AUC = P[score(pos) > score(neg)] + ½·ties, the
    * threshold-free ranking quality number. Scores quantize to fx-6 longs
    * (doubled-rank exactness end-to-end); one value-keyed shuffle + the
    * fused two-phase prefix scan ([[graft.scan.Drift.mannWhitneyU]]
    * verbatim — the drift statistic IS the eval statistic).
    *
    * @return one row: (n_pos, n_neg, auc, z) — z vs the AUC=½ null.
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val base = df.select(
        graft.metrics.MetricColumns.fixedPointLong(
          col(scoreCol).cast(DoubleType), 6).as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    graft.scan.Drift.mannWhitneyU(
        base.where(col("__y")), base.where(!col("__y")), "__s")
      .select(col("n_ref").as("n_pos"), col("n_cur").as("n_neg"),
        col("auc"), col("z"))
  }

  /** Precision / recall / F1 at EVERY achievable threshold — the full
    * operating-characteristic table behind "pick the quality cutoff":
    * for each distinct score s (a candidate threshold, predict positive
    * when score ≥ s), TP/FP from the DESCENDING cumulative of the
    * (score, pos, neg) counts frame. Distinct-bounded frame + the
    * [[graft.ops.Binning]] local-window regime (scores are fx-quantized,
    * cardinality-bounded); every metric one fixed double tree over exact
    * longs. NULL rows excluded.
    *
    * @return per distinct score: (threshold_fx, tp, fp, fn, precision,
    *         recall, f1) ordered by threshold_fx descending.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              maxLocalDistinct: Long = 1L << 20): DataFrame =
    prCurveFull(df, scoreCol, labelCol, maxLocalDistinct).drop("__p")

  /** [[prCurve]] keeping the per-threshold positive count `__p` — what
    * [[averagePrecision]] needs to fold the curve WITHOUT a lag window
    * (tp_i − tp_{i−1} = p_i by construction). */
  private[ops] def prCurveFull(df: DataFrame, scoreCol: String,
                               labelCol: String,
                               maxLocalDistinct: Long): DataFrame = {
    val base = df.select(
        graft.metrics.MetricColumns.fixedPointLong(
          col(scoreCol).cast(DoubleType), 6).as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val cells = base.groupBy(col("__s").as("threshold_fx"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__n"))
      // negated key: ascending __k ≡ descending threshold, so the shared
      // ascending-cumulative route serves the descending curve
      .withColumn("__k", -col("threshold_fx"))
      .localCheckpoint(true) // one layout serves the count, totals AND cum
    val distinct = cells.count()
    val totals = broadcast(cells.agg(
      coalesce(sum(col("__p")), lit(0L)).as("__tp_all")))
    // thresholds are distinct-bounded (fx-quantized scores) in the common
    // case — the cheap single-task cumulative; past the MEASURED bound the
    // shared two-phase prefix route (Binning.cumulativesFromCounts), so an
    // adversarial score column can't funnel the curve through one task
    val cum = Binning.cumulativesFromCounts(cells, "__k",
      Seq(col("__p") -> "tp", col("__n") -> "fp"), distinct, maxLocalDistinct)
    cum.crossJoin(totals)
      .select(col("threshold_fx"), col("tp"), col("fp"),
        (col("__tp_all") - col("tp")).as("fn"), col("__p"))
      .withColumn("precision", col("tp").cast(DoubleType) /
        (col("tp") + col("fp")).cast(DoubleType))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0L, col("tp").cast(DoubleType) /
          (col("tp") + col("fn")).cast(DoubleType)))
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          (lit(2L) * col("tp")).cast(DoubleType) /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast(DoubleType)))
      .select(col("threshold_fx"), col("tp"), col("fp"), col("fn"),
        col("precision"), col("recall"), col("f1"), col("__p"))
      .orderBy(col("threshold_fx").desc)
  }

  /** Confusion matrix + derived metrics AT a decision threshold (predict
    * positive when score ≥ t): tp/fp/fn/tn, accuracy, and the Matthews
    * correlation coefficient — the one thresholded single-number that
    * stays honest under class imbalance (accuracy flatters the majority
    * class; MCC needs all four cells, which is why [[prCurve]] — which
    * never sees TN — can't derive it). Threshold compares on fx-6
    * quantized scores (no low-bit flap), all four cells exact longs, MCC
    * numerator/denominator as exact decimals with one final double tree.
    *
    * @return one row: (tp, fp, fn, tn, accuracy, mcc); mcc null when any
    *         marginal is empty (the undefined case).
    */
  def confusionAt(df: DataFrame, scoreCol: String, labelCol: String,
                  threshold: Double): DataFrame = {
    val dec = DecimalType(38, 0)
    val tFx = (if (threshold >= 0) math.floor(threshold * 1e6 + 0.5)
      else -math.floor(-threshold * 1e6 + 0.5)).toLong
    val base = df.select(
        graft.metrics.MetricColumns.fixedPointLong(
          col(scoreCol).cast(DoubleType), 6).as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("__p", col("__s") >= lit(tFx))
    val m = base.agg(
      sum(when(col("__p") && col("__y"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("__p") && !col("__y"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("__p") && col("__y"), 1L).otherwise(0L)).as("fn"),
      sum(when(!col("__p") && !col("__y"), 1L).otherwise(0L)).as("tn"))
    val (tp, fp, fn, tn) = (col("tp").cast(dec), col("fp").cast(dec),
      col("fn").cast(dec), col("tn").cast(dec))
    val num = tp * tn - fp * fn
    val den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    m.select(col("tp"), col("fp"), col("fn"), col("tn"),
      ((col("tp") + col("tn")).cast(DoubleType) /
        (col("tp") + col("fp") + col("fn") + col("tn")).cast(DoubleType))
        .as("accuracy"),
      when(den > 0, num.cast(DoubleType) / sqrt(den.cast(DoubleType)))
        .as("mcc"))
  }

  /** BRIER score: mean squared error of the probability against the 0/1
    * outcome — the PROPER scoring rule that punishes both discrimination
    * AND calibration failures in one number (AUC can't see a constant
    * bias; ECE can't see a useless-but-calibrated scorer; Brier sees
    * both). Scores quantize to fx-6 longs, every (sfx − y·10⁶)² is an
    * exact long, the sum an exact decimal, ONE double division —
    * engine-portable. One 1-row aggregate; NULL rows excluded.
    *
    * @return one row: (n, brier) ∈ [0, 1]; 0 = perfect.
    */
  def brierScore(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.select(
        graft.metrics.MetricColumns.fixedPointLong(
          col(scoreCol).cast(DoubleType), 6).as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val e = col("__s") - when(col("__y"), 1000000L).otherwise(0L)
    base.agg(count(lit(1)).as("n"),
        sum((e.cast(dec) * e.cast(dec))).as("__se"))
      .select(col("n"),
        when(col("n") > 0, col("__se").cast(DoubleType) /
          col("n").cast(DoubleType) / lit(1.0E12)).as("brier"))
  }

  /** AVERAGE PRECISION (area under the PR curve, step form): AP =
    * Σ (recall_i − recall_{i−1})·precision_i over descending thresholds —
    * the single-number PR summary that (unlike ROC-AUC) doesn't flatter
    * scorers on heavily imbalanced labels, i.e. exactly the
    * rare-positive curation setting. Rides [[prCurve]]'s table + one lag
    * over the distinct-bounded thresholds; each step term is one fixed
    * double tree over exact longs, terms quantize through the portable
    * fx-12 long and sum ORDER-FREE (a raw double Σ would be
    * order-dependent).
    *
    * @return one row: (n_pos, n_thresholds, avg_precision).
    */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String,
                       maxLocalDistinct: Long = 1L << 20): DataFrame = {
    val curve = prCurveFull(df, scoreCol, labelCol, maxLocalDistinct)
    val tpAll = col("tp") + col("fn") // constant across rows
    // tp_i − tp_{i−1} IS the row's own positive count p_i (tp is p's
    // descending cumulative), so the step term needs NO lag window at all
    // — the whole fold is one row-local expression + one aggregate,
    // riding prCurve's routed cumulative
    val term = (col("__p").cast(DoubleType) / tpAll.cast(DoubleType)) *
      (col("tp").cast(DoubleType) / (col("tp") + col("fp")).cast(DoubleType))
    curve
      .select(col("tp"), col("fp"), col("fn"),
        graft.metrics.MetricColumns.fixedPointLong(term, 12).as("__t"))
      .agg(max(tpAll).cast(LongType).as("n_pos"),
        count(lit(1)).as("n_thresholds"),
        (sum(col("__t")).cast(DoubleType) / lit(1.0E12)).as("avg_precision"))
  }

  /** CALIBRATION table (reliability diagram): equal-width score buckets ×
    * (count, mean predicted score, observed positive rate, |gap|·weight
    * ECE contribution) — does a 0.9 from this scorer actually mean 90%?
    * An uncalibrated quality probe silently skews every downstream
    * mixture/threshold decision; the per-bucket |gap| is the audit, and
    * Σ ece_term = the expected calibration error.
    *
    * Exactness: scores quantize to fx-6 longs BEFORE bucketing (floor of
    * an exact integer ratio — the bucket edge can't flap on a low bit),
    * per-bucket sums/counts are exact integers, and the three derived
    * doubles follow fixed trees — engine-portable. One bucket-bounded
    * aggregate; NULL score/label rows are excluded.
    *
    * @param scoreCol a [0, 1]-ish prediction; values clamp into
    *                 [0, buckets−1] at the edges.
    * @return per non-empty bucket: (bucket, n, mean_score, pos_rate,
    *         ece_term) ordered by bucket.
    */
  def calibrationTable(df: DataFrame, scoreCol: String, labelCol: String,
                       buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val dec = DecimalType(38, 0)
    val sFx = graft.metrics.MetricColumns.fixedPointLong(
      col(scoreCol).cast(DoubleType), 6)
    val base = df.select(sFx.as("__s"), col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      // integer bucket edge: floor(sfx·B / 10^6), clamped — no double ever
      .withColumn("__b", least(greatest(
        expr(s"(__s * ${buckets}L) div 1000000L"), lit(0L)),
        lit(buckets.toLong - 1)))
    val total = base.agg(count(lit(1)).cast(dec).as("__n"))
    base.groupBy("__b")
      .agg(count(lit(1)).as("n"),
        sum(col("__s").cast(dec)).as("__ss"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
      .crossJoin(broadcast(total))
      .select(col("__b").as("bucket"), col("n"),
        (col("__ss").cast(DoubleType) / col("n").cast(DoubleType) /
          lit(1000000.0)).as("mean_score"),
        (col("__pos").cast(DoubleType) / col("n").cast(DoubleType)).as("pos_rate"),
        (abs(col("__ss").cast(DoubleType) / col("n").cast(DoubleType) /
          lit(1000000.0) -
          col("__pos").cast(DoubleType) / col("n").cast(DoubleType)) *
          (col("n").cast(DoubleType) / col("__n").cast(DoubleType)))
          .as("ece_term"))
      .orderBy("bucket")
  }

  /** PAV isotonic calibration (pool-adjacent-violators, Ayer et al. 1955 /
    * Zadrozny & Elkan 2002) — the MONOTONE recalibration map that turns a
    * well-RANKING but badly-CALIBRATED scorer into probabilities:
    * [[calibrationTable]]/[[brierScore]] DIAGNOSE miscalibration, this
    * FIXES it without touching the ranking (isotonic regression is the
    * nonparametric step past Platt scaling).
    *
    * Distributed shape (the measured-route discipline): per-distinct-score
    * (n, positives) aggregate; when distinct scores exceed `maxBins` they
    * pre-bin EQUI-DEPTH through the cardinality-routed cumulative
    * ([[Binning]]); the PAV merge itself is inherently sequential and runs
    * on the ≤ maxBins driver rows with EXACT rational pool comparisons
    * (cross-multiplied longs — no float rates until output).
    *
    * @return monotone step table ordered by score: (score_lo, score_hi,
    *         n, pos, rate) — rate strictly increasing across rows.
    */
  def isotonicCalibrate(df: DataFrame, scoreCol: String, labelCol: String,
                        maxBins: Int = 1024): DataFrame = {
    require(maxBins >= 2, "maxBins must be >= 2")
    val sFx = graft.metrics.MetricColumns.fixedPointLong(
      col(scoreCol).cast(DoubleType), 6)
    val base = df.select(sFx.as("__s"), col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val perScore = base.groupBy("__s").agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
      .localCheckpoint(true) // serves the count and whichever route wins
    val distinct = perScore.count()
    val rows: Array[(Long, Long, Long, Long)] = // (sLo, sHi, n, pos)
      if (distinct <= maxBins)
        perScore.collect()
          .map(r => (r.getLong(0), r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
      else {
        val cum = Binning.cumulativeFromCounts(
          perScore.select(col("__s").as("v"), col("n").as("c")),
          distinct, 1L << 20)
        val totalN = base.count()
        cum.join(perScore.select(col("__s").as("v"), col("pos")), Seq("v"))
          .withColumn("__bin", expr(s"((cum - 1) * ${maxBins}L) div ${totalN}L"))
          .groupBy("__bin").agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
            sum(col("c")).cast("long").as("n"), sum(col("pos")).cast("long").as("pos"))
          .collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .sortBy(_._1)
      }
    // PAV: merge while the previous pool's rate is >= the current one —
    // exact cross-multiplied comparison, so ties merge deterministically
    // and the output rates are STRICTLY increasing
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    rows.foreach { r =>
      pools += r
      while (pools.length >= 2 && {
        val p = pools(pools.length - 2); val c = pools.last
        BigInt(p._4) * c._3 >= BigInt(c._4) * p._3
      }) {
        val c = pools.remove(pools.length - 1)
        val p = pools.remove(pools.length - 1)
        pools += ((p._1, c._2, p._3 + c._3, p._4 + c._4))
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    pools.toSeq.toDF("__lo", "__hi", "n", "pos")
      .select((col("__lo").cast(DoubleType) / lit(1e6)).as("score_lo"),
        (col("__hi").cast(DoubleType) / lit(1e6)).as("score_hi"),
        col("n"), col("pos"),
        (col("pos").cast(DoubleType) / col("n").cast(DoubleType)).as("rate"))
      .orderBy("score_lo")
  }

  /** Row-local application of an [[isotonicCalibrate]] table: adds
    * `calibrated` = the rate of the LAST pool whose score_lo ≤ score
    * (scores below the first pool clamp to its rate) — the step-function
    * lookup bound as literal arrays (tables are ≤ maxBins rows), evaluated
    * by codegen'd HOFs with zero shuffle.
    */
  def applyCalibration(df: DataFrame, scoreCol: String,
                       table: DataFrame): DataFrame = {
    val t = table.select("score_lo", "rate").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    require(t.nonEmpty, "empty calibration table")
    val los = array(t.map(p => lit(p._1)): _*)
    val rates = array(t.map(p => lit(p._2)): _*)
    val s = col(scoreCol).cast(DoubleType)
    df.withColumn("calibrated",
      element_at(rates, greatest(lit(1), size(filter(los, x => x <= s)))))
  }

  /** Expected calibration error — the SCALAR verdict over
    * [[calibrationTable]]'s reliability diagram (the number a model card
    * quotes): ECE = Σ_b (n_b/N)·|acc_b − conf_b|.
    *
    * Exactness: per bucket |acc−conf|·n_b = |pos_b·10⁶ − Σs_fx|/10⁶ — the
    * numerator is an EXACT integer (micro fixed-point scores, integer
    * positives), so the bucket terms sum order-free and
    * ECE = Σ|pos·10⁶ − ss| / (N·10⁶) is ONE final tree. Same integer
    * bucket edges as [[calibrationTable]].
    *
    * @return one row: (n, buckets_used, num (exact Σ|·| as double), ece).
    */
  def expectedCalibrationError(df: DataFrame, scoreCol: String,
                               labelCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val dec = DecimalType(38, 0)
    val sFx = graft.metrics.MetricColumns.fixedPointLong(
      col(scoreCol).cast(DoubleType), 6)
    val base = df.select(sFx.as("__s"), col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .withColumn("__b", least(greatest(
        expr(s"(__s * ${buckets}L) div 1000000L"), lit(0L)),
        lit(buckets.toLong - 1)))
    val perB = base.groupBy("__b")
      .agg(count(lit(1)).as("n"),
        sum(col("__s").cast(dec)).as("ss"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("pos"))
    perB.agg(sum(col("n")).as("n"), count(lit(1)).as("buckets_used"),
        sum(abs(col("pos").cast(dec) * lit(1000000L).cast(dec) - col("ss")))
          .as("__num"))
      .select(col("n"), col("buckets_used"),
        col("__num").cast(DoubleType).as("num"),
        (col("__num").cast(DoubleType) / col("n").cast(DoubleType) /
          lit(1000000.0)).as("ece"))
  }

  /** Label-noise screen (confident-learning-lite) — the curation pass
    * that catches MISLABELED rows before they poison a training set: with
    * per-class mean-score thresholds t₁/t₀, a negative scoring strictly
    * above t₁ (or a positive strictly below t₀) is flagged as likely
    * mislabeled. The full confident-learning machinery estimates a joint
    * noise matrix; the class-threshold rule is its deterministic core and
    * is exactly computable.
    *
    * Exactness: micro-fx scores make each threshold comparison an integer
    * cross-multiplication (s·n₁ > Σs₁ — no division anywhere), so the
    * flag set and all counts are engine-exact; the reported thresholds
    * and rate are final-tree doubles. Two grouped aggregates (class
    * moments broadcast back), no window.
    *
    * @return one row: (n, n_pos, n_neg, t_pos, t_neg, flagged_neg_high,
    *         flagged_pos_low, noise_rate).
    */
  def labelNoiseStats(df: DataFrame, scoreCol: String,
                      labelCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val sFx = graft.metrics.MetricColumns.fixedPointLong(
      col(scoreCol).cast(DoubleType), 6)
    val base = df.select(sFx.as("__s"), col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true) // serves the moment pass AND the flag pass
    val m = base.agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("__y"), col("__s")).otherwise(0L).cast(dec)).as("s1"),
      sum(when(!col("__y"), 1L).otherwise(0L)).as("n0"),
      sum(when(!col("__y"), col("__s")).otherwise(0L).cast(dec)).as("s0"))
    val flags = base.crossJoin(broadcast(m))
      .agg(max(col("n1")).as("n1"), max(col("n0")).as("n0"),
        max(col("s1")).as("s1"), max(col("s0")).as("s0"),
        sum(when(!col("__y") && col("n1") > 0L &&
          col("__s").cast(dec) * col("n1").cast(dec) > col("s1"), 1L)
          .otherwise(0L)).as("flagged_neg_high"),
        sum(when(col("__y") && col("n0") > 0L &&
          col("__s").cast(dec) * col("n0").cast(dec) < col("s0"), 1L)
          .otherwise(0L)).as("flagged_pos_low"))
    val n = col("n1") + col("n0")
    flags.select(n.as("n"), col("n1").as("n_pos"), col("n0").as("n_neg"),
      when(col("n1") > 0L, col("s1").cast(DoubleType) /
        col("n1").cast(DoubleType) / lit(1e6)).as("t_pos"),
      when(col("n0") > 0L, col("s0").cast(DoubleType) /
        col("n0").cast(DoubleType) / lit(1e6)).as("t_neg"),
      col("flagged_neg_high"), col("flagged_pos_low"),
      ((col("flagged_neg_high") + col("flagged_pos_low")).cast(DoubleType) /
        n.cast(DoubleType)).as("noise_rate"))
  }

  /** Decile lift / cumulative-gains table — the targeting-eval view of a
    * scorer ([[rocAuc]] summarizes ranking in one number; lift says "the
    * top decile captures X× its share of positives", the number a
    * selection/curation pipeline actually acts on).
    *
    * Scale shape: rows roll up per DISTINCT score (bounded for fixed-point
    * scorers — the micro-fx score grid), a descending cumulative assigns
    * each distinct score the bucket of its FIRST row
    * (⌊rank_before·B/N⌋ — ties share a bucket, so bucket sizes wobble by
    * tie mass; deterministic, no per-row tiebreak needed), then one
    * grouped aggregate per bucket. Exact integer counts throughout; rate,
    * lift and gain are fixed double trees.
    *
    * @return per bucket: (bucket, n, pos, rate, lift, cum_pos, cum_gain).
    */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val sFx = graft.metrics.MetricColumns.fixedPointLong(
      col(scoreCol).cast(DoubleType), 6)
    val perScore = df.select(sFx.as("__s"), col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy("__s")
      .agg(count(lit(1)).as("c"), sum(when(col("__y"), 1L).otherwise(0L)).as("p"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    val ranked = perScore
      .withColumn("__k", sum(col("c")).over(w) - col("c"))
      .withColumn("__n", sum(col("c")).over(wAll))
      .withColumn("__tp", sum(col("p")).over(wAll))
      .withColumn("bucket", expr(s"(__k * ${buckets}L) div __n"))
    val perBucket = ranked.groupBy("bucket", "__n", "__tp")
      .agg(sum("c").as("n"), sum("p").as("pos"))
    val wB = org.apache.spark.sql.expressions.Window
      .orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBucket
      .withColumn("cum_pos", sum(col("pos")).over(wB))
      .select(col("bucket"), col("n"), col("pos"),
        (col("pos").cast(DoubleType) / col("n").cast(DoubleType)).as("rate"),
        when(col("__tp") > 0L,
          col("pos").cast(DoubleType) * col("__n").cast(DoubleType) /
            (col("n").cast(DoubleType) * col("__tp").cast(DoubleType)))
          .as("lift"),
        col("cum_pos"),
        when(col("__tp") > 0L,
          col("cum_pos").cast(DoubleType) / col("__tp").cast(DoubleType))
          .as("cum_gain"))
      .orderBy("bucket")
  }
}
