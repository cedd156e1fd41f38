package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-row consistency audits — the data-quality checks one step past the
  * reference's per-column metrics: functional dependencies / candidate
  * keys, and ordering invariants. All single-shuffle aggregates; violation
  * COUNTS come back to the driver, violating ROWS stay distributed (fetch
  * them with the returned predicates only when needed).
  */
object Constraints {

  /** Audit functional dependencies `lhs → rhs`: for each, how many distinct
    * lhs groups exist, how many have >1 distinct rhs (violating groups),
    * and how many rows sit in violating groups. A key check is the FD
    * `key → all other columns`; `uniqueness` of the reference is the FD
    * `col → ()` special case.
    *
    * One `groupBy(lhs)` shuffle per FD (map-side combined; the per-group
    * state is a count + a distinct count). FDs over the same lhs share a
    * single pass.
    *
    * NULL semantics (deliberate): a NULL rhs value IS a value — the rhs
    * tuple is counted via a struct, so a group holding {'x', NULL} has two
    * distinct rhs values and violates the FD, and a group holding only
    * NULLs is consistent. This is the useful audit reading ("do all rows of
    * this key agree?"); plain `count(DISTINCT col)` would skip NULLs and
    * silently bless mixed NULL/value groups. The oracle counts
    * `row(...)`-wrapped tuples for the same reason.
    */
  def fdCheck(df: DataFrame, fds: Seq[(Seq[String], Seq[String])]): DataFrame = {
    require(fds.nonEmpty, "need at least one FD")
    val frames = fds.groupBy(_._1).toSeq.sortBy(_._1.mkString(",")).map { case (lhs, group) =>
      val distinctAggs = group.zipWithIndex.map { case ((_, rhs), i) =>
        count_distinct(struct(rhs.map(col): _*)).as(s"d_$i")
      }
      val grouped = df.groupBy(lhs.map(col): _*)
        .agg(count(lit(1)).as("n"), distinctAggs: _*)
      // ONE re-aggregate computes every FD of this lhs; inline unpivots the
      // single stat row to one output row per FD (no repeated scans)
      val statAggs = count(lit(1)).as("lhs_groups") +:
        group.indices.flatMap { i => Seq(
          sum(when(col(s"d_$i") > 1, 1L).otherwise(0L)).cast(LongType).as(s"vg_$i"),
          coalesce(sum(when(col(s"d_$i") > 1, col("n"))), lit(0L)).cast(LongType).as(s"vr_$i"))
        }
      grouped.agg(statAggs.head, statAggs.tail: _*)
        .select(inline(array(group.zipWithIndex.map { case ((_, rhs), i) =>
          struct(
            lit(s"${lhs.mkString(",")}->${rhs.mkString(",")}").as("fd"),
            col("lhs_groups").as("lhs_groups"),
            col(s"vg_$i").as("violating_groups"),
            col(s"vr_$i").as("violating_rows"))
        }: _*)))
    }
    frames.reduce(_.unionAll(_))
  }

  /** Referential-integrity audit `child.fk ⊆ parent.pk` — the cross-TABLE
    * counterpart of [[fdCheck]]: one row per audit with the child row
    * count, rows whose fk has any NULL component (excluded from orphan
    * counting, SQL FK semantics), orphan rows (non-null fk with no parent
    * match) and distinct orphan keys.
    *
    * Shape: the child projects ONLY the fk columns into the join (skinny),
    * the parent side is its distinct pk projection — AQE broadcasts it when
    * small, else both sides shuffle on the key; one aggregate after. The
    * audit never moves child payload columns.
    */
  def foreignKeyAudit(child: DataFrame, fkCols: Seq[String],
                      parent: DataFrame, pkCols: Seq[String],
                      label: String = null): DataFrame = {
    require(fkCols.nonEmpty && fkCols.size == pkCols.size,
      "fk and pk column lists must be non-empty and same-length")
    val p = parent.select(pkCols.map(col): _*).distinct()
      .select(pkCols.indices.map(i => col(pkCols(i)).as(s"__pk$i")): _*)
      .withColumn("__present", lit(1))
    val fkNull = fkCols.map(col(_).isNull).reduce(_ || _)
    val cond = fkCols.indices.map(i => col(fkCols(i)) === col(s"__pk$i")).reduce(_ && _)
    child.select(fkCols.map(col): _*)
      .join(p, cond, "left")
      .agg(
        count(lit(1)).as("child_rows"),
        sum(when(fkNull, 1L).otherwise(0L)).cast(LongType).as("null_fk_rows"),
        sum(when(!fkNull && col("__present").isNull, 1L).otherwise(0L))
          .cast(LongType).as("orphan_rows"),
        count_distinct(when(!fkNull && col("__present").isNull,
          struct(fkCols.map(col): _*))).as("orphan_keys"))
      .select(
        lit(Option(label).getOrElse(s"${fkCols.mkString(",")}->${pkCols.mkString(",")}")).as("fk"),
        col("child_rows"), col("null_fk_rows"), col("orphan_rows"), col("orphan_keys"))
  }

  /** APPROXIMATE-FD strength (Kivinen–Mannila g3): the minimum fraction of
    * rows to DELETE for `lhs → rhs` to hold exactly —
    * g3 = (n − Σ_groups max-agreeing-rhs-count) / n. Where [[fdCheck]]
    * counts violating groups, g3 says how CLOSE the dependency is ("custkey
    * determines priority for 97% of rows") — the right metric for noisy
    * real data where exact FDs never hold.
    *
    * Shape: one groupBy(lhs, rhs) count (map-side combined), a max_by
    * re-aggregate per lhs, one 1-row aggregate — all skinny. The ratio is
    * one division of exact longs.
    */
  def fdStrength(df: DataFrame, fds: Seq[(Seq[String], Seq[String])]): DataFrame = {
    require(fds.nonEmpty, "need at least one FD")
    val frames = fds.map { case (lhs, rhs) =>
      val cells = df.groupBy((lhs ++ rhs).map(col): _*).agg(count(lit(1)).as("__c"))
      val maxPer = cells.groupBy(lhs.map(col): _*).agg(max(col("__c")).as("__m"))
      maxPer.agg(
        sum(col("__m")).cast(LongType).as("kept"),
        count(lit(1)).as("lhs_groups"))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n"))))
        .select(
          lit(s"${lhs.mkString(",")}->${rhs.mkString(",")}").as("fd"),
          col("n"), col("lhs_groups"), col("kept"),
          (col("n") - col("kept")).cast(LongType).as("violating_rows"),
          when(col("n") > 0L,
            (col("n") - col("kept")).cast(DoubleType) / col("n").cast(DoubleType)).as("g3"))
    }
    frames.reduce(_.unionAll(_))
  }

  /** True iff `cols` form a candidate key (no lhs group has more than one
    * row). Cheaper than [[fdCheck]] with every other column on the rhs —
    * key-ness only needs group sizes.
    */
  def isKey(df: DataFrame, cols: Seq[String]): Boolean =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(1).count() == 0

  /** Benford first-significant-digit probabilities log10(1 + 1/d), d=1..9,
    * as FIXED double literals (not computed via log10 at runtime): the
    * oracle SQL embeds the identical literals, so expected counts and the
    * chi-square tree are bit-identical across engines regardless of either
    * engine's log10 rounding.
    */
  val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124, 3 -> 0.12493873660829992,
    4 -> 0.09691001300805642, 5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129, 9 -> 0.04575749056067514)

  /** Benford's-law first-digit audit — the fraud/synthetic-data smell test
    * for naturally-occurring amounts (prices, balances, populations): the
    * distribution of first significant digits should follow
    * P(d) = log10(1+1/d). Emits 9 rows per audited column — (col_name,
    * digit, observed, n, share, benford_p, chi2_term, chi2) — where `chi2`
    * is Pearson's statistic over the 9 digit cells (compare to the
    * chi-square(8) critical value of choice; 20.09 at p=0.01).
    *
    * Cross-engine exactness: values go through the portable fixed-point
    * long ([[graft.metrics.MetricColumns.fixedPointLong]] at the given
    * per-column scale); the first digit is then `substr(cast(abs(v) as
    * string), 1, 1)` — integer-to-string is exact on every engine, dodging
    * the log10/power float path entirely. Zeros and NULLs are excluded.
    * chi2 folds the 9 per-digit terms LEFT-ASSOCIATIVELY (d=1..9) with the
    * literal [[BenfordP]] constants, so the doubles replay bit-for-bit.
    *
    * Shape: ONE aggregate pass computes all columns' 9+1 conditional
    * counts (no groupBy shuffle — a 1-row exchange), then a row-local
    * inline unpivots to the per-digit frame. Scales to any row count; the
    * state is 10 longs per audited column.
    */
  /** First significant digit of the scale-`s` fixed-point form of `c`, or
    * NULL for NULL/zero values — the shared classifier of the batch
    * [[benfordAudit]] and the streaming per-window audit.
    */
  private[graft] def benfordDigit(c: Column, s: Int): Column = {
    import graft.metrics.MetricColumns.fixedPointLong
    val v = fixedPointLong(c.cast(DoubleType), s)
    when(v.isNotNull && v =!= 0L,
      substring(abs(v).cast(StringType), 1, 1).cast(IntegerType))
  }

  /** Pearson chi2 vs the [[BenfordP]] literals — left-fold of the 9 digit
    * terms in d = 1..9 order, the SAME association as the oracle SQL, so
    * the double replays bit-for-bit wherever the counts are exact.
    */
  private[graft] def benfordChi2(n: Column, obs: Int => Column): Column = {
    val nd = n.cast(DoubleType)
    BenfordP.map { case (d, p) =>
      val o = obs(d).cast(DoubleType)
      val e = nd * lit(p)
      (o - e) * (o - e) / e
    }.reduce(_ + _)
  }

  def benfordAudit(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    require(cols.nonEmpty, "need at least one (column, scale)")
    // digits are pre-projected ONCE beneath the aggregate: Spark does no
    // CSE across aggregate functions, so inlining the fixed-point +
    // to-string digit expression into all 10 conditional counts would
    // evaluate it 10× per row (measured 3× query cost at sf0.1)
    val pre = df.select(cols.zipWithIndex.map { case ((c, s), i) =>
      benfordDigit(col(c), s).as(s"__dg_$i")
    }: _*)
    val aggs = cols.indices.flatMap { i =>
      val dg = col(s"__dg_$i")
      sum(when(dg.isNotNull, 1L).otherwise(0L)).cast(LongType).as(s"n_$i") +:
        (1 to 9).map(d => sum(when(dg === d, 1L).otherwise(0L)).cast(LongType).as(s"c_${i}_$d"))
    }
    val one = pre.agg(aggs.head, aggs.tail: _*)
    // chi2 (a 9-term fold of already-large terms) is pre-projected ONCE per
    // column: inlining it into each of the 9 digit structs × columns blew
    // janino's 64 KB method limit at 2 columns (the one-row Generate then
    // ran interpreted — harmless here but a silent codegen fallback the
    // health gate now flags). Referenced 9× by non-cheap consumers, so
    // CollapseProject leaves the alias alone.
    val withChi2 = one.select(col("*") +: cols.indices.map { i =>
      // left-fold of the 9 chi2 terms, d = 1..9 — same association in SQL
      when(col(s"n_$i") > 0L, benfordChi2(col(s"n_$i"), d => col(s"c_${i}_$d")))
        .as(s"__chi2_$i")
    }: _*)
    val rows = cols.zipWithIndex.flatMap { case ((c, _), i) =>
      val n = col(s"n_$i")
      val nd = n.cast(DoubleType)
      BenfordP.map { case (d, p) =>
        val o = col(s"c_${i}_$d")
        struct(
          lit(c).as("col_name"), lit(d).as("digit"), o.as("observed"), n.as("n"),
          when(n > 0L, o.cast(DoubleType) / nd).as("share"),
          lit(p).as("benford_p"),
          when(n > 0L, (o.cast(DoubleType) - nd * lit(p)) * (o.cast(DoubleType) - nd * lit(p)) / (nd * lit(p))).as("chi2_term"),
          col(s"__chi2_$i").as("chi2"))
      }
    }
    withChi2.select(inline(array(rows: _*)))
  }

  /** Co-missingness matrix — do columns go NULL *together*? Per unordered
    * column pair: row count, each side's null count, both-null count, the
    * jaccard of the two null sets (1.0 = always missing together) and the
    * lift P(both null) / (P(a null)·P(b null)) (≈1 independent, ≫1
    * correlated — the "one upstream join failed and wiped both fields"
    * smell). The pair grain is what per-column missing_count (#3) can't
    * see.
    *
    * ONE aggregate pass computes all |cols| null counts + all pairs'
    * both-null counts (1-row exchange, no shuffle); a row-local inline
    * unpivots to the pair frame. State is O(|cols|²) longs — audit column
    * sets, not thousand-column frames.
    */
  /** Per-column categorical CONCENTRATION profile: Shannon entropy (nats)
    * + the two "effective number of categories" readings — exp(H)
    * (perplexity) and inverse-Simpson n²/Σc² — for each listed column.
    * The corpus-composition diagnostic raw distinct counts flatter: a
    * column with 1000 distinct values where one holds 99% of rows has
    * ~1 EFFECTIVE category, and a mixture sampler keyed on it is broken.
    *
    * One groupBy per column over its (value, count) cells (map-side
    * combined, category-bounded output); Σc² and n are exact decimals
    * (inverse-Simpson is one exact-integer double tree), entropy terms
    * quantize through the portable fx-9 long and sum order-free (the
    * mutualInfo discipline). NULLs form their own category only when
    * `countNulls` (default false → excluded).
    *
    * @return one row per column: (column, n, categories, entropy,
    *         eff_exp_h, eff_simpson).
    */
  def categoryEntropy(df: DataFrame, cols: Seq[String],
                      countNulls: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    import graft.metrics.MetricColumns
    val dec = DecimalType(38, 0)
    val frames = cols.map { c =>
      val base = if (countNulls) df.select(col(c).cast("string").as("__v"))
        else df.select(col(c).cast("string").as("__v")).where(col("__v").isNotNull)
      val cells = base.groupBy("__v").agg(count(lit(1)).as("__c"))
      val nF = cells.agg(coalesce(sum(col("__c")), lit(0L)).cast(dec).as("__n"))
      val nd = col("__n").cast(DoubleType)
      val cd = col("__c").cast(DoubleType)
      val withN = cells.crossJoin(broadcast(nF))
      withN.select(col("__c"), col("__n"),
          MetricColumns.fixedPointLong(-(cd / nd) * log(cd / nd), 9).as("__t"))
        .agg(
          max(col("__n")).as("nn"),
          count(lit(1)).as("categories"),
          coalesce(sum(col("__t")), lit(0L)).cast(LongType).as("hfx"),
          coalesce(sum(col("__c").cast(dec) * col("__c")), lit(0L).cast(dec)).as("c2"))
        .select(
          lit(c).as("column"),
          col("nn").cast(LongType).as("n"),
          col("categories"),
          (col("hfx").cast(DoubleType) / lit(1000000000.0)).as("entropy"),
          exp(col("hfx").cast(DoubleType) / lit(1000000000.0)).as("eff_exp_h"),
          when(col("c2") > 0,
            (col("nn") * col("nn")).cast(DoubleType) / col("c2").cast(DoubleType))
            .as("eff_simpson"))
    }
    frames.reduce(_.unionAll(_))
  }

  def coMissingness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    val aggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast(LongType).as(s"na_$c")) ++
      pairs.map { case (a, b) =>
        sum(when(col(a).isNull && col(b).isNull, 1L).otherwise(0L))
          .cast(LongType).as(s"nb_${a}__$b")
      }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      val na = col(s"na_$a"); val nb = col(s"na_$b"); val both = col(s"nb_${a}__$b")
      val union = na + nb - both
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        na.as("null_a"), nb.as("null_b"), both.as("both_null"),
        when(union > 0L, both.cast(DoubleType) / union.cast(DoubleType)).as("null_jaccard"),
        when(na > 0L && nb > 0L,
          (both.cast(DoubleType) * col("n").cast(DoubleType)) /
            (na.cast(DoubleType) * nb.cast(DoubleType))).as("lift"))
    }
    one.select(inline(array(rows: _*)))
  }

  /** Per-event-time-window [[coMissingness]] — the continuous form of the
    * audit ("did an upstream deploy start wiping these fields together this
    * hour"). Same pair statistics and the same jaccard/lift trees, computed
    * per tumbling window; `watermark` = Some(delay) makes it a streaming
    * aggregation (append-safe), None runs the identical plan on a batch
    * frame (backfill parity — spec-asserted against the batch audit on
    * each window's slice).
    */
  def coMissingnessWindowed(df: DataFrame, tsCol: String, duration: String,
                            watermark: Option[String],
                            cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    val aggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast(LongType).as(s"na_$c")) ++
      pairs.map { case (a, b) =>
        sum(when(col(a).isNull && col(b).isNull, 1L).otherwise(0L))
          .cast(LongType).as(s"nb_${a}__$b")
      }
    val src = watermark.map(w => df.withWatermark(tsCol, w)).getOrElse(df)
    val one = src.groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("n"), aggs: _*)
    val rows = pairs.map { case (a, b) =>
      val na = col(s"na_$a"); val nb = col(s"na_$b"); val both = col(s"nb_${a}__$b")
      val union = na + nb - both
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        na.as("null_a"), nb.as("null_b"), both.as("both_null"),
        when(union > 0L, both.cast(DoubleType) / union.cast(DoubleType)).as("null_jaccard"),
        when(na > 0L && nb > 0L,
          (both.cast(DoubleType) * col("n").cast(DoubleType)) /
            (na.cast(DoubleType) * nb.cast(DoubleType))).as("lift"))
    }
    one.select(col("w.start").as("window_start"), inline(array(rows: _*)))
  }

  /** Persist an [[inferTypes]] audit as a parquet artifact — the reference
    * side of [[typeDrift]] (the save-once/compare-many pattern of the PSI
    * reference and the LM/quantizer artifacts).
    */
  def saveTypeAudit(df: DataFrame, cols: Seq[String], path: String,
                    threshold: Double = 0.99): Unit =
    inferTypes(df, cols, threshold).write.mode("overwrite").parquet(path)

  /** Inferred-type DRIFT vs a persisted audit: re-infer each column's
    * tightest parse type and compare against the reference run — the
    * "upstream started sending floats into an int column" alarm schema
    * checks can't raise on stringly-typed feeds (the declared type never
    * changed; the CONTENT did). Columns added since the reference carry a
    * NULL ref_type and flag as drifted.
    *
    * @return (col_name, ref_type, cur_type, drifted).
    */
  def typeDrift(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
                cols: Seq[String], refPath: String,
                threshold: Double = 0.99): DataFrame = {
    val ref = spark.read.parquet(refPath)
      .select(col("col_name"), col("suggested").as("ref_type"))
    inferTypes(df, cols, threshold)
      .select(col("col_name"), col("suggested").as("cur_type"))
      .join(ref, Seq("col_name"), "left")
      .select(col("col_name"), col("ref_type"), col("cur_type"),
        (col("ref_type").isNull || col("ref_type") =!= col("cur_type")).as("drifted"))
  }

  /** Candidate-type patterns for [[inferTypes]], tightest first — anchored,
    * RE2-and-Java-compatible (no lookaround, explicit classes), shared
    * verbatim with the oracle SQL so both engines classify identically.
    */
  val TypePatterns: Seq[(String, String)] = Seq(
    "boolean" -> "^([Tt][Rr][Uu][Ee]|[Ff][Aa][Ll][Ss][Ee])$",
    "bigint" -> "^[+-]?[0-9]{1,18}$",
    "double" -> "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$",
    "date" -> "^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "timestamp" -> "^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?$",
    "uuid" -> "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "email" -> "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")

  /** Schema-mining audit for stringly-typed ingests (CSV landings, JSON
    * props): per string column, how many non-null values parse as each
    * candidate type, and the TIGHTEST type covering ≥ `threshold` of them
    * (precedence = [[TypePatterns]] order; `string` when none qualifies).
    * The "this varchar column is actually a date" report that drives
    * schema tightening before the 100-TB rewrite.
    *
    * Row-local anchored-regex classification + ONE fused aggregate for all
    * columns (1-row exchange), inline unpivot after. The threshold compare
    * is `cast(count as double) >= threshold · cast(n_values as double)` —
    * one multiply, engine-exact.
    */
  def inferTypes(df: DataFrame, cols: Seq[String], threshold: Double = 0.99): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    // ONE native one-pass classifier call per (row, column) — the bitmask
    // pre-projects beneath the aggregate (the preProjection discipline:
    // Spark does no CSE across aggregate functions, so the 7 bit-tests
    // must share one computed mask, not re-classify 7×). The regex
    // formulation ([[inferTypesRegex]]) is the spec'd-equivalent oracle
    // twin; this path cuts the per-row cost ~7× (measured 2.3 → 0.7 s for
    // 8 columns × 150k rows at sf0.1).
    val masked = df.select(cols.zipWithIndex.map { case (c, i) =>
      graft.functions.TypeMask.mask(col(c)).as(s"m_$i") }: _*)
    val aggs = cols.indices.flatMap { i =>
      sum(when(col(s"m_$i").isNotNull, 1L).otherwise(0L)).cast(LongType).as(s"nv_$i") +:
        TypePatterns.zipWithIndex.map { case ((tn, _), b) =>
          sum(when(shiftright(col(s"m_$i"), b).bitwiseAND(1) === 1, 1L)
            .otherwise(0L)).cast(LongType).as(s"c_${i}_$tn")
        }
    }
    val one = masked.agg(aggs.head, aggs.tail: _*)
    finishInferTypes(one, cols, threshold)
  }

  /** The anchored-regex formulation of [[inferTypes]] — semantically
    * identical (property-spec'd against the native classifier), kept as
    * the cross-check twin.
    */
  def inferTypesRegex(df: DataFrame, cols: Seq[String], threshold: Double = 0.99): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).cast(LongType).as(s"nv_$i") +:
        TypePatterns.map { case (tn, re) =>
          sum(when(col(c).rlike(re), 1L).otherwise(0L)).cast(LongType).as(s"c_${i}_$tn")
        }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    finishInferTypes(one, cols, threshold)
  }

  private def finishInferTypes(one: DataFrame, cols: Seq[String],
                               threshold: Double): DataFrame = {
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val nv = col(s"nv_$i")
      val suggested = TypePatterns.reverse.foldLeft(lit("string")) { case (acc, (tn, _)) =>
        when(nv > 0L &&
          col(s"c_${i}_$tn").cast(DoubleType) >= lit(threshold) * nv.cast(DoubleType),
          lit(tn)).otherwise(acc)
      }
      struct(
        (lit(c).as("col_name") +: nv.as("n_values") +:
          TypePatterns.map { case (tn, _) => col(s"c_${i}_$tn").as(s"n_$tn") }) :+
          suggested.as("suggested"): _*)
    }
    one.select(inline(array(rows: _*)))
  }

  /** Ordering-invariant audit: within each `partCols` group ordered by
    * `orderCol`, count positions where `valueCol` moves the wrong way
    * (strictly decreases for `ascending = true`). The event-log sanity
    * check: "are timestamps monotone per user/session?" One window pass —
    * shuffled by the partition columns, never a global order.
    *
    * @return per-group (partCols…, n_rows, regressions); groups with 0
    *         regressions included (the healthy majority is the signal that
    *         the check ran).
    */
  /** DECLARED-schema diff between two frames — the metadata complement of
    * [[typeDrift]] (which audits what the DATA looks like): columns added,
    * dropped, or type-changed between two dumps of "the same" table, the
    * first thing to check when a downstream job starts failing after a
    * producer deploy. Pure metadata — runs on the driver from the two
    * StructTypes, NO Spark job, O(#columns).
    *
    * @return (column, change ∈ added|dropped|type_changed, before_type,
    *         after_type) rows, ordered by column name; empty when schemas
    *         match (nullability ignored — parquet round-trips flip it)
    */
  def schemaDiff(before: org.apache.spark.sql.types.StructType,
                 after: org.apache.spark.sql.types.StructType): Seq[(String, String, Option[String], Option[String])] = {
    val b = before.fields.map(f => f.name -> f.dataType.sql).toMap
    val a = after.fields.map(f => f.name -> f.dataType.sql).toMap
    val dropped = (b.keySet -- a.keySet).toSeq.map(c => (c, "dropped", Some(b(c)), None))
    val added = (a.keySet -- b.keySet).toSeq.map(c => (c, "added", None, Some(a(c))))
    val changed = (b.keySet & a.keySet).toSeq
      .filter(c => b(c) != a(c))
      .map(c => (c, "type_changed", Some(b(c)), Some(a(c))))
    (dropped ++ added ++ changed).sortBy(_._1)
  }

  /** [[schemaDiff]] as a frame for report plumbing. */
  def schemaDiffFrame(spark: org.apache.spark.sql.SparkSession,
                      before: org.apache.spark.sql.types.StructType,
                      after: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    schemaDiff(before, after).toDF("column", "change", "before_type", "after_type")
  }

  def monotonicityViolations(df: DataFrame, partCols: Seq[String], orderCol: String,
                             valueCol: String, ascending: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
    val prev = lag(col(valueCol), 1).over(w)
    val bad = if (ascending) col(valueCol) < prev else col(valueCol) > prev
    df.select(partCols.map(col) :+ col(orderCol) :+ col(valueCol): _*)
      .withColumn("__bad", when(prev.isNotNull && bad, 1L).otherwise(0L))
      .groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("__bad")).cast(LongType).as("regressions"))
  }

  /** Deterministic per-group MODE imputation — the categorical gap-fill
    * next to the numeric scalers ([[graft.ops.Binning.robustScale]] fills
    * nothing; pipelines that group/join on a column with nulls silently
    * drop those rows): adds `<col>_filled` = the original value, or the
    * group's most-frequent non-null value when NULL, with frequency ties
    * broken by the MINIMUM value (the [[graft.ops.Joins.goldenRecord]]
    * survivorship rule — engine-replayable, never arrival-order). Groups
    * with no non-null value at all keep NULL (flagged by `imputed` =
    * false there only when the original was null).
    *
    * Shape: one (group, value) rollup, a skinny max-count attach and a
    * tie-resolving min (all AQE-broadcastable), one join back to rows.
    */
  def imputeMode(df: DataFrame, valueCol: String,
                 groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val gc = groupCols.map(col)
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(gc :+ col(valueCol): _*).agg(count(lit(1)).as("__c"))
    val top = counts.groupBy(gc: _*).agg(max(col("__c")).as("__m"))
    val modes = counts.join(top, groupCols)
      .where(col("__c") === col("__m"))
      .groupBy(gc: _*).agg(min(col(valueCol)).as("__mode"))
    df.join(modes, groupCols, "left")
      .withColumn(s"${valueCol}_filled", coalesce(col(valueCol), col("__mode")))
      .withColumn("imputed", col(valueCol).isNull && col("__mode").isNotNull)
      .drop("__mode")
  }

  /** Per-group LOWER-MEDIAN imputation — [[imputeMode]]'s numeric twin:
    * nulls fill with the group's lower median (the value at 1-based rank
    * ⌈n/2⌉ over the non-null values — always an OBSERVED value, no
    * interpolated artifacts, deterministic in any engine). Same output
    * contract: `<col>_filled` + the `imputed` flag; all-null groups stay
    * NULL.
    *
    * Shape: one (group, value) rollup + a group-bounded running window
    * over the DISTINCT-VALUE frame (the ksStatisticByGroup discipline) +
    * one skinny join back.
    */
  def imputeMedian(df: DataFrame, valueCol: String,
                   groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val cells = df.where(col(valueCol).isNotNull)
      .groupBy(gc :+ col(valueCol).as("__v"): _*).agg(count(lit(1)).as("__c"))
    val wRun = Window.partitionBy(gc: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(gc: _*)
    val meds = cells
      .withColumn("__k", sum(col("__c")).over(wRun))
      .withColumn("__ng", sum(col("__c")).over(wAll))
      .groupBy(gc: _*)
      .agg(min(when(col("__k") >= expr("(__ng + 1) div 2"), col("__v"))).as("__med"))
    df.join(meds, groupCols, "left")
      .withColumn(s"${valueCol}_filled", coalesce(col(valueCol), col("__med")))
      .withColumn("imputed", col(valueCol).isNull && col("__med").isNotNull)
      .drop("__med")
  }
}
