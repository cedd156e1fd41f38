package graft.metrics

import graft.api.ColumnConfig
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles soda-style metrics into Catalyst `Column` aggregate expressions.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so the whole
  * scan stays inside whole-stage codegen: one table scan → partial aggregates
  * (map-side) → a single-row exchange. No UDFs, no driver-side loops.
  *
  * Semantics follow soda-sql's metric engine (the layer soda-spark exposes,
  * reference tests/test_scan.py:22-72):
  *   - missing      = NULL, or in `missing_values`, or matches `missing_regex`/`missing_format`
  *   - values_count = rows - missing_count
  *   - valid        = non-missing AND passes validity config (no config → all non-missing valid)
  *   - percentages  = count * 100 / row_count
  *   - numeric aggregates (min/max/avg/sum/variance/stddev) over valid values
  *   - length aggregates over non-missing values
  */
object MetricColumns {

  /** Named `valid_format` regexes (equivalents of soda-sql's public format list). */
  val namedFormats: Map[String, String] = Map(
    "uuid" -> "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "email" -> "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$",
    "phone_number" -> "^\\+?[0-9()\\- ]{7,20}$",
    "number_whole" -> "^-?[0-9]+$",
    "number_decimal_point" -> "^-?[0-9]+\\.[0-9]+$",
    "number_decimal_comma" -> "^-?[0-9]+,[0-9]+$",
    "number_percentage" -> "^-?[0-9]+([\\.,][0-9]+)? ?%$",
    "date_iso_8601" -> "^[0-9]{4}-[0-9]{2}-[0-9]{2}([T ][0-9]{2}:[0-9]{2}(:[0-9]{2}(\\.[0-9]+)?)?(Z|[+-][0-9]{2}:?[0-9]{2})?)?$",
    "date_eu" -> "^[0-9]{1,2}[-/.][0-9]{1,2}[-/.][0-9]{4}$",
    "date_us" -> "^[0-9]{1,2}[-/.][0-9]{1,2}[-/.][0-9]{4}$",
    "time_24h" -> "^([01][0-9]|2[0-3]):[0-5][0-9](:[0-5][0-9])?$",
    "time_12h" -> "^(0?[1-9]|1[0-2]):[0-5][0-9](:[0-5][0-9])? ?([AaPp][Mm])?$",
    "ip_address" -> "^([0-9]{1,3}\\.){3}[0-9]{1,3}$",
    "credit_card_number" -> "^[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}$",
    "number_money_usd" -> "^\\$ ?-?[0-9,]+(\\.[0-9]+)?$",
    "number_money_eur" -> "^€ ?-?[0-9.]+(,[0-9]+)?$"
  )

  /** Metric-group expansion (soda's `metric_groups`). */
  val metricGroups: Map[String, Seq[String]] = Map(
    "missing" -> Seq("missing_count", "missing_percentage", "values_count", "values_percentage"),
    "validity" -> Seq("valid_count", "valid_percentage", "invalid_count", "invalid_percentage"),
    "length" -> Seq("min_length", "max_length", "avg_length"),
    "statistics" -> Seq("min", "max", "avg", "sum", "variance", "stddev"),
    "duplicates" -> Seq("distinct", "unique_count", "uniqueness", "duplicate_count"),
    // sketch-backed duplicates family: rides the single row-level pass via
    // the bottom-k-with-counts sketch (KmvCountsAgg) — ≤ k entries per
    // column per partial instead of pass 2's every-distinct-value shuffle
    "duplicates_approx" -> Seq("approx_distinct", "approx_unique_count",
      "approx_uniqueness", "approx_duplicate_count"),
    "profiling" -> Seq("maxs", "mins", "frequent_values", "histogram"),
    // whitespace-token statistics for text columns, riding pass 1 off ONE
    // pre-projected token count per row (the fxAlias discipline)
    "text" -> Seq("token_count", "avg_tokens", "min_tokens", "max_tokens")
  )

  def expandMetrics(metrics: Seq[String], groups: Seq[String]): Seq[String] =
    (metrics ++ groups.flatMap(g => metricGroups.getOrElse(g, Nil))).distinct

  /** Metrics computed by the single-pass row-level aggregation.
    * `approx_distinct` (HyperLogLog++) rides in the same pass — the 100 TB
    * alternative to the exact distinct family's extra shuffle.
    */
  val rowLevelMetrics: Set[String] = Set(
    "missing_count", "missing_percentage", "values_count", "values_percentage",
    "valid_count", "valid_percentage", "invalid_count", "invalid_percentage",
    "min", "max", "avg", "sum", "variance", "stddev",
    "min_length", "max_length", "avg_length", "approx_distinct",
    "approx_unique_count", "approx_duplicate_count", "approx_uniqueness",
    "token_count", "avg_tokens", "min_tokens", "max_tokens",
    "mojibake_count"
  )

  private val textMetrics = Seq("token_count", "avg_tokens", "min_tokens", "max_tokens")

  def tkAlias(name: String): String = s"${name}__tk"

  /** Bottom-k size for the approx duplicates family: relative error of the
    * distinct estimate ~ 1/√k ≈ 3%; the buffer is ≤ 16 KiB per column.
    */
  val ApproxDuplicatesK = 1024

  private val approxDupMetrics =
    Seq("approx_unique_count", "approx_duplicate_count", "approx_uniqueness")

  /** Metrics needing a per-value grouping pass. */
  val groupMetrics: Set[String] = Set(
    "distinct", "unique_count", "uniqueness", "duplicate_count",
    "frequent_values", "mins", "maxs", "histogram"
  )

  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
  def isString(dt: DataType): Boolean = dt == StringType

  /** The missing-ness predicate for a column under `cfg`. */
  def missingCond(c: Column, cfg: ColumnConfig): Column = {
    var cond = c.isNull
    if (cfg.missingValues.nonEmpty) cond = cond || c.cast(StringType).isin(cfg.missingValues: _*)
    cfg.missingRegex.foreach(r => cond = cond || c.cast(StringType).rlike(r))
    cfg.missingFormat.flatMap(namedFormats.get).foreach(r => cond = cond || c.cast(StringType).rlike(r))
    cond
  }

  def hasMissingConfig(cfg: ColumnConfig): Boolean =
    cfg.missingValues.nonEmpty || cfg.missingRegex.isDefined || cfg.missingFormat.isDefined

  def hasValidityConfig(cfg: ColumnConfig): Boolean =
    cfg.validFormat.isDefined || cfg.validRegex.isDefined || cfg.validValues.nonEmpty ||
      cfg.validMin.isDefined || cfg.validMax.isDefined ||
      cfg.validMinLength.isDefined || cfg.validMaxLength.isDefined

  /** The validity predicate (evaluated on non-missing values). */
  def validCond(c: Column, cfg: ColumnConfig): Column = {
    var cond = lit(true)
    cfg.validFormat.foreach { f =>
      val r = namedFormats.getOrElse(f, throw new IllegalArgumentException(s"unknown valid_format: $f"))
      cond = cond && c.cast(StringType).rlike(r)
    }
    cfg.validRegex.foreach(r => cond = cond && c.cast(StringType).rlike(r))
    if (cfg.validValues.nonEmpty) cond = cond && c.cast(StringType).isin(cfg.validValues: _*)
    cfg.validMin.foreach(v => cond = cond && c.cast(DoubleType) >= lit(v))
    cfg.validMax.foreach(v => cond = cond && c.cast(DoubleType) <= lit(v))
    cfg.validMinLength.foreach(v => cond = cond && length(c.cast(StringType)) >= lit(v))
    cfg.validMaxLength.foreach(v => cond = cond && length(c.cast(StringType)) <= lit(v))
    cond
  }

  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L)).cast(LongType)

  /** Sign-adjusted fixed-point scaling of a numeric column: round-half-away-
    * from-zero of x·10^s as a primitive LONG —
    * `x ≥ 0 ? floor(x·10^s + 0.5) : -floor(-x·10^s + 0.5)`.
    *
    * This replaces the former `cast(x as decimal(30,s))` sum input: that cast
    * costs a `BigDecimal.valueOf` (a `Double.toString`!) per row — measured
    * ~0.17 s per column per 600k rows vs ~0.05 s for this primitive form —
    * and its value rests on Spark's and DuckDB's double→decimal conversions
    * (shortest-string vs binary rounding) agreeing, which they do only
    * coincidentally. The floor form is pure IEEE double ops (multiply, add,
    * floor — each correctly rounded and engine-independent), so the DuckDB
    * oracle's `CASE WHEN x >= 0 THEN floor(x*10^s + 0.5) ELSE
    * -floor(-x*10^s + 0.5) END` is bit-identical BY CONSTRUCTION.
    * The two roundings differ only for inputs with ≥16 significant digits
    * whose x·10^s lands within 1 ulp below a .5 boundary — not representable
    * in data that is decimal at ≤ `scale` places.
    *
    * Integral columns use scale 0 (a plain cast): scaling IDs by 10^4 only
    * pushes |x| ≥ ~304k off [[exactSumSqParts]]'s safe-long square path.
    */
  def fixedPointLong(c: Column, scale: Int): Column =
    if (scale == 0) c.cast(LongType)
    else {
      val d = c.cast(DoubleType) * math.pow(10, scale)
      when(c >= 0, floor(d + lit(0.5))).otherwise(-floor(-d + lit(0.5))).cast(LongType)
    }

  /** The fixed-point scale the scan pass uses for sums/sums-of-squares —
    * [[aggColumns]] and [[derived]] MUST agree on it (derived divides the
    * sum-of-squares by 10^(2·scale)).
    */
  val ScanSumScale = 4

  /** The fixed-point scale for a column type: integral columns are already
    * fixed-point at scale 0; everything else uses [[ScanSumScale]].
    */
  def sumsqScale(dt: DataType): Int = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => 0
    case _ => ScanSumScale
  }

  /** Alias of the pre-projected fixed-point long the sum/sumsq aggregates read. */
  def fxAlias(name: String): String = s"${name}__fx"

  /** Pre-aggregation projection for one column: per-row values that SEVERAL
    * aggregate functions reference. Spark does no common-subexpression
    * elimination ACROSS aggregate functions, so an expensive expression
    * written inline into N aggregates is evaluated N times per row —
    * measured: the fixed-point rounding for variance/stddev re-ran ~6× per
    * row and was ~5 s of the 5.2 s sf0.1 wide scan pass. Computing the
    * fixed-point long ONCE in a Project beneath the aggregate removes all
    * but one evaluation; sum, avg, variance and stddev all read the same
    * column. (CollapseProject leaves the projection in place: each alias is
    * referenced more than once by non-cheap consumers.)
    */
  def preProjection(field: StructField, cfg: ColumnConfig, metrics: Seq[String]): Seq[Column] = {
    val m = metrics.toSet
    val needsFx = isNumeric(field.dataType) &&
      Seq("sum", "avg", "variance", "stddev").exists(m.contains)
    if (needsFx) {
      val c = col(field.name)
      val valid = !missingCond(c, cfg) && validCond(c, cfg)
      // null ⟺ missing/invalid/null — the sums skip those rows
      val v = when(valid, c)
      Seq(fixedPointLong(v, sumsqScale(field.dataType)).as(fxAlias(field.name)))
    } else if (isString(field.dataType) && textMetrics.exists(m.contains)) {
      // tokenize ONCE per row beneath the aggregate: Spark does no CSE
      // across aggregate functions, and split() in 3-4 aggregates would
      // re-run the regex per aggregate
      val c = col(field.name)
      val value = !missingCond(c, cfg)
      Seq(when(value, size(split(c, "\\s+")).cast(LongType))
        .as(tkAlias(field.name)))
    } else Seq.empty
  }

  /** Exact sum of squares in fixed-point INTEGER units of 10^-2s — Σ fx² for
    * the pre-projected fixed-point long fx (see [[preProjection]]) — as
    * THREE partial aggregates reassembled exactly by [[sumsqTotal]].
    * Value-identical to a single decimal(38,0) sum; the oracle recomputes
    * the same integer with a plain decimal square of the same fx.
    *
    * Why three: squares of scaled values reach ~1e18, so a single
    * decimal(38,0) running sum leaves Spark Decimal's compact-long
    * representation within a handful of rows and every subsequent add is a
    * BigDecimal allocation. Splitting the safe-branch product into
    * hi = prod >> 30 (≤ 8.6e9) and lo = prod & (2^30-1) (< 1.1e9) keeps both
    * running sums compact for ≥1e9 rows per partition — per-row work is a
    * primitive multiply/shift/mask plus two compact decimal adds, all inside
    * whole-stage codegen. Values whose square exceeds a long (|fx| ≥
    * 3.037e9) take the rare exact (19,0)×(19,0)→(38,0) decimal lane.
    */
  def exactSumSqParts(fx: Column, name: String): Seq[Column] = {
    val safe = abs(fx) < 3037000000L                 // fx*fx fits a long
    val prod = fx * fx                               // ≥ 0, ≤ 9.23e18 when safe
    val dec = fx.cast(DecimalType(19, 0))
    val slow = (dec * dec).cast(DecimalType(38, 0))  // (19,0)×(19,0)→(38,0), exact
    Seq(
      sum(when(safe, shiftright(prod, 30).cast(DecimalType(38, 0)))).as(s"${name}__sumsq_hi"),
      sum(when(safe, prod.bitwiseAND(lit((1L << 30) - 1)).cast(DecimalType(38, 0)))).as(s"${name}__sumsq_lo"),
      sum(when(!safe, slow)).as(s"${name}__sumsq_slow"))
  }

  /** Exact reassembly of [[exactSumSqParts]]: hi·2^30 + lo + slow, null iff
    * no non-null value was aggregated (matching the single-sum behavior).
    */
  def sumsqTotal(name: String): Column = {
    val z = lit(0L).cast(DecimalType(38, 0))
    val hi = col(s"${name}__sumsq_hi")
    val lo = col(s"${name}__sumsq_lo")
    val sl = col(s"${name}__sumsq_slow")
    when(hi.isNull && sl.isNull, lit(null).cast(DecimalType(38, 0)))
      .otherwise(coalesce(hi, z) * lit(1L << 30) + coalesce(lo, z) + coalesce(sl, z))
  }

  /** Signed-product analogue of [[exactSumSqParts]]: Σ x·y exactly, for two
    * pre-projected fixed-point longs. The same hi/lo split holds for
    * NEGATIVE products because the shift is arithmetic and the mask is the
    * non-negative remainder: p = floor(p/2^30)·2^30 + (p mod 2^30) in two's
    * complement. Safe lane requires BOTH |x| and |y| < 3.037e9 (product
    * fits a long); the rare large lane multiplies exactly in decimal.
    */
  def exactSumProdParts(x: Column, y: Column, name: String): Seq[Column] = {
    val safe = abs(x) < 3037000000L && abs(y) < 3037000000L
    val prod = x * y
    val slow = (x.cast(DecimalType(19, 0)) * y.cast(DecimalType(19, 0))).cast(DecimalType(38, 0))
    Seq(
      sum(when(safe, shiftright(prod, 30).cast(DecimalType(38, 0)))).as(s"${name}__sumprod_hi"),
      sum(when(safe, prod.bitwiseAND(lit((1L << 30) - 1)).cast(DecimalType(38, 0)))).as(s"${name}__sumprod_lo"),
      sum(when(!safe, slow)).as(s"${name}__sumprod_slow"))
  }

  /** Exact reassembly of [[exactSumProdParts]] — same shape as [[sumsqTotal]]. */
  def sumprodTotal(name: String): Column = {
    val z = lit(0L).cast(DecimalType(38, 0))
    val hi = col(s"${name}__sumprod_hi")
    val lo = col(s"${name}__sumprod_lo")
    val sl = col(s"${name}__sumprod_slow")
    when(hi.isNull && sl.isNull, lit(null).cast(DecimalType(38, 0)))
      .otherwise(coalesce(hi, z) * lit(1L << 30) + coalesce(lo, z) + coalesce(sl, z))
  }

  /** Row-level aggregate columns for one column config.
    * Output aliases: `<col>__<metric>`. Percentages and derived stats are
    * emitted by [[derived]] in a follow-up projection over these aliases.
    */
  def aggColumns(field: StructField, cfg: ColumnConfig, metrics: Seq[String]): Seq[Column] = {
    val c = col(field.name)
    val name = field.name
    val missing = missingCond(c, cfg)
    val value = !missing
    val valid = value && validCond(c, cfg)
    val m = metrics.toSet
    val out = Seq.newBuilder[Column]

    def need(k: String): Boolean = m.contains(k)

    // counts: base for percentages too
    val needMissing = Seq("missing_count", "missing_percentage", "values_count", "values_percentage")
      .exists(need)
    val needValidity = Seq("valid_count", "valid_percentage", "invalid_count", "invalid_percentage")
      .exists(need)
    // approx_uniqueness scales by values_count = row_count - missing_count
    if (needMissing || needValidity || need("approx_uniqueness"))
      out += countIf(missing).as(s"${name}__missing_count")
    if (needValidity)
      out += countIf(valid).as(s"${name}__valid_count")
    if (need("approx_distinct"))
      out += approx_count_distinct(when(value, c)).as(s"${name}__approx_distinct")
    if (approxDupMetrics.exists(need)) {
      // xxhash64 of a NULL child is the unchanged seed, not NULL — gate the
      // hash itself behind the missing-ness predicate so missing rows are
      // skipped by the sketch, matching the exact family's value domain
      val h = when(value, graft.functions.KmvCounts.xxhash60(c.cast(StringType)))
      out += graft.functions.KmvCounts.kmvCounts(h, ApproxDuplicatesK).as(s"${name}__kmvc")
    }

    if (isNumeric(field.dataType)) {
      val v = when(valid, c)
      if (need("min")) out += min(v).as(s"${name}__min")
      if (need("max")) out += max(v).as(s"${name}__max")
      if (need("sum") || need("avg") || need("variance") || need("stddev")) {
        out += sum(col(fxAlias(name)).cast(DecimalType(38, 0))).as(s"${name}__sum_sc")
        out += countIf(valid && c.isNotNull).as(s"${name}__num_count")
      }
      if (need("variance") || need("stddev"))
        out ++= exactSumSqParts(col(fxAlias(name)), name)
    }
    if (isString(field.dataType)) {
      val l = when(value, length(c))
      if (need("min_length")) out += min(l).as(s"${name}__min_length")
      if (need("max_length")) out += max(l).as(s"${name}__max_length")
      if (need("avg_length")) {
        out += sum(l).cast(LongType).as(s"${name}__len_sum")
        out += countIf(value).as(s"${name}__len_count")
      }
      if (textMetrics.exists(need)) {
        val tk = col(tkAlias(name))
        if (need("min_tokens")) out += min(tk).as(s"${name}__min_tokens")
        if (need("max_tokens")) out += max(tk).as(s"${name}__max_tokens")
        if (need("token_count") || need("avg_tokens")) {
          out += sum(tk).cast(LongType).as(s"${name}__tok_sum")
          out += countIf(tk.isNotNull).as(s"${name}__tok_count")
        }
      }
      // encoding-damage triage: rows whose value carries repairable
      // double-encoded UTF-8 (graft.functions.Mojibake) — rides pass 1 as
      // one codegen'd conditional count, row semantics like missing_count
      if (need("mojibake_count"))
        out += countIf(value && graft.functions.Mojibake.count(c) > 0)
          .as(s"${name}__mojibake_count")
    }
    out.result()
  }

  /** Derived metric expressions over the aliases emitted by [[aggColumns]]
    * plus a `row_count` alias. Formulas are written with explicit double
    * arithmetic so an oracle using the identical expression tree is
    * bit-identical.
    */
  def derived(name: String, metrics: Seq[String], dt: DataType): Seq[Column] = {
    val m = metrics.toSet
    val rc = col("row_count").cast(DoubleType)
    val missing = col(s"${name}__missing_count")
    val valuesCnt = col("row_count") - missing
    val validCnt = col(s"${name}__valid_count")
    val out = Seq.newBuilder[Column]
    if (m("missing_count")) out += missing.as(s"${name}__missing_count_out")
    if (m("missing_percentage")) out += (missing.cast(DoubleType) * 100.0 / rc).as(s"${name}__missing_percentage")
    if (m("values_count")) out += valuesCnt.as(s"${name}__values_count")
    if (m("values_percentage")) out += (valuesCnt.cast(DoubleType) * 100.0 / rc).as(s"${name}__values_percentage")
    if (m("valid_count")) out += validCnt.as(s"${name}__valid_count_out")
    if (m("valid_percentage")) out += (validCnt.cast(DoubleType) * 100.0 / rc).as(s"${name}__valid_percentage")
    if (m("invalid_count")) out += (valuesCnt - validCnt).as(s"${name}__invalid_count")
    if (m("invalid_percentage")) out += ((valuesCnt - validCnt).cast(DoubleType) * 100.0 / rc).as(s"${name}__invalid_percentage")
    if (m("approx_distinct")) out += col(s"${name}__approx_distinct").as(s"${name}__approx_distinct_out")
    if (approxDupMetrics.exists(m)) {
      // same arithmetic as KmvCounts.estimates (plain IEEE double ops);
      // CaseWhen short-circuits, so element_at(arr, k) only evaluates when
      // the sketch is full (n == k) — never out of bounds under ANSI
      val arr = col(s"${name}__kmvc")
      val n = size(arr)
      val d = when(n === 0, lit(null).cast(DoubleType))
        .when(n < ApproxDuplicatesK, n.cast(DoubleType))
        .otherwise(lit((ApproxDuplicatesK - 1).toDouble) /
          (element_at(arr, ApproxDuplicatesK).getField("h").cast(DoubleType) /
            lit(graft.functions.KmvCounts.HashSpace)))
      val uniq = size(filter(arr, x => x.getField("cnt") === 1L))
      if (m("approx_unique_count"))
        out += (d * (uniq.cast(DoubleType) / n.cast(DoubleType))).as(s"${name}__approx_unique_count")
      if (m("approx_duplicate_count"))
        out += (d * ((n - uniq).cast(DoubleType) / n.cast(DoubleType))).as(s"${name}__approx_duplicate_count")
      if (m("approx_uniqueness"))
        out += when(valuesCnt > 1, (d - 1.0) * 100.0 / (valuesCnt.cast(DoubleType) - 1.0))
          .as(s"${name}__approx_uniqueness")
    }
    if (isNumeric(dt)) {
      val n = col(s"${name}__num_count").cast(DoubleType)
      // the scaled sum is in integer units of 10^-scale, the reassembled
      // sum-of-squares in units of 10^(-2*scale)
      val s = col(s"${name}__sum_sc").cast(DoubleType) / math.pow(10, sumsqScale(dt))
      val sq = sumsqTotal(name).cast(DoubleType) / math.pow(10, 2 * sumsqScale(dt))
      if (m("min")) out += col(s"${name}__min").as(s"${name}__min_out")
      if (m("max")) out += col(s"${name}__max").as(s"${name}__max_out")
      if (m("sum")) out += s.as(s"${name}__sum")
      if (m("avg")) out += (s / n).as(s"${name}__avg")
      // sample variance: (sum(x^2) - sum(x)^2/n) / (n-1)
      if (m("variance")) out += ((sq - s * s / n) / (n - 1.0)).as(s"${name}__variance")
      if (m("stddev")) out += sqrt((sq - s * s / n) / (n - 1.0)).as(s"${name}__stddev")
    }
    if (isString(dt)) {
      if (m("min_length")) out += col(s"${name}__min_length").as(s"${name}__min_length_out")
      if (m("max_length")) out += col(s"${name}__max_length").as(s"${name}__max_length_out")
      if (m("avg_length")) out += (col(s"${name}__len_sum").cast(DoubleType) / col(s"${name}__len_count").cast(DoubleType)).as(s"${name}__avg_length")
      if (m("min_tokens")) out += col(s"${name}__min_tokens").as(s"${name}__min_tokens_out")
      if (m("max_tokens")) out += col(s"${name}__max_tokens").as(s"${name}__max_tokens_out")
      if (m("token_count")) out += col(s"${name}__tok_sum").as(s"${name}__token_count")
      if (m("avg_tokens")) out += (col(s"${name}__tok_sum").cast(DoubleType) /
        col(s"${name}__tok_count").cast(DoubleType)).as(s"${name}__avg_tokens")
      if (m("mojibake_count")) out += col(s"${name}__mojibake_count")
    }
    out.result()
  }
}
