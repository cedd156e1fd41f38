package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers shared by the per-domain gate registries: table readers, the
  * MetricColumns row-scan path, and the DuckDB oracle SQL builders
  * (identical expression trees; see SURVEY.md par.3).
  */
private[queries] object QueryShared {
  // Table-READER memo: `s.read.parquet(path)` costs ~77 ms of DRIVER-side
  // metadata work per call (file listing + footer schema inference +
  // source resolution) — ~100 s across a 365-query × 3-rep bench sweep.
  // Memoizing the resolved DataFrame per (session, path) is METADATA
  // reuse only (the catalog-table pattern — DuckDB's oracle likewise
  // CREATE VIEWs each table once): the logical plan still scans the
  // parquet files on every execution, nothing row-level is cached.
  // Keyed on the session so a fresh session (new bench process, tests)
  // re-resolves; data dirs are immutable test fixtures by contract.
  private val tableMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // drop entries of stopped sessions so a long-lived JVM with session
    // churn (sbt test across suites, service use) can GC them — the map is
    // small (#tables × live sessions), so the sweep is O(few) per call
    tableMemo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    tableMemo.computeIfAbsent((s, s"$dir/$name.parquet"), { case (_, path) =>
      if (name == "events")
        // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects natively
        graft.sources.Tables.parquet(s, path, nanosTimestampCols = Seq("ts"))
      else s.read.parquet(path)
    })
  }

  /** Invalidate memo entries under `dir` — REQUIRED before re-writing any
    * table a live session may later read through [[t]] (ScaleBench.generate
    * overwrites its outDir in-session; without eviction a re-generation
    * would serve the stale file listing/schema).
    */
  def evict(dir: String): Unit =
    tableMemo.keySet.removeIf(k => k._2.startsWith(dir + "/"))

  /** Row-level metrics through the library path (aggColumns + derived). */
  def scanRow(df: DataFrame, cols: Seq[(String, ColumnConfig)], metrics: Seq[String]): DataFrame = {
    val fields = df.schema.fields.filter(f => cols.exists(_._1 == f.name))
    val preCols = fields.toSeq.flatMap { f =>
      MetricColumns.preProjection(f, cols.find(_._1 == f.name).get._2, metrics)
    }
    val aggInput = if (preCols.isEmpty) df else df.select(col("*") +: preCols: _*)
    val aggCols = fields.toSeq.flatMap { f =>
      MetricColumns.aggColumns(f, cols.find(_._1 == f.name).get._2, metrics)
    }
    val base = aggInput.agg(count(lit(1)).as("row_count"), aggCols: _*)
    val derivedCols = col("row_count") +: fields.toSeq.flatMap { f =>
      MetricColumns.derived(f.name, metrics, f.dataType)
    }
    base.select(derivedCols: _*)
  }

  /** Output alias of `metric` for column `c` as produced by MetricColumns.derived. */
  def alias(c: String, metric: String): String = metric match {
    case "missing_count" | "valid_count" | "min" | "max" | "min_length" | "max_length" =>
      s"${c}__${metric}_out"
    case other => s"${c}__$other"
  }
  def out(c: String, metric: String): Column =
    col(alias(c, metric)).as(s"${c}_$metric")




  /** Shared md5-60-bit token hash (see graft.ops.Shingles.md5Hash60). */
  /** Deterministic messy-URL synthesis for the URL/domain gates — one
    * expression over `documents` (doc_id, lang, source), mirrored verbatim
    * by [[urlSqlPrefix]] so both engines derive the identical url column.
    */
  /** Deterministic messy-HTML synthesis for the HTML gates, mirrored by
    * [[htmlSqlCte]]: doctype, style/script blocks (with inner `<`/`>`),
    * comments, mixed-case tags, entity soup, unterminated tails.
    */
  def syntheticHtml: Column = concat(
    lit("<!DOCTYPE html><html><head><title>T</title>"),
    lit("<STYLE type=\"text/css\">body { color: #fff; }</STYLE>"),
    lit("<script src=\"a.js\">if (a<b && c>d) { alert(\"x\"); }</script>"),
    lit("<!-- crawler note "), col("source"), lit(" -->"),
    lit("<body class=\"doc\"><h1>Doc</h1><P>"),
    substring(col("text"), 1, 160),
    lit("</p><p>A &amp;amp; B &lt;tag&gt; says &quot;hi&quot; " +
      "&apos;q&apos; &#39;z&#39;&nbsp;end&unknown;</p>"),
    when(col("doc_id") % 17 === 0, lit("<!-- unterminated trail"))
      .otherwise(lit("")),
    when(col("doc_id") % 13 === 0, lit("<script>var dangling = 1;"))
      .otherwise(lit("")),
    lit("</body></html>"))

  /** DuckDB twin of [[syntheticHtml]] + the defining strip chain, as CTEs
    * ending in `cleaned(doc_id, text_clean)`. Lines must survive a second
    * outer stripMargin (no leading-whitespace-then-pipe lines).
    */
  def htmlSqlCte: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<!DOCTYPE html><html><head><title>T</title>' ||
      |    '<STYLE type="text/css">body { color: #fff; }</STYLE>' ||
      |    '<script src="a.js">if (a<b && c>d) { alert("x"); }</script>' ||
      |    '<!-- crawler note ' || source || ' -->' ||
      |    '<body class="doc"><h1>Doc</h1><P>' ||
      |    substr(text, 1, 160) ||
      |    '</p><p>A &amp;amp; B &lt;tag&gt; says &quot;hi&quot; &apos;q&apos; &#39;z&#39;&nbsp;end&unknown;</p>' ||
      |    (CASE WHEN doc_id % 17 = 0 THEN '<!-- unterminated trail' ELSE '' END) ||
      |    (CASE WHEN doc_id % 13 = 0 THEN '<script>var dangling = 1;' ELSE '' END) ||
      |    '</body></html>' AS html
      |  FROM documents),
      |cleaned AS (
      |  SELECT doc_id,
      |  trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(replace(
      |      regexp_replace(
      |        regexp_replace(html,
      |          '(?is)<!--.*?(-->|$)|<script[^>]*>.*?(</script[^>]*>|$)|<style[^>]*>.*?(</style[^>]*>|$)',
      |          '', 'g'),
      |        '(?s)<[^<>]*>', ' ', 'g'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
      |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
      |    '[ \t\n\r\f]+', ' ', 'g'), ' ') AS text_clean
      |  FROM h)""".stripMargin

  def syntheticUrl: Column = syntheticUrlWithPath(
    concat(lit("/docs/"), col("doc_id")))

  /** `pathExpr` variant — the dedup gate collides paths on doc_id % 50 so
    * distinct RAW urls (case/port/tracking/fragment noise) share canonicals.
    */
  def syntheticUrlWithPath(pathExpr: Column): Column = {
    val m3 = col("doc_id") % 3
    val m4 = col("doc_id") % 4
    val m5 = col("doc_id") % 5
    val m6 = col("doc_id") % 6
    val scheme = when(m3 === 0, "http").when(m3 === 1, "HTTPS").otherwise("https")
    val suffix = when(m5 === 0, ".co.uk").when(m5 === 1, ".com")
      .when(m5 === 2, ".org.au").when(m5 === 3, ".io").otherwise(".gov.in")
    val host = concat(
      when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
      col("lang"), lit("-"), col("source"), suffix)
    val port = when(m4 === 0, ":80").when(m4 === 1, ":443")
      .when(m4 === 2, ":8080").otherwise(lit(""))
    val qs = when(m6 === 0,
        concat(lit("?utm_source=feed&id="), col("doc_id") % 100, lit("&fbclid=xyz")))
      .when(m6 === 1, concat(lit("?id="), col("doc_id") % 100, lit("&utm_medium=email")))
      .when(m6 === 2, lit("?gclid=abc"))
      .otherwise(lit(""))
    val frag = when(m5 === 1, lit("#section-2")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, pathExpr, qs, frag)
  }

  /** DuckDB twin of [[syntheticUrl]] + the full canonicalization chain, as
    * CTEs ending in `canon(doc_id, url, scheme, host, portout, path, cq)`.
    */
  def urlSqlPrefix: String = {
    val suffixIn = graft.ops.Urls.MultiPartSuffixes.map(s => s"'$s'").mkString(", ")
    // NOTE: consuming oracle entries interpolate this prefix and then call
    // .stripMargin on the WHOLE string, so no line here may begin with
    // whitespace + '|' — concatenation operators stay at line ends.
    s"""WITH u AS (
       |  SELECT doc_id,
       |    (CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS' ELSE 'https' END) ||
       |    '://' || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
       |    lang || '-' || source ||
       |    (CASE doc_id % 5 WHEN 0 THEN '.co.uk' WHEN 1 THEN '.com'
       |        WHEN 2 THEN '.org.au' WHEN 3 THEN '.io' ELSE '.gov.in' END) ||
       |    (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
       |        WHEN 2 THEN ':8080' ELSE '' END) ||
       |    '/docs/' || doc_id ||
       |    (CASE doc_id % 6
       |        WHEN 0 THEN '?utm_source=feed&id=' || (doc_id % 100) || '&fbclid=xyz'
       |        WHEN 1 THEN '?id=' || (doc_id % 100) || '&utm_medium=email'
       |        WHEN 2 THEN '?gclid=abc' ELSE '' END) ||
       |    (CASE WHEN doc_id % 5 = 1 THEN '#section-2' ELSE '' END) AS url
       |  FROM documents),
       |q1 AS (
       |  SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u1 FROM u),
       |q2 AS (
       |  SELECT doc_id, url, u1,
       |    lower(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(u1, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM q1),
       |q3 AS (
       |  SELECT doc_id, url, scheme,
       |    regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
       |    regexp_replace(rest, '^[^/?]*', '') AS pathq
       |  FROM q2),
       |q4 AS (
       |  SELECT doc_id, url, scheme,
       |    regexp_replace(lower(regexp_replace(hostport, ':[0-9]+${"$"}', '')), '\\.${"$"}', '') AS host,
       |    regexp_extract(hostport, ':([0-9]+)${"$"}', 1) AS port,
       |    regexp_extract(pathq, '^([^?]*)', 1) AS path,
       |    regexp_extract(pathq, '[?](.*)', 1) AS qstr
       |  FROM q3),
       |canon AS (
       |  SELECT doc_id, url, scheme, host, path,
       |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |              OR (scheme = 'https' AND port = '443')
       |         THEN '' ELSE ':' || port END AS portout,
       |    array_to_string(list_filter(string_split(qstr, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x,
       |        '${graft.ops.Urls.TrackingParamPattern}')), '&') AS cq
       |  FROM q4),
       |dom AS (
       |  SELECT doc_id, url, scheme, host, portout, path, cq,
       |    string_split(host, '.') AS hp
       |  FROM canon),
       |dom2 AS (
       |  SELECT *, CASE
       |      WHEN regexp_matches(host, '^[0-9.]+${"$"}') THEN host
       |      WHEN len(hp) <= 2 THEN host
       |      WHEN (hp[-2] || '.' || hp[-1]) IN ($suffixIn)
       |        THEN hp[-3] || '.' || hp[-2] || '.' || hp[-1]
       |      ELSE hp[-2] || '.' || hp[-1] END AS domain
       |  FROM dom)""".stripMargin
  }

  val duckTokenHash = "('0x' || substr(md5(t), 1, 15))::BIGINT"

  /** Squared-L2 between two subDim-element list slices, spelled as the
    * EXACT left-fold association Pq.sqDist uses (`(((0+d1)+d2)+…)`) so the
    * doubles match bit-for-bit.
    */
  def pqDistSql(a: String, b: String, subDim: Int): String =
    (1 to subDim).foldLeft("0") { (acc, i) =>
      s"($acc + ($a[$i]-$b[$i])*($a[$i]-$b[$i]))" }

  /** Shared CTE prefix for the PQ oracles: doubles, subvectors (m×subDim),
    * the smallest-id seed codebook, and every vector's argmin codes.
    */
  def pqCodesSqlPrefix(m: Int, c: Int, subDim: Int): String =
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |sv AS (SELECT vec_id, CAST(s AS INT) AS sub, v[(s*$subDim+1):((s+1)*$subDim)] AS sv
       |       FROM e, generate_series(0, ${m - 1}) t(s)),
       |cb AS (SELECT sub, CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS INT) AS code,
       |              sv AS cw
       |       FROM sv WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $c)),
       |a AS (SELECT s.vec_id, s.sub, c.code, ${pqDistSql("s.sv", "c.cw", subDim)} AS d
       |      FROM sv s JOIN cb c ON c.sub = s.sub),
       |codes AS (SELECT vec_id, sub, code FROM (
       |    SELECT vec_id, sub, code,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM a)
       |  WHERE rn = 1)""".stripMargin

  /** Shared CTE prefix for the IVFADC oracles: doubles, the smallest-id
    * coarse-cell codebook (`cc`), each vector's assigned cell + residual,
    * the smallest-id residual PQ codebook (`rcb`), and each vector's
    * per-subspace argmin codes — `codes` = (vec_id, cell, sub, code).
    * Replays IvfPq.trainCells/trainResidualCodebook/encode exactly.
    */
  def ivfPqCodesSqlPrefix(ncells: Int, m: Int, c: Int, dim: Int): String = {
    val subDim = dim / m
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |cc AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS cw
       |       FROM e WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $ncells)),
       |ad AS (SELECT e.vec_id, cc.cell, ${pqDistSql("e.v", "cc.cw", dim)} AS d FROM e, cc),
       |asg AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn FROM ad)
       |  WHERE rn = 1),
       |res AS (SELECT a.vec_id, a.cell, [e.v[i+1] - cc.cw[i+1] for i in range(0, $dim)] AS r
       |        FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN cc ON cc.cell = a.cell),
       |rsv AS (SELECT vec_id, cell, CAST(s AS INT) AS sub, r[(s*$subDim+1):((s+1)*$subDim)] AS sv
       |        FROM res, generate_series(0, ${m - 1}) t(s)),
       |rcb AS (SELECT sub, CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS INT) AS code,
       |               sv AS cw
       |        FROM rsv WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $c)),
       |a2 AS (SELECT r.vec_id, r.cell, r.sub, c.code, ${pqDistSql("r.sv", "c.cw", subDim)} AS d
       |       FROM rsv r JOIN rcb c ON c.sub = r.sub),
       |codes AS (SELECT vec_id, cell, sub, code FROM (
       |    SELECT vec_id, cell, sub, code,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM a2)
       |  WHERE rn = 1)""".stripMargin
  }

  /** The n-token shingle-string list of `string_split_regex(text,'\s+')` in
    * DuckDB — same semantics as Shingles.shingleStrings (shorter-than-n docs
    * yield one whole-text shingle).
    */
  def duckShingles(n: Int): String =
    if (n == 1) "string_split_regex(text, '\\s+')"
    else s"""(CASE WHEN len(string_split_regex(text, '\\s+')) < $n
            | THEN [array_to_string(string_split_regex(text, '\\s+'), ' ')]
            | ELSE list_transform(range(1, len(string_split_regex(text, '\\s+')) - ${n - 2}),
            |        i -> array_to_string(string_split_regex(text, '\\s+')[i:i+${n - 1}], ' ')) END)"""
      .stripMargin.replace("\n", "")

  /** Full MinHash-LSH oracle: recompute the `numHashes` permutation minima
    * per doc from the md5-60 shingle hashes (same coefficients as
    * MinHashSignatureExpr), apply the same `bands`-band slice-equality
    * candidacy, then the same exact shingle-HASH-set jaccard >= threshold
    * verification (`shingleLen`=1 is the token set). `withJaccard` adds the
    * verified jaccard to the output.
    */
  def minhashOracleSql(numHashes: Int, bands: Int, threshold: Double,
                               shingleLen: Int = 1, withJaccard: Boolean = false,
                               maxDf: Option[Int] = None): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val jac = """CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) /
                |      CAST(len(da.toks) + len(db.toks) - len(list_intersect(da.toks, db.toks)) AS DOUBLE)"""
      .stripMargin
    val outCols = if (withJaccard) s"c.id_a, c.id_b, $jac AS jaccard" else "c.id_a, c.id_b"
    // DF-pruned variant: recompute document frequency over DISTINCT
    // (doc, shingle-hash) pairs, keep shingles with df <= maxDf, and base
    // BOTH the signatures and the verification sets on the kept hashes —
    // the exact rule Dedup.prunedShingleHashes applies.
    val srcCtes = maxDf match {
      case None =>
        s"""hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
           |g AS (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
           |d AS (SELECT doc_id, list_distinct(list_transform(${duckShingles(shingleLen)},
           |        t -> $duckTokenHash)) AS toks FROM documents)""".stripMargin
      case Some(m) =>
        s"""hh AS (SELECT DISTINCT doc_id, $duckTokenHash AS h FROM sh),
           |dfc AS (SELECT h, count(*) AS df FROM hh GROUP BY h),
           |keep AS (SELECT doc_id, h FROM hh JOIN dfc USING (h) WHERE df <= $m),
           |g AS (SELECT doc_id, $sigAggs FROM keep GROUP BY doc_id),
           |d AS (SELECT doc_id, list(h) AS toks FROM keep GROUP BY doc_id)""".stripMargin
    }
    s"""WITH sh AS (SELECT doc_id, unnest(${duckShingles(shingleLen)}) AS t FROM documents),
       |$srcCtes,
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM g a JOIN g b ON a.doc_id < b.doc_id
       |         WHERE $bandClauses)
       |SELECT $outCols
       |FROM cand c JOIN d da ON da.doc_id = c.id_a JOIN d db ON db.doc_id = c.id_b
       |WHERE $jac >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** From-scratch twin of the cross-run incremental dedup E2E gate:
    * per-doc MinHash signatures from the md5-60 shingle hashes, any-band
    * collision candidacy, SIGNATURE-ESTIMATE verification (the fraction of
    * agreeing components — the store-side similarity, since incremental
    * runs never re-read old bodies), then recursive-CTE components with
    * min-id labels over the whole corpus.
    */
  def minhashEstComponentsOracle(numHashes: Int, bands: Int, threshold: Double,
                                 shingleLen: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val est = (0 until numHashes)
      .map(i => s"(CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH RECURSIVE
       |sh AS (SELECT doc_id, unnest(${duckShingles(shingleLen)}) AS t FROM documents),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
       |g AS MATERIALIZED (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |      FROM g a JOIN g b ON a.doc_id < b.doc_id
       |      WHERE ($bandClauses)
       |        AND CAST($est AS DOUBLE) / $numHashes.0 >= $threshold),
       |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |cc(id, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b)
       |SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id ORDER BY doc_id""".stripMargin
  }

  /** q_dict_hits dictionary (shared by gate and oracle); multi-word phrases
    * and the self-overlapping "a a" exercise what replace-based counting
    * would miss. */
  val DictPatterns =
    Seq("table", "fast sort", "a a", "scan", "value table part")

  def dictHitsOracle: String = {
    val exprs = DictPatterns.zipWithIndex.map { case (p, i) =>
      val lp = p.length
      s"CAST(len(list_filter(range(1, len(text) - $lp + 2), i -> text[i:i + ${lp - 1}] = '$p')) AS INTEGER) AS n$i"
    }
    s"SELECT doc_id, ${exprs.mkString(", ")} FROM documents ORDER BY doc_id"
  }

  /** LSH tuning-audit oracle: deterministic bounded sample, exact jaccard
    * all-pairs ground truth, any-band signature collision flag, and the
    * same analytic S-curve literal computed by the same Scala function.
    */
  def lshAuditOracleSql(numHashes: Int, bands: Int, threshold: Double,
                                sampleSize: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val pLit = Dedup.lshCollisionProb(threshold, bands, rows)
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    s"""WITH samp AS MATERIALIZED (SELECT doc_id, text FROM documents
       |  ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|lshaudit'), 1, 15))::BIGINT % 10000, doc_id
       |  LIMIT $sampleSize),
       |sh AS (SELECT doc_id, unnest(${duckShingles(1)}) AS t FROM samp),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
       |g AS MATERIALIZED (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
       |d AS MATERIALIZED (SELECT doc_id, list_distinct(list_transform(${duckShingles(1)},
       |        t -> $duckTokenHash)) AS toks FROM samp),
       |pr AS (SELECT
       |         CAST(len(list_intersect(da.toks, db.toks)) AS DOUBLE) /
       |         CAST(len(da.toks) + len(db.toks) - len(list_intersect(da.toks, db.toks)) AS DOUBLE) AS j,
       |         ($bandClauses) AS cand
       |       FROM d da JOIN d db ON da.doc_id < db.doc_id
       |         JOIN g a ON a.doc_id = da.doc_id JOIN g b ON b.doc_id = db.doc_id),
       |m AS (SELECT
       |  CAST(count(CASE WHEN j >= $threshold THEN 1 END) AS BIGINT) AS true_pairs,
       |  CAST(count(CASE WHEN cand THEN 1 END) AS BIGINT) AS cand_pairs,
       |  CAST(count(CASE WHEN cand AND j >= $threshold THEN 1 END) AS BIGINT) AS hit_pairs
       |FROM pr)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM samp) AS sample_docs,
       |  true_pairs, cand_pairs, hit_pairs,
       |  CASE WHEN true_pairs > 0 THEN CAST(hit_pairs AS DOUBLE) / CAST(true_pairs AS DOUBLE) END AS recall,
       |  CASE WHEN cand_pairs > 0 THEN CAST(hit_pairs AS DOUBLE) / CAST(cand_pairs AS DOUBLE) END AS "precision",
       |  CAST('$pLit' AS DOUBLE) AS p_at_threshold
       |FROM m""".stripMargin
    // note the STRING cast: a bare decimal literal goes DECIMAL→DOUBLE in
    // DuckDB (two roundings, off by 1 ulp here); the varchar cast is strtod
  }

  /** Split-leakage oracle: the full MinHash pair oracle (jaccard included)
    * wrapped with the q_split_assign md5-bucket split formula applied to
    * both endpoints, keeping only cross-split pairs.
    */
  def splitLeakageOracleSql(numHashes: Int, bands: Int, threshold: Double,
                            maxDf: Option[Int] = None): String = {
    def bucket(id: String) =
      s"('0x' || substr(md5(CAST($id AS VARCHAR) || '|split'), 1, 15))::BIGINT % 10000"
    def splitCase(b: String) =
      s"CASE WHEN $b < 8000 THEN 'train' WHEN $b < 9000 THEN 'val' WHEN $b < 10000 THEN 'test' END"
    s"""WITH mh AS (${minhashOracleSql(numHashes, bands, threshold, shingleLen = 3, withJaccard = true, maxDf = maxDf)}),
       |lab AS (SELECT id_a, id_b, jaccard,
       |               ${splitCase(bucket("id_a"))} AS split_a,
       |               ${splitCase(bucket("id_b"))} AS split_b FROM mh)
       |SELECT id_a, id_b, jaccard, split_a, split_b FROM lab
       |WHERE split_a IS NOT NULL AND split_b IS NOT NULL AND split_a <> split_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Cross-run incremental dedup oracle: recompute both sides' signatures
    * from the shared md5-60 hashes, candidate on any-band equality, filter
    * on the signature estimate (agreeing components / numHashes).
    */
  def incrementalDedupOracleSql(numHashes: Int, bands: Int,
                                        threshold: Double, shingleLen: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val rows = numHashes / bands
    val sigAggs = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p) AS s$i").mkString(", ")
    val bandClauses = (0 until bands).map { b =>
      (0 until rows).map(r => s"a.s${b * rows + r} = b.s${b * rows + r}").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val estExpr = (0 until numHashes)
      .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sh AS (SELECT doc_id, unnest(${duckShingles(shingleLen)}) AS t FROM documents),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM sh),
       |g AS (SELECT doc_id, $sigAggs FROM hh GROUP BY doc_id),
       |cand AS (SELECT a.doc_id AS new_id, b.doc_id AS store_id,
       |                CAST($estExpr AS DOUBLE) / $numHashes.0 AS est
       |         FROM g a JOIN g b ON a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
       |         WHERE $bandClauses)
       |SELECT new_id, store_id, est FROM cand
       |WHERE est >= $threshold
       |ORDER BY new_id, store_id""".stripMargin
  }

  /** Full SimHash oracle: per-bit token-hash majorities → 60-bit signature →
    * exact hamming over ALL pairs (the Spark side's chunked candidacy is
    * recall-lossless for hamming <= maxHamming < nChunks, so brute force
    * produces the identical set).
    */
  def simhashOracleSql(bits: Int, maxHamming: Int): String = {
    val bitSums = (0 until bits)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE 0 END) AS c$b").mkString(", ")
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN c$b * 2 > n THEN (1::BIGINT << $b) ELSE 0::BIGINT END").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS t FROM documents),
       |hh AS (SELECT doc_id, $duckTokenHash AS h FROM tok),
       |s AS (SELECT doc_id, count(*) AS n, $bitSums FROM hh GROUP BY doc_id),
       |g AS (SELECT doc_id, $sigExpr AS sig FROM s)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM g a JOIN g b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Column-sketch oracle: the same `numHashes` permutation minima over the
    * md5-60 hashes of the column's values.
    */
  def columnSketchOracleSql(numHashes: Int): String = {
    val (as, bs) = graft.functions.MinHash.coefs(numHashes)
    val p = graft.functions.MinHash.P
    val mins = (0 until numHashes)
      .map(i => s"min(((h % $p) * ${as(i)} + ${bs(i)}) % $p)").mkString(", ")
    s"""WITH hh AS (SELECT ('0x' || substr(md5(o_orderpriority), 1, 15))::BIGINT AS h
       |            FROM orders WHERE o_orderpriority IS NOT NULL),
       |g AS (SELECT [$mins] AS sig FROM hh)
       |SELECT CAST(unnest(range(0, $numHashes)) AS INT) AS pos, unnest(sig) AS sig_value
       |FROM g ORDER BY pos""".stripMargin
  }

  /** Theta-sketch oracle: rebuild both KMV sketches from the shared md5-60
    * hashes, apply the identical theta rules (exclusive k-th-smallest
    * threshold, operations under min theta, union re-trim at overflow) and
    * the identical estimate division — see graft.functions.ThetaSketch.
    */
  /** DuckDB replay of the bottom-k-with-counts sketch + estimator for one
    * column: GROUP BY value-hash keeps retained counts exact, ORDER BY h
    * LIMIT k is the bottom-k, and the arithmetic mirrors
    * [[graft.functions.KmvCounts.estimates]] op for op.
    */
  def approxDupOracleSql(k: Int, cols: Seq[String]): String = {
    val branches = cols.map { c =>
      s"""SELECT '$c' AS column_name, n AS retained,
         |       CASE WHEN n = 0 THEN 0.0
         |            WHEN n < $k THEN CAST(n AS DOUBLE)
         |            ELSE ${k - 1}.0 / (CAST(hk AS DOUBLE) / 1152921504606846976.0) END AS d,
         |       CAST(u AS DOUBLE) / CAST(n AS DOUBLE) AS fu,
         |       CAST(n - u AS DOUBLE) / CAST(n AS DOUBLE) AS fd
         |FROM (SELECT count(*) AS n, max(h) AS hk, count(*) FILTER (WHERE cnt = 1) AS u
         |      FROM (SELECT ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT AS h, count(*) AS cnt
         |            FROM orders WHERE $c IS NOT NULL GROUP BY 1 ORDER BY h LIMIT $k))""".stripMargin
    }
    s"""SELECT column_name, retained, d AS approx_distinct,
       |       d * fu AS approx_unique_count, d * fd AS approx_duplicate_count
       |FROM (${branches.mkString("\nUNION ALL\n")})
       |ORDER BY column_name""".stripMargin
  }

  /** Unrolled integer-arithmetic PageRank (one CTE per round) — DuckDB's
    * `//` and Spark's `div` truncate identically on non-negative longs.
    */
  /** Unrolled BPE training rounds as DuckDB CTEs — the same decomposition
    * as [[Bpe.train]]: wf0 = char-split word frequencies; per round r,
    * pair stats (parallel-unnest zip of the two shifted slices), the
    * lexicographic argmax, leftmost-greedy occurrence selection (islands of
    * consecutive positions keep odd ranks — exactly the scan semantics),
    * and the rebuilt symbol lists.
    */
  def bpeOracleRounds(n: Int, pattern: String): String = {
    val base =
      s"""wf0 AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         |         list_transform(range(1, length(word)+1), i -> substr(word, CAST(i AS INT), 1)) AS syms
         |  FROM (SELECT unnest(regexp_extract_all(lower(text), '$pattern')) AS word FROM documents)
         |  GROUP BY word)""".stripMargin
    val rounds = (1 to n).map { r =>
      val p = r - 1
      s"""pr$r AS (SELECT unnest(syms[1:len(syms)-1]) AS a, unnest(syms[2:len(syms)]) AS b, freq
         |  FROM wf$p WHERE len(syms) >= 2),
         |best$r AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM pr$r GROUP BY 1,2
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |occ$r AS (
         |  SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS rn
         |  FROM (SELECT word, unnest(range(1, len(syms))) AS i,
         |               unnest(syms[1:len(syms)-1]) AS sa, unnest(syms[2:len(syms)]) AS sb
         |        FROM wf$p WHERE len(syms) >= 2) o, best$r
         |  WHERE o.sa = best$r.a AND o.sb = best$r.b),
         |kept$r AS (
         |  SELECT word, i FROM (
         |    SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, i - rn ORDER BY i) AS rr
         |    FROM occ$r) WHERE rr % 2 = 1),
         |wf$r AS (
         |  SELECT e.word, any_value(e.freq) AS freq,
         |         list(CASE WHEN kj.i IS NOT NULL THEN e.sym || (SELECT b FROM best$r) ELSE e.sym END
         |              ORDER BY e.j) AS syms
         |  FROM (SELECT word, freq, unnest(range(1, len(syms)+1)) AS j, unnest(syms) AS sym FROM wf$p) e
         |  LEFT JOIN kept$r kj ON kj.word = e.word AND kj.i = e.j
         |  LEFT JOIN kept$r kp ON kp.word = e.word AND kp.i = e.j - 1
         |  WHERE kp.i IS NULL
         |  GROUP BY e.word)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  def bpeMergesOracleSql(n: Int, pattern: String): String =
    s"WITH ${bpeOracleRounds(n, pattern)}\n" +
      (1 to n).map(r => s"SELECT $r AS mrank, a AS mleft, b AS mright, cnt FROM best$r")
        .mkString(" UNION ALL ") + " ORDER BY mrank"

  def bpeTokensOracleSql(n: Int, pattern: String): String =
    s"WITH ${bpeOracleRounds(n, pattern)}\n" +
      s"SELECT token, CAST(sum(freq) AS BIGINT) AS cnt FROM " +
      s"(SELECT unnest(syms) AS token, freq FROM wf$n) GROUP BY 1 ORDER BY token"

  /** Unrolled fixed-point GD rounds for the linear probe oracle — same
    * dynamics as [[LinearProbe.train]]: HUGEINT gradient sums, truncating
    * `//` update (DuckDB `//` and Java `/` agree on truncation-toward-zero
    * for negatives — verified), weights as 1-row CTEs.
    */
  def probeOracleRounds(rounds: Int, etaDen: Long): String = {
    val stopList = TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
    val f =
      s"""f AS (SELECT doc_id,
         |  CAST(1 AS BIGINT) AS x0,
         |  least(len(string_split_regex(text, '\\s+')), 200) AS x1,
         |  least(len(list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 6)), 200) AS x2,
         |  least(len(list_filter(string_split_regex(text, '\\s+'), t -> list_contains([$stopList], t))), 200) AS x3,
         |  least(n_chars, 2000) * ${graft.ops.LinearProbe.Scale} AS yfx
         |  FROM documents),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |              CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)""".stripMargin
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"""e$r AS (SELECT x0, x1, x2, x3,
         |              x0*w.w0 + x1*w.w1 + x2*w.w2 + x3*w.w3 - yfx AS e
         |       FROM f, w$p w),
         |g$r AS (SELECT sum(CAST(x0*e AS HUGEINT)) AS g0, sum(CAST(x1*e AS HUGEINT)) AS g1,
         |              sum(CAST(x2*e AS HUGEINT)) AS g2, sum(CAST(x3*e AS HUGEINT)) AS g3,
         |              count(*) AS n
         |       FROM e$r),
         |w$r AS (SELECT CAST(w.w0 - g.g0 // (g.n * $etaDen) AS BIGINT) AS w0,
         |              CAST(w.w1 - g.g1 // (g.n * $etaDen) AS BIGINT) AS w1,
         |              CAST(w.w2 - g.g2 // (g.n * $etaDen) AS BIGINT) AS w2,
         |              CAST(w.w3 - g.g3 // (g.n * $etaDen) AS BIGINT) AS w3
         |       FROM w$p w, g$r g)""".stripMargin
    }
    (f +: steps).mkString(",\n")
  }

  def pageRankOracleSql(n: Int, iters: Int): String = {
    val initFx = 1000000000L / n
    val baseFx = (1000000000L * 15 / 100) / n
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT n.id, $baseFx + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, sum(p${i - 1}.pr // od.d) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN od ON e.src = od.src
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |n AS (SELECT unnest(range(0, $n)) AS id),
       |od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |p0 AS (SELECT id, $initFx AS pr FROM n),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(pr AS BIGINT) AS pr FROM p$iters ORDER BY id""".stripMargin
  }

  /** DuckDB twin of [[graft.ops.Components.katzCentrality]] — the same
    * truncated attenuation series unrolled as CTEs (no out-degree
    * division, full score down every edge). */
  def katzOracleSql(n: Int, iters: Int): String = {
    val baseFx = 1000000000L / n
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT nn.id, $baseFx + (20 * coalesce(s.c, 0)) // 100 AS katz
         |  FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, sum(p${i - 1}.katz) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |p0 AS (SELECT id, $baseFx AS katz FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(katz AS BIGINT) AS katz FROM p$iters ORDER BY id""".stripMargin
  }

  /** The q_inverted_topk CTE chain (postings, integer-linear idf, HUGEINT
    * dots/norms, ranked `r`) — shared verbatim by q_rrf's first ranking.
    */
  val invertedTopkCtes: String =
    """tfd AS (SELECT did, token, count(*) AS tf FROM
      |        (SELECT doc_id AS did, unnest(string_split_regex(text, '\s+')) AS token
      |         FROM documents WHERE text IS NOT NULL) GROUP BY did, token),
      |nn AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
      |idf AS (SELECT token, (nn.n * 100) // df AS idf
      |        FROM (SELECT token, count(*) AS df FROM tfd GROUP BY token) d, nn
      |        WHERE d.df * 1000 <= nn.n * 1000),
      |dp AS (SELECT did, token, CAST(tf * idf AS HUGEINT) AS w FROM tfd JOIN idf USING (token)),
      |qp AS (SELECT did AS qid, token, w AS wq FROM dp WHERE did < 10),
      |nd AS (SELECT did, sum(w * w) AS n2d FROM dp GROUP BY did),
      |nq AS (SELECT qid, sum(wq * wq) AS n2q FROM qp GROUP BY qid),
      |dots AS (SELECT qp.qid, dp.did, sum(dp.w * qp.wq) AS dot
      |         FROM dp JOIN qp ON qp.token = dp.token AND dp.did != qp.qid
      |         GROUP BY qp.qid, dp.did),
      |sc AS (SELECT qid, did,
      |              CAST(dot AS DOUBLE) / (sqrt(CAST(n2d AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE))) AS cos
      |       FROM dots JOIN nd USING (did) JOIN nq USING (qid)),
      |r AS (SELECT qid, did,
      |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, did ASC) AS INT) AS rank
      |      FROM sc)""".stripMargin

  /** BFS-distance oracle: the same fixed relaxation rounds with the
    * explicit NULL-CASE min tree. */
  def bfsOracleSql(n: Int, seedMod: Int, hops: Int): String = {
    val steps = (1 to hops).map { i =>
      s"""d$i AS MATERIALIZED (SELECT p.id,
         |    CASE WHEN p.dist IS NULL THEN r.nd
         |         WHEN r.nd IS NULL THEN p.dist
         |         ELSE least(p.dist, r.nd) END AS dist
         |  FROM d${i - 1} p LEFT JOIN (
         |    SELECT e.dst AS id, min(d${i - 1}.dist + 1) AS nd
         |    FROM e JOIN d${i - 1} ON e.src = d${i - 1}.id
         |    WHERE d${i - 1}.dist IS NOT NULL GROUP BY 1) r USING (id))""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |d0 AS MATERIALIZED (SELECT id, CASE WHEN id % $seedMod = 0 THEN 0 END AS dist FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(dist AS BIGINT) AS dist FROM d$hops ORDER BY id""".stripMargin
  }

  /** q_scan_types oracle: recomputes the tightest type per column through
    * the same [[Constraints.TypePatterns]] regex counts at the scan's 0.99
    * default threshold (no hardcoded answers).
    */
  def scanTypesOracle: String = {
    val cols = Seq("s_key" -> "t_key", "s_date" -> "t_date", "s_email" -> "t_email")
    val counts = cols.map(_._1).zipWithIndex.flatMap { case (c, i) =>
      s"  CAST(count(CASE WHEN $c IS NOT NULL THEN 1 END) AS BIGINT) AS nv_$i" +:
        Constraints.TypePatterns.map { case (tn, re) =>
          s"  CAST(count(CASE WHEN regexp_matches($c, '$re') THEN 1 END) AS BIGINT) AS c_${i}_$tn"
        }
    }.mkString(",\n")
    val picks = cols.zipWithIndex.map { case ((_, out), i) =>
      val sugg = Constraints.TypePatterns.map { case (tn, _) =>
        s"WHEN nv_$i > 0 AND CAST(c_${i}_$tn AS DOUBLE) >= CAST(0.99 AS DOUBLE) * CAST(nv_$i AS DOUBLE) THEN '$tn'"
      }.mkString("\n    ")
      s"CASE $sugg ELSE 'string' END AS $out"
    }.mkString(",\n")
    s"""WITH f AS (SELECT
       |  CAST(o_orderkey AS VARCHAR) AS s_key,
       |  strftime(o_orderdate, '%Y-%m-%d') AS s_date,
       |  concat('u', CAST(o_custkey AS VARCHAR), '@example.com') AS s_email
       |FROM orders),
       |m AS (SELECT
       |$counts
       |FROM f)
       |SELECT
       |$picks
       |FROM m""".stripMargin
  }

  /** Label-propagation oracle: the same deterministic synchronous rounds —
    * per node the most frequent neighbor label, ties to the smallest —
    * replayed with window-ranked argmax. MATERIALIZED per round (each
    * label frame is read twice: votes + the carry-forward left join).
    */
  def labelPropOracleSql(n: Int, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""v$i AS MATERIALIZED (SELECT s.a, l.label, count(*) AS c
         |  FROM sym s JOIN l${i - 1} l ON s.b = l.id GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT a AS id, label FROM (
         |  SELECT a, label, row_number() OVER (PARTITION BY a ORDER BY c DESC, label ASC) AS rn
         |  FROM v$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT p.id, coalesce(b.label, p.label) AS label
         |  FROM l${i - 1} p LEFT JOIN b$i b USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |sym AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e)
       |  WHERE a != b),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |l0 AS MATERIALIZED (SELECT id, id AS label FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(label AS BIGINT) AS community FROM l$iters ORDER BY id""".stripMargin
  }

  /** HITS oracle: the same L∞-normalized truncating-integer rounds as
    * [[graft.ops.Components.hits]], unrolled as CTEs — products through
    * HUGEINT (Spark: DECIMAL(38,0)), `//` ≡ `div` on non-negative values.
    */
  def hitsOracleSql(n: Int, iters: Int): String = {
    val S = 1000000000L
    // AS MATERIALIZED is load-bearing: every frame is referenced twice
    // (value + its max), so inlined CTEs would re-expand 4^iters times
    // (the q_kcore file-handle explosion)
    val steps = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT nn.id, coalesce(s.ar, 0) AS ar FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, sum(h${i - 1}.h) AS ar
         |    FROM e JOIN h${i - 1} ON e.src = h${i - 1}.id GROUP BY 1) s USING (id)),
         |a$i AS MATERIALIZED (SELECT id, CAST((CAST(ar AS HUGEINT) * $S) // greatest((SELECT max(ar) FROM ar$i), 1) AS BIGINT) AS a FROM ar$i),
         |hr$i AS MATERIALIZED (SELECT nn.id, coalesce(s.hr, 0) AS hr FROM nn LEFT JOIN (
         |    SELECT e.src AS id, sum(a$i.a) AS hr
         |    FROM e JOIN a$i ON e.dst = a$i.id GROUP BY 1) s USING (id)),
         |h$i AS MATERIALIZED (SELECT id, CAST((CAST(hr AS HUGEINT) * $S) // greatest((SELECT max(hr) FROM hr$i), 1) AS BIGINT) AS h FROM hr$i)""".stripMargin
    }
    s"""WITH e AS MATERIALIZED (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |nn AS MATERIALIZED (SELECT unnest(range(0, $n)) AS id),
       |h0 AS (SELECT id, $S AS h FROM nn),
       |${steps.mkString(",\n")}
       |SELECT h$iters.id, h$iters.h AS hub, a$iters.a AS authority
       |FROM h$iters JOIN a$iters USING (id) ORDER BY id""".stripMargin
  }

  /** [[pageRankOracleSql]] with integer edge WEIGHTS: contributions are
    * `(pr · w) // Σw(src)` — the same truncating-integer rounds.
    */
  def weightedPageRankOracleSql(n: Int, iters: Int): String = {
    val initFx = 1000000000L / n
    val baseFx = (1000000000L * 15 / 100) / n
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT nn.id, $baseFx + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM nn LEFT JOIN (
         |    SELECT e.dst AS id, sum((p${i - 1}.pr * e.w) // sw.sw) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN sw ON e.src = sw.src
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT l_suppkey % $n AS src, l_partkey % $n AS dst, count(*) AS w
       |           FROM lineitem GROUP BY 1, 2),
       |nn AS (SELECT unnest(range(0, $n)) AS id),
       |sw AS (SELECT src, sum(w) AS sw FROM e GROUP BY 1),
       |p0 AS (SELECT id, $initFx AS pr FROM nn),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(pr AS BIGINT) AS pr FROM p$iters ORDER BY id""".stripMargin
  }

  /** [[pageRankOracleSql]] with teleport mass restricted to the seed
    * predicate (id % seedMod = 0) — the same truncating-integer rounds.
    */
  def pprOracleSql(n: Int, iters: Int, seedMod: Int): String = {
    val nSeeds = n / seedMod
    val initFx = 1000000000L / nSeeds
    val baseFx = (1000000000L * 15 / 100) / nSeeds
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT n.id,
         |    (CASE WHEN n.id % $seedMod = 0 THEN $baseFx ELSE 0 END)
         |      + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id, sum(p${i - 1}.pr // od.d) AS c
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN od ON e.src = od.src
         |    GROUP BY 1) s USING (id))""".stripMargin
    }
    s"""WITH e AS (SELECT DISTINCT o_custkey % $n AS src, o_orderkey % $n AS dst FROM orders),
       |n AS (SELECT unnest(range(0, $n)) AS id),
       |od AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |p0 AS (SELECT id, CASE WHEN id % $seedMod = 0 THEN $initFx ELSE 0 END AS pr FROM n),
       |${steps.mkString(",\n")}
       |SELECT id, CAST(pr AS BIGINT) AS pr FROM p$iters ORDER BY id""".stripMargin
  }

  def thetaSketchOracleSql(k: Int): String = {
    val space = ThetaSketch60Space // 2^60 as a BIGINT literal
    s"""WITH ha AS (SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
       |            FROM orders WHERE o_custkey IS NOT NULL),
       |hb AS (SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
       |       FROM customer WHERE c_custkey IS NOT NULL),
       |ka AS (SELECT h FROM ha ORDER BY h LIMIT $k),
       |kb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
       |ta AS (SELECT CASE WHEN (SELECT count(*) FROM ka) >= $k THEN (SELECT max(h) FROM ka) ELSE $space END AS th),
       |tb AS (SELECT CASE WHEN (SELECT count(*) FROM kb) >= $k THEN (SELECT max(h) FROM kb) ELSE $space END AS th),
       |va AS (SELECT h FROM ka WHERE h < (SELECT th FROM ta)),
       |vb AS (SELECT h FROM kb WHERE h < (SELECT th FROM tb)),
       |tm AS (SELECT least((SELECT th FROM ta), (SELECT th FROM tb)) AS th),
       |vam AS (SELECT h FROM va WHERE h < (SELECT th FROM tm)),
       |vbm AS (SELECT h FROM vb WHERE h < (SELECT th FROM tm)),
       |u0 AS (SELECT h FROM vam UNION SELECT h FROM vbm),
       |uk AS (SELECT h FROM u0 ORDER BY h LIMIT $k),
       |tu AS (SELECT CASE WHEN (SELECT count(*) FROM u0) >= $k THEN (SELECT max(h) FROM uk) ELSE (SELECT th FROM tm) END AS th),
       |ur AS (SELECT h FROM uk WHERE h < (SELECT th FROM tu)),
       |ir AS (SELECT h FROM vam INTERSECT SELECT h FROM vbm),
       |dr AS (SELECT h FROM vam EXCEPT SELECT h FROM vbm),
       |res AS (
       |  SELECT 'distinct_a' AS set_op, (SELECT count(*) FROM va) AS retained, (SELECT th FROM ta) AS theta
       |  UNION ALL SELECT 'distinct_b', (SELECT count(*) FROM vb), (SELECT th FROM tb)
       |  UNION ALL SELECT 'union', (SELECT count(*) FROM ur), (SELECT th FROM tu)
       |  UNION ALL SELECT 'intersection', (SELECT count(*) FROM ir), (SELECT th FROM tm)
       |  UNION ALL SELECT 'difference', (SELECT count(*) FROM dr), (SELECT th FROM tm))
       |SELECT set_op, CAST(retained AS BIGINT) AS retained, theta,
       |       CAST(retained AS DOUBLE) / (CAST(theta AS DOUBLE) / $space.0) AS estimate
       |FROM res ORDER BY set_op""".stripMargin
  }
  val ThetaSketch60Space: String = (1L << 60).toString

  /** Exact-round-trip double literal for SQL (e-notation forces DOUBLE in
    * DuckDB; shortest-repr decimal parses back to the identical double).
    */
  def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E")) s.replace("E", "e") else s + "e0"
  }

  /** LSH-ANN oracle: the hyperplane constants are generated by the SAME
    * seeded code as lshTopK and inlined as literals; DuckDB recomputes the
    * sign-bit buckets, candidate union and exact cosine top-k.
    */
  def lshAnnOracleSql(k: Int, tables: Int, planes: Int, dim: Int, seed: Long): String = {
    val hps = graft.ops.Similarity.hyperplanes(tables, planes, dim, seed)
    def bucketExpr(t: Int): String = (0 until planes).map { i =>
      val hp = hps(t)(i).map(dlit).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(embedding, $hp) > 0.0e0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    def side(alias: String, filter: String): String = (0 until tables).map { t =>
      s"SELECT vec_id AS $alias, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings$filter"
    }.mkString(" UNION ALL ")
    s"""WITH c AS (${side("nid", "")}),
       |q AS (${side("qid", " WHERE vec_id < 10")}),
       |cand AS (SELECT DISTINCT q.qid, c.nid
       |         FROM c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.nid != q.qid),
       |s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(e.embedding, qe.embedding) AS cos
       |      FROM cand JOIN embeddings e ON e.vec_id = cand.nid
       |                JOIN embeddings qe ON qe.vec_id = cand.qid),
       |r AS (SELECT qid, nid,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
       |      FROM s)
       |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Multi-probe LSH oracle (probes = 2, planes = 4): corpus side identical
    * to [[lshAnnOracleSql]]; the query side emits its home bucket AND the
    * single-bit flip of its smallest-|dot| plane (sequential argmin CASE,
    * ties to the lower plane index — the gate's array_sort tie-break).
    */
  def lshMultiProbeOracleSql(k: Int, tables: Int, dim: Int, seed: Long): String = {
    val planes = 4
    val hps = graft.ops.Similarity.hyperplanes(tables, planes, dim, seed)
    def dotE(t: Int, i: Int) =
      s"list_dot_product(embedding, ${hps(t)(i).map(dlit).mkString("[", ", ", "]")})"
    def bucketExpr(t: Int): String = (0 until planes).map { i =>
      s"(CASE WHEN ${dotE(t, i)} > 0.0e0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    def flipExpr(t: Int): String = {
      def a(i: Int) = s"abs(${dotE(t, i)})"
      s"CASE WHEN ${a(0)} <= ${a(1)} AND ${a(0)} <= ${a(2)} AND ${a(0)} <= ${a(3)} THEN 1 " +
        s"WHEN ${a(1)} <= ${a(2)} AND ${a(1)} <= ${a(3)} THEN 2 " +
        s"WHEN ${a(2)} <= ${a(3)} THEN 4 ELSE 8 END"
    }
    val cSide = (0 until tables).map { t =>
      s"SELECT vec_id AS nid, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings"
    }.mkString(" UNION ALL ")
    val qSide = (0 until tables).map { t =>
      s"""SELECT vec_id AS qid, $t AS tbl, ${bucketExpr(t)} AS bucket FROM embeddings WHERE vec_id < 10
         |UNION ALL
         |SELECT vec_id AS qid, $t AS tbl, xor(${bucketExpr(t)}, ${flipExpr(t)}) AS bucket FROM embeddings WHERE vec_id < 10""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH c AS ($cSide),
       |q AS ($qSide),
       |cand AS (SELECT DISTINCT q.qid, c.nid
       |         FROM c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.nid != q.qid),
       |s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(e.embedding, qe.embedding) AS cos
       |      FROM cand JOIN embeddings e ON e.vec_id = cand.nid
       |                JOIN embeddings qe ON qe.vec_id = cand.qid),
       |r AS (SELECT qid, nid,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
       |      FROM s)
       |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-ANN oracle: same deterministic coarse quantizer (the ncells
    * smallest-id vectors as seeds, argmax cosine with larger-cell tie-break),
    * nprobe probed cells, exact cosine top-k within probed cells.
    * `queryFilter` = "" makes every vector a query (the kNN-graph gate).
    */
  /** The IVF probe/score CTE chain up to ranked candidate edges
    * (`r` = qid, nid, cos, rank) — shared by the ANN rank oracles and the
    * margin-scoring oracle.
    */
  def ivfAnnEdgesSql(ncells: Int, nprobe: Int, queryFilter: String): String =
    s"""seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS sv
       |               FROM embeddings ORDER BY vec_id LIMIT $ncells),
       |asg AS (SELECT e.vec_id AS nid, s.cell,
       |               row_number() OVER (PARTITION BY e.vec_id
       |                 ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
       |        FROM embeddings e CROSS JOIN seeds s),
       |best AS (SELECT nid, cell FROM asg WHERE rn = 1),
       |qprobe AS (SELECT qid, cell FROM (
       |             SELECT e.vec_id AS qid, s.cell,
       |                    row_number() OVER (PARTITION BY e.vec_id
       |                      ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
       |             FROM embeddings e CROSS JOIN seeds s$queryFilter)
       |           WHERE rn <= $nprobe),
       |cand AS (SELECT DISTINCT q.qid, b.nid FROM qprobe q JOIN best b ON b.cell = q.cell
       |         WHERE b.nid != q.qid),
       |s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(e.embedding, qe.embedding) AS cos
       |      FROM cand JOIN embeddings e ON e.vec_id = cand.nid
       |                JOIN embeddings qe ON qe.vec_id = cand.qid),
       |r AS (SELECT qid, nid, cos,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank
       |      FROM s)""".stripMargin

  def ivfAnnOracleSql(k: Int, ncells: Int, nprobe: Int,
                              queryFilter: String = " WHERE e.vec_id < 10"): String =
    s"""WITH ${ivfAnnEdgesSql(ncells, nprobe, queryFilter)}
       |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Ratio-margin oracle: the same IVF edges, per-node neighborhood means
    * summed in rank-slot order (the gate's fixed association), margin =
    * cos / (mean of endpoint means), re-ranked per query.
    */
  def knnMarginOracleSql(k: Int, ncells: Int, nprobe: Int): String = {
    val slots = (1 to k)
      .map(r => s"coalesce(max(cos) FILTER (WHERE rank = $r), 0.0)")
      .mkString(" + ")
    s"""WITH ${ivfAnnEdgesSql(ncells, nprobe, "")},
       |g AS (SELECT qid, nid, cos, rank FROM r WHERE rank <= $k),
       |a AS (SELECT qid AS node_id,
       |             ($slots) / CAST(count(*) AS DOUBLE) AS avg_cos
       |      FROM g GROUP BY qid),
       |m AS (SELECT g.qid, g.nid,
       |             g.cos / ((qa.avg_cos + na.avg_cos) / 2.0) AS margin
       |      FROM g JOIN a qa ON qa.node_id = g.qid
       |             JOIN a na ON na.node_id = g.nid)
       |SELECT qid AS query_id,
       |       CAST(row_number() OVER (PARTITION BY qid
       |                               ORDER BY margin DESC, nid ASC) AS INT) AS margin_rank,
       |       nid AS neighbor_id
       |FROM m ORDER BY query_id, margin_rank""".stripMargin
  }

  /** Shared by q_dedup_jaccard_inv and q_dedup_jaccard_prefix: both
    * strategies contract to the identical (id_a, id_b, inter, union_size)
    * output at threshold 0.9 within (lang, source) blocks. */
  val jaccardInvOracle: String =
    """WITH d AS (SELECT doc_id, lang, source, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
      |t AS (SELECT doc_id, lang, source, len(toks) AS nt, unnest(toks) AS tok FROM d)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |       a.nt + b.nt - count(*) AS union_size
      |FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
      |                 AND a.tok = b.tok AND a.doc_id < b.doc_id
      |GROUP BY a.doc_id, b.doc_id, a.nt, b.nt
      |HAVING CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /** q_benford oracle, generated from the same [[Constraints.BenfordP]]
    * literals the Spark side binds: Scala's Double.toString round-trips
    * (shortest repr), so the SQL literal parses back to the identical
    * double and the chi2 left-fold replays bit-for-bit.
    */
  def benfordOracle: String = {
    val cols = Seq("l_extendedprice", "l_quantity")
    val p = Constraints.BenfordP.toMap
    val fx = cols.zipWithIndex.map { case (c, i) =>
      s"  CAST(CASE WHEN $c >= 0 THEN floor($c * 100.0 + 0.5) ELSE -floor(-$c * 100.0 + 0.5) END AS BIGINT) AS v$i"
    }.mkString(",\n")
    val dg = cols.indices.map { i =>
      s"  CASE WHEN v$i IS NOT NULL AND v$i != 0 THEN CAST(substr(CAST(abs(v$i) AS VARCHAR), 1, 1) AS INTEGER) END AS d$i"
    }.mkString(",\n")
    val counts = cols.indices.flatMap { i =>
      s"  count(CASE WHEN d$i IS NOT NULL THEN 1 END) AS n$i" +:
        (1 to 9).map(d => s"  count(CASE WHEN d$i = $d THEN 1 END) AS c${i}_$d")
    }.mkString(",\n")
    def term(i: Int, d: Int) =
      s"(CAST(c${i}_$d AS DOUBLE) - CAST(n$i AS DOUBLE) * ${p(d)}) * " +
        s"(CAST(c${i}_$d AS DOUBLE) - CAST(n$i AS DOUBLE) * ${p(d)}) / (CAST(n$i AS DOUBLE) * ${p(d)})"
    val branches = cols.zipWithIndex.flatMap { case (c, i) =>
      val chi2 = (1 to 9).map(d => term(i, d)).mkString(" + ")
      (1 to 9).map { d =>
        s"""SELECT '$c' AS col_name, $d AS digit, c${i}_$d AS observed, n$i AS n,
           |  CASE WHEN n$i > 0 THEN CAST(c${i}_$d AS DOUBLE) / CAST(n$i AS DOUBLE) END AS share,
           |  CAST(${p(d)} AS DOUBLE) AS benford_p,
           |  CASE WHEN n$i > 0 THEN ${term(i, d)} END AS chi2_term,
           |  CASE WHEN n$i > 0 THEN $chi2 END AS chi2
           |FROM m""".stripMargin
      }
    }.mkString("\nUNION ALL\n")
    s"WITH f AS (SELECT\n$fx\nFROM lineitem),\ng AS (SELECT\n$dg\nFROM f),\nm AS (SELECT\n$counts\nFROM g)\nSELECT * FROM (\n$branches\n) ORDER BY col_name, digit"
  }

  /** q_type_infer oracle, generated from the same [[Constraints.TypePatterns]]
    * regexes and precedence chain the Spark side binds. */
  def typeInferOracle: String = {
    val cols = Seq("s_key", "s_dec", "s_date", "s_ts", "s_bool", "s_mixed", "s_email", "s_uuid")
    val counts = cols.zipWithIndex.flatMap { case (c, i) =>
      s"  CAST(count(CASE WHEN $c IS NOT NULL THEN 1 END) AS BIGINT) AS nv_$i" +:
        Constraints.TypePatterns.map { case (tn, re) =>
          s"  CAST(count(CASE WHEN regexp_matches($c, '$re') THEN 1 END) AS BIGINT) AS c_${i}_$tn"
        }
    }.mkString(",\n")
    val branches = cols.zipWithIndex.map { case (c, i) =>
      val sugg = Constraints.TypePatterns.map { case (tn, _) =>
        s"WHEN nv_$i > 0 AND CAST(c_${i}_$tn AS DOUBLE) >= CAST(0.8 AS DOUBLE) * CAST(nv_$i AS DOUBLE) THEN '$tn'"
      }.mkString("\n    ")
      val typeCols = Constraints.TypePatterns
        .map { case (tn, _) => s"c_${i}_$tn AS n_$tn" }.mkString(", ")
      s"""SELECT '$c' AS col_name, nv_$i AS n_values, $typeCols,
         |  CASE $sugg ELSE 'string' END AS suggested
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH f AS (SELECT
       |  CAST(o_orderkey AS VARCHAR) AS s_key,
       |  concat(CAST(o_orderkey AS VARCHAR), '.', CAST(o_custkey % 100 AS VARCHAR)) AS s_dec,
       |  strftime(o_orderdate, '%Y-%m-%d') AS s_date,
       |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS s_ts,
       |  CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'FALSE' END AS s_bool,
       |  CASE WHEN o_orderkey % 10 = 0 THEN 'N/A' ELSE CAST(o_custkey AS VARCHAR) END AS s_mixed,
       |  concat('u', CAST(o_custkey AS VARCHAR), '@example.com') AS s_email,
       |  concat(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 4), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 13, 4), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 17, 4), '-', substr(md5(CAST(o_orderkey AS VARCHAR)), 21, 12)) AS s_uuid
       |FROM orders),
       |m AS (SELECT
       |$counts
       |FROM f)
       |SELECT * FROM (
       |$branches
       |) ORDER BY col_name""".stripMargin
  }

  /** q_kcore oracle: `rounds` unrolled peel rounds (each = degree filter on
    * both endpoints); converged rounds are identity, so this equals the
    * capped Spark iteration exactly. */
  def kCoreOracle(k: Int, rounds: Int): String = {
    // MATERIALIZED: inlined CTEs would re-expand e0 ~5× per round
    val base = """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
                 |  FROM lineitem a JOIN lineitem b
                 |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                 |  WHERE (a.l_partkey + b.l_partkey) % 11 = 0)""".stripMargin
    val steps = (0 until rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v, count(*) AS dg FROM (SELECT a AS v FROM e$i UNION ALL SELECT b AS v FROM e$i) GROUP BY 1),
         |e${i + 1} AS MATERIALIZED (SELECT e$i.a, e$i.b FROM e$i
         |  JOIN d$i x ON x.v = e$i.a JOIN d$i y ON y.v = e$i.b
         |  WHERE x.dg >= $k AND y.dg >= $k)""".stripMargin
    }
    s"""WITH $base,
       |${steps.mkString(",\n")}
       |SELECT v AS node, CAST(count(*) AS BIGINT) AS degree
       |FROM (SELECT a AS v FROM e$rounds UNION ALL SELECT b AS v FROM e$rounds)
       |GROUP BY 1 ORDER BY node""".stripMargin
  }

  /** q_mutual_info oracle: one CTE block per pair replicating the cell
    * shuffle, window marginals, scale-9 sign-adjusted term quantization and
    * the derived double tree. */
  /** DuckDB twin of [[graft.ops.Outliers.holtWinters]] (period 4, α 3/10,
    * β 2/10, γ 5/10): list_reduce over (3+m)-long LIST state — the first
    * transformed element [v,0,1,0,0,0,0] is the seed, e/d inlined since
    * SQL lambdas have no lets.
    */
  def holtWintersOracle: String = {
    val e = "(x[1] - acc[1] - acc[2] - acc[4 + acc[3] % 4])"
    val d = s"(($e) * 3) // 10"
    s"""WITH f AS (SELECT user_id, event_id,
       |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
       |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
       |FROM events WHERE value IS NOT NULL),
       |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |             list(v ORDER BY event_id) AS vs
       |      FROM f GROUP BY 1),
       |st AS (SELECT user_id, n, list_reduce(
       |    list_transform(vs, v -> [v, 0::BIGINT, 1::BIGINT,
       |                             0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT]),
       |    (acc, x) -> list_concat(
       |      [acc[1] + acc[2] + ($d),
       |       acc[2] + (($d) * 2) // 10,
       |       acc[3] + 1],
       |      list_transform(range(4), k -> CASE WHEN k = acc[3] % 4
       |        THEN acc[4 + k] + ((($e) - ($d)) * 5) // 10
       |        ELSE acc[4 + k] END))) AS s
       |  FROM g)
       |SELECT user_id, n,
       |  CAST(s[1] AS BIGINT) AS level_fx, CAST(s[2] AS BIGINT) AS trend_fx,
       |  CAST(s[4] AS BIGINT) AS s0, CAST(s[5] AS BIGINT) AS s1,
       |  CAST(s[6] AS BIGINT) AS s2, CAST(s[7] AS BIGINT) AS s3,
       |  CAST(CAST(s[1] AS BIGINT) AS DOUBLE) / 100.0 AS level,
       |  CAST(s[1] + s[2] + s[4 + n % 4] AS DOUBLE) / 100.0 AS forecast
       |FROM st ORDER BY user_id""".stripMargin
  }

  /** DuckDB twin of [[graft.ops.Constraints.categoryEntropy]] over the
    * documents table: per-column cells → exact n/Σc² + fx-9 entropy terms
    * (n staged in its own CTE — a window inside an aggregate is illegal).
    */
  def catEntropyOracle(cols: Seq[String]): String = {
    val S = "1000000000.0"
    def block(i: Int, c: String): String = {
      val p = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
      val term = s"-$p * ln($p)"
      s"""c$i AS (SELECT CAST($c AS VARCHAR) AS v, count(*) AS c FROM documents
         |  WHERE $c IS NOT NULL GROUP BY 1),
         |n$i AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM c$i),
         |m$i AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS cats,
         |    CAST(sum(CASE WHEN $term >= 0
         |      THEN CAST(floor(($term) * $S + 0.5) AS BIGINT)
         |      ELSE -CAST(floor(-($term) * $S + 0.5) AS BIGINT) END) AS BIGINT) AS hfx,
         |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS c2
         |  FROM c$i, n$i)""".stripMargin
    }
    def sel(i: Int, c: String): String =
      s"""SELECT '$c' AS "column", n, cats AS categories,
         |  CAST(hfx AS DOUBLE) / $S AS entropy,
         |  exp(CAST(hfx AS DOUBLE) / $S) AS eff_exp_h,
         |  CASE WHEN c2 > 0 THEN CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
         |       / CAST(c2 AS DOUBLE) END AS eff_simpson
         |FROM m$i""".stripMargin
    s"""WITH ${cols.zipWithIndex.map { case (c, i) => block(i, c) }.mkString(",\n")}
       |SELECT * FROM (
       |${cols.zipWithIndex.map { case (c, i) => sel(i, c) }.mkString("\nUNION ALL\n")}
       |) ORDER BY "column"""".stripMargin
  }

  def mutualInfoOracle: String = {
    val S = "1000000000.0"
    def fx(t: String) =
      s"CASE WHEN $t >= 0 THEN CAST(floor(($t) * $S + 0.5) AS BIGINT) ELSE -CAST(floor(-($t) * $S + 0.5) AS BIGINT) END"
    def block(i: Int, tbl: String, a: String, b: String): String = {
      val miT = s"(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))"
      val hT = s"-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
      s"""c$i AS (SELECT $a AS a, $b AS b, count(*) AS o FROM $tbl
         |  WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2),
         |n$i AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c$i),
         |w$i AS (SELECT o, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c$i),
         |mi$i AS (SELECT CAST(sum(${fx(miT)}) AS BIGINT) AS mi_fx FROM w$i CROSS JOIN n$i),
         |ha$i AS (SELECT CAST(sum(${fx(hT)}) AS BIGINT) AS ha_fx
         |  FROM (SELECT sum(o) AS r FROM c$i GROUP BY a) CROSS JOIN n$i),
         |hb$i AS (SELECT CAST(sum(${fx(hT)}) AS BIGINT) AS hb_fx
         |  FROM (SELECT sum(o) AS r FROM c$i GROUP BY b) CROSS JOIN n$i)""".stripMargin
    }
    def sel(i: Int, pair: String): String =
      s"""SELECT '$pair' AS pair, n,
         |  CAST(ha_fx AS DOUBLE) / $S AS h_a, CAST(hb_fx AS DOUBLE) / $S AS h_b,
         |  CAST(mi_fx AS DOUBLE) / $S AS mi,
         |  CASE WHEN CAST(ha_fx AS DOUBLE) / $S + CAST(hb_fx AS DOUBLE) / $S > 0.0
         |       THEN 2.0 * (CAST(mi_fx AS DOUBLE) / $S) / (CAST(ha_fx AS DOUBLE) / $S + CAST(hb_fx AS DOUBLE) / $S) END AS nmi
         |FROM mi$i CROSS JOIN ha$i CROSS JOIN hb$i CROSS JOIN n$i""".stripMargin
    s"""WITH ${block(1, "orders", "o_orderstatus", "o_orderpriority")},
       |${block(2, "lineitem", "l_returnflag", "l_linestatus")}
       |SELECT * FROM (
       |${sel(1, "o_orderstatus~o_orderpriority")}
       |UNION ALL
       |${sel(2, "l_returnflag~l_linestatus")}
       |) ORDER BY pair""".stripMargin
  }

  /** DuckDB twin of [[graft.ops.Correlation.periodogram]] over the daily
    * event-count series — the trig table embeds the SAME doubles the
    * Spark literal arrays carry (round-trip-exact decimal strings), so
    * cross-libm cos/sin drift never enters either side. */
  def periodogramOracle(periods: Seq[Int]): String = {
    val trig = periods.flatMap { p =>
      val (c, s) = graft.ops.Correlation.trigTable(p)
      (0 until p).map(i => s"($p, $i, ${c(i)}, ${s(i)})")
    }.mkString(",\n|  ")
    s"""WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
       |                    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
       |trig(period, phase, c, s) AS (VALUES
       |  $trig),
       |f AS (SELECT event_type, period,
       |             CAST(v AS DOUBLE) * c AS tc, CAST(v AS DOUBLE) * s AS ts2
       |      FROM ser JOIN trig ON ser.d % trig.period = trig.phase),
       |a AS (SELECT event_type, period, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CASE WHEN tc >= 0 THEN CAST(floor(tc * 1000000.0 + 0.5) AS BIGINT)
       |                 ELSE -CAST(floor(-tc * 1000000.0 + 0.5) AS BIGINT) END) AS BIGINT) AS sc_fx,
       |        CAST(sum(CASE WHEN ts2 >= 0 THEN CAST(floor(ts2 * 1000000.0 + 0.5) AS BIGINT)
       |                 ELSE -CAST(floor(-ts2 * 1000000.0 + 0.5) AS BIGINT) END) AS BIGINT) AS ss_fx
       |      FROM f GROUP BY 1, 2)
       |SELECT event_type, period, n, sc_fx, ss_fx,
       |       (CAST(sc_fx AS DOUBLE) / 1000000.0 * (CAST(sc_fx AS DOUBLE) / 1000000.0)
       |        + CAST(ss_fx AS DOUBLE) / 1000000.0 * (CAST(ss_fx AS DOUBLE) / 1000000.0))
       |       / CAST(n AS DOUBLE) AS power
       |FROM a ORDER BY event_type, period""".stripMargin
  }

  /** DuckDB twin of [[graft.scan.Drift.jonckheereTerpstra]] over the
    * orders priority tiers — generated so the k cumulative columns, the
    * k(k−1)/2 pair terms and every variance tree mirror the Spark
    * operator exactly. */
  def jtOracle(groups: Seq[String]): String = {
    val k = groups.size
    val inList = groups.map(g => s"'$g'").mkString(", ")
    val cCols = groups.zipWithIndex.map { case (g, i) =>
      s"CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
    }.mkString(",\n|        ")
    val kCols = (0 until k).map(i =>
      s"sum(c$i) OVER (ORDER BY v) AS k$i").mkString(",\n|        ")
    val cList = (0 until k).map(i => s"c$i").mkString(", ")
    val pairTerms = (for { i <- 0 until k; j <- (i + 1) until k } yield
      s"CAST(c$j AS HUGEINT) * (k$i * 2 - c$i)").mkString("\n|          + ")
    val tSum = (0 until k).map(i => s"c$i").mkString(" + ")
    val nCols = (0 until k).map(i =>
      s"CAST(sum(c$i) AS BIGINT) AS n$i").mkString(", ")
    val nSum = (0 until k).map(i => s"n$i").mkString(" + ")
    def gSum(body: String) =
      (0 until k).map(i => s"CAST(n$i AS HUGEINT)${body.replace("m", s"n$i")}")
        .mkString(" + ")
    val saSql = gSum(" * (m - 1) * (2 * m + 5)")
    val sbSql = gSum(" * (m - 1) * (m - 2)")
    val scSql = gSum(" * (m - 1)")
    val sqSql = (0 until k).map(i => s"CAST(n$i AS HUGEINT) * n$i").mkString(" + ")
    s"""WITH u AS (SELECT o_orderpriority AS g,
       |       CAST(CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice * 100.0 + 0.5)
       |            ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT) AS v
       |  FROM orders WHERE o_orderpriority IN ($inList)),
       |c AS (SELECT v,
       |        $cCols
       |      FROM u GROUP BY v),
       |kk AS (SELECT v, $cList,
       |        $kCols FROM c),
       |m AS (SELECT
       |        sum($pairTerms) AS j2,
       |        sum(CAST(($tSum) AS HUGEINT) * (($tSum) - 1) * (($tSum) * 2 + 5)) AS ta,
       |        sum(CAST(($tSum) AS HUGEINT) * (($tSum) - 1) * (($tSum) - 2)) AS tb,
       |        sum(CAST(($tSum) AS HUGEINT) * (($tSum) - 1)) AS tc
       |      FROM kk),
       |ng AS (SELECT $nCols FROM c),
       |st AS (SELECT CAST($nSum AS BIGINT) AS n,
       |              $saSql AS sa, $sbSql AS sb, $scSql AS sc,
       |              $sqSql AS sq FROM ng),
       |fin AS (SELECT m.j2, m.ta, m.tb, m.tc, st.n, st.sa, st.sb, st.sc,
       |               (CAST(st.n AS HUGEINT) * st.n - st.sq) // 2 AS ej2,
       |               CAST(st.n AS HUGEINT) * (st.n - 1) * (2 * st.n + 5) AS nterm
       |        FROM m, st),
       |d AS (SELECT CAST(j2 AS DOUBLE) AS j2d, CAST(ej2 AS DOUBLE) AS ej2d,
       |             CAST(n AS DOUBLE) AS nd,
       |             (CAST(nterm AS DOUBLE) - CAST(sa AS DOUBLE) - CAST(ta AS DOUBLE)) / 72.0
       |             + CAST(sb AS DOUBLE) * CAST(tb AS DOUBLE)
       |               / (36.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 2.0))
       |             + CAST(sc AS DOUBLE) * CAST(tc AS DOUBLE)
       |               / (8.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS varj,
       |             n FROM fin)
       |SELECT CAST($k AS BIGINT) AS groups, n, j2d AS j2, ej2d AS e_j2,
       |       CASE WHEN varj > 0.0 THEN (j2d - ej2d) / 2.0 / sqrt(varj) END AS z
       |FROM d""".stripMargin
  }

  /** DuckDB twin of [[graft.ops.Correlation.theilsU]] — the
    * [[mutualInfoOracle]] blocks with the asymmetric U = I/H selects. */
  def theilsUOracle: String = {
    val S = "1000000000.0"
    def fx(t: String) =
      s"CASE WHEN $t >= 0 THEN CAST(floor(($t) * $S + 0.5) AS BIGINT) ELSE -CAST(floor(-($t) * $S + 0.5) AS BIGINT) END"
    def block(i: Int, tbl: String, a: String, b: String): String = {
      val miT = s"(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))"
      val hT = s"-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
      s"""c$i AS (SELECT $a AS a, $b AS b, count(*) AS o FROM $tbl
         |  WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2),
         |n$i AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c$i),
         |w$i AS (SELECT o, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c$i),
         |mi$i AS (SELECT CAST(sum(${fx(miT)}) AS BIGINT) AS mi_fx FROM w$i CROSS JOIN n$i),
         |ha$i AS (SELECT CAST(sum(${fx(hT)}) AS BIGINT) AS ha_fx
         |  FROM (SELECT sum(o) AS r FROM c$i GROUP BY a) CROSS JOIN n$i),
         |hb$i AS (SELECT CAST(sum(${fx(hT)}) AS BIGINT) AS hb_fx
         |  FROM (SELECT sum(o) AS r FROM c$i GROUP BY b) CROSS JOIN n$i)""".stripMargin
    }
    def sel(i: Int, pair: String): String =
      s"""SELECT '$pair' AS pair, n,
         |  CASE WHEN CAST(ha_fx AS DOUBLE) / $S > 0.0
         |       THEN (CAST(mi_fx AS DOUBLE) / $S) / (CAST(ha_fx AS DOUBLE) / $S) END AS u_a_given_b,
         |  CASE WHEN CAST(hb_fx AS DOUBLE) / $S > 0.0
         |       THEN (CAST(mi_fx AS DOUBLE) / $S) / (CAST(hb_fx AS DOUBLE) / $S) END AS u_b_given_a
         |FROM mi$i CROSS JOIN ha$i CROSS JOIN hb$i CROSS JOIN n$i""".stripMargin
    s"""WITH ${block(1, "orders", "o_orderstatus", "o_orderpriority")},
       |${block(2, "lineitem", "l_returnflag", "l_linestatus")}
       |SELECT * FROM (
       |${sel(1, "o_orderstatus~o_orderpriority")}
       |UNION ALL
       |${sel(2, "l_returnflag~l_linestatus")}
       |) ORDER BY pair""".stripMargin
  }

}
