package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sampling, splits, packing, budgets and dataset cards. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object SamplingQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bootstrap" -> ((s, dir) =>
      // deterministic Poisson multiplier bootstrap of the mean doc
      // length: 20 hash-seeded resamples in ONE skinny shuffle — the
      // resampling uncertainty a variance number understates for skewed
      // columns; integer threshold weights, exact sums
      Sampling.bootstrapMeans(t(s, dir, "documents"), "doc_id", "n_chars",
        resamples = 20)),

    "q_top_pct" -> ((s, dir) =>
      // per-group quality-threshold calibration: keep the top 20% of each
      // language by length — exact-integer keep rule (rank*100 <= n*pct),
      // group-bounded windows only
      Sampling.topPercentByGroup(t(s, dir, "documents"), "lang", "n_chars",
          tieCols = Seq("doc_id"), pct = 20)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "q_budget_by_lang" -> { (s, dir) =>
      // mixture-weighted budgets: each language fills ITS OWN token
      // budget (2000·(lang-ordinal+1)) with its best quality-per-token
      // docs — group-bounded greedy, same md5 pseudo-quality as
      // q_budget_select
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tokens"),
        (graft.ops.Shingles.md5Hash60(
          concat(col("doc_id").cast("string"), lit("|q"))) % 1000L).as("score"))
      val budgets = docs.select(col("lang")).distinct()
        .withColumn("budget",
          (ascii(substring(col("lang"), 1, 1)).cast(LongType) % 5L + 1L) * 2000L)
      Sampling.budgetSelectByGroup(scored, "lang", "doc_id", "n_tokens",
          "score", budgets, "lang", "budget")
        .select("doc_id", "lang", "n_tokens", "score", "ratio", "cum_tokens")
        .orderBy("lang", "cum_tokens")
    },

    "q_budget_select" -> { (s, dir) =>
      // token-budget curation knapsack: fill 12k training tokens with the
      // best quality-per-token documents (greedy by ratio, boundary doc
      // dropped); pseudo-quality from the shared md5-60 hash so both
      // engines grade identically
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast(LongType).as("n_tokens"),
        (graft.ops.Shingles.md5Hash60(
          concat(col("doc_id").cast("string"), lit("|q"))) % 1000L).as("score"))
      Sampling.budgetSelect(scored, "doc_id", "n_tokens", "score", 12000L)
        .select("doc_id", "n_tokens", "score", "ratio", "cum_tokens")
        .orderBy("cum_tokens")
    },

    "q_sample_hash" -> ((s, dir) =>
      // deterministic hash sample: reproducible across runs/partitionings;
      // md5Hash60 keying makes the exact kept-set oracle-checkable
      Sampling.hashSample(t(s, dir, "documents"), "doc_id", fraction = 0.1,
          hasher = Shingles.md5Hash60)
        .select("doc_id").orderBy("doc_id")),

    "q_cap_per_key" -> ((s, dir) =>
      // web-corpus domain capping: <= ~10 docs per source (25-250 exist per
      // source at gate SFs, so the fraction path is exercised), deterministic
      // hash-fraction rule; md5Hash60 keying makes the exact kept set
      // oracle-checkable
      Sampling.capPerKey(t(s, dir, "documents"), "source", "doc_id", maxRows = 10,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "source").orderBy("doc_id")),

    "q_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedHashSample(t(s, dir, "documents"), "doc_id", "lang",
          fractions = Map("en" -> 0.2, "es" -> 0.5), defaultFraction = 0.05,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_mixture_sample" -> ((s, dir) =>
      // data mixing: resample documents toward a 50/30/20 en/es/de target
      // mixture — exact stratum counts set integer keep thresholds the
      // oracle recomputes with the identical double tree; other langs drop
      Sampling.mixtureSample(t(s, dir, "documents"), "doc_id", "lang",
          targets = Map("en" -> 0.5, "es" -> 0.3, "de" -> 0.2),
          hasher = Shingles.md5Hash60)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_dataset_card" -> ((s, dir) =>
      // the one-row corpus documentation artifact — every stat rides ONE
      // scan/aggregate pass; md5-60 text hashing makes the exact-dup rate
      // oracle-checkable
      Card.report(t(s, dir, "documents"), "text", "lang", "source",
        textHasher = Shingles.md5Hash60)),

    "q_card_by_lang" -> ((s, dir) =>
      // the per-segment card: same fused pass grouped by language —
      // the mixture documentation rows
      Card.reportBy(t(s, dir, "documents"), "lang", "text", "lang", "source",
        textHasher = Shingles.md5Hash60)
        .orderBy("grp")),

    "q_probe_weights" -> { (s, dir) =>
      // in-engine model training: 5 rounds of fixed-point full-batch GD
      // (one gradient aggregate + a 4-long driver update per round); the
      // integer dynamics replay bit-identically, so the oracle re-trains
      // the same model in SQL and the WEIGHTS themselves are the gate
      import s.implicits._
      val feat = LinearProbe.featureFrame(t(s, dir, "documents"), "doc_id", "text", "n_chars")
      val w = LinearProbe.train(feat, 4, rounds = 5, etaDen = 50000L).last
      Seq((w(0), w(1), w(2), w(3))).toDF("w0", "w1", "w2", "w3")
    },

    "q_probe_scores" -> { (s, dir) =>
      // row-local corpus scoring with the trained probe (weights bound as
      // literals — the serve path after training)
      val feat = LinearProbe.featureFrame(t(s, dir, "documents"), "doc_id", "text", "n_chars")
      val w = LinearProbe.train(feat, 4, rounds = 5, etaDen = 50000L).last
      LinearProbe.scores(feat, w).select(col("id").as("doc_id"), col("pred_fx")).orderBy("doc_id")
    },

    "q_mixture_temp" -> ((s, dir) =>
      // p^alpha temperature mixing at alpha=0.5: targets are sqrt(observed
      // counts), unnormalized (nmax scaling is factor-invariant), so the
      // whole decision replays in SQL with sqrt's correctly-rounded IEEE
      Sampling.temperatureSample(t(s, dir, "documents"), "doc_id", "source",
          alpha = 0.5, hasher = Shingles.md5Hash60)
        .select("doc_id", "source").orderBy("doc_id")),

    "q_split_assign" -> ((s, dir) =>
      // deterministic train/val/test assignment keyed on a salted hash of
      // doc_id (row-local, rerun-stable); the gate reports per-(source,
      // split) counts + an id checksum so every row's assignment is covered
      Sampling.assignSplit(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          hasher = Shingles.md5Hash60)
        .groupBy("source", "split")
        .agg(count(lit(1)).as("cnt"), sum("doc_id").as("id_sum"))
        .orderBy("source", "split")),

    "q_pipeline_e2e" -> { (s, dir) =>
      // the COMPOSED curation pipeline, end-to-end in one lazy plan:
      // quality filter -> cross-doc passage dedup -> exact dedup on the
      // rewritten text -> deterministic 50% sample. Every stage is oracled
      // alone elsewhere; this gate proves they compose bit-exactly.
      val docs = t(s, dir, "documents")
      val kept = TextAnalysis.qualityFilter(docs, "text",
          minTokens = 30, maxAvgTokenLen = 5.0, minStopwordRatio = 0.02)
        .where(col("keep")).select("doc_id", "text")
      val cleaned = Dedup.passageDedup(kept, "doc_id", "text",
          passageTokens = 10, maxDocFreq = 1, tokenHasher = Shingles.md5Hash60)
        .where(length(col("text_clean")) > 0)
      val deduped = cleaned.groupBy("text_clean")
        .agg(min(col("doc_id")).as("doc_id"))
      Sampling.hashSample(deduped, "doc_id", fraction = 0.5,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "text_clean").orderBy("doc_id")
    },

    "q_pack" -> ((s, dir) =>
      // sequence packing: two-phase distributed prefix sum (range partition
      // → per-partition totals cumulated on the driver → within-partition
      // window + broadcast offset), never a single-partition global window.
      // The oracle's naive global window computes the same unique prefix sums.
      Packing.packIndex(t(s, dir, "documents"), "doc_id", "text", budget = 128)
        .orderBy("doc_id")),

    "q_pipeline_pack" -> { (s, dir) =>
      // composition gate for the session's ops: deterministic split
      // assignment → length filter → sequence packing of the train split,
      // all ONE lazy plan; the oracle chains the same stages as CTEs
      val docs = t(s, dir, "documents")
      val withSplit = Sampling.assignSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), hasher = Shingles.md5Hash60)
      val train = withSplit.where(col("split") === "train" &&
        TextAnalysis.tokenCount(col("text")) >= 25)
      Packing.packIndex(train, "doc_id", "text", budget = 256).orderBy("doc_id")
    },

    "q_shard" -> { (s, dir) =>
      // rendezvous sharding of customers over 5 shards: argmax of
      // hash(key, shard) — the oracle replays the same md5-60 race
      Sampling.rendezvousShard(t(s, dir, "customer"), "c_custkey",
        (0 until 5).map(i => s"s$i"), hasher = Shingles.md5Hash60)
        .select(col("c_custkey").as("id"), col("shard"))
        .orderBy("id")
    },

    "q_split_time" -> { (s, dir) =>
      // chronological split with a 3-day embargo purge at Jan 20: integer
      // counts + exact id-sum checksums per side; embargo rows NULL
      Sampling.assignSplitByTime(t(s, dir, "events"), "ts",
          java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), embargo = "3 days")
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).cast(LongType).as("ck"))
        .orderBy(col("split").asc_nulls_first)
    },

    "q_sample_weighted" -> { (s, dir) =>
      // Efraimidis–Spirakis weighted sample w/o replacement, k smallest
      // exponential-race priorities — TakeOrderedAndProject, no shuffle;
      // the fixed-point priority column makes selection auditable
      val out = Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
        col("n_chars"), k = 50, hasher = Shingles.md5Hash60)
      out.select(col("doc_id"),
          graft.metrics.MetricColumns.fixedPointLong(col("__pri"), 9).as("pri_fx"))
        .orderBy("doc_id")
    },

  )

  val oracleSql: Map[String, String] = Map(
    "q_top_pct" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang, n_chars FROM r WHERE rk * 100 <= n * 20 ORDER BY doc_id""".stripMargin,

    "q_budget_by_lang" ->
      """WITH f AS (SELECT doc_id, lang,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|q'), 1, 15))::BIGINT % 1000 AS score
        |  FROM documents WHERE lang IS NOT NULL),
        |b AS (SELECT lang,
        |    (CAST(ascii(substr(lang, 1, 1)) AS BIGINT) % 5 + 1) * 2000 AS budget
        |  FROM (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL)),
        |g AS (SELECT doc_id, lang, n_tokens, score,
        |        CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ratio
        |      FROM f WHERE n_tokens > 0),
        |r AS (SELECT g.*, b.budget,
        |        CAST(sum(n_tokens) OVER (PARTITION BY g.lang ORDER BY ratio DESC, doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |      FROM g JOIN b USING (lang))
        |SELECT doc_id, lang, n_tokens, CAST(score AS BIGINT) AS score, ratio, cum_tokens
        |FROM r WHERE cum_tokens <= budget ORDER BY lang, cum_tokens""".stripMargin,

    "q_bootstrap" -> {
      val ths = graft.ops.Sampling.poissonThresholds60
      val arms = ths.zipWithIndex
        .map { case (t, k) => s"WHEN h < $t THEN $k" }.mkString(" ")
      s"""WITH r AS (SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS BIGINT) AS v
         |           FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
         |e AS (SELECT id, v, CAST(unnest(range(0, 20)) AS BIGINT) AS b FROM r),
         |h AS (SELECT b, v,
         |             ('0x' || substr(md5(id || '|bs|' || CAST(b AS VARCHAR)), 1, 15))::BIGINT AS h
         |      FROM e),
         |w AS (SELECT b, v, CASE $arms ELSE ${ths.size} END AS w FROM h),
         |g AS (SELECT b, sum(CAST(w AS HUGEINT)) AS sw,
         |             sum(CAST(w * v AS HUGEINT)) AS swx FROM w GROUP BY b)
         |SELECT b, CAST(sw AS BIGINT) AS sum_w, CAST(swx AS BIGINT) AS sum_wx,
         |       CASE WHEN sw > 0 THEN CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) END AS mean
         |FROM g ORDER BY b""".stripMargin
    },

    "q_budget_select" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|q'), 1, 15))::BIGINT % 1000 AS score
        |  FROM documents),
        |g AS (SELECT doc_id, n_tokens, score,
        |        CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ratio
        |      FROM f WHERE n_tokens > 0),
        |r AS (SELECT *, CAST(sum(n_tokens) OVER (ORDER BY ratio DESC, doc_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM g)
        |SELECT doc_id, n_tokens, CAST(score AS BIGINT) AS score, ratio, cum_tokens
        |FROM r WHERE cum_tokens <= 12000 ORDER BY cum_tokens""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 1000
        |ORDER BY doc_id""".stripMargin,

    "q_cap_per_key" ->
      """WITH n AS (SELECT source AS k, count(*) AS kn FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN n ON d.source IS NOT DISTINCT FROM n.k
        |WHERE n.kn <= 10
        |   OR ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
        |      < CAST(ceil(CAST(10 AS DOUBLE) / CAST(kn AS DOUBLE) * 10000) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 <
        |      CASE WHEN lang = 'en' THEN 2000 WHEN lang = 'es' THEN 5000 ELSE 500 END
        |ORDER BY doc_id""".stripMargin,

    "q_mixture_sample" ->
      // identical double tree as Sampling.mixtureSample: nmax =
      // min(n/t), keep threshold = round(t * nmax / n * buckets)
      """WITH tt AS (SELECT * FROM (VALUES ('en', 0.5), ('es', 0.3), ('de', 0.2)) t(lang, tgt)),
        |n AS (SELECT d.lang, tgt, count(*) AS n
        |      FROM documents d JOIN tt ON d.lang = tt.lang GROUP BY d.lang, tgt),
        |m AS (SELECT min(CAST(n AS DOUBLE) / tgt) AS nmax FROM n),
        |k AS (SELECT lang, CAST(round(tgt * nmax / CAST(n AS DOUBLE) * 10000) AS BIGINT) AS keep
        |      FROM n, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN k ON d.lang = k.lang
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < keep
        |ORDER BY d.doc_id""".stripMargin,

    "q_dataset_card" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT) AS distinct_texts,
        |  CAST(sum(CASE WHEN len(string_split_regex(text, '\s+')) < 30 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  CAST(min(len(string_split_regex(text, '\s+'))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens
        |FROM documents""".stripMargin,

    "q_card_by_lang" ->
      """SELECT lang AS grp, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT) AS distinct_texts,
        |  CAST(sum(CASE WHEN len(string_split_regex(text, '\s+')) < 30 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
        |  CAST(min(len(string_split_regex(text, '\s+'))) AS BIGINT) AS min_tokens,
        |  CAST(max(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens
        |FROM documents GROUP BY lang ORDER BY grp""".stripMargin,

    "q_probe_weights" ->
      s"""WITH ${probeOracleRounds(5, 50000L)}
         |SELECT w0, w1, w2, w3 FROM w5""".stripMargin,

    "q_probe_scores" ->
      s"""WITH ${probeOracleRounds(5, 50000L)}
         |SELECT f.doc_id, f.x0*w.w0 + f.x1*w.w1 + f.x2*w.w2 + f.x3*w.w3 AS pred_fx
         |FROM f, w5 w ORDER BY f.doc_id""".stripMargin,

    "q_mixture_temp" ->
      // identical double tree as temperatureSample -> mixtureSample:
      // tgt = sqrt(n), nmax = min(n/tgt), keep = round(tgt*nmax/n*10000)
      """WITH n AS (SELECT source, count(*) AS n FROM documents
        |           WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS tgt FROM n),
        |m AS (SELECT min(CAST(n AS DOUBLE) / tgt) AS nmax FROM t),
        |k AS (SELECT source, CAST(round(tgt * nmax / CAST(n AS DOUBLE) * 10000) AS BIGINT) AS keep
        |      FROM t, m)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN k ON d.source = k.source
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < keep
        |ORDER BY d.doc_id""".stripMargin,

    "q_split_assign" ->
      """SELECT source, split, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM (
        |  SELECT source, doc_id,
        |    CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val'
        |         WHEN b < 10000 THEN 'test' END AS split
        |  FROM (SELECT source, doc_id,
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))::BIGINT % 10000 AS b
        |        FROM documents))
        |GROUP BY source, split ORDER BY source, split""".stripMargin,

    "q_pipeline_e2e" ->
      // composed: quality-keep ids -> passage dedup over survivors -> exact
      // dedup by rewritten text (min doc_id) -> md5-60 50% sample
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS atl,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS sr
        |FROM documents),
        |keepids AS (SELECT doc_id FROM f
        |            WHERE NOT (nt < 30) AND NOT (nt > 100000)
        |              AND NOT (atl > 5.0) AND NOT (sr < 0.02)),
        |t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
        |      WHERE doc_id IN (SELECT doc_id FROM keepids)),
        |p0 AS (SELECT doc_id,
        |         [array_to_string(toks[(i*10+1):((i+1)*10)], chr(32))
        |          for i in range(0, CAST(ceil(len(toks) / 10.0) AS INT))] AS ps
        |       FROM t),
        |e AS (SELECT doc_id, unnest(ps) AS passage,
        |             CAST(unnest(range(0, len(ps))) AS INT) AS chunk FROM p0),
        |h AS (SELECT doc_id, chunk, passage,
        |             ('0x' || substr(md5(passage), 1, 15))::BIGINT AS ph FROM e),
        |dropped AS (SELECT ph FROM (SELECT ph, count(DISTINCT doc_id) AS df FROM h GROUP BY ph)
        |            WHERE df > 1),
        |cleaned AS (SELECT doc_id,
        |              coalesce(string_agg(passage, chr(32) ORDER BY chunk)
        |                       FILTER (WHERE ph NOT IN (SELECT ph FROM dropped)), '') AS text_clean
        |            FROM h GROUP BY doc_id),
        |deduped AS (SELECT text_clean, min(doc_id) AS doc_id FROM cleaned
        |            WHERE length(text_clean) > 0 GROUP BY text_clean)
        |SELECT doc_id, text_clean FROM deduped
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 5000
        |ORDER BY doc_id""".stripMargin,

    "q_pack" ->
      """SELECT doc_id, n_tokens, tok_start,
        |  CASE WHEN n_tokens > 0 THEN tok_start // 128 END AS first_chunk,
        |  CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 128 END AS last_chunk,
        |  CASE WHEN n_tokens > 0 THEN tok_start % 128 END AS chunk_offset
        |FROM (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_shard" ->
      """WITH s(s, pos) AS (VALUES ('s0', 0), ('s1', 1), ('s2', 2), ('s3', 3), ('s4', 4)),
        |h AS (SELECT c_custkey AS id, s.s, s.pos,
        |        ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|shard|' || s.s), 1, 15))::BIGINT AS h
        |      FROM customer, s),
        |r AS (SELECT id, s, row_number() OVER (PARTITION BY id ORDER BY h DESC, pos ASC) AS rn FROM h)
        |SELECT id, s AS shard FROM r WHERE rn = 1 ORDER BY id""".stripMargin,

    "q_pipeline_pack" ->
      """WITH train AS (
        |  SELECT doc_id, CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))::BIGINT % 10000 < 8000
        |    AND len(string_split_regex(text, '\s+')) >= 25),
        |ps AS (SELECT doc_id, n_tokens,
        |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |       FROM train)
        |SELECT doc_id, n_tokens, tok_start,
        |  CASE WHEN n_tokens > 0 THEN tok_start // 256 END AS first_chunk,
        |  CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 256 END AS last_chunk,
        |  CASE WHEN n_tokens > 0 THEN tok_start % 256 END AS chunk_offset
        |FROM ps ORDER BY doc_id""".stripMargin,

    "q_split_time" ->
      """SELECT CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' THEN 'test'
        |            WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 3 DAY THEN NULL
        |            ELSE 'train' END AS split,
        |  count(*) AS n, CAST(sum(event_id) AS BIGINT) AS ck
        |FROM events GROUP BY 1 ORDER BY split NULLS FIRST""".stripMargin,

    "q_sample_weighted" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN pri >= 0 THEN floor(pri * 1000000000.0 + 0.5)
        |            ELSE -floor(-pri * 1000000000.0 + 0.5) END AS BIGINT) AS pri_fx
        |FROM (
        |  SELECT doc_id,
        |    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) + 1.0)
        |        / 1152921504606846976.0) / CAST(n_chars AS DOUBLE) AS pri
        |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0.0
        |  ORDER BY pri, doc_id LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

  )
}
