package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistics, drift tests, outliers, correlation, calibration. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object StatsQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wilcoxon" -> { (s, dir) =>
      // PAIRED two-sample member the rank battery was missing: is the
      // lag-7 naive forecast median-unbiased, pair by pair (MWU on the
      // pooled columns would let per-day level differences mask the
      // tilt); doubled ranks of |d| keep everything exact integers
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      val wd = Window.partitionBy("event_type").orderBy("d")
      val withPred = daily.withColumn("pred", lag(col("cnt"), 7).over(wd))
        .where(col("pred").isNotNull)
      graft.scan.Drift.wilcoxonSignedRank(withPred, "cnt", "pred")
    },

    "q_theil_ineq" -> { (s, dir) =>
      // Theil T with the between/within decomposition: is order-value
      // concentration across priority classes or inside them — the
      // additive split Gini can't give; pico-fx order-free log terms
      Inequality.theilIndex(
        t(s, dir, "orders").select(col("o_orderpriority"),
          MetricColumns.fixedPointLong(col("o_totalprice"), 2).as("cents")),
        "cents", "o_orderpriority")
    },

    "q_jarque_bera" -> { (s, dir) =>
      // normality screen before any ±kσ fence is trusted: JB from exact
      // integer power sums about the floor-mean, shifted to the true mean
      // in one fixed double tree
      graft.scan.Drift.jarqueBera(
        t(s, dir, "lineitem").select(
          MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents")),
        "cents")
    },

    "q_wilcoxon_group" -> { (s, dir) =>
      // WHICH event type's lag-7 naive is median-biased: the per-key
      // paired screen whose z's feed q_fdr's BH correction at scale;
      // group-bounded windows, same doubled-rank decimal tree
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      val wd = Window.partitionBy("event_type").orderBy("d")
      val withPred = daily.withColumn("pred", lag(col("cnt"), 7).over(wd))
        .where(col("pred").isNotNull)
      graft.scan.Drift.wilcoxonSignedRankByGroup(withPred, "event_type",
        "cnt", "pred").orderBy("event_type")
    },

    "q_kripp" -> { (s, dir) =>
      // missing-data-tolerant agreement: the SAME order/returnflag rating
      // design as q_fleiss but WITHOUT the complete-design filter — every
      // order with >= 2 lineitems participates (exactly what alpha adds
      // over Fleiss); exact counts, pico-fx per-item disagreement
      graft.scan.Drift.krippendorffAlpha(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag")),
        "l_orderkey", "l_returnflag")
    },

    "q_qini" -> { (s, dir) =>
      // uplift eval: does activity-count "targeting" find users the
      // (id-parity pseudo-)treatment moves — conversion = exact fx spend
      // threshold, equi-depth integer deciles over the descending score
      // rollup, qini one fixed tree; a random treatment reads ~0 uplift,
      // which is the honest null the curve must show
      val u = t(s, dir, "events").groupBy("user_id").agg(
        count(lit(1)).as("score"),
        sum(MetricColumns.fixedPointLong(col("value"), 2)).as("tvfx"))
      val r = u.select(col("score"),
        (col("user_id") % 2 === 0).as("t"), (col("tvfx") > 60000L).as("y"))
      Ranking.qiniCurve(r, "score", "t", "y", 10)
    },

    "q_fleiss" -> { (s, dir) =>
      // multi-rater agreement beyond chance: orders as items, their
      // (exactly 4) lineitems as raters, returnflag as the label — the
      // label-quality gate for crowd/ensemble annotation; the whole
      // statistic is three exact integer sums + one fixed tree
      graft.scan.Drift.fleissKappa(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag")),
        "l_orderkey", "l_returnflag", raters = 4)
    },

    "q_ndcg" -> { (s, dir) =>
      // retrieval-eval pair over a real ranking task: each user's
      // first-half event-type frequency ranking scored against their
      // second-half counts as graded relevance — NDCG@3 + reciprocal
      // rank; pico-fx order-free gain sums, query-bounded windows
      val ev = t(s, dir, "events")
        .selectExpr("user_id", "event_type",
          "unix_micros(ts) div 86400000000L as d")
      val fh = ev.where(col("d") < 19737L)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("cnt").desc, col("event_type").asc)))
      val sh = ev.where(col("d") >= 19737L)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("rel"))
      val joined = fh.join(sh, Seq("user_id", "event_type"), "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
      Ranking.ndcgAtK(joined, "user_id", "rank", "rel", 3)
        .orderBy("user_id")
    },

    "q_bradley_terry" -> { (s, dir) =>
      // latent supplier-team strengths from within-order shipping races:
      // two lineitems of one order with different (suppkey mod 5) teams —
      // the earlier shipdate wins; 5 MM rounds with pico-fx order-free
      // denominators make the whole fit engine-replayable
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        (col("l_suppkey") % 5).cast(StringType).as("team"),
        col("l_shipdate").as("sd"))
      // within-order pairs WITHOUT the self-join: ONE groupBy(ok) shuffle
      // collects each order's ≤7 items, then unordered pairs enumerate
      // row-locally (posexplode position + slice of the tail — each pair
      // once, and only n(n-1)/2 rows ever exist where the old a⋈b sort-merge
      // join shuffled+sorted the table twice and built n² rows pre-filter).
      // The former ln_a < ln_b rule = "each unordered pair of DISTINCT line
      // numbers once": positional enumeration keeps each pair once, and the
      // explicit ln filter drops the equal-ln pairs the strict < dropped
      // (this testdata HAS duplicate line numbers within an order).
      // Winner/loser are orientation-independent (sa ≠ sb enforced, the
      // when() is symmetric under swap), so list order cannot change the
      // (winner, loser) multiset; equivalence is oracle-gated end-to-end.
      val pairs = graft.ops.Joins.withinKeyPairs(li, "ok",
        Seq(col("ln"), col("team"), col("sd")))
      val m = pairs
        .where(col("x.ln") =!= col("y.ln") &&
          col("x.team") =!= col("y.team") && col("x.sd") =!= col("y.sd"))
        .select(
          when(col("x.sd") < col("y.sd"), col("x.team")).otherwise(col("y.team")).as("winner"),
          when(col("x.sd") < col("y.sd"), col("y.team")).otherwise(col("x.team")).as("loser"))
      Ranking.bradleyTerry(m, "winner", "loser", rounds = 5).orderBy("item")
    },

    "q_kruskal" -> { (s, dir) =>
      // K-SAMPLE rank drift: are the three returnflag populations even
      // from the same price distribution, in ONE test (the pairwise
      // q_ks/q_mwu family's multiple-testing escape hatch); doubled ranks
      // + centered ppm terms keep every sum an exact integer
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.kruskalWallis(li, "cents", "l_returnflag")
    },

    "q_anova" -> { (s, dir) =>
      // the MEAN-SHIFT k-sample companion (q_kruskal is its rank twin):
      // did per-flag mean prices move apart relative to in-group spread;
      // grand-mean-centered exact moments, floored per-group terms
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.anovaF(li, "cents", "l_returnflag")
    },

    "q_cliffs" -> { (s, dir) =>
      // ordinal EFFECT SIZE on the q_mwu populations: at bench scale
      // everything is "significant" — δ says whether the shift matters;
      // exact from the doubled U, Romano-banded
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.cliffsDelta(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_js_div" -> { (s, dir) =>
      // bounded symmetric mix distance on the q_chi2_drift populations:
      // "how FAR apart are the priority mixes" on a fixed [0, ln 2] scale,
      // comparable across columns; pico fixed-point order-free sum
      val o = t(s, dir, "orders")
      graft.scan.Drift.jsDivergence(
        o.where(col("o_orderstatus") === "F"),
        o.where(col("o_orderstatus") === "O"), "o_orderpriority")
    },

    "q_acf" -> { (s, dir) =>
      // lag-1..7 autocorrelation of the daily event-count series per type:
      // the seasonality diagnostic that picks holt-winters' season length;
      // exact co-moments at every lag, gap-robust overlap pairs
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.acf(daily, Seq("event_type"), "d", "cnt", maxLag = 7)
        .orderBy("event_type", "lag")
    },

    "q_kendall" -> { (s, dir) =>
      // tie-aware ordinal association between daily volume and daily
      // revenue per event type — τ-b from exact pair signs + value-rollup
      // tie counts (never the pair join)
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000L").as("d"),
          MetricColumns.fixedPointLong(col("value"), 2).as("cents"))
        .groupBy("event_type", "d")
        .agg(count(lit(1)).as("x"), sum("cents").as("y"))
      Correlation.kendallTauB(daily, Seq("event_type"), "d", "x", "y")
        .orderBy("event_type")
    },

    "q_theilsen" -> { (s, dir) =>
      // robust trend on the q_kendall daily series: median of pairwise
      // slopes + median-residual intercept — the outlier-immune complement
      // of q_trend's OLS; group-bounded pair join (days per event type),
      // explicit rank-rule medians so both engines replay the same tree
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000L").as("d"),
          MetricColumns.fixedPointLong(col("value"), 2).as("cents"))
        .groupBy("event_type", "d")
        .agg(sum("cents").as("y"))
      Correlation.theilSenByGroup(daily, Seq("event_type"), "d", "y", scale = 0)
        .orderBy("event_type")
    },

    "q_mcnemar" -> { (s, dir) =>
      // paired filter comparison on the SAME corpus: does the length rule
      // and the token-count rule disagree more than chance — only the
      // disagreeing pairs carry information
      val docs = t(s, dir, "documents")
      graft.scan.Drift.mcnemar(docs,
        col("n_chars") >= 500,
        regexp_count(col("text"), lit("\\S+")) >= 80)
    },

    "q_welch" -> { (s, dir) =>
      // unequal-variance two-sample mean drift on the q_mwu populations:
      // did the A-vs-R mean price move, with Welch–Satterthwaite df —
      // grand-mean-centered exact moments, one fixed double tree
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.welchT(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_bf" -> { (s, dir) =>
      // k-sample VARIANCE drift (Brown–Forsythe): did per-flag price
      // SPREADS move apart — the question q_anova (means) and q_kruskal
      // (ranks) don't ask; doubled medians keep |v − median| an exact long
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.brownForsythe(li, "cents", "l_returnflag")
    },

    "q_energy" -> { (s, dir) =>
      // all-moments drift on the q_mwu populations: the energy statistic
      // responds to ANY distributional difference; all three pairwise-|·|
      // sums are exact gap-weighted prefix products
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.energyDistance(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_cvm" -> { (s, dir) =>
      // integrated-CDF drift on the q_ks populations: CvM scores the
      // WHOLE squared CDF gap where KS takes only the max — doubled
      // tie-averaged ranks on both levels keep U an exact integer
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.cramerVonMises(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_label_noise" -> { (s, dir) =>
      // confident-learning-lite over the calibrated scorer: negatives
      // scoring above the positive-class mean (and vice versa) flag as
      // likely mislabeled — integer cross-multiplied thresholds, no
      // division in the flag rule
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.labelNoiseStats(scored, "score", "label")
    },

    "q_score_ks" -> { (s, dir) =>
      // scorer discrimination as the classic KS statistic between the
      // positive and negative score populations — the credit-scoring
      // number next to q_roc_auc, on the existing exact KS machinery
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(h1.as("sfx"), (h2 < h1).as("label"))
      graft.scan.Drift.ksStatistic(scored.where(col("label")),
        scored.where(!col("label")), "sfx")
    },

    "q_cohens_d" -> { (s, dir) =>
      // parametric effect size on the q_mwu populations: at bench scale
      // q_welch's t explodes with n — d/g say how many pooled SDs the
      // means actually moved; welch's exact centered moments, two trees
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.cohensD(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_qq" -> { (s, dir) =>
      // per-decile QQ drill-down of the q_ks/q_w1 populations: WHERE do
      // the price distributions diverge (tails vs body) — exact type-1
      // quantiles from integer cumulatives, one conditional-min agg/side
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.qqTable(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents", quantiles = 10)
    },

    "q_cindex" -> { (s, dir) =>
      // Harrell's C for "does activity volume rank user lifetimes":
      // integer pair counts over the (t, e, score) rollup, exact
      // (2·conc + tied)/(2·comparable)
      val users = t(s, dir, "events").groupBy("user_id").agg(
        expr("unix_micros(min(ts))").as("f"),
        expr("unix_micros(max(ts))").as("l"),
        count(lit(1)).as("risk"))
      val lifetimes = users.select(
        expr("(l - f) div 86400000000L").as("dur"),
        (col("l") < lit(1706400000000000L)).as("observed"), col("risk"))
      Events.concordanceIndex(lifetimes, "dur", col("observed"), "risk")
    },

    "q_ad" -> { (s, dir) =>
      // tail-weighted drift on the q_cvm populations: AD weights the CDF
      // gap by 1/(F(1-F)) so tail contamination scores where CvM's
      // uniform weight dilutes it; tie-adjusted midrank version, exact
      // integer cumulatives, milli-fx order-free term sum
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.andersonDarling(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_dw" -> { (s, dir) =>
      // lag-1 residual autocorrelation verdict per event type on the
      // daily count series: the single number (≈2 = independent) that
      // gates "can I trust this forecaster's residuals"; exact decimal
      // co-moments, one fixed ratio tree
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.durbinWatson(daily, Seq("event_type"), "d", "cnt")
        .orderBy("event_type")
    },

    "q_runs" -> { (s, dir) =>
      // sign-sequence randomness per event type: are above/below-median
      // days clustered into regimes (or over-alternating) — the question
      // q_mann_kendall's monotone trend misses; doubled exact median,
      // exact flip counts, one z tree
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      graft.scan.Drift.runsTest(daily, Seq("event_type"), "d", "cnt")
        .orderBy("event_type")
    },

    "q_periodogram" -> { (s, dir) =>
      // frequency-domain seasonality: DFT power at candidate periods
      // 7/30 over the daily series — q_acf detects self-similarity, this
      // SCORES the hypothesized period directly (phase-robust); shared
      // literal trig table keeps cos/sin bit-identical across engines
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.periodogram(daily, Seq("event_type"), "d", "cnt",
        periods = Seq(7, 30))
        .orderBy("event_type", "period")
    },

    "q_theils_u" -> { (s, dir) =>
      // directional association on the q_mutual_info contingencies:
      // U(A|B) = I/H(A) exposes the asymmetry nmi/Cramér's V average
      // away (status explains priority ≠ priority explains status)
      Correlation.theilsU(t(s, dir, "orders"),
        Seq("o_orderstatus" -> "o_orderpriority"))
        .unionAll(Correlation.theilsU(t(s, dir, "lineitem"),
          Seq("l_returnflag" -> "l_linestatus")))
        .orderBy("pair")
    },

    "q_eb_rate" -> { (s, dir) =>
      // empirical-Bayes shrunk per-customer open-order rates: a 1/1
      // customer must not outrank a 9/10 one — beta-binomial MoM prior
      // learned from the corpus, nano-fx exact moments, per-key one tree
      val o = t(s, dir, "orders")
      val perCust = o.groupBy(col("o_custkey").as("custkey")).agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("x_open"))
      Shrinkage.ebBetaBinomial(perCust, Seq("custkey"), "n_orders", "x_open")
        .orderBy("custkey")
    },

    "q_partial_corr" -> { (s, dir) =>
      // the confounder check the raw corr matrix invites: is price still
      // correlated with tax once QUANTITY is controlled for; three
      // pairwise exact co-moment sets on ONE aggregate, fixed trees
      Correlation.partialCorr(t(s, dir, "lineitem"),
        "l_extendedprice", "l_tax", "l_quantity", scale = 2)
    },

    "q_chi2_cells" -> { (s, dir) =>
      // WHICH cells drive q_cramers_v: per-cell Pearson residual
      // (o-e)/sqrt(e) over the status x priority contingency — |resid|>2
      // flags the cell; exact counts/margins, fixed trees
      Correlation.chiSquareCells(t(s, dir, "orders"),
        "o_orderstatus", "o_orderpriority")
    },

    "q_ca_trend" -> { (s, dir) =>
      // binary-outcome ordered trend: does the FULFILLED rate move
      // monotonically with priority tier — q_jt's Bernoulli twin with
      // integer scores; exact decimal T.N and B, one z tree
      graft.scan.Drift.cochranArmitage(t(s, dir, "orders"),
        "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        col("o_orderstatus") === "F")
    },

    "q_jt" -> { (s, dir) =>
      // ordered-alternative k-sample trend: do order totals shift
      // MONOTONICALLY with priority tier — the question q_kruskal's
      // any-difference H has no power against; doubled exact J over the
      // pooled rollup, tie-corrected Hollander-Wolfe variance
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        MetricColumns.fixedPointLong(col("o_totalprice"), 2).as("cents"))
      graft.scan.Drift.jonckheereTerpstra(o, "cents", "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
    },

    "q_mood" -> { (s, dir) =>
      // k-sample counting drift: do per-flag prices split evenly around
      // the POOLED median — coarser than q_kruskal's ranks but immune to
      // tails entirely; exact doubled median + exact cells, nano-fx χ²
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.moodMedian(li, "cents", "l_returnflag")
    },

    "q_conformal" -> { (s, dir) =>
      // split-conformal band check for the lag-7 naive: the calibration
      // window's conformal quantile gives a distribution-free >=90% band
      // — measured eval coverage far below 0.9 means the residual
      // distribution shifted; exact integer ranks and counts
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      val wd = Window.partitionBy("event_type").orderBy("d")
      val withPred = daily.withColumn("pred", lag(col("cnt"), 7).over(wd))
        .where(col("pred").isNotNull)
      Outliers.conformalCoverage(withPred, Seq("event_type"), "d", "cnt",
        "pred", splitT = 19737L, aNum = 9, aDen = 10, fxScale = 0)
        .orderBy("event_type")
    },

    "q_pinball" -> { (s, dir) =>
      // p90 quantile-forecast acceptance: the lag-7 naive scored as a
      // QUANTILE forecast (under-prediction costs 0.9, over costs 0.1) —
      // the metric q_forecast_eval's point scores can't express; exact
      // integer loss terms, one mean tree
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      val wd = Window.partitionBy("event_type").orderBy("d")
      val withPred = daily.withColumn("pred", lag(col("cnt"), 7).over(wd))
      Outliers.pinballLoss(withPred, Seq("event_type"), "cnt", "pred",
        qNum = 9, qDen = 10, fxScale = 0).orderBy("event_type")
    },

    "q_ece" -> { (s, dir) =>
      // the model-card scalar over q_calibration's reliability table:
      // ECE = Σ (n_b/N)·|acc−conf| with an EXACT integer numerator
      // (micro-fx scores × integer positives) — order-free by construction
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.expectedCalibrationError(scored, "score", "label", 10)
    },

    "q_lift" -> { (s, dir) =>
      // decile lift/cumulative-gains of the calibrated scorer: "the top
      // decile captures X× its share of positives" — the targeting view
      // of the same ranking q_roc_auc summarizes; distinct-score rollup,
      // ties share the first row's bucket
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.liftTable(scored, "score", "label", 10)
    },

    "q_forecast_eval" -> { (s, dir) =>
      // forecaster acceptance: seasonal-naive lag-7 predictions of the
      // daily count series scored with MAE/RMSE/MAPE/MASE — a forecaster
      // is only better if MASE < 1 (it beat the naive walk)
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      val wd = Window.partitionBy("event_type").orderBy("d")
      val withPred = daily.withColumn("pred", lag(col("cnt"), 7).over(wd))
      Outliers.forecastErrors(withPred, Seq("event_type"), "d", "cnt", "pred",
        fxScale = 0).orderBy("event_type")
    },

    "q_cuped" -> { (s, dir) =>
      // CUPED variance reduction: order totals adjusted by the customer's
      // account balance (the pre-period covariate) — the same A/B test
      // then needs (1−ρ²)× the sample; θ/x̄ from exact co-moments, the
      // per-row adjustment one fixed tree
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val joined = o.join(c.select(col("c_custkey").as("o_custkey"),
        col("c_acctbal")), Seq("o_custkey"))
      graft.scan.Drift.cuped(joined, "o_totalprice", "c_acctbal")
        .select("o_orderkey", "o_totalprice", "c_acctbal", "o_totalprice_adj")
        .orderBy("o_orderkey")
    },

    "q_seasonal" -> { (s, dir) =>
      // measured day-of-week seasonal indices per event type: the classical
      // ±3-day MA detrend + per-phase exact fixed-point means — the profile
      // holt-winters estimates adaptively and q_acf only detects (daily
      // ticks so the grid is dense at every SF)
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Outliers.seasonalProfile(daily, Seq("event_type"), "d", "cnt",
        period = 7).orderBy("event_type", "phase")
    },

    "q_changepoint" -> { (s, dir) =>
      // mean-shift LOCALIZATION per event type over the daily count
      // series: q_cusum says "did it shift", this says WHERE — best
      // binary-segmentation split by the normalized CUSUM scan statistic,
      // exact integer numerator, smaller-k tie rule
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Outliers.changepointSplit(daily, Seq("event_type"), "d", "cnt",
        fxScale = 0).orderBy("event_type")
    },

    "q_ccf" -> { (s, dir) =>
      // lead/lag detection between daily event VOLUME and daily event
      // REVENUE per type at lags −3..3: a peak at positive lag means
      // volume leads revenue — q_acf's two-variable sibling, exact
      // co-moments per lag over overlap pairs
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000L").as("d"),
          MetricColumns.fixedPointLong(col("value"), 2).as("cents"))
        .groupBy("event_type", "d")
        .agg(count(lit(1)).as("x"), sum("cents").as("y"))
      Correlation.ccf(daily, Seq("event_type"), "d", "x", "y", maxLag = 3)
        .orderBy("event_type", "lag")
    },

    "q_mann_kendall" -> { (s, dir) =>
      // robust monotonic trend per event type over the DAILY event-count
      // series (integer ticks × integer counts — everything exact): the
      // outlier-immune complement of q_trend's OLS; Sen slope in
      // events/day per day
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.mannKendall(daily, Seq("event_type"), "d", "cnt")
        .orderBy("event_type")
    },

    "q_prop_test" -> { (s, dir) =>
      // did the fulfilled-rate move between high- and low-priority
      // orders? two-proportion pooled z — the Bernoulli drift member;
      // exact long counts, one fixed double tree
      val o = t(s, dir, "orders")
      graft.scan.Drift.proportionTest(
        o.where(col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        o.where(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")),
        col("o_orderstatus") === "F")
    },

    "q_roc_auc" -> { (s, dir) =>
      // exact ROC-AUC of the synthetic calibrated scorer (same score/
      // label construction as q_calibration) — the MWU machinery IS the
      // eval statistic; a calibrated uniform scorer lands near 2/3
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.rocAuc(scored, "score", "label")
    },

    "q_pr_curve" -> { (s, dir) =>
      // full precision/recall/F1 operating table of the same scorer —
      // every achievable threshold from the descending counts cumulative
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.prCurve(scored, "score", "label")
    },

    "q_confusion" -> { (s, dir) =>
      // thresholded confusion + MCC of the calibrated scorer at t=0.6 —
      // the imbalance-honest single number prCurve can't derive (no TN)
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.confusionAt(scored, "score", "label", 0.6)
    },

    "q_spearman_group" -> { (s, dir) =>
      // does price track quantity monotonically in EVERY return-flag
      // segment — per-group doubled-rank spearman on group-bounded
      // rank windows
      val li = t(s, dir, "lineitem")
      Correlation.spearmanByGroup(li, "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")
    },

    "q_brier" -> { (s, dir) =>
      // proper scoring rule over the same calibrated scorer: punishes
      // miscalibration AND non-discrimination in one number; exact
      // integer squared errors, one double division
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.brierScore(scored, "score", "label")
    },

    "q_avg_precision" -> { (s, dir) =>
      // single-number PR summary of the same scorer — the imbalance-proof
      // companion to q_roc_auc; step terms fx-12, order-free sum
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.averagePrecision(scored, "score", "label")
    },

    "q_calibration" -> { (s, dir) =>
      // reliability diagram over a synthetic calibrated scorer: score =
      // h1/1000, label = (h2 < h1) -> P(label|score) = score, so bucket
      // gaps are pure sampling noise; exact integer bucketing and sums
      val docs = t(s, dir, "documents")
      val h1 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|score"))) % 1000L
      val h2 = graft.ops.Shingles.md5Hash60(
        concat(col("doc_id").cast("string"), lit("|label"))) % 1000L
      val scored = docs.select(col("doc_id"),
        (h1.cast(DoubleType) / lit(1000.0)).as("score"), (h2 < h1).as("label"))
      LinearProbe.calibrationTable(scored, "score", "label", 10)
    },

    "q_cat_entropy" -> { (s, dir) =>
      // effective-category profile of the corpus dimensions: entropy +
      // exp(H) + inverse-Simpson per column — the concentration reading
      // raw distinct counts flatter
      val docs = t(s, dir, "documents")
      Constraints.categoryEntropy(docs, Seq("lang", "source"))
        .orderBy("column")
    },

    "q_qnorm" -> { (s, dir) =>
      // quantile-normalize src0 document lengths onto src1's length
      // distribution: rank-for-rank cross-shard alignment; integer
      // cross-multiplied positions, forward as-of over the rank maps
      val docs = t(s, dir, "documents")
      val src0 = docs.where(col("source") === "src0")
        .select("doc_id", "n_chars")
      val src1 = docs.where(col("source") === "src1").select("n_chars")
      Binning.quantileNormalize(src0, "n_chars", src1, "n_chars")
        .orderBy("doc_id")
    },

    "q_gini_group" -> { (s, dir) =>
      // revenue concentration per market segment: which segment's revenue
      // is dominated by few customers — group-bounded windows, same
      // closed-form run terms as q_gini
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val perCust = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
        .agg(sum(MetricColumns.fixedPointLong(col("o_totalprice"), 2))
          .cast(LongType).as("cents"))
      Binning.giniByGroup(perCust, "seg", col("cents")).orderBy("seg")
    },

    "q_fdr" -> { (s, dir) =>
      // BH FDR over a deterministic p-value battery: uniform md5-hash p
      // per order, with a planted low-p signal block (≡0 mod 97) the
      // step-up rule must recover without flooding false alarms
      val o = t(s, dir, "orders").select(col("o_orderkey").as("test_id"))
      val u = (graft.ops.Shingles.md5Hash60(
        concat(col("test_id").cast("string"), lit("|fdr"))) % 1000003L)
        .cast(DoubleType) / lit(1000003.0)
      val withP = o.withColumn("p",
        when(col("test_id") % 97 === 0, u / lit(1000.0)).otherwise(u))
      graft.scan.Drift.fdrControl(withP, "p", 0.05, Seq("test_id"))
        .orderBy("p_rank")
    },

    "q_gini" -> { (s, dir) =>
      // revenue concentration across customers: Gini of per-customer
      // order totals (cents) — the "is the corpus dominated by a few
      // keys" diagnostic; closed-form run terms on the routed cumulative,
      // no global rank window
      val o = t(s, dir, "orders")
      val perCust = o.groupBy("o_custkey")
        .agg(sum(MetricColumns.fixedPointLong(col("o_totalprice"), 2))
          .cast(LongType).as("cents"))
      Binning.giniCoefficient(perCust, col("cents"))
    },

    "q_trimmed_mean" -> { (s, dir) =>
      // trimmed mean of price cents inside DYADIC [1/16, 15/16] fences:
      // drop-don't-clip robust center — dyadic p makes the interpolated
      // fence an exact rational, so Spark's vl+f·Δ and DuckDB's
      // vl(1−f)+vh·f trees agree bit-for-bit (non-dyadic p diverges in
      // the low bit); decimal kept-sum, one double division
      val li = t(s, dir, "lineitem").select(
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.trimmedMean(li, "cents", 0.0625, 0.9375)
    },

    "q_kl_slice" -> { (s, dir) =>
      // which language's token mix diverges from the corpus, in nats —
      // per-slice unigram KL with mutualInfo's bounded-window marginals;
      // transcendental terms quantize to fx-9 longs and sum order-free
      val docs = t(s, dir, "documents")
      TextAnalysis.vocabKlBySlice(docs, "text", "lang").orderBy("slice")
    },

    "q_kappa" -> { (s, dir) =>
      // chance-corrected label agreement: lang vs a "sloppy second
      // annotator" that mislabels every ≡0-mod-9 doc as 'zz' — the
      // inter-rater gate before trusting training labels; both κ operands
      // exact integers, one final double tree
      val docs = t(s, dir, "documents")
      Correlation.cohensKappa(
        docs.select(col("lang").as("a"),
          when(col("doc_id") % 9 === 0, "zz").otherwise(col("lang")).as("b")),
        "a", "b")
    },

    "q_smk" -> { (s, dir) =>
      // weekly-cycle-immune trend: MK within each weekday phase, S and
      // variances summed — a day-of-week cycle can't masquerade as trend;
      // the phase split also cuts the quadratic pair cost ~7x
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.seasonalMannKendall(daily, Seq("event_type"), "d", "cnt",
        period = 7).orderBy("event_type")
    },

    "q_kappa_weighted" -> { (s, dir) =>
      // ordinal agreement: priority tier (1-5) vs a sloppy second rater
      // that bumps every ≡0-mod-9 order one tier up — quadratic weights
      // charge a 2-tier miss 4× a 1-tier miss; both operands exact
      // integer sums, κ_w one fixed tree
      val o = t(s, dir, "orders").select(
        substring(col("o_orderpriority"), 1, 1).cast(LongType).as("a"),
        col("o_orderkey").as("k"))
      Correlation.weightedKappa(
        o.select(col("a"),
          when(col("k") % 9 === 0, least(col("a") + 1L, lit(5L)))
            .otherwise(col("a")).as("b")),
        "a", "b", quadratic = true)
    },

    "q_ks" -> { (s, dir) =>
      // exact two-sample KS between returnflag populations, over fixed-point
      // cents (decimal→double conversion differs in the low bit between
      // engines; long→double is exact) — bucket-free drift, bit-for-bit
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.ksStatistic(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_standardize" -> ((s, dir) =>
      // per-flag exact z-score normalization of quantity cents: z =
      // (x·n − s)/√(n·Σx² − s²) — one fixed double tree over exact
      // integer moments, broadcast back; rows never shuffle
      Binning.standardize(
          t(s, dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
          "l_quantity", groupCols = Seq("l_returnflag"), scale = 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity_z"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity_z")),

    "q_chi2_drift" -> { (s, dir) =>
      // categorical mix drift: order-priority distribution, finished vs
      // open orders — the categorical member of the drift family; the
      // statistic sums as per-(category, side) truncated ppm integers,
      // order-free and engine-portable
      val o = t(s, dir, "orders")
      graft.scan.Drift.chiSquareCategorical(
        o.where(col("o_orderstatus") === "F"),
        o.where(col("o_orderstatus") === "O"), "o_orderpriority")
    },

    "q_mwu" -> { (s, dir) =>
      // exact tie-corrected Mann–Whitney U between the same returnflag
      // populations q_ks compares — the rank-shift complement of the CDF
      // gap, with the interpretable AUC (P[A beats R]); doubled ranks keep
      // every statistic an exact integer until the final z/auc trees
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.mannWhitneyU(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_weighted_median" -> { (s, dir) =>
      // QUANTITY-weighted price quartiles + p90: the importance-weighted
      // fences the unweighted family can't express (a 50-unit line weighs
      // 50× a 1-unit line); counts-frame routed, the only double op is the
      // cum ≥ p·W threshold compare
      val li = t(s, dir, "lineitem")
      Binning.weightedPercentiles(li,
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2),
        MetricColumns.fixedPointLong(col("l_quantity"), 0),
        Seq(0.25, 0.5, 0.75, 0.9))
    },

    "q_wasserstein" -> { (s, dir) =>
      // exact W1 (earth mover's) distance between the same returnflag
      // populations q_ks/q_mwu compare — the magnitude member of the drift
      // family ("how many cents did the mass move"); segment terms are
      // exact |k1·n2 − k2·n1|·Δv integers, one final double division
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.wasserstein1(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_wasserstein_group" -> { (s, dir) =>
      // per-language W1 of document length between the two sources — the
      // magnitude drilldown next to q_ks_group's largest-gap (how many
      // CHARS did each language's length distribution move)
      val docs = t(s, dir, "documents")
      graft.scan.Drift.wasserstein1ByGroup(
        docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "n_chars", "lang")
        .orderBy("lang")
    },

    "q_ks_group" -> { (s, dir) =>
      // per-language KS of document length between two sources — drift
      // localized to the segment that moved; n_chars is already integer
      val docs = t(s, dir, "documents")
      graft.scan.Drift.ksStatisticByGroup(
        docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "n_chars", "lang")
        .orderBy("lang")
    },

    "q_chow" -> { (s, dir) =>
      // structural break at a KNOWN date: did each type's daily-count
      // trend LINE change at Jan 15 — the hypothesis test beside
      // q_changepoint's unknown-shift localization; exact segment
      // co-moments from ONE conditional aggregate
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.chowTest(daily, Seq("event_type"), "d", "cnt",
        splitT = 19737L).orderBy("event_type")
    },

    "q_influence" -> { (s, dir) =>
      // WHICH days steer each type's trend line: top-3 by Cook's D —
      // residual x leverage, the diagnostics an outlier fence can't
      // give; exact co-moments, per-point fixed trees
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Correlation.olsInfluence(daily, Seq("event_type"), "d", "cnt",
        topK = 3).orderBy("event_type", "rnk")
    },

    "q_mood_scale" -> { (s, dir) =>
      // rank-based DISPERSION drift on the q_bf populations: Mood's
      // squared-rank-deviation score needs no |v - median| magnitudes at
      // all — the fully nonparametric scale check; exact doubled ranks
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      graft.scan.Drift.moodScale(li.where(col("l_returnflag") === "A"),
        li.where(col("l_returnflag") === "R"), "cents")
    },

    "q_friedman" -> { (s, dir) =>
      // repeated-measures rank test: do event types keep a STABLE volume
      // ordering across days — within-day ranks remove the day effect a
      // surge would fake in q_kruskal; doubled exact ranks, Conover tie
      // correction, incomplete days dropped
      val daily = t(s, dir, "events")
        .selectExpr("unix_micros(ts) div 86400000000L as d", "event_type")
        .groupBy("d", "event_type").agg(count(lit(1)).as("cnt"))
      graft.scan.Drift.friedman(daily, "d", "event_type", "cnt")
    },

    "q_ad_group" -> { (s, dir) =>
      // per-language tail drift of doc length between sources: WHICH
      // segment's tails moved — the AD drill-down next to q_ks_group's
      // largest-gap and q_wasserstein_group's magnitude
      val docs = t(s, dir, "documents")
      graft.scan.Drift.andersonDarlingByGroup(
        docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "n_chars", "lang")
        .orderBy("lang")
    },

    "q_cvm_group" -> { (s, dir) =>
      // per-language WHOLE-CDF drift of doc length between sources — the
      // uniform-weight drill-down completing the by-group battery
      // (q_ks_group: largest gap, q_wasserstein_group: magnitude,
      // q_ad_group: tails)
      val docs = t(s, dir, "documents")
      graft.scan.Drift.cramerVonMisesByGroup(
        docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "n_chars", "lang")
        .orderBy("lang")
    },

    "q_mantel_haenszel" -> { (s, dir) =>
      // stratified association: are BIG orders more often fulfilled once
      // PRIORITY is held fixed — the Simpson's-paradox-proof common odds
      // ratio + MH chi2; exact cells, nano-fx per-stratum terms
      graft.scan.Drift.mantelHaenszel(t(s, dir, "orders"),
        "o_orderpriority",
        col("o_totalprice") >= 150000.0,
        col("o_orderstatus") === "F")
    },

    "q_hill" -> { (s, dir) =>
      // heavy-tail diagnostic over doc lengths: Hill alpha on the top-500
      // order statistics — alpha <= 2 means infinite variance (mean-based
      // budgets silently break); pico-fx logs, bounded top-k sort
      graft.scan.Drift.hillEstimator(t(s, dir, "documents"), "n_chars",
        k = 500)
    },

    "q_outliers" -> { (s, dir) =>
      // Tukey-fence outliers per returnflag on fixed-point cents (integer
      // domain keeps quartile interpolation + fence arithmetic bit-exact)
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.iqrOutliers(li, col("cents"), "l_returnflag")
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).cast(LongType).as("n_outliers"),
          min(when(col("is_outlier"), col("cents"))).as("min_outlier_cents"),
          max(when(col("is_outlier"), col("cents"))).as("max_outlier_cents"))
        .orderBy("l_returnflag")
    },

    "q_anomaly" -> { (s, dir) =>
      // rolling z-score over each user's event sequence: flag events more
      // than 3 sigma (t^2 = 9) from their PRECEDING-10 window — the flag is
      // pure integer arithmetic on fixed-point longs ((nv-S)^2 > t^2(nQ-S^2)),
      // so the oracle window reproduces it exactly
      Outliers.rollingZScore(t(s, dir, "events"), Seq("user_id"), "event_id",
          "value", window = 10, tSquared = 9, minPoints = 5)
        .where(col("is_anomaly"))
        .select(col("user_id"), col("event_id"))
        .orderBy("user_id", "event_id")
    },

    "q_heavy_hitters" -> { (s, dir) =>
      // Misra-Gries summary over lang with k above the distinct-language
      // count -> counts EXACT and order-independent (the oracle is a plain
      // GROUP BY); the overflow/merge behavior is property-spec'd
      val sk = t(s, dir, "documents")
        .agg(graft.functions.MgSketch.mg(col("lang"), 16).as("hh"))
      sk.select(explode(col("hh")).as("e"))
        .select(col("e.item").as("lang"), col("e.cnt").as("cnt"))
        .orderBy(col("cnt").desc, col("lang").asc)
    },

    "q_heavy_hitters_group" -> { (s, dir) =>
      // the mergeable MG summary as a GROUPED aggregate: per source the
      // top languages — bounded k-entry state per group; k above the
      // distinct count keeps the exact-path oracle
      val sk = t(s, dir, "documents")
        .groupBy("source")
        .agg(graft.functions.MgSketch.mg(col("lang"), 16).as("hh"))
      sk.select(col("source"), explode(col("hh")).as("e"))
        .select(col("source"), col("e.item").as("lang"), col("e.cnt").as("cnt"))
        .orderBy(col("source"), col("cnt").desc, col("lang").asc)
    },

    "q_winsorize_group" -> { (s, dir) =>
      // per-group winsorization: clamp into each return flag's OWN 5/95
      // fences (iqrOutliers' grouped-percentile shape + winsorize's clamp)
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.winsorizeByGroup(base, "cents", "l_returnflag", 0.05, 0.95)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_clipped"), 1L).otherwise(0L)).cast(LongType).as("clipped"),
          sum(MetricColumns.fixedPointLong(col("cents_winsorized"), 2))
            .cast(LongType).as("wsum_fx"))
        .orderBy("l_returnflag")
    },

    "q_heavy_hitters_ss" -> { (s, dir) =>
      // SpaceSaving (overwrite-min) twin of q_heavy_hitters: k above the
      // distinct-language count -> no overwrite ever fires, counts EXACT and
      // err 0 (the oracle is a plain GROUP BY with a zero err column); the
      // overwrite/merge/error-bound behavior is property-spec'd
      val sk = t(s, dir, "documents")
        .agg(graft.functions.SpaceSaving.ss(col("lang"), 16).as("hh"))
      sk.select(explode(col("hh")).as("e"))
        .select(col("e.item").as("lang"), col("e.cnt").as("cnt"), col("e.err").as("err"))
        .orderBy(col("cnt").desc, col("lang").asc)
    },

    "q_corr" -> ((s, dir) =>
      // exact Pearson r for two pairs in one pass: quantity~price
      // (positively correlated by construction) and discount~tax (~0);
      // moments are exact integers, r derived with a fixed double tree
      Correlation.corrPairs(t(s, dir, "lineitem"), Seq(
          "l_quantity" -> "l_extendedprice",
          "l_discount" -> "l_tax"), scale = 2)
        .orderBy("pair")),

    "q_skew_report" -> ((s, dir) =>
      // hottest 10 sources + integer ppm share — the diagnostic that
      // decides whether salting/AQE skew handling is needed
      Skew.skewReport(t(s, dir, "documents"), "source", topK = 10)
        .orderBy(col("cnt").desc, col("key").asc)),

    "q_bins" -> ((s, dir) =>
      // equi-depth discretization of extended price (cents): 8 ~75k-row
      // buckets where the equi-width histogram would be skew-lopsided;
      // integer bin formula reproduced exactly by the oracle
      Binning.equiDepthBins(t(s, dir, "lineitem"),
          MetricColumns.fixedPointLong(col("l_extendedprice"), 2), k = 8)
        .orderBy("bin")),

    "q_pct_rank" -> ((s, dir) =>
      // exact empirical CDF of quantity cents: the corpus-relative score
      // normalizer; same routed-cumulative shape as q_bins, no global row
      // window anywhere
      Binning.valueRanks(t(s, dir, "lineitem"),
        MetricColumns.fixedPointLong(col("l_quantity"), 2))
        .orderBy("v")),

    "q_mad" -> { (s, dir) =>
      // median/MAD robust outlier flags (Hampel rule) per return flag on
      // fixed-point cents: medians interpolate to exactly-representable
      // halves, so med/mad/flag all replay bit-for-bit in the oracle
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.madOutliers(base, col("cents"), "l_returnflag", k = 3.0)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_outlier"), 1L).otherwise(0L)).cast(LongType).as("n_outliers"),
          min(col("__med")).as("med"), min(col("__mad")).as("mad"))
        .orderBy("l_returnflag")
    },

    "q_winsorize" -> { (s, dir) =>
      // heavy-tail clipping into exact 5/95 percentile fences; summary per
      // flag with an order-free quantized sum of the clamped values
      val base = t(s, dir, "lineitem").select(col("l_returnflag"),
        MetricColumns.fixedPointLong(col("l_extendedprice"), 2).as("cents"))
      Outliers.winsorize(base, "cents", 0.05, 0.95)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_clipped"), 1L).otherwise(0L)).cast(LongType).as("clipped"),
          sum(MetricColumns.fixedPointLong(col("cents_winsorized"), 2))
            .cast(LongType).as("wsum_fx"))
        .orderBy("l_returnflag")
    },

    "q_percentiles_group" -> { (s, dir) =>
      val p = percentile(col("l_quantity"), array(lit(0.25), lit(0.5), lit(0.75)))
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(p.as("ps"))
        .select(col("l_returnflag"),
          element_at(col("ps"), 1).as("p25"),
          element_at(col("ps"), 2).as("p50"),
          element_at(col("ps"), 3).as("p75"))
        .orderBy("l_returnflag")
    },

    "q_robust_scale" -> ((s, dir) =>
      // median/IQR scaling of price cents: routed exact quantile fences as
      // literals, pure row-local transform; one value per distinct cents
      // keeps the gate output distinct-bounded
      Binning.robustScale(
          t(s, dir, "lineitem").select(col("l_extendedprice")),
          "l_extendedprice", scale = 2)
        .groupBy(col("l_extendedprice_rz").as("rz"))
        .agg(count(lit(1)).as("n"))
        .orderBy("rz")),

    "q_spearman" -> ((s, dir) =>
      // exact Spearman rho between quantity and price — the rank-based
      // association q_corr's Pearson can't see past marginal scales;
      // doubled tie-averaged ranks keep every moment an exact integer
      Correlation.spearman(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", scale = 2)),

    "q_corr_matrix" -> ((s, dir) =>
      // FULL 4x4 correlation matrix in ONE CovVectorAgg pass (6 pairs from
      // one d2-long mergeable state) - vs q_corr's two per-pair aggregates
      Correlation.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), scale = 2)
        .orderBy("col_a", "col_b")),

    "q_skyline" -> { (s, dir) =>
      // Pareto frontier over per-supplier aggregates: suppliers no other
      // supplier beats on (revenue max, volume max, discount burden min)
      // at once — the multi-criteria selection a weighted score can't
      // express; two-phase local-skyline + candidate anti-join
      val sup = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(
          sum(MetricColumns.fixedPointLong(col("l_extendedprice"), 2))
            .cast(LongType).as("revenue_c"),
          count(lit(1)).cast(LongType).as("n_items"),
          sum(MetricColumns.fixedPointLong(col("l_discount"), 2))
            .cast(LongType).as("disc_c"))
      Pareto.skyline(sup,
          Seq(("revenue_c", true), ("n_items", true), ("disc_c", false)))
        .orderBy("suppkey")
    },

    "q_ewma" -> ((s, dir) =>
      // replayable integer EWMA (alpha = 3/10) per user over event values;
      // the oracle refolds the identical recurrence via list_reduce
      Outliers.ewma(t(s, dir, "events"), Seq("user_id"), "event_id", "value",
        alphaNum = 3, alphaDen = 10)
        .orderBy("user_id")),

    "q_holt" -> ((s, dir) =>
      // Holt level+trend (alpha 3/10, beta 2/10) per user over the event
      // stream; the oracle refolds the identical array-state recurrence
      // via list_reduce over list accumulators
      Outliers.holt(t(s, dir, "events"), Seq("user_id"), "event_id", "value",
        alphaNum = 3, alphaDen = 10, betaNum = 2, betaDen = 10)
        .select("user_id", "n", "level_fx", "trend_fx", "level", "forecast")
        .orderBy("user_id")),

    "q_holt_winters" -> ((s, dir) =>
      // Holt-Winters ADDITIVE seasonal (period 4, alpha 3/10, beta 2/10,
      // gamma 5/10) per user: level + trend + a 4-slot cycle the plain
      // Holt reads as trend; seasons split into scalar columns for the
      // driver hash, oracle refolds the identical (3+m)-long list state
      Outliers.holtWinters(t(s, dir, "events"), Seq("user_id"), "event_id",
          "value", period = 4, alphaNum = 3, alphaDen = 10,
          betaNum = 2, betaDen = 10, gammaNum = 5, gammaDen = 10)
        .select(col("user_id"), col("n"), col("level_fx"), col("trend_fx"),
          expr("element_at(season_fx, 1)").as("s0"),
          expr("element_at(season_fx, 2)").as("s1"),
          expr("element_at(season_fx, 3)").as("s2"),
          expr("element_at(season_fx, 4)").as("s3"),
          col("level"), col("forecast"))
        .orderBy("user_id")),

    "q_cusum" -> ((s, dir) =>
      // two-sided CUSUM per user over the event stream: prefix-sum +
      // running-min windows (group-bounded), all-integer statistics
      Outliers.cusum(t(s, dir, "events"), Seq("user_id"), "event_id", "value",
        target = 60.0, slack = 10.0, threshold = 500.0)
        .select("user_id", "event_id", "s_up", "s_dn", "alarm_up", "alarm_dn")
        .orderBy("user_id", "event_id")),

    "q_page_hinkley" -> { (s, dir) =>
      // the target-free sequential drift alarm next to q_cusum: daily
      // counts tested against their OWN running mean (no prior target);
      // micro-fx deviations keep U and its running min exact integers
      val daily = t(s, dir, "events")
        .selectExpr("event_type", "unix_micros(ts) div 86400000000L as d")
        .groupBy("event_type", "d").agg(count(lit(1)).as("cnt"))
      Outliers.pageHinkley(daily, Seq("event_type"), "d", "cnt",
        delta = 0.0, lambda = 30.0, fxScale = 0)
        .select("event_type", "d", "cnt", "ph", "alarm")
        .orderBy("event_type", "d")
    },

    "q_trend" -> ((s, dir) =>
      // per-group OLS: price-vs-quantity slope/intercept per return flag
      // from decimal-exact co-moments, one grouped aggregate
      Correlation.trendByGroup(t(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    "q_mutual_info" -> { (s, dir) =>
      // entropy/MI on the same two categorical pairs as q_cramers_v — the
      // information-theoretic reading of the same contingency cells
      Correlation.mutualInfo(t(s, dir, "orders"),
        Seq("o_orderstatus" -> "o_orderpriority"))
        .unionAll(Correlation.mutualInfo(t(s, dir, "lineitem"),
          Seq("l_returnflag" -> "l_linestatus")))
        .orderBy("pair")
    },

    "q_cramers_v" -> { (s, dir) =>
      // categorical association: order status~priority (near-independent)
      // and returnflag~linestatus (strongly dependent — both track
      // shipdate); χ² via order-free fixed-point cell terms
      Correlation.cramersV(t(s, dir, "orders"),
        Seq("o_orderstatus" -> "o_orderpriority"))
        .unionAll(Correlation.cramersV(t(s, dir, "lineitem"),
          Seq("l_returnflag" -> "l_linestatus")))
        .orderBy("pair")
    },

    "q_psi" -> { (s, dir) =>
      // distribution drift: PSI of l_extendedprice between early and late
      // ship dates; per-bucket fixed-point contributions (integer rows)
      val li = t(s, dir, "lineitem")
      val cut = lit("1996-01-01").cast(TimestampType)
      graft.scan.Drift.psiBuckets(
        li.where(col("l_shipdate") < cut), li.where(col("l_shipdate") >= cut),
        "l_extendedprice", lo = 900.0, hi = 105000.0, buckets = 10)
        .orderBy("bucket")
    },

  )

  val oracleSql: Map[String, String] = Map(
    "q_ndcg" ->
      """WITH ev AS (SELECT user_id, event_type,
        |                   epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d FROM events),
        |fh AS (SELECT user_id, event_type, count(*) AS cnt FROM ev WHERE d < 19737 GROUP BY 1, 2),
        |fr AS (SELECT user_id, event_type,
        |              CAST(row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS rank
        |       FROM fh),
        |sh AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS rel
        |       FROM ev WHERE d >= 19737 GROUP BY 1, 2),
        |j AS (SELECT fr.user_id, fr.rank, coalesce(sh.rel, 0) AS rel
        |      FROM fr LEFT JOIN sh USING (user_id, event_type)),
        |ip AS (SELECT user_id, rank, rel,
        |              CAST(row_number() OVER (PARTITION BY user_id ORDER BY rel DESC, rank ASC) AS BIGINT) AS ipos
        |       FROM j),
        |t AS (SELECT user_id, rel, rank,
        |        CASE WHEN rank <= 3 AND rel > 0 THEN CAST(floor(
        |          CAST(rel AS DOUBLE) / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))
        |          * 1000000000000.0 + 0.5) AS HUGEINT) ELSE 0 END AS dfx,
        |        CASE WHEN ipos <= 3 AND rel > 0 THEN CAST(floor(
        |          CAST(rel AS DOUBLE) / (ln(CAST(ipos AS DOUBLE) + 1.0) / ln(2.0))
        |          * 1000000000000.0 + 0.5) AS HUGEINT) ELSE 0 END AS ifx
        |      FROM ip),
        |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_items,
        |             sum(dfx) AS dd, sum(ifx) AS ii,
        |             min(CASE WHEN rel > 0 THEN rank END) AS fst
        |      FROM t GROUP BY 1)
        |SELECT user_id, n_items,
        |       CAST(dd AS DOUBLE) / 1000000000000.0 AS dcg,
        |       CAST(ii AS DOUBLE) / 1000000000000.0 AS idcg,
        |       CASE WHEN ii > 0 THEN CAST(dd AS DOUBLE) / CAST(ii AS DOUBLE) END AS ndcg,
        |       CASE WHEN fst IS NOT NULL THEN 1.0 / CAST(fst AS DOUBLE) END AS rr
        |FROM a ORDER BY user_id""".stripMargin,

    "q_bradley_terry" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |                   CAST(l_suppkey % 5 AS VARCHAR) AS team, l_shipdate AS sd FROM lineitem),
        |mt AS (SELECT CASE WHEN a.sd < b.sd THEN a.team ELSE b.team END AS wi,
        |              CASE WHEN a.sd < b.sd THEN b.team ELSE a.team END AS lo
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.ln < b.ln
        |       WHERE a.team <> b.team AND a.sd <> b.sd),
        |wins AS (SELECT wi AS i, lo AS j, CAST(count(*) AS BIGINT) AS w FROM mt GROUP BY 1, 2),
        |pairs AS (SELECT i, j, CAST(sum(w) AS BIGINT) AS n FROM (
        |            SELECT i, j, w FROM wins
        |            UNION ALL SELECT j AS i, i AS j, w FROM wins) GROUP BY 1, 2),
        |wt AS (SELECT i, CAST(sum(w) AS BIGINT) AS wins FROM wins GROUP BY 1),
        |it AS (SELECT d.i, coalesce(wt.wins, 0) AS wins
        |       FROM (SELECT DISTINCT i FROM pairs) d LEFT JOIN wt USING (i)),
        |p0 AS (SELECT i, 1.0 AS pi FROM it),
        |d1 AS (SELECT pairs.i, sum(CAST(floor(CAST(n AS DOUBLE) / (x.pi + y.pi) * 1000000000000.0 + 0.5) AS HUGEINT)) AS den
        |       FROM pairs JOIN p0 x ON pairs.i = x.i JOIN p0 y ON pairs.j = y.i GROUP BY 1),
        |p1 AS (SELECT it.i, CASE WHEN d1.den IS NOT NULL AND d1.den > 0
        |              THEN CAST(it.wins AS DOUBLE) * 1000000000000.0 / CAST(d1.den AS DOUBLE) ELSE 0.0 END AS pi
        |       FROM it LEFT JOIN d1 USING (i)),
        |d2 AS (SELECT pairs.i, sum(CAST(floor(CAST(n AS DOUBLE) / (x.pi + y.pi) * 1000000000000.0 + 0.5) AS HUGEINT)) AS den
        |       FROM pairs JOIN p1 x ON pairs.i = x.i JOIN p1 y ON pairs.j = y.i GROUP BY 1),
        |p2 AS (SELECT it.i, CASE WHEN d2.den IS NOT NULL AND d2.den > 0
        |              THEN CAST(it.wins AS DOUBLE) * 1000000000000.0 / CAST(d2.den AS DOUBLE) ELSE 0.0 END AS pi
        |       FROM it LEFT JOIN d2 USING (i)),
        |d3 AS (SELECT pairs.i, sum(CAST(floor(CAST(n AS DOUBLE) / (x.pi + y.pi) * 1000000000000.0 + 0.5) AS HUGEINT)) AS den
        |       FROM pairs JOIN p2 x ON pairs.i = x.i JOIN p2 y ON pairs.j = y.i GROUP BY 1),
        |p3 AS (SELECT it.i, CASE WHEN d3.den IS NOT NULL AND d3.den > 0
        |              THEN CAST(it.wins AS DOUBLE) * 1000000000000.0 / CAST(d3.den AS DOUBLE) ELSE 0.0 END AS pi
        |       FROM it LEFT JOIN d3 USING (i)),
        |d4 AS (SELECT pairs.i, sum(CAST(floor(CAST(n AS DOUBLE) / (x.pi + y.pi) * 1000000000000.0 + 0.5) AS HUGEINT)) AS den
        |       FROM pairs JOIN p3 x ON pairs.i = x.i JOIN p3 y ON pairs.j = y.i GROUP BY 1),
        |p4 AS (SELECT it.i, CASE WHEN d4.den IS NOT NULL AND d4.den > 0
        |              THEN CAST(it.wins AS DOUBLE) * 1000000000000.0 / CAST(d4.den AS DOUBLE) ELSE 0.0 END AS pi
        |       FROM it LEFT JOIN d4 USING (i)),
        |d5 AS (SELECT pairs.i, sum(CAST(floor(CAST(n AS DOUBLE) / (x.pi + y.pi) * 1000000000000.0 + 0.5) AS HUGEINT)) AS den
        |       FROM pairs JOIN p4 x ON pairs.i = x.i JOIN p4 y ON pairs.j = y.i GROUP BY 1),
        |p5 AS (SELECT it.i, CASE WHEN d5.den IS NOT NULL AND d5.den > 0
        |              THEN CAST(it.wins AS DOUBLE) * 1000000000000.0 / CAST(d5.den AS DOUBLE) ELSE 0.0 END AS pi
        |       FROM it LEFT JOIN d5 USING (i)),
        |tot AS (SELECT sum(CAST(floor(pi * 1000000000000.0 + 0.5) AS HUGEINT)) AS t FROM p5),
        |mtc AS (SELECT i, CAST(sum(n) AS BIGINT) AS matches FROM pairs GROUP BY 1)
        |SELECT it.i AS item, it.wins, coalesce(mtc.matches, 0) AS matches, p5.pi,
        |       CASE WHEN tot.t > 0 THEN
        |         CAST(CAST(floor(p5.pi * 1000000000000.0 + 0.5) AS HUGEINT) AS DOUBLE) / CAST(tot.t AS DOUBLE)
        |       END AS strength
        |FROM it JOIN p5 USING (i) LEFT JOIN mtc USING (i), tot ORDER BY item""".stripMargin,

    "q_wilcoxon_group" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, cnt,
        |             lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred FROM ser),
        |f AS (SELECT event_type AS g, cnt - pred AS dd FROM p
        |      WHERE pred IS NOT NULL AND cnt - pred <> 0),
        |c AS (SELECT g, abs(dd) AS v,
        |             sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS cp,
        |             count(*) AS c FROM f GROUP BY 1, 2),
        |k AS (SELECT g, cp, c, sum(c) OVER (PARTITION BY g ORDER BY v) AS kc,
        |             sum(c) OVER (PARTITION BY g) AS n FROM c),
        |m AS (SELECT g, CAST(max(n) AS BIGINT) AS n,
        |             sum(CAST(cp AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS w2,
        |             sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS ties
        |      FROM k GROUP BY 1)
        |SELECT g AS event_type, n, CAST(w2 AS BIGINT) AS w_doubled,
        |       CAST(ties AS DOUBLE) AS tie_term,
        |       CASE WHEN n > 0 AND
        |                 CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |                   - CAST(ties AS DOUBLE) / 48.0 > 0.0
        |       THEN (CAST(w2 AS DOUBLE) - CAST(CAST(n AS HUGEINT) * (n + 1) AS DOUBLE) / 2.0) / 2.0
        |            / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |                   - CAST(ties AS DOUBLE) / 48.0)
        |       END AS z
        |FROM m ORDER BY event_type""".stripMargin,

    "q_kripp" ->
      """WITH cells AS (SELECT CAST(l_orderkey AS VARCHAR) AS i, l_returnflag AS j,
        |                      CAST(count(*) AS BIGINT) AS c
        |               FROM lineitem GROUP BY 1, 2),
        |nu AS (SELECT i, CAST(sum(c) AS BIGINT) AS nu FROM cells GROUP BY 1 HAVING sum(c) >= 2),
        |kept AS (SELECT cells.i, cells.j, cells.c, nu.nu FROM cells JOIN nu USING (i)),
        |dobs AS (SELECT coalesce(sum(CAST(floor(CAST(c * (nu - c) AS DOUBLE) / CAST(nu - 1 AS DOUBLE)
        |                 * 1000000000000.0 + 0.5) AS HUGEINT)), 0) AS do_fx,
        |                CAST(count(DISTINCT i) AS BIGINT) AS items FROM kept),
        |mg AS (SELECT j, CAST(sum(c) AS BIGINT) AS nc FROM kept GROUP BY 1),
        |nn AS (SELECT CAST(coalesce(sum(nc), 0) AS BIGINT) AS n FROM mg),
        |ma AS (SELECT nn.n, CAST(count(*) AS BIGINT) AS categories,
        |              sum(CAST(nc AS HUGEINT) * (nn.n - nc)) AS de
        |       FROM mg, nn GROUP BY nn.n)
        |SELECT dobs.items, ma.n, ma.categories,
        |       CASE WHEN dobs.items > 0 AND ma.de > 0
        |            THEN 1.0 - CAST(ma.n - 1 AS DOUBLE) * (CAST(dobs.do_fx AS DOUBLE) / 1000000000000.0)
        |                 / CAST(ma.de AS DOUBLE) END AS alpha
        |FROM dobs, ma""".stripMargin,

    "q_qini" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS score,
        |                  sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                       ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS tvfx
        |           FROM events GROUP BY 1),
        |r AS (SELECT score AS s, user_id % 2 = 0 AS t, tvfx > 60000 AS y FROM u),
        |cells AS (SELECT s, CAST(count(*) AS BIGINT) AS c,
        |                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |                 CAST(sum(CASE WHEN t AND y THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |                 CAST(sum(CASE WHEN NOT t AND y THEN 1 ELSE 0 END) AS BIGINT) AS cc
        |          FROM r GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM r),
        |k AS (SELECT *, sum(c) OVER (ORDER BY s DESC) AS cum FROM cells),
        |b AS (SELECT ((cum - 1) * 10) // total AS bucket,
        |             CAST(sum(nt) AS BIGINT) AS n_t, CAST(sum(c - nt) AS BIGINT) AS n_c,
        |             CAST(sum(ct) AS BIGINT) AS conv_t, CAST(sum(cc) AS BIGINT) AS conv_c
        |      FROM k, n GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket, n_t, n_c, conv_t, conv_c,
        |       CASE WHEN sum(n_c) OVER w > 0
        |            THEN CAST(sum(conv_t) OVER w AS DOUBLE)
        |                 - CAST(sum(conv_c) OVER w AS DOUBLE) * CAST(sum(n_t) OVER w AS DOUBLE)
        |                   / CAST(sum(n_c) OVER w AS DOUBLE) END AS cum_qini
        |FROM b WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin,

    "q_fleiss" ->
      """WITH cells AS (SELECT CAST(l_orderkey AS VARCHAR) AS i, l_returnflag AS j, count(*) AS c
        |               FROM lineitem GROUP BY 1, 2),
        |keep AS (SELECT i FROM cells GROUP BY i HAVING sum(c) = 4),
        |kept AS (SELECT cells.* FROM cells JOIN keep USING (i)),
        |s AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS items,
        |             sum(CAST(c AS HUGEINT) * c) AS ss FROM kept),
        |mg AS (SELECT j, sum(c) AS cj FROM kept GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS categories,
        |             sum(CAST(cj AS HUGEINT) * cj) AS mm FROM mg),
        |x AS (SELECT items, categories,
        |             (CAST(ss AS DOUBLE) - CAST(items AS DOUBLE) * 4.0)
        |               / (CAST(items AS DOUBLE) * 4.0 * (4.0 - 1.0)) AS p_bar,
        |             CAST(mm AS DOUBLE)
        |               / (CAST(items AS DOUBLE) * 4.0 * (CAST(items AS DOUBLE) * 4.0)) AS p_e
        |      FROM s, m)
        |SELECT items, CAST(4 AS BIGINT) AS raters, categories,
        |       CASE WHEN items > 0 THEN p_bar END AS p_bar,
        |       CASE WHEN items > 0 THEN p_e END AS p_e,
        |       CASE WHEN items > 0 AND p_e < 1.0 THEN (p_bar - p_e) / (1.0 - p_e) END AS kappa
        |FROM x""".stripMargin,

    "q_wilcoxon" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, cnt,
        |             lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred FROM ser),
        |f AS (SELECT cnt - pred AS dd FROM p WHERE pred IS NOT NULL AND cnt - pred <> 0),
        |c AS (SELECT abs(dd) AS v,
        |             sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS cp,
        |             count(*) AS c FROM f GROUP BY 1),
        |k AS (SELECT v, cp, c, sum(c) OVER (ORDER BY v) AS kc FROM c),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |             sum(CAST(cp AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS w2,
        |             sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS ties
        |      FROM k)
        |SELECT n, CAST(w2 AS BIGINT) AS w_doubled, CAST(ties AS DOUBLE) AS tie_term,
        |       CASE WHEN n > 0 AND
        |                 CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |                   - CAST(ties AS DOUBLE) / 48.0 > 0.0
        |       THEN (CAST(w2 AS DOUBLE) - CAST(CAST(n AS HUGEINT) * (n + 1) // 2 AS DOUBLE)) / 2.0
        |            / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |                   - CAST(ties AS DOUBLE) / 48.0)
        |       END AS z
        |FROM m""".stripMargin,

    "q_theil_ineq" ->
      """WITH f AS (SELECT o_orderpriority AS g,
        |                  CAST(CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice * 100.0 + 0.5)
        |                       ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT) AS v
        |           FROM orders),
        |cells AS (SELECT g, v, count(*) AS c FROM f WHERE v > 0 GROUP BY 1, 2),
        |gt AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng, sum(CAST(v AS HUGEINT) * c) AS xg
        |       FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(ng) AS BIGINT) AS n, sum(xg) AS x,
        |             CAST(count(*) AS BIGINT) AS groups FROM gt),
        |terms AS (SELECT
        |            CAST(v AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t.x AS DOUBLE)
        |              * ln(CAST(v AS DOUBLE) * CAST(gt.ng AS DOUBLE) / CAST(gt.xg AS DOUBLE)) * 1000000000000.0 AS wt,
        |            CAST(v AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t.x AS DOUBLE)
        |              * ln(CAST(v AS DOUBLE) * CAST(t.n AS DOUBLE) / CAST(t.x AS DOUBLE)) * 1000000000000.0 AS tt
        |          FROM cells JOIN gt USING (g), t),
        |sums AS (SELECT
        |           sum(CAST(CASE WHEN wt >= 0 THEN floor(wt + 0.5) ELSE -floor(-wt + 0.5) END AS HUGEINT)) AS w_fx,
        |           sum(CAST(CASE WHEN tt >= 0 THEN floor(tt + 0.5) ELSE -floor(-tt + 0.5) END AS HUGEINT)) AS t_fx
        |         FROM terms),
        |bt AS (SELECT CAST(gt.xg AS DOUBLE) / CAST(t.x AS DOUBLE)
        |                * ln((CAST(gt.xg AS DOUBLE) / CAST(t.x AS DOUBLE))
        |                     / (CAST(gt.ng AS DOUBLE) / CAST(t.n AS DOUBLE))) * 1000000000000.0 AS b
        |       FROM gt, t),
        |bs AS (SELECT sum(CAST(CASE WHEN b >= 0 THEN floor(b + 0.5) ELSE -floor(-b + 0.5) END AS HUGEINT)) AS b_fx FROM bt)
        |SELECT t.n, t.groups,
        |       CAST(t_fx AS DOUBLE) / 1000000000000.0 AS theil_total,
        |       CAST(b_fx AS DOUBLE) / 1000000000000.0 AS theil_between,
        |       CAST(w_fx AS DOUBLE) / 1000000000000.0 AS theil_within
        |FROM sums, bs, t""".stripMargin,

    "q_jarque_bera" ->
      """WITH f AS (SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                  ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |t AS (SELECT sum(CAST(v AS HUGEINT)) AS s, CAST(count(*) AS BIGINT) AS n FROM f),
        |mu AS (SELECT n, s // n AS mu FROM t),
        |m AS (SELECT mu.n AS n,
        |             sum(CAST(v - mu.mu AS HUGEINT)) AS s1,
        |             sum(CAST(v - mu.mu AS HUGEINT) * (v - mu.mu)) AS s2,
        |             sum(CAST(v - mu.mu AS HUGEINT) * (v - mu.mu) * (v - mu.mu)) AS s3,
        |             sum(CAST(v - mu.mu AS HUGEINT) * (v - mu.mu) * (v - mu.mu) * (v - mu.mu)) AS s4
        |      FROM f, mu GROUP BY 1),
        |d AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
        |             CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4 FROM m),
        |c AS (SELECT n, nd, s1 / nd AS del, s2, s3, s4 FROM d),
        |mm AS (SELECT n, nd,
        |              s2 / nd - del * del AS m2,
        |              s3 / nd - 3.0 * del * (s2 / nd) + 2.0 * del * del * del AS m3,
        |              s4 / nd - 4.0 * del * (s3 / nd) + 6.0 * del * del * (s2 / nd)
        |                - 3.0 * del * del * del * del AS m4
        |       FROM c),
        |st AS (SELECT n, nd, m2, m3 / sqrt(m2 * m2 * m2) AS skew, m4 / (m2 * m2) AS kurt FROM mm)
        |SELECT n,
        |       CASE WHEN n > 1 AND m2 > 0.0 THEN skew END AS skewness,
        |       CASE WHEN n > 1 AND m2 > 0.0 THEN kurt END AS kurtosis,
        |       CASE WHEN n > 1 AND m2 > 0.0
        |       THEN nd / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) END AS jb
        |FROM st""".stripMargin,

    "q_kruskal" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         l_returnflag AS g
        |  FROM lineitem),
        |c AS (SELECT v, g, count(*) AS cg FROM u GROUP BY v, g),
        |vc AS (SELECT v, sum(cg) AS c FROM c GROUP BY v),
        |k AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS kc FROM vc),
        |r AS (SELECT v, c, (kc - c) * 2 + c + 1 AS dr FROM k),
        |tn AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |              CAST(sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS BIGINT) AS ties
        |       FROM r),
        |bg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng0, CAST(sum(cg) AS HUGEINT) AS ng,
        |              sum(CAST(cg AS HUGEINT) * dr) AS rd
        |       FROM c JOIN r USING (v) GROUP BY g),
        |st AS (SELECT count(*) AS groups,
        |              sum(((rd - ng * (tn.n + 1)) * (rd - ng * (tn.n + 1)) * 1000000) // (ng * 4)) AS hnum,
        |              max(tn.n) AS n, max(tn.ties) AS ties
        |       FROM bg, tn)
        |SELECT groups, n, ties AS tie_term,
        |       CASE WHEN 1.0 - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) > 0.0
        |       THEN 12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * (CAST(hnum AS DOUBLE) / 1000000.0)
        |            / (1.0 - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
        |       END AS h
        |FROM st""".stripMargin,

    "q_anova" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         l_returnflag AS g
        |  FROM lineitem),
        |tot AS (SELECT sum(CAST(v AS HUGEINT)) AS s, CAST(count(*) AS BIGINT) AS n FROM u),
        |mu AS (SELECT s // n AS mu, s - (s // n) * n AS srem, n FROM tot),
        |bg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |              sum(CAST(v - mu.mu AS HUGEINT)) AS sg,
        |              sum(CAST(v - mu.mu AS HUGEINT) * CAST(v - mu.mu AS HUGEINT)) AS qg,
        |              max(mu.srem) AS srem, max(mu.n) AS n
        |       FROM u, mu GROUP BY g),
        |st AS (SELECT count(*) AS groups, max(n) AS n,
        |              sum(CAST(floor((CAST(sg AS DOUBLE) * CAST(n AS DOUBLE) - CAST(srem AS DOUBLE) * CAST(ng AS DOUBLE))
        |                           * (CAST(sg AS DOUBLE) * CAST(n AS DOUBLE) - CAST(srem AS DOUBLE) * CAST(ng AS DOUBLE))
        |                           / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS HUGEINT)) AS ssb,
        |              sum(CAST(floor((CAST(qg AS DOUBLE) * CAST(ng AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |                           / CAST(ng AS DOUBLE)) AS HUGEINT)) AS ssw
        |       FROM bg)
        |SELECT groups, n, CAST(ssb AS DOUBLE) AS ssb, CAST(ssw AS DOUBLE) AS ssw,
        |       CASE WHEN groups > 1 AND n > groups AND CAST(ssw AS DOUBLE) > 0.0
        |       THEN (CAST(ssb AS DOUBLE) / CAST(groups - 1 AS DOUBLE))
        |            / (CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(groups AS DOUBLE)))
        |       END AS f
        |FROM st""".stripMargin,

    "q_cliffs" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT cents AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS kc FROM c),
        |m AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(CAST(c1 AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS r1d
        |      FROM k),
        |d AS (SELECT n1, n2,
        |             CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS ud,
        |             CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE)
        |               / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - 1.0 AS delta
        |      FROM m)
        |SELECT n1 AS n_ref, n2 AS n_cur, ud AS u_doubled, delta,
        |       CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |            WHEN abs(delta) < 0.33 THEN 'small'
        |            WHEN abs(delta) < 0.474 THEN 'medium'
        |            ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,

    "q_js_div" ->
      """WITH u AS (
        |  SELECT o_orderpriority AS k,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS side
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |c AS (SELECT k,
        |             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM u GROUP BY k),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             CAST(count(*) AS BIGINT) AS cats FROM c),
        |tm AS (SELECT
        |         (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n.n1 AS DOUBLE))
        |                 * ln(2.0 * (CAST(c1 AS DOUBLE) / CAST(n.n1 AS DOUBLE))
        |                      / ((CAST(c1 AS DOUBLE) / CAST(n.n1 AS DOUBLE)) + (CAST(c2 AS DOUBLE) / CAST(n.n2 AS DOUBLE))))
        |               ELSE 0.0 END) * 0.5
        |       + (CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n.n2 AS DOUBLE))
        |                 * ln(2.0 * (CAST(c2 AS DOUBLE) / CAST(n.n2 AS DOUBLE))
        |                      / ((CAST(c1 AS DOUBLE) / CAST(n.n1 AS DOUBLE)) + (CAST(c2 AS DOUBLE) / CAST(n.n2 AS DOUBLE))))
        |               ELSE 0.0 END) * 0.5 AS term
        |       FROM c, n),
        |fx AS (SELECT CAST(sum(CAST(CASE WHEN term >= 0 THEN floor(term * 1000000000000.0 + 0.5)
        |                                 ELSE -floor(-term * 1000000000000.0 + 0.5) END AS BIGINT)) AS BIGINT) AS js_fx
        |       FROM tm)
        |SELECT n.n1 AS n_ref, n.n2 AS n_cur, n.cats AS categories, fx.js_fx,
        |       CAST(fx.js_fx AS DOUBLE) / 1000000000000.0 AS js
        |FROM n, fx""".stripMargin,

    "q_acf" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, d, v AS x, unnest(range(1, 8)) AS lag FROM ser),
        |j AS (SELECT l.event_type, l.lag, l.x, r.v AS y
        |      FROM l JOIN ser r ON r.event_type = l.event_type AND r.d = l.d + l.lag),
        |m AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
        |             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |      FROM j GROUP BY 1, 2)
        |SELECT event_type, lag, n_pairs,
        |       CASE WHEN dx > 0.0 AND dy > 0.0 THEN num / (sqrt(dx) * sqrt(dy)) END AS acf
        |FROM (SELECT event_type, lag, n_pairs,
        |        CAST(n_pairs * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n_pairs * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n_pairs * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m) t
        |ORDER BY event_type, lag""".stripMargin,

    "q_theilsen" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                                       ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS y
        |             FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ser GROUP BY event_type),
        |sl AS (SELECT a.event_type,
        |              CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
        |       FROM ser a JOIN ser b ON a.event_type = b.event_type AND a.d < b.d),
        |slr AS (SELECT event_type, s,
        |               row_number() OVER (PARTITION BY event_type ORDER BY s) AS rn,
        |               count(*) OVER (PARTITION BY event_type) AS cnt
        |        FROM sl),
        |med AS (SELECT event_type, avg(s) AS slope FROM slr
        |        WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1 GROUP BY event_type),
        |nsl AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_slopes FROM sl GROUP BY event_type),
        |res AS (SELECT ser.event_type,
        |               CAST(ser.y AS DOUBLE) - med.slope * CAST(ser.d AS DOUBLE) AS r
        |        FROM ser JOIN med USING (event_type)),
        |rr AS (SELECT event_type, r,
        |              row_number() OVER (PARTITION BY event_type ORDER BY r) AS rn,
        |              count(*) OVER (PARTITION BY event_type) AS cnt
        |       FROM res),
        |im AS (SELECT event_type, avg(r) AS intercept FROM rr
        |       WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1 GROUP BY event_type)
        |SELECT n.event_type, n.n,
        |       coalesce(nsl.n_slopes, 0) AS n_slopes, med.slope, im.intercept
        |FROM n LEFT JOIN nsl USING (event_type) LEFT JOIN med USING (event_type)
        |       LEFT JOIN im USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q_kendall" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS x,
        |                    CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                                       ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS y
        |             FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ser GROUP BY event_type),
        |tx AS (SELECT event_type, CAST(sum(c * (c - 1)) AS BIGINT) AS tx2
        |       FROM (SELECT event_type, x, count(*) AS c FROM ser GROUP BY event_type, x)
        |       GROUP BY event_type),
        |ty AS (SELECT event_type, CAST(sum(c * (c - 1)) AS BIGINT) AS ty2
        |       FROM (SELECT event_type, y, count(*) AS c FROM ser GROUP BY event_type, y)
        |       GROUP BY event_type),
        |p AS (SELECT a.event_type,
        |             (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |           * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS s
        |      FROM ser a JOIN ser b ON a.event_type = b.event_type AND a.d < b.d),
        |cd AS (SELECT event_type, CAST(sum(s) AS BIGINT) AS cd,
        |              CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM p GROUP BY event_type)
        |SELECT n.event_type, n.n, cd.n_pairs, cd.cd,
        |       tx.tx2 // 2 AS tie_x_pairs, ty.ty2 // 2 AS tie_y_pairs,
        |       CASE WHEN CAST(n.n * (n.n - 1) - tx.tx2 AS DOUBLE) > 0.0
        |             AND CAST(n.n * (n.n - 1) - ty.ty2 AS DOUBLE) > 0.0
        |            THEN CAST(cd.cd AS DOUBLE)
        |                 / (sqrt(CAST(n.n * (n.n - 1) - tx.tx2 AS DOUBLE))
        |                    * sqrt(CAST(n.n * (n.n - 1) - ty.ty2 AS DOUBLE))) * 2.0
        |       END AS tau_b
        |FROM n JOIN tx USING (event_type) JOIN ty USING (event_type)
        |LEFT JOIN cd USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q_mcnemar" ->
      """WITH f AS (SELECT n_chars >= 500 AS a,
        |                  len(regexp_extract_all(text, '\S+')) >= 80 AS b
        |           FROM documents),
        |m AS (SELECT
        |  CAST(sum(CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN a IS NOT NULL AND b IS NOT NULL AND a AND b THEN 1 ELSE 0 END) AS BIGINT) AS "both",
        |  CAST(sum(CASE WHEN a IS NOT NULL AND b IS NOT NULL AND a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
        |  CAST(sum(CASE WHEN a IS NOT NULL AND b IS NOT NULL AND NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
        |  CAST(sum(CASE WHEN a IS NOT NULL AND b IS NOT NULL AND NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS neither
        |FROM f)
        |SELECT n, "both", only_a, only_b, neither,
        |       CASE WHEN only_a + only_b > 0 THEN
        |         (CAST(only_a AS DOUBLE) - CAST(only_b AS DOUBLE))
        |         * (CAST(only_a AS DOUBLE) - CAST(only_b AS DOUBLE))
        |         / (CAST(only_a AS DOUBLE) + CAST(only_b AS DOUBLE))
        |       END AS chi2
        |FROM m""".stripMargin,

    "q_label_noise" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |g AS (SELECT CAST(h1 AS DOUBLE) / 1000.0 AS score, h2 < h1 AS label FROM f),
        |q AS (SELECT CAST(CASE WHEN score >= 0 THEN floor(score * 1000000.0 + 0.5)
        |          ELSE -floor(-score * 1000000.0 + 0.5) END AS BIGINT) AS sfx, label FROM g),
        |m AS (SELECT CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             sum(CASE WHEN label THEN CAST(sfx AS HUGEINT) ELSE 0 END) AS s1,
        |             CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n0,
        |             sum(CASE WHEN label THEN 0 ELSE CAST(sfx AS HUGEINT) END) AS s0
        |      FROM q),
        |fl AS (SELECT m.n1, m.n0, m.s1, m.s0,
        |        CAST(sum(CASE WHEN NOT label AND m.n1 > 0
        |                      AND CAST(sfx AS HUGEINT) * m.n1 > m.s1 THEN 1 ELSE 0 END) AS BIGINT) AS fnh,
        |        CAST(sum(CASE WHEN label AND m.n0 > 0
        |                      AND CAST(sfx AS HUGEINT) * m.n0 < m.s0 THEN 1 ELSE 0 END) AS BIGINT) AS fpl
        |       FROM q, m GROUP BY m.n1, m.n0, m.s1, m.s0)
        |SELECT n1 + n0 AS n, n1 AS n_pos, n0 AS n_neg,
        |       CASE WHEN n1 > 0 THEN CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 1000000.0 END AS t_pos,
        |       CASE WHEN n0 > 0 THEN CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 1000000.0 END AS t_neg,
        |       fnh AS flagged_neg_high, fpl AS flagged_pos_low,
        |       CAST(fnh + fpl AS DOUBLE) / CAST(n1 + n0 AS DOUBLE) AS noise_rate
        |FROM fl""".stripMargin,

    "q_score_ks" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |u AS (SELECT h1 AS sfx, CASE WHEN h2 < h1 THEN 1 ELSE 2 END AS side FROM f),
        |c AS (SELECT CAST(sfx AS DOUBLE) AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY sfx),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2 FROM c)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       (SELECT max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |                     - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |        FROM k, n) AS ks_stat
        |FROM n""".stripMargin,

    "q_cohens_d" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |tot AS (SELECT sum(CAST(v AS HUGEINT)) AS s, CAST(count(*) AS BIGINT) AS n FROM u),
        |mu AS (SELECT s // n AS mu FROM tot),
        |m AS (SELECT side, CAST(count(*) AS BIGINT) AS ng,
        |             sum(CAST(v - mu.mu AS HUGEINT)) AS sg,
        |             sum(CAST(v - mu.mu AS HUGEINT) * CAST(v - mu.mu AS HUGEINT)) AS qg
        |      FROM u, mu GROUP BY side),
        |p AS (SELECT max(CASE WHEN side = 1 THEN ng END) AS n1, max(CASE WHEN side = 1 THEN sg END) AS s1,
        |             max(CASE WHEN side = 1 THEN qg END) AS q1,
        |             max(CASE WHEN side = 2 THEN ng END) AS n2, max(CASE WHEN side = 2 THEN sg END) AS s2,
        |             max(CASE WHEN side = 2 THEN qg END) AS q2
        |      FROM m),
        |sel AS (SELECT n1, n2,
        |               CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |               CAST(q1 AS DOUBLE) AS q1d, CAST(q2 AS DOUBLE) AS q2d
        |        FROM p),
        |vv AS (SELECT *, (q1d * n1d - s1d * s1d) / n1d AS ss1,
        |              (q2d * n2d - s2d * s2d) / n2d AS ss2 FROM sel),
        |w2 AS (SELECT *, (ss1 + ss2) / (n1d + n2d - 2.0) AS sp2 FROM vv),
        |dd AS (SELECT *, (s1d / n1d - s2d / n2d) / sqrt(sp2) AS d FROM w2)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       CASE WHEN n1 >= 2 AND n2 >= 2 AND sp2 > 0.0 THEN d END AS d,
        |       CASE WHEN n1 >= 2 AND n2 >= 2 AND sp2 > 0.0
        |            THEN d * (1.0 - 3.0 / (4.0 * (n1d + n2d) - 9.0)) END AS g
        |FROM dd""".stripMargin,

    "q_qq" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |sp AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS p),
        |c1 AS (SELECT v, count(*) AS c FROM u WHERE side = 1 GROUP BY v),
        |n1 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c1),
        |k1 AS (SELECT v, sum(c) OVER (ORDER BY v) AS k FROM c1),
        |q1s AS (SELECT sp.p, min(CASE WHEN k1.k * 10 >= sp.p * n1.n THEN k1.v END) AS q_ref
        |        FROM k1, n1, sp GROUP BY sp.p),
        |c2 AS (SELECT v, count(*) AS c FROM u WHERE side = 2 GROUP BY v),
        |n2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c2),
        |k2 AS (SELECT v, sum(c) OVER (ORDER BY v) AS k FROM c2),
        |q2s AS (SELECT sp.p, min(CASE WHEN k2.k * 10 >= sp.p * n2.n THEN k2.v END) AS q_cur
        |        FROM k2, n2, sp GROUP BY sp.p)
        |SELECT CAST(q1s.p AS INT) AS p, q_ref, q_cur, q_cur - q_ref AS gap
        |FROM q1s JOIN q2s ON q1s.p = q2s.p
        |ORDER BY p""".stripMargin,

    "q_cindex" ->
      """WITH u AS (SELECT user_id, epoch_us(min(CAST(ts AS TIMESTAMP))) AS f,
        |                  epoch_us(max(CAST(ts AS TIMESTAMP))) AS l,
        |                  CAST(count(*) AS BIGINT) AS risk
        |           FROM events GROUP BY user_id),
        |s AS (SELECT (l - f) // 86400000000 AS t, l < 1706400000000000 AS e, risk FROM u),
        |cells AS (SELECT t, e, risk AS sc, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY 1, 2, 3),
        |a AS (SELECT t AS ta, sc AS sa, c AS ca FROM cells WHERE e),
        |b AS (SELECT t AS tb, sc AS sb, c AS cb FROM cells),
        |p AS (SELECT sum(CAST(ca AS HUGEINT) * cb) AS comp,
        |             sum(CASE WHEN sa > sb THEN CAST(ca AS HUGEINT) * cb ELSE 0 END) AS conc,
        |             sum(CASE WHEN sa = sb THEN CAST(ca AS HUGEINT) * cb ELSE 0 END) AS tied
        |      FROM a JOIN b ON a.ta < b.tb)
        |SELECT CAST(comp AS BIGINT) AS comparable, CAST(conc AS BIGINT) AS concordant,
        |       CAST(tied AS BIGINT) AS tied_score,
        |       CASE WHEN comp > 0 THEN
        |         (2.0 * CAST(conc AS DOUBLE) + CAST(tied AS DOUBLE))
        |         / (2.0 * CAST(comp AS DOUBLE)) END AS c
        |FROM p""".stripMargin,

    "q_ad" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT v, CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM u GROUP BY v),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             CAST(sum(c1 + c2) AS BIGINT) AS nn FROM c),
        |k AS (SELECT v, c1, c2, c1 + c2 AS l,
        |             sum(c1 + c2) OVER (ORDER BY v) AS k, sum(c1) OVER (ORDER BY v) AS k1 FROM c),
        |g AS (SELECT l, 2 * k - l AS b2, 2 * k1 - c1 AS m2 FROM k),
        |tm AS (SELECT l, CAST(n.nn AS HUGEINT) * m2 - CAST(n.n1 AS HUGEINT) * b2 AS gg,
        |              CAST(b2 AS HUGEINT) * (2 * n.nn - b2) - CAST(n.nn AS HUGEINT) * l AS den4
        |       FROM g, n),
        |s AS (SELECT CAST(sum(CASE WHEN den4 > 0 THEN
        |               CAST(floor(CAST(l AS DOUBLE) * CAST(gg AS DOUBLE) * CAST(gg AS DOUBLE)
        |                          / CAST(den4 AS DOUBLE) * 1000.0 + 0.5) AS HUGEINT)
        |             ELSE 0 END) AS HUGEINT) AS sfx FROM tm)
        |SELECT n.n1 AS n_ref, n.n2 AS n_cur, CAST(s.sfx AS DOUBLE) AS sum_fx,
        |       (CAST(n.nn AS DOUBLE) - 1.0) / CAST(n.nn AS DOUBLE)
        |       * (1.0 / CAST(n.n1 AS DOUBLE) + 1.0 / CAST(n.n2 AS DOUBLE))
        |       * (CAST(s.sfx AS DOUBLE) / 1000.0) / CAST(n.nn AS DOUBLE) AS a2
        |FROM s, n""".stripMargin,

    "q_dw" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, cnt,
        |             cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY d) AS dx FROM ser),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(cnt AS HUGEINT)) AS s,
        |             sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS q,
        |             sum(CASE WHEN dx IS NOT NULL THEN CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)
        |                 ELSE 0 END) AS sdx2
        |      FROM l GROUP BY 1)
        |SELECT event_type, n, CAST(sdx2 AS DOUBLE) AS sum_d2,
        |       CASE WHEN n >= 2 AND (n * q - s * s) > 0
        |            THEN CAST(n * sdx2 AS DOUBLE) / CAST(n * q - s * s AS DOUBLE) END AS dw
        |FROM a ORDER BY event_type""".stripMargin,

    "q_runs" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |cells AS (SELECT event_type, cnt AS v, count(*) AS c FROM ser GROUP BY 1, 2),
        |kk AS (SELECT event_type, v, sum(c) OVER (PARTITION BY event_type ORDER BY v) AS k,
        |              sum(c) OVER (PARTITION BY event_type) AS ng FROM cells),
        |md AS (SELECT event_type, min(CASE WHEN k >= (ng + 1) // 2 THEN v END)
        |              + min(CASE WHEN k >= ng // 2 + 1 THEN v END) AS md
        |       FROM kk GROUP BY 1),
        |sg AS (SELECT ser.event_type, ser.d, CASE WHEN ser.cnt * 2 > md.md THEN 1 ELSE 0 END AS sgn
        |       FROM ser JOIN md USING (event_type) WHERE ser.cnt * 2 <> md.md),
        |fl AS (SELECT event_type, sgn,
        |              lag(sgn) OVER (PARTITION BY event_type ORDER BY d) AS prev FROM sg),
        |ag AS (SELECT event_type, CAST(sum(sgn) AS BIGINT) AS n_pos,
        |              CAST(sum(1 - sgn) AS BIGINT) AS n_neg,
        |              CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> sgn THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
        |       FROM fl GROUP BY 1),
        |d AS (SELECT event_type, n_pos, n_neg, runs,
        |             CAST(n_pos AS DOUBLE) AS a, CAST(n_neg AS DOUBLE) AS b FROM ag),
        |e AS (SELECT *, a + b AS nd,
        |             2.0 * a * b / (a + b) + 1.0 AS mu,
        |             2.0 * a * b * (2.0 * a * b - (a + b))
        |             / ((a + b) * (a + b) * ((a + b) - 1.0)) AS sig2 FROM d)
        |SELECT event_type, n_pos, n_neg, runs,
        |       CASE WHEN n_pos > 0 AND n_neg > 0 AND sig2 > 0.0
        |            THEN (CAST(runs AS DOUBLE) - mu) / sqrt(sig2) END AS z
        |FROM e ORDER BY event_type""".stripMargin,

    "q_chow" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |        CAST(sum(CASE WHEN d < 19737 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        sum(CASE WHEN d < 19737 THEN CAST(d AS HUGEINT) ELSE 0 END) AS sxa,
        |        sum(CASE WHEN d < 19737 THEN CAST(v AS HUGEINT) ELSE 0 END) AS sya,
        |        sum(CASE WHEN d < 19737 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS sxxa,
        |        sum(CASE WHEN d < 19737 THEN CAST(d AS HUGEINT) * v ELSE 0 END) AS sxya,
        |        sum(CASE WHEN d < 19737 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS syya,
        |        CAST(sum(CASE WHEN d >= 19737 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |        sum(CASE WHEN d >= 19737 THEN CAST(d AS HUGEINT) ELSE 0 END) AS sxb,
        |        sum(CASE WHEN d >= 19737 THEN CAST(v AS HUGEINT) ELSE 0 END) AS syb,
        |        sum(CASE WHEN d >= 19737 THEN CAST(d AS HUGEINT) * d ELSE 0 END) AS sxxb,
        |        sum(CASE WHEN d >= 19737 THEN CAST(d AS HUGEINT) * v ELSE 0 END) AS sxyb,
        |        sum(CASE WHEN d >= 19737 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS syyb
        |      FROM ser GROUP BY 1),
        |x AS (SELECT event_type, na, nb,
        |        CAST(na * sxxa - sxa * sxa AS DOUBLE) AS cxxa,
        |        CAST(na * sxya - sxa * sya AS DOUBLE) AS cxya,
        |        CAST(na * syya - sya * sya AS DOUBLE) AS cyya,
        |        CAST(nb * sxxb - sxb * sxb AS DOUBLE) AS cxxb,
        |        CAST(nb * sxyb - sxb * syb AS DOUBLE) AS cxyb,
        |        CAST(nb * syyb - syb * syb AS DOUBLE) AS cyyb,
        |        CAST((na + nb) * (sxxa + sxxb) - (sxa + sxb) * (sxa + sxb) AS DOUBLE) AS cxxp,
        |        CAST((na + nb) * (sxya + sxyb) - (sxa + sxb) * (sya + syb) AS DOUBLE) AS cxyp,
        |        CAST((na + nb) * (syya + syyb) - (sya + syb) * (sya + syb) AS DOUBLE) AS cyyp
        |      FROM m),
        |y AS (SELECT event_type, na, nb, cxxa, cxxb, cxxp,
        |        (cyya - cxya * cxya / cxxa) / CAST(na AS DOUBLE) AS ssra,
        |        (cyyb - cxyb * cxyb / cxxb) / CAST(nb AS DOUBLE) AS ssrb,
        |        (cyyp - cxyp * cxyp / cxxp) / CAST(na + nb AS DOUBLE) AS ssrp
        |      FROM x)
        |SELECT event_type, na AS n_before, nb AS n_after,
        |       CASE WHEN na >= 2 AND nb >= 2 AND na + nb > 4
        |                 AND cxxa > 0.0 AND cxxb > 0.0 AND cxxp > 0.0
        |                 AND ssra + ssrb > 0.0
        |            THEN (ssrp - ssra - ssrb) / 2.0
        |                 / ((ssra + ssrb) / (CAST(na + nb AS DOUBLE) - 4.0)) END AS f
        |FROM y ORDER BY event_type""".stripMargin,

    "q_influence" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(d AS HUGEINT)) AS sx, sum(CAST(v AS HUGEINT)) AS sy,
        |        sum(CAST(d AS HUGEINT) * d) AS sxx, sum(CAST(d AS HUGEINT) * v) AS sxy,
        |        sum(CAST(v AS HUGEINT) * v) AS syy
        |      FROM ser GROUP BY 1),
        |j AS (SELECT ser.event_type, ser.d, ser.v, m.n,
        |             CAST(m.n AS DOUBLE) AS nd,
        |             CAST(m.sx AS DOUBLE) AS sxd, CAST(m.sy AS DOUBLE) AS syd,
        |             CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) AS cxx,
        |             CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) AS cxy,
        |             CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE) AS cyy
        |      FROM ser JOIN m USING (event_type)),
        |p AS (SELECT event_type, d, v, n, nd, cxx, cyy, cxy,
        |             nd * CAST(d AS DOUBLE) - sxd AS dtn,
        |             (nd * CAST(v AS DOUBLE) - syd - cxy / cxx * (nd * CAST(d AS DOUBLE) - sxd)) / nd AS e,
        |             1.0 / nd + (nd * CAST(d AS DOUBLE) - sxd) * (nd * CAST(d AS DOUBLE) - sxd) / (nd * cxx) AS h,
        |             (cyy - cxy * cxy / cxx) / nd / (nd - 2.0) AS s2
        |      FROM j),
        |q AS (SELECT event_type, d, v, e, h,
        |             e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) AS cd
        |      FROM p
        |      WHERE n > 2 AND cxx > 0.0 AND s2 > 0.0 AND h < 1.0),
        |r AS (SELECT event_type, d, v, e, h, cd,
        |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY cd DESC, d ASC) AS INT) AS rnk
        |      FROM q)
        |SELECT event_type, d AS t, v, e AS resid, h AS leverage, cd AS cooks_d, rnk
        |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,

    "q_mood_scale" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT v, CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM u GROUP BY v),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             CAST(sum(c1 + c2) AS BIGINT) AS nn FROM c),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS k FROM c),
        |s AS (SELECT sum(CAST(c1 AS HUGEINT) * (2 * k - c - n.nn) * (2 * k - c - n.nn)) AS m4
        |      FROM k, n)
        |SELECT n.n1 AS n_ref, n.n2 AS n_cur, CAST(s.m4 AS DOUBLE) AS m4,
        |       CASE WHEN n.nn > 2
        |                 AND CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)
        |                     * (CAST(n.nn AS DOUBLE) + 1.0)
        |                     * (CAST(n.nn AS DOUBLE) * CAST(n.nn AS DOUBLE) - 4.0) / 180.0 * 16.0 > 0.0
        |            THEN (CAST(s.m4 AS DOUBLE)
        |                  - CAST(n.n1 AS DOUBLE) * (CAST(n.nn AS DOUBLE) * CAST(n.nn AS DOUBLE) - 1.0) / 3.0)
        |                 / sqrt(CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)
        |                        * (CAST(n.nn AS DOUBLE) + 1.0)
        |                        * (CAST(n.nn AS DOUBLE) * CAST(n.nn AS DOUBLE) - 4.0) / 180.0 * 16.0) END AS z
        |FROM s, n""".stripMargin,

    "q_friedman" ->
      """WITH ser AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS VARCHAR) AS b,
        |                    event_type AS t, CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM ser),
        |cb AS (SELECT b FROM ser GROUP BY b
        |       HAVING count(DISTINCT t) = (SELECT k FROM kk) AND count(*) = (SELECT k FROM kk)),
        |r AS (SELECT ser.b, ser.t, ser.v FROM ser JOIN cb USING (b)),
        |rk AS (SELECT b, t, CAST(rank() OVER (PARTITION BY b ORDER BY v) AS BIGINT) * 2
        |              + CAST(count(*) OVER (PARTITION BY b, v) AS BIGINT) - 1 AS r2 FROM r),
        |pt AS (SELECT t, CAST(sum(r2) AS BIGINT) AS r2s, CAST(count(*) AS BIGINT) AS nb
        |       FROM rk GROUP BY t),
        |a4 AS (SELECT sum(CAST(r2 AS HUGEINT) * r2) AS a4 FROM rk),
        |ag AS (SELECT CAST(max(nb) AS BIGINT) AS blocks, max(a4.a4) AS a4d,
        |              sum((CAST(r2s AS HUGEINT) - CAST(nb AS HUGEINT) * (kk.k + 1))
        |                * (CAST(r2s AS HUGEINT) - CAST(nb AS HUGEINT) * (kk.k + 1))) AS sdev,
        |              CAST(max(kk.k) AS BIGINT) AS k
        |       FROM pt, a4, kk)
        |SELECT k AS treatments, blocks,
        |       CASE WHEN a4d - CAST(blocks AS HUGEINT) * k * ((k + 1) * (k + 1)) > 0
        |            THEN CAST(k - 1 AS DOUBLE) * CAST(sdev AS DOUBLE)
        |                 / CAST(a4d - CAST(blocks AS HUGEINT) * k * ((k + 1) * (k + 1)) AS DOUBLE) END AS chi2_f
        |FROM ag""".stripMargin,

    "q_ad_group" ->
      """WITH r AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v, 1 AS s FROM documents
        |             WHERE source = 'src0' AND n_chars IS NOT NULL AND lang IS NOT NULL
        |           UNION ALL
        |           SELECT lang, CAST(n_chars AS DOUBLE), 2 FROM documents
        |             WHERE source = 'src1' AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT g, v, CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM r GROUP BY 1, 2),
        |kk AS (SELECT g, v, c1, c2, c1 + c2 AS l,
        |              sum(c1 + c2) OVER (PARTITION BY g ORDER BY v) AS k,
        |              sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
        |              sum(c1) OVER (PARTITION BY g) AS n1,
        |              sum(c2) OVER (PARTITION BY g) AS n2 FROM c),
        |tm AS (SELECT g, n1, n2,
        |              2 * k - l AS b2, 2 * k1 - c1 AS m2, l, n1 + n2 AS nn
        |       FROM kk WHERE n1 > 0 AND n2 > 0),
        |tt AS (SELECT g, n1, n2,
        |              nn * m2 - n1 * b2 AS gg,
        |              b2 * (nn * 2 - b2) - nn * l AS den4, l FROM tm),
        |ag AS (SELECT g, CAST(max(n1) AS BIGINT) AS n_ref, CAST(max(n2) AS BIGINT) AS n_cur,
        |              CAST(sum(CASE WHEN den4 > 0 THEN
        |                CAST(floor(CAST(l AS DOUBLE) * CAST(gg AS DOUBLE) * CAST(gg AS DOUBLE)
        |                           / CAST(den4 AS DOUBLE) * 1000.0 + 0.5) AS HUGEINT)
        |              ELSE 0 END) AS HUGEINT) AS sfx
        |       FROM tt GROUP BY g)
        |SELECT g AS lang, n_ref, n_cur, CAST(sfx AS DOUBLE) AS sum_fx,
        |       (CAST(n_ref + n_cur AS DOUBLE) - 1.0) / CAST(n_ref + n_cur AS DOUBLE)
        |       * (1.0 / CAST(n_ref AS DOUBLE) + 1.0 / CAST(n_cur AS DOUBLE))
        |       * (CAST(sfx AS DOUBLE) / 1000.0) / CAST(n_ref + n_cur AS DOUBLE) AS a2
        |FROM ag ORDER BY lang""".stripMargin,

    "q_mantel_haenszel" ->
      """WITH r AS (SELECT CAST(o_orderpriority AS VARCHAR) AS st,
        |                  o_totalprice >= 150000.0 AS e, o_orderstatus = 'F' AS y
        |           FROM orders WHERE o_orderpriority IS NOT NULL
        |             AND o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL),
        |cells AS (SELECT st,
        |            CAST(sum(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |            CAST(sum(CASE WHEN e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |            CAST(sum(CASE WHEN NOT e AND y THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |            CAST(sum(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS d
        |          FROM r GROUP BY st),
        |dd AS (SELECT a, b, c, d,
        |              CAST(a + b + c + d AS DOUBLE) AS n,
        |              CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
        |              CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS ddd
        |       FROM cells),
        |tfx AS (SELECT a, b, c, d,
        |          CASE WHEN n > 1.0 THEN
        |            CASE WHEN (ad * n - (ad + bd) * (ad + cd)) / n >= 0
        |            THEN CAST(floor((ad * n - (ad + bd) * (ad + cd)) / n * 1000000000.0 + 0.5) AS BIGINT)
        |            ELSE -CAST(floor(-((ad * n - (ad + bd) * (ad + cd)) / n) * 1000000000.0 + 0.5) AS BIGINT)
        |            END ELSE 0 END AS ae_fx,
        |          CASE WHEN n > 1.0 THEN
        |            CAST(floor((ad + bd) * (cd + ddd) * (ad + cd) * (bd + ddd)
        |                       / (n * n * (n - 1.0)) * 1000000000.0 + 0.5) AS BIGINT)
        |          ELSE 0 END AS v_fx,
        |          CASE WHEN n > 1.0 THEN
        |            CAST(floor(ad * ddd / n * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS adn_fx,
        |          CASE WHEN n > 1.0 THEN
        |            CAST(floor(bd * cd / n * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS bcn_fx
        |        FROM dd),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS strata,
        |             CAST(sum(a + b + c + d) AS BIGINT) AS n,
        |             CAST(sum(ae_fx) AS BIGINT) AS ae, CAST(sum(v_fx) AS BIGINT) AS v,
        |             CAST(sum(adn_fx) AS BIGINT) AS adn, CAST(sum(bcn_fx) AS BIGINT) AS bcn
        |      FROM tfx)
        |SELECT strata, n,
        |       CASE WHEN bcn > 0 THEN CAST(adn AS DOUBLE) / CAST(bcn AS DOUBLE) END AS or_mh,
        |       CASE WHEN v > 0 THEN
        |         (abs(CAST(ae AS DOUBLE) / 1000000000.0) - 0.5)
        |         * (abs(CAST(ae AS DOUBLE) / 1000000000.0) - 0.5)
        |         / (CAST(v AS DOUBLE) / 1000000000.0) END AS chi2_mh
        |FROM m""".stripMargin,

    "q_hill" ->
      """WITH top AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents
        |             WHERE n_chars IS NOT NULL AND n_chars > 0
        |             ORDER BY v DESC LIMIT 501),
        |m AS (SELECT CAST(min(v) AS BIGINT) AS x_tail,
        |             CAST(sum(CASE WHEN ln(CAST(v AS DOUBLE)) >= 0
        |               THEN CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT)
        |               ELSE -CAST(floor(-ln(CAST(v AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT)
        |             END) AS BIGINT) AS slog,
        |             CAST(min(CASE WHEN ln(CAST(v AS DOUBLE)) >= 0
        |               THEN CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT)
        |               ELSE -CAST(floor(-ln(CAST(v AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT)
        |             END) AS BIGINT) AS ltail,
        |             CAST(count(*) AS BIGINT) AS cnt
        |      FROM top)
        |SELECT CAST(500 AS BIGINT) AS k, x_tail,
        |       CASE WHEN cnt = 501
        |                 AND CAST(slog - ltail - 500 * ltail AS DOUBLE) / 1000000000000.0 > 0.0
        |            THEN 500.0 / (CAST(slog - ltail - 500 * ltail AS DOUBLE) / 1000000000000.0) END AS alpha
        |FROM m""".stripMargin,

    "q_partial_corr" ->
      """WITH f AS (SELECT
        |    CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |         ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS x,
        |    CAST(CASE WHEN l_tax >= 0 THEN floor(l_tax * 100.0 + 0.5)
        |         ELSE -floor(-l_tax * 100.0 + 0.5) END AS BIGINT) AS y,
        |    CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |         ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS z
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_tax IS NOT NULL AND l_quantity IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(z AS HUGEINT)) AS sz,
        |        sum(CAST(x AS HUGEINT) * x) AS pxx, sum(CAST(y AS HUGEINT) * y) AS pyy,
        |        sum(CAST(z AS HUGEINT) * z) AS pzz,
        |        sum(CAST(x AS HUGEINT) * y) AS pxy, sum(CAST(x AS HUGEINT) * z) AS pxz,
        |        sum(CAST(y AS HUGEINT) * z) AS pyz
        |      FROM f),
        |r AS (SELECT CAST(n AS BIGINT) AS n,
        |        CASE WHEN CAST(n * pxx - sx * sx AS DOUBLE) > 0.0 AND CAST(n * pyy - sy * sy AS DOUBLE) > 0.0
        |             THEN CAST(n * pxy - sx * sy AS DOUBLE)
        |                  / (sqrt(CAST(n * pxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * pyy - sy * sy AS DOUBLE))) END AS rxy,
        |        CASE WHEN CAST(n * pxx - sx * sx AS DOUBLE) > 0.0 AND CAST(n * pzz - sz * sz AS DOUBLE) > 0.0
        |             THEN CAST(n * pxz - sx * sz AS DOUBLE)
        |                  / (sqrt(CAST(n * pxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * pzz - sz * sz AS DOUBLE))) END AS rxz,
        |        CASE WHEN CAST(n * pyy - sy * sy AS DOUBLE) > 0.0 AND CAST(n * pzz - sz * sz AS DOUBLE) > 0.0
        |             THEN CAST(n * pyz - sy * sz AS DOUBLE)
        |                  / (sqrt(CAST(n * pyy - sy * sy AS DOUBLE)) * sqrt(CAST(n * pzz - sz * sz AS DOUBLE))) END AS ryz
        |      FROM m)
        |SELECT n, rxy AS r_xy, rxz AS r_xz, ryz AS r_yz,
        |       CASE WHEN 1.0 - rxz * rxz > 0.0 AND 1.0 - ryz * ryz > 0.0
        |            THEN (rxy - rxz * ryz)
        |                 / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz)) END AS partial
        |FROM r""".stripMargin,

    "q_chi2_cells" ->
      """WITH c AS (SELECT CAST(o_orderstatus AS VARCHAR) AS a,
        |                  CAST(o_orderpriority AS VARCHAR) AS b,
        |                  CAST(count(*) AS BIGINT) AS o
        |           FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |           GROUP BY 1, 2),
        |w AS (SELECT a, b, o, CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS ra,
        |             CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS cb FROM c),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
        |e AS (SELECT a, b, o,
        |             CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(t.n AS DOUBLE) AS e
        |      FROM w, t)
        |SELECT a, b, o, e, (CAST(o AS DOUBLE) - e) / sqrt(e) AS std_resid
        |FROM e ORDER BY a, b""".stripMargin,

    "q_ca_trend" ->
      """WITH u AS (SELECT o_orderpriority AS g, o_orderstatus = 'F' AS y FROM orders
        |           WHERE o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
        |             AND o_orderstatus IS NOT NULL),
        |s AS (SELECT CASE g WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1 WHEN '3-MEDIUM' THEN 2
        |             WHEN '4-NOT SPECIFIED' THEN 3 ELSE 4 END AS s, y FROM u),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |             CAST(sum(s) AS BIGINT) AS ssn,
        |             CAST(sum(CASE WHEN y THEN s ELSE 0 END) AS BIGINT) AS ssx,
        |             CAST(sum(s * s) AS BIGINT) AS ss2n
        |      FROM s),
        |f AS (SELECT n, x,
        |             CAST(ssx AS HUGEINT) * n - CAST(x AS HUGEINT) * ssn AS tn,
        |             CAST(n AS HUGEINT) * ss2n - CAST(ssn AS HUGEINT) * ssn AS b
        |      FROM m)
        |SELECT CAST(5 AS BIGINT) AS groups, n, x, CAST(tn AS DOUBLE) AS t_n,
        |       CASE WHEN x > 0 AND x < n AND b > 0
        |            THEN CAST(tn AS DOUBLE) / CAST(n AS DOUBLE)
        |                 / sqrt(CAST(x AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(x AS DOUBLE))
        |                        * CAST(b AS DOUBLE)
        |                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) END AS z
        |FROM f""".stripMargin,

    "q_jt" -> jtOracle(
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),

    "q_mood" ->
      """WITH u AS (
        |  SELECT l_returnflag AS g,
        |         CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v
        |  FROM lineitem),
        |c AS (SELECT v, count(*) AS c FROM u GROUP BY v),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |kk AS (SELECT v, sum(c) OVER (ORDER BY v) AS k FROM c),
        |md AS (SELECT min(CASE WHEN k >= (t.n + 1) // 2 THEN v END)
        |            + min(CASE WHEN k >= t.n // 2 + 1 THEN v END) AS md FROM kk, t),
        |sd AS (SELECT u.g, CASE WHEN u.v * 2 > md.md THEN 1 ELSE 0 END AS ab
        |       FROM u, md WHERE u.v * 2 <> md.md),
        |pg AS (SELECT g, CAST(sum(ab) AS BIGINT) AS a, CAST(sum(1 - ab) AS BIGINT) AS b
        |       FROM sd GROUP BY g),
        |m AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
        |             CAST(count(*) AS BIGINT) AS groups FROM pg),
        |tm AS (SELECT pg.a, pg.b, m.ta, m.tb, m.groups,
        |              CAST(pg.a AS HUGEINT) * (m.ta + m.tb) - CAST(pg.a + pg.b AS HUGEINT) * m.ta AS d
        |       FROM pg, m WHERE m.ta > 0 AND m.tb > 0)
        |SELECT max(groups) AS groups, max(ta + tb) AS n, max(ta) AS n_above, max(tb) AS n_below,
        |       CAST(sum(CAST(floor(CAST(d AS DOUBLE) * CAST(d AS DOUBLE) / CAST(a + b AS DOUBLE)
        |                          / CAST(ta AS DOUBLE) / CAST(tb AS DOUBLE) * 1000000000.0 + 0.5) AS HUGEINT)) AS DOUBLE)
        |       / 1000000000.0 AS chi2
        |FROM tm""".stripMargin,

    "q_conformal" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, d, cnt,
        |             lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred FROM ser),
        |f AS (SELECT event_type, d, abs(cnt - pred) AS r FROM p WHERE pred IS NOT NULL),
        |cal AS (SELECT event_type, r, count(*) AS c FROM f WHERE d < 19737 GROUP BY 1, 2),
        |kk AS (SELECT event_type, r,
        |              sum(c) OVER (PARTITION BY event_type ORDER BY r) AS k,
        |              sum(c) OVER (PARTITION BY event_type) AS n FROM cal),
        |q AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_cal,
        |             CAST(min(CASE WHEN k >= ((n + 1) * 9 + 9) // 10 THEN r END) AS BIGINT) AS qhat
        |      FROM kk GROUP BY 1),
        |e AS (SELECT f.event_type,
        |             CAST(count(*) AS BIGINT) AS n_eval,
        |             CAST(sum(CASE WHEN q.qhat IS NOT NULL AND f.r <= q.qhat THEN 1 ELSE 0 END) AS BIGINT) AS covered
        |      FROM f LEFT JOIN q USING (event_type) WHERE d >= 19737 GROUP BY 1)
        |SELECT event_type, coalesce(q.n_cal, 0) AS n_cal, q.qhat,
        |       coalesce(e.n_eval, 0) AS n_eval, coalesce(e.covered, 0) AS covered,
        |       CASE WHEN q.qhat IS NOT NULL AND e.n_eval > 0
        |            THEN CAST(e.covered AS DOUBLE) / CAST(e.n_eval AS DOUBLE) END AS coverage
        |FROM q FULL JOIN e USING (event_type) ORDER BY event_type""".stripMargin,

    "q_pinball" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, cnt,
        |             lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred FROM ser),
        |f AS (SELECT event_type, cnt AS a, pred AS pr FROM p WHERE pred IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(9 * greatest(a - pr, 0) + 1 * greatest(pr - a, 0) AS HUGEINT)) AS DOUBLE) AS sum_q,
        |       CAST(sum(CAST(9 * greatest(a - pr, 0) + 1 * greatest(pr - a, 0) AS HUGEINT)) AS DOUBLE)
        |       / 10.0 / CAST(count(*) AS DOUBLE) / 1.0 AS pinball
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ece" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |g AS (SELECT CAST(h1 AS DOUBLE) / 1000.0 AS score, h2 < h1 AS label FROM f),
        |q AS (SELECT CAST(CASE WHEN score >= 0 THEN floor(score * 1000000.0 + 0.5)
        |          ELSE -floor(-score * 1000000.0 + 0.5) END AS BIGINT) AS sfx, label FROM g),
        |b AS (SELECT least(greatest((sfx * 10) // 1000000, 0), 9) AS bucket, sfx, label FROM q),
        |m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CAST(sfx AS HUGEINT)) AS HUGEINT) AS ss,
        |        CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |      FROM b GROUP BY bucket)
        |SELECT CAST(sum(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS buckets_used,
        |       CAST(sum(abs(CAST(pos AS HUGEINT) * 1000000 - ss)) AS DOUBLE) AS num,
        |       CAST(sum(abs(CAST(pos AS HUGEINT) * 1000000 - ss)) AS DOUBLE)
        |       / CAST(sum(n) AS DOUBLE) / 1000000.0 AS ece
        |FROM m""".stripMargin,

    "q_lift" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |g AS (SELECT CAST(h1 AS DOUBLE) / 1000.0 AS score, h2 < h1 AS label FROM f),
        |q AS (SELECT CAST(CASE WHEN score >= 0 THEN floor(score * 1000000.0 + 0.5)
        |          ELSE -floor(-score * 1000000.0 + 0.5) END AS BIGINT) AS sfx, label FROM g),
        |ps AS (SELECT sfx, CAST(count(*) AS BIGINT) AS c,
        |              CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p
        |       FROM q GROUP BY sfx),
        |r AS (SELECT sfx, c, p,
        |             CAST(sum(c) OVER (ORDER BY sfx DESC) - c AS BIGINT) AS k,
        |             CAST(sum(c) OVER () AS BIGINT) AS n_all,
        |             CAST(sum(p) OVER () AS BIGINT) AS tp FROM ps),
        |b AS (SELECT (k * 10) // n_all AS bucket, n_all, tp, c, p FROM r),
        |pb AS (SELECT bucket, n_all, tp, CAST(sum(c) AS BIGINT) AS n,
        |              CAST(sum(p) AS BIGINT) AS pos
        |       FROM b GROUP BY bucket, n_all, tp),
        |cg AS (SELECT bucket, n_all, tp, n, pos,
        |              CAST(sum(pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos FROM pb)
        |SELECT bucket, n, pos,
        |       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |       CASE WHEN tp > 0 THEN CAST(pos AS DOUBLE) * CAST(n_all AS DOUBLE)
        |            / (CAST(n AS DOUBLE) * CAST(tp AS DOUBLE)) END AS lift,
        |       cum_pos,
        |       CASE WHEN tp > 0 THEN CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE) END AS cum_gain
        |FROM cg ORDER BY bucket""".stripMargin,

    "q_welch" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |tot AS (SELECT sum(CAST(v AS HUGEINT)) AS s, CAST(count(*) AS BIGINT) AS n FROM u),
        |mu AS (SELECT s // n AS mu FROM tot),
        |m AS (SELECT side, CAST(count(*) AS BIGINT) AS ng,
        |             sum(CAST(v - mu.mu AS HUGEINT)) AS sg,
        |             sum(CAST(v - mu.mu AS HUGEINT) * CAST(v - mu.mu AS HUGEINT)) AS qg
        |      FROM u, mu GROUP BY side),
        |p AS (SELECT max(CASE WHEN side = 1 THEN ng END) AS n1, max(CASE WHEN side = 1 THEN sg END) AS s1,
        |             max(CASE WHEN side = 1 THEN qg END) AS q1,
        |             max(CASE WHEN side = 2 THEN ng END) AS n2, max(CASE WHEN side = 2 THEN sg END) AS s2,
        |             max(CASE WHEN side = 2 THEN qg END) AS q2
        |      FROM m),
        |sel AS (SELECT n1, n2, CAST(mu.mu AS DOUBLE) AS mud,
        |               CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        |               CAST(q1 AS DOUBLE) AS q1d, CAST(q2 AS DOUBLE) AS q2d
        |        FROM p, mu),
        |vv AS (SELECT *, (q1d * n1d - s1d * s1d) / (n1d * (n1d - 1.0)) AS var1,
        |              (q2d * n2d - s2d * s2d) / (n2d * (n2d - 1.0)) AS var2 FROM sel),
        |ee AS (SELECT *, var1 / n1d AS se1, var2 / n2d AS se2 FROM vv),
        |ff AS (SELECT *, se1 + se2 AS se FROM ee)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       mud + s1d / n1d AS mean_ref, mud + s2d / n2d AS mean_cur,
        |       CASE WHEN n1 >= 2 THEN var1 END AS var_ref,
        |       CASE WHEN n2 >= 2 THEN var2 END AS var_cur,
        |       CASE WHEN n1 >= 2 AND n2 >= 2 AND se > 0.0
        |            THEN (s1d / n1d - s2d / n2d) / sqrt(se) END AS t,
        |       CASE WHEN n1 >= 2 AND n2 >= 2 AND se > 0.0
        |            THEN se * se / (se1 * se1 / (n1d - 1.0) + se2 * se2 / (n2d - 1.0)) END AS df
        |FROM ff""".stripMargin,

    "q_bf" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         l_returnflag AS g
        |  FROM lineitem),
        |c AS (SELECT g, v, count(*) AS c FROM u GROUP BY 1, 2),
        |kk AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v) AS k,
        |              sum(c) OVER (PARTITION BY g) AS ng FROM c),
        |md AS (SELECT g, min(CASE WHEN k >= (ng + 1) // 2 THEN v END)
        |              + min(CASE WHEN k >= ng // 2 + 1 THEN v END) AS md
        |       FROM kk GROUP BY g),
        |z AS (SELECT u.g AS g, abs(u.v * 2 - md.md) AS v FROM u JOIN md USING (g)),
        |tot AS (SELECT sum(CAST(v AS HUGEINT)) AS s, CAST(count(*) AS BIGINT) AS n FROM z),
        |mu AS (SELECT s // n AS mu, s - (s // n) * n AS srem, n FROM tot),
        |bg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |              sum(CAST(v - mu.mu AS HUGEINT)) AS sg,
        |              sum(CAST(v - mu.mu AS HUGEINT) * CAST(v - mu.mu AS HUGEINT)) AS qg,
        |              max(mu.srem) AS srem, max(mu.n) AS n
        |       FROM z, mu GROUP BY g),
        |st AS (SELECT count(*) AS groups, max(n) AS n,
        |              sum(CAST(floor((CAST(sg AS DOUBLE) * CAST(n AS DOUBLE) - CAST(srem AS DOUBLE) * CAST(ng AS DOUBLE))
        |                           * (CAST(sg AS DOUBLE) * CAST(n AS DOUBLE) - CAST(srem AS DOUBLE) * CAST(ng AS DOUBLE))
        |                           / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS HUGEINT)) AS ssb,
        |              sum(CAST(floor((CAST(qg AS DOUBLE) * CAST(ng AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |                           / CAST(ng AS DOUBLE)) AS HUGEINT)) AS ssw
        |       FROM bg)
        |SELECT groups, n, CAST(ssb AS DOUBLE) AS ssb, CAST(ssw AS DOUBLE) AS ssw,
        |       CASE WHEN groups > 1 AND n > groups AND CAST(ssw AS DOUBLE) > 0.0
        |       THEN (CAST(ssb AS DOUBLE) / CAST(groups - 1 AS DOUBLE))
        |            / (CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(groups AS DOUBLE)))
        |       END AS f
        |FROM st""".stripMargin,

    "q_energy" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT v, CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM u GROUP BY v),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT v, c1, c2, sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2,
        |             lead(v) OVER (ORDER BY v) AS vn FROM c),
        |s AS (SELECT
        |        sum(CASE WHEN vn IS NOT NULL THEN CAST(vn - v AS HUGEINT)
        |              * (CAST(k1 AS HUGEINT) * (n.n2 - k2) + CAST(k2 AS HUGEINT) * (n.n1 - k1))
        |            ELSE 0 END) AS sab,
        |        sum(CASE WHEN vn IS NOT NULL THEN CAST(vn - v AS HUGEINT)
        |              * (CAST(k1 AS HUGEINT) * (n.n1 - k1)) ELSE 0 END) AS saa,
        |        sum(CASE WHEN vn IS NOT NULL THEN CAST(vn - v AS HUGEINT)
        |              * (CAST(k2 AS HUGEINT) * (n.n2 - k2)) ELSE 0 END) AS sbb
        |      FROM k, n),
        |d AS (SELECT n.n1, n.n2, CAST(sab AS DOUBLE) AS sabd, CAST(saa AS DOUBLE) AS saad,
        |             CAST(sbb AS DOUBLE) AS sbbd,
        |             CAST(n.n1 AS DOUBLE) AS n1d, CAST(n.n2 AS DOUBLE) AS n2d
        |      FROM s, n),
        |e AS (SELECT *, 2.0 * sabd / (n1d * n2d) - 2.0 * saad / (n1d * n1d)
        |               - 2.0 * sbbd / (n2d * n2d) AS e FROM d)
        |SELECT n1 AS n_ref, n2 AS n_cur, sabd AS sum_cross, saad AS sum_ref, sbbd AS sum_cur,
        |       e, n1d * n2d / (n1d + n2d) * e AS t_stat
        |FROM e""".stripMargin,

    "q_cvm_group" ->
      """WITH r AS (SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v, 1 AS s FROM documents
        |             WHERE source = 'src0' AND n_chars IS NOT NULL AND lang IS NOT NULL
        |           UNION ALL
        |           SELECT lang, CAST(n_chars AS DOUBLE), 2 FROM documents
        |             WHERE source = 'src1' AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT g, v, CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM r GROUP BY 1, 2),
        |k AS (SELECT g, c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (PARTITION BY g ORDER BY v) AS k,
        |             sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
        |             sum(c2) OVER (PARTITION BY g ORDER BY v) AS k2,
        |             sum(c1) OVER (PARTITION BY g) AS n1,
        |             sum(c2) OVER (PARTITION BY g) AS n2 FROM c),
        |d AS (SELECT g, c1, c2, n1, n2,
        |             ((k - c) * 2 + c + 1) - ((k1 - c1) * 2 + c1 + 1) AS d1,
        |             ((k - c) * 2 + c + 1) - ((k2 - c2) * 2 + c2 + 1) AS d2
        |      FROM k WHERE n1 > 0 AND n2 > 0),
        |a AS (SELECT g, CAST(max(n1) AS BIGINT) AS n_ref, CAST(max(n2) AS BIGINT) AS n_cur,
        |        sum(CASE WHEN c1 > 0 THEN CAST(c1 AS HUGEINT) * CAST(d1 AS HUGEINT) * CAST(d1 AS HUGEINT) ELSE 0 END) AS a1,
        |        sum(CASE WHEN c2 > 0 THEN CAST(c2 AS HUGEINT) * CAST(d2 AS HUGEINT) * CAST(d2 AS HUGEINT) ELSE 0 END) AS a2
        |      FROM d GROUP BY g),
        |f AS (SELECT g, n_ref, n_cur,
        |             CAST(n_ref AS HUGEINT) * a1 + CAST(n_cur AS HUGEINT) * a2 AS u4 FROM a)
        |SELECT g AS lang, n_ref, n_cur, CAST(u4 AS DOUBLE) AS u4,
        |       CAST(u4 AS DOUBLE) / 4.0 / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) * CAST(n_ref + n_cur AS DOUBLE))
        |       - (4.0 * CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) - 1.0) / (6.0 * CAST(n_ref + n_cur AS DOUBLE)) AS t
        |FROM f ORDER BY lang""".stripMargin,

    "q_cvm" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT v, CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM u GROUP BY v),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS k,
        |             sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2 FROM c),
        |d AS (SELECT c1, c2,
        |             ((k - c) * 2 + c + 1) - ((k1 - c1) * 2 + c1 + 1) AS d1,
        |             ((k - c) * 2 + c + 1) - ((k2 - c2) * 2 + c2 + 1) AS d2 FROM k),
        |a AS (SELECT
        |        sum(CASE WHEN c1 > 0 THEN CAST(c1 AS HUGEINT) * CAST(d1 AS HUGEINT) * CAST(d1 AS HUGEINT) ELSE 0 END) AS a1,
        |        sum(CASE WHEN c2 > 0 THEN CAST(c2 AS HUGEINT) * CAST(d2 AS HUGEINT) * CAST(d2 AS HUGEINT) ELSE 0 END) AS a2
        |      FROM d),
        |f AS (SELECT n.n1, n.n2, CAST(n.n1 AS HUGEINT) * a1 + CAST(n.n2 AS HUGEINT) * a2 AS u4 FROM a, n)
        |SELECT n1 AS n_ref, n2 AS n_cur, CAST(u4 AS DOUBLE) AS u4,
        |       CAST(u4 AS DOUBLE) / 4.0 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE))
        |       - (4.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) - 1.0) / (6.0 * CAST(n1 + n2 AS DOUBLE)) AS t
        |FROM f""".stripMargin,

    "q_forecast_eval" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |pr AS (SELECT event_type, d, v AS a,
        |              lag(v, 7) OVER (PARTITION BY event_type ORDER BY d) AS p FROM ser),
        |f AS (SELECT event_type, d, a, p FROM pr WHERE p IS NOT NULL),
        |g AS (SELECT *, abs(a - lag(a, 1) OVER (PARTITION BY event_type ORDER BY d)) AS nv FROM f),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(abs(a - p) AS HUGEINT)) AS sae,
        |             sum(CAST(a - p AS HUGEINT) * CAST(a - p AS HUGEINT)) AS sse,
        |             CAST(sum(CASE WHEN a <> 0 THEN
        |               CAST(floor(CAST(abs(a - p) AS DOUBLE) / CAST(abs(a) AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT)
        |             END) AS BIGINT) AS spct,
        |             CAST(count(CASE WHEN a <> 0 THEN 1 END) AS BIGINT) AS mape_n,
        |             sum(CAST(nv AS HUGEINT)) AS snv,
        |             CAST(count(nv) AS BIGINT) AS nnv
        |      FROM g GROUP BY 1)
        |SELECT event_type, n,
        |       CAST(sae AS DOUBLE) / CAST(n AS DOUBLE) AS mae,
        |       sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)) AS rmse,
        |       CASE WHEN mape_n > 0 THEN CAST(spct AS DOUBLE) / CAST(mape_n AS DOUBLE) / 1000000000000.0 END AS mape,
        |       mape_n,
        |       CASE WHEN nnv > 0 AND CAST(snv AS DOUBLE) > 0.0
        |            THEN (CAST(sae AS DOUBLE) / CAST(n AS DOUBLE))
        |                 / (CAST(snv AS DOUBLE) / CAST(nnv AS DOUBLE)) END AS mase
        |FROM m ORDER BY event_type""".stripMargin,

    "q_cuped" ->
      """WITH j AS (SELECT o_orderkey, o_totalprice, c_acctbal,
        |                  CAST(CASE WHEN c_acctbal >= 0 THEN floor(c_acctbal * 100.0 + 0.5)
        |                       ELSE -floor(-c_acctbal * 100.0 + 0.5) END AS BIGINT) AS x,
        |                  CAST(CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice * 100.0 + 0.5)
        |                       ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT) AS y
        |           FROM orders JOIN customer ON c_custkey = o_custkey),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |      FROM j WHERE x IS NOT NULL AND y IS NOT NULL),
        |s AS (SELECT CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
        |                  THEN CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
        |             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
        |      FROM m)
        |SELECT j.o_orderkey, j.o_totalprice, j.c_acctbal,
        |       CASE WHEN x IS NOT NULL AND y IS NOT NULL AND s.theta IS NOT NULL
        |            THEN (CAST(y AS DOUBLE) - s.theta * (CAST(x AS DOUBLE) - s.mx)) / 100.0
        |       END AS o_totalprice_adj
        |FROM j, s ORDER BY o_orderkey""".stripMargin,

    "q_seasonal" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS t,
        |                    CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, t, v,
        |             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY t
        |                               RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sw,
        |             CAST(count(*) OVER (PARTITION BY event_type ORDER BY t
        |                                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS cw
        |      FROM ser),
        |d AS (SELECT event_type, t % 7 AS phase,
        |             CAST(v AS DOUBLE) - CAST(sw AS DOUBLE) / CAST(cw AS DOUBLE) AS det
        |      FROM w WHERE cw = 7),
        |f AS (SELECT event_type, phase, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CAST(CASE WHEN det >= 0 THEN floor(det * 1000000.0 + 0.5)
        |                                ELSE -floor(-det * 1000000.0 + 0.5) END AS BIGINT)) AS BIGINT) AS seasonal_fx
        |      FROM d GROUP BY 1, 2)
        |SELECT event_type, phase, n, seasonal_fx,
        |       CAST(seasonal_fx AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS seasonal
        |FROM f ORDER BY event_type, phase""".stripMargin,

    "q_changepoint" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, d, v,
        |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS k,
        |             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS sk,
        |             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |             CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT) AS sn
        |      FROM ser),
        |c AS (SELECT event_type, d, k, sk, n, sn,
        |             CAST(abs(CAST(sk AS HUGEINT) * n - CAST(sn AS HUGEINT) * k) AS DOUBLE)
        |               / (CAST(n AS DOUBLE) * sqrt(CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))) AS stat
        |      FROM w WHERE k < n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY stat DESC, k ASC) AS rn FROM c)
        |SELECT event_type, n, k AS k_split, d AS split_tick, stat,
        |       CAST(sk AS DOUBLE) / CAST(k AS DOUBLE) AS mean_left,
        |       CAST(sn - sk AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_right
        |FROM r WHERE rn = 1
        |ORDER BY event_type""".stripMargin,

    "q_ccf" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS x,
        |                    CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                                       ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS y
        |             FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, d, x, unnest(range(-3, 4)) AS lag FROM ser),
        |j AS (SELECT l.event_type, l.lag, l.x, r.y
        |      FROM l JOIN ser r ON r.event_type = l.event_type AND r.d = l.d + l.lag),
        |m AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
        |             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |      FROM j GROUP BY 1, 2)
        |SELECT event_type, lag, n_pairs,
        |       CASE WHEN dx > 0.0 AND dy > 0.0 THEN num / (sqrt(dx) * sqrt(dy)) END AS ccf
        |FROM (SELECT event_type, lag, n_pairs,
        |        CAST(n_pairs * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n_pairs * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n_pairs * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m) t
        |ORDER BY event_type, lag""".stripMargin,

    "q_mann_kendall" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ser GROUP BY event_type),
        |tt AS (SELECT event_type,
        |              CAST(sum(CASE WHEN c > 1 THEN c * (c - 1) * (c * 2 + 5) ELSE 0 END) AS BIGINT) AS tie_term
        |       FROM (SELECT event_type, v, count(*) AS c FROM ser GROUP BY event_type, v)
        |       GROUP BY event_type),
        |p AS (SELECT a.event_type, a.d AS t1, b.d AS t2,
        |             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn,
        |             CAST(b.v - a.v AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        |      FROM ser a JOIN ser b ON a.event_type = b.event_type AND a.d < b.d),
        |r AS (SELECT event_type, sgn, slope,
        |             row_number() OVER (PARTITION BY event_type ORDER BY slope, t1, t2) AS rn,
        |             count(*) OVER (PARTITION BY event_type) AS pc
        |      FROM p),
        |sg AS (SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
        |              CAST(max(pc) AS BIGINT) AS n_pairs,
        |              avg(CASE WHEN rn = (pc + 1) // 2 OR rn = pc // 2 + 1 THEN slope END) AS sen_slope
        |       FROM r GROUP BY event_type)
        |SELECT n.event_type, n.n, sg.n_pairs, sg.s_stat, tt.tie_term,
        |       n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term AS var18,
        |       CASE WHEN n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term > 0 AND sg.s_stat > 0
        |              THEN (CAST(sg.s_stat AS DOUBLE) - 1.0)
        |                   / sqrt(CAST(n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term AS DOUBLE) / 18.0)
        |            WHEN n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term > 0 AND sg.s_stat < 0
        |              THEN (CAST(sg.s_stat AS DOUBLE) + 1.0)
        |                   / sqrt(CAST(n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term AS DOUBLE) / 18.0)
        |            WHEN n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term > 0 AND sg.s_stat = 0
        |              THEN 0.0 END AS z,
        |       sg.sen_slope
        |FROM n JOIN tt USING (event_type) LEFT JOIN sg USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q_mutual_info" -> mutualInfoOracle,

    "q_theils_u" -> theilsUOracle,

    "q_periodogram" -> periodogramOracle(Seq(7, 30)),

    "q_eb_rate" ->
      """WITH pc AS (SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n,
        |                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS x
        |            FROM orders GROUP BY 1),
        |r AS (SELECT custkey, n, x, (x * 1000000000) // n AS rate_fx FROM pc),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS g, sum(CAST(rate_fx AS HUGEINT)) AS s1,
        |             sum(CAST(rate_fx AS HUGEINT) * CAST(rate_fx AS HUGEINT)) AS s2 FROM r),
        |d AS (SELECT CAST(g AS DOUBLE) AS gd, CAST(s1 AS DOUBLE) AS s1d,
        |             CAST(s2 AS DOUBLE) AS s2d FROM m),
        |p AS (SELECT gd, s1d / gd / 1000000000.0 AS pbar,
        |             (s2d * gd - s1d * s1d) / (gd * gd) / 1e18 AS v FROM d),
        |q AS (SELECT pbar, v, pbar * (1.0 - pbar) / v - 1.0 AS ab FROM p),
        |z AS (SELECT pbar, v, ab, pbar * ab AS alpha FROM q)
        |SELECT custkey, n, x, rate_fx,
        |       CASE WHEN v > 0.0 AND ab > 0.0
        |            THEN (CAST(x AS DOUBLE) + alpha) / (CAST(n AS DOUBLE) + ab)
        |            ELSE pbar END AS shrunk
        |FROM r, z ORDER BY custkey""".stripMargin,

    "q_holt_winters" -> holtWintersOracle,

    "q_ewma" ->
      """WITH f AS (SELECT user_id, event_id,
        |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |FROM events WHERE value IS NOT NULL),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |             list(v ORDER BY event_id) AS vs
        |      FROM f GROUP BY 1)
        |SELECT user_id, n,
        |  CAST(list_reduce(vs, (acc, x) -> acc + ((x - acc) * 3) // 10) AS BIGINT) AS ewma_fx,
        |  CAST(CAST(list_reduce(vs, (acc, x) -> acc + ((x - acc) * 3) // 10) AS BIGINT) AS DOUBLE) / 100.0 AS ewma
        |FROM g ORDER BY user_id""".stripMargin,

    "q_holt" ->
      """WITH f AS (SELECT user_id, event_id,
        |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |FROM events WHERE value IS NOT NULL),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |             list(v ORDER BY event_id) AS vs
        |      FROM f GROUP BY 1),
        |st AS (SELECT user_id, n, list_reduce(
        |         list_transform(vs, v -> [v, 0::BIGINT]),
        |         (acc, x) -> [acc[1] + acc[2] + ((x[1] - acc[1] - acc[2]) * 3) // 10,
        |                      acc[2] + ((((x[1] - acc[1] - acc[2]) * 3) // 10) * 2) // 10]) AS s
        |       FROM g)
        |SELECT user_id, n, CAST(s[1] AS BIGINT) AS level_fx, CAST(s[2] AS BIGINT) AS trend_fx,
        |  CAST(CAST(s[1] AS BIGINT) AS DOUBLE) / 100.0 AS level,
        |  CAST(CAST(s[1] AS BIGINT) + CAST(s[2] AS BIGINT) AS DOUBLE) / 100.0 AS forecast
        |FROM st ORDER BY user_id""".stripMargin,

    "q_smk" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS v
        |             FROM events GROUP BY 1, 2),
        |ph AS (SELECT event_type, d % 7 AS phase, d, v FROM ser),
        |n AS (SELECT event_type, phase, CAST(count(*) AS BIGINT) AS n FROM ph GROUP BY 1, 2),
        |tt AS (SELECT event_type, phase,
        |              CAST(sum(CASE WHEN c > 1 THEN c * (c - 1) * (c * 2 + 5) ELSE 0 END) AS BIGINT) AS tie_term
        |       FROM (SELECT event_type, phase, v, count(*) AS c FROM ph GROUP BY 1, 2, 3)
        |       GROUP BY 1, 2),
        |p AS (SELECT a.event_type, a.phase,
        |             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
        |      FROM ph a JOIN ph b ON a.event_type = b.event_type
        |        AND a.phase = b.phase AND a.d < b.d),
        |sg AS (SELECT event_type, phase, CAST(sum(sgn) AS BIGINT) AS s_stat
        |       FROM p GROUP BY 1, 2),
        |per AS (SELECT n.event_type, n.phase, n.n,
        |               coalesce(sg.s_stat, 0) AS s_stat,
        |               n.n * (n.n - 1) * (n.n * 2 + 5) - tt.tie_term AS var18
        |        FROM n JOIN tt USING (event_type, phase)
        |        LEFT JOIN sg USING (event_type, phase)),
        |a AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS seasons,
        |             CAST(sum(s_stat) AS BIGINT) AS s_stat,
        |             CAST(sum(var18) AS BIGINT) AS var18
        |      FROM per GROUP BY 1)
        |SELECT event_type, n, seasons, s_stat, var18,
        |       CASE WHEN var18 > 0 AND s_stat > 0
        |              THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |            WHEN var18 > 0 AND s_stat < 0
        |              THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |            WHEN var18 > 0 AND s_stat = 0 THEN 0.0 END AS z
        |FROM a ORDER BY event_type""".stripMargin,

    "q_kappa_weighted" ->
      """WITH f AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS a, o_orderkey AS k
        |           FROM orders),
        |p AS (SELECT a, CASE WHEN k % 9 = 0 THEN least(a + 1, 5) ELSE a END AS b FROM f),
        |cells AS (SELECT a, b, count(*) AS o FROM p GROUP BY 1, 2),
        |n AS (SELECT CAST(coalesce(sum(o), 0) AS HUGEINT) AS n FROM cells),
        |obs AS (SELECT CAST(coalesce(sum(CAST(abs(a - b) AS HUGEINT) * abs(a - b) * o), 0) AS HUGEINT) AS w_obs FROM cells),
        |r AS (SELECT a, sum(o) AS r FROM cells GROUP BY 1),
        |c AS (SELECT b, sum(o) AS c FROM cells GROUP BY 1),
        |e AS (SELECT CAST(coalesce(sum(CAST(abs(r.a - c.b) AS HUGEINT) * abs(r.a - c.b)
        |             * (CAST(r.r AS HUGEINT) * c.c)), 0) AS HUGEINT) AS w_exp
        |      FROM r, c)
        |SELECT CAST(n.n AS BIGINT) AS n,
        |       CAST(obs.w_obs AS DOUBLE) AS w_obs,
        |       CAST(e.w_exp AS DOUBLE) AS w_exp,
        |       CASE WHEN e.w_exp > 0
        |            THEN 1.0 - CAST(n.n * obs.w_obs AS DOUBLE) / CAST(e.w_exp AS DOUBLE) END AS kappa_w
        |FROM n, obs, e""".stripMargin,

    "q_page_hinkley" ->
      """WITH ser AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |                    CAST(count(*) AS BIGINT) AS cnt
        |             FROM events GROUP BY 1, 2),
        |i AS (SELECT event_type, d, cnt, cnt AS v,
        |             CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS i,
        |             sum(cnt) OVER (PARTITION BY event_type ORDER BY d
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |      FROM ser),
        |t AS (SELECT *, CASE WHEN CAST(v * i - s AS DOUBLE) / CAST(i AS DOUBLE) - 0.0 >= 0
        |        THEN CAST(floor((CAST(v * i - s AS DOUBLE) / CAST(i AS DOUBLE) - 0.0) * 1000000.0 + 0.5) AS BIGINT)
        |        ELSE CAST(-floor(-(CAST(v * i - s AS DOUBLE) / CAST(i AS DOUBLE) - 0.0) * 1000000.0 + 0.5) AS BIGINT)
        |        END AS devfx FROM i),
        |u AS (SELECT *, sum(devfx) OVER (PARTITION BY event_type ORDER BY d
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS uu FROM t),
        |p AS (SELECT *, uu - least(0, min(uu) OVER (PARTITION BY event_type ORDER BY d
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS phfx FROM u)
        |SELECT event_type, d, cnt, CAST(phfx AS DOUBLE) / 1000000.0 AS ph,
        |       phfx > 30000000 AS alarm
        |FROM p ORDER BY event_type, d""".stripMargin,

    "q_cusum" ->
      """WITH f AS (SELECT user_id, event_id,
        |  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |            ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |FROM events),
        |p AS (SELECT user_id, event_id,
        |  sum(v - 7000) OVER w AS pu,
        |  sum(5000 - v) OVER w AS pd
        |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT user_id, event_id,
        |  pu - least(0, min(pu) OVER w) AS s_up,
        |  pd - least(0, min(pd) OVER w) AS s_dn
        |FROM p WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, CAST(s_up AS BIGINT) AS s_up, CAST(s_dn AS BIGINT) AS s_dn,
        |       s_up > 50000 AS alarm_up, s_dn > 50000 AS alarm_dn
        |FROM s ORDER BY user_id, event_id""".stripMargin,

    "q_trend" ->
      """WITH f AS (SELECT l_returnflag AS g,
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y
        |FROM lineitem),
        |m AS (SELECT g,
        |  count(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END) AS n,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |  sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |FROM f GROUP BY g)
        |SELECT g AS l_returnflag, n,
        |  CASE WHEN den > 0.0 THEN num / den END AS slope,
        |  CASE WHEN den > 0.0 THEN (syd - num / den * sxd) / CAST(n AS DOUBLE) / 100.0 END AS intercept
        |FROM (SELECT g, n,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS den,
        |        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |      FROM m)
        |ORDER BY l_returnflag""".stripMargin,

    "q_cramers_v" ->
      """WITH c1 AS (SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS o
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL GROUP BY 1, 2),
        |w1 AS (SELECT o, a, b, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c1),
        |t1 AS (SELECT o, a, b,
        |  CAST(floor(CAST(o * o AS DOUBLE) / CAST(ra * cb AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS tfx FROM w1),
        |m1 AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT a) AS r_levels,
        |  count(DISTINCT b) AS c_levels, CAST(sum(tfx) AS BIGINT) AS sfx FROM t1),
        |c2 AS (SELECT l_returnflag AS a, l_linestatus AS b, count(*) AS o
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL GROUP BY 1, 2),
        |w2 AS (SELECT o, a, b, sum(o) OVER (PARTITION BY a) AS ra, sum(o) OVER (PARTITION BY b) AS cb FROM c2),
        |t2 AS (SELECT o, a, b,
        |  CAST(floor(CAST(o * o AS DOUBLE) / CAST(ra * cb AS DOUBLE) * 1000000000000.0 + 0.5) AS BIGINT) AS tfx FROM w2),
        |m2 AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT a) AS r_levels,
        |  count(DISTINCT b) AS c_levels, CAST(sum(tfx) AS BIGINT) AS sfx FROM t2)
        |SELECT * FROM (
        |  SELECT 'o_orderstatus~o_orderpriority' AS pair, n, r_levels, c_levels,
        |    greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0) AS chi2,
        |    CASE WHEN n > 0 AND CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE) > 0.0
        |         THEN sqrt(greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0)
        |                   / (CAST(n AS DOUBLE) * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))) END AS cramers_v
        |  FROM m1
        |  UNION ALL
        |  SELECT 'l_returnflag~l_linestatus', n, r_levels, c_levels,
        |    greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0),
        |    CASE WHEN n > 0 AND CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE) > 0.0
        |         THEN sqrt(greatest(CAST(n AS DOUBLE) * (CAST(sfx AS DOUBLE) / 1000000000000.0 - 1.0), 0.0)
        |                   / (CAST(n AS DOUBLE) * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE))) END
        |  FROM m2
        |) ORDER BY pair""".stripMargin,

    "q_mad" ->
      """WITH f AS (SELECT l_returnflag AS g,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |FROM lineitem),
        |m AS (SELECT g, quantile_cont(cents, 0.5) AS med FROM f GROUP BY 1),
        |d AS (SELECT f.g, m.med, abs(CAST(f.cents AS DOUBLE) - m.med) AS dev
        |      FROM f JOIN m USING (g)),
        |md AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.g AS l_returnflag, count(*) AS n,
        |  CAST(count(CASE WHEN d.dev > 3.0 * md.mad THEN 1 END) AS BIGINT) AS n_outliers,
        |  min(d.med) AS med, min(md.mad) AS mad
        |FROM d JOIN md USING (g)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_heavy_hitters_group" ->
      """SELECT source, lang, count(*) AS cnt
        |FROM documents GROUP BY source, lang
        |ORDER BY source, cnt DESC, lang""".stripMargin,

    "q_winsorize_group" ->
      """WITH f AS (SELECT l_returnflag,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |FROM lineitem),
        |q AS (SELECT l_returnflag, quantile_cont(cents, 0.05) AS lo, quantile_cont(cents, 0.95) AS hi
        |      FROM f GROUP BY 1),
        |w AS (SELECT f.l_returnflag,
        |        least(greatest(CAST(cents AS DOUBLE), lo), hi) AS wv,
        |        (CAST(cents AS DOUBLE) < lo OR CAST(cents AS DOUBLE) > hi) AS clip
        |      FROM f JOIN q USING (l_returnflag))
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(count(CASE WHEN clip THEN 1 END) AS BIGINT) AS clipped,
        |  CAST(sum(CAST(CASE WHEN wv >= 0 THEN floor(wv * 100.0 + 0.5)
        |                     ELSE -floor(-wv * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS wsum_fx
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_winsorize" ->
      """WITH f AS (SELECT l_returnflag,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |FROM lineitem),
        |q AS (SELECT quantile_cont(cents, 0.05) AS lo, quantile_cont(cents, 0.95) AS hi FROM f),
        |w AS (SELECT l_returnflag,
        |        least(greatest(CAST(cents AS DOUBLE), lo), hi) AS wv,
        |        (CAST(cents AS DOUBLE) < lo OR CAST(cents AS DOUBLE) > hi) AS clip
        |      FROM f CROSS JOIN q)
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(count(CASE WHEN clip THEN 1 END) AS BIGINT) AS clipped,
        |  CAST(sum(CAST(CASE WHEN wv >= 0 THEN floor(wv * 100.0 + 0.5)
        |                     ELSE -floor(-wv * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS wsum_fx
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_prop_test" ->
      """WITH r AS (SELECT CAST(count(*) AS BIGINT) AS n_ref,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x_ref
        |       FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_cur,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS x_cur
        |       FROM orders WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')),
        |m AS (SELECT * FROM r, c),
        |d AS (SELECT *,
        |        CAST(x_ref AS DOUBLE) / CAST(n_ref AS DOUBLE) AS p1,
        |        CAST(x_cur AS DOUBLE) / CAST(n_cur AS DOUBLE) AS p2,
        |        (CAST(x_ref AS DOUBLE) + CAST(x_cur AS DOUBLE))
        |          / (CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE)) AS pp
        |      FROM m)
        |SELECT n_ref, x_ref, n_cur, x_cur,
        |  CASE WHEN n_ref > 0 THEN p1 END AS p_ref,
        |  CASE WHEN n_cur > 0 THEN p2 END AS p_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0 THEN p1 - p2 END AS diff,
        |  CASE WHEN n_ref > 0 AND n_cur > 0
        |        AND pp * (1.0 - pp) * (1.0 / CAST(n_ref AS DOUBLE)
        |                               + 1.0 / CAST(n_cur AS DOUBLE)) > 0.0
        |  THEN (p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_ref AS DOUBLE)
        |                                           + 1.0 / CAST(n_cur AS DOUBLE))) END AS z
        |FROM d""".stripMargin,

    "q_cat_entropy" -> catEntropyOracle(Seq("lang", "source")),

    "q_roc_auc" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |u AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS v,
        |       CASE WHEN h2 < h1 THEN 1 ELSE 2 END AS side
        |  FROM f),
        |c AS (SELECT v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY v),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS kc FROM c),
        |m AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(CAST(c1 AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS r1d,
        |             sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS ties
        |      FROM k)
        |SELECT n1 AS n_pos, n2 AS n_neg,
        |       CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |         / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc,
        |       CASE WHEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) > 0.0
        |       THEN (CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |               - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |            / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))
        |       END AS z
        |FROM m""".stripMargin,

    "q_pr_curve" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS s,
        |       h2 < h1 AS y FROM f),
        |c AS (SELECT s AS threshold_fx,
        |        sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
        |        sum(CASE WHEN y THEN 0 ELSE 1 END) AS ng
        |      FROM q GROUP BY s),
        |t AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all FROM c),
        |k AS (SELECT threshold_fx,
        |        CAST(sum(p) OVER (ORDER BY threshold_fx DESC) AS BIGINT) AS tp,
        |        CAST(sum(ng) OVER (ORDER BY threshold_fx DESC) AS BIGINT) AS fp
        |      FROM c)
        |SELECT threshold_fx, tp, fp, t.tp_all - tp AS fn,
        |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
        |  CASE WHEN tp + (t.tp_all - tp) > 0
        |       THEN CAST(tp AS DOUBLE) / CAST(tp + (t.tp_all - tp) AS DOUBLE) END AS recall,
        |  CASE WHEN 2 * tp + fp + (t.tp_all - tp) > 0
        |       THEN CAST(2 * tp AS DOUBLE)
        |            / CAST(2 * tp + fp + (t.tp_all - tp) AS DOUBLE) END AS f1
        |FROM k, t ORDER BY threshold_fx DESC""".stripMargin,

    "q_confusion" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT)
        |         >= 600000 AS p,
        |       h2 < h1 AS y FROM f),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM q)
        |SELECT tp, fp, fn, tn,
        |  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE) AS accuracy,
        |  CASE WHEN CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) > 0
        |  THEN CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
        |       / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) AS DOUBLE))
        |  END AS mcc
        |FROM m""".stripMargin,

    "q_spearman_group" ->
      """WITH f AS (SELECT l_returnflag AS g,
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y
        |FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  AND l_returnflag IS NOT NULL),
        |cx AS (SELECT g, x AS v, count(*) AS c FROM f GROUP BY 1, 2),
        |rx AS (SELECT g, v,
        |        (sum(c) OVER (PARTITION BY g ORDER BY v) - c) * 2 + c + 1 AS dr FROM cx),
        |cy AS (SELECT g, y AS v, count(*) AS c FROM f GROUP BY 1, 2),
        |ry AS (SELECT g, v,
        |        (sum(c) OVER (PARTITION BY g ORDER BY v) - c) * 2 + c + 1 AS dr FROM cy),
        |j AS (SELECT f.g, rx.dr AS a, ry.dr AS b
        |      FROM f JOIN rx ON f.g = rx.g AND f.x = rx.v
        |             JOIN ry ON f.g = ry.g AND f.y = ry.v),
        |m AS (SELECT g, count(*) AS n,
        |  sum(CAST(a AS HUGEINT)) AS sx, sum(CAST(b AS HUGEINT)) AS sy,
        |  sum(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS sxx,
        |  sum(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS syy,
        |  sum(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sxy
        |FROM j GROUP BY g)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |       CASE WHEN dx > 0.0 AND dy > 0.0
        |            THEN num / (sqrt(dx) * sqrt(dy)) END AS rho
        |FROM (SELECT g, n,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m)
        |ORDER BY l_returnflag""".stripMargin,

    "q_brier" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS s,
        |       CASE WHEN h2 < h1 THEN 1000000 ELSE 0 END AS y FROM f),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(s - y AS HUGEINT) * (s - y)) AS se FROM q)
        |SELECT n, CASE WHEN n > 0
        |  THEN CAST(se AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000000.0 END AS brier
        |FROM m""".stripMargin,

    "q_avg_precision" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |q AS (SELECT CAST(CASE WHEN CAST(h1 AS DOUBLE) / 1000.0 >= 0
        |         THEN floor(CAST(h1 AS DOUBLE) / 1000.0 * 1000000.0 + 0.5)
        |         ELSE -floor(-(CAST(h1 AS DOUBLE) / 1000.0) * 1000000.0 + 0.5) END AS BIGINT) AS s,
        |       h2 < h1 AS y FROM f),
        |c AS (SELECT s AS tf, sum(CASE WHEN y THEN 1 ELSE 0 END) AS p,
        |        sum(CASE WHEN y THEN 0 ELSE 1 END) AS ng FROM q GROUP BY s),
        |t AS (SELECT CAST(sum(p) AS BIGINT) AS tp_all FROM c),
        |k AS (SELECT tf, CAST(sum(p) OVER (ORDER BY tf DESC) AS BIGINT) AS tp,
        |        CAST(sum(ng) OVER (ORDER BY tf DESC) AS BIGINT) AS fp FROM c),
        |g AS (SELECT tf, tp, fp,
        |        CAST(coalesce(lag(tp) OVER (ORDER BY tf DESC), 0) AS BIGINT) AS ptp
        |      FROM k),
        |terms AS (SELECT
        |    (CAST(tp - ptp AS DOUBLE) / CAST(t.tp_all AS DOUBLE))
        |      * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)) AS term
        |  FROM g, t),
        |fx AS (SELECT CAST(sum(CASE WHEN term >= 0
        |    THEN CAST(floor(term * 1000000000000.0 + 0.5) AS BIGINT)
        |    ELSE -CAST(floor(-term * 1000000000000.0 + 0.5) AS BIGINT) END) AS BIGINT) AS sfx
        |  FROM terms)
        |SELECT t.tp_all AS n_pos,
        |       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_thresholds,
        |       CAST(fx.sfx AS DOUBLE) / 1000000000000.0 AS avg_precision
        |FROM t, fx""".stripMargin,

    "q_calibration" ->
      """WITH f AS (SELECT
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|score'), 1, 15))::BIGINT % 1000 AS h1,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|label'), 1, 15))::BIGINT % 1000 AS h2
        |  FROM documents),
        |g AS (SELECT CAST(h1 AS DOUBLE) / 1000.0 AS score, h2 < h1 AS label FROM f),
        |q AS (SELECT CAST(CASE WHEN score >= 0 THEN floor(score * 1000000.0 + 0.5)
        |          ELSE -floor(-score * 1000000.0 + 0.5) END AS BIGINT) AS sfx, label FROM g),
        |b AS (SELECT least(greatest((sfx * 10) // 1000000, 0), 9) AS bucket, sfx, label FROM q),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS tot FROM b),
        |m AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CAST(sfx AS HUGEINT)) AS HUGEINT) AS ss,
        |        CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |      FROM b GROUP BY bucket)
        |SELECT bucket, n,
        |  CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean_score,
        |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
        |  abs(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
        |      - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE)) AS ece_term
        |FROM m, t ORDER BY bucket""".stripMargin,

    "q_qnorm" ->
      """WITH cur0 AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL GROUP BY 1),
        |cur AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM cur0),
        |ref0 AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c
        |  FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL GROUP BY 1),
        |ref AS (SELECT v AS ref_v, sum(c) OVER (ORDER BY v) AS ref_cum FROM ref0),
        |n AS (SELECT (SELECT max(cum) FROM cur) AS n_cur,
        |             (SELECT max(ref_cum) FROM ref) AS n_ref),
        |m AS (SELECT cur.v, min(ref.ref_v) AS qn
        |      FROM cur, ref, n
        |      WHERE ref.ref_cum * n.n_cur >= cur.cum * n.n_ref
        |      GROUP BY cur.v)
        |SELECT d.doc_id, d.n_chars, m.qn AS n_chars_qnorm
        |FROM documents d LEFT JOIN m ON CAST(d.n_chars AS BIGINT) = m.v
        |WHERE d.source = 'src0'
        |ORDER BY d.doc_id""".stripMargin,

    "q_gini_group" ->
      """WITH per AS (SELECT c.c_mktsegment AS seg, o.o_custkey,
        |    CAST(sum(CAST(CASE WHEN o_totalprice >= 0
        |         THEN floor(o_totalprice * 100.0 + 0.5)
        |         ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |c AS (SELECT seg, cents AS v, count(*) AS c FROM per
        |      WHERE cents >= 0 AND seg IS NOT NULL GROUP BY 1, 2),
        |k AS (SELECT seg, v, c, sum(c) OVER (PARTITION BY seg ORDER BY v) AS cum FROM c),
        |m AS (SELECT seg, CAST(sum(c) AS HUGEINT) AS n,
        |             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sx,
        |             CAST(sum(CAST(v AS HUGEINT)
        |                  * (2 * CAST(c AS HUGEINT) * (cum - c)
        |                     + CAST(c AS HUGEINT) * (c + 1))) AS HUGEINT) AS six2
        |      FROM k GROUP BY seg)
        |SELECT seg, CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS total,
        |  CASE WHEN sx > 0 THEN CAST(six2 - (n + 1) * sx AS DOUBLE)
        |       / CAST(n * sx AS DOUBLE) END AS gini
        |FROM m ORDER BY seg""".stripMargin,

    "q_fdr" ->
      """WITH t AS (SELECT o_orderkey AS test_id,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|fdr'), 1, 15))::BIGINT AS h
        |  FROM orders),
        |p0 AS (SELECT test_id,
        |    CASE WHEN test_id % 97 = 0
        |         THEN CAST(h % 1000003 AS DOUBLE) / 1000003.0 / 1000.0
        |         ELSE CAST(h % 1000003 AS DOUBLE) / 1000003.0 END AS p FROM t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p0),
        |r AS (SELECT test_id, p,
        |        CAST(row_number() OVER (ORDER BY p, test_id) AS BIGINT) AS p_rank
        |      FROM p0),
        |f AS (SELECT test_id, p, p_rank,
        |        least(CAST(p AS DOUBLE) * CAST(n.n AS DOUBLE)
        |              / CAST(p_rank AS DOUBLE), 1.0) AS ff
        |      FROM r, n),
        |q AS (SELECT test_id, p, p_rank,
        |        min(ff) OVER (ORDER BY p_rank DESC) AS bh_q FROM f)
        |SELECT test_id, p, p_rank, bh_q, bh_q <= 0.05 AS reject
        |FROM q ORDER BY p_rank""".stripMargin,

    "q_gini" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(sum(CAST(CASE WHEN o_totalprice >= 0
        |         THEN floor(o_totalprice * 100.0 + 0.5)
        |         ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |c AS (SELECT cents AS v, count(*) AS c FROM per WHERE cents >= 0 GROUP BY cents),
        |k AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM c),
        |m AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
        |             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS sx,
        |             CAST(sum(CAST(v AS HUGEINT)
        |                  * (2 * CAST(c AS HUGEINT) * (cum - c)
        |                     + CAST(c AS HUGEINT) * (c + 1))) AS HUGEINT) AS six2
        |      FROM k)
        |SELECT CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS total,
        |  CASE WHEN sx > 0 THEN CAST(six2 - (n + 1) * sx AS DOUBLE)
        |       / CAST(n * sx AS DOUBLE) END AS gini
        |FROM m""".stripMargin,

    "q_trimmed_mean" ->
      """WITH f AS (SELECT CAST(CASE WHEN l_extendedprice >= 0
        |         THEN floor(l_extendedprice * 100.0 + 0.5)
        |         ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v
        |       FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT quantile_cont(v, 0.0625) AS lo, quantile_cont(v, 0.9375) AS hi,
        |             CAST(count(*) AS BIGINT) AS n_total FROM f),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
        |             sum(CAST(v AS HUGEINT)) AS s
        |      FROM f, b WHERE CAST(v AS DOUBLE) >= b.lo AND CAST(v AS DOUBLE) <= b.hi)
        |SELECT b.n_total, k.n_kept, b.lo, b.hi,
        |       CASE WHEN k.n_kept > 0
        |            THEN CAST(k.s AS DOUBLE) / CAST(k.n_kept AS DOUBLE) END AS trimmed_mean
        |FROM b, k""".stripMargin,

    "q_kl_slice" ->
      """WITH tok AS (SELECT lang AS slice,
        |         unnest(string_split_regex(text, '\s+')) AS token
        |       FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT slice, token, count(*) AS o FROM tok GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
        |w AS (SELECT slice, o,
        |             sum(o) OVER (PARTITION BY slice) AS ns,
        |             sum(o) OVER (PARTITION BY token) AS ct FROM c),
        |t AS (SELECT slice, ns,
        |  CASE WHEN (CAST(o AS DOUBLE) / CAST(ns AS DOUBLE))
        |            * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE))) >= 0
        |  THEN CAST(floor((CAST(o AS DOUBLE) / CAST(ns AS DOUBLE))
        |            * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE)))
        |            * 1000000000.0 + 0.5) AS BIGINT)
        |  ELSE -CAST(floor(-((CAST(o AS DOUBLE) / CAST(ns AS DOUBLE))
        |            * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                 / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE))))
        |            * 1000000000.0 + 0.5) AS BIGINT) END AS tfx
        |  FROM w CROSS JOIN n)
        |SELECT slice, CAST(max(ns) AS BIGINT) AS n_tokens, count(*) AS vocab,
        |       CAST(sum(tfx) AS BIGINT) AS kl_fx,
        |       CAST(CAST(sum(tfx) AS BIGINT) AS DOUBLE) / 1000000000.0 AS kl
        |FROM t GROUP BY slice ORDER BY slice""".stripMargin,

    "q_kappa" ->
      """WITH lab AS (SELECT lang AS a,
        |         CASE WHEN doc_id % 9 = 0 THEN 'zz' ELSE lang END AS b
        |       FROM documents WHERE lang IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM lab GROUP BY a, b),
        |n AS (SELECT CAST(coalesce(sum(o), 0) AS HUGEINT) AS n FROM cells),
        |ag AS (SELECT CAST(coalesce(sum(o), 0) AS HUGEINT) AS agree
        |       FROM cells WHERE a = b),
        |r AS (SELECT a AS k, sum(o) AS r FROM cells GROUP BY a),
        |c AS (SELECT b AS k, sum(o) AS c FROM cells GROUP BY b),
        |rc AS (SELECT CAST(coalesce(sum(CAST(r.r AS HUGEINT) * c.c), 0) AS HUGEINT) AS rc
        |       FROM r JOIN c USING (k))
        |SELECT CAST(n.n AS BIGINT) AS n, CAST(ag.agree AS BIGINT) AS agree,
        |  CASE WHEN n.n > 0 THEN CAST(ag.agree AS DOUBLE) / CAST(n.n AS DOUBLE) END AS p_o,
        |  CASE WHEN n.n > 0 THEN CAST(rc.rc AS DOUBLE) / CAST(n.n * n.n AS DOUBLE) END AS p_e,
        |  CASE WHEN n.n * n.n <> rc.rc THEN CAST(n.n * ag.agree - rc.rc AS DOUBLE)
        |       / CAST(n.n * n.n - rc.rc AS DOUBLE) END AS kappa
        |FROM n, ag, rc""".stripMargin,

    "q_ks" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT CAST(cents AS DOUBLE) AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2 FROM c)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       (SELECT max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |                     - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |        FROM k, n) AS ks_stat
        |FROM n""".stripMargin,

    "q_standardize" ->
      """WITH f AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS fx
        |FROM lineitem),
        |m AS (SELECT l_returnflag,
        |        CAST(count(fx) AS HUGEINT) AS n,
        |        sum(CAST(fx AS HUGEINT)) AS s,
        |        sum(CAST(fx AS HUGEINT) * CAST(fx AS HUGEINT)) AS q
        |      FROM f GROUP BY 1)
        |SELECT f.l_orderkey, f.l_linenumber, f.l_returnflag,
        |  CASE WHEN CAST(m.n * m.q - m.s * m.s AS DOUBLE) > 0.0
        |       THEN CAST(CAST(f.fx AS HUGEINT) * m.n - m.s AS DOUBLE)
        |            / sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) END AS l_quantity_z
        |FROM f JOIN m USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber, l_quantity_z""".stripMargin,

    "q_chi2_drift" ->
      """WITH u AS (SELECT o_orderpriority AS k,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS side
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |c AS (SELECT k, sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY 1),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             count(*) AS cats FROM c),
        |terms AS (SELECT
        |    ((CAST(c1 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n1)
        |     * (CAST(c1 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n1)
        |     * 1000000)
        |    // (CAST(c1 + c2 AS HUGEINT) * (n1 + n2) * n1) +
        |    ((CAST(c2 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n2)
        |     * (CAST(c2 AS HUGEINT) * (n1 + n2) - CAST(c1 + c2 AS HUGEINT) * n2)
        |     * 1000000)
        |    // (CAST(c1 + c2 AS HUGEINT) * (n1 + n2) * n2) AS tt
        |  FROM c, n)
        |SELECT n.n1 AS n_ref, n.n2 AS n_cur, n.cats AS categories,
        |       (SELECT CAST(sum(tt) AS BIGINT) FROM terms) AS chi2_ppm
        |FROM n""".stripMargin,

    "q_mwu" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT cents AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |k AS (SELECT c1, c2, c1 + c2 AS c,
        |             sum(c1 + c2) OVER (ORDER BY v) AS kc FROM c),
        |m AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |             sum(CAST(c1 AS HUGEINT) * ((kc - c) * 2 + c + 1)) AS r1d,
        |             sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * c * c - c ELSE 0 END) AS ties
        |      FROM k)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u_doubled,
        |       CAST(ties AS BIGINT) AS tie_term,
        |       CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |         / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc,
        |       CASE WHEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) > 0.0
        |       THEN (CAST(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS DOUBLE) / 2.0
        |               - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |            / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
        |                 (CAST(n1 + n2 + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
        |                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))
        |       END AS z
        |FROM m""".stripMargin,

    "q_weighted_median" ->
      """WITH f AS (SELECT
        |    CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |         ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |    CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 1.0 + 0.5)
        |         ELSE -floor(-l_quantity * 1.0 + 0.5) END AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (SELECT v, sum(w) AS c FROM f WHERE w > 0 GROUP BY v),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS wt FROM c),
        |k AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM c),
        |p AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE) AS p)
        |SELECT p.p AS p, min(k.v) AS value, max(n.wt) AS w_total
        |FROM p, k, n
        |WHERE CAST(k.cum AS DOUBLE) >= p.p * CAST(n.wt AS DOUBLE)
        |GROUP BY p.p
        |ORDER BY p""".stripMargin,

    "q_wasserstein" ->
      """WITH u AS (
        |  SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |              ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents,
        |         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 2 END AS side
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |c AS (SELECT cents AS v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY cents),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c),
        |k AS (SELECT v, sum(c1) OVER (ORDER BY v) AS k1,
        |             sum(c2) OVER (ORDER BY v) AS k2,
        |             lead(v) OVER (ORDER BY v) AS vn FROM c)
        |SELECT n1 AS n_ref, n2 AS n_cur,
        |       (SELECT CAST(sum(abs(CAST(k1 AS HUGEINT) * n2 - CAST(k2 AS HUGEINT) * n1)
        |                        * (vn - v)) AS DOUBLE)
        |        FROM k, n WHERE vn IS NOT NULL)
        |       / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) AS w1
        |FROM n""".stripMargin,

    "q_wasserstein_group" ->
      """WITH u AS (
        |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v, 1 AS side
        |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL AND lang IS NOT NULL
        |  UNION ALL
        |  SELECT lang, CAST(n_chars AS BIGINT), 2
        |  FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT g, v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY g, v),
        |k AS (SELECT g, v, c1, c2,
        |             sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
        |             sum(c2) OVER (PARTITION BY g ORDER BY v) AS k2,
        |             lead(v) OVER (PARTITION BY g ORDER BY v) AS vn,
        |             sum(c1) OVER (PARTITION BY g) AS n1,
        |             sum(c2) OVER (PARTITION BY g) AS n2
        |      FROM c)
        |SELECT g AS lang, CAST(max(n1) AS BIGINT) AS n_ref,
        |       CAST(max(n2) AS BIGINT) AS n_cur,
        |       CAST(sum(CASE WHEN vn IS NOT NULL
        |                THEN abs(CAST(k1 AS HUGEINT) * n2 - CAST(k2 AS HUGEINT) * n1)
        |                     * (vn - v) ELSE 0 END) AS DOUBLE)
        |       / CAST(CAST(max(n1) AS HUGEINT) * max(n2) AS DOUBLE) AS w1
        |FROM k WHERE n1 > 0 AND n2 > 0
        |GROUP BY g ORDER BY lang""".stripMargin,

    "q_ks_group" ->
      """WITH u AS (
        |  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v, 1 AS side
        |  FROM documents WHERE source = 'src0' AND n_chars IS NOT NULL AND lang IS NOT NULL
        |  UNION ALL
        |  SELECT lang, CAST(n_chars AS DOUBLE), 2
        |  FROM documents WHERE source = 'src1' AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT g, v,
        |             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1,
        |             sum(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS c2
        |      FROM u GROUP BY g, v),
        |k AS (SELECT g, v, c1, c2,
        |             sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
        |             sum(c2) OVER (PARTITION BY g ORDER BY v) AS k2,
        |             sum(c1) OVER (PARTITION BY g) AS n1,
        |             sum(c2) OVER (PARTITION BY g) AS n2
        |      FROM c)
        |SELECT g AS lang, CAST(max(n1) AS BIGINT) AS n_ref,
        |       CAST(max(n2) AS BIGINT) AS n_cur,
        |       max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |             - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_stat
        |FROM k WHERE n1 > 0 AND n2 > 0
        |GROUP BY g ORDER BY lang""".stripMargin,

    "q_outliers" ->
      """WITH v AS (SELECT l_returnflag,
        |                  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS cents
        |           FROM lineitem),
        |q AS (SELECT l_returnflag, quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.75) AS q3
        |      FROM v GROUP BY l_returnflag)
        |SELECT v.l_returnflag, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN cents < q1 - 1.5 * (q3 - q1) OR cents > q3 + 1.5 * (q3 - q1)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       min(CASE WHEN cents < q1 - 1.5 * (q3 - q1) OR cents > q3 + 1.5 * (q3 - q1)
        |                THEN cents END) AS min_outlier_cents,
        |       max(CASE WHEN cents < q1 - 1.5 * (q3 - q1) OR cents > q3 + 1.5 * (q3 - q1)
        |                THEN cents END) AS max_outlier_cents
        |FROM v JOIN q USING (l_returnflag)
        |GROUP BY v.l_returnflag ORDER BY v.l_returnflag""".stripMargin,

    "q_anomaly" ->
      // identical integer flag over the identical ROWS frame; DuckDB's
      // HUGEINT window sums are exact, and only id columns are output
      """WITH f AS (SELECT user_id, event_id,
        |                  CAST(CASE WHEN value >= 0 THEN floor(value * 1000.0 + 0.5)
        |                            ELSE -floor(-value * 1000.0 + 0.5) END AS BIGINT) AS v
        |           FROM events),
        |r AS (SELECT user_id, event_id, v,
        |             count(v) OVER w AS n, sum(v) OVER w AS s, sum(v * v) OVER w AS q
        |      FROM f
        |      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id FROM r
        |WHERE n >= 5 AND (n * v - s) * (n * v - s) > 9 * (n * q - s * s)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_heavy_hitters" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang ASC""".stripMargin,

    "q_heavy_hitters_ss" ->
      """SELECT lang, count(*) AS cnt, CAST(0 AS BIGINT) AS err FROM documents
        |GROUP BY lang ORDER BY cnt DESC, lang ASC""".stripMargin,

    "q_corr" ->
      // identical moments as exact HUGEINT sums, identical double tree:
      // CAST each co-moment once, then num / (sqrt(dx) * sqrt(dy))
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x1,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y1,
        |  CAST(CASE WHEN l_discount >= 0 THEN floor(l_discount * 100.0 + 0.5)
        |            ELSE -floor(-l_discount * 100.0 + 0.5) END AS BIGINT) AS x2,
        |  CAST(CASE WHEN l_tax >= 0 THEN floor(l_tax * 100.0 + 0.5)
        |            ELSE -floor(-l_tax * 100.0 + 0.5) END AS BIGINT) AS y2
        |FROM lineitem),
        |m AS (SELECT
        |  count(CASE WHEN x1 IS NOT NULL AND y1 IS NOT NULL THEN 1 END) AS n1,
        |  sum(CAST(x1 AS HUGEINT)) AS sx1, sum(CAST(y1 AS HUGEINT)) AS sy1,
        |  sum(CAST(x1 AS HUGEINT) * CAST(x1 AS HUGEINT)) AS sxx1,
        |  sum(CAST(y1 AS HUGEINT) * CAST(y1 AS HUGEINT)) AS syy1,
        |  sum(CAST(x1 AS HUGEINT) * CAST(y1 AS HUGEINT)) AS sxy1,
        |  count(CASE WHEN x2 IS NOT NULL AND y2 IS NOT NULL THEN 1 END) AS n2,
        |  sum(CAST(x2 AS HUGEINT)) AS sx2, sum(CAST(y2 AS HUGEINT)) AS sy2,
        |  sum(CAST(x2 AS HUGEINT) * CAST(x2 AS HUGEINT)) AS sxx2,
        |  sum(CAST(y2 AS HUGEINT) * CAST(y2 AS HUGEINT)) AS syy2,
        |  sum(CAST(x2 AS HUGEINT) * CAST(y2 AS HUGEINT)) AS sxy2
        |FROM f)
        |SELECT pair, n, CASE WHEN dx > 0.0 AND dy > 0.0
        |                     THEN num / (sqrt(dx) * sqrt(dy)) END AS corr
        |FROM (
        |  SELECT 'l_quantity~l_extendedprice' AS pair, n1 AS n,
        |         CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE) AS num,
        |         CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE) AS dx,
        |         CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE) AS dy
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_discount~l_tax', n2,
        |         CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE),
        |         CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE),
        |         CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE)
        |  FROM m)
        |ORDER BY pair""".stripMargin,

    "q_skew_report" ->
      """WITH c AS (SELECT source AS key, count(*) AS cnt FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT key, cnt, CAST((cnt * 1000000) // n AS BIGINT) AS share_ppm
        |FROM c, n ORDER BY cnt DESC, key ASC LIMIT 10""".stripMargin,

    "q_pct_rank" ->
      """WITH c AS (SELECT CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |                            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS v,
        |                  count(*) AS c
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT v, c, sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |             sum(c) OVER () AS n
        |      FROM c)
        |SELECT v, CAST(c AS BIGINT) AS c,
        |       CAST(cum - c AS BIGINT) AS cum_lt, CAST(cum AS BIGINT) AS cum_le,
        |       CAST(cum - c AS DOUBLE) / CAST(n AS DOUBLE) AS pct_below,
        |       CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) AS cdf
        |FROM t ORDER BY v""".stripMargin,

    "q_bins" ->
      // the identical integer bin formula; DuckDB // == Spark div on the
      // non-negative (cum-1)*k
      """WITH c AS (SELECT CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS v,
        |                  count(*) AS c
        |           FROM lineitem GROUP BY 1),
        |t AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n FROM c)
        |SELECT CAST(((cum - 1) * 8) // n AS BIGINT) AS bin,
        |       CAST(sum(c) AS BIGINT) AS n_rows, min(v) AS v_min, max(v) AS v_max
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_percentiles_group" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_robust_scale" ->
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS fx
        |FROM lineitem),
        |q AS (SELECT quantile_cont(fx, 0.25) AS q1, quantile_cont(fx, 0.5) AS med,
        |             quantile_cont(fx, 0.75) AS q3 FROM f)
        |SELECT (CAST(fx AS DOUBLE) - med) / (q3 - q1) AS rz, count(*) AS n
        |FROM f CROSS JOIN q
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_spearman" ->
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5)
        |            ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS x,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |            ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS y
        |FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cx AS (SELECT x AS v, count(*) AS c FROM f GROUP BY 1),
        |rx AS (SELECT v, (sum(c) OVER (ORDER BY v) - c) * 2 + c + 1 AS dr FROM cx),
        |cy AS (SELECT y AS v, count(*) AS c FROM f GROUP BY 1),
        |ry AS (SELECT v, (sum(c) OVER (ORDER BY v) - c) * 2 + c + 1 AS dr FROM cy),
        |j AS (SELECT rx.dr AS a, ry.dr AS b
        |      FROM f JOIN rx ON f.x = rx.v JOIN ry ON f.y = ry.v),
        |m AS (SELECT count(*) AS n,
        |  sum(CAST(a AS HUGEINT)) AS sx, sum(CAST(b AS HUGEINT)) AS sy,
        |  sum(CAST(a AS HUGEINT) * CAST(a AS HUGEINT)) AS sxx,
        |  sum(CAST(b AS HUGEINT) * CAST(b AS HUGEINT)) AS syy,
        |  sum(CAST(a AS HUGEINT) * CAST(b AS HUGEINT)) AS sxy
        |FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |       CASE WHEN dx > 0.0 AND dy > 0.0
        |            THEN num / (sqrt(dx) * sqrt(dy)) END AS rho
        |FROM (SELECT n,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m)""".stripMargin,

    "q_corr_matrix" ->
      """WITH f AS (SELECT
        |  CAST(CASE WHEN l_quantity >= 0 THEN floor(l_quantity * 100.0 + 0.5) ELSE -floor(-l_quantity * 100.0 + 0.5) END AS BIGINT) AS q0,
        |  CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5) ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) AS q1,
        |  CAST(CASE WHEN l_discount >= 0 THEN floor(l_discount * 100.0 + 0.5) ELSE -floor(-l_discount * 100.0 + 0.5) END AS BIGINT) AS q2,
        |  CAST(CASE WHEN l_tax >= 0 THEN floor(l_tax * 100.0 + 0.5) ELSE -floor(-l_tax * 100.0 + 0.5) END AS BIGINT) AS q3
        |FROM lineitem),
        |m AS (SELECT
        |  count(*) AS n,
        |  sum(CAST(q0 AS HUGEINT)) AS s0,
        |  sum(CAST(q1 AS HUGEINT)) AS s1,
        |  sum(CAST(q2 AS HUGEINT)) AS s2,
        |  sum(CAST(q3 AS HUGEINT)) AS s3,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q0 AS HUGEINT)) AS p00,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q1 AS HUGEINT)) AS p01,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q2 AS HUGEINT)) AS p02,
        |  sum(CAST(q0 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p03,
        |  sum(CAST(q1 AS HUGEINT) * CAST(q1 AS HUGEINT)) AS p11,
        |  sum(CAST(q1 AS HUGEINT) * CAST(q2 AS HUGEINT)) AS p12,
        |  sum(CAST(q1 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p13,
        |  sum(CAST(q2 AS HUGEINT) * CAST(q2 AS HUGEINT)) AS p22,
        |  sum(CAST(q2 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p23,
        |  sum(CAST(q3 AS HUGEINT) * CAST(q3 AS HUGEINT)) AS p33
        |FROM f)
        |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
        |  CASE WHEN CAST(n * p00 - s0 * s0 AS DOUBLE) > 0.0 AND CAST(n * p11 - s1 * s1 AS DOUBLE) > 0.0
        |  THEN CAST(n * p01 - s0 * s1 AS DOUBLE) / (sqrt(CAST(n * p00 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * p11 - s1 * s1 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, n,
        |  CASE WHEN CAST(n * p00 - s0 * s0 AS DOUBLE) > 0.0 AND CAST(n * p22 - s2 * s2 AS DOUBLE) > 0.0
        |  THEN CAST(n * p02 - s0 * s2 AS DOUBLE) / (sqrt(CAST(n * p00 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * p22 - s2 * s2 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b, n,
        |  CASE WHEN CAST(n * p00 - s0 * s0 AS DOUBLE) > 0.0 AND CAST(n * p33 - s3 * s3 AS DOUBLE) > 0.0
        |  THEN CAST(n * p03 - s0 * s3 AS DOUBLE) / (sqrt(CAST(n * p00 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * p33 - s3 * s3 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, n,
        |  CASE WHEN CAST(n * p11 - s1 * s1 AS DOUBLE) > 0.0 AND CAST(n * p22 - s2 * s2 AS DOUBLE) > 0.0
        |  THEN CAST(n * p12 - s1 * s2 AS DOUBLE) / (sqrt(CAST(n * p11 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * p22 - s2 * s2 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b, n,
        |  CASE WHEN CAST(n * p11 - s1 * s1 AS DOUBLE) > 0.0 AND CAST(n * p33 - s3 * s3 AS DOUBLE) > 0.0
        |  THEN CAST(n * p13 - s1 * s3 AS DOUBLE) / (sqrt(CAST(n * p11 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * p33 - s3 * s3 AS DOUBLE))) END AS corr FROM m
        |UNION ALL
        |SELECT 'l_discount' AS col_a, 'l_tax' AS col_b, n,
        |  CASE WHEN CAST(n * p22 - s2 * s2 AS DOUBLE) > 0.0 AND CAST(n * p33 - s3 * s3 AS DOUBLE) > 0.0
        |  THEN CAST(n * p23 - s2 * s3 AS DOUBLE) / (sqrt(CAST(n * p22 - s2 * s2 AS DOUBLE)) * sqrt(CAST(n * p33 - s3 * s3 AS DOUBLE))) END AS corr FROM m
        |ORDER BY col_a, col_b""".stripMargin,

    "q_skyline" ->
      """WITH a AS (SELECT l_suppkey AS suppkey,
        |    CAST(sum(CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                       ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS revenue_c,
        |    count(*) AS n_items,
        |    CAST(sum(CAST(CASE WHEN l_discount >= 0 THEN floor(l_discount * 100.0 + 0.5)
        |                       ELSE -floor(-l_discount * 100.0 + 0.5) END AS BIGINT)) AS BIGINT) AS disc_c
        |  FROM lineitem GROUP BY 1)
        |SELECT suppkey, revenue_c, n_items, disc_c FROM a r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM a s
        |  WHERE s.revenue_c >= r.revenue_c AND s.n_items >= r.n_items AND s.disc_c <= r.disc_c
        |    AND (s.revenue_c > r.revenue_c OR s.n_items > r.n_items OR s.disc_c < r.disc_c))
        |ORDER BY suppkey""".stripMargin,

    "q_psi" ->
      """WITH rb AS (SELECT greatest(least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0) / 10410.0) AS BIGINT), 9), 0) AS bucket,
        |              count(*) AS cnt
        |       FROM lineitem
        |       WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_extendedprice IS NOT NULL
        |       GROUP BY 1),
        |cb AS (SELECT greatest(least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - 900.0) / 10410.0) AS BIGINT), 9), 0) AS bucket,
        |              count(*) AS cnt
        |       FROM lineitem
        |       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_extendedprice IS NOT NULL
        |       GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 10)) AS bucket),
        |j AS (SELECT spine.bucket, coalesce(rb.cnt, 0) AS ref_cnt, coalesce(cb.cnt, 0) AS cur_cnt
        |      FROM spine LEFT JOIN rb USING (bucket) LEFT JOIN cb USING (bucket)),
        |tt AS (SELECT CAST(sum(ref_cnt) AS BIGINT) AS nr, CAST(sum(cur_cnt) AS BIGINT) AS nc FROM j),
        |x AS (SELECT bucket, ref_cnt, cur_cnt,
        |        greatest(CAST(ref_cnt AS DOUBLE) / CAST(nr AS DOUBLE), 1e-6) AS p,
        |        greatest(CAST(cur_cnt AS DOUBLE) / CAST(nc AS DOUBLE), 1e-6) AS q
        |      FROM j, tt)
        |SELECT bucket, ref_cnt, cur_cnt,
        |  CAST(CASE WHEN y >= 0 THEN floor(y * 1000000.0 + 0.5)
        |            ELSE -floor(-y * 1000000.0 + 0.5) END AS BIGINT) AS psi_fx
        |FROM (SELECT bucket, ref_cnt, cur_cnt, (p - q) * ln(p / q) AS y FROM x)
        |ORDER BY bucket""".stripMargin,

  )
}
