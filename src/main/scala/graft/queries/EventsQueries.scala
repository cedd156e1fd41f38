package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event/session analytics, streaming-parity and multimodal gates. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object EventsQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> ((s, dir) =>
      // ordered signup→click→purchase funnel, 7-day conversion window:
      // greedy-min sequencing, one skinny aggregate per stage
      Events.funnel(t(s, dir, "events"), "ts", "user_id", "event_type",
          Seq("signup", "click", "purchase"), windowSec = 7L * 86400L)
        .orderBy("stage_index")),

    "q_funnel_gaps" -> ((s, dir) =>
      // time-to-convert between the same funnel's stages: exact quartiles
      // + mean of integer-second reach-time gaps per transition
      Events.stageGaps(t(s, dir, "events"), "ts", "user_id", "event_type",
          Seq("signup", "click", "purchase"), windowSec = 7L * 86400L)
        .orderBy("stage_index")),

    "q_cohort" -> ((s, dir) =>
      // weekly cohort retention triangle over integer epoch-day/week indices
      // (calendar-function-free, so both engines bucket identically)
      Events.cohortRetention(t(s, dir, "events"), "ts", "user_id",
          maxWeeks = 8)
        .orderBy("cohort_week", "week_offset")),

    "q_transitions" -> ((s, dir) =>
      // per-user consecutive event-type transition counts, (ts, event_id)
      // ordered so the matrix is deterministic under any partitioning
      Events.transitions(t(s, dir, "events"), "ts", "user_id", "event_type",
          "event_id")
        .orderBy("from_type", "to_type")),

    "q_multimodal" -> { (s, dir) =>
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "text/plain")
      Multimodal.decodeFeatures(s, media)
        .select(col("id"), col("n_bytes"), col("first_byte")).orderBy("id")
    },

    "q_video_shots" -> { (s, dir) =>
      import s.implicits._
      // video keyframe plumbing end-to-end from the BYTES up: one GVID
      // container per 20th order, one 9x8 grayscale BMP frame per lineitem
      // (Weyl-style multiplicative pixel field seeded by the price cents;
      // 9x8 makes the dHash grid sample pixels 1:1) -> parse + per-frame
      // dHash + consecutive-frame Hamming -> shot ids. The oracle
      // re-derives every dHash comparison from the same integer pixel
      // formula, so boundaries verify cross-engine bit-exactly.
      val seeds = t(s, dir, "lineitem").where(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("vid"),
          struct(col("l_linenumber"),
            (MetricColumns.fixedPointLong(col("l_extendedprice"), 2) % 256)
              .cast(IntegerType).as("s")).as("fs"))
        .groupBy("vid").agg(sort_array(collect_list(col("fs"))).as("fs"))
      val media = seeds.as[(Long, Seq[(Int, Int)])].map { case (vid, fs) =>
        val frames = fs.map { case (_, seed) =>
          Multimodal.Codecs.grayBmp(9, 8, (x, y) =>
            (((seed.toLong * 72 + y * 9 + x + 1) * 2654435761L) % 256).toInt)
        }
        Multimodal.MediaRow(vid, Multimodal.Video.pack(frames), "video/gvid")
      }.toDF()
      Multimodal.shotBoundaries(s, media, maxHamming = 20)
        .select(col("id").as("video_id"), col("frame_idx"), col("hamming_prev"),
          col("is_boundary"), col("shot_id"))
        .orderBy("video_id", "frame_idx")
    },

    "q_gap_fill" -> ((s, dir) =>
      // per-type daily LOCF grid: the gap repair every trend/anomaly
      // operator assumes ("no row" ≠ "no change"); epoch-aligned ticks,
      // last-observation-per-tick, carry across empty days
      Windows.gapFill(t(s, dir, "events"), "event_type", "ts", "value", 86400)
        .orderBy("key", "grid_ts")),

    "q_window_events" -> ((s, dir) =>
      Windows.tumbling(t(s, dir, "events"), "ts", "event_type", "value", "1 hour")
        .orderBy("window_start", "event_type")),

    "q_ohlc" -> ((s, dir) =>
      // daily OHLC bars per event type: total-order open/close selection
      // (ts, then value on exact-ts ties), decimal-exact sums, one
      // (key, window) shuffle — the variance-preserving downsample
      Windows.ohlcBars(t(s, dir, "events"), "event_type", "ts", "value",
        windowSeconds = 86400)
        .orderBy("key", "window_start")),

    "q_km" -> { (s, dir) =>
      // censoring-aware user-lifetime survival: duration = active days
      // (last − first event), censored when the user was still active in
      // the corpus's final days (last event ≥ 2024-01-28); cumulative
      // product as an exact pico fixed-point ln sum
      val users = t(s, dir, "events").groupBy("user_id").agg(
        expr("unix_micros(min(ts))").as("f"),
        expr("unix_micros(max(ts))").as("l"))
      val lifetimes = users.select(
        expr("(l - f) div 86400000000L").as("dur"),
        (col("l") < lit(1706400000000000L)).as("observed"))
      Events.kaplanMeier(lifetimes, "dur", col("observed")).orderBy("t")
    },

    "q_na" -> { (s, dir) =>
      // Nelson-Aalen cumulative hazard on q_km's lifetimes: the additive
      // estimator hazard-ratio models fit against, with the Breslow
      // survival for KM comparison; exact pico fixed-point increments
      val users = t(s, dir, "events").groupBy("user_id").agg(
        expr("unix_micros(min(ts))").as("f"),
        expr("unix_micros(max(ts))").as("l"))
      val lifetimes = users.select(
        expr("(l - f) div 86400000000L").as("dur"),
        (col("l") < lit(1706400000000000L)).as("observed"))
      Events.nelsonAalen(lifetimes, "dur", col("observed")).orderBy("t")
    },

    "q_vwap" -> { (s, dir) =>
      // volume-weighted daily price per event type (volume = the
      // deterministic 1+id%10 tick size): the downsample q_ohlc's
      // tick-count mean misrepresents under uneven volume; exact
      // decimal Σpw/Σw, one (key, window) shuffle
      val ev = t(s, dir, "events")
        .withColumn("vol", lit(1L) + col("event_id") % 10L)
      Windows.vwapBars(ev, "event_type", "ts", "value", "vol",
        windowSeconds = 86400)
        .orderBy("key", "window_start")
    },

    "q_stickiness" -> { (s, dir) =>
      // DAU/MAU engagement per event type and month: one
      // distinct-ification feeds both the daily rollup and the monthly
      // distinct; exact counts, one ratio tree
      Events.stickiness(t(s, dir, "events"), "ts", "user_id",
        Seq("event_type"))
        .orderBy("event_type", "month")
    },

    "q_attribution" -> { (s, dir) =>
      // last/first-touch attribution: every purchase attributed to the
      // click/view touches in its 6-hour lookback (total-order tie rule);
      // direct conversions stay in the output with null attribution
      Events.attribution(t(s, dir, "events"), "ts", "user_id", "event_type",
        "event_id", Seq("click", "view"), "purchase", lookbackSec = 21600)
        .orderBy("conv_id")
    },

    "q_basket_rules" -> { (s, dir) =>
      // "orders containing X also contain Y": top-100 directed pair rules
      // by lift over order baskets (items = partkey mod 100); exact count
      // ratios, hot-basket cap part of the definition
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("basket"),
        (col("l_partkey") % 100).as("item"))
      Events.basketRules(li, "basket", "item", minPairCount = 2L, topK = 100)
    },

    "q_logrank" -> { (s, dir) =>
      // are even- and odd-id users' lifetime curves the same? the
      // censoring-aware curve comparison (a lifetime t-test is biased the
      // moment anything is censored) — pico fixed-point O−E and V sums
      val users = t(s, dir, "events").groupBy("user_id").agg(
        expr("unix_micros(min(ts))").as("f"),
        expr("unix_micros(max(ts))").as("l"))
      val lifetimes = users.select(col("user_id"),
        expr("(l - f) div 86400000000L").as("dur"),
        (col("l") < lit(1706400000000000L)).as("observed"))
      Events.logRank(lifetimes.where(col("user_id") % 2 === 0),
        lifetimes.where(col("user_id") % 2 =!= 0), "dur", col("observed"))
    },

    "q_rfm" -> { (s, dir) =>
      // classic per-customer RFM segmentation over orders: exact
      // tie-honest quintiles via integer div over cumulative counts — no
      // ntile, tied customers always share a score
      Events.rfmScores(t(s, dir, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice", asOfUs = 999302400000000L) // 2001-09-01T00:00:00Z
        .orderBy("entity")
    },

    "q_window_sliding" -> ((s, dir) =>
      // 1-hour windows every 15 minutes: each event lands in exactly 4
      // windows; the oracle reproduces the epoch-aligned slide grid
      Windows.sliding(t(s, dir, "events"), "ts", "event_type", "value",
        "1 hour", "15 minutes")
        .orderBy("window_start", "event_type")),

    "q_sessionize" -> ((s, dir) =>
      Windows.sessionizeBatch(t(s, dir, "events"), "ts", "user_id", gapSeconds = 1800)
        .orderBy("user_id", "session_id")),

    "q_stream_quality" -> { (s, dir) =>
      val cols = Seq(
        "value" -> ColumnConfig(validMin = Some(0.0), validMax = Some(150.0)),
        "event_type" -> ColumnConfig(validValues = Seq("click", "view", "purchase", "signup")))
      graft.streaming.StreamingMonitor.qualityByWindow(t(s, dir, "events"), "ts", "1 hour", cols)
        .orderBy("window_start")
    },

    "q_quality_by_dim" -> { (s, dir) =>
      val cols = Seq("c_acctbal" -> ColumnConfig(validMin = Some(0.0)))
      graft.streaming.StreamingMonitor.qualityByDimension(t(s, dir, "customer"), "c_mktsegment", cols)
        .orderBy("c_mktsegment")
    },

  )

  val oracleSql: Map[String, String] = Map(
    "q_ohlc" ->
      """WITH r AS (SELECT event_type AS key, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |                  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                       ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS v
        |           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT key, us - (us % 86400000000) AS g, us, v FROM r),
        |w1 AS (SELECT key, g, min(us) AS us0, max(us) AS us1, max(v) AS high, min(v) AS low,
        |              CAST(count(*) AS BIGINT) AS n_ticks, sum(CAST(v AS HUGEINT)) AS sv
        |       FROM g GROUP BY 1, 2),
        |oc AS (SELECT g.key, g.g, min(CASE WHEN g.us = w1.us0 THEN g.v END) AS open,
        |              max(CASE WHEN g.us = w1.us1 THEN g.v END) AS close
        |       FROM g JOIN w1 USING (key, g) GROUP BY 1, 2)
        |SELECT w1.key, make_timestamp(w1.g) AS window_start, oc.open, w1.high, w1.low, oc.close,
        |       w1.n_ticks, CAST(w1.sv AS BIGINT) AS sum_fx,
        |       CAST(w1.sv AS DOUBLE) / CAST(w1.n_ticks AS DOUBLE) AS mean
        |FROM w1 JOIN oc USING (key, g)
        |ORDER BY key, window_start""".stripMargin,

    "q_km" ->
      """WITH u AS (SELECT user_id, epoch_us(min(CAST(ts AS TIMESTAMP))) AS f,
        |                  epoch_us(max(CAST(ts AS TIMESTAMP))) AS l
        |           FROM events GROUP BY user_id),
        |s AS (SELECT (l - f) // 86400000000 AS t, l < 1706400000000000 AS e FROM u),
        |c AS (SELECT t, CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |             CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
        |      FROM s GROUP BY t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM s),
        |k AS (SELECT t, d, c,
        |             CAST(n.nn - (sum(d + c) OVER (ORDER BY t) - (d + c)) AS BIGINT) AS n_risk
        |      FROM c, n),
        |r AS (SELECT t, d, c, n_risk,
        |             CASE WHEN d > 0 AND d < n_risk THEN
        |               CAST(CASE WHEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) >= 0
        |                    THEN floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1000000000000.0 + 0.5)
        |                    ELSE -floor(-ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1000000000000.0 + 0.5)
        |               END AS BIGINT) ELSE 0 END AS term,
        |             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead
        |      FROM k),
        |f AS (SELECT t, n_risk, d, c,
        |             CAST(sum(term) OVER (ORDER BY t) AS BIGINT) AS lnfx,
        |             CAST(sum(dead) OVER (ORDER BY t) AS BIGINT) AS dd
        |      FROM r)
        |SELECT t, n_risk, d AS events, c AS censored,
        |       CASE WHEN dd >= 1 THEN NULL ELSE lnfx END AS ln_s_fx,
        |       CASE WHEN dd >= 1 THEN 0.0
        |            ELSE exp(CAST(lnfx AS DOUBLE) / 1000000000000.0) END AS survival
        |FROM f ORDER BY t""".stripMargin,

    "q_na" ->
      """WITH u AS (SELECT user_id, epoch_us(min(CAST(ts AS TIMESTAMP))) AS f,
        |                  epoch_us(max(CAST(ts AS TIMESTAMP))) AS l
        |           FROM events GROUP BY user_id),
        |s AS (SELECT (l - f) // 86400000000 AS t, l < 1706400000000000 AS e FROM u),
        |c AS (SELECT t, CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |             CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS c
        |      FROM s GROUP BY t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM s),
        |k AS (SELECT t, d, c,
        |             CAST(n.nn - (sum(d + c) OVER (ORDER BY t) - (d + c)) AS BIGINT) AS n_risk
        |      FROM c, n),
        |r AS (SELECT t, d, c, n_risk,
        |             CASE WHEN d > 0 THEN
        |               CAST(CASE WHEN CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) >= 0
        |                    THEN floor(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1000000000000.0 + 0.5)
        |                    ELSE -floor(-(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1000000000000.0 + 0.5)
        |               END AS BIGINT) ELSE 0 END AS term
        |      FROM k),
        |f AS (SELECT t, n_risk, d, c,
        |             CAST(sum(term) OVER (ORDER BY t) AS BIGINT) AS h_fx
        |      FROM r)
        |SELECT t, n_risk, d AS events, c AS censored, h_fx,
        |       CAST(h_fx AS DOUBLE) / 1000000000000.0 AS h,
        |       exp(-(CAST(h_fx AS DOUBLE)) / 1000000000000.0) AS s_breslow
        |FROM f ORDER BY t""".stripMargin,

    "q_vwap" ->
      """WITH r AS (SELECT event_type AS key, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |                  CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                       ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT) AS p,
        |                  1 + event_id % 10 AS w
        |           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT key, us - (us % 86400000000) AS g, p, w FROM r),
        |a AS (SELECT key, g, CAST(count(*) AS BIGINT) AS n_ticks,
        |             sum(CAST(p AS HUGEINT) * CAST(w AS HUGEINT)) AS spv,
        |             sum(CAST(w AS HUGEINT)) AS sw
        |      FROM g GROUP BY 1, 2)
        |SELECT key, make_timestamp(g) AS window_start, n_ticks,
        |       CAST(spv AS BIGINT) AS sum_pv, CAST(sw AS BIGINT) AS sum_vol,
        |       CASE WHEN sw > 0 THEN CAST(spv AS DOUBLE) / CAST(sw AS DOUBLE) / 100.0 END AS vwap
        |FROM a ORDER BY key, window_start""".stripMargin,

    "q_stickiness" ->
      """WITH b AS (SELECT DISTINCT event_type,
        |                  CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS month,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, user_id AS u
        |           FROM events WHERE user_id IS NOT NULL),
        |d AS (SELECT event_type, month, day, CAST(count(*) AS BIGINT) AS dau
        |      FROM b GROUP BY 1, 2, 3),
        |md AS (SELECT event_type, month, CAST(count(*) AS BIGINT) AS days_active,
        |              CAST(sum(dau) AS BIGINT) AS sum_dau FROM d GROUP BY 1, 2),
        |mu AS (SELECT event_type, month, CAST(count(*) AS BIGINT) AS mau
        |       FROM (SELECT DISTINCT event_type, month, u FROM b) GROUP BY 1, 2)
        |SELECT md.event_type, md.month, days_active, sum_dau, mau,
        |       CAST(sum_dau AS DOUBLE) / CAST(days_active AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
        |FROM md JOIN mu USING (event_type, month)
        |ORDER BY event_type, month""".stripMargin,

    "q_attribution" ->
      """WITH b AS (SELECT user_id AS u, event_id AS id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type AS typ
        |           FROM events),
        |cv AS (SELECT u, id AS conv_id, us AS conv_us FROM b WHERE typ = 'purchase'),
        |tc AS (SELECT u, us AS t_us, id AS t_id, typ AS t_typ FROM b
        |       WHERE typ IN ('click', 'view')),
        |j AS (SELECT cv.conv_id, tc.t_us, tc.t_id, tc.t_typ
        |      FROM cv JOIN tc ON tc.u = cv.u AND tc.t_us <= cv.conv_us
        |                     AND tc.t_us > cv.conv_us - 21600000000),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY conv_id ORDER BY t_us DESC, t_id DESC) AS rl,
        |        row_number() OVER (PARTITION BY conv_id ORDER BY t_us ASC, t_id ASC) AS rf,
        |        count(*) OVER (PARTITION BY conv_id) AS nt
        |      FROM j),
        |lastt AS (SELECT conv_id, t_typ AS last_touch_type FROM r WHERE rl = 1),
        |firstt AS (SELECT conv_id, t_typ AS first_touch_type, nt FROM r WHERE rf = 1)
        |SELECT cv.u AS "user", cv.conv_id, make_timestamp(cv.conv_us) AS conv_ts,
        |       lastt.last_touch_type, firstt.first_touch_type,
        |       CAST(coalesce(firstt.nt, 0) AS BIGINT) AS n_touches
        |FROM cv LEFT JOIN lastt USING (conv_id) LEFT JOIN firstt USING (conv_id)
        |ORDER BY conv_id""".stripMargin,

    "q_basket_rules" ->
      """WITH ki AS (SELECT DISTINCT l_orderkey AS k, l_partkey % 100 AS i FROM lineitem),
        |hot AS (SELECT k FROM (SELECT k, count(*) AS f FROM ki GROUP BY k) WHERE f > 1000),
        |cap AS (SELECT * FROM ki WHERE k NOT IN (SELECT k FROM hot)),
        |n AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n FROM cap),
        |it AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM cap GROUP BY i),
        |p AS (SELECT a.i AS a, b.i AS b, CAST(count(*) AS BIGINT) AS nab
        |      FROM cap a JOIN cap b ON a.k = b.k AND a.i < b.i
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |d AS (SELECT a AS antecedent, b AS consequent, nab FROM p
        |      UNION ALL SELECT b, a, nab FROM p),
        |j AS (SELECT d.antecedent, d.consequent, d.nab, ia.ni AS na, ib.ni AS nb
        |      FROM d JOIN it ia ON ia.i = d.antecedent JOIN it ib ON ib.i = d.consequent)
        |SELECT antecedent, consequent, nab, na, nb,
        |       CAST(nab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
        |       CAST(nab AS DOUBLE) / CAST(na AS DOUBLE) AS confidence,
        |       CAST(nab AS DOUBLE) * CAST(n.n AS DOUBLE)
        |         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS lift
        |FROM j, n
        |ORDER BY lift DESC, antecedent, consequent LIMIT 100""".stripMargin,

    "q_logrank" ->
      """WITH u AS (SELECT user_id, epoch_us(min(CAST(ts AS TIMESTAMP))) AS f,
        |                  epoch_us(max(CAST(ts AS TIMESTAMP))) AS l
        |           FROM events GROUP BY user_id),
        |s AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 2 END AS sd,
        |             (l - f) // 86400000000 AS t, l < 1706400000000000 AS e FROM u),
        |c AS (SELECT t,
        |             CAST(sum(CASE WHEN sd = 1 AND e THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |             CAST(sum(CASE WHEN sd = 1 AND NOT e THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |             CAST(sum(CASE WHEN sd = 2 AND e THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        |             CAST(sum(CASE WHEN sd = 2 AND NOT e THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |      FROM s GROUP BY t),
        |n AS (SELECT CAST(sum(d1 + c1) AS BIGINT) AS tn1, CAST(sum(d2 + c2) AS BIGINT) AS tn2,
        |             CAST(sum(d1) AS BIGINT) AS te1, CAST(sum(d2) AS BIGINT) AS te2 FROM c),
        |k AS (SELECT t, d1, d2,
        |             CAST(n.tn1 - (sum(d1 + c1) OVER (ORDER BY t) - (d1 + c1)) AS BIGINT) AS r1,
        |             CAST(n.tn2 - (sum(d2 + c2) OVER (ORDER BY t) - (d2 + c2)) AS BIGINT) AS r2
        |      FROM c, n),
        |r AS (SELECT
        |        CASE WHEN d1 + d2 > 0 THEN
        |          CAST(CASE WHEN CAST(d1 AS DOUBLE) - CAST(r1 AS DOUBLE) * CAST(d1 + d2 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE) >= 0
        |               THEN floor((CAST(d1 AS DOUBLE) - CAST(r1 AS DOUBLE) * CAST(d1 + d2 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE)) * 1000000000000.0 + 0.5)
        |               ELSE -floor(-(CAST(d1 AS DOUBLE) - CAST(r1 AS DOUBLE) * CAST(d1 + d2 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE)) * 1000000000000.0 + 0.5)
        |          END AS BIGINT) ELSE 0 END AS oe,
        |        CASE WHEN d1 + d2 > 0 AND r1 + r2 > 1 THEN
        |          CAST(floor((CAST(r1 AS DOUBLE) * CAST(r2 AS DOUBLE) * CAST(d1 + d2 AS DOUBLE)
        |                      * (CAST(r1 + r2 AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
        |                      / (CAST(r1 + r2 AS DOUBLE) * CAST(r1 + r2 AS DOUBLE) * (CAST(r1 + r2 AS DOUBLE) - 1.0)))
        |                     * 1000000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS v
        |      FROM k),
        |f AS (SELECT CAST(sum(oe) AS BIGINT) AS oe_fx, CAST(sum(v) AS BIGINT) AS var_fx FROM r)
        |SELECT n.tn1 AS n_ref, n.tn2 AS n_cur, n.te1 AS events_ref, n.te2 AS events_cur,
        |       f.oe_fx, f.var_fx,
        |       CASE WHEN CAST(f.var_fx AS DOUBLE) > 0.0
        |            THEN CAST(f.oe_fx AS DOUBLE) * CAST(f.oe_fx AS DOUBLE)
        |                 / (CAST(f.var_fx AS DOUBLE) * 1000000000000.0) END AS chi2
        |FROM f, n""".stripMargin,

    "q_rfm" ->
      """WITH o AS (SELECT o_custkey AS entity, epoch_us(o_orderdate) AS us,
        |                  CAST(CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice * 100.0 + 0.5)
        |                       ELSE -floor(-o_totalprice * 100.0 + 0.5) END AS BIGINT) AS a
        |           FROM orders
        |           WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
        |b AS (SELECT entity, (999302400000000 - max(us)) // 86400000000 AS recency_days,
        |             CAST(count(*) AS BIGINT) AS frequency,
        |             CAST(sum(CAST(a AS HUGEINT)) AS BIGINT) AS monetary_fx
        |      FROM o GROUP BY entity),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b),
        |rs AS (SELECT -v AS recency_days, ((cum - c) * 5) // n.nn + 1 AS r_score
        |       FROM (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM
        |             (SELECT -recency_days AS v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1)), n),
        |fs AS (SELECT v AS frequency, ((cum - c) * 5) // n.nn + 1 AS f_score
        |       FROM (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM
        |             (SELECT frequency AS v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1)), n),
        |ms AS (SELECT v AS monetary_fx, ((cum - c) * 5) // n.nn + 1 AS m_score
        |       FROM (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM
        |             (SELECT monetary_fx AS v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1)), n)
        |SELECT b.entity, b.recency_days, b.frequency, b.monetary_fx,
        |       CAST(rs.r_score AS BIGINT) AS r_score, CAST(fs.f_score AS BIGINT) AS f_score,
        |       CAST(ms.m_score AS BIGINT) AS m_score,
        |       CAST(rs.r_score * 100 + fs.f_score * 10 + ms.m_score AS BIGINT) AS rfm
        |FROM b JOIN rs USING (recency_days) JOIN fs USING (frequency) JOIN ms USING (monetary_fx)
        |ORDER BY entity""".stripMargin,

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1
        |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id AS u, min(s1.t1) AS t1, min(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.u = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id AS u, min(s2.t1) AS t1, min(e.ts) AS t3
        |       FROM events e JOIN s2 ON s2.u = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s2.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS stage_index, 'signup' AS stage, count(*) AS users FROM s1
        |  UNION ALL
        |  SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY stage_index""".stripMargin,

    "q_funnel_gaps" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t1
        |            FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id AS u, min(s1.t1) AS t1, min(e.ts) AS t2
        |       FROM events e JOIN s1 ON s1.u = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id AS u, min(s2.t1) AS t1, min(e.ts) AS t3
        |       FROM events e JOIN s2 ON s2.u = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |         AND CAST(floor(epoch(e.ts)) AS BIGINT) - CAST(floor(epoch(s2.t1)) AS BIGINT) <= 604800
        |       GROUP BY e.user_id),
        |g1 AS (SELECT CAST(floor(epoch(s2.t2)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) AS gap
        |       FROM s2 JOIN s1 ON s1.u = s2.u),
        |g2 AS (SELECT CAST(floor(epoch(s3.t3)) AS BIGINT) - CAST(floor(epoch(s2.t2)) AS BIGINT) AS gap
        |       FROM s3 JOIN s2 ON s2.u = s3.u)
        |SELECT * FROM (
        |  SELECT 1 AS stage_index, 'signup->click' AS transition, CAST(count(*) AS BIGINT) AS users,
        |         quantile_cont(gap, 0.25) AS p25, quantile_cont(gap, 0.5) AS p50, quantile_cont(gap, 0.75) AS p75,
        |         CASE WHEN count(*) > 0 THEN CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS avg_sec
        |  FROM g1
        |  UNION ALL
        |  SELECT 2, 'click->purchase', CAST(count(*) AS BIGINT),
        |         quantile_cont(gap, 0.25), quantile_cont(gap, 0.5), quantile_cont(gap, 0.75),
        |         CASE WHEN count(*) > 0 THEN CAST(CAST(sum(gap) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) END
        |  FROM g2)
        |ORDER BY stage_index""".stripMargin,

    "q_cohort" ->
      """WITH ev AS (SELECT user_id AS u,
        |                   CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS d
        |            FROM events),
        |f AS (SELECT u, min(d) AS d0 FROM ev GROUP BY u)
        |SELECT CAST(floor(d0 / 7.0) AS BIGINT) AS cohort_week,
        |       CAST(floor((d - d0) / 7.0) AS BIGINT) AS week_offset,
        |       count(DISTINCT ev.u) AS users
        |FROM ev JOIN f ON f.u = ev.u
        |WHERE CAST(floor((d - d0) / 7.0) AS BIGINT) <= 8
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                      ORDER BY ts ASC, event_id ASC) AS next_type
        |           FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |FROM o WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    "q_multimodal" ->
      """SELECT doc_id AS id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
        |FROM documents ORDER BY id""".stripMargin,

    // dHash bit (y, x) of a frame with pixel p(x,y) = ((s*72+y*9+x+1)*K)%256
    // is p(x+1,y) > p(x,y) (the 9x8 frame makes the grid sample 1:1); the
    // Hamming distance between consecutive frames is the count of the 64
    // grid cells whose comparison flips between seeds
    "q_video_shots" ->
      """WITH f AS (
        |  SELECT l_orderkey AS vid, l_linenumber AS fi,
        |         CAST(CASE WHEN l_extendedprice >= 0 THEN floor(l_extendedprice * 100.0 + 0.5)
        |                   ELSE -floor(-l_extendedprice * 100.0 + 0.5) END AS BIGINT) % 256 AS s
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |o AS (SELECT vid, s,
        |             row_number() OVER (PARTITION BY vid ORDER BY fi, s) - 1 AS idx,
        |             lag(s) OVER (PARTITION BY vid ORDER BY fi, s) AS sp
        |      FROM f),
        |g AS (SELECT y.y AS y, x.x AS x
        |      FROM (SELECT unnest(range(8)) AS y) y, (SELECT unnest(range(8)) AS x) x),
        |h AS (SELECT o.vid, o.idx, max(o.sp IS NULL) AS frst,
        |        CAST(sum(CASE WHEN o.sp IS NOT NULL AND
        |          ((((o.s  * 72 + g.y * 9 + g.x + 2) * 2654435761) % 256) >
        |           (((o.s  * 72 + g.y * 9 + g.x + 1) * 2654435761) % 256)) !=
        |          ((((o.sp * 72 + g.y * 9 + g.x + 2) * 2654435761) % 256) >
        |           (((o.sp * 72 + g.y * 9 + g.x + 1) * 2654435761) % 256))
        |          THEN 1 ELSE 0 END) AS INT) AS ham
        |      FROM o CROSS JOIN g GROUP BY o.vid, o.idx)
        |SELECT vid AS video_id, CAST(idx AS INT) AS frame_idx,
        |  CASE WHEN frst THEN -1 ELSE ham END AS hamming_prev,
        |  (NOT frst AND ham > 20) AS is_boundary,
        |  CAST(sum(CASE WHEN NOT frst AND ham > 20 THEN 1 ELSE 0 END)
        |       OVER (PARTITION BY vid ORDER BY idx
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shot_id
        |FROM h ORDER BY video_id, frame_idx""".stripMargin,

    "q_gap_fill" ->
      """WITH o AS (SELECT event_type AS key, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value AS v
        |           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |b AS (SELECT key, us - us % 86400000000 AS g, us, v,
        |             row_number() OVER (PARTITION BY key, us - us % 86400000000
        |                                ORDER BY us DESC, v DESC) AS rn
        |      FROM o),
        |bv AS (SELECT key, g, v AS bv FROM b WHERE rn = 1),
        |sp AS (SELECT key, min(g) AS g0, max(g) AS g1 FROM bv GROUP BY key),
        |grid AS (SELECT key, unnest(range(g0, g1 + 1, 86400000000)) AS g FROM sp),
        |f AS (SELECT grid.key, grid.g, bv.bv FROM grid LEFT JOIN bv USING (key, g))
        |SELECT key, make_timestamp(g) AS grid_ts,
        |       last_value(bv IGNORE NULLS) OVER (PARTITION BY key ORDER BY g
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |       bv IS NOT NULL AS observed
        |FROM f ORDER BY key, grid_ts""".stripMargin,

    "q_window_events" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                          ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_sliding" ->
      """WITH g AS (
        |  SELECT date_trunc('hour', ts) + to_minutes(15 * (EXTRACT(minute FROM ts) // 15)) AS grid,
        |         event_type, value
        |  FROM events),
        |e AS (SELECT grid - to_minutes(15 * s.i) AS window_start, event_type, value
        |      FROM g CROSS JOIN (SELECT unnest(range(4)) AS i) s)
        |SELECT window_start, event_type, count(*) AS n_events,
        |       CAST(sum(CAST(CASE WHEN value >= 0 THEN floor(value * 100.0 + 0.5)
        |                          ELSE -floor(-value * 100.0 + 0.5) END AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_quality" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       count(*) AS row_count,
        |       count(*) FILTER (WHERE value IS NULL) AS value_missing,
        |       count(*) FILTER (WHERE value IS NOT NULL
        |             AND NOT (CAST(value AS DOUBLE) >= 0.0 AND CAST(value AS DOUBLE) <= 150.0)) AS value_invalid,
        |       count(*) FILTER (WHERE event_type IS NULL) AS event_type_missing,
        |       count(*) FILTER (WHERE event_type IS NOT NULL
        |             AND event_type NOT IN ('click','view','purchase','signup')) AS event_type_invalid
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_quality_by_dim" ->
      """SELECT c_mktsegment,
        |       count(*) AS row_count,
        |       count(*) FILTER (WHERE c_acctbal IS NULL) AS c_acctbal_missing,
        |       count(*) FILTER (WHERE c_acctbal IS NOT NULL
        |             AND NOT (CAST(c_acctbal AS DOUBLE) >= 0.0)) AS c_acctbal_invalid
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (
        |  SELECT user_id, ts,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM x)
        |SELECT user_id, session_id, count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

  )
}
