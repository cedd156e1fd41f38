package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H headliners, joins (as-of/range/fuzzy/ER), layout and CDC. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object RelationalQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ==================================================================
    // Analytics headliners (TPC-H shapes)
    // ==================================================================
    "q1_agg" -> { (s, dir) =>
      // FIXED-POINT (cents) arithmetic: the 2-decimal money columns become
      // exact longs, so every sum is an order-independent primitive-long
      // aggregate inside codegen — 2.5-3x faster than decimal sums, still
      // bit-identical to the oracle (identical derivation trees). Products
      // stay well under 2^63 (price_c * disc_c * tax_c ~ 1e11/row).
      val qtyC = round(col("l_quantity") * 100.0).cast(LongType)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val taxC = round(col("l_tax") * 100.0).cast(LongType)
      val n = count(lit(1))
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(qtyC).cast(DoubleType) / 100.0).as("sum_qty"),
          (sum(priceC).cast(DoubleType) / 100.0).as("sum_base_price"),
          (sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("sum_disc_price"),
          (sum(priceC * (lit(100L) - discC) * (lit(100L) + taxC)).cast(DoubleType) / 1000000.0).as("sum_charge"),
          (sum(qtyC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_qty"),
          (sum(priceC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_price"),
          (sum(discC).cast(DoubleType) / 100.0 / n.cast(DoubleType)).as("avg_disc"),
          n.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q3_topk" -> { (s, dir) =>
      // fixed-point revenue (see q1_agg)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").where(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem").where(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg((sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    },

    "q4_semijoin" -> { (s, dir) =>
      // TPC-H Q4 shape: order-priority counts over orders with at least one
      // late lineitem — the EXISTS form compiles to a left_semi join (no
      // payload duplication, AQE-broadcastable filter side)
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("o_orderdate") < lit("1996-04-01").cast(TimestampType))
      val late = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-06-01").cast(TimestampType))
        .select(col("l_orderkey"))
      o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    "q13_distribution" -> { (s, dir) =>
      // TPC-H Q13 shape: customer order-count distribution via LEFT OUTER
      // join + two-level aggregation (the classic histogram-of-groups)
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    "q5_join" -> { (s, dir) =>
      // fixed-point revenue (see q1_agg)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      val r = t(s, dir, "region").where(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg((sum(priceC * (lit(100L) - discC)).cast(DoubleType) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    },

    "q6_filter" -> { (s, dir) =>
      // TPC-H Q6 shape: pure filter + global agg — every predicate must land
      // in the scan's DataFilters; fixed-point revenue (see q1_agg)
      val priceC = round(col("l_extendedprice") * 100.0).cast(LongType)
      val discC = round(col("l_discount") * 100.0).cast(LongType)
      // predicates on the RAW columns so they reach the parquet scan's
      // DataFilters (a predicate on round(col*100) cannot be pushed); the
      // midpoint thresholds are exactly the HALF_UP rounding boundaries, so
      // the selected rows are identical to the cents formulation. Cents
      // arithmetic appears only in the aggregate.
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
               col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
               col("l_discount") >= 0.045 && col("l_discount") < 0.075 &&
               col("l_quantity") < 23.995)
        .agg((sum(priceC * discC).cast(DoubleType) / 10000.0).as("revenue"))
    },

    "q_skew_agg" -> { (s, dir) =>
      // salted two-phase aggregation; oracle = the PLAIN group-by (the whole
      // point: salting must be result-invariant)
      Skew.saltedAggregate(t(s, dir, "events"), Seq("event_type"), 16,
          Seq("n_events" -> count(lit(1)),
              "value_cents" -> sum(round(col("value") * 100.0).cast(LongType))),
          n => sum(col(n)))
        .select(col("event_type"), col("n_events").cast(LongType).as("n_events"),
          (col("value_cents").cast(DoubleType) / 100.0).as("sum_value"))
        .orderBy("event_type")
    },

    // ==================================================================
    // Training-data pipeline operators
    // ==================================================================
    "q_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      Joins.asOf(errors, clicks, Seq("user_id"), "ts", "click_ts", Seq("click_ts"))
        .select(col("event_id"), col("user_id"), col("asof_click_ts"))
        .orderBy("event_id")
    },

    "q_asof_forward" -> { (s, dir) =>
      // FORWARD as-of with tolerance: the next view within 30 minutes of
      // each error ("did the user come back?") — same one-shuffle window
      // scan as q_asof_join, descending, over-age matches null out
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"))
      Joins.asOf(errors, views, Seq("user_id"), "ts", "view_ts", Seq("view_ts"),
          toleranceMicros = Some(30L * 60 * 1000000), forward = true)
        .select(col("event_id"), col("user_id"), col("asof_view_ts"))
        .orderBy("event_id")
    },

    "q_range_join" -> { (s, dir) =>
      // point-in-range via domain bucketization (RangeJoin.pointInRange):
      // overlapping price bands derived from nation (each covers 9000, strided
      // 2500 — a price can fall in up to 4 bands); the range predicate runs as
      // an EQUI-join on the 2048-wide bucket id, never a nested loop
      val bands = t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("band"),
        (lit(900.0) + col("n_nationkey") * 2500.0).as("lo"),
        (lit(900.0) + col("n_nationkey") * 2500.0 + 9000.0).as("hi"))
      RangeJoin.pointInRange(
          t(s, dir, "lineitem").select("l_extendedprice", "l_quantity"),
          col("l_extendedprice"), bands, "lo", "hi", bucketWidth = 2048.0)
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100.0 + 0.5).cast(LongType)).as("qty_cents"))
        .orderBy("band")
    },

    "q_interval_join" -> { (s, dir) =>
      // interval-overlap self-join per part: lineitems whose 7-day shipping
      // windows overlap. Equi key (partkey) + 7-day time bucket; the pair
      // survives only in its first common bucket (row-local filter — no
      // dedup shuffle). Quadratic only within (part, week) cells.
      val l = t(s, dir, "lineitem").select(
        col("l_partkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        datediff(col("l_shipdate"), lit("1970-01-01")).cast(LongType).as("s"))
        .withColumn("e", col("s") + 7)
      // width 56 = 8x the interval: per-part cells are sparse (~0.08
      // items/day), so explosion factor dominates — swept in PLANS.md
      RangeJoin.intervalSelfJoin(l, Seq("l_partkey"), "s", "e", bucketWidth = 56.0)
        .where(col("id_a") < col("id_b"))
        .groupBy("l_partkey").agg(count(lit(1)).as("n_overlaps"))
        .orderBy("l_partkey")
    },

    "q_zorder" -> { (s, dir) =>
      // Morton interleave of (partkey, suppkey): per z-range bucket counts +
      // extrema prove the full bit-spread arithmetic; the layout operator
      // itself (range shuffle + in-partition sort) is plan/locality-asserted
      // in ZOrderSpec
      val z = ZOrder.interleave2(col("l_partkey"), col("l_suppkey"))
      t(s, dir, "lineitem").select(z.as("zv"))
        .groupBy(shiftright(col("zv"), 12).as("zbucket"))
        .agg(count(lit(1)).as("n"), min(col("zv")).as("z_min"), max(col("zv")).as("z_max"))
        .orderBy("zbucket")
    },

    "q_layout_audit" -> { (s, dir) =>
      // partition-grain manifest (keyed by l_returnflag as the partition
      // value) + per-predicate prunability report: one predicate entirely
      // below the domain (every partition prunable) and one inside it (none
      // prunable) — exact integer outputs, fully SQL-expressible
      val m = graft.ops.Manifest.partitionManifest(t(s, dir, "lineitem"),
        Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice"))
      graft.ops.Manifest.layoutAudit(m, Seq(
          ("l_quantity", -5.0, 0.5), ("l_quantity", 1.0, 10.0),
          ("l_extendedprice", 0.0, 2000.0)))
        .orderBy("predicate")
    },

    "q_balance" -> { (s, dir) =>
      // exact balanced-file assignment (distributed prefix rank div target)
      // over a (token-count, doc_id) composite layout key: every file gets
      // exactly 64 rows except the last remainder, contiguous in the key.
      // The physical writer (one file per id via aligned maxRecordsPerFile
      // cuts) is disk-asserted in BalanceSpec.
      val keyed = t(s, dir, "documents").select(
        (TextAnalysis.tokenCount(col("text")).cast(LongType) * lit(1000000L)
          + col("doc_id")).as("ord"))
      graft.ops.Balance.assignFiles(keyed, "ord", targetRows = 64)
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"), min("ord").as("ord_min"), max("ord").as("ord_max"))
        .orderBy("file_id")
    },

    "q_hilbert" -> { (s, dir) =>
      // native codegen'd Hilbert walk; the oracle re-runs the identical
      // quadrant-rotation state machine as a 16-step recursive CTE
      val h = ZOrder.hilbertIndex(col("l_partkey"), col("l_suppkey"), order = 16)
      t(s, dir, "lineitem").select(h.as("hv"))
        .groupBy(shiftright(col("hv"), 12).as("hbucket"))
        .agg(count(lit(1)).as("n"), min(col("hv")).as("h_min"), max(col("hv")).as("h_max"))
        .orderBy("hbucket")
    },

    "q_snapshot_diff" -> { (s, dir) =>
      // incremental-pipeline snapshot diff: old = docs not ≡0 mod 7,
      // new = docs not ≡0 mod 5 with every ≡0-mod-11 doc revised. The oracle
      // compares raw text; graft compares xxhash64 — identical output unless
      // the hash collides (it must not, and the gate would catch it)
      val docs = t(s, dir, "documents")
      val oldSnap = docs.where(col("doc_id") % 7 =!= 0).select("doc_id", "text")
      val newSnap = docs.where(col("doc_id") % 5 =!= 0).select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      Delta.snapshotDiff(oldSnap, newSnap, "doc_id", "text").orderBy("id")
    },

    "q_merge_upsert" -> { (s, dir) =>
      // CDC MERGE apply: every ≡0-mod-7 doc gets a delete at seq 1, every
      // ≡0-mod-5 doc an upsert (upper-cased text, lang 'xx') at seq 2 —
      // ≡0-mod-35 docs carry BOTH so latest-by-seq wins; all other docs
      // pass through untouched. Full oracle on the merged snapshot.
      val docs = t(s, dir, "documents")
      val changes = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit(1L).as("seq"), lit("D").as("op"),
          col("text"), col("lang"))
        .unionByName(docs.where(col("doc_id") % 5 === 0)
          .select(col("doc_id"), lit(2L).as("seq"), lit("U").as("op"),
            upper(col("text")).as("text"), lit("xx").as("lang")))
      Delta.applyChanges(docs, changes, "doc_id", "seq", "op",
          Seq("text", "lang"))
        .orderBy("doc_id")
    },

    "q_scd2" -> { (s, dir) =>
      // SCD type-2 history from a synthetic feed: every doc opens at seq 1;
      // ≡0-mod-4 docs re-upsert the IDENTICAL payload at seq 2 (must
      // collapse), ≡1-mod-4 a CHANGED payload (new version); ≡0-mod-6 docs
      // delete at seq 3 (closes the version); ≡0-mod-12 re-open at seq 4.
      // Exercises collapse, close, gap and re-open in one history.
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      def ev(f: Column, seq: Long, op: String, lang: Column, nc: Column) =
        base.where(f).select(col("doc_id"), lit(seq).as("seq"),
          lit(op).as("op"), lang.as("lang"), nc.as("n_chars"))
      val changes = ev(lit(true), 1L, "U", col("lang"), col("n_chars"))
        .unionByName(ev(col("doc_id") % 4 === 0, 2L, "U", col("lang"), col("n_chars")))
        .unionByName(ev(col("doc_id") % 4 === 1, 2L, "U", col("lang"),
          col("n_chars") + 10L))
        .unionByName(ev(col("doc_id") % 6 === 0, 3L, "D",
          lit(null).cast(StringType), lit(null).cast(LongType)))
        .unionByName(ev(col("doc_id") % 12 === 0, 4L, "U", lit("re"),
          col("n_chars")))
      Delta.scd2(changes, "doc_id", "seq", "op", Seq("lang", "n_chars"))
        .withColumn("version", col("version").cast(LongType))
        .orderBy("doc_id", "version")
    },

    "q_stream_join" -> { (s, dir) =>
      // click→view attribution through StreamingJoin.intervalJoin in BATCH
      // mode — the identical code path the stream-stream watermarked join
      // runs (streaming parity is spec'd in StreamingSpec); view within the
      // 24 hours before each same-user click.
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
          col("user_id"))
      val views = ev.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
      graft.streaming.StreamingJoin.intervalJoin(clicks, views, "user_id",
          "click_ts", "view_ts", lowerSec = -86400, upperSec = 0)
        .select("click_id", "view_id", "user_id")
        .orderBy("click_id", "view_id")
    },

    "q_join_cardinality" -> { (s, dir) =>
      // pre-flight exact join sizing: clicks ⋈ views on user_id — total
      // output rows, shared keys, hottest key's contribution, from the
      // skinny count frames only (payload never moves)
      val ev = t(s, dir, "events")
      // Operator keeps DECIMAL(38,0) internally (hot-key squares overflow
      // BIGINT long before the join); the GATE casts to BIGINT because the
      // driver's hasher canonicalizes wide decimals differently from the
      // oracle engine (third DECIMAL-gate incident — see selfcheck lint).
      // Values fit comfortably in BIGINT at every gate SF.
      Skew.joinCardinality(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "view"), Seq("user_id"))
        .select(col("join_rows").cast("bigint").as("join_rows"),
          col("shared_keys"),
          col("max_key_rows").cast("bigint").as("max_key_rows"))
    },

    "q_rollup" -> { (s, dir) =>
      // hierarchical totals in one pass (Expand, not N aggregates)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          MetricColumns.fixedPointLong(col("l_quantity"), 2).as("qc"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("qc")).as("qty_cents"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "q_pivot" -> { (s, dir) =>
      // pivot = conditional aggregation; explicit value list keeps the plan
      // a single aggregate (no distinct-collect pre-pass)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          MetricColumns.fixedPointLong(col("l_quantity"), 2).as("qc"))
        .groupBy("l_linestatus").pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("qc")))
        .select(col("l_linestatus"), col("A").as("qty_a_cents"),
          col("N").as("qty_n_cents"), col("R").as("qty_r_cents"))
        .orderBy("l_linestatus")
    },

    "q_topk_per_group" -> { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey")
        .orderBy("o_orderpriority", "rank")
    },

    "q_bloom_join" -> { (s, dir) =>
      // bloom semi-join in the 100 TB direction: the FACT side (orders) is
      // filtered row-locally — no join, no shuffle — by a bloom built over
      // a selective dimension subset (high-balance customers, ~10% of
      // keys). m deliberately small so false positives OCCUR and the
      // oracle proves the exact bit arithmetic.
      val m = 4096; val k = 3
      val richCustomers = t(s, dir, "customer").where(col("c_acctbal") > 9000.0)
      val sketch = Bloom.build(richCustomers,
        Shingles.md5Hash60(col("c_custkey").cast(StringType)), m, k)
      t(s, dir, "orders")
        .withColumn("__h", Shingles.md5Hash60(col("o_custkey").cast(StringType)))
        .where(Bloom.mightContain(col("__h"), sketch, m, k))
        .select("o_orderkey", "o_custkey").orderBy("o_orderkey")
    },

    "q_top_per_key" -> ((s, dir) =>
      // EXACT per-source cap: the 8 smallest md5-60(doc_id) per source —
      // KMV bottom-n aggregate (bounded map-side partials) + semi-join
      // reassembly; contrast with q_cap_per_key's approximate fraction rule
      Sampling.topNPerKeyExact(t(s, dir, "documents"), "source", "doc_id", n = 8,
          hasher = Shingles.md5Hash60)
        .select("doc_id", "source").orderBy("doc_id")),

    "q_snm_pairs" -> { (s, dir) =>
      // sorted-neighborhood ER blocking over customer names: global rank
      // via the two-phase prefix discipline, window-5 successor pairs —
      // the oracle replays ranks with a plain global row_number
      Joins.sortedNeighborhoodPairs(t(s, dir, "customer"), "c_custkey",
        col("c_name"), window = 5)
        .orderBy("rank_a", "rank_b")
    },

    "q_jaro_pairs" -> { (s, dir) =>
      // Jaro-Winkler name scoring over SNM-blocked candidates — the
      // name-matcher tier of the linkage family (LevenshteinK is typo
      // DISTANCE; JW weights shared prefixes as names need). Native
      // codegen'd expression, bit-identical to DuckDB's builtin
      // (verified on 20k random pairs)
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      Joins.sortedNeighborhoodPairs(c, "id", col("name"), window = 5)
        .join(c.select(col("id").as("id_a"), col("name").as("n_a")), Seq("id_a"))
        .join(c.select(col("id").as("id_b"), col("name").as("n_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.JaroWinkler.sim(col("n_a"), col("n_b")).as("jw"))
        .where(col("jw") >= 0.9)
        .orderBy("id_a", "id_b")
    },

    "q_golden" -> { (s, dir) =>
      // golden-record survivorship over deterministic 3-chains of
      // customers (0-based keys: (ck, ck+1) pairs when ck % 3 ∈ {0,1} →
      // chains {3k, 3k+1, 3k+2}): one canonical row per entity,
      // attributes by most-frequent-non-null with min-value ties — the
      // MERGE step after entity resolution
      val c = t(s, dir, "customer")
        .withColumn("c_nationkey", col("c_nationkey").cast("long"))
      val pairs = c.where(col("c_custkey") % 3 =!= 2)
        .select(col("c_custkey").as("a"), (col("c_custkey") + 1L).as("b"))
      Joins.goldenRecord(c, "c_custkey", pairs, "a", "b",
        Seq("c_mktsegment", "c_nationkey")).orderBy("entity")
    },

    "q_er_pipeline" -> { (s, dir) =>
      // entity-resolution composition: sorted-neighborhood candidates →
      // levenshtein≤1 verification → connected components → canonical
      // record per cluster, ONE lazy plan over composed oracled operators
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val cand = Joins.sortedNeighborhoodPairs(c, "id", col("name"), window = 5)
      val edges = cand
        .join(c.select(col("id").as("id_a"), col("name").as("n_a")), Seq("id_a"))
        .join(c.select(col("id").as("id_b"), col("name").as("n_b")), Seq("id_b"))
        .where(expr("levenshtein(n_a, n_b) <= 1"))
        .select("id_a", "id_b")
      Components.connectedComponents(c.select("id"), "id", edges, "id_a", "id_b")
        .groupBy("component")
        .agg(count(lit(1)).cast(LongType).as("n_members"),
          min(col("id")).as("canonical"), max(col("id")).as("max_id"))
        .where(col("n_members") > 1)
        .orderBy("component")
    },

    "q_cdc_roundtrip" -> { (s, dir) =>
      // composition gate: snapshotDiff → changeFeed → applyChanges must
      // reproduce the new snapshot EXACTLY; the oracle builds the new
      // snapshot directly — equality proves the round-trip identity
      val old = t(s, dir, "documents").select("doc_id", "text")
      val newSnap = old.where(col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 5)
        .unionByName(old.where(col("doc_id") % 10 === 5)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text")))
        .unionByName(old.where(col("doc_id") % 10 === 7)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
      val feed = Delta.changeFeed(old, newSnap, "doc_id", "text", Seq("text"))
      Delta.applyChanges(old, feed, "doc_id", "seq", "op", Seq("text"))
        .select(col("doc_id"), Shingles.md5Hash60(col("text")).as("text_h"))
        .orderBy("doc_id")
    },

    "q_record_linkage" -> { (s, dir) =>
      // Fellegi-Sunter-shape entity resolution on customers: fuzzy name +
      // exact segment/nation agreements, integer log-odds weights; blocked
      // on the 16-char name prefix like q_fuzzy_join
      val c = t(s, dir, "customer").withColumn("blk", expr("substr(c_name, 1, 16)"))
      Joins.linkagePairs(c, "c_custkey", Seq("blk"), Seq(
        Joins.LinkField("c_name", 4000L, -1000L, maxDist = 1),
        Joins.LinkField("c_mktsegment", 1000L, -500L),
        Joins.LinkField("c_nationkey", 800L, -400L)), minScoreFx = 4000L)
        .orderBy("id_a", "id_b")
    },

    "q_fuzzy_join" -> { (s, dir) =>
      // blocked edit-distance self-join (entity resolution): near-identical
      // customer names within a 16-char-prefix block; lossless length
      // prefilter before the codegen'd levenshtein
      val c = t(s, dir, "customer").withColumn("blk", substring(col("c_name"), 1, 16))
      Joins.fuzzyPairs(c, "c_custkey", "c_name", Seq("blk"), maxDist = 1)
        .select("id_a", "id_b", "dist").orderBy("id_a", "id_b")
    },

  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT)) * (100 + CAST(round(l_tax * 100.0) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_price,
        |  CAST(sum(CAST(round(l_discount * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= TIMESTAMP '1996-06-01')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q13_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |JOIN lineitem ON l_suppkey = s_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_filter" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) * CAST(round(l_discount * 100.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.045 AND l_discount < 0.075
        |  AND l_quantity < 23.995""".stripMargin,

    "q_skew_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, c.click_ts AS asof_click_ts
        |FROM e ASOF LEFT JOIN c ON e.user_id = c.user_id AND e.ts >= c.click_ts
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view')
        |SELECT e.event_id, e.user_id,
        |       CASE WHEN epoch_us(v.view_ts) - epoch_us(e.ts) <= 1800000000
        |            THEN v.view_ts END AS asof_view_ts
        |FROM e ASOF LEFT JOIN v ON e.user_id = v.user_id AND e.ts <= v.view_ts
        |ORDER BY e.event_id""".stripMargin,

    "q_range_join" ->
      // naive non-equi formulation — DuckDB plans it as it likes; graft's
      // bucketized equi-join must produce the identical match set
      """WITH r AS (SELECT CAST(n_nationkey AS BIGINT) AS band,
        |                  900.0 + n_nationkey * 2500.0 AS lo,
        |                  900.0 + n_nationkey * 2500.0 + 9000.0 AS hi
        |           FROM nation)
        |SELECT band, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM r JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q_interval_join" ->
      """WITH l AS (SELECT l_partkey,
        |                  l_orderkey * 10 + l_linenumber AS id,
        |                  CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS s
        |           FROM lineitem)
        |SELECT a.l_partkey, count(*) AS n_overlaps
        |FROM l a JOIN l b
        |  ON a.l_partkey = b.l_partkey AND a.id < b.id
        | AND a.s <= b.s + 7 AND b.s <= a.s + 7
        |GROUP BY a.l_partkey ORDER BY a.l_partkey""".stripMargin,

    "q_zorder" ->
      s"""WITH z AS (SELECT (${ZOrder.spreadSql("l_partkey")} |
         |                  (${ZOrder.spreadSql("l_suppkey")} << 1)) AS zv
         |           FROM lineitem)
         |SELECT zv >> 12 AS zbucket, count(*) AS n, min(zv) AS z_min, max(zv) AS z_max
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,

    "q_balance" ->
      // the global prefix rank is unique (composite key embeds doc_id), so
      // rank-div-target file ids replay exactly
      """WITH t AS (SELECT CAST(len(string_split_regex(text, '\s+')) AS BIGINT) * 1000000
        |                  + doc_id AS ord FROM documents),
        |r AS (SELECT ord, row_number() OVER (ORDER BY ord) - 1 AS rk FROM t)
        |SELECT rk // 64 AS file_id, count(*) AS n_rows, min(ord) AS ord_min, max(ord) AS ord_max
        |FROM r GROUP BY 1 ORDER BY file_id""".stripMargin,

    "q_layout_audit" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n_rows,
        |                  min(l_quantity) AS q_min, max(l_quantity) AS q_max,
        |                  min(l_extendedprice) AS p_min, max(l_extendedprice) AS p_max
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT * FROM (
        |  SELECT 'l_quantity between -5.0 and 0.5' AS predicate,
        |         count(*) AS units_total,
        |         CAST(sum(CASE WHEN q_max < -5.0 OR q_min > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS units_prunable,
        |         CAST(sum(n_rows) AS BIGINT) AS rows_total,
        |         CAST(sum(CASE WHEN q_max < -5.0 OR q_min > 0.5 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_prunable
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_quantity between 1.0 and 10.0',
        |         count(*),
        |         CAST(sum(CASE WHEN q_max < 1.0 OR q_min > 10.0 THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(n_rows) AS BIGINT),
        |         CAST(sum(CASE WHEN q_max < 1.0 OR q_min > 10.0 THEN n_rows ELSE 0 END) AS BIGINT)
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_extendedprice between 0.0 and 2000.0',
        |         count(*),
        |         CAST(sum(CASE WHEN p_max < 0.0 OR p_min > 2000.0 THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(n_rows) AS BIGINT),
        |         CAST(sum(CASE WHEN p_max < 0.0 OR p_min > 2000.0 THEN n_rows ELSE 0 END) AS BIGINT)
        |  FROM m)
        |ORDER BY predicate""".stripMargin,

    "q_hilbert" ->
      // the same quadrant-rotation walk, one recursive step per order bit:
      // rx/ry from the current s-bit, d += s²·((3rx) xor ry), rotate/flip,
      // halve s; rows stop expanding at s = 0
      """WITH RECURSIVE h AS (
        |  SELECT CAST(l_partkey & 65535 AS BIGINT) AS x,
        |         CAST(l_suppkey & 65535 AS BIGINT) AS y,
        |         CAST(32768 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
        |  FROM lineitem
        |  UNION ALL
        |  SELECT CASE WHEN (y & s) = 0 THEN (CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END)
        |              ELSE x END AS x,
        |         CASE WHEN (y & s) = 0 THEN (CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END)
        |              ELSE y END AS y,
        |         s // 2 AS s,
        |         d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
        |                         (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)) AS d
        |  FROM h WHERE s > 0)
        |SELECT d >> 12 AS hbucket, count(*) AS n, min(d) AS h_min, max(d) AS h_max
        |FROM h WHERE s = 0
        |GROUP BY hbucket ORDER BY hbucket""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id AS id,
        |             CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.id, n.id) AS id,
        |       CASE WHEN o.id IS NULL THEN 'added'
        |            WHEN n.id IS NULL THEN 'removed'
        |            WHEN o.text <> n.text THEN 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.id = n.id
        |WHERE o.id IS NULL OR n.id IS NULL OR o.text <> n.text
        |ORDER BY id""".stripMargin,

    "q_merge_upsert" ->
      """WITH changes AS (
        |  SELECT doc_id, 1 AS seq, 'D' AS op, text, lang
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 2 AS seq, 'U' AS op, upper(text) AS text, 'xx' AS lang
        |  FROM documents WHERE doc_id % 5 = 0),
        |latest AS (SELECT doc_id, op, text, lang FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY seq DESC, op DESC) AS rn
        |  FROM changes) WHERE rn = 1)
        |SELECT * FROM (
        |  SELECT d.doc_id, d.text, d.lang FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM latest)
        |  UNION ALL
        |  SELECT doc_id, text, lang FROM latest WHERE op = 'U')
        |ORDER BY doc_id""".stripMargin,

    "q_scd2" ->
      """WITH ch AS (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS seq, 'U' AS op, lang, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', lang, n_chars FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', lang, n_chars + 10 FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL
        |  SELECT doc_id, 3, 'D', NULL, NULL FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, 4, 'U', 're', n_chars FROM documents WHERE doc_id % 12 = 0),
        |w AS (
        |  SELECT doc_id, seq, op, lang, n_chars,
        |         lag(op) OVER k AS p_op,
        |         lag(lang) OVER k AS p_lang,
        |         lag(n_chars) OVER k AS p_nc
        |  FROM ch WINDOW k AS (PARTITION BY doc_id ORDER BY seq)),
        |f AS (
        |  SELECT *, CASE WHEN op = 'U' AND (p_op IS NULL OR p_op = 'D'
        |                 OR (lang IS DISTINCT FROM p_lang)
        |                 OR (n_chars IS DISTINCT FROM p_nc))
        |            THEN 1 ELSE 0 END AS strt
        |  FROM w),
        |i AS (
        |  SELECT *, sum(strt) OVER (PARTITION BY doc_id ORDER BY seq) AS island
        |  FROM f),
        |g AS (
        |  SELECT doc_id, island,
        |         min(seq) FILTER (WHERE op = 'U') AS valid_from,
        |         arg_min(lang, seq) FILTER (WHERE op = 'U') AS lang,
        |         arg_min(n_chars, seq) FILTER (WHERE op = 'U') AS n_chars,
        |         min(seq) FILTER (WHERE op = 'D') AS del
        |  FROM i GROUP BY doc_id, island),
        |v AS (
        |  SELECT doc_id, valid_from, lang, n_chars,
        |         coalesce(del, lead(valid_from)
        |           OVER (PARTITION BY doc_id ORDER BY valid_from)) AS valid_to,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY valid_from) AS version
        |  FROM g WHERE valid_from IS NOT NULL)
        |SELECT doc_id, CAST(version AS BIGINT) AS version, valid_from, valid_to,
        |       valid_to IS NULL AS is_current, lang, n_chars
        |FROM v ORDER BY doc_id, version""".stripMargin,

    "q_stream_join" ->
      """WITH c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, ts AS view_ts, user_id
        |      FROM events WHERE event_type = 'view')
        |SELECT c.click_id, v.view_id, c.user_id
        |FROM c JOIN v ON c.user_id = v.user_id
        |    AND v.view_ts >= c.click_ts - INTERVAL 86400 SECOND
        |    AND v.view_ts <= c.click_ts
        |ORDER BY click_id, view_id""".stripMargin,

    "q_join_cardinality" ->
      """WITH l AS (SELECT user_id, count(*) AS cl FROM events
        |           WHERE event_type = 'click' GROUP BY user_id),
        |r AS (SELECT user_id, count(*) AS cr FROM events
        |      WHERE event_type = 'view' GROUP BY user_id)
        |SELECT CAST(sum(CAST(cl AS DECIMAL(19,0)) * CAST(cr AS DECIMAL(19,0))) AS BIGINT) AS join_rows,
        |       count(*) AS shared_keys,
        |       CAST(max(CAST(cl AS DECIMAL(19,0)) * CAST(cr AS DECIMAL(19,0))) AS BIGINT) AS max_key_rows
        |FROM l JOIN r USING (user_id)""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_a_cents,
        |       CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_n_cents,
        |       CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_r_cents
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_topk_per_group" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank,
        |         o_orderkey
        |  FROM orders)
        |SELECT o_orderpriority, rank, o_orderkey FROM r WHERE rank <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,

    "q_bloom_join" ->
      // the oracle rebuilds the EXACT filter: same 60-bit key hash, same
      // double-hashed probe positions (h + j*(1 + h mod (m-1))) mod m with
      // m=8192, k=3 — a customer passes iff all 3 probes hit the position
      // set, so false positives reproduce bit-for-bit
      """WITH ch AS (SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |            FROM customer WHERE c_acctbal > 9000.0),
        |pos AS (SELECT DISTINCT (h + j.i * (1 + h % 4095)) % 4096 AS p
        |        FROM ch, (SELECT unnest(range(3)) AS i) j),
        |oh AS (SELECT o_orderkey, o_custkey,
        |              ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |       FROM orders),
        |op AS (SELECT o_orderkey, o_custkey, (h + j.i * (1 + h % 4095)) % 4096 AS p
        |       FROM oh, (SELECT unnest(range(3)) AS i) j)
        |SELECT o_orderkey, any_value(o_custkey) AS o_custkey
        |FROM op JOIN pos USING (p)
        |GROUP BY o_orderkey HAVING count(*) = 3 ORDER BY o_orderkey""".stripMargin,

    "q_top_per_key" ->
      // rank by the identical md5-60 hash per source; the KMV keeps the 8
      // smallest DISTINCT hashes, which over unique doc_ids is rank <= 8
      """WITH h AS (SELECT doc_id, source,
        |                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |           FROM documents),
        |r AS (SELECT doc_id, source,
        |             row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
        |      FROM h)
        |SELECT doc_id, source FROM r WHERE rn <= 8 ORDER BY doc_id""".stripMargin,

    "q_snm_pairs" ->
      """WITH r AS (SELECT c_custkey AS id,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS rank
        |  FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b, a.rank AS rank_a, b.rank AS rank_b
        |FROM r a JOIN r b ON b.rank > a.rank AND b.rank < a.rank + 5
        |ORDER BY rank_a, rank_b""".stripMargin,

    "q_jaro_pairs" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |r AS (SELECT id, name,
        |    CAST(row_number() OVER (ORDER BY name, id) AS BIGINT) - 1 AS rank
        |  FROM c)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       jaro_winkler_similarity(a.name, b.name) AS jw
        |FROM r a JOIN r b ON b.rank > a.rank AND b.rank < a.rank + 5
        |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    "q_golden" ->
      """WITH m AS (SELECT c_custkey - (c_custkey % 3) AS entity,
        |                  c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey
        |           FROM customer),
        |n AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members FROM m GROUP BY entity),
        |s1 AS (SELECT entity, c_mktsegment AS v, count(*) AS c FROM m
        |       WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
        |t1 AS (SELECT entity, max(c) AS mx FROM s1 GROUP BY entity),
        |a1 AS (SELECT s1.entity, min(v) AS c_mktsegment
        |       FROM s1 JOIN t1 ON t1.entity = s1.entity AND s1.c = t1.mx GROUP BY s1.entity),
        |s2 AS (SELECT entity, c_nationkey AS v, count(*) AS c FROM m
        |       WHERE c_nationkey IS NOT NULL GROUP BY 1, 2),
        |t2 AS (SELECT entity, max(c) AS mx FROM s2 GROUP BY entity),
        |a2 AS (SELECT s2.entity, min(v) AS c_nationkey
        |       FROM s2 JOIN t2 ON t2.entity = s2.entity AND s2.c = t2.mx GROUP BY s2.entity)
        |SELECT n.entity, n.n_members, a1.c_mktsegment, a2.c_nationkey
        |FROM n LEFT JOIN a1 USING (entity) LEFT JOIN a2 USING (entity)
        |ORDER BY entity""".stripMargin,

    "q_er_pipeline" ->
      """WITH RECURSIVE
        |r AS (SELECT c_custkey AS id, c_name AS name,
        |        CAST(row_number() OVER (ORDER BY c_name, c_custkey) AS BIGINT) - 1 AS rank
        |      FROM customer),
        |p AS (SELECT a.id AS id_a, b.id AS id_b, a.name AS n_a, b.name AS n_b
        |      FROM r a JOIN r b ON b.rank > a.rank AND b.rank < a.rank + 5),
        |e AS (SELECT id_a, id_b FROM p WHERE levenshtein(n_a, n_b) <= 1),
        |sym AS (SELECT id_a AS a, id_b AS b FROM e UNION SELECT id_b, id_a FROM e),
        |cc(id, label) AS (
        |  SELECT c_custkey, c_custkey FROM customer
        |  UNION
        |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id)
        |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
        |       min(id) AS canonical, max(id) AS max_id
        |FROM comp GROUP BY 1 HAVING count(*) > 1 ORDER BY component""".stripMargin,

    "q_cdc_roundtrip" ->
      """WITH newsnap AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3 AND doc_id % 10 != 5
        |  UNION ALL
        |  SELECT doc_id, text || ' v2' FROM documents WHERE doc_id % 10 = 5
        |  UNION ALL
        |  SELECT doc_id + 10000, 'new doc ' || CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 10 = 7)
        |SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_h
        |FROM newsnap ORDER BY doc_id""".stripMargin,

    "q_record_linkage" ->
      """WITH b AS (SELECT c_custkey AS id, substr(c_name, 1, 16) AS blk,
        |                  c_name, c_mktsegment, c_nationkey FROM customer),
        |p AS (SELECT a.id AS id_a, b2.id AS id_b,
        |  CASE WHEN a.c_name IS NULL OR b2.c_name IS NULL THEN NULL
        |       ELSE (abs(len(a.c_name) - len(b2.c_name)) <= 1 AND levenshtein(a.c_name, b2.c_name) <= 1) END AS agree_c_name,
        |  CASE WHEN a.c_mktsegment IS NULL OR b2.c_mktsegment IS NULL THEN NULL
        |       ELSE a.c_mktsegment = b2.c_mktsegment END AS agree_c_mktsegment,
        |  CASE WHEN a.c_nationkey IS NULL OR b2.c_nationkey IS NULL THEN NULL
        |       ELSE a.c_nationkey = b2.c_nationkey END AS agree_c_nationkey
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.id < b2.id)
        |SELECT id_a, id_b, agree_c_name, agree_c_mktsegment, agree_c_nationkey,
        |  CAST((CASE WHEN agree_c_name IS NULL THEN 0 WHEN agree_c_name THEN 4000 ELSE -1000 END)
        |     + (CASE WHEN agree_c_mktsegment IS NULL THEN 0 WHEN agree_c_mktsegment THEN 1000 ELSE -500 END)
        |     + (CASE WHEN agree_c_nationkey IS NULL THEN 0 WHEN agree_c_nationkey THEN 800 ELSE -400 END) AS BIGINT) AS score_fx,
        |  (CASE WHEN agree_c_name IS NULL THEN 0 WHEN agree_c_name THEN 4000 ELSE -1000 END)
        |     + (CASE WHEN agree_c_mktsegment IS NULL THEN 0 WHEN agree_c_mktsegment THEN 1000 ELSE -500 END)
        |     + (CASE WHEN agree_c_nationkey IS NULL THEN 0 WHEN agree_c_nationkey THEN 800 ELSE -400 END) >= 4000 AS is_match
        |FROM p ORDER BY id_a, id_b""".stripMargin,

    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        |FROM customer a JOIN customer b
        |  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
        | AND a.c_custkey < b.c_custkey
        | AND abs(len(a.c_name) - len(b.c_name)) <= 1
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

  )
}
