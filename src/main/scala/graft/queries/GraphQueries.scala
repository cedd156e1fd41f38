package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph analytics: PageRank family, communities, k-core, BFS. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object GraphQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> { (s, dir) =>
      // integer-arithmetic PageRank over a graph derived from orders
      // (customer-block → order-block links): truncating long division is
      // part of the definition, so 5 rounds reproduce bit-identically in
      // any engine — the oracle unrolls the same 5 steps as CTEs
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 500).as("src"),
        (col("o_orderkey") % 500).as("dst")).distinct()
      Components.pageRank(s.range(500).toDF("id"), "id", edges, "src", "dst",
        iterations = 5).orderBy("id")
    },

    "q_katz" -> { (s, dir) =>
      // Katz attenuation-series centrality on the q_pagerank graph: full
      // score down every edge ×0.2 per hop (influence is additive, not
      // conserved) — 5 integer rounds, oracle-unrolled
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 500).as("src"),
        (col("o_orderkey") % 500).as("dst")).distinct()
      Components.katzCentrality(s.range(500).toDF("id"), "id", edges,
        "src", "dst", iterations = 5).orderBy("id")
    },

    "q_kcore" -> { (s, dir) =>
      // 6-core of the (sparsified) part co-purchase graph: peeling runs 4
      // rounds at sf0.01; the 8-round cap makes Spark ≡ the unrolled
      // 8-round oracle at ANY scale (converged rounds are identity)
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      // within-order pairs join-free (Joins.withinKeyPairs): the old strict
      // x.pk < y.pk kept each unordered ROW pair with distinct part keys
      // once — positional enumeration does the same once equal-pk pairs are
      // re-excluded, and least/greatest replays the src < dst orientation;
      // the pair MULTISET is identical, so any downstream dedup sees the
      // same edges
      val e = graft.ops.Joins.withinKeyPairs(l, "ok", Seq(col("pk")))
        .where(col("x.pk") =!= col("y.pk") &&
          ((col("x.pk") + col("y.pk")) % 11) === 0)
        .select(least(col("x.pk"), col("y.pk")).as("src"),
          greatest(col("x.pk"), col("y.pk")).as("dst"))
      Components.kCore(e, "src", "dst", k = 6, maxRounds = 8).orderBy("node")
    },

    "q_triangles" -> { (s, dir) =>
      // per-node triangle counts over the mod-200 orders graph —
      // degree-ordered wedge generation, closed against canonical edges;
      // the oracle counts the same triangles via a 3-way self-join
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.triangleCounts(edges, "src", "dst").orderBy("node")
    },

    "q_clustering" -> { (s, dir) =>
      // local clustering coefficient on the same mod-200 graph as
      // q_triangles: cc = 2T/(d(d−1)) — density where raw triangle counts
      // blur hubs vs cliques; one exact-integer double tree per node
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.clusteringCoefficients(edges, "src", "dst").orderBy("node")
    },

    "q_struct_clusters" -> { (s, dir) =>
      // SCAN structural clustering of the co-purchase graph: density-based
      // communities grown through core nodes, with hubs and outliers
      // CLASSIFIED instead of force-labeled (eps 0.35 / mu 3 → ~14
      // clusters at sf0.01); exact-integer similarity tree, min-id labels
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      // within-order pairs join-free (Joins.withinKeyPairs): the old strict
      // x.pk < y.pk kept each unordered ROW pair with distinct part keys
      // once — positional enumeration does the same once equal-pk pairs are
      // re-excluded, and least/greatest replays the src < dst orientation;
      // the pair MULTISET is identical, so any downstream dedup sees the
      // same edges
      val e = graft.ops.Joins.withinKeyPairs(l, "ok", Seq(col("pk")))
        .where(col("x.pk") =!= col("y.pk") &&
          ((col("x.pk") + col("y.pk")) % 11) === 0)
        .select(least(col("x.pk"), col("y.pk")).as("src"),
          greatest(col("x.pk"), col("y.pk")).as("dst"))
      Components.scanClusters(e, "src", "dst", eps = 0.35, mu = 3)
        .orderBy("node")
    },

    "q_linkpred" -> { (s, dir) =>
      // link prediction over the q_triangles graph: top-100 non-adjacent
      // distance-2 pairs by Adamic–Adar (exact ⌊10¹²/ln deg⌋ weights) with
      // common-neighbor counts and neighborhood Jaccard — the "probably
      // the same / about to connect" scorer for ER candidates
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.linkPrediction(edges, "src", "dst",
        maxDegree = 10000L, topK = 100)
    },

    "q_assortativity" -> { (s, dir) =>
      // degree assortativity of the mod-200 graph: Pearson r of endpoint
      // degrees over symmetrized edges — like-to-like vs hub-to-leaf
      // wiring in one sign; exact decimal co-moments, one double tree
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 200).as("src"),
        (col("o_orderkey") % 200).as("dst"))
      Components.degreeAssortativity(edges, "src", "dst")
    },

    "q_ppr" -> { (s, dir) =>
      // PERSONALIZED PageRank: teleport only to the ≡0-mod-10 seed nodes —
      // rank = link-proximity to the seed set; same unrolled integer rounds
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 500).as("src"),
        (col("o_orderkey") % 500).as("dst")).distinct()
      val nodes = s.range(500).toDF("id")
      Components.personalizedPageRank(nodes, "id", edges, "src", "dst",
        seeds = nodes.where(col("id") % 10 === 0), iterations = 5)
        .orderBy("id")
    },

    "q_wpagerank" -> { (s, dir) =>
      // WEIGHTED PageRank over the supplier→part shipment graph: edge
      // weight = shipment multiplicity (the multigraph collapsed to
      // integer weights); contributions (pr·w) div Σw — truncating
      // division is the definition, oracle unrolls the same 5 rounds
      val l = t(s, dir, "lineitem")
      val edges = l.groupBy((col("l_suppkey") % 300).as("src"),
          (col("l_partkey") % 300).as("dst"))
        .agg(count(lit(1)).as("w"))
      Components.weightedPageRank(s.range(300).toDF("id"), "id", edges,
        "src", "dst", "w", iterations = 5).orderBy("id")
    },

    "q_cooc" -> { (s, dir) =>
      // co-purchase graph: parts (mod 150) co-occurring in an order become
      // weighted edges; count >= 2 prunes one-off pairs
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), (col("l_partkey") % 150).as("i"))
      Components.coOccurrence(l, "k", "i", maxKeyItems = 50, minCount = 2)
        .orderBy("item_a", "item_b")
    },

    "q_bfs" -> { (s, dir) =>
      // multi-source BFS: hop distance from the ≡0-mod-25 seed set along
      // the directed mod-400 order graph, 4 relaxation rounds; unreached
      // nodes stay NULL
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 400).as("src"),
        (col("o_orderkey") % 400).as("dst")).distinct()
      val nodes = s.range(400).toDF("id")
      Components.bfsDistances(nodes, "id", edges, "src", "dst",
        seeds = nodes.where(col("id") % 25 === 0), maxHops = 4)
        .orderBy("id")
    },

    "q_modularity" -> { (s, dir) =>
      // partition-quality acceptance gate over the q_communities graph:
      // Newman Q of a deterministic 10-way node partition — exact integer
      // numerators, ONE final double division (no truncation at all)
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 300).as("src"),
        (col("o_orderkey") % 300).as("dst")).distinct()
      val labels = s.range(300).toDF("id").withColumn("lbl", col("id") % 10)
      Components.modularity(edges, "src", "dst", labels, "id", "lbl")
    },

    "q_communities" -> { (s, dir) =>
      // deterministic synchronous label propagation (4 fixed rounds,
      // smallest-label ties) over the mod-300 order graph; the oracle
      // replays the identical rounds with window-ranked argmax
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 300).as("src"),
        (col("o_orderkey") % 300).as("dst")).distinct()
      Components.labelPropagation(s.range(300).toDF("id"), "id", edges,
        "src", "dst", iterations = 4).orderBy("id")
    },

    "q_hits" -> { (s, dir) =>
      // HITS hubs/authorities over the customer→order graph: L∞-normalized
      // integer rounds (truncating division is the definition); the oracle
      // unrolls the same 5 rounds with HUGEINT intermediates
      val o = t(s, dir, "orders")
      val edges = o.select((col("o_custkey") % 400).as("src"),
        (col("o_orderkey") % 400).as("dst")).distinct()
      Components.hits(s.range(400).toDF("id"), "id", edges, "src", "dst",
        iterations = 5).orderBy("id")
    },

  )

  val oracleSql: Map[String, String] = Map(
    "q_kcore" -> kCoreOracle(6, 8),

    "q_pagerank" -> pageRankOracleSql(500, 5),

    "q_katz" -> katzOracleSql(500, 5),

    "q_wpagerank" -> weightedPageRankOracleSql(300, 5),

    "q_hits" -> hitsOracleSql(400, 5),

    "q_modularity" ->
      """WITH e0 AS (SELECT DISTINCT least(o_custkey % 300, o_orderkey % 300) AS a,
        |                            greatest(o_custkey % 300, o_orderkey % 300) AS b
        |            FROM orders),
        |e AS (SELECT a, b, a % 10 AS la, b % 10 AS lb FROM e0 WHERE a <> b),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |bl AS (SELECT l, CAST(sum(ei) AS BIGINT) AS ec, CAST(sum(di) AS BIGINT) AS dc
        |       FROM (SELECT la AS l, CASE WHEN la = lb THEN 1 ELSE 0 END AS ei, 1 AS di FROM e
        |             UNION ALL
        |             SELECT lb AS l, 0 AS ei, 1 AS di FROM e) x
        |       GROUP BY l)
        |SELECT max(m.m) AS m_edges, CAST(count(*) AS BIGINT) AS communities,
        |       CAST(sum(CAST(4 AS HUGEINT) * m.m * ec - CAST(dc AS HUGEINT) * dc) AS BIGINT) AS q_num,
        |       CAST(sum(CAST(4 AS HUGEINT) * m.m * ec - CAST(dc AS HUGEINT) * dc) AS DOUBLE)
        |         / (4.0 * CAST(max(m.m) AS DOUBLE) * CAST(max(m.m) AS DOUBLE)) AS modularity
        |FROM bl, m""".stripMargin,

    "q_communities" -> labelPropOracleSql(300, 4),

    "q_cooc" ->
      """WITH ki AS (SELECT DISTINCT l_orderkey AS k, l_partkey % 150 AS i FROM lineitem),
        |ok AS (SELECT k FROM ki GROUP BY k HAVING count(*) <= 50),
        |c AS (SELECT ki.k, ki.i FROM ki JOIN ok USING (k))
        |SELECT a.i AS item_a, b.i AS item_b, count(*) AS cnt
        |FROM c a JOIN c b ON a.k = b.k AND a.i < b.i
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY item_a, item_b""".stripMargin,

    "q_bfs" -> bfsOracleSql(400, 25, 4),

    "q_struct_clusters" ->
      """WITH RECURSIVE
        |l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |raw AS (SELECT x.pk AS s, y.pk AS d FROM l x JOIN l y ON x.ok = y.ok AND x.pk < y.pk
        |        WHERE (x.pk + y.pk) % 11 = 0),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY z),
        |cnp AS (SELECT l2.n AS a, r2.n AS b, CAST(count(*) AS BIGINT) AS cn
        |        FROM adj l2 JOIN adj r2 ON l2.z = r2.z AND l2.n < r2.n GROUP BY 1, 2),
        |cne AS (SELECT e.a, e.b, coalesce(cnp.cn, 0) AS cn FROM e LEFT JOIN cnp USING (a, b)),
        |sims AS (SELECT cne.a, cne.b,
        |           CAST(cne.cn + 2 AS DOUBLE) / sqrt(CAST((da.deg + 1) * (db.deg + 1) AS DOUBLE)) AS sim
        |         FROM cne JOIN deg da ON da.z = cne.a JOIN deg db ON db.z = cne.b),
        |epse AS (SELECT a, b FROM sims WHERE sim >= 0.35),
        |ed AS (SELECT node, count(*) AS ed
        |       FROM (SELECT a AS node FROM epse UNION ALL SELECT b FROM epse) GROUP BY node),
        |cores AS (SELECT node FROM ed WHERE ed + 1 >= 3),
        |coree AS (SELECT epse.a, epse.b FROM epse
        |          JOIN cores ca ON ca.node = epse.a JOIN cores cb ON cb.node = epse.b),
        |csym AS (SELECT a, b FROM coree UNION SELECT b, a FROM coree),
        |cc(id, label) AS (SELECT node, node FROM cores
        |  UNION SELECT csym.a, cc.label FROM cc JOIN csym ON cc.id = csym.b),
        |comp AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id),
        |esym AS (SELECT a AS u, b AS v FROM epse UNION ALL SELECT b, a FROM epse),
        |borders AS (SELECT esym.u AS node, min(comp.cluster) AS cluster
        |            FROM esym JOIN comp ON comp.id = esym.v
        |            WHERE esym.u NOT IN (SELECT node FROM cores)
        |            GROUP BY esym.u),
        |labeled AS (SELECT id AS node, cluster, 'core' AS role FROM comp
        |            UNION ALL SELECT node, cluster, 'border' FROM borders),
        |unl AS (SELECT z AS node FROM deg WHERE z NOT IN (SELECT node FROM labeled)),
        |nbrc AS (SELECT adj.z AS node, count(DISTINCT lab.cluster) AS nc
        |         FROM adj JOIN labeled lab ON lab.node = adj.n
        |         WHERE adj.z IN (SELECT node FROM unl) GROUP BY adj.z)
        |SELECT node, cluster, role FROM labeled
        |UNION ALL
        |SELECT unl.node, CAST(NULL AS BIGINT) AS cluster,
        |       CASE WHEN coalesce(nbrc.nc, 0) >= 2 THEN 'hub' ELSE 'outlier' END AS role
        |FROM unl LEFT JOIN nbrc ON nbrc.node = unl.node
        |ORDER BY node""".stripMargin,

    "q_linkpred" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |adj AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b AS z, a AS n FROM e),
        |deg AS (SELECT z, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY z),
        |ctr AS (SELECT z, CAST(floor(1e12 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w
        |        FROM deg WHERE deg <= 10000 AND deg >= 2),
        |wd AS (SELECT adj.z, adj.n, ctr.w FROM adj JOIN ctr USING (z)),
        |pr AS (SELECT l.n AS a, r.n AS b, CAST(count(*) AS BIGINT) AS cn,
        |              CAST(sum(l.w) AS BIGINT) AS aa_fx
        |       FROM wd l JOIN wd r ON l.z = r.z AND l.n < r.n GROUP BY 1, 2),
        |np AS (SELECT pr.* FROM pr
        |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = pr.a AND e.b = pr.b))
        |SELECT np.a, np.b, np.cn AS common_neighbors, np.aa_fx,
        |       CAST(np.aa_fx AS DOUBLE) / 1e12 AS aa,
        |       CAST(np.cn AS DOUBLE) / CAST(da.deg + db.deg - np.cn AS DOUBLE) AS jaccard
        |FROM np JOIN deg da ON da.z = np.a JOIN deg db ON db.z = np.b
        |ORDER BY np.aa_fx DESC, np.a, np.b LIMIT 100""".stripMargin,

    "q_triangles" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (SELECT a AS v FROM e UNION SELECT b AS v FROM e),
        |cnt AS (SELECT v, count(*) AS t FROM (
        |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
        |) GROUP BY 1)
        |SELECT n.v AS node, CAST(coalesce(cnt.t, 0) AS BIGINT) AS triangles
        |FROM nodes n LEFT JOIN cnt ON cnt.v = n.v ORDER BY node""".stripMargin,

    "q_clustering" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |deg AS (SELECT v, count(*) AS dg FROM (
        |  SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |cnt AS (SELECT v, count(*) AS t FROM (
        |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
        |) GROUP BY 1)
        |SELECT deg.v AS node, CAST(deg.dg AS BIGINT) AS degree,
        |       CAST(coalesce(cnt.t, 0) AS BIGINT) AS triangles,
        |       CASE WHEN deg.dg >= 2 THEN CAST(coalesce(cnt.t, 0) * 2 AS DOUBLE)
        |            / CAST(deg.dg * (deg.dg - 1) AS DOUBLE) END AS cc
        |FROM deg LEFT JOIN cnt ON cnt.v = deg.v ORDER BY node""".stripMargin,

    "q_assortativity" ->
      """WITH raw AS (SELECT o_custkey % 200 AS s, o_orderkey % 200 AS d FROM orders),
        |e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s != d),
        |deg AS (SELECT v, count(*) AS dg FROM (
        |  SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |ed AS (SELECT da.dg AS x, db.dg AS y
        |       FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
        |p AS (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             sum(CAST(x AS HUGEINT)) AS sx,
        |             sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(y AS HUGEINT) * y) AS syy,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy
        |      FROM p)
        |SELECT CAST(n // 2 AS BIGINT) AS m,
        |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
        |        AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0
        |  THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS assortativity
        |FROM m""".stripMargin,

    "q_ppr" -> pprOracleSql(500, 5, 10),

  )
}
