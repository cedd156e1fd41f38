package graft

import graft.ops.Components
import org.apache.spark.sql.functions._

/** The measured LOCAL route extended to the iterative graph family (round
  * 12): under the edge bound each operator iterates on the driver with the
  * IDENTICAL integer arithmetic, so the route choice must be invisible —
  * every assertion here is bit-for-bit equality between the forced
  * distributed rounds (`maxLocalEdges = 0`) and the local route.
  */
class GraphLocalRouteSpec extends SparkSpec {
  import spark.implicits._

  // a messy directed graph: hub, chain, cycle, duplicate edge, self-loopish
  // structure, plus isolated nodes in the node frame
  private lazy val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
    (6L, 4L), (7L, 8L), (2L, 3L), (8L, 7L), (3L, 4L), (9L, 1L)
  ).toDF("src", "dst")
  private lazy val nodes = (1L to 12L).toDF("id") // 10-12 isolated

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("pageRank: local route bit-equal to distributed rounds") {
    val local = Components.pageRank(nodes, "id", edges, "src", "dst", iterations = 5)
    val dist = Components.pageRank(nodes, "id", edges, "src", "dst", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist) && local.count() == 12)
  }

  test("katzCentrality: local route bit-equal, hand star fixture, dangling edges") {
    val local = Components.katzCentrality(nodes, "id", edges, "src", "dst", iterations = 5)
    val dist = Components.katzCentrality(nodes, "id", edges, "src", "dst", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist) && local.count() == 12)
    // star 1→3, 2→3 over {1,2,3}: base = 1e9/3; katz(3) = base + (20·2·base)//100
    val star = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Components.katzCentrality((1L to 3L).toDF("id"), "id", star,
      "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 1000000000L / 3
    assert(got(1L) == base && got(2L) == base)
    assert(got(3L) == base + 20L * (2L * base) / 100L)
    // dangling edges + restricted frame: out-of-frame endpoints carry no score
    val dang = edges.unionAll(Seq((99L, 1L), (3L, 99L)).toDF("src", "dst"))
    val l2 = Components.katzCentrality(nodes, "id", dang, "src", "dst", iterations = 5)
    val d2 = Components.katzCentrality(nodes, "id", dang, "src", "dst", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(l2) == rows(d2))
  }

  test("weightedPageRank: local route bit-equal to distributed rounds") {
    val we = edges.withColumn("w", (col("src") * 3 + col("dst")) % 5 + 1)
    val local = Components.weightedPageRank(nodes, "id", we, "src", "dst", "w", iterations = 5)
    val dist = Components.weightedPageRank(nodes, "id", we, "src", "dst", "w", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  test("personalizedPageRank: local route bit-equal, incl. untouched seed/non-seed defaults") {
    val seeds = Seq(1L, 7L, 11L).toDF("id") // 11 is isolated: rank = baseFx
    val local = Components.personalizedPageRank(nodes, "id", edges, "src", "dst", seeds, iterations = 5)
    val dist = Components.personalizedPageRank(nodes, "id", edges, "src", "dst", seeds, iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
    val m = local.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(11L) > 0L && m(10L) == 0L, "isolated seed gets base mass, isolated non-seed zero")
  }

  test("bfsDistances: local route bit-equal, incl. unreached NULLs") {
    val seeds = Seq(1L, 11L).toDF("id")
    val local = Components.bfsDistances(nodes, "id", edges, "src", "dst", seeds, maxHops = 3)
    val dist = Components.bfsDistances(nodes, "id", edges, "src", "dst", seeds, maxHops = 3,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
    val m = local.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(m(11L) == 0L && m(10L) == null && m(2L) == 1L)
  }

  test("labelPropagation: local route bit-equal (argmax ties to smallest label)") {
    val local = Components.labelPropagation(nodes, "id", edges, "src", "dst", iterations = 4)
    val dist = Components.labelPropagation(nodes, "id", edges, "src", "dst", iterations = 4,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  test("hits: local route bit-equal (BigInt rescale = DECIMAL div)") {
    val local = Components.hits(nodes, "id", edges, "src", "dst", iterations = 5)
    val dist = Components.hits(nodes, "id", edges, "src", "dst", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  // dangling edges: endpoints 90-93 are NOT in the node frame. The
  // distributed rounds drop their mass/labels/votes via the ids joins, so
  // the local route must drop them identically — this is also the
  // legitimate "rank a subgraph by restricting the node frame" pattern.
  private lazy val dangling = edges.unionAll(Seq(
    (90L, 1L), (1L, 91L), (92L, 93L), (91L, 2L), (5L, 90L)
  ).toDF("src", "dst"))

  test("pageRank: dangling edges / restricted node frame — local ≡ distributed") {
    val local = Components.pageRank(nodes, "id", dangling, "src", "dst", iterations = 5)
    val dist = Components.pageRank(nodes, "id", dangling, "src", "dst", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist) && local.count() == 12)
  }

  test("weightedPageRank: dangling edges — local ≡ distributed") {
    val we = dangling.withColumn("w", (col("src") * 3 + col("dst")) % 5 + 1)
    val local = Components.weightedPageRank(nodes, "id", we, "src", "dst", "w", iterations = 5)
    val dist = Components.weightedPageRank(nodes, "id", we, "src", "dst", "w", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  test("personalizedPageRank: dangling edges + OUT-OF-FRAME seed — local ≡ distributed") {
    // seed 90 exists in the edge frame but NOT in nodes: the distributed
    // ids⋈seeds join ignores it, so it must emit no teleport mass locally
    val seeds = Seq(1L, 90L, 99L).toDF("id")
    val local = Components.personalizedPageRank(nodes, "id", dangling, "src", "dst", seeds,
      iterations = 5)
    val dist = Components.personalizedPageRank(nodes, "id", dangling, "src", "dst", seeds,
      iterations = 5, maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  test("bfsDistances: dangling edges + out-of-frame seed — local ≡ distributed") {
    // 90 → 1 exists, 90 is a seed, but 90 ∉ nodes: the distributed relax
    // join never sees it as a source, so node 1 must NOT read dist 1 via 90
    val seeds = Seq(90L, 4L).toDF("id")
    val local = Components.bfsDistances(nodes, "id", dangling, "src", "dst", seeds, maxHops = 4)
    val dist = Components.bfsDistances(nodes, "id", dangling, "src", "dst", seeds, maxHops = 4,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
    val m = local.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(m(1L) == null, "out-of-frame seed must not act as a distance-0 source")
    assert(m(4L) == 0L && m(5L) == 1L)
  }

  test("labelPropagation: dangling edges — local ≡ distributed") {
    val local = Components.labelPropagation(nodes, "id", dangling, "src", "dst", iterations = 4)
    val dist = Components.labelPropagation(nodes, "id", dangling, "src", "dst", iterations = 4,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  test("hits: dangling edges — local ≡ distributed") {
    val local = Components.hits(nodes, "id", dangling, "src", "dst", iterations = 5)
    val dist = Components.hits(nodes, "id", dangling, "src", "dst", iterations = 5,
      maxLocalEdges = 0L)
    assert(rows(local) == rows(dist))
  }

  test("seeded randomized sweep: local ≡ distributed on graphs with dangling edges") {
    // random graphs whose edge ids EXCEED the node range (dangling) and
    // random seed sets that are partly out-of-frame — the adversarial
    // regime for the membership confinement; 4 trials × 4 operators
    val rng = new scala.util.Random(1337)
    for (trial <- 1 to 4) {
      val nNodes = 6 + rng.nextInt(8)
      val ns = (1L to nNodes.toLong).toDF("id")
      val es = Seq.fill(10 + rng.nextInt(15)) {
        // ~1/4 of endpoints fall outside the node frame
        def ep() = (1 + rng.nextInt(nNodes + nNodes / 2)).toLong
        (ep(), ep())
      }.filter(e => e._1 != e._2).toDF("src", "dst")
      val seeds = Seq.fill(3)((1 + rng.nextInt(nNodes * 2)).toLong).distinct.toDF("id")
      def eq(name: String, local: org.apache.spark.sql.DataFrame,
             dist: org.apache.spark.sql.DataFrame): Unit =
        assert(rows(local) == rows(dist), s"trial $trial $name")
      eq("pageRank",
        Components.pageRank(ns, "id", es, "src", "dst", iterations = 4),
        Components.pageRank(ns, "id", es, "src", "dst", iterations = 4, maxLocalEdges = 0L))
      eq("ppr",
        Components.personalizedPageRank(ns, "id", es, "src", "dst", seeds, iterations = 4),
        Components.personalizedPageRank(ns, "id", es, "src", "dst", seeds, iterations = 4,
          maxLocalEdges = 0L))
      eq("bfs",
        Components.bfsDistances(ns, "id", es, "src", "dst", seeds, maxHops = 3),
        Components.bfsDistances(ns, "id", es, "src", "dst", seeds, maxHops = 3,
          maxLocalEdges = 0L))
      eq("labelPropagation",
        Components.labelPropagation(ns, "id", es, "src", "dst", iterations = 3),
        Components.labelPropagation(ns, "id", es, "src", "dst", iterations = 3,
          maxLocalEdges = 0L))
      eq("hits",
        Components.hits(ns, "id", es, "src", "dst", iterations = 3),
        Components.hits(ns, "id", es, "src", "dst", iterations = 3, maxLocalEdges = 0L))
    }
  }

  test("kCore: local route bit-equal (peel-until-fixpoint, capped rounds)") {
    for (k <- Seq(2, 3)) {
      val local = Components.kCore(edges, "src", "dst", k = k)
      val dist = Components.kCore(edges, "src", "dst", k = k, maxLocalEdges = 0L)
      assert(rows(local) == rows(dist), s"k=$k")
    }
    // capped rounds: maxRounds=1 must match one distributed peel exactly
    val local1 = Components.kCore(edges, "src", "dst", k = 3, maxRounds = 1)
    val dist1 = Components.kCore(edges, "src", "dst", k = 3, maxRounds = 1,
      maxLocalEdges = 0L)
    assert(rows(local1) == rows(dist1))
  }
}
