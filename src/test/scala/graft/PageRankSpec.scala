package graft

import graft.ops.Components
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("2-cycle is a stationary point (exact integers)") {
    // a <-> b: each node's in-mass equals its own rank; with scale 1e9 and
    // n=2 the damped update maps 5e8 -> 75e6 + 425e6 = 5e8 exactly
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val pr = Components.pageRank(nodes, "id", edges, "src", "dst", iterations = 7)
      .orderBy("id").select("pr").as[Long].collect().toSeq
    assert(pr == Seq(500000000L, 500000000L))
  }

  test("star graph concentrates rank on the hub; ranks are partitioning-invariant") {
    // 0..9 all point at 10; 10 points at 0
    val nodes = (0L to 10L).toDF("id")
    val edges = ((0L to 9L).map(i => (i, 10L)) :+ ((10L, 0L))).toDF("src", "dst")
    val a = Components.pageRank(nodes, "id", edges, "src", "dst")
      .orderBy("id").select("pr").as[Long].collect().toSeq
    val b = Components.pageRank(nodes.repartition(5), "id", edges.repartition(3), "src", "dst")
      .orderBy("id").select("pr").as[Long].collect().toSeq
    assert(a == b, "integer arithmetic must be partitioning-invariant")
    val hub = a(10); val spoke = a(1)
    assert(hub > 5 * spoke, s"hub $hub vs spoke $spoke")
    // node 0 gets the hub's whole mass back: above the other spokes
    assert(a(0) > spoke)
  }

  test("dangling nodes keep the base rank") {
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L)).toDF("src", "dst") // 1 and 2 dangle
    val pr = Components.pageRank(nodes, "id", edges, "src", "dst", iterations = 3)
      .orderBy("id").select("pr").as[Long].collect().toSeq
    val base = (1000000000L * 15 / 100) / 3
    assert(pr(2) == base) // no in-edges, no out-edges: pure base
    assert(pr(1) > pr(0)) // 1 receives 0's mass
    assert(pr(0) == base) // 0 has no in-edges
  }

  test("personalized pagerank: all-node seeds degenerate to pageRank bit-for-bit") {
    val nodes = (0L to 10L).toDF("id")
    val edges = ((0L to 9L).map(i => (i, 10L)) :+ ((10L, 0L))).toDF("src", "dst")
    val pr = Components.pageRank(nodes, "id", edges, "src", "dst")
      .orderBy("id").select("pr").as[Long].collect().toSeq
    val ppr = Components.personalizedPageRank(nodes, "id", edges, "src", "dst",
        seeds = nodes)
      .orderBy("id").select("pr").as[Long].collect().toSeq
    assert(pr == ppr)
  }

  test("personalized pagerank: rank flows from the seed, unreached nodes score 0") {
    // chain 0 -> 1 -> 2 and an isolated 3; seed = {0}
    val nodes = (0L to 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Components.personalizedPageRank(nodes, "id", edges, "src", "dst",
        seeds = Seq(0L).toDF("id"), iterations = 5)
      .orderBy("id").select("id", "pr").as[(Long, Long)].collect().toMap
    // seed keeps the teleport base; downstream gets damped mass; the
    // isolated node and anything not reachable from the seed get zero
    assert(got(0L) == 150000000L)        // baseFx = 1e9 * 15/100 over 1 seed
    assert(got(1L) > got(2L) && got(2L) > 0L)
    assert(got(3L) == 0L)
  }

  test("triangleCounts: cliques, squares, dirty edges") {
    // K4 on 0-3 (4 triangles, each node in 3), a square 10-13 (0 triangles),
    // a pendant 20-0; dirty input: dup edges, reversed edges, a self-loop
    val edges = (Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (20L, 0L),
      (1L, 0L), (0L, 1L), (5L, 5L)
    )).toDF("s", "d")
    val got = Components.triangleCounts(edges, "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(got(0L) == 3L && got(1L) == 3L && got(2L) == 3L && got(3L) == 3L)
    assert(got(10L) == 0L && got(11L) == 0L && got(12L) == 0L && got(13L) == 0L)
    assert(got(20L) == 0L)
    assert(!got.contains(5L)) // self-loop-only node is not in the graph
    // total triangles = sum / 3
    assert(got.values.sum / 3 == 4L)
  }

  test("clusteringCoefficients: clique 1s, hub 0, pendant null, hand 1/3") {
    // triangle {1,2,3} with a pendant 4 on node 1: cc(1)=2/(3·2)=1/3,
    // cc(2)=cc(3)=1, cc(4)=null (degree 1)
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("s", "d")
    val got = Components.clusteringCoefficients(tri, "s", "d")
      .orderBy("node").as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((1L, 3L, 1L, Some(1.0 / 3.0)), (2L, 2L, 1L, Some(1.0)),
      (3L, 2L, 1L, Some(1.0)), (4L, 1L, 0L, None)))
    // a star hub: degree 4, zero triangles -> cc exactly 0, not null
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("s", "d")
    val hub = Components.clusteringCoefficients(star, "s", "d")
      .where(col("node") === 0L).as[(Long, Long, Long, Option[Double])].collect()(0)
    assert(hub == ((0L, 4L, 0L, Some(0.0))))
    // K4: every node cc 1 (all neighbor pairs closed)
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("s", "d")
    assert(Components.clusteringCoefficients(k4, "s", "d")
      .select("cc").as[Double].collect().forall(_ == 1.0))
  }

  test("degreeAssortativity: star -1, path -1, clique null, random matches scalar Pearson") {
    // star K1,4: every edge joins degree 4 to degree 1 -> exactly -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("s", "d")
    val rs = Components.degreeAssortativity(star, "s", "d").collect()(0)
    assert(rs.getLong(0) == 4L && rs.getDouble(1) == -1.0)
    // clique: constant degrees -> null
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("s", "d")
    assert(Components.degreeAssortativity(k4, "s", "d").collect()(0).isNullAt(1))
    // random graph: matches a driver-side scalar Pearson over the same
    // symmetrized degree pairs to 1e-12
    val es = (1 to 400).map(i => ((i * 17L) % 47L, (i * 31L) % 53L + 47L))
      .toDF("s", "d")
    val got = Components.degreeAssortativity(es, "s", "d").collect()(0).getDouble(1)
    val canon = es.select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .where(col("a") =!= col("b")).distinct().as[(Long, Long)].collect()
    val deg = canon.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.length.toDouble }
    val pairs = canon.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val ref = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(got - ref) < 1e-12, s"$got vs $ref")
  }

  test("kCore: peels cascades, keeps the dense core, handles dirty edges") {
    // K4 core on 0-3; a chain 4-5-6 hanging off node 0; a triangle 7-8-9
    // attached to 0 via 7 — for k=3 the K4 survives, the triangle peels
    // (each node has degree 2 inside it), the chain cascades away
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (0L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L), (0L, 7L),
      (1L, 0L), (2L, 2L) // reverse dup + self-loop
    ).toDF("s", "d")
    val core3 = Components.kCore(edges, "s", "d", k = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(core3 == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
    // k=2: the triangle also survives (degree 2 each); chain still peels
    val core2 = Components.kCore(edges, "s", "d", k = 2)
      .orderBy("node").as[(Long, Long)].collect().map(_._1).toSeq
    assert(core2 == Seq(0L, 1L, 2L, 3L, 7L, 8L, 9L))
    // k above max degree: empty core
    assert(Components.kCore(edges, "s", "d", k = 10).count() == 0L)
    // capped rounds equal the unrolled replay: cap 1 peels only one layer
    val cap1 = Components.kCore(edges, "s", "d", k = 3, maxRounds = 1)
      .orderBy("node").as[(Long, Long)].collect().map(_._1).toSeq
    // round 1 removes deg<3 nodes (5,6 have deg<3? 4:2, 5:2, 6:1, 8:2, 9:2)
    // survivors after exactly one filter round
    assert(cap1.contains(0L) && !cap1.contains(6L))
    assert(cap1 != core3.map(_._1)) // not yet converged at 1 round
  }

  test("weighted pagerank: uniform weights degenerate to pageRank bit-for-bit") {
    val nodes = (0L to 10L).toDF("id")
    val edges = ((0L to 9L).map(i => (i, 10L)) :+ ((10L, 0L))).toDF("src", "dst")
    val pr = Components.pageRank(nodes, "id", edges, "src", "dst")
      .orderBy("id").select("pr").as[Long].collect().toSeq
    // (pr·w) div (d·w) = pr div d for any uniform w
    for (w <- Seq(1L, 7L)) {
      val wpr = Components.weightedPageRank(nodes, "id",
          edges.withColumn("w", lit(w)), "src", "dst", "w")
        .orderBy("id").select("pr").as[Long].collect().toSeq
      assert(pr == wpr, s"uniform w=$w must equal unweighted")
    }
  }

  test("weighted pagerank: mass follows the heavy edge; partitioning-invariant") {
    // 0 points at 1 (weight 9) and 2 (weight 1): 1 gets 9x the contribution
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val a = Components.weightedPageRank(nodes, "id", edges, "src", "dst", "w")
      .orderBy("id").select("pr").as[Long].collect().toSeq
    val b = Components.weightedPageRank(nodes.repartition(5), "id",
        edges.repartition(3), "src", "dst", "w")
      .orderBy("id").select("pr").as[Long].collect().toSeq
    assert(a == b, "integer arithmetic must be partitioning-invariant")
    // 9:1 edge split, muted by the base term and recirculation: ~4.3x here
    assert(a(1) > 4 * a(2), s"heavy-edge target ${a(1)} vs light ${a(2)}")
  }

  test("hits: hubs cite authorities; max nodes pin to scale; partitioning-invariant") {
    // 0,1 each point at {3,4}; 2 points only at 4; 4 is the stronger
    // authority (3 citers incl. both strong hubs), 0,1 the strongest hubs
    val nodes = (0L to 4L).toDF("id")
    val edges = Seq((0L, 3L), (0L, 4L), (1L, 3L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val out = Components.hits(nodes, "id", edges, "src", "dst")
      .orderBy("id").select("id", "hub", "authority")
      .as[(Long, Long, Long)].collect().toSeq
    val hub = out.map(_._2); val auth = out.map(_._3)
    // L-infinity normalization pins the best hub/authority at exactly scale
    assert(hub.max == 1000000000L && auth.max == 1000000000L)
    assert(auth(4) == 1000000000L && auth(4) > auth(3), s"auth: $auth")
    assert(hub(0) == 1000000000L && hub(1) == 1000000000L && hub(0) > hub(2), s"hub: $hub")
    // pure authorities have hub 0; pure hubs have authority 0
    assert(hub(3) == 0L && hub(4) == 0L && auth(0) == 0L && auth(1) == 0L && auth(2) == 0L)
    val repart = Components.hits(nodes.repartition(5), "id",
        edges.repartition(3), "src", "dst")
      .orderBy("id").select("id", "hub", "authority")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == repart, "integer arithmetic must be partitioning-invariant")
  }

  test("coOccurrence: pair counts, hot-key cap, duplicate pairs collapse") {
    // session 1: {a,b,c}; session 2: {a,b}; session 3 (hot): {a..e};
    // duplicate (k,i) rows collapse before pairing
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"),
      (2L, "a"), (2L, "b")) ++ Seq("a", "b", "c", "d", "e").map((3L, _))
    val df = rows.toDF("k", "i")
    val got = Components.coOccurrence(df, "k", "i", maxKeyItems = 4)
      .as[(String, String, Long)].collect().toSet
    // session 3 (5 items > cap) contributes nothing
    assert(got == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
    // minCount prunes the tail
    val pruned = Components.coOccurrence(df, "k", "i", maxKeyItems = 4, minCount = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pruned == Set(("a", "b", 2L)))
  }

  test("bfsDistances: hop counts on a chain, direction respected, cap leaves NULLs") {
    // directed chain 0→1→2→3→4 plus a back-edge 4→0; seed {0}
    val nodes = (0L to 5L).toDF("id") // 5 is isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = Components.bfsDistances(nodes, "id", edges, "src", "dst", seeds, maxHops = 6)
      .orderBy("id").select("dist").as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(0L), Some(1L), Some(2L), Some(3L), Some(4L), None))
    // a 2-hop cap leaves the far nodes NULL (capped ≡ unrolled replay)
    val capped = Components.bfsDistances(nodes, "id", edges, "src", "dst", seeds, maxHops = 2)
      .orderBy("id").select("dist").as[Option[Long]].collect().toSeq
    assert(capped == Seq(Some(0L), Some(1L), Some(2L), None, None, None))
    // multi-source: nearest seed wins
    val two = Components.bfsDistances(nodes, "id", edges, "src", "dst",
        Seq(0L, 3L).toDF("id"), maxHops = 6)
      .orderBy("id").select("dist").as[Option[Long]].collect().toSeq
    assert(two == Seq(Some(0L), Some(1L), Some(2L), Some(0L), Some(1L), None))
  }

  test("labelPropagation: splits bridged cliques into communities; deterministic") {
    // two 4-cliques joined by ONE bridge edge (3-10): connected components
    // would merge everything; LPA cuts at the bridge
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L)))
      .toDF("src", "dst")
    val nodes = (Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L) :+ 99L).toDF("id") // 99 isolated
    val out = Components.labelPropagation(nodes, "id", edges, "src", "dst")
      .orderBy("id").select("id", "community").as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).map(out).toSet.size == 1, s"left clique: $out")
    assert(Seq(10L, 11L, 12L, 13L).map(out).toSet.size == 1, s"right clique: $out")
    assert(out(0L) != out(10L), "the bridge must NOT merge the cliques")
    assert(out(99L) == 99L, "isolated nodes keep their own label")
    // deterministic under any layout
    val repart = Components.labelPropagation(nodes.repartition(5), "id",
        edges.repartition(3), "src", "dst")
      .orderBy("id").select("id", "community").as[(Long, Long)].collect().toMap
    assert(out == repart)
  }

  test("triangleCounts: partitioning-invariant on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("s", "d")
    val a = Components.triangleCounts(es, "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val b = Components.triangleCounts(es.repartition(13), "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b && a.map(_._2).sum > 0)
  }
}

