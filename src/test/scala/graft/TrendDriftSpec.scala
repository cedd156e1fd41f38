package graft

import graft.ops.{Components, Correlation, Windows}
import graft.scan.Drift
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-13 statistics batches: k-sample drift (Kruskal–Wallis, ANOVA F,
  * Brown–Forsythe), two-sample drift (Welch t, energy distance,
  * Cramér–von Mises), effect size (Cliff's δ), JS divergence,
  * Mann–Kendall + Sen slope, cross-correlation, time-grid gap fill
  * (LOCF), partition modularity, link prediction, OHLC bars and RFM
  * scoring. Fixtures with hand-computed closed-form expectations — the
  * oracle replays the engine's arithmetic, so only closed forms catch a
  * bug both sides share (the round-13 SSW incident).
  */
class TrendDriftSpec extends SparkSpec {
  import spark.implicits._

  test("kruskalWallis: identical groups score ~0, separated groups score high") {
    // three groups drawn from the same values — H ≈ 0
    val same = Seq.tabulate(90)(i => (s"g${i % 3}", (i / 3).toLong)).toDF("g", "v")
    val h0 = Drift.kruskalWallis(same, "v", "g").collect()(0)
    assert(h0.getAs[Long]("groups") == 3 && h0.getAs[Long]("n") == 90)
    assert(math.abs(h0.getAs[Double]("h")) < 0.5, s"null-case H should be ~0: $h0")
    // fully separated groups — H near the (k-1)-scaled maximum
    val sep = Seq.tabulate(90)(i => (s"g${i / 30}", i.toLong)).toDF("g", "v")
    val h1 = Drift.kruskalWallis(sep, "v", "g").collect()(0).getAs[Double]("h")
    assert(h1 > 70.0, s"separated-case H should be large: $h1")
  }

  test("kruskalWallis: all-ties degenerate case yields null h (zero correction)") {
    val allSame = Seq.tabulate(12)(i => (s"g${i % 2}", 7L)).toDF("g", "v")
    val r = Drift.kruskalWallis(allSame, "v", "g").collect()(0)
    // C = 1 − (N³−N)/(N³−N) = 0 → h null, tie_term = N³−N
    assert(r.isNullAt(r.fieldIndex("h")))
    assert(r.getAs[Long]("tie_term") == 12L * 12 * 12 - 12)
  }

  test("anovaF: known two-group fixture matches the closed form") {
    // g0 = {0, 2}, g1 = {10, 12}: grand mean 6, SSB = 2·36·2 = 100+... exact:
    // means 1 and 11, SSB = 2(1−6)² + 2(11−6)² = 100, SSW = (1+1)+(1+1) = 4
    // F = (100/1)/(4/2) = 50
    val df = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L)).toDF("g", "v")
    val r = Drift.anovaF(df, "v", "g").collect()(0)
    assert(r.getAs[Long]("groups") == 2 && r.getAs[Long]("n") == 4)
    assert(math.abs(r.getAs[Double]("ssb") - 100.0) <= 2.0, s"ssb: $r")
    assert(math.abs(r.getAs[Double]("ssw") - 4.0) <= 2.0, s"ssw: $r")
    assert(math.abs(r.getAs[Double]("f") - 50.0) < 26.0, s"f: $r") // floor error ≤1 per term
  }

  test("anovaF: zero within-group variance yields null F") {
    val df = Seq(("a", 1L), ("a", 1L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val r = Drift.anovaF(df, "v", "g").collect()(0)
    assert(r.isNullAt(r.fieldIndex("f")))
    assert(r.getAs[Double]("ssw") == 0.0)
  }

  test("cliffsDelta: disjoint populations hit ±1, identical hit 0") {
    val lo = Seq.tabulate(20)(i => i.toLong).toDF("v")
    val hi = Seq.tabulate(20)(i => 100L + i).toDF("v")
    val up = Drift.cliffsDelta(hi, lo, "v").collect()(0)
    assert(up.getAs[Double]("delta") == 1.0 && up.getAs[String]("magnitude") == "large")
    val dn = Drift.cliffsDelta(lo, hi, "v").collect()(0)
    assert(dn.getAs[Double]("delta") == -1.0 && dn.getAs[String]("magnitude") == "large")
    val eq = Drift.cliffsDelta(lo, lo, "v").collect()(0)
    assert(eq.getAs[Double]("delta") == 0.0 && eq.getAs[String]("magnitude") == "negligible")
  }

  test("jsDivergence: identical mixes score 0; disjoint mixes score ln 2") {
    val a = Seq.fill(50)("x").++(Seq.fill(50)("y")).toDF("k")
    val same = Drift.jsDivergence(a, a, "k").collect()(0)
    assert(same.getAs[Long]("js_fx") == 0L)
    val b = Seq.fill(100)("z").toDF("k")
    val dis = Drift.jsDivergence(a, b, "k").collect()(0)
    assert(math.abs(dis.getAs[Double]("js") - math.log(2.0)) < 1e-9, s"$dis")
    assert(dis.getAs[Long]("categories") == 3)
  }

  test("mannKendall: strictly increasing series has S = n_pairs, exact Sen slope") {
    // v = 3t → every pair concordant, every pairwise slope exactly 3
    val df = Seq.tabulate(10)(t => ("k", t.toLong, 3L * t)).toDF("g", "t", "v")
    val r = Correlation.mannKendall(df, Seq("g"), "t", "v").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 45 && r.getAs[Long]("s_stat") == 45)
    assert(r.getAs[Double]("sen_slope") == 3.0)
    assert(r.getAs[Long]("tie_term") == 0)
    assert(r.getAs[Double]("z") > 3.5)
  }

  test("mannKendall: constant series is all ties — var18 = 0, null z, zero sen") {
    val df = Seq.tabulate(6)(t => ("k", t.toLong, 5L)).toDF("g", "t", "v")
    val r = Correlation.mannKendall(df, Seq("g"), "t", "v").collect()(0)
    assert(r.getAs[Long]("s_stat") == 0)
    // tie term with one run of 6 equals n(n−1)(2n+5) → var18 = 0 → z null
    assert(r.getAs[Long]("var18") == 0 && r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[Double]("sen_slope") == 0.0)
  }

  test("mannKendall: single-tick group emits a row with null pair stats") {
    val df = Seq(("solo", 1L, 9L), ("duo", 1L, 1L), ("duo", 2L, 2L))
      .toDF("g", "t", "v")
    val rows = Correlation.mannKendall(df, Seq("g"), "t", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(rows("solo").isNullAt(rows("solo").fieldIndex("n_pairs")))
    assert(rows("duo").getAs[Long]("s_stat") == 1)
  }

  test("mannKendall: even pair count medians the two middle slopes") {
    // t=0..3, v = 0, 10, 12, 13 → 6 slopes: 10,6,13/3,2,1.5,1 sorted
    // 1,1.5,2,13/3,6,10 → median = (2 + 13/3)/2
    val df = Seq(("k", 0L, 0L), ("k", 1L, 10L), ("k", 2L, 12L), ("k", 3L, 13L))
      .toDF("g", "t", "v")
    val r = Correlation.mannKendall(df, Seq("g"), "t", "v").collect()(0)
    assert(math.abs(r.getAs[Double]("sen_slope") - (2.0 + 13.0 / 3.0) / 2.0) < 1e-12)
  }

  test("gapFill: carries last observation across empty ticks, flags observed") {
    val step = 60L
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 30L, 2.0),  // tick 0: last obs wins (2.0)
      ("a", 180L, 5.0),                 // tick 3; ticks 1–2 are gaps
      ("b", 600L, 9.0))                 // single-tick key
      .toDF("key0", "sec", "v")
      .select(col("key0"), timestamp_seconds(col("sec")).as("ts"), col("v"))
    val out = Windows.gapFill(rows, "key0", "ts", "v", step)
      .orderBy("key", "grid_ts").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.length == 4, s"a should span 4 ticks: ${a.mkString(";")}")
    assert(a.map(_.getAs[Double]("value")).toSeq == Seq(2.0, 2.0, 2.0, 5.0))
    assert(a.map(_.getAs[Boolean]("observed")).toSeq ==
      Seq(true, false, false, true))
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b(0).getAs[Double]("value") == 9.0)
  }

  test("gapFill: exact-ts ties break by value desc; null values are non-observations") {
    val rows = Seq(
      ("k", 10L, Some(3.0)), ("k", 10L, Some(7.0)), // same ts → 7.0 wins
      ("k", 130L, None))                            // null: no tick opens
      .toDF("key0", "sec", "v")
      .select(col("key0"), timestamp_seconds(col("sec")).as("ts"),
        col("v").cast("double"))
    val out = Windows.gapFill(rows, "key0", "ts", "v", 60L).collect()
    assert(out.length == 1, s"null obs must not extend the grid: ${out.mkString(";")}")
    assert(out(0).getAs[Double]("value") == 7.0)
  }

  test("modularity: two disjoint cliques under their own labels ≈ 0.5; merged label = 0") {
    // two 4-cliques: m = 12; per clique e_c = 6, d_c = 12
    // Q = 2·(6/12 − (12/24)²) = 2·(0.5 − 0.25) = 0.5
    val clique = for {
      base <- Seq(0L, 10L); i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val edges = clique.toDF("src", "dst")
    val labels = Seq.tabulate(4)(i => (i.toLong, 0L))
      .++(Seq.tabulate(4)(i => (10L + i, 1L))).toDF("id", "lbl")
    val r = Components.modularity(edges, "src", "dst", labels, "id", "lbl").collect()(0)
    assert(r.getAs[Long]("m_edges") == 12 && r.getAs[Long]("communities") == 2)
    assert(r.getAs[Double]("modularity") == 0.5)
    // everything in ONE community: Q = m/m − (2m/2m)² = 0 exactly
    val one = labels.withColumn("lbl", lit(0L))
    val r1 = Components.modularity(edges, "src", "dst", one, "id", "lbl").collect()(0)
    assert(r1.getAs[Double]("modularity") == 0.0)
  }

  test("modularity: labelPropagation communities beat a random split on a clustered graph") {
    // two cliques bridged by one edge; LPA labels should score higher than
    // a pathological alternating split
    val clique = for {
      base <- Seq(0L, 10L); i <- 0 to 4; j <- (i + 1) to 4
    } yield (base + i, base + j)
    val edges = (clique :+ (0L, 10L)).toDF("src", "dst")
    val nodes = (0L to 4L).++(10L to 14L).toDF("id")
    val lpa = Components.labelPropagation(nodes, "id", edges, "src", "dst", iterations = 4)
    val qLpa = Components.modularity(edges, "src", "dst", lpa, "id", "community")
      .collect()(0).getAs[Double]("modularity")
    val alternating = nodes.withColumn("lbl", col("id") % 2)
    val qAlt = Components.modularity(edges, "src", "dst", alternating, "id", "lbl")
      .collect()(0).getAs[Double]("modularity")
    assert(qLpa > qAlt, s"LPA $qLpa should beat alternating $qAlt")
    assert(qLpa > 0.3, s"real structure should score > 0.3: $qLpa")
  }

  test("modularity: unlabeled endpoints drop edges (subgraph semantics)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 9L)).toDF("src", "dst")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("id", "lbl") // 9 missing
    val r = Components.modularity(edges, "src", "dst", labels, "id", "lbl").collect()(0)
    assert(r.getAs[Long]("m_edges") == 2)
  }

  test("acf: exact period-2 alternation scores -1 at lag 1 and +1 at lag 2") {
    val df = Seq.tabulate(20)(t => ("k", t.toLong, if (t % 2 == 0) 10L else 20L))
      .toDF("g", "t", "v")
    val r = Correlation.acf(df, Seq("g"), "t", "v", maxLag = 3)
      .orderBy("lag").collect()
    assert(r.map(_.getAs[Long]("lag")).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(r(0).getAs[Double]("acf") - (-1.0)) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("acf") - 1.0) < 1e-12)
    assert(r(0).getAs[Long]("n_pairs") == 19)
  }

  test("acf: gaps shrink the overlap instead of misaligning it") {
    // ticks 0,1,2,5,6,7 — lag 1 pairs: (0,1),(1,2),(5,6),(6,7) = 4
    val df = Seq(0L, 1L, 2L, 5L, 6L, 7L).zipWithIndex
      .map { case (t, i) => ("k", t, (i * i).toLong) }.toDF("g", "t", "v")
    val r = Correlation.acf(df, Seq("g"), "t", "v", maxLag = 1).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 4)
  }

  test("kendallTauB: perfect concordance 1, perfect discordance -1, tie-corrected mid") {
    val up = Seq.tabulate(8)(t => ("k", t.toLong, t.toLong, t.toLong * 3))
      .toDF("g", "t", "x", "y")
    val r1 = Correlation.kendallTauB(up, Seq("g"), "t", "x", "y").collect()(0)
    assert(r1.getAs[Double]("tau_b") == 1.0 && r1.getAs[Long]("cd") == 28)
    val dn = Seq.tabulate(8)(t => ("k", t.toLong, t.toLong, -t.toLong))
      .toDF("g", "t", "x", "y")
    assert(Correlation.kendallTauB(dn, Seq("g"), "t", "x", "y")
      .collect()(0).getAs[Double]("tau_b") == -1.0)
    // y all-ties → dy2 = 0 → null tau, tie_y_pairs = n(n−1)/2
    val flat = Seq.tabulate(6)(t => ("k", t.toLong, t.toLong, 5L))
      .toDF("g", "t", "x", "y")
    val rf = Correlation.kendallTauB(flat, Seq("g"), "t", "x", "y").collect()(0)
    assert(rf.isNullAt(rf.fieldIndex("tau_b")))
    assert(rf.getAs[Long]("tie_y_pairs") == 15)
  }

  test("mcnemar: closed-form counts and chi2; null-row exclusion; never-disagree null") {
    val df = Seq(
      (true, true), (true, true),          // both ×2
      (true, false), (true, false), (true, false), // only_a ×3
      (false, true),                       // only_b ×1
      (false, false))                      // neither ×1
      .toDF("a", "b")
    val r = Drift.mcnemar(df, col("a"), col("b")).collect()(0)
    assert(r.getAs[Long]("n") == 7 && r.getAs[Long]("both") == 2 &&
      r.getAs[Long]("only_a") == 3 && r.getAs[Long]("only_b") == 1 &&
      r.getAs[Long]("neither") == 1)
    assert(r.getAs[Double]("chi2") == (3.0 - 1.0) * (3.0 - 1.0) / 4.0)
    // null rows excluded entirely
    val withNull = Seq((Some(true), Some(true)), (None, Some(true)))
      .toDF("a", "b")
    assert(Drift.mcnemar(withNull, col("a"), col("b"))
      .collect()(0).getAs[Long]("n") == 1)
    // agreement-only → chi2 null
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val ra = Drift.mcnemar(agree, col("a"), col("b")).collect()(0)
    assert(ra.isNullAt(ra.fieldIndex("chi2")))
  }

  test("welchT: closed-form two-sample fixture (unequal n, unequal variance)") {
    // ref = {0, 2}: mean 1, s² = 2; cur = {10, 12, 14}: mean 12, s² = 4
    // se = 2/2 + 4/3 = 7/3; t = −11/√(7/3); df = (7/3)²/(1 + (4/3)²/2) = 49/17
    val ref = Seq(0L, 2L).toDF("v")
    val cur = Seq(10L, 12L, 14L).toDF("v")
    val r = Drift.welchT(ref, cur, "v").collect()(0)
    assert(r.getAs[Long]("n_ref") == 2 && r.getAs[Long]("n_cur") == 3)
    assert(r.getAs[Double]("mean_ref") == 1.0 && r.getAs[Double]("mean_cur") == 12.0)
    assert(r.getAs[Double]("var_ref") == 2.0 && r.getAs[Double]("var_cur") == 4.0)
    assert(math.abs(r.getAs[Double]("t") - (-11.0 / math.sqrt(7.0 / 3.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("df") - 49.0 / 17.0) < 1e-12)
  }

  test("welchT: single-row side yields null t/df, means intact") {
    val r = Drift.welchT(Seq(5L).toDF("v"), Seq(1L, 3L).toDF("v"), "v").collect()(0)
    assert(r.getAs[Double]("mean_ref") == 5.0 && r.getAs[Double]("mean_cur") == 2.0)
    assert(r.isNullAt(r.fieldIndex("t")) && r.isNullAt(r.fieldIndex("df")))
    assert(r.isNullAt(r.fieldIndex("var_ref")) && r.getAs[Double]("var_cur") == 2.0)
  }

  test("brownForsythe: variance shift detected; equal spreads score ~0") {
    // g0 = {0,10,20} → doubled median 20, z = {20,0,20};
    // g1 = {100,101,102,103} → md = 203, z = {3,1,1,3}
    // exact SSB = 220.19…, SSW = 800/3 + 4 = 270.67… (floored per group)
    val df = Seq(("g0", 0L), ("g0", 10L), ("g0", 20L),
      ("g1", 100L), ("g1", 101L), ("g1", 102L), ("g1", 103L)).toDF("g", "v")
    val r = Drift.brownForsythe(df, "v", "g").collect()(0)
    assert(r.getAs[Long]("groups") == 2 && r.getAs[Long]("n") == 7)
    val ssb = r.getAs[Double]("ssb"); val ssw = r.getAs[Double]("ssw")
    assert(ssb >= 218.0 && ssb <= 221.0, s"ssb: $r")
    assert(ssw >= 268.0 && ssw <= 271.0, s"ssw: $r")
    assert(r.getAs[Double]("f") == (ssb / 1.0) / (ssw / 5.0))
    // identical spreads, different locations → median-centered groups
    // identical → SSB collapses to floor error
    val same = Seq(("g0", 0L), ("g0", 10L), ("g0", 20L),
      ("g1", 100L), ("g1", 110L), ("g1", 120L)).toDF("g", "v")
    val r2 = Drift.brownForsythe(same, "v", "g").collect()(0)
    assert(math.abs(r2.getAs[Double]("ssb")) <= 2.0, s"equal-spread ssb: $r2")
  }

  test("energyDistance: identical samples → 0 exactly; shifted closed form") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val r0 = Drift.energyDistance(a, Seq(1L, 2L, 3L).toDF("v"), "v").collect()(0)
    assert(r0.getAs[Double]("e") == 0.0 && r0.getAs[Double]("t_stat") == 0.0)
    // ref {0,1}, cur {10,11}: SAB = 40, SAA = SBB = 1
    // e = 2·40/4 − 2/4 − 2/4 = 19; t = (4/4)·19 = 19
    val r1 = Drift.energyDistance(Seq(0L, 1L).toDF("v"),
      Seq(10L, 11L).toDF("v"), "v").collect()(0)
    assert(r1.getAs[Double]("sum_cross") == 40.0)
    assert(r1.getAs[Double]("sum_ref") == 1.0 && r1.getAs[Double]("sum_cur") == 1.0)
    assert(r1.getAs[Double]("e") == 19.0 && r1.getAs[Double]("t_stat") == 19.0)
  }

  test("cramerVonMises: identical tied samples → T = 0; disjoint closed form") {
    // ref = cur = {1,2}: tie-averaged ranks align combined and own ranks
    // exactly → U = n₁n₂(4n₁n₂−1)/… here T = 10/16 − 15/24 = 0
    val r0 = Drift.cramerVonMises(Seq(1L, 2L).toDF("v"),
      Seq(1L, 2L).toDF("v"), "v").collect()(0)
    assert(r0.getAs[Double]("u4") == 40.0 && r0.getAs[Double]("t") == 0.0)
    // disjoint {1,2} vs {10,20}: a1 = 0, a2 = 32, U = 16, T = 1 − 15/24
    val r1 = Drift.cramerVonMises(Seq(1L, 2L).toDF("v"),
      Seq(10L, 20L).toDF("v"), "v").collect()(0)
    assert(r1.getAs[Double]("u4") == 64.0)
    assert(math.abs(r1.getAs[Double]("t") - 0.375) < 1e-15)
  }

  test("ccf: a series and its 2-tick delay peak at lag +2") {
    // tick i carries x_i and y_i = x_{i−2} ⇒ (x_i, y_{i+2}) = (x_i, x_i)
    val x = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L)
    val simple = (2 until 8).map(i => ("a", i.toLong, x(i), x(i - 2)))
      .toDF("g", "t", "x", "y")
    val out = graft.ops.Correlation.ccf(simple, Seq("g"), "t", "x", "y", maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Long]("n_pairs"), Option(r.getAs[Any]("ccf")).map(_.asInstanceOf[Double]))))
      .toMap
    // lag +2: (x_i, y_{i+2}) = (x_i, x_i) over i = 2..5 → r = 1
    assert(out(2L)._1 == 4 && math.abs(out(2L)._2.get - 1.0) < 1e-12, s"$out")
    assert(out(0L)._2.forall(v => v < 0.999), s"aligned lag should not be perfect: $out")
  }

  test("linkPrediction: path pair scored, adjacent and hub-centered pairs excluded") {
    // path 1−2−3: only candidate (1,3) through center 2 (deg 2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Components.linkPrediction(path, "src", "dst").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("a") == 1L && r(0).getAs[Long]("b") == 3L)
    assert(r(0).getAs[Long]("common_neighbors") == 1L)
    assert(r(0).getAs[Long]("aa_fx") == math.floor(1e12 / math.log(2.0)).toLong)
    assert(r(0).getAs[Double]("jaccard") == 1.0)
    // triangle 1-2-3 + spoke 1-4: (2,3) adjacent → excluded;
    // (2,4)/(3,4) share center 1 (deg 3)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val pairs = Components.linkPrediction(tri, "src", "dst").collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b"))).toSet
    assert(pairs == Set((2L, 4L), (3L, 4L)), s"$pairs")
    // hub cap: star center deg 3 > maxDegree 2 → no wedges survive
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(Components.linkPrediction(star, "src", "dst", maxDegree = 2L).isEmpty)
  }

  test("ohlcBars: total-order open/close on tied timestamps, exact sums") {
    val base = 1699999980L * 1000000L // 60s-aligned epoch anchor
    def ts(s: Long) = new java.sql.Timestamp((base + s * 1000000L) / 1000L)
    val df = Seq(
      ("k", ts(0), 5.0), ("k", ts(0), 3.0), // tied open tick → open = min v
      ("k", ts(30), 9.0),
      ("k", ts(59), 7.0), ("k", ts(59), 8.0), // tied close tick → close = max v
      ("k", ts(70), 1.0)).toDF("key", "ts", "v")
    val out = Windows.ohlcBars(df, "key", "ts", "v", windowSeconds = 60)
      .orderBy("window_start").collect()
    assert(out.length == 2)
    val w0 = out(0)
    assert(w0.getAs[Long]("open") == 300L && w0.getAs[Long]("close") == 800L)
    assert(w0.getAs[Long]("high") == 900L && w0.getAs[Long]("low") == 300L)
    assert(w0.getAs[Long]("n_ticks") == 5L && w0.getAs[Long]("sum_fx") == 3200L)
    assert(w0.getAs[Double]("mean") == 640.0)
    val w1 = out(1)
    assert(w1.getAs[Long]("open") == 100L && w1.getAs[Long]("close") == 100L &&
      w1.getAs[Long]("n_ticks") == 1L)
  }

  test("rfmScores: exact quartiles, ties share a score") {
    val dayUs = 86400000000L
    def ts(day: Long) = new java.sql.Timestamp(day * dayUs / 1000L)
    val orders = Seq(
      (1L, ts(0), 10.0),
      (2L, ts(1), 10.0), (2L, ts(2), 10.0),
      (3L, ts(3), 10.0), (3L, ts(4), 10.0), (3L, ts(5), 10.0),
      (4L, ts(6), 10.0), (4L, ts(7), 10.0), (4L, ts(8), 10.0), (4L, ts(9), 10.0)
    ).toDF("cust", "ts", "amt")
    val out = graft.ops.Events.rfmScores(orders, "cust", "ts", "amt",
        asOfUs = 10L * dayUs, k = 4)
      .orderBy("entity").collect()
    // recency_days: 10, 8, 5, 1 → r scores 1..4; frequency 1..4; monetary
    // 10..40 dollars → same ordering
    assert(out.map(_.getAs[Long]("recency_days")).toSeq == Seq(10L, 8L, 5L, 1L))
    assert(out.map(_.getAs[Long]("r_score")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("f_score")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("m_score")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Long]("rfm")).toSeq == Seq(111L, 222L, 333L, 444L))
    // add a twin of customer 4 → the tied pair shares every score
    val twin = orders.unionAll(Seq(
      (5L, ts(6), 10.0), (5L, ts(7), 10.0), (5L, ts(8), 10.0), (5L, ts(9), 10.0)
    ).toDF("cust", "ts", "amt"))
    val o2 = graft.ops.Events.rfmScores(twin, "cust", "ts", "amt",
        asOfUs = 10L * dayUs, k = 4)
      .orderBy("entity").collect()
    val c4 = o2(3); val c5 = o2(4)
    assert(c4.getAs[Long]("rfm") == c5.getAs[Long]("rfm"))
  }

  test("changepointSplit: step series localizes the boundary with exact stat") {
    // [10,10,10,20,20,20]: k=3 → |30·6−90·3|/(6·√9) = 90/18 = 5.0 exact
    val df = (1 to 6).map(i => ("a", i.toLong, if (i <= 3) 10.0 else 20.0))
      .toDF("g", "t", "v")
    val r = graft.ops.Outliers.changepointSplit(df, Seq("g"), "t", "v",
      fxScale = 0).collect()(0)
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("k_split") == 3 &&
      r.getAs[Long]("split_tick") == 3)
    assert(r.getAs[Double]("stat") == 5.0)
    assert(r.getAs[Double]("mean_left") == 10.0 && r.getAs[Double]("mean_right") == 20.0)
  }

  test("changepointSplit: equal-stat candidates break to the smaller k") {
    // [1,2,1]: k=1 and k=2 both score 1/(3√2) — smaller k wins
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 1.0)).toDF("g", "t", "v")
    val r = graft.ops.Outliers.changepointSplit(df, Seq("g"), "t", "v",
      fxScale = 0).collect()(0)
    assert(r.getAs[Long]("k_split") == 1L, s"$r")
  }

  test("zipfFit: replayed fixed-point OLS over a tiny rank-frequency curve") {
    // tf = {8,4,2} at ranks {1,2,3}
    val doc = (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++ Seq.fill(2)("cc")).mkString(" ")
    val out = graft.ops.TextAnalysis.zipfFit(Seq((1L, doc)).toDF("doc_id", "text"),
      "text", topN = 10).collect()(0)
    assert(out.getAs[Long]("n_ranks") == 3)
    // replay the exact arithmetic: pico fixed-point logs, integer moments
    def fx(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    val pts = Seq((1L, 8L), (2L, 4L), (3L, 2L)).map { case (r0, f0) =>
      (fx(math.log(r0.toDouble)), fx(math.log(f0.toDouble))) }
    val n = BigInt(3)
    val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
    val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val num = (n * sxy - sx * sy).toDouble
    val dx = (n * sxx - sx * sx).toDouble
    val dy = (n * syy - sy * sy).toDouble
    val rr = num / (math.sqrt(dx) * math.sqrt(dy))
    assert(out.getAs[Double]("slope") == num / dx)
    assert(out.getAs[Double]("zipf_s") == -(num / dx))
    assert(out.getAs[Double]("r2") == rr * rr)
    assert(out.getAs[Double]("intercept") ==
      (sy.toDouble - num / dx * sx.toDouble) / 3.0 / 1e12)
    // natural-ish decay: s in a plausible band, strong fit
    assert(out.getAs[Double]("zipf_s") > 0.5 && out.getAs[Double]("r2") > 0.95)
  }

  test("scanClusters: two cliques, a bridging hub and a pendant outlier") {
    // K4 {1..4} + K4 {5..8}; node 9 bridges 1 and 5; pendant 10 hangs off 9.
    // At eps 0.6 / mu 3: clique members are cores (within-clique sim
    // 4/√20 ≈ 0.894), 9 reaches no core eps-similarly (2/√20 ≈ 0.447)
    // but touches both clusters → hub; 10's only neighbor is unlabeled → outlier
    def k4(off: Long) = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (off + i, off + j)
    val edges = (k4(1) ++ k4(5) ++ Seq((1L, 9L), (5L, 9L), (9L, 10L)))
      .toDF("src", "dst")
    val out = Components.scanClusters(edges, "src", "dst", eps = 0.6, mu = 3)
      .collect().map(r => r.getAs[Long]("node") ->
        ((r.getAs[String]("role"), Option(r.getAs[Any]("cluster"))))).toMap
    assert(out.size == 10)
    (1L to 4L).foreach(n => assert(out(n) == (("core", Some(1L))), s"$n: ${out(n)}"))
    (5L to 8L).foreach(n => assert(out(n) == (("core", Some(5L))), s"$n: ${out(n)}"))
    assert(out(9L) == (("hub", None)), s"9: ${out(9L)}")
    assert(out(10L) == (("outlier", None)), s"10: ${out(10L)}")
  }

  test("scanClusters: border nodes attach to the minimum eps-adjacent core cluster") {
    // K4 {1..4} with a pendant 20 on node 4: sim(4,20) = 2/√10 ≈ 0.632 ≥ 0.6
    // → 20 is eps-adjacent to core 4 but not core itself → border of cluster 1
    def k4(off: Long) = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (off + i, off + j)
    val edges = (k4(1) ++ Seq((4L, 20L))).toDF("src", "dst")
    val out = Components.scanClusters(edges, "src", "dst", eps = 0.6, mu = 3)
      .collect().map(r => r.getAs[Long]("node") ->
        ((r.getAs[String]("role"), Option(r.getAs[Any]("cluster"))))).toMap
    assert(out(20L) == (("border", Some(1L))), s"20: ${out(20L)}")
    assert(out(4L)._1 == "core")
  }

  test("isotonicCalibrate: classic PAV pooling, strictly increasing rates, apply clamps") {
    import graft.ops.LinearProbe
    // per-score rates [0,1,0,0,1,1] → pools [0.1]=0, [0.2..0.4]=1/3, [0.5..0.6]=1
    val df = Seq((0.1, false), (0.2, true), (0.3, false), (0.4, false),
      (0.5, true), (0.6, true)).toDF("score", "label")
    val table = LinearProbe.isotonicCalibrate(df, "score", "label")
    val rows = table.collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Double]("score_lo") == 0.1 && rows(0).getAs[Double]("rate") == 0.0)
    assert(rows(1).getAs[Double]("score_lo") == 0.2 &&
      rows(1).getAs[Double]("score_hi") == 0.4 &&
      rows(1).getAs[Double]("rate") == 1.0 / 3.0)
    assert(rows(2).getAs[Double]("score_lo") == 0.5 && rows(2).getAs[Double]("rate") == 1.0)
    // rates strictly increasing by construction
    assert(rows.map(_.getAs[Double]("rate")).sliding(2).forall(p => p(0) < p(1)))
    // step-function application with clamping on both ends
    val applied = LinearProbe.applyCalibration(
        Seq(0.05, 0.35, 0.9).toDF("score"), "score", table)
      .orderBy("score").collect().map(_.getAs[Double]("calibrated"))
    assert(applied.toSeq == Seq(0.0, 1.0 / 3.0, 1.0))
  }

  test("isotonicCalibrate: over-cardinality scores pre-bin equi-depth, stay monotone") {
    import graft.ops.LinearProbe
    // 100 distinct scores, noisy-but-increasing label probability; force
    // the binned route with maxBins = 8
    val rows = (1 to 100).map(i => (i / 100.0, (i + (i % 7) * 13) % 100 > 50))
    val table = LinearProbe.isotonicCalibrate(rows.toDF("score", "label"),
      "score", "label", maxBins = 8)
    val t = table.collect()
    assert(t.length <= 8 && t.map(_.getAs[Long]("n")).sum == 100)
    assert(t.map(_.getAs[Double]("rate")).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    // pools cover the score range in order
    assert(t.map(_.getAs[Double]("score_lo")).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
  }

  test("seasonalProfile: pure period-2 alternation reads ±amplitude, edges excluded") {
    // v = 10 on even ticks, 20 on odd: the ±1 MA at an even tick averages
    // (20+10+20)/3 = 50/3 → det = −20/3; at an odd tick 40/3 → det = +20/3
    val df = (0 until 10).map(i => ("a", i.toLong, if (i % 2 == 0) 10.0 else 20.0))
      .toDF("g", "t", "v")
    val out = graft.ops.Outliers.seasonalProfile(df, Seq("g"), "t", "v", period = 2)
      .orderBy("phase").collect()
    assert(out.length == 2)
    // ticks 1..8 have full windows: 4 per phase
    assert(out.forall(_.getAs[Long]("n") == 4))
    assert(math.abs(out(0).getAs[Double]("seasonal") + 20.0 / 3.0) < 1e-6)
    assert(math.abs(out(1).getAs[Double]("seasonal") - 20.0 / 3.0) < 1e-6)
    // the two indices are exact mirror images in fixed point
    assert(out(0).getAs[Long]("seasonal_fx") == -out(1).getAs[Long]("seasonal_fx"))
  }

  test("seasonalProfile: gapped ticks lose their incomplete windows, not alignment") {
    // remove tick 4: ticks 3 and 5 lose full ±1 windows, others unaffected
    val df = (0 until 10).filter(_ != 4)
      .map(i => ("a", i.toLong, if (i % 2 == 0) 10.0 else 20.0))
      .toDF("g", "t", "v")
    val out = graft.ops.Outliers.seasonalProfile(df, Seq("g"), "t", "v", period = 2)
      .orderBy("phase").collect()
    // full windows remain at ticks 1,2,6,7,8 → phase0 {2,6,8}, phase1 {1,7}
    assert(out(0).getAs[Long]("n") == 3 && out(1).getAs[Long]("n") == 2)
  }

  test("goldenRecord: most-frequent-non-null survivorship, min-value ties, singleton passthrough") {
    import graft.ops.Joins
    val df = Seq(
      (1L, Some("b"), Some(5L)), (2L, Option.empty[String], Some(5L)),
      (3L, Some("a"), Some(7L)), (4L, Some("z"), Option.empty[Long]))
      .toDF("id", "name", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Joins.goldenRecord(df, "id", pairs, "a", "b", Seq("name", "score"))
      .orderBy("entity").collect()
    assert(out.length == 2)
    val e1 = out(0)
    assert(e1.getAs[Long]("entity") == 1L && e1.getAs[Long]("n_members") == 3L)
    // name: frequency tie {a: 1, b: 1} → min "a"; score: mode 5 (2 votes)
    assert(e1.getAs[String]("name") == "a" && e1.getAs[Long]("score") == 5L)
    val e4 = out(1)
    assert(e4.getAs[Long]("entity") == 4L && e4.getAs[Long]("n_members") == 1L)
    assert(e4.getAs[String]("name") == "z" && e4.isNullAt(e4.fieldIndex("score")))
  }

  test("imputeMode: per-group mode fill, min-value ties, all-null group stays null") {
    import graft.ops.Constraints
    val df = Seq(
      ("g1", Some("en")), ("g1", Some("en")), ("g1", Some("de")), ("g1", None),
      ("g2", Some("fr")), ("g2", Some("nl")), ("g2", None), // tie → "fr"
      ("g3", None)) // no non-null value: stays null, not imputed
      .toDF("src", "lang")
    val out = Constraints.imputeMode(df, "lang", Seq("src"))
      .orderBy("src", "lang").collect()
    val g1 = out.filter(_.getString(0) == "g1")
    assert(g1.filter(_.isNullAt(1)).head.getAs[String]("lang_filled") == "en")
    val g2null = out.filter(r => r.getString(0) == "g2" && r.isNullAt(1)).head
    assert(g2null.getAs[String]("lang_filled") == "fr" && g2null.getAs[Boolean]("imputed"))
    val g3 = out.filter(_.getString(0) == "g3").head
    assert(g3.isNullAt(g3.fieldIndex("lang_filled")) && !g3.getAs[Boolean]("imputed"))
    // non-null rows pass through untouched and unflagged
    assert(out.filter(!_.isNullAt(1)).forall(r =>
      r.getAs[String]("lang_filled") == r.getString(1) && !r.getAs[Boolean]("imputed")))
  }

  test("conformalCoverage: hand conformal rank, eval coverage, short-calibration null") {
    import graft.ops.Outliers
    // calibration residuals 1..10 (t < 100): thr = ⌈11·9/10⌉ = 10 → q̂ = 10
    // eval residuals {5, 10, 11}: 2 of 3 covered
    val rows = (1 to 10).map(i => ("g", i.toLong, 100L + i, 100L)) ++
      Seq(("g", 101L, 105L, 100L), ("g", 102L, 110L, 100L), ("g", 103L, 111L, 100L))
    val df = rows.toDF("g", "t", "y", "p")
    val r = Outliers.conformalCoverage(df, Seq("g"), "t", "y", "p",
      splitT = 100L, aNum = 9, aDen = 10, fxScale = 0).collect()(0)
    assert(r.getAs[Long]("n_cal") == 10 && r.getAs[Long]("qhat") == 10)
    assert(r.getAs[Long]("n_eval") == 3 && r.getAs[Long]("covered") == 2)
    assert(r.getAs[Double]("coverage") == 2.0 / 3.0)
    // 5-point calibration: thr = ⌈6·0.9⌉ = 6 > 5 → null q̂/coverage
    val short = ((1 to 5).map(i => ("g", i.toLong, 100L + i, 100L)) ++
      Seq(("g", 101L, 103L, 100L))).toDF("g", "t", "y", "p")
    val s = Outliers.conformalCoverage(short, Seq("g"), "t", "y", "p",
      splitT = 100L).collect()(0)
    assert(s.isNullAt(s.fieldIndex("qhat")) && s.isNullAt(s.fieldIndex("coverage")))
  }

  test("chowTest: broken line rejects, stable line stays low, replicated-tree parity") {
    def mk(pts: Seq[(Long, Long)]) = pts.map { case (t, v) => ("g", t, v) }
      .toDF("g", "t", "v")
    // same noisy line both sides → small F; level jump at the split → large F
    val stable = mk(Seq((1L, 10L), (2L, 12L), (3L, 11L), (4L, 13L),
      (5L, 12L), (6L, 14L)))
    val rs = Correlation.chowTest(stable, Seq("g"), "t", "v", splitT = 4L)
      .collect()(0)
    val broken = mk(Seq((1L, 10L), (2L, 12L), (3L, 11L), (4L, 50L),
      (5L, 52L), (6L, 49L)))
    val rb = Correlation.chowTest(broken, Seq("g"), "t", "v", splitT = 4L)
      .collect()(0)
    assert(rs.getAs[Long]("n_before") == 3 && rs.getAs[Long]("n_after") == 3)
    assert(rb.getAs[Double]("f") > 10.0 * math.max(rs.getAs[Double]("f"), 0.1),
      s"broken ${rb.getAs[Double]("f")} vs stable ${rs.getAs[Double]("f")}")
    // replicated closed form on the stable fixture
    def ssr(p: Seq[(Long, Long)]): Double = {
      val n = p.size.toDouble
      val sx = p.map(_._1.toDouble).sum; val sy = p.map(_._2.toDouble).sum
      val sxx = p.map(q => q._1.toDouble * q._1).sum
      val sxy = p.map(q => q._1.toDouble * q._2).sum
      val syy = p.map(q => q._2.toDouble * q._2).sum
      val (cxx, cxy, cyy) = (n * sxx - sx * sx, n * sxy - sx * sy, n * syy - sy * sy)
      (cyy - cxy * cxy / cxx) / n
    }
    val pts = Seq((1L, 10L), (2L, 12L), (3L, 11L), (4L, 13L), (5L, 12L), (6L, 14L))
    val (a, b) = pts.partition(_._1 < 4)
    val expF = (ssr(pts) - ssr(a) - ssr(b)) / 2.0 / ((ssr(a) + ssr(b)) / 2.0)
    assert(math.abs(rs.getAs[Double]("f") - expF) < 1e-9)
  }

  test("olsInfluence: the outlier day dominates Cook's D, rank order total") {
    // near-perfect line with one gross outlier at t = 5
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 99L),
      (6L, 60L), (7L, 70L))
    val df = pts.map { case (t, v) => ("g", t, v) }.toDF("g", "t", "v")
    val out = Correlation.olsInfluence(df, Seq("g"), "t", "v", topK = 3)
      .collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("t") == 5L) // the outlier leads
    // the gross outlier inflates s² too, so dominance is moderate: ~1.8×
    assert(out(0).getAs[Double]("cooks_d") > 1.5 * out(1).getAs[Double]("cooks_d"))
    assert(out.map(_.getAs[Int]("rnk")).toSeq == Seq(1, 2, 3))
    // residual at the outlier is strongly positive
    assert(out(0).getAs[Double]("resid") > 20.0)
  }

  test("moodScale: hand squared-rank deviations, dispersion direction") {
    // ref = {1,4} wraps cur = {2,3}: M₄ = 18 (max dispersion), z > 0
    val wide = Drift.moodScale(Seq(1L, 4L).toDF("v"), Seq(2L, 3L).toDF("v"), "v")
      .collect()(0)
    assert(wide.getAs[Double]("m4") == 18.0)
    val e = 2.0 * (16.0 - 1.0) / 3.0
    val v16 = 2.0 * 2.0 * 5.0 * (16.0 - 4.0) / 180.0 * 16.0
    assert(math.abs(wide.getAs[Double]("z") - (18.0 - e) / math.sqrt(v16)) < 1e-12)
    // ref concentrated in the center → minimal M₄, z < 0
    val tight = Drift.moodScale(Seq(2L, 3L).toDF("v"), Seq(1L, 4L).toDF("v"), "v")
      .collect()(0)
    assert(tight.getAs[Double]("m4") == 2.0 && tight.getAs[Double]("z") < 0.0)
    // tied values use the doubled average-rank dev exactly: {1,1} vs {1,1}
    val allTied = Drift.moodScale(Seq(1L, 1L).toDF("v"), Seq(1L, 1L).toDF("v"), "v")
      .collect()(0)
    // single 4-way tie run: dev = 2k − c − N = 8 − 4 − 4 = 0
    assert(allTied.getAs[Double]("m4") == 0.0)
  }

  test("friedman: perfect consistency hits n(k-1), all-tied null, incomplete blocks dropped") {
    // 2 complete blocks, k = 3, identical ordering → χ²_F = n(k−1) = 4
    val df = Seq(
      ("b1", "x", 1L), ("b1", "y", 2L), ("b1", "z", 3L),
      ("b2", "x", 5L), ("b2", "y", 6L), ("b2", "z", 7L),
      ("b3", "x", 1L), ("b3", "y", 2L)) // incomplete → dropped
      .toDF("b", "t", "v")
    val r = Drift.friedman(df, "b", "t", "v").collect()(0)
    assert(r.getAs[Long]("treatments") == 3 && r.getAs[Long]("blocks") == 2)
    assert(r.getAs[Double]("chi2_f") == 4.0)
    // fully tied blocks → A₄ = C₄ → null
    val tied = Seq(
      ("b1", "x", 7L), ("b1", "y", 7L), ("b1", "z", 7L),
      ("b2", "x", 9L), ("b2", "y", 9L), ("b2", "z", 9L)).toDF("b", "t", "v")
    val f = Drift.friedman(tied, "b", "t", "v").collect()(0)
    assert(f.isNullAt(f.fieldIndex("chi2_f")))
    // reversed-order block cancels: two opposite blocks → χ² = 0
    val opp = Seq(
      ("b1", "x", 1L), ("b1", "y", 2L), ("b1", "z", 3L),
      ("b2", "x", 3L), ("b2", "y", 2L), ("b2", "z", 1L)).toDF("b", "t", "v")
    assert(Drift.friedman(opp, "b", "t", "v").collect()(0)
      .getAs[Double]("chi2_f") == 0.0)
  }

  test("andersonDarlingByGroup: single-group slice equals the ungrouped statistic bit-for-bit") {
    val rnd = new scala.util.Random(23)
    val ref = Seq.fill(120)(("g1", rnd.nextInt(25).toLong)) ++
      Seq.fill(80)(("g2", rnd.nextInt(25).toLong + 5))
    val cur = Seq.fill(100)(("g1", rnd.nextInt(25).toLong + 2)) ++
      Seq.fill(90)(("g2", rnd.nextInt(25).toLong + 9))
    val grouped = Drift.andersonDarlingByGroup(
      ref.toDF("g", "v"), cur.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("sum_fx"), r.getAs[Double]("a2")))).toMap
    for (g <- Seq("g1", "g2")) {
      val u = Drift.andersonDarling(
        ref.filter(_._1 == g).map(_._2).toDF("v"),
        cur.filter(_._1 == g).map(_._2).toDF("v"), "v").collect()(0)
      assert(grouped(g) == ((u.getAs[Double]("sum_fx"), u.getAs[Double]("a2"))),
        s"group $g mismatch")
    }
    // one-sided group excluded
    val oneSided = Drift.andersonDarlingByGroup(
      (ref ++ Seq(("only", 1L))).toDF("g", "v"), cur.toDF("g", "v"), "v", "g")
    assert(!oneSided.collect().map(_.getString(0)).contains("only"))
  }

  test("mantelHaenszel: common OR recovered across strata, paradox-proof cells") {
    def stratum(st: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((st, true, true)) ++ Seq.fill(b)((st, true, false)) ++
      Seq.fill(c)((st, false, true)) ++ Seq.fill(d)((st, false, false))
    // OR = 4 in both strata at different sizes → MH OR = 4
    val df = (stratum("s1", 10, 5, 5, 10) ++ stratum("s2", 20, 10, 10, 20))
      .toDF("st", "e", "y")
    val r = Drift.mantelHaenszel(df, "st", col("e"), col("y")).collect()(0)
    assert(r.getAs[Long]("strata") == 2 && r.getAs[Long]("n") == 90)
    assert(math.abs(r.getAs[Double]("or_mh") - 4.0) < 1e-6)
    assert(r.getAs[Double]("chi2_mh") > 5.0) // real association
    // perfectly balanced cells: OR = 1, chi2 ≈ 0 (continuity-corrected)
    val flat = stratum("s1", 5, 5, 5, 5).toDF("st", "e", "y")
    val f = Drift.mantelHaenszel(flat, "st", col("e"), col("y")).collect()(0)
    assert(math.abs(f.getAs[Double]("or_mh") - 1.0) < 1e-6)
    assert(f.getAs[Double]("chi2_mh") < 0.2)
  }

  test("hillEstimator: geometric tail hits 1/ln2 scaling, short input null") {
    // top-4: {8,4,2, tail 1}: α = 3/ln(64)
    val df = (Seq(8L, 4L, 2L, 1L) ++ Seq.fill(5)(1L)).toDF("v")
    val r = Drift.hillEstimator(df, "v", k = 3).collect()(0)
    assert(r.getAs[Long]("x_tail") == 1L)
    assert(math.abs(r.getAs[Double]("alpha") - 3.0 / math.log(64.0)) < 1e-9)
    // fewer than k+1 positive values → null
    val short = Seq(3L, 2L).toDF("v")
    val s = Drift.hillEstimator(short, "v", k = 3).collect()(0)
    assert(s.isNullAt(s.fieldIndex("alpha")))
  }

  test("partialCorr: confounder fully explains → null, replicated-tree parity on random data") {
    // x and y both EQUAL z: conditioning on z leaves zero variance → null
    val same = Seq.tabulate(8)(i => (i + 1.0, i + 1.0, i + 1.0)).toDF("x", "y", "z")
    val r0 = Correlation.partialCorr(same, "x", "y", "z", scale = 0).collect()(0)
    assert(r0.isNullAt(r0.fieldIndex("partial")))
    // random integers: replicate the trees from exact moments in the test
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(60)((rnd.nextInt(50).toDouble,
      rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    val r = Correlation.partialCorr(data.toDF("x", "y", "z"), "x", "y", "z",
      scale = 0).collect()(0)
    def corr(u: Seq[Double], v: Seq[Double]): Double = {
      val n = u.size.toDouble
      val (su, sv) = (u.sum, v.sum)
      val nuv = n * u.zip(v).map { case (a, b) => a * b }.sum - su * sv
      val du = n * u.map(a => a * a).sum - su * su
      val dv = n * v.map(a => a * a).sum - sv * sv
      nuv / (math.sqrt(du) * math.sqrt(dv))
    }
    val (xs, ys, zs) = (data.map(_._1), data.map(_._2), data.map(_._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val expect = (rxy - rxz * ryz) /
      (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("partial") - expect) < 1e-9, s"$r vs $expect")
  }

  test("chiSquareCells: hand residuals on a 2x2-ish table") {
    val df = Seq(("p", "u"), ("p", "u"), ("p", "v"), ("q", "u"))
      .toDF("a", "b")
    val out = Correlation.chiSquareCells(df, "a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("o"), r.getAs[Double]("e"), r.getAs[Double]("std_resid")))).toMap
    // e(p,u) = 3·3/4 = 2.25 → resid = −0.25/1.5
    assert(out(("p", "u"))._2 == 2.25)
    assert(math.abs(out(("p", "u"))._3 - (-0.25 / 1.5)) < 1e-12)
    assert(out(("q", "u"))._1 == 1L && out(("q", "u"))._2 == 0.75)
  }

  test("cochranArmitage: perfect linear trend z = 2 exactly, flat outcome null") {
    val df = Seq(
      ("a", false), ("a", false), ("b", true), ("b", false),
      ("c", true), ("c", true)).toDF("g", "y")
    val r = Drift.cochranArmitage(df, "g", Seq("a", "b", "c"), col("y"))
      .collect()(0)
    // n=6, x=3, TN = 5·6−3·6 = 12, B = 24, Var = 1 → z = 2
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("x") == 3)
    assert(r.getAs[Double]("t_n") == 12.0 && r.getAs[Double]("z") == 2.0)
    // all-success outcome carries no variance → null
    val flat = Seq(("a", true), ("b", true), ("c", true)).toDF("g", "y")
    val f = Drift.cochranArmitage(flat, "g", Seq("a", "b", "c"), col("y"))
      .collect()(0)
    assert(f.isNullAt(f.fieldIndex("z")))
  }

  test("jonckheereTerpstra: hand fixture, MWU identity, tie handling") {
    // a = {1,2} < b = {3,4}: J = 4, E[J2] = 4, Var = 5/3
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = Drift.jonckheereTerpstra(df, "v", "g", Seq("a", "b")).collect()(0)
    assert(r.getAs[Long]("groups") == 2 && r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("j2") == 8.0 && r.getAs[Double]("e_j2") == 4.0)
    assert(math.abs(r.getAs[Double]("z") - (8.0 - 4.0) / 2.0 / math.sqrt(5.0 / 3.0)) < 1e-12)
    // k = 2 reduces to MWU: J2 = 2·n1·n2 − u_doubled, any data incl. ties
    val rnd = new scala.util.Random(99)
    val g1 = Seq.fill(40)(rnd.nextInt(12).toLong)
    val g2 = Seq.fill(55)(rnd.nextInt(12).toLong + 3)
    val both = (g1.map(("a", _)) ++ g2.map(("b", _))).toDF("g", "v")
    val jt = Drift.jonckheereTerpstra(both, "v", "g", Seq("a", "b")).collect()(0)
    val mwu = Drift.mannWhitneyU(g1.toDF("v"), g2.toDF("v"), "v").collect()(0)
    assert(jt.getAs[Double]("j2") ==
      2.0 * 40 * 55 - mwu.getAs[Long]("u_doubled").toDouble)
    // perfectly ordered three groups: J2 at its maximum 2·Σ ninj
    val mono = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("g", "v")
    val m = Drift.jonckheereTerpstra(mono, "v", "g", Seq("a", "b", "c")).collect()(0)
    assert(m.getAs[Double]("j2") == 6.0 && m.getAs[Double]("e_j2") == 3.0)
    // reversed order scores 0
    val rev = Drift.jonckheereTerpstra(mono, "v", "g", Seq("c", "b", "a")).collect()(0)
    assert(rev.getAs[Double]("j2") == 0.0)
  }

  test("cohensD: hand pooled-SD effect size, degenerate null") {
    // g0 = {0,2}, g1 = {10,12}: ss = 2 each, sp² = 2, d = −10/√2
    val a = Seq(0L, 2L).toDF("v"); val b = Seq(10L, 12L).toDF("v")
    val r = Drift.cohensD(a, b, "v").collect()(0)
    assert(r.getAs[Long]("n_ref") == 2 && r.getAs[Long]("n_cur") == 2)
    assert(math.abs(r.getAs[Double]("d") - (-10.0 / math.sqrt(2.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("g") - r.getAs[Double]("d") * (1.0 - 3.0 / 7.0)) < 1e-12)
    // zero pooled variance → null
    val c = Seq(5L, 5L).toDF("v")
    assert(Drift.cohensD(c, c, "v").collect()(0).isNullAt(2))
  }

  test("qqTable: shifted uniform hits exact decile gaps") {
    val ref = (1L to 10L).toDF("v"); val cur = (11L to 20L).toDF("v")
    val out = Drift.qqTable(ref, cur, "v", quantiles = 10)
      .collect()
    assert(out.length == 9)
    out.foreach { r =>
      val p = r.getAs[Int]("p")
      assert(r.getAs[Long]("q_ref") == p.toLong, s"q_ref at p=$p")
      assert(r.getAs[Long]("q_cur") == p.toLong + 10L)
      assert(r.getAs[Long]("gap") == 10L)
    }
  }

  test("concordanceIndex: perfect, reversed and tied rankings") {
    import graft.ops.Events
    // events at t=1,2 (observed), t=3 censored; score descends with time
    val good = Seq((1L, true, 5L), (2L, true, 3L), (3L, false, 1L))
      .toDF("dur", "obs", "risk")
    val r1 = Events.concordanceIndex(good, "dur", col("obs"), "risk").collect()(0)
    assert(r1.getAs[Long]("comparable") == 3 && r1.getAs[Long]("concordant") == 3)
    assert(r1.getAs[Double]("c") == 1.0)
    // reversed scores → C = 0
    val bad = Seq((1L, true, 1L), (2L, true, 3L), (3L, false, 5L))
      .toDF("dur", "obs", "risk")
    assert(Events.concordanceIndex(bad, "dur", col("obs"), "risk")
      .collect()(0).getAs[Double]("c") == 0.0)
    // all-tied scores → C = 0.5; censored-first subject contributes no pairs
    val tied = Seq((1L, true, 7L), (2L, true, 7L), (3L, false, 7L))
      .toDF("dur", "obs", "risk")
    val r3 = Events.concordanceIndex(tied, "dur", col("obs"), "risk").collect()(0)
    assert(r3.getAs[Long]("tied_score") == 3 && r3.getAs[Double]("c") == 0.5)
    // censored subjects never open pairs: single censored row → no pairs
    val cen = Seq((1L, false, 5L), (2L, false, 1L)).toDF("dur", "obs", "risk")
    val r4 = Events.concordanceIndex(cen, "dur", col("obs"), "risk").collect()(0)
    assert(r4.isNullAt(r4.fieldIndex("comparable")) || r4.getAs[Long]("comparable") == 0)
  }

  test("nelsonAalen: hand hazard increments, Breslow survival") {
    // durations: 1(obs), 1(obs), 2(cens), 3(obs)
    val subjects = Seq((1L, true), (1L, true), (2L, false), (3L, true))
      .toDF("dur", "obs")
    val out = graft.ops.Events.nelsonAalen(subjects, "dur", col("obs"))
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 2L, 1L))
    // H = [2/4, 2/4, 2/4 + 1/1] at pico fx
    assert(out(0).getAs[Long]("h_fx") == 500000000000L)
    assert(out(1).getAs[Long]("h_fx") == 500000000000L)
    assert(out(2).getAs[Long]("h_fx") == 1500000000000L)
    assert(out(0).getAs[Double]("h") == 0.5)
    assert(out(2).getAs[Double]("s_breslow") == math.exp(-1.5))
  }

  test("vwapBars: weighted window mean, zero-weight window null") {
    val ev = Seq(
      ("k", "2024-01-01 00:10:00", 1.00, 1L),
      ("k", "2024-01-01 05:00:00", 2.00, 3L),
      ("k", "2024-01-02 01:00:00", 5.00, 0L)).toDF("key", "ts", "v", "w")
    val out = graft.ops.Windows.vwapBars(ev, "key", "ts", "v", "w", 86400)
      .orderBy("window_start").collect()
    assert(out.length == 2)
    // (100·1 + 200·3)/4 cents = 175 → 1.75
    assert(out(0).getAs[Long]("sum_pv") == 700L &&
      out(0).getAs[Long]("sum_vol") == 4L)
    assert(out(0).getAs[Double]("vwap") == 1.75)
    assert(out(1).isNullAt(out(1).fieldIndex("vwap")))
  }

  test("stickiness: hand DAU/MAU ratio, duplicate events collapse") {
    val ev = Seq(
      ("t", "2024-03-01 10:00:00", "a"), ("t", "2024-03-01 11:00:00", "a"),
      ("t", "2024-03-01 12:00:00", "b"), ("t", "2024-03-02 09:00:00", "a"))
      .toDF("typ", "ts", "u")
    val r = graft.ops.Events.stickiness(ev, "ts", "u", Seq("typ"))
      .collect()(0)
    // day1 {a,b}, day2 {a} → Σdau = 3, days = 2, mau = 2 → 0.75
    assert(r.getAs[Long]("days_active") == 2 && r.getAs[Long]("sum_dau") == 3 &&
      r.getAs[Long]("mau") == 2)
    assert(r.getAs[Double]("stickiness") == 3.0 / 2.0 / 2.0)
  }

  test("theilsU: deterministic direction scores 1, coarse direction ln2/ln4") {
    // b = a div 2 over uniform a ∈ {0..3}: knowing a determines b
    val df = Seq.tabulate(40)(i => (i % 4, (i % 4) / 2)).toDF("a", "b")
    val r = Correlation.theilsU(df, Seq("a" -> "b")).collect()(0)
    assert(math.abs(r.getAs[Double]("u_b_given_a") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("u_a_given_b") - 0.5) < 1e-6)
  }

  test("ebBetaBinomial: MoM shrinkage pulls toward the mean, degenerate case collapses") {
    val df = Seq(("k1", 10L, 2L), ("k2", 10L, 8L)).toDF("k", "n", "x")
    val out = graft.ops.Shrinkage.ebBetaBinomial(df, Seq("k"), "n", "x")
      .orderBy("k").collect()
    // pbar = .5, v = .09 → α+β = .25/.09 − 1, α = (α+β)/2
    val ab = 0.5 * (1.0 - 0.5) / 0.09 - 1.0
    val alpha = 0.5 * ab
    val s1 = (2.0 + alpha) / (10.0 + ab)
    assert(math.abs(out(0).getAs[Double]("shrunk") - s1) < 1e-9)
    assert(out(0).getAs[Long]("rate_fx") == 200000000L)
    // shrunk rates sit strictly between raw rate and pbar
    assert(out(0).getAs[Double]("shrunk") > 0.2 &&
      out(0).getAs[Double]("shrunk") < 0.5)
    assert(out(1).getAs[Double]("shrunk") < 0.8 &&
      out(1).getAs[Double]("shrunk") > 0.5)
    // zero between-key variance → full collapse to pbar
    val flat = Seq(("k1", 4L, 2L), ("k2", 4L, 2L)).toDF("k", "n", "x")
    val f = graft.ops.Shrinkage.ebBetaBinomial(flat, Seq("k"), "n", "x")
      .collect()
    assert(f.forall(_.getAs[Double]("shrunk") == 0.5))
  }

  test("kaplanMeier: textbook curve with censoring, total-death zeroing") {
    import graft.ops.Events
    val subjects = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "obs")
    val out = Events.kaplanMeier(subjects, "dur", col("obs"))
      .orderBy("t").collect()
    assert(out.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(6L, 5L, 4L, 2L, 1L))
    val s = out.map(_.getAs[Double]("survival"))
    assert(math.abs(s(0) - 5.0 / 6.0) < 1e-9) // (1 − 1/6)
    assert(s(1) == s(0)) // censor-only time: curve unchanged
    assert(math.abs(s(2) - 5.0 / 12.0) < 1e-9) // ·(1 − 2/4)
    assert(s(3) == s(2))
    assert(s(4) == 0.0 && out(4).isNullAt(out(4).fieldIndex("ln_s_fx")))
  }

  test("imputeMedian: lower-median fill per group, observed values only") {
    import graft.ops.Constraints
    val df = Seq(("g", Some(10L)), ("g", Some(20L)), ("g", Some(30L)),
      ("g", Some(40L)), ("g", None), ("h", None)).toDF("k", "v")
    val out = Constraints.imputeMedian(df, "v", Seq("k")).collect()
    // even count {10,20,30,40}: LOWER median = 20 (an observed value)
    val gNull = out.filter(r => r.getString(0) == "g" && r.isNullAt(1)).head
    assert(gNull.getAs[Long]("v_filled") == 20L && gNull.getAs[Boolean]("imputed"))
    val hNull = out.filter(r => r.getString(0) == "h").head
    assert(hNull.isNullAt(hNull.fieldIndex("v_filled")) && !hNull.getAs[Boolean]("imputed"))
  }

  test("logRank: identical cohorts score exactly 0; separated curves score large") {
    import graft.ops.Events
    val a = (1 to 10).map(i => ((i % 5 + 1).toLong, i % 3 != 0)).toDF("dur", "obs")
    val same = Events.logRank(a, a, "dur", col("obs")).collect()(0)
    assert(same.getAs[Long]("oe_fx") == 0L && same.getAs[Double]("chi2") == 0.0)
    // A all dies at t=1, B all dies at t=10: O−E = 5 at t=1, V = 10⁴/7600
    val early = Seq.fill(10)((1L, true)).toDF("dur", "obs")
    val late = Seq.fill(10)((10L, true)).toDF("dur", "obs")
    val r = Events.logRank(early, late, "dur", col("obs")).collect()(0)
    assert(r.getAs[Long]("n_ref") == 10 && r.getAs[Long]("events_ref") == 10)
    assert(r.getAs[Long]("oe_fx") == 5000000000000L)
    assert(math.abs(r.getAs[Double]("chi2") - 19.0) < 0.01, s"$r")
  }

  test("pacf: lag-1 equals acf exactly; recursion replayed; perfect fit truncates") {
    // a wandering integer series with real structure at several lags
    val xs = Seq(3L, 7L, 6L, 9L, 12L, 10L, 14L, 13L, 17L, 16L, 20L, 22L, 19L, 25L)
    val df = xs.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
      .toDF("g", "t", "v")
    val ac = Correlation.acf(df, Seq("g"), "t", "v", maxLag = 4)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    val out = Correlation.pacf(df, Seq("g"), "t", "v", maxLag = 4)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("pacf")).toMap
    assert(out(1L) == ac(1L)) // Durbin–Levinson initialization
    // replay the recursion in the test (independent arithmetic)
    val phi = Array.ofDim[Double](5, 5)
    var err = 1.0
    (1 to 4).foreach { k =>
      val num = ac(k.toLong) - (1 until k).map(j => phi(k - 1)(j) * ac((k - j).toLong)).sum
      val p = num / err
      phi(k)(k) = p
      for (j <- 1 until k) phi(k)(j) = phi(k - 1)(j) - p * phi(k - 1)(k - j)
      err *= (1.0 - p * p)
      assert(out(k.toLong) == p, s"lag $k")
    }
    // perfectly alternating 0/1 with an EVEN overlap count: dx = m², so
    // acf(1) = −dx/(√dx·√dx) = −1.0 BIT-EXACTLY → err hits 0 → truncation
    val alt = (0 until 13).map(i => ("b", i.toLong, (i % 2).toLong))
      .toDF("g", "t", "v")
    val altOut = Correlation.pacf(alt, Seq("g"), "t", "v", maxLag = 4).collect()
    assert(altOut.map(_.getAs[Long]("lag")).toSeq == Seq(1L), s"${altOut.toSeq}")
    assert(altOut(0).getAs[Double]("pacf") == -1.0)
  }

  test("basketRules: closed-form support/confidence/lift, rarity rewarded by lift") {
    import graft.ops.Events
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("basket", "item")
    val out = Events.basketRules(rows, "basket", "item", minPairCount = 1L)
      .collect().map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) -> r).toMap
    // n=4, na=3, nb=3, nc=1, n(ab)=2, n(ac)=1
    val ab = out(("a", "b"))
    assert(ab.getAs[Double]("support") == 2.0 / 4.0)
    assert(ab.getAs[Double]("confidence") == 2.0 / 3.0)
    assert(ab.getAs[Double]("lift") == 2.0 * 4.0 / (3.0 * 3.0))
    val ca = out(("c", "a"))
    assert(ca.getAs[Double]("confidence") == 1.0) // every c-basket has a
    assert(ca.getAs[Double]("lift") == 1.0 * 4.0 / (1.0 * 3.0)) // rare → high lift
    // lift is symmetric; confidence is not
    assert(out(("a", "c")).getAs[Double]("lift") == ca.getAs[Double]("lift"))
    assert(out(("a", "c")).getAs[Double]("confidence") == 1.0 / 3.0)
  }

  test("cuped: perfect linear covariate collapses variance, preserves the mean") {
    // y = 2x exactly: θ = 2, x̄ = 1 → adjusted = constant 2 (= mean y)
    val df = Seq((1L, 0.0, 0.0), (2L, 2.0, 4.0)).toDF("id", "x", "y")
    val out = Drift.cuped(df, "y", "x").orderBy("id").collect()
    assert(out.map(_.getAs[Double]("y_adj")).toSeq == Seq(2.0, 2.0))
    // a null covariate row yields null adjustment, others unaffected
    val withNull = Seq((1L, Some(0.0), 0.0), (2L, Some(2.0), 4.0),
      (3L, Option.empty[Double], 9.0)).toDF("id", "x", "y")
    val o2 = Drift.cuped(withNull, "y", "x").orderBy("id").collect()
    assert(o2(2).isNullAt(o2(2).fieldIndex("y_adj")))
    assert(o2(0).getAs[Double]("y_adj") == 2.0 && o2(1).getAs[Double]("y_adj") == 2.0)
  }

  test("attribution: last/first touch in lookback, tied-ts tie rule, direct conversions") {
    import graft.ops.Events
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = Seq(
      (1L, ts(100), 10L, "click"), (1L, ts(200), 11L, "view"),   // journey
      (1L, ts(250), 12L, "purchase"),
      (2L, ts(0), 20L, "click"), (2L, ts(100000), 21L, "purchase"), // touch out of window
      (3L, ts(50), 30L, "view"), (3L, ts(50), 31L, "click"),     // tied ts → max id wins last
      (3L, ts(60), 32L, "purchase")
    ).toDF("user", "ts", "event_id", "event_type")
    val out = Events.attribution(rows, "ts", "user", "event_type", "event_id",
        Seq("click", "view"), "purchase", lookbackSec = 3600)
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    val c1 = out(12L)
    assert(c1.getAs[String]("last_touch_type") == "view" &&
      c1.getAs[String]("first_touch_type") == "click" &&
      c1.getAs[Long]("n_touches") == 2L)
    val c2 = out(21L) // only touch is 100000s earlier → direct
    assert(c2.isNullAt(c2.fieldIndex("last_touch_type")) &&
      c2.getAs[Long]("n_touches") == 0L)
    val c3 = out(32L) // tied timestamps: last = higher id (click), first = lower (view)
    assert(c3.getAs[String]("last_touch_type") == "click" &&
      c3.getAs[String]("first_touch_type") == "view")
  }

  test("forecastErrors: closed-form MAE/RMSE/MAPE/MASE on a constant forecaster") {
    import graft.ops.Outliers
    // actual [10,12,8,10] vs constant 10: e = [0,2,−2,0]
    val df = Seq(("k", 1L, 10.0, 10.0), ("k", 2L, 12.0, 10.0),
      ("k", 3L, 8.0, 10.0), ("k", 4L, 10.0, 10.0)).toDF("g", "t", "a", "p")
    val r = Outliers.forecastErrors(df, Seq("g"), "t", "a", "p", fxScale = 0)
      .collect()(0)
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("mae") == 1.0)
    assert(r.getAs[Double]("rmse") == math.sqrt(8.0 / 4.0))
    // MAPE = (0 + 2/12 + 2/8 + 0)/4 within pico truncation
    assert(math.abs(r.getAs[Double]("mape") - (2.0 / 12.0 + 2.0 / 8.0) / 4.0) < 1e-9)
    assert(r.getAs[Long]("mape_n") == 4)
    // naive diffs [2,4,2] → denom 8/3; MASE = 1/(8/3)
    assert(math.abs(r.getAs[Double]("mase") - 3.0 / 8.0) < 1e-12)
  }

  test("readability: counts and score follow the documented approximations") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "no sentence marks here"),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.readability(df, "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("words") == 6 && r1.getAs[Long]("sentences") == 2)
    // syllable runs: e|a|a|e|o|a → 6
    assert(r1.getAs[Long]("syllables") == 6)
    val expected = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(r1.getAs[Double]("flesch") == expected)
    assert(out(1).isNullAt(out(1).fieldIndex("flesch"))) // no sentences
    assert(out(2).getAs[Long]("words") == 0 &&
      out(2).isNullAt(out(2).fieldIndex("flesch")))
  }

  test("andersonDarling: identical samples score exactly 0, shifted samples score large") {
    val vals = Seq.tabulate(200)(i => (i % 37).toLong)
    val a = vals.toDF("v"); val b = vals.toDF("v")
    val same = Drift.andersonDarling(a, b, "v").collect()(0)
    assert(same.getAs[Long]("n_ref") == 200 && same.getAs[Long]("n_cur") == 200)
    // equal per-value counts ⇒ g = N·M₂ − n₁·B₂ = 0 at every value
    assert(same.getAs[Double]("a2") == 0.0, s"identical-sample A² must be 0: $same")
    val shifted = vals.map(_ + 30L).toDF("v")
    val far = Drift.andersonDarling(a, shifted, "v").collect()(0).getAs[Double]("a2")
    assert(far > 50.0, s"shifted-sample A² should be large: $far")
  }

  test("andersonDarling: null-case magnitude ~1 on disjoint draws from one population") {
    // interleaved draws from the same discrete population: E[A²] ≈ k−1 = 1
    val pop = Seq.tabulate(600)(i => ((i * 7919) % 101).toLong)
    val (a, b) = pop.zipWithIndex.partition(_._2 % 2 == 0)
    val r = Drift.andersonDarling(a.map(_._1).toDF("v"), b.map(_._1).toDF("v"), "v")
      .collect()(0).getAs[Double]("a2")
    assert(math.abs(r) < 3.0, s"null-case A² should be O(1): $r")
  }

  test("andersonDarling: distributed statistic is bit-equal to adOfSamples across randomized sweeps") {
    val rnd = new scala.util.Random(1337)
    for (round <- 1 to 5) {
      val n1 = 30 + rnd.nextInt(170); val n2 = 30 + rnd.nextInt(170)
      val span = 1 + rnd.nextInt(40) // heavy→light tie regimes
      val r = Seq.fill(n1)(rnd.nextInt(span).toLong - 10)
      val c = Seq.fill(n2)((rnd.nextInt(span) + rnd.nextInt(6)).toLong - 10)
      val dist = Drift.andersonDarling(r.toDF("v"), c.toDF("v"), "v").collect()(0)
      val (sfx, a2) = Drift.adOfSamples(r.map(_.toDouble), c.map(_.toDouble))
      assert(dist.getAs[Double]("sum_fx") == sfx, s"round $round sum_fx")
      assert(dist.getAs[Double]("a2") == a2, s"round $round a2")
    }
  }

  test("periodogram: weekly signal concentrates power at p=7, constant series ~0") {
    val week = Seq(50L, 30L, -20L, -50L, -30L, 10L, 10L)
    val ser = Seq.tabulate(210)(t => ("g", t.toLong, 100L + week(t % 7)))
      .toDF("g", "t", "v")
    val out = Correlation.periodogram(ser, Seq("g"), "t", "v", Seq(7, 30))
      .orderBy("period").collect()
    assert(out.map(_.getAs[Int]("period")).toSeq == Seq(7, 30))
    assert(out.forall(_.getAs[Long]("n") == 210L))
    val p7 = out(0).getAs[Double]("power"); val p30 = out(1).getAs[Double]("power")
    assert(p7 > 100.0 * math.max(p30, 1.0), s"weekly power must dominate: $p7 vs $p30")
    // constant series: Σcos over complete periods ≈ 0 → power ≈ 0
    val const = Seq.tabulate(210)(t => ("g", t.toLong, 100L)).toDF("g", "t", "v")
    val c = Correlation.periodogram(const, Seq("g"), "t", "v", Seq(7))
      .collect()(0).getAs[Double]("power")
    assert(c < 1e-3, s"constant-series power should vanish: $c")
  }

  test("moodMedian: separated groups hit χ² = n, balanced groups 0, median ties dropped") {
    // fully separated: every g0 below / g1 above the pooled median → χ² = n
    val sep = (Seq(1L, 2L, 3L, 4L).map(("g0", _)) ++
      Seq(10L, 11L, 12L, 13L).map(("g1", _))).toDF("g", "v")
    val r1 = Drift.moodMedian(sep, "v", "g").collect()(0)
    assert(r1.getAs[Long]("groups") == 2 && r1.getAs[Long]("n") == 8)
    assert(r1.getAs[Long]("n_above") == 4 && r1.getAs[Long]("n_below") == 4)
    assert(r1.getAs[Double]("chi2") == 8.0)
    // interleaved: every group splits evenly → χ² = 0
    val bal = Seq(("g0", 1L), ("g0", 3L), ("g1", 2L), ("g1", 4L)).toDF("g", "v")
    assert(Drift.moodMedian(bal, "v", "g").collect()(0)
      .getAs[Double]("chi2") == 0.0)
    // values equal to the pooled median are dropped before the cells
    val ties = Seq(("g0", 1L), ("g0", 2L), ("g1", 2L), ("g1", 3L)).toDF("g", "v")
    val r3 = Drift.moodMedian(ties, "v", "g").collect()(0)
    assert(r3.getAs[Long]("n") == 2 && r3.getAs[Double]("chi2") == 2.0)
  }

  test("durbinWatson: hand fixtures hit the closed forms") {
    // x = [1,2,3]: e = [−1,0,1], num = 2, den = 2 → DW = 1 exactly
    val ramp = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L)).toDF("g", "t", "v")
    val r1 = Correlation.durbinWatson(ramp, Seq("g"), "t", "v").collect()(0)
    assert(r1.getAs[Long]("n") == 3 && r1.getAs[Double]("dw") == 1.0)
    // alternating [1,5,...]: num2 = 6·80, den2 = 6·78−18² → DW = 10/3 (→4 = alternation)
    val alt = Seq.tabulate(6)(i => ("g", i.toLong, if (i % 2 == 0) 1L else 5L))
      .toDF("g", "t", "v")
    val r2 = Correlation.durbinWatson(alt, Seq("g"), "t", "v").collect()(0)
    assert(r2.getAs[Double]("dw") == 480.0 / 144.0)
    // constant series → null (zero variance)
    val const = Seq(("g", 1L, 7L), ("g", 2L, 7L)).toDF("g", "t", "v")
    val r3 = Correlation.durbinWatson(const, Seq("g"), "t", "v").collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("dw")))
  }

  test("runsTest: regime vs alternation fixtures, median ties dropped") {
    // [1,1,1,5,5,5]: med₂ = 6, signs −−−+++ → R = 2, μ = 4, σ² = 1.2
    val blocks = Seq.tabulate(6)(i => ("g", i.toLong, if (i < 3) 1L else 5L))
      .toDF("g", "t", "v")
    val r1 = Drift.runsTest(blocks, Seq("g"), "t", "v").collect()(0)
    assert(r1.getAs[Long]("n_pos") == 3 && r1.getAs[Long]("n_neg") == 3)
    assert(r1.getAs[Long]("runs") == 2)
    assert(math.abs(r1.getAs[Double]("z") - (2.0 - 4.0) / math.sqrt(1.2)) < 1e-12)
    // alternating: R = 6 → z positive, same magnitude
    val alt = Seq.tabulate(6)(i => ("g", i.toLong, if (i % 2 == 0) 1L else 5L))
      .toDF("g", "t", "v")
    val r2 = Drift.runsTest(alt, Seq("g"), "t", "v").collect()(0)
    assert(r2.getAs[Long]("runs") == 6)
    assert(math.abs(r2.getAs[Double]("z") - (6.0 - 4.0) / math.sqrt(1.2)) < 1e-12)
    // values equal to the median are dropped: [1,2,3] → med₂ = 4, signs −+ → R = 2
    val odd = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L)).toDF("g", "t", "v")
    val r3 = Drift.runsTest(odd, Seq("g"), "t", "v").collect()(0)
    assert(r3.getAs[Long]("n_pos") == 1 && r3.getAs[Long]("n_neg") == 1 &&
      r3.getAs[Long]("runs") == 2)
    // all-equal group vanishes (no informative signs)
    val flat = Seq(("g", 1L, 7L), ("g", 2L, 7L)).toDF("g", "t", "v")
    assert(Drift.runsTest(flat, Seq("g"), "t", "v").count() == 0)
  }

  test("wilcoxonSignedRank: hand fixture with ties, symmetry zero, zero-diff drop") {
    // pairs (a,b): d = +3, +3, -1, +5, 0(drop) → |d| ranks: 1→1, 3→(2,3) avg 2.5, 5→4
    // W+ = 2.5 + 2.5 + 4 = 9 → doubled 18; n = 4; ties: t=2 at |d|=3 → 2³−2 = 6
    val df = Seq((13L, 10L), (8L, 5L), (9L, 10L), (15L, 10L), (7L, 7L))
      .toDF("a", "b")
    val r = Drift.wilcoxonSignedRank(df, "a", "b").collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("w_doubled") == 18L)
    assert(r.getAs[Double]("tie_term") == 6.0)
    val varW = 4.0 * 5.0 * 9.0 / 24.0 - 6.0 / 48.0
    assert(r.getAs[Double]("z") == (18.0 - 10.0) / 2.0 / math.sqrt(varW))
    // antisymmetry: swapping the columns negates z exactly
    val s = Drift.wilcoxonSignedRank(df, "b", "a").collect()(0)
    assert(s.getAs[Double]("z") == -r.getAs[Double]("z"))
    // symmetric differences: W+ = half the doubled total rank sum → z = 0
    val sym = Seq((5L, 1L), (1L, 5L), (7L, 2L), (2L, 7L)).toDF("a", "b")
    assert(Drift.wilcoxonSignedRank(sym, "a", "b").collect()(0)
      .getAs[Double]("z") == 0.0)
  }

  test("theilIndex: equal values score 0, decomposition adds up exactly") {
    import graft.ops.Inequality
    // all equal: T = 0 on every component
    val eq = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val re = Inequality.theilIndex(eq, "v", "g").collect()(0)
    assert(re.getAs[Double]("theil_total") == 0.0 &&
      re.getAs[Double]("theil_between") == 0.0 &&
      re.getAs[Double]("theil_within") == 0.0)
    // decomposition: total = between + Σ share_g·T_g; with equal group
    // SHARES the within column is Σ share·T_g directly — check additivity
    // within pico-fx tolerance
    val mix = Seq(("a", 1L), ("a", 9L), ("b", 4L), ("b", 6L)).toDF("g", "v")
    val rm = Inequality.theilIndex(mix, "v", "g").collect()(0)
    val (tt, tb, tw) = (rm.getAs[Double]("theil_total"),
      rm.getAs[Double]("theil_between"), rm.getAs[Double]("theil_within"))
    assert(math.abs(tt - (tb + tw)) < 1e-9, s"$tt vs ${tb + tw}")
    assert(tt > 0.0 && tw > 0.0)
  }

  test("jarqueBera: symmetric flat sample scores platykurtic, spike scores huge") {
    // symmetric uniform-ish: skew 0, kurtosis < 3 → small JB driven by kurtosis
    val flat = (1L to 9L).toDF("v")
    val rf = Drift.jarqueBera(flat, "v").collect()(0)
    assert(math.abs(rf.getAs[Double]("skewness")) < 1e-12)
    assert(rf.getAs[Double]("kurtosis") < 3.0)
    // heavy right tail: skew and JB blow up
    val spike = ((1L to 99L).map(_ => 10L) :+ 10000L).toDF("v")
    val rs = Drift.jarqueBera(spike, "v").collect()(0)
    assert(rs.getAs[Double]("skewness") > 5.0 && rs.getAs[Double]("jb") > 1000.0)
    // constant column → null stats
    val const = Seq(7L, 7L, 7L).toDF("v")
    val rc = Drift.jarqueBera(const, "v").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("jb")))
  }

  test("fleissKappa: hand two-item fixture, incomplete items dropped") {
    // A: x,x,x (P_A = 1); B: x,y,y (P_B = 1/3) → P̄ = 2/3; margins 4:2 →
    // P̄e = 5/9; κ = (2/3 − 5/9)/(4/9) = 0.25
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "x")) // C has 2 raters → dropped
      .toDF("item", "cat")
    val r = Drift.fleissKappa(df, "item", "cat", raters = 3).collect()(0)
    assert(r.getAs[Long]("items") == 2L && r.getAs[Long]("categories") == 2L)
    assert(r.getAs[Double]("p_bar") == 2.0 / 3.0)
    assert(r.getAs[Double]("p_e") == 20.0 / 36.0)
    assert(math.abs(r.getAs[Double]("kappa") - 0.25) < 1e-15)
    // perfect agreement → κ = 1
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("item", "cat")
    assert(Drift.fleissKappa(perfect, "item", "cat", raters = 2)
      .collect()(0).getAs[Double]("kappa") == 1.0)
  }

  test("ndcgAtK: perfect ranking 1.0, hand DCG, reciprocal rank, no-relevant null") {
    import graft.ops.Ranking
    // perfect: rels already descending → ndcg = 1
    val perfect = Seq(("q1", 1L, 3L), ("q1", 2L, 2L), ("q1", 3L, 1L))
      .toDF("q", "rank", "rel")
    val p = Ranking.ndcgAtK(perfect, "q", "rank", "rel", 3).collect()(0)
    assert(p.getAs[Double]("ndcg") == 1.0 && p.getAs[Double]("rr") == 1.0)
    // reversed: hand DCG = 1/1 + 2/log2(3) + 3/2; IDCG = 3 + 2/log2(3) + 1/2
    val rev = Seq(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L))
      .toDF("q", "rank", "rel")
    val r = Ranking.ndcgAtK(rev, "q", "rank", "rel", 3).collect()(0)
    def fx(x: Double) = math.floor(x * 1e12 + 0.5)
    val dcg = (fx(1.0 / (math.log(2.0) / math.log(2.0))) +
      fx(2.0 / (math.log(3.0) / math.log(2.0))) +
      fx(3.0 / (math.log(4.0) / math.log(2.0)))) / 1e12
    assert(r.getAs[Double]("dcg") == dcg)
    assert(r.getAs[Double]("ndcg") < 1.0 && r.getAs[Double]("rr") == 1.0)
    // first relevant at rank 2 → rr = 0.5; k truncation drops rank-4 gain
    val mid = Seq(("q2", 1L, 0L), ("q2", 2L, 5L), ("q2", 3L, 0L), ("q2", 4L, 9L))
      .toDF("q", "rank", "rel")
    val m = Ranking.ndcgAtK(mid, "q", "rank", "rel", 3).collect()(0)
    assert(m.getAs[Double]("rr") == 0.5)
    // all-zero relevance → ndcg and rr null
    val none = Seq(("q3", 1L, 0L), ("q3", 2L, 0L)).toDF("q", "rank", "rel")
    val n = Ranking.ndcgAtK(none, "q", "rank", "rel", 3).collect()(0)
    assert(n.isNullAt(n.fieldIndex("ndcg")) && n.isNullAt(n.fieldIndex("rr")))
  }

  test("bradleyTerry: dominant item wins the strengths, symmetric wins tie, zero-win floor") {
    import graft.ops.Ranking
    // a beats b 9:1, b beats c 9:1, a beats c 9:1 → strength a > b > c
    val m = (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
      Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a")))
      .toDF("w", "l")
    val out = Ranking.bradleyTerry(m, "w", "l", rounds = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("wins"), r.getAs[Long]("matches"), r.getAs[Double]("strength")))).toMap
    assert(out("a")._1 == 18L && out("a")._2 == 20L)
    assert(out("a")._3 > out("b")._3 && out("b")._3 > out("c")._3)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-9)
    // perfectly symmetric record → equal strengths
    val sym = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x"))).toDF("w", "l")
    val so = Ranking.bradleyTerry(sym, "w", "l").collect()
      .map(r => r.getAs[Double]("strength"))
    assert(so.toSet.size == 1)
    // an item that never wins pins to strength 0 (the MM fixed point)
    val shut = Seq.fill(4)(("u", "v")).toDF("w", "l")
    val sh = Ranking.bradleyTerry(shut, "w", "l").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(sh("u") == 1.0 && sh("v") == 0.0)
  }

  test("bradleyTerry: driver route and broadcast-join route are bit-identical") {
    import graft.ops.Ranking
    // asymmetric record with a zero-win item and an uneven schedule so den
    // maps, left-join nulls and the tot normalization all carry weight
    val m = (Seq.fill(7)(("a", "b")) ++ Seq.fill(3)(("b", "a")) ++
      Seq.fill(5)(("a", "c")) ++ Seq.fill(2)(("c", "d")) ++
      Seq.fill(4)(("b", "d")) ++ Seq.fill(6)(("d", "c")))
      .toDF("w", "l")
    def run(maxDriverItems: Int) =
      Ranking.bradleyTerry(m, "w", "l", rounds = 5, maxDriverItems = maxDriverItems)
        .orderBy("item").collect().toSeq
    val driver = run(maxDriverItems = 10000)
    val dist = run(maxDriverItems = 0) // force the broadcast-join route
    assert(driver == dist)
  }

  test("pageHinkley: level shift alarms, stable series stays quiet, scalar-replica parity") {
    import graft.ops.Outliers
    // stable at 10 for 20 ticks then jumps to 30: PH must cross λ = 50
    // after the jump and never before
    val shift = (1 to 20).map(i => ("g", i.toLong, 10.0)) ++
      (21 to 40).map(i => ("g", i.toLong, 30.0))
    val out = Outliers.pageHinkley(shift.toDF("g", "t", "v"), Seq("g"), "t",
        "v", delta = 0.0, lambda = 50.0, fxScale = 0)
      .orderBy("t").collect()
    val alarms = out.filter(_.getAs[Boolean]("alarm")).map(_.getLong(1))
    assert(alarms.nonEmpty && alarms.min > 20L, s"got ${alarms.toSeq}")
    // stable noisy series never alarms
    val stable = (1 to 40).map(i => ("g", i.toLong, 10.0 + (i % 3)))
    assert(!Outliers.pageHinkley(stable.toDF("g", "t", "v"), Seq("g"), "t",
        "v", delta = 0.0, lambda = 50.0, fxScale = 0)
      .collect().exists(_.getAs[Boolean]("alarm")))
    // scalar replica of the exact fx recurrence on the shift fixture
    var s = 0L; var u = 0L; var minU = 0L; var i = 0L
    val expect = shift.map { case (_, _, v) =>
      i += 1; val vf = v.toLong; s += vf
      val dev = (vf * i - s).toDouble / i.toDouble - 0.0
      u += (if (dev >= 0) math.floor(dev * 1e6 + 0.5)
            else -math.floor(-dev * 1e6 + 0.5)).toLong
      minU = math.min(minU, u)
      (u - math.min(0L, minU)).toDouble / 1e6
    }
    assert(out.map(_.getAs[Double]("ph")).toSeq == expect)
  }

  test("weightedKappa: perfect 1, hand quadratic fixture, charges far misses more") {
    import graft.ops.Correlation
    // perfect agreement → κ_w = 1 regardless of weights
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    assert(Correlation.weightedKappa(perfect, "a", "b")
      .collect()(0).getAs[Double]("kappa_w") == 1.0)
    // hand fixture: pairs (1,1),(1,2),(2,2),(3,3) quadratic
    // w_obs = 1 (the single 1-off miss); marginals r=(2,1,1), c=(1,2,1)
    // w_exp = Σ(i−j)²·rᵢ·cⱼ = 12 (i=1) + 2 (i=2) + 6 (i=3) = 20
    val f = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    val r = Correlation.weightedKappa(f, "a", "b").collect()(0)
    assert(r.getAs[Double]("w_obs") == 1.0 && r.getAs[Double]("w_exp") == 20.0)
    assert(r.getAs[Double]("kappa_w") == 1.0 - 4.0 * 1.0 / 20.0)
    // a 2-tier miss must cost more than a 1-tier miss (quadratic: 4×)
    val near = Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("a", "b")
    val far = Seq((1L, 3L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("a", "b")
    val kn = Correlation.weightedKappa(near, "a", "b").collect()(0).getAs[Double]("kappa_w")
    val kf = Correlation.weightedKappa(far, "a", "b").collect()(0).getAs[Double]("kappa_w")
    assert(kf < kn, s"far-miss kappa $kf should be below near-miss $kn")
    // linear weights agree with quadratic on 1-off misses only
    val lin = Correlation.weightedKappa(f, "a", "b", quadratic = false)
      .collect()(0)
    assert(lin.getAs[Double]("w_obs") == 1.0)
  }

  test("seasonalMannKendall: cycle-immune where plain MK is fooled; monotone trend detected") {
    import graft.ops.Correlation
    // pure weekly sawtooth, NO trend: day-of-week level d%7*10; plain MK
    // compares across phases and sees structure; seasonal MK (within-phase
    // comparisons only, each phase constant) reads S = 0 exactly
    val saw = (0L until 56L).map(d => ("g", d, (d % 7) * 10.0 + 100.0))
      .toDF("g", "t", "v")
    val rs = Correlation.seasonalMannKendall(saw, Seq("g"), "t", "v", 7)
      .collect()(0)
    assert(rs.getAs[Long]("s_stat") == 0L && rs.getAs[Long]("seasons") == 7L)
    assert(rs.getAs[Double]("z") == 0.0)
    // sawtooth + genuine upward drift: every within-phase pair is
    // increasing → S = Σ_m n_m(n_m−1)/2 = 7·(8·7/2) = 196, z large
    val trend = (0L until 56L).map(d => ("g", d, (d % 7) * 10.0 + d.toDouble))
      .toDF("g", "t", "v")
    val rt = Correlation.seasonalMannKendall(trend, Seq("g"), "t", "v", 7)
      .collect()(0)
    assert(rt.getAs[Long]("s_stat") == 196L)
    assert(rt.getAs[Double]("z") > 4.0)
    // composition identity: per-phase var18 sums to the reported total
    val perPhase = Correlation.mannKendall(
      trend.withColumn("__phase", pmod(col("t"), lit(7L))),
      Seq("g", "__phase"), "t", "v")
      .agg(sum("var18")).collect()(0).getLong(0)
    assert(rt.getAs[Long]("var18") == perPhase)
  }

  test("cramerVonMisesByGroup: single-group slice equals the ungrouped statistic bit-for-bit") {
    val rnd = new scala.util.Random(37)
    val ref = Seq.fill(110)(("g1", rnd.nextInt(30).toLong)) ++
      Seq.fill(90)(("g2", rnd.nextInt(18).toLong))
    val cur = Seq.fill(95)(("g1", rnd.nextInt(30).toLong + 4)) ++
      Seq.fill(85)(("g2", rnd.nextInt(18).toLong + 2))
    val grouped = Drift.cramerVonMisesByGroup(
      ref.toDF("g", "v"), cur.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("u4"), r.getAs[Double]("t")))).toMap
    for (g <- Seq("g1", "g2")) {
      val u = Drift.cramerVonMises(
        ref.filter(_._1 == g).map(_._2).toDF("v"),
        cur.filter(_._1 == g).map(_._2).toDF("v"), "v").collect()(0)
      assert(grouped(g) == ((u.getAs[Double]("u4"), u.getAs[Double]("t"))),
        s"group $g mismatch")
    }
    // one-sided group excluded
    val oneSided = Drift.cramerVonMisesByGroup(
      (ref ++ Seq(("only", 1L))).toDF("g", "v"), cur.toDF("g", "v"), "v", "g")
    assert(!oneSided.collect().map(_.getString(0)).contains("only"))
  }

  test("krippendorffAlpha: textbook fixture, incomplete items included, degenerate null") {
    // Krippendorff's own nominal example shape: items with VARYING rater
    // counts all participate (what Fleiss drops). Hand fixture:
    // item A: x,x (agree, n=2) -> disagreement 0
    // item B: x,y (split, n=2) -> Σ n_uc(n_u−n_uc)/(n_u−1) = (1·1+1·1)/1 = 2
    // item C: y,y,y (agree, n=3) -> 0; single-rating item D drops
    // margins: n_x = 3, n_y = 4, n = 7; D_e = 3·4+4·3 = 24
    // α = 1 − (7−1)·2/24 = 0.5
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"),
      ("C", "y"), ("C", "y"), ("C", "y"), ("D", "x")).toDF("item", "cat")
    val r = Drift.krippendorffAlpha(df, "item", "cat").collect()(0)
    assert(r.getAs[Long]("items") == 3L && r.getAs[Long]("n") == 7L)
    assert(r.getAs[Double]("alpha") == 1.0 - 6.0 * (2e12.floor / 1e12) / 24.0)
    // perfect agreement across unequal item sizes → α = 1
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"),
      ("B", "y")).toDF("item", "cat")
    assert(Drift.krippendorffAlpha(perfect, "item", "cat")
      .collect()(0).getAs[Double]("alpha") == 1.0)
    // one category only → D_e = 0 → null
    val mono = Seq(("A", "x"), ("A", "x")).toDF("item", "cat")
    assert(Drift.krippendorffAlpha(mono, "item", "cat")
      .collect()(0).isNullAt(3))
  }

  test("qiniCurve: sure-thing targeting reads zero uplift, true uplift reads positive") {
    import graft.ops.Ranking
    // 200 units, random-parity treatment. Outcome A: converts iff score
    // high (score finds sure-things — conversion independent of
    // treatment) → terminal qini ≈ 0. Outcome B: converts iff treated AND
    // score high (score finds the PERSUADABLES) → qini climbs.
    val units = (1L to 200L).map { i =>
      val t = i % 2 == 0
      val score = i % 100
      (score, t, score >= 50, t && score >= 50)
    }
    val sure = units.map(u => (u._1, u._2, u._3)).toDF("s", "t", "y")
    val qa = Ranking.qiniCurve(sure, "s", "t", "y", 10)
      .orderBy(org.apache.spark.sql.functions.col("bucket").desc)
      .collect()(0).getAs[Double]("cum_qini")
    assert(math.abs(qa) < 1e-9, s"sure-thing qini $qa")
    val pers = units.map(u => (u._1, u._2, u._4)).toDF("s", "t", "y")
    val rows = Ranking.qiniCurve(pers, "s", "t", "y", 10).collect()
    val qb = rows.map(_.getAs[Double]("cum_qini")).last
    assert(qb > 40.0, s"persuadable qini $qb")
    // bucket sizes are equi-depth: 10 buckets x 20 units
    assert(rows.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).forall(_ == 20L))
  }

  test("wilcoxonSignedRankByGroup: single-group slice equals the ungrouped statistic bit-for-bit") {
    val rnd = new scala.util.Random(67)
    val rows = (1 to 160).map { i =>
      val g = if (i % 2 == 0) "g1" else "g2"
      (g, rnd.nextInt(40).toLong + 10, rnd.nextInt(40).toLong + 8)
    }
    val grouped = Drift.wilcoxonSignedRankByGroup(
      rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w_doubled"),
          r.getAs[Double]("tie_term"), r.getAs[Double]("z")))).toMap
    for (g <- Seq("g1", "g2")) {
      val u = Drift.wilcoxonSignedRank(
        rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("a", "b"),
        "a", "b").collect()(0)
      assert(grouped(g) == ((u.getAs[Long]("n"), u.getAs[Long]("w_doubled"),
        u.getAs[Double]("tie_term"), u.getAs[Double]("z"))),
        s"group $g mismatch: ${grouped(g)} vs ungrouped")
    }
    // an all-zero-difference group is excluded (no informative pairs)
    val withFlat = rows ++ Seq(("flat", 5L, 5L), ("flat", 9L, 9L))
    assert(!Drift.wilcoxonSignedRankByGroup(
        withFlat.toDF("g", "a", "b"), "g", "a", "b")
      .collect().map(_.getString(0)).contains("flat"))
  }

  test("logRank: routed distributed cumulative = local route bit-for-bit") {
    import graft.ops.Events
    val rnd = new scala.util.Random(91)
    val a = (1 to 200).map(_ => (rnd.nextInt(50).toLong + 1, rnd.nextInt(4) > 0))
      .toDF("dur", "obs")
    val b = (1 to 180).map(_ => (rnd.nextInt(50).toLong + 5, rnd.nextInt(4) > 0))
      .toDF("dur", "obs")
    def run(mld: Long) = Events.logRank(a, b, "dur", col("obs"),
      maxLocalDistinct = mld).collect()(0).toSeq
    assert(run(1L) == run(1L << 20))
    val plan = Events.logRank(a, b, "dur", col("obs"), maxLocalDistinct = 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), plan)
  }

  test("andersonDarlingByGroupRouted: forced-decimal branch is bit-identical to the long branch") {
    val rnd = new scala.util.Random(31)
    val ref = Seq.fill(150)(("g1", rnd.nextInt(20).toLong)) ++
      Seq.fill(70)(("g2", rnd.nextInt(12).toLong))
    val cur = Seq.fill(120)(("g1", rnd.nextInt(20).toLong + 3)) ++
      Seq.fill(90)(("g2", rnd.nextInt(12).toLong + 1))
    def run(thr: Long) = Drift.andersonDarlingByGroupRouted(
        ref.toDF("g", "v"), cur.toDF("g", "v"), "v", "g", thr)
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("sum_fx"), r.getAs[Double]("a2")))
      .sortBy(_._1).toSeq
    // thr = 0 forces the decimal term tree on every group; the values
    // must match the long route bit-for-bit (same integers, same final
    // double tree)
    assert(run(0L) == run(1L << 30))
  }

  test("jonckheereTerpstra: 1.8M-row tie keeps the cubic tie terms exact (decimal route)") {
    // one value carrying 1.8M rows: t(t−1)(2t+5) ≈ 1.17e19 wraps a long —
    // the decimal tie tree must reproduce the BigInt-replicated z exactly
    val heavy = spark.range(900000).selectExpr("'a' as g", "10 as v")
      .unionAll(spark.range(900000).selectExpr("'b' as g", "10 as v"))
      .unionAll(Seq(("a", 1), ("a", 2), ("a", 3), ("b", 21), ("b", 22), ("b", 23))
        .toDF("g", "v"))
    val r = Drift.jonckheereTerpstra(heavy, "v", "g", Seq("a", "b")).collect()(0)
    // driver replica over the (value, c_a, c_b) rollup
    val cells = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L),
      (10L, 900000L, 900000L), (21L, 0L, 1L), (22L, 0L, 1L), (23L, 0L, 1L))
    val nA = cells.map(_._2).sum; val nB = cells.map(_._3).sum; val n = nA + nB
    var ka = 0L
    var j2 = BigInt(0); var ta = BigInt(0); var tb = BigInt(0); var tc = BigInt(0)
    for ((_, ca, cb) <- cells) {
      ka += ca
      j2 += BigInt(cb) * (2 * ka - ca)
      val t = ca + cb
      ta += BigInt(t) * (t - 1) * (2 * t + 5)
      tb += BigInt(t) * (t - 1) * (t - 2)
      tc += BigInt(t) * (t - 1)
    }
    val sa = Seq(nA, nB).map(m => BigInt(m) * (m - 1) * (2 * m + 5)).sum
    val sb = Seq(nA, nB).map(m => BigInt(m) * (m - 1) * (m - 2)).sum
    val sc = Seq(nA, nB).map(m => BigInt(m) * (m - 1)).sum
    val eJ2 = (BigInt(n) * n - (BigInt(nA) * nA + BigInt(nB) * nB)) / 2
    val nD = n.toDouble
    val aD = ((BigInt(n) * (n - 1) * (2L * n + 5)).toDouble - sa.toDouble -
      ta.toDouble) / 72.0
    val bD = sb.toDouble * tb.toDouble / (36.0 * nD * (nD - 1.0) * (nD - 2.0))
    val cD = sc.toDouble * tc.toDouble / (8.0 * nD * (nD - 1.0))
    val z = (j2.toDouble - eJ2.toDouble) / 2.0 / math.sqrt(aD + bD + cD)
    assert(r.getAs[Double]("j2") == j2.toDouble)
    assert(r.getAs[Double]("z") == z, s"got ${r.getAs[Double]("z")} want $z")
  }

  test("mannWhitney: 4.4M-row tie keeps c³−c exact (decimal route)") {
    // one value with 4.4M pooled rows: c³ ≈ 8.5e19 wraps a long — the
    // decimal tie product must reproduce the BigInt-replicated z exactly
    val ref = spark.range(2200000).selectExpr("10 as v")
      .unionAll(Seq(1, 2, 3).toDF("v"))
    val cur = spark.range(2200000).selectExpr("10 as v")
      .unionAll(Seq(21, 22).toDF("v"))
    val r = Drift.mannWhitneyU(ref, cur, "v").collect()(0)
    val cells = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L),
      (10L, 2200000L, 2200000L), (21L, 0L, 1L), (22L, 0L, 1L))
    val n1 = cells.map(_._2).sum; val n2 = cells.map(_._3).sum; val n = n1 + n2
    var k = 0L; var r1d = BigInt(0); var ties = BigInt(0)
    for ((_, c1, c2) <- cells) {
      val c = c1 + c2
      val dr = (k) * 2 + c + 1 // doubled tie-averaged rank: 2·cum_lt + c + 1
      r1d += BigInt(c1) * dr
      if (c > 1) ties += BigInt(c) * c * c - c
      k += c
    }
    val u1d = r1d - BigInt(n1) * (n1 + 1)
    val uD = u1d.toDouble / 2.0
    val mu = n1.toDouble * n2.toDouble / 2.0
    val sig2 = n1.toDouble * n2.toDouble / 12.0 *
      ((n + 1).toDouble - ties.toDouble / (n.toDouble * (n - 1).toDouble))
    assert(r.getAs[Double]("auc") == uD / (n1.toDouble * n2.toDouble))
    assert(r.getAs[Double]("z") == (uD - mu) / math.sqrt(sig2))
  }

  test("conformalCoverage: keys missing one window surface instead of vanishing") {
    import graft.ops.Outliers
    // key "c" calibrates but never evaluates; key "e" evaluates but was
    // never calibrated; key "b" has both windows
    val rows = (1 to 10).map(i => ("c", i.toLong, 100L + i, 100L)) ++
      (1 to 10).map(i => ("b", i.toLong, 100L + i, 100L)) ++
      Seq(("b", 101L, 105L, 100L), ("e", 101L, 105L, 100L),
        ("e", 102L, 130L, 100L))
    val out = Outliers.conformalCoverage(rows.toDF("g", "t", "y", "p"),
        Seq("g"), "t", "y", "p", splitT = 100L, aNum = 9, aDen = 10,
        fxScale = 0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("b", "c", "e"))
    val e = out("e")
    assert(e.getAs[Long]("n_cal") == 0 && e.isNullAt(e.fieldIndex("qhat")) &&
      e.getAs[Long]("n_eval") == 2 && e.getAs[Long]("covered") == 0 &&
      e.isNullAt(e.fieldIndex("coverage")))
    val c = out("c")
    assert(c.getAs[Long]("n_cal") == 10 && c.getAs[Long]("qhat") == 10 &&
      c.getAs[Long]("n_eval") == 0 && c.getAs[Long]("covered") == 0 &&
      c.isNullAt(c.fieldIndex("coverage")))
    val b = out("b")
    assert(b.getAs[Long]("n_eval") == 1 && b.getAs[Long]("covered") == 1 &&
      b.getAs[Double]("coverage") == 1.0)
  }
}
