package graft

import graft.ops.{Components, Correlation, Windows}
import graft.scan.Drift
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-13 batch-2 statistics: k-sample drift (Kruskal–Wallis, ANOVA F),
  * effect size (Cliff's δ), JS divergence, Mann–Kendall + Sen slope,
  * time-grid gap fill (LOCF), and partition modularity. Fixtures with
  * hand-computed closed-form expectations.
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
}
