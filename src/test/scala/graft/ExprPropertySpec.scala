package graft

import graft.functions.{BandPrefixMatch, JaccardSim, KmvSketch, SimHash}
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized cross-checks of the native codegen'd expressions against
  * straightforward Scala reference implementations, evaluated through real
  * Spark plans (one small DataFrame per sample batch).
  */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val longArr = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.take(40))

  test("JaccardSimExpr(long) equals set-based jaccard on random sorted-distinct arrays") {
    check(Prop.forAll(longArr, longArr) { (a0, b0) =>
      val a = a0.distinct.sorted
      val b = b0.distinct.sorted
      val got = Seq((a, b)).toDF("a", "b")
        .select(JaccardSim.jaccard(col("a"), col("b"))).as[Double].collect()(0)
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.size + b.size - inter
      val want = if (union == 0) 1.0 else inter.toDouble / union
      got == want
    })
  }

  test("SimHashExpr equals per-bit majority reference on random hash arrays") {
    check(Prop.forAll(longArr.suchThat(_.nonEmpty)) { hs =>
      val got = Seq(Tuple1(hs)).toDF("h")
        .select(SimHash.simhash(col("h"), 64)).as[Long].collect()(0)
      var want = 0L
      for (b <- 0 until 64) {
        val set = hs.count(h => ((h >>> b) & 1L) == 1L)
        if (set * 2 > hs.size) want |= (1L << b)
      }
      got == want
    })
  }

  test("BandPrefixMatchExpr equals prefix-scan reference") {
    val bk = Gen.listOfN(8, Gen.chooseNum(0L, 3L)) // small range forces matches
    check(Prop.forAll(bk, bk, Gen.chooseNum(0, 8)) { (a, b, n) =>
      val got = Seq((a, b, n)).toDF("a", "b", "n")
        .select(BandPrefixMatch.matchesBefore(col("a"), col("b"), col("n"))).as[Boolean].collect()(0)
      got == (0 until n).exists(i => a(i) == b(i))
    })
  }

  test("KmvSketchAgg equals k smallest distinct non-negative hashes") {
    val vals = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000L))
    check(Prop.forAll(vals) { vs =>
      val got = vs.toDF("v").select(KmvSketch.kmv(col("v"), 8)).as[Seq[Long]].collect()(0)
      got == vs.distinct.sorted.take(8)
    }, n = 20)
  }

  test("minhash signature HOF fallback equals the native expression") {
    check(Prop.forAll(longArr.suchThat(_.nonEmpty)) { hs =>
      val df = Seq(Tuple1(hs)).toDF("h")
      val native = df.select(Dedup.minhashSignatureFromHashes(col("h"), 16)).as[Seq[Long]].collect()(0)
      val hof = df.select(Dedup.minhashSignatureFromHashesHof(col("h"), 16)).as[Seq[Long]].collect()(0)
      native == hof
    }, n = 15)
  }

  test("WordSetHitsExpr equals per-set membership counts on random token arrays") {
    import graft.functions.WordSetHits
    // overlapping sets on a small vocabulary so collisions and multi-set
    // membership both occur
    val sets = Seq(Seq("the", "a", "la", "de"), Seq("la", "de", "el"), Seq("und", "de"))
    val vocab = Gen.oneOf("the", "a", "la", "de", "el", "und", "zz", "", "THE")
    check(Prop.forAll(Gen.listOf(vocab)) { toks =>
      val got = Seq(Tuple1(toks)).toDF("t")
        .select(WordSetHits.hits(col("t"), sets)).as[Seq[Int]].collect()(0)
      val want = sets.map(s => toks.count(s.contains))
      got == want
    }, n = 20)
  }

  test("ShingleStringsExpr equals the zip_with-fold formulation") {
    import graft.ops.Shingles
    // includes nulls: windows containing a null are dropped on BOTH paths
    val tok = Gen.oneOf("a", "bb", "ccc", "", "dd", "e", null)
    val toks = Gen.listOf(tok)
    check(Prop.forAll(toks, Gen.chooseNum(1, 5)) { (ts, n) =>
      val df = Seq(Tuple1(ts)).toDF("t")
      val native = df.select(Shingles.shingleStrings(col("t"), n)).as[Seq[String]].collect()(0)
      val hof = df.select(Shingles.shingleStringsHof(col("t"), n)).as[Seq[String]].collect()(0)
      native == hof
    }, n = 25)
  }

  test("LevenshteinKExpr equals the thresholded builtin on random strings") {
    import graft.functions.LevenshteinK
    // short alphabet forces near-matches; includes empty strings and a
    // multibyte char to exercise the non-ASCII delegation path
    val s = Gen.listOf(Gen.oneOf("a", "b", "c", "é")).map(_.mkString)
    check(Prop.forAll(s, s, Gen.chooseNum(0, 4)) { (a, b, k) =>
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(LevenshteinK.levenshteinK(col("a"), col("b"), k))
        .as[Int].collect()(0)
      val want = df.select(levenshtein(col("a"), col("b"), k))
        .as[Int].collect()(0)
      got == want
    }, n = 60)
  }

  test("langIdWithMargin: best equals langId on random corpora; tie order hand-checked") {
    import graft.ops.TextAnalysis
    val word = Gen.oneOf("the", "la", "de", "que", "und", "zhe4", "xyz", "ist", "en", "du")
    val text = Gen.listOf(word).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(5, text)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val base = TextAnalysis.langId(df, "text").select("id", "predicted_lang")
        .as[(Long, String)].collect().toSet
      val m = TextAnalysis.langIdWithMargin(df, "text").select("id", "predicted_lang")
        .as[(Long, String)].collect().toSet
      base == m
    }, n = 15)
    // hand tie case: "la de" hits es=2, fr=2 (both contain la+de), de=0…
    // ties go to the lexicographically-first language at BOTH ranks
    val hand = Seq((1L, "la de")).toDF("id", "text")
    val r = TextAnalysis.langIdWithMargin(hand, "text")
      .select("predicted_lang", "second_lang", "margin", "is_mixed")
      .as[(String, String, Long, Boolean)].collect()(0)
    assert(r == (("es", "fr", 0L, true)), s"$r")
  }

  test("TypeMaskExpr equals the seven anchored regexes on adversarial + random strings") {
    import graft.functions.TypeMask
    import graft.ops.Constraints
    val compiled = Constraints.TypePatterns.map { case (tn, re) => tn -> re.r.pattern }
    def regexMask(s: String): Int =
      compiled.zipWithIndex.foldLeft(0) { case (m, ((_, p), i)) =>
        if (p.matcher(s).matches()) m | (1 << i) else m
      }
    val adversarial = Seq(
      "true", "FALSE", "TrUe", "faLSe", "truth", "false ", "",
      "5", "+5", "-5", "+", "-", "007", "1234567890123456789", "123456789012345678",
      "5.", "-.5", ".", "5.5", "5e3", "5E+3", "5e", "5e+", ".e3", "1.2.3", "+-5",
      "2024-01-01", "2024-1-1", "20240101", "9999-99-99", "2024-01-011",
      "2024-01-01 12:34:56", "2024-01-01T12:34:56", "2024-01-01T12:34:56.123",
      "2024-01-01T12:34:56.", "2024-01-01x12:34:56", "2024-01-01 12:34:5",
      "d41d8cd9-8f00-b204-e980-0998ecf8427e", "D41D8CD9-8F00-B204-E980-0998ECF8427E",
      "d41d8cd9-8f00-b204-e980-0998ecf8427", "d41d8cd98f00b204e9800998ecf8427e",
      "g41d8cd9-8f00-b204-e980-0998ecf8427e",
      "a@b.co", "a@b.c", "a.b+c%d@x-y.org", "@b.co", "a@", "a@@b.co", "a@b",
      "a@b.", "a@b.c9", "a@.co", "a@x.co.uk", "a@-.co", "u7@example.com",
      "N/A", "  5", "5  ")
    adversarial.foreach { s =>
      assert(TypeMask.mask(org.apache.spark.unsafe.types.UTF8String.fromString(s)) == regexMask(s),
        s"mismatch on '$s': mask=${TypeMask.mask(org.apache.spark.unsafe.types.UTF8String.fromString(s))} regex=${regexMask(s)}")
    }
    // random strings over a type-shaped alphabet (no newlines: the native
    // classifier is strict-full-match; Java's $ would allow one trailing \n)
    val alphabet = Gen.oneOf(('0' to '9') ++ Seq('+', '-', '.', 'e', 'E', 'T', ' ',
      ':', '@', '_', '%', 'a', 'b', 'f', 'r', 'u', 's', 'l', 'A', 'F', 'c', 'd', '/'))
    val str = Gen.listOf(alphabet).map(_.mkString)
    check(Prop.forAll(str) { s =>
      TypeMask.mask(org.apache.spark.unsafe.types.UTF8String.fromString(s)) == regexMask(s)
    }, n = 2000)
    // strict on trailing newlines, like Pattern.matches (rlike's find()
    // would accept "5\n" via the $-before-terminator allowance; the
    // classifier and the DuckDB oracle both reject it)
    assert(regexMask("5\n") == 0 && TypeMask.mask(
      org.apache.spark.unsafe.types.UTF8String.fromString("5\n")) == 0)
    // end-to-end: mask-based inferTypes == regex-based on a mixed frame,
    // through real plans (nulls included)
    val df = Seq("5", "5.5", "true", "2024-01-01", null, "a@b.co", "N/A", "x")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "v")
    val a = Constraints.inferTypes(df, Seq("v"), 0.5).collect().toSeq.map(_.toString)
    val b = Constraints.inferTypesRegex(df, Seq("v"), 0.5).collect().toSeq.map(_.toString)
    assert(a == b, s"$a vs $b")
  }

  test("JaroWinklerExpr: literature values, symmetry, bounds, null routing") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String) = JaroWinkler.similarity(a, b)
    // the standard literature pairs (also DuckDB's values — the gate
    // oracles against its builtin, bit-verified on 20k random pairs)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
    assert(jw("abc", "abc") == 1.0 && jw("abc", "") == 0.0 && jw("", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no matches
    // boost only above 0.7, prefix capped at 4
    assert(math.abs(jw("abcdxxxxx", "abcdyyyyy") - 0.6296296296296297) < 1e-15)
    assert(math.abs(jw("x" * 20, "x" * 19 + "y") - 0.98) < 1e-15)
    // properties: symmetry + [0,1] bounds on random pairs
    val str = Gen.listOf(Gen.oneOf("abcdeXY123 #-".toSeq)).map(_.mkString)
    check(Prop.forAll(str, str) { (a, b) =>
      val s = jw(a, b)
      s == jw(b, a) && s >= 0.0 && s <= 1.0
    }, n = 500)
    // through a real plan: codegen'd expression + null routing
    val df = Seq((Some("martha"), Some("marhta")), (None, Some("x")))
      .toDF("a", "b")
    val got = df.select(JaroWinkler.sim(col("a"), col("b"))).collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(got(1).isNullAt(0))
  }

  test("IvfCellsExpr flat probe ranking equals the literal array_sort route on random vectors") {
    import graft.ops.Similarity
    // small coordinates force cosine ties and zero vectors force NaNs —
    // exactly the orderings the closure expression claims to replicate
    val coord = Gen.oneOf(-1.0, 0.0, 0.5, 1.0)
    val vec = Gen.listOfN(4, coord)
    val mat = Gen.listOfN(6, vec).suchThat(_.nonEmpty)
    check(Prop.forAll(vec, mat, Gen.chooseNum(1, 6)) { (v, m, nprobe) =>
      val seeds = m.map(_.toArray).toArray
      val df = Seq(Tuple1(v)).toDF("v")
        .select(transform(col("v"), x => x.cast("double")).as("v"))
      val got = df.select(graft.functions.IvfCells.probed(
          col("v"), seeds, Array.empty, Array.empty, nprobe, 1))
        .as[Seq[Int]].collect()(0)
      // the literal route's ranking: reverse(array_sort(struct(cos, cell)))
      val lit0 = seeds.zipWithIndex.map { case (s, i) =>
        struct(Similarity.cosine(col("v"), typedLit(s.toSeq)).as("cos"),
          lit(i).as("cell"))
      }
      val want = df.select(slice(reverse(array_sort(array(lit0.toSeq: _*))), 1, nprobe)
          .getField("cell"))
        .as[Seq[Int]].collect()(0)
      got == want
    }, n = 120)
  }

  test("native langId equals the HOF fold formulation") {
    import graft.ops.TextAnalysis
    val word = Gen.oneOf("the", "la", "de", "que", "und", "zhe4", "xyz", "ist", "en", "du")
    val text = Gen.listOf(word).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(5, text)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val native = TextAnalysis.langId(df, "text").select("id", "predicted_lang")
        .as[(Long, String)].collect().toSet
      val hof = TextAnalysis.langIdHof(df, "text").select("id", "predicted_lang")
        .as[(Long, String)].collect().toSet
      native == hof
    }, n = 15)
  }
}
