package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** The native one-pass script counter must be BIT-IDENTICAL to the
  * regexp_replace formulation that defines the counts (and that the DuckDB
  * oracles replay verbatim) — on every output column including the
  * dominance tie-breaks.
  */
class ScriptCountsSpec extends SparkSpec {
  import spark.implicits._

  private def cp(i: Int): String = new String(Character.toChars(i))

  private def bothWays(texts: Seq[String]): Unit = {
    val df = texts.toDF("t")
    val native = df.select(TextAnalysis.scriptProfile(col("t")): _*).collect()
    val regex = df.select(TextAnalysis.scriptProfileRegex(col("t")): _*).collect()
    native.zip(regex).zip(texts).foreach { case ((n, r), t) =>
      assert(n == r, s"native != regex for codepoints ${t.map(_.toInt).toList.take(40)}")
    }
  }

  // every range boundary from ScriptRanges, as codepoints: first-in,
  // last-in, one-below, one-above
  private val boundaryPoints: Seq[Int] = Seq(
    'A'.toInt, 'Z'.toInt, 'a'.toInt, 'z'.toInt, 0x40, 0x5B, 0x60, 0x7B,
    0x00C0, 0x024F, 0x00BF, 0x0250,           // latin supplement/extended
    0x0400, 0x04FF, 0x03FF, 0x0500,           // cyrillic (0x03FF is greek!)
    0x4E00, 0x9FFF, 0x4DFF, 0xA000,           // cjk ideographs
    0x3040, 0x30FF, 0x303F, 0x3100,           // kana
    0x0600, 0x06FF, 0x05FF, 0x0700,           // arabic
    0xAC00, 0xD7AF, 0xABFF, 0xD7B0,           // hangul syllables
    0x1100, 0x11FF, 0x10FF, 0x1200,           // hangul jamo
    0x0370, 0x03FF, 0x036F,                   // greek
    0x0900, 0x097F, 0x08FF, 0x0980)           // devanagari

  test("adversarial fixtures: boundaries, ties, mixes, empties, non-BMP") {
    val boundary = boundaryPoints.map(cp)
    val allBoundaries = boundaryPoints.map(cp).mkString
    bothWays(boundary ++ Seq(
      "", " ", "hello world", "HELLO", allBoundaries,
      // dominance flips and exact ties (earlier script must win)
      "abc " + cp(0x043F) * 5, "ab " + cp(0x043F) * 2, "a" + cp(0x043F),
      cp(0x043F) + "a", cp(0x4E00) + cp(0x043F) + "a" + cp(0x0370),
      cp(0x4E00) * 3 + "ab" + cp(0x043F) * 3,
      // none (no letters in any range)
      "123 !@# \t\n", cp(0x3000) + cp(0x2026),
      // non-BMP ignored on both paths
      cp(0x1F600) + cp(0x1F389) + " emoji only", "a" + cp(0x1F600) + cp(0x043F),
      cp(0xFFFD) + " replacement", "ascii " + cp(0x2026) + " " + cp(0x2014)))
  }

  test("property: random multi-script strings agree on all 8 columns") {
    val rnd = new scala.util.Random(41117)
    val pools: Seq[(Int, Int)] = Seq(
      ('a'.toInt, 'z'.toInt), ('A'.toInt, 'Z'.toInt),
      (0x00C0, 0x024F), (0x0400, 0x04FF),
      (0x4E00, 0x4E80), (0x3040, 0x30FF),
      (0x0600, 0x06FF), (0xAC00, 0xAC80),
      (0x1100, 0x11FF), (0x0370, 0x03FF),
      (0x0900, 0x097F),
      // near-miss neighbours, ascii noise, non-BMP
      (0x20, 0xBF), (0x0250, 0x036F),
      (0x0980, 0x09FF), (0x3000, 0x303F),
      (0x1F300, 0x1F64F))
    def randomText(): String = {
      val len = rnd.nextInt(60)
      (0 until len).map { _ =>
        val (lo, hi) = pools(rnd.nextInt(pools.size))
        cp(lo + rnd.nextInt(hi - lo + 1))
      }.mkString
    }
    bothWays(Seq.fill(300)(randomText()))
  }

  test("direct eval: known counts, empty string, null-free array") {
    import graft.functions.ScriptCounts
    import org.apache.spark.unsafe.types.UTF8String
    // one letter of each script + one ascii digit + space
    val t = "a" + cp(0x00C1) + cp(0x043F) + cp(0x4E00) + cp(0x0600) +
      cp(0xAC00) + cp(0x0370) + cp(0x0900) + " 7"
    val arr = ScriptCounts.counts(UTF8String.fromString(t)).toLongArray()
    assert(arr.toSeq == Seq(2L, 1L, 1L, 1L, 1L, 1L, 1L))
    assert(ScriptCounts.counts(UTF8String.fromString("")).toLongArray().forall(_ == 0L))
  }
}
