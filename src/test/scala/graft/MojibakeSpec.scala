package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._
import graft.functions.Mojibake

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def garble(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)

  test("repair inverts UTF-8-as-Latin-1 double encoding, counts sequences") {
    val originals = Seq(
      "café", "naïve piñata jalapeño", "Größenwahn — öä ü ß",
      "“smart quotes” and ‘singles’ … ellipsis", "€99 ™ œuvre Ÿ",
      "日本語のテキスト", "mixed ascii café 日本 done", "и кириллица тоже")
    originals.foreach { o =>
      val g = garble(o)
      assert(g != o, s"garbling must change: $o")
      val (fixed, n) = Mojibake.repair(g)
      assert(fixed == o, s"repair(garble($o)) gave $fixed")
      assert(n == o.codePointCount(0, o.length) - o.count(_ < 0x80),
        s"count mismatch for $o")
    }
  }

  test("clean and merely-accented text passes through untouched") {
    val clean = Seq("plain ascii only", "café naïve — single accents",
      "price € 5", "x Ÿ y", "", "résumé")
    clean.foreach { s =>
      val (fixed, n) = Mojibake.repair(s)
      assert(fixed == s && n == 0, s"clean text harmed: $s -> $fixed ($n)")
    }
  }

  test("invalid byte runs stay byte-for-byte: lone leads, truncations, C3C3") {
    val bad = Seq("Ã", "ÃÃ", "aÃ b", "Ã©Ã", "â€", "xâ€ y")
    bad.foreach { s =>
      val (fixed, n) = Mojibake.repair(s)
      if (s == "Ã©Ã") {
        // partial runs are all-or-nothing: the trailing lone lead poisons
        // the whole run (strict rule — no partial decode inside a run)
        assert(fixed == s && n == 0)
      } else {
        assert(fixed == s && n == 0, s"invalid run altered: $s -> $fixed")
      }
    }
    // but the same prefix with a CLEAN boundary repairs
    assert(Mojibake.repair("Ã© x")._1 == "é x")
  }

  test("cp1252 tier: smart quotes and dashes round-trip; one level per call") {
    val o = "“q” — …"
    val once = garble(o)
    assert(Mojibake.repair(once) == ((o, o.count(_ >= 0x80))))
    val twice = garble(once)
    val (level1, _) = Mojibake.repair(twice)
    assert(level1 == once, "exactly one layer must unwrap per call")
    assert(Mojibake.repair(level1)._1 == o)
  }

  test("column expressions: fix + count over a DataFrame, null routing") {
    val df = Seq(garble("café “x”"), "clean", null.asInstanceOf[String])
      .toDF("t")
      .select(Mojibake.fix(col("t")).as("f"), Mojibake.count(col("t")).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "café “x”" && rows(0).getLong(1) == 3L)
    assert(rows(1).getString(0) == "clean" && rows(1).getLong(1) == 0L)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }
}
