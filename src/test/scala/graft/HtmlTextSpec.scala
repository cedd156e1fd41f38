package graft

import org.apache.spark.sql.functions._
import graft.functions.HtmlText

class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def stripDf(html: String*): Seq[String] =
    html.toDF("h").select(HtmlText.htmlText(col("h"))).as[String].collect().toSeq

  test("hand cases: tags, blocks, comments, entities, malformed input") {
    assert(stripDf("<p>Hello <b>world</b></p>") == Seq("Hello world"))
    assert(stripDf("<SCRIPT>var a = '<p>not text</p>';</SCRIPT>after") == Seq("after"))
    assert(stripDf("a<style media=\"x\">p{}</style>b") == Seq("ab"))
    assert(stripDf("x<!-- <script>never</script> -->y") == Seq("xy"))
    // entity decode incl. double-encoding resolving exactly one level
    assert(stripDf("A &amp;amp; B &lt;i&gt; &quot;q&quot; &#39;z&#39;&nbsp;!") ==
      Seq("A &amp; B <i> \"q\" 'z' !"))
    // unknown entities and case-variant entities stay literal
    assert(stripDf("&unknown; &AMP; &") == Seq("&unknown; &AMP; &"))
    // unterminated constructs drop to end of input
    assert(stripDf("keep<!-- gone forever") == Seq("keep"))
    assert(stripDf("keep<script>gone() //") == Seq("keep"))
    assert(stripDf("keep<style>p{") == Seq("keep"))
    // a lone <...> span with no inner '<' is a tag by definition
    assert(stripDf("3 < 5 and 7 > 2") == Seq("3 2"))
    // '<' that never closes stays literal text (entities still decode)
    assert(stripDf("3 < 5") == Seq("3 < 5"))
    assert(stripDf("tail<scriptless &amp; x") == Seq("tail<scriptless & x"))
    // a second '<' aborts the first (tags cannot contain '<'); the tag
    // then matches from the second '<'
    assert(stripDf("a <b <i>c") == Seq("a <b c"))
    // generic tag closing across a removed block (pass-1-then-pass-2 view)
    assert(stripDf("a < x <script>s</script> y > b") == Seq("a b"))
    // whitespace collapse + trim
    assert(stripDf("  <p>\n\ta\r\n\fb  </p>  ") == Seq("a b"))
    // <scripting ...> matches the <script[^>]*> prefix rule like the chain
    assert(stripDf("<scripting x>inside</script>out") == Seq("out"))
  }

  test("property: single-pass scanner equals the defining regexp chain on " +
       "generated documents") {
    val tags = Seq("<p>", "</p>", "<DIV class=\"a b\">", "</div>", "<br/>",
      "<a href=\"/x?a=1&amp;b=2\">", "</a>", "<H1>", "</h1>", "<img src='i.png'>")
    val texts = Seq("plain words here", "A &amp; B", "x &lt;= y &gt;= z",
      "say &quot;hi&quot;", "it&#39;s &apos;ok&apos;", "gap&nbsp;gap",
      "3 < 5", "a & b", "&bogus; stays", "  spaced\tout\n", "")
    val blocks = Seq(
      "<script>var x = 1 < 2;</script>",
      "<SCRIPT src=\"a.js\" async>f(\"</scr\" + \"ipt>\");</SCRIPT>",
      "<style>p { color: red; }</style>",
      "<!-- a comment -->", "<!---->", "")
    // deterministic pseudo-random composition; a tail fragment sometimes
    // leaves a construct unterminated
    val tails = Seq("", "<!-- open", "<script>open(", "<style>q{", "<unclosed")
    val docs = (0 until 400).map { i =>
      val sb = new StringBuilder
      var h = i * 2654435761L
      def pick[T](xs: Seq[T]): T = { h = h * 6364136223846793005L + 1442695040888963407L
        xs(((h >>> 33) % xs.size).toInt) }
      for (_ <- 0 until 12)
        sb.append(pick(Seq(pick(tags), pick(texts), pick(blocks))))
      sb.append(pick(tails))
      sb.toString
    }
    val got = stripDf(docs: _*)
    val want = docs.map(HtmlText.referenceChain)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"doc $i diverged:\nhtml=${docs(i)}\nscanner=$g\nchain=$w")
    }
  }
}
