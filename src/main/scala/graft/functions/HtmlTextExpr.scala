package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML-to-text boilerplate strip — the step upstream of every text-quality
  * operator in a web pipeline: drop `<script>`/`<style>` blocks and HTML
  * comments entirely, replace every remaining tag with a space, decode the
  * common named entities, collapse whitespace runs, trim.
  *
  * The semantics are DEFINED as the following regexp chain (RE2-safe and
  * leftmost-first in both engines, so a DuckDB oracle replays it verbatim —
  * executable twin at [[HtmlText.referenceChain]]):
  *
  *  1. ONE alternation pass removing blocks, leftmost-first:
  *     `(?is)<!--.*?(-->|$)|<script[^>]*>.*?(</script[^>]*>|$)|`
  *     `<style[^>]*>.*?(</style[^>]*>|$)` → `` (unterminated → end of text)
  *  2. `(?s)<[^<>]*>` → ` ` — a tag may not contain `<` or `>`; a `<` that
  *     never closes stays literal
  *  3. `&lt; &gt; &quot; &apos; &#39; &nbsp; &amp;` decoded in that order
  *     (`&amp;` LAST so double-encoding resolves one level, never two;
  *     entities are case-sensitive; numeric references beyond `&#39;` are
  *     out of scope by design)
  *  4. `[ \t\n\r\f]+` → ` `, then trim spaces.
  *
  * [[HtmlText.strip]] is the SINGLE-PASS scanner equivalent (no regex
  * engine, static-call codegen — the TextFoldExpr discipline): generic tags
  * are resolved on the BLOCK-REMOVED view by skipping blocks while scanning
  * for the closing `>`, exactly as pass 2 sees the string after pass 1.
  * HtmlSpec property-checks scanner ≡ chain over generated documents. The
  * one documented divergence class: an ENTITY whose characters straddle a
  * removed block (`&l<!-- -->t;`) — the chain joins and decodes it, the
  * scanner keeps it split; no real markup does this.
  */
object HtmlText {

  private def indexOfCI(s: String, pat: String, from: Int): Int = {
    var i = math.max(from, 0)
    val limit = s.length - pat.length
    while (i <= limit) {
      if (s.regionMatches(true, i, pat, 0, pat.length)) return i
      i += 1
    }
    -1
  }

  def strip(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)

    // if a comment/script/style block starts at p, the position just past
    // it (n when unterminated), else -1. Alternative order = the chain's.
    def skipBlockAt(p: Int): Int = {
      if (p >= n || s.charAt(p) != '<') return -1
      if (s.regionMatches(true, p + 1, "!--", 0, 3)) {
        val e = s.indexOf("-->", p + 4)
        return if (e < 0) n else e + 3
      }
      if (s.regionMatches(true, p + 1, "script", 0, 6)) {
        val open = s.indexOf('>', p + 7)
        if (open < 0) return -1 // opening tag never closes: not a block
        val close = indexOfCI(s, "</script", open + 1)
        val e = if (close < 0) -1 else s.indexOf('>', close + 8)
        return if (close < 0 || e < 0) n else e + 1
      }
      if (s.regionMatches(true, p + 1, "style", 0, 5)) {
        val open = s.indexOf('>', p + 6)
        if (open < 0) return -1
        val close = indexOfCI(s, "</style", open + 1)
        val e = if (close < 0) -1 else s.indexOf('>', close + 7)
        return if (close < 0 || e < 0) n else e + 1
      }
      -1
    }

    // decode entities of a tag-free span straight into sb
    def appendText(t: CharSequence): Unit = {
      val m = t.length
      var k = 0
      def at(pat: String): Boolean = {
        if (k + pat.length > m) return false
        var x = 0
        while (x < pat.length) {
          if (t.charAt(k + x) != pat.charAt(x)) return false
          x += 1
        }
        true
      }
      while (k < m) {
        val ch = t.charAt(k)
        if (ch == '&') {
          if (at("&lt;")) { sb.append('<'); k += 4 }
          else if (at("&gt;")) { sb.append('>'); k += 4 }
          else if (at("&quot;")) { sb.append('"'); k += 6 }
          else if (at("&apos;")) { sb.append('\''); k += 6 }
          else if (at("&#39;")) { sb.append('\''); k += 5 }
          else if (at("&nbsp;")) { sb.append(' '); k += 6 }
          else if (at("&amp;")) { sb.append('&'); k += 5 }
          else { sb.append('&'); k += 1 }
        } else { sb.append(ch); k += 1 }
      }
    }

    var i = 0
    var textStart = 0 // start of the current tag-free literal run
    def flushText(until: Int): Unit =
      if (until > textStart) appendText(s.subSequence(textStart, until))

    while (i < n) {
      if (s.charAt(i) == '<') {
        flushText(i)
        val blk = skipBlockAt(i)
        if (blk >= 0) { i = blk; textStart = i }
        else {
          // generic tag on the block-removed view: scan for '>', skipping
          // blocks; a non-block '<' aborts (first '<' is literal, resume at
          // the aborting '<'); EOF without '>' leaves everything literal
          val pending = new java.lang.StringBuilder
          var j = i + 1
          var done = false
          while (!done) {
            if (j >= n) {
              sb.append('<'); appendText(pending); i = n; done = true
            } else s.charAt(j) match {
              case '>' =>
                sb.append(' '); i = j + 1; done = true
              case '<' =>
                val b = skipBlockAt(j)
                if (b >= 0) j = b
                else { sb.append('<'); appendText(pending); i = j; done = true }
              case ch =>
                pending.append(ch); j += 1
            }
          }
          textStart = i
        }
      } else i += 1
    }
    flushText(n)

    // whitespace collapse + space trim (chain step 4)
    val out = new java.lang.StringBuilder(sb.length)
    var j = 0
    var pendingSpace = false
    while (j < sb.length) {
      val ch = sb.charAt(j)
      if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f') {
        pendingSpace = out.length > 0
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(ch)
      }
      j += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** The defining regexp chain (see class doc) — the cross-check twin the
    * spec property-tests [[strip]] against and the DuckDB oracle mirrors.
    * Kept in main as executable documentation (the simhashBitsHof
    * discipline); not for hot paths.
    */
  def referenceChain(s: String): String = {
    var x = s
    x = x.replaceAll(
      "(?is)<!--.*?(-->|$)|<script[^>]*>.*?(</script[^>]*>|$)|" +
        "<style[^>]*>.*?(</style[^>]*>|$)", "")
    x = x.replaceAll("(?s)<[^<>]*>", " ")
    x = x.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
    x = x.replaceAll("[ \t\n\r\f]+", " ")
    x.stripPrefix(" ").stripSuffix(" ")
  }

  /** Column API: `graft_html_text(html)`. */
  def htmlText(html: Column): Column =
    GraftShim.toColumn(HtmlTextExpr(GraftShim.toExpression(html)))
}

/** Codegen'd wrapper around [[HtmlText.strip]] — a static call per row, no
  * reference objects, stays inside whole-stage codegen.
  */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_text expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_text"

  override def nullSafeEval(input: Any): Any =
    HtmlText.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlTextExpr =
    copy(child = newChild)
}
