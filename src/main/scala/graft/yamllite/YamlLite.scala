package graft.yamllite

import scala.collection.mutable

/** Minimal YAML-subset parser — just enough for the reference's scan-YAML
  * shape (reference tests/test_scan.py:22-72): nested maps, lists (including
  * lists of maps), scalars (quoted or bare), and `|` block scalars. No
  * anchors, no flow style, no multi-doc.
  */
sealed trait YValue {
  def asMap: Map[String, YValue] = this match {
    case YMap(m) => m
    case other   => throw new IllegalArgumentException(s"expected map, got $other")
  }
  def asList: Seq[YValue] = this match {
    case YList(l) => l
    case other    => throw new IllegalArgumentException(s"expected list, got $other")
  }
  def asString: String = this match {
    case YStr(s) => s
    case other   => throw new IllegalArgumentException(s"expected scalar, got $other")
  }
}
final case class YMap(entries: Map[String, YValue]) extends YValue
final case class YList(items: Seq[YValue]) extends YValue
final case class YStr(value: String) extends YValue

object YamlLite {

  private final case class Line(indent: Int, content: String, raw: String)

  def parse(text: String): YValue = {
    val lines = text.linesIterator.toVector
      .map { raw =>
        val noComment = stripComment(raw)
        val content = noComment.dropWhile(_ == ' ')
        Line(noComment.length - content.length, content.trim, raw)
      }
      .filter(_.content.nonEmpty)
    if (lines.isEmpty) YMap(Map.empty)
    else {
      val (v, rest) = parseBlock(lines, 0, lines.head.indent)
      require(rest >= lines.length, s"unparsed trailing content at line: ${lines(rest).content}")
      v
    }
  }

  private def stripComment(raw: String): String = {
    // conservative: '#' starts a comment only at start-of-line or after a space,
    // and only when not inside quotes.
    var inS = false; var inD = false
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (i < raw.length && !done) {
      val c = raw.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD && (i == 0 || raw.charAt(i - 1) == ' ')) done = true
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse the block starting at `pos` whose items sit at `indent`. Returns (value, nextPos). */
  private def parseBlock(lines: Vector[Line], pos: Int, indent: Int): (YValue, Int) =
    if (lines(pos).content.startsWith("- ") || lines(pos).content == "-") parseList(lines, pos, indent)
    else parseMap(lines, pos, indent)

  private def parseMap(lines: Vector[Line], pos0: Int, indent: Int): (YValue, Int) = {
    val entries = mutable.LinkedHashMap.empty[String, YValue]
    var pos = pos0
    while (pos < lines.length && lines(pos).indent == indent && !lines(pos).content.startsWith("- ")) {
      val Line(_, content, _) = lines(pos)
      val ci = keyColonIndex(content)
      require(ci >= 0, s"expected 'key:' in: $content")
      val key = unquote(content.take(ci).trim)
      val rest = content.drop(ci + 1).trim
      if (rest == "|" || rest == "|-") {
        val (s, next) = parseBlockScalar(lines, pos + 1, indent, chomp = rest == "|-")
        entries(key) = YStr(s); pos = next
      } else if (rest.nonEmpty) {
        entries(key) = YStr(unquote(rest)); pos = pos + 1
      } else {
        // nested block: deeper-indented map/list, or same-indent list, or empty
        val next = pos + 1
        if (next < lines.length && lines(next).indent > indent) {
          val (v, np) = parseBlock(lines, next, lines(next).indent)
          entries(key) = v; pos = np
        } else if (next < lines.length && lines(next).indent == indent &&
                   (lines(next).content.startsWith("- ") || lines(next).content == "-")) {
          val (v, np) = parseList(lines, next, indent)
          entries(key) = v; pos = np
        } else { entries(key) = YStr(""); pos = next }
      }
    }
    (YMap(entries.toMap), pos)
  }

  private def parseList(lines: Vector[Line], pos0: Int, indent: Int): (YValue, Int) = {
    val items = mutable.ArrayBuffer.empty[YValue]
    var pos = pos0
    while (pos < lines.length && lines(pos).indent == indent &&
           (lines(pos).content.startsWith("- ") || lines(pos).content == "-")) {
      val inner = lines(pos).content.drop(1).trim
      if (inner.isEmpty) { items += YStr(""); pos += 1 }
      else {
        val ci = keyColonIndex(inner)
        if (ci >= 0) {
          // list item is a map: rewrite '- key: v' as a virtual line at indent+2
          val virtualIndent = indent + 2
          val rewritten = lines.updated(pos, Line(virtualIndent, inner, lines(pos).raw))
          // the map continues on following lines indented >= virtualIndent
          val (v, np) = parseMapAtLeast(rewritten, pos, virtualIndent)
          items += v; pos = np
        } else { items += YStr(unquote(inner)); pos += 1 }
      }
    }
    (YList(items.toSeq), pos)
  }

  /** Parse a map whose first line sits at `indent`; subsequent keys may be at
    * exactly `indent` (standard for '- key:' list-of-map items).
    */
  private def parseMapAtLeast(lines: Vector[Line], pos: Int, indent: Int): (YValue, Int) =
    parseMap(lines, pos, indent)

  private def parseBlockScalar(lines: Vector[Line], pos0: Int, parentIndent: Int, chomp: Boolean): (String, Int) = {
    var pos = pos0
    val collected = mutable.ArrayBuffer.empty[String]
    var blockIndent = -1
    while (pos < lines.length && lines(pos).indent > parentIndent) {
      if (blockIndent < 0) blockIndent = lines(pos).indent
      collected += lines(pos).raw.drop(blockIndent)
      pos += 1
    }
    val body = collected.mkString("\n")
    (if (chomp) body else body + "\n", pos)
  }

  /** Index of the ':' that separates key from value (not inside quotes; must be
    * end-of-string or followed by a space).
    */
  private def keyColonIndex(s: String): Int = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == ':' && !inS && !inD && (i == s.length - 1 || s.charAt(i + 1) == ' ')) return i
      i += 1
    }
    -1
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
