package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton over a fixed pattern dictionary:
  * counts ALL occurrences (overlapping included) of every pattern in one
  * left-to-right pass — O(text + matches) regardless of dictionary size,
  * where N `instr`/regexp probes would cost O(N · text).
  *
  * Byte-level matching over UTF-8 is exact: a valid pattern's first byte is
  * never a continuation byte, so a byte match can't start mid-codepoint.
  *
  * Built once per expression instance (driver), shipped as a reference
  * object to executors. Dense 256-way goto table converted to a DFA during
  * the failure-link BFS (no failure chasing at match time); per-node output
  * lists are pre-flattened through the suffix links.
  */
private[functions] final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  private val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes("UTF-8")).toArray
  require(patBytes.forall(_.nonEmpty), "empty pattern")

  // trie build (dense child tables; dictionaries are small by contract)
  private val go: Array[Array[Int]] = {
    val buf = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    patBytes.foreach { p =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xff
        if (buf(s)(c) == -1) { buf += Array.fill(256)(-1); buf(s)(c) = buf.length - 1 }
        s = buf(s)(c)
      }
    }
    buf.toArray
  }
  private val ends: Array[List[Int]] = {
    val e = Array.fill[List[Int]](go.length)(Nil)
    patBytes.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b => s = go(s)(b & 0xff) }
      e(s) = pi :: e(s)
    }
    e
  }
  // BFS: failure links + DFA completion + flattened outputs
  private val out: Array[Array[Int]] = {
    val fail = new Array[Int](go.length)
    val outs = Array.tabulate(go.length)(i => ends(i).reverse.toArray)
    val q = new java.util.ArrayDeque[Int]()
    (0 until 256).foreach { c =>
      if (go(0)(c) == -1) go(0)(c) = 0
      else { fail(go(0)(c)) = 0; q.add(go(0)(c)) }
    }
    while (!q.isEmpty) {
      val s = q.poll()
      outs(s) = outs(s) ++ outs(fail(s))
      (0 until 256).foreach { c =>
        val t = go(s)(c)
        if (t == -1) go(s)(c) = go(fail(s))(c)
        else { fail(t) = go(fail(s))(c); q.add(t) }
      }
    }
    outs
  }

  def numPatterns: Int = patBytes.length

  /** Per-pattern occurrence counts in one pass over the bytes. */
  def matchCounts(bytes: Array[Byte]): Array[Int] = {
    val counts = new Array[Int](patBytes.length)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = go(s)(bytes(i) & 0xff)
      val os = out(s)
      var j = 0
      while (j < os.length) { counts(os(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

/** `graft_dict_hits(text)` for a literal dictionary: array<int> of ALL
  * (overlapping included) occurrence counts per pattern — the gazetteer /
  * entity-list / blocklist matcher. One automaton pass per row, codegen'd;
  * the dictionary lives in one broadcast-safe reference object, so plan
  * size is O(1) in dictionary size (the bind-once discipline).
  */
case class DictMatchExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "empty dictionary")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dict_hits expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_dict_hits"

  @transient private lazy val automaton = new AhoCorasick(patterns)

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      automaton.matchCounts(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val acRef = ctx.addReferenceObj("dictAutomaton", automaton,
        classOf[AhoCorasick].getName)
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($acRef.matchCounts($text.getBytes()));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DictMatchExpr =
    copy(child = newChild)
}

object DictMatch {
  /** Column API: per-pattern (overlapping) occurrence counts in `text`. */
  def hits(text: Column, patterns: Seq[String]): Column =
    GraftShim.toColumn(DictMatchExpr(GraftShim.toExpression(text), patterns))
}
