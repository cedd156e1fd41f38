package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein distance: the edit distance of two strings if it
  * is ≤ `k`, else -1 — same contract as the 3-arg `levenshtein` builtin, but
  * built for the blocked fuzzy-join hot path where it runs once per
  * CANDIDATE PAIR (hundreds of thousands per block cell):
  *
  *   - the banded DP buffers are instance state (codegen: mutable fields;
  *     interpreted: a ThreadLocal), so the steady state allocates NOTHING
  *     per row — the builtin news up its rows every call;
  *   - full-ASCII strings (the entity-resolution common case) run the DP
  *     directly on UTF-8 bytes, no code-point decoding;
  *   - the band is Ukkonen's: only cells with |i−j| ≤ k are touched
  *     (O(k·n), not O(n·m)) and a row whose minimum exceeds k bails out
  *     immediately — most non-matches die in the first rows.
  *
  * Non-ASCII inputs delegate to `UTF8String.levenshteinDistance(other, k)`
  * so multibyte semantics stay identical to the builtin (and to DuckDB,
  * which the q_fuzzy_join oracle compares against).
  */
case class LevenshteinKExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 0, "threshold k must be >= 0")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_levenshtein expects two strings, got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_levenshtein"

  // interpreted path reuses per-thread buffers; [0] = prev row, [1] = cur row
  @transient private lazy val buffers: ThreadLocal[Array[Array[Int]]] =
    ThreadLocal.withInitial(() => Array(new Array[Int](64), new Array[Int](64)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (!x.isFullAscii || !y.isFullAscii) return x.levenshteinDistance(y, k)
    val n = x.numBytes(); val m = y.numBytes()
    if (math.abs(n - m) > k) return -1
    val big = k + 1
    val bufs = buffers.get()
    if (bufs(0).length < m + 1) {
      val len = math.max(m + 1, bufs(0).length * 2)
      bufs(0) = new Array[Int](len); bufs(1) = new Array[Int](len)
    }
    var prev = bufs(0); var cur = bufs(1)
    val jcap = math.min(m, k)
    var j = 0
    while (j <= jcap) { prev(j) = j; j += 1 }
    if (jcap + 1 <= m) prev(jcap + 1) = big
    var i = 1
    while (i <= n) {
      val jlo = math.max(1, i - k)
      val jhi = math.min(m, i + k)
      var rowMin = big
      if (jlo == 1) { cur(0) = if (i <= k) i else big; if (cur(0) < rowMin) rowMin = cur(0) }
      else cur(jlo - 1) = big
      val ai = x.getByte(i - 1)
      var jj = jlo
      while (jj <= jhi) {
        var v = prev(jj - 1) + (if (ai == y.getByte(jj - 1)) 0 else 1)
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > big) v = big
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (jhi + 1 <= m) cur(jhi + 1) = big
      if (rowMin > k) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(m)
    if (d > k) -1 else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prevField = ctx.addMutableState("int[]", "graftLevPrev", v => s"$v = new int[64];")
    val curField = ctx.addMutableState("int[]", "graftLevCur", v => s"$v = new int[64];")
    val utf8 = classOf[UTF8String].getName
    // CodegenContext keys functions by name: a fixed name would make two
    // graft_levenshtein calls with different k in one codegen stage collide
    // (last one wins, both silently run with its threshold). freshName gives
    // each expression instance its own function.
    val fnName = ctx.freshName("graftLevenshteinK")
    val fn = ctx.addNewFunction(fnName,
      s"""
         |private int $fnName($utf8 a, $utf8 b) {
         |  final int k = $k;
         |  if (!a.isFullAscii() || !b.isFullAscii()) return a.levenshteinDistance(b, k);
         |  final int n = a.numBytes();
         |  final int m = b.numBytes();
         |  if (Math.abs(n - m) > k) return -1;
         |  final int big = k + 1;
         |  int[] prev = $prevField;
         |  int[] cur = $curField;
         |  if (prev.length < m + 1) {
         |    int len = Math.max(m + 1, prev.length * 2);
         |    prev = new int[len]; cur = new int[len];
         |    $prevField = prev; $curField = cur;
         |  }
         |  final int jcap = Math.min(m, k);
         |  for (int j = 0; j <= jcap; j++) prev[j] = j;
         |  if (jcap + 1 <= m) prev[jcap + 1] = big;
         |  for (int i = 1; i <= n; i++) {
         |    final int jlo = Math.max(1, i - k);
         |    final int jhi = Math.min(m, i + k);
         |    int rowMin = big;
         |    if (jlo == 1) { cur[0] = (i <= k) ? i : big; if (cur[0] < rowMin) rowMin = cur[0]; }
         |    else cur[jlo - 1] = big;
         |    final byte ai = a.getByte(i - 1);
         |    for (int j = jlo; j <= jhi; j++) {
         |      int v = prev[j - 1] + ((ai == b.getByte(j - 1)) ? 0 : 1);
         |      final int del = prev[j] + 1;
         |      if (del < v) v = del;
         |      final int ins = cur[j - 1] + 1;
         |      if (ins < v) v = ins;
         |      if (v > big) v = big;
         |      cur[j] = v;
         |      if (v < rowMin) rowMin = v;
         |    }
         |    if (jhi + 1 <= m) cur[jhi + 1] = big;
         |    if (rowMin > k) return -1;
         |    int[] t = prev; prev = cur; cur = t;
         |  }
         |  final int d = prev[m];
         |  return d > k ? -1 : d;
         |}
       """.stripMargin, inlineToOuterClass = true)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $fn($x, $y);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LevenshteinKExpr =
    copy(left = newLeft, right = newRight)
}

object LevenshteinK {
  def levenshteinK(a: Column, b: Column, k: Int): Column =
    GraftShim.toColumn(LevenshteinKExpr(GraftShim.toExpression(a), GraftShim.toExpression(b), k))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("graft_levenshtein"),
    new ExpressionInfo(classOf[LevenshteinKExpr].getName, "graft_levenshtein"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_levenshtein(a, b, k) takes 3 arguments")
      require(args(2).foldable,
        "graft_levenshtein: k must be an integer literal (got a non-foldable expression)")
      val kv = args(2).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
      }
      LevenshteinKExpr(args(0), args(1), kv)
    }
  )
}
