package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Probed-cell selection for IVF quantizers whose centroid table is too big
  * to bind as a plan LITERAL: the matrices live as plain JVM arrays INSIDE
  * the expression object, which Spark serializes once into the task binary
  * (Torrent-broadcast per stage) — they never enter the logical plan, the
  * plan string, or generated code. At the flat cap (65536 cells × 64 dims)
  * the literal route's `typedLit` is a ~33 MB plan constant that every
  * analysis/codegen pass re-walks (measured in PLANS.md); this form is O(1)
  * in ncells on the driver.
  *
  * Two modes sharing one tie discipline:
  *  - FLAT (`subVecs` empty): scores `v` against every row of `tops`,
  *    returns the `nprobe` best INDICES — bit-compatible with the literal
  *    route's `reverse(array_sort(...))` ranking (cos desc, id desc on
  *    ties; NaN greatest, exactly Spark's double ordering).
  *  - HIERARCHICAL: picks the `expandTops` best level-1 centroids, then
  *    ranks the union of their sub-cells and returns the `nprobe` best
  *    GLOBAL cell ids (`subIds`). Per-row cost is ntop + expandTops·nsub
  *    cosines ≈ 2·√ncells instead of ncells — the assignment form that
  *    stays bounded past the flat 2^16 cap.
  *
  * The cosine loop replicates [[CosineSimExpr]]'s accumulation order
  * exactly, so flat-mode results are bit-equal to the literal route
  * (spec-asserted in HierIvfSpec).
  */
case class IvfCellsExpr(child: Expression,
                        tops: Array[Array[Double]],
                        subIds: Array[Array[Int]],
                        subVecs: Array[Array[Array[Double]]],
                        nprobe: Int,
                        expandTops: Int)
    extends UnaryExpression with CodegenFallback {

  require(nprobe >= 1 && expandTops >= 1)
  require(subIds.length == subVecs.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_cells expects array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_cells"
  // keep the matrices OUT of plan strings (TreeNode.argString walks
  // productIterator by default — printing them would re-create the very
  // plan-size problem this expression exists to remove)
  override def stringArgs: Iterator[Any] = Iterator(child,
    s"ntop=${tops.length}", s"ncells=${subIds.iterator.map(_.length).sum}",
    s"nprobe=$nprobe", s"expandTops=$expandTops")

  /** [[CosineSimExpr]]'s exact loop (same accumulation order → bit-equal). */
  private def cos(x: ArrayData, c: Array[Double]): Double = {
    val n = math.min(x.numElements(), c.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = c(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** (cos desc, id desc) with NaN greatest — Spark's struct-max/sort order
    * over (cos, cell), so flat mode ties break exactly like the literal
    * route's `array_max` / `reverse(array_sort(...))`.
    */
  private def better(c1: Double, i1: Int, c2: Double, i2: Int): Boolean = {
    val c = java.lang.Double.compare(c1, c2)
    c > 0 || (c == 0 && i1 > i2)
  }

  /** Indices of the k best (score, id) pairs, best first — selection scans
    * (k and the candidate set are both probe-sized, never data-sized).
    */
  private def topK(scores: Array[Double], ids: Array[Int], k: Int): Array[Int] = {
    val n = scores.length
    val m = math.min(k, n)
    val picked = new Array[Boolean](n)
    val out = new Array[Int](m)
    var r = 0
    while (r < m) {
      var bi = -1
      var i = 0
      while (i < n) {
        if (!picked(i) && (bi < 0 || better(scores(i), ids(i), scores(bi), ids(bi)))) bi = i
        i += 1
      }
      picked(bi) = true
      out(r) = bi
      r += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val tScores = new Array[Double](tops.length)
    val tIds = new Array[Int](tops.length)
    var i = 0
    while (i < tops.length) {
      tScores(i) = cos(x, tops(i)); tIds(i) = i; i += 1
    }
    if (subVecs.isEmpty) {
      new GenericArrayData(topK(tScores, tIds, nprobe))
    } else {
      val bestTops = topK(tScores, tIds, expandTops)
      var nCand = 0
      var t = 0
      while (t < bestTops.length) { nCand += subIds(bestTops(t)).length; t += 1 }
      val cScores = new Array[Double](nCand)
      val cIds = new Array[Int](nCand)
      var w = 0
      t = 0
      while (t < bestTops.length) {
        val ti = bestTops(t)
        val ids = subIds(ti); val vecs = subVecs(ti)
        var j = 0
        while (j < ids.length) {
          cScores(w) = cos(x, vecs(j)); cIds(w) = ids(j); w += 1; j += 1
        }
        t += 1
      }
      val sel = topK(cScores, cIds, nprobe)
      val out = new Array[Int](sel.length)
      var r = 0
      while (r < sel.length) { out(r) = cIds(sel(r)); r += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCellsExpr =
    copy(child = newChild)
}

object IvfCells {
  /** `nprobe` best cell ids (best first) as `array<int>`. */
  def probed(v: Column, tops: Array[Array[Double]], subIds: Array[Array[Int]],
             subVecs: Array[Array[Array[Double]]], nprobe: Int, expandTops: Int): Column =
    GraftShim.toColumn(IvfCellsExpr(GraftShim.toExpression(v),
      tops, subIds, subVecs, nprobe, expandTops))

  /** Flat argmax over `mat` rows — the closure-held twin of the literal
    * `array_max(cellScoresBound(...)).getField("cell")`.
    */
  def bestFlat(v: Column, mat: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(
      probed(v, mat, Array.empty, Array.empty, 1, 1), 1)
}
