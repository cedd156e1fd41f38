package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skyline / Pareto-frontier selection: keep every row NOT DOMINATED by
  * another row — r dominates s when r is at-least-as-good on EVERY
  * criterion and strictly better on at least one. The multi-criteria
  * curation filter ("keep documents no other document beats on all of
  * quality, length and freshness at once") that a single weighted score
  * can't express without committing to weights.
  *
  * Distributed two-phase shape (the classic partition-skyline scheme):
  *
  *  1. each partition computes its LOCAL skyline imperatively (one of the
  *     few genuinely per-partition-imperative ops — `mapPartitions` is the
  *     right tier): a row dominated by any partition-local row can never be
  *     in the global skyline, so phase 1 is a pure, lossless filter;
  *  2. the surviving candidates (union of local skylines — small for
  *     correlated criteria) go through one global dominance anti-join.
  *
  * The global join is quadratic in CANDIDATES, not rows — and phase 1 is
  * exactly what bounds candidates. Equal-on-all-criteria rows do not
  * dominate each other (no strict part) and are all kept. Criteria are
  * integer-valued (quantize continuous scores to fixed-point first — the
  * repo-wide discipline, which also makes the oracle NOT EXISTS replay
  * exact); NULL in any criterion drops the row (triage).
  */
object Pareto {

  /** @param dims (column, maximize?) per criterion — minimize flips sign */
  def skyline(df: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    require(dims.nonEmpty, "need at least one criterion")
    val k = dims.length
    val skCols = dims.zipWithIndex.map { case ((c, maxDir), i) =>
      (if (maxDir) col(c).cast(LongType) else -col(c).cast(LongType)).as(s"__sk_$i")
    }
    val base = df.select(col("*") +: skCols: _*)
      .where(dims.indices.map(i => col(s"__sk_$i").isNotNull).reduce(_ && _))
    val schema = base.schema
    val width = schema.length
    val firstSk = width - k
    // phase 1: local skyline per partition — O(rows · |local skyline|)
    val candidates = base.mapPartitions { it =>
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Row)]
      it.foreach { row =>
        val v = Array.tabulate(k)(i => row.getLong(firstSk + i))
        def dom(a: Array[Long], b: Array[Long]): Boolean = {
          var ge = true; var gt = false; var i = 0
          while (i < k && ge) {
            if (a(i) < b(i)) ge = false else if (a(i) > b(i)) gt = true
            i += 1
          }
          ge && gt
        }
        if (!kept.exists(kv => dom(kv._1, v))) {
          val survivors = kept.filterNot(kv => dom(v, kv._1))
          survivors += ((v, row))
          kept.clear()
          kept ++= survivors
        }
      }
      kept.iterator.map(_._2)
    }(Encoders.row(schema))
    // phase 2: global dominance anti-join over the candidate union
    val l = candidates.as("l")
    val r = candidates.as("r")
    val allGe = dims.indices.map(i =>
      col(s"r.__sk_$i") >= col(s"l.__sk_$i")).reduce(_ && _)
    val anyGt = dims.indices.map(i =>
      col(s"r.__sk_$i") > col(s"l.__sk_$i")).reduce(_ || _)
    l.join(r, allGe && anyGt, "left_anti")
      .drop(dims.indices.map(i => s"__sk_$i"): _*)
  }
}
