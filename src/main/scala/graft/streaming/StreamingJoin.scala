package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the attribution/enrichment
  * primitive (click ↔ impression, error ↔ deploy, doc ↔ annotation): match
  * rows of two streams on a key when the right event falls inside a time
  * interval anchored at the left event.
  *
  * The SAME code path serves batch frames (plain join, the range condition
  * is a post-filter on the key-equi join — per-key groups bound the
  * quadratic) and streaming frames: with `watermark` set, both sides carry
  * event-time watermarks and the range condition gives Spark the state-bound
  * proof it needs to EVICT buffered rows (left rows age out `upperSec` past
  * the watermark, right rows `-lowerSec`) — without it a stream-stream inner
  * join buffers forever. That watermark-bounded state is the whole 100-TB
  * story here; the join itself is the engine's stock stream-stream hash
  * join, which is exactly what we want.
  */
object StreamingJoin {

  /** Inner interval join: l.key = r.key AND r.ts ∈ [l.ts + lowerSec,
    * l.ts + upperSec]. Column names must be disjoint across the two frames
    * except for `keyCol` (project/rename before calling); output carries
    * left columns then right columns minus its key.
    *
    * @param watermark e.g. Some("10 minutes") — REQUIRED for unbounded
    *                  streaming inputs, ignored semantically for batch
    *                  (batch `withWatermark` is a no-op).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   lowerSec: Long, upperSec: Long,
                   watermark: Option[String] = None): DataFrame = {
    require(lowerSec <= upperSec, s"empty interval [$lowerSec, $upperSec]")
    val l = watermark.map(w => left.withWatermark(leftTs, w)).getOrElse(left).alias("l")
    val r = watermark.map(w => right.withWatermark(rightTs, w)).getOrElse(right).alias("r")
    val cond = col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") + expr(s"INTERVAL $lowerSec SECONDS") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperSec SECONDS")
    val rightCols = right.columns.filterNot(_ == keyCol)
    l.join(r, cond)
      .select(left.columns.map(c => col(s"l.$c")) ++ rightCols.map(c => col(s"r.$c")): _*)
  }
}
