package graft.scan

import graft.api.{Measurement, ScanResult}

/** Scan-to-scan drift: compares two ScanResults (e.g. yesterday's and
  * today's run over the same table — anchored by `ScanResult.time`) and
  * reports per-(metric, column) deltas. This is the cross-run monitoring
  * loop the reference delegates to Soda Cloud, done locally.
  */
object Drift {

  final case class DriftRow(metric: String, columnName: Option[String],
                            before: Option[Double], after: Option[Double],
                            delta: Option[Double], relative: Option[Double],
                            status: String)

  private def numeric(m: Measurement): Option[Double] = m.value.flatMap {
    case n: java.lang.Number => Some(n.doubleValue())
    case _ => None
  }

  /** @param relThreshold |relative change| above which a row is `drifted`
    *        (metrics present on only one side are `added` / `removed`)
    */
  def compare(before: ScanResult, after: ScanResult,
              relThreshold: Double = 0.1): Seq[DriftRow] = {
    val b = before.measurements.flatMap(m => numeric(m).map((m.metric, m.columnName) -> _)).toMap
    val a = after.measurements.flatMap(m => numeric(m).map((m.metric, m.columnName) -> _)).toMap
    val keys = (b.keySet ++ a.keySet).toSeq.sortBy(k => (k._2.getOrElse(""), k._1))
    keys.map { case k @ (metric, col) =>
      (b.get(k), a.get(k)) match {
        case (Some(x), Some(y)) =>
          val delta = y - x
          val rel = if (x != 0.0) Some(delta / x) else if (delta == 0.0) Some(0.0) else None
          val drifted = rel.map(r => math.abs(r) > relThreshold).getOrElse(delta != 0.0)
          DriftRow(metric, col, Some(x), Some(y), Some(delta), rel,
            if (drifted) "drifted" else "stable")
        case (Some(x), None) => DriftRow(metric, col, Some(x), None, None, None, "removed")
        case (None, Some(y)) => DriftRow(metric, col, None, Some(y), None, None, "added")
        case _ => DriftRow(metric, col, None, None, None, None, "stable")
      }
    }
  }

  /** Only the rows that need attention. */
  def driftedOnly(before: ScanResult, after: ScanResult,
                  relThreshold: Double = 0.1): Seq[DriftRow] =
    compare(before, after, relThreshold).filterNot(_.status == "stable")
}
