package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** State-size telemetry for the stateful streaming operators — the
  * observability piece of running them against an unbounded corpus: the
  * parity specs prove the operators CORRECT, this records how much state
  * they hold per trigger so a production stream's memory trajectory is a
  * measured curve, not a hope.
  *
  * Two complementary surfaces:
  *
  *  - [[Recorder]] (a [[StreamingQueryListener]]): LIVE per-trigger rows
  *    (query, run_id, batch_id, operator, metric, value) for every stateful
  *    operator in every query on the session — state row count,
  *    updated/removed rows, and state memory bytes straight from Spark's
  *    progress accounting. [[Recorder.frame]] renders the buffer as a
  *    monitor-shaped DataFrame to union into the existing monitor sink
  *    (the `graft.Main stream` parquet verdicts dir), so state growth rides
  *    the same feed the drift/quality monitors already use.
  *  - [[stateRows]] / [[semanticStoreDepth]]: OFFLINE decode of a stopped
  *    (or running) query's checkpoint through Spark's state data source —
  *    the per-KEY depth the live counters can't give (a
  *    flatMapGroupsWithState query holds ONE state row per group, so
  *    row-count telemetry alone hides a representative list growing inside
  *    one hot cell; reading the store back exposes reps-per-cell exactly).
  *
  * Driver cost: the listener buffers a handful of longs per trigger
  * (bounded by `maxRows`, oldest dropped first — a long-lived monitor can't
  * grow without bound); the state read is a normal batch scan of the
  * checkpoint.
  */
object StreamingTelemetry {

  final case class StateMetric(query: String, run_id: String, batch_id: Long,
                               operator: String, metric: String, value: Long)

  /** Per-trigger state metrics for every stateful operator on the session.
    * Attach with [[attach]], read [[snapshot]]/[[frame]], detach with
    * [[detach]].
    */
  final class Recorder(maxRows: Int = 65536) extends StreamingQueryListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[StateMetric]()
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      p.stateOperators.zipWithIndex.foreach { case (so, i) =>
        val op = Option(so.operatorName).filter(_.nonEmpty).getOrElse(s"op$i")
        def add(metric: String, value: Long): Unit = {
          buf.add(StateMetric(Option(p.name).getOrElse(""), p.runId.toString,
            p.batchId, op, metric, value))
          // bounded buffer: drop oldest once past the cap
          if (n.incrementAndGet() > maxRows) { buf.poll(); n.decrementAndGet() }
        }
        add("state_rows_total", so.numRowsTotal)
        add("state_rows_updated", so.numRowsUpdated)
        add("state_rows_removed", so.numRowsRemoved)
        add("state_memory_bytes", so.memoryUsedBytes)
      }
    }

    def snapshot: Seq[StateMetric] = {
      val out = Seq.newBuilder[StateMetric]
      buf.forEach(m => out += m)
      out.result()
    }

    /** The buffer as a DataFrame — union it into the monitor sink. */
    def frame(spark: SparkSession): DataFrame = {
      import spark.implicits._
      spark.createDataset(snapshot).toDF()
    }
  }

  def attach(spark: SparkSession, maxRows: Int = 65536): Recorder = {
    val r = new Recorder(maxRows)
    spark.streams.addListener(r)
    r
  }

  def detach(spark: SparkSession, r: Recorder): Unit =
    spark.streams.removeListener(r)

  /** Raw state rows of a stateful query's checkpoint (Spark's state data
    * source) — the generic per-key surface; schema is (key, value,
    * partition_id) with operator-specific structs.
    */
  def stateRows(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore").load(checkpoint)

  /** Per-cell representative depth of a
    * [[StreamingDedup.semanticFirstSeenStream]] checkpoint: (cell, n_reps)
    * — the exact "is one hot cell's store growing" answer the live
    * row-count telemetry can't give (state is one row per cell regardless
    * of list depth).
    */
  def semanticStoreDepth(spark: SparkSession, checkpoint: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val s = stateRows(spark, checkpoint)
    val keyField = s.schema("key").dataType
      .asInstanceOf[StructType].fieldNames.head
    // the state value nests per Spark's internal wrapping (e.g.
    // value.groupState.reps) — walk first fields down to the list
    @scala.annotation.tailrec
    def firstArrayPath(dt: org.apache.spark.sql.types.DataType, prefix: String): String =
      dt match {
        case st: StructType =>
          val f = st.fields.head
          f.dataType match {
            case _: ArrayType => s"$prefix.${f.name}"
            case other => firstArrayPath(other, s"$prefix.${f.name}")
          }
        case _ => prefix
      }
    val repsPath = firstArrayPath(s.schema("value").dataType, "value")
    s.select(col(s"key.$keyField").cast("int").as("cell"),
      size(col(repsPath)).cast("long").as("n_reps"))
  }
}
