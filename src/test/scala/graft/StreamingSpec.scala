package graft

import graft.ops.Windows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  test("tumbling window aggregation over a memory stream matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")

    val agg = Windows.tumblingStream(df, "ts", "event_type", "value", "1 hour", "10 minutes")
    val query = agg.writeStream
      .format("memory")
      .queryName("win_test")
      .outputMode("complete")
      .start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    stream.addData(
      (ts(0, 5), "click", 1.0),
      (ts(0, 25), "click", 2.0),
      (ts(0, 45), "view", 5.0),
      (ts(1, 10), "click", 4.0))
    query.processAllAvailable()

    val rows = spark.table("win_test")
      .select(col("window_start").cast("string"), col("event_type"), col("n_events"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    query.stop()

    assert(rows == Set(
      ("2024-01-01 00:00:00", "click", 2L, 3.0),
      ("2024-01-01 00:00:00", "view", 1L, 5.0),
      ("2024-01-01 01:00:00", "click", 1L, 4.0)))

    // batch operator over the same rows gives identical windows
    val batch = Seq(
      (ts(0, 5), "click", 1.0), (ts(0, 25), "click", 2.0),
      (ts(0, 45), "view", 5.0), (ts(1, 10), "click", 4.0)
    ).toDF("ts", "event_type", "value")
    val b = Windows.tumbling(batch, "ts", "event_type", "value", "1 hour")
      .select(col("window_start").cast("string"), col("event_type"), col("n_events"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(b == rows)
  }
}
