package graft

import graft.ops.Windows
import graft.streaming.StreamingJoin
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

  test("streaming OHLC bars match the batch operator under cross-batch arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "k", "v")
    val agg = Windows.ohlcBarsStream(df, "k", "ts", "v",
      windowSeconds = 3600, watermark = "10 minutes")
    val query = agg.writeStream.format("memory").queryName("ohlc_stream")
      .outputMode("complete").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(0, 0), "a", 5.0), (ts(0, 0), "a", 3.0), // tied open tick
      (ts(0, 30), "a", 9.0),
      (ts(0, 59), "a", 7.0), (ts(0, 59), "a", 8.0), // tied close tick
      (ts(1, 10), "a", 1.0), (ts(0, 20), "b", 2.0))
    // split across two batches, later-window data first — the partial
    // aggregates must still converge to the batch bars
    stream.addData(rows.drop(4))
    query.processAllAvailable()
    stream.addData(rows.take(4))
    query.processAllAvailable()

    def shape(d: org.apache.spark.sql.DataFrame) = d
      .select(col("key"), col("window_start").cast("string"), col("open"),
        col("high"), col("low"), col("close"), col("n_ticks"),
        col("sum_fx"), col("mean"))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toSet
    val streamed = shape(spark.table("ohlc_stream"))
    query.stop()
    val batch = shape(Windows.ohlcBars(rows.toDF("ts", "k", "v"),
      "k", "ts", "v", windowSeconds = 3600))
    assert(streamed == batch)
    // the tied-tick discipline survived the streaming partial aggregates
    val w0 = streamed.find(r => r._1 == "a" && r._2.startsWith("2024-01-01 00")).get
    assert(w0._3 == 300L && w0._6 == 800L)
  }

  test("vwapBarsStream: streamed VWAP bars are bit-equal to the batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, String, Double, Long)]
    val df = stream.toDF().toDF("ts", "k", "v", "w")
    val agg = Windows.vwapBarsStream(df, "k", "ts", "v", "w",
      windowSeconds = 3600, watermark = "10 minutes")
    val query = agg.writeStream.format("memory").queryName("vwap_stream")
      .outputMode("complete").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(0, 0), "a", 1.0, 1L), (ts(0, 30), "a", 2.0, 3L),
      (ts(1, 10), "a", 5.0, 2L),
      (ts(0, 20), "b", 4.0, 0L)) // zero-volume window → null vwap
    stream.addData(rows.drop(2))
    query.processAllAvailable()
    stream.addData(rows.take(2))
    query.processAllAvailable()

    def shape(d: org.apache.spark.sql.DataFrame) = d
      .select(col("key"), col("window_start").cast("string"), col("n_ticks"),
        col("sum_pv"), col("sum_vol"), col("vwap"))
      .as[(String, String, Long, Long, Long, Option[Double])]
      .collect().toSet
    val streamed = shape(spark.table("vwap_stream"))
    query.stop()
    val batch = shape(Windows.vwapBars(rows.toDF("ts", "k", "v", "w"),
      "k", "ts", "v", "w", windowSeconds = 3600))
    assert(streamed == batch)
    val w0 = streamed.find(r => r._1 == "a" && r._2.startsWith("2024-01-01 00")).get
    assert(w0._4 == 700L && w0._5 == 4L && w0._6.contains(1.75))
    assert(streamed.find(_._1 == "b").get._6.isEmpty)
  }

  test("stream-stream interval join matches the batch join under cross-batch arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int, s: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    // clicks attribute to views at most 60s BEFORE them, same user
    val clicks = Seq((101L, ts(5, 0), 1L), (102L, ts(10, 0), 1L), (103L, ts(5, 30), 2L))
    val views = Seq((201L, ts(4, 30), 1L), (202L, ts(9, 30), 1L),
      (203L, ts(4, 0), 2L), (204L, ts(5, 30), 2L), (205L, ts(3, 0), 9L))

    val ls = MemoryStream[(Long, Timestamp, Long)]
    val rs = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingJoin.intervalJoin(
      ls.toDF().toDF("click_id", "click_ts", "user_id"),
      rs.toDF().toDF("view_id", "view_ts", "user_id"),
      "user_id", "click_ts", "view_ts", lowerSec = -60, upperSec = 0,
      watermark = Some("10 minutes"))
    val query = joined.writeStream.format("memory")
      .queryName("sj_test").outputMode("append").start()
    // matching rows arrive in DIFFERENT batches, views first
    ls.addData(clicks.take(1)); rs.addData(views.take(2))
    query.processAllAvailable()
    ls.addData(clicks.drop(1)); rs.addData(views.drop(2))
    query.processAllAvailable()
    val got = spark.table("sj_test")
      .select("click_id", "view_id").as[(Long, Long)].collect().toSet
    query.stop()

    val expect = (for {
      (cid, cts, cu) <- clicks
      (vid, vts, vu) <- views
      if cu == vu && !vts.before(new Timestamp(cts.getTime - 60000)) && !vts.after(cts)
    } yield (cid, vid)).toSet
    assert(expect == Set((101L, 201L), (102L, 202L), (103L, 204L)))
    assert(got == expect)

    // the SAME operator over batch frames returns the identical pairs
    val b = StreamingJoin.intervalJoin(
      clicks.toDF("click_id", "click_ts", "user_id"),
      views.toDF("view_id", "view_ts", "user_id"),
      "user_id", "click_ts", "view_ts", -60, 0)
      .select("click_id", "view_id").as[(Long, Long)].collect().toSet
    assert(b == expect)
  }

  test("streaming quality monitor matches the batch monitor") {
    import spark.implicits._
    import graft.api.ColumnConfig
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(0, 5), "click", 10.0), (ts(0, 25), "bogus", 20.0),
      (ts(0, 45), "view", 500.0), (ts(1, 10), "click", 4.0))
    val cols = Seq(
      "value" -> ColumnConfig(validMax = Some(100.0)),
      "event_type" -> ColumnConfig(validValues = Seq("click", "view")))

    val stream = MemoryStream[(Timestamp, String, Double)]
    val q = StreamingMonitor.qualityStream(
        stream.toDF().toDF("ts", "event_type", "value"), "ts", "10 minutes", "1 hour", cols)
      .writeStream.format("memory").queryName("quality_test").outputMode("complete").start()
    stream.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("quality_test")
      .select(col("window_start").cast("string"), col("row_count"),
        col("value_invalid"), col("event_type_invalid"))
      .as[(String, Long, Long, Long)].collect().toSet
    q.stop()

    val batch = StreamingMonitor.qualityByWindow(
        rows.toDF("ts", "event_type", "value"), "ts", "1 hour", cols)
      .select(col("window_start").cast("string"), col("row_count"),
        col("value_invalid"), col("event_type_invalid"))
      .as[(String, Long, Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch.contains(("2024-01-01 00:00:00", 3L, 1L, 1L)))
  }

  test("kafka-shaped file log source: replayable segments drive the quality monitor end-to-end") {
    import spark.implicits._
    import graft.api.ColumnConfig
    import graft.streaming.{StreamLog, StreamingMonitor}
    import org.apache.spark.sql.types._

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def payload(et: String, v: Double) = s"""{"event_type":"$et","value":$v}"""
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toString
    try {
      // two "producer" segment appends = two replayable log segments
      StreamLog.appendSegment(spark, dir, Seq(
        ("u1", payload("click", 10.0), "events", 0, 0L, ts(0, 5)),
        ("u2", payload("bogus", 20.0), "events", 0, 1L, ts(0, 25))))
      StreamLog.appendSegment(spark, dir, Seq(
        ("u3", payload("view", 500.0), "events", 0, 2L, ts(0, 45)),
        ("u1", payload("click", 4.0), "events", 0, 3L, ts(1, 10))))

      val source = StreamLog.FileLogSource(dir, maxFilesPerTrigger = Some(1))
      val payloadSchema = StructType(Seq(
        StructField("event_type", StringType), StructField("value", DoubleType)))
      val cols = Seq(
        "value" -> ColumnConfig(validMax = Some(100.0)),
        "event_type" -> ColumnConfig(validValues = Seq("click", "view")))

      // the SAME operator code as the MemoryStream test, now fed from the
      // kafka-shaped envelope: parse payload, monitor quality per window
      val q = StreamingMonitor.qualityStream(
          StreamLog.parsed(source.stream(spark), payloadSchema),
          "timestamp", "10 minutes", "1 hour", cols)
        .writeStream.format("memory").queryName("log_quality").outputMode("complete").start()
      q.processAllAvailable()
      val streamed = spark.table("log_quality")
        .select(col("window_start").cast("string"), col("row_count"),
          col("value_invalid"), col("event_type_invalid"))
        .as[(String, Long, Long, Long)].collect().toSet
      q.stop()

      assert(streamed == Set(
        ("2024-01-01 00:00:00", 3L, 1L, 1L),
        ("2024-01-01 01:00:00", 1L, 0L, 0L)))

      // batch view of the same log gives identical results (backfill parity)
      val batch = StreamingMonitor.qualityByWindow(
          StreamLog.parsed(source.batch(spark), payloadSchema),
          "timestamp", "1 hour", cols)
        .select(col("window_start").cast("string"), col("row_count"),
          col("value_invalid"), col("event_type_invalid"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(batch == streamed)

      // rate-source adapter emits the same envelope columns
      assert(StreamLog.RateLogSource(10).batch(spark).columns.toSeq ==
        StreamLog.envelopeSchema.fieldNames.toSeq)

      // a payload field named like an envelope column SHADOWS it (no
      // ambiguous duplicate column)
      val clashSchema = StructType(Seq(
        StructField("timestamp", StringType), StructField("value", DoubleType)))
      val clashed = StreamLog.parsed(source.batch(spark), clashSchema)
      assert(clashed.columns.count(_ == "timestamp") == 1)
      assert(clashed.columns.toSeq == Seq("key", "offset", "timestamp", "value"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("windowed distinct-cardinality sketch: exact under k, partitioning-invariant") {
    import spark.implicits._
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // window 0: keys u0..u9 with repeats (10 distinct); window 1: u0..u2
    val events = (0 until 30).map(i => (ts(0, i % 50), s"u${i % 10}")) ++
      (0 until 6).map(i => (ts(1, i), s"u${i % 3}"))

    val stream = MemoryStream[(Timestamp, String)]
    val q = StreamingMonitor.distinctSketchStream(
        stream.toDF().toDF("ts", "user"), "ts", "10 minutes", "1 hour", "user", 64)
      .writeStream.format("memory").queryName("sketch_test").outputMode("complete").start()
    stream.addData(events: _*)
    q.processAllAvailable()
    val rows = spark.table("sketch_test")
      .select(col("window_start").cast("string"), col("distinct_estimate"))
      .as[(String, Double)].collect().toMap
    q.stop()

    // not-full sketches (k=64 > cardinality) estimate EXACTLY
    assert(rows == Map(
      "2024-01-01 00:00:00" -> 10.0,
      "2024-01-01 01:00:00" -> 3.0))

    // batch equivalent over the same rows gives identical sketches
    val batch = StreamingMonitor.distinctSketchStream(
        events.toDF("ts", "user"), "ts", "10 minutes", "1 hour", "user", 64)
      .select(col("window_start").cast("string"), col("distinct_estimate"))
      .as[(String, Double)].collect().toMap
    assert(batch == rows)
  }

  test("windowed quantile sketch: streaming equals batch, exact when not full") {
    import spark.implicits._
    import graft.ops.Shingles
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // window 0: values 0..28 step 2 (15 rows); window 1: 100, 200, 300
    val events = (0 until 15).map(i => (ts(0, i), i.toLong, (i * 2).toDouble)) ++
      Seq((ts(1, 0), 100L, 100.0), (ts(1, 1), 101L, 200.0), (ts(1, 2), 102L, 300.0))

    def monitor(df: org.apache.spark.sql.DataFrame) =
      StreamingMonitor.quantileSketchStream(df, "ts", "10 minutes", "1 hour",
        Shingles.md5Hash60(col("id").cast("string")), col("v"), 64)

    val stream = MemoryStream[(Timestamp, Long, Double)]
    val q = monitor(stream.toDF().toDF("ts", "id", "v"))
      .writeStream.format("memory").queryName("qsk_test").outputMode("complete").start()
    stream.addData(events.take(9): _*)
    q.processAllAvailable()
    stream.addData(events.drop(9): _*) // sketch state must merge across batches
    q.processAllAvailable()
    val rows = spark.table("qsk_test")
      .select(col("window_start").cast("string"), col("n_sample"),
        col("p25"), col("p50"), col("p75"))
      .as[(String, Int, Double, Double, Double)].collect().toSet
    q.stop()

    // k=64 > rows per window -> the sample is the full window, quantiles
    // are exact nearest-rank values
    assert(rows == Set(
      ("2024-01-01 00:00:00", 15, 6.0, 14.0, 20.0),
      ("2024-01-01 01:00:00", 3, 100.0, 200.0, 200.0)))

    // batch twin over the same rows: identical sketches
    val batch = monitor(events.toDF("ts", "id", "v"))
      .select(col("window_start").cast("string"), col("n_sample"),
        col("p25"), col("p50"), col("p75"))
      .as[(String, Int, Double, Double, Double)].collect().toSet
    assert(batch == rows)
  }

  test("windowed heavy hitters: streaming equals batch, exact under k distinct") {
    import spark.implicits._
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // window 0: a=5, b=3, c=1; window 1: a=1, d=2 (k=8 > distinct -> exact)
    val events = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).zipWithIndex
      .map { case (s, i) => (ts(0, i), s) } ++
      Seq((ts(1, 0), "a"), (ts(1, 1), "d"), (ts(1, 2), "d"))

    def monitor(df: org.apache.spark.sql.DataFrame) =
      StreamingMonitor.heavyHittersStream(df, "ts", "10 minutes", "1 hour", "item", 8)

    val stream = MemoryStream[(Timestamp, String)]
    val q = monitor(stream.toDF().toDF("ts", "item"))
      .writeStream.format("memory").queryName("hh_test").outputMode("complete").start()
    stream.addData(events.take(6): _*)
    q.processAllAvailable()
    stream.addData(events.drop(6): _*) // MG state must merge across batches
    q.processAllAvailable()
    val rows = spark.table("hh_test")
      .select(col("window_start").cast("string"), col("item"), col("cnt"))
      .as[(String, String, Long)].collect().toSet
    q.stop()

    assert(rows == Set(
      ("2024-01-01 00:00:00", "a", 5L), ("2024-01-01 00:00:00", "b", 3L),
      ("2024-01-01 00:00:00", "c", 1L),
      ("2024-01-01 01:00:00", "a", 1L), ("2024-01-01 01:00:00", "d", 2L)))

    val batch = monitor(events.toDF("ts", "item"))
      .select(col("window_start").cast("string"), col("item"), col("cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(batch == rows)
  }

  test("windowed Count-Min table: streaming equals batch, cells bounded by geometry") {
    import spark.implicits._
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: skewed keys; hour 1: a different mix
    val events = (0 until 40).map(i => (ts(0, i % 50), s"k${i % 5}")) ++
      (0 until 12).map(i => (ts(1, i), s"k${i % 3}"))
    def hash = graft.ops.Shingles.md5Hash60(col("k"))

    val stream = MemoryStream[(Timestamp, String)]
    val q = StreamingMonitor.cmsTableStream(
        stream.toDF().toDF("ts", "k"), "ts", "10 minutes", "1 hour", hash, 4, 16)
      .writeStream.format("memory").queryName("cms_test").outputMode("complete").start()
    stream.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.table("cms_test")
      .select(col("window_start").cast("string"), col("row"), col("pos"), col("cnt"))
      .as[(String, Int, Long, Long)].collect().toSet
    q.stop()

    val batch = StreamingMonitor.cmsTableStream(
        events.toDF("ts", "k"), "ts", "10 minutes", "1 hour", hash, 4, 16)
      .select(col("window_start").cast("string"), col("row"), col("pos"), col("cnt"))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(streamed == batch)
    // each window's row-0 counters sum to that window's event count
    val mass = streamed.toSeq.filter(r => r._2 == 0).groupBy(_._1)
      .map { case (w, rs) => w -> rs.map(_._4).sum }
    assert(mass == Map("2024-01-01 00:00:00" -> 40L, "2024-01-01 01:00:00" -> 12L))
    assert(streamed.size <= 2 * 4 * 16)
  }

  test("streaming first-seen dedup: duplicates suppressed, TTL re-admits") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")
    val dedup = StreamingDedup.firstSeenStream(spark, df, "ts", "doc_id", "text",
      ttlSeconds = 3600, watermark = "0 seconds")
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()

    stream.addData((ts(0, 0), 1L, "alpha doc"), (ts(0, 1), 2L, "alpha doc"), (ts(0, 2), 3L, "beta doc"))
    q.processAllAvailable()
    stream.addData((ts(0, 30), 4L, "alpha doc")) // dup within TTL -> suppressed
    q.processAllAvailable()
    stream.addData((ts(3, 0), 5L, "gamma doc")) // advances watermark past TTL
    q.processAllAvailable()
    stream.addData((ts(3, 10), 6L, "alpha doc")) // re-admitted after TTL
    q.processAllAvailable()

    val ids = spark.table("dedup_test").select("id").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 3L, 5L, 6L))
  }

  test("streaming image dedup: visually-identical re-crawls suppressed, junk passes") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def bmp(seed: Int): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val W = 16; val H = 16; val row = (W * 3 + 3) / 4 * 4
      val bb = ByteBuffer.allocate(54 + row * H).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes); bb.putInt(54 + row * H); bb.putInt(0); bb.putInt(54)
      bb.putInt(40); bb.putInt(W); bb.putInt(H); bb.putShort(1); bb.putShort(24)
      bb.putInt(0); bb.putInt(row * H); bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
      for (y <- 0 until H) {
        for (x <- 0 until W) {
          val v = ((x * seed + y * 7) % 256).toByte; bb.put(v); bb.put(v); bb.put(v)
        }
        bb.put(new Array[Byte](row - W * 3))
      }
      bb.array()
    }
    val stream = MemoryStream[(Timestamp, Long, Array[Byte])]
    val df = stream.toDF().toDF("ts", "id", "media")
    val q = StreamingDedup.imageFirstSeenStream(spark, df, "ts", "id", "media",
        ttlSeconds = 86400, watermark = "0 seconds")
      .writeStream.format("memory").queryName("img_dedup").outputMode("append").start()

    stream.addData((ts(0), 1L, bmp(11)), (ts(1), 2L, bmp(29)))
    q.processAllAvailable()
    // re-crawl of image 11 (same pixels, new id) -> suppressed; junk
    // payloads are NOT suppressed against each other (unique sentinels)
    stream.addData((ts(2), 3L, bmp(11)), (ts(3), 4L, "junk".getBytes),
      (ts(4), 5L, "junk".getBytes))
    q.processAllAvailable()

    val ids = spark.table("img_dedup").select("id").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 2L, 4L, 5L), s"$ids")
  }

  test("streaming video dedup: transcoded re-ingest suppressed, frame order distinguishes, junk passes") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    import graft.ops.Multimodal.{Codecs, Video}
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def frame(seed: Int) = Codecs.grayBmp(16, 16, (x, y) => (x * seed + y * 7) % 256)
    // PNG re-encode of the same pixels (grayscale, filter 0) — dHash must
    // match the BMP frame bit-for-bit
    def framePng(seed: Int): Array[Byte] = {
      import java.io.ByteArrayOutputStream
      import java.nio.ByteBuffer
      import java.util.zip.{CRC32, Deflater}
      val W = 16; val H = 16
      val raw = new Array[Byte](H * (1 + W))
      for (y <- 0 until H; x <- 0 until W) raw(y * (1 + W) + 1 + x) = ((x * seed + y * 7) % 256).toByte
      val defl = new Deflater(); defl.setInput(raw); defl.finish()
      val comp = new ByteArrayOutputStream(); val buf = new Array[Byte](256)
      while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
      def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
        val bb = ByteBuffer.allocate(12 + body.length)
        bb.putInt(body.length); bb.put(tag.getBytes); bb.put(body)
        val crc = new CRC32(); crc.update(tag.getBytes); crc.update(body)
        bb.putInt(crc.getValue.toInt); bb.array()
      }
      val ihdr = ByteBuffer.allocate(13)
      ihdr.putInt(W); ihdr.putInt(H); ihdr.put(8.toByte); ihdr.put(0.toByte)
      ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
        chunk("IHDR", ihdr.array()) ++ chunk("IDAT", comp.toByteArray) ++
        chunk("IEND", Array.empty)
    }
    val vidA = Video.pack(Seq(frame(11), frame(29), frame(43)))
    val vidATranscoded = Video.pack(Seq(framePng(11), framePng(29), framePng(43)))
    val vidReordered = Video.pack(Seq(frame(29), frame(11), frame(43)))
    val vidB = Video.pack(Seq(frame(5), frame(61)))

    val stream = MemoryStream[(Timestamp, Long, Array[Byte])]
    val df = stream.toDF().toDF("ts", "id", "media")
    val q = StreamingDedup.videoFirstSeenStream(spark, df, "ts", "id", "media",
        ttlSeconds = 86400, watermark = "0 seconds")
      .writeStream.format("memory").queryName("vid_dedup").outputMode("append").start()

    stream.addData((ts(0), 1L, vidA), (ts(1), 2L, vidB))
    q.processAllAvailable()
    // per-frame PNG transcode + container re-pack of A -> suppressed;
    // the SAME frames in a different order are a different video; corrupt
    // containers pass via unique sentinels
    stream.addData((ts(2), 3L, vidATranscoded), (ts(3), 4L, vidReordered),
      (ts(4), 5L, "junk".getBytes), (ts(5), 6L, "junk".getBytes))
    q.processAllAvailable()

    val ids = spark.table("vid_dedup").select("id").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 2L, 4L, 5L, 6L), s"$ids")
  }

  test("streaming audio dedup: volume-normalized re-ingest suppressed") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def wav(samples: Seq[Int]): Array[Byte] = {
      import java.nio.{ByteBuffer, ByteOrder}
      val bb = ByteBuffer.allocate(44 + 2 * samples.size).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 2 * samples.size); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
      bb.putInt(16000); bb.putInt(32000); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(2 * samples.size)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    val clip = (0 until 650).map(i => (math.sin(i / 7.0) * (300 + i % 400)).toInt)
    val other = (0 until 650).map(i => (math.cos(i / 3.0) * (900 - i % 500)).toInt)

    val stream = MemoryStream[(Timestamp, Long, Array[Byte])]
    val df = stream.toDF().toDF("ts", "id", "media")
    val q = StreamingDedup.audioFirstSeenStream(spark, df, "ts", "id", "media",
        ttlSeconds = 86400, watermark = "0 seconds")
      .writeStream.format("memory").queryName("aud_dedup").outputMode("append").start()

    stream.addData((ts(0), 1L, wav(clip)), (ts(1), 2L, wav(other)))
    q.processAllAvailable()
    // half-volume re-ingest of the clip: SAME gain-invariant contour ->
    // suppressed; junk passes via a unique sentinel
    stream.addData((ts(2), 3L, wav(clip.map(_ / 2))), (ts(3), 4L, "junk".getBytes))
    q.processAllAvailable()

    val ids = spark.table("aud_dedup").select("id").as[Long].collect().toSet
    q.stop()
    assert(ids == Set(1L, 2L, 4L), s"$ids")
  }

  test("streaming passage dedup: shared passages pass once, chunking matches batch operator") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // 4-token passages; doc 2 repeats doc 1's first passage as boilerplate
    val d1 = "a b c d e f g h"            // passages: "a b c d", "e f g h"
    val d2 = "a b c d x y z w tail"       // "a b c d" (dup), "x y z w", "tail"
    val stream = MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.passageFirstSeenStream(spark, df, "ts", "doc_id", "text",
        passageTokens = 4, ttlSeconds = 86400, watermark = "0 seconds")
      .writeStream.format("memory").queryName("pass_test").outputMode("append").start()

    stream.addData((ts(0, 0), 1L, d1))
    q.processAllAvailable()
    stream.addData((ts(0, 10), 2L, d2))
    q.processAllAvailable()

    val got = spark.table("pass_test").select("doc_id", "idx", "passage")
      .as[(Long, Int, String)].collect().toSet
    q.stop()
    assert(got == Set((1L, 0, "a b c d"), (1L, 1, "e f g h"),
      (2L, 1, "x y z w"), (2L, 2, "tail")))

    // doc 2 reassembled from survivors loses exactly the boilerplate passage
    val clean = got.toSeq.filter(_._1 == 2L).sortBy(_._2).map(_._3).mkString(" ")
    assert(clean == "x y z w tail")
  }

  test("streaming store dedup: matches batch dedupAgainstStore, honors pinned prune set") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    import graft.ops.Dedup
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val store = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six"),
      (102L, "totally different store content here now")
    ).toDF("id", "text")
    val newDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // exact dup of 100
      (2L, "one two three four five seven"),         // near dup of 101
      (3L, "completely novel words nobody stored")   // no match
    )
    // batch reference on identical inputs
    val storeSigs = Dedup.minhashSignatures(store, "id", "text", shingleLen = 1)
      .localCheckpoint(true)
    val newSigs = Dedup.minhashSignatures(newDocs.toDF("id", "text"), "id", "text",
      shingleLen = 1)
    val want = Dedup.dedupAgainstStore(newSigs, storeSigs, threshold = 0.5)
      .select("new_id", "store_id").as[(Long, Long)].collect().toSet
    assert(want.contains((1L, 100L)))

    val stream = MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.storeDedupStream(df, "doc_id", "ts", "text",
        storeSigs, threshold = 0.5, shingleLen = 1)
      .writeStream.format("memory").queryName("store_dedup").outputMode("append").start()
    newDocs.zipWithIndex.foreach { case ((id, txt), i) => stream.addData((ts(i), id, txt)) }
    q.processAllAvailable()
    val got = spark.table("store_dedup").select("new_id", "store_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == want, s"stream $got vs batch $want")

    // pinned prune set consistency: sign store AND stream under one set
    val pruneSet = Seq("alpha", "beta").toDF("t")
      .select(xxhash64(col("t")).as("sh"))
    val storeSigsP = Dedup.minhashSignatures(store, "id", "text", shingleLen = 1,
      pruneSet = Some(pruneSet)).localCheckpoint(true)
    val newSigsP = Dedup.minhashSignatures(newDocs.toDF("id", "text"), "id", "text",
      shingleLen = 1, pruneSet = Some(pruneSet))
    val wantP = Dedup.dedupAgainstStore(newSigsP, storeSigsP, threshold = 0.5)
      .select("new_id", "store_id").as[(Long, Long)].collect().toSet
    val stream2 = MemoryStream[(Timestamp, Long, String)]
    val df2 = stream2.toDF().toDF("ts", "doc_id", "text")
    val q2 = StreamingDedup.storeDedupStream(df2, "doc_id", "ts", "text",
        storeSigsP, threshold = 0.5, shingleLen = 1, pruneSet = Some(pruneSet))
      .writeStream.format("memory").queryName("store_dedup_p").outputMode("append").start()
    newDocs.zipWithIndex.foreach { case ((id, txt), i) => stream2.addData((ts(i), id, txt)) }
    q2.processAllAvailable()
    val gotP = spark.table("store_dedup_p").select("new_id", "store_id")
      .as[(Long, Long)].collect().toSet
    q2.stop()
    assert(gotP == wantP, s"pruned stream $gotP vs batch $wantP")
  }

  test("dropDuplicatesWithinWatermark keeps one row per text hash") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingDedup.dropDuplicatesStream(df, "ts", "text", watermark = "1 hour")
      .writeStream.format("memory").queryName("ddw_test").outputMode("append").start()
    stream.addData((ts(0, 0), 1L, "a"), (ts(0, 5), 2L, "a"), (ts(0, 6), 3L, "b"))
    q.processAllAvailable()
    val ids = spark.table("ddw_test").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(ids.size == 2 && ids.contains(3L) && (ids.contains(1L) || ids.contains(2L)))
  }

  test("transformWithState running quality totals accumulate across batches") {
    import spark.implicits._
    import graft.streaming.RunningQuality
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(String, Option[Double])]
      val df = stream.toDF().toDF("key", "value")
      val q = RunningQuality.totalsStream(spark, df, "key", "value", 0.0, 100.0)
        .writeStream.format("memory").queryName("twstest").outputMode("update").start()

      stream.addData(("a", Some(5.0)), ("a", Some(500.0)), ("b", None))
      q.processAllAvailable()
      stream.addData(("a", Some(7.0)), ("b", Some(-3.0)))
      q.processAllAvailable()

      // update mode: take the LAST emitted totals per key
      val rows = spark.table("twstest").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val last = rows.groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._2) }
      q.stop()

      assert(last("a") == (("a", 3L, 0L, 1L))) // 3 events, 1 invalid (500.0)
      assert(last("b") == (("b", 2L, 1L, 1L))) // 1 missing, 1 invalid (-3.0)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming rolling z-score matches the batch operator across batches") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // user 1: steady then a spike; user 2: too short to warm up
      val rows = (1L to 9L).map(i => (1L, i, 10.0)) ++ Seq((1L, 10L, 10.2), (1L, 11L, 50.0)) ++
        Seq((2L, 1L, 1.0), (2L, 2L, 99.0))
      val batchFlags = graft.ops.Outliers.rollingZScore(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v",
          window = 10, tSquared = 9, minPoints = 5, minDev = 1.0)
        .select(col("user_id").cast("string"), col("seq"), col("is_anomaly"))
        .as[(String, Long, Boolean)].collect().toSet

      val stream = MemoryStream[(Long, Long, Double)]
      val df = stream.toDF().toDF("user_id", "seq", "v")
      val q = StreamingAnomaly.anomalyStream(spark, df, "user_id", "seq", "v",
          window = 10, tSquared = 9, minPoints = 5, minDev = 1.0)
        .writeStream.format("memory").queryName("anom_test").outputMode("append").start()
      // split in seq order across TWO batches: state must carry the ring over
      val (b1, b2) = rows.partition(_._2 <= 6)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("anom_test")
        .as[(String, Long, Boolean)].collect().toSet
      q.stop()
      assert(streamed == batchFlags, "in-order streamed flags must equal batch flags")
      assert(streamed.count(_._3) == 1 && streamed.contains(("1", 11L, true)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("watermark-buffered rolling z-score: batch parity under out-of-order arrival") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      // same shape as the in-order test: steady, blip, spike
      val rows = (1L to 9L).map(i => (1L, i, 10.0)) ++ Seq((1L, 10L, 10.2), (1L, 11L, 50.0))
      val batchFlags = graft.ops.Outliers.rollingZScore(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v",
          window = 10, tSquared = 9, minPoints = 5, minDev = 1.0)
        .select(col("user_id").cast("string"), col("seq"), col("is_anomaly"))
        .as[(String, Long, Boolean)].collect().toSet

      val stream = MemoryStream[(Long, Timestamp, Long, Double)]
      val df = stream.toDF().toDF("user_id", "ts", "seq", "v")
        .withWatermark("ts", "10 seconds")
      val q = StreamingAnomaly.orderedAnomalyStream(spark, df, "user_id", "ts", "seq", "v",
          window = 10, tSquared = 9, minPoints = 5, minDev = 1.0)
        .writeStream.format("memory").queryName("anom_ord").outputMode("append").start()

      // feed SHUFFLED across three batches (disorder crosses batch edges);
      // event time = seq seconds, so order is recoverable only by buffering
      val timed = rows.map { case (u, s, v) => (u, ts(s), s, v) }
      val shuffled = Seq(timed(4), timed(9), timed(0), timed(7)) ++
        Seq(timed(2), timed(10), timed(1), timed(5)) ++
        Seq(timed(8), timed(3), timed(6))
      stream.addData(shuffled.take(4)); q.processAllAvailable()
      stream.addData(shuffled.slice(4, 8)); q.processAllAvailable()
      stream.addData(shuffled.drop(8)); q.processAllAvailable()
      // push the watermark far past every buffered event to flush
      stream.addData((2L, ts(10000), 1L, 0.0)); q.processAllAvailable()
      stream.addData((2L, ts(20000), 2L, 0.0)); q.processAllAvailable()

      val streamed = spark.table("anom_ord")
        .where(col("key") === "1")
        .as[(String, Long, Boolean)].collect().toSet
      q.stop()
      assert(streamed == batchFlags,
        s"out-of-order streamed flags must equal batch flags\n$streamed\nvs\n$batchFlags")
      assert(streamed.count(_._3) == 1 && streamed.contains(("1", 11L, true)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming Page-Hinkley: batch ph/alarm parity under shuffled cross-batch arrival") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      // the batch spec's scenario: stable at 10 then a sustained +20 jump
      val rows = (1 to 12).map(i => (1L, i.toLong, 10.0)) ++
        (13 to 24).map(i => (1L, i.toLong, 30.0))
      val batch = graft.ops.Outliers.pageHinkley(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v",
          delta = 0.0, lambda = 40.0, fxScale = 0)
        .select(col("user_id").cast("string"), col("seq"), col("ph"),
          col("alarm"))
        .as[(String, Long, Double, Boolean)].collect().toSet

      val stream = MemoryStream[(Long, Timestamp, Long, Double)]
      val df = stream.toDF().toDF("user_id", "ts", "seq", "v")
        .withWatermark("ts", "60 seconds")
      val q = StreamingAnomaly.pageHinkleyStream(spark, df, "user_id", "ts",
          "seq", "v", delta = 0.0, lambda = 40.0, fxScale = 0)
        .writeStream.format("memory").queryName("ph_ord")
        .outputMode("append").start()

      val timed = rows.map { case (u, s, v) => (u, ts(s), s, v) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(11)).shuffle(timed)
      stream.addData(shuffled.take(8)); q.processAllAvailable()
      stream.addData(shuffled.slice(8, 16)); q.processAllAvailable()
      stream.addData(shuffled.drop(16)); q.processAllAvailable()
      stream.addData((2L, ts(10000), 1L, 10.0)); q.processAllAvailable()
      stream.addData((2L, ts(20000), 2L, 10.0)); q.processAllAvailable()

      val streamed = spark.table("ph_ord")
        .where(col("key") === "1")
        .select(col("key"), col("seq"),
          (col("ph_fx").cast("double") / lit(1e6 * 1.0)).as("ph"), col("alarm"))
        .as[(String, Long, Double, Boolean)].collect().toSet
      q.stop()
      assert(streamed == batch,
        s"shuffled streamed PH must equal batch\n$streamed\nvs\n$batch")
      // alarms exist and only after the jump
      val alarms = streamed.filter(_._4).map(_._2)
      assert(alarms.nonEmpty && alarms.min > 12L)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming CUSUM: batch level/alarm parity under shuffled cross-batch arrival") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      // the batch spec's scenario: on-target then sustained +3 shift
      val rows = (1 to 10).map(i => (1L, i.toLong, 10.0)) ++
        (11 to 20).map(i => (1L, i.toLong, 13.0))
      val batch = graft.ops.Outliers.cusum(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v",
          target = 10.0, slack = 1.0, threshold = 15.0)
        .select(col("user_id").cast("string"), col("seq"),
          col("s_up"), col("s_dn"), col("alarm_up"), col("alarm_dn"))
        .as[(String, Long, Long, Long, Boolean, Boolean)].collect().toSet

      val stream = MemoryStream[(Long, Timestamp, Long, Double)]
      // 60s lateness covers ANY disorder of the 20s scenario — the random
      // shuffle below may move an early event into the last batch
      val df = stream.toDF().toDF("user_id", "ts", "seq", "v")
        .withWatermark("ts", "60 seconds")
      val q = StreamingAnomaly.cusumStream(spark, df, "user_id", "ts", "seq", "v",
          target = 10.0, slack = 1.0, threshold = 15.0)
        .writeStream.format("memory").queryName("cusum_ord").outputMode("append").start()

      val timed = rows.map { case (u, s, v) => (u, ts(s), s, v) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(5)).shuffle(timed)
      stream.addData(shuffled.take(7)); q.processAllAvailable()
      stream.addData(shuffled.slice(7, 14)); q.processAllAvailable()
      stream.addData(shuffled.drop(14)); q.processAllAvailable()
      // flush: two far-future events push the watermark past everything
      stream.addData((2L, ts(10000), 1L, 10.0)); q.processAllAvailable()
      stream.addData((2L, ts(20000), 2L, 10.0)); q.processAllAvailable()

      val streamed = spark.table("cusum_ord")
        .where(col("key") === "1")
        .as[(String, Long, Long, Long, Boolean, Boolean)].collect().toSet
      q.stop()
      assert(streamed == batch,
        s"shuffled streamed CUSUM must equal batch\n$streamed\nvs\n$batch")
      // alarm onset at seq 18 (8th shifted sample) as in the batch spec
      assert(streamed.exists(t => t._2 == 18L && t._5))
      assert(streamed.forall(t => t._2 < 18L || t._5))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming Holt: last point per key equals the batch fold under disorder") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      val rows = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 0.5), (1L, 4L, 10.0),
        (2L, 1L, 5.0), (3L, 2L, -4.0), (3L, 1L, -1.0))
      val batch = graft.ops.Outliers.holt(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v", 3, 10, 2, 10)
        .select(col("user_id").cast("string"), col("level_fx"), col("trend_fx"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

      val stream = MemoryStream[(Long, Timestamp, Long, Double)]
      val df = stream.toDF().toDF("user_id", "ts", "seq", "v")
        .withWatermark("ts", "60 seconds")
      val q = StreamingAnomaly.holtStream(spark, df, "user_id", "ts", "seq", "v", 3, 10, 2, 10)
        .writeStream.format("memory").queryName("holt_ord").outputMode("append").start()

      val timed = rows.map { case (u, s, v) => (u, ts(s), s, v) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(timed)
      stream.addData(shuffled.take(3)); q.processAllAvailable()
      stream.addData(shuffled.drop(3)); q.processAllAvailable()
      stream.addData((9L, ts(10000), 1L, 0.0)); q.processAllAvailable()
      stream.addData((9L, ts(20000), 2L, 0.0)); q.processAllAvailable()

      val points = spark.table("holt_ord").where(col("key") =!= "9")
        .as[(String, Long, Long, Long)].collect()
      q.stop()
      // the LAST point per key equals the batch final (level, trend)
      val last = points.groupBy(_._1)
        .map { case (k, ps) => val p = ps.maxBy(_._2); k -> ((p._3, p._4)) }
      assert(last == batch, s"$last vs $batch")
      assert(points.length == rows.length)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming Holt-Winters: last point per key equals the batch fold under disorder") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      // a 2-cycle with a shifted second key; period 2, alpha/beta/gamma halves
      val rows = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 10.0), (1L, 4L, 20.0),
        (2L, 1L, 5.0), (2L, 2L, 8.0), (2L, 3L, 4.0))
      val batch = graft.ops.Outliers.holtWinters(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v",
          period = 2, 1, 2, 1, 2, 1, 2)
        .select(col("user_id").cast("string"), col("level_fx"), col("trend_fx"),
          expr("element_at(season_fx, cast(n % 2 as int) + 1)"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val stream = MemoryStream[(Long, Timestamp, Long, Double)]
      val df = stream.toDF().toDF("user_id", "ts", "seq", "v")
        .withWatermark("ts", "60 seconds")
      val q = StreamingAnomaly.holtWintersStream(spark, df, "user_id", "ts",
          "seq", "v", period = 2, 1, 2, 1, 2, 1, 2)
        .writeStream.format("memory").queryName("hw_ord").outputMode("append").start()

      val timed = rows.map { case (u, s, v) => (u, ts(s), s, v) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(11)).shuffle(timed)
      stream.addData(shuffled.take(3)); q.processAllAvailable()
      stream.addData(shuffled.drop(3)); q.processAllAvailable()
      stream.addData((9L, ts(10000), 1L, 0.0)); q.processAllAvailable()
      stream.addData((9L, ts(20000), 2L, 0.0)); q.processAllAvailable()

      val points = spark.table("hw_ord").where(col("key") =!= "9")
        .as[(String, Long, Long, Long, Long)].collect()
      q.stop()
      // the LAST point per key equals the batch final (level, trend,
      // next-slot season — the forecast composition)
      val last = points.groupBy(_._1)
        .map { case (k, ps) => val p = ps.maxBy(_._2); k -> ((p._3, p._4, p._5)) }
      assert(last == batch, s"$last vs $batch")
      assert(points.length == rows.length)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming EWMA: last point per key equals the batch fold under disorder") {
    import spark.implicits._
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      val rows = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 0.5), (1L, 4L, 10.0),
        (2L, 1L, 5.0), (3L, 2L, -4.0), (3L, 1L, -1.0))
      val batch = graft.ops.Outliers.ewma(
          rows.toDF("user_id", "seq", "v"), Seq("user_id"), "seq", "v", 3, 10)
        .select(col("user_id").cast("string"), col("ewma_fx"))
        .as[(String, Long)].collect().toMap

      val stream = MemoryStream[(Long, Timestamp, Long, Double)]
      val df = stream.toDF().toDF("user_id", "ts", "seq", "v")
        .withWatermark("ts", "60 seconds")
      val q = StreamingAnomaly.ewmaStream(spark, df, "user_id", "ts", "seq", "v", 3, 10)
        .writeStream.format("memory").queryName("ewma_ord").outputMode("append").start()

      val timed = rows.map { case (u, s, v) => (u, ts(s), s, v) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(3)).shuffle(timed)
      stream.addData(shuffled.take(3)); q.processAllAvailable()
      stream.addData(shuffled.drop(3)); q.processAllAvailable()
      stream.addData((9L, ts(10000), 1L, 0.0)); q.processAllAvailable()
      stream.addData((9L, ts(20000), 2L, 0.0)); q.processAllAvailable()

      val points = spark.table("ewma_ord").where(col("key") =!= "9")
        .as[(String, Long, Long)].collect()
      q.stop()
      // running points per key: the LAST equals the batch final level
      val last = points.groupBy(_._1).map { case (k, ps) => k -> ps.maxBy(_._2)._3 }
      assert(last == batch, s"$last vs $batch")
      // every event emitted exactly one point
      assert(points.length == rows.length)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming funnel: batch stage counts under shuffled cross-batch arrival") {
    import spark.implicits._
    import graft.streaming.StreamingFunnel
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      val stages = Seq("signup", "click", "purchase")
      // u1 full journey; u2 click-before-signup; u3 purchase outside window;
      // u4 same-second signup+click (stage-priority tie)
      val rows = Seq(
        (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 10L, "click"), (2L, 20L, "signup"),
        (3L, 10L, "signup"), (3L, 15L, "click"), (3L, 500L, "purchase"),
        (4L, 40L, "signup"), (4L, 40L, "click"))
      val windowSec = 100L
      val batch = graft.ops.Events.funnel(
          rows.map { case (u, s, t) => (u, ts(s), t) }.toDF("user_id", "ts", "event_type"),
          "ts", "user_id", "event_type", stages, windowSec)
        .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
      assert(batch == Map(1 -> 4L, 2 -> 3L, 3 -> 1L)) // sanity: 4 signups, 3 clicks, 1 purchase

      val stream = MemoryStream[(Long, Timestamp, String)]
      // the injected disorder spans whole batches, so the allowed lateness
      // must cover it — with a tight watermark the straggling click IS late
      // data and both engines would legitimately disagree
      val df = stream.toDF().toDF("user_id", "ts", "event_type")
        .withWatermark("ts", "600 seconds")
      val q = StreamingFunnel.funnelStream(spark, df, "ts", "user_id",
          "event_type", stages, windowSec)
        .writeStream.format("memory").queryName("funnel_stream")
        .outputMode("append").start()

      val timed = rows.map { case (u, s, t) => (u, ts(s), t) }
      // shuffled so sequencing spans batch boundaries
      val shuffled = Seq(timed(2), timed(5), timed(8)) ++
        Seq(timed(0), timed(7), timed(3), timed(9)) ++
        Seq(timed(1), timed(4), timed(6))
      stream.addData(shuffled.take(3)); q.processAllAvailable()
      stream.addData(shuffled.slice(3, 7)); q.processAllAvailable()
      stream.addData(shuffled.drop(7)); q.processAllAvailable()
      stream.addData((9L, ts(100000), "signup")); q.processAllAvailable()
      stream.addData((9L, ts(200000), "click")); q.processAllAvailable()

      val streamed = spark.table("funnel_stream")
        .where(col("user") =!= "9")
        .select("stage_index", "user").as[(Int, String)].collect()
      q.stop()
      val counts = streamed.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      assert(counts == batch,
        s"streamed stage counts $counts must equal batch $batch")
      // the tie user reached click in the same second as signup
      assert(streamed.contains((2, "4")))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming transitions and cohort: batch parity under shuffled arrival") {
    import spark.implicits._
    import graft.streaming.StreamingEvents
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(day: Int, m: Int) = new Timestamp((day.toLong * 86400L + m * 60L) * 1000L)
      // (event_id, user, type, ts): u1 a->b->a across days 0 and 8; u2 has
      // an equal-ts pair (id order breaks the tie)
      val rows = Seq(
        (1L, 1L, "a", ts(0, 0)), (2L, 1L, "b", ts(0, 1)), (3L, 1L, "a", ts(8, 0)),
        (4L, 2L, "a", ts(0, 0)), (5L, 2L, "b", ts(0, 0)), (6L, 2L, "c", ts(1, 0)))
      val batchDf = rows.toDF("event_id", "user_id", "event_type", "ts")
      val batchTrans = graft.ops.Events.transitions(batchDf, "ts", "user_id",
          "event_type", "event_id")
        .as[(String, String, Long)].collect().toSet
      val batchCohort = graft.ops.Events.cohortRetention(batchDf, "ts", "user_id",
          maxWeeks = 8)
        .as[(Long, Long, Long)].collect().toSet

      val stream = MemoryStream[(Long, Long, String, Timestamp)]
      val df = stream.toDF().toDF("event_id", "user_id", "event_type", "ts")
        .withWatermark("ts", "30 days")
      val qt = StreamingEvents.transitionsStream(spark, df, "ts", "user_id",
          "event_type", "event_id")
        .writeStream.format("memory").queryName("trans_stream")
        .outputMode("append").start()
      val qc = StreamingEvents.cohortStream(spark, df, "ts", "user_id",
          "event_id", maxWeeks = 8)
        .writeStream.format("memory").queryName("cohort_stream")
        .outputMode("append").start()

      val shuffled = Seq(rows(2), rows(5), rows(0)) ++ Seq(rows(4), rows(1)) ++ Seq(rows(3))
      def feed(batch: Seq[(Long, Long, String, Timestamp)]): Unit = {
        stream.addData(batch: _*); qt.processAllAvailable(); qc.processAllAvailable()
      }
      feed(shuffled.take(3)); feed(shuffled.slice(3, 5)); feed(shuffled.drop(5))
      feed(Seq((90L, 9L, "a", ts(365, 0)))); feed(Seq((91L, 9L, "a", ts(800, 0))))

      val streamTrans = spark.table("trans_stream").where(col("user") =!= "9")
        .groupBy("from_type", "to_type").count()
        .as[(String, String, Long)].collect().toSet
      val streamCohort = spark.table("cohort_stream").where(col("user") =!= "9")
        .groupBy("cohort_week", "week_offset").count()
        .as[(Long, Long, Long)].collect().toSet
      qt.stop(); qc.stop()

      assert(batchTrans == Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
      assert(streamTrans == batchTrans)
      assert(streamCohort == batchCohort)
      assert(batchCohort.contains((0L, 1L, 1L))) // u1's day-8 return
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sessionization closes sessions at the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Timestamp, Long)]
    val df = stream.toDF().toDF("ts", "user_id")
    val sessions = Windows.sessionizeStream(spark, df, "ts", "user_id",
      gapSeconds = 600, watermark = "0 seconds")
    val query = sessions.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: two events 5min apart (one session), then a 20-min gap → new session
    stream.addData((ts(0, 0), 1L), (ts(0, 5), 1L))
    query.processAllAvailable()
    stream.addData((ts(0, 25), 1L))
    query.processAllAvailable()
    // push watermark far past the last session's gap so it closes
    stream.addData((ts(2, 0), 2L))
    query.processAllAvailable()
    stream.addData((ts(4, 0), 2L))
    query.processAllAvailable()

    val out = spark.table("sess_test")
      .select(col("key"), col("session_start").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().toSet
    query.stop()

    assert(out.contains((1L, "2024-01-01 00:00:00", 2L)))  // first session: 2 events
    assert(out.contains((1L, "2024-01-01 00:25:00", 1L)))  // second session after gap
    assert(out.contains((2L, "2024-01-01 02:00:00", 1L)))
  }

  test("YAML-defined streaming scan: one scan.yml drives quality, anomaly and PSI monitors") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val refDir = java.nio.file.Files.createTempDirectory("scan-psi-ref").toString
    try {
      // persisted PSI reference: uniform over [0, 100) in 4 buckets
      Drift.savePsiReference(spark, Drift.buildPsiReference(
        Seq(10.0, 30.0, 60.0, 90.0).toDF("v"), "v", 0.0, 100.0, 4), refDir)
      // persisted KS value reference: the steady 10.0 regime
      Seq(10.0, 10.1, 10.2, 10.3).toDF("v").write.parquet(s"$refDir/ksvals")

      val yaml =
        s"""table_name: events
           |stream:
           |  time_column: ts
           |  watermark: 10 seconds
           |  window: 1 hour
           |columns:
           |  v:
           |    valid_max: 40
           |    psi_reference: $refDir
           |    ks_reference: $refDir/ksvals
           |    anomaly:
           |      key: user_id
           |      order: seq
           |      window: 10
           |      t_squared: 9
           |      min_points: 5
           |      min_dev: 1.0
           |  event_type:
           |    valid_values:
           |    - click
           |    - view
           |""".stripMargin

      def ts(s: Long) = new Timestamp(s * 1000L)
      // user 1: steady 10.0s then a spike at seq 11 (the anomaly); one
      // "bogus" event type and the 50.0 spike are the invalid values
      val rows = (1L to 9L).map(i => (ts(i), 1L, i, 10.0, "click")) ++
        Seq((ts(10), 1L, 10L, 10.2, "view"), (ts(11), 1L, 11L, 50.0, "bogus"))

      val stream = MemoryStream[(Timestamp, Long, Long, Double, String)]
      val df = stream.toDF().toDF("ts", "user_id", "seq", "v", "event_type")
      val scan = Scanner.executeStreamYaml(spark, df, yaml)
      assert(scan.anomalies.keySet == Set("v") && scan.psi.keySet == Set("v"))
      assert(scan.ks.keySet == Set("v"))
      val (ref, psiStream) = scan.psi("v")
      assert(ref.refCounts == Seq(1L, 1L, 1L, 1L))
      val (ksRefSample, ksStream) = scan.ks("v")
      assert(ksRefSample.sorted == Seq(10.0, 10.1, 10.2, 10.3))

      val q1 = scan.quality.writeStream.format("memory").queryName("ys_q")
        .outputMode("complete").start()
      val q2 = scan.anomalies("v").writeStream.format("memory").queryName("ys_a")
        .outputMode("append").start()
      val q3 = psiStream.writeStream.format("memory").queryName("ys_p")
        .outputMode("complete").start()
      val q4 = ksStream.writeStream.format("memory").queryName("ys_k")
        .outputMode("complete").start()
      stream.addData(rows.take(6): _*)
      Seq(q1, q2, q3, q4).foreach(_.processAllAvailable())
      stream.addData(rows.drop(6): _*) // anomaly state must carry across batches
      Seq(q1, q2, q3, q4).foreach(_.processAllAvailable())

      val streamedQuality = spark.table("ys_q")
        .select(col("window_start").cast("string"), col("row_count"),
          col("v_missing"), col("v_invalid"), col("event_type_invalid"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val streamedFlags = spark.table("ys_a").as[(String, Long, Boolean)].collect().toSet
      val streamedBuckets = spark.table("ys_p")
        .select(col("window_start"), col("bucket"), col("cnt"))
        .as[(Timestamp, Long, Long)].collect().toSet
      val streamedKs = spark.table("ys_k")
        .select(col("window_start"), col("n_sample"), col("ks_stat"), col("sample"))
        .as[(Timestamp, Int, Double, Seq[Double])].collect()
      Seq(q1, q2, q3, q4).foreach(_.stop())

      // the SAME parsed definition over the same rows as a BATCH frame
      val batchScan = Scanner.executeStreamYaml(spark,
        rows.toDF("ts", "user_id", "seq", "v", "event_type"), yaml)
      val batchQuality = batchScan.quality
        .select(col("window_start").cast("string"), col("row_count"),
          col("v_missing"), col("v_invalid"), col("event_type_invalid"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(streamedQuality == batchQuality, "windowed quality: batch parity")
      assert(streamedQuality == Set(("1970-01-01 00:00:00", 11L, 0L, 1L, 1L)))

      val batchFlags = batchScan.anomalies("v").collect().map(f => (f.key, f.seq, f.is_anomaly)).toSet
      assert(streamedFlags == batchFlags, "anomaly flags: batch parity")
      assert(streamedFlags.count(_._3) == 1 && streamedFlags.contains(("1", 11L, true)))

      val batchBuckets = batchScan.psi("v")._2
        .as[(Timestamp, Long, Long)].collect().toSet
      assert(streamedBuckets == batchBuckets, "PSI bucket counts: batch parity")
      // 10 values in bucket 0, the 50.0 spike in bucket 2
      assert(streamedBuckets == Set((ts(0), 0L, 10L), (ts(0), 2L, 1L)))
      val psis = graft.streaming.StreamingMonitor.psiOfWindows(
        streamedBuckets.toSeq, ref.refCounts)
      assert(psis.size == 1 && psis(0)._2 > 0.25, s"drifted window should alarm: $psis")

      // streamed per-window ks_stat equals the driver-side helper on the
      // same samples, and the batch route computes the identical value
      assert(streamedKs.length == 1)
      val (_, nS, ksStat, sample) = streamedKs(0)
      assert(nS == sample.size)
      assert(ksStat == Drift.ksOfSamples(sample, ksRefSample))
      assert(ksStat > 0.2, s"spiked window should drift: $ksStat") // 50.0 outside ref support
      val batchKs = batchScan.ks("v")._2.select(col("ks_stat"))
        .as[Double].collect()
      assert(batchKs.toSeq == Seq(ksStat), "ks: batch parity")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(refDir)).deleteRecursively()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming scan benford/co_missingness: per-window audits equal the batch operators") {
    import spark.implicits._
    import graft.scan.Scanner
    import graft.ops.Constraints
    implicit val sqlCtx = spark.sqlContext

    val yaml =
      """table_name: events
        |stream:
        |  time_column: ts
        |  watermark: 10 seconds
        |  window: 1 hour
        |co_missingness:
        |- a
        |- b
        |columns:
        |  amount:
        |    benford: 2
        |""".stripMargin

    def ts(s: Long) = new Timestamp(s * 1000L)
    // window 0: Benford-ish magnitudes, correlated a/b nulls; window 1:
    // flat digits (high chi2), uncorrelated nulls — the audits must flip
    // BETWEEN windows, which a whole-scan batch audit cannot express
    val w0 = Seq[(Long, Option[Double], Option[Double], Double)](
      (0L, None, None, 1.23), (60L, None, None, 1.7), (120L, Some(1.0), Some(2.0), 19.99),
      (180L, Some(3.0), Some(4.0), 2.5), (240L, None, None, 35.0), (300L, Some(5.0), None, 1.1))
    val w1 = (0 until 9).map(d =>
      (3600L + 60L * d, if (d % 2 == 0) None else Some(1.0),
        if (d % 2 == 1) None else Some(1.0), (d + 1) * 100.0))
    val rows = (w0 ++ w1).map { case (t0, a, b, v) => (ts(t0), a, b, v) }

    val stream = MemoryStream[(Timestamp, Option[Double], Option[Double], Double)]
    val df = stream.toDF().toDF("ts", "a", "b", "amount")
    val scan = Scanner.executeStreamYaml(spark, df, yaml)
    assert(scan.benford.keySet == Set("amount") && scan.coMissing.isDefined)

    val q1 = scan.benford("amount").writeStream.format("memory").queryName("bf_s")
      .outputMode("complete").start()
    val q2 = scan.coMissing.get.writeStream.format("memory").queryName("cm_s")
      .outputMode("complete").start()
    stream.addData(rows.take(8): _*)
    Seq(q1, q2).foreach(_.processAllAvailable())
    stream.addData(rows.drop(8): _*)
    Seq(q1, q2).foreach(_.processAllAvailable())

    val streamedBf = spark.table("bf_s")
      .select(col("window_start").cast("string"), col("n"), col("benford_chi2"))
      .as[(String, Long, Double)].collect().toSet
    val streamedCm = spark.table("cm_s")
      .select(col("window_start").cast("string"), col("col_a"), col("col_b"),
        col("n"), col("both_null"), col("null_jaccard"))
      .as[(String, String, String, Long, Long, Double)].collect().toSet
    Seq(q1, q2).foreach(_.stop())

    // batch parity: same YAML over the same rows as a batch frame
    val batchDf = rows.toDF("ts", "a", "b", "amount")
    val batchScan = Scanner.executeStreamYaml(spark, batchDf, yaml)
    val batchBf = batchScan.benford("amount")
      .select(col("window_start").cast("string"), col("n"), col("benford_chi2"))
      .as[(String, Long, Double)].collect().toSet
    assert(streamedBf == batchBf, "per-window benford: batch parity")
    val batchCm = batchScan.coMissing.get
      .select(col("window_start").cast("string"), col("col_a"), col("col_b"),
        col("n"), col("both_null"), col("null_jaccard"))
      .as[(String, String, String, Long, Long, Double)].collect().toSet
    assert(streamedCm == batchCm, "per-window co-missingness: batch parity")

    // bit-exactness vs the BATCH audits on each window's slice
    val h0 = "1970-01-01 00:00:00"; val h1 = "1970-01-01 01:00:00"
    for ((label, lo, hi) <- Seq((h0, 0L, 3600L), (h1, 3600L, 7200L))) {
      val slice = batchDf.where(col("ts") >= ts(lo) && col("ts") < ts(hi))
      val chi2 = Constraints.benfordAudit(slice, Seq("amount" -> 2))
        .select("chi2").distinct().as[Double].collect()
      assert(chi2.length == 1)
      assert(streamedBf.exists { case (w, _, c) => w == label && c == chi2(0) },
        s"window $label chi2 must equal the batch audit (${chi2(0)} vs $streamedBf)")
      val cm = Constraints.coMissingness(slice, Seq("a", "b"))
        .select(col("n"), col("both_null"), col("null_jaccard"))
        .as[(Long, Long, Double)].collect()(0)
      assert(streamedCm.exists { case (w, _, _, n, b, j) =>
        w == label && (n, b, j) == cm }, s"window $label conull must equal the batch audit")
    }
    // the audits really flip between the windows: correlated nulls (jaccard
    // 3/4) then disjoint nulls (jaccard 0)
    assert(streamedCm.exists { case (w, _, _, _, b, j) => w == h0 && b == 3L && j == 0.75 })
    assert(streamedCm.exists { case (w, _, _, _, b, j) => w == h1 && b == 0L && j == 0.0 })
  }

  test("streaming scan tests: per-window PASS/FAIL verdicts, streaming equals batch") {
    import spark.implicits._
    import graft.scan.Scanner
    implicit val sqlCtx = spark.sqlContext

    // Two 1-hour windows. Window 0 (ts 0..3599): 6 clean rows. Window 1
    // (ts 3600..): 5 rows, one NULL v and one invalid event_type — so the
    // per-column tests flip verdicts BETWEEN windows, which driver-side
    // (whole-scan) evaluation cannot express.
    val yaml =
      """table_name: events
        |stream:
        |  time_column: ts
        |  watermark: 10 seconds
        |  window: 1 hour
        |tests:
        |- row_count > 5
        |- avg > 3
        |columns:
        |  v:
        |    tests:
        |    - missing_count == 0
        |    - missing_percentage < 25
        |  event_type:
        |    valid_values:
        |    - click
        |    - view
        |    tests:
        |    - invalid_count == 0
        |""".stripMargin

    def ts(s: Long) = new Timestamp(s * 1000L)
    val rows =
      (0L until 6L).map(i => (ts(i * 60), Some(10.0 + i), "click")) ++
        Seq((ts(3600), Some(1.0), "view"), (ts(3660), None, "click"),
          (ts(3720), Some(2.0), "bogus"), (ts(3780), Some(3.0), "view"),
          (ts(3840), Some(4.0), "click"))

    val stream = MemoryStream[(Timestamp, Option[Double], String)]
    val df = stream.toDF().toDF("ts", "v", "event_type")
    val scan = Scanner.executeStreamYaml(spark, df, yaml)

    val q = scan.tests.writeStream.format("memory").queryName("wt_test")
      .outputMode("complete").start()
    stream.addData(rows.take(7): _*)
    q.processAllAvailable()
    stream.addData(rows.drop(7): _*)
    q.processAllAvailable()

    val streamed = spark.table("wt_test")
      .select(col("window_start").cast("string"), col("column_name"), col("test"),
        col("passed"), col("skipped"))
      .as[(String, String, String, Option[Boolean], Boolean)].collect().toSet
    q.stop()

    // batch parity: identical YAML over the same rows as a batch frame
    val batch = Scanner.executeStreamYaml(spark, rows.toDF("ts", "v", "event_type"), yaml)
      .tests
      .select(col("window_start").cast("string"), col("column_name"), col("test"),
        col("passed"), col("skipped"))
      .as[(String, String, String, Option[Boolean], Boolean)].collect().toSet
    assert(streamed == batch, "per-window test verdicts: batch parity")

    val w0 = "1970-01-01 00:00:00"; val w1 = "1970-01-01 01:00:00"
    val expected: Set[(String, String, String, Option[Boolean], Boolean)] = Set(
      // table tests: row_count 6 then 5; `avg` is not measurable at window
      // grain → skipped with NULL verdict in EVERY window
      (w0, null, "row_count > 5", Some(true), false),
      (w1, null, "row_count > 5", Some(false), false),
      (w0, null, "avg > 3", None, true),
      (w1, null, "avg > 3", None, true),
      // v: clean in w0; 1 NULL of 5 rows (20%) in w1
      (w0, "v", "missing_count == 0", Some(true), false),
      (w1, "v", "missing_count == 0", Some(false), false),
      (w0, "v", "missing_percentage < 25", Some(true), false),
      (w1, "v", "missing_percentage < 25", Some(true), false),
      // event_type: 'bogus' lands in w1 only
      (w0, "event_type", "invalid_count == 0", Some(true), false),
      (w1, "event_type", "invalid_count == 0", Some(false), false))
    assert(streamed == expected, s"verdicts:\n${streamed.toSeq.sortBy(v => (v._1, v._3)).mkString("\n")}")
  }

  test("windowed KS sample stream: exact vs batch KS when k covers the window") {
    import spark.implicits._
    import graft.scan.Drift
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // window 0: same distribution as the reference; window 1: shifted
    val w0 = (1 to 20).map(i => (ts(0, i), i.toLong, i.toDouble))
    val w1 = (1 to 20).map(i => (ts(1, i), 100L + i, i.toDouble + 50.0))
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val out = StreamingMonitor.ksSketchStream(
      stream.toDF().toDF("ts", "id", "v"), "ts", "10 minutes", "1 hour",
      xxhash64(col("id")), col("v"), k = 64)
    val query = out.writeStream.format("memory")
      .queryName("ks_test").outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    query.processAllAvailable()
    val windows = spark.table("ks_test")
      .select(col("window_start"), col("sample"))
      .as[(Timestamp, Seq[Double])].collect().sortBy(_._1.getTime)
    query.stop()

    val ref = (1 to 20).map(_.toDouble)
    assert(windows.length == 2 && windows.forall(_._2.size == 20)) // k=64 ≥ 20: exact
    val ks0 = Drift.ksOfSamples(windows(0)._2, ref)
    val ks1 = Drift.ksOfSamples(windows(1)._2, ref)
    assert(ks0 == 0.0)
    assert(ks1 == 1.0) // disjoint supports
    // parity with the distributed statistic on the same frames
    val batch = Drift.ksStatistic(
      w1.map(_._3).toDF("v"), ref.toDF("v"), "v")
      .select("ks_stat").as[Double].collect()(0)
    assert(batch == ks1)
    // subsample mode: k below the window size still yields a bounded sample
    val sub = StreamingMonitor.ksSketchStream(
      w0.toDF("ts", "id", "v"), "ts", "10 minutes", "1 hour",
      xxhash64(col("id")), col("v"), k = 8)
      .select("n_sample").as[Int].collect()
    assert(sub.toSeq == Seq(8))
  }

  test("windowed MWU: sample-twin equals the distributed statistic, shift direction reads in AUC") {
    import spark.implicits._
    import graft.scan.Drift
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val w0 = (1 to 20).map(i => (ts(0, i), i.toLong, i.toDouble))          // = reference
    val w1 = (1 to 20).map(i => (ts(1, i), 100L + i, i.toDouble + 50.0))   // shifted up
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val out = StreamingMonitor.ksSketchStream(
      stream.toDF().toDF("ts", "id", "v"), "ts", "10 minutes", "1 hour",
      xxhash64(col("id")), col("v"), k = 64)
    val query = out.writeStream.format("memory")
      .queryName("mwu_stream").outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    query.processAllAvailable()
    val windows = spark.table("mwu_stream")
      .select(col("window_start"), col("sample"))
      .as[(Timestamp, Seq[Double])].collect().sortBy(_._1.getTime)
    query.stop()

    val ref = (1 to 20).map(_.toDouble)
    // window 0 == reference: AUC 1/2, z 0; window 1 shifted up: every
    // current value beats every reference one -> window-as-ref AUC 0
    val (u0, t0, a0, z0) = Drift.mwuOfSamples(ref, windows(0)._2)
    assert(a0 == 0.5 && z0.contains(0.0) && t0 == (2L * 2 * 2 - 2) * 20)
    val (_, _, a1, z1) = Drift.mwuOfSamples(ref, windows(1)._2)
    assert(a1 == 0.0 && z1.get < -5.0)
    assert(u0 == 400L) // n1*n2/2 doubled
    // the sample twin must equal the DISTRIBUTED statistic bit-for-bit
    for ((cur, r) <- Seq((windows(1)._2, ref), (windows(0)._2, ref),
      (Seq(1.0, 3.0), Seq(2.0, 3.0)))) {
      val (ud, tt, auc, z) = Drift.mwuOfSamples(r, cur)
      val row = Drift.mannWhitneyU(r.toDF("v"), cur.toDF("v"), "v").collect()(0)
      assert(row.getLong(2) == ud && row.getLong(3) == tt)
      assert(row.getDouble(4) == auc)
      assert((if (row.isNullAt(5)) None else Some(row.getDouble(5))) == z)
    }
  }

  test("windowed W1: sample twin equals the distributed statistic, shift magnitude reads in w1") {
    import spark.implicits._
    import graft.scan.Drift
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val w0 = (1 to 20).map(i => (ts(0, i), i.toLong, i.toDouble))          // = reference
    val w1 = (1 to 20).map(i => (ts(1, i), 100L + i, i.toDouble + 50.0))   // shifted +50
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val out = StreamingMonitor.ksSketchStream(
      stream.toDF().toDF("ts", "id", "v"), "ts", "10 minutes", "1 hour",
      xxhash64(col("id")), col("v"), k = 64)
    val query = out.writeStream.format("memory")
      .queryName("w1_stream").outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    query.processAllAvailable()
    val windows = spark.table("w1_stream")
      .select(col("window_start"), col("sample"))
      .as[(Timestamp, Seq[Double])].collect().sortBy(_._1.getTime)
    query.stop()

    val ref = (1 to 20).map(_.toDouble)
    // window 0 == reference: zero mass moved; window 1: a pure +50 shift
    // moves every quantile 50 units — W1 reads the MAGNITUDE where KS
    // saturates at 1 for any disjoint shift
    assert(Drift.w1OfSamples(ref, windows(0)._2) == 0.0)
    assert(Drift.w1OfSamples(ref, windows(1)._2) == 50.0)
    // bit-parity with the distributed statistic on the same frames
    for ((r, cur) <- Seq((ref, windows(1)._2), (ref, windows(0)._2),
      (Seq(1.0, 3.0, 3.0), Seq(2.0, 7.0)))) {
      val batch = Drift.wasserstein1(r.toDF("v"), cur.toDF("v"), "v")
        .select("w1").as[Double].collect()(0)
      assert(batch == Drift.w1OfSamples(r, cur))
    }
  }

  test("streaming drift battery parity: mwu/w1/chi2 reference keys served by executeStream") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    implicit val sqlCtx = spark.sqlContext

    val refDir = java.nio.file.Files.createTempDirectory("scan-drift-ref").toString
    // numeric reference = the hour-0 regime; categorical reference mix 8:4
    (1 to 20).map(_.toDouble).toDF("v").write.parquet(s"$refDir/vals")
    (Seq.fill(8)("a") ++ Seq.fill(4)("b")).toDF("cat").write.parquet(s"$refDir/cats")

    val yaml =
      s"""table_name: events
         |stream:
         |  time_column: ts
         |  watermark: 10 minutes
         |  window: 1 hour
         |columns:
         |  v:
         |    mwu_reference: $refDir/vals
         |    w1_reference: $refDir/vals
         |  cat:
         |    chi2_reference: $refDir/cats
         |""".stripMargin

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def catOf(i: Int, flip: Boolean): String =
      if (i > 12) null
      else if ((i % 3 == 0) != flip) "b"
      else "a" // 12 rows per hour: 8:4 matching the reference, flipped to 4:8
    // hour 0 = the reference regime exactly; hour 1 = +50 value shift and
    // an inverted category mix
    val w0 = (1 to 20).map(i => (ts(0, i), i.toDouble, catOf(i, flip = false)))
    val w1 = (1 to 20).map(i => (ts(1, i), i.toDouble + 50.0, catOf(i, flip = true)))

    val stream = MemoryStream[(Timestamp, Double, String)]
    val df = stream.toDF().toDF("ts", "v", "cat")
    val scan = Scanner.executeStreamYaml(spark, df, yaml)
    assert(scan.mwu.keySet == Set("v") && scan.w1.keySet == Set("v"))
    assert(scan.chi2.keySet == Set("cat"))
    val (mwuRef, mwuStream) = scan.mwu("v")
    val (w1Ref, w1Stream) = scan.w1("v")
    assert(mwuRef.sorted == (1 to 20).map(_.toDouble) && w1Ref.sorted == mwuRef.sorted)
    val (chi2Ref, chi2Stream) = scan.chi2("cat")
    assert(chi2Ref == Map("a" -> 8L, "b" -> 4L))

    val q1 = mwuStream.writeStream.format("memory").queryName("drift_mwu")
      .outputMode("complete").start()
    val q2 = chi2Stream.writeStream.format("memory").queryName("drift_chi2")
      .outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    Seq(q1, q2).foreach(_.processAllAvailable())
    val samples = spark.table("drift_mwu")
      .select(col("window_start"), col("sample"))
      .as[(Timestamp, Seq[Double])].collect().sortBy(_._1.getTime)
    val catCounts = spark.table("drift_chi2")
      .select(col("window_start"), col("category"), col("cnt"))
      .as[(Timestamp, String, Long)].collect()
    Seq(q1, q2).foreach(_.stop())

    // --- MWU verdicts: hour 0 = no shift, hour 1 = total upward shift ---
    val (_, _, auc0, z0) = Drift.mwuOfSamples(mwuRef, samples(0)._2)
    assert(auc0 == 0.5 && z0.contains(0.0))
    val (_, _, auc1, z1) = Drift.mwuOfSamples(mwuRef, samples(1)._2)
    assert(auc1 == 0.0 && z1.get < -5.0)
    // wiring parity with the distributed statistic on the same frames
    val batchRow = Drift.mannWhitneyU(mwuRef.toDF("v"),
      samples(1)._2.toDF("v"), "v").collect()(0)
    assert(batchRow.getDouble(4) == auc1)

    // --- W1 verdicts: zero mass moved, then exactly +50 units ---
    assert(Drift.w1OfSamples(w1Ref, samples(0)._2) == 0.0)
    assert(Drift.w1OfSamples(w1Ref, samples(1)._2) == 50.0)

    // --- chi2 verdicts: identical mix reads 0, the inverted mix reads the
    // batch statistic bit-for-bit ---
    val byWindow = catCounts.groupBy(_._1).map { case (w, rows) =>
      w -> rows.map(r => r._2 -> r._3).toMap
    }
    val wins = byWindow.keys.toSeq.sortBy(_.getTime)
    assert(byWindow(wins(0)) == Map("a" -> 8L, "b" -> 4L))
    assert(byWindow(wins(1)) == Map("a" -> 4L, "b" -> 8L))
    assert(Drift.chi2OfCounts(chi2Ref, byWindow(wins(0))) == ((12L, 12L, 2L, 0L)))
    val (n1, n2, cats, ppm) = Drift.chi2OfCounts(chi2Ref, byWindow(wins(1)))
    val batch = Drift.chiSquareCategorical(
      (Seq.fill(8)("a") ++ Seq.fill(4)("b")).toDF("cat"),
      (Seq.fill(4)("a") ++ Seq.fill(8)("b")).toDF("cat"), "cat").collect()(0)
    assert((n1, n2, cats, ppm) ==
      ((batch.getLong(0), batch.getLong(1), batch.getLong(2), batch.getLong(3))))
    assert(ppm > 0L)

    // --- backfill parity: the same YAML over the same rows as a BATCH
    // frame yields identical sample windows and category counts ---
    val batchScan = Scanner.executeStreamYaml(spark, (w0 ++ w1).toDF("ts", "v", "cat"), yaml)
    val batchSamples = batchScan.mwu("v")._2
      .select(col("window_start"), col("sample"))
      .as[(Timestamp, Seq[Double])].collect().sortBy(_._1.getTime)
    assert(batchSamples.map(s => (s._1, s._2.sorted)).toSeq ==
      samples.map(s => (s._1, s._2.sorted)).toSeq)
    val batchCats = batchScan.chi2("cat")._2
      .as[(Timestamp, String, Long)].collect().toSet
    assert(batchCats == catCounts.toSet)
  }

  test("streaming welch_reference monitor: exact per-window moments, batch bit-parity") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    implicit val sqlCtx = spark.sqlContext

    val refDir = java.nio.file.Files.createTempDirectory("scan-welch-ref").toString
    (1L to 20L).toDF("v").write.parquet(s"$refDir/vals")
    val yaml =
      s"""table_name: events
         |stream:
         |  time_column: ts
         |  watermark: 10 minutes
         |  window: 1 hour
         |columns:
         |  v:
         |    welch_reference: $refDir/vals
         |""".stripMargin
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0 = the reference regime exactly; hour 1 = +50 shift
    val w0 = (1 to 20).map(i => (ts(0, i), i.toLong))
    val w1 = (1 to 20).map(i => (ts(1, i), i.toLong + 50L))
    val stream = MemoryStream[(Timestamp, Long)]
    val scan = Scanner.executeStreamYaml(spark,
      stream.toDF().toDF("ts", "v"), yaml)
    assert(scan.welch.keySet == Set("v"))
    val ((rn, rs, rq), momStream) = scan.welch("v")
    assert(rn == 20L && rs == BigInt(210) && rq == BigInt(2870))
    val q = momStream.writeStream.format("memory").queryName("welch_moments")
      .outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    q.processAllAvailable()
    val wins = spark.table("welch_moments")
      .select(col("window_start"), col("n"), col("s_raw").cast("string"),
        col("q_raw").cast("string"))
      .as[(Timestamp, Long, String, String)].collect().sortBy(_._1.getTime)
    q.stop()
    assert(wins.length == 2)
    def verdict(w: (Timestamp, Long, String, String)) =
      Drift.welchOfMoments(rn, rs, rq, w._2, BigInt(w._3), BigInt(w._4))
    // hour 0: identical populations — t exactly 0
    val v0 = verdict(wins(0))
    assert(v0._1 == v0._2 && v0._5.contains(0.0))
    // hour 1: +50 shift — strongly negative t, and BIT-EQUAL to the batch
    // distributed statistic over the same rows
    val v1 = verdict(wins(1))
    val batch = Drift.welchT((1L to 20L).toDF("v"),
      w1.map(_._2).toDF("v"), "v").collect()(0)
    assert(v1._1 == batch.getDouble(2) && v1._2 == batch.getDouble(3))
    assert(v1._3.get == batch.getDouble(4) && v1._4.get == batch.getDouble(5))
    assert(v1._5.get == batch.getDouble(6) && v1._6.get == batch.getDouble(7))
    assert(v1._5.get < -20.0)
  }

  test("streaming cvm/energy reference monitors: sample-twin bit-parity, served by executeStream") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    implicit val sqlCtx = spark.sqlContext

    // twin ≡ distributed statistic on equal multisets (incl. ties)
    val r = Seq(1.0, 2.0, 2.0, 5.0); val c = Seq(2.0, 3.0, 7.0)
    val (u4, t) = Drift.cvmOfSamples(r, c)
    val dc = Drift.cramerVonMises(r.toDF("v"), c.toDF("v"), "v").collect()(0)
    assert(u4 == dc.getDouble(2) && t == dc.getDouble(3))
    val (e, ts0) = Drift.energyOfSamples(r, c)
    val de = Drift.energyDistance(r.toDF("v"), c.toDF("v"), "v").collect()(0)
    assert(e == de.getDouble(5) && ts0 == de.getDouble(6))

    // executeStream serves both keys off the SHARED per-column sample feed
    val refDir = java.nio.file.Files.createTempDirectory("scan-cvm-ref").toString
    (1L to 20L).toDF("v").write.parquet(s"$refDir/vals")
    val yaml =
      s"""table_name: events
         |stream:
         |  time_column: ts
         |  watermark: 10 minutes
         |  window: 1 hour
         |columns:
         |  v:
         |    cvm_reference: $refDir/vals
         |    energy_reference: $refDir/vals
         |""".stripMargin
    def mkts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Timestamp, Long)]
    val scan = Scanner.executeStreamYaml(spark, stream.toDF().toDF("ts", "v"), yaml)
    assert(scan.cvm.keySet == Set("v") && scan.energy.keySet == Set("v"))
    // one shared feed: the two monitors hold the SAME stream plan
    assert(scan.cvm("v")._2 eq scan.energy("v")._2)
    val q = scan.cvm("v")._2.writeStream.format("memory").queryName("cvm_feed")
      .outputMode("complete").start()
    stream.addData((1 to 20).map(i => (mkts(0, i), i.toLong + 50L)))
    q.processAllAvailable()
    val sample = spark.table("cvm_feed").select(col("sample"))
      .as[Seq[Double]].collect()(0)
    q.stop()
    val ref = scan.cvm("v")._1
    // +50 shift: disjoint populations — near-max CvM, energy ≈ 2·50 − spreads
    val (_, tShift) = Drift.cvmOfSamples(ref, sample)
    val (eShift, _) = Drift.energyOfSamples(ref, sample)
    assert(tShift > 0.3 && eShift > 80.0)
    // parity with the distributed statistics on the window's multiset
    val dd = Drift.cramerVonMises(ref.toDF("v"), sample.toDF("v"), "v").collect()(0)
    assert(tShift == dd.getDouble(3))
    val ee = Drift.energyDistance(ref.toDF("v"), sample.toDF("v"), "v").collect()(0)
    assert(eShift == ee.getDouble(5))
  }

  test("ad_reference streaming twin: shared sample feed, adOfSamples parity on the window multiset") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    implicit val sqlCtx = spark.sqlContext

    val refDir = java.nio.file.Files.createTempDirectory("scan-ad-sref").toString
    (1L to 20L).toDF("v").write.parquet(s"$refDir/vals")
    val yaml =
      s"""table_name: events
         |stream:
         |  time_column: ts
         |  watermark: 10 minutes
         |  window: 1 hour
         |columns:
         |  v:
         |    ks_reference: $refDir/vals
         |    ad_reference: $refDir/vals
         |""".stripMargin
    def mkts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Timestamp, Long)]
    val scan = Scanner.executeStreamYaml(spark, stream.toDF().toDF("ts", "v"), yaml)
    assert(scan.ad.keySet == Set("v"))
    val q = scan.ad("v")._2.writeStream.format("memory").queryName("ad_feed")
      .outputMode("complete").start()
    stream.addData((1 to 20).map(i => (mkts(0, i), i.toLong + 50L)))
    q.processAllAvailable()
    val sample = spark.table("ad_feed").select(col("sample"))
      .as[Seq[Double]].collect()(0)
    q.stop()
    val ref = scan.ad("v")._1
    val (sfx, a2) = Drift.adOfSamples(ref, sample)
    assert(a2 > 10.0, s"disjoint-window A²: $a2") // +50 shift, far above null ≈ 1
    // parity with the distributed statistic on the window's multiset
    val dd = Drift.andersonDarling(ref.toDF("v"), sample.toDF("v"), "v").collect()(0)
    assert(sfx == dd.getDouble(2) && a2 == dd.getDouble(3))
  }

  test("mood_scale streaming twin: shared sample feed, moodScaleOfSamples parity") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    implicit val sqlCtx = spark.sqlContext

    // twin ≡ distributed statistic on equal multisets (incl. ties)
    val rr = Seq(1.0, 2.0, 2.0, 9.0); val cc = Seq(4.0, 5.0, 6.0)
    val (m4l, _) = Drift.moodScaleOfSamples(rr, cc)
    val dd = Drift.moodScale(rr.toDF("v"), cc.toDF("v"), "v").collect()(0)
    assert(m4l == dd.getDouble(2))

    val refDir = java.nio.file.Files.createTempDirectory("scan-moods-sref").toString
    (1L to 20L).toDF("v").write.parquet(s"$refDir/vals")
    val yaml =
      s"""table_name: events
         |stream:
         |  time_column: ts
         |  watermark: 10 minutes
         |  window: 1 hour
         |columns:
         |  v:
         |    mood_scale_reference: $refDir/vals
         |""".stripMargin
    def mkts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Timestamp, Long)]
    val scan = Scanner.executeStreamYaml(spark, stream.toDF().toDF("ts", "v"), yaml)
    assert(scan.moodScale.keySet == Set("v"))
    val q = scan.moodScale("v")._2.writeStream.format("memory")
      .queryName("moods_feed").outputMode("complete").start()
    // window values wrap the reference → ref concentrated → z < 0
    stream.addData((1 to 10).map(i => (mkts(0, i), -i.toLong * 3)) ++
      (11 to 20).map(i => (mkts(0, i), i.toLong * 3)))
    q.processAllAvailable()
    val sample = spark.table("moods_feed").select(col("sample"))
      .as[Seq[Double]].collect()(0)
    q.stop()
    val ref = scan.moodScale("v")._1
    val (m4s, zs) = Drift.moodScaleOfSamples(ref, sample)
    val dw = Drift.moodScale(ref.toDF("v"), sample.toDF("v"), "v").collect()(0)
    assert(m4s == dw.getDouble(2) && zs == dw.getDouble(3))
    assert(zs < -2.0, s"wrapped-window z: $zs")
  }

  test("windowed rate monitor: per-window counts, prop-test twin parity, null exclusion") {
    import spark.implicits._
    import graft.scan.Drift
    import graft.streaming.StreamingMonitor
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: 15/20 valid (matches the 3/4 reference); hour 1: 5/20 (drifted);
    // one NULL row in hour 1 must be excluded, not counted as failure
    val w0 = (1 to 20).map(i => (ts(0, i), Some(i <= 15)))
    val w1 = (1 to 20).map(i => (ts(1, i), Some(i <= 5))) :+
      ((ts(1, 25), Option.empty[Boolean]))
    val stream = MemoryStream[(Timestamp, Option[Boolean])]
    val q = StreamingMonitor.rateStream(
        stream.toDF().toDF("ts", "ok"), "ts", "10 minutes", "1 hour", col("ok"))
      .writeStream.format("memory").queryName("rate_test").outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    q.processAllAvailable()
    val windows = spark.table("rate_test")
      .as[(Timestamp, Long, Long)].collect().sortBy(_._1.getTime)
    q.stop()
    assert(windows.map(w => (w._2, w._3)).toSeq == Seq((20L, 15L), (20L, 5L)))
    // reference: 30/40 — window 0 rate matches (z small), window 1 drifts
    val (p1a, p2a, _, za) = Drift.propTestOfCounts(40L, 30L, windows(0)._2, windows(0)._3)
    assert(p1a == 0.75 && p2a == 0.75 && za.contains(0.0))
    val (_, _, diffB, zb) = Drift.propTestOfCounts(40L, 30L, windows(1)._2, windows(1)._3)
    assert(diffB == 0.5 && zb.get > 3.0)
    // the scalar twin equals the DISTRIBUTED statistic bit-for-bit
    val ref = (Seq.fill(30)(true) ++ Seq.fill(10)(false)).toDF("b")
    val cur = (Seq.fill(5)(true) ++ Seq.fill(15)(false)).toDF("b")
    val row = Drift.proportionTest(ref, cur, col("b")).collect()(0)
    val (tp1, tp2, td, tz) = Drift.propTestOfCounts(40L, 30L, 20L, 5L)
    assert(row.getDouble(4) == tp1 && row.getDouble(5) == tp2 &&
      row.getDouble(6) == td && row.getDouble(7) == tz.get)
  }

  test("windowed OOV monitor: per-window token counts vs vocab, drift reads in the rate") {
    import spark.implicits._
    import graft.streaming.StreamingMonitor
    import graft.scan.Drift
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: all tokens in-vocab; hour 1: half the tokens are novel
    val w0 = Seq((ts(0, 1), "aa bb"), (ts(0, 2), "aa aa"))
    val w1 = Seq((ts(1, 1), "aa zz"), (ts(1, 2), "bb qq"))
    val stream = MemoryStream[(Timestamp, String)]
    val q = StreamingMonitor.oovStream(
        stream.toDF().toDF("ts", "text"), "ts", "10 minutes", "1 hour",
        "text", Seq("aa", "bb", "cc"))
      .writeStream.format("memory").queryName("oov_test").outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    q.processAllAvailable()
    val windows = spark.table("oov_test")
      .as[(Timestamp, Long, Long)].collect().sortBy(_._1.getTime)
    q.stop()
    // (n tokens, in-vocab): hour 0 = (4, 4); hour 1 = (4, 2)
    assert(windows.map(w => (w._2, w._3)).toSeq == Seq((4L, 4L), (4L, 2L)))
    // the prop-test twin turns the counts into a drift verdict vs a
    // reference in-vocab rate (e.g. the batch scan's 100%)
    val (_, p1, _, _) = Drift.propTestOfCounts(100L, 100L, windows(1)._2, windows(1)._3)
    assert(p1 == 0.5)
  }

  test("streaming contamination: per-doc fractions match the batch operator, shingle-less doc survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingMonitor

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val train = Seq((101L, "aa bb cc dd ee"), (102L, "xx yy zz ww vv"))
      .toDF("doc_id", "text")
    // hour 0: doc 1 fully quoted (3-gram "aa bb cc" + "bb cc dd" + "cc dd ee"
    // all in train), doc 2 clean; hour 1: doc 3 half-quoted, doc 4 too short
    // for a 3-gram (the unmeasurable case)
    val w0 = Seq((ts(0, 1), 1L, "aa bb cc dd ee"), (ts(0, 2), 2L, "qq rr ss tt"))
    val w1 = Seq((ts(1, 1), 3L, "aa bb cc qq rr"), (ts(1, 2), 4L, "aa bb"))
    val stream = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingMonitor.contaminationStream(
        stream.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes", "1 hour",
        "doc_id", "text", train, "text")
      .writeStream.format("memory").queryName("contam_test").outputMode("complete").start()
    stream.addData(w0); stream.addData(w1)
    q.processAllAvailable()
    val rows = spark.table("contam_test")
      .select(col("id"), col("n_shingles"), col("hits"), col("contamination"))
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    q.stop()
    assert(rows.length == 4)
    assert(rows(0) == ((1L, 3L, 3L, Some(1.0))), s"doc1: ${rows(0)}")
    assert(rows(1) == ((2L, 2L, 0L, Some(0.0))), s"doc2: ${rows(1)}")
    assert(rows(2)._2 == 3L && rows(2)._3 == 1L, s"doc3: ${rows(2)}")
    // doc 4 is shorter than the shingle length: the Shingles contract folds
    // it to ONE whole-text shingle (n_shingles = 1, not dropped) — pin the
    // per-doc equality against the batch twin rather than re-deriving
    val batch = graft.ops.Dedup.contaminationScores(train,
        (w0 ++ w1).toDF("ts", "doc_id", "text"), "doc_id", "text")
      .select(col("id"), col("n_shingles"), col("hits"), col("contamination"))
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == batch.toSeq, s"stream $rows vs batch $batch")
  }

  test("streaming PSI: windowed bucket counts vs a static reference") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingMonitor

    val stream = MemoryStream[(Timestamp, Double)]
    val df = stream.toDF().toDF("ts", "v")
    val q = StreamingMonitor.bucketCountStream(df, "ts", "10 minutes", "1 hour",
      "v", lo = 0.0, hi = 100.0, buckets = 4)
      .writeStream.format("memory").queryName("psi_test").outputMode("complete").start()

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // hour 0: values spread 10,30,60,90 -> one per bucket
    // hour 1: all mass in bucket 0 (drifted), plus an out-of-range + null-free check
    stream.addData((ts(0, 5), 10.0), (ts(0, 10), 30.0), (ts(0, 20), 60.0), (ts(0, 30), 90.0),
      (ts(1, 5), 5.0), (ts(1, 10), 7.0), (ts(1, 15), 12.0), (ts(1, 20), 150.0))
    q.processAllAvailable()
    val rows = spark.table("psi_test")
      .select(col("window_start"), col("bucket"), col("cnt"))
      .as[(Timestamp, Long, Long)].collect().toSeq
    q.stop()
    // 150.0 clamps into the last bucket (same as the batch psiBuckets clamp)
    assert(rows.toSet.contains((ts(1, 0), 3L, 1L)))

    val ref = Seq(1L, 1L, 1L, 1L) // uniform reference
    val psis = StreamingMonitor.psiOfWindows(rows, ref)
    assert(psis.size == 2)
    assert(math.abs(psis(0)._2) < 1e-12, s"uniform window should have PSI 0, got ${psis(0)._2}")
    assert(psis(1)._2 > 0.25, s"drifted window should alarm, got ${psis(1)._2}")

    // bootstrap the same monitor from a PERSISTED reference (last month's
    // scan): build from a uniform batch frame, save, load, feed refCounts in
    import graft.scan.Drift
    val uniform = Seq(10.0, 30.0, 60.0, 90.0).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("psi-stream-ref").toString
    Drift.savePsiReference(spark, Drift.buildPsiReference(uniform, "v", 0.0, 100.0, 4), dir)
    val loaded = Drift.loadPsiReference(spark, dir)
    assert(loaded.refCounts == ref, "scan of the uniform frame is the uniform reference")
    val psisBoot = StreamingMonitor.psiOfWindows(rows, loaded.refCounts)
    assert(psisBoot == psis, "persisted-reference bootstrap must reproduce the monitor")
  }

  test("kafka adapter: raw-frame normalization matches the envelope contract end-to-end") {
    import spark.implicits._
    import graft.streaming.StreamLog
    import org.apache.spark.sql.types.StructType
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val payloads = Seq(
      (ts(0), """{"event_type":"click","value":1.5}"""),
      (ts(1), """{"event_type":"view","value":2.5}"""))
    // the raw frame as the kafka source emits it: BINARY key/value + timestampType
    val raw = payloads.zipWithIndex.map { case ((t, v), i) =>
      (s"k$i".getBytes("UTF-8"), v.getBytes("UTF-8"), "events", 0, i.toLong, t, 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    assert(raw.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      StreamLog.KafkaLogSource.rawSchema.fields.map(f => (f.name, f.dataType)).toSeq)

    val env = StreamLog.KafkaLogSource.normalize(raw)
    // exact envelope contract: same columns, same types as every other adapter
    assert(env.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      StreamLog.envelopeSchema.fields.map(f => (f.name, f.dataType)).toSeq)

    // parity: the normalized kafka frame parses identically to the same
    // payloads through the file-backed segment source
    val dir = java.nio.file.Files.createTempDirectory("kafka-parity").toString
    StreamLog.appendSegment(spark, dir, payloads.zipWithIndex.map { case ((t, v), i) =>
      (s"k$i", v, "events", 0, i.toLong, t)
    })
    val schema = StructType.fromDDL("event_type STRING, value DOUBLE")
    val viaKafka = StreamLog.parsed(env, schema)
      .orderBy("offset").collect().toSeq
    val viaFile = StreamLog.parsed(StreamLog.FileLogSource(dir).batch(spark), schema)
      .orderBy("offset").collect().toSeq
    assert(viaKafka == viaFile)
  }

  test("streaming bottom-k sample: admissions superset recovers the batch sample exactly, any batching") {
    import spark.implicits._
    import graft.ops.Sampling
    import graft.streaming.StreamingSample
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // two keys, 40 ids each — k=5 forces churn (later small-hash arrivals
    // displace earlier admissions)
    val rows = (0 until 80).map(i => (ts(i % 50), if (i % 2 == 0) "en" else "de", i.toLong))
    val all = rows.toDF("ts", "lang", "doc_id")
    val batchSample = Sampling.topNPerKeyExact(all, "lang", "doc_id", n = 5)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(batchSample.size == 10)

    def streamed(splitAt: Int): (Set[(String, Long)], Long) = {
      val stream = MemoryStream[(Timestamp, String, Long)]
      val df = stream.toDF().toDF("ts", "lang", "doc_id")
      val out = StreamingSample.bottomKAdmissionsStream(spark, df, "ts", "lang",
        "doc_id", k = 5, watermark = "0 seconds")
      val name = s"bk_sample_$splitAt"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      stream.addData(rows.take(splitAt): _*)
      q.processAllAvailable()
      if (splitAt < rows.size) {
        stream.addData(rows.drop(splitAt): _*)
        q.processAllAvailable()
      }
      val adm = spark.table(name)
      val sample = Sampling.topNPerKeyExact(
          adm.select(col("key").as("lang"), col("id").as("doc_id")),
          "lang", "doc_id", n = 5)
        .select("lang", "doc_id").as[(String, Long)].collect().toSet
      val nAdm = adm.count()
      q.stop()
      (sample, nAdm)
    }
    // one batch and a mid-stream split must both recover the batch sample
    val (s1, n1) = streamed(rows.size)
    val (s2, n2) = streamed(37)
    assert(s1 == batchSample, s"one-batch sample $s1 != batch $batchSample")
    assert(s2 == batchSample, s"split sample $s2 != batch $batchSample")
    // admissions are a tight superset: >= the sample, bounded by churn
    assert(n1 >= 10 && n2 >= n1, "splitting can only add early admissions")
    assert(batchSample.subsetOf(s2))
  }

  test("streaming semantic dedup: cross-batch parity with batch semDedup on tight groups") {
    import spark.implicits._
    import graft.ops.{Dedup, Similarity}
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // three TIGHT directions (all-pairs within group over threshold,
    // cross-group ~0): A = ids 1,3,5; B = ids 2,4; C = id 6
    val a1 = Seq(1.0, 0.0, 0.0, 0.0); val a2 = Seq(0.99, 0.01, 0.0, 0.0)
    val b1 = Seq(0.0, 1.0, 0.0, 0.0); val b2 = Seq(0.01, 0.99, 0.0, 0.0)
    val c1 = Seq(0.0, 0.0, 1.0, 0.0)
    val batch1 = Seq((1L, a1), (2L, b1), (3L, a2))
    val batch2 = Seq((4L, b2), (5L, a2), (6L, c1))
    val full = (batch1 ++ batch2).toDF("vec_id", "embedding")

    // batch answer: keep min id per tight component (quality constant)
    val batchKeep = Dedup.semDedup(full, "vec_id", "embedding", threshold = 0.9,
      quality = lit(0.0), ncells = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(batchKeep == Set(1L, 2L, 6L))

    // stream the same rows in two batches against a quantizer trained on
    // batch 1 (= the full corpus's two smallest-id seeds, so cells match)
    val quant = Similarity.trainIvfQuantizer(batch1.toDF("vec_id", "embedding"),
      "vec_id", "embedding", ncells = 2)
    val stream = MemoryStream[(Timestamp, Long, Seq[Double])]
    val df = stream.toDF().toDF("ts", "vec_id", "embedding")
    val out = StreamingDedup.semanticFirstSeenStream(spark, df, "ts", "vec_id",
      "embedding", quant, threshold = 0.9, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append").start()
    stream.addData(batch1.zipWithIndex.map { case ((id, v), i) => (ts(i), id, v) }: _*)
    q.processAllAvailable()
    stream.addData(batch2.zipWithIndex.map { case ((id, v), i) => (ts(10 + i), id, v) }: _*)
    q.processAllAvailable()
    val streamKeep = spark.table("semdedup_stream").select("id").as[Long].collect().toSet
    q.stop()
    assert(streamKeep == batchKeep,
      s"streaming survivors $streamKeep != batch survivors $batchKeep")
  }

  test("state telemetry: ten-member battery behind one scan.yml holds bounded, watermark-evicted state") {
    import spark.implicits._
    import graft.scan.{Drift, Scanner}
    import graft.streaming.StreamingTelemetry
    implicit val sqlCtx = spark.sqlContext

    val refDir = java.nio.file.Files.createTempDirectory("battery-telemetry").toString
    (1 to 20).map(_.toDouble).toDF("v").write.parquet(s"$refDir/vals")
    (Seq.fill(8)("a") ++ Seq.fill(4)("b")).toDF("cat").write.parquet(s"$refDir/cats")
    Drift.savePsiReference(spark, Drift.buildPsiReference(
      (1 to 20).map(_.toDouble).toDF("v"), "v", 0.0, 100.0, 4), s"$refDir/psi")

    val yaml =
      s"""table_name: events
         |stream:
         |  time_column: ts
         |  watermark: 10 minutes
         |  window: 1 hour
         |columns:
         |  v:
         |    ks_reference: $refDir/vals
         |    mwu_reference: $refDir/vals
         |    w1_reference: $refDir/vals
         |    cvm_reference: $refDir/vals
         |    energy_reference: $refDir/vals
         |    ad_reference: $refDir/vals
         |    mood_scale_reference: $refDir/vals
         |    welch_reference: $refDir/vals
         |    psi_reference: $refDir/psi
         |  cat:
         |    chi2_reference: $refDir/cats
         |""".stripMargin

    val stream = MemoryStream[(Timestamp, Double, String)]
    val df = stream.toDF().toDF("ts", "v", "cat")
    val scan = Scanner.executeStreamYaml(spark, df, yaml)
    // the SHARED per-column sample feed: the six sample-members expose the
    // identical stream INSTANCE (one state store, not six)
    assert(scan.mwu("v")._2 eq scan.w1("v")._2)
    assert(scan.mwu("v")._2 eq scan.cvm("v")._2)
    assert(scan.mwu("v")._2 eq scan.energy("v")._2)
    assert(scan.mwu("v")._2 eq scan.ad("v")._2)
    assert(scan.mwu("v")._2 eq scan.moodScale("v")._2)

    val rec = StreamingTelemetry.attach(spark)
    try {
      def start(name: String, d: org.apache.spark.sql.DataFrame) =
        d.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
      // four physical state stores serve all ten members: the shared
      // sample feed (KS/MWU/W1/CvM/energy/AD/Mood-scale), the Welch
      // moment stream, the chi2 count stream, the PSI bucket stream
      val qs = Seq(
        start("bat_sample", scan.mwu("v")._2),
        start("bat_welch", scan.welch("v")._2),
        start("bat_chi2", scan.chi2("cat")._2),
        start("bat_psi", scan.psi("v")._2))
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      def rows(h: Int) = (1 to 12).map(i =>
        (ts(h, i), i.toDouble + h, if (i % 3 == 0) "b" else "a"))
      stream.addData(rows(0) ++ rows(1)); qs.foreach(_.processAllAvailable())
      stream.addData(rows(5)); qs.foreach(_.processAllAvailable())
      stream.addData(rows(9)); qs.foreach(_.processAllAvailable())
      qs.foreach(_.stop())

      for (name <- Seq("bat_sample", "bat_welch", "bat_chi2", "bat_psi")) {
        val ms = rec.snapshot.filter(_.query == name)
        assert(ms.nonEmpty, s"$name: no state telemetry captured")
        assert(ms.exists(_.metric == "state_memory_bytes"), s"$name: no memory metric")
        // the watermark EVICTED closed windows (append mode) — the state
        // trajectory is a sawtooth, not a ramp
        val removed = ms.filter(_.metric == "state_rows_removed").map(_.value).sum
        assert(removed > 0, s"$name: watermark never evicted state rows")
        // bounded end state: only the still-open windows remain (2 windows
        // × ≤4 categories/buckets for the widest store)
        val lastBatch = ms.map(_.batch_id).max
        val lastRows = ms.filter(m =>
          m.batch_id == lastBatch && m.metric == "state_rows_total")
          .map(_.value).max
        assert(lastRows <= 8, s"$name: unbounded state trajectory ($lastRows rows)")
      }
    } finally StreamingTelemetry.detach(spark, rec)
  }

  test("state telemetry: vwap/ohlc bars twins evict closed windows under the watermark") {
    import spark.implicits._
    import graft.ops.Windows
    import graft.streaming.StreamingTelemetry
    implicit val sqlCtx = spark.sqlContext

    val rec = StreamingTelemetry.attach(spark)
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      val vwapIn = MemoryStream[(Timestamp, String, Double, Long)]
      val ohlcIn = MemoryStream[(Timestamp, String, Double)]
      val qv = Windows.vwapBarsStream(vwapIn.toDF().toDF("ts", "k", "v", "w"),
          "k", "ts", "v", "w", windowSeconds = 3600, watermark = "10 minutes")
        .writeStream.format("memory").queryName("tel_vwap")
        .outputMode("append").start()
      val qo = Windows.ohlcBarsStream(ohlcIn.toDF().toDF("ts", "k", "v"),
          "k", "ts", "v", windowSeconds = 3600, watermark = "10 minutes")
        .writeStream.format("memory").queryName("tel_ohlc")
        .outputMode("append").start()
      def feed(h: Int): Unit = {
        vwapIn.addData((1 to 6).map(m => (ts(h, m), "k1", m.toDouble, 1L)): _*)
        ohlcIn.addData((1 to 6).map(m => (ts(h, m), "k1", m.toDouble)): _*)
        Seq(qv, qo).foreach(_.processAllAvailable())
      }
      feed(0); feed(1); feed(5); feed(9)
      Seq(qv, qo).foreach(_.stop())

      for (name <- Seq("tel_vwap", "tel_ohlc")) {
        val ms = rec.snapshot.filter(_.query == name)
        assert(ms.nonEmpty, s"$name: no state telemetry captured")
        val removed = ms.filter(_.metric == "state_rows_removed").map(_.value).sum
        assert(removed > 0, s"$name: watermark never evicted bar state")
        val lastBatch = ms.map(_.batch_id).max
        val lastRows = ms.filter(m =>
          m.batch_id == lastBatch && m.metric == "state_rows_total")
          .map(_.value).max
        assert(lastRows <= 2, s"$name: unbounded bar state ($lastRows rows)")
      }
    } finally StreamingTelemetry.detach(spark, rec)
  }

  test("state-size telemetry: per-trigger metrics track forced store growth; state reader gives reps-per-cell") {
    import spark.implicits._
    import graft.ops.Similarity
    import graft.streaming.{StreamingDedup, StreamingTelemetry}
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // forced growth: 16 mutually-novel directions on the unit circle
    // (pairwise cos <= cos(0.3) ~ 0.955 < threshold) — every vector passes
    // and joins its cell's representative list, so state grows every batch
    def v(j: Int): Seq[Double] =
      Seq(math.cos(0.3 * j), math.sin(0.3 * j), 0.0, 0.0)
    val quant = Similarity.trainIvfQuantizer(
      Seq((1L, v(0)), (2L, v(5))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", ncells = 2)

    val rec = StreamingTelemetry.attach(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("telemetry-ckpt").toString
    try {
      val stream = MemoryStream[(Timestamp, Long, Seq[Double])]
      val df = stream.toDF().toDF("ts", "vec_id", "embedding")
      val out = StreamingDedup.semanticFirstSeenStream(spark, df, "ts", "vec_id",
        "embedding", quant, threshold = 0.98, watermark = "0 seconds")
      val q = out.writeStream.format("memory").queryName("telemetry_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      stream.addData((0 until 8).map(j => (ts(j), j.toLong, v(j))): _*)
      q.processAllAvailable()
      stream.addData((8 until 16).map(j => (ts(10 + j), j.toLong, v(j))): _*)
      q.processAllAvailable()
      q.stop()

      // live per-trigger metrics: rows exist, are keyed by batch, and the
      // state MEMORY grows across the two data triggers (row count alone
      // can't see it — flatMapGroupsWithState holds one row per cell)
      val ms = rec.snapshot.filter(_.query == "telemetry_stream")
      assert(ms.nonEmpty, "recorder captured no state metrics")
      val mem = ms.filter(_.metric == "state_memory_bytes")
        .groupBy(_.batch_id).view.mapValues(_.map(_.value).max).toMap
      val dataBatches = mem.keys.toSeq.sorted.take(2)
      assert(dataBatches.size == 2, s"expected 2 data triggers, got $mem")
      assert(mem(dataBatches(1)) > mem(dataBatches(0)),
        s"state memory must grow under forced novel-vector load: $mem")
      val rows = ms.filter(_.metric == "state_rows_total").map(_.value).max
      assert(rows == 2L, s"one state row per cell, got $rows")
      // the recorder frame is monitor-shaped (union into the monitor sink)
      val f = rec.frame(spark)
      assert(f.columns.toSeq ==
        Seq("query", "run_id", "batch_id", "operator", "metric", "value"))
      assert(f.where(col("metric") === "state_memory_bytes").count() >= 2)

      // offline depth: the state reader decodes reps-per-cell exactly —
      // all 16 novel vectors are representatives, split across the 2 cells
      val depth = StreamingTelemetry.semanticStoreDepth(spark, ckpt)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(depth.values.sum == 16L, s"got $depth")
      assert(depth.keys.toSet.subsetOf(Set(0, 1)), s"got $depth")
    } finally StreamingTelemetry.detach(spark, rec)
  }

  test("streaming semantic dedup: persisted representative store seeds and grows") {
    import spark.implicits._
    import graft.ops.{Dedup, Similarity}
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val a1 = Seq(1.0, 0.0, 0.0, 0.0); val a2 = Seq(0.99, 0.01, 0.0, 0.0)
    val b1 = Seq(0.0, 1.0, 0.0, 0.0); val b2 = Seq(0.01, 0.99, 0.0, 0.0)
    val c1 = Seq(0.0, 0.0, 1.0, 0.0); val c2 = Seq(0.0, 0.01, 0.99, 0.0)
    val d1 = Seq(0.0, 0.0, 0.0, 1.0)
    val run1 = Seq((1L, a1), (2L, b1), (3L, a2)).toDF("vec_id", "embedding")
    val quant = Similarity.trainIvfQuantizer(run1, "vec_id", "embedding", ncells = 2)

    // run 1 is a BATCH semDedup pass; its survivors persist as the store
    val dir = java.nio.file.Files.createTempDirectory("semstore").toString
    Dedup.semDedup(run1, "vec_id", "embedding", threshold = 0.9,
        quality = lit(0.0), ncells = 2)
      .select("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    assert(store.count() == 2) // reps 1 (A) and 2 (B)

    // run 2 streams NEW batches against the seeded store
    val stream = MemoryStream[(Timestamp, Long, Seq[Double])]
    val df = stream.toDF().toDF("ts", "vec_id", "embedding")
    val out = StreamingDedup.semanticFirstSeenStream(spark, df, "ts", "vec_id",
      "embedding", quant, threshold = 0.9, watermark = "0 seconds",
      initialReps = Some(store))
    val q = out.writeStream.format("memory").queryName("semstore_stream")
      .outputMode("append").start()
    // dups of STORE reps suppress without those vectors ever re-arriving;
    // the new direction C passes and becomes a rep
    stream.addData((ts(0), 10L, a2), (ts(1), 11L, b2), (ts(2), 12L, c1))
    q.processAllAvailable()
    // the store GREW mid-stream: a dup of C (first seen only as id 12)
    // suppresses in a LATER batch; a fresh direction D still passes
    stream.addData((ts(10), 13L, c2), (ts(11), 14L, d1))
    q.processAllAvailable()
    val kept = spark.table("semstore_stream").select("id").as[Long].collect().toSet
    q.stop()
    assert(kept == Set(12L, 14L), s"got $kept")
  }

  test("streaming LOCF gap fill: batch grid minus the open tick, under shuffled cross-batch arrival") {
    import spark.implicits._
    import graft.streaming.StreamingGapFill
    implicit val sqlCtx = spark.sqlContext

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new Timestamp(s * 1000L)
      val step = 60L
      // key a: two obs in tick 0 (65 overrides 10), gap over ticks 1-2,
      // obs in tick 3, obs in tick 5; key b: single tick (stays open)
      val rows = Seq(
        ("a", 10L, 1.0), ("a", 50L, 2.0),
        ("a", 190L, 5.0), ("a", 330L, 7.5),
        ("b", 600L, 9.0))

      // batch reference over the same rows
      val batchDf = rows.toDF("k", "sec", "v")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("v"))
      val batch = Windows.gapFill(batchDf, "k", "ts", "v", step)
        .select(col("key"), (unix_micros(col("grid_ts")) / 60000000L).cast("long").as("tick"),
          col("value"), col("observed"))
        .as[(String, Long, Double, Boolean)].collect().toSet
      // drop each key's LAST tick (the stream's still-open tick)
      val lastTick = batch.groupBy(_._1).map { case (k, s) => k -> s.map(_._2).max }
      val expect = batch.filterNot { case (k, t, _, _) => lastTick(k) == t }

      val stream = MemoryStream[(String, Timestamp, Long, Double)]
      // the shuffle moves events up to the full 600 s span across batches —
      // the allowed lateness must cover it (events beyond it are DROPPED,
      // the documented watermark contract)
      val df = stream.toDF().toDF("k", "ts", "seq", "v")
        .withWatermark("ts", "1000 seconds")
      val q = StreamingGapFill.locfStream(spark, df, "k", "ts", "seq", "v", step)
        .writeStream.format("memory").queryName("locf_stream")
        .outputMode("append").start()

      // distinct timestamps → (ts, seq) order matches batch; shuffle across
      // two batches to exercise the watermark buffer, then flush with a
      // far-future sentinel key
      val timed = rows.zipWithIndex.map { case ((k, s, v), i) => (k, ts(s), i.toLong, v) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(timed)
      stream.addData(shuffled.take(2)); q.processAllAvailable()
      stream.addData(shuffled.drop(2)); q.processAllAvailable()
      stream.addData(("z", ts(100000), 99L, 0.0)); q.processAllAvailable()
      stream.addData(("z", ts(200000), 100L, 0.0)); q.processAllAvailable()

      val got = spark.table("locf_stream").where(col("key") =!= "z")
        .select(col("key"), col("tick"),
          (col("value_fx").cast("double") / 100.0).as("value"), col("observed"))
        .as[(String, Long, Double, Boolean)].collect().toSet
      q.stop()
      assert(got == expect, s"streamed $got vs batch-minus-open $expect")
      // key b never closed its only tick: nothing emitted for it
      assert(!got.exists(_._1 == "b"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
