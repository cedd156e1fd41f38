package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped streaming source adapters.
  *
  * Every adapter yields the SAME envelope frame — the column set Spark's
  * kafka source produces (key, value, topic, partition, offset, timestamp)
  * — so the streaming operators (StreamingMonitor, StreamingDedup, Windows,
  * RunningQuality) are written once against the envelope and can be pointed
  * at a real Kafka topic (`spark.readStream.format("kafka")`) without
  * touching operator code. In this container there is no Kafka broker, so
  * the shipped adapters are:
  *
  *  - [[FileLogSource]]: a REPLAYABLE file-backed log — JSONL segment files
  *    in a directory, read incrementally by Structured Streaming's file
  *    source (new segments = new micro-batches; `maxFilesPerTrigger`
  *    paces replay). Deterministic: offsets live in the files.
  *  - [[RateLogSource]]: Spark's `rate` source wrapped in the envelope —
  *    an infinite synthetic topic for soak tests.
  *
  * Envelope values are strings (a real Kafka frame carries binary;
  * `CAST(value AS STRING)` is the standard first step there — adapters
  * emit the post-cast shape directly). [[StreamLog.parsed]] applies a JSON
  * payload schema, the analogue of `from_json(CAST(value AS STRING), ...)`.
  */
object StreamLog {

  /** The kafka-source column set (post `CAST(... AS STRING)` on key/value). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** A replayable log behind one interface: `stream` for Structured
    * Streaming, `batch` for the batch view of the same data (backfills,
    * batch/streaming parity tests).
    */
  trait Source {
    def stream(spark: SparkSession): DataFrame
    def batch(spark: SparkSession): DataFrame
  }

  /** File-backed log: a directory of JSONL segment files with envelope
    * fields. Appending a segment file is the "producer"; Structured
    * Streaming picks it up as a micro-batch. `maxFilesPerTrigger` throttles
    * replay to one-segment-per-batch (deterministic re-runs).
    */
  final case class FileLogSource(dir: String, maxFilesPerTrigger: Option[Int] = None)
      extends Source {
    override def stream(spark: SparkSession): DataFrame = {
      val r = spark.readStream.schema(envelopeSchema)
      maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.json(dir)
    }
    override def batch(spark: SparkSession): DataFrame =
      spark.read.schema(envelopeSchema).json(dir)
  }

  /** Rate-source-backed synthetic topic: `rowsPerSecond` envelope rows,
    * offset = the rate source's monotonic value, one partition.
    */
  final case class RateLogSource(rowsPerSecond: Int, topic: String = "rate")
      extends Source {
    private def toEnvelope(df: DataFrame): DataFrame =
      df.select(
        col("value").cast(StringType).as("key"),
        col("value").cast(StringType).as("value"),
        lit(topic).as("topic"),
        lit(0).as("partition"),
        col("value").as("offset"),
        col("timestamp"))
    override def stream(spark: SparkSession): DataFrame =
      toEnvelope(spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load())
    override def batch(spark: SparkSession): DataFrame =
      toEnvelope(spark.range(rowsPerSecond)
        .select(col("id").as("value"), current_timestamp().as("timestamp")))
  }

  /** REAL Kafka topic behind the same envelope: wraps Spark's kafka source
    * (`format("kafka")` — the public `spark-sql-kafka-0-10` connector,
    * resolved by NAME at runtime, so this adapter adds no compile-time
    * dependency) and normalizes its raw frame (binary key/value,
    * timestampType) to [[envelopeSchema]]. Because every operator is
    * written against the envelope, pointing production at a broker is
    * exactly one `Source` swap: `FileLogSource(dir)` →
    * `KafkaLogSource(brokers, topic)` — no operator changes.
    *
    * `batch` is the same topic through the batch kafka reader (bounded by
    * `startingOffsets`/`endingOffsets`) — backfills and batch/streaming
    * parity over the identical normalization. Requires the connector jar
    * on the classpath and a reachable broker at RUN time; absent either,
    * construction still succeeds and `stream`/`batch` fail loudly at
    * `load()` — the file-backed segments remain the test path
    * ([[normalize]] itself is spec'd against a raw-schema frame, no broker
    * needed).
    *
    * @param extraOptions passed through verbatim (e.g.
    *        `kafka.security.protocol`, `maxOffsetsPerTrigger`)
    */
  final case class KafkaLogSource(bootstrapServers: String, topic: String,
                                  startingOffsets: String = "earliest",
                                  extraOptions: Map[String, String] = Map.empty)
      extends Source {
    private def configured[T](r: T, opt: (T, String, String) => T): T = {
      var acc = opt(opt(opt(r, "kafka.bootstrap.servers", bootstrapServers),
        "subscribe", topic), "startingOffsets", startingOffsets)
      extraOptions.foreach { case (k, v) => acc = opt(acc, k, v) }
      acc
    }
    override def stream(spark: SparkSession): DataFrame =
      KafkaLogSource.normalize(
        configured(spark.readStream.format("kafka"),
          (r: org.apache.spark.sql.streaming.DataStreamReader, k: String, v: String) => r.option(k, v))
          .load())
    override def batch(spark: SparkSession): DataFrame =
      KafkaLogSource.normalize(
        configured(spark.read.format("kafka"),
          (r: org.apache.spark.sql.DataFrameReader, k: String, v: String) => r.option(k, v))
          .load())
  }

  object KafkaLogSource {
    /** The raw column set the kafka source emits (key/value BINARY plus
      * timestampType) — what [[normalize]] accepts.
      */
    val rawSchema: StructType = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))

    /** Raw kafka frame → [[envelopeSchema]]: the standard
      * `CAST(key/value AS STRING)` plus dropping `timestampType` — factored
      * out so the normalization is testable without a broker (and reusable
      * on any frame already shaped like the kafka source).
      */
    def normalize(raw: DataFrame): DataFrame =
      raw.select(
        col("key").cast(StringType).as("key"),
        col("value").cast(StringType).as("value"),
        col("topic"),
        col("partition").cast(IntegerType).as("partition"),
        col("offset").cast(LongType).as("offset"),
        col("timestamp").cast(TimestampType).as("timestamp"))
  }

  /** Parse the JSON `value` payload with `schema`, keeping the envelope's
    * event-time timestamp: the standard kafka consumer step
    * (`from_json(CAST(value AS STRING), schema)`), envelope-agnostic.
    *
    * Name collisions: a payload field named `timestamp`/`key`/`offset`
    * SHADOWS the envelope column (the payload's event time is usually the
    * one the consumer wants) — the envelope copy is dropped rather than
    * emitting an ambiguous duplicate column.
    */
  def parsed(envelope: DataFrame, schema: StructType): DataFrame = {
    val payloadNames = schema.fieldNames.toSet
    val envCols = Seq("timestamp", "key", "offset").filterNot(payloadNames).map(col)
    envelope.select(col("timestamp"), col("key"), col("offset"),
        from_json(col("value"), schema).as("payload"))
      .select(envCols ++ schema.fieldNames.toSeq.map(f => col(s"payload.$f")): _*)
  }

  /** Write `rows` as one JSONL segment file into `dir` (the test/backfill
    * "producer" for [[FileLogSource]]) — one atomic segment per call.
    */
  def appendSegment(spark: SparkSession, dir: String, rows: Seq[(String, String, String, Int, Long, java.sql.Timestamp)]): Unit = {
    import spark.implicits._
    rows.toDF("key", "value", "topic", "partition", "offset", "timestamp")
      .coalesce(1).write.mode("append").json(dir)
  }
}
