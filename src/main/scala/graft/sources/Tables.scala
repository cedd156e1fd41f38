package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Source/sink helpers. The scan engine itself is source-agnostic (it takes a
  * DataFrame, like the reference takes `df` — scan.py:424), these are the
  * standard ingestion paths for the file formats a pipeline meets.
  *
  * Scale notes: schema is always supplied or read from footers — never
  * inferred by a full pass; CSV/JSON readers are single-pass, splittable and
  * predicate/column-prunable by Catalyst downstream.
  */
object Tables {

  /** Parquet read; normalizes timestamp columns named in
    * `nanosTimestampCols` to micros [[TimestampType]] whatever the file
    * encoding: TIMESTAMP(NANOS) stored as int64 (which Spark rejects
    * natively) is integer-divided to micros, and isAdjustedToUTC=false
    * micros (read as TIMESTAMP_NTZ) is cast to the session-zone instant —
    * wall-clock-preserving under the UTC session this library pins.
    */
  def parquet(spark: SparkSession, path: String, nanosTimestampCols: Seq[String] = Nil): DataFrame = {
    if (nanosTimestampCols.nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    nanosTimestampCols.foldLeft(df) { (acc, c) =>
      acc.schema(c).dataType match {
        // `div` = integral division: ns epochs exceed double's 53-bit
        // mantissa, so a double divide here would corrupt timestamps
        case LongType => acc.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case TimestampNTZType => acc.withColumn(c, col(c).cast(TimestampType))
        case _ => acc
      }
    }
  }

  /** CSV with explicit schema (no inference pass). */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines with explicit schema (no inference pass). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Bucketed managed table: co-locates join/agg keys at write time, so
    * later equi-joins/aggregations on `bucketCols` run with NO exchange
    * (verified in `SourcesSpec`). The 100 TB pattern for repeatedly-joined
    * fact tables.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read — columnar footers like parquet (schema from file metadata,
    * predicate/column pushdown via Catalyst), the other columnar landing
    * format warehouse exports arrive in.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Raw-binary ingestion via the built-in `binaryFile` source: one row
    * per file — (path, modificationTime, length, content) — the landing
    * zone for media dropped as loose files rather than parquet columns.
    * Distributed file listing + per-file rows; `glob` prunes at the
    * LISTING (files never open), and `maxLength` guards executors from a
    * stray multi-GB payload (oversize files fail loudly rather than OOM).
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*",
                  maxLength: Long = 256L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .where(col("length") <= maxLength)

  /** [[binaryFiles]] shaped into the multimodal media-table contract:
    * (media_id = filename stem, fmt = magic-byte sniff, n_bytes, payload)
    * — the bridge from a directory of loose media files onto every
    * [[graft.ops.Multimodal]] operator (dHash, fingerprints, decode,
    * near-dup). Format comes from CONTENT, not the file extension —
    * mislabeled uploads land under their true format.
    */
  def mediaTable(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    binaryFiles(spark, path, glob)
      .select(
        regexp_extract(element_at(split(col("path"), "/"), -1),
          "^(.*?)(\\.[^.]*)?$", 1).as("media_id"),
        graft.ops.Multimodal.sniffFormat(col("content")).as("fmt"),
        col("length").as("n_bytes"),
        col("content").as("payload"))
}
