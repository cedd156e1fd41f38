package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shard packaging — the delivery format a multimodal
  * training job actually streams: N roughly-`targetShardBytes` `.tar`
  * archives of (name, payload) entries, read sequentially by data loaders.
  * The last mile AFTER curation (dedup → quality → sample → pack): rows go
  * in as (name, binary) pairs and come out as shard rows / real `.tar`
  * files; [[graft.functions.TarCodec]] is the byte layer (pure-JVM ustar,
  * deterministic headers — byte-identical shards from identical input).
  *
  * Scale shape: shard ASSIGNMENT is the two-phase distributed prefix sum
  * over tar-layout bytes ([[Packing.prefixSum]] — no global sort, no
  * single-partition window); each shard's entries then collect in ONE
  * shard-keyed shuffle and pack row-locally (one static-call codegen'd
  * expression per shard row). Shard payload memory is bounded by
  * `targetShardBytes` — size shards to executor memory (the usual
  * WebDataset 100 MB - 1 GB range is fine).
  */
object TarShards {

  /** Assemble (name, payload) rows into tar shard rows. Entries are laid
    * out in ascending `nameCol` order; a shard closes when its cumulative
    * ustar layout size (512-byte header + 512-padded payload per entry)
    * passes `targetShardBytes`, so every shard except the last lands
    * within one entry of the target. Null names/payloads are excluded
    * (triage upstream; a tar entry can encode neither).
    *
    * @return (shard_id, tar (binary), n_entries, tar_bytes).
    */
  def packShards(df: DataFrame, nameCol: String, dataCol: String,
                 targetShardBytes: Long, numPartitions: Int = 0): DataFrame = {
    require(targetShardBytes >= 1024, "targetShardBytes must be >= 1024")
    val sized = df
      .select(col(nameCol).cast(StringType).as("name"), col(dataCol).as("data"))
      .where(col("name").isNotNull && col("data").isNotNull)
      .withColumn("__w",
        lit(512L) + (ceil(octet_length(col("data")).cast(DoubleType) / 512.0) * 512.0).cast(LongType))
    val summed = Packing.prefixSum(sized, "name", col("__w"), "__start", numPartitions)
    summed
      .withColumn("shard_id", expr(s"__start div ${targetShardBytes}L"))
      .groupBy("shard_id")
      .agg(sort_array(collect_list(struct(col("name"), col("data")))).as("__es"))
      .select(col("shard_id"),
        graft.functions.Tar.packEntries(col("__es")).as("tar"),
        size(col("__es")).cast(LongType).as("n_entries"))
      .withColumn("tar_bytes", octet_length(col("tar")).cast(LongType))
  }

  /** SAMPLE-aware shard assembly — the WebDataset grouping contract: a
    * training sample is SEVERAL same-basename entries (0001.jpg +
    * 0001.txt + 0001.json), the loader groups consecutive entries by
    * basename, and a sample split across two shards is silently dropped
    * or corrupted at train time. So assignment must be per SAMPLE, never
    * per entry: each row is one sample (`keyCol` = basename; `parts` maps
    * entry suffix → payload column), the prefix sum runs over whole-sample
    * layout bytes, and a sample's entries always land adjacent (suffix
    * order) in one shard.
    *
    * @return (shard_id, tar, n_samples, n_entries, tar_bytes).
    */
  def packSampleShards(df: DataFrame, keyCol: String,
                       parts: Seq[(String, String)],
                       targetShardBytes: Long, numPartitions: Int = 0): DataFrame = {
    require(parts.nonEmpty, "need at least one (suffix, column) part")
    require(targetShardBytes >= 1024, "targetShardBytes must be >= 1024")
    val entryStructs = parts.map { case (suffix, c) =>
      when(col(c).isNotNull,
        struct(concat(col("__k"), lit(suffix)).as("name"), col(c).as("data")))
    }
    val entryWeights = parts.map { case (_, c) =>
      when(col(c).isNotNull,
        lit(512L) + (ceil(octet_length(col(c)).cast(DoubleType) / 512.0) * 512.0).cast(LongType))
        .otherwise(0L)
    }
    val sized = df
      .select(col(keyCol).cast(StringType).as("__k") +: parts.map(p => col(p._2)): _*)
      .where(col("__k").isNotNull)
      .withColumn("__es",
        filter(array(entryStructs: _*), e => e.isNotNull))
      .withColumn("__w", entryWeights.reduce(_ + _))
      .where(size(col("__es")) > 0)
      .select(col("__k"), col("__es"), col("__w"))
    val summed = Packing.prefixSum(sized, "__k", col("__w"), "__start", numPartitions)
    summed
      .withColumn("shard_id", expr(s"__start div ${targetShardBytes}L"))
      .groupBy("shard_id")
      .agg(sort_array(collect_list(struct(col("__k"), col("__es")))).as("__ss"))
      .select(col("shard_id"),
        graft.functions.Tar.packEntries(
          flatten(transform(col("__ss"), s => s.getField("__es")))).as("tar"),
        size(col("__ss")).cast(LongType).as("n_samples"),
        aggregate(transform(col("__ss"), s => size(s.getField("__es")).cast(LongType)),
          lit(0L), (a, x) => a + x).as("n_entries"))
      .withColumn("tar_bytes", octet_length(col("tar")).cast(LongType))
  }

  /** Shard manifest — the reproducible-delivery artifact: per shard, its
    * entry/byte counts and the xxhash64 of the archive bytes. Commit it
    * next to the shards; [[auditManifest]] re-reads a directory and diffs.
    */
  def manifest(shards: DataFrame, tarCol: String = "tar"): DataFrame =
    shards.select(col("shard_id"),
      coalesce(col("n_entries"),
        size(graft.functions.Tar.entries(col(tarCol))).cast(LongType)).as("n_entries"),
      octet_length(col(tarCol)).cast(LongType).as("tar_bytes"),
      xxhash64(col(tarCol)).as("tar_hash"))

  /** Integrity audit of on-disk shards against a committed manifest:
    * re-hash every `.tar` under `dir`, full-outer diff → one row per
    * discrepancy (missing / extra / hash or size mismatch). Empty = the
    * delivery is exactly what was committed.
    */
  def auditManifest(spark: SparkSession, dir: String,
                    committed: DataFrame): DataFrame = {
    val onDisk = spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar$", 1)
          .cast(LongType).as("shard_id"),
        octet_length(col("content")).cast(LongType).as("disk_bytes"),
        xxhash64(col("content")).as("disk_hash"))
    committed.select(col("shard_id"), col("tar_bytes"), col("tar_hash"))
      .join(onDisk, Seq("shard_id"), "full_outer")
      .withColumn("status",
        when(col("disk_hash").isNull, lit("missing_on_disk"))
          .when(col("tar_hash").isNull, lit("not_in_manifest"))
          .when(col("disk_hash") =!= col("tar_hash"), lit("hash_mismatch"))
          .when(col("disk_bytes") =!= col("tar_bytes"), lit("size_mismatch")))
      .where(col("status").isNotNull)
      .select("shard_id", "status", "tar_bytes", "disk_bytes")
  }

  /** Explode shard rows back to (shard_id, name, data) entries — the
    * inspection/verification path (a training loader reads the `.tar`
    * files directly).
    */
  def readEntries(shards: DataFrame, tarCol: String = "tar"): DataFrame =
    shards
      .select(col("shard_id"), explode(graft.functions.Tar.entries(col(tarCol))).as("__e"))
      .select(col("shard_id"), col("__e.name").as("name"), col("__e.data").as("data"))

  /** Write shard rows as real `shard-NNNNN.tar` files under `dir` (must be
    * a filesystem every executor can reach — shards write where they
    * live). One file per shard row, written with a temp-then-rename so a
    * killed task can't leave a half shard behind.
    */
  def saveAsTarFiles(shards: DataFrame, dir: String, tarCol: String = "tar"): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    shards.select(col("shard_id").cast(LongType), col(tarCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val path = java.nio.file.Paths.get(dir, f"shard-${r.getLong(0)}%05d.tar")
          val tmp = java.nio.file.Paths.get(dir, f".shard-${r.getLong(0)}%05d.tar.tmp")
          java.nio.file.Files.write(tmp, r.getAs[Array[Byte]](1))
          java.nio.file.Files.move(tmp, path,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
  }

  /** Read a directory of `.tar` shards back as entry rows via Spark's
    * built-in `binaryFile` source (shard = the file name) — also the
    * ingest path for EXTERNALLY-produced WebDataset shards.
    */
  def loadTarFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(s"$dir/*.tar")
      .select(regexp_extract(col("path"), "([^/]+)\\.tar$", 1).as("shard"),
        explode(graft.functions.Tar.entries(col("content"))).as("__e"))
      .select(col("shard"), col("__e.name").as("name"), col("__e.data").as("data"))
}
