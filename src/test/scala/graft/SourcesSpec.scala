package graft

import graft.sources.Tables
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "gamma", 100.0))
    .toDF("id", "name", "score")

  val schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType), StructField("score", DoubleType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("data").toString

  test("csv roundtrip with explicit schema") {
    val p = tmp("graft_csv")
    Tables.writeCsv(df, p)
    val back = Tables.csv(spark, p, schema)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("json-lines roundtrip with explicit schema") {
    val p = tmp("graft_json")
    Tables.writeJsonLines(df, p)
    val back = Tables.jsonLines(spark, p, schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("orc roundtrip, partition pruning and filter pushdown") {
    val p = tmp("graft_orc")
    Tables.writeOrc(df.withColumn("part", $"id" % 2), p, partitionBy = Seq("part"))
    val back = Tables.orc(spark, p).where($"part" === 1 && $"id" > 1)
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(3L))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(id,1)"), plan)
  }

  test("binaryFiles + mediaTable: loose media files land typed, globbed, size-capped") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_bin")
    val bmp = graft.ops.Multimodal.Codecs.grayBmp(4, 4, (x, y) => (x * 16 + y) % 256)
    Files.write(dir.resolve("imgA.bmp"), bmp)
    Files.write(dir.resolve("imgB.bmp"), bmp)
    Files.write(dir.resolve("notes.txt"), "hello".getBytes("UTF-8"))
    Files.write(dir.resolve("huge.bmp"), Array.fill[Byte](4096)(1))
    // glob prunes at listing; the size cap drops the oversize payload
    val media = Tables.mediaTable(spark, dir.toString, glob = "*.bmp")
      .where(col("n_bytes") < 4096L)
      .orderBy("media_id").collect()
    assert(media.map(_.getString(0)).toSeq == Seq("imgA", "imgB"))
    // format from CONTENT (magic bytes), not the extension
    assert(media.forall(_.getString(1) == "image/bmp"))
    assert(media.forall(_.getLong(2) == bmp.length.toLong))
    assert(media.forall(r => r.getAs[Array[Byte]](3).sameElements(bmp)))
    // the raw surface exposes path + length for manifest-style audits
    val raw = Tables.binaryFiles(spark, dir.toString, maxLength = bmp.length.toLong)
    assert(raw.count() == 3L) // huge.bmp (4096 B) filtered by the cap
    // a text payload sniffs as octet-stream, not as its extension either
    val txt = Tables.mediaTable(spark, dir.toString, glob = "*.txt").collect()
    assert(txt.length == 1 && txt(0).getString(1) == "application/octet-stream")
  }

  test("partitioned parquet write + read prunes by partition") {
    val p = tmp("graft_parq")
    Tables.writeParquet(df.withColumn("part", $"id" % 2), p, partitionBy = Seq("part"))
    val back = Tables.parquet(spark, p).where($"part" === 1)
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.writeBucketed(df, "bt_left", Seq("id"), 4)
      Tables.writeBucketed(df.withColumnRenamed("score", "score2"), "bt_right", Seq("id"), 4)
      val joined = spark.table("bt_left").join(spark.table("bt_right"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 3)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_left")
      spark.sql("DROP TABLE IF EXISTS bt_right")
    }
  }

  test("nanos timestamp column converts to micros timestamp") {
    val events = Tables.parquet(spark, "/root/testdata/sf0.001/events.parquet", Seq("ts"))
    assert(events.schema("ts").dataType == TimestampType)
    val first = events.orderBy("event_id").select($"ts".cast("string")).as[String].first()
    assert(first.startsWith("2024-01-01 00:09:58.778549"))
  }
}
