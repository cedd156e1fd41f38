package graft

import graft.ops.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("prefixSum matches the driver-side scan for any partitioning") {
    val vals = (0 until 997).map(i => (i.toLong, ((i * 37) % 50 + 1).toLong))
    val expected = vals.map(_._2).scanLeft(0L)(_ + _).init
    for (parts <- Seq(1, 5, 32)) {
      val got = Packing.prefixSum(
        vals.toDF("id", "n").repartition(13), "id", col("n"), "cs", numPartitions = parts)
        .orderBy("id").select("cs").as[Long].collect()
      assert(got.toSeq == expected, s"numPartitions=$parts")
    }
  }

  test("prefixSum plan has no single-partition global window") {
    val df = Packing.prefixSum((0 until 100).map(i => (i.toLong, 1L)).toDF("id", "n"),
      "id", col("n"), "cs", numPartitions = 4)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("packIndex chunk arithmetic, including empty documents") {
    // token counts 100, 0, 60, 100 with budget 64:
    // starts 0, 100, 100, 160 -> chunks [0,1], null, [1,2], [2,4]
    val df = Seq((1L, 100L), (2L, 0L), (3L, 60L), (4L, 100L)).toDF("doc_id", "n")
    val out = Packing.packIndex(df.withColumn("text", lit("unused")), "doc_id", "text",
      budget = 64, tokenCount = Some(col("n")))
      .orderBy("doc_id")
      .select("tok_start", "first_chunk", "last_chunk", "chunk_offset")
      .collect()
    assert(out(0).getLong(0) == 0L && out(0).getLong(1) == 0L && out(0).getLong(2) == 1L && out(0).getLong(3) == 0L)
    assert(out(1).getLong(0) == 100L && out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(out(2).getLong(0) == 100L && out(2).getLong(1) == 1L && out(2).getLong(2) == 2L && out(2).getLong(3) == 36L)
    assert(out(3).getLong(0) == 160L && out(3).getLong(1) == 2L && out(3).getLong(2) == 4L && out(3).getLong(3) == 32L)
  }
}
