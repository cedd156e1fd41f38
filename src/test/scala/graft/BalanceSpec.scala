package graft

import graft.ops.{Balance, Manifest}
import org.apache.spark.sql.functions._

class BalanceSpec extends SparkSpec {
  import spark.implicits._

  // unique order key with heavy duplicates in the "natural" key it embeds,
  // shuffled input partitioning so assignment can't ride input order
  private lazy val rows = (0 until 1000).map { i =>
    val key = (i * 37) % 200
    (key.toLong * 100000L + i, key.toLong, s"payload-$i")
  }.toDF("ord", "key", "payload").repartition(7)

  test("assignFiles: exact sizes, dense ids, contiguous key intervals, no funnel") {
    val assigned = Balance.assignFiles(rows, "ord", targetRows = 96)
    val sizes = assigned.groupBy("file_id")
      .agg(count(lit(1)).as("n"), min("ord").as("lo"), max("ord").as("hi"))
      .orderBy("file_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(sizes.map(_._1).toSeq == (0L until 11L), "dense 0-based ids")
    assert(sizes.init.forall(_._2 == 96L) && sizes.last._2 == 1000L - 96L * 10)
    // files tile the key space: intervals strictly ordered, non-overlapping
    sizes.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"file ${a._1} [${a._3},${a._4}] overlaps ${b._1}")
    }
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("writeBalanced: one physical file per id, aligned maxRecordsPerFile cuts") {
    val dir = java.nio.file.Files.createTempDirectory("balance").toString
    try {
      val n = Balance.writeBalanced(rows, "ord", targetRows = 96, dir)
      assert(n == 11)
      val back = spark.read.parquet(dir)
        .withColumn("file", input_file_name())
      val perFile = back.groupBy("file")
        .agg(count(lit(1)).as("n"), min("ord").as("lo"), max("ord").as("hi"))
        .as[(String, Long, Long, Long)].collect()
      assert(perFile.length == 11, s"expected 11 physical files, got ${perFile.length}")
      assert(perFile.count(_._2 == 96L) == 10 && perFile.count(_._2 == 40L) == 1)
      // disk files keep the contiguous-interval property (sorted by lo)
      perFile.sortBy(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(a._4 < b._3, "file key intervals must not overlap")
      }
      // round-trip: no row lost or duplicated
      assert(back.agg(count(lit(1)), sum("ord")).as[(Long, Long)].first() ==
        rows.agg(count(lit(1)), sum("ord")).as[(Long, Long)].first())
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("balanced layout makes range predicates prunable; unbalanced write is not") {
    val dir1 = java.nio.file.Files.createTempDirectory("balance-yes").toString
    val dir2 = java.nio.file.Files.createTempDirectory("balance-no").toString
    try {
      Balance.writeBalanced(rows, "ord", targetRows = 96, dir1)
      rows.repartition(11).write.mode("overwrite").parquet(dir2) // same file count, hash layout
      def prunable(dir: String): Double = {
        val m = Manifest.fileManifest(spark.read.parquet(dir), Seq("ord"))
        Manifest.layoutAudit(m, Seq(("ord", 0.0, 3000000.0)))
          .select(col("units_prunable").cast("double") / col("units_total"))
          .as[Double].first()
      }
      assert(prunable(dir1) >= 0.8, "ordered files: most prunable for a narrow range")
      assert(prunable(dir2) == 0.0, "hash-layout files all intersect the range")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir1)).deleteRecursively()
      new Directory(new java.io.File(dir2)).deleteRecursively()
    }
  }

  test("targetRowsForBytes: scales inversely with target and stays positive") {
    val t1 = Balance.targetRowsForBytes(rows, targetBytes = 1 << 20)
    val t2 = Balance.targetRowsForBytes(rows, targetBytes = 2 << 20)
    assert(t1 >= 1 && t2 >= t1, s"t1=$t1 t2=$t2")
  }
}
