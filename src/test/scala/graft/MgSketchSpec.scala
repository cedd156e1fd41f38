package graft

import graft.functions.MgSketch
import org.apache.spark.sql.functions._

class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int = 1): Seq[(String, Long)] =
    items.toDF("v").repartition(parts)
      .agg(MgSketch.mg(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toSeq

  test("exact and order/layout-independent when distinct <= k") {
    val items = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    val truth = Seq(("a", 100L), ("b", 60L), ("c", 3L))
    assert(sketch(items, k = 8) == truth)
    assert(sketch(scala.util.Random.shuffle(items), k = 8, parts = 7) == truth)
  }

  test("heavy-hitter guarantee: any item with freq > n/(k+1) is retained, counts short by <= n/(k+1)") {
    // 2000 heavy + 3000 singleton tail, k = 9 -> bound = 5000/10 = 500
    val items = Seq.fill(2000)("HEAVY") ++ (0 until 3000).map(i => s"t$i")
    for (parts <- Seq(1, 13)) {
      val out = sketch(scala.util.Random.shuffle(items), k = 9, parts = parts)
      val heavy = out.find(_._1 == "HEAVY")
      assert(heavy.isDefined, s"heavy hitter missed (parts=$parts)")
      val bound = items.size / 10
      assert(heavy.get._2 >= 2000L - bound && heavy.get._2 <= 2000L,
        s"count ${heavy.get._2} outside [${2000 - bound}, 2000]")
      // every retained count is a lower bound within the same slack
      out.foreach { case (item, cnt) =>
        val truth = if (item == "HEAVY") 2000L else 1L
        assert(cnt <= truth && cnt >= truth - bound, s"$item: $cnt vs $truth")
      }
      assert(out.size <= 9)
    }
  }

  test("summary size never exceeds k; nulls skipped") {
    val df = ((0 until 500).map(i => Option(s"v${i % 97}")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("v").repartition(5)
    val out = df.agg(MgSketch.mg(col("v"), 10).as("hh"))
      .select(size(col("hh"))).as[Int].collect()(0)
    assert(out <= 10)
  }
}
