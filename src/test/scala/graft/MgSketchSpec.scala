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

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.SpaceSaving

  private def sketch(items: Seq[String], k: Int, parts: Int = 1): Seq[(String, Long, Long)] =
    items.toDF("v").repartition(parts)
      .agg(SpaceSaving.ss(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .as[(String, Long, Long)].collect().toSeq

  test("exact with err 0 and order/layout-independent when distinct <= k") {
    val items = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    val truth = Seq(("a", 100L, 0L), ("b", 60L, 0L), ("c", 3L, 0L))
    assert(sketch(items, k = 8) == truth)
    assert(sketch(scala.util.Random.shuffle(items), k = 8, parts = 7) == truth)
  }

  test("per-item error certificate: cnt is an upper bound, cnt - err a lower bound") {
    // 2000 heavy + 3000 singleton tail, k = 9 -> bound = 5000/9
    val items = Seq.fill(2000)("HEAVY") ++ (0 until 3000).map(i => s"t$i")
    for (parts <- Seq(1, 13)) {
      val out = sketch(scala.util.Random.shuffle(items), k = 9, parts = parts)
      assert(out.size <= 9)
      val heavy = out.find(_._1 == "HEAVY")
      assert(heavy.isDefined, s"heavy hitter missed (parts=$parts)")
      out.foreach { case (item, cnt, err) =>
        val truth = if (item == "HEAVY") 2000L else 1L
        assert(err >= 0L, s"$item err $err")
        assert(cnt >= truth, s"$item: upper bound $cnt < truth $truth (parts=$parts)")
        assert(cnt - err <= truth, s"$item: lower bound ${cnt - err} > truth $truth (parts=$parts)")
        assert(err <= items.size.toLong / 9 + 1, s"$item err $err exceeds n/k (parts=$parts)")
      }
    }
  }

  test("tighter than Misra-Gries at equal k on the adversarial heavy+tail stream") {
    // heavy item first, then a long singleton tail: decrement-all erodes the
    // heavy count by the tail mass; overwrite-min never touches the maximum
    val items = Seq.fill(2000)("HEAVY") ++ (0 until 3000).map(i => s"t$i")
    val ss = sketch(items, k = 9).find(_._1 == "HEAVY").get
    assert(ss._2 == 2000L && ss._3 == 0L, s"SS heavy should be exact: $ss")
    val mgHeavy = items.toDF("v").coalesce(1)
      .agg(MgSketch.mg(col("v"), 9).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt")).as[(String, Long)]
      .collect().find(_._1 == "HEAVY").get._2
    assert(mgHeavy < 2000L, s"MG heavy count $mgHeavy should be eroded by the tail")
  }

  test("summary size never exceeds k; nulls skipped; merge keeps top upper bounds") {
    val df = ((0 until 500).map(i => Option(s"v${i % 97}")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("v").repartition(5)
    val out = df.agg(SpaceSaving.ss(col("v"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .as[(String, Long, Long)].collect()
    assert(out.length <= 10)
    // every v% value occurs 5 or 6 times; bounds must bracket that
    out.foreach { case (item, cnt, err) =>
      val truth = if (item.drop(1).toInt < 500 % 97) 6L else 5L
      assert(cnt >= truth && cnt - err <= truth, s"$item: [$cnt - $err, $cnt] vs $truth")
    }
  }
}
