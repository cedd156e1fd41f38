package graft

import graft.api.ColumnConfig
import graft.metrics.GroupMetrics
import org.apache.spark.sql.functions._

/** Plan-shape + correctness tests for the top-K group metrics: they must
  * compile to TakeOrderedAndProject (per-partition top-N, merged once), with
  * NO WindowExec anywhere — an unpartitioned window funnels every distinct
  * value of a column through one partition at scale.
  */
class GroupMetricsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    "b", "b", "b", "a", "a", "c", "d", "d", "d", "d", "e"
  ).toDF("v")

  private lazy val nums = Seq(5, 3, 9, 1, 7, 3, 5, 11, 2, 8).toDF("x")

  test("frequentValues: values and ranks") {
    val r = GroupMetrics.frequentValues(df, "v", ColumnConfig(), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(r.toSeq == Seq(("d", 4L, 1), ("b", 3L, 2), ("a", 2L, 3)))
  }

  test("frequentValues: tie-break is by value ascending") {
    val tied = Seq("x", "x", "y", "y", "z").toDF("v")
    val r = GroupMetrics.frequentValues(tied, "v", ColumnConfig(), 2)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(r.toSeq == Seq(("x", 1), ("y", 2)))
  }

  test("minsMaxs: values and ranks") {
    val r = GroupMetrics.minsMaxs(nums, "x", 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(r.toSeq == Seq(
      ("maxs", 1, 11.0), ("maxs", 2, 9.0), ("maxs", 3, 8.0),
      ("mins", 1, 1.0), ("mins", 2, 2.0), ("mins", 3, 3.0)))
  }

  test("top-K plans: TakeOrderedAndProject, no WindowExec") {
    for (plan <- Seq(
      GroupMetrics.frequentValues(df, "v", ColumnConfig(), 3).queryExecution.executedPlan.toString,
      GroupMetrics.minsMaxs(nums, "x", 3).queryExecution.executedPlan.toString)) {
      assert(plan.contains("TakeOrderedAndProject"), plan)
      assert(!plan.contains("Window"), plan)
    }
  }

  test("frequentValues handles fewer distinct values than n") {
    val r = GroupMetrics.frequentValues(Seq("a", "a").toDF("v"), "v", ColumnConfig(), 5).collect()
    assert(r.length == 1 && r(0).getInt(2) == 1)
  }
}
