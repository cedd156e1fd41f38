package graft

import graft.checks.TestEvaluator
import org.apache.spark.sql.functions.col

/** Cross-checks [[TestEvaluator.compile]] (the Catalyst-Column evaluator the
  * streaming scan projects per window) against [[TestEvaluator.evaluate]]
  * (the driver-side interpreter the batch scan uses) — the two share a
  * grammar by construction; this pins that they share SEMANTICS too, over
  * every operator and a grid of metric values including negatives, zeros
  * and non-integers.
  */
class TestEvaluatorColumnSpec extends SparkSpec {
  import spark.implicits._

  private val metricRows: Seq[(Double, Double, Double)] = Seq(
    (100.0, 3.0, 0.0),
    (0.0, 0.0, 0.0),
    (7.5, -2.0, 12.5),
    (1.0, 1.0, 100.0),
    (-4.0, 0.5, 33.3))

  private val expressions = Seq(
    "row_count > 0",
    "invalid_percentage == 0",
    "missing_count <= 3",
    "row_count != 99",
    "missing_count * 2 + 1 == 7",
    "(row_count - 10) / 9 == 10",
    "-missing_count == -3",
    "row_count % 3 == 1",
    "row_count > 0 and missing_count < 5",
    "row_count < 0 or missing_count < 5",
    "not row_count < 0",
    "not (row_count > 0 and invalid_percentage == 0)",
    "true and row_count >= 0 or false",
    "missing_count + invalid_percentage * 2 - row_count / 4 > 1",
    // numeric truthiness: a bare arithmetic expression is a test
    "row_count - 100",
    "missing_count and row_count",
    // booleans coerced to 1.0/0.0 in arithmetic, as in the interpreter
    "(row_count > 0) + (missing_count > 0) == 2")

  test("compiled Column verdicts equal interpreter verdicts on every grid point") {
    val df = metricRows.toDF("row_count", "missing_count", "invalid_percentage")
    val resolve: String => org.apache.spark.sql.Column = {
      case n @ ("row_count" | "missing_count" | "invalid_percentage") => col(n)
      case other => throw new NoSuchElementException(other)
    }
    for (expr <- expressions) {
      val compiled = df
        .select(col("row_count"), col("missing_count"), col("invalid_percentage"),
          TestEvaluator.compile(expr, resolve).as("passed"))
        .as[(Double, Double, Double, Boolean)].collect()
      assert(compiled.length == metricRows.length)
      for ((rc, mc, ip, got) <- compiled) {
        val want = TestEvaluator.evaluate(expr,
          Map("row_count" -> rc, "missing_count" -> mc, "invalid_percentage" -> ip)).passed
        assert(got == want, s"'$expr' on (row_count=$rc, missing_count=$mc, invalid_percentage=$ip)")
      }
    }
  }

  test("unknown metric fails at compile time, before any job") {
    intercept[NoSuchElementException] {
      TestEvaluator.compile("nope > 0", n => throw new NoSuchElementException(n))
    }
  }
}
