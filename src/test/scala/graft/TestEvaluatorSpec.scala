package graft

import graft.checks.TestEvaluator
import org.scalatest.funsuite.AnyFunSuite

class TestEvaluatorSpec extends AnyFunSuite {
  val vals = Map("row_count" -> 100.0, "missing_count" -> 3.0, "invalid_percentage" -> 0.0)

  test("comparisons") {
    assert(TestEvaluator.evaluate("row_count > 0", vals).passed)
    assert(TestEvaluator.evaluate("invalid_percentage == 0", vals).passed)
    assert(!TestEvaluator.evaluate("missing_count == 0", vals).passed)
    assert(TestEvaluator.evaluate("missing_count <= 3", vals).passed)
    assert(TestEvaluator.evaluate("row_count != 99", vals).passed)
  }

  test("arithmetic and precedence") {
    assert(TestEvaluator.evaluate("missing_count * 2 + 1 == 7", vals).passed)
    assert(TestEvaluator.evaluate("(row_count - 10) / 9 == 10", vals).passed)
    assert(TestEvaluator.evaluate("-missing_count == -3", vals).passed)
  }

  test("boolean connectives") {
    assert(TestEvaluator.evaluate("row_count > 0 and missing_count < 5", vals).passed)
    assert(TestEvaluator.evaluate("row_count < 0 or missing_count < 5", vals).passed)
    assert(TestEvaluator.evaluate("not row_count < 0", vals).passed)
  }

  test("referenced metrics") {
    assert(TestEvaluator.referencedMetrics("a + b > c and not d") == Seq("a", "b", "c", "d"))
  }

  test("unknown metric raises") {
    intercept[NoSuchElementException] {
      TestEvaluator.evaluate("nope > 0", vals)
    }
  }
}
