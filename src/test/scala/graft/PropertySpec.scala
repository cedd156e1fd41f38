package graft

import graft.checks.TestEvaluator
import graft.yamllite.{YMap, YamlLite}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private val name = Gen.identifier.map(_.take(12))
    .suchThat(n => n.nonEmpty && n.head.isLetter &&
      !Set("and", "or", "not", "true", "false", "True", "False").contains(n))
  private val smallDouble = Gen.chooseNum(-1e6, 1e6)

  test("TestEvaluator: comparison of literal arithmetic matches Scala semantics") {
    check(Prop.forAll(smallDouble, smallDouble, smallDouble) { (a, b, c) =>
      TestEvaluator.evaluate(s"$a + $b * $c >= $c", Map.empty).passed == (a + b * c >= c)
    })
  }

  test("TestEvaluator: metric lookup round-trips values") {
    check(Prop.forAll(name, smallDouble) { (n, v) =>
      TestEvaluator.evaluate(s"$n == $n", Map(n -> v)).passed &&
        TestEvaluator.referencedMetrics(s"$n > 0") == Seq(n)
    })
  }

  test("YamlLite: flat scalar maps round-trip") {
    val kv = for { k <- name; v <- Gen.alphaNumStr.map(_.take(20)).suchThat(_.nonEmpty) } yield (k, v)
    check(Prop.forAll(Gen.mapOf(kv)) { m =>
      m.isEmpty || {
        val yaml = m.map { case (k, v) => s"$k: $v" }.mkString("\n")
        YamlLite.parse(yaml).asInstanceOf[YMap].entries.view.mapValues(_.asString).toMap == m
      }
    })
  }

  test("YamlLite: list items preserve order") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.map(_.take(15)).suchThat(_.nonEmpty))) { items =>
      val yaml = "vals:\n" + items.map(i => s"- $i").mkString("\n")
      YamlLite.parse(yaml).asMap("vals").asList.map(_.asString) == items
    })
  }
}
