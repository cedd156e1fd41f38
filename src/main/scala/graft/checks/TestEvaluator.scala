package graft.checks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, when}

/** Evaluates soda-style test expressions over metric values, e.g.
  * `row_count > 0`, `invalid_percentage == 0`, `sum * 2 >= 100 and missing_count == 0`.
  * (The reference delegates to Python `eval`; graft implements the arithmetic /
  * comparison / boolean subset those tests actually use.)
  */
object TestEvaluator {

  sealed trait Value { def truthy: Boolean }
  final case class Num(v: Double) extends Value { def truthy: Boolean = v != 0.0 }
  final case class Bool(v: Boolean) extends Value { def truthy: Boolean = v }

  final case class Result(passed: Boolean, expressionResult: Value, metricsUsed: Seq[String])

  def referencedMetrics(expression: String): Seq[String] =
    tokenize(expression).collect { case Ident(n) if !keywords(n) => n }.distinct

  def evaluate(expression: String, values: Map[String, Double]): Result = {
    val p = new Parser(tokenize(expression), values)
    val v = p.parseExpr()
    p.expectEnd()
    Result(v.truthy, v, referencedMetrics(expression))
  }

  /** Compiles a test expression to a Catalyst boolean Column — the SAME
    * grammar and double-arithmetic semantics as [[evaluate]], so the
    * streaming scan's per-window verdicts (one projected expression per
    * test, evaluated by codegen over every window row) match what the batch
    * driver evaluation would say on the same metric values. `resolve` maps
    * a metric name to its (double) Column; unknown names throw
    * `NoSuchElementException` AT COMPILE TIME, before any job runs — callers
    * mark such tests skipped, mirroring the batch unmeasured-metric rule.
    * A NULL metric value propagates to a NULL verdict (callers decide the
    * fail-safe).
    */
  def compile(expression: String, resolve: String => Column): Column = {
    val p = new ColumnParser(tokenize(expression), resolve)
    val v = p.parseExpr()
    p.expectEnd()
    v.truthy
  }

  private val keywords = Set("and", "or", "not", "true", "false", "True", "False")

  private sealed trait Tok
  private final case class NumTok(v: Double) extends Tok
  private final case class Ident(name: String) extends Tok
  private final case class Op(s: String) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' || s.charAt(i) == '_')) i += 1
        out += NumTok(s.substring(start, i).replace("_", "").toDouble)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Ident(s.substring(start, i))
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=").contains(two)) { out += Op(two); i += 2 }
        else if ("+-*/%()<>".indexOf(c) >= 0) { out += Op(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"unexpected character '$c' in test expression: $s")
      }
    }
    out.result()
  }

  private final class Parser(toks: Vector[Tok], values: Map[String, Double]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectEnd(): Unit =
      require(pos == toks.length, s"trailing tokens in test expression at $pos")

    def parseExpr(): Value = parseOr()

    private def parseOr(): Value = {
      var v = parseAnd()
      while (peek.contains(Ident("or"))) { next(); val r = parseAnd(); v = Bool(v.truthy || r.truthy) }
      v
    }

    private def parseAnd(): Value = {
      var v = parseNot()
      while (peek.contains(Ident("and"))) { next(); val r = parseNot(); v = Bool(v.truthy && r.truthy) }
      v
    }

    private def parseNot(): Value = peek match {
      case Some(Ident("not")) => next(); Bool(!parseNot().truthy)
      case _ => parseCmp()
    }

    private def parseCmp(): Value = {
      val l = parseAdd()
      peek match {
        case Some(Op(op)) if Set("==", "!=", "<=", ">=", "<", ">").contains(op) =>
          next()
          val r = parseAdd()
          val (a, b) = (asNum(l), asNum(r))
          Bool(op match {
            case "==" => a == b
            case "!=" => a != b
            case "<=" => a <= b
            case ">=" => a >= b
            case "<"  => a < b
            case ">"  => a > b
          })
        case _ => l
      }
    }

    private def parseAdd(): Value = {
      var v = asNum(parseMul())
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); v += asNum(parseMul())
        case Some(Op("-")) => next(); v -= asNum(parseMul())
        case _ => done = true
      }
      Num(v)
    }

    private def parseMul(): Value = {
      var v = asNum(parseUnary())
      var done = false
      while (!done) peek match {
        case Some(Op("*")) => next(); v *= asNum(parseUnary())
        case Some(Op("/")) => next(); v /= asNum(parseUnary())
        case Some(Op("%")) => next(); v %= asNum(parseUnary())
        case _ => done = true
      }
      Num(v)
    }

    private def parseUnary(): Value = peek match {
      case Some(Op("-")) => next(); Num(-asNum(parseUnary()))
      case _ => parseAtom()
    }

    private def parseAtom(): Value = next() match {
      case NumTok(v) => Num(v)
      case Ident(n) if n == "true" || n == "True" => Bool(true)
      case Ident(n) if n == "false" || n == "False" => Bool(false)
      case Ident(n) =>
        Num(values.getOrElse(n, throw new NoSuchElementException(s"name '$n' is not defined")))
      case Op("(") =>
        val v = parseExpr()
        next() match {
          case Op(")") => v
          case other => throw new IllegalArgumentException(s"expected ')', got $other")
        }
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    private def asNum(v: Value): Double = v match {
      case Num(d) => d
      case Bool(b) => if (b) 1.0 else 0.0
    }
  }

  /** Column-typed mirror of [[Value]]: tracks whether a subexpression is
    * numeric or boolean so truthiness/coercion match the interpreter.
    */
  private sealed trait CVal { def truthy: Column; def num: Column }
  private final case class CNum(c: Column) extends CVal {
    def truthy: Column = c =!= lit(0.0)
    def num: Column = c
  }
  private final case class CBool(c: Column) extends CVal {
    def truthy: Column = c
    def num: Column = when(c, lit(1.0)).otherwise(lit(0.0))
  }

  /** Same grammar as [[Parser]], producing Columns. Kept structurally
    * parallel so the two evaluators can't drift.
    */
  private final class ColumnParser(toks: Vector[Tok], resolve: String => Column) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expectEnd(): Unit =
      require(pos == toks.length, s"trailing tokens in test expression at $pos")

    def parseExpr(): CVal = parseOr()

    private def parseOr(): CVal = {
      var v = parseAnd()
      while (peek.contains(Ident("or"))) { next(); val r = parseAnd(); v = CBool(v.truthy || r.truthy) }
      v
    }

    private def parseAnd(): CVal = {
      var v = parseNot()
      while (peek.contains(Ident("and"))) { next(); val r = parseNot(); v = CBool(v.truthy && r.truthy) }
      v
    }

    private def parseNot(): CVal = peek match {
      case Some(Ident("not")) => next(); CBool(!parseNot().truthy)
      case _ => parseCmp()
    }

    private def parseCmp(): CVal = {
      val l = parseAdd()
      peek match {
        case Some(Op(op)) if Set("==", "!=", "<=", ">=", "<", ">").contains(op) =>
          next()
          val r = parseAdd()
          val (a, b) = (l.num, r.num)
          CBool(op match {
            case "==" => a === b
            case "!=" => a =!= b
            case "<=" => a <= b
            case ">=" => a >= b
            case "<"  => a < b
            case ">"  => a > b
          })
        case _ => l
      }
    }

    private def parseAdd(): CVal = {
      var v = parseMul().num
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); v = v + parseMul().num
        case Some(Op("-")) => next(); v = v - parseMul().num
        case _ => done = true
      }
      CNum(v)
    }

    private def parseMul(): CVal = {
      var v = parseUnary().num
      var done = false
      while (!done) peek match {
        case Some(Op("*")) => next(); v = v * parseUnary().num
        case Some(Op("/")) => next(); v = v / parseUnary().num
        case Some(Op("%")) => next(); v = v % parseUnary().num
        case _ => done = true
      }
      CNum(v)
    }

    private def parseUnary(): CVal = peek match {
      case Some(Op("-")) => next(); CNum(-parseUnary().num)
      case _ => parseAtom()
    }

    private def parseAtom(): CVal = next() match {
      case NumTok(v) => CNum(lit(v))
      case Ident(n) if n == "true" || n == "True" => CBool(lit(true))
      case Ident(n) if n == "false" || n == "False" => CBool(lit(false))
      case Ident(n) => CNum(resolve(n))
      case Op("(") =>
        val v = parseExpr()
        next() match {
          case Op(")") => v
          case other => throw new IllegalArgumentException(s"expected ')', got $other")
        }
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }
  }
}
