package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst rewrite: a pure range join — `Join(L, R, Inner, v >= lo AND
  * v < hi)` with NO equi conjunct — is planned by Spark as
  * BroadcastNestedLoopJoin (small side) or CartesianProduct (neither side
  * broadcastable): O(|L|·|R|) row comparisons either way. This rule rewrites
  * the logical plan to the bucketized equi-join of
  * [[graft.ops.RangeJoin.pointInRange]] — point side projects
  * `floor(v/w)`, range side explodes `sequence(floor(lo/w), floor(hi/w))` —
  * so the planner sees an EQUI join on the bucket id (hash-partitioned,
  * AQE-planned, skew-splittable) and re-checks the exact predicate on the
  * matches. Identical semantics: a point matches a range in exactly ONE
  * bucket (its own), so no duplicates; null v/lo/hi produce null
  * buckets/empty sequences and are dropped exactly as the original
  * predicate drops them.
  *
  * Opt-in via `spark.graft.rangeJoin.bucketWidth` (> 0 enables; pick a width
  * near the typical range length). Conservative by design: inner joins only,
  * fires only when the condition has BOTH bounds on one attribute-free pair
  * of sides and NO existing equi conjunct (which also makes the rule a
  * fixpoint — its own output contains the bucket equality). Extra conjuncts
  * are preserved in the rewritten join.
  *
  * Register with a new session via [[GraftExtensions]]
  * (`spark.sql.extensions`), or on a live one through
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinBucketRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def width: Double =
    spark.conf.getOption("spark.graft.rangeJoin.bucketWidth").map(_.toDouble).getOrElse(0.0)

  private def refsIn(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j, cond) =>
        val conjuncts = splitConjunctivePredicates(cond)
        findRangePair(conjuncts, left, right) match {
          case None => j
          case Some((v, lo, hi)) =>
            val (pointSide, rangeSide, pointIsLeft) =
              if (refsIn(v, left)) (left, right, true) else (right, left, false)
            val bucketV = Alias(bucketOf(v, w), "__graft_bucket_v")()
            val newPoint = Project(pointSide.output :+ bucketV, pointSide)
            // Sequence is TimeZoneAware: resolution requires an explicit zone
            // even for pure long bounds
            val gen = Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w),
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
            val genOut = gen.elementSchema.map(f =>
              AttributeReference("__graft_bucket_r", f.dataType, f.nullable)())
            val newRange = Generate(gen, Nil, outer = false, None, genOut, rangeSide)
            val newCond = (EqualTo(bucketV.toAttribute, genOut.head) +: conjuncts)
              .reduce[Expression](And)
            val (nl, nr) =
              if (pointIsLeft) (newPoint, newRange: LogicalPlan)
              else (newRange: LogicalPlan, newPoint)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
    }
  }

  /** Cheap pre-check: resolved, no existing cross-side equi conjunct. */
  private def eligible(j: Join, cond: Expression): Boolean =
    j.resolved && cond.resolved && !splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (refsIn(a, j.left) && refsIn(b, j.right)) ||
        (refsIn(a, j.right) && refsIn(b, j.left))
      case _ => false
    }

  /** Find (v, lo, hi) with v ≥ lo and v < hi, v's refs wholly on one side
    * and lo's + hi's wholly on the other.
    */
  private def findRangePair(conjuncts: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    // normalize to (point, bound) forms
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case LessThanOrEqual(b, a)    => (a, b)
    }
    val uppers = conjuncts.collect {
      case LessThan(a, b)    => (a, b)
      case GreaterThan(b, a) => (a, b)
    }
    (for {
      (v1, lo) <- lowers
      (v2, hi) <- uppers
      if v1.semanticEquals(v2) && numeric(v1) && numeric(lo) && numeric(hi)
      sides <- Seq((left, right), (right, left)).find { case (ps, rs) =>
        refsIn(v1, ps) && (lo.references ++ hi.references).nonEmpty &&
          (lo.references ++ hi.references).subsetOf(rs.outputSet)
      }
    } yield (v1, lo, hi)).headOption
  }
}
