package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite band-only inner joins
  * (`pt >= lo AND pt <= hi`, no equi conjunct) into a bucketed
  * equi-join — the automatic form of [[graft.operators.RangeJoin]].
  *
  * Spark plans a join whose condition is pure inequalities as a
  * BroadcastNestedLoopJoin: every (left, right) pair is generated and
  * filtered — O(|L|·|R|), the classic range-join scale killer. With a
  * caller-declared bucket width `W`
  * (`spark.graft.rangejoin.bucketWidth`, in the band's own units), the
  * same join becomes:
  *
  *   - point side: one bucket per row, `floorDiv(pt, W)`;
  *   - band side: `explode(sequence(floorDiv(lo, W), floorDiv(hi, W)))`
  *     — `(hi-lo)/W + 1` buckets per row (≤ 2 when W ≥ the band span);
  *   - equi-join on the bucket + the ORIGINAL condition as residual.
  *
  * Each matching pair meets in exactly one bucket (the point's), so no
  * dedup is needed and the rewrite is semantics-preserving for any
  * deterministic bounds. The rule fires only when: the join is inner
  * with no existing cross-side equi conjunct (those plans are already
  * hash-joinable), the point expression and both bounds are
  * deterministic integral expressions, the point references one side
  * only and both bounds only the other, and the width conf is a
  * positive long. Registered via
  * [[GraftExtensions]]' `injectOptimizerRule` (and usable per-session
  * through `spark.experimental.extraOptimizations`).
  *
  * Width choice is the caller's: too small a width multiplies the band
  * side's duplication factor ((hi-lo)/W + 1 rows per band). W at or
  * above the typical band span keeps it ≤ 2 — same contract as
  * `RangeJoin.intervalJoin`, which hard-codes W = the window length.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangejoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try conf.getConfString(WidthKey, "0").toLong catch {
      case _: NumberFormatException => 0L
    }
    if (width <= 0L) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Exact floor division for longs (IntegralDivide truncates toward
    * zero; subtracting the nonneg pmod first makes it floor). */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val xl = asLong(x)
    IntegralDivide(Subtract(xl, Pmod(xl, Literal(w))), Literal(w))
  }

  /** A band conjunct normalized to (point, bound, pointIsLhsOfGte). */
  private def bounds(conjuncts: Seq[Expression]): Seq[(Expression, Expression, Boolean)] =
    conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (a, b, true)  // a >= b: a lower-bounded by b
      case GreaterThan(a, b)        => (a, b, true)
      case LessThanOrEqual(a, b)    => (b, a, true)  // a <= b: b lower-bounded by a
      case LessThan(a, b)           => (b, a, true)
    }

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    def sided(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet) && e.deterministic
    // an existing cross-side equi conjunct already hash-joins — leave it
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sided(a, j.left) && sided(b, j.right)) || (sided(a, j.right) && sided(b, j.left))
      case _ => false
    }
    if (hasEqui) return None

    // lower bounds: pt >= lo; upper bounds: hi >= pt — find a pt with both
    val lows = bounds(conjuncts) // (bigger, smaller)
    val candidates = for {
      (pt, lo, _) <- lows
      (hi, pt2, _) <- lows
      if pt.semanticEquals(pt2) && isIntegral(pt) && isIntegral(lo) && isIntegral(hi)
      (ptSide, bandSide, ptIsLeft) <-
        (if (sided(pt, j.left) && sided(lo, j.right) && sided(hi, j.right))
           Some((j.left, j.right, true))
         else if (sided(pt, j.right) && sided(lo, j.left) && sided(hi, j.left))
           Some((j.right, j.left, false))
         else None).toSeq
    } yield (pt, lo, hi, ptSide, bandSide, ptIsLeft)

    candidates.headOption.map { case (pt, lo, hi, _, bandSide, ptIsLeft) =>
      val bucketAttr = AttributeReference("_graft_rj_bucket", LongType, nullable = false)()
      val gen = Generate(
        Explode(new Sequence(floorDiv(lo, width), floorDiv(hi, width),
          // TimeZoneAwareExpression: unresolved until a zone is pinned,
          // even for integral sequences
          Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr), child = bandSide)
      val newCond = And(EqualTo(floorDiv(pt, width), bucketAttr), j.condition.get)
      val newJoin =
        if (ptIsLeft) Join(j.left, gen, Inner, Some(newCond), j.hint)
        else Join(gen, j.right, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}
