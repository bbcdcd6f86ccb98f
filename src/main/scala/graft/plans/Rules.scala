package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayIntersect, ArraysOverlap, EqualTo, Expression, GreaterThan,
  Literal, Not, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Optimizer rule: rewrite set-overlap TESTS phrased as intersection
  * counts into the short-circuiting predicate —
  *
  *   size(array_intersect(a, b)) > 0   →  arrays_overlap(a, b)
  *   size(array_intersect(a, b)) = 0   →  NOT arrays_overlap(a, b)
  *
  * `array_intersect` materializes the full intersection (hash set of
  * one side + membership scan of the other, building a result array)
  * only for `size` to reduce it to a boolean; `arrays_overlap` stops
  * at the FIRST common element. For the decontamination filters
  * (Dedup.flagContaminated and the q66 pipeline) — where contaminated
  * docs usually hit on an early shingle — the declarative
  * intersection-count form stays in the API while every plan gets the
  * short-circuit. The rewrite preserves Catalyst's null semantics,
  * firing only when it is provably equivalence-preserving:
  *
  *  - both element types must be non-nullable: with a null element on
  *    one side only, the no-overlap result is `null` for
  *    arrays_overlap but `0` for the intersection count;
  *  - legacy sizeOfNull (size(null) = -1) additionally requires both
  *    inputs non-nullable, since -1 > 0 is false where
  *    arrays_overlap(null, b) is null.
  */
object IntersectNonEmptyToOverlap extends Rule[LogicalPlan] {

  private def rewritable(intersect: ArrayIntersect,
      legacySizeOfNull: Boolean): Boolean = {
    def nonNullElems(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    }
    val Seq(a, b) = intersect.children
    nonNullElems(a) && nonNullElems(b) &&
      (!legacySizeOfNull || (!a.nullable && !b.nullable))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ai: ArrayIntersect, legacy), Literal(0, IntegerType))
          if rewritable(ai, legacy) =>
        ArraysOverlap(ai.children.head, ai.children.last)
      case EqualTo(Size(ai: ArrayIntersect, legacy), Literal(0, IntegerType))
          if rewritable(ai, legacy) =>
        Not(ArraysOverlap(ai.children.head, ai.children.last))
    }
}
