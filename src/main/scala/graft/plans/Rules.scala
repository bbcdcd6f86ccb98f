package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayIntersect, ArraysOverlap, Descending, EqualTo, Expression,
  GetArrayItem, GreaterThan, Literal, Not, Or, ScalarSubquery, Size,
  SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, GlobalLimit, LocalLimit, LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{CosineSim, HyperplaneBuckets}
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

/** Optimizer rule: rewrite exact cosine top-k against a PLAN-TIME
  * LITERAL query vector —
  *
  *   ... ORDER BY cosine_sim(emb, <literal>) DESC [, tiebreak] LIMIT k
  *
  * — into the hyperplane-LSH-pruned plan: a multi-table bucket-
  * collision `Filter` is inserted under the Sort, so the exact-cosine
  * rank runs only over vectors that share a bucket with the query in
  * at least one table, instead of over the whole corpus. At 100 TB
  * the unrewritten plan is a full scan computing n cosines per query;
  * the rewritten plan computes T cheap sign-pattern buckets per row
  * (codegen'd, pushed below the projection by PushDownPredicates) and
  * cosines only for the ~T·n/2^planes candidates.
  *
  * This trades recall for work, so it is an EXPLICIT OPT-IN:
  * the rule only fires when `spark.graft.ann.rewrite` = true —
  * enabling it declares that every literal-query cosine top-k in the
  * session may return approximate results (the standard AQP-switch
  * contract). Sizing knobs, with the same derivations the library
  * uses elsewhere ([[graft.operators.Similarity.planesForSize]] /
  * `lshTablesForRecall`):
  *
  *  - `spark.graft.ann.rewrite.planes` (default 4): planes per table;
  *  - `spark.graft.ann.rewrite.tables` (default 8): tables — more
  *    tables, higher recall, more candidates;
  *  - `spark.graft.ann.rewrite.seed`   (default 93): plane RNG seed.
  *
  * Because the planes are seeded literals and the query vector is a
  * literal, the rewritten plan is fully deterministic: an external
  * oracle (q93) inlines the same plane matrices and reproduces the
  * approximate result EXACTLY. The query side may also be an
  * UNCORRELATED DETERMINISTIC SCALAR SUBQUERY — the "query vector
  * from a lookup" shape (`ORDER BY cosine_sim(emb, (SELECT embedding
  * FROM t WHERE id = :q)) DESC LIMIT k`) — which the rule evaluates
  * driver-side as a bounded one-row planning lookup to derive the
  * bucket predicate ([[queryLiteral]]). The rule never fires when the
  * query side is a joined column (q28's one-row join build, q32/q54's
  * vector-vector self-joins), when the sort is not descending-first
  * on a bare `cosine_sim`, or when there is no limit above the sort;
  * a subtree that already carries a bucket filter is left alone (the
  * rule runs inside fixed-point batches).
  */
object AnnTopKToLshPrune extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.ann.rewrite"
  val PlanesKey = "spark.graft.ann.rewrite.planes"
  val TablesKey = "spark.graft.ann.rewrite.tables"
  val SeedKey = "spark.graft.ann.rewrite.seed"

  /** The query side as an eval()-able literal, when the expression is
    * a plan-time constant OR an uncorrelated, deterministic SCALAR
    * SUBQUERY — "the query vector from a lookup", e.g.
    * `cosine_sim(embedding, (SELECT embedding FROM t WHERE id = 0))`.
    * A subquery side is executed HERE, driver-side (the library's
    * q93/q97 planning-lookup convention, moved inside the optimizer).
    * Only the bucket predicate consumes the evaluated copy; the Sort
    * key keeps the original subquery, which the engine runs once at
    * execution as usual — a deterministic subquery yields the same
    * vector both times, which the determinism guard below makes a
    * requirement rather than a hope. Zero rows (scalar subquery →
    * null) or a null vector → no rewrite.
    *
    * Cost contract, stated honestly: the row count is bounded
    * (take(2)) but the subquery's own cost is whatever the caller
    * wrote — the engine executes that exact subquery at runtime
    * anyway, so the rewrite adds at most ONE extra run of it; and
    * when the rewrite ends up NOT firing (null lookup), each fresh
    * re-optimization of the same DataFrame pays the lookup again.
    * Both are the price of the opt-in switch, on the query shape
    * that opted in. */
  private def queryLiteral(e: Expression): Option[Expression] = e match {
    case _ if e.foldable => Some(e)
    case sq: ScalarSubquery
        if sq.outerAttrs.isEmpty && sq.joinCond.isEmpty &&
          sq.deterministic =>
      val spark = org.apache.spark.sql.SparkSession.active
      val rows =
        org.apache.spark.sql.graft.Bridge.ofRows(spark, sq.plan).take(2)
      if (rows.length == 1 && !rows(0).isNullAt(0))
        Some(Literal.create(rows(0).get(0), sq.dataType))
      else None
    case _ => None
  }

  /** (embedding expr, literal query expr) when exactly one side of the
    * cosine is a resolvable query vector ([[queryLiteral]]) — the
    * shape the bucket prune applies to. */
  private def split(cos: CosineSim): Option[(Expression, Expression)] =
    (queryLiteral(cos.left), queryLiteral(cos.right)) match {
      case (None, Some(q)) => Some((cos.left, q))
      case (Some(q), None) => Some((cos.right, q))
      case _ => None
    }

  /** Fixed-point guard: the pruning filter may have been pushed below
    * intervening projections by PushDownPredicates, so look for ANY
    * Filter carrying a bucket expression in the subtree. */
  private def alreadyPruned(p: LogicalPlan): Boolean = p.exists {
    case Filter(cond, _) => cond.exists(_.isInstanceOf[HyperplaneBuckets])
    case _ => false
  }

  /** Bucket-collision predicate: OR over tables of
    * `bucket_t(emb) = bucket_t(query)`. One single-table
    * HyperplaneBuckets per term keeps total per-row work at exactly
    * tables × planes × dim multiply-adds (no duplicated dot
    * products); the query-side buckets are evaluated here, driver-
    * side, through the SAME kernel, so row and query arithmetic agree
    * bit-for-bit. */
  private def prunePredicate(emb: Expression, qLit: Expression,
      nTables: Int, nPlanes: Int, seed: Long, dim: Int): Expression = {
    val tables = (0 until nTables).map(t =>
      graft.functions.vectors.planeMatrix(seed + t, nPlanes, dim))
    val qBuckets = tables.map { planes =>
      val flat = planes.flatten.toVector
      HyperplaneBuckets(qLit, flat, 1, nPlanes, dim)
        .eval().asInstanceOf[ArrayData].toLongArray()(0)
    }
    tables.zip(qBuckets).map { case (planes, qb) =>
      val flat = planes.flatten.toVector
      EqualTo(
        GetArrayItem(HyperplaneBuckets(emb, flat, 1, nPlanes, dim), Literal(0)),
        Literal(qb)): Expression
    }.reduce(Or(_, _))
  }

  /** Rewrite the Sort's child when the descending-first key is a
    * literal-query cosine; None when the shape doesn't apply. */
  private def prunedSort(s: Sort, nTables: Int, nPlanes: Int,
      seed: Long): Option[Sort] = s match {
    case Sort(SortOrder(cos: CosineSim, Descending, _, _) +: _, true, child, _)
        if !alreadyPruned(child) =>
      split(cos) match {
        case Some((emb, qLit)) if qLit.eval() != null =>
          val dim = qLit.eval().asInstanceOf[ArrayData].numElements()
          val pred = prunePredicate(emb, qLit, nTables, nPlanes, seed, dim)
          Some(s.copy(child = Filter(pred, child)))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val nPlanes = conf.getConfString(PlanesKey, "4").toInt
    val nTables = conf.getConfString(TablesKey, "8").toInt
    val seed = conf.getConfString(SeedKey, "93").toLong
    // loud on bad knobs: planes beyond 62 would silently wrap the
    // Long bucket packing (1L << p is mod-64), degrading pruning
    // without an error anywhere downstream
    require(nPlanes >= 1 && nPlanes <= 62,
      s"$PlanesKey must be in [1, 62]: $nPlanes")
    require(nTables >= 1, s"$TablesKey must be >= 1: $nTables")
    plan.transform {
      // the two post-optimization shapes of ORDER BY … LIMIT k: the
      // projection either sits above the limit or has been pushed
      // between LocalLimit and Sort (PushProjectionThroughLimit)
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s: Sort)) =>
        prunedSort(s, nTables, nPlanes, seed)
          .map(ns => gl.copy(child = ll.copy(child = ns)))
          .getOrElse(gl)
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          p @ org.apache.spark.sql.catalyst.plans.logical.Project(_, s: Sort))) =>
        prunedSort(s, nTables, nPlanes, seed)
          .map(ns => gl.copy(child = ll.copy(child = p.copy(child = ns))))
          .getOrElse(gl)
    }
  }
}
