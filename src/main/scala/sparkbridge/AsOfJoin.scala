// Hosted in an org.apache.spark.sql subpackage because the logical
// node, the strategy, and the physical operator extend private[sql]
// and catalyst-internal surfaces (BinaryExecNode, SparkStrategy,
// Dataset.ofRows) — same rationale as CosineSim.scala.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Logical AS-OF join (SURVEY §2.6 J5, the whole-operator rung of the
  * extension ladder): for each left row, attach `rightValue` from the
  * right row with the same key and the greatest `rightTime` that is
  * <= `leftTime` (ties on time resolved to the greatest value); null
  * when no such row exists. The composed formulation
  * (graft.operators.Relational.asOfJoin — union + window) stays as
  * the parity reference; this node exists so planning is explicit:
  * one co-partitioned exchange per side, per-partition sorts, then a
  * single streaming merge pass with O(1) state — no union blow-up, no
  * window buffering, no unbounded last(ignoreNulls) frame.
  *
  * `outAttr` is produced by this node, not drawn from children —
  * declared via `producedAttributes` so analysis sees no missing
  * input. Both children's attribute sets must be disjoint (the
  * [[AsOf]] builder re-aliases the right side when they are not).
  *
  * `forward` flips the direction: the SMALLEST rightTime >=
  * leftTime wins (ties on time → greatest value, same as backward).
  * `tolerance` (< 0 = unbounded) bounds |rightTime - leftTime| in the
  * time column's NATIVE long units (microseconds for timestamps) —
  * a candidate farther away yields null, exactly pandas
  * merge_asof's tolerance contract.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightValue: Expression, outAttr: Attribute,
    forward: Boolean = false, tolerance: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = left.maxRows
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]] — injected via
  * graft.plans.GraftExtensions (injectPlannerStrategy) or
  * experimental.extraStrategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, out, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, out,
        fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge AS-OF join.
  *
  * Required distribution: both sides clustered on the join keys (one
  * shuffle each, co-partitioned by EnsureRequirements); required
  * ordering: (keys, time) on the left, (keys, time, value) on the
  * right — the extra value key makes the time-tie winner the MAXIMUM
  * value, deterministically, without any per-group buffering. The
  * merge then keeps exactly one candidate row of state per partition:
  * right rows are consumed monotonically (left times are
  * nondecreasing within a key), each same-key row with time <= the
  * current left time replacing the candidate. Null right times never
  * match and are skipped; null left times sort first within their key
  * (before any right row of that key is consumed) and emit null.
  *
  * At 100 TB this is the as-of plan you want: two hash exchanges and
  * two sorts (both spillable, both AQE-coalesced), then a single
  * forward pass — state is one row, not a window frame. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightValue: Expression, outAttr: Attribute,
    forward: Boolean = false, tolerance: Long = -1L)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  // right value sort: ASC in backward mode (the candidate is replaced
  // while time <= leftTime, so the LAST replacement at the winning
  // time carries the max value); DESC in forward mode (the match is
  // the FIRST row with time >= leftTime, so among tied times the max
  // value must come first). Both directions resolve time ties to the
  // maximum value with zero per-group buffering.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending),
        SortOrder(rightValue, if (forward) Descending else Ascending)))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(leftKeys, lOut)
      val rKey = UnsafeProjection.create(rightKeys, rOut)
      val lTime = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTime = UnsafeProjection.create(Seq(rightTime), rOut)
      val rVal = UnsafeProjection.create(Seq(rightValue), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outAttrs, lOut :+ outAttr)
      val joined = new JoinedRow
      val nullVal = InternalRow(null)
      val buf = rIter.buffered
      var candKey: UnsafeRow = null // copies: projections reuse buffers
      var candVal: InternalRow = null
      var candTime: Long = Long.MinValue
      // backward: the greatest rightTime <= leftTime — right rows are
      // consumed while they qualify, each replacing the one-candidate
      // state; tolerance re-checks the winner at emit time (any other
      // same-key row is even EARLIER, so one check suffices).
      def candidateBackward(lrow: InternalRow, lk: UnsafeRow): InternalRow = {
        val ltRow = lTime(lrow)
        val ltNull = ltRow.isNullAt(0)
        val lt = if (ltNull) Long.MinValue else ltRow.getLong(0)
        var advance = true
        while (advance && buf.hasNext) {
          val rk = rKey(buf.head)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) { // earlier key: drain, drop any stale candidate
            buf.next(); candKey = null; candVal = null
          } else if (c > 0) {
            advance = false
          } else if (rTime(buf.head).isNullAt(0)) {
            buf.next() // null time never matches (SQL three-valued <=)
          } else if (!ltNull && rTime(buf.head).getLong(0) <= lt) {
            candTime = rTime(buf.head).getLong(0)
            candVal = rVal(buf.next()).copy()
            candKey = rk.copy()
          } else {
            advance = false
          }
        }
        if (candKey != null && keyOrd.compare(candKey, lk) == 0 &&
          (tolerance < 0L || lt - candTime <= tolerance)) candVal
        else nullVal
      }
      // forward: the SMALLEST rightTime >= leftTime — nothing is
      // buffered at all: rows that can no longer match any CURRENT OR
      // LATER left row (left times are nondecreasing within a key) are
      // drained, and the head row is the match iff same key, time >=
      // leftTime, and within tolerance.
      def candidateForward(lrow: InternalRow, lk: UnsafeRow): InternalRow = {
        val ltRow = lTime(lrow)
        if (ltRow.isNullAt(0)) return nullVal // null time matches nothing
        val lt = ltRow.getLong(0)
        var advance = true
        while (advance && buf.hasNext) {
          val rk = rKey(buf.head)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) buf.next() // earlier key: dead for all later lefts
          else if (c > 0) advance = false
          else if (rTime(buf.head).isNullAt(0)) buf.next() // never matches
          else if (rTime(buf.head).getLong(0) < lt) buf.next() // dead: lt only grows
          else advance = false
        }
        if (!buf.hasNext || keyOrd.compare(rKey(buf.head), lk) != 0) return nullVal
        val rt = rTime(buf.head).getLong(0)
        if (tolerance >= 0L && rt - lt > tolerance) nullVal
        else rVal(buf.head) // peek, not next: later lefts may share it
      }
      def candidateFor(lrow: InternalRow, lk: UnsafeRow): InternalRow =
        if (forward) candidateForward(lrow, lk)
        else candidateBackward(lrow, lk)
      lIter.map { lrow =>
        val lk = lKey(lrow)
        // SQL equality: a null key component matches nothing. Null
        // keys sort first, so not advancing here is safe — later
        // non-null left keys drain any null-key right rows via
        // candidateFor's earlier-key branch.
        val v = if (lk.anyNull) nullVal else candidateFor(lrow, lk)
        resultProj(joined(lrow, v))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Builder: the user-facing construction of [[AsOfJoinPlan]] from
  * DataFrames (Dataset.ofRows is private[sql]). Re-aliases the right
  * side when the two plans share attribute ids (e.g. both derived
  * from the same scan), mirroring Dataset.join's self-join dedup. */
object AsOf {
  private val timeTypes: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  /** @param direction "backward" (greatest rightTs <= leftTs, the
    *                   default) or "forward" (smallest rightTs >=
    *                   leftTs); ties on time → max value either way.
    * @param tolerance  max |rightTs - leftTs| in the time column's
    *                   native long units (MICROSECONDS for timestamp
    *                   columns); negative = unbounded. A candidate
    *                   beyond tolerance yields null, like pandas
    *                   merge_asof. */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTsCol: String, rightTsCol: String, rightValCol: String,
      outCol: String, direction: String = "backward",
      tolerance: Long = -1L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward: $direction")
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(lPlan, key), attr(rPlan, key))
    val (lt, rt) = (attr(lPlan, leftTsCol), attr(rPlan, rightTsCol))
    val rv = attr(rPlan, rightValCol)
    require(lk.dataType == rk.dataType,
      s"key type mismatch: ${lk.dataType} vs ${rk.dataType}")
    require(timeTypes.contains(lt.dataType) && lt.dataType == rt.dataType,
      s"time columns must both be long/timestamp: ${lt.dataType} vs ${rt.dataType}")
    // the exec sorts the right side on the value column (the time-tie
    // rule); a non-orderable value type (map) must fail HERE with a
    // clear message, not at planning with an opaque sort error
    require(RowOrdering.isOrderable(rv.dataType),
      s"right value column $rightValCol has non-orderable type " +
        rv.dataType.catalogString)
    // prune the right side to the three referenced columns HERE:
    // AsOfJoinPlan is opaque to ColumnPruning, and only outAttr from
    // the right ever reaches the output — without this, the right
    // Exchange + Sort would carry every right column
    val rPruned = Project(Seq(rk, rt, rv).distinct, rPlan)
    val out = AttributeReference(outCol, rv.dataType, nullable = true)()
    classic.Dataset.ofRows(spark,
      AsOfJoinPlan(lPlan, rPruned, Seq(lk), Seq(rk), lt, rt, rv, out,
        forward = direction == "forward", tolerance = tolerance))
  }
}
