package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/**
 * As-of join as a FIRST-CLASS plan operator — the full Catalyst extension
 * ladder (custom LogicalPlan node → SparkStrategy → physical SparkPlan,
 * registered through SparkSessionExtensions.injectPlannerStrategy) for
 * the one whole-operator semantic Spark's surface cannot express without
 * either a quadratic non-equi join or the union+window rewrite
 * (operators/Temporal.asOfJoin — kept as the composition baseline; q90
 * and q90b share one oracle, so the two formulations are proven
 * answer-identical).
 *
 * Why a physical operator: the union+window rewrite materializes a
 * unioned relation and pays a full window sort over left+right combined;
 * this node instead declares its needs to the planner —
 * requiredChildDistribution (hash on the key: EnsureRequirements inserts
 * co-partitioning exchanges exactly as for a shuffled join) and
 * requiredChildOrdering ((key, time[, tieBreak]) per side: the planner
 * inserts SortExec only when the child is not already sorted) — and then
 * streams BOTH sorted sides through one forward merge walk per
 * partition: O(|L|+|R|), one buffered candidate row, no per-key pair
 * blowup, no union materialization. Exactly a sort-merge join's cost
 * envelope, with the argmax folded into the walk.
 *
 * Semantics (identical to Temporal.asOfJoin, left-outer): each left row
 * picks the single right row with the greatest (rightTime, tieBreak)
 * at-or-before (`inclusive`) / strictly-before its leftTime, equi-matched
 * on the key; unmatched left rows carry null payload columns.
 */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, tieBreak: Expression,
    payload: Seq[Attribute], inclusive: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]; injected via
  * GraftExtensions (spark.sql.extensions). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.tieBreak, p.payload, p.inclusive,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, tieBreak: Expression,
    payload: Seq[Attribute], inclusive: Boolean,
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** Hash both sides on the equi key — EnsureRequirements co-partitions
    * the children (or reuses an existing compatible partitioning, e.g. a
    * bucketed scan) exactly as it does for SortMergeJoin. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key, time) on the left; (key, time, tieBreak) on the right so that
    * among equal-time right rows the LARGEST tieBreak is walked last and
    * therefore wins — the same determinism rule as the window rewrite. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(tieBreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  protected override def doExecute(): RDD[InternalRow] = {
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of children not co-partitioned: ${lRdd.getNumPartitions} vs " +
        s"${rRdd.getNumPartitions} (EnsureRequirements should have aligned them)")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadAttrs = payload
    val incl = inclusive
    val outAttrs = output
    val outRowsMetric = longMetric("numOutputRows")
    val matchedMetric = longMetric("numMatchedRows")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      // bind payload refs as NULLABLE: the left-outer null row must pass
      // through the projection's null checks, not read zeroed garbage
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ payloadAttrs.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadAttrs.size)

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var rKey: UnsafeRow = if (rRow != null) rKeyProj(rRow).copy() else null
      var candKey: UnsafeRow = null
      var candPayload: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l).copy() // rTimeProj shares no buffer, but l's is reused below
        // advance the right cursor through every row that qualifies for
        // this (non-decreasing) threshold, keeping the last as candidate
        var scanning = rRow != null
        while (scanning) {
          val kc = keyOrd.compare(rKey, lk)
          if (kc > 0) {
            scanning = false // right cursor already past this key
          } else {
            val qualifies = kc < 0 || {
              val tc = timeOrd.compare(rTimeProj(rRow), lt)
              tc < 0 || (incl && tc == 0)
            }
            if (kc == 0 && qualifies) {
              candKey = rKey
              candPayload = payloadProj(rRow).copy()
            }
            if (qualifies) {
              rRow = if (rIter.hasNext) rIter.next() else null
              if (rRow != null) rKey = rKeyProj(rRow).copy() else scanning = false
            } else {
              scanning = false // same key, too new: stop (sorted by time)
            }
          }
        }
        val matched = candKey != null && keyOrd.compare(candKey, lk) == 0
        val p: InternalRow = if (matched) candPayload else nullPayload
        outRowsMetric += 1
        if (matched) matchedMetric += 1
        resultProj(joined(l, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
