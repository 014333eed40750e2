package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rules for the custom as-of node — the `Rule[LogicalPlan]`
 * rung of the extension ladder (injectOptimizerRule; the rules join the
 * operator-optimization fixpoint, so what they expose is then carried
 * further by the STOCK rules: a filter this rule moves below the as-of
 * node continues down Catalyst's own pushdown path until it reaches the
 * parquet scan as a PushedFilter).
 *
 * Catalyst cannot reason through an unknown node: without these rules a
 * `filter` above an as-of join runs AFTER the key shuffle (moving every
 * row the filter would have dropped), and the right child materializes
 * every column even when the query carries one payload field. Both
 * transformations lean on the operator's contract:
 *
 *  - left rows pass through 1:1 (left-outer, no duplication, no drop),
 *    so a deterministic predicate over LEFT columns commutes with the
 *    node — each left row's payload depends only on the right side,
 *    never on other left rows.
 *  - the node reads exactly (rightKey, rightTime, tieBreak, payload)
 *    from its right child, so everything else is prunable.
 */
object PushFilterThroughAsof extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Shrinks the as-of node's carried payload to what the parent Project
  * actually uses, then inserts a right-side Project so the pruned (and
  * the never-needed) right columns stop flowing through the right
  * child's exchange — column pruning, taught to a node the stock
  * ColumnPruning rule cannot see into. */
object PruneAsofColumns extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // payload prune: parent projection decides which payload survives
    case p @ Project(exprs, a: AsofJoinPlan) =>
      val used = AttributeSet(exprs.flatMap(_.references))
      val kept = a.payload.filter(used.contains)
      if (kept.size == a.payload.size) p
      else p.copy(child = a.copy(payload = kept))
    // right-child prune: the node needs only key/time/tieBreak/payload
    case a: AsofJoinPlan =>
      val needed = AttributeSet(
        a.rightKeys.flatMap(_.references) ++ a.rightTime.references ++
          a.tieBreak.references ++ a.payload)
      val keptCols = a.right.output.filter(needed.contains)
      if (keptCols.size == a.right.output.size) a
      else a.copy(right = Project(keptCols, a.right))
  }
}
