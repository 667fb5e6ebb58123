package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, HintInfo, Join, JoinHint, LogicalPlan, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** GlobalRank's sibling for the OTHER empty-PARTITION-BY funnel: the
  * share-of-total pattern `sum(x) OVER ()` / `count(*) OVER ()` —
  * an aggregate window with no partition, no order and an unbounded
  * frame. Spark plans it as AllTuples: every row shuffles into ONE
  * partition so each can see the global total. But the value is the
  * same for every row, so the scale-correct plan is to aggregate
  * ONCE (distributed, partial aggregation map-side) and broadcast
  * the single-row result back as a cross join — this rewrite does
  * exactly that, as a pure logical transform (no custom exec):
  *
  *   Window([agg OVER ()], Nil, Nil, child)
  *     ==>  child CROSS JOIN broadcast(Aggregate(Nil, [agg], child))
  *
  * The duplicated child subtree is collapsed by ReuseExchange /
  * ReuseSubquery where an exchange sits below, and column pruning
  * strips the aggregate branch to the aggregated columns only.
  *
  * Scope guards: every window expression in the node must be a
  * deterministic, non-DISTINCT, unfiltered AggregateExpression over
  * the full-partition frame (ROWS or RANGE BETWEEN UNBOUNDED
  * PRECEDING AND UNBOUNDED FOLLOWING); streaming children bail (a
  * global aggregate + join has different semantics under a
  * watermark). Floating-point sums: the rewrite folds partial sums
  * in distributed order rather than one task's row order — the same
  * nondeterminism ANY Spark shuffle introduces for float addition;
  * exact (integral/decimal/long) aggregates are bit-identical, which
  * is what the equivalence spec pins. Disable with
  * `spark.graft.globalAgg.enabled=false`.
  */
object GlobalAggRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.globalAgg.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private def fullFrame(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
    case _ => false
  }

  private def rewritable(e: NamedExpression): Option[NamedExpression] = e match {
    case a @ Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(Nil, Nil, frame)), name)
        if fullFrame(frame) && !ae.isDistinct && ae.filter.isEmpty &&
          ae.deterministic =>
      Some(Alias(ae, name)(exprId = a.exprId))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // PlanGuards: the rewrite DUPLICATES the child subtree (one
      // instance feeds the rows, one the total) — a nondeterministic
      // child would evaluate differently in the two instances, making
      // the broadcast total disagree with the joined rows.
      case w @ LogicalWindow(wexprs, Nil, Nil, child, _)
          if wexprs.nonEmpty && !child.isStreaming &&
            PlanGuards.subtreeDeterministic(child) =>
        val aggs = wexprs.map(rewritable)
        if (aggs.forall(_.isDefined)) {
          val total = Aggregate(Nil, aggs.flatten, child)
          // the hint goes straight into JoinHint — EliminateResolvedHint
          // has already run by the time extended optimizer rules fire
          Join(child, total, Cross, None,
            JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
        } else w
    }
  }
}
