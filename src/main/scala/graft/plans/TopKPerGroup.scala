package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window => LogicalWindow, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator (SURVEY §2 engine
  * components; the §3 "custom LogicalPlan + Rule + SparkStrategy +
  * SparkPlan" tier): the `filter(row_number().over(partitionBy(g)
  * .orderBy(o)) <= k)` idiom is rewritten by [[TopKRewrite]] into
  * [[TopKPerGroupNode]], planned by [[TopKStrategy]] as a two-phase
  * heap-based physical operator.
  *
  * Why it scales better than the window form: WindowExec must SORT
  * every group completely (O(n log n) per partition, full
  * materialization) before row_number can be filtered; Spark 4's
  * built-in WindowGroupLimit pre-filter still requires that sort on
  * both sides of the shuffle. The heap form keeps only k rows per
  * group at any moment — O(n log k) comparisons, O(groups × k) memory,
  * no sort buffer — and [[TopKPartialExec]] runs BEFORE the shuffle,
  * so at 100 TB the exchange carries at most k rows per (group,
  * input-partition) instead of the full fact table.
  *
  * The rewrite only fires on `row_number` (never `rank`, whose ties
  * can exceed k rows), only on a literal bound, and can be disabled
  * with `spark.graft.topkRewrite.enabled=false` (the A/B lever the
  * equivalence spec uses).
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topkRewrite.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  /** k such that `cond` implies rank <= k, if cond bounds `rank`. */
  private def bound(cond: Expression, rank: Attribute): Option[Int] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val bounds = conjuncts(cond).flatMap {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rank) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rank) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rank) => Some(v)
      case EqualTo(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(v)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(v)
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(v - 1)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }

  /** Matches a Window computing exactly one row_number with the
    * default running row frame. */
  private object RowNumberWindow {
    def unapply(p: LogicalPlan): Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan)] = p match {
      case LogicalWindow(
          Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _) if order.nonEmpty =>
        // Spark's own InsertWindowGroupLimit may already have wrapped
        // the child; strip it — its pre-filter pass requires the very
        // sort this operator exists to avoid.
        val grandchild = child match {
          case WindowGroupLimit(_, _, _, _, c) => c
          case c => c
        }
        Some((alias.toAttribute, part, order, grandchild))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case f @ Filter(cond, RowNumberWindow(rank, part, order, child)) =>
        bound(cond, rank) match {
          case Some(k) if k >= 1 =>
            Filter(cond, TopKPerGroupNode(part, order, k, rank, child))
          case _ => f
        }
      case f @ Filter(cond, Project(projList, RowNumberWindow(rank, part, order, child)))
          if projList.forall(_.isInstanceOf[Attribute]) =>
        bound(cond, rank) match {
          case Some(k) if k >= 1 =>
            Filter(cond, Project(projList, TopKPerGroupNode(part, order, k, rank, child)))
          case _ => f
        }
    }
  }
}

/** Logical grouped top-k: child's rows, at most k per group in
  * `order`, plus the 1-based `rankAttr` (same exprId as the
  * row_number the rewrite replaced, so downstream references bind). */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, rankAttr, child) =>
      val partial = TopKPartialExec(group, order, k, planLater(child))
      TopKFinalExec(group, order, k, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

/** Shared heap kernel: bounded per-group top-k over a partition.
  * Returns group key → the (unsorted) best-k rows. */
private[plans] object TopKKernel {
  def topk(
      it: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int): mutable.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    // PriorityQueue dequeues the MAX of `ord` = the worst-ranked kept
    // row, so a better incoming row evicts it in O(log k).
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case None =>
          val pq = mutable.PriorityQueue.empty[InternalRow](ord)
          pq.enqueue(row.copy())
          heaps.put(key.copy(), pq)
        case Some(pq) =>
          if (pq.size < k) pq.enqueue(row.copy())
          else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
      }
    }
    heaps
  }
}

/** Map-side phase: shrinks each input partition to ≤ k rows per group
  * before the exchange. No distribution requirement, no rank output —
  * pure data reduction (top-k merge is associative, like a partial
  * aggregate). */
case class TopKPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val group = groupExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(group, out)
      val rowOrd = RowOrdering.create(ord, out)
      val toUnsafe = UnsafeProjection.create(out, out)
      TopKKernel.topk(it, keyProj, rowOrd, kk).iterator
        .flatMap(_._2.iterator)
        .map(toUnsafe)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side phase: groups are co-located (clustered distribution →
  * EnsureRequirements inserts the single shuffle), merge the partial
  * top-ks, emit each group's k rows in rank order with the 1-based
  * rank column. */
case class TopKFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val out = output
    val group = groupExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(group, childOut)
      val rowOrd = RowOrdering.create(ord, childOut)
      val toUnsafe = UnsafeProjection.create(out, out)
      val rankRow = new SpecificInternalRow(Seq(IntegerType))
      val joined = new JoinedRow
      TopKKernel.topk(it, keyProj, rowOrd, kk).iterator.flatMap { case (_, pq) =>
        // dequeue yields worst-first; fill the array back-to-front so
        // index order is rank order
        val rows = new Array[InternalRow](pq.size)
        var i = pq.size - 1
        while (i >= 0) { rows(i) = pq.dequeue(); i -= 1 }
        rows.iterator.zipWithIndex.map { case (row, idx) =>
          rankRow.setInt(0, idx + 1)
          toUnsafe(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
