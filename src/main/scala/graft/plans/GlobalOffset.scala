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

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private def maxOffset: Int =
    SQLConf.get.getConfString(MaxOffsetKey, "128").toInt

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
        val fns = wexprs.map(supported(_, Nil, order, cap))
        if (fns.forall(_.isDefined)) GlobalOffsetNode(order, fns.flatten, child)
        else w
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

    // Pass 1: per partition, the projected offset-input values of the
    // first maxLead and last maxLag rows — values, not rows. The
    // stream retains ROW copies (one byte-array copy per row for the
    // tail ring) and projects only the O(maxOffset) survivors at
    // partition end: a multi-function node would otherwise pay its
    // whole projection width on EVERY pass-1 row just to discard it
    // (the r20 GroupedOffset lesson, applied to the sibling).
    val ends: Array[(Array[UnsafeRow], Array[UnsafeRow])] =
      rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
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
