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
import org.apache.spark.sql.types.DataType

/** GROUPED OFFSET windows (`lag`/`lead OVER (PARTITION BY g ORDER BY
  * …)` — ClickHouse's per-key `runningDifference`/`neighbor()`, the
  * reference's counter-delta idiom per inverter: solarman.py:307
  * polls the cumulative Total-yield register per logger, and turning
  * that monotonic counter into increments is exactly lag(1) per
  * device — s6_counter_delta's idiom, now scale-safe) as a
  * first-class operator — [[GlobalOffsetRewrite]]'s grouped sibling,
  * closing the LAST grouped window class without a scale path (the
  * r14 "grouped offset stays native" decision, reversed in r20 now
  * that the family owns every ingredient).
  *
  * The native plan hash-clusters whole groups
  * (`ClusteredDistribution(part)`): parallelism ceiling = the GROUP
  * COUNT, per-task data = the largest group — 5 order priorities ×
  * 100 TB puts terabytes through single tasks for a computation whose
  * data dependency is a WINDOW OF m ROWS around each row. This exec
  * requires `OrderedDistribution(part-asc ++ order)` — the grouped
  * family's ONE row-balanced range exchange (groups contiguous,
  * segments split freely across partitions) — and closes partition
  * boundaries with [[SlidingAggExec]]'s KEY-GATED boundary-VALUE
  * rings rather than [[GroupedRunningAggExec]]'s segment chain (an
  * offset needs the neighbor VALUE, not an aggregate of the segment):
  *
  *   - pass 1 streams each sorted partition once and ships to the
  *     driver only the PROJECTED offset-input tuples plus the
  *     evaluated partition keys of its first maxLead and last maxLag
  *     rows — O(partitions × maxOffset) value tuples, never rows,
  *     never the corpus;
  *   - the driver stitches them group-AGNOSTICALLY across partitions
  *     (short/empty partitions accumulate — SlidingAgg's stitch
  *     verbatim) into each partition's previous-tail and next-head
  *     windows: the tail/head hold the GLOBAL neighbors, and because
  *     groups are contiguous under the part-asc range order, a row's
  *     same-GROUP m-th neighbor is its global m-th neighbor iff that
  *     entry's evaluated key matches — one O(1) key comparison at the
  *     looked-up depth replaces GroupedRunningAgg's whole driver
  *     chain;
  *   - pass 2 re-streams each sorted partition (shuffle reuse) with a
  *     ring of the last maxLag (value, key) tuples seeded from the
  *     previous tail and a maxLead-row lookahead queue draining into
  *     the next head; each function reads the tuple at its exact
  *     offset and takes the value when the key matches the current
  *     row's, else evaluates its DEFAULT against the current row —
  *     exactly the native frame CLIP at the group edge.
  *
  * Results are bit-identical to the native window whenever (part,
  * order) is a total order; under order ties both engines emit an
  * arbitrary-but-valid same-group neighbor (the family's documented
  * offset contract — the equivalence specs pin total orders).
  *
  * Scope guards mirror GlobalOffset + the grouped family: every
  * window expression a frame-less lag/lead over the node's own
  * (part, order) with a FOLDABLE offset and `ignoreNulls=false`
  * (ignoreNulls needs unbounded lookback — the ring bound dies);
  * |offset| ≤ `spark.graft.groupedOffset.maxOffset` (default 128 —
  * GlobalOffset's precedent; the cap bounds driver traffic at
  * partitions × maxOffset × tuple width, and the byte guards apply
  * on top); partition keys deterministic AND orderable (promoted
  * into RangePartitioning); deterministic order and subtree;
  * non-streaming child (two jobs, one shuffle).
  * `spark.graft.groupedOffset.minBytes` (default `auto` = the
  * session's AQE advisory partition size, 64 MB stock) is the
  * family's small-input cost gate — see [[minBytes]];
  * `spark.graft.groupedOffset.enabled=false` the kill switch /
  * equivalence-spec A/B lever.
  */
object GroupedOffsetRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.groupedOffset.enabled"
  val MaxOffsetKey = "spark.graft.groupedOffset.maxOffset"
  val MinBytesKey = "spark.graft.groupedOffset.minBytes"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private[plans] def maxOffset: Int =
    SQLConf.get.getConfString(MaxOffsetKey, "128").toInt

  /** Small-input cost gate (r21, the r20 verdict's #1b) — consumed by
    * [[DemoteSmallOffsetNodes]] (pre-CBO, AFTER tower merging) and by
    * the split rules, NOT by the rewrite itself: the rewrite always
    * claims the class so [[CombineOffsetNodes]] can merge withColumn
    * towers first. Default `auto` resolves to the session's
    * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (64 MB stock):
    * an input below one advisory partition coalesces to a single
    * post-exchange task, where the operator is the native single-task
    * pass plus the sample/boundary jobs. Explicit numbers (incl. 0 =
    * never demote) override; the asymmetric-cost argument governs
    * everything above the gate. */
  private[plans] def minBytes: Long =
    SQLConf.get.getConfString(MinBytesKey, "auto") match {
      case "auto" => SQLConf.get.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
      case s => s.toLong
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val cap = maxOffset
    plan.transformUp {
      // no size gate HERE (r21): the rewrite always claims the class
      // so [[CombineOffsetNodes]] can merge withColumn towers; the
      // minBytes decision is taken AFTER merging by
      // [[DemoteSmallOffsetNodes]] (pre-CBO), where a lone small-input
      // node returns to ONE native window
      case w @ LogicalWindow(wexprs, part, order, child, _)
          if part.nonEmpty && order.nonEmpty && wexprs.nonEmpty &&
            !child.isStreaming &&
            part.forall(e => e.deterministic && RowOrdering.isOrderable(e.dataType)) &&
            order.forall(_.deterministic) &&
            PlanGuards.subtreeDeterministic(child) =>
        val fns = wexprs.map(GlobalOffsetRewrite.supported(_, part, order, cap))
        if (fns.forall(_.isDefined)) {
          val flat = fns.flatten
          // pass 1 ships each partition's first maxLead AND last
          // maxLag tuples, so the guarded extent is their SUM, not the
          // max — a lag+lead mix (the q54 shape) ships both sides
          // (r20 ADVICE). Ring-tuple width: one projected column per
          // function, plus the evaluated part keys (added by the
          // guard itself).
          val extent = flat.map(f => math.max(0, -f.offset)).max +
            flat.map(f => math.max(0, f.offset)).max
          if (PlanGuards.valueTrafficOk("GroupedOffset", flat.map(_.input),
              part, math.max(extent, 1)))
            GroupedOffsetNode(part, order, flat, child)
          else w
        } else w
    }
  }
}

case class GroupedOffsetNode(
    part: Seq[Expression],
    order: Seq[SortOrder],
    fns: Seq[OffsetFn],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ fns.map(_.attr)
  override def producedAttributes: AttributeSet = AttributeSet(fns.map(_.attr))
  // `fns` is opaque to QueryPlan's product scan — expose the offset
  // INPUT and DEFAULT references so ColumnPruning keeps lagged columns
  // that are neither group nor order keys (the family lesson).
  override def references: AttributeSet =
    AttributeSet(part.flatMap(_.references)) ++
      AttributeSet(order.flatMap(_.references)) ++
      AttributeSet(fns.flatMap(f => f.input.references ++ f.default.references))
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedOffsetNode =
    copy(child = newChild)
}

object GroupedOffsetStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedOffsetNode(part, order, fns, child) =>
      GroupedOffsetExec(part, order, fns, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GroupedOffsetExec(
    part: Seq[Expression],
    order: Seq[SortOrder],
    fns: Seq[OffsetFn],
    child: SparkPlan) extends UnaryExecNode {

  // partition keys promoted Ascending/NullsFirst ahead of the frame
  // order — the grouped family's shared OrderedDistribution, so an
  // offset node stacks on the same exchange as GroupedRank /
  // GroupedRunningAgg / SlidingAgg in a GroupedWindowSplit pile.
  private def fullOrder: Seq[SortOrder] =
    part.map(SortOrder(_, Ascending)) ++ order

  override def output: Seq[Attribute] = child.output ++ fns.map(_.attr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(fullOrder) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(fullOrder)
  override def outputOrdering: Seq[SortOrder] = fullOrder
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val out = output // localized: closures must not capture `this`
    val partExprs = part
    val inputs: Seq[Expression] = fns.map(_.input)
    val defaults: Seq[Expression] = fns.map(_.default)
    val offs: Array[Int] = fns.map(_.offset).toArray
    val types: Array[DataType] = fns.map(_.input.dataType).toArray
    val maxLag = offs.foldLeft(0)((m, o) => math.max(m, -o))
    val maxLead = offs.foldLeft(0)((m, o) => math.max(m, o))
    val rdd = child.execute()
    val nParts0 = rdd.getNumPartitions
    // pass 1 ships head (maxLead) PLUS tail (maxLag) tuples per
    // partition — warn on the sum (r20 ADVICE)
    PlanGuards.runtimeValueTrafficWarn("GroupedOffset", nParts0,
      inputs, partExprs, math.max(maxLag + maxLead, 1))

    // Pass 1: the projected offset-input tuples (+ evaluated part
    // keys) of each partition's first maxLead and last maxLag rows —
    // values, never rows. The stream retains ROW copies (one
    // byte-array copy per row for the tail ring) and projects only
    // the O(maxOffset) survivors at partition end: a multi-function
    // node (s22's fifteen lags) would otherwise pay its whole
    // projection width on EVERY pass-1 row just to discard it.
    // A SINGLE post-exchange partition (AQE coalescing on a small
    // input) has no boundaries to stitch — every pass-1 fact is
    // vacuous, so the whole boundary job (a full scan of the shuffle
    // output) is skipped outright (r21 fixed-cost trim).
    val ends: Array[(Array[UnsafeRow], Array[UnsafeRow], Array[UnsafeRow], Array[UnsafeRow])] =
      if (nParts0 <= 1)
        Array.fill(nParts0)((Array.empty[UnsafeRow], Array.empty[UnsafeRow],
          Array.empty[UnsafeRow], Array.empty[UnsafeRow]))
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
        val keyProj = UnsafeProjection.create(partExprs, childOut)
        val tail = tailR.toArray(Array.empty[InternalRow])
        (headR.map(r => proj(r).copy()).toArray,
          headR.map(r => keyProj(r).copy()).toArray,
          tail.map(r => proj(r).copy()),
          tail.map(r => keyProj(r).copy()))
      })

    // Driver stitch, group-AGNOSTIC (SlidingAgg's): prevTail(p) = the
    // last maxLag GLOBAL tuples before partition p, nextHead(p) = the
    // first maxLead after it; short/empty partitions accumulate. The
    // key gate in pass 2 does the group clipping — a foreign-group
    // entry at the looked-up depth means the group edge was crossed.
    val nParts = ends.length
    val prevTailV = new Array[Array[UnsafeRow]](nParts)
    val prevTailK = new Array[Array[UnsafeRow]](nParts)
    val nextHeadV = new Array[Array[UnsafeRow]](nParts)
    val nextHeadK = new Array[Array[UnsafeRow]](nParts)
    locally {
      var tV = Vector.empty[UnsafeRow]; var tK = Vector.empty[UnsafeRow]
      var p = 0
      while (p < nParts) {
        prevTailV(p) = tV.toArray; prevTailK(p) = tK.toArray
        val (_, _, lv, lk) = ends(p)
        if (lv.length >= maxLag) { tV = lv.toVector; tK = lk.toVector }
        else {
          tV = (tV ++ lv).takeRight(maxLag)
          tK = (tK ++ lk).takeRight(maxLag)
        }
        p += 1
      }
      var hV = Vector.empty[UnsafeRow]; var hK = Vector.empty[UnsafeRow]
      p = nParts - 1
      while (p >= 0) {
        nextHeadV(p) = hV.toArray; nextHeadK(p) = hK.toArray
        val (fv, fk, _, _) = ends(p)
        if (fv.length >= maxLead) { hV = fv.toVector; hK = fk.toVector }
        else {
          hV = (fv.toVector ++ hV).take(maxLead)
          hK = (fk.toVector ++ hK).take(maxLead)
        }
        p -= 1
      }
    }

    // Pass 2: ring of the last maxLag (value, key) tuples + a
    // maxLead-row lookahead queue. Groups are CONTIGUOUS under the
    // part-asc range order, so the same-group predecessors are a
    // prefix of the global ones: ONE scan per side per row fills a
    // depth/offset-indexed scratch array, stopping at the first
    // foreign-group entry (SlidingAgg's scratch-slice discipline —
    // each function then reads its exact offset O(1), so a 16-lag EMA
    // node costs maxLag steps per row, not Σ depths).
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(inputs, childOut)
      val keyProj = UnsafeProjection.create(partExprs, childOut)
      val defProj = UnsafeProjection.create(defaults, childOut)
      val keyOrd = RowOrdering.create(partExprs.zipWithIndex.map { case (e, i) =>
        SortOrder(BoundReference(i, e.dataType, e.nullable), Ascending)
      }, Seq.empty)
      val toUnsafe = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(offs.length)

      // pastV.head = most recent previous tuple
      val pastV = new java.util.ArrayDeque[UnsafeRow](math.max(maxLag, 1))
      val pastK = new java.util.ArrayDeque[UnsafeRow](math.max(maxLag, 1))
      prevTailV(pid).reverseIterator.foreach(pastV.addLast)
      prevTailK(pid).reverseIterator.foreach(pastK.addLast)
      val ahead = new java.util.ArrayDeque[(InternalRow, UnsafeRow, UnsafeRow)](maxLead + 1)
      val nhV = nextHeadV(pid); val nhK = nextHeadK(pid)

      // per-row scratch: the current row's SAME-GROUP neighbors,
      // directly indexable (1-based; [d] = d rows before/after)
      val pastByDepth = new Array[UnsafeRow](maxLag + 1)
      val futureByOff = new Array[UnsafeRow](maxLead + 1)

      def emit(row: InternalRow, vals: UnsafeRow, key: UnsafeRow,
          futureSame: Int): InternalRow = {
        // one newest-first scan of the past ring: the first foreign
        // key ends the group's slice (contiguity)
        var pastSame = 0
        if (maxLag > 0) {
          val itV = pastV.iterator(); val itK = pastK.iterator()
          var go = true
          while (go && itV.hasNext) {
            val pv = itV.next(); val pk = itK.next()
            if (keyOrd.compare(pk, key) == 0) {
              pastSame += 1
              pastByDepth(pastSame) = pv
            } else go = false
          }
        }
        var defRow: UnsafeRow = null
        var j = 0
        while (j < offs.length) {
          val o = offs(j)
          // the value tuple at fn j's exact offset, null when the
          // neighbor is off-corpus or in a foreign group
          val src: UnsafeRow =
            if (o == 0) vals
            else if (o < 0) { if (-o <= pastSame) pastByDepth(-o) else null }
            else { if (o <= futureSame) futureByOff(o) else null }
          if (src != null) extra.update(j, src.get(j, types(j)))
          else {
            if (defRow == null) defRow = defProj(row)
            extra.update(j, defRow.get(j, defaults(j).dataType))
          }
          j += 1
        }
        if (maxLag > 0) {
          if (pastV.size == maxLag) { pastV.pollLast(); pastK.pollLast() }
          pastV.addFirst(vals)
          pastK.addFirst(key)
        }
        toUnsafe(joined(row, extra))
      }

      if (maxLead == 0) {
        // Lag-only nodes (the runningDifference idiom — the most
        // common shape): the current row is emitted in the same call,
        // so rows stream straight through with NO per-row full-row
        // copy (SlidingAgg's trailing-only discipline); only the
        // projected vals/key tuples are copied, and only because the
        // past ring retains them across calls.
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = {
            val row = it.next()
            val vals = if (maxLag > 0) proj(row).copy() else proj(row)
            val key = if (maxLag > 0) keyProj(row).copy() else keyProj(row)
            emit(row, vals, key, futureSame = 0)
          }
        }
      } else new Iterator[InternalRow] {
        private def fill(): Unit =
          while (ahead.size <= maxLead && it.hasNext) {
            val r = it.next().copy()
            ahead.addLast((r, proj(r).copy(), keyProj(r).copy()))
          }
        override def hasNext: Boolean = { fill(); !ahead.isEmpty }
        override def next(): InternalRow = {
          fill()
          val (row, vals, key) = ahead.pollFirst()
          // one scan of the future side: the queue (offsets 1..) then
          // the stitched next head, stopping at the first foreign key
          var futureSame = 0
          var go = true
          val itA = ahead.iterator()
          while (go && futureSame < maxLead && itA.hasNext) {
            val e = itA.next()
            if (keyOrd.compare(e._3, key) == 0) {
              futureSame += 1
              futureByOff(futureSame) = e._2
            } else go = false
          }
          if (go && futureSame == ahead.size) {
            var idx = 0
            while (go && futureSame < maxLead && idx < nhV.length) {
              if (keyOrd.compare(nhK(idx), key) == 0) {
                futureSame += 1
                futureByOff(futureSame) = nhV(idx)
              } else go = false
              idx += 1
            }
          }
          emit(row, vals, key, futureSame)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedOffsetExec =
    copy(child = newChild)
}
