package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.StringType

/** SQL registration of the custom expressions via the public
  * SparkSessionExtensions API — install with
  * `SparkSession.builder.withExtensions(GraftExtensions)` (done by
  * [[graft.Tables.session]]) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * After installation the operators are first-class SQL:
  * {{{
  *   SELECT simhash64(text), minhash_sig(text, 12, 5) FROM documents
  *   SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  *   SELECT winnow(text, 5, 4) FROM documents
  * }}}
  */
object GraftExtensions extends SparkSessionExtensionsProvider {

  private def intArg(fn: String, pos: Int, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Grouped top-k: optimizer rule rewrites the filter(row_number <= k)
    // idiom into the heap-based two-phase operator; the strategy plans it.
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // Share-of-total: aggregate windows over the full corpus
    // (sum(x) OVER ()) aggregate once and broadcast back instead of
    // funnelling every row through one partition. Injected BEFORE the
    // split/family rewrites (r19): when the full-frame member sits on
    // its OWN spec in a stacked pair — `rank() OVER (ORDER BY o),
    // sum(v) OVER ()` — the agg rewrites must see the sibling while
    // it is still a NATIVE Window (which ExprIdFreshener can copy
    // into the aggregate leg); after a family rewrite it is a custom
    // node the freshener refuses. AggLegPeel makes the common case
    // order-independent (the unneeded sibling is peeled from the leg
    // entirely), but `sum(rankCol) OVER ()` — aggregating the window
    // OUTPUT — is only distributable on this ordering.
    // MixedSpecAggSpec pins both the ordering and the plans.
    ext.injectOptimizerRule(_ => graft.plans.GlobalAggRewrite)
    // Share-of-GROUP: full-frame aggregate windows WITH partition keys
    // (sum(x) OVER (PARTITION BY g)) aggregate distributedly (map-side
    // partial combine) and join back null-safely on the keys — AQE
    // broadcasts the per-group side when small, so the rows never
    // shuffle; a giant group streams through its join task instead of
    // buffering in one window task. Before the splits for the same
    // mixed-SPEC reason as GlobalAggRewrite.
    ext.injectOptimizerRule(_ => graft.plans.GroupedAggRewrite)
    // Mixed-function empty-PARTITION-BY windows (rank()+sum() OVER the
    // same global order in ONE select analyze into ONE Window node) are
    // split by function class into the stacked operator nodes below, so
    // the family composes automatically instead of the mixed node
    // bailing every rewrite and funneling to a single task.
    ext.injectOptimizerRule(_ => graft.plans.GlobalWindowSplit)
    // Mixed GROUPED windows (rank()+sum()+lag() OVER the same
    // PARTITION BY/ORDER BY in ONE select): split onto GroupedRank +
    // GroupedRunningAgg + GroupedOffset over ONE shared (part, order)
    // range exchange — the grouped analog; otherwise-unsupported
    // mixes keep the whole node native.
    ext.injectOptimizerRule(_ => graft.plans.GroupedWindowSplit)
    // Corpus-global ranking: bare rank-family windows with an empty
    // PARTITION BY are rewritten to the range-partitioned two-pass
    // operator (TopKRewrite runs first, so filter(rank <= k) keeps
    // the cheaper heap path; this catches the full rankings).
    ext.injectOptimizerRule(_ => graft.plans.GlobalRankRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GlobalRankStrategy)
    // The 2^31 escape hatch (spark.graft.globalRank.longRank=true):
    // an ANALYZER rule swaps row_number/rank/dense_rank on global
    // windows for LongType variants — analysis-time so the Dataset
    // schema/encoders and downstream coercion all agree on the type;
    // GlobalRankRewrite then recognizes them, and the native
    // WindowExec evaluates them whenever the rewrite bails.
    ext.injectResolutionRule(_ => LongRankWiden)
    // Grouped ranking: rank-family windows WITH partition keys are
    // rewritten to the same range-partitioned two-pass discipline, so
    // a group larger than a task never funnels into one (the operator
    // form of q23/m11's hand idiom; TopKRewrite still wins on
    // filter(rank <= k)).
    ext.injectOptimizerRule(_ => graft.plans.GroupedRankRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedRankStrategy)
    // Grouped RUNNING aggregates (sum(x) OVER (PARTITION BY g ORDER
    // BY …)): GroupedRank's sibling for the aggregate class — the
    // native hash-clustered window's parallelism ceiling is the group
    // count, so groups that outgrow a task funnel; the operator
    // range-partitions (group, order) and chains boundary segments.
    ext.injectOptimizerRule(_ => graft.plans.GroupedRunningAggRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedRunningAggStrategy)
    // Corpus-global offset windows (lag/lead OVER (ORDER BY …)) — the
    // third empty-PARTITION-BY funnel: rewritten to the range
    // exchange + boundary-VALUE exchange instead of the all-rows
    // single-task window.
    ext.injectOptimizerRule(_ => graft.plans.GlobalOffsetRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GlobalOffsetStrategy)
    // GROUPED offset windows (lag/lead OVER (PARTITION BY g ORDER BY
    // …) — per-key runningDifference/neighbor, r20): the native
    // hash-clustered window's parallelism ceiling is the group count,
    // so groups that outgrow a task funnel; the operator
    // range-partitions (group, order) and closes boundaries with
    // SlidingAgg's key-gated boundary-value rings.
    ext.injectOptimizerRule(_ => graft.plans.GroupedOffsetRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedOffsetStrategy)
    // Adjacent offset nodes over the same (part, order) merge into
    // ONE multi-function node (r21): the withColumn-chain idiom
    // analyzes into a window tower CollapseWindow only partially
    // merges, and a stacked offset pile pays pass-1 + pass-2 PER
    // node. Same fixed-point batch as the rewrites and
    // CollapseProject, so towers of any height converge.
    ext.injectOptimizerRule(_ => graft.plans.CombineOffsetNodes)
    // Pre-CBO, AFTER the fixed point settles (so towers are already
    // merged): a LONE offset node whose input sits below the family's
    // small-input gate (minBytes, default `auto` = the advisory
    // partition size) demotes back to ONE native window — the
    // operator's fixed extra jobs buy nothing on an input that
    // coalesces to a single post-exchange task. Stacked members never
    // demote (they share the family's one range exchange). Running
    // here cannot loop with the rewrite (separate batch, Once).
    ext.injectPreCBORule(_ => graft.plans.DemoteSmallOffsetNodes)
    // Corpus-global RUNNING aggregates (sum(x) OVER (ORDER BY …)) —
    // the last empty-PARTITION-BY funnel: a distributed prefix scan
    // (per-partition partials + driver prefix fold + seeded pass).
    ext.injectOptimizerRule(_ => graft.plans.GlobalRunningAggRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GlobalRunningAggStrategy)
    // Adjacent running-agg nodes over the same (part, order) merge
    // into ONE multi-function node (r21 — CombineOffsetNodes' sibling
    // for the running class; s21's fill columns planned THREE stacked
    // nodes, each with its own prefix job and stream pass).
    ext.injectOptimizerRule(_ => graft.plans.CombineRunningNodes)
    // Bounded SLIDING ROWS frames (moving averages / trailing totals,
    // global or grouped): one operator closing both the AllTuples
    // single-task funnel and the group-count ceiling — boundary-VALUE
    // rings (GlobalOffset's machinery) + per-frame aggregate re-folds.
    ext.injectOptimizerRule(_ => graft.plans.SlidingAggRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.SlidingAggStrategy)
    // Bounded RANGE-VALUE sliding frames (trailing-30-day style
    // value windows, global or grouped): the row-halo operator — a
    // distributed executor-to-executor halo shuffle of the
    // boundary-reach rows, closing the last window-frame class with
    // no scale path (the per-window ROW count is unbounded, so the
    // driver-ring discipline doesn't apply).
    ext.injectOptimizerRule(_ => graft.plans.RangeSlidingAggRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.RangeSlidingAggStrategy)
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (args: Seq[Expression]) =>
        Winnow(args(0), intArg("winnow", 1, args(1)), intArg("winnow", 2, args(2)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intArg("minhash_sig", 1, args(1)), intArg("minhash_sig", 2, args(2)))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      (args: Seq[Expression]) =>
        MinHashAgg(args(0), intArg("minhash_agg", 1, args(1)))))
    ext.injectFunction((
      FunctionIdentifier("approx_topk"),
      new ExpressionInfo(classOf[ApproxTopKAgg].getName, "approx_topk"),
      (args: Seq[Expression]) =>
        ApproxTopKAgg(args(0), intArg("approx_topk", 1, args(1)),
          intArg("approx_topk", 2, args(2)))))
    ext.injectFunction((
      FunctionIdentifier("approx_topk_weighted"),
      new ExpressionInfo(classOf[ApproxTopKAgg].getName, "approx_topk_weighted"),
      (args: Seq[Expression]) =>
        ApproxTopKAgg(args(0), intArg("approx_topk_weighted", 2, args(2)),
          intArg("approx_topk_weighted", 3, args(3)), weight = args(1),
          weighted = true)))
    ext.injectFunction((
      FunctionIdentifier("uniq_up_to"),
      new ExpressionInfo(classOf[UniqUpToAgg].getName, "uniq_up_to"),
      (args: Seq[Expression]) =>
        UniqUpToAgg(args(0), intArg("uniq_up_to", 1, args(1)))))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (args: Seq[Expression]) =>
        BloomFilterAgg(args(0), intArg("bloom_agg", 1, args(1)),
          intArg("bloom_agg", 2, args(2)))))
    ext.injectFunction((
      FunctionIdentifier("qdigest_quantiles"),
      new ExpressionInfo(classOf[QDigestAgg].getName, "qdigest_quantiles"),
      (args: Seq[Expression]) => {
        val qs = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            s.toString.split(",").toSeq.map(_.trim.toDouble)
          case other => throw new IllegalArgumentException(
            "qdigest_quantiles: argument 2 must be a comma-separated " +
              s"string literal of quantiles, got $other")
        }
        QDigestAgg(args(0), qs,
          intArg("qdigest_quantiles", 2, args(2)),
          intArg("qdigest_quantiles", 3, args(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("qdigest_state"),
      new ExpressionInfo(classOf[QDigestStateAgg].getName, "qdigest_state"),
      (args: Seq[Expression]) =>
        QDigestStateAgg(args(0), intArg("qdigest_state", 1, args(1)),
          intArg("qdigest_state", 2, args(2)))))
    ext.injectFunction((
      FunctionIdentifier("qdigest_merge_quantiles"),
      new ExpressionInfo(classOf[QDigestMergeAgg].getName, "qdigest_merge_quantiles"),
      (args: Seq[Expression]) => {
        val qs = args(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            s.toString.split(",").toSeq.map(_.trim.toDouble)
          case other => throw new IllegalArgumentException(
            "qdigest_merge_quantiles: argument 2 must be a comma-separated " +
              s"string literal of quantiles, got $other")
        }
        QDigestMergeAgg(args(0), qs,
          intArg("qdigest_merge_quantiles", 2, args(2)),
          intArg("qdigest_merge_quantiles", 3, args(3)))
      }))
    ext.injectFunction((
      FunctionIdentifier("adaptive_histogram"),
      new ExpressionInfo(classOf[HistogramAgg].getName, "adaptive_histogram"),
      (args: Seq[Expression]) =>
        HistogramAgg(args(0), intArg("adaptive_histogram", 1, args(1)))))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (args: Seq[Expression]) => BloomContains(args(0), args(1))))
  }
}

/** Column-API wrappers (resolve through the registered SQL functions,
  * so a session with [[GraftExtensions]] installed is required). */
object GraftFunctions {
  import org.apache.spark.sql.functions.lit
  def simhash64(c: Column): Column = call_function("simhash64", c)
  def winnow(c: Column, k: Int, w: Int): Column =
    call_function("winnow", c, lit(k), lit(w))
  def minhashSig(c: Column, k: Int, shingleLen: Int): Column =
    call_function("minhash_sig", c, lit(k), lit(shingleLen))
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def minhashAgg(shingle: Column, k: Int): Column =
    call_function("minhash_agg", shingle, lit(k))
  def approxTopK(item: Column, k: Int, w: Int): Column =
    call_function("approx_topk", item, lit(k), lit(w))
  def approxTopKWeighted(item: Column, weight: Column, k: Int, w: Int): Column =
    call_function("approx_topk_weighted", item, weight, lit(k), lit(w))
  def uniqUpTo(x: Column, n: Int): Column =
    call_function("uniq_up_to", x, lit(n))
  def bloomAgg(x: Column, numBits: Int, k: Int): Column =
    call_function("bloom_agg", x, lit(numBits), lit(k))
  def bloomContains(filter: Column, x: Column): Column =
    call_function("bloom_contains", filter, x)
  def qdigestQuantiles(x: Column, qs: Seq[Double], bits: Int, k: Int): Column =
    call_function("qdigest_quantiles", x, lit(qs.mkString(",")), lit(bits), lit(k))
  def adaptiveHistogram(x: Column, bins: Int): Column =
    call_function("adaptive_histogram", x, lit(bins))
  def qdigestState(x: Column, bits: Int, k: Int): Column =
    call_function("qdigest_state", x, lit(bits), lit(k))
  def qdigestMergeQuantiles(st: Column, qs: Seq[Double], bits: Int, k: Int): Column =
    call_function("qdigest_merge_quantiles", st, lit(qs.mkString(",")), lit(bits), lit(k))
}
