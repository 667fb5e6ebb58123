package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for the plan properties PLANS.md documents —
  * the scale behaviors (pushdown, join shape, shared sorts) that
  * correctness oracles can't see. Each assertion reads the physical
  * plan the optimizer actually produced. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, SfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q6: every predicate reaches the parquet scan; schema pruned to referenced columns") {
    // AQE wraps stages in QueryStageExec leaves that tree collection
    // does not descend into; the scan properties are static, so audit
    // the non-adaptive plan.
    val s = spark
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      SparkEntry.queries("q6_forecast")(s, SfDir)
        .queryExecution.executedPlan.collectWithSubqueries {
          case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
        }
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty, "expected a parquet scan")
    val meta = scans.head.metadata
    val pushed = meta("PushedFilters")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("LessThan(l_quantity,24"),
      s"all predicates must be pushed, got $pushed")
    val readSchema = meta("ReadSchema")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"scan must prune to referenced columns, got $readSchema")
  }

  test("q17: lineitem is semi-join-filtered BEFORE the per-partkey aggregate") {
    val p = plan("q17_avg_subquery")
    val semiIdx = p.indexOf("LeftSemi")
    assert(semiIdx >= 0, "expected a left-semi join against the Brand#1 part keys")
  }

  test("e5: the as-of join carries all columns through ONE window over one sort") {
    val p = plan("e5_asof_join")
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows == 1, s"as-of composition must use exactly one Window node, got $windows:\n$p")
  }

  test("d3: LSH self-join is sort-merge (shared exchange), not broadcast") {
    val p = plan("d3_minhash_lsh")
    assert(p.contains("SortMergeJoin"), "banded self-join must be sort-merge for ReuseExchange")
    assert(!p.contains("BroadcastHashJoin"), "a broadcast side would evaluate the signature twice")
  }

  test("v2: the k-NN top-k plans as the heap operator, not a window sort") {
    val p = plan("v2_knn_batch")
    assert(p.contains("TopKFinal") && p.contains("TopKPartial"),
      s"expected the grouped top-k operator:\n$p")
  }

  test("codegen: custom expressions are native (no CodegenFallback); scan-rate gates stay fused") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    // The custom expression tier must stay inside whole-stage codegen:
    // a CodegenFallback mixin silently drops the hot path to
    // per-row interpreted eval — exactly the regression this pins.
    Seq(classOf[functions.SimHash64], classOf[functions.Winnow],
      classOf[functions.MinHashSig], classOf[functions.CosineSim],
      classOf[functions.BloomContains]).foreach { c =>
      assert(!classOf[CodegenFallback].isAssignableFrom(c),
        s"${c.getSimpleName} must implement doGenCode, not CodegenFallback")
    }
    // Scan-rate map-side queries (decode, PII scrub, quality rules)
    // must execute inside WholeStageCodegen with NO fallback
    // expression anywhere in the executed plan — their whole point is
    // scan-rate codegen'd projection work.
    // AQE wraps stages in lazily-planned QueryStageExec nodes that an
    // unexecuted plan's tree walk cannot descend into (the q6
    // precedent) — audit the non-adaptive physical plan.
    val s = spark
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try for (name <- Seq("s1_decode", "t15_pii_redact", "t24_gopher_rules")) {
      val exec = SparkEntry.queries(name)(s, SfDir).queryExecution.executedPlan
      val hasWsc = exec.collectWithSubqueries {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.nonEmpty
      assert(hasWsc, s"$name: expected WholeStageCodegen spans")
      // Spark's built-in higher-order array functions (ArrayFilter,
      // ArrayTransform, …) are CodegenFallback BY DESIGN upstream —
      // the lambda is interpreted per row inside an otherwise
      // codegen'd stage. That is Spark's contract for array lambdas,
      // not a regression this repo can fix; the assertion pins that
      // nothing ELSE (custom expressions, UDF wrappers) falls back.
      val builtinHof = Set("ArrayFilter", "ArrayTransform", "ArrayAggregate",
        "ArraySort", "ArrayExists", "ArrayForAll", "ZipWith", "MapFilter",
        "TransformKeys", "TransformValues")
      val fallbacks = exec.collectWithSubqueries { case p => p }
        .flatMap(_.expressions)
        .flatMap(e => e +: e.children)
        .collect { case f: CodegenFallback => f.getClass.getSimpleName }
        .distinct.filterNot(builtinHof)
      assert(fallbacks.isEmpty,
        s"$name: CodegenFallback expressions in the hot path: $fallbacks")
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("red-flag sweep: no query in the whole surface plans a CartesianProduct") {
    // Cross joins exist (k-NN query sides) but must always be
    // broadcast nested-loop against a bounded side, never an unbounded
    // cartesian shuffle product.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, SfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("comparator contract: no oracled query emits array/map/struct output columns") {
    // The driver's pandas comparator sorts and hashes cell values;
    // array-typed cells raise `unhashable type: 'numpy.ndarray'` and
    // silently cost the round a green row (the s25 lesson). Schema-only
    // check — analysis, no execution.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (SparkEntry.oracleSql.contains(name)) {
        val bad = fn(spark, SfDir).schema.fields.filter(_.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        })
        assert(bad.isEmpty,
          s"$name emits non-scalar graded columns [${bad.map(_.name).mkString(", ")}] — " +
            "stringify or explode them; the driver comparator cannot hash arrays")
      }
    }
  }

  test("d3/d8: raw-text repartition is GATED on scan splits — absent when the scan is already parallel") {
    // Locally the corpus is one parquet split, so the local-split fix
    // round-robins the docs across cores (auto mode fires). But on a
    // cluster — modeled here by shrinking maxPartitionBytes until the
    // scan yields >= defaultParallelism splits — the same code must NOT
    // full-shuffle the corpus text: the gate sees enough splits and
    // skips the exchange. `off` must also never repartition.
    def roundRobins(name: String): Int =
      "RoundRobinPartitioning".r
        .findAllIn(SparkEntry.queries(name)(spark, SfDir)
          .queryExecution.executedPlan.toString).size
    for (name <- Seq("d3_minhash_lsh", "d8_sig_agg", "d2_shingle_stats")) {
      assert(roundRobins(name) > 0,
        s"$name: single-split local scan should trigger the parallelism fix")
      val mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      try assert(roundRobins(name) == 0,
        s"$name: a many-split scan (cluster shape) must not repartition raw text")
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      spark.conf.set("spark.graft.localSplitFix", "off")
      try assert(roundRobins(name) == 0, s"$name: localSplitFix=off must disable the exchange")
      finally spark.conf.unset("spark.graft.localSplitFix")
    }
  }

  test("splitProbe memo: a grown corpus dir re-probes instead of serving a stale split count") {
    // The probe memo is keyed on a (#files, bytes) fingerprint of the
    // scan's FileIndex: in a long-lived session a dir that gains files
    // between builder calls must see a fresh split count — a stale
    // small count would force the full-text repartition the gate
    // exists to prevent.
    import java.nio.file.{Files, Paths}
    val src = Paths.get(SfDir, "documents.parquet")
    val dir = Files.createTempDirectory("graft-splitprobe")
    Files.copy(src, dir.resolve("part-000.parquet"))
    def docs = spark.read.parquet(dir.toString)
    val first = graft.dedup.Dedup.probedSplits(spark, docs)
    (1 to 8).foreach(i => Files.copy(src, dir.resolve(f"part-$i%03d.parquet")))
    val second = graft.dedup.Dedup.probedSplits(spark, docs)
    assert(second > first,
      s"grown dir must re-probe, not reuse the memo: first=$first second=$second")
  }

  test("d6: AQE stage reuse computes each corpus-side kernel ONCE in the final plan") {
    // PLANS.md asserts the two candidate→sh joins share one evaluation
    // of the corpus shingle-hash set (and d3's banded self-join one
    // evaluation of the MinHash signatures) via AQE stage reuse. Pin
    // it: execute, then count kernel subtrees in the FINAL adaptive
    // plan — a future change that breaks exchange canonicalization
    // would silently double the corpus-side hash work.
    val df = SparkEntry.queries("d6_ngram_jaccard")(spark, SfDir)
    df.collect() // drive AQE to its final plan
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), "expected an executed adaptive plan")
    val fin = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    val shingleKernels = "conv\\(substring\\(md5\\(".r.findAllIn(fin).size
    assert(shingleKernels == 1,
      s"corpus shingle-hash set must be computed once, found $shingleKernels evaluations:\n$fin")
    val minhashKernels = "minhash_sig\\(".r.findAllIn(fin).size
    assert(minhashKernels == 1,
      s"MinHash signature must be computed once across the banded self-join, found $minhashKernels:\n$fin")
    assert(fin.contains("ReusedExchange"),
      "expected at least one ReusedExchange carrying the shared corpus stage")
  }

  test("s12: the global rank() window plans as the tie-aware heap operator, no WindowExec") {
    val p = plan("s12_top_inverters")
    assert(p.contains("TopKFinal") && p.contains("TopKPartial"),
      s"expected the grouped top-k operator on the global rank window:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window ("),
      s"no single-partition window sort may remain:\n$p")
  }

  test("red-flag sweep: no query plans a global (single-partition) window") {
    // A WindowExec with an empty partition spec funnels its whole
    // input through ONE task — the classic silent scale-killer. s12
    // was the last one (closed by the r9 rank-mode TopKRewrite); this
    // sweep keeps the property across every graded query. AQE off so
    // collectWithSubqueries can see through the whole tree.
    val s = spark
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val globals = fn(s, SfDir).queryExecution.executedPlan.collectWithSubqueries {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        assert(globals.isEmpty, s"$name plans a global single-partition window")
      }
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q5: broadcast HINTS only on fixed-cardinality dims (region, nation)") {
    // At tiny SFs the planner may broadcast everything from file-size
    // estimates — that's AQE's runtime call, not ours. What must hold
    // in the CODE is that only bounded-cardinality tables carry an
    // explicit hint: exactly 2 here (region + nation); customer/
    // supplier/orders/lineitem are left to the optimizer.
    val df = SparkEntry.queries("q5_local_supplier")(spark, SfDir)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 2, s"expected exactly 2 broadcast hints, got ${hints.size}")
  }
}
