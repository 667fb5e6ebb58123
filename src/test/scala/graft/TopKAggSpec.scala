package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Misra-Gries guarantees of [[graft.functions.ApproxTopKAgg]]
  * (t13's engine): with n total updates and capacity w, every estimate
  * is an underestimate off by at most n/(w+1), and every item with
  * true count > n/(w+1) is present — REGARDLESS of partitioning /
  * merge order (the mergeable-summaries property, Agarwal et al.
  * 2012). Sketches aren't cross-engine reproducible, so this spec is
  * t13's correctness gate (s15's accepted HLL pattern).
  */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Full summary (k = w) of a feed at a given partitioning. */
  private def summary(items: Seq[String], parts: Int, w: Int): Map[String, Long] =
    spark.createDataset(items).toDF("item")
      .repartition(parts)
      .agg(functions.GraftFunctions.approxTopK(col("item"), w, w).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap

  test("approx_topk: MG bound + heavy-hitter presence on a skewed feed, any partitioning") {
    val w = 128
    // 5 heavy items (400..2000 occurrences) + 20k distinct tail items
    // crafted to force constant eviction pressure
    val heavies = (1 to 5).flatMap(i => Seq.fill(i * 400)(s"heavy_$i"))
    val tail = (1 to 20000).map(i => s"tail_$i")
    val items = heavies ++ tail
    val exact = items.groupBy(identity).map { case (s, o) => s -> o.size.toLong }
    val n = items.size.toLong
    val bound = n / (w + 1)
    for (parts <- Seq(1, 7, 32)) {
      val sk = summary(items, parts, w)
      sk.foreach { case (item, est) =>
        val truth = exact(item)
        assert(est <= truth, s"parts=$parts: $item overestimated ($est > $truth)")
        assert(truth - est <= bound,
          s"parts=$parts: $item error ${truth - est} exceeds n/(w+1)=$bound")
      }
      (1 to 5).foreach { i =>
        assert(exact(s"heavy_$i") > bound, "test feed must keep heavies above the bound")
        assert(sk.contains(s"heavy_$i"),
          s"parts=$parts: heavy_$i (count ${exact(s"heavy_$i")} > $bound) missing from summary")
      }
      // heavies outrank the tail: tail estimates can never exceed their
      // true count of 1, heavies sit at >= truth - bound >> 1
      val topK = sk.toSeq.sortBy { case (s, c) => (-c, s) }.take(5).map(_._1).toSet
      assert((1 to 5).forall(i => topK.contains(s"heavy_$i")),
        s"parts=$parts: top-5 of the summary should be exactly the heavies, got $topK")
    }
  }

  /** Weighted full summary (k = w) at a given partitioning. */
  private def wsummary(items: Seq[(String, Long)], parts: Int, w: Int): Map[String, Long] =
    spark.createDataset(items).toDF("item", "wt")
      .repartition(parts)
      .agg(functions.GraftFunctions
        .approxTopKWeighted(col("item"), col("wt"), w, w).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap

  test("approx_topk_weighted: W/(w+1) bound + presence on a skewed weighted feed") {
    val w = 64
    // heavy items carry their mass in FEW large-weight updates; the
    // tail in many small ones — the shape that stresses the weighted
    // decrement (delta = min(min-counter, w_i), reinsert remainder)
    val heavies = (1 to 5).flatMap(i => Seq.fill(8)((s"heavy_$i", i * 500L)))
    val tail = (1 to 8000).map(i => (s"tail_$i", 1L + i % 3))
    val items = scala.util.Random.javaRandomToRandom(
      new java.util.Random(11)).shuffle(heavies ++ tail)
    val exact = items.groupBy(_._1).map { case (s, o) => s -> o.map(_._2).sum }
    val totalW = items.map(_._2).sum
    val bound = totalW / (w + 1)
    for (parts <- Seq(1, 7, 32)) {
      val sk = wsummary(items, parts, w)
      sk.foreach { case (item, est) =>
        val truth = exact(item)
        assert(est <= truth, s"parts=$parts: $item overestimated ($est > $truth)")
        assert(truth - est <= bound,
          s"parts=$parts: $item error ${truth - est} exceeds W/(w+1)=$bound")
      }
      (1 to 5).foreach { i =>
        assert(exact(s"heavy_$i") > bound)
        assert(sk.contains(s"heavy_$i"),
          s"parts=$parts: heavy_$i (mass ${exact(s"heavy_$i")} > $bound) missing")
      }
    }
    // distinct <= w: the weighted summary is EXACT
    val small = Seq(("a", 10L), ("b", 3L), ("a", 5L), ("c", 7L))
    assert(wsummary(small, 3, 8) == Map("a" -> 15L, "b" -> 3L, "c" -> 7L))
  }

  test("approx_topk_weighted with weight 1 is bit-identical to approx_topk") {
    // single partition: one partial buffer, deterministic update order
    // (with >1 partial the MERGE ORDER is arrival-dependent — summary
    // CONTENT then varies within the bound, which is why the bound
    // specs above are partitioning-quantified and this one is not)
    val items = (1 to 3000).map(i => s"it_${i % 97}")
    val unweighted = summary(items, 1, 16)
    val weighted = wsummary(items.map(_ -> 1L), 1, 16)
    assert(weighted == unweighted)
  }

  test("runtime policy: null and non-positive weights are SKIPPED, never a job abort") {
    // a single bad row in a corpus-scale feed must not fail the job
    // with an executor-side require; the summary is defined over the
    // positive-weight rows only (same treatment as null items)
    val rows = Seq(("a", Some(5L)), ("a", Some(-3L)), ("b", None),
      ("b", Some(0L)), ("b", Some(2L)), (null, Some(9L)))
    val sk = rows.toDF("item", "wt")
      .agg(functions.GraftFunctions
        .approxTopKWeighted(col("item"), col("wt"), 8, 8).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap
    assert(sk == Map("a" -> 5L, "b" -> 2L))
  }

  test("prettyName reflects the SQL function actually called") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(functions.ApproxTopKAgg(Literal("x"), 1, 8).prettyName == "approx_topk")
    assert(functions.ApproxTopKAgg(Literal("x"), 1, 8, weight = Literal(1L),
      weighted = true).prettyName == "approx_topk_weighted")
    // and through the SQL registry: the weighted name must appear in
    // the analysis error for a bad weight type
    val e = intercept[Exception] {
      Seq(("a", "b")).toDF("x", "w")
        .agg(expr("approx_topk_weighted(x, w, 1, 8)")).collect()
    }
    assert(e.getMessage.contains("approx_topk_weighted"))
  }

  test("type contract: analysis-time errors for bad inputs; integral weights widen") {
    // INT-typed weight must widen to long, not ClassCastException
    val r = Seq("a", "a", "b").toDF("x")
      .agg(expr("approx_topk_weighted(x, 2, 2, 8)")).collect()
    assert(r.head.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getString(0), e.getLong(1))) == Seq(("a", 4L), ("b", 2L)))
    // wrong item/input types are readable ANALYSIS errors, not
    // executor ClassCastExceptions mid-job
    val e1 = intercept[Exception] {
      Seq(1L).toDF("x").agg(expr("approx_topk(x, 1, 8)")).collect()
    }
    assert(e1.getMessage.contains("STRING item"))
    val e2 = intercept[Exception] {
      Seq("a").toDF("x").agg(expr("uniq_up_to(x, 5)")).collect()
    }
    assert(e2.getMessage.contains("integral input"))
    val e3 = intercept[Exception] {
      Seq(("a", "b")).toDF("x", "w")
        .agg(expr("approx_topk_weighted(x, w, 1, 8)")).collect()
    }
    assert(e3.getMessage.contains("integral weight"))
  }

  test("t13: sketch respects the MG bound against exact corpus bigram counts") {
    val w = text.Text.TopKSketchW
    val pairs = Tables.documents(spark, SfDir)
      .select(filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("ngram"))
    val exact = pairs.groupBy("ngram").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val bound = n / (w + 1)
    // full summary (k = w): every estimate within the band, every item
    // whose true count clears the band present
    val full = pairs
      .agg(functions.GraftFunctions.approxTopK(col("ngram"), w, w).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    full.foreach { case (item, est) =>
      val truth = exact(item)
      assert(est <= truth && truth - est <= bound,
        s"$item: est $est vs exact $truth outside -$bound..0")
    }
    exact.filter(_._2 > bound).keys.foreach { hh =>
      assert(full.contains(hh), s"heavy hitter $hh (count ${exact(hh)} > $bound) missing")
    }
    // the graded t13 entry: top-TopNgrams slice of the same summary,
    // every emitted estimate bound-consistent with the exact count
    val got = text.Text.queries("t13_approx_topk")(spark, SfDir)
      .select(col("ngram"), col("est_count")).as[(String, Long)].collect()
    assert(got.length == text.Text.TopNgrams)
    got.foreach { case (ngram, est) =>
      val truth = exact(ngram)
      assert(est <= truth && truth - est <= bound,
        s"t13 $ngram: est $est vs exact $truth outside -$bound..0")
    }
  }

  test("approx_topk: SQL surface through GraftExtensions") {
    spark.createDataset(Seq("a", "a", "a", "b", "b", "c")).toDF("item")
      .createOrReplaceTempView("topk_feed")
    val rows = spark.sql(
      "SELECT approx_topk(item, 2, 8) AS tk FROM topk_feed")
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 3L), ("b", 2L)))
  }
}
