package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial oversized-LSH-bucket guard (Dedup.MaxBucket).
  *
  * In-bucket pair emission is O(|bucket|²): one degenerate band key —
  * boilerplate text at crawl scale — makes candidate generation
  * quadratic and (for m7) a corpus-sized collect_list row. The guard
  * drops buckets larger than the cap before any pair is emitted.
  * This spec drives a degenerate corpus (40 byte-identical docs, so
  * EVERY band of every family collapses them into one bucket) through
  * a conf-lowered cap and asserts the bucket is dropped while
  * selective buckets keep producing pairs.
  */
class HotBucketSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/tmp/graft_hotbucket_corpus"
  private val boiler =
    "the quick brown fox jumps over the lazy dog while cookie banners consent headers repeat " * 3

  private lazy val corpus: String = {
    val s = spark
    import s.implicits._
    // 40 identical docs (the hot bucket) + 3 near-dup control pairs
    // (distinct texts, one-char suffix edits → selective band buckets
    // of size 2 that must SURVIVE the cap).
    val hot = (0 until 40).map(i => (i.toLong, boiler))
    val controls = (0 until 3).flatMap { p =>
      val base = s"control document number $p with enough distinct words " +
        s"to shingle stably and pair only with its own twin variant $p " * 2
      Seq((100L + 2 * p, base + "alpha"), (101L + 2 * p, base + "alphb"))
    }
    (hot ++ controls)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("spec"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def withCap[A](cap: Int)(f: => A): A = {
    spark.conf.set("spark.graft.lsh.maxBucket", cap)
    try f finally spark.conf.unset("spark.graft.lsh.maxBucket")
  }

  test("d3: a degenerate band bucket is dropped by the cap; selective buckets survive") {
    val d = corpus
    val hotPairs = (c: org.apache.spark.sql.DataFrame) =>
      c.filter(col("doc_a") < 100 && col("doc_b") < 100).count()
    withCap(10) {
      val out = dedup.Dedup.d3MinhashLsh(spark, d).cache()
      assert(hotPairs(out) === 0,
        "pairs from the 40-doc bucket must be dropped at cap 10")
      val controls = out.filter(col("doc_a") >= 100).count()
      assert(controls >= 3, s"the 3 control twin pairs must survive, got $controls")
      out.unpersist()
    }
    withCap(Integer.MAX_VALUE) {
      assert(hotPairs(dedup.Dedup.d3MinhashLsh(spark, d)) === 40L * 39 / 2,
        "uncapped, the hot bucket emits all C(40,2) pairs")
    }
  }

  test("d4: the SimHash band gate drops the degenerate bucket, keeps selective ones") {
    val d = corpus
    withCap(10) {
      val out = dedup.Dedup.d4Simhash(spark, d).cache()
      assert(out.filter(col("doc_a") < 100).count() === 0)
      assert(out.filter(col("doc_a") >= 100).count() >= 3,
        "near-identical control twins are within HammingMax and must survive")
      out.unpersist()
    }
  }

  test("m7: perceptual-hash dup groups above the cap are dropped") {
    val d = corpus
    withCap(10) {
      assert(multimodal.Multimodal.m7PhashDedup(spark, d)
        .filter(col("doc_a") < 100).count() === 0)
    }
    withCap(Integer.MAX_VALUE) {
      assert(multimodal.Multimodal.m7PhashDedup(spark, d)
        .filter(col("doc_a") < 100).count() === 40L * 39 / 2)
    }
  }

  test("default cap is behavior-preserving at test scale (no bucket near the cap)") {
    // Measured maxima: 337 (d3, sf0.1), 189 (d4, sf0.1), 3 (m7) —
    // the default gate must not be live on driver data. Checked here
    // at the spec SF so a testdata regeneration that breaks the
    // assumption fails loudly instead of silently changing results.
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, SfDir).filter(length($"text") >= dedup.Dedup.ShingleLen)
    val sig = docs.select($"doc_id",
      functions.GraftFunctions.minhashSig($"text", dedup.Dedup.K, dedup.Dedup.ShingleLen).as("sig"))
    val maxBucket = sig
      .select($"doc_id", explode(array((0 until dedup.Dedup.Bands).map { bd =>
        struct(lit(bd).as("band"),
          md5(concat_ws("|", slice($"sig", bd * dedup.Dedup.Rows + 1, dedup.Dedup.Rows))).as("bkey"))
      }: _*)).as("bb"))
      .groupBy($"bb.band", $"bb.bkey").count()
      .agg(max($"count")).head().getLong(0)
    assert(maxBucket <= dedup.Dedup.MaxBucket / 2,
      s"test-corpus buckets (max $maxBucket) must stay well under the default cap")
  }
}
