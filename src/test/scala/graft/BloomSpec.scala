package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the guarantees of [[graft.functions.BloomFilterAgg]] /
  * [[graft.functions.BloomContains]] (t17's engine):
  *  - NO false negatives — every inserted element probes true;
  *  - the build is deterministic under ANY partitioning (bit-OR is
  *    commutative/associative/idempotent), so the filter bytes are
  *    identical however the map-side partials merged;
  *  - the measured false-positive rate stays near the sized
  *    (1 − e^(−kn/m))^k bound;
  *  - t17's flagged counts dominate t8's exact contamination counts
  *    per doc, with bounded FP excess — the sketch answers t8's
  *    question from a broadcast summary instead of a join.
  * Sketch output isn't SQL-oracle-able, so this spec is t17's
  * correctness gate (t13/s15 precedent).
  */
class BloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.functions.GraftFunctions.{bloomAgg, bloomContains}

  private val M = 1 << 16 // 64 Kbit
  private val K = 3

  private def build(values: Seq[Long], parts: Int): Array[Byte] =
    spark.createDataset(values).toDF("v")
      .repartition(parts)
      .agg(bloomAgg(col("v"), M, K).as("bf"))
      .as[Array[Byte]].head()

  // deterministic pseudo-random members/non-members (disjoint by
  // construction: members even, probes odd)
  private val members = (1 to 5000).map(i => graft.functions.BloomImpl.mix(i.toLong) * 2)
  private val probes = (1 to 50000).map(i => graft.functions.BloomImpl.mix(-i.toLong) * 2 + 1)

  test("bloom_agg: partitioning-independent bytes + no false negatives") {
    val ref = build(members, 1)
    for (parts <- Seq(7, 32)) {
      val alt = build(members, parts)
      assert(java.util.Arrays.equals(ref, alt),
        s"filter bytes differ between parts=1 and parts=$parts")
    }
    members.foreach { v =>
      assert(graft.functions.BloomImpl.contains(ref, v),
        s"false negative for inserted element $v")
    }
  }

  test("bloom_agg: measured FPR near the sized (1-e^(-kn/m))^k bound") {
    val bf = build(members, 8)
    val fp = probes.count(v => graft.functions.BloomImpl.contains(bf, v))
    val theory = math.pow(1 - math.exp(-K.toDouble * members.size / M), K)
    val measured = fp.toDouble / probes.size
    assert(measured <= theory * 2 + 0.002,
      s"FPR $measured exceeds 2x theoretical $theory")
  }

  test("bloom_contains: codegen'd probe agrees with the kernel through SQL") {
    val bf = build(members, 4)
    val df = spark.createDataset(members.take(100) ++ probes.take(100)).toDF("v")
      .crossJoin(spark.createDataset(Seq(bf)).toDF("bf"))
      .select(col("v"), bloomContains(col("bf"), col("v")).as("hit"))
    val viaSql = df.as[(Long, Boolean)].collect().toMap
    (members.take(100) ++ probes.take(100)).foreach { v =>
      assert(viaSql(v) == graft.functions.BloomImpl.contains(bf, v))
    }
  }

  test("t17 dominates t8's exact contamination per doc, bounded FP excess") {
    val exact = text.Text.t8Contamination(spark, SfDir)
      .select(col("doc_id"), col("n_ngrams").as("n_e"), col("n_contaminated"))
    val bloom = text.Text.t17BloomDecontam(spark, SfDir)
      .select(col("doc_id"), col("n_ngrams").as("n_b"), col("n_flagged"))
    val j = exact.join(bloom, "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(j.nonEmpty, "no test docs to compare")
    j.foreach { case (id, nE, cont, nB, flag) =>
      assert(nE == nB, s"doc $id: n-gram bases differ ($nE vs $nB)")
      assert(flag >= cont, s"doc $id: bloom missed exact contamination ($flag < $cont)")
    }
    val totalGrams = j.map(_._2).sum
    val excess = j.map { case (_, _, cont, _, flag) => flag - cont }.sum
    assert(excess.toDouble / totalGrams <= 0.01,
      s"FP excess $excess over $totalGrams grams exceeds 1%")
  }
}
