package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q-digest guarantee of [[graft.functions.QDigestAgg]]
  * (s40's engine): for a B-bit universe and compression factor k, the
  * rank of every reported quantile estimate lies within (B/k)·n of the
  * requested rank — REGARDLESS of partitioning / merge order
  * (Shrivastava 2004 Theorem 2; the mergeable-summaries property).
  * Sketch node sets are merge-topology-dependent, so this bound — not
  * a hash compare — is s40's correctness gate (t13/s15 precedent).
  */
class QDigestSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Bits = 17
  private val K = 256
  private val Qs = Seq(0.5, 0.9, 0.99)

  /** Sketch estimates for a feed at a given partitioning. */
  private def estimates(values: Seq[Long], parts: Int): Seq[Long] =
    spark.createDataset(values).toDF("v")
      .repartition(parts)
      .agg(functions.GraftFunctions.qdigestQuantiles(
        col("v"), Qs, Bits, K).as("qs"))
      .select(explode(col("qs")).as("e"))
      .as[Long].collect().toSeq

  /** Rank of `est` as an ECDF position: # values <= est. */
  private def rankOf(sorted: Array[Long], est: Long): Long = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= est) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  private def checkBound(values: Seq[Long], parts: Int, label: String): Unit = {
    val n = values.size.toLong
    val bound = Bits.toLong * n / K + 1 // (B/k)·n, integer-rounded up
    val sorted = values.sorted.toArray
    val ests = estimates(values, parts)
    assert(ests.size == Qs.size)
    Qs.zip(ests).foreach { case (q, est) =>
      val target = math.ceil(q * n).toLong
      val r = rankOf(sorted, est)
      // estimate's rank must cover the target within the bound, and
      // never undershoot: the walk stops at cumulative >= target, and
      // pushed-up counts only inflate the apparent rank
      assert(r >= target - bound && r <= target + bound,
        s"$label parts=$parts q=$q: rank $r outside [${target - bound}, ${target + bound}] (n=$n)")
    }
  }

  test("qdigest: rank bound holds on uniform, skewed and sorted feeds, any partitioning") {
    val rng = new scala.util.Random(42)
    val uniform = Seq.fill(20000)(rng.nextInt(1 << Bits).toLong)
    // zipf-ish: heavy mass on few values (forces deep node merges)
    val skewed = (1 to 20000).map(i => (10000.0 / i).toLong * 13L)
    val sortedAsc = (1L to 15000L).map(_ * 7 % (1 << Bits))
    for (parts <- Seq(1, 7, 32)) {
      checkBound(uniform, parts, "uniform")
      checkBound(skewed, parts, "skewed")
      checkBound(sortedAsc.sorted, parts, "sorted")
    }
  }

  test("qdigest: estimates are monotone in q and clamp out-of-universe values") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rng.nextInt(1 << Bits).toLong) ++
      Seq(-50L, (1L << Bits) + 999L) // clamped to universe edges
    val ests = estimates(vals, 8)
    assert(ests.zip(ests.drop(1)).forall { case (a, b) => a <= b },
      s"quantile estimates must be monotone in q: $ests")
    assert(ests.forall(e => e >= 0L && e < (1L << Bits)))
  }

  test("qdigest state/merge: chunked states re-aggregate to the direct answer (s47's pattern)") {
    // The AggregatingMergeTree contract: build per-chunk SERIALIZED
    // states, merge them with qdigest_merge_quantiles, and (a) at
    // k ≥ n — the graded s47 config, where no compression ever fires —
    // the merged answer must equal BOTH the direct single-pass digest
    // AND the exact rank-ceil(q·n) order statistic, for any chunking;
    // (b) at production k the merged answer stays inside the (B/k)·n
    // rank bound.
    import functions.GraftFunctions.{qdigestState, qdigestMergeQuantiles}
    val rng = new scala.util.Random(11)
    val values = Seq.fill(6000)(rng.nextInt(1 << Bits).toLong)
    val sorted = values.sorted.toArray
    val n = values.size.toLong
    def merged(k: Int, chunks: Int): Seq[Long] =
      spark.createDataset(values.zipWithIndex).toDF("v", "i")
        .withColumn("chunk", col("i") % chunks)
        .groupBy(col("chunk"))
        .agg(qdigestState(col("v"), Bits, k).as("st"))
        .agg(qdigestMergeQuantiles(col("st"), Qs, Bits, k).as("qs"))
        .select(explode(col("qs")).as("e")).as[Long].collect().toSeq
    // (a) exactness at k ≥ n, invariant to the chunking
    val exact = Qs.map(q => sorted((math.ceil(q * n).toLong max 1L).toInt - 1))
    for (chunks <- Seq(1, 4, 23)) {
      assert(merged(1 << 20, chunks) == exact,
        s"k>=n chunks=$chunks: merged digest must be the exact order statistic")
    }
    // (b) bound at production k, merging 23 chunked states
    val bound = Bits.toLong * n / K + 1
    Qs.zip(merged(K, 23)).foreach { case (q, est) =>
      val target = math.ceil(q * n).toLong
      val r = rankOf(sorted, est)
      assert(r >= target - bound && r <= target + bound,
        s"production-k merge q=$q: rank $r outside target $target ± $bound")
    }
  }

  test("s40 query: per-inverter estimates respect the bound vs exact cents") {
    val s = spark
    val df = solar.Solar.s40QdigestQuantiles(s, SfDir).collect()
    val exact = Tables.events(s, SfDir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("inverter"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (inv, rows) => inv -> rows.map(_._2).sorted }
    df.groupBy(_.getLong(0)).foreach { case (inv, rows) =>
      val cs = exact(inv)
      val n = cs.length.toLong
      val bound = Bits.toLong * n / K + 1
      rows.foreach { r =>
        val q = r.getAs[Double]("q")
        val estC = math.round(r.getAs[Double]("est_watts") * 100)
        val target = math.ceil(q * n).toLong
        val rk = rankOf(cs, estC)
        assert(rk >= target - bound && rk <= target + bound,
          s"inverter $inv q=$q: rank $rk outside target $target ± $bound")
      }
    }
  }
}
