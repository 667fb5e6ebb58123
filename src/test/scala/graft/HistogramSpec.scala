package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the adaptive-histogram invariants of
  * [[graft.functions.HistogramAgg]] (s46's engine, ClickHouse
  * `histogram(N)` / Ben-Haim & Tom-Tov 2010): bin PLACEMENT is
  * merge-topology-dependent (like every adaptive sketch), but for ANY
  * partitioning the summary must conserve the exact count, stay within
  * N sorted bins inside the data hull, and preserve the first moment
  * up to IEEE rounding. These invariants — not a hash compare — are
  * s46's correctness gate (t13/s15/s40 precedent).
  */
class HistogramSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val N = 8

  private def bins(values: Seq[Double], parts: Int): Seq[(Double, Long)] =
    spark.createDataset(values).toDF("v")
      .repartition(parts)
      .agg(functions.GraftFunctions.adaptiveHistogram(col("v"), N).as("bins"))
      .select(explode(col("bins")).as("b"))
      .select(col("b.center"), col("b.cnt"))
      .collect().toSeq.map { case Row(c: Double, n: Long) => (c, n) }

  private def checkInvariants(values: Seq[Double], parts: Int, label: String): Unit = {
    val bs = bins(values, parts)
    assert(bs.nonEmpty && bs.size <= N, s"$label parts=$parts: ${bs.size} bins")
    // exact count conservation
    assert(bs.map(_._2).sum == values.size.toLong,
      s"$label parts=$parts: counts ${bs.map(_._2).sum} != n ${values.size}")
    // strictly increasing centers
    assert(bs.zip(bs.drop(1)).forall { case (a, b) => a._1 < b._1 },
      s"$label parts=$parts: centers not strictly increasing: ${bs.map(_._1)}")
    // hull containment: weighted means cannot escape [min, max]
    assert(bs.head._1 >= values.min - 1e-9 && bs.last._1 <= values.max + 1e-9,
      s"$label parts=$parts: bins escape hull")
    // first moment preserved (weighted means are exact up to IEEE
    // rounding of the merge chain)
    val m1 = bs.map { case (c, n) => c * n }.sum
    val exact = values.sum
    assert(math.abs(m1 - exact) <= 1e-6 * math.max(1.0, math.abs(exact)),
      s"$label parts=$parts: first moment $m1 vs $exact")
  }

  test("histogram: invariants hold on uniform, bimodal, skewed and constant feeds, any partitioning") {
    val rng = new scala.util.Random(42)
    val uniform = Seq.fill(20000)(rng.nextDouble() * 500.0)
    val bimodal = Seq.fill(10000)(rng.nextGaussian() * 3 + 10.0) ++
      Seq.fill(10000)(rng.nextGaussian() * 5 + 400.0)
    val skewed = (1 to 20000).map(i => 10000.0 / i)
    val constant = Seq.fill(5000)(42.0)
    for (parts <- Seq(1, 7, 32)) {
      checkInvariants(uniform, parts, "uniform")
      checkInvariants(bimodal, parts, "bimodal")
      checkInvariants(skewed, parts, "skewed")
      checkInvariants(constant, parts, "constant")
    }
  }

  test("histogram: non-finite inputs are skipped; the summary stays well-formed (r12 ADVICE)") {
    // A NaN input used to break the sorted-centers binary search and
    // make every compaction gap comparison false — silently malformed
    // bins. The update path now skips non-finite values, mirroring the
    // q-digest's bounded input domain.
    val rng = new scala.util.Random(7)
    val clean = Seq.fill(5000)(rng.nextDouble() * 500.0)
    val dirty = (clean ++ Seq.fill(50)(Double.NaN) ++
      Seq(Double.PositiveInfinity, Double.NegativeInfinity))
    for (parts <- Seq(1, 7)) {
      val expect = bins(scala.util.Random.shuffle(clean), 1)
      val got = bins(dirty, parts)
      // the invariants of the CLEAN feed must all hold on the dirty one
      assert(got.map(_._2).sum == clean.size.toLong,
        s"non-finite rows must not be counted: ${got.map(_._2).sum}")
      assert(got.zip(got.drop(1)).forall { case (a, b) => a._1 < b._1 })
      assert(got.head._1 >= clean.min - 1e-9 && got.last._1 <= clean.max + 1e-9,
        "bins must stay in the FINITE hull")
      assert(expect.nonEmpty && got.nonEmpty)
    }
  }

  test("histogram: fewer distinct values than bins reproduces them exactly") {
    // with ≤ N distinct values no merge ever fires — the histogram IS
    // the exact value-frequency table, whatever the partitioning
    val vals = Seq.fill(300)(1.0) ++ Seq.fill(200)(7.5) ++ Seq.fill(100)(99.0)
    for (parts <- Seq(1, 5)) {
      val bs = bins(vals, parts)
      assert(bs == Seq((1.0, 300L), (7.5, 200L), (99.0, 100L)),
        s"parts=$parts: $bs")
    }
  }

  test("histogram: bimodal modes survive compaction (mass near each true mode)") {
    val rng = new scala.util.Random(7)
    val lo = Seq.fill(8000)(rng.nextGaussian() + 10.0)
    val hi = Seq.fill(2000)(rng.nextGaussian() + 400.0)
    val bs = bins(lo ++ hi, 16)
    val loMass = bs.filter(_._1 < 200.0).map(_._2).sum
    val hiMass = bs.filter(_._1 >= 200.0).map(_._2).sum
    assert(loMass == 8000L && hiMass == 2000L,
      s"mode mass split $loMass/$hiMass, bins $bs")
  }

  test("s46 query: per-inverter bins conserve that inverter's reading count") {
    val s = spark
    import s.implicits._
    val out = solar.Solar.s46Histogram(s, SfDir)
    val byInv = out.groupBy($"inverter")
      .agg(max($"n_readings").as("n"), sum($"cnt").as("m"),
        count(lit(1)).as("nbins"))
      .collect()
    assert(byInv.nonEmpty)
    byInv.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("m"),
        s"inverter ${r.get(0)}: bin mass ${r.getAs[Long]("m")} != n ${r.getAs[Long]("n")}")
      assert(r.getAs[Long]("nbins") <= solar.Solar.HistBins)
    }
  }
}
