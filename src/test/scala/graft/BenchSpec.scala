package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness is graded code (BENCH_r{N}.json comes from it) —
  * exercise its methodology end-to-end so a broken sentinel or sampler
  * fails CI, not the round artifact. */
class BenchSpec extends AnyFunSuite {
  import TestSpark._

  test("BenchCore: baseline is positive; measure returns a finite positive minimum") {
    val base = BenchCore.baseline(spark)
    assert(base > 0 && base < 30, s"calibration baseline out of range: $base s")
    val t = BenchCore.measure(spark, SfDir, (s, d) => Tables.region(s, d),
      want = 1, maxAttempts = 2)
    assert(t > 0 && t < 60, s"measured time out of range: $t s")
  }

  test("BenchCore: initBaseline is idempotent and only ever tightens") {
    val first = BenchCore.initBaseline(spark)
    // sanity floor only — a tight wall-clock ceiling here would flake on
    // a loaded machine independent of any code defect (r10 ADVICE); the
    // loose 60 s bound matches the measure() test's
    assert(first > 0 && first < 60, s"startup baseline out of range: $first s")
    assert(BenchCore.initBaseline(spark) <= first, "repeat call must not loosen")
    // measure()'s post-sample calibrations may tighten the cached value
    BenchCore.measure(spark, SfDir, (s, d) => Tables.region(s, d),
      want = 1, maxAttempts = 2)
    assert(BenchCore.initBaseline(spark) <= first, "calibration must not loosen")
  }
}
