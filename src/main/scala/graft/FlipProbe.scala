package graft

/** Dev tool: A/B one graded query under a session conf flip (same
  * methodology as [[BenchOne]] — noop sink, warmup, min of three
  * load-sentineled runs per branch, interleaved).
  * `runMain graft.FlipProbe <queryName> <confKey> [confKey...]` —
  * each listed conf is set to true in the ON branch and false in the
  * OFF branch (e.g. a rewrite kill switch, or the RangeSlidingAgg
  * consolidate lever). The PLANS.md flip pairs come from here or from
  * stash A/Bs; this tool makes the conf-lever pairs reproducible in
  * one JVM. */
object FlipProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FlipProbe <queryName> <confKey> [confKey...]")
    val name = args(0)
    // validate BEFORE paying session startup (r19 ADVICE)
    require(SparkEntry.queries.contains(name),
      s"unknown query: $name (valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
    val confKeys = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    BenchCore.initBaseline(spark)
    val q = SparkEntry.queries(name)
    def run(on: Boolean): Double = {
      confKeys.foreach(k => spark.conf.set(k, on.toString))
      val t = BenchCore.measure(spark, sfDir, q)
      println(f"$name ${confKeys.mkString(",")}=$on: $t%.3f s")
      t
    }
    run(on = true); run(on = false) // warm both plans
    val samples = (1 to 3).map(_ => (run(on = true), run(on = false)))
    val tOn = samples.map(_._1).min
    val tOff = samples.map(_._2).min
    println(f"$name on=$tOn%.3f s off=$tOff%.3f s ratio(off/on)=${tOff / tOn}%.2f")
    spark.stop()
  }
}
