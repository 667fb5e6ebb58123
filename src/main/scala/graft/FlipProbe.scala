package graft

/** Dev tool: A/B one graded query under a session conf flip (same
  * methodology as [[BenchOne]] — noop sink, warmup, min of three
  * load-sentineled runs per branch, interleaved).
  * `runMain graft.FlipProbe <queryName> <confSpec> [confSpec...]` —
  * a bare `<confKey>` is set true in the ON branch and false in the
  * OFF branch (rewrite kill switches, the consolidate lever); a
  * `<confKey>=<onVal>|<offVal>` spec flips between two VALUES (r21 —
  * the minBytes `auto`-vs-0 gate pairs). The PLANS.md flip pairs come
  * from here or from stash A/Bs; this tool makes the conf-lever pairs
  * reproducible in one JVM. */
object FlipProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FlipProbe <queryName> <confSpec> [confSpec...]")
    val name = args(0)
    // validate BEFORE paying session startup (r19 ADVICE)
    require(SparkEntry.queries.contains(name),
      s"unknown query: $name (valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
    // (key, onValue, offValue)
    val confKeys: Seq[(String, String, String)] = args.drop(1).toSeq.map { spec =>
      spec.split("=", 2) match {
        case Array(k, vs) if vs.contains('|') =>
          val Array(onV, offV) = vs.split("\\|", 2)
          (k, onV, offV)
        case _ => (spec, "true", "false")
      }
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.applyEnvConfs(spark) // fixed confs shared by BOTH branches
    BenchCore.initBaseline(spark)
    val q = SparkEntry.queries(name)
    def run(on: Boolean): Double = {
      confKeys.foreach { case (k, onV, offV) =>
        spark.conf.set(k, if (on) onV else offV)
      }
      val t = BenchCore.measure(spark, sfDir, q)
      println(f"$name ${confKeys.map(_._1).mkString(",")}=$on: $t%.3f s")
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
