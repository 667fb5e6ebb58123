package graft

/** Dev tool: time one or more named queries (same methodology as
  * [[Bench]] — noop sink, warmup, min of three load-sentineled runs;
  * see [[BenchCore]]).
  * `runMain graft.BenchOne <name> [name...]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Tables.applyEnvConfs(spark) // value-lever A/Bs (e.g. minBytes=0)
    BenchCore.initBaseline(spark)
    for (name <- args) {
      val t = BenchCore.measure(spark, sfDir, SparkEntry.queries(name))
      println(f"$name: $t%.3f s")
    }
    spark.stop()
  }
}
