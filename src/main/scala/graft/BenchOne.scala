package graft

/** Dev tool: time one or more named queries (same methodology as
  * Bench — noop sink, warmup, best of two).
  * `runMain graft.BenchOne <name> [name...]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"$name: ${math.min(once(), once())}%.3f s")
    }
    spark.stop()
  }
}
