package graft

/** Benchmark main — one JSON line on stdout for the driver.
  *
  * Methodology (per round-1 review): each query is executed through a
  * `noop` sink so the full plan runs — a bare `.count()` lets Catalyst
  * prune projections (e.g. window expressions) and times a plan nobody
  * runs. Every query gets one warmup execution (JIT + code cache +
  * parquet footer cache) and the reported time is the best of two
  * timed runs, so JVM startup is not misattributed to whichever query
  * happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.session(cpus)

    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        runOnce(fn) // warmup — discarded
        // collect the previous queries' garbage OUTSIDE the timed
        // section: in a 69-plan JVM the accumulated debt otherwise
        // lands as a multi-second pause inside whichever query runs
        // next (observed 0.9 s → 6 s inflation)
        System.gc()
        math.min(runOnce(fn), runOnce(fn))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
