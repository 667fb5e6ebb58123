package graft

/** Dev tool: print the executed plan of a named query.
  * `runMain graft.Explain <name> [sfDir]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Tables.session(8)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
