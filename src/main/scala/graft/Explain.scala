package graft

/** Dev tool: print the plan of a named query.
  * `runMain graft.Explain <name> [sfDir]` — formatted static plan.
  * `SPARK_GRAFT_EXPLAIN_EXEC=1` — run the query and print the FINAL
  * adaptive plan instead (where AQE's skew/reuse decisions show).
  * `SPARK_GRAFT_CONF="k=v;k=v"` — extra session confs
  * ([[Tables.applyEnvConfs]]), e.g. the scaled AQE skew thresholds. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Tables.session(8)
    Tables.applyEnvConfs(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")) {
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
