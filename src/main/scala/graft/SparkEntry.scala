package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's query/oracle maps; each key is one row of
  * SURVEY.md §2's operator inventory.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q1_agg: a full-scan grouped aggregate that always returns rows at
    * any scale factor (unlike the highly selective q5). */
  def entry(spark: SparkSession): DataFrame =
    relational.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.Relational.queries ++
      solar.Solar.queries ++
      events.Events.queries ++
      text.Text.queries ++
      dedup.Dedup.queries ++
      sim.Sim.queries ++
      multimodal.Multimodal.queries ++
      streaming.Streaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.Relational.oracles ++
      solar.Solar.oracles ++
      events.Events.oracles ++
      text.Text.oracles ++
      dedup.Dedup.oracles ++
      sim.Sim.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.Streaming.oracles
}
