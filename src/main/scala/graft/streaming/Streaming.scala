package graft.streaming

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming re-expression of the reference's ingestion
  * loop (SURVEY §2.H).
  *
  * The reference polls registers and batch-inserts through a bounded
  * queue into a ClickHouse Buffer table (solarman.py:36,192-225;
  * tables.sql:34-61). Spark-natively that is: `readStream` →
  * decode/derive transforms → watermark → windowed aggregation →
  * micro-batch sink with checkpointing. The SAME transform function
  * serves batch and stream (Structured Streaming's unified Dataset
  * semantics), so st1's driver-checked batch plan and the streaming
  * spec exercise one code path.
  */
object Streaming {
  import Exact._

  type Q = (SparkSession, String) => DataFrame

  /** Watermarked hourly rollup per event stream — the streaming
    * equivalent of the reference's periodic inserts + time-bucketed
    * reads. Works on a batch OR streaming Dataset: the watermark is a
    * no-op in batch, the state-cleanup bound in a stream. */
  def hourlyTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        davg($"value").as("avg_value"),
        max($"value").as("max_value"))
  }

  // ---------------------------------------------------------------------
  // st1: driver-checked batch-equivalent plan of the streaming hourly
  // aggregation (same hourlyTransform; real stream covered by
  // StreamingSpec with a MemoryStream source).
  // ---------------------------------------------------------------------
  def st1StreamHourly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    hourlyTransform(Tables.events(s, d))
      .select($"window.start".as("hour"), $"event_type", $"n",
        $"avg_value", $"max_value")
      .orderBy($"hour", $"event_type")
  }

  val queries: Map[String, Q] = Map(
    "st1_stream_hourly" -> (st1StreamHourly _),
  )

  val oracles: Map[String, String] = Map(
    "st1_stream_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
                max(value) AS max_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
  )
}
