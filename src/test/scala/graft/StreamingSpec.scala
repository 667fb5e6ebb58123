package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.{BufferedStreamSink, MergeTreeSink, Streaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("streaming hourly aggregation equals the batch plan on the same data") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val data = Seq(
      Ev(ts(0, 5), "view", 1.0), Ev(ts(0, 40), "view", 3.0),
      Ev(ts(0, 10), "click", 2.0), Ev(ts(1, 15), "view", 5.0),
      Ev(ts(2, 0), "purchase", 7.5), Ev(ts(2, 59), "purchase", 2.5))
    val stream = MemoryStream[Ev]
    stream.addData(data: _*)
    val q = Streaming.hourlyTransform(stream.toDF())
      .writeStream.format("memory").queryName("st_spec").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = s.table("st_spec")
      .select($"window.start".as("hour"), $"event_type", $"n", $"avg_value", $"max_value")
      .collect().map(_.toSeq).toSet
    val batch = Streaming.hourlyTransform(data.toDF())
      .select($"window.start".as("hour"), $"event_type", $"n", $"avg_value", $"max_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.size == 4) // (h0 view, h0 click, h1 view, h2 purchase)
  }

  test("BufferedStreamSink lands every micro-batch exactly once, idempotently") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val dir = Files.createTempDirectory("graft_bss").toString
    val sink = new BufferedStreamSink(s"$dir/data", maxPending = 2)
    val stream = MemoryStream[Ev]
    val q = sink.start(stream.toDF(), s"$dir/ckpt", intervalMs = 50L)
    try {
      stream.addData(Ev(ts(0, 1), "view", 1.0), Ev(ts(0, 2), "view", 2.0))
      q.processAllAvailable()
      stream.addData(Ev(ts(1, 1), "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val written = s.read.parquet(s"$dir/data")
    assert(written.count() == 3)
    // batch=<id> directories exist (Buffer-table flush layout)
    val batches = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(batches.length >= 2)
    // idempotent replay: rewriting the same batch id leaves one copy
    val replay = Seq(Ev(ts(0, 1), "view", 1.0), Ev(ts(0, 2), "view", 2.0)).toDF()
    sink.writeBatch(replay, 0L)
    assert(s.read.parquet(s"$dir/data").count() == 3)
  }

  test("MergeTreeSink writes month-partitioned, (key, ts)-sorted parquet") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_mts").toString
    val feed = Tables.events(s, SfDir).withColumnRenamed("user_id", "inverter")
    MergeTreeSink.write(feed, dir, "ts", "inverter")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("month=\\d{6}")),
      s"expected month=YYYYMM partitions, got ${dirs.mkString(",")}")
    // within one physical file, rows are sorted by (inverter, ts)
    val firstFile = new java.io.File(dir).listFiles().filter(_.isDirectory).head
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val rows = s.read.parquet(firstFile.toString)
      .select($"inverter", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect()
    val sorted = rows.sortBy(identity[(Long, Long)])
    assert(rows.toSeq == sorted.toSeq, "file must be sorted by (inverter, ts)")
    // round trip preserves the data
    assert(s.read.parquet(dir).count() == feed.count())
  }
}
