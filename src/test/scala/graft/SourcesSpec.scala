package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def writeCatalog(): String = {
    val f = Files.createTempFile("registers", ".txt")
    Files.writeString(f, """# name  address  quantity  scale  unit
      |dc_voltage   109  1  0.1   V
      |dc_amps      110  1  0.1   A
      |ac_watts     117  2  1.0   W
      |ac_frequency 119  1  0.01  Hz
      |
      |# comments and blank lines are skipped
      |inverter_temp 121 1  0.1   C
      |""".stripMargin)
    f.toString
  }

  test("register-catalog DSv2 source reads the typed catalog") {
    val s = spark
    import s.implicits._
    val cat = s.read.format("register-catalog").load(writeCatalog())
    assert(cat.schema.fieldNames.toSeq ==
      Seq("name", "address", "quantity", "scale", "unit"))
    val rows = cat.orderBy($"address")
      .as[(String, Int, Int, Double, String)].collect().toSeq
    assert(rows.size == 5)
    assert(rows.head == ("dc_voltage", 109, 1, 0.1, "V"))
    assert(rows.exists(r => r._1 == "ac_watts" && r._3 == 2 && r._4 == 1.0))
  }

  test("register-catalog pushdown: filters and projection reach the scan; results exact") {
    val s = spark
    import s.implicits._
    val path = writeCatalog()
    val df = s.read.format("register-catalog").load(path)
      .filter($"address" >= 110 && $"quantity" === 1)
      .select($"name", $"address")
    // the scan's description must report the pushed filters and the
    // pruned 2-column read schema (the parquet-scan audit contract)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(address,110)"), plan)
    assert(plan.contains("EqualTo(quantity,1)"), plan)
    assert(plan.contains("ReadSchema: struct<name:string,address:int>"), plan)
    // and the rows are exactly the unpushed read's answer
    assert(df.orderBy($"address").as[(String, Int)].collect().toSeq ==
      Seq(("dc_amps", 110), ("ac_frequency", 119), ("inverter_temp", 121)))
  }

  test("register-catalog lazy parse: a malformed field in a projected-away column cannot fail the scan") {
    val s = spark
    import s.implicits._
    // scale field 'BROKEN' would throw in toDouble — but a reader that
    // only needs (name, address) must never parse it (the r12 ADVICE
    // fix: parse exactly the fields the pushed filters + projection
    // reference).
    val f = Files.createTempFile("registers_bad", ".txt")
    Files.writeString(f, """dc_voltage   109  1  0.1     V
      |broken_reg   110  1  BROKEN  A
      |ac_watts     117  2  1.0     W
      |""".stripMargin)
    val df = s.read.format("register-catalog").load(f.toString)
    val names = df.select($"name", $"address").orderBy($"address")
      .as[(String, Int)].collect().toSeq
    assert(names == Seq(("dc_voltage", 109), ("broken_reg", 110), ("ac_watts", 117)))
    // filters referencing only good fields also never touch scale
    assert(df.filter($"address" > 109).select($"name").as[String]
      .collect().toSet == Set("broken_reg", "ac_watts"))
    // but actually READING scale must still fail loudly
    intercept[org.apache.spark.SparkException] {
      df.select($"scale").collect()
    }
  }

  test("register-catalog pushdown: unsupported predicates stay residual and stay correct") {
    val s = spark
    import s.implicits._
    // EndsWith is NOT in the supported set — it must come back as a
    // residual that Spark re-applies above the scan; StartsWith IS
    // pushed. Correct rows either way.
    val df = s.read.format("register-catalog").load(writeCatalog())
      .filter($"name".endsWith("_watts") || $"name".startsWith("dc_"))
      .select($"name")
    val plan = df.queryExecution.executedPlan.toString
    // the Or tree is unpushable as a whole → scan reports no pushed
    // filters, Spark filters above it
    assert(plan.contains("PushedFilters: []"), plan)
    assert(df.as[String].collect().toSet ==
      Set("dc_voltage", "dc_amps", "ac_watts"))
    val pushedOnly = s.read.format("register-catalog").load(writeCatalog())
      .filter($"name".startsWith("dc_"))
    val plan2 = pushedOnly.queryExecution.executedPlan.toString
    assert(plan2.contains("StringStartsWith(name,dc_)"), plan2)
    assert(pushedOnly.select($"name").as[String].collect().toSet ==
      Set("dc_voltage", "dc_amps"))
  }

  test("register-poll DSv2 streaming source: bounded drain yields the exact poll sweep rows") {
    val s = spark
    import s.implicits._
    val ckpt = Files.createTempDirectory("poll_ckpt").toString
    val q = s.readStream.format("register-poll")
      .option("inverters", 2)
      .option("maxPolls", 2)
      .option("intervalMs", 1000)
      .load()
      .writeStream.format("memory").queryName("poll_spec")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = s.table("poll_spec")
      .select($"poll", $"inverter", $"register", $"raw", $"scaled")
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    // 2 polls × 2 inverters × 3 registers
    assert(rows.size == 12, s"got ${rows.size} rows")
    val regs = sources.RegisterPollSource.Registers
    rows.foreach { case (poll, inv, reg, raw, scaled) =>
      val idx = regs.indexWhere(_._1 == reg)
      assert(idx >= 0)
      assert(raw == sources.RegisterPollSource.raw(poll, inv, idx),
        s"raw mismatch at poll=$poll inv=$inv reg=$reg")
      assert(scaled == raw * regs(idx)._2)
    }
    // every (poll, inverter, register) combination appears exactly once
    assert(rows.map(r => (r._1, r._2, r._3)).distinct.size == 12)
  }

  test("register-poll targets file: per-target fleet config with per-target cadence") {
    val s = spark
    import s.implicits._
    // targets.json re-expressed: garage polls every sweep (30s), roof
    // only every 2nd sweep (60s)
    val tf = Files.createTempFile("targets", ".txt")
    Files.writeString(tf, """# name   serial      interval_s
      |garage   1234567890  30
      |roof     9876543210  60
      |""".stripMargin)
    val ckpt = Files.createTempDirectory("poll_t_ckpt").toString
    val q = s.readStream.format("register-poll")
      .option("targets", tf.toString)
      .option("maxPolls", 4)
      .option("intervalMs", 30000) // sweep = 30s
      .load()
      .writeStream.format("memory").queryName("poll_targets_spec")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = s.table("poll_targets_spec")
      .select($"target", $"serial", $"poll").as[(String, Long, Long)].collect().toSeq
    val byTarget = rows.groupBy(_._1)
    // garage: 4 sweeps × 3 registers; roof (2× interval): sweeps 0,2 only
    assert(byTarget("garage").size == 12)
    assert(byTarget("roof").size == 6)
    assert(byTarget("roof").map(_._3).toSet == Set(0L, 2L))
    assert(byTarget("garage").head._2 == 1234567890L)
    assert(byTarget("roof").head._2 == 9876543210L)
  }

  test("register-poll restart resumes from the checkpoint without re-emitting committed polls") {
    val s = spark
    import s.implicits._
    val ckpt = Files.createTempDirectory("poll_restart_ckpt").toString
    val sinkDir = Files.createTempDirectory("poll_restart_sink").toString
    val sink = new graft.streaming.BufferedStreamSink(sinkDir)
    def drain(maxPolls: Int): Unit = {
      val q = s.readStream.format("register-poll")
        .option("inverters", 1)
        .option("maxPolls", maxPolls)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          sink.writeBatch(b, id))
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    drain(2) // first run commits polls 0..1
    // restart: a fresh stream instance (available = 0) must resume at
    // the committed offset 2, not regress and re-emit polls 0..1
    drain(4)
    val polls = s.read.parquet(sinkDir).select($"poll").as[Long].collect().toSeq
    assert(polls.sorted == Seq(0L, 1L, 2L, 3L).flatMap(p => Seq.fill(3)(p)),
      s"expected each poll exactly once per register, got ${polls.groupBy(identity).view.mapValues(_.size).toMap}")
  }

  test("register-poll retry seam: transient read failures are retried without dropping rows") {
    val s = spark
    import s.implicits._
    val r0 = sources.RegisterPollSource.retriedReads.get()
    val c0 = sources.RegisterPollSource.reconnects.get()
    val ckpt = Files.createTempDirectory("poll_retry_ckpt").toString
    // EVERY read throws on its first 2 attempts; budget is 3 per
    // connection, so each read succeeds on attempt 3 with no reconnect
    val q = s.readStream.format("register-poll")
      .option("inverters", 2).option("maxPolls", 3)
      .option("failEvery", 1).option("failAttempts", 2).option("readRetries", 3)
      .load()
      .writeStream.format("memory").queryName("poll_retry_spec")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = s.table("poll_retry_spec")
      .select($"poll", $"inverter", $"register", $"raw")
      .as[(Long, Long, String, Long)].collect().toSeq
    // all 3 polls × 2 inverters × 3 registers arrive, values exact
    assert(rows.size == 18, s"got ${rows.size} rows")
    assert(rows.map(r => (r._1, r._2, r._3)).distinct.size == 18)
    val regs = sources.RegisterPollSource.Registers
    rows.foreach { case (poll, inv, reg, raw) =>
      assert(raw == sources.RegisterPollSource.raw(poll, inv, regs.indexWhere(_._1 == reg)))
    }
    // 18 reads × 2 transient failures each, all absorbed by retries
    assert(sources.RegisterPollSource.retriedReads.get() - r0 == 36L)
    assert(sources.RegisterPollSource.reconnects.get() - c0 == 0L)
  }

  test("register-poll retry seam: an exhausted read budget reconnects and recovers") {
    val s = spark
    import s.implicits._
    val c0 = sources.RegisterPollSource.reconnects.get()
    val ckpt = Files.createTempDirectory("poll_reconn_ckpt").toString
    // 3 failures vs a per-connection budget of 3: the third failure
    // kills the connection, the reader reconnects (solarman.py's
    // dead-socket path) and the read succeeds on the fresh connection
    val q = s.readStream.format("register-poll")
      .option("inverters", 1).option("maxPolls", 2)
      .option("failEvery", 1).option("failAttempts", 3).option("readRetries", 3)
      .load()
      .writeStream.format("memory").queryName("poll_reconn_spec")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = s.table("poll_reconn_spec")
      .select($"poll", $"register", $"raw").as[(Long, String, Long)].collect().toSeq
    assert(rows.size == 6, s"got ${rows.size} rows")
    assert(rows.map(r => (r._1, r._2)).distinct.size == 6)
    assert(sources.RegisterPollSource.reconnects.get() - c0 == 6L,
      "every read should have burned its budget and reconnected exactly once")
  }

  test("register-poll retry seam: failures across a restart neither drop nor duplicate rows") {
    val s = spark
    import s.implicits._
    val ckpt = Files.createTempDirectory("poll_retry_restart_ckpt").toString
    val sinkDir = Files.createTempDirectory("poll_retry_restart_sink").toString
    val sink = new graft.streaming.BufferedStreamSink(sinkDir)
    def drain(maxPolls: Int): Unit = {
      val q = s.readStream.format("register-poll")
        .option("inverters", 1).option("maxPolls", maxPolls)
        .option("failEvery", 2).option("failAttempts", 2).option("readRetries", 3)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          sink.writeBatch(b, id))
        .start()
      try q.awaitTermination(60000) finally q.stop()
    }
    drain(2)
    drain(4) // restart resumes at poll 2 with the same injected-failure pattern
    val polls = s.read.parquet(sinkDir).select($"poll").as[Long].collect().toSeq
    assert(polls.sorted == Seq(0L, 1L, 2L, 3L).flatMap(p => Seq.fill(3)(p)),
      s"expected each poll exactly once per register, got ${polls.groupBy(identity).view.mapValues(_.size).toMap}")
  }

  test("the catalog source drives a broadcast decode join over the feed") {
    val s = spark
    import s.implicits._
    val cat = s.read.format("register-catalog").load(writeCatalog())
    // map the feed's event types onto register names (the s1/s13
    // convention), then decode raw values with catalog scales
    val reg = typedLit(Map(
      "view" -> "dc_voltage", "click" -> "dc_amps", "purchase" -> "ac_watts",
      "signup" -> "ac_frequency", "churn" -> "inverter_temp"))
    val decoded = Tables.events(s, SfDir)
      .select($"event_id",
        coalesce(reg($"event_type"), lit("inverter_temp")).as("name"), $"value")
      .join(broadcast(cat), "name")
      .select($"event_id", $"name", ($"value" * $"scale").as("decoded"), $"unit")
    assert(decoded.count() == Tables.events(s, SfDir).count(),
      "every feed row must resolve a catalog register")
    val v = decoded.filter($"name" === "ac_frequency").select($"decoded").as[Double].head()
    assert(v > 0, "scaled decode must produce values")
  }
}
