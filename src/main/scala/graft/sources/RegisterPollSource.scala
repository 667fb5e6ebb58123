package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 MICRO-BATCH STREAMING source simulating the
  * reference's register poll loop (solarman.py:36-58: an asyncio
  * timer reads every configured register from every inverter each
  * interval). Spark-natively the poll loop IS a streaming source:
  * each micro-batch is one poll sweep, offsets count polls, and the
  * fleet × register fan-out is the batch's row set — so the whole
  * daemon becomes `readStream.format("register-poll") → decode →
  * window → sink`, with Structured Streaming owning scheduling,
  * retries and exactly-once progress (the checkpoint replaces the
  * daemon's ad-hoc retry queue).
  *
  * Readings are DETERMINISTIC functions of (poll, inverter,
  * register): this sandbox has no Modbus devices, and determinism is
  * what lets the spec replay a drained stream and assert exact rows
  * (a production implementation would issue the actual register read
  * inside [[PollPartitionReader]] — one partition per inverter, so
  * each executor polls its own devices in parallel).
  *
  * Options: `inverters` (fleet size, default 3), `maxPolls` (bound for
  * Trigger.AvailableNow drains, default Long.MaxValue), `intervalMs`
  * (timestamp spacing of simulated polls, default 1000).
  *
  * Retry options (the reference's device-read failure semantics —
  * solarman.py:340-361 retries each register read with a 1 s sleep
  * between attempts; solarman.py:316-337 reconnects when the socket
  * has died and tries again): `readRetries` (attempts per connection,
  * default 3), `retryBackoffMs` (sleep between attempts, default 0 so
  * specs run fast; the daemon uses 1000), and the deterministic
  * failure injection `failEvery` / `failAttempts` (every read whose
  * key-hash % failEvery == 0 throws on its first failAttempts
  * attempts, then succeeds — default 0 = no injected failures). A
  * read that exhausts its per-connection budget triggers ONE
  * reconnect with a fresh budget; if it still fails the task throws
  * and Spark replays the partition — the offset contract makes that
  * replay exactly-once, so transient device failures never drop or
  * duplicate a sweep's rows.
  */
class RegisterPollSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "register-poll"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RegisterPollSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val intervalMs = opts.getOrDefault("intervalMs", "1000").toLong
    // fleet config: a targets file (the reference's targets.json in the
    // same whitespace-catalog style as registers.txt) or a synthetic
    // fleet of `inverters` identical targets
    val targets = Option(opts.get("targets")) match {
      case Some(path) => RegisterPollSource.loadTargets(path, intervalMs)
      case None =>
        (0L until opts.getOrDefault("inverters", "3").toLong)
          .map(i => PollTarget(i, s"inv$i", 1700000000L + i, intervalMs))
    }
    new RegisterPollTable(
      targets = targets,
      maxPolls = opts.getOrDefault("maxPolls", Long.MaxValue.toString).toLong,
      intervalMs = intervalMs,
      policy = ReadPolicy(
        readRetries = opts.getOrDefault("readRetries", "3").toInt,
        backoffMs = opts.getOrDefault("retryBackoffMs", "0").toLong,
        failEvery = opts.getOrDefault("failEvery", "0").toLong,
        failAttempts = opts.getOrDefault("failAttempts", "2").toInt))
  }
}

/** One configured logging-stick target (targets.json:
  * name/serial_number/interval — ip/port/slave id are connection
  * details that live where the device read happens). A target with a
  * slower `intervalMs` than the sweep cadence only emits on the
  * sweeps its interval divides. */
case class PollTarget(idx: Long, name: String, serial: Long, intervalMs: Long)

/** Device-read retry policy plus deterministic failure injection (the
  * sandbox's stand-in for flaky Modbus sockets). `failEvery = 0`
  * disables injection; otherwise every read whose key-hash %
  * failEvery == 0 throws on its first `failAttempts` attempts and
  * succeeds after — deterministic, so a replayed partition observes
  * the same failures and the same final rows. */
case class ReadPolicy(readRetries: Int, backoffMs: Long, failEvery: Long, failAttempts: Int) {
  require(readRetries >= 1, s"readRetries must be >= 1, got $readRetries")
}

object RegisterPollSource {
  val Schema: StructType = StructType(Seq(
    StructField("poll", LongType, nullable = false),
    StructField("inverter", LongType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("serial", LongType, nullable = false),
    StructField("register", StringType, nullable = false),
    StructField("raw", LongType, nullable = false),
    StructField("scaled", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** Targets file: one `name serial interval_s` line per logging
    * stick (comments/blank lines skipped) — targets.json re-expressed
    * in the registers.txt catalog style. */
  def loadTargets(path: String, defaultIntervalMs: Long): Seq[PollTarget] = {
    val src = scala.io.Source.fromFile(path)
    try {
      src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .zipWithIndex
        .map { case (line, i) =>
          val f = line.split("\\s+")
          require(f.length >= 2, s"register-poll targets: expected 'name serial [interval_s]', got '$line'")
          val iv = if (f.length >= 3) f(2).toLong * 1000L else defaultIntervalMs
          PollTarget(i.toLong, f(0), f(1).toLong, iv)
        }
        .toSeq
    } finally src.close()
  }

  /** The polled register map (a slice of registers.txt's catalog). */
  val Registers: Seq[(String, Double)] =
    Seq("dc_voltage" -> 0.1, "ac_watts" -> 1.0, "ac_frequency" -> 0.01)

  /** 2026-01-01T00:00:00Z in microseconds. */
  val EpochBaseUs: Long = 1767225600000000L

  /** Deterministic raw reading for (poll, inverter, register idx). */
  def raw(poll: Long, inverter: Long, reg: Int): Long =
    math.floorMod(poll * 2654435761L + inverter * 40503L + reg * 69427L, 10000L)

  /** Injected transient-failure count for one read: how many leading
    * attempts of (poll, inverter, reg) throw before the read
    * succeeds. Keyed on the read identity so retries and replays see
    * identical behavior. */
  def injectedFailures(poll: Long, inverter: Long, reg: Int, policy: ReadPolicy): Int =
    if (policy.failEvery <= 0) 0
    else if (math.floorMod(poll * 7919L + inverter * 104729L + reg * 1299721L,
      policy.failEvery) == 0L) policy.failAttempts
    else 0

  /** Observability for specs (single-JVM local mode): total retried
    * read attempts and socket reconnects across all partitions. */
  val retriedReads = new java.util.concurrent.atomic.AtomicLong(0L)
  val reconnects = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** A simulated register read failed (the sandbox analogue of a Modbus
  * timeout / closed-socket IOError). */
class DeviceReadException(msg: String) extends java.io.IOException(msg)

/** Offset = number of completed poll sweeps. */
private case class PollOffset(polls: Long) extends Offset {
  override def json(): String = polls.toString
}

private class RegisterPollTable(targets: Seq[PollTarget], maxPolls: Long, intervalMs: Long,
                                policy: ReadPolicy)
  extends Table with SupportsRead {
  override def name(): String = s"register-poll(${targets.size} targets)"
  override def schema(): StructType = RegisterPollSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = RegisterPollSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new RegisterPollStream(targets, maxPolls, intervalMs, policy)
    }
}

private class RegisterPollStream(targets: Seq[PollTarget], maxPolls: Long, intervalMs: Long,
                                 policy: ReadPolicy)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // One poll sweep becomes available per latestOffset() call (the
  // trigger cadence IS the poll cadence), bounded by maxPolls so
  // drains terminate. Under Trigger.AvailableNow, a bounded fleet
  // (finite maxPolls) drains to maxPolls; an unbounded one drains
  // exactly the sweep in flight — a fixed target captured at prepare
  // time, so the drain terminates instead of planning an endless
  // batch.
  private var available = 0L
  private var drainTarget = -1L

  override def initialOffset(): Offset = PollOffset(0L)
  override def latestOffset(): Offset = {
    if (available < maxPolls) available += 1
    PollOffset(available)
  }
  override def prepareForTriggerAvailableNow(): Unit =
    drainTarget = if (maxPolls != Long.MaxValue) maxPolls else available + 1
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // a restarted query resumes from its checkpoint: never regress
    // behind the committed start offset (a fresh instance's counter
    // starts at 0 — re-emitting polls the sink already committed
    // would break the exactly-once contract)
    val committed = start.asInstanceOf[PollOffset].polls
    available = math.max(available, committed)
    if (drainTarget >= 0) PollOffset(math.max(committed, drainTarget))
    else latestOffset()
  }
  override def deserializeOffset(json: String): Offset = PollOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PollOffset].polls
    val e = end.asInstanceOf[PollOffset].polls
    // one partition per target: each executor polls its own devices
    targets.map(t => PollPartition(s, e, t, intervalMs, policy)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PollPartitionReader(partition.asInstanceOf[PollPartition])
    }
}

private case class PollPartition(startPoll: Long, endPoll: Long, target: PollTarget,
                                 sweepMs: Long, policy: ReadPolicy) extends InputPartition

/** Emits one row per (poll in [start, end), register) for this
  * partition's target — poll p is produced by the batch whose offset
  * range covers it, each exactly once — honoring the target's own
  * poll interval (a 60 s target on a 30 s sweep emits every 2nd
  * sweep). This is where a production reader would issue the
  * Modbus/HTTP register reads — through [[readRegister]], which
  * carries the daemon's retry/reconnect semantics. */
private class PollPartitionReader(p: PollPartition) extends PartitionReader[InternalRow] {
  import RegisterPollSource._

  /** One register read with the daemon's failure handling: up to
    * `readRetries` attempts on the current connection with
    * `backoffMs` between them (solarman.py:340-361), then ONE
    * reconnect — the daemon's response to a socket that died under it
    * (solarman.py:316-337) — with a fresh attempt budget. If the read
    * still fails, rethrow: the task fails, and for a TRANSIENT fault
    * Spark's partition replay (which the offset contract makes
    * exactly-once) gets a clean attempt. Note the test injection is
    * deterministic, so it models only the absorbable case: injected
    * failure counts must stay within the 2×readRetries budget
    * (retries + one reconnect) or every replay fails identically and
    * the query dies — and local mode has maxTaskFailures=1, so there
    * is no replay at all there, just the query failing. */
  private def readRegister(poll: Long, regIdx: Int): Long = {
    val failures = injectedFailures(poll, p.target.idx, regIdx, p.policy)
    var attempt = 0
    var reconnected = false
    while (true) {
      attempt += 1
      try {
        if (attempt <= failures)
          throw new DeviceReadException(
            s"read failed: target=${p.target.name} poll=$poll reg=$regIdx attempt=$attempt")
        return raw(poll, p.target.idx, regIdx)
      } catch {
        case e: DeviceReadException =>
          val budgetLeft = attempt % p.policy.readRetries != 0
          if (budgetLeft) retriedReads.incrementAndGet()
          else if (!reconnected) { reconnected = true; reconnects.incrementAndGet() }
          else throw e
          if (p.policy.backoffMs > 0) Thread.sleep(p.policy.backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private val rows =
    for {
      poll <- Iterator.range(p.startPoll, p.endPoll)
      if (poll * p.sweepMs) % p.target.intervalMs == 0
      (reg, regIdx) <- Registers.iterator.zipWithIndex
    } yield {
      val (name, sc) = reg
      val r = readRegister(poll, regIdx)
      InternalRow(poll, p.target.idx, UTF8String.fromString(p.target.name),
        p.target.serial, UTF8String.fromString(name), r,
        r * sc, EpochBaseUs + poll * p.sweepMs * 1000L)
    }
  private var row: InternalRow = _
  override def next(): Boolean = if (rows.hasNext) { row = rows.next(); true } else false
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
