package graft.streaming

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

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

  /** Sliding-window rollup: 1-hour windows every 15 minutes — the
    * streaming "downsample with overlap" read the reference's hourly
    * dashboards imply. Each event lands in exactly 4 windows; Spark
    * expands map-side (no extra shuffle vs the tumbling case). */
  def slidingTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        davg($"value").as("avg_value"),
        max($"value").as("max_value"))
  }

  // ---------------------------------------------------------------------
  // st2: driver-checked batch-equivalent of the sliding-window
  // aggregation, computed TWO-LEVEL: window('1 hour','15 minutes')
  // Expands every event ×4 before the partial aggregate, which is pure
  // map-side CPU waste when the hop divides the width. Instead,
  // aggregate to 15-min TUMBLING buckets first (one partial per
  // bucket), then roll each bucket into the 4 sliding windows that
  // contain it — the ×4 expansion applies to bucket rows, not event
  // rows. count/sum/max are decomposable and avg is the exact decimal
  // sum over the final count, so the result is bit-identical to
  // slidingTransform's (pinned by StreamingSpec; the streaming path
  // keeps slidingTransform, whose state store needs the per-window
  // rows).
  // ---------------------------------------------------------------------
  def st2SlidingWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val buckets = Tables.events(s, d)
      .groupBy(window($"ts", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("bn"), sum(dec($"value")).as("bsum"), max($"value").as("bmax"))
      .select($"window.start".as("b_start"), $"event_type", $"bn", $"bsum", $"bmax")
    buckets
      .select($"b_start", $"event_type", $"bn", $"bsum", $"bmax",
        explode(array((0 until 4).map(lit): _*)).as("k"))
      .select(expr("timestampadd(MINUTE, -15 * k, b_start)").as("w_start"),
        $"event_type", $"bn", $"bsum", $"bmax")
      .groupBy($"w_start", $"event_type")
      .agg(sum($"bn").as("n"), sum($"bsum").as("vsum"), max($"bmax").as("max_value"))
      .select($"w_start", $"event_type", $"n",
        ($"vsum".cast("double") / $"n").as("avg_value"), $"max_value")
      .orderBy($"w_start", $"event_type")
  }

  /** Native session windows: dynamic gap-based sessions (30 min) per
    * user — the Structured-Streaming-capable operator behind s10's
    * manual cumsum sessionization (in a stream it needs only a
    * watermark on ts). Session start = first event, end = last event
    * + gap; events merge while consecutive gaps are < 30 min. */
  def sessionTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = if (df.isStreaming) df.withWatermark("ts", "1 hour") else df
    in.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        davg($"value").as("avg_value"))
  }

  def st3SessionWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sessionTransform(Tables.events(s, d))
      .select($"user_id", $"session_window.start".as("s_start"),
        $"session_window.end".as("s_end"), $"n_events", $"avg_value")
      .orderBy($"user_id", $"s_start")
  }

  /** Watermarked streaming dedup — drops re-delivered events (at-least-
    * once upstream, the reference's retry loop re-sends on failed
    * inserts, solarman.py:207-216) while keeping state bounded: an
    * event_id is remembered only within the watermark horizon.
    * Batch-side the same call degrades to a plain dropDuplicates
    * (Spark rejects the within-watermark variant on batch plans,
    * where it is equivalent anyway). */
  def dedupTransform(df: DataFrame): DataFrame =
    if (df.isStreaming)
      df.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("event_id")
    else df.dropDuplicates("event_id")

  /** The WHOLE reference daemon as one declarative pipeline
    * (solarman.py end to end): polled register readings (the
    * register-poll DSv2 source) are decoded against the register
    * catalog (broadcast dim from the register-catalog DSv2 source —
    * solarman.py's table-driven decode walk) and rolled up into
    * watermarked hourly per-(inverter, register) aggregates, ready
    * for a buffered sink. Everything the 420-line daemon does —
    * scheduling, retry, batching, insert — is owned by Structured
    * Streaming + the sink; this function is only the data logic, and
    * it runs identically on a batch DataFrame (spec pins
    * stream == batch). */
  def daemonPipeline(readings: DataFrame, catalog: DataFrame): DataFrame = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings
      .join(broadcast(catalog.select($"name", $"unit")),
        readings("register") === catalog("name"))
      .withWatermark("ts", "90 minutes")
      .groupBy(window($"ts", "1 hour"), $"inverter", $"register", $"unit")
      .agg(
        count(lit(1)).as("n"),
        davg($"scaled").as("avg_value"),
        max($"scaled").as("max_value"))
      .select($"window.start".as("hour"), $"inverter", $"register", $"unit",
        $"n", $"avg_value", $"max_value")
  }

  /** Streaming corpus-ingest pipeline — the training-data preparation
    * loop (SURVEY §2.F/D) as one composable transform over a document
    * feed: quality-gate each arriving doc (t3's token-count filter +
    * t12's full Gopher repetition battery, the same kernels batch
    * curation runs), fingerprint its content (t4's md5), and drop exact
    * duplicates / re-deliveries. On a stream the dedup state is
    * bounded by the watermark horizon (an exact-dedup pass over an
    * unbounded corpus feed cannot keep every fingerprint forever; the
    * horizon is the dedup window, exactly how at-scale ingest dedup is
    * run); on a batch Dataset the same call is a plain fingerprint
    * dropDuplicates (stream==batch pinned by StreamingSpec). */
  def corpusIngestTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val scored = df
      .withColumn("n_tokens", size(graft.text.Text.toks($"text")))
      .filter($"n_tokens" >= graft.text.Text.MinTokens &&
        $"n_tokens" <= graft.text.Text.MaxTokens)
      // the FULL t12 Gopher repetition battery (Rae 2021 Table A1:
      // duplicate 2-/3-gram fractions + top-gram slot fractions, the
      // same kernel t12 runs in batch — shared via repetitionSignals,
      // so gate and query can never drift) — boilerplate/spam never
      // enters the corpus in stream OR batch; all four signals are
      // map-side array expressions, so the gate adds zero shuffles.
      // The battery REPLACED the earlier single t9 rule (r11): at the
      // published thresholds t9's tight 0.05 duplicate-bigram cut
      // strictly dominates every battery signal, so stacking both
      // would silently reduce the battery to the single rule; the
      // battery is Gopher's production gate, t9 remains its own
      // stricter single-signal query. (< 3 tokens can't reach here —
      // the MinTokens gate already dropped those — but guard anyway
      // so the transform composes safely with other gates.)
      // The battery kernel needs ≥ 3 tokens (its trigram sequence() is
      // invalid below that), and an `size < 3 ||` short-circuit is NOT
      // a safe guard — optimizer/codegen may evaluate the right branch
      // on short rows anyway (observed: slice(start=0) task failure).
      // So the signals are computed on a padded stand-in array for
      // short rows and the real gate keys on the size check; short
      // rows keep their bypass semantics with a total expression.
      .withColumn("lt", graft.text.Text.toks(lower($"text")))
      .withColumn("lt3",
        when(size($"lt") >= 3, $"lt")
          .otherwise(array(lit("a"), lit("b"), lit("c"))))
      .filter(size($"lt") < 3 ||
        graft.text.Text.repetitionKeep(graft.text.Text.repetitionSignals($"lt3")))
      .drop("lt", "lt3")
      .withColumn("fp", md5($"text"))
    if (scored.isStreaming)
      scored.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark("fp")
    else scored.dropDuplicates("fp")
  }

  /** Unigram-LM quality gate (t14's OOV-fraction rule) against a
    * PRE-TRAINED top-V vocabulary. A stream cannot self-train the
    * language model — the corpus count table is a batch artifact,
    * refreshed offline and shipped to the gate (the CCNet deployment
    * shape), so the vocabulary is a PARAMETER here, not a join: a
    * literal array whose membership test is a map-side higher-order
    * filter. Zero shuffles, zero state; stream == batch trivially and
    * the spec pins the keep set against batch t14 on the same corpus.
    * Emits t14's graded `oov_frac` column; keeps docs at or under
    * [[graft.text.Text.OovMax]]. */
  def lmGateTransform(df: DataFrame, vocab: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val varr = array(vocab.map(lit): _*)
    df
      .withColumn("lmt", graft.text.Text.toks(lower($"text")))
      .withColumn("oov_frac",
        size(filter($"lmt", w => !array_contains(varr, w))).cast("double") /
          size($"lmt").cast("double"))
      .filter($"oov_frac" <= graft.text.Text.OovMax)
      .drop("lmt")
  }

  /** PII scrub stage (t15's fused sequential redaction chain) as a
    * composable ingest stage: emails, then IPs on the email-redacted
    * text, then phones — `text` is replaced in place stage by stage
    * (so a span never double-counts across classes) and the per-class
    * match counts plus the `pii_clean` flag ride along. Pure
    * codegen'd projection — zero shuffles, zero state; the regex
    * semantics themselves are pinned by t15's crafted-corpus spec. */
  def piiScrubTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.text.Text.{PiiEmailRe, PiiIpRe, PiiPhoneRe}
    df
      .withColumn("n_emails",
        size(regexp_extract_all($"text", lit(PiiEmailRe), lit(0))))
      .withColumn("text", regexp_replace($"text", PiiEmailRe, "<EMAIL>"))
      .withColumn("n_ips",
        size(regexp_extract_all($"text", lit(PiiIpRe), lit(0))))
      .withColumn("text", regexp_replace($"text", PiiIpRe, "<IP>"))
      .withColumn("n_phones",
        size(regexp_extract_all($"text", lit(PiiPhoneRe), lit(0))))
      .withColumn("text", regexp_replace($"text", PiiPhoneRe, "<PHONE>"))
      .withColumn("pii_clean", $"n_emails" + $"n_ips" + $"n_phones" === 0)
  }

  /** The full release-pipeline ingest: quality battery + exact dedup
    * ([[corpusIngestTransform]]) → unigram-LM gate (t14) → PII scrub
    * (t15) — every gate batch curation runs before a corpus release,
    * in the same order (score on ORIGINAL text, scrub last, so the
    * LM never sees placeholder tokens). The two added stages are
    * map-side projections: the composed stream still carries exactly
    * one stateful operator (the watermarked dedup). */
  def releaseIngestTransform(df: DataFrame, vocab: Seq[String]): DataFrame =
    piiScrubTransform(lmGateTransform(corpusIngestTransform(df), vocab))

  /** Stream-stream interval join: enrich an event stream with the
    * order stream's rows from the trailing 2-hour interval. Both sides
    * carry watermarks and the join condition bounds event time on both
    * sides, so Spark can expire join state — the unbounded-feed-safe
    * form of e5's enrichment. On batch inputs the watermarks are
    * no-ops and this is a plain range join (how StreamingSpec pins
    * stream == batch). */
  def enrichTransform(events: DataFrame, orders: DataFrame): DataFrame = {
    val e = events.withWatermark("ts", "1 hour")
    val o = orders.withWatermark("o_ts", "1 hour")
    e.join(o, expr(
      "user_id = o_user AND o_ts >= ts - INTERVAL 2 HOURS AND o_ts <= ts"))
  }

  // ---------------------------------------------------------------------
  // st13: graded batch-equivalent of the STREAM-STREAM interval join —
  // the exact [[enrichTransform]] the stream-stream spec runs with two
  // MemoryStreams, driven here over the click and purchase streams of
  // the events feed (click enriched with the same user's purchases
  // from the trailing 2 hours). The join plans as an equi shuffle on
  // user_id with the time range as a join filter (e8's scale shape);
  // in a real stream both watermarks plus the two-sided time bound
  // make the join state expirable, so an unbounded feed runs in
  // bounded memory. delay_s is exact integer seconds.
  // ---------------------------------------------------------------------
  def st13StreamEnrich(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val clicks = Tables.events(s, d)
      .filter($"event_type" === "click")
      .select($"event_id".as("eid"), $"ts", $"user_id")
    val purchases = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"event_id".as("o_id"), $"user_id".as("o_user"),
        $"ts".as("o_ts"))
    enrichTransform(clicks, purchases)
      .select($"user_id", $"eid".as("click_id"), $"o_id".as("purchase_id"),
        expr("(unix_micros(ts) - unix_micros(o_ts)) div 1000000")
          .as("delay_s"))
      .orderBy($"click_id", $"purchase_id")
  }

  /** One raw counter reading. Values are fixed-point cents (the feed
    * carries 2-decimal readings) so state and deltas stay exact. */
  case class Reading(inverter: Long, ts: java.sql.Timestamp, event_id: Long, cents: Long)

  /** One emitted counter increment; `is_reset` marks a drop in the
    * monotonic counter (device restart → the new value IS the
    * increment, the reference's reset-clamp rule, cf. s6). */
  case class CounterDelta(inverter: Long, ts: java.sql.Timestamp,
                          delta_cents: Long, is_reset: Boolean)

  /** Cross-batch state: the last counter reading (public — the state
    * encoder's generated code must reach the constructor). */
  case class CounterState(lastCents: Long)

  /** Stateful streaming counter-delta via flatMapGroupsWithState: the
    * per-inverter last reading is the ONLY state carried across
    * micro-batches, so an unbounded feed runs in bounded memory
    * (state size = #inverters × 8 bytes — exactly the accumulator the
    * reference daemon keeps per inverter between polls). Within a
    * batch, readings are ordered by (ts, event_id); production pairs
    * this with a watermark that drops late rows before the stateful
    * stage. Works identically on a batch Dataset (empty initial
    * state), which is how StreamingSpec pins stream == batch (s6).
    */
  def statefulCounterDelta(ds: Dataset[Reading]): Dataset[CounterDelta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.inverter)
      .flatMapGroupsWithState[CounterState, CounterDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (inv: Long, it: Iterator[Reading], state: GroupState[CounterState]) =>
          val sorted = it.toIndexedSeq.sortBy(r => (r.ts.getTime, r.event_id))
          var last = state.getOption.map(_.lastCents)
          val out = sorted.flatMap { r =>
            val d = last.map { p =>
              if (r.cents >= p) CounterDelta(inv, r.ts, r.cents - p, is_reset = false)
              else CounterDelta(inv, r.ts, r.cents, is_reset = true)
            }
            last = Some(r.cents)
            d
          }
          last.foreach(c => state.update(CounterState(c)))
          out.iterator
      }
  }

  // ---------------------------------------------------------------------
  // st4: graded surface for [[dedupTransform]] — the reference's
  // at-least-once retry loop re-sends whole insert batches on failure
  // (solarman.py:207-216), so the ingest path must be idempotent under
  // re-delivery. The feed here is the events table with a
  // DETERMINISTIC ~25% re-delivery (md5(event_id) first hex digit in
  // 0-3 — content-addressed, reproducible across runs and shard
  // layouts, t7 discipline); re-delivered rows are byte-identical to
  // their originals, so dropDuplicates' keep-any is value-
  // deterministic and the post-dedup rollup must equal the CLEAN
  // table's rollup — which is exactly what the oracle computes.
  // Stream-side the same transform is watermark-bounded
  // (dropDuplicatesWithinWatermark; stream==batch in StreamingSpec).
  // At 100 TB: dedup is one hash shuffle on event_id; the duplicate
  // surplus never reaches the rollup.
  // ---------------------------------------------------------------------
  def st4DedupIngest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val redelivered = ev.filter(
      substring(md5($"event_id".cast("string")), 1, 1).isin("0", "1", "2", "3"))
    dedupTransform(ev.unionByName(redelivered))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        dsum($"value").as("sum_value"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  /** Windowed higher-moment rollup — the streaming face of s28's
    * `skewPop`/`kurtPop` family. The state per open (hour, stream)
    * window is ONE row of exact decimal power sums (count/Σc/Σc²/Σc³/
    * Σc⁴ are all decomposable, so micro-batches merge losslessly and
    * late data within the watermark revises exactly); the central-
    * moment closed forms stay a stateless projection AFTER the
    * aggregate, outside the state store. Batch and stream share this
    * transform (st1's discipline). */
  def momentsTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val D38 = DecimalType(38, 0)
    df.select($"ts", $"event_type", (dec($"value") * 100).cast("long").as("c"))
      .select($"ts", $"event_type", $"c", ($"c" * $"c").as("c2"))
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"c".cast(D38)).as("s1"),
        sum($"c2".cast(D38)).as("s2"),
        sum(($"c2" * $"c").cast(D38)).as("s3"),
        sum($"c2".cast(D38) * $"c2".cast(D38)).as("s4"))
  }

  /** s28's double closed-form tree over [[momentsTransform]] output —
    * shared by the batch query and the streaming spec so the finalize
    * step cannot drift from the oracle. */
  def momentsFinalize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select($"window.start".as("hour"), $"event_type", $"n",
      ($"s1".cast("double") / $"n".cast("double")).as("mu"),
      ($"s2".cast("double") / $"n".cast("double")).as("r2"),
      ($"s3".cast("double") / $"n".cast("double")).as("r3"),
      ($"s4".cast("double") / $"n".cast("double")).as("r4"))
      .select($"hour", $"event_type", $"n", $"mu",
        ($"r2" - $"mu" * $"mu").as("m2"),
        ($"r3" - lit(3.0) * $"mu" * $"r2" + lit(2.0) * $"mu" * $"mu" * $"mu")
          .as("m3"),
        ($"r4" - lit(4.0) * $"mu" * $"r3" + lit(6.0) * $"mu" * $"mu" * $"r2"
          - lit(3.0) * $"mu" * $"mu" * $"mu" * $"mu").as("m4"))
      .filter($"m2" > 0.0)
      .select($"hour", $"event_type", $"n",
        ($"mu" / 100.0).as("mean_v"),
        (sqrt($"m2") / 100.0).as("stddev_pop"),
        ($"m3" / ($"m2" * sqrt($"m2"))).as("skew_pop"),
        ($"m4" / ($"m2" * $"m2")).as("kurt_pop"))
  }

  // ---------------------------------------------------------------------
  // st5: driver-checked batch-equivalent of the windowed moments
  // pipeline (real stream covered by StreamingSpec with MemoryStream).
  // ---------------------------------------------------------------------
  def st5StreamMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    momentsFinalize(momentsTransform(Tables.events(s, d)))
      .orderBy($"hour", $"event_type")
  }

  /** One funnel event: packed = us*8 + typecode (e21's encoding). */
  case class FunnelEvt(user_id: Long, packed: Long)

  /** Cross-batch funnel state — EXACTLY e21's fold accumulator
    * (chain start µs, last matched µs, level reached): the batch
    * fold's accumulator IS the streaming state, so stream and batch
    * cannot diverge by construction. ≤ 24 bytes per user. */
  case class FunnelState(start: Long, last: Long, level: Int)

  /** Per-user funnel level emitted after each micro-batch. */
  case class FunnelLevel(user_id: Long, funnel_level: Long)

  /** e21's strict_increase transition, shared verbatim by every
    * micro-batch step and the batch form. */
  private def funnelStep(acc: FunnelState, packed: Long): FunnelState = {
    val us = packed >> 3
    val tc = (packed & 7L).toInt
    if (acc.level == 0 && tc == 1) FunnelState(us, us, 1)
    else if (acc.level == 1 && tc == 2 && us > acc.last &&
      us - acc.start <= 21600000000L) FunnelState(acc.start, us, 2)
    else if (acc.level == 2 && tc == 3 && us > acc.last &&
      us - acc.start <= 21600000000L) FunnelState(acc.start, us, 3)
    else acc
  }

  /** Stateful streaming windowFunnel('strict_increase') via
    * flatMapGroupsWithState: within a micro-batch events fold in
    * packed (us, typecode) order — e21's exact sort — and the
    * accumulator carries across batches, so an unbounded feed runs
    * the funnel in bounded memory (state = #users × one accumulator).
    * Emits the level reached after each batch (append mode; the LAST
    * emission per user is the current answer — the spec reads it via
    * max, levels are monotone). Production pairs this with a
    * watermark so late rows can't arrive behind an already-advanced
    * chain (statefulCounterDelta's discipline); the spec feeds
    * time-split batches, the contract an event-time-ordered resume
    * from a checkpoint provides. */
  def statefulFunnel(ds: Dataset[FunnelEvt]): Dataset[FunnelLevel] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelLevel](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvt], state: GroupState[FunnelState]) =>
          val sorted = it.map(_.packed).toIndexedSeq.sorted
          val acc0 = state.getOption.getOrElse(FunnelState(0L, 0L, 0))
          val acc = sorted.foldLeft(acc0)(funnelStep)
          state.update(acc)
          Iterator.single(FunnelLevel(uid, acc.level.toLong))
      }
  }

  // ---------------------------------------------------------------------
  // st6: graded batch-equivalent of the streaming strict_increase
  // funnel — the same stateful operator run over the batch Dataset
  // (empty initial state, one "micro-batch"), rolled up to the level
  // distribution. The oracle is e21's: the stateful operator and the
  // codegen'd batch fold must agree bit-for-bit, and the cross-
  // micro-batch resume is pinned by StreamingSpec (state carries the
  // accumulator, so splitting the feed cannot change the answer).
  // ---------------------------------------------------------------------
  def st6StreamFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tc = when($"event_type" === "view", 1L)
      .when($"event_type" === "click", 2L)
      .when($"event_type" === "purchase", 3L)
      .otherwise(0L)
    val evts = Tables.events(s, d)
      .select($"user_id", (unix_micros($"ts") * 8 + tc).as("packed"))
      .as[FunnelEvt]
    statefulFunnel(evts)
      .groupBy($"funnel_level")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"funnel_level")
  }

  /** st7's summary width: ≥ the event-type cardinality, so the
    * Misra-Gries summary NEVER evicts and the streaming sketch is
    * EXACT — which is what makes the query oracle-gradeable. The
    * production setting (w ≪ distinct items) keeps the same plan and
    * state shape with the ±n/w bound t13's spec pins. */
  val StreamTopKW = 64
  val StreamTopK = 3

  /** Windowed streaming heavy-hitters: the mergeable ApproxTopKAgg
    * summary as STREAMING STATE — per open hour window the state is
    * one bounded (≤ w entries) map, micro-batches OR into it via the
    * aggregate's merge (the same partial-merge path the batch plan
    * uses map-side), so an unbounded feed tracks its top event types
    * in O(w) per window. Shared by the graded batch plan and the
    * stream==batch spec (st1 discipline). */
  def topkTransform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select($"ts", $"event_type")
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"))
      .agg(graft.functions.GraftFunctions
        .approxTopK($"event_type", StreamTopK, StreamTopKW).as("tk"))
  }

  /** Explode the summary to scalar graded rows (comparator contract:
    * no array columns in oracled output). */
  def topkFinalize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select($"window.start".as("hour"), posexplode($"tk"))
      .select($"hour", ($"pos" + 1).cast("long").as("rank"),
        $"col.item".as("event_type"), $"col.est".as("n_events"))
  }

  // ---------------------------------------------------------------------
  // st7: graded batch-equivalent of the streaming windowed top-k
  // (real stream covered by StreamingSpec). With w ≥ #event types the
  // summary is exact, so the oracle is plain per-hour counts ranked
  // by (count DESC, type ASC) — the aggregate's own output order.
  // ---------------------------------------------------------------------
  def st7StreamTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    topkFinalize(topkTransform(Tables.events(s, d)))
      .orderBy($"hour", $"rank")
  }

  /** st9's sketch capacity: with k ≥ the within-window update count
    * the q-digest's compression threshold n/k is zero, no node ever
    * merges, and the sketch returns EXACT rank-ceil(q·n) order
    * statistics — which is what makes the query oracle-gradeable
    * (st7's w ≥ cardinality discipline, same trick one family over).
    * Production uses k ≈ 256 and inherits QDigestSpec's (B/k)·n
    * bound with the identical plan and state shape. */
  val StreamQuantK = 1 << 20
  val StreamQuantLevels = Seq(0.5, 0.9)

  /** Windowed streaming quantiles: the mergeable q-digest summary as
    * STREAMING STATE — per open hour window the state is one bounded
    * node map; micro-batches merge into it via the aggregate's own
    * partial-merge path (the map-side combine the batch plan uses),
    * so an unbounded feed tracks per-window wattage quantiles in
    * O(digest) memory per window. Shared by the graded batch plan and
    * the stream==batch spec. */
  def quantileTransform(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.withWatermark("ts", "2 hours")
      .filter($"event_type" === "view")
      .groupBy(window($"ts", "1 hour"), $"user_id".as("inverter"))
      .agg(count(lit(1)).as("n"),
        graft.functions.GraftFunctions.qdigestQuantiles(
          (dec($"value") * 100).cast("long"), StreamQuantLevels, 17,
          StreamQuantK).as("qs"))
  }

  def quantileFinalize(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select($"window.start".as("hour"), $"inverter", $"n",
        ($"qs" (0).cast("double") / 100.0).as("p50_watts"),
        ($"qs" (1).cast("double") / 100.0).as("p90_watts"))
      .orderBy($"hour", $"inverter")
  }

  // ---------------------------------------------------------------------
  // st9: graded batch-equivalent of the streaming windowed quantiles —
  // with k above the window cardinality the digest is exact, so the
  // oracle is the plain rank-ceil(q·n) order statistic per (hour,
  // inverter); the cross-micro-batch merge path is pinned by
  // StreamingSpec (split feed == whole feed == batch).
  // ---------------------------------------------------------------------
  def st9StreamQuantile(s: SparkSession, d: String): DataFrame =
    quantileFinalize(quantileTransform(Tables.events(s, d)))

  /** st8's per-inverter poll event: (µs << 3 | unused) not needed —
    * gaps only need the timestamp and a stable tiebreak. */
  case class PollEvt(inverter: Long, us: Long, event_id: Long)
  case class GapState(lastUs: Long)
  case class GapOut(inverter: Long, gap_start_us: Long, gap_us: Long)

  /** Outage threshold shared by the stateful operator, the graded
    * rollup and the oracle (s8's 2-hour rule). */
  val GapThresholdUs: Long = 2L * 3600 * 1000000

  /** Stateful streaming OUTAGE DETECTION via flatMapGroupsWithState —
    * the streaming form of s8: the per-inverter last poll timestamp is
    * the ONLY state carried across micro-batches, so a gap that
    * SPANS a batch boundary (the case a per-batch window misses) is
    * still emitted: the first reading of a new batch compares against
    * the carried watermark-side state, not the batch's own lag().
    * Within a batch, readings fold in (us, event_id) order —
    * statefulCounterDelta's discipline. State = #inverters × 8 bytes;
    * an unbounded feed runs in bounded memory, and batch == stream
    * over any batch split (StreamingSpec pins it).
    */
  def statefulGapDetect(ds: Dataset[PollEvt]): Dataset[GapOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.inverter)
      .flatMapGroupsWithState[GapState, GapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (inv: Long, it: Iterator[PollEvt], state: GroupState[GapState]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.us, e.event_id))
          var last = state.getOption.map(_.lastUs)
          val out = sorted.flatMap { e =>
            val g = last.flatMap { p =>
              if (e.us - p > GapThresholdUs) Some(GapOut(inv, p, e.us - p))
              else None
            }
            last = Some(math.max(last.getOrElse(Long.MinValue), e.us))
            g
          }
          last.foreach(u => state.update(GapState(u)))
          out.iterator
      }
  }

  // ---------------------------------------------------------------------
  // st8: graded batch-equivalent of the streaming outage detector —
  // the stateful operator over the whole batch (empty initial state)
  // must equal the lag()-window form the oracle computes (the same
  // identity s8 grades), rolled up per inverter. The streaming-only
  // value (cross-batch gap continuity) is pinned by StreamingSpec's
  // split-feed equivalence.
  // ---------------------------------------------------------------------
  def st8StreamGaps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evts = Tables.events(s, d)
      .select($"user_id".as("inverter"), unix_micros($"ts").as("us"), $"event_id")
      .as[PollEvt]
    statefulGapDetect(evts)
      .groupBy($"inverter")
      .agg(
        count(lit(1)).as("n_gaps"),
        max($"gap_us").as("max_gap_us"),
        sum($"gap_us").as("total_gap_us"))
      .orderBy($"inverter")
  }

  /** Rated power ceiling for the ONLINE clipping detector (cents):
    * a live stream can't know the inverter's eventual observed max
    * (s49's batch proxy), so it compares against the catalog's rated
    * value — here a fleet-wide constant, the registers.txt analogue
    * of a rated-watts register. Integer compare, no IEEE. */
  val ClipRatedCents: Long = 5000
  val StreamClipMinRun = 3

  case class ClipEvt(inverter: Long, us: Long, event_id: Long, cents: Long)
  case class ClipState(runLen: Long, startUs: Long, lastUs: Long)
  case class ClipOut(inverter: Long, start_us: Long, end_us: Long, run_len: Long)

  /** Online clipping-run detector (s49's diagnostic as a stream):
    * per-inverter state is ONE (runLen, startUs, lastUs) triple; a
    * completed run of ≥ [[StreamClipMinRun]] readings at ≥ the rated
    * ceiling is emitted when the terminating (below-ceiling) reading
    * arrives — runs still open at stream end stay unemitted, in batch
    * mode too, so batch == stream over any micro-batch split
    * (StreamingSpec pins a mid-run split). State = #inverters × 24
    * bytes: unbounded feeds run in bounded memory. */
  def statefulClipDetect(ds: Dataset[ClipEvt]): Dataset[ClipOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.inverter)
      .flatMapGroupsWithState[ClipState, ClipOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (inv: Long, it: Iterator[ClipEvt], state: GroupState[ClipState]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.us, e.event_id))
          var cur = state.getOption.getOrElse(ClipState(0L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[ClipOut]
          sorted.foreach { e =>
            if (e.cents >= ClipRatedCents) {
              cur = if (cur.runLen == 0L) ClipState(1L, e.us, e.us)
                    else ClipState(cur.runLen + 1L, cur.startUs, e.us)
            } else {
              if (cur.runLen >= StreamClipMinRun)
                out += ClipOut(inv, cur.startUs, cur.lastUs, cur.runLen)
              cur = ClipState(0L, 0L, 0L)
            }
          }
          state.update(cur)
          out.iterator
      }
  }

  // ---------------------------------------------------------------------
  // st12: graded batch-equivalent of the online clipping detector —
  // the stateful operator over the whole batch (empty initial state)
  // must equal the gaps-and-islands form the oracle computes, with
  // the SAME closed-run semantics (a run is counted only once its
  // terminating below-ceiling reading has been seen; the trailing
  // open run is not a completed event in either mode). Cross-batch
  // run continuity is pinned by StreamingSpec's mid-run split.
  // ---------------------------------------------------------------------
  def st12StreamClip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evts = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"user_id".as("inverter"), unix_micros($"ts").as("us"),
        $"event_id", round($"value" * 100).cast("long").as("cents"))
      .as[ClipEvt]
    statefulClipDetect(evts)
      .groupBy($"inverter")
      .agg(count(lit(1)).as("n_clip_events"),
        sum($"run_len").as("clipped_in_events"),
        max($"run_len").as("longest_run"),
        max($"end_us" - $"start_us").as("longest_span_us"))
      .orderBy($"inverter")
  }

  /** st11's histogram grain: readings coarsen map-side to 100-watt
    * band indices (floor(value/100) → ≤ [[HistDistinct]] distinct
    * doubles on this feed's [0, 500) domain), which keeps the graded
    * config in the adaptive histogram's PROVABLY EXACT regime — with
    * fewer distinct values than bins no merge ever fires and the
    * summary IS the value-frequency table (HistogramSpec pins it), so
    * the oracle is plain per-(window, band) counts. Production feeds
    * insert raw watts with the same plan and inherit HistogramSpec's
    * forced-merge invariants instead. */
  val StreamHistBins = 8
  val HistDistinct = 5

  /** Windowed streaming ADAPTIVE HISTOGRAM: the [[graft.functions
    * .HistogramAgg]] mergeable summary as STREAMING STATE (st7's
    * top-k and st9's q-digest discipline, third member of the
    * sketch-as-state family): per open hour window the state is one
    * ≤ 2N-bin buffer; micro-batches merge via the aggregate's own
    * partial path. Shared by the graded batch plan and the
    * stream==batch spec. */
  def histTransform(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.withWatermark("ts", "2 hours")
      .filter($"event_type" === "view")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("n"),
        graft.functions.GraftFunctions.adaptiveHistogram(
          floor($"value" / 100.0).cast("double"), StreamHistBins).as("bins"))
  }

  def histFinalize(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select($"window.start".as("hour"), $"n", posexplode($"bins"))
      .select($"hour", $"n".as("n_readings"), $"pos".cast("long").as("bin_idx"),
        $"col.center".as("band"), $"col.cnt".as("cnt"))
      .orderBy($"hour", $"bin_idx")
  }

  // ---------------------------------------------------------------------
  // st11: graded batch-equivalent of the streaming windowed adaptive
  // histogram — in the exact regime (distinct bands ≤ bins) the bins
  // are the per-(window, band) counts in band order, which is what
  // the oracle computes; the cross-micro-batch merge path is pinned
  // by StreamingSpec (split feed == whole feed == batch).
  // ---------------------------------------------------------------------
  def st11StreamHistogram(s: SparkSession, d: String): DataFrame =
    histFinalize(histTransform(Tables.events(s, d)))

  /** st10's per-register reading and its carried state (the current
    * latest reading per (inverter, register stream)). */
  case class ReadEvt(inverter: Long, stream: String, us: Long,
                     event_id: Long, cents: Long)
  case class LastState(us: Long, event_id: Long, cents: Long)
  case class LastOut(inverter: Long, stream: String, last_us: Long,
                     last_cents: Long)

  /** Stateful streaming LAST-READING register — the reference's live
    * "current inverter status" view (ClickHouse serves it with argMax
    * over the whole table; a stream keeps it incrementally): per
    * (inverter, register stream) the carried state is the max-(us,
    * event_id) reading — 24 bytes per key, bounded by fleet size ×
    * register catalog, NOT by feed length — and each micro-batch
    * emits the group's refreshed latest row (the dashboard upsert).
    * Within a batch, readings fold in (us, event_id) order; across
    * batches the carried state wins ties exactly as s7's row_number
    * rule would. Batch == stream over any feed split (StreamingSpec).
    */
  def statefulLastReading(ds: Dataset[ReadEvt]): Dataset[LastOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(e => (e.inverter, e.stream))
      .flatMapGroupsWithState[LastState, LastOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), it: Iterator[ReadEvt], state: GroupState[LastState]) =>
          var cur = state.getOption
          it.foreach { e =>
            if (cur.forall(c => e.us > c.us || (e.us == c.us && e.event_id > c.event_id)))
              cur = Some(LastState(e.us, e.event_id, e.cents))
          }
          cur.foreach(state.update)
          cur.map(c => LastOut(key._1, key._2, c.us, c.cents)).iterator
      }
  }

  // ---------------------------------------------------------------------
  // st10: graded batch-equivalent of the streaming last-reading view —
  // the stateful operator over the whole batch (empty initial state)
  // must equal s7's argMax/max_by identity per (inverter, stream),
  // which is what the oracle computes. The streaming-only value (the
  // incrementally-maintained dashboard on an unbounded feed, state
  // bounded by the key space) is pinned by StreamingSpec's split-feed
  // equivalence.
  // ---------------------------------------------------------------------
  def st10StreamLast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evts = Tables.events(s, d)
      .select($"user_id".as("inverter"), $"event_type".as("stream"),
        unix_micros($"ts").as("us"), $"event_id",
        (dec($"value") * 100).cast("long").as("cents"))
      .as[ReadEvt]
    statefulLastReading(evts)
      .select($"inverter", $"stream", $"last_us",
        ($"last_cents".cast("double") / 100.0).as("last_value"))
      .orderBy($"inverter", $"stream")
  }

  val queries: Map[String, Q] = Map(
    "st13_stream_enrich" -> (st13StreamEnrich _),
    "st12_stream_clip" -> (st12StreamClip _),
    "st11_stream_histogram" -> (st11StreamHistogram _),
    "st10_stream_last" -> (st10StreamLast _),
    "st9_stream_quantile" -> (st9StreamQuantile _),
    "st8_stream_gaps" -> (st8StreamGaps _),
    "st7_stream_topk" -> (st7StreamTopk _),
    "st6_stream_funnel" -> (st6StreamFunnel _),
    "st5_stream_moments" -> (st5StreamMoments _),
    "st4_dedup_ingest" -> (st4DedupIngest _),
    "st1_stream_hourly" -> (st1StreamHourly _),
    "st2_sliding_window" -> (st2SlidingWindow _),
    "st3_session_window" -> (st3SessionWindow _),
  )

  val oracles: Map[String, String] = Map(
    // st13: the same equi+range join, integer-µs floor-div delay.
    "st13_stream_enrich" ->
      """SELECT c.user_id,
                c.event_id AS click_id, p.event_id AS purchase_id,
                (epoch_us(c.ts) - epoch_us(p.ts)) // 1000000 AS delay_s
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts <= c.ts
         ORDER BY click_id, purchase_id""",
    // st12: s49's run-start cumulative islands at the rated-constant
    // gate, CLOSED runs only (an island whose last reading is not the
    // inverter's last — the next reading exists and is below-ceiling
    // by maximality), all-integer rollup.
    "st12_stream_clip" ->
      s"""WITH o AS (
           SELECT user_id AS inverter, epoch_us(ts) AS us, event_id,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         f AS (SELECT *, cents >= $ClipRatedCents AS clipped FROM o),
         g AS (
           SELECT *, CASE WHEN clipped AND NOT coalesce(lag(clipped)
                    OVER (PARTITION BY inverter ORDER BY us, event_id), false)
                  THEN 1 ELSE 0 END AS run_start
           FROM f),
         h AS (
           SELECT *, sum(run_start) OVER (PARTITION BY inverter ORDER BY us, event_id) AS island,
                  row_number() OVER (PARTITION BY inverter ORDER BY us, event_id) AS rn,
                  count(*) OVER (PARTITION BY inverter) AS n_inv
           FROM g),
         runs AS (
           SELECT inverter, island, CAST(count(*) AS BIGINT) AS run_len,
                  min(us) AS start_us, max(us) AS end_us
           FROM h WHERE clipped GROUP BY 1, 2
           HAVING count(*) >= $StreamClipMinRun AND max(rn) < max(n_inv))
         SELECT inverter, CAST(count(*) AS BIGINT) AS n_clip_events,
                CAST(sum(run_len) AS BIGINT) AS clipped_in_events,
                CAST(max(run_len) AS BIGINT) AS longest_run,
                CAST(max(end_us - start_us) AS BIGINT) AS longest_span_us
         FROM runs GROUP BY 1 ORDER BY inverter""",
    // st11: exact regime (distinct bands ≤ bins) ⇒ the bins ARE the
    // per-(window, band) counts in band order; bin_idx is the 0-based
    // band rank within the window.
    "st11_stream_histogram" ->
      """WITH b AS (
           SELECT time_bucket(INTERVAL '1 hour', ts) AS hour,
                  CAST(floor(value / 100.0) AS DOUBLE) AS band
           FROM events WHERE event_type = 'view'),
         g AS (
           SELECT hour, band, CAST(count(*) AS BIGINT) AS cnt
           FROM b GROUP BY 1, 2),
         w AS (
           SELECT hour, band, cnt,
                  CAST(sum(cnt) OVER (PARTITION BY hour) AS BIGINT) AS n_readings,
                  CAST(row_number() OVER (PARTITION BY hour ORDER BY band) - 1 AS BIGINT) AS bin_idx
           FROM g)
         SELECT hour, n_readings, bin_idx, band, cnt
         FROM w ORDER BY hour, bin_idx""",
    // st10: the stateful operator over one batch == s7's argMax
    // row_number rule per (inverter, stream); exact cents, one
    // display divide.
    "st10_stream_last" ->
      """WITH r AS (
           SELECT user_id AS inverter, event_type AS stream,
                  epoch_us(ts) AS us, event_id,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                  row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events)
         SELECT inverter, stream, us AS last_us,
                CAST(cents AS DOUBLE) / 100.0 AS last_value
         FROM r WHERE rn = 1 ORDER BY inverter, stream""",
    // st9: k ≥ window cardinality makes the digest exact — the
    // oracle is the rank-ceil(q·n) order statistic; ceil(q·n) is the
    // same IEEE multiply+ceil on both engines (part of the contract).
    "st9_stream_quantile" ->
      s"""WITH b AS (
           SELECT date_trunc('hour', ts) AS hour, user_id AS inverter,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events WHERE event_type = 'view'),
         g AS (
           SELECT hour, inverter, CAST(count(*) AS BIGINT) AS n,
                  list(c ORDER BY c) AS xs
           FROM b GROUP BY 1, 2)
         SELECT hour, inverter, n,
                CAST(xs[CAST(greatest(ceil(0.5 * n), 1) AS INT)] AS DOUBLE) / 100.0 AS p50_watts,
                CAST(xs[CAST(greatest(ceil(0.9 * n), 1) AS INT)] AS DOUBLE) / 100.0 AS p90_watts
         FROM g ORDER BY hour, inverter""",
    // st8: the stateful operator over one batch == the lag() window
    // form (s8's identity), rolled up; µs integers throughout.
    "st8_stream_gaps" ->
      s"""WITH p AS (
           SELECT user_id AS inverter, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS prev
           FROM events),
         g AS (
           SELECT inverter, us - prev AS gap_us
           FROM p WHERE prev IS NOT NULL AND us - prev > $GapThresholdUs)
         SELECT inverter, CAST(count(*) AS BIGINT) AS n_gaps,
                CAST(max(gap_us) AS BIGINT) AS max_gap_us,
                CAST(sum(gap_us) AS BIGINT) AS total_gap_us
         FROM g GROUP BY 1 ORDER BY inverter""",
    // st7: with w ≥ cardinality the sketch is exact — per-hour counts
    // ranked by the aggregate's own (count DESC, item ASC) rule.
    "st7_stream_topk" ->
      s"""WITH c AS (
           SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT *, CAST(row_number() OVER (PARTITION BY hour
                     ORDER BY n DESC, event_type ASC) AS BIGINT) AS rank
           FROM c)
         SELECT hour, rank, event_type, CAST(n AS BIGINT) AS n_events
         FROM r WHERE rank <= $StreamTopK ORDER BY hour, rank""",
    // st6: the stateful operator must agree bit-for-bit with e21's
    // batch fold, so the oracle IS e21's (shared, cannot drift).
    "st6_stream_funnel" -> graft.events.Events.oracles("e21_funnel_inc"),
    // st5: s28's exact power sums and double tree at the (hour,
    // event_type) grain (HUGEINT for c⁴).
    "st5_stream_moments" ->
      """WITH raw AS (
           SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         sums AS (
           SELECT hour, event_type, count(*) AS n,
                  CAST(sum(c) AS DOUBLE) AS s1d,
                  CAST(sum(c*c) AS DOUBLE) AS s2d,
                  CAST(sum(c*c*c) AS DOUBLE) AS s3d,
                  CAST(sum(CAST(c*c AS HUGEINT) * (c*c)) AS DOUBLE) AS s4d
           FROM raw GROUP BY 1, 2),
         mom AS (
           SELECT hour, event_type, n,
                  s1d / CAST(n AS DOUBLE) AS mu, s2d / CAST(n AS DOUBLE) AS r2,
                  s3d / CAST(n AS DOUBLE) AS r3, s4d / CAST(n AS DOUBLE) AS r4
           FROM sums),
         cm AS (
           SELECT hour, event_type, n, mu,
                  r2 - mu*mu AS m2,
                  r3 - 3.0*mu*r2 + 2.0*mu*mu*mu AS m3,
                  r4 - 4.0*mu*r3 + 6.0*mu*mu*r2 - 3.0*mu*mu*mu*mu AS m4
           FROM mom)
         SELECT hour, event_type, CAST(n AS BIGINT) AS n,
                mu / 100.0 AS mean_v,
                sqrt(m2) / 100.0 AS stddev_pop,
                m3 / (m2 * sqrt(m2)) AS skew_pop,
                m4 / (m2 * m2) AS kurt_pop
         FROM cm WHERE m2 > 0.0 ORDER BY hour, event_type""",
    // st4: dedup must exactly undo the re-delivery, so the oracle is
    // the CLEAN table's rollup — no duplication modeled at all.
    "st4_dedup_ingest" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",
    "st1_stream_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
                max(value) AS max_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    // Spark's sliding window: an event at t belongs to the 4 15-min-
    // aligned starts in (t-1h, t] — i.e. floor15(t) - k*15min, k=0..3.
    "st2_sliding_window" ->
      """WITH g AS (SELECT unnest(range(0, 4)) AS k),
         w AS (
           SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS w_start,
                  event_type, value
           FROM events, g)
         SELECT w_start, event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
                max(value) AS max_value
         FROM w GROUP BY 1, 2 ORDER BY w_start, event_type""",
    // Spark session_window semantics: a gap >= 30 min starts a new
    // session; end = last event + gap.
    "st3_session_window" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, value, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         y AS (
           SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_s
           FROM x),
         z AS (
           SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
           FROM y)
         SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
                count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
         FROM z GROUP BY user_id, sid ORDER BY user_id, s_start""",
  )
}
