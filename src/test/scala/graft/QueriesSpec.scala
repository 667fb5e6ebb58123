package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the query surface, on sf0.001 (hash-level
  * correctness is gated by Verify + the DuckDB oracle at sf0.01; these
  * pin semantic invariants the hash compare can't express, and cover
  * properties of the custom-kernel queries d4/v3/t5). */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("every SparkEntry query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, SfDir).count()
      assert(n >= 0, s"$name failed")
      // rows-only queries (no oracle) must be non-empty for the driver
      if (!SparkEntry.oracleSql.contains(name))
        assert(n > 0, s"rows-only query $name returned 0 rows")
    }
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract: every oracle has an ORDER BY (positional row compare)") {
    // the driver's hash gate compares rows positionally; an oracle
    // without a deterministic total order would flake — unless the
    // result is a single global-aggregate row, where order is moot
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      if (!sql.toUpperCase.contains("ORDER BY"))
        assert(SparkEntry.queries(name)(spark, SfDir).count() == 1,
          s"$name oracle lacks ORDER BY and is not a single-row aggregate")
    }
    // and every graded query is distinct-named across modules (a
    // duplicate key would silently shadow a module's query)
    val all = Seq(
      relational.Relational.queries, solar.Solar.queries,
      events.Events.queries, text.Text.queries, dedup.Dedup.queries,
      sim.Sim.queries, multimodal.Multimodal.queries,
      streaming.Streaming.queries)
    val keys = all.flatMap(_.keys)
    assert(keys.size == keys.distinct.size, "duplicate query keys across modules")
    assert(SparkEntry.queries.size == keys.size)
  }

  test("s10 sessionization: session counts equal gap-starts plus one per inverter") {
    val s = spark
    import s.implicits._
    val sessions = solar.Solar.s10Sessionize(s, SfDir)
    val nSessions = sessions.count()
    val feed = Tables.events(s, SfDir).withColumnRenamed("user_id", "inverter")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"inverter").orderBy($"ts", $"event_id")
    val gaps = feed
      .withColumn("gap_us", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
      .filter($"gap_us" > 2L * 3600 * 1000000).count()
    val inverters = feed.select($"inverter").distinct().count()
    assert(nSessions == gaps + inverters)
  }

  test("s18 wide row: solarman derivation invariants hold across all 26 columns") {
    val s = spark
    import s.implicits._
    val rows = solar.Solar.s18WideRow(s, SfDir)
    assert(rows.columns.length == 26)
    // dc_calculated = sum of the three string watts (solarman.py:276)
    assert(rows.filter($"dc_calculated_watts" =!=
      $"dc_1_watts" + $"dc_2_watts" + $"dc_3_watts").count() == 0)
    // efficiency is clamped at 100 and positive where defined (py:285)
    assert(rows.filter($"inverter_efficiency_percent" > 100.0 ||
      $"inverter_efficiency_percent" <= 0.0).count() == 0)
    // apparent >= actual AC watts; dc actual >= ac actual (conversion loss)
    assert(rows.filter($"ac_apparent_watts" < $"ac_actual_watts").count() == 0)
    assert(rows.filter($"dc_actual_watts" < $"ac_actual_watts").count() == 0)
    // kwh_total is a non-decreasing cumulative counter per inverter
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"inverter").orderBy($"time")
    assert(rows.select($"inverter", $"time", $"kwh_total")
      .withColumn("prev", lag($"kwh_total", 1).over(w))
      .filter($"prev".isNotNull && $"kwh_total" < $"prev").count() == 0)
  }

  test("e5 as-of join matches a brute-force latest-prior-order computation") {
    val s = spark
    import s.implicits._
    val got = events.Events.e5AsofJoin(s, SfDir)
      .select($"event_id", $"o_orderkey").as[(Long, Long)].collect().toMap
    // brute force: max orderdate <= ts, then max orderkey among those
    val od = Tables.orders(s, SfDir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("ok"))
    val brute = Tables.events(s, SfDir)
      .join(od, $"user_id" === $"o_custkey" && $"ts" >= $"o_orderdate")
      .groupBy($"event_id")
      .agg(max_by($"ok", struct($"o_orderdate", $"ok")).as("want_ok"))
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (ev, ok) => assert(ok == brute(ev), s"event $ev") }
  }

  test("d4 simhash candidates: hamming is symmetric-free and within threshold") {
    val s = spark
    import s.implicits._
    val rows = dedup.Dedup.d4Simhash(s, SfDir)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, h) =>
      assert(a < b, "pairs must be canonical (doc_a < doc_b)")
      assert(h >= 0 && h <= dedup.Dedup.HammingMax)
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("d3 minhash est_jaccard is a plausible estimate of true jaccard") {
    val s = spark
    import s.implicits._
    val est = dedup.Dedup.d3MinhashLsh(s, SfDir)
      .select($"doc_a", $"doc_b", $"est_jaccard").as[(Long, Long, Double)]
      .collect().take(30)
    assert(est.nonEmpty)
    val texts = Tables.documents(s, SfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def shingleSet(t: String) = (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
    est.foreach { case (a, b, e) =>
      val sa = shingleSet(texts(a)); val sb = shingleSet(texts(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(e - j) < 0.45, s"pair ($a,$b): est $e vs true $j")
    }
  }

  test("approximate uniq (HLL++) stays within 5% of s15's exact distinct counts") {
    val s = spark
    import s.implicits._
    val approx = Tables.events(s, SfDir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(approx_count_distinct($"user_id").as("approx_uniq"))
    val exact = solar.Solar.s15DailyActive(s, SfDir)
    val rows = exact.join(approx, "day")
      .select($"uniq_inverters", $"approx_uniq").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ex, ap) =>
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"approx $ap vs exact $ex")
    }
  }

  test("approx_percentile stays within rank tolerance of s14's exact quantiles") {
    val s = spark
    import s.implicits._
    // accuracy 1000 → rank error <= n/1000; the per-inverter groups are
    // a few hundred rows here, so the sketch should land within a few
    // value-neighbors of the exact order statistic. Pin it by rank:
    // the approx median's rank must be within 1% of n of the true
    // median rank (the sketch's contract, scale-independent).
    val approx = Tables.events(s, SfDir)
      .filter($"event_type" === "view")
      .groupBy($"user_id".as("inverter"))
      .agg(percentile_approx($"value", lit(0.5), lit(1000)).as("ap_median"))
    val vals = Tables.events(s, SfDir)
      .filter($"event_type" === "view")
      .select($"user_id".as("inverter"), $"value")
    val rows = vals.join(approx, "inverter")
      .groupBy($"inverter")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"value" <= $"ap_median", 1L).otherwise(0L)).as("rank_of_ap"))
      .select($"n", $"rank_of_ap").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, rk) =>
      val lo = n / 2.0 - n / 100.0 - 1
      val hi = n / 2.0 + n / 100.0 + 1
      assert(rk >= lo && rk <= hi, s"approx median rank $rk outside [$lo,$hi] for n=$n")
    }
  }

  test("v3 IVF results are the exact top-k within the probed clusters") {
    val s = spark
    import s.implicits._
    val got = sim.Sim.v3IvfAnn(s, SfDir)
      .select($"q_id", $"rnk", $"vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got.nonEmpty)
    // recompute: centroid assignment + probes + brute top-k in-test
    val c = sim.Sim.centroidsForTest(s, SfDir)
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val assign = e.map { case (id, emb) =>
      id -> c.maxBy { case (cid, ce) => (cos(emb, ce), -cid) }._1
    }.toMap
    val byId = e.toMap
    got.foreach { case (q, gotIds) =>
      val probed = c.map { case (cid, ce) => cid -> cos(byId(q), ce) }
        .toSeq.sortBy { case (cid, sc) => (-sc, cid) }.take(sim.Sim.Probes).map(_._1).toSet
      val want = e.filter { case (id, _) => id != q && probed.contains(assign(id)) }
        .map { case (id, emb) => (id, cos(byId(q), emb)) }
        .sortBy { case (id, sc) => (-sc, id) }
        .take(sim.Sim.TopK).map(_._1).toSeq
      assert(gotIds == want, s"query $q")
    }
  }

  test("v6 PQ/ADC: approximate top-5 recalls most of the exact-L2 top-5") {
    // The oracle pins bit-exactness of the PQ pipeline; this pins the
    // SEMANTIC quality the hash can't see — the 16-code rows + lookup
    // tables must still rank near-neighbors like the uncompressed
    // vectors do. Floor is deliberately modest: 64-dim near-random
    // vectors at 16×4 PQ with label-seeded codebooks is a hard
    // compression regime (production uses k-means-trained codebooks).
    val s = spark
    import s.implicits._
    val got = sim.Sim.v6PqAdc(s, SfDir)
      .select($"q_id", $"rnk", $"vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSet }
    assert(got.size == sim.Sim.PqQueries)
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def l2(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val byId = e.toMap
    val recalls = got.map { case (q, approx) =>
      val exact = e.filter(_._1 >= sim.Sim.PqQueries)
        .map { case (id, emb) => (id, l2(byId(q), emb)) }
        .sortBy { case (id, d) => (d, id) }
        .take(sim.Sim.PqTopK).map(_._1).toSet
      approx.intersect(exact).size.toDouble / sim.Sim.PqTopK
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ/ADC recall@5 vs exact L2: $mean%.2f")
    assert(mean >= 0.4, f"PQ recall collapsed: $mean%.2f")
  }

  test("e10 generalized window: 28-day rolling actives match brute-force recomputation") {
    // e10's graded 7-day WAU is oracle-exact; this pins the window
    // PARAMETER (the 28-day MAU line of the same dashboard) against an
    // in-memory brute force over the raw (user, day) pairs.
    val s = spark
    import s.implicits._
    val days = 28
    val got = events.Events.rollingActives(s, SfDir, days)
      .as[(java.sql.Timestamp, Long, Long)].collect()
    val act = Tables.events(s, SfDir)
      .select($"user_id", date_trunc("day", $"ts").as("day"))
      .distinct().as[(Long, java.sql.Timestamp)].collect()
    def ld(t: java.sql.Timestamp) = t.toLocalDateTime.toLocalDate
    val expect = act.map(_._2).distinct.sorted.map { d =>
      val lo = ld(d).minusDays(days - 1)
      val dau = act.filter(a => a._2 == d).map(_._1).distinct.length.toLong
      val roll = act.filter { case (_, ad) =>
        val l = ld(ad); !l.isBefore(lo) && !l.isAfter(ld(d))
      }.map(_._1).distinct.length.toLong
      (d, dau, roll)
    }
    assert(got.toSeq == expect.toSeq)
  }

  test("e12 sequenceMatch/sequenceCount: fold matches brute force; adversarial feed") {
    // The oracle pins hash-exactness vs DuckDB's list_reduce mirror;
    // this pins the SEMANTICS against an independent algorithm (the
    // exists-chain by exhaustive triple scan, the greedy counter by a
    // direct state machine) on sf0.001 AND on a crafted feed covering
    // the edge cases: click outside the 6 h guard, purchase before any
    // valid click, restart-after-match, interleaved extra views.
    val s = spark
    import s.implicits._
    val H6 = 6L * 3600 * 1000000
    def brute(evs: Seq[(Long, Long, String)]): (Boolean, Long) = {
      // evs already (us, event_id)-sorted: (us, event_id, type)
      val matched = evs.indices.exists { i =>
        evs(i)._3 == "view" && evs.indices.exists { j =>
          j > i && evs(j)._3 == "click" && evs(j)._1 - evs(i)._1 <= H6 &&
            evs.indices.exists(k => k > j && evs(k)._3 == "purchase")
        }
      }
      var st = 0; var cnt = 0L
      evs.foreach {
        case (_, _, "view") if st == 0  => st = 1
        case (_, _, "click") if st == 1 => cnt += 1; st = 0
        case _                          =>
      }
      (matched, cnt)
    }
    def check(dir: String): Unit = {
      val got = events.Events.e12SequenceMatch(s, dir)
        .as[(Long, Boolean, Long)].collect().toSeq
      val raw = Tables.events(s, dir)
        .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
        .as[(Long, Long, Long, String)].collect()
      val expect = raw.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rs) =>
        val (m, c) = brute(rs.map(r => (r._2, r._3, r._4)).sortBy(r => (r._1, r._2)).toSeq)
        (u, m, c)
      }
      assert(got == expect)
    }
    check(SfDir)
    val dir = java.nio.file.Files.createTempDirectory("e12feed").toString
    val base = 1700000000000000L
    def ev(id: Long, u: Long, offUs: Long, t: String) =
      (id, new java.sql.Timestamp((base + offUs) / 1000), u, t, 1.0, "{}")
    Seq(
      // u1: click 7 h after the only view (guard fails) then purchase
      ev(1, 1, 0, "view"), ev(2, 1, 7L * 3600 * 1000000, "click"),
      ev(3, 1, 8L * 3600 * 1000000, "purchase"),
      // u2: purchase BEFORE the valid click, then view+click (no trailing
      //     purchase) — matched=false but greedy count sees 2 pairs
      ev(4, 2, 0, "view"), ev(5, 2, 1000000, "purchase"),
      ev(6, 2, 2000000, "click"), ev(7, 2, 3000000, "view"),
      ev(8, 2, 4000000, "click"),
      // u3: full chain with noise + a second greedy restart
      ev(9, 3, 0, "error"), ev(10, 3, 1000000, "view"), ev(11, 3, 2000000, "view"),
      ev(12, 3, H6 + 1000000, "click"), // within 6 h of the SECOND view only
      ev(13, 3, H6 + 2000000, "purchase"), ev(14, 3, H6 + 3000000, "view"),
      ev(15, 3, H6 + 4000000, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
    val crafted = events.Events.e12SequenceMatch(s, dir)
      .as[(Long, Boolean, Long)].collect()
      .map { case (u, m, c) => u -> ((m, c)) }.toMap
    assert(crafted(1L) == ((false, 1L))) // count has no time guard; match does
    assert(crafted(2L) == ((false, 2L)))
    assert(crafted(3L) == ((true, 2L)))
  }

  test("e15 uniqUpTo: saturation exact under forced merges, adversarial cardinality") {
    // The oracle grades LEAST(exact, N+1) on real data; this forces
    // the TypedImperativeAggregate's MERGE path (32 partitions) on
    // crafted feeds both below and far above the saturation point.
    val s = spark
    import s.implicits._
    val big = s.range(0, 10000).select(
      (col("id") % 3).as("g"), (col("id") % 997).as("u")).repartition(32)
    val gotBig = big.groupBy($"g")
      .agg(graft.functions.GraftFunctions.uniqUpTo($"u", 10).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(gotBig.values.forall(_ == 11), s"saturation broke: $gotBig") // 997 distinct >> 10
    val small = s.range(0, 10000).select(
      (col("id") % 3).as("g"), (col("id") % 7).as("u")).repartition(32)
    val gotSmall = small.groupBy($"g")
      .agg(graft.functions.GraftFunctions.uniqUpTo($"u", 10).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(gotSmall.values.forall(_ == 7), s"exact-below-N broke: $gotSmall")
  }

  test("e14 cohort matrix: matches brute force over (user, day) pairs") {
    val s = spark
    import s.implicits._
    val got = events.Events.e14CohortMatrix(s, SfDir)
      .as[(java.sql.Timestamp, Int, Long)].collect().toSeq
    val ud = Tables.events(s, SfDir)
      .select($"user_id", date_trunc("day", $"ts").as("day"))
      .distinct().as[(Long, java.sql.Timestamp)].collect()
    val firstDay = ud.groupBy(_._1).map { case (u, ps) => u -> ps.map(_._2.getTime).min }
    val expect = ud
      .map { case (u, d) =>
        (firstDay(u), ((d.getTime - firstDay(u)) / 86400000L).toInt, u)
      }
      .filter(_._2 < events.Events.CohortDays)
      .groupBy(t => (t._1, t._2))
      .map { case ((c, k), rs) =>
        (new java.sql.Timestamp(c), k, rs.map(_._3).distinct.size.toLong)
      }
      .toSeq.sortBy(t => (t._1.getTime, t._2))
    assert(got == expect)
  }

  test("q23 deciles: ntile bounds, rank monotone in spend within nation") {
    val s = spark
    import s.implicits._
    val rows = relational.Relational.q23SpendDeciles(s, SfDir)
      .select($"nation", $"spend", $"decile", $"pct_rank", $"cume")
      .as[(String, Double, Int, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, d, pr, cd) =>
      assert(d >= 1 && d <= 10 && pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
    }
    rows.groupBy(_._1).values.foreach { ns =>
      val byRank = ns.sortBy(_._4)
      // pct_rank ascending ⇔ spend descending (DESC window order)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._2 >= b._2 && a._3 <= b._3
        case _           => true
      })
    }
  }

  test("s23 weighted median: matches brute-force CH quantileExactWeighted selection") {
    val s = spark
    import s.implicits._
    val got = solar.Solar.s23WeightedMedian(s, SfDir)
      .select($"inverter", $"wmedian_watts").as[(Long, Double)].collect().toMap
    val raw = Tables.events(s, SfDir).filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts"), $"event_id",
        round($"value" * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    raw.groupBy(_._1).foreach { case (inv, rs) =>
      val byTs = rs.sortBy(r => (r._2, r._3))
      val durs = byTs.zipWithIndex.map { case ((_, us, eid, c), i) =>
        val d = if (i + 1 < byTs.length) byTs(i + 1)._2 - us else 0L
        (c, us, eid, d)
      }
      val total = durs.map(_._4).sum
      val ordered = durs.sortBy(t => (t._1, t._2, t._3))
      var cum = 0L
      val med = ordered.collectFirst {
        case (c, _, _, d) if { cum += d; cum * 2 >= total } => c
      }.get
      assert(got(inv) == med.toDouble / 100.0, s"inverter $inv")
    }
  }

  test("v9 range search: matches brute-force radius scan") {
    // Independent recomputation of the full radius scan (loop-computed
    // cosine vs the codegen'd CosineSim expression).
    val s = spark
    import s.implicits._
    val got = sim.Sim.v9RangeSearch(s, SfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cosd(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = e.filter(_._1 < 20)
    val corpus = e.filter(_._1 >= 20)
    val expect = (for {
      (qid, qe) <- qs
      (vid, ve) <- corpus
      if cosd(ve, qe) >= sim.Sim.RangeTau
    } yield (qid, vid)).toSet
    assert(got == expect)
  }

  test("t15 PII redaction: crafted positives redact correctly; real corpus is identity") {
    // The graded corpus is synthetic word-soup with zero PII (the
    // oracle proves redaction is the identity on it), so the POSITIVE
    // semantics are pinned here on a crafted corpus. Expected values
    // were cross-checked against the DuckDB/RE2 side of the same
    // patterns — this doubles as the engine-parity check for matches:
    // sequential chain (email→IP→phone), an email swallowing a
    // dotted-quad (protected from the IP pass), \b guarding "v1.2.3.4",
    // the naive 999.* dotted-quad by design.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t15feed").toString
    Seq(
      (0L, "contact bob.smith+x@mail.example.com now", "en", "src0", 0L),
      (1L, "a@b.co 10.0.0.1 +1 415 555 1234", "en", "src0", 0L),
      (2L, "v1.2.3.4@host.com ships v1.2.3.4 today", "en", "src0", 0L),
      (3L, "bad ip 999.999.999.999 and +44 20 7946 0958", "en", "src0", 0L),
      (4L, "no pii here at all", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = text.Text.t15PiiRedact(s, dir)
      .as[(Long, Int, Int, Int, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 1, 0, 0, "contact <EMAIL> now", false),
      (1L, 1, 1, 1, "<EMAIL> <IP> <PHONE>", false),
      (2L, 1, 0, 0, "<EMAIL> ships v1.2.3.4 today", false),
      (3L, 0, 1, 1, "bad ip <IP> and <PHONE>", false),
      (4L, 0, 0, 0, "no pii here at all", true)))
    // and on the real corpus the pass is the identity (clean
    // everywhere) — the honest statement of what the oracle grades
    val real = text.Text.t15PiiRedact(s, SfDir)
    assert(real.filter(!$"clean").count() == 0)
  }

  test("t14 unigram LM: conf-gated ln variant matches brute force; gate non-degenerate") {
    // Graded columns are oracle-exact; this pins (1) the production
    // ln-perplexity path (spark.graft.unigram.ln=true, t11's conf-gate
    // precedent) against an in-memory recomputation of the unigram
    // model, and (2) that the corpus-calibrated OOV gate actually
    // splits the corpus (both keeps and drops exist).
    val s = spark
    import s.implicits._
    val base = text.Text.t14UnigramLm(s, SfDir)
    val keeps = base.groupBy($"keep").count().as[(Boolean, Long)].collect().toMap
    assert(keeps.getOrElse(true, 0L) > 0 && keeps.getOrElse(false, 0L) > 0,
      s"OOV gate degenerate: $keeps")
    assert(!base.columns.contains("mean_logprob"))
    s.conf.set("spark.graft.unigram.ln", "true")
    try {
      val got = text.Text.t14UnigramLm(s, SfDir)
        .select($"doc_id", $"mean_logprob")
        .as[(Long, Double)].collect().toMap
      val docs = Tables.documents(s, SfDir)
        .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      val tokd = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty) }
      val cnt = tokd.flatMap(_._2).groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val total = cnt.values.sum.toDouble
      tokd.filter(_._2.nonEmpty).foreach { case (id, ws) =>
        val exp = ws.map(w => math.log(cnt(w) / total)).sum / ws.length
        assert(math.abs(got(id) - exp) < 1e-9, s"doc $id: ${got(id)} vs $exp")
      }
    } finally s.conf.unset("spark.graft.unigram.ln")
  }

  test("s22 EMA: convex combination of trailing window; crafted step response") {
    // The oracle pins bit-exactness; these pin the smoothing
    // semantics: (1) every EMA lies within [min, max] of its trailing
    // 16-sample window (the integer weights normalize to a convex
    // combination); (2) on a crafted constant-then-step series the EMA
    // is exactly the constant before the step and strictly
    // monotonically approaches the new level after it.
    val s = spark
    import s.implicits._
    val rows = solar.Solar.s22Ema(s, SfDir)
      .select($"inverter", $"value", $"ema")
      .as[(Long, Double, Double)].collect()
    val byInv = rows.zipWithIndex.groupBy(_._1._1)
    byInv.values.foreach { seq =>
      val vals = seq.sortBy(_._2).map(_._1._2)
      val emas = seq.sortBy(_._2).map(_._1._3)
      emas.indices.foreach { i =>
        val win = vals.slice(math.max(0, i - 15), i + 1)
        assert(emas(i) >= win.min - 1e-9 && emas(i) <= win.max + 1e-9,
          s"ema out of window hull at $i")
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("s22feed").toString
    val base = 1700000000000000L
    val feed = (0 until 40).map { i =>
      val v = if (i < 20) 10.0 else 50.0
      (i.toLong, new java.sql.Timestamp((base + i * 60000000L) / 1000), 1L,
        "purchase", v, "{}")
    }
    feed.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val crafted = solar.Solar.s22Ema(s, dir)
      .select($"ema").as[Double].collect()
    crafted.take(20).foreach(e => assert(math.abs(e - 10.0) < 1e-12))
    (20 until 35).foreach { i =>
      assert(crafted(i) > crafted(i - 1) && crafted(i) < 50.0,
        s"step response not strictly rising at $i")
    }
    // once the 16-sample support is fully past the step, EMA == level
    (35 until 40).foreach(i => assert(math.abs(crafted(i) - 50.0) < 1e-12))
  }

  test("e13 maxIntersections: sweep peak equals point-stabbing brute force") {
    // The oracle pins the sweep vs DuckDB's identical sweep; this pins
    // the SEMANTICS with a different algorithm: peak concurrency =
    // max over boundary points p of |{sessions [a,b] with a<=p<=b}|
    // (closed intervals — the maximum of the stabbing count is always
    // attained at some interval start).
    val s = spark
    import s.implicits._
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sess = Tables.events(s, SfDir)
      .select($"user_id", $"ts", $"event_id")
      .withColumn("gap_us", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(wOrd)))
      .withColumn("new_s", when($"gap_us".isNull || $"gap_us" > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(date_trunc("day", min($"ts")).as("day"),
        min(unix_micros($"ts")).as("a"), max(unix_micros($"ts")).as("b"))
      .select($"day", $"a", $"b")
      .as[(java.sql.Timestamp, Long, Long)].collect()
    val expect = sess.groupBy(_._1).map { case (day, ss) =>
      val peak = ss.map { case (_, a, _) =>
        ss.count { case (_, a2, b2) => a2 <= a && a <= b2 }
      }.max
      (day, ss.length.toLong, peak.toLong)
    }.toSeq.sortBy(_._1.getTime)
    val got = events.Events.e13MaxConcurrency(s, SfDir)
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("v8 IVF-PQ: probed-cell ADC top-5 recalls the exact-L2 top-5") {
    // The oracle pins bit-exactness; this pins semantic quality: the
    // composition's loss must be the SUM of its parts' documented
    // losses — IVF pruning (candidates only from probed cells) and PQ
    // compression — not a composition bug. Checked both ways: vs the
    // global exact top-5 (end-to-end recall, floored at v6's 0.4 band)
    // and vs the exact top-5 WITHIN probed cells (isolates PQ loss —
    // if this is far below v6's recall the probe wiring is broken).
    val s = spark
    import s.implicits._
    val rows = sim.Sim.v8IvfPq(s, SfDir)
      .select($"q_id", $"rnk", $"vec_id", $"cluster")
      .as[(Long, Int, Long, Int)].collect()
    val got = rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    assert(got.size == sim.Sim.PqQueries)
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"label", $"embedding").as[(Long, Int, Seq[Float])].collect()
    def l2(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val byId = e.map { case (id, _, emb) => id -> emb }.toMap
    val cents = e.groupBy(_._2).map { case (lbl, vs) => lbl -> vs.minBy(_._1)._3 }
    def nearestCells(v: Seq[Float], n: Int): Set[Int] =
      cents.map { case (cid, ce) => cid -> l2(v, ce) }
        .toSeq.sortBy { case (cid, d) => (d, cid) }.take(n).map(_._1).toSet
    val assign = e.filter(_._1 >= sim.Sim.PqQueries)
      .map { case (id, _, emb) => id -> nearestCells(emb, 1).head }.toMap
    val corpus = e.filter(_._1 >= sim.Sim.PqQueries)
    val (recallGlobal, recallProbed) = got.toSeq.map { case (q, approx) =>
      val probed = nearestCells(byId(q), sim.Sim.Probes)
      // structural: every emitted candidate must come from a probed cell
      rows.filter(_._1 == q).foreach { case (_, _, id, cl) =>
        assert(probed.contains(cl) && assign(id) == cl,
          s"query $q: candidate $id from unprobed/misassigned cell $cl")
      }
      def top5(cand: Seq[(Long, Int, Seq[Float])]): Set[Long] =
        cand.map { case (id, _, emb) => (id, l2(byId(q), emb)) }
          .sortBy { case (id, d) => (d, id) }.take(sim.Sim.PqTopK).map(_._1).toSet
      val exactAll = top5(corpus.toSeq)
      val exactProbed = top5(corpus.filter(c => probed.contains(assign(c._1))).toSeq)
      (approx.intersect(exactAll).size.toDouble / sim.Sim.PqTopK,
        approx.intersect(exactProbed).size.toDouble / sim.Sim.PqTopK)
    }.unzip
    val mg = recallGlobal.sum / recallGlobal.size
    val mp = recallProbed.sum / recallProbed.size
    info(f"IVF-PQ recall@5: $mg%.2f vs global exact, $mp%.2f vs probed-cell exact")
    assert(mp >= 0.4, f"PQ loss inside probed cells collapsed: $mp%.2f")
    assert(mg >= 0.2, f"end-to-end IVF-PQ recall collapsed: $mg%.2f")
  }

  test("v3 IVF: one Lloyd refinement (spark.graft.ivf.refine) improves the quantizer objective") {
    // Lloyd's guarantee is monotone improvement of the quantization
    // objective — mean cosine of each vector to its NEAREST centroid —
    // not of query recall (recall is corpus-dependent; on this
    // near-random corpus the label-seeded quantizer is already
    // label-aligned, and the measured recall@5 trade is 1.0 → 0.88,
    // recorded in PLANS.md). Assignment (argmax cosine) and the
    // mean-direction M-step each improve the objective, so one
    // refinement round must not decrease it.
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def objective(): Double = {
      val c = sim.Sim.centroidsForTest(s, SfDir)
      val per = e.map { case (_, emb) => c.map { case (_, ce) => cos(emb, ce) }.max }
      per.sum / per.length
    }
    val seedObj = objective()
    s.conf.set("spark.graft.ivf.refine", "true")
    try {
      val refinedObj = objective()
      assert(refinedObj >= seedObj - 1e-6,
        s"refinement decreased the quantizer objective: $refinedObj < $seedObj")
      // and it must actually refine (centroids move on this corpus)
      assert(refinedObj != seedObj, "refinement was a no-op")
    } finally s.conf.unset("spark.graft.ivf.refine")
  }

  test("v3 IVF: multi-iteration Lloyd (ivf.refine.iters 1..3) is monotone; sampled training converges") {
    // Lloyd's per-iteration guarantee: argmax-cosine assignment and the
    // mean-direction M-step each improve the quantizer objective, so
    // the trajectory over iterations must be non-decreasing (measured
    // at sample fraction 1.0, where the training set IS the corpus —
    // under sampling the guarantee holds on the sample only, so the
    // sampled path is asserted for shape/convergence, not monotonicity).
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def objective(cs: Seq[(Int, Seq[Float])]): Double = {
      val per = e.map { case (_, emb) => cs.map { case (_, ce) => cos(emb, ce) }.max }
      per.sum / per.length
    }
    def centroidsAt(iters: Int): Seq[(Int, Seq[Float])] = {
      if (iters > 0) s.conf.set("spark.graft.ivf.refine.iters", iters.toString)
      try sim.Sim.centroidsForTest(s, SfDir)
      finally s.conf.unset("spark.graft.ivf.refine.iters")
    }
    val objs = (0 to 3).map(it => objective(centroidsAt(it)))
    info(s"objective trajectory (iters 0..3): ${objs.map(o => f"$o%.6f").mkString(" -> ")}")
    (1 to 3).foreach { i =>
      assert(objs(i) >= objs(i - 1) - 1e-6,
        s"iteration $i decreased the objective: ${objs.mkString(", ")}")
    }
    assert(objs(1) != objs(0), "first refinement was a no-op")
    // production shape: train on a 50% sample for 2 iterations — the
    // centroid id set is preserved (one per label), centroids move,
    // and the graded v3 query still runs green on the refined quantizer
    val seedCs = centroidsAt(0)
    s.conf.set("spark.graft.ivf.refine.iters", "2")
    s.conf.set("spark.graft.ivf.refine.sample", "0.5")
    try {
      val sampled = sim.Sim.centroidsForTest(s, SfDir)
      assert(sampled.map(_._1).sorted == seedCs.map(_._1).sorted,
        "sampled training must keep one centroid per label")
      assert(sampled.toSet != seedCs.toSet, "sampled training must move the centroids")
      assert(SparkEntry.queries("v3_ivf_ann")(s, SfDir).collect().nonEmpty,
        "v3 must stay runnable on the sampled-trained quantizer")
    } finally {
      s.conf.unset("spark.graft.ivf.refine.iters")
      s.conf.unset("spark.graft.ivf.refine.sample")
    }
  }

  test("v6 PQ: trained sub-codebooks (pq.train.iters 1..3) monotonically reduce distortion") {
    // Lloyd per subspace (Jégou TPAMI'11 §III): L2 assignment + mean
    // M-step each reduce the quantization distortion, so the mean
    // squared reconstruction error over the encode set must be
    // non-increasing per iteration at sample fraction 1.0 — and the
    // very first trained iteration must beat the arbitrary label-seed
    // codebook. (Under sampling the guarantee holds on the sample,
    // so the sampled path is asserted for shape + runnability only.)
    val s = spark
    import s.implicits._
    val corpus = Tables.embeddings(s, SfDir)
      .filter($"vec_id" >= sim.Sim.PqQueries)
      .select($"embedding").as[Seq[Float]].collect()
    def distortion(cb: Seq[(Int, Int, Seq[Float])]): Double = {
      val byM = cb.groupBy(_._1)
      val per = corpus.map { emb =>
        (0 until sim.Sim.PqM).map { m =>
          val sub = emb.slice(m * sim.Sim.PqDsub, (m + 1) * sim.Sim.PqDsub)
          byM(m).map { case (_, _, cw) =>
            sub.zip(cw).map { case (x, y) =>
              val dd = x.toDouble - y.toDouble; dd * dd
            }.sum
          }.min
        }.sum
      }
      per.sum / per.length
    }
    def cbAt(iters: Int): Seq[(Int, Int, Seq[Float])] = {
      if (iters > 0) s.conf.set("spark.graft.pq.train.iters", iters.toString)
      try sim.Sim.pqCodebookForTest(s, SfDir)
      finally s.conf.unset("spark.graft.pq.train.iters")
    }
    val objs = (0 to 3).map(i => distortion(cbAt(i)))
    info(s"distortion trajectory (iters 0..3): ${objs.map(o => f"$o%.6f").mkString(" -> ")}")
    (1 to 3).foreach { i =>
      assert(objs(i) <= objs(i - 1) + 1e-6,
        s"iteration $i increased distortion: ${objs.mkString(", ")}")
    }
    assert(objs(1) < objs(0), "first trained iteration must beat the label-seed codebook")
    // production shape: train on a 50% sample for 2 iterations — the
    // (m, c_id) cell set is preserved and the graded v6 still runs
    s.conf.set("spark.graft.pq.train.iters", "2")
    s.conf.set("spark.graft.pq.train.sample", "0.5")
    try {
      val sampled = sim.Sim.pqCodebookForTest(s, SfDir)
      assert(sampled.map(t => (t._1, t._2)).sorted == cbAt(0).map(t => (t._1, t._2)).sorted,
        "sampled training must keep one sub-codeword per (subspace, label)")
      assert(SparkEntry.queries("v6_pq_adc")(s, SfDir).collect().nonEmpty,
        "v6 must stay runnable on the trained codebook")
    } finally {
      s.conf.unset("spark.graft.pq.train.iters")
      s.conf.unset("spark.graft.pq.train.sample")
    }
  }

  test("s20 gap fill: grid tiles each inverter's span; filled slots carry the last reading forward") {
    // The oracle pins bytes; this pins the WITH FILL semantics: the
    // grid is exactly the contiguous 15-min lattice of each
    // inverter's [first, last] reading slot, rows flagged `filled`
    // repeat the previous row's value (zero-order hold), and rows
    // with readings are never flagged.
    val s = spark
    import s.implicits._
    val rows = solar.Solar.s20GapFill(s, SfDir)
      .select($"inverter", $"slot".cast("long"), $"n_readings", $"value_filled", $"filled")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (inv, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, _, v1, _), (_, s2, _, v2, f2)) =>
          assert(s2 - s1 == 900L, s"inverter $inv grid gap ${s2 - s1}s != 15 min")
          if (f2) assert(v2 == v1, s"inverter $inv filled slot $s2 broke the ZOH carry")
        case _ =>
      }
      assert(!sorted.head._5, s"inverter $inv first grid slot cannot be a fill")
      sorted.foreach { case (_, slot, n, _, filled) =>
        assert(filled == (n == 0L), s"inverter $inv slot $slot: filled flag vs n_readings")
      }
    }
  }

  test("m5 audio chunks: fixed-hop windows tile each blob's sample range") {
    val s = spark
    import s.implicits._
    val rows = multimodal.Multimodal.m5AudioChunks(s, SfDir)
      .select($"doc_id", $"n_samples", $"chunk_idx", $"start_sample", $"end_sample")
      .as[(Long, Int, Int, Int, Int)].collect()
    val win = multimodal.Multimodal.ChunkSamples
    val hop = multimodal.Multimodal.ChunkHop
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._3)
      val n = sorted.head._2
      assert(sorted.map(_._3).toSeq == sorted.indices.toSeq, s"doc $doc chunk idx gap")
      sorted.foreach { case (_, _, ci, start, end) =>
        assert(start == ci * hop, s"doc $doc chunk $ci start")
        assert(end == math.min(start + win, n), s"doc $doc chunk $ci end")
      }
      assert(sorted.last._5 == n, s"doc $doc final chunk must end at n_samples")
      // full coverage: every sample index is inside some chunk
      assert(sorted.head._4 == 0 && sorted.sliding(2).forall {
        case Array((_, _, _, _, e1), (_, _, _, s2, _)) => s2 <= e1
        case _ => true
      }, s"doc $doc chunks leave a gap")
    }
  }

  test("d10 semantic keep: greedy purge is sound and minimal vs the d5 pair set") {
    // Sound: no above-threshold pair survives with BOTH endpoints
    // kept. Minimal: every purged vector is the larger endpoint of at
    // least one pair (nothing is dropped without a reason).
    val s = spark
    import s.implicits._
    val kept = dedup.Dedup.d10SemanticKeep(s, SfDir)
      .select($"vec_id").as[Long].collect().toSet
    val pairs = dedup.Dedup.d5EmbedNeardup(s, SfDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "threshold produced no pairs — spec would be vacuous")
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"pair ($a, $b) survived with both endpoints kept")
    }
    val all = Tables.embeddings(s, SfDir).select($"vec_id").as[Long].collect().toSet
    val purged = all -- kept
    val purgeReasons = pairs.map(_._2).toSet
    assert(purged == purgeReasons,
      s"purge set must be exactly the larger endpoints of the pair set")
  }

  test("v7 quantized rerank: int8 shortlist recalls most of the exact top-5") {
    // The oracle pins every bit of the two-stage pipeline; this pins
    // the SEMANTIC property the hash can't see — the int8 coarse
    // shortlist (RerankC=20 of the corpus) must keep enough of the
    // true neighbors that the float rerank recovers most of the exact
    // brute-force top-5 (and rank-1 is fully trusted: with the
    // shortlist 4× deeper than k, losing the single nearest neighbor
    // to 7-bit quantization noise would mean the quantizer is broken).
    val s = spark
    import s.implicits._
    val got = sim.Sim.v7QuantizedRerank(s, SfDir)
      .select($"q_id", $"rnk", $"vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(got.size == 20)
    val e = Tables.embeddings(s, SfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = e.toMap
    val recalls = got.map { case (q, approx) =>
      val exact = e.filter(_._1 >= 20)
        .map { case (id, emb) => (id, cos(byId(q), emb)) }
        .sortBy { case (id, sc) => (-sc, id) }
        .take(sim.Sim.TopK).map(_._1)
      assert(approx.head == exact.head, s"query $q lost the rank-1 neighbor")
      exact.count(approx.contains).toDouble / exact.size
    }.toSeq
    val mean = recalls.sum / recalls.size
    info(f"v7 mean recall@5 vs exact: $mean%.2f")
    assert(mean >= 0.8, f"recall@5 $mean%.2f < 0.8 — int8 shortlist too lossy")
  }

  test("t11 ln-BM25 (spark.graft.bm25.ln): same positive set, rankings strongly agree") {
    // The graded t11 uses the rational Robertson idf for bit-exactness;
    // the conf-gated production variant applies Lucene's
    // ln(1 + (N−df+0.5)/(df+0.5)). A hash oracle is the wrong
    // instrument here — the POINT of the variant is different float
    // output — so the pin is a rank-agreement check: identical
    // positive-score doc sets (the log moves weights, never which
    // docs match) and a Spearman correlation near 1 over the scored
    // docs. (Raw Robertson ln WITHOUT the +1 measures rho = −0.97
    // here — df > N/2 makes the idf negative and flips every ranking —
    // which is why the variant uses the guarded Lucene form.)
    val s = spark
    import s.implicits._
    def scores(ln: Boolean): Map[Long, Double] =
      text.Text.bm25Scores(s, SfDir, ln)
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    val rat = scores(ln = false)
    val lnS = scores(ln = true)
    assert(rat.keySet == lnS.keySet, "same doc universe")
    val pos = rat.filter(_._2 != 0.0).keySet
    assert(pos == lnS.filter(_._2 != 0.0).keySet, "positive-score doc sets must match")
    assert(pos.size >= 10, s"too few scored docs (${pos.size}) for a meaningful check")
    val ids = pos.toSeq
    def rankOf(m: Map[Long, Double]): Map[Long, Int] =
      ids.sortBy(id => (-m(id), id)).zipWithIndex.toMap
    val r1 = rankOf(rat)
    val r2 = rankOf(lnS)
    val n = ids.size.toDouble
    val d2 = ids.map { id => val d = (r1(id) - r2(id)).toDouble; d * d }.sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    val moved = ids.count(id => r1(id) != r2(id))
    info(f"scored docs: ${ids.size}, Spearman rho=$rho%.4f, rank-moved: $moved")
    assert(rho >= 0.9, f"Spearman rho $rho%.3f < 0.9 — variants rank-diverged")
    // conf switch drives the graded entry point: its top-k must equal
    // the brute-force ln ranking (plan shape unchanged, scores from ln)
    s.conf.set("spark.graft.bm25.ln", "true")
    val lnTop =
      try text.Text.t11Bm25(s, SfDir).select($"doc_id").as[Long].collect().toSeq
      finally s.conf.unset("spark.graft.bm25.ln")
    val expect = lnS.toSeq.sortBy { case (id, sc) => (-sc, id) }
      .take(text.Text.Bm25TopK).map(_._1)
    assert(lnTop == expect, "t11 under bm25.ln must rank by the ln scores")
  }

  /** Average fractional ranks (Spearman/Mann-Whitney tie rule). */
  private def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
    val sorted = vs.sorted
    sorted.zipWithIndex.groupBy(_._1).map {
      case (v, ps) => v -> ps.map(_._2 + 1).sum.toDouble / ps.size
    }
  }

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100).cast("long")

  test("s30 Spearman: matches brute-force average-rank Pearson per inverter") {
    val s = spark
    import s.implicits._
    val raw = Tables.events(s, SfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts"), cents($"value"))
      .as[(Long, Long, Long)].collect().toSeq
    val got = solar.Solar.s30RankCorr(s, SfDir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.nonEmpty)
    raw.groupBy(_._1).foreach { case (inv, rows) =>
      val rx = avgRanks(rows.map(_._2))
      val ry = avgRanks(rows.map(_._3))
      val xr = rows.map(r => rx(r._2)); val yr = rows.map(r => ry(r._3))
      val n = rows.size.toDouble
      val mx = xr.sum / n; val my = yr.sum / n
      val cov = xr.zip(yr).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = xr.map(a => (a - mx) * (a - mx)).sum
      val vy = yr.map(b => (b - my) * (b - my)).sum
      if (vx > 0 && vy > 0) {
        val rho = cov / math.sqrt(vx * vy)
        assert(math.abs(got(inv) - rho) < 1e-9, s"s30 inverter $inv")
        assert(got(inv) >= -1.0 - 1e-12 && got(inv) <= 1.0 + 1e-12)
      } else assert(!got.contains(inv), s"s30 degenerate inverter $inv kept")
    }
  }

  test("q27 Mann-Whitney: U and tie-corrected z match brute force per segment") {
    val s = spark
    import s.implicits._
    val seg = Tables.customer(s, SfDir).select($"c_custkey", $"c_mktsegment")
    val raw = Tables.orders(s, SfDir)
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .join(seg, $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderpriority" === "1-URGENT", cents($"o_totalprice"))
      .as[(String, Boolean, Long)].collect().toSeq
    val got = relational.Relational.q27MannWhitney(s, SfDir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    raw.groupBy(_._1).foreach { case (sg, rows) =>
      val ranks = avgRanks(rows.map(_._3))
      val g1 = rows.filter(_._2); val g2 = rows.filterNot(_._2)
      if (g1.nonEmpty && g2.nonEmpty) {
        val n1 = g1.size.toDouble; val n2 = g2.size.toDouble; val n = n1 + n2
        val r1 = g1.map(r => ranks(r._3)).sum
        val u1 = n1 * n2 + n1 * (n1 + 1) / 2 - r1
        val ties = rows.groupBy(_._3).values
          .map(g => g.size.toDouble).map(t => t * t * t - t).sum
        val sigma2 = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
        if (sigma2 > 0) {
          val (_, gn1, gn2, gu, gz) = got(sg)
          assert(gn1 == g1.size && gn2 == g2.size, s"q27 counts $sg")
          assert(math.abs(gu - u1) < 1e-6, s"q27 U $sg")
          val z = (u1 - n1 * n2 / 2) / math.sqrt(sigma2)
          assert(math.abs(gz - z) < 1e-9, s"q27 z $sg")
        }
      } else assert(!got.contains(sg))
    }
  }

  test("s31 linreg: per-inverter least-squares line matches brute force") {
    val s = spark
    import s.implicits._
    val raw = Tables.events(s, SfDir)
      .filter($"event_type" === "view")
      .select($"user_id", expr("unix_micros(ts) div 1000000"), cents($"value"))
      .as[(Long, Long, Long)].collect().toSeq
    val got = solar.Solar.s31Linreg(s, SfDir)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    raw.groupBy(_._1).foreach { case (inv, rows) =>
      val x0 = rows.map(_._2).min
      val xs = rows.map(r => (r._2 - x0).toDouble)
      val ys = rows.map(_._3.toDouble)
      val n = rows.size.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val sxx = xs.map(a => (a - mx) * (a - mx)).sum
      if (sxx > 0) {
        val k = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum / sxx
        val b = my - k * mx
        val (_, gn, gslope, gb) = got(inv)
        assert(gn == rows.size)
        assert(math.abs(gslope - k * 3600 / 100) < 1e-6 * (1 + math.abs(gslope)),
          s"s31 slope inverter $inv")
        assert(math.abs(gb - b / 100) < 1e-6 * (1 + math.abs(gb)),
          s"s31 intercept inverter $inv")
      } else assert(!got.contains(inv))
    }
  }

  test("q28 Cramer's V: chi-square and V match brute force; V in [0,1]") {
    val s = spark
    import s.implicits._
    val raw = Tables.customer(s, SfDir)
      .join(Tables.nation(s, SfDir), $"c_nationkey" === $"n_nationkey")
      .select($"c_mktsegment", $"n_name")
      .as[(String, String)].collect().toSeq
    val cells = raw.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val n = raw.size.toDouble
    val rt = raw.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val ct = raw.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val chi2 = cells.map { case ((sg, nt), o) =>
      val e = rt(sg) * ct(nt) / n
      (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * math.min(rt.size - 1, ct.size - 1)))
    val Array((gn, gr, gc, gchi, gv)) = relational.Relational.q28CramersV(s, SfDir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(gn == raw.size && gr == rt.size && gc == ct.size)
    assert(math.abs(gchi - chi2) < 1e-6 * (1 + chi2), "q28 chi2")
    assert(math.abs(gv - v) < 1e-9 && gv >= 0.0 && gv <= 1.0, "q28 V")
  }

  test("t18 diversity: exact multiset identities per document") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, SfDir)
      .select($"doc_id", lower($"text")).as[(Long, String)].collect().toSeq
    val got = t18Rows(s)
    docs.foreach { case (id, txt) =>
      val t = txt.split("\\s+").filter(_.nonEmpty)
      val counts = t.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nTok = t.length.toLong
      val (gn, gd, gttr, gsimp, gtop) = got(id)
      assert(gn == nTok && gd == counts.size.toLong, s"t18 counts doc $id")
      assert(gttr == gd.toDouble / gn.toDouble, s"t18 ttr doc $id")
      val pairs = counts.values.map(c => c * (c - 1)).sum
      if (nTok > 1)
        assert(gsimp == pairs.toDouble / (nTok * (nTok - 1)).toDouble, s"t18 simpson doc $id")
      assert(gtop == counts.values.max.toDouble / nTok.toDouble, s"t18 top doc $id")
    }
  }

  private def t18Rows(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    text.Text.t18Diversity(s, SfDir)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
  }

  test("t20 distributed ranking: ranks are a permutation, order-consistent, tertiles exact") {
    val s = spark
    import s.implicits._
    val rows = text.Text.t20QualityBuckets(s, SfDir)
      .select($"doc_id", $"mean_prob", $"rank", $"bucket")
      .as[(Long, Double, Long, String)].collect()
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq,
      "global ranks must be exactly 1..n — offsets + local row_numbers stitched wrong otherwise")
    // rank order == (mean_prob DESC, doc_id ASC) order
    val byRank = rows.sortBy(_._3)
    assert(byRank.sliding(2).forall {
      case Array(a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      case _           => true
    }, "rank must follow the (mean_prob DESC, doc_id) total order")
    val sizes = rows.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes("head") == n / 3 && sizes("middle") == 2 * n / 3 - n / 3 &&
      sizes("tail") == n - 2 * n / 3, s"tertile sizes off: $sizes")
    // the offset stitch reads the range exchange from two plan
    // branches; prove the result does NOT depend on ReuseExchange
    // collapsing them (range boundary sampling is deterministic)
    s.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val off = text.Text.t20QualityBuckets(s, SfDir)
        .select($"doc_id", $"mean_prob", $"rank", $"bucket")
        .as[(Long, Double, Long, String)].collect()
      assert(off.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq,
        "t20 must be invariant to exchange-reuse being disabled")
    } finally s.conf.unset("spark.sql.exchange.reuse")
  }

  /** Reference LTTB (Steinarsson 2013) mirroring the query's exact
    * arithmetic: (x, y)-sorted input, integer bucket bounds, left-fold
    * centroids, first-tie-wins argmax, double area ops in the same
    * order. Selections must be BIT-identical, not merely close. */
  private def lttbRef(pts0: Seq[(Long, Double)], nOut: Int): Seq[(Long, Double)] = {
    val pts = pts0.sorted
    val n = pts.size
    if (n <= nOut) pts
    else {
      val nb = nOut - 2
      def lo(k: Int): Int = (1 + k.toLong * (n - 2) / nb).toInt
      val cent = (0 until nb).map { k =>
        val c = pts.slice(lo(k), lo(k + 1))
        var sx = 0.0; var sy = 0.0
        c.foreach { p => sx += p._1.toDouble; sy += p._2 }
        (sx / c.size, sy / c.size)
      }
      var px = pts.head._1.toDouble
      var py = pts.head._2
      val out = scala.collection.mutable.Buffer(pts.head)
      for (k <- 0 until nb) {
        val (ax, ay) =
          if (k < nb - 1) cent(k + 1) else (pts.last._1.toDouble, pts.last._2)
        val cand = pts.slice(lo(k), lo(k + 1))
        var bestA = -1.0
        var best = cand.head
        cand.foreach { c =>
          val ar = math.abs((px - ax) * (c._2 - py) -
            (px - c._1.toDouble) * (ay - py)) * 0.5
          if (ar > bestA) { bestA = ar; best = c }
        }
        px = best._1.toDouble; py = best._2
        out += best
      }
      (out :+ pts.last).toSeq
    }
  }

  test("s32 LTTB: bit-identical to the Scala reference; endpoints and sizes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // spiky sine series: 150 pts (selection path), 25 (just above the
    // keep-all threshold), 8 (below — passthrough)
    val rows = Seq(150, 25, 8).zipWithIndex.flatMap { case (n, inv) =>
      (0 until n).map { i =>
        val xUs = 1700000000000000L + i.toLong * 60000000L
        val y = math.sin(i / 7.0) * 100 +
          (if (rnd.nextInt(17) == 0) 500.0 else 0.0) + rnd.nextDouble()
        (inv.toLong, new java.sql.Timestamp(xUs / 1000), "purchase", y)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("s32spec").toString
    rows.toDF("user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = solar.Solar.s32Lttb(s, dir)
      .select($"inverter", unix_micros($"ts"), $"value")
      .as[(Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    rows.groupBy(_._1).foreach { case (inv, rs) =>
      val pts = rs.map(r => (r._2.getTime * 1000L, r._4))
      val expect = lttbRef(pts, solar.Solar.LttbPoints)
      assert(got(inv) == expect, s"s32 inverter $inv diverged from reference")
      if (rs.size > solar.Solar.LttbPoints)
        assert(got(inv).size == solar.Solar.LttbPoints)
      else assert(got(inv).size == rs.size)
      assert(got(inv).head == pts.min && got(inv).last == pts.max,
        "endpoints must be kept")
    }
  }

  test("round-12 additions: semantic invariants beyond the hash gate") {
    val s = spark
    import s.implicits._
    // s35: the derivative is non-negative by construction, and emits
    // exactly one row per consecutive purchase pair
    val s35 = solar.Solar.s35NonnegDerivative(s, SfDir)
    assert(s35.filter($"rate_per_hour" < 0.0).count() == 0)
    val purch = Tables.events(s, SfDir).filter($"event_type" === "purchase")
    val nPairs = purch.count() - purch.select($"user_id").distinct().count()
    assert(s35.count() == nPairs)
    // q31: within each nation the cumulative share is non-decreasing
    // in rank, ends at exactly 1.0, and classes run A..B..C contiguously
    val q31 = relational.Relational.q31Pareto(s, SfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"nation").orderBy($"rnk")
    assert(q31.withColumn("prev", lag($"cum_share", 1).over(w))
      .filter($"prev".isNotNull && $"cum_share" < $"prev").count() == 0)
    val last = q31.withColumn("mx", max($"rnk").over(
      org.apache.spark.sql.expressions.Window.partitionBy($"nation")))
      .filter($"rnk" === $"mx")
    assert(last.filter($"cum_share" =!= 1.0).count() == 0)
    val cls = q31.withColumn("prevc", lag($"abc", 1).over(w))
      .filter($"prevc".isNotNull)
    assert(cls.filter($"prevc" === "B" && $"abc" === "A").count() == 0)
    assert(cls.filter($"prevc" === "C" && $"abc" =!= "C").count() == 0)
    // e21: user totals conserve, and strict_increase can never reach a
    // HIGHER level than the plain-mode bounded funnel reaches overall
    val e21 = events.Events.e21FunnelInc(s, SfDir)
    val users = Tables.events(s, SfDir).select($"user_id").distinct().count()
    assert(e21.agg(sum($"n_users")).as[Long].head() == users)
    assert(e21.filter($"funnel_level" < 0 || $"funnel_level" > 3).count() == 0)
    // t22: exactly ≤3 keywords per doc, scores non-increasing in rank
    val t22 = text.Text.t22Keywords(s, SfDir)
    assert(t22.groupBy($"doc_id").count().filter($"count" > 3).count() == 0)
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"rnk")
    assert(t22.withColumn("pscore", lag($"score", 1).over(tw))
      .filter($"pscore".isNotNull && $"score" > $"pscore").count() == 0)
    // m8: the modality partition covers the whole corpus exactly once
    val m8 = multimodal.Multimodal.m8ModalityReport(s, SfDir)
    val docs = Tables.documents(s, SfDir).count()
    assert(m8.agg(sum($"n_docs")).as[Long].head() == docs)
    // d14: chunks tile each doc exactly (Σ chunk_len = token count),
    // and byte-identical documents are 100% duplicated chunks
    val d14 = dedup.Dedup.d14CdcDedup(s, SfDir)
    val tokCounts = Tables.documents(s, SfDir)
      .select($"doc_id", size(split(trim(lower($"text")), "\\s+")).cast("long").as("n"))
    assert(d14.join(tokCounts, "doc_id")
      .filter($"n_tokens" =!= $"n").count() == 0)
    val dupDocs = Tables.documents(s, SfDir)
      .groupBy(md5($"text").as("h")).agg(count(lit(1)).as("c"),
        collect_list($"doc_id").as("ids"))
      .filter($"c" > 1).select(explode($"ids").as("doc_id"))
    assert(d14.join(dupDocs, "doc_id")
      .filter($"dup_chunk_frac" =!= 1.0).count() == 0,
      "exact-duplicate docs must have every chunk duplicated")
    // v12: ≤3 neighbors per vector, cosine non-increasing in rank
    val v12 = sim.Sim.v12KnnGraph(s, SfDir)
    assert(v12.groupBy($"src").count().filter($"count" > 3).count() == 0)
    val vw = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"rnk")
    assert(v12.withColumn("pcos", lag($"cos", 1).over(vw))
      .filter($"pcos".isNotNull && $"cos" > $"pcos").count() == 0)
    // s36: the mode's count is at least the pigeonhole bound and the
    // distinct count never exceeds the reading count
    val s36 = solar.Solar.s36Mode(s, SfDir)
    assert(s36.filter($"mode_count" * $"n_distinct" < $"n_readings").count() == 0)
    assert(s36.filter($"n_distinct" > $"n_readings").count() == 0)
    // t23: weights are positive/finite, and the target language scores
    // strictly above every other language on average (the DSIR point)
    val t23 = text.Text.t23Dsir(s, SfDir)
    assert(t23.filter($"dsir_weight" <= 0.0 || $"dsir_weight".isNull).count() == 0)
    val byLang = t23.join(Tables.documents(s, SfDir), "doc_id")
      .groupBy($"lang").agg(avg($"dsir_weight").as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang(text.Text.DsirTarget)
    byLang.foreach { case (l, w) =>
      if (l != text.Text.DsirTarget)
        assert(en > w, s"target-language mean weight must exceed $l")
    }
  }

  test("r12 stats batch: pivot/setops/KS/corrected-V/decay/ANOVA/autocorr invariants") {
    val s = spark
    import s.implicits._
    // q32: per-nation row total across year columns == plain groupBy total
    val q32 = relational.Relational.q32Pivot(s, SfDir)
    val rowTot = q32.select($"nation",
      (1995 to 2001).map(y => coalesce(col(s"y$y"), lit(0.0)))
        .reduce(_ + _).as("t"))
    val direct = Tables.orders(s, SfDir)
      .join(Tables.customer(s, SfDir), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(s, SfDir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("t2"))
    assert(rowTot.join(direct, "nation")
      .filter(abs($"t" - $"t2") > 1e-6).count() == 0)
    // q33: retained+churned == |1994 buyers|, retained+acquired == |1995|
    val q33 = relational.Relational.q33SetOps(s, SfDir)
    val tot = q33.agg(sum($"n_retained").as("r"), sum($"n_churned").as("c"),
      sum($"n_acquired").as("a")).head()
    def buyers(yr: Int) = Tables.orders(s, SfDir)
      .filter(year($"o_orderdate") === yr).select($"o_custkey").distinct().count()
    assert(tot.getLong(0) + tot.getLong(1) == buyers(1996))
    assert(tot.getLong(0) + tot.getLong(2) == buyers(1997))
    // q34: D in [0,1]; scaled stat non-negative
    val q34 = relational.Relational.q34KsTest(s, SfDir)
    assert(q34.filter($"ks_d" < 0.0 || $"ks_d" > 1.0 || $"ks_scaled" < 0.0)
      .count() == 0)
    // q35: corrected V in [0,1] and finite
    val q35 = relational.Relational.q35CramersCorrected(s, SfDir).head()
    val vCorr = q35.getAs[Double]("cramers_v_corrected")
    assert(vCorr >= 0.0 && vCorr <= 1.0)
    // s37: weights ≤ 1 → decayed_sum ≤ raw sum; avg within value range
    val s37 = solar.Solar.s37ExpDecay(s, SfDir)
    val raw = Tables.events(s, SfDir).filter($"event_type" === "view")
      .groupBy($"user_id".as("inverter"))
      .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("rawsum"),
        min($"value").as("lo"), max($"value").as("hi"))
    assert(s37.join(raw, "inverter")
      .filter($"decayed_sum" > $"rawsum" + 1e-9).count() == 0)
    assert(s37.join(raw, "inverter")
      .filter($"decayed_avg" < $"lo" - 1e-9 || $"decayed_avg" > $"hi" + 1e-9)
      .count() == 0)
    // s38: F ≥ 0 and SSB+SSW == total sum of squares (direct recompute)
    val s38 = solar.Solar.s38Anova(s, SfDir).head()
    assert(s38.getAs[Double]("f_stat") >= 0.0)
    val vals = Tables.events(s, SfDir).filter($"event_type" === "view")
      .select($"value").as[Double].collect()
    val mean = vals.sum / vals.length
    val sst = vals.map(v => (v - mean) * (v - mean)).sum
    val ssTot = s38.getAs[Double]("ss_between") + s38.getAs[Double]("ss_within")
    assert(math.abs(ssTot - sst) / sst < 1e-6,
      s"SSB+SSW=$ssTot must equal SST=$sst")
    // s39: |rho| ≤ 1 and matches Spark's built-in corr on the lag pairs
    val s39 = solar.Solar.s39Autocorr(s, SfDir)
    assert(s39.filter(abs($"autocorr_lag1") > 1.0 + 1e-12).count() == 0)
    val hourly = Tables.events(s, SfDir).filter($"event_type" === "view")
      .withColumnRenamed("user_id", "inverter")
      .groupBy($"inverter", date_trunc("hour", $"ts").as("hour"))
      .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("x"))
    val lw = org.apache.spark.sql.expressions.Window
      .partitionBy($"inverter").orderBy($"hour")
    val ref = hourly.withColumn("y", lead($"x", 1).over(lw))
      .filter($"y".isNotNull)
      .groupBy($"inverter").agg(corr($"x", $"y").as("rho"))
    assert(s39.join(ref, "inverter")
      .filter(abs($"autocorr_lag1" - $"rho") > 1e-9).count() == 0)
  }

  test("r12 events batch: markov rows are distributions; conversion and RFM conserve users") {
    val s = spark
    import s.implicits._
    // e22: each from_type's probabilities sum to 1; pair count == N - U
    val e22 = events.Events.e22Markov(s, SfDir)
    assert(e22.groupBy($"from_type").agg(sum($"p").as("sp"))
      .filter(abs($"sp" - 1.0) > 1e-12).count() == 0)
    val ev = Tables.events(s, SfDir)
    val nPairs = e22.agg(sum($"n")).head().getLong(0)
    assert(nPairs == ev.count() - ev.select($"user_id").distinct().count())
    // e23: converted ≤ cohort size, rate in [0,1], median ≤ p90
    val e23 = events.Events.e23ConversionDelay(s, SfDir)
    assert(e23.filter($"n_converted" > $"n_users" ||
      $"conversion_rate" < 0.0 || $"conversion_rate" > 1.0).count() == 0)
    assert(e23.filter($"median_delay_s" > $"p90_delay_s").count() == 0)
    // e24: segment user counts partition the purchaser set exactly
    val e24 = events.Events.e24Rfm(s, SfDir)
    val purchasers = ev.filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(e24.agg(sum($"n_users")).head().getLong(0) == purchasers)
    assert(e24.filter(length($"segment") =!= 3).count() == 0)
  }

  test("r12 pipeline batch: Gopher rules, SRP-LSH recall, shard-pack conservation") {
    val s = spark
    import s.implicits._
    // t24: keep ⇔ conjunction of its flags; counts are consistent
    val t24 = text.Text.t24GopherRules(s, SfDir)
    assert(t24.filter($"keep" =!= ($"ok_count" && $"ok_len" && $"ok_alpha" &&
      $"ok_sym" && $"ok_stops")).count() == 0)
    assert(t24.filter($"n_alpha" > $"n_words" || $"n_stops" > $"n_words")
      .count() == 0)
    assert(t24.count() == Tables.documents(s, SfDir).count())
    // v13: top-3 ordering is strict and recall@3 vs brute force is
    // non-degenerate (banded candidates must find near neighbors)
    val v13 = sim.Sim.v13SrpLsh(s, SfDir).collect()
    v13.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
    val e = Tables.embeddings(s, SfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosv(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val hits = (0L until 20L).map { qid =>
      val brute = e.filter(_._1 >= 20).toSeq
        .map { case (id, v) => (id, cosv(e(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
      val got = v13.filter(_.getLong(0) == qid).map(_.getLong(2)).toSet
      (brute & got).size
    }.sum
    info(s"v13 SRP-LSH recall@3: $hits/60")
    assert(hits >= 12, s"banded SRP recall collapsed: $hits/60")
    // v14: both methods report sane recall, and the srp row agrees
    // with this spec's own brute-force hit count above
    val v14 = sim.Sim.v14RecallReport(s, SfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    v14.values.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_queries") * r.getAs[Int]("k"))
    }
    assert(v14("srp").getAs[Long]("n_hits") == hits,
      s"v14 srp hits ${v14("srp").getAs[Long]("n_hits")} != spec-computed $hits")
    // d15: buckets partition the full candidate set; means are valid shares
    val d15 = dedup.Dedup.d15MinhashCalibration(s, SfDir)
    assert(d15.agg(sum($"n_pairs")).head().getLong(0) ==
      dedup.Dedup.d3MinhashLsh(s, SfDir).count())
    assert(d15.filter($"bucket" < 0 || $"bucket" > 10 ||
      $"mean_est" < 0.0 || $"mean_est" > 1.0 ||
      $"mean_exact" < 0.0 || $"mean_exact" > 1.0 ||
      $"mean_abs_err" < 0.0 || $"mean_abs_err" > 1.0).count() == 0)
    // v15: a probability-mass-like vector — positive everywhere,
    // total ≤ 1 (dangling mass is dropped, never created), floor at
    // the teleport term, and nodes with in-edges sit strictly above it
    val v15 = sim.Sim.v15Pagerank(s, SfDir)
    val nNodes = Tables.embeddings(s, SfDir).count()
    assert(v15.count() == nNodes)
    val floorPr = sim.Sim.PrBase / nNodes
    assert(v15.filter($"pr" < floorPr - 1e-15).count() == 0)
    val mass = v15.agg(sum($"pr")).head().getDouble(0)
    assert(mass > 0.0 && mass <= 1.0 + 1e-9, s"pagerank mass $mass")
    val withIn = sim.Sim.v12KnnGraph(s, SfDir).select($"dst").distinct()
    assert(v15.join(withIn, $"node" === $"dst")
      .filter($"pr" <= floorPr + 1e-15).count() == 0,
      "nodes with in-edges must exceed the teleport floor")
    // m9: shard manifests conserve items and bytes per source
    val m9 = multimodal.Multimodal.m9ShardPack(s, SfDir)
    val bySrc = m9.groupBy($"source")
      .agg(sum($"n_items").as("items"), sum($"bytes").as("b"),
        max($"shard").as("maxs"), count(lit(1)).as("nshards"))
    val docs = Tables.documents(s, SfDir).groupBy($"source")
      .agg(count(lit(1)).as("ndocs"))
    assert(bySrc.join(docs, "source").filter($"items" =!= $"ndocs").count() == 0)
    // shards are contiguous 0..max (byte-offset packing leaves no holes)
    assert(bySrc.filter($"maxs" + 1 =!= $"nshards").count() == 0)
    assert(m9.filter($"first_doc" > $"last_doc").count() == 0)
    // m10: per-item index agrees with the m9 manifests and every
    // start offset lies inside its shard
    val m10 = multimodal.Multimodal.m10TarIndex(s, SfDir)
    assert(m10.filter($"offset" < 0 ||
      $"offset" >= multimodal.Multimodal.ShardCapacity).count() == 0)
    val fromIndex = m10.groupBy($"source", $"shard")
      .agg(count(lit(1)).as("ni"), sum($"media_bytes").as("bi"))
    assert(m9.join(fromIndex, Seq("source", "shard"))
      .filter($"n_items" =!= $"ni" || $"bytes" =!= $"bi").count() == 0)
    // t26: selection report is conservative and the acceptance rule
    // reproduces independently (Java md5 over the same text)
    val t26 = text.Text.t26ImportanceResample(s, SfDir)
    assert(t26.filter($"n_kept" > $"n_docs" || $"n_kept" < 0).count() == 0)
    val wts = text.Text.t23Dsir(s, SfDir)
      .select($"doc_id", $"dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectKept = Tables.documents(s, SfDir)
      .select($"doc_id", $"text").collect().count { r =>
        wts.get(r.getLong(0)).exists { w =>
          val hex = md.digest(r.getString(1).getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15)
          val u = java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
          u < math.min(1.0, text.Text.DsirAlpha * w)
        }
      }
    assert(t26.agg(sum($"n_kept")).head().getLong(0) == expectKept)
  }

  test("r12 hierarchy/telemetry batch: percent-of-parent sums, wraparound bounds, degradation flags") {
    val s = spark
    import s.implicits._
    // q36: shares sum to 1 within each parent; revenue conserves up the levels
    val q36 = relational.Relational.q36PercentOfParent(s, SfDir)
    val detailByRegion = q36.filter($"lvl" === 0).groupBy($"region")
      .agg(sum($"share_of_parent").as("sp"), sum($"revenue").as("rev"))
    assert(detailByRegion.filter(abs($"sp" - 1.0) > 1e-12).count() == 0)
    val regions = q36.filter($"lvl" === 1)
    assert(regions.agg(abs(sum($"share_of_parent") - 1.0)).head().getDouble(0) < 1e-12)
    val regRev = regions.select($"region", $"revenue".as("rrev"))
    assert(detailByRegion.join(regRev, "region")
      .filter(abs($"rev" - $"rrev") > 1e-6).count() == 0)
    // s41: every delta in [0, 65535]; wraps only when a smaller u16 follows
    val s41 = solar.Solar.s41Wraparound(s, SfDir)
    assert(s41.filter($"raw_sum" < 0 || $"n_wraps" > $"n_deltas").count() == 0)
    assert(s41.filter($"raw_sum" > $"n_deltas" * 65535L).count() == 0)
    // s42: flag agrees with the ratio (exact cross-multiplication side)
    val s42 = solar.Solar.s42Degradation(s, SfDir)
    assert(s42.filter($"degraded" && $"perf_ratio" >= 1.0 + 1e-12).count() == 0)
    assert(s42.filter(!$"degraded" && $"perf_ratio" < 1.0 - 1e-12).count() == 0)
    assert(s42.filter($"perf_ratio" <= 0.0).count() == 0)
    // q37: accounting identities — active = new + returning; the
    // final cumulative equals the distinct customer base
    val q37 = relational.Relational.q37NewVsReturning(s, SfDir)
    assert(q37.filter($"n_active" =!= $"n_new" + $"n_returning" ||
      $"n_returning" < 0).count() == 0)
    val lastCum = q37.orderBy($"month".desc).head().getAs[Long]("cum_customers")
    val custs = Tables.orders(s, SfDir).select($"o_custkey").distinct().count()
    assert(lastCum == custs)
    // m11: per (epoch, source) positions are a contiguous 1..n
    // permutation, and the two epochs order docs differently
    val m11 = multimodal.Multimodal.m11EpochShuffle(s, SfDir)
    val perm = m11.groupBy($"epoch", $"source")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"),
        countDistinct($"pos").as("nd"))
    assert(perm.filter($"mx" =!= $"n" || $"nd" =!= $"n").count() == 0)
    val e0 = m11.filter($"epoch" === 0).select($"source", $"doc_id", $"pos".as("p0"))
    val e1 = m11.filter($"epoch" === 1).select($"source", $"doc_id", $"pos".as("p1"))
    assert(e0.join(e1, Seq("source", "doc_id"))
      .filter($"p0" =!= $"p1").count() > 0,
      "epochs must reshuffle: identical orders mean the epoch salt is dead")
  }

  test("r12 second batch: engagement, histogram, dedup-topology and gate invariants") {
    val s = spark
    import s.implicits._
    val events = Tables.events(s, SfDir)
    val docs = Tables.documents(s, SfDir)
    // e25: MAU dominates DAU; stickiness in (0, 1]
    val e25 = graft.events.Events.e25Stickiness(s, SfDir)
    assert(e25.filter($"mau" < $"dau" || $"stickiness" <= 0.0 ||
      $"stickiness" > 1.0).count() == 0)
    // e26: bounces bounded by sessions
    val e26 = graft.events.Events.e26BounceRate(s, SfDir)
    assert(e26.filter($"n_bounces" > $"n_sessions" ||
      $"bounce_rate" < 0.0 || $"bounce_rate" > 1.0).count() == 0)
    // e27: the peak value must equal e13's per day (two plans, one truth)
    val e27 = graft.events.Events.e27PeakPosition(s, SfDir)
    val e13 = graft.events.Events.e13MaxConcurrency(s, SfDir)
      .select($"day", $"peak_concurrent".as("p13"))
    assert(e27.join(e13, "day").filter($"peak_concurrent" =!= $"p13").count() == 0)
    // e28: the grid partitions all events exactly once
    val e28 = graft.events.Events.e28DowProfile(s, SfDir)
    assert(e28.agg(sum($"n_events")).as[Long].head() == events.count())
    // e29: users conserve; dedup mode never reaches a level plain
    // windowFunnel (e6's bounded run) cannot
    val e29 = graft.events.Events.e29FunnelDedup(s, SfDir)
    val users = events.select($"user_id").distinct().count()
    assert(e29.agg(sum($"n_users")).as[Long].head() == users)
    assert(e29.filter($"funnel_level" < 0 || $"funnel_level" > 3).count() == 0)
    // s43: df is the integer n1+n2-2
    val s43 = solar.Solar.s43StudentTtest(s, SfDir)
    assert(s43.filter($"df" =!= $"n_view" + $"n_click" - 2).count() == 0)
    // s44: one glyph per active hour (all glyphs are BMP chars)
    val s44 = solar.Solar.s44Sparkbar(s, SfDir)
    assert(s44.filter(length($"bar") =!= $"n_hours").count() == 0)
    // s45: quantiles ordered and within the bucket universe
    val s45 = solar.Solar.s45QuantileTiming(s, SfDir)
    assert(s45.filter($"p50_ms" > $"p95_ms" || $"p50_ms" < 0 ||
      $"p95_ms" > 65536L).count() == 0)
    // s47: the rollup conserves each inverter's reading count
    val s47 = solar.Solar.s47IncrementalQuantiles(s, SfDir)
    val perInv = events.filter($"event_type" === "view")
      .groupBy($"user_id".as("inverter")).agg(count(lit(1)).as("n"))
    assert(s47.join(perInv, "inverter")
      .filter($"n_readings" =!= $"n").count() == 0)
    // d16: keep rule is global — kept docs across sources == distinct texts
    val d16 = dedup.Dedup.d16EffectiveTokens(s, SfDir)
    val distinctTexts = docs.select(md5($"text")).distinct().count()
    assert(d16.agg(sum($"n_kept")).as[Long].head() == distinctTexts)
    assert(d16.filter($"tokens_kept" > $"tokens_total").count() == 0)
    // d17: the global-pass identity — total drops == docs − distinct texts;
    // a shard-local pass can never drop more than the global pass
    val d17 = dedup.Dedup.d17ShardedDedup(s, SfDir)
    assert(d17.agg(sum($"drops_global")).as[Long].head() ==
      docs.count() - distinctTexts)
    assert(d17.filter($"missed_by_local" < 0).count() == 0)
    // v16: cells partition the corpus exactly once
    val v16 = sim.Sim.v16IvfStats(s, SfDir)
    assert(v16.agg(sum($"n_vecs")).as[Long].head() ==
      Tables.embeddings(s, SfDir).count())
    assert(v16.filter($"mean_cos_q" < $"min_cos" - 1e-6 ||
      $"mean_cos_q" > $"max_cos" + 1e-6).count() == 0)
    // q38: the contingency coefficient is bounded in [0, 1)
    val q38 = relational.Relational.q38Contingency(s, SfDir).head()
    assert(q38.getAs[Double]("contingency_coef") >= 0.0 &&
      q38.getAs[Double]("contingency_coef") < 1.0)
    // q39: buckets partition all line items exactly once
    val q39 = relational.Relational.q39ShipDelay(s, SfDir)
    assert(q39.agg(sum($"high_line_count" + $"low_line_count")).as[Long].head() ==
      Tables.lineitem(s, SfDir).count())
    // t25/m12: composition tables cover the corpus exactly once
    val t25 = text.Text.t25MixReport(s, SfDir)
    assert(t25.agg(sum($"n_docs")).as[Long].head() == docs.count())
    val m12 = multimodal.Multimodal.m12DatasetCard(s, SfDir)
    assert(m12.agg(sum($"n_docs")).as[Long].head() == docs.count())
    // t27: the earliest eligible doc is 100% novel by construction
    val t27 = text.Text.t27Novelty(s, SfDir)
    val firstDoc = t27.orderBy($"doc_id").head()
    assert(firstDoc.getAs[Double]("novelty") == 1.0,
      s"first doc must be all-novel, got $firstDoc")
    assert(t27.filter($"novelty" < 0.0 || $"novelty" > 1.0).count() == 0)
    // m13: keep gate bounded; quantized mean inside the cosine hull
    val m13 = multimodal.Multimodal.m13ClipFilter(s, SfDir)
    assert(m13.filter($"n_kept" > $"n_pairs" ||
      $"mean_cos_q" < $"min_cos" - 1e-6 ||
      $"mean_cos_q" > $"max_cos" + 1e-6).count() == 0)
    // st10: one row per observed (inverter, stream) pair
    val st10 = streaming.Streaming.st10StreamLast(s, SfDir)
    assert(st10.count() ==
      events.select($"user_id", $"event_type").distinct().count())
    // st11: per-window bin mass equals the window's reading count
    val st11 = streaming.Streaming.st11StreamHistogram(s, SfDir)
    assert(st11.groupBy($"hour", $"n_readings").agg(sum($"cnt").as("m"))
      .filter($"m" =!= $"n_readings").count() == 0)
  }

  test("q23: grouped distributed ranking equals the per-nation window form bit-for-bit") {
    val s = spark
    import s.implicits._
    // r13 rewrite: Window.partitionBy(nation) puts a whole nation in
    // one task; the range-partitioned (pid, nation)-local form with
    // broadcast offsets must reproduce ntile/percent_rank/cume_dist
    // EXACTLY (unique order key ⇒ rank reconstruction is closed-form)
    val got = relational.Relational.q23SpendDeciles(s, SfDir)
      .select($"c_custkey", $"nation", $"spend".cast("string"),
        $"decile", $"pct_rank", $"cume")
      .collect().map(_.toSeq).toSet
    val spend = Tables.orders(s, SfDir)
      .groupBy($"o_custkey")
      .agg(sum($"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("spend"))
    val base = Tables.customer(s, SfDir)
      .join(spend, $"c_custkey" === $"o_custkey")
      .join(broadcast(Tables.nation(s, SfDir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("nation"), $"spend")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"nation").orderBy($"spend".desc, $"c_custkey")
    val ref = base
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select($"c_custkey", $"nation", $"spend".cast("string"),
        $"decile", $"pct_rank", $"cume")
      .collect().map(_.toSeq).toSet
    assert(got == ref,
      s"distributed ranking drifted: ${(got diff ref).take(3)} vs ${(ref diff got).take(3)}")
    val plan = relational.Relational.q23SpendDeciles(s, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(nation"),
      "q23 must rank over range partitions, not a per-nation hash window")
  }

  test("m6 IVF production path: one row per image, never beats exact, above-chance agreement") {
    val s = spark
    import s.implicits._
    def run() = multimodal.Multimodal.m6CaptionRetrieval(s, SfDir)
      .select($"doc_id", $"caption_id", $"cos").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exact = run()
    s.conf.set("spark.graft.m6.ivf", "true")
    try {
      val ivf = run()
      // cell-pruned retrieval answers every image and can only ever
      // score a SUBSET of the exact candidates (so never a higher
      // cosine) — those are the hard invariants. Agreement with the
      // exact top-1 is the nprobe-bounded recall tradeoff: the STUB
      // tower's features are not CLIP-aligned with the caption space,
      // so the probed-cell hit rate is modest (measured ~23% at
      // sf0.001 vs ~10% chance over the ~2/20 probed cells) — pin
      // clearly-above-chance, not a production recall (a real aligned
      // tower changes the data, not the plan).
      assert(ivf.keySet == exact.keySet)
      assert(ivf.forall { case (doc, (_, c)) => c <= exact(doc)._2 + 1e-12 })
      val agree = ivf.count { case (doc, (id, _)) => exact(doc)._1 == id }
      assert(agree * 6 >= ivf.size,
        s"IVF top-1 agreement below chance band: $agree/${ivf.size}")
    } finally s.conf.unset("spark.graft.m6.ivf")
  }

  test("e31: a zero-event outage day is visible, flagged, and does not silence the month after it") {
    val s = spark
    import s.implicits._
    // 46 calendar days of ~steady volume with day 40 a TOTAL outage
    // (zero events). A groupBy-only rollup would have no day-40 row
    // and would starve the next 28 windows below full; the densified
    // spine must emit day 40 as an n=0 anomaly and keep later days'
    // windows full.
    val dir = "/tmp/graft_e31_outage"
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    (0 until 46).filter(_ != 40).flatMap { day =>
      (0 until 100).map { i =>
        (day * 100L + i, new java.sql.Timestamp(
          base + day * 86400000L + i * 600000L),
          i.toLong % 7, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = events.Events.e31VolumeAnomaly(s, dir)
      .select($"day".cast("string"), $"n_events", $"is_anomaly")
      .as[(String, Long, Boolean)].collect()
      .map { case (d, n, a) => d.take(10) -> ((n, a)) }.toMap
    assert(out.contains("2026-02-10"), s"outage day must be present: ${out.keys}")
    assert(out("2026-02-10") == (0L, true), "the outage day must be flagged")
    assert(out.contains("2026-02-15"),
      "days after the outage must keep full 28-day windows")
    assert(!out("2026-02-12")._2, "steady days stay unflagged")
  }

  test("r13 batch: clipping runs, bucket profile mass, vocab growth, recall sweep, shard balance, anomaly gate") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, SfDir)
    // s49: event-qualified counts are bounded by raw clipped counts;
    // any reported event implies a run of at least ClipMinRun
    val s49 = solar.Solar.s49Clipping(s, SfDir)
    assert(s49.filter($"clipped_in_events" > $"n_clipped" ||
      $"n_clipped" > $"n_readings" ||
      ($"n_clip_events" > 0 && $"longest_run" < solar.Solar.ClipMinRun) ||
      $"clipped_share" < 0.0 || $"clipped_share" > 1.0).count() == 0)
    // d18: every band's bucket members sum to the shingle-eligible
    // corpus (each doc lands in exactly one bucket per band), and the
    // over-cap columns are consistent
    val d18 = dedup.Dedup.d18BucketProfile(s, SfDir)
    val eligible = docs.filter(length($"text") >= dedup.Dedup.ShingleLen).count()
    val perBand = d18.groupBy($"band").agg(sum($"n_docs").as("nd")).collect()
    assert(perBand.length == dedup.Dedup.Bands &&
      perBand.forall(_.getAs[Long]("nd") == eligible))
    assert(d18.filter($"pairs_averted" > $"pair_mass" ||
      $"n_over_cap" > $"n_buckets").count() == 0)
    // t29: cumulative columns are monotone in the checkpoint and
    // distinct vocabulary never exceeds tokens
    val t29 = text.Text.t29VocabGrowth(s, SfDir).orderBy($"source", $"checkpoint")
      .collect().groupBy(_.getAs[String]("source"))
    t29.values.foreach { rows =>
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("cum_tokens") <= b.getAs[Long]("cum_tokens"))
          assert(a.getAs[Long]("cum_distinct") <= b.getAs[Long]("cum_distinct"))
        case _ =>
      }
      rows.foreach(r =>
        assert(r.getAs[Long]("cum_distinct") <= r.getAs[Long]("cum_tokens")))
    }
    // v18: widening the probe set can only grow the candidate pool —
    // recall is monotone nondecreasing in nprobe, and bounded by 1
    val v18 = sim.Sim.v18RecallNprobe(s, SfDir).orderBy($"nprobe").collect()
    assert(v18.length == sim.Sim.NprobeLevels.length)
    v18.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("recall") <= b.getAs[Double]("recall") + 1e-12)
      case _ =>
    }
    assert(v18.forall(r => r.getAs[Double]("recall") >= 0.0 &&
      r.getAs[Double]("recall") <= 1.0))
    // m15: shard items cover the corpus exactly once; min ≤ max
    val m15 = multimodal.Multimodal.m15ShardBalance(s, SfDir)
    assert(m15.agg(sum($"n_items")).as[Long].head() == docs.count())
    assert(m15.filter($"min_shard_bytes" > $"max_shard_bytes" ||
      $"skew" < 1.0 - 1e-12).count() == 0)
    // e31: the integer anomaly gate agrees with the display z-score
    // whenever the window variance is nonzero (|z| > 3 ⇔ flagged) —
    // away from the boundary: the gate decides in exact DECIMAL, z in
    // rounded doubles, so |z| within ulp-noise of exactly 3 may
    // legitimately disagree
    val e31 = events.Events.e31VolumeAnomaly(s, SfDir)
    assert(e31.filter($"z".isNotNull &&
      abs(abs($"z") - 3.0) > 1e-9 &&
      (abs($"z") > 3.0) =!= $"is_anomaly").count() == 0)
    // q41: pair counts are bounded by both marginals; lift and support
    // agree with their integer definitions
    val q41 = relational.Relational.q41CopurchaseLift(s, SfDir)
    assert(q41.filter($"n_pair" > $"n_a" || $"n_pair" > $"n_b" ||
      $"support" < 0.0 || $"support" > 1.0 || $"lift" < 0.0).count() == 0)
    assert(q41.filter($"brand_a" >= $"brand_b").count() == 0)
    // s50: ratio present exactly when both sides are defined (a
    // single-reading day has NO ZOH coverage → null integral, honest
    // null ratio — mirrored by the oracle's null sum)
    val s50 = solar.Solar.s50EnergyBalance(s, SfDir)
    assert(s50.filter($"balance_ratio".isNull &&
      $"counter_units" > 0.0 && $"integral_wh".isNotNull).count() == 0)
    assert(s50.filter($"integral_wh" < 0.0).count() == 0)
    // v19: recall within [0,1]; hits bounded by k; one row per query
    val v19 = sim.Sim.v19PqRecall(s, SfDir).collect()
    assert(v19.length == sim.Sim.PqQueries)
    assert(v19.forall { r =>
      val h = r.getAs[Long]("hits"); h >= 0 && h <= sim.Sim.PqTopK &&
        r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0
    })
    // e32: every user with >=1 purchase lands in exactly one
    // prev-type bucket (last_match picks one row per user)
    val e32 = events.Events.e32PrevNode(s, SfDir)
    val buyers = Tables.events(s, SfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(e32.agg(sum($"n_users")).as[Long].head() == buyers)
    // s51: pin the known-variance algebra by replay — the CI must be
    // symmetric about Δmu (= z·se) and exactly 2·1.96·se wide, with
    // se reconstructed from the literal published variances and the
    // reported counts.
    val s51 = solar.Solar.s51MeanZtest(s, SfDir)
    val s51bad = s51.select($"n_view", $"n_click", $"z_stat",
        $"ci_low", $"ci_high",
        (($"ci_low" + $"ci_high") / 2.0).as("mid"),
        sqrt(lit(900.0) / $"n_view" + lit(400.0) / $"n_click").as("se"))
      .filter(
        // CI is symmetric about Δmu: mid == z*se up to replayed ops
        abs($"mid" - $"z_stat" * $"se") > lit(1e-9) ||
        // CI width is exactly 2·1.96·se in replayed double ops
        abs(($"ci_high" - $"ci_low") - lit(2.0) * lit(1.96) * $"se") >
          lit(1e-9) ||
        $"ci_high" < $"ci_low")
      .count()
    assert(s51bad == 0)
  }
}
