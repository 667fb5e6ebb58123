package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling probe (PLANS.md "Measured scaling
  * probe"). Builds an 8× corpus in /tmp and times named queries on
  * both corpora with the [[BenchCore]] methodology, printing ratios —
  * linear-at-8× is the evidence the 100 TB claims rest on; anything
  * super-linear is a red flag to chase in the plan.
  *
  * Copies are content-decorrelated so the blow-up is real, not
  * degenerate self-similarity:
  * - documents: per-copy vowel rotation (copies don't trivially
  *   collide in LSH buckets; the 5-cycle still makes copies 0/5, 1/6,
  *   2/7 exact cross-copy dups — noted with the d6 measurement);
  * - embeddings: per-copy dimension rotation (norm-preserving, breaks
  *   cross-copy cosine alignment), vec_id offset keeps the bounded
  *   query sides (vec_id < 5/20) pinned to copy 0;
  * - events + orders: aligned id offsets (user_id ↔ o_custkey move
  *   together) so per-user join semantics hold within each copy and
  *   copies never join across.
  *
  * `runMain graft.ScaleProbe [name...]` (defaults to d6/d7/d9).
  * `SPARK_GRAFT_PROBE_COPIES` overrides the blow-up factor (default 8;
  * 64 pins the d7 contraction-round claim further out).
  *
  * `SPARK_GRAFT_PROBE_SKEW=1` builds HOT-KEY variants of the events
  * AND embeddings copies — one user owns ~30% of all view rows, and
  * one IVF cell owns ~30% of all vectors (every hot vector is the
  * same cell-seed embedding) — and reports, for each probed query,
  * whether AQE's skew-join split fired on the final plan (defaults
  * to e8/e9, the user_id-shuffled interval joins; pass v12_knn_graph
  * for the hot-cell in-cell self-join case). The AQE
  * skew thresholds are scaled down to match the probe corpus size —
  * at production partition sizes the stock 256 MB thresholds play the
  * same role; what the probe pins is that the hot key stays INSIDE
  * the AQE safety net (both joins plan as SMJ with a plain equi key +
  * range filter), rather than escaping it via a non-splittable shape.
  */
object ScaleProbe {
  val Copies = math.max(2, sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "8").toInt)
  val Skew = sys.env.get("SPARK_GRAFT_PROBE_SKEW").contains("1")
  val HotUser = 1L
  val ProbeDir = s"/tmp/graft_scaleprobe${Copies}x" + (if (Skew) "_skew" else "")
  private val SourceMarker = s"$ProbeDir/SOURCE_DIR"

  /** A cached probe corpus is only valid for the base dir it was built
    * from — a run after changing SPARK_GRAFT_SF_DIR must rebuild, not
    * silently measure ratios against a stale corpus. */
  private def ensureFreshFor(base: String): Unit = {
    val marker = new java.io.File(SourceMarker)
    val recorded =
      if (marker.exists())
        java.nio.file.Files.readString(marker.toPath).trim
      else ""
    if (recorded != base) {
      val dir = new java.io.File(ProbeDir)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(dir)
      }
      dir.mkdirs()
      val w = new java.io.PrintWriter(marker)
      try w.print(base) finally w.close()
    }
  }

  private def haveTable(t: String): Boolean =
    new java.io.File(s"$ProbeDir/$t.parquet").exists()

  private def writeCopies(name: String, copies: Seq[DataFrame]): Unit = {
    copies.reduce(_ unionAll _)
      .repartition(Copies)
      .write.mode("overwrite").parquet(s"$ProbeDir/$name.parquet")
    println(s"[probe] built ${Copies}x $name at $ProbeDir")
  }

  private def build(spark: SparkSession, base: String): Unit = {
    import spark.implicits._
    ensureFreshFor(base)
    val ks = 0 until Copies
    if (!haveTable("documents")) {
      val docs = Tables.documents(spark, base)
      val vows = "aeiou"
      writeCopies("documents", ks.map { k =>
        val rot = vows.drop(k % 5) + vows.take(k % 5)
        docs.select(
          ($"doc_id" + lit(k * 10000000L)).as("doc_id"),
          translate($"text", vows, rot).as("text"),
          $"lang", $"source", $"n_chars")
      })
    }
    if (!haveTable("embeddings")) {
      val emb = Tables.embeddings(spark, base)
      // hot-cell variant: ~30% of every copy's vectors (deterministic
      // by vec_id) replaced with SCALED copies of one fixed direction —
      // the embedding of the base corpus's minimum vec_id, which is a
      // cell seed (centroids = per-label min_by(vec_id)). Cosine is
      // scale-invariant, so every hot vector assigns to THAT cell; the
      // per-vector scale keeps the float bytes DISTINCT — byte-
      // identical vectors would collapse under shuffle compression and
      // hide the hot partition from AQE's byte-based skew detection
      // (measured: an identical-vector variant compressed away and no
      // split fired). Label-min vectors are never replaced, so the
      // centroid set itself stays clean and exactly one centroid
      // matches the hot direction. This is the v12 in-cell self-join's
      // realistic skew case: one boilerplate cluster owning ~30%.
      val hotCtx =
        if (Skew)
          Some((
            broadcast(emb.orderBy($"vec_id").limit(1)
              .select($"embedding".as("hot_emb"))),
            broadcast(emb.groupBy($"label").agg(min($"vec_id").as("mv")))))
        else None
      writeCopies("embeddings", ks.map { k =>
        val r = k % sim.Sim.Dims // rotate mod Dims so any copy count is safe
        val rotated =
          if (r == 0) $"embedding"
          else concat(
            slice($"embedding", r + 1, sim.Sim.Dims - r),
            slice($"embedding", 1, r))
        hotCtx match {
          case None =>
            emb.select(
              ($"vec_id" + lit(k * 10000000L)).as("vec_id"),
              $"label", rotated.as("embedding"))
          case Some((hotEmb, labelMin)) =>
            val scale = (lit(1.0) +
              pmod($"vec_id" * 7919L, lit(1000L)).cast("double") / 1000.0)
            emb.join(labelMin, "label")
              .crossJoin(hotEmb)
              .select(
                ($"vec_id" + lit(k * 10000000L)).as("vec_id"),
                $"label",
                when(pmod($"vec_id", lit(10)) < 3 && $"vec_id" =!= $"mv",
                  transform($"hot_emb", x => (x * scale).cast("float")))
                  .otherwise(rotated).as("embedding"))
        }
      })
    }
    if (!haveTable("events")) {
      val ev = Tables.events(spark, base)
      val rest = ev.columns.filterNot(c => c == "event_id" || c == "user_id").map(col)
      writeCopies("events", ks.map { k =>
        val copy = ev.select(Seq(
          ($"event_id" + lit(k * 100000000L)).as("event_id"),
          ($"user_id" + lit(k * 10000000L)).as("user_id")) ++ rest: _*)
        // hot-key variant: ~30% of every copy's views AND clicks
        // reassigned to ONE global user (deterministic by event_id,
        // ts untouched) — the user_id shuffle partition holding
        // HotUser carries ~30% of those rows: views feed e8/e9's
        // interval joins, clicks feed st13's stream-stream join, the
        // realistic one-power-user skew case for both
        if (Skew)
          copy.withColumn("user_id",
            when($"event_type".isin("view", "click") &&
                pmod($"event_id", lit(10)) < 3, lit(HotUser))
              .otherwise($"user_id"))
        else copy
      })
    }
    if (!haveTable("orders")) {
      val od = Tables.orders(spark, base)
      val rest = od.columns.filterNot(c => c == "o_orderkey" || c == "o_custkey").map(col)
      writeCopies("orders", ks.map { k =>
        od.select(Seq(
          ($"o_orderkey" + lit(k * 100000000L)).as("o_orderkey"),
          ($"o_custkey" + lit(k * 10000000L)).as("o_custkey")) ++ rest: _*)
      })
    }
    if (!haveTable("customer")) {
      // c_custkey offsets aligned with orders' o_custkey so the
      // order→customer join semantics hold within each copy; the
      // categorical columns (segment, nation) repeat — categories
      // don't scale with the corpus, which is exactly the q27/q28
      // contingency assumption.
      val cu = Tables.customer(spark, base)
      val rest = cu.columns.filterNot(_ == "c_custkey").map(col)
      writeCopies("customer", ks.map { k =>
        cu.select(($"c_custkey" + lit(k * 10000000L)).as("c_custkey") +: rest: _*)
      })
    }
    if (!haveTable("lineitem")) {
      // l_orderkey offsets aligned with orders' o_orderkey so
      // order→line join semantics hold within each copy
      val li = Tables.lineitem(spark, base)
      val rest = li.columns.filterNot(_ == "l_orderkey").map(col)
      writeCopies("lineitem", ks.map { k =>
        li.select(($"l_orderkey" + lit(k * 100000000L)).as("l_orderkey") +: rest: _*)
      })
    }
    if (!haveTable("nation")) {
      // constant dimension: copied once, not blown up (category sets
      // are fixed at any corpus scale)
      Tables.nation(spark, base).write.mode("overwrite")
        .parquet(s"$ProbeDir/nation.parquet")
      println(s"[probe] copied nation (constant dim) at $ProbeDir")
    }
    if (!haveTable("part")) {
      // copied once: lineitem copies keep their l_partkey values, so
      // every copy joins the same part dim (per-copy join cardinality
      // preserved; brand/type category sets don't scale anyway)
      Tables.part(spark, base).write.mode("overwrite")
        .parquet(s"$ProbeDir/part.parquet")
      println(s"[probe] copied part (constant dim) at $ProbeDir")
    }
  }

  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else if (Skew) Seq("e8_interval_join", "e9_attribution", "st13_stream_enrich")
      else Seq("d6_ngram_jaccard", "d7_dup_clusters", "d9_keep_list")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // SPARK_GRAFT_CONF: e.g. spark.graft.lsh.maxBucket to demonstrate
    // the bucket cap live on a dup-dense corpus
    Tables.applyEnvConfs(spark)
    // Skew-mode session overrides, scoped to the PROBE-corpus work only
    // so the base-dir times (and therefore the printed base/big ratios)
    // are measured under the session's default confs:
    //  - the AQE skew-split thresholds are scaled to the probe corpus
    //    (the stock 256 MB gates are sized for production partitions;
    //    the hot partition here is ~47k view rows ≈ sub-MB COMPRESSED
    //    shuffle bytes, which is what the threshold compares against);
    //  - broadcast joins are disabled because at probe scale AQE
    //    broadcasts the (small) purchase side and no user_id shuffle
    //    exists at all. Production interval joins are fact-fact (both
    //    sides far above any broadcast threshold) and plan as SMJ;
    //    forcing that shape tests the hot key against the machinery
    //    that would face it.
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      // minPartitionSize's 1 MB default coalesces a probe-sized map
      // side into ONE task — and a skewed reduce partition fed by a
      // single mapper cannot be split at all (AQE splits at MAPPER
      // granularity; diagnosed r13 via OptimizeSkewedJoin debug logs:
      // isSkewed fired, createSkewPartitionSpecs returned None).
      // Production map outputs are far above 1 MB, so only the probe
      // needs the scaled floor.
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    def underSkewConfs[T](body: => T): T =
      if (!Skew) body
      else {
        val saved = skewConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
        skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body
        finally saved.foreach { case (k, o) =>
          o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      }
    build(spark, base)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val tBase = BenchCore.measure(spark, base, fn)
      val tBig = underSkewConfs(BenchCore.measure(spark, ProbeDir, fn))
      println(f"$name: base=$tBase%.2f s  ${Copies}x=$tBig%.2f s  ratio=${tBig / tBase}%.1fx")
      if (name == "d7_dup_clusters")
        println(s"$name: contraction rounds base=${dedup.Dedup.d7Rounds(spark, base)} " +
          s"${Copies}x=${dedup.Dedup.d7Rounds(spark, ProbeDir)}")
      if (Skew) underSkewConfs {
        // the action must run on THIS df's QueryExecution — a noop
        // write executes a separate cloned plan and leaves this one
        // isFinalPlan=false with no skew info
        def fired(): Boolean = {
          val df = fn(spark, ProbeDir)
          df.collect()
          df.queryExecution.executedPlan.toString.contains("skew=true")
        }
        val plain = fired()
        println(s"$name: AQE skew-split fired on the hot-user corpus: $plain")
        if (!plain) {
          // a downstream agg that reuses the join's partitioning (e.g.
          // e9's groupBy includes user_id) pins the distribution and
          // AQE won't split unless allowed to add the exchange back
          spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
          try println(s"$name: ... with forceOptimizeSkewedJoin=true: ${fired()}")
          finally spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
        }
      }
    }
    spark.stop()
  }
}
