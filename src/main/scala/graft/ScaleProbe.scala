package graft

import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling probe for the document-family queries
  * (PLANS.md "Measured scaling probe"). Builds an 8× content-distinct
  * documents corpus in /tmp — 8 copies of the base corpus, each with
  * its vowels rotated by the copy index so copies don't trivially
  * collide in LSH buckets (each copy preserves its internal near-dup
  * structure; cross-copy texts differ) — then times the named queries
  * on both corpora with the [[BenchCore]] methodology and prints the
  * ratio. Linear-at-8× is the evidence the 100 TB claims rest on;
  * anything super-linear is a red flag to chase in the plan.
  *
  * `runMain graft.ScaleProbe [name...]` (defaults to d6/d7/d9 — the
  * r9 additions; d3/t8/t1/d2/d1 were measured in r7).
  */
object ScaleProbe {
  val Copies = 8
  val ProbeDir = "/tmp/graft_scaleprobe8x"

  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("d6_ngram_jaccard", "d7_dup_clusters", "d9_keep_list")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    if (!new java.io.File(s"$ProbeDir/documents.parquet").exists()) {
      val docs = Tables.documents(spark, base)
      val vows = "aeiou"
      (0 until Copies)
        .map { k =>
          val rot = vows.drop(k % 5) + vows.take(k % 5)
          docs.select(
            ($"doc_id" + lit(k * 10000000L)).as("doc_id"),
            translate($"text", vows, rot).as("text"),
            $"lang", $"source", $"n_chars")
        }
        .reduce(_ unionAll _)
        .repartition(Copies)
        .write.mode("overwrite").parquet(s"$ProbeDir/documents.parquet")
      println(s"[probe] built ${Copies}x corpus at $ProbeDir")
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val tBase = BenchCore.measure(spark, base, fn)
      val tBig = BenchCore.measure(spark, ProbeDir, fn)
      println(f"$name: base=$tBase%.2f s  ${Copies}x=$tBig%.2f s  ratio=${tBig / tBase}%.1fx")
    }
    spark.stop()
  }
}
