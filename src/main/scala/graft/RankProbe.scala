package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: A/B the GlobalRank operator against Spark's native
  * single-partition window on a synthetic corpus-global ranking.
  * `runMain graft.RankProbe [nRows]` (default 50M). Prints wall
  * seconds for rule-on vs rule-off and the speedup — the PLANS.md
  * "global ranking" probe rows come from here. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000000L
    val s = Tables.session(32)
    import s.implicits._
    val df = s.range(n).select($"id",
      pmod($"id" * 2654435761L, lit(1000000007L)).as("k"))
    val w = Window.orderBy($"k", $"id")
    def run(on: Boolean): Double = {
      s.conf.set(graft.plans.GlobalRankRewrite.ConfKey, on.toString)
      val t0 = System.nanoTime()
      // rank + ntile exercise both the offset stitch and the totals;
      // the aggregate keeps the result tiny without skipping any row
      val r = df.select(rank().over(w).as("r"), ntile(100).over(w).as("c"))
        .groupBy($"c").agg(max($"r").as("mr")).agg(sum($"mr")).head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(s"globalRank=$on n=$n sum=${r} ${f"$dt%.1f"}s")
      dt
    }
    // warm BOTH code paths (codegen/JIT), then take the min of three
    // INTERLEAVED samples per path — a 50M-row single-task sort leaves
    // enough GC/memory pressure behind to inflate whatever runs next,
    // so back-to-back ordering biases either direction
    run(on = true)
    run(on = false)
    val samples = (1 to 3).map(_ => (run(on = true), run(on = false)))
    val tOn = samples.map(_._1).min
    val tOff = samples.map(_._2).min
    println(f"n=$n operator=${tOn}%.1fs native=${tOff}%.1fs speedup=${tOff / tOn}%.1fx")
    s.stop()
  }
}
