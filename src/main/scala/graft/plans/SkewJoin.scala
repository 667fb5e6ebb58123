package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * AQE's skew-join optimization (on by default here) splits oversized
  * sort-merge partitions at runtime and is the first line of defense.
  * Explicit salting still matters when (a) the skewed side feeds a
  * window/aggregate that AQE cannot split because a single key must
  * land in a single partition, or (b) the build side is replicated
  * into a shuffled-hash join where one hot key dominates a task.
  *
  * `salted` spreads each left key over `n` salt buckets (deterministic:
  * hash of a caller-chosen distinct column) and replicates each right
  * row `n` times, so one hot key's probe work lands on `n` tasks
  * instead of one. Replication multiplies the right side — use a
  * de-dupped / pre-filtered right input and keep `n` small.
  */
object SkewJoin {
  def salted(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      n: Int, leftDistinct: String): DataFrame = {
    require(n > 1, "salt factor must be > 1")
    val l = left.withColumn("__salt", pmod(hash(col(leftDistinct)), lit(n)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
