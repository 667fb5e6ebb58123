package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GlobalRank operator (plans/GlobalRank.scala): bare rank-family
  * windows with an EMPTY partition clause — Spark's single-partition
  * scale killer — rewritten to the range-partitioned two-pass form.
  * Pinned here: bit-equality with the built-in window for all six
  * functions — row_number, rank, dense_rank, percent_rank, cume_dist,
  * ntile (the A/B lever is the rule's conf) — tie/null/NaN edges,
  * the plan shape (no SinglePartition exchange), and the bail-outs.
  */
class GlobalRankSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[A](on: Boolean)(body: => A): A =
    TestSpark.withConf(graft.plans.GlobalRankRewrite.ConfKey, on.toString)(body)

  private def allSix(df: DataFrame): DataFrame = {
    val w = Window.orderBy(col("k").desc, col("id"))
    df.select(col("id"), col("k"),
      row_number().over(w).as("rn"),
      rank().over(w).as("r"),
      dense_rank().over(w).as("dr"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      ntile(3).over(w).as("n3"),
      ntile(7).over(w).as("n7"))
  }

  test("GlobalRank: all six functions bit-equal to the built-in window on a total order") {
    val s = spark
    import s.implicits._
    // events-scale input, unique (value-desc, id) total order, spread
    // over several input partitions so range boundaries are real
    val base = Tables.events(s, SfDir)
      .select($"event_id".as("id"), $"value".as("k"))
      .repartition(7)
    val got = withRule(on = true)(allSix(base).orderBy($"id").collect().toSeq)
    val ref = withRule(on = false)(allSix(base).orderBy($"id").collect().toSeq)
    assert(got == ref)
  }

  test("GlobalRank: ties spanning would-be boundaries, nulls, NaN and -0.0 keys") {
    val s = spark
    import s.implicits._
    // 3 distinct keys x many rows forces every range partition to be
    // a tie run; plus null, NaN and +/-0.0 keys (UnsafeProjection
    // normalization must agree with the sort's equality)
    val rows = (1 to 500).map(i => (i.toLong, (i % 3).toDouble)) ++
      Seq((501L, Double.NaN), (502L, Double.NaN),
        (503L, 0.0), (504L, -0.0)) // -0.0 must tie with 0.0
    val withNull = rows.toDF("id", "k")
      .union(Seq((505L, null.asInstanceOf[java.lang.Double])).toDF("id", "k"))
      .repartition(5)
    // order by k ONLY -> real tie groups. rank/dense_rank/percent_rank
    // are tie-deterministic per row; row_number/ntile are not (tie
    // order is arbitrary in BOTH engines), so they are pinned
    // separately below on a total order over the same data.
    def tieFns(df: DataFrame): DataFrame = {
      val w = Window.orderBy(col("k"))
      df.select(col("id"),
        rank().over(w).as("r"),
        dense_rank().over(w).as("dr"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }
    val gotTies = withRule(on = true)(tieFns(withNull).orderBy($"id").collect().toSeq)
    val refTies = withRule(on = false)(tieFns(withNull).orderBy($"id").collect().toSeq)
    assert(gotTies == refTies)
    // total order (k desc, id) on the same tie-heavy data: all six
    // functions bit-equal, boundary keys duplicated across the range
    val got = withRule(on = true)(allSix(withNull).orderBy($"id").collect().toSeq)
    val ref = withRule(on = false)(allSix(withNull).orderBy($"id").collect().toSeq)
    assert(got == ref)
    // single-row and empty inputs: percent_rank's N==1 branch, empty pass-1
    val one = Seq((1L, 2.0)).toDF("id", "k")
    val gotOne = withRule(on = true)(allSix(one).collect().toSeq)
    assert(gotOne == withRule(on = false)(allSix(one).collect().toSeq))
    assert(gotOne.head.getDouble(5) == 0.0) // pr column: N==1 -> 0.0
    val empty = Seq.empty[(Long, Double)].toDF("id", "k")
    assert(withRule(on = true)(allSix(empty).collect()).isEmpty)
  }

  test("GlobalRank plan shape: GlobalRankExec + range exchange, no SinglePartition funnel") {
    val s = spark
    import s.implicits._
    val base = Tables.events(s, SfDir).select($"event_id".as("id"), $"value".as("k"))
    withRule(on = true) {
      val df = allSix(base)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GlobalRank"), plan.take(2000))
      assert(!plan.contains("SinglePartition"),
        "global ranking must not funnel through one partition:\n" + plan.take(2000))
      assert(plan.contains("rangepartitioning"), plan.take(2000))
    }
    withRule(on = false) {
      val df = allSix(base)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("GlobalRank") && plan.contains("SinglePartition"),
        "conf off must keep the native single-partition window:\n" + plan.take(2000))
    }
  }

  test("q42 runs on the GlobalRank operator: both windows rewritten, no single-partition funnel") {
    val s = spark
    val df = graft.relational.Relational.q42SpendRank(s, SfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GlobalRank"), plan.take(2000))
    assert(!plan.contains("SinglePartition"),
      "the graded global leaderboard must never funnel to one partition:\n" + plan.take(2000))
  }

  test("GlobalRank: string keys, explicit null orderings, ntile(1)/ntile(>n) edges") {
    val s = spark
    import s.implicits._
    // string keys with duplicates and nulls, across several input splits
    val words = (1 to 300).map(i => (i.toLong, Seq("merge", "scan", "sort", "join")(i % 4))) ++
      Seq((301L, null.asInstanceOf[String]), (302L, null.asInstanceOf[String]))
    val base = words.toDF("id", "w").repartition(5)
    def ranked(o: org.apache.spark.sql.Column) = {
      val w = Window.orderBy(o, col("id"))
      base.select(col("id"),
        rank().over(w).as("r"),
        dense_rank().over(w).as("dr"),
        cume_dist().over(w).as("cd"),
        ntile(1).over(w).as("n1"),
        ntile(1000).over(w).as("nBig")) // buckets > rows: bucket == row_number
    }
    for (o <- Seq($"w".asc_nulls_last, $"w".desc_nulls_first, $"w".asc, $"w".desc)) {
      val got = withRule(on = true)(ranked(o).orderBy($"id").collect().toSeq)
      val ref = withRule(on = false)(ranked(o).orderBy($"id").collect().toSeq)
      assert(got == ref, s"mismatch under order $o")
    }
    // ntile(1) is constant 1; ntile(>n) degenerates to row_number
    val one = withRule(on = true)(ranked($"w".asc).collect().toSeq)
    assert(one.forall(_.getInt(4) == 1))
    assert(one.map(_.getInt(5)).sorted == (1 to 302).toSeq)
    // degraded range-boundary SAMPLING (2 samples/partition -> badly
    // estimated, imbalanced boundaries): partition QUALITY may suffer
    // but the offset stitch must stay exact
    TestSpark.withConf("spark.sql.execution.rangeExchange.sampleSizePerPartition", "2") {
      val got = withRule(on = true)(ranked($"w".asc).orderBy($"id").collect().toSeq)
      val ref = withRule(on = false)(ranked($"w".asc).orderBy($"id").collect().toSeq)
      assert(got == ref, "bad range sampling must never change results")
    }
  }

  test("GlobalRank bail-outs: aggregate windows, offset functions and partitioned ranks stay native") {
    val s = spark
    import s.implicits._
    val base = Tables.events(s, SfDir).select($"event_id".as("id"), $"value".as("k"),
      ($"event_id" % 10).as("g"))
    withRule(on = true) {
      // offset function (lead) over a global order: not a rank
      // function -> the whole node stays native
      val ld = base.select(lead($"k", 1).over(Window.orderBy($"k", $"id")).as("nk"))
      ld.collect()
      assert(!ld.queryExecution.executedPlan.toString.contains("GlobalRank"))
      // running aggregate over a global order -> native window
      val agg = base.select(sum($"k").over(
        Window.orderBy($"k", $"id").rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("s"))
      agg.collect()
      assert(!agg.queryExecution.executedPlan.toString.contains("GlobalRank"))
      // partitioned rank -> native window (no global funnel to fix)
      val part = base.select(rank().over(Window.partitionBy($"g").orderBy($"k", $"id")).as("r"))
      part.collect()
      assert(!part.queryExecution.executedPlan.toString.contains("GlobalRank"))
      // mixed node rank + cume_dist: both supported (cume via the
      // tie-group-buffered path) -> ONE GlobalRank handles the node
      val mixed = base.select(
        rank().over(Window.orderBy($"k", $"id")).as("r"),
        cume_dist().over(Window.orderBy($"k", $"id")).as("cd"))
      mixed.collect()
      assert(mixed.queryExecution.executedPlan.toString.contains("GlobalRank"))
      // nondeterministic child: the two-pass exec could recompute a
      // rand() column differently between passes -> native
      val nd = base.withColumn("rk", rand(7))
        .select(rank().over(Window.orderBy($"rk", $"id")).as("r"))
      nd.collect()
      assert(!nd.queryExecution.executedPlan.toString.contains("GlobalRank"))
      // nondeterministic ORDER SPEC (the shuffle idiom
      // row_number() OVER (ORDER BY rand())): keyTools would
      // re-evaluate rand() independently in pass 1, pass 2 and the
      // range partitioner -> native
      val ndOrder = base.select(row_number().over(Window.orderBy(rand(7))).as("r"))
      ndOrder.collect()
      assert(!ndOrder.queryExecution.executedPlan.toString.contains("GlobalRank"))
    }
  }
}
