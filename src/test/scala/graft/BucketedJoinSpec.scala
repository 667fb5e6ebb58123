package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5's co-location claim, demonstrated: writing both join
  * sides bucketed by the join key lets the sort-merge join run with
  * ZERO exchanges — the layout-level shuffle elimination that turns a
  * recurring fact-fact join from a network operation into a local one
  * at 100 TB (the Spark analog of the reference's MergeTree
  * ORDER BY (inverter, time) clustering). */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed co-located fact-fact join plans with zero exchanges") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_buckets").toString
    val l = Tables.lineitem(s, SfDir).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(s, SfDir).select($"o_orderkey", $"o_totalprice")
    l.write.format("parquet").option("path", s"$dir/l")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("l_bucketed")
    o.write.format("parquet").option("path", s"$dir/o")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("l_bucketed")
        .join(s.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed-by-key sides must join without any shuffle:\n$plan")
      // same rows as the plain (shuffling) join over the raw parquet
      val expected = l.join(o, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS l_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
