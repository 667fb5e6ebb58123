package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (GraftExtensions installed
  * by Tables.session). sf0.001 keeps specs fast; oracle-level
  * correctness is gated separately by Verify + DuckDB. */
object TestSpark {
  lazy val spark: SparkSession = Tables.session(4)
  val SfDir = "/root/testdata/sf0.001"
}
