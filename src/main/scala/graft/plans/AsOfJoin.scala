package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join operator (SURVEY §2 engine component).
  *
  * `asOf(left, right, ...)` matches every left row to the latest right
  * row with `rightTime <= leftTime` for the same key — the ClickHouse /
  * kdb ASOF JOIN — by composition instead of a per-row lookup:
  *
  *  1. union both inputs into one keyed stream, right rows tagged 0 and
  *     left rows tagged 1 so a right row at exactly `leftTime` sorts
  *     first (inclusive semantics);
  *  2. one window pass per key ordered by (time, tag, tieBreak...)
  *     carrying every right column forward with last(ignoreNulls);
  *  3. keep the left rows.
  *
  * Cost at any scale: ONE shuffle on the key + ONE sort — the same
  * shape as a window aggregate, with no range self-join blowup and no
  * driver-side index. Ties among right rows at the same timestamp are
  * resolved by `tieBreak` (greatest wins), so results are
  * deterministic; de-duplicate the right side per (key, time) first if
  * a unique winner is required.
  *
  * Returns all left columns plus the right's non-key columns (null
  * where no right row precedes the left row — left-outer semantics;
  * filter the match-key for inner).
  */
object AsOfJoin {
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(_ == rightKey)
    require(leftCols.intersect(rightPayload).isEmpty,
      s"column collision: ${leftCols.intersect(rightPayload).mkString(",")}")

    // The payload is carried as ONE struct, not per-column: a struct
    // row is non-null even when its fields are null, so
    // last(ignoreNulls) always carries the payload of the MATCHED
    // right row atomically. Per-column carries would skip a NULL field
    // back to an older right row and emit a mixed row that never
    // existed. (The struct also keeps all carries in one window over
    // one sort.)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val rightSide = right.select(
      (col(rightKey).as("__key") +: col(rightTime).cast("timestamp").as("__t")
        +: lit(0).as("__tag")
        +: struct(rightPayload.map(col): _*).as("__p")
        +: leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val leftSide = left.select(
      (col(leftKey).as("__key") +: col(leftTime).cast("timestamp").as("__t")
        +: lit(1).as("__tag")
        +: lit(null).cast(payloadType).as("__p")
        +: leftCols.map(col)): _*)

    val ord: Seq[Column] = col("__t") +: col("__tag") +:
      tieBreak.map(c => col("__p").getField(c))
    val w = Window.partitionBy(col("__key")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rightSide.unionByName(leftSide)
      .select(col("*") +: Seq(last(col("__p"), ignoreNulls = true).over(w).as("__m")): _*)
      .filter(col("__tag") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col("__m").getField(c).as(c))): _*)
  }
}
