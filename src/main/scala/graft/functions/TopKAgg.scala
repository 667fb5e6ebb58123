package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Approximate heavy hitters — ClickHouse's `topK` aggregate family —
  * as a Misra-Gries summary `TypedImperativeAggregate`:
  * `approx_topk(item, k, w)` returns the top-k items of a
  * capacity-`w` frequency summary as `array<struct<item, est>>`,
  * ordered by (estimate desc, item asc).
  *
  * Algorithm (Misra & Gries 1982; mergeability per Agarwal et al.
  * 2012, "Mergeable Summaries", PODS'12 §3 — ClickHouse implements
  * the SpaceSaving cousin, same guarantee class):
  *  - update: monitored item → count+1; unmonitored with spare
  *    capacity → insert at 1; unmonitored and full → decrement ALL
  *    counters, dropping zeros (the classic MG step).
  *  - merge: sum counters pointwise; if over capacity, subtract the
  *    (w+1)-th largest count from all and drop non-positives —
  *    Agarwal et al.'s merge, which preserves the error bound.
  *
  * Guarantee (spec-pinned in TopKAggSpec): with n total updates,
  * every estimate is an UNDERESTIMATE off by at most n/(w+1), and
  * every item with true count > n/(w+1) is present in the summary —
  * regardless of partitioning or merge order. The exact top-k ranking
  * inside that error band IS partition-order dependent (all sketches
  * are), which is why t13 is a rows-only driver entry gated by the
  * error-bound spec, the same pattern as s15's HLL.
  *
  * Scale shape: the state is one bounded w-entry map per (group ×
  * partition), merged map-side — the whole point of the sketch: a
  * corpus-scale `groupBy(item).count.orderBy.limit(k)` shuffles every
  * distinct item (t6's exact shape, fine when distinct cardinality is
  * modest), while this shuffles w entries per partition no matter how
  * many distinct items exist.
  */
case class ApproxTopKAgg(
    child: Expression,
    k: Int,
    w: Int,
    weight: Expression =
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
    weighted: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "approx_topk(item, k, w): k must be >= 1")
  require(w >= k, "approx_topk(item, k, w): capacity w must be >= k")

  override def children: Seq[Expression] = Seq(child, weight)

  // analysis-time contract: a wrong item/weight type should be a
  // readable error, not an executor ClassCastException mid-job
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case StringType =>
        weight.dataType match {
          case ByteType | ShortType | IntegerType | LongType => TypeCheckSuccess
          case t => TypeCheckFailure(
            s"$prettyName expects an integral weight, got ${t.sql}")
        }
      case t => TypeCheckFailure(s"$prettyName expects a STRING item, got ${t.sql}")
    }
  }
  override def nullable: Boolean = false
  // analysis errors and plan output must name the SQL function the
  // user actually called, not the shared implementation class
  override def prettyName: String =
    if (weighted) "approx_topk_weighted" else "approx_topk"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Weighted MG update (Berinde et al. 2010 generalization; with
    * weight ≡ 1 this is EXACTLY the classic step — every counter is
    * ≥ 1, so δ = min(min-counter, 1) = 1 and no reinsert happens —
    * which keeps the unweighted `approx_topk` behavior bit-for-bit).
    * On a full summary: subtract δ = min(min-counter, wᵢ) from every
    * counter (dropping zeros frees at least the min slot), then
    * insert the new item with its surviving weight wᵢ − δ.
    *
    * Runtime policy for degenerate weights, decided explicitly (the
    * summary's error bound is stated over non-negative weights only,
    * and a value-level check can't live in checkInputDataTypes):
    * null and non-positive weights are SKIPPED, like null items — a
    * single bad row must not abort a corpus-scale job with an
    * executor-side require failure. Spec-pinned in TopKAggSpec. */
  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    val wv = weight.eval(input)
    if (v != null && wv != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val wi = wv.asInstanceOf[Number].longValue()
      if (wi > 0) buf.get(s) match {
        case Some(c) => buf(s) = c + wi
        case None if buf.size < w => buf(s) = wi
        case None =>
          val d = math.min(buf.values.min, wi)
          buf.keys.toArray.foreach { key =>
            val c = buf(key) - d
            if (c <= 0) buf.remove(key) else buf(key) = c
          }
          if (wi - d > 0) buf(s) = wi - d
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a(s) = a.getOrElse(s, 0L) + c }
    if (a.size > w) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (w + 1)) // (w+1)-th largest
      a.keys.toArray.foreach { key =>
        val c = a(key) - m
        if (c <= 0) a.remove(key) else a(key) = c
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq
      .sortBy { case (s, c) => (-c, s) }
      .take(k)
      .map { case (s, c) => InternalRow(UTF8String.fromString(s), c) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toSeq.map { case (s, c) => (s.getBytes("UTF-8"), c) }
    val size = 4 + items.map(4 + 8 + _._1.length).sum
    val out = java.nio.ByteBuffer.allocate(size)
    out.putInt(items.length)
    items.foreach { case (bytes, c) =>
      out.putInt(bytes.length); out.put(bytes); out.putLong(c)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.getInt()
      val b = new Array[Byte](len)
      in.get(b)
      buf(new String(b, "UTF-8")) = in.getLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ApproxTopKAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}
