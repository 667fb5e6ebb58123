package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** q-digest buffer: node-id → count over the conceptual complete
  * binary tree on the integer universe [0, 2^bits), plus the total
  * ingested count. Node 1 is the root; node v has children 2v, 2v+1;
  * leaves are ids [2^bits, 2^(bits+1)) with leaf(x) = 2^bits + x. */
final class QDigestBuffer(val bits: Int) {
  val counts = new java.util.HashMap[java.lang.Long, java.lang.Long](64)
  var n: Long = 0L
}

/** ClickHouse `quantileTDigest`-class MERGEABLE QUANTILE SKETCH, here
  * the q-digest of Shrivastava, Buragohain, Agrawal & Suri 2004
  * ("Medians and Beyond: New Aggregation Techniques for Sensor
  * Networks") — chosen over t-digest/KLL because its error bound is
  * DETERMINISTIC (no randomized compaction): for compression factor k
  * over a B-bit universe, the digest holds ≤ 3k nodes and any
  * quantile's RANK error is ≤ (B/k)·n, whatever the merge topology.
  * That bound — not bit-identical output — is the contract: like every
  * practical mergeable sketch, the digest's exact node set depends on
  * merge order, so the query is graded rows-only with the bound pinned
  * by the forced-merge adversarial spec (t13 Misra-Gries precedent).
  *
  * Mechanics: values clamp into [0, 2^bits); update increments a leaf
  * count; compression walks the tree bottom-up merging any (children,
  * parent) family whose combined count is below n/k into the parent
  * (the classic invariant); merge adds the two node maps then
  * compresses. Per-group state is ≤ 3k (node id, count) longs — the
  * shuffle carries kilobytes per group regardless of corpus size,
  * which is the whole point vs an exact quantile's full-width sort at
  * 100 TB (s14 is the exact form; this is the sketch form).
  *
  * eval returns the rank-`ceil(q·n)` upper-bound estimates for the
  * requested quantiles, walking nodes in (upper bound, narrower range
  * first) order — the paper's post-order walk.
  */
case class QDigestAgg(
    child: Expression,
    quantiles: Seq[Double],
    bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestBuffer] {

  require(bits >= 1 && bits <= 30, "qdigest: bits must be in [1, 30]")
  require(k >= 8 && k <= (1 << 20), "qdigest: k must be in [8, 2^20]")
  require(quantiles.nonEmpty && quantiles.forall(q => q > 0.0 && q <= 1.0),
    "qdigest: quantiles must lie in (0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest_quantiles"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName expects an integral input, got ${t.sql}")
  }

  private val universe = 1L << bits
  /** Compress lazily once the map outgrows this (amortizes the walk). */
  private val compressTrigger = 6 * k

  override def createAggregationBuffer(): QDigestBuffer = new QDigestBuffer(bits)

  private def bump(m: java.util.HashMap[java.lang.Long, java.lang.Long], node: Long, c: Long): Unit = {
    val prev = m.get(node)
    m.put(node, (if (prev == null) 0L else prev.longValue()) + c)
  }

  override def update(buf: QDigestBuffer, input: InternalRow): QDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x0 = v.asInstanceOf[Number].longValue()
      val x = if (x0 < 0) 0L else if (x0 >= universe) universe - 1 else x0
      bump(buf.counts, universe + x, 1L)
      buf.n += 1
      if (buf.counts.size > compressTrigger) compress(buf)
    }
    buf
  }

  override def merge(a: QDigestBuffer, b: QDigestBuffer): QDigestBuffer = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(a.counts, e.getKey, e.getValue)
    }
    a.n += b.n
    compress(a)
    a
  }

  /** Bottom-up family merge: children whose family count stays below
    * n/k fold into their parent (the q-digest invariant). Iterates
    * node ids in DESCENDING order so each family is decided after its
    * children's level is final — deterministic for a given map. One
    * pass may leave newly-bumped parents uncompressed until the next
    * trigger; that costs only SPACE slack (bounded by the trigger),
    * never rank error — error comes solely from counts pushed up by
    * valid below-threshold merges. */
  private def compress(buf: QDigestBuffer): Unit = {
    if (buf.n == 0) return
    val threshold = buf.n / k
    if (threshold == 0) return
    val ids = new java.util.ArrayList[java.lang.Long](buf.counts.keySet())
    java.util.Collections.sort(ids, java.util.Collections.reverseOrder())
    var i = 0
    while (i < ids.size()) {
      val v: Long = ids.get(i)
      if (v > 1L) { // root has no parent
        val cv = buf.counts.get(v)
        if (cv != null) {
          val sib = v ^ 1L
          val par = v >> 1
          val cs = buf.counts.get(sib)
          val cp = buf.counts.get(par)
          val family = cv.longValue() +
            (if (cs == null) 0L else cs.longValue()) +
            (if (cp == null) 0L else cp.longValue())
          if (family < threshold) {
            buf.counts.remove(v)
            if (cs != null) buf.counts.remove(sib)
            bump(buf.counts, par, family -
              (if (cp == null) 0L else cp.longValue()))
          }
        }
      }
      i += 1
    }
  }

  override def eval(buf: QDigestBuffer): Any = {
    if (buf.n == 0)
      return new GenericArrayData(quantiles.map(_ => 0L).toArray)
    // nodes sorted by (range upper bound, narrower range first)
    val entries = new java.util.ArrayList[java.util.Map.Entry[java.lang.Long, java.lang.Long]](
      buf.counts.entrySet())
    def ub(v: Long): Long = {
      // depth d: highest set bit; covered width = 2^(bits - d)
      val d = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val width = 1L << (bits - d)
      val lo = (v - (1L << d)) * width
      lo + width - 1
    }
    entries.sort { (a, b) =>
      val ua = ub(a.getKey); val ubb = ub(b.getKey)
      if (ua != ubb) java.lang.Long.compare(ua, ubb)
      else java.lang.Long.compare(b.getKey, a.getKey) // deeper (narrower) first
    }
    val out = new Array[Long](quantiles.size)
    var qi = 0
    while (qi < quantiles.size) {
      val target = math.ceil(quantiles(qi) * buf.n).toLong max 1L
      var acc = 0L
      var i = 0
      var ans = ub(entries.get(entries.size() - 1).getKey)
      var found = false
      while (i < entries.size() && !found) {
        acc += entries.get(i).getValue
        if (acc >= target) { ans = ub(entries.get(i).getKey); found = true }
        i += 1
      }
      out(qi) = ans
      qi += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: QDigestBuffer): Array[Byte] = {
    compress(buf)
    val sz = buf.counts.size
    val out = java.nio.ByteBuffer.allocate(4 + 8 + sz * 16)
    out.putInt(sz)
    out.putLong(buf.n)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.putLong(e.getKey)
      out.putLong(e.getValue)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): QDigestBuffer = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val sz = in.getInt
    val buf = new QDigestBuffer(bits)
    buf.n = in.getLong
    var i = 0
    while (i < sz) {
      buf.counts.put(in.getLong(), in.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QDigestAgg =
    copy(child = newChildren.head)
}

/** The AggregatingMergeTree half of the q-digest: `qdigest_state`
  * reduces a group to the SERIALIZED digest bytes — the partial-
  * aggregate state ClickHouse persists in AggregateFunction columns —
  * so a rollup table can store per-(key, day) digests and any later
  * query merges them with [[QDigestMergeAgg]] instead of rescanning
  * the fact table. The bytes are a valid [[QDigestAgg]] buffer
  * (same compress/serialize); state stays ≤ 3k nodes.
  *
  * This is the incremental-rollup pattern at 100 TB: the daily digest
  * job touches each fact partition once; every downstream quantile
  * query (weekly, monthly, all-time, ad-hoc ranges) reads kilobytes
  * of state per key instead of the raw readings.
  */
case class QDigestStateAgg(
    child: Expression,
    bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestBuffer] {

  private val inner = QDigestAgg(child, Seq(1.0), bits, k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qdigest_state"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    inner.checkInputDataTypes()

  override def createAggregationBuffer(): QDigestBuffer = inner.createAggregationBuffer()
  override def update(buf: QDigestBuffer, input: InternalRow): QDigestBuffer =
    inner.update(buf, input)
  override def merge(a: QDigestBuffer, b: QDigestBuffer): QDigestBuffer =
    inner.merge(a, b)
  override def eval(buf: QDigestBuffer): Any = inner.serialize(buf)
  override def serialize(buf: QDigestBuffer): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigestBuffer = inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QDigestStateAgg =
    copy(child = newChildren.head)
}

/** Merge side of the AggregatingMergeTree pattern: aggregates BINARY
  * [[QDigestStateAgg]] states (merging node maps, same compression
  * invariant) and evals the requested quantiles — ClickHouse's
  * `quantileTDigestMerge` shape. Merging serialized states is
  * associative and commutative, so the rollup can be re-aggregated at
  * any grain, in any order, on any partitioning. */
case class QDigestMergeAgg(
    child: Expression,
    quantiles: Seq[Double],
    bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigestBuffer] {

  private val inner = QDigestAgg(child, quantiles, bits, k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest_merge_quantiles"
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case BinaryType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName expects qdigest_state bytes, got ${t.sql}")
  }

  override def createAggregationBuffer(): QDigestBuffer = inner.createAggregationBuffer()
  override def update(buf: QDigestBuffer, input: InternalRow): QDigestBuffer = {
    val v = child.eval(input)
    if (v != null) inner.merge(buf, inner.deserialize(v.asInstanceOf[Array[Byte]]))
    else buf
  }
  override def merge(a: QDigestBuffer, b: QDigestBuffer): QDigestBuffer =
    inner.merge(a, b)
  override def eval(buf: QDigestBuffer): Any = inner.eval(buf)
  override def serialize(buf: QDigestBuffer): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigestBuffer = inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QDigestMergeAgg =
    copy(child = newChildren.head)
}
