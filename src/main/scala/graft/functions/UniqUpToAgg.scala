package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `uniqUpTo(N)(x)`: exact distinct count saturating at
  * N — returns the true count while it is ≤ N, and N+1 ("more than
  * N") beyond. The buffer is a hash set that simply STOPS GROWING at
  * N+1 elements, so per-group state is bounded by the question being
  * asked, not by the data's cardinality — the aggregate a dashboard
  * "≥ N distinct?" gate wants at 100 TB, where an exact distinct
  * would shuffle every value and a HyperLogLog (s15) answers a
  * different (approximate) question.
  *
  * Unlike sketch aggregates, saturation commutes with union — any
  * merge order yields the same saturated count — so the result is
  * deterministic and ORACLE-EXACT: `uniq_up_to(x, n)` ==
  * `LEAST(count(DISTINCT x), n+1)` (the e15 oracle grades exactly
  * this). Partial buffers min-merge map-side like every
  * TypedImperativeAggregate ([[MinHashAgg]] pattern); the shuffle
  * carries ≤ (N+1) longs per (group × partition).
  *
  * Child must be integral (the fleet/user-id use case); a production
  * build would overload on hashable types.
  */
case class UniqUpToAgg(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  require(n > 0 && n <= (1 << 20), "uniq_up_to(x, n): n must be in [1, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "uniq_up_to"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName expects an integral input, got ${t.sql}")
  }

  private val cap = n + 1

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long](8)

  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size < cap)
      buf.add(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = b.iterator()
    while (it.hasNext && a.size < cap) a.add(it.next())
    a
  }

  override def eval(buf: java.util.HashSet[Long]): Any = buf.size

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    out.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.putLong(it.next())
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val sz = in.getInt
    val buf = new java.util.HashSet[Long](math.max(8, sz * 2))
    var i = 0
    while (i < sz) { buf.add(in.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UniqUpToAgg =
    copy(child = newChildren.head)
}
