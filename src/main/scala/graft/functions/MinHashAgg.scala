package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-way MinHash as a `TypedImperativeAggregate` over an exploded
  * shingle feed: `minhash_agg(shingle, k)` grouped by document yields
  * exactly the signature [[MinHashSig]] computes map-side from the
  * whole text (same sliced-md5 minima, component i = min of
  * `substr(md5((i div 4) || ':' || sh), 1 + 8*(i mod 4), 8)` — the
  * equivalence is pinned by FunctionsSpec).
  *
  * The scalar expression is the right shape when the document text is
  * one column (zero extra shuffle); this aggregate is the right shape
  * when shingles ARRIVE as rows — e.g. a streaming feed or an already-
  * exploded n-gram table — because its partial buffers (k unsigned
  * 32-bit minima) min-merge map-side, so the shuffle carries one
  * 8k-byte buffer per (group × partition), never the shingles
  * themselves.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0 && k <= 64, "minhash_agg(shingle, k): k must be in [1, 64]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(MinHashImpl.Empty)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashImpl.updateMins(buf, v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    MinHashImpl.mergeMins(a, b)

  override def eval(buf: Array[Long]): Any = MinHashImpl.toSignature(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { out.putLong(buf(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = in.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}
