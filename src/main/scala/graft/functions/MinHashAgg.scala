package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-way MinHash as a `TypedImperativeAggregate` over an exploded
  * shingle feed: `minhash_agg(shingle, k)` grouped by document yields
  * exactly the signature [[MinHashSig]] computes map-side from the
  * whole text (same md5(i || ':' || shingle) hex minima — the
  * equivalence is pinned by FunctionsSpec).
  *
  * The scalar expression is the right shape when the document text is
  * one column (zero extra shuffle); this aggregate is the right shape
  * when shingles ARRIVE as rows — e.g. a streaming feed or an already-
  * exploded n-gram table — because its partial buffers (k × 16-byte
  * digests) min-merge map-side, so the shuffle carries one small
  * buffer per (group × partition), never the shingles themselves.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] {

  require(k > 0 && k <= 64, "minhash_agg(shingle, k): k must be in [1, 64]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](k)

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) MinHashImpl.updateMins(buf, v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] =
    MinHashImpl.mergeMins(a, b)

  override def eval(buf: Array[Array[Byte]]): Any = MinHashImpl.toSignature(buf)

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](k * 17)
    var i = 0
    while (i < k) {
      if (buf(i) != null) {
        out(i * 17) = 1
        System.arraycopy(buf(i), 0, out, i * 17 + 1, 16)
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) {
      if (bytes(i * 17) == 1) {
        val d = new Array[Byte](16)
        System.arraycopy(bytes, i * 17 + 1, d, 0, 16)
        buf(i) = d
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}
