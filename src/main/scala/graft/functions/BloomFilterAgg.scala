package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Static Bloom-filter kernel shared by the build aggregate and the
  * probe expression (same double-hashing scheme on both sides, so a
  * filter built by [[BloomFilterAgg]] is probed bit-exactly by
  * [[BloomContains]] — including after the bytes crossed an exchange
  * or a broadcast).
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (two splitmix64
  * finalizer mixes of the input long; probe i uses h1 + i·h2), the
  * standard construction with the standard (1 − e^(−kn/m))^k false-
  * positive rate. Wire format: [int32 numBits][int32 k][words…] —
  * self-describing, so the probe side needs no out-of-band config.
  */
object BloomImpl {
  /** splitmix64 finalizer (Steele et al., public domain constants). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], numBits: Int, k: Int, v: Long): Unit = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x6a09e667f3bcc909L) | 1L // odd → full-period probe
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def serialize(words: Array[Long], numBits: Int, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits).putInt(k)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  /** Membership probe against serialized filter bytes. */
  def contains(bytes: Array[Byte], v: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt
    val k = bb.getInt
    val h1 = mix(v)
    val h2 = mix(v ^ 0x6a09e667f3bcc909L) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      val w = bb.getLong(8 + (bit >>> 6) * 8)
      if ((w & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(x, numBits, k)` — build a Bloom filter over a LONG
  * column as one BINARY value (the Dolma-pipeline decontamination /
  * dedup primitive: reduce a reference set of fingerprints to a
  * fixed-size broadcastable summary instead of shuffling it into a
  * join).
  *
  * Mergeable-summary aggregate in the [[MinHashAgg]] family: partial
  * buffers are bitsets OR-merged map-side, so build cost is one
  * combine-enabled pass and the shuffle carries numBits/8 bytes per
  * (group × partition) regardless of input cardinality. Bit-OR is
  * commutative/associative/idempotent, so the result is byte-
  * identical under ANY partitioning — deterministic, unlike count
  * sketches (spec-pinned).
  *
  * Scale sizing: FPR ≈ (1 − e^(−kn/m))^k — budget ~14 bits/element
  * for 1e-3 at k=3; at trillions of elements a production build
  * shards the filter by fingerprint prefix (a partitioned Bloom) and
  * probes route to the shard — the per-shard machinery is exactly
  * this aggregate.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits <= (1 << 28) && numBits % 64 == 0,
    "bloom_agg(x, m, k): m must be a multiple of 64 in [64, 2^28]")
  require(numHashes >= 1 && numHashes <= 16,
    "bloom_agg(x, m, k): k must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral input, got ${t.sql}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.set(buf, numBits, numHashes, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomImpl.serialize(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomImpl.serialize(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt; bb.getInt
    val words = new Array[Long](numBits / 64)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `bloom_contains(filter, x)` — probe a serialized Bloom filter.
  * Codegen'd static call ([[SimHash64]] pattern): the probe runs
  * map-side inside whole-stage codegen against the broadcast filter
  * bytes — never a false NEGATIVE; false positives at the sized FPR. */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case BinaryType => right.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects an integral probe, got ${t.sql}")
    }
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY filter, got ${t.sql}")
  }
  override protected def nullSafeEval(f: Any, v: Any): Any =
    BloomImpl.contains(f.asInstanceOf[Array[Byte]], v.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, v) => s"graft.functions.BloomImpl.contains($f, (long) $v)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
