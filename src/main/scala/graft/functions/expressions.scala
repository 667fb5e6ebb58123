package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions (SURVEY §2 engine components).
  *
  * Each generates a direct static call into the kernels in
  * `impls.scala`, so they participate in whole-stage codegen like
  * built-in functions — no UDF serialization, no interpreted
  * fallback in the hot path. SQL + Column access is provided by
  * [[GraftExtensions]] (SparkSessionExtensions) and [[GraftFunctions]].
  */

private object Check {
  def string(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$fn expects STRING, got ${t.sql}")
  }
  def floatArray(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$fn expects ARRAY<FLOAT>, got ${t.sql}")
  }
}

/** 64-bit SimHash of a document (whitespace tokens). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = Check.string(child, prettyName)
  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Winnowing fingerprint set: distinct selected k-gram rolling hashes
  * (Schleimer/Wilkerson/Aiken, SIGMOD 2003), ascending. */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, "winnow(text, k, w): k and w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"
  override def checkInputDataTypes(): TypeCheckResult = Check.string(child, prettyName)
  override protected def nullSafeEval(input: Any): Any =
    WinnowImpl.winnow(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** k-way MinHash signature over character shingles; component i is the
  * minimum over shingles of the 8-hex-char slice
  * `substr(md5((i div 4) || ':' || shingle), 1 + 8*(i mod 4), 8)` —
  * oracle-reproducible (md5 is identical in DuckDB) at ⌈k/4⌉ digests
  * per shingle. NULL for texts shorter than one shingle. */
case class MinHashSig(child: Expression, k: Int, shingleLen: Int) extends UnaryExpression {
  require(k > 0 && shingleLen > 0, "minhash_sig(text, k, len): k and len must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = Check.string(child, prettyName)
  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, shingleLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashImpl.signature($c, $k, $shingleLen);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Cosine similarity of two float vectors (double accumulation in
  * index order — bit-reproducible by the DuckDB oracle expression). */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): TypeCheckResult =
    Check.floatArray(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => Check.floatArray(right, prettyName)
      case f => f
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineImpl.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
