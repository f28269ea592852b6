package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.functions.Varint

/** Native Catalyst expressions for posting decompression, so decode can
  * run inside whole-stage codegen instead of a Dataset lambda (the
  * "custom Expression beats Scala UDF" rung of the extension ladder).
  * Codegen emits a direct static call into the varint codec — no
  * boxing, no serializer round-trip, null handling via nullSafeCodeGen.
  */
final case class DecodeDocIds(bytes: Expression, n: Expression, base: Expression)
    extends TernaryExpression {
  override def first: Expression = bytes
  override def second: Expression = n
  override def third: Expression = base
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = bytes.nullable || n.nullable || base.nullable

  override protected def nullSafeEval(b: Any, nn: Any, bb: Any): Any =
    new GenericArrayData(Varint.decodeDeltasLong(
      b.asInstanceOf[Array[Byte]], nn.asInstanceOf[Int], bb.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, nn, bb) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Varint.decodeDeltasLong($b, $nn, $bb))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** Decode a varint int array (term frequencies) as array<int>. */
final case class DecodeTfs(bytes: Expression, n: Expression)
    extends BinaryExpression {
  override def left: Expression = bytes
  override def right: Expression = n
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(b: Any, nn: Any): Any =
    new GenericArrayData(Varint.decodeInts(
      b.asInstanceOf[Array[Byte]], nn.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, nn) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Varint.decodeInts($b, $nn))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Dot product of two array<double> columns as ONE codegen'd
  * multiply-accumulate loop — no intermediate zipped array, no lambda
  * closure per element (`zip_with`+`aggregate` allocates and walks a
  * fresh array per row; on an O(pairs) near-dup join that allocation is
  * the bottleneck). Left-fold order matches `aggregate(zip_with(...))`
  * bit-for-bit, so oracles are unaffected. */
final case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** SparkSessionExtensions hook — the spark-submit deployment path:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` makes the
  * decode functions available in every session (including SQL), without
  * any imperative registration call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_decode_docids"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DecodeDocIds].getName, "graft_decode_docids"),
      (exprs: Seq[Expression]) => DecodeDocIds(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_decode_tfs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DecodeTfs].getName, "graft_decode_tfs"),
      (exprs: Seq[Expression]) => DecodeTfs(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ArrayDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))))
  }
}

object GraftFunctions {
  @volatile private var registered = Set.empty[String]

  /** Register graft_decode_docids / graft_decode_tfs in the session's
    * function registry (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    val key = System.identityHashCode(spark).toString
    if (!registered.contains(key)) synchronized {
      if (!registered.contains(key)) {
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_decode_docids", exprs => DecodeDocIds(exprs(0), exprs(1), exprs(2)), "built-in")
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_decode_tfs", exprs => DecodeTfs(exprs(0), exprs(1)), "built-in")
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
        registered += key
      }
    }
  }
}
