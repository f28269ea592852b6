package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, BinaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

import graft.functions.Varint

/** Native Catalyst expressions for posting decompression, so decode can
  * run inside whole-stage codegen instead of a Dataset lambda (the
  * "custom Expression beats Scala UDF" rung of the extension ladder).
  * Codegen emits a direct static call into the varint codec; the decoded
  * primitive arrays are wrapped via `UnsafeArrayData.fromPrimitiveArray`
  * — one flat copy, NO per-element boxing (GenericArrayData would box
  * every id/tf, exactly the garbage these expressions exist to avoid;
  * code-review r05). All three expressions declare `inputTypes`
  * (ImplicitCastInputTypes), so a wrong-typed SQL call fails at ANALYSIS
  * time — or casts implicitly (e.g. array<float> → array<double> for
  * graft_dot) — instead of reinterpreting bytes at runtime.
  */
final case class DecodeDocIds(bytes: Expression, n: Expression, base: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def first: Expression = bytes
  override def second: Expression = n
  override def third: Expression = base
  override def inputTypes = Seq(BinaryType, IntegerType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = bytes.nullable || n.nullable || base.nullable

  override protected def nullSafeEval(b: Any, nn: Any, bb: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(Varint.decodeDeltasLong(
      b.asInstanceOf[Array[Byte]], nn.asInstanceOf[Int], bb.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, nn, bb) =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.Varint.decodeDeltasLong($b, $nn, $bb))")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** Decode a varint int array (term frequencies) as array<int>. */
final case class DecodeTfs(bytes: Expression, n: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def left: Expression = bytes
  override def right: Expression = n
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(b: Any, nn: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(Varint.decodeInts(
      b.asInstanceOf[Array[Byte]], nn.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, nn) =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
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
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
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

/** Distinct word n-gram shingles of a token array as ONE row-level loop —
  * replaces the interpreted HOF chain
  * `array_distinct(filter(transform(toks, … slice+concat_ws …)))`, whose
  * per-element interpreted dispatch dominated the dedup family (r06
  * noop-isolated: ~9 s of sf0.1 q_lsh_jaccard in the shingle transform
  * alone). Identical output incl. first-occurrence order
  * (ShingleExprSpec). */
final case class WordShingles(tokens: Expression, n: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def left: Expression = tokens
  override def right: Expression = n
  override def inputTypes = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(t: Any, nn: Any): Any =
    graft.functions.Shingles.shingleArray(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], nn.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, nn) => s"graft.functions.Shingles.shingleArray($t, $nn)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** k MinHash values of a shingle array in ONE pass: element i equals
  * `array_min(transform(sh, x => md5(concat('seed<i>:', x))))` —
  * lowercase-hex md5, binary min, nulls skipped, null on empty — but
  * computed with a reused MessageDigest and no per-element interpreted
  * lambda or intermediate hash array (16 such HOF trees per row was the
  * second hot spot of the dedup family, r06). */
final case class MinHashes(shingles: Expression, k: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def left: Expression = shingles
  override def right: Expression = k
  override def inputTypes = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override protected def nullSafeEval(s: Any, kk: Any): Any =
    graft.functions.Shingles.minhashArray(
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, kk) => s"graft.functions.Shingles.minhashArray($s, $kk)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** SparkSessionExtensions hook — the spark-submit deployment path:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` makes the
  * decode functions available in every session (including SQL), without
  * any imperative registration call. Builders validate arity up front so
  * a malformed SQL call gets a named error, not an index exception. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  private def arity(name: String, n: Int)(exprs: Seq[Expression]): Seq[Expression] = {
    require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")
    exprs
  }
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_decode_docids"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DecodeDocIds].getName, "graft_decode_docids"),
      (exprs: Seq[Expression]) => {
        val a = arity("graft_decode_docids", 3)(exprs); DecodeDocIds(a(0), a(1), a(2))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_decode_tfs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DecodeTfs].getName, "graft_decode_tfs"),
      (exprs: Seq[Expression]) => {
        val a = arity("graft_decode_tfs", 2)(exprs); DecodeTfs(a(0), a(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ArrayDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        val a = arity("graft_dot", 2)(exprs); ArrayDot(a(0), a(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordShingles].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => {
        val a = arity("graft_shingles", 2)(exprs); WordShingles(a(0), a(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashes].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => {
        val a = arity("graft_minhash", 2)(exprs); MinHashes(a(0), a(1))
      }))
  }
}

object GraftFunctions {

  /** Register the decode functions in the session's own function
    * registry. Unconditional `createOrReplaceTempFunction` — three map
    * puts — instead of a JVM-global identity-hash cache: the old cache
    * keyed on `System.identityHashCode(spark)`, which can collide across
    * a long-lived JVM's sessions and is never evicted, silently skipping
    * registration for an unlucky new session (code-review r05). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_decode_docids", exprs => DecodeDocIds(exprs(0), exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_decode_tfs", exprs => DecodeTfs(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => ArrayDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashes(exprs(0), exprs(1)), "built-in")
  }
}
