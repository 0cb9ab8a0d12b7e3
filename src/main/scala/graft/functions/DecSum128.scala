package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Exact order-independent decimal summation on a 128-bit integer
  * accumulator — the engine's replacement for `sum(CAST(x AS
  * DECIMAL(30,s)))` in [[graft.Num]].
  *
  * Spark's decimal Sum is exact but slow: the aggregation buffer holds a
  * Decimal whose add/checkOverflow path allocates BigDecimals per row
  * once the declared precision leaves the compact-long range (measured
  * ~3x a primitive-sum aggregation on the q1 shape). This aggregate
  * keeps the EXACT same math — every input is a scaled integer, the sum
  * is exact integer addition, one correctly-rounded conversion at the
  * end — but accumulates in two unsigned 64-bit words with carry
  * propagation, all inside whole-stage codegen with a fixed-width
  * (long, long, boolean) buffer row.
  *
  * Scale story: the two-word accumulator spans +-1.7e38, the full
  * DecimalType(38) domain, so partial sums can never overflow at any
  * row count that a decimal(38) sum could survive; partial/final merge
  * is the same 128-bit add, so the result is bit-identical under any
  * partitioning — the property that makes the sum reproducible across
  * cluster sizes.
  */
object DecSum128 {
  private val TwoPow64 = java.math.BigInteger.ONE.shiftLeft(64)

  /** (hi, lo) two's-complement 128-bit -> exact Decimal(38, scale). */
  def toDecimal(hi: Long, lo: Long, scale: Int): org.apache.spark.sql.types.Decimal = {
    val loU =
      if (lo >= 0) java.math.BigInteger.valueOf(lo)
      else java.math.BigInteger.valueOf(lo).add(TwoPow64)
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64).add(loU)
    Decimal(BigDecimal(new java.math.BigDecimal(bi, scale)), 38, scale)
  }
}

/** 64-bit add that ALWAYS wraps (Java semantics), regardless of the
  * session's ANSI setting — the carry chain of [[DecimalSum128]] relies
  * on modular arithmetic, which builtin Add would reject under ANSI.
  */
case class WrapAdd(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "graft_wrap_add"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (bigint, bigint)")
  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] + b.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$a + $b")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WrapAdd =
    copy(left = l, right = r)
}

/** Carry-out (0 or 1) of the UNSIGNED 64-bit addition a + b — the
  * branch-free formula `((a & b) | ((a | b) & ~(a + b))) >>> 63`.
  */
case class Carry64(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "graft_carry64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (bigint, bigint)")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    ((x & y) | ((x | y) & ~(x + y))) >>> 63
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"((($a & $b) | (($a | $b) & ~($a + $b))) >>> 63)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Carry64 =
    copy(left = l, right = r)
}

/** Exact `unscaledValue(CAST(x AS DECIMAL(38, scale)))` of a double, as
  * a long — the per-row input conversion for [[DecimalSum128]].
  *
  * Semantics contract: identical to Spark's double->decimal cast, which
  * rounds `BigDecimal.valueOf(x)` (the SHORTEST decimal representation
  * of the double, not its full binary expansion) HALF_UP at `scale`.
  * The fast path computes the exact scaled value with an FMA
  * two-product (hi + err == x * 10^scale exactly) and takes the
  * branch-free nearest integer; only rows whose scaled value lands
  * within the shortest-vs-exact ambiguity band of a .5 boundary
  * (~ulp-sized, a ~1e-5 fraction of rows) fall back to the BigDecimal
  * that defines the semantics. Non-finite input -> null (cast
  * semantics); |scaled| beyond the long range -> ArithmeticException
  * (a row that large belongs in a wider pre-scaling, loudly).
  */
case class UnscaledLong(child: Expression, scaleExpr: Expression)
  extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = scaleExpr
  override def prettyName: String = "graft_unscaled"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val scale: Int = scaleExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"scale must be an int literal, got $other")
  }
  // 10^scale is exactly representable as a double up to 10^22
  private lazy val pow10: Double = math.pow(10d, scale.toDouble)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && scaleExpr.foldable &&
      (scaleExpr.dataType == IntegerType || scaleExpr.dataType == LongType) &&
      { val s = scale; s >= 0 && s <= 18 })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (double, int-literal scale in [0,18])")

  /** Defining slow path: Spark cast semantics verbatim. */
  private def slow(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def convert(v: Double): Long = {
    val hi = v * pow10
    // stay clear of the long edge; the slow path throws if truly too big
    if (java.lang.Math.abs(hi) >= 4.5e18) return slow(v)
    val err = java.lang.Math.fma(v, pow10, -hi) // v*10^s - hi, exactly
    val n = java.lang.Math.rint(hi)
    val frac = (hi - n) + err // exact value - n, within ~1ulp(0.5)
    // ambiguity band: |value - n| this close to .5 means shortest-form
    // rounding (the semantics) may disagree with the exact expansion
    val tol = 2.5 * java.lang.Math.ulp(hi) + 1e-12
    if (java.lang.Math.abs(java.lang.Math.abs(frac) - 0.5) <= tol) return slow(v)
    val base = n.toLong
    if (frac > 0.5) base + 1
    else if (frac < -0.5) base - 1
    else base
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val d = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(d)) convert(d) else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unscaledLong", this, classOf[UnscaledLong].getName)
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |boolean ${ev.isNull} = ${c.isNull} || !java.lang.Double.isFinite(${c.value});
        |long ${ev.value} = ${ev.isNull} ? 0L : $ref.convert(${c.value});
      """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnscaledLong =
    copy(child = l, scaleExpr = r)
}

/** Final conversion of the (hi, lo) accumulator — once per GROUP, not
  * per row, so interpreted evaluation costs nothing measurable.
  */
case class Dec128ToDecimal(hi: Expression, lo: Expression, scaleExpr: Expression)
  extends Expression {
  override def prettyName: String = "graft_dec128"
  override def children: Seq[Expression] = Seq(hi, lo, scaleExpr)
  override def nullable: Boolean = false
  private lazy val scale: Int = scaleExpr.eval(null).asInstanceOf[Int]
  override def dataType: DataType = DecimalType(38, scale)
  override def eval(input: InternalRow): Any =
    DecSum128.toDecimal(
      hi.eval(input).asInstanceOf[Long],
      lo.eval(input).asInstanceOf[Long],
      scale)
  /** Called from generated code. */
  def make(h: Long, l: Long): Decimal = DecSum128.toDecimal(h, l, scale)
  // a real doGenCode, not CodegenFallback: fallback's template needs
  // ctx.INPUT_ROW, which is null in a global-aggregate result projection
  // (buffer values arrive as currentVars) — it would NPE at codegen time
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dec128", this, classOf[Dec128ToDecimal].getName)
    val h = hi.genCode(ctx)
    val l = lo.genCode(ctx)
    val resultCode =
      code"""
        |${h.code}
        |${l.code}
        |org.apache.spark.sql.types.Decimal ${ev.value} = $ref.make(${h.value}, ${l.value});
      """.stripMargin
    ev.copy(code = resultCode, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Dec128ToDecimal =
    copy(hi = c(0), lo = c(1), scaleExpr = c(2))
}

/** SUM of pre-scaled long inputs on a 128-bit two's-complement
  * accumulator; result DecimalType(38, scale). Null inputs are skipped;
  * an all-null/empty group yields null (builtin Sum semantics).
  */
case class DecimalSum128(child: Expression, scaleExpr: Expression)
  extends DeclarativeAggregate {

  override def prettyName: String = "graft_dsum128"
  override def children: Seq[Expression] = Seq(child, scaleExpr)
  override def nullable: Boolean = true
  private lazy val scale: Int = scaleExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"scale must be an int literal, got $other")
  }
  override def dataType: DataType = DecimalType(38, scale)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && scaleExpr.foldable &&
      (scaleExpr.dataType == IntegerType || scaleExpr.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects (bigint, int-literal scale)")

  private lazy val hi = AttributeReference("ds128_hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("ds128_lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("ds128_seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    // null input adds 0 (and leaves `seen` unset) — same one-branch
    // shape builtin Sum uses, keeps the adds unconditional for codegen
    val x = Coalesce(Seq(child, Literal(0L)))
    val signHi = ShiftRight(x, Literal(63)) // sign-extend x to 128 bits
    Seq(
      WrapAdd(WrapAdd(hi, signHi), Carry64(lo, x)),
      WrapAdd(lo, x),
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    WrapAdd(WrapAdd(hi.left, hi.right), Carry64(lo.left, lo.right)),
    WrapAdd(lo.left, lo.right),
    Or(seen.left, seen.right))

  override lazy val evaluateExpression: Expression =
    If(seen, Dec128ToDecimal(hi, lo, Literal(scale)), Literal(null, dataType))

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DecimalSum128 =
    copy(child = c(0), scaleExpr = c(1))
}
