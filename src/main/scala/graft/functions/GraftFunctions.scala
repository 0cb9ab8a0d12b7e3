package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
// (no CodegenFallback — these expressions ship real generated code)
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot per-row kernels.
  *
  * The portable semantics of these kernels are defined by the
  * higher-order-function folds in TextKit/VectorKit (strict left folds,
  * doubles, index order) — but HOF lambdas evaluate interpreted, one
  * function call per element. These expressions compute the IDENTICAL
  * result (bit-for-bit: same operation order, same IEEE ops) as a
  * whole-stage-codegen'd JIT loop, which is what a 64-element dot
  * product inside a 2M-pair join needs at 100 TB.
  *
  * Registered through SparkSessionExtensions (Engine.session), the
  * documented public extension point — no private Spark APIs.
  */
object GraftFunctions {

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
  }
}

/** Double dot product over two numeric arrays (float or double
  * elements), accumulated left-to-right: bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), 0.0D, (acc, v) -> acc + v)` for equal-length inputs.
  * Null/NaN contract: null array -> null; null elements unsupported
  * (embedding columns are dense).
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_vec_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("vdN")
    val s = ctx.freshName("vdS")
    val i = ctx.freshName("vdI")
    val getL = if (elemIsFloat(left)) (v: String) => s"(double) $v.getFloat($i)" else (v: String) => s"$v.getDouble($i)"
    val getR = if (elemIsFloat(right)) (v: String) => s"(double) $v.getFloat($i)" else (v: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getL(a)} * ${getR(b)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Karp–Rabin polynomial rolling hash mod 2^31-1, base 31, over UTF-16
  * code units: bit-identical to TextKit.polySpark's fold (and the DuckDB
  * oracle's) for BMP text — the corpus contract is ASCII/BMP.
  */
case class PolyHash(child: Expression)
  extends UnaryExpression {

  override def prettyName: String = "graft_poly_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_poly_hash expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i).toLong) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("phS")
    val h = ctx.freshName("phH")
    val i = ctx.freshName("phI")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + (long) $s.charAt($i)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
