package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The builtin route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * a higher-order function, which Spark evaluates INTERPRETED
  * (CodegenFallback): per element it allocates lambda-variable holders
  * and boxes every double. At millions of candidate pairs × 64-dim
  * vectors that is the dominant cost of ANN scoring. These expressions
  * compile to a tight primitive loop inside whole-stage codegen —
  * no allocation, no boxing — and keep bit-identical results (same
  * ascending-index fold order, so external oracles still match).
  *
  * Null semantics mirror the zip_with fold they replace: a null array
  * → null; mismatched lengths or any null element → null (zip_with
  * pads with nulls, and null poisons the arithmetic fold).
  */
abstract class VectorFoldExpression extends BinaryExpression
    with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source for one fold step: updates accumulator `s` from
    * `x`/`y` (the two double elements at index `i`). */
  protected def stepCode(s: String, x: String, y: String): String

  /** Scala fold step (interpreted fallback mirror of [[stepCode]]). */
  protected def step(s: Double, x: Double, y: Double): Double

  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s = step(s, a.getDouble(i), b.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${stepCode(s, s"$a.getDouble($i)", s"$b.getDouble($i)")}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — codegen'd dot product over two array<double> columns. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"
  override protected def stepCode(s: String, x: String, y: String): String =
    s"$s += $x * $y;"
  override protected def step(s: Double, x: Double, y: Double): Double =
    s + x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — codegen'd squared L2 distance over two array<double>
  * columns (coarse-quantizer assignment metric for IVF). */
case class ArrayL2SqDistance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "graft_l2sq"
  override protected def stepCode(s: String, x: String, y: String): String =
    s"{ double _d = $x - $y; $s += _d * _d; }"
  override protected def step(s: Double, x: Double, y: Double): Double = {
    val d = x - y; s + d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayL2SqDistance =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points (work on any SparkSession — no function
  * registry needed). */
object vector {
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arrayL2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayL2SqDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
