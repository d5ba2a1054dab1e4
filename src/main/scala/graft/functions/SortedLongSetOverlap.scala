package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** |A∩B| of two SORTED-DISTINCT long-array columns as a codegen'd
  * two-pointer merge — [[SortedLongSetJaccard]]'s sibling returning
  * the raw overlap COUNT, the numerator asymmetric measures divide
  * differently (containment |A∩B|/|A|, overlap coefficient
  * |A∩B|/min(|A|,|B|)) — a Jaccard-only kernel can't serve them
  * without a float round-trip.
  *
  * Inputs MUST be sorted ascending and duplicate-free; outputs are
  * arbitrary otherwise. Empty inputs yield 0.
  */
case class SortedLongSetOverlap(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "graft_sorted_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val inter = ctx.freshName("inter")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongSetOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedLongSetOverlap {
  def sortedOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongSetOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
