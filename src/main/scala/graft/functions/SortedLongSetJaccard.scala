package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Jaccard similarity |A∩B| / |A∪B| of two SORTED-DISTINCT long-array
  * columns (the shape [[HashedNGrams]] emits), as a codegen'd merge
  * loop.
  *
  * The builtin route — `size(array_intersect(a, b))` arithmetic —
  * builds a boxed hash set per PAIR; at hundreds of thousands of
  * candidate pairs × ~50-element sets that allocation dominates
  * near-dup verification. Sortedness turns intersection into a linear
  * two-pointer merge over primitives: no allocation at all.
  *
  * Inputs MUST be sorted ascending and duplicate-free; outputs are
  * arbitrary otherwise. Returns null when both sets are empty
  * (0/0 — matching SQL divide-by-zero semantics of the builtin form).
  */
case class SortedLongSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "graft_sorted_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

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
    val union = na + nb - inter
    if (union == 0) null else inter.toDouble / union
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
      val union = ctx.freshName("union")
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
         |int $union = $na + $nb - $inter;
         |if ($union == 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = (double) $inter / $union; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongSetJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedLongSetJaccard {
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongSetJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
