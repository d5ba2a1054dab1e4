package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character entropy −Σ_c p_c ln p_c over the string's
  * codepoints — the compressibility-proxy quality signal (q110),
  * computed as ONE narrow kernel instead of an explode + (doc, char)
  * shuffle: at corpus scale the explode formulation shuffles one row
  * PER CHARACTER (~10⁴× the document count); this is a per-row
  * histogram walk inside whole-stage codegen, zero shuffle.
  *
  * Determinism contract (what lets a SQL oracle hash-match a float
  * sum): the fold visits distinct characters in ascending CODEPOINT
  * order — identical to `list_reduce(list(term ORDER BY ch))` over
  * single-char strings, because UTF-8 byte order equals codepoint
  * order — and each term is the exact expression tree
  * `(c/n) * ln(c/n) * (-1.0)` both engines build. p divides by the
  * CODEPOINT count (Spark `length`/DuckDB `length` semantics).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[Integer, Int]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
      n += 1
    }
    if (n == 0) 0.0
    else {
      var acc = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        acc += p * math.log(p) * -1.0
      }
      acc
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))
}
