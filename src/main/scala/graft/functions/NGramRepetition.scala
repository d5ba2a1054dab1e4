package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-document n-gram repetition statistics — the Gopher-style
  * quality-filter kernel (Rae et al. 2021 §A1.1: "fraction of
  * characters in the most common n-gram" / "fraction of characters in
  * duplicated n-grams", here in token-count form):
  *
  *   top_frac = count(most frequent n-gram) / count(all n-grams)
  *   dup_frac = count(occurrences of n-grams seen >1 time) / count(all)
  *
  * Input is the token array (tokenize once, reuse across kernels —
  * same convention as [[StopwordHitCount]]). Output is a
  * struct<top_frac:double, dup_frac:double>, or NULL when the document
  * has fewer than `n` tokens (no n-grams exist; 0/0 is not 0).
  *
  * One pass, one small hash map per row, zero shuffles — the
  * composition alternative (posexplode → n-gram assembly → two
  * count-aggregates → join back on doc id) is two full shuffles of the
  * exploded corpus. At 100 TB that is the difference between a scan
  * and a multi-TB exchange.
  *
  * Exactness: n-grams are compared as the space-joined token strings,
  * so results match any engine computing the same definition (the
  * DuckDB oracle builds `ws[i] || ' ' || ws[i+1]`); no hashing, no
  * collisions. Fractions are smallint/int ratios — both engines divide
  * the same exact integers in double, bit-identical.
  */
case class NGramRepetition(child: Expression, n: Int)
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def prettyName: String = "graft_ngram_repetition"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  // NULL for docs with no n-grams, independent of child nullability.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val total = m - n + 1
    if (total <= 0) return null
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!toks.isNullAt(i + j)) sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(
      Array[Any](top.toDouble / total, dup.toDouble / total))
  }

  override protected def withNewChildInternal(newChild: Expression): NGramRepetition =
    copy(child = newChild)
}

object NGramRepetition {
  /** struct(top_frac, dup_frac) of the `n`-grams of a token array. */
  def ngramRepetition(toks: Column, n: Int): Column =
    ColumnBridge.column(NGramRepetition(ColumnBridge.expression(toks), n))
}
