package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Number of tokens (occurrences, not distinct) that appear in a small
  * fixed word set — the language-ID / stopword-ratio kernel.
  *
  * Replaces `size(filter(toks, t -> t.isInCollection(words)))`: the
  * builtin filter is an interpreted HOF that linearly scans the word
  * list per token with per-element lambda-variable bookkeeping. Here
  * the word set is one prebuilt hash set per expression instance and
  * the token walk is a single eval. Null tokens are not counted
  * (`In` evaluates to null for them, and `filter` drops nulls).
  */
case class StopwordHitCount(child: Expression, words: Seq[String])
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  override def prettyName: String = "graft_stopword_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    var hits = 0
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i) && wordSet.contains(toks.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHitCount =
    copy(child = newChild)
}

object StopwordHitCount {
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(StopwordHitCount(ColumnBridge.expression(toks), words))
}
