package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a narrow codegen'd kernel — the text
  * canonicalization pass a web corpus needs before ANY
  * equality-based operator (exact dedup, shingling, vocabulary
  * counting): "é" arrives both precomposed (U+00E9) and decomposed
  * (e + U+0301) from real scrapers, and un-normalized they hash
  * apart, silently splitting duplicate groups and vocabulary rows.
  *
  * Spark ships no NFC builtin, so this wraps `java.text.Normalizer`
  * (the JDK's implementation of UAX #15 — a published standard
  * algorithm, which is why a DuckDB `nfc_normalize` oracle can
  * hash-match the output byte-for-byte). Fast path: `isNormalized`
  * first — for the overwhelmingly-ASCII common case this is a single
  * scan with no allocation, and ASCII is always NFC.
  *
  * Zero shuffles; sits inside whole-stage codegen via
  * [[UnaryKernelCodegen]] like the other ten native kernels.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
