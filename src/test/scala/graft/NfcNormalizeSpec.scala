package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NfcNormalize.nfcNormalize

/** NFC kernel: composition actually happens, ASCII takes the zero-copy
  * fast path, idempotence, null contract. All non-ASCII content is
  * built from \u escapes so the SOURCE FILE's own normalization form
  * can never silently change what the test feeds the kernel. */
class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(rows: Seq[String]): Seq[String] =
    rows.toDF("s").select(nfcNormalize(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("decomposed sequences compose; ASCII passes through; idempotent") {
    val decomposed = "cafe\u0301" // e + COMBINING ACUTE
    val composed = "caf\u00e9" // precomposed é
    val out = norm(Seq(decomposed, composed, "plain ascii", ""))
    assert(out(0) === composed, "e+U+0301 must compose to U+00E9")
    assert(out(1) === composed, "already-NFC input must be unchanged")
    assert(out(2) === "plain ascii")
    assert(out(3) === "")
    // idempotence: NFC(NFC(x)) == NFC(x)
    assert(norm(out.take(2)) === out.take(2))
  }

  test("null in, null out; multi-mark and non-BMP input") {
    val multiMark = "a\u0308\u0301" // a + diaeresis + acute
    val nonBmp = "\ud83d\ude00e\u0301" // emoji surrogate pair + e + acute
    val out = Seq[String](null, multiMark, nonBmp)
      .toDF("s").select(nfcNormalize(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) === null)
    // parity with java.text.Normalizer directly (not a frozen literal)
    assert(out(1) === java.text.Normalizer
      .normalize(multiMark, java.text.Normalizer.Form.NFC))
    assert(out(2) === java.text.Normalizer
      .normalize(nonBmp, java.text.Normalizer.Form.NFC))
    assert(out(2).contains("\u00e9"), "composition after a surrogate pair")
  }
}
