package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** stripHtml unit behavior + squareWav round-trip through the real
  * javax.sound decoder (the q161/q162 kernels). */
class HtmlStripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("h").select(TextAnalysis.stripHtml(col("h")))
      .collect().head.getString(0)

  test("stripHtml: tags, entities, whitespace, idempotence") {
    assert(strip("<p>a  b</p>") === "a b")
    assert(strip("<a href=\"/x\">link</a> &amp; more") === "link & more")
    // escaped entities decode ONCE: `&amp;` is replaced LAST, so
    // `&amp;lt;` yields the literal `&lt;`, never `<`
    assert(strip("code &amp;lt;tag&amp;gt; here") === "code &lt;tag&gt; here")
    assert(strip("x&lt;y&gt;z &quot;q&quot;&nbsp;w") === "x<y>z \"q\" w")
    assert(strip("  <br/>\n\t hello <b>world</b>\r\n") === "hello world")
    assert(strip("no markup at all") === "no markup at all")
    // unknown entities pass through untouched (no parser pretensions)
    assert(strip("&copy; 2026") === "&copy; 2026")
    // already-clean text is a fixed point
    val once = strip("<div>mixed &amp; nested <i>tags</i></div>")
    assert(strip(once) === once)
  }

  test("squareWav round-trips the real javax.sound decoder exactly") {
    import graft.multimodal.Multimodal
    val amp = 6144; val hp = 5; val n = 1000
    val rec = Multimodal.MediaRecord(1L, "audio",
      Multimodal.squareWav(amp, hp, n, 8000), 0, 0)
    val f = Multimodal.decode(Seq(rec).toDS()).collect().head
    assert(f.width === 8000) // sample rate
    assert(f.height === 1) // channels
    assert(f.n_frames === n)
    assert(f.n_bytes === 44 + 2 * n)
    // closed forms: rms = meanAbs = peak = amp/32768 (dyadic-exact)
    assert(f.feature(0) === (amp / 32768.0).toFloat)
    assert(f.feature(1) === (amp / 32768.0).toFloat)
    assert(f.feature(2) === (amp / 32768.0).toFloat)
    assert(math.round(f.feature(3).toDouble * n) === (n - 1) / hp)
  }
}
