package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.io.ManifestEntry

/** Round-trip property test of the manifest LINE codec — the on-disk
  * contract of the versioned store. The format packs three delimiter
  * levels (tab / comma / colon) plus base64-wrapped string bounds, and
  * its one production bug so far (an empty-string bound's trailing
  * field silently dropped by split) is exactly the class a round-trip
  * property catches. Hand-driven ScalaCheck Gen with a fixed seed (the
  * scalatest bridge artifact is not on the offline classpath). */
class ManifestCodecPropertySpec extends AnyFunSuite {

  private val keyGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(
      ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ '_'))
  } yield cs.mkString

  // any printable-ish unicode, including the codec's own separators,
  // base64 alphabet chars, %-escapes, and the empty string
  private val strBoundGen: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.const(":"), Gen.const(","), Gen.const("=="),
    Gen.const("2023-01-01"),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
      ':', ',', '%', '=', '/', '+', 'é', '日', ' '))).map(_.mkString))

  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.const(0.0), Gen.const(-0.0),
    Gen.const(Double.MinPositiveValue), Gen.const(Double.MaxValue),
    Gen.const(Double.NegativeInfinity), Gen.const(1e-300),
    Gen.choose(-1e9, 1e9))

  private val pathGen: Gen[String] = for {
    v <- Gen.choose(0, 99)
    part <- Gen.oneOf(
      Gen.const(""),
      keyGen.flatMap(k => strBoundGen.map(s =>
        s"$k=${s.replaceAll("[\\t\\n/]", "_")}/")))
    f <- Gen.choose(0, 9999)
  } yield f"_data/c$v%08d_ab12cd34/${part}part-$f%05d.snappy.parquet"

  private val entryGen: Gen[ManifestEntry] = for {
    p <- pathGen
    rows <- Gen.choose(0L, Long.MaxValue)
    bytes <- Gen.choose(0L, Long.MaxValue)
    nStats <- Gen.choose(0, 4)
    stats <- Gen.mapOfN(nStats, Gen.zip(keyGen, Gen.zip(doubleGen, doubleGen)))
    nStr <- Gen.choose(0, 4)
    strStats <- Gen.mapOfN(nStr, Gen.zip(keyGen, Gen.zip(strBoundGen, strBoundGen)))
    // a CHAIN of 1..3 delta dirs, ','-joined (the M49 encoding)
    dvDir <- Gen.option(Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 99).map(v => f"_data/c$v%08d_dv12ab34"))
        .map(_.mkString(","))))
    dvRows <- if (dvDir.isEmpty) Gen.const(0L) else Gen.choose(1L, rows.max(1L))
    baseRowId <- Gen.option(Gen.choose(0L, Long.MaxValue / 2))
    nNulls <- Gen.choose(0, 4)
    nullCounts <- Gen.mapOfN(nNulls, Gen.zip(keyGen, Gen.choose(0L, rows)))
  } yield ManifestEntry(p, rows, bytes, stats, strStats, dvDir, dvRows,
    baseRowId, nullCounts)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xC0DEC5L + i)))

  test("encode/decode round-trips every entry (1000 samples)") {
    samples(entryGen, 1000).foreach { e =>
      val line = ManifestEntry.encodeLine(e)
      assert(!line.contains('\n'), s"line must stay one line: $e")
      val back = ManifestEntry.decodeLine(line)
      assert(back === e, s"round-trip mismatch for line '$line'")
    }
  }

  test("decode accepts the older 3- and 4-field generations") {
    val legacy3 = ManifestEntry.decodeLine("_data/c0/part-0.parquet\t5\t100")
    assert(legacy3 === ManifestEntry("_data/c0/part-0.parquet", 5L, 100L))
    val legacy4 = ManifestEntry.decodeLine(
      "_data/c0/part-0.parquet\t5\t100\tid:1.0:9.0")
    assert(legacy4.stats === Map("id" -> (1.0, 9.0)))
    assert(legacy4.strStats === Map.empty)
    // a stats-less modern line degrades to the 3-field arity on split
    val statless = ManifestEntry("_data/c1/part-1.parquet", 1L, 2L)
    assert(ManifestEntry.decodeLine(ManifestEntry.encodeLine(statless))
      === statless)
  }
}
