package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: NGramRepetition ≡ an independent Scala recount on
  * random token arrays, for n = 1..3, including degenerate and
  * null-bearing inputs. Hand-driven ScalaCheck Gen with a fixed seed
  * (same convention as WinnowingPropertySpec — the scalatest bridge
  * artifact is not on the offline classpath). */
class NGramRepetitionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // small vocabulary so repeats actually occur
  private val token: Gen[String] =
    Gen.oneOf(Gen.oneOf("a", "b", "c", "ab", ""), Gen.const(null))
  private val toks: Gen[List[String]] =
    Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, token))

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).flatMap(i => toks(Gen.Parameters.default, Seed(7L + i)))

  private def reference(ts: Seq[String], n: Int): Option[(Double, Double)] = {
    if (ts.length < n) None
    else {
      val grams = ts.map(t => if (t == null) "" else t)
        .sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).map(_._2.size)
      val total = grams.size.toDouble
      Some((counts.max / total, counts.filter(_ > 1).sum / total))
    }
  }

  test("expression matches the Scala reference on random inputs, n=1..3") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cases = samples(60)
    assert(cases.size === 60)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("toks", ArrayType(StringType))))
    val df = spark.createDataFrame(
      cases.zipWithIndex.map { case (ts, i) => Row(i, ts) }.asJava, schema)
    (1 to 3).foreach { n =>
      val got = df.select(col("id"), graft.functions.NGramRepetition
          .ngramRepetition(col("toks"), n).as("r"))
        .collect()
        .map { r =>
          r.getInt(0) -> (if (r.isNullAt(1)) None
          else Some((r.getStruct(1).getDouble(0), r.getStruct(1).getDouble(1))))
        }.toMap
      cases.zipWithIndex.foreach { case (ts, i) =>
        assert(got(i) === reference(ts, n), s"n=$n tokens=$ts")
      }
    }
  }
}
