package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests of the Z-value curve invariants that make
  * [[graft.maintenance.Maintenance.zOrderBy]] a data-skipping layout:
  * per-dimension monotonicity (holding other dims fixed, a larger
  * value never gets a smaller z) and bucket-locality (equal buckets →
  * equal z). Sampling is hand-driven ScalaCheck Gen with a fixed seed
  * (the scalatest bridge artifact is not on the offline classpath). */
class ZValuePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Bits = 4
  private val Edges: Seq[Double] = (1 until (1 << Bits)).map(_.toDouble)

  private def zs(pairs: Seq[(Double, Double)]): Seq[Long] = {
    import spark.implicits._
    pairs.toDF("x", "y")
      .select(graft.functions.ZValue.zvalue(
        Seq(col("x"), col("y")), Seq(Edges, Edges)).as("z"))
      .collect().toSeq.map(_.getLong(0))
  }

  private val value: Gen[Double] = Gen.choose(-2.0, 18.0)

  private def samples(n: Int): Seq[(Double, Double, Double)] =
    (0 until n).flatMap { i =>
      Gen.zip(value, value, value).apply(Gen.Parameters.default, Seed(7L + i))
    }

  test("monotone per dimension with the other dimension fixed") {
    val cases = samples(40)
    val rows = cases.flatMap { case (a, b, fixed) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      Seq((lo, fixed), (hi, fixed), (fixed, lo), (fixed, hi))
    }
    val z = zs(rows)
    cases.indices.foreach { i =>
      val base = i * 4
      assert(z(base) <= z(base + 1),
        s"x-monotonicity violated at ${cases(i)}: ${z(base)} > ${z(base + 1)}")
      assert(z(base + 2) <= z(base + 3),
        s"y-monotonicity violated at ${cases(i)}: ${z(base + 2)} > ${z(base + 3)}")
    }
  }

  test("z is bucket-determined and bounded by the bit budget") {
    val cases = samples(30).map { case (a, b, _) => (a, b) }
    def bucket(v: Double): Int = Edges.count(_ < v)
    // same bucket pair → same z: replace each value by its bucket's
    // midpoint (bucket k spans (k, k+1]; midpoint k+0.5 stays inside)
    val z = zs(cases)
    val zMid = zs(cases.map { case (a, b) => (bucket(a) + 0.5, bucket(b) + 0.5) })
    cases.indices.foreach { i =>
      assert(z(i) === zMid(i), s"bucket-determinism violated at ${cases(i)}")
      assert(z(i) >= 0 && z(i) < (1L << (2 * Bits)),
        s"z out of range at ${cases(i)}: ${z(i)}")
    }
  }
}
