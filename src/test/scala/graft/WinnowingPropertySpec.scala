package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test of the winnowing guarantee (SIGMOD'03 §3): two
  * documents sharing a substring of length ≥ w + k − 1 share at least
  * one fingerprint. Sampling is hand-driven ScalaCheck Gen (the
  * scalatest bridge artifact is not on the offline classpath); the
  * seed is fixed so failures reproduce. */
class WinnowingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 5
  private val W = 4

  private def fingerprints(texts: Seq[String]): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(graft.functions.WinnowingFingerprints.winnow(col("text"), K, W))
      .collect()
      .toSeq
      .map(_.getSeq[Long](0).toSet)
  }

  private val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
  private val chunk = Gen.listOfN(4, word).map(_.mkString(" "))

  private def samples(n: Int): Seq[(String, String, String)] =
    (0 until n).flatMap { i =>
      Gen.zip(chunk, chunk, chunk)
        .apply(Gen.Parameters.default, Seed(42L + i))
    }

  test("docs sharing a >= w+k-1 substring share a fingerprint") {
    val cases = samples(25)
    assert(cases.size === 25)
    // one Spark job for all cases
    val texts = cases.flatMap { case (shared, pre, post) =>
      Seq(s"$pre $shared", s"$shared $post") // shared: 27 chars >= W+K-1 = 8
    }
    val fps = fingerprints(texts)
    cases.zipWithIndex.foreach { case ((shared, pre, post), i) =>
      val fa = fps(2 * i)
      val fb = fps(2 * i + 1)
      assert((fa intersect fb).nonEmpty,
        s"no shared fingerprint between '$pre $shared' and '$shared $post'")
    }
  }

  test("fingerprints are deterministic and non-empty for docs >= k chars") {
    val docs = samples(10).map(_._1)
    val f1 = fingerprints(docs)
    val f2 = fingerprints(docs)
    assert(f1 === f2)
    assert(f1.forall(_.nonEmpty))
  }
}
