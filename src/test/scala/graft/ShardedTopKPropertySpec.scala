package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the sharded pre-prune exactness claims:
  * [[graft.queries.Analytics.topKPerGroup]] and
  * [[graft.queries.Analytics.kmvSketch]] must equal their direct
  * single-window formulations on ANY input — including tie-heavy and
  * skewed distributions, where a buggy shard bound would silently
  * drop a winner. Hand-driven ScalaCheck Gen with fixed seeds (same
  * convention as WinnowingPropertySpec). */
class ShardedTopKPropertySpec extends AnyFunSuite {
  import graft.queries.Analytics
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("item", LongType)))

  // few groups, tiny item domain -> massive ties; zipf-ish skew
  private val row: Gen[(String, Long)] = for {
    g <- Gen.oneOf("a", "b", "c")
    item <- Gen.frequency(
      (8, Gen.chooseNum(0L, 5L)),    // hot items, many exact ties
      (2, Gen.chooseNum(0L, 500L)))  // long tail
  } yield (g, item)

  private def dataset(seed: Long, n: Int): Seq[(String, Long)] =
    Gen.listOfN(n, row)(Gen.Parameters.default, Seed(seed)).get

  test("sharded topKPerGroup == direct global rank on adversarial inputs") {
    import scala.jdk.CollectionConverters._
    (1 to 5).foreach { trial =>
      val rows = dataset(trial * 101L, 400)
      val df = spark.createDataFrame(
        rows.map { case (g, i) => Row(g, i) }.asJava, schema)
        .repartition(7) // arbitrary partitioning must not matter
      val got = Analytics.topKPerGroup(df, "g", "item", k = 4, shards = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSeq
      val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.map { case ((g, i), n) => (g, i, n) }
        .groupBy(_._1).toSeq.flatMap { case (g, items) =>
          items.sortBy(t => (-t._3, t._2)).take(4).zipWithIndex
            .map { case ((_, i, n), idx) => (g, i, n, idx + 1) }
        }.sortBy(t => (t._1, t._4))
      assert(got.sortBy(t => (t._1, t._4)) === expected, s"trial $trial")
    }
  }

  test("sharded kmvSketch == direct k-th smallest on adversarial inputs") {
    import scala.jdk.CollectionConverters._
    (1 to 5).foreach { trial =>
      val rows = dataset(trial * 77L, 300)
      val df = spark.createDataFrame(
        rows.map { case (g, i) => Row(g, i) }.asJava, schema)
        .repartition(5)
      val k = 8
      val got = Analytics.kmvSketch(df, "g", "item", k = k, shards = 4)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // direct recount: the same md5 fraction, full sort per group
      val frac = (v: Long) => {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(v.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13)
        java.lang.Long.parseLong(hex, 16).toDouble / math.pow(16, 13)
      }
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        val fr = rs.map(_._2).distinct.map(frac).sorted
        g -> (if (fr.length < k) fr.length.toDouble else (k - 1) / fr(k - 1))
      }
      assert(got === expected, s"trial $trial")
    }
  }
}
