package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // intervals deliberately crossing bucket boundaries and overlapping
  private def points = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00")),
    (2L, "k1", ts("2024-01-01 10:04:59")),
    (3L, "k1", ts("2024-01-01 10:05:01")),
    (4L, "k2", ts("2024-01-01 10:02:00")),
    (5L, "k3", ts("2024-01-01 12:00:00"))
  ).toDF("pid", "key", "ts")

  private def intervals = Seq(
    (10L, "k1", ts("2024-01-01 09:58:00"), ts("2024-01-01 10:03:00")),
    (11L, "k1", ts("2024-01-01 10:03:00"), ts("2024-01-01 10:05:00")),
    (12L, "k2", ts("2024-01-01 10:02:00"), ts("2024-01-01 10:02:00")),
    (13L, "k2", ts("2024-01-01 11:00:00"), ts("2024-01-01 11:01:00"))
  ).toDF("iid", "key", "start_ts", "end_ts")

  test("bucketized range join equals the naive non-equi join") {
    val naive = points.join(intervals, Seq("key"))
      .filter(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketized = RangeJoin.pointInInterval(points, intervals,
        "key", "ts", "start_ts", "end_ts", bucketWidthSec = 300)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketized === naive,
      s"missing=${naive -- bucketized} extra=${bucketized -- naive}")
    // sanity on the fixture itself: boundaries inclusive both ends
    assert(naive.contains((1L, 10L)))
    assert(naive.contains((2L, 11L)))  // 10:04:59 in [10:03, 10:05]
    assert(!naive.contains((3L, 11L))) // 10:05:01 past the end
    assert(naive.contains((4L, 12L)))  // zero-length interval, exact hit
    assert(!naive.exists(_._1 == 5L))  // k3 has no intervals
  }

  test("intervalOverlap equals the naive overlap join; each pair once") {
    val rnd = new scala.util.Random(23)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val start = rnd.nextInt(20 * 3600)
      val len = 1 + rnd.nextInt(3 * 3600) // up to 3h, bucket 2h: spans many
      (i.toLong, s"k${rnd.nextInt(4)}",
        new java.sql.Timestamp(1704100000000L + start * 1000L),
        new java.sql.Timestamp(1704100000000L + (start + len) * 1000L))
    }.toDF("id", "key", s"${tag}_start", s"${tag}_end")
    val a = mk(150, "a").withColumnRenamed("id", "aid")
    val b = mk(100, "b").withColumnRenamed("id", "bid")
    val naive = a.join(b, Seq("key"))
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = RangeJoin.intervalOverlap(a, b, "key",
        "a_start", "a_end", "b_start", "b_end", bucketWidthSec = 7200)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // set equality AND multiplicity: the canonical-bucket trick must
    // emit every qualifying pair EXACTLY once with no dedup stage
    assert(got.sorted.toSeq === naive.sorted.toSeq,
      s"missing=${naive.toSet -- got.toSet} extra=${got.toSet -- naive.toSet}" +
        s" dupes=${got.groupBy(identity).filter(_._2.length > 1).keys}")
    assert(naive.nonEmpty)
  }

  test("plans as an equi-join (hash/sort-merge), never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        "key", "ts", "start_ts", "end_ts", bucketWidthSec = 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join"), plan)
  }
}
