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
