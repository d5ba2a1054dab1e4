package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 10:05:00")),
    (3L, "u2", ts("2024-01-01 10:00:00")),
    (4L, "u3", ts("2024-01-01 10:00:00"))   // no right rows at all
  ).toDF("id", "user", "ts")

  private def right = Seq(
    ("u1", ts("2024-01-01 09:59:00"), 10.0),
    ("u1", ts("2024-01-01 10:02:00"), 20.0),
    ("u1", ts("2024-01-01 10:30:00"), 99.0), // after both clicks
    ("u2", ts("2024-01-01 10:00:00"), 7.0)   // exact tie: inclusive
  ).toDF("user", "ts", "value")

  test("picks the latest at-or-before right row; ties inclusive; unmatched null") {
    val out = AsofJoin.asofJoin(left, right, "user", "ts", Seq("value"))
      .select("id", "value_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out(1L) === 10.0, "10:00 click sees 09:59 view")
    assert(out(2L) === 20.0, "10:05 click sees 10:02 view, not 10:30")
    assert(out(3L) === 7.0, "equal timestamps match inclusively")
    assert(out(4L) === null, "left row with no right rows keeps null")
  }

  test("forward as-of picks the earliest at-or-after; ties inclusive") {
    val out = AsofJoin.asofJoinForward(left, right, "user", "ts", Seq("value"))
      .select("id", "value_next").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out(1L) === 20.0, "10:00 click sees the NEXT view at 10:02")
    assert(out(2L) === 99.0, "10:05 click sees 10:30, not 10:02")
    assert(out(3L) === 7.0, "equal timestamps match inclusively")
    assert(out(4L) === null, "left row with no right rows keeps null")
  }

  test("forward as-of equals the naive per-row minimum on random data") {
    val rnd = new scala.util.Random(11)
    val l = (0 until 300).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}",
        ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("id", "user", "ts")
    val r = (0 until 200).map(i =>
      (s"u${rnd.nextInt(5)}",
        ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
        i.toDouble)).toDF("user", "ts", "value")
    val got = AsofJoin.asofJoinForwardWithTs(l, r, "user", "ts", Seq("value"))
      .select("id", "ts_next").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) null else x.getTimestamp(1))).toMap
    val rights = r.collect().map(x => (x.getString(0), x.getTimestamp(1)))
    l.collect().foreach { row =>
      val (id, u, t) = (row.getLong(0), row.getString(1), row.getTimestamp(2))
      val expect = rights.filter(p => p._1 == u && !p._2.before(t))
        .map(_._2).sortBy(_.getTime).headOption.orNull
      assert(got(id) === expect, s"row $id")
    }
  }

  test("a NULL payload in the latest matching right row is preserved") {
    // u1 at 10:04 has value NULL — the 10:05 click must return that
    // NULL (native ASOF semantics), not reach back to 10:02's 20.0
    val rightWithNull = Seq(
      ("u1", ts("2024-01-01 10:02:00"), Some(20.0)),
      ("u1", ts("2024-01-01 10:04:00"), None: Option[Double])
    ).toDF("user", "ts", "value")
    val out = AsofJoin.asofJoin(left, rightWithNull, "user", "ts", Seq("value"))
      .select("id", "value_asof").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out(1L) === null, "10:00 click precedes all right rows")
    assert(out(2L) === null,
      "latest matching row's explicit NULL payload must be returned")
  }

  test("plans as ONE shuffle on the key (window), no join operator") {
    val plan = AsofJoin.asofJoin(left, right, "user", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.split("Exchange hashpartitioning").length == 2,
      s"expected exactly ONE exchange (union shuffles once on the key):\n$plan")
  }
}
