package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Sssp

/** Weighted SSSP: the ≤k-edge Bellman-Ford invariant on a hand graph,
  * agreement with a driver-side Dijkstra on a random graph, and
  * partitioning invariance (exact integers → bitwise determinism). */
class SsspSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("k-round distances are the min over paths of <= k edges") {
    // 1→2 direct costs 10; 1→3→2 costs 1+2=3 but needs two edges
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
      .toDF("src", "dst", "w")
    assert(toMap(Sssp.shortestPaths(edges, 1L, maxRounds = 1)) ===
      Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
    assert(toMap(Sssp.shortestPaths(edges, 1L, maxRounds = 2)) ===
      Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
  }

  test("unreachable nodes are absent; source at 0; early fixpoint stop") {
    val edges = Seq((1L, 2L, 5L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    // maxRounds far above the diameter: the empty-frontier stop fires
    assert(toMap(Sssp.shortestPaths(edges, 1L, maxRounds = 50)) ===
      Map(1L -> 0L, 2L -> 5L))
  }

  test("matches driver-side Dijkstra on a random graph; partition-invariant") {
    val rnd = new scala.util.Random(11)
    val edges0 = (0 until 300).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
        (rnd.nextInt(9) + 1).toLong)
    }.filter(e => e._1 != e._2).distinct
    val df = edges0.toDF("src", "dst", "w")
    // reference: plain Dijkstra over the same edge list
    val adj = edges0.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => (e._2, e._3))
    }
    val dist = scala.collection.mutable.Map(0L -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(
      Ordering.by(-_._2))
    while (pq.nonEmpty) {
      val (u, d) = pq.dequeue()
      if (d == dist(u)) adj.getOrElse(u, Nil).foreach { case (v, w) =>
        if (dist.get(v).forall(_ > d + w)) { dist(v) = d + w; pq.enqueue((v, d + w)) }
      }
    }
    val got = toMap(Sssp.shortestPaths(df.repartition(7), 0L, maxRounds = 40))
    assert(got === dist.toMap)
    val got2 = toMap(Sssp.shortestPaths(df.repartition(3), 0L, maxRounds = 40))
    assert(got === got2)
  }
}
