package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Hits

/** HITS mutual recursion on a hand bipartite graph: exact micro-unit
  * scores (hand-derived), max-normalization, and partitioning
  * invariance of the all-integer rounds. */
class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hubs 1,2,3 -> authorities 10,11,12
  private lazy val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L))
    .toDF("src", "dst")

  private def toMap(df: org.apache.spark.sql.DataFrame, c: String) =
    df.collect().map(r => r.getAs[Long]("node") -> r.getAs[Long](c)).toMap

  test("round 1: hand-derived integer scores") {
    val (h, a) = Hits.run(e, rounds = 1)
    // a1s: 10->2S, 11->S, 12->S; max 2S -> S, S/2, S/2
    assert(toMap(a, "auth") ===
      Map(10L -> 1000000L, 11L -> 500000L, 12L -> 500000L))
    // h1s: 1 -> a(10)+a(11)=1.5e6, 2 -> 1e6, 3 -> 5e5; max 1.5e6
    assert(toMap(h, "hub") ===
      Map(1L -> 1000000L, 2L -> 666666L, 3L -> 333333L))
  }

  test("the dominant hub/authority pair wins and normalizes to Scale") {
    val (h, a) = Hits.run(e, rounds = 3)
    assert(toMap(h, "hub")(1L) === Hits.Scale)
    assert(toMap(a, "auth")(10L) === Hits.Scale)
  }

  test("partitioning invariance of the integer rounds") {
    val (h4, a4) = Hits.run(e.repartition(4), rounds = 2)
    val (h1, a1) = Hits.run(e.repartition(1), rounds = 2)
    assert(toMap(h4, "hub") === toMap(h1, "hub"))
    assert(toMap(a4, "auth") === toMap(a1, "auth"))
  }
}
