package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.LabelProp

/** Synchronous label propagation: per-round vote/argmax semantics on a
  * hand graph (two triangles joined by a bridge), the min-label
  * frequency tie-break, bounded-rounds determinism on an oscillating
  * pair, and partitioning invariance of the exact-integer decisions. */
class LabelPropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // triangle {1,2,3} + triangle {10,11,12} + bridge 3-10
  private lazy val sym = Seq((1L, 2L), (2L, 3L), (3L, 1L),
    (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L))
    .flatMap(e => Seq(e, e.swap)).toDF("src", "dst")

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("round 1: most frequent neighbor label, ties to the smallest") {
    // every neighbor label appears once, so every node takes the
    // smallest neighbor label
    assert(toMap(LabelProp.run(sym, rounds = 1)) === Map(
      1L -> 2L, 2L -> 1L, 3L -> 1L, // 3 sees {1,2,10} -> 1
      10L -> 3L, 11L -> 10L, 12L -> 10L))
  }

  test("round 2: genuine majorities beat the tie-break") {
    // after r1: 1->2, 2->1, 3->1, 10->3, 11->10, 12->10
    // node 1 sees {1,1} (majority); node 10 sees {10,10,1} -> 10
    assert(toMap(LabelProp.run(sym, rounds = 2)) === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L))
  }

  test("fixed rounds pin the oscillating pair deterministically") {
    // an isolated symmetric pair swaps labels every round — classic
    // LPA bipartite oscillation; bounded rounds make it well-defined
    val pair = Seq((20L, 21L), (21L, 20L)).toDF("src", "dst")
    assert(toMap(LabelProp.run(pair, rounds = 1)) ===
      Map(20L -> 21L, 21L -> 20L))
    assert(toMap(LabelProp.run(pair, rounds = 2)) ===
      Map(20L -> 20L, 21L -> 21L))
  }

  test("directed graphs: sink nodes (in-edges only) are first-class " +
    "members of the node universe, not dropped") {
    // 30 -> 31 -> 32: 32 is a pure sink (never appears as src)
    val chain = Seq((30L, 31L), (31L, 32L)).toDF("src", "dst")
    assert(toMap(LabelProp.run(chain, rounds = 1)) === Map(
      30L -> 30L, // no in-edges: keeps its own label
      31L -> 30L, 32L -> 31L))
    assert(toMap(LabelProp.run(chain, rounds = 2)) === Map(
      30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("partitioning invariance") {
    val a = toMap(LabelProp.run(sym.repartition(7), rounds = 2))
    val b = toMap(LabelProp.run(sym.repartition(2), rounds = 2))
    assert(a === b)
  }

  test("spark.graft.graph.broadcastVectors=false: same result through " +
    "the shuffle-join arm (the past-broadcast-reach escape hatch)") {
    val withBc = toMap(LabelProp.run(sym, rounds = 2))
    spark.conf.set("spark.graft.graph.broadcastVectors", "false")
    try {
      val noBc = toMap(LabelProp.run(sym, rounds = 2))
      assert(noBc === withBc)
    } finally spark.conf.unset("spark.graft.graph.broadcastVectors")
  }
}
