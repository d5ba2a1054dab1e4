package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.KCore

/** K-core peeling: per-round cascade semantics on a hand graph (a
  * path that dissolves, a triangle that survives), and partitioning
  * invariance of the exact-integer output. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // path 1-2-3-4-5 (peels away under k=2) + triangle 6-7-8 (2-core)
  private lazy val sym = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (6L, 7L), (7L, 8L), (8L, 6L))
    .flatMap(e => Seq(e, e.swap)).toDF("src", "dst")

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one round removes only the current periphery") {
    // endpoints 1 and 5 (deg 1) peel; 2 and 4 stay with in-core deg 1
    assert(toMap(KCore.peel(sym, k = 2, rounds = 1)) ===
      Map(2L -> 1L, 3L -> 2L, 4L -> 1L, 6L -> 2L, 7L -> 2L, 8L -> 2L))
  }

  test("the cascade dissolves the path; the triangle is the 2-core") {
    assert(toMap(KCore.peel(sym, k = 2, rounds = 3)) ===
      Map(6L -> 2L, 7L -> 2L, 8L -> 2L))
    // further rounds are a fixpoint
    assert(toMap(KCore.peel(sym, k = 2, rounds = 10)) ===
      Map(6L -> 2L, 7L -> 2L, 8L -> 2L))
    // k above the max degree empties the graph
    assert(KCore.peel(sym, k = 3, rounds = 3).isEmpty)
  }

  test("partitioning invariance") {
    val a = toMap(KCore.peel(sym.repartition(7), k = 2, rounds = 2))
    val b = toMap(KCore.peel(sym.repartition(2), k = 2, rounds = 2))
    assert(a === b)
  }
}
