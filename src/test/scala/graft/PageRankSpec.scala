package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PageRank

/** Exact-integer PageRank: hand-computed ranks on a tiny graph, mass
  * bounds, and partitioning invariance (the determinism the integer
  * formulation exists for). */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one round on a 3-node path graph matches hand arithmetic") {
    // 1↔2, 2↔3; outdeg 1:1, 2:2, 3:1; all ranks start at 1e6.
    // contrib: n1 ← 2: 500000; n2 ← 1 and ← 3: 2000000; n3 ← 2: 500000
    // r1 = 150000 + 85%·c: n1/n3 = 150000+425000, n2 = 150000+1700000
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = PageRank.run(edges, iterations = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
  }

  test("mass bounds and partitioning invariance over a random graph") {
    val rnd = new scala.util.Random(7)
    val edges0 = (0 until 400).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    }.filter(e => e._1 != e._2)
    // symmetrize so every node appears as src (the run() contract)
    val sym = (edges0 ++ edges0.map(_.swap)).distinct
    val df = sym.toDF("src", "dst")
    val ranks = PageRank.run(df.repartition(7), iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = sym.map(_._1).distinct.size
    val total = ranks.values.sum
    // truncation only ever LOSES mass; base is the floor
    assert(total <= n * PageRank.Scale)
    assert(ranks.values.forall(_ >= 150000L))
    // identical under a different partitioning (integer determinism)
    val ranks2 = PageRank.run(df.repartition(3), iterations = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks === ranks2)
  }
}
