package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-CORE PEELING over a directed edge frame `edges(src, dst)`
  * (symmetric for undirected graphs, like the co-occurrence graphs
  * the rest of the family runs on) — the cohesion primitive behind
  * spam-farm detection, community cores, and link-graph quality
  * weighting: nodes that only hang off the periphery peel away,
  * leaving the densely interconnected core.
  *
  * One synchronized peel round:
  *
  * {{{
  *   deg(n)  = out-degree of n in the surviving edge set
  *   keep    = { n : deg(n) ≥ k }
  *   edges'  = edges with BOTH endpoints in keep
  * }}}
  *
  * Running a FIXED number of rounds makes the operator well-defined
  * without a convergence proof — exactly the bounded-rounds trick
  * [[Sssp]] uses — and lets the oracle replay it as R chained CTEs.
  * (Full k-core = run until a round removes nothing; each round only
  * shrinks the node set, so rounds ≤ |V|.)
  *
  * Scale shape: each round is one map-side-combined `groupBy(src)`
  * degree count plus two node-sized semi-joins back onto the edge
  * list, localCheckpointed so the plan stays flat — O(rounds) edge
  * scans, no driver data path, exact integer degrees so the output
  * hashes identically at any partitioning. */
object KCore {

  /** Surviving `(node, deg)` after `rounds` synchronized peels at
    * threshold `k`; `deg` is the node's degree WITHIN the surviving
    * subgraph. */
  /** `broadcastVectors` (default true) broadcasts the node-sized
    * keep set into both semi-joins — the [[PageRank.run]] contract:
    * the checkpointed edge frame carries a TB-scale upstream estimate
    * and the keep set sits above no exchange the planner can size at
    * runtime, so unhinted peels sort-merge the edge list twice per
    * round. False past broadcast reach. */
  def peel(edges: DataFrame, k: Int, rounds: Int,
      broadcastVectors: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    var e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(eager = false)
    var r = 0
    while (r < rounds) {
      r += 1
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select(col("src").as("n"))
        // lazy (the PageRank pattern): no action runs inside the peel
        // loop, so the final aggregate's one job materializes the whole
        // chain — eager checkpoints were 2 standalone jobs per round
        .localCheckpoint(eager = false)
      e = e
        .join(bc(keep), e("src") === keep("n"), "left_semi")
        .join(bc(keep), col("dst") === keep("n"), "left_semi")
        .localCheckpoint(eager = false)
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }
}
