package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed single-source WEIGHTED shortest paths over a directed
  * `edges(src, dst, w)` frame — the cost-aware sibling of [[Bfs]]
  * (hop counts). Weights are exact non-negative integers, so like the
  * rest of the graph family the output is hash-stable across engines
  * and partitionings by construction.
  *
  * Algorithm: frontier Bellman-Ford (label-correcting relaxation).
  * Per round, only edges leaving nodes whose tentative distance
  * IMPROVED last round are relaxed:
  *
  * {{{
  *   cand(v)   = min over edges (u,v), u ∈ active: dist(u) + w(u,v)
  *   improved  = { (v, cand(v)) : cand(v) < dist(v) or v unseen }
  *   dist      = dist patched with improved;  active = improved
  * }}}
  *
  * Restricting relaxation to the active frontier loses nothing: a
  * node whose distance did not change last round already contributed
  * its out-edges in the round it last improved. By induction, after k
  * rounds `dist` holds EXACTLY the minimum path weight over paths of
  * at most k edges — the classic Bellman-Ford invariant — which is
  * what makes a `maxRounds` cap a well-defined operator (shortest
  * ≤k-hop path) rather than a truncation artifact, and what the
  * recursive-CTE oracle reproduces with a hop counter.
  *
  * Scale shape (mirrors [[Bfs.shortestHops]]): each round is one
  * equi-join of the edge list against the node-sized frontier, one
  * `groupBy(dst).min` (map-side partial min collapses the fan-in
  * before the shuffle), and one node-sized patch join; every
  * intermediate is `localCheckpoint`ed so the plan stays flat across
  * rounds. The loop is plan construction only — no data reaches the
  * driver; termination reads one `isEmpty` per round (a limit-1 scan
  * of the checkpointed frontier). With non-negative weights the
  * frontier drains in at most |V| rounds; on small-diameter graphs it
  * drains in O(diameter · weight-spread) rounds, each a single edge
  * scan — the standard relational Bellman-Ford bound.
  */
object Sssp {

  /** Minimum path weights from `source` over paths of at most
    * `maxRounds` edges. Returns `(node BIGINT, dist BIGINT)` for every
    * node reachable within the cap, including the source at distance
    * 0. Stops early once a round improves nothing (exact fixpoint —
    * all shortest paths found). Weights must be non-negative (checked
    * per-round candidates would mask negative cycles otherwise). */
  /** `broadcastVectors` (default true) broadcasts the node-sized
    * frontier/distance frames into the edge scan — the
    * [[PageRank.run]] contract: checkpointed frames inherit TB-scale
    * upstream estimates and AQE sees no runtime size under them, so
    * unhinted rounds sort-merge the edge list. False past broadcast
    * reach. */
  def shortestPaths(edges: DataFrame, source: Long,
      maxRounds: Int, broadcastVectors: Boolean = true): DataFrame = {
    require(maxRounds >= 0, "maxRounds must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"),
      col("w").cast("long").as("w")).localCheckpoint(eager = false)
    var dist = Seq((source, 0L)).toDF("node", "dist")
      .localCheckpoint(eager = false)
    var active = dist
    var round = 0
    while (round < maxRounds && !active.isEmpty) {
      round += 1
      val cand = e.join(bc(active), e("src") === active("node"))
        .select(e("dst").as("node"), (active("dist") + e("w")).as("cand"))
        .groupBy("node").agg(min("cand").as("cand"))
      val improved = cand
        .join(bc(dist.select(col("node").as("seen"), col("dist").as("old"))),
          col("node") === col("seen"), "left")
        .filter(col("old").isNull || col("cand") < col("old"))
        .select(col("node"), col("cand").as("dist"))
        // lazy (the PageRank pattern): the round's isEmpty/next-round
        // jobs materialize it — an eager checkpoint is a standalone
        // O(V) job per round bought for nothing
        .localCheckpoint(eager = false)
      dist = dist
        .join(bc(improved.select(col("node").as("upd"))),
          col("node") === col("upd"), "left_anti")
        .select(col("node"), col("dist"))
        .unionByName(improved)
        .localCheckpoint(eager = false)
      active = improved
    }
    dist
  }
}
