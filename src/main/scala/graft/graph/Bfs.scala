package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed single-source BFS — shortest HOP COUNTS over a directed
  * `edges(src, dst)` frame, the reachability/radius primitive next to
  * [[PageRank]] (influence) and `Dedup.connectedComponents`
  * (partition). Distances are exact small integers, so the output is
  * hash-stable across engines and partitionings by construction — no
  * float discipline needed.
  *
  * Dataflow per round (the PREGEL frontier expansion, expressed
  * relationally): `next = π_dst(edges ⋈ frontier) ∖ settled`, i.e. one
  * equi-join of the edge list against the current frontier, a
  * distinct, and an anti-join against everything already labeled.
  * Rounds run `min(maxHops, diameter)` times; the loop is
  * plan-construction only — no data ever reaches the driver, and each
  * round's result is `localCheckpoint`ed so the plan stays flat
  * instead of growing a 2^rounds lineage.
  *
  * Scale shape: the edge list is scanned once per round (partitioned
  * by src via the join shuffle — or broadcast when the frontier is
  * small, which AQE picks naturally since frontiers are checkpointed
  * and sized); `settled` and `frontier` are node-sized, orders of
  * magnitude smaller than edges. On a web-scale graph the expected
  * diameter is O(log n), so the total work is a handful of edge scans
  * — the textbook distributed-BFS bound (cf. Lin & Dyer, "Data-
  * Intensive Text Processing with MapReduce", ch. 5 parallel BFS).
  */
object Bfs {

  /** Hop distances from `source`, capped at `maxHops`. Returns
    * `(node BIGINT, dist INT)` for every node reachable within the
    * cap, including the source at distance 0.
    *
    * `broadcastVectors` (default true) broadcasts the node-sized
    * frontier and settled frames into the edge scan — the same
    * contract as [[PageRank.run]]: checkpointed frames inherit the
    * upstream ESTIMATE (a co-occurrence self-join estimates in the
    * TB), and with no exchange under them AQE never sees a runtime
    * size either, so without the hint every round sort-merges the
    * full edge list. Pass false past broadcast reach. */
  def shortestHops(edges: DataFrame, source: Long, maxHops: Int,
      broadcastVectors: Boolean = true): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(eager = false)
    var settled = Seq((source, 0)).toDF("node", "dist")
      .localCheckpoint(eager = false)
    var frontier = settled.select(col("node"))
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = e.join(bc(frontier), e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(bc(settled.select(col("node").as("seen"))),
          col("node") === col("seen"), "left_anti")
        .select(col("node"), lit(hop).as("dist"))
        // lazy (the PageRank pattern): the loop-guard isEmpty and the
        // next hop's join materialize it; eager was one standalone
        // O(frontier) job per hop
        .localCheckpoint(eager = false)
      // settled stays a UNION of checkpointed hop frames (≤ maxHops
      // flat leaves) — checkpointing the union re-materialized O(V)
      // rows per round for one saved union node
      settled = settled.unionByName(next)
      frontier = next.select(col("node"))
    }
    settled
  }
}
