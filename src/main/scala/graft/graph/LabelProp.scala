package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SYNCHRONOUS LABEL PROPAGATION over a directed edge frame
  * `edges(src, dst)` (symmetric for undirected graphs, like the part
  * co-occurrence graphs the rest of the family runs on) — the
  * standard cheap community detector (Raghavan et al. 2007), the
  * primitive a training pipeline runs to cluster a domain/link graph
  * before assigning per-community mixing or quality policies.
  *
  * Every node starts in its own community (`label = node id`). One
  * synchronized round reassigns EVERY node the most frequent label
  * among its in-neighbors, breaking frequency ties toward the SMALLEST
  * label:
  *
  * {{{
  *   votes(n, l) = |{ (s, n) ∈ E : label(s) = l }|
  *   label'(n)   = argmax_l (votes(n, l), -l)   // max count, min label
  * }}}
  *
  * Both the frequency count and the tie-break are exact integer
  * decisions, so the round is DETERMINISTIC at any partitioning —
  * unlike classic asynchronous LPA, whose result depends on visit
  * order. A FIXED number of rounds makes the operator well-defined
  * without a convergence proof (the [[Sssp]]/[[KCore]] bounded-rounds
  * trick) and lets an external oracle replay it as R chained
  * count+argmax CTEs. The node universe is src ∪ dst, so a SINK node
  * (in-edges only — possible in a directed graph) is a first-class
  * member, not silently dropped; nodes with no in-edges (sources,
  * and isolated self-universe nodes) keep their own label.
  *
  * Scale shape: each round is one edge-list equi-join against the
  * node-sized label frame (broadcast-ready after the first round's
  * shrinkage), one map-side-combined `groupBy(dst, label)` count, and
  * one per-node argmax window over the vote list (votes per node ≤
  * degree) — O(rounds) edge scans, localCheckpointed flat plans, no
  * driver data path. */
object LabelProp {

  /** `(node, community)` after `rounds` synchronized propagation
    * rounds; `community` is the propagated label (a node id). */
  /** `broadcastVectors` (default true) broadcasts the node-sized
    * label frame into the edge scan and the patch joins — the
    * [[PageRank.run]] contract: checkpointed frames inherit TB-scale
    * upstream estimates with no exchange AQE can size at runtime, so
    * unhinted rounds sort-merge the edge list. False past broadcast
    * reach. */
  def run(edges: DataFrame, rounds: Int,
      broadcastVectors: Boolean = true): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    // e stays EAGER: nodes' two union branches would otherwise race
    // to compute the (expensive) upstream edge plan inside one job.
    // nodes itself is single-consumer-at-a-time -> lazy.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    var lab = nodes.select(col("node"), col("node").as("community"))
    var r = 0
    while (r < rounds) {
      r += 1
      val votes = e
        .join(bc(lab.select(col("node").as("src"), col("community"))),
          "src")
        .groupBy(col("dst").as("node"), col("community"))
        .agg(count(lit(1)).as("c"))
      // argmax as a MIN-STRUCT aggregate, not a row_number window: the
      // window sorts every node's full vote list per round (at 100 TB
      // that is a second sort pass over |E|-scale rows), where the
      // aggregate collapses map-side and never sorts. Tie-break is
      // IDENTICAL: min(struct(-c, community)) = highest count, then
      // lowest label (counts are ≥ 1, so -c cannot overflow).
      val picked = votes
        .select(col("node"),
          struct((-col("c")).as("_nc"), col("community")).as("_s"))
        .groupBy("node").agg(min(col("_s")).as("_s"))
        .select(col("node"), col("_s.community").as("community"))
      // a node with no in-edges this round keeps its current label
      lab = nodes
        .join(bc(picked), Seq("node"), "left_outer")
        .join(bc(lab.withColumnRenamed("community", "_prev")), Seq("node"))
        .select(col("node"),
          coalesce(col("community"), col("_prev")).as("community"))
        // lazy (the PageRank pattern): nothing acts inside the loop, so
        // the caller's first job materializes the chain in one pass
        .localCheckpoint(eager = false)
    }
    lab
  }
}
