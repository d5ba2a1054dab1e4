package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in EXACT integer arithmetic — the iterative
  * graph operator beyond connected components (`Dedup.connectedComponents`),
  * built so the maintained ranks are bit-identical across engines and
  * partitionings (the repo's float-discipline rule: no
  * order-dependent double sums in oracled outputs).
  *
  * Ranks live in integer MICRO-UNITS (1.0 → 1,000,000). One
  * iteration is the classic
  * `r' = base + d · Σ_in r/outdeg` with every step integral:
  * per-edge contribution `r div outdeg` (truncating division — both
  * engines truncate positives identically), BIGINT sums, damping as
  * `(num · c) div den`. The truncation remainder ("leaked mass") is
  * deliberately dropped, making the recurrence exactly reproducible —
  * the standard float formulation would be shuffle-order-dependent in
  * the 16th digit and unhashable cross-engine.
  *
  * Scale shape (per iteration): one shuffle to aggregate
  * contributions by dst and one broadcast-or-shuffle join of the
  * rank vector (|V| rows) back to the edge list — the PREGEL
  * dataflow, expressed relationally. No driver-side loop ever
  * touches data; the iteration count is a plan-construction loop.
  * Degrees are computed once. On a 100 TB edge list the edge scan
  * dominates and is embarrassingly parallel; ranks are |V| rows —
  * orders of magnitude smaller — so AQE picks broadcast for the
  * rank-to-edge join as long as |V| fits, and the per-iteration
  * lineage is cut with localCheckpoint to keep the plan flat.
  *
  * Reference for the algorithm: Page et al., "The PageRank Citation
  * Ranking" (1999); integer-arithmetic determinism is this library's
  * own discipline.
  */
object PageRank {

  /** Micro-unit scale of a unit rank. */
  val Scale = 1000000L

  /** PERSONALIZED PageRank (PPR): teleportation returns to the SEED
    * set instead of everywhere — rank measures proximity TO THE SEEDS
    * through the link structure, the expansion primitive behind
    * "grow my trusted-domain set" / related-item discovery. Same
    * all-integer micro-unit discipline as [[run]]: seeds start with
    * unit mass, each round is `base·[node ∈ seeds] + damp·Σ
    * contrib div dampDen`, every term an exact BIGINT — so the result
    * is partitioning-invariant and an oracle replays the rounds as
    * chained CTEs. Non-seed nodes unreachable from the seeds keep
    * rank 0 (exactly right: no proximity). Same per-round cost shape
    * as [[run]]; the seed flag joins as one more node-sized
    * broadcast.
    *
    * Same structural contract as [[run]]: every node must appear as
    * a `src` (no dangling nodes) — in particular a SEED that is
    * dst-only never enters the node set and is silently absent from
    * the output; symmetrize or add self-loops first. */
  def personalized(edges: DataFrame, seeds: DataFrame, iterations: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      broadcastVectors: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // lazy, as in [[run]]
    // e stays EAGER: round 1 prepares the rank and degree broadcasts
    // CONCURRENTLY and both subtrees descend into e — lazy, the two
    // threads race to compute the expensive upstream self-join twice
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node")).distinct()
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    val flag = nodes
      .join(bc(seeds.select(col("node")).distinct()
        .withColumn("_s", lit(1L))), Seq("node"), "left")
      .select(col("node"), coalesce(col("_s"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    val base = Scale - (dampNum * Scale) / dampDen
    var ranks = flag.select(col("node"),
      when(col("is_seed") === 1L, lit(Scale)).otherwise(lit(0L)).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(bc(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(bc(deg), Seq("src"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = flag
        .join(bc(contrib), Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed") === 1L, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(c, 0L)) div $dampDen")).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** `iterations` rounds over a directed `edges(src, dst)` frame.
    * Every node must appear as a `src` (no dangling nodes) — callers
    * with dangling nodes add self-loops or symmetrize first. Returns
    * `(node, rank)` with rank in micro-units (BIGINT). Damping
    * defaults to the classic 0.85 as 85/100.
    *
    * `broadcastVectors` (default true) broadcasts the |V|-row rank
    * and degree vectors to the edge scan — the right plan whenever
    * the node set fits an executor (checkpointed frames hide size
    * stats, so AQE alone would fall back to sort-merge and shuffle
    * the EDGE stream twice per round). Pass false for node sets
    * beyond broadcast reach: rounds become edge-stream shuffle
    * joins, still never a driver-side loop. */
  def run(edges: DataFrame, iterations: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      broadcastVectors: Boolean = true): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // materialize the edge list ONCE — deg, nodes, and every
    // iteration's contribution join re-read it, and an expensive
    // upstream (e.g. a co-occurrence self-join) would otherwise
    // re-execute per reference
    // all three lazy (each consumed one-branch-at-a-time through
    // sequential broadcast builds): materialization folds into round
    // 1's jobs instead of three standalone checkpoint jobs
    // e stays EAGER: round 1 prepares the rank and degree broadcasts
    // CONCURRENTLY and both subtrees descend into e — lazy, the two
    // threads race to compute the expensive upstream self-join twice
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(eager = false)
    val base = Scale - (dampNum * Scale) / dampDen // 0.15 in micro-units
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    var ranks = nodes.withColumn("rank", lit(Scale))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(bc(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(bc(deg), Seq("src"))
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = nodes
        .join(bc(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(c, 0L)) div $dampDen"))
            .as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
