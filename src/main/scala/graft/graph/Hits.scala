package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities over a directed edge
  * frame `edges(src, dst)` — the second classic link-analysis scorer
  * next to [[PageRank]], and the natural fit for BIPARTITE graphs
  * (buyer→product, document→citation, crawler→page) where PageRank's
  * single score conflates the two roles: a hub is good because it
  * points at good authorities, an authority because good hubs point
  * at it.
  *
  * Mutual recursion per round, max-normalized:
  *
  * {{{
  *   a(v) ← Σ_{u→v} h(u)   then  a ← a·S div max(a)
  *   h(u) ← Σ_{u→v} a(v)   then  h ← h·S div max(h)
  * }}}
  *
  * ALL-INTEGER arithmetic in micro-units (the [[PageRank]] Scale
  * discipline): sums of BIGINTs, one integral `div` per
  * normalization, so scores are bit-identical at any partitioning and
  * an external oracle replays the rounds as chained CTEs with nothing
  * frozen. Max-normalization (not L2) keeps the fixed point inside
  * integer arithmetic — the relative ORDER of scores, which is what
  * callers consume, matches the classic formulation's. Overflow
  * bound: max(score sum)·Scale must stay under 2⁶³ — Σ over a node's
  * in/out edges of S-scaled scores, safe to ~9·10¹² incident weight
  * per node; beyond that, lower Scale.
  *
  * Scale shape: per round two edge-scan equi-joins against the
  * node-sized score frames (broadcast when they fit — pass
  * `broadcastVectors = false` past broadcast reach, rounds become
  * shuffle joins), two map-side-combined sums, and a 1-row broadcast
  * max — no driver data path, O(rounds) edge scans. */
object Hits {

  /** Micro-unit scale of a unit score. */
  val Scale = 1000000L

  /** `rounds` HITS rounds; returns `(hubs(node, hub),
    * auths(node, auth))` in micro-units (BIGINT), hub keyed by the
    * src universe, auth by the dst universe. */
  def run(edges: DataFrame, rounds: Int,
      broadcastVectors: Boolean = true): (DataFrame, DataFrame) = {
    require(rounds >= 1, "rounds must be >= 1")
    // lazy: round 1's broadcast build materializes the edge list,
    // cached for every later reference — no standalone checkpoint job
    val e = edges.select(col("src"), col("dst"))
      .localCheckpoint(eager = false)
    def bc(df: DataFrame): DataFrame =
      GraphBroadcast.bc(df, broadcastVectors)
    def normalize(scores: DataFrame, c: String): DataFrame =
      scores.crossJoin(broadcast(scores.agg(max(col(c)).as("_m"))))
        .select(col("node"), expr(s"($c * ${Scale}L) div _m").as(c))
        .localCheckpoint(eager = false)
    var h = e.select(col("src").as("node")).distinct()
      .withColumn("hub", lit(Scale)).localCheckpoint(eager = false)
    var a: DataFrame = null
    for (_ <- 1 to rounds) {
      a = normalize(
        e.join(bc(h.withColumnRenamed("node", "src")), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("auth")),
        "auth")
      h = normalize(
        e.join(bc(a.withColumnRenamed("node", "dst")), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum(col("auth")).as("hub")),
        "hub")
    }
    (h, a)
  }
}
