package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The node-vector broadcast contract's SESSION escape hatch: every
  * iterative graph operator force-broadcasts its node-sized frames
  * into the edge scan (checkpointed frames carry the upstream
  * estimate, so AQE never broadcasts on its own — see
  * [[PageRank.run]]), and each takes a `broadcastVectors` parameter
  * for node sets past broadcast reach. Registered query paths call
  * the operators with the default, so on a part-graph whose node set
  * exceeds the 8 GB / 512M-row broadcast cap the parameter alone is
  * unreachable — `spark.graft.graph.broadcastVectors=false` turns
  * every vector broadcast into identity (rounds degrade to shuffle
  * joins, still never a driver data path) WITHOUT a code change.
  * A size-threshold guard was considered and rejected: sizing a
  * checkpointed frame costs a count job per round, which is the
  * exact per-round fixed cost these loops shed this round. */
object GraphBroadcast {
  def bc(df: DataFrame, param: Boolean): DataFrame =
    if (param && df.sparkSession.conf
        .get("spark.graft.graph.broadcastVectors", "true").toBoolean)
      broadcast(df)
    else df
}
