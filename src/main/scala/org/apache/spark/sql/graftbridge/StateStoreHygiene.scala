package org.apache.spark.sql.graftbridge

/** Bench/test hygiene for stateful streaming: unload every loaded
  * state-store provider. A long measuring session accumulates loaded
  * providers (a stream-stream join alone loads partitions × 4 stores),
  * and the maintenance machinery iterates all of them — so late
  * streaming queries pay the earlier ones' residue instead of their
  * own cost. Same isolation rationale as `clearCache()` between
  * measured queries. Lives in the bridge package because `StateStore`
  * is `private[sql]`-adjacent. Production streams never need this —
  * a real query's providers unload through its own lifecycle. */
object StateStoreHygiene {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
