package graft.util

import org.apache.spark.sql.DataFrame

/** Input-spreading for CPU-heavy narrow stages.
  *
  * A small parquet table arrives as ONE split, which pins every per-row
  * transformation downstream of it (tokenization, hashing, signature
  * computation) to a single core. At real scale inputs already have
  * many splits and this is a no-op — the partition count check makes
  * the repartition strictly conditional, so a 100 TB table is never
  * gratuitously shuffled.
  */
object Spread {

  /** Round-robin repartition up to the cluster's default parallelism,
    * only when the input has fewer partitions than that.
    * `queryExecution.toRdd` reads the physical plan's partitioning
    * without building the row-deserializing `df.rdd` wrapper. */
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = df.queryExecution.toRdd.getNumPartitions
    if (current < target) df.repartition(target) else df
  }
}
