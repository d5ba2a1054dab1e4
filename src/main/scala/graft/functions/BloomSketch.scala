package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over Spark's own sketch expressions
  * (`BloomFilterAggregate` / `might_contain` — the pair Catalyst's
  * runtime row-filtering injects; public API since Spark 3.3's
  * `spark.sql.optimizer.runtime.bloomFilter`). The 100 TB use:
  * a membership set too big to broadcast as a hash set (10^8 benchmark
  * n-grams ≈ GBs of strings) compresses to an ~n·10 BIT filter that
  * ships inside the plan, turning "join corpus against the set" into a
  * NARROW map-side prefilter; only the tiny surviving fraction pays
  * the exact verification join. False positives are then removed by
  * that exact join, so end-to-end results stay exact.
  *
  * Both sides hash with `XxHash64` at Spark's default seed, the same
  * pairing `InjectRuntimeFilter` generates. */
object BloomSketch {

  /** Aggregate `df[c]` into one serialized Bloom filter (driver-side
    * bytes — ~`1.2 * expectedItems * log2(1/fpp) / 8` bytes, e.g.
    * ~120 MB for 10^8 items at 1% fpp; plan-literal scale, like the
    * ANN codebooks). One distributed pass, partial-merged per
    * partition.
    *
    * `BloomFilterAggregate` silently clamps its sizing to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4M items / ~8 MB) — the fpp would
    * silently degrade past that. We raise both confs to the requested
    * size for the duration of the (eager) aggregation and restore
    * them after, so the scaladoc sizing actually materializes. */
  def build(df: DataFrame, c: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) = (conf.get(itemsKey), conf.get(bitsKey))
    conf.set(itemsKey, math.max(prevItems.toLong, expectedItems))
    conf.set(bitsKey, math.max(prevBits.toLong, numBits))
    try df.agg(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    finally { conf.set(itemsKey, prevItems); conf.set(bitsKey, prevBits) }
  }

  /** Probe: may `c` be in the set `bloom` was built from? No false
    * negatives; false positives at ~the build fpp. Codegen'd, narrow,
    * and constant-folded against the literal filter bytes. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(c)))))
}
