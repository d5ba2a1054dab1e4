package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation via `Aggregator` — the partial-merge UDAF
  * extension surface (`org.apache.spark.sql.expressions.Aggregator`):
  * Spark plans it as a real two-phase aggregate (map-side `reduce`
  * into the buffer, exchange of BUFFERS, reducer-side `merge`), so a
  * custom statistic costs one shuffle of O(groups) buffer rows like
  * any built-in.
  *
  * The statistic here is the exact integer-micro-unit summary
  * (n, sum, min, max): values arrive pre-scaled to LONG micro-units
  * (the repo's float-discipline convention — `round(x·1e6)` agrees
  * bit-for-bit across engines), so reduce/merge are pure integer
  * arithmetic and the result is ORDER-INDEPENDENT — the property a
  * double-summing UDAF cannot have and the reason it can sit under a
  * cross-engine hash oracle (q167). */
object TypedAggregators {

  final case class MicroStats(n: Long, sum: Long, min: Long, max: Long)

  val microStats: Aggregator[Long, MicroStats, MicroStats] =
    new Aggregator[Long, MicroStats, MicroStats] {
      override def zero: MicroStats =
        MicroStats(0L, 0L, Long.MaxValue, Long.MinValue)
      override def reduce(b: MicroStats, v: Long): MicroStats =
        MicroStats(b.n + 1, b.sum + v, math.min(b.min, v), math.max(b.max, v))
      override def merge(a: MicroStats, b: MicroStats): MicroStats =
        MicroStats(a.n + b.n, a.sum + b.sum,
          math.min(a.min, b.min), math.max(a.max, b.max))
      override def finish(r: MicroStats): MicroStats = r
      override def bufferEncoder: Encoder[MicroStats] =
        Encoders.product[MicroStats]
      override def outputEncoder: Encoder[MicroStats] =
        Encoders.product[MicroStats]
    }
}
