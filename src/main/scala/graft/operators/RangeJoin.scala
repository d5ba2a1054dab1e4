package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join on a shared key.
  *
  * The naive formulation — `l.key = r.key AND l.ts BETWEEN r.start AND
  * r.end` — gives Catalyst one equi-conjunct and a range residual; with
  * hot keys the per-key workload is still |points|×|intervals|, and
  * with no equi-conjunct at all it degenerates to a nested-loop join.
  * The scale-stable shape is BUCKETIZATION: pick a bucket width ≥ the
  * longest interval, so every interval covers at most two buckets;
  * explode intervals into their covered buckets, map each point to its
  * single bucket, equi-join on (key, bucket), and keep the exact
  * BETWEEN as a post-filter. Each qualifying pair meets in EXACTLY one
  * bucket (the point's), so no dedup stage is needed. The join is a
  * plain hash/sort-merge equi-join — shuffle partitioned by
  * (key, bucket), which also breaks hot keys across buckets.
  */
object RangeJoin {

  /** @param bucketWidthSec must be ≥ the longest interval length;
    *                       narrower buckets spread hot keys further,
    *                       wider ones admit more false candidates to
    *                       the post-filter. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val widthUs = bucketWidthSec * 1000000L
    val p = points.withColumn("_bucket",
      floor(unix_micros(col(tsCol)) / widthUs))
    val i = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / widthUs),
        floor(unix_micros(col(endCol)) / widthUs))))
    p.join(i, Seq(keyCol, "_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** INTERVAL-OVERLAP join on a shared key: pairs (a, b) with
    * `a.start < b.end AND b.start < a.end` (half-open overlap) — the
    * sessions×incidents / meetings×outages shape, strictly harder
    * than [[pointInInterval]] because BOTH sides are ranges and a
    * pair can share many buckets.
    *
    * Same bucketization, plus the CANONICAL-BUCKET trick instead of a
    * dedup shuffle: both interval sets explode into their covered
    * buckets, the equi-join runs on (key, bucket), and a qualifying
    * pair is EMITTED ONLY in the bucket containing the overlap's
    * start (`greatest(a.start, b.start)`'s bucket) — each pair
    * qualifies in exactly one bucket, so the output needs no
    * `distinct()`. Start/end column names must differ between the two
    * frames. At 100 TB: one shuffle on (key, bucket); bucket width
    * trades explode fan-out against post-filter selectivity exactly
    * as in [[pointInInterval]]. */
  def intervalOverlap(a: DataFrame, b: DataFrame, keyCol: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val widthUs = bucketWidthSec * 1000000L
    def buckets(s: String, e: String) = sequence(
      floor(unix_micros(col(s)) / widthUs),
      floor(unix_micros(col(e)) / widthUs))
    val ae = a.withColumn("_bucket", explode(buckets(aStart, aEnd)))
    val be = b.withColumn("_bucket", explode(buckets(bStart, bEnd)))
    ae.join(be, Seq(keyCol, "_bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("_bucket") ===
        floor(unix_micros(greatest(col(aStart), col(bStart))) / widthUs))
      .drop("_bucket")
  }
}
