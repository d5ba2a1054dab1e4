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
}
