package graft.audit

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.io.TableIO

/** In-memory pipeline metrics collector with parquet persistence and a
  * timing bracket (reference `utils/metrics.py:12-184`: metric dict +
  * Delta save + `@timed` decorator → Scala: mutable map + parquet
  * append + a `timed` higher-order function).
  *
  * Driver-side only — metrics are scalars about the run (row counts,
  * durations, custom gauges), never per-row data.
  */
final class PipelineMetrics(runId: String) {

  private val metrics = mutable.LinkedHashMap.empty[String, Double]

  def set(name: String, value: Double): Unit = metrics(name) = value

  def increment(name: String, by: Double = 1.0): Unit =
    metrics(name) = metrics.getOrElse(name, 0.0) + by

  def get(name: String): Option[Double] = metrics.get(name)

  def all: Map[String, Double] = metrics.toMap

  /** Times `body` and records `<name>_seconds` (the reference's
    * `@timed` decorator). The value is recorded even when `body`
    * throws, so failed stages still report their duration. */
  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally set(s"${name}_seconds", (System.nanoTime() - t0) / 1e9)
  }

  /** Append all collected metrics as (run_id, metric, value, ts) rows. */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val df = metrics.toSeq.map { case (k, v) => (runId, k, v, now) }
      .toDF("run_id", "metric", "value", "recorded_at")
    TableIO.write(df, path, SaveMode.Append)
  }
}

object PipelineMetrics {
  def load(spark: SparkSession, path: String): DataFrame =
    TableIO.read(spark, path)
}
