package graft.audit

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.TableIO

/** Pipeline run audit log (reference `utils/audit.py:13-226`).
  *
  * One row per pipeline run in a parquet-backed `pipeline_runs` table:
  * run_id, job, status, row counts, timing. Queries over it (latest runs,
  * failed runs, lineage by run_id) are ordinary DataFrame ops.
  */
final case class RunRecord(
    run_id: String,
    job_name: String,
    status: String,
    rows_in: Long,
    rows_out: Long,
    start_time: java.sql.Timestamp,
    end_time: java.sql.Timestamp,
    duration_seconds: Double,
    error: String)

object Audit {

  def generateRunId(): String =
    java.util.UUID.randomUUID().toString.take(8) + "-" +
      System.currentTimeMillis()

  def recordRun(spark: SparkSession, path: String, rec: RunRecord): Unit = {
    import spark.implicits._
    TableIO.write(Seq(rec).toDF(), path, SaveMode.Append)
  }

  /** O3 (reference `utils/audit.py:170`): latest runs, newest first. */
  def recentRuns(spark: SparkSession, path: String, limit: Int = 20): DataFrame =
    TableIO.read(spark, path).orderBy(col("start_time").desc).limit(limit)

  /** F4/F6 (reference `docs/runbook.md:98,115`): failed runs. */
  def failedRuns(spark: SparkSession, path: String): DataFrame =
    TableIO.read(spark, path).filter("status = 'failed'")

  /** Lineage: every record for one run (reference `utils/audit.py:177-226`). */
  def lineage(spark: SparkSession, path: String, runId: String): DataFrame =
    TableIO.read(spark, path).filter(col("run_id") === runId)
      .orderBy("start_time")
}

/** DQ metrics persistence (reference `etl/dq_metrics.py:12-154`). */
object DqMetrics {

  def save(spark: SparkSession, path: String, runId: String,
      results: Seq[graft.dq.CheckResult]): Unit = {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val df = results.map(r => (runId, now, r.checkName, r.description,
      r.violationCount, r.expectedResult, r.severity, r.passed, r.layer))
      .toDF("run_id", "run_timestamp", "check_name", "description",
        "violation_count", "expected_result", "severity", "passed", "layer")
    TableIO.write(df, path, SaveMode.Append)
  }

  /** O2 (reference `etl/dq_metrics.py:128-143`): latest run's results. */
  def latestRun(spark: SparkSession, path: String): DataFrame = {
    val metrics = TableIO.read(spark, path)
    val latest = metrics.select("run_id", "run_timestamp").distinct()
      .orderBy(col("run_timestamp").desc).limit(1)
      .select("run_id")
    metrics.join(broadcast(latest), Seq("run_id"))
  }

  /** A8 (reference `docs/runbook.md:250-253`): pass-rate monitoring. */
  def passRates(spark: SparkSession, path: String): DataFrame =
    TableIO.read(spark, path)
      .groupBy("check_name", "layer")
      .agg(
        avg(col("passed").cast("double")).as("pass_rate"),
        avg(col("violation_count")).as("avg_violations"))
}
