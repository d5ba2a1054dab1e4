package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.audit.{Audit, DqMetrics, RunRecord}
import graft.dq.CheckResult

/** Audit log + DQ-metrics persistence round-trips (reference
  * `utils/audit.py`, `etl/dq_metrics.py`). */
class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(id: String, job: String, status: String,
      startMs: Long): RunRecord =
    RunRecord(id, job, status, 100L, 90L,
      new Timestamp(startMs), new Timestamp(startMs + 5000), 5.0, "")

  test("run records round-trip; recent/failed/lineage queries") {
    val dir = Files.createTempDirectory("audit").toString + "/runs"
    Audit.recordRun(spark, dir, rec("r1", "bronze", "completed", 1000))
    Audit.recordRun(spark, dir, rec("r1", "silver", "completed", 6000))
    Audit.recordRun(spark, dir, rec("r2", "bronze", "failed", 9000))

    val recent = Audit.recentRuns(spark, dir, 2).collect()
    assert(recent.length === 2)
    assert(recent.head.getAs[String]("run_id") === "r2",
      "newest run first")

    val failed = Audit.failedRuns(spark, dir).collect()
    assert(failed.map(_.getAs[String]("run_id")).toSeq === Seq("r2"))

    val lin = Audit.lineage(spark, dir, "r1").collect()
    assert(lin.map(_.getAs[String]("job_name")).toSeq ===
      Seq("bronze", "silver"), "lineage ordered by start_time")
  }

  test("dq metrics: latest-run selection and pass rates") {
    val dir = Files.createTempDirectory("dqm").toString + "/metrics"
    def results(pass: Boolean) = Seq(
      CheckResult("row_count", "rows in bounds", if (pass) 0 else 7,
        "0 violations", "ERROR", pass, "silver"))
    DqMetrics.save(spark, dir, "runA", results(pass = false))
    Thread.sleep(5) // distinct run_timestamp for the latest-run sort
    DqMetrics.save(spark, dir, "runB", results(pass = true))

    val latest = DqMetrics.latestRun(spark, dir).collect()
    assert(latest.nonEmpty)
    assert(latest.forall(_.getAs[String]("run_id") === "runB"))

    val rates = DqMetrics.passRates(spark, dir).collect()
    assert(rates.length === 1)
    assert(rates.head.getAs[Double]("pass_rate") === 0.5)
    assert(rates.head.getAs[Double]("avg_violations") === 3.5)
  }
  test("pipeline metrics: timing bracket, counters, parquet round-trip") {
    val m = new graft.audit.PipelineMetrics("runX")
    val out = m.timed("gold_job") { m.increment("rows_written", 42); "done" }
    assert(out === "done")
    assert(m.get("gold_job_seconds").exists(_ >= 0.0))
    assert(m.get("rows_written").contains(42.0))
    intercept[RuntimeException] {
      m.timed("broken") { throw new RuntimeException("boom") }
    }
    assert(m.get("broken_seconds").isDefined, "failed stage still timed")

    val dir = java.nio.file.Files.createTempDirectory("pm").toString + "/metrics"
    m.save(spark, dir)
    val rows = graft.audit.PipelineMetrics.load(spark, dir).collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[String]("run_id") === "runX"))
  }

}
