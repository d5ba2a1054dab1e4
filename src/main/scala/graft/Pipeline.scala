package graft

import org.apache.spark.sql.SparkSession
import graft.audit.{Audit, PipelineMetrics, RunRecord}
import graft.config.PipelineConfig
import graft.etl.{BronzeJob, GoldJob, SilverJob}
import graft.orchestration.{Dag, Task}

/** Pipeline CLI — the analog of the reference's `main.py` entry points
  * (`main.py:53-152`: `--job bronze|silver|gold|all [--use-dag]
  * [--env dev|prod]`).
  *
  * Usage:
  *   runMain graft.Pipeline --base /tmp/lake [--job all] [--use-dag]
  *     [--config <dir>] [--env <name>]
  *
  * `--config <dir>` loads `<dir>/config.properties` overlaid by
  * `<dir>/<env>.properties` (env from `--env` or `$GRAFT_ENV` /
  * `$ENVIRONMENT`) on top of the `--base`-rooted defaults — the
  * file-driven retuning surface of reference `main.py:17-48` +
  * `config/{config,dev,prod}.yaml`.
  *
  * Runs the medallion jobs against `<base>/data/raw` CSVs, records one
  * audit row and a metrics set per run, and (with --use-dag) drives the
  * three jobs through the toposort orchestrator with one retry each,
  * exactly as reference `orchestration/tasks.py:25-58` wires it.
  */
object Pipeline {

  /** Options that take no value. */
  private val flagNames = Set("use-dag", "no-fail-on-dq", "versioned")

  /** Token-consuming parser: a flag eats one token, a --key eats two —
    * so a valueless flag before a key/value pair cannot shift the
    * pairing (the old sliding(2,2) parsed `--use-dag --job gold` as
    * use-dag -> "--job" and silently dropped the job). */
  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case k :: tail if k.startsWith("--") =>
          val name = k.drop(2)
          if (flagNames(name)) loop(tail, acc + (name -> "true"))
          else tail match {
            case v :: t2 if !v.startsWith("--") => loop(t2, acc + (name -> v))
            case _ => sys.error(s"missing value for --$name")
          }
        case other :: _ => sys.error(s"unexpected argument: $other")
      }
    loop(args.toList, Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val base = opts.getOrElse("base",
      sys.error("--base <dir> is required (lakehouse root)"))
    val job = opts.getOrElse("job", "all")
    val useDag = opts.contains("use-dag")

    val spark = graft.core.Sessions.local("graft-pipeline",
      cores = Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    // defaults rooted at --base, then the config-file + env overlay
    val cfg0 = opts.get("config") match {
      case Some(dir) =>
        PipelineConfig.load(dir, opts.get("env"),
          base = PipelineConfig().under(base))
      case None => PipelineConfig().under(base)
    }
    // --no-fail-on-dq: keep going past ERROR-severity DQ findings
    // (reference config.data_quality.fail_on_dq_errors toggle)
    val cfg1 = if (opts.contains("no-fail-on-dq"))
      cfg0.copy(dataQuality = cfg0.dataQuality.copy(failOnDqErrors = false))
    else cfg0
    // --versioned: store each layer as a manifest-log versioned table
    // (every run commits a version; Maintain history/restore/optimize
    // and VersionedTable time travel apply to the layer paths)
    val cfg = if (opts.contains("versioned"))
      cfg1.copy(versionedTables = true)
    else cfg1
    val runId = Audit.generateRunId()
    val metrics = new PipelineMetrics(runId)
    val t0 = System.currentTimeMillis()
    var status = "completed"
    // structured run log (reference setup_logging + log_with_metrics);
    // GRAFT_LOG_JSON=false falls back to the plain console format
    val log = graft.util.JsonLog.setup("graft_pipeline",
      logLevel = sys.env.getOrElse("GRAFT_LOG_LEVEL", "INFO"),
      useJson = sys.env.get("GRAFT_LOG_JSON").forall(_.toBoolean))
    try {
      if (useDag) runDag(spark, cfg, metrics)
      else runSequential(spark, cfg, job, metrics)
    } catch {
      case e: Exception =>
        status = "failed"
        log.error("pipeline failed", e, "run_id" -> runId, "job" -> job)
    } finally {
      val t1 = System.currentTimeMillis()
      Audit.recordRun(spark, cfg.paths.pipelineRuns, RunRecord(
        runId, job, status,
        metrics.get("bronze_rows").map(_.toLong).getOrElse(0L),
        metrics.get("gold_rows").map(_.toLong).getOrElse(0L),
        new java.sql.Timestamp(t0), new java.sql.Timestamp(t1),
        (t1 - t0) / 1000.0, ""))
      metrics.save(spark, cfg.paths.pipelineMetrics)
      log.logWithMetrics("info", "pipeline run complete",
        Map("run_id" -> runId, "job" -> job, "status" -> status,
          "duration_sec" -> (t1 - t0) / 1000.0) ++ metrics.all)
      spark.stop()
      if (status == "failed") sys.exit(1)
    }
  }

  private def runSequential(spark: SparkSession, cfg: PipelineConfig,
      job: String, m: PipelineMetrics): Unit = {
    val doAll = job == "all"
    if (doAll || job == "bronze") m.timed("bronze") {
      val r = BronzeJob.run(spark, cfg)
      m.set("bronze_rows", r.rowsWritten.toDouble)
    }
    if (doAll || job == "silver") m.timed("silver") {
      val r = SilverJob.run(spark, cfg)
      m.set("silver_rows", r.rowsAfterDedup.toDouble)
    }
    if (doAll || job == "gold") m.timed("gold") {
      val r = GoldJob.run(spark, cfg)
      m.set("gold_rows", (r.dailyKpisRows + r.zoneDemandRows).toDouble)
    }
  }

  /** Entry point 2 of the reference: bronze→silver→gold as DAG tasks
    * with dependencies and one retry each. */
  private def runDag(spark: SparkSession, cfg: PipelineConfig,
      m: PipelineMetrics): Unit = {
    val dag = new Dag("nyc-taxi-pipeline", "bronze -> silver -> gold")
    dag.addTask(new Task("bronze",
      () => m.timed("bronze") {
        val r = BronzeJob.run(spark, cfg); m.set("bronze_rows", r.rowsWritten.toDouble); r
      }, retries = 1))
    dag.addTask(new Task("silver",
      () => m.timed("silver") {
        val r = SilverJob.run(spark, cfg); m.set("silver_rows", r.rowsAfterDedup.toDouble); r
      }, dependencies = Seq("bronze"), retries = 1))
    dag.addTask(new Task("gold",
      () => m.timed("gold") {
        val r = GoldJob.run(spark, cfg)
        m.set("gold_rows", (r.dailyKpisRows + r.zoneDemandRows).toDouble); r
      }, dependencies = Seq("silver"), retries = 1))
    val summary = dag.execute()
    if (summary.status != "success")
      sys.error(s"DAG failed: ${summary.taskResults.view.mapValues(_.status).toMap}")
  }
}
