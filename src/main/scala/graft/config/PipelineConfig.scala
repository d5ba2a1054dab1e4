package graft.config

/** Pipeline configuration.
  *
  * Scala translation of the reference's YAML config surface
  * (`config/config.yaml:1-104` in /root/reference): paths, DQ
  * thresholds, dedup keys, partition columns, sort (Z-ORDER substitute)
  * columns, incremental settings. Plain case classes with defaults;
  * [[PipelineConfig.load]] overlays `.properties` files with
  * environment selection (`config/{dev,prod}.yaml` + `ENVIRONMENT`
  * analog of reference `main.py:17-48`) so every threshold, path,
  * dedup key and partition column is retunable without a recompile.
  */
final case class Paths(
    raw: String = "data/raw",
    bronze: String = "lakehouse/bronze/yellow_taxi_bronze",
    silver: String = "lakehouse/silver/yellow_taxi_silver",
    goldDailyKpis: String = "lakehouse/gold/daily_kpis",
    goldZoneDemand: String = "lakehouse/gold/zone_demand",
    dqMetrics: String = "lakehouse/metadata/dq_metrics",
    pipelineRuns: String = "lakehouse/metadata/pipeline_runs",
    pipelineMetrics: String = "lakehouse/metadata/pipeline_metrics"
)

final case class DataQualityConfig(
    minTripDistance: Double = 0.0,
    minFareAmount: Double = 0.0,
    minTotalAmount: Double = 0.0,
    criticalColumns: Seq[String] =
      Seq("tpep_pickup_datetime", "tpep_dropoff_datetime"),
    minRows: Option[Long] = None,
    maxRows: Option[Long] = None,
    enableSchemaValidation: Boolean = true,
    failOnDqErrors: Boolean = true
)

final case class DedupConfig(
    dedupColumns: Seq[String] = Seq(
      "tpep_pickup_datetime", "tpep_dropoff_datetime",
      "vendorid", "total_amount")
)

final case class PartitioningConfig(
    enabled: Boolean = true,
    bronzePartitionColumn: String = "trip_date",
    silverPartitionColumn: String = "trip_date",
    goldDailyKpisPartitionColumn: String = "trip_date",
    goldZoneDemandPartitionColumn: String = "trip_date"
)

/** Z-ORDER substitute: columns to range-sort on before write so parquet
  * row-group min/max stats give data skipping (reference
  * `config/config.yaml:74-88`). */
final case class OptimizationConfig(
    optimizeAfterWrite: Boolean = false,
    bronzeSortColumns: Seq[String] = Seq("pulocationid", "vendorid"),
    silverSortColumns: Seq[String] = Seq("pulocationid", "trip_date"),
    goldDailyKpisSortColumns: Seq[String] = Seq("trip_date"),
    goldZoneDemandSortColumns: Seq[String] = Seq("trip_date", "pu_location_id")
)

final case class IncrementalConfig(
    enabled: Boolean = false,
    watermarkColumn: String = "tpep_pickup_datetime",
    initialLoadDate: Option[String] = None
)

final case class PipelineConfig(
    paths: Paths = Paths(),
    appName: String = "NYC_Taxi_Lakehouse_ETL",
    dataQuality: DataQualityConfig = DataQualityConfig(),
    dedup: DedupConfig = DedupConfig(),
    partitioning: PartitioningConfig = PartitioningConfig(),
    optimization: OptimizationConfig = OptimizationConfig(),
    incremental: IncrementalConfig = IncrementalConfig(),
    environment: String = "local",
    /** Store bronze/silver/gold as manifest-log versioned tables (every
      * run commits a version with history/time travel) instead of plain
      * parquet dirs — the Delta-parity storage mode. */
    versionedTables: Boolean = false
) {
  /** Re-root all table paths under a base directory (tests, envs). */
  def under(base: String): PipelineConfig = copy(paths = Paths(
    raw = s"$base/raw",
    bronze = s"$base/bronze/yellow_taxi_bronze",
    silver = s"$base/silver/yellow_taxi_silver",
    goldDailyKpis = s"$base/gold/daily_kpis",
    goldZoneDemand = s"$base/gold/zone_demand",
    dqMetrics = s"$base/metadata/dq_metrics",
    pipelineRuns = s"$base/metadata/pipeline_runs",
    pipelineMetrics = s"$base/metadata/pipeline_metrics"))
}

object PipelineConfig {

  /** Load configuration from `<configDir>/config.properties`, then — when
    * an environment is selected via `env`, `$GRAFT_ENV`, or
    * `$ENVIRONMENT` — overlay `<configDir>/<env>.properties` key by key
    * (reference `main.py:17-48` with `config/{config,dev,prod}.yaml`).
    * Missing files are skipped (defaults/base win), mirroring the
    * reference's fall-back-to-base behavior. Keys are dotted snake_case
    * mirroring the YAML tree, e.g. `data_quality.min_trip_distance=0.5`,
    * `dedup.columns=a,b,c`, `paths.bronze=/lake/bronze`. */
  def load(configDir: String, env: Option[String] = None,
      base: PipelineConfig = PipelineConfig()): PipelineConfig = {
    val effEnv = env.orElse(sys.env.get("GRAFT_ENV"))
      .orElse(sys.env.get("ENVIRONMENT"))
    def overlayFile(c: PipelineConfig, f: java.io.File): PipelineConfig =
      if (f.isFile) fromProperties(readProps(f), c) else c
    val cfg0 = overlayFile(base, new java.io.File(configDir, "config.properties"))
    effEnv.foldLeft(cfg0) { (c, e) =>
      overlayFile(c, new java.io.File(configDir, s"$e.properties"))
        .copy(environment = e)
    }
  }

  private def readProps(f: java.io.File): Map[String, String] = {
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(f)
    try p.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    p.asScala.toMap
  }

  private def seq(v: String): Seq[String] =
    v.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Apply flat dotted-key properties onto a base config. Unknown keys
    * fail fast — a typo'd threshold silently keeping its default is the
    * worst failure mode a config system can have. */
  def fromProperties(kv: Map[String, String],
      base: PipelineConfig = PipelineConfig()): PipelineConfig =
    kv.toSeq.sortBy(_._1).foldLeft(base) { case (c, (k, v)) =>
      k match {
        case "app_name" => c.copy(appName = v)
        case "environment" => c.copy(environment = v)
        case "paths.raw" => c.copy(paths = c.paths.copy(raw = v))
        case "paths.bronze" => c.copy(paths = c.paths.copy(bronze = v))
        case "paths.silver" => c.copy(paths = c.paths.copy(silver = v))
        case "paths.gold_daily_kpis" =>
          c.copy(paths = c.paths.copy(goldDailyKpis = v))
        case "paths.gold_zone_demand" =>
          c.copy(paths = c.paths.copy(goldZoneDemand = v))
        case "paths.dq_metrics" => c.copy(paths = c.paths.copy(dqMetrics = v))
        case "paths.pipeline_runs" =>
          c.copy(paths = c.paths.copy(pipelineRuns = v))
        case "paths.pipeline_metrics" =>
          c.copy(paths = c.paths.copy(pipelineMetrics = v))
        case "data_quality.min_trip_distance" =>
          c.copy(dataQuality = c.dataQuality.copy(minTripDistance = v.toDouble))
        case "data_quality.min_fare_amount" =>
          c.copy(dataQuality = c.dataQuality.copy(minFareAmount = v.toDouble))
        case "data_quality.min_total_amount" =>
          c.copy(dataQuality = c.dataQuality.copy(minTotalAmount = v.toDouble))
        case "data_quality.critical_columns" =>
          c.copy(dataQuality = c.dataQuality.copy(criticalColumns = seq(v)))
        case "data_quality.min_rows" =>
          c.copy(dataQuality = c.dataQuality.copy(minRows = Some(v.toLong)))
        case "data_quality.max_rows" =>
          c.copy(dataQuality = c.dataQuality.copy(maxRows = Some(v.toLong)))
        case "data_quality.enable_schema_validation" =>
          c.copy(dataQuality =
            c.dataQuality.copy(enableSchemaValidation = v.toBoolean))
        case "data_quality.fail_on_dq_errors" =>
          c.copy(dataQuality = c.dataQuality.copy(failOnDqErrors = v.toBoolean))
        case "dedup.columns" => c.copy(dedup = DedupConfig(seq(v)))
        case "partitioning.enabled" =>
          c.copy(partitioning = c.partitioning.copy(enabled = v.toBoolean))
        case "partitioning.bronze_partition_column" =>
          c.copy(partitioning = c.partitioning.copy(bronzePartitionColumn = v))
        case "partitioning.silver_partition_column" =>
          c.copy(partitioning = c.partitioning.copy(silverPartitionColumn = v))
        case "partitioning.gold_daily_kpis_partition_column" =>
          c.copy(partitioning =
            c.partitioning.copy(goldDailyKpisPartitionColumn = v))
        case "partitioning.gold_zone_demand_partition_column" =>
          c.copy(partitioning =
            c.partitioning.copy(goldZoneDemandPartitionColumn = v))
        case "optimization.optimize_after_write" =>
          c.copy(optimization =
            c.optimization.copy(optimizeAfterWrite = v.toBoolean))
        case "optimization.bronze_sort_columns" =>
          c.copy(optimization = c.optimization.copy(bronzeSortColumns = seq(v)))
        case "optimization.silver_sort_columns" =>
          c.copy(optimization = c.optimization.copy(silverSortColumns = seq(v)))
        case "optimization.gold_daily_kpis_sort_columns" =>
          c.copy(optimization =
            c.optimization.copy(goldDailyKpisSortColumns = seq(v)))
        case "optimization.gold_zone_demand_sort_columns" =>
          c.copy(optimization =
            c.optimization.copy(goldZoneDemandSortColumns = seq(v)))
        case "storage.versioned_tables" =>
          c.copy(versionedTables = v.toBoolean)
        case "incremental.enabled" =>
          c.copy(incremental = c.incremental.copy(enabled = v.toBoolean))
        case "incremental.watermark_column" =>
          c.copy(incremental = c.incremental.copy(watermarkColumn = v))
        case "incremental.initial_load_date" =>
          c.copy(incremental = c.incremental.copy(initialLoadDate = Some(v)))
        case other => sys.error(s"unknown config key: $other")
      }
    }
}
