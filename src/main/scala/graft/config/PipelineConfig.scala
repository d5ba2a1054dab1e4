package graft.config

/** Pipeline configuration.
  *
  * Scala translation of the reference's YAML config surface
  * (`config/config.yaml:1-104` in /root/reference): paths, DQ
  * thresholds, dedup keys, partition columns, sort (Z-ORDER substitute)
  * columns, incremental settings. Plain case classes with defaults —
  * environment overlays are `copy(...)` calls instead of YAML merging.
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
    environment: String = "local"
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
