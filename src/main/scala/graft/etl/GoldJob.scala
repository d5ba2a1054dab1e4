package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.PipelineConfig
import graft.io.TableIO
import graft.util.Cols

/** Gold layer: the two grouped-aggregate analytics tables
  * (reference `etl/gold_job.py:40-152`).
  *
  * Both are partial-agg + single-shuffle plans; the output `orderBy` adds
  * one more exchange, kept for parity with the reference's sorted writes
  * (`etl/gold_job.py:92,147`). Aggregate cardinality is tiny (days,
  * days×zones), so the sort is cheap at any input scale.
  */
object GoldJob {

  final case class Result(dailyKpisRows: Long, zoneDemandRows: Long)

  /** A1 (reference `etl/gold_job.py:40-97`): daily KPIs. */
  def createDailyKpis(df: DataFrame): DataFrame = {
    val pickup = Cols.resolve(df, "tpep_pickup_datetime")
      .getOrElse(sys.error("pickup datetime column not found"))
    val withDate =
      if (Cols.has(df, "trip_date")) df
      else df.withColumn("trip_date", to_date(col(pickup)))
    withDate
      .groupBy(col(Cols.resolve(withDate, "trip_date").get))
      .agg(
        count(lit(1)).as("daily_trip_count"),
        round(sum(Cols.resolve(df, "total_amount").map(col)
          .getOrElse(lit(0.0))), 2).as("daily_total_revenue"),
        round(avg(Cols.resolve(df, "trip_distance").map(col)
          .getOrElse(lit(0.0))), 2).as("avg_trip_distance"),
        round(avg(Cols.resolve(df, "passenger_count").map(col)
          .getOrElse(lit(0.0))), 2).as("avg_passenger_count"))
      .orderBy("trip_date")
  }

  /** A2 (reference `etl/gold_job.py:100-152`): zone demand. */
  def createZoneDemand(df: DataFrame): DataFrame = {
    val pickup = Cols.resolve(df, "tpep_pickup_datetime")
      .getOrElse(sys.error("pickup datetime column not found"))
    val zone = Cols.resolve(df, "pulocationid")
      .getOrElse(sys.error("pulocationid column not found"))
    val withDate =
      if (Cols.has(df, "trip_date")) df
      else df.withColumn("trip_date", to_date(col(pickup)))
    withDate
      .groupBy(
        col(Cols.resolve(withDate, "trip_date").get),
        col(zone).as("pu_location_id"))
      .agg(
        count(lit(1)).as("trip_count"),
        round(sum(Cols.resolve(df, "total_amount").map(col)
          .getOrElse(lit(0.0))), 2).as("total_revenue"))
      .orderBy("trip_date", "pu_location_id")
  }

  def run(spark: SparkSession, cfg: PipelineConfig,
      mode: SaveMode = SaveMode.Overwrite): Result = {
    // One silver scan feeds both aggregates; cache to avoid recomputing
    // the scan per output (the reference recomputes — SURVEY.md §3).
    val silver = TableIO.readTable(spark, cfg.paths.silver).cache()
    try {
      val daily = createDailyKpis(silver)
      val zone = createZoneDemand(silver)

      val dailyPart = Option.when(cfg.partitioning.enabled)(
        cfg.partitioning.goldDailyKpisPartitionColumn)
      val zonePart = Option.when(cfg.partitioning.enabled)(
        cfg.partitioning.goldZoneDemandPartitionColumn)
      TableIO.writeTable(spark, daily, cfg.paths.goldDailyKpis, mode,
        dailyPart, cfg.versionedTables)
      TableIO.writeTable(spark, zone, cfg.paths.goldZoneDemand, mode,
        zonePart, cfg.versionedTables)

      Result(
        TableIO.readTable(spark, cfg.paths.goldDailyKpis).count(),
        TableIO.readTable(spark, cfg.paths.goldZoneDemand).count())
    } finally silver.unpersist()
  }
}
