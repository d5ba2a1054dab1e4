package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.config.PipelineConfig
import graft.etl.{BronzeJob, GoldJob, SilverJob}
import graft.io.TableIO

/** Full Bronze→Silver→Gold round trip on the taxi fixture (shape of
  * reference `tests/integration/test_pipeline.py:10-127`). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val cfg: PipelineConfig = {
    val base = Fixtures.tempDir("graft-pipeline")
    // Reference test config disables fail-on-DQ (`tests/conftest.py:88`) —
    // the fixture deliberately contains a null-pickup row for silver to drop.
    val c = PipelineConfig().under(base) match {
      case p => p.copy(dataQuality = p.dataQuality.copy(failOnDqErrors = false))
    }
    Fixtures.writeRawCsv(spark, c.paths.raw)
    c
  }

  test("file-driven config: non-default threshold changes silver output, no recompile") {
    val base = Fixtures.tempDir("graft-cfgfile")
    val confDir = new java.io.File(base, "conf"); confDir.mkdirs()
    // base file raises the trip-distance floor past the 2.5-mile rows;
    // env overlay flips fail_on_dq_errors off (dev-style config)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(confDir.toString, "config.properties"),
      "data_quality.min_trip_distance=2.6\n")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(confDir.toString, "dev.properties"),
      "data_quality.fail_on_dq_errors=false\n")
    val c = PipelineConfig.load(confDir.toString, env = Some("dev"),
      base = PipelineConfig().under(base))
    assert(c.dataQuality.minTripDistance === 2.6) // from config.properties
    assert(!c.dataQuality.failOnDqErrors)         // from dev.properties
    assert(c.environment === "dev")
    Fixtures.writeRawCsv(spark, c.paths.raw)
    BronzeJob.run(spark, c)
    val res = SilverJob.run(spark, c)
    // default config keeps 3 deduped rows; the 2.6-mile floor drops the
    // duplicated 2.5-mile pair and the 1.2-mile row too -> 2 remain
    assert(res.rowsAfterDedup === 2,
      s"threshold from file must tighten the silver filter: $res")
  }

  test("versioned storage mode: each run commits a version per layer") {
    val base = Fixtures.tempDir("graft-pipeline-vt")
    val c = PipelineConfig().under(base).copy(
      dataQuality = PipelineConfig().dataQuality.copy(failOnDqErrors = false),
      versionedTables = true)
    Fixtures.writeRawCsv(spark, c.paths.raw)
    BronzeJob.run(spark, c)
    val silver1 = SilverJob.run(spark, c)
    GoldJob.run(spark, c)
    // every layer is now a versioned table at v0 with history
    val vtSilver = new graft.io.VersionedTable(spark, c.paths.silver)
    assert(vtSilver.currentVersion === Some(0L))
    assert(vtSilver.history().nonEmpty)
    // a second run commits v1; time travel reaches the first snapshot
    SilverJob.run(spark, c)
    assert(vtSilver.currentVersion === Some(1L))
    assert(vtSilver.readVersion(0).count() === silver1.rowsAfterDedup)
    // reads are transparent: gold consumed the versioned silver above
    val gold = new graft.io.VersionedTable(spark, c.paths.goldDailyKpis)
    assert(gold.exists && gold.read().count() > 0)
    // the storage.versioned_tables config key drives the same switch
    val viaProps = PipelineConfig.fromProperties(
      Map("storage.versioned_tables" -> "true"))
    assert(viaProps.versionedTables)
  }

  test("config: unknown keys fail fast") {
    intercept[RuntimeException] {
      PipelineConfig.fromProperties(Map("data_quality.min_trip_dstance" -> "1"))
    }
  }

  test("CLI arg parser: valueless flags cannot shift key/value pairing") {
    val opts = Pipeline.parseArgs(
      Array("--base", "/x", "--use-dag", "--job", "gold", "--no-fail-on-dq"))
    assert(opts === Map("base" -> "/x", "use-dag" -> "true",
      "job" -> "gold", "no-fail-on-dq" -> "true"))
    intercept[RuntimeException] {
      Pipeline.parseArgs(Array("--base")) // key without value
    }
  }

  test("bronze: ingests all rows, adds metadata + partition column") {
    val res = BronzeJob.run(spark, cfg)
    assert(res.rowsIngested === 6)
    assert(res.rowsWritten === 6)
    val bronze = TableIO.read(spark, cfg.paths.bronze)
    assert(bronze.columns.contains("ingestion_ts"))
    assert(bronze.columns.contains("source_file"))
    assert(bronze.columns.contains("trip_date"))
  }

  test("silver: filters invalid rows and removes the duplicate") {
    BronzeJob.run(spark, cfg)
    val res = SilverJob.run(spark, cfg)
    assert(res.rowsIn === 6)
    // zero-distance and null-pickup rows are filtered
    assert(res.rowsAfterFilter === 4)
    // the fabricated duplicate collapses
    assert(res.rowsAfterDedup === 3)
    val silver = TableIO.read(spark, cfg.paths.silver)
    assert(silver.schema("tpep_pickup_datetime").dataType.typeName === "timestamp")
    assert(silver.columns.forall(c => c == c.toLowerCase))
  }

  test("gold: daily kpis + zone demand with expected columns and counts") {
    BronzeJob.run(spark, cfg)
    SilverJob.run(spark, cfg)
    val res = GoldJob.run(spark, cfg)
    assert(res.dailyKpisRows === 2) // 2 distinct trip dates survive
    val daily = TableIO.read(spark, cfg.paths.goldDailyKpis)
    assert(daily.columns.toSet === Set("trip_date", "daily_trip_count",
      "daily_total_revenue", "avg_trip_distance", "avg_passenger_count"))
    // row-count monotonicity: sum(daily_trip_count) == silver rows
    val total = daily.agg(sum("daily_trip_count")).head.getLong(0)
    val silverCount = TableIO.read(spark, cfg.paths.silver).count()
    assert(total === silverCount)
    val zone = TableIO.read(spark, cfg.paths.goldZoneDemand)
    assert(zone.columns.toSet === Set("trip_date", "pu_location_id",
      "trip_count", "total_revenue"))
    assert(zone.count() >= res.dailyKpisRows)
  }

  test("silver write is partitioned by trip_date (hive-style dirs)") {
    BronzeJob.run(spark, cfg)
    SilverJob.run(spark, cfg)
    val dirs = new java.io.File(cfg.paths.silver).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("trip_date=")), dirs.mkString(", "))
  }
}
