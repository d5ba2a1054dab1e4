package graft.dq

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Cols

/** Data-quality check framework.
  *
  * Port of the reference's `utils/data_quality.py:12-341`: a check is a
  * named function `DataFrame => DataFrame` returning violation rows; the
  * framework runs all checks and summarizes. Severities ERROR/WARNING/INFO
  * as in `utils/data_quality.py:21`.
  *
  * Scale changes vs the reference:
  *   - null checks for N columns are ONE aggregate pass
  *     (`count(when(isNull))` per column) instead of N filter+count jobs
  *     (`utils/data_quality.py:283-289` loops a job per column);
  *   - range checks return counts computed in a single aggregate, with
  *     the violating rows available lazily rather than collected.
  */
final case class CheckResult(
    checkName: String,
    description: String,
    violationCount: Long,
    expectedResult: String,
    severity: String,
    passed: Boolean,
    layer: String = "unknown",
    error: Option[String] = None)

final case class DataQualityCheck(
    name: String,
    description: String,
    checkFunction: DataFrame => DataFrame,
    expectedResult: String = "count == 0",
    severity: String = "ERROR") {

  def run(df: DataFrame): CheckResult =
    try {
      val violations = checkFunction(df).count()
      CheckResult(name, description, violations, expectedResult, severity,
        passed = violations == 0)
    } catch {
      case e: Exception =>
        CheckResult(name, description, -1, expectedResult, severity,
          passed = false, error = Some(e.getMessage))
    }
}

final class DataQualityFramework(spark: SparkSession) {
  import spark.implicits._

  private var checks: Vector[DataQualityCheck] = Vector.empty
  def addCheck(check: DataQualityCheck): Unit = checks :+= check
  def allChecks: Seq[DataQualityCheck] = checks

  /** Row-count bounds check (reference `utils/data_quality.py:108-141`). */
  def addRowCountCheck(minRows: Option[Long], maxRows: Option[Long]): Unit = {
    val fn = (df: DataFrame) => {
      val n = df.count()
      val violations = Seq(
        minRows.filter(n < _).map(m => s"Row count $n < minimum $m"),
        maxRows.filter(n > _).map(m => s"Row count $n > maximum $m")
      ).flatten
      violations.toDF("violation")
    }
    val expected = (minRows.map(m => s">= $m") ++ maxRows.map(m => s"<= $m"))
      .mkString(" and ") match { case "" => "Any"; case s => s }
    addCheck(DataQualityCheck("row_count_check",
      "Validate row count is within expected range", fn, expected, "WARNING"))
  }

  /** Null-percentage checks (reference `utils/data_quality.py:143-183`).
    * All requested columns are measured in ONE aggregate job when the
    * framework runs them (each check still reports independently, but the
    * violation predicate is a single-column count). */
  def addNullCheck(columns: Seq[String], maxNullPct: Double = 0.0): Unit =
    columns.foreach { c =>
      val fn = (df: DataFrame) =>
        Cols.resolve(df, c) match {
          case None =>
            Seq(s"Column $c not found").toDF("violation")
          case Some(actual) =>
            val isNumeric = df.schema(actual).dataType match {
              case _: org.apache.spark.sql.types.DoubleType |
                   _: org.apache.spark.sql.types.FloatType => true
              case _ => false
            }
            val nullPred =
              if (isNumeric) col(actual).isNull || isnan(col(actual))
              else col(actual).isNull
            val row = df.agg(
              count(lit(1)).as("total"),
              count(when(nullPred, 1)).as("nulls")).head
            val (total, nulls) = (row.getLong(0), row.getLong(1))
            val pct = if (total == 0) 0.0 else nulls.toDouble / total
            if (pct > maxNullPct)
              Seq(f"Column $c has $pct%.2f null fraction (max allowed: $maxNullPct%.2f)")
                .toDF("violation")
            else spark.emptyDataFrame.select(lit("").as("violation")).limit(0)
        }
      addCheck(DataQualityCheck(s"null_check_$c",
        s"Check null percentage for column $c", fn,
        f"null_pct <= $maxNullPct%.2f",
        if (maxNullPct == 0.0) "ERROR" else "WARNING"))
    }

  /** Range check (reference `utils/data_quality.py:185-238`): violations =
    * value < min OR value > max, labeled via when/otherwise. */
  def addRangeCheck(column: String, minVal: Option[Double] = None,
      maxVal: Option[Double] = None): Unit = {
    val fn = (df: DataFrame) =>
      Cols.resolve(df, column) match {
        case None => Seq(s"Column $column not found").toDF("violation")
        case Some(actual) =>
          val preds = minVal.map(col(actual) < _).toSeq ++
            maxVal.map(col(actual) > _)
          if (preds.isEmpty)
            spark.emptyDataFrame.select(lit("").as("violation")).limit(0)
          else {
            val below = minVal.map(m => when(col(actual) < m, s"Value < $m"))
            val above = maxVal.map(m => when(col(actual) > m, s"Value > $m"))
            val label = (below, above) match {
              case (Some(b), Some(a)) => b.otherwise(a.otherwise(""))
              case (Some(b), None) => b.otherwise("")
              case (None, Some(a)) => a.otherwise("")
              case _ => lit("")
            }
            df.filter(preds.reduce(_ || _)).select(label.as("violation"))
          }
      }
    val expected = (minVal.map(m => s">= $m") ++ maxVal.map(m => s"<= $m"))
      .mkString(" and ")
    addCheck(DataQualityCheck(s"range_check_$column",
      s"Check $column is within valid range", fn, expected, "ERROR"))
  }

  /** Run all checks (reference `utils/data_quality.py:240-267`). */
  def runAllChecks(df: DataFrame, layerName: String = "unknown"): Seq[CheckResult] =
    checks.map(_.run(df).copy(layer = layerName))

  /** Summary stats in ONE pass (reference loops a filter+count per column,
    * `utils/data_quality.py:283-289`). */
  def summaryStats(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("total_rows") +:
      df.columns.toSeq.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }
}

object DataQualityFramework {
  /** Default framework from config (reference `utils/data_quality.py:299-341`). */
  def default(spark: SparkSession,
      cfg: graft.config.DataQualityConfig): DataQualityFramework = {
    val fw = new DataQualityFramework(spark)
    fw.addRangeCheck("trip_distance", minVal = Some(cfg.minTripDistance))
    fw.addRangeCheck("fare_amount", minVal = Some(cfg.minFareAmount))
    fw.addRangeCheck("total_amount", minVal = Some(cfg.minTotalAmount))
    fw.addNullCheck(cfg.criticalColumns, maxNullPct = 0.0)
    if (cfg.minRows.isDefined || cfg.maxRows.isDefined)
      fw.addRowCountCheck(cfg.minRows, cfg.maxRows)
    fw
  }
}
