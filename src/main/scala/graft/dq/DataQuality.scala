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
  *   - `runAllChecks` fuses EVERY built-in check (null, range, row
  *     count) into ONE aggregate pass over the table — the reference
  *     loops a filter+count job per check
  *     (`utils/data_quality.py:240-267` + `:283-289`), which is N full
  *     scans of a 100 TB table. Custom checks added via [[addCheck]]
  *     still run their own function; if the fused job fails, every
  *     check falls back to its independent legacy path.
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
  import DataQualityFramework.{Custom, Fusable, Spec}

  private var specs: Vector[Spec] = Vector.empty
  def addCheck(check: DataQualityCheck): Unit = specs :+= Custom(check)
  private def addFusable(check: DataQualityCheck,
      build: DataFrame => Either[String,
        (Seq[org.apache.spark.sql.Column], (Long, Seq[Long]) => Long)]): Unit =
    specs :+= Fusable(check, build)
  def allChecks: Seq[DataQualityCheck] = specs.map(_.check)

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
    addFusable(DataQualityCheck("row_count_check",
      "Validate row count is within expected range", fn, expected, "WARNING"),
      _ => Right((Seq.empty, (total, _) =>
        minRows.count(total < _).toLong + maxRows.count(total > _).toLong)))
  }

  /** Null-percentage checks (reference `utils/data_quality.py:143-183`).
    * All requested columns ride the fused single-pass aggregate of
    * [[runAllChecks]] (each check still reports independently). */
  def addNullCheck(columns: Seq[String], maxNullPct: Double = 0.0): Unit =
    columns.foreach { c =>
      def nullPred(df: DataFrame, actual: String) = {
        val isNumeric = df.schema(actual).dataType match {
          case _: org.apache.spark.sql.types.DoubleType |
               _: org.apache.spark.sql.types.FloatType => true
          case _ => false
        }
        if (isNumeric) col(actual).isNull || isnan(col(actual))
        else col(actual).isNull
      }
      val fn = (df: DataFrame) =>
        Cols.resolve(df, c) match {
          case None =>
            Seq(s"Column $c not found").toDF("violation")
          case Some(actual) =>
            val row = df.agg(
              count(lit(1)).as("total"),
              count(when(nullPred(df, actual), 1)).as("nulls")).head()
            val (total, nulls) = (row.getLong(0), row.getLong(1))
            val pct = if (total == 0) 0.0 else nulls.toDouble / total
            if (pct > maxNullPct)
              Seq(f"Column $c has $pct%.2f null fraction (max allowed: $maxNullPct%.2f)")
                .toDF("violation")
            else spark.emptyDataFrame.select(lit("").as("violation")).limit(0)
        }
      addFusable(DataQualityCheck(s"null_check_$c",
        s"Check null percentage for column $c", fn,
        f"null_pct <= $maxNullPct%.2f",
        if (maxNullPct == 0.0) "ERROR" else "WARNING"),
        df => Cols.resolve(df, c) match {
          case None => Left(s"Column $c not found")
          case Some(actual) =>
            Right((Seq(count(when(nullPred(df, actual), 1))),
              (total, vals) => {
                val pct = if (total == 0) 0.0 else vals.head.toDouble / total
                if (pct > maxNullPct) 1L else 0L
              }))
        })
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
    addFusable(DataQualityCheck(s"range_check_$column",
      s"Check $column is within valid range", fn, expected, "ERROR"),
      df => Cols.resolve(df, column) match {
        case None => Left(s"Column $column not found")
        case Some(actual) =>
          val preds = minVal.map(col(actual) < _).toSeq ++
            maxVal.map(col(actual) > _)
          if (preds.isEmpty) Right((Seq.empty, (_, _) => 0L))
          else Right((Seq(count(when(preds.reduce(_ || _), 1))),
            (_, vals) => vals.head))
      })
  }

  /** Key-uniqueness check: violations = surplus rows beyond one per
    * distinct key tuple (total − countDistinct). Rides the fused
    * single-pass aggregate (Spark plans the distinct via Expand in the
    * same job); the legacy path reports the duplicated key values. */
  def addUniquenessCheck(columns: Seq[String]): Unit = {
    require(columns.nonEmpty, "uniqueness check needs at least one column")
    val label = columns.mkString(",")
    def resolveAll(df: DataFrame): Either[String, Seq[String]] = {
      val rs = columns.map(c => c -> Cols.resolve(df, c))
      rs.collectFirst { case (c, None) => c } match {
        case Some(missing) => Left(s"Column $missing not found")
        case None => Right(rs.map(_._2.get))
      }
    }
    val fn = (df: DataFrame) =>
      resolveAll(df) match {
        case Left(msg) => Seq(msg).toDF("violation")
        case Right(actual) =>
          df.groupBy(actual.map(col): _*)
            .agg(count(lit(1)).as("__n"))
            .filter(col("__n") > 1)
            .select(concat_ws("|",
              (actual.map(col) :+ col("__n")): _*).as("violation"))
      }
    addFusable(DataQualityCheck(s"uniqueness_check_$label",
      s"Check ($label) is unique", fn, "duplicates == 0", "ERROR"),
      df => resolveAll(df).map { actual =>
        (Seq(countDistinct(actual.head, actual.tail: _*)),
          (total: Long, vals: Seq[Long]) => total - vals.head)
      })
  }

  /** Accepted-values check: violations = non-null values outside the
    * allowed set. Rides the fused pass. */
  def addAcceptedValuesCheck(column: String, allowed: Seq[String]): Unit = {
    require(allowed.nonEmpty, "accepted-values check needs a non-empty set")
    def pred(actual: String) =
      col(actual).isNotNull && !col(actual).cast("string").isin(allowed: _*)
    val fn = (df: DataFrame) =>
      Cols.resolve(df, column) match {
        case None => Seq(s"Column $column not found").toDF("violation")
        case Some(actual) =>
          df.filter(pred(actual))
            .select(concat(lit(s"$column="), col(actual).cast("string"))
              .as("violation"))
      }
    addFusable(DataQualityCheck(s"accepted_values_check_$column",
      s"Check $column within {${allowed.mkString(",")}}", fn,
      "violations == 0", "ERROR"),
      df => Cols.resolve(df, column) match {
        case None => Left(s"Column $column not found")
        case Some(actual) =>
          Right((Seq(count(when(pred(actual), 1))),
            (_: Long, vals: Seq[Long]) => vals.head))
      })
  }

  /** Referential-integrity check: violations = rows whose `column`
    * value has no match in `dimension.dimKey` (FK orphans). Needs a
    * join, so it cannot ride the fused aggregate — it runs as its own
    * job with the DIMENSION side broadcast (dimension keys are small
    * next to a 100 TB fact; for fact-sized "dimensions" register a
    * custom check with a shuffle join instead). Null FKs are not
    * violations (use a null check for those). */
  def addReferentialIntegrityCheck(column: String, dimension: DataFrame,
      dimKey: String): Unit = {
    val keys = broadcast(
      dimension.select(col(dimKey).as("__dim_key")).distinct())
    val fn = (df: DataFrame) =>
      Cols.resolve(df, column) match {
        case None => Seq(s"Column $column not found").toDF("violation")
        case Some(actual) =>
          df.filter(col(actual).isNotNull)
            .join(keys, col(actual) === col("__dim_key"), "left_anti")
            .select(concat(lit(s"$column="), col(actual).cast("string"))
              .as("violation"))
      }
    addCheck(DataQualityCheck(s"referential_integrity_check_$column",
      s"Check $column references $dimKey", fn, "orphans == 0", "ERROR"))
  }

  /** Run all checks (reference `utils/data_quality.py:240-267`) — the
    * built-in checks as ONE aggregate job over `df` (the reference runs
    * one filter+count job per check: N full scans at 100 TB), custom
    * checks via their own functions. Results are positionally identical
    * to running each check independently. */
  def runAllChecks(df: DataFrame, layerName: String = "unknown"): Seq[CheckResult] = {
    val built = specs.map {
      case f: Fusable => (f.check, Some(f.build(df)))
      case c: Custom => (c.check, None)
    }
    val plans = built.collect {
      case (check, Some(Right((aggs, interp)))) => (check, aggs, interp)
    }
    // one aggregate row: __total plus each fused check's agg columns
    val fusedRow: Option[(Long, Map[String, Seq[Long]])] =
      if (plans.isEmpty) None
      else try {
        val aggCols = plans.zipWithIndex.flatMap { case ((_, aggs, _), i) =>
          aggs.zipWithIndex.map { case (a, j) => a.cast("long").as(s"__c${i}_$j") }
        }
        val all = count(lit(1)).cast("long").as("__total") +: aggCols
        val row = df.agg(all.head, all.tail: _*).head()
        val total = row.getLong(0)
        var offset = 1
        val values = plans.zipWithIndex.map { case ((check, aggs, _), i) =>
          val vs = aggs.indices.map(j => row.getLong(offset + j))
          offset += aggs.size
          s"${check.name}#$i" -> vs.toSeq
        }.toMap
        Some((total, values))
      } catch {
        // analysis/type failure of the fused plan: fall back to the
        // per-check legacy path below (each run() catches its own errors)
        case _: Exception => None
      }
    var planIdx = -1
    built.map { case (check, builtResult) =>
      val result = builtResult match {
        case None => check.run(df) // custom check: own function
        case Some(Left(msg)) =>
          // unresolved column: same one-violation result the legacy
          // message row produces
          CheckResult(check.name, check.description, 1L,
            check.expectedResult, check.severity, passed = false)
        case Some(Right((_, interp))) =>
          planIdx += 1
          fusedRow match {
            case Some((total, values)) =>
              val v = interp(total, values(s"${check.name}#$planIdx"))
              CheckResult(check.name, check.description, v,
                check.expectedResult, check.severity, passed = v == 0)
            case None => check.run(df) // fused job failed: legacy path
          }
      }
      result.copy(layer = layerName)
    }
  }

  /** Summary stats in ONE pass (reference loops a filter+count per column,
    * `utils/data_quality.py:283-289`). */
  def summaryStats(df: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("total_rows") +:
      df.columns.toSeq.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** K-ANONYMITY CENSUS over a quasi-identifier tuple — the privacy
    * gate a training-data release runs before shipping: any
    * quasi-identifier combination shared by fewer than `k` rows
    * re-identifies its members, so the census reports how much of
    * the table sits in risky groups (the release decision input:
    * suppress, generalize, or pass). One summary row:
    * total groups / risky groups / rows in risky groups / smallest
    * group. Scale shape: one partial-agg shuffle on the quasi tuple
    * (bounded by the quasi-value cross product, not the row count),
    * then a scalar collapse — never a sort, never a join. */
  def kAnonymityCensus(df: DataFrame, quasi: Seq[String],
      k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityCensus needs quasi-identifiers")
    require(k > 0, s"k must be positive, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("n_rows") < k, 1)).as("n_risky_groups"),
        coalesce(sum(when(col("n_rows") < k, col("n_rows"))), lit(0L))
          .as("n_risky_rows"),
        min(col("n_rows")).as("min_group_size"))
  }

  /** L-DIVERSITY census (Machanavajjhala et al. 2007): k-anonymity
    * bounds group SIZE, l-diversity bounds what a group REVEALS —
    * every quasi-identifier group must contain at least `l` distinct
    * values of the sensitive attribute, or membership in the group
    * alone discloses it (the homogeneity attack k-anonymity misses:
    * a 50-person group is 50-anonymous and zero-private if all 50
    * share one diagnosis). One row: total groups, groups below `l`,
    * rows inside them, and the worst observed diversity — the
    * suppress/generalize/release decision input next to
    * [[kAnonymityCensus]]. Exact integer counts; one partial-agg
    * shuffle bounded by the quasi-value cross product (the distinct
    * count shuffles (quasi, sensitive) pairs, still cross-product
    * bounded, never row-bounded). */
  def lDiversityCensus(df: DataFrame, quasi: Seq[String],
      sensitive: String, l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversityCensus needs quasi-identifiers")
    require(l > 0, s"l must be positive, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("n_sens"))
      .agg(count(lit(1)).as("n_groups"),
        count(when(col("n_sens") < l, 1)).as("n_low_div_groups"),
        coalesce(sum(when(col("n_sens") < l, col("n_rows"))), lit(0L))
          .as("n_exposed_rows"),
        min(col("n_sens")).as("min_diversity"))
  }
}

object DataQualityFramework {
  private sealed trait Spec { def check: DataQualityCheck }
  private final case class Custom(check: DataQualityCheck) extends Spec
  /** A check whose violation count can ride a shared aggregate pass:
    * `build` resolves against the concrete DataFrame and yields the
    * aggregate columns to fold in plus an interpreter from
    * (totalRows, aggregate values) to the violation count. */
  private final case class Fusable(check: DataQualityCheck,
      build: DataFrame => Either[String,
        (Seq[org.apache.spark.sql.Column], (Long, Seq[Long]) => Long)])
    extends Spec

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
