package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in `graft.queries.*`; this object only
  * aggregates them.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.dailyKpis(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline extensions (dedup / similarity / text). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TrainingData.queries ++
      graft.queries.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.TrainingData.oracles ++
      graft.queries.Analytics.oracles

  /** Data-dependent generated oracles (the trained-ANN search phase
    * and the winnowing fingerprint sets: the model / fingerprint
    * kernel runs in Spark per scale factor, then freezes into the SQL
    * as literals — see graft.queries.{AnnOracles, DedupOracles}).
    * Verify merges these over [[oracleSql]] when dumping
    * oracle_sql.json. */
  def dynamicOracleSql(spark: SparkSession, dir: String): Map[String, String] =
    graft.queries.AnnOracles.dynamic(spark, dir) ++
      graft.queries.DedupOracles.dynamic(spark, dir)
}
