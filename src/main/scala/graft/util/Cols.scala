package graft.util

import org.apache.spark.sql.DataFrame

/** Case-insensitive column resolution.
  *
  * The reference resolves columns by lowercase match everywhere
  * (`etl/silver_job.py:56-57,82`, `etl/gold_job.py:66-72,121-128`);
  * implementing it once avoids silent divergence on mixed-case inputs
  * (SURVEY.md §7.3.3).
  */
object Cols {

  /** The actual column name in `df` matching `name` case-insensitively. */
  def resolve(df: DataFrame, name: String): Option[String] =
    df.columns.find(_.equalsIgnoreCase(name))

  /** Resolve several; unmatched names are dropped (reference behavior:
    * dedup/filter silently skip absent columns). */
  def resolveAll(df: DataFrame, names: Seq[String]): Seq[String] =
    names.flatMap(resolve(df, _))

  def has(df: DataFrame, name: String): Boolean = resolve(df, name).isDefined
}
