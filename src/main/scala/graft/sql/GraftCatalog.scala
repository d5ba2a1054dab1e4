package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.VersionedTable

/** Name → table catalog over a WAREHOUSE directory — the metastore a
  * Delta user gets from Hive/Unity, reduced to its essence so the SQL
  * surface ([[GraftSql.exec]]) can resolve bare table names without
  * the caller passing a map. A table named `t` IS the versioned table
  * at `<warehouse>/t`: existence is "the root has a current version",
  * so there is no separate catalog file to corrupt, keep in sync, or
  * lock — creation atomicity is the versioned commit protocol's
  * (concurrent CREATEs race on v0's manifest rename; exactly one
  * wins), and a half-written table simply does not exist yet.
  *
  * Scale: `tables` is one directory listing + one tiny manifest-HEAD
  * probe per entry, all driver-side; nothing here touches data. */
final class GraftCatalog(val spark: SparkSession, val warehouse: String) {

  private val nameRe = "[A-Za-z_][A-Za-z0-9_]*"

  def rootOf(name: String): String = {
    require(name.matches(nameRe), s"bad table name: $name")
    s"${warehouse.stripSuffix("/")}/$name"
  }

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(name: String): Boolean =
    new VersionedTable(spark, rootOf(name)).currentVersion.isDefined

  /** Every name with a committed current version, name → root. */
  def tables: Map[String, String] = {
    val dir = new Path(warehouse)
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.matches(nameRe) && exists(n))
      .map(n => n -> rootOf(n))
      .toMap
  }

  /** CREATE TABLE name AS df — fails if the table exists unless
    * `orReplace`; optional hive-style layout via `partitionBy`
    * (partition pruning then applies to every name-resolved read).
    * Returns the committed version. */
  def createTable(name: String, df: DataFrame,
      orReplace: Boolean = false,
      partitionBy: Option[Seq[String]] = None): Long = {
    if (!orReplace) require(!exists(name),
      s"table $name already exists in $warehouse")
    require(!isView(name),
      s"$name is a view in $warehouse — DROP VIEW it first")
    new VersionedTable(spark, rootOf(name)).write(df,
      partitionBy = partitionBy)
  }

  /** CREATE TABLE name (declared schema) — an EMPTY v0 the first
    * INSERT needs no inference for. */
  def createTableEmpty(name: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionBy: Seq[String] = Seq.empty): Long = {
    require(!exists(name), s"table $name already exists in $warehouse")
    require(!isView(name),
      s"$name is a view in $warehouse — DROP VIEW it first")
    new VersionedTable(spark, rootOf(name)).createEmpty(schema,
      partitionBy)
  }

  // ------------------------------------------------------------ views

  private def viewDefPath(name: String): Path =
    new Path(rootOf(name), "_view_def.txt")

  /** Is `name` a persisted LOGICAL view (a definition sidecar with no
    * versioned table)? */
  def isView(name: String): Boolean =
    name.matches(nameRe) && fs.exists(viewDefPath(name))

  /** Every persisted view name. */
  def views: Seq[String] = {
    val dir = new Path(warehouse)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.matches(nameRe) && isView(n)).sorted
  }

  /** CREATE [OR REPLACE] VIEW — persist the defining query text (the
    * MV tier's sidecar pattern, minus the backing table): a named
    * query, expanded at resolution time, always reflecting the
    * CURRENT base tables. Refuses names that are tables. */
  def createView(name: String, selectSql: String,
      orReplace: Boolean = false): Unit = {
    require(!exists(name),
      s"$name is a table in $warehouse — a view cannot shadow it")
    if (!orReplace) require(!isView(name),
      s"view $name already exists in $warehouse (use OR REPLACE)")
    val p = viewDefPath(name)
    val out = fs.create(p, true)
    try out.write(selectSql.getBytes("UTF-8")) finally out.close()
  }

  /** The persisted defining query of a view. */
  def viewSql(name: String): String = {
    require(isView(name), s"view $name does not exist in $warehouse")
    val in = fs.open(viewDefPath(name))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** DROP VIEW — removes the definition (and its holder directory). */
  def dropView(name: String): Unit = {
    require(isView(name), s"view $name does not exist in $warehouse")
    fs.delete(new Path(rootOf(name)), true)
  }

  def table(name: String): DataFrame = {
    require(exists(name), s"table $name does not exist in $warehouse")
    new VersionedTable(spark, rootOf(name)).read()
  }

  /** DROP TABLE — removes the table's entire root (every version;
    * this is the catalog's `PURGE`, there is no soft drop). */
  def dropTable(name: String): Unit = {
    require(exists(name), s"table $name does not exist in $warehouse")
    // an MV's backing table leaving through the PLAIN route must not
    // strand its rewrite registration (matching is file-set-gated so a
    // dangling entry stays correct, but it is a leak)
    MaterializedView.deregisterRoot(rootOf(name))
    fs.delete(new Path(rootOf(name)), true)
  }

  /** ALTER TABLE … RENAME TO — one directory move, zero data IO and
    * zero manifest rewrites: every manifest entry, DV-chain link, and
    * history line is TABLE-RELATIVE by construction, so the whole
    * version history (time travel included) survives under the new
    * name. The blue/green idiom: build `t_new`, verify, rename `t` →
    * `t_old` and `t_new` → `t` — both renames are metadata-instant.
    * Refuses when the target DIRECTORY exists at all (even a
    * half-written non-table: colliding roots would interleave two
    * tables' commits). Caveat (Delta shares it): a SHALLOW clone
    * addresses its source by absolute path, so renaming a clone's
    * SOURCE strands the clone. */
  def renameTable(from: String, to: String): Unit = {
    require(exists(from), s"table $from does not exist in $warehouse")
    val target = new Path(rootOf(to)) // rootOf validates the name
    require(!fs.exists(target),
      s"rename target $to already exists in $warehouse")
    require(fs.rename(new Path(rootOf(from)), target),
      s"filesystem rename $from -> $to failed")
    // a renamed MV re-keys its rewrite registration onto the new root
    MaterializedView.deregisterRoot(rootOf(from))
    if (MaterializedView.isMaterializedView(this, to))
      MaterializedView.rearm(this, to)
  }
}
