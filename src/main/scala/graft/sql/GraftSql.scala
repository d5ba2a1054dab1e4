package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANSI SQL entry point over VERSIONED tables, with TIME TRAVEL
  * clauses (Delta SQL's `SELECT ... FROM tbl VERSION AS OF n` /
  * `FROM tbl TIMESTAMP AS OF 'ts'`, which delta-spark wires through
  * its catalog): a small pre-parse resolves each travel clause
  * against [[graft.io.VersionedTable]] — the historical snapshot is
  * registered as a temp view planned from ITS OWN manifest (zero
  * data movement, the ordinary S4 read) and the clause text rewrites
  * to that view name — then the query runs through `spark.sql`
  * unchanged. Aliases and the rest of the statement are untouched,
  * so the SAME SQL string a Delta user runs works here modulo
  * nothing.
  *
  * Scope: travel clauses are recognized on the registered table
  * names only (word-bounded, case-insensitive keywords), the
  * pragmatic subset Spark's parser cannot natively resolve; a
  * registered name WITHOUT a clause binds to the current snapshot.
  * Versions/timestamps are validated by the underlying reads (a
  * missing version fails with the S4 error, not a parse error).
  *
  * Scale: each view is a manifest-planned scan — partition pruning,
  * stats skipping, and DV masks all apply exactly as the API read;
  * the rewrite itself is O(|SQL|) driver-side string work. */
object GraftSql {

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"

  /** Run `query`, resolving `VERSION AS OF` / `TIMESTAMP AS OF`
    * clauses on the table names in `versionedTables` (name → table
    * root). Every registered name is also bound (current snapshot)
    * for clause-free references. */
  def sql(spark: SparkSession, query: String,
      versionedTables: Map[String, String]): DataFrame = {
    var q = query
    versionedTables.foreach { case (name, root) =>
      require(name.matches(ident), s"table name must be an identifier: $name")
      val vt = new graft.io.VersionedTable(spark, root)
      val verRe = ("(?i)\\b" + java.util.regex.Pattern.quote(name) +
        "\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)").r
      q = verRe.replaceAllIn(q, m => {
        val v = m.group(1).toLong
        val view = s"${name}__v$v"
        vt.readVersion(v).createOrReplaceTempView(view)
        view
      })
      val tsRe = ("(?i)\\b" + java.util.regex.Pattern.quote(name) +
        "\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'").r
      q = tsRe.replaceAllIn(q, m => {
        val ts = m.group(1)
        val view = s"${name}__ts${ts.replaceAll("[^0-9]", "")}"
        vt.readAsOf(ts).createOrReplaceTempView(view)
        view
      })
      // table_changes('t', from[, to]) — Databricks SQL's CDF TVF:
      // INCLUSIVE version bounds, rows carry _change_type +
      // _commit_version + _commit_timestamp; `to` defaults to current
      val tcRe = ("(?i)\\btable_changes\\s*\\(\\s*'" +
        java.util.regex.Pattern.quote(name) +
        "'\\s*,\\s*(\\d+)\\s*(?:,\\s*(\\d+)\\s*)?\\)").r
      q = tcRe.replaceAllIn(q, m => {
        val from = m.group(1).toLong
        val to = Option(m.group(2)).map(_.toLong)
          .getOrElse(vt.currentVersion.getOrElse(sys.error(
            s"table $root does not exist")))
        val view = s"${name}__changes_${from}_$to"
        vt.changesWithMeta(from - 1, to).createOrReplaceTempView(view)
        view
      })
      // timestamp form: table_changes('t', 'fromTs'[, 'toTs']) — the
      // start rounds FORWARD, the end BACK (Delta's inclusive rule);
      // `toTs` defaults to "now" = the newest commit
      val tcTsRe = ("(?i)\\btable_changes\\s*\\(\\s*'" +
        java.util.regex.Pattern.quote(name) +
        "'\\s*,\\s*'([^']+)'\\s*(?:,\\s*'([^']+)'\\s*)?\\)").r
      q = tcTsRe.replaceAllIn(q, m => {
        val fromTs = m.group(1)
        val view = s"${name}__changes_ts" +
          (fromTs + Option(m.group(2)).getOrElse(""))
            .replaceAll("[^0-9]", "")
        val feed = Option(m.group(2)) match {
          case Some(toTs) =>
            vt.changesBetweenTimestampsWithMeta(fromTs, toTs)
          case None =>
            val fromV = vt.firstVersionAtOrAfter(fromTs).getOrElse(
              sys.error(s"no commit of $root at or after $fromTs"))
            vt.changesWithMeta(fromV - 1, vt.currentVersion.get)
        }
        feed.createOrReplaceTempView(view)
        view
      })
      vt.read().createOrReplaceTempView(name)
    }
    spark.sql(q)
  }
}
