package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable
import graft.sql.GraftSql

/** SQL time travel ([[graft.sql.GraftSql]]): Delta SQL's `VERSION AS
  * OF` / `TIMESTAMP AS OF` clauses resolved against versioned tables
  * inside an ordinary spark.sql statement. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def twoVersions(prefix: String): (VersionedTable, String, String) = {
    val root = Fixtures.tempDir(prefix) + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v")) // v0
    val t0 = vt.history(limit = 1).head.timestamp
    vt.write((11L to 15L).map(k => (k, k * 10L)).toDF("k", "v"),
      SaveMode.Append) // v1
    (vt, root, t0)
  }

  test("VERSION AS OF resolves the historical snapshot; the bare name " +
      "binds current; aliases survive") {
    val (_, root, _) = twoVersions("graft-sql-ver")
    val out = GraftSql.sql(spark,
      """SELECT now.n AS n_now, then.n AS n_then
         FROM (SELECT count(*) AS n FROM t) now
         CROSS JOIN (SELECT count(*) AS n FROM t VERSION AS OF 0 then0) then""",
      Map("t" -> root)).as[(Long, Long)].head()
    assert(out === ((15L, 10L)))
  }

  test("TIMESTAMP AS OF resolves through the commit history and " +
      "equals the version-addressed read") {
    val (_, root, t0) = twoVersions("graft-sql-ts")
    val out = GraftSql.sql(spark,
      s"""SELECT (SELECT count(*) FROM t TIMESTAMP AS OF '$t0') AS by_ts,
                 (SELECT count(*) FROM t VERSION AS OF 0) AS by_v""",
      Map("t" -> root)).as[(Long, Long)].head()
    assert(out._1 === out._2 && out._1 === 10L)
  }

  test("a travel clause on an UNREGISTERED name is left to the SQL " +
      "parser; a missing version fails with the S4 error") {
    val (_, root, _) = twoVersions("graft-sql-err")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT * FROM t VERSION AS OF 99",
        Map("t" -> root))
    }
    assert(e.getMessage.contains("version 99"))
    // names are word-bounded: 'tt' is not rewritten for table 't'
    spark.range(3).toDF("k").createOrReplaceTempView("tt")
    val n = GraftSql.sql(spark,
      "SELECT (SELECT count(*) FROM tt) AS a, (SELECT count(*) FROM t) AS b",
      Map("t" -> root)).as[(Long, Long)].head()
    assert(n === ((3L, 15L)))
  }

  test("table_changes TVF: inclusive version bounds, commit-meta " +
      "columns, end defaults to current") {
    val root = Fixtures.tempDir("graft-sql-tc") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v0
    vt.write(Seq((3L, "c")).toDF("k", "v"), SaveMode.Append) // v1
    val out = GraftSql.sql(spark,
      """SELECT _commit_version, count(*) AS n
         FROM table_changes('t', 0, 1)
         GROUP BY _commit_version ORDER BY _commit_version""",
      Map("t" -> root)).as[(Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 2L), (1L, 1L)))
    val n = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM table_changes('t', 1)",
      Map("t" -> root)).as[Long].head()
    assert(n === 1L)
    // timestamp form: start rounds forward, end rounds back
    val t1 = vt.history(limit = 1).head.timestamp
    val byTs = GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM table_changes('t', '1970-01-01T00:00:00Z', '$t1')",
      Map("t" -> root)).as[Long].head()
    assert(byTs === 3L) // v0's 2 rows + v1's 1
    val open = GraftSql.sql(spark,
      s"SELECT _commit_version FROM table_changes('t', '$t1')",
      Map("t" -> root)).as[Long].collect().toSet
    assert(open === Set(1L)) // from v1's instant to current
  }

  test("travel reads see DV masks and case-insensitive keywords work") {
    val root = Fixtures.tempDir("graft-sql-dv") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v")) // v0
    vt.deleteVectorized("k", 3, 5) // v1
    val out = GraftSql.sql(spark,
      """SELECT (SELECT count(*) FROM t version as of 1) AS masked,
                (SELECT count(*) FROM t version as of 0) AS full""",
      Map("t" -> root)).as[(Long, Long)].head()
    assert(out === ((7L, 10L)))
  }
}
