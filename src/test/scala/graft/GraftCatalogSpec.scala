package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.{GraftCatalog, GraftSql}

/** Warehouse catalog ([[graft.sql.GraftCatalog]]) + its SQL DDL
  * surface: a table named t IS the versioned table at <warehouse>/t,
  * so existence, atomicity, and persistence all ride the versioned
  * commit protocol. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CTAS / SHOW TABLES / name resolution / DROP round-trip; the " +
      "directory IS the catalog so a fresh instance sees everything") {
    val wh = Fixtures.tempDir("graft-catalog") + "/wh"
    val cat = new GraftCatalog(spark, wh)
    assert(cat.tables === Map.empty)
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "tag")
      .createOrReplaceTempView("cat_seed")
    GraftSql.exec(spark, "CREATE TABLE t1 AS SELECT * FROM cat_seed", cat)
    // CTAS resolves earlier CTAS results by bare name
    GraftSql.exec(spark,
      "CREATE TABLE t2 AS SELECT tag, count(*) AS n FROM t1 GROUP BY tag",
      cat)
    assert(cat.tables.keySet === Set("t1", "t2"))
    val show = GraftSql.exec(spark, "SHOW TABLES", cat)
    assert(show.select("name").as[String].collect().toSet ===
      Set("t1", "t2"))
    // DML through the catalog: bare-name DELETE routes to the DV kernel
    GraftSql.exec(spark, "DELETE FROM t1 WHERE tag = 'b'", cat)
    assert(GraftSql.exec(spark, "SELECT count(*) AS n FROM t1", cat)
      .as[Long].head() === 2L)
    // a FRESH catalog instance (a new session tomorrow) sees the same
    val again = new GraftCatalog(spark, wh)
    assert(again.tables.keySet === Set("t1", "t2"))
    // plain CREATE refuses to clobber; OR REPLACE commits a new version
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, "CREATE TABLE t1 AS SELECT * FROM cat_seed", cat)
    }
    GraftSql.exec(spark,
      "CREATE OR REPLACE TABLE t1 AS SELECT * FROM cat_seed", cat)
    assert(GraftSql.exec(spark, "SELECT count(*) AS n FROM t1", cat)
      .as[Long].head() === 3L)
    GraftSql.exec(spark, "DROP TABLE t2", cat)
    assert(cat.tables.keySet === Set("t1"))
    intercept[IllegalArgumentException] { cat.table("t2") }
  }

  test("execScript runs a ;-separated pipeline in order and returns " +
      "the last frame; DESCRIBE DETAIL reads the manifest") {
    val wh = Fixtures.tempDir("graft-catalog-script") + "/wh"
    val cat = new GraftCatalog(spark, wh)
    Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L), (4L, "y", 40L))
      .toDF("k", "tag", "v").createOrReplaceTempView("script_seed")
    val out = GraftSql.execScript(spark,
      """CREATE TABLE f AS SELECT * FROM script_seed;
         DELETE FROM f WHERE tag = 'y' AND v > 25;
         CREATE TABLE g AS
           SELECT tag, CAST(sum(v) AS BIGINT) AS total, count(*) AS n
           FROM f GROUP BY tag;
         SELECT * FROM g ORDER BY tag""", cat)
    assert(out.as[(String, Long, Long)].collect().toSeq ===
      Seq(("x", 40L, 2L), ("y", 20L, 1L)))
    val detail = GraftSql.exec(spark, "DESCRIBE DETAIL f", cat)
    val row = detail.select("version", "numFiles", "numRows",
      "numFilesWithDv").as[(Long, Long, Long, Long)].head()
    assert(row._1 === 1L) // v0 CTAS + v1 DV delete
    assert(row._3 === 3L) // live rows: 4 minus the masked one
    // (no DV-file assertion: a deleted row alone in its part-file
    // drops the whole file from the manifest instead of masking it)
  }

  test("CTAS PARTITIONED BY lays the table out hive-style, so every " +
      "name-resolved read partition-prunes") {
    val wh = Fixtures.tempDir("graft-catalog-part") + "/wh"
    val cat = new GraftCatalog(spark, wh)
    Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "C"))
      .toDF("k", "grp").createOrReplaceTempView("part_seed")
    GraftSql.exec(spark,
      "CREATE TABLE p PARTITIONED BY (grp) AS SELECT * FROM part_seed",
      cat)
    val vt = new graft.io.VersionedTable(spark, cat.rootOf("p"))
    val entries = vt.manifestEntries(vt.currentVersion.get)
    assert(entries.nonEmpty)
    assert(entries.forall(e =>
      e.partitionValues.get("grp").exists(Set("A", "B", "C"))))
    assert(vt.partitionColumns === Seq("grp"))
    assert(GraftSql.exec(spark,
      "SELECT count(*) AS n FROM p WHERE grp = 'A'", cat)
      .as[Long].head() === 2L)
    // partition-scoped OPTIMIZE: only grp=A's files fold; B/C entries
    // are re-referenced untouched
    val before = vt.manifestEntries(vt.currentVersion.get)
      .filterNot(_.partitionValues.get("grp").contains("A"))
      .map(_.relPath).toSet
    GraftSql.exec(spark, "OPTIMIZE p WHERE grp = 'A'", cat)
    val after = vt.manifestEntries(vt.currentVersion.get)
    assert(before.subsetOf(after.map(_.relPath).toSet))
    assert(GraftSql.exec(spark,
      "SELECT count(*) AS n FROM p WHERE grp = 'A'", cat)
      .as[Long].head() === 2L)
  }

  test("ALTER TABLE ... RENAME TO: one directory move — DML works on " +
      "the new name, the full version history (time travel, DV masks) " +
      "survives, the old name is gone, an existing target refuses") {
    val wh = Fixtures.tempDir("graft-catalog-rename") + "/wh"
    val cat = new GraftCatalog(spark, wh)
    (1L to 10L).map(k => (k, k * 100L)).toDF("k", "cents")
      .createOrReplaceTempView("ren_seed")
    GraftSql.exec(spark, "CREATE TABLE old_name AS SELECT * FROM ren_seed",
      cat)
    // a DV delete BEFORE the rename: masks are table-relative and must
    // survive the move
    GraftSql.exec(spark, "DELETE FROM old_name WHERE k <= 2", cat)
    GraftSql.exec(spark, "ALTER TABLE old_name RENAME TO new_name", cat)
    assert(!cat.exists("old_name") && cat.exists("new_name"))
    // DML on the NEW name
    GraftSql.exec(spark, "INSERT INTO new_name VALUES (11, 1100)", cat)
    assert(GraftSql.exec(spark,
      "SELECT count(*) AS n FROM new_name", cat).as[Long].head() === 9L)
    // time travel across the rename boundary: v0 = the 10 seed rows
    assert(GraftSql.exec(spark,
      "SELECT count(*) AS n FROM new_name VERSION AS OF 0", cat)
      .as[Long].head() === 10L)
    // the pre-rename DV mask still applies (v1 = 8 live rows)
    assert(GraftSql.exec(spark,
      "SELECT count(*) AS n FROM new_name VERSION AS OF 1", cat)
      .as[Long].head() === 8L)
    // refusals: unknown source, existing target
    intercept[IllegalArgumentException] {
      cat.renameTable("old_name", "other") }
    GraftSql.exec(spark, "CREATE TABLE blocker AS SELECT 1 AS x", cat)
    val e = intercept[IllegalArgumentException] {
      cat.renameTable("new_name", "blocker") }
    assert(e.getMessage.contains("already exists"))
  }
}
