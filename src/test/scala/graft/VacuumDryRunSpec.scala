package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable

/** VACUUM DRY RUN == the live pass (the no-drift pin the dry run's
  * contract depends on), and RESTORE TO TIMESTAMP resolution. */
class VacuumDryRunSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  import scala.jdk.CollectionConverters._

  private def parquetFiles(root: String): Set[String] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) return Set.empty
    val s = Files.walk(p)
    try s.iterator().asScala
      .filter(f => f.toString.endsWith(".parquet"))
      .map(f => p.relativize(f).toString).toSet
    finally s.close()
  }

  test("dry run reports EXACTLY what the live vacuum then deletes; " +
    "the dry run itself deletes nothing") {
    val root = Fixtures.tempDir("vacdry") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write((0L until 200L).map(i => (i, s"v$i")).toDF("id", "v")) // v0
    vt.write((0L until 50L).map(i => (i, s"w$i")).toDF("id", "v")) // v1 ow
    vt.write((50L until 80L).map(i => (i, s"x$i")).toDF("id", "v"),
      SaveMode.Append) // v2
    val before = parquetFiles(root)
    val (dropDry, filesDry) = vt.vacuumDryRun(retainVersions = 1,
      orphanGraceMs = 0L)
    assert(parquetFiles(root) === before, "dry run must not delete")
    assert(filesDry.nonEmpty && dropDry.nonEmpty)
    val dropped = vt.vacuum(retainVersions = 1, orphanGraceMs = 0L)
    val after = parquetFiles(root)
    assert(dropped === dropDry)
    assert((before -- after).filter(_.startsWith("_data")) ===
      filesDry.toSet, "dry-run file report must equal the live deletion")
    assert(vt.read().count() === 80)
  }

  test("restoreToTimestamp rolls back to the version live at that " +
    "instant; reads and history match restore-by-number semantics") {
    val root = Fixtures.tempDir("restots") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v0
    val ts0 = vt.history(limit = 10).find(_.version == 0L).get.timestamp
    Thread.sleep(15) // distinct commit timestamps
    vt.write(Seq((9L, "z")).toDF("id", "v")) // v1 overwrite
    assert(vt.read().count() === 1)
    vt.restoreToTimestamp(ts0)
    assert(vt.read().collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L))
    intercept[RuntimeException] {
      vt.restoreToTimestamp("2000-01-01T00:00:00Z") // predates the table
    }
  }
}
