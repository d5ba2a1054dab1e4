package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable

/** COPY INTO: exactly-once file-level ingest — idempotent re-runs, new
  * files load once, crashed intents (ledger without commit) re-load. */
class CopyIntoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stage(dir: String, name: String, rows: Seq[(Long, String)])
      : Unit =
    rows.toDF("id", "v").coalesce(1).write.parquet(s"$dir/$name")

  test("idempotent re-runs; new files load exactly once") {
    val src = Fixtures.tempDir("copyinto-src")
    val root = Fixtures.tempDir("copyinto") + "/tbl"
    stage(src, "a", (0L until 10L).map(i => (i, s"a$i")))
    stage(src, "b", (10L until 20L).map(i => (i, s"b$i")))
    val vt = new VersionedTable(spark, root)
    val v1 = vt.copyInto(src)
    assert(vt.read().count() === 20)
    val v2 = vt.copyInto(src) // nothing new -> no commit, no dup rows
    assert(v2 === v1)
    assert(vt.read().count() === 20)
    stage(src, "c", (20L until 25L).map(i => (i, s"c$i")))
    val v3 = vt.copyInto(src) // only the new file loads
    assert(v3 === v1 + 1)
    assert(vt.read().count() === 25)
    assert(vt.read().select("id").distinct().count() === 25,
      "a re-run must never double-load a file")
  }

  test("crashed intent (ledger entry without a confirming commit) " +
    "stays eligible: the next run loads the file") {
    val src = Fixtures.tempDir("copyinto2-src")
    val root = Fixtures.tempDir("copyinto2") + "/tbl"
    stage(src, "a", (0L until 5L).map(i => (i, s"a$i")))
    val vt = new VersionedTable(spark, root)
    vt.copyInto(src)
    stage(src, "b", (5L until 9L).map(i => (i, s"b$i")))
    // simulate the crash window: an intent ledger entry whose token
    // never reached the history
    val orphan = spark.read.parquet(s"$src/b")
      .inputFiles.toSeq.toDF("file")
      .withColumn("token", lit("dead-beef"))
    orphan.coalesce(1).write.mode("append").parquet(s"$root/_copy_ledger")
    vt.copyInto(src) // must treat b as NOT ingested
    assert(vt.read().count() === 9)
    assert(vt.read().select("id").distinct().count() === 9)
  }
}
