package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.VersionedTable

/** Per-file bloom index: point-lookup file skipping with one-sided
  * error — files may be read for nothing, never skipped wrongly.
  * Pins the skip count on hash-scattered keys (where min/max stats
  * prune NOTHING), the no-false-negative property over every key,
  * and the conservative fallback for unindexed (post-build) files. */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scattered(n: Int): VersionedTable = {
    val vt = new VersionedTable(spark,
      Fixtures.tempDir("bloom") + "/tbl")
    // hash-scatter into 8 files: every file spans the full key range,
    // so range stats are useless and only the bloom can skip
    vt.write((1L to n.toLong).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(8, col("k")))
    vt
  }

  test("single-key lookup opens ~1 of 8 files; rows are exact") {
    val vt = scattered(4000)
    vt.buildBloomIndex("k")
    val all = vt.manifestEntries(vt.currentVersion.get)
    assert(all.size === 8)
    val planned = vt.bloomPlannedEntries("k", Seq(77L))
    assert(planned.size < all.size,
      s"bloom must skip files: planned ${planned.size} of ${all.size}")
    assert(vt.readWhereKeyIn("k", Seq(77L)).as[(Long, String)].collect()
      .toSeq === Seq((77L, "v77")))
  }

  test("no false negatives across every key") {
    val vt = scattered(500)
    vt.buildBloomIndex("k")
    // every key must be found — a bloom that loses a key would return
    // zero rows here
    val found = (1L to 500L).count(k =>
      vt.bloomPlannedEntries("k", Seq(k)).nonEmpty)
    assert(found === 500)
    // spot-check full read equality on a multi-key probe
    val keys = Seq(3L, 250L, 499L, 9999L) // 9999 absent
    assert(vt.readWhereKeyIn("k", keys).count() === 3)
  }

  test("files appended after the build are always read") {
    val vt = scattered(100)
    vt.buildBloomIndex("k")
    vt.write(Seq((1000L, "late")).toDF("k", "s"), SaveMode.Append)
    val planned = vt.bloomPlannedEntries("k", Seq(1000L))
    assert(planned.exists(_.rows === 1L),
      "the unindexed late file must be planned")
    assert(vt.readWhereKeyIn("k", Seq(1000L)).count() === 1)
  }

  test("no index -> plain filtered read of all files") {
    val vt = scattered(100)
    assert(vt.bloomPlannedEntries("k", Seq(5L)).size === 8)
    assert(vt.readWhereKeyIn("k", Seq(5L)).count() === 1)
  }
}
