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

  test("UPDATE auto-refreshes the sidecar: skipping survives the " +
    "rewrite with no manual rebuild") {
    val vt = scattered(4000)
    vt.buildBloomIndex("k")
    // hash-scattered files all span the full range, so the update
    // rewrites every file — the worst case for index staleness
    vt.updateBetween("k", 100.0, 100.0, Map("s" -> lit("updated")))
    val all = vt.manifestEntries(vt.currentVersion.get)
    assert(all.size > 2)
    val planned = vt.bloomPlannedEntries("k", Seq(77L))
    assert(planned.size < all.size,
      s"post-UPDATE lookup must still skip: ${planned.size}/${all.size}")
    assert(vt.readWhereKeyIn("k", Seq(77L)).as[(Long, String)].collect()
      .toSeq === Seq((77L, "v77")))
    assert(vt.readWhereKeyIn("k", Seq(100L)).as[(Long, String)].collect()
      .toSeq === Seq((100L, "updated")))
  }

  test("REORG PURGE refresh also sweeps up post-index appends") {
    val vt = scattered(2000)
    vt.buildBloomIndex("k")
    vt.write(Seq((9001L, "late")).toDF("k", "s"), SaveMode.Append)
    // pre-refresh: the unindexed late file is always planned
    assert(vt.bloomPlannedEntries("k", Seq(1L)).exists(_.rows === 1L))
    vt.deleteVectorized("k", 10.0, 12.0)
    vt.reorgPurge() // rewrites masked files; refresh blooms them + late
    val all = vt.manifestEntries(vt.currentVersion.get)
    val planned = vt.bloomPlannedEntries("k", Seq(1L))
    assert(!planned.exists(_.rows === 1L),
      "the late file has a bloom after the refresh and must be skippable")
    assert(planned.size < all.size)
    assert(vt.readWhereKeyIn("k", Seq(9001L)).count() === 1)
    assert(vt.readWhereKeyIn("k", Seq(11L)).count() === 0, "purged row")
    assert(vt.readWhereKeyIn("k", Seq(42L)).count() === 1)
  }

  test("probe hashing is batched: planning job count is invariant in " +
    "the probe count") {
    val vt = scattered(1000)
    vt.buildBloomIndex("k")
    def jobsFor(probes: Seq[Any]): Int = {
      val sc = spark.sparkContext
      val group = s"bloom-probe-${probes.size}"
      sc.setJobGroup(group, "bloom probe batching pin")
      try vt.bloomPlannedEntries("k", probes)
      finally sc.clearJobGroup()
      // the status store is fed asynchronously — poll to stability
      var last = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while ((cur != last || cur == 0) && spins < 50) {
        Thread.sleep(100); last = cur; spins += 1
        cur = sc.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }
    val few = jobsFor(Seq(1L, 2L))
    val many = jobsFor(1L to 40L)
    assert(few > 0 && few === many,
      s"job count must not grow with probe count: $few vs $many " +
        "(one batched hash job + one sidecar pass)")
  }

  test("planning never deserializes a bloom on the driver (lexical pin)") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/io/VersionedTable.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = src.indexOf("private[graft] def bloomPlannedEntries")
    assert(start > 0)
    val end = src.indexOf("def readWhereKeyIn", start)
    assert(end > start)
    val body = src.substring(start, end)
    assert(body.contains("mapPartitions"),
      "bloom evaluation must run in executors")
    assert(!body.contains("readFrom"),
      "no BloomFilter deserialization in the planning body — executors " +
        "only, via VersionedTable.bloomMightContainAny")
  }

  test("renaming the indexed column degrades lookups SAFELY: the " +
    "sidecar is keyed by the old name, so the new name plans all " +
    "files — extra I/O, never wrong rows") {
    val vt = scattered(400)
    vt.buildBloomIndex("k")
    assert(vt.bloomPlannedEntries("k", Seq(7L)).size < 8)
    vt.renameColumn("k", "key")
    assert(vt.bloomPlannedEntries("key", Seq(7L)).size === 8,
      "no sidecar under the new logical name -> conservative full plan")
    assert(vt.readWhereKeyIn("key", Seq(7L)).count() === 1)
    // rebuilding under the new name restores skipping
    vt.buildBloomIndex("key")
    assert(vt.bloomPlannedEntries("key", Seq(7L)).size < 8)
    assert(vt.readWhereKeyIn("key", Seq(7L)).count() === 1)
  }

  test("vacuum drops superseded bloom sidecars; lookups unaffected") {
    val root = Fixtures.tempDir("bloomvac") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write((1L to 2000L).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(8, col("k")))
    vt.buildBloomIndex("k")
    vt.updateBetween("k", 5.0, 5.0, Map("s" -> lit("x"))) // 2nd sidecar
    val bloomRoot = new java.io.File(root, "_bloom")
    assert(bloomRoot.listFiles().count(_.getName.startsWith("v")) === 2)
    vt.vacuum(retainVersions = 10, orphanGraceMs = 0L)
    assert(bloomRoot.listFiles().count(_.getName.startsWith("v")) === 1,
      "only the newest sidecar per column survives a vacuum")
    val all = vt.manifestEntries(vt.currentVersion.get)
    assert(vt.bloomPlannedEntries("k", Seq(77L)).size < all.size)
    assert(vt.readWhereKeyIn("k", Seq(77L)).count() === 1)
  }
}
