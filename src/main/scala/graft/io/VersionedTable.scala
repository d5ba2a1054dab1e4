package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.charset.StandardCharsets

/** Versioned Parquet table: the time-travel substitute for Delta's log
  * (SURVEY.md §2.10 M3-M5, §2.1 S4; reference `utils/delta_ops.py`).
  *
  * Layout:
  * {{{
  *   <root>/_versions/v00000000/  ... parquet files
  *   <root>/_versions/v00000001/
  *   <root>/_latest               // text: current version number
  *   <root>/_history.jsonl        // one line per commit
  * }}}
  *
  * Each write is a new immutable version directory plus an atomic pointer
  * swap (`_latest` rename), giving snapshot-isolated readers — the same
  * contract Delta's JSON log provides, minus concurrent writers (the
  * reference is a single-writer pipeline; `orchestration/dag.py` runs
  * jobs sequentially).
  */
final class VersionedTable(spark: SparkSession, root: String) {
  private val rootPath = new Path(root)
  private val fs = TableIO.fs(spark, rootPath)
  private def versionDir(v: Long) = new Path(root, f"_versions/v$v%08d")
  private val latestPath = new Path(root, "_latest")
  private val historyDir = new Path(root, "_history")
  private val legacyHistoryPath = new Path(root, "_history.jsonl")

  def currentVersion: Option[Long] =
    if (fs.exists(latestPath)) {
      val in = fs.open(latestPath)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    } else
      // Recovery: a lost `_latest` (crash mid-swap on a filesystem
      // without overwrite-rename) must not reset the table to version 0
      // — the next write would overwrite v00000000, or Append would
      // union with nothing and silently drop the previous snapshot.
      // The newest COMMITTED version dir is the best-known current.
      // "Committed" = has the parquet _SUCCESS marker: a crash between
      // creating the version dir and finishing its write leaves a
      // half-written dir, and trusting it would make Append union with
      // (and history reflect) a partial snapshot.
      listVersionDirs.lastOption

  private def listVersionDirs: Seq[Long] = {
    val versionsRoot = new Path(root, "_versions")
    if (!fs.exists(versionsRoot)) Seq.empty
    else fs.listStatus(versionsRoot).map(_.getPath)
      .filter(p => p.getName.startsWith("v") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(1).toLong).toSeq.sorted
  }

  def exists: Boolean = currentVersion.isDefined

  /** Commit a new version. `mode=Append` unions with the current snapshot
    * (still a fresh immutable version — append never mutates old files). */
  def write(df: DataFrame, mode: SaveMode = SaveMode.Overwrite,
      operation: String = "WRITE"): Long = {
    val next = currentVersion.map(_ + 1).getOrElse(0L)
    val toWrite = mode match {
      case SaveMode.Append if exists => read().unionByName(df)
      case _ => df
    }
    toWrite.write.mode(SaveMode.Overwrite).parquet(versionDir(next).toString)
    val rows = spark.read.parquet(versionDir(next).toString).count()
    appendHistory(next, operation, rows)
    pointTo(next)
    next
  }

  /** Read the current snapshot. */
  def read(): DataFrame = readVersion(
    currentVersion.getOrElse(sys.error(s"table $root does not exist")))

  /** S4: time-travel read at an explicit version. */
  def readVersion(v: Long): DataFrame = {
    require(fs.exists(versionDir(v)), s"version $v does not exist at $root")
    spark.read.parquet(versionDir(v).toString)
  }

  /** M5: restore — re-point current to an old version (kept as a new
    * history entry, like Delta RESTORE). */
  def restore(v: Long): Unit = {
    require(fs.exists(versionDir(v)), s"version $v does not exist at $root")
    appendHistory(currentVersion.map(_ + 1).getOrElse(0L), s"RESTORE to v$v", -1)
    pointTo(v)
  }

  /** M4: table history, newest first. */
  def history(limit: Int = 20): Seq[HistoryEntry] = {
    val re =
      """\{"version": (\d+), "timestamp": "([^"]+)", "operation": "([^"]+)", "numRows": (-?\d+)\}""".r
    def readWhole(p: Path): String = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }
    // legacy single-file layout first (oldest), then per-commit files in
    // filename (= commit) order
    val legacy = if (fs.exists(legacyHistoryPath))
      readWhole(legacyHistoryPath).linesIterator.toSeq else Seq.empty
    val perCommit = if (fs.exists(historyDir))
      fs.listStatus(historyDir).map(_.getPath).sortBy(_.getName).toSeq
        .map(readWhole)
    else Seq.empty
    (legacy ++ perCommit).reverse.take(limit).collect {
      case re(v, ts, op, rows) => HistoryEntry(v.toLong, ts, op, rows.toLong)
    }
  }

  /** M3: vacuum — delete version dirs that are neither current nor newer
    * than the retention horizon. Returns deleted versions. */
  def vacuum(retainVersions: Int = 2): Seq[Long] = {
    val cur = currentVersion.getOrElse(return Seq.empty)
    val versionsRoot = new Path(root, "_versions")
    if (!fs.exists(versionsRoot)) return Seq.empty
    val all = fs.listStatus(versionsRoot).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted
    val keep = all.filter(v => v == cur || v > cur - retainVersions)
    val drop = all.diff(keep)
    drop.foreach(v => fs.delete(versionDir(v), true))
    drop.toSeq
  }

  private def pointTo(v: Long): Unit = {
    val tmp = new Path(root, s"_latest.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // Atomic swap: rename with OVERWRITE — no delete-then-rename window
    // in which a crash leaves no `_latest` (currentVersion additionally
    // recovers from the version dirs if a legacy table lost its pointer).
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      rootPath.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, latestPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** One immutable file per commit: appending to a single JSONL would
    * read+rewrite the whole history every commit (O(n²) over the table's
    * lifetime — local filesystems have no append). The nanoTime prefix
    * keeps commit order and stays unique when RESTORE reuses a version
    * number. */
  private def appendHistory(v: Long, op: String, rows: Long): Unit = {
    val ts = java.time.Instant.now().toString
    val line =
      s"""{"version": $v, "timestamp": "$ts", "operation": "$op", "numRows": $rows}"""
    val f = new Path(historyDir, f"${System.nanoTime()}%020d_v$v%08d.json")
    val out = fs.create(f, false)
    try out.write(line.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}

final case class HistoryEntry(
    version: Long, timestamp: String, operation: String, numRows: Long)
