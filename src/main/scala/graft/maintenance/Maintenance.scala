package graft.maintenance

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import graft.io.TableIO

/** Table maintenance: OPTIMIZE / Z-ORDER substitutes on Parquet
  * (reference `utils/delta_ops.py:11-62`; SURVEY.md §2.10).
  *
  * - [[compact]] = OPTIMIZE bin-packing: rewrite to ~`targetFileMB` files.
  *   Small-file proliferation is THE operational killer at 100 TB (every
  *   file is a task + a namenode/liststore entry); compaction after
  *   incremental appends keeps scan task counts sane.
  * - [[sortBy]] = Z-ORDER substitute: `repartitionByRange` + sort within
  *   partitions on the cluster columns before write. Parquet row-group
  *   min/max stats then let the reader skip row groups for predicates on
  *   those columns — same data-skipping effect Z-ORDER targets, for the
  *   single-column-prefix case. (True multi-dimensional interleaving is a
  *   possible extension via a Hilbert/Z-value expression.)
  */
object Maintenance {

  /** M1: bin-packing compaction — rewrite into files of roughly
    * `targetFileMB`. Returns (filesBefore, filesAfter).
    *
    * With `where`, only partitions whose partition value satisfies the
    * predicate are rewritten (reference `utils/delta_ops.py:32-38`
    * `.where` support) — untouched partitions keep their files
    * byte-for-byte. At 100 TB a whole-table rewrite is not an option:
    * the incremental pipeline only dirties recent partitions, so
    * `where` is the production form and the full rewrite the
    * small-table special case.
    *
    * A [[graft.io.VersionedTable]] root compacts as a NEW VERSION —
    * one atomic manifest swap, prior versions still readable, no
    * delete-then-rename window at all (`where` goes through
    * `replaceWhere`: untouched partitions' files are re-referenced in
    * the new manifest, never listed or moved). The raw-parquet path
    * keeps the temp-dir swap; its crash window strands data in a
    * `_`-tmp sibling (recoverable by hand) — versioned storage is the
    * at-scale deployment shape. */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128,
      where: Option[String] = None): (Long, Long) = {
    val vt = new graft.io.VersionedTable(spark, path)
    // raw tables: roll forward/back any crashed previous swap BEFORE
    // reading table detail (a crash window leaves the dir missing)
    if (!vt.exists) recoverRewriteLeftovers(spark, path)
    val before = TableIO.detail(spark, path)
    (vt.exists, where) match {
      case (true, None) => vt.compact(targetFileMB)
      case (true, Some(pred)) =>
        compactVersionedWhere(spark, vt, path, targetFileMB, pred)
      case (false, None) => rewriteDir(spark, path, targetFileMB)
      case (false, Some(pred)) =>
        partitionDirs(spark, path, pred)
          .foreach(d => rewriteDir(spark, d, targetFileMB))
    }
    (before.numFiles, TableIO.detail(spark, path).numFiles)
  }

  /** Partition-scoped OPTIMIZE on a versioned table: one replaceWhere
    * commit rewrites the matching partitions' files; every other
    * entry is carried into the new manifest untouched. */
  private def compactVersionedWhere(spark: SparkSession,
      vt: graft.io.VersionedTable, path: String, targetFileMB: Int,
      pred: String): Unit = {
    val pcols = vt.partitionColumns
    require(pcols.size == 1,
      s"partition-scoped compaction supports one partition level, found: $pcols")
    val pcol = pcols.head
    val basisV = vt.currentVersion.get
    val entries = vt.manifestEntries(basisV)
    val vals = entries.flatMap(_.partitionValues.get(pcol)).distinct
    require(vals.nonEmpty,
      s"$path has no recorded partition values; omit `where` to compact whole tables")
    import spark.implicits._
    val matched = vals.toDF(pcol).filter(pred).as[String].collect().toSet
    if (matched.isEmpty) return
    val bytes = entries
      .filter(_.partitionValues.get(pcol).exists(matched)).map(_.bytes).sum
    val n = math.max(1L, bytes / (targetFileMB.toLong * 1024 * 1024)).toInt
    val sub = vt.readWherePartitionIn(pcol, matched, atVersion = Some(basisV))
      .repartition(n)
    vt.replaceWhere(sub,
      keep = e => !e.partitionValues.get(pcol).exists(matched),
      operation = s"OPTIMIZE where $pred", basisVersion = Some(basisV))
  }

  /** First-level `col=value` partition dirs matching `predicate`. The
    * predicate is evaluated by Spark on the dir-name values (cast as in
    * SQL comparison coercion), so any single-partition-column predicate
    * the reader could prune with works here too. */
  private def partitionDirs(spark: SparkSession, path: String,
      predicate: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = TableIO.fs(spark, root)
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map { s =>
        val Array(c, v) = s.getPath.getName.split("=", 2)
        (s.getPath.toString, c,
          java.net.URLDecoder.decode(v, "UTF-8"))
      }
    require(parts.nonEmpty,
      s"$path has no hive-style partition dirs; omit `where` to compact whole tables")
    val colNames = parts.map(_._2).distinct
    require(colNames.size == 1,
      s"partition-scoped compaction supports one partition level, found: $colNames")
    import spark.implicits._
    val matched = parts.map { case (d, _, v) => (d, v) }
      .toDF("__dir", colNames.head)
      .filter(predicate)
      .select("__dir").collect().map(_.getString(0)).toSeq
    matched
  }

  // `_`-prefixed temp sibling for dir swaps — shared with the merge
  // rewrite path; see TableIO.tmpSibling for why the prefix matters.
  private def tmpSibling(p: org.apache.hadoop.fs.Path, tag: String) =
    TableIO.tmpSibling(p, tag)

  /** Name of the zero-byte file that proves a rewrite temp dir was
    * FULLY written (created only after the parquet write returns) —
    * the same protocol as `Incremental.completeMarker`: without it,
    * recovery cannot tell "crashed during the swap — the tmp may be
    * the only live copy" from "crashed during the tmp write — the tmp
    * holds arbitrary partial output". `_`-prefixed: never read as
    * data. */
  private[graft] val completeMarker = "_GRAFT_REWRITE_COMPLETE"

  /** Crash-safe final step of every raw-dir rewrite: marker (commit
    * point) → delete target → rename tmp in → drop the marker that
    * rode along. A crash at any point is recovered by
    * [[recoverCrashedRewrite]]. */
  private def swapDir(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path): Unit = {
    fs.create(new org.apache.hadoop.fs.Path(tmp, completeMarker), true).close()
    fs.delete(p, true)
    fs.rename(tmp, p)
    fs.delete(new org.apache.hadoop.fs.Path(p, completeMarker), false)
  }

  /** Recovery from a raw-dir rewrite that crashed inside its swap
    * window (previous behavior stranded the data in the `_`-tmp
    * sibling "recoverable by hand"):
    *  - target missing + marked tmp: the swap's delete ran but not its
    *    rename — the tmp IS the table; finish the rename.
    *  - target missing + UNMARKED tmp: theoretically unreachable (the
    *    marker precedes the delete) — fail loudly, don't guess.
    *  - target present: a rewrite holds the same rows in a different
    *    layout, so rolling the tmp back is always safe (marked or
    *    not); a rerun just compacts again. */
  private[graft] def recoverCrashedRewrite(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, tag: String): Unit = {
    val tmp = tmpSibling(p, tag)
    if (!fs.exists(tmp)) return
    if (!fs.exists(p)) {
      if (!fs.exists(new org.apache.hadoop.fs.Path(tmp, completeMarker)))
        sys.error(s"unrecoverable crashed rewrite at $p: the target is " +
          s"gone and $tmp lacks $completeMarker (incomplete write) — a " +
          "swap only starts after the marker is written, so this state " +
          "needs operator inspection, not a guess")
      fs.rename(tmp, p)
      fs.delete(new org.apache.hadoop.fs.Path(p, completeMarker), false)
    } else {
      fs.delete(tmp, true)
    }
  }

  /** Sweep a raw table root for crashed-rewrite leftovers: the
    * whole-table tmp (sibling of the root) and any partition-scoped
    * tmps (siblings of partition dirs, i.e. inside the root — a
    * crashed partition swap leaves that partition dir MISSING, so
    * only the tmp's own name still points at it). */
  private def recoverRewriteLeftovers(spark: SparkSession,
      path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = TableIO.fs(spark, root)
    recoverCrashedRewrite(fs, root, "compact_tmp")
    val suffix = "__compact_tmp"
    if (fs.exists(root)) fs.listStatus(root).map(_.getPath)
      .filter(q => q.getName.startsWith("_") && q.getName.endsWith(suffix))
      .foreach { q =>
        val orig = new org.apache.hadoop.fs.Path(root,
          q.getName.stripPrefix("_").stripSuffix(suffix))
        recoverCrashedRewrite(fs, orig, "compact_tmp")
      }
  }

  private def rewriteDir(spark: SparkSession, dir: String,
      targetFileMB: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = TableIO.fs(spark, p)
    recoverCrashedRewrite(fs, p, "compact_tmp")
    val detail = TableIO.detail(spark, dir)
    val n = math.max(1L,
      detail.sizeInBytes / (targetFileMB.toLong * 1024 * 1024)).toInt
    val df = TableIO.read(spark, dir).repartition(n)
    val tmp = tmpSibling(p, "compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale crash leftover
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swapDir(fs, p, tmp)
  }

  /** M2, true multi-dimensional form: Z-ORDER rewrite
    * (reference `utils/delta_ops.py:41-43` defers to Delta ZORDER BY).
    *
    * Each cluster column is bucketed by its own approximate equi-depth
    * quantiles (one pass over the table computes ALL columns'
    * boundaries; equi-depth means skew can't collapse buckets), bucket
    * ids are bit-interleaved into a Z-value by the native
    * [[graft.functions.ZValue]] expression, and the table is
    * range-repartitioned + sorted by that Z-value before rewrite. Every
    * cluster column then has narrow min/max ranges per row group —
    * multi-predicate data skipping, where [[sortBy]] (the
    * single-column-prefix form) only skips on the leading column.
    * Numeric columns only (quantile bucketing); use [[sortBy]] for
    * lexicographic clustering. */
  def zOrderBy(spark: SparkSession, path: String, zCols: Seq[String],
      bitsPerDim: Int = 8, numPartitions: Option[Int] = None): Unit =
    curveOrderBy(spark, path, zCols, bitsPerDim, numPartitions,
      graft.functions.ZValue.zvalue, "zorder_tmp")

  /** Hilbert-curve variant of [[zOrderBy]] — the Hilbert curve moves
    * only between adjacent bucket cells (no Z-curve jump seams), so
    * consecutive index ranges are compact spatial blobs and per-file
    * ranges come out tighter on average; the preferred clustering for
    * repeated multi-column range scans at scale. Same quantile
    * bucketing, shuffle, and rewrite machinery. */
  def hilbertOrderBy(spark: SparkSession, path: String, cols: Seq[String],
      bitsPerDim: Int = 8, numPartitions: Option[Int] = None): Unit =
    curveOrderBy(spark, path, cols, bitsPerDim, numPartitions,
      graft.functions.HilbertValue.hilbert, "hilbert_tmp")

  /** Terminal step of every clustering rewrite: a versioned root
    * commits the sorted snapshot as a NEW VERSION (atomic manifest
    * swap; the sorted plan reads the old version's immutable files
    * while the new commit dir fills — no window where the table is
    * half-rewritten); a raw parquet dir keeps the temp-swap. */
  private def rewriteSorted(spark: SparkSession, path: String,
      sorted: org.apache.spark.sql.DataFrame, tag: String,
      operation: String): Unit = {
    val vt = new graft.io.VersionedTable(spark, path)
    if (vt.exists) {
      vt.write(sorted, SaveMode.Overwrite, operation)
      return
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = TableIO.fs(spark, p)
    val tmp = tmpSibling(p, tag)
    if (fs.exists(tmp)) fs.delete(tmp, true) // stale crash leftover
    sorted.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swapDir(fs, p, tmp)
  }

  /** A cluster column as a double for quantile bucketing. A bare
    * `cast("double")` NULLs every date/timestamp value (Spark forbids
    * that cast), silently degrading the most common clustering key —
    * the date column — to an all-null error; route temporal types
    * through their natural ordinals instead (ordinals only feed
    * bucketing, so the unit is irrelevant as long as it's monotonic). */
  private def asCurveDouble(df: org.apache.spark.sql.DataFrame,
      c: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    df.schema(c).dataType match {
      case DateType => org.apache.spark.sql.functions.unix_date(col(c))
        .cast("double")
      case TimestampType => org.apache.spark.sql.functions
        .unix_micros(col(c)).cast("double")
      case _ => col(c).cast("double")
    }
  }

  /** Curve-sort a frame: quantile-bucket each cluster column, compute
    * the space-filling-curve index, range-partition + sort by it.
    * The read/sort half shared by the full rewrite ([[zOrderBy]] /
    * [[hilbertOrderBy]]) and the incremental pass
    * ([[clusterIncrementalBy]]). Bounds come from THIS frame — for an
    * incremental slice that is the new data's own distribution, which
    * is what makes its per-file envelopes tight. */
  private[graft] def curveSort(df: org.apache.spark.sql.DataFrame,
      cCols: Seq[String], bitsPerDim: Int, numPartitions: Option[Int],
      curve: (Seq[org.apache.spark.sql.Column], Seq[Seq[Double]]) =>
        org.apache.spark.sql.Column,
      where: String): org.apache.spark.sql.DataFrame = {
    require(cCols.nonEmpty, "cluster rewrite requires at least one column")
    require(bitsPerDim * cCols.size <= 63,
      s"${cCols.size} dims at $bitsPerDim bits exceed a long")
    val buckets = 1 << bitsPerDim
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one scan computes every dimension's quantile edges
    val casted = df.select(cCols.map(c => asCurveDouble(df, c).as(c)): _*)
    val bounds = casted.stat.approxQuantile(cCols.toArray, probs, 0.001)
    // approxQuantile returns ZERO edges for an all-null column (or an
    // empty table); say so, instead of a confusing bucket-count
    // require deep in the rewrite
    bounds.toSeq.zip(cCols).foreach { case (bs, c) =>
      require(bs.nonEmpty,
        s"cluster column '$c' has no non-null values to bucket at $where")
    }
    val idx = curve(cCols.map(c => asCurveDouble(df, c)),
      bounds.toSeq.map(_.toSeq))
    val withIdx = df.withColumn("__curve", idx)
    val ranged = numPartitions match {
      case Some(n) => withIdx.repartitionByRange(n, col("__curve"))
      case None => withIdx.repartitionByRange(col("__curve"))
    }
    ranged.sortWithinPartitions(col("__curve")).drop("__curve")
  }

  private def curveOrderBy(spark: SparkSession, path: String,
      cCols: Seq[String], bitsPerDim: Int, numPartitions: Option[Int],
      curve: (Seq[org.apache.spark.sql.Column], Seq[Seq[Double]]) =>
        org.apache.spark.sql.Column,
      tag: String): Unit = {
    // raw tables: recover a crashed previous swap BEFORE reading
    if (!new graft.io.VersionedTable(spark, path).exists) {
      val p = new org.apache.hadoop.fs.Path(path)
      recoverCrashedRewrite(TableIO.fs(spark, p), p, tag)
    }
    val df = TableIO.readTable(spark, path)
    val sorted = curveSort(df, cCols, bitsPerDim, numPartitions, curve, path)
    rewriteSorted(spark, path, sorted, tag,
      s"OPTIMIZE ZORDER (${cCols.mkString(",")})")
  }

  /** LIQUID-STYLE INCREMENTAL CLUSTERING (the OPTIMIZE form Delta's
    * liquid clustering runs on a schedule): cluster-sort ONLY the
    * files committed since the last clustering pass — already-
    * clustered files keep their manifest entries byte-identically.
    * A streaming table that lands small unsorted files all day pays
    * one pass over the new data each night, never an O(table)
    * rewrite; multi-column skipping holds across BOTH file
    * populations because each clustering pass left tight per-file
    * envelopes behind. First call (no prior pass) clusters the whole
    * table. DV masks on rewritten files purge with the rewrite;
    * tracked tables carry row ids; the `OPTIMIZE`-prefixed operation
    * keeps the rewrite-only CDF fast path; bloom sidecars refresh.
    * Returns the current version unchanged when nothing new landed. */
  def clusterIncrementalBy(spark: SparkSession, path: String,
      cCols: Seq[String], bitsPerDim: Int = 8,
      targetFileMB: Int = 128, numPartitions: Option[Int] = None): Long = {
    val vt = new graft.io.VersionedTable(spark, path)
    val curV = vt.currentVersion.getOrElse(
      sys.error(s"table $path does not exist"))
    val lastCluster = vt.history(limit = Int.MaxValue)
      .filter(h => h.operation.startsWith("OPTIMIZE ZORDER") ||
        h.operation.startsWith("OPTIMIZE CLUSTER"))
      .map(_.version).foldLeft(-1L)(_ max _)
    val target = vt.manifestEntries(curV)
      .filter(e => vt.entryCommitVersion(e).forall(_ > lastCluster))
    if (target.isEmpty) return curV
    val n = numPartitions.getOrElse(math.max(1L, target.map(_.bytes).sum /
      (targetFileMB.toLong * 1024 * 1024)).toInt)
    val sorted = curveSort(vt.readEntriesForRewrite(target), cCols,
      bitsPerDim, Some(n), graft.functions.ZValue.zvalue, path)
    val targetPaths = target.map(_.relPath).toSet
    val v = vt.replaceWhere(sorted,
      e => !targetPaths.contains(e.relPath),
      s"OPTIMIZE CLUSTER (${cCols.mkString(",")})",
      basisVersion = Some(curV))
    vt.refreshBloomIndexes(v)
    v
  }

  /** M2: cluster-sort rewrite (single-column-prefix Z-ORDER substitute,
    * reference `utils/delta_ops.py:41-43`); [[zOrderBy]] is the true
    * multi-dimensional form. */
  def sortBy(spark: SparkSession, path: String, sortCols: Seq[String],
      numPartitions: Option[Int] = None): Unit = {
    require(sortCols.nonEmpty, "sortBy requires at least one column")
    val df = TableIO.readTable(spark, path)
    val cols = sortCols.map(col)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, cols: _*)
      case None => df.repartitionByRange(cols: _*)
    }
    val sorted = ranged.sortWithinPartitions(cols: _*)
    rewriteSorted(spark, path, sorted, "sort_tmp",
      s"OPTIMIZE SORT (${sortCols.mkString(",")})")
  }
}
