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

  /** M1: bin-packing compaction — rewrite the table into files of roughly
    * `targetFileMB`. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128): (Long, Long) = {
    val before = TableIO.detail(spark, path)
    val n = math.max(1L,
      before.sizeInBytes / (targetFileMB.toLong * 1024 * 1024)).toInt
    val df = TableIO.read(spark, path).repartition(n)
    val tmp = path + "__compact_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = TableIO.fs(spark, p)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    (before.numFiles, TableIO.detail(spark, path).numFiles)
  }

  /** M2: cluster-sort rewrite (Z-ORDER substitute,
    * reference `utils/delta_ops.py:41-43`). */
  def sortBy(spark: SparkSession, path: String, sortCols: Seq[String],
      numPartitions: Option[Int] = None): Unit = {
    require(sortCols.nonEmpty, "sortBy requires at least one column")
    val df = TableIO.read(spark, path)
    val cols = sortCols.map(col)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, cols: _*)
      case None => df.repartitionByRange(cols: _*)
    }
    val sorted = ranged.sortWithinPartitions(cols: _*)
    val tmp = path + "__sort_tmp"
    sorted.write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = TableIO.fs(spark, p)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }
}
