package graft

import org.apache.spark.sql.SparkSession
import graft.io.{TableIO, VersionedTable}
import graft.maintenance.Maintenance

/** Maintenance CLI — the operator-facing commands of the reference's
  * `scripts/optimize_tables.py:18-63`, `scripts/vacuum_tables.py:18-66`
  * and `scripts/time_travel.py:18-102`, over one entry point:
  *
  * {{{
  *   runMain graft.Maintain compact --path <table> [--target-mb 128] [--where "<pred>"]
  *   runMain graft.Maintain sortby  --path <table> --cols a,b [--partitions N]
  *   runMain graft.Maintain detail  --path <table>
  *   runMain graft.Maintain vacuum  --path <versioned-root> [--retain 2]
  *   runMain graft.Maintain history --path <versioned-root> [--limit 20]
  *   runMain graft.Maintain restore --path <versioned-root> --version V
  *   runMain graft.Maintain delete  --path <versioned-root> --column c \
  *                                  (--values a,b | --between lo,hi)
  * }}}
  *
  * compact/sortby/detail act on plain parquet tables; vacuum/history/
  * restore on [[graft.io.VersionedTable]] roots.
  */
object Maintain {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case k :: v :: tail if k.startsWith("--") && !v.startsWith("--") =>
          loop(tail, acc + (k.drop(2) -> v))
        case other => sys.error(s"cannot parse arguments at: $other")
      }
    loop(args.toList, Map.empty)
  }

  /** Command dispatch, returning the human-readable result line (shared
    * by main and the round-trip spec — no session lifecycle in here). */
  def run(spark: SparkSession, command: String,
      opts: Map[String, String]): String = {
    def path = opts.getOrElse("path", sys.error("--path <table> is required"))
    command match {
      case "compact" =>
        val (before, after) = Maintenance.compact(spark, path,
          targetFileMB = opts.get("target-mb").map(_.toInt).getOrElse(128),
          where = opts.get("where"))
        s"compact $path: files $before -> $after"
      case "sortby" =>
        val cols = opts.getOrElse("cols",
          sys.error("--cols a,b is required")).split(",").map(_.trim).toSeq
        Maintenance.sortBy(spark, path, cols,
          numPartitions = opts.get("partitions").map(_.toInt))
        s"sortby $path: clustered by ${cols.mkString(", ")}"
      case "detail" =>
        val d = TableIO.detail(spark, path)
        s"detail $path: numFiles=${d.numFiles} sizeInBytes=${d.sizeInBytes}"
      case "vacuum" =>
        val deleted = new VersionedTable(spark, path)
          .vacuum(opts.get("retain").map(_.toInt).getOrElse(2))
        s"vacuum $path: deleted versions ${deleted.mkString("[", ", ", "]")}"
      case "history" =>
        val entries = new VersionedTable(spark, path)
          .history(opts.get("limit").map(_.toInt).getOrElse(20))
        entries.map(e =>
            s"v${e.version} ${e.timestamp} ${e.operation} rows=${e.numRows}")
          .mkString("\n")
      case "restore" =>
        val v = opts.getOrElse("version",
          sys.error("--version V is required")).toLong
        new VersionedTable(spark, path).restore(v)
        s"restore $path: now at v$v"
      case "optimize" =>
        val v = new VersionedTable(spark, path).compact(
          opts.get("target-mb").map(_.toInt).getOrElse(128))
        s"optimize $path: compacted snapshot committed as v$v"
      case "zorder" =>
        val cols = opts.getOrElse("cols",
          sys.error("--cols a,b is required")).split(",").map(_.trim).toSeq
        Maintenance.zOrderBy(spark, path, cols,
          bitsPerDim = opts.get("bits").map(_.toInt).getOrElse(8),
          numPartitions = opts.get("partitions").map(_.toInt))
        s"zorder $path: z-clustered by ${cols.mkString(", ")}"
      case "hilbert" =>
        val cols = opts.getOrElse("cols",
          sys.error("--cols a,b is required")).split(",").map(_.trim).toSeq
        Maintenance.hilbertOrderBy(spark, path, cols,
          bitsPerDim = opts.get("bits").map(_.toInt).getOrElse(8),
          numPartitions = opts.get("partitions").map(_.toInt))
        s"hilbert $path: hilbert-clustered by ${cols.mkString(", ")}"
      case "delete" =>
        val column = opts.getOrElse("column",
          sys.error("--column <col> is required"))
        val vt = new VersionedTable(spark, path)
        (opts.get("values"), opts.get("between")) match {
          case (Some(vs), None) =>
            val v = vt.deletePartitionIn(column,
              vs.split(",").map(_.trim).toSet)
            s"delete $path: dropped $column in ($vs), now at v$v"
          case (None, Some(range)) =>
            val Array(lo, hi) = range.split(",").map(_.trim.toDouble)
            val v = vt.deleteBetween(column, lo, hi)
            s"delete $path: removed $column in [$lo, $hi], now at v$v"
          case _ => sys.error(
            "delete needs exactly one of --values a,b (partition drop) " +
              "or --between lo,hi (row delete)")
        }
      case other =>
        sys.error(s"unknown command '$other' " +
          "(compact|sortby|detail|vacuum|history|restore|optimize|zorder|hilbert|delete)")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Maintain <compact|sortby|detail|vacuum|history|restore> --path <table> [options]")
    val spark = graft.core.Sessions.local("graft-maintain",
      cores = Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    try println(run(spark, args.head, parseArgs(args.tail)))
    finally spark.stop()
  }
}
