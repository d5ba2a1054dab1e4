package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory.
  *
  * Port of the reference session builder (`utils/spark.py:7-35`) minus the
  * Delta extension/catalog configs (no Delta jars in this environment —
  * SURVEY.md §7.0 R1). AQE + partition coalescing stay on, exactly as the
  * reference sets them (`utils/spark.py:27-28`).
  *
  * Scale note: `shuffle.partitions` defaults to the local core count rather
  * than Spark's 200; on a real cluster callers pass the cluster-appropriate
  * value (~2-3× total executor cores). All other settings are
  * cluster-neutral.
  */
object Sessions {

  def local(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Option[Int] = None
  ): SparkSession = {
    val sp = shufflePartitions.getOrElse(cores)
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // default-on in Spark 4, pinned explicitly: runtime splitting of
      // oversized sort-merge partitions is the first line of defense
      // against key skew (see SCALE.md; graft.util.SkewJoin is the
      // explicit fallback)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-FS commit hygiene: java.nio chmod instead of a /bin/chmod
      // fork per permissioned mkdir/create (libhadoop is absent here);
      // inert on cluster filesystems — see graft.io.FastLocalFileSystem
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      // same fix for the FileContext API (streaming checkpoint
      // renames fork readlink/stat per file otherwise)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.io.FastLocalFs")
      // catalog tables (bucketed layouts) land under tmp, not the cwd
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-$appName")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
