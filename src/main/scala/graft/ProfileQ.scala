package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler (guide §1): times each matching query
  * with the BUILD phase (the query function call — some operators run
  * side-effecting phases inside it: temp-table writes, streaming
  * drains, index builds) separated from the ACTION phase (a noop sink
  * over the returned frame, so the computation is timed without the
  * sink — guide §1.4), labels jobs (§1.5), and optionally dumps
  * `.explain("formatted")` for the returned frame.
  *
  * Usage: runMain graft.Profile <nameRegex> [reps] [plansOutDir]
  * Never writes bench artifacts — measurement-only scaffolding.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val nameFilter = args.headOption.getOrElse(".*")
    val reps = if (args.length > 1) args(1).toInt else 2
    val plansDir = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      // same fix for the FileContext API (streaming checkpoint
      // renames fork readlink/stat per file otherwise)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.io.FastLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "events", "documents", "embeddings",
      "customer", "nation").foreach { t =>
      try { graft.queries.Tables.load(spark, sfDir, t).limit(100).count() }
      catch { case _: Throwable => () }
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(nameFilter)).foreach { case (name, fn) =>
        (1 to reps).foreach { r =>
          spark.sparkContext.setJobDescription(s"$name rep$r build")
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          spark.sparkContext.setJobDescription(s"$name rep$r action")
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          println(f"[profile] $name rep$r build=${(t1 - t0) / 1e9}%.2f " +
            f"action=${(t2 - t1) / 1e9}%.2f")
          if (r == reps) plansDir.foreach { d =>
            val p = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$d/$name.txt"),
              p.getBytes("UTF-8"))
          }
          spark.catalog.clearCache()
          org.apache.spark.sql.graftbridge.StateStoreHygiene.unloadAll()
        }
      }
    spark.stop()
  }
}
