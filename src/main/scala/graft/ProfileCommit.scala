package graft
import org.apache.spark.sql.{SaveMode, SparkSession}
/** Scratch micro-benchmark: time N small VersionedTable commits.
  * Measurement-only; deleted or kept as tooling. */
object ProfileCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.io.FastLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(100000).selectExpr("sum(id)").collect()
    val n = 30
    val root = java.nio.file.Files.createTempDirectory("graft-pc").toString
    val df = spark.range(sys.env.getOrElse("PC_ROWS","20000").toLong).selectExpr("id", "id * 2 as v")
    val vt = new graft.io.VersionedTable(spark, s"$root/t")
    vt.write(df) // v0 (warm)
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        val key = st.filter(f =>
          f.getClassName.startsWith("graft.") ||
          f.getClassName.startsWith("org.apache.parquet") ||
          f.getClassName.startsWith("org.apache.spark.sql.execution.datasources") ||
          f.getClassName.startsWith("org.apache.spark.sql.catalyst") ||
          f.getClassName.startsWith("org.apache.spark.sql.execution.adaptive") ||
          f.getClassName.startsWith("org.apache.hadoop")).take(2)
          .map(f => f.getClassName.split("\\.").last + "." + f.getMethodName)
          .mkString("<-")
        samples.merge(if (key.isEmpty) st.headOption.map(f =>
          f.getClassName + "." + f.getMethodName).getOrElse("?") else key,
          1, (a, b) => a + b)
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      vt.write(df.withColumn("v", $"v" + i), SaveMode.Append)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"[commit] $n appends in $dt%.2f s (${dt / n * 1000}%.0f ms/commit)")
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(22).foreach { case (k, c) =>
      println(f"[cstack] $c%5d  $k")
    }
    spark.stop()
  }
}
