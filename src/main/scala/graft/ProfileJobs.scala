package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Job/stage accounting for one query (guide §1/§7): how many Spark
  * jobs the operator launches, how much task time they sum to, and
  * the wall-clock of build vs action — separates "the plan is
  * expensive" from "the driver launches many tiny jobs".
  * Measurement-only scaffolding; writes nothing.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach {
      t =>
        try { graft.queries.Tables.load(spark, sfDir, t).limit(100).count() }
        catch { case _: Throwable => () }
    }
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobStart.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(j.jobId)).getOrElse(0L)
        jobLog.add(f"job ${j.jobId}%4d wall=${(System.nanoTime() - t0) / 1e9}%6.3f")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val fn = SparkEntry.queries(name)
    // poor-man's driver profiler: sample the main thread every 20 ms
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          // find the deepest graft/spark frame below the harness
          val key = st.find(f =>
            f.getClassName.startsWith("graft.") ||
            f.getClassName.startsWith("org.apache.parquet") ||
            f.getClassName.startsWith("org.apache.hadoop")).map(f =>
            f.getClassName + "." + f.getMethodName).getOrElse(
            st.headOption.map(f =>
              f.getClassName + "." + f.getMethodName).getOrElse("?"))
          samples.merge(key, 1, (a, b) => a + b)
          if (key.contains("Shell") && samples.get(key) <= 3)
            st.take(28).foreach(f => println("[shellstack] " + f))
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    // rep 1 (warm codegen), rep 2 measured
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    org.apache.spark.sql.graftbridge.StateStoreHygiene.unloadAll()
    jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); jobLog.clear()
    val t0 = System.nanoTime()
    sampling = true
    val df = fn(spark, sfDir)
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    sampling = false
    val t2 = System.nanoTime()
    println(f"[jobs] $name build=${(t1 - t0) / 1e9}%.2f " +
      f"action=${(t2 - t1) / 1e9}%.2f jobs=${jobs.get} stages=${stages.get} " +
      f"tasks=${tasks.get} taskTimeSum=${taskMs.get / 1e3}%.2fs")
    jobLog.forEach(l => println("[jobs]   " + l))
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, n) =>
      println(f"[stack] $n%5d  $k")
    }
    spark.stop()
  }
}
