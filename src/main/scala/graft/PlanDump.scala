package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-evidence dump for one query (guide §7.2): EXECUTES the query
  * against a noop sink and prints the FINAL ADAPTIVE plan of every
  * execution the query ran — the returned frame's plan AND each
  * intermediate action an iterative operator launched (graph rounds,
  * commit scans, checkpoint materializations), captured through a
  * QueryExecutionListener AFTER each execution finishes, so AQE's
  * runtime decisions (`isFinalPlan=true`, BHJ/SHJ rewrites,
  * AQEShuffleRead coalescing) are visible instead of the initial
  * `isFinalPlan=false` shapes a pre-execution explain shows (round-17
  * verdict: final plans of checkpoint loops are just `Scan
  * ExistingRDD` — the per-round evidence lives in the INTERMEDIATE
  * executions this main now prints).
  *
  * Usage: `runMain graft.PlanDump <query> [sfDir] [outFile]`. With an
  * outFile the full dump is written there and stdout gets a one-line
  * summary; otherwise everything prints. Measurement-only scaffolding.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      // same fix for the FileContext API (streaming checkpoint
      // renames fork readlink/stat per file otherwise)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.io.FastLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        captured.add((funcName, qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // listener events are posted async — drain them
    org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
    val sb = new StringBuilder
    import scala.jdk.CollectionConverters._
    val execs = captured.asScala.toSeq
    sb.append(s"== $name: ${execs.size} executions " +
      "(final adaptive plans, in execution order) ==\n")
    execs.zipWithIndex.foreach { case ((fn, plan), i) =>
      sb.append(s"\n---- execution $i ($fn) ----\n")
      sb.append(if (plan.length > 20000)
        plan.take(20000) + s"\n...[truncated ${plan.length - 20000} chars]\n"
      else plan)
    }
    val text = sb.toString
    out match {
      case Some(path) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          text.getBytes("UTF-8"))
        val smj = "SortMergeJoin".r.findAllIn(text).length
        val bhj = "BroadcastHashJoin".r.findAllIn(text).length
        val shj = "ShuffledHashJoin".r.findAllIn(text).length
        val exch = "Exchange".r.findAllIn(text).length
        println(s"[plandump] $name execs=${execs.size} SMJ=$smj " +
          s"BHJ=$bhj SHJ=$shj Exchange=$exch -> $path")
      case None => println(text)
    }
    spark.stop()
  }
}
