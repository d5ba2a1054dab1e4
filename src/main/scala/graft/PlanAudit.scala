package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Registry-wide plan sweep (guide §7.2): EXECUTES every query at
  * sf0.01 against a noop sink and flags join/exchange shapes from the
  * FINAL ADAPTIVE plans of ALL executions each query ran (captured via
  * QueryExecutionListener after execution) — the round-17 verdict's
  * fix: the old pre-execution sweep read `isFinalPlan=false` shapes,
  * so AQE's runtime BHJ/SHJ rewrites were invisible and checkpoint
  * loops showed only a final `Scan ExistingRDD`. Measurement-only
  * scaffolding; writes nothing. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      // same fix for the FileContext API (streaming checkpoint
      // renames fork readlink/stat per file otherwise)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.io.FastLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val nameFilter = args.headOption.getOrElse(".*")
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        captured.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(nameFilter)).foreach { case (name, fn) =>
      try {
        captured.clear()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
        import scala.jdk.CollectionConverters._
        val plans = captured.asScala.toSeq
        val all = plans.mkString("\n")
        val exchanges = "Exchange".r.findAllIn(all).length
        val flags = Seq(
          if (all.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (all.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None,
          if (all.contains("SortMergeJoin")) Some("SMJ") else None,
          if (all.contains("InMemoryTableScan")) Some("CACHE") else None
        ).flatten.mkString(",")
        println(f"$name%-28s execs=${plans.size}%-3d exch=$exchanges%-4d $flags")
        spark.catalog.clearCache()
        org.apache.spark.sql.graftbridge.StateStoreHygiene.unloadAll()
      } catch { case e: Throwable =>
        println(f"$name%-28s PLAN-ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
