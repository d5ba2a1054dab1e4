package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).length
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (plan.contains("BroadcastNestedLoopJoin")) Some("BNLJ") else None,
          if (plan.contains("SortMergeJoin")) Some("SMJ") else None,
          if (plan.contains("InMemoryTableScan")) Some("CACHE") else None
        ).flatten.mkString(",")
        println(f"$name%-28s exch=$exchanges%-3d $flags")
      } catch { case e: Throwable => println(f"$name%-28s PLAN-ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
