package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES: " + "Exchange".r.findAllIn(plan).length)
    println(plan.take(12000))
    spark.stop()
  }
}
