package graft

/** Test-scope helper main: writes the taxi CSV fixture to a directory
  * (for driving graft.Pipeline end-to-end from the command line). */
object WriteFixture {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    Fixtures.writeRawCsv(spark, args.head)
    spark.stop()
  }
}
