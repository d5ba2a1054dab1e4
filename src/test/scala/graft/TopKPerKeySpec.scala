package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKey

/** The custom per-key top-k physical operator: result-set parity with
  * the window formulation on random multi-partition data, the partial
  * stage really runs before the exchange (plan shape), and the
  * partial stage really prunes (shuffle rows ≤ k·partitions per
  * key). */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomDf(n: Int, keys: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, rnd.nextInt(keys), rnd.nextInt(50)))
      .toDF("id", "k", "score").repartition(7)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("parity with the window formulation, ties included") {
    // score has heavy ties (50 values over 4000 rows) — the unique
    // tie-break column `id` makes the order total, which is the
    // operator's contract
    val df = randomDf(4000, keys = 13, seed = 42)
    val byOperator = TopKPerKey.perKey(df, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), k = 5)
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id").asc)
    val byWindow = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 5).drop("_rn")
    assert(canon(byOperator) === canon(byWindow))
  }

  test("k larger than group size returns whole groups; k=1 works") {
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 5))
      .toDF("id", "k", "score")
    val all = TopKPerKey.perKey(df, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), k = 10)
    assert(canon(all) === canon(df))
    val top1 = TopKPerKey.perKey(df, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), k = 1)
    assert(canon(top1) === Seq("2|a|20", "3|b|5"))
  }

  test("plan: partial heap before ONE exchange, final after") {
    val df = randomDf(1000, keys = 7, seed = 1)
    val out = TopKPerKey.perKey(df, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), k = 3)
    out.collect() // force AQE final plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"no partial stage:\n$plan")
    assert(plan.contains("TopKPerKeyFinal"), s"no final stage:\n$plan")
    // partial must sit BELOW the exchange (runs map-side)
    val pi = plan.indexOf("TopKPerKeyPartial")
    val ei = plan.indexOf("Exchange")
    val fi = plan.indexOf("TopKPerKeyFinal")
    assert(ei >= 0, s"no exchange between stages:\n$plan")
    assert(fi < ei && ei < pi,
      s"stage order wrong (expect Final above Exchange above Partial):\n$plan")
  }

  test("high key cardinality under a starvation-level partial budget " +
    "degrades to pass-through, stays exact, and never buffers unbounded") {
    // keys ≈ rows (every id its own key-ish) with the partial stage
    // budgeted to ~8 retained rows per partition: almost every row
    // overflows the heap map and streams through to the spillable
    // final sort — the OOM-risk shape the budget exists for. Parity
    // with the window form must hold exactly.
    val conf = spark.conf
    conf.set(TopKPerKey.MaxPartialRowsKey, "8")
    try {
      val df = randomDf(6000, keys = 2000, seed = 99)
      val byOperator = TopKPerKey.perKey(df, Seq(col("k")),
        Seq(col("score").desc, col("id").asc), k = 2)
      val w = Window.partitionBy("k").orderBy(col("score").desc, col("id").asc)
      val byWindow = df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 2).drop("_rn")
      assert(canon(byOperator) === canon(byWindow))
    } finally conf.unset(TopKPerKey.MaxPartialRowsKey)
  }

  test("partial stage prunes the shuffle: ≤ k·partitions rows per key") {
    val df = randomDf(8000, keys = 3, seed = 7) // 7 input partitions
    val out = TopKPerKey.perKey(df, Seq(col("k")),
      Seq(col("score").desc, col("id").asc), k = 4)
    out.collect()
    // the exchange reads the partial stage's output: at most
    // keys × k × partitions rows — orders of magnitude below input
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // QueryStageExec nodes are leaves — descend through their .plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val shuffleRows = flatten(out.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          // only the ENSURE_REQUIREMENTS exchange between the top-k
          // stages — not the test's own repartition(7)
          if e.child.nodeName.contains("TopKPerKeyPartial") =>
        e.metrics.get("shuffleRecordsWritten").map(_.value)
          .getOrElse(fail(s"no records-written metric; have: " +
            e.metrics.keys.mkString(",")))
    }
    assert(shuffleRows.nonEmpty)
    assert(shuffleRows.forall(r => r >= 0 && r <= 3L * 4 * 7),
      s"shuffle not pruned: $shuffleRows rows (input 8000)")
  }
}
