package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomSketch

/** Bloom build/probe over Spark's sketch expressions, and the q72
  * exactness contract: the Bloom prefilter composed with the exact
  * verification join equals the plain exact result. */
class BloomSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives; fpp near the build target") {
    val members = (0 until 10000).map(i => s"member-$i")
    val bloom = BloomSketch.build(members.toDF("s"), col("s"),
      expectedItems = 10000L, fpp = 0.01)
    // every member must probe true
    val hits = members.toDF("s")
      .filter(BloomSketch.mightContain(bloom, col("s"))).count()
    assert(hits === 10000L)
    // non-members probe true at ~fpp, not wildly above
    val fp = (0 until 10000).map(i => s"stranger-$i").toDF("s")
      .filter(BloomSketch.mightContain(bloom, col("s"))).count()
    assert(fp < 300L, s"false-positive count $fp far above 1% target")
  }

  test("q72 bloom decontamination equals the exact complement") {
    val dir = "/root/testdata/sf0.001"
    val viaBloom = graft.queries.TrainingData
      .decontaminateBloom(spark, dir).collect().map(_.getLong(0))
    // exact path: q45's contaminated doc set, complemented
    val contaminated = graft.queries.TrainingData
      .decontaminate(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.queries.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 0)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = all.filterNot(contaminated).sorted
    assert(viaBloom.toSeq === expected.toSeq)
  }

  test("q72 never broadcasts the benchmark-gram set") {
    // The Bloom exists because the benchmark is too big to broadcast
    // as strings — so the post-Bloom exact verify must not smuggle a
    // BroadcastExchange of those grams back into the plan.
    val plan = graft.queries.TrainingData
      .decontaminateBloom(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val broadcasts = plan.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        if b.child.schema.fieldNames.contains("g8") => b
    }
    assert(broadcasts.isEmpty,
      s"benchmark grams entered a BroadcastExchange:\n${broadcasts.mkString}")
  }

  test("build() raises the runtime bloom-filter conf caps and restores") {
    val conf = spark.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val before = conf.get(itemsKey)
    // default cap is 4M items — an 8M-item build would silently clamp
    // (and degrade fpp) unless build() raises the confs for the pass
    val bloom = BloomSketch.build(
      spark.range(8000000L).selectExpr("cast(id as string) as s"),
      col("s"), expectedItems = 8000000L, fpp = 0.01)
    assert(conf.get(itemsKey) === before, "conf not restored after build")
    val fp = (0 until 20000).map(i => s"stranger-$i").toDF("s")
      .filter(BloomSketch.mightContain(bloom, col("s"))).count()
    // at the clamped 4M-item sizing with 8M inserted, fpp blows past
    // 10%; at the honest sizing it stays ~1%
    assert(fp < 600L, s"false-positive count $fp: sizing was clamped")
  }
}
