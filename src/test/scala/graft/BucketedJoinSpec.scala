package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.TableIO

/** Bucketed-table layout: two tables hash-bucketed the same way join
  * co-located — no Exchange on either side. This is the SCALE.md claim
  * "co-locate joins via bucketing" made concrete and plan-asserted. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-bucketing join plans with zero exchanges") {
    val facts = (1L to 1000L).map(i => (i % 97, i, i * 1.5))
      .toDF("key", "id", "amount")
    val dims = (0L until 97L).map(i => (i, s"k$i")).toDF("key", "label")
    TableIO.writeBucketed(facts, "b_facts", "key", 8)
    TableIO.writeBucketed(dims, "b_dims", "key", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a shuffle-family join so the assert is about bucketing,
    // not about broadcast making exchanges moot
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts")
        .join(spark.table("b_dims"), "key")
        .groupBy("label").agg(sum("amount").as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY exchange allowed is the aggregation's own, after the
      // join — neither join input may shuffle
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join inputs must not shuffle:\n$plan")
      // and it still computes the right thing
      assert(joined.count() === 97)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("aggregation on the bucket key reuses the bucketed partitioning") {
    // the q173 claim: join on the bucket key THEN groupBy it — the agg
    // inherits hash(key) from the scan, so the whole join+agg plan has
    // ZERO exchanges (HashPartitioning(key) satisfies the clustered
    // distribution of any grouping that includes key)
    val facts = (1L to 500L).map(i => (i % 50, i, i * 2.0))
      .toDF("key", "id", "amount")
    val dims = (0L until 50L).map(i => (i, s"seg${i % 3}"))
      .toDF("key", "segment")
    TableIO.writeBucketed(facts, "b2_facts", "key", 4)
    TableIO.writeBucketed(dims, "b2_dims", "key", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("b2_facts")
        .join(spark.table("b2_dims"), "key")
        .groupBy("key", "segment")
        .agg(sum("amount").as("total"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key join+agg must be exchange-free:\n$plan")
      assert(agg.count() === 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b2_facts")
      spark.sql("DROP TABLE IF EXISTS b2_dims")
    }
  }
}
