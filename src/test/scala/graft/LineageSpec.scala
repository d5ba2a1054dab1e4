package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.audit.Lineage
import graft.queries.Tables

/** Column-level lineage from the analyzed plan: projections route
  * through expressions, aggregates over joins combine both sources,
  * literals derive from nothing, unions merge positionally, windows
  * and explodes track their inputs. */
class LineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf

  test("aggregate over a join: outputs name the right source columns") {
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    val df = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(col("o_totalprice") * 2).as("rev"),
        count(lit(1)).as("n"),
        lit("x").as("tag"))
    val l = Lineage.columns(df)
    assert(l("rev") === Set("orders.parquet.o_totalprice"))
    assert(l("c_mktsegment") === Set("customer.parquet.c_mktsegment"))
    assert(l("n") === Set.empty, "count(1) derives from no column")
    assert(l("tag") === Set.empty, "a literal derives from nothing")
  }

  test("multi-source expression and filter pass-through") {
    val o = Tables.load(spark, sf, "orders")
    val c = Tables.load(spark, sf, "customer")
    val df = o.join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice") > 0)
      .select((col("o_totalprice") / col("c_acctbal")).as("ratio"))
    assert(Lineage.columns(df)("ratio") ===
      Set("orders.parquet.o_totalprice", "customer.parquet.c_acctbal"))
  }

  test("union merges branch lineage positionally") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_totalprice").as("v"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_acctbal").as("v"))
    val l = Lineage.columns(o.union(c))
    assert(l("v") ===
      Set("orders.parquet.o_totalprice", "customer.parquet.c_acctbal"))
  }

  test("window functions and explode track their inputs") {
    val o = Tables.load(spark, sf, "orders")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderkey")
    val df = o.select(col("o_orderkey"),
      row_number().over(w).as("rk"))
    val l = Lineage.columns(df)
    assert(l("rk") ===
      Set("orders.parquet.o_custkey", "orders.parquet.o_orderkey"))
    // the LEAF column of a toDF-renamed local relation is `_2`; the
    // rename is itself a projection the walk routes through — lineage
    // reports the true leaf, not the cosmetic alias
    val ex = Seq((1L, Seq("a", "b"))).toDF("id", "xs")
      .select(explode(col("xs")).as("x"))
    assert(Lineage.columns(ex)("x") === Set("local._2"))
  }

  test("chained derivations compose transitively") {
    val o = Tables.load(spark, sf, "orders")
    val df = o.select((col("o_totalprice") * 2).as("a"))
      .select((col("a") + 1).as("b"))
      .groupBy().agg(max(col("b")).as("c"))
    assert(Lineage.columns(df)("c") === Set("orders.parquet.o_totalprice"))
  }
}
