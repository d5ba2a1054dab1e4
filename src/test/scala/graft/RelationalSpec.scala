package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local(
    appName = "graft-test", cores = 4, shufflePartitions = Some(4))
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite with BeforeAndAfterAll {
  import graft.queries.Relational
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every registered query has matching oracle coverage or is marked") {
    val missing = Relational.oracles.keySet -- Relational.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q01 daily kpis: one row per date, positive counts") {
    val df = Relational.dailyKpis(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val dates = rows.map(_.getDate(0))
    assert(dates.distinct.length === dates.length, "date key not unique")
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q02 flag/status: card = |returnflag| x |linestatus| subset, qty positive") {
    val rows = Relational.flagStatusDemand(spark, sf).collect()
    assert(rows.length >= 1 && rows.length <= 9)
    assert(rows.forall(_.getDouble(3) > 0))
  }

  test("q03 conjunctive filter: all predicates hold on output") {
    val rows = Relational.filterConjunctive(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) > 5.0 && r.getDouble(3) >= 500.0))
  }

  test("q04 dedup: keys unique after dropDuplicates") {
    val df = Relational.dedupExact(spark, sf)
    assert(df.count() === df.distinct().count())
  }

  test("q05 topk: exactly 10 rows, descending ts ordering held") {
    val df = Relational.topkLatest(spark, sf)
    assert(df.count() === 10)
  }

  test("q06 watermark is a timestamp inside the data range") {
    val wm = Relational.watermarkMax(spark, sf).collect()(0).getTimestamp(0)
    assert(wm.toString.startsWith("2024-"))
  }

  test("q09 null counts: orders has no nulls in synthetic data") {
    val row = Relational.nullCounts(spark, sf).collect()(0)
    (0 until row.length).foreach(i => assert(row.getLong(i) === 0L))
  }

  test("q13 merge upsert: source rows win, union of keys preserved") {
    import org.apache.spark.sql.functions._
    val o = graft.queries.Tables.load(spark, sf, "orders")
    val nTarget = o.filter(col("o_orderkey") % 3 =!= 0).count()
    val nSourceOnly = o.filter(col("o_custkey") % 2 === 0 &&
      col("o_orderkey") % 3 === 0).count()
    val merged = Relational.mergeUpsert(spark, sf)
    assert(merged.count() === nTarget + nSourceOnly)
    // updated rows carry status 'U'
    val updated = merged.filter(col("status_after") === "U").count()
    assert(updated > 0)
  }

  test("q14 star join agg: one row per nation present") {
    val rows = Relational.starJoinAgg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q15 window latest: one row per user") {
    val df = Relational.windowLatestPerUser(spark, sf)
    import spark.implicits._
    val users = df.select("user_id").as[Long].collect()
    assert(users.distinct.length === users.length)
  }

  test("q14 star join plan broadcasts both dimension sides") {
    val plan = Relational.starJoinAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q03 filter is pushed down to the parquet scan") {
    val plan = Relational.filterConjunctive(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_quantity"), plan)
  }

  test("q05 topk plans as TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topkLatest(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"top-k must not global-sort:\n$plan")
  }
  test("q02 aggregates partially before the shuffle (map-side combine)") {
    val plan = Relational.flagStatusDemand(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"expected partial (map-side) aggregation before the exchange:\n$plan")
  }

  test("q03 scan prunes columns: ReadSchema carries only what the query needs") {
    val plan = Relational.filterConjunctive(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(plan)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads columns the query never uses:\n$readSchema")
    assert(readSchema.contains("l_quantity"), readSchema)
  }

  test("q61 window family: ranks contiguous, ratios in [0,1], quartiles 1..4") {
    val rows = Relational.windowFunctions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(4)).sorted.toSeq === (1 to rs.length),
        "rank not contiguous (ordering must be unique)")
    }
    assert(rows.forall { r =>
      val (p, c) = (r.getDouble(5), r.getDouble(6))
      p >= 0 && p <= 1 && c > 0 && c <= 1 && r.getInt(7) >= 1 && r.getInt(7) <= 4
    })
  }

  test("q62 set ops: both/click_only partition the distinct click users") {
    val rows = Relational.setOps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val both = rows.filter(_._2 == "both").map(_._1).toSet
    val only = rows.filter(_._2 == "click_only").map(_._1).toSet
    assert((both & only).isEmpty, "a user cannot be in both partitions")
    val e = graft.queries.Tables.load(spark, sf, "events")
    val clicks = e.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert((both ++ only) === clicks)
  }

  test("q65 date dims: fields internally consistent, narrow plan") {
    val rows = Relational.dateDims(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (yr, mo, dom, qtr) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(qtr === (mo - 1) / 3 + 1)
      assert(dom >= 1 && dom <= 31 && yr >= 1990)
      assert(r.getInt(5) >= 1 && r.getInt(5) <= 7)   // iso_dow
      assert(r.getInt(6) >= 1 && r.getInt(6) <= 53)  // iso_week
      // month_end is the last day of d's month; d+30 lands after it
      // only when d is late enough in the month (sanity, not exactness)
      val monthEnd = r.getDate(8).toLocalDate
      assert(monthEnd.getDayOfMonth >= 28)
      assert(monthEnd.getMonthValue === mo && monthEnd.getYear === yr)
    }
    val plan = Relational.dateDims(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, // only the orderBy
      s"date dims must be a narrow projection:\n$plan")
  }

  test("q66 string funcs: derived fields agree with JVM string ops") {
    val rows = Relational.stringFuncs(spark, sf).collect()
    assert(rows.nonEmpty)
    val parts = graft.queries.Tables.load(spark, sf, "part")
      .select("p_partkey", "p_name", "p_brand").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    rows.take(100).foreach { r =>
      val (name, brand) = parts(r.getLong(0))
      assert(r.getString(1) === name.toUpperCase)
      assert(r.getInt(2) === name.length)
      assert(r.getString(3) === name.take(5))
      assert(r.getString(6) === brand.reverse)
      assert(r.getString(7) === name.split(" ")(0))
      assert(r.getInt(5) === name.indexOf("a") + 1)
    }
  }

  test("q63 semi/anti: per-nation counts sum to the customer total") {
    val rows = Relational.semiAntiJoin(spark, sf).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total === graft.queries.Tables.load(spark, sf, "customer").count())
    // semi/anti plan shape: no row-duplicating inner join of orders
    val plan = Relational.semiAntiJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"), plan)
  }

}
