package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable
import graft.plans.{MvDef, MvRewrite}

/** Aggregate-aware query rewrite ([[graft.plans.MvRewrite]]): an
  * Aggregate over a registered base table whose groupings/aggregates
  * decompose over a materialized view's partials re-plans onto the MV
  * scan — names, exprIds, filters, and rollup arithmetic preserved;
  * anything not provably decomposable scans the base untouched. */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try f
    finally {
      spark.experimental.extraOptimizations = prev
      MvRewrite.clear()
    }
  }

  /** Base (6 rows, dims status×prio, measure amount) + its MV. */
  private def fixture(prefix: String): String = {
    val dir = Fixtures.tempDir(prefix)
    val base = new VersionedTable(spark, dir + "/base")
    base.write(Seq(
      ("A", "hi", 10L, 1L), ("A", "hi", 20L, 2L), ("A", "lo", 5L, 3L),
      ("B", "hi", 7L, 4L), ("B", "lo", 3L, 5L), ("B", "lo", 9L, 6L))
      .toDF("status", "prio", "amount", "k"))
    val mv = new VersionedTable(spark, dir + "/mv")
    mv.write(base.read().groupBy("status", "prio").agg(
      sum("amount").as("sum_amount"), count(lit(1)).as("cnt"),
      min("amount").as("min_amount"), max("amount").as("max_amount")))
    MvRewrite.register(MvDef(
      baseRoot = dir + "/base",
      mv = () => new VersionedTable(spark, dir + "/mv").read(),
      dims = Seq("status", "prio"),
      sums = Map("amount" -> "sum_amount"),
      count = Some("cnt"),
      mins = Map("amount" -> "min_amount"),
      maxs = Map("amount" -> "max_amount")))
    dir
  }

  private def scannedRoots(df: DataFrame): Seq[String] =
    MvRewrite.scannedManifestRoots(df)

  test("rollup by one dim answers from the MV — sum/count/min/max, " +
      "names and a downstream sort survive the exprId handoff") {
    val dir = fixture("mv-rollup")
    withRule {
      val df = new VersionedTable(spark, dir + "/base").read()
        .groupBy("status")
        .agg(sum("amount").as("total"), count(lit(1)).as("n"),
          min("amount").as("lo"), max("amount").as("hi"))
        .orderBy(desc("total"))
      val roots = scannedRoots(df)
      assert(roots.nonEmpty && roots.forall(_.endsWith("/mv")), roots)
      assert(df.as[(String, Long, Long, Long, Long)].collect().toSeq ===
        Seq(("A", 35L, 3L, 5L, 20L), ("B", 19L, 3L, 3L, 9L)))
    }
  }

  test("dims-only filter re-binds onto the MV; a global aggregate " +
      "rolls every group up") {
    val dir = fixture("mv-filter")
    withRule {
      val filtered = new VersionedTable(spark, dir + "/base").read()
        .filter(col("prio") === "hi")
        .groupBy("status").agg(sum("amount").as("total"))
        .orderBy("status")
      assert(scannedRoots(filtered).forall(_.endsWith("/mv")))
      assert(filtered.as[(String, Long)].collect().toSeq ===
        Seq(("A", 30L), ("B", 7L)))
      val global = new VersionedTable(spark, dir + "/base").read()
        .agg(sum("amount").as("total"), count(lit(1)).as("n"))
      assert(scannedRoots(global).forall(_.endsWith("/mv")))
      assert(global.as[(Long, Long)].head() === ((54L, 6L)))
    }
  }

  test("conservative aborts: non-dim grouping, non-measure aggregate, " +
      "non-dim filter, and DISTINCT all scan the base") {
    val dir = fixture("mv-abort")
    withRule {
      def base(df: DataFrame): Boolean =
        scannedRoots(df).forall(_.endsWith("/base"))
      val vt = new VersionedTable(spark, dir + "/base")
      assert(base(vt.read().groupBy("k").agg(sum("amount"))))
      assert(base(vt.read().groupBy("status").agg(sum("k"))))
      assert(base(vt.read().filter(col("k") > 2)
        .groupBy("status").agg(sum("amount"))))
      assert(base(vt.read().groupBy("status")
        .agg(countDistinct("amount"))))
      // and they are all still CORRECT (the rule just declined)
      assert(vt.read().groupBy("status").agg(sum("k").as("s"))
        .orderBy("status").as[(String, Long)].collect().toSeq ===
        Seq(("A", 6L), ("B", 15L)))
    }
  }

  test("time-travel and file-pruned reads of the base are NOT " +
      "rewritten — the match is snapshot identity, not root path") {
    val dir = fixture("mv-travel")
    val base = new VersionedTable(spark, dir + "/base")
    base.write(Seq(("C", "hi", 100L, 7L)).toDF("status", "prio", "amount", "k"),
      org.apache.spark.sql.SaveMode.Append) // base v1 (MV still at v0 state)
    withRule {
      // v0 read: same root, DIFFERENT file set -> must scan the base
      val historic = base.readVersion(0).groupBy("status")
        .agg(sum("amount").as("total")).orderBy("status")
      assert(scannedRoots(historic).forall(_.endsWith("/base")))
      assert(historic.as[(String, Long)].collect().toSeq ===
        Seq(("A", 35L), ("B", 19L))) // no C: the v0 truth
    }
  }

  test("a pinned basisVersion declines the moment the base advances " +
      "— a stale MV falls back to the base plan, never serves old " +
      "totals") {
    val dir = Fixtures.tempDir("mv-basis")
    val base = new VersionedTable(spark, dir + "/base")
    base.write(Seq(("A", "hi", 10L, 1L), ("B", "hi", 20L, 2L))
      .toDF("status", "prio", "amount", "k"))
    val mv = new VersionedTable(spark, dir + "/mv")
    mv.write(base.read().groupBy("status", "prio").agg(
      sum("amount").as("sum_amount"), count(lit(1)).as("cnt")))
    val basis = base.currentVersion
    MvRewrite.register(MvDef(
      baseRoot = dir + "/base",
      mv = () => new VersionedTable(spark, dir + "/mv").read(),
      dims = Seq("status", "prio"),
      sums = Map("amount" -> "sum_amount"),
      count = Some("cnt"),
      basisVersion = () => basis))
    withRule {
      def q = new VersionedTable(spark, dir + "/base").read()
        .groupBy("status").agg(sum("amount").as("total"))
        .orderBy("status")
      assert(scannedRoots(q).forall(_.endsWith("/mv"))) // fresh: serves
      base.write(Seq(("C", "lo", 5L, 3L)).toDF("status", "prio", "amount", "k"),
        org.apache.spark.sql.SaveMode.Append) // base advances, MV stale
      assert(scannedRoots(q).forall(_.endsWith("/base"))) // declines
      assert(q.as[(String, Long)].collect().toSeq ===
        Seq(("A", 10L), ("B", 20L), ("C", 5L))) // CURRENT truth
    }
  }

  test("avg(measure) decomposes to sum(mv_sum)/sum(mv_cnt) — the " +
      "PER-MEASURE count, so NULL measure values divide out exactly; " +
      "a dims-only filter rides along") {
    val dir = Fixtures.tempDir("mv-avg")
    val base = new VersionedTable(spark, dir + "/base")
    base.write(Seq(
      ("A", "hi", Some(10L)), ("A", "hi", None), ("A", "lo", Some(5L)),
      ("B", "hi", Some(7L)), ("B", "lo", None), ("B", "lo", Some(9L)))
      .toDF("status", "prio", "amount"))
    val mv = new VersionedTable(spark, dir + "/mv")
    mv.write(base.read().groupBy("status", "prio").agg(
      sum("amount").as("sum_amount"), count(col("amount")).as("cnt_amount"),
      count(lit(1)).as("cnt")))
    MvRewrite.register(MvDef(
      baseRoot = dir + "/base",
      mv = () => new VersionedTable(spark, dir + "/mv").read(),
      dims = Seq("status", "prio"),
      sums = Map("amount" -> "sum_amount"),
      count = Some("cnt"),
      counts = Map("amount" -> "cnt_amount")))
    withRule {
      val df = new VersionedTable(spark, dir + "/base").read()
        .groupBy("status").agg(avg("amount").as("a"), count(lit(1)).as("n"))
        .orderBy("status")
      assert(scannedRoots(df).forall(_.endsWith("/mv")))
      // avg ignores the NULL: A = (10+5)/2, B = (7+9)/2 — count(*)
      // as divisor would give /3
      assert(df.as[(String, Double, Long)].collect().toSeq ===
        Seq(("A", 7.5d, 3L), ("B", 8.0d, 3L)))
      val filtered = new VersionedTable(spark, dir + "/base").read()
        .filter(col("prio") === "hi")
        .groupBy("status").agg(avg("amount").as("a")).orderBy("status")
      assert(scannedRoots(filtered).forall(_.endsWith("/mv")))
      assert(filtered.as[(String, Double)].collect().toSeq ===
        Seq(("A", 10.0d), ("B", 7.0d)))
      // count(measure) — the NON-NULL count — decomposes over the same
      // per-measure partials (count(*) would say 3)
      val cnt = new VersionedTable(spark, dir + "/base").read()
        .groupBy("status").agg(count(col("amount")).as("c"))
        .orderBy("status")
      assert(scannedRoots(cnt).forall(_.endsWith("/mv")))
      assert(cnt.as[(String, Long)].collect().toSeq ===
        Seq(("A", 2L), ("B", 2L)))
    }
  }

  test("avg over an ALL-NULL rollup bucket yields NULL from the MV, " +
      "exactly as the base plan") {
    val dir = Fixtures.tempDir("mv-avg-null")
    val base = new VersionedTable(spark, dir + "/base")
    base.write(Seq(("A", "hi", None: Option[Long]), ("A", "lo", None),
      ("B", "hi", Some(4L))).toDF("status", "prio", "amount"))
    val mv = new VersionedTable(spark, dir + "/mv")
    mv.write(base.read().groupBy("status", "prio").agg(
      sum("amount").as("sum_amount"), count(col("amount")).as("cnt_amount")))
    MvRewrite.register(MvDef(
      baseRoot = dir + "/base",
      mv = () => new VersionedTable(spark, dir + "/mv").read(),
      dims = Seq("status", "prio"),
      sums = Map("amount" -> "sum_amount"),
      counts = Map("amount" -> "cnt_amount")))
    withRule {
      val df = new VersionedTable(spark, dir + "/base").read()
        .groupBy("status").agg(avg("amount").as("a")).orderBy("status")
      assert(scannedRoots(df).forall(_.endsWith("/mv")))
      val rows = df.collect()
      assert(rows.length === 2 && rows(0).isNullAt(1) &&
        rows(1).getDouble(1) === 4.0d)
    }
  }

  test("avg DECLINES when the per-measure count is not registered — " +
      "count(*) is never substituted (NULLs would corrupt the mean)") {
    val dir = fixture("mv-avg-decline") // sums + count(*), no counts
    withRule {
      val df = new VersionedTable(spark, dir + "/base").read()
        .groupBy("status").agg(avg("amount").as("a")).orderBy("status")
      assert(scannedRoots(df).forall(_.endsWith("/base")))
      // and still correct through the base plan
      assert(df.as[(String, Double)].collect().toSeq ===
        Seq(("A", 35.0d / 3), ("B", 19.0d / 3)))
    }
  }

  test("the MV re-plans per query: a maintenance commit is served " +
      "immediately") {
    val dir = fixture("mv-fresh")
    val base = new VersionedTable(spark, dir + "/base")
    base.write(Seq(("C", "hi", 100L, 7L)).toDF("status", "prio", "amount", "k"),
      org.apache.spark.sql.SaveMode.Append)
    // maintain the MV (here: recompute; IVM delta-merge is q73's job)
    new VersionedTable(spark, dir + "/mv").write(
      base.read().groupBy("status", "prio").agg(
        sum("amount").as("sum_amount"), count(lit(1)).as("cnt"),
        min("amount").as("min_amount"), max("amount").as("max_amount")))
    withRule {
      val df = base.read().groupBy("status")
        .agg(sum("amount").as("total")).orderBy("status")
      assert(scannedRoots(df).forall(_.endsWith("/mv")))
      assert(df.as[(String, Long)].collect().toSeq ===
        Seq(("A", 35L), ("B", 19L), ("C", 100L)))
    }
  }
}
