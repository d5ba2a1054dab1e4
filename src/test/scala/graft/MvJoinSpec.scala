package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable
import graft.sql.{GraftCatalog, GraftSql, MaterializedView}

/** Star-join materialized views ([[graft.sql.MaterializedView]]):
  * `CREATE MATERIALIZED VIEW mv AS SELECT … FROM fact JOIN dim ON …
  * GROUP BY …` with EXACT two-sided incremental maintenance —
  * `F₁⋈D₁ − F₀⋈D₀ = ΔF⋈D₁ ∪ F₀⋈ΔD` — where the common fact-only
  * refresh never reads the old fact, and a dim-side delta restricts
  * the old-fact read by a join-key envelope pushed to manifest stats
  * pruning. */
class MvJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** fact(pid, cents) striped into 3 files by pid range;
    * dim(pid, cat). */
  private def starFixture(prefix: String)
      : (GraftCatalog, VersionedTable, VersionedTable) = {
    val wh = Fixtures.tempDir(prefix) + "/wh"
    val cat = new GraftCatalog(spark, wh)
    val fact = new VersionedTable(spark, cat.rootOf("fact"))
    // pids 1..30, cents = pid*100; stripes [1,10] [11,20] [21,30]
    fact.write((1L to 30L).map(p => (p, p * 100L)).toDF("pid", "cents")
      .repartitionByRange(3, col("pid")))
    val dim = new VersionedTable(spark, cat.rootOf("dim"))
    dim.write((1L to 30L).map(p =>
      (p, if (p <= 10) "a" else if (p <= 20) "b" else "c"))
      .toDF("pid", "cat"))
    (cat, fact, dim)
  }

  private def recompute(cat: GraftCatalog): Seq[(String, Long, Long)] =
    GraftSql.exec(spark,
      """SELECT d.cat AS cat, sum(f.cents) AS s, count(*) AS n
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY d.cat ORDER BY cat""", cat)
      .as[(String, Long, Long)].collect().toSeq

  private def mvContents(cat: GraftCatalog): Seq[(String, Long, Long)] =
    GraftSql.exec(spark,
      "SELECT cat, s, n FROM jmv ORDER BY cat", cat)
      .as[(String, Long, Long)].collect().toSeq

  test("two-sided IVM: fact-only deltas never read the old fact; a " +
      "dim attribute move regroups exactly with a key-pruned old-fact " +
      "read; a both-sides window and an emptied group stay exact") {
    val (cat, fact, _) = starFixture("graft-mvjoin")
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW jmv AS
         SELECT cat, sum(cents) AS s, count(cents) AS c, count(*) AS n
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY cat""", cat)
    assert(mvContents(cat) === recompute(cat))
    // 1) fact-only delta: the refresh is ΔF ⋈ D_new alone — the old
    // fact snapshot must not be read at all; the unmatched new fact
    // row (no dim entry yet) drops consistently on both paths
    GraftSql.exec(spark, "INSERT INTO fact VALUES (31, 5000)", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(MaterializedView.lastJoinFactRead.isEmpty,
      "a fact-only refresh must not read the old fact snapshot")
    assert(mvContents(cat) === recompute(cat))
    // the late-arriving dim row then joins the OLD fact via F₀⋈ΔD
    GraftSql.exec(spark, "INSERT INTO dim VALUES (31, 'c')", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(MaterializedView.lastJoinFactRead.isDefined)
    assert(mvContents(cat) === recompute(cat))
    // 2) dim-only attribute move: pid=5 changes category a→b; the
    // old-fact read must plan ONLY the stripe holding pid=5
    GraftSql.exec(spark, "UPDATE dim SET cat = 'b' WHERE pid = 5", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    val scoped = MaterializedView.lastJoinFactRead
    assert(scoped.isDefined, "a dim delta must read the old fact")
    val planned = scoped.get.inputFiles.toSeq
    val allFiles = fact.read().inputFiles.toSeq
    assert(planned.nonEmpty && planned.size < allFiles.size,
      s"the old-fact read must be key-envelope-pruned: planned " +
        s"${planned.size} of ${allFiles.size} files")
    assert(mvContents(cat) === recompute(cat))
    // 3) both sides in ONE window: new facts + another dim move
    GraftSql.exec(spark, "INSERT INTO fact VALUES (32, 7000)", cat)
    GraftSql.exec(spark, "INSERT INTO dim VALUES (32, 'a')", cat)
    GraftSql.exec(spark, "UPDATE dim SET cat = 'b' WHERE pid = 1", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(mvContents(cat) === recompute(cat))
    // 4) a group emptied entirely vanishes from the summary
    GraftSql.exec(spark,
      "DELETE FROM fact WHERE pid > 20 AND pid <= 31", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(mvContents(cat) === recompute(cat))
    assert(!mvContents(cat).exists(_._1 == "c"),
      "category c lost every fact row and must leave the MV")
    // 5) already-fresh refresh is a no-op commit-wise
    val mvVt = new VersionedTable(spark, cat.rootOf("jmv"))
    val v = mvVt.currentVersion.get
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(mvVt.currentVersion.get === v)
  }

  test("freshness, SHOW CREATE round-trip, and registry hygiene for " +
      "star-join MVs") {
    val (cat, _, _) = starFixture("graft-mvjoin-meta")
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW jmv AS
         SELECT cat, sum(cents) AS s, count(cents) AS c, count(*) AS n
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY cat""", cat)
    // fresh now; a DIM commit alone must flip the freshness flag
    def freshRow = GraftSql.exec(spark, "SHOW MATERIALIZED VIEWS", cat)
      .as[(String, String, Long, Long, Boolean)].collect()
      .find(_._1 == "jmv").get
    assert(freshRow._2 === "fact JOIN dim" && freshRow._5 === true)
    GraftSql.exec(spark, "INSERT INTO dim VALUES (99, 'z')", cat)
    assert(freshRow._5 === false,
      "a dim-side commit must read as stale")
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(freshRow._5 === true)
    // SHOW CREATE reconstructs the join form
    val stmt = GraftSql.exec(spark, "SHOW CREATE TABLE jmv", cat)
      .as[String].head()
    assert(stmt.contains("FROM fact JOIN dim ON fact.pid = dim.pid") &&
      stmt.contains("sum(cents) AS s") && stmt.contains("GROUP BY cat"))
    // a join MV registers for the aggregate-navigator rewrite too
    assert(MaterializedView.registeredRoots.contains(cat.rootOf("jmv")))
    GraftSql.exec(spark, "DROP MATERIALIZED VIEW jmv", cat)
    assert(!MaterializedView.registeredRoots.contains(cat.rootOf("jmv")))
    assert(GraftSql.exec(spark, "SHOW MATERIALIZED VIEWS", cat)
      .filter(col("name") === "jmv").count() === 0L)
  }

  test("the aggregate navigator serves fact⋈dim dashboards from the " +
      "join MV: exact key-pair match either join order, dims-only " +
      "filters re-bind, inferred IsNotNull(key)s drop; a measure " +
      "filter or a stale base declines to the join plan") {
    val (cat, _, _) = starFixture("graft-mvjoin-rewrite")
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW jmv AS
         SELECT cat, sum(cents) AS s, count(cents) AS c, count(*) AS n
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY cat""", cat)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.MvRewrite
    try {
      def roots(df: org.apache.spark.sql.DataFrame) =
        graft.plans.MvRewrite.scannedManifestRoots(df)
      val q = GraftSql.exec(spark,
        """SELECT cat, sum(cents) AS s, count(*) AS n
           FROM fact f JOIN dim d ON f.pid = d.pid
           GROUP BY cat ORDER BY cat""", cat)
      assert(roots(q).nonEmpty && roots(q).forall(_.endsWith("/jmv")),
        s"join rewrite did not fire: scanned ${roots(q)}")
      assert(q.as[(String, Long, Long)].collect().toSeq ===
        Seq(("a", 5500L, 10L), ("b", 15500L, 10L), ("c", 25500L, 10L)))
      // opposite join order matches too
      val qSwap = GraftSql.exec(spark,
        """SELECT cat, count(*) AS n
           FROM dim d JOIN fact f ON f.pid = d.pid
           GROUP BY cat ORDER BY cat""", cat)
      assert(roots(qSwap).forall(_.endsWith("/jmv")))
      // a dims-only WHERE re-binds onto the MV (Catalyst pushes it
      // below the join and infers IsNotNulls — both handled)
      val qf = GraftSql.exec(spark,
        """SELECT cat, sum(cents) AS s
           FROM fact f JOIN dim d ON f.pid = d.pid
           WHERE cat <> 'b' GROUP BY cat ORDER BY cat""", cat)
      assert(roots(qf).forall(_.endsWith("/jmv")),
        s"dims-only filter must re-bind, scanned ${roots(qf)}")
      assert(qf.as[(String, Long)].collect().toSeq ===
        Seq(("a", 5500L), ("c", 25500L)))
      // avg(measure) over the join decomposes onto the MV's
      // sum/count partials — the per-measure NON-NULL count
      val qAvg = GraftSql.exec(spark,
        """SELECT cat, avg(cents) AS a
           FROM fact f JOIN dim d ON f.pid = d.pid
           GROUP BY cat ORDER BY cat""", cat)
      assert(roots(qAvg).forall(_.endsWith("/jmv")),
        s"avg over the join must serve from the MV: ${roots(qAvg)}")
      assert(qAvg.as[(String, Double)].collect().toSeq ===
        Seq(("a", 550.0), ("b", 1550.0), ("c", 2550.0)))
      // a MEASURE filter cannot re-bind: the join plan serves
      val qm = GraftSql.exec(spark,
        """SELECT cat, count(*) AS n
           FROM fact f JOIN dim d ON f.pid = d.pid
           WHERE cents > 500 GROUP BY cat""", cat)
      assert(qm.count() >= 1 && !roots(qm).exists(_.endsWith("/jmv")))
      // a commit on the DIM side alone makes the rewrite decline
      GraftSql.exec(spark, "INSERT INTO dim VALUES (99, 'z')", cat)
      val qStale = GraftSql.exec(spark,
        """SELECT cat, count(*) AS n
           FROM fact f JOIN dim d ON f.pid = d.pid
           GROUP BY cat""", cat)
      assert(!roots(qStale).exists(_.endsWith("/jmv")),
        "a stale dim basis must fall back to the join plan")
      GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
      val qFresh = GraftSql.exec(spark,
        """SELECT cat, count(*) AS n
           FROM fact f JOIN dim d ON f.pid = d.pid
           GROUP BY cat""", cat)
      assert(roots(qFresh).forall(_.endsWith("/jmv")))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("N-dim star: fact ⋈ dimP ⋈ dimS maintains exactly through " +
      "fact-only, one-dim, and all-three-sides windows; the navigator " +
      "serves the 3-leaf join and its rollups; a middle-dim commit " +
      "declines") {
    val wh = Fixtures.tempDir("graft-mvjoin-ndim") + "/wh"
    val cat2 = new GraftCatalog(spark, wh)
    val fact = new VersionedTable(spark, cat2.rootOf("fact"))
    // pid 1..20, sid = pid % 4, cents = pid * 100
    fact.write((1L to 20L).map(p => (p, p % 4, p * 100L))
      .toDF("pid", "sid", "cents").repartitionByRange(2, col("pid")))
    new VersionedTable(spark, cat2.rootOf("dimp"))
      .write((1L to 20L).map(p => (p, if (p <= 10) "x" else "y"))
        .toDF("pid", "cat"))
    new VersionedTable(spark, cat2.rootOf("dims"))
      .write((0L to 3L).map(s => (s, if (s < 2) "east" else "west"))
        .toDF("sid", "region"))
    def recompute2: Seq[(String, String, Long, Long)] =
      GraftSql.exec(spark,
        """SELECT p.cat AS cat, s.region AS region,
                  sum(f.cents) AS sc, count(*) AS n
           FROM fact f JOIN dimp p ON f.pid = p.pid
                       JOIN dims s ON f.sid = s.sid
           GROUP BY p.cat, s.region ORDER BY cat, region""", cat2)
        .as[(String, String, Long, Long)].collect().toSeq
    def mv2: Seq[(String, String, Long, Long)] =
      GraftSql.exec(spark,
        "SELECT cat, region, sc, n FROM jmv2 ORDER BY cat, region",
        cat2).as[(String, String, Long, Long)].collect().toSeq
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW jmv2 AS
         SELECT cat, region, sum(cents) AS sc, count(cents) AS cc,
                count(*) AS n
         FROM fact f JOIN dimp p ON f.pid = p.pid
                     JOIN dims s ON f.sid = s.sid
         GROUP BY cat, region""", cat2)
    assert(mv2 === recompute2)
    // fact-only window: neither dim read signed, old fact untouched
    GraftSql.exec(spark, "INSERT INTO fact VALUES (21, 1, 9999)", cat2)
    GraftSql.exec(spark, "INSERT INTO dimp VALUES (21, 'y')", cat2)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv2", cat2)
    assert(mv2 === recompute2)
    // one-dim window: a region flips; exact regrouping
    GraftSql.exec(spark,
      "UPDATE dims SET region = 'west' WHERE sid = 1", cat2)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv2", cat2)
    assert(mv2 === recompute2)
    // all three sides in ONE window
    GraftSql.exec(spark, "INSERT INTO fact VALUES (22, 2, 777)", cat2)
    GraftSql.exec(spark, "INSERT INTO dimp VALUES (22, 'x')", cat2)
    GraftSql.exec(spark,
      "UPDATE dimp SET cat = 'y' WHERE pid = 3", cat2)
    GraftSql.exec(spark,
      "UPDATE dims SET region = 'east' WHERE sid = 3", cat2)
    GraftSql.exec(spark, "DELETE FROM fact WHERE pid BETWEEN 5 AND 8",
      cat2)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv2", cat2)
    assert(mv2 === recompute2)
    // fold the DV masks away (pure scans again) and re-sync: the
    // navigator only substitutes provably-identical snapshots
    GraftSql.exec(spark, "OPTIMIZE fact", cat2)
    GraftSql.exec(spark, "OPTIMIZE dimp", cat2)
    GraftSql.exec(spark, "OPTIMIZE dims", cat2)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv2", cat2)
    // the navigator serves the 3-leaf join and a coarser rollup
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.MvRewrite
    try {
      def roots(df: org.apache.spark.sql.DataFrame) =
        graft.plans.MvRewrite.scannedManifestRoots(df)
      val q3 = GraftSql.exec(spark,
        """SELECT cat, region, sum(cents) AS sc, count(*) AS n
           FROM fact f JOIN dimp p ON f.pid = p.pid
                       JOIN dims s ON f.sid = s.sid
           GROUP BY cat, region ORDER BY cat, region""", cat2)
      assert(roots(q3).nonEmpty && roots(q3).forall(_.endsWith("/jmv2")),
        s"3-leaf join rewrite did not fire: scanned ${roots(q3)}")
      assert(q3.as[(String, String, Long, Long)].collect().toSeq ===
        recompute2)
      val qRoll = GraftSql.exec(spark,
        """SELECT region, sum(cents) AS sc
           FROM fact f JOIN dimp p ON f.pid = p.pid
                       JOIN dims s ON f.sid = s.sid
           GROUP BY region ORDER BY region""", cat2)
      assert(roots(qRoll).forall(_.endsWith("/jmv2")),
        "a coarser rollup over the star must still serve from the MV")
      // a commit on ONE dim makes the whole star decline
      GraftSql.exec(spark, "INSERT INTO dims VALUES (9, 'north')", cat2)
      val qStale = GraftSql.exec(spark,
        """SELECT cat, count(*) AS n
           FROM fact f JOIN dimp p ON f.pid = p.pid
                       JOIN dims s ON f.sid = s.sid
           GROUP BY cat""", cat2)
      assert(!roots(qStale).exists(_.endsWith("/jmv2")))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("min/max on a star-join MV: insert-only windows fold free; a " +
      "fact DELETE that removes a group's extremum — and a dim MOVE " +
      "that re-signs it away — re-aggregate ONLY the affected groups " +
      "over the joined base") {
    val (cat, _, _) = starFixture("graft-mvjoin-minmax")
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW jmm AS
         SELECT cat, min(cents) AS lo, max(cents) AS hi, count(*) AS n
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY cat""", cat)
    def mm: Seq[(String, Long, Long, Long)] =
      GraftSql.exec(spark,
        "SELECT cat, lo, hi, n FROM jmm ORDER BY cat", cat)
        .as[(String, Long, Long, Long)].collect().toSeq
    def regold: Seq[(String, Long, Long, Long)] =
      GraftSql.exec(spark,
        """SELECT d.cat AS cat, min(f.cents) AS lo, max(f.cents) AS hi,
                  count(*) AS n
           FROM fact f JOIN dim d ON f.pid = d.pid
           GROUP BY d.cat ORDER BY cat""", cat)
        .as[(String, Long, Long, Long)].collect().toSeq
    assert(mm === regold)
    // insert-only window: least/greatest fold, NO re-aggregation read
    GraftSql.exec(spark, "INSERT INTO fact VALUES (7, 50)", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmm", cat)
    assert(MaterializedView.lastReaggRead.isEmpty,
      "an insert-only join refresh must not re-aggregate")
    assert(mm === regold)
    // a fact DELETE removes group a's max (pid=10, cents=1000):
    // ONLY group a re-aggregates
    GraftSql.exec(spark, "DELETE FROM fact WHERE cents = 1000", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmm", cat)
    assert(MaterializedView.lastReaggRead.isDefined,
      "a delete-affected min/max group must re-aggregate")
    assert(mm === regold)
    // a dim MOVE re-signs pid=20 (group b's max) into group c: BOTH
    // groups change, the MV stays exact
    GraftSql.exec(spark, "UPDATE dim SET cat = 'c' WHERE pid = 20", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmm", cat)
    assert(mm === regold)
  }

  test("parse guards: ambiguous columns, unknown measures, and " +
      "non-equi ON are refused loudly; a RESTORE window folds exactly " +
      "through the snapshot-diff slice") {
    val (cat, _, _) = starFixture("graft-mvjoin-guards")
    // a column living in BOTH sides (and not a join key) is ambiguous
    val dim2 = new VersionedTable(spark, cat.rootOf("dim2"))
    dim2.write(Seq((1L, 999L, "a")).toDF("pid", "cents", "cat"))
    val e1 = intercept[RuntimeException] { GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW bad1 AS
         SELECT cat, sum(cents) AS s, count(cents) AS c, count(*) AS n
         FROM fact f JOIN dim2 d ON f.pid = d.pid
         GROUP BY cat""", cat) }
    assert(e1.getMessage.contains("multiple join sides"))
    val e2 = intercept[RuntimeException] { GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW bad2 AS
         SELECT cat, min(ratio) AS lo, count(*) AS n
         FROM fact f JOIN dim2 d ON f.pid = d.pid
         GROUP BY cat""", cat) }
    assert(e2.getMessage.contains("neither"))
    val e3 = intercept[RuntimeException] { GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW bad3 AS
         SELECT cat, count(*) AS n
         FROM fact f JOIN dim d ON f.pid < d.pid
         GROUP BY cat""", cat) }
    assert(e3.getMessage.contains("conjunction") ||
      e3.getMessage.contains("equate"))
    // a RESTORE in the dim window is a non-derivable commit: the
    // feed pays one snapshot diff for THAT slice and the fold stays
    // exact — the un-did dim insert re-signs its joined facts away
    GraftSql.exec(spark,
      """CREATE MATERIALIZED VIEW jmv AS
         SELECT cat, sum(cents) AS s, count(cents) AS c, count(*) AS n
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY cat""", cat)
    GraftSql.exec(spark, "UPDATE dim SET cat = 'z' WHERE pid = 7", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(mvContents(cat).exists(_._1 == "z"))
    GraftSql.exec(spark, "RESTORE TABLE dim TO VERSION AS OF 0", cat)
    GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jmv", cat)
    assert(mvContents(cat) === recompute(cat))
    assert(!mvContents(cat).exists(_._1 == "z"),
      "the RESTORE must fold category z back out of the MV")
  }
}
