package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable
import graft.sql.{GraftCatalog, GraftSql}

/** Randomized soundness of star-join MV maintenance: under random
  * interleavings of fact DML (insert / DV delete / update), dim DML
  * (insert / attribute move / delete), and maintenance (OPTIMIZE on
  * either side), every REFRESH must land the summary — including its
  * min/max columns — exactly on a from-scratch aggregate of the
  * joined CURRENT snapshots. Deterministic seeds; each seed runs a
  * fresh warehouse. A wrong telescoping term, a dim joined at the
  * wrong version, a missed re-sign, or a min/max fold that survived a
  * delete it should not have all fail the equality. */
class MvJoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recompute(cat: GraftCatalog)
      : Seq[(String, Long, Long, Long, Long)] =
    GraftSql.exec(spark,
      """SELECT d.cat AS cat, sum(f.cents) AS s, count(*) AS n,
                min(f.cents) AS lo, max(f.cents) AS hi
         FROM fact f JOIN dim d ON f.pid = d.pid
         GROUP BY d.cat ORDER BY cat""", cat)
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  private def mvState(cat: GraftCatalog)
      : Seq[(String, Long, Long, Long, Long)] =
    GraftSql.exec(spark,
      "SELECT cat, s, n, lo, hi FROM jpmv ORDER BY cat", cat)
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  for (seed <- Seq(11, 42, 97)) {
    test(s"random fact/dim DML + maintenance interleavings, seed " +
        s"$seed: every REFRESH equals the joined recompute") {
      val rnd = new scala.util.Random(seed)
      val wh = Fixtures.tempDir(s"graft-mvjoin-prop$seed") + "/wh"
      val cat = new GraftCatalog(spark, wh)
      val cats = Seq("a", "b", "c", "d")
      var nextPid = 41L
      new VersionedTable(spark, cat.rootOf("fact"))
        .write((1L to 40L).map(p => (p, (p % 13) * 100 + p))
          .toDF("pid", "cents")
          .repartitionByRange(3, col("pid")))
      new VersionedTable(spark, cat.rootOf("dim"))
        .write((1L to 40L).map(p => (p, cats((p % 4).toInt)))
          .toDF("pid", "cat"))
      GraftSql.exec(spark,
        """CREATE MATERIALIZED VIEW jpmv AS
           SELECT cat, sum(cents) AS s, count(cents) AS c,
                  min(cents) AS lo, max(cents) AS hi, count(*) AS n
           FROM fact f JOIN dim d ON f.pid = d.pid
           GROUP BY cat""", cat)
      assert(mvState(cat) === recompute(cat), s"seed $seed, CREATE")
      var refreshes = 0
      (1 to 14).foreach { step =>
        rnd.nextInt(8) match {
          case 0 => // fact inserts (some without a dim row yet)
            val k = nextPid; nextPid += 3
            GraftSql.exec(spark, s"INSERT INTO fact VALUES " +
              s"($k, ${rnd.nextInt(5000)}), " +
              s"(${k + 1}, ${rnd.nextInt(5000)})", cat)
          case 1 => // fact DV delete band
            val lo = 1 + rnd.nextInt(40)
            GraftSql.exec(spark, s"DELETE FROM fact WHERE pid " +
              s"BETWEEN $lo AND ${lo + rnd.nextInt(6)}", cat)
          case 2 => // fact update (re-price)
            val m = 2 + rnd.nextInt(5)
            GraftSql.exec(spark, s"UPDATE fact SET cents = cents + 7 " +
              s"WHERE pid % $m = 0", cat)
          case 3 => // late-arriving dim rows (match waiting facts)
            GraftSql.exec(spark, s"INSERT INTO dim VALUES " +
              s"(${nextPid - 3}, '${cats(rnd.nextInt(4))}'), " +
              s"(${nextPid - 2}, '${cats(rnd.nextInt(4))}')", cat)
          case 4 => // dim attribute move
            val m = 2 + rnd.nextInt(6)
            GraftSql.exec(spark, s"UPDATE dim SET cat = " +
              s"'${cats(rnd.nextInt(4))}' WHERE pid % $m = 1", cat)
          case 5 => // dim delete (its facts leave the join)
            val p = 1 + rnd.nextInt(40)
            GraftSql.exec(spark, s"DELETE FROM dim WHERE pid = $p", cat)
          case 6 =>
            GraftSql.exec(spark,
              if (rnd.nextBoolean()) "OPTIMIZE fact" else "OPTIMIZE dim",
              cat)
          case 7 =>
            GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jpmv", cat)
            refreshes += 1
            assert(mvState(cat) === recompute(cat),
              s"seed $seed diverged at step $step (after refresh)")
        }
      }
      GraftSql.exec(spark, "REFRESH MATERIALIZED VIEW jpmv", cat)
      assert(mvState(cat) === recompute(cat), s"seed $seed, final")
      assert(refreshes >= 0) // the final refresh always checks
    }
  }
}
