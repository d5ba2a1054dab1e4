package graft

import scala.util.Random

import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable

/** SOUNDNESS property for [[graft.io.VersionedTable.predicateMayMatch]]
  * (the data-skipping analyzer behind the predicate DV DML, M46): for
  * ANY predicate the grammar below generates — conjunctions,
  * disjunctions, negations over numeric/string comparisons, IN,
  * prefix tests, and deliberately unanalyzable arithmetic — every
  * file that actually CONTAINS a matching row must be declared a
  * candidate. Completeness is not required (conservative scans are
  * fine); a single false prune is a correctness bug (rows silently
  * surviving a DELETE), which is exactly the defect class the r15
  * review caught on lexical string-vs-numeric partition compares.
  * Hand-driven randomness with a fixed seed, the repo's property
  * style. */
class DvPredicatePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leaf(r: Random): Column = r.nextInt(8) match {
    case 0 => col("k") === r.between(-5L, 45L)
    case 1 => col("k") <= r.between(-5L, 45L)
    case 2 => col("k") > r.between(-5L, 45L)
    case 3 => col("s") === "v%02d".format(r.between(-2, 42))
    case 4 => col("s").startsWith("v" + r.nextInt(4))
    case 5 => col("k").isin(
      Seq.fill(1 + r.nextInt(4))(r.between(-5L, 45L)): _*)
    case 6 => col("k") % 7 === r.nextInt(7) // unanalyzable on purpose
    case 7 => lit(r.between(-5L, 45L)) >= col("k") // flipped literal
  }

  private def genPred(r: Random, depth: Int): Column =
    if (depth == 0 || r.nextInt(3) == 0) leaf(r)
    else r.nextInt(3) match {
      case 0 => genPred(r, depth - 1) && genPred(r, depth - 1)
      case 1 => genPred(r, depth - 1) || genPred(r, depth - 1)
      case 2 => !genPred(r, depth - 1)
    }

  test("no generated predicate ever prunes a file that holds a " +
      "matching row (200 random predicates, fixed seed)") {
    val root = Fixtures.tempDir("dv-pred-prop") + "/tbl"
    val vt = new VersionedTable(spark, root)
    // 4 single-file commits: file i holds k in [10i, 10i+9]
    def stripe(i: Int) = (10L * i until 10L * i + 10)
      .map(k => (k, "v%02d".format(k), i)).toDF("k", "s", "f").coalesce(1)
    vt.write(stripe(0))
    (1 to 3).foreach(i => vt.write(stripe(i), SaveMode.Append))
    val m = vt.currentManifest
    // commit dirs are _data/c%08d_..., so relPath order == file id
    val entriesInOrder = m.entries.sortBy(_.relPath)
    assert(entriesInOrder.size === 4)
    val table = vt.read().localCheckpoint()
    val r = new Random(20260816L)
    (1 to 200).foreach { i =>
      val pred = genPred(r, depth = 3)
      val mayMatch = vt.predicateMayMatch(m, pred)
      val filesWithMatches = table.filter(pred)
        .select("f").distinct().as[Int].collect().toSet
      filesWithMatches.foreach { f =>
        assert(mayMatch(entriesInOrder(f)),
          s"predicate #$i falsely pruned file $f: $pred")
      }
    }
  }
}
