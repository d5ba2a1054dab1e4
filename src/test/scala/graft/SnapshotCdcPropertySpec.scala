package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.incremental.Upsert

/** Property tests for the snapshot-CDC identity (q225/q236): for ANY
  * pair of keyed snapshots — random inserts, deletes, value changes,
  * NULL flips, and untouched rows — `snapshotCdc(prev, next)` applied
  * back onto `prev` via `applyChanges` must reconstruct `next`
  * exactly, and the feed must contain NO rows for unchanged keys
  * (churn-proportional output is a correctness property here, not an
  * optimization). Hand-driven ScalaCheck Gen with fixed seeds (the
  * WinnowingPropertySpec convention). */
class SnapshotCdcPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType), // nullable: NULL flips must diff
    StructField("x", LongType)))

  // per key: present-in-prev / present-in-next / values (with nulls)
  private case class KeyFate(k: Long, inPrev: Boolean, inNext: Boolean,
      vPrev: Option[String], xPrev: Long, vNext: Option[String], xNext: Long)

  private val fate: Gen[Long => KeyFate] = for {
    inPrev <- Gen.prob(0.8)
    inNext <- Gen.prob(0.8)
    vPrev <- Gen.option(Gen.oneOf("a", "b", "c"))
    xPrev <- Gen.chooseNum(0L, 3L)
    changed <- Gen.prob(0.5)
    vNext <- if (changed) Gen.option(Gen.oneOf("a", "b", "c"))
             else Gen.const(vPrev)
    xNext <- if (changed) Gen.chooseNum(0L, 3L) else Gen.const(xPrev)
  } yield (k: Long) => KeyFate(k, inPrev, inNext, vPrev, xPrev, vNext, xNext)

  private def snapshots(seed: Long, n: Int) = {
    val fates = Gen.listOfN(n, fate)(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (f, i) => f(i.toLong) }
    import scala.jdk.CollectionConverters._
    def df(rows: Seq[Row]) = spark.createDataFrame(rows.asJava, schema)
    val prev = df(fates.filter(_.inPrev)
      .map(f => Row(f.k, f.vPrev.orNull, f.xPrev)))
    val next = df(fates.filter(_.inNext)
      .map(f => Row(f.k, f.vNext.orNull, f.xNext)))
    val unchangedKeys = fates.filter(f => f.inPrev && f.inNext &&
      f.vPrev == f.vNext && f.xPrev == f.xNext).map(_.k).toSet
    (prev, next, unchangedKeys)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("diff∘apply reconstructs the next snapshot on random mutations " +
    "(inserts, deletes, updates, NULL flips)") {
    (1 to 5).foreach { trial =>
      val (prev, next, _) = snapshots(trial * 977L, 120)
      val feed = Upsert.snapshotCdc(prev, next, Seq("k"))
        .filter(col("_change_type") =!= "update_preimage")
        .withColumn("op", when(col("_change_type") === "delete", "delete")
          .otherwise("upsert"))
        .withColumn("seq", lit(1L))
        .drop("_change_type")
      val rebuilt = Upsert.applyChanges(prev, feed, Seq("k"), "seq",
        opCol = Some("op"))
      assert(canon(rebuilt) === canon(next),
        s"trial $trial: diff∘apply must be the identity onto next")
    }
  }

  test("the feed is churn-proportional: unchanged keys emit nothing, " +
    "updates emit exactly a pre/post pair") {
    (1 to 5).foreach { trial =>
      val (prev, next, unchanged) = snapshots(trial * 1913L, 120)
      val feed = Upsert.snapshotCdc(prev, next, Seq("k"))
      val byKey = feed.groupBy("k")
        .agg(collect_list(col("_change_type")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
      unchanged.foreach(k => assert(!byKey.contains(k),
        s"trial $trial: unchanged key $k leaked into the feed"))
      byKey.values.foreach { ts =>
        assert(ts == Seq("insert") || ts == Seq("delete") ||
          ts == Seq("update_postimage", "update_preimage"),
          s"trial $trial: malformed change set $ts")
      }
    }
  }
}
