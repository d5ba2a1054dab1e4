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
}
