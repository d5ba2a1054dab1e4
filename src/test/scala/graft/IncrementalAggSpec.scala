package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.IncrementalAgg
import graft.io.VersionedTable

/** Incremental view maintenance: a maintained aggregate must equal a
  * full recompute after ANY chain of appends / deletes — including
  * deletes that empty a group, re-inserts into an emptied group, and
  * deletion-vector commits whose feed is a row-level diff. */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")
  private val sums = Seq("x")

  private def frame(rows: Seq[(Long, String, java.math.BigDecimal)]): DataFrame =
    rows.toDF("id", "k", "x_raw")
      .select(col("id"), col("k"), col("x_raw").cast("decimal(18,4)").as("x"))

  private def dec(d: Double) = new java.math.BigDecimal(d)

  private def canon(df: DataFrame): Seq[(String, Long, String)] =
    df.select(col("k"), col(IncrementalAgg.CountCol),
      col(IncrementalAgg.sumCol("x")).cast("decimal(28,4)").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq

  test("maintained aggregate equals recompute across a mutation chain") {
    val root = Fixtures.tempDir("graft-ivm") + "/tbl"
    val vt = new VersionedTable(spark, root)
    val base = (0L until 300L).map(i => (i, s"g${i % 7}", dec(i * 1.25)))
    vt.write(frame(base)) // v0
    var agg = IncrementalAgg.compute(vt.read(), keys, sums)

    // append (file-level feed)
    val v0 = vt.currentVersion.get
    vt.write(frame((300L until 400L).map(i => (i, s"g${i % 7}", dec(i * 1.25)))),
      SaveMode.Append)
    val v1 = vt.currentVersion.get
    agg = IncrementalAgg.update(agg, vt.changes(v0, v1), keys, sums)
    assert(canon(agg) === canon(IncrementalAgg.compute(vt.read(), keys, sums)))

    // DV delete (row-level feed)
    vt.deleteVectorized("id", 50, 149)
    val v2 = vt.currentVersion.get
    agg = IncrementalAgg.update(agg, vt.changes(v1, v2), keys, sums)
    assert(canon(agg) === canon(IncrementalAgg.compute(vt.read(), keys, sums)))

    // rewrite delete (replaceWhere feed)
    vt.deleteBetween("id", 150, 249)
    val v3 = vt.currentVersion.get
    agg = IncrementalAgg.update(agg, vt.changes(v2, v3), keys, sums)
    assert(canon(agg) === canon(IncrementalAgg.compute(vt.read(), keys, sums)))
  }

  test("a group deleted to zero disappears; a re-insert resurrects it") {
    val root = Fixtures.tempDir("graft-ivm-zero") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(frame(Seq((1L, "only", dec(10.0)), (2L, "other", dec(5.0))))) // v0
    val v0 = vt.currentVersion.get
    var agg = IncrementalAgg.compute(vt.read(), keys, sums)
    vt.deleteVectorized("id", 1, 1) // empties group "only"
    val v1 = vt.currentVersion.get
    agg = IncrementalAgg.update(agg, vt.changes(v0, v1), keys, sums)
    assert(canon(agg).map(_._1) === Seq("other"))
    vt.write(frame(Seq((3L, "only", dec(7.5)))), SaveMode.Append)
    val v2 = vt.currentVersion.get
    agg = IncrementalAgg.update(agg, vt.changes(v1, v2), keys, sums)
    assert(canon(agg) === canon(IncrementalAgg.compute(vt.read(), keys, sums)))
  }

  test("non-additive aggregates maintain via scoped group recompute") {
    val root = Fixtures.tempDir("graft-ivm-minmax") + "/tbl"
    val vt = new VersionedTable(spark, root)
    val base = (0L until 100L).map(i => (i, s"g${i % 5}", dec(i * 1.0)))
    vt.write(frame(base)) // v0
    val v0 = vt.currentVersion.get
    def mm(df: DataFrame) = df.groupBy("k")
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"))
    var agg = mm(vt.read())
    // delete the max rows of two groups — exactly what additive IVM
    // cannot maintain
    vt.deleteVectorized("id", 95, 99)
    val v1 = vt.currentVersion.get
    agg = IncrementalAgg.updateByRecompute(agg, vt.read(),
      vt.changes(v0, v1), keys, mm)
    val got = agg.orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getDecimal(2)))
    val want = mm(vt.read()).orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1), r.getDecimal(2)))
    assert(got === want)
  }
}
