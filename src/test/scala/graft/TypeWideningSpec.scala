package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable

/** Type widening (Delta type widening): an append may widen int→long /
  * float→double — the snapshot schema grows to the wider type and the
  * existing narrow files read upcast natively (no rewrite); narrower
  * incoming data is accepted under a wider snapshot. Never narrows. */
class TypeWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def types(vt: VersionedTable): Map[String, String] =
    vt.read().schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  test("append widens int->long and float->double under the flag; " +
    "refused without; old narrow files read upcast") {
    val root = Fixtures.tempDir("widen") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f")) // int, float
    val wide = Seq((3L, 3.5), (4L, 4.5)).toDF("i", "f") // long, double
    intercept[IllegalArgumentException] {
      vt.write(wide, SaveMode.Append)
    }
    vt.write(wide, SaveMode.Append, allowTypeWidening = true)
    assert(types(vt) === Map("i" -> "bigint", "f" -> "double"))
    val rows = vt.read().collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(rows === Seq((1L, 1.5), (2L, 2.5), (3L, 3.5), (4L, 4.5)),
      "pre-widening files must read upcast, post-widening files native")
  }

  test("narrower incoming under a wider snapshot is accepted with the " +
    "flag; the snapshot schema never narrows") {
    val root = Fixtures.tempDir("widen2") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((10L, 1.25)).toDF("i", "f")) // long, double
    intercept[IllegalArgumentException] {
      vt.write(Seq((11, 2.25f)).toDF("i", "f"), SaveMode.Append)
    }
    vt.write(Seq((11, 2.25f)).toDF("i", "f"), SaveMode.Append,
      allowTypeWidening = true)
    assert(vt.read().schema("i").dataType === LongType)
    assert(vt.read().schema("f").dataType === DoubleType)
    assert(vt.read().collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(10L, 11L))
  }

  test("unrelated type changes stay refused even with the flag") {
    val root = Fixtures.tempDir("widen3") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1L, "a")).toDF("i", "s"))
    intercept[IllegalArgumentException] {
      vt.write(Seq((2L, 9.9)).toDF("i", "s"), SaveMode.Append,
        allowTypeWidening = true)
    }
  }
}
