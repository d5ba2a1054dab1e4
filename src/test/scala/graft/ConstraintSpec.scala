package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{ConstraintViolationException, VersionedTable}

/** CHECK constraints on the versioned table: manifest round-trip,
  * SQL NULL-passes semantics, atomic rejection, survival across
  * overwrite/compaction/metadata commits, and existing-data
  * validation at add time (the Delta `ALTER TABLE ADD CONSTRAINT`
  * surface). */
class ConstraintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newTable(prefix: String): VersionedTable =
    new VersionedTable(spark,
      Fixtures.tempDir(prefix) + "/tbl")

  test("violating append is rejected atomically; valid append lands") {
    val vt = newTable("ct-basic")
    vt.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    vt.addCheckConstraint("amount_pos", "amount > 0")
    assert(vt.checkConstraints.map(_._1) === Seq("amount_pos"))
    val vBefore = vt.currentVersion.get
    val ex = intercept[ConstraintViolationException] {
      vt.write(Seq((3L, -1.0), (4L, 5.0)).toDF("id", "amount"),
        SaveMode.Append)
    }
    assert(ex.getMessage.contains("amount_pos"))
    assert(ex.getMessage.contains("1 row"))
    assert(vt.currentVersion.get === vBefore, "no version committed")
    vt.write(Seq((5L, 50.0)).toDF("id", "amount"), SaveMode.Append)
    assert(vt.read().count() === 3)
  }

  test("NULL predicate results pass (SQL CHECK semantics)") {
    val vt = newTable("ct-null")
    vt.write(Seq((1L, Some(10.0))).toDF("id", "amount"))
    vt.addCheckConstraint("amount_pos", "amount > 0")
    // NULL > 0 is NULL -> passes; use IS NOT NULL for NOT-NULL gates
    vt.write(Seq((2L, None: Option[Double])).toDF("id", "amount"),
      SaveMode.Append)
    assert(vt.read().count() === 2)
    // the explicit NOT-NULL spelling now refuses the table — the NULL
    // row that CHECK semantics admitted is existing data under it
    assertThrows[ConstraintViolationException] {
      vt.addCheckConstraint("amount_set", "amount IS NOT NULL")
    }
  }

  test("add-time validation scans existing rows") {
    val vt = newTable("ct-add")
    vt.write(Seq((1L, -5.0), (2L, 3.0)).toDF("id", "amount"))
    val ex = intercept[ConstraintViolationException] {
      vt.addCheckConstraint("amount_pos", "amount > 0")
    }
    assert(ex.getMessage.contains("amount_pos"))
    assert(vt.checkConstraints.isEmpty)
  }

  test("constraints survive overwrite, compaction, and other commits") {
    val vt = newTable("ct-survive")
    vt.write(Seq((1L, 1.0)).toDF("id", "amount"))
    vt.addCheckConstraint("amount_pos", "amount > 0")
    // overwrite with valid data keeps the constraint active
    vt.write((1L to 100L).map(i => (i, i * 1.0)).toDF("id", "amount"))
    vt.compact()
    assert(vt.checkConstraints.map(_._1) === Seq("amount_pos"))
    assertThrows[ConstraintViolationException] {
      vt.write(Seq((0L, 0.0)).toDF("id", "amount"), SaveMode.Append)
    }
    // and an overwrite itself is gated too
    assertThrows[ConstraintViolationException] {
      vt.write(Seq((0L, -1.0)).toDF("id", "amount"))
    }
  }

  test("drop re-opens the gate; expr round-trips commas and > chars") {
    val vt = newTable("ct-drop")
    vt.write(Seq((1L, "O")).toDF("id", "status"))
    vt.addCheckConstraint("status_domain", "status IN ('O','F') AND id > 0")
    assert(vt.checkConstraints ===
      Seq("status_domain" -> "status IN ('O','F') AND id > 0"))
    assertThrows[ConstraintViolationException] {
      vt.write(Seq((2L, "X")).toDF("id", "status"), SaveMode.Append)
    }
    vt.dropCheckConstraint("status_domain")
    vt.write(Seq((2L, "X")).toDF("id", "status"), SaveMode.Append)
    assert(vt.read().count() === 2)
    assertThrows[IllegalArgumentException] {
      vt.dropCheckConstraint("status_domain")
    }
  }

  test("UPDATE rewrites are gated (replaceWhere choke point)") {
    val vt = newTable("ct-update")
    vt.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    vt.addCheckConstraint("amount_pos", "amount > 0")
    // an update that would write violating rows is refused
    assertThrows[ConstraintViolationException] {
      vt.updateBetween("id", 2, 2, Map("amount" -> lit(-9.0)))
    }
    assert(vt.read().filter(col("amount") < 0).count() === 0)
    vt.updateBetween("id", 2, 2, Map("amount" -> lit(9.0)))
    assert(vt.read().filter(col("id") === 2).head().getDouble(1) === 9.0)
  }
}
