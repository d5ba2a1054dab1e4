package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.incremental.Upsert

/** Delta-MERGE clause surface (`upsertWithClauses`): clause ordering
  * (delete before update), conditional insert, NULL clause conditions
  * meaning "clause not taken", and default-condition equivalence with
  * plain upsert. */
class MergeClausesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("delete/update/insert clauses: all four outcomes") {
    val target = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("id", "v")
    val source = Seq(
      (1L, "s1", "upsert"), // matched update
      (2L, "s2", "delete"), // matched delete
      (4L, "s4", "upsert"), // unmatched insert
      (5L, "s5", "delete") // unmatched delete command: must NOT insert
    ).toDF("id", "v", "op")
    val out = Upsert.upsertWithClauses(target, source, Seq("id"),
      deleteWhen = Some(col("s.op") === "delete"),
      insertWhen = Some(col("s.op") =!= "delete"),
      updateColumns = Some(Seq("v")))
    assert(canon(out) === Seq("1|s1", "3|t3", "4|s4"))
  }

  test("conditional update: non-matching rows keep target values") {
    val target = Seq((1L, 10, "t1"), (2L, 99, "t2")).toDF("id", "x", "v")
    val source = Seq((1L, 0, "s1"), (2L, 0, "s2")).toDF("id", "x", "v")
    val out = Upsert.upsertWithClauses(target, source, Seq("id"),
      updateWhen = Some(col("t.x") < 50), // only id=1 qualifies
      updateColumns = Some(Seq("v")))
    assert(canon(out.select("id", "v")) === Seq("1|s1", "2|t2"))
  }

  test("no clauses == plain upsert semantics") {
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("id", "v")
    val source = Seq((2L, "s2"), (3L, "s3")).toDF("id", "v")
    val a = Upsert.upsertWithClauses(target, source, Seq("id"))
    val b = Upsert.upsert(target, source, Seq("id"))
    assert(canon(a) === canon(b))
  }

  test("NULL clause condition means clause not taken") {
    val target = Seq((1L, "t1")).toDF("id", "v")
    // op NULL on the matched row: delete clause must not fire
    val source = Seq((1L, "s1", null.asInstanceOf[String]))
      .toDF("id", "v", "op")
    val out = Upsert.upsertWithClauses(target, source, Seq("id"),
      deleteWhen = Some(col("s.op") === "delete"),
      updateColumns = Some(Seq("v")))
    assert(canon(out) === Seq("1|s1"), "NULL delete-cond row still updates")
  }
}
