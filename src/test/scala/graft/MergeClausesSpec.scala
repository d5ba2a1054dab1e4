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

  test("schema evolution OFF (default): source-only columns dropped") {
    val target = Seq((1L, "t1")).toDF("id", "v")
    val source = Seq((1L, "s1", "extra")).toDF("id", "v", "tag")
    assert(Upsert.upsert(target, source, Seq("id")).columns.toSeq ===
      Seq("id", "v"))
  }

  test("schema evolution: new column from source on matched+inserted, " +
    "NULL on target-only rows") {
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("id", "v")
    val source = Seq((2L, "s2", "g2"), (3L, "s3", "g3")).toDF("id", "v", "tag")
    val out = Upsert.upsert(target, source, Seq("id"), evolveSchema = true)
    assert(out.columns.toSeq === Seq("id", "v", "tag"))
    assert(canon(out) === Seq("1|t1|null", "2|s2|g2", "3|s3|g3"))
  }

  test("schema evolution with clauses: the new column lands only where " +
    "update/insert actually fired") {
    val target = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("id", "v")
    val source = Seq(
      (1L, "s1", "upsert", "g1"), // matched update -> takes tag
      (2L, "s2", "delete", "g2"), // matched delete -> row gone
      (4L, "s4", "upsert", "g4") // insert -> takes tag
    ).toDF("id", "v", "op", "tag")
    val out = Upsert.upsertWithClauses(target, source, Seq("id"),
      deleteWhen = Some(col("s.op") === "delete"),
      insertWhen = Some(col("s.op") =!= "delete"),
      updateColumns = Some(Seq("v")), evolveSchema = true)
    assert(out.columns.toSeq === Seq("id", "v", "op", "tag"))
    assert(canon(out.select("id", "v", "tag")) ===
      Seq("1|s1|g1", "3|t3|null", "4|s4|g4"))
  }

  test("applyChanges folds an out-of-order CDC feed to latest-by-seq " +
    "before merging: late old changes never clobber newer state") {
    val target = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("id", "v")
    val feed = Seq(
      (1L, "old", 1L, "upsert"), (1L, "new", 2L, "upsert"), // fold to new
      (2L, "late", 3L, "upsert"), (2L, "x", 5L, "delete"), // delete wins
      (4L, "ins", 1L, "upsert"), // unmatched upsert -> insert
      (5L, "gone", 2L, "delete") // unmatched delete -> no insert
    ).toDF("id", "v", "seq", "op")
    val out = Upsert.applyChanges(target, feed, Seq("id"), "seq",
      opCol = Some("op"))
    assert(canon(out.select("id", "v")) === Seq("1|new", "3|t3", "4|ins"))
  }

  test("applyChanges without an op column is SCD1 latest-wins upsert") {
    val target = Seq((1L, "t1")).toDF("id", "v")
    val feed = Seq((1L, "b", 9L), (1L, "a", 7L), (2L, "c", 1L))
      .toDF("id", "v", "seq")
    val out = Upsert.applyChanges(target, feed, Seq("id"), "seq")
    assert(canon(out) === Seq("1|b", "2|c"))
  }

  test("whenNotMatchedBySource: unconditional delete syncs target to " +
    "the snapshot; matched/inserted rows unaffected") {
    val target = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("id", "v")
    val snapshot = Seq((1L, "s1"), (4L, "s4")).toDF("id", "v")
    val out = Upsert.upsertWithClauses(target, snapshot, Seq("id"),
      deleteWhenNotMatchedBySource = Some(lit(true)))
    assert(canon(out) === Seq("1|s1", "4|s4"),
      "rows 2 and 3 left the snapshot and must leave the table")
  }

  test("whenNotMatchedBySource: conditional delete + conditional update " +
    "set; unaffected target-only rows pass through") {
    val target = Seq((1L, "t1", "open"), (2L, "t2", "final"),
      (3L, "t3", "open"), (4L, "t4", "held")).toDF("id", "v", "st")
    val snapshot = Seq((1L, "s1", "open")).toDF("id", "v", "st")
    val out = Upsert.upsertWithClauses(target, snapshot, Seq("id"),
      deleteWhenNotMatchedBySource = Some(col("t.st") === "open"),
      updateWhenNotMatchedBySource = Some(col("t.st") === "final"),
      notMatchedBySourceSet = Map("st" -> lit("archived")))
    // 1 matched-updates, 3 deletes (open), 2 archives (final),
    // 4 passes through (held: no NMBS clause fires)
    assert(canon(out) === Seq("1|s1|open", "2|t2|archived", "4|t4|held"))
  }

  test("whenNotMatchedBySource: delete tested before update; NULL " +
    "conditions mean not taken; set may reference t. columns") {
    val target = Seq((1L, "a", null.asInstanceOf[String]),
      (2L, "b", "keep")).toDF("id", "v", "st")
    val snapshot = Seq.empty[(Long, String, String)].toDF("id", "v", "st")
    val out = Upsert.upsertWithClauses(target, snapshot, Seq("id"),
      // st NULL: delete cond is NULL -> not taken, falls to update
      deleteWhenNotMatchedBySource = Some(col("t.st") === "drop"),
      updateWhenNotMatchedBySource = Some(lit(true)),
      notMatchedBySourceSet = Map("v" -> concat(col("t.v"), lit("!"))))
    assert(canon(out) === Seq("1|a!|null", "2|b!|keep"))
  }

  test("whenNotMatchedBySource composes with schema evolution: evolved " +
    "columns stay NULL on NMBS-updated rows") {
    val target = Seq((1L, "t1"), (2L, "t2")).toDF("id", "v")
    val snapshot = Seq((1L, "s1", "g1")).toDF("id", "v", "tag")
    val out = Upsert.upsertWithClauses(target, snapshot, Seq("id"),
      evolveSchema = true,
      updateWhenNotMatchedBySource = Some(lit(true)),
      notMatchedBySourceSet = Map("v" -> lit("stale")))
    assert(out.columns.toSeq === Seq("id", "v", "tag"))
    assert(canon(out) === Seq("1|s1|g1", "2|stale|null"))
  }

  test("whenNotMatchedBySource guards: set without clause (and the " +
    "reverse), and assignments must name existing non-key columns") {
    val t = Seq((1L, "a")).toDF("id", "v")
    val s = Seq((1L, "b")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Upsert.upsertWithClauses(t, s, Seq("id"),
        notMatchedBySourceSet = Map("v" -> lit("x")))
    }
    intercept[IllegalArgumentException] {
      Upsert.upsertWithClauses(t, s, Seq("id"),
        updateWhenNotMatchedBySource = Some(lit(true)))
    }
    intercept[IllegalArgumentException] {
      Upsert.upsertWithClauses(t, s, Seq("id"),
        updateWhenNotMatchedBySource = Some(lit(true)),
        notMatchedBySourceSet = Map("nope" -> lit("x")))
    }
  }

  test("mergeClausesIntoVersionedTable: snapshot sync is one atomic " +
    "MERGE version; NMBS needs an existing target") {
    val root = Fixtures.tempDir("mergesync") + "/tbl"
    val vt = new graft.io.VersionedTable(spark, root)
    intercept[IllegalArgumentException] {
      Upsert.mergeClausesIntoVersionedTable(spark,
        Seq((1L, "a")).toDF("id", "v"), root, Seq("id"),
        deleteWhenNotMatchedBySource = Some(lit(true)))
    }
    vt.write(Seq((1L, "t1"), (2L, "t2")).toDF("id", "v"),
      org.apache.spark.sql.SaveMode.Overwrite)
    val written = Upsert.mergeClausesIntoVersionedTable(spark,
      Seq((1L, "s1"), (3L, "s3")).toDF("id", "v"), root, Seq("id"),
      deleteWhenNotMatchedBySource = Some(lit(true)))
    assert(written === 2L)
    assert(canon(vt.read()) === Seq("1|s1", "3|s3"))
    assert(vt.currentVersion.get === 1L, "one commit for the whole sync")
    // time travel still sees the pre-sync table
    assert(canon(vt.readVersion(0L)) === Seq("1|t1", "2|t2"))
  }

  test("versioned evolution merge: snapshot schema grows once, old rows " +
    "read NULL, later merges scope normally") {
    val root = Fixtures.tempDir("mergeevo") + "/tbl"
    val vt = new graft.io.VersionedTable(spark, root)
    vt.write(Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("id", "v", "bucket"),
      org.apache.spark.sql.SaveMode.Overwrite, "WRITE",
      partitionBy = Some(Seq("bucket"))) // v0, partitioned
    Upsert.mergeIntoVersionedTable(spark,
      Seq((2L, "b2", 1L, "g2"), (3L, "c", 0L, "g3"))
        .toDF("id", "v", "bucket", "tag"),
      root, Seq("id"), assumeStablePartitions = true, evolveSchema = true)
    val after = vt.read()
    assert(after.columns.sorted.toSeq === Seq("bucket", "id", "tag", "v"))
    assert(canon(after.select("id", "v", "tag")) ===
      Seq("1|a|null", "2|b2|g2", "3|c|g3"))
    // the grown schema persists: a later NON-evolving merge scopes and
    // leaves the tag column intact for untouched rows
    Upsert.mergeIntoVersionedTable(spark,
      Seq((1L, "a2", 0L, null.asInstanceOf[String]))
        .toDF("id", "v", "bucket", "tag"),
      root, Seq("id"), assumeStablePartitions = true)
    assert(canon(vt.read().select("id", "v", "tag")) ===
      Seq("1|a2|null", "2|b2|g2", "3|c|g3"))
    // without the flag, an adding source still fails loudly at write
    // (columns dropped before the write -> no silent type surprises)
    assert(Upsert.upsert(vt.read(), Seq((9L, "z", 2L, "g", "x"))
        .toDF("id", "v", "bucket", "tag", "brandnew"), Seq("id"))
      .columns.count(_ == "brandnew") === 0)
  }
}
