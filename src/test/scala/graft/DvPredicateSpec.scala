package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable

/** Predicate-driven DV DML
  * ([[graft.io.VersionedTable.deleteVectorizedWhere]] /
  * [[graft.io.VersionedTable.updateVectorizedWhere]]): arbitrary
  * WHERE clauses at O(changed rows) write amplification, with the
  * candidate file set pruned by the predicate's own expression tree
  * against manifest stats ([[graft.io.VersionedTable.predicateMayMatch]]).
  */
class DvPredicateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic 4-file fixture: k 1..400 in EXACT stripes of 100,
    * one file per commit so every file's min/max stats are known. */
  private def clustered(prefix: String): (VersionedTable, String) = {
    val root = Fixtures.tempDir(prefix) + "/tbl"
    val vt = new VersionedTable(spark, root)
    def stripe(lo: Long, hi: Long) = (lo to hi).map(k =>
      (k, s"nm${"%03d".format(k)}", if (k % 2 == 0) "E" else "O"))
      .toDF("k", "name", "tag").coalesce(1)
    vt.write(stripe(1, 100))
    Seq((101L, 200L), (201L, 300L), (301L, 400L)).foreach { case (lo, hi) =>
      vt.write(stripe(lo, hi), SaveMode.Append)
    }
    (vt, root)
  }

  test("deleteVectorizedWhere matches the filter semantics for a " +
      "conjunctive predicate and leaves provably-out files untouched") {
    val (vt, _) = clustered("dv-pred-del")
    val before = vt.manifestEntries(vt.currentVersion.get)
    vt.deleteVectorizedWhere(col("k") >= 150 && col("k") <= 160 &&
      col("tag") === "E")
    val got = vt.read().select("k").as[Long].collect().sorted
    val want = (1L to 400L).filterNot(k => k >= 150 && k <= 160 && k % 2 == 0)
    assert(got.toSeq === want)
    // only the stripe holding [150,160] may carry a DV; the other
    // three files are re-referenced byte-identical
    val after = vt.manifestEntries(vt.currentVersion.get)
    val untouched = after.filter(_.dvDir.isEmpty)
    assert(after.count(_.dvDir.isDefined) === 1)
    assert(untouched.map(_.relPath).toSet.subsetOf(
      before.map(_.relPath).toSet))
    assert(untouched.size === 3)
  }

  test("updateVectorizedWhere applies SET under an OR-of-ranges " +
      "predicate; rows where the predicate is NULL survive") {
    val root = Fixtures.tempDir("dv-pred-upd") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq[(Long, java.lang.Long, String)](
      (1L, 10L, "a"), (2L, null, "b"), (3L, 30L, "c"), (4L, 40L, "d"))
      .toDF("k", "v", "s"))
    vt.updateVectorizedWhere(col("v") < 20 || col("v") > 35,
      Map("s" -> lit("HIT")))
    val got = vt.read().orderBy("k").as[(Long, Option[Long], String)]
      .collect().toSeq
    assert(got === Seq((1L, Some(10L), "HIT"), (2L, None, "b"),
      (3L, Some(30L), "c"), (4L, Some(40L), "HIT")))
  }

  test("predicateMayMatch prunes through numeric, string, IN, " +
      "prefix and OR shapes — and refuses where it cannot prove") {
    val (vt, _) = clustered("dv-pred-skip")
    val m = vt.currentManifest
    val entries = m.entries
    def matchedFiles(pred: org.apache.spark.sql.Column): Int =
      entries.count(vt.predicateMayMatch(m, pred))
    assert(matchedFiles(col("k") === 150L) === 1)
    assert(matchedFiles(col("k") > 390L) === 1)
    assert(matchedFiles(lit(5L) >= col("k")) === 1) // flipped literal
    assert(matchedFiles(col("k").isin(50L, 60L)) === 1) // envelope
    assert(matchedFiles(col("k") === 150L || col("k") === 350L) === 2)
    assert(matchedFiles(col("k") === 150L && col("k") === 350L) === 0)
    assert(matchedFiles(col("name") === "nm050") === 1)
    assert(matchedFiles(col("name").startsWith("nm39")) === 1)
    assert(matchedFiles(expr("name LIKE 'nm39%'")) === 1)
    // IS NULL on a never-null column: null counts prove every file out
    assert(matchedFiles(col("k").isNull) === 0)
    assert(matchedFiles(col("k").isNotNull) === 4)
    // non-analyzable conjuncts are conservative: every file may match
    assert(matchedFiles(col("k") % 7 === 0) === 4)
    assert(matchedFiles(!(col("k") === 1L)) === 4)
    // a bound beyond 2^53 refuses to prune (stats are doubles)
    assert(matchedFiles(col("k") === 9223372036854775000L) === 4)
    // cross-column comparison: no literal side, no pruning
    assert(matchedFiles(col("k") === col("v2")) === 4)
  }

  test("a STRING literal against a NUMERIC partition column never " +
      "prunes (lexical partition-value order would be unsound)") {
    val root = Fixtures.tempDir("dv-pred-strpart") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"),
      partitionBy = Some(Seq("k")))
    // '10' as a STRING literal: lexically "2" > "10", so an unsound
    // string envelope would prune partition k=2 — the analyzed filter
    // casts and MATCHES it
    val m = vt.currentManifest
    val f = vt.predicateMayMatch(m, expr("k <= '10'"))
    assert(m.entries.forall(f), "string-vs-numeric must not prune")
    // and the DELETE itself deletes exactly what the cast filter says
    vt.deleteVectorizedWhere(expr("k <= '10'"))
    assert(vt.read().select("k").as[Long].collect().sorted.toSeq ===
      (11L to 20L))
  }

  test("DELETE WHERE equals the rewrite-path semantics on an " +
      "unprunable predicate (mask is exact even when skipping is not)") {
    val (vt, _) = clustered("dv-pred-mod")
    vt.deleteVectorizedWhere(col("k") % 7 === 0)
    val got = vt.read().select("k").as[Long].collect().sorted
    assert(got.toSeq === (1L to 400L).filterNot(_ % 7 == 0))
  }

  test("date/timestamp predicates prune: typed literals AND the " +
      "string spellings a SQL user writes convert to the stats' " +
      "epoch units; the masks stay exact") {
    val root = Fixtures.tempDir("dv-pred-time") + "/tbl"
    val vt = new VersionedTable(spark, root)
    def day(d: Int) = java.sql.Date.valueOf(f"2023-01-$d%02d")
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2023-01-$d%02d $h%02d:00:00")
    // four single-file stripes of 7 days each (s0: 1-7 … s3: 22-28)
    (0 until 4).foreach { s =>
      val df = (1 to 10).map { i =>
        val d = s * 7 + ((i - 1) % 7) + 1 // days within the stripe
        (s * 100 + i.toLong, day(d), ts(d, i % 24))
      }.toDF("k", "d", "t").coalesce(1)
      if (s == 0) vt.write(df) else vt.write(df, SaveMode.Append)
    }
    val m = vt.currentManifest
    def matched(pred: org.apache.spark.sql.Column): Int =
      m.entries.count(vt.predicateMayMatch(m, pred))
    // typed literals
    assert(matched(col("d") === lit(day(15))) === 1)
    assert(matched(col("t") >= lit(ts(20, 0))) === 2)
    // the string spellings (analyzer casts the string side)
    assert(matched(expr("d = '2023-01-15'")) === 1)
    assert(matched(expr("d BETWEEN '2023-01-16' AND '2023-01-20'")) === 1)
    assert(matched(expr("t >= '2023-01-25 00:00:00'")) === 1)
    assert(matched(expr("t >= '2023-01-25T00:00:00Z'")) === 1)
    assert(matched(expr("d IN ('2023-01-02', '2023-01-05')")) === 1)
    // unparseable spellings never prune
    assert(matched(expr("d = 'not-a-date'")) === 4)
    // and the DELETE itself is exact through the pruned candidates
    vt.deleteVectorizedWhere(expr("d BETWEEN '2023-01-11' AND '2023-01-17'"))
    assert(vt.read().filter(col("d").between("2023-01-11", "2023-01-17"))
      .count() === 0L)
    assert(vt.read().count() === 30L)
  }

  test("IS NULL / IS NOT NULL data skipping: recorded null counts " +
      "prove absence — a no-null file takes no mask link from a " +
      "DELETE WHERE ... IS NULL, an all-null file proves IS NOT NULL " +
      "empty, and the masks themselves are exact") {
    val root = Fixtures.tempDir("dv-pred-null") + "/tbl"
    val vt = new VersionedTable(spark, root)
    def stripe(lo: Long, hi: Long, name: Long => Option[String]) =
      (lo to hi).map(k => (k, name(k).orNull)).toDF("k", "name").coalesce(1)
    vt.write(stripe(1, 100, k => Some(s"nm$k")))              // no nulls
    vt.write(stripe(101, 200, _ => None), SaveMode.Append)    // ALL null
    vt.write(stripe(201, 300,                                 // mixed
      k => if (k % 2 == 0) None else Some(s"nm$k")), SaveMode.Append)
    val before = vt.manifestEntries(vt.currentVersion.get)
    def byLo(es: Seq[graft.io.ManifestEntry], lo: Double) =
      es.find(_.stats.get("k").exists(_._1 == lo))
    // the scrape recorded the counts
    assert(byLo(before, 1.0).get.nullCounts.get("name") === Some(0L))
    assert(byLo(before, 101.0).get.nullCounts.get("name") === Some(100L))
    assert(byLo(before, 201.0).get.nullCounts.get("name") === Some(50L))
    val v = vt.deleteVectorizedWhere(col("name").isNull)
    val after = vt.manifestEntries(v)
    // no-null stripe: provably out — untouched, no chain link
    assert(byLo(after, 1.0).exists(_.dvDir.isEmpty))
    // all-null stripe: fully dead — dropped from the manifest
    assert(byLo(after, 101.0).isEmpty)
    // mixed stripe: exactly its 50 nulls masked
    assert(byLo(after, 201.0).exists(e =>
      e.dvDir.isDefined && e.dvRows === 50L))
    assert(vt.read().count() === 150L)
    assert(vt.read().filter(col("name").isNull).count() === 0L)
    // IS NOT NULL prunes the all-null file: a fresh table's UPDATE
    // touches only files that can hold a non-null value
    val root2 = Fixtures.tempDir("dv-pred-null2") + "/tbl"
    val vt2 = new VersionedTable(spark, root2)
    vt2.write(stripe(1, 100, _ => None))                      // ALL null
    vt2.write(stripe(101, 200, k => Some(s"nm$k")), SaveMode.Append)
    vt2.updateVectorizedWhere(col("name").isNotNull,
      Map("name" -> lit("seen")))
    val after2 = vt2.manifestEntries(vt2.currentVersion.get)
    assert(byLo(after2, 1.0).exists(_.dvDir.isEmpty),
      "the all-null file must be pruned from an IS NOT NULL update")
    assert(vt2.read().filter(col("name") === "seen").count() === 100L)
  }

  test("non-ASCII string PARTITION values never prune: a value of " +
      "prefix+U+FFFF+tail outsorts the prefix envelope's UTF-16 upper " +
      "sentinel yet MAY match; pure-ASCII partitions still skip") {
    // manifest-level check (this FS's JVM encoding cannot even WRITE a
    // U+FFFF path, but object stores can — the analyzer must be sound
    // for them): hand-build entries and probe predicateMayMatch
    import graft.io.{ManifestEntry, VersionManifest}
    import org.apache.spark.sql.types._
    val root = Fixtures.tempDir("dv-pred-uni") + "/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1L, "seed")).toDF("k", "p")) // host instance only
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("p", StringType)))
    def entry(p: String) =
      ManifestEntry(s"p=$p/f.parquet", 1L, 1L)
    val tricky = entry("pre￿x") // Java-sorts ABOVE 'pre'+U+FFFF
    val inBand = entry("pre_a")
    val outBand = entry("zzz")
    val m = VersionManifest(Some(schema),
      Seq(tricky, inBand, outBand), partitionBy = Seq("p"))
    val f = vt.predicateMayMatch(m, col("p").startsWith("pre"))
    assert(f(tricky), "a non-ASCII partition value must never prune " +
      "(UTF-16 vs UTF-8 ordering can disagree above ASCII)")
    assert(f(inBand), "an in-envelope ASCII value stays a candidate")
    assert(!f(outBand), "an out-of-envelope ASCII value still skips")
    // and end-to-end on ASCII: a provably-absent partition equality
    // no-ops the whole DELETE
    val root2 = Fixtures.tempDir("dv-pred-uni2") + "/tbl"
    val vt2 = new VersionedTable(spark, root2)
    vt2.write(Seq((1L, "aa"), (2L, "bb")).toDF("k", "p"),
      partitionBy = Some(Seq("p")))
    val v0 = vt2.currentVersion.get
    assert(vt2.deleteVectorizedWhere(col("p") === "zz") === v0,
      "a provably-absent ASCII partition equality must no-op")
  }

  test("TIMESTAMP_MILLIS files (a foreign/adopted unit) keep temporal " +
      "skipping sound: the scrape normalizes INT64 stats to the " +
      "manifest's epoch-micros contract, so DML still finds its rows") {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MILLIS") // writeCommitData honors it
    try {
      val root = Fixtures.tempDir("dv-pred-millis") + "/tbl"
      val vt = new VersionedTable(spark, root)
      def ts(d: Int) =
        java.sql.Timestamp.valueOf(f"2023-01-$d%02d 12:00:00")
      // two single-file stripes: days 1-7 and days 10-17
      vt.write((1 to 7).map(d => (d.toLong, ts(d))).toDF("k", "t")
        .coalesce(1))
      vt.write((10 to 17).map(d => (d.toLong, ts(d))).toDF("k", "t")
        .coalesce(1), SaveMode.Append)
      val m = vt.currentManifest
      // the stats landed in MICROS despite the MILLIS physical unit
      val micros = ts(1).getTime * 1000.0
      assert(m.entries.exists(_.stats.get("t").exists(_._1 == micros)),
        s"expected micros-normalized stats, got " +
          m.entries.map(_.stats.get("t")).mkString(", "))
      def matched(pred: org.apache.spark.sql.Column): Int =
        m.entries.count(vt.predicateMayMatch(m, pred))
      // a micros envelope against millis-unit raw stats pruned BOTH
      // files before the fix; normalized stats prune exactly one
      assert(matched(expr("t >= '2023-01-10 00:00:00'")) === 1)
      // and the DELETE finds its rows instead of silently missing them
      vt.deleteVectorizedWhere(expr("t >= '2023-01-10 00:00:00'"))
      assert(vt.read().count() === 7L)
    } finally spark.conf.set(key, prev)
  }
}
