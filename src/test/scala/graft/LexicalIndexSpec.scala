package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable
import graft.text.LexicalIndex

/** Persisted BM25 inverted index (graft.text.LexicalIndex): scoring
  * equivalence to the one-shot formulation, append visibility with
  * additive stats, and query-time bucket-partition pruning. */
class LexicalIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def docs = graft.queries.Tables.load(spark, sf, "documents")
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("indexed BM25 equals the q88 registry result shape and is deterministic") {
    val r1 = rows(graft.queries.TrainingData.bm25Indexed(spark, sf))
    val r2 = rows(graft.queries.TrainingData.bm25Indexed(spark, sf))
    assert(r1 === r2)
    assert(r1.nonEmpty)
    // k=3 per query, queries are doc_id < 5, neighbors are corpus-side
    r1.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size <= 3, s"query $q returned ${rs.size} > k rows")
    }
    assert(r1.forall { case (q, nb, _) => q < 5 && nb >= 5 })
  }

  test("append: build(half) + append(half) answers like build(full)") {
    val corpus = docs.filter(col("doc_id") >= 5 && col("doc_id") < 105)
    val queries = docs.filter(col("doc_id") < 5)
    val rootFull = Fixtures.tempDir("graft-lex-full") + "/idx"
    LexicalIndex.build(spark, corpus, "doc_id", "text", rootFull)
    val rootInc = Fixtures.tempDir("graft-lex-inc") + "/idx"
    LexicalIndex.build(spark,
      corpus.filter(col("doc_id") < 55), "doc_id", "text", rootInc)
    LexicalIndex.append(spark,
      corpus.filter(col("doc_id") >= 55), "doc_id", "text", rootInc)
    val full = rows(LexicalIndex.query(spark, rootFull, queries,
      "doc_id", "text", k = 3))
    val inc = rows(LexicalIndex.query(spark, rootInc, queries,
      "doc_id", "text", k = 3))
    // df folds from postings and N/avg_len from the additive stats
    // rows, so the incremental index must score IDENTICALLY
    assert(full === inc)
  }

  test("delete: index scores as if victims were never indexed; compact purges masks") {
    val corpus = docs.filter(col("doc_id") >= 5 && col("doc_id") < 205)
    val queries = docs.filter(col("doc_id") < 5)
    val victims = corpus.filter(col("doc_id") % 10 === 7).select("doc_id")
    // ground truth: an index built WITHOUT the victims
    val rootRef = Fixtures.tempDir("graft-lex-ref") + "/idx"
    LexicalIndex.build(spark,
      corpus.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", rootRef)
    val ref = rows(LexicalIndex.query(spark, rootRef, queries,
      "doc_id", "text", k = 3))
    // the real path: build full, then DV-delete the victims
    val root = Fixtures.tempDir("graft-lex-del") + "/idx"
    LexicalIndex.build(spark, corpus, "doc_id", "text", root)
    LexicalIndex.delete(spark, root, victims)
    val got = rows(LexicalIndex.query(spark, root, queries,
      "doc_id", "text", k = 3))
    // EXACT equality: postings masked, df re-folded, stats netted
    assert(got === ref)
    assert(got.forall { case (_, nb, _) => nb % 10 != 7 })
    // compact purges the DV masks and preserves answers + pruning
    val vt = new VersionedTable(spark, s"$root/postings")
    assert(vt.manifestEntries(vt.currentVersion.get).exists(_.dvDir.isDefined))
    LexicalIndex.compact(spark, root)
    assert(!vt.manifestEntries(vt.currentVersion.get).exists(_.dvDir.isDefined))
    assert(rows(LexicalIndex.query(spark, root, queries,
      "doc_id", "text", k = 3)) === ref)
    // deleting ids that aren't indexed is a no-op (no stats row)
    LexicalIndex.delete(spark, root,
      spark.range(900000, 900005).toDF("doc_id"))
    assert(rows(LexicalIndex.query(spark, root, queries,
      "doc_id", "text", k = 3)) === ref)
  }

  test("upsert: changed docs re-score as if indexed with the new text") {
    val corpus = docs.filter(col("doc_id") >= 5 && col("doc_id") < 105)
    val queries = docs.filter(col("doc_id") < 5)
    // "edit" docs 50-59 to carry query-0's text under their own ids
    val q0text = docs.filter(col("doc_id") === 0)
      .select("text").collect()(0).getString(0)
    val edited = corpus.filter(col("doc_id") >= 50 && col("doc_id") < 60)
      .select(col("doc_id"), lit(q0text).as("text"))
    val rootRef = Fixtures.tempDir("graft-lex-up-ref") + "/idx"
    LexicalIndex.build(spark,
      corpus.filter(col("doc_id") < 50 || col("doc_id") >= 60)
        .select(col("doc_id"), col("text"))
        .unionByName(edited), "doc_id", "text", rootRef)
    val root = Fixtures.tempDir("graft-lex-up") + "/idx"
    LexicalIndex.build(spark, corpus, "doc_id", "text", root)
    LexicalIndex.upsert(spark, edited, "doc_id", "text", root)
    val ref = rows(LexicalIndex.query(spark, rootRef, queries,
      "doc_id", "text", k = 5))
    val got = rows(LexicalIndex.query(spark, root, queries,
      "doc_id", "text", k = 5))
    assert(got === ref)
    // the edited docs must now rank for query 0 (identical text)
    assert(got.filter(_._1 == 0L).exists(r => r._2 >= 50 && r._2 < 60))
  }

  test("streaming ingest: micro-batches index exactly-once; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = docs.filter(col("doc_id") >= 5 && col("doc_id") < 65)
      .select(col("doc_id"), col("text"))
    val queries = docs.filter(col("doc_id") < 5)
    val seed = corpus.filter(col("doc_id") < 25)
    val streamed = corpus.filter(col("doc_id") >= 25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val root = Fixtures.tempDir("graft-lex-stream") + "/idx"
    LexicalIndex.build(spark, seed, "doc_id", "text", root)
    val input = MemoryStream[(Long, String)]
    val sink = LexicalIndex.streamingIngestBatch(
      "doc_id", "text", root, "lex-test-v1")
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", Fixtures.tempDir("graft-lex-ckpt"))
      .start()
    try {
      input.addData(streamed.take(20): _*)
      q.processAllAvailable()
      input.addData(streamed.drop(20): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rootRef = Fixtures.tempDir("graft-lex-stream-ref") + "/idx"
    LexicalIndex.build(spark, corpus, "doc_id", "text", rootRef)
    val got = rows(LexicalIndex.query(spark, root, queries,
      "doc_id", "text", k = 3))
    assert(got === rows(LexicalIndex.query(spark, rootRef, queries,
      "doc_id", "text", k = 3)))
    // at-least-once replay: re-running an already-committed batch id
    // must change NOTHING (each table's marker skips it)
    val pVt = new VersionedTable(spark, s"$root/postings")
    val sVt = new VersionedTable(spark, s"$root/stats")
    val (pv, sv) = (pVt.currentVersion.get, sVt.currentVersion.get)
    sink(corpus.filter(col("doc_id") >= 25 && col("doc_id") < 45), 0L)
    assert(pVt.currentVersion.get === pv && sVt.currentVersion.get === sv)
    assert(rows(LexicalIndex.query(spark, root, queries,
      "doc_id", "text", k = 3)) === got)
  }

  test("query plans only the query terms' bucket partitions") {
    val corpus = docs.filter(col("doc_id") >= 5)
    val root = Fixtures.tempDir("graft-lex-prune") + "/idx"
    LexicalIndex.build(spark, corpus, "doc_id", "text", root, nBuckets = 16)
    val vt = new VersionedTable(spark, s"$root/postings")
    val all = vt.read().inputFiles.length
    // a one-term query hits exactly one bucket
    val oneTerm = docs.filter(col("doc_id") < 5)
      .select(col("doc_id"), lit("the").as("text"))
    val buckets = Set(
      spark.range(1).select(pmod(xxhash64(lit("the")), lit(16L)))
        .collect()(0).getLong(0).toString)
    val pruned = vt.readWherePartitionIn("bucket", buckets)
      .inputFiles.length
    assert(pruned < all,
      s"bucket pruning must plan fewer files ($pruned vs $all)")
    // and the real query path returns rows while touching only those
    // buckets' postings (same readWherePartitionIn under the hood)
    val res = LexicalIndex.query(spark, root, oneTerm,
      "doc_id", "text", k = 3)
    assert(res.collect().nonEmpty)
  }
}
