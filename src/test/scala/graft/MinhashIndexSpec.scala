package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.MinhashIndex
import graft.io.VersionedTable
import graft.queries.Tables

/** Streaming / lifecycle specs for the persistent MinHash-LSH dedup
  * index (q108's machinery) beyond what the oracle covers: exactly-
  * once micro-batch ingest and replay no-ops. */
class MinhashIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def docs = Tables.load(spark, sf, "documents")

  private def hits(idx: MinhashIndex,
      queries: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    idx.query(queries, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streaming ingest: micro-batches index exactly-once; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val res = col("doc_id") % 10
    val corpus = docs.filter(res =!= 1 && res =!= 2)
      .select(col("doc_id"), col("text"))
    val queries = docs.filter(res === 1 || res === 2)
    val seed = corpus.filter(col("doc_id") < 250)
    val streamed = corpus.filter(col("doc_id") >= 250)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val root = Fixtures.tempDir("graft-mh-stream") + "/idx"
    val idx = new MinhashIndex(spark, root)
    idx.build(seed, "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val sink = idx.streamingIngestBatch("doc_id", "text", "mh-test-v1")
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation", Fixtures.tempDir("graft-mh-ckpt"))
      .start()
    try {
      input.addData(streamed.take(streamed.length / 2): _*)
      q.processAllAvailable()
      input.addData(streamed.drop(streamed.length / 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // the streamed index answers exactly like one built whole
    val rootRef = Fixtures.tempDir("graft-mh-stream-ref") + "/idx"
    val ref = new MinhashIndex(spark, rootRef)
    ref.build(corpus, "doc_id", "text")
    val got = hits(idx, queries)
    assert(got === hits(ref, queries))
    // at-least-once replay: re-running an already-committed batch id
    // must change NOTHING (each table's marker skips it)
    val pVt = new VersionedTable(spark, s"$root/postings")
    val sVt = new VersionedTable(spark, s"$root/sets")
    val (pv, sv) = (pVt.currentVersion.get, sVt.currentVersion.get)
    sink(corpus.filter(col("doc_id") >= 250), 0L)
    assert(pVt.currentVersion.get === pv && sVt.currentVersion.get === sv)
    assert(hits(idx, queries) === got)
  }
}
