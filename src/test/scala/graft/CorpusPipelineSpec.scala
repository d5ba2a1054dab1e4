package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CorpusPipeline
import graft.text.TextAnalysis

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, t, s) => Row(i, t, s) }.asJava, docSchema)
  }

  // ------------------------------------------------------------------ PII

  test("pii redaction: each pattern replaced with its tag") {
    import spark.implicits._
    val out = Seq(
      "contact bob.smith+x@example.co.uk today",
      "ssn 123-45-6789 on file",
      "host 192.168.1.254 responded",
      "call +1 (415) 555-0199 now",
      "clean text stays clean")
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect()
    assert(out(0) === "contact <EMAIL> today")
    assert(out(1) === "ssn <ID> on file")
    assert(out(2) === "host <IP> responded")
    assert(out(3) === "call <PHONE> now")
    assert(out(4) === "clean text stays clean")
  }

  test("pii redaction ordering: ids and ips are not eaten by the phone pattern") {
    import spark.implicits._
    val out = Seq("a 123-45-6789 b 10.0.0.1 c 415-555-0199")
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .as[String].collect().head
    assert(out === "a <ID> b <IP> c <PHONE>")
  }

  test("pii counts agree with redaction pass order") {
    val df = docsDf(Seq(
      (1L, "x@y.com and 1.2.3.4 and 555-123-4567 and a@b.org", "s")))
    val row = TextAnalysis.withPiiRedacted(df, "text").collect().head
    assert(row.getAs[Int]("n_emails") === 2)
    assert(row.getAs[Int]("n_ids") === 0)
    assert(row.getAs[Int]("n_ips") === 1)
    assert(row.getAs[Int]("n_phones") === 1)
    assert(row.getAs[String]("text_redacted") ===
      "<EMAIL> and <IP> and <PHONE> and <EMAIL>")
  }

  // --------------------------------------------------------------- stages

  test("annotate adds the gate columns, repetition null-safe on short docs") {
    val df = CorpusPipeline.annotate(docsDf(Seq(
      (1L, "the cat sat on the mat with the dog and the bird", "a"),
      (2L, "x", "a")))) // 1 token: no bigrams
    val cols = df.columns.toSet
    assert(Set("lang_pred", "quality_score", "top_bigram_frac",
      "n_tokens").subsetOf(cols))
    val short = df.filter(col("doc_id") === 2).collect().head
    assert(short.getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("fused annotate == composed withLangPred + withQualityColumns") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
    val fused = CorpusPipeline.annotate(docs)
      .select("doc_id", "lang_pred", "n_tokens", "stop_ratio",
        "punct_ratio", "quality_score")
    val composed = TextAnalysis.withQualityColumns(
      TextAnalysis.withLangPred(docs, "text"), "text")
      .select("doc_id", "lang_pred", "n_tokens", "stop_ratio",
        "punct_ratio", "quality_score")
    assert(fused.exceptAll(composed).isEmpty &&
      composed.exceptAll(fused).isEmpty,
      "fused annotate diverges from the composed kernels")
  }

  test("dedupExact keeps min doc_id per identical text") {
    val out = CorpusPipeline.dedupExact(docsDf(Seq(
      (5L, "same exact words", "a"),
      (2L, "same exact words", "b"),
      (9L, "different words entirely", "a"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 9L))
  }

  test("dedupNear collapses a near-identical cluster to its min id") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val out = CorpusPipeline.dedupNear(docsDf(Seq(
      (3L, base, "a"),
      (7L, base + " x", "a"), // near-dup of 3
      (1L, "completely unrelated content about spark shuffles and joins everywhere", "b"))),
      threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 3L))
  }

  test("decontaminate drops docs sharing an 8-gram with the benchmark") {
    val leak = "one two three four five six seven eight"
    val corpus = docsDf(Seq(
      (1L, s"prefix words $leak suffix words", "a"),
      (2L, "totally clean doc with its own eight tokens here now", "a")))
    val bench = docsDf(Seq((100L, s"benchmark question: $leak", "bench")))
    val out = CorpusPipeline.decontaminate(corpus, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L))
  }

  test("mixAndSplit: epochs of one doc never straddle splits") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
    val r = CorpusPipeline.Recipe(sourceWeights = Map("src0" -> 3.0))
    val out = CorpusPipeline.mixAndSplit(docs, r)
      .groupBy("doc_id").agg(countDistinct("split").as("nsplits"),
        count(lit(1)).as("copies"))
      .collect()
    assert(out.forall(_.getLong(1) === 1L), "a doc leaked across splits")
    assert(out.exists(_.getLong(2) === 3L), "src0 should have 3 epochs")
  }

  test("CorpusPrep --versioned: each prep run commits a time-travelable version") {
    val out = Fixtures.tempDir("graft-corpusprep") + "/corpus"
    def run(weight: String): Unit = graft.CorpusPrep.main(Array(
      "--docs", s"$sf/documents.parquet", "--out", out,
      "--lang", "any", "--min-quality", "0.1", "--versioned",
      "--no-report", "--weights", s"src1=$weight"))
    run("2.0") // v0
    run("3.0") // v1: heavier src1 upsample -> more rows
    val vt = new graft.io.VersionedTable(spark, out)
    val v0 = vt.readVersion(0).count()
    val v1 = vt.readVersion(1).count()
    assert(v0 > 0 && v1 > v0, s"expected v1 ($v1) > v0 ($v0)")
    // the latest read sees v1; splits are the partition column
    assert(vt.read().count() === v1)
    assert(vt.read().select("split").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("CorpusPrep --weights parsing") {
    assert(graft.CorpusPrep.parseWeights("src0=2.5,src1=0.4") ===
      Map("src0" -> 2.5, "src1" -> 0.4))
    assert(graft.CorpusPrep.parseWeights("") === Map.empty)
    intercept[RuntimeException] {
      graft.CorpusPrep.parseWeights("src0:2.5")
    }
  }

  test("boilerplate filter: shared-template docs drop, unique docs survive") {
    import spark.implicits._
    // 12 shared tokens => each template doc's first 5 8-grams are
    // corpus-wide boilerplate; its last 2 are unique (5/7 > 0.5)
    val boiler = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = (1L to 30L).map { i =>
      if (i <= 20) (i, s"$boiler unique$i end$i")
      else (i, (1 to 20).map(j => s"u${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val kept = CorpusPipeline.boilerplateFilter(docs, maxFrac = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (21L to 30L).toSet)
    // a doc too short for any 8-gram cannot be condemned
    val short = Seq((100L, "one two three")).toDF("doc_id", "text")
    assert(CorpusPipeline.boilerplateFilter(docs.unionByName(short), 0.5)
      .filter(col("doc_id") === 100L).count() === 1L)
  }

  test("run: boilerplate stage is opt-in and shows in the census") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
      .limit(120).localCheckpoint()
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val r = CorpusPipeline.Recipe(lang = None, minQuality = 0.0,
      maxTopBigramFrac = 1.0, maxSharedNgramFrac = Some(0.99))
    val (out, census) = CorpusPipeline.run(docs, bench, r)
    out.write.format("noop").mode("overwrite").save()
    val stages = census().map(_.stage)
    assert(stages.contains("boilerplate"))
    // default recipe: no boilerplate stage in the census
    val (out2, census2) = CorpusPipeline.run(docs, bench,
      CorpusPipeline.Recipe(lang = None, minQuality = 0.0,
        maxTopBigramFrac = 1.0))
    out2.write.format("noop").mode("overwrite").save()
    assert(!census2().map(_.stage).contains("boilerplate"))
  }

  test("streamingPrep: gates, redacts, and dedups incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val good = "the cat and the dog run to the house with the bird " * 3
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val stream = input.toDF()
      .toDF("doc_id", "text", "source", "ts")
    val out = CorpusPipeline.streamingPrep(stream, "ts",
      CorpusPipeline.Recipe(lang = Some("en"), minQuality = 0.2,
        maxTopBigramFrac = 0.9), watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("corpus_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, good + " mail me at a@b.com", "s1", ts0),
        (2L, good + " mail me at a@b.com", "s1", ts0), // exact re-arrival
        (3L, "zz zz zz", "s1", ts0))                   // fails the lang gate
      q.processAllAvailable()
      input.addData(
        (4L, good + " mail me at a@b.com", "s1", ts0)) // later re-arrival
      q.processAllAvailable()
      val rows = spark.table("corpus_stream")
        .select("doc_id", "text").collect()
      // the duplicate content survives once, the low-quality doc never
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L))
      assert(rows.head.getString(1).contains("<EMAIL>"),
        "PII must be redacted before the content hash")
    } finally q.stop()
  }

  // ------------------------------------------------------------ full run

  test("run: census monotone, output deduped, gates hold end-to-end") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
    val bench = docs.filter(col("doc_id") % 10 === 0) // q45's pseudo-benchmark
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val r = CorpusPipeline.Recipe(
      lang = None, minQuality = 0.1, maxTopBigramFrac = 0.9,
      nearDupThreshold = 0.8, sourceWeights = Map("src1" -> 2.0))
    val (out, censusThunk) = CorpusPipeline.run(corpus, bench, r)
    val rows = out.select("doc_id", "split", "epoch").collect()
    // the census rides the collect action above (observe nodes — no
    // extra count jobs); the thunk blocks until that action completes
    val census = censusThunk()
    val byStage = census.map(c => c.stage -> c.docs).toMap
    assert(census.map(_.stage) === Seq("quality_filter", "dedup_exact",
      "dedup_near", "decontaminate", "mix_split"))
    // each filtering stage can only shrink the corpus
    assert(byStage("dedup_exact") <= byStage("quality_filter"))
    assert(byStage("dedup_near") <= byStage("dedup_exact"))
    assert(byStage("decontaminate") <= byStage("dedup_near"))
    assert(rows.length === byStage("mix_split") && rows.nonEmpty)
    // (doc_id, epoch) unique; all splits valid
    val keys = rows.map(x => (x.getLong(0), x.getLong(2)))
    assert(keys.distinct.length === keys.length)
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
  }
}
