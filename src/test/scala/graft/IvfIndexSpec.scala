package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{IvfIndex, Similarity}

/** Persistent IVF index: build-once / query-many must serve the exact
  * answer of the train+search-in-one-call path, and the probe must be
  * a manifest partition-pruned scan (only probed clusters' files). */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def embs = graft.queries.Tables.load(spark, sf, "embeddings")

  test("indexed query ≡ ivfTopK; probe scan plans only probed clusters' files") {
    val corpus = embs.filter(col("vec_id") >= 5)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivf-index") + "/idx"
    val v0 = IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, iters = 2)
    assert(v0 === 0L)

    val indexed = IvfIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 3)
    val direct = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(indexed) === rows(direct),
      "persisted-index search must equal the one-call path exactly")

    // pruning evidence (single query → ≤ nprobe clusters): the
    // planned files' partition dirs ⊆ its probed clusters, and most
    // clusters are never planned
    val centroids = IvfIndex.loadCentroids(spark, root)
    assert(centroids.length === 8 && centroids.forall(_.length === 64))
    val one = IvfIndex.query(spark, root,
      queries.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, nprobe = 3)
    one.collect()
    val planned = one.inputFiles.filter(_.contains("cluster="))
    assert(planned.nonEmpty)
    val plannedClusters = planned
      .map(f => f.split("cluster=")(1).split("/")(0)).toSet
    val allClusters = new graft.io.VersionedTable(spark, s"$root/vectors")
      .manifestEntries(0L)
      .flatMap(_.partitionValues.get("cluster")).toSet
    assert(plannedClusters.subsetOf(allClusters))
    assert(plannedClusters.size <= 3 && allClusters.size === 8,
      s"one query must plan ≤ nprobe clusters: $plannedClusters of $allClusters")

    // rebuild commits a NEW VERSION; the old index stays readable
    IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, iters = 2)
    val vt = new graft.io.VersionedTable(spark, s"$root/vectors")
    assert(vt.currentVersion === Some(1L))
    assert(vt.readVersion(0L).count() === corpus.count())
  }

  test("append: stored-model assignment; queries see old + new; time travel doesn't") {
    val corpus = embs.filter(col("vec_id") >= 5 && col("vec_id") < 50)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivf-append") + "/idx"
    IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, iters = 2)
    val before = IvfIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // append a clone of each query vector under a fresh id: with every
    // list probed, the clone (cosine exactly 1.0) must become a top hit
    val clones = queries.select(
      (col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val v1 = IvfIndex.append(spark, clones, "vec_id", "embedding", root)
    assert(v1 === 1L)
    val after = IvfIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 8)
    val byQuery = after.collect().groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      assert(rs.exists(r => r.getLong(1) === q + 1000 &&
        math.abs(r.getDouble(2) - 1.0) < 1e-9),
        s"query $q must find its appended clone: ${rs.mkString(",")}")
    }
    // the pre-append version still serves the old answer
    val vt = new graft.io.VersionedTable(spark, s"$root/vectors")
    assert(vt.readVersion(0L).count() === corpus.count())
    assert(before.forall { case (_, n) => n < 1000 })
  }

  test("IVF+PQ append: encoded with the stored model; clones found") {
    import graft.similarity.IvfPqIndex
    val corpus = embs.filter(col("vec_id") >= 5 && col("vec_id") < 50)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivfpq-append") + "/idx"
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 4, m = 8, ksub = 16, iters = 2)
    val clones = queries.select(
      (col("vec_id") + 1000).as("vec_id"), col("embedding"))
    IvfPqIndex.append(spark, clones, "vec_id", "embedding", root)
    val after = IvfPqIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 4, rerank = 120)
    after.collect().groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.exists(r => r.getLong(1) === q + 1000 &&
        math.abs(r.getDouble(2) - 1.0) < 1e-9),
        s"query $q must find its appended clone: ${rs.mkString(",")}")
    }
  }

  test("persisted IVF+PQ index ≡ ivfPqTopK; codes scan partition-pruned") {
    import graft.similarity.IvfPqIndex
    val corpus = embs.filter(col("vec_id") >= 5)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivfpq-index") + "/idx"
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, m = 8, ksub = 16, iters = 2)

    val indexed = IvfPqIndex.query(spark, root, queries,
      "vec_id", "embedding", k = 3, nprobe = 5, rerank = 120)
    val direct = Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 5, m = 8, ksub = 16, rerank = 120)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(indexed) === rows(direct),
      "persisted IVF+PQ search must equal the one-call path exactly")

    // model round-trips exactly through the tables
    val (cents, cbs) = IvfPqIndex.loadModel(spark, root)
    assert(cents.length === 8 && cbs.length === 8 &&
      cbs.forall(_.length === 16) && cbs.forall(_.forall(_.length === 8)))

    // what persists per vector is (cluster, m codes) — the 64× story:
    // single-query probe plans ≤ nprobe of the 8 cluster dirs
    val one = IvfPqIndex.query(spark, root,
      queries.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, nprobe = 3, rerank = 120)
    one.collect()
    val plannedClusters = one.inputFiles.filter(_.contains("cluster="))
      .map(f => f.split("cluster=")(1).split("/")(0)).toSet
    assert(plannedClusters.nonEmpty && plannedClusters.size <= 3,
      s"one query must plan <= nprobe code partitions: $plannedClusters")

    // the exact re-rank reads the raw-vector table partition-pruned
    // too: planned vector files are a STRICT subset of the table's
    val plannedVec = one.inputFiles.filter(_.contains("/vectors/"))
    val allVec = new graft.io.VersionedTable(spark, s"$root/vectors")
      .read().inputFiles
    assert(plannedVec.nonEmpty && plannedVec.toSet.subsetOf(allVec.toSet))
    assert(plannedVec.length < allVec.length,
      s"re-rank must not scan the full vector table: " +
        s"${plannedVec.length} of ${allVec.length}")
  }

  test("filtered search: payload-predicated candidates only; pruning intact") {
    val corpus = embs.filter(col("vec_id") >= 5)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivf-filtered") + "/idx"
    IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, iters = 2, payload = Seq("label"))
    // payload round-trips through the versioned index table
    val vt = new graft.io.VersionedTable(spark, s"$root/vectors")
    assert(vt.read().columns.toSet === Set("id", "cluster", "v", "label"))
    val res = IvfIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 8, filter = Some(col("label") === 0))
    val neighbors = res.collect().map(_.getLong(1)).toSet
    assert(neighbors.nonEmpty)
    val label0 = corpus.filter(col("label") === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(neighbors.subsetOf(label0),
      s"filtered search returned non-matching ids: ${neighbors -- label0}")
    // with every list probed, filtered search ≡ brute force over the
    // label-0 corpus (the filter only restricts candidates, the rank
    // is exact inside them)
    val brute = Similarity.bruteForceTopK(
      corpus.filter(col("label") === 0), queries,
      "vec_id", "embedding", k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(res) === rows(brute),
      "nprobe=nlist filtered search must equal filtered brute force")

    // appends onto a payload index carry the payload (and a frame
    // missing it fails loudly, not with a schema drift)
    IvfIndex.append(spark,
      embs.filter(col("vec_id") === 5)
        .select((col("vec_id") + 2000).as("vec_id"),
          col("embedding"), col("label")),
      "vec_id", "embedding", root)
    assert(vt.read().filter(col("id") === 2005L).select("label")
      .head().getInt(0) === embs.filter(col("vec_id") === 5)
        .select("label").head().getInt(0))
    val thrown = intercept[IllegalArgumentException] {
      IvfIndex.append(spark,
        embs.filter(col("vec_id") === 6)
          .select((col("vec_id") + 2000).as("vec_id"), col("embedding")),
        "vec_id", "embedding", root)
    }
    assert(thrown.getMessage.contains("payload"))
  }

  test("index delete: masked ids unreturnable; time travel pre-delete") {
    import graft.similarity.IvfPqIndex
    val corpus = embs.filter(col("vec_id") >= 5)
    val queries = embs.filter(col("vec_id") < 5)

    // IVF flavor
    val root = Fixtures.tempDir("graft-ivf-del") + "/idx"
    IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, iters = 2)
    val before = IvfIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 8).collect().map(_.getLong(1)).toSet
    assert(before.nonEmpty)
    IvfIndex.delete(spark, root, before)
    val after = IvfIndex.query(spark, root, queries, "vec_id", "embedding",
      k = 3, nprobe = 8).collect().map(_.getLong(1)).toSet
    assert((after intersect before).isEmpty,
      s"deleted ids must never be returned: $after ∩ $before")
    assert(after.nonEmpty, "survivors must fill the freed slots")
    val vt = new graft.io.VersionedTable(spark, s"$root/vectors")
    // the DV commit rewrote nothing: version advanced, files reused
    assert(vt.currentVersion === Some(1L))
    assert(vt.readVersion(0L).filter(
      col("id").isin(before.toSeq: _*)).count() === before.size,
      "time travel must still serve the pre-delete index")

    // IVF+PQ flavor: masks land on vectors AND codes in step
    val rootPq = Fixtures.tempDir("graft-ivfpq-del") + "/idx"
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding", rootPq,
      nlist = 8, m = 8, ksub = 16, iters = 2)
    val beforePq = IvfPqIndex.query(spark, rootPq, queries,
      "vec_id", "embedding", k = 3, nprobe = 8, rerank = 120)
      .collect().map(_.getLong(1)).toSet
    assert(beforePq.nonEmpty)
    IvfPqIndex.delete(spark, rootPq, beforePq)
    val afterPq = IvfPqIndex.query(spark, rootPq, queries,
      "vec_id", "embedding", k = 3, nprobe = 8, rerank = 120)
      .collect().map(_.getLong(1)).toSet
    assert((afterPq intersect beforePq).isEmpty &&
      afterPq.nonEmpty)
    val codesVt = new graft.io.VersionedTable(spark, s"$rootPq/codes")
    assert(codesVt.read().filter(
      col("id").isin(beforePq.toSeq: _*)).count() === 0,
      "codes masks must land with the vector masks")
  }

  test("index upsert: replaced vectors re-rank; no duplicates; history intact") {
    import graft.similarity.IvfPqIndex
    val corpus = embs.filter(col("vec_id") >= 5 && col("vec_id") < 60)
    val queries = embs.filter(col("vec_id") < 5)

    // IVF flavor: move vector 10 onto query 0's embedding — after the
    // upsert it must be query 0's exact-match top hit, exactly once
    val root = Fixtures.tempDir("graft-ivf-upsert") + "/idx"
    IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 4, iters = 2)
    val moved = queries.filter(col("vec_id") === 0)
      .select(lit(10L).as("vec_id"), col("embedding"))
    IvfIndex.upsert(spark, moved, "vec_id", "embedding", root)
    val res = IvfIndex.query(spark, root,
      queries.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, nprobe = 4).collect()
    assert(res.count(_.getLong(1) === 10L) === 1,
      s"upserted id must appear exactly once: ${res.mkString(",")}")
    assert(res.exists(r => r.getLong(1) === 10L &&
      math.abs(r.getDouble(2) - 1.0) < 1e-9),
      "upserted vector must re-rank under its NEW embedding")
    val vt = new graft.io.VersionedTable(spark, s"$root/vectors")
    assert(vt.read().filter(col("id") === 10L).count() === 1)
    assert(vt.readVersion(0L).filter(col("id") === 10L).count() === 1,
      "pre-upsert version keeps the original vector")

    // IVF+PQ flavor: same contract through codes + vectors
    val rootPq = Fixtures.tempDir("graft-ivfpq-upsert") + "/idx"
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding", rootPq,
      nlist = 4, m = 8, ksub = 16, iters = 2)
    IvfPqIndex.upsert(spark, moved, "vec_id", "embedding", rootPq)
    val resPq = IvfPqIndex.query(spark, rootPq,
      queries.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, nprobe = 4, rerank = 120).collect()
    assert(resPq.count(_.getLong(1) === 10L) === 1)
    assert(resPq.exists(r => r.getLong(1) === 10L &&
      math.abs(r.getDouble(2) - 1.0) < 1e-9))
    val codesVt = new graft.io.VersionedTable(spark, s"$rootPq/codes")
    assert(codesVt.read().filter(col("id") === 10L).count() === 1,
      "codes must hold exactly one row for an upserted id")
  }

  test("index compact: small append files fold; answers and pruning unchanged") {
    import graft.similarity.IvfPqIndex
    val corpus = embs.filter(col("vec_id") >= 5 && col("vec_id") < 60)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivfpq-compact") + "/idx"
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 4, m = 8, ksub = 16, iters = 2)
    // append churn: two small batches → extra files per touched cluster
    IvfPqIndex.append(spark,
      embs.filter(col("vec_id") >= 60 && col("vec_id") < 80),
      "vec_id", "embedding", root)
    IvfPqIndex.append(spark,
      embs.filter(col("vec_id") >= 80 && col("vec_id") < 100),
      "vec_id", "embedding", root)
    val vecsVt = new graft.io.VersionedTable(spark, s"$root/vectors")
    val codesVt = new graft.io.VersionedTable(spark, s"$root/codes")
    val filesBefore = vecsVt.manifestEntries(vecsVt.currentVersion.get).size +
      codesVt.manifestEntries(codesVt.currentVersion.get).size
    def answers = IvfPqIndex.query(spark, root, queries,
      "vec_id", "embedding", k = 3, nprobe = 4, rerank = 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pre = answers
    IvfPqIndex.compact(spark, root)
    val filesAfter = vecsVt.manifestEntries(vecsVt.currentVersion.get).size +
      codesVt.manifestEntries(codesVt.currentVersion.get).size
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count: $filesBefore -> $filesAfter")
    assert(answers === pre, "a compacted index must answer identically")
    // partitioning survives compaction → probe pruning still holds
    val one = IvfPqIndex.query(spark, root,
      queries.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, nprobe = 2, rerank = 120)
    one.collect()
    val planned = one.inputFiles.filter(_.contains("cluster="))
      .map(f => f.split("cluster=")(1).split("/")(0)).toSet
    assert(planned.nonEmpty && planned.size <= 2,
      s"post-compact probe must stay pruned: $planned")
  }

  test("distributed frame delete: victims never collected, NULL and " +
      "duplicate ids harmless, the [min,max] envelope prunes " +
      "out-of-band files, both index tables mask in step") {
    import graft.similarity.IvfPqIndex
    import spark.implicits._
    val corpus = embs.filter(col("vec_id") >= 5)
    val queries = embs.filter(col("vec_id") < 5)
    val root = Fixtures.tempDir("graft-ivf-fdel") + "/idx"
    IvfIndex.build(spark, corpus, "vec_id", "embedding", root,
      nlist = 8, iters = 2)
    val total = corpus.count()
    // victim frame WITH a NULL and duplicates: id % 3 == 0 twice + null
    val victims = corpus.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").cast("long").as("id"))
    val messy = victims.unionByName(victims)
      .unionByName(Seq(Option.empty[Long]).toDF("id"))
    IvfIndex.delete(spark, root, messy)
    val vt = new graft.io.VersionedTable(spark, s"$root/vectors")
    val nVictims = victims.count()
    assert(vt.read().count() === total - nVictims,
      "exactly the distinct non-null victims must be masked")
    assert(vt.read().filter(col("id") % 3 === 0).count() === 0L)
    val served = IvfIndex.query(spark, root, queries,
      "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(_.getLong(1))
    assert(served.nonEmpty && served.forall(_ % 3 != 0))

    // envelope pruning: a NARROW victim band leaves out-of-band files
    // maskless (their stats exclude the [min,max] envelope)
    val lo = vt.read().agg(min("id")).head().getLong(0)
    IvfIndex.delete(spark, root,
      vt.read().filter(col("id") === lo).select("id"))
    val entries = vt.manifestEntries(vt.currentVersion.get)
    val outOfBand = entries.filter(_.stats.get("id")
      .exists { case (mn, _) => mn > lo.toDouble })
    assert(outOfBand.nonEmpty, "fixture needs files beyond the envelope")
    // out-of-band files gained no NEW mask link in this commit: the
    // newest commit dir never appears in their chains
    val newest = entries.flatMap(_.dvDirs).distinct
      .filter(_.startsWith(f"_data/c${vt.currentVersion.get}%08d"))
    assert(newest.nonEmpty, "the delete must have written a delta link")
    assert(outOfBand.forall(e => !e.dvDirs.exists(newest.contains)),
      "files whose id stats exclude the envelope must not be touched")

    // IVF+PQ flavor: one frame, both tables commit the same id set
    val rootPq = Fixtures.tempDir("graft-ivfpq-fdel") + "/idx"
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding", rootPq,
      nlist = 8, m = 8, ksub = 16, iters = 2)
    IvfPqIndex.delete(spark, rootPq,
      corpus.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").cast("long")))
    val vecsPq = new graft.io.VersionedTable(spark, s"$rootPq/vectors")
    val codesPq = new graft.io.VersionedTable(spark, s"$rootPq/codes")
    assert(vecsPq.read().filter(col("id") % 3 === 0).count() === 0L)
    assert(codesPq.read().filter(col("id") % 3 === 0).count() === 0L)
    assert(vecsPq.read().count() === codesPq.read().count())
  }
}
