package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT MinHash-LSH dedup index — the build-once/probe-many form
  * of q23's near-dup detection, the shape an ingest pipeline actually
  * runs: sign the historical corpus ONCE, store its band postings and
  * hashed shingle sets as versioned tables, then answer "is this new
  * batch a near-dup of anything indexed?" by probing ONLY the new
  * docs' band keys. The streaming complement: an arriving batch is
  * signed (narrow), its ≤ numBands keys equi-join the postings table,
  * and only candidate pairs pay Jaccard verification — the historical
  * corpus is never re-signed and never re-scanned beyond the
  * candidates' sets (semi-join scoped read).
  *
  * Storage: `postings` (doc_id, band, band_key) — O(numBands) rows per
  * doc; `sets` (doc_id, sorted hashed shingles) for the verify stage.
  * Both are manifest-log versioned tables: `append` commits O(new)
  * files, old versions stay readable mid-ingest, and the index is
  * time-travelable like any other table (the q69/q88 convention).
  *
  * Scale: the probe join is band-key equi; a degenerate band key
  * (boilerplate-heavy corpora) fans out on the INDEX side — production
  * adds the q23 maxBucket / PPJoin df-cap trade there, logged per
  * SCALE.md's no-silent-caps rule. Verification is the codegen'd
  * sorted-merge Jaccard kernel (no boxed set builds).
  *
  * Band key layout mirrors `Dedup.lshCandidates` exactly (same 8-hash
  * md5-slice signatures, same "_"-joined band keys), so the q108
  * oracle replays the whole path in SQL from the raw text.
  */
class MinhashIndex(spark: SparkSession, root: String,
    numHashes: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3) {

  private val postings = new graft.io.VersionedTable(spark, s"$root/postings")
  private val sets = new graft.io.VersionedTable(spark, s"$root/sets")
  private val numBands = numHashes / rowsPerBand

  /** (bands(doc_id, band, band_key), sets(doc_id, sh)) for a doc
    * frame — one signing pass feeds both (the q23 convention).
    * Shingle-less docs are dropped from postings (their degenerate ""
    * key would bucket every short doc together) but kept out of sets
    * too: they can never verify above 0. */
  private def sign(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol,
      numHashes, shingleN).localCheckpoint()
    val bandStructs = (0 until numBands).map { b =>
      val key = concat_ws("_", (0 until rowsPerBand).map(r =>
        col(s"mh_${b * rowsPerBand + r}").cast("string")): _*)
      struct(lit(b).as("band"), key.as("band_key"))
    }
    val bands = sigs.filter(col("mh_0").isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
    val sh = sigs.filter(col("mh_0").isNotNull)
      .select(col(idCol).as("doc_id"),
        graft.functions.HashedNGrams.hashedNGrams(col("shingles"), 1)
          .as("sh"))
    (bands, sh)
  }

  /** Sign and store the corpus as version 0 of both tables. */
  def build(docs: DataFrame, idCol: String, textCol: String): Unit = {
    val (bands, sh) = sign(docs, idCol, textCol)
    postings.write(bands)
    sets.write(sh)
  }

  /** Incremental ingest: sign ONLY the new docs, append O(new) rows
    * to both tables (new manifest versions; readers unaffected). */
  def append(docs: DataFrame, idCol: String, textCol: String): Unit = {
    val (bands, sh) = sign(docs, idCol, textCol)
    postings.write(bands, SaveMode.Append)
    sets.write(sh, SaveMode.Append)
  }

  /** Streaming ingest: a foreachBatch sink signing each micro-batch
    * into the index, EXACTLY-ONCE per `appId` via the per-table
    * `STREAM_<appId>_BATCH_<n>` marker contract (the
    * `LexicalIndex.streamingIngestBatch` convention): the index
    * writes TWO tables per batch, so each carries its OWN marker and
    * a replayed batch (foreachBatch is at-least-once) completes
    * whichever commit is missing and skips the one that landed —
    * postings and sets can never double.
    *
    * Usage: `docsStream.writeStream.foreachBatch(
    * idx.streamingIngestBatch("doc_id", "text", "mh-ingest-v1"))
    * .option("checkpointLocation", …).start()`. */
  def streamingIngestBatch(idCol: String, textCol: String,
      appId: String): (DataFrame, Long) => Unit = {
    require(appId.matches("[A-Za-z0-9.-]+"),
      s"appId must be [A-Za-z0-9.-]+, got '$appId'")
    val marker = s"STREAM_${appId}_BATCH_"
    (batch, batchId) =>
      if (!batch.isEmpty) {
        val (bands, sh) = sign(batch, idCol, textCol)
        def appendOnce(vt: graft.io.VersionedTable, df: DataFrame): Unit = {
          val last = vt.lastOperationWith(marker)
            .map(_.operation.stripPrefix(marker).toLong)
          if (last.forall(_ < batchId))
            vt.write(df, SaveMode.Append, s"$marker$batchId")
        }
        appendOnce(postings, bands)
        appendOnce(sets, sh)
      }
  }

  /** Probe: near-dup pairs (doc_q from `docs`, doc_x indexed) with
    * hashed-shingle Jaccard ≥ threshold. The index is read twice:
    * postings by the probe equi-join, sets ONLY for candidate ids. */
  def query(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val (qb, qs) = sign(docs, idCol, textCol)
    val cand = qb
      .select(col("doc_id").as("doc_q"), col("band"), col("band_key"))
      .join(postings.read()
        .select(col("doc_id").as("doc_x"), col("band"), col("band_key")),
        Seq("band", "band_key"))
      .select("doc_q", "doc_x").distinct()
    val xs = sets.read()
      .join(cand.select(col("doc_x").as("doc_id")).distinct(), Seq("doc_id"))
      .select(col("doc_id").as("doc_x"), col("sh").as("sh_x"))
    cand
      .join(qs.select(col("doc_id").as("doc_q"), col("sh").as("sh_q")),
        Seq("doc_q"))
      .join(xs, Seq("doc_x"))
      .select(col("doc_q"), col("doc_x"),
        graft.functions.SortedLongSetJaccard.sortedJaccard(
          col("sh_q"), col("sh_x")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_q", "doc_x")
  }
}
