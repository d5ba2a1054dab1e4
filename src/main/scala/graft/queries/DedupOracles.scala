package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generated DuckDB oracle for the winnowing near-dup query (q31) —
  * the [[AnnOracles]] recipe applied to the last oracle-less row.
  *
  * The rolling-hash + windowed-min SELECTION has no tractable
  * single-statement SQL form, but everything DOWNSTREAM of it does:
  * run the deterministic fingerprint kernel
  * ([[graft.functions.WinnowingFingerprints]]) in Spark, freeze each
  * document's sorted-distinct fingerprint set as a `(doc_id, fp)`
  * VALUES literal, and let DuckDB independently replay the df-cap
  * (posting lists of 2..maxDf distinct docs), candidate-pair
  * expansion, merge-set Jaccard, thresholding, rounding, and output
  * ordering. A regression in posting-list capping, pair building, or
  * pair scoring now hash-mismatches instead of hiding under the
  * coarse exact-Jaccard-overlap spec; the kernel itself stays covered
  * by WinnowingFingerprintsSpec's guarantee tests.
  *
  * Literal size is bounded: one row per document × the winnowed
  * fingerprint density ≈ 2/(w+1) per byte (~100 longs per ~300-char
  * doc), i.e. ~megabyte-scale SQL at verify's sf0.01 — the same
  * order as the frozen ANN codebooks relative to their data.
  *
  * Jaccard here is |A∩B| / |A∪B| of already-distinct sets, computed
  * as ONE integer division on both engines (no float accumulation →
  * bit-identical), thresholded RAW and rounded only for output —
  * mirroring `Dedup.winnowingNearDupPairs` exactly.
  *
  * Parameters mirror `TrainingData.winnowNearDup` (k=12, w=6,
  * threshold=0.4, maxDf=20); drift between them is caught by the
  * oracle itself (different params → different pair sets → hash
  * mismatch).
  */
object DedupOracles {

  /** The query keys [[dynamic]] generates oracles for, statically —
    * same contract as [[AnnOracles.keys]]. */
  val keys: Set[String] = Set("q31_winnow_neardup")

  def dynamic(spark: SparkSession, dir: String): Map[String, String] = {
    val out = Map("q31_winnow_neardup" ->
      winnowSql(spark, dir, k = 12, w = 6, threshold = 0.4, maxDf = 20))
    assert(out.keySet == keys,
      s"DedupOracles.dynamic drifted from DedupOracles.keys: ${
        (out.keySet diff keys) ++ (keys diff out.keySet)}")
    out
  }

  def winnowSql(spark: SparkSession, dir: String, k: Int, w: Int,
      threshold: Double, maxDf: Int): String = {
    // one row per document (bounded, like the ANN model collects);
    // the kernel is deterministic, so regeneration is reproducible
    val rows = Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.WinnowingFingerprints
          .winnow(lower(col("text")), k, w).as("fp"))
      .collect()
    val values = rows.map { r =>
      val fp = r.getSeq[Long](1).mkString("[", ", ", "]")
      s"(${r.getLong(0)}, $fp::BIGINT[])"
    }.mkString(",\n       ")
    s"""WITH fp AS (
         SELECT CAST(doc_id AS BIGINT) AS doc_id, fp
         FROM (VALUES $values) AS t(doc_id, fp)),
       ex AS (SELECT doc_id, unnest(fp) AS h FROM fp),
       -- df-cap: fp sets are distinct, so count(*) = distinct docs
       capped AS (
         SELECT h FROM ex GROUP BY h
         HAVING count(*) BETWEEN 2 AND $maxDf),
       cand AS (
         SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         FROM capped c
         JOIN ex l ON l.h = c.h
         JOIN ex r ON r.h = c.h AND l.doc_id < r.doc_id),
       scored AS (
         SELECT cand.doc_a, cand.doc_b,
           len(list_intersect(a.fp, b.fp))::DOUBLE /
             (len(a.fp) + len(b.fp) - len(list_intersect(a.fp, b.fp))) AS j
         FROM cand
         JOIN fp a ON a.doc_id = cand.doc_a
         JOIN fp b ON b.doc_id = cand.doc_b)
       SELECT doc_a, doc_b, j AS fp_jaccard
       FROM scored WHERE j >= $threshold
       ORDER BY doc_a, doc_b"""
  }
}
