package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Generated DuckDB oracles for the iteratively-trained ANN queries
  * (q30 IVF, q57 PQ, q58 IVF+PQ).
  *
  * K-means training is not expressible as one SQL statement, but the
  * SEARCH phase is: train once in Spark (deterministic — seeded init,
  * fixed Lloyd rounds, 6-decimal-rounded means), then freeze the
  * trained centroids/codebooks as array literals inside a generated
  * SQL statement that independently replicates assignment → probe →
  * ADC → exact re-rank. The same technique as q38's generated simhash
  * terms (`TrainingData.simhashPairsSql`): the oracle re-derives every
  * search-phase step from the frozen model, so a regression in
  * assignment, probe selection, ADC table lookup, or rank ordering
  * hash-mismatches instead of hiding under a coarse recall threshold.
  * Training itself stays covered by TrainingDataSpec's recall and
  * codebook-shape specs.
  *
  * `graft.Verify` calls [[dynamic]] per scale-factor dir and merges the
  * result into the static `SparkEntry.oracleSql` map before dumping
  * `oracle_sql.json` — oracle SQL is data-dependent here because the
  * trained model is.
  *
  * Parameters mirror `TrainingData.annIvf` / `annPq` / `annIvfPq`
  * (drift is pinned by AnnOracleSpec comparing oracle vs Spark rows).
  */
object AnnOracles {

  /** vec_id < QuerySplit = query set; the rest is the corpus (the
    * q26/q27/q30/q57/q58 convention). */
  private val QuerySplit = 5

  /** The query keys [[dynamic]] generates oracles for, statically
    * (no model training needed to read it). `dynamic` asserts its
    * output against this set, and TrainingDataSpec derives its
    * static-oracle-omission assertion from it — so registering a new
    * generated oracle without updating this set fails loudly at the
    * first generation (spec or Verify), never silently. */
  val keys: Set[String] = Set(
    "q30_ann_ivf", "q69_ann_ivf_indexed", "q75_ann_ivf_filtered",
    "q57_ann_pq", "q58_ann_ivfpq", "q70_ann_ivfpq_indexed",
    "q86_cluster_profile", "q93_semdedup", "q113_ann_eval",
    "q114_balanced_sample", "q246_ann_staleness")

  def dynamic(spark: SparkSession, dir: String): Map[String, String] = {
    val ivf = ivfSql(spark, dir)
    val ivfpq = ivfPqSql(spark, dir)
    val out = Map(
      "q30_ann_ivf" -> ivf,
      // q69/q70 serve the SAME searches from the persisted indexes
      // (identical params + deterministic training → same answers),
      // so each oracle hash-checks both its paths independently
      "q69_ann_ivf_indexed" -> ivf,
      // filtered search: same frozen centroids (training sees the
      // full corpus), but only label=0 vectors are scorable
      "q75_ann_ivf_filtered" ->
        ivfSql(spark, dir, corpusWhere = "label = 0"),
      "q57_ann_pq" -> pqSql(spark, dir),
      "q58_ann_ivfpq" -> ivfpq,
      "q70_ann_ivfpq_indexed" -> ivfpq,
      "q86_cluster_profile" -> kmeansProfileSql(spark, dir),
      "q93_semdedup" -> semDedupSql(spark, dir),
      "q113_ann_eval" -> annEvalSql(spark, dir),
      "q246_ann_staleness" -> annStalenessSql(spark, dir),
      "q114_balanced_sample" -> balancedSampleSql(spark, dir))
    assert(out.keySet == keys,
      s"AnnOracles.dynamic drifted from AnnOracles.keys: ${
        (out.keySet diff keys) ++ (keys diff out.keySet)}")
    out
  }

  // ------------------------------------------------------------ helpers

  private def fd(x: Double): String = java.lang.Double.toString(x)

  private def vecLit(a: Array[Double]): String =
    a.map(fd).mkString("[", ", ", "]::DOUBLE[]")

  /** `(VALUES (0, [..]), (1, [..]), …) AS t(cl, c)` centroid relation. */
  private def centRelation(cent: Array[Array[Double]]): String =
    cent.zipWithIndex
      .map { case (c, i) => s"($i, ${vecLit(c)})" }
      .mkString("(VALUES ", ", ", ") AS t(cl, c)")

  /** `(VALUES (j, code, [..]), …) AS t(j, code, c)` codebook relation. */
  private def cbRelation(cb: Array[Array[Array[Double]]]): String = {
    val rows = for {
      j <- cb.indices
      code <- cb(j).indices
    } yield s"($j, $code, ${vecLit(cb(j)(code))})"
    rows.mkString("(VALUES ", ", ", ") AS t(j, code, c)")
  }

  /** Squared L2 between `v` elements [off+1, off+d] and codeword `c`
    * — ascending-index fold, mirroring graft_l2sq. */
  private def l2(v: String, c: String, d: Int, off: String = "0"): String =
    s"list_sum(list_transform(range(1, ${d + 1}), " +
      s"i -> ($v[$off + i] - $c[i]) * ($v[$off + i] - $c[i])))"

  private def cos(qv: String, v: String): String =
    s"list_dot_product($qv, $v) / (sqrt(list_dot_product($qv, $qv)) " +
      s"* sqrt(list_dot_product($v, $v)))"

  /** Shared exact-cosine re-rank tail over raw vectors: rank `cand`
    * (q_id, neighbor_id) per query by cosine desc / neighbor asc,
    * keep k, emit rounded. */
  private def rerankTail(k: Int): String =
    s"""scored AS (
         SELECT cand.q_id, cand.neighbor_id,
           ${cos("q.v", "c.v")} AS cos,
           row_number() OVER (PARTITION BY cand.q_id
             ORDER BY ${cos("q.v", "c.v")} DESC, cand.neighbor_id ASC) AS rn
         FROM cand
         JOIN queries q ON q.id = cand.q_id
         JOIN corpus c ON c.id = cand.neighbor_id)
       SELECT q_id, neighbor_id, round(cos, 4) AS cosine
       FROM scored WHERE rn <= $k ORDER BY q_id, neighbor_id"""

  /** `corpusWhere` restricts the SCORABLE corpus (filtered search's
    * pre-filter — may reference `label`); training/queries are never
    * restricted, mirroring `IvfIndex.query(filter = …)`. */
  private def baseTables(corpusWhere: String = "TRUE"): String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       corpus AS (SELECT vec_id AS id, v FROM e
                  WHERE vec_id >= $QuerySplit AND ($corpusWhere)),
       queries AS (SELECT vec_id AS id, v FROM e WHERE vec_id < $QuerySplit)"""

  /** Normalized view `<name>n(id, vn)` of `<name>` — mirrors the
    * L2-normalization Similarity.pqTopK/ivfPqTopK apply before
    * training/encoding/ADC (re-rank stays on the raw vectors). */
  private def normalized(name: String): String =
    s"""${name}n AS (SELECT id,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
       FROM $name)"""

  /** Nearest-centroid assignment of `rel(id, <vcol>)` as
    * `<out>(id, cluster)` — first-min tie-break (lowest cl), matching
    * array_position(array_min). */
  private def assign(out: String, rel: String, vcol: String, dim: Int,
      limit: Int = 1): String =
    s"""${out}_d AS (
         SELECT $rel.id, cent.cl, ${l2(s"$rel.$vcol", "cent.c", dim)} AS d
         FROM $rel CROSS JOIN cent),
       $out AS (
         SELECT id, cl AS cluster FROM (
           SELECT id, cl, row_number() OVER (PARTITION BY id
             ORDER BY d ASC, cl ASC) AS rn FROM ${out}_d)
         WHERE rn <= $limit)"""

  /** PQ encoding of `rel(id[, cluster], <vcol>)` into
    * `codes(id[, cluster], codes)` (list of m codes, subspace order),
    * plus per-query ADC tables are built with the same kernel. */
  private def encode(rel: String, vcol: String, dsub: Int,
      carryCluster: Boolean): String = {
    val clSel = if (carryCluster) s"$rel.cluster, " else ""
    val clGroup = if (carryCluster) ", cluster" else ""
    s"""enc_d AS (
         SELECT $rel.id, ${clSel}cb.j, cb.code,
           ${l2(s"$rel.$vcol", "cb.c", dsub, s"cb.j * $dsub")} AS d
         FROM $rel CROSS JOIN cb),
       enc AS (
         SELECT id${clGroup}, j, code FROM (
           SELECT id${clGroup}, j, code, row_number() OVER
             (PARTITION BY id, j ORDER BY d ASC, code ASC) AS rn
           FROM enc_d)
         WHERE rn = 1),
       codes AS (
         SELECT id${clGroup}, list(code ORDER BY j) AS codes
         FROM enc GROUP BY id${clGroup})"""
  }

  // ---------------------------------------------------------------- q30

  /** IVF search-phase oracle: frozen trained centroids; assignment,
    * nprobe-list probe, and exact cosine rank replicated in SQL.
    * Mirrors `TrainingData.annIvf` (nlist=8, nprobe=3, k=3).
    * `corpusWhere` ≠ TRUE mirrors the FILTERED variant
    * (`TrainingData.annIvfFilteredIndexed`): training stays on the
    * full corpus — the frozen centroids are identical — but only
    * matching vectors assign/score. */
  def ivfSql(spark: SparkSession, dir: String,
      corpusWhere: String = "TRUE"): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val centroids = Similarity.ivfTrain(
      e.filter(col("vec_id") >= QuerySplit), "vec_id", "embedding",
      nlist = 8, iters = 2)
    val dim = centroids(0).length
    s"""WITH cent AS (SELECT * FROM ${centRelation(centroids)}),
       ${baseTables(corpusWhere)},
       ${assign("ca", "corpus", "v", dim)},
       ${assign("probe", "queries", "v", dim, limit = 3)},
       cand AS (
         SELECT p.id AS q_id, ca.id AS neighbor_id
         FROM probe p JOIN ca ON ca.cluster = p.cluster
         WHERE p.id <> ca.id),
       ${rerankTail(k = 3)}"""
  }

  // ---------------------------------------------------------------- q86

  /** K-means cluster-profile oracle: frozen trained centroids (FULL
    * table — clustering is a curation op, no query split); DuckDB
    * independently replays assignment (first-min tie-break), the
    * per-(cluster, label) counts, dominant-label window, and mean
    * L2-to-centroid. Mirrors `TrainingData.clusterProfile` (nlist=8,
    * iters=2). */
  def kmeansProfileSql(spark: SparkSession, dir: String): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val cent = Similarity.ivfTrain(e, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val dim = cent(0).length
    s"""WITH cent AS (SELECT * FROM ${centRelation(cent)}),
       e AS (SELECT vec_id AS id, label, embedding::DOUBLE[] AS v
             FROM embeddings),
       ad AS (SELECT e.id, e.label, cent.cl,
                ${l2("e.v", "cent.c", dim)} AS d
              FROM e CROSS JOIN cent),
       a AS (SELECT id, label, cl AS cluster, sqrt(d) AS dist FROM (
               SELECT *, row_number() OVER (PARTITION BY id
                 ORDER BY d ASC, cl ASC) AS rn FROM ad)
             WHERE rn = 1),
       per AS (SELECT cluster, label, count(*) AS c FROM a GROUP BY 1, 2),
       dom AS (SELECT cluster, label AS dominant_label, c FROM (
                 SELECT *, row_number() OVER (PARTITION BY cluster
                   ORDER BY c DESC, label ASC) AS rn FROM per)
               WHERE rn = 1),
       -- order-insensitive mean: per-row 1e-6 round → exact BIGINT sum
       -- → one float division, mirroring clusterProfile (a float avg
       -- would sum in engine-specific order and could flip the hash)
       agg AS (SELECT cluster, count(*) AS n_vectors,
                 sum(CAST(round(dist * 1000000) AS BIGINT)) AS sd
               FROM a GROUP BY 1)
       SELECT agg.cluster, agg.n_vectors, dom.dominant_label,
         dom.c * 1.0 / agg.n_vectors AS label_share,
         CAST(sd AS DOUBLE) / 1000000 / agg.n_vectors AS avg_dist
       FROM agg JOIN dom ON dom.cluster = agg.cluster
       ORDER BY agg.cluster"""
  }

  // ---------------------------------------------------------------- q93

  /** SemDeDup oracle: frozen trained centroids (full table, like q86);
    * DuckDB independently replays assignment, the within-cluster
    * pairwise cosine-τ test, and the keep-farthest-from-centroid rule
    * (ties → lower id). Mirrors `TrainingData.semDedup` (nlist=8,
    * iters=2, τ=0.4). */
  def semDedupSql(spark: SparkSession, dir: String): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val cent = Similarity.ivfTrain(e, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val dim = cent(0).length
    s"""WITH cent AS (SELECT * FROM ${centRelation(cent)}),
       e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
             FROM embeddings),
       ad AS (SELECT e.id, e.v, cent.cl, ${l2("e.v", "cent.c", dim)} AS d
              FROM e CROSS JOIN cent),
       a AS (SELECT id, v, cl AS cluster, sqrt(d) AS dist FROM (
               SELECT *, row_number() OVER (PARTITION BY id
                 ORDER BY d ASC, cl ASC) AS rn FROM ad)
             WHERE rn = 1),
       drops AS (
         SELECT DISTINCT x.id FROM a x JOIN a y
           ON x.cluster = y.cluster
           AND (y.dist > x.dist
                OR (y.dist = x.dist AND y.id < x.id))
           AND ${cos("x.v", "y.v")} >= 0.4)
       SELECT a.id AS vec_id, a.cluster,
         (drops.id IS NULL) AS kept
       FROM a LEFT JOIN drops ON drops.id = a.id
       ORDER BY vec_id"""
  }

  // ---------------------------------------------------------------- q113

  /** ANN-eval oracle: the frozen-centroid IVF result (ivfSql, ranked
    * by its rounded cosine — exactly what the Spark side ranks) joined
    * against an exact-cosine brute-force ground truth, folded into
    * per-query recall@3 and MRR. Mirrors `TrainingData.annEval`. */
  def annEvalSql(spark: SparkSession, dir: String): String = {
    val ivf = ivfSql(spark, dir)
    s"""WITH ivf AS ($ivf),
       ${baseTables()},
       bscored AS (
         SELECT q.id AS q_id, c.id AS neighbor_id,
           row_number() OVER (PARTITION BY q.id
             ORDER BY ${cos("q.v", "c.v")} DESC, c.id ASC) AS rn
         FROM queries q CROSS JOIN corpus c),
       gt AS (SELECT q_id, neighbor_id FROM bscored WHERE rn <= 3),
       sysr AS (
         SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
           ORDER BY cosine DESC, neighbor_id ASC) AS rk
         FROM ivf),
       hits AS (
         SELECT s.q_id, count(*) AS nhit, min(rk) AS minrk
         FROM sysr s JOIN gt
           ON gt.q_id = s.q_id AND gt.neighbor_id = s.neighbor_id
         GROUP BY 1)
       SELECT q.q_id,
         CAST(coalesce(nhit, 0) AS DOUBLE) / 3.0 AS recall_at_3,
         coalesce(1.0 / minrk, 0.0) AS mrr
       FROM (SELECT DISTINCT q_id FROM gt) q LEFT JOIN hits USING (q_id)
       ORDER BY q_id"""
  }

  // ---------------------------------------------------------------- q246

  /** Index-staleness oracle: the SAME frozen centroids as q30/q113
    * (the stored model never retrains through the churn), replayed
    * over the CHURNED corpus — ids ≡0 mod 3 gone, their negated
    * re-keyed (+10^6) replacements in. Kept rows and stale-model
    * appends assign identically (one nearest-centroid pass), exactly
    * what `IvfIndex.build` + `append` produce on disk; ground truth
    * is the exact-cosine brute force on the churned corpus; the
    * metric fold mirrors q113. Mirrors `TrainingData.annStaleness`
    * (nlist=8, nprobe=3, k=3). */
  def annStalenessSql(spark: SparkSession, dir: String): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val centroids = Similarity.ivfTrain(
      e.filter(col("vec_id") >= QuerySplit), "vec_id", "embedding",
      nlist = 8, iters = 2)
    val dim = centroids(0).length
    val churned =
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         corpus AS (
           SELECT vec_id AS id, v FROM e
           WHERE vec_id >= $QuerySplit AND vec_id % 3 <> 0
           UNION ALL
           SELECT vec_id + 1000000 AS id,
             list_transform(v, x -> -x) AS v
           FROM e WHERE vec_id >= $QuerySplit AND vec_id % 3 = 0),
         queries AS (SELECT vec_id AS id, v FROM e
                     WHERE vec_id < $QuerySplit)"""
    val ivf =
      s"""WITH cent AS (SELECT * FROM ${centRelation(centroids)}),
         $churned,
         ${assign("ca", "corpus", "v", dim)},
         ${assign("probe", "queries", "v", dim, limit = 3)},
         cand AS (
           SELECT p.id AS q_id, ca.id AS neighbor_id
           FROM probe p JOIN ca ON ca.cluster = p.cluster
           WHERE p.id <> ca.id),
         ${rerankTail(k = 3)}"""
    s"""WITH ivf AS ($ivf),
       $churned,
       bscored AS (
         SELECT q.id AS q_id, c.id AS neighbor_id,
           row_number() OVER (PARTITION BY q.id
             ORDER BY ${cos("q.v", "c.v")} DESC, c.id ASC) AS rn
         FROM queries q CROSS JOIN corpus c),
       gt AS (SELECT q_id, neighbor_id FROM bscored WHERE rn <= 3),
       sysr AS (
         SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
           ORDER BY cosine DESC, neighbor_id ASC) AS rk
         FROM ivf),
       hits AS (
         SELECT s.q_id, count(*) AS nhit, min(rk) AS minrk
         FROM sysr s JOIN gt
           ON gt.q_id = s.q_id AND gt.neighbor_id = s.neighbor_id
         GROUP BY 1)
       SELECT q.q_id,
         CAST(coalesce(nhit, 0) AS DOUBLE) / 3.0 AS recall_at_3,
         coalesce(1.0 / minrk, 0.0) AS mrr
       FROM (SELECT DISTINCT q_id FROM gt) q LEFT JOIN hits USING (q_id)
       ORDER BY q_id"""
  }

  // ---------------------------------------------------------------- q114

  /** Cluster-balanced-sample oracle: frozen trained centroids (full
    * table, like q86), naive per-cluster md5-order window capped at
    * 40 — the Spark side replays it via the q39-shaped two-pass
    * rank. Mirrors `TrainingData.clusterBalancedSample` (nlist=8,
    * iters=2, cap=40). */
  def balancedSampleSql(spark: SparkSession, dir: String): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val cent = Similarity.ivfTrain(e, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val dim = cent(0).length
    s"""WITH cent AS (SELECT * FROM ${centRelation(cent)}),
       e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
             FROM embeddings),
       ad AS (SELECT e.id, cent.cl, ${l2("e.v", "cent.c", dim)} AS d
              FROM e CROSS JOIN cent),
       a AS (SELECT id, cl AS cluster FROM (
               SELECT *, row_number() OVER (PARTITION BY id
                 ORDER BY d ASC, cl ASC) AS rn FROM ad)
             WHERE rn = 1),
       r AS (SELECT id, cluster,
               CAST(row_number() OVER (PARTITION BY cluster
                 ORDER BY md5(CAST(id AS VARCHAR)), id) AS INT)
                 AS rank_in_cluster
             FROM a)
       SELECT id AS vec_id, cluster, rank_in_cluster
       FROM r WHERE rank_in_cluster <= 40 ORDER BY vec_id"""
  }

  // ---------------------------------------------------------------- q57

  /** Flat-PQ search-phase oracle: frozen trained codebooks; L2
    * normalization, per-subspace encoding, ADC table build + lookup
    * fold, top-r cut, and exact re-rank replicated in SQL. Mirrors
    * `TrainingData.annPq` (m=8, ksub=16, rerank=120, k=3). */
  def pqSql(spark: SparkSession, dir: String): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val corpusN = normalizedFrame(e.filter(col("vec_id") >= QuerySplit))
    val codebooks = Similarity.pqTrain(corpusN, "id", "v", m = 8, ksub = 16)
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    s"""WITH cb AS (SELECT * FROM ${cbRelation(codebooks)}),
       ${baseTables()},
       ${normalized("corpus")},
       ${normalized("queries")},
       ${encode("corpusn", "vn", dsub, carryCluster = false)},
       tab_d AS (
         SELECT q.id AS q_id, cb.j, cb.code,
           ${l2("q.vn", "cb.c", dsub, s"cb.j * $dsub")} AS d
         FROM queriesn q CROSS JOIN cb),
       tab_j AS (SELECT q_id, j, list(d ORDER BY code) AS tj
                 FROM tab_d GROUP BY q_id, j),
       tabs AS (SELECT q_id, list(tj ORDER BY j) AS tabs
                FROM tab_j GROUP BY q_id),
       adc AS (
         SELECT t.q_id, c.id AS neighbor_id,
           list_sum(list_transform(range(1, ${m + 1}),
             j -> t.tabs[j][c.codes[j] + 1])) AS adc
         FROM tabs t CROSS JOIN codes c
         WHERE t.q_id <> c.id),
       cand AS (
         SELECT q_id, neighbor_id FROM (
           SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
             ORDER BY adc ASC, neighbor_id ASC) AS rn FROM adc)
         WHERE rn <= 120),
       ${rerankTail(k = 3)}"""
  }

  // ---------------------------------------------------------------- q58

  /** IVF+PQ search-phase oracle: frozen coarse centroids AND residual
    * codebooks; normalization, list assignment, residual encoding,
    * probe, per-(query, list) residual ADC tables, top-r cut, exact
    * re-rank — all replicated in SQL. Mirrors `TrainingData.annIvfPq`
    * (nlist=8, nprobe=5, m=8, ksub=16, rerank=120, k=3). */
  def ivfPqSql(spark: SparkSession, dir: String): String = {
    val e = Tables.load(spark, dir, "embeddings")
    val corpusN = normalizedFrame(e.filter(col("vec_id") >= QuerySplit))
    // the exact training path ivfPqTopK/IvfPqIndex run (shared code —
    // no drift between the Spark model and the frozen oracle model)
    val (centroids, codebooks, _) =
      Similarity.ivfPqModel(corpusN, nlist = 8, m = 8, ksub = 16, iters = 2)
    val dim = centroids(0).length
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    s"""WITH cent AS (SELECT * FROM ${centRelation(centroids)}),
       cb AS (SELECT * FROM ${cbRelation(codebooks)}),
       ${baseTables()},
       ${normalized("corpus")},
       ${normalized("queries")},
       ${assign("ca", "corpusn", "vn", dim)},
       res AS (
         SELECT cn.id, ca.cluster,
           list_transform(range(1, ${dim + 1}),
             i -> cn.vn[i] - cent.c[i]) AS rv
         FROM corpusn cn JOIN ca USING (id)
         JOIN cent ON cent.cl = ca.cluster),
       ${encode("res", "rv", dsub, carryCluster = true)},
       ${assign("probe", "queriesn", "vn", dim, limit = 5)},
       rq AS (
         SELECT p.id AS q_id, p.cluster,
           list_transform(range(1, ${dim + 1}),
             i -> qn.vn[i] - cent.c[i]) AS rv
         FROM probe p JOIN queriesn qn ON qn.id = p.id
         JOIN cent ON cent.cl = p.cluster),
       tab_d AS (
         SELECT rq.q_id, rq.cluster, cb.j, cb.code,
           ${l2("rq.rv", "cb.c", dsub, s"cb.j * $dsub")} AS d
         FROM rq CROSS JOIN cb),
       tab_j AS (SELECT q_id, cluster, j, list(d ORDER BY code) AS tj
                 FROM tab_d GROUP BY q_id, cluster, j),
       tabs AS (SELECT q_id, cluster, list(tj ORDER BY j) AS tabs
                FROM tab_j GROUP BY q_id, cluster),
       adc AS (
         SELECT t.q_id, c.id AS neighbor_id,
           list_sum(list_transform(range(1, ${m + 1}),
             j -> t.tabs[j][c.codes[j] + 1])) AS adc
         FROM tabs t JOIN codes c ON c.cluster = t.cluster
         WHERE t.q_id <> c.id),
       cand AS (
         SELECT q_id, neighbor_id FROM (
           SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id
             ORDER BY adc ASC, neighbor_id ASC) AS rn FROM adc)
         WHERE rn <= 120),
       ${rerankTail(k = 3)}"""
  }

  /** (id: long, v: array<double> L2-normalized) — the exact frame
    * shape the PQ family trains on (shared code, no drift). */
  private def normalizedFrame(df: DataFrame): DataFrame =
    Similarity.normalizedFrame(df, "vec_id", "embedding")
}
