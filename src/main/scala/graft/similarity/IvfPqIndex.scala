package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** PERSISTENT IVF+PQ ANN index — [[IvfIndex]]'s memory-bound sibling
  * and the true 100 TB shape: what persists per vector is its
  * inverted-list id and m PQ codes (64× smaller than the raw
  * vector), hive-partitioned BY CLUSTER, plus the raw vectors for the
  * bounded exact re-rank and the model (centroids + residual
  * codebooks) as tiny tables. All four are versioned commits under
  * one root: rebuilds are new versions, old indexes stay readable.
  *
  * Query probes the stored model, scans ONLY the probed clusters'
  * CODES files (manifest partition pruning — at nlist=4096/nprobe=64
  * that is ~1.6% of an already-64×-compressed table), ADC-ranks with
  * the sharded top-r, and exact-cosine re-ranks the survivors against
  * the raw-vector table (a join whose left side is queries×rerank
  * rows). Training, probe rule, encoding, ADC fold, and rank are the
  * SAME code as [[Similarity.ivfPqTopK]] ([[Similarity.ivfPqModel]] /
  * [[Similarity.ivfPqQuerySide]] / [[Similarity.adcRerank]]), so
  * results are identical for equal parameters — q70 hash-checks this
  * path against q58's generated frozen-model oracle. */
object IvfPqIndex {

  /** Train + encode + commit the index tables. Returns the codes
    * table's new version. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, root: String, nlist: Int, m: Int, ksub: Int,
      iters: Int = 2): Long = {
    val corpusN = Similarity.normalizedFrame(corpus, idCol, vecCol)
    val (centroids, codebooks, codes) =
      Similarity.ivfPqModel(corpusN, nlist, m, ksub, iters)
    import spark.implicits._
    new VersionedTable(spark, s"$root/centroids").write(
      centroids.zipWithIndex.flatMap { case (c, cl) =>
        c.zipWithIndex.map { case (x, pos) => (cl, pos, x) }
      }.toIndexedSeq.toDF("cluster", "pos", "x"))
    new VersionedTable(spark, s"$root/codebooks").write(
      (for {
        j <- codebooks.indices
        code <- codebooks(j).indices
        (x, pos) <- codebooks(j)(code).zipWithIndex
      } yield (j, code, pos, x)).toIndexedSeq.toDF("j", "code", "pos", "x"))
    new VersionedTable(spark, s"$root/vectors").write(
      corpus.select(col(idCol).cast("long").as("id"),
        Similarity.toDouble(col(vecCol)).as("v")))
    new VersionedTable(spark, s"$root/codes")
      .write(codes, partitionBy = Some(Seq("cluster")))
  }

  /** Incremental ingest: normalize, assign, and residual-encode NEW
    * vectors with the STORED model (no retraining — the standard
    * IVFPQ append; retrain = [[build]]) and append-commit codes +
    * raw vectors. Queries immediately see old + new; time travel
    * still serves the pre-append index. */
  def append(spark: SparkSession, vectors: DataFrame, idCol: String,
      vecCol: String, root: String): Long = {
    val (centroids, codebooks) = loadModel(spark, root)
    val dsub = codebooks(0)(0).length
    val assigned = Similarity.withCluster(
      Similarity.normalizedFrame(vectors, idCol, vecCol), centroids)
      .withColumn("v",
        Similarity.residualOf(centroids)(col("v"), col("cluster")))
    val codes = Similarity.withPqCodes(assigned, codebooks, dsub)
      .select("id", "cluster", "codes")
    new VersionedTable(spark, s"$root/vectors").write(
      vectors.select(col(idCol).cast("long").as("id"),
        Similarity.toDouble(col(vecCol)).as("v")),
      org.apache.spark.sql.SaveMode.Append)
    new VersionedTable(spark, s"$root/codes")
      .write(codes, org.apache.spark.sql.SaveMode.Append)
  }

  /** The stored model back as driver-side arrays (both tables are
    * broadcast-sized by construction). */
  def loadModel(spark: SparkSession, root: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val centroids = IvfIndex.loadCentroids(spark, root)
    val rows = new VersionedTable(spark, s"$root/codebooks").read()
      .select("j", "code", "pos", "x").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val dsub = rows.map(_.getInt(2)).max + 1
    val cbs = Array.ofDim[Double](m, ksub, dsub)
    rows.foreach(r => cbs(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    (centroids, cbs)
  }

  /** ANN top-k against the persisted index: probe lists from the
    * stored model, codes scan partition-pruned to the probed
    * clusters, sharded ADC top-`rerank`, exact re-rank on the stored
    * raw vectors. */
  def query(spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else 4 * k
    val (centroids, codebooks) = loadModel(spark, root)
    val q = Similarity.ivfPqQuerySide(
      queries, idCol, vecCol, centroids, codebooks, nprobe)
    val probed = q.select("cluster").distinct()
      .collect().map(_.getInt(0).toString).toSet
    val codes = new VersionedTable(spark, s"$root/codes")
      .readWherePartitionIn("cluster", probed)
      .select(col("id").as("neighbor_id"),
        col("cluster").cast("int").as("cluster"), col("codes"))
    val vecs = new VersionedTable(spark, s"$root/vectors").read()
      .select(col("id").as("neighbor_id"), col("v"))
      .withColumn("nv", sqrt(Similarity.dot(col("v"), col("v"))))
    Similarity.adcRerank(q, codes, vecs, r, k)
  }
}
