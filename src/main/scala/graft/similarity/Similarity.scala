package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>` / `array<double>`).
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k. Query side is tiny and
  *     broadcast; the corpus is scanned once; per-query top-k is a
  *     window rank (per-partition partial top-k then merge — no global
  *     sort of the scored pairs).
  *   - [[signLshTopK]]: sign-LSH bucketed ANN. Each vector gets a
  *     `bits`-bit bucket from the signs of its leading components
  *     (axis-aligned random-hyperplane LSH); the candidate join is an
  *     equi-join on bucket id, so each query only scores ~corpus/2^bits
  *     vectors. At 100 TB the corpus is hash-partitioned (or bucketed
  *     on disk) by bucket id, making the probe a co-located join.
  *
  * Dot products use `zip_with` + `aggregate` — sequential fold over the
  * array, codegen'd, deterministic order (so external oracles match
  * bit-for-bit after a fixed rounding).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a left fold in ascending index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cast an array<float> embedding to array<double> so all arithmetic
    * runs in double precision (matches any double-based oracle). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sign-LSH bucket id: bit i set iff component i+1 > 0, for i < bits.
    * For zero-centered embeddings each axis-aligned hyperplane splits
    * the corpus roughly in half → ~uniform 2^bits buckets. */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors. `queries` must be small (it is broadcast). Ties break on
    * ascending corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(cos.desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), round(cos, 4).as("cosine"))
      .orderBy("q_id", "neighbor_id")
  }

  /** Sign-LSH ANN top-k: queries probe only their own bucket. Returns
    * the same shape as [[bruteForceTopK]]; recall < 1 by construction
    * (single-probe). Multi-probe = union over neighboring buckets. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", signBucket(col("qv"), bits)))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(cos.desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"), round(cos, 4).as("cosine"))
      .orderBy("q_id", "neighbor_id")
  }
}
