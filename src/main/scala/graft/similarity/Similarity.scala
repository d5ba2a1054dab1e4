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
  * Dot products use the native codegen'd kernel
  * [[graft.functions.vector.arrayDot]] (a primitive loop inside
  * whole-stage codegen) — sequential fold in ascending index order,
  * deterministic (so external oracles match bit-for-bit after a fixed
  * rounding).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in ascending index order — a codegen'd native Catalyst
    * expression (graft.functions.ArrayDotProduct). Bit-identical to the
    * `aggregate(zip_with(…))` fold it replaces, but runs as a primitive
    * loop inside whole-stage codegen instead of an interpreted HOF. */
  def dot(a: Column, b: Column): Column = graft.functions.vector.arrayDot(a, b)

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
    // Norms are per-vector, not per-pair: compute them on each side
    // before the join, and materialize the cosine once as a column so
    // ranking and output share it (same sqrt(dot(v,v)) values → results
    // bit-identical to the inline form).
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv")))))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    rankTopK(q.crossJoin(c), k)
  }

  /** [[bruteForceTopK]] with the ranking tail swapped for the custom
    * physical operator ([[graft.plans.TopKPerKey]]): partial bounded
    * heaps keep ≤ k rows per query per input partition BEFORE the
    * exchange, so only k·partitions candidate rows per query cross
    * the wire instead of the whole scored stream (the window/sharded-
    * window forms both shuffle every candidate once). Result-set
    * identical to [[bruteForceTopK]] — the order is total (cosine
    * desc, neighbor_id asc) — which q128's oracle and the parity spec
    * both pin. */
  def bruteForceTopKViaOperator(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv")))))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val scored = q.crossJoin(c)
      .withColumn("_cos", dot(col("qv"), col("v")) / (col("nq") * col("nv")))
      .select(col("q_id"), col("neighbor_id"), col("_cos"))
    graft.plans.TopKPerKey.perKey(scored, Seq(col("q_id")),
        Seq(col("_cos").desc, col("neighbor_id").asc), k)
      .select(col("q_id"), col("neighbor_id"),
        round(col("_cos"), 4).as("cosine"))
      .orderBy("q_id", "neighbor_id")
  }

  /** Fan-out used by [[keepTopPerQuery]]'s pre-prune pass. */
  private[graft] val RankShards = 64

  /** Exact per-query top-`limit` under `ord` (which must end in a
    * per-query-unique tiebreak column so ranks are deterministic),
    * WITHOUT a single-reducer-per-query sort: a bare
    * `Window.partitionBy(q_id)` ranks every candidate of a query in
    * ONE task — for a flat-PQ ADC scan that is the whole corpus's
    * codes per query, the q39-class scale-killer. Instead each
    * (q_id, hash-shard-of-neighbor) ranks its own candidates first (a
    * candidate's score is its global score, so every global top-limit
    * row is necessarily in its shard's local top-limit), and the exact
    * rank runs over ≤ RankShards×limit survivors per query. Same
    * pre-prune-then-exact-window shape as `Analytics.topKPerGroup`;
    * bit-identical to the single-window form. */
  private[graft] def keepTopPerQuery(df: DataFrame, limit: Int,
      ord: Seq[Column]): DataFrame =
    graft.plans.TopKPerKey.perKey(df, Seq(col("q_id")), ord, limit)

  /** The pre-operator formulation of [[keepTopPerQuery]] (sharded
    * two-window rank), kept as the parity reference: TrainingDataSpec
    * pins operator ≡ window on the live query shapes. Both require
    * `ord` to be a total order. The window form still shuffles every
    * candidate row once; the operator cuts each query to `limit` rows
    * per input partition before the exchange (see
    * graft.plans.TopKPerKey). */
  private[graft] def keepTopPerQueryWindow(df: DataFrame, limit: Int,
      ord: Seq[Column]): DataFrame = {
    val wShard = Window
      .partitionBy(col("q_id"), pmod(hash(col("neighbor_id")), lit(RankShards)))
      .orderBy(ord: _*)
    val wExact = Window.partitionBy(col("q_id")).orderBy(ord: _*)
    df.withColumn("_rs", row_number().over(wShard))
      .filter(col("_rs") <= limit)
      .withColumn("_rn", row_number().over(wExact))
      .filter(col("_rn") <= limit)
      .drop("_rs", "_rn")
  }

  /** Shared tail of the top-k operators: score each (query, candidate)
    * row with one dot product over precomputed norms (`qv`/`nq`,
    * `v`/`nv` columns), keep k per query by sharded exact rank
    * ([[keepTopPerQuery]]), emit rounded. The cosine is materialized
    * as ONE column shared by ranking and output instead of being
    * re-derived in each expression. */
  private[similarity] def rankTopK(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined
      .withColumn("_cos", dot(col("qv"), col("v")) / (col("nq") * col("nv")))
      .select(col("q_id"), col("neighbor_id"), col("_cos"))
    keepTopPerQuery(scored, k, Seq(col("_cos").desc, col("neighbor_id").asc))
      .select(col("q_id"), col("neighbor_id"), round(col("_cos"), 4).as("cosine"))
      .orderBy("q_id", "neighbor_id")
  }

  /** Embedding-cosine near-duplicate pairs: sign-LSH bucketed self-join
    * (only same-bucket vectors meet), verified at cosine ≥ threshold.
    * The embedding-space analog of graft.dedup.minhashNearDupPairs —
    * single-probe, so recall < 1; lower `bits` or union multiple bucket
    * rotations to raise it. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int, threshold: Double): DataFrame = {
    // Precompute each vector's norm ONCE and materialize eagerly
    // (localCheckpoint, NOT persist: the bucketed projection feeds both
    // sides of the self-join, and checkpoint blocks are auto-dropped by
    // the ContextCleaner once the frame is unreachable — a persist here
    // would outlive the call and accumulate in long-lived sessions).
    // cosine(a,b) = dot(a,b)/(‖a‖·‖b‖) then costs one dot per candidate
    // pair instead of three — the norms are the exact same
    // sqrt(dot(v,v)) values, so results are bit-identical to the
    // inline form.
    val c = corpus.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .localCheckpoint()
    val rawCos = dot(col("a.v"), col("b.v")) / (col("a.nv") * col("b.nv"))
    c.alias("a")
      .join(c.alias("b"),
        col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("_cos", rawCos)
      // threshold the RAW cosine (as an external SQL oracle does), then
      // round only for output
      .filter(col("_cos") >= threshold)
      .select(
        col(s"a.$idCol").as("vec_a"), col(s"b.$idCol").as("vec_b"),
        round(col("_cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  // -------------------------------------------------------------------- IVF

  /** Assign each vector its nearest centroid (squared L2) — centroids
    * ship as a broadcast-sized literal array, so assignment is a pure
    * map over the corpus — via the CODEGEN'D argmin kernel
    * ([[graft.functions.NearestCentroidIndex]]): the former
    * `transform(cents, c -> l2sq) + array_position(array_min)`
    * composition is a higher-order function, which Spark evaluates
    * INTERPRETED per row (CodegenFallback) — at corpus scale the
    * assignment pass is the scan cost of every Lloyd round and of
    * encoding. Same distances (ascending-index exact fold), same
    * first-index tie-break, same null/NaN degradations
    * (NearestCentroidSpec pins equality against the composition). */
  private[similarity] def withCluster(vecs: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    // ONE array literal, not an nlist×d tree of lit() nodes — the
    // expression-tree form re-pays analysis+codegen on every Lloyd
    // round's fresh plan (guide §1.2 per-task work: plan cost counts)
    val centLit = typedLit(centroids.toIndexedSeq.map(_.toIndexedSeq))
    vecs.withColumn("cluster",
      graft.functions.NearestCentroid.nearestIndex(centLit, col("v")))
  }

  /** Public nearest-centroid assignment of `(idCol, vecCol)` rows
    * against trained `centroids`: `(id, v, cluster, dist)` where
    * `dist` is the L2 distance to the assigned centroid. Pure
    * broadcast-literal map — no shuffle; the clustering analogue of
    * [[ivfTopK]]'s corpus side, exposed for curation-style profiling
    * (cluster sizes / purity / spread) where the distance itself is
    * part of the answer. Same codegen'd kernels as [[withCluster]]
    * (one loop each for index and distance), so the tie-break and
    * distance semantics cannot drift between the IVF and curation
    * paths. */
  def assignClusters(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val centLit = typedLit(centroids.toIndexedSeq.map(_.toIndexedSeq))
    corpus.select(col(idCol).cast("long").as("id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("cluster",
        graft.functions.NearestCentroid.nearestIndex(centLit, col("v")))
      .withColumn("dist",
        sqrt(graft.functions.NearestCentroid.nearestDistSq(centLit, col("v"))))
  }

  /** Train an IVF coarse quantizer: deterministic init (the `nlist`
    * lowest-id vectors), then `iters` Lloyd rounds. Each round is one
    * distributed pass: assign (map) → per-(cluster, dim) partial sums
    * (one shuffle of nlist×dim rows) → new means on the driver.
    * Centroids are rounded to 6 decimals so summation order cannot
    * flip assignments between runs. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2): Array[Array[Double]] = {
    val e = corpus.select(col(idCol).cast("long").as("id"),
      toDouble(col(vecCol)).as("v"))
    var centroids: Array[Array[Double]] = e.orderBy("id").limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 0 until iters) {
      val stats = withCluster(e, centroids)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val (cl, pos) = (r.getInt(0), r.getInt(1))
        next(cl)(pos) =
          math.rint(r.getDouble(2) / r.getLong(3) * 1e6) / 1e6
      }
      centroids = next
    }
    centroids
  }

  /** IVF ANN top-k: train the coarse quantizer, assign the corpus to
    * inverted lists, probe each query's `nprobe` nearest lists, exact
    * cosine rank inside the probed lists. At scale the corpus side is
    * written bucketed by `cluster`, so the probe join is co-located and
    * touches ~nprobe/nlist of the data. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int, nprobe: Int,
      iters: Int = 2): DataFrame = {
    val centroids = ivfTrain(corpus, idCol, vecCol, nlist, iters)
    val c = withCluster(
      corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v")),
      centroids)
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val centLit = typedLit(centroids.toIndexedSeq.map(_.toIndexedSeq))
    val q = broadcast(
      queries.select(col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
        .withColumn("_dists", transform(centLit, cc =>
          graft.functions.vector.arrayL2Sq(cc, col("qv"))))
        .withColumn("_ranked", transform(
          array_sort(transform(col("_dists"), (d, i) => struct(d.as("d"), i.as("i")))),
          s => s.getField("i")))
        .withColumn("_probe", explode(slice(col("_ranked"), 1, nprobe)))
        .withColumn("cluster", col("_probe").cast("int"))
        .select(col("q_id"), col("qv"), col("cluster"))
        .withColumn("nq", sqrt(dot(col("qv"), col("qv")))))
    rankTopK(
      q.join(c, Seq("cluster"))
        .filter(col("q_id") =!= col("neighbor_id")), k)
  }

  // --------------------------------------------------------------- PQ

  /** Train product-quantization codebooks [Jégou et al., TPAMI 2011]:
    * the vector space splits into `m` subspaces of d/m dims; each gets
    * its own `ksub`-centroid k-means codebook. A vector then encodes
    * as m small codes (one byte each at ksub ≤ 256) — 64-dim doubles
    * compress 512 B → m B, the difference between an ANN index that
    * fits in executor memory and one that doesn't.
    *
    * Same determinism contract as [[ivfTrain]]: init from the `ksub`
    * lowest-id vectors, fixed Lloyd rounds, centroid means rounded to
    * 6 decimals so float summation order can't flip assignments.
    * Each round is ONE distributed pass over the corpus for ALL
    * subspaces: assign (map) → per-(subspace, code, dim) partial sums
    * — the shuffle carries m×ksub×(d/m) = ksub×d stat rows, never
    * vectors. Returns codebooks(j)(c) = centroid c of subspace j. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2): Array[Array[Array[Double]]] = {
    val e = corpus.select(col(idCol).cast("long").as("id"),
      toDouble(col(vecCol)).as("v"))
    val d = e.select(size(col("v"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val dsub = d / m
    def sub(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)
    var codebooks: Array[Array[Array[Double]]] = {
      val seeds = e.orderBy("id").limit(ksub)
        .collect().map(_.getSeq[Double](1).toArray)
      Array.tabulate(m)(j =>
        seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
    }
    for (_ <- 0 until iters) {
      val assigned = withPqCodes(e, codebooks, dsub)
      val stats = assigned
        .select(explode(array((0 until m).map(j => struct(
          lit(j).as("j"),
          element_at(col("codes"), j + 1).as("code"),
          sub(col("v"), j).as("sv"))): _*)).as("s"))
        .select(col("s.j"), col("s.code"), posexplode(col("s.sv")).as(Seq("pos", "x")))
        .groupBy("j", "code", "pos")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          math.rint(r.getDouble(3) / r.getLong(4) * 1e6) / 1e6
      }
      codebooks = next
    }
    codebooks
  }

  /** Appends `codes` (array<int>, length m): per-subspace nearest
    * codebook entry by squared L2 — the PQ encoding map. Pure narrow
    * projection against broadcast-literal codebooks. */
  private[similarity] def withPqCodes(vecs: DataFrame,
      codebooks: Array[Array[Array[Double]]], dsub: Int): DataFrame = {
    // per-subspace argmin via the codegen'd kernel scanning v's
    // [j·dsub, (j+1)·dsub) window DIRECTLY — the HOF composition it
    // replaces also copied each subspace out with `slice` per row
    // (see withCluster's rationale; NearestCentroidSpec pins equality)
    val coded = codebooks.zipWithIndex.foldLeft(vecs) { case (df, (cb, j)) =>
      val cbLit = typedLit(cb.toIndexedSeq.map(_.toIndexedSeq))
      df.withColumn(s"_c$j", graft.functions.NearestCentroid
        .nearestIndex(cbLit, col("v"), start = j * dsub, len = dsub))
    }
    coded
      .withColumn("codes",
        array((0 until codebooks.length).map(j => col(s"_c$j")): _*))
      .drop((0 until codebooks.length).map(j => s"_c$j"): _*)
  }

  /** PQ ANN top-k with asymmetric distance computation + exact
    * re-rank: the corpus is scanned as m-byte CODES (never raw
    * vectors); each broadcast query carries its m×ksub table of
    * subspace distances, so a candidate's approximate squared L2 is m
    * table lookups (`zip_with` codes×tables) instead of a d-dim dot.
    * The ADC top `rerank` per query then joins back to the raw
    * vectors for an exact cosine top-k — the standard two-stage PQ
    * search. Vectors are L2-NORMALIZED for training/encoding/ADC
    * (squared L2 on the unit sphere is 2−2·cosine, so the ADC order
    * matches the cosine objective the re-rank optimizes — on raw
    * vectors the two orders diverge with norm spread); the re-rank
    * computes exact cosine on the RAW vectors. At 100 TB the codes
    * table is ~d/(8·dsub)× smaller than the corpus; the exact re-rank
    * touches only queries×rerank rows. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int, ksub: Int, iters: Int = 2,
      rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else 4 * k
    def normalized(df: DataFrame, id: String) = df
      .select(col(idCol).cast("long").as(id), toDouble(col(vecCol)).as("v"))
      .withColumn("_n", sqrt(dot(col("v"), col("v"))))
      .withColumn("v", transform(col("v"), x => x / col("_n")))
      .drop("_n")
    val corpusN = normalized(corpus, "id")
    val codebooks = pqTrain(corpusN, "id", "v", m, ksub, iters)
    val d = codebooks.length * codebooks(0)(0).length
    val dsub = d / m
    val codes = withPqCodes(
      normalized(corpus, "neighbor_id"), codebooks, dsub)
      .select(col("neighbor_id"), col("codes"))
    val cbLit = typedLit(codebooks.toIndexedSeq.map(
      _.toIndexedSeq.map(_.toIndexedSeq)))
    val q = broadcast(queries
      .select(col(idCol).cast("long").as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("_qn", transform(col("qv"), x => x / col("nq")))
      .withColumn("_tabs", transform(cbLit, (cb, j) => transform(cb, c =>
        graft.functions.vector.arrayL2Sq(
          c, slice(col("_qn"), j * lit(dsub) + 1, lit(dsub))))))
      .drop("_qn"))
    // ADC top-r via the sharded exact rank: flat PQ scans the whole
    // codes table per query, so a bare per-query window here would be
    // a single-reducer sort of the corpus — see [[keepTopPerQuery]].
    val candidates = keepTopPerQuery(
      q.crossJoin(codes)
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("_adc", aggregate(
          zip_with(col("_tabs"), col("codes"), (t, c) => element_at(t, c + 1)),
          lit(0.0), (acc, x) => acc + x)),
      r, Seq(col("_adc").asc, col("neighbor_id").asc))
      .select(col("q_id"), col("qv"), col("nq"), col("neighbor_id"))
    val vecs = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    rankTopK(candidates.join(vecs, Seq("neighbor_id")), k)
  }

  /** IVF+PQ composite ANN (the FAISS IVFPQ shape): the coarse
    * quantizer routes each vector to an inverted list, and PQ
    * codebooks train on the RESIDUAL (v − centroid) — residuals have
    * far less variance than raw vectors, so the same code budget
    * quantizes finer. Search probes each query's `nprobe` nearest
    * lists, runs ADC with per-(query, probed-list) residual tables,
    * and exact-cosine re-ranks the top `rerank` on raw vectors.
    *
    * Scale shape: the corpus persists as (cluster, m-byte codes) —
    * bucketed by cluster on disk, the probe join is co-located and
    * touches ~nprobe/nlist of the CODES (not vectors); the query side
    * is broadcast with nprobe×m×ksub table entries per query. Same
    * L2-normalization contract as [[pqTopK]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int, nprobe: Int, m: Int, ksub: Int,
      iters: Int = 2, rerank: Int = 0): DataFrame = {
    val r = if (rerank > 0) rerank else 4 * k
    val corpusN = normalizedFrame(corpus, idCol, vecCol)
    val (centroids, codebooks, codes) =
      ivfPqModel(corpusN, nlist, m, ksub, iters)
    val q = ivfPqQuerySide(queries, idCol, vecCol, centroids, codebooks, nprobe)
    val vecs = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    adcRerank(q, codes.withColumnRenamed("id", "neighbor_id"), vecs, r, k)
  }

  /** (id: long, v: unit-norm array<double>) — the training/encoding
    * input shape shared by the PQ family, the persisted indexes, and
    * the generated-oracle builder. */
  def normalizedFrame(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = df
    .select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
    .withColumn("_n", sqrt(dot(col("v"), col("v"))))
    .withColumn("v", transform(col("v"), x => x / col("_n")))
    .drop("_n")

  private[similarity] def residualOf(centroids: Array[Array[Double]])(
      v: Column, cluster: Column): Column = {
    val centLit = typedLit(centroids.toIndexedSeq.map(_.toIndexedSeq))
    zip_with(v, element_at(centLit, cluster + 1), (x, c) => x - c)
  }

  /** Train the IVF+PQ model on a normalized corpus (see
    * [[normalizedFrame]]): coarse centroids, residual PQ codebooks,
    * and the eagerly-materialized codes table (id, cluster, codes) —
    * the standard IVFPQ build (codes are m small ints per vector, 64×
    * smaller than the corpus; checkpoint blocks self-clean). The
    * residual cache used by the Lloyd rounds is dropped before
    * returning, so no cached frame outlives the call. Public: shared
    * by [[ivfPqTopK]], the persisted [[IvfPqIndex]], and the
    * generated-oracle builder (one training path — no model drift). */
  def ivfPqModel(corpusN: DataFrame, nlist: Int,
      m: Int, ksub: Int, iters: Int)
      : (Array[Array[Double]], Array[Array[Array[Double]]], DataFrame) = {
    val centroids = ivfTrain(corpusN, "id", "v", nlist, iters)
    // corpus: assign list, encode the residual. Cached for the PQ
    // training rounds (each Lloyd pass re-reads it) — without it each
    // pass re-runs normalize+assign+residual over the corpus.
    val assigned = withCluster(corpusN, centroids)
      .withColumn("v", residualOf(centroids)(col("v"), col("cluster")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codebooks = pqTrain(assigned, "id", "v", m, ksub, iters)
    val dsub = codebooks(0)(0).length
    val codes = withPqCodes(assigned, codebooks, dsub)
      .select(col("id"), col("cluster"), col("codes"))
      .localCheckpoint()
    assigned.unpersist(blocking = false)
    (centroids, codebooks, codes)
  }

  /** Broadcast IVF+PQ query side: nprobe nearest lists per query and
    * the per-(query, list) residual ADC tables —
    * (q_id, qv, nq, cluster, _tabs). */
  private[similarity] def ivfPqQuerySide(queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], nprobe: Int): DataFrame = {
    val dsub = codebooks(0)(0).length
    val centLit = typedLit(centroids.toIndexedSeq.map(_.toIndexedSeq))
    val cbLit = typedLit(codebooks.toIndexedSeq.map(
      _.toIndexedSeq.map(_.toIndexedSeq)))
    // not broadcast-hinted here: IvfPqIndex.query collects the probed
    // clusters off this frame (the hint would warn on a non-join
    // relation); adcRerank applies the hint at its join
    (queries
      .select(col(idCol).cast("long").as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("_qn", transform(col("qv"), x => x / col("nq")))
      .withColumn("_dists", transform(centLit, c =>
        graft.functions.vector.arrayL2Sq(c, col("_qn"))))
      .withColumn("_ranked", transform(
        array_sort(transform(col("_dists"), (dd, i) => struct(dd.as("d"), i.as("i")))),
        s => s.getField("i")))
      .withColumn("_probe", explode(slice(col("_ranked"), 1, nprobe)))
      .withColumn("cluster", col("_probe").cast("int"))
      .withColumn("_rq", residualOf(centroids)(col("_qn"), col("cluster")))
      .withColumn("_tabs", transform(cbLit, (cb, j) => transform(cb, c =>
        graft.functions.vector.arrayL2Sq(
          c, slice(col("_rq"), j * lit(dsub) + 1, lit(dsub))))))
      .select(col("q_id"), col("qv"), col("nq"), col("cluster"), col("_tabs")))
  }

  /** Shared IVF+PQ search tail: probe join on cluster, sharded ADC
    * top-r (see [[keepTopPerQuery]] — the probed lists are
    * nprobe/nlist of the corpus, still unbounded at scale), exact
    * cosine re-rank of the survivors on raw vectors. */
  private[similarity] def adcRerank(q: DataFrame, codes: DataFrame,
      vecs: DataFrame, r: Int, k: Int): DataFrame = {
    val candidates = keepTopPerQuery(
      broadcast(q).join(codes, Seq("cluster"))
        .filter(col("q_id") =!= col("neighbor_id"))
        .withColumn("_adc", aggregate(
          zip_with(col("_tabs"), col("codes"), (t, c) => element_at(t, c + 1)),
          lit(0.0), (acc, x) => acc + x)),
      r, Seq(col("_adc").asc, col("neighbor_id").asc))
      .select(col("q_id"), col("qv"), col("nq"), col("neighbor_id"))
    rankTopK(candidates.join(vecs, Seq("neighbor_id")), k)
  }

  /** Sign-LSH ANN top-k: queries probe only their own bucket. Returns
    * the same shape as [[bruteForceTopK]]; recall < 1 by construction
    * (single-probe). Multi-probe = union over neighboring buckets. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", signBucket(col("qv"), bits))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv")))))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    rankTopK(
      q.join(c, Seq("bucket"))
        .filter(col("q_id") =!= col("neighbor_id")), k)
  }

  /** Multi-probe sign-LSH ANN top-k: each query probes its own bucket
    * plus every bucket at Hamming distance 1 (one flipped hyperplane —
    * the buckets a borderline vector most likely fell into). Probing
    * (bits+1)/2^bits of the corpus lifts recall toward exact while the
    * join stays a plain bucket equi-join: only the (tiny, broadcast)
    * query side fans out ×(bits+1); the corpus is still touched once
    * per probed bucket. Recall ≥ single-probe by construction. */
  def signLshMultiProbeTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val probes = array((0 until (bits + 1)).map(i =>
      if (i == 0) col("_b0") else
        expr(s"_b0 ^ ${1 << (i - 1)}")): _*)
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("_b0", signBucket(col("qv"), bits))
      .withColumn("bucket", explode(probes))
      .drop("_b0")
      .withColumn("nq", sqrt(dot(col("qv"), col("qv")))))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", signBucket(col("v"), bits))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    rankTopK(
      q.join(c, Seq("bucket"))
        .filter(col("q_id") =!= col("neighbor_id")), k)
  }

  /** SCALAR-QUANTIZATION (SQ8) ANN top-k — the third classic
    * compressed-scan family next to PQ (q57) and IVF (q30): per
    * dimension, learn [min, max] over the corpus (one partial-agg
    * pass collapsing to d rows, over L2-NORMALIZED vectors — like
    * PQ, so the shortlist dot ranks by cosine), quantize every
    * corpus vector to a 256-level integer code
    * `clamp(floor((x−mn)·(255/(mx−mn))), 0, 255)`, scan CODES with
    * an asymmetric weighted dot (full-precision query × integer
    * codes) to shortlist `m` candidates per query, then
    * exact-cosine re-rank the shortlist on raw vectors. At scale
    * the code scan reads 1 byte per dimension instead of 8 (an 8×
    * narrower corpus scan that SIMD-vectorizes as integer MACs),
    * the bounds ship as a broadcast literal like trained
    * centroids, and the re-rank touches only m×|queries| raw
    * vectors.
    *
    * Every arithmetic step is hash-check-deterministic: min/max
    * are order-free exact aggregates, the quantizer is floor over
    * bit-identical doubles (no `round` ties), and the shortlist
    * scores are single-expression doubles identical on both
    * engines. A constant dimension (mx = mn) codes to 0 with
    * weight 0. */
  /** RANDOM-PROJECTION (Johnson–Lindenstrauss) ANN top-k — the third
    * compressed-scan family next to SQ8 (codes) and PQ (codebooks):
    * project L2-normalized vectors through a ±1 matrix (Achlioptas
    * 2003's database-friendly projections) from d to `outDim` dims,
    * shortlist by the projected dot product (JL approximately
    * preserves inner products of unit vectors), exact-cosine re-rank
    * the survivors. The sign matrix is DATA-INDEPENDENT and derived
    * from md5("rp:i_j") parity — the Scala driver and the SQL oracle
    * each compute it from that pure function, so the oracle is fully
    * static (nothing frozen, unlike the trained-model families).
    *
    * Scale: the projection is a narrow per-row expression (d×outDim
    * multiply-adds inside codegen); the proxy scan reads outDim
    * doubles per row instead of d (2× narrower at 64→32; the synthetic
    * corpus's concentrated pairwise distances need the wider budget —
    * real embeddings with actual cluster structure tolerate 4–8×); re-rank
    * touches m×|queries| raw vectors. Determinism: each projected
    * coordinate and proxy score is a fixed left-fold expression tree,
    * bit-identical cross-engine. */
  def rpTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 50, outDim: Int = 32): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .withColumn("vn", transform(col("v"), _ / col("nv")))
      .localCheckpoint() // projection scan + re-rank
    val dim = c.select(size(col("v"))).head().getInt(0)
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(md.substring(0, 8), 16) % 2 == 0) 1.0
      else -1.0
    }
    // HOF over a literal sign MATRIX, not a d×outDim unrolled chain:
    // the unrolled form generates ~2k-node Java that stalls codegen
    // compilation (measured 7.4 s → 1.3 s at sf0.1). Fold values are
    // identical: (0.0 + t₁) + t₂ … ≡ (t₁ + t₂) + … exactly in IEEE.
    val sLit = array((0 until outDim).map(j =>
      array((1 to dim).map(i => lit(sign(i, j))): _*)): _*)
    def project(vn: Column): Column =
      transform(sLit, sj =>
        aggregate(zip_with(vn, sj, (x, s) => x * s),
          lit(0.0), (a, t) => a + t))
    val q = broadcast(queries.select(col(idCol).cast("long").as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("qp", project(transform(col("qv"), _ / col("nq")))))
    val shortlist = keepTopPerQuery(
      q.select(col("q_id"), col("qp"))
        .crossJoin(c.select(col("neighbor_id"),
          project(col("vn")).as("cp")))
        .select(col("q_id"), col("neighbor_id"),
          dot(col("qp"), col("cp")).as("_s")),
      m, Seq(col("_s").desc, col("neighbor_id").asc))
    rankTopK(
      shortlist.select("q_id", "neighbor_id")
        .join(q.select(col("q_id"), col("qv"), col("nq")), Seq("q_id"))
        .join(c.select(col("neighbor_id"), col("v"), col("nv")),
          Seq("neighbor_id")), k)
  }

  def sqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .withColumn("vn", transform(col("v"), _ / col("nv")))
      .localCheckpoint() // bounds pass + code scan + re-rank
    val bounds = c.select(posexplode(col("vn")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    def codes(v: Column): Column = array(bounds.indices.map { j =>
      val (mn, mx) = bounds(j)
      val x = element_at(v, j + 1)
      if (mx == mn) lit(0L)
      else least(greatest(
        floor((x - lit(mn)) * (lit(255.0) / (lit(mx) - lit(mn)))),
        lit(0L)), lit(255L))
    }: _*)
    // asymmetric scoring (the SQ analogue of PQ's ADC): the query stays
    // full precision as per-dim weights w_j = qn_j·(rng_j/255), so
    // dot(w, codes) = dot(qn, decoded(c)) − Σ qn_j·mn_j, a per-query
    // constant away from the decoded cosine — rank-equivalent. A
    // symmetric code×code dot would bake the [min,max] shift into both
    // sides and destroy the ranking.
    def weights(qn: Column): Column = array(bounds.indices.map { j =>
      val (mn, mx) = bounds(j)
      if (mx == mn) lit(0.0)
      else element_at(qn, j + 1) * (lit(mx - mn) / lit(255.0))
    }: _*)
    val q = broadcast(queries.select(col(idCol).cast("long").as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("qw", weights(transform(col("qv"), _ / col("nq")))))
    val shortlist = keepTopPerQuery(
      q.select(col("q_id"), col("qw"))
        .crossJoin(c.select(col("neighbor_id"),
          toDouble(codes(col("vn"))).as("cv")))
        .select(col("q_id"), col("neighbor_id"),
          dot(col("qw"), col("cv")).as("_s")),
      m, Seq(col("_s").desc, col("neighbor_id").asc))
    rankTopK(
      shortlist.select("q_id", "neighbor_id")
        .join(q.select(col("q_id"), col("qv"), col("nq")), Seq("q_id"))
        .join(c.select(col("neighbor_id"), col("v"), col("nv")),
          Seq("neighbor_id")), k)
  }

  /** BINARY-QUANTIZED ANN top-k (1-bit signs + Hamming prefilter +
    * exact re-rank): each vector compresses to its per-dimension SIGN
    * BITS (b_j = 1 iff x_j ≥ 0 — scale-invariant, so normalization
    * does not change the code), the shortlist ranks corpus codes by
    * Hamming SIMILARITY to the query's code (agreement count — an
    * exact integer, so the shortlist order is bit-identical on any
    * engine), and the top-m survivors re-rank by exact cosine. This
    * is the 32×-compression baseline of the quantized-ANN family
    * (vs SQ8's 4× in [[sqTopK]] and PQ's codebooks): binary codes of
    * a d-dim float corpus cost d bits a row, the proxy scan reads
    * ONLY the bits, and at 100 TB the d/32-words-per-row scan with
    * XOR+popcount arithmetic is the cheapest first pass there is —
    * here the agreement sum is a fused zip_with/aggregate inside
    * whole-stage codegen (a packed-word popcount variant changes the
    * constant, not the shape). No training pass at all (even SQ8's
    * min/max scan disappears), so the oracle is fully static SQL.
    * Queries broadcast; the corpus never shuffles. */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .localCheckpoint() // bit scan + re-rank
    def bits(v: Column): Column =
      transform(v, x => when(x >= 0, 1L).otherwise(0L))
    val q = broadcast(queries.select(col(idCol).cast("long").as("q_id"),
        toDouble(col(vecCol)).as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("qb", bits(col("qv"))))
    val shortlist = keepTopPerQuery(
      q.select(col("q_id"), col("qb"))
        .crossJoin(c.select(col("neighbor_id"), bits(col("v")).as("cb")))
        .select(col("q_id"), col("neighbor_id"),
          aggregate(zip_with(col("qb"), col("cb"),
            (a, b) => when(a === b, 1L).otherwise(0L)),
            lit(0L), (acc, t) => acc + t).as("_s")),
      m, Seq(col("_s").desc, col("neighbor_id").asc))
    rankTopK(
      shortlist.select("q_id", "neighbor_id")
        .join(q.select(col("q_id"), col("qv"), col("nq")), Seq("q_id"))
        .join(c.select(col("neighbor_id"), col("v"), col("nv")),
          Seq("neighbor_id")), k)
  }
}
