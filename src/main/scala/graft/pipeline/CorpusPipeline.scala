package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** End-to-end training-corpus preparation: the standard LLM data
  * pipeline (language ID → quality/repetition filter → PII redaction →
  * exact dedup → near-dedup → benchmark decontamination → source
  * mixing → train/val/test split) composed from the library's
  * operators over a documents frame (doc_id, text, source, ...).
  *
  * Each stage is independently callable (and independently spec'd via
  * its underlying operator); [[run]] chains them and reports per-stage
  * survivor counts. Scale notes per stage live in SCALE.md; the
  * pipeline adds no operator of its own — it is proof the pieces
  * compose. Shuffle census for the full chain: exact dedup (1, on an
  * 8-byte fingerprint), near-dedup (minhash band join + component
  * rounds over the PAIRS frame, corpus itself shuffles once), and
  * decontamination joins against a BROADCAST benchmark (no corpus
  * shuffle). Everything else — annotation, filtering, redaction,
  * upsampling, splitting — is narrow.
  */
object CorpusPipeline {

  /** Pipeline configuration. Thresholds are deliberately plain doubles
    * over spec'd columns so a recipe is serializable config, not code.
    *
    * @param lang              keep only docs whose predicted language
    *                          matches (None = keep all)
    * @param minQuality        minimum composite quality score [0,1]
    * @param maxTopBigramFrac  Gopher-style repetition ceiling: drop
    *                          docs whose most common bigram exceeds
    *                          this fraction of all bigrams
    * @param redactPii         rewrite text with PII tags (emails, ids,
    *                          ips, phone-like runs)
    * @param nearDupThreshold  minhash-verified Jaccard at/above which
    *                          docs form a duplicate cluster (cluster
    *                          keeps its min doc_id)
    * @param maxSharedNgramFrac opt-in cross-doc BOILERPLATE gate
    *                          (q90's signal, Lee et al. ACL'22): drop
    *                          docs whose fraction of distinct 8-grams
    *                          recurring in other docs exceeds this —
    *                          the template/header duplication exact
    *                          dedup misses and near-dedup underweights
    * @param sourceWeights     fractional epochs per source (see
    *                          [[graft.queries.Analytics.upsampleByWeight]])
    * @param valFrac testFrac  deterministic split fractions
    */
  final case class Recipe(
      lang: Option[String] = Some("en"),
      minQuality: Double = 0.2,
      maxTopBigramFrac: Double = 0.6,
      redactPii: Boolean = true,
      nearDupThreshold: Double = 0.8,
      maxSharedNgramFrac: Option[Double] = None,
      sourceWeights: Map[String, Double] = Map.empty,
      defaultWeight: Double = 1.0,
      valFrac: Double = 0.1,
      testFrac: Double = 0.1) {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac < 1,
      "split fractions must be non-negative and sum below 1")
  }

  final case class StageCount(stage: String, docs: Long)

  /** Adds lang_pred, n_tokens/stop_ratio/punct_ratio/quality_score,
    * and top_bigram_frac in ONE narrow pass that tokenizes each
    * document exactly once: the token array materializes as a real
    * column and every kernel (stopword hit counts ×2, repetition,
    * size) reads it — the composed `withLangPred` + `withQualityColumns`
    * chain would re-run `split` per kernel. Values are identical to
    * the composed form (same expressions over the same tokens; spec'd). */
  def annotate(docs: DataFrame): DataFrame = {
    import graft.functions.{NGramRepetition, StopwordHitCount}
    val t = col("text")
    docs
      .withColumn("_toks", TextAnalysis.tokens(t))
      .withColumn("_en",
        StopwordHitCount.stopwordHits(col("_toks"), TextAnalysis.enStopwords))
      .withColumn("_xx",
        StopwordHitCount.stopwordHits(col("_toks"), TextAnalysis.xxStopwords))
      .withColumn("_ntok", size(col("_toks")))
      .withColumn("_npunct", length(regexp_replace(lower(t), "[a-z0-9 ]", "")))
      .withColumn("_rep", NGramRepetition.ngramRepetition(col("_toks"), 2))
      .withColumn("lang_pred",
        TextAnalysis.langIdFromCounts(col("_en"), col("_xx")))
      .withColumn("n_tokens", col("_ntok"))
      .withColumn("stop_ratio", col("_en") / col("_ntok"))
      .withColumn("punct_ratio", col("_npunct") / length(t))
      .withColumn("quality_score",
        col("stop_ratio") * 0.5 +
          (lit(1.0) - col("punct_ratio")) * 0.3 +
          least(col("_ntok") / lit(100.0), lit(1.0)) * 0.2)
      // <2-token docs have no bigrams: repetition can't condemn them
      .withColumn("top_bigram_frac",
        coalesce(col("_rep.top_frac"), lit(0.0)))
      .drop("_toks", "_en", "_xx", "_ntok", "_npunct", "_rep")
  }

  /** Language + quality + repetition gate over annotated columns. */
  def qualityFilter(annotated: DataFrame, r: Recipe): DataFrame = {
    val langOk =
      r.lang.map(l => col("lang_pred") === l).getOrElse(lit(true))
    annotated.filter(langOk &&
      col("quality_score") >= r.minQuality &&
      col("top_bigram_frac") <= r.maxTopBigramFrac)
  }

  /** Exact dedup on the 60-bit content fingerprint, keeping each
    * cluster's min doc_id. Shuffles 8-byte keys, never text bodies. */
  def dedupExact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("_fp")).orderBy(col("doc_id"))
    docs
      .withColumn("_fp", TextAnalysis.fingerprint64(col("text")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")
  }

  /** Near-dedup: minhash-LSH verified pairs → connected components →
    * keep each cluster's min doc_id (the representative). Docs that
    * never appear in a pair are kept untouched — only the pairs frame
    * (≪ corpus) flows through the component rounds. */
  def dedupNear(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = graft.dedup.Dedup
      .minhashNearDupPairs(docs, "doc_id", "text", threshold = threshold)
    val drops = graft.dedup.Dedup
      .connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("node") =!= col("component")) // non-representatives
      .select(col("node").as("doc_id"))
    docs.join(drops, Seq("doc_id"), "left_anti")
  }

  /** Cross-doc BOILERPLATE gate (q90's repeated-n-gram signal): drops
    * docs whose fraction of distinct n-grams recurring in OTHER docs
    * exceeds `maxFrac`. Docs too short to have an n-gram cannot be
    * condemned (kept). Same shuffle census as q90: distinct
    * (doc, gram) partial-agg + one gram-df aggregate + join back. */
  def boilerplateFilter(docs: DataFrame, maxFrac: Double,
      n: Int = 8): DataFrame = {
    val g = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $n), " +
          s"i -> concat_ws(' ', slice(t, i + 1, $n)))")).as("g"))
      .distinct()
    val dfs = g.groupBy("g").agg(count(lit(1)).as("gdf"))
    val drops = g.join(dfs, "g")
      .groupBy("doc_id")
      .agg((sum(when(col("gdf") >= 2, 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("_sf"))
      .filter(col("_sf") > maxFrac)
      .select("doc_id")
    docs.join(drops, Seq("doc_id"), "left_anti")
  }

  /** Drops corpus docs sharing any whitespace n-gram with the
    * benchmark (eval-suite leakage). Benchmark side is broadcast —
    * the corpus never shuffles for this stage. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $n), " +
          s"i -> concat_ws(' ', slice(t, i + 1, $n)))")).as("g"))
    val contaminated = grams(corpus)
      .join(broadcast(grams(benchmark).select(col("g")).distinct()), "g")
      .select("doc_id").distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Source-weight upsampling + deterministic split: appends `epoch`
    * and `split` columns. Both are pure functions of (source, doc_id)
    * — the final corpus is reproducible from the recipe alone. */
  def mixAndSplit(docs: DataFrame, r: Recipe): DataFrame = {
    val up = graft.queries.Analytics
      .upsampleByWeight(docs, r.sourceWeights, r.defaultWeight)
    val u = (conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0))
    val trainFrac = 1.0 - r.valFrac - r.testFrac
    up.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + r.valFrac, "val")
        .otherwise("test"))
  }

  /** Streaming front end of the pipeline for incremental corpus
    * ingest: annotate → quality/repetition gate → PII redaction →
    * exact-content dedup within the watermark horizon. The annotation
    * and gating stages are the SAME code as the batch path — they are
    * pure narrow expressions, so they run unchanged on a streaming
    * frame; the dedup keys 8-byte content hashes in watermark-bounded
    * state ([[graft.streaming.Streaming.dedupStreamByContent]]).
    *
    * Near-dedup, decontamination, and mixing stay batch jobs over the
    * accumulated corpus — they need corpus-wide joins that streaming
    * state cannot express — so the standard deployment is: stream
    * this into a versioned bronze corpus table, then run [[run]]'s
    * later stages (or the full batch pipeline) over snapshots. */
  def streamingPrep(stream: DataFrame, tsCol: String, r: Recipe,
      watermarkDelay: String): DataFrame = {
    val gated = qualityFilter(annotate(stream), r)
    val redacted =
      if (r.redactPii)
        TextAnalysis.withPiiRedacted(gated, "text")
          .drop("text").withColumnRenamed("text_redacted", "text")
          .drop("n_emails", "n_ids", "n_ips", "n_phones")
      else gated
    graft.streaming.Streaming
      .dedupStreamByContent(redacted, tsCol, "text", watermarkDelay)
  }

  /** Full chain with a per-stage survivor census that is FREE: each
    * stage boundary carries an `observe(count)` node, so the counts
    * ride the caller's first action over the returned frame — the
    * chain (including the expensive near-dedup) executes exactly ONCE,
    * for the action itself. (The previous design ran one count job per
    * stage, and each count recomputed the whole prefix chain — the
    * dominant stage executed 3–4×.)
    *
    * CONTRACT on the first action: it must FULLY CONSUME the plan
    * (write / count / collect). A partial action (limit / show / head)
    * completes the query early, so the observed counts reflect only
    * the rows that flowed before the early stop — silently partial.
    * And if NO action ever runs, there is nothing for the metrics to
    * ride on: the thunk waits up to `censusTimeout` and then fails
    * loudly (rather than blocking forever) with this requirement in
    * the message. With `report = false` the frame carries no observe
    * nodes and the thunk returns empty. */
  def run(docs: DataFrame, benchmark: DataFrame, r: Recipe = Recipe(),
      report: Boolean = true,
      censusTimeout: java.time.Duration = java.time.Duration.ofMinutes(10))
      : (DataFrame, () => Seq[StageCount]) = {
    val obs = Seq.newBuilder[(String, org.apache.spark.sql.Observation)]
    def step(name: String, df: DataFrame): DataFrame =
      if (!report) df
      else {
        val o = org.apache.spark.sql.Observation()
        obs += name -> o
        df.observe(o, count(lit(1)).as("n"))
      }
    val annotated = annotate(docs)
    val filtered = step("quality_filter", qualityFilter(annotated, r))
    val redacted =
      if (r.redactPii)
        TextAnalysis.withPiiRedacted(filtered, "text")
          .drop("text").withColumnRenamed("text_redacted", "text")
          .drop("n_emails", "n_ids", "n_ips", "n_phones")
      else filtered
    val exact = step("dedup_exact", dedupExact(redacted))
    val near = step("dedup_near", dedupNear(exact, r.nearDupThreshold))
    val boiler = r.maxSharedNgramFrac match {
      case Some(m) => step("boilerplate", boilerplateFilter(near, m))
      case None => near
    }
    val clean = step("decontaminate", decontaminate(boiler, benchmark))
    val mixed = step("mix_split", mixAndSplit(clean, r))
    val collected = obs.result()
    (mixed, () => collected.map { case (name, o) =>
      StageCount(name, awaitMetric(o, name, censusTimeout))
    })
  }

  /** Wait for an Observation's metrics with a deadline —
    * `Observation.get` alone blocks forever when the caller never ran
    * an action over the observed frame. */
  private def awaitMetric(o: org.apache.spark.sql.Observation,
      stage: String, timeout: java.time.Duration): Long = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    try Await.result(Future(o.get("n").asInstanceOf[Long]),
      scala.concurrent.duration.Duration.fromNanos(timeout.toNanos))
    catch {
      case _: java.util.concurrent.TimeoutException =>
        throw new IllegalStateException(
          s"census for stage '$stage' not observed within $timeout: run " +
            "a FULLY-CONSUMING action (write/count/collect — not " +
            "limit/show) on the returned frame before calling the census " +
            "thunk")
    }
  }
}
