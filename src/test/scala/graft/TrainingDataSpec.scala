package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the training-data-pipeline operators (dedup, similarity,
  * text analysis) — correctness on the sf0.001 tables plus plan-shape
  * assertions that guard the scale properties (no shuffle in signature
  * stages, broadcast on the query side of KNN). */
class TrainingDataSpec extends AnyFunSuite {
  import graft.queries.{Tables, TrainingData}
  import graft.dedup.Dedup
  import graft.similarity.Similarity

  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every training-data oracle has a registered query") {
    val missing = TrainingData.oracles.keySet -- TrainingData.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    // the only static-map omissions allowed are queries with GENERATED
    // oracles merged by Verify (AnnOracles.dynamic freezes the trained
    // ANN models; DedupOracles.dynamic freezes the winnowing
    // fingerprint sets) — derived from the generators' own declared
    // key sets, so adding a generated oracle can't go stale here
    val dynamicKeys =
      graft.queries.AnnOracles.keys ++ graft.queries.DedupOracles.keys
    assert(TrainingData.queries.keySet -- TrainingData.oracles.keySet
      === dynamicKeys.filter(TrainingData.queries.keySet),
      "every registered query must be hash-checked: static oracle XOR " +
        "a declared dynamic-oracle key")
    // and every generated-oracle key must be a registered query
    val orphans = dynamicKeys -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"dynamic oracles without queries: $orphans")
  }

  test("dynamic oracle generation covers exactly the declared keys") {
    // runs the real generators (tiny models at sf0.001) — pins the
    // declared key sets to what dynamic() actually produces
    val gen = SparkEntry.dynamicOracleSql(spark, sf)
    assert(gen.keySet ===
      graft.queries.AnnOracles.keys ++ graft.queries.DedupOracles.keys)
    assert(gen.values.forall(_.trim.nonEmpty))
  }

  test("mmr diversify: k distinct picks, rank 1 is the relevance top-1") {
    val rows = TrainingData.mmrDiversify(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 3),
        s"query $q must have ranks 1..3")
      assert(rs.map(_.getLong(2)).distinct.length === 3,
        s"query $q picked a duplicate")
    }
    // rank 1 = pure relevance argmax = brute-force cosine top-1
    val brute = TrainingData.knnCosineBrute(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.maxBy(_.getDouble(2)).getLong(1) }
    byQ.foreach { case (q, rs) =>
      val first = rs.find(_.getInt(1) == 1).get.getLong(2)
      assert(first === brute(q), s"query $q rank-1 must be the cosine top-1")
    }
  }

  test("winnowing df-cap is observable (no silent caps)") {
    val obs = new org.apache.spark.sql.Observation("winnow_cap_test")
    val docs = Tables.load(spark, sf, "documents")
    Dedup.winnowingNearDupPairs(docs, "doc_id", "text",
      k = 12, w = 6, threshold = 0.4, maxDf = 20,
      capMetrics = Some(obs)).collect()
    val m = obs.get
    val total = m("total_posting_lists").asInstanceOf[Long]
    val dropped = m("dropped_posting_lists").asInstanceOf[Long]
    assert(total > 0L)
    assert(dropped >= 0L && dropped < total,
      s"cap metrics must be sane: dropped=$dropped total=$total")
  }

  test("winnowing: identical texts score 1.0; finds the fabricated near-dups") {
    val pairs = TrainingData.winnowNearDup(spark, sf).collect()
    assert(pairs.nonEmpty, "no winnowing near-dup pairs found")
    assert(pairs.forall(_.getDouble(2) >= 0.4))
    // the corpus's fabricated near-identical pairs (found by the exact
    // n-gram scan at jaccard >= 0.8) should largely reappear here
    val exact = TrainingData.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnow = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact intersect winnow).size >= exact.size / 2,
      s"winnowing missed most exact near-dups: $exact vs $winnow")
  }

  test("ivf ann: k rows per query max, deterministic, decent recall vs brute") {
    val ivf1 = TrainingData.annIvf(spark, sf).collect()
    val ivf2 = TrainingData.annIvf(spark, sf).collect()
    assert(ivf1.map(_.toString).sorted.toSeq === ivf2.map(_.toString).sorted.toSeq,
      "IVF result not deterministic across runs")
    val perQuery = ivf1.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 3))
    // recall@3 vs the exact answer: with nprobe=3 of nlist=8 expect > 0
    val brute = TrainingData.knnCosineBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = ivf1.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits > 0, s"IVF found none of the true top-3: $brute")
  }

  test("bpe round: greedy leftmost non-overlap, corpus-weighted pick") {
    import spark.implicits._
    // vocabulary {aaaa ×3, aaab ×1}: the dominant pair is (a,a) with
    // weighted count 3·3 + 1·2 = 11; leftmost-non-overlap on "aaaa"
    // must yield [aa, aa] (NOT three merges), on "aaab" [aa, a, b]
    val state = Seq(
      ("aaaa", 3L), ("aaab", 1L)
    ).toDF("word", "freq")
      .select(col("word"), col("freq"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
    val out = TrainingData.bpeRound(state)
      .groupBy("word")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("sym")))),
        _.getField("sym"))).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("aaaa") === "aa aa")
    assert(out("aaab") === "aa a b")
    // second round: pairs now (aa,aa)×3, (aa,a)×1, (a,b)×1 → merge
    // (aa,aa) → "aaaa" collapses to one symbol
    val out2 = TrainingData.bpeRound(TrainingData.bpeRound(state))
      .groupBy("word")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("sym")))),
        _.getField("sym"))).as("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out2("aaaa") === "aaaa")
    assert(out2("aaab") === "aa a b")
  }

  test("bpe round with no adjacent pair anywhere is a no-op") {
    import spark.implicits._
    // regression: an all-single-symbol state has an EMPTY best-pair
    // frame; the merge application must pass every word through
    // unchanged, not annihilate the state (crossJoin with empty)
    val state = Seq(("a", 3L), ("b", 1L), ("c", 2L)).toDF("word", "freq")
      .select(col("word"), col("freq"),
        posexplode(split(col("word"), "")).as(Seq("pos", "sym")))
    val out = TrainingData.bpeRound(state)
      .select("word", "freq", "pos", "sym")
      .collect().map(_.mkString("|")).sorted
    val in = state.select("word", "freq", "pos", "sym")
      .collect().map(_.mkString("|")).sorted
    assert(out === in, "no-candidate round must be identity")
  }

  test("multi-probe lsh: recall dominates single-probe; bounded per query") {
    val brute = TrainingData.knnCosineBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = TrainingData.annLshBucketed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = TrainingData.annLshMultiProbe(spark, sf).collect()
    assert(multi.groupBy(_.getLong(0)).values.forall(_.length <= 3))
    val multiSet = multi.map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing the Hamming-1 neighborhood can only widen each query's
    // candidate set, so recall@3 vs brute force must not decrease
    assert((multiSet intersect brute).size >= (single intersect brute).size,
      s"multi-probe recall below single-probe: $multiSet vs $single")
  }

  test("pq ann: k rows per query max, deterministic, decent recall vs brute") {
    val pq1 = TrainingData.annPq(spark, sf).collect()
    val pq2 = TrainingData.annPq(spark, sf).collect()
    assert(pq1.map(_.toString).sorted.toSeq === pq2.map(_.toString).sorted.toSeq,
      "PQ result not deterministic across runs")
    val perQuery = pq1.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQuery.nonEmpty && perQuery.values.forall(_ <= 3))
    // ADC + exact re-rank recall@3 vs brute force. The synthetic
    // uniform embeddings concentrate pairwise distances (quantization
    // worst case); rerank=120 measured 14/15 — assert a safe floor
    // far above chance (random 120-of-495 candidates ≈ 3.6/15)
    val brute = TrainingData.knnCosineBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq1.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits >= (brute.size * 2) / 3,
      s"PQ recall too low: $hits of ${brute.size}")
  }

  test("ivfpq ann: deterministic, bounded per query, recall floor holds") {
    val a = TrainingData.annIvfPq(spark, sf).collect()
    val b = TrainingData.annIvfPq(spark, sf).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq,
      "IVFPQ result not deterministic across runs")
    val perQuery = a.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQuery.nonEmpty && perQuery.values.forall(_ <= 3))
    // residual ADC over 5-of-8 probed lists: measured 12/15; floor 1/2
    val brute = TrainingData.knnCosineBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = a.map(r => (r.getLong(0), r.getLong(1))).count(brute)
    assert(hits >= brute.size / 2,
      s"IVFPQ recall too low: $hits of ${brute.size}")
  }

  test("tfidf top terms: k per doc, ranks 1..k, matches a Scala recount") {
    val rows = TrainingData.tfidfTopTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length))
      assert(rs.forall(_._3 > 0))
    }
    // independent recount on a handful of docs
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val nDocs = docs.length
    val tfAll = docs.map { r =>
      r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .groupBy(identity).view.mapValues(_.length).toMap
    }.toMap
    val dfT = tfAll.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    docs.take(10).foreach { r =>
      val id = r.getLong(0)
      val tf = tfAll(id)
      val lenD = tf.values.sum.toDouble
      val scored = tf.map { case (t, n) =>
        t -> (n / lenD) * (math.log((nDocs + 1) / (dfT(t) + 1).toDouble) + 1.0)
      }.toSeq.sortBy { case (t, s) => (-s, t) }
      val expected = scored.take(3).map(_._1)
      val got = byDoc(id).sortBy(_._4).map(_._2).toSeq
      assert(got === expected, s"doc $id top terms")
    }
  }

  test("bm25 top terms: k per doc, positive scores, matches a Scala recount") {
    val rows = TrainingData.bm25TopTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length))
      assert(rs.forall(_._3 > 0)) // Lucene-form idf is always positive
    }
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val nDocs = docs.length
    val tfAll = docs.map { r =>
      r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .groupBy(identity).view.mapValues(_.length).toMap
    }.toMap
    val dfT = tfAll.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    val avgLen = tfAll.values.map(_.values.sum).sum.toDouble / nDocs
    val (k1, b) = (1.2, 0.75)
    val byDoc = rows.groupBy(_._1)
    docs.take(10).foreach { r =>
      val id = r.getLong(0)
      val tf = tfAll(id)
      val lenD = tf.values.sum
      val scored = tf.map { case (t, n) =>
        val idf = math.log((nDocs - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1.0)
        val sat = (n * (k1 + 1)) / (n + k1 * (1.0 - b + b * lenD / avgLen))
        t -> idf * sat
      }.toSeq.sortBy { case (t, s) => (-s, t) }
      assert(byDoc(id).sortBy(_._4).map(_._2).toSeq ===
        scored.take(3).map(_._1), s"doc $id top bm25 terms")
    }
  }

  test("pq codes: one code per subspace, all within the codebook range") {
    import graft.similarity.Similarity
    val e = Tables.load(spark, sf, "embeddings")
    val cbs = Similarity.pqTrain(e, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cbs.length === 8 && cbs.forall(_.length === 16))
    assert(cbs.forall(_.forall(_.length === 8))) // 64 dims / 8 subspaces
    // every centroid coordinate is finite (no empty-cluster NaNs)
    assert(cbs.forall(_.forall(_.forall(x => !x.isNaN && !x.isInfinite))))
  }

  test("minhash-lsh pairs are all above threshold and ordered") {
    val rows = TrainingData.minhashLshPairs(spark, sf).collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.8))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("lsh recall: finds every pair the exhaustive quadratic scan finds") {
    val docs = Tables.load(spark, sf, "documents")
    // exhaustive ground truth at >= 0.8 on the same 3-gram shingles
    // (single blocking bucket = compare everything)
    val truth = Dedup.blockedJaccardPairs(docs, "doc_id", "text",
      bucketExpr = lit(0), shingleN = 3, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TrainingData.minhashLshPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(lsh),
      s"LSH missed pairs: ${truth -- lsh}")
    assert(lsh === truth, s"LSH extra pairs: ${lsh -- truth}")
  }

  test("prefix-filtered jaccard join ≡ quadratic blocked scan (no lost pairs)") {
    val docs = Tables.load(spark, sf, "documents")
    val bucket = floor(col("n_chars") / 50)
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val quad = keyset(Dedup.blockedJaccardPairs(docs, "doc_id", "text",
      bucket, shingleN = 2, threshold = 0.6))
    val pref = keyset(Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text",
      bucket, shingleN = 2, threshold = 0.6))
    assert(pref === quad, s"missing=${quad -- pref} extra=${pref -- quad}")
  }

  test("simhash: native expression ≡ HOF reference form, incl. edge cases") {
    // corpus parity: every document's 16-bit signature must agree
    val docs = Tables.load(spark, sf, "documents")
    val both = docs.select(
      Dedup.simhash(col("text"), bits = 16).as("native"),
      Dedup.simhashHof(col("text"), bits = 16).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // edge cases the HOF chain pins: empty string (one empty token),
    // single token, and null text (null in, null out)
    import spark.implicits._
    val edge = Seq(Some(""), Some("x"), Some("a b a"), None).toDF("text")
    val rows = edge.select(
      Dedup.simhash(col("text"), 16).as("native"),
      Dedup.simhashHof(col("text"), 16).as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1), r.toString)
    }
    // null token elements: when/otherwise sends null hashes to -1 on
    // every bit — the native expression must do the same
    val nullTok = Seq(1).toDF("i").select(
      graft.functions.SimHash.simhash(
        array(lit("tok"), lit(null).cast("string")), 16, 99).as("native"),
      { val toks = array(lit("tok"), lit(null).cast("string"))
        (0 until 16).map { j =>
          val bitSum = aggregate(
            transform(toks, t =>
              when(shiftright(Dedup.hash64(t, 99), j) % 2 === 1, 1)
                .otherwise(-1)),
            lit(0), (acc, x) => acc + x)
          when(bitSum >= 0, lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _).as("hof") }).head
    assert(nullTok.getInt(0) === nullTok.getInt(1))
  }

  test("simhash banded pairs ≡ brute-force hamming scan (pigeonhole exactness)") {
    // the 28-bit int-signature default path (the q38 entry itself runs
    // 56-bit long signatures — covered by the spec below)
    val pairs = Dedup.simhashNearDupPairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "fabricated near-dups should pair at hamming <= 3")
    assert(pairs.forall(p => p._3 <= 3 && p._1 < p._2))
    // numBands > maxHamming guarantees EXACT recall: the banded join
    // must produce precisely the pairs a quadratic scan finds (same
    // 28-bit signatures the operator defaults to)
    val sigs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text"), bits = 28).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = Integer.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(pairs.toSet === brute,
      s"missing=${brute -- pairs.toSet} extra=${pairs.toSet -- brute}")
  }

  test("data mixing: per-source cap and token budget are deterministic and exact") {
    val capped = TrainingData.capPerSource(spark, sf, n = 5).collect()
    val bySource = capped.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 5))
    assert(bySource.values.forall(_.map(_.getInt(2)).sorted.toSeq
      == (1 to bySource.values.head.length).take(5)))
    // determinism: the SAME docs survive regardless of input partitioning
    val docs = Tables.load(spark, sf, "documents")
    val recapped = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs.repartition(17)
        .withColumn("rank_in_source", row_number().over(w))
        .filter(col("rank_in_source") <= 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(capped.length <= 5 * bySource.size)
    assert(capped.map(_.getLong(0)).toSet === recapped,
      "cap must be stable under repartitioning")
    // budget: every kept doc's running total within budget, and the
    // NEXT doc in hash order would have crossed it
    val budget = TrainingData.tokenBudgetPerSource(spark, sf, budget = 500)
      .collect()
    assert(budget.nonEmpty)
    assert(budget.forall(_.getLong(3) <= 500))
  }

  test("data mixing plans: no per-source window sorts base data in one task") {
    // the scale guard behind q39/q40: a window partitioned by `source`
    // ALONE concentrates each source on one reducer, so such a window
    // may only ever consume pre-reduced input — another window's capped
    // survivors, or a per-bucket aggregate — never the raw corpus
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    def assertBounded(df: org.apache.spark.sql.DataFrame): Unit = {
      val lp = df.queryExecution.optimizedPlan
      val windows = lp.collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"expected a windowed plan:\n$lp")
      windows.foreach { w =>
        val parts = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        if (parts == Set("source")) {
          // pre-reduced input = the TopKPerKey operator's survivors
          // (current cap shape), another window's survivors, or a
          // per-bucket aggregate (token-budget cumsum shape)
          val bounded = w.child.collectFirst {
            case _: graft.plans.TopKPerKeyNode => ()
            case _: LWindow => (); case _: Aggregate => ()
          }
          assert(bounded.isDefined,
            s"per-source window runs over unreduced input:\n$lp")
        }
      }
    }
    assertBounded(TrainingData.capPerSource(spark, sf, n = 5))
    assertBounded(TrainingData.tokenBudgetPerSource(spark, sf, budget = 500))
    // the distributed cumulative sum must agree with the naive single
    // window on every row, not just on the filtered survivors
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf, "documents")
    val naive = docs.repartition(17)
      .withColumn("n_tokens", size(split(lower(col("text")), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("cum_tokens") <= 500)
      .select("doc_id", "n_tokens", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = TrainingData.tokenBudgetPerSource(spark, sf, budget = 500)
      .select("doc_id", "n_tokens", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist === naive,
      s"missing=${naive -- dist} extra=${dist -- naive}")
  }

  test("mix sample / split / decontaminate: deterministic, sane, broadcast bench") {
    // weighted sampling: deterministic (same docs every run) and
    // actually thinning (weights are 0.2..0.8 of each source)
    val sampled = TrainingData.mixSample(spark, sf).collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(sampled.nonEmpty && sampled.length < total)
    assert(TrainingData.mixSample(spark, sf).collect().map(_.getLong(0)).toSeq
      === sampled.map(_.getLong(0)).toSeq, "sampling must be deterministic")

    // split: every doc in exactly one bucket, fractions near 80/10/10
    val split = TrainingData.datasetSplit(spark, sf).collect()
    assert(split.length === total)
    val frac = split.groupBy(_.getString(2)).view
      .mapValues(_.length.toDouble / total).toMap
    assert(frac.keySet === Set("train", "val", "test"))
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
    assert(frac("val") > 0.03 && frac("val") < 0.2, frac.toString)

    // decontamination: benchmark docs are never flagged, flagged docs
    // exist (the corpus carries fabricated near-dups), and the
    // benchmark side of the join is BROADCAST — the corpus side must
    // never shuffle on the gram at 100 TB
    val dec = TrainingData.decontaminate(spark, sf)
    val flagged = dec.collect().map(_.getLong(0))
    assert(flagged.nonEmpty)
    assert(flagged.forall(_ % 10 != 0))
    val plan = dec.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench side must broadcast:\n$plan")
  }

  test("simhash: verified near-dup pairs have small hamming distance") {
    val sims = TrainingData.simhashDocs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pairs = TrainingData.minhashLshPairs(spark, sf).collect()
    assert(pairs.nonEmpty || sims.nonEmpty)
    pairs.foreach { p =>
      val d = Integer.bitCount(sims(p.getLong(0)) ^ sims(p.getLong(1)))
      assert(d <= 6, s"pair ${p.getLong(0)},${p.getLong(1)} hamming $d")
    }
  }

  test("minhash signature stage is shuffle-free (pure map) on spread input") {
    // pre-spread so the operator's one-time input spreading is a no-op;
    // the signing itself must then plan as a pure map (no Exchange).
    // Clear the cache first: a prior test's persisted signature table
    // has an identical logical plan, and CacheManager would substitute
    // an InMemoryRelation whose cached-plan string carries its own
    // Exchange, tripping the count below.
    spark.catalog.clearCache()
    val docs = Tables.load(spark, sf, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val plan = Dedup.minhashSignatures(docs, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length <= 2,
      s"signature stage adds shuffles beyond the input repartition:\n$plan")
  }

  test("56-bit long simhash: banded pairs ≡ brute force; low bits stable under widening") {
    val docs = Tables.load(spark, sf, "documents")
    // widening never changes the low bits: 16-bit sig == low 16 of 56-bit
    val sigRows = docs.select(
      Dedup.simhash(col("text"), bits = 16).as("s16"),
      Dedup.simhash(col("text"), bits = 56).as("s56")).collect()
    sigRows.foreach { r =>
      assert(r.getInt(0) === (r.getLong(1) & 0xffff).toInt, r.toString)
    }
    // exact recall with 7 bands x 8 bits at hamming <= 3, long keys
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      bits = 56, numBands = 7, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sigs = docs.select(col("doc_id"),
      Dedup.simhash(col("text"), bits = 56).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(pairs.toSet === brute,
      s"missing=${brute -- pairs.toSet} extra=${pairs.toSet -- brute}")
  }

  test("simhash signing stage is shuffle-free and evaluates ONE native expression") {
    spark.catalog.clearCache()
    val docs = Tables.load(spark, sf, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val signed = docs.select(col("doc_id"),
      Dedup.simhash(col("text"), bits = 28).as("sig"))
    val plan = signed.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length <= 2,
      s"signing adds shuffles beyond the input repartition:\n$plan")
    // exactly one graft_simhash eval per row — not 28 HOF passes
    assert(plan.split("graft_simhash").length == 2, s"plan:\n$plan")
  }

  test("knn brute force: k rows per query, cosine in [-1,1], broadcast plan") {
    val df = TrainingData.knnCosineBrute(spark, sf)
    val rows = df.collect()
    val perQuery = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perQuery.forall(_ == 3))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast join:\n$plan")
  }

  test("ann lsh: neighbors share the query's sign bucket; cosine valid") {
    val e = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("bucket", Similarity.signBucket(col("v"), 6))
    val buckets = e.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ann = TrainingData.annLshBucketed(spark, sf).collect()
    ann.foreach { r =>
      assert(buckets(r.getLong(0)) === buckets(r.getLong(1)),
        s"neighbor ${r.getLong(1)} not in query ${r.getLong(0)}'s bucket")
    }
    assert(ann.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("ann results are a subset of the full scored space (never better than brute)") {
    val brute = TrainingData.knnCosineBrute(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    val ann = TrainingData.annLshBucketed(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    ann.foreach { case (q, annBest) =>
      assert(annBest <= brute(q) + 1e-9,
        s"query $q: ann best $annBest beats brute ${brute(q)}")
    }
  }

  test("quality score lies in [0,1]; ratios consistent") {
    val rows = TrainingData.qualityScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(4)
      assert(score >= 0.0 && score <= 1.0, s"score $score out of range")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("language id: prediction matrix covers all docs") {
    val docs = Tables.load(spark, sf, "documents").count()
    val matrix = TrainingData.languageId(spark, sf).collect()
    assert(matrix.map(_.getLong(2)).sum === docs)
  }

  test("fingerprint is injective on distinct texts") {
    val d = Tables.load(spark, sf, "documents")
    val nTexts = d.select(countDistinct(col("text"))).head.getLong(0)
    val nFps = TrainingData.fingerprint(spark, sf)
      .select(countDistinct(col("fp"))).head.getLong(0)
    assert(nFps === nTexts)
  }

  test("exact dedup: fabricated duplicates collapse under the hash") {
    TrainingData.dedupExactDocs(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "unique > total")
    }
  }

  test("token stats: word tokens at least as many as ws tokens on punct-free text") {
    val rows = TrainingData.tokenStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) > 0 && r.getInt(2) > 0))
  }
  test("minhash lsh: shingle-less docs never become band candidates") {
    import spark.implicits._
    // all docs shorter than shingleN=3 tokens -> empty shingle sets;
    // without the band filter every pair would collide on key ""
    val shorts = Seq((1L, "a b"), (2L, "c"), (3L, "d e")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(shorts, "doc_id", "text", 8, shingleN = 3)
    val cand = Dedup.lshCandidates(sigs, "doc_id", 8, 2)
    assert(cand.count() === 0,
      "empty-shingle docs must not band-collide (quadratic at scale)")
    val pairs = Dedup.minhashNearDupPairs(shorts, "doc_id", "text")
    assert(pairs.count() === 0)
  }

  test("connected components: chains, isolated pairs, determinism") {
    import spark.implicits._
    // component 1: a 6-node chain (needs several propagation rounds);
    // component 2: a pair; component 3: a triangle
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(cc(_) === 1L), s"chain: $cc")
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(Seq(20L, 21L, 22L).forall(cc(_) === 20L))
    assert(cc.size === 11)
  }

  test("big-star CC: matches min-label on fixture and seeded random graphs") {
    import spark.implicits._
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixture = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L), (30L, 30L)
    ).toDF("a", "b")
    assert(toMap(Dedup.connectedComponentsBigStar(fixture, "a", "b"))
      === toMap(Dedup.connectedComponents(fixture, "a", "b")))
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }.toDF("a", "b")
    assert(toMap(Dedup.connectedComponentsBigStar(random, "a", "b"))
      === toMap(Dedup.connectedComponents(random, "a", "b", maxIters = 100)))
  }

  test("big-star CC: deep path converges in log rounds where min-label's budget fails") {
    import spark.implicits._
    // diameter 299: min-label needs ~300 rounds (throws at 20);
    // alternating star rounds finish in O(log^2 n)
    val path = (1L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Dedup.connectedComponentsBigStar(path, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 300)
    assert(cc.values.forall(_ == 1L), "every path node joins component 1")
  }

  test("connected components: non-convergence within maxIters fails loudly") {
    import spark.implicits._
    // a 12-node path has diameter 11 — far beyond a 4-round budget;
    // returning the partial labels silently would yield wrong clusters
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "a", "b", maxIters = 4)
    }
    assert(ex.getMessage.contains("no convergence"))
  }

  test("ann top-k plans: no single-reducer per-query window over unreduced candidates") {
    // the scale guard behind q26/q27/q57/q58: a window partitioned by
    // q_id ALONE ranks every candidate of a query in one task — for a
    // flat-PQ ADC scan that is the whole corpus's codes per query.
    // Since the keepTopPerQuery → TopKPerKey swap, the ranking tail
    // plans the custom operator (partial heaps BEFORE the exchange,
    // ≤ k rows per query per partition shuffled) and there must be NO
    // q_id-partitioned Window over unreduced candidates at all.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val e = Tables.load(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 5)
    val queries = e.filter(col("vec_id") < 5)
    def assertHeapRanked(df: org.apache.spark.sql.DataFrame): Unit = {
      val lp = df.queryExecution.optimizedPlan
      val topk = lp.collect { case t: graft.plans.TopKPerKeyNode => t }
      assert(topk.nonEmpty, s"expected the TopKPerKey operator:\n$lp")
      lp.collect { case w: LWindow => w }.foreach { w =>
        val parts = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        assert(parts != Set("q_id"),
          s"per-query window survives the operator swap:\n$lp")
      }
    }
    assertHeapRanked(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3))
    assertHeapRanked(Similarity.signLshTopK(corpus, queries,
      "vec_id", "embedding", k = 3, bits = 6))
    assertHeapRanked(TrainingData.annPq(spark, sf))
    assertHeapRanked(TrainingData.annIvfPq(spark, sf))
    assertHeapRanked(TrainingData.annSq(spark, sf))
  }

  test("semdedup: matches a naive in-memory replay; farthest member always kept") {
    // q93's contract, recomputed the dumb way: collect the assignment
    // (id, cluster, dist, vec) and replay the within-cluster pairwise
    // rule in Scala — the distributed left-semi formulation must
    // produce the identical drop set
    val e = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.ivfTrain(e, "vec_id", "embedding", 8, iters = 2)
    val a = Similarity.assignClusters(e, "vec_id", "embedding", cents)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getInt(2), r.getDouble(3)))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var (dxy, dxx, dyy, i) = (0.0, 0.0, 0.0, 0)
      while (i < x.length) {
        dxy += x(i) * y(i); dxx += x(i) * x(i); dyy += y(i) * y(i); i += 1
      }
      dxy / (math.sqrt(dxx) * math.sqrt(dyy))
    }
    val byCluster = a.groupBy(_._3)
    val expectDropped = (for {
      (_, members) <- byCluster.toSeq
      (xid, xv, _, xd) <- members
      if members.exists { case (yid, yv, _, yd) =>
        (yd > xd || (yd == xd && yid < xid)) && cos(xv, yv) >= 0.4 }
    } yield xid).toSet
    val rows = TrainingData.semDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(rows.length === a.length, "every vector classified exactly once")
    assert(rows.filterNot(_._3).map(_._1).toSet === expectDropped)
    assert(expectDropped.nonEmpty, "tau=0.4 must bite on the synthetic corpus")
    // the farthest-from-centroid member of each cluster can never be
    // dropped — nothing is keep-worthier than it
    val keptSet = rows.filter(_._3).map(_._1).toSet
    byCluster.foreach { case (cl, members) =>
      val champion = members.minBy { case (id, _, _, d) => (-d, id) }._1
      assert(keptSet.contains(champion),
        s"cluster $cl dropped its farthest member $champion")
    }
  }

  test("quality quartile gate: equals the naive ntile window; source windows pre-aggregated") {
    import org.apache.spark.sql.expressions.Window
    val naive = graft.text.TextAnalysis
      .withQualityColumns(Tables.load(spark, sf, "documents"), "text")
      .withColumn("quartile", ntile(4).over(Window.partitionBy("source")
        .orderBy(col("quality_score").desc, col("doc_id").asc)))
      .select("doc_id", "quartile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val df = TrainingData.qualityQuartileGate(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(2), r.getBoolean(3)))
    assert(rows.length === naive.size)
    rows.foreach { case (id, quart, keep) =>
      assert(quart === naive(id), s"doc $id quartile drifted from ntile")
      assert(keep === (quart === 1))
    }
    // scale guard: every per-source-partitioned window must consume an
    // aggregate (the <=64-row bucket rollup), never the raw corpus —
    // the whole point of the two-pass rank
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    df.queryExecution.optimizedPlan.foreach {
      case w: LWindow
          if w.partitionSpec.flatMap(_.references.map(_.name)) == Seq("source") =>
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"per-source window over unaggregated input:\n$w")
      case _ =>
    }
  }

  test("temperature mix: weights normalize and flatten the share distribution") {
    val rows = TrainingData.temperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9, "shares sum to 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9, "weights sum to 1")
    // α = 0.5 flattens: the boost is a strictly DECREASING function of
    // share (low-resource sources get upsampled, high-resource cut)
    val byShare = rows.sortBy(_._2)
    byShare.sliding(2).foreach { case Array((_, s1, _, b1), (_, s2, _, b2)) =>
      if (s1 < s2) assert(b1 > b2, s"boost must fall as share rises")
    }
    // and the weight distribution is strictly between uniform and raw:
    // max weight below max share, min weight above min share
    assert(rows.map(_._3).max <= byShare.last._2 + 1e-12)
    assert(rows.map(_._3).min >= byShare.head._2 - 1e-12)
  }

  test("epoch shuffle: a permutation, epoch-independent, partition-stable") {
    val e0 = TrainingData.epochShuffle(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val n = Tables.load(spark, sf, "documents").count()
    assert(e0.size === n)
    assert(e0.values.toSeq.sorted === (1L to n), "positions are 1..N exactly")
    // a different epoch = an independent permutation (salt changes
    // every hash) — identical orderings would mean the salt is ignored
    val e1 = TrainingData.epochShuffle(spark, sf, epoch = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(e1.values.toSeq.sorted === (1L to n))
    assert(e0.count { case (id, p) => e1(id) == p } < n / 2,
      "epoch 1 must not replay epoch 0's order")
    // stability: the position is a pure function of (epoch, doc_id) —
    // recomputing over a repartitioned input changes nothing
    val again = TrainingData.epochShuffle(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === e0)
  }

  test("length buckets: match a Scala recount of pow-2 bucketing") {
    val rows = TrainingData.lengthBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    def p2ceil(n: Long): Long = {
      var b = 1L; while (b < n) b <<= 1; b
    }
    val expected = Tables.load(spark, sf, "documents")
      .select(size(split(lower(col("text")), " ")).cast("long"))
      .collect().map(_.getLong(0))
      .groupBy(p2ceil)
      .map { case (b, ns) =>
        b -> (ns.length.toLong, ns.sum, b * ns.length - ns.sum) }
    assert(rows.length === expected.size)
    rows.foreach { case (seqLen, nDocs, tok, pad, frac) =>
      assert((seqLen & (seqLen - 1)) === 0L, s"$seqLen not a power of two")
      val (en, etok, epad) = expected(seqLen)
      assert((nDocs, tok, pad) === ((en, etok, epad)))
      assert(frac === pad.toDouble / (seqLen * nDocs))
    }
  }

  test("bpe pairs: top-20 matches a Scala recount of adjacent-pair counts") {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    Tables.load(spark, sf, "documents").select(lower(col("text")))
      .collect().foreach { r =>
        r.getString(0).split(" ").filter(_.length >= 2).foreach { w =>
          (0 until w.length - 1).foreach { i =>
            val p = w.substring(i, i + 2)
            counts(p) = counts.getOrElse(p, 0L) + 1
          }
        }
      }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TrainingData.bpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("cross-source overlap: set algebra consistent, jaccard bounded") {
    val rows = TrainingData.crossSourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, shared, na, nb, j) =>
      assert(a < b, "pairs emitted once, ordered")
      assert(shared >= 1 && shared <= math.min(na, nb))
      assert(j === shared.toDouble / (na + nb - shared))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("dsir weights: target-domain docs score higher on average") {
    val rows = TrainingData.dsirWeights(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, w) =>
      n > 0 && !w.isNaN && !w.isInfinite })
    // the whole point of importance weighting: documents FROM the
    // target domain look more target-like than the rest (per-token
    // normalization so length doesn't confound)
    val (tgt, rest) = rows.partition(_._1 == "src0")
    def meanPerTok(xs: Array[(String, Long, Double)]) =
      xs.map(x => x._3 / x._2).sum / xs.length
    assert(meanPerTok(tgt) > meanPerTok(rest),
      s"src0 mean ${meanPerTok(tgt)} not above rest ${meanPerTok(rest)}")
  }

  test("k-center coreset: matches a Scala replay of greedy max-min") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").cast("long"),
        Similarity.toDouble(col("embedding")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var (s, i) = (0.0, 0)
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var mind = vecs.map { case (id, v) => (id, v, l2sq(vecs.head._2, v)) }
    var expect = List((1, vecs.head._1, 0.0))
    for (r <- 2 to 5) {
      val p = mind.minBy { case (id, _, d) => (-d, id) }
      expect ::= ((r, p._1, math.sqrt(p._3)))
      mind = mind.map { case (id, v, d) => (id, v, math.min(d, l2sq(p._2, v))) }
    }
    val got = TrainingData.kcenterCoreset(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(got === expect.reverse)
    // cover radius shrinks (weakly) as picks accumulate
    val dists = got.drop(1).map(_._3)
    assert(dists === dists.sorted.reverse)
  }

  test("water-fill: budget exhausted, caps respected, capped set is a ratio prefix") {
    val rows = TrainingData.waterFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    val totalCap = rows.map(_._2).sum
    val budget = totalCap * 19 / 20
    assert(math.abs(rows.map(_._4).sum - budget) < 1e-6 * budget,
      s"allocations must exhaust the budget: ${rows.map(_._4).sum} vs $budget")
    rows.foreach { case (s, cap, _, alloc, capped) =>
      assert(alloc <= cap + 1e-9, s"$s allocated beyond its cap")
      if (capped) assert(alloc === cap.toDouble)
    }
    val (capped, uncapped) = rows.partition(_._5)
    assert(capped.nonEmpty && uncapped.nonEmpty,
      "budget chosen so the water level separates the sources")
    // the capped set is exactly a prefix in cap/weight ratio order
    val maxCappedR = capped.map(r => r._2 / r._3).max
    val minUncappedR = uncapped.map(r => r._2 / r._3).min
    assert(maxCappedR <= minUncappedR, "capping must be monotone in r")
    // all uncapped sources share ONE water level λ = alloc/weight
    val lambdas = uncapped.map(r => r._4 / r._3)
    assert(lambdas.max - lambdas.min < 1e-6 * lambdas.max,
      "uncapped allocations must share the water level")
  }

  test("mixture apply: per-source greedy fill is exact and maximal") {
    val alloc = TrainingData.waterFill(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val kept = TrainingData.mixtureApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    kept.groupBy(_._2).foreach { case (s, ds) =>
      val a = alloc(s)
      assert(ds.forall(_._4 <= a), s"$s kept a doc beyond its allocation")
      // cum of the last kept + any one more token run would overflow is
      // implied by the gate; check cums are consistent prefix sums
      val sorted = ds.sortBy(_._4)
      assert(sorted.head._4 === sorted.head._3)
      sorted.sliding(2).foreach {
        case Array((_, _, _, c1), (_, _, n2, c2)) => assert(c2 === c1 + n2)
        case _ =>
      }
    }
    // maximality: the total kept per source + the smallest excluded
    // doc's tokens must exceed the allocation (greedy stops exactly)
    val all = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), " ")).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keptIds = kept.map(_._1).toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    all.groupBy(_._2).foreach { case (s, ds) =>
      val keptTok = kept.filter(_._2 == s).map(_._3).sum
      // greedy semantics: in md5 hash order, the FIRST excluded doc is
      // exactly the one whose tokens would overflow the allocation
      val ordered = ds.sortBy(d => (md5hex(d._1.toString), d._1))
      ordered.find(d => !keptIds.contains(d._1)).foreach { firstExcluded =>
        assert(keptTok + firstExcluded._3 > alloc(s) - 1e-9,
          s"$s stopped early: $keptTok kept of ${alloc(s)}")
        // and everything before it in hash order was kept (prefix)
        assert(ordered.takeWhile(_._1 != firstExcluded._1)
          .forall(d => keptIds.contains(d._1)), s"$s kept a non-prefix")
      }
    }
  }

  test("chunking: full coverage, stride overlap, text reconstructs") {
    val chunks = TrainingData.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
      .groupBy(_._1)
    val texts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(chunks.keySet === texts.keySet)
    chunks.foreach { case (id, cs) =>
      val toks = texts(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices, "chunk_idx dense")
      sorted.foreach { case (_, idx, start, len, txt) =>
        assert(start === idx * 48)
        assert(len === math.min(64, toks.length - start))
        assert(txt === toks.slice(start, start + len).mkString(" "))
      }
      // coverage: last chunk reaches the end; every start < n
      assert(sorted.last._3 + sorted.last._4 === toks.length)
      assert(sorted.forall(_._3 < toks.length))
    }
  }

  test("source divergence: bounded by ln 2, positive, matches a Scala replay on one pair") {
    val rows = TrainingData.sourceDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val nSrc = Tables.load(spark, sf, "documents")
      .select("source").distinct().count().toInt
    assert(rows.length === nSrc * (nSrc - 1) / 2)
    rows.foreach { case (a, b, js) =>
      assert(a < b)
      assert(js > 0.0 && js <= math.log(2) + 1e-12,
        s"JS($a,$b)=$js out of (0, ln 2]")
    }
  }

  test("vocab drift: feed fold equals full recompute of both states") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def counts(p: ((Long, Array[String])) => Boolean) =
      docs.filter(p).flatMap(_._2).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
    val c0 = counts { case (id, _) => id % 5 != 0 }
    val c2 = counts { case (id, _) => id < 100 || id > 199 }
    val expect = (c0.keySet ++ c2.keySet).toSeq
      .map(t => t -> (c2.getOrElse(t, 0L) - c0.getOrElse(t, 0L)))
      .filter(_._2 != 0)
      .sortBy { case (t, d) => (-math.abs(d), t) }
      .take(10)
    val got = TrainingData.vocabDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expect)
  }

  test("minhash index: probe = stateless pairs across the split; append grows hits") {
    val d = Tables.load(spark, sf, "documents")
    val stateless = TrainingData.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def crossSplit(p: (Long, Long)) = {
      val (a, b) = p
      val (qa, qb) = (a % 10 == 1 || a % 10 == 2, b % 10 == 1 || b % 10 == 2)
      if (qa && !qb) Some((a, b)) else if (qb && !qa) Some((b, a)) else None
    }
    // NOTE: q23 applies a >=2 bucket floor the probe join doesn't need;
    // on this corpus every cross-split stateless pair is also a probe
    // hit, and the probe may legitimately find pairs q23's floor
    // dropped — assert superset, then exactness via the oracle
    val expected = stateless.flatMap(crossSplit)
    val got = TrainingData.minhashIndexQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.subsetOf(got),
      s"probe missed stateless pairs: ${expected -- got}")
    // incremental: before the append the %10==0 slice is invisible to
    // the probe; after append its near-dups appear — and the appended
    // index answers exactly like one built whole
    val res = col("doc_id") % 10
    def freshRoot() = java.nio.file.Files
      .createTempDirectory("graft-mhidx-spec").resolve("idx").toString
    val incr = new graft.dedup.MinhashIndex(spark, freshRoot())
    incr.build(d.filter(res =!= 0 && res =!= 1 && res =!= 2),
      "doc_id", "text")
    val before = incr.query(d.filter(res === 1 || res === 2),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    incr.append(d.filter(res === 0), "doc_id", "text")
    val after = incr.query(d.filter(res === 1 || res === 2),
      "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.subsetOf(after), "append must never lose hits")
    assert(after === got, "appended index must answer like a whole build")
    assert((after -- before).forall(_._2 % 10 == 0),
      "new hits must come from the appended slice")
  }

  test("canonical by quality: one canonical per component, argmax by quality") {
    val rows = TrainingData.canonicalByQuality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (c, ms) =>
      assert(ms.length >= 2, s"component $c has a single member")
      assert(ms.count(_._4) === 1, s"component $c canonical count != 1")
      val canon = ms.find(_._4).get
      val best = ms.minBy(m => (-m._3, m._2))
      assert(canon._2 === best._2, s"component $c canonical not the argmax")
    }
    // components agree with a union-find over the stateless pairs
    val pairs = TrainingData.minhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (_, ns) => ns.toSet }.toSet
    val gotComps = rows.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
    assert(gotComps === expect)
  }

  test("lexical diversity: matches a Scala recount incl. char entropy") {
    val rows = TrainingData.lexicalDiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    val texts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === texts.size)
    rows.foreach { case (id, nTok, nTyp, ttr, mwl, ent) =>
      val toks = texts(id).toLowerCase.split(" ", -1)
      assert(nTok === toks.length)
      assert(nTyp === toks.distinct.length)
      assert(ttr === nTyp.toDouble / nTok)
      assert(mwl === toks.map(_.length).sum.toDouble / nTok)
      val lc = texts(id).toLowerCase
      val expected = lc.groupBy(identity).values.map { g =>
        val p = g.length.toDouble / lc.length
        -p * math.log(p)
      }.sum
      assert(math.abs(ent - expected) < 1e-9, s"doc $id entropy drift")
      assert(ent >= 0.0)
    }
  }

  test("contamination rate: per-source flags agree with q45's doc flags") {
    val q45docs = TrainingData.decontaminate(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val srcOf = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = srcOf.toSeq.collect {
      case (id, s) if id % 10 != 0 => (s, q45docs.contains(id))
    }.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.count(_._2).toLong)).toMap
    val got = TrainingData.contaminationBySource(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (s, (n, f, rate)) =>
      assert((n, f) === expect(s), s"source $s counts drifted")
      assert(rate === f.toDouble / n)
    }
  }

  test("embedding qa: per-dim stats match a Scala recount") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(Similarity.toDouble(col("embedding"))).collect()
      .map(_.getSeq[Double](0).toArray)
    val d = vecs.head.length
    val rows = TrainingData.embeddingQa(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length === d)
    rows.foreach { case (dim, n, mean, std, mn, mx) =>
      val xs = vecs.map(_(dim))
      assert(n === xs.length)
      assert(mn === xs.min && mx === xs.max)
      val sx = xs.map(x => math.rint(x * 1e6).toLong).sum
      val sxx = xs.map(x => math.rint(x * x * 1e6).toLong).sum
      val emean = sx.toDouble / 1e6 / n
      assert(mean === emean, s"dim $dim mean drift")
      val estd = math.sqrt(math.max(0.0,
        sxx.toDouble / 1e6 / n - emean * emean))
      assert(math.abs(std - estd) < 1e-12, s"dim $dim std drift")
      assert(std > 0.0, s"dim $dim collapsed")
    }
  }

  test("ann eval: metrics consistent with a Scala recount of gt/system overlap") {
    val gt = TrainingData.knnCosineBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sys = TrainingData.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(x => (-x._3, x._2)).map(_._2).toList).toMap
    val rows = TrainingData.annEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toList
    assert(rows.map(_._1).toSet === gt.keySet)
    rows.foreach { case (q, rec, mrr) =>
      val ranked = sys.getOrElse(q, Nil)
      val hits = ranked.count(gt(q))
      assert(rec === hits / 3.0, s"query $q recall drift")
      val firstHit = ranked.zipWithIndex.find(x => gt(q)(x._1)).map(_._2 + 1)
      assert(mrr === firstHit.map(1.0 / _).getOrElse(0.0),
        s"query $q mrr drift")
      assert(rec >= 0.0 && rec <= 1.0 && mrr >= 0.0 && mrr <= 1.0)
    }
  }

  test("balanced sample: md5-prefix per cluster, cap bites, pre-capped windows") {
    val e = Tables.load(spark, sf, "embeddings")
    val cents = Similarity.ivfTrain(e, "vec_id", "embedding", 8, iters = 2)
    val assigned = Similarity.assignClusters(e, "vec_id", "embedding", cents)
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = assigned.groupBy(_._2).toSeq.flatMap { case (cl, ms) =>
      ms.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(40)
        .zipWithIndex.map { case (id, i) => (id, cl, i + 1) }.toSeq
    }.toSet
    val df = TrainingData.clusterBalancedSample(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === expect)
    assert(assigned.groupBy(_._2).values.exists(_.size > 40),
      "some cluster must exceed the cap for the test to bite")
    // scale guard: the exact per-cluster window only ever consumes the
    // pre-capped shard survivors (q39's plan shape)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    val exact = windows.filter(
      _.partitionSpec.flatMap(_.references.map(_.name)) == Seq("cluster"))
    assert(exact.nonEmpty)
    exact.foreach { w =>
      assert(w.child.collectFirst { case i: LWindow => i }.isDefined,
        "per-cluster window over unreduced input")
    }
  }

  test("curriculum: monotone admission, epoch 4 = full corpus") {
    val rows = TrainingData.curriculumSchedule(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3, 4))
    rows.sliding(2).foreach { case Array((_, d1, t1, s1), (_, d2, t2, s2)) =>
      assert(d2 > d1 && t2 > t1 && s2 > s1, "admission must grow per epoch")
    }
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.last._2 === total, "epoch 4 admits every doc")
    assert(rows.last._4 === 1.0, "epoch 4 token share is exactly 1")
  }

  test("filter cascade: reasons replay from the component signals") {
    val q84 = TrainingData.qualityGate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val ent = TrainingData.lexicalDiversity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(5)))).toMap
    val rows = TrainingData.filterCascade(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.length === q84.size)
    rows.foreach { case (id, reason, keep) =>
      val (lang, qs, tf) = q84(id)
      val (ntok, e) = ent(id)
      val expect =
        if (ntok < 10) "too_short"
        else if (lang != "en") "non_english"
        else if (qs < 0.2) "low_quality"
        else if (tf > 0.6) "repetitive"
        else if (e < 2.7) "low_entropy"
        else "kept"
      assert(reason === expect, s"doc $id reason drift")
      assert(keep === (reason == "kept"))
    }
    // the cascade must actually discriminate on this corpus
    val dist = rows.groupBy(_._2).view.mapValues(_.size)
    assert(dist.contains("kept") && dist.size >= 2,
      s"cascade degenerate: $dist")
  }

  test("repeated spans: maximal, consistent with q90's shared-gram counts") {
    val spans = TrainingData.repeatedSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(spans.nonEmpty)
    // span arithmetic: n_grams = gram positions in the run, end covers
    // the last gram's tail
    spans.foreach { case (_, s, e, ng) =>
      assert(e === s + ng.toInt - 1 + 7, "end = start + n_grams - 1 + (n-1)")
      assert(ng >= 1)
    }
    // maximality: spans of a doc never touch or overlap (a gap of >= 1
    // gram position separates islands)
    spans.groupBy(_._1).foreach { case (id, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, _, ng1), _) if ss.length == 1 => ()
        case Array((_, s1, _, ng1), (_, s2, _, _)) =>
          assert(s2 > s1 + ng1, s"doc $id islands must be separated")
        case _ => ()
      }
    }
    // total shared gram positions = q90's per-doc shared counts...
    // q90 counts DISTINCT shared grams; spans count positions — so
    // compare against a direct Scala recount of shared positions
    val texts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val docGrams = texts.map { case (id, t) =>
      id -> (0 to t.length - 8).map(i => t.slice(i, i + 8).mkString(" "))
    }
    val df = docGrams.flatMap { case (id, gs) => gs.distinct.map((_, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expectShared = docGrams.map { case (id, gs) =>
      id -> gs.zipWithIndex.filter { case (g, _) => df(g) >= 2 }.map(_._2)
    }.filter(_._2.nonEmpty).toMap
    val gotPositions = spans.groupBy(_._1).view.mapValues(
      _.flatMap { case (_, s, _, ng) => s until s + ng.toInt }.sorted.toSeq)
    assert(gotPositions.keySet === expectShared.keySet)
    gotPositions.foreach { case (id, ps) =>
      assert(ps === expectShared(id).sorted.toSeq, s"doc $id positions drift")
    }
  }

  test("span cut: cleaned text = tokens minus covered positions, exactly") {
    val spans = TrainingData.repeatedSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(s => s._2 to s._3).toSeq).toMap
    val texts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val rows = TrainingData.spanCut(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .map(x => x._1 -> x).toMap
    texts.foreach { case (id, toks) =>
      val covered = spans.getOrElse(id, Seq.empty[Range]).flatten.toSet
      val keptToks = toks.indices.filterNot(covered).map(toks)
      if (keptToks.isEmpty)
        assert(!rows.contains(id), s"fully-covered doc $id must drop")
      else {
        val (_, nTok, nKept, clean) = rows(id)
        assert(nTok === toks.length)
        assert(nKept === keptToks.length.toLong)
        assert(clean === keptToks.mkString(" "), s"doc $id text drift")
      }
    }
    // the corpus's fabricated duplicates make both paths non-vacuous
    assert(rows.size < texts.size, "some doc must drop entirely")
    assert(rows.values.exists(r => r._3 < r._2), "some doc must be cut")
    assert(rows.values.exists(r => r._3.toInt == r._2), "some doc passes whole")
  }

  test("length ks drift: matches a Scala ECDF recount, bounded in [0,1)") {
    val lens = Tables.load(spark, sf, "documents")
      .select(col("source"), size(split(lower(col("text")), " ")))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val grid = lens.map(_._2).distinct.sorted
    val nn = lens.length.toDouble
    def ecdf(xs: Seq[Int])(x: Int) = xs.count(_ <= x).toDouble / xs.length
    val all = lens.map(_._2).toSeq
    val expect = lens.groupBy(_._1).map { case (s, ls) =>
      val xs = ls.map(_._2).toSeq
      s -> grid.map(x => math.abs(ecdf(xs)(x) - ecdf(all)(x))).max
    }
    val got = TrainingData.lengthKsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (s, d) =>
      assert(math.abs(d - expect(s)) < 1e-12, s"source $s KS drift")
      assert(d > 0.0 && d < 1.0)
    }
  }

  test("similarity/tf-idf queries leave no cached frames behind") {
    // the library contract: intermediates are materialized via
    // self-cleaning localCheckpoint blocks, never a persist that
    // outlives the call (a long-lived session would accumulate them)
    spark.catalog.clearCache()
    TrainingData.embedNearDup(spark, sf).collect()
    TrainingData.annIvfPq(spark, sf).collect()
    TrainingData.tfidfTopTerms(spark, sf).collect()
    TrainingData.bm25TopTerms(spark, sf).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a query left a cached frame behind")
  }

  test("seq packing: contiguous chop per stream, stable under repartitioning") {
    val rows = TrainingData.seqPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.length === total, "every doc packs exactly once")
    rows.foreach { case (_, _, n, seqIdx, off) =>
      assert(seqIdx >= 0 && off >= 0 && off < 512, s"bad chop: $seqIdx/$off")
      assert(n > 0)
    }
    // per stream: starts are the exact cumsum (contiguous, no gaps)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val starts = rs.map { case (_, _, n, si, off) => (si * 512 + off, n) }
        .sortBy(_._1)
      starts.zip(starts.drop(1)).foreach { case ((s0, n0), (s1, _)) =>
        assert(s1 === s0 + n0, "packing must be gapless within a stream")
      }
      assert(starts.head._1 === 0L, "each stream starts at token 0")
    }
    // distributed two-pass cumsum == naive single window per stream
    import org.apache.spark.sql.expressions.Window
    val naive = Tables.load(spark, sf, "documents").repartition(17)
      .withColumn("n_tokens", size(split(lower(col("text")), " ")).cast("long"))
      .withColumn("__ord", md5(concat(lit("pack:"), col("doc_id").cast("string"))))
      .withColumn("stream", conv(substring(col("__ord"), 1, 2), 16, 10).cast("int"))
      .withColumn("__start", sum(col("n_tokens")).over(
        Window.partitionBy("stream").orderBy(col("__ord"), col("doc_id")))
        - col("n_tokens"))
      .select(col("doc_id"), expr("__start div 512").as("si"),
        (col("__start") % 512).as("so"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (id, _, _, si, so) =>
      assert(naive(id) === (si, so), s"doc $id diverges from single-window")
    }
    // scale guard (q40's): any per-stream-only window must consume a
    // pre-reduced child (the per-shard aggregate), never the raw corpus
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = TrainingData.seqPack(spark, sf).queryExecution.optimizedPlan
    lp.collect { case w: LWindow => w }.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      if (parts == Set("stream")) {
        assert(w.child.collectFirst {
          case _: Aggregate => (); case _: LWindow => ()
        }.isDefined, s"per-stream window over unreduced input:\n$lp")
      }
    }
  }

  test("unigram oov: vocab coverage consistent with a Scala recount") {
    val rows = TrainingData.unigramOov(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, oov, frac) =>
      assert(oov >= 0 && oov <= n)
      assert(math.abs(frac - oov.toDouble / n) < 1e-12)
    }
    // recount: top-256 corpus terms, then per-doc OOV over 10 docs
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1))
    val freq = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(256).map(_._1).toSet
    val byId = rows.map(r => r._1 -> r).toMap
    docs.take(10).foreach { case (id, toks) =>
      val oov = toks.count(!vocab(_))
      assert(byId(id)._2 === toks.length && byId(id)._3 === oov,
        s"doc $id: expected ${toks.length}/$oov got ${byId(id)}")
    }
    // the V-row vocab must join back as a BROADCAST (the token stream
    // never shuffles on the term for scoring)
    val plan = TrainingData.unigramOov(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab side must broadcast:\n$plan")
  }

  test("multi-probe lsh: recall >= single-probe, never beats brute force") {
    val e = Tables.load(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 5)
    val queries = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3))
    val single = pairs(Similarity.signLshTopK(corpus, queries,
      "vec_id", "embedding", k = 3, bits = 6))
    val multi = pairs(Similarity.signLshMultiProbeTopK(corpus, queries,
      "vec_id", "embedding", k = 3, bits = 6))
    def recall(ann: Set[(Long, Long)]) =
      (ann intersect brute).size.toDouble / brute.size
    assert(recall(multi) >= recall(single),
      s"multi-probe recall ${recall(multi)} < single ${recall(single)}")
    // multi-probe still returns <= k per query
    val perQuery = Similarity.signLshMultiProbeTopK(corpus, queries,
      "vec_id", "embedding", k = 3, bits = 6)
      .collect().groupBy(_.getLong(0)).values.map(_.length)
    assert(perQuery.forall(_ <= 3))
  }

  test("rp ann: JL projection keeps decent recall; bounded per query") {
    val e = Tables.load(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 5)
    val queries = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3))
    val rp = Similarity.rpTopK(corpus, queries, "vec_id", "embedding", k = 3)
    val recall = (pairs(rp) intersect brute).size.toDouble / brute.size
    // 64→16 dims keeps ~1/4 of the JL distortion budget; with the
    // exact re-rank over the top-10 shortlist recall stays well above
    // chance (random 10-of-495 ≈ 0.02)
    assert(recall >= 0.4, s"RP recall $recall < 0.4")
    val perQuery = rp.collect().groupBy(_.getLong(0)).values.map(_.length)
    assert(perQuery.forall(_ <= 3))
  }

  test("sq8 ann: high recall vs brute force; codes stay in [0, 255]") {
    val e = Tables.load(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") >= 5)
    val queries = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3))
    val sq = Similarity.sqTopK(corpus, queries,
      "vec_id", "embedding", k = 3)
    val recall = (pairs(sq) intersect brute).size.toDouble / brute.size
    // 8-bit quantization at dim 64 barely perturbs the ranking, and the
    // exact re-rank fixes shortlist order — recall should be near-exact
    assert(recall >= 0.8, s"SQ8 recall $recall < 0.8")
    val perQuery = sq.collect().groupBy(_.getLong(0)).values.map(_.length)
    assert(perQuery.forall(_ <= 3))
  }

}
