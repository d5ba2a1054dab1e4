package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 analytics operators (queries/Analytics.scala, q46–q53) and
  * the NGramRepetition kernel. */
class AnalyticsSpec extends AnyFunSuite {
  import graft.queries.Analytics
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every analytics oracle has a matching query") {
    val missing = Analytics.oracles.keySet -- Analytics.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // ------------------------------------------------------ NGramRepetition

  private def rep(tokens: Seq[String], n: Int): Option[(Double, Double)] = {
    import spark.implicits._
    val df = Seq(Tuple1(tokens)).toDF("toks")
      .select(graft.functions.NGramRepetition
        .ngramRepetition(col("toks"), n).as("r"))
    val row = df.collect().head
    if (row.isNullAt(0)) None
    else {
      val s = row.getStruct(0)
      Some((s.getDouble(0), s.getDouble(1)))
    }
  }

  test("ngram repetition: hand-computed bigram fractions") {
    // bigrams of [a b a b a]: "a b","b a","a b","b a" -> top 2/4, dup 4/4
    assert(rep(Seq("a", "b", "a", "b", "a"), 2) === Some((0.5, 1.0)))
    // all-unique bigrams: top 1/3, dup 0
    assert(rep(Seq("w", "x", "y", "z"), 2) === Some((1.0 / 3, 0.0)))
    // constant doc: one bigram repeated: top 1.0, dup 1.0
    assert(rep(Seq("a", "a", "a"), 2) === Some((1.0, 1.0)))
  }

  test("ngram repetition: fewer than n tokens yields NULL, not 0/0") {
    assert(rep(Seq("solo"), 2) === None)
    assert(rep(Seq.empty, 1) === None)
    // exactly n tokens: a single n-gram, top=1, dup=0
    assert(rep(Seq("a", "b"), 2) === Some((1.0, 0.0)))
  }

  test("ngram repetition: null tokens count as empty strings") {
    assert(rep(Seq(null, null, null), 2) === Some((1.0, 1.0)))
  }

  test("ngram repetition matches an independent Scala recount on real docs") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val got = Analytics.repetitionStats(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    var checked = 0
    docs.take(50).foreach { r =>
      val toks = r.getString(1).toLowerCase.split(" ", -1)
      if (toks.length >= 2) {
        val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = bigrams.groupBy(identity).map(_._2.size)
        val total = bigrams.size.toDouble
        val expTop = counts.max / total
        val expDup = counts.filter(_ > 1).sum / total
        val (gotTop, gotDup) = got(r.getLong(0))
        assert(gotTop === expTop, s"doc ${r.getLong(0)} top")
        assert(gotDup === expDup, s"doc ${r.getLong(0)} dup")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  // ---------------------------------------------------------- sessionize

  private val eventsSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType)))

  private def ts(min: Long) =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  private def eventsDf(rows: Seq[(Long, Long, String, Long)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (u, e, t, m) => Row(u, e, t, ts(m)) }.asJava,
      eventsSchema)
  }

  test("sessionize: gap >30min splits sessions; counts and bounds exact") {
    val df = eventsDf(Seq(
      (1L, 1L, "view", 0L), (1L, 2L, "click", 10L), // session 1: 2 events
      (1L, 3L, "view", 50L),                        // session 2 (40min gap)
      (2L, 4L, "view", 5L)))                        // other user: own session
    val out = Analytics.sessionizeEvents(df, gapMin = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5))).toSet
    assert(out === Set(
      (1L, 1L, 2L, 10L * 60000000L), // user1 sess1: 2 events, 10min span
      (1L, 2L, 1L, 0L),              // user1 sess2: singleton
      (2L, 1L, 1L, 0L)))
  }

  test("sessionize: boundary gap (exactly 30min) does NOT split") {
    val df = eventsDf(Seq((7L, 1L, "view", 0L), (7L, 2L, "view", 30L)))
    val out = Analytics.sessionizeEvents(df, gapMin = 30).collect()
    assert(out.length === 1 && out.head.getLong(2) === 2L)
  }

  test("sessionize plans ONE shuffle: windows + group-agg share user_id clustering") {
    val plan = Analytics.sessionize(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("q47 sessionize on testdata: events conserved, durations sane") {
    val events = graft.queries.Tables.load(spark, sf, "events")
    val out = Analytics.sessionize(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum === events.count())
    assert(out.forall(_.getLong(5) >= 0L))
  }

  // -------------------------------------------------------------- funnel

  test("funnel: stage ordering enforced on fabricated users") {
    val df = eventsDf(Seq(
      // user 1: full ordered funnel
      (1L, 1L, "signup", 0L), (1L, 2L, "view", 1L),
      (1L, 3L, "click", 2L), (1L, 4L, "purchase", 3L),
      // user 2: view BEFORE signup -> stops at signup stage
      (2L, 5L, "view", 0L), (2L, 6L, "signup", 1L),
      // user 3: never signed up
      (3L, 7L, "view", 0L), (3L, 8L, "click", 1L)))
    val r = Analytics.funnelEvents(df).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (3L, 2L, 1L, 1L, 1L))
  }

  test("funnel: same-timestamp stages count (at-or-after semantics)") {
    val df = eventsDf(Seq(
      (1L, 1L, "signup", 5L), (1L, 2L, "view", 5L),
      (1L, 3L, "click", 5L), (1L, 4L, "purchase", 5L)))
    val r = Analytics.funnelEvents(df).collect().head
    assert(r.getLong(4) === 1L)
  }

  test("q48 funnel on testdata: monotone non-increasing stage counts") {
    val r = Analytics.funnel(spark, sf).collect().head
    val counts = (0 to 4).map(r.getLong)
    assert(counts.head > 0)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel not monotone: $counts")
  }

  // ----------------------------------------------------------------- OLAP

  test("q49 rollup: grouping levels 0/1/3, grand total = table count") {
    val rows = Analytics.rollupKpis(spark, sf).collect()
    val lvls = rows.map(_.getLong(2)).toSet
    assert(lvls === Set(0L, 1L, 3L))
    val total = graft.queries.Tables.load(spark, sf, "lineitem").count()
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length === 1 && grand.head.getLong(3) === total)
    // level-1 subtotals reconstruct from level-0 rows
    val detail = rows.filter(_.getLong(2) == 0L)
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).sum)
    rows.filter(_.getLong(2) == 1L).foreach { r =>
      assert(detail(r.getString(0)) === r.getLong(3))
    }
  }

  test("q64 cube: all four grouping levels, both subtotal axes reconstruct") {
    val rows = Analytics.cubeKpis(spark, sf).collect()
    assert(rows.map(_.getLong(2)).toSet === Set(0L, 1L, 2L, 3L))
    val detail = rows.filter(_.getLong(2) == 0L)
    // status-axis subtotals (lvl=2: flag rolled away)
    val byStatus = detail.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(3)).sum)
    rows.filter(_.getLong(2) == 2L).foreach { r =>
      assert(byStatus(r.getString(1)) === r.getLong(3))
    }
    // flag-axis subtotals (lvl=1: status rolled away)
    val byFlag = detail.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(3)).sum)
    rows.filter(_.getLong(2) == 1L).foreach { r =>
      assert(byFlag(r.getString(0)) === r.getLong(3))
    }
  }

  test("q50 pivot: wide columns reconcile with the long group-agg") {
    val wide = Analytics.pivotDemand(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val long = graft.queries.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity").cast("decimal(18,4)")), 2)
        .cast("double").as("q"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    wide.foreach { case (flag, (f, o)) =>
      assert(long.getOrElse((flag, "F"), 0.0) === f)
      assert(long.getOrElse((flag, "O"), 0.0) === o)
    }
  }

  test("q51 percentiles: within [min,max], monotone across p") {
    val events = graft.queries.Tables.load(spark, sf, "events")
    val bounds = events.agg(min("value"), max("value")).collect().head
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    Analytics.valuePercentiles(spark, sf).collect().foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 >= lo && p99 <= hi)
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("percentile_approx (the documented 100TB swap-in) honors its rank-error bound") {
    val events = graft.queries.Tables.load(spark, sf, "events")
    val acc = 100 // rank error <= n/acc
    val rows = events.groupBy("event_type")
      .agg(
        expr(s"percentile_approx(value, 0.5, $acc)").as("p50_approx"),
        count(lit(1)).as("n"),
        sort_array(collect_list(col("value"))).as("_sorted"))
      .collect()
    rows.foreach { r =>
      val approx = r.getDouble(1)
      val n = r.getLong(2).toInt
      val sorted = r.getSeq[Double](3)
      val rank = sorted.count(_ <= approx)
      val err = math.abs(rank - 0.5 * n)
      assert(err <= n.toDouble / acc + 1,
        s"${r.getString(0)}: approx p50 rank off by $err (n=$n)")
    }
  }

  // ------------------------------------------------------------------ KMV

  test("kmv: sharded pre-prune picks the SAME k-th smallest as a global sort") {
    import spark.implicits._
    val events = graft.queries.Tables.load(spark, sf, "events")
    val k = 8 // sf0.001 has ~15 distinct users/type; k=8 exercises the sketch path
    val est = Analytics.kmvSketch(events, "event_type", "user_id", k, shards = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // independent recount: full sort of distinct hash fractions
    val fracs = events
      .select(col("event_type"),
        (conv(substring(md5(col("user_id").cast("string").cast("binary")),
          1, 13), 16, 10).cast("double") / pow(lit(16.0), lit(13.0)))
          .as("frac"))
      .distinct().as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    fracs.foreach { case (et, sortedFracs) =>
      assert(sortedFracs.length >= k, s"$et has too few distinct values")
      val expected = (k - 1).toDouble / sortedFracs(k - 1)
      assert(est(et) === expected, s"$et: sharded != global k-th")
    }
  }

  test("q52 kmv estimate lands near the exact distinct count") {
    Analytics.kmvDistinct(spark, sf).collect().foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      // KMV std error ~ 1/sqrt(k-2) ≈ 18% at k=32; allow 3 sigma.
      // (At sf0.001 distinct < k, so the small-group path returns the
      // exact count — also inside these bounds.)
      assert(est > exact * 0.4 && est < exact * 2.5,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("kmv small-group path: distinct < k returns the exact count") {
    val events = graft.queries.Tables.load(spark, sf, "events")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 has ~15 distinct users per type << k=1000
    val est = Analytics.kmvSketch(events, "event_type", "user_id",
      k = 1000, shards = 32).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getDouble(1) === exact(r.getString(0)).toDouble)
    }
  }

  // -------------------------------------------------------- heavy hitters

  test("topK per group: sharded pre-prune = direct global rank; exact counts") {
    val events = graft.queries.Tables.load(spark, sf, "events")
    val k = 5
    val got = Analytics.topKPerGroup(events, "event_type", "user_id", k, 32)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // independent recount: full collect + Scala sort
    val all = events.select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong)
    val expected = all.toSeq
      .map { case ((et, uid), n) => (et, uid, n) }
      .groupBy(_._1).toSeq.flatMap { case (et, items) =>
        items.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
          .map { case ((_, uid, n), i) => (et, uid, n, i + 1) }
      }.sortBy(t => (t._1, t._4))
    assert(got.toSeq === expected)
  }

  // ------------------------------------------------------ epoch upsample

  test("upsample: copy counts follow floor(w) + deterministic coin; w=0 drops") {
    import spark.implicits._
    val docs = graft.queries.Tables.load(spark, sf, "documents")
    val weights = Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0)
    val out = Analytics.upsampleByWeight(docs, weights, 1.0)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("copies"),
        max("epoch").as("max_epoch"))
      .as[(Long, String, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, src, copies, maxEpoch) =>
      assert(copies === maxEpoch, "epochs must be 1..n_copies")
      src match {
        case "src0" => assert(copies === 2L || copies === 3L)
        case "src1" => assert(copies === 1L) // 0.4: doc present => exactly 1
        case "src2" => fail("weight-0 source must be dropped")
        case _ => assert(copies === 1L)
      }
    }
    // fractional part actually splits: some src0 docs got 2, some 3
    val src0 = out.filter(_._2 == "src0").map(_._3).toSet
    assert(src0 === Set(2L, 3L))
    // determinism: identical output on re-run
    val again = Analytics.upsampleByWeight(docs, weights, 1.0)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("copies"),
        max("epoch").as("max_epoch"))
      .as[(Long, String, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("upsample is narrow: zero Exchanges in the physical plan") {
    val docs = graft.queries.Tables.load(spark, sf, "documents")
    val plan = Analytics.upsampleByWeight(docs, Map("src0" -> 2.0), 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"upsample must not shuffle:\n$plan")
  }

  // ---------------------------------------------------- cohort retention

  test("q56 retention: week0 row per cohort; active counts never exceed cohort size") {
    val rows = Analytics.retentionCohorts(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "activity cannot precede the cohort week")
    val cohortSize = rows.filter(_._2 == 0).map(t => t._1 -> t._3).toMap
    // every cohort has a week-0 row (the first event itself is week 0)
    assert(rows.map(_._1).toSet === cohortSize.keySet)
    rows.foreach { case (cw, _, n) =>
      assert(n <= cohortSize(cw), s"cohort $cw: retained > cohort size")
    }
    // total cohort sizes = total distinct users
    val users = graft.queries.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(cohortSize.values.sum === users)
  }

  test("sharded top-k / kmv plans: per-group windows only see pre-pruned input") {
    // same scale guard as q39/q40: a window partitioned by the group
    // column ALONE is one reducer per group, so it may only consume
    // another window's capped survivors — never the raw counts frame
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    def assertPrePruned(df: org.apache.spark.sql.DataFrame, group: String): Unit = {
      val lp = df.queryExecution.optimizedPlan
      val windows = lp.collect { case w: LWindow => w }
      var checked = 0
      windows.foreach { w =>
        val parts = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        if (parts == Set(group)) {
          checked += 1
          // bounded input = the TopKPerKey operator's ≤ k survivors
          // per group (current shape) or another window's capped,
          // Filter-ed survivors (pre-operator shape)
          val pruned = w.child.collectFirst {
            case t: graft.plans.TopKPerKeyNode => t: Any
            case f: Filter => f: Any
          }
          assert(pruned.isDefined,
            s"global window runs over unpruned input:\n$lp")
        }
      }
      assert(checked >= 1, s"no per-$group window found:\n$lp")
    }
    val events = graft.queries.Tables.load(spark, sf, "events")
    assertPrePruned(
      Analytics.topKPerGroup(events, "event_type", "user_id", 5, 8),
      "event_type")
    assertPrePruned(
      Analytics.kmvSketch(events, "event_type", "user_id", 8, 8),
      "event_type")
  }

  // ------------------------------------------------------------- q46/q53

  test("q46 json extraction: k parsed for every row, bounds sane") {
    val rows = Analytics.propsJsonAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2), "sum_k null => some props failed to parse")
      assert(r.getLong(3) <= r.getLong(4))
    }
  }

  test("q53 repetition verdict consistent with threshold") {
    val rows = Analytics.repetitionStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getDouble(1) > 0.18))
      assert(r.getDouble(1) > 0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1.0)
    }
  }
}
