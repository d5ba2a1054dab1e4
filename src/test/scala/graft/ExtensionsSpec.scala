package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, VectorFoldRewrite}

/** SQL registration of the native expressions and the HOF→native
  * optimizer rewrite. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_* functions are SQL-callable after register()") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
           graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
           graft_l2sq(array(1.0d, 2.0d), array(4.0d, 6.0d)) AS l2,
           graft_sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
           size(graft_hashed_ngrams(array('a', 'b', 'c'), 2)) AS ng,
           size(graft_minhash(array('x', 'y'), 8)) AS mh,
           size(graft_winnow('hello world hello world', 4, 2)) AS wn,
           graft_simhash(CAST(array() AS ARRAY<STRING>), 4, 99) AS sh,
           graft_stopword_hits(array('the', 'fox'), 'the,a,of') AS sw,
           graft_ngram_repetition(array('a', 'b', 'a', 'b', 'a'), 2) AS rep
      """).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 25.0)
    assert(row.getDouble(2) === 0.5)
    assert(row.getInt(3) === 2)
    assert(row.getInt(4) === 8)
    assert(row.getInt(5) >= 1)
    assert(row.getInt(6) === 15) // empty tokens -> all 4 bits set
    assert(row.getInt(7) === 1)
    assert(row.getStruct(8).getDouble(0) === 0.5) // top bigram "a b" 2/4
    assert(row.getStruct(8).getDouble(1) === 1.0) // every bigram repeated
  }

  test("graft_minhash null-skips array elements like the builtin chain") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
           graft_minhash(array('x', NULL, 'y'), 4) AS mixed,
           graft_minhash(array(CAST(NULL AS STRING)), 4) AS allnull,
           graft_minhash(array('x', 'y'), 4) AS clean
      """).head()
    // null elements are skipped: same signature as the null-free array
    assert(row.getSeq[Any](0) === row.getSeq[Any](2))
    // all-null input degenerates like an empty set (all-null signature)
    assert(row.getSeq[Any](1).forall(_ == null))
  }

  test("VectorFoldRewrite turns the HOF fold into the native expression") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VectorFoldRewrite
    try {
      // non-literal source so constant folding can't pre-evaluate
      val df = spark.range(1, 2)
        .select(array(col("id").cast("double"), lit(2.0)).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .select(
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x).as("dot"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, d) => acc + d).as("l2"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"),
        s"dot fold not rewritten:\n$optimized")
      assert(optimized.contains("graft_l2sq"),
        s"l2 fold not rewritten:\n$optimized")
      assert(!optimized.contains("aggregate(zip_with"), optimized)
      val r = df.head()
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 8.0)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite leaves non-matching folds alone (sum of abs diffs)") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ VectorFoldRewrite
    try {
      val df = spark.range(1, 2)
        .select(array(col("id").cast("double"), lit(5.0)).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .select(
          aggregate(zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
            lit(0.0), (acc, d) => acc + d).as("l1"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_"), optimized)
      assert(df.head().getDouble(0) === 3.0)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions class wires into a session via spark.sql.extensions") {
    // separate context would be needed for a truly fresh session; here
    // we assert the class applies cleanly to an extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }
}
