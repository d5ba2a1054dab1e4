package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.vector._

/** Native vector expressions: equivalence with the HOF fold they
  * replace, null semantics, and whole-stage-codegen participation. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("arrayDot equals the aggregate/zip_with fold bit-for-bit") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(-0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      arrayDot(col("a"), col("b")).as("native"),
      fold(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("arrayDot null semantics: null array, length mismatch, null element") {
    val df = spark.sql(
      """SELECT * FROM VALUES
         (CAST(null AS array<double>), array(1.0d)),
         (array(1.0d, 2.0d), array(1.0d)),
         (array(1.0d, CAST(null AS double)), array(1.0d, 2.0d))
         AS t(a, b)""")
    val out = df.select(arrayDot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
  }

  test("arrayL2Sq computes squared euclidean distance") {
    val d = Seq((Seq(1.0, 2.0), Seq(4.0, 6.0))).toDF("a", "b")
      .select(arrayL2Sq(col("a"), col("b"))).head.getDouble(0)
    assert(d === 25.0)
  }

  test("expressions run inside whole-stage codegen (not CodegenFallback)") {
    // non-literal source so constant folding can't collapse the plan
    val df = spark.range(3)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(col("a"), col("b"), arrayDot(col("a"), col("b")).as("d"))
      .filter(col("d") > 0)
    // `*(n)` is the WholeStageCodegen marker; a CodegenFallback
    // expression would force its operator out of the starred stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") &&
      plan.contains("*(1) Filter (graft_dot"), plan)
    // id=1: [1,2]·[3,1] = 5
    assert(df.collect().map(_.getDouble(2)).contains(5.0))
  }

  test("simhash runs inside whole-stage codegen (not CodegenFallback)") {
    // non-literal source so constant folding can't collapse the plan;
    // value parity with the HOF chain is pinned in TrainingDataSpec —
    // this asserts the fold no longer drags the token chain out of the
    // starred stage (CodegenFallback would interpret the whole subtree)
    val df = spark.range(3)
      .select(split(concat(lit("a b c"), col("id").cast("string")), " ").as("toks"))
      .select(graft.functions.SimHash.simhash(col("toks"), 16, seed = 0).as("s"))
      .filter(col("s") >= 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter (graft_simhash"), plan)
    assert(df.count() === 3)
  }

  test("hashedNGrams equals sorted-distinct xxhash64 of the string shingles") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown",
      "a b", "one", "").toDF("text")
      .withColumn("toks", split(lower(col("text")), " "))
    val rows = df.select(
      graft.functions.HashedNGrams.hashedNGrams(col("toks"), 2).as("native"),
      array_sort(transform(
        graft.dedup.Dedup.wordShingles(col("text"), 2),
        t => xxhash64(t))).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString)
    }
  }

  test("minhashSig equals the builtin md5-hex-slice chain value-for-value") {
    import graft.dedup.Dedup
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs away fast",
      "a b c", "").toDF("text")
      .withColumn("sh", Dedup.wordShingles(col("text"), 3))
    val numHashes = 8
    val builtinCols = (0 until numHashes).map { k =>
      array_min(transform(
        transform(col("sh"), s => md5(concat(lit(s"${k / 4}:"), s))),
        h => Dedup.hexSlice(h, k % 4))).as(s"b_$k")
    }
    val rows = df.select(
      graft.functions.MinHashSignatures.minhashSig(col("sh"), numHashes)
        .as("native") +: builtinCols: _*).collect()
    rows.foreach { r =>
      val native = r.getSeq[Any](0)
      (0 until numHashes).foreach { k =>
        val b = if (r.isNullAt(k + 1)) null else r.getLong(k + 1)
        assert(native(k) === b, s"hash $k mismatch in ${r}")
      }
    }
  }

  test("kernel codegen compiles and matches interpreted eval (no silent fallback)") {
    // WholeStageCodegen silently falls back to interpreted execution
    // when generated Java fails to compile — results stay right, the
    // perf claim quietly dies. Generating a projection directly throws
    // on a compile error, so this pins every UnaryKernelCodegen kernel
    // (and SimHash's bespoke doGenCode) to actually-compiling codegen.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val toks = BoundReference(0, ArrayType(StringType), nullable = true)
    val text = BoundReference(1, StringType, nullable = true)
    val exprs = Seq(
      graft.functions.SimHash(toks, 16, 0),
      graft.functions.SimHash(toks, 56, 0),
      graft.functions.HashedNGrams(toks, 2),
      graft.functions.MinHashSignatures(toks, 8),
      graft.functions.NGramRepetition(toks, 2),
      graft.functions.StopwordHitCount(toks, Seq("the", "a")),
      graft.functions.WinnowingFingerprints(text, 3, 4))
    val proj = GenerateMutableProjection.generate(exprs) // throws on bad codegen
    val arr: ArrayData = new GenericArrayData(Array[Any](
      UTF8String.fromString("the"), UTF8String.fromString("quick"),
      UTF8String.fromString("the"), UTF8String.fromString("fox")))
    val row = InternalRow(arr, UTF8String.fromString("the quick brown fox"))
    val out = proj(row).copy()
    exprs.zipWithIndex.foreach { case (e, i) =>
      assert(out.get(i, e.dataType) === e.eval(row),
        s"codegen/interpreted mismatch for ${e.prettyName}")
    }
    // null input row: null-in-null-out for kernels, 0 for SimHash
    val nullRow = InternalRow(null, null)
    val nullOut = proj(nullRow).copy()
    assert(nullOut.getInt(0) === 0 && nullOut.getLong(1) === 0L)
    (2 until exprs.length).foreach(i => assert(nullOut.isNullAt(i)))
  }

  test("sortedOverlap equals the builtin array_intersect size; codegen'd") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L))
    ).toDF("a", "b")
    val got = df.select(
      graft.functions.SortedLongSetOverlap.sortedOverlap(col("a"), col("b")),
      size(array_intersect(col("a"), col("b")))).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1),
      s"overlap mismatch: $r"))
    // non-literal source so constant folding can't collapse the plan
    val live = spark.range(3)
      .select(array(col("id"), col("id") + 2).as("a"),
        array(col("id") + 1, col("id") + 2).as("b"))
      .select(graft.functions.SortedLongSetOverlap
        .sortedOverlap(col("a"), col("b")).as("o"))
      .filter(col("o") >= 0)
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    assert(live.collect().map(_.getInt(0)).toSeq === Seq(1, 1, 1))
  }

  test("type check rejects non-double arrays") {
    val err = intercept[Exception] {
      Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
        .select(arrayDot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>")
      || err.getMessage.contains("graft_dot"), err.getMessage)
  }
}
