package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen'd nearest-centroid kernels to the higher-order
  * composition they replaced: same argmin index (first on ties), same
  * winning distance bits, same null degradations — over random data
  * including exact ties, whole-vector and sliced subspace forms. */
class NearestCentroidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(42)

  private def randCents(n: Int, d: Int): Array[Array[Double]] =
    Array.fill(n)(Array.fill(d)(
      math.rint(rnd.nextDouble() * 100) / 100)) // coarse grid: real ties

  test("kernel == transform/array_min/array_position composition " +
    "(whole vector, ties included)") {
    import spark.implicits._
    val d = 8
    val cents = randCents(6, d)
    // vectors drawn from the same coarse grid so exact distance TIES
    // occur (the first-index tie-break is the contract under test) —
    // including vectors EQUAL to a centroid (distance 0 ties)
    val vecs = (Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(d)(math.rint(rnd.nextDouble() * 100) / 100).toSeq)
    } ++ cents.zipWithIndex.map { case (c, i) => (1000L + i, c.toSeq) })
      .toDF("id", "v")
    val centLit = typedLit(cents.toIndexedSeq.map(_.toIndexedSeq))
    // kernel columns side by side with the old composition's
    val composed = vecs
      .withColumn("_d", transform(centLit, c =>
        graft.functions.vector.arrayL2Sq(c, col("v"))))
      .select(col("id"),
        graft.functions.NearestCentroid.nearestIndex(centLit, col("v"))
          .cast("long").as("k_idx"),
        graft.functions.NearestCentroid.nearestDistSq(centLit, col("v"))
          .as("k_d2"),
        (expr("array_position(_d, array_min(_d))") - 1).as("c_idx"),
        expr("array_min(_d)").as("c_d2"))
      .collect()
    assert(composed.nonEmpty)
    composed.foreach { r =>
      assert(r.getLong(1) === r.getLong(3),
        s"argmin mismatch for id ${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"distance bits mismatch for id ${r.getLong(0)}")
    }
  }

  test("sliced subspace form == slice composition") {
    import spark.implicits._
    val d = 12; val dsub = 4
    val cb = randCents(5, dsub)
    val vecs = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(d)(math.rint(rnd.nextDouble() * 10) / 10).toSeq)
    }.toDF("id", "v")
    val cbLit = typedLit(cb.toIndexedSeq.map(_.toIndexedSeq))
    (0 until d / dsub).foreach { j =>
      val rows = vecs
        .withColumn("_d", transform(cbLit, c =>
          graft.functions.vector.arrayL2Sq(
            c, slice(col("v"), j * dsub + 1, dsub))))
        .select(
          graft.functions.NearestCentroid.nearestIndex(
            cbLit, col("v"), start = j * dsub, len = dsub)
            .cast("long").as("k"),
          (expr("array_position(_d, array_min(_d))") - 1).as("c"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"subspace $j argmin mismatch"))
    }
  }

  test("null degradations: null vector, null element, empty centroids") {
    import spark.implicits._
    val cents = randCents(3, 4)
    val centLit = typedLit(cents.toIndexedSeq.map(_.toIndexedSeq))
    val df = Seq(
      (1L, Option(Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0))),
      (2L, None),
      (3L, Option(Seq[java.lang.Double](1.0, null, 3.0, 4.0))))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val out = df.select(col("id"),
      graft.functions.NearestCentroid.nearestIndex(centLit, col("v"))
        .as("k")).collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) === false)
    assert(out(2L) === true, "null vector -> null")
    assert(out(3L) === true, "null element -> null (the fold poisons)")
    val empty = typedLit(Seq.empty[Seq[Double]])
    val e = df.filter(col("id") === 1).select(
      graft.functions.NearestCentroid.nearestIndex(empty, col("v")))
      .collect()(0)
    assert(e.isNullAt(0), "empty centroid list -> null (array_min of [])")
  }
}
