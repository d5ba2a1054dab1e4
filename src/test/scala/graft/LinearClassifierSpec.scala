package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.LinearClassifier

/** Relationally-trained linear classifier: the unrolled-GD plan learns
  * a separable toy set, round arithmetic matches the hand-computed
  * values exactly (the float contract the oracle replays), and the
  * trained weights are bit-identical at any partitioning. */
class LinearClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // separable on f1: positive iff f1 = 1
  private lazy val toy = Seq(
    (1L, 1.0, 1.0), (2L, 1.0, 1.0), (3L, 0.0, 0.0), (4L, 0.0, 0.0))
    .toDF("id", "f1", "y")

  test("round 1 weights match the hand-computed exact values") {
    // all-zero weights => p = 0.5 exactly for every row, so
    // g0 = 2*(+0.5) + 2*(-0.5) = 0 and g1 = 2*(-0.5) = -1.0;
    // w1 = 0 - (-1.0/4)*0.5 = 0.125, w0 stays 0 — all exact doubles
    val w = LinearClassifier.train(toy, Seq("f1"), "y",
      rounds = 1, lr = 0.5).collect().head
    assert(w.getDouble(0) === 0.0)
    assert(w.getDouble(1) === 0.125)
  }

  test("three rounds separate the classes") {
    val scored = LinearClassifier.trainAndScore(toy, Seq("f1"), "y",
      rounds = 3, lr = 0.5)
      .select("id", "score", "pred").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(scored(1L)._2 === 1L)
    assert(scored(2L)._2 === 1L)
    assert(scored(3L)._2 === 0L)
    assert(scored(4L)._2 === 0L)
    assert(scored(1L)._1 > 0.5 && scored(3L)._1 < 0.5)
    // identical feature rows score identically (pure function of x)
    assert(scored(1L)._1 === scored(2L)._1)
  }

  test("score(frame, weights) is the inference half of trainAndScore: " +
    "same weights give bit-identical scores on any frame") {
    val w = LinearClassifier.train(toy, Seq("f1"), "y",
      rounds = 3, lr = 0.5)
    val viaTrain = LinearClassifier.trainAndScore(toy, Seq("f1"), "y",
      rounds = 3, lr = 0.5)
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaScore = LinearClassifier.score(toy, w, Seq("f1"))
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaScore === viaTrain)
    // and a held-out frame the trainer never saw scores through the
    // same fixed expression tree
    import spark.implicits._
    val hold = Seq((9L, 4.0)).toDF("id", "f1")
    val s = LinearClassifier.score(hold, w, Seq("f1")).collect().head
    assert(s.schema.fieldNames.contains("score") &&
      s.schema.fieldNames.contains("pred"))
  }

  test("trained weights are bit-identical at any partitioning") {
    def ws(parts: Int): Seq[Double] = {
      val r = LinearClassifier.train(toy.repartition(parts),
        Seq("f1"), "y", rounds = 3, lr = 0.5).collect().head
      Seq(r.getDouble(0), r.getDouble(1))
    }
    assert(ws(1) === ws(4)) // exact == : the round->LONG fold contract
  }
}
