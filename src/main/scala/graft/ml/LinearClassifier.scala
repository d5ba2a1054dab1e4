package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RELATIONALLY-TRAINED BINARY CLASSIFIER — full-batch gradient
  * descent unrolled as PLAN CONSTRUCTION (the [[graft.queries]] q151
  * power-iteration technique applied to supervised learning): each
  * round is one broadcast of the (1+k)-weight row onto the feature
  * frame, one forward pass, and one map-side-combined gradient fold —
  * no driver-side vectors, no collect, the corpus streams through map
  * tasks once per round at any scale. This is the fastText/CCNet-style
  * quality-classifier shape a training-data pipeline trains over cheap
  * relational features (stopword ratio, punctuation density, length)
  * to score every document before mixing.
  *
  * The link is the ELLIOTT (fast) sigmoid `σ̃(z) = 0.5 + z/(2(1+|z|))`
  * — the logistic family's rational-arithmetic member. Chosen over
  * `1/(1+e^-z)` deliberately: it involves ONLY +,*,/,abs, so any
  * engine evaluating the same expression tree produces bit-identical
  * IEEE doubles, where `exp` is correctly-rounded in neither engine
  * and an external oracle could flake one ulp per row per round.
  *
  * Float contract (the q151 discipline): every CROSS-ROW sum — each
  * gradient component — is a per-term `round(x·10⁶) → LONG` fold, so
  * aggregation order cannot perturb it, and each next weight derives
  * from those exact integers by one fixed expression tree
  * (`w − g/10⁶/n·lr`). A static SQL oracle therefore replays all
  * rounds as chained CTEs with NOTHING frozen, and the trained weights
  * (and every score) hash bit-identically at any partitioning.
  *
  * Gradient: with squared-loss residual `r = σ̃(z) − y`, the update is
  * the Widrow-Hoff/perceptron-family step `w_j ← w_j − lr·Σ r·x_j/n`
  * (the σ̃′ factor is absorbed into `lr` — the standard "sigmoidal
  * perceptron" simplification, monotone in the true gradient). */
object LinearClassifier {

  private val Scale = 1000000.0

  private def zOf(featureCols: Seq[String]): Column =
    featureCols.zipWithIndex.foldLeft(col("w0")) { case (acc, (f, i)) =>
      acc + col(s"w${i + 1}") * col(f)
    }

  /** σ̃(z): pure-arithmetic sigmoid, bit-identical in any engine. */
  def link(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Train `rounds` full-batch steps at learning rate `lr` from
    * all-zero weights. `labelCol` must be 0.0/1.0 doubles;
    * `featureCols` are double features (keep them deterministic
    * expressions of exact integers for cross-engine hashing). Returns
    * the ONE-ROW weight frame `(w0, w1 … wk)` — `w0` is the bias. */
  def train(feats0: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int, lr: Double): DataFrame =
    trainOn(feats0.localCheckpoint(), featureCols, labelCol, rounds, lr)

  private def trainOn(feats: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int, lr: Double): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val wCols = "w0" +: featureCols.indices.map(i => s"w${i + 1}")
    var w = feats.sparkSession.range(1)
      .select(wCols.map(c => lit(0.0).as(c)): _*)
    var r = 0
    while (r < rounds) {
      r += 1
      val scored = feats.crossJoin(broadcast(w))
        .withColumn("_r", link(zOf(featureCols)) - col(labelCol))
      val aggCols = Seq(
        count(lit(1)).as("n"),
        sum(round(col("_r") * Scale).cast("long")).as("g0")) ++
        featureCols.zipWithIndex.map { case (f, i) =>
          sum(round(col("_r") * col(f) * Scale).cast("long")).as(s"g${i + 1}")
        }
      val g = scored.agg(aggCols.head, aggCols.tail: _*)
      w = g.crossJoin(broadcast(w))
        .select(wCols.zipWithIndex.map { case (wc, i) =>
          (col(wc) - col(s"g$i").cast("double") / lit(Scale) / col("n")
            * lit(lr)).as(wc)
        }: _*)
        .localCheckpoint()
    }
    w
  }

  /** Score `feats` with a trained ONE-ROW weight frame (from
    * [[train]]): adds `score` (σ̃ of the linear form) and `pred`
    * (1 when score > 0.5 ⇔ positive logit, else 0). The weight row
    * broadcasts — one map pass over the scored frame, the held-out /
    * production-inference half of the train/serve split. */
  def score(feats: DataFrame, weights: DataFrame,
      featureCols: Seq[String]): DataFrame =
    feats.crossJoin(broadcast(weights))
      .withColumn("score", link(zOf(featureCols)))
      .withColumn("pred", when(col("score") > 0.5, 1L).otherwise(0L))
      .drop("w0" +: featureCols.indices.map(i => s"w${i + 1}"): _*)

  /** [[train]], then [[score]] every input row with the final
    * weights. */
  def trainAndScore(feats0: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int, lr: Double): DataFrame = {
    val feats = feats0.localCheckpoint()
    val w = trainOn(feats, featureCols, labelCol, rounds, lr)
    score(feats, w, featureCols)
  }
}
