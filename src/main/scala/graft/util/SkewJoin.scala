package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash-partitioned join sends every row of a hot key to ONE reducer;
  * at 100 TB a single pathological key (null ids, "unknown" zones,
  * default timestamps) turns a 1000-executor join into a one-task
  * straggler. AQE's skew-join handling (on by default in
  * graft.core.SparkSessionFactory sessions) splits oversized SORT-MERGE
  * partitions at runtime and is the first line of defense; explicit
  * salting remains the portable fix when AQE cannot apply — e.g. the
  * skew only materializes after upstream operators, or the join is not
  * sort-merge.
  *
  * Mechanics: the large side gets a uniform salt in [0, salts); the
  * small side is replicated once per salt value; the join key becomes
  * (keys…, salt), spreading each hot key over `salts` reducers. Every
  * matched pair still meets exactly once, so inner and left joins are
  * result-identical to the unsalted join. Right/full-outer are
  * rejected: an unmatched small-side row would surface once per
  * replica.
  */
object SkewJoin {

  private val SaltCol = "_graft_salt"

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(jt),
      s"saltedJoin supports inner/left joins only, got $joinType " +
        "(an unmatched small-side row would appear once per salt replica)")
    // Salt assignment only needs to be uniform — every salt value joins
    // against a full copy of the small side, so WHICH salt a row draws
    // cannot change the result. rand(seed) is cheap and uniform.
    val saltedLarge = large.withColumn(SaltCol,
      (rand(42) * salts).cast("int"))
    val replicatedSmall = small.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge
      .join(replicatedSmall, keys :+ SaltCol, joinType)
      .drop(SaltCol)
  }
}
