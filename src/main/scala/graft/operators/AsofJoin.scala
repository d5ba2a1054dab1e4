package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the payload of the LATEST right row
  * with the same key and `right.ts <= left.ts` (inclusive). The
  * reference engine family (and DuckDB, which oracles this) expose it
  * natively; Spark lacks it, and the naive formulation —
  * non-equi join + per-left-row max — explodes to O(|L|·|R|) per key.
  *
  * Spark-first implementation (preference (a) of the custom-operator
  * ladder: COMPOSE existing operators): tag both sides, union them,
  * and carry each right payload forward with
  * `last(payload, ignoreNulls) over (partition by key order by ts,
  * side rows unbounded preceding..current)`. Right rows sort before
  * left rows on timestamp ties, which is exactly the `>=` inclusive
  * semantic. ONE shuffle on the key, linear scan per key, no join —
  * the plan shape survives any corpus size (window state is one
  * payload row, not a buffer).
  *
  * Unmatched left rows keep null payloads (left-join semantics).
  */
object AsofJoin {

  /** @param payload right-side columns to carry; each appears in the
    *                output as `<name><suffix>`. Key/ts column names
    *                must match across the two sides. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String],
      suffix: String = "_asof"): DataFrame =
    asofJoinCore(left, right, keyCol, tsCol, payload, suffix,
      backward = true)

  /** FORWARD as-of: for each left row, the payload of the EARLIEST
    * right row with the same key and `right.ts >= left.ts`
    * (inclusive) — lead attribution ("the next view after this
    * click"), the mirror of the backward default. Same single-shuffle
    * carry-forward plan, scanning each key's stream in DESCENDING
    * time order so "last seen right row" is the nearest FUTURE one. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String],
      suffix: String = "_next"): DataFrame =
    asofJoinCore(left, right, keyCol, tsCol, payload, suffix,
      backward = false)

  private def asofJoinCore(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payload: Seq[String],
      suffix: String, backward: Boolean): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.select(
      Seq(col(keyCol), col(tsCol)) ++ payload.map(col): _*)
      .withColumn("_side", lit(0))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows on timestamp ties in BOTH
    // directions, which is exactly the inclusive semantic (<= / >=).
    val tsOrd = if (backward) col(tsCol).asc else col(tsCol).desc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(tsOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the WHOLE right payload as ONE struct: the struct is
    // non-null exactly when a right row exists, so a NULL payload VALUE
    // inside the latest matching row survives — last(payloadCol,
    // ignoreNulls) on the bare column would skip that row and wrongly
    // return an older non-null value (native ASOF and the DuckDB oracle
    // return the NULL). Also one window function instead of |payload|.
    val withPayload = combined.withColumn("_pay",
      last(when(col("_side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    val rightOnly = payload.filterNot(left.columns.contains)
    payload.foldLeft(withPayload) { (df, p) =>
        df.withColumn(s"$p$suffix", col(s"_pay.$p"))
      }
      .filter(col("_side") === 1)
      .drop("_side", "_pay")
      .drop(rightOnly: _*)
  }

  /** Variant carrying the right row's timestamp too (`ts<suffix>`). */
  def asofJoinWithTs(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String],
      suffix: String = "_asof"): DataFrame = {
    val rr = right.withColumn("_rts", col(tsCol))
    asofJoin(left, rr, keyCol, tsCol, payload :+ "_rts", suffix)
      .withColumnRenamed(s"_rts$suffix", s"$tsCol$suffix")
  }

  /** [[asofJoinForward]] carrying the right row's timestamp too. */
  def asofJoinForwardWithTs(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payload: Seq[String],
      suffix: String = "_next"): DataFrame = {
    val rr = right.withColumn("_rts", col(tsCol))
    asofJoinForward(left, rr, keyCol, tsCol, payload :+ "_rts", suffix)
      .withColumnRenamed(s"_rts$suffix", s"$tsCol$suffix")
  }
}
