package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for ADDITIVE grouped aggregates
  * (count / sum — and anything derivable from them, e.g. avg) over a
  * versioned table's change feed.
  *
  * `updated = prior ⊕ delta(changes)`: the changes frame (insert /
  * delete tagged, as produced by `VersionedTable.changes`) folds to a
  * per-group delta — inserts count +1 / +x, deletes −1 / −x — which
  * full-outer-merges with the prior aggregate. Groups whose row count
  * reaches zero are dropped (a group only ever reaches exactly zero:
  * the feed is a faithful row multiset diff).
  *
  * The 100 TB rationale: a day of appends touches one day of files
  * (the change feed's file-level fast path), so maintaining the
  * aggregate costs O(changed rows) + a join against the AGGREGATE —
  * never a rescan of the base table. Deletion-vector commits flow
  * through the feed's row-level diff and decrement exactly.
  *
  * Additive-only is the classic IVM boundary: min/max are not
  * decrementable (deleting the current min needs the group's other
  * rows). For those, recompute the affected groups from the snapshot
  * — [[affectedGroups]] gives the key set to scope that rescan.
  *
  * Sums should run in DECIMAL: decimal addition is exact, so the
  * incrementally-maintained sum is bit-identical to a full recompute
  * regardless of the order deltas arrived in (double sums are not). */
object IncrementalAgg {

  /** Column names the maintained aggregate uses: `n_rows` plus one
    * `sum_<col>` per summed column. */
  def sumCol(c: String): String = s"sum_$c"
  val CountCol = "n_rows"

  /** Full (re)computation of the maintained shape — the initializer,
    * and the oracle any incremental chain must equal. */
  def compute(base: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame =
    base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as(CountCol),
      sums.map(c => sum(col(c)).as(sumCol(c))): _*)

  /** One maintenance step: fold `changes` (a `_change_type`-tagged
    * insert/delete frame) into `prior`. The only shuffles are the
    * per-group delta aggregation (O(changed rows)) and the merge join
    * (O(groups)); the base table is never read.
    *
    * The merge is NULL-SAFE on the group keys: `groupBy` treats NULL
    * as a real group, so the join must too (`<=>`), else a null-keyed
    * group splits into a prior-only and a delta-only row and both
    * survive with wrong counts. Key columns in the output coalesce
    * across the two sides, which is exact even for NULL keys because
    * a null-safe match guarantees both sides hold the same value. */
  def update(prior: DataFrame, changes: DataFrame, keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    // Same tag-domain contract as IncrementalJoin.signOf: the full
    // CDF set folds naturally — update_preimage is a signed delete,
    // update_postimage a signed insert — and an unrecognized tag
    // raises rather than silently zeroing the row.
    val sign =
      when(col("_change_type").isin("insert", "update_postimage"), lit(1))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1))
      .otherwise(raise_error(concat(
        lit("IncrementalAgg: unsupported _change_type '"),
        col("_change_type"), lit("'"))))
    val dn = "_delta_n"
    def dsum(c: String) = s"_delta_$c"
    def dkey(k: String) = s"_delta_key_$k"
    val delta = changes.groupBy(keys.map(col): _*).agg(
        sum(sign).as(dn),
        sums.map(c => sum(col(c) * sign).as(dsum(c))): _*)
      .select(keys.map(k => col(k).as(dkey(k))) ++
        Seq(col(dn)) ++ sums.map(c => col(dsum(c))): _*)
    val cond = keys.map(k => prior(k) <=> col(dkey(k))).reduce(_ && _)
    val merged = prior.join(delta, cond, "full_outer")
    val newN = coalesce(col(CountCol), lit(0L)) + coalesce(col(dn), lit(0L))
    merged.select(
      keys.map(k => coalesce(prior(k), col(dkey(k))).as(k)) ++
        Seq(newN.as(CountCol)) ++
        sums.map { c =>
          val zero = lit(0).cast(prior.schema(sumCol(c)).dataType)
          (coalesce(col(sumCol(c)), zero) + coalesce(col(dsum(c)), zero))
            .as(sumCol(c))
        }: _*)
      .filter(col(CountCol) > 0)
  }

  /** Distinct group keys the changes touch — the rescan scope for
    * non-additive aggregates (min/max/distinct-count): recompute ONLY
    * these groups from the snapshot and splice them over the prior. */
  def affectedGroups(changes: DataFrame, keys: Seq[String]): DataFrame =
    changes.select(keys.map(col): _*).distinct()

  /** Maintain non-additive aggregates by scoped recompute: groups the
    * changes touch are re-aggregated from the current snapshot (a
    * semi-join-pruned scan), all other groups pass through from
    * `prior` untouched. `recompute` receives the pruned base rows and
    * must return the same schema as `prior`. */
  def updateByRecompute(prior: DataFrame, base: DataFrame,
      changes: DataFrame, keys: Seq[String],
      recompute: DataFrame => DataFrame): DataFrame = {
    // Null-safe (<=>) semi/anti conditions for the same reason update()
    // uses them: NULL is a real group key to groupBy.
    val touched = affectedGroups(changes, keys)
      .select(keys.map(k => col(k).as(s"_touched_$k")): _*)
    def cond(left: DataFrame) =
      keys.map(k => left(k) <=> col(s"_touched_$k")).reduce(_ && _)
    val fresh =
      recompute(base.join(broadcast(touched), cond(base), "left_semi"))
    prior.join(broadcast(touched), cond(prior), "left_anti")
      .unionByName(fresh)
  }
}
