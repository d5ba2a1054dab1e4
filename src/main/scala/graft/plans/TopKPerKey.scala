package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** PER-KEY TOP-K as a first-class physical operator — the
  * whole-operator extension point (custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`) for the shape every ANN shortlist,
  * group-wise sampling, and canonical-pick operator in this library
  * reduces to: "keep the k best rows of each key under a total
  * order".
  *
  * Why the built-ins don't express it: the window formulation
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`) must
  * SHUFFLE EVERY INPUT ROW to the key's reducer and sort it there
  * before discarding all but k — the filter cannot cross the
  * Exchange. The sharded two-window refinement
  * (`Similarity.keepTopPerQuery`) bounds reducer memory but still
  * ships every candidate row once. This operator plans like a hash
  * aggregate instead: a PARTIAL stage keeps at most k rows per key
  * per input partition in bounded heaps BEFORE the exchange, so the
  * shuffle carries ≤ k·partitions rows per key regardless of input
  * size — on a 100 TB candidate stream with k=10 that is the
  * difference between shuffling the stream and shuffling a rounding
  * error. The FINAL stage merges the ≤ k·partitions survivors per
  * key with the same heap.
  *
  * Correctness contract: `order` must be a TOTAL order (tie-break on
  * a unique column, the house rule everywhere) — then partial top-k
  * composes (the global top-k of a union is inside the union of
  * per-part top-ks) and the result set is EXACTLY the window
  * formulation's (TopKPerKeySpec pins parity on random data, ties
  * included). Memory: O(distinct keys in partition × k) rows, no
  * spill path — the operator targets bounded-k shortlists, not
  * unbounded-group aggregation (use the window form when k·keys
  * approaches partition memory; see SCALE.md).
  */
case class TopKPerKeyNode(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Plans the logical node as partial-heap → (exchange inserted by
  * EnsureRequirements) → final-heap, the HashAggregate shape. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order,
        planLater(child), partial = true)
      TopKPerKeyExec(k, keys, order, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
          orderLocal, childOutput)
      // heap head = WORST kept row (reverse order), so a better row
      // evicts the head in O(log k)
      val reversed = rowOrd.reverse
      val heaps = new java.util.HashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, reversed)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val h = it.next()
        while (!h.isEmpty) out += h.poll()
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** User API + strategy registration. */
object TopKPerKey {

  /** Idempotently register the strategy on the session (runtime
    * registration via `spark.experimental.extraStrategies` — works in
    * any session, no config restart; GraftExtensions also injects it
    * for `spark.sql.extensions`-configured sessions). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** Keep the k best rows per key under `order` (MUST be a total
    * order — tie-break on a unique column). Result-set-identical to
    * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`
    * with ~k·partitions rows per key shuffled instead of all. */
  def perKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val sortOrders = orderCols.map { c =>
      ColumnBridge.catalystExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    val node = TopKPerKeyNode(k,
      keyCols.map(ColumnBridge.catalystExpression),
      sortOrders, ColumnBridge.logicalPlan(df))
    ColumnBridge.ofRows(spark, node)
  }
}
