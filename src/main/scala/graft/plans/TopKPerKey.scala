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
  * (`Similarity.keepTopPerQueryWindow`) bounds reducer memory but
  * still ships every candidate row once. This operator plans like a
  * hash aggregate instead: a PARTIAL stage keeps at most k rows per
  * key per input partition in bounded heaps BEFORE the exchange, so
  * the shuffle carries ≤ k·partitions rows per key regardless of
  * input size — on a 100 TB candidate stream with k=10 that is the
  * difference between shuffling the stream and shuffling a rounding
  * error.
  *
  * Memory safety (both stages bounded, no OOM mode):
  *   - The PARTIAL stage's heap map is capped at `maxPartialRows`
  *     retained rows per partition (`spark.graft.topKPerKey
  *     .maxPartialRows`, default 1M ≈ low hundreds of MB). Once the
  *     cap is hit, rows of not-yet-tracked keys stream through to the
  *     exchange UNFILTERED — partial pruning is an optimization, so
  *     overflow degrades to extra shuffle volume, never to wrong
  *     results or executor OOM (high-key-cardinality inputs thus
  *     plan like the window form instead of dying).
  *   - The FINAL stage requires child ordering on (keys, order) and
  *     streams each key group, emitting the first k rows — O(1)
  *     state beyond the current key. The sort below it is Spark's
  *     spillable SortExec over the partial-pruned survivors
  *     (≤ k·partitions per tracked key + overflow pass-through).
  *
  * Correctness contract: `order` must be a TOTAL order (tie-break on
  * a unique column, the house rule everywhere) — then partial top-k
  * composes (the global top-k of a union is inside the union of
  * per-part top-ks) and the result set is EXACTLY the window
  * formulation's (TopKPerKeySpec pins parity on random data, ties
  * included, and under a starvation-level partial budget).
  */
case class TopKPerKeyNode(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], maxPartialRows: Long,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  require(maxPartialRows > 0, s"maxPartialRows must be positive, got $maxPartialRows")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Plans the logical node as budgeted-partial-heap → (exchange +
  * spillable sort inserted by EnsureRequirements) → streaming-final,
  * the HashAggregate shape with a sort-merge final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, maxPartialRows, child) =>
      val partial = TopKPerKeyPartialExec(k, keys, order, maxPartialRows,
        planLater(child))
      TopKPerKeyFinalExec(k, keys, order, partial) :: Nil
    case _ => Nil
  }
}

/** Pre-exchange prune: per-partition bounded heaps, at most
  * `maxPartialRows` retained rows; overflow keys pass through. */
case class TopKPerKeyPartialExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], maxPartialRows: Long, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderLocal = order
    val childOutput = child.output
    val maxKeys = math.max(1L, maxPartialRows / kLocal)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
          orderLocal, childOutput)
      // heap head = WORST kept row (reverse order), so a better row
      // evicts the head in O(log k)
      val revOrd = rowOrd.reverse
      val heaps = new java.util.HashMap[
        UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      new Iterator[InternalRow] {
        private var flush: java.util.Iterator[
          java.util.PriorityQueue[InternalRow]] = null
        private var cur: java.util.PriorityQueue[InternalRow] = null
        private var nextRow: InternalRow = null
        private def computeNext(): Unit = {
          while (nextRow == null) {
            if (flush == null) {
              if (iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                var heap = heaps.get(key)
                if (heap == null && heaps.size() >= maxKeys) {
                  // budget exhausted: stream the row through — the
                  // final stage still computes the exact top-k
                  nextRow = row
                  return
                }
                if (heap == null) {
                  heap = new java.util.PriorityQueue[InternalRow](
                    kLocal, revOrd)
                  heaps.put(key.copy(), heap)
                }
                if (heap.size < kLocal) heap.add(row.copy())
                else if (rowOrd.compare(row, heap.peek()) < 0) {
                  heap.poll()
                  heap.add(row.copy())
                }
              } else flush = heaps.values().iterator()
            } else if (cur != null && !cur.isEmpty) {
              nextRow = cur.poll()
            } else if (flush.hasNext) {
              cur = flush.next()
            } else return
          }
        }
        override def hasNext: Boolean = {
          if (nextRow == null) computeNext()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) computeNext()
          val r = nextRow
          nextRow = null
          r
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec =
    copy(child = c)
  override def nodeName: String = "TopKPerKeyPartial"
}

/** Post-exchange exact pick: requires (keys, order)-sorted input
  * (EnsureRequirements plants a spillable SortExec) and streams each
  * key group, keeping its first k rows — O(1) state. */
case class TopKPerKeyFinalExec(k: Int, keys: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (keys.map(SortOrder(_, Ascending)) ++ order) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var curKey: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (curKey == null || key != curKey) {
          curKey = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= kLocal
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyFinalExec =
    copy(child = c)
  override def nodeName: String = "TopKPerKeyFinal"
}

/** User API + strategy registration. */
object TopKPerKey {

  /** Per-partition retained-row budget for the partial stage; above
    * it, new keys stream through unpruned (see class doc). */
  val MaxPartialRowsKey = "spark.graft.topKPerKey.maxPartialRows"
  val MaxPartialRowsDefault = 1L << 20

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
    * with ~k·partitions rows per key shuffled instead of all, and
    * memory-bounded at any key cardinality (partial heaps budgeted,
    * final stage streaming over a spillable sort). */
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
    val budget = spark.conf.getOption(MaxPartialRowsKey)
      .map(_.toLong).getOrElse(MaxPartialRowsDefault)
    val node = TopKPerKeyNode(k,
      keyCols.map(ColumnBridge.catalystExpression),
      sortOrders, budget, ColumnBridge.logicalPlan(df))
    ColumnBridge.ofRows(spark, node)
  }
}
