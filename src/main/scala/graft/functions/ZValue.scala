package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order curve value of `children.size` dimensions: each input is
  * bucketed against its per-dimension sorted `boundaries` (equi-depth
  * quantile edges, so value skew cannot collapse buckets) and the
  * bucket ids are BIT-INTERLEAVED — bit b of dimension d lands at
  * position `b * dims + d` — yielding a single long whose total order
  * is the Z-curve. Sorting by it gives every dimension locality at
  * once: parquet row groups then carry narrow min/max ranges on EVERY
  * cluster column, which is the multi-predicate data-skipping effect
  * Delta's Z-ORDER targets (single-column sort only skips on the
  * leading column).
  *
  * Inputs must be DoubleType (callers cast); a null value buckets to 0
  * (sorts first, like NULLS FIRST). `boundaries(d)` has `2^bitsPerDim
  * - 1` ascending edges; value v gets bucket = #edges < v (binary
  * search), i.e. edges are upper-inclusive cut points.
  *
  * Runs interpreted (CodegenFallback) by design: its children are
  * plain table columns (no expression chain to drag out of codegen),
  * and it evaluates once per row of a maintenance REWRITE whose cost
  * is the parquet write, not the sort key.
  */
case class ZValue(children: Seq[Expression], boundaries: Seq[Seq[Double]])
    extends Expression with CodegenFallback with Serializable {

  private val dims = children.size
  require(dims >= 1, "ZValue needs at least one dimension")
  require(boundaries.size == dims,
    s"boundaries for ${boundaries.size} dims, got $dims children")
  private val bitsPerDim = {
    val buckets = boundaries.head.size + 1
    require(boundaries.forall(_.size == buckets - 1),
      "all dimensions must have the same bucket count")
    require((buckets & (buckets - 1)) == 0 && buckets >= 2,
      s"bucket count must be a power of two >= 2, got $buckets")
    java.lang.Integer.numberOfTrailingZeros(buckets)
  }
  require(bitsPerDim * dims <= 63,
    s"z-value would need ${bitsPerDim * dims} bits; max 63")

  override def prettyName: String = "graft_zvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != DoubleType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires double inputs, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  @transient private lazy val edges: Array[Array[Double]] =
    boundaries.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < dims) {
      val v = children(d).eval(input)
      val bucket =
        if (v == null) 0
        else {
          val x = v.asInstanceOf[Double]
          val i = java.util.Arrays.binarySearch(edges(d), x)
          // exact hit i: edges are upper-inclusive -> bucket i;
          // miss: insertion point = #edges < x
          if (i >= 0) i else -(i + 1)
        }
      var b = 0
      while (b < bitsPerDim) {
        z |= ((bucket >> b) & 1L) << (b * dims + d)
        b += 1
      }
      d += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValue =
    copy(children = newChildren)
}

object ZValue {
  /** Z-curve long of `cols` (cast to double by the caller) against
    * per-dimension quantile edges. */
  def zvalue(cols: Seq[Column], boundaries: Seq[Seq[Double]]): Column =
    ColumnBridge.column(ZValue(cols.map(ColumnBridge.expression), boundaries))
}
