package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as ONE codegen'd two-level loop — the
  * ANN hot path's argmin, replacing the
  * `transform(centroids, c -> graft_l2sq(c, v))` +
  * `array_position(d, array_min(d)) - 1` composition. `transform` is
  * a higher-order function, which Spark evaluates INTERPRETED
  * (CodegenFallback): per row it allocates the distance array, binds
  * lambda holders, and boxes through the fold — at corpus scale the
  * assignment/encode pass IS the scan cost of IVF/PQ training and
  * encoding. Here the whole argmin compiles into whole-stage codegen:
  * no allocation, no boxing, no materialized distance array.
  *
  * Result semantics are EXACTLY the composition's (oracle-hash
  * parity):
  *  - per centroid, the distance is the ascending-index exact double
  *    fold Σ(cᵢ−vᵢ)² over `slice(v, start+1, len)` — identical to
  *    [[ArrayL2SqDistance]] over `slice`;
  *  - the result is the FIRST index attaining the minimum (strict `<`
  *    scan = `array_position` finding the min's first occurrence;
  *    lowest index wins ties);
  *  - NULL when the vector is null, any scanned element is null, any
  *    centroid row is null/mis-sized (the fold's null poisons every
  *    distance, so min and position degrade to null), or the centroid
  *    list is empty (`array_min` of an empty array).
  *
  * `left` must be a LITERAL array<array<double>> (the broadcast
  * centroid table); `right` the array<double> vector column. `start`
  * (0-based) and `len` select the subspace slice — `start = 0, len =
  * -1` scans the whole vector (the IVF case); PQ passes each
  * subspace's window, saving the per-row `slice` copies too. */
case class NearestCentroidIndex(left: Expression, right: Expression,
    start: Int, len: Int)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<array<double>> centroids and an " +
          s"array<double> vector, got ${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(cv: Any, vv: Any): Any = {
    val cents = cv.asInstanceOf[ArrayData]
    val v = vv.asInstanceOf[ArrayData]
    val n = cents.numElements()
    if (n == 0) return null
    val d = if (len < 0) v.numElements() - start else len
    if (start < 0 || start + d > v.numElements()) return null
    var best = Double.PositiveInfinity
    var bestIdx = -1
    var i = 0
    while (i < n) {
      if (cents.isNullAt(i)) return null
      val c = cents.getArray(i)
      if (c.numElements() != d) return null
      var s = 0.0
      var k = 0
      while (k < d) {
        if (c.isNullAt(k) || v.isNullAt(start + k)) return null
        val diff = c.getDouble(k) - v.getDouble(start + k)
        s += diff * diff
        k += 1
      }
      if (s < best) { best = s; bestIdx = i }
      i += 1
    }
    // all-NaN distances: the composition yields index 0 (array_min =
    // NaN; Spark's ordering makes every NaN equal, so array_position
    // finds the first) — unreachable for finite vectors, mirrored for
    // exact parity
    if (bestIdx < 0) 0 else bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cents, v) => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val diff = ctx.freshName("diff")
      val done = ctx.freshName("done")
      s"""
         |int $n = $cents.numElements();
         |int $d = ${if (len < 0) s"$v.numElements() - $start" else s"$len"};
         |if ($n == 0 || $start < 0 || $start + $d > $v.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestIdx = -1;
         |  boolean $done = false;
         |  for (int $i = 0; $i < $n && !$done; $i++) {
         |    if ($cents.isNullAt($i)) { ${ev.isNull} = true; $done = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($i);
         |    if ($c.numElements() != $d) { ${ev.isNull} = true; $done = true; break; }
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $d; $k++) {
         |      if ($c.isNullAt($k) || $v.isNullAt($start + $k)) {
         |        ${ev.isNull} = true; $done = true; break;
         |      }
         |      double $diff = $c.getDouble($k) - $v.getDouble($start + $k);
         |      $s += $diff * $diff;
         |    }
         |    if (!$done && $s < $best) { $best = $s; $bestIdx = $i; }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $bestIdx < 0 ? 0 : $bestIdx; // all-NaN -> first
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidIndex =
    copy(left = newLeft, right = newRight)
}

/** The matching MINIMUM DISTANCE (same loop, same fold, same null
  * semantics as [[NearestCentroidIndex]]) — `array_min(transform(...))`
  * for callers that also report the distance (assignClusters). The
  * value is the exact double the winning fold produced, so
  * `sqrt(this)` equals `sqrt(array_min(_dists))` bitwise. */
case class NearestCentroidDistSq(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "graft_nearest_centroid_d2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<array<double>> centroids and an " +
          s"array<double> vector, got ${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(cv: Any, vv: Any): Any = {
    val cents = cv.asInstanceOf[ArrayData]
    val v = vv.asInstanceOf[ArrayData]
    val n = cents.numElements()
    if (n == 0) return null
    val d = v.numElements()
    var best = Double.PositiveInfinity
    var found = false
    var i = 0
    while (i < n) {
      if (cents.isNullAt(i)) return null
      val c = cents.getArray(i)
      if (c.numElements() != d) return null
      var s = 0.0
      var k = 0
      while (k < d) {
        if (c.isNullAt(k) || v.isNullAt(k)) return null
        val diff = c.getDouble(k) - v.getDouble(k)
        s += diff * diff
        k += 1
      }
      if (s < best) { best = s; found = true }
      i += 1
    }
    // all-NaN: the composition's array_min returns NaN
    if (!found) Double.NaN else best
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cents, v) => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val found = ctx.freshName("found")
      val diff = ctx.freshName("diff")
      val done = ctx.freshName("done")
      s"""
         |int $n = $cents.numElements();
         |int $d = $v.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  boolean $found = false;
         |  boolean $done = false;
         |  for (int $i = 0; $i < $n && !$done; $i++) {
         |    if ($cents.isNullAt($i)) { ${ev.isNull} = true; $done = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($i);
         |    if ($c.numElements() != $d) { ${ev.isNull} = true; $done = true; break; }
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $d; $k++) {
         |      if ($c.isNullAt($k) || $v.isNullAt($k)) {
         |        ${ev.isNull} = true; $done = true; break;
         |      }
         |      double $diff = $c.getDouble($k) - $v.getDouble($k);
         |      $s += $diff * $diff;
         |    }
         |    if (!$done && $s < $best) { $best = $s; $found = true; }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $found ? $best : Double.NaN; // all-NaN -> NaN
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidDistSq =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** First index of the nearest centroid over `v`'s `[start, start+len)`
    * window (`len = -1`: the whole vector). */
  def nearestIndex(cents: Column, v: Column, start: Int = 0,
      len: Int = -1): Column =
    ColumnBridge.column(NearestCentroidIndex(
      ColumnBridge.expression(cents), ColumnBridge.expression(v), start, len))

  /** The winning squared distance over the whole vector. */
  def nearestDistSq(cents: Column, v: Column): Column =
    ColumnBridge.column(NearestCentroidDistSq(
      ColumnBridge.expression(cents), ColumnBridge.expression(v)))
}
