package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03 — public algorithm).
  *
  * Rolling polynomial hash over every k-byte window of the text, then
  * per window of `w` consecutive hashes keep the minimum (rightmost on
  * ties — the standard robust-winnowing rule). The selected hash set
  * is a position-independent fingerprint: any shared substring of
  * length ≥ w + k − 1 between two documents is GUARANTEED to
  * contribute at least one common fingerprint, which makes
  * fingerprint-set overlap a containment detector — the rolling-hash
  * complement to MinHash (whole-set resemblance) and SimHash
  * (distributional similarity).
  *
  * One expression eval per row: the rolling recurrence touches each
  * byte twice (enter/leave the window); selection is a linear scan.
  * Output: sorted distinct array<long> — the shape
  * [[SortedLongSetJaccard]] consumes.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 257L
  // Base^(k-1) for removing the leaving byte from the rolling hash
  private val BasePowK1: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= Base; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nHashes = n - k + 1
    val hashes = new Array[Long](nHashes)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nHashes) {
      h = (h - (bytes(i - 1) & 0xff) * BasePowK1) * Base + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost min of each w-window; dedup consecutive picks.
    // Fewer than w hashes → the global min (every doc fingerprints).
    val picks = new Array[Long](math.max(1, nHashes - w + 1))
    var nPicks = 0
    if (nHashes <= w) {
      var min = hashes(0)
      i = 1
      while (i < nHashes) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      picks(0) = min
      nPicks = 1
    } else {
      // record the window's rightmost-min hash whenever its POSITION
      // changes — the textbook winnowing selection rule
      var lastIdx = -1
      var start = 0
      while (start <= nHashes - w) {
        var minIdx = start
        i = start + 1
        while (i < start + w) {
          if (hashes(i) <= hashes(minIdx)) minIdx = i
          i += 1
        }
        if (minIdx != lastIdx) {
          picks(nPicks) = hashes(minIdx)
          nPicks += 1
          lastIdx = minIdx
        }
        start += 1
      }
    }
    val out = java.util.Arrays.copyOf(picks, nPicks)
    java.util.Arrays.sort(out)
    // dedup sorted
    var wIdx = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(wIdx - 1)) { out(wIdx) = out(i); wIdx += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, math.min(wIdx, out.length)))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprints =
    copy(child = newChild)
}

object WinnowingFingerprints {
  /** Sorted distinct winnowing fingerprints of a string column. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(WinnowingFingerprints(
      ColumnBridge.expression(text), k, w))
}
