package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word n-gram shingle set in ONE expression eval.
  *
  * Replaces the four-stage builtin pipeline
  * `array_sort(transform(array_distinct(transform(sequence…, concat_ws)),
  * xxhash64))` used by the similarity-dedup operators. That chain is all
  * interpreted higher-order functions: per row it materializes the gram
  * strings, a distinct pass over them, a second transform for hashing,
  * and a sort — each allocating UTF8Strings and boxing. This expression
  * walks the token array once, hashes each n-gram's bytes directly
  * (XXH64, the same hash family as `xxhash64`), and sort-dedups a
  * primitive long array.
  *
  * Output values are an arbitrary-but-fixed injective-modulo-collision
  * image of the string shingle set, so set sizes, intersections, and
  * Jaccard scores over the output equal those over the string sets
  * (absent 64-bit collisions) — which is all the PPJoin/near-dup
  * pipelines consume. Operators whose ORACLE must reproduce the hash
  * values themselves (MinHash signatures) keep the md5-based path.
  *
  * Codegen via [[UnaryKernelCodegen]]: the token chain feeding this
  * kernel stays inside whole-stage codegen and the gram walk is one
  * virtual call per row (a CodegenFallback would interpret the whole
  * subtree, token chain included).
  */
case class HashedNGrams(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  require(n >= 1, s"n must be >= 1, got $n")

  override def prettyName: String = "graft_hashed_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val raw = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      // concat_ws(" ", …) semantics: null tokens contribute nothing
      var gram: UTF8String = null
      var j = 0
      while (j < n) {
        val t = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        if (t != null) {
          gram = if (gram == null) t else UTF8String.concat(gram, sep, t)
        }
        j += 1
      }
      if (gram == null) gram = UTF8String.EMPTY_UTF8
      raw(i) = XXH64.hashUnsafeBytes(
        gram.getBaseObject, gram.getBaseOffset, gram.numBytes, seed)
      i += 1
    }
    java.util.Arrays.sort(raw)
    // in-place dedup of the sorted primitives
    var w = 1
    var r = 1
    while (r < raw.length) {
      if (raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNGrams =
    copy(child = newChild)
}

object HashedNGrams {
  /** Sorted distinct XXH64 hashes of the word n-grams of a token-array
    * column. */
  def hashedNGrams(toks: Column, n: Int): Column =
    ColumnBridge.column(HashedNGrams(ColumnBridge.expression(toks), n))
}
