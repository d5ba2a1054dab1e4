package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All `numHashes` MinHash values of a string shingle set in ONE pass.
  *
  * Hash k of shingle s is defined EXACTLY as the builtin chain the
  * dedup oracle reproduces in SQL:
  *   `conv(substring(md5(concat('⌊k/4⌋:', s)), 1 + 8·(k%4), 8), 16, 10)`
  * i.e. hex-slice k%4 of md5("seedGroup:" ++ s) read as an unsigned
  * 32-bit big-endian integer — so one md5 digest feeds four hash
  * functions, and external engines (DuckDB) reproduce every value
  * bit-for-bit.
  *
  * The builtin expression chain evaluates this through ⌈k/4⌉ interpreted
  * `transform`s materializing hex-string arrays plus k interpreted
  * `array_min(transform(…, conv(substring(…))))` passes per row. This
  * expression walks the shingle array once, updates k running minima,
  * and allocates nothing but the 16-byte digests.
  *
  * Empty shingle set → all-null signature (array_min of an empty array
  * is null in the builtin form).
  */
case class MinHashSignatures(child: Expression, numHashes: Int)
    extends UnaryExpression with UnaryKernelCodegen with Serializable {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private val numSeeds = (numHashes + 3) / 4

  // MessageDigest is stateful and not thread-safe; tasks share the
  // expression instance within an executor JVM.
  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numSeeds).map(s => s"$s:".getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val m = shingles.numElements()
    if (m == 0) {
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    }
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    val md = digests.get()
    var seen = false
    var i = 0
    while (i < m) {
      if (shingles.isNullAt(i)) {
        // null elements are skipped, mirroring the builtin chain this
        // expression replaces (md5(null) -> null, array_min null-skips);
        // the SQL surface graft_minhash sees arbitrary user arrays
        i += 1
      } else {
      seen = true
      // getBytes copies the UTF-8 payload once per (shingle, seed-group)
      val sBytes = shingles.getUTF8String(i).getBytes
      var seed = 0
      while (seed < numSeeds) {
        md.reset()
        md.update(seedPrefixes(seed))
        md.update(sBytes)
        val dig = md.digest()
        var slice = 0
        while (slice < 4) {
          val k = seed * 4 + slice
          if (k < numHashes) {
            val o = 4 * slice
            val v = ((dig(o) & 0xffL) << 24) | ((dig(o + 1) & 0xffL) << 16) |
              ((dig(o + 2) & 0xffL) << 8) | (dig(o + 3) & 0xffL)
            if (v < mins(k)) mins(k) = v
          }
          slice += 1
        }
        seed += 1
      }
      i += 1
      }
    }
    if (!seen) return new GenericArrayData(Array.fill[Any](numHashes)(null))
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatures =
    copy(child = newChild)
}

object MinHashSignatures {
  /** array<long> of the `numHashes` MinHash values of a string-array
    * shingle column (md5-hex-slice family — oracle-reproducible). */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignatures(
      ColumnBridge.expression(shingles), numHashes))
}
