package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All `bits` SimHash bits of a token array in ONE token pass.
  *
  * Bit j is defined EXACTLY as the builtin HOF chain the q24 oracle
  * reproduces in SQL:
  *   bit_j = [ Σ_tokens (±1 by bit j of hash(token)) >= 0 ]
  * where hash(token) is the md5-hex-slice family shared with MinHash
  * (`conv(substring(md5('seed:' ++ token)), 1, 8), 16, 10)` — the first
  * 8 hex digits of md5("seed:token") read as an unsigned 32-bit int),
  * so DuckDB reproduces every signature bit-for-bit.
  *
  * The HOF form pays `bits` interpreted `aggregate(transform(...))`
  * passes per row, each re-md5-ing EVERY token — 16x redundant token
  * hashing for a 16-bit signature. This expression hashes each token
  * once and updates all `bits` counters from that single digest:
  * invisible at sf0.1, the difference between 1 and 16 md5 passes over
  * a 100 TB corpus.
  *
  * Edge-case parity with the HOF chain (spec-pinned in
  * TrainingDataSpec):
  *   - empty token array → every counter 0 → 0 >= 0 → ALL bits set;
  *   - null token element → the `when` condition is null → `otherwise`
  *     branch → −1 on EVERY bit counter;
  *   - null array → 0, NOT null: the HOF's per-bit
  *     `when(bitSum >= 0, 2^j).otherwise(0)` sends the null bitSum to
  *     the otherwise branch, so all bits read 0 — and the DuckDB oracle
  *     (CASE WHEN NULL >= 0 … ELSE 0) agrees.
  */
case class SimHash(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression with Serializable {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  /** ≤ 32 bits keeps the original int type (q24/q38 oracle parity);
    * wider signatures — the production-scale shape — are longs. Bits
    * 0–31 come from md5 hex digits 1–8 (unchanged); bits 32–62 from
    * hex digits 9–16 (the second slice of the same digest, like
    * MinHashSignatures' seed groups), so widening never changes the
    * low bits. */
  override def dataType: DataType = if (bits <= 32) IntegerType else LongType

  // never null: a null token array yields 0 (see scaladoc), so the HOF
  // chain's non-null output type carries over
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val out = hashLong(child.eval(input).asInstanceOf[ArrayData])
    if (bits <= 32) out.toInt else out
  }

  /** Codegen keeps the child token chain inside the whole-stage loop
    * (a CodegenFallback here would re-evaluate the ENTIRE subtree —
    * lower/split/transform included — interpreted, per row) and makes
    * ONE virtual call into [[hashLong]] for the md5 fold, whose cost
    * is the digests themselves, not dispatch. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val castPrefix = if (bits <= 32) "(int) " else ""
    ev.copy(
      code = childGen.code + code"""
final $javaType ${ev.value} = $castPrefix$ref.hashLong(
  ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  // MessageDigest is stateful and not thread-safe; tasks share the
  // expression instance within an executor JVM.
  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  @transient private lazy val seedPrefix: Array[Byte] =
    s"$seed:".getBytes("UTF-8")

  /** The whole-array md5 fold as a `bits`-wide long, callable from
    * generated code; null array → 0 (HOF parity, see scaladoc). */
  def hashLong(toks: ArrayData): Long = {
    if (toks == null) return 0L
    val m = toks.numElements()
    val counters = new Array[Int](bits)
    val md = digests.get()
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) {
        // HOF parity: when(null-condition).otherwise(-1) → -1 per bit
        var j = 0
        while (j < bits) { counters(j) -= 1; j += 1 }
      } else {
        md.reset()
        md.update(seedPrefix)
        md.update(toks.getUTF8String(i).getBytes)
        val dig = md.digest()
        // hex digits 1-8 = first 4 digest bytes (big-endian unsigned —
        // same slice MinHashSignatures reads); digits 9-16 = the next
        // 4, feeding bits 32+
        val v1 = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        val v2 = ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
          ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
        var j = 0
        while (j < bits) {
          val bit = if (j < 32) (v1 >>> j) & 1L else (v2 >>> (j - 32)) & 1L
          if (bit == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counters(j) >= 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  /** `bits`-wide SimHash of a string-array token column (md5-hex-slice
    * hash family — oracle-reproducible). */
  def simhash(tokens: Column, bits: Int, seed: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(tokens), bits, seed))
}
