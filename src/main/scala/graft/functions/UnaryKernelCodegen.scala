package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/** Real `doGenCode` for unary native kernels whose fold body stays a
  * Scala method.
  *
  * Extending CodegenFallback makes Spark interpret the ENTIRE subtree
  * below the kernel per row — the `lower`/`split`/`transform` token
  * chain these kernels consume included — because the fallback path
  * calls `this.eval(row)` on the whole expression tree. This trait
  * instead keeps the child chain inside whole-stage codegen and makes
  * ONE virtual call per row into [[evalChildValue]] (the kernel's own
  * tight primitive loop), so only the md5/merge work itself sits
  * outside generated Java.
  *
  * Null contract: UnaryExpression's default — null child value → null
  * result, otherwise `nullSafeEval`. Kernels with bespoke null
  * semantics (e.g. [[SimHash]]'s never-null output) write their own
  * doGenCode instead of mixing this in.
  */
trait UnaryKernelCodegen extends UnaryExpression {

  /** Bridge callable from generated code (same contract as eval). */
  final def evalChildValue(v: Any): Any =
    if (v == null) null else nullSafeEval(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this)
    val childGen = child.genCode(ctx)
    val tmp = ctx.freshName("kernelOut")
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    ev.copy(code = childGen.code + code"""
Object $tmp = $ref.evalChildValue(${childGen.isNull} ? null : ${childGen.value});
boolean ${ev.isNull} = $tmp == null;
$javaType ${ev.value} = ${ev.isNull}
  ? ${CodeGenerator.defaultValue(dataType)} : (($boxed) $tmp);""")
  }
}
