package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the 64-bit FNV-1a document fingerprint
 * (same semantics as TextStats.fingerprintUdf — the rolling-hash
 * fingerprint operator of the training-data pipeline). A scalar hash
 * loop is exactly the case the built-in function library cannot
 * express, so this is the (b)-tier implementation from the design
 * rules: a codegen'd `Expression` that stays inside whole-stage codegen
 * instead of a Scala UDF that breaks it (no Row boxing, no closure
 * serialization, null handling fused into the generated code).
 *
 * The hash runs over the string's UTF-16 chars — identical to the UDF —
 * via a static helper shared by the interpreted and generated paths.
 */
case class FnvFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv_fingerprint requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FnvFingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FnvFingerprint.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): FnvFingerprint =
    copy(child = newChild)
}

object FnvFingerprint {
  /** FNV-1a over UTF-16 chars; offset basis 0xcbf29ce484222325,
   *  prime 0x100000001b3 (public-domain constants). Kept in one place so
   *  the UDF (TextStats.fingerprintUdf), the interpreted expression and
   *  the generated code cannot drift. */
  def hash(text: String): Long = {
    if (text == null) return 0L
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < text.length) { h = (h ^ text.charAt(i)) * 0x100000001b3L; i += 1 }
    h
  }
}
