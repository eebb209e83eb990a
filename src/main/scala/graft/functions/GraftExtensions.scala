package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point registering the engine's native
 * Catalyst expressions as SQL functions (activated by GraftSession via
 * `spark.sql.extensions`, the extension mechanism the design rules
 * reserve for semantics the built-in operators can't express).
 * Currently: `fnv_fingerprint(text)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fnv_fingerprint"),
      new ExpressionInfo(classOf[FnvFingerprint].getName, "fnv_fingerprint"),
      (children: Seq[Expression]) => FnvFingerprint(children.head)))
  }
}

object GraftFunctions {
  /** Column-API access to the native expression (no session registry
   *  needed): `fnvFingerprint(col("text"))`. */
  def fnvFingerprint(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      FnvFingerprint(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
