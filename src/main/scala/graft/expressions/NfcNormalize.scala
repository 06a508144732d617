package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step every text-curation pipeline runs before
  * hashing/dedup/token counting (a decomposed "é" (e + U+0301) and
  * the precomposed U+00E9 must dedup, fingerprint, and count as the
  * same text), and a gap in Spark's built-in function surface.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan and true for
  * ~all real corpus text (ASCII trivially) — the input UTF8String is
  * returned as-is with zero allocation; only strings that actually
  * need recomposition pay the String round-trip.
  */
object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Register `nfc_normalize` in the session's function registry. */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => NfcNormalizeExpr(exprs.head),
      "built-in")

  /** Column API: registers on the session, then resolves by name. */
  def nfcNormalize(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("nfc_normalize", text)
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
