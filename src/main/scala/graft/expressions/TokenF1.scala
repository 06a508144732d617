package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** SQuAD token-F1 as a native Catalyst expression (the performance
  * candidate from SURVEY §7: the array-HOF formulation in
  * graft.score.Score allocates token arrays and runs O(d²)
  * interpreted lambdas per row; this computes the multiset
  * intersection in one hash-count pass and stays inside whole-stage
  * codegen via a static call).
  *
  * Semantics are bit-identical to Score.tokenF1 (same tokenization,
  * same IEEE expression shape) — asserted by TokenF1ExprSpec.
  */
object TokenF1 {

  /** Multiset-intersection F1 over whitespace tokens. */
  def compute(pred: UTF8String, gold: UTF8String): Double =
    computeStr(pred.toString, gold.toString)

  def computeStr(pred: String, gold: String): Double = {
    val tp = tokenize(pred)
    val tg = tokenize(gold)
    val np = tp.length
    val ng = tg.length
    if (np == 0 || ng == 0) return if (np == ng) 1.0 else 0.0
    val counts = new java.util.HashMap[String, Int](ng * 2)
    var i      = 0
    while (i < ng) { counts.merge(tg(i), 1, (a, b) => a + b); i += 1 }
    var same = 0
    i = 0
    while (i < np) {
      val c = counts.getOrDefault(tp(i), 0)
      if (c > 0) { same += 1; counts.put(tp(i), c - 1) }
      i += 1
    }
    if (same == 0) return 0.0
    val p = same.toDouble / np
    val r = same.toDouble / ng
    2.0 * p * r / (p + r)
  }

  private def tokenize(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** Register `token_f1` in the session's function registry. */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("token_f1")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_f1",
      exprs => TokenF1Expr(exprs.head, exprs(1)),
      "built-in")

  /** Column API: registers on the session, then resolves by name. */
  def tokenF1(spark: SparkSession, pred: Column, gold: Column): Column = {
    register(spark)
    call_function("token_f1", pred, gold)
  }
}

case class TokenF1Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(pred: Any, gold: Any): Any =
    TokenF1.compute(pred.asInstanceOf[UTF8String], gold.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, g) => s"graft.expressions.TokenF1.compute($p, $g)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
