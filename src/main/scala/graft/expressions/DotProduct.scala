package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two ARRAY<DOUBLE> columns as a native Catalyst
  * expression — the hot loop of every embedding operator (cosine
  * top-k, IVF assignment, k-means rounds, near-dup pairs).
  *
  * The HOF formulation `aggregate(zip_with(a, b, *), 0.0, +)`
  * allocates a zipped array per row and runs interpreted lambdas per
  * element; this is one fused primitive loop that stays inside
  * whole-stage codegen via a static call.
  *
  * Semantics are bit-identical to the HOF fold (asserted by
  * DotProductSpec): same left-to-right IEEE accumulation order
  * `acc += a(i)*b(i)`, NULL when lengths differ (zip_with pads the
  * shorter side with NULL, which nulls the fold) or when any element
  * is NULL (NULL propagates through * and +).
  */
object DotProduct {

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i   = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Register `dot_d` in the session's function registry. */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dot_d")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_d",
      exprs => DotProductExpr(exprs.head, exprs(1)),
      "built-in")

  /** Column API over ARRAY<DOUBLE> inputs (registers on the active
    * session, then resolves by name).
    */
  def dotD(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("dot_d", a, b)
  }
}

case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // compute() returns null on length mismatch / null elements even
  // when both inputs are non-null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.expressions.DotProduct.compute($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
