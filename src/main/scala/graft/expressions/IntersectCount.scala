package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of common elements between two SORTED-ASCENDING ARRAY<LONG>
  * columns as a native Catalyst expression — the adjacency-
  * intersection census's hot loop (`GraphOps.triangleStats` evaluates
  * it once per directed edge over O(√m)-sized neighbor lists).
  *
  * `size(array_intersect(a, b))` materializes the intersection ARRAY
  * (an OpenHashSet + an UnsafeArrayData allocation per row) only to
  * take its length; this is one allocation-free two-pointer merge
  * walk — O(|a| + |b|) with no per-row heap garbage — kept inside
  * whole-stage codegen via a static call.
  *
  * CONTRACT (caller-enforced, cheap to provide via `sort_array` on a
  * `collect_list` of DISTINCT values): both arrays sorted ascending,
  * no NULL elements, no duplicates. Under that contract the count is
  * exactly `size(array_intersect(a, b))` (set-intersection
  * cardinality) — asserted against the built-in on randomized inputs
  * by IntersectCountSpec. Duplicate elements would double-count where
  * array_intersect dedups, so the census keeps its edges DISTINCT
  * upstream (it always has).
  */
object IntersectCount {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i  = 0
    var j  = 0
    var c  = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Register `sorted_intersect_count` in the session registry. */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => IntersectCountExpr(exprs.head, exprs(1)),
      "built-in")

  /** Column API over sorted ARRAY<LONG> inputs. */
  def sortedCount(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function("sorted_intersect_count", a, b)
  }
}

case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType

  // strict ARRAY<LONG> inputs: the merge walk reads 8-byte slots, so
  // an ARRAY<INT> argument through the registered SQL function would
  // otherwise mis-read packed data silently (r14 review finding) —
  // wrong types now fail at ANALYSIS, not at runtime
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.IntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
