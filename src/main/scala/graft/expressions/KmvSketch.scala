package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV bottom-k sketch as a native aggregate function
  * (`TypedImperativeAggregate`) — the one-pass scale path for
  * TextStats.kmvDistinct's window formulation.
  *
  * Buffer = the k smallest DISTINCT values seen (a bounded TreeSet:
  * insert, dedupe, trim — constant memory per group). Partials merge
  * by union-then-trim, which is exactly how KMV sketches compose, so
  * the map-side combine collapses each partition's values to ≤ k
  * longs before the shuffle — no per-group sort window, no distinct
  * pre-shuffle. eval() emits the ascending k-minima array; the
  * estimator (k−1)·2^60 / h_(k) reads its last element.
  *
  * Result is ORDER-INDEPENDENT (a set of minima), hence identical on
  * any partitioning and bit-replayable by the SQL oracle's
  * rank-window form.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"kmv_sketch needs k > 0, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit = {
    buf.add(x)
    if (buf.size > k) buf.pollLast()
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it  = buf.iterator()
    var i   = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = createAggregationBuffer()
    var i   = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "kmv_sketch"

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KmvSketch {

  /** Register `kmv_sketch(col, k)` in the session's function
    * registry (k must be a literal).
    */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_sketch")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      exprs => {
        require(exprs.length == 2, "kmv_sketch(col, k) takes exactly two arguments")
        val k = exprs(1).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
        }
        KmvSketchAgg(exprs.head, k)
      },
      "built-in")

  /** Column API: bottom-k sketch of a LONG column. */
  def kmvSketch(c: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function("kmv_sketch", c, lit(k))
  }
}
