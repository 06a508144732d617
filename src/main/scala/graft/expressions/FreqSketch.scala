package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native aggregate
  * (`TypedImperativeAggregate`) — the bounded-state scale path for
  * heavy-hitter discovery over an unbounded vocabulary.
  *
  * Semantics: after summarizing a stream of N items with capacity c,
  * every surviving entry carries an estimate ĉ(x) with
  * `count(x) − N/(c+1) ≤ ĉ(x) ≤ count(x)`, and — the recall
  * guarantee the two-pass heavy-hitter pattern rests on — every item
  * with `count(x) > N/(c+1)` IS present in the summary. Items the
  * stream never produced are never emitted.
  *
  * Implementation is the amortized-O(1) "buffer to 2c, trim to c"
  * variant (Agarwal et al., "Mergeable Summaries", PODS'12 — public
  * method): updates insert freely until the map reaches 2c, then one
  * trim subtracts the (c+1)-th largest count from every entry and
  * drops the non-positive ones (≥ c removals per trim, so the total
  * subtracted mass is ≤ N/(c+1) per surviving key). Partials merge by
  * summing common keys then trimming the union the same way, which is
  * exactly the paper's mergeability construction — so the map-side
  * combine ships ≤ 2c entries per partition regardless of vocabulary
  * size, and no per-token shuffle ever happens.
  *
  * The summary CONTENT (which below-threshold stragglers survive, and
  * their exact estimates) depends on partition boundaries — that is
  * inherent to MG and why the query-level pattern is two-pass: pass 1
  * finds a candidate superset (deterministically ⊇ the true heavy
  * hitters), pass 2 re-counts candidates exactly. Only the exact
  * pass-2 output is oracle-gated.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity > 0, s"mg_sketch needs capacity > 0, got $capacity")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Subtract the (capacity+1)-th largest count from every entry and
    * drop non-positive ones; post-condition size ≤ capacity.
    */
  private def trim(buf: java.util.HashMap[String, Long]): Unit = {
    if (buf.size <= capacity) return
    val counts = new Array[Long](buf.size)
    var i      = 0
    val it0    = buf.values().iterator()
    while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(counts)
    // (capacity+1)-th largest = counts[size - capacity - 1] ascending
    val sub = counts(buf.size - capacity - 1)
    val it  = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue - sub
      if (v <= 0L) it.remove() else e.setValue(v)
    }
  }

  private def add(buf: java.util.HashMap[String, Long], x: String, w: Long): Unit = {
    buf.merge(x, w, (a, b) => a + b)
    if (buf.size > 2 * capacity) trim(buf)
  }

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(b1, e.getKey, e.getValue)
    }
    b1
  }

  /** Final trim to ≤ capacity entries, emitted as map<string,long>. */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    trim(buf)
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i    = 0
    val it   = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0   = buf.entrySet().iterator()
    val items = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items.add((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.size)
    var i = 0
    while (i < items.size) {
      val (b, v) = items.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(v)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = createAggregationBuffer()
    var i   = 0
    while (i < n) {
      val len = bb.getInt()
      val b   = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "mg_sketch"

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
}

object FreqSketch {

  /** Register `mg_sketch(col, capacity)` (capacity must be a literal). */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("mg_sketch")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_sketch",
      exprs => {
        require(exprs.length == 2, "mg_sketch(col, capacity) takes exactly two arguments")
        val c = exprs(1).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other =>
            throw new IllegalArgumentException(s"capacity must be an integer literal, got $other")
        }
        MisraGriesAgg(exprs.head, c)
      },
      "built-in")

  /** Column API: Misra–Gries summary of a STRING column as
    * map<item, lower-bound estimate>.
    */
  def mgSketch(c: Column, capacity: Int): Column = {
    register(SparkSession.active)
    call_function("mg_sketch", c, lit(capacity))
  }
}
