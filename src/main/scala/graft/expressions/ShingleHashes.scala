package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes as a native Catalyst
  * expression — the first stage of every Jaccard/near-dup pipeline
  * (reference: the shingling step behind the dedup extensions;
  * cf. `profiler_utils.py:309-344` tokenization).
  *
  * Replaces the Scala-UDF form of `Dedup.shingleHashes`: a UDF sits
  * outside whole-stage codegen (encoder boundary per row, Seq[Long]
  * allocation, catalyst conversion); this expression tokenizes the
  * raw UTF-8 bytes in place and emits the sorted distinct 64-bit
  * XXH64 hashes (seed 42 — the same value `xxhash64` computes over
  * the shingle string, asserted in TextOpsSpec).
  *
  * Tokens are maximal runs of non-space bytes (split on 0x20,
  * empties dropped — exactly `split(' ').filter(_.nonEmpty)`; safe
  * on UTF-8 since multi-byte sequences never contain 0x20). When the
  * n tokens of a shingle are single-space separated in the source
  * (the overwhelmingly common case) the hash reads the original
  * bytes with NO copy; otherwise the shingle is normalized into a
  * scratch buffer first ("a  b" hashes like "a b").
  */
object ShingleHashes {

  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes  = text.getBytes // compact byte copy of the row's text
    val len    = bytes.length
    // token spans (start, end) over bytes
    var nTok   = 0
    var starts = new Array[Int](math.max(8, len / 4))
    var ends   = new Array[Int](starts.length)
    var i      = 0
    while (i < len) {
      if (bytes(i) != ' ') {
        val s = i
        while (i < len && bytes(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends   = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    val limit = math.max(nTok - (n - 1), 1)
    val out   = new Array[Long](limit)
    var k     = 0
    while (k < limit) {
      val lastTok = math.min(k + n, nTok) - 1
      if (lastTok < k) {
        // no tokens at all: the empty shingle
        out(k) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, 0, 42L)
      } else {
        val s       = starts(k)
        val e       = ends(lastTok)
        var tokLens = 0
        var t       = k
        while (t <= lastTok) { tokLens += ends(t) - starts(t); t += 1 }
        val nSeps = lastTok - k
        if (e - s == tokLens + nSeps) {
          // single-space separated in the source: hash in place
          out(k) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s, e - s, 42L)
        } else {
          // normalize into the scratch buffer ("a  b" → "a b")
          var buf = scratch.get()
          val need = tokLens + nSeps
          if (buf.length < need) {
            buf = new Array[Byte](math.max(need, buf.length * 2))
            scratch.set(buf)
          }
          var w = 0
          t = k
          while (t <= lastTok) {
            if (t > k) { buf(w) = ' '; w += 1 }
            val tl = ends(t) - starts(t)
            System.arraycopy(bytes, starts(t), buf, w, tl)
            w += tl
            t += 1
          }
          out(k) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, w, 42L)
        }
      }
      k += 1
    }
    // sort + dedup in place (explode order is irrelevant downstream)
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  /** Register `shingle_hashes` in the session's function registry. */
  def register(spark: SparkSession): Unit = if (!spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hashes")))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashesExpr(exprs.head, exprs(1)),
      "built-in")

  /** Column API: distinct 64-bit shingle hashes of a text column. */
  def shingleHashes(text: Column, n: Column): Column = {
    register(SparkSession.active)
    call_function("shingle_hashes", text, n)
  }
}

case class ShingleHashesExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(text: Any, n: Any): Any =
    ShingleHashes.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.expressions.ShingleHashes.compute($t, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
