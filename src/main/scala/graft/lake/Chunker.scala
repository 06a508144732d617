package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document → ordered chunks.
  *
  * The reference chunks each document into ≤chunk_size-char pieces
  * (dispatch `profiler_utils.py:200-214`; txt path `:309-344`; html
  * path `:255-305`) as a driver-side Python loop per file. Here a
  * document is one row and chunking is a per-row array expression, so
  * the operator is embarrassingly parallel — no shuffle, survives any
  * scale-up, and Catalyst prunes `text` out of scans that don't chunk.
  */
object Chunker {

  /** Fixed-width character chunking — the deterministic, oracle-
    * checkable shape. Emits (idCol, chunk_id, chunk); every doc emits
    * at least one chunk (possibly empty text).
    */
  def chunkFixed(docs: DataFrame, idCol: String, textCol: String, chunkSize: Int): DataFrame = {
    val nChunks = greatest(ceil(length(col(textCol)) / lit(chunkSize.toDouble)).cast("int"), lit(1))
    docs
      .select(col(idCol), col(textCol), explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        col(textCol).substr(col("chunk_id") * chunkSize + 1, lit(chunkSize)).as("chunk"))
  }

  /** Hierarchical text chunking with greedy repacking — reference
    * parity (`profiler_utils.py:309-344`): split on "\n", re-split
    * any piece still longer than chunkSize on ". ", then ", ", then
    * greedily pack consecutive pieces into chunks ≤ chunkSize.
    * Pure per-row function; registered as a Scala UDF (one call per
    * document, array-returning — the loop is over a single doc's
    * pieces, not the lake).
    */
  def splitText(text: String, chunkSize: Int): Seq[String] = {
    if (text == null || text.isEmpty) return Seq("")
    def resplit(pieces: Seq[String], sep: String): Seq[String] =
      pieces.flatMap { p =>
        if (p.length <= chunkSize) Seq(p)
        else {
          val parts = p.split(java.util.regex.Pattern.quote(sep), -1)
          // re-attach the separator to all but the last part so no
          // characters are lost (reference keeps separators implicit;
          // we keep content lossless for downstream extraction)
          parts.zipWithIndex.map { case (s, i) => if (i < parts.length - 1) s + sep else s }.toSeq
        }
      }
    var pieces: Seq[String] = text.split("\n", -1).toSeq
    pieces = resplit(pieces, ". ")
    pieces = resplit(pieces, ", ")
    // any piece still over chunkSize gets hard-wrapped
    pieces = pieces.flatMap(p => if (p.length <= chunkSize) Seq(p) else p.grouped(chunkSize).toSeq)
    // greedy repack; newline separator preserves the line structure
    // that line-anchored extractors (FieldLine) depend on
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    pieces.foreach { p =>
      if (cur.nonEmpty && cur.length + 1 + p.length > chunkSize) {
        out += cur.toString
        cur.clear()
      }
      if (cur.nonEmpty) cur.append('\n')
      cur.append(p)
    }
    if (cur.nonEmpty || out.isEmpty) out += cur.toString
    out.toSeq
  }

  /** Hierarchical chunker as a DataFrame op: (idCol, chunk_id, chunk). */
  def chunkText(docs: DataFrame, idCol: String, textCol: String, chunkSize: Int): DataFrame = {
    val f = udf((t: String) => splitText(t, chunkSize))
    docs
      .select(col(idCol), posexplode(f(col(textCol))).as(Seq("chunk_id", "chunk")))
  }

  /** HTML chunking (`profiler_utils.py:255-305`, minus its undefined
    * `use_raw_text` bug — documented, not replicated): drop script/
    * style/svg subtrees and style/meta tag attributes, split into
    * lines, re-split lines still over chunkSize on "><" boundaries,
    * then greedily pack like the text path.
    */
  def splitHtml(html: String, chunkSize: Int): Seq[String] = {
    if (html == null || html.isEmpty) return Seq("")
    val noBlocks = html.replaceAll("(?is)<(script|style|svg)\\b[^>]*>.*?</(script|style|svg)>", " ")
    val noAttrs  = noBlocks.replaceAll("(?i)\\s(style|class|id)\\s*=\\s*(\"[^\"]*\"|'[^']*')", "")
    var pieces: Seq[String] = noAttrs.split("\n", -1).toSeq
    pieces = pieces.flatMap { p =>
      if (p.length <= chunkSize) Seq(p)
      else p.split("(?<=>)(?=<)").toSeq // break between adjacent tags
    }
    pieces = pieces.map(_.trim).filter(_.nonEmpty)
    if (pieces.isEmpty) return Seq("")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    pieces.foreach { p =>
      if (cur.nonEmpty && cur.length + 1 + p.length > chunkSize) { out += cur.toString; cur.clear() }
      if (cur.nonEmpty) cur.append('\n')
      cur.append(p)
    }
    if (cur.nonEmpty || out.isEmpty) out += cur.toString
    out.toSeq
  }

  /** HTML chunker as a DataFrame op: (idCol, chunk_id, chunk). */
  def chunkHtml(docs: DataFrame, idCol: String, textCol: String, chunkSize: Int): DataFrame = {
    val f = udf((t: String) => splitHtml(t, chunkSize))
    docs.select(col(idCol), posexplode(f(col(textCol))).as(Seq("chunk_id", "chunk")))
  }

  /** Format-dispatching chunker (`profiler_utils.py:200-214`): html
    * suffixes go through the html path, everything else text. The
    * dispatch happens per ROW inside one UDF — a filter-per-format
    * union would scan the lake once per format, and this operator
    * sits at the head of every profiler run.
    */
  def chunkAuto(docs: DataFrame, idCol: String, pathCol: String, textCol: String, chunkSize: Int): DataFrame = {
    val f = udf((path: String, t: String) =>
      if (path != null && path.toLowerCase.matches(".*\\.(html?|xhtml)$")) splitHtml(t, chunkSize)
      else splitText(t, chunkSize))
    docs.select(col(idCol), posexplode(f(col(pathCol), col(textCol))).as(Seq("chunk_id", "chunk")))
  }

  /** Chunk trimming on context overflow (`trim_chunks`,
    * `profiler.py:413-439`): keep a `window`-token span ending at the
    * attribute occurrence; if the attribute is absent, the
    * best `window`-token mini-chunk by attribute-token hits.
    */
  def trimChunk(chunk: Column, attribute: Column, window: Int = 50): Column = {
    val f = udf((c: String, a: String) => {
      if (c == null) ""
      else {
        val toks   = c.split("\\s+").filter(_.nonEmpty)
        if (toks.length <= window) c
        else {
          val aLc  = if (a == null) "" else a.toLowerCase
          val pos  = toks.indexWhere(t => aLc.nonEmpty && t.toLowerCase.contains(aLc.split(" ").head))
          if (pos >= 0) {
            val from = math.max(pos - (window - 1) / 2, 0)
            toks.slice(from, math.min(from + window, toks.length)).mkString(" ")
          } else {
            val attrToks = aLc.split(" ").filter(_.nonEmpty).toSet
            val best = toks.sliding(window, window).maxBy(w => w.count(t => attrToks.exists(t.toLowerCase.contains)))
            best.mkString(" ")
          }
        }
      }
    })
    f(chunk, attribute)
  }

  /** Keep only the first k chunks of each doc (`run_profiler.py:48-49`). */
  def capChunks(chunks: DataFrame, k: Int): DataFrame =
    chunks.filter(col("chunk_id") < k)

  /** Dynamic backoff (`schema_identification.py:26-28,43-44`): keep
    * chunks with chunk_id ≤ mean+stddev of chunks-per-doc. The stats
    * are a tiny two-row reduction broadcast back into the filter —
    * one extra pass over chunk ids only, no wide shuffle.
    */
  def dynamicBackoff(chunks: DataFrame, idCol: String): DataFrame = {
    val stats = chunks
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n"))
      .agg((avg(col("n")) + coalesce(stddev_samp(col("n")), lit(0.0))).as("cutoff"))
    chunks.join(broadcast(stats), col("chunk_id") <= col("cutoff")).drop("cutoff")
  }
}
