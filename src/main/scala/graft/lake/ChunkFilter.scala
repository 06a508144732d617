package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword chunk filter — the engine's "predicate pushdown for LLM
  * cost" (`filter_file2chunks`, `profiler_utils.py:364-417`).
  *
  * Per (doc, attribute): prefer chunks literally containing the
  * attribute (case-insensitive); fall back to a space-stripped match;
  * fall back to the top-2 chunks by per-word hit count; keep at most
  * `cap` chunks per doc; drop the attribute entirely if no doc has a
  * candidate chunk.
  *
  * Shape: chunks ⨯ attributes. The attribute set is tiny (≤50 in the
  * reference) so the cross join is a broadcast nested loop — the big
  * side streams once, no shuffle. Ranking is a window per
  * (doc, attribute), partitioned on the same key the downstream
  * extraction groups on, so the exchange is reused.
  */
object ChunkFilter {

  /** attrs: one-column DataFrame ("attribute"). Input chunks:
    * (idCol, chunk_id, chunk). Output: (idCol, attribute, chunk_id,
    * chunk, match_tier, word_hits).
    */
  def keywordChunkFilter(chunks: DataFrame, attrs: DataFrame, idCol: String, cap: Int = 2): DataFrame = {
    val lowered  = lower(col("chunk"))
    val attrLc   = lower(col("attribute"))
    val squashed = regexp_replace(lowered, " ", "")
    val attrSq   = regexp_replace(attrLc, " ", "")

    val scored = chunks
      .crossJoin(broadcast(attrs))
      .withColumn(
        "word_hits",
        size(filter(split(attrLc, " "), w => lowered.contains(w))))
      .withColumn(
        "match_tier",
        when(lowered.contains(attrLc), 0)
          .when(squashed.contains(attrSq), 1)
          .when(col("word_hits") > 0, 2)
          .otherwise(3))
      .filter(col("match_tier") < 3)

    val w = Window
      .partitionBy(col(idCol), col("attribute"))
      .orderBy(col("match_tier").asc, col("word_hits").desc, col("chunk_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .drop("rn")
  }

  /** Schema-field literal-appearance filter
    * (`schema_identification.py:69-85`): keep an LLM-proposed field
    * only if one of 4 spelling variants appears in the chunk it was
    * proposed from. fields: (idCol, chunk, field, value).
    */
  def schemaFieldFilter(fields: DataFrame): DataFrame = {
    val chunkLc = lower(col("chunk"))
    val f       = lower(col("field"))
    val variants = array(
      f,
      regexp_replace(f, " ", ""),
      regexp_replace(f, "-", " "),
      regexp_replace(f, "_", " "))
    fields
      .filter(col("value").isNotNull && length(trim(col("value"))) > 0)
      .filter(exists(variants, v => chunkLc.contains(v)))
  }
}
