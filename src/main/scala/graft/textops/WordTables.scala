package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared corpus → word-frequency-table stage for the tokenizer
  * trainers ([[Bpe]], [[WordPiece]], [[Unigram]]) — the ONE
  * corpus-scale aggregation each of them runs, plus the bounding
  * step that makes the subsequent driver-side collect safe at scale.
  *
  * Why bounding exists: the distinct-"word" table of a web-scale
  * corpus is NOT vocabulary-bounded in practice — URLs, hex hashes,
  * and hapax noise push it to billions of rows at 100 TB, so an
  * uncut `collect()` kills the driver before training starts. Every
  * production trainer cuts first (HuggingFace tokenizers'
  * `min_frequency`, SentencePiece's seed pruning); we expose the
  * same two knobs:
  *
  *   - `minFreq`  — drop words seen fewer than `minFreq` times (the
  *     frequency floor; kills the hapax tail, which carries ~zero
  *     merge/EM signal by construction).
  *   - `maxWords` — keep only the `maxWords` most frequent words
  *     (hard driver-memory bound; TakeOrdered, no global sort
  *     materialized). Deterministic tie-break on the word itself.
  *
  * Defaults (1, unbounded) reproduce the uncut table exactly, so
  * small-corpus results are bit-identical unless a caller opts in.
  */
private[textops] object WordTables {

  /** Raw (w, c) word-frequency table — one explode + one keyed
    * aggregation with map-side combine; the only corpus scan.
    */
  def counts(df: DataFrame, textCol: String, toks: Column => Column): DataFrame =
    df.select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))

  /** Apply the (minFreq, maxWords) cut. `maxWords = Int.MaxValue`
    * skips the TakeOrdered entirely (no global sort sneaks in via
    * EliminateLimits on a limit >= row count).
    */
  def bounded(wc: DataFrame, minFreq: Long, maxWords: Int): DataFrame = {
    require(minFreq >= 1L, s"minFreq must be >= 1, got $minFreq")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val floored = if (minFreq > 1L) wc.filter(col("c") >= minFreq) else wc
    if (maxWords == Int.MaxValue) floored
    else floored.orderBy(desc("c"), col("w")).limit(maxWords)
  }
}
