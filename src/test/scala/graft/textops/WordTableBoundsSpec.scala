package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The (minFreq, maxWords) word-table cut that makes the tokenizer
  * trainers' driver-side collect safe at web scale: the uncut
  * distinct-"word" table of 100 TB of text is billions of rows of
  * URL/hash/hapax noise, so every production trainer applies a
  * frequency floor first. Contract proven here, per trainer:
  * a non-binding cut is bit-identical to uncut, and a binding cut
  * equals training on the equivalently-filtered corpus.
  */
class WordTableBoundsSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich fixture: low×5, lower×2, newest×6, widest×3 (4 distinct words)
  private val corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  // the same hot words plus a long unique-hapax tail over a disjoint
  // alphabet — minFreq=2 must erase the tail exactly
  private def hapaxHeavy(nHapax: Int) = {
    val hapaxes = spark.range(nHapax).select(
      (col("id") + 10L).as("doc_id"),
      concat(lit("zq"), col("id").cast("string"), lit("x")).as("text"))
    corpus.union(hapaxes)
  }

  test("WordTables.bounded: frequency floor + TakeOrdered top-N, deterministic ties") {
    val wc = WordTables.counts(corpus, "text", Curation.toks)
    // floor: lower(2) survives minFreq=2, nothing else drops
    assert(WordTables.bounded(wc, 2L, Int.MaxValue).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("low", "lower", "newest", "widest"))
    assert(WordTables.bounded(wc, 3L, Int.MaxValue).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("low", "newest", "widest"))
    // top-N by (c desc, w asc): newest(6), low(5), widest(3)
    val top3 = WordTables.bounded(wc, 1L, 3)
    assert(top3.collect().map(_.getString(0)).sorted.toSeq == Seq("low", "newest", "widest"))
    // the cap is a TakeOrdered, not a materialized global sort
    val plan = top3.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$plan")
    // maxWords = MaxValue short-circuits: no sort sneaks in at all
    val uncut = WordTables.bounded(wc, 1L, Int.MaxValue).queryExecution.executedPlan.toString
    assert(!uncut.contains("Sort"), s"uncut path must not sort:\n$uncut")
  }

  test("Bpe: non-binding cut is bit-identical; minFreq erases the hapax tail exactly") {
    val uncut = Bpe.learnMerges(corpus, "text", k = 5).collect().map(_.toSeq).toSeq
    // maxWords == exact distinct-word count exercises the TakeOrdered
    // path without binding
    val nb = Bpe.learnMerges(corpus, "text", k = 5, minFreq = 1L, maxWords = 4)
      .collect().map(_.toSeq).toSeq
    assert(nb == uncut)
    val cut = Bpe.learnMerges(hapaxHeavy(200), "text", k = 5, minFreq = 2L)
      .collect().map(_.toSeq).toSeq
    assert(cut == uncut, "minFreq=2 on hot+hapax must equal uncut on hot alone")
  }

  test("Bpe: binding maxWords equals training on the top-N word sub-corpus") {
    // top-2 by (c desc, w asc) = newest(6), low(5)
    val sub = Seq((1L, (Seq.fill(6)("newest") ++ Seq.fill(5)("low")).mkString(" ")))
      .toDF("doc_id", "text")
    val capped = Bpe.learnMerges(corpus, "text", k = 6, minFreq = 1L, maxWords = 2)
      .collect().map(_.toSeq).toSeq
    val direct = Bpe.learnMerges(sub, "text", k = 6).collect().map(_.toSeq).toSeq
    assert(capped == direct)
  }

  test("WordPiece: non-binding cut bit-identical; minFreq erases the hapax tail") {
    val uncut = WordPiece.learnMerges(corpus, "text", k = 5).collect().map(_.toSeq).toSeq
    val nb = WordPiece.learnMerges(corpus, "text", k = 5, minFreq = 1L, maxWords = 4)
      .collect().map(_.toSeq).toSeq
    assert(nb == uncut)
    val cut = WordPiece.learnMerges(hapaxHeavy(200), "text", k = 5, minFreq = 2L)
      .collect().map(_.toSeq).toSeq
    assert(cut == uncut)
    // vocabulary() threads the same bounds: no zq/x hapax chars leak in
    val vocab = WordPiece.vocabulary(hapaxHeavy(200), "text", k = 3, minFreq = 2L)
    assert(vocab == WordPiece.vocabulary(corpus, "text", k = 3))
    assert(!vocab.exists(p => p.contains("z") || p.contains("q")))
  }

  test("Unigram: non-binding cut bit-identical; minFreq erases the hapax tail") {
    val uncut = Unigram.train(corpus, "text", vocabSize = 8, maxLen = 4, seedSize = 20)
    val nb = Unigram.train(corpus, "text", vocabSize = 8, maxLen = 4, seedSize = 20,
      minFreq = 1L, maxWords = 4)
    assert(nb == uncut)
    val cut = Unigram.train(hapaxHeavy(200), "text", vocabSize = 8, maxLen = 4, seedSize = 20,
      minFreq = 2L)
    assert(cut == uncut)
  }

  test("hapax-heavy corpus trains under a bounded driver footprint") {
    // 5000 unique hapaxes drown the 4 hot words; maxWords=4 keeps the
    // driver-side table at 4 rows regardless of tail size, and the
    // trained merges equal the hot-only run — the cut IS the safety
    // property, result-checked rather than heap-probed
    val big = hapaxHeavy(5000)
    val t0  = System.nanoTime()
    val capped = Bpe.learnMerges(big, "text", k = 5, minFreq = 1L, maxWords = 4)
      .collect().map(_.toSeq).toSeq
    val sec = (System.nanoTime() - t0) / 1e9
    assert(capped == Bpe.learnMerges(corpus, "text", k = 5).collect().map(_.toSeq).toSeq)
    assert(sec < 30.0, s"bounded training took $sec s")
  }

  test("learnMergesIterative honors the same bounds (escape-hatch parity)") {
    val fast = Bpe.learnMerges(hapaxHeavy(100), "text", k = 4, minFreq = 2L)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    val slow = Bpe.learnMergesIterative(hapaxHeavy(100), "text", k = 4, minFreq = 2L)
      .orderBy("rank").collect().map(_.toSeq).toSeq
    assert(fast == slow)
  }
}
