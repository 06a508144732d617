package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram algorithm, the other
  * public subword recipe next to [[Bpe]]). Variant notes: this is
  * the hard-EM (Viterbi) formulation with probability-ranked
  * pruning — the standard reimplementation simplification of Kudo's
  * expected-count EM + loss-ranked pruning; segmentations it
  * produces are argmax-consistent with the model it trains.
  *
  * Execution shape (the [[Bpe.learnMerges]] split): the corpus
  * contributes ONE aggregation — the word-frequency table, bounded
  * by the vocabulary, not the corpus — plus a vocab-bounded
  * substring aggregation for the seed candidates
  * ([[seedPieceStats]], the oracle-checkable distributed face). The
  * EM/prune loop then runs driver-side over the collected word
  * table: at 100 TB the corpus is read once, and no EM iteration
  * ever re-touches it.
  */
object Unigram {

  private def toks(text: Column): Column = Curation.toks(text)

  /** Corpus word-frequency table — the single corpus-scale
    * aggregation of unigram training. `minFreq`/`maxWords` cut the
    * table BEFORE any collect ([[WordTables.bounded]] — the
    * SentencePiece seed-pruning analogue); defaults reproduce the
    * uncut table exactly.
    */
  private def wordTable(
      df: DataFrame,
      textCol: String,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): DataFrame =
    WordTables.bounded(WordTables.counts(df, textCol, toks), minFreq, maxWords)

  /** Seed-piece candidate statistics — every substring of every word
    * up to `maxLen` characters, weighted by word frequency (each
    * occurrence position counts), top-`topK` by (freq desc, piece).
    * The oracle-gated distributed stage: one corpus aggregation to
    * the word table, then an in-row HOF substring expansion over the
    * vocab-bounded relation (fan-out ≤ len·maxLen per DISTINCT word,
    * never per corpus token) and one keyed aggregation.
    */
  def seedPieceStats(df: DataFrame, textCol: String, maxLen: Int, topK: Int): DataFrame = {
    require(maxLen >= 1 && topK >= 1, s"need maxLen/topK >= 1, got $maxLen/$topK")
    val pieces = flatten(
      transform(
        sequence(lit(0), length(col("w")) - 1),
        s =>
          transform(
            sequence(lit(1), least(lit(maxLen), length(col("w")) - s)),
            l => col("w").substr(s + 1, l))))
    wordTable(df, textCol)
      .select(col("c"), explode(pieces).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("c")).cast("bigint").as("freq"))
      .orderBy(desc("freq"), col("piece"))
      .limit(topK)
  }

  /** Viterbi segmentation of one word under piece log-probs:
    * best-scoring split, ties to FEWER pieces then to the
    * lexicographically smaller final piece (deterministic).
    * Characters absent from the vocabulary segment as themselves at
    * `unkLogp`, so segmentation never fails.
    */
  def segment(word: String, logp: Map[String, Double], unkLogp: Double = -100.0): Seq[String] =
    segmentBounded(word, logp, unkLogp, maxPieceLen(logp))

  /** [[segment]] with the vocabulary's max piece length precomputed —
    * the EM loop calls this once per (word, iteration) and must not
    * re-scan the vocabulary each time.
    */
  private def segmentBounded(
      word: String,
      logp: Map[String, Double],
      unkLogp: Double,
      maxL: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    // (score, nPieces, lastPiece) per prefix end; MaxValue = unreached
    val best  = Array.fill(n + 1)((Double.NegativeInfinity, Int.MaxValue, ""))
    val back  = Array.fill(n + 1)(-1)
    best(0) = (0.0, 0, "")
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxL)
      while (j < i) {
        if (best(j)._2 != Int.MaxValue) {
          val piece = word.substring(j, i)
          val lp    = logp.getOrElse(piece, if (piece.length == 1) unkLogp else Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity) {
            val cand = (best(j)._1 + lp, best(j)._2 + 1, piece)
            val cur  = best(i)
            val better = cand._1 > cur._1 ||
              (cand._1 == cur._1 && (cand._2 < cur._2 ||
                (cand._2 == cur._2 && cand._3 < cur._3)))
            if (better) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverse.toSeq
  }

  private def maxPieceLen(logp: Map[String, Double]): Int =
    if (logp.isEmpty) 1 else math.max(1, logp.keysIterator.map(_.length).max)

  /** Train a unigram-LM piece vocabulary toward `vocabSize` entries.
    * Returns (piece, logp) sorted by (logp desc, piece) —
    * single-character pieces are always retained (full coverage:
    * if the corpus has more distinct characters than `vocabSize`,
    * the result holds all of them and exceeds the target rather
    * than losing coverage), multi-character pieces are
    * EM-reestimated and pruned probability-ranked to the target.
    *
    * The corpus is touched exactly once (the word table); everything
    * after `collect()` of that bounded table is driver math, the same
    * split [[Bpe.learnMerges]] uses. `minFreq`/`maxWords` bound the
    * collect — at web scale the uncut distinct-word table is
    * driver-fatal, so real runs must set at least one of them
    * (SentencePiece equivalently prunes its seed before training).
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxLen: Int = 8,
      seedSize: Int = 1000,
      emIters: Int = 2,
      pruneFrac: Double = 0.2,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): Seq[(String, Double)] = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(pruneFrac > 0 && pruneFrac < 1, "pruneFrac must be in (0,1)")
    val words: Seq[(String, Long)] = wordTable(df, textCol, minFreq, maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
      .sortBy(_._1) // stable driver-side iteration order

    // seed candidates: substring counts (driver replay of
    // seedPieceStats over the same bounded table)
    val subCounts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, c) =>
      var s = 0
      while (s < w.length) {
        var l = 1
        while (l <= math.min(maxLen, w.length - s)) {
          val p = w.substring(s, s + l)
          subCounts(p) = subCounts.getOrElse(p, 0L) + c
          l += 1
        }
        s += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toSeq.sorted
    val multi = subCounts.toSeq
      .filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.size))
      .map(_._1)
    var vocab: Map[String, Double] = normalize(
      (chars ++ multi).map(p => p -> subCounts(p).toDouble).toMap)

    def emPass(): Unit = {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      val maxL   = maxPieceLen(vocab)
      words.foreach { case (w, c) =>
        segmentBounded(w, vocab, -100.0, maxL)
          .foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      // +1 smoothing on required single chars keeps coverage; unused
      // multi-char pieces die (count 0 -> dropped)
      val next = vocab.keysIterator.flatMap { p =>
        val c = counts.getOrElse(p, 0L) + (if (p.length == 1) 1L else 0L)
        if (c > 0) Some(p -> c.toDouble) else None
      }.toMap
      vocab = normalize(next)
    }

    (0 until emIters).foreach(_ => emPass())
    // prune multi-char pieces only: single characters are the
    // coverage floor and are NEVER dropped, so when vocabSize is
    // below the corpus character count the result keeps all
    // characters (size = #chars > vocabSize) rather than losing
    // coverage silently
    var prunable = true
    while (vocab.size > vocabSize && prunable) {
      val multiNow = vocab.toSeq.filter(_._1.length > 1)
      if (multiNow.isEmpty) prunable = false
      else {
        val excess = vocab.size - vocabSize
        val nDrop  = math.max(1, math.min(excess, math.ceil(multiNow.size * pruneFrac).toInt))
        val drop   = multiNow.sortBy { case (p, lp) => (lp, p) }.take(nDrop).map(_._1).toSet
        // normalize takes POSITIVE weights — exp the log-probs back
        vocab = normalize(
          vocab.collect { case (p, lp) if !drop(p) => p -> math.exp(lp) })
        emPass()
      }
    }
    vocab.toSeq.sortBy { case (p, lp) => (-lp, p) }
  }

  private def normalize(weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty, "empty piece set")
    // weights arrive as counts (first round) or probs (later) — both
    // positive in log space after dividing by the total
    val total = weights.valuesIterator.sum
    weights.map { case (p, w) => p -> math.log(w / total) }
  }

  /** Encode a text column: whitespace tokens, each Viterbi-segmented
    * under the trained pieces, flattened to ARRAY<STRING>. Per-row
    * scalar work against a broadcast-closure vocabulary — the same
    * shuffle-free shape as [[Bpe.encode]]; a UDF because the DP is
    * genuinely inexpressible in built-ins.
    */
  def encode(textCol: Column, pieces: Seq[(String, Double)]): Column = {
    val logp = pieces.toMap
    // vocabulary max piece length hoisted OUT of the per-row path —
    // segment() would re-scan every vocab key per word
    val maxL = maxPieceLen(logp)
    val seg = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else
        text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => segmentBounded(w, logp, -100.0, maxL)).toSeq
    }
    seg(textCol)
  }
}
