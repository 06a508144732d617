package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer) — the third of the tokenizer trio next to [[Bpe]]
  * (frequency-merge) and [[Unigram]] (prune-down LM): WordPiece
  * merges like BPE but scores a candidate pair by the unigram-LM
  * likelihood GAIN score(a,b) = count(ab) / (count(a)·count(b)),
  * so a pair of individually-rare symbols that always co-occur
  * merges before a pair of ubiquitous ones ("##u" after "q" long
  * before "e" after "th"). Word-internal continuation symbols carry
  * the standard "##" prefix; merging strips the rhs marker
  * ("a" + "##b" → "ab", "##a" + "##b" → "##ab").
  *
  * Execution shape mirrors [[Bpe]]: the corpus contributes ONE
  * aggregation (the word-frequency table, vocabulary-bounded); the
  * merge loop is driver-side incremental math over that table, and
  * encoding is a stateless per-row projection (greedy
  * longest-match-first against a broadcast vocabulary).
  */
object WordPiece {

  private def toks(text: Column): Column = Curation.toks(text)

  /** WordPiece symbol array of a word: first char plain, every
    * following char "##"-prefixed.
    */
  private def wpSymbols(w: Column): Column =
    transform(
      filter(split(w, ""), s => length(s) > 0),
      (s, i) => when(i === 0, s).otherwise(concat(lit("##"), s)))

  /** Corpus word-frequency table → (c, sym). The ONLY corpus-scale
    * aggregation in WordPiece training. `minFreq`/`maxWords` cut the
    * table BEFORE any collect ([[WordTables.bounded]]); defaults
    * reproduce the uncut table exactly.
    */
  private def wordTable(
      df: DataFrame,
      textCol: String,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): DataFrame =
    WordTables
      .bounded(WordTables.counts(df, textCol, toks), minFreq, maxWords)
      .select(col("c"), wpSymbols(col("w")).as("sym"))

  /** Iteration-0 pair scores — the oracle-checkable face of the
    * learner: weighted adjacent-pair counts and per-symbol counts
    * from the word table, score emitted as the LOG-likelihood gain
    * llg = ln c_ab − ln c_a − ln c_b (raw scores underflow 6-decimal
    * output at corpus counts; ln is order-preserving). Top-`topK`
    * by (rounded llg desc, lhs, rhs) — rounded sort keys keep the
    * LIMIT boundary engine-independent.
    *
    * Scale: everything below the word-table aggregation is
    * vocab-sized; the top-k is a TakeOrdered.
    */
  def pairScores(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val words = wordTable(df, textCol)
    val pairs = words
      .filter(size(col("sym")) >= 2)
      .select(
        col("c"),
        explode(
          zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("c")).as("pf"))
    val syms = words
      .select(col("c"), explode(col("sym")).as("s"))
      .groupBy(col("s"))
      .agg(sum(col("c")).as("sf"))
    pairs
      .join(syms.select(col("s").as("lhs"), col("sf").as("sf_l")), Seq("lhs"))
      .join(syms.select(col("s").as("rhs"), col("sf").as("sf_r")), Seq("rhs"))
      .select(
        col("lhs"),
        col("rhs"),
        col("pf").cast("bigint").as("pair_freq"),
        round(log(col("pf")) - log(col("sf_l")) - log(col("sf_r")), 6).as("llg"))
      .orderBy(desc("llg"), col("lhs"), col("rhs"))
      .limit(topK)
  }

  private def mergedSymbol(a: String, b: String): String =
    a + b.stripPrefix("##")

  private def mergeOnce(sym: Seq[String], a: String, b: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var i   = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        buf += mergedSymbol(a, b); i += 2
      } else { buf += sym(i); i += 1 }
    }
    buf.toSeq
  }

  /** Learn `k` WordPiece merges; returns (rank, lhs, rhs, merged,
    * pair_freq). Deterministic argmax: likelihood score desc (exact
    * rational compare p1·s2l·s2r vs p2·s1l·s1r over BigInt — no
    * float rounding in the training path), then (lhs, rhs) asc.
    *
    * Same split as [[Bpe.learnMerges]]: the word table is collected
    * once, the merge loop maintains pair counts AND symbol counts
    * incrementally on the driver — exact deltas, a recount at any
    * step would match. `minFreq`/`maxWords` bound the collect (the
    * frequency floor every production trainer applies; the uncut
    * distinct-word table of a web-scale corpus is driver-fatal).
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      k: Int,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val table  = wordTable(df, textCol, minFreq, maxWords).collect()
    val counts = table.map(_.getLong(0))
    val words  = table.map(_.getSeq[String](1).toArray)
    learnFromTable(counts, words, k).toDF("rank", "lhs", "rhs", "merged", "pair_freq")
  }

  private[textops] def learnFromTable(
      counts: Array[Long],
      words: Array[Array[String]],
      k: Int): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val syms      = words.map(w => mutable.ArrayBuffer.from(w))
    val pairFreq  = mutable.HashMap.empty[(String, String), Long]
    val symFreq   = mutable.HashMap.empty[String, Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def apply(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length) {
        val nf = symFreq.getOrElse(s(j), 0L) + sign * counts(i)
        if (nf == 0L) symFreq.remove(s(j)) else symFreq.update(s(j), nf)
        if (j + 1 < s.length) {
          val p  = (s(j), s(j + 1))
          val pf = pairFreq.getOrElse(p, 0L) + sign * counts(i)
          if (pf == 0L) pairFreq.remove(p) else pairFreq.update(p, pf)
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
          else
            // prune the inverted index on unregister: without this,
            // every merge's "affected" set includes every word that
            // EVER held the pair (a guaranteed-no-op rewrite cycle
            // each), and the index grows with history, not state
            pairWords.get(p).foreach { s0 =>
              s0 -= i
              if (s0.isEmpty) pairWords.remove(p)
            }
        }
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { apply(i, 1L); i += 1 }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank   = 1
    while (rank <= k && pairFreq.nonEmpty) {
      // argmax score = pf/(sf_l·sf_r), compared exactly as cross
      // products (pf1·sl2·sr2 vs pf2·sl1·sr1) in BigInt
      var best: (String, String) = null
      var bPf, bSl, bSr          = 0L
      pairFreq.foreachEntry { (p, f) =>
        val sl = symFreq(p._1)
        val sr = symFreq(p._2)
        val better =
          if (best == null) true
          else {
            val cmp = (BigInt(f) * bSl * bSr).compare(BigInt(bPf) * sl * sr)
            cmp > 0 || (cmp == 0 &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
          }
        if (better) { best = p; bPf = f; bSl = sl; bSr = sr }
      }
      merges += ((rank, best._1, best._2, mergedSymbol(best._1, best._2), bPf))
      val affected = pairWords.getOrElse(best, mutable.HashSet.empty).toArray
      var a = 0
      while (a < affected.length) {
        val wid = affected(a)
        apply(wid, -1L)
        val merged = mergeOnce(syms(wid).toSeq, best._1, best._2)
        syms(wid).clear()
        syms(wid) ++= merged
        apply(wid, 1L)
        a += 1
      }
      pairWords.remove(best)
      rank += 1
    }
    merges.toSeq
  }

  /** Full vocabulary after `k` merges: every surviving initial
    * symbol plus every merged piece, deterministic order (initial
    * symbols lexicographic, then merges in rank order).
    */
  def vocabulary(
      df: DataFrame,
      textCol: String,
      k: Int,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): Seq[String] = {
    val table  = wordTable(df, textCol, minFreq, maxWords).collect()
    val chars  = table.flatMap(_.getSeq[String](1)).distinct.sorted
    val merges = learnFromTable(table.map(_.getLong(0)), table.map(_.getSeq[String](1).toArray), k)
    (chars ++ merges.map(_._4)).distinct.toSeq
  }

  /** Encode text with a learned vocabulary: per word, greedy
    * longest-match-first (the published WordPiece inference — NOT
    * merge-replay): take the longest vocab piece prefixing the
    * remainder ("##"-prefixed after the first), emit, repeat; a
    * position with no match makes the whole word `unk`. A pure
    * projection — the vocabulary ships in the closure, the corpus
    * never shuffles.
    */
  def encode(textCol: Column, vocab: Seq[String], unk: String = "[UNK]"): Column = {
    val vset   = vocab.toSet
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.stripPrefix("##").length).max
    val enc = udf((text: String) => {
      val ws = if (text == null) Array.empty[String] else text.split(" ").filter(_.nonEmpty)
      ws.flatMap { w =>
        val out  = scala.collection.mutable.ArrayBuffer[String]()
        var pos  = 0
        var dead = false
        while (pos < w.length && !dead) {
          val prefix = if (pos == 0) "" else "##"
          var len    = math.min(maxLen, w.length - pos)
          var hit    = -1
          while (len >= 1 && hit < 0) {
            if (vset.contains(prefix + w.substring(pos, pos + len))) hit = len
            len -= 1
          }
          if (hit < 0) dead = true
          else { out += prefix + w.substring(pos, pos + hit); pos += hit }
        }
        if (dead) Seq(unk) else out.toSeq
      }.toSeq
    })
    enc(textCol)
  }
}
