package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as dataflow (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — the public BPE recipe every modern tokenizer descends
  * from). The part that touches the corpus is ONE aggregation: BPE
  * learns from the word-frequency TABLE, whose size is the
  * vocabulary (bounded), not the corpus. Every merge iteration then
  * runs over that vocab-sized relation: explode weighted symbol
  * pairs → one keyed aggregation → TakeOrdered(1) → rewrite the
  * symbol arrays with the chosen pair. At 100 TB the corpus is read
  * once; the k iterations never re-touch it.
  *
  * Word-internal pairs only (no end-of-word marker — documented
  * simplification; the marker is one extra symbol appended in
  * `symbols` if a deployment wants it).
  */
object Bpe {

  private def toks(text: Column): Column = Curation.toks(text)

  /** Per-character symbol array of a word (split("") emits a
    * trailing empty under Spark's -1 limit — filtered).
    */
  private def symbols(w: Column): Column =
    filter(split(w, ""), s => length(s) > 0)

  /** Corpus word-frequency table → (c, sym) relation the learner
    * iterates on. The ONLY corpus-scale aggregation in BPE training.
    * `minFreq`/`maxWords` cut the table BEFORE any collect (see
    * [[WordTables.bounded]] for why the uncut table is unsafe at
    * web scale); defaults reproduce the uncut table exactly.
    */
  private def wordTable(
      df: DataFrame,
      textCol: String,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): DataFrame =
    WordTables
      .bounded(WordTables.counts(df, textCol, toks), minFreq, maxWords)
      .select(col("c"), symbols(col("w")).as("sym"))

  /** Weighted adjacent-symbol-pair counts of a (c, sym) word table.
    * Pairs come from an in-row zip of the array against itself —
    * no window, one keyed aggregation with map-side combine.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("sym")) >= 2)
      .select(
        col("c"),
        explode(
          zip_with(
            slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("c")).as("freq"))

  /** Initial (iteration-0) pair statistics — the oracle-checkable
    * face of the learner: top-`topK` weighted character pairs,
    * ties broken lexicographically.
    */
  def pairStats(df: DataFrame, textCol: String, topK: Int): DataFrame =
    pairCounts(wordTable(df, textCol))
      .select(col("lhs"), col("rhs"), col("freq").cast("bigint").as("freq"))
      .orderBy(desc("freq"), col("lhs"), col("rhs"))
      .limit(topK)

  /** Greedy left-to-right rewrite of one symbol array under a single
    * merge rule (a, b) → a+b ("a a a" under (a,a) → ["aa", "a"]).
    */
  private def mergeOnce(sym: Seq[String], a: String, b: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var i   = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) { buf += (a + b); i += 2 }
      else { buf += sym(i); i += 1 }
    }
    buf.toSeq
  }

  /** Learn `k` BPE merges. Returns (rank, lhs, rhs, freq) — freq is
    * the weighted pair count at the time of the merge. Deterministic:
    * the argmax orders (freq desc, lhs, rhs).
    *
    * Execution shape: the corpus contributes ONE aggregation (the
    * word-frequency table, vocabulary-bounded — NOT corpus-sized);
    * that table is collected ONCE and the k-iteration merge loop runs
    * driver-side with incremental pair-count maintenance (Sennrich's
    * published algorithm). A real vocabulary run (k = 32k–50k merges)
    * is therefore one Spark job plus in-memory math, instead of the
    * tens of thousands of scheduler round-trips the per-merge-job
    * shape costs ([[learnMergesIterative]], kept as the A/B
    * comparator and the escape hatch for a pathological word table
    * too large to collect). The driver-side tie-break compares Java
    * strings (UTF-16 code units), which coincides with Spark's UTF-8
    * binary order for all BMP text — supplementary-plane symbols
    * could order differently between the two paths.
    *
    * `minFreq`/`maxWords` bound the collected word table (frequency
    * floor + top-N cap — the HF-tokenizers `min_frequency` knob);
    * at web scale the UNCUT distinct-word table is driver-fatal, so
    * real runs must set at least one of them. Defaults keep the
    * historical uncut behavior for small corpora.
    */
  def learnMerges(
      df: DataFrame,
      textCol: String,
      k: Int,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val table = wordTable(df, textCol, minFreq, maxWords).collect()
    val counts = table.map(_.getLong(0))
    val words  = table.map(_.getSeq[String](1).toArray)
    learnFromTable(counts, words, k).toDF("rank", "lhs", "rhs", "freq")
  }

  /** The driver-side merge loop over a collected (count, symbols)
    * word table. Incremental: an inverted pair → word-ids index
    * confines each merge's work to the words that actually contain
    * the pair; their pair multisets are subtracted, the arrays
    * rewritten, and the new multisets re-added — exact deltas, so
    * the running counts equal a full recount at every step. The
    * inverted index is pruned on unregister (like [[WordPiece]]'s),
    * so it tracks live state, not history — at realistic k (32k–50k
    * merges) an add-only index degrades every merge with no-op
    * rewrites of words that long since lost the pair.
    */
  private[textops] def learnFromTable(
      counts: Array[Long],
      words: Array[Array[String]],
      k: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val syms      = words.map(w => mutable.ArrayBuffer.from(w))
    val pairFreq  = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def applyPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) {
        val p  = (s(j), s(j + 1))
        val nf = pairFreq.getOrElse(p, 0L) + sign * counts(i)
        if (nf == 0L) pairFreq.remove(p) else pairFreq.update(p, nf)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
        else
          pairWords.get(p).foreach { s0 =>
            s0 -= i
            if (s0.isEmpty) pairWords.remove(p)
          }
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { applyPairs(i, 1L); i += 1 }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank   = 1
    while (rank <= k && pairFreq.nonEmpty) {
      // argmax (freq desc, lhs asc, rhs asc) — one scan of the live
      // pair map (pair-count-sized, not corpus-sized)
      var best: (String, String) = null
      var bf                     = Long.MinValue
      pairFreq.foreachEntry { (p, f) =>
        if (f > bf ||
          (f == bf && (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bf = f
        }
      }
      merges += ((rank, best._1, best._2, bf))
      val affected = pairWords.getOrElse(best, mutable.HashSet.empty).toArray
      var a = 0
      while (a < affected.length) {
        val wid = affected(a)
        applyPairs(wid, -1L)
        val merged = mergeOnce(syms(wid).toSeq, best._1, best._2)
        syms(wid).clear()
        syms(wid) ++= merged
        applyPairs(wid, 1L)
        a += 1
      }
      pairWords.remove(best)
      rank += 1
    }
    merges.toSeq
  }

  /** The all-Spark per-merge-iteration learner `learnMerges` replaced
    * (kept for A/B parity specs and as the fallback when the word
    * table itself must stay distributed): each iteration is one
    * vocab-sized aggregation + a 1-row TakeOrdered + a per-word
    * rewrite; `localCheckpoint` truncates the k-deep iterative
    * lineage so the plan stays flat. Cost: one Spark job PER MERGE —
    * correct but scheduler-bound at realistic k.
    */
  def learnMergesIterative(
      df: DataFrame,
      textCol: String,
      k: Int,
      minFreq: Long = 1L,
      maxWords: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words  = wordTable(df, textCol, minFreq, maxWords).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank   = 1
    var done   = false
    while (rank <= k && !done) {
      val top = pairCounts(words)
        .orderBy(desc("freq"), col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, f) =
          (top(0).getAs[String]("lhs"), top(0).getAs[String]("rhs"), top(0).getAs[Long]("freq"))
        merges += ((rank, a, b, f))
        val rewrite = udf((sym: Seq[String]) => mergeOnce(sym, a, b))
        words = words
          .select(col("c"), rewrite(col("sym")).as("sym"))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "freq")
  }

  /** Encode text with a learned merge list: each word's characters
    * are rewritten by every merge in rank order (the standard greedy
    * inference). A pure projection — merges ship in the closure
    * (k·bytes, broadcast with the task), the corpus never shuffles.
    */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column = {
    val enc = udf((text: String) => {
      val ws = if (text == null) Array.empty[String] else text.split(" ").filter(_.nonEmpty)
      ws.toSeq.flatMap { w =>
        var sym: Seq[String] = w.split("").filter(_.nonEmpty).toSeq
        merges.foreach { case (a, b) => sym = mergeOnce(sym, a, b) }
        sym
      }
    })
    enc(textCol)
  }
}
