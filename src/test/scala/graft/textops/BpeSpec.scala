package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich's classic corpus: low×5, lower×2, newest×6, widest×3
  private val corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed merge sequence") {
    // pair counts: (e,s)=9, (s,t)=9 → lex tie-break picks (e,s);
    // then (es,t)=9; then (l,o)=7 vs (o,w)=7 → (l,o)
    val got = Bpe.learnMerges(corpus, "text", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("learnMerges rank 1 equals the top row of pairStats") {
    val top = Bpe.pairStats(corpus, "text", topK = 1).collect().head
    val m1 = Bpe.learnMerges(corpus, "text", k = 1).collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      (m1.getString(1), m1.getString(2), m1.getLong(3)))
  }

  test("encode applies merges in rank order: 'lowest' -> [lo, w, est]") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val got = Seq(Tuple1("lowest")).toDF("text")
      .select(Bpe.encode(col("text"), merges).as("sym"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("lo", "w", "est"))
    // overlapping occurrences merge greedily left-to-right
    val aaa = Seq(Tuple1("aaa")).toDF("text")
      .select(Bpe.encode(col("text"), Seq(("a", "a"))).as("sym"))
      .collect().head.getSeq[String](0)
    assert(aaa == Seq("aa", "a"))
  }

  test("learnMerges is deterministic across runs and stops when no pairs remain") {
    val a = Bpe.learnMerges(corpus, "text", k = 5).collect().map(_.toSeq).toSeq
    val b = Bpe.learnMerges(corpus, "text", k = 5).collect().map(_.toSeq).toSeq
    assert(a == b)
    // a single-char vocabulary has no pairs: empty merge table
    val single = Seq((1L, "a a a")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(single, "text", k = 3).count() == 0)
  }

  /** Pseudo-word corpus with a big enough pair space for ≥1000
    * merges: hex-string "words" over 16 symbols, ~40k adjacent slots.
    */
  private def hexCorpus(nDocs: Int, wordsPerDoc: Int) =
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until wordsPerDoc).map(j =>
        hex(xxhash64(col("id") * wordsPerDoc + j))): _*).as("text"))

  test("driver-side learner reproduces the per-merge-job path's sequence exactly") {
    // the Sennrich fixture, past exhaustion (both paths stop at the
    // same merge count), and a wider random corpus deep enough that
    // incremental-delta bugs would surface as a diverged sequence
    for ((df, k) <- Seq((corpus, 12), (hexCorpus(40, 5), 30))) {
      val fast = Bpe.learnMerges(df, "text", k).orderBy("rank").collect().map(_.toSeq).toSeq
      val slow = Bpe.learnMergesIterative(df, "text", k).orderBy("rank").collect().map(_.toSeq).toSeq
      assert(fast == slow, s"merge sequences diverged at k=$k:\nfast=$fast\nslow=$slow")
    }
  }

  test("realistic vocabulary: 1000 merges complete in one corpus job within the time bound") {
    val df = hexCorpus(500, 10) // ~5000 words, ~16 chars each
    val t0 = System.nanoTime()
    val merges = Bpe.learnMerges(df, "text", k = 1000).collect()
    val sec    = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 1000, s"expected 1000 merges, got ${merges.length}")
    // ranks dense 1..1000, freqs positive
    assert(merges.map(_.getInt(0)).sorted.toSeq == (1 to 1000))
    assert(merges.forall(_.getLong(3) > 0))
    // the whole run is ONE Spark aggregation + driver math: far under
    // a minute even on a loaded CI box (the per-merge-job shape costs
    // 1000 scheduler round-trips here)
    assert(sec < 60.0, s"1000 merges took $sec s")
  }
}
