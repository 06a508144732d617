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
}
