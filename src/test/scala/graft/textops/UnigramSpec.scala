package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("seedPieceStats: hand-computed substring weights, ties lexicographic") {
    val df = Seq((1L, "aa b"), (2L, "aa")).toDF("doc_id", "text")
    // words: aa (c=2) -> a@0, a@1, aa; b (c=1)
    val got = Unigram.seedPieceStats(df, "text", maxLen = 4, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 4L), ("aa", 2L), ("b", 1L)))
  }

  test("segment: Viterbi picks the best-scoring split with deterministic ties") {
    val v1 = Map("ab" -> -0.5, "a" -> -2.0, "b" -> -2.0)
    assert(Unigram.segment("abab", v1) == Seq("ab", "ab"))
    // unknown char falls back to the unk single-char score
    assert(Unigram.segment("abc", v1) == Seq("ab", "c"))
    // exact score tie: ab (-1.0) vs a+b (-0.5-0.5) -> fewer pieces wins
    val v2 = Map("ab" -> -1.0, "a" -> -0.5, "b" -> -0.5)
    assert(Unigram.segment("ab", v2) == Seq("ab"))
    assert(Unigram.segment("", v1).isEmpty)
  }

  test("train: planted repeated bigram earns a multi-char piece; deterministic; unk covered") {
    val df = (1L to 20L).map(i => (i, "abab abab cd")).toDF("doc_id", "text")
    val pieces = Unigram.train(df, "text", vocabSize = 8, maxLen = 4, seedSize = 20, emIters = 2)
    val logp = pieces.toMap
    assert(pieces == Unigram.train(df, "text", vocabSize = 8, maxLen = 4, seedSize = 20, emIters = 2))
    assert(logp.keys.exists(_.length > 1), s"no multi-char piece survived: $pieces")
    // the trained model must segment the training word into few pieces
    val seg = Unigram.segment("abab", logp)
    assert(seg.length <= 2, s"abab segmented as $seg")
    assert(seg.mkString == "abab")
    // characters never seen train fine via the unk floor
    val unk = Unigram.segment("zz", logp)
    assert(unk.mkString == "zz")
  }

  test("train prunes to the vocab budget and keeps single-char coverage") {
    val df = Seq((1L, "abc abd abe xy xy")).toDF("doc_id", "text")
    val pieces = Unigram.train(df, "text", vocabSize = 7, maxLen = 3, seedSize = 50, emIters = 2)
    assert(pieces.size <= 7, pieces.toString)
    // every piece is a real substring of the corpus
    assert(pieces.forall { case (p, _) => "abc abd abe xy".contains(p) || p.length == 1 })
    // log-probs normalize: sum of exp == 1
    assert(math.abs(pieces.map(p => math.exp(p._2)).sum - 1.0) < 1e-9)
  }

  test("encode: column-level segmentation flattens token pieces in order") {
    val df = Seq((1L, "abab cd"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val pieces = Seq("ab" -> -0.5, "a" -> -3.0, "b" -> -3.0, "c" -> -1.5, "d" -> -1.5)
    val got = df.select(col("doc_id"), Unigram.encode(col("text"), pieces).as("enc"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1) == Seq("ab", "ab", "c", "d"))
    assert(got(1).getSeq[String](1).isEmpty)
  }
}
