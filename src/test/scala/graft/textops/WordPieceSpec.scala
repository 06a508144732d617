package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // hand-computed fixture: aab ×2, ab ×1
  //   word table: aab c=2 -> [a, ##a, ##b]; ab c=1 -> [a, ##b]
  //   symbol counts: a=3, ##a=2, ##b=3
  //   pair scores: (a,##a) 2/(3·2), (##a,##b) 2/(2·3)  [tie],
  //                (a,##b) 1/(3·3)
  private val corpus = Seq((1L, "aab aab ab")).toDF("doc_id", "text")

  test("pairScores: likelihood-gain log scores with deterministic tie order") {
    val got = WordPiece.pairScores(corpus, "text", topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val l2_32 = math.rint((math.log(2) - math.log(3) - math.log(2)) * 1e6) / 1e6
    val l1_33 = math.rint((math.log(1) - math.log(3) - math.log(3)) * 1e6) / 1e6
    // tie at -1.098612 breaks lexicographically: "##a" < "a"
    assert(got.toSeq == Seq(
      ("##a", "##b", 2L, l2_32),
      ("a", "##a", 2L, l2_32),
      ("a", "##b", 1L, l1_33)))
  }

  test("learnMerges: hand-computed merge sequence with exact rational argmax") {
    val got = WordPiece.learnMerges(corpus, "text", k = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "##a", "##b", "##ab", 2L),
      (2, "a", "##ab", "aab", 2L),
      (3, "a", "##b", "ab", 1L)))
  }

  test("encode: greedy longest-match-first, ## continuations, [UNK] on dead ends") {
    val vocab = WordPiece.vocabulary(corpus, "text", k = 3)
    assert(vocab == Seq("##a", "##b", "a", "##ab", "aab", "ab"))
    val got = Seq(("aab ab aac", 1)).toDF("text", "i")
      .select(WordPiece.encode(col("text"), vocab).as("toks"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("aab", "ab", "[UNK]"))
  }

  test("incremental trainer equals a fresh recount at every step") {
    // richer corpus: verify the driver loop's delta maintenance by
    // comparing merge ranks 1..8 against rerunning learnFromTable on
    // the rewritten tables (recount oracle)
    val words  = Array("low", "lower", "newest", "widest", "wide", "new")
    val counts = Array(5L, 2L, 6L, 3L, 2L, 1L)
    def wp(w: String): Array[String] =
      w.toCharArray.zipWithIndex.map { case (c, i) => if (i == 0) c.toString else s"##$c" }
    val full = WordPiece.learnFromTable(counts, words.map(wp), k = 8)
    // step-by-step: after applying the first m merges by hand-rewrite,
    // the (m+1)th merge of a fresh trainer must equal full(m)
    for (m <- 1 until full.length) {
      var tbl = words.map(wp(_).toSeq)
      full.take(m).foreach { case (_, a, b, merged, _) =>
        tbl = tbl.map { sym =>
          val buf = scala.collection.mutable.ArrayBuffer[String]()
          var i   = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) { buf += merged; i += 2 }
            else { buf += sym(i); i += 1 }
          }
          buf.toSeq
        }
      }
      val fresh = WordPiece.learnFromTable(counts, tbl.map(_.toArray), k = 1)
      assert(fresh.head._2 == full(m)._2 && fresh.head._3 == full(m)._3,
        s"step $m: fresh ${fresh.head} vs incremental ${full(m)}")
    }
  }
}
