package graft.combine

import graft.SparkSpec

class CombinersSpec extends SparkSpec {
  import spark.implicits._

  test("majorityVote picks most frequent, lexicographic tie-break") {
    val votes = Seq(
      ("d1", "e1", "a"), ("d1", "e2", "a"), ("d1", "e3", "b"),
      ("d2", "e1", "b"), ("d2", "e2", "a"), // tie → 'a'
      ("d3", "e1", "z"))
      .toDF("path", "extractor", "value")
    val got = Combiners
      .majorityVote(votes, Seq("path"), "value")
      .orderBy("path")
      .select("path", "value", "n_votes")
    assert(rows(got) == Seq(Seq("d1", "a", 2L), Seq("d2", "a", 1L), Seq("d3", "z", 1L)))
  }

  test("majorityVoteAbstainAware drops empties under high fraction") {
    val votes = Seq(("d1", "e1", ""), ("d1", "e2", ""), ("d1", "e3", "x"))
      .toDF("path", "extractor", "value")
    val high = Combiners.majorityVoteAbstainAware(votes, Seq("path"), "value", extractionFraction = 0.95)
    assert(rows(high.select("value")) == Seq(Seq("x")))
    val low = Combiners.majorityVoteAbstainAware(votes, Seq("path"), "value", extractionFraction = 0.5)
    assert(rows(low.select("value")) == Seq(Seq("")))
  }

  test("majorityVoteAbstainAware keeps all-abstain keys as '' (profiler.py:150-152)") {
    val votes = Seq(
      ("d1", "e1", ""), ("d1", "e2", "x"),
      ("d2", "e1", ""), ("d2", "e2", "")) // all abstain → elects ''
      .toDF("path", "extractor", "value")
    val got = Combiners
      .majorityVoteAbstainAware(votes, Seq("path"), "value", extractionFraction = 0.9)
      .orderBy("path")
      .select("path", "value", "n_votes")
    assert(rows(got) == Seq(Seq("d1", "x", 1L), Seq("d2", "", 0L)))
  }

  test("wsCombine recovers plurality labels, abstains, and all-abstain ''") {
    // a, b consistent across the lake; c disagrees on half the docs —
    // the decode must return the plurality value everywhere, '' where
    // every extractor abstained, and survive abstaining voters.
    val votes = (1 to 6).flatMap { i =>
      Seq(
        (s"d$i", "a", s"v$i"),
        (s"d$i", "b", s"v$i"),
        (s"d$i", "c", if (i <= 3) s"v$i" else s"w$i"))
    } ++ Seq(("d7", "a", ""), ("d7", "b", ""), ("d7", "c", ""), ("d8", "a", "solo"), ("d8", "b", ""))
    val got = Combiners.wsCombine(votes.toDF("path", "extractor", "value"), "path").orderBy("path")
    val expected = (1 to 6).map(i => Seq(s"d$i", s"v$i")) ++ Seq(Seq("d7", ""), Seq("d8", "solo"))
    assert(rows(got) == expected)
  }

  test("voteCollect unions extractor outputs into sorted vote lists") {
    val e1  = Seq(("d1", "x")).toDF("path", "value")
    val e2  = Seq(("d1", "a"), ("d2", "b")).toDF("path", "value")
    val got = Combiners.voteCollect(Seq(e1, e2), Seq("path"), "value").orderBy("path")
    assert(rows(got) == Seq(Seq("d1", Seq("a", "x")), Seq("d2", Seq("b"))))
  }

  test("voteMatrix maps votes to label ids with abstain=-1") {
    val votes = Seq(
      ("d1", "e1", "a"), ("d1", "e2", "a"), ("d1", "e3", "b"))
      .toDF("path", "extractor", "value")
    val got = Combiners.voteMatrix(votes, "path", numElts = 1).orderBy("path")
    val r   = got.collect()(0)
    assert(r.getAs[scala.collection.Seq[String]]("labels").toSeq == Seq("a"))
    assert(r.getAs[scala.collection.Seq[Int]]("votes").toSeq == Seq(0, 0, -1))
  }
}
