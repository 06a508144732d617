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
