package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-18 optimization pins.
  *
  * graphTopK's beam loop materializes each hop (localCheckpoint) and
  * rescores from the persisted assignment relation, so the RETURNED
  * frame's lineage must be checkpoint-rooted — independent of hop
  * count, no corpus subtree left to re-execute per consumer. Value
  * parity with the exact brute-force path (and batch-vs-single) is
  * pinned by TextOpsSpec; this suite pins the structural claim.
  */
class Round18OptSpec extends SparkSpec {
  import spark.implicits._

  test("graphTopK: returned lineage is checkpoint-rooted, not the corpus plan") {
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat)
    }
    val df = (0 to 10).map(i => (i.toLong, v(i * 9.0))).toDF("vec_id", "embedding")
    val q  = Seq(math.cos(math.toRadians(40)), 0.0, math.sin(math.toRadians(40)))
    val out = Similarity.graphTopK(df, "vec_id", "embedding", q,
      k = 3, ef = 4, hops = 3, knnK = 2, nCentroids = 2)
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    // the input is a LocalRelation; if any leaf still is one, a hop's
    // subtree (and its per-consumer re-execution) is back in the plan
    assert(leaves.nonEmpty)
    leaves.foreach { l =>
      val name = l.getClass.getSimpleName
      assert(name == "LogicalRDD", s"non-checkpoint leaf in graphTopK lineage: $name\n$l")
    }
    // and the checkpointed beam still carries the right answer: the
    // graph tier on this smooth ring agrees with exact brute force
    val got = out.orderBy("rank").collect().map(_.getLong(0)).toSeq
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", q, k = 3)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"got $got, exact $exact")
    spark.catalog.clearCache() // the graph index is the documented resident
  }
}
