package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions for the round-16 batched ANN serve
  * path — the one-scan batched ADC that replaced annServeStream's
  * per-query plan union must stay that plan (the exact regression
  * retrieval_e2e's round-9 rework guards against on the batch side).
  */
class Round16PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pqTopKFromCodesBatch: no Union, scan count constant in |queries|, queries ride as broadcasts") {
    val emb   = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    def queries(n: Int): Seq[(Long, Seq[Double])] = (0L until n.toLong).map { i =>
      i -> emb.filter(col("vec_id") === i).head.getSeq[Float](1).map(_.toDouble).toSeq
    }
    def planOf(n: Int): String = plan(
      Similarity.pqTopKFromCodesBatch(codes, emb, "vec_id", "embedding", queries(n), books, k = 5))
    val p1 = planOf(1)
    val p4 = planOf(4)
    // the retired shape was an N-branch Union of per-query ADC
    // subtrees — N scans of the codes for N queries
    assert(!p4.contains("Union"), s"per-query union is gone for good:\n$p4")
    def scans(p: String): Int = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans(p1) == scans(p4),
      s"corpus scan count must be constant in |queries|: ${scans(p1)} vs ${scans(p4)}:\n$p4")
    // the qid fan-out list and the rerank query vectors are
    // broadcast-side only — queries never shuffle the corpus
    assert(p4.linesIterator.count(_.contains("BroadcastExchange")) >= 2,
      s"qid list + query vectors must ride as broadcasts:\n$p4")
    assert(!p4.contains("SortMergeJoin"),
      s"no corpus-side shuffle join in the serve path:\n$p4")
  }
}
