package graft

/** Dev tool: scan every SparkEntry query's physical plan for
  * expensive join shapes (cartesian / broadcast nested loop) so
  * intentional cross joins stay the ONLY ones.
  *
  * Audit result (round 3, sf0.001): zero CartesianProduct in all
  * 101 plans; every BroadcastNestedLoopJoin is a 1-row build side
  * (a corpus total / per-stage count attached as a scalar —
  * q_*_ppl, q_bm25, q_dsir, q_domain_mix, q_mix_realize, q_funnel,
  * q_rrf_fusion, q_tfidf) — the correct plan for scalar
  * attachment, not a pair explosion.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir   = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
        val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
        if (cart + bnlj > 0) println(s"[audit] $name cartesian=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable => println(s"[audit] $name construction failed: ${e.getMessage}")
      }
    }
    println("[audit] done")
  }
}
