package graft

/** Scratch plan audit for the round-13 relational wave (dev tool,
  * run via `Test/runMain graft.Explain13`; not a suite).
  */
object Explain13 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "graft-explain13")
    val dir   = "/root/testdata/sf0.01"
    val names = Seq(
      "q_min_cost_supplier", "q_market_share", "q_nation_profit",
      "q_promo_revenue", "q_parts_supplier_cnt", "q_large_orders",
      "q_disjunctive_filter", "q_dormant_customers", "q_pareto_parts",
      "q_revenue_concentration", "q_top_supplier", "q_small_qty_revenue")
    names.foreach { n =>
      println(s"\n========== $n")
      val df   = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("PushedFilters") || l.contains("WindowGroupLimit") ||
          l.contains("TakeOrdered"))
        .map(_.take(200))
        .foreach(println)
    }
    spark.stop()
  }
}
