package graft

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir   = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val qs    = if (args.length > 1) args(1).split(",").toSeq else Seq("q_semdedup")
    qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      println(s"===== $q")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l =>
          l.contains("Exchange") || l.contains("Join") || l.contains("Scan parquet") ||
            l.contains("Window") || l.contains("TakeOrdered") || l.contains("Sort "))
        .foreach(l => println(l.replaceAll("\\[[^\\]]{40,}\\]", "[…]").take(200)))
    }
  }
}
