package graft

/** Dev tool: dump formatted physical plans for representative queries
  * (the SURVEY "explain and iterate" loop). Not part of the driver
  * contract.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "plans")
    val dir   = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_scan_documents", "q_keyword_chunk_filter", "q_majority_vote",
      "q_join_pred_gold", "q_dedup_ngram_jaccard", "q_cosine_topk",
      "q_nb_posterior", "q_text_f1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
