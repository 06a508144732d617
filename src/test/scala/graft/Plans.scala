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
      "q_nb_posterior", "q_text_f1",
      // round-2 operators
      "q_sessionize", "q_dedup_jaccard_capped", "q_dedup_clusters",
      "q_vocab_topk", "q_stratified_sample", "q_order_revenue_join",
      // curation operators
      "q_pii_scrub", "q_decontaminate", "q_seq_pack", "q_quality_rules",
      "q_tfidf_top_terms",
      "q_ann_lsh", "q_dedup_paragraph", "q_dsir_weight", "q_embed_mean_pool")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
