package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression net for the engine's determinism invariant (SURVEY §7
  * hard part (d) / SCALE.md item 8): repeated runs — including under
  * a different partitioning — must produce identical results.
  */
class DeterminismSpec extends SparkSpec {

  private def fingerprint(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  private val sampleQueries = Seq(
    "q_majority_vote", "q_topk_scripts", "q_vote_matrix", "q_flying_squid",
    "q_dedup_minhash", "q_rank_attributes", "q_cosine_topk", "q_schema_eval_at_k",
    // round-2 operators
    "q_dedup_clusters", "q_sessionize", "q_stratified_sample", "q_vocab_topk",
    "q_dedup_jaccard_capped", "q_ann_ivf",
    // curation + learned-ANN operators
    "q_ann_kmeans", "q_decontaminate", "q_seq_pack", "q_tfidf_top_terms",
    // round-3 operators
    "q_ann_lsh", "q_ann_recall", "q_embed_mean_pool", "q_dedup_paragraph",
    "q_dsir_weight", "q_shard_assign", "q_mix_realize", "q_dedup_keep_best",
    "q_minhash_est", "q_langid_confusion",
    // round-8 PQ + fuzzy-decontam family
    "q_ann_pq", "q_ann_ivfpq", "q_decontam_fuzzy",
    // round-3 wave 2
    "q_ann_int8", "q_rrf_fusion", "q_hard_negatives", "q_winnow_fingerprint",
    "q_dup_ngram_frac", "q_range_join_binned", "q_data_card",
    // round-3 wave 3
    "q_semdedup", "q_bigram_ppl", "q_quality_classifier", "q_kmv_distinct",
    "q_funnel", "q_cohort_retention", "q_asof_attribution", "q_moving_avg",
    "q_shipping_priority", "q_rollup_tokens", "q_unpivot", "q_curriculum",
    "q_json_props", "q_rolling_wau", "q_cohens_kappa")

  test("queries are stable across repeated runs") {
    sampleQueries.foreach { name =>
      val a = fingerprint(SparkEntry.queries(name)(spark, sf0001))
      val b = fingerprint(SparkEntry.queries(name)(spark, sf0001))
      assert(a == b, s"$name differs between runs")
    }
  }

  test("queries are stable under repartitioning of inputs") {
    // same query logic applied to a repartitioned documents table:
    // operators must not depend on partition layout
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val votes4 = graft.combine.Combiners.majorityVote(
      docs.repartition(4).select(col("doc_id"), col("lang").as("value")), Seq("doc_id"), "value")
    val votes13 = graft.combine.Combiners.majorityVote(
      docs.repartition(13).select(col("doc_id"), col("lang").as("value")), Seq("doc_id"), "value")
    assert(fingerprint(votes4) == fingerprint(votes13))

    val j4 = graft.textops.Dedup.ngramJaccardPairs(docs.repartition(4), "lang", "doc_id", "text")
    val j13 = graft.textops.Dedup.ngramJaccardPairs(docs.repartition(13), "lang", "doc_id", "text")
    assert(fingerprint(j4) == fingerprint(j13))

    // round-3 wave 3: semantic dedup verdicts and KMV sketches must
    // not depend on partition layout either
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val sd4  = graft.textops.Similarity.semDedup(emb.repartition(4), "vec_id", "embedding", tau = 0.35)
    val sd13 = graft.textops.Similarity.semDedup(emb.repartition(13), "vec_id", "embedding", tau = 0.35)
    assert(fingerprint(sd4) == fingerprint(sd13))

    val k4  = graft.textops.TextStats.kmvDistinct(docs.repartition(4), "lang", "text", k = 16)
    val k13 = graft.textops.TextStats.kmvDistinct(docs.repartition(13), "lang", "text", k = 16)
    assert(fingerprint(k4) == fingerprint(k13))
  }

  test("full cascade (one-pass APPLY) is stable across runs and partitionings") {
    val a = fingerprint(SparkEntry.cascadeOn(spark, sf0001))
    val b = fingerprint(SparkEntry.cascadeOn(spark, sf0001))
    assert(a == b, "cascade differs between identical runs")
    assert(a.nonEmpty)
  }

  test("profiler sampling is partition-layout independent") {
    import spark.implicits._
    val lake = (1 to 40).map(i => (s"doc$i.txt", s"field: v$i")).toDF("path", "content")
    val p    = new graft.api.Profiler(spark, graft.extract.MockLlmClient())
    val s4   = p.sampleDocs(p.prepare(lake.repartition(4)), 10).select("path").distinct()
    val s13  = p.sampleDocs(p.prepare(lake.repartition(13)), 10).select("path").distinct()
    assert(fingerprint(s4) == fingerprint(s13))
  }
}
