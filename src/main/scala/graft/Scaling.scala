package graft

/** Cross-SF scaling analysis for the bench (VERDICT r10 #4): convert
  * SCALE.md's linearity claims into a MEASURED regression gate. Bench
  * times every gated query at the sibling scale factors, sums wall
  * time per operator family, fits the log-log slope of time vs scale
  * factor, and flags any family that scales superlinearly — the
  * signature of a plan that would not survive a 100× scale-up
  * (accidental cross join, per-row driver work, uncapped pair space).
  *
  * Slopes at small SFs read LOW, not high: per-query fixed overhead
  * (session, planning, codegen) dominates tiny inputs, flattening the
  * curve — so a slope near 1 at these sizes is already suspicious and
  * anything clearly above it deserves a flag. The flag also requires
  * a minimum absolute time at the largest SF so noise-level families
  * (fixed overhead only) cannot trip it.
  */
object Scaling {

  /** Operator family of a gated query — TOTAL over SparkEntry.queries
    * (ScalingSpec asserts no key falls through to "other", so adding
    * a query forces a conscious family choice here).
    */
  def familyOf(q: String): String = {
    val ann = Set(
      "q_cosine_topk", "q_embed_mean_pool", "q_retrieval_top1", "q_rrf_fusion",
      "q_hard_negatives", "q_rank_metrics", "q_semdedup", "q_semdedup_scaled",
      "q_proto_prune", "q_dedup_embed_cosine", "q_cluster_purity",
      "q_label_centroid_sim", "q_embed_norms", "q_silhouette", "q_dbscan",
      "q_knn_graph", "q_label_prop")
    val dedup = Set(
      "q_lsh_pairs", "q_minhash_est", "q_fingerprint", "q_winnow_fingerprint",
      "q_substring_dedup", "q_decontaminate", "q_decontam_bloom", "q_decontam_fuzzy",
      "q_source_overlap", "q_ngram_novelty", "q_dup_cluster_hist",
      "q_dup_source_matrix", "q_simhash_pairs", "q_pagerank_neardup",
      "q_remove_boilerplate")
    val ws = Set(
      "q_confusion_matrix", "q_nb_posterior", "q_pairwise_moments", "q_flying_squid",
      "q_dp_patterns", "q_lr_features", "q_cond_entropy", "q_cond_entropy_mv",
      "q_cond_entropy_singleton", "q_cross_entropy", "q_cohens_kappa")
    val scanChunk = Set(
      "q_scan_documents", "q_file_type_profile", "q_strip_tags", "q_chunk_documents",
      "q_chunk_backoff", "q_keyword_chunk_filter", "q_multimodal_meta", "q_media_resize",
      "q_frame_sample", "q_json_props", "q_structured_view")
    val extractEval = Set(
      "q_clean_extraction", "q_majority_vote", "q_vote_collect", "q_vote_matrix",
      "q_text_f1", "q_f1_metrics", "q_extraction_fraction", "q_openie_prf",
      "q_topk_scripts", "q_rank_attributes", "q_gold_attr_rank", "q_attr_alias_join",
      "q_attr_dedup", "q_attr_slices", "q_attr_validity_agg", "q_field_count",
      "q_schema_eval_at_k", "q_rerank_merge", "q_missing_files_anti", "q_join_pred_gold",
      "q_unpivot", "q_eval_e2e")
    val layout = Set(
      "q_shard_assign", "q_mix_realize", "q_stratified_sample", "q_curriculum",
      "q_weighted_sample", "q_shard_balance", "q_class_balance_sample",
      "q_mix_temperature", "q_mix_update",
      "q_seq_pack", "q_domain_mix", "q_dsir_weight", "q_winsorize", "q_quantile_disc",
      "q_value_histogram", "q_skew_salted_count", "q_data_card", "q_cube_quality",
      "q_rollup_tokens", "q_ks_length", "q_mann_whitney")
    val relational = Set(
      "q_lineitem_pricing", "q_order_asof_prev", "q_order_revenue_join",
      "q_shipping_priority", "q_asof_attribution", "q_range_join_binned", "q_sessionize",
      "q_event_windows", "q_funnel", "q_moving_avg", "q_rolling_wau", "q_burst_days",
      "q_cohort_retention", "q_rfm_segments", "q_window_rank", "q_set_intersect",
      "q_event_pivot", "q_event_transitions", "q_table_profile",
      "q_local_supplier_volume", "q_cust_order_dist", "q_set_except",
      "q_late_ship_exists", "q_priority_mix", "q_forecast_revenue",
      "q_returned_revenue", "q_nation_trade", "q_inter_event_gap",
      "q_min_cost_supplier", "q_market_share", "q_nation_profit",
      "q_revenue_concentration", "q_promo_revenue", "q_top_supplier",
      "q_parts_supplier_cnt", "q_small_qty_revenue", "q_large_orders",
      "q_disjunctive_filter", "q_dormant_customers",
      "q_triangle_count", "q_triangle_sampled", "q_basket_lift", "q_pareto_parts")
    if (q.startsWith("q_ann_") || ann(q)) "ann"
    else if (q.startsWith("q_dedup_") || dedup(q)) "dedup"
    else if (ws(q)) "weak_supervision"
    else if (scanChunk(q)) "scan_chunk"
    else if (extractEval(q)) "extract_eval"
    else if (layout(q)) "layout_sampling"
    else if (relational(q)) "relational_events"
    else if (q.startsWith("q_")) "textstats" // the per-row text-signal families
    else "other"
  }

  /** OLS slope of ln(seconds) on ln(sf) — the scaling exponent
    * (1 = linear in data size, 2 = quadratic). Times clamp at 1 ms so
    * a zero reading cannot produce −∞.
    */
  def fitSlope(points: Seq[(Double, Double)]): Double = {
    require(points.size >= 2, "need at least two (sf, seconds) points")
    val xs = points.map(p => math.log(p._1))
    val ys = points.map(p => math.log(math.max(p._2, 1e-3)))
    val n  = points.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    (n * sxy - sx * sy) / (n * sxx - sx * sx)
  }

  /** Families scaling worse than `maxSlope` with a material absolute
    * time (seconds at the LARGEST sf ≥ `minSec`). Empty is the
    * expected (and asserted) state.
    */
  def flagged(
      famTimes: Map[String, Seq[(Double, Double)]],
      maxSlope: Double = 1.25,
      minSec: Double = 1.0): Seq[String] =
    famTimes.toSeq
      .filter { case (_, pts) =>
        pts.size >= 2 && pts.maxBy(_._1)._2 >= minSec && fitSlope(pts) > maxSlope
      }
      .map(_._1)
      .sorted
}
