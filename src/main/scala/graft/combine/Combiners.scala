package graft.combine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vote combiners (`combine_extractions`, `profiler.py:115-185`;
  * `methods.py:352-373`).
  *
  * All combiners work on the long/narrow extraction relation
  * (key, extractor, value) — the shape that scales: one shuffle on
  * the vote key, partial aggregation map-side, and the per-key state
  * is O(distinct values), never O(lake).
  *
  * Tie-breaks are lexicographic (deterministic), replacing Python
  * `Counter` insertion order (SURVEY §7 hard part (b)).
  */
object Combiners {

  /** Majority vote per key: most frequent value, ties → smallest
    * value lexicographically. Returns (keyCols..., value, n_votes).
    */
  def majorityVote(votes: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w    = Window.partitionBy(keys: _*).orderBy(desc("n_votes"), asc(valueCol))
    votes
      .groupBy((keys :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Majority vote that first drops empty/null votes when the
    * extraction fraction is high (`profiler.py:148-154`): with
    * fraction ≥ thresh (reference default 0.8,
    * `extraction_fraction_thresh` in `combine_extractions`), abstains
    * are removed before voting — but a key whose votes are ALL
    * abstains still elects `''` (the reference replaces the emptied
    * vote list with `['']`, `profiler.py:150-152`), it never vanishes
    * from the view. Such keys carry n_votes = 0.
    */
  def majorityVoteAbstainAware(
      votes: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      extractionFraction: Double,
      thresh: Double = 0.8): DataFrame = {
    if (extractionFraction >= thresh) {
      val keys     = keyCols.map(col)
      val nonEmpty = votes.filter(col(valueCol).isNotNull && length(trim(col(valueCol))) > 0)
      votes
        .select(keys: _*)
        .distinct()
        .join(majorityVote(nonEmpty, keyCols, valueCol), keyCols, "left")
        .withColumn(valueCol, coalesce(col(valueCol), lit("")))
        .withColumn("n_votes", coalesce(col("n_votes"), lit(0L)))
    } else majorityVote(votes, keyCols, valueCol)
  }

  /** Union per-extractor outputs and collect the vote list per key
    * (`combine_extractions` `profiler.py:132-146`). Values sorted for
    * determinism. Returns (keyCols..., votes ARRAY<STRING>).
    */
  def voteCollect(extractions: Seq[DataFrame], keyCols: Seq[String], valueCol: String): DataFrame = {
    val unioned = extractions.reduce(_ unionByName _)
    unioned
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col(valueCol))).as("votes"))
  }

  /** Vote histogram → int vote matrix (`run_ws.py:41-98`): per key,
    * rank distinct votes by (count desc, value asc), keep top
    * `numElts` as the label space, map each extractor's vote to its
    * label id, else -1 (abstain).
    * votes: (key, extractor, value). Returns
    * (key, labels ARRAY<STRING>, label_map MAP<STRING,INT>,
    *  votes ARRAY<INT> ordered by extractor name).
    */
  def voteMatrix(votes: DataFrame, keyCol: String, numElts: Int = 5): DataFrame = {
    val counts = votes
      .groupBy(col(keyCol), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(desc("n"), asc("value"))
    val topLabels = counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= numElts)
      .groupBy(col(keyCol))
      .agg(collect_list(struct(col("rk"), col("value"))).as("lv"))
      .select(
        col(keyCol),
        transform(array_sort(col("lv")), x => x.getField("value")).as("labels"))
      .withColumn("label_map", map_from_arrays(col("labels"), sequence(lit(0), size(col("labels")) - 1)))

    votes
      .join(topLabels, Seq(keyCol))
      .withColumn("vote_int", coalesce(element_at(col("label_map"), col("value")), lit(-1)))
      .groupBy(col(keyCol), col("labels"), col("label_map"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("extractor"), col("vote_int")))),
          x => x.getField("vote_int")).as("votes"))
  }

  /** Weak-supervision vote combination (`combiner_mode='ws'`,
    * `run_ws.py:174-268`): the FlyingSquid pipeline, unsupervised —
    * estimate each extractor's accuracy from abstain-masked pairwise
    * agreement moments via the triplet closed form (the statistical
    * model the reference's MeTaL `LabelModel` fits by SGD), then
    * decode each key's label by an accuracy-weighted naive-Bayes
    * posterior over its top-`numElts` candidate labels (abstains
    * contribute nothing; the posterior form is `get_cond_probs` /
    * `get_probs` / `get_nb_accuracy`, `ws_utils.py:72-113`). Falls back to plain majority where moments
    * are degenerate (accuracy 0.5 for every extractor reduces to
    * unweighted voting; our tie-break stays lexicographic).
    *
    * Scale: moments are one shuffle on the key + one m×m aggregate;
    * only the m accuracies reach the driver; the decode is a
    * per-row expression over the distributed vote matrix.
    *
    * votes: (key, extractor, value). Returns (key, value).
    *
    * `learnDeps`: run structure learning first
    * (`LabelModel.learnTopDependency` — `run_ws.py:228-248`) and, if a
    * dependency pair stands out, retrain the accuracies with the
    * contaminated moments excluded; any failure falls back to the
    * independent model, like `run_ws.py:256-257`. Off by default —
    * the oracle-gated paths stay byte-identical.
    *
    * `maxLearnedDeps`: how many residual edges the heuristic learner
    * may model. The default 1 is the historical (round ≤8) top-1
    * behavior — one edge, pair-clique decode, predictions comparable
    * across rounds. Values ≥2 opt IN to overlapping edges (a voter
    * correlated with two others chains cliques through itself)
    * routed through the general chordal clique-tree decode — a
    * strictly richer model, but not output-identical to the top-1
    * path, so it is a caller's explicit choice, never a silent
    * upgrade. Ignored under `structureLearn` (the convex learner
    * keeps the reference's k=1, `run_ws.py:239`).
    * COMPATIBILITY NOTE (round 10): when this parameter was
    * introduced, the briefly-shipped round-9 behavior (k=2
    * overlapping edges under `learnDeps=true`) was rolled back to
    * the k=1 default above — callers relying on `learnDeps=true`
    * between those rounds see different (pair-clique, top-1)
    * predictions than the k=2 interregnum produced; pass
    * `maxLearnedDeps = 2` to restore that behavior exactly.
    *
    * `structureLearn`: use the reference's ACTUAL learner — the
    * sparse+low-rank split of the vote covariance
    * ([[LabelModel.learnStructureSparseLowRank]], `run_ws.py:228-239`:
    * learn_structure → everything-connected guard →
    * get_top_deps_from_inverse_sig k=1) — instead of the moment
    * residual heuristic. Same retrain + decode downstream; same
    * fall-back-on-failure. Implies `learnDeps` (asking for the
    * learner IS asking to learn deps — the flag alone must not be a
    * silent no-op).
    */
  def wsCombine(
      votes: DataFrame,
      keyCol: String,
      numElts: Int = 5,
      learnDeps: Boolean = false,
      structureLearn: Boolean = false,
      maxLearnedDeps: Int = 1): DataFrame = {
    val spark = votes.sparkSession
    // empty/null votes are abstains (`run_ws.py:53-57` maps them to
    // 'abstain' and excludes them from the candidate labels); keys
    // whose votes are ALL abstains elect '' at the end
    val nonAbstain = votes.filter(col("value").isNotNull && length(trim(col("value"))) > 0)
    val vm         = voteMatrix(nonAbstain, keyCol, numElts)

    // ±1 agreement encoding for moment estimation: +1 = voted the
    // key's plurality label (id 0), -1 = voted another label,
    // 0 = abstain (run_ws reduces its per-file label maps the same
    // way in the binary case).
    val pm = votes
      .join(vm.select(col(keyCol), col("label_map")), Seq(keyCol))
      .withColumn("vote_id", coalesce(element_at(col("label_map"), col("value")), lit(-1)))
      .select(
        col(keyCol),
        col("extractor"),
        when(col("vote_id") === -1, 0).when(col("vote_id") === 0, 1).otherwise(-1).as("vote"))
    // one collect of the m×m moment matrix serves the triplet solve,
    // structure learning, and the dep-aware retrain — the self-join
    // behind it is the combiner's only lake-scale stage and must not
    // re-execute per consumer
    val mm = LabelModel.momentMap(LabelModel.pairwiseMoments(pm, keyCol))
    val doLearn = learnDeps || structureLearn
    val (accs, depsLearned) =
      if (!doLearn) (LabelModel.flyingSquidFromMap(mm, Set.empty), Seq.empty[(String, String, Double)])
      else
        try {
          val learned =
            if (structureLearn) {
              // run_ws.py:228-239 verbatim shape: the convex S−L
              // split learns Ĵ from the ±1 vote matrix, the
              // everything-connected guard vetoes degenerate fits,
              // and the top-1 |Ĵ| off-diagonal is the dependency.
              // pm feeds 4 driver-side statistics actions here on
              // top of the moments pass — persist it for exactly
              // their duration (MEMORY_ONLY: pure recomputable
              // shuffle output, eviction beats a disk tier) and
              // unpersist in the finally, so repeated wsCombine
              // calls in a long-lived session cannot accumulate
              // cached blocks. The rare dep-aware decode below
              // re-derives pm from lineage once — one voteMatrix
              // shuffle, the pre-persist cost.
              pm.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
              try {
                val j = LabelModel.learnStructureSparseLowRank(pm, keyCol)
                if (LabelModel.structureAllConnected(j)) Seq.empty
                else LabelModel.structureTopDeps(j, k = 1, minAbs = 0.05)
              } finally pm.unpersist(blocking = false)
            } else
              // maxLearnedDeps edges, overlap allowed (k=1 selects
              // the same single edge as the historical top-1 learner
              // and takes the same pair-clique decode below; k≥2
              // chains cliques through shared voters into the
              // general clique-tree decode); chordality is
              // maintained by the learner, so the decode cannot raise
              LabelModel.learnTopDependenciesOverlappingFromMap(mm, k = maxLearnedDeps)
          (LabelModel.flyingSquidFromMap(mm, learned.map(d => (d._1, d._2)).toSet), learned)
        } catch {
          // "Not modeling dependencies." (run_ws.py:256-257)
          case _: Throwable => (LabelModel.flyingSquidFromMap(mm, Set.empty), Seq.empty[(String, String, Double)])
        }
    val accDf = spark.createDataFrame(accs.toSeq.sorted).toDF("extractor", "acc")

    // Per-key NB decode over the candidate labels: score(c) =
    // Σ_i [abstain → 0; v_i = c → log a_i; else → log((1-a_i)/(k-1))].
    val eps = lit(1e-4)
    val scoredVotes = votes
      .join(broadcast(accDf), Seq("extractor"), "left")
      .withColumn("acc", least(greatest(coalesce(col("acc"), lit(0.5)), eps), lit(0.9999)))
      .join(vm.select(col(keyCol), col("labels"), col("label_map")), Seq(keyCol))
      .withColumn("vote_id", coalesce(element_at(col("label_map"), col("value")), lit(-1)))
    val k = greatest(size(col("labels")).cast("double"), lit(2.0))
    val perLabelScores = scoredVotes
      .groupBy(col(keyCol), col("labels"))
      .agg(collect_list(struct(col("vote_id"), col("acc"))).as("va"))
      .withColumn(
        "scores",
        transform(
          sequence(lit(0), size(col("labels")) - 1),
          c =>
            aggregate(
              col("va"),
              lit(0.0),
              (acc, v) =>
                acc + when(v.getField("vote_id") === -1, 0.0)
                  .when(v.getField("vote_id") === c, log(v.getField("acc")))
                  .otherwise(log((lit(1.0) - v.getField("acc")) / (k - 1))))))
      .drop("va")
    // argmax by score, tie → smaller label id (= higher plurality
    // rank, matching majorityVote's deterministic preference).
    // argmaxFrom(1) is the best NON-plurality label — the junction
    // tree path below needs it when the pair model overrules the
    // plurality decision.
    def argmaxFrom(lo: Int) =
      when(
        size(col("labels")) > lo,
        aggregate(
          sequence(lit(lo), size(col("labels")) - 1),
          struct(lit(-1).as("id"), lit(Double.NegativeInfinity).as("s")),
          (best, c) =>
            when(element_at(col("scores"), c + 1) > best.getField("s"),
              struct(c.as("id"), element_at(col("scores"), c + 1).as("s")))
              .otherwise(best),
          b => b.getField("id"))).otherwise(lit(-1))
    val scoredIds = perLabelScores
      .withColumn("best_id", argmaxFrom(0))
      .withColumn("best_alt_id", argmaxFrom(1))
    def label(idCol: Column) =
      when(idCol >= 0, element_at(col("labels"), idCol + 1)).otherwise(lit(""))
    val decoded = depsLearned match {
      case Seq() =>
        scoredIds.select(col(keyCol), label(col("best_id")).as("value"))
      case learned =>
        // dependency learned → decode the plurality-vs-rest decision
        // with the exact pair-clique posterior (the reference switches
        // to clique-tree inference when deps are modeled,
        // run_ws.py:239-248). The binary reduction: pm's ±1 encoding
        // is "voted the plurality label / voted another", so the
        // junction tree corrects P(y = plurality | votes) with the
        // joint P(v_a, v_b | y) factor; when it says NOT-plurality,
        // the best non-plurality label by the NB scores wins (the
        // among-others choice stays conditionally independent — the
        // learned pair carries no signal between non-plurality
        // labels in this encoding). Keys the pair model never saw
        // fall back to the NB argmax.
        //
        // The residual handed to the joint MUST be re-derived against
        // the RETRAINED accuracies: learnTopDependencyFromMap scores
        // the residual off the independent model, but the joint table
        // is parameterized by the dep-aware means — mixing the two
        // makes P(v_a,v_b|y) inconsistent with its own marginals
        // (E[v_a v_b] would read m_a·m_b + residual_indep ≠ m_ab).
        val reDerived = learned.map { case (ea, eb, _) =>
          val residual = mm.get((ea, eb)).orElse(mm.get((eb, ea))) match {
            case Some(mab) =>
              mab - (2 * accs.getOrElse(ea, 0.5) - 1) * (2 * accs.getOrElse(eb, 0.5) - 1)
            case None => 0.0
          }
          (ea, eb, residual)
        }
        // single pair → the pair-clique fast path; overlapping or
        // multiple pairs → the general chordal clique-tree decode
        // (numerically identical on disjoint pairs, asserted in
        // LabelModelSpec)
        val jt = (if (reDerived.size == 1)
                    LabelModel.junctionTreePredict(
                      pm, accDf, (reDerived.head._1, reDerived.head._2), reDerived.head._3, keyCol)
                  else LabelModel.junctionTreePredictTree(pm, accDf, reDerived, keyCol))
          .select(col(keyCol), col("jt_pred"))
        scoredIds
          .join(jt, Seq(keyCol), "left")
          .select(
            col(keyCol),
            when(col("jt_pred").isNull, label(col("best_id")))
              .when(col("jt_pred") === 1, label(lit(0)))
              .otherwise(label(col("best_alt_id"))).as("value"))
    }
    votes
      .select(col(keyCol))
      .distinct()
      .join(decoded, Seq(keyCol), "left")
      .withColumn("value", coalesce(col("value"), lit("")))
  }
}
