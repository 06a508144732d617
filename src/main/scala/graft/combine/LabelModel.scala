package graft.combine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak-supervision label-model math (`methods.py`, `run_ws.py`).
  *
  * The reference trains Snorkel-MeTaL / FlyingSquid models over an
  * n×m vote matrix (n = lake files, m ≈ 10 extractors). The
  * reductions (confusion counts, moments) are genuinely big-data —
  * they scan every file's votes — so they run as Spark aggregations.
  * The solved model (m accuracies, class balance) is tiny, so the
  * closed-form solve happens on the driver, mirroring Spark ML's
  * design for small-parameter models. Combiners implemented natively:
  * majority vote (Combiners), naive Bayes, pick-best, FlyingSquid
  * triplets, exp-weight (grid-searched multiplicative weighting),
  * junction-tree inference for learned dependency pairs (single pair
  * and disjoint-pair chains, [[junctionTreePredict]] /
  * [[junctionTreePredictChain]]), logistic regression over
  * vote/pairwise features ([[lrFeatures]] / [[logisticRegressionFit]]
  * — `methods.py:884-953`), and the data-programming marginal-MLE
  * ([[dataProgrammingFit]] — `methods.py:786-880`, optimized by
  * deterministic EM over pattern counts instead of torch SGD). Every
  * `methods.py` inference mode now has a counterpart.
  */
object LabelModel {

  /** Confusion estimates P(vote=v | y) per extractor with the
    * reference's clipping to [1e-4, 0.9999] (`methods.py:203-242`).
    * votes: (key, extractor, vote); gold: (key, y).
    */
  def confusionMatrix(votes: DataFrame, gold: DataFrame, keyCol: String): DataFrame = {
    val joined = votes.join(broadcast(gold), Seq(keyCol))
    val counts = joined.groupBy(col("extractor"), col("y"), col("vote")).agg(count(lit(1)).as("n"))
    val tot    = counts.groupBy(col("extractor"), col("y")).agg(sum(col("n")).as("n_y"))
    counts
      .join(tot, Seq("extractor", "y"))
      .withColumn(
        "p",
        least(greatest(col("n").cast("double") / col("n_y"), lit(1e-4)), lit(0.9999)))
      .select(col("extractor"), col("y"), col("vote"), col("n"), col("p"))
  }

  /** Per-extractor accuracy on non-abstaining votes: P(vote = y | vote ≠ 0).
    * votes in ±1/0 encoding (0 = abstain), gold y in ±1 — the
    * supervised accuracy estimate of `get_probabilties`
    * (`ws_utils.py:4-70`), as one broadcast join + keyed aggregation.
    */
  def accuracies(votes: DataFrame, gold: DataFrame, keyCol: String): DataFrame =
    votes
      .join(broadcast(gold), Seq(keyCol))
      .filter(col("vote") =!= 0)
      .groupBy(col("extractor"))
      .agg(
        least(
          greatest(avg(when(col("vote") === col("y"), 1.0).otherwise(0.0)), lit(1e-4)),
          lit(0.9999)).as("acc"))

  /** Abstain-masked pairwise moments E[v_i·v_j] over ±1 votes
    * (`methods.py:275-328`, `ws_utils.py:115-129` estimate_matrix):
    * one self-join on the vote key, pairs
    * (i < j). The join key is the doc key, so both sides share the
    * same hash partitioning — a single shuffle at lake scale.
    */
  def pairwiseMoments(votes: DataFrame, keyCol: String): DataFrame = {
    val a = votes.select(col(keyCol), col("extractor").as("e_i"), col("vote").as("v_i"))
    val b = votes.select(col(keyCol), col("extractor").as("e_j"), col("vote").as("v_j"))
    a.join(b, Seq(keyCol))
      .filter(col("e_i") < col("e_j"))
      .filter(col("v_i") =!= 0 && col("v_j") =!= 0)
      .groupBy(col("e_i"), col("e_j"))
      .agg(avg(col("v_i") * col("v_j")).as("moment"), count(lit(1)).as("n"))
  }

  /** FlyingSquid triplet closed form (`methods.py:275-328`): for each
    * extractor i, its mean accuracy-correlation
    * a_i = mean over pairs (j,k) of sqrt(|M_ij·M_ik / M_jk|),
    * mapped to accuracy (1 + a_i) / 2. Driver-side on the collected
    * m×m moment matrix (m is small by construction).
    *
    * `deps`: learned dependency pairs ([[learnTopDependency]]) whose
    * moments are contaminated (M_ij ≠ m_i·m_j when i,j are directly
    * correlated, breaking the triplet identity). The dependency-aware
    * retrain — the role of `train_model(..., deps=deps)` at
    * `run_ws.py:239-248` — simply refuses to form any triplet that
    * touches a dependent edge; with deps empty this is the
    * independent model unchanged.
    */
  def flyingSquidAccuracies(
      moments: DataFrame,
      deps: Set[(String, String)] = Set.empty): Map[String, Double] =
    flyingSquidFromMap(momentMap(moments), deps)

  /** Collect the m×m moment matrix once (symmetrized). The matrix is
    * the ONLY lake-scale computation in the label-model solve — every
    * driver-side consumer (triplet accuracies, structure learning,
    * the dep-aware retrain) should share one collect of it rather
    * than re-running the self-join per call.
    */
  def momentMap(moments: DataFrame): Map[(String, String), Double] =
    moments
      .select(col("e_i"), col("e_j"), col("moment"))
      .collect()
      .flatMap { r =>
        val (i, j, v) = (r.getString(0), r.getString(1), r.getDouble(2))
        Seq((i, j) -> v, (j, i) -> v)
      }
      .toMap

  /** Triplet solve over a pre-collected moment map (no Spark jobs). */
  def flyingSquidFromMap(
      m: Map[(String, String), Double],
      deps: Set[(String, String)]): Map[String, Double] = {
    val dep        = deps.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val extractors = m.keys.map(_._1).toSeq.distinct.sorted
    extractors.map { i =>
      val others = extractors.filter(_ != i)
      val pairs = for {
        j <- others; k <- others if j < k
        if !dep((i, j)) && !dep((i, k)) && !dep((j, k))
        mij <- m.get((i, j)); mik <- m.get((i, k)); mjk <- m.get((j, k)) if math.abs(mjk) > 1e-12
      } yield math.sqrt(math.abs(mij * mik / mjk)).min(1.0)
      val a = if (pairs.nonEmpty) pairs.sum / pairs.size else 0.0
      i -> (1.0 + a) / 2.0
    }.toMap
  }

  /** Structure learning (lite) — the closed-form counterpart of the
    * reference's sparse+low-rank covariance split
    * (`learn_structure`, `run_ws.py:116-151`; deps extracted at
    * `get_top_deps_from_inverse_sig`, `:101-114`). Under the latent
    * label model, the abstain-masked moment matrix decomposes as
    * M = m·mᵀ + S: a rank-1 component from the shared latent y
    * (m_i = E[v_i·y] = 2a_i − 1) plus a sparse residual that is
    * nonzero exactly on directly-dependent voter pairs. The reference
    * solves the split as a CVXPY program; here the rank-1 part comes
    * from the triplet closed form and the residual is read off
    * directly — same decomposition, no solver, driver-side on the
    * collected m×m matrix.
    *
    * Returns the top-1 dependency (the reference also keeps k=1,
    * `run_ws.py:236`) when its |residual| clears `minResidual`;
    * None = model no deps, the `run_ws.py:233-235` guard ("if values
    * in J are all too large / nothing stands out, don't model deps").
    */
  def learnTopDependency(
      moments: DataFrame,
      minResidual: Double = 0.05): Option[(String, String, Double)] =
    learnTopDependencyFromMap(momentMap(moments), minResidual)

  /** Structure learning over a pre-collected moment map. */
  def learnTopDependencyFromMap(
      m: Map[(String, String), Double],
      minResidual: Double = 0.05): Option[(String, String, Double)] =
    learnTopDependenciesFromMap(m, 1, minResidual).headOption

  /** Top-k DISJOINT dependencies — `get_top_deps_from_inverse_sig`'s
    * k parameter (`run_ws.py:101-114`). Greedy selection over the
    * residual matrix: strongest |residual| first, skipping any pair
    * touching an already-selected voter (disjointness is what keeps
    * the clique tree trivial — [[junctionTreePredictChain]]), stopping
    * below `minResidual` (the `run_ws.py:233-235` nothing-stands-out
    * guard). Deterministic: ties break on the pair's name order.
    */
  def learnTopDependenciesFromMap(
      m: Map[(String, String), Double],
      k: Int,
      minResidual: Double = 0.05): Seq[(String, String, Double)] = {
    if (m.isEmpty || k <= 0) return Seq.empty
    val corr = flyingSquidFromMap(m, Set.empty).map { case (e, a) => e -> (2.0 * a - 1.0) }
    val residuals = m.toSeq
      .collect {
        case ((i, j), mij) if i < j =>
          (i, j, mij - corr.getOrElse(i, 0.0) * corr.getOrElse(j, 0.0))
      }
      .filter { case (_, _, r) => math.abs(r) >= minResidual }
      .sortBy { case (i, j, r) => (-math.abs(r), i, j) }
    val used = scala.collection.mutable.Set.empty[String]
    residuals.flatMap { case (i, j, r) =>
      if (used(i) || used(j) || used.size / 2 >= k) None
      else { used += i; used += j; Some((i, j, r)) }
    }.take(k)
  }

  /** Top-k dependencies with OVERLAP allowed — the edge set
    * `_set_clique_tree` accepts (`methods.py:123-156` takes any
    * chordal edgeset, not just a matching). Greedy by |residual|
    * like [[learnTopDependenciesFromMap]], but a pair sharing a
    * voter with an already-selected pair is kept rather than
    * skipped; an edge whose addition would make the graph
    * non-chordal is skipped instead (the decode,
    * [[junctionTreePredictTree]], requires chordality exactly as the
    * reference raises NetworkXError on non-chordal input — greedily
    * maintaining it beats failing later).
    */
  def learnTopDependenciesOverlappingFromMap(
      m: Map[(String, String), Double],
      k: Int,
      minResidual: Double = 0.05): Seq[(String, String, Double)] = {
    if (m.isEmpty || k <= 0) return Seq.empty
    val corr = flyingSquidFromMap(m, Set.empty).map { case (e, a) => e -> (2.0 * a - 1.0) }
    val residuals = m.toSeq
      .collect {
        case ((i, j), mij) if i < j =>
          (i, j, mij - corr.getOrElse(i, 0.0) * corr.getOrElse(j, 0.0))
      }
      .filter { case (_, _, r) => math.abs(r) >= minResidual }
      .sortBy { case (i, j, r) => (-math.abs(r), i, j) }
    residuals.foldLeft(Seq.empty[(String, String, Double)]) { (acc, e) =>
      if (acc.size >= k) acc
      else {
        val trial = acc :+ e
        try { cliqueTree(trial.map(t => (t._1, t._2))); trial }
        catch { case _: IllegalArgumentException => acc }
      }
    }
  }

  /** Naive-Bayes posterior vote combination (`methods.py:521`):
    * per key, score each candidate class by Π_i P(v_i | y=c) using
    * per-extractor accuracies; abstains contribute 1. Binary ±1
    * encoding. Returns (key, nb_pred, score_pos, score_neg);
    * tie → +1. Log-domain sum (numerically safe for m extractors).
    */
  def naiveBayesPredict(votes: DataFrame, accs: DataFrame, keyCol: String): DataFrame = {
    val joined = votes.join(broadcast(accs), Seq("extractor"))
    // clamp before logs: an externally-estimated acc of exactly 1.0
    // (or 0.0) would make log() return null and SILENTLY drop that
    // vote from the sum — the [1e-4, 0.9999] window accuracies()
    // already applies, enforced here for any accs source
    val a = least(greatest(col("acc"), lit(1e-4)), lit(0.9999))
    def term(cand: Int) =
      when(col("vote") === 0, 0.0)
        .when(col("vote") === cand, log(a))
        .otherwise(log(lit(1.0) - a))
    joined
      .groupBy(col(keyCol))
      .agg(
        exp(sum(term(1))).as("score_pos"),
        exp(sum(term(-1))).as("score_neg"))
      .withColumn("nb_pred", when(col("score_pos") >= col("score_neg"), 1).otherwise(-1))
      .select(col(keyCol), col("nb_pred"), col("score_pos"), col("score_neg"))
  }

  /** pick_best (`methods.py:344`): the vote of the single most
    * accurate extractor.
    */
  def pickBest(votes: DataFrame, accs: DataFrame, keyCol: String): DataFrame = {
    val best = accs.orderBy(desc("acc"), asc("extractor")).limit(1).select(col("extractor"))
    votes.join(broadcast(best), Seq("extractor")).select(col(keyCol), col("vote").as("pred"))
  }

  /** exp_weight scoring (`methods.py:956-1011`, option 1) at a fixed
    * temperature: voter i carries weight w_i = exp(-eta·(1-acc_i));
    * score(y) = Σ_{i: v_i=y} w_i; pred = argmax (tie → +1, like
    * naiveBayesPredict). Abstains carry no weight; docs whose votes
    * all abstain drop out (callers fill them with the class prior,
    * as the reference does on scores.sum()==0).
    *
    * One broadcast join + one keyed aggregation — same scale shape
    * as the NB combiner.
    */
  def expWeightPredict(votes: DataFrame, accs: DataFrame, keyCol: String, eta: Double): DataFrame =
    votes
      .filter(col("vote") =!= 0)
      .join(broadcast(accs), Seq("extractor"))
      .withColumn("w", exp(lit(-eta) * (lit(1.0) - col("acc"))))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("vote") === 1, col("w")).otherwise(0.0)).as("score_pos"),
        sum(when(col("vote") === -1, col("w")).otherwise(0.0)).as("score_neg"))
      .withColumn("pred", when(col("score_pos") >= col("score_neg"), 1).otherwise(-1))
      .select(col(keyCol), col("pred"), col("score_pos"), col("score_neg"))

  /** exp_weight temperature grid search (`methods.py:969-989`): pick
    * the eta with the best validation accuracy. All etas are scored
    * in ONE pass — each val vote explodes against the eta list, so
    * the sweep is a single aggregation, not |etas| jobs. Ties keep
    * the earliest eta in the list (the reference's strict `>` scan);
    * all-abstain val docs count against accuracy with the prior
    * prediction. (The reference leaves best_eta = -1 when every
    * accuracy is 0 and then exponentiates with it — a latent bug we
    * do not replicate; the first eta wins instead.)
    */
  def expWeightBestEta(
      votes: DataFrame,
      accs: DataFrame,
      valGold: DataFrame,
      keyCol: String,
      etas: Seq[Double] = Seq(0.25, 0.5, 1, 2, 4, 8, 16, 32),
      prior: Int = 1): Double = {
    // restrict to validation docs BEFORE the 8× eta explode — votes
    // covers the whole corpus, valGold is the tiny labeled set; the
    // semi-join keeps the sweep's shuffle at O(|etas| × val), not
    // O(|etas| × corpus)
    val valVotes = votes.join(broadcast(valGold.select(col(keyCol))), Seq(keyCol), "left_semi")
    val scored = valVotes
      .filter(col("vote") =!= 0)
      .join(broadcast(accs), Seq("extractor"))
      .withColumn("eta", explode(typedLit(etas)))
      .withColumn("w", exp(-col("eta") * (lit(1.0) - col("acc"))))
      .groupBy(col("eta"), col(keyCol))
      .agg(
        sum(when(col("vote") === 1, col("w")).otherwise(0.0)).as("sp"),
        sum(when(col("vote") === -1, col("w")).otherwise(0.0)).as("sn"))
      .withColumn("pred", when(col("sp") >= col("sn"), 1).otherwise(-1))
    val etasDf = valGold.sparkSession.createDataFrame(etas.map(Tuple1(_))).toDF("eta")
    val accByEta = valGold
      .crossJoin(broadcast(etasDf))
      .join(scored, Seq("eta", keyCol), "left")
      .withColumn("pred", coalesce(col("pred"), lit(prior)))
      .groupBy(col("eta"))
      .agg(avg(when(col("pred") === col("y"), 1.0).otherwise(0.0)).as("val_acc"))
      .collect()
      .map(r => r.getAs[Double]("eta") -> r.getAs[Double]("val_acc"))
      .toMap
    // maxBy keeps the first max in list order — the reference's
    // strict `>` scan semantics
    etas.maxBy(e => accByEta.getOrElse(e, 0.0))
  }

  /** Junction-tree inference for a learned dependency pair
    * (`methods.py:550` with clique tree `:123-156`): with one learned
    * dep (a, b) the chordal clique tree is the {a, b} clique plus
    * singletons, so exact message passing reduces to naive Bayes with
    * a JOINT factor P(v_a, v_b | y) replacing the pair's independent
    * product. The joint table comes from the same statistics the
    * triplet model already yields, no extra estimation:
    * conditional means m_i = 2a_i − 1 and the learned residual
    * c = E[v_a·v_b|y] − m_a·m_b ([[learnTopDependency]]'s score), via
    * P(v_a=s, v_b=t | y) = ((1 + s·y·m_a)(1 + t·y·m_b) + s·t·c) / 4.
    *
    * Scale shape: the pair's votes pivot per key (one keyed agg), the
    * independents contribute the usual broadcast-join log-sum — same
    * single-shuffle plan as [[naiveBayesPredict]]. Driver holds only
    * the 8-entry joint table.
    *
    * votes: (key, extractor, vote) in ±1/0; abstains (0) fall back to
    * independent semantics (contribute nothing — for the pair, an
    * abstaining partner degrades that row to the marginal term).
    */
  def junctionTreePredict(
      votes: DataFrame,
      accs: DataFrame,
      dep: (String, String),
      residual: Double,
      keyCol: String): DataFrame =
    junctionTreePredictChain(votes, accs, Seq((dep._1, dep._2, residual)), keyCol)

  /** Junction-tree inference for a CHAIN of disjoint learned
    * dependency pairs — the k > 1 case of
    * `get_top_deps_from_inverse_sig` (`run_ws.py:101-114`). With
    * pairwise-disjoint deps the chordal clique tree is k two-voter
    * cliques plus singletons, so exact message passing is still a
    * product of factors: each pair contributes its JOINT
    * P(v_a, v_b | y) table, every untouched voter its usual
    * independent term. (Overlapping pairs would chain cliques through
    * separator voters — rejected here; the reference's top-k selection
    * also yields disjoint pairs in practice because one voter rarely
    * tops two residuals.)
    *
    * Scale shape: ONE keyed aggregation builds every pair's
    * (v_a, v_b) pivot (grouped by key × pair index), one more folds
    * the per-pair joint log-terms per key; the independents keep the
    * broadcast-join log-sum. Driver holds k 18-entry tables.
    *
    * deps: (extractorA, extractorB, residual) — residual as learned
    * by [[learnTopDependency]]. Accuracies are clamped into
    * [1e-4, 0.9999] before logs (a triplet-estimated 1.0 would
    * otherwise log(0) → null and silently drop the vote).
    */
  def junctionTreePredictChain(
      votes: DataFrame,
      accs: DataFrame,
      deps: Seq[(String, String, Double)],
      keyCol: String): DataFrame = {
    require(deps.nonEmpty, "junctionTreePredictChain needs at least one dependency pair")
    val members = deps.flatMap { case (a, b, _) => Seq(a, b) }
    require(members.distinct.size == members.size, s"dependency pairs must be disjoint: $deps")
    def clampD(p: Double) = math.min(math.max(p, 1e-4), 0.9999)
    val accMap = accs.collect().map(r => r.getString(0) -> clampD(r.getDouble(1))).toMap

    // per-pair 18-entry joint log tables, keyed "pairIdx:y:s:t";
    // abstain (0) on one side degrades to the partner's marginal,
    // both abstaining contribute 0 (same as a missing pair)
    val tableEntries = deps.zipWithIndex.flatMap { case ((ea, eb, residual), p) =>
      val (ma, mb) = (2 * accMap(ea) - 1, 2 * accMap(eb) - 1)
      def joint(y: Int, s: Int, t: Int): Double =
        ((1.0 + s * y * ma) * (1.0 + t * y * mb) + s * t * residual) / 4.0
      def pairTerm(y: Int, s: Int, t: Int): Double =
        if (s == 0 && t == 0) 0.0
        else if (s == 0) math.log(math.max((1.0 + t * y * mb) / 2.0, 1e-4))
        else if (t == 0) math.log(math.max((1.0 + s * y * ma) / 2.0, 1e-4))
        else math.log(math.max(joint(y, s, t), 1e-4))
      for { y <- Seq(1, -1); s <- Seq(-1, 0, 1); t <- Seq(-1, 0, 1) }
        yield s"$p:$y:$s:$t" -> pairTerm(y, s, t)
    }
    val pairTable = typedLit(tableEntries.toMap)
    // extractor → (pair index, side): tiny broadcast-style literal maps
    val pairIdx = typedLit(deps.zipWithIndex.flatMap { case ((a, b, _), p) => Seq(a -> p, b -> p) }.toMap)
    val isSideA = typedLit(deps.flatMap { case (a, b, _) => Seq(a -> true, b -> false) }.toMap)

    val depSet = members.toSet
    val indep  = votes.filter(!col("extractor").isin(depSet.toSeq: _*))
    val aCl    = least(greatest(col("acc"), lit(1e-4)), lit(0.9999))
    def term(cand: Int) =
      when(col("vote") === 0, 0.0)
        .when(col("vote") === cand, log(aCl))
        .otherwise(log(lit(1.0) - aCl))
    val indepScores = indep
      .join(broadcast(accs), Seq("extractor"))
      .groupBy(col(keyCol))
      .agg(sum(term(1)).as("li_pos"), sum(term(-1)).as("li_neg"))
    val pairScores = votes
      .filter(col("extractor").isin(depSet.toSeq: _*))
      .withColumn("pr", element_at(pairIdx, col("extractor")))
      .groupBy(col(keyCol), col("pr"))
      .agg(
        coalesce(max(when(element_at(isSideA, col("extractor")), col("vote"))), lit(0)).as("va"),
        coalesce(max(when(!element_at(isSideA, col("extractor")), col("vote"))), lit(0)).as("vb"))
      .withColumn("lp_pos", element_at(pairTable, concat_ws(":", col("pr"), lit(1), col("va"), col("vb"))))
      .withColumn("lp_neg", element_at(pairTable, concat_ws(":", col("pr"), lit(-1), col("va"), col("vb"))))
      .groupBy(col(keyCol))
      .agg(sum(col("lp_pos")).as("lp_pos"), sum(col("lp_neg")).as("lp_neg"))
    // full outer: a key may have only pair votes or only independents
    indepScores
      .join(pairScores, Seq(keyCol), "full_outer")
      .withColumn("score_pos", exp(coalesce(col("li_pos"), lit(0.0)) + coalesce(col("lp_pos"), lit(0.0))))
      .withColumn("score_neg", exp(coalesce(col("li_neg"), lit(0.0)) + coalesce(col("lp_neg"), lit(0.0))))
      .withColumn("jt_pred", when(col("score_pos") >= col("score_neg"), 1).otherwise(-1))
      .select(col(keyCol), col("jt_pred"), col("score_pos"), col("score_neg"))
  }

  /** Chordality check + maximal cliques + clique tree for a voter
    * dependency graph — the driver-side twin of `_set_clique_tree`
    * (`methods.py:123-156`, networkx `is_chordal` /
    * `chordal_graph_cliques` / `maximum_spanning_tree`). The graph is
    * extractor-ensemble sized (~10 voters), so O(m³) checks are free.
    *
    * Returns (maximal cliques, clique-tree edge separators) — one
    * separator entry PER TREE EDGE, so a separator set shared by k+1
    * chained cliques appears k times, which is exactly the number of
    * divisions the factorization Π P(v_C|y) / Π P(v_S|y) needs.
    * (The reference's singleton-separator loop divides by
    * acc^(deg−1) on EVERY edge — `methods.py:484-494` — which
    * over-divides when >2 cliques share a voter; like the html-chunk
    * `use_raw_text` bug, that quirk is not replicated: this engine
    * divides once per tree edge, the textbook junction-tree form.
    * On the exercised ≤2-clique shapes the two agree exactly.)
    */
  private[combine] def cliqueTree(edges: Seq[(String, String)]): (Seq[Seq[String]], Seq[Seq[String]]) = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val adj: Map[String, Set[String]] = verts.map { v =>
      v -> edges.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }.toSet
    }.toMap
    // maximum cardinality search: pick the unnumbered vertex with the
    // most numbered neighbors (ties → name order); reverse(pick
    // order) is a perfect elimination ordering iff the graph is
    // chordal
    val picked = scala.collection.mutable.ArrayBuffer.empty[String]
    val unpicked = scala.collection.mutable.SortedSet.empty[String] ++ verts
    while (unpicked.nonEmpty) {
      val next = unpicked.toSeq.sortBy(v => (-adj(v).count(picked.contains), v)).head
      picked += next
      unpicked -= next
    }
    val elim = picked.reverse.toSeq
    val later = elim.zipWithIndex.map { case (v, i) =>
      v -> elim.drop(i + 1).filter(adj(v)).toSet
    }.toMap
    // PEO test: each vertex's later neighbors must form a clique
    later.foreach { case (v, s) =>
      val ss = s.toSeq
      for { i <- ss.indices; j <- i + 1 until ss.size }
        if (!adj(ss(i))(ss(j)))
          throw new IllegalArgumentException(
            s"dependency graph is not chordal (fill-in needed at $v: ${ss(i)}–${ss(j)}); " +
              "graph triangulation not implemented — matching the reference's NetworkXError " +
              "(methods.py:138-141)")
    }
    // candidate cliques {v} ∪ laterNeighbors(v); keep the maximal ones
    val cands = elim.map(v => (later(v) + v)).distinct
    val cliques = cands
      .filter(c => !cands.exists(o => o != c && c.subsetOf(o)))
      .map(_.toSeq.sorted)
      .sortBy(_.mkString(","))
    // clique tree: maximum spanning forest over |C_i ∩ C_j| weights
    // (Kruskal + union-find; ties → clique name order, deterministic)
    val idx    = cliques.indices
    val parent = scala.collection.mutable.ArrayBuffer(idx: _*)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
    val treeEdges = (for {
      i <- idx; j <- idx if i < j
      w = cliques(i).toSet.intersect(cliques(j).toSet).size if w > 0
    } yield (i, j, w))
      .sortBy { case (i, j, w) => (-w, i, j) }
      .flatMap { case (i, j, w) =>
        val (ri, rj) = (find(i), find(j))
        if (ri == rj) None
        else {
          parent(ri) = rj
          Some(cliques(i).toSet.intersect(cliques(j).toSet).toSeq.sorted)
        }
      }
    (cliques, treeEdges)
  }

  /** Junction-tree inference over an ARBITRARY chordal dependency
    * graph — the general `junction_tree` (`methods.py:549-596` with
    * `_set_clique_tree` `:123-156` and the clique/separator
    * factorization in `get_cond_probs` `:454-499`): edges may SHARE
    * voters, so cliques chain through separator voters. With the
    * label binary and every voter observed, exact message passing
    * collapses to
    *
    *   log P(v | y) = Σ_{max cliques C} log P(v_C | y)
    *                − Σ_{tree edges S}  log P(v_S | y)
    *
    * Clique joints generalize the pair table by pairwise-moment
    * matching (the same statistics the triplet model yields — the
    * reference instead counts labeled train rows,
    * `get_clique_probs` `:428-452`, unavailable unsupervised):
    *
    *   P(v_B = s | y) = 2^{−|B|} [ Π_i (1 + s_i·y·m_i)
    *     + Σ_{(i,j) ∈ E∩B²} s_i s_j c_ij Π_{k≠i,j} (1 + s_k·y·m_k) ]
    *
    * over the NON-ABSTAINING members B (abstainers drop to the
    * sub-clique, exactly how the pair table degrades to a marginal) —
    * it reproduces every first moment y·m_i, every learned edge
    * moment m_i·m_j + c_ij, and marginalizes consistently (summing
    * out a member recovers the sub-clique's table, so clique and
    * separator tables cohere by construction). Disjoint pairs reduce
    * it to [[junctionTreePredictChain]] term for term.
    *
    * Scale shape: unchanged from the chain — ONE keyed aggregation
    * pivots each (clique|separator)-unit's member votes (a voter in
    * d units contributes d rows via a tiny broadcast membership map),
    * one more folds unit log-terms per key; independents keep the
    * broadcast-join log-sum. Driver holds |units| ≤ m tables of
    * ≤ 2·3^arity entries.
    *
    * deps: (extractorA, extractorB, residual) — overlap allowed; the
    * graph they induce must be chordal ([[cliqueTree]] raises
    * otherwise, matching the reference's NetworkXError).
    */
  def junctionTreePredictTree(
      votes: DataFrame,
      accs: DataFrame,
      deps: Seq[(String, String, Double)],
      keyCol: String): DataFrame = {
    require(deps.nonEmpty, "junctionTreePredictTree needs at least one dependency edge")
    def ord(a: String, b: String) = if (a <= b) (a, b) else (b, a)
    val edgeRes = deps.map { case (a, b, r) => ord(a, b) -> r }.toMap
    require(edgeRes.size == deps.size, s"duplicate dependency edges: $deps")
    val (cliques, seps) = cliqueTree(deps.map(d => (d._1, d._2)))
    // units: max cliques add their joint, each tree edge's separator
    // subtracts its marginal (sign baked into the stored log value)
    val units = cliques.map(c => (c, 1)) ++ seps.map(s => (s, -1))
    val maxW  = units.map(_._1.size).max
    require(maxW <= 6, s"clique of ${maxW} voters exceeds the 3^6-entry table bound")

    def clampD(p: Double) = math.min(math.max(p, 1e-4), 0.9999)
    val accMap = accs.collect().map(r => r.getString(0) -> clampD(r.getDouble(1))).toMap
    val m      = accMap.map { case (e, a) => e -> (2 * a - 1) }

    def jointLog(members: Seq[String], y: Int, s: Seq[Int]): Double = {
      val active = members.zip(s).filter(_._2 != 0)
      if (active.isEmpty) return 0.0
      def prodExcept(skip: Set[String]) =
        active.collect { case (v, sv) if !skip(v) => 1.0 + sv * y * m(v) }.product
      val corr = (for {
        ((vi, si), ii) <- active.zipWithIndex
        (vj, sj)       <- active.drop(ii + 1)
        c              <- edgeRes.get(ord(vi, vj))
      } yield si * sj * c * prodExcept(Set(vi, vj))).sum
      val p = (prodExcept(Set.empty) + corr) / math.pow(2.0, active.size)
      math.log(math.max(p, 1e-4))
    }

    // per-unit log tables keyed "unit|y|s1:...:sw" ("x" pads unused
    // slots so one config-string shape serves every arity)
    val tableEntries = units.zipWithIndex.flatMap { case ((members, sign), ui) =>
      def configs(w: Int): Seq[Seq[Int]] =
        if (w == 0) Seq(Seq.empty) else for { rest <- configs(w - 1); v <- Seq(-1, 0, 1) } yield v +: rest
      // "0" both fills unused high slots and is what a MISSING member
      // row coalesces to below — missing vote == abstain, so the two
      // must read identically or an absent row would miss the table
      // and null out the whole unit's term
      for { y <- Seq(1, -1); s <- configs(members.size) } yield {
        val cfg = (s.map(_.toString) ++ Seq.fill(maxW - members.size)("0")).mkString(":")
        s"$ui|$y|$cfg" -> sign * jointLog(members, y, s)
      }
    }
    val table = typedLit(tableEntries.toMap)
    // extractor → its (unit, slot) memberships; a shared voter fans
    // out to every clique/separator that contains it
    val membership = typedLit(
      units.zipWithIndex
        .flatMap { case ((members, _), ui) => members.zipWithIndex.map { case (v, p) => (v, ui, p) } }
        .groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(x => (x._2, x._3)) })

    val depSet = units.flatMap(_._1).distinct
    val indep  = votes.filter(!col("extractor").isin(depSet: _*))
    val aCl    = least(greatest(col("acc"), lit(1e-4)), lit(0.9999))
    def term(cand: Int) =
      when(col("vote") === 0, 0.0)
        .when(col("vote") === cand, log(aCl))
        .otherwise(log(lit(1.0) - aCl))
    val indepScores = indep
      .join(broadcast(accs), Seq("extractor"))
      .groupBy(col(keyCol))
      .agg(sum(term(1)).as("li_pos"), sum(term(-1)).as("li_neg"))
    val slots = (0 until maxW).map(p =>
      coalesce(
        max(when(col("mem").getField("_2") === p, col("vote").cast("string"))),
        lit("0")).as(s"s$p"))
    val cfgCol = concat_ws(":", (0 until maxW).map(p => col(s"s$p")): _*)
    def unitTerm(y: Int) =
      element_at(table, concat_ws("|", col("unit"), lit(y), cfgCol))
    val unitScores = votes
      .filter(col("extractor").isin(depSet: _*))
      .select(col(keyCol), col("vote"), explode(element_at(membership, col("extractor"))).as("mem"))
      .groupBy(col(keyCol), col("mem").getField("_1").as("unit"))
      .agg(slots.head, slots.tail: _*)
      .groupBy(col(keyCol))
      .agg(sum(unitTerm(1)).as("lt_pos"), sum(unitTerm(-1)).as("lt_neg"))
    indepScores
      .join(unitScores, Seq(keyCol), "full_outer")
      .withColumn("score_pos", exp(coalesce(col("li_pos"), lit(0.0)) + coalesce(col("lt_pos"), lit(0.0))))
      .withColumn("score_neg", exp(coalesce(col("li_neg"), lit(0.0)) + coalesce(col("lt_neg"), lit(0.0))))
      .withColumn("jt_pred", when(col("score_pos") >= col("score_neg"), 1).otherwise(-1))
      .select(col(keyCol), col("jt_pred"), col("score_pos"), col("score_neg"))
  }

  /** Relational feature build for the logistic-regression aggregator
    * (`methods.py:884-953`; `ws_utils.py:131-165` get_vote_vectors /
    * get_feature_vector): per key, the ordered vote vector plus
    * (optionally) all pairwise interaction products v_i·v_j — the
    * interactions are what lets a linear model discount correlated
    * voters the way the reference's LR baseline does. Missing votes
    * are abstains (0), so products vanish whenever either side
    * abstains.
    *
    * Long-form output (key, feature, value): one conditional
    * aggregation pivots the votes (single shuffle on the key), the
    * feature explosion is a per-row expression. m voters → m + C(m,2)
    * rows per key; m is extractor-ensemble-sized (~10), never
    * lake-sized.
    */
  def lrFeatures(
      votes: DataFrame,
      keyCol: String,
      extractors: Seq[String],
      withPairwise: Boolean = true): DataFrame = {
    require(extractors.nonEmpty, "lrFeatures needs the extractor list (feature order)")
    val voteCols = extractors.map(e =>
      coalesce(max(when(col("extractor") === e, col("vote"))), lit(0)).cast("double").as(s"v_$e"))
    val pivoted = votes.groupBy(col(keyCol)).agg(voteCols.head, voteCols.tail: _*)
    val singles = extractors.map(e => (e, col(s"v_$e")))
    val pairs =
      if (!withPairwise) Seq.empty
      else for { i <- extractors.indices; j <- extractors.indices if i < j }
        yield (s"${extractors(i)}*${extractors(j)}", col(s"v_${extractors(i)}") * col(s"v_${extractors(j)}"))
    val feats = singles ++ pairs
    pivoted.select(
      col(keyCol),
      explode(array(feats.map { case (n, c) => struct(lit(n).as("feature"), c.as("value")) }: _*)).as("f"))
      .select(col(keyCol), col("f.feature").as("feature"), col("f.value").as("value"))
  }

  /** Fit L2-regularized logistic regression on the LABELED subset of
    * a long-form feature frame — the `logistic_regression` inference
    * mode (`methods.py:884-953`). The training set is gold-sized (the
    * cascade's economics: supervision is sample-scale, the lake pass
    * is where Spark earns its keep), so the solve is driver-side
    * Breeze LBFGS on the collected matrix, deterministic (keys
    * sorted, LBFGS from zero init). Returns ("(bias)" +: features)
    * → weights; the bias is unregularized.
    */
  def logisticRegressionFit(
      features: DataFrame,
      gold: DataFrame,
      keyCol: String,
      featureNames: Seq[String],
      l2: Double = 1e-2,
      maxIter: Int = 200): Map[String, Double] = {
    import breeze.linalg.{DenseMatrix, DenseVector}
    import breeze.optimize.{DiffFunction, LBFGS}
    val idx = featureNames.zipWithIndex.toMap
    val rows = features
      .join(broadcast(gold), Seq(keyCol))
      .groupBy(col(keyCol), col("y"))
      .agg(collect_list(struct(col("feature"), col("value"))).as("fv"))
      .collect()
      .sortBy(_.getAs[Any](keyCol).toString)
    require(rows.nonEmpty, "logisticRegressionFit needs at least one labeled key")
    val d = featureNames.size
    val x = DenseMatrix.zeros[Double](rows.length, d)
    val y = DenseVector.zeros[Double](rows.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      y(i) = r.getAs[Int]("y").toDouble
      r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("fv").foreach { f =>
        idx.get(f.getString(0)).foreach(j => x(i, j) = f.getDouble(1))
      }
    }
    // minimize Σ log(1 + exp(-y (w·x + b))) + l2/2 ||w||²  (bias at
    // slot 0 of the packed vector, excluded from the penalty)
    val obj = new DiffFunction[DenseVector[Double]] {
      def calculate(wb: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val b    = wb(0)
        val w    = wb(1 to d)
        val grad = DenseVector.zeros[Double](d + 1)
        var loss = 0.0
        var i    = 0
        while (i < rows.length) {
          val xi     = x(i, ::).t
          val margin = y(i) * ((w dot xi) + b)
          // log1p(exp(-m)) computed stably on both branches
          loss += (if (margin > 0) math.log1p(math.exp(-margin))
                   else -margin + math.log1p(math.exp(margin)))
          val s = -y(i) / (1.0 + math.exp(margin))
          grad(0) += s
          grad(1 to d) += xi * s
          i += 1
        }
        loss += 0.5 * l2 * (w dot w)
        grad(1 to d) += w * l2
        (loss, grad)
      }
    }
    val sol = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7)
      .minimize(obj, DenseVector.zeros[Double](d + 1))
    (("(bias)" -> sol(0)) +: featureNames.zipWithIndex.map { case (f, j) => f -> sol(j + 1) }).toMap
  }

  /** data_programming MLE (`methods.py:786-880`): fit per-voter
    * accuracies α_i by maximizing the UNSUPERVISED marginal likelihood
    * of the votes under the symmetric generative model
    * P(v | y) = Π_i [v_i = y → β_i·α_i; v_i = −y → β_i·(1−α_i);
    * v_i = 0 → 1−β_i], P(y) = 1/2 — the reference optimizes this
    * exact objective with torch SGD (lr/epochs/seed); here the
    * optimizer is EM, which climbs the same likelihood
    * deterministically with no learning-rate tuning. The coverage
    * β_i is fixed (the reference does not optimize beta either) and
    * cancels from both EM steps, so it never needs estimating.
    *
    * Scale shape: the lake-scale work is ONE aggregation — votes
    * pivot to per-doc sign patterns and EM consumes the (pattern,
    * count) sufficient statistics driver-side (distinct patterns are
    * ensemble-bounded, ≤ 3^m in theory and tiny in practice; m ≈ 10
    * extractors). No per-epoch Spark jobs, unlike a literal SGD port
    * which would shuffle per step.
    *
    * α clamped into [0.5, 0.9999] per iteration (the reference's
    * `alpha.clamp_(0.5, 1)` — accuracy assumed better than random;
    * the upper clamp keeps logs finite). Decode with
    * [[naiveBayesPredict]] over the returned accuracies (β cancels
    * at inference too, as the reference notes).
    */
  /** The lake-scale half of [[dataProgrammingFit]]: per-key vote sign
    * patterns collapsed to (v_e1, …, v_em, n) counts — the sufficient
    * statistics of the symmetric DP model. Two aggregations (key
    * pivot, then pattern count, the second one tiny); output is
    * ensemble-bounded (≤ 3^m rows), never lake-sized.
    */
  def dpPatternCounts(votes: DataFrame, keyCol: String, extractors: Seq[String]): DataFrame = {
    require(extractors.nonEmpty, "dpPatternCounts needs the extractor list")
    val voteCols = extractors.map(e =>
      coalesce(max(when(col("extractor") === e, col("vote"))), lit(0)).as(s"v_$e"))
    votes
      .groupBy(col(keyCol))
      .agg(voteCols.head, voteCols.tail: _*)
      .groupBy(extractors.map(e => col(s"v_$e")): _*)
      .agg(count(lit(1)).as("n"))
  }

  def dataProgrammingFit(
      votes: DataFrame,
      keyCol: String,
      extractors: Seq[String],
      iters: Int = 100,
      tol: Double = 1e-9): Map[String, Double] = {
    val m = extractors.size
    val patterns: Array[(Array[Int], Long)] = dpPatternCounts(votes, keyCol, extractors)
      .collect()
      .map(r => (Array.tabulate(m)(i => r.getInt(i)), r.getLong(m)))
    var alpha = Array.fill(m)(0.7)
    var it    = 0
    var delta = Double.MaxValue
    while (it < iters && delta > tol) {
      // E-step: P(y=1 | pattern) — β and the 1/2 prior cancel in the
      // posterior ratio, only non-abstain match terms remain
      // M-step: α_i ← E[# votes matching the latent label] / E[# non-abstain]
      val num = Array.fill(m)(0.0)
      val den = Array.fill(m)(0.0)
      patterns.foreach { case (v, n) =>
        var lp = 0.0; var ln = 0.0
        var i  = 0
        while (i < m) {
          if (v(i) == 1) { lp += math.log(alpha(i)); ln += math.log(1 - alpha(i)) }
          else if (v(i) == -1) { lp += math.log(1 - alpha(i)); ln += math.log(alpha(i)) }
          i += 1
        }
        val w = 1.0 / (1.0 + math.exp(ln - lp)) // P(y=1 | v)
        i = 0
        while (i < m) {
          if (v(i) != 0) {
            num(i) += n * (if (v(i) == 1) w else 1.0 - w)
            den(i) += n
          }
          i += 1
        }
      }
      val next = Array.tabulate(m)(i =>
        math.min(math.max(if (den(i) > 0) num(i) / den(i) else 0.5, 0.5), 0.9999))
      delta = (0 until m).map(i => math.abs(next(i) - alpha(i))).max
      alpha = next
      it += 1
    }
    extractors.zip(alpha).toMap
  }

  /** Conditional entropy H(Y | votes) (`conditional_entropy`,
    * `methods.py:597-631`): −1/n Σ_docs Σ_y P(y|v) ln P(y|v), with the
    * learned NB posterior treated as the true P(y|v) (exactly the
    * reference's estimator). Relational: per-doc posteriors are the
    * [[naiveBayesPredict]] scores — one keyed aggregation over the
    * vote relation — and the entropy mean is a second, 1-row
    * aggregation; nothing driver-side touches per-doc data.
    * Returns 1 row: (h_cond, n_docs). pPos is the class prior
    * (P(y=+1)); the reference's symmetric DP model uses 1/2.
    */
  def conditionalEntropy(
      votes: DataFrame,
      accs: DataFrame,
      keyCol: String,
      pPos: Double = 0.5): DataFrame = {
    val nb = naiveBayesPredict(votes, accs, keyCol)
    val p  = lit(pPos) * col("score_pos") /
      (lit(pPos) * col("score_pos") + lit(1.0 - pPos) * col("score_neg"))
    val term = (c: org.apache.spark.sql.Column) => when(c > 0, c * log(c)).otherwise(lit(0.0))
    nb.select(p.as("p"))
      .agg((-avg(term(col("p")) + term(lit(1.0) - col("p")))).as("h_cond"), count(lit(1)).as("n_docs"))
  }

  /** Conditional cross-entropy vs gold (`cross_entropy_conditional`,
    * `methods.py:694-707`): −1/n Σ ln P(y = gold_i | v_i) under the
    * same NB posterior. The joint cross-entropy −1/n Σ ln P(v, y)
    * (`cross_entropy`, `methods.py:709-723`) decomposes as this value
    * plus the label-free vote cross-entropy (ln P(v,y) = ln P(y|v) +
    * ln P(v)), so it needs no separate relational pass — see
    * [[entropyFromPatterns]] for the P(v) half.
    * Returns 1 row: (ce_cond, n_docs).
    */
  def crossEntropyConditional(
      votes: DataFrame,
      gold: DataFrame,
      accs: DataFrame,
      keyCol: String,
      pPos: Double = 0.5): DataFrame = {
    val nb = naiveBayesPredict(votes, accs, keyCol).join(broadcast(gold), Seq(keyCol))
    val p  = lit(pPos) * col("score_pos") /
      (lit(pPos) * col("score_pos") + lit(1.0 - pPos) * col("score_neg"))
    nb.select(when(col("y") === 1, p).otherwise(lit(1.0) - p).as("p_gold"))
      .agg((-avg(log(greatest(col("p_gold"), lit(1e-300))))).as("ce_cond"), count(lit(1)).as("n_docs"))
  }

  /** H(Y | MV output) (`conditional_entropy_mv`, `methods.py:669-692`):
    * majority-vote prediction per doc (ties → +1, like
    * [[naiveBayesPredict]]), P(y | ŷ) estimated from gold per
    * predicted class, entropy of that conditional averaged over docs.
    * Two keyed aggregations + one tiny (2-row) join.
    * Returns 1 row: (h_mv, n_docs).
    */
  def conditionalEntropyMv(votes: DataFrame, gold: DataFrame, keyCol: String): DataFrame = {
    val pred = votes
      .groupBy(col(keyCol))
      .agg(when(sum(col("vote")) >= 0, 1).otherwise(-1).as("mv_pred"))
    val term = (c: org.apache.spark.sql.Column) => when(c > 0, -c * log(c)).otherwise(lit(0.0))
    val yAcc = pred
      .join(gold, Seq(keyCol))
      .groupBy(col("mv_pred"))
      .agg(avg(when(col("y") === 1, 1.0).otherwise(0.0)).as("p_pos"))
      .select(col("mv_pred"), (term(col("p_pos")) + term(lit(1.0) - col("p_pos"))).as("h"))
    pred
      .join(broadcast(yAcc), Seq("mv_pred"))
      .agg(avg(col("h")).as("h_mv"), count(lit(1)).as("n_docs"))
  }

  /** H(Y | WS output) (`conditional_entropy_singleton`,
    * `methods.py:632-667`): the per-doc posterior P(ŷ=j | votes) from
    * the NB model weights each predicted class's gold-estimated
    * label-given-prediction entropy. A predicted class no doc lands in
    * contributes 0 (the reference would divide by zero there).
    * Returns 1 row: (h_singleton, n_docs).
    */
  def conditionalEntropySingleton(
      votes: DataFrame,
      gold: DataFrame,
      accs: DataFrame,
      keyCol: String,
      pPos: Double = 0.5): DataFrame = {
    val nb = naiveBayesPredict(votes, accs, keyCol)
    val p  = lit(pPos) * col("score_pos") /
      (lit(pPos) * col("score_pos") + lit(1.0 - pPos) * col("score_neg"))
    val post = nb.select(col(keyCol), p.as("p"), col("nb_pred").as("pred"))
    val term = (c: org.apache.spark.sql.Column) => when(c > 0, -c * log(c)).otherwise(lit(0.0))
    val hByPred = post
      .join(gold, Seq(keyCol))
      .groupBy(col("pred"))
      .agg(avg(when(col("y") === 1, 1.0).otherwise(0.0)).as("p_pos"))
      .agg(
        max(when(col("pred") === 1, term(col("p_pos")) + term(lit(1.0) - col("p_pos")))).as("h_pos"),
        max(when(col("pred") === -1, term(col("p_pos")) + term(lit(1.0) - col("p_pos")))).as("h_neg"))
    post
      .crossJoin(broadcast(hByPred))
      .agg(
        avg(col("p") * coalesce(col("h_pos"), lit(0.0)) +
          (lit(1.0) - col("p")) * coalesce(col("h_neg"), lit(0.0))).as("h_singleton"),
        count(lit(1)).as("n_docs"))
  }

  /** Driver-side entropy diagnostics from the already-collected DP
    * sufficient statistics ([[dpPatternCounts]] output — ensemble-
    * bounded, never lake-sized): returns (H(Y|votes),
    * −1/n Σ ln P(v)) under the symmetric coverage model
    * P(v_i|y) = [v_i=0 → 1−β_i; match → β_i·α_i; mismatch →
    * β_i·(1−α_i)] — `cross_entropy_no_label`, `methods.py:725-735`.
    * Joint cross-entropy = [[crossEntropyConditional]] + the second
    * member. Zero additional Spark jobs beyond the pattern collect.
    */
  def entropyFromPatterns(
      patternCounts: DataFrame,
      extractors: Seq[String],
      accs: Map[String, Double],
      coverage: Map[String, Double],
      pPos: Double = 0.5): (Double, Double) = {
    val m = extractors.size
    val rows: Array[(Array[Int], Long)] = patternCounts
      .collect()
      .map(r => (Array.tabulate(m)(i => r.getInt(i)), r.getLong(m)))
    val n = rows.map(_._2).sum.toDouble
    var hCond = 0.0
    var ceV   = 0.0
    rows.foreach { case (v, cnt) =>
      var lp = math.log(pPos); var ln = math.log(1.0 - pPos)
      var i  = 0
      while (i < m) {
        val a = accs(extractors(i)); val b = coverage(extractors(i))
        if (v(i) == 0) { lp += math.log(1.0 - b); ln += math.log(1.0 - b) }
        else if (v(i) == 1) { lp += math.log(b * a); ln += math.log(b * (1.0 - a)) }
        else { lp += math.log(b * (1.0 - a)); ln += math.log(b * a) }
        i += 1
      }
      // log-sum-exp for ln P(v); posterior from the same two terms
      val mx  = math.max(lp, ln)
      val lv  = mx + math.log(math.exp(lp - mx) + math.exp(ln - mx))
      val p   = math.exp(lp - lv)
      val ent = -(if (p > 0) p * math.log(p) else 0.0) - (if (p < 1) (1 - p) * math.log(1 - p) else 0.0)
      hCond += cnt / n * ent
      ceV -= cnt / n * lv
    }
    (hCond, ceV)
  }

  /** Per-extractor coverage P(vote ≠ 0) — the β of the symmetric DP
    * model; one aggregation over the vote relation.
    */
  def coverageMap(votes: DataFrame): Map[String, Double] =
    votes
      .groupBy(col("extractor"))
      .agg(avg(when(col("vote") =!= 0, 1.0).otherwise(0.0)).as("beta"))
      .collect()
      .map(r => r.getString(0) -> math.min(math.max(r.getDouble(1), 1e-4), 1.0 - 1e-4))
      .toMap

  /** Neighborhood structure learning — the reference's supervised
    * Ising model selection (`structure_learning`/`learn_neighborhood`,
    * `binary_deps.py:244-374`; Ravikumar et al. 2010): for each voter
    * v, fit an L1-regularized logistic regression predicting v's vote
    * from every OTHER voter's vote, with the vote–label edge frozen at
    * the scaled training accuracy θ_v = E[v_v·y] (the reference
    * initializes it and does not optimize it — only vote–vote edges
    * are learned). Nonzero weights are graph edges; the sparsity
    * pattern is the dependency structure.
    *
    * Spark-first shape: the ONLY lake-scale work is the same
    * sufficient-statistics aggregation [[dpPatternCounts]] uses,
    * extended with the gold label — (pattern, y, count) rows,
    * ensemble-bounded. All m neighborhood fits run driver-side on
    * those counts by deterministic proximal gradient (ISTA: gradient
    * step + soft-threshold), zero-initialized, no RNG — unlike the
    * reference's 50k-epoch torch SGD per vertex, the whole solve
    * costs zero additional Spark jobs.
    *
    * Returns θ(u→v) for every ordered pair (response voter u,
    * covariate voter v); symmetrize by max(|θ_uv|, |θ_vu|) to read
    * off edges. Supervised: needs gold (key, y ∈ ±1) on a labeled
    * subset, like the reference's train split.
    */
  def neighborhoodStructure(
      votes: DataFrame,
      gold: DataFrame,
      keyCol: String,
      extractors: Seq[String],
      l1Lambda: Double = 0.2,
      iters: Int = 3000,
      lr: Double = 0.25): Map[(String, String), Double] = {
    require(extractors.size >= 2, "need at least 2 voters to learn structure")
    val m = extractors.size
    val voteCols = extractors.map(e =>
      coalesce(max(when(col("extractor") === e, col("vote"))), lit(0)).as(s"v_$e"))
    val stats: Array[(Array[Int], Int, Double)] = votes
      .groupBy(col(keyCol))
      .agg(voteCols.head, voteCols.tail: _*)
      .join(broadcast(gold), Seq(keyCol))
      .groupBy((extractors.map(e => col(s"v_$e")) :+ col("y")): _*)
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (Array.tabulate(m)(i => r.getInt(i)), r.getInt(m), r.getLong(m + 1).toDouble))
    val total = stats.map(_._3).sum
    // frozen vote-label potentials: θ_v = E[v_v·y] (abstain = 0)
    val accTheta = Array.tabulate(m)(i => stats.map { case (v, y, n) => n * v(i) * y }.sum / total)

    val out = scala.collection.mutable.Map.empty[(String, String), Double]
    for (v <- 0 until m) {
      // response rows: v's non-abstain votes; covariates: other votes
      val rows = stats.filter(_._1(v) != 0)
      val w    = Array.fill(m)(0.0) // slot v unused
      var it   = 0
      while (it < iters) {
        val grad = Array.fill(m)(0.0)
        rows.foreach { case (x, y, n) =>
          val s      = x(v).toDouble
          var margin = accTheta(v) * y
          var u      = 0
          while (u < m) { if (u != v) margin += w(u) * x(u); u += 1 }
          // d/dw of n·log(1+exp(-2·s·margin)) = -2·s·x_u·n·σ(-2·s·margin)
          val sig = 1.0 / (1.0 + math.exp(2.0 * s * margin))
          u = 0
          while (u < m) { if (u != v) grad(u) -= 2.0 * s * x(u) * n * sig; u += 1 }
        }
        var u = 0
        while (u < m) {
          if (u != v) {
            val step = w(u) - lr * grad(u) / total
            val thr  = lr * l1Lambda
            w(u) = if (step > thr) step - thr else if (step < -thr) step + thr else 0.0
          }
          u += 1
        }
        it += 1
      }
      for (u <- 0 until m if u != v) out((extractors(v), extractors(u))) = w(u)
    }
    out.toMap
  }

  /** Distributed LR scoring over long-form features: one broadcast
    * join feature→weight, one keyed sum, a sigmoid — the lake-scale
    * half of the LR aggregator. Returns (key, p_pos, lr_pred).
    */
  def lrPredict(features: DataFrame, keyCol: String, weights: Map[String, Double]): DataFrame = {
    val spark = features.sparkSession
    val bias  = weights.getOrElse("(bias)", 0.0)
    val wDf = spark
      .createDataFrame(weights.toSeq.filter(_._1 != "(bias)").sorted)
      .toDF("feature", "w")
    features
      .join(broadcast(wDf), Seq("feature"))
      .groupBy(col(keyCol))
      .agg(sum(col("value") * col("w")).as("margin"))
      .withColumn("p_pos", lit(1.0) / (lit(1.0) + exp(-(col("margin") + lit(bias)))))
      .withColumn("lr_pred", when(col("p_pos") >= 0.5, 1).otherwise(-1))
      .select(col(keyCol), col("p_pos"), col("lr_pred"))
  }

  /** Sparse + low-rank structure learning — the reference's
    * `learn_structure` convex program (`run_ws.py:116-153`:
    * min ½‖R·O^½‖²_F − tr(R) + λ(γ‖S‖₁ + ‖L‖_*), R = S − L,
    * S, L ⪰ 0, solved there by cvxpy/SCS) as a deterministic
    * driver-side proximal-gradient (ISTA) split — no solver
    * dependency. The smooth part f(R) = ½tr(R·O·R) − tr(R) pulls
    * S − L toward O⁻¹; the nuclear-norm prox on L absorbs the
    * latent label's rank-1 component of the precision matrix, so S
    * keeps the SPARSE direct voter–voter dependencies — including
    * OVERLAPPING edges the residual heuristic
    * ([[learnTopDependenciesFromMap]]) structurally cannot return
    * more than one of. Reference hyperparameters kept: λ = 1/√m,
    * γ = 1e-8; step = 1/‖O‖₂ (the Lipschitz constant of ∇f).
    *
    * Known deviation — the reference's joint R = S − L ⪰ 0
    * constraint is NOT enforced here: S and L are each projected
    * PSD per iteration (the prox steps), but their DIFFERENCE is
    * unconstrained, so on ill-conditioned vote covariances the
    * fixed point can differ from the cvxpy/SCS solution of the
    * fully-constrained program. Downstream this is mitigated twice:
    * [[structureAllConnected]] vetoes degenerate fits where the
    * conditioning went bad enough to connect everything, and
    * `structureTopDeps(minAbs)` plus wsCombine's
    * fall-back-on-failure keep a wrong Ĵ from silently steering the
    * decode. Only the RANKING of |Ĵ| off-diagonals is consumed, not
    * Ĵ's values — the planted-recovery specs (LabelModelSpec) pin
    * that ranking against known structure.
    *
    * Spark-first shape: the ONLY lake-scale work is one self-join
    * aggregation producing the m×m second-moment matrix plus one
    * per-voter mean aggregation (missing rows are zero votes, so
    * sums over present rows equal sums over the reference's
    * zero-filled L matrix). The iteration runs on the collected m×m
    * matrices — m is extractor-ensemble-sized, so a few hundred
    * eigendecompositions cost microseconds and zero Spark jobs.
    *
    * Returns Ĵ = S with the diagonal zeroed (`run_ws.py:149-152`),
    * keyed by ordered (i, j) name pairs, i < j; read dependencies
    * off the largest |Ĵ| entries (`get_top_deps_from_inverse_sig`,
    * `run_ws.py:101-114` — [[structureTopDeps]]).
    */
  def learnStructureSparseLowRank(
      votes: DataFrame,
      keyCol: String,
      iters: Int = 500): Map[(String, String), Double] = {
    import breeze.linalg.{diag, eigSym, DenseMatrix}
    val exts = votes.select(col("extractor")).distinct().collect().map(_.getString(0)).sorted
    val m    = exts.length
    require(m >= 2, "need at least 2 voters to learn structure")
    val n = votes.select(col(keyCol)).distinct().count().toDouble
    require(n > 1, "need at least 2 keyed rows")
    val sums = votes
      .groupBy(col("extractor"))
      .agg(sum(col("vote")).cast("double").as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val mu = exts.map(e => sums.getOrElse(e, 0.0) / n)
    val a  = votes.select(col(keyCol), col("extractor").as("e_i"), col("vote").as("v_i"))
    val b  = votes.select(col(keyCol), col("extractor").as("e_j"), col("vote").as("v_j"))
    val prods = a
      .join(b, Seq(keyCol))
      .groupBy(col("e_i"), col("e_j"))
      .agg(sum(col("v_i") * col("v_j")).cast("double").as("sp"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    // sigma_O = LᵀL/(n−1) − μμᵀ, symmetrized (run_ws.py:119-122)
    val bigO = DenseMatrix.tabulate(m, m) { (i, j) =>
      prods.getOrElse((exts(i), exts(j)), 0.0) / (n - 1.0) - mu(i) * mu(j)
    }
    val os = (bigO + bigO.t) * 0.5

    val lam   = 1.0 / math.sqrt(m.toDouble)
    val gamma = 1e-8
    val eta   = 1.0 / math.max(eigSym(os).eigenvalues.toArray.map(math.abs).max, 1e-9)
    // eigenvalue soft-threshold + PSD clip: the prox of τ‖·‖_* over
    // the PSD cone for a symmetric argument (τ = 0 → pure PSD
    // projection, the S-step's constraint)
    def psdShrink(x: DenseMatrix[Double], tau: Double): DenseMatrix[Double] = {
      val es   = eigSym((x + x.t) * 0.5)
      val vals = es.eigenvalues.map(v => math.max(v - tau, 0.0))
      es.eigenvectors * diag(vals) * es.eigenvectors.t
    }
    def softThresh(x: DenseMatrix[Double], t: Double): DenseMatrix[Double] =
      x.map(v => math.signum(v) * math.max(math.abs(v) - t, 0.0))
    val eye = DenseMatrix.eye[Double](m)
    var s   = DenseMatrix.zeros[Double](m, m)
    var l   = DenseMatrix.zeros[Double](m, m)
    (0 until iters).foreach { _ =>
      val r = s - l
      val g = ((r * os) + (os * r)) * 0.5 - eye
      s = psdShrink(softThresh(s - (g * eta), eta * lam * gamma), 0.0)
      l = psdShrink(l + (g * eta), eta * lam)
    }
    (for { i <- 0 until m; j <- i + 1 until m } yield (exts(i), exts(j)) -> s(i, j)).toMap
  }

  /** Multiclass structure learning — `learn_structure_multiclass`
    * (`run_ws.py:157-166`) + the mean reduction `run_ws.py:231-232`:
    * per class c, votes reduce to the one-vs-all indicator
    * (vote == c → 1 else 0), [[learnStructureSparseLowRank]] runs on
    * each, and Ĵ is the per-pair mean over classes. k tiny m×m
    * problems — the Spark side is k indicator aggregations.
    *
    * `abstain`: rows with this vote value are DROPPED before the
    * indicator (a dropped row contributes 0 to every class's sums —
    * proper "not a vote for anything"). The reference instead maps
    * abstain −1 to 0 (`all_votes_no_abstains`, `run_ws.py:223`) and
    * then treats 0-as-a-class, so co-abstaining voters acquire
    * phantom class-0 correlation — a quirk, not replicated (like the
    * html-chunk `use_raw_text` bug); pass `abstain = None` on vote
    * relations that genuinely have no abstain value.
    */
  def learnStructureSparseLowRankMulticlass(
      votes: DataFrame,
      keyCol: String,
      classes: Seq[Int],
      abstain: Option[Int] = Some(-1),
      iters: Int = 500): Map[(String, String), Double] = {
    require(classes.size >= 2, "multiclass structure learning needs ≥ 2 classes")
    require(!abstain.exists(classes.contains), s"abstain value $abstain collides with a class id")
    val voting = abstain.fold(votes)(a => votes.filter(col("vote") =!= a))
    classes
      .map { c =>
        val ind = voting.withColumn("vote", when(col("vote") === c, 1).otherwise(0))
        learnStructureSparseLowRank(ind, keyCol, iters)
      }
      .flatMap(_.toSeq)
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).sum / classes.size }
  }

  /** The `run_ws.py:236-239` everything-connected guard
    * (`get_min_off_diagonal`): when even the SMALLEST |Ĵ|
    * off-diagonal clears `thresh`, structure learning has connected
    * everything to everything — model no deps rather than trust it.
    */
  def structureAllConnected(j: Map[(String, String), Double], thresh: Double = 1.0): Boolean =
    j.nonEmpty && j.values.map(_.abs).min >= thresh

  /** Top-k dependency pairs off the sparse factor —
    * `get_top_deps_from_inverse_sig` (`run_ws.py:101-114`): largest
    * |Ĵ| off-diagonals, with the `run_ws.py:233-235` nothing-stands-
    * out guard as `minAbs`. Deterministic tie-break on names.
    */
  def structureTopDeps(
      j: Map[(String, String), Double],
      k: Int,
      minAbs: Double = 1e-3): Seq[(String, String, Double)] =
    j.toSeq
      .map { case ((a, b), v) => (a, b, v) }
      .filter { case (_, _, v) => math.abs(v) >= minAbs }
      .sortBy { case (a, b, v) => (-math.abs(v), a, b) }
      .take(k)

  /** Pairwise Cohen's kappa between extractors — chance-corrected
    * inter-annotator agreement (Cohen 1960, the WS-diagnostics
    * staple next to the confusion matrix): κ = (p_o − p_e)/(1 − p_e)
    * with p_o the observed agreement and p_e the chance agreement
    * from the per-category marginals. High κ between two extractors
    * means they are redundant voters; κ ≈ 0 means independent — the
    * signal used to pick a diverse top-k.
    *
    * Engine-exact: the marginal products and their sum stay in LONG
    * integer arithmetic (counts ≤ doc count, so no overflow below
    * ~3B docs per pair); only the final two divisions run in
    * doubles, identically ordered in the SQL replay. Perfectly
    * concentrated pairs (p_e = 1) define κ = 1 (agreement is total
    * when both extractors are the same constant).
    *
    * One self-join on the doc key + one aggregation per pair;
    * categories are an explicit small set (votes are label ints).
    */
  def cohensKappa(votes: DataFrame, keyCol: String, cats: Seq[Int] = Seq(-1, 0, 1)): DataFrame = {
    val a = votes.select(col(keyCol), col("extractor").as("ex_a"), col("vote").as("va"))
    val b = votes.select(col(keyCol), col("extractor").as("ex_b"), col("vote").as("vb"))
    val catAggs = cats.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(col("va") === c, 1L).otherwise(0L)).as(s"na_$i"),
        sum(when(col("vb") === c, 1L).otherwise(0L)).as(s"nb_$i"))
    }
    val peNum = cats.indices.map(i => col(s"na_$i") * col(s"nb_$i")).reduce(_ + _)
    a.join(b, Seq(keyCol))
      .filter(col("ex_a") < col("ex_b"))
      .groupBy(col("ex_a"), col("ex_b"))
      .agg(
        count(lit(1)).as("n"),
        (Seq(sum(when(col("va") === col("vb"), 1L).otherwise(0L)).as("n_agree")) ++ catAggs): _*)
      .withColumn("pe_num", peNum)
      .select(
        col("ex_a"),
        col("ex_b"),
        col("n"),
        round(col("n_agree").cast("double") / col("n"), 6).as("po"),
        round(col("pe_num").cast("double") / (col("n") * col("n")), 6).as("pe"),
        round(
          when(col("pe_num") === col("n") * col("n"), 1.0)
            .otherwise(
              (col("n_agree").cast("double") / col("n")
                - col("pe_num").cast("double") / (col("n") * col("n")))
                / (lit(1.0) - col("pe_num").cast("double") / (col("n") * col("n")))),
          6).as("kappa"))
  }
}
