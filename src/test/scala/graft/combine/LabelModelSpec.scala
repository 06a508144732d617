package graft.combine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class LabelModelSpec extends SparkSpec {
  import spark.implicits._

  /** Planted-accuracy sampler (the role of the reference's Ising PGM
    * fixture, `pgm.py:8-117`): y ~ ±1 uniform, vote_i = y with prob
    * acc_i else -y. Deterministic seed.
    *
    * `deps`: Ising-style pairwise dependence — for each ((a, b), ρ),
    * voter b COPIES voter a's realized vote with prob ρ instead of
    * voting from its own planted accuracy (the exponential-family
    * coupling's effect, reduced to its copy mechanism: conditional on
    * y, a and b stay correlated). ρ = 0 recovers the
    * conditionally-independent sampler.
    */
  private def plantedVotes(
      n: Int,
      accs: Map[String, Double],
      seed: Int = 7,
      deps: Map[(String, String), Double] = Map.empty) = {
    val rnd     = new Random(seed)
    val copyOf  = deps.map { case ((a, b), rho) => b -> (a, rho) }
    val rows = (0 until n).flatMap { i =>
      val y = if (rnd.nextBoolean()) 1 else -1
      val own = accs.toSeq.sortBy(_._1).map { case (e, a) =>
        e -> (if (rnd.nextDouble() < a) y else -y)
      }.toMap
      accs.keys.toSeq.sorted.map { e =>
        val v = copyOf.get(e) match {
          case Some((src, rho)) if rnd.nextDouble() < rho => own(src)
          case _                                          => own(e)
        }
        (i.toLong, e, v, y)
      }
    }
    val df = rows.toDF("doc_id", "extractor", "vote", "y")
    (df.select("doc_id", "extractor", "vote"), df.select("doc_id", "y").distinct())
  }

  test("accuracies estimates match empirical rates") {
    val (votes, gold) = plantedVotes(2000, Map("a" -> 0.9, "b" -> 0.7, "c" -> 0.55))
    val accs = LabelModel.accuracies(votes, gold, "doc_id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(accs("a") - 0.9) < 0.03)
    assert(math.abs(accs("b") - 0.7) < 0.03)
    assert(math.abs(accs("c") - 0.55) < 0.03)
  }

  test("flyingSquid triplets recover planted accuracies unsupervised") {
    val planted        = Map("a" -> 0.9, "b" -> 0.75, "c" -> 0.65)
    val (votes, _)     = plantedVotes(8000, planted)
    val moments        = LabelModel.pairwiseMoments(votes, "doc_id")
    val recovered      = LabelModel.flyingSquidAccuracies(moments)
    planted.foreach { case (e, a) =>
      assert(math.abs(recovered(e) - a) < 0.06, s"$e: got ${recovered(e)}, want ~$a")
    }
  }

  test("naiveBayesPredict beats the best single extractor on noisy votes") {
    val (votes, gold) = plantedVotes(3000, Map("a" -> 0.8, "b" -> 0.75, "c" -> 0.7))
    val accs          = LabelModel.accuracies(votes, gold, "doc_id")
    val pred          = LabelModel.naiveBayesPredict(votes, accs, "doc_id")
    val acc = pred.join(gold, "doc_id")
      .agg(avg(when(col("nb_pred") === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.8, s"NB accuracy $acc should beat best single (0.8)")
  }

  test("entropy diagnostics match hand-computed values") {
    // 2 extractors with FIXED accuracies (0.8, 0.6), 4 docs covering
    // agree / disagree / single-vote / all-abstain patterns — every
    // posterior and entropy below is hand-computed from the NB model
    val votes = Seq(
      (1L, "a", 1), (1L, "b", 1),   // p(y=+1|v) = .48/.56     = 6/7
      (2L, "a", 1), (2L, "b", -1),  // p = .32/.44             = 8/11
      (3L, "a", -1), (3L, "b", 0),  // p = .2/1.0              = 0.2
      (4L, "a", 0), (4L, "b", 0)    // p                       = 0.5
    ).toDF("doc_id", "extractor", "vote")
    val gold = Seq((1L, 1), (2L, -1), (3L, -1), (4L, 1)).toDF("doc_id", "y")
    val accs = Seq(("a", 0.8), ("b", 0.6)).toDF("extractor", "acc")

    def h(p: Double) = -p * math.log(p) - (1 - p) * math.log(1 - p)
    val wantH = (h(6.0 / 7) + h(8.0 / 11) + h(0.2) + h(0.5)) / 4
    val gotH  = LabelModel.conditionalEntropy(votes, accs, "doc_id").head.getDouble(0)
    assert(math.abs(gotH - wantH) < 1e-9, s"H(y|v): got $gotH, want $wantH")

    // p of the GOLD label per doc: 6/7, 3/11, 0.8, 0.5
    val wantCe = -(math.log(6.0 / 7) + math.log(3.0 / 11) + math.log(0.8) + math.log(0.5)) / 4
    val gotCe  = LabelModel.crossEntropyConditional(votes, gold, accs, "doc_id").head.getDouble(0)
    assert(math.abs(gotCe - wantCe) < 1e-9, s"CE(y|v): got $gotCe, want $wantCe")

    // MV variant: preds (+1,+1,-1,+1) — ties vote +1; P(y=+1|pred=+1)
    // = 2/3 over docs {1,2,4}, P(y=+1|pred=-1) = 0 → per-pred
    // entropies h(2/3) and 0, averaged over docs
    val wantMv = 3.0 / 4 * h(2.0 / 3)
    val gotMv  = LabelModel.conditionalEntropyMv(votes, gold, "doc_id").head.getDouble(0)
    assert(math.abs(gotMv - wantMv) < 1e-9, s"H(y|mv): got $gotMv, want $wantMv")

    // singleton variant: NB argmax partitions docs the same way here,
    // so ce_i = p_i·h(2/3) + (1-p_i)·0 and the mean is h(2/3)·mean(p)
    val meanP    = (6.0 / 7 + 8.0 / 11 + 0.2 + 0.5) / 4
    val wantSing = h(2.0 / 3) * meanP
    val gotSing  = LabelModel.conditionalEntropySingleton(votes, gold, accs, "doc_id").head.getDouble(0)
    assert(math.abs(gotSing - wantSing) < 1e-9, s"H(y|ws): got $gotSing, want $wantSing")

    // driver-side halves from the DP sufficient statistics: same
    // H(y|v) (coverage cancels in the posterior), and the label-free
    // vote cross-entropy −mean ln P(v) with β_a=3/4, β_b=1/2
    val patterns = LabelModel.dpPatternCounts(votes, "doc_id", Seq("a", "b"))
    val cov      = LabelModel.coverageMap(votes)
    assert(math.abs(cov("a") - 0.75) < 1e-9 && math.abs(cov("b") - 0.5) < 1e-9)
    val (hPat, ceV) = LabelModel.entropyFromPatterns(
      patterns, Seq("a", "b"), Map("a" -> 0.8, "b" -> 0.6), cov)
    assert(math.abs(hPat - wantH) < 1e-9, s"pattern H: got $hPat, want $wantH")
    // P(v) per doc: .105, .0825, .1875, .125 (hand-computed)
    val wantCeV = -(math.log(0.105) + math.log(0.0825) + math.log(0.1875) + math.log(0.125)) / 4
    assert(math.abs(ceV - wantCeV) < 1e-9, s"CE(v): got $ceV, want $wantCeV")
  }

  test("conditionalEntropySingleton: a predicted class with no docs contributes 0") {
    // every doc predicts +1 (unanimous positive votes) → the pred=-1
    // entropy row is absent; the reference would divide by zero there,
    // the engine's coalesce treats the empty class as zero entropy
    val votes = Seq((1L, "a", 1), (1L, "b", 1), (2L, "a", 1), (2L, "b", 1))
      .toDF("doc_id", "extractor", "vote")
    val gold = Seq((1L, 1), (2L, -1)).toDF("doc_id", "y")
    val accs = Seq(("a", 0.8), ("b", 0.6)).toDF("extractor", "acc")
    // both docs: p = .48/.56 = 6/7, pred +1; P(y=+1|pred=+1) = 1/2 →
    // H = ln 2; ce = mean(p·ln2 + (1-p)·0) = (6/7)·ln2
    val got  = LabelModel.conditionalEntropySingleton(votes, gold, accs, "doc_id").head.getDouble(0)
    val want = 6.0 / 7 * math.log(2)
    assert(math.abs(got - want) < 1e-9, s"got $got, want $want")
  }

  test("snorkel_lm cross-check: unsupervised EM matches the supervised conditional table and decode") {
    // the reference's snorkel_lm (methods.py:761-784) fits Snorkel's
    // MeTaL label model and reads back get_conditional_probs() — the
    // P(vote | y) table. The engine's declared stance: its
    // unsupervised fitters solve the SAME latent-variable model, so on
    // one shared fixture the DP-EM marginal MLE must (1) recover the
    // parameters the supervised estimate sees, (2) reproduce the
    // conditional-probability table, (3) decode like the supervised
    // model — the numerical content of the MeTaL cross-check without
    // a torch/Snorkel dependency
    val planted       = Map("a" -> 0.85, "b" -> 0.7, "c" -> 0.6)
    val (votes, gold) = plantedVotes(8000, planted)
    val em            = LabelModel.dataProgrammingFit(votes, "doc_id", Seq("a", "b", "c"))
    // (1) parameter recovery vs the supervised accuracies
    val sup = LabelModel.accuracies(votes, gold, "doc_id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    planted.keys.foreach { e =>
      assert(math.abs(em(e) - sup(e)) < 0.03, s"$e: EM ${em(e)} vs supervised ${sup(e)}")
    }
    // (2) conditional-probability table: model-implied P(v|y) vs the
    // empirical confusion estimates (get_conditional_probs analogue;
    // no abstains in this fixture, so P(v=y|y)=α, P(v=-y|y)=1-α)
    LabelModel.confusionMatrix(votes, gold, "doc_id").collect().foreach { r =>
      val (e, y, v, p) = (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(4))
      val want         = if (v == y) em(e) else 1.0 - em(e)
      assert(math.abs(p - want) < 0.03, s"P(v=$v|y=$y) for $e: empirical $p vs model $want")
    }
    // (3) decode agreement: NB posterior argmax under EM params vs
    // under supervised params
    val accsEm  = em.toSeq.toDF("extractor", "acc")
    val accsSup = LabelModel.accuracies(votes, gold, "doc_id")
    val predEm = LabelModel.naiveBayesPredict(votes, accsEm, "doc_id")
      .select(col("doc_id"), col("nb_pred").as("pred_em"))
    val predSup = LabelModel.naiveBayesPredict(votes, accsSup, "doc_id")
      .select(col("doc_id"), col("nb_pred").as("pred_sup"))
    val agree = predEm.join(predSup, "doc_id")
      .agg(avg(when(col("pred_em") === col("pred_sup"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(agree > 0.99, s"decode agreement $agree < 0.99")
  }

  test("confusionMatrix clips probabilities into [1e-4, 0.9999]") {
    val votes = Seq((1L, "e", 1), (2L, "e", 1)).toDF("doc_id", "extractor", "vote")
    val gold  = Seq((1L, 1), (2L, 1)).toDF("doc_id", "y")
    val p     = LabelModel.confusionMatrix(votes, gold, "doc_id").select("p").head.getDouble(0)
    assert(p == 0.9999)
  }

  test("pickBest returns the top extractor's votes") {
    val votes = Seq((1L, "good", 1), (1L, "bad", -1)).toDF("doc_id", "extractor", "vote")
    val accs  = Seq(("good", 0.9), ("bad", 0.6)).toDF("extractor", "acc")
    assert(rows(LabelModel.pickBest(votes, accs, "doc_id")) == Seq(Seq(1L, 1)))
  }

  test("expWeightPredict: high eta follows the accurate voter, eta→0 is plain MV") {
    // one strong voter vs two weak dissenters
    val votes = Seq((1L, "good", 1), (1L, "bad1", -1), (1L, "bad2", -1))
      .toDF("doc_id", "extractor", "vote")
    val accs = Seq(("good", 0.95), ("bad1", 0.55), ("bad2", 0.55)).toDF("extractor", "acc")
    val hot  = LabelModel.expWeightPredict(votes, accs, "doc_id", eta = 8.0)
    assert(rows(hot.select("doc_id", "pred")) == Seq(Seq(1L, 1)))
    val cold = LabelModel.expWeightPredict(votes, accs, "doc_id", eta = 0.0)
    assert(rows(cold.select("doc_id", "pred")) == Seq(Seq(1L, -1))) // unweighted: 2 beat 1
  }

  test("cohensKappa matches hand-computed agreement on planted votes") {
    // 4 docs, two voters: agree on 3 (docs 1,2,4), disagree on 1.
    // marginals: a votes (1,1,-1,1) → p(1)=3/4; b votes (1,-1,-1,1) →
    // p(1)=1/2. po=3/4; pe=(3*2 + 1*2)/16 = 0.5; κ=(0.75-0.5)/0.5=0.5
    val votes = Seq(
      (1L, "a", 1), (1L, "b", 1),
      (2L, "a", 1), (2L, "b", -1),
      (3L, "a", -1), (3L, "b", -1),
      (4L, "a", 1), (4L, "b", 1)).toDF("doc_id", "extractor", "vote")
    val got = LabelModel.cohensKappa(votes, "doc_id").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.75 && r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
    // perfectly concentrated pair (both constant): pe = 1 → κ defined 1
    val const = Seq((1L, "a", 1), (1L, "b", 1), (2L, "a", 1), (2L, "b", 1))
      .toDF("doc_id", "extractor", "vote")
    assert(LabelModel.cohensKappa(const, "doc_id").head.getDouble(5) == 1.0)
  }

  test("learnTopDependency recovers a planted correlated voter pair; retrain un-inflates it") {
    // b copies a 60% of the time; c/d/e are honest independents.
    // The a–b moment is contaminated: E[v_a·v_b] ≈ ρ + (1−ρ)m_a·m_b
    // instead of m_a·m_b, so independent triplets through the a–b
    // edge overestimate both voters.
    val planted = Map("a" -> 0.75, "b" -> 0.75, "c" -> 0.8, "d" -> 0.7, "e" -> 0.65)
    val (votes, _) = plantedVotes(12000, planted, deps = Map(("a", "b") -> 0.6))
    val moments    = LabelModel.pairwiseMoments(votes, "doc_id")

    val dep = LabelModel.learnTopDependency(moments)
    assert(dep.isDefined, "structure learning should find the planted dependency")
    val (di, dj, res) = dep.get
    assert(Set(di, dj) == Set("a", "b"), s"recovered ($di,$dj), want (a,b)")
    assert(res > 0.2, s"copy-dependence residual should be strongly positive, got $res")

    val indep = LabelModel.flyingSquidAccuracies(moments)
    val aware = LabelModel.flyingSquidAccuracies(moments, Set((di, dj)))
    // independent model mis-weights the correlated pair upward;
    // excluding the contaminated edge pulls both back toward truth
    Seq("a", "b").foreach { e =>
      assert(indep(e) > planted(e) + 0.03, s"$e: independent estimate ${indep(e)} should be inflated")
      assert(
        math.abs(aware(e) - planted(e)) < math.abs(indep(e) - planted(e)),
        s"$e: dep-aware ${aware(e)} should beat independent ${indep(e)} vs truth ${planted(e)}")
      assert(math.abs(aware(e) - planted(e)) < 0.06, s"$e: dep-aware ${aware(e)} vs truth ${planted(e)}")
    }
    // honest voters stay recovered
    Seq("c", "d", "e").foreach { e =>
      assert(math.abs(aware(e) - planted(e)) < 0.06, s"$e: ${aware(e)} vs ${planted(e)}")
    }
  }

  test("learnTopDependency declines to model deps on independent votes") {
    val (votes, _) = plantedVotes(12000, Map("a" -> 0.85, "b" -> 0.75, "c" -> 0.65, "d" -> 0.7))
    val moments    = LabelModel.pairwiseMoments(votes, "doc_id")
    assert(LabelModel.learnTopDependency(moments).isEmpty)
  }

  test("wsCombine with learnDeps stays correct when a voter pair is correlated") {
    import org.apache.spark.sql.functions.{col => c}
    // string-valued votes through the full ws pipeline: b copies a
    val planted    = Map("a" -> 0.75, "b" -> 0.75, "c" -> 0.8, "d" -> 0.7, "e" -> 0.65)
    val (votes, gold) = plantedVotes(4000, planted, deps = Map(("a", "b") -> 0.6))
    val sv = votes.withColumn("value", when(c("vote") === 1, "yes").otherwise("no"))
      .select(c("doc_id"), c("extractor"), c("value"))
    val pred = Combiners.wsCombine(sv, "doc_id", learnDeps = true)
    val acc = pred
      .join(gold, "doc_id")
      .withColumn("py", when(c("value") === "yes", 1).otherwise(-1))
      .agg(avg(when(c("py") === c("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.8, s"dep-aware ws accuracy $acc")
  }

  test("wsCombine(structureLearn) uses the convex learner end-to-end and stays correct") {
    import org.apache.spark.sql.functions.{col => c}
    // the run_ws path: learn_structure on the vote matrix → guard →
    // top-1 dep → dep-aware retrain → junction-tree decode
    val planted       = Map("a" -> 0.75, "b" -> 0.75, "c" -> 0.8, "d" -> 0.7, "e" -> 0.65)
    val (votes, gold) = plantedVotes(4000, planted, deps = Map(("a", "b") -> 0.6))
    val sv = votes.withColumn("value", when(c("vote") === 1, "yes").otherwise("no"))
      .select(c("doc_id"), c("extractor"), c("value"))
    val pred = Combiners.wsCombine(sv, "doc_id", learnDeps = true, structureLearn = true)
    val acc = pred
      .join(gold, "doc_id")
      .withColumn("py", when(c("value") === "yes", 1).otherwise(-1))
      .agg(avg(when(c("py") === c("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.8, s"structure-learned ws accuracy $acc")
    // the learner itself must surface the planted pair on this fixture
    val pm = votes.select(c("doc_id"), c("extractor"), c("vote"))
    val j  = LabelModel.learnStructureSparseLowRank(pm, "doc_id")
    assert(LabelModel.structureTopDeps(j, 1).map { case (i, k, _) => Set(i, k) } == Seq(Set("a", "b")),
      s"J top: ${j.toSeq.sortBy(-_._2.abs).take(3)}")
  }

  test("junctionTreePredict matches hand-computed pair-clique posteriors") {
    // pair (a,b) with m_a=0.6, m_b=0.2 (accs 0.8, 0.6), residual 0.1;
    // independent e with acc 0.7. doc 1: va=1, vb=-1, ve=1;
    // doc 2: va=1, vb=0 (abstain → marginal), no e vote.
    val votes = Seq(
      (1L, "a", 1), (1L, "b", -1), (1L, "e", 1),
      (2L, "a", 1), (2L, "b", 0)).toDF("doc_id", "extractor", "vote")
    val accs = Seq(("a", 0.8), ("b", 0.6), ("e", 0.7)).toDF("extractor", "acc")
    val got = LabelModel.junctionTreePredict(votes, accs, ("a", "b"), 0.1, "doc_id")
      .orderBy("doc_id").collect()
    val (ma, mb, c) = (0.6, 0.2, 0.1)
    def joint(y: Int, s: Int, t: Int) = ((1 + s * y * ma) * (1 + t * y * mb) + s * t * c) / 4.0
    // doc 1: independent e contributes log(0.7) vs log(0.3)
    val d1pos = math.exp(math.log(0.7) + math.log(joint(1, 1, -1)))
    val d1neg = math.exp(math.log(0.3) + math.log(joint(-1, 1, -1)))
    assert(math.abs(got(0).getDouble(2) - d1pos) < 1e-12)
    assert(math.abs(got(0).getDouble(3) - d1neg) < 1e-12)
    assert(got(0).getInt(1) == (if (d1pos >= d1neg) 1 else -1))
    // doc 2: abstaining b → a's marginal (1 ± m_a)/2, no independents
    val d2pos = (1 + ma) / 2.0
    val d2neg = (1 - ma) / 2.0
    assert(math.abs(got(1).getDouble(2) - d2pos) < 1e-12)
    assert(math.abs(got(1).getDouble(3) - d2neg) < 1e-12)
    assert(got(1).getInt(1) == 1)
  }

  test("junctionTreePredict under planted correlation is at least as accurate as independent NB") {
    val planted       = Map("a" -> 0.75, "b" -> 0.75, "c" -> 0.8, "d" -> 0.7, "e" -> 0.65)
    val (votes, gold) = plantedVotes(12000, planted, deps = Map(("a", "b") -> 0.6))
    val moments       = LabelModel.pairwiseMoments(votes, "doc_id")
    val dep           = LabelModel.learnTopDependency(moments).get
    val (di, dj, _)   = dep
    val aware         = LabelModel.flyingSquidAccuracies(moments, Set((di, dj)))
    // residual consistent with the dep-aware conditional means
    val mab = moments
      .filter((col("e_i") === di && col("e_j") === dj) || (col("e_i") === dj && col("e_j") === di))
      .head.getAs[Double]("moment")
    val c      = mab - (2 * aware(di) - 1) * (2 * aware(dj) - 1)
    val accDf  = aware.toSeq.sorted.toDF("extractor", "acc")
    val indep  = LabelModel.flyingSquidAccuracies(moments)
    val accIndep = indep.toSeq.sorted.toDF("extractor", "acc")
    def accOf(pred: org.apache.spark.sql.DataFrame, cn: String) = pred
      .join(gold, "doc_id")
      .agg(avg(when(col(cn) === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    val jtAcc = accOf(LabelModel.junctionTreePredict(votes, accDf, (di, dj), c, "doc_id"), "jt_pred")
    val nbAcc = accOf(LabelModel.naiveBayesPredict(votes, accIndep, "doc_id"), "nb_pred")
    assert(jtAcc >= nbAcc - 1e-9, s"jt $jtAcc vs independent nb $nbAcc")
    assert(jtAcc > 0.8, s"jt accuracy $jtAcc")
  }

  /** Ising draws → (votes df, gold df). */
  private def isingVotes(model: IsingSampler.Model, n: Int, seed: Long) = {
    val draws = IsingSampler.sample(model, n, seed)
    val votes = IsingSampler.toVoteRows(draws).toDF("doc_id", "extractor", "vote")
    val gold  = draws.map(d => (d.key, d.y)).toDF("doc_id", "y")
    (votes, gold)
  }

  test("Ising property: structure learning recovers the planted pair and JT beats NB, across theta settings") {
    // exponential-family ground truth (pgm.py:8-117): 5 voters with
    // accuracy potentials, one planted pairwise potential on (0,1),
    // swept over three coupling strengths. At every setting the
    // residual must single out the planted pair and the pair-clique
    // posterior must not lose to the independent NB decode that
    // double-counts the correlated voters; at the strongest coupling
    // it must strictly win.
    val thetaAcc = Seq(0.55, 0.50, 0.60, 0.45, 0.40)
    val results = Seq(0.4, 0.8, 1.2).map { thetaDep =>
      val model = IsingSampler.Model(thetaY = 0.0, thetaAcc = thetaAcc, deps = Map((0, 1) -> thetaDep))
      val (votes, gold) = isingVotes(model, n = 8000, seed = 42 + (thetaDep * 10).toInt)
      val mm  = LabelModel.momentMap(LabelModel.pairwiseMoments(votes, "doc_id"))
      val dep = LabelModel.learnTopDependencyFromMap(mm)
      assert(dep.isDefined, s"theta=$thetaDep: no dependency found")
      val (di, dj, res) = dep.get
      assert(Set(di, dj) == Set("lf_0", "lf_1"), s"theta=$thetaDep: recovered ($di,$dj)")
      assert(res > 0.0, s"theta=$thetaDep: residual $res should be positive")
      val aware    = LabelModel.flyingSquidFromMap(mm, Set((di, dj)))
      val indep    = LabelModel.flyingSquidFromMap(mm, Set.empty)
      val mab      = mm((di, dj))
      val residual = mab - (2 * aware(di) - 1) * (2 * aware(dj) - 1)
      val accDf    = aware.toSeq.sorted.toDF("extractor", "acc")
      val accIndep = indep.toSeq.sorted.toDF("extractor", "acc")
      def accOf(pred: org.apache.spark.sql.DataFrame, cn: String) = pred
        .join(gold, "doc_id")
        .agg(avg(when(col(cn) === col("y"), 1.0).otherwise(0.0)))
        .head.getDouble(0)
      val jt = accOf(LabelModel.junctionTreePredict(votes, accDf, (di, dj), residual, "doc_id"), "jt_pred")
      val nb = accOf(LabelModel.naiveBayesPredict(votes, accIndep, "doc_id"), "nb_pred")
      assert(jt >= nb - 1e-9, s"theta=$thetaDep: jt $jt lost to nb $nb")
      (thetaDep, jt, nb)
    }
    val (tMax, jtMax, nbMax) = results.last
    assert(jtMax > nbMax, s"theta=$tMax: jt $jtMax should strictly beat nb $nbMax under strong coupling")
  }

  test("Ising two planted pairs: k=2 structure learning + chain junction tree") {
    // the adversarial regime for independent NB: two WEAK voter pairs,
    // each strongly coupled (near-duplicates), against two strong
    // honest voters. NB counts each near-duplicate twice, so the four
    // weak voters can outvote the strong pair; the chain junction tree
    // collapses each coupled pair toward one effective voter.
    val thetaAcc = Seq(0.3, 0.3, 0.3, 0.3, 0.8, 0.7)
    val model = IsingSampler.Model(
      thetaY   = 0.0,
      thetaAcc = thetaAcc,
      deps     = Map((0, 1) -> 1.5, (2, 3) -> 1.5))
    val (votes, gold) = isingVotes(model, n = 8000, seed = 99)
    val mm   = LabelModel.momentMap(LabelModel.pairwiseMoments(votes, "doc_id"))
    val deps = LabelModel.learnTopDependenciesFromMap(mm, k = 2)
    assert(deps.size == 2, s"expected 2 deps, got $deps")
    assert(
      deps.map { case (i, j, _) => Set(i, j) }.toSet == Set(Set("lf_0", "lf_1"), Set("lf_2", "lf_3")),
      s"recovered $deps")
    val depPairs = deps.map { case (i, j, _) => (i, j) }.toSet
    val aware    = LabelModel.flyingSquidFromMap(mm, depPairs)
    val indep    = LabelModel.flyingSquidFromMap(mm, Set.empty)
    // chain deps with residuals re-derived from the dep-aware means
    val chain = deps.map { case (i, j, _) => (i, j, mm((i, j)) - (2 * aware(i) - 1) * (2 * aware(j) - 1)) }
    val accDf    = aware.toSeq.sorted.toDF("extractor", "acc")
    val accIndep = indep.toSeq.sorted.toDF("extractor", "acc")
    def accOf(pred: org.apache.spark.sql.DataFrame, cn: String) = pred
      .join(gold, "doc_id")
      .agg(avg(when(col(cn) === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    val jt = accOf(LabelModel.junctionTreePredictChain(votes, accDf, chain, "doc_id"), "jt_pred")
    val nb = accOf(LabelModel.naiveBayesPredict(votes, accIndep, "doc_id"), "nb_pred")
    assert(jt > nb, s"chain jt $jt should beat independent nb $nb with two strong planted pairs")
  }

  test("junctionTreePredictChain rejects overlapping pairs; single-pair chain equals junctionTreePredict") {
    val votes = Seq((1L, "a", 1), (1L, "b", -1), (1L, "e", 1)).toDF("doc_id", "extractor", "vote")
    val accs  = Seq(("a", 0.8), ("b", 0.6), ("e", 0.7)).toDF("extractor", "acc")
    intercept[IllegalArgumentException] {
      LabelModel.junctionTreePredictChain(votes, accs, Seq(("a", "b", 0.1), ("b", "e", 0.1)), "doc_id")
    }
    val single = LabelModel.junctionTreePredict(votes, accs, ("a", "b"), 0.1, "doc_id").collect()
    val chain  = LabelModel.junctionTreePredictChain(votes, accs, Seq(("a", "b", 0.1)), "doc_id").collect()
    assert(single.map(_.toSeq).toSeq == chain.map(_.toSeq).toSeq)
  }

  test("logistic regression recovers planted voter quality and beats the best single voter") {
    // balanced ensemble: the optimal combiner genuinely beats the
    // best single voter (with one dominant voter, always-follow-the
    // -leader is optimal and nothing can exceed its accuracy)
    val planted       = Map("a" -> 0.8, "b" -> 0.75, "c" -> 0.7)
    val (votes, gold) = plantedVotes(4000, planted)
    val names         = Seq("a", "b", "c")
    val featNames     = names ++ Seq("a*b", "a*c", "b*c")
    val feats         = LabelModel.lrFeatures(votes, "doc_id", names)
    // train on half the docs, score everywhere (the labeled subset is
    // sample-sized; scoring is the distributed half)
    val trainGold = gold.filter(col("doc_id") % 2 === 0)
    val w         = LabelModel.logisticRegressionFit(feats, trainGold, "doc_id", featNames)
    assert(w("a") > w("b") && w("b") > 0, s"weights should track planted quality: $w")
    assert(w("a") > w("c"), s"weights should track planted quality: $w")
    val pred = LabelModel.lrPredict(feats, "doc_id", w)
    val acc = pred.join(gold, "doc_id")
      .agg(avg(when(col("lr_pred") === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.8, s"LR accuracy $acc should beat the best single voter (0.8)")
  }

  test("logistic regression with interactions discounts an Ising-coupled pair") {
    // correlated weak pair + strong honest voter: interactions give
    // the linear model the term it needs to not double-count the pair
    val model = IsingSampler.Model(
      thetaY   = 0.0,
      thetaAcc = Seq(0.3, 0.3, 0.9),
      deps     = Map((0, 1) -> 1.5))
    val (votes, gold) = isingVotes(model, n = 6000, seed = 7)
    val names     = Seq("lf_0", "lf_1", "lf_2")
    val featNames = names ++ Seq("lf_0*lf_1", "lf_0*lf_2", "lf_1*lf_2")
    val feats     = LabelModel.lrFeatures(votes, "doc_id", names)
    val trainGold = gold.filter(col("doc_id") % 2 === 0)
    val w         = LabelModel.logisticRegressionFit(feats, trainGold, "doc_id", featNames)
    val pred      = LabelModel.lrPredict(feats, "doc_id", w)
    def accOf(p: org.apache.spark.sql.DataFrame, cn: String) = p
      .join(gold, "doc_id")
      .agg(avg(when(col(cn) === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    val lrAcc = accOf(pred, "lr_pred")
    // independent NB with triplet accs double-counts the coupled pair
    val mm    = LabelModel.momentMap(LabelModel.pairwiseMoments(votes, "doc_id"))
    val indep = LabelModel.flyingSquidFromMap(mm, Set.empty)
    val nbAcc = accOf(
      LabelModel.naiveBayesPredict(votes, indep.toSeq.sorted.toDF("extractor", "acc"), "doc_id"),
      "nb_pred")
    assert(lrAcc >= nbAcc - 1e-9, s"LR $lrAcc should not lose to independent NB $nbAcc")
    assert(lrAcc > 0.85, s"LR accuracy $lrAcc")
  }

  test("dataProgrammingFit recovers planted accuracies by unsupervised EM on the marginal likelihood") {
    // balanced ensemble (see the LR test): the optimal combiner must
    // genuinely beat the best single voter for the decode assertion
    val planted       = Map("a" -> 0.8, "b" -> 0.75, "c" -> 0.7)
    val (votes, gold) = plantedVotes(8000, planted)
    val alphas        = LabelModel.dataProgrammingFit(votes, "doc_id", Seq("a", "b", "c"))
    planted.foreach { case (e, a) =>
      assert(math.abs(alphas(e) - a) < 0.04, s"$e: got ${alphas(e)}, want ~$a")
    }
    // decode with NB over the learned accs (beta cancels, methods.py:858)
    val pred = LabelModel.naiveBayesPredict(
      votes, alphas.toSeq.sorted.toDF("extractor", "acc"), "doc_id")
    val acc = pred.join(gold, "doc_id")
      .agg(avg(when(col("nb_pred") === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.8, s"DP decode accuracy $acc should beat the best single voter (0.8)")
  }

  test("dataProgrammingFit handles abstains: accuracies match the Ising model's implied rates") {
    // no deps → P(v_i = y | v_i != 0) = sigmoid(2 theta_i); a quarter
    // of votes abstain, exercising the pattern space with zeros
    val thetas = Seq(0.6, 0.5, 0.4)
    val model  = IsingSampler.Model(thetaY = 0.0, thetaAcc = thetas, pAbstain = 0.25)
    val (votes, _) = isingVotes(model, n = 8000, seed = 11)
    val alphas = LabelModel.dataProgrammingFit(votes, "doc_id", Seq("lf_0", "lf_1", "lf_2"))
    thetas.zipWithIndex.foreach { case (t, i) =>
      val want = 1.0 / (1.0 + math.exp(-2 * t))
      assert(math.abs(alphas(s"lf_$i") - want) < 0.04, s"lf_$i: got ${alphas(s"lf_$i")}, want ~$want")
    }
  }

  test("neighborhoodStructure recovers the planted Ising edges and zeros the rest") {
    // two planted pairwise potentials among 5 voters; supervised
    // (gold available), like the reference's train split
    val model = IsingSampler.Model(
      thetaY   = 0.0,
      thetaAcc = Seq(0.5, 0.5, 0.5, 0.5, 0.6),
      deps     = Map((0, 1) -> 0.9, (2, 3) -> 0.9))
    val (votes, gold) = isingVotes(model, n = 8000, seed = 23)
    val names  = (0 until 5).map(i => s"lf_$i")
    val thetas = LabelModel.neighborhoodStructure(votes, gold, "doc_id", names, l1Lambda = 0.05)
    def edge(a: Int, b: Int) =
      math.max(math.abs(thetas((s"lf_$a", s"lf_$b"))), math.abs(thetas((s"lf_$b", s"lf_$a"))))
    val planted = Seq(edge(0, 1), edge(2, 3))
    val absent = for {
      a <- 0 until 5; b <- 0 until 5 if a < b
      if !(Set(a, b) == Set(0, 1)) && !(Set(a, b) == Set(2, 3))
    } yield edge(a, b)
    assert(planted.forall(_ > 0.3), s"planted edges too weak: $planted")
    assert(absent.forall(_ < 0.15), s"phantom edges: $absent")
    assert(planted.min > absent.max * 2, s"separation: planted $planted vs absent $absent")
  }

  test("expWeightBestEta grid-picks a temperature that beats plain MV on planted votes") {
    val (votes, gold) = plantedVotes(2000, Map("a" -> 0.92, "b" -> 0.55, "c" -> 0.55))
    val accs          = LabelModel.accuracies(votes, gold, "doc_id")
    val eta           = LabelModel.expWeightBestEta(votes, accs, gold, "doc_id")
    val pred          = LabelModel.expWeightPredict(votes, accs, "doc_id", eta)
    val acc = pred.join(gold, "doc_id")
      .agg(avg(when(col("pred") === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    // plain majority vote of (0.92, 0.55, 0.55) lands ~0.65; weighting
    // toward the strong voter must recover ~0.9
    assert(acc > 0.85, s"exp-weight accuracy $acc should track the strong voter")
  }

  test("cliqueTree: paths, triangles, stars, and the non-chordal rejection") {
    // path a–b–c: two pair cliques chained through separator {b}
    val (pathCl, pathSep) = LabelModel.cliqueTree(Seq(("a", "b"), ("b", "c")))
    assert(pathCl.map(_.toSet).toSet == Set(Set("a", "b"), Set("b", "c")))
    assert(pathSep == Seq(Seq("b")))
    // triangle: one 3-clique, no separators
    val (triCl, triSep) = LabelModel.cliqueTree(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    assert(triCl.map(_.toSet) == Seq(Set("a", "b", "c")) && triSep.isEmpty)
    // star through b: three cliques, separator {b} once PER TREE EDGE
    // (the k−1 divisions the factorization needs — not the
    // reference's per-edge deg−1 exponent, methods.py:484-494)
    val (starCl, starSep) = LabelModel.cliqueTree(Seq(("a", "b"), ("b", "c"), ("b", "d")))
    assert(starCl.map(_.toSet).toSet == Set(Set("a", "b"), Set("b", "c"), Set("b", "d")))
    assert(starSep == Seq(Seq("b"), Seq("b")))
    // chordless 4-cycle → the reference's NetworkXError analogue
    intercept[IllegalArgumentException] {
      LabelModel.cliqueTree(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")))
    }
    // chorded 4-cycle is fine: two triangles over separator {a, c}
    val (chCl, chSep) = LabelModel.cliqueTree(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("a", "c")))
    assert(chCl.map(_.toSet).toSet == Set(Set("a", "b", "c"), Set("a", "c", "d")))
    assert(chSep.map(_.toSet) == Seq(Set("a", "c")))
  }

  test("junctionTreePredictTree matches hand-computed exact inference on a 3-clique star sharing a voter") {
    // edges (a,b),(b,c),(b,d) — three pair cliques share voter b, so
    // the decode must divide out b's marginal once per tree edge;
    // e stays independent
    val votes = Seq(
      (1L, "a", 1), (1L, "b", -1), (1L, "c", 1), (1L, "d", -1), (1L, "e", 1),
      (2L, "a", 1), (2L, "b", 0), (2L, "c", -1),
      (3L, "b", 1)).toDF("doc_id", "extractor", "vote")
    val accs = Seq(("a", 0.8), ("b", 0.6), ("c", 0.7), ("d", 0.55), ("e", 0.65)).toDF("extractor", "acc")
    val deps = Seq(("a", "b", 0.1), ("b", "c", 0.15), ("b", "d", 0.05))
    val got = LabelModel.junctionTreePredictTree(votes, accs, deps, "doc_id")
      .orderBy("doc_id").collect()
    // hand computation, written independently of the engine's table
    // plumbing: per-pair joint with abstain degradation, singleton
    // marginals for the separator, log-domain sum
    val mM = Map("a" -> 0.6, "b" -> 0.2, "c" -> 0.4, "d" -> 0.1, "e" -> 0.3)
    def pairT(y: Int, s: Int, t: Int, ma: Double, mb: Double, c: Double): Double =
      if (s == 0 && t == 0) 0.0
      else if (s == 0) math.log(math.max((1.0 + t * y * mb) / 2.0, 1e-4))
      else if (t == 0) math.log(math.max((1.0 + s * y * ma) / 2.0, 1e-4))
      else math.log(math.max(((1.0 + s * y * ma) * (1.0 + t * y * mb) + s * t * c) / 4.0, 1e-4))
    def margT(y: Int, s: Int, mv: Double): Double =
      if (s == 0) 0.0 else math.log(math.max((1.0 + s * y * mv) / 2.0, 1e-4))
    def eTerm(y: Int, v: Int): Double =
      if (v == 0) 0.0 else if (v == y) math.log(0.65) else math.log(0.35)
    def score(y: Int, va: Int, vb: Int, vc: Int, vd: Int, ve: Int): Double =
      math.exp(
        eTerm(y, ve) +
          pairT(y, va, vb, mM("a"), mM("b"), 0.1) +
          pairT(y, vb, vc, mM("b"), mM("c"), 0.15) +
          pairT(y, vb, vd, mM("b"), mM("d"), 0.05) -
          2.0 * margT(y, vb, mM("b")))
    val expected = Seq(
      (1L, (score(1, 1, -1, 1, -1, 1), score(-1, 1, -1, 1, -1, 1))),
      (2L, (score(1, 1, 0, -1, 0, 0), score(-1, 1, 0, -1, 0, 0))),
      (3L, (score(1, 0, 1, 0, 0, 0), score(-1, 0, 1, 0, 0, 0))))
    expected.zip(got).foreach { case ((id, (ep, en)), row) =>
      assert(row.getLong(0) == id)
      assert(math.abs(row.getDouble(2) - ep) < 1e-12, s"doc $id score_pos: got ${row.getDouble(2)}, want $ep")
      assert(math.abs(row.getDouble(3) - en) < 1e-12, s"doc $id score_neg: got ${row.getDouble(3)}, want $en")
      assert(row.getInt(1) == (if (ep >= en) 1 else -1), s"doc $id pred")
    }
  }

  test("junctionTreePredictTree matches the hand-written triangle joint and reduces to the chain on disjoint pairs") {
    val votes = Seq(
      (1L, "a", 1), (1L, "b", -1), (1L, "c", 1),
      (2L, "a", -1), (2L, "b", -1), (2L, "c", 0)).toDF("doc_id", "extractor", "vote")
    val accs = Seq(("a", 0.8), ("b", 0.6), ("c", 0.7)).toDF("extractor", "acc")
    // triangle: one 3-voter clique — second-order joint, written out
    val tri = LabelModel.junctionTreePredictTree(
      votes, accs, Seq(("a", "b", 0.1), ("b", "c", 0.12), ("a", "c", 0.08)), "doc_id")
      .orderBy("doc_id").collect()
    val (ma, mb, mc) = (0.6, 0.2, 0.4)
    def tripleP(y: Int, sa: Int, sb: Int, sc: Int): Double =
      ((1 + sa * y * ma) * (1 + sb * y * mb) * (1 + sc * y * mc) +
        sa * sb * 0.1 * (1 + sc * y * mc) +
        sb * sc * 0.12 * (1 + sa * y * ma) +
        sa * sc * 0.08 * (1 + sb * y * mb)) / 8.0
    def pairAbP(y: Int, sa: Int, sb: Int): Double =
      ((1 + sa * y * ma) * (1 + sb * y * mb) + sa * sb * 0.1) / 4.0
    // doc 1: all three vote → the full triple joint
    assert(math.abs(tri(0).getDouble(2) - math.max(tripleP(1, 1, -1, 1), 1e-4)) < 1e-12)
    assert(math.abs(tri(0).getDouble(3) - math.max(tripleP(-1, 1, -1, 1), 1e-4)) < 1e-12)
    // doc 2: c abstains → the clique degrades to the (a,b) sub-joint
    assert(math.abs(tri(1).getDouble(2) - pairAbP(1, -1, -1)) < 1e-12)
    assert(math.abs(tri(1).getDouble(3) - pairAbP(-1, -1, -1)) < 1e-12)
    // disjoint pairs: the general tree decode must equal the chain
    val votes2 = Seq(
      (1L, "a", 1), (1L, "b", -1), (1L, "c", 1), (1L, "d", 1), (1L, "e", -1),
      (2L, "a", 1), (2L, "c", -1), (2L, "e", 1)).toDF("doc_id", "extractor", "vote")
    val accs2 = Seq(("a", 0.8), ("b", 0.6), ("c", 0.7), ("d", 0.55), ("e", 0.65)).toDF("extractor", "acc")
    val dj    = Seq(("a", "b", 0.1), ("c", "d", 0.2))
    val chain = LabelModel.junctionTreePredictChain(votes2, accs2, dj, "doc_id").orderBy("doc_id").collect()
    val tree  = LabelModel.junctionTreePredictTree(votes2, accs2, dj, "doc_id").orderBy("doc_id").collect()
    chain.zip(tree).foreach { case (cr, tr) =>
      assert(cr.getLong(0) == tr.getLong(0) && cr.getInt(1) == tr.getInt(1))
      assert(math.abs(cr.getDouble(2) - tr.getDouble(2)) < 1e-12)
      assert(math.abs(cr.getDouble(3) - tr.getDouble(3)) < 1e-12)
    }
  }

  test("Ising overlapping pairs: chordal structure learning + tree junction tree beat independent NB") {
    // voter 1 is coupled to BOTH 0 and 2 — the overlapping case the
    // chain decode rejects: three weak correlated voters against two
    // honest ones. The overlap-aware learner must recover both edges
    // and the clique-tree decode must not double-count the triple.
    // enough independent voters (4..6) that the triplet-median
    // accuracy estimates stay clean despite the coupled triple —
    // with only two honest voters the contaminated triplets leak a
    // phantom residual onto them
    val thetaAcc = Seq(0.35, 0.35, 0.35, 0.8, 0.7, 0.6, 0.5)
    val model = IsingSampler.Model(
      thetaY   = 0.0,
      thetaAcc = thetaAcc,
      deps     = Map((0, 1) -> 1.2, (1, 2) -> 1.2))
    val (votes, gold) = isingVotes(model, n = 8000, seed = 123)
    val mm   = LabelModel.momentMap(LabelModel.pairwiseMoments(votes, "doc_id"))
    val deps = LabelModel.learnTopDependenciesOverlappingFromMap(mm, k = 2)
    assert(
      deps.map { case (i, j, _) => Set(i, j) }.toSet == Set(Set("lf_0", "lf_1"), Set("lf_1", "lf_2")),
      s"recovered $deps")
    val depPairs = deps.map { case (i, j, _) => (i, j) }.toSet
    val aware    = LabelModel.flyingSquidFromMap(mm, depPairs)
    val indep    = LabelModel.flyingSquidFromMap(mm, Set.empty)
    val reDer = deps.map { case (i, j, _) => (i, j, mm((i, j)) - (2 * aware(i) - 1) * (2 * aware(j) - 1)) }
    val accDf    = aware.toSeq.sorted.toDF("extractor", "acc")
    val accIndep = indep.toSeq.sorted.toDF("extractor", "acc")
    def accOf(pred: org.apache.spark.sql.DataFrame, cn: String) = pred
      .join(gold, "doc_id")
      .agg(avg(when(col(cn) === col("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    val jt = accOf(LabelModel.junctionTreePredictTree(votes, accDf, reDer, "doc_id"), "jt_pred")
    val nb = accOf(LabelModel.naiveBayesPredict(votes, accIndep, "doc_id"), "nb_pred")
    assert(jt > nb, s"tree jt $jt should beat independent nb $nb with an overlapping coupled triple")
  }

  test("sparse+low-rank structure learning recovers overlapping planted deps the residual heuristic cannot") {
    // voter 1 coupled to BOTH 0 and 2: the disjoint residual greedy
    // (get_top_deps analog) can return at most ONE of the two edges
    // (both touch lf_1); the S−L split must surface BOTH as the top
    // |J| off-diagonals, separated from every phantom edge
    val thetaAcc = Seq(0.35, 0.35, 0.35, 0.8, 0.7, 0.6, 0.5)
    val model = IsingSampler.Model(
      thetaY   = 0.0,
      thetaAcc = thetaAcc,
      deps     = Map((0, 1) -> 1.2, (1, 2) -> 1.2))
    val (votes, _) = isingVotes(model, n = 8000, seed = 321)
    val j    = LabelModel.learnStructureSparseLowRank(votes, "doc_id")
    val top2 = LabelModel.structureTopDeps(j, 2)
    assert(
      top2.map { case (a, b, _) => Set(a, b) }.toSet == Set(Set("lf_0", "lf_1"), Set("lf_1", "lf_2")),
      s"top-2 from S: $top2 (J = ${j.toSeq.sortBy(-_._2.abs).take(6)})")
    // planted edges must stand clear of the phantom floor
    val planted = Set(Set("lf_0", "lf_1"), Set("lf_1", "lf_2"))
    val (in, out) = j.toSeq.partition { case ((a, b), _) => planted(Set(a, b)) }
    assert(in.map(_._2.abs).min > 2.0 * out.map(_._2.abs).max,
      s"separation: planted ${in.map(_._2)} vs phantom max ${out.map(_._2.abs).max}")
    // the disjoint heuristic structurally cannot return both edges
    val mm       = LabelModel.momentMap(LabelModel.pairwiseMoments(votes, "doc_id"))
    val disjoint = LabelModel.learnTopDependenciesFromMap(mm, k = 2)
    assert(
      disjoint.map { case (a, b, _) => Set(a, b) }.toSet != planted,
      s"disjoint heuristic unexpectedly returned both overlapping edges: $disjoint")
    // and on an independent ensemble S surfaces no strong edge
    val indepModel     = IsingSampler.Model(thetaY = 0.0, thetaAcc = thetaAcc)
    val (indVotes, _)  = isingVotes(indepModel, n = 8000, seed = 321)
    val jInd           = LabelModel.learnStructureSparseLowRank(indVotes, "doc_id")
    assert(jInd.values.map(_.abs).max < in.map(_._2.abs).min / 2.0,
      s"independent ensemble should show no edge near the planted strength: ${jInd.toSeq.sortBy(-_._2.abs).take(3)}")
  }

  test("multiclass structure learning recovers a planted pair from one-vs-all indicator splits") {
    // 3-class planted sampler: voters vote y with their accuracy else
    // a uniform other class; voter b COPIES a with prob 0.7 — the
    // direct dependence learn_structure_multiclass must surface after
    // the per-class mean (run_ws.py:157-166, 231-232)
    val rnd   = new Random(11)
    val accs  = Map("a" -> 0.7, "b" -> 0.7, "c" -> 0.75, "d" -> 0.7, "e" -> 0.65)
    val names = accs.keys.toSeq.sorted
    val rows = (0 until 6000).flatMap { i =>
      val y = rnd.nextInt(3)
      val own = names.map { e =>
        e -> (if (rnd.nextDouble() < accs(e)) y else (y + 1 + rnd.nextInt(2)) % 3)
      }.toMap
      names.map { e =>
        val v =
          if (rnd.nextDouble() < 0.15) -1 // abstain — must NOT read as a class-0 vote
          else if (e == "b" && rnd.nextDouble() < 0.7) own("a")
          else own(e)
        (i.toLong, e, v)
      }
    }
    val votes = rows.toDF("doc_id", "extractor", "vote")
    val j     = LabelModel.learnStructureSparseLowRankMulticlass(votes, "doc_id", classes = Seq(0, 1, 2))
    val top   = LabelModel.structureTopDeps(j, 1)
    assert(top.map { case (a, b, _) => Set(a, b) } == Seq(Set("a", "b")),
      s"multiclass top dep: $top (J = ${j.toSeq.sortBy(-_._2.abs).take(4)})")
    // the everything-connected guard fires on degenerate J, not here
    assert(!LabelModel.structureAllConnected(j), s"guard misfired on ${j.values.map(_.abs).min}")
    assert(LabelModel.structureAllConnected(j.map { case (k, _) => k -> 5.0 }))
  }

  test("wsCombine(learnDeps) routes overlapping learned deps through the tree decode and stays correct") {
    import org.apache.spark.sql.functions.{col => c}
    // b copies a AND c copies b — overlapping dependency chain
    val planted = Map("a" -> 0.75, "b" -> 0.75, "c" -> 0.75, "d" -> 0.8, "e" -> 0.7)
    val (votes, gold) = plantedVotes(6000, planted, deps = Map(("a", "b") -> 0.7, ("b", "c") -> 0.7))
    val sv = votes.withColumn("value", when(c("vote") === 1, "yes").otherwise("no"))
      .select(c("doc_id"), c("extractor"), c("value"))
    // maxLearnedDeps = 2 opts IN to the overlapping-edge model;
    // the default 1 keeps the historical top-1 pair-clique behavior
    val pred = Combiners.wsCombine(sv, "doc_id", learnDeps = true, maxLearnedDeps = 2)
    val acc = pred
      .join(gold, "doc_id")
      .withColumn("py", when(c("value") === "yes", 1).otherwise(-1))
      .agg(avg(when(c("py") === c("y"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc > 0.8, s"overlapping-dep ws accuracy $acc")
  }
}
