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
  * triplets. Junction-tree / data-programming SGD / LR are research
  * baselines the paper's pipeline doesn't use (SURVEY §2.11) — out
  * of scope by design.
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
    * votes in ±1/0 encoding (0 = abstain), gold y in ±1.
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
    * (`methods.py:275-328`): one self-join on the vote key, pairs
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
    */
  def flyingSquidAccuracies(moments: DataFrame): Map[String, Double] = {
    val m = moments
      .select(col("e_i"), col("e_j"), col("moment"))
      .collect()
      .flatMap { r =>
        val (i, j, v) = (r.getString(0), r.getString(1), r.getDouble(2))
        Seq((i, j) -> v, (j, i) -> v)
      }
      .toMap
    val extractors = m.keys.map(_._1).toSeq.distinct.sorted
    extractors.map { i =>
      val others = extractors.filter(_ != i)
      val pairs = for {
        j <- others; k <- others if j < k
        mij <- m.get((i, j)); mik <- m.get((i, k)); mjk <- m.get((j, k)) if math.abs(mjk) > 1e-12
      } yield math.sqrt(math.abs(mij * mik / mjk)).min(1.0)
      val a = if (pairs.nonEmpty) pairs.sum / pairs.size else 0.0
      i -> (1.0 + a) / 2.0
    }.toMap
  }

  /** Naive-Bayes posterior vote combination (`methods.py:521`):
    * per key, score each candidate class by Π_i P(v_i | y=c) using
    * per-extractor accuracies; abstains contribute 1. Binary ±1
    * encoding. Returns (key, nb_pred, score_pos, score_neg);
    * tie → +1. Log-domain sum (numerically safe for m extractors).
    */
  def naiveBayesPredict(votes: DataFrame, accs: DataFrame, keyCol: String): DataFrame = {
    val joined = votes.join(broadcast(accs), Seq("extractor"))
    def term(cand: Int) =
      when(col("vote") === 0, 0.0)
        .when(col("vote") === cand, log(col("acc")))
        .otherwise(log(lit(1.0) - col("acc")))
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
}
