package graft.combine

/** Exponential-family (Ising) vote sampler — the reference's synthetic
  * PGM fixture (`pgm.py:8-117`, `make_pgm.py:15-370`,
  * `binary_deps.py:9-233`), used to stress-test structure learning and
  * dependency-aware inference against a KNOWN ground-truth model.
  *
  * Joint over the latent label y ∈ {−1,+1} and m spin votes
  * v ∈ {−1,+1}^m:
  *
  *   P(y, v) ∝ exp( θ_y·y + Σ_i θ_i·v_i·y + Σ_{(a,b)∈deps} θ_ab·v_a·v_b )
  *
  * — the accuracy potentials θ_i tie votes to the label, the pairwise
  * potentials θ_ab correlate voters DIRECTLY (not through y), which is
  * exactly the signal `learnTopDependency` must find and
  * `junctionTreePredictChain` must exploit. Abstains are applied as an
  * independent post-hoc mask (vote → 0 with probability `pAbstain`),
  * the lite form of the reference's abstain potentials.
  *
  * Driver-side by design, like the reference's numpy sampler: the
  * joint is enumerated EXACTLY (2^(m+1) table, m ≤ 16 enforced) and
  * rows are drawn i.i.d. from the true distribution with a seeded RNG
  * — no MCMC, no convergence questions in tests. The output is a
  * local Seq the caller parallelizes; fixtures are sample-sized, never
  * lake-sized.
  */
object IsingSampler {

  /** Model spec. `deps` keys are 0-based voter index pairs (a < b). */
  final case class Model(
      thetaY: Double,
      thetaAcc: Seq[Double],
      deps: Map[(Int, Int), Double] = Map.empty,
      pAbstain: Double = 0.0) {
    require(thetaAcc.nonEmpty && thetaAcc.size <= 16, "1..16 voters supported (exact enumeration)")
    require(
      deps.keys.forall { case (a, b) => a >= 0 && a < b && b < thetaAcc.size },
      s"dep indices must be 0 <= a < b < m: ${deps.keys}")
    require(pAbstain >= 0.0 && pAbstain < 1.0, "pAbstain in [0, 1)")
    def m: Int = thetaAcc.size
  }

  /** One sampled row: (key, true label ±1, votes in {−1,0,+1}). */
  final case class Draw(key: Long, y: Int, votes: Seq[Int])

  /** Exact joint table: ((y, votes), unnormalized weight). */
  def jointTable(model: Model): IndexedSeq[((Int, IndexedSeq[Int]), Double)] = {
    val m = model.m
    for {
      y    <- IndexedSeq(1, -1)
      bits <- 0 until (1 << m)
    } yield {
      val v = IndexedSeq.tabulate(m)(i => if (((bits >> i) & 1) == 1) 1 else -1)
      val e = model.thetaY * y +
        (0 until m).map(i => model.thetaAcc(i) * v(i) * y).sum +
        model.deps.map { case ((a, b), t) => t * v(a) * v(b) }.sum
      ((y, v), math.exp(e))
    }
  }

  /** Draw `n` i.i.d. rows from the exact joint (seeded, reproducible).
    * Keys are 0..n−1.
    */
  def sample(model: Model, n: Int, seed: Long): Seq[Draw] = {
    val table = jointTable(model)
    val cum   = table.scanLeft(0.0)(_ + _._2).tail
    val total = cum.last
    val rng   = new scala.util.Random(seed)
    (0L until n.toLong).map { k =>
      val u   = rng.nextDouble() * total
      val idx = {
        val i = java.util.Arrays.binarySearch(cum.toArray, u)
        if (i >= 0) i else -i - 1
      }
      val (y, v) = table(math.min(idx, table.size - 1))._1
      val masked =
        if (model.pAbstain == 0.0) v
        else v.map(x => if (rng.nextDouble() < model.pAbstain) 0 else x)
      Draw(k, y, masked)
    }
  }

  /** Long-form (key, extractor, vote) rows for the label-model stack;
    * voter i is named s"$prefix$i" (lexicographic order = index order
    * for m ≤ 10).
    */
  def toVoteRows(draws: Seq[Draw], prefix: String = "lf_"): Seq[(Long, String, Int)] =
    draws.flatMap(d => d.votes.zipWithIndex.map { case (v, i) => (d.key, s"$prefix$i", v) })
}
