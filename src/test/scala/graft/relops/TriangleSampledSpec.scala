package graft.relops

import graft.SparkSpec

/** r14: DOULION-style sampled triangle census — the approximate tier
  * of the exact O(m^1.5) card, gauged against it the way the ANN
  * tiers gauge recall.
  */
class TriangleSampledSpec extends SparkSpec {
  import spark.implicits._

  // deterministic ER-ish fixture: 80 nodes, edge (i,j) kept by a
  // fixed hash at ~30% density — ~950 edges, ~2.2k triangles, enough
  // mass for the 1/sqrt(p^3 T) error bound to bite
  private def erGraph = (for {
    i <- 0 until 80
    j <- (i + 1) until 80
    if ((i * 31 + j * 17) % 10) < 3
  } yield (i.toLong, j.toLong)).toDF("pa", "pb")

  test("triangleStatsSampled at p=1 reproduces the exact census") {
    val exact = GraphOps.triangleStats(erGraph).collect()(0)
    val got   = GraphOps.triangleStatsSampled(erGraph, p = 1.0, seed = 7L).collect()(0)
    assert(got.getDouble(0) == 1.0, "p_keep")
    assert(got.getLong(1) == exact.getLong(1), "all edges survive")
    assert(got.getLong(2) == exact.getLong(2), "sampled == exact count")
    assert(got.getLong(3) == exact.getLong(2), "estimate == exact at p=1")
  }

  test("triangleStatsSampled: measured relative error vs the exact card at p=0.5") {
    val exact = GraphOps.triangleStats(erGraph).collect()(0).getLong(2)
    assert(exact > 1000, s"fixture needs triangle mass, got $exact")
    val got = GraphOps.triangleStatsSampled(erGraph, p = 0.5, seed = 7L).collect()(0)
    val pEff = got.getDouble(0)
    assert(math.abs(pEff - 0.5) < 1e-5, s"effective keep prob, got $pEff")
    // roughly half the edges survive (hash, not RNG — deterministic)
    val mS = got.getLong(1)
    val m  = erGraph.count()
    assert(math.abs(mS.toDouble / m - pEff) < 0.05, s"edge survival $mS/$m")
    // the estimator applies exactly sampled/p_eff^3, rounded half-up
    val pC = pEff * pEff * pEff
    assert(got.getLong(3) == math.floor(got.getLong(2) / pC + 0.5).toLong, "scaling identity")
    // DOULION error bound: std/T ~ sqrt((1/p^3 - 1)/T) ~ 5.6% here;
    // the pinned seed makes the observed error a constant — assert it
    // stays inside a 3-sigma-ish envelope
    val rel = math.abs(got.getLong(3) - exact).toDouble / exact
    assert(rel < 0.15, s"relative error $rel (est ${got.getLong(3)} vs exact $exact)")
  }

  // basket fixture for the emit-time sampler: 300 baskets × ≤6 items
  // over an 80-item catalog, deterministic membership hash — the
  // co-occurrence shape the gated query runs on
  private def baskets = (for {
    b <- 0 until 300
    i <- 0 until 80
    if ((b * 131 + i * 29) % 53) < 3
  } yield (b.toLong, i.toLong)).toDF("basket", "item")

  test("triangleStatsSampledFromBaskets: emit-time keep set == filter-after-derive") {
    // the predicate is a pure function of (pa, pb) so it commutes
    // with the pair distinct — the two forms must agree on EVERY
    // output column, at both a mid and a small p (the gated config)
    val edges = GraphOps.coOccurrenceEdges(baskets, "basket", "item")
    for (p <- Seq(0.5, 0.1)) {
      val after = GraphOps.triangleStatsSampled(edges, p = p, seed = 7L).collect()(0).toSeq
      val emit = GraphOps
        .triangleStatsSampledFromBaskets(baskets, "basket", "item", p = p, seed = 7L)
        .collect()(0).toSeq
      assert(emit == after, s"p=$p: emit-time $emit vs filter-after $after")
    }
  }

  test("triangleStatsSampledFromBaskets: maxBasket cap matches coOccurrenceEdges' drop rule") {
    // add one mega-basket holding the whole catalog: capped at 10,
    // both paths must drop it whole and agree
    val withMega = baskets.unionByName(
      (0 until 80).map(i => (9999L, i.toLong)).toDF("basket", "item"))
    val edges = GraphOps.coOccurrenceEdges(withMega, "basket", "item", maxBasket = 10)
    val after = GraphOps.triangleStatsSampled(edges, p = 0.1, seed = 7L).collect()(0).toSeq
    val emit = GraphOps
      .triangleStatsSampledFromBaskets(withMega, "basket", "item", p = 0.1, seed = 7L, maxBasket = 10)
      .collect()(0).toSeq
    assert(emit == after)
  }

  test("triangleStatsSampled is replay-deterministic (pure integer hash, no RNG)") {
    def run() = GraphOps.triangleStatsSampled(erGraph, p = 0.5, seed = 7L)
      .collect()(0).toSeq
    assert(run() == run())
    // a different seed samples a different subgraph
    val other = GraphOps.triangleStatsSampled(erGraph, p = 0.5, seed = 8L).collect()(0)
    assert(other.getLong(1) != run()(1), "seed moves the keep set")
  }
}
