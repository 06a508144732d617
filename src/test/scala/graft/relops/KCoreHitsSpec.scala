package graft.relops

import graft.SparkSpec

/** Round-14 graph additions: k-core peel and HITS hubs/authorities —
  * hand-worked fixtures including the multi-round peel cascade the
  * oracle's unrolled form depends on.
  */
class KCoreHitsSpec extends SparkSpec {
  import spark.implicits._

  test("kCore: triangle with pendant — pendant peels, triangle survives at k=2") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val got = GraphOps.kCore(e, k = 2).orderBy("v").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_.getLong(1) == 2L), "within-core degrees after the pendant drops")
  }

  test("kCore: path graph cascades to empty over MULTIPLE rounds at k=2") {
    // 1-2-3-4-5: round 1 drops {1,5}, round 2 drops {2,4}, round 3
    // drops {3} — the multi-round cascade the unrolled oracle padding
    // must absorb. Exiting at maxRounds BEFORE the fixpoint must
    // throw, never hand back the partial peel's superset (r14 ADVICE:
    // a long chain peels one layer per round, so the silent-return
    // form produced a wrong non-empty core on plausible graphs).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    assert(GraphOps.kCore(path, k = 2).count() == 0L, "fixpoint is empty")
    val ex = intercept[IllegalStateException](
      GraphOps.kCore(path, k = 2, maxRounds = 1).count())
    assert(ex.getMessage.contains("fixpoint"), s"loud non-fixpoint exit: ${ex.getMessage}")
  }

  test("kCore: fixpoint reached exactly AT maxRounds does not throw") {
    // triangle+pendant peels in 2 rounds (drop pendant, then verify);
    // maxRounds=3 gives the verification round room — the throw must
    // key on the fixpoint test, not on hitting the bound per se
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    assert(GraphOps.kCore(e, k = 2, maxRounds = 3).count() == 3L)
  }

  test("kCore: k above max degree -> empty; k=1 keeps every non-isolated node") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("pa", "pb")
    assert(GraphOps.kCore(e, k = 5).count() == 0L)
    assert(GraphOps.kCore(e, k = 1).count() == 3L)
  }

  test("degreeProfile: star graph is perfectly disassortative (-1); cycle has NULL") {
    // star 1-{2,3,4}: degrees (3,1,1,1); symmetrized pairs correlate -1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("pa", "pb")
    val r    = GraphOps.degreeProfile(star).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 1.5 && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 0.5, "density 3 / C(4,2)")
    assert(r.getDouble(5) == -1.0, s"star assortativity was ${r.getDouble(5)}")
    // 4-cycle: constant degree 2 -> zero variance -> NULL
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("pa", "pb")
    assert(GraphOps.degreeProfile(cyc).collect()(0).isNullAt(5))
  }

  test("degreeProfile: empty edge relation reads NULL ratios, not NaN") {
    // 0 nodes / 0 edges: avg_degree's 0/0 must flow NULL like the
    // density and assortativity guards (r14 ADVICE — Spark's double
    // division yields NaN where an ANSI oracle reads NULL)
    val none = Seq.empty[(Long, Long)].toDF("pa", "pb")
    val r    = GraphOps.degreeProfile(none).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    assert(r.isNullAt(2), "avg_degree NULL on the empty graph")
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("hits: 2-iteration hand fixture (L1-normalized mutual reinforcement)") {
    // c1->{p1,p2}, c2->{p1}:
    // a1 = (2/3, 1/3); h1 = (3/5, 2/5); a2 = (5/8, 3/8);
    // h2 = (1, 5/8)/1.625 = (0.615385, 0.384615)
    val e   = Seq((10L, 100L), (10L, 200L), (20L, 100L)).toDF("c", "p")
    val got = GraphOps.hits(e, "c", "p", iters = 2)
      .orderBy("role", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("authority", 100L, 0.625), ("authority", 200L, 0.375),
      ("hub", 10L, 0.615385), ("hub", 20L, 0.384615)))
  }

  test("hits: duplicate input edges collapse; scores per role sum to ~1") {
    val e = Seq((10L, 100L), (10L, 100L), (10L, 200L), (20L, 100L)).toDF("c", "p")
    val got = GraphOps.hits(e, "c", "p", iters = 2).collect()
    val byRole = got.groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(2)).sum)
    assert(math.abs(byRole("hub") - 1.0) < 1e-5 && math.abs(byRole("authority") - 1.0) < 1e-5)
  }

  test("hitsConverged: fixpoint within single-digit rounds, equal to a long fixed run") {
    // the 2-hub fixture's power iteration converges linearly; at
    // tol=1e-9 the converged scores must agree (to the 6dp output
    // grain) with a deliberately long fixed-iteration run
    val e = Seq((10L, 100L), (10L, 200L), (20L, 100L)).toDF("c", "p")
    val conv = GraphOps.hitsConverged(e, "c", "p", tol = 1e-9, maxRounds = 32)
      .orderBy("role", "id").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val long = GraphOps.hits(e, "c", "p", iters = 24)
      .orderBy("role", "id").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(conv.toSeq == long.toSeq, s"converged $conv vs long fixed $long")
  }

  test("hitsConverged: refuses a truncated power iteration loudly") {
    // maxRounds=2 measures exactly one delta; on a fixture whose
    // round-1 -> round-2 movement is far above tol=1e-15 the exit
    // must throw, never hand back mid-iteration scores
    val e = Seq((10L, 100L), (10L, 200L), (20L, 100L)).toDF("c", "p")
    val ex = intercept[IllegalStateException](
      GraphOps.hitsConverged(e, "c", "p", tol = 1e-15, maxRounds = 2).count())
    assert(ex.getMessage.contains("delta"), ex.getMessage)
  }
}
