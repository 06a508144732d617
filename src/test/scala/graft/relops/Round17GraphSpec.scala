package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 optimization pins for the graph family: the shared degree
  * table, the closed-form profile symmetrization, the k-core
  * round-1-shrink, and the HITS algebraic first half-step must stay
  * VALUE-IDENTICAL to their r16 forms (every one sits under a DuckDB
  * oracle gate), and the plan cuts that motivated them must hold.
  */
class Round17GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(pairs: Seq[(Long, Long)]) = pairs.toDF("pa", "pb")

  // K4 plus a pendant chain: multi-round peel, non-trivial profile
  private val fixture = edgesOf(Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (6L, 7L)))

  test("graphCard's shared degree table: constituents equal their standalone forms") {
    val edges = fixture.persist()
    val deg = edges
      .select(explode(array(col("pa"), col("pb"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .persist()
    val triShared  = GraphOps.triangleStats(edges, Some(deg), materialize = true).collect()(0).toSeq
    val triAlone   = GraphOps.triangleStats(fixture).collect()(0).toSeq
    assert(triShared == triAlone)
    val profShared = GraphOps.degreeProfile(edges, Some(deg), materialize = true).collect()(0).toSeq
    val profAlone  = GraphOps.degreeProfile(fixture).collect()(0).toSeq
    assert(profShared == profAlone)
    val coreShared = GraphOps.kCore(edges, 2, 64, Some(deg))
      .orderBy("v").collect().map(_.toSeq).toSeq
    val coreAlone = GraphOps.kCore(fixture, 2)
      .orderBy("v").collect().map(_.toSeq).toSeq
    assert(coreShared == coreAlone)
    deg.unpersist(); edges.unpersist()
  }

  test("kCore round-1 shrink: multi-round peel equals the unshrunk fixpoint") {
    // path graph: k=2 peels one layer per round from each end — the
    // shrink path engages on round 1 and the peel still cascades to
    // empty, exactly as the r16 full-relation restriction did
    val path = edgesOf((1L to 9L).map(i => (i, i + 1)))
    assert(GraphOps.kCore(path, k = 2).count() == 0L)
    // pendant chain off K4: shrink keeps exactly the 4-clique, with
    // in-core degrees (the fixpoint-round contract)
    val got = GraphOps.kCore(fixture, k = 3).orderBy("v").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.map(_.getLong(1)).forall(_ == 3L), "in-core degrees must be core-restricted")
  }

  test("degreeProfile: closed-form symmetrization — no directed-pair struct explode in the plan") {
    val plan = GraphOps.degreeProfile(fixture, None, materialize = false)
      .queryExecution.optimizedPlan.toString
    // the r16 form doubled the moment input with
    // explode(array(struct(da,db), struct(db,da))); the only explode
    // left is the degree table's endpoint explode
    assert(!plan.contains("explode(array(struct"), s"symmetrization explode is back:\n$plan")
    assert(plan.contains("sum((da"), s"closed-form undirected moment fold missing:\n$plan")
  }

  test("hits: algebraic round 1 equals the explicit all-ones hub vector, any iters") {
    val e = Seq((10L, 1L), (10L, 2L), (20L, 1L), (30L, 2L), (30L, 3L))
      .toDF("src", "dst").persist()
    // replicate the retired r16 round-1: join against an explicit
    // score-1.0 hub vector, same decimal fold
    val ones = e.select(col("src")).distinct().withColumn("score", lit(1.0))
    val viaJoin = e.join(ones, Seq("src"))
      .select(col("dst"), col("score").cast("decimal(27,18)").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).cast("double").as("raw"))
      .orderBy("dst").collect().map(_.toSeq).toSeq
    val (a1, _) = GraphOps.hitsRound(e, None)
    // pin the PRODUCTION path itself (r17 ADVICE): hitsRound's
    // None-branch authority vector, normalized, must equal the
    // normalized join form row for row — a drift in the None branch
    // now fails here instead of only at the oracle
    val rawSum = viaJoin.map(_(1).asInstanceOf[Double]).sum
    val want   = viaJoin.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Double] / rawSum))
    assert(a1.columns.toSeq == Seq("dst", "score"))
    val got = a1.orderBy("dst").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == want.map(_._1), s"node sets differ: $got vs $want")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-12, s"normalized authority drift: $g vs $w")
    }
    e.unpersist()
  }

  test("hits: end-to-end scores unchanged on a hand fixture (both roles sum to ~1)") {
    val e = Seq((10L, 1L), (10L, 2L), (20L, 1L), (30L, 2L), (30L, 3L))
      .toDF("s", "d")
    val out  = GraphOps.hits(e, "s", "d", iters = 2).collect()
    val hubs = out.filter(_.getString(0) == "hub").map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val auth = out.filter(_.getString(0) == "authority").map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(math.abs(hubs.values.sum - 1.0) < 1e-5)
    assert(math.abs(auth.values.sum - 1.0) < 1e-5)
    // node 10 links both heavy authorities -> top hub; 1 and 2 share
    // top authority mass symmetrically in this fixture
    assert(hubs.maxBy(_._2)._1 == 10L)
    assert(auth(1L) > auth(3L) && auth(2L) > auth(3L))
  }
}
