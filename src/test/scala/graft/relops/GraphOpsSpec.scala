package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-occurrence graph analytics: edge construction, degree-ordered
  * triangle counting, and association-rule lift — hand-computed
  * fixtures, then the orientation-invariance property on a skewed
  * (star-heavy) graph where an id-only orientation would misbehave
  * on cost but MUST agree on the count.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val baskets = Seq(
    ("b1", 1L), ("b1", 2L), ("b1", 3L),
    ("b2", 1L), ("b2", 2L), ("b2", 4L),
    ("b3", 3L), ("b3", 4L),
    ("b4", 1L), ("b4", 2L),
    ("b4", 2L) // duplicate row: edges must come from DISTINCT items
  ).toDF("basket", "item")

  test("coOccurrenceEdges: distinct a<b pairs, duplicates collapsed") {
    val e = GraphOps.coOccurrenceEdges(baskets, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // b1 -> {12,13,23}, b2 -> {12,14,24}, b3 -> {34}, b4 -> {12}
    assert(e == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("triangleStats: K4 fixture — 4 triangles, clustering 1.0") {
    val out = GraphOps.triangleStats(
      GraphOps.coOccurrenceEdges(baskets, "basket", "item")).collect()(0)
    assert(out.getLong(0) == 4L, "n_nodes")
    assert(out.getLong(1) == 6L, "n_edges")
    assert(out.getLong(2) == 4L, "n_triangles = C(4,3) in K4")
    assert(out.getLong(3) == 12L, "n_wedges = 4 * C(3,2)")
    assert(out.getDouble(4) == 1.0, "global clustering of a clique")
  }

  test("triangleStats: skewed star + one chord — exactly the one closed triangle") {
    // hub 0 — spokes 1..5, plus chord (1,2): the ONLY triangle is
    // (0,1,2). Degree-ordered orientation directs spokes toward the
    // hub (deg 5 > deg 1/2), so the hub's out-degree is 0 — the wedge
    // space stays linear where id-ordering from node 0 would be C(5,2)
    val edges = (Seq((1L, 2L)) ++ (1L to 5L).map(v => (0L, v)))
      .toDF("pa", "pb")
    val out = GraphOps.triangleStats(edges).collect()(0)
    assert(out.getLong(0) == 6L, "n_nodes")
    assert(out.getLong(1) == 6L, "n_edges")
    assert(out.getLong(2) == 1L, "n_triangles")
    // wedges: hub C(5,2)=10, nodes 1,2 C(2,2)=1 each
    assert(out.getLong(3) == 12L, "n_wedges")
    assert(out.getDouble(4) == 0.25, "3T/W = 3/12")
  }

  test("basketLift: support floor, lift and confidence arithmetic") {
    val out = GraphOps.basketLift(baskets, "basket", "item", minSupport = 2, k = 10)
      .collect()
    // only (1,2) co-occurs >= 2 times: cnt 3 of 4 baskets;
    // item counts: c(1)=3, c(2)=3 -> lift = 4*3/(3*3)
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 3L)))
    assert(r.getDouble(3) == math.rint(4.0 * 3 / 9 * 1e6) / 1e6, "lift 1.333333")
    assert(r.getDouble(4) == 1.0, "confidence 3/3")
  }

  test("maxBasket cap: mega-baskets drop whole; non-binding cap is identity") {
    // b_huge has 4 items (> cap 3) and must contribute NO pairs;
    // the other baskets pass through untouched
    val withHuge = baskets.unionByName(
      Seq(("b_huge", 10L), ("b_huge", 11L), ("b_huge", 12L), ("b_huge", 13L))
        .toDF("basket", "item"))
    val capped = GraphOps.coOccurrenceEdges(withHuge, "basket", "item", maxBasket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = GraphOps.coOccurrenceEdges(baskets, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == base, "capped graph == graph without the mega-basket")
    val unbounded = GraphOps.coOccurrenceEdges(withHuge, "basket", "item")
      .collect().length
    assert(unbounded == base.size + 6, "uncapped default keeps the mega-basket's C(4,2) pairs")
    // basketLift: the cap also bounds the pair-count space — and the
    // basket TOTAL excludes dropped baskets (lift stays consistent)
    val lift = GraphOps.basketLift(withHuge, "basket", "item",
      minSupport = 2, k = 10, maxBasket = 3).collect()
    assert(lift.length == 1 && lift(0).getLong(0) == 1L && lift(0).getLong(1) == 2L)
    assert(lift(0).getDouble(3) == 1.333333, "n_orders excludes the dropped basket")
  }

  test("basketLift: top-k ordering is (lift desc, pa, pb) and k caps the output") {
    val out = GraphOps.basketLift(baskets, "basket", "item", minSupport = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.length == 3)
    // (1,2): 4*3/(3*3)=1.333 leads; (3,4): 4*1/(2*2)=1.0; then the
    // 4*1/(3*2)=0.666667 group tie-breaks by (pa, pb): (1,3) first
    assert(out(0) == ((1L, 2L, 1.333333)))
    assert(out(1) == ((3L, 4L, 1.0)))
    assert(out(2) == ((1L, 3L, 0.666667)))
  }
}
