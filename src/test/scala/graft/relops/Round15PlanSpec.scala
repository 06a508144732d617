package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions for the round-15 pair-emitter
  * rework — the single-shuffle array emitter that replaced the
  * items-distinct + basket-key self-join must stay that plan.
  */
class Round15PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def baskets = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (3L, 40L))
    .toDF("basket", "item")

  test("coOccurrenceEdges: NO join anywhere — one grouping aggregate + a Generate") {
    val p = plan(GraphOps.coOccurrenceEdges(baskets, "basket", "item", maxBasket = 50))
    assert(!p.contains("Join"), s"the self-join emitter is gone for good:\n$p")
    assert(p.contains("Generate"), s"pair emission is a Generate over the array:\n$p")
    // exactly TWO exchanges end to end: the basket grouping and the
    // pair dedup — the old plan carried four (distinct, two join
    // sides, dedup)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected 2 exchanges (group, pair-dedup), got $exchanges:\n$p")
    // semantics unchanged: basket 1 emits 3 pairs, basket 2's (10,20)
    // dedups against basket 1's, basket 3 is pairless
    val got = GraphOps.coOccurrenceEdges(baskets, "basket", "item")
      .orderBy("pa", "pb").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 20L), (10L, 30L), (20L, 30L)))
  }

  test("sampled tier: the keep filter sits BELOW the pair-dedup exchange") {
    // the PRODUCTION sampled-edge relation (un-checkpointed): the
    // Filter carrying the keep hash must appear under the dedup
    // Exchange, so the shuffle volume shrinks by p — the r15
    // economics fix, asserted on the real code path rather than a
    // copy that could drift (r15 review finding)
    val pairs = GraphOps.sampledCoOccurrenceEdges(
      baskets, "basket", "item", p = 0.1, seed = 7L, maxBasket = Int.MaxValue)
    val lines = plan(pairs).linesIterator.toSeq
    val filterIdx   = lines.indexWhere(l => l.contains("Filter") && l.contains("999983"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(filterIdx >= 0 && exchangeIdx >= 0, lines.mkString("\n"))
    // executedPlan prints top-down: a LARGER index is DEEPER (earlier
    // in execution) — the keep filter must execute before the dedup
    // exchange
    assert(filterIdx > exchangeIdx,
      s"keep filter (line $filterIdx) must sit below the dedup exchange (line $exchangeIdx):\n" +
        lines.mkString("\n"))
  }

  test("NULL baskets/items never co-occur (complete-case, like the old join emitter)") {
    // groupBy would collect all NULL-key rows into one pseudo-basket;
    // the explicit filter keeps the join emitter's NULL semantics
    val dirty = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(20L)),
      (None: Option[Long], Some(77L)), (None, Some(88L)), // NULL basket pair-bait
      (Some(2L), None), (Some(2L), Some(10L)))            // NULL item in a real basket
      .toDF("basket", "item")
    val got = GraphOps.coOccurrenceEdges(dirty, "basket", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 20L)), s"NULL keys emitted pairs: ${got.toSeq}")
  }

  test("basketLift rides the same emitter: no self-join in the pair-count plan") {
    val p = plan(GraphOps.basketLift(baskets, "basket", "item", minSupport = 1, k = 5))
    // the only joins left are the tiny ic/n lookups (broadcast); the
    // pair COUNT side must not contain a basket-key self-join —
    // detectable as the absence of any SortMergeJoin and of a
    // basket-equality join condition
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("basket#"), s"no join on the basket key survives:\n$p")
  }
}
