package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions for the round-14 operators — the
  * plans that make them 100 TB-safe must stay those plans.
  */
class Round14PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // triangleStats / kCore return localCheckpointed results (their
  // executedPlan is just the RDD scan), so the shape assertions run
  // on the un-checkpointed building blocks they are made of.

  test("IntersectCount runs inside whole-stage codegen, replacing array_intersect") {
    // range-derived arrays: a literal input would constant-fold the
    // whole expression into a LocalTableScan before codegen runs
    val df = spark.range(1, 4).select(
      sequence(lit(1L), col("id")).as("a"),
      sequence(col("id"), lit(5L)).as("b"))
    val p = plan(df.select(
      graft.expressions.IntersectCount.sortedCount(col("a"), col("b")).as("c")))
    assert(p.contains("intersectcountexpr"), p)
    // the project carrying it is a WholeStageCodegen stage (the *(n)
    // marker), i.e. doGenCode compiled — no interpreted fallback
    assert(p.linesIterator.exists(l =>
      l.contains("intersectcountexpr") && l.trim.startsWith("*(")), p)
    // GraphOps' census must keep using it (differential: the census
    // over a fixture still counts the one triangle)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val r = GraphOps.triangleStats(e).collect()(0)
    assert(r.getLong(2) == 1L, "census value regression")
  }

  test("kCore survivor restriction is a semi-join pair, never an inner-join blowup") {
    // the restrict() shape inside kCore, un-checkpointed
    val e    = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val keep = Seq(1L, 2L, 3L).toDF("v")
    val p = plan(
      e.join(keep.select(col("v").as("pa")), Seq("pa"), "left_semi")
        .join(keep.select(col("v").as("pb")), Seq("pb"), "left_semi"))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("waiting-suppliers (Q21): decorrelated — no fact-sized semi/anti pair, dims broadcast") {
    // mirror of the gated wiring on a fixture: the per-order agg +
    // join-back shape must hold (one Exchange for the agg, the
    // supplier dim joins as broadcast at testdata scale)
    val li = Seq((1L, 10L, java.sql.Date.valueOf("2024-03-01")),
                 (1L, 20L, java.sql.Date.valueOf("2024-01-05")),
                 (2L, 10L, java.sql.Date.valueOf("2024-03-01")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Seq((1L, "F", java.sql.Date.valueOf("2024-01-01")),
                  (2L, "F", java.sql.Date.valueOf("2024-01-01")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val j = li.join(ord.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
    val perOrder = j.groupBy(col("l_orderkey")).agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
      max(when(col("late"), col("l_suppkey"))).as("late_supp"))
    val out = j.filter(col("late"))
      .join(perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1), Seq("l_orderkey"))
      .filter(col("l_suppkey") === col("late_supp"))
    // semantics: order 1 has two suppliers, only supplier 10 late
    assert(out.select("l_suppkey").collect().map(_.getLong(0)).toSeq == Seq(10L))
    val p = plan(out)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("poissonBootstrap: one corpus aggregation — no per-resample shuffle fan-out") {
    val d = spark.range(0, 500).selectExpr("id", "id % 7 AS v")
    val p = plan(Stats.poissonBootstrap(d, "id", "v", b = 32))
    // the resample grid is a Generate (explode) feeding ONE hash
    // aggregate keyed by rep — B never multiplies the shuffle count
    assert(p.contains("Generate explode"))
    assert(p.linesIterator.count(_.contains("Exchange")) <= 6,
      s"bootstrap plan grew extra shuffles:\n$p")
  }

  test("histogramQuantilesCont: shuffles the histogram, not the corpus rows") {
    val d = spark.range(0, 1000).selectExpr("CAST(id % 3 AS STRING) AS g", "id % 50 AS v")
    val p = plan(Stats.histogramQuantilesCont(d, "g", "v", Seq(0.5)))
    // value-histogram path: partial_count before the exchange means
    // map-side combine collapsed rows to (g, v) cells pre-shuffle
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "histogram aggregation must partial-combine map-side")
    assert(!p.contains("CartesianProduct"))
  }
}
