package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approx (HLL++) tier of the table-profile primitive: same shape
  * as the exact card, measured error within the sketch's advertised
  * bound, and a plan with NO distinct-expand (the scale reason the
  * tier exists).
  */
class TableProfileApproxSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = spark.range(0, 20000).select(
    col("id"),
    (col("id") % 997).as("mod_997"),
    (col("id") % 10).as("mod_10"),
    when(col("id") % 4 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("v"), (col("id") % 2500).cast("string"))).as("s"))

  test("same shape as exact; error within ~3x the rsd bound on every column") {
    val exact = Stats.tableProfile(fixture).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val approx = Stats.tableProfileApprox(fixture, rsd = 0.05).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nNull, nDist, nRows)) =>
      val (aNull, aDist, aRows) = approx(c)
      // NULL and row counts are exact in both tiers
      assert(aNull == nNull && aRows == nRows, s"$c: non-sketched counts must be exact")
      // HLL++ rsd 0.05: |err| within 3 sigma of the true count
      val err = math.abs(aDist - nDist).toDouble / math.max(nDist, 1L)
      assert(err <= 0.15, s"$c: approx $aDist vs exact $nDist (err $err)")
    }
  }

  test("approx plan has no distinct-expand; exact plan does (the swap's reason)") {
    val exactPlan  = Stats.tableProfile(fixture).queryExecution.executedPlan.toString
    val approxPlan = Stats.tableProfileApprox(fixture).queryExecution.executedPlan.toString
    // Spark rewrites multi-distinct via Expand (one shuffle lane per
    // distinct column); the sketch path must not carry it
    assert(exactPlan.contains("Expand"), exactPlan)
    assert(!approxPlan.contains("Expand"), approxPlan)
  }

  test("deterministic across runs (HLL sketch is content-keyed, no RNG)") {
    val a = Stats.tableProfileApprox(fixture).collect().map(_.toSeq).toSeq
    val b = Stats.tableProfileApprox(fixture).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
