package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The GK approx-percentile tier: accepts the continuous domain the
  * exact histogram path refuses, same output shape, rank error within
  * the sketch's bound.
  */
class QuantilesApproxSpec extends SparkSpec {
  import spark.implicits._

  test("histogramQuantilesCont: linear-interpolation hand fixture incl. ties and edges") {
    // group a: values 10, 20, 20, 40 (n=4)
    //   q=0.5 : h=1.5  -> v2nd..v3rd = 20 + .5*(20-20) = 20.0
    //   q=0.25: h=0.75 -> 10 + .75*(20-10) = 17.5
    //   q=1.0 : h=3 (integral, p2 clamped to n) -> 40.0
    //   q=0.0 : h=0 -> 10.0
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 40L)).toDF("g", "v")
    val got = Stats.histogramQuantilesCont(df, "g", "v", Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("prob").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0.0, 10.0), (0.25, 17.5), (0.5, 20.0), (1.0, 40.0)))
  }

  test("histogramQuantilesCont: single-value group is constant at every prob") {
    val df  = Seq(("a", 7L)).toDF("g", "v")
    val got = Stats.histogramQuantilesCont(df, "g", "v", Seq(0.1, 0.9)).collect()
    assert(got.forall(_.getDouble(2) == 7.0))
  }

  test("continuous doubles: works where the exact path refuses, rank error bounded") {
    // two groups of doubles — a domain histogramQuantiles rejects
    val df = spark.range(0, 10000).select(
      (col("id") % 2).cast("string").as("g"),
      (col("id").cast("double") / 7.0 + when(col("id") % 2 === 0, 100.0).otherwise(0.0)).as("v"))
    intercept[IllegalArgumentException] {
      Stats.histogramQuantiles(df.withColumn("v", col("v")), "g", "v", Seq(0.5))
    }
    val probs = Seq(0.1, 0.5, 0.9)
    val got = Stats.quantilesApprox(df, "g", "v", probs, accuracy = 10000).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    // exact reference: driver-side sort per group, rank-error check
    val byG = df.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (g <- Seq("0", "1"); p <- probs) {
      val vs   = byG(g)
      val q    = got((g, p))
      val rank = vs.count(_ <= q).toDouble / vs.length
      assert(math.abs(rank - p) <= 0.01, s"g=$g p=$p: value $q sits at rank $rank")
    }
  }

  test("integer domain: approx agrees with the exact histogram card at full accuracy") {
    val df = spark.range(0, 5000).select(
      lit("all").as("g"), (col("id") % 101).as("v"))
    val exact = Stats.histogramQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.75)).collect()
      .map(r => r.getDouble(1) -> r.getLong(2)).toMap
    val approx = Stats.quantilesApprox(df, "g", "v", Seq(0.25, 0.5, 0.75), accuracy = 100000)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // uniform 0..100 over 5000 rows: both land on the same integer
    exact.foreach { case (p, v) =>
      assert(math.abs(approx(p) - v) <= 1.0, s"p=$p: approx ${approx(p)} vs exact $v")
    }
  }
}
