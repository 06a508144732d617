package graft.relops

import graft.SparkSpec

/** Round-14 hypothesis-test additions: Kruskal–Wallis, Wilcoxon
  * signed-rank, McNemar, Brown–Forsythe — hand-computed fixtures
  * (rank sums and tie corrections worked by hand; the closed forms
  * are the published ones).
  */
class HypothesisTestsSpec extends SparkSpec {
  import spark.implicits._

  private val kwGroups = Seq(
    ("a", 12L), ("a", 15L), ("a", 17L), ("a", 19L), ("a", 22L),
    ("b", 14L), ("b", 14L), ("b", 18L), ("b", 25L), ("b", 25L), ("b", 30L),
    ("c", 8L), ("c", 9L), ("c", 12L), ("c", 14L)).toDF("g", "v")

  test("kruskalWallis: 3-group hand fixture with ties") {
    // ranks: 8->1, 9->2, 12->3.5(x2), 14->6(x3), 15->8, 17->9, 18->10,
    // 19->11, 22->12, 25->13.5(x2), 30->15
    // R_a = 3.5+8+9+11+12 = 43.5; R_b = 6+6+10+13.5+13.5+15 = 64
    // R_c = 1+2+3.5+6 = 12.5; T = (8-2)+(27-3)+(8-2) = 36
    val r = Stats.kruskalWallis(kwGroups, "g", "v").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 15L)
    assert(r.getDouble(2) == 7.008958, s"h was ${r.getDouble(2)}")
    assert(r.getDouble(3) == 7.084868, s"h_corr was ${r.getDouble(3)}")
  }

  test("kruskalWallis: all values tied -> h_corr NULL, h negative-definite form") {
    val tied = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val r    = Stats.kruskalWallis(tied, "g", "v").collect()(0)
    assert(r.isNullAt(3), "tie correction denominator 0 -> NULL")
  }

  test("kruskalWallis: refuses fractional value columns") {
    val d = Seq(("a", 1.5)).toDF("g", "v")
    intercept[IllegalArgumentException](Stats.kruskalWallis(d, "g", "v"))
  }

  test("wilcoxonSignedRank: zeros drop, tie-averaged ranks, corrected z") {
    // x-y diffs: [-2, 0, 3, 0, 2, 1, 6, 0] -> 5 nonzero, 3 zeros
    // |d| ranks: 1->1, 2->2.5(x2), 3->4, 6->5
    // W+ = 4 + 2.5 + 1 + 5 = 12.5, W- = 2.5, z = 1.354571
    val pairs = Seq(
      (10L, 12L), (12L, 12L), (14L, 11L), (15L, 15L),
      (15L, 13L), (18L, 17L), (20L, 14L), (9L, 9L)).toDF("x", "y")
    val r = Stats.wilcoxonSignedRank(pairs, "x", "y").collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 12.5 && r.getDouble(3) == 2.5)
    assert(r.getDouble(4) == 1.354571, s"z was ${r.getDouble(4)}")
  }

  test("wilcoxonSignedRank: all pairs equal -> zero nonzero pairs, NULL z") {
    val pairs = Seq((1L, 1L), (2L, 2L)).toDF("x", "y")
    val r     = Stats.wilcoxonSignedRank(pairs, "x", "y").collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 2L)
    assert(r.isNullAt(4))
  }

  test("mcnemar: discordant-count statistic with continuity correction") {
    // n_tt=3, n_tf=4, n_ft=1, n_ff=2
    // chi2 = (4-1)^2/5 = 1.8; cc = (|3|-1)^2/5 = 0.8
    val rows = (Seq.fill(3)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false))).toDF("a", "b")
    val r = Stats.mcnemar(rows, "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 4L, 1L, 2L)))
    assert(r.getDouble(4) == 1.8 && r.getDouble(5) == 0.8)
  }

  test("mcnemar: no discordant pairs -> NULL statistics") {
    val rows = Seq((true, true), (false, false)).toDF("a", "b")
    val r    = Stats.mcnemar(rows, "a", "b").collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("leveneBrownForsythe: 3-group hand fixture (quantile_disc medians)") {
    // medians (lower/disc): a->15, b->18, c->9
    // |dev| a: 3,0,2,4,7; b: 4,4,0,7,7,12; c: 1,0,3,5
    // per-group (n, sum z, sum z^2): a (5,16,78) b (6,34,274) c (4,9,35)
    // srat = 51.2 + 192.666667 + 20.25 = 264.116667
    // ssb = srat - 59^2/15; ssw = 387 - srat; F = (12/2) * ssb / ssw
    val r = Stats.leveneBrownForsythe(kwGroups, "g", "v").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 15L)
    assert(r.getDouble(2) == 1.854925, s"f was ${r.getDouble(2)}")
  }

  test("leveneBrownForsythe: zero within-group spread -> NULL f") {
    val d = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L)).toDF("g", "v")
    val r = Stats.leveneBrownForsythe(d, "g", "v").collect()(0)
    assert(r.isNullAt(2))
  }

  test("effectSizes: Cliff's delta via the rank identity + pooled-SD Cohen's d") {
    // A=[1,2,3], B=[2,4]: #(a>b)=1, #(a<b)=4 -> delta = (1-4)/6 = -0.5
    // (rank check: R1 = 1 + 2.5 + 4 = 7.5, U1 = 1.5, 2*1.5/6 - 1)
    // m1=2 m2=3 s1^2=1 s2^2=2 sp^2=4/3 -> d = -1/sqrt(4/3) = -0.866025
    val d = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L), ("B", 4L)).toDF("g", "v")
    val r = Stats.effectSizes(d, "g", "A", "B", "v").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == -0.5, s"cliffs was ${r.getDouble(2)}")
    assert(r.getDouble(3) == -0.866025, s"cohens was ${r.getDouble(3)}")
  }

  test("effectSizes: identical constant groups -> delta 0, NULL d (zero pooled variance)") {
    val d = Seq(("A", 5L), ("A", 5L), ("B", 5L)).toDF("g", "v")
    val r = Stats.effectSizes(d, "g", "A", "B", "v").collect()(0)
    assert(r.getDouble(2) == 0.0 && r.isNullAt(3))
  }

  test("degenerate inputs read NULL, never ANSI DIVIDE_BY_ZERO (r14 review)") {
    // effectSizes with an EMPTY second group
    val oneGroup = Seq(("A", 1L), ("A", 2L)).toDF("g", "v")
    val es       = Stats.effectSizes(oneGroup, "g", "A", "B", "v").collect()(0)
    assert(es.getLong(1) == 0L && es.isNullAt(2) && es.isNullAt(3))
    // kruskalWallis on a single row (N^3 - N = 0)
    val kw = Stats.kruskalWallis(Seq(("a", 5L)).toDF("g", "v"), "g", "v").collect()(0)
    assert(kw.getLong(1) == 1L && kw.isNullAt(3))
    // mannWhitneyU all-tied metric (zero variance) and rocAuc on a
    // one-class label
    val mw = Stats.mannWhitneyU(
      Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v"), "g", "a", "b", "v").collect()(0)
    assert(mw.isNullAt(4), "all-tied z is NULL")
    val auc = graft.score.Score.rocAuc(
      Seq((0.5, true), (0.7, true)).toDF("s", "l"), "s", "l").collect()(0)
    assert(auc.isNullAt(2) && auc.isNullAt(3), "one-class AUC is NULL")
  }

  test("mannWhitneyU drops NULL values (complete-case), ranks unaffected") {
    val withNulls = Seq(
      ("a", Some(1L)), ("a", Some(3L)), ("a", None),
      ("b", Some(2L)), ("b", None)).toDF("g", "v")
    val clean = Seq(("a", 1L), ("a", 3L), ("b", 2L)).toDF("g", "v")
    val got   = Stats.mannWhitneyU(withNulls, "g", "a", "b", "v").collect()(0)
    val want  = Stats.mannWhitneyU(clean, "g", "a", "b", "v").collect()(0)
    assert(got == want)
  }

  test("kendallTauB: dominance-prefix identity matches the O(N^2) definition") {
    val rnd  = new scala.util.Random(7)
    val rows = (1 to 120).map(_ => (rnd.nextInt(6).toLong, rnd.nextInt(5).toLong))
    val got  = Stats.kendallTauB(rows.toDF("x", "y"), "x", "y").collect()(0)
    // brute force over all pairs
    var c = 0L; var d = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.size) {
      val dx = java.lang.Long.compare(rows(i)._1, rows(j)._1)
      val dy = java.lang.Long.compare(rows(i)._2, rows(j)._2)
      if (dx * dy > 0) c += 1 else if (dx * dy < 0) d += 1
    }
    val n  = rows.size.toLong
    val tx = rows.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val ty = rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n0 = n * (n - 1) / 2
    val tau = (c - d).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(got.getLong(2) == c && got.getLong(3) == d)
    assert(math.abs(got.getDouble(4) - tau) < 1e-6, s"${got.getDouble(4)} vs $tau")
  }

  test("kendallTauB: perfect monotone -> 1.0; one all-tied margin -> NULL") {
    val mono = (1L to 50L).map(i => (i % 7, (i % 7) * 3)).toDF("x", "y")
    assert(Stats.kendallTauB(mono, "x", "y").collect()(0).getDouble(4) == 1.0)
    val tied = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("x", "y")
    assert(Stats.kendallTauB(tied, "x", "y").collect()(0).isNullAt(4))
  }

  test("kendallTauB: refuses an unquantized (over-domain) column loudly") {
    val d = spark.range(0, 3000).selectExpr("id AS x", "id AS y")
    intercept[IllegalArgumentException](Stats.kendallTauB(d, "x", "y", maxDomain = 1024))
  }

  test("kendallTauB: refuses an over-domain X even when Y is small (r14 ADVICE)") {
    // the y-probe alone would admit this shape and build a 3000×2
    // grid per 1024 allowed — the x side must be bounded too
    val d = spark.range(0, 3000).selectExpr("id AS x", "id % 2 AS y")
    val ex = intercept[IllegalArgumentException](
      Stats.kendallTauB(d, "x", "y", maxDomain = 1024))
    assert(ex.getMessage.contains("x-domain"), ex.getMessage)
  }

  test("cupedAdjustedMeans: perfectly linear covariate collapses group means") {
    // y = x + 1 exactly -> theta = 1, both groups adjust to the
    // global ybar = 5 (the entire between-group gap was covariate)
    val d = Seq(("a", 1L, 2L), ("a", 3L, 4L), ("b", 5L, 6L), ("b", 7L, 8L))
      .toDF("g", "x", "y")
    val got = Stats.cupedAdjustedMeans(d, "g", "y", "x")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("a", 2L, 3.0, 5.0, 1.0), ("b", 2L, 7.0, 5.0, 1.0)))
  }

  test("cupedAdjustedMeans: constant covariate -> NULL theta, adjusted mean NULL") {
    val d = Seq(("a", 5L, 2L), ("a", 5L, 4L)).toDF("g", "x", "y")
    val r = Stats.cupedAdjustedMeans(d, "g", "y", "x").collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(3) && r.getDouble(2) == 3.0)
  }

  test("poissonBootstrap: deterministic, CI straddles the point on a real-sized sample") {
    val d = spark.range(0, 2000).selectExpr("id", "(id % 97) + 100 AS v")
    val a = Stats.poissonBootstrap(d, "id", "v", b = 32).collect()(0)
    val b = Stats.poissonBootstrap(d, "id", "v", b = 32).collect()(0)
    assert(a == b, "hash-derived weights replay identically")
    val (n, pt, lo, hi) =
      (a.getInt(0), a.getDouble(1), a.getDouble(2), a.getDouble(3))
    assert(n == 32 && lo <= pt && pt <= hi, s"CI [$lo, $hi] must straddle $pt")
  }

  test("poissonBootstrap: CI width shrinks with sample size (~1/sqrt(N))") {
    def width(rows: Long): Double = {
      val d = spark.range(0, rows).selectExpr("id", "(id % 97) + 100 AS v")
      val r = Stats.poissonBootstrap(d, "id", "v", b = 32).collect()(0)
      r.getDouble(3) - r.getDouble(2)
    }
    val w250  = width(250)
    val w4000 = width(4000)
    assert(w4000 < w250 / 2, s"expected ~4x shrink, got $w250 -> $w4000")
  }

  test("poissonBootstrapDiff: CI straddles the true gap; absent group -> NULL CIs") {
    val d = spark.range(0, 3000).selectExpr(
      "id",
      "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS g",
      // even ids: id%10 in {0,2,4,6,8}, keep {0,2,4,6} -> p1 = 0.8;
      // odd ids: {1,3,5,7,9}, keep {1,3} -> p2 = 0.4; true gap 0.4
      "CASE WHEN id % 2 = 0 THEN (id % 10) < 7 ELSE (id % 10) < 4 END AS keep")
    val r = Stats.poissonBootstrapDiff(d, "g", "A", "B", "id", "keep", b = 32).collect()(0)
    val (n, pt, lo, hi) = (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n == 32 && pt == 0.4 && lo <= pt && pt <= hi && lo > 0.3 && hi < 0.5,
      s"expected a tight CI around +0.4, got [$lo, $hi] point $pt")
    // group B entirely absent: every resample drops, CIs are NULL
    val one = Stats.poissonBootstrapDiff(
      d.filter(org.apache.spark.sql.functions.col("g") === "A"), "g", "A", "B", "id", "keep", b = 8).collect()(0)
    assert(one.getInt(0) == 0 && one.isNullAt(2) && one.isNullAt(3))
  }

  test("poissonBootstrap: refuses fractional value columns") {
    val d = Seq((1L, 1.5)).toDF("id", "v")
    intercept[IllegalArgumentException](Stats.poissonBootstrap(d, "id", "v"))
  }

  test("poissonBootstrapQuantile: quantile_disc point, straddling CI, replay-deterministic") {
    // values 1..1000 once each: point p50 = 500 (smallest v with
    // cum >= ceil(0.5*1000)), p90 = 900; the bootstrap CI must
    // straddle its point and stay in the right neighborhood
    val d = spark.range(1, 1001).selectExpr("id", "id AS v")
    def run() = Stats.poissonBootstrapQuantile(d, "id", "v", probs = Seq(0.5, 0.9), b = 32)
      .orderBy("prob").collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rows = run()
    assert(rows.toSeq == run().toSeq, "hash-derived weights replay identically")
    val Seq((p5, n5, pt5, lo5, hi5), (p9, n9, pt9, lo9, hi9)) = rows.toSeq
    assert(p5 == 0.5 && p9 == 0.9 && n5 == 32 && n9 == 32)
    assert(pt5 == 500L && pt9 == 900L, s"points $pt5/$pt9")
    assert(lo5 <= pt5 && pt5 <= hi5 && lo5 > 400 && hi5 < 600, s"p50 CI [$lo5,$hi5]")
    assert(lo9 <= pt9 && pt9 <= hi9 && lo9 > 850 && hi9 < 950, s"p90 CI [$lo9,$hi9]")
  }

  test("poissonBootstrapQuantile: a constructed +100 location shift moves point AND CI") {
    val base = spark.range(1, 1001).selectExpr("id", "id AS v")
    val shift = spark.range(1, 1001).selectExpr("id", "id + 100 AS v")
    val b0 = Stats.poissonBootstrapQuantile(base, "id", "v", probs = Seq(0.5), b = 32).collect()(0)
    val b1 = Stats.poissonBootstrapQuantile(shift, "id", "v", probs = Seq(0.5), b = 32).collect()(0)
    assert(b1.getLong(2) - b0.getLong(2) == 100L, "point shifts exactly")
    assert(b1.getLong(3) - b0.getLong(3) == 100L && b1.getLong(4) - b0.getLong(4) == 100L,
      "the weight field depends only on (rep, id), so the CI endpoints shift exactly too")
  }

  test("poissonBootstrapQuantile: degenerate all-equal corpus collapses the CI to the point") {
    val d = spark.range(0, 500).selectExpr("id", "42 AS v")
    val r = Stats.poissonBootstrapQuantile(d, "id", "v", probs = Seq(0.5), b = 16).collect()(0)
    assert(r.getLong(2) == 42L && r.getLong(3) == 42L && r.getLong(4) == 42L)
  }

  test("poissonBootstrap: CI ranks follow quantile_disc over SURVIVING resamples") {
    // 2-row corpus at b=100: ~e^-2 of resamples draw zero total
    // weight and drop, so n_resamples < 100 and the ceil(p·n) rank
    // differs from the old least(ceil(p·b), n) clamp (r14 ADVICE:
    // b=100, n=50 -> rank 50 vs quantile_disc's 49). The expected CI
    // is replayed here from the same public hash machinery.
    import org.apache.spark.sql.functions._
    val d = Seq((0L, 0L), (1L, 1000L)).toDF("id", "v")
    val r = Stats.poissonBootstrap(d, "id", "v", b = 100, loProb = 0.25, hiProb = 0.75).collect()(0)
    val n = r.getInt(0)
    assert(n < 100 && n > 0, s"expected dropped resamples on a 2-row corpus (got n=$n)")
    val cdf = Seq(
      0.367879441171, 0.735758882343, 0.919698602929, 0.981011843124,
      0.996340153173, 0.999405815182, 0.999916758851, 0.999989750803,
      0.999998874797)
    val u = graft.textops.Dedup
      .hash60(concat(lit("pbs:"), col("_b").cast("string"), lit(":"), col("id").cast("string")))
      .cast("double") / lit(1152921504606846976.0)
    val w = cdf.zipWithIndex.foldRight(lit(cdf.length): org.apache.spark.sql.Column) {
      case ((cut, k), acc) => when(u < cut, lit(k)).otherwise(acc)
    }
    val means = d
      .select(explode(sequence(lit(0), lit(99))).as("_b"), col("id"), col("v"))
      .select(col("_b"), w.as("_w"), col("v"))
      .groupBy("_b").agg(sum(col("_w")).as("_n"), sum(col("_w") * col("v")).as("_sv"))
      .filter(col("_n") > 0)
      .select(round(col("_sv").cast("double") / col("_n"), 6))
      .collect().map(_.getDouble(0)).sorted
    assert(means.length == n)
    assert(r.getDouble(2) == means(math.ceil(0.25 * n).toInt - 1), "ci_lo at rank ceil(p*n)")
    assert(r.getDouble(3) == means(math.ceil(0.75 * n).toInt - 1), "ci_hi at rank ceil(p*n)")
  }
}
