package graft.relops

import graft.SparkSpec
import graft.score.Score
import graft.textops.Sampling
import org.apache.spark.sql.functions._

/** Round-13 additions: 2-D Pareto frontier, DoReMi-style mix-update
  * step, and calibration ECE — hand-computed fixtures for each.
  */
class ParetoMixEceSpec extends SparkSpec {
  import spark.implicits._

  test("paretoFront2D: dominance with strictness, same-x group max, exact ties survive") {
    val pts = Seq(
      (1, 1.0, 1), (2, 1.0, 3),            // x=1 group: max size 3
      (3, 2.0, 3),                          // dominated: (2) is cheaper, same size
      (4, 2.0, 5), (5, 2.0, 5),            // frontier, EXACT tie pair: both kept
      (6, 3.0, 4), (7, 3.0, 5)             // x=3: gmax 5 not > prev 5 -> dominated
    ).toDF("id", "price", "size")
    val got = Stats.paretoFront2D(pts, "price", "size")
      .collect().map(_.getInt(0)).toSet
    assert(got == Set(2, 4, 5))
  }

  test("paretoFront2D: single point and monotone staircase pass through") {
    val one = Seq((1, 5.0, 2)).toDF("id", "price", "size")
    assert(Stats.paretoFront2D(one, "price", "size").count() == 1)
    val stairs = Seq((1, 1.0, 1), (2, 2.0, 2), (3, 3.0, 3)).toDF("id", "price", "size")
    assert(Stats.paretoFront2D(stairs, "price", "size").count() == 3)
  }

  test("mixUpdate: hand-computed linearized multiplicative-weights step") {
    // A: 'aa bb' -> 2 tokens, 4 chars; B: 'cccc' -> 1 token, 4 chars
    // tot_tok 3, tot_len 8; hardness A = 4*3/(2*8) = 0.75 -> excess 0
    // hardness B = 4*3/(1*8) = 1.5 -> excess 0.5
    // w_ref A = 2/3, B = 1/3; w_raw A = 2/3, B = 1/3 * 1.5 = 0.5
    // w_new A = (2/3)/(7/6) = 4/7, B = 3/7
    val df = Seq(("A", "aa bb"), ("B", "cccc")).toDF("source", "text")
    val got = Sampling.mixUpdate(df, "source", "text", eta = 1.0)
      .orderBy("source").collect()
    val a = got(0); val b = got(1)
    assert(a.getLong(1) == 2L && b.getLong(1) == 1L)
    assert(a.getDouble(2) == 0.666667 && b.getDouble(2) == 0.333333, "w_ref")
    assert(a.getDouble(3) == 0.0 && b.getDouble(3) == 0.5, "excess")
    assert(a.getDouble(4) == 0.571429 && b.getDouble(4) == 0.428571, "w_new 4/7, 3/7")
  }

  test("mixUpdate: eta=0 reduces to the reference token-share weights") {
    val df = Seq(("A", "aa bb"), ("B", "cccc"), ("B", "d e f")).toDF("source", "text")
    val got = Sampling.mixUpdate(df, "source", "text", eta = 0.0)
      .orderBy("source").collect()
    got.foreach(r => assert(r.getDouble(4) == r.getDouble(2), "w_new == w_ref at eta 0"))
  }

  test("calibrationEce: two-bin hand fixture") {
    // bin0: conf .05, label false -> acc 0, gap .05
    // bin9: confs .95/.95, labels true/false -> acc .5, mean .95, gap .45
    // ece = (1*.05 + 2*.45)/3 = .316667; mce = .45
    val df = Seq((0.05, false), (0.95, true), (0.95, false)).toDF("conf", "label")
    val r = Score.calibrationEce(df, "conf", "label", nBins = 10).collect()(0)
    assert(r.getDouble(0) == 0.316667, "ece")
    assert(r.getDouble(1) == 0.45, "mce")
    assert(r.getLong(2) == 2L, "bins used")
    assert(r.getLong(3) == 3L, "n")
  }

  test("calibrationEce: conf exactly 1.0 lands in the top bin, perfect calibration reads 0 gap-ish") {
    // conf 1.0 with label true: floor(10) clamps to bin 9; gap = |1 - 1| = 0
    val df = Seq((1.0, true)).toDF("conf", "label")
    val r = Score.calibrationEce(df, "conf", "label", nBins = 10).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getLong(2) == 1L)
  }

  test("decileLift: top tile concentrates positives; cum_gain reaches 1") {
    val df = Seq(
      (1L, 4.0, true), (2L, 3.0, true), (3L, 2.0, false), (4L, 1.0, false)
    ).toDF("id", "score", "label")
    val got = Score.decileLift(df, "score", "id", "label", nTiles = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(got(0) == ((1, 2L, 2L, 2.0, 1.0)), "tile 1: all positives, lift 2, gain 1")
    assert(got(1) == ((2, 2L, 0L, 0.0, 1.0)), "tile 2: none")
  }

  test("decileLift: largest-remainder tile sizes match SQL NTILE on uneven N, ties rank by id") {
    // N=5, k=2 -> NTILE sizes (3, 2); all scores EQUAL so ranks come
    // from the id tie-break: ids 1,2,3 -> tile 1
    val df = (1L to 5L).map(i => (i, 1.0, i <= 3)).toDF("id", "score", "label")
    val got = Score.decileLift(df, "score", "id", "label", nTiles = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got(0) == ((1, 3L, 3L)) && got(1) == ((2, 2L, 0L)))
  }

  test("mannWhitneyU: average-rank ties and tie-corrected z, hand-computed") {
    // A {1,2}, B {2,3}: ranks 1; 2.5/2.5; 4 -> R1 3.5, U1 0.5, U2 3.5
    // ties term (2^3-2)=6 -> var = (4/12)*(5 - 6/12) = 1.5
    // z = (0.5 - 2)/sqrt(1.5) = -1.224745
    val df = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, "g", "A", "B", "v").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 3.5)
    assert(r.getDouble(4) == -1.224745)
  }

  test("mannWhitneyU: symmetric groups read z = 0") {
    val df = Seq(("A", 1L), ("A", 3L), ("B", 1L), ("B", 3L)).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, "g", "A", "B", "v").collect()(0)
    assert(r.getDouble(2) == r.getDouble(3), "U1 == U2")
    assert(r.getDouble(4) == 0.0)
  }

  test("hardening: decileLift numbers rows consecutively when N < nTiles (SQL NTILE parity)") {
    // 2 rows into 10 tiles: NTILE gives tiles 1 and 2. With the
    // front-loaded identity this is the q = 0, r = N degenerate case
    // (every row takes the first branch, tile = rn) — no special
    // branch needed.
    val df  = Seq((1L, 0.9, true), (2L, 0.1, false)).toDF("id", "score", "label")
    val got = Score.decileLift(df, "score", "id", "label", nTiles = 10)
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2))
  }

  test("decileLift: front-loaded NTILE identity for 2 <= N mod k <= k-1 (r13 ADVICE)") {
    // N=12, k=10 -> q=1, r=2: SQL NTILE sizes are (2,2,1,1,1,1,1,1,1,1)
    // — front-loaded. The old even-spread formula floor((rn-1)k/N)+1
    // would read (2,1,1,1,1,1,2,1,1,1). Distinct scores so the order
    // is unambiguous.
    val df = (1 to 12).map(i => (i.toLong, 13.0 - i, i <= 4)).toDF("id", "score", "label")
    val got = Score.decileLift(df, "score", "id", "label", nTiles = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq(1 -> 2L, 2 -> 2L, 3 -> 1L, 4 -> 1L, 5 -> 1L,
      6 -> 1L, 7 -> 1L, 8 -> 1L, 9 -> 1L, 10 -> 1L))
  }

  test("decileLift: tile assignment equals Spark's own NTILE on N=102, k=10, with ties") {
    // The ADVICE counter-example scale: N=102 -> NTILE sizes
    // 11,11,10x8 (front-loaded), even-spread reads 11,10,10,10,10,11,…
    // Oracle: Spark's ntile over orderBy(desc(score), asc(id)) — the
    // same total order decileLift's distinct-prefix + intra-score
    // rank reconstructs. Scores collide (i/7) so ties are exercised.
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 102).map(i => (i.toLong, (i / 7).toDouble, i % 3 == 0))
      .toDF("id", "score", "label")
    val oracle = df
      .withColumn("decile", ntile(10).over(Window.orderBy(desc("score"), asc("id"))))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"))
      .orderBy("decile")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Score.decileLift(df, "score", "id", "label", nTiles = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == oracle)
    assert(got.map(_._2) == Seq(11L, 11L, 10L, 10L, 10L, 10L, 10L, 10L, 10L, 10L))
  }

  test("prefixBefore: two-phase range prefix equals the single-partition window, asc and desc") {
    import org.apache.spark.sql.expressions.Window
    // 200 distinct keys with varied counts — enough to span several
    // quantile ranges at numRanges=8
    val vals = (1 to 200).map(i => ((i * 37 % 1000).toLong, (i % 5 + 1).toLong))
      .toDF("k", "cnt")
    for (descending <- Seq(false, true)) {
      val ord = if (descending) desc("k") else asc("k")
      val oracle = vals
        .withColumn("_before", coalesce(
          sum(col("cnt")).over(
            Window.orderBy(ord).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("k", "_before")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = Stats.prefixBefore(vals, "k", "cnt", "_before", descending, numRanges = 8)
        .select("k", "_before")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == oracle, s"descending=$descending")
    }
  }

  test("hardening: paretoFront2D drops rows with null coordinates instead of crowning them") {
    val pts = Seq(
      (1, Some(1.0), Some(2)), (2, None, Some(9)), (3, Some(0.5), None)
    ).toDF("id", "price", "size")
    val got = GraphOpsSpecHelpers.ids(Stats.paretoFront2D(pts, "price", "size"))
    assert(got == Set(1))
  }

  test("hardening: mixUpdate reads excess 0 for a zero-token domain, not NaN") {
    val df = Seq(("A", "aa bb"), ("B", "")).toDF("source", "text")
    val got = Sampling.mixUpdate(df, "source", "text").orderBy("source").collect()
    assert(got(1).getLong(1) == 0L && got(1).getDouble(3) == 0.0)
    assert(!got(1).isNullAt(4), "w_new defined (0 share, 0 excess)")
  }

  test("rocAuc: rank-sum identity with a tie contributing 0.5") {
    // pos {0.9, 0.5} vs neg {0.5, 0.1}: 3 wins + 1 tie -> 3.5/4
    val df = Seq((0.9, true), (0.5, true), (0.5, false), (0.1, false)).toDF("score", "label")
    val r = Score.rocAuc(df, "score", "label").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getDouble(2) == 0.875 && r.getDouble(3) == 0.75)
    // perfect separation reads 1.0
    val sep = Seq((0.9, true), (0.1, false)).toDF("score", "label")
    assert(Score.rocAuc(sep, "score", "label").collect()(0).getDouble(2) == 1.0)
  }

  test("twoProportionZ: pooled z, hand-computed") {
    // A: 1/2, B: 2/2 -> pooled 3/4; z = -0.5/sqrt(0.1875) = -1.154701
    val df = Seq(("A", true), ("A", false), ("B", true), ("B", true)).toDF("g", "keep")
    val r = Stats.twoProportionZ(df, "g", "A", "B", "keep").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 2L, 2L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == -1.154701)
  }
}

/** Tiny shared helper: collect the id column (first col, Int). */
object GraphOpsSpecHelpers {
  def ids(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.collect().map(_.getInt(0)).toSet
}
