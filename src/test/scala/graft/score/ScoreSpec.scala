package graft.score

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScoreSpec extends SparkSpec {
  import spark.implicits._

  private def f1(pred: String, gold: String): Double =
    Seq((pred, gold)).toDF("p", "g")
      .select(Score.tokenF1(col("p"), col("g"))).head.getDouble(0)

  test("tokenF1 matches SQuAD semantics") {
    assert(f1("a b c", "a b c") == 1.0)
    assert(math.abs(f1("a b", "a b c d") - 2.0 / 3.0) < 1e-12)
    assert(f1("x y", "a b") == 0.0)
    assert(f1("", "") == 1.0)
    assert(f1("", "a") == 0.0)
    assert(f1("a", "") == 0.0)
    // multiset: repeated tokens counted with multiplicity
    assert(math.abs(f1("a a", "a") - 2.0 / 3.0) < 1e-12)
  }

  test("f1Metrics computes avg and exact median per extractor") {
    val scored = Seq(
      ("e1", "a b", "a b"), ("e1", "x", "a"), ("e1", "a", "a b"),
      ("e2", "a", "a"))
      .toDF("extractor", "pred", "gold")
    val got = Score.f1Metrics(scored, Seq("extractor")).orderBy("extractor").collect()
    // e1 f1s: 1.0, 0.0, 2*(1*0.5)/1.5 = 2/3 → avg 5/9, median 2/3
    assert(math.abs(got(0).getAs[Double]("avg_f1") - 5.0 / 9.0) < 1e-12)
    assert(math.abs(got(0).getAs[Double]("med_f1") - 2.0 / 3.0) < 1e-12)
    assert(got(1).getAs[Double]("avg_f1") == 1.0)
  }

  test("topkScripts picks qualifying functions by rank") {
    val m = Seq(
      ("function_1", 0.9, 0.9), ("function_2", 0.8, 0.85),
      ("function_3", 0.2, 0.1), ("llm", 0.95, 0.9), ("gold", 1.0, 1.0))
      .toDF("extractor", "avg_f1", "med_f1")
    val got = rows(Score.topkScripts(m, k = 2, goldKey = "gold").orderBy("rank"))
    // ranked: llm(1), function_1(2), function_2(3); qualifying fns: f1, f2
    // rank <= min(2, num_fns=2) ∧ qualifying → function_1 only
    assert(got == Seq(Seq("function_1", 2)))
  }

  test("topkScripts OpenIE kill-switch returns empty under threshold") {
    val m   = Seq(("function_1", 0.3, 0.2), ("function_2", 0.1, 0.1)).toDF("extractor", "avg_f1", "med_f1")
    val got = Score.topkScripts(m, k = 2, goldKey = "gold", doEndToEnd = true)
    assert(got.count() == 0)
  }

  test("topkScripts returns empty when no function qualifies (both modes)") {
    val m = Seq(("llm_a", 0.9, 0.9), ("llm_b", 0.7, 0.7)).toDF("extractor", "avg_f1", "med_f1")
    assert(Score.topkScripts(m, k = 2, goldKey = "gold").count() == 0)
  }

  test("topkScripts ClosedIE falls back to best overall when selection is empty") {
    // function_1 qualifies but the single truncated slot goes to llm →
    // empty intersection → fallback returns the best overall (llm)
    val m   = Seq(("llm", 0.95, 0.9), ("function_1", 0.55, 0.5)).toDF("extractor", "avg_f1", "med_f1")
    val got = rows(Score.topkScripts(m, k = 1, goldKey = "gold"))
    assert(got == Seq(Seq("llm", 1)))
  }

  test("extractionFraction counts non-empty non-none shares") {
    val df  = Seq(("a", "x"), ("a", ""), ("a", "none"), ("b", "y")).toDF("g", "value")
    val got = rows(Score.extractionFraction(df, "value", Seq("g")).orderBy("g"))
    assert(got == Seq(Seq("a", 1.0 / 3.0), Seq("b", 1.0)))
  }
}
