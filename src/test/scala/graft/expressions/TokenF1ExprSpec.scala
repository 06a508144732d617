package graft.expressions

import graft.SparkSpec
import graft.score.Score
import org.apache.spark.sql.functions._

class TokenF1ExprSpec extends SparkSpec {
  import spark.implicits._

  test("native token_f1 matches the HOF formulation exactly on real data") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(
        col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("pred"),
        array_join(slice(split(col("text"), " "), 1, 10), " ").as("gold"))
    val cmp = d.select(
      TokenF1.tokenF1(spark, col("pred"), col("gold")).as("native"),
      Score.tokenF1(col("pred"), col("gold")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("native token_f1 edge cases") {
    TokenF1.register(spark)
    val f = (p: String, g: String) => TokenF1.computeStr(p, g)
    assert(f("", "") == 1.0)
    assert(f("", "a") == 0.0)
    assert(f("a a", "a") == 2.0 / 3.0)
    assert(f("x", "y") == 0.0)
  }

  test("token_f1 is usable from SQL after registration") {
    TokenF1.register(spark)
    val got = spark.sql("SELECT token_f1('a b', 'a b c d') AS f").head.getDouble(0)
    assert(math.abs(got - 2.0 / 3.0) < 1e-12)
  }
}
