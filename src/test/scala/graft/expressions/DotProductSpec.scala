package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, t) => acc + t)

  test("dot_d is bit-identical to a driver-side IEEE fold on real embeddings") {
    // NB: comparing against the in-plan HOF became tautological once
    // FuseDotProduct rewrites it to dot_d — the ground truth here is
    // a plain Scala left fold on the collected arrays
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("w", reverse(col("v")))
    val got = e.select(col("v"), col("w"), DotProduct.dotD(col("v"), col("w")).as("native"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Double](0)
      val w = r.getSeq[Double](1)
      var acc = 0.0
      v.indices.foreach(i => acc += v(i) * w(i))
      // exact bit equality, not approximate: the fold order must match
      assert(r.getDouble(2) == acc)
    }
    assert(got.nonEmpty)
  }

  test("FuseDotProduct rewrites the HOF form and leaves non-matching folds alone") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("w", reverse(col("v")))
      .limit(5)
    val fused = e.select(hofDot(col("v"), col("w")).as("d"))
    assert(
      fused.queryExecution.optimizedPlan
        .exists(_.expressions.exists(_.exists(_.isInstanceOf[DotProductExpr]))),
      "HOF dot product was not fused")
    // rewritten results == native expression results, row for row
    val nat = e.select(DotProduct.dotD(col("v"), col("w")).as("d")).collect().map(_.getDouble(0))
    assert(fused.collect().map(_.getDouble(0)).toSeq == nat.toSeq)

    // negative control: a different zero is NOT a dot product
    val other = e.select(
      col("v"),
      col("w"),
      aggregate(zip_with(col("v"), col("w"), (p, q) => p * q), lit(1.0), (acc, t) => acc + t).as("d"))
    assert(
      !other.queryExecution.optimizedPlan
        .exists(_.expressions.exists(_.exists(_.isInstanceOf[DotProductExpr]))),
      "non-zero init must not fuse")
    // the un-fused fold starts its accumulator AT the init (not init +
    // sum-at-the-end), so replay exactly that on the driver
    other.collect().foreach { r =>
      val v = r.getSeq[Double](0)
      val w = r.getSeq[Double](1)
      var acc = 1.0
      v.indices.foreach(i => acc += v(i) * w(i))
      assert(r.getDouble(2) == acc)
    }
  }

  test("dot_d null semantics match zip_with padding / null propagation") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),         // 11.0
      (Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0)),    // length mismatch -> null
      (Seq.empty[Double], Seq.empty[Double])  // 0.0
    ).toDF("a", "b")
    val got = df.select(DotProduct.dotD(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq == Seq(11.0, null, 0.0))

    // null element -> null (matches NULL propagating through * and +)
    val withNull = spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE)) a, array(2.0D, 3.0D) b")
    DotProduct.register(spark)
    assert(withNull.selectExpr("dot_d(a, b) d").head.isNullAt(0))
    // whole-array null input -> null
    assert(spark.sql("SELECT dot_d(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) d").head.isNullAt(0))
  }

  test("interpreted eval matches codegen path") {
    // force the interpreted path through an expression eval on literals
    val d = spark.sql("SELECT dot_d(array(1.5D, -2.0D), array(4.0D, 0.25D)) d").head.getDouble(0)
    assert(d == 1.5 * 4.0 + -2.0 * 0.25)
  }
}
