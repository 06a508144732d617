package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv_sketch keeps the k smallest DISTINCT values, ascending") {
    val df = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L).toDF("h").repartition(4)
    val sk = df.agg(KmvSketch.kmvSketch(col("h"), 3).as("sk"))
      .head().getSeq[Long](0)
    assert(sk == Seq(1L, 3L, 5L))
  }

  test("partial merges across partitions equal the single-partition sketch") {
    val vals = (1 to 1000).map(i => (i * 2654435761L) & 0xFFFFFFFFL)
    val many = vals.toDF("h").repartition(32)
      .agg(KmvSketch.kmvSketch(col("h"), 16)).head().getSeq[Long](0)
    val one = vals.toDF("h").coalesce(1)
      .agg(KmvSketch.kmvSketch(col("h"), 16)).head().getSeq[Long](0)
    assert(many == one && many.length == 16)
    assert(many == many.sorted && many.distinct == many)
  }

  test("null inputs are skipped; under-full groups emit what they saw") {
    val df = Seq(Some(4L), None, Some(2L)).toDF("h")
    val sk = df.agg(KmvSketch.kmvSketch(col("h"), 8)).head().getSeq[Long](0)
    assert(sk == Seq(2L, 4L))
  }

  test("grouped sketches are independent per key") {
    val df = Seq(("a", 5L), ("a", 1L), ("b", 7L), ("b", 2L), ("b", 2L)).toDF("g", "h")
    val got = df.groupBy("g").agg(KmvSketch.kmvSketch(col("h"), 4).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(1L, 5L) && got("b") == Seq(2L, 7L))
  }
}
