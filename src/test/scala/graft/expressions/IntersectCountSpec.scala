package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd sorted-merge intersection count vs the built-in
  * size(array_intersect(...)) it replaced in the triangle census.
  */
class IntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on randomized sorted distinct long arrays") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      def arr() = rnd.shuffle((0L to 60L).toList).take(rnd.nextInt(20)).sorted
      (i, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
        IntersectCount.sortedCount(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).as("want"))
      .filter(col("got") =!= col("want"))
      .count()
    assert(bad == 0L)
  }

  test("edge shapes: empty, disjoint, identical, subset") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0),
      (Seq(1L, 3L), Seq(2L, 4L), 0),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3),
      (Seq(2L, 3L), Seq(1L, 2L, 3L, 9L), 2)).toDF("a", "b", "want")
    val bad = df
      .filter(IntersectCount.sortedCount(col("a"), col("b")) =!= col("want"))
      .count()
    assert(bad == 0L)
  }

  test("non-ARRAY<LONG> inputs fail at analysis, not silently at runtime") {
    IntersectCount.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(array(1, 2, 3), array(2, 3))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("null array input propagates null") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r  = df.select(IntersectCount.sortedCount(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
