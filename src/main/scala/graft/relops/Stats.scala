package graft.relops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic relational statistics operators (engine-exact forms). */
object Stats {

  /** Equi-width histogram of a numeric column: the corpus [min, max]
    * split into `nBuckets` buckets, per-bucket counts + bounds — the
    * profiling primitive behind data cards and skew diagnosis.
    *
    * Scale shape: bounds are one tiny agg broadcast into a per-row
    * bucket index; then one small shuffle on ≤ nBuckets keys with
    * map-side combine. Exactness: the index formula
    * floor((v − lo)/(hi − lo) × n) is the same IEEE expression on
    * both engines (identical associativity), counts are integers,
    * and the bucket bounds round to 6 at the end. A degenerate
    * single-valued column lands everything in bucket 0.
    */
  def equiWidthHistogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val mm = df.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    df.select(col(valueCol).cast("double").as("v"))
      .crossJoin(broadcast(mm))
      .withColumn(
        "bucket",
        when(col("hi") === col("lo"), 0)
          .otherwise(
            least(
              greatest(floor((col("v") - col("lo")) / (col("hi") - col("lo")) * nBuckets), lit(0.0)),
              lit((nBuckets - 1).toDouble))
              .cast("int")))
      .groupBy(col("bucket"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("bucket"),
        round(col("lo") + col("bucket") * (col("hi") - col("lo")) / nBuckets, 6).as("bucket_lo"),
        round(col("lo") + (col("bucket") + 1) * (col("hi") - col("lo")) / nBuckets, 6).as("bucket_hi"),
        col("n"))
  }
}
