package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation: two-phase salted aggregation.
  *
  * AQE's skew handling covers joins; pathological groupBy keys (one
  * key holding a large fraction of a 100 TB lake — an empty-string
  * content hash, a boilerplate shingle) still funnel into a single
  * reducer. Salting splits each key across `salts` sub-keys for the
  * first (heavy) aggregation, then merges the per-salt partials with
  * a second (tiny — `salts` rows per hot key) aggregation.
  *
  * The salt derives from a row-position hash, so it spreads rows
  * regardless of content; it never appears in the OUTPUT — any salt
  * assignment merges to the same result because count/sum are
  * commutative and associative, so results stay deterministic.
  */
object Skew {

  private def salt(n: Int): Column =
    pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(n.toLong))

  /** groupBy(keys).count() with salting: identical result, no single
    * hot reducer.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int): DataFrame =
    df.withColumn("__salt", salt(salts))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("count"))

  /** groupBy(keys).sum(valueCol) with salting. For engine-exact sums
    * at scale, pass a decimal-cast column (decimal addition is
    * order-independent — double partials are not bit-stable).
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], value: Column, salts: Int): DataFrame =
    df.withColumn("__salt", salt(salts))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("sum"))
}
