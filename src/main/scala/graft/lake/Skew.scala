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
  * The salt derives from a hash of the ROW CONTENT (all columns) —
  * never from partition ids or monotonically_increasing_id, which
  * change when a lost task recomputes its input and would double- or
  * under-count rows after a shuffle fetch failure (the
  * SPARK-23207-class nondeterministic-expression-before-shuffle
  * hazard). Content hashing is retry-stable; rows that are full
  * duplicates share a salt, but map-side partial aggregation has
  * already collapsed those to one row per (map task, key, salt), so
  * the reducer hot-spot cannot reform.
  */
object Skew {

  private def salt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(n.toLong))

  /** groupBy(keys).count() with salting: identical result, no single
    * hot reducer.
    */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int): DataFrame =
    df.withColumn("__salt", salt(df, salts))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("count"))

  /** groupBy(keys).sum(valueCol) with salting. For engine-exact sums
    * at scale, pass a decimal-cast column (decimal addition is
    * order-independent — double partials are not bit-stable).
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], value: Column, salts: Int): DataFrame =
    df.withColumn("__salt", salt(df, salts))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("sum"))
}
