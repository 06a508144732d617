package graft.relops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-table event-time AS-OF join: each left row picks up the right
  * row with the greatest right timestamp ≤ its own, per key — the
  * temporal join financial/event pipelines run constantly and plain
  * SQL can only express as a correlated subquery or an inequality
  * join. The reference has no temporal operators (SURVEY §2.9);
  * north-star operator, checked against DuckDB's native ASOF JOIN.
  *
  * Formulation: union the two streams with a side tag, then ONE
  * window pass per key ordered by (ts, side) carrying the last
  * non-null right payload forward (right sorts before left on ties,
  * so "≤" is inclusive). This is the scale shape: a single shuffle
  * on the key, rows stream through the frame in order — never the
  * inequality-join pair explosion (|left| × |right| per key), which
  * is what Spark plans for a raw `l.ts >= r.ts` range condition.
  *
  * Determinism: the right side must be unique per (key, ts) — callers
  * reduce duplicates first (e.g. keep the max-id row) — and every
  * window order key is listed explicitly. DuckDB's ASOF JOIN has the
  * same uniqueness expectation (ties are unspecified otherwise).
  */
object AsOfJoin {

  /** Left rows + the as-of right payload columns (null when no right
    * row precedes).
    *
    * @param left      probe side; all its columns pass through
    * @param right     build side, unique per (keyCols, rightTs)
    * @param keyCols   equi-join key column names (same names both sides)
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param rightVals right payload column names to carry
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    require(rightVals.nonEmpty, "asof needs at least one right payload column")
    val leftCols = left.columns.toSeq
    require(
      !rightVals.exists(leftCols.contains),
      s"right payload columns ${rightVals.filter(leftCols.contains)} collide with left columns")

    // union schema: key cols + ts + tagged side + left payload + ONE
    // struct of the right payload. The struct is non-null for every
    // right row (even when every payload field inside it is NULL) and
    // null for left rows, so a single last(ignoreNulls=true) carries
    // the whole matched row atomically — per-column carries would mix
    // values from different right rows and skip a matched row whose
    // field is NULL, diverging from DuckDB ASOF JOIN semantics.
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v).copy(name = v)))
    val lTagged = left.select(
      (keyCols.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(rightStructType).as("__rpay"): _*)
    val rTagged = right.select(
      (keyCols.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as("__rpay"): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged
      .unionByName(rTagged)
      .withColumn("__rpay", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col(s"__rpay.$v").as(v)): _*)
  }
}
