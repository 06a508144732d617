package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-table evaluation joins (`evaluate_profiler.py:190-198`,
  * `run_ws.py:47-50`, `evaluate_synthetic.py:196-225`).
  *
  * The reference aligns predictions with gold labels via Python dict
  * lookups keyed by file path; at scale these are real joins. The
  * gold table is human-labeled and therefore small → broadcast hash
  * join, no shuffle of the big prediction side.
  */
object Harness {

  /** pred ⋈ gold (inner) on the given keys. */
  def joinPredGold(pred: DataFrame, gold: DataFrame, keys: Seq[String]): DataFrame =
    pred.join(broadcast(gold), keys, "inner")

  /** Rows of `df` with no gold entry — reported as skipped files
    * (`run_ws.py:47-50, 265-267`).
    */
  def missingGoldAnti(df: DataFrame, gold: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(gold), keys, "left_anti")

  /** Attribute slices (`determine_attribute_slices`,
    * `evaluate_synthetic.py:272-308`): head/tail by doc coverage
    * (≥ 50%), structured/unstructured by average value length
    * (< 20). triples: (keyCol, attribute, value); totalDocs is the
    * lake size the coverage is measured against.
    */
  def attrSlices(triples: DataFrame, totalDocs: Long): DataFrame =
    triples
      .filter(col("value").isNotNull && length(col("value")) > 0)
      .groupBy(col("attribute"))
      .agg(count(lit(1)).as("n_docs"), avg(length(col("value"))).as("avg_len"))
      .withColumn("coverage", col("n_docs").cast("double") / totalDocs)
      .withColumn("head_attr", col("coverage") >= 0.5)
      .withColumn("structured", col("avg_len") < 20.0)
      .select(col("attribute"), col("n_docs"), col("coverage"), col("avg_len"), col("head_attr"), col("structured"))

  /** OpenIE set precision/recall/F1 over (key, attribute, value)
    * triples (`evaluate_synthetic.py:14-28`): distinct-triple
    * intersection counts.
    */
  def setPrf(pred: DataFrame, gold: DataFrame, keys: Seq[String]): DataFrame = {
    // single pass: full-outer join of the two distinct triple sets,
    // then one aggregation computes |P|, |G| and |P∩G| together —
    // no re-scan per count, no caching needed
    val p = pred.select(keys.map(col): _*).distinct().withColumn("in_p", lit(1))
    val g = gold.select(keys.map(col): _*).distinct().withColumn("in_g", lit(1))
    val r = p
      .join(g, keys, "full_outer")
      .agg(
        sum(coalesce(col("in_p"), lit(0))).cast("double").as("np"),
        sum(coalesce(col("in_g"), lit(0))).cast("double").as("ng"),
        sum(coalesce(col("in_p"), lit(0)) * coalesce(col("in_g"), lit(0))).cast("double").as("ni"))
      .head()
    val (np, ng, ni) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val precision    = if (np > 0) ni / np else 0.0
    val recall       = if (ng > 0) ni / ng else 0.0
    val f1           = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    val spark        = pred.sparkSession
    import spark.implicits._
    Seq((precision, recall, f1)).toDF("precision", "recall", "f1")
  }
}
