package graft.combine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vote combiners (`combine_extractions`, `profiler.py:115-185`;
  * `methods.py:352-373`).
  *
  * All combiners work on the long/narrow extraction relation
  * (key, extractor, value) — the shape that scales: one shuffle on
  * the vote key, partial aggregation map-side, and the per-key state
  * is O(distinct values), never O(lake).
  *
  * Tie-breaks are lexicographic (deterministic), replacing Python
  * `Counter` insertion order (SURVEY §7 hard part (b)).
  */
object Combiners {

  /** Majority vote per key: most frequent value, ties → smallest
    * value lexicographically. Returns (keyCols..., value, n_votes).
    */
  def majorityVote(votes: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w    = Window.partitionBy(keys: _*).orderBy(desc("n_votes"), asc(valueCol))
    votes
      .groupBy((keys :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Majority vote that first drops empty/null votes when the
    * extraction fraction is high (`profiler.py:148-154`): with
    * fraction ≥ thresh, abstains are removed before voting.
    */
  def majorityVoteAbstainAware(
      votes: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      extractionFraction: Double,
      thresh: Double = 0.9): DataFrame = {
    val base =
      if (extractionFraction >= thresh)
        votes.filter(col(valueCol).isNotNull && length(trim(col(valueCol))) > 0)
      else votes
    majorityVote(base, keyCols, valueCol)
  }

  /** Union per-extractor outputs and collect the vote list per key
    * (`combine_extractions` `profiler.py:132-146`). Values sorted for
    * determinism. Returns (keyCols..., votes ARRAY<STRING>).
    */
  def voteCollect(extractions: Seq[DataFrame], keyCols: Seq[String], valueCol: String): DataFrame = {
    val unioned = extractions.reduce(_ unionByName _)
    unioned
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col(valueCol))).as("votes"))
  }

  /** Vote histogram → int vote matrix (`run_ws.py:41-98`): per key,
    * rank distinct votes by (count desc, value asc), keep top
    * `numElts` as the label space, map each extractor's vote to its
    * label id, else -1 (abstain).
    * votes: (key, extractor, value). Returns
    * (key, labels ARRAY<STRING>, label_map MAP<STRING,INT>,
    *  votes ARRAY<INT> ordered by extractor name).
    */
  def voteMatrix(votes: DataFrame, keyCol: String, numElts: Int = 5): DataFrame = {
    val counts = votes
      .groupBy(col(keyCol), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(desc("n"), asc("value"))
    val topLabels = counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= numElts)
      .groupBy(col(keyCol))
      .agg(collect_list(struct(col("rk"), col("value"))).as("lv"))
      .select(
        col(keyCol),
        transform(array_sort(col("lv")), x => x.getField("value")).as("labels"))
      .withColumn("label_map", map_from_arrays(col("labels"), sequence(lit(0), size(col("labels")) - 1)))

    votes
      .join(topLabels, Seq(keyCol))
      .withColumn("vote_int", coalesce(element_at(col("label_map"), col("value")), lit(-1)))
      .groupBy(col(keyCol), col("labels"), col("label_map"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("extractor"), col("vote_int")))),
          x => x.getField("vote_int")).as("votes"))
  }
}
