package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OpenIE schema identification (`schema_identification.py`) and the
  * attribute hygiene passes (`run_profiler.py:122-171`,
  * `profiler.py:49-112`).
  *
  * All operators work on a long (doc, field[, value]) relation; the
  * attribute universe is orders of magnitude smaller than the lake,
  * so every ranking/merge here aggregates down before any window —
  * the windows run over the tiny attribute relation, never the lake.
  * Tie-breaks are lexicographic (deterministic) instead of the
  * reference's Counter/LLM insertion order (SURVEY §7 hard part (b)).
  */
object SchemaId {

  /** Field frequency across docs (`schema_identification.py:24,84`):
    * one count per (doc, field) regardless of multiplicity.
    * fields: (keyCol, field).
    */
  def fieldCount(fields: DataFrame, keyCol: String): DataFrame =
    fields
      .select(col(keyCol), col("field"))
      .distinct()
      .groupBy(col("field"))
      .agg(count(lit(1)).as("n_docs"))

  /** Rank attributes by a score column (frequency by default), keep
    * top k (`run_profiler.py:283-293, 404-414`). Canonical ranking
    * tie-break: score desc, field asc.
    */
  def rankAttributes(counts: DataFrame, k: Int, scoreCol: String = "n_docs"): DataFrame = {
    val w = Window.orderBy(desc(scoreCol), asc("field"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LLM-rerank vote merge arithmetic
    * (`rerank`/`rerank_metadata`, `schema_identification.py:131-230`):
    * fields with votes > 1 score votes·count, voted-once fields keep
    * count, unvoted leftovers count/2. votes: (field, votes).
    */
  def rerankMerge(counts: DataFrame, votes: DataFrame): DataFrame =
    counts
      .join(votes, Seq("field"), "left")
      .withColumn(
        "merged",
        when(col("votes") > 1, col("votes").cast("double") * col("n_docs"))
          .when(col("votes").isNotNull, col("n_docs").cast("double"))
          .otherwise(col("n_docs") / lit(2.0)))
      .select(col("field"), col("n_docs"), coalesce(col("votes"), lit(0L)).as("votes"), col("merged"))

  /** Schema-id eval@k (`evaluate_synthetic.py:31-88`): P/R/F1 of the
    * top-k ranked fields vs the gold field set, for each k.
    */
  def schemaEvalAtK(ranked: DataFrame, gold: DataFrame, ks: Seq[Int]): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val ksDf   = ks.toDF("k")
    val nGold  = broadcast(gold.select(col("field")).distinct().agg(count(lit(1)).as("n_gold")))
    val hits = ranked
      .join(gold.select(col("field")).distinct(), Seq("field"), "left_semi")
      .select(col("rank"))
    val scored = ksDf
      .join(hits, col("rank") <= col("k"), "left")
      .groupBy(col("k"))
      .agg(count(col("rank")).as("n_hit"))
      .crossJoin(nGold)
      .withColumn("precision", col("n_hit").cast("double") / col("k"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_gold"))
      .withColumn(
        "f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(0.0))
    scored.select(col("k"), col("n_hit"), col("precision"), col("recall"), col("f1"))
  }

  /** Attribute dedup (`determine_attributes_to_remove`,
    * `run_profiler.py:122-171`): drop an attribute whose name is
    * contained in another attribute with an identical metric.
    * attrs: (attribute, metric). Returns survivors.
    */
  def attrDedup(attrs: DataFrame): DataFrame = {
    val other = attrs
      .select(col("attribute").as("other_attr"), col("metric").as("other_metric"))
    attrs.join(
      broadcast(other),
      col("other_attr") =!= col("attribute") &&
        col("other_attr").contains(col("attribute")) &&
        col("other_metric") === col("metric"),
      "left_anti")
  }

  /** Relational half of the attribute validity check
    * (`check_remove_attribute`, `profiler.py:49-112`): per attribute,
    * distinct-value count, modal value (lexicographic tie), null
    * fraction; flag constant columns and all-null columns for
    * removal. extractions: (attribute, value).
    */
  def attrValidityAgg(extractions: DataFrame): DataFrame = {
    val nonNull = extractions.filter(col("value").isNotNull)
    val modes = nonNull
      .groupBy(col("attribute"), col("value"))
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy(col("attribute")).orderBy(desc("n"), asc("value"))))
      .filter(col("rk") === 1)
      .select(col("attribute"), col("value").as("mode_val"))
    extractions
      .groupBy(col("attribute"))
      .agg(
        countDistinct(col("value")).as("n_distinct"),
        avg(when(col("value").isNull, 1.0).otherwise(0.0)).as("null_frac"))
      .join(modes, Seq("attribute"), "left")
      .withColumn("drop_attr", col("n_distinct") <= 1 || col("null_frac") >= 1.0)
      .select(col("attribute"), col("n_distinct"), col("mode_val"), col("null_frac"), col("drop_attr"))
  }

  /** Gold-attribute ranking by non-null frequency
    * (`run_profiler.py:108-118`). gold: (keyCol, attribute, value).
    */
  def goldAttrRank(gold: DataFrame): DataFrame = {
    val w = Window.orderBy(desc("n_nonnull"), asc("attribute"))
    gold
      .groupBy(col("attribute"))
      .agg(sum(when(col("value").isNotNull && length(trim(col("value"))) > 0, 1).otherwise(0)).as("n_nonnull"))
      .withColumn("rank", row_number().over(w))
  }

  /** Metadata-string rerank prep (`get_metadata_string_w_value`,
    * `schema_identification.py:90-128`): order fields by
    * (count, name) desc, drop singletons when any field repeats,
    * keep ≤ cap fields, attach ≤ 2 sample values (lexicographically
    * smallest — deterministic replacement for the seeded shuffle).
    * fields: (field, n_docs); values: (field, value).
    */
  def metadataStringRerank(counts: DataFrame, values: DataFrame, cap: Int = 200): DataFrame = {
    val wAll = Window.partitionBy()
    val kept = counts
      .withColumn("max_n", max(col("n_docs")).over(wAll))
      .filter(col("max_n") <= 1 || col("n_docs") > 1)
      .withColumn("rank", row_number().over(Window.orderBy(desc("n_docs"), desc("field"))))
      .filter(col("rank") <= cap)
      .drop("max_n")
    val samples = values
      .groupBy(col("field"))
      .agg(slice(array_sort(collect_set(col("value"))), 1, 2).as("sample_values"))
    kept.join(samples, Seq("field"), "left")
      .select(col("field"), col("n_docs"), col("rank"),
        concat_ws(", ", coalesce(col("sample_values"), array())).as("sample_str"))
  }

  /** Attribute alias theta-join (`evaluate_synthetic.py:349-382`):
    * match attribute names across pred/gold via exact, pluralized,
    * or space-stripped containment. Broadcast nested loop over the
    * two tiny attribute sets.
    */
  def attrAliasJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l  = lower(col("attr_a"))
    val r  = lower(col("attr_b"))
    val ls = regexp_replace(l, " ", "")
    val rs = regexp_replace(r, " ", "")
    left.join(
      broadcast(right),
      l === r || concat(l, lit("s")) === r || concat(r, lit("s")) === l || ls === rs,
      "inner")
  }
}
