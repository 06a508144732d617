package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-normalization projections.
  *
  * The reference cleans extraction values in three places with
  * slightly different rules; all are pure string column expressions
  * here (codegen'd, no UDF):
  *  - prediction clean (`clean_function_predictions`,
  *    `profiler_utils.py:420-458`)
  *  - eval-time token normalize (`evaluate_profiler.py:7-27`)
  *  - type normalize any→list (`evaluate_profiler.py:30-50`)
  */
object Clean {

  /** Prediction clean for a scalar string value: strip an
    * "attribute:" prefix, leading ':'/',' punctuation, collapse
    * whitespace, trim.
    */
  def cleanPrediction(value: Column, attribute: Column): Column = {
    val stripped = when(
      lower(value).startsWith(concat(lower(attribute), lit(":"))),
      value.substr(length(attribute) + 2, length(value)))
      .otherwise(value)
    trim(regexp_replace(regexp_replace(stripped, "^[:,\\s]+|[:,\\s]+$", ""), "\\s+", " "))
  }

  /** Prediction clean over ARRAY<STRING>: clean each element, drop
    * empties, order-preserving dedup (`array_distinct` preserves
    * first occurrence, matching `profiler.py:442-451`).
    */
  def cleanPredictionArray(values: Column, attribute: Column): Column =
    array_distinct(
      filter(
        transform(values, v => cleanPrediction(v, attribute)),
        v => length(v) > 0))

  /** Eval-time normalization (`evaluate_profiler.py:7-27`): lowercase,
    * strip punctuation, strip the attribute name and the token "none",
    * collapse spaces.
    */
  def normalizeForEval(value: Column, attribute: Column): Column = {
    val lc       = lower(value)
    val noPunct  = regexp_replace(lc, "[^a-z0-9 ]", " ")
    val noAttr = regexp_replace(
      noPunct,
      concat(lit("\\b"), regexp_replace(lower(attribute), "[^a-z0-9 ]", " "), lit("\\b")),
      lit(" "))
    val noNone   = regexp_replace(noAttr, "\\bnone\\b", " ")
    trim(regexp_replace(noNone, "\\s+", " "))
  }

  /** Type-normalize: any scalar to ARRAY<STRING>; null → empty array
    * (`evaluate_profiler.py:30-50`).
    */
  def toValueList(value: Column): Column =
    when(value.isNull, array().cast("array<string>"))
      .otherwise(array(value.cast("string")))

  /** Synthetic-eval normalization (`evaluate_synthetic.py:91-147`):
    * strip tags when the value looks like markup, unescape html
    * entities, "nan" → empty, collapse whitespace.
    */
  def normalizeSynthetic(value: Column): Column = {
    val detagged = when(
      value.contains("<") && value.contains(">"),
      regexp_replace(value, "<[^>]*>", " ")).otherwise(value)
    val unescaped = graft.lake.HtmlOps.htmlUnescape(detagged)
    val noNan     = when(lower(trim(unescaped)) === "nan", "").otherwise(unescaped)
    trim(regexp_replace(noNan, "\\s+", " "))
  }
}

/** Affix trimming vs train golds (`check_vs_train_extractions`,
  * `profiler_utils.py:461-529`): on the train sample, learn the
  * most common junk prefix/suffix surrounding the gold span inside
  * the extracted value, then strip those affixes lake-wide.
  *
  * Learning runs on the tiny train set driver-side (the reference's
  * quadratic LCS over ≤ train_size strings); application is a column
  * expression over the whole lake.
  */
object AffixTrim {
  import org.apache.spark.sql.DataFrame

  final case class Affixes(prefix: String, suffix: String)

  /** Learn the modal (prefix, suffix) from train (value, gold) pairs
    * where the gold appears inside the value. Ties → shorter, then
    * lexicographic (deterministic).
    */
  def learn(pairs: Seq[(String, String)]): Affixes = {
    val affixes = pairs.flatMap { case (value, gold) =>
      if (value == null || gold == null || gold.isEmpty) None
      else {
        val i = value.indexOf(gold)
        if (i < 0) None else Some((value.substring(0, i), value.substring(i + gold.length)))
      }
    }
    def modal(xs: Seq[String]): String =
      if (xs.isEmpty) ""
      else xs.groupBy(identity).toSeq
        .sortBy { case (s, g) => (-g.size, s.length, s) }
        .head._1
    Affixes(modal(affixes.map(_._1)), modal(affixes.map(_._2)))
  }

  /** Learn from train DataFrames: (value, gold) columns. */
  def learnFromTrain(train: DataFrame, valueCol: String = "value", goldCol: String = "gold"): Affixes =
    learn(train.select(valueCol, goldCol).collect().toSeq.map(r => (r.getString(0), r.getString(1))))

  /** Strip the learned affixes where present. */
  def apply(value: Column, affixes: Affixes): Column = {
    val noPre =
      if (affixes.prefix.isEmpty) value
      else when(value.startsWith(affixes.prefix), value.substr(lit(affixes.prefix.length + 1), length(value)))
        .otherwise(value)
    if (affixes.suffix.isEmpty) noPre
    else when(noPre.endsWith(affixes.suffix), noPre.substr(lit(1), length(noPre) - affixes.suffix.length))
      .otherwise(noPre)
  }
}
