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
}
