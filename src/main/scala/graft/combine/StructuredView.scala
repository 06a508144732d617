package graft.combine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D9: the generative index / structured view
  * (`profiler.py:676-685`, `run_profiler.py:184-200`) — long
  * (key, attribute, value) extractions pivoted to one wide row per
  * document.
  *
  * The attribute list is passed explicitly: Spark's pivot without
  * values does an extra distinct pass, and at 100 TB the attribute
  * set is schema metadata, not data. One shuffle on the doc key;
  * attribute count is small (≤50 in the reference) so the wide row
  * stays narrow enough for Tungsten rows.
  */
object StructuredView {
  def pivotView(
      extractions: DataFrame,
      keyCol: String,
      attrCol: String,
      valueCol: String,
      attributes: Seq[String]): DataFrame =
    extractions
      .groupBy(col(keyCol))
      .pivot(attrCol, attributes)
      .agg(first(col(valueCol), ignoreNulls = true))

  /** The inverse reshape: melt a wide view back to the long
    * (key, attribute, value) relation (`unpivot`/`melt`). Wide views
    * are the serving shape; the long form is what every relational
    * operator here consumes — pipelines convert both ways. Pure
    * per-row expansion (Spark's Expand node): zero shuffles, each
    * wide row emits |attrCols| long rows.
    */
  def meltView(
      wide: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      attrName: String = "attribute",
      valueName: String = "value"): DataFrame =
    wide.unpivot(Array(col(keyCol)), attrCols.map(col).toArray, attrName, valueName)
}
