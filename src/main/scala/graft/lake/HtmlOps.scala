package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML cleanup projections — columnar re-expressions of the
  * reference's line-by-line Python cleaners. All are pure
  * `regexp_replace` chains, so they stay inside whole-stage codegen
  * and push no shuffle.
  */
object HtmlOps {

  /** Drop <script>/<style>/<svg> subtrees (`profiler_utils.py:219-232`). */
  def stripScriptStyleSvg(c: Column): Column =
    regexp_replace(c, "(?is)<(script|style|svg)\\b[^>]*>.*?</(script|style|svg)>", " ")

  /** Drop non-infobox <table> elements (`profiler_utils.py:256-263`). */
  def removeTables(c: Column): Column =
    regexp_replace(c, "(?is)<table(?![^>]*infobox)[^>]*>.*?</table>", " ")

  /** Keep the <body> subtree when present (`profiler_utils.py:265-268`). */
  def bodyOnly(c: Column): Column =
    when(c.rlike("(?is)<body"), regexp_extract(c, "(?is)<body[^>]*>(.*?)</body>", 1)).otherwise(c)

  /** Remove all remaining tags. */
  def stripTags(c: Column): Column = regexp_replace(c, "<[^>]*>", " ")

  /** Collapse runs of whitespace and trim. */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Minimal html entity unescape (`evaluate_synthetic.py:139`).
    * `&amp;` is resolved LAST so nested escapes single-unescape like
    * Python `html.unescape`: `&amp;lt;` → `&lt;`, not `<`.
    */
  def htmlUnescape(c: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
  }

  /** Full text-from-html projection used by the cleaners. */
  def textFromHtml(c: Column): Column =
    collapseWs(stripTags(stripScriptStyleSvg(c)))
}
