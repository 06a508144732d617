package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spec-based extractor runtime — the engine's answer to the
  * reference's synthesized-Python UDF surface (`get_functions`,
  * `profiler.py:354-410`; sandboxed exec `profiler.py:247-347`).
  *
  * Instead of exec()ing LLM-written Python under a SIGALRM sandbox,
  * synthesis emits a *spec* (one of the three function shapes the
  * reference's prompts actually elicit — regex findall, split between
  * markers, html/meta selector; `prompts.py:206-281`). Each spec
  * compiles to a native column expression, so the "function" runs
  * inside whole-stage codegen over the whole lake — no sandbox, no
  * timeout, no per-row interpreter.
  *
  * Specs serialize as JSON strings (D6 `function_dictionary`
  * equivalent) so a catalog of synthesized extractors is itself a
  * DataFrame.
  */
sealed trait ExtractorSpec {
  def key: String

  /** Compile to a column over the chunk text → ARRAY<STRING> of
    * extracted values (empty array = abstain).
    */
  def compile(text: Column): Column
}

/** All regex matches of `pattern` group `group`. */
final case class RegexExtract(key: String, pattern: String, group: Int = 1) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val hits = regexp_extract_all(text, lit(pattern), lit(group))
    filter(transform(hits, v => trim(v)), v => length(v) > 0)
  }
}

/** Text between literal `pre` and `post` markers (first occurrence). */
final case class SplitMarker(key: String, pre: String, post: String) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val qp  = java.util.regex.Pattern.quote(pre)
    val qs  = if (post.isEmpty) "$" else java.util.regex.Pattern.quote(post)
    val hit = trim(regexp_extract(text, s"(?s)$qp(.*?)(?:$qs|$$)", 1))
    filter(array(hit), v => length(v) > 0)
  }
}

/** Value after "<attr>:" on the same line — the dominant shape for
  * key-value documents (FDA-510k style).
  */
final case class FieldLine(key: String, attr: String) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val q   = java.util.regex.Pattern.quote(attr)
    val hit = trim(regexp_extract(text, s"(?im)^\\s*$q\\s*[:=]\\s*(.+?)\\s*$$", 1))
    filter(array(hit), v => length(v) > 0)
  }
}

/** Content of an html tag/meta field, e.g. <title>…</title> or
  * <meta name="x" content="…">.
  */
final case class HtmlSelector(key: String, tag: String, attrName: String = "") extends ExtractorSpec {
  def compile(text: Column): Column = {
    // quote LLM-supplied names — a synthesized spec containing regex
    // metacharacters must not change or break the pattern
    val qt = java.util.regex.Pattern.quote(tag)
    val qa = java.util.regex.Pattern.quote(attrName)
    val hit =
      if (attrName.isEmpty)
        trim(regexp_extract(text, s"(?is)<$qt[^>]*>(.*?)</$qt>", 1))
      else
        trim(regexp_extract(text, s"""(?is)<$qt[^>]*\\b$qa\\s*=\\s*["']([^"']*)["']""", 1))
    filter(array(hit), v => length(v) > 0)
  }
}

object ExtractorSpec {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  implicit private val fmts: Formats = DefaultFormats

  def toJson(s: ExtractorSpec): String = {
    val m: Map[String, Any] = s match {
      case RegexExtract(k, p, g) => Map("kind" -> "regex", "key" -> k, "pattern" -> p, "group" -> g)
      case SplitMarker(k, a, b)  => Map("kind" -> "split", "key" -> k, "pre" -> a, "post" -> b)
      case FieldLine(k, a)       => Map("kind" -> "field_line", "key" -> k, "attr" -> a)
      case HtmlSelector(k, t, a) => Map("kind" -> "html", "key" -> k, "tag" -> t, "attrName" -> a)
    }
    JsonMethods.compact(JsonMethods.render(Extraction.decompose(m)))
  }

  def fromJson(js: String): ExtractorSpec = {
    val j = JsonMethods.parse(js)
    def str(f: String): String = (j \ f).extract[String]
    (j \ "kind").extract[String] match {
      case "regex"      => RegexExtract(str("key"), str("pattern"), (j \ "group").extractOrElse[Int](1))
      case "split"      => SplitMarker(str("key"), str("pre"), str("post"))
      case "field_line" => FieldLine(str("key"), str("attr"))
      case "html"       => HtmlSelector(str("key"), str("tag"), (j \ "attrName").extractOrElse[String](""))
      case k            => throw new IllegalArgumentException(s"unknown extractor kind: $k")
    }
  }
}
