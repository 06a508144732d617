package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** LLM prompt operator (`apply_prompt`/`get_response`,
  * `utils.py:36-60, 244-298`).
  *
  * The reference calls an HTTP LLM once per (chunk, prompt) in a
  * driver loop with a sqlite response cache. Here the operator is a
  * `mapPartitions` stage: each partition drains its prompts through
  * one client instance (connection reuse, batched), so throughput
  * scales with executors and the driver never sees a prompt.
  *
  * Tests and the hermetic cascade use [[MockLlmClient]] — a
  * deterministic completion function — so the pipeline runs with zero
  * egress (the container has no network anyway).
  */
trait LlmClient extends Serializable {

  /** Implementations MUST be thread-safe and reentrant: the profiler
    * invokes one shared instance concurrently from
    * `ProfilerConfig.attrParallelism` driver threads (per-attribute
    * cascades) and from every executor task of a `mapPartitions` LLM
    * stage. Keep per-call state local (as [[MockLlmClient]] and
    * [[HttpLlmClient]] do) or guard shared state yourself; a client
    * with unsynchronized mutable state needs `attrParallelism = 1`.
    */
  def complete(prompts: Iterator[String]): Iterator[String]
}

/** Deterministic mock: answers extraction prompts of the form
  * "attribute: X\ntext: ..." with the first "X: value" line found in
  * the text; schema-id prompts with the "k: v"-shaped lines present.
  * HTML text is read the way an LLM would: `<meta name="X"
  * content="V">` and `<X>V</X>` count as (X, V) pairs for both
  * extraction and schema-id, and synthesis prompts whose example
  * chunk is HTML elicit an `html`-kind spec (HtmlSelector) instead of
  * a field_line — the SWDE-style corpus path (`run.sh:4-27`,
  * `prompts.py:206-281`). Canned overrides win (keyed by exact
  * prompt) — the test fixture path (FIXTURES.md A7).
  */
final case class MockLlmClient(canned: Map[String, String] = Map.empty) extends LlmClient {
  private val fieldLine = java.util.regex.Pattern.compile("(?m)^\\s*([A-Za-z0-9()/ _-]{1,40}?)\\s*:\\s*(.+?)\\s*$")
  private val metaPair  = java.util.regex.Pattern.compile("(?is)<meta[^>]*\\bname\\s*=\\s*[\"']([^\"']+)[\"'][^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']")
  private val titlePair = java.util.regex.Pattern.compile("(?is)<(title)[^>]*>(.*?)</title>")

  def complete(prompts: Iterator[String]): Iterator[String] = prompts.map { p =>
    canned.getOrElse(p, answer(p))
  }

  private def quoted(s: String) = java.util.regex.Pattern.quote(s)

  /** First (attr, value) hit in HTML text: the attr's meta tag, else
    * an `<attr>` element (e.g. title).
    */
  private def htmlValue(attr: String, text: String): String = {
    val meta = java.util.regex.Pattern
      .compile(s"(?is)<meta[^>]*\\bname\\s*=\\s*[\"']${quoted(attr)}[\"'][^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']")
      .matcher(text)
    if (meta.find()) meta.group(1)
    else {
      val tag = java.util.regex.Pattern
        .compile(s"(?is)<${quoted(attr)}[^>]*>(.*?)</${quoted(attr)}>")
        .matcher(text)
      if (tag.find()) tag.group(1).trim else ""
    }
  }

  private def answer(p: String): String = {
    val attrMarker = "attribute: "
    val textMarker = "text: "
    val ai         = p.indexOf(attrMarker)
    val ti         = p.indexOf(textMarker)
    if (p.contains("write an extractor spec")) {
      // function-synthesis prompts → a spec for the attribute; an
      // HTML example chunk elicits an html-kind spec (the shape the
      // reference's prompts produce on SWDE pages), else field_line
      val m = java.util.regex.Pattern.compile("extracts \"([^\"]+)\"").matcher(p)
      if (m.find()) {
        val attr    = m.group(1)
        val key     = s"fn_${attr.replaceAll("[^A-Za-z0-9]", "_")}"
        val exIdx   = p.indexOf("example: ")
        val example = if (exIdx >= 0) p.substring(exIdx + "example: ".length) else ""
        val exLc    = example.toLowerCase
        if (exLc.contains(s"""name="${attr.toLowerCase}"""")) ExtractorSpec.toJson(HtmlSelector(key, "meta", "content"))
        else if (exLc.contains(s"<${attr.toLowerCase}>")) ExtractorSpec.toJson(HtmlSelector(key, attr))
        else ExtractorSpec.toJson(FieldLine(key, attr))
      } else ""
    } else if (p.contains("Answer yes or no")) {
      "yes"
    } else if (p.contains("from the candidate fields")) {
      // rerank prompts → keep the first half of the "- field" lines
      // (line-based, so field names with commas survive intact)
      val m      = java.util.regex.Pattern.compile("(?m)^- (.+)$").matcher(p)
      val fields = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) fields += m.group(1).trim
      fields.take(math.max(fields.length / 2, 1)).mkString("\n")
    } else if (p.contains("pick the single best value")) {
      val m = java.util.regex.Pattern.compile("candidates: ([^|\\n]+)").matcher(p)
      if (m.find()) m.group(1).trim else ""
    } else if (ai >= 0 && ti >= 0) {
      val attr = p.substring(ai + attrMarker.length, p.indexOf('\n', ai).max(ai + attrMarker.length))
      val text = p.substring(ti + textMarker.length)
      val m    = java.util.regex.Pattern.compile("(?im)^\\s*" + quoted(attr.trim) + "\\s*[:=]\\s*(.+?)\\s*$").matcher(text)
      if (m.find()) m.group(1)
      else htmlValue(attr.trim, text) // HTML docs: meta/tag hit or abstain
    } else {
      // schema-id shape: emit the field: value lines present in the
      // document text (only scan after the "text:" marker so prompt
      // instructions don't leak in as fields); HTML meta/title tags
      // count as pairs too — how the reference's schema-id prompt
      // reads SWDE pages
      val body = if (ti >= 0) p.substring(ti + textMarker.length) else p
      val m    = fieldLine.matcher(body)
      val sb   = new StringBuilder
      while (m.find()) { sb.append(m.group(1)).append(": ").append(m.group(2)).append('\n') }
      val mm = metaPair.matcher(body)
      while (mm.find()) { sb.append(mm.group(1)).append(": ").append(mm.group(2)).append('\n') }
      val tm = titlePair.matcher(body)
      while (tm.find()) { sb.append(tm.group(1)).append(": ").append(tm.group(2).trim).append('\n') }
      sb.toString
    }
  }
}

/** Thrown by [[BailingLlmClient]] when too many consecutive prompts
  * fail — the cascade catches it and fails just that attribute.
  */
final case class LlmBailException(message: String) extends RuntimeException(message)

/** Per-attribute consecutive-error bail (`profiler.py:474-477`: >10
  * consecutive LLM errors abandon the attribute). Each failing prompt
  * yields "" (the abstain completion) and bumps a consecutive-failure
  * counter; any success resets it; once failures exceed
  * `maxConsecutive` the next prompt throws [[LlmBailException]].
  *
  * The profiler creates ONE instance per attribute cascade, so the
  * counter scope matches the reference's per-attribute loop. Prompts
  * are forwarded one at a time (a failure must not poison the whole
  * batch); batching clients keep their connection reuse — only the
  * batch boundary moves. Serialized into executor tasks the counter
  * is per-partition: a bail there fails the Spark job, which the
  * cascade reports as that attribute's failure — same outcome.
  */
final class BailingLlmClient(inner: LlmClient, maxConsecutive: Int = 10) extends LlmClient {
  private val consec = new java.util.concurrent.atomic.AtomicInteger(0)

  def complete(prompts: Iterator[String]): Iterator[String] = prompts.map { p =>
    if (consec.get() > maxConsecutive)
      throw LlmBailException(s"abandoning attribute after ${consec.get()} consecutive LLM errors")
    try {
      val it = inner.complete(Iterator.single(p))
      val a  = if (it.hasNext) it.next() else ""
      consec.set(0)
      a
    } catch {
      case e: LlmBailException => throw e
      case _: Throwable =>
        if (consec.incrementAndGet() > maxConsecutive)
          throw LlmBailException(s"abandoning attribute after ${consec.get()} consecutive LLM errors")
        ""
    }
  }
}

/** Evaporate-Direct (`main.py:52-99`): prompt the model on every
  * (chunk, attribute) pair and parse one value per pair.
  */
object DirectExtract {

  /** chunks: (idCol, attribute, chunk). Output adds (extractor, value).
    * Dataset.mapPartitions (not `df.rdd`), so the stage also runs
    * inside a STREAMING plan — extraction on ingest. Prompts flow in
    * fixed-size batches (graft.api.Profiler.LlmBatchSize) so per-task
    * memory is bounded by batch size, not partition size.
    *
    * `variant` selects the prompt template
    * ([[Prompts.DirectVariant]], `prompts.py:33-127`); the zero-shot
    * default renders the bare slot shape this operator has always
    * sent, so existing callers bill and behave identically.
    */
  def apply(
      chunks: DataFrame,
      client: LlmClient,
      idCol: String,
      extractorName: String = "llm",
      variant: Prompts.DirectVariant = Prompts.DirectVariant.ZeroShot): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      chunks.schema.fields :+ org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))
    val v = variant
    val out = chunks.mapPartitions { rows =>
      rows.grouped(graft.api.Profiler.LlmBatchSize).flatMap { batch =>
        val prompts = batch.iterator.map { r =>
          Prompts.directExtract(r.getAs[String]("attribute"), r.getAs[String]("chunk"), v)
        }
        val answers = client.complete(prompts)
        batch.iterator.zip(answers).map { case (r, a) => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ a) }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    out.withColumn("extractor", lit(extractorName))
  }
}
