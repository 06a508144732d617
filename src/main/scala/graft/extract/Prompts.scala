package graft.extract

/** Prompt template library — the engine's counterpart of the
  * reference's eight templates (`prompts.py:2-281`): schema-id,
  * direct extraction (zero-shot / with context), attribute validity,
  * pick-value, and function generation ×2. Wording is our own; the
  * structural contract (what the completion must contain) mirrors
  * the reference so a real LLM client slots in unchanged.
  *
  * The function-generation templates ask for an extractor SPEC
  * (JSON, one of the ExtractorSpec kinds) instead of raw Python —
  * same capability, sandbox-free (SURVEY §7 hard part (a)).
  */
object Prompts {

  /** OpenIE schema identification: list "field: value" pairs present
    * in the chunk (`prompts.py` SCHEMA_ID shape).
    */
  def schemaId(chunk: String): String =
    s"""Task: list the attribute-value pairs literally present in the text.
       |Answer with one "field: value" line per pair and nothing else.
       |text: $chunk""".stripMargin

  /** Evaporate-Direct extraction: one attribute from one chunk. */
  def directExtract(attribute: String, chunk: String): String =
    s"""Task: extract the value of one attribute from the text.
       |Answer with the value only, or an empty line if absent.
       |attribute: $attribute
       |text: $chunk""".stripMargin

  /** Schema rerank vote (`rerank`/`rerank_metadata`,
    * `schema_identification.py:131-230`): which of the candidate
    * fields matter most. `round` varies the framing (the reference
    * shuffles the candidate list; we vary the instruction
    * deterministically instead).
    */
  def rerankFields(fields: Seq[String], round: Int): String = {
    val framing = round % 3 match {
      case 0 => "most important attributes for a structured view of these documents"
      case 1 => "attributes a user would query first"
      case _ => "attributes with the most analytical value"
    }
    s"""Task: from the candidate fields, list the $framing.
       |Answer with one field name per line, nothing else.
       |candidates:
       |${fields.map("- " + _).mkString("\n")}""".stripMargin
  }

  /** Attribute validity check (`profiler.py:49-112` LLM part). */
  def attrValidity(attribute: String, values: Seq[String]): String =
    s"""Task: could the following be values of the attribute "$attribute"?
       |Answer yes or no.
       |values: ${values.mkString("; ")}""".stripMargin

  /** Pick one value among disagreeing candidate extractions. */
  def pickValue(attribute: String, candidates: Seq[String], context: String = ""): String =
    s"""Task: pick the single best value for "$attribute" from the candidates.
       |Answer with the value only.
       |candidates: ${candidates.mkString(" | ")}
       |${if (context.nonEmpty) s"context: $context" else ""}""".stripMargin

  /** Function synthesis, variant A: extractor spec from an example
    * chunk (`prompts.py` METADATA_EXTRACTION_WITH_LM shape).
    */
  def synthesizeSpecA(attribute: String, chunk: String): String =
    s"""Task: write an extractor spec (JSON) that extracts "$attribute" from
       |documents shaped like the example. Allowed kinds: field_line, regex,
       |split, html. Answer with the JSON object only.
       |example: $chunk""".stripMargin

  /** Function synthesis, variant B: spec without example (zero-shot). */
  def synthesizeSpecB(attribute: String): String =
    s"""Task: write an extractor spec (JSON) that extracts "$attribute" from
       |key-value text documents. Allowed kinds: field_line, regex, split,
       |html. Answer with the JSON object only.""".stripMargin
}
