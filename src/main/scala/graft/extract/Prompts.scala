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

  /** Direct-extraction template variant — the reference ships FOUR
    * distinct prompt families for the same (attribute, chunk) slot
    * (`prompts.py:33-127`) and run-quality/token-cost A/Bs between
    * them are part of its experiment surface, so they are separate
    * selectable shapes here, not one collapsed template:
    *
    *  - `zero_shot`  `METADATA_EXTRACTION_WITH_LM_ZERO_SHOT`
    *    (`prompts.py:73-80`): no examples — the minimal slot-only
    *    shape. THE default: byte-identical to the engine's historical
    *    single template, so gated outputs and token ledgers are
    *    unchanged unless a caller opts into a variant.
    *  - `few_shot`   `METADATA_EXTRACTION_WITH_LM` (`prompts.py:33-71`):
    *    worked span-extraction examples before the slot.
    *  - `extra`      `EXTRA_PROMPT` (`prompts.py:82-98`): the
    *    markup-attribute worked example (value inside an href).
    *  - `context`    `METADATA_EXTRACTION_WITH_LM_CONTEXT`
    *    (`prompts.py:104-127`): asks for the value PLUS the span of
    *    text around it, with examples answering in that shape.
    *
    * Every variant keeps the live `attribute:` / `text:` lines as the
    * FIRST occurrence of those markers (worked examples are phrased
    * without them) — the structural contract extraction clients parse.
    */
  sealed abstract class DirectVariant(val name: String)
  object DirectVariant {
    case object ZeroShot extends DirectVariant("zero_shot")
    case object FewShot  extends DirectVariant("few_shot")
    case object Extra    extends DirectVariant("extra")
    case object Context  extends DirectVariant("context")
    val all: Seq[DirectVariant] = Seq(ZeroShot, FewShot, Extra, Context)
    def fromName(n: String): DirectVariant =
      all.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"unknown direct prompt variant '$n' (one of ${all.map(_.name).mkString(", ")})"))
  }

  /** Evaporate-Direct extraction: one attribute from one chunk, in
    * the chosen template variant. The zero-shot default renders the
    * bare slot shape every engine path has always used.
    */
  def directExtract(
      attribute: String,
      chunk: String,
      variant: DirectVariant = DirectVariant.ZeroShot): String = variant match {
    case DirectVariant.ZeroShot =>
      s"attribute: $attribute\ntext: $chunk"
    case DirectVariant.FewShot =>
      s"""Task: return the full span of the named attribute from the sample,
         |or an empty line if absent.
         |Worked example - sample:
         |  Apple Inc. is headquartered in Cupertino, California Since 1987.
         |Worked example - span of "location": Cupertino, California Since 1987
         |----
         |attribute: $attribute
         |text: $chunk""".stripMargin
    case DirectVariant.Extra =>
      s"""Task: return the full value of the named attribute from the sample,
         |or an empty line if absent.
         |Worked example - sample:
         |  <a href="/year/2012;price=$$550;url=http%www.myname.com;?" target="_blank"></a>
         |Worked example - "price": $$550
         |----
         |attribute: $attribute
         |text: $chunk""".stripMargin
    case DirectVariant.Context =>
      // NB: the example wording must not contain the live markers —
      // "with conTEXT: " would embed a literal "text: " substring and
      // hijack a first-marker parser's text slot
      s"""Task: return the full value of the named attribute from the sample
         |and the surrounding words around it, or an empty line if absent.
         |Worked example - sample:
         |  The iphone price increases a lot this year. Each iphone's price is as high as 1000$$.
         |Worked example - "price" in its surrounding words: [Each iphone's price is as high as 1000$$]
         |----
         |attribute: $attribute
         |text: $chunk""".stripMargin
  }

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
