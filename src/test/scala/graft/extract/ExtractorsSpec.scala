package graft.extract

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtractorsSpec extends SparkSpec {
  import spark.implicits._

  private def runSpec(spec: ExtractorSpec, texts: String*): Seq[Seq[String]] =
    texts.toDF("t").select(spec.compile(col("t"))).collect().toSeq.map(_.getSeq[String](0))

  test("RegexExtract returns all trimmed matches") {
    val s = RegexExtract("f1", "K(\\d+)")
    assert(runSpec(s, "K123 and K456", "none") == Seq(Seq("123", "456"), Seq()))
  }

  test("SplitMarker extracts between markers, falls back to end") {
    val s = SplitMarker("f2", "Applicant: ", "\n")
    assert(runSpec(s, "Applicant: Acme Corp\nDate: x", "Applicant: Tail Co") ==
      Seq(Seq("Acme Corp"), Seq("Tail Co")))
  }

  test("FieldLine matches 'attr: value' lines case-insensitively") {
    val s = FieldLine("f3", "510(k) Number")
    assert(runSpec(s, "Device: x\n510(k) number: K151917\n") == Seq(Seq("K151917")))
  }

  test("HtmlSelector pulls tag text and attribute values") {
    assert(runSpec(HtmlSelector("f4", "title"), "<html><title>A Movie</title></html>") ==
      Seq(Seq("A Movie")))
    assert(runSpec(HtmlSelector("f5", "meta", "content"), "<meta name=\"y\" content=\"1999\">") ==
      Seq(Seq("1999")))
  }

  test("spec JSON round-trips") {
    val specs: Seq[ExtractorSpec] = Seq(
      RegexExtract("a", "x(\\d+)", 1),
      SplitMarker("b", "pre", "post"),
      FieldLine("c", "budget"),
      HtmlSelector("d", "meta", "content"))
    specs.foreach { s => assert(ExtractorSpec.fromJson(ExtractorSpec.toJson(s)) == s) }
  }

  test("MockLlmClient extracts field-line answers from direct prompts") {
    val c   = MockLlmClient()
    val out = c.complete(Iterator("attribute: budget\ntext: name: x\nbudget: $5M\n")).toSeq
    assert(out == Seq("$5M"))
  }

  test("DirectExtract runs the client over (chunk, attribute) rows") {
    val chunks = Seq((1L, "budget", "budget: $5M"), (2L, "budget", "nothing")).toDF("doc_id", "attribute", "chunk")
    val got = DirectExtract(chunks, MockLlmClient(), "doc_id")
      .select("doc_id", "value").orderBy("doc_id")
    assert(rows(got) == Seq(Seq(1L, "$5M"), Seq(2L, "")))
  }
}
