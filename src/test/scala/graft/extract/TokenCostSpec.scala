package graft.extract

import graft.SparkSpec
import graft.api.{Profiler, ProfilerConfig}
import graft.lake.{ChunkFilter, Chunker, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The cascade's token economics, asserted numerically — the
  * reference's `total_tokens_prompted` bookkeeping
  * (`main.py:25-26, 97-98, 105-221`, `run_profiler.py:477-488`) and
  * the paper's headline 110× Code+-vs-Direct claim as checked
  * properties: LLM tokens are spent only on the `trainSize` sample,
  * the whole-lake APPLY spends ZERO, and the Direct baseline's cost
  * grows with the lake while the cascade's does not.
  */
class TokenCostSpec extends SparkSpec {

  private val goldLakeDir = new java.io.File("src/test/resources/goldlake").getAbsolutePath
  private val goldAttrs   = Seq("510(k) number", "applicant", "device name", "decision date")

  private def goldLake = Tables
    .rawLake(spark, goldLakeDir + "/*.txt")
    .withColumn("path", regexp_extract(col("path"), "([^/]+)$", 1))

  /** n uniform field-line docs: token cost per doc is near-constant,
    * so totals scale ∝ doc count by construction.
    */
  private def synthLake(n: Int): DataFrame =
    spark
      .range(n)
      .select(
        concat(lit("doc"), col("id")).as("path"),
        concat(
          lit("topic: t"), col("id") % 7,
          lit("\nsource: s"), col("id") % 3,
          // enough body that per-doc content, not prompt-template
          // overhead, dominates the token bill (the 100 TB regime)
          concat_ws("", array_repeat(lit("\nsome filler prose mentioning the topic and the source again"), 12))).as("content"))

  private def directTokens(ledger: TokenLedger, lake: DataFrame, attrs: Seq[String], stage: String): Long = {
    val chunks  = Chunker.chunkAuto(lake, "path", "path", "content", 1000)
    val attrsDf = spark.createDataFrame(attrs.map(Tuple1(_))).toDF("attribute")
    val kept    = ChunkFilter.keywordChunkFilter(chunks, attrsDf, "path")
    DirectExtract(
      kept.select(col("path"), col("attribute"), col("chunk")),
      ledger.wrap(MockLlmClient(), stage),
      "path").count()
    val Seq((_, _, p, c)) = ledger.snapshot().filter(_._1 == stage)
    p + c
  }

  test("TokenAccountingClient bills exact BPE-ish counts, prompt and completion sides") {
    val ledger  = new TokenLedger(spark.sparkContext)
    val canned  = Map("alpha beta?" -> "one, two", "gamma" -> "three!")
    val wrapped = ledger.wrap(MockLlmClient(canned), "unit")
    val answers = wrapped.complete(Iterator("alpha beta?", "gamma")).toList
    assert(answers == List("one, two", "three!"))
    val Seq((stage, calls, prompt, completion)) = ledger.snapshot()
    assert(stage == "unit" && calls == 2)
    assert(prompt == TokenLedger.countTokens("alpha beta?") + TokenLedger.countTokens("gamma"))
    assert(completion == TokenLedger.countTokens("one, two") + TokenLedger.countTokens("three!"))
    assert(ledger.totalTokens == prompt + completion)
  }

  test("scalar countTokens matches the TextStats.tokenCountBpe column twin") {
    import graft.textops.TextStats
    val samples = Seq(
      "attribute: device name\ntext: Device Name: Foo-Bar (v2.1)!",
      "plain words only",
      "",
      "punct... heavy;; [text] {here} 100%")
    val df  = spark.createDataFrame(samples.map(Tuple1(_))).toDF("t")
    val col = df.select(TextStats.tokenCountBpe(org.apache.spark.sql.functions.col("t"))).collect().map(_.getInt(0).toLong)
    assert(samples.map(TokenLedger.countTokens) == col.toSeq)
  }

  test("cascade bills only sample-side stages; the whole-lake APPLY is a checked zero") {
    val ledger = new TokenLedger(spark.sparkContext)
    val prof   = new Profiler(spark, MockLlmClient(), ProfilerConfig(chunkSize = 3000, trainSize = 6), Some(ledger))
    prof.run(goldLake, goldAttrs).count()
    val byStage = ledger.snapshot().map(r => r._1 -> r).toMap
    // the lake pass is a row in the report, and it is zero
    assert(byStage.contains("apply_lake"), s"apply_lake row missing: ${byStage.keys}")
    val (_, applyCalls, applyP, applyC) = byStage("apply_lake")
    assert(applyCalls == 0 && applyP == 0 && applyC == 0, "the whole-lake APPLY must spend zero LLM tokens")
    // every billed stage is sample-scoped (ClosedIE: synthesis + gold)
    val billed = ledger.snapshot().filter(_._2 > 0).map(_._1).toSet
    assert(billed.nonEmpty && billed.subsetOf(Set("synthesis", "gold_sample")), s"unexpected stages billed: $billed")
    // gold-on-sample prompts are bounded by the sample, not the lake:
    // ≤ trainSize docs × attribute count (one chunk per doc at this
    // chunk size; the keyword filter can only shrink it)
    val (_, goldCalls, _, _) = byStage("gold_sample")
    assert(goldCalls > 0 && goldCalls <= 6L * goldAttrs.size,
      s"gold_sample calls $goldCalls exceed trainSize×attrs = ${6 * goldAttrs.size}")
    // synthesis prompts: ≤ 4 sample chunks × 2 prompt variants per attribute
    val (_, synthCalls, _, _) = byStage("synthesis")
    assert(synthCalls > 0 && synthCalls <= 8L * goldAttrs.size)
  }

  test("OpenIE bills schema discovery stages too — and still zero on the lake pass") {
    val ledger = new TokenLedger(spark.sparkContext)
    val prof   = new Profiler(spark, MockLlmClient(), graft.api.ProfilerConfig(chunkSize = 3000, trainSize = 6), Some(ledger))
    prof.run(goldLake).count() // no attribute list → schema-id → rerank → cascades → validity
    val byStage = ledger.snapshot().map(r => r._1 -> r).toMap
    // discovery stages billed (sample-scoped)
    assert(byStage.get("schema_id").exists(_._2 > 0), s"schema_id not billed: ${ledger.snapshot()}")
    assert(byStage.get("schema_rerank").exists(_._2 == 3), "rerank is exactly 3 prompts")
    // schema-id prompts bounded by the sample CHUNK count (docs over
    // one chunkSize yield several chunks; the bound is still
    // sample-scoped, never lake-scoped)
    val (_, sidCalls, _, _) = byStage("schema_id")
    val sampleChunks = prof.sampleDocs(prof.prepare(goldLake), 6).count()
    assert(sidCalls == sampleChunks, s"schema_id calls $sidCalls != sample chunks $sampleChunks")
    // the lake APPLY stays a checked zero in OpenIE as well
    val (_, ac, ap, aco) = byStage("apply_lake")
    assert(ac == 0 && ap == 0 && aco == 0)
    val billed = ledger.snapshot().filter(_._2 > 0).map(_._1).toSet
    assert(billed.subsetOf(Set("schema_id", "schema_rerank", "synthesis", "gold_sample", "attr_validity")),
      s"unexpected stages billed in OpenIE: $billed")
  }

  test("cascade tokens are flat in lake size; Direct grows linearly — the 110x shape") {
    val attrs = Seq("topic", "source")
    def cascadeTokens(n: Int): Long = {
      val ledger = new TokenLedger(spark.sparkContext)
      val prof   = new Profiler(spark, MockLlmClient(), ProfilerConfig(chunkSize = 1000, trainSize = 5), Some(ledger))
      prof.run(synthLake(n), attrs).count()
      ledger.totalTokens
    }
    val cascadeSmall = cascadeTokens(40)
    val cascadeBig   = cascadeTokens(160)
    val directSmall  = directTokens(new TokenLedger(spark.sparkContext), synthLake(40), attrs, "direct_whole_lake")
    val directBig    = directTokens(new TokenLedger(spark.sparkContext), synthLake(160), attrs, "direct_whole_lake")
    // cascade: LLM touches trainSize docs regardless of lake size —
    // a 4× lake must NOT move tokens beyond sample-content noise
    assert(cascadeSmall > 0)
    assert(cascadeBig <= (cascadeSmall * 1.5).toLong,
      s"cascade tokens grew with the lake: $cascadeSmall -> $cascadeBig")
    // direct: every doc is prompted — 4× lake ≈ 4× tokens
    assert(directBig >= 3L * directSmall && directBig <= 5L * directSmall,
      s"direct tokens not ∝ lake size: $directSmall -> $directBig")
    // the economics: at 160 docs / trainSize 5, Direct costs many
    // multiples of the cascade, and the ratio GROWS with the lake —
    // unboundedly, which is the paper's 110× at its corpus scale
    val ratioSmall = directSmall.toDouble / cascadeSmall
    val ratioBig   = directBig.toDouble / cascadeBig
    assert(ratioBig >= 8.0, s"direct/cascade ratio too small at 160 docs: $ratioBig (small-lake ratio $ratioSmall)")
    assert(ratioBig > 2.0 * ratioSmall, s"ratio must grow with the lake: $ratioSmall -> $ratioBig")
  }

  test("tokenCostOn: the bench cost relation carries the zero APPLY row and a dominant direct row") {
    val report  = graft.SparkEntry.tokenCostOn(spark, sf0001).collect()
    val byStage = report.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byStage("apply_lake") == 0L)
    assert(byStage("direct_whole_lake") > 0L)
    val directStages = Set("direct_whole_lake", "direct_retrieval")
    val cascade = report.filter(r => !directStages(r.getString(0))).map(_.getLong(4)).sum
    assert(cascade > 0L && byStage("direct_whole_lake") > cascade,
      s"direct ${byStage("direct_whole_lake")} should exceed cascade $cascade at sf0.001")
    // the retrieval-augmented middle point: never costs more than
    // whole-lake Direct. Its savings factor IS chunks-per-doc — on
    // this corpus at chunkSize 1000 every doc is one chunk, so the
    // two are token-EQUAL here (degenerate but correct); the
    // multi-chunk economics are asserted on the goldlake fixture in
    // ProfilerSpec, where retrieval prompts strictly fewer tokens
    assert(byStage("direct_retrieval") > 0L)
    assert(byStage("direct_retrieval") <= byStage("direct_whole_lake"),
      s"retrieval Direct ${byStage("direct_retrieval")} must not exceed whole-lake ${byStage("direct_whole_lake")}")
  }

  test("direct prompt variants are distinct templates the ledger bills apart") {
    import graft.extract.Prompts.DirectVariant
    import spark.implicits._
    val chunks = Seq(
      ("d1", "applicant", "Applicant: Acme Corp\nmore text follows here"),
      ("d2", "applicant", "Applicant: Zenith Labs\nother prose around it"))
      .toDF("path", "attribute", "chunk")
    val ledger = new TokenLedger(spark.sparkContext)
    val answersByVariant = DirectVariant.all.map { v =>
      val out = DirectExtract(chunks, ledger.wrap(MockLlmClient(), s"direct_${v.name}"), "path", "llm", v)
        .select("path", "value").collect().map(r => r.getString(0) -> r.getString(1)).toMap
      v.name -> out
    }.toMap
    // every variant keeps the structural contract: the mock parses the
    // live attribute/text slots identically, so extractions agree
    answersByVariant.values.foreach { got =>
      assert(got == Map("d1" -> "Acme Corp", "d2" -> "Zenith Labs"), got.toString)
    }
    // the templates are genuinely different texts...
    val rendered = DirectVariant.all.map(v => Prompts.directExtract("applicant", "x: y", v))
    assert(rendered.distinct.size == DirectVariant.all.size, "variants must render distinct prompts")
    // ...and the ledger bills them differently: zero-shot is the
    // cheapest (no examples), each example-bearing variant costs more
    val promptToks = ledger.snapshot().map(r => r._1 -> r._3).toMap
    val zs = promptToks("direct_zero_shot")
    assert(zs > 0)
    Seq("few_shot", "extra", "context").foreach { v =>
      assert(promptToks(s"direct_$v") > zs,
        s"$v should bill more prompt tokens than zero_shot: ${promptToks(s"direct_$v")} vs $zs")
    }
    // zero-shot IS the historical bare shape — byte-identical, so
    // pre-variant token series stay comparable
    assert(Prompts.directExtract("a", "c", DirectVariant.ZeroShot) == "attribute: a\ntext: c")
  }
}
