package graft.api

import graft.SparkSpec
import graft.extract.MockLlmClient
import graft.lake.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Composed eval runner (`evaluate_synthetic.main`,
  * `evaluate_synthetic.py:504-555`): schema-id@k + ClosedIE token-F1
  * + OpenIE set-P/R/F1 with lenient aliasing and gold-derived slices,
  * as ONE metrics relation over one run's artifacts. Verified three
  * ways: hand-computed arithmetic on a synthetic fixture, then the
  * txt and HTML golden lakes end-to-end.
  */
class EvaluateEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def goldTriples(dir: String): DataFrame = {
    implicit val fmts: Formats = DefaultFormats
    val src = scala.io.Source.fromFile(s"$dir/gold.json")
    val m =
      try JsonMethods.parse(src.mkString).extract[Map[String, Map[String, String]]]
      finally src.close()
    m.toSeq
      .flatMap { case (p, fs) => fs.toSeq.map { case (a, v) => (p, a, v) } }
      .toDF("path", "attribute", "value")
  }

  private def meltView(view: DataFrame, attrs: Seq[String]): DataFrame = {
    val stackExpr = attrs
      .map(a => s"'${a.replace("'", "''")}', `${a.replace("`", "``")}`")
      .mkString(", ")
    view.selectExpr("path", s"stack(${attrs.size}, $stackExpr) as (attribute, value)")
  }

  private def metricMap(out: DataFrame): Map[(String, String, String), Double] =
    out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap

  test("hand-computed fixture: aliasing, slices, and every stage's arithmetic") {
    // gold: topic (1 char, full coverage -> head+structured), snippet
    // (41 chars -> head+unstructured), lang only on d1 (coverage 0.25
    // -> tail, structured)
    val snip = "this is a long snippet value over twenty"
    val gold = (Seq("d1", "d2", "d3", "d4").flatMap(d =>
      Seq((d, "topic", "t"), (d, "snippet", snip))) :+ (("d1", "lang", "en")))
      .toDF("path", "attribute", "value")
    // pred: 'topics' aliases onto 'topic' (correct on d1-d3, missing
    // d4); snippet exact everywhere; 'junk' is a hallucinated
    // attribute that must hurt precision in EVERY slice
    val pred = (Seq("d1", "d2", "d3").map(d => (d, "topics", "t")) ++
      Seq("d1", "d2", "d3", "d4").map(d => (d, "snippet", snip)) :+
      (("d1", "junk", "noise")))
      .toDF("path", "attribute", "value")
    val ranked = Seq(("topic", 1), ("junk", 2)).toDF("field", "rank")
    val got = metricMap(Profiler.evaluateEndToEnd(ranked, pred, gold, ks = Seq(1, 2)))
    // schema-id: gold fields {topic, snippet, lang}; only rank-1
    // 'topic' hits (exact field match — aliasing is an OpenIE-stage
    // leniency, not a schema-id one)
    assert(got(("schema_id", "k=1", "precision")) == 1.0)
    assert(got(("schema_id", "k=1", "recall")) == 0.333333)
    assert(got(("schema_id", "k=1", "f1")) == 0.5)
    assert(got(("schema_id", "k=2", "precision")) == 0.5)
    assert(got(("schema_id", "k=2", "f1")) == 0.4)
    // extraction: 9 gold cells -> F1s {topic: 1,1,1,0; snippet: 1x4;
    // lang: 0} -> avg 7/9, median 1, all golds non-empty
    assert(got(("extraction", "all", "avg_f1")) == 0.777778)
    assert(got(("extraction", "all", "med_f1")) == 1.0)
    assert(got(("extraction", "all", "extraction_fraction")) == 1.0)
    // openie 'all': pred 8 triples (3 topic + 4 snippet + junk), gold
    // 9, overlap 7 -> P 7/8, R 7/9, F1 14/17
    assert(got(("openie", "all", "precision")) == 0.875)
    assert(got(("openie", "all", "recall")) == 0.777778)
    assert(got(("openie", "all", "f1")) == 0.823529)
    // head {topic, snippet}: 8 pred (junk stays in!), 8 gold, 7 hit
    assert(got(("openie", "head", "precision")) == 0.875)
    assert(got(("openie", "head", "recall")) == 0.875)
    // tail {lang}: pred has only junk -> zero overlap
    assert(got(("openie", "tail", "precision")) == 0.0)
    assert(got(("openie", "tail", "f1")) == 0.0)
    // structured {topic, lang}: pred 4 (3 topic + junk), gold 5, hit 3
    assert(got(("openie", "structured", "precision")) == 0.75)
    assert(got(("openie", "structured", "recall")) == 0.6)
    assert(got(("openie", "structured", "f1")) == 0.666667)
    // unstructured {snippet}: pred 5 (4 + junk), gold 4, hit 4
    assert(got(("openie", "unstructured", "precision")) == 0.8)
    assert(got(("openie", "unstructured", "recall")) == 1.0)
    assert(got(("openie", "unstructured", "f1")) == 0.888889)
  }

  test("edge cases: duplicate aliased preds score once; all-empty gold attrs still penalize") {
    // gold: 'topic' on two docs, plus 'notes' whose gold values are
    // ALL empty (so it enters no slice)
    val gold = Seq(
      ("d1", "topic", "t"), ("d2", "topic", "t"),
      ("d1", "notes", ""), ("d2", "notes", "")).toDF("path", "attribute", "value")
    // pred: BOTH 'Topic' and 'topics' (two NON-exact aliases — pred
    // has no exact 'topic', so both survive exact-name-wins) land on
    // d1's gold cell via aliasing — the cell must score ONCE (min
    // value = 'a' → F1 0, not the average of two fan-out rows); d2
    // correct; pred 'notes' values exist and must hurt precision in
    // EVERY slice
    val pred = Seq(
      ("d1", "Topic", "t"), ("d1", "topics", "a"),
      ("d2", "Topic", "t"),
      ("d1", "notes", "x"), ("d2", "notes", "y")).toDF("path", "attribute", "value")
    val ranked = Seq(("topic", 1)).toDF("field", "rank")
    val got = metricMap(Profiler.evaluateEndToEnd(ranked, pred, gold, ks = Seq(1)))
    // dedup pick = min("a","t") = "a" on d1 → F1 0; d2 → 1; notes
    // cells have empty gold+pred... gold '' rows: F1(pred vs '') —
    // d1 notes pred 'x' vs gold '' → 0; d2 'y' vs '' → 0.
    // avg over 4 gold cells = (0 + 1 + 0 + 0) / 4
    assert(got(("extraction", "all", "avg_f1")) == 0.25)
    // extraction_fraction counts non-empty golds only: 2/4
    assert(got(("extraction", "all", "extraction_fraction")) == 0.5)
    // openie 'all': gold triples = 2 (notes empties filtered); pred
    // triples after aliasing/cleaning = d1:{topic a, topic t, notes x},
    // d2:{topic t, notes y} = 5; overlap = {d1 topic t, d2 topic t} =
    // 2 → P 2/5, R 1 (notes is NOT in any slice, so its preds count
    // against precision but define no recall mass)
    assert(got(("openie", "all", "precision")) == 0.4)
    assert(got(("openie", "all", "recall")) == 1.0)
  }

  test("exact-name-wins: an alias never shadows a pred attribute that matches gold exactly") {
    // reference resolution (evaluate_synthetic.py): each gold
    // attribute resolves to ONE pred name, exact match first — when
    // pred holds both 'topic' (exact, correct) and 'topics' (alias,
    // wrong value 'a'), the alias must keep its own name and score as
    // precision-only misses, NOT land on the gold cell
    val gold = Seq(("d1", "topic", "t"), ("d2", "topic", "t")).toDF("path", "attribute", "value")
    val pred = Seq(
      ("d1", "topic", "t"), ("d2", "topic", "t"),
      ("d1", "topics", "a"), ("d2", "topics", "a")).toDF("path", "attribute", "value")
    val ranked = Seq(("topic", 1)).toDF("field", "rank")
    val got = metricMap(Profiler.evaluateEndToEnd(ranked, pred, gold, ks = Seq(1)))
    // ClosedIE: the gold cells see ONLY the exact 'topic' preds (both
    // correct). Under the old rename-everything map, 'topics' would
    // fold in and the min-pick ('a' < 't') would zero d1 and d2.
    assert(got(("extraction", "all", "avg_f1")) == 1.0)
    assert(got(("extraction", "all", "med_f1")) == 1.0)
    // OpenIE: 'topics' stays a hallucinated attribute in every slice
    // — pred 4 triples, gold 2, overlap 2
    assert(got(("openie", "all", "precision")) == 0.5)
    assert(got(("openie", "all", "recall")) == 1.0)
    assert(got(("openie", "all", "f1")) == 0.666667)
  }

  test("txt golden lake: one call reproduces the reference's eval tables") {
    val lakeDir = new java.io.File("src/test/resources/goldlake").getAbsolutePath
    val attrs   = Seq("510(k) number", "applicant", "device name", "decision date")
    val lake = Tables
      .rawLake(spark, lakeDir + "/*.txt")
      .withColumn("path", regexp_extract(col("path"), "([^/]+)$", 1))
    val profiler = new Profiler(spark, MockLlmClient(), ProfilerConfig(chunkSize = 3000, trainSize = 6))
    val view   = profiler.run(lake, attrs)
    val pred   = meltView(view, attrs)
    val gold   = goldTriples(lakeDir)
    val ranked = profiler.rerankSchema(profiler.identifySchema(
      profiler.sampleDocs(profiler.prepare(lake), 6)))
    val out = Profiler.evaluateEndToEnd(ranked, pred, gold, ks = Seq(1, 35))
    val got = metricMap(out)
    // the cascade reproduces gold exactly (ProfilerSpec), so the
    // composed runner must read perfect extraction + OpenIE scores
    assert(got(("extraction", "all", "avg_f1")) == 1.0)
    assert(got(("extraction", "all", "med_f1")) == 1.0)
    assert(got(("openie", "all", "f1")) == 1.0)
    assert(got(("openie", "head", "f1")) == 1.0)
    // schema id discovers every gold attribute somewhere in the
    // ranked candidate list (ProfilerSpec's subset assertion)
    assert(got(("schema_id", "k=35", "recall")) == 1.0)
    // one relation, deterministic order, sink-round-trippable
    assert(out.columns.toSeq == Seq("stage", "slice", "metric", "value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-eval-sink").toString
    val viaSink = graft.lake.Sinks.readOrCompute(spark, s"$tmp/metrics.parquet")(out)
    assert(metricMap(viaSink.orderBy("stage", "slice", "metric")) == got)
  }

  test("html golden lake: the composed runner scores the SWDE-shaped run") {
    val htmlLakeDir = new java.io.File("src/test/resources/goldlake_html").getAbsolutePath
    val htmlAttrs   = Seq("title", "applicant", "device name", "decision date")
    val htmlLake = Tables
      .rawLake(spark, htmlLakeDir + "/*.html")
      .withColumn("path", regexp_extract(col("path"), "([^/]+)$", 1))
    val htmlProfiler = new Profiler(spark, MockLlmClient(), ProfilerConfig(chunkSize = 64, trainSize = 6))
    val view   = htmlProfiler.run(htmlLake, htmlAttrs)
    val pred   = meltView(view, htmlAttrs)
    val gold   = goldTriples(htmlLakeDir)
    val ranked = htmlProfiler.rerankSchema(htmlProfiler.identifySchema(
      htmlProfiler.sampleDocs(htmlProfiler.prepare(htmlLake), 6)))
    val got = metricMap(Profiler.evaluateEndToEnd(ranked, pred, gold, ks = Seq(1, 35)))
    assert(got(("extraction", "all", "avg_f1")) == 1.0)
    assert(got(("openie", "all", "f1")) == 1.0)
    assert(got(("schema_id", "k=35", "recall")) == 1.0)
  }
}
