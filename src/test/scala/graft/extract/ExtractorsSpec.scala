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

  test("OpaqueEval salvages a regex from an unparsable python-ish body") {
    OpaqueEval.resetCounters()
    val body =
      """def get_number_field(text):
        |    import re
        |    matches = re.findall(r'(K\d{6})', text)
        |    return matches[0] if matches else ''""".stripMargin
    val s = OpaqueEval("op1", body)
    assert(runSpec(s, "id K151917 and K209999", "no ids here") ==
      Seq(Seq("K151917", "K209999"), Seq()))
    assert(OpaqueEval.errorCount(body) == 0)
  }

  test("OpaqueEval salvages a split-marker chain") {
    val body = "return text.split('Applicant: ')[1].split('|')[0]"
    val s    = OpaqueEval("op2", body)
    assert(runSpec(s, "Applicant: Acme Corp|Date: x", "none") == Seq(Seq("Acme Corp"), Seq()))
  }

  test("OpaqueEval abstains on unrecognizable bodies without errors") {
    OpaqueEval.resetCounters()
    val body = "some prose the llm emitted instead of code"
    val s    = OpaqueEval("op3", body)
    assert(runSpec(s, "any text") == Seq(Seq()))
    assert(OpaqueEval.errorCount(body) == 0)
  }

  test("OpaqueEval timeout kill switch: catastrophic regex dies at the bound, later rows short-circuit") {
    OpaqueEval.resetCounters()
    // exponential backtracker on a long non-matching subject; the
    // backreference disables the JDK 9+ loop-memoization that tames
    // the textbook (a+)+$ shape
    val body    = """re.search(r'(a+)+\1y', text)"""
    val subject = "a" * 40 + "b"
    val t0 = System.nanoTime()
    assert(OpaqueEval.eval("op4", body, subject, 300, 2) == Seq.empty)
    assert(OpaqueEval.eval("op4", body, subject, 300, 2) == Seq.empty)
    assert(OpaqueEval.timeoutCount(body) == 2)
    // kill switch: third call returns instantly without evaluating
    val t1 = System.nanoTime()
    assert(OpaqueEval.eval("op4", body, subject, 300, 2) == Seq.empty)
    val killMs = (System.nanoTime() - t1) / 1e6
    assert(killMs < 100, s"kill switch should short-circuit, took $killMs ms")
    assert(OpaqueEval.timeoutCount(body) == 2)
    // the switch keys on the BODY: a different spec key sharing the
    // broken body is also short-circuited, but a healthy body under
    // the same RENAMED key (the profiler names every attribute's
    // specs function_0..n) keeps extracting
    assert(OpaqueEval.eval("other_key", body, subject, 300, 2) == Seq.empty)
    val healthy = """re.findall(r'(b)', text)"""
    assert(OpaqueEval.eval("op4", healthy, subject, 300, 2) == Seq("b"))
    assert((System.nanoTime() - t0) / 1e6 < 5000)
  }

  test("OpaqueEval accumulators report cluster-true error/timeout totals from the driver") {
    OpaqueEval.installAccumulators(spark.sparkContext)
    OpaqueEval.resetCounters() // also zeroes the accumulators
    assert(OpaqueEval.accumulatedErrors == 0 && OpaqueEval.accumulatedTimeouts == 0)
    // a backtracking body that times out on every row: compiled AFTER
    // install, so the UDF closure captures the accumulators and the
    // executor-side increments merge back with task results (the
    // local[4] session exercises the same serialize-merge path a
    // cluster uses)
    val bad  = """re.search(r'(a+)+\1y', text)"""
    val spec = OpaqueEval("acc1", bad, timeoutMs = 300, maxTimeouts = 2)
    val subject = "a" * 40 + "b"
    // one partition → rows evaluate serially, so the kill-switch count
    // is deterministic (4 concurrent partitions could each start an
    // eval before any counter reaches the switch)
    // collect, not count: count() lets Catalyst prune the
    // deterministic UDF column and nothing would evaluate
    val out = Seq(subject, subject, subject, subject)
      .toDF("t")
      .repartition(1)
      .select(spec.compile(col("t")).as("v"))
      .collect()
    assert(out.length == 4)
    // 4 rows, kill switch at 2: exactly 2 timed evaluations ran
    assert(OpaqueEval.accumulatedTimeouts == 2, s"got ${OpaqueEval.accumulatedTimeouts}")
    assert(OpaqueEval.accumulatedErrors == 0)
    // per-run reset clears them (the ADVICE leak: without this a body
    // that tripped the switch abstains for the JVM's lifetime)
    OpaqueEval.resetCounters()
    assert(OpaqueEval.accumulatedTimeouts == 0 && OpaqueEval.timeoutCount(bad) == 0)
  }

  test("opaque spec JSON round-trips through the catalog, non-default knobs included") {
    val s = OpaqueEval("op5", "re.findall(r'x(\\d+)', text)", timeoutMs = 500, maxTimeouts = 5)
    assert(ExtractorSpec.fromJson(ExtractorSpec.toJson(s)) == s)
  }

  test("CallableExtract: the QA-model hook slots a callable into the spec pipeline") {
    // mock span scorer: "answers" the attribute by scoring candidate
    // spans (here: tokens containing digits score 1) — the
    // configs.py:136-141 / profiler.py:293-296 branch
    val qa: String => Seq[String] =
      text => text.split("\\s+").toSeq.filter(_.exists(_.isDigit)).take(1)
    val s = CallableExtract("qa1", qa)
    assert(runSpec(s, "approved on 1999 by fda", "no digits") == Seq(Seq("1999"), Seq()))
    // code-defined: not serializable into the JSON catalog, like the
    // reference's callable branch
    intercept[IllegalArgumentException](ExtractorSpec.toJson(s))
  }

  test("Encode.embed works on a STREAMING frame (embedding on ingest)") {
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)(org.apache.spark.sql.Encoders.product[(Long, String)])
    val lake = in.toDF().toDF("doc_id", "text")
    val out  = Encode.embed(lake, "text", MockEncoderClient(dim = 8))
    in.addData((1L, "alpha beta"), (2L, "gamma delta"))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    val q = out.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        collected ++= batch.collect().map(r => (r.getAs[Long]("doc_id"), r.getSeq[Float](2)))
        ()
      }
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("embckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    assert(collected.size == 2)
    assert(collected.forall(_._2.length == 8))
    // deterministic: identical text embeds identically batch or stream
    val batchVec = Encode.embed(Seq((1L, "alpha beta")).toDF("doc_id", "text"), "text", MockEncoderClient(dim = 8))
      .head.getSeq[Float](2)
    assert(collected.find(_._1 == 1L).get._2 == batchVec)
  }

  test("DirectExtract runs INSIDE a streaming plan (extraction on ingest)") {
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)(org.apache.spark.sql.Encoders.product[(Long, String, String)])
    val chunks = in.toDF().toDF("doc_id", "attribute", "chunk")
    val out    = DirectExtract(chunks, MockLlmClient(), "doc_id")
    in.addData((1L, "budget", "budget: $5M"), (2L, "budget", "nothing here"))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = out.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        collected ++= batch.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("value")))
        ()
      }
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("dxckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    assert(collected.sortBy(_._1) == Seq((1L, "$5M"), (2L, "")))
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
