package graft.streaming

import graft.SparkSpec
import graft.extract.MockLlmClient
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingExtractSpec extends SparkSpec {
  import spark.implicits._

  test("structuredViewStream combines votes per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val lake = in.toDF().toDF("doc_id", "text")

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    // chunkSize 12 keeps each "key: value" line its own chunk (the
    // greedy repack space-joins pieces, erasing line anchors otherwise)
    val writer = StreamingExtract.structuredViewStream(
      lake, Seq("budget"), "doc_id", "text", 12, MockLlmClient()) { (voted, _) =>
      collected ++= voted.select("doc_id", "attribute", "value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    }

    // data must be present BEFORE start(): AvailableNow snapshots the
    // available offsets at query start, so later addData may fall
    // outside the run (this was a timing-dependent flake)
    in.addData((1L, "title: x\nbudget: $5M"), (2L, "budget: $9M\nother: y"))
    val q = writer
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    assert(collected.sortBy(_._1) == Seq((1L, "budget", "$5M"), (2L, "budget", "$9M")))
  }

  test("rawLakeStream tails a landing directory incrementally") {
    val dir  = java.nio.file.Files.createTempDirectory("graft_landing")
    def drop(name: String, body: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(name), body)
    drop("a.txt", "doc a body")
    drop("b.txt", "doc b body")
    val q = graft.lake.Tables.rawLakeStream(spark, dir.toString)
      .writeStream.outputMode("append").format("memory").queryName("lake_tail")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table("lake_tail").count() == 2)
    // a file dropped AFTER start surfaces on the next trigger
    drop("c.txt", "doc c body")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("lake_tail").collect()
      .map(r => (r.getString(0).split("/").last, r.getString(1))).toSet
    assert(got == Set(
      ("a.txt", "doc a body"), ("b.txt", "doc b body"), ("c.txt", "doc c body")))
  }

  test("dedupStream drops duplicate content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamingExtract.dedupStream(
      in.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
    val q = deduped.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:01:00")
    in.addData((t, "same doc"), (t, "same doc"), (t, "other doc"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("annServeStream: streamed queries answered from a static PQ index match the batch path") {
    implicit val sqlCtx = spark.sqlContext
    import graft.textops.Similarity
    // planted corpus: two direction clusters in 4-d
    val vecs = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0.05f, 0f, 0f) else Seq(0f, 0.05f, 1f, 0f)
      (i, base.updated(3, (i % 5).toFloat / 100f))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val books  = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 1, dim = 4)
    val codes  = Similarity.pqEncode(corpus, "vec_id", "embedding", books, m = 2, codeK = 4, dim = 4).cache()

    val in  = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val writer = StreamingExtract.annServeStream(
      in.toDF().toDF("qid", "qvec"), codes, corpus, "vec_id", "embedding",
      books, k = 3, m = 2, codeK = 4, rerank = 10, dim = 4) { (res, _) =>
      got ++= res.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }
    val q0 = vecs(0)._2.map(_.toDouble)
    val q1 = vecs(1)._2.map(_.toDouble)
    in.addData((100L, q0), (101L, q1))
    val q = writer
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("annserve").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // every query's own vector ranks first, and the streamed answers
    // equal the direct batch operator row-for-row
    val byQid = got.groupBy(_._1)
    assert(byQid(100L).find(_._3 == 1).get._2 == 0L)
    assert(byQid(101L).find(_._3 == 1).get._2 == 1L)
    val batch0 = Similarity
      .pqTopKFromCodes(codes, corpus, "vec_id", "embedding", q0, books, k = 3, m = 2, codeK = 4, rerank = 10, dim = 4)
      .collect().map(r => (100L, r.getLong(0), r.getInt(2))).toSet
    assert(byQid(100L).toSet == batch0)
  }

  test("annServeStream: a qid arriving with two different vectors in one trigger is served once; stream survives") {
    implicit val sqlCtx = spark.sqlContext
    import graft.textops.Similarity
    val vecs = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0.05f, 0f, 0f) else Seq(0f, 0.05f, 1f, 0f)
      (i, base.updated(3, (i % 5).toFloat / 100f))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val books  = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 1, dim = 4)
    val codes  = Similarity.pqEncode(corpus, "vec_id", "embedding", books, m = 2, codeK = 4, dim = 4).cache()
    val in  = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val writer = StreamingExtract.annServeStream(
      in.toDF().toDF("qid", "qvec"), codes, corpus, "vec_id", "embedding",
      books, k = 3, m = 2, codeK = 4, rerank = 10, dim = 4) { (res, _) =>
      got ++= res.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }
    val q0 = vecs(0)._2.map(_.toDouble)
    val q1 = vecs(1)._2.map(_.toDouble)
    // qid 100: exact at-least-once replay (same vector twice); qid
    // 101: two DIFFERENT vectors under one key — the r16 (qid, vec)
    // distinct passed both through to pqTopKFromCodesBatch's
    // unique-qid require, which threw inside foreachBatch and killed
    // the whole stream (r16 ADVICE)
    in.addData((100L, q0), (100L, q0), (101L, q1), (101L, q0))
    val q = writer
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("annserve-dup").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val byQid = got.groupBy(_._1)
    assert(byQid.keySet == Set(100L, 101L), s"stream must survive and answer both qids: $got")
    assert(byQid(100L).map(_._3).sorted == Seq(1, 2, 3), "replayed qid answers exactly k rows")
    assert(byQid(101L).map(_._3).sorted == Seq(1, 2, 3), "colliding qid answers exactly k rows")
    // the served answers equal the batch path for exactly one of the
    // two colliding vectors (the first in the micro-batch)
    def batchFor(v: Seq[Double]) = Similarity
      .pqTopKFromCodes(codes, corpus, "vec_id", "embedding", v, books,
        k = 3, m = 2, codeK = 4, rerank = 10, dim = 4)
      .collect().map(r => (101L, r.getLong(0), r.getInt(2))).toSet
    val served = byQid(101L).toSet
    assert(served == batchFor(q1) || served == batchFor(q0),
      s"served rows must match one colliding vector's batch answer: $served")
  }

  test("keepRateStream: per-window rule-bank keep rate on an event-time stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val mon = StreamingExtract.keepRateStream(
      in.toDF().toDF("ts", "text"), "ts", "text",
      windowDur = "10 minutes", watermark = "0 seconds",
      minTokens = 5, maxTokens = 100, minMeanLen = 1.0, maxMeanLen = 10.0)
    val q = mon.writeStream.outputMode("append").format("memory").queryName("keep_rate").start()
    val w1 = java.sql.Timestamp.valueOf("2026-01-01 00:01:00")
    val w2 = java.sql.Timestamp.valueOf("2026-01-01 00:11:00")
    in.addData(
      (w1, "one two three four five six"), // keep
      (w1, "too short"),                   // drop (2 < 5 tokens)
      (w2, "alpha beta gamma delta epsilon zeta"))
    q.processAllAvailable()
    // advance the watermark past both windows so append mode emits
    in.addData((java.sql.Timestamp.valueOf("2026-01-01 01:00:00"), "flush flush flush flush flush"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("keep_rate").collect()
      .map(r => r.getStruct(0).getTimestamp(0).toString -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("2026-01-01 00:00:00.0") == ((2L, 1L, 0.5)), got.toString)
    assert(got("2026-01-01 00:10:00.0") == ((1L, 1L, 1.0)), got.toString)
  }

  test("historyGateStream drops arrivals near-duplicating the persisted index") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_histidx").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS histdb LOCATION '$dir'")
    try {
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "an entirely separate historical document about engines")).toDF("doc_id", "text")
      graft.lake.Sinks.writeBucketed(
        graft.textops.Dedup.bandIndex(corpus, "doc_id", "text"),
        "histdb.hist_index", "band_key", nBuckets = 2)

      val in = MemoryStream[(Long, String)]
      val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val writer = StreamingExtract.historyGateStream(
        in.toDF().toDF("doc_id", "text"), "histdb.hist_index", "doc_id", "text") {
        (fresh, _) => kept ++= fresh.select("doc_id").collect().map(_.getLong(0))
      }
      in.addData(
        (10L, "the quick brown fox jumps over the lazy dog again and again"), // year-old dup
        (11L, "genuinely new content never seen in the corpus before now"))
      val q = writer
        .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
      assert(kept.sorted.toSeq == Seq(11L), s"gate kept $kept")
    } finally spark.sql("DROP DATABASE IF EXISTS histdb CASCADE")
  }

  test("structuredViewStream restarts from its checkpoint: no doc lost, none duplicated") {
    // the exactly-once claim every foreachBatch sink implicitly makes
    // (VERDICT r8 #5), proven over a file-source lake: run → stop →
    // drop more files → RESTART from the same checkpoint dir. The
    // restarted query must pick up exactly the unprocessed files —
    // a committed batch must not replay into the sink, a pending file
    // must not be skipped.
    val landing = java.nio.file.Files.createTempDirectory("graft_ckpt_landing")
    val ckpt    = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def drop(name: String, body: String): Unit =
      java.nio.file.Files.writeString(landing.resolve(name), body)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def run(): Unit = {
      val writer = StreamingExtract.structuredViewStream(
        graft.lake.Tables.rawLakeStream(spark, landing.toString),
        Seq("budget"), "path", "content", 12, MockLlmClient()) { (voted, batchId) =>
        seen ++= voted.select("path", "value").collect()
          .map(r => (r.getString(0).split("/").last, r.getString(1), batchId))
      }
      val q = writer
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable()
      q.stop()
    }
    drop("a.txt", "budget: $1M\nbody a")
    drop("b.txt", "budget: $2M\nbody b")
    run() // first incarnation processes a, b and commits the batch
    assert(seen.map(_._1).sorted == Seq("a.txt", "b.txt"), s"first run saw $seen")
    drop("c.txt", "budget: $3M\nbody c")
    drop("d.txt", "budget: $4M\nbody d")
    run() // killed-and-restarted incarnation resumes from the checkpoint
    val byDoc = seen.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byDoc.keySet == Set("a.txt", "b.txt", "c.txt", "d.txt"),
      s"lost docs across restart: ${Set("a.txt", "b.txt", "c.txt", "d.txt") -- byDoc.keySet}")
    assert(byDoc.values.forall(_ == 1),
      s"docs duplicated across restart (committed batch replayed): ${byDoc.filter(_._2 > 1)}")
    val values = seen.map(t => t._1 -> t._2).toMap
    assert(values == Map("a.txt" -> "$1M", "b.txt" -> "$2M", "c.txt" -> "$3M", "d.txt" -> "$4M"), s"$values")
  }

  test("historyGateStream restarts from its checkpoint: gate verdicts survive, nothing replays") {
    val dir = java.nio.file.Files.createTempDirectory("graft_histidx2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS histdb2 LOCATION '$dir'")
    try {
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "an entirely separate historical document about engines")).toDF("doc_id", "text")
      graft.lake.Sinks.writeBucketed(
        graft.textops.Dedup.bandIndex(corpus, "doc_id", "text"),
        "histdb2.hist_index", "band_key", nBuckets = 2)
      val landing = java.nio.file.Files.createTempDirectory("graft_gate_landing")
      val ckpt    = java.nio.file.Files.createTempDirectory("graft_gate_ckpt").toString
      def drop(name: String, body: String): Unit =
        java.nio.file.Files.writeString(landing.resolve(name), body)
      val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
      def run(): Unit = {
        val writer = StreamingExtract.historyGateStream(
          graft.lake.Tables.rawLakeStream(spark, landing.toString)
            .select(
              // numeric filenames → the index's long id domain
              regexp_extract(col("path"), "(\\d+)\\.txt$", 1).cast("long").as("doc_id"),
              col("content").as("text")),
          "histdb2.hist_index", "doc_id", "text") { (fresh, _) =>
          kept ++= fresh.select("doc_id").collect().map(_.getLong(0))
        }
        val q = writer
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.processAllAvailable()
        q.stop()
      }
      drop("10.txt", "the quick brown fox jumps over the lazy dog again and again") // year-old dup
      drop("11.txt", "genuinely new content never seen in the corpus before now")
      run()
      assert(kept.sorted.toSeq == Seq(11L), s"first run kept $kept")
      drop("12.txt", "another batch of fresh material arriving after the restart")
      run() // restart: must process ONLY 12, and not re-emit 11
      assert(kept.sorted.toSeq == Seq(11L, 12L),
        s"across restart the gate kept $kept (duplicate = replayed batch, missing = lost file)")
    } finally spark.sql("DROP DATABASE IF EXISTS histdb2 CASCADE")
  }

  test("pqEncodeStream: codes appended per trigger equal the batch encode; serving sees arrivals") {
    implicit val sqlCtx = spark.sqlContext
    import graft.textops.Similarity
    val emb = graft.lake.Tables.embeddings(spark, sf0001)
    // frozen codebooks fit offline on the corpus sample
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    // the first 24 corpus vectors "arrive" over two triggers
    val arrivals = emb.filter(col("vec_id") < 24)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val in = MemoryStream[(Long, Seq[Float])]
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int])]
    val writer = StreamingExtract.pqEncodeStream(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", books) { (codes, _) =>
      acc ++= codes.collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
    }
    in.addData(arrivals.take(12).toSeq: _*)
    val q = writer
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable()
    assert(acc.size == 12, s"first trigger encoded ${acc.size}")
    in.addData(arrivals.drop(12).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    // incremental codes == one-shot batch encode, row for row
    val batch = Similarity.pqEncode(emb.filter(col("vec_id") < 24), "vec_id", "embedding", books, m = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toMap
    assert(acc.size == 24 && acc.toMap == batch,
      s"incremental codes diverge from batch encode: ${acc.toMap.toSet.diff(batch.toSet).take(3)}")
    // serving from the accumulated codes answers a query over arrivals
    import spark.implicits._
    val codesDf = acc.toSeq.toDF("vec_id", "pq_codes")
    val q0 = emb.filter(col("vec_id") === 0).collect()(0)
      .getSeq[Float](1).map(_.toDouble).toSeq
    val served = Similarity.pqTopKFromCodes(
      codesDf, emb, "vec_id", "embedding", q0, books, k = 5, m = 8, codeK = 16, rerank = 24)
    assert(served.filter(col("rank") === 1).head().getLong(0) == 0L, "query vector must find itself")
  }

  test("attributionStream joins conversions to in-window impressions with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val imp  = MemoryStream[(String, Long, java.sql.Timestamp)]
    val conv = MemoryStream[(String, Long, java.sql.Timestamp)]
    val joined = StreamingExtract.attributionStream(
      imp.toDF().toDF("user", "id", "ts"),
      conv.toDF().toDF("user", "id", "ts"),
      "user", windowSeconds = 60)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    imp.addData(
      ("alice", 1L, t("2026-01-01 00:00:10")),
      ("alice", 2L, t("2026-01-01 00:02:00")), // outside window of conv 100
      ("bob",   3L, t("2026-01-01 00:00:20")))
    conv.addData(
      ("alice", 100L, t("2026-01-01 00:00:50")), // 40s after imp 1 → attributed
      ("carol", 101L, t("2026-01-01 00:00:30"))) // no impression → dropped
    q.processAllAvailable()
    // advance both watermarks so the join horizon closes
    imp.addData(("zz", 9L, t("2026-01-01 00:10:00")))
    conv.addData(("zz", 99L, t("2026-01-01 00:10:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out")
      .select("user", "conv_id", "imp_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // zz's self-pair (conv at +0s of its own impression) is also in-window
    assert(got == Set(("alice", 100L, 1L), ("zz", 99L, 9L)), s"got $got")
  }

  test("attributionStream keepUnattributed emits null-matched conversions after the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val imp  = MemoryStream[(String, Long, java.sql.Timestamp)]
    val conv = MemoryStream[(String, Long, java.sql.Timestamp)]
    val joined = StreamingExtract.attributionStream(
      imp.toDF().toDF("user", "id", "ts"),
      conv.toDF().toDF("user", "id", "ts"),
      "user", windowSeconds = 60, keepUnattributed = true)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    imp.addData(("alice", 1L, t("2026-01-01 00:00:10")))
    conv.addData(
      ("alice", 100L, t("2026-01-01 00:00:50")),
      ("carol", 101L, t("2026-01-01 00:00:30"))) // never attributable
    q.processAllAvailable()
    imp.addData(("zz", 9L, t("2026-01-01 00:20:00")))
    conv.addData(("zz", 99L, t("2026-01-01 00:20:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_outer_out")
      .select("user", "conv_id", "imp_id").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got.contains(("alice", 100L, 1L)) && got.contains(("carol", 101L, -1L)), s"got $got")
  }

  test("nearDupStream drops exact near-dup arrivals, keeps distinct docs") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val survivors = StreamingExtract.nearDupStream(
      in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text", watermark = "0 seconds")
    val q = survivors.writeStream.outputMode("append").format("memory").queryName("neardup_out").start()
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
    in.addData(
      (t1, 1L, "the quick brown fox jumps over the lazy dog"),
      (t1, 2L, "the quick brown fox jumps over the lazy dog"), // exact dup: every band collides
      (t1, 3L, "completely different content about spark engines"))
    q.processAllAvailable()
    // advance the watermark past the first window so the regroup emits
    in.addData((java.sql.Timestamp.valueOf("2026-01-01 00:05:00"), 9L, "late watermark pusher"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_out").collect().map(_.getLong(0)).toSet
    // which of the two identical docs wins the intra-batch race is
    // partition-layout dependent; the contract is: exactly one of
    // them survives, plus the distinct doc
    assert(got.contains(3L) && (got - 3L).size == 1 && (got - 3L).subsetOf(Set(1L, 2L)),
      s"expected one of the identical docs dropped, got $got")
  }

  test("runningMajority accumulates votes ACROSS triggers with custom state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, String)]
    val maj = StreamingExtract.runningMajority(
      in.toDF().toDF("path", "attribute", "value"), "path", "attribute", "value")
    val q = maj.writeStream.outputMode("update").format("memory").queryName("maj_out").start()
    // trigger 1: d1/budget sees $5M twice, $9M once
    in.addData(("d1", "budget", "$5M"), ("d1", "budget", "$9M"), ("d1", "budget", "$5M"))
    q.processAllAvailable()
    val after1 = spark.table("maj_out").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(after1 == Seq(("d1", "$5M", 2L, 3L)))
    // trigger 2: two LATE $9M votes arrive — the cross-trigger tally
    // flips the majority (foreachBatch recombination could not)
    in.addData(("d1", "budget", "$9M"), ("d1", "budget", "$9M"))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.table("maj_out").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(after2.last == ("d1", "$9M", 3L, 5L), s"got $after2")
  }

  test("runningMajority ties break to the lexicographically smallest value (batch mode)") {
    val votes = Seq(("d1", "a", "x"), ("d1", "a", "y"), ("d2", "a", "z"))
      .toDF("path", "attribute", "value")
    val got = StreamingExtract.runningMajority(votes, "path", "attribute", "value")
      .collect().map(s => (s.path, s.value, s.n_votes, s.n_total)).sortBy(_._1).toSeq
    assert(got == Seq(("d1", "x", 1L, 2L), ("d2", "z", 1L, 1L)))
  }

  test("windowedEventCounts is a valid streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingExtract.windowedEventCounts(
      in.toDF().toDF("ts", "event_type", "value"), "ts", "10 minutes", "5 minutes", "1 minute")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    in.addData(
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:02:00"), "click", 2.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("win_out").filter(col("event_type") === "click")
    assert(got.agg(max("n")).head.getLong(0) == 2L)
  }

  test("driftMonitorStream: running per-window JSD vs a fixed reference, off-vocab dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in  = MemoryStream[(java.sql.Timestamp, String)]
    val ref = Map("a" -> 0.5, "b" -> 0.5)
    val mon = StreamingExtract.driftMonitorStream(
      in.toDF().toDF("ts", "text"), "ts", "text", ref, windowMs = 60000L)
    val q = mon.writeStream.outputMode("update").format("memory").queryName("drift_out").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
    // trigger 1: the window's mix matches the reference exactly —
    // JSD is exactly 0; the off-vocab token must not count
    in.addData((t0, "a b a b zzz"), (t0, "b a"))
    q.processAllAvailable()
    val s1 = spark.table("drift_out").collect().map(r => (r.getLong(1), r.getDouble(2))).last
    assert(s1 == ((6L, 0.0)), s"matching window should read zero drift: $s1")
    // trigger 2, SAME window: a flood of 'a' skews the running mix —
    // the alarm can trip mid-window, before any watermark closes it
    in.addData((t0, "a a a a a a"))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("drift_out").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).last
    assert(last._1 == 12L && !last._3)
    assert(last._2 > 0.02, s"skewed window should read real drift: $last") // JSD(75/25 vs 50/50) ≈ 0.0338
    // parity with the batch drift card: the same tallies through
    // jsDivergence (g2 plays the reference empirically) agree to 6dp
    val batch = graft.textops.TextStats
      .jsDivergence(
        Seq(("g1", (Seq.fill(9)("a") ++ Seq.fill(3)("b")).mkString(" ")), ("g2", "a b"))
          .toDF("src", "text"),
        "src", "text")
      .collect().head.getDouble(2)
    assert(math.abs(last._2 - batch) < 5e-7, s"streaming ${last._2} vs batch $batch")
  }

  test("weightedSampleStream: cross-trigger reservoir equals batch sample of the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Double)]
    val res = StreamingExtract.weightedSampleStream(
      in.toDF().toDF("doc_id", "w"), "doc_id", "w", k = 3)
    val q = res.writeStream.outputMode("append").format("memory").queryName("res_out").start()
    val batch1 = (1L to 5L).map(i => (i, 1.0))
    in.addData(batch1: _*)
    q.processAllAvailable()
    val snap1 = spark.table("res_out").collect()
    assert(snap1.length == 3, "trigger-1 snapshot is the current top-3")
    // trigger 2: a heavy item and a zero-weight item arrive — the
    // heavy one must displace a trigger-1 member, the zero drop
    in.addData((21L, 1e9), (22L, 0.0))
    q.processAllAvailable()
    q.stop()
    val all    = spark.table("res_out").collect()
    val snap2  = all.drop(snap1.length).map(r => r.getLong(1)).toSeq
    val batchIds = graft.textops.Sampling
      .weightedSample((batch1 :+ ((21L, 1e9)) :+ ((22L, 0.0))).toDF("doc_id", "w"), "doc_id", "w", k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(snap2 == batchIds, s"streaming $snap2 vs batch $batchIds")
    assert(snap2.head == 21L, "heavy item leads the reservoir")
  }

  test("classQuotaStream: cross-trigger per-class cap equals the batch cap on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, Long)]
    val res = StreamingExtract.classQuotaStream(
      in.toDF().toDF("lang", "doc_id"), "lang", "doc_id", k = 2)
    val q = res.writeStream.outputMode("append").format("memory").queryName("quota_out").start()
    val t1 = Seq(("en", 1L), ("en", 2L), ("en", 3L), ("fr", 10L))
    in.addData(t1: _*)
    q.processAllAvailable()
    val snap1 = spark.table("quota_out").collect()
    assert(snap1.count(_.getString(0) == "en") == 2 && snap1.count(_.getString(0) == "fr") == 1)
    // trigger 2: more ids — whichever carry smaller md5 keys must
    // DISPLACE trigger-1 members (a per-batch window cannot do this)
    val t2 = Seq(("en", 4L), ("en", 5L), ("fr", 11L), ("fr", 12L))
    in.addData(t2: _*)
    q.processAllAvailable()
    q.stop()
    // the documented consumer pattern: per class, keep only the rows
    // carrying that class's max epoch — the append-only sink holds
    // BOTH triggers' snapshots and the marker is what tells them apart
    val all      = spark.table("quota_out").collect()
    val maxEpoch = all.groupBy(_.getString(0)).map { case (c, rs) => c -> rs.map(_.getLong(4)).max }
    assert(maxEpoch.values.toSet == Set(2L), "both classes saw two triggers")
    val snap2 = all.filter(r => r.getLong(4) == maxEpoch(r.getString(0)))
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // batch reference: per class, the 2 smallest md5(id) keys of the UNION
    val batch = (t1 ++ t2).toDF("lang", "doc_id")
      .select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("mkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).toSeq.flatMap { case (cls, xs) =>
        xs.sortBy(x => (x._3, x._2)).take(2).zipWithIndex
          .map { case (x, i) => (cls, i + 1) -> x._2 }.toSeq
      }.toMap
    assert(snap2 == batch, s"streaming $snap2 vs batch $batch")
  }

  test("calibrationStream: latest-epoch snapshot ECE equals the batch card on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Double, Boolean)]
    val res = StreamingExtract.calibrationStream(
      in.toDF().toDF("conf", "label"), "conf", "label", nBins = 10)
    val q = res.writeStream.outputMode("append").format("memory").queryName("calib_out").start()
    in.addData((0.05, false), (0.95, true))
    q.processAllAvailable()
    in.addData((0.95, false)) // bin 9 drifts: acc 1.0 -> 0.5
    q.processAllAvailable()
    q.stop()
    // consumer protocol: per bin, keep the max-epoch row
    val all  = spark.table("calib_out").collect()
    val snap = all.groupBy(_.getInt(0)).map { case (_, rs) => rs.maxBy(_.getLong(5)) }.toSeq
    assert(snap.map(r => (r.getInt(0), r.getLong(1))).toSet == Set((0, 1L), (9, 2L)))
    val eceStream = snap.map(r => r.getDouble(4) * r.getLong(1)).sum / snap.map(_.getLong(1)).sum
    // batch reference on the union (hand value 0.316667, also asserted
    // in ParetoMixEceSpec on the identical fixture)
    val batch = graft.score.Score.calibrationEce(
      Seq((0.05, false), (0.95, true), (0.95, false)).toDF("conf", "label"),
      "conf", "label", nBins = 10).collect()(0).getDouble(0)
    assert(math.rint(eceStream * 1e6) / 1e6 == batch, s"stream $eceStream vs batch $batch")
    // drift visibility: bin 9's gap grew across epochs
    val b9 = all.filter(_.getInt(0) == 9).sortBy(_.getLong(5)).map(_.getDouble(4)).toSeq
    assert(b9 == Seq(0.05, 0.45), "gap 0.05 (epoch 1) -> 0.45 (epoch 2)")
  }

  test("aucStream: latest-epoch snapshot AUC equals the batch rocAuc card on the union (6dp)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Double, Boolean)]
    val res = StreamingExtract.aucStream(in.toDF().toDF("score", "label"), "score", "label")
    val q = res.writeStream.outputMode("append").format("memory").queryName("auc_out").start()
    // trigger 1: clean separation; trigger 2 adds a TIE on 0.7 (a
    // negative at an existing positive score) and a low positive —
    // the cross-trigger merge must land on the tie-averaged batch AUC
    val t1 = Seq((0.9, true), (0.7, true), (0.3, false), (0.1, false))
    val t2 = Seq((0.7, false), (0.2, true), (0.05, false))
    in.addData(t1: _*)
    q.processAllAvailable()
    val all1 = spark.table("auc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val snap1 = all1.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._4) }
      .map(r => (r._1, r._2, r._3)).toSeq
    val batch1 = graft.score.Score.rocAuc(t1.toDF("score", "label"), "score", "label")
      .collect()(0).getDouble(2)
    assert(StreamingExtract.aucOfSnapshot(snap1) == batch1, "epoch-1 parity")
    in.addData(t2: _*)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("auc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // consumer protocol: per score, keep the max-epoch row
    val snap = all.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._4) }
      .map(r => (r._1, r._2, r._3)).toSeq
    val batch = graft.score.Score.rocAuc((t1 ++ t2).toDF("score", "label"), "score", "label")
      .collect()(0)
    assert(StreamingExtract.aucOfSnapshot(snap) == batch.getDouble(2),
      s"stream ${StreamingExtract.aucOfSnapshot(snap)} vs batch ${batch.getDouble(2)}")
    // the tie contributed 0.5: hand value on the union
    // pos {0.9,0.7,0.2}, neg {0.3,0.1,0.7,0.05}: 0.9 wins 4, 0.7 wins
    // 3 + ties 0.5, 0.2 wins 2 -> 9.5 of 12 pairs
    assert(batch.getDouble(2) == 0.791667)
    // counts at score 0.7 accumulated across triggers (1 pos + 1 neg)
    val s07 = snap.find(_._1 == 700000L).get
    assert((s07._2, s07._3) == ((1L, 1L)))
    // drift visibility: AUC degraded when the tie and stragglers arrived
    assert(StreamingExtract.aucOfSnapshot(snap) < StreamingExtract.aucOfSnapshot(snap1))
  }

  test("valueHistogramStream: latest-epoch snapshot quantiles equal the batch card on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in  = MemoryStream[(String, Long)]
    val res = StreamingExtract.valueHistogramStream(in.toDF().toDF("g", "v"), "g", "v")
    val q = res.writeStream.outputMode("append").format("memory").queryName("hist_out").start()
    val probs = Seq(0.5, 0.9)
    val t1 = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("b", 5L))
    val t2 = Seq(("a", 1L), ("a", 40L), ("b", 7L), ("b", 7L))
    in.addData(t1: _*); q.processAllAvailable()
    in.addData(t2: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("hist_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // consumer protocol: per (g, v) keep the max-epoch row
    val snap = all.groupBy(r => (r._1, r._2)).map { case (_, rs) => rs.maxBy(_._4) }
      .map(r => (r._1, r._2, r._3)).toSeq
    val got = StreamingExtract.quantilesOfSnapshot(snap, probs)
    val batch = graft.relops.Stats
      .histogramQuantiles((t1 ++ t2).toDF("g", "v"), "g", "v", probs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got.sortBy(r => (r._1, r._2)) == batch, s"$got vs $batch")
  }

  test("valueHistogramStream refuses fractional value columns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, Double)]
    intercept[IllegalArgumentException] {
      StreamingExtract.valueHistogramStream(in.toDF().toDF("g", "v"), "g", "v")
    }
  }

  test("liftStream: tie-free latest-epoch snapshot equals the batch decileLift card") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in  = MemoryStream[(Double, Boolean)]
    val res = StreamingExtract.liftStream(in.toDF().toDF("score", "label"), "score", "label")
    val q = res.writeStream.outputMode("append").format("memory").queryName("lift_out").start()
    // 12 UNIQUE 6dp scores over 2 triggers; positives concentrated up
    // top so the lift curve is non-trivial; tie-free means the
    // histogram fold must equal the batch NTILE exactly
    val t1 = Seq((0.96, true), (0.87, true), (0.78, false), (0.69, true),
                 (0.55, false), (0.41, false))
    val t2 = Seq((0.92, true), (0.33, false), (0.28, true), (0.21, false),
                 (0.14, false), (0.07, false))
    in.addData(t1: _*); q.processAllAvailable()
    in.addData(t2: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("lift_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val snap = all.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._4) }
      .map(r => (r._1, r._2, r._3)).toSeq
    val got = StreamingExtract.liftOfSnapshot(snap, nTiles = 4)
    val batch = graft.score.Score
      .decileLift((t1 ++ t2).zipWithIndex.map { case ((s, l), i) => (s, i.toLong, l) }
        .toDF("score", "id", "label"), "score", "id", "label", nTiles = 4)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2).toDouble,
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("liftOfSnapshot: boundary-straddling tie apportions positives pro-rata") {
    // 4 rows, 2 tiles; the tied score 0.5 holds rows 2-4 (1 pos, 2
    // neg) straddling the boundary: tile 1 = [0.9(pos), 1/3 of the
    // tie], tile 2 = [2/3 of the tie]; totals must be conserved
    val snap = Seq((900000L, 1L, 0L), (500000L, 1L, 2L))
    val got = StreamingExtract.liftOfSnapshot(snap, nTiles = 2)
    assert(got.map(_._2).sum == 4L, "row total conserved")
    assert(math.abs(got.map(_._3).sum - 2.0) < 1e-9, "positive mass conserved")
    val t1 = got.find(_._1 == 1).get
    assert(t1._2 == 2L && math.abs(t1._3 - (1.0 + 1.0 / 3)) < 1e-6)
    // all-negative snapshot: lift undefined -> no rows
    assert(StreamingExtract.liftOfSnapshot(Seq((100L, 0L, 5L)), 2).isEmpty)
  }

  test("coOccurrenceStream: incremental deltas + cap retraction net to the batch emitter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in  = MemoryStream[(Long, Long)]
    val res = StreamingExtract.coOccurrenceStream(
      in.toDF().toDF("basket", "item"), "basket", "item", maxBasket = 4)
    val q = res.writeStream.outputMode("append").format("memory").queryName("co_out").start()
    // t1: basket 1 {10,20} -> one add; basket 2 {50} -> nothing yet
    // t2: basket 1 +{30} -> two cross adds; basket 2 +{60} -> one add
    // t3: basket 2 +{70,80,90} crosses cap 4 -> RETRACT (50,60), drop whole
    //     basket 1 re-sees 20 -> no delta (dedup against state)
    in.addData((1L, 10L), (1L, 20L), (2L, 50L)); q.processAllAvailable()
    in.addData((1L, 30L), (2L, 60L)); q.processAllAvailable()
    in.addData((2L, 70L), (2L, 80L), (2L, 90L), (1L, 20L)); q.processAllAvailable()
    q.stop()
    val patches = spark.table("co_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // the retraction is real: basket 2's (50,60) was added then retracted
    assert(patches.contains((2L, 50L, 60L, true)) && patches.contains((2L, 50L, 60L, false)))
    // adds are emitted exactly once per (basket, pair)
    val adds = patches.filter(_._4)
    assert(adds.length == adds.distinct.length, s"duplicate adds in ${adds.toSeq}")
    val net = StreamingExtract.edgesOfPatches(patches.toSeq)
    val all = Seq((1L, 10L), (1L, 20L), (2L, 50L), (1L, 30L), (2L, 60L),
      (2L, 70L), (2L, 80L), (2L, 90L), (1L, 20L)).toDF("basket", "item")
    val batch = graft.relops.GraphOps.coOccurrenceEdges(all, "basket", "item", maxBasket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(net == batch, s"net $net vs batch $batch")
    assert(net == Seq((10L, 20L), (10L, 30L), (20L, 30L)), "basket 2 dropped WHOLE")
    // idleTimeout wiring (r15 ADVICE: bounded-key mode): the
    // ProcessingTimeTimeout path must leave the patch semantics
    // untouched while no basket goes idle past the horizon.
    // AvailableNow + awaitTermination, NOT processAllAvailable: armed
    // processing-time timeouts keep the default trigger scheduling
    // no-data batches, so processAllAvailable never settles
    val in2 = MemoryStream[(Long, Long)]
    val res2 = StreamingExtract.coOccurrenceStream(
      in2.toDF().toDF("basket", "item"), "basket", "item",
      maxBasket = 4, idleTimeout = Some("30 minutes"))
    // one snapshot: basket 2's 6 items arrive together and cross the
    // cap on first sight (dropped WHOLE, no pairs ever emitted), so
    // the net edges still equal the batch emitter over everything
    in2.addData((1L, 10L), (1L, 20L), (2L, 50L), (1L, 30L), (2L, 60L),
      (2L, 70L), (2L, 80L), (2L, 90L), (1L, 20L))
    val q2 = res2.writeStream.outputMode("append").format("memory").queryName("co_out_t")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("coT").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000L)
    q2.stop()
    val net2 = StreamingExtract.edgesOfPatches(spark.table("co_out_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq)
    assert(net2 == net, "timeout-armed replay must net to the same edges")
  }

  test("IncrementalCensus: per-trigger snapshots equal the batch census across retractions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val res = StreamingExtract.coOccurrenceStream(
      in.toDF().toDF("basket", "item"), "basket", "item", maxBasket = 4)
    val q = res.writeStream.outputMode("append").format("memory").queryName("cen_out").start()
    val census = new IncrementalCensus
    val seen   = scala.collection.mutable.Set.empty[(Long, Long, Long, Boolean, Long)]
    def checkParity(label: String): Unit = {
      val all = spark.table("cen_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))).toSeq
      census.applyAll(all.filterNot(seen))
      seen ++= all
      val net = StreamingExtract.edgesOfPatches(all.map(t => (t._1, t._2, t._3, t._4)))
      val row = graft.relops.GraphOps.triangleStats(net.toDF("pa", "pb")).head()
      val batch =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
      assert(census.snapshot == batch, s"$label: incremental ${census.snapshot} vs batch $batch")
      // the degree-profile card off the same state, same parity bar
      val p = graft.relops.GraphOps.degreeProfile(net.toDF("pa", "pb")).head()
      def opt[T](i: Int): Option[T] = if (p.isNullAt(i)) None else Some(p.getAs[T](i))
      val batchProfile = (p.getLong(0), p.getLong(1), opt[Double](2),
        opt[Long](3), opt[Double](4), opt[Double](5))
      assert(census.profileSnapshot == batchProfile,
        s"$label: incremental ${census.profileSnapshot} vs batch profile $batchProfile")
    }
    // t1: basket 1 = {10,20,30} (a triangle); basket 2 = {10,20}
    // (edge (10,20) now supported by TWO baskets)
    in.addData((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L)); q.processAllAvailable()
    checkParity("t1")
    // t2: basket 2 grows to {10,20,40,50} — 4 new triangles appear
    in.addData((2L, 40L), (2L, 50L)); q.processAllAvailable()
    checkParity("t2")
    // t3: basket 2 crosses the cap -> retracts its 6 pairs; (10,20)
    // must SURVIVE (basket 1 still witnesses it), the rest die
    in.addData((2L, 60L)); q.processAllAvailable()
    q.stop()
    checkParity("t3 (post-retraction)")
    assert(census.snapshot._3 == 1L, "back to basket 1's single triangle")
  }

  test("IncrementalCensus: maxLiveEdges refuses loudly; support churn and retraction stay under the bound") {
    val c = new IncrementalCensus(maxLiveEdges = 2)
    c.apply(1L, 2L, add = true)
    c.apply(2L, 3L, add = true)
    // a second basket supporting an already-LIVE pair adds no edge:
    // must not trip the bound
    c.apply(1L, 2L, add = true)
    val ex = intercept[IllegalStateException] { c.apply(3L, 4L, add = true) }
    assert(ex.getMessage.contains("maxLiveEdges"), ex.getMessage)
    assert(ex.getMessage.contains("triangleStats"), "the error must name the batch census fallback")
    // the refused patch left state intact
    assert(c.snapshot._2 == 2L)
    // retraction to zero support frees capacity for a new edge
    c.apply(1L, 2L, add = false)
    c.apply(1L, 2L, add = false)
    c.apply(3L, 4L, add = true)
    assert(c.snapshot._2 == 2L)
  }

  test("aucOfSnapshot: degenerate one-class snapshots read 0.0, order of rows is irrelevant") {
    assert(StreamingExtract.aucOfSnapshot(Seq((100L, 3L, 0L))) == 0.0)
    assert(StreamingExtract.aucOfSnapshot(Nil) == 0.0)
    val pts = Seq((900000L, 1L, 0L), (300000L, 0L, 1L), (700000L, 1L, 1L))
    assert(StreamingExtract.aucOfSnapshot(pts) == StreamingExtract.aucOfSnapshot(pts.reverse))
  }

  test("skylineStream: a dominating late arrival displaces frontier members; snapshot == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Double, Double)]
    val res = StreamingExtract.skylineStream(
      in.toDF().toDF("id", "price", "size"), "id", "price", "size")
    val q = res.writeStream.outputMode("append").format("memory").queryName("sky_out").start()
    val t1 = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 5.0))
    in.addData(t1: _*)
    q.processAllAvailable()
    val snap1 = spark.table("sky_out").collect()
    assert(snap1.map(_.getLong(0)).toSet == Set(1L, 2L, 3L), "staircase: all on frontier")
    // trigger 2: (4) at price 1.5 / size 5 dominates (2) AND (3);
    // (5) ties (1) exactly -> both survive
    val t2 = Seq((4L, 1.5, 5.0), (5L, 1.0, 1.0))
    in.addData(t2: _*)
    q.processAllAvailable()
    q.stop()
    val all      = spark.table("sky_out").collect()
    val maxEpoch = all.map(_.getLong(3)).max
    val snap2    = all.filter(_.getLong(3) == maxEpoch).map(_.getLong(0)).toSet
    assert(maxEpoch == 2L)
    assert(snap2 == Set(1L, 4L, 5L), s"got $snap2")
    // batch reference on the union
    val batch = graft.relops.Stats.paretoFront2D(
      (t1 ++ t2).toDF("id", "price", "size"), "price", "size")
      .collect().map(_.getLong(0)).toSet
    assert(snap2 == batch, s"stream $snap2 vs batch $batch")
  }

  test("heavyHittersStream: a token heavy only ACROSS triggers survives in state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[String]
    val hh = StreamingExtract.heavyHittersStream(in.toDF().toDF("text"), "text", capacity = 2)
    val q = hh.writeStream.outputMode("append").format("memory").queryName("hh_out").start()
    // trigger 1: hot appears 3x among distractors; capacity 2 keeps it
    in.addData("hot a hot b hot")
    q.processAllAvailable()
    val snap1 = spark.table("hh_out").collect()
    // trigger 2: more hot + fresh distractors — residual must GROW
    // from trigger-1 state (a per-trigger summary would restart at 0)
    in.addData("hot c hot d")
    q.processAllAvailable()
    q.stop()
    val all   = spark.table("hh_out").collect()
    val snap2 = all.drop(snap1.length).map(r => (r.getString(0), r.getLong(1))).toMap
    assert(snap2.contains("hot"), s"got $snap2")
    val t1hot = snap1.map(r => (r.getString(0), r.getLong(1))).toMap.getOrElse("hot", 0L)
    assert(snap2("hot") > t1hot, s"cross-trigger residual must grow: t1=$t1hot t2=${snap2("hot")}")
  }
}
