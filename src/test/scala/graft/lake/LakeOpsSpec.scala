package graft.lake

import graft.SparkSpec
import graft.extract.AffixTrim
import graft.schema.SchemaId
import org.apache.spark.sql.functions._

class LakeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("GoldTable.load melts json with string and list values, rebases paths") {
    val gold = GoldTable.load(spark, "src/test/resources/goldlake/gold.json", rebaseTo = "/lake/dir")
    assert(gold.count() == 32) // 8 docs × 4 attrs
    val r = gold.filter(col("path") === "/lake/dir/doc1.txt" && col("attribute") === "applicant").head
    assert(r.getSeq[String](2) == Seq("Acme 1 Corp"))
    val ranked = GoldTable.rankedAttributes(gold)
    assert(ranked.count() == 4)
    assert(ranked.agg(max("n_nonnull")).head.getLong(0) == 8L)
  }

  test("Sinks.readOrCompute caches and replays") {
    val dir = java.nio.file.Files.createTempDirectory("cache").toString + "/t"
    var computes = 0
    def make = { computes += 1; Seq((1L, "a")).toDF("id", "v") }
    val first  = Sinks.readOrCompute(spark, dir)(make)
    val second = Sinks.readOrCompute(spark, dir)(make)
    assert(computes == 1)
    assert(first.count() == 1 && second.count() == 1)
  }

  test("Sinks.writeIndex writes view parquet + per-attribute json") {
    val dir  = java.nio.file.Files.createTempDirectory("idx").toString
    val view = Seq(("d1", "x", "y")).toDF("path", "attr one", "attr_two")
    Sinks.writeIndex(view, dir)
    assert(spark.read.parquet(s"$dir/structured_view").count() == 1)
    assert(spark.read.json(s"$dir/attr=attr_one").columns.toSet == Set("path", "value"))
  }

  test("dirHierarchy counts files per directory prefix") {
    val files = Seq("a/b/f1.txt", "a/b/f2.txt", "a/c/f3.txt").toDF("path")
    val got = Sinks.dirHierarchy(files).orderBy("depth", "dir").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a", 3L), (2, "a/b", 2L), (2, "a/c", 1L)))
  }

  test("splitHtml drops script blocks and packs tag pieces") {
    val html = "<html><script>var x=1;</script><div class=\"big\">title</div>" +
      "<p>a</p><p>b</p></html>"
    val out = Chunker.splitHtml(html, 30)
    assert(out.forall(!_.contains("var x=1")))
    assert(out.forall(!_.contains("class=")))
    assert(out.mkString.contains("title"))
  }

  test("chunkAuto dispatches html vs text by suffix") {
    val docs = Seq(
      ("a.html", "<div>x</div>"),
      ("b.txt", "plain text")).toDF("path", "content")
    val out = Chunker.chunkAuto(docs, "path", "path", "content", 100)
    assert(out.count() == 2)
  }

  test("trimChunk windows around the attribute occurrence") {
    val long = (1 to 100).map(i => s"w$i").mkString(" ") + " budget 5M " + (1 to 100).map(i => s"z$i").mkString(" ")
    val got = Seq((long, "budget")).toDF("chunk", "attr")
      .select(Chunker.trimChunk(col("chunk"), col("attr"), 20).as("t")).head.getString(0)
    assert(got.split(" ").length <= 20)
    assert(got.contains("budget"))
  }

  test("AffixTrim learns and strips modal affixes") {
    val train = Seq(
      ("Applicant: Acme Corp.", "Acme Corp"),
      ("Applicant: Zeta Inc.", "Zeta Inc"))
    val aff = AffixTrim.learn(train)
    assert(aff == AffixTrim.Affixes("Applicant: ", "."))
    val got = Seq("Applicant: Gamma LLC.", "Gamma LLC").toDF("v")
      .select(AffixTrim(col("v"), aff).as("t")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("Gamma LLC", "Gamma LLC"))
  }

  test("metadataStringRerank drops singletons, caps, samples values") {
    val counts = Seq(("a", 3L), ("b", 2L), ("c", 1L)).toDF("field", "n_docs")
    val values = Seq(("a", "v2"), ("a", "v1"), ("a", "v3"), ("b", "x")).toDF("field", "value")
    val got = SchemaId.metadataStringRerank(counts, values).orderBy("rank").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b")) // c is a singleton
    assert(got(0).getAs[String]("sample_str") == "v1, v2")
  }

  test("normalizeSynthetic strips markup, entities, nan") {
    val got = Seq("<b>A &amp; B</b>", "nan", " x  y ").toDF("v")
      .select(graft.extract.Clean.normalizeSynthetic(col("v"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("A & B", "", "x y"))
  }

  test("salted aggregations equal their unsalted forms on skewed keys") {
    // one hot key (90%), a few cold keys
    val skewed = (0 until 2000).map(i => (if (i % 10 == 0) s"cold${i % 7}" else "hot", i.toLong))
      .toDF("k", "v").repartition(13)
    val plainCount = skewed.groupBy("k").count()
    val saltCount  = Skew.saltedCount(skewed, Seq("k"), salts = 8)
    assert(rows(plainCount.orderBy("k")) == rows(saltCount.orderBy("k")))
    val plainSum = skewed.groupBy("k").agg(sum(col("v")).as("sum"))
    val saltSum  = Skew.saltedSum(skewed, Seq("k"), col("v"), salts = 8)
    assert(rows(plainSum.orderBy("k")) == rows(saltSum.orderBy("k")))
  }

  test("writePartitioned prunes partition directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Seq(
      (1L, "en", "hello"), (2L, "en", "world"),
      (3L, "de", "hallo"), (4L, "fr", "salut"))
      .toDF("doc_id", "lang", "text")
    Sinks.writePartitioned(docs, dir, "lang")
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    // the equality filter must land in PartitionFilters (directory
    // pruning), not PushedFilters (row-group IO on every file)
    val scan = back.queryExecution.executedPlan
      .collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    // exactly the en partition's files survive pruning
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(scan.metadata("Location").contains(dir))
  }

  test("compact rewrites a many-small-files dir into few target-sized files") {
    val in   = java.nio.file.Files.createTempDirectory("graft_compact_in").toString
    val out  = java.nio.file.Files.createTempDirectory("graft_compact_out").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_compact_out2").toString
    val df   = (0L until 2000L).map(i => (i, s"row $i payload")).toDF("id", "text")
    df.repartition(40).write.mode("overwrite").parquet(in)
    assert(new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet")) == 40)
    // generous target → everything folds into one file, no shuffle
    val n1 = Sinks.compact(spark, in, out, targetBytes = 64L * 1024 * 1024)
    assert(n1 == 1)
    assert(new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet")) == 1)
    val back = spark.read.parquet(out)
    assert(back.count() == 2000 && back.exceptAll(df).count() == 0)
    // tiny target → several files, still all rows
    val n2 = Sinks.compact(spark, in, out2, targetBytes = 16 * 1024)
    assert(n2 > 1, s"expected multiple output files, got $n2")
    assert(spark.read.parquet(out2).count() == 2000)
  }

  test("writeZOrdered: every output file covers a small rectangle in BOTH dimensions") {
    val zout = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val xout = java.nio.file.Files.createTempDirectory("graft_xsort").toString
    // 64×64 grid: x and y each uniform on 0..63
    val grid = (0 until 4096).map(i => (i.toLong, (i / 64).toLong, (i % 64).toLong))
      .toDF("id", "x", "y")
    Sinks.writeZOrdered(grid, zout, Seq("x", "y"), bits = 6, nFiles = 16)
    // baseline: lexicographic sort on x only, same file count
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(xout)
    def fileRanges(dir: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max(col("x")) - min(col("x"))).as("rx"), (max(col("y")) - min(col("y"))).as("ry"))
        .collect().toSeq.map(r => (r.getAs[Long]("rx"), r.getAs[Long]("ry")))
    val z = fileRanges(zout)
    val lex = fileRanges(xout)
    // all 4096 rows survive, layout only
    assert(spark.read.parquet(zout).count() == 4096)
    val zAvgX = z.map(_._1).sum.toDouble / z.size
    val zAvgY = z.map(_._2).sum.toDouble / z.size
    val lexAvgY = lex.map(_._2).sum.toDouble / lex.size
    // z-order: both dims tight (files are ~16×16 rectangles of the
    // 64×64 space); x-sort: y stays full-range in every file
    assert(zAvgX < 32 && zAvgY < 32, s"z layout not rectangular: x=$zAvgX y=$zAvgY")
    assert(lexAvgY > 44, s"baseline unexpectedly tight on y: $lexAvgY")
    assert(zAvgY < lexAvgY / 2, s"z layout ($zAvgY) should beat x-sort ($lexAvgY) on y")
  }

  test("writeBucketed joins two co-bucketed tables without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '$dir'")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so the assertion sees the bucketing (a
    // broadcast join avoids the shuffle for a different reason)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0L until 100L).map(i => (i, s"text$i")).toDF("doc_id", "text")
      val b = (0L until 100L).map(i => (i, i * 2)).toDF("doc_id", "score")
      Sinks.writeBucketed(a, "bktdb.bkt_a", "doc_id", nBuckets = 4)
      Sinks.writeBucketed(b, "bktdb.bkt_b", "doc_id", nBuckets = 4)
      val joined = spark.table("bktdb.bkt_a").join(spark.table("bktdb.bkt_b"), "doc_id")
      val plan   = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")
    }
  }
}
