package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("splitText packs pieces greedily under the cap") {
    val text = "aaa bbb\nccc. ddd, eee fff\nggg"
    val out  = Chunker.splitText(text, 12)
    assert(out.forall(_.length <= 12))
    // lossless modulo separator normalization at chunk boundaries
    val norm  = (s: String) => s.replace("\n", "").replace(" ", "")
    assert(norm(out.mkString(" ")) == norm(text))
  }

  test("splitText: short text is a single chunk") {
    assert(Chunker.splitText("hello world", 100) == Seq("hello world"))
    assert(Chunker.splitText("", 100) == Seq(""))
  }

  test("chunkFixed covers the full text in order") {
    val df  = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Chunker.chunkFixed(df, "doc_id", "text", 4).orderBy("doc_id", "chunk_id")
    val got = rows(out)
    assert(got == Seq(
      Seq(1L, 0, "abcd"), Seq(1L, 1, "efgh"), Seq(1L, 2, "ij"),
      Seq(2L, 0, "xy"), Seq(3L, 0, "")))
  }

  test("chunkText emits ordered ids and respects cap") {
    val df  = Seq((1L, ("word " * 100).trim)).toDF("doc_id", "text")
    val out = Chunker.chunkText(df, "doc_id", "text", 50).collect()
    assert(out.map(_.getInt(1)).toSeq == out.indices.toSeq)
    assert(out.forall(_.getString(2).length <= 50))
  }

  test("chunkAuto dispatches per row: html paths strip scripts, txt paths don't") {
    val html = "<html>\n<script>var x = 1;</script>\n<p>kept text</p>\n</html>"
    val df = Seq(
      ("a.html", html),
      ("a.txt", html) // same CONTENT, txt suffix → text chunker, script survives
    ).toDF("path", "content")
    val out = Chunker.chunkAuto(df, "path", "path", "content", 1000).collect()
    val byPath = out.groupBy(_.getString(0)).map { case (p, rs) => p -> rs.map(_.getString(2)).mkString("\n") }
    assert(!byPath("a.html").contains("var x"), s"html path kept script: ${byPath("a.html")}")
    assert(byPath("a.html").contains("kept text"))
    assert(byPath("a.txt").contains("var x"), "txt path must not strip scripts")
  }

  test("dynamicBackoff keeps chunk ids within mean+stddev") {
    val chunks = Seq(
      (1L, 0), (1L, 1), (2L, 0), (2L, 1), (2L, 2), (2L, 3), (2L, 4), (3L, 0))
      .toDF("doc_id", "chunk_id")
      .withColumn("chunk", lit("c"))
    // counts: 2,5,1 → mean 8/3≈2.667, stddev≈2.082 → cutoff≈4.748
    val kept = Chunker.dynamicBackoff(chunks, "doc_id")
    assert(kept.agg(max("chunk_id")).head.getInt(0) == 4)
    assert(kept.count() == 8)
  }
}
