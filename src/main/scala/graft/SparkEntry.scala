package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.lake.{Chunker, ChunkFilter, HtmlOps, Tables}
import graft.extract.{Clean, DirectExtract, MockLlmClient}
import graft.combine.{Combiners, StructuredView}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a thin wiring of a library operator over
  * the driver testdata; `oracleSql` holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private val ChunkSize = 200
  private val KeywordAttrs = Seq("spark", "customer data", "vector join")

  private def docs(s: SparkSession, dir: String)   = Tables.documents(s, dir)
  private def events(s: SparkSession, dir: String) = Tables.events(s, dir)

  private def chunks(s: SparkSession, dir: String): DataFrame =
    Chunker.chunkFixed(docs(s, dir), "doc_id", "text", ChunkSize)

  /** Flagship: the Evaporate spine end-to-end on sf0.001 — scan →
    * chunk → keyword filter → (mock) direct extraction → clean →
    * majority vote → pivot to the structured view (SURVEY §3 E2 with
    * one extractor family).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir   = "/root/testdata/sf0.001"
    val d     = docs(spark, dir)
    val ch    = Chunker.chunkText(d, "doc_id", "text", 500)
    val attrs = spark.createDataFrame(KeywordAttrs.map(Tuple1(_))).toDF("attribute")
    val kept  = ChunkFilter.keywordChunkFilter(ch, attrs, "doc_id")
    val extracted = DirectExtract(
      kept.select(col("doc_id"), col("attribute"), col("chunk")),
      MockLlmClient(),
      "doc_id")
    // mock returns "" on word-soup docs — fall back to first word
    // after the attribute occurrence so the spine produces values
    val valued = extracted.withColumn(
      "value",
      when(length(col("value")) > 0, col("value"))
        .otherwise(regexp_extract(col("chunk"), "(?i)\\b\\w+\\b\\s+(\\w+)", 1)))
    val cleaned = valued.withColumn("value", Clean.cleanPrediction(col("value"), col("attribute")))
    val voted   = Combiners.majorityVote(cleaned, Seq("doc_id", "attribute"), "value")
    StructuredView.pivotView(voted, "doc_id", "attribute", "value", KeywordAttrs)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // §2.1 dir-scan / file-read over the lake table
    "q_scan_documents" -> ((s, dir) =>
      docs(s, dir)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // §2.1 file-type-profile (get_unique_file_types, utils.py:103-113)
    "q_file_type_profile" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_files"), min(col("doc_id")).as("example_doc"))
        .orderBy(col("source"), col("lang"))),

    // §2.2 html-clean + strip-tags projection chain
    "q_strip_tags" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          HtmlOps.collapseWs(HtmlOps.stripTags(HtmlOps.stripScriptStyleSvg(col("text")))).as("clean_text"))
        .orderBy(col("doc_id"))),

    // §2.2 txt-chunk (profiler_utils.py:309-344) — fixed-width oracle shape
    "q_chunk_documents" -> ((s, dir) =>
      chunks(s, dir).orderBy(col("doc_id"), col("chunk_id"))),

    // §2.2 keyword-chunk-filter (profiler_utils.py:364-417)
    "q_keyword_chunk_filter" -> ((s, dir) => {
      val attrs = s.createDataFrame(KeywordAttrs.map(Tuple1(_))).toDF("attribute")
      ChunkFilter
        .keywordChunkFilter(chunks(s, dir), attrs, "doc_id")
        .select(col("doc_id"), col("attribute"), col("chunk_id"), col("match_tier"), col("word_hits"))
        .orderBy(col("doc_id"), col("attribute"), col("chunk_id"))
    }),

    // §2.2 value-clean (evaluate_profiler.py:7-27)
    "q_clean_extraction" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          Clean.normalizeForEval(col("text").substr(1, 60), lit("data")).as("clean_value"))
        .orderBy(col("doc_id"))),

    // §2.5 majority-vote combiner (profiler.py:148-154)
    "q_majority_vote" -> ((s, dir) =>
      Combiners
        .majorityVote(
          events(s, dir).select(col("user_id"), col("event_type").as("value")),
          Seq("user_id"),
          "value")
        .orderBy(col("user_id"))),

    // D9 structured view: pivot to wide per-key row (profiler.py:676-685)
    "q_structured_view" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .count()
      types
        .foldLeft(wide) { case (df, t) => df.withColumn(t, coalesce(col(t), lit(0L))) }
        .orderBy(col("user_id"))
    }),

    // §2.6 window rank (events): row_number per user by time
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
        .orderBy(col("user_id"), col("rn"))
    })
  )

  /** DuckDB-equivalent ANSI SQL per queries key (same tables). */
  def oracleSql: Map[String, String] = ListMap(
    "q_scan_documents" ->
      """SELECT doc_id, lang, source, n_chars FROM documents WHERE n_chars > 0 ORDER BY doc_id""",

    "q_file_type_profile" ->
      """SELECT source, lang, count(*) AS n_files, min(doc_id) AS example_doc
         FROM documents GROUP BY source, lang ORDER BY source, lang""",

    "q_strip_tags" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(regexp_replace(text,
                  '(?is)<(script|style|svg)\b[^>]*>.*?</(script|style|svg)>', ' ', 'g'),
                  '<[^>]*>', ' ', 'g'),
                  '\s+', ' ', 'g')) AS clean_text
         FROM documents ORDER BY doc_id""",

    "q_chunk_documents" ->
      s"""SELECT doc_id, CAST(i AS INT) AS chunk_id,
                 substring(text, CAST(i AS INT)*$ChunkSize + 1, $ChunkSize) AS chunk
          FROM documents,
               unnest(range(0, GREATEST(CAST(ceil(length(text)/$ChunkSize.0) AS INT), 1))) AS t(i)
          ORDER BY doc_id, chunk_id""",

    "q_keyword_chunk_filter" ->
      s"""WITH chunks AS (
            SELECT doc_id, CAST(i AS INT) AS chunk_id,
                   substring(text, CAST(i AS INT)*$ChunkSize + 1, $ChunkSize) AS chunk
            FROM documents,
                 unnest(range(0, GREATEST(CAST(ceil(length(text)/$ChunkSize.0) AS INT), 1))) AS t(i)),
          attrs(attribute) AS (VALUES ('spark'), ('customer data'), ('vector join')),
          scored AS (
            SELECT c.doc_id, c.chunk_id, a.attribute,
                   CAST(len(list_filter(string_split(lower(a.attribute), ' '),
                        w -> contains(lower(c.chunk), w))) AS INT) AS word_hits,
                   CASE WHEN contains(lower(c.chunk), lower(a.attribute)) THEN 0
                        WHEN contains(replace(lower(c.chunk), ' ', ''),
                                      replace(lower(a.attribute), ' ', '')) THEN 1
                        WHEN len(list_filter(string_split(lower(a.attribute), ' '),
                             w -> contains(lower(c.chunk), w))) > 0 THEN 2
                        ELSE 3 END AS match_tier
            FROM chunks c CROSS JOIN attrs a)
          SELECT doc_id, attribute, chunk_id, match_tier, word_hits
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, attribute
                       ORDER BY match_tier ASC, word_hits DESC, chunk_id ASC) AS rn
                FROM scored WHERE match_tier < 3)
          WHERE rn <= 2 ORDER BY doc_id, attribute, chunk_id""",

    "q_clean_extraction" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  lower(substring(text, 1, 60)),
                  '[^a-z0-9 ]', ' ', 'g'),
                  '\bdata\b', ' ', 'g'),
                  '\bnone\b', ' ', 'g'),
                  '\s+', ' ', 'g')) AS clean_value
         FROM documents ORDER BY doc_id""",

    "q_majority_vote" ->
      """WITH c AS (SELECT user_id, event_type AS value, count(*) AS n_votes
                    FROM events GROUP BY user_id, event_type)
         SELECT user_id, value, n_votes
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY n_votes DESC, value ASC) AS rn FROM c)
         WHERE rn = 1 ORDER BY user_id""",

    "q_structured_view" ->
      """SELECT user_id,
                count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_window_rank" ->
      """SELECT user_id, event_id, rn
         FROM (SELECT user_id, event_id,
                      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events)
         WHERE rn <= 3 ORDER BY user_id, rn"""
  )
}
