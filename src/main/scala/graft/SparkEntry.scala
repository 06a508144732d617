package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.lake.{Chunker, ChunkFilter, HtmlOps, Tables}
import graft.extract.{Clean, DirectExtract, MockLlmClient}
import graft.combine.{Combiners, StructuredView}
import graft.score.Score
import graft.eval.Harness

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

  /** First n space-separated words of `text` as one string. */
  private def firstWords(n: Int) =
    array_join(slice(split(col("text"), " "), 1, n), " ")

  /** Synthetic extractor ensemble over documents: deterministic
    * "functions" (prefix extractors of different widths) + their
    * sample gold — the shape the scoring/selection stack consumes.
    */
  private def scoredExtractions(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val mk = (name: String, n: Int) =>
      d.select(
        col("doc_id"),
        lit(name).as("extractor"),
        firstWords(n).as("pred"),
        firstWords(10).as("gold"))
    mk("function_1", 8).unionByName(mk("function_2", 12)).unionByName(mk("llm_direct", 5))
  }

  /** Gold table fixture: even doc_ids only (odd docs are "unlabeled"). */
  private def goldTable(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), firstWords(10).as("gold"))

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

    // §2.5 text-F1: per-pair SQuAD token F1 (evaluate_profiler.py:81-153)
    "q_text_f1" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), firstWords(8).as("pred"), firstWords(10).as("gold"))
        .select(col("doc_id"), round(Score.tokenF1(col("pred"), col("gold")), 6).as("f1"))
        .orderBy(col("doc_id"))),

    // D7 metrics: avg + exact-median F1 per extractor (evaluate_profiler.py:202-228)
    "q_f1_metrics" -> ((s, dir) =>
      Score
        .f1Metrics(scoredExtractions(s, dir), Seq("extractor"))
        .select(
          col("extractor"),
          round(col("avg_f1"), 6).as("avg_f1"),
          round(col("med_f1"), 6).as("med_f1"),
          round(col("extraction_fraction"), 6).as("extraction_fraction"))
        .orderBy(col("extractor"))),

    // §2.5 extraction fraction per language slice (evaluate_profiler.py:203-208)
    "q_extraction_fraction" -> ((s, dir) =>
      Score
        .extractionFraction(
          docs(s, dir).select(col("lang"), regexp_extract(col("text"), "spark (\\w+)", 1).as("value")),
          "value",
          Seq("lang"))
        .select(col("lang"), round(col("extraction_fraction"), 6).as("extraction_fraction"))
        .orderBy(col("lang"))),

    // §2.4 pred ⋈ gold equi-join (evaluate_profiler.py:190-198)
    "q_join_pred_gold" -> ((s, dir) => {
      val pred = docs(s, dir).select(col("doc_id"), firstWords(8).as("pred"))
      Harness
        .joinPredGold(pred, goldTable(s, dir), Seq("doc_id"))
        .select(col("doc_id"), col("pred"), col("gold"))
        .orderBy(col("doc_id"))
    }),

    // §2.4 files missing from gold → left anti (run_ws.py:47-50)
    "q_missing_files_anti" -> ((s, dir) =>
      Harness
        .missingGoldAnti(docs(s, dir), goldTable(s, dir), Seq("doc_id"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // §2.3 top-k extractor selection (evaluate_profiler.py:233-304)
    "q_topk_scripts" -> ((s, dir) => {
      val metrics = Score
        .f1Metrics(scoredExtractions(s, dir), Seq("extractor"))
        .select(col("extractor"), col("avg_f1"), col("med_f1"))
      Score
        .topkScripts(metrics, k = 2, goldKey = "gold", keepThresh = 0.5)
        .orderBy(col("rank"))
    }),

    // §2.4/§2.7 extractor-output union → per-key vote list (profiler.py:132-146)
    "q_vote_collect" -> ((s, dir) =>
      Combiners
        .voteCollect(
          Seq(scoredExtractions(s, dir).select(col("doc_id"), col("pred").as("value"))),
          Seq("doc_id"),
          "value")
        .select(col("doc_id"), array_join(col("votes"), "|").as("votes_str"))
        .orderBy(col("doc_id"))),

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

  /** DuckDB fragment: first n words of documents.text. */
  private def fwSql(n: Int) =
    s"array_to_string(list_slice(string_split(text, ' '), 1, $n), ' ')"

  /** DuckDB CTE chain computing per-(doc, extractor) token F1 for the
    * synthetic ensemble — mirrors Score.tokenF1 exactly (same IEEE
    * expression shape).
    */
  private val extF1Ctes: String =
    s"""ext AS (
          SELECT doc_id, 'function_1' AS extractor, ${fwSql(8)} AS pred, ${fwSql(10)} AS gold FROM documents
          UNION ALL
          SELECT doc_id, 'function_2' AS extractor, ${fwSql(12)} AS pred, ${fwSql(10)} AS gold FROM documents
          UNION ALL
          SELECT doc_id, 'llm_direct' AS extractor, ${fwSql(5)} AS pred, ${fwSql(10)} AS gold FROM documents),
        pt AS (SELECT doc_id, extractor, t, count(*) AS pc
               FROM ext, unnest(string_split(pred, ' ')) AS u(t) WHERE len(t) > 0
               GROUP BY doc_id, extractor, t),
        gt AS (SELECT doc_id, extractor, t, count(*) AS gc
               FROM ext, unnest(string_split(gold, ' ')) AS u(t) WHERE len(t) > 0
               GROUP BY doc_id, extractor, t),
        iv AS (SELECT doc_id, extractor, sum(least(pc, gc)) AS same
               FROM pt JOIN gt USING (doc_id, extractor, t)
               GROUP BY doc_id, extractor),
        f1s AS (SELECT e.doc_id, e.extractor, e.pred,
                       len(list_filter(string_split(e.pred, ' '), x -> len(x) > 0)) AS np,
                       len(list_filter(string_split(e.gold, ' '), x -> len(x) > 0)) AS ng,
                       CAST(coalesce(iv.same, 0) AS DOUBLE) AS same,
                       CASE WHEN np = 0 OR ng = 0 THEN (CASE WHEN np = ng THEN 1.0 ELSE 0.0 END)
                            WHEN same = 0 THEN 0.0
                            ELSE 2.0 * (same / np) * (same / ng) / ((same / np) + (same / ng)) END AS f1
                FROM ext e LEFT JOIN iv ON e.doc_id = iv.doc_id AND e.extractor = iv.extractor)"""

  /** DuckDB-equivalent ANSI SQL per queries key (same tables). */
  def oracleSql: Map[String, String] = ListMap(
    "q_text_f1" ->
      s"""WITH pg AS (SELECT doc_id, ${fwSql(8)} AS pred, ${fwSql(10)} AS gold FROM documents),
          pt AS (SELECT doc_id, t, count(*) AS pc FROM pg, unnest(string_split(pred, ' ')) AS u(t)
                 WHERE len(t) > 0 GROUP BY doc_id, t),
          gt AS (SELECT doc_id, t, count(*) AS gc FROM pg, unnest(string_split(gold, ' ')) AS u(t)
                 WHERE len(t) > 0 GROUP BY doc_id, t),
          iv AS (SELECT pt.doc_id, sum(least(pc, gc)) AS same FROM pt JOIN gt USING (doc_id, t) GROUP BY pt.doc_id)
          SELECT pg.doc_id,
                 round(CASE WHEN len(list_filter(string_split(pred, ' '), x -> len(x) > 0)) = 0
                              OR len(list_filter(string_split(gold, ' '), x -> len(x) > 0)) = 0
                            THEN (CASE WHEN len(list_filter(string_split(pred, ' '), x -> len(x) > 0))
                                          = len(list_filter(string_split(gold, ' '), x -> len(x) > 0))
                                       THEN 1.0 ELSE 0.0 END)
                            WHEN coalesce(same, 0) = 0 THEN 0.0
                            ELSE 2.0 * (CAST(coalesce(same, 0) AS DOUBLE) / len(list_filter(string_split(pred, ' '), x -> len(x) > 0)))
                                     * (CAST(coalesce(same, 0) AS DOUBLE) / len(list_filter(string_split(gold, ' '), x -> len(x) > 0)))
                                     / ((CAST(coalesce(same, 0) AS DOUBLE) / len(list_filter(string_split(pred, ' '), x -> len(x) > 0)))
                                      + (CAST(coalesce(same, 0) AS DOUBLE) / len(list_filter(string_split(gold, ' '), x -> len(x) > 0)))) END,
                       6) AS f1
          FROM pg LEFT JOIN iv ON pg.doc_id = iv.doc_id ORDER BY pg.doc_id""",

    "q_f1_metrics" ->
      s"""WITH $extF1Ctes
          SELECT extractor, round(avg(f1), 6) AS avg_f1,
                 round(quantile_cont(f1, 0.5), 6) AS med_f1,
                 round(avg(CASE WHEN trim(pred) <> '' AND lower(trim(pred)) <> 'none' THEN 1.0 ELSE 0.0 END), 6) AS extraction_fraction
          FROM f1s GROUP BY extractor ORDER BY extractor""",

    "q_extraction_fraction" ->
      """SELECT lang,
                round(avg(CASE WHEN trim(v) <> '' AND lower(trim(v)) <> 'none' THEN 1.0 ELSE 0.0 END), 6) AS extraction_fraction
         FROM (SELECT lang, regexp_extract(text, 'spark (\w+)', 1) AS v FROM documents)
         GROUP BY lang ORDER BY lang""",

    "q_join_pred_gold" ->
      s"""SELECT d.doc_id, ${fwSql(8)} AS pred, g.gold
          FROM documents d
          JOIN (SELECT doc_id, ${fwSql(10)} AS gold FROM documents WHERE doc_id % 2 = 0) g
            ON d.doc_id = g.doc_id
          ORDER BY d.doc_id""",

    "q_missing_files_anti" ->
      """SELECT d.doc_id, d.lang FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM documents g WHERE g.doc_id % 2 = 0 AND g.doc_id = d.doc_id)
         ORDER BY d.doc_id""",

    "q_topk_scripts" ->
      s"""WITH $extF1Ctes,
          metrics AS (SELECT extractor, avg(f1) AS avg_f1, quantile_cont(f1, 0.5) AS med_f1
                      FROM f1s GROUP BY extractor),
          ranked AS (SELECT *, row_number() OVER (ORDER BY avg_f1 DESC, med_f1 DESC, extractor ASC) AS rank
                     FROM metrics WHERE extractor <> 'gold'),
          best AS (SELECT greatest(avg_f1, med_f1) AS best_value FROM ranked WHERE rank = 1),
          flagged AS (SELECT r.*, (r.extractor LIKE '%function%'
                                   AND (r.avg_f1 >= 0.5 OR r.med_f1 >= 0.5)
                                   AND abs(greatest(r.avg_f1, r.med_f1) - b.best_value) < 1.0) AS is_qual_fn
                      FROM ranked r CROSS JOIN best b),
          counted AS (SELECT *, sum(CASE WHEN is_qual_fn THEN 1 ELSE 0 END) OVER () AS num_fns FROM flagged),
          sel AS (SELECT extractor, rank FROM counted
                  WHERE num_fns > 0 AND rank <= least(2, num_fns) AND is_qual_fn AND rank <= 2)
          SELECT extractor, rank FROM sel
          UNION ALL
          SELECT extractor, rank FROM ranked
          WHERE rank = 1 AND NOT EXISTS (SELECT 1 FROM sel)
          ORDER BY rank""",

    "q_vote_collect" ->
      s"""WITH ext AS (
            SELECT doc_id, ${fwSql(8)} AS value FROM documents
            UNION ALL SELECT doc_id, ${fwSql(12)} AS value FROM documents
            UNION ALL SELECT doc_id, ${fwSql(5)} AS value FROM documents)
          SELECT doc_id, string_agg(value, '|' ORDER BY value) AS votes_str
          FROM ext GROUP BY doc_id ORDER BY doc_id""",

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
