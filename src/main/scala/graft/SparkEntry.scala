package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.lake.{Chunker, ChunkFilter, HtmlOps, Tables}
import graft.extract.{Clean, DirectExtract, MockLlmClient}
import graft.combine.{Combiners, LabelModel, StructuredView}
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

  /** Binary ±1 vote fixture for the WS stack (D8): three deterministic
    * labeling functions over documents — v1 perfect, v2 uncorrelated
    * noise with abstains (0), v3 = truth flipped on doc_id % 7 == 0.
    */
  private def binaryVotes(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val y = when(col("lang") === "en", 1).otherwise(-1)
    val mk = (name: String, v: org.apache.spark.sql.Column) =>
      d.select(col("doc_id"), lit(name).as("extractor"), v.as("vote"))
    mk("v1", y)
      .unionByName(mk(
        "v2",
        when(col("n_chars") % 11 === 0, 0)
          .when(col("n_chars") % 3 === 0, 1)
          .otherwise(-1)))
      .unionByName(mk("v3", when(col("doc_id") % 7 === 0, -y).otherwise(y)))
  }

  private def binaryGold(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), when(col("lang") === "en", 1).otherwise(-1).as("y"))

  /** DuckDB CTEs mirroring binaryVotes/binaryGold. */
  private val votesCtes: String =
    """votes AS (
         SELECT doc_id, 'v1' AS extractor, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS vote FROM documents
         UNION ALL
         SELECT doc_id, 'v2', CASE WHEN n_chars % 11 = 0 THEN 0 WHEN n_chars % 3 = 0 THEN 1 ELSE -1 END FROM documents
         UNION ALL
         SELECT doc_id, 'v3', CASE WHEN doc_id % 7 = 0 THEN (CASE WHEN lang = 'en' THEN -1 ELSE 1 END)
                                   ELSE (CASE WHEN lang = 'en' THEN 1 ELSE -1 END) END FROM documents),
       gold AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y FROM documents)"""

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

    // §2.5 vote histogram → int matrix (run_ws.py:41-98)
    "q_vote_matrix" -> ((s, dir) => {
      val votes = scoredExtractions(s, dir).select(col("doc_id"), col("extractor"), col("pred").as("value"))
      Combiners
        .voteMatrix(votes, "doc_id", numElts = 5)
        .select(
          col("doc_id"),
          array_join(col("labels"), "|").as("labels_str"),
          array_join(transform(col("votes"), v => v.cast("string")), ",").as("votes_str"))
        .orderBy(col("doc_id"))
    }),

    // §2.5 class-conditional confusion estimates, clipped (methods.py:203-242)
    "q_confusion_matrix" -> ((s, dir) =>
      LabelModel
        .confusionMatrix(binaryVotes(s, dir), binaryGold(s, dir), "doc_id")
        .select(col("extractor"), col("y"), col("vote"), col("n"), round(col("p"), 6).as("p"))
        .orderBy(col("extractor"), col("y"), col("vote"))),

    // §2.11 naive-Bayes posterior combiner (methods.py:521)
    "q_nb_posterior" -> ((s, dir) => {
      val accs = LabelModel.accuracies(binaryVotes(s, dir), binaryGold(s, dir), "doc_id")
      LabelModel
        .naiveBayesPredict(binaryVotes(s, dir), accs, "doc_id")
        .select(
          col("doc_id"),
          col("nb_pred"),
          round(col("score_pos"), 6).as("score_pos"),
          round(col("score_neg"), 6).as("score_neg"))
        .orderBy(col("doc_id"))
    }),

    // §2.5 abstain-masked pairwise moments E[v_i v_j] (methods.py:275-328)
    "q_pairwise_moments" -> ((s, dir) =>
      LabelModel
        .pairwiseMoments(binaryVotes(s, dir), "doc_id")
        .select(col("e_i"), col("e_j"), round(col("moment"), 6).as("moment"), col("n"))
        .orderBy(col("e_i"), col("e_j"))),

    // §2.11 FlyingSquid triplet closed-form accuracies (methods.py:275-328)
    "q_flying_squid" -> ((s, dir) => {
      val accs = LabelModel.flyingSquidAccuracies(
        LabelModel.pairwiseMoments(binaryVotes(s, dir), "doc_id"))
      import s.implicits._
      accs.toSeq.sortBy(_._1).toDF("extractor", "acc")
        .select(col("extractor"), round(col("acc"), 6).as("acc"))
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

    "q_vote_matrix" ->
      s"""WITH ext AS (
            SELECT doc_id, 'function_1' AS extractor, ${fwSql(8)} AS value FROM documents
            UNION ALL SELECT doc_id, 'function_2', ${fwSql(12)} FROM documents
            UNION ALL SELECT doc_id, 'llm_direct', ${fwSql(5)} FROM documents),
          counts AS (SELECT doc_id, value, count(*) AS n FROM ext GROUP BY doc_id, value),
          ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, value ASC) AS rk FROM counts),
          top AS (SELECT doc_id, value, rk FROM ranked WHERE rk <= 5),
          labels AS (SELECT doc_id, string_agg(value, '|' ORDER BY rk) AS labels_str FROM top GROUP BY doc_id),
          vm AS (SELECT e.doc_id, e.extractor, coalesce(t.rk - 1, -1) AS vote_int
                 FROM ext e LEFT JOIN top t ON e.doc_id = t.doc_id AND e.value = t.value),
          vs AS (SELECT doc_id, string_agg(CAST(vote_int AS VARCHAR), ',' ORDER BY extractor) AS votes_str
                 FROM vm GROUP BY doc_id)
          SELECT l.doc_id, l.labels_str, vs.votes_str
          FROM labels l JOIN vs ON l.doc_id = vs.doc_id ORDER BY l.doc_id""",

    "q_confusion_matrix" ->
      s"""WITH $votesCtes,
          counts AS (SELECT v.extractor, g.y, v.vote, count(*) AS n
                     FROM votes v JOIN gold g ON v.doc_id = g.doc_id
                     GROUP BY v.extractor, g.y, v.vote)
          SELECT extractor, y, vote, n,
                 round(least(greatest(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY extractor, y), 0.0001), 0.9999), 6) AS p
          FROM counts ORDER BY extractor, y, vote""",

    "q_nb_posterior" ->
      s"""WITH $votesCtes,
          accs AS (SELECT v.extractor,
                          least(greatest(avg(CASE WHEN v.vote = g.y THEN 1.0 ELSE 0.0 END), 0.0001), 0.9999) AS acc
                   FROM votes v JOIN gold g ON v.doc_id = g.doc_id
                   WHERE v.vote <> 0 GROUP BY v.extractor),
          scored AS (SELECT v.doc_id,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = 1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_pos,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = -1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_neg
                     FROM votes v JOIN accs a ON v.extractor = a.extractor
                     GROUP BY v.doc_id)
          SELECT doc_id, CASE WHEN score_pos >= score_neg THEN 1 ELSE -1 END AS nb_pred,
                 round(score_pos, 6) AS score_pos, round(score_neg, 6) AS score_neg
          FROM scored ORDER BY doc_id""",

    "q_pairwise_moments" ->
      s"""WITH $votesCtes
          SELECT a.extractor AS e_i, b.extractor AS e_j,
                 round(avg(a.vote * b.vote), 6) AS moment, count(*) AS n
          FROM votes a JOIN votes b ON a.doc_id = b.doc_id
          WHERE a.extractor < b.extractor AND a.vote <> 0 AND b.vote <> 0
          GROUP BY a.extractor, b.extractor ORDER BY e_i, e_j""",

    "q_flying_squid" ->
      s"""WITH $votesCtes,
          mom AS (SELECT a.extractor AS e_i, b.extractor AS e_j, avg(a.vote * b.vote) AS moment
                  FROM votes a JOIN votes b ON a.doc_id = b.doc_id
                  WHERE a.extractor < b.extractor AND a.vote <> 0 AND b.vote <> 0
                  GROUP BY a.extractor, b.extractor),
          wide AS (SELECT
                     max(CASE WHEN e_i = 'v1' AND e_j = 'v2' THEN moment END) AS m12,
                     max(CASE WHEN e_i = 'v1' AND e_j = 'v3' THEN moment END) AS m13,
                     max(CASE WHEN e_i = 'v2' AND e_j = 'v3' THEN moment END) AS m23
                   FROM mom)
          SELECT extractor, round(acc, 6) AS acc FROM (
            SELECT 'v1' AS extractor,
                   CASE WHEN abs(m23) > 1e-12 THEN (1.0 + least(sqrt(abs(m12 * m13 / m23)), 1.0)) / 2 ELSE 0.5 END AS acc FROM wide
            UNION ALL
            SELECT 'v2',
                   CASE WHEN abs(m13) > 1e-12 THEN (1.0 + least(sqrt(abs(m12 * m23 / m13)), 1.0)) / 2 ELSE 0.5 END FROM wide
            UNION ALL
            SELECT 'v3',
                   CASE WHEN abs(m12) > 1e-12 THEN (1.0 + least(sqrt(abs(m13 * m23 / m12)), 1.0)) / 2 ELSE 0.5 END FROM wide)
          ORDER BY extractor""",

    "q_window_rank" ->
      """SELECT user_id, event_id, rn
         FROM (SELECT user_id, event_id,
                      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events)
         WHERE rn <= 3 ORDER BY user_id, rn"""
  )
}
