package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.lake.{Chunker, ChunkFilter, HtmlOps, Skew, Tables}
import graft.extract.{Clean, DirectExtract, MockLlmClient}
import graft.combine.{Combiners, LabelModel, StructuredView}
import graft.score.Score
import graft.eval.Harness
import graft.schema.SchemaId
import graft.textops.{Curation, Dedup, Sampling, Similarity, TextStats}
import graft.multimodal.Multimodal
import graft.streaming.{EventWindows, Sessionize}

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

  /** (doc, field) relation: distinct words per document — the raw
    * material schema identification counts over.
    */
  private def docFields(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      explode(array_distinct(filter(split(col("text"), " "), t => length(t) > 0))).as("field"))

  private val TripleAttrs = Seq(
    ("spark_next", "spark (\\w+)"),
    ("customer_next", "customer (\\w+)"),
    ("vector_next", "vector (\\w+)"))

  /** Melted extraction triples (doc_id, attribute, value) via regex
    * extractors; value '' = abstain. `fromPrefix` limits the source
    * text (used to derive a slightly-different "gold" set).
    */
  private def triples(s: SparkSession, dir: String, prefixLen: Int = 0): DataFrame = {
    val src = if (prefixLen > 0) col("text").substr(1, prefixLen) else col("text")
    TripleAttrs
      .map { case (name, pat) =>
        docs(s, dir).select(
          col("doc_id"),
          lit(name).as("attribute"),
          regexp_extract(src, pat, 1).as("value"))
      }
      .reduce(_ unionByName _)
  }

  private def triplesSql(prefixLen: Int = 0): String = {
    val src = if (prefixLen > 0) s"substring(text, 1, $prefixLen)" else "text"
    TripleAttrs
      .map { case (name, pat) =>
        s"SELECT doc_id, '$name' AS attribute, regexp_extract($src, '$pat', 1) AS value FROM documents"
      }
      .mkString(" UNION ALL ")
  }

  private val fieldCountSql =
    """fc AS (SELECT t AS field, count(*) AS n_docs
              FROM (SELECT DISTINCT doc_id, t
                    FROM documents, unnest(string_split(text, ' ')) AS u(t)
                    WHERE len(t) > 0)
              GROUP BY t)"""

  private val LangMarkers = Seq(
    "de" -> Seq("join", "table"),
    "en" -> Seq("the", "data"),
    "es" -> Seq("spark", "query"),
    "fr" -> Seq("merge", "filter"),
    "zh" -> Seq("row", "key"))

  private val Stopwords = Seq("the", "a")

  /** Query embedding (vec_id = 0) as a double literal — a scalar
    * query parameter, fetched once on the driver.
    */
  private[graft] def queryVec(s: SparkSession, dir: String): Seq[Double] =
    Tables
      .embeddings(s, dir)
      .filter(col("vec_id") === 0)
      .select(col("embedding"))
      .head()
      .getSeq[Any](0)
      .map(_.asInstanceOf[Number].doubleValue)

  /** Per-doc keep verdict of the hashed-linear classifier at the
    * corpus-mean-logit threshold, with the doc's source — the SHARED
    * input of q_keep_rate_ab (two-proportion z) and q_bootstrap_diff
    * (resampled CI): one definition so the two companion cards can
    * never silently describe different classifiers.
    */
  private def scoredKeeps(s: SparkSession, dir: String): DataFrame = {
    val d      = docs(s, dir)
    val scored = Curation.hashedLinearScore(d, "doc_id", "text", nBuckets = 64)
    val thr = scored.agg(
      (sum(col("logit").cast("decimal(27,18)")).cast("double") / count(lit(1))).as("t"))
    scored
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .crossJoin(broadcast(thr))
      .withColumn("keep", col("logit") >= col("t"))
  }

  /** DuckDB: double dot product of two 64-dim list columns. */
  private def dotSql(x: String, y: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"

  /** DuckDB: dot product over the first `d` dims only (the Matryoshka
    * truncation gauge's prefix cosine).
    */
  private def dotSqlD(x: String, y: String, d: Int) =
    s"list_sum(list_transform(range(1, ${d + 1}), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"

  /** DuckDB: cosine over the first `d` dims (zero-norm guard as in
    * Similarity.cosine).
    */
  private def cosSqlDim(a: String, b: String, d: Int) =
    s"""CASE WHEN ${dotSqlD(a, a, d)} = 0.0 OR ${dotSqlD(b, b, d)} = 0.0 THEN 0.0
             ELSE ${dotSqlD(a, b, d)} / (sqrt(${dotSqlD(a, a, d)}) * sqrt(${dotSqlD(b, b, d)})) END"""

  /** DuckDB: cosine between embedding and qe (both cast to double),
    * mirroring Similarity.cosine's formula.
    */
  private def cosSql(a: String, b: String) =
    s"""CASE WHEN ${dotSql(a, a)} = 0.0 OR ${dotSql(b, b)} = 0.0 THEN 0.0
             ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"""

  /** Cosine from a precomputed dot product and precomputed self-norms
    * (the IVF oracle computes O(rows × centroids) cosines — norms are
    * hoisted once per row; the double result is bit-identical).
    */
  private def cosNSql(ab: String, na: String, nb: String) =
    s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $ab / (sqrt($na) * sqrt($nb)) END"

  /** DuckDB CTE chain for the graph-ANN beam search (q_ann_graph /
    * q_ann_graph_recall): the same seed-centroid assignment CTEs as
    * q_knn_graph, one entry per bucket (max cosine-to-own-centroid,
    * ties to smaller id), knnK=8 neighbor lists, then the two
    * expansion hops unrolled — each candidate set = beam ∪ beam's
    * neighbors, rescored by exact cosine to the query and cut to the
    * best ef=32 by (cos desc, id).
    */
  private lazy val graphAnnCtes: String =
    s"""e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
        c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
              FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
        asg0 AS (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
                        ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} AS cc
                 FROM e2 e CROSS JOIN c),
        asg AS (SELECT vec_id, embedding, nrm, cid AS bucket, cc AS ccos FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
                  FROM asg0) WHERE rn = 1),
        en AS (SELECT vec_id FROM (
                 SELECT vec_id, row_number() OVER (PARTITION BY bucket ORDER BY ccos DESC, vec_id ASC) AS ern
                 FROM asg) WHERE ern = 1),
        gp AS (SELECT a.vec_id AS src, b.vec_id AS nbr,
                      round(${cosNSql(dotSql("a.embedding", "b.embedding"), "a.nrm", "b.nrm")}, 6) AS gcos
               FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        gr AS (SELECT src, nbr FROM (
                 SELECT src, nbr, row_number() OVER (PARTITION BY src ORDER BY gcos DESC, nbr ASC) AS grn
                 FROM gp) WHERE grn <= 8),
        q AS (SELECT embedding AS qe, nrm AS qn FROM e2 WHERE vec_id = 0),
        b0 AS (SELECT vec_id, cos FROM (
                 SELECT en.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                 FROM en JOIN e2 e USING (vec_id), q)
               ORDER BY cos DESC, vec_id ASC LIMIT 32),
        n1 AS (SELECT DISTINCT vec_id FROM (
                 SELECT vec_id FROM b0
                 UNION ALL SELECT gr.nbr FROM b0 JOIN gr ON b0.vec_id = gr.src)),
        b1 AS (SELECT vec_id, cos FROM (
                 SELECT n1.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                 FROM n1 JOIN e2 e USING (vec_id), q)
               ORDER BY cos DESC, vec_id ASC LIMIT 32),
        n2 AS (SELECT DISTINCT vec_id FROM (
                 SELECT vec_id FROM b1
                 UNION ALL SELECT gr.nbr FROM b1 JOIN gr ON b1.vec_id = gr.src)),
        b2 AS (SELECT vec_id, cos FROM (
                 SELECT n2.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                 FROM n2 JOIN e2 e USING (vec_id), q)
               ORDER BY cos DESC, vec_id ASC LIMIT 32)"""

  /** DuckDB CTE chain for the IVF probe path (seed centroids = first
    * 16 vecs by id, nProbe 4): shared by q_ann_ivf and q_ann_recall.
    */
  private lazy val ivfCtes: String =
    s"""e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
        q AS (SELECT embedding AS qe, nrm AS qn FROM e2 WHERE vec_id = 0),
        c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
              FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
        asg AS (SELECT vec_id, embedding, nrm, cid AS centroid_id FROM (
                  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
                         row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                  FROM e2 e CROSS JOIN c)
                WHERE rn = 1),
        probes AS (SELECT c.cid FROM c, q
                   ORDER BY ${cosNSql(dotSql("c.ce", "q.qe"), "c.cn", "q.qn")} DESC, c.cid ASC LIMIT 4),
        ivf_scored AS (SELECT a.vec_id, round(${cosNSql(dotSql("a.embedding", "q.qe"), "a.nrm", "q.qn")}, 6) AS cos
                       FROM asg a, q WHERE a.centroid_id IN (SELECT cid FROM probes))"""

  /** DuckDB: md5-derived random-hyperplane value in [-1, 1] for LSH
    * plane `b`, dimension `i` (lambda vars in the q_ann_lsh oracle) —
    * replays Similarity.lshPlaneValue bit-for-bit.
    */
  private val lshPlaneSql =
    """((('0x' || substr(md5('lsh:' || CAST(b AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
        / 1152921504606846976.0) * 2 - 1)"""

  /** DuckDB: per-dimension Lloyd means — exact decimal(27,18) sums
    * (order-independent, same quantization Spark applies) divided AS
    * DOUBLES (mirrors kmeansCentroids' sum.cast(double)/count).
    */
  private val kmeansMeanSql = (1 to 64)
    .map(d => s"CAST(sum(CAST(CAST(embedding[$d] AS DOUBLE) AS DECIMAL(27,18))) AS DOUBLE) / count(*) AS m$d")
    .mkString(", ")

  /** DuckDB: refined centroid elements; empty clusters keep their
    * seed (kmeansCentroids' means.getOrElse(i, prev)).
    */
  private val kmeansNewCentroidSql = (1 to 64)
    .map(d => s"COALESCE(m.m$d, CAST(c.ce[$d] AS DOUBLE))")
    .mkString(", ")

  /** DuckDB CTE chain replaying pqCodebooks + pqTopK bit-for-bit:
    * per subvector s — seed book = first-16 slices, one Lloyd round
    * (argmin cw·cw − 2·sub·cw, decimal-sum means, empty keeps seed),
    * final codes against the refined book, ADC lookup ||q_s − cw||²
    * elementwise — then a 200-candidate shortlist by ADC and
    * exact-cosine top-20 rerank. m=8 × subDim=8 × K=16, iters=1 (the
    * recall-tuned grid pqSqlBuilder ships).
    */
  private lazy val pqSql: String = pqSqlBuilder(withIvf = false)

  /** Same chain with the IVF coarse filter composed in (q_ann_ivfpq):
    * coarse centroids = the same first-16 seeds, cosine argmax
    * bucket per vector, ADC only over the nProbe=4 probed buckets.
    */
  private lazy val ivfPqSql: String = pqSqlBuilder(withIvf = true)

  /** Recall@20 of the PQ path against brute force (q_ann_pq_recall). */
  private lazy val pqRecallSql: String = pqSqlBuilder(withIvf = false, recall = true)

  private def pqSqlBuilder(withIvf: Boolean, recall: Boolean = false): String = {
    // m=8 × subDim=8 × K=16 with rerank=200: the quantization grid a
    // recall sweep at sf0.1 selected (m=4/rerank=40 gave recall@20
    // 0.2; 8×8 codes + a 200-candidate rerank reach ≈0.9+ while the
    // ADC scan still reads only code bytes)
    val m = 8; val subDim = 8; val kk = 16
    def sliceD(src: String, s: Int) =
      s"list_transform(range(${s * subDim + 1}, ${s * subDim + subDim + 1}), i -> CAST($src[i] AS DOUBLE))"
    def dotL(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${subDim + 1}), i -> $x[i] * $y[i]))"
    val perS = (0 until m).map { s =>
      val meanCols = (0 until subDim)
        .map(d => s"CAST(sum(CAST(sub[${d + 1}] AS DECIMAL(27,18))) AS DOUBLE) / count(*) AS m$d")
        .mkString(", ")
      val coalesce = (0 until subDim)
        .map(d => s"COALESCE(m.m$d, b.cw[${d + 1}])").mkString(", ")
      s"""sb$s AS (SELECT cid, ${sliceD("embedding", s)} AS cw FROM seeds),
          a$s AS (SELECT vec_id, cid FROM (
                    SELECT e.vec_id, b.cid,
                           row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY ${dotL("b.cw", "b.cw")} - 2 * ${dotL(s"${sliceD("e.embedding", s)}", "b.cw")} ASC, b.cid ASC) AS rn
                    FROM ev e CROSS JOIN sb$s b) WHERE rn = 1),
          m$s AS (SELECT cid, $meanCols
                  FROM (SELECT a.cid, ${sliceD("e.embedding", s)} AS sub
                        FROM a$s a JOIN ev e USING (vec_id))
                  GROUP BY cid),
          nb$s AS (SELECT b.cid, list_value($coalesce) AS cw
                   FROM sb$s b LEFT JOIN m$s m ON b.cid = m.cid),
          c$s AS (SELECT vec_id, cid AS code FROM (
                    SELECT e.vec_id, n.cid,
                           row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY ${dotL("n.cw", "n.cw")} - 2 * ${dotL(s"${sliceD("e.embedding", s)}", "n.cw")} ASC, n.cid ASC) AS rn
                    FROM ev e CROSS JOIN nb$s n) WHERE rn = 1),
          d$s AS (SELECT n.cid,
                         list_sum(list_transform(range(1, ${subDim + 1}),
                           i -> (qq.qs[i] - n.cw[i]) * (qq.qs[i] - n.cw[i]))) AS dist
                  FROM nb$s n, (SELECT ${sliceD("qe", s)} AS qs FROM q) qq)"""
    }.mkString(",\n")
    val joins = (0 until m)
      .map(s => s"JOIN c$s ON c$s.vec_id = e.vec_id JOIN d$s ON d$s.cid = c$s.code").mkString(" ")
    val adcSum = (0 until m).map(s => s"d$s.dist").mkString(" + ")
    val ivfCte = if (!withIvf) "" else
      s""",
        cnorm AS (SELECT cid, embedding AS ce, ${dotSql("embedding", "embedding")} AS cn FROM seeds),
        evn AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM ev),
        qn AS (SELECT qe, ${dotSql("qe", "qe")} AS qnrm FROM q),
        asgc AS (SELECT vec_id, cid AS bucket FROM (
                   SELECT e.vec_id, c.cid,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                   FROM evn e CROSS JOIN cnorm c) WHERE rn = 1),
        probes AS (SELECT c.cid FROM cnorm c, qn
                   ORDER BY ${cosNSql(dotSql("c.ce", "qn.qe"), "c.cn", "qn.qnrm")} DESC, c.cid ASC LIMIT 4)"""
    val estFilter = if (!withIvf) "" else
      " JOIN asgc ON asgc.vec_id = e.vec_id WHERE asgc.bucket IN (SELECT cid FROM probes)"
    val tail = if (!recall)
      s"""SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
       FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 20"""
    else
      s""", pq_k AS (SELECT vec_id FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 20),
          bf_k AS (SELECT vec_id FROM (
                     SELECT e.vec_id, round(${cosSql("e.embedding", "q.qe")}, 6) AS cos FROM ev e, q)
                   ORDER BY cos DESC, vec_id ASC LIMIT 20),
          ov AS (SELECT CAST(count(*) AS INT) AS n_overlap FROM bf_k JOIN pq_k USING (vec_id))
         SELECT n_overlap, round(CAST(n_overlap AS DOUBLE) / 20, 6) AS recall FROM ov"""
    val sep = if (recall) "" else "\n       "
    s"""WITH ev AS (SELECT vec_id, embedding FROM embeddings),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding
                  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $kk)),
        $perS$ivfCte,
        est AS (SELECT e.vec_id, $adcSum AS adc FROM ev e $joins$estFilter),
        cand AS (SELECT vec_id FROM est ORDER BY adc ASC, vec_id ASC LIMIT 200),
        scored AS (SELECT e.vec_id, round(${cosSql("e.embedding", "q.qe")}, 6) AS cos
                   FROM ev e JOIN cand USING (vec_id), q)$sep$tail"""
  }

  /** DuckDB CTE: distinct 3-gram shingle list per doc. */
  private val shinglesSql =
    """shing AS (SELECT doc_id, lang,
                        list_distinct(list_transform(
                          range(1, greatest(len(toks) - 2, 1) + 1),
                          i -> array_to_string(toks[i:i+2], ' '))) AS sh
                 FROM (SELECT doc_id, lang,
                              list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
                       FROM documents))"""

  /** DuckDB CTEs for the CCNet transfer-LM score (fit on the English
    * slice, score all docs) — shared by q_ppl_transfer and
    * q_ppl_buckets. Starts after WITH; ends with the `scored` CTE.
    */
  private val pplTransferCtes =
    """tkall AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents),
          tkref AS (SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
                    FROM documents WHERE lang = 'en'),
          ev AS (SELECT doc_id, t[i-1] AS prev, t[i] AS cur
                 FROM tkall, unnest(range(2, len(t) + 1)) AS u(i) WHERE len(t) >= 2),
          evref AS (SELECT t[i-1] AS prev, t[i] AS cur
                    FROM tkref, unnest(range(2, len(t) + 1)) AS u(i) WHERE len(t) >= 2),
          toks AS (SELECT tok AS token FROM tkref, unnest(t) AS u(tok)),
          counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          tot AS (SELECT sum(cnt) AS total FROM counts),
          vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 25),
          bgtop AS (SELECT prev, cur, count(*) AS bg_cnt FROM evref GROUP BY prev, cur
                    ORDER BY bg_cnt DESC, prev, cur LIMIT 50),
          scored AS (SELECT ev.doc_id,
                            CAST(CASE WHEN bg.bg_cnt IS NOT NULL AND vp.cnt IS NOT NULL
                                      THEN ln(CAST(bg.bg_cnt AS DOUBLE) / vp.cnt)
                                      ELSE ln(0.4 * (CASE WHEN vc.cnt IS NOT NULL
                                                          THEN CAST(vc.cnt AS DOUBLE) ELSE 0.5 END) / total)
                                 END AS DECIMAL(27,18)) AS lp
                     FROM ev LEFT JOIN bgtop bg USING (prev, cur)
                             LEFT JOIN vocab vp ON ev.prev = vp.token
                             LEFT JOIN vocab vc ON ev.cur = vc.token
                             CROSS JOIN tot)"""

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
  def entry(spark: SparkSession): DataFrame = entryOn(spark, "/root/testdata/sf0.001")

  /** The FULL profiler cascade at an arbitrary scale factor — Bench
    * times this as `cascade_e2e`: sample → spec synthesis (mock LLM)
    * → gold-on-sample → scoring/top-k → whole-lake codegen'd APPLY →
    * vote → pivot. The lake derives field-line content from the
    * documents table so synthesis/extraction are non-degenerate
    * (FieldLine specs really fire on every doc).
    */
  def cascadeOn(spark: SparkSession, dir: String): DataFrame = {
    val prof = new graft.api.Profiler(
      spark,
      MockLlmClient(),
      graft.api.ProfilerConfig(chunkSize = 1000, trainSize = 10))
    prof.run(fieldLineLake(spark, dir), Seq("topic", "source"))
  }

  /** The documents table rendered as a field-line lake — the corpus
    * shape cascadeOn/openieOn/tokenCostOn share.
    */
  private def fieldLineLake(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id").cast("string").as("path"),
      concat(
        lit("topic: "), element_at(split(col("text"), " "), 1),
        lit("\nsource: "), col("source"),
        lit("\n"), col("text")).as("content"))

  /** The cascade's token economics, measured (`main.py:25-26,97-98`,
    * `run_profiler.py:477-488` — the reference threads
    * `total_tokens_prompted` through every stage because the 110×
    * Code+-vs-Direct token reduction is its headline claim). Runs the
    * ClosedIE cascade with a [[graft.extract.TokenLedger]], then the
    * Direct baseline (LLM on EVERY (chunk, attribute) pair of the
    * WHOLE lake — `main.py:71` passes file2chunks unfiltered when
    * use_retrieval_model=False) on the same lake and attributes, and
    * returns the per-stage cost relation. The shape
    * that must hold at 100 TB: every cascade stage's tokens are
    * sample-bounded (∝ trainSize docs), `apply_lake` is ZERO, and
    * `direct_whole_lake` grows with the lake — so the ratio
    * direct/cascade grows without bound as the lake does.
    */
  def tokenCostOn(spark: SparkSession, dir: String): DataFrame = {
    val ledger = new graft.extract.TokenLedger(spark.sparkContext)
    val lake   = fieldLineLake(spark, dir)
    val prof = new graft.api.Profiler(
      spark,
      MockLlmClient(),
      graft.api.ProfilerConfig(chunkSize = 1000, trainSize = 10),
      Some(ledger))
    prof.run(lake, Seq("topic", "source")).count() // materialize: accumulators fill on execution
    // Both Direct legs run on the SAME chunk table at chunkSize 128
    // (bench docs are ~300 chars, so ~3 chunks/doc) and mirror the
    // reference exactly: Direct with use_retrieval_model=False prompts
    // EVERY (chunk, attribute) pair — `new_file_chunk_dict =
    // file2chunks`, main.py:71 — with NO keyword filter, while the
    // retrieval leg prompts exactly ONE chunk per (file, attribute).
    // The measured saving is therefore chunks-per-doc AT BENCH SF
    // (r11 ran both legs single-chunk-filtered at chunkSize 1000,
    // which collapsed the two totals to equality — key_note'd).
    val directChunks = Chunker.chunkAuto(lake, "path", "path", "content", 128)
    val attrs        = spark.createDataFrame(Seq("topic", "source").map(Tuple1(_))).toDF("attribute")
    DirectExtract(
      directChunks.crossJoin(broadcast(attrs))
        .select(col("path"), col("attribute"), col("chunk")),
      ledger.wrap(MockLlmClient(), "direct_whole_lake"),
      "path").count()
    // the middle cost point: retrieval-augmented Direct prompts ONE
    // chunk per (file, attribute) — lake-proportional like Direct, but
    // divided by chunks-per-doc (main.py:52-99 use_retrieval_model)
    val retrProf = new graft.api.Profiler(
      spark,
      MockLlmClient(),
      graft.api.ProfilerConfig(chunkSize = 128, trainSize = 10),
      Some(ledger))
    val first = docs(spark, dir).orderBy(col("doc_id")).limit(1)
      .select(element_at(split(col("text"), " "), 1).as("topic"), col("source"))
      .head()
    retrProf.directExtractRetrieval(
      directChunks,
      Seq("topic" -> first.getString(0), "source" -> first.getString(1)),
      graft.extract.MockEncoderClient()).count()
    ledger.report(spark)
  }

  /** ClosedIE cascade over an HTML lake at an arbitrary scale factor —
    * the reference's flagship corpus shape (SWDE HTML lakes,
    * `run.sh:4-27`): every document rendered as a page with the
    * derived fields in `<title>` / `<meta>` tags, so the cascade must
    * route through the html chunker and synthesize HtmlSelector specs.
    * Bench times this as `html_cascade_e2e`.
    */
  def htmlCascadeOn(spark: SparkSession, dir: String): DataFrame = {
    val lake = docs(spark, dir).select(
      concat(col("doc_id").cast("string"), lit(".html")).as("path"),
      concat(
        lit("<html>\n<head>\n<title>"), element_at(split(col("text"), " "), 1), lit("</title>\n"),
        lit("<meta name=\"source\" content=\""), col("source"), lit("\">\n"),
        lit("</head>\n<body>\n"), col("text"), lit("\n</body>\n</html>")).as("content"))
    val prof = new graft.api.Profiler(
      spark,
      MockLlmClient(),
      graft.api.ProfilerConfig(chunkSize = 200, trainSize = 10))
    prof.run(lake, Seq("title", "source"))
  }

  /** OpenIE end-to-end at an arbitrary scale factor — the full
    * schema-id fan-out the reference calls Evaporate's headline mode
    * (`schema_identification.py:14-87` → rerank → per-attribute
    * cascades → `check_remove_attribute`): no attribute list is
    * given, so the profiler must DISCOVER the schema from sample
    * chunks before the cascade runs. Bench times this as
    * `openie_e2e`, giving the discovery path a tracked wall-time
    * (cascade_e2e covers ClosedIE only).
    */
  /** Batch-retrieval spine at the bench SF (`retrieval_e2e`) — the
    * CANONICAL serving shape since round 9 (VERDICT r8 #6): a query
    * TABLE served by the one-scan batch operator `ivfPqTopKBatch` —
    * ONE coarse+PQ fit, one corpus encode, then corpus rows pair only
    * with the queries probing their bucket (n × Q·nProbe/nCentroids
    * pair rows), per-query rank windows. At 100 TB this is the
    * deployed ANN server: the whole query batch costs one scan of
    * code bytes, not one plan branch per query.
    */
  def retrievalOn(spark: SparkSession, dir: String): DataFrame = {
    import graft.textops.Similarity
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toSeq)
      .toSeq
    Similarity.ivfPqTopKBatch(emb, "vec_id", "embedding", queries,
      k = 5, nCentroids = 16, nProbe = 4, m = 8, codeK = 16, iters = 1, rerank = 200)
  }

  /** The per-query plan-loop alternative [[retrievalOn]] replaced —
    * kept ONLY as the A/B comparator (EntrySpec + TextOpsSpec's
    * batch-equality spec): 8 `pqTopKFromCodes` branches over one
    * cached code column, unioned. Benched at 2.7 s vs the batch
    * path's 1.7 s at sf0.1 in round 8 — the loop's cost is one scan
    * per query, which is why it is no longer the serving entry.
    */
  def retrievalLoopOn(spark: SparkSession, dir: String): DataFrame = {
    import graft.textops.Similarity
    val emb   = Tables.embeddings(spark, dir)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books, m = 8).cache()
    val qs = emb.filter(col("vec_id") < 8)
      .orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toSeq)
    qs.map { case (qid, q) =>
      Similarity.pqTopKFromCodes(codes, emb, "vec_id", "embedding", q, books,
          k = 5, m = 8, codeK = 16, rerank = 200)
        .withColumn("query_id", lit(qid))
    }.reduce(_.unionByName(_))
  }

  /** The COMPOSED training-data curation pipeline at an arbitrary
    * scale factor — Bench times this as `curation_e2e`: the path a
    * pretraining corpus actually takes, as ONE plan instead of six
    * unit queries. quality rules (per-row expressions, filter pushes
    * to the scan) → exact dedup (one hash agg + semi-join) →
    * duplicate-SPAN removal (Lee et al. ExactSubstr — winnowing
    * postings + token-verified splice; later copies lose shared
    * ≥50-token runs, downstream consumes the cleaned text) →
    * Bloom-prefiltered decontamination vs a held-out eval slice
    * (broadcast ~bits/entry filter, exact confirm on the sliver) →
    * language-ID (per-row marker vote) → sequence packing (one
    * window shuffle keyed by predicted lang) → shard assignment.
    * Nothing shuffles on anything wider than a content key, (lang),
    * or (shard). Output: one row per surviving doc with its pack and
    * shard coordinates.
    *
    * Cache lifecycle: the two persisted intermediates (deduped /
    * despanned text — doc-count-sized) are scoped to THIS call: the
    * final coordinate relation is eagerly materialized
    * (localCheckpoint cuts the lineage back to it), then both are
    * unpersisted before returning — nothing of THEIRS outlives the
    * call in the SQL cache manager. What DOES outlive it is the
    * checkpoint's own block set (coordinate rows only, orders of
    * magnitude smaller than the text it replaces), which lives on
    * the RDD storage path — `spark.catalog.clearCache()` does not
    * touch it; it is reclaimed by the ContextCleaner once the
    * returned handle is dropped.
    */
  def curationOn(spark: SparkSession, dir: String): DataFrame = {
    import graft.textops.{Curation, Dedup, TextStats}
    val d = docs(spark, dir)
    // quality gate — flags are per-row expressions over the scan
    val quality = Curation.qualityRuleFlags(d, "doc_id", "text",
      minTokens = 20, maxTokens = 100000, minMeanLen = 2.0, maxMeanLen = 10.0)
    val kept = d.join(quality.filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
    // exact dedup — first copy per content hash survives. PERSISTED:
    // the span machinery reads its input from several subplans
    // (fingerprints, the two token-array join sides, the splice),
    // each of which would otherwise re-run the scan → quality →
    // semi-join lineage; doc-count-sized text, evictable
    val deduped = Dedup.exactDedup(kept, "doc_id", "text").persist()
    // duplicate-SPAN removal (Lee et al. ExactSubstr): ≥50-token runs
    // shared with an earlier survivor are spliced out of later
    // copies; downstream stages consume the CLEANED text. Persisted
    // for the same reason: the decontam Bloom build is an EAGER
    // count, then the corpus side and the final plan read it again
    val despanned = Dedup.removeDuplicateSpans(deduped, "doc_id", "text", minTokens = 50)
      .select(col("doc_id"), col("clean_text").as("text"))
      .persist()
    // decontamination — every 89th doc plays the held-out eval suite
    val contaminated = Curation.decontaminateBloom(
        despanned.filter(col("doc_id") % 89 =!= 0), d.filter(col("doc_id") % 89 === 0),
        "doc_id", "text", n = 3)
      .select(col("doc_id")) // any surviving row has eval-gram overlap
    val clean = despanned
      .filter(col("doc_id") % 89 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // language-ID → packing partitions on the PREDICTED language.
    // The tokens column is BOUND once (langIdFromTokens references it
    // in one lambda per marker — an unbound subtree would re-split
    // the document per reference), and the shard coordinates are
    // computed IN the same lineage (a shardAssign(clean) branch would
    // re-run the whole quality→dedup→decontam prefix under a second,
    // column-pruned subplan that exchange reuse cannot collapse).
    val langed = clean
      .withColumn("toks", Dedup.tokensCol(lower(col("text"))))
      .withColumn("pred_lang", TextStats.langIdFromTokens(col("toks"), LangMarkers))
      .drop("toks")
    val packed = Curation.packSequences(langed, "doc_id", "text", Seq("pred_lang"), maxTokens = 64)
    val sharded = packed
      .withColumn("h", Dedup.hash60(concat(lit("shard#"), col("doc_id").cast("string"))))
      .withColumn("shard", (col("h") % 16).cast("int"))
      .withColumn(
        "pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))))
    val out = sharded.select(
      col("doc_id"), col("pred_lang"), col("n_tok"),
      col("pack_id"), col("pack_offset"), col("shard"), col("pos"))
    try out.localCheckpoint(true)
    finally {
      deduped.unpersist(blocking = false)
      despanned.unpersist(blocking = false)
    }
  }

  def openieOn(spark: SparkSession, dir: String): DataFrame = {
    val lake = fieldLineLake(spark, dir)
    val prof = new graft.api.Profiler(
      spark,
      MockLlmClient(),
      graft.api.ProfilerConfig(chunkSize = 1000, trainSize = 10))
    prof.run(lake)
  }

  /** Flagship spine at an arbitrary scale factor — Bench times this
    * at the bench SF as `entry_e2e` so the end-to-end path (not just
    * its unit queries) has a tracked wall-time.
    */
  def entryOn(spark: SparkSession, dir: String): DataFrame = {
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

  /** Retrieval-augmented Evaporate-Direct at an arbitrary scale
    * factor — Bench times this as `direct_retrieval_e2e`
    * (`main.py:52-99` use_retrieval_model=True + `retrieval.py:31-36`
    * as ONE plan): embed every chunk once, retrieve the top-1 chunk
    * per (file, attribute) by cosine to the attribute's baseline
    * sentence, prompt ONLY that chunk. The attribute seeds play the
    * reference's `gold[attribute]` — one representative gold value
    * per attribute, drawn deterministically from the first document.
    */
  def directRetrievalOn(spark: SparkSession, dir: String): DataFrame = {
    import graft.extract.MockEncoderClient
    val lake = fieldLineLake(spark, dir)
    val prof = new graft.api.Profiler(
      spark,
      MockLlmClient(),
      graft.api.ProfilerConfig(chunkSize = 1000, trainSize = 10))
    val first = docs(spark, dir).orderBy(col("doc_id")).limit(1)
      .select(element_at(split(col("text"), " "), 1).as("topic"), col("source"))
      .head()
    val seeds = Seq("topic" -> first.getString(0), "source" -> first.getString(1))
    prof.directExtractRetrieval(prof.prepare(lake), seeds, MockEncoderClient())
  }

  /** Spec-gated compression-ratio quality signal surfaced to Bench
    * (no DuckDB oracle is possible — the oracle has no deflate):
    * timing + row count only, as `compression_ratio`.
    */
  def compressionRatioOn(spark: SparkSession, dir: String): DataFrame =
    graft.textops.TextStats.compressionRatio(docs(spark, dir), "doc_id", "text")

  /** Spec-gated MMR diversified serving surfaced to Bench
    * (`mmr_rerank`; the greedy loop is sequential-by-definition, so
    * no SQL oracle): distributed relevance scan + TakeOrdered 100
    * candidates, driver-side greedy top-20.
    */
  def mmrRerankOn(spark: SparkSession, dir: String): DataFrame =
    Similarity.mmrRerank(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      queryVec(spark, dir), k = 20, candN = 100)

  /** Spec-gated index-maintenance recall-drift gauge surfaced to
    * Bench (`ann_recall_gauge`, r16 VERDICT #7): the periodic
    * monitoring twin for pqEncodeStream — probeN sampled queries
    * answered by batched PQ-ADC and batched brute force in one scan
    * each, aggregated to (n_probes, mean_recall, min_recall). Times
    * the full fit→encode→gauge composition at bench SF.
    */
  def recallGaugeOn(spark: SparkSession, dir: String): DataFrame = {
    val emb   = Tables.embeddings(spark, dir)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books, m = 8, codeK = 16)
    Similarity.pqRecallGauge(
      codes, emb, "vec_id", "embedding", books,
      k = 20, m = 8, codeK = 16, rerank = 200, probeN = 8)
  }

  /** Spec-gated unigram-LM tokenizer training surfaced to Bench
    * (`unigram_train`; the Viterbi-EM loop is driver-side by design,
    * no SQL oracle): one corpus word-table job + in-JVM EM/prune,
    * returned as a (piece, logp) frame so evalAll times the whole
    * train.
    */
  def unigramTrainOn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.textops.Unigram.train(docs(spark, dir), "text", vocabSize = 64, maxLen = 6)
      .toDF("piece", "logp")
  }

  /** Spec-gated PCA whitening surfaced to Bench (`pca_whiten`; no
    * DuckDB oracle — the eigendecomposition has no SQL counterpart):
    * one treeAggregate moment pass + shuffle-free whitening apply,
    * evaluated over all vectors.
    */
  def pcaWhitenOn(spark: SparkSession, dir: String): DataFrame =
    Similarity.pcaWhiten(Tables.embeddings(spark, dir), "embedding", "white", dim = 64)
      .select(col("vec_id"), col("white"))

  /** Spec-gated Z-order layout sink surfaced to Bench (`zorder_sink`):
    * writes the documents relation Morton-ordered on (n_chars, doc_id)
    * — quantize to rank cuts + interleave + ONE range shuffle — and
    * returns the rows written, so the write path itself (not a scan
    * proxy) owns the timing.
    */
  def zOrderWriteOn(spark: SparkSession, dir: String, outDir: String): Long = {
    val d = docs(spark, dir).select(col("doc_id"), col("n_chars"), col("lang"))
    graft.lake.Sinks.writeZOrdered(d, outDir, Seq("n_chars", "doc_id"), bits = 8, nFiles = 16)
    spark.read.parquet(outDir).count()
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

    // D9 inverse: melt the wide view back to the long relation
    // (unpivot — pure Expand, zero shuffles past the pivot input)
    "q_unpivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .count()
      val filled = types.foldLeft(wide) { case (df, t) => df.withColumn(t, coalesce(col(t), lit(0L))) }
      StructuredView.meltView(filled, "user_id", types, attrName = "event_type", valueName = "n")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // training-data ops: curriculum buckets — per-lang ntile quartiles
    // over (n_chars desc, doc_id): the deterministic data-layout step
    // of curriculum training
    "q_curriculum" -> ((s, dir) =>
      Sampling.curriculumBuckets(docs(s, dir), "lang", "n_chars", "doc_id", nBuckets = 4)
        .orderBy(col("lang"), col("doc_id"))),

    // §2.5 text-F1: per-pair SQuAD token F1 (evaluate_profiler.py:81-153)
    // — native Catalyst expression (codegen path; semantics identical
    // to Score.tokenF1, asserted by TokenF1ExprSpec)
    "q_text_f1" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), firstWords(8).as("pred"), firstWords(10).as("gold"))
        .select(
          col("doc_id"),
          round(graft.expressions.TokenF1.tokenF1(s, col("pred"), col("gold")), 6).as("f1"))
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

    // §2.11 logistic-regression aggregator: relational feature build
    // (methods.py:884-953) — vote vector + pairwise interactions per
    // doc, long form; the fit itself is driver-side (LabelModelSpec)
    "q_lr_features" -> ((s, dir) =>
      LabelModel
        .lrFeatures(binaryVotes(s, dir), "doc_id", Seq("v1", "v2", "v3"))
        .orderBy(col("doc_id"), col("feature"))),

    // §2.11 data_programming sufficient statistics (methods.py:786-880)
    // — the one lake-scale aggregation the EM fit consumes
    "q_dp_patterns" -> ((s, dir) =>
      LabelModel
        .dpPatternCounts(binaryVotes(s, dir), "doc_id", Seq("v1", "v2", "v3"))
        .orderBy(col("v_v1"), col("v_v2"), col("v_v3"))),

    // §2.11 conditional entropy H(Y|votes) under the learned NB
    // posterior (conditional_entropy, methods.py:597-631)
    "q_cond_entropy" -> ((s, dir) => {
      val accs = LabelModel.accuracies(binaryVotes(s, dir), binaryGold(s, dir), "doc_id")
      LabelModel
        .conditionalEntropy(binaryVotes(s, dir), accs, "doc_id")
        .select(round(col("h_cond"), 6).as("h_cond"), col("n_docs"))
    }),

    // §2.11 conditional cross-entropy -1/n sum ln P(y_gold|votes)
    // (cross_entropy_conditional, methods.py:694-707)
    "q_cross_entropy" -> ((s, dir) => {
      val accs = LabelModel.accuracies(binaryVotes(s, dir), binaryGold(s, dir), "doc_id")
      LabelModel
        .crossEntropyConditional(binaryVotes(s, dir), binaryGold(s, dir), accs, "doc_id")
        .select(round(col("ce_cond"), 6).as("ce_cond"), col("n_docs"))
    }),

    // §2.11 H(Y | MV output) (conditional_entropy_mv, methods.py:669-692)
    "q_cond_entropy_mv" -> ((s, dir) =>
      LabelModel
        .conditionalEntropyMv(binaryVotes(s, dir), binaryGold(s, dir), "doc_id")
        .select(round(col("h_mv"), 6).as("h_mv"), col("n_docs"))),

    // §2.11 H(Y | WS output), posterior-weighted
    // (conditional_entropy_singleton, methods.py:632-667)
    "q_cond_entropy_singleton" -> ((s, dir) => {
      val accs = LabelModel.accuracies(binaryVotes(s, dir), binaryGold(s, dir), "doc_id")
      LabelModel
        .conditionalEntropySingleton(binaryVotes(s, dir), binaryGold(s, dir), accs, "doc_id")
        .select(round(col("h_singleton"), 6).as("h_singleton"), col("n_docs"))
    }),

    // §2.5 field frequency across docs (schema_identification.py:24,84)
    "q_field_count" -> ((s, dir) =>
      SchemaId.fieldCount(docFields(s, dir), "doc_id").orderBy(col("field"))),

    // §2.3 rank attributes, keep top-k (run_profiler.py:283-293)
    "q_rank_attributes" -> ((s, dir) =>
      SchemaId
        .rankAttributes(SchemaId.fieldCount(docFields(s, dir), "doc_id"), k = 10)
        .orderBy(col("rank"))),

    // §2.5 LLM-rerank vote merge arithmetic (schema_identification.py:131-230)
    "q_rerank_merge" -> ((s, dir) => {
      val counts = SchemaId.fieldCount(docFields(s, dir), "doc_id")
      val votes = SchemaId
        .fieldCount(docFields(s, dir).filter(col("doc_id") % 3 === 0), "doc_id")
        .select(col("field"), (col("n_docs") * 2).as("votes"))
      SchemaId
        .rerankMerge(counts, votes)
        .select(col("field"), col("n_docs"), col("votes"), round(col("merged"), 6).as("merged"))
        .orderBy(col("field"))
    }),

    // §2.5 schema-id eval@k (evaluate_synthetic.py:31-88)
    "q_schema_eval_at_k" -> ((s, dir) => {
      val counts = SchemaId.fieldCount(docFields(s, dir), "doc_id")
      val ranked = SchemaId.rankAttributes(counts, k = 1000000)
      val total  = docs(s, dir).count()
      val gold   = counts.filter(col("n_docs") >= 0.6 * total).select(col("field"))
      SchemaId
        .schemaEvalAtK(ranked, gold, Seq(1, 5, 10))
        .select(
          col("k"), col("n_hit"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"))
        .orderBy(col("k"))
    }),

    // §2.2 attribute dedup by name containment + equal metric (run_profiler.py:122-171)
    "q_attr_dedup" -> ((s, dir) =>
      SchemaId
        .attrDedup(
          SchemaId
            .fieldCount(docFields(s, dir), "doc_id")
            .select(col("field").as("attribute"), col("n_docs").as("metric")))
        .orderBy(col("attribute"))),

    // §2.2 attribute validity aggregates (profiler.py:49-112)
    "q_attr_validity_agg" -> ((s, dir) =>
      SchemaId
        .attrValidityAgg(
          events(s, dir).select(
            col("event_type").as("attribute"),
            floor(col("value") / 50).cast("long").cast("string").as("value")))
        .select(
          col("attribute"), col("n_distinct"), col("mode_val"),
          round(col("null_frac"), 6).as("null_frac"), col("drop_attr"))
        .orderBy(col("attribute"))),

    // §2.3 gold attributes ranked by non-null frequency (run_profiler.py:108-118)
    "q_gold_attr_rank" -> ((s, dir) =>
      SchemaId.goldAttrRank(triples(s, dir)).orderBy(col("rank"))),

    // §2.7 set intersection (evaluate_synthetic.py:14-28)
    "q_set_intersect" -> ((s, dir) => {
      val a = docs(s, dir).filter(col("doc_id") % 2 === 0).select(col("lang")).distinct()
      val b = docs(s, dir).filter(col("n_chars") % 2 === 0).select(col("lang")).distinct()
      a.intersect(b).orderBy(col("lang"))
    }),

    // §2.7 set difference — sources hosting English but no Chinese
    // (EXCEPT completes the union/intersect/distinct family)
    "q_set_except" -> ((s, dir) => {
      val a = docs(s, dir).filter(col("lang") === "en").select(col("source")).distinct()
      val b = docs(s, dir).filter(col("lang") === "zh").select(col("source")).distinct()
      a.except(b).orderBy(col("source"))
    }),

    // §2.4 attribute alias theta-join (evaluate_synthetic.py:349-382)
    "q_attr_alias_join" -> ((s, dir) => {
      val left  = events(s, dir).select(col("event_type").as("attr_a")).distinct()
      val right = events(s, dir).select(concat(col("event_type"), lit("s")).as("attr_b")).distinct()
      SchemaId.attrAliasJoin(left, right).orderBy(col("attr_a"), col("attr_b"))
    }),

    // §2.5 OpenIE set precision/recall/F1 (evaluate_synthetic.py:14-28)
    "q_openie_prf" -> ((s, dir) => {
      val keep = (df: DataFrame) => df.filter(length(col("value")) > 0)
      Harness
        .setPrf(keep(triples(s, dir)), keep(triples(s, dir, prefixLen = 200)), Seq("doc_id", "attribute", "value"))
        .select(
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"))
    }),

    // §2.5 head/tail + structured/unstructured attribute slices (evaluate_synthetic.py:272-308)
    "q_attr_slices" -> ((s, dir) =>
      Harness
        .attrSlices(triples(s, dir), docs(s, dir).count())
        .select(
          col("attribute"), col("n_docs"),
          round(col("coverage"), 6).as("coverage"),
          round(col("avg_len"), 6).as("avg_len"),
          col("head_attr"), col("structured"))
        .orderBy(col("attribute"))),

    // §2.3 dynamic backoff: chunk_id ≤ mean+stddev (schema_identification.py:26-44)
    "q_chunk_backoff" -> ((s, dir) =>
      Chunker
        .dynamicBackoff(chunks(s, dir), "doc_id")
        .select(col("doc_id"), col("chunk_id"))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // §2.8 cosine top-k retrieval baseline (retrieval.py:5-36)
    "q_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir), k = 20)),

    // ANN scale path: IVF-style probe-bucketed top-k. Deterministic
    // seed centroids + fixed probe list make even the approximate
    // path oracle-checkable (the DuckDB SQL replays the same
    // assignment/probe/argmax logic).
    "q_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir),
        k = 20, nCentroids = 16, nProbe = 4)),

    // ANN learned-index path: ONE deterministic Lloyd round refines
    // the seed centroids (decimal-exact sums → bit-stable means),
    // then the same probe/argmax serve path. Train AND serve both
    // replay in the DuckDB oracle — no rows-only escape hatch.
    "q_ann_kmeans" -> ((s, dir) => {
      val emb   = Tables.embeddings(s, dir)
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16, iters = 1, dim = 64)
      Similarity.ivfTopK(
        emb, "vec_id", "embedding", queryVec(s, dir),
        k = 20, nCentroids = 16, nProbe = 4, learnedCentroids = Some(cents))
    }),

    // ANN scale path #3: product quantization + asymmetric distance
    // (64 floats → 4 bytes per vector at memory scale) — Lloyd-fit
    // subvector codebooks, ADC candidate scan, exact-cosine rerank
    "q_ann_pq" -> ((s, dir) =>
      Similarity.pqTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir),
        k = 20, m = 8, codeK = 16, iters = 1, rerank = 200)),

    // PQ quality gauge: recall@20 of the ADC path vs brute force —
    // the number you check before trusting the compressed index
    "q_ann_pq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q   = queryVec(s, dir)
      Similarity.recallAtK(
        Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 20),
        Similarity.pqTopK(emb, "vec_id", "embedding", q, k = 20, m = 8, codeK = 16, iters = 1, rerank = 200),
        "vec_id", k = 20)
    }),

    // ANN scale path #4: the composed IVF-PQ production index —
    // coarse probe prunes to 4/16 buckets, ADC scores survivors
    "q_ann_ivfpq" -> ((s, dir) =>
      Similarity.ivfPqTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir),
        k = 20, nCentroids = 16, nProbe = 4, m = 8, codeK = 16, iters = 1, rerank = 200)),

    // ANN scale path #2: random-hyperplane LSH signatures with
    // multi-probe (Hamming ≤ 2), exact-cosine rerank of survivors
    "q_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir),
        k = 20, nBits = 6, maxHamming = 2)),

    // ANN quality gauge: recall@20 of the IVF probe path against the
    // brute-force exact top-20
    "q_ann_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q   = queryVec(s, dir)
      Similarity.recallAtK(
        Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 20),
        Similarity.ivfTopK(emb, "vec_id", "embedding", q, k = 20, nCentroids = 16, nProbe = 4),
        "vec_id", k = 20)
    }),

    // ANN quality gauge for the 1-bit tier: binary top-20 overlap
    // with the exact brute-force top-20 (sign patterns + rerank-40)
    "q_ann_binary_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q   = queryVec(s, dir)
      Similarity.recallAtK(
        Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 20),
        Similarity.binaryTopK(emb, "vec_id", "embedding", q, k = 20, rerank = 40),
        "vec_id", k = 20)
    }),

    // ANN serving tier #6: graph search over the bucket-bounded kNN
    // graph (HNSW layer 0 with one deterministic entry per coarse
    // bucket) — beam ef=32, 2 fixed expansion hops, exact-cosine
    // rescoring; completes the ladder binary → int8 → PQ → IVF-PQ →
    // graph
    "q_ann_graph" -> ((s, dir) =>
      Similarity.graphTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir),
        k = 20, ef = 32, hops = 2, knnK = 8)),

    // ANN quality gauge for the graph tier: top-20 overlap with the
    // exact brute-force top-20
    "q_ann_graph_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q   = queryVec(s, dir)
      Similarity.recallAtK(
        Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 20),
        Similarity.graphTopK(emb, "vec_id", "embedding", q, k = 20, ef = 32, hops = 2, knnK = 8),
        "vec_id", k = 20)
    }),

    // composed eval runner (evaluate_synthetic.main): schema-id@k +
    // ClosedIE token-F1 + OpenIE set-PRF with lenient aliasing and
    // gold-derived slices, over a synthetic run artifact built from
    // the documents table — pred 'topics' aliases onto gold 'topic'
    // (coverage gap on doc_id%3=0), snippet corrupted on %5=0,
    // 'lang_code' gold covered only on %4=0 (the tail slice), and a
    // hallucinated 'junk' attribute on %7=0 penalizing every slice
    "q_eval_e2e" -> ((s, dir) => {
      import s.implicits._
      val d    = docs(s, dir)
      val path = col("doc_id").cast("string").as("path")
      val w1   = element_at(split(col("text"), " "), 1)
      val snip = substring(col("text"), 1, 40)
      val gold = d
        .filter(length(w1) > 0)
        .select(path, lit("topic").as("attribute"), w1.as("value"))
        .unionByName(d.select(path, lit("snippet").as("attribute"), snip.as("value")))
        .unionByName(d.filter(col("doc_id") % 4 === 0)
          .select(path, lit("lang_code").as("attribute"), col("lang").as("value")))
      val pred = d
        .filter(col("doc_id") % 3 =!= 0 && length(w1) > 0)
        .select(path, lit("topics").as("attribute"), w1.as("value"))
        .unionByName(d.select(
          path, lit("snippet").as("attribute"),
          when(col("doc_id") % 5 === 0, lit("zzqx")).otherwise(snip).as("value")))
        .unionByName(d.filter(col("doc_id") % 7 === 0)
          .select(path, lit("junk").as("attribute"), lit("noise").as("value")))
      val ranked = Seq(("topic", 1), ("junk", 2), ("snippet", 3)).toDF("field", "rank")
      graft.api.Profiler.evaluateEndToEnd(ranked, pred, gold, ks = Seq(1, 3))
    }),

    // ANN quality gauge #3: the full IR-eval triple (P@20 / MRR /
    // NDCG@20) of the IVF probe path against the brute-force exact
    // ranking — position-weighted quality, not just set overlap
    "q_rank_metrics" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q   = queryVec(s, dir)
      Similarity.rankMetricsAtK(
        Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 20),
        Similarity.ivfTopK(emb, "vec_id", "embedding", q, k = 20, nCentroids = 16, nProbe = 4),
        "vec_id", k = 20)
    }),

    // embedding-curation: prototypicality pruning (SemDeDup-family,
    // Sorscher et al. 2022) — keep the top-4/5 of each cluster by
    // cosine-to-centroid, drop the outlier tail
    "q_proto_prune" -> ((s, dir) =>
      Similarity.prototypePrune(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCentroids = 16, keepNum = 4, keepDen = 5)
        .orderBy(col("centroid_id"), col("rank_in_cluster"))),

    // contriever-style mean pooling lifted to groups (retrieval.py:5-36)
    "q_embed_mean_pool" -> ((s, dir) =>
      Similarity.meanPool(Tables.embeddings(s, dir), "label", "embedding")
        .orderBy(col("label"), col("dim"))),

    // ANN memory path: int8 scalar quantization (FAISS-SQ8-style) —
    // quantized dot-product ranking with the exact cosine attached as
    // the rerank column; floor-based quantization replays in SQL
    "q_ann_int8" -> ((s, dir) =>
      Similarity.int8TopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir), k = 20)),

    // ANN memory path: binary (1-bit sign) quantization — 8 bytes a
    // vector, Hamming-distance candidates, exact-cosine rerank; the
    // cheapest serving tier after int8 and PQ
    "q_ann_binary" -> ((s, dir) =>
      Similarity.binaryTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir), k = 20, rerank = 40)),

    // density clustering: DBSCAN roles + clusters in embedding space
    // with the SemDeDup bucket bound (eps-pairs only within a coarse
    // centroid bucket); eps=0.3/minPts=3 splits this corpus 45 core /
    // border / noise non-trivially
    "q_dbscan" -> ((s, dir) =>
      Similarity.dbscanClusters(
          Tables.embeddings(s, dir), "vec_id", "embedding", eps = 0.3, minPts = 3)
        .orderBy(col("vec_id"))),

    // substrate op: bucket-bounded kNN graph (top-3 in-bucket
    // neighbors per vector) — WindowGroupLimit bounds the rank sort
    "q_knn_graph" -> ((s, dir) =>
      Similarity.knnGraph(Tables.embeddings(s, dir), "vec_id", "embedding", k = 3)
        .orderBy(col("vec_id"), col("nbr_rank"))),

    // semi-supervised: label propagation over the same eps-graph —
    // 10% deterministic seeds (vec_id % 10 == 0), 3 clamped rounds
    "q_label_prop" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val seeds = e.filter(col("vec_id") % 10 === 0).select(col("vec_id"), col("label"))
      Similarity.labelPropagation(e, "vec_id", "embedding", seeds, eps = 0.3, iters = 3)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup: cluster-bounded semantic dedup — the embedding-space
    // dedup that scales (pairs only within clusters). τ=0.35 sits at
    // the 99th pct of this synthetic corpus's within-cluster cosine
    // (max 0.49), so the verdict splits non-trivially.
    "q_semdedup" -> ((s, dir) =>
      Similarity.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding", tau = 0.35)),

    // SemDeDup at the SCALED shape (VERDICT r8 #4): centroids are
    // kmeans-LEARNED (one Lloyd round over 32 seeds, the q_ann_kmeans
    // fit) instead of the fixed 16 seeds, so max |cluster| stays
    // bounded as the corpus grows and the pair stage's input is
    // Σ|cluster|² ≈ N²/32 — the shape the operator runs at 100 TB
    // (paper: 50k clusters for LAION). TextOpsSpec asserts the
    // Σ|cluster|² bound and the equi-join plan on this exact config.
    "q_semdedup_scaled" -> ((s, dir) => {
      val emb     = Tables.embeddings(s, dir)
      val learned = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 32, iters = 1)
      Similarity.semDedup(emb, "vec_id", "embedding", tau = 0.35, nCentroids = 32, learnedCentroids = Some(learned))
    }),

    // hybrid retrieval: reciprocal-rank fusion of the lexical (BM25)
    // and dense (cosine) top-30 lists into a fused top-20
    "q_rrf_fusion" -> ((s, dir) => {
      val lex = TextStats
        .bm25TopK(docs(s, dir), "doc_id", "text", terms = Seq("spark", "data", "query"), k = 30)
        .select(col("doc_id"), col("rank"))
      val dense = Similarity
        .cosineTopK(Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir), k = 30)
        .select(col("vec_id").as("doc_id"), col("rank"))
      Similarity.rrfFusion(Seq(lex, dense), "doc_id", k = 20)
        .select(col("doc_id"), col("n_lists"), col("rrf"), col("rank"))
    }),

    // contrastive-training data prep: per-class hard negatives — the
    // 5 out-of-class vectors nearest to each class centroid
    "q_hard_negatives" -> ((s, dir) =>
      Similarity
        .hardNegatives(Tables.embeddings(s, dir), "label", "vec_id", "embedding", k = 5)
        .orderBy(col("neg_label"), col("rank"))),

    // §2.4 retrieval top-1 rank join per bucket (retrieval.py:31-36)
    "q_retrieval_top1" -> ((s, dir) =>
      Similarity
        .retrievalTop1(Tables.embeddings(s, dir), "label", "vec_id", "embedding", queryVec(s, dir))
        .orderBy(col("label"))),

    // training-data ops: embedding near-dup pairs within label buckets
    "q_dedup_embed_cosine" -> ((s, dir) =>
      Similarity
        .embeddingNearDupPairs(Tables.embeddings(s, dir), "label", "vec_id", "embedding")
        .orderBy(desc("cos"), col("id_a"), col("id_b"))
        .limit(20)),

    // training-data ops: exact dedup via content-hash groups
    "q_dedup_exact" -> ((s, dir) =>
      Dedup
        .exactDedupGroups(docs(s, dir), "doc_id", "text")
        .orderBy(col("content_hash"))),

    // training-data ops: n-gram Jaccard near-dup pairs (blocked on lang)
    "q_dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup
        .ngramJaccardPairs(docs(s, dir), "lang", "doc_id", "text", n = 3)
        .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
        .limit(20)),

    // training-data ops: Jaccard over the df-capped shingle space —
    // the hot-shingle guard (posting lists bounded by maxDf, so pair
    // fan-out per shingle is maxDf² regardless of lake size)
    "q_dedup_jaccard_capped" -> ((s, dir) =>
      Dedup
        .ngramJaccardPairsCapped(docs(s, dir), "lang", "doc_id", "text", n = 3, maxDf = 3)
        .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
        .limit(20)),

    // training-data ops: shingle CONTAINMENT pairs (Broder 1997's
    // asymmetric measure) — quote/subset detection Jaccard misses:
    // a short doc embedded in a long host scores ≈1 here, ≈0 there
    "q_dedup_containment" -> ((s, dir) =>
      Dedup
        .containmentPairs(docs(s, dir), "lang", "doc_id", "text", n = 3, maxDf = 3, minC = 0.3)
        .orderBy(desc("containment"), col("id_a"), col("id_b"))
        .limit(20)),

    // training-data ops: edit-distance VERIFICATION of sketch
    // candidates — the nominate→confirm pipeline shape: Levenshtein
    // runs ONLY on the df-capped candidate set, never all pairs
    "q_dedup_edit_verify" -> ((s, dir) =>
      Dedup.editVerifiedPairs(
          docs(s, dir), "lang", "doc_id", "text", n = 3, maxDf = 3,
          candJaccard = 0.2, minEditSim = 0.3)
        .orderBy(desc("edit_sim"), col("id_a"), col("id_b"))
        .limit(20)),

    // graph op: fixed-iteration PageRank over the near-dup graph —
    // centrality as the canonical-doc signal (who gets copied FROM);
    // per-node sums decimal-quantized so 3 power iterations replay
    // bit-for-bit in the oracle
    "q_pagerank_neardup" -> ((s, dir) => {
      val pairs = Dedup
        .ngramJaccardPairsCapped(docs(s, dir), "lang", "doc_id", "text", n = 3, maxDf = 3)
        .filter(col("jaccard") >= 0.2)
      Dedup.pageRankFixed(docs(s, dir).select(col("doc_id")), "doc_id", pairs, iters = 3)
        .orderBy(col("doc_id"))
    }),

    // training-data ops: near-dup clusters — connected components
    // over high-Jaccard pairs (the keep/drop resolution step after
    // pair generation; min-label propagation, O(diameter) rounds)
    "q_dedup_clusters" -> ((s, dir) =>
      Dedup
        .nearDupClusters(docs(s, dir), "lang", "doc_id", "text", n = 3, minJaccard = 0.5)
        .orderBy(col("doc_id"))),

    // the SAME clusters through the diameter-independent
    // large-star/small-star fallback (r16 VERDICT #4): the maxIter
    // escape hatch's labels get the identical recursive-CTE oracle
    // gate the path-halving default has, not just spec parity —
    // min-root star forests and min-label propagation both converge
    // to cluster_id = component minimum
    "q_dedup_clusters_star" -> ((s, dir) => {
      val pairs = Dedup
        .ngramJaccardPairs(docs(s, dir), "lang", "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.5)
      Dedup
        .connectedComponentsStar(docs(s, dir).select(col("doc_id")), "doc_id", pairs)
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy(col("doc_id"))
    }),

    // training-data ops: MinHash signatures + LSH band keys
    "q_dedup_minhash" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), Dedup.shinglesFast(col("text"), 3).as("sh"))
        .select(col("doc_id"), Dedup.minhashFast(col("sh"), 8).as("sig"))
        .select(
          col("doc_id"),
          array_join(col("sig"), ",").as("sig_str"),
          element_at(Dedup.lshBandKeys(col("sig"), 2, 4), 1).as("band_a"),
          element_at(Dedup.lshBandKeys(col("sig"), 2, 4), 2).as("band_b"))
        .orderBy(col("doc_id"))),

    // training-data ops: LSH band candidate pairs with the hot-band
    // df cap — a bucket of N identical docs with N > maxDf emits
    // zero pairs instead of N² (maxDf=3 exercises the cap at test SF)
    "q_lsh_pairs" -> ((s, dir) =>
      Dedup
        .minhashLshPairs(docs(s, dir), "doc_id", "text", shingleN = 3, numHashes = 8, bands = 2, maxDf = 3)
        .orderBy(col("id_a"), col("id_b"), col("band_idx"))),

    // training-data ops: SimHash banded blocking + exact Hamming
    // verify (Manku et al. WWW'07) — the pigeonhole nominate→confirm
    // pipeline; 16-bit width saturates on this tiny synthetic
    // vocabulary, so the gated card bounds output to the 50 closest
    // pairs (production width is 64-bit, same operator shape)
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashHammingPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy(col("hamming"), col("id_a"), col("id_b"))
        .limit(50)),

    // training-data ops: 16-bit SimHash fingerprints
    "q_dedup_simhash" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), Dedup.simhash16Fast(col("text")).as("simhash"))
        .orderBy(col("doc_id"))),

    // training-data ops: marker-based language ID
    "q_lang_id" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), Dedup.tokensCol(lower(col("text"))).as("toks"))
        .select(col("doc_id"), TextStats.langIdFromTokens(col("toks"), LangMarkers).as("pred_lang"))
        .orderBy(col("doc_id"))),

    // eval harness: language-ID confusion matrix — predicted vs
    // labeled language, the slice report a curation pipeline ships
    // with its lang filter
    "q_langid_confusion" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), Dedup.tokensCol(lower(col("text"))).as("toks"))
        .select(col("lang"), TextStats.langIdFromTokens(col("toks"), LangMarkers).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("pred_lang"))),

    // eval harness: MinHash sketch calibration — estimated vs exact
    // Jaccard on the top similar pairs (est error ~ 1/sqrt(numHashes))
    "q_minhash_est" -> ((s, dir) =>
      Dedup.minhashEstVsExact(docs(s, dir), "lang", "doc_id", "text", n = 3, numHashes = 8, k = 20)
        .orderBy(desc("jaccard"), col("id_a"), col("id_b"))),

    // training-data ops: quality features + composite score
    "q_quality_score" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("text"), Dedup.tokensCol(col("text")).as("toks"))
        .select(col("doc_id"), TextStats.qualityFeaturesFromTokens(col("text"), col("toks"), Stopwords).as("f"))
        .select(
          col("doc_id"),
          col("f").getField("n_tokens").as("n_tokens"),
          round(col("f").getField("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("f").getField("punct_ratio"), 6).as("punct_ratio"),
          round(TextStats.qualityScoreFromFeatures(col("f")), 6).as("quality"))
        .orderBy(col("doc_id"))),

    // training-data ops: corpus vocabulary top-k (one explode + hash
    // agg with map-side combine + k-row TakeOrdered)
    "q_vocab_topk" -> ((s, dir) =>
      TextStats.vocabTopK(docs(s, dir), "text", k = 50).orderBy(col("rank"))),

    // training-data ops: exact heavy hitters by the two-pass
    // Misra-Gries pattern — pass 1 one bounded-state sketch
    // aggregation (≤ 2·capacity entries shuffle per partition, never
    // the vocabulary), pass 2 exact re-count of the candidate
    // superset; output is exact, so the sketch's partitioning
    // nondeterminism never reaches the result
    "q_heavy_hitters" -> ((s, dir) =>
      TextStats.heavyHitters(docs(s, dir), "text", support = 0.033, capacity = 256)
        .orderBy(desc("cnt"), col("token"))),

    // training-data ops: deterministic stratified downsampling —
    // md5-derived keep decision (same rows on any cluster size or
    // engine), per-lang rates rebalance the corpus
    "q_stratified_sample" -> ((s, dir) =>
      Sampling
        .stratifiedSample(docs(s, dir), "lang", "doc_id", Map("en" -> 25, "zh" -> 60))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // training-data ops: weighted sampling without replacement
    // (Efraimidis–Spirakis log-key form) — sample long docs
    // proportionally to n_chars, deterministic, one projection +
    // TakeOrdered
    "q_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(docs(s, dir), "doc_id", "n_chars", k = 50)),

    // scale lever under the hash gate: two-phase salted count must be
    // RESULT-identical to the plain groupBy count it replaces (the
    // oracle runs the plain form)
    "q_skew_salted_count" -> ((s, dir) =>
      Skew
        .saltedCount(docs(s, dir).select(col("lang"), col("doc_id")), Seq("lang"), salts = 8)
        .orderBy(col("lang"))),

    // training-data ops: token repetition profile (boilerplate signal)
    "q_repetition" -> ((s, dir) =>
      TextStats.repetitionProfile(docs(s, dir), "doc_id", "text").orderBy(col("doc_id"))),

    // training-data ops: per-lang length stats with exact percentiles
    "q_length_stats" -> ((s, dir) =>
      TextStats.lengthStats(docs(s, dir), "lang", "text").orderBy(col("lang"))),

    // training-data ops: top-3 TF-IDF terms per doc (rank on the
    // ROUNDED score so cross-engine ln() ulp differences can't flip
    // the ordering)
    "q_tfidf_top_terms" -> ((s, dir) =>
      TextStats.tfidfTopTerms(docs(s, dir), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // training-data ops: deny-list/PII scrub (counts measured on the
    // original text, replacement applied in pattern order)
    "q_pii_scrub" -> ((s, dir) =>
      Curation.scrub(docs(s, dir), "doc_id", "text",
          patterns = Curation.defaultPatterns :+ ("deny" -> "\\bkey\\b"))
        .orderBy(col("doc_id"))),

    // training-data ops: Unicode NFC canonicalization (native
    // codegen'd expression — Spark has no built-in) so decomposed
    // and precomposed forms dedup/fingerprint/count identically
    "q_nfc_normalize" -> ((s, dir) => {
      val n = graft.expressions.NfcNormalize.nfcNormalize(s, col("text"))
      docs(s, dir)
        .select(col("doc_id"), n.as("norm_text"), (n =!= col("text")).cast("int").as("changed"))
        .orderBy(col("doc_id"))
    }),

    // training-data ops: benchmark decontamination — docs sharing a
    // word 3-gram with the held-out eval slice (doc_id % 97 == 0)
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.contaminatedDocs(
          d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // training-data ops: Bloom-prefiltered decontamination — the
    // eval-side-too-big-to-hash scale path (broadcast ~10-bit/entry
    // Bloom test map-side, exact semi-join only on the surviving
    // sliver); result is exact, FPs killed by the confirm join
    "q_decontam_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.decontaminateBloom(
          d.filter(col("doc_id") % 89 =!= 0), d.filter(col("doc_id") % 89 === 0),
          "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // training-data ops: fuzzy (MinHash-LSH) decontamination — catches
    // lightly-edited/truncated eval copies that verbatim gram overlap
    // under-reports; the eval fixture is an 80%-prefix copy of every
    // 83rd doc (an eval item excerpted from a training page), so each
    // planted item must resolve back to its source
    "q_decontam_fuzzy" -> ((s, dir) => {
      val d  = docs(s, dir)
      val tk = filter(split(col("text"), " "), t => length(t) > 0)
      val nk = greatest(floor(size(tk) * 4 / 5).cast("int"), lit(1))
      val ev = d.filter(col("doc_id") % 83 === 0)
        .select(col("doc_id"), array_join(slice(tk, lit(1), nk), " ").as("text"))
      // bands=4/rows=2: decontamination wants RECALL — more, narrower
      // bands raise P(candidate) at a given similarity (0.8-Jaccard
      // truncated copy: 1-(1-0.8²)⁴ ≈ 98% vs 65% at 2×4)
      Curation.decontaminateFuzzy(d, ev, "doc_id", "text",
          shingleN = 3, numHashes = 8, bands = 4, minJaccard = 0.3)
        .orderBy(col("doc_id"))
    }),

    // training-data ops: sequence packing — running-token-offset pack
    // assignment per language stream, 64-token context windows
    "q_seq_pack" -> ((s, dir) =>
      Curation.packSequences(docs(s, dir), "doc_id", "text", Seq("lang"), maxTokens = 64)
        .orderBy(col("doc_id"))),

    // training-data ops: C4-style cross-corpus paragraph dedup —
    // keep the globally-first occurrence of each pseudo-paragraph
    // (testdata has no newlines; real lakes use the "\n\n" default)
    "q_dedup_paragraph" -> ((s, dir) =>
      Curation.paragraphDedup(docs(s, dir), "doc_id", "text", sepRegex = " the ")
        .orderBy(col("doc_id"))),

    // shared-prefix clusters — the crawl-boilerplate signature the
    // exact/paragraph/shingle dedups all miss: docs opening with the
    // SAME first-8-token header (think injected site banners) group
    // on the prefix hash; one hash agg, emitted only where a cluster
    // forms. Output: (prefix_hash, n_docs, min_doc_id, prefix)
    "q_dedup_prefix" -> ((s, dir) => {
      val toks   = filter(split(col("text"), " "), t => length(t) > 0)
      val prefix = array_join(slice(toks, 1, 8), " ")
      docs(s, dir)
        .select(col("doc_id"), prefix.as("prefix"))
        .filter(size(filter(split(col("prefix"), " "), t => length(t) > 0)) >= 8)
        .groupBy(md5(col("prefix").cast("binary")).as("prefix_hash"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc_id"),
          min(col("prefix")).as("prefix"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("prefix_hash"))
    }),

    // training-data ops: DSIR importance weights — log-likelihood
    // ratio of target (lang='en') vs background unigram LMs, the
    // cheap "more data like this slice" selection filter
    "q_dsir_weight" -> ((s, dir) =>
      Curation.dsirWeights(docs(s, dir), "doc_id", "text",
          isTarget = col("lang") === "en", vocabK = 25)
        .orderBy(col("doc_id"))),

    // training-data ops: per-doc duplicate-n-gram fraction — the
    // corpus-overlap scalar near-dedup thresholds are calibrated on
    "q_dup_ngram_frac" -> ((s, dir) =>
      Curation.dupNgramFraction(docs(s, dir), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))),

    // training-data ops: per-doc n-gram novelty in ingestion order —
    // the freshness curve (first-appearance fraction per doc)
    "q_ngram_novelty" -> ((s, dir) =>
      Curation.ngramNovelty(docs(s, dir), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))),

    // corpus-drift card: pairwise Jensen–Shannon divergence between
    // per-source unigram distributions over the shared top-200 vocab
    "q_js_divergence" -> ((s, dir) =>
      TextStats.jsDivergence(docs(s, dir), "source", "text", topV = 200)
        .orderBy(col("src_a"), col("src_b"))),

    // domain-indicative vocabulary: χ² of token × source, top 20
    "q_chi2_tokens" -> ((s, dir) =>
      TextStats.chi2Tokens(docs(s, dir), "source", "text", topV = 200, topK = 20)),

    // training-data ops: winnowing (MOSS) fingerprints — local-copy
    // detection sketch; every ≥(w+n−1)-token exact overlap between
    // two docs is guaranteed to share a selected fingerprint
    "q_winnow_fingerprint" -> ((s, dir) =>
      Dedup.winnowFingerprints(docs(s, dir), "doc_id", "text", n = 3, w = 4)
        .orderBy(col("doc_id"), col("fp_pos"), col("fp_hash"))),

    // training-data ops: exact-substring dedup pairs (suffix-array
    // method's role, Lee et al. 2022) — longest certified shared
    // token run per pair via winnowing diagonals
    "q_substring_dedup" -> ((s, dir) =>
      Dedup.substringDedupPairs(docs(s, dir), "doc_id", "text", n = 3, w = 4, maxDf = 20, topK = 20)),

    // training-data ops: duplicate-span REMOVAL (Lee et al. 2022
    // ExactSubstr) — ≥50-token runs shared with an earlier doc are
    // CUT from the later copy (keep-first), docs themselves survive;
    // the testdata plants shared runs up to 93 tokens so the cut
    // path fires
    "q_dedup_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(docs(s, dir), "doc_id", "text", minTokens = 50)
        .orderBy(col("doc_id"))),

    // training-data ops: Gopher/C4 quality-rule flags + keep decision
    "q_quality_rules" -> ((s, dir) =>
      Curation.qualityRuleFlags(docs(s, dir), "doc_id", "text",
          minTokens = 20, maxTokens = 100000, minMeanLen = 2.0, maxMeanLen = 10.0)
        .orderBy(col("doc_id"))),

    // OLAP sketch path: KMV bottom-k distinct sketch per language
    // with exact-count calibration — engine-replayable (unlike HLL),
    // so the estimate itself sits under the hash gate
    // k=16 < the 31-token per-lang vocab, so the estimator branch
    // (not the exact-count fallback) is what the gate checks
    "q_kmv_distinct" -> ((s, dir) =>
      TextStats.kmvDistinct(docs(s, dir), "lang", "text", k = 16)
        .orderBy(col("lang"))),

    // training-data ops: KMV sketch set algebra — union/intersection
    // /Jaccard ESTIMATES per source pair from mergeable bottom-k
    // sketches (the sketch twin of exact q_source_overlap; pair
    // stage runs on the |groups|-row sketch table, never the corpus)
    "q_kmv_overlap" -> ((s, dir) =>
      TextStats.kmvOverlap(docs(s, dir), "source", "text", k = 16)
        .orderBy(col("g_a"), col("g_b"))),

    // training-data ops: fastText-style hashed linear quality scorer
    // (hashing-trick buckets + broadcast weight table; md5-derived
    // placeholder weights exercise the full plumbing)
    "q_quality_classifier" -> ((s, dir) =>
      Curation.hashedLinearScore(docs(s, dir), "doc_id", "text", nBuckets = 64)
        .orderBy(col("doc_id"))),

    // training-data ops: BM25 relevance top-k against fixed query
    // terms (topic-targeted corpus assembly)
    "q_bm25_topk" -> ((s, dir) =>
      TextStats.bm25TopK(docs(s, dir), "doc_id", "text",
        terms = Seq("spark", "data", "query"), k = 20)),

    // training-data ops: unigram-LM cross-entropy (CCNet-style
    // perplexity filter; ppl = exp(xent) is monotone in xent) — top-25
    // vocab + half-count OOV floor, decimal-exact per-doc sums
    "q_unigram_ppl" -> ((s, dir) =>
      TextStats.unigramXent(docs(s, dir), "doc_id", "text", vocabK = 25)
        .orderBy(col("doc_id"))),

    // training-data ops: bigram-LM cross-entropy with stupid backoff
    // (Brants et al. 2007) — top-50 bigram + top-25 unigram tables,
    // in-row bigram expansion (no window shuffle)
    "q_bigram_ppl" -> ((s, dir) =>
      TextStats.bigramXent(docs(s, dir), "doc_id", "text", bigramK = 50, vocabK = 25)
        .orderBy(col("doc_id"))),

    // LM generation face: top-3 next tokens per hot context (the
    // completion table a bigram LM serves)
    "q_bigram_topk_next" -> ((s, dir) =>
      TextStats.bigramTopNext(docs(s, dir), "text", topV = 10, k = 3)
        .orderBy(col("ctx"), col("next_rank"))),

    // training-data ops: TRANSFER perplexity (the CCNet deployment
    // shape, Wenzek et al. 2020) — the bigram LM is fit on the
    // English reference slice only and scores the WHOLE corpus;
    // distance from the reference model is the quality/language
    // signal self-fit perplexity cannot see
    "q_ppl_transfer" -> ((s, dir) => {
      val d = docs(s, dir)
      TextStats.bigramXentTransfer(
        d.filter(col("lang") === "en"), d, "doc_id", "text", bigramK = 50, vocabK = 25)
        .orderBy(col("doc_id"))
    }),

    // training-data ops: CCNet head/middle/tail corpus split —
    // per-language perplexity terciles under the transfer LM (the
    // bucket label real mixing recipes consume)
    "q_ppl_buckets" -> ((s, dir) =>
      TextStats.pplBuckets(docs(s, dir), "doc_id", "lang", "text",
          refLang = "en", bigramK = 50, vocabK = 25)
        .orderBy(col("doc_id"))),

    // training-data ops: per-language tokenizer-fertility card
    // (BPE-ish vs whitespace token cost — the budget planner's view)
    "q_token_fertility" -> ((s, dir) =>
      TextStats.tokenFertility(docs(s, dir), "lang", "text")
        .orderBy(col("lang"))),

    // training-data ops: BPE tokenizer training, iteration-0 face —
    // top weighted symbol pairs of the word-frequency table (the
    // vocab-sized relation the merge loop iterates on; see
    // textops.Bpe.learnMerges for the full learner, spec-gated)
    "q_bpe_pair_stats" -> ((s, dir) =>
      graft.textops.Bpe.pairStats(docs(s, dir), "text", topK = 20)),

    // training-data ops: WordPiece training, iteration-0 face —
    // likelihood-gain pair scores (count(ab)/(count(a)·count(b)),
    // emitted as ln) over the ##-prefixed word table; the full
    // driver-side learner + greedy longest-match encode are
    // spec-gated (textops.WordPiece)
    "q_wp_pair_scores" -> ((s, dir) =>
      graft.textops.WordPiece.pairScores(docs(s, dir), "text", topK = 20)),

    // training-data ops: trigram-LM cross-entropy with TWO-level
    // stupid backoff (Brants et al. 2007 §4 — trigram → bigram →
    // unigram, fixed α=0.4 per level) — the full recipe the bigram
    // filter truncates
    "q_trigram_ppl" -> ((s, dir) =>
      TextStats.trigramXent(docs(s, dir), "doc_id", "text", trigramK = 50, bigramK = 50, vocabK = 25)
        .orderBy(col("doc_id"))),

    // training-data ops: interpolated Kneser–Ney bigram LM (fixed
    // D=0.75, the KenLM family) — the FULL-table model that scores
    // via one shuffle join instead of a broadcast truncation
    "q_kn_bigram_ppl" -> ((s, dir) =>
      TextStats.knBigramXent(docs(s, dir), "doc_id", "text", discount = 0.75)
        .orderBy(col("doc_id"))),

    // training-data ops: Gopher within-doc repetition signals —
    // top-n-gram char fraction (n=2..4) + duplicate-n-gram fraction
    // (n=5..10), the Rae et al. Table A1 rule family
    "q_gopher_repetition" -> ((s, dir) =>
      TextStats.gopherRepetition(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // training-data ops: pairwise dataset-overlap card (exact
    // n-gram-set Jaccard/containment per source pair via an inverted
    // gram-hash self-join) — the train/train overlap audit
    "q_source_overlap" -> ((s, dir) =>
      Curation.sourceOverlap(docs(s, dir), "source", "text", n = 3)
        .orderBy(col("src_a"), col("src_b"))),

    // training-data ops: temperature-scaled domain mixture weights
    // (alpha-sampling over per-source token shares)
    "q_domain_mix" -> ((s, dir) =>
      Sampling.domainMixWeights(docs(s, dir), "source", "text", alpha = 0.3)
        .orderBy(col("source"))),

    // training-data ops: content-addressed shard assignment — the
    // reproducible "global shuffle before training" layout step
    "q_shard_assign" -> ((s, dir) =>
      Sampling.shardAssign(docs(s, dir), "doc_id", nShards = 16)
        .orderBy(col("doc_id"))),

    // layout audit: per-shard doc/token load + relative imbalance
    "q_shard_balance" -> ((s, dir) =>
      Sampling.shardBalance(docs(s, dir), "doc_id", "text", nShards = 16)
        .orderBy(col("shard"))),

    // training-data ops: realize the alpha=0.3 mixture under a token
    // budget — per-domain quota, deterministic doc take, data-card row
    "q_mix_realize" -> ((s, dir) =>
      Sampling.mixRealize(docs(s, dir), "source", "doc_id", "text",
          alpha = 0.3, budgetTokens = 20000L)
        .orderBy(col("source"))),

    // training-data ops: near-dup resolution keeping the LONGEST copy
    // per cluster (quality tie-break, not first-arrival)
    "q_dedup_keep_best" -> ((s, dir) => {
      val d        = docs(s, dir)
      val clusters = Dedup.nearDupClusters(d, "lang", "doc_id", "text", n = 3, minJaccard = 0.5)
      Dedup
        .keepBestPerCluster(
          clusters
            .select(col("doc_id"), col("cluster_id"))
            .join(d.select(col("doc_id"), length(col("text")).as("n_chars")), Seq("doc_id")),
          "doc_id", "n_chars")
        .orderBy(col("doc_id"))
    }),

    // training-data ops: cross-doc repeated-sentence (boilerplate)
    // profile — testdata has no punctuation, so pseudo-sentences
    // split on " the "; real lakes use the default ". "/newline split
    "q_boilerplate" -> ((s, dir) =>
      Curation.boilerplateProfile(docs(s, dir), "doc_id", "text", maxDf = 2, sepRegex = " the ")
        .orderBy(col("doc_id"))),

    // training-data ops: boilerplate REMOVAL — rebuild each doc with
    // its corpus-frequent segments spliced out (the CCNet repeated-
    // paragraph filter as a mutation, not just a profile)
    "q_remove_boilerplate" -> ((s, dir) =>
      Curation.removeBoilerplate(
          docs(s, dir), "doc_id", "text", maxDf = 2, sepRegex = " the ", joinSep = " the ")
        .orderBy(col("doc_id"))),

    // training-data ops: whitespace + BPE-ish token counts
    "q_token_count" -> ((s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          TextStats.tokenCountWs(col("text")).as("n_ws"),
          TextStats.tokenCountBpe(col("text")).as("n_bpe"))
        .orderBy(col("doc_id"))),

    // training-data ops: rolling polynomial document fingerprint
    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // training-data ops: type-token ratio — lexical diversity for the
    // quality filter bank (low TTR = templated/repetitive text)
    "q_ttr" -> ((s, dir) =>
      TextStats.typeTokenRatio(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // training-data ops: character-level Shannon entropy — the
    // random-bytes/gibberish detector next to perplexity
    "q_char_entropy" -> ((s, dir) =>
      TextStats.charEntropy(docs(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // multimodal plumbing: opaque binary column + typed metadata —
    // the text payload stands in for image bytes (the container ships
    // no codecs; the decode is stubbed behind Multimodal.MediaCodec),
    // but the binary schema/partitioning/hashing path is fully real
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal
        .mediaMeta(
          docs(s, dir).select(
            col("doc_id").as("media_id"),
            lit("image").as("kind"),
            col("text").cast("binary").as("bytes")))
        .orderBy(col("media_id"))),

    // multimodal plumbing: video frame sampling as an exploding
    // batched partition stage; frames fingerprinted via hex (the only
    // blob hash both engines express identically)
    "q_frame_sample" -> ((s, dir) =>
      Multimodal
        .sampleFrames(
          docs(s, dir).select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes")),
          framesPerVideo = 4)
        .select(
          col("media_id"),
          col("frame_idx"),
          length(col("frame_bytes")).as("n_bytes"),
          md5(hex(col("frame_bytes")).cast("binary")).as("frame_hash"))
        .orderBy(col("media_id"), col("frame_idx"))),

    // multimodal plumbing: stub "resize" (every 4th payload byte) —
    // batched partition stage; byte output fingerprinted via hex
    "q_media_resize" -> ((s, dir) =>
      Multimodal
        .resizeMedia(
          docs(s, dir).select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes")),
          factor = 4)
        .select(
          col("media_id"),
          length(col("resized_bytes")).as("n_bytes"),
          md5(hex(col("resized_bytes")).cast("binary")).as("content_hash"))
        .orderBy(col("media_id"))),

    // the VIDEO face of the multimodal family, DuckDB-checked (r15
    // VERDICT #6): REAL ISO-BMFF bytes are assembled per document
    // from its columns (ftyp + moov[mvhd v0/v1 + n×trak], big-endian
    // via hex/unhex) and decoded by the REAL mp4 box walk
    // (MediaCodec.mp4Header) — the oracle computes the same metadata
    // directly from the columns, so any mis-read in the walk
    // (offsets, endianness, v0/v1 field spans, duration math)
    // hash-mismatches. Even doc_ids build v0/'isom', odd v1/'mp42';
    // tracks = doc_id % 3 + 1; timescale 600; duration = n_chars.
    "q_video_meta" -> ((s, dir) => {
      def hc(str: String): String =
        str.getBytes(java.nio.charset.StandardCharsets.US_ASCII).map("%02X".format(_)).mkString
      val even    = col("doc_id") % 2 === 0
      // the v0 mvhd duration field is 32 bits: a document whose
      // n_chars exceeds 0xFFFFFFFF would silently truncate under
      // lpad(hex, 8) and assemble corrupt bytes (r16 ADVICE) — such
      // rows take the v1 (64-bit) form regardless of parity, exactly
      // what a real muxer does; the brand stays keyed on parity and
      // the oracle reads duration straight from n_chars either way
      val v0      = even && col("n_chars") <= lit(0xFFFFFFFFL)
      val nTracks = (col("doc_id") % 3 + 1).cast("int")
      val ftypHex = concat(
        lit("00000014" + hc("ftyp")),
        when(even, lit(hc("isom"))).otherwise(lit(hc("mp42"))),
        lit(hc("    ") + hc("isom")))
      val zeros80 = "00" * 80 // rate/volume/matrix/next_track: zeros
      val mvhdHex = when(
        v0,
        concat(
          lit("0000006C" + hc("mvhd") + "00000000" + "00000000" + "00000000" + "00000258"),
          lpad(hex(col("n_chars")), 8, "0"),
          lit(zeros80)))
        .otherwise(concat(
          lit("00000078" + hc("mvhd") + "01000000" + "0000000000000000" + "0000000000000000" + "00000258"),
          lpad(hex(col("n_chars")), 16, "0"),
          lit(zeros80)))
      val trakUnit = "00000008" + hc("trak")
      val traksHex = element_at(typedLit(Seq(trakUnit, trakUnit * 2, trakUnit * 3)), nTracks)
      val moovSize = when(v0, lit(116)).otherwise(lit(128)) + nTracks * 8
      val allHex   = concat(ftypHex, lpad(hex(moovSize), 8, "0"), lit(hc("moov")), mvhdHex, traksHex)
      Multimodal
        .decodeVideoMeta(docs(s, dir).select(col("doc_id").as("media_id"), unhex(allHex).as("bytes")))
        .select(
          col("media_id"), col("mp4_brand"), col("mp4_timescale"),
          col("mp4_duration"), col("mp4_duration_ms"), col("mp4_tracks"))
        .orderBy(col("media_id"))
    }),

    // relational spine at real volume (lineitem = the sf anchor):
    // TPC-H Q1-shaped pricing summary; decimal sums for engine-exact
    // aggregation (double sums are shuffle-order dependent)
    "q_lineitem_pricing" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q5 shape: 6-table local-supplier-volume join — the
    // classic join-order/broadcast showcase: region+nation+supplier
    // are broadcast dims, orders is date-pruned at the scan, the one
    // real shuffle is lineitem ⋈ orders; the c_nationkey=s_nationkey
    // equi-predicate rides the customer join
    "q_local_supplier_volume" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(
          broadcast(Tables.table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(
          broadcast(Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // TPC-H Q13 shape: customer order-count distribution — the
    // LEFT OUTER idiom (customers with zero orders keep a 0 row) +
    // double aggregation histogram
    "q_cust_order_dist" -> ((s, dir) =>
      Tables.table(s, dir, "customer")
        .join(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))),

    // lineitem ⋈ orders revenue by priority (join at volume; date
    // filters push into both parquet scans)
    // the date filter prunes the AGGREGATE'S INPUT, not just the
    // join: lineitem semi-joins the filtered orderkeys BEFORE the
    // revenue aggregation, so rows of pre-cutoff orders never enter
    // the partial sums (at 100× the filter is the selective side and
    // this is the difference between aggregating the whole fact table
    // and a slice of it). Post-agg the join moves one row per
    // surviving order, and the per-priority count needs no
    // countDistinct expand (orderkey is unique post-agg). Dropping a
    // key pre-agg == dropping its aggregated row at the inner join,
    // and decimal partial sums re-aggregate exactly — bit-identical
    // to the join-first form the oracle runs.
    "q_order_revenue_join" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(ord.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q3 shape (shipping priority): 3-way customer ⋈ orders ⋈
    // lineitem — segment/date filters push into all three scans, the
    // customer key list broadcasts, lineitem revenue pre-aggregates
    // per orderkey BEFORE the join (one row per order moves), and the
    // top-10 is a TakeOrdered, not a global sort
    "q_shipping_priority" -> ((s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val cust = Tables.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < cutoff)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("rev"))
      rev
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"),
          round(col("rev").cast("double"), 6).as("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .orderBy(desc("revenue"), col("order_date"), col("l_orderkey"))
        .limit(10)
    }),

    // two-sided nation-pair trade volume (TPC-H Q7's shape): the
    // 6-table join where lineitem shuffles ONCE on orderkey and once
    // on suppkey while customer/supplier/nation broadcast; the
    // nation filter lands on both broadcast sides before the fact
    // join, so pair pruning happens at the build
    "q_nation_trade" -> ((s, dir) => {
      val nations = Seq("NATION_18", "NATION_19", "NATION_20", "NATION_21")
      val n = Tables.table(s, dir, "nation").filter(col("n_name").isin(nations: _*))
      val su = Tables.table(s, dir, "supplier")
        .join(broadcast(n.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cu = Tables.table(s, dir, "customer")
        .join(broadcast(n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), col("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("ship_year"))
        .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 6).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
    }),

    // selective-scan aggregate (TPC-H Q6's shape): revenue from a
    // quantity/discount/date band — ONE filter that must reach the
    // parquet scan as PushedFilters + one agg, no join, no shuffle
    // beyond the final 1-row combine
    "q_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
            col("l_quantity") < 24)
        .agg(
          round(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
            .cast("double"), 6).as("revenue"),
          count(lit(1)).as("n_items"))),

    // returned-item revenue by customer (TPC-H Q10's shape): 3-table
    // join, returnflag filter pushed to the lineitem scan, one keyed
    // agg, TakeOrdered 20 — no global sort materializes
    "q_returned_revenue" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
      rev.join(Tables.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_custkey"), col("c_name"),
          round(col("rev").cast("double"), 6).as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // temperature-scaled mixture weights (the multilingual-corpus
    // sampling recipe: p_i ∝ c_i^α flattens head sources, α=0.5) —
    // one tiny source-count agg + scalar math, the card a data-mix
    // designer reads before q_mix_realize
    "q_mix_temperature" -> ((s, dir) => {
      val counts = docs(s, dir).groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val wAll   = Window.partitionBy()
      counts
        .withColumn("w", sqrt(col("n_docs").cast("double")))
        .withColumn("p_raw", col("n_docs").cast("double") / sum(col("n_docs")).over(wAll))
        .withColumn("p_temp", col("w") / sum(col("w")).over(wAll))
        .select(
          col("source"), col("n_docs"),
          round(col("p_raw"), 6).as("p_raw"),
          round(col("p_temp"), 6).as("p_temp"),
          round(col("p_temp") / col("p_raw"), 6).as("upweight"))
        .orderBy(col("source"))
    }),

    // EXISTS semi-join volume shape (TPC-H Q4's plan): orders with at
    // least one lineitem shipped > 30 days after the order date,
    // counted by priority — a LeftSemi the optimizer must NOT expand
    // to a join+distinct (one shuffle on the key, no row duplication)
    "q_late_ship_exists" -> ((s, dir) => {
      val late = Tables.lineitem(s, dir)
        .join(
          Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .select(col("o_orderkey"))
      Tables.orders(s, dir)
        .join(late, Seq("o_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // conditional-aggregation mix (TPC-H Q12's shape on this schema):
    // per lineitem status, how many line items belong to high- vs
    // low-priority orders — ONE join + ONE hash agg, the CASE fold
    // happens map-side
    "q_priority_mix" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_priority_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_priority_count"))
        .orderBy(col("l_linestatus"))),

    // class-balanced cap — the training-mix primitive that prevents a
    // dominant class from swamping a fine-tune set: per lang keep at
    // most 50 docs, chosen by content-hash order (deterministic, no
    // RNG; the train-sample recipe applied per class). ONE rank
    // window keyed by the class column.
    "q_class_balance_sample" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50)
        .select(col("lang"), col("doc_id"), col("rn").cast("int").as("rn"))
        .orderBy(col("lang"), col("rn"))
    }),

    // OLAP rollup: token totals per (source, lang) with subtotal and
    // grand-total levels — the GROUPING SETS surface; level derived
    // from rollup nulls pre-coalesce (engine-identical, no
    // grouping_id bit-convention dependence)
    "q_rollup_tokens" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("source"),
        col("lang"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).as("n_tok"))
      d.rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tok"))
        .select(
          (when(col("source").isNull, 1).otherwise(0)
            + when(col("lang").isNull, 1).otherwise(0)).as("level"),
          coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"),
          col("total_tok"))
        .orderBy(col("level"), col("source"), col("lang"))
    }),

    // full CUBE + grouping_id over (source, lang) — the other half of
    // the grouping-sets surface next to q_rollup_tokens (rollup emits
    // the prefix lattice; cube adds the lang-only slice a mixture
    // dashboard reads). gid bitmask: source = high bit, lang = low
    "q_cube_quality" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("source"),
        col("lang"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).as("n_tok"))
      d.cube(col("source"), col("lang"))
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tok"))
        .select(
          col("gid"),
          coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"),
          col("total_tok"))
        .orderBy(col("gid"), col("source"), col("lang"))
    }),

    // corpus diagnostics: OLS Zipf fit over the top-100 vocabulary —
    // natural text sits near slope −1; flat/steep slopes flag
    // templated or machine-generated corpora
    "q_zipf_slope" -> ((s, dir) =>
      TextStats.zipfFit(docs(s, dir), "text", topV = 100)),

    // corpus diagnostics: exact Gini of the token-frequency
    // distribution via the count-histogram block-rank identity (no
    // per-token global sort — see TextStats.giniTokenConcentration)
    "q_gini_tokens" -> ((s, dir) =>
      TextStats.giniTokenConcentration(docs(s, dir), "text")),

    // corpus diagnostics: Heaps'-law vocabulary-growth fit at 16
    // id-order checkpoints — conditional sums + the first-appearance
    // aggregation, no global prefix window
    "q_heaps_fit" -> ((s, dir) =>
      TextStats.heapsFit(docs(s, dir), "doc_id", "text", checkpoints = 16)),

    // corpus diagnostics: exact pairwise two-sample KS between
    // per-source doc-length distributions, from value histograms
    "q_ks_length" -> ((s, dir) =>
      graft.relops.Stats.ksStatistic(docs(s, dir), "source", "n_chars")
        .orderBy(col("src_a"), col("src_b"))),

    // data card: per-source exact-duplication rate (min-id first-copy
    // rule, the exactDedup survivor convention)
    "q_dedup_rate_by_source" -> ((s, dir) =>
      Dedup.dedupRateBySource(docs(s, dir), "doc_id", "text", "source")
        .orderBy(col("source"))),

    // collocation card: within-doc co-occurrence PMI over the top-50
    // vocabulary — pair fan-out bounded by topV² per doc by design
    "q_pmi_pairs" -> ((s, dir) =>
      TextStats.pmiPairs(docs(s, dir), "doc_id", "text", topV = 50, minDocs = 2L, topK = 20)),

    // burstiness card: variance-to-mean ratio of per-doc counts for
    // the top-20 tokens (zero-doc mass folded in analytically)
    "q_token_dispersion" -> ((s, dir) =>
      TextStats.tokenDispersion(docs(s, dir), "doc_id", "text", topK = 20)),

    // vocabulary-freshness card: per-source hapax legomena rate
    "q_hapax_rate" -> ((s, dir) =>
      TextStats.hapaxRate(docs(s, dir), "source", "text").orderBy(col("source"))),

    // tokenizer-design curve: corpus token mass covered by the
    // top-k types at k ∈ {5,10,20,30}
    "q_head_coverage" -> ((s, dir) =>
      TextStats.headCoverage(docs(s, dir), "text", Seq(5, 10, 20, 30))),

    // duplication-shape card: exact-dup cluster-size histogram
    "q_dup_cluster_hist" -> ((s, dir) =>
      Dedup.dupClusterHist(docs(s, dir), "doc_id", "text")),

    // provenance card: who copies whom — near-dup pairs billed to
    // (source of lower id = original, source of higher = copy); the
    // exact-dup variant (crossSourceDupMatrix) is API+spec-gated —
    // this testdata has no byte-identical cross-source copies below
    // sf0.1, so the gated card uses the near-dup pair space
    "q_dup_source_matrix" -> ((s, dir) =>
      Dedup.crossSourceNearDupMatrix(
          docs(s, dir), "lang", "doc_id", "text", "source", n = 3, maxDf = 3, minJaccard = 0.5)
        .orderBy(col("src_original"), col("src_copy"))),

    // metadata-redundancy card: MI(lang, source) — does source
    // determine language (stratify on one) or do they slice
    // independently (stratify on both)?
    "q_mi_lang_source" -> ((s, dir) =>
      TextStats.mutualInformation(docs(s, dir), "lang", "source")),

    // embedding-quality card: simplified (centroid) silhouette per
    // cluster — geometry companion to purity; O(N·k), never O(N²)
    "q_silhouette" -> ((s, dir) =>
      Similarity.clusterSilhouette(
        Tables.embeddings(s, dir), "vec_id", "embedding", nCentroids = 16)),

    // embedding-quality card: majority-label purity per IVF seed
    // cluster (shared centroid assignment with the ANN family)
    "q_cluster_purity" -> ((s, dir) =>
      Similarity.clusterLabelPurity(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label", nCentroids = 16)),

    // diversity card: effective vocabulary size (inverse Simpson)
    // per source
    "q_simpson_diversity" -> ((s, dir) =>
      TextStats.simpsonDiversity(docs(s, dir), "source", "text").orderBy(col("source"))),

    // filter-governance card: 2x2 keep agreement between the hashed
    // linear classifier and the rule bank
    "q_filter_agreement" -> ((s, dir) =>
      Curation.filterAgreement(docs(s, dir), "doc_id", "text",
          nBuckets = 64, minTokens = 20, maxTokens = 100000, minMeanLen = 2.0, maxMeanLen = 10.0)
        .orderBy(col("clf_keep"), col("rules_keep"))),

    // no-encoder embeddings: hashing-trick bag-of-words, sparse long
    // form (the dense/L2 assembly is the hashedBowDense API, fed to
    // Similarity in CurationSpec)
    "q_hashed_bow" -> ((s, dir) =>
      Curation.hashedBowSparse(docs(s, dir), "doc_id", "text", nBuckets = 64)
        .orderBy(col("doc_id"), col("bkt"))),

    // unigram-LM tokenizer: seed-piece candidate statistics — the
    // oracle-gated distributed stage of Unigram.train (the EM loop is
    // driver-side over the bounded word table, spec-gated)
    "q_sp_seed_vocab" -> ((s, dir) =>
      graft.textops.Unigram.seedPieceStats(docs(s, dir), "text", maxLen = 4, topK = 50)),

    // class-separability card: pairwise cosine between per-label
    // mean embeddings (decimal-exact means, driver pairwise)
    "q_label_centroid_sim" -> ((s, dir) =>
      Similarity.labelCentroidSim(Tables.embeddings(s, dir), "label", "embedding", dim = 64)
        .orderBy(col("label_a"), col("label_b"))),

    // quantization-calibration card: per-label embedding norm stats
    "q_embed_norms" -> ((s, dir) =>
      Similarity.normStats(Tables.embeddings(s, dir), "label", "embedding")
        .orderBy(col("label"))),

    // signal-redundancy card: exact tie-averaged Spearman between
    // two quality signals (char length vs token count)
    "q_signal_rank_corr" -> ((s, dir) =>
      graft.relops.Stats.spearmanCorr(
        docs(s, dir).select(
          col("n_chars"),
          size(filter(split(col("text"), " "), t => length(t) > 0)).as("n_tok")),
        "n_chars", "n_tok")),

    // corpus diagnostics: EXACT per-language length quantiles from
    // the value histogram + CDF rank — no per-group value buffering
    // (the scale-safe `percentile` replacement; see
    // relops.Stats.histogramQuantiles)
    "q_quantile_disc" -> ((s, dir) =>
      graft.relops.Stats.histogramQuantiles(
          docs(s, dir), "lang", "n_chars", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy(col("lang"), col("prob"))),

    // corpus diagnostics: per-language winsorization of doc lengths
    // to the [p10, p90] band — outlier-robust normalization before
    // score mixing, composed from the histogram-quantile machinery
    "q_winsorize" -> ((s, dir) =>
      graft.relops.Stats.winsorize(docs(s, dir), "lang", "n_chars", loProb = 0.1, hiProb = 0.9)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("clamped"), col("is_clipped"))
        .orderBy(col("doc_id"))),

    // as-of-style self window: each order with the customer's previous
    // order date (lag over (custkey, orderdate))
    "q_order_asof_prev" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          coalesce(date_format(col("prev_date"), "yyyy-MM-dd"), lit("none")).as("prev_order_date"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.6 RANGE-frame window: 7-day moving average of daily event
    // counts — RANGE (value-based) frame over integer day indices, so
    // calendar gaps are handled by the frame bounds, not row offsets
    "q_moving_avg" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(
          col("event_type"),
          (unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window
        .partitionBy(col("event_type"))
        .orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("ma7", round(sum(col("n")).over(w).cast("double") / 7.0, 6))
        .orderBy(col("event_type"), col("day"))
    }),

    // §2.6 window rank (events): row_number per user by time
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // north-star event op: tumbling event-time windows (1-day
    // buckets × event type) — one hash aggregation with map-side
    // combine; the streaming variant shares the grouping
    "q_event_windows" -> ((s, dir) =>
      EventWindows
        .tumblingStats(events(s, dir), "ts", "event_type", "value", windowLen = "1 day")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
          col("event_type"),
          col("n_events"),
          col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),

    // volume event op: first-order Markov transition matrix of event
    // types — one user-keyed window + a |types|²-cell fold
    "q_event_transitions" -> ((s, dir) =>
      EventWindows.eventTransitions(events(s, dir), "user_id", "ts", "event_id", "event_type")
        .orderBy(col("prev_type"), col("next_type"))),

    // volume event op: per-user event-type pivot — an explicit value
    // list keeps pivot a single hash aggregation (no extra distinct
    // job to discover columns); the wide shape feeds per-user
    // feature vectors
    "q_event_pivot" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(
          col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view"))
        .orderBy(col("user_id"))),

    // relational op: column data profile (the ANALYZE primitive) —
    // per-column NULL + exact distinct counts in ONE aggregation pass
    "q_table_profile" -> ((s, dir) =>
      graft.relops.Stats.tableProfile(Tables.orders(s, dir)).orderBy(col("ordinal"))),

    // volume event op: equi-width value histogram — broadcast bounds,
    // per-row bucket index, one tiny shuffle on <= 20 keys
    "q_value_histogram" -> ((s, dir) =>
      graft.relops.Stats.equiWidthHistogram(events(s, dir), "value", nBuckets = 20)
        .orderBy(col("bucket"))),

    // volume event op: RFM segmentation — quartile tiles assigned
    // against broadcast exact-percentile cutpoints (no global-window
    // ntile single-reducer trap)
    "q_rfm_segments" -> ((s, dir) =>
      EventWindows.rfmSegments(events(s, dir), "user_id", "ts", "value")
        .orderBy(col("user_id"))),

    // volume event op: burst-day anomaly flags — daily counts vs 3x
    // the per-type median daily count (integer-robust, no z-score
    // float-sum order sensitivity)
    "q_burst_days" -> ((s, dir) =>
      EventWindows.burstDays(events(s, dir), "event_type", "ts", factor = 3.0)
        .select(
          col("event_type"),
          date_format(col("day_start"), "yyyy-MM-dd").as("day"),
          col("n_events"),
          col("median_daily"),
          col("burst"))
        .orderBy(col("event_type"), col("day"))),

    // north-star event op: gap-based sessionization (6h gap) —
    // per-user window boundary flags + running sum, then per-session
    // aggregate; one shuffle on the user key
    "q_sessionize" -> ((s, dir) =>
      Sessionize
        .sessionStats(events(s, dir), "user_id", "ts", "event_id", gapSeconds = 6 * 3600L)
        .select(
          col("user_id"),
          col("session_idx"),
          col("n_events"),
          date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
          date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
          col("duration_sec"))
        .orderBy(col("user_id"), col("session_idx"))),

    // inter-arrival distribution — the ops-analytics gauge next to
    // sessionize: per event type, median/p90 seconds since the same
    // user's previous event (gap attributed to the LATER event's
    // type). One user-keyed lag window, then the histogram-quantile
    // path (state = distinct gap values, never row buffers)
    "q_inter_event_gap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = events(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(col("event_type"), expr("(unix_micros(ts) - prev_us) div 1000000").as("gap_sec"))
      graft.relops.Stats.histogramQuantiles(gaps, "event_type", "gap_sec", Seq(0.5, 0.9))
        .orderBy(col("event_type"), col("prob"))
    }),

    // north-star event op: ordered conversion funnel — stage k must
    // complete STRICTLY after stage k−1's first qualifying event;
    // per-stage reached-frames shrink monotonically, counts land in
    // one aggregation (no driver count() loop)
    "q_funnel" -> ((s, dir) =>
      EventWindows.funnel(events(s, dir), "user_id", "event_type", "ts",
        stages = Seq("signup", "click", "purchase"))),

    // north-star event op: weekly cohort retention — integer
    // epoch-week buckets (engine-identical, no calendar date_trunc),
    // distinct (user, week) collapses raw volume before any join
    "q_cohort_retention" -> ((s, dir) =>
      EventWindows.cohortRetention(events(s, dir), "user_id", "ts")),

    // training-data ops: per-lang length-outlier flags — percent_rank
    // over a fully deterministic order (n_chars, doc_id); docs past
    // the 99th percentile get trimmed by a curation pass
    "q_length_outliers" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("is_outlier", col("pr") >= 0.99)
        .orderBy(col("doc_id"))
    }),

    // §2.11 WS diagnostics: pairwise Cohen's kappa between extractors
    // (chance-corrected agreement — the redundancy signal for
    // diverse top-k voter selection); integer marginal arithmetic,
    // doubles only at the final divisions
    "q_cohens_kappa" -> ((s, dir) =>
      LabelModel.cohensKappa(binaryVotes(s, dir), "doc_id")
        .orderBy(col("ex_a"), col("ex_b"))),

    // north-star event op: trailing 7-day active users (rolling WAU)
    // — sliding distinct via the expand trick over the collapsed
    // (user, day) relation, never the raw event stream
    "q_rolling_wau" -> ((s, dir) =>
      EventWindows.rollingActiveUsers(events(s, dir), "user_id", "ts", days = 7)),

    // semi-structured surface: JSON property extraction (from_json
    // with an explicit schema — the typed, codegen'd path; no
    // schema-inference scan) aggregated per event type
    "q_json_props" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
      events(s, dir)
        .withColumn("k", from_json(col("props"), schema).getField("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy(col("event_type"))
    }),

    // north-star event op: AS-OF join (purchase → last preceding view
    // attribution) — union+window formulation, ONE key shuffle, no
    // inequality-join pair explosion; DuckDB's native ASOF JOIN is
    // the oracle
    "q_asof_attribution" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev
        .filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("event_id"), col("value"))
        // unique per (user, ts): max event_id wins (none collide in
        // this data, but the reduction is the operator's contract)
        .groupBy(col("user_id"), col("view_ts"))
        .agg(max(struct(col("event_id"), col("value"))).as("m"))
        .select(
          col("user_id"),
          col("view_ts"),
          col("m.event_id").as("view_id"),
          col("m.value").as("view_value"))
      graft.relops.AsOfJoin
        .asof(purchases, views, Seq("user_id"), "ts", "view_ts",
          rightVals = Seq("view_id", "view_value"))
        .select(
          col("event_id"),
          col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
          col("view_id"),
          col("view_value"))
        .orderBy(col("event_id"))
    }),

    // north-star event op: binned interval self-join — same-user
    // activity within ±60s of each purchase; time-bucket binning
    // prunes candidates to the anchor's neighborhood instead of the
    // per-user event² pair space
    "q_range_join_binned" -> ((s, dir) =>
      EventWindows
        .nearbyEventStats(events(s, dir), "event_id", "user_id", "ts", "value",
          anchorPred = col("event_type") === "purchase", windowSec = 60)
        .orderBy(col("event_id"))),

    // curation reporting: per-source data card (docs, tokens, mean
    // quality, pivot-language share) — the audit table a curated
    // corpus ships with
    "q_data_card" -> ((s, dir) =>
      Curation.dataCard(docs(s, dir), "source", "lang", "text", Stopwords)
        .orderBy(col("source"))),

    // argmin-per-group (TPC-H Q2's shape): cheapest regional supplier
    // per part — the (part, supplier) unit-price agg shuffles ONCE on
    // its compound key, the region filter prunes suppliers at the
    // broadcast build, and the per-part argmin is a rank-1 window
    // (WindowGroupLimit: no full sort of the priced relation)
    "q_min_cost_supplier" -> ((s, dir) => {
      val eu = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.table(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"))
      val priced = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,4)")).as("s_ext"),
          sum(col("l_quantity").cast("decimal(18,4)")).as("s_qty"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .withColumn("unit_price", col("s_ext").cast("double") / col("s_qty").cast("double"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("unit_price"), col("l_suppkey"))
      priced
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(broadcast(Tables.table(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .select(
          col("l_partkey").as("p_partkey"), col("p_name"), col("s_name"),
          round(col("unit_price"), 6).as("unit_price"))
        .orderBy(col("unit_price"), col("p_partkey"))
        .limit(100)
    }),

    // national market share inside a region (TPC-H Q8's shape): one
    // fact shuffle on orderkey, customer-region and supplier-nation
    // both prune at broadcast builds, numerator/denominator fold into
    // ONE conditional aggregation — no second pass, no self-join
    "q_market_share" -> ((s, dir) => {
      val asiaCust = Tables.table(s, dir, "customer")
        .join(broadcast(Tables.table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supp = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val zero = lit(0).cast("decimal(18,4)")
      val v    = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(
          round(
            sum(when(col("supp_nation") === "NATION_7", v).otherwise(zero)).cast("double") /
              sum(v).cast("double"), 6).as("mkt_share"),
          round(sum(v).cast("double"), 6).as("total_revenue"))
        .orderBy(col("order_year"))
    }),

    // product-line profit by supplier nation × ship year (TPC-H Q9's
    // shape, supply-cost term proxied from p_retailprice — the
    // testdata has no partsupp): part-name filter prunes the
    // broadcast part build BEFORE the fact join, one keyed agg
    "q_nation_profit" -> ((s, dir) => {
      val redParts = Tables.table(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supp = Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val profit = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
      Tables.lineitem(s, dir)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(round(sum(profit).cast("double"), 6).as("profit"))
        .orderBy(col("nation"), col("o_year"))
    }),

    // revenue concentration (TPC-H Q11's HAVING-scalar-subquery
    // shape): parts holding more than 1.25× the mean revenue share —
    // one keyed agg + a 1-row broadcast total, the threshold scales
    // with the part count so the card is SF-stable
    "q_revenue_concentration" -> ((s, dir) => {
      // the per-part aggregate feeds BOTH the 1-row total and the
      // filter: persist it (parts-sized, tiny vs the fact) so the
      // fact table is scanned ONCE — the naive lazy form re-scans
      // lineitem for the scalar subquery (ReuseExchange does not
      // fire across the aggregate under AQE); eager-checkpoint the
      // (filtered) output and release, the GraphOps pattern
      val pr = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("rev"))
        .persist()
      val tot = pr.agg(sum(col("rev")).as("total"), count(lit(1)).as("n_parts"))
      val out = pr.crossJoin(broadcast(tot))
        .withColumn("share_raw", col("rev").cast("double") / col("total").cast("double"))
        .filter(col("share_raw") > lit(1.25) / col("n_parts"))
        .select(
          col("l_partkey").as("p_partkey"),
          round(col("rev").cast("double"), 6).as("revenue"),
          round(col("share_raw"), 6).as("share"),
          col("share_raw"))
        .orderBy(desc("share_raw"), col("p_partkey"))
        .drop("share_raw")
        .localCheckpoint(eager = true)
      pr.unpersist()
      out
    }),

    // promotion revenue share (TPC-H Q14's shape): date band pushed
    // to the lineitem scan, part type via broadcast, numerator and
    // denominator in ONE aggregation — the conditional-agg fold
    "q_promo_revenue" -> ((s, dir) => {
      val zero = lit(0).cast("decimal(18,4)")
      val v    = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
        .join(broadcast(Tables.table(s, dir, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO", v).otherwise(zero)).cast("double"), 6)
            .as("promo_revenue"),
          round(sum(v).cast("double"), 6).as("total_revenue"),
          round(
            lit(100.0) * sum(when(col("p_type") === "PROMO", v).otherwise(zero)).cast("double") /
              sum(v).cast("double"), 6).as("promo_pct"))
    }),

    // top supplier by quarter revenue (TPC-H Q15's scalar-subquery-
    // max shape): the per-supplier agg is computed ONCE, its max
    // rides back as a 1-row broadcast — no re-aggregation, exact
    // decimal equality so ties (if any) all surface
    "q_top_supplier" -> ((s, dir) => {
      // persist the supplier-sized aggregate so the fact scan runs
      // ONCE (the lazy form re-scans lineitem for the max subquery);
      // output is <= #ties rows, eager-checkpointed, cache released
      val rev = Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("total_rev"))
        .persist()
      val out = rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("mx"))))
        .filter(col("total_rev") === col("mx"))
        .join(broadcast(Tables.table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(
          col("l_suppkey").as("s_suppkey"), col("s_name"),
          round(col("total_rev").cast("double"), 6).as("total_revenue"))
        .orderBy(col("s_suppkey"))
        .localCheckpoint(eager = true)
      rev.unpersist()
      out
    }),

    // supplier diversity per product segment (TPC-H Q16's shape):
    // NOT-IN deny list as a broadcast LeftAnti on the fact side, then
    // count(DISTINCT supplier) per (type, size band) — the distinct
    // rides the same shuffle as the group keys, no second exchange
    "q_parts_supplier_cnt" -> ((s, dir) => {
      val bad = Tables.table(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.table(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), (col("p_size") - col("p_size") % 10).cast("int").as("size_band"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_type"), col("size_band"))
    }),

    // small-quantity revenue forfeit (TPC-H Q17's correlated-avg
    // shape, decorrelated): the per-part mean quantity is ONE keyed
    // agg over the brand-pruned fact slice, joined back broadcast
    // (brand-parts-sized) — never a per-row subquery
    "q_small_qty_revenue" -> ((s, dir) => {
      val brandLines = Tables.lineitem(s, dir)
        .join(
          broadcast(Tables.table(s, dir, "part")
            .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
      val pa = brandLines
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sq"), count(lit(1)).as("nq"))
      brandLines
        .join(broadcast(pa), col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("double") <
          lit(0.2) * (col("sq").cast("double") / col("nq")))
        .agg(
          round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") / lit(7.0), 6)
            .as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // large-volume orders (TPC-H Q18's HAVING-join-back shape): the
    // quantity HAVING prunes on the FIRST shuffle (15k→tail), and
    // only survivors join orders/customer; TakeOrdered 100, no
    // global sort
    "q_large_orders" -> ((s, dir) => {
      val oq = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("tq"))
        .filter(col("tq") > 150)
      oq.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(
          col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"),
          round(col("tq").cast("double"), 6).as("total_qty"))
        .orderBy(desc("total_qty"), col("o_orderkey"))
        .limit(100)
    }),

    // disjunctive predicate bands (TPC-H Q19's shape): the OR of
    // three (brand, size, quantity) conjunctions — brand IN prunes
    // the broadcast part build, the residual disjunction evaluates
    // inside one codegen stage, one 1-row combine
    "q_disjunctive_filter" -> ((s, dir) => {
      val p = Tables.table(s, dir, "part")
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(16, 30) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(31, 50) &&
              col("l_quantity").between(20, 30)))
        .agg(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double"), 6).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // dormant high-balance customers (TPC-H Q22's shape): the global
    // positive-balance mean is a 1-row broadcast (exact decimal sum,
    // ONE double division — cross-engine safe), recent buyers leave
    // via a LeftAnti, one tiny segment agg
    "q_dormant_customers" -> ((s, dir) => {
      val cust = Tables.table(s, dir, "customer")
      val avgBal = cust
        .filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("ab"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 6).as("total_acctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // exact triangle census of the part co-purchase graph: pair
    // emission bounded by basket size (Σ|order|², never |parts|²),
    // degree-ordered orientation bounds the wedge join by O(m^1.5) on
    // ANY degree distribution — the node-iterator a 100 TB graph needs.
    // maxBasket = 50 so the mega-basket drop path runs UNDER the gate
    // (r13 VERDICT #4): lineitem baskets are ≤ 7 items, so the cap is
    // live but drops nothing and the DuckDB oracle is unchanged.
    "q_triangle_count" -> ((s, dir) =>
      graft.relops.GraphOps.triangleStats(
        graft.relops.GraphOps.coOccurrenceEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_partkey", maxBasket = 50))),

    // DOULION sampled tier of the census (r13 VERDICT #3, economics
    // reworked r15 per r14 VERDICT #1): keep each edge with p≈0.1 via
    // a portable integer hash (the oracle replays the identical keep
    // set), exact census on the survivors, scale by 1/p³. The keep
    // predicate rides INSIDE the pair emitter's join condition
    // (triangleStatsSampledFromBaskets), so the Σ|basket|² pair
    // output, the edge-dedup exchange, and the census ALL shrink by
    // ~p — the r14 form filtered after coOccurrenceEdges and paid the
    // dominant emission+distinct stage in full (a 5% saving); the
    // keep SET is unchanged (pure function of the endpoints, commutes
    // with distinct), so the oracle replay is the same formula at the
    // new threshold. The estimate is unbiased (error O(1/√(p³T))) and
    // TriangleSampledSpec gauges its relative error vs the exact card
    // the way the ANN tiers gauge recall; the bench emits the
    // exact/sampled wall-time ratio the tier exists to deliver.
    "q_triangle_sampled" -> ((s, dir) =>
      graft.relops.GraphOps.triangleStatsSampledFromBaskets(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        p = 0.1, seed = 7L, maxBasket = 50)),

    // association rules over the same baskets: support/confidence/
    // lift with a min-support floor — integer counts, one correctly-
    // rounded division, top-20 by lift. maxBasket = 50 live under the
    // gate, same no-op-at-this-scale reasoning as q_triangle_count.
    "q_basket_lift" -> ((s, dir) =>
      graft.relops.GraphOps.basketLift(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        minSupport = 3, k = 20, maxBasket = 50)),

    // 2-D Pareto frontier (skyline): cheapest-for-the-size parts —
    // the sweep runs on the distinct-price relation (bounded by value
    // resolution, tiny vs the corpus), comparisons only, zero FP
    // arithmetic; rows join back against the broadcast frontier
    "q_pareto_parts" -> ((s, dir) =>
      graft.relops.Stats.paretoFront2D(
        Tables.table(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size")),
        "p_retailprice", "p_size")
        .orderBy(col("p_retailprice"), col("p_partkey"))),

    // one DoReMi-style mixture-reweighting step (linearized
    // multiplicative weights, pluggable hardness = mean token
    // length): ONE corpus agg to the |sources|-row relation, decimal
    // normalizer — the data-mix tuning loop's inner update as a card
    "q_mix_update" -> ((s, dir) =>
      Sampling.mixUpdate(docs(s, dir), "source", "text", eta = 1.0)
        .orderBy(col("source"))),

    // reliability audit of the hashed-linear quality classifier:
    // hard-sigmoid confidence (rational — no libm exp) vs the
    // lang=='en' label, 10 equal-width bins, ECE + MCE in one
    // map-side-combined aggregation
    "q_ece_calibration" -> ((s, dir) => {
      val d      = docs(s, dir)
      val scored = Curation.hashedLinearScore(d, "doc_id", "text", nBuckets = 64)
      Score.calibrationEce(
        scored
          .join(d.select(col("doc_id"), (col("lang") === "en").as("is_en")), Seq("doc_id"))
          .withColumn("conf", greatest(lit(0.0), least(lit(1.0), lit(0.5) + col("logit")))),
        "conf", "is_en", nBins = 10)
    }),

    // decile lift / cumulative gain of the classifier ranking —
    // exact SQL-NTILE semantics WITHOUT a single-partition corpus
    // window: distinct-score run-length prefix + PARTITIONED
    // intra-score rank, tile = floor((rn-1)k/N)+1
    "q_decile_lift" -> ((s, dir) => {
      val d      = docs(s, dir)
      val scored = Curation.hashedLinearScore(d, "doc_id", "text", nBuckets = 64)
        .join(d.select(col("doc_id"), (col("lang") === "en").as("is_en")), Seq("doc_id"))
      Score.decileLift(scored, "logit", "doc_id", "is_en", nTiles = 10)
    }),

    // two-proportion z-test on keep rates between two sources (the
    // curation A/B readout) — keep thresholds at the corpus-mean
    // logit (decimal-exact sum, ONE double division, 1-row
    // broadcast), then one aggregation to four counts + pooled z
    "q_keep_rate_ab" -> ((s, dir) =>
      graft.relops.Stats.twoProportionZ(
        scoredKeeps(s, dir), "source", "src1", "src2", "keep")),

    // exact Mann–Whitney U with average-rank ties + tie-corrected z:
    // the location-shift twin of the KS card — integer math on the
    // distinct-length relation, one corpus aggregation
    "q_mann_whitney" -> ((s, dir) =>
      graft.relops.Stats.mannWhitneyU(docs(s, dir), "lang", "en", "de", "n_chars")),

    // exact ROC AUC of the classifier ranking (rank-sum identity,
    // ties = 0.5) — completes the classifier-eval suite: threshold
    // sweep (AUC) + bucket view (decile lift) + probability quality
    // (ECE); integer ranks on the distinct-score relation
    "q_auc_classifier" -> ((s, dir) => {
      val d = docs(s, dir)
      val scored = Curation.hashedLinearScore(d, "doc_id", "text", nBuckets = 64)
        .join(d.select(col("doc_id"), (col("lang") === "en").as("is_en")), Seq("doc_id"))
      Score.rocAuc(scored, "logit", "is_en")
    }),

    // k-sample location test: exact tie-corrected Kruskal–Wallis H
    // over doc lengths across ALL sources at once (the MW card
    // compares two) — integer rank sums on the distinct-length
    // relation, 6dp-decimal group fold for cross-engine determinism
    "q_kruskal_wallis" -> ((s, dir) =>
      graft.relops.Stats.kruskalWallis(docs(s, dir), "source", "n_chars")),

    // spread twin of the location tests: Brown–Forsythe (median-
    // centered Levene) variance-equality F across sources — group
    // medians from the histogram-quantile path, integral deviations,
    // per-group integer sums folded in 6dp decimals
    "q_levene" -> ((s, dir) =>
      graft.relops.Stats.leveneBrownForsythe(docs(s, dir), "source", "n_chars")),

    // paired-binary significance companion to q_filter_agreement:
    // McNemar on the discordant keep verdicts (classifier vs rule
    // bank, same parameterization as the agreement card)
    "q_mcnemar" -> ((s, dir) => {
      val d   = docs(s, dir)
      val clf = Curation.hashedLinearScore(d, "doc_id", "text", nBuckets = 64)
        .select(col("doc_id"), col("keep").as("clf_keep"))
      val rules = Curation.qualityRuleFlags(d, "doc_id", "text",
          minTokens = 20, maxTokens = 100000, minMeanLen = 2.0, maxMeanLen = 10.0)
        .select(col("doc_id"), col("keep").as("rules_keep"))
      graft.relops.Stats.mcnemar(clf.join(rules, Seq("doc_id")), "clf_keep", "rules_keep")
    }),

    // dense-nucleus card: k-core (k=80) of the co-purchase graph —
    // iterative peel to fixpoint (6 rounds at sf0.01/0.1, empty core
    // at sf0.001 — both the cascade and the empty-result path run
    // under the gate); monotone survivor sets make count equality the
    // exit test. The edge relation is persisted ONCE and re-restricted
    // per round with two semi-joins against the survivor NODE set —
    // only that node-sized set is localCheckpointed per round, never
    // the edges (GraphOps.kCore scaladoc documents the earlier
    // edge-checkpoint form this replaced)
    "q_kcore" -> ((s, dir) =>
      graft.relops.GraphOps.kCore(
        graft.relops.GraphOps.coOccurrenceEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_partkey", maxBasket = 50),
        k = 80).orderBy(col("v"))),

    // graph data card: degree spread, density, and Newman degree
    // assortativity of the co-purchase graph — moment sums over the
    // symmetrized edge⋈degree join, products in exact decimals
    "q_graph_profile" -> ((s, dir) =>
      graft.relops.GraphOps.degreeProfile(
        graft.relops.GraphOps.coOccurrenceEdges(
          Tables.lineitem(s, dir), "l_orderkey", "l_partkey", maxBasket = 50))),

    // the COMPOSED graph card (r15): census + profile + k-core
    // summaries off ONE persisted edge relation, as a long-format
    // (metric, value) table — the correctness-gated twin of the
    // bench's graph_e2e composition (the production sharing shape,
    // not three independent derivations); oracle recomputes every
    // metric from its own materialized edges CTE
    "q_graph_card" -> ((s, dir) =>
      graft.relops.GraphOps.graphCard(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey", k = 80, maxBasket = 50)),

    // HITS hubs/authorities on the bipartite customer→part purchase
    // graph (2 mutual-reinforcement rounds, L1-normalized, per-node
    // sums in exact decimals, normalizers as 1-row broadcasts)
    "q_hits" -> ((s, dir) =>
      graft.relops.GraphOps.hits(
        Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_partkey")),
        "o_custkey", "l_partkey", iters = 2)
        .orderBy(col("role"), col("id"))),

    // TPC-H Q21 plan shape (suppliers who kept orders waiting) with
    // the established Q4 lateness proxy (ship > orderdate + 30d; the
    // testdata has no commit/receipt dates). The correlated
    // EXISTS/NOT-EXISTS pair decorrelates into ONE per-order
    // aggregation (distinct suppliers, distinct LATE suppliers, and
    // the argmax late supplier) joined back — two shuffles total
    // instead of two fact-sized semi/anti joins; the only-late-one
    // test is n_late_supp = 1 AND l_suppkey = late_supp
    "q_waiting_suppliers" -> ((s, dir) => {
      val j = Tables.lineitem(s, dir)
        .join(
          Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      val perOrder = j.groupBy(col("l_orderkey")).agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      j.filter(col("late"))
        .join(
          perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
          Seq("l_orderkey"))
        .filter(col("l_suppkey") === col("late_supp"))
        .join(Tables.table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }),

    // ordinal signal-redundancy card: exact Kendall tau-b between the
    // doc-length and token-count deciles — O(N²) pair space collapsed
    // to 2-D dominance prefixes over the distinct-cell grid (two
    // cascaded windows, a Generate for the grid — no pair join, no
    // cartesian); both signals quantized to ≤ 20 buckets first, the
    // documented bounded-domain contract
    "q_kendall_tau" -> ((s, dir) =>
      graft.relops.Stats.kendallTauB(
        docs(s, dir).select(
          least(floor(col("n_chars") / 100), lit(19)).cast("long").as("len_bucket"),
          least(floor(TextStats.tokenCountWs(col("text")) / lit(40.0)), lit(19)).cast("long").as("tok_bucket")),
        "len_bucket", "tok_bucket")),

    // magnitude companion to q_mann_whitney on the same groups:
    // Cliff's delta (rank-sum identity) + Cohen's d (pooled SD) in
    // ONE distinct-value pass — at corpus scale any difference is
    // "significant"; these say whether it is LARGE
    "q_effect_sizes" -> ((s, dir) =>
      graft.relops.Stats.effectSizes(docs(s, dir), "lang", "en", "de", "n_chars")),

    // A/B variance-reduction card: CUPED-adjusted mean whitespace
    // token count per source, with doc length as the covariate —
    // theta from one exact-decimal moment pass, adjusted means from
    // per-group sums only
    "q_cuped" -> ((s, dir) =>
      graft.relops.Stats.cupedAdjustedMeans(
        docs(s, dir).select(
          col("source"),
          col("n_chars"),
          TextStats.tokenCountWs(col("text")).as("n_tok")),
        "source", "n_tok", "n_chars")
        .orderBy(col("source"))),

    // resampling companion to q_keep_rate_ab: Poisson-bootstrap CI
    // for the keep-rate DIFFERENCE between the two sources — the z
    // says significant, this says how big; same deterministic weight
    // field as q_poisson_bootstrap, one (rep, group) aggregation
    "q_bootstrap_diff" -> ((s, dir) =>
      graft.relops.Stats.poissonBootstrapDiff(
        scoredKeeps(s, dir), "source", "src1", "src2", "doc_id", "keep", b = 32)),

    // at-scale uncertainty card: Poisson-bootstrap CI for the mean
    // doc length — B=32 deterministic Poisson(1) row weights
    // (inverse-CDF on a replayable md5 hash), per-resample exact
    // integer sums, one aggregation; the corpus is never resampled
    // or shuffled B times
    "q_poisson_bootstrap" -> ((s, dir) =>
      graft.relops.Stats.poissonBootstrap(
        docs(s, dir), "doc_id", "n_chars", b = 32)),

    // quantile companion to q_poisson_bootstrap (r14 VERDICT #5):
    // p50/p90 doc-length CIs — per-resample quantile_disc over the
    // weighted value histogram (ONE corpus aggregation; windows only
    // over the bounded per-resample histogram), same deterministic
    // Poisson(1) weight field, point estimate via prefixBefore
    "q_bootstrap_quantile" -> ((s, dir) =>
      graft.relops.Stats.poissonBootstrapQuantile(
        docs(s, dir), "doc_id", "n_chars", probs = Seq(0.5, 0.9), b = 32)
        .orderBy(col("prob"))),

    // interpolated-quantile tier next to q_quantile_disc: SQL
    // quantile_cont semantics ((n-1)q fractional rank, linear
    // interpolation) on the same value-histogram state — both order
    // statistics fold into one conditional-min over the cumulative
    // histogram, no per-group value buffering
    "q_quantile_cont" -> ((s, dir) =>
      graft.relops.Stats.histogramQuantilesCont(
          docs(s, dir), "lang", "n_chars", Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy(col("lang"), col("prob"))),

    // Matryoshka truncation gauge: recall@20 of prefix-dim cosine
    // retrieval vs the full 64-dim top-20 at d = 8/16/32/64 — the
    // dimension-drop decay curve next to the quantization recall
    // gauges (binary/int8/PQ); truncation is a pure slice projection,
    // each prefix is one scan + TakeOrdered
    "q_matryoshka_recall" -> ((s, dir) =>
      Similarity.matryoshkaRecall(
        Tables.embeddings(s, dir), "vec_id", "embedding", queryVec(s, dir),
        k = 20, dims = Seq(8, 16, 32, 64))
        .orderBy(col("d_prefix"))),

    // model-version A/B on the SAME corpus: Wilcoxon signed-rank over
    // paired per-doc logits of the 64- vs 128-bucket hashed linear
    // classifiers (6dp integer micros — the established score grain);
    // zero diffs drop per Wilcoxon's rule, |d| ranks on the
    // distinct-diff relation, tie-corrected z
    "q_wilcoxon_signed" -> ((s, dir) =>
      graft.relops.Stats.wilcoxonSignedRank(
        Curation.hashedLinearScorePair(docs(s, dir), "doc_id", "text", 64, 128)
          .select(
            round(col("logit_a") * 1e6).cast("long").as("m64"),
            round(col("logit_b") * 1e6).cast("long").as("m128")),
        "m64", "m128"))
  )

  /** DuckDB fragment: the hashed-linear classifier's per-doc logit
    * (the q_quality_classifier computation — shared by the
    * decile-lift and keep-rate A/B oracles).
    */
  private val classifierLogitCtes =
    """toks AS (SELECT doc_id, t AS token
                FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
       b AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS bkt FROM toks),
       wt AS (SELECT doc_id,
                     CAST((('0x' || substr(md5('qcw:' || CAST(bkt AS VARCHAR)), 1, 15))::BIGINT
                           / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
              FROM b),
       lg AS (SELECT doc_id, round(CAST(sum(w) AS DOUBLE) / count(*), 6) AS logit
              FROM wt GROUP BY doc_id)"""

  /** DuckDB oracle for q_kcore: the peel loop unrolled to `rounds`
    * fixed iterations — sound because peeling is MONOTONE (survivor
    * sets only shrink) and idempotent at fixpoint, so extra rounds
    * are no-ops; `rounds` = 2× the measured max fixpoint depth
    * across sf0.001/0.01/0.1 (6), re-checked by KCoreSpec's
    * convergence assertion. CTEs are MATERIALIZED: each round
    * references the previous one 3× (direct + two IN subqueries), so
    * DuckDB's default inlining would expand the base scan 3^rounds
    * times ("too many open files" long before wrong results).
    * The last unrolled round doubles as a FIXPOINT ASSERTION
    * (r15 ADVICE): peeling is monotone, so e_rounds == e_{rounds-1}
    * iff the peel converged within the unroll; on a future SF whose
    * fixpoint needs more rounds the oracle must fail LOUDLY
    * (DuckDB error()) rather than silently return a non-fixpoint
    * superset that would read as an engine mismatch.
    */
  private def fixpointGuardCte(rounds: Int): String =
    s""",
          fp AS MATERIALIZED (SELECT CASE
                  WHEN (SELECT count(*) FROM e$rounds) = (SELECT count(*) FROM e${rounds - 1}) THEN 1
                  ELSE error('kcore oracle: peel not at fixpoint after $rounds unrolled rounds - raise the unroll depth') END AS ok)"""

  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val base =
      """WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                 FROM items a JOIN items b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""
    val peels = (1 to rounds).map { i =>
      s""",
          k$i AS MATERIALIZED (SELECT v FROM (SELECT pa AS v FROM e${i - 1} UNION ALL SELECT pb FROM e${i - 1})
                  GROUP BY v HAVING count(*) >= $k),
          e$i AS MATERIALIZED (SELECT pa, pb FROM e${i - 1}
                  WHERE pa IN (SELECT v FROM k$i) AND pb IN (SELECT v FROM k$i))"""
    }.mkString
    base + peels + fixpointGuardCte(rounds) +
      s"""
         SELECT v, CAST(count(*) AS BIGINT) AS core_deg
         FROM (SELECT pa AS v FROM e$rounds UNION ALL SELECT pb FROM e$rounds), fp
         WHERE fp.ok = 1
         GROUP BY v HAVING count(*) >= $k ORDER BY v"""
  }

  /** DuckDB oracle for q_graph_card: the composed (metric, value)
    * table — census + profile moments + the kcore peel unrolled to
    * `rounds` MATERIALIZED rounds (the q_kcore oracle's soundness
    * argument: peeling is monotone and idempotent at fixpoint, so
    * extra rounds are no-ops). Every metric recomputed from the ONE
    * materialized edges CTE; signed statistics carry the "+ 0"
    * canonicalization. Carries the same loud fixpoint guard as
    * [[kcoreOracleSql]] (r15 ADVICE).
    */
  private def graphCardOracleSql(k: Int, rounds: Int): String = {
    val base =
      """WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                 FROM items a JOIN items b
                   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""
    val peels = (1 to rounds).map { i =>
      s""",
          k$i AS MATERIALIZED (SELECT v FROM (SELECT pa AS v FROM e${i - 1} UNION ALL SELECT pb FROM e${i - 1})
                  GROUP BY v HAVING count(*) >= $k),
          e$i AS MATERIALIZED (SELECT pa, pb FROM e${i - 1}
                  WHERE pa IN (SELECT v FROM k$i) AND pb IN (SELECT v FROM k$i))"""
    }.mkString
    base + peels + fixpointGuardCte(rounds) +
      s""",
          core AS (SELECT v, count(*) AS core_deg
                   FROM (SELECT pa AS v FROM e$rounds UNION ALL SELECT pb FROM e$rounds)
                   GROUP BY v HAVING count(*) >= $k),
          deg AS (SELECT v, count(*) AS d
                  FROM (SELECT pa AS v FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY v),
          tri AS (SELECT count(*) AS t FROM e0 t1
                  JOIN e0 t2 ON t1.pb = t2.pa
                  JOIN e0 t3 ON t3.pa = t1.pa AND t3.pb = t2.pb),
          wed AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg),
          nn AS (SELECT count(*) AS n_nodes, max(d) AS max_degree FROM deg),
          ne AS (SELECT count(*) AS n_edges FROM e0),
          dd AS (SELECT CAST(du.d AS HUGEINT) AS x, CAST(dv.d AS HUGEINT) AS y
                 FROM (SELECT pa, pb FROM e0 UNION ALL SELECT pb, pa FROM e0) s(u, v)
                 JOIN deg du ON s.u = du.v JOIN deg dv ON s.v = dv.v),
          mom AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
                  FROM dd),
          ast AS (SELECT CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                              AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                         THEN round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                                    / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                           * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0
                         ELSE NULL END AS a
                 FROM mom),
          cm AS (SELECT count(*) AS n, min(core_deg) AS md FROM core)
         SELECT metric, value FROM (
           SELECT 'n_nodes' AS metric, CAST(n_nodes AS DOUBLE) AS value FROM nn
           UNION ALL SELECT 'n_edges', CAST(n_edges AS DOUBLE) FROM ne
           UNION ALL SELECT 'n_triangles', CAST(t AS DOUBLE) FROM tri
           UNION ALL SELECT 'n_wedges', CAST(w AS DOUBLE) FROM wed
           UNION ALL SELECT 'global_clustering',
             (SELECT CASE WHEN wed.w > 0 THEN round(3.0 * tri.t / wed.w, 6) ELSE 0.0 END FROM tri, wed)
           UNION ALL SELECT 'avg_degree',
             (SELECT CASE WHEN nn.n_nodes > 0 THEN round(2.0 * ne.n_edges / nn.n_nodes, 6) ELSE NULL END FROM nn, ne)
           UNION ALL SELECT 'max_degree', CAST(max_degree AS DOUBLE) FROM nn
           UNION ALL SELECT 'density',
             (SELECT CASE WHEN nn.n_nodes > 1
                          THEN round(2.0 * ne.n_edges / (CAST(nn.n_nodes AS DOUBLE) * (nn.n_nodes - 1)), 6)
                          ELSE NULL END FROM nn, ne)
           UNION ALL SELECT 'assortativity', a FROM ast
           UNION ALL SELECT 'kcore_nodes', CAST(n AS DOUBLE) FROM cm
           UNION ALL SELECT 'kcore_min_deg', CAST(md AS DOUBLE) FROM cm) AS card, fp
         WHERE fp.ok = 1
         ORDER BY metric"""
  }

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
        f1s AS (SELECT e.doc_id, e.extractor, e.pred, e.gold,
                       len(list_filter(string_split(e.pred, ' '), x -> len(x) > 0)) AS np,
                       len(list_filter(string_split(e.gold, ' '), x -> len(x) > 0)) AS ng,
                       CAST(coalesce(iv.same, 0) AS DOUBLE) AS same,
                       CASE WHEN np = 0 OR ng = 0 THEN (CASE WHEN np = ng THEN 1.0 ELSE 0.0 END)
                            WHEN same = 0 THEN 0.0
                            ELSE 2.0 * (same / np) * (same / ng) / ((same / np) + (same / ng)) END AS f1
                FROM ext e LEFT JOIN iv ON e.doc_id = iv.doc_id AND e.extractor = iv.extractor)"""

  /** DuckDB-equivalent ANSI SQL per queries key (same tables). */
  def oracleSql: Map[String, String] = ListMap(
    "q_unpivot" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
          t AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type),
          c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type)
         SELECT u.user_id, t.event_type, COALESCE(c.n, 0) AS n
         FROM u CROSS JOIN t
         LEFT JOIN c ON u.user_id = c.user_id AND t.event_type = c.event_type
         ORDER BY u.user_id, t.event_type""",

    "q_curriculum" ->
      """SELECT lang, doc_id, n_chars,
                ntile(4) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS bucket
         FROM documents ORDER BY lang, doc_id""",

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
                 round(avg(CASE WHEN trim(gold) <> '' AND lower(trim(gold)) <> 'none' THEN 1.0 ELSE 0.0 END), 6) AS extraction_fraction
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
          ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY avg_f1 DESC, med_f1 DESC, extractor ASC) AS INT) AS rank
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
            AND EXISTS (SELECT 1 FROM counted WHERE num_fns > 0)
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

    "q_lr_features" ->
      s"""WITH $votesCtes,
          wide AS (SELECT doc_id,
                          CAST(coalesce(max(CASE WHEN extractor = 'v1' THEN vote END), 0) AS DOUBLE) AS v1,
                          CAST(coalesce(max(CASE WHEN extractor = 'v2' THEN vote END), 0) AS DOUBLE) AS v2,
                          CAST(coalesce(max(CASE WHEN extractor = 'v3' THEN vote END), 0) AS DOUBLE) AS v3
                   FROM votes GROUP BY doc_id)
          SELECT doc_id, feature, value FROM (
            SELECT doc_id, 'v1' AS feature, v1 AS value FROM wide
            UNION ALL SELECT doc_id, 'v2', v2 FROM wide
            UNION ALL SELECT doc_id, 'v3', v3 FROM wide
            UNION ALL SELECT doc_id, 'v1*v2', v1 * v2 FROM wide
            UNION ALL SELECT doc_id, 'v1*v3', v1 * v3 FROM wide
            UNION ALL SELECT doc_id, 'v2*v3', v2 * v3 FROM wide)
          ORDER BY doc_id, feature""",

    "q_dp_patterns" ->
      s"""WITH $votesCtes,
          wide AS (SELECT doc_id,
                          coalesce(max(CASE WHEN extractor = 'v1' THEN vote END), 0) AS v_v1,
                          coalesce(max(CASE WHEN extractor = 'v2' THEN vote END), 0) AS v_v2,
                          coalesce(max(CASE WHEN extractor = 'v3' THEN vote END), 0) AS v_v3
                   FROM votes GROUP BY doc_id)
          SELECT v_v1, v_v2, v_v3, count(*) AS n
          FROM wide GROUP BY v_v1, v_v2, v_v3 ORDER BY v_v1, v_v2, v_v3""",

    "q_cond_entropy" ->
      s"""WITH $votesCtes,
          accs AS (SELECT v.extractor,
                          least(greatest(avg(CASE WHEN v.vote = g.y THEN 1.0 ELSE 0.0 END), 0.0001), 0.9999) AS acc
                   FROM votes v JOIN gold g ON v.doc_id = g.doc_id
                   WHERE v.vote <> 0 GROUP BY v.extractor),
          scored AS (SELECT v.doc_id,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = 1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_pos,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = -1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_neg
                     FROM votes v JOIN accs a ON v.extractor = a.extractor
                     GROUP BY v.doc_id),
          post AS (SELECT doc_id, 0.5 * score_pos / (0.5 * score_pos + 0.5 * score_neg) AS p FROM scored)
          SELECT round(-avg(CASE WHEN p > 0 THEN p * ln(p) ELSE 0.0 END +
                            CASE WHEN p < 1 THEN (1.0 - p) * ln(1.0 - p) ELSE 0.0 END), 6) AS h_cond,
                 count(*) AS n_docs
          FROM post""",

    "q_cross_entropy" ->
      s"""WITH $votesCtes,
          accs AS (SELECT v.extractor,
                          least(greatest(avg(CASE WHEN v.vote = g.y THEN 1.0 ELSE 0.0 END), 0.0001), 0.9999) AS acc
                   FROM votes v JOIN gold g ON v.doc_id = g.doc_id
                   WHERE v.vote <> 0 GROUP BY v.extractor),
          scored AS (SELECT v.doc_id,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = 1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_pos,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = -1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_neg
                     FROM votes v JOIN accs a ON v.extractor = a.extractor
                     GROUP BY v.doc_id),
          post AS (SELECT s.doc_id,
                          CASE WHEN g.y = 1 THEN 0.5 * s.score_pos / (0.5 * s.score_pos + 0.5 * s.score_neg)
                               ELSE 0.5 * s.score_neg / (0.5 * s.score_pos + 0.5 * s.score_neg) END AS p_gold
                   FROM scored s JOIN gold g ON s.doc_id = g.doc_id)
          SELECT round(-avg(ln(greatest(p_gold, 1e-300))), 6) AS ce_cond, count(*) AS n_docs
          FROM post""",

    "q_cond_entropy_mv" ->
      s"""WITH $votesCtes,
          mvp AS (SELECT doc_id, CASE WHEN sum(vote) >= 0 THEN 1 ELSE -1 END AS mv_pred
                  FROM votes GROUP BY doc_id),
          yacc AS (SELECT m.mv_pred, avg(CASE WHEN g.y = 1 THEN 1.0 ELSE 0.0 END) AS p_pos
                   FROM mvp m JOIN gold g ON m.doc_id = g.doc_id GROUP BY m.mv_pred),
          hs AS (SELECT mv_pred,
                        CASE WHEN p_pos > 0 THEN -p_pos * ln(p_pos) ELSE 0.0 END +
                        CASE WHEN p_pos < 1 THEN -(1.0 - p_pos) * ln(1.0 - p_pos) ELSE 0.0 END AS h
                 FROM yacc)
          SELECT round(avg(h), 6) AS h_mv, count(*) AS n_docs
          FROM mvp m JOIN hs ON m.mv_pred = hs.mv_pred""",

    "q_cond_entropy_singleton" ->
      s"""WITH $votesCtes,
          accs AS (SELECT v.extractor,
                          least(greatest(avg(CASE WHEN v.vote = g.y THEN 1.0 ELSE 0.0 END), 0.0001), 0.9999) AS acc
                   FROM votes v JOIN gold g ON v.doc_id = g.doc_id
                   WHERE v.vote <> 0 GROUP BY v.extractor),
          scored AS (SELECT v.doc_id,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = 1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_pos,
                            exp(sum(CASE WHEN v.vote = 0 THEN 0.0 WHEN v.vote = -1 THEN ln(a.acc) ELSE ln(1.0 - a.acc) END)) AS score_neg
                     FROM votes v JOIN accs a ON v.extractor = a.extractor
                     GROUP BY v.doc_id),
          post AS (SELECT doc_id,
                          0.5 * score_pos / (0.5 * score_pos + 0.5 * score_neg) AS p,
                          CASE WHEN score_pos >= score_neg THEN 1 ELSE -1 END AS pred
                   FROM scored),
          yacc AS (SELECT p2.pred, avg(CASE WHEN g.y = 1 THEN 1.0 ELSE 0.0 END) AS p_pos
                   FROM post p2 JOIN gold g ON p2.doc_id = g.doc_id GROUP BY p2.pred),
          hs AS (SELECT max(CASE WHEN pred = 1 THEN h END) AS h_pos,
                        max(CASE WHEN pred = -1 THEN h END) AS h_neg
                 FROM (SELECT pred,
                              CASE WHEN p_pos > 0 THEN -p_pos * ln(p_pos) ELSE 0.0 END +
                              CASE WHEN p_pos < 1 THEN -(1.0 - p_pos) * ln(1.0 - p_pos) ELSE 0.0 END AS h
                       FROM yacc))
          SELECT round(avg(p * coalesce(h_pos, 0.0) + (1.0 - p) * coalesce(h_neg, 0.0)), 6) AS h_singleton,
                 count(*) AS n_docs
          FROM post LEFT JOIN hs ON true""",

    "q_field_count" ->
      s"""WITH $fieldCountSql
          SELECT field, n_docs FROM fc ORDER BY field""",

    "q_rank_attributes" ->
      s"""WITH $fieldCountSql
          SELECT field, n_docs, rank FROM (
            SELECT *, CAST(row_number() OVER (ORDER BY n_docs DESC, field ASC) AS INT) AS rank FROM fc)
          WHERE rank <= 10 ORDER BY rank""",

    "q_rerank_merge" ->
      s"""WITH $fieldCountSql,
          votes AS (SELECT t AS field, 2 * count(*) AS votes
                    FROM (SELECT DISTINCT doc_id, t
                          FROM documents, unnest(string_split(text, ' ')) AS u(t)
                          WHERE len(t) > 0 AND doc_id % 3 = 0)
                    GROUP BY t)
          SELECT fc.field, fc.n_docs, coalesce(v.votes, 0) AS votes,
                 round(CASE WHEN v.votes > 1 THEN CAST(v.votes AS DOUBLE) * fc.n_docs
                            WHEN v.votes IS NOT NULL THEN CAST(fc.n_docs AS DOUBLE)
                            ELSE fc.n_docs / 2.0 END, 6) AS merged
          FROM fc LEFT JOIN votes v ON fc.field = v.field ORDER BY fc.field""",

    "q_schema_eval_at_k" ->
      s"""WITH $fieldCountSql,
          ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY n_docs DESC, field ASC) AS INT) AS rank FROM fc),
          total AS (SELECT count(*) AS n FROM documents),
          gold AS (SELECT field FROM fc, total WHERE n_docs >= 0.6 * total.n),
          ks(k) AS (VALUES (1), (5), (10)),
          hits AS (SELECT r.rank FROM ranked r JOIN gold g ON r.field = g.field),
          agg AS (SELECT ks.k, count(h.rank) AS n_hit
                  FROM ks LEFT JOIN hits h ON h.rank <= ks.k GROUP BY ks.k),
          ng AS (SELECT count(*) AS n_gold FROM gold)
          SELECT k, n_hit,
                 round(CAST(n_hit AS DOUBLE) / k, 6) AS precision,
                 round(CAST(n_hit AS DOUBLE) / n_gold, 6) AS recall,
                 round(CASE WHEN (CAST(n_hit AS DOUBLE) / k) + (CAST(n_hit AS DOUBLE) / n_gold) > 0.0
                            THEN 2.0 * (CAST(n_hit AS DOUBLE) / k) * (CAST(n_hit AS DOUBLE) / n_gold)
                                 / ((CAST(n_hit AS DOUBLE) / k) + (CAST(n_hit AS DOUBLE) / n_gold))
                            ELSE 0.0 END, 6) AS f1
          FROM agg, ng ORDER BY k""",

    "q_attr_dedup" ->
      s"""WITH $fieldCountSql
          SELECT field AS attribute, n_docs AS metric FROM fc c
          WHERE NOT EXISTS (SELECT 1 FROM fc o
                            WHERE o.field <> c.field AND contains(o.field, c.field)
                              AND o.n_docs = c.n_docs)
          ORDER BY attribute""",

    "q_attr_validity_agg" ->
      """WITH ex AS (SELECT event_type AS attribute,
                            CAST(CAST(floor(value / 50) AS BIGINT) AS VARCHAR) AS value
                     FROM events),
         modes AS (SELECT attribute, value AS mode_val FROM (
                     SELECT attribute, value, count(*) AS n,
                            row_number() OVER (PARTITION BY attribute ORDER BY count(*) DESC, value ASC) AS rk
                     FROM ex WHERE value IS NOT NULL GROUP BY attribute, value)
                   WHERE rk = 1),
         agg AS (SELECT attribute, count(DISTINCT value) AS n_distinct,
                        avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END) AS null_frac
                 FROM ex GROUP BY attribute)
         SELECT a.attribute, a.n_distinct, m.mode_val, round(a.null_frac, 6) AS null_frac,
                (a.n_distinct <= 1 OR a.null_frac >= 1.0) AS drop_attr
         FROM agg a LEFT JOIN modes m ON a.attribute = m.attribute ORDER BY a.attribute""",

    "q_gold_attr_rank" ->
      s"""WITH tr AS (${triplesSql()})
          SELECT attribute, n_nonnull, rank FROM (
            SELECT attribute,
                   CAST(sum(CASE WHEN value IS NOT NULL AND len(trim(value)) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonnull,
                   CAST(row_number() OVER (ORDER BY sum(CASE WHEN value IS NOT NULL AND len(trim(value)) > 0 THEN 1 ELSE 0 END) DESC, attribute ASC) AS INT) AS rank
            FROM tr GROUP BY attribute)
          ORDER BY rank""",

    "q_set_intersect" ->
      """SELECT DISTINCT lang FROM documents WHERE doc_id % 2 = 0
         INTERSECT
         SELECT DISTINCT lang FROM documents WHERE n_chars % 2 = 0
         ORDER BY lang""",

    "q_set_except" ->
      """SELECT DISTINCT source FROM documents WHERE lang = 'en'
         EXCEPT
         SELECT DISTINCT source FROM documents WHERE lang = 'zh'
         ORDER BY source""",

    "q_attr_alias_join" ->
      """WITH l AS (SELECT DISTINCT event_type AS attr_a FROM events),
          r AS (SELECT DISTINCT event_type || 's' AS attr_b FROM events)
         SELECT attr_a, attr_b FROM l JOIN r
           ON lower(attr_a) = lower(attr_b)
              OR lower(attr_a) || 's' = lower(attr_b)
              OR lower(attr_b) || 's' = lower(attr_a)
              OR replace(lower(attr_a), ' ', '') = replace(lower(attr_b), ' ', '')
         ORDER BY attr_a, attr_b""",

    "q_openie_prf" ->
      s"""WITH pred AS (SELECT DISTINCT doc_id, attribute, value FROM (${triplesSql()}) WHERE len(value) > 0),
          gold AS (SELECT DISTINCT doc_id, attribute, value FROM (${triplesSql(200)}) WHERE len(value) > 0),
          np AS (SELECT CAST(count(*) AS DOUBLE) AS np FROM pred),
          ng AS (SELECT CAST(count(*) AS DOUBLE) AS ng FROM gold),
          ni AS (SELECT CAST(count(*) AS DOUBLE) AS ni FROM (SELECT * FROM pred INTERSECT SELECT * FROM gold))
          SELECT round(CASE WHEN np > 0 THEN ni / np ELSE 0.0 END, 6) AS precision,
                 round(CASE WHEN ng > 0 THEN ni / ng ELSE 0.0 END, 6) AS recall,
                 round(CASE WHEN (CASE WHEN np > 0 THEN ni / np ELSE 0.0 END)
                           + (CASE WHEN ng > 0 THEN ni / ng ELSE 0.0 END) > 0.0
                            THEN 2.0 * (CASE WHEN np > 0 THEN ni / np ELSE 0.0 END)
                                     * (CASE WHEN ng > 0 THEN ni / ng ELSE 0.0 END)
                                 / ((CASE WHEN np > 0 THEN ni / np ELSE 0.0 END)
                                  + (CASE WHEN ng > 0 THEN ni / ng ELSE 0.0 END))
                            ELSE 0.0 END, 6) AS f1
          FROM np, ng, ni""",

    "q_attr_slices" ->
      s"""WITH tr AS (${triplesSql()}),
          total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
          SELECT attribute, count(*) AS n_docs,
                 round(CAST(count(*) AS DOUBLE) / max(total.n), 6) AS coverage,
                 round(avg(len(value)), 6) AS avg_len,
                 (CAST(count(*) AS DOUBLE) / max(total.n)) >= 0.5 AS head_attr,
                 avg(len(value)) < 20.0 AS structured
          FROM tr, total WHERE value IS NOT NULL AND len(value) > 0
          GROUP BY attribute ORDER BY attribute""",

    "q_chunk_backoff" ->
      s"""WITH chunks AS (
            SELECT doc_id, CAST(i AS INT) AS chunk_id
            FROM documents,
                 unnest(range(0, GREATEST(CAST(ceil(length(text)/$ChunkSize.0) AS INT), 1))) AS t(i)),
          stats AS (SELECT avg(n) + coalesce(stddev_samp(n), 0) AS cutoff
                    FROM (SELECT doc_id, count(*) AS n FROM chunks GROUP BY doc_id))
          SELECT doc_id, chunk_id FROM chunks, stats
          WHERE chunk_id <= cutoff ORDER BY doc_id, chunk_id""",

    "q_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          scored AS (SELECT vec_id, round(${cosSql("e.embedding", "q.qe")}, 6) AS cos
                     FROM embeddings e, q)
          SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 20""",

    "q_ann_ivf" ->
      s"""WITH $ivfCtes
          SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM ivf_scored ORDER BY cos DESC, vec_id ASC LIMIT 20""",

    "q_ann_recall" ->
      s"""WITH $ivfCtes,
          ivf_k AS (SELECT vec_id FROM ivf_scored ORDER BY cos DESC, vec_id ASC LIMIT 20),
          bf_k AS (SELECT vec_id FROM (
                     SELECT e.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                     FROM e2 e, q)
                   ORDER BY cos DESC, vec_id ASC LIMIT 20),
          ov AS (SELECT CAST(count(*) AS INT) AS n_overlap
                 FROM bf_k JOIN ivf_k USING (vec_id))
          SELECT n_overlap, round(CAST(n_overlap AS DOUBLE) / 20, 6) AS recall FROM ov""",

    // generic replication of evaluateEndToEnd over the same synthetic
    // run artifact: alias theta-join, gold-derived slices, per-slice
    // set-PRF (hallucinated attrs stay in pred for EVERY slice), and
    // CLOSED-FORM per-cell token-F1 derived independently from the
    // construction (pred==gold -> 1, abstain/corrupted -> 0)
    "q_eval_e2e" ->
      s"""WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id, text, lang FROM documents),
          g AS (SELECT path, 'topic' AS attribute, split_part(text, ' ', 1) AS value FROM d
                WHERE length(split_part(text, ' ', 1)) > 0
                UNION ALL SELECT path, 'snippet', substr(text, 1, 40) FROM d
                UNION ALL SELECT path, 'lang_code', lang FROM d WHERE doc_id % 4 = 0),
          p AS (SELECT path, 'topics' AS attribute, split_part(text, ' ', 1) AS value FROM d
                WHERE doc_id % 3 <> 0 AND length(split_part(text, ' ', 1)) > 0
                UNION ALL SELECT path, 'snippet',
                  CASE WHEN doc_id % 5 = 0 THEN 'zzqx' ELSE substr(text, 1, 40) END FROM d
                UNION ALL SELECT path, 'junk', 'noise' FROM d WHERE doc_id % 7 = 0),
          ranked(field, rank) AS (VALUES ('topic', 1), ('junk', 2), ('snippet', 3)),
          ks(k) AS (VALUES (1), (3)),
          gattrs AS (SELECT DISTINCT attribute FROM g),
          sch AS (SELECT k,
                         (SELECT count(*) FROM ranked r
                          WHERE r.rank <= ks.k AND r.field IN (SELECT attribute FROM gattrs)) AS n_hit,
                         (SELECT count(*) FROM gattrs) AS n_gold
                  FROM ks),
          schv AS (SELECT k, CAST(n_hit AS DOUBLE) / k AS precision,
                          CAST(n_hit AS DOUBLE) / n_gold AS recall FROM sch),
          sch_m AS (SELECT 'schema_id' AS stage, 'k=' || CAST(k AS VARCHAR) AS slice, 'precision' AS metric, precision AS value FROM schv
                    UNION ALL SELECT 'schema_id', 'k=' || CAST(k AS VARCHAR), 'recall', recall FROM schv
                    UNION ALL SELECT 'schema_id', 'k=' || CAST(k AS VARCHAR), 'f1',
                      CASE WHEN precision + recall > 0 THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END FROM schv),
          pexact AS (SELECT DISTINCT p.attribute FROM p
                     WHERE p.attribute IN (SELECT attribute FROM gattrs)),
          amap AS (SELECT pa.attribute AS attr_a, min(ga.attribute) AS gold_attr
                   FROM (SELECT DISTINCT attribute FROM p
                         WHERE attribute NOT IN (SELECT attribute FROM pexact)) pa
                   JOIN (SELECT attribute FROM gattrs
                         WHERE attribute NOT IN (SELECT attribute FROM pexact)) ga
                     ON lower(pa.attribute) = lower(ga.attribute)
                     OR lower(pa.attribute) || 's' = lower(ga.attribute)
                     OR lower(ga.attribute) || 's' = lower(pa.attribute)
                     OR replace(lower(pa.attribute), ' ', '') = replace(lower(ga.attribute), ' ', '')
                   GROUP BY pa.attribute),
          mapped AS (SELECT p.path, coalesce(m.gold_attr, p.attribute) AS attribute, p.value
                     FROM p LEFT JOIN amap m ON p.attribute = m.attr_a),
          onep AS (SELECT path, attribute, min(value) AS pred
                   FROM mapped GROUP BY path, attribute),
          cells AS (SELECT g.value AS gold, coalesce(op.pred, '') AS pred
                    FROM g LEFT JOIN onep op ON g.path = op.path AND g.attribute = op.attribute),
          ext AS (SELECT avg(CASE WHEN pred = gold THEN 1.0 ELSE 0.0 END) AS avg_f1,
                         quantile_cont(CASE WHEN pred = gold THEN 1.0 ELSE 0.0 END, 0.5) AS med_f1,
                         avg(CASE WHEN trim(gold) <> '' AND lower(trim(gold)) <> 'none' THEN 1.0 ELSE 0.0 END) AS extraction_fraction
                  FROM cells),
          ext_m AS (SELECT 'extraction' AS stage, 'all' AS slice, 'avg_f1' AS metric, avg_f1 AS value FROM ext
                    UNION ALL SELECT 'extraction', 'all', 'med_f1', med_f1 FROM ext
                    UNION ALL SELECT 'extraction', 'all', 'extraction_fraction', extraction_fraction FROM ext),
          tot AS (SELECT count(DISTINCT path) AS n FROM g),
          sl AS (SELECT attribute, count(*) AS n_docs, avg(length(value)) AS avg_len
                 FROM g WHERE value IS NOT NULL AND length(value) > 0 GROUP BY attribute),
          smem AS (SELECT 'all' AS sname, attribute FROM sl
                   UNION ALL SELECT 'head', attribute FROM sl, tot WHERE CAST(n_docs AS DOUBLE) / tot.n >= 0.5
                   UNION ALL SELECT 'tail', attribute FROM sl, tot WHERE CAST(n_docs AS DOUBLE) / tot.n < 0.5
                   UNION ALL SELECT 'structured', attribute FROM sl WHERE avg_len < 20.0
                   UNION ALL SELECT 'unstructured', attribute FROM sl WHERE avg_len >= 20.0),
          snames(sname) AS (VALUES ('all'), ('head'), ('tail'), ('structured'), ('unstructured')),
          ptrip AS (SELECT DISTINCT path, attribute, lower(trim(value)) AS value FROM mapped
                    WHERE value IS NOT NULL AND length(lower(trim(value))) > 0),
          gtrip AS (SELECT DISTINCT path, attribute, lower(trim(value)) AS value FROM g
                    WHERE value IS NOT NULL AND length(lower(trim(value))) > 0),
          pslice AS (SELECT DISTINCT sn.sname, t.path, t.attribute, t.value
                     FROM snames sn CROSS JOIN ptrip t
                     WHERE t.attribute IN (SELECT attribute FROM smem m WHERE m.sname = sn.sname)
                        OR t.attribute NOT IN (SELECT attribute FROM sl)),
          gslice AS (SELECT DISTINCT sn.sname, t.path, t.attribute, t.value
                     FROM snames sn CROSS JOIN gtrip t
                     WHERE t.attribute IN (SELECT attribute FROM smem m WHERE m.sname = sn.sname)),
          np AS (SELECT sname, count(*) AS n FROM pslice GROUP BY sname),
          ng AS (SELECT sname, count(*) AS n FROM gslice GROUP BY sname),
          ni AS (SELECT px.sname, count(*) AS n FROM pslice px
                 JOIN gslice gx ON px.sname = gx.sname AND px.path = gx.path
                  AND px.attribute = gx.attribute AND px.value = gx.value
                 GROUP BY px.sname),
          prf AS (SELECT sn.sname,
                         CASE WHEN coalesce(np.n, 0) > 0 THEN CAST(coalesce(ni.n, 0) AS DOUBLE) / np.n ELSE 0.0 END AS precision,
                         CASE WHEN coalesce(ng.n, 0) > 0 THEN CAST(coalesce(ni.n, 0) AS DOUBLE) / ng.n ELSE 0.0 END AS recall
                  FROM snames sn
                  LEFT JOIN np ON sn.sname = np.sname
                  LEFT JOIN ng ON sn.sname = ng.sname
                  LEFT JOIN ni ON sn.sname = ni.sname),
          op_m AS (SELECT 'openie' AS stage, sname AS slice, 'precision' AS metric, precision AS value FROM prf
                   UNION ALL SELECT 'openie', sname, 'recall', recall FROM prf
                   UNION ALL SELECT 'openie', sname, 'f1',
                     CASE WHEN precision + recall > 0 THEN 2 * precision * recall / (precision + recall) ELSE 0.0 END FROM prf)
         SELECT stage, slice, metric, round(value, 6) AS value
         FROM (SELECT * FROM sch_m UNION ALL SELECT * FROM ext_m UNION ALL SELECT * FROM op_m)
         ORDER BY stage, slice, metric""",

    "q_ann_graph" ->
      s"""WITH $graphAnnCtes
          SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM b2 ORDER BY cos DESC, vec_id ASC LIMIT 20""",

    "q_ann_graph_recall" ->
      s"""WITH $graphAnnCtes,
          g_k AS (SELECT vec_id FROM b2 ORDER BY cos DESC, vec_id ASC LIMIT 20),
          bf_k AS (SELECT vec_id FROM (
                     SELECT e.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                     FROM e2 e, q)
                   ORDER BY cos DESC, vec_id ASC LIMIT 20),
          ov AS (SELECT CAST(count(*) AS INT) AS n_overlap
                 FROM bf_k JOIN g_k USING (vec_id))
          SELECT n_overlap, round(CAST(n_overlap AS DOUBLE) / 20, 6) AS recall FROM ov""",

    "q_ann_binary_recall" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm,
                            CAST(list_sum(list_transform(range(1, 33),
                              i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0 THEN power(2, i - 1) ELSE 0 END)) AS BIGINT) AS w0,
                            CAST(list_sum(list_transform(range(33, 65),
                              i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0 THEN power(2, i - 33) ELSE 0 END)) AS BIGINT) AS w1
                     FROM embeddings),
          q AS (SELECT w0 AS q0, w1 AS q1, embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0),
          cand AS (SELECT e.vec_id, e.embedding, e.nrm,
                          bit_count(xor(e.w0, q.q0)) + bit_count(xor(e.w1, q.q1)) AS hamming
                   FROM e, q ORDER BY hamming, e.vec_id LIMIT 40),
          bin_k AS (SELECT vec_id FROM (
                      SELECT c.vec_id, round(${cosNSql(dotSql("c.embedding", "q.qe"), "c.nrm", "q.qn")}, 6) AS cos
                      FROM cand c, q)
                    ORDER BY cos DESC, vec_id ASC LIMIT 20),
          bf_k AS (SELECT vec_id FROM (
                     SELECT e.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                     FROM e e, q)
                   ORDER BY cos DESC, vec_id ASC LIMIT 20),
          ov AS (SELECT CAST(count(*) AS INT) AS n_overlap
                 FROM bf_k JOIN bin_k USING (vec_id))
         SELECT n_overlap, round(CAST(n_overlap AS DOUBLE) / 20, 6) AS recall FROM ov""",

    "q_rank_metrics" ->
      s"""WITH $ivfCtes,
          ivf_k AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
                    FROM ivf_scored ORDER BY cos DESC, vec_id ASC LIMIT 20),
          bf_k AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
                   FROM (SELECT e.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                         FROM e2 e, q)
                   ORDER BY cos DESC, vec_id ASC LIMIT 20),
          rel AS (SELECT i.rank FROM ivf_k i JOIN bf_k b USING (vec_id)),
          m AS (SELECT CAST(count(*) AS INT) AS n_overlap, min(rank) AS first_rel,
                       sum(CAST(1.0 / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)) AS DECIMAL(27,18))) AS dcg
                FROM rel),
          i AS (SELECT sum(CAST(1.0 / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)) AS DECIMAL(27,18))) AS idcg
                FROM bf_k)
          SELECT n_overlap,
                 round(CAST(n_overlap AS DOUBLE) / 20, 6) AS p_at_k,
                 round(CASE WHEN first_rel IS NULL THEN 0.0 ELSE 1.0 / first_rel END, 6) AS mrr,
                 round(CASE WHEN idcg IS NULL OR idcg = 0 THEN 0.0
                            ELSE coalesce(CAST(dcg AS DOUBLE), 0.0) / CAST(idcg AS DOUBLE) END, 6) AS ndcg
          FROM m, i""",

    "q_proto_prune" ->
      s"""WITH $ivfCtes,
          pr AS (SELECT a.vec_id, a.centroid_id,
                        round(${cosNSql(dotSql("a.embedding", "c.ce"), "a.nrm", "c.cn")}, 6) AS cos_centroid
                 FROM asg a JOIN c ON a.centroid_id = c.cid),
          rk AS (SELECT vec_id, centroid_id, cos_centroid,
                        CAST(row_number() OVER (
                          PARTITION BY centroid_id
                          ORDER BY cos_centroid DESC, vec_id ASC) AS INT) AS rank_in_cluster,
                        CAST(count(*) OVER (PARTITION BY centroid_id) AS INT) AS n_in_cluster
                 FROM pr)
          SELECT vec_id, centroid_id, cos_centroid, rank_in_cluster, n_in_cluster
          FROM rk WHERE (rank_in_cluster - 1) * 5 < n_in_cluster * 4
          ORDER BY centroid_id, rank_in_cluster""",

    "q_ann_pq" -> pqSql,

    "q_ann_ivfpq" -> ivfPqSql,

    "q_ann_pq_recall" -> pqRecallSql,

    "q_ann_lsh" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          sigs AS (SELECT vec_id, embedding, nrm,
                          CAST(list_sum(list_transform(range(0, 6), b ->
                            CASE WHEN list_sum(list_transform(range(1, 65), i ->
                                        CAST(embedding[i] AS DOUBLE) * $lshPlaneSql)) > 0
                                 THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
                   FROM e2),
          q AS (SELECT embedding AS qe, nrm AS qn, sig AS qsig FROM sigs WHERE vec_id = 0),
          cand AS (SELECT s.vec_id, s.sig,
                          round(${cosNSql(dotSql("s.embedding", "q.qe"), "s.nrm", "q.qn")}, 6) AS cos
                   FROM sigs s, q WHERE bit_count(xor(s.sig, q.qsig)) <= 2)
          SELECT vec_id, sig, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM (SELECT * FROM cand ORDER BY cos DESC, vec_id ASC LIMIT 20) ORDER BY rank""",

    "q_embed_mean_pool" ->
      """SELECT label, CAST(i AS INT) AS dim, CAST(count(*) AS INT) AS n_vecs,
                round(CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(27,18))) AS DOUBLE) / count(*), 6) AS mean
         FROM embeddings, unnest(range(1, 65)) AS u(i)
         GROUP BY label, i ORDER BY label, dim""",

    "q_ann_int8" ->
      s"""WITH e AS (SELECT vec_id, embedding,
                            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          es AS (SELECT vec_id, embedding, v,
                        CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0 THEN 0.0
                             ELSE CAST(127 AS DOUBLE) / list_max(list_transform(v, x -> abs(x))) END AS scale
                 FROM e),
          eq AS (SELECT vec_id, embedding, v, scale,
                        list_transform(v, x -> floor(x * scale + 0.5)) AS qv
                 FROM es),
          q AS (SELECT qv AS qq, scale AS qscale, embedding AS qe FROM eq WHERE vec_id = 0),
          sc AS (SELECT e.vec_id,
                        round(CASE WHEN e.scale = 0.0 OR q.qscale = 0.0 THEN 0.0
                                   ELSE ${dotSql("e.qv", "q.qq")} / (e.scale * q.qscale) END, 6) AS score_q8,
                        round(${cosSql("e.embedding", "q.qe")}, 6) AS cos
                 FROM eq e, q)
          SELECT vec_id, score_q8, cos,
                 CAST(row_number() OVER (ORDER BY score_q8 DESC, vec_id ASC) AS INT) AS rank
          FROM (SELECT * FROM sc ORDER BY score_q8 DESC, vec_id ASC LIMIT 20) ORDER BY rank""",

    // roles + clusters replayed: bucket-bounded eps-pairs, degree
    // threshold, recursive min-label reachability over core-core
    // edges (the q_dedup_clusters pattern), min-cluster border attach
    "q_dbscan" ->
      s"""WITH RECURSIVE
          e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
          asg AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM (
                    SELECT e.vec_id, e.embedding, e.nrm, c.cid,
                           row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                    FROM e2 e CROSS JOIN c) WHERE rn = 1),
          pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                 WHERE round(${cosNSql(dotSql("a.embedding", "b.embedding"), "a.nrm", "b.nrm")}, 6) >= 0.3),
          deg AS (SELECT id, CAST(count(*) AS INT) AS n_neighbors
                  FROM (SELECT id_a AS id FROM pr UNION ALL SELECT id_b FROM pr) GROUP BY id),
          allv AS (SELECT e2.vec_id, coalesce(deg.n_neighbors, 0) AS n_neighbors
                   FROM e2 LEFT JOIN deg ON e2.vec_id = deg.id),
          core AS (SELECT vec_id FROM allv WHERE n_neighbors >= 3),
          ce_ AS (SELECT p.id_a, p.id_b FROM pr p
                  JOIN core ka ON p.id_a = ka.vec_id JOIN core kb ON p.id_b = kb.vec_id),
          ed AS (SELECT id_a AS u, id_b AS v FROM ce_ UNION ALL SELECT id_b, id_a FROM ce_),
          reach(id, r) AS (
            SELECT vec_id, vec_id FROM core
            UNION
            SELECT ed.u, reach.r FROM ed JOIN reach ON reach.id = ed.v),
          cl AS (SELECT id AS vec_id, min(r) AS core_cluster FROM reach GROUP BY id),
          nbr AS (SELECT s.nb_self, min(cl.core_cluster) AS nbr_cluster
                  FROM (SELECT id_a AS nb_self, id_b AS nb_other FROM pr
                        UNION ALL SELECT id_b, id_a FROM pr) s
                  JOIN cl ON s.nb_other = cl.vec_id
                  GROUP BY s.nb_self)
         SELECT a.vec_id, a.n_neighbors,
                CASE WHEN a.n_neighbors >= 3 THEN 'core'
                     WHEN nbr.nbr_cluster IS NOT NULL THEN 'border'
                     ELSE 'noise' END AS role,
                CASE WHEN a.n_neighbors >= 3 THEN cl.core_cluster
                     WHEN nbr.nbr_cluster IS NOT NULL THEN nbr.nbr_cluster
                     ELSE NULL END AS cluster_id
         FROM allv a
         LEFT JOIN cl ON a.vec_id = cl.vec_id
         LEFT JOIN nbr ON a.vec_id = nbr.nb_self
         ORDER BY a.vec_id""",

    "q_knn_graph" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
          asg AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM (
                    SELECT e.vec_id, e.embedding, e.nrm, c.cid,
                           row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                    FROM e2 e CROSS JOIN c) WHERE rn = 1),
          pr AS (SELECT a.vec_id AS id, b.vec_id AS nbr_id,
                        round(${cosNSql(dotSql("a.embedding", "b.embedding"), "a.nrm", "b.nrm")}, 6) AS cos
                 FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          r AS (SELECT id, nbr_id, cos,
                       CAST(row_number() OVER (PARTITION BY id ORDER BY cos DESC, nbr_id ASC) AS INT) AS nbr_rank
                FROM pr)
         SELECT id AS vec_id, nbr_rank, nbr_id, cos FROM r WHERE nbr_rank <= 3
         ORDER BY vec_id, nbr_rank""",

    // 3 clamped propagation rounds unrolled; same decimal-sum recipe
    // and the same bucket-bounded eps-pair CTEs as q_dbscan
    "q_label_prop" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
          asg AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM (
                    SELECT e.vec_id, e.embedding, e.nrm, c.cid,
                           row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                    FROM e2 e CROSS JOIN c) WHERE rn = 1),
          pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM asg a JOIN asg b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                 WHERE round(${cosNSql(dotSql("a.embedding", "b.embedding"), "a.nrm", "b.nrm")}, 6) >= 0.3),
          ed AS (SELECT id_a AS src, id_b AS dst FROM pr UNION ALL SELECT id_b, id_a FROM pr),
          deg AS (SELECT src, count(*) AS dg FROM ed GROUP BY src),
          seeds AS (SELECT vec_id AS id, CAST(label AS INT) AS lab, 1.0 AS mass
                    FROM embeddings WHERE vec_id % 10 = 0),
          s1 AS (SELECT ed.dst AS id, m.lab, CAST(sum(CAST(m.mass / dg.dg AS DECIMAL(27,18))) AS DOUBLE) AS mass
                 FROM ed JOIN seeds m ON ed.src = m.id JOIN deg dg ON ed.src = dg.src GROUP BY ed.dst, m.lab),
          m1 AS (SELECT id, lab, mass FROM s1 WHERE id NOT IN (SELECT id FROM seeds)
                 UNION ALL SELECT id, lab, mass FROM seeds),
          s2 AS (SELECT ed.dst AS id, m.lab, CAST(sum(CAST(m.mass / dg.dg AS DECIMAL(27,18))) AS DOUBLE) AS mass
                 FROM ed JOIN m1 m ON ed.src = m.id JOIN deg dg ON ed.src = dg.src GROUP BY ed.dst, m.lab),
          m2 AS (SELECT id, lab, mass FROM s2 WHERE id NOT IN (SELECT id FROM seeds)
                 UNION ALL SELECT id, lab, mass FROM seeds),
          s3 AS (SELECT ed.dst AS id, m.lab, CAST(sum(CAST(m.mass / dg.dg AS DECIMAL(27,18))) AS DOUBLE) AS mass
                 FROM ed JOIN m2 m ON ed.src = m.id JOIN deg dg ON ed.src = dg.src GROUP BY ed.dst, m.lab),
          m3 AS (SELECT id, lab, mass FROM s3 WHERE id NOT IN (SELECT id FROM seeds)
                 UNION ALL SELECT id, lab, mass FROM seeds),
          best AS (SELECT id, lab, mass,
                          row_number() OVER (PARTITION BY id ORDER BY mass DESC, lab ASC) AS rn
                   FROM m3)
         SELECT e2.vec_id, s.lab AS seed_label, b.lab AS pred_label, round(b.mass, 6) AS pred_mass
         FROM e2
         LEFT JOIN seeds s ON e2.vec_id = s.id
         LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON e2.vec_id = b.id
         ORDER BY e2.vec_id""",

    "q_ann_binary" ->
      s"""WITH e AS (SELECT vec_id, embedding,
                            CAST(list_sum(list_transform(range(1, 33),
                              i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0 THEN power(2, i - 1) ELSE 0 END)) AS BIGINT) AS w0,
                            CAST(list_sum(list_transform(range(33, 65),
                              i -> CASE WHEN CAST(embedding[i] AS DOUBLE) > 0 THEN power(2, i - 33) ELSE 0 END)) AS BIGINT) AS w1
                     FROM embeddings),
          q AS (SELECT w0 AS q0, w1 AS q1, embedding AS qe FROM e WHERE vec_id = 0),
          cand AS (SELECT e.vec_id, e.embedding,
                          CAST(bit_count(xor(e.w0, q.q0)) + bit_count(xor(e.w1, q.q1)) AS INT) AS hamming
                   FROM e, q
                   ORDER BY hamming, e.vec_id LIMIT 40),
          rr AS (SELECT c.vec_id, c.hamming, round(${cosSql("c.embedding", "q.qe")}, 6) AS cos
                 FROM cand c, q)
         SELECT vec_id, hamming, cos,
                CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
         FROM (SELECT * FROM rr ORDER BY cos DESC, vec_id ASC LIMIT 20) ORDER BY rank""",

    "q_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
                             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
                      FROM events),
          cells AS (SELECT prev_type, event_type AS next_type, count(*) AS n
                    FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
                round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6) AS p
         FROM cells ORDER BY prev_type, next_type""",

    "q_rrf_fusion" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                     FROM documents),
          f AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl,
                       CAST(len(list_filter(tk, x -> x = 'spark')) AS DOUBLE) AS tf_0,
                       CAST(len(list_filter(tk, x -> x = 'data')) AS DOUBLE) AS tf_1,
                       CAST(len(list_filter(tk, x -> x = 'query')) AS DOUBLE) AS tf_2
                FROM t),
          s AS (SELECT count(*) AS n_docs,
                       CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
                       sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
                       sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
                       sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
                FROM f),
          sc AS (SELECT f.doc_id,
                        round(  ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0) * (tf_0 * 2.2 / (tf_0 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                              + ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0) * (tf_1 * 2.2 / (tf_1 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                              + ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0) * (tf_2 * 2.2 / (tf_2 + 1.2 * (0.25 + 0.75 * (dl / avgdl)))), 6) AS score
                 FROM f, s),
          bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
                  FROM (SELECT * FROM sc ORDER BY score DESC, doc_id ASC LIMIT 30)),
          q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          cs AS (SELECT vec_id AS doc_id, round(${cosSql("e.embedding", "q.qe")}, 6) AS cos
                 FROM embeddings e, q),
          csr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS INT) AS rank
                  FROM (SELECT * FROM cs ORDER BY cos DESC, doc_id ASC LIMIT 30)),
          u AS (SELECT doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS c FROM bmr
                UNION ALL
                SELECT doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS c FROM csr),
          fused AS (SELECT doc_id, CAST(count(*) AS INT) AS n_lists, round(sum(c), 6) AS rrf
                    FROM u GROUP BY doc_id)
          SELECT doc_id, n_lists, rrf,
                 CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
          FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 20) ORDER BY rank""",

    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label,
                            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          cm AS (SELECT label AS neg_label, i AS dim,
                        round(CAST(sum(CAST(v[i] AS DECIMAL(27,18))) AS DOUBLE) / count(*), 6) AS m
                 FROM e, unnest(range(1, 65)) AS u(i)
                 GROUP BY label, i),
          cl AS (SELECT neg_label, list(m ORDER BY dim) AS c FROM cm GROUP BY neg_label),
          cln AS (SELECT neg_label, c, ${dotSql("c", "c")} AS cn FROM cl),
          en AS (SELECT vec_id, label, v, ${dotSql("v", "v")} AS nrm FROM e),
          sc AS (SELECT en.vec_id, en.label, cln.neg_label,
                        round(${cosNSql(dotSql("en.v", "cln.c"), "en.nrm", "cln.cn")}, 6) AS cos
                 FROM en CROSS JOIN cln
                 WHERE en.label <> cln.neg_label),
          rk AS (SELECT neg_label, vec_id, label, cos,
                        CAST(row_number() OVER (PARTITION BY neg_label ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
                 FROM sc)
          SELECT neg_label, rank, vec_id, label, cos
          FROM rk WHERE rank <= 5 ORDER BY neg_label, rank""",

    "q_semdedup" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
          asg AS (SELECT vec_id, embedding, nrm, cid AS cluster_id, round(cosv, 6) AS cos_c FROM (
                    SELECT e.vec_id, e.embedding, e.nrm, c.cid,
                           ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} AS cosv,
                           row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                    FROM e2 e CROSS JOIN c) WHERE rn = 1),
          drops AS (SELECT DISTINCT b.vec_id
                    FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id
                     AND (a.cos_c < b.cos_c OR (a.cos_c = b.cos_c AND a.vec_id < b.vec_id))
                    WHERE round(${cosNSql(dotSql("a.embedding", "b.embedding"), "a.nrm", "b.nrm")}, 6) >= 0.35)
          SELECT a.vec_id, a.cluster_id, a.cos_c, (d.vec_id IS NULL) AS is_kept
          FROM asg a LEFT JOIN drops d ON a.vec_id = d.vec_id ORDER BY a.vec_id""",

    // q_ann_kmeans' one-Lloyd-round fit (32 seeds) composed with
    // q_semdedup's within-cluster drop logic — replays
    // kmeansCentroids + semDedup(learnedCentroids) bit-for-bit
    "q_semdedup_scaled" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 32)),
          asg AS (SELECT vec_id, embedding, cid FROM (
                    SELECT e.vec_id, e.embedding, c.cid,
                           row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                    FROM e2 e CROSS JOIN c)
                  WHERE rn = 1),
          m AS (SELECT cid, $kmeansMeanSql FROM asg GROUP BY cid),
          nc AS (SELECT c.cid, list_value($kmeansNewCentroidSql) AS ce FROM c LEFT JOIN m ON c.cid = m.cid),
          nc2 AS (SELECT cid, ce, ${dotSql("ce", "ce")} AS cn FROM nc),
          asg2 AS (SELECT vec_id, embedding, nrm, cid AS cluster_id, round(cosv, 6) AS cos_c FROM (
                     SELECT e.vec_id, e.embedding, e.nrm, n.cid,
                            ${cosNSql(dotSql("e.embedding", "n.ce"), "e.nrm", "n.cn")} AS cosv,
                            row_number() OVER (
                              PARTITION BY e.vec_id
                              ORDER BY ${cosNSql(dotSql("e.embedding", "n.ce"), "e.nrm", "n.cn")} DESC, n.cid ASC) AS rn
                     FROM e2 e CROSS JOIN nc2 n) WHERE rn = 1),
          drops AS (SELECT DISTINCT b.vec_id
                    FROM asg2 a JOIN asg2 b ON a.cluster_id = b.cluster_id
                     AND (a.cos_c < b.cos_c OR (a.cos_c = b.cos_c AND a.vec_id < b.vec_id))
                    WHERE round(${cosNSql(dotSql("a.embedding", "b.embedding"), "a.nrm", "b.nrm")}, 6) >= 0.35)
          SELECT a.vec_id, a.cluster_id, a.cos_c, (d.vec_id IS NULL) AS is_kept
          FROM asg2 a LEFT JOIN drops d ON a.vec_id = d.vec_id ORDER BY a.vec_id""",

    "q_ann_kmeans" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          q AS (SELECT embedding AS qe, nrm AS qn FROM e2 WHERE vec_id = 0),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
          asg AS (SELECT vec_id, embedding, cid FROM (
                    SELECT e.vec_id, e.embedding, c.cid,
                           row_number() OVER (
                             PARTITION BY e.vec_id
                             ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                    FROM e2 e CROSS JOIN c)
                  WHERE rn = 1),
          m AS (SELECT cid, $kmeansMeanSql FROM asg GROUP BY cid),
          nc AS (SELECT c.cid, list_value($kmeansNewCentroidSql) AS ce FROM c LEFT JOIN m ON c.cid = m.cid),
          nc2 AS (SELECT cid, ce, ${dotSql("ce", "ce")} AS cn FROM nc),
          asg2 AS (SELECT vec_id, nrm, cid AS centroid_id FROM (
                     SELECT e.vec_id, e.embedding, e.nrm, n.cid,
                            row_number() OVER (
                              PARTITION BY e.vec_id
                              ORDER BY ${cosNSql(dotSql("e.embedding", "n.ce"), "e.nrm", "n.cn")} DESC, n.cid ASC) AS rn
                     FROM e2 e CROSS JOIN nc2 n)
                   WHERE rn = 1),
          probes AS (SELECT n.cid FROM nc2 n, q
                     ORDER BY ${cosNSql(dotSql("n.ce", "q.qe"), "n.cn", "q.qn")} DESC, n.cid ASC LIMIT 4),
          scored AS (SELECT a.vec_id, round(${cosNSql(dotSql("e.embedding", "q.qe"), "e.nrm", "q.qn")}, 6) AS cos
                     FROM asg2 a JOIN e2 e ON a.vec_id = e.vec_id, q
                     WHERE a.centroid_id IN (SELECT cid FROM probes))
          SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 20""",

    "q_retrieval_top1" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          scored AS (SELECT e.label, e.vec_id, round(${cosSql("e.embedding", "q.qe")}, 6) AS cos
                     FROM embeddings e, q)
          SELECT label, vec_id, cos FROM (
            SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_id ASC) AS rn
            FROM scored)
          WHERE rn = 1 ORDER BY label""",

    "q_dedup_embed_cosine" ->
      s"""SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
                 round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
          ORDER BY cos DESC, id_a ASC, id_b ASC LIMIT 20""",

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",

    "q_dedup_ngram_jaccard" ->
      s"""WITH $shinglesSql
          SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
          FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.sh, b.sh)) > 0
          ORDER BY jaccard DESC, id_a ASC, id_b ASC LIMIT 20""",

    "q_dedup_jaccard_capped" ->
      s"""WITH $shinglesSql,
          inv AS (SELECT lang, doc_id, unnest(sh) AS g FROM shing),
          keep AS (SELECT lang, g FROM inv GROUP BY lang, g HAVING count(*) <= 3),
          capped AS (SELECT i.lang, i.doc_id, CAST(count(*) AS INT) AS sz, list(i.g) AS sh
                     FROM inv i JOIN keep k ON i.lang = k.lang AND i.g = k.g
                     GROUP BY i.lang, i.doc_id)
          SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / (a.sz + b.sz - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
          FROM capped a JOIN capped b ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.sh, b.sh)) > 0
          ORDER BY jaccard DESC, id_a ASC, id_b ASC LIMIT 20""",

    "q_dedup_containment" ->
      s"""WITH $shinglesSql,
          inv AS (SELECT lang, doc_id, unnest(sh) AS g FROM shing),
          keep AS (SELECT lang, g FROM inv GROUP BY lang, g HAVING count(*) <= 3),
          capped AS (SELECT i.lang, i.doc_id, CAST(count(*) AS INT) AS sz, list(i.g) AS sh
                     FROM inv i JOIN keep k ON i.lang = k.lang AND i.g = k.g
                     GROUP BY i.lang, i.doc_id),
          pr AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
                        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS ni,
                        a.sz AS sz_a, b.sz AS sz_b
                 FROM capped a JOIN capped b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE len(list_intersect(a.sh, b.sh)) > 0)
          SELECT lang, id_a, id_b,
                 round(ni / least(sz_a, sz_b), 6) AS containment,
                 round(ni / (sz_a + sz_b - ni), 6) AS jaccard
          FROM pr WHERE ni / least(sz_a, sz_b) >= 0.3
          ORDER BY containment DESC, id_a ASC, id_b ASC LIMIT 20""",

    "q_dedup_edit_verify" ->
      s"""WITH $shinglesSql,
          inv AS (SELECT lang, doc_id, unnest(sh) AS g FROM shing),
          keep AS (SELECT lang, g FROM inv GROUP BY lang, g HAVING count(*) <= 3),
          capped AS (SELECT i.lang, i.doc_id, CAST(count(*) AS INT) AS sz, list(i.g) AS sh
                     FROM inv i JOIN keep k ON i.lang = k.lang AND i.g = k.g
                     GROUP BY i.lang, i.doc_id),
          pr AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
                        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                              / (a.sz + b.sz - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
                 FROM capped a JOIN capped b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE len(list_intersect(a.sh, b.sh)) > 0),
          v AS (SELECT c.lang, c.id_a, c.id_b, c.jaccard,
                       levenshtein(da.text, db.text) AS edit_dist,
                       round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
                             / greatest(len(da.text), len(db.text)), 6) AS edit_sim
                FROM (SELECT * FROM pr WHERE jaccard >= 0.2) c
                JOIN documents da ON c.id_a = da.doc_id
                JOIN documents db ON c.id_b = db.doc_id)
         SELECT lang, id_a, id_b, jaccard, edit_dist, edit_sim
         FROM v WHERE edit_sim >= 0.3
         ORDER BY edit_sim DESC, id_a, id_b LIMIT 20""",

    // 3 power iterations unrolled; decimal(27,18) quantization before
    // every sum mirrors pageRankFixed exactly
    "q_pagerank_neardup" ->
      s"""WITH $shinglesSql,
          inv AS (SELECT lang, doc_id, unnest(sh) AS g FROM shing),
          keep AS (SELECT lang, g FROM inv GROUP BY lang, g HAVING count(*) <= 3),
          capped AS (SELECT i.lang, i.doc_id, CAST(count(*) AS INT) AS sz, list(i.g) AS sh
                     FROM inv i JOIN keep k ON i.lang = k.lang AND i.g = k.g
                     GROUP BY i.lang, i.doc_id),
          jp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM capped a JOIN capped b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE len(list_intersect(a.sh, b.sh)) > 0
                   AND round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                             / (a.sz + b.sz - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) >= 0.2),
          e AS (SELECT id_a AS src, id_b AS dst FROM jp UNION SELECT id_b, id_a FROM jp),
          deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
          nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
          p0 AS (SELECT doc_id AS id, 1.0 / nn.n AS pr FROM documents, nn),
          d0 AS (SELECT coalesce(sum(CAST(pr AS DECIMAL(27,18))), 0) AS dm
                 FROM p0 LEFT JOIN deg ON p0.id = deg.src WHERE deg.src IS NULL),
          c0 AS (SELECT e.dst AS id, CAST(sum(CAST(p.pr / dg.dg AS DECIMAL(27,18))) AS DOUBLE) AS cs
                 FROM e JOIN p0 p ON e.src = p.id JOIN deg dg ON e.src = dg.src GROUP BY e.dst),
          p1 AS (SELECT p0.id,
                        (1.0 - 0.85) / nn.n + 0.85 * (coalesce(c0.cs, 0.0) + CAST(d0.dm AS DOUBLE) / nn.n) AS pr
                 FROM p0 LEFT JOIN c0 ON p0.id = c0.id, nn, d0),
          d1 AS (SELECT coalesce(sum(CAST(pr AS DECIMAL(27,18))), 0) AS dm
                 FROM p1 LEFT JOIN deg ON p1.id = deg.src WHERE deg.src IS NULL),
          c1 AS (SELECT e.dst AS id, CAST(sum(CAST(p.pr / dg.dg AS DECIMAL(27,18))) AS DOUBLE) AS cs
                 FROM e JOIN p1 p ON e.src = p.id JOIN deg dg ON e.src = dg.src GROUP BY e.dst),
          p2 AS (SELECT p1.id,
                        (1.0 - 0.85) / nn.n + 0.85 * (coalesce(c1.cs, 0.0) + CAST(d1.dm AS DOUBLE) / nn.n) AS pr
                 FROM p1 LEFT JOIN c1 ON p1.id = c1.id, nn, d1),
          d2 AS (SELECT coalesce(sum(CAST(pr AS DECIMAL(27,18))), 0) AS dm
                 FROM p2 LEFT JOIN deg ON p2.id = deg.src WHERE deg.src IS NULL),
          c2 AS (SELECT e.dst AS id, CAST(sum(CAST(p.pr / dg.dg AS DECIMAL(27,18))) AS DOUBLE) AS cs
                 FROM e JOIN p2 p ON e.src = p.id JOIN deg dg ON e.src = dg.src GROUP BY e.dst),
          p3 AS (SELECT p2.id,
                        (1.0 - 0.85) / nn.n + 0.85 * (coalesce(c2.cs, 0.0) + CAST(d2.dm AS DOUBLE) / nn.n) AS pr
                 FROM p2 LEFT JOIN c2 ON p2.id = c2.id, nn, d2)
         SELECT id AS doc_id, round(pr, 6) AS pr FROM p3 ORDER BY doc_id""",

    // components via recursive reachability: reach(id,r) = id can
    // reach label r; min over reachable labels = cluster id. UNION
    // (not ALL) dedups rows so the recursion terminates.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglesSql,
          jp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.u, reach.r FROM e JOIN reach ON reach.id = e.v)
          SELECT id AS doc_id, min(r) AS cluster_id, (min(r) = id) AS is_canonical
          FROM reach GROUP BY id ORDER BY doc_id""",

    // identical oracle to q_dedup_clusters: star contraction and
    // path-halving must agree with the same recursive reachability
    // ground truth (the fallback is only correct if its labels are)
    "q_dedup_clusters_star" ->
      s"""WITH RECURSIVE $shinglesSql,
          jp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.u, reach.r FROM e JOIN reach ON reach.id = e.v)
          SELECT id AS doc_id, min(r) AS cluster_id, (min(r) = id) AS is_canonical
          FROM reach GROUP BY id ORDER BY doc_id""",

    "q_dedup_minhash" ->
      s"""WITH $shinglesSql,
          sigs AS (SELECT doc_id,
                          list_transform(range(0, 8), s ->
                            list_min(list_transform(sh, g ->
                              ('0x' || substr(md5(g || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT))) AS sig
                   FROM shing)
          SELECT doc_id, array_to_string(sig, ',') AS sig_str,
                 md5(array_to_string(sig[1:4], ',')) AS band_a,
                 md5(array_to_string(sig[5:8], ',')) AS band_b
          FROM sigs ORDER BY doc_id""",

    "q_lsh_pairs" ->
      s"""WITH $shinglesSql,
          sigs AS (SELECT doc_id,
                          list_transform(range(0, 8), s ->
                            list_min(list_transform(sh, g ->
                              ('0x' || substr(md5(g || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT))) AS sig
                   FROM shing),
          bk AS (SELECT doc_id, 0 AS band_idx, md5(array_to_string(sig[1:4], ',')) AS band_key FROM sigs
                 UNION ALL
                 SELECT doc_id, 1, md5(array_to_string(sig[5:8], ',')) FROM sigs),
          keep AS (SELECT band_idx, band_key FROM bk
                   GROUP BY 1, 2 HAVING count(*) > 1 AND count(*) <= 3)
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.band_idx AS band_idx
          FROM bk a
          JOIN bk b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          JOIN keep k ON a.band_idx = k.band_idx AND a.band_key = k.band_key
          ORDER BY id_a, id_b, band_idx""",

    // blocking is recall-lossless for hamming <= 3 (pigeonhole over
    // 4 bands) and the df cap never triggers at gate SF, so the
    // oracle verifies against the direct all-pairs filter
    "q_simhash_pairs" ->
      """WITH tok AS (SELECT doc_id, t
                      FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 4))::BIGINT AS h FROM tok),
          bitsum AS (SELECT doc_id, i, sum(((h // CAST(power(2, i) AS BIGINT)) % 2) * 2 - 1) AS s
                     FROM th, unnest(range(0, 16)) AS b(i) GROUP BY doc_id, i),
          sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, i) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
                 FROM bitsum GROUP BY doc_id)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         ORDER BY hamming, id_a, id_b LIMIT 50""",

    "q_kmv_overlap" ->
      """WITH tok AS (SELECT source AS g, t
                      FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          hs AS (SELECT g, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
          sk AS (SELECT g, list_sort(list_distinct(list(h)))[1:16] AS sk FROM hs GROUP BY g),
          pr AS (SELECT a.g AS g_a, b.g AS g_b, a.sk AS sk_a, b.sk AS sk_b,
                        list_sort(list_distinct(a.sk || b.sk))[1:16] AS sk_u
                 FROM sk a JOIN sk b ON a.g < b.g),
          e AS (SELECT g_a, g_b,
                       CASE WHEN len(sk_a) < 16 THEN CAST(len(sk_a) AS DOUBLE)
                            ELSE 15.0 * 1152921504606846976.0 / sk_a[16] END AS ea,
                       CASE WHEN len(sk_b) < 16 THEN CAST(len(sk_b) AS DOUBLE)
                            ELSE 15.0 * 1152921504606846976.0 / sk_b[16] END AS eb,
                       CASE WHEN len(sk_u) < 16 THEN CAST(len(sk_u) AS DOUBLE)
                            ELSE 15.0 * 1152921504606846976.0 / sk_u[16] END AS eu
                FROM pr)
         SELECT g_a, g_b, round(ea, 6) AS est_a, round(eb, 6) AS est_b,
                round(eu, 6) AS est_union,
                round(greatest(ea + eb - eu, 0.0), 6) AS est_intersect,
                round(greatest(ea + eb - eu, 0.0) / eu, 6) AS jaccard_est
         FROM e ORDER BY g_a, g_b""",

    "q_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, t
                      FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 4))::BIGINT AS h FROM tok),
          bitsum AS (SELECT doc_id, i, sum(((h // CAST(power(2, i) AS BIGINT)) % 2) * 2 - 1) AS s
                     FROM th, unnest(range(0, 16)) AS b(i) GROUP BY doc_id, i)
         SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, i) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
         FROM bitsum GROUP BY doc_id ORDER BY doc_id""",

    "q_lang_id" ->
      """WITH sc AS (SELECT doc_id,
                len(list_filter(toks, x -> x = 'join')) + len(list_filter(toks, x -> x = 'table')) AS c_de,
                len(list_filter(toks, x -> x = 'the')) + len(list_filter(toks, x -> x = 'data')) AS c_en,
                len(list_filter(toks, x -> x = 'spark')) + len(list_filter(toks, x -> x = 'query')) AS c_es,
                len(list_filter(toks, x -> x = 'merge')) + len(list_filter(toks, x -> x = 'filter')) AS c_fr,
                len(list_filter(toks, x -> x = 'row')) + len(list_filter(toks, x -> x = 'key')) AS c_zh
              FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
                    FROM documents))
         SELECT doc_id,
                CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                     WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                     WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                     WHEN c_fr >= c_zh THEN 'fr'
                     ELSE 'zh' END AS pred_lang
         FROM sc ORDER BY doc_id""",

    "q_langid_confusion" ->
      """WITH sc AS (SELECT doc_id, lang,
                len(list_filter(toks, x -> x = 'join')) + len(list_filter(toks, x -> x = 'table')) AS c_de,
                len(list_filter(toks, x -> x = 'the')) + len(list_filter(toks, x -> x = 'data')) AS c_en,
                len(list_filter(toks, x -> x = 'spark')) + len(list_filter(toks, x -> x = 'query')) AS c_es,
                len(list_filter(toks, x -> x = 'merge')) + len(list_filter(toks, x -> x = 'filter')) AS c_fr,
                len(list_filter(toks, x -> x = 'row')) + len(list_filter(toks, x -> x = 'key')) AS c_zh
              FROM (SELECT doc_id, lang, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
                    FROM documents)),
          p AS (SELECT lang,
                CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                     WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                     WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                     WHEN c_fr >= c_zh THEN 'fr'
                     ELSE 'zh' END AS pred_lang
                FROM sc)
         SELECT lang, pred_lang, count(*) AS n_docs
         FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang""",

    "q_minhash_est" ->
      s"""WITH $shinglesSql,
          jp AS (SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
                        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                              / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS jaccard
                 FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE len(list_intersect(a.sh, b.sh)) > 0
                 ORDER BY jaccard DESC, id_a ASC, id_b ASC LIMIT 20),
          sigs AS (SELECT doc_id,
                          list_transform(range(0, 8), s ->
                            list_min(list_transform(sh, g ->
                              ('0x' || substr(md5(g || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT))) AS sig
                   FROM shing),
          est AS (SELECT jp.lang, jp.id_a, jp.id_b, jp.jaccard,
                         CAST(len(list_filter(range(1, 9), h -> sa.sig[h] = sb.sig[h])) AS DOUBLE) / 8 AS e
                  FROM jp JOIN sigs sa ON jp.id_a = sa.doc_id
                          JOIN sigs sb ON jp.id_b = sb.doc_id)
         SELECT lang, id_a, id_b, jaccard, round(e, 6) AS est, round(abs(e - jaccard), 6) AS abs_err
         FROM est ORDER BY jaccard DESC, id_a, id_b""",

    "q_quality_score" ->
      """WITH f AS (SELECT doc_id,
                len(toks) AS n_tokens, length(text) AS n_chars,
                len(list_filter(toks, x -> x = 'the')) + len(list_filter(toks, x -> x = 'a')) AS n_stop,
                length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
              FROM (SELECT doc_id, text,
                           list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
                    FROM documents))
         SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                round(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END, 6) AS stopword_ratio,
                round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS punct_ratio,
                round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                       + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0)
                       + greatest(1.0 - (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 10.0, 0.0)) / 3.0, 6) AS quality
         FROM f ORDER BY doc_id""",

    "q_skew_salted_count" ->
      """SELECT lang, count(*) AS count FROM documents GROUP BY lang ORDER BY lang""",

    "q_repetition" ->
      """WITH tc AS (SELECT doc_id, t, count(*) AS n
                     FROM documents, unnest(string_split(text, ' ')) AS u(t)
                     WHERE len(t) > 0 GROUP BY doc_id, t)
         SELECT doc_id, CAST(sum(n) AS INT) AS n_tokens, CAST(count(*) AS INT) AS n_distinct,
                round(CAST(count(*) AS DOUBLE) / sum(n), 6) AS distinct_ratio,
                round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_ratio
         FROM tc GROUP BY doc_id ORDER BY doc_id""",

    "q_length_stats" ->
      """SELECT lang, count(*) AS n_docs,
                round(avg(len(text)), 6) AS avg_chars,
                round(quantile_cont(len(text), 0.5), 6) AS med_chars,
                round(quantile_cont(len(text), 0.9), 6) AS p90_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_vocab_topk" ->
      """WITH tok AS (SELECT t AS token
                      FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          c AS (SELECT token, count(*) AS n FROM tok GROUP BY token ORDER BY n DESC, token LIMIT 50)
         SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS rank
         FROM c ORDER BY rank""",

    "q_heavy_hitters" ->
      """WITH tok AS (SELECT t AS token
                      FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          tot AS (SELECT count(*) AS n FROM tok),
          c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
         SELECT token, cnt FROM c, tot WHERE cnt >= ceil(0.033 * n)
         ORDER BY cnt DESC, token""",

    "q_pii_scrub" ->
      """SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g'),
                  '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '[REDACTED]', 'g'),
                  '\b\d{1,3}(?:\.\d{1,3}){3}\b', '[REDACTED]', 'g'),
                  '\bkey\b', '[REDACTED]', 'g') AS clean_text,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
                CAST(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS INT) AS n_phone,
                CAST(len(regexp_extract_all(text, '\b\d{1,3}(?:\.\d{1,3}){3}\b')) AS INT) AS n_ipv4,
                CAST(len(regexp_extract_all(text, '\bkey\b')) AS INT) AS n_deny
         FROM documents ORDER BY doc_id""",

    "q_nfc_normalize" ->
      """SELECT doc_id, nfc_normalize(text) AS norm_text,
                CAST(nfc_normalize(text) <> text AS INT) AS changed
         FROM documents ORDER BY doc_id""",

    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
                       FROM documents),
          g AS (SELECT doc_id, list_aggregate(t[i+1:i+3], 'string_agg', ' ') AS gram
                FROM toks, unnest(range(0, greatest(len(t) - 2, 0))) AS u(i)),
          ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
         SELECT g.doc_id, count(DISTINCT g.gram) AS n_overlap
         FROM g JOIN ev USING (gram) WHERE g.doc_id % 97 <> 0
         GROUP BY g.doc_id ORDER BY g.doc_id""",

    "q_decontam_bloom" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
                       FROM documents),
          g AS (SELECT doc_id, list_aggregate(t[i+1:i+3], 'string_agg', ' ') AS gram
                FROM toks, unnest(range(0, greatest(len(t) - 2, 0))) AS u(i)),
          ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 89 = 0)
         SELECT g.doc_id, count(DISTINCT g.gram) AS n_overlap
         FROM g JOIN ev USING (gram) WHERE g.doc_id % 89 <> 0
         GROUP BY g.doc_id ORDER BY g.doc_id""",

    "q_decontam_fuzzy" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
                       FROM documents),
          ev AS (SELECT doc_id AS eval_id, t[1:greatest(len(t) * 4 // 5, 1)] AS t
                 FROM toks WHERE doc_id % 83 = 0),
          csh AS (SELECT doc_id,
                         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                                                      i -> array_to_string(t[i:i+2], ' '))) AS sh
                  FROM toks),
          esh AS (SELECT eval_id,
                         list_distinct(list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                                                      i -> array_to_string(t[i:i+2], ' '))) AS sh
                  FROM ev),
          csig AS (SELECT doc_id, sh,
                          list_transform(range(0, 8), s ->
                            list_min(list_transform(sh, g ->
                              ('0x' || substr(md5(g || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT))) AS sig
                   FROM csh),
          esig AS (SELECT eval_id, sh,
                          list_transform(range(0, 8), s ->
                            list_min(list_transform(sh, g ->
                              ('0x' || substr(md5(g || '#' || CAST(s AS VARCHAR)), 1, 15))::BIGINT))) AS sig
                   FROM esh),
          cb AS (SELECT doc_id, sh, b.band_idx,
                        md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], ',')) AS band_key
                 FROM csig, (SELECT unnest(range(0, 4)) AS band_idx) b),
          eb AS (SELECT eval_id, sh, b.band_idx,
                        md5(array_to_string(sig[b.band_idx * 2 + 1 : b.band_idx * 2 + 2], ',')) AS band_key
                 FROM esig, (SELECT unnest(range(0, 4)) AS band_idx) b),
          j AS (SELECT DISTINCT c.doc_id, e.eval_id,
                       round(CAST(len(list_intersect(c.sh, e.sh)) AS DOUBLE)
                             / (len(c.sh) + len(e.sh)
                                - CAST(len(list_intersect(c.sh, e.sh)) AS DOUBLE)), 6) AS jaccard
                FROM cb c JOIN eb e ON c.band_idx = e.band_idx AND c.band_key = e.band_key)
         SELECT doc_id, eval_id, jaccard FROM (
           SELECT doc_id, eval_id, jaccard,
                  row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, eval_id ASC) AS rn
           FROM j WHERE jaccard >= 0.3)
         WHERE rn = 1 ORDER BY doc_id""",

    "q_seq_pack" ->
      """WITH t AS (SELECT doc_id, lang,
                           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS INT) AS n_tok
                    FROM documents),
          c AS (SELECT doc_id, lang, n_tok,
                       coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                FROM t)
         SELECT doc_id, lang, n_tok, CAST(cum // 64 AS BIGINT) AS pack_id,
                CAST(cum % 64 AS BIGINT) AS pack_offset
         FROM c ORDER BY doc_id""",

    "q_dedup_paragraph" ->
      """WITH sp AS (SELECT doc_id, string_split(text, ' the ') AS s FROM documents),
          p AS (SELECT doc_id, CAST(i AS INT) AS pos, s[i] AS para
                FROM sp, unnest(range(1, len(s) + 1)) AS u(i)
                WHERE len(s[i]) > 0),
          r AS (SELECT doc_id, row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn FROM p)
         SELECT doc_id, CAST(count(*) AS INT) AS n_para,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
                round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS kept_ratio
         FROM r GROUP BY doc_id ORDER BY doc_id""",

    "q_dsir_weight" ->
      """WITH toks AS (SELECT doc_id, lang = 'en' AS is_t, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          counts AS (SELECT token, count(*) AS cnt,
                            sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS cnt_t
                     FROM toks GROUP BY token),
          c2 AS (SELECT token, cnt, cnt_t, cnt - cnt_t AS cnt_b FROM counts),
          tot AS (SELECT sum(cnt_t) AS n_t, sum(cnt_b) AS n_b FROM c2),
          vocab AS (SELECT token, cnt_t, cnt_b FROM c2 ORDER BY cnt DESC, token LIMIT 25),
          sc AS (SELECT t.doc_id,
                        CAST(  ln((CAST(coalesce(v.cnt_t, 0) AS DOUBLE) + 0.5) / (CAST(n_t AS DOUBLE) + 0.5 * 26))
                             - ln((CAST(coalesce(v.cnt_b, 0) AS DOUBLE) + 0.5) / (CAST(n_b AS DOUBLE) + 0.5 * 26))
                          AS DECIMAL(27,18)) AS lr
                 FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
                round(CAST(sum(lr) AS DOUBLE), 6) AS dsir_weight
         FROM sc GROUP BY doc_id ORDER BY doc_id""",

    "q_dup_ngram_frac" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          g AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
                FROM t, unnest(range(1, len(tk) - 1)) AS u(i)
                WHERE len(tk) >= 3),
          df AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram),
          p AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
                       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup
                FROM g JOIN df USING (gram) GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams, COALESCE(n_dup, 0) AS n_dup,
                CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
                     ELSE round(CAST(COALESCE(n_dup, 0) AS DOUBLE) / n_grams, 6) END AS dup_frac
         FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""",

    "q_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          g AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS gram
                FROM t, unnest(range(1, len(tk) - 1)) AS u(i)
                WHERE len(tk) >= 3),
          f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
          p AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
                       CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) AS INT) AS n_novel
                FROM g JOIN f USING (gram) GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams, COALESCE(n_novel, 0) AS n_novel,
                CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
                     ELSE round(CAST(COALESCE(n_novel, 0) AS DOUBLE) / n_grams, 6) END AS novel_frac
         FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""",

    "q_js_divergence" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          cnt AS (SELECT source, token, count(*) AS c FROM t GROUP BY source, token),
          vocab AS (SELECT token FROM (SELECT token, sum(c) AS tc FROM cnt
                                       GROUP BY token ORDER BY tc DESC, token LIMIT 200)),
          r AS (SELECT cnt.source, cnt.token, c FROM cnt JOIN vocab USING (token)),
          tot AS (SELECT source, sum(c) AS n FROM r GROUP BY source),
          pairs AS (SELECT a.source AS src_a, a.n AS na, b.source AS src_b, b.n AS nb
                    FROM tot a JOIN tot b ON a.source < b.source),
          pq AS (SELECT p.src_a, p.src_b, v.token,
                        CAST(COALESCE(ra.c, 0) AS DOUBLE) / p.na AS p,
                        CAST(COALESCE(rb.c, 0) AS DOUBLE) / p.nb AS q
                 FROM pairs p CROSS JOIN vocab v
                 LEFT JOIN r ra ON ra.source = p.src_a AND ra.token = v.token
                 LEFT JOIN r rb ON rb.source = p.src_b AND rb.token = v.token),
          terms AS (SELECT src_a, src_b,
                           CAST(CASE WHEN p > 0 THEN 0.5 * p * ln(2.0 * p / (p + q)) ELSE 0.0 END
                                AS DECIMAL(27,18)) AS tp,
                           CAST(CASE WHEN q > 0 THEN 0.5 * q * ln(2.0 * q / (p + q)) ELSE 0.0 END
                                AS DECIMAL(27,18)) AS tq
                    FROM pq)
         SELECT src_a, src_b, round(CAST(sum(tp) + sum(tq) AS DOUBLE), 6) AS jsd
         FROM terms GROUP BY src_a, src_b ORDER BY src_a, src_b""",

    "q_chi2_tokens" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          cnt AS (SELECT source, token, count(*) AS c FROM t GROUP BY source, token),
          vocab AS (SELECT token FROM (SELECT token, sum(c) AS tc FROM cnt
                                       GROUP BY token ORDER BY tc DESC, token LIMIT 200)),
          r AS (SELECT cnt.source, cnt.token, c FROM cnt JOIN vocab USING (token)),
          rowt AS (SELECT token, sum(c) AS rtot FROM r GROUP BY token),
          colt AS (SELECT source, sum(c) AS ctot FROM r GROUP BY source),
          gn AS (SELECT CAST(sum(c) AS DOUBLE) AS nn FROM r),
          cells AS (SELECT v.token,
                           CAST(COALESCE(r2.c, 0) AS DOUBLE) AS o,
                           CAST(rowt.rtot AS DOUBLE) * colt.ctot / gn.nn AS e
                    FROM vocab v CROSS JOIN colt
                    LEFT JOIN r r2 ON r2.token = v.token AND r2.source = colt.source
                    JOIN rowt ON rowt.token = v.token
                    CROSS JOIN gn)
         SELECT token, round(CAST(sum(CAST((o - e) * (o - e) / e AS DECIMAL(27,18))) AS DOUBLE), 6) AS chi2
         FROM cells GROUP BY token ORDER BY chi2 DESC, token LIMIT 20""",

    "q_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, array_to_string(tk[i:i+2], ' ') AS gram
                FROM t, unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)),
          h AS (SELECT doc_id, pos,
                       ('0x' || substr(md5(gram), 1, 10))::BIGINT * 1048576 + pos AS cmb,
                       count(*) OVER (PARTITION BY doc_id) AS ng
                FROM g),
          wm AS (SELECT doc_id, pos, ng,
                        min(cmb) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
                 FROM h),
          fp AS (SELECT DISTINCT doc_id, sel FROM wm WHERE pos <= greatest(ng - 3, 1))
         SELECT doc_id, CAST(sel & 1048575 AS INT) AS fp_pos, sel >> 20 AS fp_hash
         FROM fp ORDER BY doc_id, fp_pos, fp_hash""",

    "q_substring_dedup" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, array_to_string(tk[i:i+2], ' ') AS gram
                FROM t, unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)),
          h AS (SELECT doc_id, pos,
                       ('0x' || substr(md5(gram), 1, 10))::BIGINT * 1048576 + pos AS cmb,
                       count(*) OVER (PARTITION BY doc_id) AS ng
                FROM g),
          wm AS (SELECT doc_id, pos, ng,
                        min(cmb) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
                 FROM h),
          fpd AS (SELECT DISTINCT doc_id, sel FROM wm WHERE pos <= greatest(ng - 3, 1)),
          fpv AS (SELECT doc_id, CAST(sel & 1048575 AS INT) AS fp_pos, sel >> 20 AS fp_hash FROM fpd),
          c AS (SELECT *, count(*) OVER (PARTITION BY fp_hash) AS df FROM fpv),
          k AS (SELECT * FROM c WHERE df > 1 AND df <= 20),
          hits AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.fp_pos AS pos_a, a.fp_pos - b.fp_pos AS diag
                   FROM k a JOIN k b USING (fp_hash) WHERE a.doc_id < b.doc_id),
          r AS (SELECT id_a, id_b, diag, pos_a,
                       CASE WHEN lag(pos_a) OVER wd IS NULL OR pos_a - lag(pos_a) OVER wd > 4
                            THEN 1 ELSE 0 END AS brk
                FROM hits WINDOW wd AS (PARTITION BY id_a, id_b, diag ORDER BY pos_a)),
          ri AS (SELECT *, sum(brk) OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS run_id FROM r),
          runs AS (SELECT id_a, id_b, diag, run_id, min(pos_a) AS p0, max(pos_a) AS p1, count(*) AS n_fp
                   FROM ri GROUP BY id_a, id_b, diag, run_id)
         SELECT id_a, id_b,
                CAST(max(p1 - p0 + 3) AS INT) AS max_shared_tokens,
                CAST(sum(n_fp) AS INT) AS n_shared_fps
         FROM runs GROUP BY id_a, id_b
         ORDER BY max_shared_tokens DESC, id_a, id_b LIMIT 20""",

    // the substring chain's `runs` CTE + the span splice: spans cut
    // from the LATER doc (gram p covers tokens p..p+2), token kept
    // unless some span covers its 1-based position
    "q_dedup_span_removal" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, array_to_string(tk[i:i+2], ' ') AS gram
                FROM t, unnest(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)),
          h AS (SELECT doc_id, pos,
                       ('0x' || substr(md5(gram), 1, 10))::BIGINT * 1048576 + pos AS cmb,
                       count(*) OVER (PARTITION BY doc_id) AS ng
                FROM g),
          wm AS (SELECT doc_id, pos, ng,
                        min(cmb) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
                 FROM h),
          fpd AS (SELECT DISTINCT doc_id, sel FROM wm WHERE pos <= greatest(ng - 3, 1)),
          fpv AS (SELECT doc_id, CAST(sel & 1048575 AS INT) AS fp_pos, sel >> 20 AS fp_hash FROM fpd),
          c AS (SELECT *, count(*) OVER (PARTITION BY fp_hash) AS df FROM fpv),
          k AS (SELECT * FROM c WHERE df > 1 AND df <= 20),
          hits AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                          a.fp_pos AS pos_a, a.fp_pos - b.fp_pos AS diag
                   FROM k a JOIN k b USING (fp_hash) WHERE a.doc_id < b.doc_id),
          r AS (SELECT id_a, id_b, diag, pos_a,
                       CASE WHEN lag(pos_a) OVER wd IS NULL OR pos_a - lag(pos_a) OVER wd > 4
                            THEN 1 ELSE 0 END AS brk
                FROM hits WINDOW wd AS (PARTITION BY id_a, id_b, diag ORDER BY pos_a)),
          ri AS (SELECT *, sum(brk) OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS run_id FROM r),
          runs AS (SELECT id_a, id_b, diag, run_id, min(pos_a) AS p0, max(pos_a) AS p1
                   FROM ri GROUP BY id_a, id_b, diag, run_id),
          cand AS (SELECT id_a, id_b, diag, p0 AS sa, p0 - diag AS sb, p1 - p0 + 3 AS len
                   FROM runs WHERE p1 - p0 + 3 >= 50),
          vpos AS (SELECT DISTINCT c.id_b, c.id_a, c.diag, c.sb + u.i - 1 AS p
                   FROM cand c
                   JOIN t ta ON c.id_a = ta.doc_id
                   JOIN t tb ON c.id_b = tb.doc_id,
                   unnest(range(1, c.len + 1)) AS u(i)
                   WHERE ta.tk[CAST(c.sa + u.i - 1 AS BIGINT)] = tb.tk[CAST(c.sb + u.i - 1 AS BIGINT)]),
          isl AS (SELECT id_b, CAST(min(p) AS INT) AS s, CAST(max(p) AS INT) AS e
                  FROM (SELECT *, p - row_number() OVER (PARTITION BY id_b, id_a, diag ORDER BY p) AS grp
                        FROM vpos)
                  GROUP BY id_b, id_a, diag, grp
                  HAVING max(p) - min(p) + 1 >= 50),
          spl AS (SELECT id_b AS doc_id, list(struct_pack(s := s, e := e) ORDER BY s, e) AS spans
                  FROM isl GROUP BY id_b),
          cl AS (SELECT t.doc_id, t.tk,
                        CASE WHEN sp.spans IS NULL THEN t.tk
                             ELSE list_filter(t.tk, (x, i) ->
                                    len(list_filter(sp.spans, rr -> i >= rr.s AND i <= rr.e)) = 0)
                        END AS kept
                 FROM t LEFT JOIN spl sp USING (doc_id))
         SELECT doc_id, CAST(len(tk) AS INT) AS n_tok,
                CAST(len(tk) - len(kept) AS INT) AS n_removed,
                coalesce(array_to_string(kept, ' '), '') AS clean_text
         FROM cl ORDER BY doc_id""",

    "q_quality_rules" ->
      """WITH t AS (SELECT doc_id, lower(text) AS lt,
                           list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
                    FROM documents),
          f AS (SELECT doc_id, lt, CAST(len(toks) AS INT) AS n_tok,
                       CASE WHEN len(toks) > 0
                            THEN round(CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE) / len(toks), 6)
                            ELSE 0.0 END AS mean_tok_len
                FROM t)
         SELECT doc_id, n_tok, mean_tok_len,
                (n_tok >= 20 AND n_tok <= 100000) AS ok_word_count,
                (mean_tok_len >= 2.0 AND mean_tok_len <= 10.0) AS ok_mean_len,
                (strpos(lt, 'lorem ipsum') = 0) AS no_lorem,
                (strpos(lt, '{') = 0) AS no_brace,
                ((n_tok >= 20 AND n_tok <= 100000) AND (mean_tok_len >= 2.0 AND mean_tok_len <= 10.0)
                 AND strpos(lt, 'lorem ipsum') = 0 AND strpos(lt, '{') = 0) AS keep
         FROM f ORDER BY doc_id""",

    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT lang, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
                    FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          sk AS (SELECT lang, CAST(count(*) AS INT) AS n_seen, max(h) AS h_k FROM (
                   SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h)
                 WHERE rn <= 16 GROUP BY lang),
          ex AS (SELECT lang, count(*) AS n_exact FROM h GROUP BY lang),
          est AS (SELECT sk.lang, ex.n_exact,
                         CASE WHEN sk.n_seen < 16 THEN CAST(ex.n_exact AS DOUBLE)
                              ELSE round(15.0 * 1152921504606846976.0 / h_k, 6) END AS kmv_est
                  FROM sk JOIN ex ON sk.lang = ex.lang)
         SELECT lang, n_exact, kmv_est,
                round(abs(kmv_est - n_exact) / n_exact, 6) AS rel_err
         FROM est ORDER BY lang""",

    "q_quality_classifier" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          b AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS bkt FROM toks),
          wt AS (SELECT doc_id,
                        CAST((('0x' || substr(md5('qcw:' || CAST(bkt AS VARCHAR)), 1, 15))::BIGINT
                              / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
                 FROM b)
         SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
                round(CAST(sum(w) AS DOUBLE) / count(*), 6) AS logit,
                (round(CAST(sum(w) AS DOUBLE) / count(*), 6) >= 0.0) AS keep
         FROM wt GROUP BY doc_id ORDER BY doc_id""",

    "q_bm25_topk" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          f AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl,
                       CAST(len(list_filter(tk, x -> x = 'spark')) AS DOUBLE) AS tf_0,
                       CAST(len(list_filter(tk, x -> x = 'data')) AS DOUBLE) AS tf_1,
                       CAST(len(list_filter(tk, x -> x = 'query')) AS DOUBLE) AS tf_2
                FROM t),
          s AS (SELECT count(*) AS n_docs,
                       CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
                       sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
                       sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
                       sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
                FROM f),
          sc AS (SELECT f.doc_id,
                        round(  ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0) * (tf_0 * 2.2 / (tf_0 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                              + ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0) * (tf_1 * 2.2 / (tf_1 + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                              + ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0) * (tf_2 * 2.2 / (tf_2 + 1.2 * (0.25 + 0.75 * (dl / avgdl)))), 6) AS score
                 FROM f, s)
         SELECT doc_id, score, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
         FROM (SELECT * FROM sc ORDER BY score DESC, doc_id ASC LIMIT 20) ORDER BY rank""",

    "q_unigram_ppl" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          tot AS (SELECT sum(cnt) AS total FROM counts),
          vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 25),
          scored AS (SELECT t.doc_id,
                            CAST(CASE WHEN v.cnt IS NOT NULL THEN ln(CAST(v.cnt AS DOUBLE) / total)
                                      ELSE ln(0.5 / total) END AS DECIMAL(27,18)) AS lp
                     FROM toks t LEFT JOIN vocab v USING (token) CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS INT) AS n_tok,
                round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS xent
         FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "q_bigram_topk_next" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk FROM documents),
          bi AS (SELECT tk[i] AS ctx, tk[i+1] AS next_token, count(*) AS n
                 FROM t, unnest(range(1, len(tk))) AS u(i) WHERE len(tk) >= 2
                 GROUP BY 1, 2),
          hot AS (SELECT ctx, sum(n) AS ctx_n FROM bi GROUP BY ctx
                  ORDER BY ctx_n DESC, ctx LIMIT 10),
          r AS (SELECT b.ctx, b.next_token, b.n, h.ctx_n,
                       CAST(row_number() OVER (PARTITION BY b.ctx ORDER BY b.n DESC, b.next_token) AS INT) AS next_rank
                FROM bi b JOIN hot h ON b.ctx = h.ctx)
         SELECT ctx, next_rank, next_token, CAST(n AS BIGINT) AS n,
                round(CAST(n AS DOUBLE) / ctx_n, 6) AS p
         FROM r WHERE next_rank <= 3 ORDER BY ctx, next_rank""",

    "q_bigram_ppl" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents),
          ev AS (SELECT doc_id, t[i-1] AS prev, t[i] AS cur
                 FROM tk, unnest(range(2, len(t) + 1)) AS u(i) WHERE len(t) >= 2),
          toks AS (SELECT doc_id, tok AS token FROM tk, unnest(t) AS u(tok)),
          counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          tot AS (SELECT sum(cnt) AS total FROM counts),
          vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 25),
          bgtop AS (SELECT prev, cur, count(*) AS bg_cnt FROM ev GROUP BY prev, cur
                    ORDER BY bg_cnt DESC, prev, cur LIMIT 50),
          scored AS (SELECT ev.doc_id,
                            CAST(CASE WHEN bg.bg_cnt IS NOT NULL AND vp.cnt IS NOT NULL
                                      THEN ln(CAST(bg.bg_cnt AS DOUBLE) / vp.cnt)
                                      ELSE ln(0.4 * (CASE WHEN vc.cnt IS NOT NULL
                                                          THEN CAST(vc.cnt AS DOUBLE) ELSE 0.5 END) / total)
                                 END AS DECIMAL(27,18)) AS lp
                     FROM ev LEFT JOIN bgtop bg USING (prev, cur)
                             LEFT JOIN vocab vp ON ev.prev = vp.token
                             LEFT JOIN vocab vc ON ev.cur = vc.token
                             CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
                round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS xent
         FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "q_ppl_transfer" ->
      s"""WITH $pplTransferCtes
         SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
                round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS xent
         FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "q_ppl_buckets" ->
      s"""WITH $pplTransferCtes,
          perdoc AS (SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
                            round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS xent
                     FROM scored GROUP BY doc_id)
         SELECT p.doc_id, d.lang, p.n_bigrams, p.xent,
                CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY p.xent, p.doc_id)
                     WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         FROM perdoc p JOIN documents d USING (doc_id) ORDER BY p.doc_id""",

    "q_token_fertility" ->
      """WITH m AS (SELECT lang,
                           len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS ws,
                           len(regexp_extract_all(text, '\w+|[^\w\s]', 0)) AS bpe,
                           length(text) AS chars
                    FROM documents)
         SELECT lang, CAST(count(*) AS INT) AS n_docs,
                CAST(sum(ws) AS BIGINT) AS ws_tokens,
                CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
                CAST(sum(chars) AS BIGINT) AS n_chars,
                round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS fertility,
                round(CAST(sum(chars) AS DOUBLE) / sum(bpe), 6) AS chars_per_tok
         FROM m GROUP BY lang ORDER BY lang""",

    "q_bpe_pair_stats" ->
      """WITH words AS (SELECT t AS w, count(*) AS c
                        FROM documents, unnest(string_split(text, ' ')) AS u(t)
                        WHERE len(t) > 0 GROUP BY t),
          sym AS (SELECT c, list_filter(string_split(w, ''), s -> len(s) > 0) AS s FROM words),
          p AS (SELECT s[i] AS lhs, s[i+1] AS rhs, c
                FROM sym, unnest(range(1, len(s))) AS u(i) WHERE len(s) >= 2)
         SELECT lhs, rhs, CAST(sum(c) AS BIGINT) AS freq
         FROM p GROUP BY lhs, rhs ORDER BY freq DESC, lhs, rhs LIMIT 20""",

    "q_wp_pair_scores" ->
      """WITH words AS (SELECT t AS w, count(*) AS c
                        FROM documents, unnest(string_split(text, ' ')) AS u(t)
                        WHERE len(t) > 0 GROUP BY t),
          sym AS (SELECT c, list_transform(
                            list_filter(string_split(w, ''), s -> len(s) > 0),
                            (s, i) -> CASE WHEN i = 1 THEN s ELSE '##' || s END) AS s
                  FROM words),
          pf AS (SELECT s[i] AS lhs, s[i+1] AS rhs, sum(c) AS pf
                 FROM sym, unnest(range(1, len(s))) AS u(i) WHERE len(s) >= 2
                 GROUP BY 1, 2),
          sf AS (SELECT sm AS s, sum(c) AS sf
                 FROM sym, unnest(s) AS u(sm) GROUP BY sm)
         SELECT p.lhs, p.rhs, CAST(p.pf AS BIGINT) AS pair_freq,
                round(ln(CAST(p.pf AS DOUBLE)) - ln(CAST(l.sf AS DOUBLE)) - ln(CAST(r.sf AS DOUBLE)), 6) AS llg
         FROM pf p JOIN sf l ON p.lhs = l.s JOIN sf r ON p.rhs = r.s
         ORDER BY llg DESC, lhs, rhs LIMIT 20""",

    "q_trigram_ppl" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents),
          tg AS (SELECT doc_id, t[i-2] AS w1, t[i-1] AS w2, t[i] AS w3
                 FROM tk, unnest(range(3, len(t) + 1)) AS u(i) WHERE len(t) >= 3),
          ev AS (SELECT t[i-1] AS prev, t[i] AS cur
                 FROM tk, unnest(range(2, len(t) + 1)) AS u(i) WHERE len(t) >= 2),
          toks AS (SELECT tok AS token FROM tk, unnest(t) AS u(tok)),
          counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          tot AS (SELECT sum(cnt) AS total FROM counts),
          vocab AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 25),
          bgtop AS (SELECT prev, cur, count(*) AS bg_cnt FROM ev GROUP BY prev, cur
                    ORDER BY bg_cnt DESC, prev, cur LIMIT 50),
          tgtop AS (SELECT w1, w2, w3, count(*) AS tg_cnt FROM tg GROUP BY w1, w2, w3
                    ORDER BY tg_cnt DESC, w1, w2, w3 LIMIT 50),
          scored AS (SELECT tg.doc_id,
                            CAST(CASE WHEN tgt.tg_cnt IS NOT NULL AND ctx.bg_cnt IS NOT NULL
                                      THEN ln(CAST(tgt.tg_cnt AS DOUBLE) / ctx.bg_cnt)
                                      WHEN bg23.bg_cnt IS NOT NULL AND v2.cnt IS NOT NULL
                                      THEN ln(0.4 * CAST(bg23.bg_cnt AS DOUBLE) / v2.cnt)
                                      ELSE ln(0.16 * (CASE WHEN v3.cnt IS NOT NULL
                                                           THEN CAST(v3.cnt AS DOUBLE) ELSE 0.5 END) / total)
                                 END AS DECIMAL(27,18)) AS lp
                     FROM tg LEFT JOIN tgtop tgt USING (w1, w2, w3)
                             LEFT JOIN bgtop ctx ON tg.w1 = ctx.prev AND tg.w2 = ctx.cur
                             LEFT JOIN bgtop bg23 ON tg.w2 = bg23.prev AND tg.w3 = bg23.cur
                             LEFT JOIN vocab v2 ON tg.w2 = v2.token
                             LEFT JOIN vocab v3 ON tg.w3 = v3.token
                             CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS INT) AS n_trigrams,
                round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS xent
         FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "q_kn_bigram_ppl" ->
      """WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents),
          ev AS (SELECT doc_id, t[i-1] AS prev, t[i] AS cur
                 FROM tk, unnest(range(2, len(t) + 1)) AS u(i) WHERE len(t) >= 2),
          bg AS (SELECT prev, cur, count(*) AS c FROM ev GROUP BY prev, cur),
          ctx AS (SELECT prev, sum(c) AS cw1, count(*) AS n1p_fwd FROM bg GROUP BY prev),
          cont AS (SELECT cur, count(*) AS n1p_bwd FROM bg GROUP BY cur),
          tot AS (SELECT count(*) AS types FROM bg),
          scored AS (SELECT ev.doc_id,
                            CAST(ln(greatest(CAST(bg.c AS DOUBLE) - 0.75, 0.0) / ctx.cw1
                                    + ((0.75 * ctx.n1p_fwd) / ctx.cw1)
                                      * (CAST(cont.n1p_bwd AS DOUBLE) / tot.types))
                                 AS DECIMAL(27,18)) AS lp
                     FROM ev JOIN bg USING (prev, cur)
                             JOIN ctx USING (prev)
                             JOIN cont USING (cur)
                             CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
                round(-(CAST(sum(lp) AS DOUBLE) / count(*)), 6) AS xent
         FROM scored GROUP BY doc_id ORDER BY doc_id""",

    "q_gopher_repetition" ->
      """WITH tk AS (SELECT doc_id, length(text) AS n_chars,
                            list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
                     FROM documents),
          tg AS (SELECT doc_id, n_chars, n, array_to_string(t[i:i+n-1], ' ') AS gram
                 FROM tk, unnest([2, 3, 4]) AS nn(n),
                      unnest(range(1, greatest(len(t) - n + 1, 0) + 1)) AS u(i)
                 WHERE len(t) >= n),
          c AS (SELECT doc_id, n, gram, max(n_chars) AS n_chars, count(*) AS cnt
                FROM tg GROUP BY doc_id, n, gram),
          r AS (SELECT doc_id, n,
                       round(CAST(cnt * length(gram) AS DOUBLE) / n_chars, 6) AS frac,
                       row_number() OVER (PARTITION BY doc_id, n ORDER BY cnt DESC, gram) AS rn
                FROM c),
          tp AS (SELECT doc_id,
                        max(CASE WHEN n = 2 THEN frac END) AS top2_frac,
                        max(CASE WHEN n = 3 THEN frac END) AS top3_frac,
                        max(CASE WHEN n = 4 THEN frac END) AS top4_frac
                 FROM r WHERE rn = 1 GROUP BY doc_id),
          g AS (SELECT doc_id,
                       list_transform(range(1, greatest(len(t) - 4, 0) + 1), i -> array_to_string(t[i:i+4], ' ')) AS g5,
                       list_transform(range(1, greatest(len(t) - 5, 0) + 1), i -> array_to_string(t[i:i+5], ' ')) AS g6,
                       list_transform(range(1, greatest(len(t) - 6, 0) + 1), i -> array_to_string(t[i:i+6], ' ')) AS g7,
                       list_transform(range(1, greatest(len(t) - 7, 0) + 1), i -> array_to_string(t[i:i+7], ' ')) AS g8,
                       list_transform(range(1, greatest(len(t) - 8, 0) + 1), i -> array_to_string(t[i:i+8], ' ')) AS g9,
                       list_transform(range(1, greatest(len(t) - 9, 0) + 1), i -> array_to_string(t[i:i+9], ' ')) AS g10
                FROM tk),
          d AS (SELECT doc_id,
                       CASE WHEN len(g5) = 0 THEN 0.0 ELSE round(CAST(len(g5) - len(list_distinct(g5)) AS DOUBLE) / len(g5), 6) END AS dup5_frac,
                       CASE WHEN len(g6) = 0 THEN 0.0 ELSE round(CAST(len(g6) - len(list_distinct(g6)) AS DOUBLE) / len(g6), 6) END AS dup6_frac,
                       CASE WHEN len(g7) = 0 THEN 0.0 ELSE round(CAST(len(g7) - len(list_distinct(g7)) AS DOUBLE) / len(g7), 6) END AS dup7_frac,
                       CASE WHEN len(g8) = 0 THEN 0.0 ELSE round(CAST(len(g8) - len(list_distinct(g8)) AS DOUBLE) / len(g8), 6) END AS dup8_frac,
                       CASE WHEN len(g9) = 0 THEN 0.0 ELSE round(CAST(len(g9) - len(list_distinct(g9)) AS DOUBLE) / len(g9), 6) END AS dup9_frac,
                       CASE WHEN len(g10) = 0 THEN 0.0 ELSE round(CAST(len(g10) - len(list_distinct(g10)) AS DOUBLE) / len(g10), 6) END AS dup10_frac
                FROM g)
         SELECT d.doc_id,
                COALESCE(tp.top2_frac, 0.0) AS top2_frac,
                COALESCE(tp.top3_frac, 0.0) AS top3_frac,
                COALESCE(tp.top4_frac, 0.0) AS top4_frac,
                d.dup5_frac, d.dup6_frac, d.dup7_frac, d.dup8_frac, d.dup9_frac, d.dup10_frac
         FROM d LEFT JOIN tp ON d.doc_id = tp.doc_id ORDER BY d.doc_id""",

    "q_source_overlap" ->
      """WITH tk AS (SELECT source AS src, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t FROM documents),
          g AS (SELECT DISTINCT src, array_to_string(t[i:i+2], ' ') AS gram
                FROM tk, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
                WHERE len(t) >= 3),
          s AS (SELECT src, count(*) AS n_set FROM g GROUP BY src),
          p AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
                FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
                GROUP BY 1, 2)
         SELECT src_a, src_b, sa.n_set AS n_a, sb.n_set AS n_b, n_common,
                round(CAST(n_common AS DOUBLE) / (sa.n_set + sb.n_set - n_common), 6) AS jaccard,
                round(CAST(n_common AS DOUBLE) / least(sa.n_set, sb.n_set), 6) AS containment
         FROM p JOIN s sa ON p.src_a = sa.src JOIN s sb ON p.src_b = sb.src
         ORDER BY src_a, src_b""",

    "q_domain_mix" ->
      """WITH d AS (SELECT source, CAST(sum(len(list_filter(string_split(text, ' '), x -> len(x) > 0))) AS BIGINT) AS domain_tok
                    FROM documents GROUP BY source),
          tot AS (SELECT sum(domain_tok) AS total_tok FROM d),
          p AS (SELECT source, domain_tok,
                       CAST(pow(CAST(domain_tok AS DOUBLE) / total_tok, 0.3) AS DECIMAL(27,18)) AS p_alpha
                FROM d CROSS JOIN tot),
          z AS (SELECT sum(p_alpha) AS z FROM p)
         SELECT source, domain_tok,
                round(CAST(domain_tok AS DOUBLE) / (SELECT CAST(total_tok AS DOUBLE) FROM tot), 6) AS share,
                round(CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight
         FROM p CROSS JOIN z ORDER BY source""",

    "q_shard_assign" ->
      """WITH h AS (SELECT doc_id,
                           ('0x' || substr(md5('shard#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
                    FROM documents)
         SELECT doc_id, CAST(h % 16 AS INT) AS shard,
                CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS INT) AS pos
         FROM h ORDER BY doc_id""",

    "q_shard_balance" ->
      """WITH a AS (SELECT CAST(('0x' || substr(md5('shard#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS INT) AS shard,
                           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok
                    FROM documents),
          g AS (SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM a GROUP BY shard),
          spine AS (SELECT CAST(i AS INT) AS shard FROM unnest(range(0, 16)) AS t(i)),
          f AS (SELECT s.shard, coalesce(g.n_docs, 0) AS n_docs,
                       CAST(coalesce(g.n_tokens, 0) AS BIGINT) AS n_tokens
                FROM spine s LEFT JOIN g ON s.shard = g.shard)
         SELECT shard, n_docs, n_tokens,
                round(n_tokens / (CAST(sum(n_tokens) OVER () AS DOUBLE) / count(*) OVER ()), 6) AS rel_load
         FROM f ORDER BY shard""",

    "q_mix_realize" ->
      """WITH d AS (SELECT source, CAST(sum(len(list_filter(string_split(text, ' '), x -> len(x) > 0))) AS BIGINT) AS domain_tok
                    FROM documents GROUP BY source),
          tot AS (SELECT sum(domain_tok) AS total_tok FROM d),
          p AS (SELECT source, CAST(pow(CAST(domain_tok AS DOUBLE) / total_tok, 0.3) AS DECIMAL(27,18)) AS p_alpha
                FROM d CROSS JOIN tot),
          z AS (SELECT sum(p_alpha) AS z FROM p),
          q AS (SELECT source,
                       CAST(round(round(CAST(p_alpha AS DOUBLE) / CAST(z AS DOUBLE), 6) * 20000, 0) AS BIGINT) AS quota_tok
                FROM p CROSS JOIN z),
          t AS (SELECT source, doc_id,
                       CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tok,
                       ('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
                FROM documents),
          c AS (SELECT source, doc_id, n_tok,
                       sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM t)
         SELECT c.source, q.quota_tok, CAST(count(*) AS INT) AS n_docs_kept,
                CAST(sum(n_tok) AS BIGINT) AS n_tok_kept
         FROM c JOIN q USING (source) WHERE cum <= quota_tok
         GROUP BY c.source, q.quota_tok ORDER BY c.source""",

    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE $shinglesSql,
          jp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM shing a JOIN shing b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / (len(a.sh) + len(b.sh) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) >= 0.5),
          e AS (SELECT id_a AS u, id_b AS v FROM jp UNION ALL SELECT id_b, id_a FROM jp),
          reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.u, reach.r FROM e JOIN reach ON reach.id = e.v),
          cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
          sc AS (SELECT cl.doc_id, cl.cluster_id, CAST(length(d.text) AS INT) AS n_chars
                 FROM cl JOIN documents d USING (doc_id))
         SELECT doc_id, cluster_id, n_chars,
                (row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) = 1) AS is_kept
         FROM sc ORDER BY doc_id""",

    "q_boilerplate" ->
      """WITH s AS (SELECT doc_id, sent
                    FROM documents, unnest(string_split(text, ' the ')) AS u(sent) WHERE len(sent) > 0),
          sd AS (SELECT sent, count(DISTINCT doc_id) AS sent_df FROM s GROUP BY sent)
         SELECT s.doc_id, CAST(count(*) AS INT) AS n_sent,
                CAST(sum(CASE WHEN sent_df > 2 THEN 1 ELSE 0 END) AS INT) AS n_boiler,
                round(CAST(sum(CASE WHEN sent_df > 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS boiler_ratio
         FROM s JOIN sd USING (sent) GROUP BY s.doc_id ORDER BY s.doc_id""",

    "q_remove_boilerplate" ->
      """WITH parts AS (SELECT doc_id, string_split(text, ' the ') AS ps FROM documents),
          segs AS (SELECT doc_id, ps[i+1] AS seg, i AS pos
                   FROM parts, unnest(range(0, len(ps))) AS t(i)
                   WHERE len(ps[i+1]) > 0),
          sd AS (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM segs GROUP BY seg),
          j AS (SELECT s.doc_id, s.pos, s.seg, d.seg_df FROM segs s JOIN sd d USING (seg))
         SELECT doc_id,
                array_to_string(list(seg ORDER BY pos) FILTER (WHERE seg_df <= 2), ' the ') AS clean_text,
                CAST(count(*) AS INT) AS n_seg,
                CAST(sum(CASE WHEN seg_df > 2 THEN 1 ELSE 0 END) AS INT) AS n_removed
         FROM j GROUP BY doc_id ORDER BY doc_id""",

    "q_event_windows" ->
      """WITH b AS (SELECT epoch_us(ts) // 86400000000 AS bucket, event_type,
                           CAST(value AS DECIMAL(27,6)) AS v
                    FROM events)
         SELECT strftime(make_timestamp(bucket * 86400000000), '%Y-%m-%d %H:%M:%S') AS window_start,
                strftime(make_timestamp((bucket + 1) * 86400000000), '%Y-%m-%d %H:%M:%S') AS window_end,
                event_type, count(*) AS n_events,
                round(CAST(sum(v) AS DOUBLE), 6) AS sum_value
         FROM b GROUP BY bucket, event_type ORDER BY window_start, event_type""",

    "q_table_profile" ->
      """SELECT 1 AS ordinal, 'o_orderkey' AS col_name,
                CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                count(*) AS n_rows FROM orders
         UNION ALL
         SELECT 2, 'o_custkey',
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT o_custkey) AS BIGINT), count(*) FROM orders
         UNION ALL
         SELECT 3, 'o_orderstatus',
                CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT o_orderstatus) AS BIGINT), count(*) FROM orders
         UNION ALL
         SELECT 4, 'o_totalprice',
                CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT o_totalprice) AS BIGINT), count(*) FROM orders
         UNION ALL
         SELECT 5, 'o_orderdate',
                CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT o_orderdate) AS BIGINT), count(*) FROM orders
         UNION ALL
         SELECT 6, 'o_orderpriority',
                CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT o_orderpriority) AS BIGINT), count(*) FROM orders
         ORDER BY ordinal""",

    "q_event_pivot" ->
      """SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_tfidf_top_terms" ->
      """WITH tc AS (SELECT doc_id, t AS term, count(*) AS tf
                     FROM documents, unnest(string_split(text, ' ')) AS u(t)
                     WHERE len(t) > 0 GROUP BY doc_id, t),
          d AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
          n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tc),
          s AS (SELECT tc.doc_id, tc.term, tf,
                       round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
                FROM tc JOIN d USING (term) CROSS JOIN n),
          r AS (SELECT doc_id, term, tf, score,
                       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
                FROM s)
         SELECT doc_id, term, tf, score, rank FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",

    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5('sample#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
               < CASE WHEN lang = 'zh' THEN 60 WHEN lang = 'en' THEN 25 ELSE 100 END
         ORDER BY doc_id""",

    "q_token_count" ->
      """SELECT doc_id,
                CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS INT) AS n_ws,
                CAST(len(regexp_extract_all(text, '\w+|[^\w\s]', 0)) AS INT) AS n_bpe
         FROM documents ORDER BY doc_id""",

    "q_ttr" ->
      """WITH t AS (SELECT doc_id,
                           len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tok,
                           len(list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0))) AS n_types
                    FROM documents)
         SELECT doc_id, CAST(n_tok AS INT) AS n_tok, CAST(n_types AS INT) AS n_types,
                CASE WHEN n_tok = 0 THEN 0.0 ELSE round(CAST(n_types AS DOUBLE) / n_tok, 6) END AS ttr
         FROM t ORDER BY doc_id""",

    "q_char_entropy" ->
      """WITH chars AS (SELECT doc_id, c
                        FROM documents, unnest(string_split_regex(text, '')) AS u(c) WHERE len(c) > 0),
          counts AS (SELECT doc_id, c, count(*) AS n FROM chars GROUP BY doc_id, c),
          agg AS (SELECT doc_id, sum(n) AS len,
                         sum(CAST(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) AS DECIMAL(27,18))) AS nlogn
                  FROM counts GROUP BY doc_id)
         SELECT doc_id, CAST(len AS INT) AS n_chars,
                round(CASE WHEN len <= 1 THEN 0.0
                           ELSE (ln(CAST(len AS DOUBLE)) - CAST(nlogn AS DOUBLE) / len) / ln(2.0) END, 6) AS entropy
         FROM agg ORDER BY doc_id""",

    "q_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(list_filter(string_split(text, ' '), x -> len(x) > 0),
                                   w -> CAST(len(w) * 31 + ascii(w) AS BIGINT))),
                  (acc, x) -> (acc * 131 + x) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",

    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                md5(text) AS content_hash
         FROM documents ORDER BY media_id""",

    // frame sampling replayed on the hex image of the payload:
    // stride = max(len/4, 1), frame i = bytes [min(i*stride,len),
    // min(min(i*stride,len)+stride, len)) — byte slicing maps to
    // 2-char hex slicing (this DuckDB has no BLOB substring)
    "q_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                           octet_length(encode(text)) AS blen,
                           GREATEST(octet_length(encode(text)) // 4, 1) AS stride
                    FROM documents),
          f AS (SELECT media_id, CAST(i AS INT) AS frame_idx, h,
                       LEAST(CAST(i AS INT) * stride, blen) AS fstart,
                       LEAST(LEAST(CAST(i AS INT) * stride, blen) + stride, blen) AS fend
                FROM m, unnest(range(0, 4)) AS t(i))
          SELECT media_id, frame_idx,
                 CAST(fend - fstart AS INT) AS n_bytes,
                 md5(substring(h, CAST(fstart * 2 + 1 AS INT), CAST((fend - fstart) * 2 AS INT))) AS frame_hash
          FROM f ORDER BY media_id, frame_idx""",

    // resize replayed on the hex image: resized bytes = payload
    // bytes at indices i % 4 == 0, i.e. hex pairs at those offsets
    "q_media_resize" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
                           octet_length(encode(text)) AS blen
                    FROM documents),
          r AS (SELECT media_id,
                       array_to_string(list_transform(list_filter(range(0, blen), i -> i % 4 = 0),
                                                      i -> substr(h, CAST(i * 2 + 1 AS INT), 2)), '') AS rh,
                       CAST((blen + 3) // 4 AS INT) AS n_bytes
                FROM m)
          SELECT media_id, n_bytes, md5(rh) AS content_hash FROM r ORDER BY media_id""",

    // the oracle does NOT re-parse bytes: it computes what the box
    // walk MUST return straight from the columns the bytes were
    // assembled from — integer floor division matches the engine's
    // Long division (both operands non-negative)
    "q_video_meta" ->
      """SELECT doc_id AS media_id,
                CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS mp4_brand,
                CAST(600 AS INT) AS mp4_timescale,
                CAST(n_chars AS BIGINT) AS mp4_duration,
                CAST(n_chars AS BIGINT) * 1000 // 600 AS mp4_duration_ms,
                CAST(doc_id % 3 + 1 AS INT) AS mp4_tracks
         FROM documents ORDER BY media_id""",

    "q_lineitem_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_local_supplier_volume" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q_cust_order_dist" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
               GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "q_order_revenue_join" ->
      """SELECT o_orderpriority,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                count(DISTINCT o_orderkey) AS n_orders
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_order_asof_prev" ->
      """SELECT o_orderkey, o_custkey,
                strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                coalesce(strftime(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d'), 'none') AS prev_order_date
         FROM orders ORDER BY o_orderkey""",

    "q_window_rank" ->
      """SELECT user_id, event_id, rn
         FROM (SELECT user_id, event_id,
                      CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
               FROM events)
         WHERE rn <= 3 ORDER BY user_id, rn""",

    "q_value_histogram" ->
      """WITH mm AS (SELECT CAST(min(value) AS DOUBLE) AS lo, CAST(max(value) AS DOUBLE) AS hi FROM events),
          b AS (SELECT CASE WHEN hi = lo THEN 0
                            ELSE CAST(least(greatest(floor((CAST(value AS DOUBLE) - lo) / (hi - lo) * 20), 0.0), 19.0) AS INT)
                       END AS bucket, lo, hi
                FROM events CROSS JOIN mm)
         SELECT bucket,
                round(lo + bucket * (hi - lo) / 20, 6) AS bucket_lo,
                round(lo + (bucket + 1) * (hi - lo) / 20, 6) AS bucket_hi,
                count(*) AS n
         FROM b GROUP BY bucket, lo, hi ORDER BY bucket""",

    "q_rfm_segments" ->
      """WITH per AS (SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
                             round(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 6) AS monetary
                      FROM events GROUP BY user_id),
          anch AS (SELECT max(ts) AS anchor FROM events),
          p2 AS (SELECT user_id,
                        CAST(datediff('day', CAST(last_ts AS DATE), CAST(anchor AS DATE)) AS INT) AS recency_days,
                        frequency, monetary,
                        CAST(round(monetary * 1e6, 0) AS BIGINT) AS monetary_u
                 FROM per CROSS JOIN anch),
          cuts AS (SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rc,
                          quantile_cont(frequency,    [0.25, 0.5, 0.75]) AS fc,
                          quantile_cont(monetary_u,   [0.25, 0.5, 0.75]) AS mc
                   FROM p2),
          t AS (SELECT user_id, recency_days, frequency, monetary,
                       1 + (recency_days > rc[1])::INT + (recency_days > rc[2])::INT + (recency_days > rc[3])::INT AS r_tile,
                       1 + (frequency < fc[3])::INT + (frequency < fc[2])::INT + (frequency < fc[1])::INT AS f_tile,
                       1 + (monetary_u < mc[3])::INT + (monetary_u < mc[2])::INT + (monetary_u < mc[1])::INT AS m_tile
                FROM p2 CROSS JOIN cuts)
         SELECT user_id, recency_days, frequency, monetary, r_tile, f_tile, m_tile,
                CAST(r_tile AS VARCHAR) || CAST(f_tile AS VARCHAR) || CAST(m_tile AS VARCHAR) AS segment
         FROM t ORDER BY user_id""",

    "q_burst_days" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d, count(*) AS n_events
                        FROM events GROUP BY event_type, d),
          med AS (SELECT event_type, round(quantile_cont(n_events, 0.5), 6) AS median_daily
                  FROM daily GROUP BY event_type)
         SELECT event_type, strftime(make_timestamp(d * 86400000000), '%Y-%m-%d') AS day,
                n_events, median_daily,
                CAST(n_events AS DOUBLE) > 3.0 * median_daily AS burst
         FROM daily JOIN med USING (event_type) ORDER BY event_type, day""",

    "q_sessionize" ->
      """WITH s AS (SELECT user_id, event_id, ts,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          a AS (SELECT user_id, ts,
                       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS session_idx
                FROM s)
          SELECT user_id, session_idx, count(*) AS n_events,
                 strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
                 strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
                 (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec
          FROM a GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",

    "q_dedup_prefix" ->
      """WITH p AS (SELECT doc_id,
                           array_to_string((list_filter(string_split(text, ' '), x -> len(x) > 0))[1:8], ' ') AS prefix
                    FROM documents),
          f AS (SELECT doc_id, prefix FROM p
                WHERE len(list_filter(string_split(prefix, ' '), x -> len(x) > 0)) >= 8)
         SELECT md5(prefix) AS prefix_hash, count(*) AS n_docs,
                min(doc_id) AS min_doc_id, min(prefix) AS prefix
         FROM f GROUP BY md5(prefix) HAVING count(*) >= 2
         ORDER BY prefix_hash""",

    "q_inter_event_gap" ->
      """WITH g AS (SELECT event_type,
                           (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_sec
                    FROM events),
          f AS (SELECT event_type, gap_sec FROM g WHERE gap_sec IS NOT NULL)
         SELECT event_type, CAST(0.5 AS DOUBLE) AS prob, CAST(quantile_disc(gap_sec, 0.5) AS BIGINT) AS q_value FROM f GROUP BY event_type
         UNION ALL
         SELECT event_type, CAST(0.9 AS DOUBLE), CAST(quantile_disc(gap_sec, 0.9) AS BIGINT) FROM f GROUP BY event_type
         ORDER BY event_type, prob""",

    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY user_id),
          s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
                 WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
          s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
                 WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id),
          c AS (SELECT (SELECT count(*) FROM s1) AS n0,
                       (SELECT count(*) FROM s2) AS n1,
                       (SELECT count(*) FROM s3) AS n2)
         SELECT * FROM (
           SELECT 1 AS stage, 'signup' AS event_type, n0 AS n_users,
                  CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n0 AS DOUBLE) / n0, 6) END AS conv_overall,
                  CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n0 AS DOUBLE) / n0, 6) END AS conv_prev
           FROM c
           UNION ALL
           SELECT 2, 'click', n1,
                  CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n1 AS DOUBLE) / n0, 6) END,
                  CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n1 AS DOUBLE) / n0, 6) END
           FROM c
           UNION ALL
           SELECT 3, 'purchase', n2,
                  CASE WHEN n0 = 0 THEN 0.0 ELSE round(CAST(n2 AS DOUBLE) / n0, 6) END,
                  CASE WHEN n1 = 0 THEN 0.0 ELSE round(CAST(n2 AS DOUBLE) / n1, 6) END
           FROM c)
         ORDER BY stage""",

    "q_shipping_priority" ->
      """WITH rev AS (SELECT l_orderkey, sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
                      FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01' GROUP BY l_orderkey)
         SELECT r.l_orderkey, round(CAST(r.rev AS DOUBLE), 6) AS revenue,
                strftime(o.o_orderdate, '%Y-%m-%d') AS order_date, o.o_orderpriority
         FROM rev r
         JOIN orders o ON r.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
         ORDER BY revenue DESC, order_date, r.l_orderkey LIMIT 10""",

    "q_nation_trade" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                CAST(year(l.l_shipdate) AS INT) AS ship_year,
                round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation ns ON s.s_nationkey = ns.n_nationkey
         JOIN nation nc ON c.c_nationkey = nc.n_nationkey
         WHERE ns.n_name IN ('NATION_18', 'NATION_19', 'NATION_20', 'NATION_21')
           AND nc.n_name IN ('NATION_18', 'NATION_19', 'NATION_20', 'NATION_21')
           AND ns.n_name <> nc.n_name
         GROUP BY 1, 2, 3
         ORDER BY 1, 2, 3""",

    "q_forecast_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
                count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24""",

    "q_returned_revenue" ->
      """WITH rev AS (SELECT o.o_custkey,
                             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS rev
                      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                      WHERE l.l_returnflag = 'R'
                      GROUP BY o.o_custkey)
         SELECT c.c_custkey, c.c_name, round(CAST(r.rev AS DOUBLE), 6) AS revenue
         FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
         ORDER BY revenue DESC, c.c_custkey LIMIT 20""",

    "q_mix_temperature" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
          t AS (SELECT sum(CAST(n_docs AS DOUBLE)) AS tot, sum(sqrt(CAST(n_docs AS DOUBLE))) AS wtot FROM c)
         SELECT c.source, c.n_docs,
                round(CAST(c.n_docs AS DOUBLE) / t.tot, 6) AS p_raw,
                round(sqrt(CAST(c.n_docs AS DOUBLE)) / t.wtot, 6) AS p_temp,
                round((sqrt(CAST(c.n_docs AS DOUBLE)) / t.wtot) / (CAST(c.n_docs AS DOUBLE) / t.tot), 6) AS upweight
         FROM c, t ORDER BY c.source""",

    "q_late_ship_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "q_priority_mix" ->
      """SELECT l.l_linestatus,
                CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
                CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY l.l_linestatus
         ORDER BY l.l_linestatus""",

    "q_class_balance_sample" ->
      """SELECT lang, doc_id, rn FROM (
           SELECT lang, doc_id,
                  CAST(row_number() OVER (
                    PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
           FROM documents)
         WHERE rn <= 50
         ORDER BY lang, rn""",

    "q_rollup_tokens" ->
      """WITH d AS (SELECT source, lang,
                           len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tok
                    FROM documents),
          r AS (SELECT source, lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok
                FROM d GROUP BY ROLLUP (source, lang))
         SELECT (CASE WHEN source IS NULL THEN 1 ELSE 0 END
                 + CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS level,
                COALESCE(source, 'ALL') AS source,
                COALESCE(lang, 'ALL') AS lang,
                n_docs, total_tok
         FROM r ORDER BY level, source, lang""",

    "q_cube_quality" ->
      """WITH d AS (SELECT source, lang,
                           len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tok
                    FROM documents)
         SELECT CAST(GROUPING(source, lang) AS INT) AS gid,
                COALESCE(source, 'ALL') AS source,
                COALESCE(lang, 'ALL') AS lang,
                count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok
         FROM d GROUP BY CUBE (source, lang)
         ORDER BY gid, source, lang""",

    "q_zipf_slope" ->
      """WITH toks AS (SELECT t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          top AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank
                  FROM counts ORDER BY cnt DESC, token LIMIT 100),
          t AS (SELECT CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(27,18)) AS x,
                       CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(27,18)) AS y,
                       CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(cnt AS DOUBLE)) AS DECIMAL(27,18)) AS xy,
                       CAST(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)) AS DECIMAL(27,18)) AS xx
                FROM top),
          a AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx FROM t)
         SELECT CAST(n AS INT) AS n_terms,
                round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
                round((CAST(sy AS DOUBLE)
                       - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                         * CAST(sx AS DOUBLE)) / n, 6) AS intercept
         FROM a""",

    "q_gini_tokens" ->
      """WITH toks AS (SELECT t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
          hist AS (SELECT cnt, count(*) AS m FROM counts GROUP BY cnt),
          blocks AS (SELECT cnt, m,
                            sum(m) OVER (ORDER BY cnt
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_m
                     FROM hist),
          a AS (SELECT sum(m) AS n, sum(m * cnt) AS tot,
                       sum(CAST(cnt AS HUGEINT) * (cum_m - m + 1 + cum_m) * m) AS s1x2
                FROM blocks)
         SELECT CAST(n AS INT) AS n_types, CAST(tot AS BIGINT) AS total_tok,
                round((CAST(s1x2 AS DOUBLE) - (n + 1) * CAST(tot AS DOUBLE))
                      / (CAST(n AS DOUBLE) * tot), 6) AS gini
         FROM a""",

    "q_heaps_fit" ->
      """WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM documents),
          cuts AS (SELECT g, CAST(floor(max_id * g / 16) AS BIGINT) AS cut
                   FROM mx, unnest(range(1, 17)) AS u(g)),
          pd AS (SELECT doc_id, len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS nt
                 FROM documents),
          ntok AS (SELECT g, sum(nt) AS n_tokens FROM pd JOIN cuts ON pd.doc_id <= cuts.cut GROUP BY g),
          fs AS (SELECT token, min(doc_id) AS first_id
                 FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                       FROM documents)
                 GROUP BY token),
          ntyp AS (SELECT g, count(*) AS n_types FROM fs JOIN cuts ON fs.first_id <= cuts.cut GROUP BY g),
          pts AS (SELECT CAST(ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(27,18)) AS x,
                         CAST(ln(CAST(n_types AS DOUBLE)) AS DECIMAL(27,18)) AS y,
                         CAST(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_types AS DOUBLE)) AS DECIMAL(27,18)) AS xy,
                         CAST(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE)) AS DECIMAL(27,18)) AS xx
                  FROM ntok JOIN ntyp USING (g)
                  WHERE n_tokens > 0 AND n_types > 0),
          a AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy, sum(xx) AS sxx,
                       count(DISTINCT x) AS nx
                FROM pts)
         SELECT CAST(n AS INT) AS n_checkpoints,
                CASE WHEN nx > 1 THEN
                  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0
                END AS beta,
                CASE WHEN nx > 1 THEN
                  round((CAST(sy AS DOUBLE)
                         - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                           * CAST(sx AS DOUBLE)) / n, 6) + 0
                END AS intercept
         FROM a""",
    // the trailing "+ 0" on both coefficients: DuckDB round() keeps
    // IEEE signed zero (an intercept of -4e-7 at sf0.1 rounds to -0.0)
    // while Spark's round goes through BigDecimal, which has NO signed
    // zero and yields +0.0 — adding positive zero canonicalizes
    // (-0.0 + 0 = +0.0 in IEEE) so the engines agree bit-for-bit

    "q_ks_length" ->
      """WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v, count(*) AS c
                    FROM documents GROUP BY g, v),
          tot AS (SELECT g, sum(c) AS n FROM h GROUP BY g),
          pairs AS (SELECT a.g AS src_a, a.n AS na, b.g AS src_b, b.n AS nb
                    FROM tot a JOIN tot b ON a.g < b.g),
          grid AS (SELECT DISTINCT src_a, src_b, na, nb, v FROM (
                     SELECT p.src_a, p.src_b, p.na, p.nb, h.v FROM pairs p JOIN h ON h.g = p.src_a
                     UNION ALL
                     SELECT p.src_a, p.src_b, p.na, p.nb, h.v FROM pairs p JOIN h ON h.g = p.src_b)),
          cdf AS (SELECT src_a, src_b, na, nb, grid.v,
                         sum(COALESCE(ha.c, 0)) OVER (PARTITION BY src_a, src_b ORDER BY grid.v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
                         sum(COALESCE(hb.c, 0)) OVER (PARTITION BY src_a, src_b ORDER BY grid.v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
                  FROM grid
                  LEFT JOIN h ha ON ha.g = grid.src_a AND ha.v = grid.v
                  LEFT JOIN h hb ON hb.g = grid.src_b AND hb.v = grid.v)
         SELECT src_a, src_b,
                round(max(abs(CAST(cum_a AS DOUBLE) / na - CAST(cum_b AS DOUBLE) / nb)), 6) AS ks
         FROM cdf GROUP BY src_a, src_b ORDER BY src_a, src_b""",

    "q_dedup_rate_by_source" ->
      """WITH fc AS (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM documents GROUP BY md5(text)),
          j AS (SELECT d.source, d.doc_id, fc.keep_id
                FROM documents d JOIN fc ON md5(d.text) = fc.h)
         SELECT source, CAST(count(*) AS INT) AS n_docs,
                CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS INT) AS n_dup,
                round(CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_rate
         FROM j GROUP BY source ORDER BY source""",

    "q_pmi_pairs" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          cnt AS (SELECT token, count(*) AS tc FROM t GROUP BY token),
          vocab AS (SELECT token FROM (SELECT token, tc FROM cnt ORDER BY tc DESC, token LIMIT 50)),
          pres AS (SELECT DISTINCT doc_id, t.token FROM t JOIN vocab USING (token)),
          c1 AS (SELECT token, count(*) AS cd FROM pres GROUP BY token),
          nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
          pairs AS (SELECT a.token AS t1, b.token AS t2, count(*) AS c12
                    FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.token < b.token
                    GROUP BY a.token, b.token),
          scored AS (SELECT t1, t2, c12,
                            round(ln(CAST(n AS DOUBLE) * c12 / (CAST(ca.cd AS DOUBLE) * cb.cd)), 6) AS pmi
                     FROM pairs CROSS JOIN nd
                     JOIN c1 ca ON ca.token = t1
                     JOIN c1 cb ON cb.token = t2
                     WHERE c12 >= 2)
         SELECT t1, t2, CAST(c12 AS BIGINT) AS n_docs_both, pmi
         FROM scored ORDER BY pmi DESC, t1, t2 LIMIT 20""",

    "q_token_dispersion" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          pd AS (SELECT token, doc_id, count(*) AS c FROM t GROUP BY token, doc_id),
          ag AS (SELECT token, sum(c) AS tc, count(*) AS n_docs, sum(c * c) AS s2 FROM pd GROUP BY token),
          nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
         SELECT token, CAST(tc AS BIGINT) AS tc, CAST(n_docs AS BIGINT) AS n_docs,
                round((CAST(s2 AS DOUBLE) / n - (CAST(tc AS DOUBLE) / n) * (CAST(tc AS DOUBLE) / n))
                      / (CAST(tc AS DOUBLE) / n), 6) AS vmr
         FROM ag CROSS JOIN nd ORDER BY tc DESC, token LIMIT 20""",

    "q_hapax_rate" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          pd AS (SELECT source, token, count(*) AS c FROM t GROUP BY source, token)
         SELECT source, CAST(count(*) AS BIGINT) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
                round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS hapax_rate
         FROM pd GROUP BY source ORDER BY source""",

    "q_head_coverage" ->
      """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          cnt AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
          tot AS (SELECT sum(cnt) AS total FROM cnt),
          top AS (SELECT token, cnt FROM cnt ORDER BY cnt DESC, token LIMIT 30),
          ranked AS (SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS k,
                            sum(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS cum
                     FROM top)
         SELECT k, CAST(cum AS BIGINT) AS top_mass, CAST(total AS BIGINT) AS total_mass,
                round(CAST(cum AS DOUBLE) / total, 6) AS coverage
         FROM ranked CROSS JOIN tot WHERE k IN (5, 10, 20, 30) ORDER BY k""",

    "q_dup_cluster_hist" ->
      """WITH cl AS (SELECT md5(text) AS h, count(*) AS s FROM documents GROUP BY md5(text))
         SELECT CAST(s AS INT) AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(s * count(*) AS BIGINT) AS n_docs
         FROM cl GROUP BY s ORDER BY cluster_size""",

    "q_dup_source_matrix" ->
      s"""WITH $shinglesSql,
          inv AS (SELECT lang, doc_id, unnest(sh) AS g FROM shing),
          keep AS (SELECT lang, g FROM inv GROUP BY lang, g HAVING count(*) <= 3),
          capped AS (SELECT i.lang, i.doc_id, CAST(count(*) AS INT) AS sz, list(i.g) AS sh
                     FROM inv i JOIN keep k ON i.lang = k.lang AND i.g = k.g
                     GROUP BY i.lang, i.doc_id),
          pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                              / (a.sz + b.sz - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)), 6) AS j
                 FROM capped a JOIN capped b ON a.lang = b.lang AND a.doc_id < b.doc_id
                 WHERE len(list_intersect(a.sh, b.sh)) > 0),
          d AS (SELECT doc_id, source FROM documents)
         SELECT da.source AS src_original, db.source AS src_copy, CAST(count(*) AS BIGINT) AS n_pairs
         FROM pr JOIN d da ON pr.id_a = da.doc_id JOIN d db ON pr.id_b = db.doc_id
         WHERE j >= 0.5
         GROUP BY 1, 2 ORDER BY src_original, src_copy""",

    "q_mi_lang_source" ->
      """WITH joint AS (SELECT coalesce(CAST(lang AS VARCHAR), '(null)') AS x,
                              coalesce(CAST(source AS VARCHAR), '(null)') AS y, count(*) AS n
                       FROM documents GROUP BY 1, 2),
          m AS (SELECT x, y, n,
                       sum(n) OVER () AS total,
                       sum(n) OVER (PARTITION BY x) AS nx,
                       sum(n) OVER (PARTITION BY y) AS ny
                FROM joint),
          a AS (SELECT sum(CAST(n AS DOUBLE) / total * ln(CAST(n AS DOUBLE) * total / (nx * ny))) AS mi_raw,
                       -sum(CAST(n AS DOUBLE) / total * ln(CAST(nx AS DOUBLE) / total)) AS hx_raw,
                       -sum(CAST(n AS DOUBLE) / total * ln(CAST(ny AS DOUBLE) / total)) AS hy_raw
                FROM m)
         SELECT round(mi_raw, 6) AS mi, round(hx_raw, 6) AS h_x, round(hy_raw, 6) AS h_y,
                round(CASE WHEN hx_raw * hy_raw > 0 THEN mi_raw / sqrt(hx_raw * hy_raw) ELSE 0.0 END, 6) AS nmi
         FROM a""",

    "q_silhouette" ->
      s"""WITH e2 AS (SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
          c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cid, embedding AS ce, nrm AS cn
                FROM (SELECT vec_id, embedding, nrm FROM e2 ORDER BY vec_id LIMIT 16)),
          rnk AS (SELECT e.vec_id, c.cid,
                         ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} AS cos,
                         row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY ${cosNSql(dotSql("e.embedding", "c.ce"), "e.nrm", "c.cn")} DESC, c.cid ASC) AS rn
                  FROM e2 e CROSS JOIN c),
          own AS (SELECT vec_id, cid AS centroid_id, 1.0 - cos AS a FROM rnk WHERE rn = 1),
          sec AS (SELECT vec_id, 1.0 - cos AS b FROM rnk WHERE rn = 2),
          s AS (SELECT own.centroid_id,
                       round(CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) ELSE 0.0 END, 6) AS sil
                FROM own JOIN sec USING (vec_id))
         SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vecs,
                round(CAST(sum(CAST(sil AS DECIMAL(27,18))) AS DOUBLE) / count(*), 6) AS mean_sil
         FROM s GROUP BY centroid_id ORDER BY centroid_id""",

    "q_weighted_sample" ->
      """SELECT doc_id, n_chars,
                round(ln((('0x' || substr(md5('wsample#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                         / 1152921504606846976.0) / CAST(n_chars AS DOUBLE), 6) AS skey
         FROM documents WHERE n_chars > 0
         ORDER BY skey DESC, doc_id LIMIT 50""",

    "q_cluster_purity" ->
      s"""WITH $ivfCtes,
          lab AS (SELECT a.centroid_id, e.label FROM asg a JOIN embeddings e ON a.vec_id = e.vec_id),
          cl AS (SELECT centroid_id, label, count(*) AS c FROM lab GROUP BY centroid_id, label),
          tp AS (SELECT centroid_id, label, c,
                        row_number() OVER (PARTITION BY centroid_id ORDER BY c DESC, label ASC) AS rn,
                        sum(c) OVER (PARTITION BY centroid_id) AS n_vecs
                 FROM cl)
          SELECT centroid_id, CAST(n_vecs AS BIGINT) AS n_vecs, label AS top_label,
                 CAST(c AS BIGINT) AS n_top, round(CAST(c AS DOUBLE) / n_vecs, 6) AS purity
          FROM tp WHERE rn = 1 ORDER BY centroid_id""",

    "q_simpson_diversity" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS token
                    FROM documents),
          pd AS (SELECT source, token, count(*) AS c FROM t GROUP BY source, token)
         SELECT source, CAST(count(*) AS BIGINT) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens,
                round(CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) * CAST(sum(c) AS BIGINT) / sum(c * c), 6) AS inv_simpson
         FROM pd GROUP BY source ORDER BY source""",

    "q_filter_agreement" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          b AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS bkt FROM toks),
          wt AS (SELECT doc_id,
                        CAST((('0x' || substr(md5('qcw:' || CAST(bkt AS VARCHAR)), 1, 15))::BIGINT
                              / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
                 FROM b),
          clf AS (SELECT doc_id, (round(CAST(sum(w) AS DOUBLE) / count(*), 6) >= 0.0) AS clf_keep
                  FROM wt GROUP BY doc_id),
          t2 AS (SELECT doc_id, lower(text) AS lt,
                        list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                 FROM documents),
          f AS (SELECT doc_id, lt, CAST(len(tk) AS INT) AS n_tok,
                       CASE WHEN len(tk) > 0
                            THEN round(CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS DOUBLE) / len(tk), 6)
                            ELSE 0.0 END AS mean_tok_len
                FROM t2),
          rules AS (SELECT doc_id,
                           ((n_tok >= 20 AND n_tok <= 100000) AND (mean_tok_len >= 2.0 AND mean_tok_len <= 10.0)
                            AND strpos(lt, 'lorem ipsum') = 0 AND strpos(lt, '{') = 0) AS rules_keep
                    FROM f)
         SELECT c.clf_keep, r.rules_keep, CAST(count(*) AS BIGINT) AS n
         FROM clf c JOIN rules r ON c.doc_id = r.doc_id
         GROUP BY c.clf_keep, r.rules_keep ORDER BY clf_keep, rules_keep""",

    "q_hashed_bow" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          e AS (SELECT doc_id,
                       CAST(('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS INT) AS bkt,
                       CASE WHEN ('0x' || substr(md5('sgn:' || token), 1, 15))::BIGINT % 2 = 0
                            THEN 1.0 ELSE -1.0 END AS sgn
                FROM toks)
         SELECT doc_id, bkt, CAST(sum(sgn) AS DOUBLE) AS v
         FROM e GROUP BY doc_id, bkt ORDER BY doc_id, bkt""",

    "q_sp_seed_vocab" ->
      """WITH w AS (SELECT t AS word, count(*) AS c
                    FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0
                    GROUP BY t),
          subs AS (SELECT substr(word, CAST(s.i AS INT) + 1, CAST(l.j AS INT)) AS piece, c
                   FROM w,
                        unnest(range(0, len(word))) AS s(i),
                        unnest(range(1, 1 + least(4, len(word) - CAST(s.i AS INT)))) AS l(j))
         SELECT piece, CAST(sum(c) AS BIGINT) AS freq
         FROM subs GROUP BY piece ORDER BY freq DESC, piece LIMIT 50""",

    "q_label_centroid_sim" ->
      s"""WITH m AS (SELECT label, $kmeansMeanSql FROM embeddings GROUP BY label),
          v AS (SELECT label, list_value(${(1 to 64).map("m" + _).mkString(", ")}) AS mv FROM m),
          p AS (SELECT a.label AS label_a, b.label AS label_b,
                       ${dotSql("a.mv", "b.mv")} AS ab,
                       ${dotSql("a.mv", "a.mv")} AS na,
                       ${dotSql("b.mv", "b.mv")} AS nb
                FROM v a JOIN v b ON a.label < b.label)
          SELECT label_a, label_b, round(${cosNSql("ab", "na", "nb")}, 6) AS cos
          FROM p ORDER BY label_a, label_b""",

    "q_embed_norms" ->
      s"""WITH nrms AS (SELECT label, sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)
          SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                 round(min(nrm), 6) AS min_norm,
                 round(CAST(sum(CAST(nrm AS DECIMAL(27,18))) AS DOUBLE) / count(*), 6) AS mean_norm,
                 round(max(nrm), 6) AS max_norm
          FROM nrms GROUP BY label ORDER BY label""",

    "q_signal_rank_corr" ->
      """WITH d AS (SELECT CAST(n_chars AS BIGINT) AS av,
                           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS bv
                    FROM documents),
          ha AS (SELECT av AS v, count(*) AS m FROM d GROUP BY av),
          ra AS (SELECT v, CAST(CAST(sum(m) OVER (ORDER BY v) - m AS DOUBLE)
                                + CAST(m + 1 AS DOUBLE) / 2 AS DECIMAL(12,1)) AS x FROM ha),
          hb AS (SELECT bv AS v, count(*) AS m FROM d GROUP BY bv),
          rb AS (SELECT v, CAST(CAST(sum(m) OVER (ORDER BY v) - m AS DOUBLE)
                                + CAST(m + 1 AS DOUBLE) / 2 AS DECIMAL(12,1)) AS y FROM hb),
          j AS (SELECT ra.x, rb.y FROM d JOIN ra ON d.av = ra.v JOIN rb ON d.bv = rb.v),
          s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                       CAST(sum(x * y) AS DOUBLE) AS sxy,
                       CAST(sum(x * x) AS DOUBLE) AS sxx,
                       CAST(sum(y * y) AS DOUBLE) AS syy
                FROM j)
         SELECT CAST(n AS BIGINT) AS n,
                CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0.0 THEN NULL
                     ELSE round((n * sxy - sx * sy)
                                / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                END AS rho
         FROM s""",

    "q_quantile_disc" ->
      """SELECT lang, CAST(0.25 AS DOUBLE) AS prob, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q_value FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.5 AS DOUBLE), CAST(quantile_disc(n_chars, 0.5) AS BIGINT) FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.75 AS DOUBLE), CAST(quantile_disc(n_chars, 0.75) AS BIGINT) FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.9 AS DOUBLE), CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.99 AS DOUBLE), CAST(quantile_disc(n_chars, 0.99) AS BIGINT) FROM documents GROUP BY lang
         ORDER BY lang, prob""",

    "q_winsorize" ->
      """WITH b AS (SELECT lang,
                           CAST(quantile_disc(n_chars, 0.1) AS BIGINT) AS lo_v,
                           CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS hi_v
                    FROM documents GROUP BY lang)
         SELECT d.doc_id, d.lang, d.n_chars,
                least(greatest(d.n_chars, b.lo_v), b.hi_v) AS clamped,
                least(greatest(d.n_chars, b.lo_v), b.hi_v) <> d.n_chars AS is_clipped
         FROM documents d JOIN b USING (lang) ORDER BY d.doc_id""",

    "q_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
          f AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id),
          sz AS (SELECT cohort_wk, count(*) AS cohort_size FROM f GROUP BY cohort_wk),
          act AS (SELECT f.cohort_wk, CAST(uw.wk - f.cohort_wk AS INT) AS week_k, count(*) AS n_active
                  FROM uw JOIN f ON uw.user_id = f.user_id
                  GROUP BY f.cohort_wk, uw.wk - f.cohort_wk)
         SELECT act.cohort_wk, act.week_k, act.n_active, sz.cohort_size,
                round(CAST(act.n_active AS DOUBLE) / sz.cohort_size, 6) AS retention
         FROM act JOIN sz ON act.cohort_wk = sz.cohort_wk
         ORDER BY act.cohort_wk, act.week_k""",

    "q_moving_avg" ->
      """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
                        FROM events GROUP BY event_type, epoch_us(ts) // 86400000000)
         SELECT event_type, day, n,
                round(CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 7.0, 6) AS ma7
         FROM daily ORDER BY event_type, day""",

    "q_length_outliers" ->
      """SELECT doc_id, lang, n_chars,
                round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS pr,
                (round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id), 6) >= 0.99) AS is_outlier
         FROM documents ORDER BY doc_id""",

    "q_cohens_kappa" ->
      s"""WITH $votesCtes,
          p AS (SELECT a.doc_id, a.extractor AS ex_a, b.extractor AS ex_b, a.vote AS va, b.vote AS vb
                FROM votes a JOIN votes b ON a.doc_id = b.doc_id AND a.extractor < b.extractor),
          agg AS (SELECT ex_a, ex_b, count(*) AS n,
                         sum(CASE WHEN va = vb THEN 1 ELSE 0 END) AS n_agree,
                         sum(CASE WHEN va = -1 THEN 1 ELSE 0 END) AS na_0,
                         sum(CASE WHEN vb = -1 THEN 1 ELSE 0 END) AS nb_0,
                         sum(CASE WHEN va = 0 THEN 1 ELSE 0 END) AS na_1,
                         sum(CASE WHEN vb = 0 THEN 1 ELSE 0 END) AS nb_1,
                         sum(CASE WHEN va = 1 THEN 1 ELSE 0 END) AS na_2,
                         sum(CASE WHEN vb = 1 THEN 1 ELSE 0 END) AS nb_2
                  FROM p GROUP BY ex_a, ex_b),
          k AS (SELECT ex_a, ex_b, n, n_agree,
                       CAST(na_0*nb_0 + na_1*nb_1 + na_2*nb_2 AS BIGINT) AS pe_num
                FROM agg)
         SELECT ex_a, ex_b, n,
                round(CAST(n_agree AS DOUBLE) / n, 6) AS po,
                round(CAST(pe_num AS DOUBLE) / (n * n), 6) AS pe,
                round(CASE WHEN pe_num = n * n THEN 1.0
                           ELSE (CAST(n_agree AS DOUBLE) / n - CAST(pe_num AS DOUBLE) / (n * n))
                                / (1.0 - CAST(pe_num AS DOUBLE) / (n * n)) END, 6) AS kappa
         FROM k ORDER BY ex_a, ex_b""",

    "q_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
          ex AS (SELECT user_id, day + i AS wday FROM ud, unnest(range(0, 7)) AS u(i))
         SELECT wday AS day, count(DISTINCT user_id) AS n_active
         FROM ex GROUP BY wday ORDER BY day""",

    "q_json_props" ->
      """WITH p AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
         SELECT event_type, count(*) AS n_events,
                CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
                CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
         FROM p GROUP BY event_type ORDER BY event_type""",

    "q_asof_attribution" ->
      """WITH v AS (SELECT user_id, ts AS view_ts,
                           max(event_id) AS view_id,
                           arg_max(value, event_id) AS view_value
                    FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
          p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                v.view_id, v.view_value
         FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.view_ts
         ORDER BY p.event_id""",

    "q_range_join_binned" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
          a AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                WHERE event_type = 'purchase')
         SELECT a.event_id,
                CAST(count(o.event_id) AS INT) AS n_nearby,
                COALESCE(round(CAST(sum(CAST(o.value AS DECIMAL(27,6))) AS DOUBLE), 6), 0.0) AS sum_nearby_value
         FROM a LEFT JOIN e o
           ON o.user_id = a.user_id AND o.event_id <> a.event_id
              AND abs(o.ts_us - a.ts_us) <= 60000000
         GROUP BY a.event_id ORDER BY a.event_id""",

    "q_data_card" ->
      """WITH t AS (SELECT source, lang, text,
                           list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
                    FROM documents),
          m AS (SELECT source, lang,
                       CAST(len(toks) AS BIGINT) AS tok,
                       len(toks) AS n_tokens, length(text) AS n_chars,
                       len(list_filter(toks, x -> x = 'the')) + len(list_filter(toks, x -> x = 'a')) AS n_stop,
                       length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
                FROM t),
          f AS (SELECT source, lang, tok,
                       round((least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
                              + least((CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0)
                              + greatest(1.0 - (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 10.0, 0.0)) / 3.0, 6) AS q
                FROM m)
         SELECT source, CAST(count(*) AS INT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                round(CAST(sum(CAST(q AS DECIMAL(27,18))) AS DOUBLE) / count(*), 6) AS mean_quality,
                round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS en_share
         FROM f GROUP BY source ORDER BY source""",

    "q_min_cost_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
                            sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS s_ext,
                            sum(CAST(l_quantity AS DECIMAL(18,4))) AS s_qty
                     FROM lineitem GROUP BY l_partkey, l_suppkey),
          eu AS (SELECT s.s_suppkey, s.s_name FROM supplier s
                 JOIN nation n ON s.s_nationkey = n.n_nationkey
                 JOIN region r ON n.n_regionkey = r.r_regionkey
                 WHERE r.r_name = 'EUROPE'),
          priced AS (SELECT ps.l_partkey, ps.l_suppkey, eu.s_name,
                            CAST(ps.s_ext AS DOUBLE) / CAST(ps.s_qty AS DOUBLE) AS unit_price
                     FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey),
          best AS (SELECT l_partkey, s_name, unit_price,
                          row_number() OVER (PARTITION BY l_partkey ORDER BY unit_price, l_suppkey) AS rn
                   FROM priced)
         SELECT b.l_partkey AS p_partkey, p.p_name, b.s_name, round(b.unit_price, 6) AS unit_price
         FROM best b JOIN part p ON b.l_partkey = p.p_partkey
         WHERE b.rn = 1
         ORDER BY b.unit_price, p_partkey LIMIT 100""",

    "q_market_share" ->
      """WITH rev AS (SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
                             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS v,
                             n2.n_name AS supp_nation
                      FROM lineitem l
                      JOIN orders o ON l.l_orderkey = o.o_orderkey
                      JOIN customer c ON o.o_custkey = c.c_custkey
                      JOIN nation n ON c.c_nationkey = n.n_nationkey
                      JOIN region r ON n.n_regionkey = r.r_regionkey
                      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
                      WHERE r.r_name = 'ASIA')
         SELECT order_year,
                round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN v ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                      / CAST(sum(v) AS DOUBLE), 6) AS mkt_share,
                round(CAST(sum(v) AS DOUBLE), 6) AS total_revenue
         FROM rev GROUP BY order_year ORDER BY order_year""",

    "q_nation_profit" ->
      """SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS o_year,
                round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS profit
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE p.p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_revenue_concentration" ->
      """WITH pr AS (SELECT l_partkey,
                            sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
                     FROM lineitem GROUP BY l_partkey),
          tot AS (SELECT sum(rev) AS total, count(*) AS n_parts FROM pr)
         SELECT pr.l_partkey AS p_partkey,
                round(CAST(pr.rev AS DOUBLE), 6) AS revenue,
                round(CAST(pr.rev AS DOUBLE) / CAST(tot.total AS DOUBLE), 6) AS share
         FROM pr, tot
         WHERE CAST(pr.rev AS DOUBLE) / CAST(tot.total AS DOUBLE) > 1.25 / tot.n_parts
         ORDER BY CAST(pr.rev AS DOUBLE) / CAST(tot.total AS DOUBLE) DESC, p_partkey""",

    "q_promo_revenue" ->
      """SELECT round(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 6) AS promo_revenue,
                round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS total_revenue,
                round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                      / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_pct
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_shipdate >= TIMESTAMP '1997-06-01' AND l.l_shipdate < TIMESTAMP '1997-09-01'""",

    "q_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
                             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
                      FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
                      GROUP BY l_suppkey),
          m AS (SELECT max(total_rev) AS mx FROM rev)
         SELECT r.l_suppkey AS s_suppkey, s.s_name, round(CAST(r.total_rev AS DOUBLE), 6) AS total_revenue
         FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey, m
         WHERE r.total_rev = m.mx
         ORDER BY s_suppkey""",

    "q_parts_supplier_cnt" ->
      """SELECT p.p_type, CAST(p.p_size - p.p_size % 10 AS INT) AS size_band,
                CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_type, size_band""",

    "q_small_qty_revenue" ->
      """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
          pa AS (SELECT l.l_partkey, sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS sq, count(*) AS nq
                 FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
                 GROUP BY l.l_partkey)
         SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
                count(*) AS n_items
         FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
         WHERE CAST(l.l_quantity AS DOUBLE) < 0.2 * (CAST(pa.sq AS DOUBLE) / pa.nq)""",

    "q_large_orders" ->
      """WITH oq AS (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
                     FROM lineitem GROUP BY l_orderkey
                     HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150)
         SELECT c.c_custkey, c.c_name, o.o_orderkey,
                strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
                o.o_totalprice, round(CAST(oq.total_qty AS DOUBLE), 6) AS total_qty
         FROM oq JOIN orders o ON oq.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY total_qty DESC, o.o_orderkey LIMIT 100""",

    "q_disjunctive_filter" ->
      """SELECT round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
                count(*) AS n_items
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30 AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 31 AND 50 AND l.l_quantity BETWEEN 20 AND 30)""",

    "q_dormant_customers" ->
      """WITH avg_bal AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ab
                          FROM customer WHERE c_acctbal > 0),
          recent AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '2000-01-01')
         SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
                round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_acctbal
         FROM customer c, avg_bal
         WHERE c.c_acctbal > avg_bal.ab
           AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    "q_triangle_count" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          edges AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                    FROM items a JOIN items b
                      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          nodes AS (SELECT pa AS v FROM edges UNION SELECT pb FROM edges),
          deg AS (SELECT v, count(*) AS d
                  FROM (SELECT pa AS v FROM edges UNION ALL SELECT pb FROM edges) GROUP BY v),
          tri AS (SELECT count(*) AS t FROM edges e1
                  JOIN edges e2 ON e1.pb = e2.pa
                  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
          wed AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg)
         SELECT (SELECT count(*) FROM nodes) AS n_nodes,
                (SELECT count(*) FROM edges) AS n_edges,
                CAST(tri.t AS BIGINT) AS n_triangles,
                CAST(wed.w AS BIGINT) AS n_wedges,
                CASE WHEN wed.w > 0 THEN round(3.0 * tri.t / wed.w, 6)
                     ELSE 0.0 END AS global_clustering
         FROM tri, wed""",

    // replays triangleStatsSampledFromBaskets bit-for-bit: same
    // integer-hash keep set (thresh = floor(0.1*999983) = 99998),
    // same exact census on the survivors, same p_eff^3 scaling in
    // left-associated doubles. The oracle samples the DISTINCT edge
    // relation — equivalent to the engine's emit-time predicate
    // because the keep hash is a pure function of (pa, pb) and so
    // commutes with the dedup.
    "q_triangle_sampled" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          edges AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                    FROM items a JOIN items b
                      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          samp AS (SELECT pa, pb FROM edges
                   WHERE (CAST(pa AS BIGINT) * 1103515245
                          + CAST(pb AS BIGINT) * 12345
                          + 18581050327) % 999983 < 99998),
          tri AS (SELECT count(*) AS t FROM samp e1
                  JOIN samp e2 ON e1.pb = e2.pa
                  JOIN samp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
          p AS (SELECT CAST(99998 AS DOUBLE) / 999983 AS pk)
         SELECT p.pk AS p_keep,
                (SELECT count(*) FROM samp) AS n_edges_sampled,
                CAST(tri.t AS BIGINT) AS n_triangles_sampled,
                CAST(floor(tri.t / (p.pk * p.pk * p.pk) + 0.5) AS BIGINT) AS n_triangles_est
         FROM tri, p""",

    "q_basket_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
          ic AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY l_partkey),
          pc AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS pair_cnt
                 FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                 GROUP BY 1, 2 HAVING count(*) >= 3)
         SELECT pc.pa, pc.pb, pc.pair_cnt,
                round((CAST(pc.pair_cnt AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
                      / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE)), 6) AS lift,
                round(CAST(pc.pair_cnt AS DOUBLE) / CAST(ia.cnt AS DOUBLE), 6) AS confidence
         FROM pc JOIN ic ia ON pc.pa = ia.l_partkey JOIN ic ib ON pc.pb = ib.l_partkey, n
         ORDER BY lift DESC, pa, pb LIMIT 20""",

    "q_pareto_parts" ->
      """SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
         FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM part q
                           WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
                             AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
         ORDER BY p.p_retailprice, p.p_partkey""",

    "q_mix_update" ->
      """WITH d AS (SELECT source,
                           list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                    FROM documents),
          per AS (SELECT source, CAST(len(tk) AS BIGINT) AS n_tok,
                         CAST(coalesce(list_sum(list_transform(tk, x -> len(x))), 0) AS BIGINT) AS n_len
                  FROM d),
          dom AS (SELECT source, sum(n_tok) AS n_tok, sum(n_len) AS n_len FROM per GROUP BY source),
          tot AS (SELECT sum(n_tok) AS tot_tok, sum(n_len) AS tot_len FROM dom),
          wr AS (SELECT dom.source, dom.n_tok,
                        CAST(dom.n_tok AS DOUBLE) / tot.tot_tok AS w_ref,
                        CASE WHEN dom.n_tok > 0
                             THEN greatest(0.0, (CAST(dom.n_len AS DOUBLE) * CAST(tot.tot_tok AS DOUBLE))
                                      / (CAST(dom.n_tok AS DOUBLE) * CAST(tot.tot_len AS DOUBLE)) - 1)
                             ELSE 0.0 END AS excess
                 FROM dom, tot),
          raw AS (SELECT source, n_tok, w_ref, excess,
                         CAST(w_ref * (1.0 + 1.0 * excess) AS DECIMAL(27,18)) AS w_raw
                  FROM wr),
          z AS (SELECT sum(w_raw) AS z FROM raw)
         SELECT raw.source, CAST(raw.n_tok AS BIGINT) AS n_tok,
                round(raw.w_ref, 6) AS w_ref,
                round(raw.excess, 6) AS excess,
                round(CAST(raw.w_raw AS DOUBLE) / CAST(z.z AS DOUBLE), 6) AS w_new
         FROM raw, z ORDER BY raw.source""",

    "q_ece_calibration" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          b AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS bkt FROM toks),
          wt AS (SELECT doc_id,
                        CAST((('0x' || substr(md5('qcw:' || CAST(bkt AS VARCHAR)), 1, 15))::BIGINT
                              / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
                 FROM b),
          lg AS (SELECT doc_id, round(CAST(sum(w) AS DOUBLE) / count(*), 6) AS logit
                 FROM wt GROUP BY doc_id),
          cf AS (SELECT lg.doc_id,
                        greatest(0.0, least(1.0, 0.5 + lg.logit)) AS conf,
                        (d.lang = 'en') AS is_en
                 FROM lg JOIN documents d ON lg.doc_id = d.doc_id),
          bins AS (SELECT CAST(least(floor(conf * 10), 9) AS INT) AS bin,
                          count(*) AS n_b,
                          sum(CAST(conf AS DECIMAL(27,18))) AS sum_conf,
                          sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS n_pos
                   FROM cf GROUP BY 1),
          g AS (SELECT bin, n_b,
                       abs(CAST(n_pos AS DOUBLE) / n_b - CAST(sum_conf AS DOUBLE) / n_b) AS gap
                FROM bins)
         SELECT round(CAST(sum(CAST(gap * n_b AS DECIMAL(27,18))) AS DOUBLE) / sum(n_b), 6) AS ece,
                round(max(gap), 6) AS mce,
                count(*) AS n_bins_used,
                CAST(sum(n_b) AS BIGINT) AS n
         FROM g""",

    "q_decile_lift" ->
      s"""WITH $classifierLogitCtes,
          lab AS (SELECT lg.doc_id, lg.logit, (d.lang = 'en') AS pos
                  FROM lg JOIN documents d ON lg.doc_id = d.doc_id),
          dec AS (SELECT CAST(ntile(10) OVER (ORDER BY logit DESC, doc_id) AS INT) AS decile, pos FROM lab),
          agg AS (SELECT decile, count(*) AS n, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos
                  FROM dec GROUP BY decile),
          tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(n_pos) AS DOUBLE) AS np FROM agg)
         SELECT decile, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
                round(CAST(n_pos AS DOUBLE) / n, 6) AS rate,
                round((CAST(n_pos AS DOUBLE) / n) / (tot.np / tot.nn), 6) AS lift,
                round(CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE) / tot.np, 6) AS cum_gain
         FROM agg, tot ORDER BY decile""",

    "q_keep_rate_ab" ->
      s"""WITH $classifierLogitCtes,
          thr AS (SELECT CAST(sum(CAST(logit AS DECIMAL(27,18))) AS DOUBLE) / count(*) AS t FROM lg),
          keeps AS (SELECT d.source, (lg.logit >= thr.t) AS keep
                    FROM lg JOIN documents d ON lg.doc_id = d.doc_id, thr
                    WHERE d.source IN ('src1', 'src2')),
          g AS (SELECT
                  sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS n1,
                  sum(CASE WHEN source = 'src1' AND keep THEN 1 ELSE 0 END) AS k1,
                  sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS n2,
                  sum(CASE WHEN source = 'src2' AND keep THEN 1 ELSE 0 END) AS k2
                FROM keeps)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
                CAST(n2 AS BIGINT) AS n2, CAST(k2 AS BIGINT) AS k2,
                round(CAST(k1 AS DOUBLE) / n1, 6) AS p1,
                round(CAST(k2 AS DOUBLE) / n2, 6) AS p2,
                round((CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2)
                      / sqrt((CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                             * (1 - CAST(k1 + k2 AS DOUBLE) / (n1 + n2))
                             * (1.0 / n1 + 1.0 / n2)), 6) + 0 AS z
         FROM g""",

    "q_mann_whitney" ->
      """WITH s AS (SELECT lang, n_chars FROM documents
                    WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
          vals AS (SELECT n_chars AS v, count(*) AS cnt,
                          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt_a
                   FROM s GROUP BY n_chars),
          ranked AS (SELECT v, cnt, cnt_a,
                            coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
                     FROM vals),
          g AS (SELECT sum(cnt_a) AS n1,
                       sum(cnt - cnt_a) AS n2,
                       sum(cnt_a * (2 * cum_before + cnt + 1)) AS r1x2,
                       sum(cnt * cnt * cnt - cnt) AS ties
                FROM ranked)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                round((CAST(r1x2 AS DOUBLE) - 2.0 * n1 * (n1 + 1) / 2) / 2, 6) AS u1,
                round(CAST(n1 AS DOUBLE) * n2 - (CAST(r1x2 AS DOUBLE) - 2.0 * n1 * (n1 + 1) / 2) / 2, 6) AS u2,
                CASE WHEN (CAST(n1 AS DOUBLE) * n2 / 12)
                          * ((n1 + n2 + 1) - CAST(ties AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) > 0
                     THEN round(((CAST(r1x2 AS DOUBLE) - 2.0 * n1 * (n1 + 1) / 2) / 2 - CAST(n1 AS DOUBLE) * n2 / 2)
                                / sqrt((CAST(n1 AS DOUBLE) * n2 / 12)
                                       * ((n1 + n2 + 1) - CAST(ties AS DOUBLE)
                                          / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6) + 0
                     ELSE NULL END AS z
         FROM g""",

    "q_auc_classifier" ->
      s"""WITH $classifierLogitCtes,
          sc AS (SELECT CASE WHEN d.lang = 'en' THEN 'pos' ELSE 'neg' END AS g,
                        CAST(round(lg.logit * 1e6) AS BIGINT) AS v
                 FROM lg JOIN documents d ON lg.doc_id = d.doc_id),
          vals AS (SELECT v, count(*) AS cnt,
                          sum(CASE WHEN g = 'pos' THEN 1 ELSE 0 END) AS cnt_a
                   FROM sc GROUP BY v),
          ranked AS (SELECT v, cnt, cnt_a,
                            coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
                     FROM vals),
          gg AS (SELECT sum(cnt_a) AS n1, sum(cnt - cnt_a) AS n2,
                        sum(cnt_a * (2 * cum_before + cnt + 1)) AS r1x2
                 FROM ranked),
          u AS (SELECT n1, n2,
                       round((CAST(r1x2 AS DOUBLE) - 2.0 * n1 * (n1 + 1) / 2) / 2, 6) AS u1
                FROM gg)
         SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n2 AS BIGINT) AS n_neg,
                round(u1 / (CAST(n1 AS DOUBLE) * n2), 6) AS auc,
                round(2.0 * (u1 / (CAST(n1 AS DOUBLE) * n2)) - 1, 6) AS gini
         FROM u""",

    "q_kcore" -> kcoreOracleSql(k = 80, rounds = 12),
    "q_graph_card" -> graphCardOracleSql(k = 80, rounds = 12),

    "q_graph_profile" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
                FROM items a JOIN items b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          deg AS (SELECT v, count(*) AS d
                  FROM (SELECT pa AS v FROM e UNION ALL SELECT pb FROM e) GROUP BY v),
          na AS (SELECT count(*) AS n_nodes, max(d) AS max_degree FROM deg),
          ne AS (SELECT count(*) AS n_edges FROM e),
          dd AS (SELECT CAST(da.d AS HUGEINT) AS x, CAST(db.d AS HUGEINT) AS y
                 FROM e JOIN deg da ON e.pa = da.v JOIN deg db ON e.pb = db.v
                 UNION ALL
                 SELECT CAST(db.d AS HUGEINT), CAST(da.d AS HUGEINT)
                 FROM e JOIN deg da ON e.pa = da.v JOIN deg db ON e.pb = db.v),
          mom AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
                  FROM dd)
         SELECT CAST(na.n_nodes AS BIGINT) AS n_nodes,
                CAST(ne.n_edges AS BIGINT) AS n_edges,
                round(2.0 * ne.n_edges / CAST(na.n_nodes AS DOUBLE), 6) AS avg_degree,
                CAST(na.max_degree AS BIGINT) AS max_degree,
                CASE WHEN na.n_nodes > 1
                     THEN round(2.0 * ne.n_edges / (CAST(na.n_nodes AS DOUBLE) * (na.n_nodes - 1)), 6)
                     ELSE NULL END AS density,
                CASE WHEN (CAST(mom.m AS DOUBLE) * CAST(mom.sxx AS DOUBLE) - CAST(mom.sx AS DOUBLE) * CAST(mom.sx AS DOUBLE)) > 0
                          AND (CAST(mom.m AS DOUBLE) * CAST(mom.syy AS DOUBLE) - CAST(mom.sy AS DOUBLE) * CAST(mom.sy AS DOUBLE)) > 0
                     THEN round((CAST(mom.m AS DOUBLE) * CAST(mom.sxy AS DOUBLE) - CAST(mom.sx AS DOUBLE) * CAST(mom.sy AS DOUBLE))
                                / sqrt((CAST(mom.m AS DOUBLE) * CAST(mom.sxx AS DOUBLE) - CAST(mom.sx AS DOUBLE) * CAST(mom.sx AS DOUBLE))
                                       * (CAST(mom.m AS DOUBLE) * CAST(mom.syy AS DOUBLE) - CAST(mom.sy AS DOUBLE) * CAST(mom.sy AS DOUBLE))), 6) + 0
                     ELSE NULL END AS assortativity
         FROM na, ne, mom""",

    // replays GraphOps.hits: L1-normalized mutual reinforcement, per-
    // node sums via exact DECIMAL(27,18) folds (the pagerank-oracle
    // float-determinism pattern), 2 unrolled rounds
    "q_hits" ->
      """WITH e AS (SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
                    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
          h0 AS (SELECT DISTINCT src, 1.0 AS score FROM e),
          a1raw AS (SELECT e.dst, CAST(sum(CAST(h.score AS DECIMAL(27,18))) AS DOUBLE) AS raw
                    FROM e JOIN h0 h ON e.src = h.src GROUP BY e.dst),
          a1n AS (SELECT CAST(sum(CAST(raw AS DECIMAL(27,18))) AS DOUBLE) AS nrm FROM a1raw),
          a1 AS (SELECT dst, raw / nrm AS score FROM a1raw, a1n),
          h1raw AS (SELECT e.src, CAST(sum(CAST(a.score AS DECIMAL(27,18))) AS DOUBLE) AS raw
                    FROM e JOIN a1 a ON e.dst = a.dst GROUP BY e.src),
          h1n AS (SELECT CAST(sum(CAST(raw AS DECIMAL(27,18))) AS DOUBLE) AS nrm FROM h1raw),
          h1 AS (SELECT src, raw / nrm AS score FROM h1raw, h1n),
          a2raw AS (SELECT e.dst, CAST(sum(CAST(h.score AS DECIMAL(27,18))) AS DOUBLE) AS raw
                    FROM e JOIN h1 h ON e.src = h.src GROUP BY e.dst),
          a2n AS (SELECT CAST(sum(CAST(raw AS DECIMAL(27,18))) AS DOUBLE) AS nrm FROM a2raw),
          a2 AS (SELECT dst, raw / nrm AS score FROM a2raw, a2n),
          h2raw AS (SELECT e.src, CAST(sum(CAST(a.score AS DECIMAL(27,18))) AS DOUBLE) AS raw
                    FROM e JOIN a2 a ON e.dst = a.dst GROUP BY e.src),
          h2n AS (SELECT CAST(sum(CAST(raw AS DECIMAL(27,18))) AS DOUBLE) AS nrm FROM h2raw),
          h2 AS (SELECT src, raw / nrm AS score FROM h2raw, h2n)
         SELECT 'hub' AS role, src AS id, round(score, 6) AS score FROM h2
         UNION ALL
         SELECT 'authority', dst, round(score, 6) FROM a2
         ORDER BY role, id""",

    // classic correlated Q21 form — the oracle keeps the textbook
    // EXISTS/NOT-EXISTS pair; the engine's decorrelated per-order
    // aggregation must agree row-for-row
    "q_waiting_suppliers" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM supplier s, lineitem l1, orders o
         WHERE s.s_suppkey = l1.l_suppkey
           AND o.o_orderkey = l1.l_orderkey
           AND o.o_orderstatus = 'F'
           AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
         GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 20""",

    // replays kendallTauB's dominance-prefix identity (the grid cross
    // join is oracle-side only; the engine uses a Generate)
    "q_kendall_tau" ->
      """WITH s AS (SELECT least(CAST(floor(n_chars / 100) AS BIGINT), 19) AS x,
                           least(CAST(floor(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) / 40.0) AS BIGINT), 19) AS y
                    FROM documents WHERE n_chars IS NOT NULL),
          cells AS (SELECT x, y, count(*) AS c FROM s GROUP BY x, y),
          xs AS (SELECT x, sum(c) AS rt FROM cells GROUP BY x),
          yd AS (SELECT DISTINCT y FROM cells),
          grid AS (SELECT xs.x, xs.rt, yd.y FROM xs CROSS JOIN yd),
          g2 AS (SELECT g.x, g.y, g.rt, cells.c, coalesce(cells.c, 0) AS c0
                 FROM grid g LEFT JOIN cells ON g.x = cells.x AND g.y = cells.y),
          wa AS (SELECT *,
                        coalesce(sum(c0) OVER (PARTITION BY y ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a,
                        coalesce(sum(rt) OVER (PARTITION BY y ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS t
                 FROM g2),
          wp AS (SELECT *,
                        coalesce(sum(a) OVER (PARTITION BY x ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
                 FROM wa),
          cd AS (SELECT sum(c) AS n, count(*) AS n_cells,
                        sum(CAST(c AS HUGEINT) * p) AS cc,
                        sum(CAST(c AS HUGEINT) * (t - p - a)) AS dd
                 FROM wp WHERE c IS NOT NULL),
          t1 AS (SELECT coalesce(sum(t * (t - 1) / 2), 0) AS n1
                 FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
          t2 AS (SELECT coalesce(sum(t * (t - 1) / 2), 0) AS n2
                 FROM (SELECT sum(c) AS t FROM cells GROUP BY y))
         SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
                CAST(cc AS BIGINT) AS concordant, CAST(dd AS BIGINT) AS discordant,
                CASE WHEN (CAST(n AS DOUBLE) * (n - 1) / 2 - n1) * (CAST(n AS DOUBLE) * (n - 1) / 2 - n2) > 0
                     THEN round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
                                / sqrt((CAST(n AS DOUBLE) * (n - 1) / 2 - n1) * (CAST(n AS DOUBLE) * (n - 1) / 2 - n2)), 6) + 0
                     ELSE NULL END AS tau_b
         FROM cd, t1, t2""",

    "q_effect_sizes" ->
      """WITH s AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v FROM documents
                    WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
          vals AS (SELECT v, count(*) AS cnt,
                          sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END) AS cnt_a
                   FROM s GROUP BY v),
          ranked AS (SELECT v, cnt, cnt_a,
                            coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                     FROM vals),
          g AS (SELECT sum(cnt_a) AS n1, sum(cnt - cnt_a) AS n2,
                       sum(cnt_a * (2 * cb + cnt + 1)) AS r1x2,
                       sum(CAST(v AS HUGEINT) * cnt_a) AS sxa,
                       sum(CAST(v AS HUGEINT) * v * cnt_a) AS sxxa,
                       sum(CAST(v AS HUGEINT) * (cnt - cnt_a)) AS sxb,
                       sum(CAST(v AS HUGEINT) * v * (cnt - cnt_a)) AS sxxb
                FROM ranked),
          d AS (SELECT CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
                       (CAST(r1x2 AS DOUBLE) - 2.0 * n1 * (n1 + 1) / 2) / 2 AS u1,
                       CAST(sxa AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                       CAST(sxb AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                       (CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1) AS s1,
                       (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1) AS s2,
                       n1, n2
                FROM g)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CASE WHEN n1d * n2d > 0
                     THEN round(2.0 * u1 / (n1d * n2d) - 1, 6) + 0
                     ELSE NULL END AS cliffs_delta,
                CASE WHEN n1 + n2 > 2
                          AND ((n1d - 1) * s1 + (n2d - 1) * s2) / (n1d + n2d - 2) > 0
                     THEN round((m1 - m2) / sqrt(((n1d - 1) * s1 + (n2d - 1) * s2) / (n1d + n2d - 2)), 6) + 0
                     ELSE NULL END AS cohens_d
         FROM d""",

    "q_cuped" ->
      """WITH s AS (SELECT source,
                           CAST(n_chars AS BIGINT) AS x,
                           CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS y
                    FROM documents
                    WHERE n_chars IS NOT NULL AND source IS NOT NULL),
          gl AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                          sum(CAST(x AS HUGEINT) * y) AS sxy,
                          sum(CAST(x AS HUGEINT) * x) AS sxx
                   FROM s),
          th AS (SELECT CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                             THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             ELSE NULL END AS theta,
                        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
                 FROM gl),
          pg AS (SELECT source, count(*) AS n, sum(x) AS gsx, sum(y) AS gsy FROM s GROUP BY source)
         SELECT pg.source, CAST(pg.n AS BIGINT) AS n,
                round(CAST(gsy AS DOUBLE) / pg.n, 6) AS mean_y,
                round(CAST(gsy AS DOUBLE) / pg.n - th.theta * (CAST(gsx AS DOUBLE) / pg.n - th.xbar), 6) + 0 AS mean_y_adj,
                round(th.theta, 6) + 0 AS theta
         FROM pg, th ORDER BY source""",

    "q_bootstrap_diff" ->
      s"""WITH $classifierLogitCtes,
          thr AS (SELECT CAST(sum(CAST(logit AS DECIMAL(27,18))) AS DOUBLE) / count(*) AS t FROM lg),
          keeps AS (SELECT d.source AS g, CAST(lg.doc_id AS VARCHAR) AS id,
                           CASE WHEN lg.logit >= thr.t THEN 1 ELSE 0 END AS k
                    FROM lg JOIN documents d ON lg.doc_id = d.doc_id, thr
                    WHERE d.source IN ('src1', 'src2')),
          grid AS (SELECT CAST(r.b AS INT) AS b, g, id, k FROM keeps, unnest(range(0, 32)) r(b)),
          uu AS (SELECT b, g, k,
                        ('0x' || substr(md5('pbs:' || CAST(b AS VARCHAR) || ':' || id), 1, 15))::BIGINT
                          / 1152921504606846976.0 AS u
                 FROM grid),
          ww AS (SELECT b, g, k,
                        CASE WHEN u < 0.367879441171 THEN 0
                             WHEN u < 0.735758882343 THEN 1
                             WHEN u < 0.919698602929 THEN 2
                             WHEN u < 0.981011843124 THEN 3
                             WHEN u < 0.996340153173 THEN 4
                             WHEN u < 0.999405815182 THEN 5
                             WHEN u < 0.999916758851 THEN 6
                             WHEN u < 0.999989750803 THEN 7
                             WHEN u < 0.999998874797 THEN 8
                             ELSE 9 END AS w
                 FROM uu),
          pr AS (SELECT b,
                        sum(CASE WHEN g = 'src1' THEN w ELSE 0 END) AS na,
                        sum(CASE WHEN g = 'src1' THEN w * k ELSE 0 END) AS ka,
                        sum(CASE WHEN g = 'src2' THEN w ELSE 0 END) AS nb,
                        sum(CASE WHEN g = 'src2' THEN w * k ELSE 0 END) AS kb
                 FROM ww GROUP BY b
                 HAVING sum(CASE WHEN g = 'src1' THEN w ELSE 0 END) > 0
                    AND sum(CASE WHEN g = 'src2' THEN w ELSE 0 END) > 0),
          dm AS (SELECT round(CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb, 6) + 0 AS d FROM pr),
          pt AS (SELECT round(
                   CAST(sum(CASE WHEN g = 'src1' THEN k ELSE 0 END) AS DOUBLE)
                     / sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END)
                   - CAST(sum(CASE WHEN g = 'src2' THEN k ELSE 0 END) AS DOUBLE)
                     / sum(CASE WHEN g = 'src2' THEN 1 ELSE 0 END), 6) + 0 AS point_diff
                 FROM keeps),
          agg AS (SELECT CAST(count(*) AS INT) AS n_resamples,
                         quantile_disc(d, 0.025) AS ci_lo,
                         quantile_disc(d, 0.975) AS ci_hi
                  FROM dm)
         SELECT n_resamples, point_diff, ci_lo, ci_hi FROM agg, pt""",

    // replays Stats.poissonBootstrap: identical md5-hash weights,
    // exact integer resample sums, quantile_disc rank rule on the
    // 32 rounded means (rank 1 and 32 at 0.025/0.975)
    "q_poisson_bootstrap" ->
      """WITH g AS (SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS BIGINT) AS v
                    FROM documents WHERE n_chars IS NOT NULL),
          grid AS (SELECT CAST(r.b AS INT) AS b, g.id, g.v FROM g, unnest(range(0, 32)) r(b)),
          uu AS (SELECT b, v,
                        ('0x' || substr(md5('pbs:' || CAST(b AS VARCHAR) || ':' || id), 1, 15))::BIGINT
                          / 1152921504606846976.0 AS u
                 FROM grid),
          ww AS (SELECT b, v,
                        CASE WHEN u < 0.367879441171 THEN 0
                             WHEN u < 0.735758882343 THEN 1
                             WHEN u < 0.919698602929 THEN 2
                             WHEN u < 0.981011843124 THEN 3
                             WHEN u < 0.996340153173 THEN 4
                             WHEN u < 0.999405815182 THEN 5
                             WHEN u < 0.999916758851 THEN 6
                             WHEN u < 0.999989750803 THEN 7
                             WHEN u < 0.999998874797 THEN 8
                             ELSE 9 END AS w
                 FROM uu),
          means AS (SELECT b, round(CAST(sum(w * v) AS DOUBLE) / sum(w), 6) AS m
                    FROM ww GROUP BY b HAVING sum(w) > 0),
          pt AS (SELECT round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS point_mean FROM g),
          agg AS (SELECT CAST(count(*) AS INT) AS n_resamples,
                         quantile_disc(m, 0.025) AS ci_lo,
                         quantile_disc(m, 0.975) AS ci_hi
                  FROM means)
         SELECT n_resamples, point_mean, ci_lo, ci_hi FROM agg, pt""",

    // replays poissonBootstrapQuantile: identical md5-hash weights,
    // per-resample weighted histogram + the ceil(p*n) quantile_disc
    // rank rule (min v with cum >= rank), CI by quantile_disc over
    // the per-resample quantiles, point from the unweighted histogram
    "q_bootstrap_quantile" ->
      """WITH g AS (SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS BIGINT) AS v
                    FROM documents WHERE n_chars IS NOT NULL),
          grid AS (SELECT CAST(r.b AS INT) AS b, g.id, g.v FROM g, unnest(range(0, 32)) r(b)),
          uu AS (SELECT b, v,
                        ('0x' || substr(md5('pbs:' || CAST(b AS VARCHAR) || ':' || id), 1, 15))::BIGINT
                          / 1152921504606846976.0 AS u
                 FROM grid),
          ww AS (SELECT b, v,
                        CASE WHEN u < 0.367879441171 THEN 0
                             WHEN u < 0.735758882343 THEN 1
                             WHEN u < 0.919698602929 THEN 2
                             WHEN u < 0.981011843124 THEN 3
                             WHEN u < 0.996340153173 THEN 4
                             WHEN u < 0.999405815182 THEN 5
                             WHEN u < 0.999916758851 THEN 6
                             WHEN u < 0.999989750803 THEN 7
                             WHEN u < 0.999998874797 THEN 8
                             ELSE 9 END AS w
                 FROM uu),
          hist AS (SELECT b, v, sum(w) AS c FROM ww GROUP BY b, v),
          cum AS (SELECT b, v,
                         sum(c) OVER (PARTITION BY b ORDER BY v) AS cum,
                         sum(c) OVER (PARTITION BY b) AS n
                  FROM hist),
          probs AS (SELECT CAST(0.5 AS DOUBLE) AS prob UNION ALL SELECT CAST(0.9 AS DOUBLE)),
          q AS (SELECT cum.b, probs.prob, CAST(min(v) AS BIGINT) AS q
                FROM cum, probs
                WHERE cum.n > 0 AND cum.cum >= ceil(CAST(cum.n AS DOUBLE) * probs.prob)
                GROUP BY cum.b, probs.prob),
          agg AS (SELECT prob, CAST(count(*) AS INT) AS n_resamples,
                         quantile_disc(q, 0.025) AS ci_lo,
                         quantile_disc(q, 0.975) AS ci_hi
                  FROM q GROUP BY prob),
          ph AS (SELECT v, count(*) AS c FROM g GROUP BY v),
          pc AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                        (SELECT count(*) FROM g) AS n
                 FROM ph),
          pt AS (SELECT probs.prob, CAST(min(v) AS BIGINT) AS point_q
                 FROM pc, probs
                 WHERE pc.cum >= ceil(CAST(pc.n AS DOUBLE) * probs.prob)
                 GROUP BY probs.prob)
         SELECT agg.prob AS prob, agg.n_resamples, pt.point_q, agg.ci_lo, agg.ci_hi
         FROM agg JOIN pt ON agg.prob = pt.prob
         ORDER BY agg.prob""",

    "q_quantile_cont" ->
      """SELECT lang, CAST(0.25 AS DOUBLE) AS prob, round(quantile_cont(n_chars, 0.25), 6) AS q_value FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.5 AS DOUBLE), round(quantile_cont(n_chars, 0.5), 6) FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.75 AS DOUBLE), round(quantile_cont(n_chars, 0.75), 6) FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.9 AS DOUBLE), round(quantile_cont(n_chars, 0.9), 6) FROM documents GROUP BY lang
         UNION ALL
         SELECT lang, CAST(0.99 AS DOUBLE), round(quantile_cont(n_chars, 0.99), 6) FROM documents GROUP BY lang
         ORDER BY lang, prob""",

    "q_matryoshka_recall" -> {
      val dims = Seq(8, 16, 32, 64)
      val perDim = dims.map { d =>
        s"""t$d AS (SELECT vec_id FROM (
                      SELECT vec_id, round(${cosSqlDim("e.embedding", "q.qe", d)}, 6) AS cos
                      FROM embeddings e, q)
                    ORDER BY cos DESC, vec_id ASC LIMIT 20),
            r$d AS (SELECT $d AS d_prefix, CAST(count(*) AS INT) AS n_overlap
                    FROM bf JOIN t$d USING (vec_id))"""
      }.mkString(",\n            ")
      val unions = dims
        .map(d => s"SELECT d_prefix, n_overlap, round(CAST(n_overlap AS DOUBLE) / 20, 6) AS recall FROM r$d")
        .mkString("\n            UNION ALL ")
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          bf AS (SELECT vec_id FROM (
                   SELECT vec_id, round(${cosSql("e.embedding", "q.qe")}, 6) AS cos
                   FROM embeddings e, q)
                 ORDER BY cos DESC, vec_id ASC LIMIT 20),
            $perDim
            $unions
            ORDER BY d_prefix"""
    },

    "q_kruskal_wallis" ->
      """WITH s AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents
                    WHERE source IS NOT NULL AND n_chars IS NOT NULL),
          cells AS (SELECT g, v, count(*) AS c FROM s GROUP BY g, v),
          vals AS (SELECT v, sum(c) AS cnt FROM cells GROUP BY v),
          ranked AS (SELECT v, cnt,
                            coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                     FROM vals),
          pg AS (SELECT c.g, sum(c.c) AS ng, sum(c.c * (2 * r.cb + r.cnt + 1)) AS r2
                 FROM cells c JOIN ranked r ON c.v = r.v GROUP BY c.g),
          ga AS (SELECT count(*) AS k, sum(ng) AS n,
                        sum(CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / (4.0 * ng), 6) AS DECIMAL(38,6))) AS srr
                 FROM pg),
          ties AS (SELECT coalesce(sum(cnt * cnt * cnt - cnt), 0) AS t FROM vals)
         SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                round(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * CAST(srr AS DOUBLE) - 3.0 * (n + 1), 6) + 0 AS h,
                CASE WHEN 1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n) > 0
                     THEN round((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * CAST(srr AS DOUBLE) - 3.0 * (n + 1))
                                / (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)), 6) + 0
                     ELSE NULL END AS h_corr
         FROM ga, ties""",

    "q_levene" ->
      """WITH s AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS x FROM documents
                    WHERE source IS NOT NULL AND n_chars IS NOT NULL),
          meds AS (SELECT g, CAST(quantile_disc(x, 0.5) AS BIGINT) AS med FROM s GROUP BY g),
          dev AS (SELECT s.g, abs(s.x - m.med) AS z FROM s JOIN meds m ON s.g = m.g),
          pg AS (SELECT g, count(*) AS ng, sum(z) AS sz, sum(z * z) AS szz FROM dev GROUP BY g),
          ga AS (SELECT count(*) AS k, sum(ng) AS n, sum(sz) AS szt, sum(szz) AS szzt,
                        sum(CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / CAST(ng AS DOUBLE), 6) AS DECIMAL(38,6))) AS srat
                 FROM pg)
         SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                CASE WHEN k >= 2 AND n > k AND (CAST(szzt AS DOUBLE) - CAST(srat AS DOUBLE)) > 0
                     THEN round((CAST(n AS DOUBLE) - k) / (CAST(k AS DOUBLE) - 1)
                                * (CAST(srat AS DOUBLE) - CAST(szt AS DOUBLE) * CAST(szt AS DOUBLE) / CAST(n AS DOUBLE))
                                / (CAST(szzt AS DOUBLE) - CAST(srat AS DOUBLE)), 6) + 0
                     ELSE NULL END AS f
         FROM ga""",

    "q_mcnemar" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          b AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT % 64 AS bkt FROM toks),
          wt AS (SELECT doc_id,
                        CAST((('0x' || substr(md5('qcw:' || CAST(bkt AS VARCHAR)), 1, 15))::BIGINT
                              / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
                 FROM b),
          clf AS (SELECT doc_id, (round(CAST(sum(w) AS DOUBLE) / count(*), 6) >= 0.0) AS a
                  FROM wt GROUP BY doc_id),
          t2 AS (SELECT doc_id, lower(text) AS lt,
                        list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
                 FROM documents),
          f AS (SELECT doc_id, lt, CAST(len(tk) AS INT) AS n_tok,
                       CASE WHEN len(tk) > 0
                            THEN round(CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS DOUBLE) / len(tk), 6)
                            ELSE 0.0 END AS mean_tok_len
                FROM t2),
          rules AS (SELECT doc_id,
                           ((n_tok >= 20 AND n_tok <= 100000) AND (mean_tok_len >= 2.0 AND mean_tok_len <= 10.0)
                            AND strpos(lt, 'lorem ipsum') = 0 AND strpos(lt, '{') = 0) AS b
                    FROM f),
          j AS (SELECT c.a, r.b FROM clf c JOIN rules r ON c.doc_id = r.doc_id),
          g AS (SELECT sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n_tt,
                       sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n_tf,
                       sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n_ft,
                       sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n_ff
                FROM j)
         SELECT CAST(n_tt AS BIGINT) AS n_tt, CAST(n_tf AS BIGINT) AS n_tf,
                CAST(n_ft AS BIGINT) AS n_ft, CAST(n_ff AS BIGINT) AS n_ff,
                CASE WHEN n_tf + n_ft > 0
                     THEN round((CAST(n_tf AS DOUBLE) - n_ft) * (CAST(n_tf AS DOUBLE) - n_ft)
                                / (CAST(n_tf AS DOUBLE) + n_ft), 6)
                     ELSE NULL END AS chi2,
                CASE WHEN n_tf + n_ft > 0
                     THEN round((abs(CAST(n_tf AS DOUBLE) - n_ft) - 1) * (abs(CAST(n_tf AS DOUBLE) - n_ft) - 1)
                                / (CAST(n_tf AS DOUBLE) + n_ft), 6)
                     ELSE NULL END AS chi2_cc
         FROM g""",

    "q_wilcoxon_signed" ->
      """WITH toks AS (SELECT doc_id, t AS token
                       FROM documents, unnest(string_split(text, ' ')) AS u(t) WHERE len(t) > 0),
          h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h60 FROM toks),
          wa AS (SELECT doc_id,
                        CAST((('0x' || substr(md5('qcw:' || CAST(h60 % 64 AS VARCHAR)), 1, 15))::BIGINT
                              / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
                 FROM h),
          wb AS (SELECT doc_id,
                        CAST((('0x' || substr(md5('qcw:' || CAST(h60 % 128 AS VARCHAR)), 1, 15))::BIGINT
                              / 1152921504606846976.0) * 2 - 1 AS DECIMAL(27,18)) AS w
                 FROM h),
          la AS (SELECT doc_id, CAST(round(round(CAST(sum(w) AS DOUBLE) / count(*), 6) * 1e6) AS BIGINT) AS m
                 FROM wa GROUP BY doc_id),
          lb AS (SELECT doc_id, CAST(round(round(CAST(sum(w) AS DOUBLE) / count(*), 6) * 1e6) AS BIGINT) AS m
                 FROM wb GROUP BY doc_id),
          d AS (SELECT a.m - b.m AS d FROM la a JOIN lb b ON a.doc_id = b.doc_id),
          zeros AS (SELECT coalesce(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END), 0) AS n_zero FROM d),
          hist AS (SELECT abs(d) AS v, count(*) AS cnt,
                          sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos
                   FROM d WHERE d <> 0 GROUP BY abs(d)),
          ranked AS (SELECT v, cnt, pos,
                            coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
                     FROM hist),
          g AS (SELECT coalesce(sum(cnt), 0) AS n_pairs,
                       coalesce(sum(pos * (2 * cb + cnt + 1)), 0) AS w2p,
                       coalesce(sum(cnt * cnt * cnt - cnt), 0) AS t
                FROM ranked)
         SELECT CAST(n_pairs AS BIGINT) AS n_pairs, CAST(n_zero AS BIGINT) AS n_zero,
                round(CAST(w2p AS DOUBLE) / 2, 6) AS w_plus,
                round(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 2 - CAST(w2p AS DOUBLE) / 2, 6) AS w_minus,
                CASE WHEN n_pairs > 0
                          AND (CAST(n_pairs AS DOUBLE) * (n_pairs + 1) * (n_pairs * 2 + 1) / 24
                               - CAST(t AS DOUBLE) / 48) > 0
                     THEN round((CAST(w2p AS DOUBLE) / 2 - CAST(n_pairs AS DOUBLE) * (n_pairs + 1) / 4)
                                / sqrt(CAST(n_pairs AS DOUBLE) * (n_pairs + 1) * (n_pairs * 2 + 1) / 24
                                       - CAST(t AS DOUBLE) / 48), 6) + 0
                     ELSE NULL END AS z
         FROM g, zeros"""
  )
}
