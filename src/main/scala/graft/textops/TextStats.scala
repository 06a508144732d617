package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting. All
  * pure column expressions — per-row, codegen'd, shuffle-free.
  */
object TextStats {

  private def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Marker-word language-ID from a PRE-PROJECTED lowercase tokens
    * column (a Column subtree referenced in several lambdas is
    * re-evaluated per reference — bind tokens once in hot paths).
    */
  def langIdFromTokens(t: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scored = markers.map { case (lang, ms) =>
      val score = ms.map(m => size(filter(t, x => x === m))).reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    // argmax: sort (score asc, lang desc) and take last → max score,
    // lexicographically smallest lang on ties
    val arr = array_sort(
      array(scored: _*),
      (a, b) =>
        when(a.getField("score") < b.getField("score"), -1)
          .when(a.getField("score") > b.getField("score"), 1)
          .when(a.getField("lang") > b.getField("lang"), -1)
          .when(a.getField("lang") < b.getField("lang"), 1)
          .otherwise(0))
    element_at(arr, -1).getField("lang")
  }

  /** Convenience wrapper (re-tokenizes inline; fine for small data). */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    langIdFromTokens(toks(lower(text)), markers)

  /** Quality features from a PRE-PROJECTED tokens column. */
  def qualityFeaturesFromTokens(text: Column, t: Column, stopwords: Seq[String]): Column = {
    val nTok   = size(t)
    val nChar  = length(text)
    val nStop  = stopwords.map(s => size(filter(t, x => x === s))).reduce(_ + _)
    val nPunct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    struct(
      nChar.as("n_chars"),
      nTok.as("n_tokens"),
      when(nTok > 0, (nChar - nTok + 1).cast("double") / nTok).otherwise(0.0).as("avg_token_len"),
      when(nTok > 0, nStop.cast("double") / nTok).otherwise(0.0).as("stopword_ratio"),
      when(nChar > 0, nPunct.cast("double") / nChar).otherwise(0.0).as("punct_ratio"))
  }

  /** Convenience wrapper (re-tokenizes inline). */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Column =
    qualityFeaturesFromTokens(text, toks(text), stopwords)

  /** Composite quality score in [0,1] from a PRE-PROJECTED features
    * struct column (each getField on an inline struct expression
    * duplicates the whole subtree).
    */
  def qualityScoreFromFeatures(f: Column): Column = {
    val lenScore = least(f.getField("n_tokens").cast("double") / 64.0, lit(1.0))
    val stopOk   = least(f.getField("stopword_ratio") * 4.0, lit(1.0))
    val punctOk  = greatest(lit(1.0) - f.getField("punct_ratio") * 10.0, lit(0.0))
    (lenScore + stopOk + punctOk) / 3.0
  }

  /** Convenience wrapper (re-derives the feature struct inline). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    qualityScoreFromFeatures(qualityFeatures(text, stopwords))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(toks(text))

  /** BPE-ish token count: words plus standalone punctuation marks. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Rolling polynomial fingerprint over tokens, mod 1e9+7. Word
    * value mixes length and first codepoint; the fold is sequential
    * and integer-exact, hence engine-portable.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      toks(text),
      lit(0L),
      (acc, w) => pmod(acc * 131 + (length(w) * 31 + ascii(w)), lit(1000000007L)))

  /** Token repetition profile per doc (Gopher-style boilerplate
    * signal): token count, distinct-token count, distinct ratio, and
    * the share of the most frequent token. Two keyed aggregations
    * with map-side combine; the first groups on (doc, token) so hot
    * docs still spread across partitions by token.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n")).cast("int").as("n_tokens"),
        count(lit(1)).cast("int").as("n_distinct"),
        round(count(lit(1)).cast("double") / sum(col("n")), 6).as("distinct_ratio"),
        round(max(col("n")).cast("double") / sum(col("n")), 6).as("top_ratio"))

  /** Gopher within-doc repetition signals (Rae et al. 2021, Table
    * A1 — the rule family quality filters gate on): the fraction of
    * document CHARACTERS claimed by the single most frequent word
    * n-gram for n = 2..4 (count·len(gram)/len(doc), tie-break count
    * desc then gram asc), and the fraction of n-gram OCCURRENCES that
    * are repeats of an earlier occurrence for n = 5..10
    * (1 − distinct/total, stated token-weighted rather than as
    * Gopher's overlapping char sweep — the deterministic form both
    * engines replay). Distinct from [[graft.textops.Curation.dupNgramFraction]],
    * which measures CROSS-corpus sharing; these are within-doc.
    *
    * Scale shape: every signal is WITHIN-doc, so the whole operator
    * is ONE projection — a single JVM call per row computes all nine
    * counters over one tokenize (the HOF-chain alternative ran the
    * interpreted gram builders 9× per row and benched 3.5× slower;
    * same lesson as q_trigram_ppl), and the fractions divide + round
    * as column expressions for engine parity. Zero shuffles; scales
    * with input splits. Top-gram ties break (count desc, gram asc)
    * by UTF-8 byte order — the same collation both engines sort
    * strings with.
    *
    * Output: (id, top2_frac, top3_frac, top4_frac, dup5..10_frac).
    */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = (5 to 10).toSeq
    // per-row counters: topN → chars claimed by the most frequent
    // n-gram (count·len); dupN → (repeat occurrences, total grams)
    val stats = udf((text: String) => {
      val t = if (text == null) Array.empty[String] else text.split(" ").filter(_.nonEmpty)
      def utf8Lt(a: String, b: String): Boolean =
        java.util.Arrays.compare(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      val out = new Array[Long](topNs.length + 2 * dupNs.length)
      var oi = 0
      topNs.foreach { n =>
        if (t.length >= n) {
          val m = new java.util.HashMap[String, Int]()
          var i = 0
          while (i <= t.length - n) {
            m.merge(t.slice(i, i + n).mkString(" "), 1, (a, b) => a + b); i += 1
          }
          var bestG: String = null
          var bestC = 0
          m.forEach { (g, c) =>
            if (c > bestC || (c == bestC && (bestG == null || utf8Lt(g, bestG)))) {
              bestG = g; bestC = c
            }
          }
          // code POINTS, not UTF-16 units — the denominator (Spark
          // length()) and the oracle (DuckDB length()) both count
          // code points; String.length would over-count
          // supplementary-plane chars
          out(oi) = bestC.toLong * bestG.codePointCount(0, bestG.length)
        }
        oi += 1
      }
      dupNs.foreach { n =>
        if (t.length >= n) {
          val seen  = new java.util.HashSet[String]()
          val total = t.length - n + 1
          var i     = 0
          while (i <= t.length - n) { seen.add(t.slice(i, i + n).mkString(" ")); i += 1 }
          out(oi) = (total - seen.size).toLong
          out(oi + 1) = total.toLong
        }
        oi += 2
      }
      out.toSeq
    })
    val bound = df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      stats(col(textCol)).as("st"))
    bound.select(
      col(idCol) +:
        (topNs.zipWithIndex.map { case (n, i) =>
          when(col("n_chars") === 0, 0.0)
            .otherwise(round(element_at(col("st"), i + 1).cast("double") / col("n_chars"), 6))
            .as(s"top${n}_frac")
        } ++
          dupNs.zipWithIndex.map { case (n, j) =>
            val num = element_at(col("st"), topNs.length + 2 * j + 1)
            val den = element_at(col("st"), topNs.length + 2 * j + 2)
            when(den === 0, 0.0)
              .otherwise(round(num.cast("double") / den, 6))
              .as(s"dup${n}_frac")
          }): _*)
  }

  /** Per-stratum document length statistics: count, mean, exact
    * median and p90 of character lengths. One hash aggregation;
    * exact percentiles match DuckDB's quantile_cont interpolation
    * (numpy-style linear), the same parity trick q_f1_metrics uses.
    */
  def lengthStats(df: DataFrame, strataCol: String, textCol: String): DataFrame =
    df.groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(length(col(textCol))), 6).as("avg_chars"),
        round(percentile(length(col(textCol)), lit(0.5)), 6).as("med_chars"),
        round(percentile(length(col(textCol)), lit(0.9)), 6).as("p90_chars"))

  /** Top-k TF-IDF terms per document: tf = in-doc count, idf =
    * ln(N / df) with df = docs containing the term and N = docs with
    * ≥1 token. Three keyed shuffles — (doc, term) counts, df via a
    * term-partitioned window over the (doc, term) relation (one row
    * per pair, so count(*) = document frequency), per-doc rank — and
    * one broadcast of the scalar N. Ties rank lexicographically on
    * the rounded score, so results replay across engines.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = df
      .select(col(idCol), explode(toks(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n      = tc.agg(countDistinct(col(idCol)).as("n_docs"))
    val wTerm  = Window.partitionBy(col("term"))
    val wDoc   = Window.partitionBy(col(idCol)).orderBy(desc("score"), col("term"))
    tc.withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(wDoc))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }

  /** BM25 top-k relevance of each document to a fixed term set
    * (Lucene-style idf: ln((N - df + 0.5)/(df + 0.5) + 1)). The
    * standard relevance filter for assembling topic-targeted
    * training corpora.
    *
    * Scale shape: corpus stats (N, avgdl, per-term df) reduce to ONE
    * broadcast row; scoring is then a pure per-row expression and
    * the top-k is a TakeOrdered — no wide shuffle anywhere. Terms
    * are scored in argument order (the float sum replays in SQL).
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withT = df.select(col(idCol), toks(col(textCol)).as("t"))
    val feats = withT.select(
      col(idCol) +:
        size(col("t")).cast("double").as("dl") +:
        terms.indices.map(i =>
          size(filter(col("t"), x => x === terms(i))).cast("double").as(s"tf_$i")): _*)
    val stats = feats.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl").cast("long")).cast("double") / count(lit(1))).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val score = terms.indices
      .map { i =>
        val tf  = col(s"tf_$i")
        val dfc = col(s"df_$i")
        val idf = log((col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1.0))
        idf * (tf * lit(k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
      }
      .reduce(_ + _)
    feats
      .crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
      .withColumn("rank", row_number().over(Window.orderBy(desc("score"), col(idCol))))
  }

  /** Per-doc unigram-LM cross-entropy (the CCNet-style perplexity
    * filter: docs whose token distribution diverges from the corpus
    * LM score high and get bucketed/dropped; perplexity = exp(xent)
    * is monotone in the returned xent, so thresholds translate).
    *
    * Model: p(tok) = corpusCount/totalTokens for the top-`vocabK`
    * tokens (count desc, token asc — deterministic cut); out-of-vocab
    * tokens get ln(0.5/totalTokens) (a half-count floor). Per-doc
    * xent = -avg(ln p).
    *
    * Scale shape: vocab fitting is one hash aggregation + a k-row
    * TakeOrdered; scoring is one explode + a broadcast join against
    * the (bounded-size) vocab + one doc-key aggregation. The corpus
    * never shuffles its token inventory. Cross-engine parity: each
    * token's ln(p) is quantized to DECIMAL(27,18) (deterministic in
    * both engines), the per-doc sum is decimal-exact (order-free),
    * and the final divide runs in doubles, rounded to 6dp.
    */
  def unigramXent(df: DataFrame, idCol: String, textCol: String, vocabK: Int): DataFrame = {
    val tokens = df.select(col(idCol), explode(toks(col(textCol))).as("token"))
    val counts = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total  = counts.agg(sum(col("cnt")).as("total"))
    val vocab = counts
      .orderBy(desc("cnt"), col("token"))
      .limit(vocabK)
    tokens
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .withColumn(
        "lp",
        when(col("cnt").isNotNull, log(col("cnt").cast("double") / col("total")))
          .otherwise(log(lit(0.5) / col("total")))
          .cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_tok"),
        round(-(sum(col("lp")).cast("double") / count(lit(1))), 6).as("xent"))
  }

  /** Per-doc deflate compression ratio (compressed/raw bytes) — the
    * model-free redundancy detector quality pipelines run next to
    * the Gopher repetition rules (very low ratio = templated/
    * boilerplate text, near 1 = high-entropy noise; natural prose
    * sits in a calibratable band). zlib level 6, the universal
    * default, so the number is reproducible anywhere. A pure
    * projection — one JVM call per row, zero shuffles; no SQL oracle
    * (DuckDB has no deflate), gated by hand-computed spec bounds.
    */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ratio = udf((text: String) => {
      val raw = if (text == null) Array.empty[Byte]
                else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (raw.isEmpty) 1.0
      else {
        val d = new java.util.zip.Deflater(6)
        d.setInput(raw); d.finish()
        // scratch buffer, overwritten per call — only the byte COUNT
        // matters, and a fixed window can't under-size against the
        // stored-block expansion bound (len + 5·len/65535 + 6) the
        // way a len+64 output buffer would (incompressible input
        // would stall deflate at a full buffer, looping forever)
        val buf = new Array[Byte](65536)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        d.end()
        math.rint(n.toDouble / raw.length * 1e6) / 1e6
      }
    })
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      ratio(col(textCol)).as("compress_ratio"))
  }

  /** Type-token ratio per doc — the lexical-diversity staple of
    * quality filtering (low TTR = templated/repetitive text, a
    * signal the Gopher repetition rules approximate from the other
    * direction). Whitespace tokens, in-row `array_distinct` — a pure
    * projection, zero shuffles, scales linearly with input splits.
    * Integer counts + one final rounded division: engine-exact under
    * the DuckDB hash gate.
    */
  def typeTokenRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    df.select(
      col(idCol),
      size(t).as("n_tok"),
      size(array_distinct(t)).as("n_types"),
      when(size(t) === 0, 0.0)
        .otherwise(round(size(array_distinct(t)).cast("double") / size(t), 6))
        .as("ttr"))
  }

  /** Character-level Shannon entropy per doc (bits/char) — the
    * random-bytes / gibberish detector quality pipelines run next to
    * perplexity (C4/Gopher lineage). H = log2(L) − (Σ n_c·ln n_c) /
    * (L·ln 2) over per-doc char counts n_c, length L.
    *
    * Engine-exact recipe (same as the ppl queries): every
    * transcendental is `ln` of an integer count — identical on both
    * engines for these inputs — each term casts to DECIMAL(27,18)
    * before the sum (order-independent), one rounded double at the
    * end. Scale shape: the (doc, char) aggregation's map-side partial
    * combine collapses duplicates per partition, so shuffle volume is
    * bounded by docs × |alphabet|, not corpus characters; the per-doc
    * fold is the second half of the same keyed aggregation chain.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df.select(col(idCol), explode(split(col(textCol), "")).as("c"))
      .filter(length(col("c")) > 0)
    chars
      .groupBy(col(idCol), col("c"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n")).as("len"),
        sum((col("n").cast("double") * log(col("n").cast("double"))).cast("decimal(27,18)")).as("nlogn"))
      .select(
        col(idCol),
        col("len").cast("int").as("n_chars"),
        round(
          when(col("len") <= 1, 0.0).otherwise(
            (log(col("len").cast("double")) - col("nlogn").cast("double") / col("len")) / log(lit(2.0))),
          6).as("entropy"))
  }

  /** (prev, cur) bigram events: zip tokens[1..n-1] with tokens[2..n]
    * in-row — NO window shuffle. Token array bound once; the
    * expression tree references it 5× (filter + 2 slices + 2 sizes)
    * and each unbound reference would re-split the document.
    */
  private def bigramEvents(d: DataFrame, textCol: String, cols: Seq[Column]): DataFrame = d
    .select(cols :+ toks(col(textCol)).as("tt"): _*)
    .filter(size(col("tt")) >= 2)
    .select(
      cols :+ explode(
        zip_with(
          slice(col("tt"), lit(1), size(col("tt")) - 1),
          slice(col("tt"), lit(2), size(col("tt")) - 1),
          (p, c) => struct(p.as("prev"), c.as("cur")))).as("bg"): _*)
    .select(cols ++ Seq(col("bg.prev").as("prev"), col("bg.cur").as("cur")): _*)

  /** Per-doc cross-entropy under a corpus bigram LM with stupid
    * backoff (Brants et al. 2007, "Large Language Models in Machine
    * Translation" — public method): score(cur|prev) =
    * C(prev,cur) / C(prev) when the bigram is in the top-`bigramK`
    * bigram table AND prev is in the top-`vocabK` vocab, else
    * 0.4 × p_uni(cur) with unigramXent's unigram table (cnt/total,
    * 0.5/total OOV floor). The sharper next-token signal a
    * perplexity filter wants over the unigram model, with the same
    * engine-replayable determinism.
    *
    * Scale shape: bigram expansion is an in-row array zip (NO window
    * shuffle — the (prev,cur) pairs come from slicing the token array
    * against itself); both LM tables are top-K truncations →
    * broadcast joins; the per-doc reduce is one keyed aggregation
    * with decimal-exact sums. Corpus stats are two hash aggregations
    * with map-side partial combine.
    */
  /** The GENERATION face of the bigram LM: for each of the `topV`
    * most frequent context tokens, the `k` most likely next tokens
    * with conditional probability P(next | ctx) = c(ctx,next)/c(ctx·)
    * — the completion/suggestion table a bigram LM serves (and a
    * human-readable corpus-idiom card). One bigram aggregation +
    * per-context rank windows (WindowGroupLimit); the probability
    * denominator is the context's OUTGOING bigram mass, so rows sum
    * to 1 per context.
    *
    * Output: (ctx, next_rank, next_token, n, p), ties to the
    * lexicographically smaller token.
    */
  def bigramTopNext(df: DataFrame, textCol: String, topV: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bi = df
      .select(toks(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("ctx"), b.as("nxt")))).as("p"))
      .groupBy(col("p.ctx").as("ctx"), col("p.nxt").as("next_token"))
      .agg(count(lit(1)).as("n"))
    val hotCtx = bi
      .groupBy(col("ctx"))
      .agg(sum(col("n")).as("ctx_n"))
      .orderBy(desc("ctx_n"), col("ctx"))
      .limit(topV)
    val w = Window.partitionBy(col("ctx")).orderBy(desc("n"), col("next_token"))
    bi.join(broadcast(hotCtx), Seq("ctx"))
      .withColumn("next_rank", row_number().over(w))
      .filter(col("next_rank") <= k)
      .select(
        col("ctx"),
        col("next_rank"),
        col("next_token"),
        col("n").cast("bigint").as("n"),
        round(col("n").cast("double") / col("ctx_n"), 6).as("p"))
  }

  def bigramXent(df: DataFrame, idCol: String, textCol: String, bigramK: Int, vocabK: Int): DataFrame =
    bigramXentTransfer(df, df, idCol, textCol, bigramK, vocabK)

  /** [[bigramXent]] with the LM fit and the scoring corpus SPLIT —
    * the CCNet deployment shape (Wenzek et al. 2020, public method):
    * the n-gram model is fit on a REFERENCE corpus (there: Wikipedia
    * per language) and scores a DIFFERENT corpus (the crawl); "far
    * from the reference LM" is the quality/language signal. Fitting
    * on the corpus being scored (the single-argument form) can't
    * flag systematic drift — the drift is in the model.
    *
    * `ref` supplies the vocab/bigram/total tables; `df` is scored.
    * Same broadcast-table plan — the fit side adds one aggregation
    * chain over `ref`, the score side is unchanged.
    */
  def bigramXentTransfer(
      ref: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      bigramK: Int,
      vocabK: Int): DataFrame = {
    def eventsOf(d: DataFrame, cols: Seq[Column]): DataFrame = bigramEvents(d, textCol, cols)
    val events = eventsOf(df, Seq(col(idCol)))

    val tokens = ref.select(explode(toks(col(textCol))).as("token"))
    val counts = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total  = counts.agg(sum(col("cnt")).as("total"))
    val vocab  = counts.orderBy(desc("cnt"), col("token")).limit(vocabK)
    val bgTop = eventsOf(ref, Seq.empty)
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("bg_cnt"))
      .orderBy(desc("bg_cnt"), col("prev"), col("cur"))
      .limit(bigramK)

    events
      .join(broadcast(bgTop), Seq("prev", "cur"), "left")
      .join(broadcast(vocab.select(col("token").as("prev"), col("cnt").as("prev_cnt"))), Seq("prev"), "left")
      .join(broadcast(vocab.select(col("token").as("cur"), col("cnt").as("cur_cnt"))), Seq("cur"), "left")
      .crossJoin(broadcast(total))
      .withColumn(
        "lp",
        when(
          col("bg_cnt").isNotNull && col("prev_cnt").isNotNull,
          log(col("bg_cnt").cast("double") / col("prev_cnt")))
          .otherwise(log(lit(0.4) * coalesce(col("cur_cnt").cast("double"), lit(0.5)) / col("total")))
          .cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_bigrams"),
        round(-(sum(col("lp")).cast("double") / count(lit(1))), 6).as("xent"))
  }

  /** CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3,
    * public method): score every doc with the TRANSFER LM
    * ([[bigramXentTransfer]] — fit on the reference-language slice),
    * then cut each language into perplexity terciles. "head" is the
    * closest-to-reference third — what CCNet feeds to pretraining
    * first; the bucket label is the unit real mixing recipes
    * consume (e.g. sample head:middle:tail at 70:20:10).
    *
    * Scale shape: the scoring plan is bigramXentTransfer's
    * (broadcast LM tables, one doc-keyed reduce); bucketing adds ONE
    * window shuffle keyed by language — partitions by a bounded key
    * set, orders by (xent, id) so rounded-score ties split
    * deterministically on both engines.
    */
  def pplBuckets(
      df: DataFrame,
      idCol: String,
      langCol: String,
      textCol: String,
      refLang: String,
      bigramK: Int,
      vocabK: Int): DataFrame = {
    val scored =
      bigramXentTransfer(df.filter(col(langCol) === refLang), df, idCol, textCol, bigramK, vocabK)
    val w = Window.partitionBy(col(langCol)).orderBy(col("xent"), col(idCol))
    df.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))
      .withColumn("tercile", ntile(3).over(w))
      .withColumn(
        "bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail"))
      .drop("tercile")
  }

  /** Per-stratum tokenizer-fertility card: whitespace vs BPE-ish
    * token counts, characters, fertility (BPE tokens per whitespace
    * word) and chars-per-token — the per-language cost model a
    * pretraining budget is planned with (token budgets are
    * tokenizer-relative; CJK text can cost 3–5× per word). One hash
    * aggregation over pure per-row counts; group count = strata
    * count, trivially driver-sized at any corpus scale.
    */
  def tokenFertility(df: DataFrame, strataCol: String, textCol: String): DataFrame =
    df.select(
        col(strataCol),
        tokenCountWs(col(textCol)).as("ws"),
        tokenCountBpe(col(textCol)).as("bpe"),
        length(col(textCol)).as("chars"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum(col("ws")).cast("bigint").as("ws_tokens"),
        sum(col("bpe")).cast("bigint").as("bpe_tokens"),
        sum(col("chars")).cast("bigint").as("n_chars"))
      .withColumn("fertility", round(col("bpe_tokens").cast("double") / col("ws_tokens"), 6))
      .withColumn("chars_per_tok", round(col("n_chars").cast("double") / col("bpe_tokens"), 6))

  /** Per-doc cross-entropy under a corpus TRIGRAM LM with two-level
    * stupid backoff (Brants et al. 2007 §4, the full recipe the
    * bigram variant above truncates): score(w3|w1,w2) =
    * C(w1,w2,w3)/C(w1,w2) when the trigram is in the top-`trigramK`
    * table AND its context bigram is in the top-`bigramK` table;
    * else 0.4 × C(w2,w3)/C(w2) when that bigram and its context
    * unigram are tabled; else 0.4² × p_uni(w3) with the same
    * cnt/total top-`vocabK` unigram model and 0.5/total OOV floor.
    * The backoff factor is Brants' fixed α=0.4 at every level — no
    * discount estimation, which is what makes the model
    * engine-replayable (the reference for quality filtering at
    * pretraining scale: CCNet buckets on exactly this family).
    *
    * Scale shape identical to [[bigramXent]] one level up: trigram
    * expansion is an in-row index map over the token array (NO
    * window shuffle); all three LM tables are top-K truncations →
    * broadcast joins (the bigram table joins TWICE — once as the
    * (w1,w2) context, once as the (w2,w3) backoff target); corpus
    * stats are three hash aggregations with map-side combine; the
    * per-doc reduce is one keyed aggregation with decimal-exact
    * sums, one rounded double at the end.
    */
  def trigramXent(
      df: DataFrame,
      idCol: String,
      textCol: String,
      trigramK: Int,
      bigramK: Int,
      vocabK: Int): DataFrame = {
    val t = toks(col(textCol))
    // (w1, w2, w3) triples: index map over the token array in-row.
    // The token array is BOUND to a column first — the transform
    // lambda references it 4× (sequence bound + 3 element_at), and an
    // unbound toks() subtree would re-split the document per
    // reference per element (measured 13 s vs 2 s at sf0.1 — the
    // same trap curationOn's langid stage documents)
    val events = df
      .select(col(idCol), t.as("tt"))
      .filter(size(col("tt")) >= 3)
      .select(
        col(idCol),
        explode(
          transform(
            sequence(lit(3), size(col("tt"))),
            i =>
              struct(
                element_at(col("tt"), i - 2).as("w1"),
                element_at(col("tt"), i - 1).as("w2"),
                element_at(col("tt"), i).as("w3")))).as("tg"))
      .select(col(idCol), col("tg.w1").as("w1"), col("tg.w2").as("w2"), col("tg.w3").as("w3"))
    val bigrams = df
      .select(t.as("tt"))
      .filter(size(col("tt")) >= 2)
      .select(
        explode(
          zip_with(
            slice(col("tt"), lit(1), size(col("tt")) - 1),
            slice(col("tt"), lit(2), size(col("tt")) - 1),
            (p, c) => struct(p.as("prev"), c.as("cur")))).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))

    val tokens = df.select(explode(toks(col(textCol))).as("token"))
    val counts = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total  = counts.agg(sum(col("cnt")).as("total"))
    val vocab  = counts.orderBy(desc("cnt"), col("token")).limit(vocabK)
    val bgTop = bigrams
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("bg_cnt"))
      .orderBy(desc("bg_cnt"), col("prev"), col("cur"))
      .limit(bigramK)
    val tgTop = events
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("tg_cnt"))
      .orderBy(desc("tg_cnt"), col("w1"), col("w2"), col("w3"))
      .limit(trigramK)

    events
      .join(broadcast(tgTop), Seq("w1", "w2", "w3"), "left")
      .join(
        broadcast(bgTop.select(col("prev").as("w1"), col("cur").as("w2"), col("bg_cnt").as("ctx_cnt"))),
        Seq("w1", "w2"), "left")
      .join(
        broadcast(bgTop.select(col("prev").as("w2"), col("cur").as("w3"), col("bg_cnt").as("bg23_cnt"))),
        Seq("w2", "w3"), "left")
      .join(broadcast(vocab.select(col("token").as("w2"), col("cnt").as("w2_cnt"))), Seq("w2"), "left")
      .join(broadcast(vocab.select(col("token").as("w3"), col("cnt").as("w3_cnt"))), Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .withColumn(
        "lp",
        when(
          col("tg_cnt").isNotNull && col("ctx_cnt").isNotNull,
          log(col("tg_cnt").cast("double") / col("ctx_cnt")))
          .when(
            col("bg23_cnt").isNotNull && col("w2_cnt").isNotNull,
            log(lit(0.4) * col("bg23_cnt").cast("double") / col("w2_cnt")))
          .otherwise(log(lit(0.16) * coalesce(col("w3_cnt").cast("double"), lit(0.5)) / col("total")))
          .cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_trigrams"),
        round(-(sum(col("lp")).cast("double") / count(lit(1))), 6).as("xent"))
  }

  /** Per-doc cross-entropy under an interpolated Kneser–Ney bigram
    * LM (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form
    * with fixed absolute discount D — KenLM's model family, what
    * CCNet-style quality pipelines actually deploy):
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + (D·N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··)
    *
    * Self-fit on the corpus, so every scored event has c(w1·) > 0
    * and N1+(·w2) > 0 — the estimate is total with no unigram floor.
    *
    * Unlike the stupid-backoff family above (top-K truncations that
    * broadcast), the KN model is the FULL bigram relation — the
    * realistic shape at pretraining scale, where the LM outgrows any
    * broadcast. Scale shape: one (prev,cur) hash aggregation builds
    * the bigram counts; the context table (c(w1·), N1+(w1·)) and
    * continuation table (N1+(·w2)) derive from IT — bigram-TYPE-sized
    * inputs, not corpus events — and the three model relations
    * pre-join into one (prev,cur)-keyed model at type scale, so the
    * corpus-scale events shuffle exactly ONCE (the (prev,cur) join).
    * The model never broadcasts and never reaches the driver.
    * Parity: both engines evaluate the identical double expression
    * tree over integer counts; each ln quantizes to DECIMAL(27,18)
    * before the order-free per-doc sum.
    */
  def knBigramXent(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    val events = bigramEvents(df, textCol, Seq(col(idCol)))
    val bg = bigramEvents(df, textCol, Seq.empty)
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c"))
    val ctx   = bg.groupBy(col("prev")).agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1p_fwd"))
    val cont  = bg.groupBy(col("cur")).agg(count(lit(1)).as("n1p_bwd"))
    val types = bg.agg(count(lit(1)).as("types"))
    val model = bg.join(ctx, Seq("prev")).join(cont, Seq("cur"))
    events
      .join(model, Seq("prev", "cur"))
      .crossJoin(broadcast(types))
      .withColumn(
        "lp",
        log(
          greatest(col("c") - lit(discount), lit(0.0)) / col("cw1") +
            ((lit(discount) * col("n1p_fwd")) / col("cw1")) *
            (col("n1p_bwd").cast("double") / col("types")))
          .cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_bigrams"),
        round(-(sum(col("lp")).cast("double") / count(lit(1))), 6).as("xent"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group, with
    * the exact count attached as calibration (Bar-Yossef et al. 2002,
    * the bottom-k sketch Theta/KMV sketch libraries implement —
    * public method). Each value hashes to a 60-bit md5-derived point
    * in [0, 2^60); the k smallest distinct hashes summarize the set,
    * and |D| ≈ (k−1) · 2^60 / h_(k) when ≥ k values were seen (exact
    * count below that). Unlike HLL, the sketch is engine-replayable
    * bit-for-bit (hash + order + one division), so the estimate
    * itself sits under the DuckDB hash gate.
    *
    * Scale shape: the sketch is the custom `kmv_sketch` aggregate
    * (graft.expressions.KmvSketchAgg, a TypedImperativeAggregate):
    * per-partition the k minima fold in a bounded TreeSet, partials
    * merge by union-then-trim (exactly how KMV sketches compose), so
    * map-side combine collapses every partition to ≤ k longs before
    * the single keyed shuffle — no distinct pre-shuffle, no
    * per-group sort window. The exact count rides the same
    * aggregation as count(DISTINCT …) calibration.
    *
    * Output: (group, n_exact, kmv_est, rel_err).
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int = 64): DataFrame = {
    import graft.expressions.KmvSketch.kmvSketch
    df.select(col(groupCol), explode(toks(col(textCol))).as("token"))
      .select(col(groupCol), Dedup.hash60(col("token")).as("h"))
      .groupBy(col(groupCol))
      .agg(
        countDistinct(col("h")).as("n_exact"),
        kmvSketch(col("h"), k).as("sk"))
      .withColumn(
        "kmv_est",
        when(size(col("sk")) < k, col("n_exact").cast("double"))
          .otherwise(
            round(
              lit((k - 1).toDouble) * lit(1152921504606846976.0) / element_at(col("sk"), size(col("sk"))),
              6)))
      .select(
        col(groupCol),
        col("n_exact"),
        col("kmv_est"),
        round(abs(col("kmv_est") - col("n_exact")) / col("n_exact"), 6).as("rel_err"))
  }

  /** KMV sketch SET ALGEBRA across group pairs — the sketch twin of
    * the exact q_source_overlap card: per-group bottom-k vocabulary
    * sketches compose under union (k smallest of the merged minima
    * IS the union's sketch — the closure property that makes KMV a
    * mergeable sketch), intersection estimates by inclusion-
    * exclusion, and Jaccard as their ratio. At 100 TB the exact
    * pairwise overlap needs the full inverted vocabulary per pair;
    * this needs k longs per group, and the pair stage runs on the
    * |groups|-row sketch table (broadcast), never the corpus.
    *
    * Deterministic end-to-end: md5-derived hashes, order + one
    * division — the ESTIMATES sit under the DuckDB hash gate, not
    * just the exact counts.
    *
    * Output per unordered group pair: (g_a, g_b, est_a, est_b,
    * est_union, est_intersect, jaccard_est), estimates ≥ 0, exact
    * when a side's distinct vocabulary fits in k.
    */
  def kmvOverlap(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int = 64): DataFrame = {
    import graft.expressions.KmvSketch.kmvSketch
    val two60 = 1152921504606846976.0
    def est(sk: Column): Column =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(two60) / element_at(sk, k))
    val sketches = df
      .select(col(groupCol).as("g"), explode(toks(col(textCol))).as("token"))
      .select(col("g"), Dedup.hash60(col("token")).as("h"))
      .groupBy(col("g"))
      .agg(kmvSketch(col("h"), k).as("sk"))
    val pairs = sketches
      .select(col("g").as("g_a"), col("sk").as("sk_a"))
      .join(
        broadcast(sketches.select(col("g").as("g_b"), col("sk").as("sk_b"))),
        col("g_a") < col("g_b"))
      .withColumn("sk_u", slice(array_sort(array_distinct(concat(col("sk_a"), col("sk_b")))), 1, k))
    pairs
      .select(
        col("g_a"),
        col("g_b"),
        round(est(col("sk_a")), 6).as("est_a"),
        round(est(col("sk_b")), 6).as("est_b"),
        round(est(col("sk_u")), 6).as("est_union"),
        round(greatest(est(col("sk_a")) + est(col("sk_b")) - est(col("sk_u")), lit(0.0)), 6)
          .as("est_intersect"),
        round(
          greatest(est(col("sk_a")) + est(col("sk_b")) - est(col("sk_u")), lit(0.0)) /
            est(col("sk_u")),
          6).as("jaccard_est"))
  }

  /** Corpus vocabulary: top-k tokens by frequency (vocabulary /
    * BPE-seed construction over a lake). One explode + one hash
    * aggregation (partial map-side combine collapses each partition's
    * token counts before the shuffle) + a k-row TakeOrdered — no
    * global sort. Ties rank lexicographically.
    */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(k)
    counts.withColumn(
      "rank",
      row_number().over(Window.orderBy(desc("n"), col("token"))))
  }

  /** Exact heavy hitters over an unbounded vocabulary via the
    * two-pass sketch-then-confirm pattern: tokens whose corpus
    * frequency is at least `support × N` (N = total token count).
    *
    * Pass 1 is ONE aggregation over the exploded tokens computing a
    * Misra–Gries summary (bounded state: ≤ 2·capacity entries per
    * partition, merged map-side — see
    * [[graft.expressions.MisraGriesAgg]]) alongside the exact N.
    * MG guarantees every token with count > N/(capacity+1) survives,
    * so with `capacity ≥ 2/support` the candidate set is a strict
    * superset of the true heavy hitters. Pass 2 re-scans, keeps only
    * candidate tokens (a ≤ capacity-entry broadcast literal filter —
    * the aggregation state is now bounded by the candidate count,
    * not the vocabulary), counts exactly, and applies the threshold.
    *
    * Why not a plain groupBy(token)? At 100 TB the vocabulary is
    * billions of distinct tokens: the single-pass exact aggregation
    * shuffles every singleton token. Here the shuffle volume is
    * ≤ 2·capacity entries per partition in pass 1 and only
    * candidate-token rows in pass 2. The OUTPUT is exact and
    * partitioning-independent (MG's nondeterministic stragglers are
    * killed by the exact pass-2 threshold), hence oracle-checkable.
    *
    * Output: (token, cnt) with cnt ≥ ceil(support·N).
    */
  def heavyHitters(
      df: DataFrame,
      textCol: String,
      support: Double,
      capacity: Int): DataFrame = {
    require(support > 0 && support < 1, s"support must be in (0,1), got $support")
    require(
      capacity + 1 > math.ceil(1.0 / support).toInt,
      s"capacity $capacity too small for support $support: MG recall needs capacity+1 > 1/support")
    import graft.expressions.FreqSketch.mgSketch
    val tokens = df.select(explode(toks(col(textCol))).as("token"))
    val row = tokens
      .agg(mgSketch(col("token"), capacity).as("mg"), count(lit(1)).as("n"))
      .head()
    val candidates = row.getMap[String, Long](0).keys.toSeq
    val total      = row.getLong(1)
    val threshold  = math.ceil(support * total).toLong
    tokens
      .filter(col("token").isin(candidates: _*))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Within-document co-occurrence PMI over the corpus top-`topV`
    * vocabulary (Church & Hanks 1990, the classic collocation
    * statistic): for token pairs t1 < t2,
    * PMI = ln(N·c12 / (c1·c2)) with c = document frequencies — the
    * "what words travel together" card that surfaces templated
    * phrase structure a unigram view cannot see. Pairs below
    * `minDocs` joint support drop (PMI is noise at tiny counts);
    * top-`topK` by (6dp PMI desc, t1, t2).
    *
    * Scale shape: THE deliberate bound is the vocabulary cut — the
    * per-doc pair fan-out of the presence self-join is ≤ topV²/2
    * REGARDLESS of document length or corpus size (off-vocab tokens
    * never enter), and map-side combine collapses each partition's
    * pairs to ≤ topV²/2 cells before the shuffle. Keep topV modest
    * (50 ⇒ ≤ 1 225 pairs/doc); the knob is the fan-out contract, not
    * a tuning detail.
    *
    * Output: (t1, t2, n_docs_both, pmi).
    */
  def pmiPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topV: Int = 50,
      minDocs: Long = 2L,
      topK: Int = 20): DataFrame = {
    val cnt = df
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tc"))
    val vocab = cnt
      .orderBy(desc("tc"), col("token"))
      .limit(topV)
      .select(col("token"))
    val pres = df
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"))
      .distinct()
    val docFreq = pres.groupBy(col("token")).agg(count(lit(1)).as("cd"))
    val nDocs   = df.select(col(idCol)).distinct().agg(count(lit(1)).as("n"))
    val pairs = pres.select(col("id"), col("token").as("t1"))
      .join(pres.select(col("id"), col("token").as("t2")), Seq("id"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minDocs)
    pairs
      .crossJoin(broadcast(nDocs))
      .join(broadcast(docFreq.select(col("token").as("t1"), col("cd").as("c1"))), Seq("t1"))
      .join(broadcast(docFreq.select(col("token").as("t2"), col("cd").as("c2"))), Seq("t2"))
      .select(
        col("t1"), col("t2"), col("c12").as("n_docs_both"),
        round(
          log(col("n").cast("double") * col("c12") / (col("c1").cast("double") * col("c2"))),
          6).as("pmi"))
      .orderBy(desc("pmi"), col("t1"), col("t2"))
      .limit(topK)
  }

  /** Heaps'-law vocabulary-growth fit (Heaps 1978, public law):
    * V(N) ≈ K·N^β — distinct types V vs running token count N as the
    * corpus grows in id order; natural text sits near β ≈ 0.5, and a
    * flattening curve is the "source is mined out" signal next to
    * [[graft.textops.Curation.ngramNovelty]]'s per-doc view. Returns
    * one row (n_checkpoints, beta, intercept) — ln V on ln N OLS over
    * `checkpoints` id-order cut points.
    *
    * Scale shape — NO global prefix window (a cumulative sum ordered
    * over 10^9 docs would funnel through one partition): growth is
    * evaluated at G = `checkpoints` FIXED id cuts (fractions of
    * max id). Token totals per cut are one conditional-sum
    * aggregation (each doc row fans out to the ≤ G cuts it belongs
    * under, collapsed by map-side combine to G keys); type counts per
    * cut reuse the first-appearance trick — `min(id)` per token hash
    * is one hash aggregation, and a type counts toward every cut ≥
    * its first id. Everything after the two corpus-scale
    * aggregations is G-sized. OLS terms quantize to DECIMAL(27,18)
    * (the zipfFit recipe); degenerate fits (< 2 distinct N) yield
    * NULL, not NaN.
    */
  def heapsFit(df: DataFrame, idCol: String, textCol: String, checkpoints: Int = 16): DataFrame = {
    require(checkpoints >= 2, "need at least 2 checkpoints")
    val session = df.sparkSession
    import session.implicits._
    val maxId = df.agg(max(col(idCol)).cast("long").as("max_id"))
    val cuts = (1 to checkpoints).toDF("g")
      .crossJoin(broadcast(maxId))
      .select(col("g"), floor(col("max_id") * col("g") / checkpoints).as("cut"))
    val perDoc = df.select(col(idCol).cast("long").as("id"), size(toks(col(textCol))).as("nt"))
    val nTok = perDoc
      .crossJoin(broadcast(cuts))
      .filter(col("id") <= col("cut"))
      .groupBy(col("g"))
      .agg(sum(col("nt")).as("n_tokens"))
    val firstSeen = df
      .select(col(idCol).cast("long").as("id"), explode(toks(col(textCol))).as("token"))
      .groupBy(xxhash64(col("token")).as("tok_h"))
      .agg(min(col("id")).as("first_id"))
    val nTypes = firstSeen
      .crossJoin(broadcast(cuts))
      .filter(col("first_id") <= col("cut"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_types"))
    val pts = nTok
      .join(nTypes, Seq("g"))
      .filter(col("n_tokens") > 0 && col("n_types") > 0)
      .select(
        log(col("n_tokens").cast("double")).cast("decimal(27,18)").as("x"),
        log(col("n_types").cast("double")).cast("decimal(27,18)").as("y"),
        (log(col("n_tokens").cast("double")) * log(col("n_types").cast("double")))
          .cast("decimal(27,18)").as("xy"),
        (log(col("n_tokens").cast("double")) * log(col("n_tokens").cast("double")))
          .cast("decimal(27,18)").as("xx"))
    pts
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"),
        countDistinct(col("x")).as("nx"))
      .select(
        col("n").cast("int").as("n_checkpoints"),
        when(
          col("nx") > 1,
          round(
            (col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
              (col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")),
            6)).as("beta"),
        when(
          col("nx") > 1,
          round(
            (col("sy").cast("double") -
              ((col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
                (col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")))
                * col("sx").cast("double")) / col("n"),
            6)).as("intercept"))
  }

  /** Pairwise Jensen–Shannon divergence between per-group unigram
    * distributions over the corpus-wide top-`topV` vocabulary — the
    * corpus-drift card a mixer reads next to [[sourceOverlap]]'s
    * set view: JSD is symmetric, bounded by ln 2, and 0 iff two
    * sources use the shared vocabulary identically (Lin 1991, public
    * measure). Nats, not bits.
    *
    * Scale shape: ONE corpus-scale aggregation (token counts per
    * group); the vocabulary cut (cnt desc, token asc — deterministic)
    * and everything after it live at groups × topV size, with the
    * per-pair term grid at pairs × topV. Engine-exact: probabilities
    * are integer-count ratios, each pointwise term
    * 0.5·p·ln(2p/(p+q)) quantizes to DECIMAL(27,18) before the
    * order-free sum, rounded to 6dp at the end — the zipfFit recipe.
    *
    * Output: (src_a, src_b, jsd), one row per unordered group pair.
    */
  def jsDivergence(df: DataFrame, groupCol: String, textCol: String, topV: Int = 200): DataFrame = {
    val cnt = df
      .select(col(groupCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val vocab = cnt
      .groupBy(col("token"))
      .agg(sum(col("c")).as("tc"))
      .orderBy(desc("tc"), col("token"))
      .limit(topV)
      .select(col("token"))
    val r   = cnt.join(broadcast(vocab), Seq("token"))
    val tot = r.groupBy(col(groupCol)).agg(sum(col("c")).as("n"))
    val pairs = tot
      .select(col(groupCol).as("src_a"), col("n").as("na"))
      .crossJoin(tot.select(col(groupCol).as("src_b"), col("n").as("nb")))
      .filter(col("src_a") < col("src_b"))
    val grid = pairs.crossJoin(broadcast(vocab))
    val pq = grid
      .join(r.select(col("token"), col(groupCol).as("src_a"), col("c").as("ca")), Seq("token", "src_a"), "left")
      .join(r.select(col("token"), col(groupCol).as("src_b"), col("c").as("cb")), Seq("token", "src_b"), "left")
      .select(
        col("src_a"), col("src_b"),
        (coalesce(col("ca"), lit(0L)).cast("double") / col("na")).as("p"),
        (coalesce(col("cb"), lit(0L)).cast("double") / col("nb")).as("q"))
    pq
      .select(
        col("src_a"), col("src_b"),
        when(col("p") > 0, lit(0.5) * col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
          .otherwise(0.0).cast("decimal(27,18)").as("tp"),
        when(col("q") > 0, lit(0.5) * col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
          .otherwise(0.0).cast("decimal(27,18)").as("tq"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(round((sum(col("tp")) + sum(col("tq"))).cast("double"), 6).as("jsd"))
  }

  /** Domain-indicative vocabulary: χ² statistic of token × group over
    * the corpus-wide top-`topV` vocabulary, top-`topK` tokens — the
    * tokens whose usage departs most from group-independence (the
    * classic feature-selection statistic; a mixer reads it as "what
    * words make source X source X"). Contingency is closed over the
    * restricted vocabulary (row/column/grand totals all from the
    * same topV table), so E > 0 for every cell.
    *
    * Scale: one corpus aggregation, then groups × topV cells.
    * Engine-exact: O and E derive from integer counts; each cell term
    * (O−E)·(O−E)/E (explicit product, no pow-vs-power seam) quantizes
    * to DECIMAL(27,18) before the sum; the final (chi2 desc, token)
    * cut compares 6dp-rounded values on both engines.
    *
    * Output: (token, chi2), topK rows.
    */
  def chi2Tokens(df: DataFrame, groupCol: String, textCol: String, topV: Int = 200, topK: Int = 20): DataFrame = {
    val cnt = df
      .select(col(groupCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val vocab = cnt
      .groupBy(col("token"))
      .agg(sum(col("c")).as("tc"))
      .orderBy(desc("tc"), col("token"))
      .limit(topV)
      .select(col("token"))
    val r      = cnt.join(broadcast(vocab), Seq("token"))
    val rowTot = r.groupBy(col("token")).agg(sum(col("c")).as("rt"))
    val colTot = r.groupBy(col(groupCol)).agg(sum(col("c")).as("ct"))
    val grand  = r.agg(sum(col("c")).cast("double").as("nn"))
    val cells = vocab
      .crossJoin(colTot)
      .join(r, Seq("token", groupCol), "left")
      .join(broadcast(rowTot), Seq("token"))
      .crossJoin(broadcast(grand))
      .select(
        col("token"),
        coalesce(col("c"), lit(0L)).cast("double").as("o"),
        (col("rt").cast("double") * col("ct") / col("nn")).as("e"))
    cells
      .select(
        col("token"),
        ((col("o") - col("e")) * (col("o") - col("e")) / col("e"))
          .cast("decimal(27,18)").as("term"))
      .groupBy(col("token"))
      .agg(round(sum(col("term")).cast("double"), 6).as("chi2"))
      .orderBy(desc("chi2"), col("token"))
      .limit(topK)
  }

  /** Zipf-law fit over the top-`topV` vocabulary: OLS slope/intercept
    * of ln(count) on ln(rank) — the corpus-health diagnostic (natural
    * text sits near slope −1; templated/machine-generated corpora
    * flatten or steepen it; Zipf 1949, public method). Returns one
    * row (n_terms, slope, intercept).
    *
    * Engine-exact recipe: ranks come from the deterministic
    * (cnt desc, token asc) top-V cut, so x = ln(rank), y = ln(cnt)
    * are ln of small integers — identical doubles on both engines;
    * each OLS term (x, y, x·y, x²) is quantized to DECIMAL(27,18)
    * before the order-free sums; the closed form runs in doubles,
    * rounded to 6dp. Scale shape: vocab count is one hash agg with
    * map-side combine; the fit reads only topV rows (TakeOrdered →
    * one-partition window over V rows, V bounded by the parameter).
    */
  def zipfFit(df: DataFrame, textCol: String, topV: Int = 100): DataFrame = {
    val counts = df
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val top = counts
      .orderBy(desc("cnt"), col("token"))
      .limit(topV)
      .withColumn("rank", row_number().over(Window.orderBy(desc("cnt"), col("token"))))
    val terms = top.select(
      log(col("rank").cast("double")).cast("decimal(27,18)").as("x"),
      log(col("cnt").cast("double")).cast("decimal(27,18)").as("y"),
      (log(col("rank").cast("double")) * log(col("cnt").cast("double")))
        .cast("decimal(27,18)").as("xy"),
      (log(col("rank").cast("double")) * log(col("rank").cast("double")))
        .cast("decimal(27,18)").as("xx"))
    terms
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"))
      .select(
        col("n").cast("int").as("n_terms"),
        // degenerate vocabulary guard: with < 2 distinct tokens the
        // OLS denominator n·Σx² − (Σx)² is 0 — emit NULL, not NaN,
        // so the single-type corpus edge fails loudly downstream
        when(
          col("n") > 1,
          round(
            (col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
              (col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")),
            6)).as("slope"),
        when(
          col("n") > 1,
          round(
            (col("sy").cast("double") -
              ((col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
                (col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")))
                * col("sx").cast("double")) / col("n"),
            6)).as("intercept"))
  }

  /** Exact Gini coefficient of the token-frequency distribution —
    * the corpus-concentration diagnostic next to [[zipfFit]] (G → 0:
    * uniform vocabulary use; G → 1: a few tokens dominate — heavy
    * boilerplate/templating). G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * over per-token counts x sorted ascending with 1-based rank i.
    *
    * Scale shape — NO per-token global window: tokens sharing a
    * count value occupy a contiguous rank block, and Σ i·x over the
    * block is cnt · (block-start + block-end) · m / 2 regardless of
    * intra-block order, so the rank sum needs only a running total
    * over DISTINCT count values (a window over the count histogram —
    * thousands of rows where a naive rank would sort the full
    * vocabulary on one partition). Integer/decimal arithmetic
    * end-to-end (2·Σi·x carried un-halved as Σ cnt·(s+e)·m, always
    * even), one double division at the end — engine-exact.
    */
  def giniTokenConcentration(df: DataFrame, textCol: String): DataFrame = {
    val counts = df
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    val hist = counts
      .groupBy(col("cnt"))
      .agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("cnt")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = hist
      .withColumn("cum_m", sum(col("m")).over(w))
      .withColumn("s", col("cum_m") - col("m") + 1)
      // 2·Σ_{i∈block} i·cnt = cnt·(s+e)·m with e = cum_m
      .withColumn(
        "two_ranked",
        col("cnt").cast("decimal(38,0)") *
          (col("s") + col("cum_m")).cast("decimal(38,0)") * col("m").cast("decimal(38,0)"))
    blocks
      .agg(
        sum(col("m")).as("n"),
        sum(col("m") * col("cnt")).as("tot"),
        sum(col("two_ranked")).as("s1x2"))
      .select(
        col("n").cast("int").as("n_types"),
        col("tot").cast("bigint").as("total_tok"),
        round(
          (col("s1x2").cast("double") - (col("n") + 1).cast("double") * col("tot")) /
            (col("n").cast("double") * col("tot")),
          6).as("gini"))
  }

  /** Token burstiness (index of dispersion, Church & Gale 1995's
    * observation that content words are bursty): variance-to-mean
    * ratio of the per-document count of each top-`topK` token,
    * counting zero-occurrence documents — VMR ≈ 1 is Poisson
    * (function-word-like scatter), VMR ≫ 1 means the token clumps
    * into few documents (topical/templated). The moments need no
    * zero rows: with N docs and per-doc counts c, μ = Σc/N and
    * Var = Σc²/N − μ² (the Σ over absent docs contributes 0).
    *
    * Scale shape: explode → (token, doc) hash agg (map-side combine)
    * → token-level moment agg — vocabulary-sized — → k-row
    * TakeOrdered. The only scan-sized shuffle is the (token, doc)
    * aggregation, the same shape every per-doc-count op here pays.
    *
    * Output: (token, tc, n_docs, vmr), top-`topK` by corpus count.
    */
  def tokenDispersion(df: DataFrame, idCol: String, textCol: String, topK: Int = 20): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("id"), explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"), col("id"))
      .agg(count(lit(1)).as("c"))
    val nDocs = df.agg(count(lit(1)).cast("double").as("n"))
    val mu    = col("tc").cast("double") / col("n")
    perDoc
      .groupBy(col("token"))
      .agg(
        sum(col("c")).as("tc"),
        count(lit(1)).as("n_docs"),
        sum(col("c") * col("c")).as("s2"))
      .crossJoin(broadcast(nDocs))
      .select(
        col("token"),
        col("tc").cast("bigint").as("tc"),
        col("n_docs").cast("bigint").as("n_docs"),
        round((col("s2").cast("double") / col("n") - mu * mu) / mu, 6).as("vmr"))
      .orderBy(desc("tc"), col("token"))
      .limit(topK)
  }

  /** Per-group hapax legomena card (vocabulary freshness: what
    * fraction of a source's vocabulary occurs exactly once — high
    * hapax rate ⇒ open vocabulary / noisy tail, low ⇒ templated
    * text): (group, n_types, n_tokens, n_hapax, hapax_rate).
    *
    * Scale shape: one (group, token) hash aggregation (map-side
    * combine) then a group-keyed fold over the vocabulary-sized
    * result — the intermediate is bounded by Σ per-group vocabulary,
    * never by corpus token count.
    */
  def hapaxRate(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df
      .select(col(groupCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_types"),
        sum(col("c")).cast("bigint").as("n_tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).cast("bigint").as("n_hapax"))
      .withColumn(
        "hapax_rate",
        round(col("n_hapax").cast("double") / col("n_types"), 6))

  /** Inverse Simpson diversity per group (effective vocabulary size
    * — Simpson 1949, Jost 2006's "true diversity" of order 2):
    * N²/Σc² over the group's token counts, the number of
    * equally-common types that would give the same repeat
    * probability. Complements TTR (sensitive to N) and entropy
    * (order 1) in the quality/diversity filter bank.
    *
    * Scale shape: one (group, token) hash aggregation, then a
    * group-keyed fold over the vocabulary-sized result.
    *
    * Output: (group, n_types, n_tokens, inv_simpson).
    */
  def simpsonDiversity(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df
      .select(col(groupCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_types"),
        sum(col("c")).cast("bigint").as("n_tokens"),
        sum(col("c") * col("c")).as("s2"))
      .select(
        col(groupCol),
        col("n_types"),
        col("n_tokens"),
        round(col("n_tokens").cast("double") * col("n_tokens") / col("s2"), 6).as("inv_simpson"))

  /** Vocabulary head coverage (the tokenizer/vocab-size design
    * curve): for each checkpoint k, the fraction of ALL token
    * occurrences covered by the k most frequent types. Checkpoints
    * beyond the vocabulary size emit nothing (there is no rank-k
    * type to stop at).
    *
    * Scale shape: one token-count aggregation, the corpus mass from
    * a vocabulary-sized agg, and the cumulative sum over ONLY the
    * top max(checkpoints) rows via TakeOrdered — the single-partition
    * window sees ≤ max-k rows by construction, never the vocabulary.
    *
    * Output: (k, top_mass, total_mass, coverage) ordered by k.
    */
  def headCoverage(
      df: DataFrame,
      textCol: String,
      checkpoints: Seq[Int] = Seq(5, 10, 20, 30)): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ > 0), "checkpoints must be positive")
    val counts = df
      .select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
    // total mass = Σ per-doc token counts: a shuffle-free scan-level
    // sum, NOT a second pass over the token aggregation (DataFrame
    // branches re-execute their subtree — deriving total from
    // `counts` would run the corpus-scale explode+agg twice)
    val total = df.select(sum(size(toks(col(textCol)))).cast("bigint").as("total"))
    val top   = counts.orderBy(desc("cnt"), col("token")).limit(checkpoints.max)
    val w     = Window.orderBy(desc("cnt"), col("token")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("k", row_number().over(Window.orderBy(desc("cnt"), col("token"))))
      .withColumn("cum", sum(col("cnt")).over(w))
      .filter(col("k").isin(checkpoints.map(Integer.valueOf): _*))
      .crossJoin(broadcast(total))
      .select(
        col("k"),
        col("cum").cast("bigint").as("top_mass"),
        col("total").cast("bigint").as("total_mass"),
        round(col("cum").cast("double") / col("total"), 6).as("coverage"))
      .orderBy(col("k"))
  }

  /** Mutual information between two categorical columns (nats), with
    * marginal entropies and the sqrt-normalized NMI — the
    * metadata-redundancy card: MI(lang, source) ≈ H(lang) means
    * source determines language (stratify on one, not both);
    * MI ≈ 0 means the two slice independently.
    *
    * Scale shape: ONE keyed aggregation over the lake builds the
    * (x, y, n) contingency table; marginals and entropies are folds
    * over the |X|·|Y| cells — everything after the first shuffle is
    * cell-sized. NULL category values are kept as their own level
    * (coalesced to a sentinel) so the table always sums to N.
    *
    * Output (single row): (mi, h_x, h_y, nmi).
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .groupBy(
        coalesce(col(xCol).cast("string"), lit("(null)")).as("x"),
        coalesce(col(yCol).cast("string"), lit("(null)")).as("y"))
      .agg(count(lit(1)).as("n"))
    // marginals via windows over the CELL table, ONE lineage — a
    // px/py/total branch split would re-execute the lake-scale
    // groupBy once per branch (DataFrame branches re-run their
    // subtree). Unpartitioned window is fine: the frame is |X|·|Y|
    // cells, not rows. Entropies fold from the cells directly,
    // Σ_cells (n/N)·ln(nx/N) = Σ_x (nx/N)·ln(nx/N).
    joint
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("nx", sum(col("n")).over(Window.partitionBy(col("x"))))
      .withColumn("ny", sum(col("n")).over(Window.partitionBy(col("y"))))
      .agg(
        // cast BEFORE multiplying: n·total and nx·ny as LongType
        // products overflow at lake scale (4e9 rows wraps negative →
        // log NULL → term silently drops); the oracle multiplies
        // doubles, so the long form would break the gate exactly at
        // the scale the card is for
        sum(col("n") / col("total") *
          log(col("n").cast("double") * col("total") /
            (col("nx").cast("double") * col("ny")))).as("mi_raw"),
        (-sum(col("n") / col("total") * log(col("nx") / col("total")))).as("hx_raw"),
        (-sum(col("n") / col("total") * log(col("ny") / col("total")))).as("hy_raw"))
      .select(
        round(col("mi_raw"), 6).as("mi"),
        round(col("hx_raw"), 6).as("h_x"),
        round(col("hy_raw"), 6).as("h_y"),
        round(
          when(col("hx_raw") * col("hy_raw") > 0,
            col("mi_raw") / sqrt(col("hx_raw") * col("hy_raw"))).otherwise(lit(0.0)),
          6).as("nmi"))
  }
}
