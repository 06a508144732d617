package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deny-list /
  * PII scrubbing, benchmark decontamination, sequence packing, and
  * Gopher/C4-style quality rules.
  *
  * All four are designed for the 100 TB lake shape:
  *  - scrub / quality rules are pure per-row column expressions
  *    (codegen, zero shuffle, filters push to the scan);
  *  - decontamination broadcasts the (small) benchmark's n-gram set,
  *    so the corpus side is scan → hash-join → one keyed shuffle of
  *    only the *contaminated* grams;
  *  - packing is one window shuffle keyed by the pack partition
  *    columns — add a shard column to the keys for parallelism when
  *    one stream (e.g. one language) dominates.
  */
object Curation {

  private[textops] def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  // ---------------------------------------------------------------
  // Deny-list / PII scrub
  // ---------------------------------------------------------------

  /** Default redaction patterns (ASCII, RE2-compatible so a SQL
    * oracle replays them): email, NANP-style phone, IPv4.
    */
  val defaultPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4"  -> "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b")

  /** Redact every pattern occurrence (applied in order, counts
    * measured on the ORIGINAL text) and report per-pattern match
    * counts. Output: id, clean_text, n_<name> per pattern. A pure
    * projection — codegen'd regexes, no shuffle, linear scan.
    */
  def scrub(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(String, String)] = defaultPatterns,
      token: String = "[REDACTED]"): DataFrame = {
    val clean = patterns.foldLeft(col(textCol)) {
      case (acc, (_, re)) => regexp_replace(acc, re, token)
    }
    val counts = patterns.map { case (name, re) =>
      size(regexp_extract_all(col(textCol), lit(re), lit(0))).as(s"n_$name")
    }
    df.select(col(idCol) +: clean.as("clean_text") +: counts: _*)
  }

  // ---------------------------------------------------------------
  // Benchmark decontamination
  // ---------------------------------------------------------------

  /** Space-joined word n-grams of a token array (empty when the doc
    * has fewer than n tokens — sequence() would count backwards).
    */
  def wordNgrams(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => array_join(slice(t, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** DISTINCT word n-grams as one Scala call — the hot-path variant
    * (same reasoning as Dedup.shinglesFast: the HOF chain runs
    * interpreted and re-inlines per consumer). Set semantics equal
    * array_distinct(wordNgrams(toks(text), n)): first-occurrence
    * order, empty when the doc has fewer than n tokens — unlike
    * shinglesFast, which emits one short shingle for short docs.
    */
  def wordNgramsFastDistinct(text: Column, n: Int): Column = {
    val f = udf((t: String) => {
      val toks = if (t == null) Array.empty[String] else t.split(" ").filter(_.nonEmpty)
      if (toks.length < n) Seq.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i    = 0
        while (i <= toks.length - n) { seen.add(toks.slice(i, i + n).mkString(" ")); i += 1 }
        seen.toArray(new Array[String](seen.size)).toSeq
      }
    })
    f(text)
  }

  /** Docs sharing at least one word n-gram with a benchmark/eval set
    * — the standard train-set decontamination check (13-grams in
    * real pipelines; n is a parameter). Returns
    * (id, n_overlap = distinct shared grams).
    *
    * Scale shape: the eval side is a benchmark suite (thousands of
    * docs) → its distinct gram set broadcasts; the corpus side never
    * shuffles its full gram inventory — grams stream through the
    * broadcast hash join and only the hits reach the per-doc count
    * aggregation.
    */
  def contaminatedDocs(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    // per-doc DISTINCT grams (one JVM call per row), then 8-byte
    // xxhash64 join keys instead of gram strings: the broadcast set
    // and the per-gram compares shrink ~10×, and distinct-per-doc
    // cuts the explode volume. count(distinct hash) equals
    // count(distinct gram) up to 64-bit collisions (~1e-10 at
    // millions of grams — the same accepted trade as the Jaccard
    // family's hashed shingles).
    val evalGrams = evalSet
      .select(explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gram_h"))
    corpus
      .select(col(idCol), explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
      // left_semi keeps each corpus gram at most once regardless of
      // eval-side duplicates — no distinct shuffle on the eval side
      .join(broadcast(evalGrams), Seq("gram_h"), "left_semi")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram_h")).as("n_overlap"))
  }

  /** Bloom-prefiltered decontamination — same result as
    * [[contaminatedDocs]] (the false-positive-free exact overlap),
    * different scale path: when the eval suite outgrows a broadcast
    * HASH table (a hash relation costs ~50–100 bytes/entry; a Bloom
    * filter ~10 BITS/entry at 1% fpp — a 1B-gram eval side is ~1.2 GB
    * of filter vs ~80 GB of hash relation), the corpus side is first
    * cut down by a broadcast Bloom-filter test — pure map-side, no
    * join machinery, drops ~all grams — and only the surviving sliver
    * (true hits + fpp·misses) enters the exact semi-join that removes
    * the false positives. The join side the planner sees is then the
    * post-Bloom minority, so even a shuffle join moves almost nothing.
    *
    * The Bloom filter is BUILT distributed (`stat.bloomFilter` is an
    * RDD tree-aggregate of fixed-size bitsets — no gram collection on
    * the driver) and shipped once per executor as a broadcast.
    *
    * Output: (id, n_overlap) — bit-identical to [[contaminatedDocs]].
    */
  def decontaminateBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    val evalGrams = evalSet
      .select(explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gram_h"))
    // expected-items bound for sizing: one cheap count on the small
    // side (benchmark suites are MBs; this is not the 100 TB side)
    val nEval = math.max(evalGrams.count(), 1L)
    val bf    = evalGrams.stat.bloomFilter("gram_h", nEval, fpp)
    val bcBf  = spark.sparkContext.broadcast(bf)
    val mightContain = udf((h: Long) => bcBf.value.mightContainLong(h))
    corpus
      .select(col(idCol), explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
      .filter(mightContain(col("gram_h")))
      // exact confirm kills the Bloom false positives; deliberately NO
      // broadcast hint — this models the eval-side-too-big-to-hash
      // case (at test scale AQE may still choose broadcast; fine)
      .join(evalGrams, Seq("gram_h"), "left_semi")
      .groupBy(col(idCol))
      .agg(countDistinct(col("gram_h")).as("n_overlap"))
  }

  /** Fuzzy (MinHash-LSH) decontamination: corpus docs that are a
    * NEAR-duplicate of an eval-suite item — the whole-document
    * generalization of the n-gram-overlap checks above
    * ([[contaminatedDocs]] / [[decontaminateBloom]] catch verbatim
    * gram overlap; this catches lightly-edited or truncated copies,
    * the contamination mode n-gram counting under-reports).
    *
    * Shape: MinHash signatures on both sides; the EVAL side (a
    * benchmark suite — small by definition) broadcasts its LSH band
    * keys AND its shingle sets; the corpus side is one scan → band
    * keys → broadcast equi-join on (band_idx, band_key) → exact
    * hashed-shingle Jaccard confirm computed map-side against the
    * broadcast eval shingles → one final groupBy(corpus id) keeping
    * the best match. No corpus self-pairs, no distinct over
    * candidates (duplicate candidates from multiple shared bands
    * collapse in the max aggregate), ONE shuffle total, and the
    * shuffled rows are only the band-collision survivors. A corpus
    * doc sharing no band with any eval item costs one broadcast
    * hash probe and is gone.
    *
    * Deterministic: best match = highest rounded Jaccard, ties to
    * the smallest eval id.
    *
    * @return (idCol, eval_id, jaccard) — one row per contaminated
    *         corpus doc with its closest eval item, jaccard >=
    *         `minJaccard`, rounded to 6 places
    */
  def decontaminateFuzzy(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 2,
      minJaccard: Double = 0.3): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    def prep(df: DataFrame, outId: String, sh: String, sig: String) = df
      .select(col(idCol).as(outId), Dedup.shinglesFast(col(textCol), shingleN).as(sh))
      .withColumn(sig, Dedup.minhashFast(col(sh), numHashes))
    val evalBands = prep(evalSet, "eval_id", "esh", "esig")
      .select(
        col("eval_id"), col("esh"),
        posexplode(Dedup.lshBandKeys(col("esig"), bands, rows)).as(Seq("band_idx", "band_key")))
    val corpusBands = prep(corpus, idCol, "csh", "csig")
      .select(
        col(idCol), col("csh"),
        posexplode(Dedup.lshBandKeys(col("csig"), bands, rows)).as(Seq("band_idx", "band_key")))
    val inter = size(array_intersect(col("csh"), col("esh"))).cast("double")
    val jac   = round(inter / (size(col("csh")) + size(col("esh")) - inter), 6)
    corpusBands
      .join(broadcast(evalBands), Seq("band_idx", "band_key"))
      .select(col(idCol), col("eval_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      // best eval match per corpus doc; duplicate (doc, eval) rows
      // from multiple shared bands are identical and collapse here
      .groupBy(col(idCol))
      .agg(max(struct(col("jaccard"), (-col("eval_id")).as("neg_id"))).as("m"))
      .select(col(idCol), (-col("m.neg_id")).cast("long").as("eval_id"), col("m.jaccard").as("jaccard"))
  }

  /** Per-doc duplicate-n-gram fraction: the share of a doc's DISTINCT
    * word n-grams that also occur in at least one OTHER doc — the
    * corpus-level cousin of the Gopher within-doc repetition signals,
    * and the scalar every near-dedup threshold sweep is calibrated
    * against (Lee et al. "Deduplicating Training Data…", ACL'22 —
    * public method, reimplemented from the description). Docs with
    * fewer than n tokens report (0, 0, 0.0).
    *
    * Scale shape: distinct grams per doc (one JVM call per row) →
    * 8-byte hash keys → ONE (gram_h) aggregation counting docs per
    * gram (map-side partial combine does the heavy lifting: most
    * grams are singletons) → join back on gram_h → per-doc avg. Two
    * keyed shuffles total, both on 8-byte keys; the doc bodies never
    * move. At 100 TB the df table can additionally be df>1-filtered
    * before the join (a semi-join against the non-singleton minority,
    * same trick as ngramJaccardPairsCapped) — kept explicit here so
    * n_grams is exact.
    */
  def dupNgramFraction(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val grams = corpus
      .select(col(idCol), explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
    val df = grams.groupBy(col("gram_h")).agg(count(lit(1)).as("n_docs_with"))
    val perDoc = grams
      .join(df, Seq("gram_h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_grams"),
        sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).cast("int").as("n_dup"))
    corpus
      .select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        coalesce(col("n_dup"), lit(0)).as("n_dup"))
      .withColumn(
        "dup_frac",
        when(col("n_grams") === 0, 0.0)
          .otherwise(round(col("n_dup").cast("double") / col("n_grams"), 6)))
  }

  /** Per-document n-gram NOVELTY in ingestion order (id asc): the
    * fraction of a doc's distinct word n-grams whose FIRST corpus
    * appearance is this doc — the freshness curve a streaming
    * curation pipeline watches to decide when a source is mined out
    * (novelty decays toward 0 as later docs re-tread earlier grams;
    * the complement of [[dupNgramFraction]]'s any-other-doc view).
    *
    * Scale shape — same two aggregations as dupNgramFraction, no
    * per-doc ordered window: distinct grams per doc (one JVM call per
    * row) → `min(id)` per gram hash is ONE hash aggregation (the
    * "first appearance" of every gram regardless of corpus order),
    * then one gram-keyed join back and a per-doc fold. Shuffle volume
    * is bounded by distinct grams, not corpus size.
    *
    * Output: (id, n_grams, n_novel, novel_frac) — gramless docs get
    * (0, 0, 0.0), mirroring dupNgramFraction's degenerate row.
    */
  def ngramNovelty(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val grams = corpus
      .select(col(idCol), explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
    val first = grams.groupBy(col("gram_h")).agg(min(col(idCol)).as("first_id"))
    val perDoc = grams
      .join(first, Seq("gram_h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_grams"),
        sum(when(col("first_id") === col(idCol), 1L).otherwise(0L)).cast("int").as("n_novel"))
    corpus
      .select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        coalesce(col("n_novel"), lit(0)).as("n_novel"))
      .withColumn(
        "novel_frac",
        when(col("n_grams") === 0, 0.0)
          .otherwise(round(col("n_novel").cast("double") / col("n_grams"), 6)))
  }

  /** Pairwise dataset-overlap card: for every pair of sources, the
    * exact word-n-gram set intersection, Jaccard, and containment
    * (∩/min) — the "how much of dataset B is already in dataset A"
    * audit a corpus mixer runs before choosing mixture weights
    * (train/train overlap, the corpus-level sibling of the
    * train/eval decontamination ops above).
    *
    * Scale shape: per-doc DISTINCT grams (one JVM call per row)
    * collapse to distinct (source, gram-hash) pairs via one hash
    * aggregation — set size per source is bounded by the corpus
    * vocabulary, not its row count. The pair counts come from an
    * inverted self-join on the 8-byte gram hash: rows per gram =
    * sources containing it ≤ |sources|, so the join output is
    * bounded by grams × |S|²/2 with |S| small by construction
    * (datasets, not documents). Set sizes broadcast back. Counts
    * are hash-collision-exact in practice (xxhash64 over ≤ 10^9
    * grams) and integer-exact otherwise.
    *
    * Output: (src_a, src_b, n_a, n_b, n_common, jaccard,
    * containment), one row per unordered pair with src_a < src_b.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String, textCol: String, n: Int): DataFrame = {
    val grams = df
      .select(col(sourceCol).as("src"), explode(wordNgramsFastDistinct(col(textCol), n)).as("gram"))
      .select(col("src"), xxhash64(col("gram")).as("g"))
      .distinct()
    val sizes = grams.groupBy(col("src")).agg(count(lit(1)).as("n_set"))
    val pairs = grams
      .as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes.select(col("src").as("src_a"), col("n_set").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("src").as("src_b"), col("n_set").as("n_b"))), Seq("src_b"))
      .select(
        col("src_a"),
        col("src_b"),
        col("n_a"),
        col("n_b"),
        col("n_common"),
        round(col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")), 6)
          .as("jaccard"),
        round(col("n_common").cast("double") / least(col("n_a"), col("n_b")), 6)
          .as("containment"))
  }

  /** Per-source data card: the summary table a curated corpus ships
    * with (and the first thing a training run's data audit asks for)
    * — doc count, total whitespace tokens, mean quality score, and
    * share of docs in the pivot language, per source/domain.
    *
    * Scale shape: per-doc features are pure column expressions
    * (codegen, no shuffle), then ONE hash aggregation keyed by
    * source with map-side partial combine — the classic reduce; at
    * 100 TB the group count is the domain count, trivially driver-
    * sized. Mean quality sums the 6dp-rounded per-doc score through
    * DECIMAL (order-free) so the mean is bit-stable under any
    * partitioning.
    */
  def dataCard(
      corpus: DataFrame,
      sourceCol: String,
      langCol: String,
      textCol: String,
      stopwords: Seq[String],
      pivotLang: String = "en"): DataFrame =
    corpus
      .select(
        col(sourceCol),
        col(langCol),
        size(toks(col(textCol))).cast("long").as("dc_tok"),
        round(graft.textops.TextStats.qualityScore(col(textCol), stopwords), 6).as("dc_q"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum(col("dc_tok")).as("n_tokens"),
        round(
          sum(col("dc_q").cast("decimal(27,18)")).cast("double") / count(lit(1)),
          6).as("mean_quality"),
        round(
          sum(when(col(langCol) === pivotLang, 1L).otherwise(0L)).cast("double") / count(lit(1)),
          6).as(s"${pivotLang}_share"))

  // ---------------------------------------------------------------
  // Cross-document boilerplate (repeated-sentence) removal
  // ---------------------------------------------------------------

  /** Per-doc boilerplate profile: sentences (". "-separated spans,
    * empties dropped) whose corpus-wide document frequency exceeds
    * `maxDf` are boilerplate (nav bars, footers, license blurbs —
    * the CCNet/C4 repeated-line filter at sentence granularity).
    * Output per doc: n_sent, n_boiler (sentence positions whose
    * sentence is boilerplate), boiler_ratio.
    *
    * Scale shape: two keyed aggregations — per-(doc, sentence-hash)
    * explode feeds a sentence-df count (map-side combine; the
    * sentence TEXT never shuffles, only 64-bit xxhash64 keys — the
    * Jaccard family's accepted collision trade), then the df relation
    * joins back on the hash and reduces per doc. Hot sentences are
    * exactly the boilerplate ones, and they arrive pre-aggregated as
    * one (hash, df) row each, so the join can't skew.
    */
  def boilerplateProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Int,
      sepRegex: String = "\\. |\\n"): DataFrame = {
    val sents = df.select(
      col(idCol),
      explode(filter(split(col(textCol), sepRegex), s => length(s) > 0)).as("sent"))
      .select(col(idCol), xxhash64(col("sent")).as("sent_h"))
    // document frequency per sentence hash: distinct docs containing it
    val sdf = sents
      .groupBy(col("sent_h"))
      .agg(countDistinct(col(idCol)).as("sent_df"))
    sents
      .join(sdf, Seq("sent_h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_sent"),
        sum(when(col("sent_df") > maxDf, 1).otherwise(0)).cast("int").as("n_boiler"))
      .withColumn("boiler_ratio", round(col("n_boiler").cast("double") / col("n_sent"), 6))
  }

  /** Cross-document boilerplate REMOVAL — the mutation
    * [[boilerplateProfile]] only measures: rebuild each doc's text
    * with its boilerplate segments (corpus df > `maxDf`) spliced out,
    * preserving segment order (the CCNet repeated-paragraph filter,
    * applied at whatever granularity `sepRegex` cuts). Separator runs
    * normalize to `joinSep` in the rebuilt text; docs whose every
    * segment is boilerplate come back with empty clean_text; docs
    * with NO non-empty segment drop (same convention as chunking).
    *
    * Scale shape: segment df is one hash-keyed aggregation (only
    * 64-bit xxhash64 keys shuffle); the rebuild is the exploded
    * (id, pos, segment) relation joined to the df relation on the
    * hash and re-folded per doc — segment text shuffles ONCE, the
    * same cost class as chunking, and hot segments arrive at the
    * join pre-aggregated as one (hash, df) row so it cannot skew.
    *
    * Output: (id, clean_text, n_seg, n_removed).
    */
  def removeBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Int,
      sepRegex: String = "\\. |\\n",
      joinSep: String = ". "): DataFrame = {
    val segs = df
      .select(
        col(idCol),
        posexplode(filter(split(col(textCol), sepRegex), s => length(s) > 0)).as(Seq("pos", "seg")))
      .withColumn("seg_h", xxhash64(col("seg")))
    val sdf = segs
      .groupBy(col("seg_h"))
      .agg(countDistinct(col(idCol)).as("seg_df"))
    segs
      .join(sdf, Seq("seg_h"))
      .groupBy(col(idCol))
      .agg(
        concat_ws(
          joinSep,
          transform(
            array_sort(collect_list(
              when(col("seg_df") <= maxDf, struct(col("pos"), col("seg"))))),
            s => s.getField("seg"))).as("clean_text"),
        count(lit(1)).cast("int").as("n_seg"),
        sum(when(col("seg_df") > maxDf, 1).otherwise(0)).cast("int").as("n_removed"))
  }

  // ---------------------------------------------------------------
  // Sequence packing
  // ---------------------------------------------------------------

  /** Assign each doc to a fixed-size training sequence ("pack") by
    * running token offset: pack_id = tokens-before div maxTokens,
    * pack_offset = tokens-before mod maxTokens, per partition-column
    * stream ordered by id. Docs may straddle a pack boundary (the
    * writer splits them) — this is the streaming-friendly assignment
    * used when greedy first-fit packing's sequential state is too
    * expensive; it is a pure window cumsum, ONE shuffle on the
    * partition columns. For skewed streams add a shard column
    * (e.g. pmod(id, S)) to `partitionCols` — packing does not need
    * one global stream, only deterministic ones.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      partitionCols: Seq[String],
      maxTokens: Int): DataFrame = {
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol) +: partitionCols.map(col) :+ size(toks(col(textCol))).as("n_tok"): _*)
      .withColumn("cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum div $maxTokens"))
      .withColumn("pack_offset", col("cum") % maxTokens)
      .drop("cum")
  }

  // ---------------------------------------------------------------
  // Gopher/C4-style quality rules
  // ---------------------------------------------------------------

  /** Per-doc quality-rule flags (Gopher word-count/mean-word-length
    * bands, C4 lorem-ipsum and curly-brace filters) and the combined
    * keep decision. Pure per-row expressions — the downstream
    * `filter(col("keep"))` pushes to the scan.
    */
  def qualityRuleFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0): DataFrame = {
    // token array bound once — nTok/sumLen/mean reference it four
    // times, and each unbound toks() reference would re-split the
    // document (the HOF-binding rule q_trigram_ppl's 7× regression
    // established); size/aggregate on the bound column are array
    // reads
    val nTok   = size(col("tt"))
    val sumLen = aggregate(col("tt"), lit(0L), (acc, x) => acc + length(x))
    val mean   = when(nTok > 0, round(sumLen.cast("double") / nTok, 6)).otherwise(0.0)
    df.select(col(idCol), toks(col(textCol)).as("tt"), lower(col(textCol)).as("lt"))
      .select(
        col(idCol),
        nTok.as("n_tok"),
        mean.as("mean_tok_len"),
        col("lt"))
      .select(
        col(idCol),
        col("n_tok"),
        col("mean_tok_len"),
        (col("n_tok") >= minTokens && col("n_tok") <= maxTokens).as("ok_word_count"),
        (col("mean_tok_len") >= minMeanLen && col("mean_tok_len") <= maxMeanLen).as("ok_mean_len"),
        (!col("lt").contains("lorem ipsum")).as("no_lorem"),
        (!col("lt").contains("{")).as("no_brace"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_len") && col("no_lorem") && col("no_brace"))
  }

  /** Agreement card between the two cheap quality filters — the
    * hashed linear classifier ([[hashedLinearScore]]) and the rule
    * bank ([[qualityRuleFlags]]): the 2×2 keep/keep contingency. A
    * mixer reads this before swapping one filter for the other (high
    * off-diagonal mass = the swap changes the corpus). Token-less
    * docs have no classifier verdict and drop (inner join).
    *
    * Scale shape: both inputs are per-row projections + one doc-key
    * aggregation each; the join is doc-keyed; the output is 4 rows.
    */
  def filterAgreement(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 64,
      minTokens: Int = 50,
      maxTokens: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0): DataFrame = {
    val clf = hashedLinearScore(df, idCol, textCol, nBuckets)
      .select(col(idCol), col("keep").as("clf_keep"))
    val rules = qualityRuleFlags(df, idCol, textCol, minTokens, maxTokens, minMeanLen, maxMeanLen)
      .select(col(idCol), col("keep").as("rules_keep"))
    clf.join(rules, Seq(idCol))
      .groupBy(col("clf_keep"), col("rules_keep"))
      .agg(count(lit(1)).cast("bigint").as("n"))
  }

  /** Hashing-trick bag-of-words document vectors (Weinberger et al.
    * 2009's feature hashing; the no-encoder embedding for cheap
    * near-dup and classification when no model is available): each
    * token hashes to one of `nBuckets` slots with a ±1 sign hash
    * (sign cancellation keeps the inner product unbiased). Sparse
    * long form (id, bkt, v) — v sums ±1 per occurrence, exact in
    * doubles.
    *
    * Scale shape: per-row expressions + ONE (id, bucket) hash
    * aggregation with map-side combine — the same single-shuffle
    * class as token counting; no vocabulary state, no model.
    */
  def hashedBowSparse(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 64): DataFrame =
    df.select(col(idCol), explode(toks(col(textCol))).as("token"))
      .withColumn("bkt", (Dedup.hash60(col("token")) % nBuckets).cast("int"))
      .withColumn(
        "sgn",
        when(Dedup.hash60(concat(lit("sgn:"), col("token"))) % 2 === 0, 1.0).otherwise(-1.0))
      .groupBy(col(idCol), col("bkt"))
      .agg(sum(col("sgn")).as("v"))

  /** Dense L2-normalized hashed-BoW vector per document — the
    * [[hashedBowSparse]] entries assembled into an ARRAY<DOUBLE> of
    * length `nBuckets` (zero-filled, unit norm; all-cancelled docs
    * keep the zero vector). Feeds the Similarity operators directly.
    */
  def hashedBowDense(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 64,
      outCol: String = "bow_vec"): DataFrame = {
    val dense = hashedBowSparse(df, idCol, textCol, nBuckets)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bkt"), col("v")))).as("m"))
      .withColumn(
        "raw",
        transform(sequence(lit(0), lit(nBuckets - 1)), b => coalesce(element_at(col("m"), b), lit(0.0))))
      .withColumn("nrm", sqrt(graft.expressions.DotProduct.dotD(col("raw"), col("raw"))))
      .withColumn(outCol, when(col("nrm") === 0.0, col("raw")).otherwise(transform(col("raw"), x => x / col("nrm"))))
      .select(col(idCol), col(outCol))
    dense
  }

  // ---------------------------------------------------------------
  // Paragraph-level exact dedup (C4-style)
  // ---------------------------------------------------------------

  /** Cross-corpus paragraph dedup: split each doc on `sepRegex`, keep
    * only the globally-FIRST occurrence of every distinct paragraph
    * (first = smallest (doc id, position)), report per-doc survival.
    * This is C4's "discard duplicate three-sentence spans" shape —
    * exact dedup below document granularity, where most boilerplate
    * lives.
    *
    * One shuffle keyed by the paragraph text (window rank); per-doc
    * re-aggregation rides the second, much smaller shuffle. Positions
    * are pre-filter ordinals, so empty splits don't renumber.
    *
    * Output: (id, n_para, n_kept, kept_ratio).
    */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String = "\n\n"): DataFrame = {
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), sepRegex)).as(Seq("pos0", "para")))
      .filter(length(col("para")) > 0)
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("para"))
    val w = Window.partitionBy(col("para")).orderBy(col(idCol), col("pos"))
    paras
      .withColumn("rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_para"),
        sum(when(col("rn") === 1, 1).otherwise(0)).cast("int").as("n_kept"))
      .withColumn("kept_ratio", round(col("n_kept").cast("double") / col("n_para"), 6))
  }

  // ---------------------------------------------------------------
  // DSIR-style importance weights (data selection)
  // ---------------------------------------------------------------

  /** Importance weight for data selection à la DSIR (Xie et al.):
    * per-doc log-likelihood ratio between a target-slice unigram LM
    * and a background unigram LM, over a shared top-`vocabK` vocab
    * with an OOV bucket and add-0.5 smoothing. Docs scoring high look
    * like the target domain — the standard cheap filter for "give me
    * more data like this slice" at pretraining scale.
    *
    * Everything is two hash aggregations (token counts) + one
    * broadcast join of the (vocabK+1)-row LM table against the token
    * stream; the per-doc sum is decimal-exact so engines agree
    * bit-for-bit.
    *
    * Output: (id, n_tok, dsir_weight) — weight rounded to 6.
    */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      vocabK: Int = 25): DataFrame = {
    val tokens = df
      .select(col(idCol), isTarget.as("is_t"), explode(toks(col(textCol))).as("token"))
    val counts = tokens
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("cnt_t"))
      .withColumn("cnt_b", col("cnt") - col("cnt_t"))
    val totals = counts.agg(
      sum(col("cnt_t")).as("n_t"),
      sum(col("cnt_b")).as("n_b"))
    val vocab = counts
      .orderBy(desc("cnt"), col("token"))
      .limit(vocabK)
      .select(col("token"), col("cnt_t"), col("cnt_b"))
    // smoothed log-ratio per vocab token; OOV uses zero counts. The
    // +1 in the denominator's vocab size is the OOV bucket itself.
    def lp(cnt: Column, n: Column) =
      log((cnt.cast("double") + 0.5) / (n.cast("double") + 0.5 * (vocabK + 1)))
    tokens
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .withColumn(
        "lr",
        (lp(coalesce(col("cnt_t"), lit(0L)), col("n_t"))
          - lp(coalesce(col("cnt_b"), lit(0L)), col("n_b"))).cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_tok"),
        round(sum(col("lr")).cast("double"), 6).as("dsir_weight"))
  }

  /** Two-bucket-width variant of [[hashedLinearScore]] for
    * model-version A/B reads: both logits from ONE token explosion
    * (the token hash is computed once and bucketed twice), instead of
    * two full corpus tokenizations. Arithmetic is expression-for-
    * expression the single-width path's (same weight formula, same
    * decimal sum, same 6 dp rounding), so the outputs are
    * bit-identical to two separate calls — spec-asserted.
    *
    * Output: (id, logit_a, logit_b).
    */
  def hashedLinearScorePair(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBucketsA: Int,
      nBucketsB: Int): DataFrame = {
    val wA = (0 until nBucketsA).map(b => hashWeight(s"qcw:$b"))
    val wB = (0 until nBucketsB).map(b => hashWeight(s"qcw:$b"))
    val h  = Dedup.hash60(col("token"))
    df.select(col(idCol), explode(toks(col(textCol))).as("token"))
      .withColumn("wa",
        element_at(typedLit(wA), ((h % nBucketsA) + 1).cast("int")).cast("decimal(27,18)"))
      .withColumn("wb",
        element_at(typedLit(wB), ((h % nBucketsB) + 1).cast("int")).cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("wa")).cast("double") / count(lit(1)), 6).as("logit_a"),
        round(sum(col("wb")).cast("double") / count(lit(1)), 6).as("logit_b"))
  }

  /** md5-derived uniform in [-1, 1] for a seed string — the same
    * deterministic construction Similarity.lshPlaneValue uses (no
    * RNG, engine-replayable).
    */
  def hashWeight(seed: String): Double = {
    val md  = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) / 1152921504606846976.0) * 2 - 1
  }

  /** fastText-style hashed linear document scorer (Joulin et al.
    * 2016's bag-of-hashed-tokens architecture — public method): each
    * token hashes into one of `nBuckets` weight slots (the hashing
    * trick), the document logit is the mean bucket weight, and the
    * keep verdict thresholds the logit at 0 (≡ sigmoid ≥ 0.5 — the
    * sigmoid itself is monotone, and exp() is libm-dependent, so the
    * engine-checked value is the logit). This is the quality-filter
    * harness every curation pipeline runs (CCNet / GPT-3's
    * wiki-reference classifier); plug trained weights in via
    * `weights` — the default md5-derived placeholder exercises the
    * full plumbing deterministically.
    *
    * Scale shape: the weight table is nBuckets doubles shipped as a
    * broadcast literal array — scoring is one explode + pure
    * column expressions + one doc-key aggregation (decimal-exact
    * mean). No joins, nothing corpus-sized shuffles.
    *
    * Output: (id, n_tok, logit, keep).
    */
  def hashedLinearScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int = 64,
      weights: Option[Seq[Double]] = None): DataFrame = {
    val w = weights.getOrElse((0 until nBuckets).map(b => hashWeight(s"qcw:$b")))
    require(w.length == nBuckets, s"got ${w.length} weights for $nBuckets buckets")
    val bucket = Dedup.hash60(col("token")) % nBuckets
    df.select(col(idCol), explode(toks(col(textCol))).as("token"))
      .withColumn("w", element_at(typedLit(w), (bucket + 1).cast("int")).cast("decimal(27,18)"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_tok"),
        round(sum(col("w")).cast("double") / count(lit(1)), 6).as("logit"))
      .withColumn("keep", col("logit") >= 0.0)
  }
}
