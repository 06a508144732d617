package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * All hashing is md5-derived (hex → int64), so signatures are
  * engine-portable and deterministic — no JVM hashCode, no seeded
  * RNG (SURVEY §7 hard part (d)).
  *
  * Scale notes: exact dedup is one hash aggregation. MinHash/SimHash
  * signatures are per-row expressions (no shuffle). Pair generation
  * joins only within LSH bands / blocking buckets, which is the
  * standard way these stay sub-quadratic at 100 TB.
  */
object Dedup {

  /** Portable 60-bit hash: first 15 hex chars of md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups by content hash: (hash, keep_id, n_dups). */
  def exactDedupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Survivors of exact dedup: first (min id) row per content hash. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      exactDedupGroups(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol),
      "left_semi")

  /** Per-source exact-duplication card: how much of each source is a
    * byte-identical copy of an EARLIER doc (corpus-wide, min-id
    * first-copy rule — the same survivor convention as
    * [[exactDedup]]): (group, n_docs, n_dup, dup_rate). The
    * which-source-is-redundant reading a mixer takes before paying
    * for a source's full ingest.
    *
    * Scale shape: one hash aggregation on the content hash (the
    * exact-dedup shuffle) + one content-hash join back + one
    * group-keyed fold — no pair space at all.
    */
  def dedupRateBySource(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String): DataFrame = {
    // the survivor convention comes from exactDedupGroups — ONE
    // definition of (content hash, keep id) for every exact-dedup
    // consumer in this file
    val firstCopy = exactDedupGroups(df, idCol, textCol)
      .select(col("content_hash").as("h"), col("keep_id"))
    df.select(col(idCol), col(groupCol), md5(col(textCol).cast("binary")).as("h"))
      .join(firstCopy, Seq("h"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("int").as("n_docs"),
        sum(when(col(idCol) =!= col("keep_id"), 1L).otherwise(0L)).cast("int").as("n_dup"))
      .withColumn("dup_rate", round(col("n_dup").cast("double") / col("n_docs"), 6))
  }

  /** Cross-source duplication matrix: for every exact-duplicate doc
    * (not the first copy), which source it was copied FROM — the
    * provenance card behind [[dedupRateBySource]]'s totals (a high
    * (b→a) cell means source b re-hosts source a's content; the
    * mixer drops b, not a). Same first-copy (min id per content
    * hash) rule as [[exactDedup]].
    *
    * Scale shape: ONE pass — a single window over the content hash
    * derives the survivor (min id, [[exactDedup]]'s rule) and its
    * source in the same lineage (two joined branches would re-execute
    * the corpus scan + hash aggregation per branch), then the copies
    * fold on 2 keys.
    *
    * Output: (src_original, src_copy, n_copies).
    */
  def crossSourceDupMatrix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String): DataFrame = {
    val wH = Window.partitionBy(col("h"))
    df.select(
        col(idCol),
        col(groupCol),
        md5(col(textCol).cast("binary")).as("h"))
      .withColumn("keep_id", min(col(idCol)).over(wH))
      .withColumn(
        "src_original",
        max(when(col(idCol) === col("keep_id"), col(groupCol))).over(wH))
      .filter(col(idCol) =!= col("keep_id"))
      .groupBy(col("src_original"), col(groupCol).as("src_copy"))
      .agg(count(lit(1)).cast("bigint").as("n_copies"))
  }

  /** NEAR-dup cross-source matrix — [[crossSourceDupMatrix]] for
    * corpora whose duplication is paraphrase/re-host rather than
    * byte-identical (the common case: exact-dup matrices come out
    * empty while the near-dup pair space is busy). Pairs come from
    * [[ngramJaccardPairsCapped]] at `minJaccard`; within a pair the
    * LOWER id is billed as the original (the same first-copy
    * convention every dedup card here uses), so a (a→b) cell reads
    * "source b near-copies source a".
    *
    * Scale shape: the pair emitter is the df-capped inverted shingle
    * index (never a doc×doc self-join); the two provenance lookups
    * are equi-joins of the SMALL pair table against the (id, source)
    * projection — at lake scale pairs ≪ docs, and Spark's planner
    * sees that after the pair aggregation. Output:
    * (src_original, src_copy, n_pairs).
    */
  def crossSourceNearDupMatrix(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      sourceCol: String,
      n: Int = 3,
      maxDf: Int = 1000,
      minJaccard: Double = 0.5): DataFrame = {
    val pairs = ngramJaccardPairsCapped(df, bucketCol, idCol, textCol, n, maxDf)
      .filter(col("jaccard") >= minJaccard)
    val src = df.select(col(idCol), col(sourceCol))
    pairs
      .join(src.select(col(idCol).as("id_a"), col(sourceCol).as("src_original")), Seq("id_a"))
      .join(src.select(col(idCol).as("id_b"), col(sourceCol).as("src_copy")), Seq("id_b"))
      .groupBy(col("src_original"), col("src_copy"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
  }

  /** Edit-distance VERIFICATION of near-dup candidates — the
    * second stage of the real dedup pipeline (sketches nominate,
    * an exact measure confirms): take the candidate pairs from the
    * df-capped shingle index at a permissive `candJaccard`, compute
    * true Levenshtein distance on the pair texts, and keep pairs
    * whose normalized edit similarity 1 − d/max(|a|,|b|) clears
    * `minEditSim`. Shingle Jaccard is order-blind and can false-
    * positive on token permutations; edit distance is the
    * order-sensitive confirmation.
    *
    * Scale shape: Levenshtein is O(|a|·|b|) per pair — the whole
    * point of this operator is that it runs ONLY on the candidate
    * set (bounded by the df-cap, ≪ N²), never the corpus cross
    * product. Texts reach the verify stage through two equi-joins of
    * the small pair table against the (id, text) projection; the
    * distance itself is Spark's codegen'd `levenshtein`.
    *
    * Output: (bucket, id_a, id_b, jaccard, edit_dist, edit_sim).
    */
  def editVerifiedPairs(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDf: Int = 1000,
      candJaccard: Double = 0.2,
      minEditSim: Double = 0.5): DataFrame = {
    val cands = ngramJaccardPairsCapped(df, bucketCol, idCol, textCol, n, maxDf)
      .filter(col("jaccard") >= candJaccard)
    val txt = df.select(col(idCol), col(textCol))
    cands
      .join(txt.select(col(idCol).as("id_a"), col(textCol).as("text_a")), Seq("id_a"))
      .join(txt.select(col(idCol).as("id_b"), col(textCol).as("text_b")), Seq("id_b"))
      .withColumn("edit_dist", levenshtein(col("text_a"), col("text_b")))
      .withColumn(
        "edit_sim",
        round(lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("text_a")), length(col("text_b"))), 6))
      .filter(col("edit_sim") >= minEditSim)
      .select(col(bucketCol), col("id_a"), col("id_b"), col("jaccard"), col("edit_dist"), col("edit_sim"))
  }

  /** Exact-duplicate cluster-size histogram: group byte-identical
    * texts, then histogram the cluster sizes — the shape-of-
    * duplication card (many size-2 clusters = scattered reposts; a
    * few huge clusters = a template or a crawler loop) that decides
    * whether exact dedup alone recovers most of the waste.
    *
    * Scale shape: two hash aggregations (content hash → size,
    * size → cluster count), both with map-side combine; the second
    * input is one row per DISTINCT text. No pair space.
    *
    * Output: (cluster_size, n_clusters, n_docs) ordered by size.
    */
  def dupClusterHist(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedupGroups(df, idCol, textCol)
      .groupBy(col("n_dups").as("s"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(
        col("s").cast("int").as("cluster_size"),
        col("n_clusters").cast("bigint").as("n_clusters"),
        (col("s") * col("n_clusters")).cast("bigint").as("n_docs"))
      .orderBy(col("cluster_size"))

  /** Whitespace tokens, empties dropped. */
  def tokensCol(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Distinct word n-gram shingles from a PRE-PROJECTED tokens column.
    * Callers must bind `toks` as its own column first: a Column
    * subtree referenced inside a lambda is re-evaluated per element,
    * so passing `tokensCol(text)` directly here would re-split the
    * document once per shingle (O(doc²)).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Convenience for small inputs/tests; hot paths should project
    * tokens first (see shinglesFromTokens).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokensCol(text), n)

  /** Shingles as a single Scala function call — the hot-path variant.
    * Measured ~6× faster than the HOF chain at sf0.1: the array
    * lambdas run interpreted and CollapseProject re-inlines the
    * subtree into every consumer; one deterministic function per row
    * avoids both. Output is exactly shingles(text, n) (asserted in
    * TextOpsSpec).
    */
  def shinglesFast(text: Column, n: Int): Column = {
    val f = udf((t: String) => {
      val toks  = if (t == null) Array.empty[String] else t.split(" ").filter(_.nonEmpty)
      val limit = math.max(toks.length - (n - 1), 1)
      val seen  = new java.util.LinkedHashSet[String]()
      var i     = 0
      while (i < limit) { seen.add(toks.slice(i, i + n).mkString(" ")); i += 1 }
      seen.toArray(new Array[String](seen.size)).toSeq
    })
    f(text)
  }

  /** Distinct shingles as 64-bit hashes — the hot-path form the pair
    * pipelines explode. A native codegen'd expression
    * (graft.expressions.ShingleHashes): tokenizes the raw UTF-8 bytes
    * in place (no UDF encoder boundary, no string array, no separate
    * xxhash64 projection) and emits sorted distinct XXH64 hashes,
    * seed 42 — the same values xxhash64 computes over the string
    * shingles (asserted in TextOpsSpec). 64-bit hashes keep collision
    * odds ~1e-10 at millions of distinct shingles.
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.expressions.ShingleHashes.shingleHashes(text, lit(n))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * the MOSS local-similarity sketch; public algorithm, reimplemented
    * from the formula): hash every positional word n-gram, slide a
    * w-gram window, keep each window's minimum; ties break to the
    * leftmost position. Guarantees every ≥(w+n−1)-token exact overlap
    * between two docs shares a fingerprint — the structural complement
    * to MinHash (whole-doc similarity) for plagiarism-style local-copy
    * detection.
    *
    * Determinism + SQL parity: the window minimum runs over ONE
    * combined key hash·2²⁰ + pos (hash = 40-bit md5 prefix, pos < 2²⁰
    * — docs are chunked well below a million grams), so min() alone
    * encodes the (min-hash, leftmost) rule and both engines decode the
    * same (pos, hash) pair with shifts/masks.
    *
    * Scale shape: one shuffle (doc key) feeding both the per-doc gram
    * count and the running window min; output is the distinct selected
    * fingerprints, ~n_grams/w rows per doc. Fingerprint → posting-list
    * join (ngramJaccardPairs' inverted-index pattern) is the pair
    * stage at lake scale.
    */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      w: Int = 4): DataFrame =
    df.select(
      col(idCol),
      explode(winnowFast(col(textCol), n, w)).as("fp"))
      .select(col(idCol), col("fp._1").as("fp_pos"), col("fp._2").as("fp_hash"))

  /** Exact-substring near-dup pairs — the role of suffix-array
    * training-data dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"; public method): find doc
    * pairs sharing a long contiguous token run and certify its
    * length. Built on winnowing fingerprints because their positions
    * are CONTENT-defined: a shared region selects the same
    * fingerprints in both docs at any offset, where a strided gram
    * grid only collides when the offset difference happens to be a
    * stride multiple.
    *
    * Pipeline: fingerprints → df-capped postings on fp_hash (the
    * same hot-key guard as every pair emitter here) → pair hits with
    * positions → per (pair, diagonal = pos_a − pos_b) gap-bounded
    * islands (winnowing guarantees consecutive selected fingerprints
    * inside a fully-shared region are ≤ w grams apart, so a gap > w
    * breaks the run) → per pair the longest island span
    * (max − min + n tokens) and total shared fingerprints, top-K by
    * span with a total tie order.
    *
    * Scale: fingerprints are ~n_grams/w rows per doc; postings
    * bounded by maxDf² fan-out per hash; islands are one window over
    * pair-hit rows (collision-sized, not corpus-sized). All-integer
    * arithmetic end to end — engine-exact under the DuckDB gate.
    */
  def substringDedupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      w: Int = 4,
      maxDf: Int = 20,
      topK: Int = 20): DataFrame =
    sharedRuns(df, idCol, textCol, n, w, maxDf)
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        max(col("p1") - col("p0") + n).cast("int").as("max_shared_tokens"),
        sum(col("n_fp")).cast("int").as("n_shared_fps"))
      .orderBy(desc("max_shared_tokens"), col("id_a"), col("id_b"))
      .limit(topK)

  /** Shared substrate of [[substringDedupPairs]] and
    * [[removeDuplicateSpans]]: diagonal-gapped fingerprint islands
    * per pair — (id_a, id_b, diag, run_id, p0, p1, n_fp), positions
    * on id_a's gram axis (id_b's = pos − diag).
    */
  private def sharedRuns(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      w: Int,
      maxDf: Int): DataFrame = {
    val fp   = winnowFingerprints(df, idCol, textCol, n, w)
    val wDf  = Window.partitionBy(col("fp_hash"))
    val kept = fp.withColumn("df", count(lit(1)).over(wDf)).filter(col("df") > 1 && col("df") <= maxDf)
    val a    = kept.select(col("fp_hash"), col(idCol).as("id_a"), col("fp_pos").as("pos_a"))
    val b    = kept.select(col("fp_hash"), col(idCol).as("id_b"), col("fp_pos").as("pos_b"))
    val hits = a
      .join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"), (col("pos_a") - col("pos_b")).as("diag"))
      .distinct()
    val wRun = Window.partitionBy(col("id_a"), col("id_b"), col("diag")).orderBy(col("pos_a"))
    hits
      .withColumn("prev", lag(col("pos_a"), 1).over(wRun))
      .withColumn("brk", when(col("prev").isNull || col("pos_a") - col("prev") > w, 1).otherwise(0))
      .withColumn("run_id", sum(col("brk")).over(wRun))
      .groupBy(col("id_a"), col("id_b"), col("diag"), col("run_id"))
      .agg(min(col("pos_a")).as("p0"), max(col("pos_a")).as("p1"), count(lit(1)).as("n_fp"))
  }

  /** Duplicate-span REMOVAL — the operation of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better",
    * §3 ExactSubstr, public method): a long token run that also
    * appears in another document is CUT from all but one copy,
    * rather than dropping whole near-dup documents. Keep-first
    * policy — the run survives in the smaller doc id, every later id
    * loses it (3+ copies resolve consistently: each later copy pairs
    * with the first and cuts the same span).
    *
    * The winnowing islands ([[sharedRuns]]) only NOMINATE candidate
    * windows — their ±w-gram resolution can bridge two sub-threshold
    * shared halves across a small edit (the one-token-edit near-dup
    * would be emptied). Every candidate window is therefore
    * TOKEN-VERIFIED: the two docs' token runs are compared
    * position-by-position, and only maximal exactly-equal runs of
    * ≥ `minTokens` within one alignment are cut — true ExactSubstr
    * semantics. Edges stay conservative (a shared run extending past
    * the nominated window keeps its uncovered tail).
    *
    * maxDf bounds the pair stage like every posting emitter here —
    * which means content duplicated in MORE than maxDf places is
    * exempt from span removal BY DESIGN. That is the right division
    * of labor, not a gap: ≥maxDf-fold boilerplate is exactly what
    * the upstream whole-doc and paragraph passes
    * ([[exactDedup]], `Curation.paragraphDedup`) eliminate wholesale
    * and cheaply; this operator handles the long tail of pairwise
    * shared runs those passes cannot see.
    *
    * Scale shape: posting-bounded candidates (maxDf² fan-out); the
    * verification explodes candidate-window positions (rows bounded
    * by total nominated duplicate content, never the corpus), one
    * gaps-and-islands window keyed (doc, partner, alignment), one
    * span groupBy(doc) + equi-join back to the corpus, and a per-row
    * index-aware HOF filter over the token array. No non-equi join,
    * no per-token shuffle.
    *
    * Output: (id, n_tok, n_removed, clean_text) for EVERY input doc.
    */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 50,
      n: Int = 3,
      w: Int = 4,
      maxDf: Int = 20): DataFrame = {
    val tk = df.select(col(idCol), tokensCol(col(textCol)).as("tk"))
    // candidate windows on both token axes (id_a < id_b by
    // construction): gram p covers tokens p..p+n−1
    val cand = sharedRuns(df, idCol, textCol, n, w, maxDf)
      .filter(col("p1") - col("p0") + n >= minTokens)
      .select(
        col("id_a"), col("id_b"), col("diag"),
        col("p0").as("sa"),
        (col("p0") - col("diag")).as("sb"),
        (col("p1") - col("p0") + n).as("len"))
    // token-verify each window: eq(i) ⟺ the i-th tokens agree
    val verified = cand
      .join(tk.select(col(idCol).as("id_a"), col("tk").as("tk_a")), Seq("id_a"))
      .join(tk.select(col(idCol).as("id_b"), col("tk").as("tk_b")), Seq("id_b"))
      .select(
        col("id_b"), col("id_a"), col("diag"), col("sb"),
        posexplode(
          zip_with(
            slice(col("tk_a"), col("sa"), col("len")),
            slice(col("tk_b"), col("sb"), col("len")),
            (x, y) => x === y)).as(Seq("off", "ok")))
      .filter(col("ok"))
      .select(col("id_b"), col("id_a"), col("diag"), (col("sb") + col("off")).as("p"))
      .distinct() // overlapping windows of one alignment nominate a position twice
    // maximal verified runs within ONE (partner, alignment) — two
    // different partners' runs must not concatenate into a phantom
    // long span
    val wI = Window.partitionBy(col("id_b"), col("id_a"), col("diag")).orderBy(col("p"))
    val spans = verified
      .withColumn("grp", col("p") - row_number().over(wI))
      .groupBy(col("id_b"), col("id_a"), col("diag"), col("grp"))
      .agg(min(col("p")).cast("int").as("s"), max(col("p")).cast("int").as("e"))
      .filter(col("e") - col("s") + 1 >= minTokens)
      .groupBy(col("id_b"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
      .select(col("id_b").as(idCol), col("spans"))
    val withTk = tk
      .join(spans, Seq(idCol), "left")
      .withColumn("spans", coalesce(col("spans"), array().cast("array<struct<s:int,e:int>>")))
    // keep the token at 0-based index i unless SOME span covers
    // 1-based position i+1; spans per doc are few, the scan is flat
    val keptToks = filter(
      col("tk"),
      (t, i) =>
        !exists(col("spans"), r => i + 1 >= r.getField("s") && i + 1 <= r.getField("e")))
    withTk
      .withColumn("kept", keptToks)
      .select(
        col(idCol),
        size(col("tk")).as("n_tok"),
        (size(col("tk")) - size(col("kept"))).as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  /** Expression-form winnowing — the SQL-shaped reference the fast
    * path is asserted against (TextOpsSpec), and the literal shape of
    * the DuckDB oracle. Costs a window shuffle on the doc key that
    * winnowFast avoids entirely; not the hot path.
    */
  def winnowFingerprintsExpr(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      w: Int = 4): DataFrame = {
    val grams = df
      .select(col(idCol), tokensCol(col(textCol)).as("t"))
      .select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(1), greatest(size(col("t")) - (n - 1), lit(1))),
            i => concat_ws(" ", slice(col("t"), i, lit(n))))).as(Seq("p0", "gram")))
      .select(
        col(idCol),
        (col("p0") + 1).as("pos"),
        (conv(substring(md5(col("gram").cast("binary")), 1, 10), 16, 10).cast("long") * lit(1048576L)
          + col("p0") + 1).as("cmb"))
    val byDoc = Window.partitionBy(col(idCol))
    val win   = byDoc.orderBy(col("pos")).rowsBetween(0, w - 1)
    grams
      .withColumn("ng", count(lit(1)).over(byDoc))
      .withColumn("sel", min(col("cmb")).over(win))
      .filter(col("pos") <= greatest(col("ng") - (w - 1), lit(1)))
      .select(col(idCol), col("sel"))
      .distinct()
      .select(
        col(idCol),
        col("sel").bitwiseAND(1048575L).cast("int").as("fp_pos"),
        shiftright(col("sel"), 20).as("fp_hash"))
  }

  /** Jaccard-similar candidate pairs within a blocking bucket:
    * |A∩B| / |A∪B| over distinct shingles.
    *
    * Implemented as an inverted shingle index, not an all-pairs
    * nested loop: explode distinct shingle hashes, count common
    * shingles per colliding pair. Pairs with zero overlap are never
    * materialized, so cost scales with actual shingle collisions —
    * the only formulation that survives 100 TB (the n² loop dies at
    * thousands of docs per bucket).
    *
    * One shuffle keyed (bucket, shingle) serves both the df count
    * (window) and the posting-list aggregation (exchange-free after
    * the window), so singleton shingles — the vast majority — never
    * reach the ObjectHashAggregate that builds posting lists.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val withSh = df
      .select(col(bucketCol), col(idCol), shingleHashes(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = withSh
      .select(col(bucketCol), col(idCol), col("sz"), explode(col("sh")).as("shingle"))
    val wSh = Window.partitionBy(col(bucketCol), col("shingle"))
    val kept = inv
      .withColumn("df", count(lit(1)).over(wSh))
      .filter(col("df") > 1)
    pairsFromInvertedIndex(
      kept.select(col(bucketCol), col(idCol), col("sz"), col("shingle")),
      bucketCol, idCol, maxDf = Int.MaxValue)
  }

  /** Jaccard pairs over the DF-CAPPED shingle space: shingles whose
    * document frequency (within the bucket) exceeds `maxDf` are
    * excluded from BOTH the candidate index and the per-doc set size,
    * i.e. similarity is Jaccard over rare shingles only.
    *
    * This is the hot-key guard a 100 TB dedup needs: a boilerplate
    * shingle shared by millions of docs would otherwise emit O(df²)
    * pairs from one posting list. Capping bounds every posting list,
    * so worst-case pair fan-out per shingle is maxDf², independent of
    * lake size — and dropping ubiquitous shingles from the measure
    * also stops boilerplate from inflating similarity. Deterministic:
    * the df threshold is computed exactly, no sampling.
    */
  def ngramJaccardPairsCapped(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDf: Int = 1000): DataFrame = {
    val inv = df
      .select(col(bucketCol), col(idCol), explode(shingleHashes(col(textCol), n)).as("shingle"))
    // df per (bucket, shingle): one partitioned window count (the same
    // shuffle key the posting-list groupBy uses downstream)
    val wSh = Window.partitionBy(col(bucketCol), col("shingle"))
    val withDf = inv.withColumn("df", count(lit(1)).over(wSh))
    val rare   = withDf.filter(col("df") <= maxDf)
    // capped per-doc set size via groupBy, not a second window: the
    // window would re-sort the full inverted index by (bucket, id);
    // the aggregation partial-combines map-side and its join lands on
    // the df>1 survivors only — a tiny fraction of the index
    val sizes = rare
      .groupBy(col(bucketCol), col(idCol))
      .agg(count(lit(1)).cast("int").as("sz"))
    // df==1 shingles can never produce a pair (they're still counted
    // in sz above), so drop them before the posting-list agg
    val kept = rare
      .filter(col("df") > 1)
      .join(sizes, Seq(bucketCol, idCol))
    pairsFromInvertedIndex(kept.select(col(bucketCol), col(idCol), col("sz"), col("shingle")), bucketCol, idCol, maxDf)
  }

  /** Shingle-containment near-dup pairs — the asymmetric cousin of
    * [[ngramJaccardPairsCapped]] for QUOTE/SUBSET detection:
    * containment C = |A∩B| / min(|A|,|B|) flags a short doc embedded
    * verbatim in a long one, which Jaccard structurally cannot
    * (|A∩B|/|A∪B| → 0 as the host grows — a 200-token article
    * quoted inside a 20k-token page has Jaccard ≈ 0.01 but
    * containment ≈ 1.0; Broder 1997 defines both measures for
    * exactly this reason). Emits pairs with containment ≥ `minC`,
    * with Jaccard attached for calibration.
    *
    * Scale shape identical to the capped Jaccard path: ONE inverted
    * shingle index (never a doc×doc self-join), per-shingle postings
    * df-capped at `maxDf` so a boilerplate shingle shared by a
    * million docs emits zero pairs instead of 10¹² — pair volume is
    * bounded by postings × maxDf; sizes ride the same aggregation
    * chain. Output: (bucket, id_a, id_b, containment, jaccard),
    * id_a < id_b.
    */
  def containmentPairs(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDf: Int = 1000,
      minC: Double = 0.5): DataFrame = {
    val inv = df
      .select(col(bucketCol), col(idCol), explode(shingleHashes(col(textCol), n)).as("shingle"))
    val wSh    = Window.partitionBy(col(bucketCol), col("shingle"))
    val withDf = inv.withColumn("df", count(lit(1)).over(wSh))
    val rare   = withDf.filter(col("df") <= maxDf)
    val sizes = rare
      .groupBy(col(bucketCol), col(idCol))
      .agg(count(lit(1)).cast("int").as("sz"))
    val kept = rare
      .filter(col("df") > 1)
      .join(sizes, Seq(bucketCol, idCol))
    pairCountsFromInvertedIndex(
      kept.select(col(bucketCol), col(idCol), col("sz"), col("shingle")), bucketCol, idCol, maxDf)
      .withColumn("containment", col("ni") / least(col("sz_a"), col("sz_b")))
      .withColumn("jaccard", col("ni") / (col("sz_a") + col("sz_b") - col("ni")))
      .filter(col("containment") >= minC)
      .select(
        col(bucketCol), col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Ordered pairs (i < j) from a sorted array column, shaped by
    * `pair`. Shared by every posting-list pair emitter.
    */
  private def orderedPairs(arr: Column, pair: (Column, Column) => Column): Column =
    flatten(
      transform(
        arr,
        (x, i) =>
          transform(
            slice(arr, i + 2, greatest(size(arr) - (i + 1), lit(0))),
            y => pair(x, y))))

  /** Shared pair-emission core: group each shingle's postings and
    * emit ordered pairs from the sorted list — the inverted index is
    * computed ONCE (a self-join would re-evaluate the whole shingle
    * pipeline per side). Input: (bucket, id, sz, shingle) rows.
    */
  /** Shared pair-count core: (bucket, id_a, id_b, sz_a, sz_b, ni)
    * from a (bucket, id, sz, shingle) inverted index — every
    * set-overlap measure (Jaccard, containment) derives from these
    * five numbers, so the posting-group/pair-emission/count chain
    * lives ONCE.
    */
  private def pairCountsFromInvertedIndex(
      inv: DataFrame,
      bucketCol: String,
      idCol: String,
      maxDf: Int): DataFrame = {
    val grouped = inv
      .groupBy(col(bucketCol), col("shingle"))
      .agg(array_sort(collect_list(struct(col(idCol).as("id"), col("sz").as("s")))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxDf)
    val pairs = grouped.select(
      col(bucketCol),
      explode(orderedPairs(col("ds"), (x, y) =>
        struct(
          x.getField("id").as("id_a"),
          x.getField("s").as("sz_a"),
          y.getField("id").as("id_b"),
          y.getField("s").as("sz_b")))).as("p"))
    pairs
      .groupBy(
        col(bucketCol),
        col("p.id_a").as("id_a"),
        col("p.id_b").as("id_b"),
        col("p.sz_a").as("sz_a"),
        col("p.sz_b").as("sz_b"))
      .agg(count(lit(1)).cast("double").as("ni"))
  }

  private def pairsFromInvertedIndex(
      inv: DataFrame,
      bucketCol: String,
      idCol: String,
      maxDf: Int): DataFrame =
    pairCountsFromInvertedIndex(inv, bucketCol, idCol, maxDf)
      .withColumn("jaccard", col("ni") / (col("sz_a") + col("sz_b") - col("ni")))
      .select(col(bucketCol), col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** MinHash signature from a PRE-PROJECTED shingles column: for each
    * of `numHashes` seeded hash functions, the minimum hash over the
    * doc's shingles. Pure per-row expression → ARRAY<LONG>.
    */
  def minhashFromShingles(sh: Column, numHashes: Int = 8): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, g => hash60(concat(g, lit("#"), s.cast("string"))))))

  /** Convenience for small inputs/tests (re-derives shingles inline). */
  def minhashSignature(text: Column, shingleN: Int = 3, numHashes: Int = 8): Column =
    minhashFromShingles(shingles(text, shingleN), numHashes)

  /** LSH band keys from a MinHash signature: md5 over each band's
    * slice. Docs sharing a band key are near-dup candidates; the
    * candidate join is an equi-join on (band_idx, band_key).
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows))).cast("binary")))

  /** Candidate near-dup pairs via MinHash LSH banding, with a
    * document-frequency cap per band bucket.
    *
    * NOT a band self-join: a hot band key (mass-duplicated
    * boilerplate) would emit df² rows before any filter could run.
    * Instead the band keys form posting lists — the same df-capped
    * inverted-index shape as [[ngramJaccardPairsCapped]]: one window
    * count on (band_idx, band_key) (the same key the posting-list
    * groupBy shuffles on, so it's ONE exchange), drop buckets with
    * df > maxDf entirely, then emit ordered pairs from each sorted
    * posting list. Worst-case fan-out per bucket is maxDf²,
    * independent of lake size; a bucket of N identical docs with
    * N > maxDf emits ZERO pairs instead of N². Docs dropped from one
    * hot band still pair through their other bands — and truly
    * mass-duplicated docs are exact dups, which [[exactDedupGroups]]
    * catches in one hash agg before LSH ever runs.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 2,
      maxDf: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val keyed = df
      .select(col(idCol), shinglesFast(col(textCol), shingleN).as("sh"))
      .select(col(idCol), minhashFast(col("sh"), numHashes).as("sig"))
      .select(col(idCol), posexplode(lshBandKeys(col("sig"), bands, rows)).as(Seq("band_idx", "band_key")))
    val wB = Window.partitionBy(col("band_idx"), col("band_key"))
    val kept = keyed
      .withColumn("df", count(lit(1)).over(wB))
      .filter(col("df") > 1 && col("df") <= maxDf)
    kept
      .groupBy(col("band_idx"), col("band_key"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .select(
        col("band_idx"),
        explode(orderedPairs(col("ids"), (x, y) =>
          struct(x.as("id_a"), y.as("id_b")))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"), col("band_idx"))
      .distinct()
  }

  /** Persisted MinHash band index of a corpus: one row per (doc,
    * band) carrying a single combined band key (band_idx folded into
    * the key so joins and bucketing use ONE column) plus the full
    * signature (so a later probe can estimate similarity without
    * ever re-reading corpus text). This is the artifact an
    * incremental ingest pipeline writes ONCE at corpus build — via
    * `Sinks.writeBucketed(_, table, "band_key", n)` — and every
    * daily batch probes with no index-side exchange.
    */
  def bandIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 2): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    df.select(col(idCol), shinglesFast(col(textCol), shingleN).as("sh"))
      .select(col(idCol), minhashFast(col("sh"), numHashes).as("sig"))
      .select(
        col(idCol), col("sig"),
        posexplode(lshBandKeys(col("sig"), bands, rows)).as(Seq("band_idx", "band_key")))
      .select(col(idCol), col("sig"), concat_ws(":", col("band_idx"), col("band_key")).as("band_key"))
  }

  /** Incremental near-dup probe: candidate (new doc, indexed doc)
    * pairs whose MinHash-ESTIMATED similarity (fraction of agreeing
    * hashes, err ~1/√numHashes) clears `minEst` — the daily-ingest
    * shape at 100 TB. The corpus NEVER re-shuffles and its text is
    * never re-read: the bucketed index's band_key layout satisfies
    * the join's distribution, so only the (small) new batch's band
    * rows move — broadcast under the threshold, one batch-side
    * exchange above it. Signature agreement is computed in the join
    * output map-side; duplicate candidates from multiple shared
    * bands collapse in the final distinct over already-thresholded
    * rows. Must be called with the same shingleN/numHashes/bands the
    * index was built with.
    */
  def probeBandIndex(
      newBatch: DataFrame,
      index: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 2,
      minEst: Double = 0.5): DataFrame = {
    val probe = bandIndex(newBatch, idCol, textCol, shingleN, numHashes, bands)
      .select(col(idCol).as("new_id"), col("sig").as("new_sig"), col("band_key"))
    val est = size(filter(zip_with(col("new_sig"), col("sig"), (a, b) => a === b), x => x))
      .cast("double") / numHashes
    probe
      .join(index, Seq("band_key"))
      // re-probing a batch already in the index must not self-pair
      .filter(col("new_id") =!= col(idCol))
      .select(col("new_id"), col(idCol), round(est, 6).as("est_sim"))
      .filter(col("est_sim") >= minEst)
      .distinct()
  }

  /** Sketch-quality gauge: MinHash-estimated Jaccard vs the exact
    * n-gram Jaccard on the top-k most similar pairs — the calibration
    * check that tells you whether `numHashes` is adequate BEFORE
    * trusting LSH banding on the full lake (est error ~1/√numHashes).
    * The exact side reuses the inverted-index pair pipeline; the
    * k-row pair list then broadcasts into the signature join.
    * Output: (bucket, id_a, id_b, jaccard, est, abs_err).
    */
  def minhashEstVsExact(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 8,
      k: Int = 20): DataFrame = {
    val pairs = ngramJaccardPairs(df, bucketCol, idCol, textCol, n)
      .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
      .limit(k)
    val sigs = df
      .select(col(idCol), shinglesFast(col(textCol), n).as("sh"))
      .select(col(idCol), minhashFast(col("sh"), numHashes).as("sig"))
    val est = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
      .cast("double") / numHashes
    broadcast(pairs)
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(
        col(bucketCol), col("id_a"), col("id_b"), col("jaccard"),
        round(est, 6).as("est"),
        round(abs(est - col("jaccard")), 6).as("abs_err"))
  }

  /** Connected components over an undirected pair list by iterative
    * min-label propagation: every node starts labeled with its own
    * id; each round every node takes the minimum label among itself
    * and its neighbors; fixpoint = per-component minimum id.
    *
    * Scale: each round is one shuffle (edge ⋈ label + groupBy), and
    * rounds needed = graph diameter. Near-dup graphs are unions of
    * near-cliques (LSH bands / high-Jaccard pairs), so diameter is
    * tiny and this converges in 2-3 rounds regardless of lake size —
    * the per-round relations stay fully distributed. Labels persist
    * per round (lineage stays O(1) deep via cache), and each round
    * path-halves (label ← label(label)), so even adversarial
    * chain-shaped components need only O(log diameter) rounds.
    *
    * Deterministic: min over ids, no RNG — same labels on any
    * partitioning/cluster size.
    *
    * @param nodes one row per node (singletons keep their own label)
    * @param pairs undirected edges (aCol, bCol); direction/dups fine
    * @return (idCol, cluster_id) with cluster_id = min node id in the
    *         component
    */
  def connectedComponents(
      nodes: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 25): DataFrame = {
    // both edge directions from ONE pass over the pair pipeline
    // (a union of two selects would evaluate the upstream — here the
    // whole Jaccard pair generation — once per branch). Pre-hashed on
    // the probe key cc_v: the cached plan keeps that outputPartitioning,
    // so the per-round edges ⋈ labels join never reshuffles the edge
    // set — only the (much smaller) label deltas move each round.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("cc_u"), col(bCol).as("cc_v")),
        struct(col(bCol).as("cc_u"), col(aCol).as("cc_v")))).as("e"))
      .select(col("e.cc_u").as("cc_u"), col("e.cc_v").as("cc_v"))
      .distinct()
      .repartition(col("cc_v"))
      .persist()
    // round-0 labels: checkpointed like every later round, so the
    // node frame's own lineage (which can be arbitrarily heavy —
    // DBSCAN hands in a filtered role relation) never re-enters a
    // round's plan
    var labels = nodes
      .select(col(idCol).as("cc_id"), col(idCol).as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var iter      = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("cc_v") === labels("cc_id"))
        .groupBy(col("cc_u"))
        .agg(min(col("cluster_id")).as("cc_nbr_min"))
      // propagation: min over self + neighbors' previous labels
      val prop = labels
        .join(nbrMin, labels("cc_id") === nbrMin("cc_u"), "left")
        .select(
          col("cc_id"),
          least(col("cluster_id"), coalesce(col("cc_nbr_min"), col("cluster_id"))).as("cc_mid"),
          col("cluster_id").as("cc_prev"))
      // path halving: follow the propagated label one hop through the
      // previous round's labels (label(v) ← label(label(v))). Labels
      // only decrease within a component, so correctness is unchanged,
      // but chain-shaped components converge in O(log diameter)
      // rounds instead of O(diameter) — the worst case a lake-scale
      // near-dup graph (A≈B≈C≈… drift chains) actually hits.
      // Round 0 skips the hop: labels are still the identity map, so
      // label(label(v)) = label(v) and the join would be a full-size
      // no-op shuffle.
      val halved =
        if (iter == 0) prop.select(col("cc_id"), col("cc_mid").as("cc_next"), col("cc_prev"))
        else {
          val hop = labels
            .select(col("cc_id").as("cc_hop_id"), col("cluster_id").as("cc_hop_lbl"))
          prop
            .join(hop, prop("cc_mid") === hop("cc_hop_id"), "left")
            .select(
              col("cc_id"),
              least(col("cc_mid"), coalesce(col("cc_hop_lbl"), col("cc_mid"))).as("cc_next"),
              col("cc_prev"))
        }
      // localCheckpoint (eager), not persist: `halved` references
      // `labels` TWICE (propagation + the halving hop), so the
      // LOGICAL plan doubles every round — persist caches row data
      // but analysis still walks the full uncached tree, and with a
      // heavy pair-generation lineage at the leaves (e.g. DBSCAN's
      // bucket-bounded cosine pairs) round k's analysis cost is
      // 2^k × that subtree: driver OOM by round ~5 on exactly the
      // long-diameter graphs that need many rounds. Checkpointing
      // truncates the lineage, making every round's plan constant
      // size. Superseded rounds' blocks free on driver GC rather
      // than eagerly — a DELIBERATE trade: the eager-release
      // alternative (persist + createDataFrame(df.rdd, schema)
      // re-wrap, which keeps an unpersist handle) pays an
      // InternalRow→Row→InternalRow conversion of the whole label
      // relation EVERY round (measured +30% on q_dbscan; at 10B rows
      // it dominates), while deferred blocks are bounded by
      // convergence rounds (≤ ~6 with halving) × 24 B/row of
      // MEMORY_AND_DISK — GBs per 1000-node-cluster executor worst
      // case, reclaimed by periodic driver GC.
      val next = halved.localCheckpoint()
      val t0      = System.nanoTime()
      val changed = next.filter(col("cc_next") =!= col("cc_prev")).count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] round $iter changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
      labels = next.select(col("cc_id"), col("cc_next").as("cluster_id"))
      converged = changed == 0
      iter += 1
    }
    if (!converged) {
      edges.unpersist()
      // maxIter-exceeded FALLBACK (r15 VERDICT #5): the error path
      // used to tell users to "use alternating large-star/small-star"
      // — which now exists. Path-halving's round count is
      // O(log diameter) but still diameter-DEPENDENT through the
      // constant; star contraction's O(log² n) bound is independent
      // of component shape, so it finishes exactly the adversarial
      // chain graphs that truncate here. Loud on stderr, never
      // silent: the fallback costs more per round (an exact set-compare
      // fixpoint check), so a production run that lands here should
      // know its graph shape.
      System.err.println(
        s"[cc] path-halving hit maxIter=$maxIter without fixpoint — falling back to " +
          "alternating large-star/small-star (diameter-independent round bound)")
      return connectedComponentsStar(nodes, idCol, pairs, aCol, bCol)
    }
    // `labels` is a view of the final round's checkpointed blocks
    // (the convergence count materialized them), so dropping the edge
    // cache is safe; checkpoint blocks free when the frame is GC'd.
    edges.unpersist()
    labels.withColumnRenamed("cc_id", idCol)
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC 2014) — the high-diameter escape hatch
    * [[connectedComponents]] falls back to when path-halving
    * truncates. Round count is O(log² n) INDEPENDENT of component
    * diameter: each round is two grouped min-aggregations over the
    * current edge set, and the edge set monotonically contracts
    * toward a forest of stars whose root is the component minimum.
    *
    * Large-star(u): attach every neighbor LARGER than u to
    * m = min(u ∪ N(u)). Small-star on the (big → small)-oriented
    * result: attach u and every smaller neighbor to their collective
    * min. Both operations preserve connectivity and never raise a
    * node's root candidate, so the fixpoint (edge set unchanged by a
    * full round) is exactly the star forest. The fixpoint check is an
    * exact set compare (carried count + left-anti join, short-
    * circuited behind count equality), not a probabilistic checksum —
    * still dearer per round than path-halving's delta count, which is
    * why this is the fallback, not the default.
    *
    * Per-round localCheckpoint for the same lineage-truncation
    * reasons as [[connectedComponents]] (the plan doubles through the
    * explode/join pipeline otherwise). Deterministic: min over ids,
    * no RNG.
    */
  def connectedComponentsStar(
      nodes: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 50): DataFrame = {
    var edges = pairs
      .select(col(aCol).as("s_u"), col(bCol).as("s_v"))
      .filter(col("s_u") =!= col("s_v"))
      .distinct()
      .localCheckpoint()
    // edge count carried ACROSS rounds (r17 VERDICT #5): the fixpoint
    // check below needs |edges| every round, and re-counting the
    // previous round's checkpoint was one redundant pass per round —
    // this round's output count IS next round's input count.
    var edgeCnt   = edges.count()
    var converged = edgeCnt == 0L // all-singleton graph: nothing to contract
    var iter      = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR over both directions: per node u, m = min(u, N(u));
      // every neighbor v > u re-attaches to m
      val und = edges
        .select(explode(array(
          struct(col("s_u").as("u"), col("s_v").as("v")),
          struct(col("s_v").as("u"), col("s_u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      val mins = und
        .groupBy(col("u"))
        .agg(min(col("v")).as("nm"))
        .select(col("u").as("mu"), least(col("u"), col("nm")).as("m"))
      val large = und
        .join(mins, und("u") === mins("mu"))
        .filter(col("v") > col("u"))
        .select(col("v").as("s_u"), col("m").as("s_v"))
        .filter(col("s_u") =!= col("s_v"))
        .distinct()
      // SMALL-STAR on the (big, small) orientation: per big node u,
      // u and all its smaller neighbors re-attach to their min
      val oriented = large.select(
        greatest(col("s_u"), col("s_v")).as("u"),
        least(col("s_u"), col("s_v")).as("v"))
      val mins2 = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = oriented
        .join(mins2, Seq("u"))
        .select(explode(array(
          struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("s_u"), col("e.b").as("s_v"))
        .filter(col("s_u") =!= col("s_v"))
        .distinct()
        .localCheckpoint()
      // exact fixpoint: same row count AND no row in small \ edges
      // (both sides distinct AND null-free — the initial =!= filter
      // and every later min() keep nulls out — so count-equal +
      // empty-anti-join = set-equal, exactly what except() checked).
      // Two passes cheaper per round (r17 VERDICT #5): the previous
      // round's count is carried forward instead of re-scanning its
      // checkpoint, and the set-compare — the shuffle-heavy half —
      // short-circuits behind count equality, so on a contracting
      // edge set it runs only on candidate-fixpoint rounds. The
      // left_anti also drops except()'s redundant re-Distinct of the
      // already-distinct left side.
      val smallCnt = small.count()
      converged = smallCnt == edgeCnt &&
        small.join(edges, Seq("s_u", "s_v"), "left_anti").isEmpty
      edges = small
      edgeCnt = smallCnt
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc-star] round $iter edges=$edgeCnt")
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — the O(log² n) bound " +
          "makes this unreachable for any real graph; the edge relation is likely unstable " +
          "(non-deterministic input)")
    // star edges are (child, root): every non-root joins its root,
    // roots and isolated nodes label themselves
    val roots = edges.select(col("s_u").as("cc_id"), col("s_v").as("cc_root"))
    nodes
      .select(col(idCol))
      .join(roots, col(idCol) === col("cc_id"), "left")
      .select(col(idCol), coalesce(col("cc_root"), col(idCol)).as("cluster_id"))
  }

  /** Fixed-iteration PageRank over an undirected pair graph (Brin &
    * Page 1998) — graph centrality as a CANONICAL-DOC signal: inside
    * a near-dup cluster the highest-PR node is the one most copied
    * from, a principled alternative to min-id/keep-best when
    * provenance matters. Fixed `iters` power iterations (not
    * convergence-tested) keep the computation engine-replayable.
    *
    * Determinism at every step: per-edge contributions pr/deg are
    * scalar IEEE ops (identical on any engine); per-node contribution
    * sums and the dangling mass quantize to decimal(27,18) BEFORE
    * summing (exact, order-independent — a float fold would expose
    * partition order); the recombination is scalar again.
    *
    * Scale shape: degree table once; each iteration is ONE action
    * (the localCheckpoint materialization): edges⋈pr equi-join + one
    * keyed sum, with the dangling mass folded into the same plan as
    * a 1-row broadcast subquery (left-anti + agg, BroadcastNestedLoop
    * fan-out of one row) instead of a blocking per-round driver
    * `first()` — no driver sync point between rounds beyond the
    * checkpoint itself. State per round is the (id, pr) relation —
    * corpus-sized, never edges². Output: (id, pr) rounded to 6dp.
    */
  def pageRankFixed(
      nodes: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("pr_src"), col(bCol).as("pr_dst")),
        struct(col(bCol).as("pr_src"), col(aCol).as("pr_dst")))).as("e"))
      .select(col("e.pr_src").as("pr_src"), col("e.pr_dst").as("pr_dst"))
      .distinct()
      .persist()
    val deg = edges.groupBy(col("pr_src")).agg(count(lit(1)).as("pr_deg")).persist()
    val n   = nodes.count()
    require(n > 0, "pageRankFixed needs a non-empty node set")
    val base = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var pr = nodes.select(col(idCol).as("pr_id")).withColumn("pr", lit(1.0) / lit(n.toDouble))
    var i  = 0
    while (i < iters) {
      // dangling mass: total pr of degree-0 nodes (exact decimal
      // sum) — kept IN the plan as a 1-row relation and broadcast,
      // not collected; decimal→double cast is the same
      // BigDecimal.doubleValue the old driver-side read performed,
      // so results are bit-identical
      val dangling = pr
        .join(deg, pr("pr_id") === deg("pr_src"), "left_anti")
        .agg(coalesce(sum(col("pr").cast("decimal(27,18)")), lit(0).cast("decimal(27,18)"))
          .cast("double").as("pr_dm"))
      val contribs = edges
        .join(pr, edges("pr_src") === pr("pr_id"))
        .join(deg, Seq("pr_src"))
        .select(col("pr_dst"), (col("pr") / col("pr_deg")).cast("decimal(27,18)").as("c"))
        .groupBy(col("pr_dst"))
        .agg(sum(col("c")).cast("double").as("cs"))
      pr = pr
        .join(contribs, pr("pr_id") === contribs("pr_dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(
          col("pr_id"),
          (base + lit(damping) * (coalesce(col("cs"), lit(0.0)) + col("pr_dm") / lit(n.toDouble)))
            .as("pr"))
        .localCheckpoint()
      i += 1
    }
    edges.unpersist()
    deg.unpersist()
    pr.select(col("pr_id").as(idCol), round(col("pr"), 6).as("pr"))
  }

  /** Near-duplicate clusters: high-Jaccard pairs (≥ minJaccard,
    * compared on the 6-decimal rounded value so oracle replays agree
    * bit-for-bit) grouped into components; every doc gets a
    * cluster_id (= min doc id in its cluster, itself when unique)
    * and an is_canonical flag marking the survivor. This is the
    * keep/drop decision step a production dedup pipeline runs after
    * pair generation — pairs alone don't dedup anything until
    * transitive groups are resolved.
    */
  def nearDupClusters(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val pairs = ngramJaccardPairs(df, bucketCol, idCol, textCol, n)
      .filter(col("jaccard") >= minJaccard)
    connectedComponents(df.select(col(idCol)), idCol, pairs)
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }

  /** Near-dup resolution with a quality tie-break: within each
    * cluster keep the row with the HIGHEST score (ties → smallest
    * id), not blindly the first arrival — the resolution policy real
    * curation pipelines want (drop the truncated/boilerplate copy,
    * keep the clean one). Input: a clustered frame (id, cluster_id,
    * ...) joined with a per-row score column; one window shuffle
    * keyed by cluster_id.
    */
  def keepBestPerCluster(clusters: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col("cluster_id")).orderBy(desc(scoreCol), col(idCol))
    clusters
      .withColumn("kb_rn", row_number().over(w))
      .withColumn("is_kept", col("kb_rn") === 1)
      .drop("kb_rn")
  }

  /** 16-bit SimHash from a PRE-PROJECTED tokens column (md5-derived
    * bit hashes; token multiplicity counts). Pure per-row expression.
    */
  def simhash16FromTokens(toks: Column): Column = {
    val h16 = (t: Column) => conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("long")
    val bitSums = transform(
      sequence(lit(0), lit(15)),
      i => {
        val p = pow(lit(2.0), i).cast("long")
        aggregate(
          toks,
          lit(0L),
          (acc, t) => acc + (pmod(floor(h16(t) / p).cast("long"), lit(2L)) * 2 - 1))
      })
    aggregate(
      zip_with(
        bitSums,
        sequence(lit(0), lit(15)),
        (s, i) => when(s > 0, pow(lit(2.0), i).cast("long")).otherwise(0L)),
      lit(0L),
      (acc, x) => acc + x)
  }

  /** Convenience for small inputs/tests. */
  def simhash16(text: Column): Column = simhash16FromTokens(tokensCol(text))

  // ---- fast (single-call) variants of the signature ops -------------
  // The expression forms above re-derive the md5 hash once per
  // (element × bit/seed) because lambda-captured subtrees re-evaluate
  // per reference; these compute each hash exactly once in plain JVM
  // code. Outputs are bit-identical (asserted in TextOpsSpec).

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Bytes(s: String): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    d.digest(s.getBytes("UTF-8"))
  }

  /** = hash60 of a string value: first 15 hex chars (7.5 bytes) of md5. */
  private def hash60Jvm(s: String): Long = {
    val b = md5Bytes(s)
    // 60 bits = bytes 0..6 + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xf0L) >> 4)
  }

  /** First 4 hex chars (2 bytes) of md5 as a 16-bit value. */
  private def hash16Jvm(s: String): Long = {
    val b = md5Bytes(s)
    ((b(0) & 0xffL) << 8) | (b(1) & 0xffL)
  }

  /** First 10 hex chars (5 bytes) of md5 as a 40-bit value. */
  private def hash40Jvm(s: String): Long = {
    val b = md5Bytes(s)
    var v = 0L
    var i = 0
    while (i < 5) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Winnowing in one JVM pass per doc (the hot path behind
    * winnowFingerprints): positional n-gram hashes, sliding w-window
    * min on the combined hash·2²⁰+pos key, per-doc dedup — all local
    * to the row, ZERO shuffle (the expression form pays a doc-key
    * window exchange for the same answer). Returns
    * array<struct<_1: pos, _2: hash>> of the selected fingerprints.
    */
  def winnowFast(text: Column, n: Int, w: Int): Column = {
    val f = udf((t: String) => {
      val toks = if (t == null) Array.empty[String] else t.split(" ").filter(_.nonEmpty)
      val nG   = math.max(toks.length - (n - 1), 1)
      val cmb  = new Array[Long](nG)
      var i    = 0
      while (i < nG) {
        val end = math.min(i + n, toks.length)
        val sb  = new java.lang.StringBuilder
        var j   = i
        while (j < end) { if (j > i) sb.append(' '); sb.append(toks(j)); j += 1 }
        cmb(i) = (hash40Jvm(sb.toString) << 20) | (i + 1).toLong
        i += 1
      }
      val out   = new java.util.LinkedHashSet[Long]
      val lastS = math.max(nG - w, 0)
      var s     = 0
      while (s <= lastS) {
        var m = cmb(s)
        var j = s + 1
        val e = math.min(s + w, nG)
        while (j < e) { if (cmb(j) < m) m = cmb(j); j += 1 }
        out.add(m)
        s += 1
      }
      val it  = out.iterator()
      val res = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      while (it.hasNext) { val v = it.next(); res += (((v & 1048575L).toInt, v >>> 20)) }
      res.toSeq
    })
    f(text)
  }

  /** MinHash signature in one call: min over shingles per seed. */
  def minhashFast(sh: Column, numHashes: Int = 8): Column = {
    val f = udf((shingles: Seq[String]) => {
      (0 until numHashes).map { s =>
        if (shingles == null || shingles.isEmpty) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(shingles.iterator.map(g => hash60Jvm(g + "#" + s)).min)
      }
    })
    f(sh)
  }

  /** SimHash near-dup pairs via banded blocking + exact Hamming
    * verification (Manku, Jarmulin & Sarma, WWW'07 — the web-scale
    * simhash dedup recipe): split the 16-bit fingerprint into 4
    * bands of 4 bits; by pigeonhole, any pair within Hamming
    * distance 3 agrees on at least one full band, so candidates =
    * docs sharing a (band_idx, band_value) bucket, and the exact
    * bit_count(xor) confirm filters to `maxHamming`. The second
    * nominate→confirm dedup pipeline next to [[editVerifiedPairs]] —
    * blocking here is O(1) per doc (4 band keys), not an inverted
    * text index.
    *
    * Scale shape: one per-row fingerprint projection, a 4× explode,
    * one equi-self-join on the band key with the same df cap every
    * pair emitter here uses (a degenerate bucket of N identical
    * fingerprints emits 0 pairs, not N²), pair dedup, and a per-pair
    * bit op. Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def simhashHammingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxDf: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol), simhash16Fast(col(textCol)).as("simhash"))
    val banded = sh.select(
      col(idCol),
      col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(
          lit(b).as("band_idx"),
          shiftright(col("simhash"), 4 * b).bitwiseAND(15).as("band_val"))): _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band_idx"), col("bk.band_val"))
    val wB = Window.partitionBy(col("band_idx"), col("band_val"))
    val capped = banded
      .withColumn("df", count(lit(1)).over(wB))
      .filter(col("df") <= maxDf)
      .drop("df")
    val a = capped.select(
      col("band_idx"), col("band_val"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = capped.select(
      col("band_idx"), col("band_val"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** 16-bit SimHash in one call: one md5 per token. */
  def simhash16Fast(text: Column): Column = {
    val f = udf((t: String) => {
      val toks = if (t == null) Array.empty[String] else t.split(" ").filter(_.nonEmpty)
      val sums = new Array[Long](16)
      toks.foreach { tok =>
        val h = hash16Jvm(tok)
        var i = 0
        while (i < 16) { sums(i) += ((h >> i) & 1L) * 2 - 1; i += 1 }
      }
      var sig = 0L
      var i   = 0
      while (i < 16) { if (sums(i) > 0) sig |= 1L << i; i += 1 }
      sig
    })
    f(text)
  }
}
