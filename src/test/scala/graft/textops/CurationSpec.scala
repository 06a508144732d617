package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts emails/phones/ips and counts on the original text") {
    val df = Seq(
      (1L, "mail me at a.b@test.org or call 555-123-4567 from 10.0.0.1"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = Curation.scrub(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(got(0).getAs[String]("clean_text") ==
      "mail me at [REDACTED] or call [REDACTED] from [REDACTED]")
    assert(got(0).getAs[Int]("n_email") == 1)
    assert(got(0).getAs[Int]("n_phone") == 1)
    assert(got(0).getAs[Int]("n_ipv4") == 1)
    assert(got(1).getAs[String]("clean_text") == "nothing sensitive here")
    assert(got(1).getAs[Int]("n_email") == 0)
  }

  test("wordNgrams handles short docs and exact-length docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    val t  = filter(split(col("text"), " "), x => length(x) > 0)
    val got = df.select(col("doc_id"), Curation.wordNgrams(t, 3).as("g"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(got(1).getSeq[String](1) == Seq.empty)
    assert(got(2).getSeq[String](1) == Seq("a b c"))
  }

  test("wordNgramsFastDistinct equals array_distinct(wordNgrams) on real docs") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val t = filter(split(col("text"), " "), x => length(x) > 0)
    val cmp = d.select(
      Curation.wordNgramsFastDistinct(col("text"), 3).as("fast"),
      array_distinct(Curation.wordNgrams(t, 3)).as("hof"))
    assert(cmp.filter(not(col("fast") <=> col("hof"))).count() == 0)
    // short-doc edge: empty, not a truncated gram
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(short.select(Curation.wordNgramsFastDistinct(col("text"), 3)).head.getSeq[String](0).isEmpty)
  }

  test("contaminatedDocs counts distinct shared n-grams against the eval set") {
    val corpus = Seq(
      (1L, "x y z w"),   // shares "x y z" and "y z w"
      (2L, "x y q"),     // no full 3-gram overlap
      (3L, "p q r")).toDF("doc_id", "text")
    val eval = Seq((100L, "x y z w v")).toDF("doc_id", "text")
    val got = Curation.contaminatedDocs(corpus, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("decontaminateBloom is bit-identical to contaminatedDocs on real docs") {
    val d      = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val ev     = d.filter(col("doc_id") % 7 === 0)
    val exact = Curation.contaminatedDocs(corpus, ev, "doc_id", "text", n = 3)
    val bloom = Curation.decontaminateBloom(corpus, ev, "doc_id", "text", n = 3)
    assert(exact.count() > 0)
    // exceptAll both ways: the Bloom path's false positives must all
    // die in the confirm join, leaving the exact multiset
    assert(bloom.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(bloom).count() == 0)
  }

  test("decontaminateFuzzy flags near-dup eval copies, best-match per doc") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated text about spark catalyst optimizer rules"),
      (3L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val eval = Seq(
      // exact copy of doc 1 → jaccard 1.0, certain band collision
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      // second exact copy: best-match tie must break to SMALLER eval id
      (101L, "the quick brown fox jumps over the lazy dog again and again"),
      (102L, "nothing in common with any corpus doc at all ok")).toDF("doc_id", "text")
    val got = Curation.decontaminateFuzzy(corpus, eval, "doc_id", "text",
        shingleN = 3, numHashes = 8, bands = 4, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 100L, 1.0)))
  }

  test("decontaminateFuzzy finds planted truncated copies on real docs") {
    val d  = spark.read.parquet(s"$sf0001/documents.parquet")
    val tk = filter(split(col("text"), " "), t => length(t) > 0)
    val nk = greatest(floor(size(tk) * 4 / 5).cast("int"), lit(1))
    val ev = d.filter(col("doc_id") % 83 === 0)
      .select(col("doc_id"), array_join(slice(tk, lit(1), nk), " ").as("text"))
    val got = Curation.decontaminateFuzzy(d, ev, "doc_id", "text",
        shingleN = 3, numHashes = 8, bands = 4, minJaccard = 0.3)
    // every planted eval item's SOURCE doc must be flagged and map to
    // itself with the ~0.8 truncation Jaccard (subset shingles)
    val self = got.filter(col("doc_id") === col("eval_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val planted = d.filter(col("doc_id") % 83 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty && (planted -- self).isEmpty,
      s"planted $planted not all recovered: $self")
    assert(got.filter(col("jaccard") < 0.3 || col("jaccard") > 1.0).count() == 0)
  }

  test("packSequences assigns running-offset packs per stream") {
    val df = Seq(
      (1L, "en", "a b c"),      // 3 toks, cum 0 → pack 0 off 0
      (2L, "en", "d e f g"),    // 4 toks, cum 3 → pack 0 off 3
      (3L, "en", "h i"),        // cum 7 → pack 1 off 2 (max=5)
      (4L, "de", "x y z")       // separate stream → pack 0 off 0
    ).toDF("doc_id", "lang", "text")
    val got = Curation.packSequences(df, "doc_id", "text", Seq("lang"), maxTokens = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("pack_id")), r.getLong(r.fieldIndex("pack_offset"))))
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 1L, 2L), (4L, 0L, 0L)))
  }

  test("filterAgreement: 2x2 contingency over shared docs, token-less docs drop") {
    val df = Seq(
      (1L, Seq.fill(25)("word").mkString(" ")), // rules keep (25 toks, mean 4)
      (2L, "short doc"),                        // rules drop (2 toks)
      (3L, "")).toDF("doc_id", "text")          // no tokens -> no clf verdict
    val got = Curation.filterAgreement(df, "doc_id", "text",
        nBuckets = 64, minTokens = 20, maxTokens = 100000, minMeanLen = 2.0, maxMeanLen = 10.0)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(got.values.sum == 2L, "doc 3 must drop from the contingency")
    // rules verdicts are fixed by construction; each doc lands in a
    // rules_keep column matching its band
    assert(got.filter(_._1._2).values.sum == 1L)  // doc 1
    assert(got.filter(!_._1._2).values.sum == 1L) // doc 2
  }

  test("hashedBow: sparse entries sum signed occurrences; dense is unit-norm and cosine-ready") {
    val df = Seq(
      (1L, "alpha alpha beta"),
      (2L, "alpha alpha beta"), // exact dup of 1
      (3L, "gamma delta")).toDF("doc_id", "text")
    val sparse = Curation.hashedBowSparse(df, "doc_id", "text", nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // every |v| is a signed multiple of occurrences; doc1 == doc2 cell-for-cell
    val d1 = sparse.collect { case ((1L, b), v) => b -> v }.toMap
    val d2 = sparse.collect { case ((2L, b), v) => b -> v }.toMap
    assert(d1 == d2 && d1.nonEmpty)
    assert(d1.values.map(math.abs).sum == 3.0 || d1.values.map(math.abs).sum == 1.0,
      s"alpha(2) and beta(1) either split buckets (sum 3) or collide with cancellation ($d1)")
    val dense = Curation.hashedBowDense(df, "doc_id", "text", nBuckets = 16)
    val cos = Similarity.cosine(col("a"), col("b"))
    val pair = dense.select(col("doc_id"), col("bow_vec").as("a"))
      .join(dense.select(col("doc_id").as("id2"), col("bow_vec").as("b")), col("doc_id") < col("id2"))
      .select(col("doc_id"), col("id2"), round(cos, 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pair((1L, 2L)) == 1.0, "identical docs must embed identically")
    assert(math.abs(pair((1L, 3L))) < 1.0)
    // unit norm on a non-cancelled doc
    val n1 = dense.filter(col("doc_id") === 1L).select(col("bow_vec")).head().getSeq[Double](0)
    assert(math.abs(n1.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("qualityRuleFlags bands and content rules drive keep") {
    val df = Seq(
      (1L, "one two three four five six"),           // 6 toks, ok with min=5
      (2L, "hi"),                                    // too short
      (3L, "lorem ipsum dolor sit amet consectetur") // lorem rule
    ).toDF("doc_id", "text")
    val got = Curation.qualityRuleFlags(df, "doc_id", "text", minTokens = 5)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Boolean]("keep"))
    assert(!got(1).getAs[Boolean]("ok_word_count") && !got(1).getAs[Boolean]("keep"))
    assert(!got(2).getAs[Boolean]("no_lorem") && !got(2).getAs[Boolean]("keep"))
    val m = got(0).getAs[Double]("mean_tok_len")
    assert(math.abs(m - 22.0 / 6) < 1e-5) // "one two three four five six": 22 letters / 6 tokens (rounded to 6dp)
  }

  test("paragraphDedup keeps the globally-first occurrence of each paragraph") {
    val df = Seq(
      (1L, "alpha\n\nbeta"),
      (2L, "beta\n\ngamma\n\nalpha"), // beta, alpha already seen in doc 1
      (3L, "beta")                    // fully duplicate
    ).toDF("doc_id", "text")
    val got = Curation.paragraphDedup(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2, 2, 1.0), (2L, 3, 1, 0.333333), (3L, 1, 0, 0.0)))
  }

  test("paragraphDedup within-doc repeats: only the first position survives") {
    val df  = Seq((1L, "x\n\nx\n\ny")).toDF("doc_id", "text")
    val got = Curation.paragraphDedup(df, "doc_id", "text").collect()(0)
    assert(got.getAs[Int]("n_para") == 3 && got.getAs[Int]("n_kept") == 2)
  }

  test("dsirWeights scores target-like docs above background-like docs") {
    // target docs say "cat", background docs say "dog"
    val df = Seq(
      (1L, "cat cat cat", true),
      (2L, "dog dog dog", false),
      (3L, "cat cat dog", false), // target-looking text in background slice
      (4L, "dog dog cat", true)
    ).toDF("doc_id", "text", "t")
    val got = Curation.dsirWeights(df, "doc_id", "text", isTarget = col("t"), vocabK = 2)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("dsir_weight")).toMap
    assert(got(1L) > 0 && got(2L) < 0) // pure cat > 0 > pure dog
    assert(got(3L) > got(2L))          // cat-heavy beats dog-heavy regardless of slice
    assert(got(1L) > got(3L))
  }

  test("dsirWeights OOV tokens hit the smoothing floor consistently") {
    val df = Seq(
      (1L, "cat cat rare1", true),
      (2L, "dog dog rare2", false)
    ).toDF("doc_id", "text", "t")
    // vocabK=2 keeps {cat, dog}; rare1/rare2 are OOV on both sides →
    // their log-ratio contribution is ln(0.5/(3+1.5)) - ln(0.5/(3+1.5)) = 0
    val got = Curation.dsirWeights(df, "doc_id", "text", isTarget = col("t"), vocabK = 2)
      .orderBy("doc_id").collect()
    assert(got.forall(_.getAs[Int]("n_tok") == 3))
    val w1 = got(0).getAs[Double]("dsir_weight")
    // doc1 = 2×cat + OOV; cat ratio = ln((2.5)/(3+1.5)) - ln((0.5)/(3+1.5))
    val expect = 2 * (math.log(2.5 / 4.5) - math.log(0.5 / 4.5))
    assert(math.abs(w1 - expect) < 1e-5)
  }

  test("dupNgramFraction counts cross-doc shared grams, not within-doc repeats") {
    val df = Seq(
      (1L, "a b c d e"),    // grams: "a b c","b c d","c d e"
      (2L, "a b c x y"),    // shares "a b c" with doc 1
      (3L, "p q r p q r"),  // within-doc repeat only ("p q r" ×2, distinct once)
      (4L, "one two")       // < n tokens → no grams
    ).toDF("doc_id", "text")
    val got = Curation.dupNgramFraction(df, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_grams") == 3 && got(0).getAs[Int]("n_dup") == 1)
    assert(math.abs(got(0).getAs[Double]("dup_frac") - 1.0 / 3) < 1e-6)
    assert(got(1).getAs[Int]("n_dup") == 1)
    // doc 3's repeat is internal — distinct-per-doc means df stays 1
    assert(got(2).getAs[Int]("n_dup") == 0)
    assert(got(3).getAs[Int]("n_grams") == 0 && got(3).getAs[Double]("dup_frac") == 0.0)
  }

  test("dataCard aggregates docs/tokens/quality/lang-share per source") {
    val df = Seq(
      (1L, "srcA", "en", "the cat sat on a mat"),
      (2L, "srcA", "de", "der hund"),
      (3L, "srcB", "en", "a b")
    ).toDF("doc_id", "source", "lang", "text")
    val got = Curation.dataCard(df, "source", "lang", "text", Seq("the", "a"))
      .orderBy("source").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Int]("n_docs") == 2 && got(0).getAs[Long]("n_tokens") == 8L)
    assert(got(0).getAs[Double]("en_share") == 0.5)
    assert(got(1).getAs[Double]("en_share") == 1.0)
    val q = got(1).getAs[Double]("mean_quality")
    assert(q > 0.0 && q <= 1.0)
  }

  test("removeBoilerplate splices corpus-frequent segments, preserves order") {
    // segment separator ". "; "NAV BAR" appears in 3 docs (df=3 > maxDf=2)
    val df = Seq(
      (1L, "NAV BAR. real content one. unique tail"),
      (2L, "NAV BAR. real content two"),
      (3L, "intro. NAV BAR"),
      (4L, "NAV BAR")) // all segments boilerplate -> empty clean text
      .toDF("doc_id", "text")
    val got = Curation
      .removeBoilerplate(df, "doc_id", "text", maxDf = 2, sepRegex = "\\. ", joinSep = ". ")
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[String]("clean_text")).toSeq == Seq(
      "real content one. unique tail", "real content two", "intro", ""))
    assert(got.map(_.getAs[Int]("n_removed")).toSeq == Seq(1, 1, 1, 1))
    assert(got.map(_.getAs[Int]("n_seg")).toSeq == Seq(3, 2, 2, 1))
  }

  test("hashedLinearScorePair is bit-identical to two single-width scores") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "delta delta eps zeta"), (3L, "x"))
      .toDF("doc_id", "text")
    val pair = Curation.hashedLinearScorePair(d, "doc_id", "text", 64, 128)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val a = Curation.hashedLinearScore(d, "doc_id", "text", 64)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    val b = Curation.hashedLinearScore(d, "doc_id", "text", 128)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(pair.map(p => (p._1, p._2)).toSeq == a.toSeq)
    assert(pair.map(p => (p._1, p._3)).toSeq == b.toSeq)
  }
}
