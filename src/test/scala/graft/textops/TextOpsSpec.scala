package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  val docsDf = Seq(
    (1L, "g", "the quick brown fox jumps over the lazy dog"),
    (2L, "g", "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "g", "completely different content about spark engines"),
    (4L, "g", "the quick brown fox jumps over the lazy dog")) // exact dup of 1
    .toDF("doc_id", "bucket", "text")

  test("exactDedup keeps one row per identical text") {
    val survivors = Dedup.exactDedup(docsDf, "doc_id", "text")
    assert(survivors.count() == 3)
    assert(!rows(survivors.select("doc_id")).contains(Seq(4L)))
  }

  test("ngramJaccardPairs scores the near-dup pair highest") {
    val pairs = Dedup.ngramJaccardPairs(docsDf, "bucket", "doc_id", "text")
      .orderBy(desc("jaccard")).collect()
    assert((pairs(0).getAs[Long]("id_a"), pairs(0).getAs[Long]("id_b")) == (1L, 4L)) // exact dup: j=1
    assert(pairs(0).getAs[Double]("jaccard") == 1.0)
    assert((pairs(1).getAs[Long]("id_a"), pairs(1).getAs[Long]("id_b")) == (1L, 2L)) // near dup next
  }

  test("ngramJaccardPairsCapped drops hot shingles from index AND measure") {
    // shingles shared by docs 1,2,4 have df=3; 'the lazy dog' df=2
    // (docs 1,4); 'the lazy cat' df=1. At maxDf=2 only the df<=2
    // shingles survive: pair (1,4) stays at j=1 over the capped
    // space, pair (1,2) disappears (no rare shingle in common).
    val capped = Dedup.ngramJaccardPairsCapped(docsDf, "bucket", "doc_id", "text", n = 3, maxDf = 2)
    assert(
      rows(capped.select(col("id_a"), col("id_b"), col("jaccard"))) == Seq(Seq(1L, 4L, 1.0)))
    // a cap above every df reproduces the uncapped result exactly
    val wide = Dedup.ngramJaccardPairsCapped(docsDf, "bucket", "doc_id", "text", n = 3, maxDf = 100)
    val base = Dedup.ngramJaccardPairs(docsDf, "bucket", "doc_id", "text", n = 3)
    assert(rows(wide.orderBy("id_a", "id_b")) == rows(base.orderBy("id_a", "id_b")))
  }

  test("stratifiedSample is deterministic, rate-accurate, and stratum-aware") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val s1   = Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 25), defaultPct = 100)
    val s2   = Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 25), defaultPct = 100)
    assert(rows(s1.select("doc_id").orderBy("doc_id")) == rows(s2.select("doc_id").orderBy("doc_id")))
    val enTotal = docs.filter(col("lang") === "en").count().toDouble
    val enKept  = s1.filter(col("lang") === "en").count().toDouble
    assert(math.abs(enKept / enTotal - 0.25) < 0.12, s"en keep rate ${enKept / enTotal}")
    // unlisted strata keep everything
    assert(s1.filter(col("lang") =!= "en").count() == docs.filter(col("lang") =!= "en").count())
  }

  test("vocabTopK ranks corpus tokens by frequency with lexicographic ties") {
    val df  = Seq("b a a", "c b a").toDF("text")
    val got = TextStats.vocabTopK(df, "text", k = 2)
    assert(rows(got.select("token", "n", "rank").orderBy("rank")) ==
      Seq(Seq("a", 3L, 1), Seq("b", 2L, 2)))
  }

  test("connectedComponents labels every component with its min id") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 4L)).toDF("id_a", "id_b") // chain 1-2-3, pair 4-5, singleton 6
    val cc = Dedup.connectedComponents(nodes, "id", pairs)
    assert(
      rows(cc.orderBy(col("id"))) ==
        Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 4L), Seq(5L, 4L), Seq(6L, 6L)))
  }

  test("connectedComponentsStar converges where path-halving truncates; parity on mixed graphs") {
    // the star algorithm on the primary path's own fixture
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 4L)).toDF("id_a", "id_b")
    assert(
      rows(Dedup.connectedComponentsStar(nodes, "id", pairs).orderBy(col("id"))) ==
        Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 4L), Seq(5L, 4L), Seq(6L, 6L)))
    // 600-node path graph, diameter 599: path-halving needs ~10
    // rounds (label distance doubles per round), so maxIter = 3
    // TRUNCATES — the r15 code threw here with an error message
    // recommending an algorithm that didn't exist; now it falls back
    // to star contraction, whose round count is diameter-independent
    val n         = 600L
    val pathNodes = spark.range(n).toDF("id")
    val pathPairs = spark.range(n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    val star = Dedup.connectedComponentsStar(pathNodes, "id", pathPairs)
    assert(star.count() == n && star.filter(col("cluster_id") =!= 0L).count() == 0,
      "one component rooted at the min id")
    val fellBack = Dedup.connectedComponents(pathNodes, "id", pathPairs, maxIter = 3)
    assert(fellBack.count() == n && fellBack.filter(col("cluster_id") =!= 0L).count() == 0,
      "maxIter-exceeded path must fall back and still converge")
  }

  test("nearDupClusters groups exact+near dups transitively, keeps min id") {
    val clusters = Dedup.nearDupClusters(docsDf, "bucket", "doc_id", "text", n = 3, minJaccard = 0.5)
    val byId = clusters.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // 1-4 exact (j=1), 1-2 near (j>=0.5) → one cluster {1,2,4}; 3 singleton
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
    val canon = clusters.filter(col("is_canonical")).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(canon == Set(1L, 3L))
  }

  test("shardAssign: stable shards, contiguous in-shard positions") {
    val d   = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Sampling.shardAssign(d, "doc_id", nShards = 8).collect()
    assert(got.length == d.count())
    assert(got.forall(r => r.getAs[Int]("shard") >= 0 && r.getAs[Int]("shard") < 8))
    // positions are 1..n within each shard
    got.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to rows.length))
    }
    // layout-independent: repartitioned input yields identical rows
    val again = Sampling.shardAssign(d.repartition(7), "doc_id", nShards = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(again == got.map(_.toString).sorted.toSeq)
  }

  test("mixRealize respects per-domain token quotas") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = Sampling.mixRealize(d, "source", "doc_id", "text", alpha = 0.3, budgetTokens = 2000L)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_tok_kept") <= r.getAs[Long]("quota_tok"))
      assert(r.getAs[Int]("n_docs_kept") > 0)
    }
  }

  test("keepBestPerCluster keeps the highest score, ties to smallest id") {
    val cl = Seq(
      (1L, 1L, 10), (2L, 1L, 30), (3L, 1L, 30), // cluster 1: 2 and 3 tie on 30 → keep 2
      (4L, 4L, 5)                               // singleton
    ).toDF("doc_id", "cluster_id", "score")
    val kept = Dedup.keepBestPerCluster(cl, "doc_id", "score")
      .filter(col("is_kept")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }

  test("shinglesFast equals the HOF shingles on real data") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val diff = d.select(
      Dedup.shingles(col("text"), 3).as("a"),
      Dedup.shinglesFast(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0)
  }

  test("shingleHashes equals sorted-distinct xxhash64 of shinglesFast on real data") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val diff = d.select(
      array_sort(array_distinct(transform(Dedup.shinglesFast(col("text"), 3), s => xxhash64(s)))).as("a"),
      Dedup.shingleHashes(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0)
  }

  test("shingleHashes edge cases: multi-space runs, empties, short docs, unicode") {
    val cases = Seq(
      "a  b c d",        // double space → normalized shingle "a b c"
      "  a b  ",         // leading/trailing/multiple spaces
      "",                // no tokens: the empty shingle
      " ",               // spaces only
      "x",               // one token, n=3 → single short shingle
      "x y",             // two tokens
      "héllo wörld ünïcode ありがとう ok" // multi-byte UTF-8
    )
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val diff = df.select(
      array_sort(array_distinct(transform(Dedup.shinglesFast(col("t"), 3), s => xxhash64(s)))).as("a"),
      Dedup.shingleHashes(col("t"), 3).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0)
    // null text → null output, like the HOF form
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(Dedup.shingleHashes(col("t"), 3).as("b")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("fast signature variants equal their expression forms on real data") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val mh = d
      .select(col("doc_id"), Dedup.shinglesFast(col("text"), 3).as("sh"))
      .select(
        Dedup.minhashFromShingles(col("sh"), 8).as("a"),
        Dedup.minhashFast(col("sh"), 8).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mh == 0)
    val shh = d.select(
      Dedup.simhash16(col("text")).as("a"),
      Dedup.simhash16Fast(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(shh == 0)
  }

  test("minhashEstVsExact: identical docs estimate 1.0 with zero error") {
    val got = Dedup.minhashEstVsExact(docsDf, "bucket", "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Double]("jaccard"), r.getAs[Double]("est"), r.getAs[Double]("abs_err"))).toMap
    val (j, e, err) = got((1L, 4L)) // docs 1 and 4 are exact duplicates
    assert(j == 1.0 && e == 1.0 && err == 0.0)
    // estimates are valid probabilities everywhere
    got.values.foreach { case (_, est, _) => assert(est >= 0.0 && est <= 1.0) }
  }

  test("minhashLshPairs surfaces exact dups as candidates") {
    val cands = Dedup.minhashLshPairs(docsDf, "doc_id", "text")
      .select("id_a", "id_b").distinct()
    assert(rows(cands).contains(Seq(1L, 4L)))
  }

  test("minhashLshPairs hot band over maxDf emits zero pairs, not N²") {
    // 6 identical docs: every band bucket has df=6 > maxDf=4, so the
    // cap drops the whole bucket — 0 pairs instead of 6*5/2 per band
    val hot = (1L to 6L).map(i => (i, "g", "same text repeated in every document here"))
      .toDF("doc_id", "bucket", "text")
    assert(Dedup.minhashLshPairs(hot, "doc_id", "text", maxDf = 4).count() == 0)
    // with the cap above df the pairs come back (all 15, both bands)
    val uncapped = Dedup.minhashLshPairs(hot, "doc_id", "text", maxDf = 100)
    assert(uncapped.select("id_a", "id_b").distinct().count() == 15)
    // mixed: a hot group (5 identical > maxDf) plus a cold pair —
    // only the cold pair survives
    val mixed = ((1L to 5L).map(i => (i, "g", "hot boilerplate shared by many docs yes")) ++
      Seq((10L, "g", "a genuinely rare document about catalyst rules"),
          (11L, "g", "a genuinely rare document about catalyst rules")))
      .toDF("doc_id", "bucket", "text")
    val got = Dedup.minhashLshPairs(mixed, "doc_id", "text", maxDf = 4)
      .select("id_a", "id_b").distinct()
    assert(rows(got) == Seq(Seq(10L, 11L)))
  }

  test("simhash is identical for identical docs, differs for different docs") {
    val sig = docsDf.select(col("doc_id"), Dedup.simhash16(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(4L))
    assert(sig(1L) != sig(3L))
    assert(sig(1L) >= 0 && sig(1L) < 65536)
  }

  test("meanPool is the element-wise mean per group") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 3.0f)),
      (2L, 0, Seq(3.0f, 5.0f)),
      (3L, 1, Seq(2.0f, 2.0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.meanPool(df, "label", "embedding")
      .orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 1, 2, 2.0), (0, 2, 2, 4.0), (1, 1, 1, 2.0), (1, 2, 1, 2.0)))
  }

  test("recallAtK counts approx hits in the exact top-k") {
    val exact  = Seq(1L, 2L, 3L).toDF("id")
    val approx = Seq(2L, 3L, 9L).toDF("id")
    val got    = Similarity.recallAtK(exact, approx, "id", k = 3).collect()(0)
    assert(got.getInt(0) == 2 && math.abs(got.getDouble(1) - 0.666667) < 1e-9)
  }

  test("matryoshkaRecall: full prefix is perfect, misleading prefix decays") {
    // 3-dim vectors; query (1, 0, 0). Full-dim top-2 by cosine:
    // a=(1,0,0) cos 1, b=(0.9,0,0.436) cos ~0.9, c=(0,1,0) cos 0.
    // Prefix d=1: every nonzero-first-dim vector has cos 1 (a, b tie
    // -> both in top-2, recall 1); prefix d=2 same. Add d=(1,0,9):
    // full cos ~0.11 (out of top-2), d=1 cos 1 -> ties crowd in by id.
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.0, 0.436)),
      (3L, Seq(0.0, 1.0, 0.0)),
      (4L, Seq(1.0, 0.0, 9.0))).toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaRecall(
      emb, "vec_id", "embedding", Seq(1.0, 0.0, 0.0), k = 2, dims = Seq(1, 3))
      .orderBy("d_prefix").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    // d=1: ids 1,2,4 all read cos 1.0 -> top-2 by id = {1,2}; full
    // top-2 = {1,2} -> recall 1.0. d=3 IS the full space -> 1.0.
    assert(got.toSeq == Seq((1, 2, 1.0), (3, 2, 1.0)))
    // a prefix that HIDES the discriminating dim: query (0,0,1),
    // d=2 sees only zeros for ids 1,3 (cos 0) and picks by id
    val got2 = Similarity.matryoshkaRecall(
      emb, "vec_id", "embedding", Seq(0.0, 0.0, 1.0), k = 2, dims = Seq(2))
      .collect()(0)
    // full top-2 for (0,0,1): id 4 (cos~0.99) and id 2 (cos~0.44);
    // d=2 ranks by first-2-dims cosine to (0,0): all cos 0 -> ids 1,2
    // -> overlap {2} -> recall 0.5
    assert(got2.getInt(1) == 1 && got2.getDouble(2) == 0.5)
  }

  test("giniTokenConcentration: block-rank identity matches the naive ranked formula") {
    // counts: a×5, b×3, c×2, d×1, e×1 → asc ranks (d,e)=1,2 c=3 b=4 a=5
    // Σi·x = 3 + 6 + 12 + 25 = 46; G = (2·46 − 6·12)/(5·12) = 1/3
    val docs = Seq((1L, "a a a a b b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val r = TextStats.giniTokenConcentration(docs, "text").collect()(0)
    assert(r.getInt(0) == 5 && r.getLong(1) == 12L)
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-6)
    // uniform counts → G = 0 exactly (single histogram block)
    val uni = TextStats.giniTokenConcentration(
      Seq((1L, "p q r s")).toDF("doc_id", "text"), "text").collect()(0)
    assert(uni.getDouble(2) == 0.0)
  }

  test("zipfFit recovers the OLS line over (ln rank, ln count)") {
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r  = TextStats.zipfFit(docs, "text", topV = 10).collect()(0)
    val xs = Seq(1, 2, 3, 4).map(i => math.log(i.toDouble))
    val ys = Seq(8, 4, 2, 1).map(c => math.log(c.toDouble))
    val (n, sx, sy)  = (4.0, xs.sum, ys.sum)
    val (sxy, sxx)   = (xs.zip(ys).map { case (a, b) => a * b }.sum, xs.map(a => a * a).sum)
    val slope        = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept    = (sy - slope * sx) / n
    assert(r.getInt(0) == 4)
    assert(math.abs(r.getDouble(1) - slope) < 1e-5, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - intercept) < 1e-5)
  }

  test("rankMetricsAtK: hand-computed P@k / MRR / NDCG on a fixed ranking") {
    val exact  = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val approx = Seq((2L, 1), (9L, 2), (3L, 3)).toDF("id", "rank")
    val r = Similarity.rankMetricsAtK(exact, approx, "id", k = 3).collect()(0)
    assert(r.getInt(0) == 2)                                     // {2,3} overlap
    assert(math.abs(r.getDouble(1) - 0.666667) < 1e-9)           // p_at_k
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)                // first hit at rank 1
    // dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1 + 1/log2(3) + 0.5
    val idcg = (1 to 3).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    assert(math.abs(r.getDouble(3) - BigDecimal(1.5 / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    // rows beyond rank k are ignored, not arbitrarily limited: a
    // full ranked list (rank 1..10) scores identically to its top-3
    val longApprox = (approx.collect().map(r2 => (r2.getLong(0), r2.getInt(1))).toSeq ++
      (4 to 10).map(i => (100L + i, i))).toDF("id", "rank")
    val r2 = Similarity.rankMetricsAtK(exact, longApprox, "id", k = 3).collect()(0)
    assert(r2.getInt(0) == 2 && math.abs(r2.getDouble(3) - r.getDouble(3)) < 1e-12)
    // exact list SHORTER than k → ideal DCG shrinks to its length
    // (a fixed k-term idcg would deflate a perfect score below 1)
    val ex1 = Seq((2L, 1)).toDF("id", "rank")
    val perfect = Similarity.rankMetricsAtK(ex1, approx, "id", k = 3).collect()(0)
    assert(math.abs(perfect.getDouble(3) - 1.0) < 1e-9, s"ndcg ${perfect.getDouble(3)}")
    // zero overlap → all metrics 0, not null
    val none = Similarity.rankMetricsAtK(Seq((7L, 1)).toDF("id", "rank"), approx, "id", k = 3)
      .collect()(0)
    assert(none.getInt(0) == 0 && none.getDouble(1) == 0.0
      && none.getDouble(2) == 0.0 && none.getDouble(3) == 0.0)
  }

  test("containmentPairs flags a verbatim quote Jaccard misses") {
    val quoteDocs = Seq(
      (1L, "g", "w1 w2 w3 w4 w5 w6 w7 w8"), // host: 6 shingles
      (2L, "g", "w3 w4 w5 w6"),             // quote of 1: 2 shingles, both in host
      (3L, "g", "x1 x2 x3 x4 x5"))          // unrelated
      .toDF("doc_id", "bucket", "text")
    val got = Dedup.containmentPairs(quoteDocs, "bucket", "doc_id", "text", n = 3, maxDf = 5, minC = 0.5)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) == ((1L, 2L)))
    assert(r.getAs[Double]("containment") == 1.0)                // fully contained
    assert(math.abs(r.getAs[Double]("jaccard") - 0.333333) < 1e-9) // 2/(6+2-2)
  }

  test("containmentPairs df-cap drops boilerplate shingles from index AND sizes") {
    // the same 3-token boilerplate in 4 docs; maxDf=3 excludes its
    // shingle everywhere → no pairs survive at any containment
    val boiler = (1L to 4L).map(i => (i, "g", "same old footer")).toDF("doc_id", "bucket", "text")
    assert(Dedup.containmentPairs(boiler, "bucket", "doc_id", "text", n = 3, maxDf = 3, minC = 0.0)
      .count() == 0)
  }

  test("lshTopK retrieves the query vector itself at rank 1") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble).toSeq
    val got = Similarity.lshTopK(emb, "vec_id", "embedding", q, k = 5)
      .orderBy("rank").collect()
    assert(got.nonEmpty)
    assert(got(0).getAs[Long]("vec_id") == 0L && got(0).getAs[Double]("cos") == 1.0)
    // signature buckets: every candidate within Hamming 2 of the query's
    val qSig = got(0).getAs[Long]("sig")
    assert(got.forall(r => java.lang.Long.bitCount(r.getAs[Long]("sig") ^ qSig) <= 2))
  }

  test("cosine similarity basics") {
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 2.0)), (3L, Seq(2.0, 0.0)))
      .toDF("id", "v")
    val got = df.select(col("id"), round(Similarity.cosineToQuery(col("v"), Seq(1.0, 0.0)), 6).as("c"))
      .orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(1.0, 0.0, 1.0))
  }

  test("cosineTopK ranks deterministically") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = rows(Similarity.cosineTopK(df, "vec_id", "embedding", Seq(1.0, 0.0), 2).select("vec_id", "rank"))
    assert(got == Seq(Seq(1L, 1), Seq(2L, 2)))
  }

  test("ivfTopK finds the query's own vector and stays within brute-force results") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).map(_.toDouble).toSeq
    val ivf   = Similarity.ivfTopK(emb, "vec_id", "embedding", q, k = 5)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 50)
    assert(ivf.filter(col("rank") === 1).head.getLong(0) == 0L) // query vec itself
    // every IVF hit must appear in a generous brute-force top list
    val bruteIds = brute.select("vec_id").collect().map(_.getLong(0)).toSet
    val ivfIds   = ivf.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivfIds.subsetOf(bruteIds))
  }

  test("pqTopK finds the query's own vector and overlaps brute force") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).map(_.toDouble).toSeq
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", q, k = 5)
    assert(pq.filter(col("rank") === 1).head.getLong(0) == 0L) // exact self-match survives ADC
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, k = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pqIds = pq.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(pqIds.subsetOf(brute))
    // partitioning-invariant: same rows on any layout
    val base = pq.orderBy("rank").collect().toSeq
    val again = Similarity.pqTopK(emb.repartition(7), "vec_id", "embedding", q, k = 5)
      .orderBy("rank").collect().toSeq
    assert(again == base)
  }

  test("pqTopKFromCodes served from a persisted codes column matches pqTopK") {
    val emb   = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q     = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).map(_.toDouble).toSeq
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val dir   = java.nio.file.Files.createTempDirectory("graft_pqcodes").toString
    Similarity.pqEncode(emb, "vec_id", "embedding", books).write.mode("overwrite").parquet(dir)
    val served = Similarity.pqTopKFromCodes(
        spark.read.parquet(dir), emb, "vec_id", "embedding", q, books, k = 5)
      .orderBy("rank").collect().toSeq
    val direct = Similarity.pqTopK(emb, "vec_id", "embedding", q, k = 5)
      .orderBy("rank").collect().toSeq
    assert(served == direct && served.nonEmpty)
  }

  test("pqTopKFromCodesBatch equals the per-query codes path; plan size flat in |queries|") {
    val emb   = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val queries = (0L until 4L).map { i =>
      i -> emb.filter(col("vec_id") === i).head.getSeq[Float](1).map(_.toDouble).toSeq
    }
    val batch = Similarity
      .pqTopKFromCodesBatch(codes, emb, "vec_id", "embedding", queries, books, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val singles = queries.flatMap { case (qid, q) =>
      Similarity.pqTopKFromCodes(codes, emb, "vec_id", "embedding", q, books, k = 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1), r.getInt(2)))
    }.toSet
    assert(batch == singles && batch.nonEmpty)
    // flat serve cost: the batched plan's leaf count (scans of the
    // codes/embeddings relations) must NOT grow with queries-per-batch
    // — the per-query union annServeStream retired in r16 had N ADC
    // subtrees (N scans) for N queries
    def leaves(n: Int): Int = Similarity
      .pqTopKFromCodesBatch(codes, emb, "vec_id", "embedding", queries.take(n), books, k = 5)
      .queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves(1) == leaves(4), "batched ADC plan must have constant leaf count in |queries|")
  }

  test("ivfPqTopK composes the coarse probe with ADC and stays inside both prunings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q   = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).map(_.toDouble).toSeq
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5)
    assert(got.filter(col("rank") === 1).head.getLong(0) == 0L)
    // ⊆ the IVF probe survivors (same seed centroids/probe rules)
    val ivfIds = Similarity.ivfTopK(emb, "vec_id", "embedding", q, k = 1000)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ids = got.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(ivfIds))
    // deterministic across layouts
    val again = Similarity.ivfPqTopK(emb.repartition(5), "vec_id", "embedding", q, k = 5)
    assert(again.orderBy("rank").collect().toSeq == got.orderBy("rank").collect().toSeq)
  }

  test("ivfPqTopKBatch equals the single-query path for every query in the batch") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = (0L until 4L).map { i =>
      i -> emb.filter(col("vec_id") === i).head.getSeq[Float](1).map(_.toDouble).toSeq
    }
    val batch = Similarity.ivfPqTopKBatch(emb, "vec_id", "embedding", queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val singles = queries.flatMap { case (qid, q) =>
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, k = 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1), r.getInt(2)))
    }.toSet
    assert(batch == singles && batch.nonEmpty)
  }

  test("pqCodebooks learns per-subvector structure on planted data") {
    // subvector 0 carries two direction clusters; subvector 1 is flat
    val vecs = (0L until 24L).map { i =>
      val s0 = if (i % 2 == 0) Seq(1f, 0f) else Seq(0f, 1f)
      (i, s0 ++ Seq(0.5f, 0.5f))
    }
    val df    = vecs.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 2, k = 2, iters = 3, dim = 4)
    assert(books.size == 4) // 2 subvectors × 2 codes
    // subvector 0's two refined codewords must peak on different dims
    val peaks = Seq(books((0, 0)), books((0, 1))).map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(peaks == Set(0, 1), s"codewords $peaks should split the planted clusters")
  }

  test("kmeansCentroids separates two planted clusters and plugs into ivfTopK") {
    // two well-separated direction clusters in 4-d
    val vecs = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0.05f, 0f, 0f) else Seq(0f, 0.05f, 1f, 0f)
      (i, base.updated(3, (i % 5).toFloat / 100f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 2, iters = 3, dim = 4)
    assert(cents.length == 2)
    val axes = cents.map { case (_, c) => c.zipWithIndex.maxBy(_._1)._2 }.toSet
    assert(axes == Set(0, 2), s"centroid peak dims $axes should split the planted clusters")
    // learned centroids drive the IVF probe path and still find the query's own vector first
    val got = Similarity.ivfTopK(
      df, "vec_id", "embedding", query = Seq(1.0, 0.05, 0.0, 0.0), k = 3,
      nCentroids = 2, nProbe = 1, learnedCentroids = Some(cents))
    assert(got.orderBy(col("rank")).collect().head.getAs[Long]("vec_id") % 2 == 0)
  }

  test("langId picks the max-marker language with lexicographic ties") {
    val markers = Seq("en" -> Seq("the"), "es" -> Seq("el"))
    val got = Seq(("the the el", 1), ("el el the", 2), ("nothing here", 3))
      .toDF("text", "i")
      .select(col("i"), TextStats.langId(col("text"), markers).as("l"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(got == Seq("en", "es", "en")) // tie on zero counts → lexicographically first
  }

  test("token counts: ws vs bpe-ish") {
    val got = Seq(("hello, world! foo", 1)).toDF("text", "i")
      .select(TextStats.tokenCountWs(col("text")), TextStats.tokenCountBpe(col("text")))
      .head
    assert(got.getInt(0) == 3)
    assert(got.getInt(1) == 5) // hello , world ! foo
  }

  test("typeTokenRatio: distinct/total with empty-doc guard") {
    val df = Seq((1L, "a b a c"), (2L, "x x x x"), (3L, "")).toDF("doc_id", "text")
    val got = TextStats.typeTokenRatio(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(got(0).getInt(1) == 4 && got(0).getInt(2) == 3 && got(0).getDouble(3) == 0.75)
    assert(got(1).getInt(1) == 4 && got(1).getInt(2) == 1 && got(1).getDouble(3) == 0.25)
    assert(got(2).getInt(1) == 0 && got(2).getDouble(3) == 0.0)
  }

  test("charEntropy: constant text is 0 bits, uniform binary text is 1 bit") {
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")).toDF("doc_id", "text")
    val got = TextStats.charEntropy(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(got(0).getInt(1) == 4 && got(0).getDouble(2) == 0.0)
    assert(got(1).getInt(1) == 4 && got(1).getDouble(2) == 1.0)
    assert(got(2).getInt(1) == 4 && got(2).getDouble(2) == 2.0)
  }

  test("substringDedupPairs certifies a planted shared token run at misaligned offsets") {
    val rnd    = new scala.util.Random(23)
    def tok(p: String, k: Int) = (0 until k).map(i => s"$p${rnd.nextInt(100000)}_$i")
    val shared = (0 until 40).map(i => s"shared_token_$i")
    // different offsets (10 vs 3) — content-defined sampling must
    // still line the shared run up on one diagonal
    val docA = (tok("a", 10) ++ shared ++ tok("a2", 15)).mkString(" ")
    val docB = (tok("b", 3) ++ shared ++ tok("b2", 8)).mkString(" ")
    val docC = tok("c", 60).mkString(" ") // unrelated
    val df   = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val got  = Dedup.substringDedupPairs(df, "doc_id", "text", n = 3, w = 4, maxDf = 20, topK = 5).collect()
    assert(got.nonEmpty, "planted pair not found")
    val top = got.head
    assert(top.getLong(0) == 1L && top.getLong(1) == 2L)
    val span = top.getInt(2)
    // interior fingerprints certify most of the 40-token run; edges
    // lose at most ~(w + n) tokens per side
    assert(span >= 40 - 2 * (4 + 3) && span <= 40 + 3, s"span $span for a 40-token planted run")
    // the unrelated doc never pairs
    assert(got.forall(r => r.getLong(0) != 3L && r.getLong(1) != 3L))
  }

  test("removeDuplicateSpans cuts the shared run from the LATER copy only, conservatively") {
    val rnd    = new scala.util.Random(29)
    def tok(p: String, k: Int) = (0 until k).map(i => s"$p${rnd.nextInt(100000)}_$i")
    val shared = (0 until 60).map(i => s"dupspan_token_$i")
    val aPre   = tok("a", 10); val aPost = tok("a2", 15)
    val bPre   = tok("b", 3); val bPost = tok("b2", 8)
    val docA   = (aPre ++ shared ++ aPost).mkString(" ")
    val docB   = (bPre ++ shared ++ bPost).mkString(" ")
    val docC   = tok("c", 70).mkString(" ")
    val df     = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", minTokens = 50)
      .collect().map(r => r.getLong(0) -> r).toMap
    // keep-first: the earlier copy and the unrelated doc are untouched
    assert(got(1L).getAs[Int]("n_removed") == 0, s"doc 1 lost tokens: ${got(1L)}")
    assert(got(3L).getAs[Int]("n_removed") == 0)
    assert(got(1L).getAs[String]("clean_text") == docA)
    // the later copy loses the certified core of the 60-token run —
    // most of it, and NOTHING outside it (every surrounding token
    // survives; removal is conservative at the edges)
    val removedB = got(2L).getAs[Int]("n_removed")
    assert(removedB >= 60 - 2 * (4 + 3) && removedB <= 60, s"doc 2 removed $removedB of a 60-token run")
    val cleanB = got(2L).getAs[String]("clean_text").split(" ").toSet
    assert((bPre ++ bPost).forall(cleanB), "tokens outside the shared run must survive")
    assert(shared.count(cleanB) <= 2 * (4 + 3), "the run's core must be gone")
  }

  test("removeDuplicateSpans one-token edit: two sub-threshold halves must NOT bridge into a cut") {
    // docA and docB identical except one middle token — the classic
    // near-dup that ExactSubstr must NOT empty: each exactly-shared
    // half (~30 tokens) is below minTokens=50, and the winnowing
    // island that nominates the whole window (±w resolution bridges
    // the edit) must be token-verified down to nothing
    val shared = (0 until 61).map(i => s"editcase_token_$i")
    val edited = shared.updated(30, "EDITED_middle_token")
    val df = Seq((1L, shared.mkString(" ")), (2L, edited.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", minTokens = 50)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n_removed")).toMap
    assert(got(1L) == 0 && got(2L) == 0,
      s"sub-threshold halves bridged across the edit: $got")
    // and with the edit absent, the full 61-token copy IS cut
    val df2 = Seq((1L, shared.mkString(" ")), (2L, shared.mkString(" "))).toDF("doc_id", "text")
    val got2 = Dedup.removeDuplicateSpans(df2, "doc_id", "text", minTokens = 50)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n_removed")).toMap
    assert(got2(1L) == 0 && got2(2L) >= 50, s"true copy not cut: $got2")
  }

  test("property: charEntropy matches the direct per-doc computation on random strings") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(200) + 1).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
    }
    val got = TextStats.charEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    docs.foreach { case (id, s) =>
      val counts = s.groupBy(identity).map(_._2.length.toDouble)
      val l      = s.length.toDouble
      val h =
        if (s.length <= 1) 0.0
        else (math.log(l) - counts.map(n => n * math.log(n)).sum / l) / math.log(2.0)
      assert(got(id)._1 == s.length)
      assert(math.abs(got(id)._2 - h) < 1e-5, s"doc $id: got ${got(id)._2}, want $h")
    }
  }

  test("equiWidthHistogram: bounds, clamping, and degenerate single-value column") {
    import graft.relops.Stats
    val df  = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 10.0).toDF("v")
    val got = Stats.equiWidthHistogram(df, "v", nBuckets = 5).orderBy("bucket").collect()
    // lo=0, hi=10, width 2: 0,1→b0; 2,3→b1; 4→b2; 10 clamps into b4
    assert(got.map(r => (r.getInt(0), r.getLong(3))).toSeq == Seq((0, 2L), (1, 2L), (2, 1L), (4, 1L)))
    assert(got.head.getDouble(1) == 0.0 && got.head.getDouble(2) == 2.0)
    val const = Seq(7.0, 7.0).toDF("v")
    val g2    = Stats.equiWidthHistogram(const, "v", nBuckets = 5).collect()
    assert(g2.length == 1 && g2.head.getInt(0) == 0 && g2.head.getLong(3) == 2L)
  }

  test("histogramQuantiles matches rank-rule quantiles without value buffering") {
    import graft.relops.Stats
    val df = (
      (1 to 10).map(v => ("g", v.toLong)) ++ Seq(("h", 5L), ("h", 5L), ("h", 5L), ("h", 7L))
    ).toDF("grp", "v")
    val got = Stats.histogramQuantiles(df, "grp", "v", Seq(0.25, 0.5, 0.75, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    // g (n=10): ranks ceil(q·10) = 3,5,8,9 → values 3,5,8,9
    assert(got(("g", 0.25)) == 3L && got(("g", 0.5)) == 5L)
    assert(got(("g", 0.75)) == 8L && got(("g", 0.9)) == 9L)
    // h (n=4, ties): ranks 1,2,3,4 over sorted [5,5,5,7]
    assert(got(("h", 0.5)) == 5L && got(("h", 0.75)) == 5L && got(("h", 0.9)) == 7L)
    // NULL values drop from histogram AND totals (quantile-aggregate
    // semantics): [null,1,2,3] has median 2, not 1
    val withNull = Seq(("n", Some(1L)), ("n", Some(2L)), ("n", Some(3L)), ("n", None))
      .toDF("grp", "v")
    val m = Stats.histogramQuantiles(withNull, "grp", "v", Seq(0.5)).collect().head.getLong(2)
    assert(m == 2L, s"median over non-nulls should be 2, got $m")
    // scale-shape audit: the plan must not contain `percentile`'s
    // value-buffering aggregate — only histogram counts
    val plan = Stats.histogramQuantiles(df, "grp", "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"), plan)
  }

  test("ngramNovelty: first-appearance fraction per doc in id order") {
    // doc1 all-novel (first), doc2 shares 6/7 grams with doc1, doc3
    // unrelated (all novel), doc4 identical to doc1 (nothing novel)
    val got = Curation.ngramNovelty(docsDf, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got(1L) == ((7, 7, 1.0)))
    assert(got(2L) == ((7, 1, math.rint(1.0 / 7 * 1e6) / 1e6)))
    assert(got(3L)._3 == 1.0)
    assert(got(4L) == ((7, 0, 0.0)))
    // a gramless doc keeps its row with the degenerate (0, 0, 0.0)
    val short = Seq((1L, "a b"), (2L, "x y z")).toDF("doc_id", "text")
    val s     = Curation.ngramNovelty(short, "doc_id", "text", n = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(s(1L) == ((0, 0, 0.0)) && s(2L) == ((1, 1, 1.0)))
  }

  test("jsDivergence: hand-computed two-token case; identical sources diverge by 0") {
    val df = Seq(("g1", "a a b"), ("g2", "a b b"), ("g3", "a a b")).toDF("src", "text")
    val got = TextStats.jsDivergence(df, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // p=(2/3,1/3) vs q=(1/3,2/3): JSD = (2/3)ln(4/3) + (1/3)ln(2/3)
    val want = math.rint((2.0 / 3 * math.log(4.0 / 3) + 1.0 / 3 * math.log(2.0 / 3)) * 1e6) / 1e6
    assert(got(("g1", "g2")) == want, s"got ${got(("g1", "g2"))}, want $want")
    assert(got(("g2", "g3")) == want)
    assert(got(("g1", "g3")) == 0.0) // identical distributions
    assert(got.size == 3)            // unordered pairs only
    assert(got.values.forall(j => j >= 0.0 && j <= math.log(2) + 1e-9), "JSD must sit in [0, ln 2]")
  }

  test("chi2Tokens: independence gives 0, skewed usage ranks highest") {
    // x and y used identically across g1/g2 -> chi2 0; z is g2-only
    val df = Seq(("g1", "x y x y"), ("g2", "x y z z")).toDF("src", "text")
    val got = TextStats.chi2Tokens(df, "src", "text", topV = 10, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(got.head._1 == "z", s"most domain-indicative token should rank first: ${got.toSeq}")
    assert(got.head._2 > 0.0)
    val byTok = got.toMap
    // x: counts (2,1), totals row=3 col=(4,4) N=8 -> E=(1.5,1.5) ->
    // chi2 = 0.25/1.5 * 2 = 1/3; y identical
    assert(byTok("x") == math.rint(1.0 / 3 * 1e6) / 1e6 && byTok("x") == byTok("y"))
  }

  test("dedupRateBySource: corpus-wide first-copy rule, per-source rates") {
    val df = Seq(
      (1L, "s1", "unique text one"),
      (2L, "s1", "unique text two"),
      (3L, "s2", "unique text three"),
      (4L, "s2", "unique text one")) // exact copy of doc 1 (s1)
      .toDF("doc_id", "source", "text")
    val got = Dedup.dedupRateBySource(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got("s1") == ((2, 0, 0.0)))
    assert(got("s2") == ((2, 1, 0.5)), "cross-source copy bills the LATER source")
  }

  test("pmiPairs: co-traveling tokens score ln(N·c12/(c1·c2)), singleton pairs drop") {
    val df = Seq(
      (1L, "p q a"), (2L, "p q b"), (3L, "a r"), (4L, "b r"))
      .toDF("doc_id", "text")
    val got = TextStats.pmiPairs(df, "doc_id", "text", topV = 50, minDocs = 2L, topK = 20)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    // only (p, q) has joint support >= 2; PMI = ln(4*2/(2*2)) = ln 2
    assert(got.map(_._1).toSeq == Seq(("p", "q")), got.toSeq.toString)
    assert(got.head._2 == ((2L, math.rint(math.log(2.0) * 1e6) / 1e6)))
  }

  test("tokenDispersion: clumped token VMR > scattered token VMR, zero-docs counted") {
    val df = Seq((1L, "x x x"), (2L, "y"), (3L, "y z")).toDF("doc_id", "text")
    val got = TextStats.tokenDispersion(df, "doc_id", "text", topK = 20)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    // ordered by corpus count desc then token
    assert(got.map(_._1).toSeq == Seq("x", "y", "z"))
    val m = got.toMap
    // x: all 3 copies in one of 3 docs -> mu=1, var=(9/3)-1=2, vmr=2
    assert(m("x") == ((3L, 1L, 2.0)))
    // y: 1 copy in 2 of 3 docs -> mu=2/3, var=2/9, vmr=1/3
    assert(m("y") == ((2L, 2L, math.rint(1.0 / 3 * 1e6) / 1e6)))
    // z: singleton -> mu=1/3, var=2/9, vmr=2/3
    assert(m("z") == ((1L, 1L, math.rint(2.0 / 3 * 1e6) / 1e6)))
  }

  test("hapaxRate: per-group once-only vocabulary fraction") {
    val df = Seq(("a", "p p q"), ("b", "r")).toDF("source", "text")
    val got = TextStats.hapaxRate(df, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("a") == ((2L, 3L, 1L, 0.5)))
    assert(got("b") == ((1L, 1L, 1L, 1.0)))
  }

  test("headCoverage: cumulative top-k mass; checkpoints past the vocabulary drop") {
    val df = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = TextStats.headCoverage(df, "text", Seq(1, 2, 3))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1, 3L, 6L, 0.5),
      (2, 5L, 6L, math.rint(5.0 / 6 * 1e6) / 1e6),
      (3, 6L, 6L, 1.0)))
    val sparse = TextStats.headCoverage(df, "text", Seq(2, 10)).collect().map(_.getInt(0)).toSeq
    assert(sparse == Seq(2), "no rank-10 type exists in a 3-type corpus")
  }

  test("crossSourceDupMatrix: copies billed to (source of original, source of copy)") {
    val df = Seq(
      (1L, "a", "shared text"),   // original (min id)
      (2L, "b", "shared text"),   // b copies a
      (3L, "b", "shared text"),   // b copies a again
      (4L, "a", "other text"),    // original
      (5L, "a", "other text"),    // a copies itself
      (6L, "c", "unique text")).toDF("doc_id", "source", "text")
    val got = Dedup.crossSourceDupMatrix(df, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "a") -> 1L))
  }

  test("crossSourceNearDupMatrix: near-dup pairs billed lower-id source as original") {
    val near1 = "alpha beta gamma delta epsilon zeta"
    val near2 = "alpha beta gamma delta epsilon eta" // high 3-shingle Jaccard with near1
    val df = Seq(
      (1L, "en", "a", near1),
      (2L, "en", "b", near2),
      (3L, "en", "c", "totally different words here entirely unrelated"))
      .toDF("doc_id", "lang", "source", "text")
    val got = Dedup
      .crossSourceNearDupMatrix(df, "lang", "doc_id", "text", "source", n = 3, maxDf = 10, minJaccard = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L))
  }

  test("editVerifiedPairs: order-sensitive confirm kills a token-permutation false positive") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val edit = "alpha beta gamma delta epsilon zeta eta thetb" // 1 char edit
    // same token multiset as base but heavily reordered: shares many
    // shingles? no — 3-shingles are order-sensitive, so to build a
    // Jaccard false positive use a doc sharing shingle SET but with
    // large edit distance: repeat the base twice (same distinct
    // 3-shingle set is a superset; jaccard still high)
    val doubled = base + " " + base
    val df = Seq(
      (1L, "en", base),
      (2L, "en", edit),
      (3L, "en", doubled),
      (4L, "en", "completely different content with other words entirely"))
      .toDF("doc_id", "lang", "text")
    val got = Dedup
      .editVerifiedPairs(df, "lang", "doc_id", "text", n = 3, maxDf = 10,
        candJaccard = 0.3, minEditSim = 0.9)
      .collect()
    val pairs = got.map(r => (r.getLong(1), r.getLong(2))).toSet
    // (1,2): jaccard-high AND edit-high -> kept
    assert(pairs.contains((1L, 2L)))
    // (1,3): shingle-set jaccard high (subset) but edit distance is
    // half the doubled text -> edit_sim ~0.5, killed by the verify
    assert(!pairs.contains((1L, 3L)))
    val r12 = got.find(r => r.getLong(1) == 1L && r.getLong(2) == 2L).get
    assert(r12.getAs[Int]("edit_dist") == 1)
  }

  test("mutualInformation: independent columns ~0, determined columns = H(x)") {
    // y determines x: x = parity of y
    val det = (0 until 40).map(i => (if (i % 2 == 0) "even" else "odd", s"g${i % 4}"))
      .toDF("x", "y")
    val d = TextStats.mutualInformation(det, "x", "y").collect()(0)
    assert(math.abs(d.getAs[Double]("mi") - d.getAs[Double]("h_x")) < 1e-6)
    // independent: every (x, y) cell equal count
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q", "r"); _ <- 1 to 5) yield (x, y))
      .toDF("x", "y")
    val i = TextStats.mutualInformation(ind, "x", "y").collect()(0)
    assert(math.abs(i.getAs[Double]("mi")) < 1e-6)
    assert(math.abs(i.getAs[Double]("h_y") - math.log(3)) < 1e-6)
  }

  test("dupClusterHist: cluster sizes histogrammed with doc mass") {
    val df = Seq("t1", "t1", "t1", "t2", "t2", "t3").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.dupClusterHist(df, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L, 1L), (2, 1L, 2L), (3, 1L, 3L)))
  }

  test("clusterLabelPurity: majority share per centroid, ties to the smaller label") {
    val df = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0f, 1f), 1),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.8f, 0.2f), 1),
      (4L, Seq(0.1f, 0.95f), 0)) // ties cluster 1 at {0:1, 1:1}
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.clusterLabelPurity(df, "vec_id", "embedding", "label", nCentroids = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(0) == ((3L, 0, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got(1) == ((2L, 0, 1L, 0.5)), "equal counts must break to label 0")
  }

  test("clusterSilhouette: tight planted clusters score near 1, boundary point drags its cluster down") {
    // two orthogonal tight clusters; seeds are vecs 0 and 1
    val df = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f)),
      (2L, Seq(0.99f, 0.01f, 0f)),
      (3L, Seq(0.01f, 0.99f, 0f)),
      (4L, Seq(0.98f, 0.02f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.clusterSilhouette(df, "vec_id", "embedding", nCentroids = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(0, 1))
    assert(got(0)._1 == 3L && got(1)._1 == 2L)
    assert(got(0)._2 > 0.9 && got(1)._2 > 0.9, s"tight clusters must be near 1: $got")
    // add a boundary vector between the two centroids: its own
    // cluster's mean silhouette must drop below the clean cluster's
    val df2 = df.union(Seq((5L, Seq(0.72f, 0.69f, 0f))).toDF("vec_id", "embedding"))
    val got2 = Similarity.clusterSilhouette(df2, "vec_id", "embedding", nCentroids = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got2(0) < got(0)._2, "boundary point must reduce its cluster's mean silhouette")
  }

  test("weightedSample: no-RNG Efraimidis-Spirakis — exclusion, determinism, weight dominance") {
    val rows = (1L to 20L).map(i => (i, 1.0)) ++ Seq((21L, 1e9), (22L, 0.0), (23L, -5.0))
    val df   = rows.toDF("doc_id", "w")
    val got  = Sampling.weightedSample(df, "doc_id", "w", k = 10).collect()
    assert(got.length == 10)
    val ids = got.map(_.getLong(0)).toSet
    assert(!ids.contains(22L) && !ids.contains(23L), "non-positive weights are excluded")
    assert(got.head.getLong(0) == 21L, "the 1e9-weight row must rank first")
    val keys = got.map(_.getDouble(2))
    assert(keys.sameElements(keys.sorted.reverse), "skey descending")
    val again = Sampling.weightedSample(df, "doc_id", "w", k = 10).collect().map(_.getLong(0)).toSeq
    assert(again == got.map(_.getLong(0)).toSeq, "deterministic across runs")
  }

  test("plan shapes: r11 diagnostics hold their documented shuffle budgets") {
    val docs = Seq((1L, "a b c", "s1"), (2L, "b c d", "s2")).toDF("doc_id", "text", "source")
    def hashEx(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange hashpartitioning"))
    // one (id, bucket) aggregation, nothing else corpus-scale
    assert(hashEx(Curation.hashedBowSparse(docs, "doc_id", "text", 16)) == 1)
    // (group, token) agg + group fold
    assert(hashEx(TextStats.simpsonDiversity(docs, "source", "text")) == 2)
    assert(hashEx(TextStats.hapaxRate(docs, "source", "text")) == 2)
    // content-hash agg + size histogram agg
    assert(hashEx(Dedup.dupClusterHist(docs, "doc_id", "text")) == 2)
    // token-count agg only; cum window runs on the TakeOrdered rows
    val hc = TextStats.headCoverage(docs, "text", Seq(1, 2))
    assert(hashEx(hc) == 1, hc.queryExecution.executedPlan.toString)
    // (token, doc) agg + token moments; top-k is TakeOrdered, no sort shuffle
    val disp  = TextStats.tokenDispersion(docs, "doc_id", "text", 5)
    val dPlan = disp.queryExecution.executedPlan.toString
    assert(dPlan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, dPlan)
    assert(dPlan.contains("TakeOrdered"), dPlan)
  }

  test("pageRankFixed: hand-replicated power iterations, mass conserved, centrality orders") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    // star: 1 -- {2,3}; 4 dangling. Node 1 must out-rank leaves.
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.pageRankFixed(nodes, "id", pairs, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replicate the exact recursion (contrib sums are single-term, so
    // decimal quantization is invisible at 6dp)
    val n = 4.0; val d = 0.85
    var pr = Map(1L -> 1 / n, 2L -> 1 / n, 3L -> 1 / n, 4L -> 1 / n)
    val deg = Map(1L -> 2.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 3) {
      val dm = pr(4L)
      def c(v: Long): Double = v match {
        case 1L => pr(2L) / deg(2L) + pr(3L) / deg(3L)
        case 2L => pr(1L) / deg(1L)
        case 3L => pr(1L) / deg(1L)
        case _  => 0.0
      }
      pr = pr.map { case (v, _) => v -> ((1.0 - d) / n + d * (c(v) + dm / n)) }
    }
    pr.foreach { case (v, expect) =>
      assert(math.abs(got(v) - expect) < 2e-6, s"node $v: ${got(v)} vs $expect")
    }
    assert(got(1L) > got(2L) && got(2L) == got(3L), "hub out-ranks symmetric leaves")
    assert(math.abs(got.values.sum - 1.0) < 1e-4, "PageRank mass conserved")
  }

  test("pageRankFixed: dangling mass is in-plan (constant per-round job budget)") {
    // the dangling aggregate rides the round's ONE action as a 1-row
    // broadcast subquery instead of a blocking driver first().
    // Under AQE every shuffle stage of that action surfaces as its
    // own job (~9/round here), so the pinned property is that the
    // per-round count is CONSTANT and bounded — lineage growth or a
    // reintroduced per-round driver action would break linearity /
    // raise the constant
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    def jobsFor(iters: Int): Int = {
      spark.sparkContext.addSparkListener(listener)
      try {
        counter.set(0)
        Dedup.pageRankFixed(nodes, "id", pairs, iters = iters).collect()
        // listener events post asynchronously: wait until stable
        var last = -1
        var spins = 0
        while (counter.get() != last && spins < 40) {
          last = counter.get(); Thread.sleep(100); spins += 1
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val c2 = jobsFor(2)
    val c5 = jobsFor(5)
    val c8 = jobsFor(8)
    val perRound = (c8 - c2) / 6.0
    assert(perRound <= 10.0, s"per-round job budget blew up: $perRound (c2=$c2, c8=$c8)")
    assert(c8 - c5 == c5 - c2,
      s"per-round job count is not constant: c2=$c2, c5=$c5, c8=$c8")
  }

  test("simhashHammingPairs: banded blocking equals brute force, df cap bounds hot buckets") {
    // overlapping vocab so some pairs land within hamming 3
    val texts = Seq(
      "spark table join query data",
      "spark table join query data",      // identical -> hamming 0
      "spark table join query value",
      "spark table join row value",
      "merge filter sort window batch",
      "merge filter sort window stream",
      "completely other words here now")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(df, "doc_id", "text", maxHamming = 3, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute force from the fingerprints themselves
    val sh = df.select(col("doc_id"), Dedup.simhash16Fast(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 3
    } yield (a, b) -> h).toMap
    assert(got == brute, s"blocking must be recall-lossless for hamming<=3: got $got vs $brute")
    assert(got((0L, 1L)) == 0, "identical docs share the fingerprint")
    // df cap: 10 identical docs in a bucket over the cap emit nothing
    val hot = (0 until 10).map(i => (i.toLong, "same text here")).toDF("doc_id", "text")
    assert(Dedup.simhashHammingPairs(hot, "doc_id", "text", maxHamming = 3, maxDf = 3).count() == 0)
  }

  test("binaryTopK: sign-pattern Hamming candidates find the query itself, rerank is exact cosine") {
    val dim = 64
    // i+1 keeps sin() away from exactly 0 (a 0.0 element's sign bit
    // would not flip under negation and break the 64-bit assertion)
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(i => (math.sin(seed * 31 + i + 1) * 2).toFloat)
    val df = (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val q  = vec(0).map(_.toDouble)
    val got = Similarity.binaryTopK(df, "vec_id", "embedding", q, k = 5, rerank = 10).collect()
    assert(got.head.getLong(0) == 0L, "the query's own vector ranks first")
    assert(got.head.getAs[Int]("hamming") == 0 && got.head.getAs[Double]("cos") == 1.0)
    val cos = got.map(_.getAs[Double]("cos"))
    assert(cos.sameElements(cos.sorted.reverse), "rerank orders by exact cosine")
    // a flipped vector is the farthest sign pattern
    val withNeg = df.union(Seq((99L, vec(0).map(x => -x))).toDF("vec_id", "embedding"))
    val ham = Similarity.binaryTopK(withNeg, "vec_id", "embedding", q, k = 31, rerank = 31)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("hamming")).toMap
    assert(ham(99L) == 64, "opposite signs differ in all 64 bits")
  }

  test("dbscanClusters: planted core/border/noise roles and min-core-id clusters") {
    // bucket seeds are vecs 0 and 1. Angular chain in the x-z plane
    // with eps = 0.9 (a 25.8 deg radius): 0 at 0deg, 2 at 10deg, 3 at
    // 20deg are mutually within eps (cores at minPts=2); 5 at 40deg
    // reaches ONLY node 3 (20deg gap; 30deg to 2, 40deg to 0) ->
    // border; 1 and 6 are orthogonal -> noise
    val df = Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f)),
      (2L, Seq(0.985f, 0f, 0.174f)),
      (3L, Seq(0.940f, 0f, 0.342f)),
      (5L, Seq(0.766f, 0f, 0.643f)),
      (6L, Seq(0f, 0f, -1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dbscanClusters(df, "vec_id", "embedding", eps = 0.9, minPts = 2, nCentroids = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(got(0L) == ((2, "core", 0L)), s"got ${got(0L)}")
    assert(got(2L) == ((2, "core", 0L)), s"got ${got(2L)}")
    assert(got(3L) == ((3, "core", 0L)), s"got ${got(3L)}")
    assert(got(5L) == ((1, "border", 0L)), s"got ${got(5L)}")
    assert(got(1L) == ((0, "noise", -1L)) && got(6L) == ((0, "noise", -1L)))
  }

  test("knnGraph: per-vector in-bucket top-k by cosine, WindowGroupLimit plan") {
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat)
    }
    val df = Seq((0L, v(0)), (1L, v(10)), (2L, v(20)), (3L, v(30)), (4L, v(80)))
      .toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(df, "vec_id", "embedding", k = 2, nCentroids = 1)
    val got = g.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // node 0's nearest by cosine: 1 (10 deg) then 2 (20 deg)
    assert(got((0L, 1)) == 1L && got((0L, 2)) == 2L)
    // node 2 is between 1 and 3 (both 10 deg away): tie -> smaller id
    assert(got((2L, 1)) == 1L && got((2L, 2)) == 3L)
    assert(g.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      g.queryExecution.executedPlan.toString)
  }

  test("graphTopK: beam search over the kNN graph recovers the exact top-k it can reach") {
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat)
    }
    // angular chain, one bucket: entry = node 0 (max cos to the seed
    // centroid, which is its own vector); knnK=2 edges form the
    // chain, so 2 hops from node 0 reach nodes 0..4 — the true top-3
    // for a 25-degree query (nodes 2, 3, 1) are all inside that ball
    val df = (0 to 8).map(i => (i.toLong, v(i * 10.0))).toDF("vec_id", "embedding")
    val q25 = Seq(math.cos(math.toRadians(25)), 0.0, math.sin(math.toRadians(25)))
    val got = Similarity.graphTopK(df, "vec_id", "embedding", q25,
      k = 3, ef = 8, hops = 2, knnK = 2, nCentroids = 1)
      .orderBy("rank").collect().map(r => (r.getInt(2), r.getLong(0))).toSeq
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", q25, k = 3)
      .orderBy("rank").collect().map(r => (r.getInt(2), r.getLong(0))).toSeq
    assert(got == exact, s"got $got, exact $exact")
    // the search plan is all equi-joins over frontier-sized relations
    val plan = Similarity.graphTopK(df, "vec_id", "embedding", q25,
      k = 3, ef = 8, hops = 2, knnK = 2, nCentroids = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("graphTopK: per-bucket entries reach clusters the query's own bucket misses") {
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat)
    }
    // two tight clusters (0-ish and 90-ish degrees); seed centroids =
    // vecs of ids 0 and 1, one per cluster, so the bucket-bounded
    // graph has NO cross-cluster edges. A query at 85 degrees must
    // still find cluster B's best — only the per-bucket entry can
    // carry the search there.
    val df = Seq(
      (0L, v(0)), (1L, v(90)), (2L, v(5)), (3L, v(10)),
      (4L, v(85)), (5L, v(80)), (6L, v(15))).toDF("vec_id", "embedding")
    val q85 = Seq(math.cos(math.toRadians(85)), 0.0, math.sin(math.toRadians(85)))
    val got = Similarity.graphTopK(df, "vec_id", "embedding", q85,
      k = 3, ef = 4, hops = 2, knnK = 2, nCentroids = 2)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", q85, k = 3)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(got == exact, s"got $got, exact $exact")
  }

  test("graphTopKBatch: one composed plan equals the per-query loop bit-for-bit") {
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat)
    }
    val df = (0 to 10).map(i => (i.toLong, v(i * 9.0))).toDF("vec_id", "embedding")
    val queries = Seq(
      100L -> Seq(math.cos(math.toRadians(13)), 0.0, math.sin(math.toRadians(13))),
      200L -> Seq(math.cos(math.toRadians(71)), 0.0, math.sin(math.toRadians(71))),
      300L -> Seq(0.0, 1.0, 0.0)) // orthogonal to the plane: all cos 0, id ties
    val batch = Similarity.graphTopKBatch(df, "vec_id", "embedding", queries,
      k = 4, ef = 6, hops = 2, knnK = 2, nCentroids = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    queries.foreach { case (qid, q) =>
      val single = Similarity.graphTopK(df, "vec_id", "embedding", q,
        k = 4, ef = 6, hops = 2, knnK = 2, nCentroids = 2)
        .collect().map(r => r.getInt(2) -> ((r.getLong(0), r.getDouble(1)))).toMap
      single.foreach { case (rank, want) =>
        assert(batch((qid, rank)) == want, s"qid $qid rank $rank: ${batch((qid, rank))} vs $want")
      }
    }
    assert(batch.size == 3 * 4)
  }

  test("shardBalance: zero-load shards appear with rel_load 0, mean over ALL shards") {
    // 2 docs cannot populate 8 shards — the empty ones must still
    // show (the worst imbalance the audit exists to catch)
    val df = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val got = Sampling.shardBalance(df, "doc_id", "text", nShards = 8)
      .orderBy("shard").collect()
    assert(got.length == 8, "every shard gets a row")
    assert(got.map(_.getLong(2)).sum == 5L, "token mass conserved")
    val empties = got.filter(_.getLong(1) == 0L)
    assert(empties.nonEmpty && empties.forall(_.getDouble(3) == 0.0))
    // rel_load averages over ALL 8 shards: sum(rel_load) == nShards
    assert(math.abs(got.map(_.getDouble(3)).sum - 8.0) < 1e-4)
  }

  test("labelPropagation: mass flows from clamped seeds, symmetric tie breaks to smaller label") {
    // angular chain 0..40 deg, eps=0.9 (25.8 deg reach => +-2 hops);
    // seeds: node 0 -> label 0, node 4 -> label 1; graph symmetric
    // under 0<->4, so node 2's masses tie exactly -> label 0
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, 0f, math.sin(r).toFloat)
    }
    val df = Seq(
      (0L, v(0)), (1L, v(10)), (2L, v(20)), (3L, v(30)), (4L, v(40)))
      .toDF("vec_id", "embedding")
    val seeds = Seq((0L, 0), (4L, 1)).toDF("vec_id", "label")
    val got = Similarity
      .labelPropagation(df, "vec_id", "embedding", seeds, eps = 0.9, iters = 3, nCentroids = 1)
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(got(0L)._1 == 0 && got(0L)._2 == 0 && got(0L)._3 == 1.0, s"seed 0: ${got(0L)}")
    assert(got(4L)._1 == 1 && got(4L)._2 == 1 && got(4L)._3 == 1.0)
    assert(got(1L)._2 == 0 && got(3L)._2 == 1, s"inner nodes adopt the nearer seed: $got")
    assert(got(2L)._2 == 0, s"exact symmetric tie must break to the smaller label: ${got(2L)}")
  }

  test("kmvOverlap: sketch algebra — identical groups estimate Jaccard 1, disjoint small groups exact 0") {
    // identical vocabularies LARGER than k: estimator branch, sketches equal
    val big = (1 to 40).map(i => s"tok$i").mkString(" ")
    val ident = Seq(("a", big), ("b", big)).toDF("g", "text")
    val gi = TextStats.kmvOverlap(ident, "g", "text", k = 16).collect()(0)
    assert(gi.getAs[Double]("jaccard_est") == 1.0)
    assert(gi.getAs[Double]("est_a") == gi.getAs[Double]("est_union"))
    assert(gi.getAs[Double]("est_intersect") == gi.getAs[Double]("est_a"))
    // disjoint small vocabularies (< k): everything exact
    val disj = Seq(("a", "x1 x2 x3"), ("b", "y1 y2 y3 y4")).toDF("g", "text")
    val gd = TextStats.kmvOverlap(disj, "g", "text", k = 16).collect()(0)
    assert(gd.getAs[Double]("est_a") == 3.0 && gd.getAs[Double]("est_b") == 4.0)
    assert(gd.getAs[Double]("est_union") == 7.0)
    assert(gd.getAs[Double]("est_intersect") == 0.0 && gd.getAs[Double]("jaccard_est") == 0.0)
  }

  test("plan shapes: r11 second-wave ops hold their shuffle budgets") {
    val docs = Seq((1L, "a b c", "s1", "en", 5L), (2L, "b c d", "s2", "de", 5L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    def hashEx(df: org.apache.spark.sql.DataFrame): Int =
      plan(df).linesIterator.count(_.contains("Exchange hashpartitioning"))
    // weightedSample: pure projection + TakeOrdered — ZERO shuffles
    // (k below the fixture row count: EliminateLimits strips a limit
    // that exceeds maxRows and leaves a bare global sort)
    val ws = Sampling.weightedSample(docs, "doc_id", "n_chars", 1)
    assert(hashEx(ws) == 0, plan(ws))
    assert(plan(ws).contains("TakeOrdered"), plan(ws))
    // mutualInformation: ONE corpus-scale agg (x,y); the two marginal
    // windows + final fold are cell-sized (their exchanges hash on
    // cell keys, total 3 hash exchanges, no extra scan of the input)
    val mi = TextStats.mutualInformation(docs, "lang", "source")
    assert(plan(mi).linesIterator.count(_.contains("Scan")) <= 1, plan(mi))
    // removeBoilerplate and editVerifiedPairs: every join equi — no
    // cartesian / nested-loop anywhere
    val rb = Curation.removeBoilerplate(docs, "doc_id", "text", maxDf = 1)
    val ev = Dedup.editVerifiedPairs(docs, "source", "doc_id", "text", n = 2, maxDf = 5)
    val wp = WordPiece.pairScores(docs, "text", 5)
    Seq(plan(rb), plan(ev), plan(wp), plan(mi)).foreach { p =>
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    }
    assert(plan(wp).contains("TakeOrdered"), plan(wp))
  }

  test("spearmanCorr: hand-computed tie-averaged rho; constant column yields NULL; floats refused") {
    // a: 1,2,3,4 ; b: 10,20,20,40 -> ranks a: 1,2,3,4 ; b: 1,2.5,2.5,4
    // rho = Pearson(ranks) = 0.9486832980505138... -> 6dp 0.948683
    val df = Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 20L), (4L, 4L, 40L))
      .toDF("id", "a", "b")
    val got = graft.relops.Stats.spearmanCorr(df, "a", "b").head()
    assert(got.getLong(0) == 4L)
    assert(got.getDouble(1) == 0.948683, got.toString)
    // perfectly monotone -> 1.0
    val mono = graft.relops.Stats.spearmanCorr(
      Seq((1L, 5L), (2L, 7L), (3L, 9L)).toDF("a", "b"), "a", "b").head()
    assert(mono.getDouble(1) == 1.0)
    // constant column -> zero rank variance -> NULL
    val const = graft.relops.Stats.spearmanCorr(
      Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "b"), "a", "b").head()
    assert(const.isNullAt(1))
    intercept[IllegalArgumentException] {
      graft.relops.Stats.spearmanCorr(
        Seq((1.5, 2L), (2.5, 3L)).toDF("a", "b"), "a", "b")
    }
  }

  test("spearmanCorr: complete-case — asymmetric NULLs equal dropping those rows up front") {
    // NULLs in ONE column only (the asymmetric case where rank-mass
    // leakage from all-rows histograms would NOT cancel): result must
    // equal Spearman over the complete rows alone
    val withNulls = Seq(
      (Some(1L), Some(10L)),
      (Some(2L), Some(20L)),
      (None: Option[Long], Some(99L)),
      (None: Option[Long], Some(1L)),
      (Some(3L), Some(20L)),
      (Some(4L), Some(40L))).toDF("a", "b")
    val complete = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 40L)).toDF("a", "b")
    val got  = graft.relops.Stats.spearmanCorr(withNulls, "a", "b").head()
    val want = graft.relops.Stats.spearmanCorr(complete, "a", "b").head()
    assert(got.getLong(0) == 4L, "n counts complete rows only")
    assert(got.getDouble(1) == want.getDouble(1), s"got $got want $want")
  }

  test("simpsonDiversity: uniform vocabulary hits n_types, skew shrinks it") {
    val df = Seq(
      ("u", "a b c d"),        // uniform: invSimpson = 16/4 = 4 = n_types
      ("s", "a a a a a b c")). // skewed: 49/(25+1+1) = 49/27
      toDF("source", "text")
    val got = TextStats.simpsonDiversity(df, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("u") == ((4L, 4L, 4.0)))
    assert(got("s") == ((3L, 7L, math.rint(49.0 / 27 * 1e6) / 1e6)))
  }

  test("labelCentroidSim: hand-computed means and pairwise cosines") {
    val df = Seq(
      (0L, Seq(2f, 0f), 0), (1L, Seq(4f, 0f), 0),   // mean [3, 0]
      (2L, Seq(0f, 1f), 1), (3L, Seq(0f, 3f), 1),   // mean [0, 2]
      (4L, Seq(1f, 1f), 2), (5L, Seq(3f, 3f), 2))   // mean [2, 2]
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidSim(df, "label", "embedding", dim = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 1)) == 0.0)
    assert(got((0, 2)) == 0.707107) // cos 45 degrees
    assert(got((1, 2)) == 0.707107)
  }

  test("normStats: exact min/max, decimal-exact mean per label") {
    val df = Seq(
      (0L, Seq(3f, 4f), 0), (1L, Seq(0f, 0f), 0),
      (2L, Seq(0f, 2f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.normStats(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(0) == ((2L, 0.0, 2.5, 5.0)))
    assert(got(1) == ((1L, 2.0, 2.0, 2.0)))
  }

  test("mmrRerank: pushes a duplicate of the first pick below a diverse candidate") {
    // ids 1 and 2 share an embedding (a near-dup pair); id 3 is
    // equally relevant but diverse. Plain top-2 returns (1,2);
    // MMR at lambda=0.5 must return (1,3).
    val v  = Seq(0.9f, 0.435889894354f)
    val v3 = Seq(0.9f, -0.435889894354f)
    val df = Seq((1L, v), (2L, v), (3L, v3)).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df, "vec_id", "embedding", query = Seq(1.0, 0.0), k = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L), got.toSeq.toString)
    assert(math.abs(got(0)._3 - 0.45) < 1e-9) // 0.5*0.9, empty-set penalty 0
    assert(math.abs(got(1)._3 - 0.14) < 1e-9) // 0.5*0.9 - 0.5*0.62
    val plain = Similarity.cosineTopK(df, "vec_id", "embedding", Seq(1.0, 0.0), k = 2)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(1L, 2L), "sanity: relevance-only top-2 keeps the duplicate")
    // duplicate IDS (not just duplicate vectors) must not desync the
    // greedy loop: one candidate slot per id, no crash
    val dupIds = Seq((1L, v), (1L, v), (3L, v3)).toDF("vec_id", "embedding")
    val dd = Similarity.mmrRerank(dupIds, "vec_id", "embedding", Seq(1.0, 0.0), k = 3)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(dd == Seq(1L, 3L), dd.toString)
  }

  test("pcaWhiten: whitened sample covariance is the identity, mean is zero") {
    val rnd = new scala.util.Random(42)
    val dim = 4
    // anisotropic full-rank data: mixed uniforms with very different scales
    val rows = (0 until 200).map { i =>
      val z = Array.fill(dim)(rnd.nextDouble() - 0.5)
      val x = Array(
        10.0 * z(0) + 2.0 * z(1) + 3.0,
        2.0 * z(0) + 1.0 * z(1) - 1.0,
        0.5 * z(2) + 0.1 * z(3),
        0.1 * z(2) + 0.7 * z(3) + 5.0)
      (i.toLong, x.map(_.toFloat).toSeq)
    }
    val df  = rows.toDF("vec_id", "embedding")
    val out = Similarity.pcaWhiten(df, "embedding", "white", dim)
    val w   = out.select(col("white")).collect().map(_.getSeq[Double](0).toArray)
    val n   = w.length.toDouble
    val mean = (0 until dim).map(d => w.map(_(d)).sum / n)
    mean.foreach(m => assert(math.abs(m) < 1e-9, s"whitened mean $mean"))
    for (i <- 0 until dim; j <- 0 until dim) {
      val cij = w.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cij - want) < 1e-7, s"cov($i,$j)=$cij")
    }
  }

  test("heapsFit: exact exponents on all-distinct and constant vocabularies") {
    // every token unique -> V = N at every checkpoint -> beta 1, int 0
    val uniq = (0L until 8L).map(i => (i, s"t${i}a t${i}b t${i}c")).toDF("doc_id", "text")
    val r1 = TextStats.heapsFit(uniq, "doc_id", "text", checkpoints = 4).collect()(0)
    assert(r1.getDouble(1) == 1.0 && r1.getDouble(2) == 0.0, r1.toString)
    // one type ever -> ln V = 0 everywhere -> beta 0, intercept 0
    val const = (0L until 8L).map(i => (i, "x x x x")).toDF("doc_id", "text")
    val r2 = TextStats.heapsFit(const, "doc_id", "text", checkpoints = 4).collect()(0)
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(2) == 0.0, r2.toString)
    // degenerate: a single doc puts every checkpoint at the same N ->
    // no fit, NULL loudly (not NaN)
    val one = Seq((0L, "a b c")).toDF("doc_id", "text")
    val r3 = TextStats.heapsFit(one, "doc_id", "text", checkpoints = 4).collect()(0)
    assert(r3.isNullAt(1) && r3.isNullAt(2), r3.toString)
  }

  test("ksStatistic: hand-computed CDF gaps; identical groups at 0, disjoint at 1") {
    import graft.relops.Stats
    val df = (
      Seq(1L, 2L, 3L, 4L).map(v => ("g1", v)) ++
      Seq(3L, 4L, 5L, 6L).map(v => ("g2", v)) ++
      Seq(1L, 2L, 3L, 4L).map(v => ("g3", v)) ++  // identical to g1
      Seq(10L, 11L).map(v => ("g4", v))           // disjoint from all
    ).toDF("src", "v")
    val got = Stats.ksStatistic(df, "src", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    assert(got(("g1", "g2")) == 0.5) // CDF gap peaks at v in {2, 4}
    assert(got(("g1", "g3")) == 0.0) // identical distributions
    assert(got(("g1", "g4")) == 1.0) // fully separated supports
    assert(got(("g2", "g4")) == 1.0)
    val dbl = Seq(("g", 1.5)).toDF("src", "v")
    val e = intercept[IllegalArgumentException](Stats.ksStatistic(dbl, "src", "v"))
    assert(e.getMessage.contains("integral"))
  }

  test("tableProfile: per-column null and distinct counts in schema order") {
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(1L), None),
      (Some(2L), Some("b")),
      (None, Some("b")))
      .toDF("k", "v")
    val got = graft.relops.Stats.tableProfile(df).orderBy("ordinal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1, "k", 1L, 2L, 4L), (2, "v", 1L, 2L, 4L)))
  }

  test("winsorize: NULL values stay NULL, all-NULL groups survive, doubles refused") {
    import graft.relops.Stats
    // group g: 1..10 clamps to [1,9] at (0.1, 0.9); one NULL row must
    // NOT be fabricated to lo_v (least/greatest skip NULLs)
    val df = (
      (1 to 10).map(v => ("g", Some(v.toLong))) ++ Seq(("g", None), ("z", None), ("z", None))
    ).toDF("grp", "v")
    val out = Stats.winsorize(df, "grp", "v", loProb = 0.1, hiProb = 0.9).collect()
    assert(out.length == 13, "left join must keep every input row incl. the all-NULL group")
    val gNull = out.filter(r => r.getString(0) == "g" && r.isNullAt(1))
    assert(gNull.length == 1 && gNull.head.isNullAt(2) && !gNull.head.getBoolean(3),
      "NULL value → clamped NULL, is_clipped false")
    val zRows = out.filter(_.getString(0) == "z")
    assert(zRows.length == 2 && zRows.forall(r => r.isNullAt(2) && !r.getBoolean(3)),
      "all-NULL group has no bounds row but keeps its rows")
    val clamped = out.filter(r => r.getString(0) == "g" && !r.isNullAt(1))
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(clamped(1L) == 1L && clamped(10L) == 9L && clamped(5L) == 5L)
    // fractional domains are refused loudly, not silently truncated
    val dbl = Seq(("g", 1.5), ("g", 2.5)).toDF("grp", "v")
    val e1 = intercept[IllegalArgumentException](Stats.winsorize(dbl, "grp", "v", 0.1, 0.9))
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException](Stats.histogramQuantiles(dbl, "grp", "v", Seq(0.5)))
    assert(e2.getMessage.contains("integral"))
  }

  test("zipfFit: degenerate single-type vocabulary yields NULL slope, not NaN") {
    val one = Seq((1L, "spam spam spam spam")).toDF("doc_id", "text")
    val r   = TextStats.zipfFit(one, "text", topV = 10).collect()(0)
    assert(r.getInt(0) == 1)
    assert(r.isNullAt(1) && r.isNullAt(2), s"expected NULL slope/intercept, got $r")
  }

  test("gopherRepetition: top-n-gram char fractions and within-doc dup fractions") {
    // "a b a b a b c" (13 chars): top 2-gram "a b"×3 (len 3) →
    // 9/13; top 3-gram tie ("a b a"×2, "b a b"×2) → lexicographic
    // "a b a", 10/13; top 4-gram "a b a b"×2 (len 7) → 14/13 (>1 is
    // legal with overlaps). 5..7-grams all distinct → dup 0.
    val df = Seq(
      (1L, "a b a b a b c"),
      (2L, "x y x y x y x y x y"), // alternating: 6 5-grams, 2 distinct
      (3L, "q")) // sub-gram-length doc: all signals 0
      .toDF("doc_id", "text")
    val got = TextStats.gopherRepetition(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail.map(_.asInstanceOf[Double])).toMap
    val d1 = got(1L)
    assert(d1(0) == math.rint(9.0 / 13 * 1e6) / 1e6)
    assert(d1(1) == math.rint(10.0 / 13 * 1e6) / 1e6)
    assert(d1(2) == math.rint(14.0 / 13 * 1e6) / 1e6)
    assert(d1.drop(3).forall(_ == 0.0), d1.toString)
    val d2 = got(2L)
    assert(d2(3) == 0.666667, d2.toString) // dup5: (6-2)/6
    assert(got(3L).forall(_ == 0.0))
  }

  test("compressionRatio separates templated text from high-entropy text") {
    val df = Seq(
      (1L, "spam " * 200),                       // pure repetition → tiny ratio
      (2L, (1 to 200).map(i => (i * 2654435761L).toHexString).mkString(" ")), // hash soup
      (3L, "")) // empty: defined as 1.0
      .toDF("doc_id", "text")
    val got = TextStats.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) < 0.05, s"templated text should crush: ${got(1L)}")
    assert(got(2L) > 0.5, s"hash soup should not: ${got(2L)}")
    assert(got(3L) == 1.0)
    // deterministic across runs (fixed deflate level)
    val again = TextStats.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == got)
  }

  test("sourceOverlap: exact pairwise n-gram set Jaccard and containment") {
    val df = Seq(
      ("A", "a b c d"), ("B", "a b c e"), ("C", "p q r"))
      .toDF("source", "text")
    val got = Curation.sourceOverlap(df, "source", "text", n = 2).collect()
    // A grams {ab,bc,cd}, B {ab,bc,ce}: ∩=2, jaccard 2/4, cont 2/3;
    // C shares nothing → no (A,C)/(B,C) rows
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.666667)
  }

  test("tfidfTopTerms ranks by tf*idf, breaks ties lexicographically, zeroes ubiquitous terms") {
    val df = Seq(
      (1L, "a a b z"),
      (2L, "a c z"),
      (3L, "b c c z")).toDF("doc_id", "text")
    val got = TextStats.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    // doc 1: a (tf=2) beats b (tf=1), both df=2
    assert(got.filter(_.getLong(0) == 1L).map(_.getString(1)).toSeq == Seq("a", "b"))
    // doc 2: a and c tie on score → lexicographic term order
    assert(got.filter(_.getLong(0) == 2L).map(_.getString(1)).toSeq == Seq("a", "c"))
    // z appears in every doc → idf = ln(1) = 0 → never in top-2
    assert(!got.map(_.getString(1)).contains("z"))
    val doc1a = got.find(r => r.getLong(0) == 1L && r.getString(1) == "a").get
    assert(math.abs(doc1a.getAs[Double]("score") - 2 * math.log(1.5)) < 1e-5)
  }

  test("bm25TopK ranks term-dense short docs first and ignores absent terms") {
    val df = Seq(
      (1L, "spark spark data"),          // dense in query terms
      (2L, "spark and a lot of other words that dilute the match badly"),
      (3L, "nothing relevant here at all"),
      (4L, "data query")                 // two distinct terms, short doc
    ).toDF("doc_id", "text")
    val got = TextStats.bm25TopK(df, "doc_id", "text", Seq("spark", "data", "query"), k = 4)
      .orderBy("rank").collect()
    val order = got.map(_.getLong(0)).toSeq
    assert(order.head == 4L || order.head == 1L) // term-dense docs on top
    assert(order.last == 3L)                     // no query terms → minimum score
    assert(got.map(_.getAs[Double]("score")).toSeq.reverse == got.map(_.getAs[Double]("score")).toSeq.sorted)
    assert(got.last.getAs[Double]("score") == 0.0)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fp = (t: String) =>
      Seq(Tuple1(t)).toDF("text").select(TextStats.fingerprint(col("text"))).head.getLong(0)
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
    assert(fp("a b c") >= 0)
  }

  test("winnowFingerprints: shared long overlap guarantees a shared fingerprint") {
    val overlap = (1 to 12).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta gamma $overlap"),
      (2L, s"$overlap delta epsilon zeta eta"),
      (3L, "completely different words everywhere now")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text", n = 3, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // w+n-1 = 6 < 12 shared tokens → docs 1,2 must share a hash
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // identical docs → identical fingerprint sets (positions included)
    val dup  = Seq((1L, s"alpha beta gamma $overlap"), (2L, s"alpha beta gamma $overlap")).toDF("doc_id", "text")
    val dfps = Dedup.winnowFingerprints(dup, "doc_id", "text", n = 3, w = 4).collect()
    val d1   = dfps.filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getLong(2))).toSet
    val d2   = dfps.filter(_.getLong(0) == 2L).map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(d1 == d2 && d1.nonEmpty)
    // density: ~1 fingerprint per window, never more than n_grams
    assert(byDoc(1L).size <= 13)
  }

  test("winnowFast path equals the expression form on real data") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val fast = Dedup.winnowFingerprints(d, "doc_id", "text", n = 3, w = 4)
      .collect().map(_.toString).sorted.toSeq
    val expr = Dedup.winnowFingerprintsExpr(d, "doc_id", "text", n = 3, w = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(fast == expr)
  }

  test("winnowFingerprints: short docs yield exactly one fingerprint") {
    val df  = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(df, "doc_id", "text", n = 3, w = 4).collect()
    assert(got.count(_.getLong(0) == 1L) == 1) // one gram, one window
    assert(got.count(_.getLong(0) == 2L) == 1) // empty-string gram
  }

  test("rrfFusion sums reciprocal ranks across lists and ranks deterministically") {
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val l2 = Seq((20L, 1), (10L, 2)).toDF("doc_id", "rank")
    val got = Similarity.rrfFusion(Seq(l1, l2), "doc_id", k = 3).orderBy("rank").collect()
    // doc 20: 1/62 + 1/61 > doc 10: 1/61 + 1/62 — equal! tie → id asc ⇒ 10 first
    val r10 = 1.0 / 61 + 1.0 / 62
    assert(got(0).getLong(0) == 10L && got(1).getLong(0) == 20L && got(2).getLong(0) == 30L)
    assert(math.abs(got(0).getAs[Double]("rrf") - r10) < 1e-6)
    assert(got(0).getAs[Int]("n_lists") == 2)
    assert(got(2).getAs[Int]("n_lists") == 1)
  }

  test("int8TopK approximates the float dot product within quantization error") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.5f, -0.25f, 0.0f)),
      (1L, Array(0.9f, 0.4f, -0.2f, 0.1f)),
      (2L, Array(-1.0f, 0.3f, 0.8f, 0.6f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q   = Seq(1.0, 0.5, -0.25, 0.0)
    val got = Similarity.int8TopK(vecs, "vec_id", "embedding", q, k = 4).collect()
    got.foreach { r =>
      val vid  = r.getLong(0)
      val v    = vecs.filter(col("vec_id") === vid).head.getSeq[Float](1).map(_.toDouble)
      val truth = v.zip(q).map { case (a, b) => a * b }.sum
      // int8 SQ error bound: ~|v||q|·(1/127)·2 per element sum — loose 0.05 here
      assert(math.abs(r.getAs[Double]("score_q8") - truth) < 0.05, s"vec $vid")
    }
    // zero vector scores exactly 0; the anti-aligned vector (negative
    // dot) ranks below it
    assert(got.find(_.getLong(0) == 3L).get.getAs[Double]("score_q8") == 0.0)
    assert(got.maxBy(_.getAs[Int]("rank")).getLong(0) == 2L)
  }

  test("hot-key stress: mass-duplicated doc + mega-doc stay bounded through every pair emitter") {
    // adversarial lake: 200 byte-identical copies of one boilerplate
    // doc (the LSH/shingle hot key), one 20k-token mega-doc, 40 unique
    // docs, and ONE crafted near-dup pair that must still be found.
    // maxDf = 20 for every emitter: the hot key's posting lists (df
    // 200) must be dropped whole — emitting its pairs would be
    // C(200,2) ≈ 20k rows per shingle/band, the n² blowup the caps
    // exist to prevent at 100 TB.
    val rnd = new scala.util.Random(5)
    def uniqueText(tag: String, n: Int) =
      (0 until n).map(i => s"u${tag}x${i}w${rnd.nextInt(1000000)}").mkString(" ")
    val sharedRun = (0 until 40).map(i => s"sharedrun$i").mkString(" ")
    val hot  = (0 until 200).map(i => (1000L + i, "g", "hot boilerplate tokens repeated verbatim in every copy of this mass duplicated doc"))
    val mega = Seq((2000L, "g", (0 until 20000).map(i => s"mega$i").mkString(" ")))
    val uniq = (0 until 40).map(i => (i.toLong, "g", uniqueText(s"d$i", 30)))
    val nearA = (3000L, "g", sharedRun + " " + uniqueText("na", 5))
    val nearB = (3001L, "g", sharedRun + " " + uniqueText("nb", 5))
    val lake  = (hot ++ mega ++ uniq ++ Seq(nearA, nearB)).toDF("doc_id", "bucket", "text")

    // per-task shuffle-read bound via listener (async bus → poll)
    val maxRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          maxRead.getAndUpdate(v => math.max(v, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val lsh = Dedup
        .minhashLshPairs(lake, "doc_id", "text", maxDf = 20)
        .collect()
      val jac = Dedup
        .ngramJaccardPairsCapped(lake, "bucket", "doc_id", "text", maxDf = 20)
        .collect()
      val sub = Dedup
        .substringDedupPairs(lake, "doc_id", "text", maxDf = 20, topK = 20)
        .collect()
      def ids(rs: Array[org.apache.spark.sql.Row]) =
        rs.flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      // hot copies emit ZERO pairs everywhere (dropped buckets), so
      // output is near-dup-sized, not 20k-sized
      assert(!ids(lsh).exists(id => id >= 1000L && id < 2000L), "hot ids leaked into LSH pairs")
      assert(!ids(jac).exists(id => id >= 1000L && id < 2000L), "hot ids leaked into jaccard pairs")
      assert(!ids(sub).exists(id => id >= 1000L && id < 2000L), "hot ids leaked into substring pairs")
      assert(lsh.length < 100, s"LSH pair fan-out ${lsh.length}")
      assert(jac.length < 100, s"jaccard pair fan-out ${jac.length}")
      // the crafted near-dup pair still surfaces in both content paths
      assert(ids(jac).contains(3000L) && ids(jac).contains(3001L), "near-dup pair lost by jaccard cap")
      val subPair = sub.find(r => r.getAs[Long]("id_a") == 3000L && r.getAs[Long]("id_b") == 3001L)
      assert(subPair.isDefined, "near-dup pair lost by substring cap")
      assert(subPair.get.getAs[Int]("max_shared_tokens") >= 30, s"run length ${subPair.get}")
      // task input bound: no task read a hot-key-squared record set.
      // Uncapped, the hot doc alone is C(200,2) pairs × ~10 shingles
      // ≈ 200k records through one task; capped, everything any task
      // reads stays fixture-sized.
      val deadline = System.currentTimeMillis() + 5000
      while (System.currentTimeMillis() < deadline && maxRead.get() == 0) Thread.sleep(100)
      assert(maxRead.get() > 0, "listener saw no shuffle reads (metrics wiring broke?)")
      assert(maxRead.get() < 100000, s"a task read ${maxRead.get()} shuffle records — hot key not bounded")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("hardNegatives mines the nearest out-of-class vectors per class") {
    // two well-separated clusters + one label-1 vector planted inside
    // cluster 0 — it must be label 0's top negative
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, 1, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (3L, 1, Array(0.0f, 0.1f, 0.9f, 0.0f)),
      (4L, 1, Array(0.95f, 0.05f, 0.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegatives(vecs, "label", "vec_id", "embedding", k = 2)
    val rows = got.collect()
    rows.foreach(r => assert(r.getAs[Int]("neg_label") != r.getAs[Int]("label")))
    rows.foreach(r => assert(r.getAs[Int]("rank") <= 2))
    val top0 = rows.filter(r => r.getAs[Int]("neg_label") == 0).minBy(_.getAs[Int]("rank"))
    assert(top0.getAs[Long]("vec_id") == 4L)
  }
}
