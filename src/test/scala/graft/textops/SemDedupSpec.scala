package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-3 training-data additions: SemDeDup,
  * bigram-LM xent (stupid backoff), hashed linear quality scorer.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two planted near-dup groups far apart in R^4, padded arrays as
  // float (the operator casts to double like the parquet path)
  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // cluster A seed
    (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),  // cluster B seed
    (2L, Seq(0.99f, 0.14f, 0.0f, 0.0f)), // near-dup of 0 (cos≈0.99)
    (3L, Seq(0.0f, 0.98f, 0.2f, 0.0f)),  // near-dup of 1
    (4L, Seq(0.6f, 0.0f, 0.8f, 0.0f))    // cluster A, NOT a dup (cos=0.6)
  ).toDF("vec_id", "embedding")

  test("semDedup drops τ-similar followers, keeps outliers and uniques") {
    val out = Similarity
      .semDedup(vecs, "vec_id", "embedding", tau = 0.9, nCentroids = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    // every input row appears with a verdict
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L))
    // exactly one of each τ-similar pair survives
    assert(out(0L)._3 ^ out(2L)._3)
    assert(out(1L)._3 ^ out(3L)._3)
    // the survivor is the one FARTHER from its centroid (paper keeps
    // outliers): centroid A is vec 0 itself, so cos_c(0)=1.0 > cos_c(2)
    // → 2 survives, 0 drops
    assert(!out(0L)._3 && out(2L)._3)
    // non-dup cluster member always survives
    assert(out(4L)._3)
    // clusters bound the pair space: 0/2/4 share a cluster, 1/3 the other
    assert(out(0L)._1 == out(2L)._1 && out(2L)._1 == out(4L)._1)
    assert(out(1L)._1 == out(3L)._1 && out(0L)._1 != out(1L)._1)
  }

  test("semDedup scale shape: kmeans-learned centroids bound the pair space to Σ|cluster|² ≪ N²") {
    // the q_semdedup_scaled configuration (32 learned centroids, one
    // Lloyd round) on real testdata embeddings — the claim the
    // operator's scaladoc makes for 100 TB, checked: the pair join's
    // input is Σ|cluster|², a fraction of N², and the pair stage is a
    // plan-level equi-join on cluster_id (never a cartesian)
    val emb     = graft.lake.Tables.embeddings(spark, sf0001)
    val learned = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 32, iters = 1)
    val out = Similarity.semDedup(
      emb, "vec_id", "embedding", tau = 0.35, nCentroids = 32, learnedCentroids = Some(learned))
    val sizes = out.groupBy(col("cluster_id")).count().collect().map(_.getLong(1))
    val n     = sizes.sum.toDouble
    val pairSpace = sizes.map(s => s.toDouble * s).sum
    assert(sizes.length > 16, s"learned centroids should populate >16 clusters, got ${sizes.length}")
    assert(pairSpace < n * n / 8.0,
      s"pair space Σ|c|²=$pairSpace should be ≪ N²=${n * n} (ratio ${pairSpace / (n * n)})")
    assert(sizes.max < n / 4.0, s"max cluster ${sizes.max} of ${n.toLong} rows is not bounded")
    // plan audit: cluster_id equi-join, no cartesian/nested-loop pair stage
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair stage must be an equi-join:\n$plan")
    assert(plan.contains("cluster_id"), "join key cluster_id missing from the physical plan")
  }

  test("semDedup with tau above all similarities keeps everything") {
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", tau = 0.999999, nCentroids = 2)
    assert(out.filter(!col("is_kept")).count() == 0)
  }

  private val lmDocs = Seq(
    (1L, "a b a b a b"),
    (2L, "a b c"),
    (3L, "z")) // single token: no bigram events
    .toDF("doc_id", "text")

  test("bigramXent: seen bigrams score C(bg)/C(prev); unseen back off to 0.4·p_uni") {
    val out = TextStats
      .bigramXent(lmDocs, "doc_id", "text", bigramK = 10, vocabK = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    // corpus: tokens a×4,b×4,c×1,z×1 (total 10); bigrams ab×4, ba×2, bc×1
    // doc 1 events: ab,ba,ab,ba,ab → lp = 3·ln(4/4) + 2·ln(2/4)
    val d1 = -(3 * math.log(4.0 / 4) + 2 * math.log(2.0 / 4)) / 5
    assert(math.abs(out(1L)._2 - d1) < 1e-6 && out(1L)._1 == 5)
    // doc 2: ab → ln(4/4); bc → ln(1/4)
    val d2 = -(math.log(4.0 / 4) + math.log(1.0 / 4)) / 2
    assert(math.abs(out(2L)._2 - d2) < 1e-6 && out(2L)._1 == 2)
    // single-token doc has no bigram events → absent from output
    assert(!out.contains(3L))
  }

  test("bigramXent backoff path: bigram outside top-k uses 0.4·unigram") {
    // bigramK=1 keeps only ab (count 4); ba and bc back off
    val byId = TextStats
      .bigramXent(lmDocs, "doc_id", "text", bigramK = 1, vocabK = 10)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    // doc 2: ab seen → ln(4/4); bc backs off → ln(0.4·(1/10))
    val d2 = -(math.log(4.0 / 4) + math.log(0.4 * (1.0 / 10))) / 2
    assert(math.abs(byId(2L) - d2) < 1e-6)
  }

  test("bigramXentTransfer scores against the REFERENCE model, not the scored corpus") {
    // ref corpus = doc 1 only ("a b a b a b"): tokens a×3,b×3
    // (total 6); bigrams ab×3, ba×2. c is OOV to the reference even
    // though the SCORED corpus contains it — the CCNet property.
    val ref = lmDocs.filter(col("doc_id") === 1L)
    val out = TextStats
      .bigramXentTransfer(ref, lmDocs, "doc_id", "text", bigramK = 10, vocabK = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    // doc 1: ab,ba,ab,ba,ab → 3·ln(3/3) + 2·ln(2/3)
    val d1 = -(3 * math.log(3.0 / 3) + 2 * math.log(2.0 / 3)) / 5
    assert(math.abs(out(1L)._2 - d1) < 1e-6 && out(1L)._1 == 5)
    // doc 2: ab seen in ref → ln(3/3); bc unseen, c OOV in ref →
    // ln(0.4 · 0.5/6)
    val d2 = -(math.log(3.0 / 3) + math.log(0.4 * 0.5 / 6)) / 2
    assert(math.abs(out(2L)._2 - d2) < 1e-6 && out(2L)._1 == 2)
    // self-fit would use corpus-wide counts (a×4, ab×4) — different
    // numbers; the single-arg form still does
    val self = TextStats.bigramXent(lmDocs, "doc_id", "text", bigramK = 10, vocabK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(self(2L) - out(2L)._2) > 1e-3)
  }

  test("knBigramXent: interpolated Kneser–Ney probabilities, hand-computed") {
    // corpus: "a b", "a b", "a c" → events (a,b)×2, (a,c)×1.
    // bg: ab:2, ac:1; ctx a: cw1=3, N1+(a·)=2; cont: N1+(·b)=1,
    // N1+(·c)=1; types=2. D=0.75:
    //   P(b|a) = (2−.75)/3 + (.75·2/3)·(1/2) = 0.41666. + 0.25
    //   P(c|a) = (1−.75)/3 + (.75·2/3)·(1/2) = 0.08333. + 0.25
    val kn = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextStats.knBigramXent(kn, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val pb = (2.0 - 0.75) / 3 + (0.75 * 2 / 3) * 0.5
    val pc = (1.0 - 0.75) / 3 + (0.75 * 2 / 3) * 0.5
    assert(math.abs(pb + pc - 1.0) < 1e-12) // KN sums to 1 per context
    assert(out(1L)._1 == 1 && math.abs(out(1L)._2 - -math.log(pb)) < 1e-6)
    assert(out(3L)._1 == 1 && math.abs(out(3L)._2 - -math.log(pc)) < 1e-6)
  }

  test("knBigramXent: discounted mass reallocates by continuation count, not raw frequency") {
    // "x b" repeated: b is frequent as a CONTINUATION of only one
    // context; "y c" ×1 and "z c" ×1: c continues two contexts.
    // Under KN, P(c|·) gets the larger continuation share even
    // though b has more raw occurrences — the burstiness correction
    // that distinguishes KN from stupid backoff.
    val kn = Seq((1L, "x b x b x b"), (2L, "y c"), (3L, "z c")).toDF("doc_id", "text")
    // bg: xb:3, bx:2, yc:1, zc:1 → types=4; N1+(·b)=1, N1+(·c)=2
    val out = TextStats.knBigramXent(kn, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // P(c|y) = (1−.75)/1 + (.75·1/1)·(2/4) = 0.625
    assert(math.abs(out(2L) - -math.log((1 - 0.75) / 1.0 + 0.75 * 1 * (2.0 / 4))) < 1e-6)
  }

  test("trigramXent: seen trigrams score C(tg)/C(ctx); two-level backoff below") {
    // corpus: tokens a×4,b×4,c×1,z×1 (total 10); bigrams ab×4, ba×2,
    // bc×1; trigrams aba×2, bab×2, abc×1
    val out = TextStats
      .trigramXent(lmDocs, "doc_id", "text", trigramK = 10, bigramK = 10, vocabK = 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    // doc 1 events: aba, bab, aba, bab → 2·ln(2/4) + 2·ln(2/2)
    val d1 = -(2 * math.log(2.0 / 4) + 2 * math.log(2.0 / 2)) / 4
    assert(math.abs(out(1L)._2 - d1) < 1e-6 && out(1L)._1 == 4)
    // doc 2: abc → ln(1/4)
    val d2 = -math.log(1.0 / 4) / 1
    assert(math.abs(out(2L)._2 - d2) < 1e-6 && out(2L)._1 == 1)
    // single-token doc has no trigram events → absent
    assert(!out.contains(3L))
  }

  test("trigramXent backoff: tg-miss → 0.4·C(w2w3)/C(w2); bg-miss → 0.16·p_uni") {
    // trigramK=1 keeps only aba (ties break lexicographic); bigramK=1
    // keeps only ab
    val byId = TextStats
      .trigramXent(lmDocs, "doc_id", "text", trigramK = 1, bigramK = 1, vocabK = 10)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .toMap
    // doc 1: aba hits (ctx ab kept) → ln(2/4); bab misses, its (a,b)
    // backoff bigram IS kept, w2=a in vocab → ln(0.4·4/4); ×2 each
    val d1 = -(2 * math.log(2.0 / 4) + 2 * math.log(0.4 * 4.0 / 4)) / 4
    assert(math.abs(byId(1L) - d1) < 1e-6)
    // doc 2: abc misses tgtop; (b,c) missing from bgtop → third level:
    // ln(0.16 · cnt(c)/total) = ln(0.16 · 1/10)
    val d2 = -math.log(0.16 * (1.0 / 10)) / 1
    assert(math.abs(byId(2L) - d2) < 1e-6)
  }

  test("prototypePrune keeps ceil(4n/5) per cluster, dropping the far tail") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),     // cluster 0 prototype
      (1L, Seq(0.99f, 0.14f)),   // close
      (2L, Seq(0.9f, 0.43f)),    // mid
      (3L, Seq(0.8f, 0.6f)),     // mid
      (4L, Seq(0.71f, 0.7f)),    // cluster 0 far tail (cos .71 to c0, just under c1)
      (5L, Seq(0.0f, 1.0f)),     // cluster 1 prototype
      (6L, Seq(0.1f, 0.99f)))    // cluster 1
      .toDF("vec_id", "embedding")
    val cents = Some(Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))))
    val out = Similarity
      .prototypePrune(emb, "vec_id", "embedding", learnedCentroids = cents)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3), r.getInt(4)))
      .toMap
    // cluster 0 has 5 members (ids 0-4) → keep ceil(20/5)=4: id 4 (the
    // lowest cosine-to-centroid) is pruned
    assert(!out.contains(4L), s"far-tail row survived: $out")
    assert(out(0L) == ((0, 1, 5)) && out.count(_._2._1 == 0) == 4)
    // cluster 1 has 2 members → keep ceil(8/5)=2: nothing pruned
    assert(out(5L)._1 == 1 && out(6L)._1 == 1)
    // singleton clusters are never emptied: ceil(4/5) = 1
    val solo = Similarity.prototypePrune(
      Seq((9L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", learnedCentroids = Some(Seq((0, Seq(1.0, 0.0)))))
    assert(solo.count() == 1)
  }

  test("kmvDistinct: exact below k, sane estimate above k") {
    val docs = Seq(
      (1L, "small", "a b c"),                       // 3 distinct < k
      (2L, "big", (1 to 200).map(i => s"t$i").mkString(" ")),
      (3L, "big", (150 to 300).map(i => s"t$i").mkString(" "))) // 300 distinct total
      .toDF("doc_id", "grp", "text")
    val out = TextStats.kmvDistinct(docs, "grp", "text", k = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // under k: estimate IS the exact count, rel_err 0
    assert(out("small") == ((3L, 3.0, 0.0)))
    // over k: exact 300; the KMV estimate is unbiased-ish — accept a
    // generous band (k=16 → ~25% std), but it must differ from exact
    val (n, est, _) = out("big")
    assert(n == 300L && est > 100.0 && est < 900.0 && est != 300.0)
    // deterministic across invocations
    val again = TextStats.kmvDistinct(docs, "grp", "text", k = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again("big") == est)
  }

  test("hashedLinearScore: deterministic, respects injected weights") {
    val docs = Seq((1L, "x x x"), (2L, "x y")).toDF("doc_id", "text")
    // all-positive weights → every logit positive, keep everywhere
    val pos = Curation
      .hashedLinearScore(docs, "doc_id", "text", nBuckets = 4, weights = Some(Seq(0.5, 0.5, 0.5, 0.5)))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    assert(pos.toSeq == Seq((1L, 3, 0.5, true), (2L, 2, 0.5, true)))
    // default md5-derived weights are stable across invocations
    val a = Curation.hashedLinearScore(docs, "doc_id", "text").collect().toSeq
    val b = Curation.hashedLinearScore(docs, "doc_id", "text").collect().toSeq
    assert(a == b)
  }
}
