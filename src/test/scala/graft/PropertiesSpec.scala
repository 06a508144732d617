package graft

import graft.expressions.TokenF1
import graft.extract.Clean
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests (SURVEY §5 rebuild item 3), batched: generate
  * cases with ScalaCheck, evaluate in one DataFrame pass per
  * property (per-case Spark jobs would be pathologically slow).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val word  = Gen.oneOf("a", "bb", "ccc", "x1", "the", "spark", "data", "")
  private val text  = Gen.listOfN(8, word).map(_.mkString(" "))
  private def cases(n: Int, g: Gen[(String, String)]): Seq[(String, String)] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("property: NFC normalization is idempotent, ASCII-stable, and matches the JDK reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val uniChar = Gen.oneOf(
      Gen.alphaNumChar,
      Gen.oneOf('\u00e9', 'e', '\u0301', '\uac00', '\u1100', '\u1161', '\u00df', '\u00c5', '\u212b', ' '))
    val uniText = Gen.listOfN(12, uniChar).map(_.mkString)
    val texts   = Gen.listOfN(300, uniText).apply(Gen.Parameters.default, Seed(7L)).get
    texts.foreach { s =>
      val once  = graft.expressions.NfcNormalize.compute(UTF8String.fromString(s)).toString
      val twice = graft.expressions.NfcNormalize.compute(UTF8String.fromString(once)).toString
      assert(twice == once, s"not idempotent on ${s.map(_.toInt.toHexString)}")
      assert(once == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      if (s.forall(_ < 128)) assert(once == s, s"ASCII not stable: $s")
    }
  }

  test("property: tokenF1 ∈ [0,1], symmetric, 1 iff equal token multisets") {
    val pairs = cases(300, Gen.zip(text, text))
    pairs.foreach { case (p, g) =>
      val f  = TokenF1.computeStr(p, g)
      val fr = TokenF1.computeStr(g, p)
      assert(f >= 0.0 && f <= 1.0, s"out of range: $f for ($p, $g)")
      assert(f == fr, s"not symmetric for ($p, $g)")
      val tp = p.split("\\s+").filter(_.nonEmpty).sorted.toSeq
      val tg = g.split("\\s+").filter(_.nonEmpty).sorted.toSeq
      if (tp == tg) assert(f == 1.0)
    }
  }

  test("property: cleanPrediction is idempotent") {
    val vals = cases(200, Gen.zip(text.map("budget: " + _), Gen.const("budget"))).map(_._1)
    val df   = vals.toDF("v")
    val once  = Clean.cleanPrediction(col("v"), lit("budget"))
    val diff = df
      .select(once.as("c1"))
      .select(col("c1"), Clean.cleanPrediction(col("c1"), lit("budget")).as("c2"))
      .filter(col("c1") =!= col("c2"))
      .count()
    assert(diff == 0)
  }

  test("property: NB equals majority vote under uniform accuracies (odd voters, no abstains)") {
    val docs = cases(150, Gen.zip(Gen.const(""), Gen.const("")))
      .indices.map { i =>
        (i.toLong, Gen.listOfN(3, Gen.oneOf(1, -1)).apply(Gen.Parameters.default, Seed(i.toLong)).get)
      }
    val votes = docs.flatMap { case (id, vs) =>
      vs.zipWithIndex.map { case (v, j) => (id, s"e$j", v) }
    }.toDF("doc_id", "extractor", "vote")
    val accs = Seq(("e0", 0.8), ("e1", 0.8), ("e2", 0.8)).toDF("extractor", "acc")
    val nb   = graft.combine.LabelModel.naiveBayesPredict(votes, accs, "doc_id")
    val mv = votes.groupBy("doc_id")
      .agg(sum("vote").as("s"))
      .withColumn("mv_pred", when(col("s") >= 0, 1).otherwise(-1))
    val disagree = nb.join(mv, "doc_id").filter(col("nb_pred") =!= col("mv_pred")).count()
    assert(disagree == 0)
  }

  test("property: asof join equals the naive greatest-≤ correlated lookup on random streams") {
    val n = 400
    val pairGen = Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 1000L))
    val leftRows = Gen.listOfN(n, pairGen).apply(Gen.Parameters.default, Seed(7L)).get
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) }
    // right side unique per (key, ts) — the operator's contract
    val rightRows = Gen.listOfN(n, pairGen).apply(Gen.Parameters.default, Seed(8L)).get
      .map { case (k, t) => (s"k$k", t) }.distinct
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong * 10) }
    val left  = leftRows.toDF("lid", "key", "lts")
    val right = rightRows.toDF("key", "rts", "payload")
    val got = graft.relops.AsOfJoin
      .asof(left, right, Seq("key"), "lts", "rts", Seq("payload"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    // naive reference: per left row, max rts ≤ lts within the key
    val byKey = rightRows.groupBy(_._1)
    leftRows.foreach { case (lid, k, lts) =>
      val expect = byKey.getOrElse(k, Seq.empty).filter(_._2 <= lts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(lid) == expect, s"lid=$lid key=$k ts=$lts")
    }
  }

  test("property: kmv_sketch equals sorted-distinct-take-k on random longs") {
    val valsGen = Gen.listOfN(500, Gen.choose(0L, 300L))
    (0 until 5).foreach { s =>
      val vals = valsGen.apply(Gen.Parameters.default, Seed(s.toLong)).get
      val sk = vals.toDF("h").repartition(7)
        .agg(graft.expressions.KmvSketch.kmvSketch(col("h"), 32))
        .head().getSeq[Long](0)
      assert(sk == vals.distinct.sorted.take(32))
    }
  }

  test("property: minhash signatures respect containment monotonicity on identical docs") {
    val texts = cases(50, Gen.zip(text, text)).map { case (a, b) => a + " " + b }.filter(_.trim.nonEmpty)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), graft.textops.Dedup.shinglesFast(col("t"), 3).as("sh"))
      .select(col("id"), graft.textops.Dedup.minhashFast(col("sh"), 8).as("sig"))
    // deterministic: same input text → same signature across evaluations
    val again = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), graft.textops.Dedup.shinglesFast(col("t"), 3).as("sh"))
      .select(col("id"), graft.textops.Dedup.minhashFast(col("sh"), 8).as("sig2"))
    assert(df.join(again, "id").filter(col("sig") =!= col("sig2")).count() == 0)
  }

  test("property: containment dominates Jaccard and both sit in (0,1] on random corpora") {
    val longText = Gen.listOfN(20, word).map(_.filter(_.nonEmpty).mkString(" "))
    val texts = Gen.listOfN(40, longText)
      .apply(Gen.Parameters.default, Seed(11L)).get.filter(_.split(" ").length >= 3)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, "g", t) }.toDF("id", "b", "t")
    val pairs = graft.textops.Dedup
      .containmentPairs(df, "b", "id", "t", n = 3, maxDf = 1000, minC = 0.0)
      .collect()
    assert(pairs.nonEmpty, "generator produced no overlapping shingles — weaken the corpus")
    pairs.foreach { r =>
      val (c, j) = (r.getAs[Double]("containment"), r.getAs[Double]("jaccard"))
      assert(c >= j - 1e-9, s"containment $c < jaccard $j")
      assert(c > 0.0 && c <= 1.0 + 1e-9 && j > 0.0 && j <= 1.0 + 1e-9, s"out of range: c=$c j=$j")
    }
  }

  test("property: prototypePrune keeps exactly ceil(4n/5) of every cluster, never empties one") {
    // random 2-d embeddings over 3 fixed centroids; the kept count per
    // cluster is a pure function of the cluster size
    val vecGen = Gen.zip(Gen.choose(-1.0, 1.0), Gen.choose(-1.0, 1.0))
      .suchThat { case (x, y) => math.abs(x) + math.abs(y) > 1e-3 }
    val vs = Gen.listOfN(60, vecGen).apply(Gen.Parameters.default, Seed(23L)).get
    val df = vs.zipWithIndex.map { case ((x, y), i) => (i.toLong, Seq(x.toFloat, y.toFloat)) }
      .toDF("vec_id", "embedding")
    val cents = Some(Seq((0, Seq(1.0, 0.0)), (1, Seq(-0.5, 0.9)), (2, Seq(-0.5, -0.9))))
    val out = graft.textops.Similarity
      .prototypePrune(df, "vec_id", "embedding", learnedCentroids = cents)
      .collect()
    val byCluster = out.groupBy(_.getAs[Int]("centroid_id"))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (cid, rows) =>
      val n    = rows.head.getAs[Int]("n_in_cluster")
      val want = math.ceil(4.0 * n / 5.0).toInt
      assert(rows.length == want, s"cluster $cid kept ${rows.length} of $n, want $want")
      assert(rows.map(_.getAs[Int]("rank_in_cluster")).sorted.toSeq == (1 to want),
        s"cluster $cid ranks not the 1..$want prefix")
    }
  }

  test("property: novelty and duplication views agree — novel_frac ≥ 1 − dup_frac, bounds hold") {
    import graft.textops.Curation
    // random corpora with heavy gram re-use so both views are non-trivial
    val doc   = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "ee", "ff")).map(_.mkString(" "))
    val texts = Gen.listOfN(60, doc).apply(Gen.Parameters.default, Seed(11L)).get
    val df    = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val nov = Curation.ngramNovelty(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val dup = Curation.dupNgramFraction(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    nov.foreach { case (id, (ng, nn, nf)) =>
      val (dg, _, dfr) = dup(id)
      assert(ng == dg, s"doc $id gram universes differ: $ng vs $dg")
      assert(nn >= 0 && nn <= ng && nf >= 0.0 && nf <= 1.0)
      // a gram that is NOT novel in doc d appeared in an earlier doc,
      // so it is duplicated across docs by definition: the non-novel
      // count is a subset of the dup count, hence novel ≥ 1 − dup
      // (up to the shared 6dp rounding of both fractions)
      if (ng > 0) assert(nf >= 1.0 - dfr - 1e-6, s"doc $id: novel $nf < 1 - dup $dfr")
    }
    // the earliest doc is all-novel by construction
    assert(nov(0L)._1 == 0 || nov(0L)._3 == 1.0)
  }
}
