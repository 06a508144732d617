package graft.textops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 serve-path completion (r16 VERDICT #7): the streaming PQ
  * index appends codes against FROZEN codebooks, so recall decays as
  * the corpus drifts from the fit — pqRecallGauge is the periodic
  * monitor. These specs pin (a) the batched exact-side primitive,
  * (b) the gauge's parity with the single-query recall gauges, and
  * (c) that it actually DETECTS a drifted append.
  */
class Round17GaugeSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(ids: Range, base: Seq[Float]): Seq[(Long, Seq[Float])] =
    ids.map(i => (i.toLong, base.updated(3, (i % 5).toFloat / 100f)))

  test("bruteTopKBatch: per-qid rows identical to cosineTopK; no per-query plan union") {
    val vecs = cluster(0 until 10, Seq(1f, 0.05f, 0f, 0f)) ++
      cluster(10 until 20, Seq(0f, 0.05f, 1f, 0f))
    val emb = vecs.toDF("vec_id", "embedding")
    val qs  = Seq(0L, 11L).map(i => i -> vecs.find(_._1 == i).get._2.map(_.toDouble))
    val batch = Similarity.bruteTopKBatch(emb, "vec_id", "embedding", qs, k = 4)
    qs.foreach { case (qid, v) =>
      val single = Similarity.cosineTopK(emb, "vec_id", "embedding", v, 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      val got = batch.filter(col("qid") === qid).orderBy("rank")
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      assert(got == single, s"qid $qid: batch $got vs single $single")
    }
    val p = batch.queryExecution.executedPlan.toString
    assert(!p.contains("Union"), s"one scan answers all queries — no per-query union:\n$p")
    assert(!p.contains("SortMergeJoin"), s"queries ride as a broadcast, never a shuffle:\n$p")
  }

  test("pqRecallGauge: high in-fit, declines on a drifted append, single-probe parity with recallAtK") {
    val a = cluster(0 until 10, Seq(1f, 0.05f, 0f, 0f)) ++
      cluster(10 until 20, Seq(0f, 0.05f, 1f, 0f))
    val embA  = a.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(embA, "vec_id", "embedding", m = 2, k = 2, iters = 2, dim = 4)
    def enc(emb: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(emb, "vec_id", "embedding", books, m = 2, codeK = 2, dim = 4)
    def gauge(codes: org.apache.spark.sql.DataFrame, emb: org.apache.spark.sql.DataFrame, n: Int) =
      Similarity.pqRecallGauge(codes, emb, "vec_id", "embedding", books,
        k = 4, m = 2, codeK = 2, rerank = 6, dim = 4, probeN = n, seed = 7L).head()
    val fit = gauge(enc(embA), embA, 8)
    assert(fit.getInt(0) == 8)
    // a direction the frozen codebooks never saw: its vectors collapse
    // onto one codeword per subspace, ADC stops discriminating, and
    // exact neighbors of drifted probes fall out of the candidate cut
    val b      = cluster(100 until 120, Seq(-1f, 2f, -1f, 0f))
    val embAll = (a ++ b).toDF("vec_id", "embedding")
    val drift  = gauge(enc(embAll), embAll, 8)
    assert(drift.getDouble(1) < fit.getDouble(1),
      s"the gauge must detect codebook drift: fit=$fit drift=$drift")
    // single-probe parity: the gauge's mean IS recallAtK of the
    // verified single-query operators on the same sampled probe
    val (qid, v) = {
      val r = embAll
        .select(col("vec_id"), col("embedding"), xxhash64(col("vec_id"), lit(7L)).as("_h"))
        .orderBy(col("_h"), col("vec_id")).limit(1).head()
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)
    }
    val exp = Similarity.recallAtK(
      Similarity.cosineTopK(embAll, "vec_id", "embedding", v, 4),
      Similarity.pqTopKFromCodes(enc(embAll), embAll, "vec_id", "embedding", v, books,
        k = 4, m = 2, codeK = 2, rerank = 6, dim = 4),
      "vec_id", 4).head().getDouble(1)
    val g1 = gauge(enc(embAll), embAll, 1)
    assert(g1.getDouble(1) == exp, s"gauge($qid)=${g1.getDouble(1)} vs recallAtK=$exp")
  }
}
