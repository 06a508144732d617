package graft.textops

import graft.SparkSpec

/** r14: the maxBucket fan-out cap on the centroid-bucketed pair
  * emitters (bucketEpsPairs / knnGraph / semDedup) — the pathological
  * fixture is the worst case the cap exists for: EVERY vector
  * identical, so one centroid bucket holds the whole corpus and the
  * uncapped pair space is C(N,2). The cap must split it into
  * deterministic sub-buckets with bounded pair emission, while the
  * default (Int.MaxValue) changes nothing.
  */
class BucketCapSpec extends SparkSpec {
  import spark.implicits._

  private val N   = 24
  private val cap = 6
  // all 24 vectors identical -> one bucket, uncapped pair space C(24,2)
  private def oneBucket = (0 until N).map(i => (i.toLong, Seq(1f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  test("knnGraph maxBucket: sub-buckets partition the mega-bucket, pair space strictly bounded") {
    val g = Similarity.knnGraph(oneBucket, "vec_id", "embedding", k = N, nCentroids = 1,
      maxBucket = cap)
    // with identical vectors and k >= N every in-sub-bucket neighbor
    // is returned, so {self} ∪ neighbors IS the sub-bucket
    val groups = g.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => (rows.map(_.getLong(2)).toSet + id) }
      .toSet
    // groups are mutually consistent (a real partition of the ids)
    assert(groups.toSeq.map(_.size).sum == N, s"groups overlap or miss ids: $groups")
    assert(groups.flatten == (0L until N.toLong).toSet)
    // ceil(24/6) = 4 deterministic sub-buckets; xxhash64 splits ids
    // 0..23 over 4 salts without pathological imbalance
    assert(groups.size > 1 && groups.size <= math.ceil(N.toDouble / cap).toInt,
      s"expected 2..4 sub-buckets, got ${groups.size}")
    assert(groups.forall(_.size < N), "no sub-bucket may hold the whole mega-bucket")
    assert(groups.map(_.size).max <= 2 * cap, s"hash split too skewed: ${groups.map(_.size)}")
    // pair emission: sum of C(g,2) strictly below the uncapped C(N,2)
    val pairs = groups.toSeq.map(s => s.size * (s.size - 1) / 2).sum
    assert(pairs < N * (N - 1) / 2, s"pair space not reduced: $pairs")
  }

  test("knnGraph maxBucket is deterministic (salt is a pure function of id and exact counts)") {
    def run() = Similarity.knnGraph(oneBucket, "vec_id", "embedding", k = N, nCentroids = 1,
      maxBucket = cap).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("dbscanClusters maxBucket: capped neighbor counts, every row still classified") {
    val unc = Similarity.dbscanClusters(oneBucket, "vec_id", "embedding",
      eps = 0.9, minPts = 2, nCentroids = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(unc.values.forall(_ == N - 1), "uncapped: everyone sees everyone")
    val cappedRows = Similarity.dbscanClusters(oneBucket, "vec_id", "embedding",
      eps = 0.9, minPts = 2, nCentroids = 1, maxBucket = cap).collect()
    assert(cappedRows.length == N, "every input row classified")
    val nn = cappedRows.map(_.getInt(1))
    assert(nn.max < N - 1, "capped: no row may see the whole mega-bucket")
    assert(nn.max <= 2 * cap, s"neighbor fan-out not bounded: ${nn.max}")
    // identical vectors within a sub-bucket are still mutual cores
    assert(cappedRows.forall(_.getString(2) == "core"))
  }

  test("semDedup maxBucket: split is CONSERVATIVE — keeps one survivor per sub-cluster") {
    val unc = Similarity.semDedup(oneBucket, "vec_id", "embedding", tau = 0.5, nCentroids = 1)
      .collect().count(_.getBoolean(3))
    assert(unc == 1, "uncapped: single survivor of one all-similar cluster")
    val kept = Similarity.semDedup(oneBucket, "vec_id", "embedding", tau = 0.5, nCentroids = 1,
      maxBucket = cap).collect().count(_.getBoolean(3))
    // one survivor per non-empty sub-cluster: more rows kept than the
    // exact answer, never fewer (dedup stays sound, just less tight)
    assert(kept > unc && kept <= math.ceil(N.toDouble / cap).toInt,
      s"expected 2..4 survivors, got $kept")
  }

  test("maxBucket default keeps the uncapped behavior bit-for-bit") {
    val a = Similarity.knnGraph(oneBucket, "vec_id", "embedding", k = 3, nCentroids = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Similarity.knnGraph(oneBucket, "vec_id", "embedding", k = 3, nCentroids = 1,
      maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }
}
