package graft.textops

import graft.SparkSpec
import graft.lake.Sinks
import org.apache.spark.sql.functions._

/** Incremental ingest dedup: a persisted, bucketed MinHash band index
  * probed by a new batch — the corpus never re-shuffles, its text is
  * never re-read.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("bandIndex emits one row per (doc, band) with combined key and full signature") {
    val df  = Seq((1L, "a b c d e f"), (2L, "x y z w v u")).toDF("doc_id", "text")
    val idx = Dedup.bandIndex(df, "doc_id", "text", shingleN = 3, numHashes = 8, bands = 2)
    val got = idx.collect()
    assert(got.length == 4) // 2 docs × 2 bands
    assert(idx.columns.toSeq == Seq("doc_id", "sig", "band_key"))
    assert(got.forall(_.getSeq[Long](1).length == 8))
    // band_idx folded into the key: the two bands of one doc differ
    val keys = got.filter(_.getLong(0) == 1L).map(_.getString(2))
    assert(keys.distinct.length == 2 && keys.forall(k => k.matches("[01]:.*")))
  }

  test("probeBandIndex and decontaminateFuzzy are partitioning-invariant") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val tk = filter(split(col("text"), " "), t => length(t) > 0)
    val nk = greatest(floor(size(tk) * 4 / 5).cast("int"), lit(1))
    val ev = corpus.filter(col("doc_id") % 83 === 0)
      .select(col("doc_id"), array_join(slice(tk, lit(1), nk), " ").as("text"))
    def fuzzy(parts: Int) = Curation.decontaminateFuzzy(
        corpus.repartition(parts), ev, "doc_id", "text",
        shingleN = 3, numHashes = 8, bands = 4, minJaccard = 0.3)
      .orderBy("doc_id").collect().toSeq
    val base = fuzzy(1)
    assert(base.nonEmpty && fuzzy(3) == base && fuzzy(16) == base)

    val idx = Dedup.bandIndex(corpus, "doc_id", "text")
    def probe(parts: Int) = Dedup.probeBandIndex(
        ev.select((col("doc_id") + 5000000L).as("doc_id"), col("text")).repartition(parts),
        idx, "doc_id", "text", minEst = 0.5)
      .orderBy("new_id", "doc_id").collect().toSeq
    val pbase = probe(1)
    assert(pbase.nonEmpty && probe(3) == pbase && probe(16) == pbase)
  }

  test("probeBandIndex finds planted near-dups against a bucketed index with no index-side shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bidb LOCATION '$dir'")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the over-broadcast-threshold regime: the index layout,
    // not a broadcast, must be what keeps the corpus side in place
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      Sinks.writeBucketed(
        Dedup.bandIndex(corpus, "doc_id", "text"), "bidb.band_index", "band_key", nBuckets = 4)
      val index = spark.table("bidb.band_index")

      // new batch: 90%-prefix copies of every 11th doc under fresh ids
      val tk = filter(split(col("text"), " "), t => length(t) > 0)
      val nk = greatest(floor(size(tk) * 9 / 10).cast("int"), lit(1))
      val batch = corpus.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          array_join(slice(tk, lit(1), nk), " ").as("text"))
      val planted = batch.count()
      assert(planted > 0)

      val got = Dedup.probeBandIndex(batch, index, "doc_id", "text", minEst = 0.5)

      // plan: ONE probe-side exchange for the join + one for the final
      // distinct; the index side joins through its bucket layout
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), s"index scan not bucketed:\n$plan")
      val nEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(nEx == 2, s"expected 2 exchanges (probe side + distinct), got $nEx:\n$plan")

      val rows = got.collect()
      assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
      // a 0.9-Jaccard prefix copy band-collides with p≈0.88 at 2×4;
      // the hashes are deterministic, and on this fixture most planted
      // copies must resolve to their source
      val hits = rows.filter(r => r.getLong(0) - 1000000L == r.getLong(1)).map(_.getLong(0)).distinct
      assert(hits.length * 2 >= planted, s"only ${hits.length} of $planted planted copies recovered")
      // re-probing the corpus against its own index must not self-pair
      val self = Dedup.probeBandIndex(
        corpus.limit(20), index, "doc_id", "text", minEst = 0.99)
      assert(self.filter(col("new_id") === col("doc_id")).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP DATABASE IF EXISTS bidb CASCADE")
    }
  }
}
