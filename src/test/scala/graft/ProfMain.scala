package graft

import org.apache.spark.sql.functions._
import graft.textops.Dedup

/** Scratch profiler for the dedup pair pipeline (not shipped). */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graft-prof")
    val docs  = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val withSh = docs
      .select(col("lang"), col("doc_id"), Dedup.shinglesFast(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = withSh
      .select(col("lang"), col("doc_id"), col("sz"), explode(col("sh")).as("shingle"))
      .withColumn("shingle", xxhash64(col("shingle")))

    time("shingles only")(withSh.select(max(col("sz"))).head())
    time("inverted idx (no agg)")(inv.select(max(col("shingle"))).head())
    time("inv + count groupBy")(
      inv.groupBy(col("lang"), col("shingle")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).select(sum(col("n"))).head())
    time("inv + collect_list")(
      inv.groupBy(col("lang"), col("shingle"))
        .agg(array_sort(collect_list(struct(col("doc_id").as("id"), col("sz").as("s")))).as("ds"))
        .filter(size(col("ds")) > 1).select(count(lit(1))).head())
    time("full jaccard pairs")(
      Dedup.ngramJaccardPairs(docs, "lang", "doc_id", "text", 3)
        .select(max(col("jaccard"))).head())
    time("full clusters")(
      Dedup.nearDupClusters(docs, "lang", "doc_id", "text", 3, 0.5)
        .select(count(lit(1))).head())
    spark.stop()
  }
}
