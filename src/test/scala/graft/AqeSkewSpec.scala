package graft

import org.apache.spark.sql.functions._

/** Evidence for the "AQE handles join skew at runtime" scale claim:
  * a hot join key whose partition dwarfs the others must be SPLIT by
  * adaptive execution (`skew=true` on the final SortMergeJoin), not
  * processed by one straggler task. Thresholds are shrunk so the
  * fixture-sized skew trips the same detection a hot key trips at
  * 100 TB (size > max(thresholdBytes, factor × median)).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",           // force SMJ
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 50k rows on ONE key (plus a sprinkle of others): after the
      // hash exchange one partition holds ~2.5 MB vs ~bytes elsewhere
      val left = spark.range(0, 50000)
        .select(lit(0L).as("k"), concat(lit("payload-payload-payload-"), col("id")).as("v"))
        .union(spark.range(1, 200).select(col("id").as("k"), lit("x").as("v")))
      val right = spark.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("w"))

      val joined = left.join(right, "k")
      // execute THIS plan instance (count() would plan a separate
      // aggregate query and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 50000 + 199)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join (no skew=true):\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // tiny groupBy over the session's 32 shuffle partitions: the
    // runtime must fuse the near-empty partitions instead of
    // scheduling 32 micro-tasks — the other half of the adaptive
    // story next to skew splitting
    val agg = spark.range(0, 1000).select((col("id") % 7).as("k")).groupBy("k").count()
    assert(agg.collect().length == 7)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead coalesced"),
      s"no coalesced shuffle read in final plan:\n$plan")
  }
}
