package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every entry point shares.
  *
  * local[N] single-JVM for tests/bench; on a real cluster the same
  * builder settings apply minus master. AQE stays on so skewed
  * shuffles re-plan at runtime; shuffle partitions match local cores
  * (a cluster deploy overrides via --conf).
  *
  * Cluster-deploy knobs intentionally left at defaults here and
  * sized per deployment (they are data-dependent, not code):
  *  - spark.sql.shuffle.partitions ≈ 2-3× total executor cores (AQE
  *    coalesces down, so err high);
  *  - spark.sql.files.maxPartitionBytes 128-256 MB so a scan split
  *    fits executor memory alongside shuffle buffers at 100 TB;
  *  - spark.sql.autoBroadcastJoinThreshold raised only if the gold /
  *    attribute / quota tables outgrow 10 MB (they shouldn't);
  *  - AQE skew-join handles hot join keys; the salted aggregations
  *    (graft.lake.Skew) cover hot GROUP BY keys, which AQE doesn't.
  */
object Sessions {
  def local(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // engine extension: rewrite HOF dot products to the codegen'd
      // native expression (graft.expressions.FuseDotProduct)
      .withExtensions(_.injectOptimizerRule(_ => graft.expressions.FuseDotProduct))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // the profiler submits per-attribute jobs from a driver thread
      // pool (Profiler.run); FAIR keeps a long lake pass for one
      // attribute from head-of-line blocking the others' sample work.
      // Env override for A/B-measuring scheduler cost on serial
      // workloads (the bench runs queries one at a time, where FAIR
      // buys nothing and its sort-based task ordering is pure
      // overhead on many-job iterative queries).
      .config("spark.scheduler.mode", sys.env.getOrElse("GRAFT_SCHEDULER_MODE", "FAIR"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
