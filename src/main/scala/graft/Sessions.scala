package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every entry point shares.
  *
  * local[N] single-JVM for tests/bench; on a real cluster the same
  * builder settings apply minus master. AQE stays on so skewed
  * shuffles re-plan at runtime; shuffle partitions match local cores
  * (a cluster deploy overrides via --conf).
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
