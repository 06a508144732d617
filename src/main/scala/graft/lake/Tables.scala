package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata layout (one parquet per table) and
  * for raw document lakes (directory of text/html files — the
  * reference's input shape, `configs.py:16-29`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  /** events.parquet's `ts` physical type has shifted across testdata
    * generations — TIMESTAMP(NANOS) (readable only as long via
    * nanosAsLong), then TIMESTAMP(isAdjustedToUTC=false) which Spark 4
    * reads as TIMESTAMP_NTZ. This seam absorbs both flavors and always
    * surfaces a session-tz TIMESTAMP column (µs precision) so that
    * downstream µs arithmetic (`unix_micros`) resolves.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // exact integer floor-division: long / long promotes to double
        // (ulp ~256 ns at epoch magnitude), and bare `div` truncates
        // toward zero, which mis-rounds pre-1970 (negative) nanos;
        // subtracting pmod first makes div exact in both directions
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        // numeric no-op under the engine's fixed UTC session timezone
        // (Sessions sets spark.sql.session.timeZone=UTC); restores
        // unix_micros, which rejects NTZ inputs
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** Cast every TIMESTAMP_NTZ column to session-tz TIMESTAMP (a
    * numeric no-op under the engine's fixed UTC session timezone).
    * The driver's parquet writer has flipped `isAdjustedToUTC` across
    * testdata generations (r7 broke six event queries that way);
    * orders/lineitem date columns currently ship NTZ too and merely
    * happen to survive because no query µs-extracts them — applied
    * inside [[table]] so EVERY loader is drift-proof, not just the
    * ones a past break happened to hit.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampNTZType
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast("timestamp"))
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")

  /** Raw data-lake scan: every file under `dir` as (path, content).
    * Mirrors the reference's dir-scan + file-read
    * (`utils.py:72-79`, `profiler_utils.py:347-357`) but distributed:
    * Spark's text source with wholetext splits the listing across
    * executors; `recursiveFileLookup` covers nested dirs. For binary
    * (multimodal) lakes use `binaryFile` instead.
    */
  def rawLake(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .text(dir)
      .select(input_file_name().as("path"), org.apache.spark.sql.functions.col("value").as("content"))
  }

  /** Streaming counterpart of [[rawLake]]: tail a landing directory —
    * files dropped after the query starts surface as new (path,
    * content) rows on the next trigger, which is how a production
    * ingest feeds the extract pipeline continuously.
    * `maxFilesPerTrigger` bounds per-trigger work so a backfilled
    * directory of millions of files drains in controlled increments
    * instead of one giant first batch.
    */
  def rawLakeStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 100): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .select(input_file_name().as("path"), org.apache.spark.sql.functions.col("value").as("content"))
  }
}
