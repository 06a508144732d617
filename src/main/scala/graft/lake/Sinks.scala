package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cache + artifact sinks — the reference's pickle caches and JSON
  * index artifacts (`prepare_data` `run_profiler.py:65-84`;
  * `profiler.py:706-745`) as parquet-backed equivalents.
  */
object Sinks {

  /** Read-if-exists else compute-write-read: the chunk/extraction
    * cache pattern. Cache keys should encode run parameters in the
    * path (the reference's run_string), so stale params never hit.
    */
  def readOrCompute(spark: SparkSession, path: String)(compute: => DataFrame): DataFrame = {
    val p    = new org.apache.hadoop.fs.Path(path)
    val fs   = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    if (fs.exists(done)) spark.read.parquet(path)
    else {
      compute.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
  }

  /** Index sink (D9 artifacts): the structured view as parquet plus
    * per-attribute JSON (the reference's `_file2metadata` shape) —
    * JSON written distributed, one dir per attribute.
    */
  def writeIndex(view: DataFrame, outDir: String, keyCol: String = "path"): Unit = {
    view.write.mode("overwrite").parquet(s"$outDir/structured_view")
    view.columns.filter(_ != keyCol).foreach { attr =>
      view
        .select(col(keyCol), col(attr).as("value"))
        .write.mode("overwrite").json(s"$outDir/attr=${attr.replaceAll("[^A-Za-z0-9._-]", "_")}")
    }
  }

  /** Bucketed table sink: pre-shuffles the relation into n buckets
    * on `bucketCol` at write time so future equi-joins and groupBys
    * on that key run with NO exchange — the shuffle is paid once at
    * ingest instead of per query. The lever for repeated
    * (path/doc_id)-keyed work at 100 TB: extraction ⋈ votes ⋈ gold
    * all co-locate when written through the same bucketing.
    * Registers a catalog table (bucket metadata lives in the
    * metastore, not the parquet files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetBytes` each. The operational lake chore at
    * 100 TB — streaming appends and per-trigger foreachBatch sinks
    * leave thousands of KB-sized files whose per-file open/footer
    * cost dominates later scans. File count is derived from the
    * LISTING (input_file_name-free: Spark's file index already has
    * the sizes — no data pass); the rewrite uses `coalesce`, which
    * merges partitions WITHOUT a shuffle (compaction needs no
    * key-placement, so paying an exchange to co-locate rows would be
    * pure waste) — unless the target count EXCEEDS the read
    * partitioning, where splitting requires a real `repartition`.
    * Output goes to `outDir`; swapping it over the source dir is the
    * caller's (atomic-rename) concern.
    *
    * @return number of part-files actually written (counted from the
    *         output listing, not the requested split)
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inDir)
    val totalBytes = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r.relation
    }.collect {
      case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        f.location.listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)).sum
    }.sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // coalesce can only LOWER the partition count: when the read
    // packs into fewer partitions than nOut (few large input files,
    // small targetBytes), splitting needs a real repartition — the
    // shuffle is the price of the requested file size, paid only on
    // that path; the common many-tiny-files case stays shuffle-free
    val nRead = df.rdd.getNumPartitions
    val sized = if (nOut <= nRead) df.coalesce(nOut) else df.repartition(nOut)
    sized.write.mode("overwrite").parquet(outDir)
    // report what was actually written, not the plan: part-file count
    // from the output listing keeps the return honest if a partition
    // came out empty
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.getPath.getName.startsWith("part-"))
  }

  /** Hive-layout partitioned sink: one directory per value of
    * `partitionCol`, so any later read with an equality/IN filter on
    * that column prunes whole directories at PLANNING time
    * (`PartitionFilters` in the scan — zero file IO for pruned
    * partitions, the footers are never opened). The other half of
    * the layout story next to writeBucketed: partition by the
    * low-cardinality slice key (lang / source / date), bucket by the
    * high-cardinality join key. At 100 TB a per-language pipeline
    * stage reads 1/N of the lake by path listing alone.
    */
  def writePartitioned(df: DataFrame, outDir: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(outDir)

  /** Z-ORDER (Morton-curve) clustered sink — the multi-dimensional
    * third of the layout story next to writePartitioned (1-D
    * directory pruning) and writeBucketed (join co-location). Rows
    * are laid out along a space-filling curve over `zCols`, so every
    * output file covers a small RECTANGLE of the value space and
    * parquet row-group min/max stats become selective on EVERY z
    * column at once — a lexicographic sort gives file skipping on
    * the leading column only. At 100 TB this is the difference
    * between a 2-D predicate (user × time, lang × length, …)
    * touching a handful of files and touching all of them.
    *
    * Mechanics (public recipe — the Delta/Databricks OPTIMIZE ZORDER
    * shape): each column is RANK-quantized to `bits` bits via
    * approx-quantile cut points (rank, not min/max width, so skewed
    * distributions still split evenly — one sketch aggregation, k
    * cut points collected driver-side, broadcast back as a literal
    * array); per-row bucket index = #cuts below the value (a bounded
    * in-row fold); the Morton code interleaves the columns' bits
    * (pure integer shift/mask expressions, codegen'd); one
    * repartitionByRange + in-partition sort on the code places rows.
    * Exactly one shuffle, same cost as any global sort layout.
    */
  def writeZOrdered(
      df: DataFrame,
      outDir: String,
      zCols: Seq[String],
      bits: Int = 8,
      nFiles: Int = 16): Unit = {
    require(zCols.nonEmpty && bits >= 1 && bits <= 20, "need 1..20 bits and >=1 z column")
    // Morton code lives in one long; a shift amount >= 64 would wrap
    // mod 64 in Java's long shift and silently interleave columns
    // into each other's bit positions
    require(
      bits * zCols.length <= 63,
      s"bits*columns = ${bits * zCols.length} exceeds the 63-bit Morton budget")
    val nCuts = (1 << bits) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    // one pass: approx-quantile sketches for all z columns together
    val cutRow = df
      .agg(
        percentile_approx(col(zCols.head).cast("double"), typedLit(probs), lit(10000))
          .as(zCols.head),
        zCols.tail.map(c =>
          percentile_approx(col(c).cast("double"), typedLit(probs), lit(10000)).as(c)): _*)
      .head()
    val quantized = zCols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val cuts = cutRow.getSeq[Double](cutRow.fieldIndex(c))
      // all-NULL column (or empty input) → null sketch → every Morton
      // code NULL → one degenerate output file; fail fast instead
      require(cuts != null, s"z column '$c' has no non-null values — cannot rank-quantize")
      acc.withColumn(
        s"__q$i",
        aggregate(
          typedLit(cuts),
          lit(0L),
          (n, cut) => n + when(col(c).cast("double") > cut, 1L).otherwise(0L)))
    }
    val morton = (0 until bits)
      .flatMap(b =>
        zCols.indices.map(i =>
          shiftleft(shiftright(col(s"__q$i"), b).bitwiseAND(lit(1L)), b * zCols.length + i)))
      .reduce(_ + _)
    quantized
      .withColumn("__z", morton)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(zCols.indices.map(i => s"__q$i") :+ "__z": _*)
      .write
      .mode("overwrite")
      .parquet(outDir)
  }

  /** Directory hierarchy profile (`get_directory_hierarchy`,
    * `utils.py:82-100`): file counts per directory prefix depth.
    */
  def dirHierarchy(files: DataFrame, pathCol: String = "path"): DataFrame = {
    val parts = split(col(pathCol), "/")
    files
      .select(explode(sequence(lit(1), size(parts) - 1)).as("depth"), col(pathCol))
      .select(col("depth"), concat_ws("/", slice(split(col(pathCol), "/"), lit(1), col("depth"))).as("dir"))
      .groupBy(col("depth"), col("dir"))
      .agg(count(lit(1)).as("n_files"))
  }
}
