package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * All hashing is md5-derived (hex → int64), so signatures are
  * engine-portable and deterministic — no JVM hashCode, no seeded
  * RNG (SURVEY §7 hard part (d)).
  *
  * Scale notes: exact dedup is one hash aggregation. MinHash/SimHash
  * signatures are per-row expressions (no shuffle). Pair generation
  * joins only within LSH bands / blocking buckets, which is the
  * standard way these stay sub-quadratic at 100 TB.
  */
object Dedup {

  /** Portable 60-bit hash: first 15 hex chars of md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups by content hash: (hash, keep_id, n_dups). */
  def exactDedupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Survivors of exact dedup: first (min id) row per content hash. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      exactDedupGroups(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol),
      "left_semi")

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = filter(split(text, " "), t => length(t) > 0)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Jaccard-similar candidate pairs within a blocking bucket:
    * |A∩B| / |A∪B| over distinct shingles.
    *
    * Implemented as an inverted shingle index, not an all-pairs
    * nested loop: explode distinct shingles, equi-join on
    * (bucket, shingle), count common shingles per pair. Pairs with
    * zero overlap are never materialized, so cost scales with
    * actual shingle collisions — the only formulation that survives
    * 100 TB (the n² loop dies at thousands of docs per bucket).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      bucketCol: String,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val withSh = df
      .select(col(bucketCol), col(idCol), shingles(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = withSh.select(col(bucketCol), col(idCol), col("sz"), explode(col("sh")).as("shingle"))
    val a   = inv.select(col(bucketCol), col("shingle"), col(idCol).as("id_a"), col("sz").as("sz_a"))
    val b   = inv.select(col(bucketCol), col("shingle"), col(idCol).as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq(bucketCol, "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col(bucketCol), col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).cast("double").as("ni"))
      .withColumn("jaccard", col("ni") / (col("sz_a") + col("sz_b") - col("ni")))
      .select(col(bucketCol), col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash
    * functions, the minimum hash over the doc's shingles. Pure
    * per-row expression → ARRAY<LONG> of length numHashes.
    */
  def minhashSignature(text: Column, shingleN: Int = 3, numHashes: Int = 8): Column = {
    val sh = shingles(text, shingleN)
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, g => hash60(concat(g, lit("#"), s.cast("string"))))))
  }

  /** LSH band keys from a MinHash signature: md5 over each band's
    * slice. Docs sharing a band key are near-dup candidates; the
    * candidate join is an equi-join on (band_idx, band_key).
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows))).cast("binary")))

  /** Candidate near-dup pairs via MinHash LSH banding. */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 2): DataFrame = {
    val rows = numHashes / bands
    val keyed = df
      .select(col(idCol), minhashSignature(col(textCol), shingleN, numHashes).as("sig"))
      .select(col(idCol), posexplode(lshBandKeys(col("sig"), bands, rows)).as(Seq("band_idx", "band_key")))
    val a = keyed.select(col("band_idx"), col("band_key"), col(idCol).as("id_a"))
    val b = keyed.select(col("band_idx"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("band_idx"))
      .distinct()
  }

  /** 16-bit SimHash over whitespace tokens (md5-derived bit hashes;
    * token multiplicity counts). Pure per-row expression.
    */
  def simhash16(text: Column): Column = {
    val toks = filter(split(text, " "), t => length(t) > 0)
    val h16  = (t: Column) => conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("long")
    val bitSums = transform(
      sequence(lit(0), lit(15)),
      i => {
        val p = pow(lit(2.0), i).cast("long")
        aggregate(
          toks,
          lit(0L),
          (acc, t) => acc + (pmod(floor(h16(t) / p).cast("long"), lit(2L)) * 2 - 1))
      })
    aggregate(
      zip_with(
        bitSums,
        sequence(lit(0), lit(15)),
        (s, i) => when(s > 0, pow(lit(2.0), i).cast("long")).otherwise(0L)),
      lit(0L),
      (acc, x) => acc + x)
  }
}
