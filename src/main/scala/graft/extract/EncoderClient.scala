package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** Embedding-encoder operator — the seam for the reference's
  * contriever forward pass (`retrieval.py:5-29`: HF model inference +
  * attention-masked mean pooling). The engine consumes precomputed
  * embeddings wherever they exist (`embeddings.parquet`); this client
  * makes retrieval work FROM RAW TEXT when they don't, mirroring the
  * [[LlmClient]] design: a serializable trait, one instance per
  * partition drains its texts (connection/model reuse, batched), and
  * the driver never sees a document.
  *
  * Implementations must be thread-safe for the same reason as
  * [[LlmClient]]: one shared instance serves every executor task.
  */
trait EncoderClient extends Serializable {

  /** Embedding dimensionality (fixed per client). */
  def dim: Int

  /** Encode a batch; must return exactly one vector per input text,
    * in order.
    */
  def encode(texts: Iterator[String]): Iterator[Array[Float]]
}

/** Deterministic mock encoder — the hermetic stand-in for a model
  * endpoint (this container has no model weights or egress, the same
  * situation as [[MockLlmClient]]). Hashing-trick bag-of-words with
  * mean pooling: each whitespace token lands in bucket
  * murmur3(token) mod dim with a hash-derived sign, vectors are
  * token-mean-pooled and L2-normalized — so identical texts embed
  * identically, token-overlapping texts have high cosine, and the
  * geometry is stable across JVMs/partitionings (murmur3 is seeded,
  * not identity-hash).
  */
final case class MockEncoderClient(dim: Int = 64) extends EncoderClient {
  require(dim > 0, "dim must be positive")

  def encode(texts: Iterator[String]): Iterator[Array[Float]] = texts.map { t =>
    val acc  = new Array[Float](dim)
    val toks = if (t == null) Array.empty[String] else t.split("\\s+").filter(_.nonEmpty)
    toks.foreach { tok =>
      val h = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c)
      val b = math.floorMod(h, dim)
      acc(b) += (if (((h >>> 31) & 1) == 0) 1.0f else -1.0f)
    }
    if (toks.nonEmpty) {
      var i = 0
      while (i < dim) { acc(i) /= toks.length; i += 1 }
    }
    val norm = math.sqrt(acc.foldLeft(0.0)((s, x) => s + x * x))
    if (norm > 0) {
      var i = 0
      while (i < dim) { acc(i) = (acc(i) / norm).toFloat; i += 1 }
    }
    acc
  }
}

/** The embedding stage: text column → ARRAY<FLOAT> vector column via
  * mapPartitions (`retrieval.py:22-29`'s batched forward pass as a
  * distributed operator). Scale shape: no shuffle — a pure
  * per-partition pass whose throughput scales with executors; at
  * 100 TB this is the stage you size GPU executors for, and the
  * output column is what you persist so the pass never re-runs.
  */
object Encode {

  /** Works on BATCH and STREAMING frames alike: Dataset.mapPartitions
    * (not `df.rdd`, which streaming plans reject), so the same stage
    * embeds a readStream ingest — new documents get vectors as they
    * arrive, with the client's cache deduplicating re-deliveries.
    * Texts flow in fixed-size batches (graft.api.Profiler.LlmBatchSize)
    * so per-task memory is bounded by batch size, not partition size —
    * same contract as the LLM seams.
    */
  def embed(
      df: DataFrame,
      textCol: String,
      client: EncoderClient,
      outCol: String = "embedding"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, ArrayType(FloatType)))
    val cl     = client
    val ti     = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(graft.api.Profiler.LlmBatchSize).flatMap { batch =>
        val vecs = cl.encode(batch.iterator.map(r => r.getString(ti)))
        batch.iterator.zip(vecs).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
