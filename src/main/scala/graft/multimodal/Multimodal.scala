package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * stages (the Scala equivalent of `mapInPandas` batch UDFs).
  *
  * The actual media decode is STUBBED — the container ships no
  * image/audio codecs — behind [[MediaCodec]]: a deterministic fake
  * that derives "features" from the bytes. Everything Spark-side is
  * real and tested: the schema contract, binary column handling,
  * batched iteration shape, partition-parallel execution, and the
  * downstream feature pipeline (these features feed the same
  * similarity/dedup operators as text embeddings).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),       // image | audio | video
    StructField("bytes", BinaryType, nullable = false),      // opaque payload
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** STUB codec: replace with a real decoder (JavaCV/javax.imageio)
    * in a codec-equipped deployment. Deterministic on input bytes.
    */
  object MediaCodec {
    /** "Decode" + featurize: dim-length float vector from byte stats.
      * NULL-in → NULL-out, like every column function here.
      */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return null
      val out = new Array[Float](dim)
      var i   = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** "Resize": deterministic downsample of the payload bytes.
      * NULL-in → NULL-out like the other codec paths.
      */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] =
      if (bytes == null) null
      else bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }

    /** "Frame-sample": n evenly-spaced byte slices standing in for
      * decoded video frames.
      */
    def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      // null media propagates as null frames (the SQL engines'
      // NULL-in → NULL-out convention; the DuckDB oracle does the
      // same via octet_length/substring on NULL)
      if (bytes == null) return Seq.fill(n)(null)
      if (bytes.isEmpty) return Seq.fill(n)(Array.emptyByteArray)
      val stride = math.max(bytes.length / n, 1)
      (0 until n).map { i =>
        val start = math.min(i * stride, bytes.length)
        bytes.slice(start, math.min(start + stride, bytes.length))
      }
    }
  }

  /** Feature extraction as a batched partition stage: one codec
    * "session" per partition (the expensive init a real decoder
    * needs), rows processed in order. Output adds
    * features ARRAY<FLOAT>.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(media.schema.fields :+ StructField("features", ArrayType(FloatType), nullable = true))
    media.mapPartitions { rows =>
      // per-partition codec init goes here in a real deployment
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val f     = MediaCodec.decodeFeatures(bytes, dim)
        Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Media "resize" as a batched partition stage: every factor-th
    * payload byte (the stub stand-in for an image downscale) —
    * (media_id, resized_bytes).
    */
  def resizeMedia(media: DataFrame, factor: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("resized_bytes", BinaryType, nullable = true)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        Row(r.getAs[Long]("media_id"), if (bytes == null) null else MediaCodec.resize(bytes, factor))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Video frame sampling as an exploding partition stage:
    * (media_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: DataFrame, framesPerVideo: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_bytes", BinaryType, nullable = true)))
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getAs[Long]("media_id")
        MediaCodec.frameSample(r.getAs[Array[Byte]]("bytes"), framesPerVideo).zipWithIndex.map {
          case (fb, i) => Row(id, i, fb)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Byte-level metadata projection — pure columnar, no codec. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).as("n_bytes"),
      md5(col("bytes")).as("content_hash"))
}
