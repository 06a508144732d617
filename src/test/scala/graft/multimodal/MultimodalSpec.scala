package graft.multimodal

import graft.SparkSpec
import graft.textops.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", "fake-image-bytes-aaaa".getBytes("UTF-8"), 64, 64, null),
      Row(2L, "image", "fake-image-bytes-aaaa".getBytes("UTF-8"), 64, 64, null), // dup payload
      Row(3L, "video", ("frame0frame1frame2frame3" * 4).getBytes("UTF-8"), 320, 240, java.lang.Long.valueOf(4000L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      Multimodal.mediaSchema)
  }

  test("extractFeatures adds a fixed-dim float vector per row") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 16)
    assert(out.schema("features").dataType.typeName == "array")
    val feats = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 16))
    assert(feats(1L) == feats(2L)) // deterministic on identical bytes
    assert(feats(1L) != feats(3L))
  }

  test("features feed the embedding similarity operators") {
    val feats = Multimodal.extractFeatures(mediaDf, dim = 16)
      .select(col("media_id"), col("kind"), col("features"))
    val pairs = Similarity.embeddingNearDupPairs(feats, "kind", "media_id", "features")
    val top   = pairs.orderBy(desc("cos")).head
    assert((top.getAs[Long]("id_a"), top.getAs[Long]("id_b")) == (1L, 2L))
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("sampleFrames explodes n frames per video") {
    val frames = Multimodal.sampleFrames(mediaDf.filter(col("kind") === "video"), framesPerVideo = 4)
    assert(frames.count() == 4)
    assert(frames.select("frame_idx").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("mediaMeta hashes payloads without decoding") {
    val meta = Multimodal.mediaMeta(mediaDf).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(meta(1L) == meta(2L))
    assert(meta(1L) != meta(3L))
  }

  test("extractFeatures runs inside a streaming micro-batch (mapPartitions on a stream)") {
    // the SCALE claim "streaming-capable" made executable: the same
    // partition-batched codec stage planned over an unbounded source
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val media = in.toDF().toDF("media_id", "payload")
      .withColumn("bytes", col("payload").cast("binary")).drop("payload")
    val out = Multimodal.extractFeatures(media, dim = 8)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append").format("memory").queryName("mm_stream").start()
    in.addData((1L, "fake-image-bytes-aaaa"), (2L, "x"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mm_stream").orderBy("media_id").collect()
    assert(got.length == 2 && got(0).getSeq[Float](2).length == 8)
  }

  test("MediaCodec stubs are deterministic and shape-correct") {
    val b = "hello media".getBytes("UTF-8")
    assert(Multimodal.MediaCodec.decodeFeatures(b, 8).toSeq == Multimodal.MediaCodec.decodeFeatures(b, 8).toSeq)
    assert(Multimodal.MediaCodec.resize(b, 2).length == (b.length + 1) / 2)
    assert(Multimodal.MediaCodec.frameSample(b, 3).size == 3)
  }
}
