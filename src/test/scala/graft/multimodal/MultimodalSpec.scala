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

  // ---- real image bytes (encoded in-test via JDK ImageIO: the same
  // pure-JVM seam the codec decodes through) ----

  /** w×h image; pixel (x,y) gray level = levels(y*w+x). */
  private def encodeImage(fmt: String, w: Int, h: Int, levels: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = levels(y * w + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("imageHeader parses real PNG/JPEG/GIF/BMP headers without decoding") {
    val png = Multimodal.MediaCodec.imageHeader(encodeImage("png", 7, 5, Seq.fill(35)(128)))
    assert(png.contains(("png", 7, 5, 3)), s"png: $png")
    val jpg = Multimodal.MediaCodec.imageHeader(encodeImage("jpg", 9, 4, Seq.fill(36)(200)))
    assert(jpg.contains(("jpeg", 9, 4, 3)), s"jpg: $jpg")
    val gif = Multimodal.MediaCodec.imageHeader(encodeImage("gif", 6, 3, Seq.fill(18)(50)))
    assert(gif.contains(("gif", 6, 3, 3)), s"gif: $gif")
    val bmp = Multimodal.MediaCodec.imageHeader(encodeImage("bmp", 8, 2, Seq.fill(16)(10)))
    assert(bmp.exists { case (f, w, h, _) => f == "bmp" && w == 8 && h == 2 }, s"bmp: $bmp")
    // non-images and nulls refuse cleanly
    assert(Multimodal.MediaCodec.imageHeader("fake-image-bytes-aaaa".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.MediaCodec.imageHeader(null).isEmpty)
    assert(Multimodal.MediaCodec.imageHeader(Array[Byte](0x42)).isEmpty)
    // weak-magic traps: text that merely STARTS like a magic number
    // must not be claimed with garbage dimensions
    assert(Multimodal.MediaCodec.imageHeader(
      "GIFT CARD OFFER inside this very long payload".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.MediaCodec.imageHeader(
      "BMW motorcycles are fast and this is long enough".getBytes("UTF-8")).isEmpty)
    // JPEG with a spec-legal 0xFF fill byte before the SOF marker
    val plainJpg = encodeImage("jpg", 9, 4, Seq.fill(36)(200))
    val sofIdx = plainJpg.indices.drop(2).find(i =>
      (plainJpg(i) & 0xff) == 0xff && (plainJpg(i + 1) & 0xff) >= 0xc0 &&
        (plainJpg(i + 1) & 0xff) <= 0xc3).get
    val padded = plainJpg.take(sofIdx) ++ Array(0xff.toByte) ++ plainJpg.drop(sofIdx)
    assert(Multimodal.MediaCodec.imageHeader(padded).contains(("jpeg", 9, 4, 3)),
      s"fill-byte jpeg: ${Multimodal.MediaCodec.imageHeader(padded)}")
  }

  test("decodeFeatures on a real PNG: hand-computed luminance grid") {
    // 4x4 gray PNG, quarters at levels 0 / 51 / 102 / 255, row-major:
    // rows [0,0,51,51] [0,0,51,51] [102,102,255,255] [102,102,255,255]
    val levels = Seq(0, 0, 51, 51, 0, 0, 51, 51, 102, 102, 255, 255, 102, 102, 255, 255)
    val png    = encodeImage("png", 4, 4, levels)
    // dim=4 splits the 16-pixel raster into 4 cells of 4 consecutive
    // row-major pixels: [0,0,51,51] [0,0,51,51] [102,102,255,255] x2
    val got  = Multimodal.MediaCodec.decodeFeatures(png, 4).toSeq
    val want = Seq((0 + 0 + 51 + 51) / 4.0 / 255.0, (0 + 0 + 51 + 51) / 4.0 / 255.0,
      (102 + 102 + 255 + 255) / 4.0 / 255.0, (102 + 102 + 255 + 255) / 4.0 / 255.0)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"got $got want $want")
    }
    // PNG is lossless: identical pixels re-encoded give identical features
    assert(Multimodal.MediaCodec.decodeFeatures(encodeImage("png", 4, 4, levels), 4).toSeq == got)
  }

  test("decodeImageMeta: batch stage decodes real bytes, non-images yield NULLs") {
    val rows = Seq(
      Row(1L, "image", encodeImage("png", 12, 7, Seq.fill(84)(90)), null, null, null),
      Row(2L, "image", encodeImage("jpg", 5, 5, Seq.fill(25)(10)), null, null, null),
      Row(3L, "image", "not an image at all".getBytes("UTF-8"), null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.decodeImageMeta(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("img_format"), r.getAs[Integer]("img_width"), r.getAs[Integer]("img_height"))))
      .toMap
    assert(got(1L) == (("png", 12, 7)))
    assert(got(2L) == (("jpeg", 5, 5)))
    assert(got(3L) == ((null, null, null)))
  }

  test("decodeImageMeta + real-decode features run inside a streaming micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val png = encodeImage("png", 3, 3, Seq.fill(9)(255))
    val in  = MemoryStream[(Long, Array[Byte])]
    val media = in.toDF().toDF("media_id", "bytes")
    val out   = Multimodal.decodeImageMeta(media)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append").format("memory").queryName("mm_codec_stream").start()
    in.addData((1L, png), (2L, "junk".getBytes("UTF-8")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mm_codec_stream").orderBy("media_id").collect()
    assert(got(0).getAs[String]("img_format") == "png" && got(0).getAs[Int]("img_width") == 3)
    assert(got(1).getAs[String]("img_format") == null)
    // the feature path decodes the same real bytes: all-white 3x3 -> 1.0 cells
    val f = Multimodal.MediaCodec.decodeFeatures(png, 2).toSeq
    assert(f.forall(v => math.abs(v - 1.0) < 1e-6), s"white image luminance $f")
  }

  /** Canonical 44-byte PCM WAV header + payload, built byte-for-byte
    * (the real thing, not a stub — what a lake's audio column holds).
    */
  private def wavBytes(
      channels: Int, rate: Int, bits: Int, dataLen: Int,
      extraChunk: Boolean = false): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + dataLen + (if (extraChunk) 12 else 0))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    if (extraChunk) { bb.put("LIST".getBytes); bb.putInt(4); bb.put("INFO".getBytes) }
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1.toShort); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * bits / 8)
    bb.putShort((channels * bits / 8).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes); bb.putInt(dataLen)
    bb.put(Array.fill[Byte](dataLen)(7))
    bb.array()
  }

  test("wavHeader parses real PCM WAV headers, incl. extra chunks before fmt") {
    // 2ch 16-bit 8kHz, 32000 data bytes -> 32000/(8000*2*2) = 1000 ms
    val plain = Multimodal.MediaCodec.wavHeader(wavBytes(2, 8000, 16, 32000))
    assert(plain.contains((1, 2, 8000, 16, 32000L, 1000L)))
    // a LIST chunk between WAVE and fmt must be walked over
    val listed = Multimodal.MediaCodec.wavHeader(wavBytes(1, 44100, 8, 4410, extraChunk = true))
    assert(listed.contains((1, 1, 44100, 8, 4410L, 100L)))
  }

  test("wavHeader rejects garbage, truncation, and corrupt chunk sizes") {
    assert(Multimodal.MediaCodec.wavHeader(null).isEmpty)
    assert(Multimodal.MediaCodec.wavHeader("not audio at all, just text".getBytes).isEmpty)
    val good = wavBytes(2, 8000, 16, 3200)
    assert(Multimodal.MediaCodec.wavHeader(good.take(40)).isEmpty, "truncated header")
    // corrupt fmt chunk size pointing past the buffer
    val bad = good.clone()
    bad(16) = 0xff.toByte; bad(17) = 0xff.toByte; bad(18) = 0xff.toByte; bad(19) = 0x7f.toByte
    assert(Multimodal.MediaCodec.wavHeader(bad).isEmpty)
    // data chunk length clamped to the actual buffer, duration follows
    val overlong = wavBytes(1, 8000, 8, 800)
    val lenOff = overlong.length - 800 - 4
    val bb = java.nio.ByteBuffer.wrap(overlong).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(lenOff, 1600) // claims 1600, only 800 present
    assert(Multimodal.MediaCodec.wavHeader(overlong).contains((1, 1, 8000, 8, 800L, 100L)))
  }

  /** Minimal ISO-BMFF (MP4) file built byte-for-byte: ftyp(brand) +
    * optional leading mdat + moov [mvhd v0/v1 + n empty trak boxes],
    * optionally with a largesize moov header or a trailing
    * size-0 (to-EOF) mdat — the structures the box walk must handle.
    */
  private def mp4Bytes(
      brand: String, version: Int, timescale: Int, duration: Long, nTracks: Int,
      leadingMdat: Boolean = false, trailingMdatToEof: Boolean = false,
      largesizeMoov: Boolean = false): Array[Byte] = {
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length) // BIG_ENDIAN default
      bb.putInt(8 + payload.length); bb.put(tp.getBytes("US-ASCII")); bb.put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", (brand + "    isom").getBytes("US-ASCII"))
    val mvhdPayload = {
      // spec-length bodies: v0 = 100 payload bytes, v1 = 112
      val bb = java.nio.ByteBuffer.allocate(if (version == 0) 100 else 112)
      bb.put(version.toByte); bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte)
      if (version == 0) {
        bb.putInt(0); bb.putInt(0)            // creation, modification
        bb.putInt(timescale); bb.putInt(duration.toInt)
      } else {
        bb.putLong(0L); bb.putLong(0L)
        bb.putInt(timescale); bb.putLong(duration)
      }
      bb.array()                               // rate/matrix/etc. stay zero
    }
    val moovPayload = box("mvhd", mvhdPayload) ++
      Array.fill(nTracks)(box("trak", Array.emptyByteArray)).flatten
    val moov =
      if (!largesizeMoov) box("moov", moovPayload)
      else {
        val bb = java.nio.ByteBuffer.allocate(16 + moovPayload.length)
        bb.putInt(1); bb.put("moov".getBytes("US-ASCII"))
        bb.putLong(16L + moovPayload.length); bb.put(moovPayload)
        bb.array()
      }
    val lead  = if (leadingMdat) box("mdat", Array.fill[Byte](24)(9)) else Array.emptyByteArray
    val trail =
      if (!trailingMdatToEof) Array.emptyByteArray
      else java.nio.ByteBuffer.allocate(8).putInt(0).array().patch(4, "mdat".getBytes("US-ASCII"), 4) ++
        Array.fill[Byte](16)(3)
    ftyp ++ lead ++ moov ++ trail
  }

  test("mp4Header parses v0 and v1 movie headers, walks mdat, handles size escapes") {
    // v0: timescale 600, duration 1200 -> 2000 ms, 2 tracks
    val v0 = Multimodal.MediaCodec.mp4Header(mp4Bytes("isom", 0, 600, 1200L, 2))
    assert(v0.contains(("isom", 600, 1200L, 2000L, 2)))
    // v1 (64-bit duration), moov AFTER an mdat box the walk must skip
    val v1 = Multimodal.MediaCodec.mp4Header(
      mp4Bytes("mp42", 1, 90000, 270000L, 1, leadingMdat = true))
    assert(v1.contains(("mp42", 90000, 270000L, 3000L, 1)))
    // largesize (64-bit) moov header + trailing size-0 (to-EOF) mdat
    val esc = Multimodal.MediaCodec.mp4Header(
      mp4Bytes("isom", 0, 1000, 500L, 3, trailingMdatToEof = true, largesizeMoov = true))
    assert(esc.contains(("isom", 1000, 500L, 500L, 3)))
  }

  test("mp4Header rejects garbage, truncation, and corrupt structures") {
    val codec = Multimodal.MediaCodec
    assert(codec.mp4Header(null).isEmpty)
    assert(codec.mp4Header("this is not a video container at all, text".getBytes).isEmpty)
    val good = mp4Bytes("isom", 0, 600, 1200L, 2)
    assert(codec.mp4Header(good.take(good.length - 10)).isEmpty, "moov truncated mid-box")
    // a moov-less file (header stream cut after ftyp) has no movie header
    assert(codec.mp4Header(mp4Bytes("isom", 0, 600, 1200L, 0).take(24)).isEmpty)
    // unknown mvhd version byte
    val badVer = good.clone()
    val mvhdBody = good.indexOfSlice("mvhd".getBytes) + 4
    badVer(mvhdBody) = 7.toByte
    assert(codec.mp4Header(badVer).isEmpty)
    // zero timescale
    assert(codec.mp4Header(mp4Bytes("isom", 0, 0, 1200L, 1)).isEmpty)
    // box size smaller than its own header = structural corruption
    val badSz = good.clone()
    val bb = java.nio.ByteBuffer.wrap(badSz)
    bb.putInt(good.indexOfSlice("moov".getBytes) - 4, 3)
    assert(codec.mp4Header(badSz).isEmpty)
    // hostile 64-bit largesize near Long.MaxValue: an addition-form
    // bound check would wrap negative and walk a garbage offset
    // (r15 review finding) — must return None, not throw or spin
    val ftyp = good.take(20)
    val wrapBox = java.nio.ByteBuffer.allocate(16)
    wrapBox.putInt(1); wrapBox.put("mdat".getBytes("US-ASCII")); wrapBox.putLong(Long.MaxValue - 5)
    assert(codec.mp4Header(ftyp ++ wrapBox.array()).isEmpty)
    // v1 duration past Long.MaxValue/1000: duration_ms would wrap
    assert(codec.mp4Header(
      mp4Bytes("isom", 1, 90000, Long.MaxValue / 1000L + 7L, 1)).isEmpty)
    // mvhd whose OWN declared size (12 = header + version/flags only)
    // is smaller than the v0 field span, with a sibling trak right
    // after: a moov-end-only bound check passes and reads the trak's
    // bytes as timescale/duration (garbage metadata); the box-extent
    // bound must reject it (r15 ADVICE finding)
    locally {
      def box(tp: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
        bb.putInt(8 + payload.length); bb.put(tp.getBytes("US-ASCII")); bb.put(payload)
        bb.array()
      }
      val ftypBox   = box("ftyp", "isom    isom".getBytes("US-ASCII"))
      val shortMvhd = box("mvhd", Array[Byte](0, 0, 0, 0)) // v0, version+flags only
      val moov      = box("moov", shortMvhd ++ box("trak", Array.fill[Byte](32)(0x41)))
      assert(codec.mp4Header(ftypBox ++ moov).isEmpty,
        "truncated mvhd must not read sibling-box bytes as timescale/duration")
    }
  }

  test("decodeVideoMeta: batch stage parses real MP4 bytes, non-video yields NULLs") {
    val rows = Seq(
      Row(1L, "video", mp4Bytes("isom", 0, 600, 1200L, 2)),
      Row(2L, "video", "plain text payload".getBytes),
      Row(3L, "video", null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes", org.apache.spark.sql.types.BinaryType)))
    val df  = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = Multimodal.decodeVideoMeta(df).orderBy("media_id").collect()
    assert(got(0).getString(3) == "isom" && got(0).getInt(4) == 600 &&
      got(0).getLong(6) == 2000L && got(0).getInt(7) == 2, "real MP4 parsed")
    assert(got(1).isNullAt(3) && got(2).isNullAt(3), "non-video -> NULLs")
  }

  test("decodeVideoMeta runs inside a streaming micro-batch (parity with the image leg)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in    = MemoryStream[(Long, Array[Byte])]
    val media = in.toDF().toDF("media_id", "bytes")
    val out   = Multimodal.decodeVideoMeta(media)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append").format("memory").queryName("mm_video_stream").start()
    in.addData((1L, mp4Bytes("mp42", 1, 90000, 270000L, 3)), (2L, "junk".getBytes("UTF-8")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mm_video_stream").orderBy("media_id").collect()
    assert(got(0).getAs[String]("mp4_brand") == "mp42" &&
      got(0).getAs[Long]("mp4_duration_ms") == 3000L &&
      got(0).getAs[Int]("mp4_tracks") == 3, "v1 MP4 parsed in-stream")
    assert(got(1).isNullAt(got(1).fieldIndex("mp4_brand")), "non-video -> NULLs in-stream")
  }

  test("decodeAudioMeta: batch stage parses real WAV bytes, non-audio yields NULLs") {
    val rows = Seq(
      Row(1L, "audio", wavBytes(2, 8000, 16, 32000)),
      Row(2L, "audio", "plain text payload".getBytes),
      Row(3L, "audio", null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes", org.apache.spark.sql.types.BinaryType)))
    val df  = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = Multimodal.decodeAudioMeta(df).orderBy("media_id").collect()
    assert(got(0).getInt(3) == 1 && got(0).getInt(4) == 2 &&
      got(0).getInt(5) == 8000 && got(0).getLong(8) == 1000L, "real WAV parsed")
    assert(got(1).isNullAt(3) && got(2).isNullAt(3), "non-audio -> NULLs")
  }
}
