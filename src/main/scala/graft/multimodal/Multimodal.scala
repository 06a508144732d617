package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * stages (the Scala equivalent of `mapInPandas` batch UDFs).
  *
  * The IMAGE path is real: a pure-JVM header parse
  * ([[MediaCodec.imageHeader]] — PNG/JPEG/GIF/BMP width, height,
  * channels without decoding a pixel) and a JDK `javax.imageio`
  * pixel decode feeding a luminance-grid feature vector
  * ([[MediaCodec.decodeFeatures]]). Payloads that are NOT decodable
  * images (and the audio/video kinds, whose codecs the JVM does not
  * ship) fall back to the deterministic byte-stat featurizer, so the
  * operators stay total. Everything Spark-side — schema contract,
  * binary handling, batched iteration, partition-parallel execution,
  * the downstream similarity/dedup consumers — is the same for both
  * paths.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),       // image | audio | video
    StructField("bytes", BinaryType, nullable = false),      // opaque payload
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** The codec. Image decode is REAL (JDK ImageIO + a pure-JVM
    * header parse); the audio/video "decode" remains a deterministic
    * byte-stat stand-in (no JVM-native codecs in this deployment).
    */
  object MediaCodec {

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def be64(b: Array[Byte], o: Int): Long =
      ((be32(b, o).toLong & 0xffffffffL) << 32) | (be32(b, o + 4).toLong & 0xffffffffL)

    /** Pure-JVM image header parse — (format, width, height,
      * channels) for PNG / JPEG / GIF / BMP WITHOUT decoding a pixel:
      * the scale path for metadata extraction over binary columns (a
      * few header bytes per row, no pixel buffers). None for null,
      * truncated, or non-image payloads.
      */
    def imageHeader(bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (bytes == null || bytes.length < 10) return None
      // PNG: 8-byte signature, then IHDR (width/height BE at 16/20,
      // color type at 25 -> channel count)
      if (bytes.length >= 26 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
        val ch = bytes(25) match {
          case 0 => 1; case 2 => 3; case 3 => 3; case 4 => 2; case 6 => 4; case _ => 3
        }
        return Some(("png", be32(bytes, 16), be32(bytes, 20), ch))
      }
      // GIF: FULL 6-byte magic (a bare 'GIF' prefix would claim any
      // text starting "GIFT..."), then the logical screen descriptor
      if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
        return Some(("gif", le16(bytes, 6), le16(bytes, 8), 3))
      // BMP: 'BM' alone is weak — also require a known DIB header
      // size at offset 14 before trusting the dims (LE at 18/22;
      // height may be negative = top-down), channels from bpp at 28
      if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 30) {
        val dib = le32(bytes, 14)
        if (Set(12, 40, 52, 56, 64, 108, 124).contains(dib)) {
          val bpp = le16(bytes, 28)
          return Some(("bmp", le32(bytes, 18), math.abs(le32(bytes, 22)), math.max(1, bpp / 8)))
        }
        return None
      }
      // JPEG: walk the marker segments to the first SOFn frame header
      // (precision, height BE, width BE, component count). 0xFF fill
      // bytes before a marker are spec-legal — skip them; standalone
      // markers (SOI/EOI/RSTn/TEM) carry no length segment.
      if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        var p = 2
        while (p + 9 < bytes.length) {
          if ((bytes(p) & 0xff) != 0xff) return None // lost sync
          if ((bytes(p + 1) & 0xff) == 0xff) p += 1  // fill byte
          else {
            val marker = bytes(p + 1) & 0xff
            if (marker == 0xd8 || marker == 0xd9 ||
              (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) p += 2
            else {
              val segLen = be16(bytes, p + 2)
              if (segLen < 2) return None // corrupt length
              val isSof = marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc
              if (isSof)
                return Some(("jpeg", be16(bytes, p + 7), be16(bytes, p + 5), bytes(p + 9) & 0xff))
              p += 2 + segLen
            }
          }
        }
        return None
      }
      None
    }

    /** Full pixel decode via JDK ImageIO (PNG/JPEG/GIF/BMP readers
      * ship with the JVM). None for undecodable payloads — ImageIO
      * returns null rather than throwing on most garbage; the Try
      * absorbs the rest.
      */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null) None
      else
        scala.util.Try(
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))).toOption.flatten

    /** Rec.601 luminance grid over the decoded raster: the row-major
      * pixel sequence is split into `dim` contiguous cells and each
      * cell averages its pixels' luminance in [0,1] — a real (if
      * simple) image feature with the same vector contract as the
      * text-embedding consumers downstream.
      */
    private[multimodal] def luminanceGrid(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      val n = w.toLong * h
      val sums = new Array[Double](dim)
      val cnts = new Array[Long](dim)
      var idx = 0L
      var y   = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb  = img.getRGB(x, y)
          val r    = (rgb >> 16) & 0xff
          val g    = (rgb >> 8) & 0xff
          val b    = rgb & 0xff
          val cell = ((idx * dim) / n).toInt
          sums(cell) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          cnts(cell) += 1L
          idx += 1L
          x += 1
        }
        y += 1
      }
      Array.tabulate(dim)(i => if (cnts(i) == 0) 0.0f else (sums(i) / cnts(i)).toFloat)
    }

    /** Decode + featurize: a REAL image yields its luminance-grid
      * vector; anything else (audio/video payloads, synthetic bytes)
      * falls back to the deterministic byte-stat featurizer so the
      * operator stays total. NULL-in → NULL-out, like every column
      * function here.
      */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return null
      imageHeader(bytes).flatMap(_ => decodeImage(bytes)) match {
        case Some(img) => luminanceGrid(img, dim)
        case None      => byteStatFeatures(bytes, dim)
      }
    }

    /** The non-image fallback featurizer: dim-length float vector
      * from byte statistics, deterministic on input bytes.
      */
    private[multimodal] def byteStatFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
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

    /** Pure-JVM RIFF/WAVE header parse — (format_code, channels,
      * sample_rate, bits_per_sample, data_bytes, duration_ms) WITHOUT
      * decoding a sample: verify the RIFF....WAVE magic, then walk
      * the chunk list ('fmt ' carries the format block, 'data' the
      * payload length; chunks are word-aligned). The audio face of
      * [[imageHeader]] — a few header bytes per row, no sample
      * buffers. None for null, truncated, non-WAV, or structurally
      * corrupt payloads (chunk size past the buffer, zero byte rate).
      */
    def wavHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long, Long)] = {
      if (bytes == null || bytes.length < 44) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
      var p                                  = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var dataLen                            = -1L
      while (p + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
        val sz = le32(bytes, p + 4).toLong & 0xffffffffL
        val isFmt = bytes(p) == 'f' && bytes(p + 1) == 'm' &&
          bytes(p + 2) == 't' && bytes(p + 3) == ' '
        val isData = bytes(p) == 'd' && bytes(p + 1) == 'a' &&
          bytes(p + 2) == 't' && bytes(p + 3) == 'a'
        if (isFmt) {
          if (p + 24 > bytes.length || sz < 16) return None // truncated format block
          fmt = Some((le16(bytes, p + 8), le16(bytes, p + 10), le32(bytes, p + 12), le16(bytes, p + 22)))
        } else if (isData) {
          // the data chunk may legally run to EOF; clamp rather than
          // trusting a hostile length
          dataLen = math.min(sz, (bytes.length - p - 8).toLong)
        }
        if (fmt.isEmpty || dataLen < 0) {
          // still walking: a chunk size past the buffer is corruption
          // (the data chunk above is exempt — its length legally runs
          // to EOF and was clamped, not trusted)
          if (sz > bytes.length.toLong) return None
          p += 8 + sz.toInt + (sz.toInt & 1) // word alignment
        }
      }
      fmt match {
        case Some((code, ch, rate, bits)) if dataLen >= 0 =>
          val byteRate = rate.toLong * ch * (bits / 8)
          if (ch <= 0 || rate <= 0 || bits <= 0 || byteRate <= 0) None
          else Some((code, ch, rate, bits, dataLen, dataLen * 1000L / byteRate))
        case _ => None
      }
    }

    /** Pure-JVM ISO-BMFF (MP4/MOV) header parse — (major_brand,
      * timescale, duration, duration_ms, n_tracks) WITHOUT touching a
      * sample: verify the leading 'ftyp' box, walk the top-level box
      * list to 'moov', then walk moov's children for 'mvhd' (movie
      * header: version 0 = 32-bit times, version 1 = 64-bit) and
      * count 'trak' boxes. The video face of [[imageHeader]] /
      * [[wavHeader]] — a few header bytes per row, no frame buffers.
      * Handles the spec's size escapes (size 1 → 64-bit largesize,
      * size 0 → box runs to EOF) and returns None for null,
      * truncated, non-BMFF, or structurally corrupt payloads (box
      * size under the header length or past the buffer, unknown mvhd
      * version, zero timescale) — the wavHeader corruption-guard
      * contract.
      */
    def mp4Header(bytes: Array[Byte]): Option[(String, Int, Long, Long, Int)] = {
      if (bytes == null || bytes.length < 16) return None
      def rawSize(o: Int): Long = be32(bytes, o).toLong & 0xffffffffL
      def headerLen(o: Int): Int = if (rawSize(o) == 1L) 16 else 8
      // full box size, or -1 for a structurally impossible one
      def boxSize(o: Int): Long = rawSize(o) match {
        case 0L => bytes.length.toLong - o // last box runs to EOF
        case 1L => if (o + 16 > bytes.length) -1L else be64(bytes, o + 8)
        case s  => s
      }
      def boxType(o: Int): String =
        new String(bytes, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (boxType(0) != "ftyp") return None
      val ftypSz = boxSize(0)
      if (ftypSz < headerLen(0) + 4 || ftypSz > bytes.length) return None
      val brand = new String(bytes, headerLen(0), 4, java.nio.charset.StandardCharsets.US_ASCII)
      // top-level walk to moov
      var p    = 0L
      var moov = -1L
      var end  = -1L
      while (p + 8 <= bytes.length && moov < 0) {
        val o  = p.toInt
        val sz = boxSize(o)
        // compare by SUBTRACTION: a hostile largesize near
        // Long.MaxValue would wrap `p + sz` negative and slip past an
        // addition-form bound check into a garbage offset
        if (sz < headerLen(o) || sz > bytes.length.toLong - p) return None
        if (boxType(o) == "moov") { moov = p + headerLen(o); end = p + sz }
        else p += sz
      }
      if (moov < 0) return None
      // moov children: mvhd (movie header) + trak count
      var q                          = moov
      var tracks                     = 0
      var mvhd: Option[(Int, Long)] = None
      while (q + 8 <= end) {
        val o  = q.toInt
        val sz = boxSize(o)
        if (sz < headerLen(o) || sz > end - q) return None // subtraction: see top-level walk
        boxType(o) match {
          case "trak" => tracks += 1
          case "mvhd" =>
            val body = o + headerLen(o)
            // field reads are bounded by the mvhd box's OWN extent
            // (o + sz), not just the moov end: a corrupt mvhd whose
            // declared size is >= the header but < the version's
            // field span would otherwise pass the moov-end check and
            // read SIBLING-box bytes as timescale/duration — garbage
            // metadata instead of the contracted None
            val boxEnd = math.min(o + sz, end)
            if (body + 4 > boxEnd) return None
            (bytes(body) & 0xff) match {
              case 0 =>
                if (body + 20 > boxEnd) return None
                mvhd = Some((be32(bytes, body + 12), be32(bytes, body + 16).toLong & 0xffffffffL))
              case 1 =>
                if (body + 32 > boxEnd) return None
                mvhd = Some((be32(bytes, body + 20), be64(bytes, body + 24)))
              case _ => return None // unknown movie-header version
            }
          case _ => ()
        }
        q += sz
      }
      mvhd match {
        // dur bound: dur*1000 must not wrap Long — a hostile 64-bit
        // duration past ~9.2e15 ticks is corruption, not a movie
        case Some((ts, dur)) if ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000L =>
          Some((brand, ts, dur, dur * 1000L / ts, tracks))
        case _ => None
      }
    }

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

  /** Image metadata decode as a batched partition stage: the
    * pure-JVM header parse ([[MediaCodec.imageHeader]]) adds
    * (img_format, img_width, img_height, img_channels) — a few
    * header bytes read per row, NO pixel decode, so the stage costs
    * a projection even over multi-MB payloads. Non-image / null
    * payloads yield NULLs (NULL-in → NULL-out). Works identically
    * over a streaming plan (mapPartitions, no shuffle).
    */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("img_format", StringType, nullable = true),
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_channels", IntegerType, nullable = true)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val hdr = MediaCodec.imageHeader(r.getAs[Array[Byte]]("bytes"))
        Row.fromSeq(r.toSeq ++ (hdr match {
          case Some((f, w, h, c)) => Seq(f, w, h, c)
          case None               => Seq(null, null, null, null)
        }))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Audio twin of [[decodeImageMeta]]: per-row RIFF/WAVE header
    * parse, appending (wav_format, wav_channels, wav_sample_rate,
    * wav_bits, wav_data_bytes, wav_duration_ms) — NULLs for non-WAV
    * payloads. Same batched-partition shape: header bytes only, no
    * sample buffers, rows stream through.
    */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("wav_format", IntegerType, nullable = true),
      StructField("wav_channels", IntegerType, nullable = true),
      StructField("wav_sample_rate", IntegerType, nullable = true),
      StructField("wav_bits", IntegerType, nullable = true),
      StructField("wav_data_bytes", LongType, nullable = true),
      StructField("wav_duration_ms", LongType, nullable = true)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val hdr = MediaCodec.wavHeader(r.getAs[Array[Byte]]("bytes"))
        // Seq[Any], not Seq(...): mixed Int/Long elements would
        // otherwise numeric-widen the whole Seq to Long and break the
        // INT fields' external-type check
        Row.fromSeq(r.toSeq ++ (hdr match {
          case Some((f, c, sr, b, dl, ms)) => Seq[Any](f, c, sr, b, dl, ms)
          case None                        => Seq[Any](null, null, null, null, null, null)
        }))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Video twin of [[decodeImageMeta]]/[[decodeAudioMeta]]: per-row
    * ISO-BMFF header parse, appending (mp4_brand, mp4_timescale,
    * mp4_duration, mp4_duration_ms, mp4_tracks) — NULLs for non-MP4
    * payloads. Same batched-partition shape: header bytes only, no
    * frame buffers, rows stream through; works identically over a
    * streaming plan.
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("mp4_brand", StringType, nullable = true),
      StructField("mp4_timescale", IntegerType, nullable = true),
      StructField("mp4_duration", LongType, nullable = true),
      StructField("mp4_duration_ms", LongType, nullable = true),
      StructField("mp4_tracks", IntegerType, nullable = true)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val hdr = MediaCodec.mp4Header(r.getAs[Array[Byte]]("bytes"))
        // Seq[Any]: mixed String/Int/Long must not numeric-widen
        Row.fromSeq(r.toSeq ++ (hdr match {
          case Some((br, ts, d, ms, tk)) => Seq[Any](br, ts, d, ms, tk)
          case None                      => Seq[Any](null, null, null, null, null)
        }))
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
