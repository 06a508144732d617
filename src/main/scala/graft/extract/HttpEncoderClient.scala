package graft.extract

import java.nio.charset.StandardCharsets

/** Production embedding client: HTTP embeddings endpoint + key
  * rotation + content-hash vector cache + bounded retry — the live
  * counterpart of [[MockEncoderClient]], completing the encoder seam
  * the way [[HttpLlmClient]] completes [[LlmClient]] (the reference's
  * contriever forward pass, `retrieval.py:5-29`, served from an
  * endpoint instead of in-process weights, which this container
  * cannot hold).
  *
  * Design mirrors HttpLlmClient deliberately:
  *  - OpenAI-style embeddings JSON (`{"model":…,"input":[…]}` →
  *    `data[i].embedding`), requested in `batchSize` slices so one
  *    `mapPartitions` partition amortizes connection setup;
  *  - round-robin key rotation, advancing per request and per retry;
  *  - bounded retry with deterministic exponential backoff on
  *    429/5xx/IO errors;
  *  - per-text vector cache through the Hadoop FileSystem API
  *    (file:/hdfs:/s3a:), keyed sha-256(endpoint|model|dim|text),
  *    temp-then-rename writes — cluster-shared, so a re-run of a
  *    100 TB embedding pass only pays for texts it has never seen.
  *
  * Batch semantics: the cache is consulted per text; only misses go
  * to the wire (in input order), and responses are validated to
  * return exactly one `dim`-sized vector per input.
  */
final case class HttpEncoderClient(
    endpoint: String,
    dim: Int,
    keys: Seq[String] = Seq.empty,
    model: String = "",
    batchSize: Int = 32,
    cacheDir: Option[String] = None,
    maxRetries: Int = 3,
    backoffMs: Long = 200,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 120000
) extends EncoderClient {

  require(dim > 0, "dim must be positive")
  require(batchSize > 0, "batchSize must be positive")

  import HttpLlmClient.{drain, quote, sha256, RetryableHttpError}

  /** Null texts encode as "" (the mock does the same): a scraped lake
    * routinely carries NULL documents and one of them must not kill a
    * 100 TB embedding pass with an NPE inside the JSON encoder.
    */
  def encode(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.map(t => if (t == null) "" else t).grouped(batchSize).flatMap(encodeBatch)

  private def encodeBatch(batch: Seq[String]): Seq[Array[Float]] = {
    val cached: Seq[Option[Array[Float]]] = cacheDir match {
      case None      => Seq.fill(batch.size)(None)
      case Some(dir) => batch.map(t => cacheGet(dir, cacheKey(t)))
    }
    val misses = batch.zip(cached).collect { case (t, None) => t }
    val fetched: Map[String, Array[Float]] =
      if (misses.isEmpty) Map.empty
      else {
        val distinct = misses.distinct
        val vecs     = request(distinct)
        val got      = distinct.zip(vecs).toMap
        cacheDir.foreach(dir => got.foreach { case (t, v) => cachePut(dir, cacheKey(t), v) })
        got
      }
    batch.zip(cached).map { case (t, c) => c.getOrElse(fetched(t)) }
  }

  private def cacheKey(text: String): String =
    sha256(s"$endpoint|$model|$dim|$text")

  // -- HTTP ----------------------------------------------------------

  private def request(texts: Seq[String]): Seq[Array[Float]] =
    HttpSupport.withRetries(maxRetries, backoffMs, "embedding request")(requestOnce(texts))

  private def requestOnce(texts: Seq[String]): Seq[Array[Float]] = {
    val url  = new java.net.URL(endpoint)
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      if (keys.nonEmpty) conn.setRequestProperty("Authorization", s"Bearer ${nextKey()}")
      val body = requestJson(texts).getBytes(StandardCharsets.UTF_8)
      conn.getOutputStream.write(body)
      conn.getOutputStream.close()
      val code = conn.getResponseCode
      if (code == 429 || code >= 500) {
        drain(conn.getErrorStream)
        throw new RetryableHttpError(code)
      }
      if (code >= 400) {
        val err = drain(conn.getErrorStream)
        throw new IllegalStateException(s"embedding endpoint returned $code: ${err.take(500)}")
      }
      val vecs = HttpEncoderClient.parseEmbeddings(drain(conn.getInputStream))
      require(
        vecs.size == texts.size && vecs.forall(_.length == dim),
        s"endpoint returned ${vecs.size} vectors (dims ${vecs.map(_.length).distinct.mkString(",")}) " +
          s"for ${texts.size} inputs of expected dim $dim")
      vecs
    } finally conn.disconnect()
  }

  private def nextKey(): String = rotor.next()

  @transient private lazy val rotor = new HttpSupport.KeyRotor(keys)

  private def requestJson(texts: Seq[String]): String = {
    val sb = new StringBuilder("{")
    if (model.nonEmpty) sb.append("\"model\":").append(quote(model)).append(',')
    sb.append("\"input\":[").append(texts.map(quote).mkString(",")).append(']')
    sb.append('}').toString
  }

  // -- cache: shared Hadoop-FS string store (HttpSupport), vectors
  // serialized as comma-joined floats -------------------------------

  private def cacheGet(dir: String, key: String): Option[Array[Float]] =
    HttpSupport.cacheGet(dir, key).flatMap { s =>
      val v = s.split(',').map(_.toFloat)
      if (v.length == dim) Some(v) else None // stale entry from another dim config
    }

  private def cachePut(dir: String, key: String, value: Array[Float]): Unit =
    HttpSupport.cachePut(dir, key, value.mkString(","))
}

object HttpEncoderClient {

  /** Pull vectors out of an OpenAI-shaped embeddings response:
    * `data[i].embedding`, ordered by `index` when present (providers
    * may return batch items out of order).
    */
  def parseEmbeddings(json: String): Seq[Array[Float]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val ast = JsonMethods.parse(json)
    (ast \ "data") match {
      case JArray(items) =>
        val parsed = items.zipWithIndex.map { case (item, pos) =>
          val idx = (item \ "index") match {
            case JInt(i) => i.toInt
            case _       => pos
          }
          val vec = (item \ "embedding") match {
            case JArray(xs) =>
              xs.map {
                case JDouble(d)  => d.toFloat
                case JInt(i)     => i.toFloat
                case JDecimal(d) => d.toFloat
                case other       => throw new IllegalStateException(s"non-numeric embedding element: $other")
              }.toArray
            case _ => throw new IllegalStateException(s"no embedding array in item: ${JsonMethods.compact(JsonMethods.render(item)).take(200)}")
          }
          idx -> vec
        }
        parsed.sortBy(_._1).map(_._2)
      case _ => throw new IllegalStateException(s"no data array in: ${json.take(300)}")
    }
  }
}
