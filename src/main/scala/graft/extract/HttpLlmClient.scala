package graft.extract

import java.nio.charset.StandardCharsets

/** Production LLM client: HTTP completions endpoint + key rotation +
  * content-hash response cache + bounded retry.
  *
  * Re-expresses the reference's live path (`utils.py`):
  *  - key rotation across sessions (`apply_prompt`, `utils.py:37-47`)
  *    → round-robin over `keys`, advancing per request AND on each
  *    retry (a throttled key hands the retry to the next one);
  *  - sqlite response cache keyed by prompt+params
  *    (`get_manifest_session` cache_params, `utils.py:225-235`)
  *    → one file per sha-256(model|maxTokens|prompt) under `cacheDir`,
  *    written temp-then-rename, read/written through the Hadoop
  *    FileSystem API so the same client works on `file:` in tests and
  *    on shared storage (HDFS/S3) from every executor in a
  *    `mapPartitions` LLM stage — the cluster-safe replacement for a
  *    driver-local sqlite file. Stage-level memoization composes on
  *    top via `graft.lake.Sinks.readOrCompute` (whole extraction
  *    relations keyed by run params);
  *  - bounded retry with backoff (`get_response` via manifest retry,
  *    `utils.py:244-298`) → `maxRetries` attempts on IO errors /
  *    429 / 5xx, deterministic exponential backoff (no jitter RNG —
  *    reproducible tests, and executor-count decorrelates in
  *    production);
  *  - stop-token truncation (`utils.py:292-294`):
  *    `response.split(stop)[0].strip`.
  *
  * Request/response shape is the OpenAI-style completions JSON the
  * reference speaks through manifest; both `choices[0].text` and
  * `choices[0].message.content` parse (completion + chat shapes,
  * like `utils.py`'s openai/openaichat split).
  *
  * The trait stays the seam: [[MockLlmClient]] remains the default
  * everywhere in tests; this class is the one a user points at a live
  * endpoint.
  */
final case class HttpLlmClient(
    endpoint: String,
    keys: Seq[String] = Seq.empty,
    model: String = "",
    maxTokens: Int = 256,
    stopToken: String = "---",
    cacheDir: Option[String] = None,
    maxRetries: Int = 3,
    backoffMs: Long = 200,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 120000
) extends LlmClient {

  import HttpLlmClient._

  def complete(prompts: Iterator[String]): Iterator[String] =
    prompts.map(completeOne)

  def completeOne(prompt: String): String =
    cacheDir match {
      case None => truncate(request(prompt))
      case Some(dir) =>
        val key = cacheKey(prompt)
        cacheGet(dir, key).getOrElse {
          val out = truncate(request(prompt))
          cachePut(dir, key, out)
          out
        }
    }

  /** Cache key binds the response to everything that shaped it —
    * endpoint included, so two clients pointed at different servers
    * that happen to share a model name never serve each other's
    * cached completions (the reference keys its sqlite cache per
    * session the same way).
    */
  private def cacheKey(prompt: String): String =
    sha256(s"$endpoint|$model|$maxTokens|$stopToken|$prompt")

  private def truncate(resp: String): String = {
    val t = resp.trim
    if (stopToken.isEmpty) t else t.split(java.util.regex.Pattern.quote(stopToken), 2)(0).trim
  }

  // -- HTTP ----------------------------------------------------------

  private def request(prompt: String): String =
    HttpSupport.withRetries(maxRetries, backoffMs, "LLM request")(requestOnce(prompt))

  private def requestOnce(prompt: String): String = {
    val url  = new java.net.URL(endpoint)
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      if (keys.nonEmpty) conn.setRequestProperty("Authorization", s"Bearer ${nextKey()}")
      val body = requestJson(prompt).getBytes(StandardCharsets.UTF_8)
      conn.getOutputStream.write(body)
      conn.getOutputStream.close()
      val code = conn.getResponseCode
      if (code == 429 || code >= 500) {
        drain(conn.getErrorStream)
        throw new RetryableHttpError(code)
      }
      if (code >= 400) {
        val err = drain(conn.getErrorStream)
        throw new IllegalStateException(s"LLM endpoint returned $code: ${err.take(500)}")
      }
      parseCompletion(drain(conn.getInputStream))
    } finally conn.disconnect()
  }

  private def nextKey(): String = rotor.next()

  @transient private lazy val rotor = new HttpSupport.KeyRotor(keys)

  private def requestJson(prompt: String): String = {
    val sb = new StringBuilder("{")
    if (model.nonEmpty) sb.append("\"model\":").append(quote(model)).append(',')
    sb.append("\"prompt\":").append(quote(prompt)).append(',')
    sb.append("\"max_tokens\":").append(maxTokens).append(',')
    sb.append("\"temperature\":0")
    if (stopToken.nonEmpty) sb.append(",\"stop\":[").append(quote(stopToken)).append(']')
    sb.append('}').toString
  }

  // -- cache: shared Hadoop-FS string store (HttpSupport) ------------

  private def cacheGet(dir: String, key: String): Option[String] =
    HttpSupport.cacheGet(dir, key)

  private def cachePut(dir: String, key: String, value: String): Unit =
    HttpSupport.cachePut(dir, key, value)
}

object HttpLlmClient {

  /** Retryable HTTP status (throttle / transient server error). */
  final class RetryableHttpError(val code: Int) extends RuntimeException(s"HTTP $code")

  def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  private[extract] def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'          => sb.append("\\\"")
      case '\\'         => sb.append("\\\\")
      case '\n'         => sb.append("\\n")
      case '\r'         => sb.append("\\r")
      case '\t'         => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c            => sb.append(c)
    }
    sb.append('"').toString
  }

  private[extract] def drain(in: java.io.InputStream): String =
    if (in == null) ""
    else
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()

  /** Pull the completion text out of an OpenAI-shaped response:
    * `choices[0].text` (completions) or `choices[0].message.content`
    * (chat), mirroring the reference's two client paths.
    */
  def parseCompletion(json: String): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val ast = JsonMethods.parse(json)
    (ast \ "choices") match {
      case JArray(first :: _) =>
        (first \ "text") match {
          case JString(t) => t
          case _ =>
            (first \ "message" \ "content") match {
              case JString(t) => t
              case _          => throw new IllegalStateException(s"no completion text in: ${json.take(300)}")
            }
        }
      case _ => throw new IllegalStateException(s"no choices in: ${json.take(300)}")
    }
  }
}
