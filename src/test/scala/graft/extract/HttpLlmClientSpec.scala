package graft.extract

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Hermetic drive of the production client against an in-process
  * HTTP stub (no egress): request shape, key rotation, stop-token
  * truncation, retry on 429/5xx, and the content-hash response cache.
  */
class HttpLlmClientSpec extends AnyFunSuite {

  /** Stub endpoint; `handler` returns (status, body) per request. */
  private def withServer(handler: (String, HttpExchange) => (Int, String))(test: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/v1/completions",
      (ex: HttpExchange) => {
        val body           = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val (status, resp) = handler(body, ex)
        val bytes          = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/v1/completions")
    finally server.stop(0)
  }

  private def okJson(text: String) = s"""{"choices":[{"text":"$text"}]}"""

  test("request carries model/prompt/stop; completion text comes back, stop-truncated") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { (body, _) =>
      seen.add(body)
      (200, okJson("""42 mg\n---\ntrailing junk"""))
    } { url =>
      val c   = HttpLlmClient(url, keys = Seq("k1"), model = "m0", maxTokens = 64)
      val got = c.complete(Iterator("attribute: dose\ntext: dose: 42 mg")).toSeq
      assert(got == Seq("42 mg"))
      val b = seen.poll()
      assert(b.contains("\"model\":\"m0\""))
      assert(b.contains("\"max_tokens\":64"))
      assert(b.contains("\"stop\":[\"---\"]"))
      assert(b.contains("attribute: dose"))
    }
  }

  test("chat-shaped responses (message.content) parse too") {
    assert(
      HttpLlmClient.parseCompletion("""{"choices":[{"message":{"content":"hi"}}]}""") == "hi")
  }

  test("keys rotate round-robin across requests") {
    val auths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { (_, ex) =>
      auths.add(ex.getRequestHeaders.getFirst("Authorization"))
      (200, okJson("x"))
    } { url =>
      val c = HttpLlmClient(url, keys = Seq("a", "b", "c"))
      c.complete(Iterator("p1", "p2", "p3", "p4")).foreach(_ => ())
      val got = auths.toArray(Array.empty[String]).toSeq
      assert(got == Seq("Bearer a", "Bearer b", "Bearer c", "Bearer a"))
    }
  }

  test("429 then 500 then success: bounded retry recovers") {
    val n = new AtomicInteger(0)
    withServer { (_, _) =>
      n.incrementAndGet() match {
        case 1 => (429, """{"error":"throttled"}""")
        case 2 => (500, """{"error":"boom"}""")
        case _ => (200, okJson("recovered"))
      }
    } { url =>
      val c = HttpLlmClient(url, maxRetries = 3, backoffMs = 10)
      assert(c.completeOne("p") == "recovered")
      assert(n.get() == 3)
    }
  }

  test("retries exhaust into an IOException") {
    withServer((_, _) => (503, "down")) { url =>
      val c = HttpLlmClient(url, maxRetries = 2, backoffMs = 5)
      val e = intercept[java.io.IOException](c.completeOne("p"))
      assert(e.getMessage.contains("after 2 attempts"))
    }
  }

  test("content-hash cache: second identical prompt never hits the wire") {
    val n   = new AtomicInteger(0)
    val dir = java.nio.file.Files.createTempDirectory("llmcache").toString
    withServer { (_, _) =>
      (200, okJson(s"resp${n.incrementAndGet()}"))
    } { url =>
      val c = HttpLlmClient(url, cacheDir = Some(dir))
      assert(c.completeOne("same prompt") == "resp1")
      assert(c.completeOne("same prompt") == "resp1") // cache hit
      assert(n.get() == 1, s"expected 1 HTTP call, saw ${n.get()}")
      assert(c.completeOne("other prompt") == "resp2") // different key
      // a differently-parameterized client must not share entries
      val c2 = HttpLlmClient(url, cacheDir = Some(dir), maxTokens = 32)
      assert(c2.completeOne("same prompt") == "resp3")
      assert(n.get() == 3)
    }
  }

  test("cache survives client instances (the cross-run memo the reference's sqlite gives)") {
    val n   = new AtomicInteger(0)
    val dir = java.nio.file.Files.createTempDirectory("llmcache2").toString
    withServer { (_, _) => (200, okJson(s"r${n.incrementAndGet()}")) } { url =>
      assert(HttpLlmClient(url, cacheDir = Some(dir)).completeOne("p") == "r1")
      assert(HttpLlmClient(url, cacheDir = Some(dir)).completeOne("p") == "r1")
      assert(n.get() == 1)
    }
  }

  // -- fault injection (r13 VERDICT #8): the failures live runs hit --

  test("fault: mid-stream connection reset (truncated body) retries and recovers") {
    val n = new AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/v1/completions",
      (ex: HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        if (n.incrementAndGet() == 1) {
          // declare 1000 bytes, deliver 5, slam the connection: the
          // client's body read dies mid-stream (premature EOF -> IO
          // error), which must be RETRIED like any transport fault
          ex.sendResponseHeaders(200, 1000)
          ex.getResponseBody.write("{\"cho".getBytes(StandardCharsets.UTF_8))
          ex.close()
        } else {
          val bytes = okJson("recovered").getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/completions"
      val c   = HttpLlmClient(url, maxRetries = 3, backoffMs = 10)
      assert(c.completeOne("p") == "recovered")
      assert(n.get() == 2, "exactly one reset, one successful retry")
    } finally server.stop(0)
  }

  test("fault: slow-loris response past readTimeout retries at the boundary and recovers") {
    // needs a MULTI-threaded stub: the sleeping handler must not
    // queue-block the retry (a single dispatcher thread would starve
    // every retry into its own timeout)
    val n      = new AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext(
      "/v1/completions",
      (ex: HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        val i = n.incrementAndGet()
        if (i == 1) Thread.sleep(800) // > readTimeoutMs: client hangs up first
        val bytes = okJson(s"t$i").getBytes(StandardCharsets.UTF_8)
        try {
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        } catch { case _: java.io.IOException => () } // the timed-out socket is gone
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/completions"
      val c   = HttpLlmClient(url, maxRetries = 3, backoffMs = 10, readTimeoutMs = 200)
      // SocketTimeoutException IS an IOException: retried, not fatal
      assert(c.completeOne("p") == "t2")
      assert(n.get() == 2)
    } finally server.stop(0)
  }

  test("fault: corrupt cache entry reads as a miss - refetch, repair, never serve damage") {
    val n   = new AtomicInteger(0)
    val dir = java.nio.file.Files.createTempDirectory("llmcache3")
    withServer { (_, _) => (200, okJson(s"v${n.incrementAndGet()}")) } { url =>
      val c = HttpLlmClient(url, cacheDir = Some(dir.toString))
      assert(c.completeOne("p") == "v1")
      // damage the entry on disk (bad payload under a stale digest)
      val key  = HttpLlmClient.sha256(s"$url||256|---|p")
      val file = dir.resolve(key)
      assert(java.nio.file.Files.exists(file), "cache entry written")
      java.nio.file.Files.writeString(file, "0" * 64 + "\nGARBAGE NOT THE COMPLETION")
      // the digest check rejects it: refetch from the wire + repair
      assert(c.completeOne("p") == "v2")
      assert(n.get() == 2)
      // repaired entry verifies again: back to cache hits
      assert(c.completeOne("p") == "v2")
      assert(n.get() == 2)
    }
  }

  test("fault: legacy header-less cache entries refetch once instead of being served raw") {
    val n   = new AtomicInteger(0)
    val dir = java.nio.file.Files.createTempDirectory("llmcache4")
    withServer { (_, _) => (200, okJson(s"w${n.incrementAndGet()}")) } { url =>
      val key = HttpLlmClient.sha256(s"$url||256|---|p")
      java.nio.file.Files.writeString(dir.resolve(key), "pre-r14 un-checksummed payload")
      val c = HttpLlmClient(url, cacheDir = Some(dir.toString))
      assert(c.completeOne("p") == "w1", "legacy entry is not trusted")
      assert(c.completeOne("p") == "w1", "rewritten entry hits")
      assert(n.get() == 1)
    }
  }
}
