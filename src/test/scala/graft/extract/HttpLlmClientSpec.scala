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
}
