package graft.extract

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Hermetic drive of the production encoder client against an
  * in-process HTTP stub (no egress): batch request shape, per-text
  * caching, retry, out-of-order index handling, and dim validation.
  */
class HttpEncoderClientSpec extends AnyFunSuite {

  private def withServer(handler: (String, HttpExchange) => (Int, String))(test: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/v1/embeddings",
      (ex: HttpExchange) => {
        val body           = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val (status, resp) = handler(body, ex)
        val bytes          = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings")
    finally server.stop(0)
  }

  /** Serve v = [seed, seed, dim-2 zeros] for the i-th input. */
  private def okJson(nInputs: Int, dim: Int, seedOf: Int => Double): String = {
    val items = (0 until nInputs).map { i =>
      val v = (Seq(seedOf(i), seedOf(i)) ++ Seq.fill(dim - 2)(0.0)).mkString(",")
      s"""{"index":$i,"embedding":[$v]}"""
    }
    s"""{"data":[${items.mkString(",")}]}"""
  }

  private def countInputs(body: String): Int =
    "\"input\":\\[(.*)\\]".r.findFirstMatchIn(body).map(_.group(1).split("\",\"").length).getOrElse(0)

  test("batch request carries model and inputs; vectors come back in order") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer { (body, _) =>
      seen.add(body)
      (200, okJson(countInputs(body), 4, i => i + 1.0))
    } { url =>
      val c   = HttpEncoderClient(url, dim = 4, model = "emb0", keys = Seq("k"))
      val got = c.encode(Iterator("alpha", "beta", "gamma")).toSeq
      assert(got.size == 3)
      assert(got(0)(0) == 1.0f && got(1)(0) == 2.0f && got(2)(0) == 3.0f)
      val b = seen.poll()
      assert(b.contains("\"model\":\"emb0\""))
      assert(b.contains("\"input\":[\"alpha\",\"beta\",\"gamma\"]"))
    }
  }

  test("out-of-order provider indices are re-sorted") {
    val json =
      """{"data":[{"index":1,"embedding":[2.0,0.0]},{"index":0,"embedding":[1.0,0.0]}]}"""
    val vecs = HttpEncoderClient.parseEmbeddings(json)
    assert(vecs(0)(0) == 1.0f && vecs(1)(0) == 2.0f)
  }

  test("batchSize slices the input stream into multiple requests") {
    val calls = new AtomicInteger(0)
    withServer { (body, _) =>
      calls.incrementAndGet()
      (200, okJson(countInputs(body), 2, _ => 1.0))
    } { url =>
      val c = HttpEncoderClient(url, dim = 2, batchSize = 2)
      assert(c.encode(Iterator("a", "b", "c", "d", "e")).size == 5)
      assert(calls.get() == 3, s"expected ceil(5/2)=3 calls, saw ${calls.get()}")
    }
  }

  test("429 then success: bounded retry recovers; wrong dim fails loudly") {
    val n = new AtomicInteger(0)
    withServer { (body, _) =>
      if (n.incrementAndGet() == 1) (429, """{"error":"throttled"}""")
      else (200, okJson(countInputs(body), 2, _ => 7.0))
    } { url =>
      val c = HttpEncoderClient(url, dim = 2, maxRetries = 3, backoffMs = 5)
      assert(c.encode(Iterator("t")).next()(0) == 7.0f)
      assert(n.get() == 2)
      val wrong = HttpEncoderClient(url, dim = 8, maxRetries = 1)
      intercept[IllegalArgumentException](wrong.encode(Iterator("t")).next())
    }
  }

  test("per-text cache: repeated texts never hit the wire again, across instances") {
    val n   = new AtomicInteger(0)
    val dir = java.nio.file.Files.createTempDirectory("embcache").toString
    withServer { (body, _) =>
      n.incrementAndGet()
      (200, okJson(countInputs(body), 2, _ => 5.0))
    } { url =>
      val c = HttpEncoderClient(url, dim = 2, cacheDir = Some(dir))
      assert(c.encode(Iterator("same text")).next()(0) == 5.0f)
      assert(c.encode(Iterator("same text")).next()(0) == 5.0f) // cache hit
      assert(n.get() == 1, s"expected 1 HTTP call, saw ${n.get()}")
      // a fresh instance shares the store (the cross-run memo)
      val c2 = HttpEncoderClient(url, dim = 2, cacheDir = Some(dir))
      assert(c2.encode(Iterator("same text")).next()(0) == 5.0f)
      assert(n.get() == 1)
      // mixed batch: only the miss goes to the wire
      val got = c2.encode(Iterator("same text", "new text")).toSeq
      assert(got.size == 2 && n.get() == 2)
    }
  }

  test("null texts encode as empty string instead of NPEing the batch") {
    withServer { (body, _) => (200, okJson(countInputs(body), 2, _ => 9.0)) } { url =>
      val c   = HttpEncoderClient(url, dim = 2)
      val got = c.encode(Iterator(null, "real text")).toSeq
      assert(got.size == 2 && got.forall(_.length == 2))
    }
  }

  test("fault: corrupt vector cache entry refetches instead of NumberFormatException-ing the pass") {
    val n   = new AtomicInteger(0)
    val dir = java.nio.file.Files.createTempDirectory("embcache2")
    withServer { (body, _) =>
      n.incrementAndGet()
      (200, okJson(countInputs(body), 2, _ => 5.0))
    } { url =>
      val c = HttpEncoderClient(url, dim = 2, cacheDir = Some(dir.toString))
      assert(c.encode(Iterator("doc")).next()(0) == 5.0f)
      // damage the entry: garbage bytes that would explode toFloat if
      // the store served them — the digest check must miss instead
      val key = HttpLlmClient.sha256(s"$url||2|doc")
      java.nio.file.Files.writeString(dir.resolve(key), "0" * 64 + "\nnot,floats,at,all")
      assert(c.encode(Iterator("doc")).next()(0) == 5.0f, "refetched, not parsed garbage")
      assert(n.get() == 2)
      assert(c.encode(Iterator("doc")).next()(0) == 5.0f, "repaired entry hits")
      assert(n.get() == 2)
    }
  }

  test("slots into the Encode.embed stage like the mock (EncoderClient seam)") {
    withServer { (body, _) => (200, okJson(countInputs(body), 2, _ => 3.0)) } { url =>
      val spark = graft.TestSpark.spark
      import spark.implicits._
      val df  = Seq((1L, "one doc"), (2L, "another doc")).toDF("id", "text")
      val out = Encode.embed(df, "text", HttpEncoderClient(url, dim = 2))
      val vecs = out.select("embedding").collect().map(_.getSeq[Float](0))
      assert(vecs.length == 2 && vecs.forall(v => v.length == 2 && v.head == 3.0f))
    }
  }
}
