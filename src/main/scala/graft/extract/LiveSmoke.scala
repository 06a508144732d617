package graft.extract

/** Env-gated LIVE-endpoint smoke check for [[HttpLlmClient]] /
  * [[HttpEncoderClient]] — the one corner of the surface that stubs
  * and fault-injection specs cannot exercise (the reference's
  * analogue, `utils.py:244-298`'s manifest session, is likewise only
  * verified against a live endpoint). This main NEVER runs in CI:
  * with `GRAFT_LIVE_SMOKE` unset it prints a skip notice and exits 0,
  * so the zero-egress build stays zero-egress; a user with real
  * endpoints opts in explicitly:
  *
  * {{{
  * GRAFT_LIVE_SMOKE=1 \
  * GRAFT_SMOKE_LLM_ENDPOINT=https://host/v1/completions \
  * GRAFT_SMOKE_LLM_MODEL=some-model \
  * GRAFT_SMOKE_API_KEY=sk-... \
  * GRAFT_SMOKE_ENCODER_ENDPOINT=https://host/v1/embeddings \
  * GRAFT_SMOKE_ENCODER_MODEL=some-encoder \
  * GRAFT_SMOKE_ENCODER_DIM=1536 \
  *   sbt "runMain graft.extract.LiveSmoke"
  * }}}
  *
  * Either endpoint may be omitted; each configured leg runs one
  * minimal request and reports pass/fail. Exit codes: 0 = all
  * configured legs passed (or gate unset), 1 = a configured leg
  * failed, 2 = gate set but NO endpoint configured (a misconfigured
  * invocation should not report green).
  */
object LiveSmoke {
  def main(args: Array[String]): Unit = {
    if (!sys.env.get("GRAFT_LIVE_SMOKE").exists(v => v == "1" || v.equalsIgnoreCase("true"))) {
      println("""{"smoke":"skipped","reason":"GRAFT_LIVE_SMOKE not set; live-endpoint smoke is opt-in (zero-egress CI)"}""")
      return
    }
    val keys = sys.env.get("GRAFT_SMOKE_API_KEY").toSeq
    var ran, failed = 0

    def leg(name: String)(run: => String): Unit = {
      ran += 1
      try println(s"""{"smoke":"$name","ok":true,"detail":"${run.replaceAll("[\"\\\\\\n\\r]", " ").take(120)}"}""")
      catch {
        case e: Throwable =>
          failed += 1
          val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\\n\\r]", " ").take(200)
          println(s"""{"smoke":"$name","ok":false,"error":"$msg"}""")
      }
    }

    sys.env.get("GRAFT_SMOKE_LLM_ENDPOINT").foreach { ep =>
      leg("llm_complete") {
        val client = HttpLlmClient(
          endpoint = ep,
          keys = keys,
          model = sys.env.getOrElse("GRAFT_SMOKE_LLM_MODEL", ""),
          maxTokens = 16)
        val resp = client.completeOne("Reply with the single word: pong")
        require(resp != null && resp.nonEmpty, "empty completion")
        s"completion non-empty (${resp.length} chars)"
      }
    }

    sys.env.get("GRAFT_SMOKE_ENCODER_ENDPOINT").foreach { ep =>
      leg("encoder_encode") {
        val dim = sys.env.getOrElse("GRAFT_SMOKE_ENCODER_DIM", "1536").toInt
        val client = HttpEncoderClient(
          endpoint = ep,
          dim = dim,
          keys = keys,
          model = sys.env.getOrElse("GRAFT_SMOKE_ENCODER_MODEL", ""))
        val vecs = client.encode(Iterator("smoke check alpha", "smoke check beta")).toSeq
        require(vecs.length == 2, s"expected 2 vectors, got ${vecs.length}")
        require(vecs.forall(_.length == dim), s"vector dim != $dim")
        s"2 vectors of dim $dim"
      }
    }

    if (ran == 0) {
      println("""{"smoke":"misconfigured","ok":false,"error":"GRAFT_LIVE_SMOKE set but no GRAFT_SMOKE_*_ENDPOINT configured"}""")
      sys.exit(2)
    }
    if (failed > 0) sys.exit(1)
  }
}
