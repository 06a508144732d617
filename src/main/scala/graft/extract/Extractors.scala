package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spec-based extractor runtime — the engine's answer to the
  * reference's synthesized-Python UDF surface (`get_functions`,
  * `profiler.py:354-410`; sandboxed exec `profiler.py:247-347`).
  *
  * Instead of exec()ing LLM-written Python under a SIGALRM sandbox,
  * synthesis emits a *spec* (one of the three function shapes the
  * reference's prompts actually elicit — regex findall, split between
  * markers, html/meta selector; `prompts.py:206-281`). Each spec
  * compiles to a native column expression, so the "function" runs
  * inside whole-stage codegen over the whole lake — no sandbox, no
  * timeout, no per-row interpreter.
  *
  * Specs serialize as JSON strings (D6 `function_dictionary`
  * equivalent) so a catalog of synthesized extractors is itself a
  * DataFrame.
  */
sealed trait ExtractorSpec {
  def key: String

  /** Compile to a column over the chunk text → ARRAY<STRING> of
    * extracted values (empty array = abstain).
    */
  def compile(text: Column): Column
}

/** All regex matches of `pattern` group `group`. */
final case class RegexExtract(key: String, pattern: String, group: Int = 1) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val hits = regexp_extract_all(text, lit(pattern), lit(group))
    filter(transform(hits, v => trim(v)), v => length(v) > 0)
  }
}

/** Text between literal `pre` and `post` markers (first occurrence). */
final case class SplitMarker(key: String, pre: String, post: String) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val qp  = java.util.regex.Pattern.quote(pre)
    val qs  = if (post.isEmpty) "$" else java.util.regex.Pattern.quote(post)
    val hit = trim(regexp_extract(text, s"(?s)$qp(.*?)(?:$qs|$$)", 1))
    filter(array(hit), v => length(v) > 0)
  }
}

/** Value after "<attr>:" on the same line — the dominant shape for
  * key-value documents (FDA-510k style).
  */
final case class FieldLine(key: String, attr: String) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val q   = java.util.regex.Pattern.quote(attr)
    val hit = trim(regexp_extract(text, s"(?im)^\\s*$q\\s*[:=]\\s*(.+?)\\s*$$", 1))
    filter(array(hit), v => length(v) > 0)
  }
}

/** Content of an html tag/meta field, e.g. <title>…</title> or
  * <meta name="x" content="…">.
  */
final case class HtmlSelector(key: String, tag: String, attrName: String = "") extends ExtractorSpec {
  def compile(text: Column): Column = {
    // quote LLM-supplied names — a synthesized spec containing regex
    // metacharacters must not change or break the pattern
    val qt = java.util.regex.Pattern.quote(tag)
    val qa = java.util.regex.Pattern.quote(attrName)
    val hit =
      if (attrName.isEmpty)
        trim(regexp_extract(text, s"(?is)<$qt[^>]*>(.*?)</$qt>", 1))
      else
        trim(regexp_extract(text, s"""(?is)<$qt[^>]*\\b$qa\\s*=\\s*["']([^"']*)["']""", 1))
    filter(array(hit), v => length(v) > 0)
  }
}

object ExtractorSpec {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  implicit private val fmts: Formats = DefaultFormats

  def toJson(s: ExtractorSpec): String = {
    val m: Map[String, Any] = s match {
      case RegexExtract(k, p, g) => Map("kind" -> "regex", "key" -> k, "pattern" -> p, "group" -> g)
      case SplitMarker(k, a, b)  => Map("kind" -> "split", "key" -> k, "pre" -> a, "post" -> b)
      case FieldLine(k, a)       => Map("kind" -> "field_line", "key" -> k, "attr" -> a)
      case HtmlSelector(k, t, a) => Map("kind" -> "html", "key" -> k, "tag" -> t, "attrName" -> a)
      case OpaqueEval(k, b, t, mt) =>
        Map("kind" -> "opaque", "key" -> k, "body" -> b, "timeoutMs" -> t, "maxTimeouts" -> mt)
      case CallableExtract(k, _) =>
        // code-defined (the QA hook) — lives in code, not the catalog,
        // same as the reference's callable-fn branch
        throw new IllegalArgumentException(s"CallableExtract($k) is code-defined and not JSON-serializable")
    }
    JsonMethods.compact(JsonMethods.render(Extraction.decompose(m)))
  }

  def fromJson(js: String): ExtractorSpec = {
    val j = JsonMethods.parse(js)
    def str(f: String): String = (j \ f).extract[String]
    (j \ "kind").extract[String] match {
      case "regex"      => RegexExtract(str("key"), str("pattern"), (j \ "group").extractOrElse[Int](1))
      case "split"      => SplitMarker(str("key"), str("pre"), str("post"))
      case "field_line" => FieldLine(str("key"), str("attr"))
      case "html"       => HtmlSelector(str("key"), str("tag"), (j \ "attrName").extractOrElse[String](""))
      case "opaque" =>
        OpaqueEval(
          str("key"),
          str("body"),
          (j \ "timeoutMs").extractOrElse[Long](1000L),
          (j \ "maxTimeouts").extractOrElse[Int](2))
      case k            => throw new IllegalArgumentException(s"unknown extractor kind: $k")
    }
  }
}

/** Code-defined extractor — the QA-model hook (`configs.py:136-141`,
  * `profiler.py:293-296`): when the extraction "function" is a
  * callable rather than synthesized source, the reference calls
  * `fn(text)` directly with no parsing or sandbox. Here the callable
  * is any serializable `String => Seq[String]` (a span-scoring QA
  * model behind an endpoint, a tokenizer+heuristic, …) and it slots
  * into the same spec pipeline: `applySpecs` folds it with the
  * codegen'd specs, one scan, one shuffle.
  *
  * Not JSON-serializable by design (same as the reference, where the
  * callable lives in code, not in the function dictionary).
  */
final case class CallableExtract(key: String, fn: String => Seq[String]) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val f = fn
    val u = udf { (s: String) =>
      if (s == null) Seq.empty[String] else f(s).map(_.trim).filter(_.nonEmpty)
    }
    u(text)
  }
}

/** Bounded-eval fallback for opaque syntheses — the escape hatch the
  * spec runtime deliberately lacks (`exec` + 1 s SIGALRM,
  * `profiler.py:37-46,247-347`). When an LLM answer parses as none of
  * the spec shapes, the raw body lands here instead of vanishing:
  * a salvage interpreter pulls the first usable strategy out of the
  * code (a regex literal, a `re.search/findall` pattern, or a
  * `split('pre')[1].split('post')[0]` marker pair) and applies it to
  * the chunk under a hard wall-clock bound.
  *
  * Reference behaviors mirrored:
  *  - 1 s timeout per evaluation (`time_limit(1)`,
  *    `profiler.py:305,331`) → Future + Await; regex evaluation is
  *    made interruptible by an interrupt-checking CharSequence, so a
  *    catastrophically backtracking synthesized pattern dies at the
  *    bound instead of eating an executor core;
  *  - kill switch after `maxTimeouts` timeouts (`num_timeouts > 1`
  *    skips remaining files, `profiler.py:281-283`) — per (JVM, key),
  *    later rows short-circuit to abstain;
  *  - error second-chance on preprocessed text
  *    (`text.replace(">\n", ">")`, `profiler.py:286,317-330`);
  *  - error/timeout counting (`num_function_errors`,
  *    `profiler.py:322-335`) → per-body counters the driver can read
  *    after an action. Two tiers: the per-JVM maps behind
  *    [[OpaqueEval.errorCount]]/[[OpaqueEval.timeoutCount]] drive the
  *    kill switch (per-executor on a cluster — each executor gives a
  *    bad body its own maxTimeouts chances, bounded and acceptable),
  *    while driver-registered LongAccumulators captured into the UDF
  *    closure ([[OpaqueEval.accumulatedErrors]]/
  *    [[OpaqueEval.accumulatedTimeouts]]) give cluster-true totals.
  *    `resetCounters()` bumps an epoch baked into later-compiled
  *    plans, so per-run state resets reach executor JVMs too.
  *
  * A UDF, not codegen — deliberately: this is the slow path for the
  * rare unparsable synthesis; the prompt-elicited shapes stay native.
  */
final case class OpaqueEval(
    key: String,
    body: String,
    timeoutMs: Long = 1000,
    maxTimeouts: Int = 2
) extends ExtractorSpec {
  def compile(text: Column): Column = {
    val (k, b, tm, mt) = (key, body, timeoutMs, maxTimeouts)
    // capture the driver-registered accumulators (if any) AND the
    // current reset epoch into the UDF closure NOW, at plan-build time
    // on the driver: accumulators serialize with the closure and merge
    // executor-side increments back with task results, and the epoch
    // scopes the per-JVM kill-switch maps so a driver-side
    // resetCounters() gives bodies fresh chances on EXECUTOR JVMs too
    // (their static maps never see the driver's clear(), but plans
    // compiled after the reset carry a new epoch and key past the
    // stale entries)
    val (ea, ta) = (OpaqueEval.errorAccumulator, OpaqueEval.timeoutAccumulator)
    val ep       = OpaqueEval.currentEpoch
    val u = udf { (s: String) =>
      if (s == null) Seq.empty[String] else OpaqueEval.eval(k, b, s, tm, mt, ea, ta, ep)
    }
    u(text)
  }
}

object OpaqueEval {

  // counters and the kill switch key on the BODY, not the spec key:
  // the profiler renames every attribute's specs function_0..n, so a
  // key-scoped switch tripped by attribute A's broken code would
  // silently abstain attribute B's healthy extractor; the body is
  // what actually times out, and two specs sharing a body share its
  // fate (same as the reference's per-fn num_timeouts)
  private val timeouts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
  private val errors   = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  // Reset epoch: counter-map keys are "epoch|body". compile() captures
  // the driver's current epoch into each UDF closure, so a driver-side
  // resetCounters() makes plans built AFTERWARDS key past any stale
  // executor-JVM entries — the reset is cluster-true without touching
  // executor statics (old-epoch entries linger unused, bounded by one
  // per (reset, distinct body)).
  @volatile private var epoch: Long = 0L
  private[extract] def currentEpoch: Long = epoch

  private def epochKey(ep: Long, body: String): String = s"$ep|$body"

  def timeoutCount(body: String): Int =
    Option(timeouts.get(epochKey(epoch, body))).map(_.get).getOrElse(0)
  def errorCount(body: String): Int =
    Option(errors.get(epochKey(epoch, body))).map(_.get).getOrElse(0)

  /** Clear kill-switch state and counters. Called by `Profiler.run` at
    * the start of every run so a body that tripped the switch in one
    * run gets fresh chances in the next (the reference's num_timeouts
    * is per-run state, `profiler.py:281-283`); without this a
    * long-lived session silently abstains the body forever. The epoch
    * bump extends the guarantee to executor JVMs (see above).
    */
  def resetCounters(): Unit = {
    epoch += 1
    timeouts.clear(); errors.clear()
    errorAccumulator.foreach(_.reset())
    timeoutAccumulator.foreach(_.reset())
  }

  // Cluster-truth totals. The maps above are per-JVM: exact in local
  // mode, per-executor on a cluster (each executor gives a bad body
  // its own maxTimeouts chances — acceptable for the kill switch,
  // wrong for reporting). These LongAccumulators, registered by the
  // driver and captured into every OpaqueEval UDF closure at
  // compile(), aggregate increments across executors the way Spark
  // metrics are meant to (speculative/retried tasks may double-count,
  // which is the documented accumulator caveat and fine for
  // diagnostics).
  @volatile private var accs: Option[(org.apache.spark.util.LongAccumulator, org.apache.spark.util.LongAccumulator)] = None
  @volatile private var accOwner: String = ""

  /** Register (or re-register after a SparkContext restart) the
    * error/timeout accumulators. Idempotent per application.
    */
  def installAccumulators(sc: org.apache.spark.SparkContext): Unit = synchronized {
    if (accs.isEmpty || accOwner != sc.applicationId) {
      accs = Some((sc.longAccumulator("graft.opaque.errors"), sc.longAccumulator("graft.opaque.timeouts")))
      accOwner = sc.applicationId
    }
  }
  def errorAccumulator: Option[org.apache.spark.util.LongAccumulator]   = accs.map(_._1)
  def timeoutAccumulator: Option[org.apache.spark.util.LongAccumulator] = accs.map(_._2)

  /** Driver-visible totals across all executors (0 until installed). */
  def accumulatedErrors: Long   = errorAccumulator.map(_.sum).getOrElse(0L)
  def accumulatedTimeouts: Long = timeoutAccumulator.map(_.sum).getOrElse(0L)

  private def counter(m: java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger], k: String) =
    m.computeIfAbsent(k, _ => new java.util.concurrent.atomic.AtomicInteger(0))

  /** Daemon pool for bounded evaluation; sized generously (evals are
    * short; the pool exists to own interruptible threads, not to
    * queue work).
    */
  private lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool((r: Runnable) => {
      val t = new Thread(r, "graft-opaque-eval"); t.setDaemon(true); t
    })

  private[extract] def eval(
      key: String,
      body: String,
      text: String,
      timeoutMs: Long,
      maxTimeouts: Int,
      errAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      toAcc: Option[org.apache.spark.util.LongAccumulator] = None,
      ep: Long = currentEpoch): Seq[String] = {
    val ck = epochKey(ep, body)
    val tc = counter(timeouts, ck)
    if (tc.get() >= maxTimeouts) return Seq.empty // kill switch
    val fut = pool.submit(new java.util.concurrent.Callable[Seq[String]] {
      private def interrupted(e: Throwable) =
        e.isInstanceOf[InterruptedException] || e.getCause.isInstanceOf[InterruptedException]
      def call(): Seq[String] = {
        // FutureTask.cancel(true) does not clear the worker's interrupt
        // flag — scrub any stale one from a previously timed-out eval
        Thread.interrupted()
        try interpret(body, text)
        catch {
          case e: Throwable if interrupted(e) => throw e // timed out — no retry
          case _: Throwable =>
            // second chance on preprocessed text; an error only counts
            // when both attempts fail (err reset at profiler.py:328)
            try interpret(body, text.replace(">\n", ">"))
            catch {
              case _: Throwable =>
                counter(errors, ck).incrementAndGet(); errAcc.foreach(_.add(1L)); Seq.empty
            }
        }
      }
    })
    try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true) // interrupts; InterruptibleCharSequence aborts the matcher
        tc.incrementAndGet()
        toAcc.foreach(_.add(1L))
        Seq.empty
      case _: Throwable =>
        counter(errors, ck).incrementAndGet(); errAcc.foreach(_.add(1L)); Seq.empty
    }
  }

  /** Per-body compiled strategy, memoized: the salvage parse and the
    * Pattern.compile happen once per distinct body per JVM, not once
    * per row of the whole-lake APPLY pass.
    */
  private sealed trait Strategy
  private final case class RegexStrategy(p: java.util.regex.Pattern, grp: Int) extends Strategy
  private final case class MarkerStrategy(pre: String, post: String)           extends Strategy
  private case object NoStrategy                                               extends Strategy

  private val strategies = new java.util.concurrent.ConcurrentHashMap[String, Strategy]()

  private def strategyFor(body: String): Strategy =
    strategies.computeIfAbsent(
      body,
      b =>
        regexLiteral(b) match {
          case Some(pat) =>
            val p = java.util.regex.Pattern.compile(pat, java.util.regex.Pattern.MULTILINE)
            RegexStrategy(p, if (p.matcher("").groupCount() > 0) 1 else 0)
          case None =>
            markerChain(b) match {
              case Some((pre, post)) => MarkerStrategy(pre, post)
              case None              => NoStrategy
            }
        })

  /** Apply the first workable extraction strategy from an opaque code
    * body. Strategies, in order:
    *  1. a regex literal — `r'…'`, `r"…"`, or the first quoted arg of
    *     `re.search/findall/match/finditer(…)` — applied as findall
    *     (group 1 when the pattern has groups, whole match otherwise);
    *  2. a marker chain — `split('pre')[1]` then optional
    *     `split('post')[0]` — applied as substring-between;
    *  3. nothing recognizable → abstain (empty).
    */
  private[extract] def interpret(body: String, text: String): Seq[String] =
    strategyFor(body) match {
      case RegexStrategy(p, grp) =>
        val m   = p.matcher(new InterruptibleCharSequence(text))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (m.find()) {
          val v = m.group(grp)
          if (v != null && v.trim.nonEmpty) out += v.trim
        }
        out.toSeq
      case MarkerStrategy(pre, post) =>
        val i = text.indexOf(pre)
        if (i < 0) Seq.empty
        else {
          val rest = text.substring(i + pre.length)
          val j    = if (post.isEmpty) -1 else rest.indexOf(post)
          val v    = (if (j < 0) rest else rest.substring(0, j)).trim
          if (v.isEmpty) Seq.empty else Seq(v)
        }
      case NoStrategy => Seq.empty
    }

  private val reCall  = java.util.regex.Pattern.compile("""re\s*\.\s*(?:search|findall|match|finditer)\s*\(\s*r?(['"])(.*?)\1""", java.util.regex.Pattern.DOTALL)
  private val rawLit  = java.util.regex.Pattern.compile("""\br(['"])(.*?)\1""", java.util.regex.Pattern.DOTALL)
  private val splitP  = java.util.regex.Pattern.compile("""\.\s*split\s*\(\s*(['"])(.*?)\1\s*\)\s*\[\s*(\d+)\s*\]""")

  private def regexLiteral(body: String): Option[String] = {
    val m1 = reCall.matcher(body)
    if (m1.find()) return compilable(m1.group(2))
    val m2 = rawLit.matcher(body)
    if (m2.find()) return compilable(m2.group(2))
    None
  }

  private def compilable(pat: String): Option[String] =
    try { java.util.regex.Pattern.compile(pat); Some(pat) }
    catch { case _: Throwable => None }

  /** `x.split('pre')[1]` (+ optional `.split('post')[0]`) → markers. */
  private def markerChain(body: String): Option[(String, String)] = {
    val m = splitP.matcher(body)
    var pre: Option[String] = None
    var post                = ""
    while (m.find()) {
      val marker = m.group(2)
      val idx    = m.group(3).toInt
      if (pre.isEmpty && idx >= 1) pre = Some(marker)
      else if (pre.nonEmpty && idx == 0 && post.isEmpty) post = marker
    }
    pre.map(_ -> post)
  }
}

/** CharSequence that aborts regex matching when its thread is
  * interrupted — `java.util.regex` never checks interrupt status
  * itself, so Future.cancel(true) alone cannot stop a backtracking
  * match; routing every charAt through this check can.
  */
final class InterruptibleCharSequence(underlying: CharSequence) extends CharSequence {
  def length(): Int = underlying.length()
  def charAt(index: Int): Char = {
    if (Thread.currentThread().isInterrupted)
      throw new RuntimeException(new InterruptedException("regex evaluation interrupted"))
    underlying.charAt(index)
  }
  def subSequence(start: Int, end: Int): CharSequence =
    new InterruptibleCharSequence(underlying.subSequence(start, end))
  override def toString: String = underlying.toString
}
