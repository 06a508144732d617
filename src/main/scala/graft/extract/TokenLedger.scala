package graft.extract

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Per-stage LLM token accounting — the reference's
  * `total_tokens_prompted` / `self.token_used` bookkeeping
  * (`main.py:25-26, 45, 97-98, 105-135, 143-221`,
  * `run_profiler.py:477-488`, `evaluate_profiler.py:172-230`) as a
  * cluster-true ledger. Token cost IS Evaporate's headline economic
  * claim (the paper's 110× Code+-vs-Direct reduction): the cascade
  * spends LLM tokens only on the `trainSize` sample (synthesis, gold,
  * schema-id), while the whole-lake APPLY runs synthesized specs —
  * zero tokens — so cost is flat in lake size where Direct's grows
  * linearly. [[TokenLedger.report]] exhibits that shape as a
  * DataFrame; TokenCostSpec asserts it numerically.
  *
  * Mechanics mirror OpaqueEval's counters (`Extractors.scala`):
  * driver-registered [[LongAccumulator]]s captured into the wrapped
  * client, so counts from executor-side `mapPartitions` LLM stages
  * (DirectExtract, llmMap, pickValueCombine) and driver-side stages
  * (synthesis, rerank, validity) land in one place. Accumulator
  * updates from retried/speculated tasks can double-count — Spark
  * only guarantees exactly-once inside actions — which is the same
  * fidelity the reference's wall-clock token logging has; the ledger
  * is a cost report, not a billing system.
  *
  * Token counts use the BPE-ish approximation the engine already
  * ships for corpus stats (`TextStats.tokenCountBpe`: words plus
  * standalone punctuation) — deterministic and engine-portable,
  * standing in for the API-reported `usage.total_tokens` the
  * reference reads (`utils.py:269`).
  */
/** One stage's counters — a TOP-LEVEL class on purpose: the wrapped
  * client serializes these into executor tasks, and an inner class
  * would drag the enclosing [[TokenLedger]] along via `$outer`
  * (safe only while every ledger field stays @transient — a trap for
  * the next field added).
  */
final class StageCounters private[extract] (
    val stage: String,
    val calls: LongAccumulator,
    val promptTokens: LongAccumulator,
    val completionTokens: LongAccumulator)
    extends Serializable

final class TokenLedger(@transient private val sc: SparkContext) extends Serializable {

  @transient private val stages =
    new java.util.concurrent.ConcurrentHashMap[String, StageCounters]()
  // registration order, for a stable report row order
  @transient private val order =
    new java.util.concurrent.CopyOnWriteArrayList[String]()

  /** Driver-side: get-or-register the stage's counters. Called when a
    * stage WRAPS its client (always on the driver — the wrapped
    * client, not the ledger, is what serializes into tasks).
    */
  def counters(stage: String): StageCounters = {
    val got = stages.computeIfAbsent(
      stage,
      s => {
        val c = new StageCounters(
          s,
          sc.longAccumulator(s"graft.tokens.$s.calls"),
          sc.longAccumulator(s"graft.tokens.$s.prompt"),
          sc.longAccumulator(s"graft.tokens.$s.completion"))
        order.add(s)
        c
      })
    got
  }

  /** Wrap a client so every prompt/completion through it bills the
    * stage. Wrapping composes: account OUTSIDE a [[BailingLlmClient]]
    * so two stages can share one bail counter while billing apart.
    */
  def wrap(inner: LlmClient, stage: String): LlmClient =
    new TokenAccountingClient(inner, counters(stage))

  /** Pre-register a stage so it appears in the report even if no call
    * ever bills it — the whole-lake APPLY registers itself this way,
    * making its ZERO a checked row rather than an absence.
    */
  def touch(stage: String): Unit = { counters(stage); () }

  /** Driver-side totals per stage, in registration order. */
  def snapshot(): Seq[(String, Long, Long, Long)] = {
    val it = order.iterator()
    val b  = Seq.newBuilder[(String, Long, Long, Long)]
    while (it.hasNext) {
      val s = it.next()
      val c = stages.get(s)
      b += ((s, c.calls.value, c.promptTokens.value, c.completionTokens.value))
    }
    b.result()
  }

  def totalTokens: Long  = snapshot().map(r => r._3 + r._4).sum
  def totalCalls: Long   = snapshot().map(_._2).sum

  /** The cost-report relation: one row per stage —
    * (stage, llm_calls, prompt_tokens, completion_tokens,
    * total_tokens). Driver-side values (accumulators are), so this is
    * a tiny local relation, never a lake-sized plan.
    */
  def report(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot()
      .map { case (s, n, p, c) => (s, n, p, c, p + c) }
      .toDF("stage", "llm_calls", "prompt_tokens", "completion_tokens", "total_tokens")
  }

  def reset(): Unit = {
    val it = order.iterator()
    while (it.hasNext) {
      val c = stages.get(it.next())
      c.calls.reset(); c.promptTokens.reset(); c.completionTokens.reset()
    }
  }
}

object TokenLedger {
  /** BPE-ish token count: words plus standalone punctuation — the
    * driver/executor-side scalar twin of `TextStats.tokenCountBpe`.
    */
  private val tokenRe = java.util.regex.Pattern.compile("\\w+|[^\\w\\s]")

  def countTokens(s: String): Long = {
    if (s == null || s.isEmpty) return 0L
    val m = tokenRe.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }
}

/** The accounting wrapper: bills prompts as the inner client consumes
  * them and completions as the caller consumes answers — lazy on both
  * sides, so per-prompt streaming clients (BailingLlmClient) bill
  * only what they actually pull, and nothing buffers.
  */
final class TokenAccountingClient private[extract] (
    inner: LlmClient,
    ctr: StageCounters)
    extends LlmClient {

  def complete(prompts: Iterator[String]): Iterator[String] = {
    val counted = prompts.map { p =>
      ctr.calls.add(1L)
      ctr.promptTokens.add(TokenLedger.countTokens(p))
      p
    }
    inner.complete(counted).map { a =>
      ctr.completionTokens.add(TokenLedger.countTokens(a))
      a
    }
  }
}
