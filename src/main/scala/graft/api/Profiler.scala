package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{Chunker, ChunkFilter}
import graft.extract._
import graft.score.Score
import graft.combine.{Combiners, StructuredView}
import graft.schema.SchemaId

/** End-to-end profiler — the library counterpart of the reference's
  * `EvaporateData` programmatic API (`main.py:17-240`) and the
  * per-attribute cascade (`run_profiler`, `profiler.py:599-747`):
  *
  *   prepare (chunk) → [OpenIE] identify schema → sample → per
  *   attribute: synthesize extractor specs from the sample + LLM
  *   "gold" on the sample → score specs vs gold → top-k select →
  *   apply the cheap specs to the WHOLE lake → combine votes →
  *   pivot to the structured view (D9).
  *
  * The cascade's economics survive at 100 TB because the expensive
  * operator (LLM) touches only `trainSize` documents; the whole-lake
  * pass runs synthesized specs, which compile to native column
  * expressions (codegen, no shuffle until the final vote/pivot).
  * Sampling is content-hash deterministic, not seeded-RNG
  * (SURVEY §7 hard part (d)).
  */
final case class ProfilerConfig(
    chunkSize: Int = 3000,
    trainSize: Int = 10,
    numTopK: Int = 10,
    keepThresh: Double = 0.5,
    numAttrs: Int = 35,
    /** Vote combiner (`combiner_mode`, `configs.py`/`profiler.py:147`):
      *  - "mv"         abstain-aware majority vote (default)
      *  - "top_k"      majority vote, extraction fraction forced to 0
      *                 (`evaluate_profiler.py:210-212` — the naive
      *                 setting never drops abstains)
      *  - "ws"         FlyingSquid-style weak supervision
      *                 (Combiners.wsCombine)
      *  - "pick_value" LLM chooses among disagreeing candidates
      *                 (pickValueCombine; unanimous rows skip the LLM)
      */
    combiner: String = "mv",
    /** Abstention threshold on the sample-gold extraction fraction
      * (`--extraction_fraction_thresh`, `configs.py:167-172`, default
      * 0.9; the 0.8 function-level default at `profiler.py:123` /
      * `evaluate_profiler.py:86` is always overridden by this CLI arg
      * via `profiler.py:636,684`, so 0.9 is the effective default). */
    extractionFractionThresh: Double = 0.9,
    /** Driver threads running per-attribute cascades concurrently.
      * The reference's loop (`run_profiler.py:420-441`) is serial —
      * attribute i+1 idles behind attribute i's lake pass; with
      * concurrent job submission (+ FAIR scheduling, Sessions.local)
      * attribute i+1's sample/LLM work fills the cluster while i's
      * APPLY shuffle drains. 1 restores the serial order. */
    attrParallelism: Int = 8,
    /** Wall-clock bound per attribute cascade in the parallel path: a
      * wedged LLM call (custom client with no read timeout) fails
      * that attribute instead of stalling the whole run. */
    attrTimeoutSec: Long = 600,
    /** Consecutive LLM-error bail per attribute
      * (`profiler.py:474-477`: >10 consecutive errors abandon the
      * attribute, remaining prompts unasked). */
    maxConsecutiveLlmErrors: Int = 10,
    /** Direct-extraction prompt template (`prompts.py:33-127`): one of
      * "zero_shot" (default — the bare slot shape, byte-identical to
      * pre-variant behavior), "few_shot", "extra", "context"
      * ([[graft.extract.Prompts.DirectVariant]]). Applies wherever the
      * profiler prompts direct extraction: gold-on-sample and the
      * retrieval-augmented Direct path. */
    directPromptVariant: String = "zero_shot"
)

object Profiler {
  /** Prompts per LlmClient.complete call inside executor-side
    * mapPartitions stages (llmMap, pickValueCombine, DirectExtract).
    * Bounds per-task buffering to batch size — a whole-partition
    * buffer grows with partition size, which at 100 TB is unbounded —
    * while keeping calls multi-prompt for clients that batch/pipeline
    * HTTP requests. 64 amortizes connection reuse and stays far under
    * any provider's request-size ceiling at ~3 KB/prompt.
    */
  val LlmBatchSize: Int = 64

  /** Train-size ablation — the reference's main experiment loop
    * (`run_profiler.py:441-490`: sweep `profiler_args.train_sizes`,
    * re-run the cascade per size, score vs gold, pickle
    * `results_by_train_size` with per-size token totals and file
    * counts). One ClosedIE cascade per requested trainSize over the
    * SAME lake/attributes, each with its own token ledger; the wide
    * view melts back to (path, attribute, pred) and scores against
    * the gold relation by token-F1 (`evaluate_synthetic.py:196-225`).
    *
    * Scale shape: the sweep multiplies only the SAMPLE-side work —
    * each run's LLM cost is ∝ its trainSize (the quality-vs-cost
    * trade the experiment exists to measure) — while each whole-lake
    * APPLY stays one token-free scan; the scoring join broadcasts the
    * human-labeled gold table.
    *
    * lake: (path, content); gold: (path, attribute, gold). Returns
    * one row per size: (train_size, avg_f1, med_f1, n_sample_files,
    * n_total_files, total_tokens, llm_calls) — the
    * `results_by_train_size` relation, ready for any sink.
    */
  def trainSizeAblation(
      spark: SparkSession,
      client: LlmClient,
      baseCfg: ProfilerConfig,
      lake: DataFrame,
      attributes: Seq[String],
      gold: DataFrame,
      trainSizes: Seq[Int]): DataFrame = {
    require(trainSizes.nonEmpty && trainSizes.forall(_ > 0), "trainSizes must be positive")
    require(attributes.nonEmpty, "trainSizeAblation needs an attribute list (ClosedIE eval)")
    val nTotal = lake.select(col("path")).distinct().count()
    val stackExpr = attributes
      .map(a => s"'${a.replace("'", "''")}', `${a.replace("`", "``")}`")
      .mkString(", ")
    val rows = trainSizes.map { ts =>
      val ledger = new TokenLedger(spark.sparkContext)
      val prof   = new Profiler(spark, client, baseCfg.copy(trainSize = ts), Some(ledger))
      val view   = prof.run(lake, attributes)
      val long = view.selectExpr(
        "path",
        s"stack(${attributes.size}, $stackExpr) as (attribute, pred)")
      val scored = long
        .join(broadcast(gold), Seq("path", "attribute"))
        .select(
          lit(1).as("grp"),
          coalesce(col("pred"), lit("")).as("pred"),
          coalesce(col("gold"), lit("")).as("gold"))
      val m = graft.score.Score
        .f1Metrics(scored, Seq("grp"))
        .select(col("avg_f1"), col("med_f1"))
        .head()
      (ts, m.getDouble(0), m.getDouble(1), math.min(ts.toLong, nTotal), nTotal,
        ledger.totalTokens, ledger.totalCalls)
    }
    import spark.implicits._
    rows.toDF(
      "train_size", "avg_f1", "med_f1", "n_sample_files", "n_total_files",
      "total_tokens", "llm_calls")
  }

  /** The reference's composed eval entry (`evaluate_synthetic.main`,
    * `evaluate_synthetic.py:504-555`): schema-id eval@k + ClosedIE
    * token-F1 + OpenIE set-P/R/F1 with lenient attribute aliasing
    * (`evaluate_synthetic.py:349-431`) and head/tail/structured
    * slices (`determine_attribute_slices`), over ONE run's artifacts,
    * as ONE long metrics relation — what a user reproducing the
    * paper's tables previously hand-wired from five calls.
    *
    * Inputs are the run artifacts:
    *   - rankedAttrs: (field, rank) — the schema-id ranking
    *   - pred: (path, attribute, value) — the run's long extractions
    *   - gold: (path, attribute, value) — the human gold table
    *
    * Semantics mirrored from the reference: gold cells with no
    * prediction score as abstains (empty pred); pred attributes map
    * onto gold names via the alias theta-join (exact / +s / -s /
    * space-stripped) before any comparison; OpenIE slices come from
    * the GOLD table's coverage and value-length profile
    * ([[graft.eval.Harness.attrSlices]]) and each slice compares
    * distinct lower(trim(value)) triples (clean_comparison's
    * documented simplification — the pipeline's value cleaner already
    * ran upstream in real artifacts).
    *
    * Scale shape: gold is human-labeled (broadcast everywhere); the
    * only corpus-proportional relation is pred (extraction-sized),
    * persisted once; all five OpenIE slices are scored by ONE
    * slice-tagged full-outer aggregation (not an action per slice),
    * and every output is metrics-sized. Output: (stage, slice,
    * metric, value) rounded 6dp, ordered — ready for the
    * results-sink.
    */
  def evaluateEndToEnd(
      rankedAttrs: DataFrame,
      pred: DataFrame,
      gold: DataFrame,
      ks: Seq[Int] = Seq(1, 3, 5)): DataFrame = {
    val spark = pred.sparkSession
    import spark.implicits._
    require(ks.nonEmpty, "evaluateEndToEnd needs at least one k")
    // NOT persisted, by measurement (r18): gold feeds five
    // differently-keyed consumers and pred two, so persisting both
    // looked like the r17 graph-family pattern — but the duplicated
    // subtrees here are scan+project UNIONS with no exchange below
    // the consumer (q_eval_e2e derives both from the documents scan
    // with row-level expressions only). Re-running a pipelined
    // narrow derivation 5× is CHEAPER than one doc-sized cache write
    // + 5 cache reads: interleaved min-of-3 A/B read persisted 6.90 s
    // vs unpersisted 4.39 s at sf0.1. The r17 rule refined: read the
    // duplicate through the exchange — and when the duplicate
    // contains NO exchange at all, leave it pipelined.
    val goldC = gold
    val predC = pred
    val goldAttrs = goldC.select(col("attribute")).distinct()
    val schemaRows = SchemaId
      .schemaEvalAtK(rankedAttrs, goldAttrs.select(col("attribute").as("field")), ks)
      .selectExpr("k", "stack(3, 'precision', precision, 'recall', recall, 'f1', f1) as (metric, value)")
      .select(
        lit("schema_id").as("stage"),
        concat(lit("k="), col("k")).as("slice"),
        col("metric"), col("value"))
    // lenient attribute aliasing with the reference's exact-name-wins
    // resolution (evaluate_synthetic.py resolves each gold attribute
    // to a SINGLE pred name): a pred attribute whose name IS a gold
    // attribute claims it outright, and claimed names leave the alias
    // pool on BOTH sides — so when pred holds both 'topic' and
    // 'topics' against gold 'topic', the alias keeps its own name and
    // its triples score as precision-only misses instead of inflating
    // OpenIE overlap. Unmatched pred attributes likewise keep their
    // own name (and then simply miss gold on the join). Two surviving
    // aliases may still land on one gold name (distinct-triple union;
    // the ClosedIE cell is deduped below) — documented divergence,
    // the reference never produces that shape. SECOND documented
    // divergence (r13 ADVICE): the pred-side left_anti below also
    // retires an exactly-claimed PRED name from the alias pool,
    // which is STRICTER than the reference — there, gold 'topics' can
    // still resolve to pred 'topic' via strip('s') even though gold
    // 'topic' already claimed it exactly (one pred name serving two
    // gold attributes). We keep one-pred-one-gold: the second gold
    // attribute goes unmatched (recall miss) instead of double-
    // counting the same pred rows under two gold names.
    val predAttrs = predC.select(col("attribute").as("attr_a")).distinct()
    val exactA    = predAttrs.join(
      goldAttrs.select(col("attribute").as("attr_a")), Seq("attr_a"), "left_semi")
    val aliasMap = SchemaId
      .attrAliasJoin(
        predAttrs.join(exactA, Seq("attr_a"), "left_anti"),
        goldAttrs.select(col("attribute").as("attr_b"))
          .join(exactA.select(col("attr_a").as("attr_b")), Seq("attr_b"), "left_anti"))
      .groupBy(col("attr_a"))
      .agg(min(col("attr_b")).as("gold_attr")) // deterministic when several gold names alias
    val mapped = predC
      .join(broadcast(aliasMap), predC("attribute") === aliasMap("attr_a"), "left")
      .select(col("path"), coalesce(col("gold_attr"), predC("attribute")).as("attribute"), col("value"))
      .persist()
    // stage 2: ClosedIE token-F1 over every gold cell (missing pred =
    // abstain). EXACTLY ONE pred scores per gold cell — aliasing can
    // legitimately land several pred rows on one (path, attribute)
    // (e.g. 'topic' and 'topics' both mapping to gold 'topic'), and
    // an un-deduped left join would fan the gold cell out N×,
    // multiply-weighting it in avg/median F1. Deterministic pick:
    // lexicographically smallest value.
    val onePred = mapped
      .groupBy(col("path"), col("attribute"))
      .agg(min(col("value")).as("pred"))
    val cells = goldC
      .select(col("path"), col("attribute"), col("value").as("gold"))
      .join(onePred, Seq("path", "attribute"), "left")
      .select(lit(1).as("grp"), coalesce(col("pred"), lit("")).as("pred"), col("gold"))
    val extractionRows = Score
      .f1Metrics(cells, Seq("grp"))
      .selectExpr(
        "stack(3, 'avg_f1', avg_f1, 'med_f1', med_f1, 'extraction_fraction', extraction_fraction) as (metric, value)")
      .select(lit("extraction").as("stage"), lit("all").as("slice"), col("metric"), col("value"))
    // stage 3: OpenIE set-P/R/F1 per gold-derived attribute slice —
    // ONE relational aggregation for all five slices (the per-slice
    // setPrf-action form re-scanned the inputs 5×; this is also the
    // exact shape the DuckDB oracle replays). Reference skip rule
    // (evaluate_synthetic.py:395-398): a pred attribute belonging to
    // a DIFFERENT slice is skipped, but an attribute outside the
    // gold schema entirely stays in pred_set for EVERY slice —
    // hallucinated attributes hurt precision everywhere (an empty
    // slice then reads P = 0/np = 0, R = 0, F1 = 0, identical to a
    // short-circuit).
    val totalDocs = goldC.select(col("path")).distinct().count()
    val sl = graft.eval.Harness
      .attrSlices(goldC, totalDocs)
      .select(col("attribute"), col("head_attr"), col("structured"))
    val smem = sl.select(lit("all").as("sname"), col("attribute"))
      .unionByName(sl.filter(col("head_attr")).select(lit("head").as("sname"), col("attribute")))
      .unionByName(sl.filter(!col("head_attr")).select(lit("tail").as("sname"), col("attribute")))
      .unionByName(sl.filter(col("structured")).select(lit("structured").as("sname"), col("attribute")))
      .unionByName(sl.filter(!col("structured")).select(lit("unstructured").as("sname"), col("attribute")))
    val snames = Seq("all", "head", "tail", "structured", "unstructured").toDF("sname")
    def cleanTriples(df: DataFrame): DataFrame =
      df.select(col("path"), col("attribute"), lower(trim(col("value"))).as("value"))
        .filter(col("value").isNotNull && length(col("value")) > 0)
    val pTrip = cleanTriples(mapped)
    val gTrip = cleanTriples(goldC)
    // "outside the gold schema" means: not in any SLICE — a gold
    // attribute whose values are ALL empty never enters attrSlices,
    // and preds against it must still penalize precision everywhere
    // rather than silently vanish from the comparison
    val slicedAttrs = sl.select(col("attribute"))
    val pTagged = pTrip
      .join(broadcast(smem), Seq("attribute"))
      .unionByName(
        pTrip
          .join(broadcast(slicedAttrs), Seq("attribute"), "left_anti")
          .crossJoin(broadcast(snames)))
      .select(col("sname"), col("path"), col("attribute"), col("value"))
      .distinct()
      .withColumn("in_p", lit(1))
    val gTagged = gTrip
      .join(broadcast(smem), Seq("attribute"))
      .select(col("sname"), col("path"), col("attribute"), col("value"))
      .distinct()
      .withColumn("in_g", lit(1))
    val prf = pTagged
      .join(gTagged, Seq("sname", "path", "attribute", "value"), "full_outer")
      .groupBy(col("sname"))
      .agg(
        sum(coalesce(col("in_p"), lit(0))).cast("double").as("np"),
        sum(coalesce(col("in_g"), lit(0))).cast("double").as("ng"),
        sum(coalesce(col("in_p"), lit(0)) * coalesce(col("in_g"), lit(0))).cast("double").as("ni"))
    val prfFull = broadcast(snames)
      .join(prf, Seq("sname"), "left")
      .select(
        col("sname").as("slice"),
        when(coalesce(col("np"), lit(0.0)) > 0.0, col("ni") / col("np")).otherwise(0.0).as("precision"),
        when(coalesce(col("ng"), lit(0.0)) > 0.0, col("ni") / col("ng")).otherwise(0.0).as("recall"))
      .withColumn(
        "f1",
        when(col("precision") + col("recall") > 0.0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
          .otherwise(0.0))
    val openieRows = prfFull
      .selectExpr("slice", "stack(3, 'precision', precision, 'recall', recall, 'f1', f1) as (metric, value)")
      .select(lit("openie").as("stage"), col("slice"), col("metric"), col("value"))
    // `mapped` stays persisted while the returned relation is
    // unconsumed (the extraction leg reads it lazily) — the same
    // evictable caller-may-unpersist convention as the CC label cache
    schemaRows
      .unionByName(extractionRows)
      .unionByName(openieRows)
      .select(col("stage"), col("slice"), col("metric"), round(col("value"), 6).as("value"))
      .orderBy(col("stage"), col("slice"), col("metric"))
  }
}

class Profiler(
    spark: SparkSession,
    client: LlmClient,
    cfg: ProfilerConfig = ProfilerConfig(),
    /** Optional per-stage LLM token ledger (`main.py:25-26,97-98`,
      * `run_profiler.py:477-488`): when given, every LLM stage bills
      * its prompts/completions to a named accumulator set and
      * `ledger.report(spark)` yields the cost relation. The whole-lake
      * APPLY registers itself with ZERO calls — the cascade's
      * economics (tokens ∝ trainSize, not lake size) as a checked row.
      */
    ledger: Option[TokenLedger] = None) {

  /** The stage's accounting wrapper around the profiler's client (or
    * around `cl`, letting two stages share one bail counter while
    * billing apart). Identity when no ledger is installed.
    */
  private def stageClient(stage: String, cl: LlmClient = client): LlmClient =
    ledger.map(_.wrap(cl, stage)).getOrElse(cl)

  /** D2 → D3: chunk the lake, dispatching on format
    * (`profiler_utils.py:200-214`): html/xhtml paths go through the
    * tag-aware html chunker, everything else through the text packer.
    * lake: (path, content).
    */
  def prepare(lake: DataFrame): DataFrame =
    Chunker.chunkAuto(lake, "path", "path", "content", cfg.chunkSize)

  /** Deterministic train sample: first n docs by md5(path) — stable
    * across runs and engines, no RNG (replaces seeded random.sample,
    * `profiler_utils.py:185-196`).
    */
  def sampleDocs(chunks: DataFrame, n: Int): DataFrame = {
    val keys = chunks
      .select(col("path")).distinct()
      .orderBy(md5(col("path").cast("binary")), col("path"))
      .limit(n)
    chunks.join(broadcast(keys), Seq("path"), "left_semi")
  }

  /** OpenIE schema identification (`schema_identification.py:14-87`):
    * LLM proposes "field: value" lines per sample chunk, fields kept
    * only if literally present (ChunkFilter.schemaFieldFilter), then
    * frequency-ranked.
    */
  def identifySchema(sampleChunks: DataFrame): DataFrame = {
    val proposed = llmMap(sampleChunks, c => Prompts.schemaId(c), stageClient("schema_id"))
      .withColumn("line", explode(split(col("completion"), "\n")))
      .withColumn("field", lower(trim(regexp_extract(col("line"), "^([^:]{1,60}):", 1))))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]{1,60}:(.*)$", 1)))
      .filter(length(col("field")) > 0)
    val kept = ChunkFilter.schemaFieldFilter(proposed.select(col("path"), col("chunk"), col("field"), col("value")))
    SchemaId.rankAttributes(
      SchemaId.fieldCount(kept.select(col("path"), col("field")), "path"),
      cfg.numAttrs)
  }

  /** LLM rerank of the identified schema
    * (`rerank`/`rerank_metadata`, `schema_identification.py:131-230`):
    * 3 prompt rounds over the ranked candidates, +2 votes per
    * mention, merged with the counts via SchemaId.rerankMerge and
    * re-ranked on the merged score.
    */
  def rerankSchema(ranked: DataFrame): DataFrame = {
    // ONE materialization of the ranked schema: the merge input below
    // is rebuilt from these rows — referencing the lazy `ranked` a
    // second time would RE-EXECUTE its lineage, and that lineage
    // contains the schema-id LLM stage (every sample prompt asked
    // twice; the token ledger exposed the double-bill)
    val rankedRows = ranked.orderBy(col("rank")).collect()
    val fields     = rankedRows.map(_.getAs[String]("field")).toSeq
    if (fields.isEmpty)
      // empty-schema path: hand back an EMPTY LOCAL frame, not the
      // lazy `ranked` — the caller's collect would re-execute its
      // schema-id LLM lineage (same double-bill as below)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ranked.schema)
    // an erroring client degrades to the frequency ranking (zero
    // mentions) instead of failing schema identification outright
    val mentions = scala.util.Try {
      stageClient("schema_rerank")
        .complete((0 until 3).iterator.map(r => Prompts.rerankFields(fields, r)))
        .flatMap(_.split("\n"))
        .map(_.trim.toLowerCase)
        .filter(_.nonEmpty)
        .toSeq
    }.getOrElse(Seq.empty)
    import spark.implicits._
    val votes = mentions
      .groupBy(identity)
      .map { case (f, xs) => (f, 2L * xs.size) }
      .toSeq
      .toDF("field", "votes")
    val rankedLocal = rankedRows.toSeq
      .map(r => (r.getAs[String]("field"), r.getAs[Long]("n_docs")))
      .toDF("field", "n_docs")
    val merged = SchemaId.rerankMerge(rankedLocal, votes)
    SchemaId.rankAttributes(merged, cfg.numAttrs, scoreCol = "merged")
  }

  /** Synthesize extractor specs for an attribute from sample chunks
    * (`get_functions`, `profiler.py:354-410`) — the LLM answers with
    * a spec JSON; unparsable answers are dropped (the reference
    * similarly drops functions that fail to exec).
    */
  def synthesizeSpecs(
      attribute: String,
      sampleChunks: DataFrame,
      cl: LlmClient = client): Seq[ExtractorSpec] =
    synthesizeSpecsFrom(attribute, synthesisChunks(sampleChunks), cl)

  /** The deterministic synthesis context: 4 sample chunks in
    * content-hash order (an unordered limit is partition-layout
    * dependent), like sampleDocs. ATTRIBUTE-INDEPENDENT — the same 4
    * chunks seed every attribute's synthesis prompts — so the
    * per-attribute fan-out ([[profileAttributesChecked]]) collects
    * them ONCE and shares the result: one Spark job instead of one
    * per attribute (r18, guide §5: the driver should not repeat
    * identical collects).
    */
  private[graft] def synthesisChunks(sampleChunks: DataFrame): Seq[String] =
    sampleChunks
      .orderBy(md5(col("path").cast("binary")), col("path"), col("chunk_id"))
      .limit(4) // specs per sample chunk ×2 prompt variants, like train_size×2
      .collect()
      .map(_.getAs[String]("chunk"))
      .toSeq

  /** [[synthesizeSpecs]] over a pre-collected synthesis context —
    * identical prompts, zero Spark actions.
    */
  private[graft] def synthesizeSpecsFrom(
      attribute: String,
      chunks: Seq[String],
      cl: LlmClient): Seq[ExtractorSpec] = {
    val prompts = chunks
      .flatMap(c => Seq(Prompts.synthesizeSpecA(attribute, c), Prompts.synthesizeSpecB(attribute)))
    cl
      .complete(prompts.iterator)
      .flatMap { js =>
        try Some(ExtractorSpec.fromJson(js))
        catch {
          case _: Throwable =>
            // unparsable synthesis → bounded-eval fallback, so it
            // degrades like the reference's exec path instead of
            // vanishing (profiler.py:293-335); blank answers drop
            val body = js.trim
            if (body.isEmpty) None else Some(OpaqueEval("opaque", body))
        }
      }
      .toSeq
      .distinct
      .zipWithIndex
      .map { case (s, i) => renameSpec(s, s"function_$i") }
  }

  private def renameSpec(s: ExtractorSpec, k: String): ExtractorSpec = s match {
    case r: RegexExtract    => r.copy(key = k)
    case r: SplitMarker     => r.copy(key = k)
    case r: FieldLine       => r.copy(key = k)
    case r: HtmlSelector    => r.copy(key = k)
    case r: OpaqueEval      => r.copy(key = k)
    case r: CallableExtract => r.copy(key = k)
  }

  /** LLM "gold" on the sample via direct extraction (the expensive
    * supervision source, `get_all_extractions` `profiler.py:539-596`).
    */
  def goldOnSample(attribute: String, sampleChunks: DataFrame, cl: LlmClient = client): DataFrame = {
    val filtered = keywordFiltered(sampleChunks, attribute)
    DirectExtract(
      filtered.select(col("path"), col("attribute"), col("chunk")),
      cl, "path", "gold_llm", directVariant)
      .withColumn("value", Clean.cleanPrediction(col("value"), col("attribute")))
      .groupBy(col("path"))
      .agg(max(col("value")).as("gold"))
  }

  private def directVariant: Prompts.DirectVariant =
    Prompts.DirectVariant.fromName(cfg.directPromptVariant)

  /** Retrieval-augmented Evaporate-Direct — the reference's demo-path
    * composition (`main.py:52-99` with `use_retrieval_model=True` +
    * `get_most_similarity`, `retrieval.py:31-36`): per attribute, a
    * baseline sentence "attribute: seed-gold-value" is embedded, the
    * MOST SIMILAR chunk of each file is retrieved by embedding cosine,
    * and ONLY that chunk is prompted — one LLM call per (file,
    * attribute) instead of one per (chunk, attribute).
    *
    * Scale shape (where this departs from the reference's loop, which
    * re-runs the contriever forward pass over every file's chunks once
    * PER attribute): the corpus embeds ONCE ([[Encode.embed]],
    * shuffle-free mapPartitions); each attribute contributes one
    * per-row cosine expression against its broadcast query literal
    * (the chunk vector and its self-dot are bound columns, so k
    * attributes cost k fused dot products per row, not k re-embeds);
    * the per-(file, attribute) argmax is ONE hash aggregation via
    * `max_by` over (cos, −chunk_id) — no window sort, deterministic
    * tie-break (highest cosine, then lowest chunk_id, matching
    * argmax-first-wins); the LLM stage then reads the doc-count-sized
    * winners relation. Embedding-side text is lowercased (query too) —
    * pure normalization for the encoder; the PROMPT always receives
    * the raw chunk.
    *
    * chunks: (path, chunk_id, chunk); attrSeeds: (attribute, seed gold
    * value) — the reference's `gold[attribute]`. Returns the long
    * relation (path, attribute, value), '' = abstain; pivot with
    * [[graft.combine.StructuredView.pivotView]] for the wide table.
    */
  def directExtractRetrieval(
      chunks: DataFrame,
      attrSeeds: Seq[(String, String)],
      encoder: EncoderClient): DataFrame = {
    require(attrSeeds.nonEmpty, "directExtractRetrieval needs (attribute, seed) pairs")
    import graft.expressions.DotProduct.dotD
    val embedded = Encode
      .embed(chunks.withColumn("emb_text", lower(col("chunk"))), "emb_text", encoder, "emb_vec")
      .withColumn("v", transform(col("emb_vec"), x => x.cast("double")))
      .withColumn("vv", dotD(col("v"), col("v")))
    val queries = attrSeeds.map { case (a, seed) =>
      val q  = encoder.encode(Iterator.single(s"$a: $seed".toLowerCase)).next().map(_.toDouble).toSeq
      val qn = math.sqrt(q.map(x => x * x).sum)
      (a, q, qn)
    }
    val scored = embedded.select(
      col("path"), col("chunk_id"), col("chunk"),
      explode(array(queries.map { case (a, q, qn) =>
        val cos =
          if (qn == 0.0) lit(0.0)
          else
            when(col("vv") === 0.0, 0.0)
              .otherwise(dotD(col("v"), typedLit(q)) / (sqrt(col("vv")) * qn))
        struct(lit(a).as("attribute"), round(cos, 6).as("cos"))
      }: _*)).as("aq"))
      .select(
        col("path"), col("chunk_id"), col("chunk"),
        col("aq.attribute").as("attribute"), col("aq.cos").as("cos"))
    val best = scored
      .groupBy(col("path"), col("attribute"))
      .agg(max_by(col("chunk"), struct(col("cos"), (-col("chunk_id")).as("ord"))).as("chunk"))
    DirectExtract(
      best.select(col("path"), col("attribute"), col("chunk")),
      stageClient("direct_retrieval"),
      "path", "direct_retrieval", directVariant)
      .select(
        col("path"), col("attribute"),
        Clean.cleanPrediction(col("value"), col("attribute")).as("value"))
  }

  private def keywordFiltered(chunks: DataFrame, attribute: String): DataFrame = {
    val attrs = spark.createDataFrame(Seq(Tuple1(attribute))).toDF("attribute")
    ChunkFilter.keywordChunkFilter(chunks, attrs, "path")
  }

  /** Run specs over chunks → long extraction relation
    * (path, extractor, value); one value per (doc, extractor) — the
    * lexicographically greatest hit across chunks (deterministic
    * regardless of chunk partitioning; empty string = abstain).
    *
    * API note: when one document yields MULTIPLE distinct hits for a
    * spec, this keeps the lexicographic max, where the reference
    * keeps the first-seen hit (Python dict insertion order). Both
    * pick one representative; ours is partition-order-independent —
    * the property a distributed engine must have — and the vote
    * combiners downstream are agnostic to which representative wins.
    *
    * ONE lake scan and ONE shuffle for ALL specs: each chunk row
    * evaluates every spec in place (per-chunk max hit, '' = no hit),
    * posexplode turns that into (path, spec_idx, value) rows, and a
    * single groupBy(path, spec_idx) folds chunks. The APPLY stage is
    * the only stage that touches the whole lake — the previous
    * spec-at-a-time union cost k scans + k shuffles for top-k specs.
    * max distributes, so max over chunks of per-chunk maxima equals
    * the old max over all exploded hits, byte for byte.
    */
  def applySpecs(chunks: DataFrame, specs: Seq[ExtractorSpec]): DataFrame = {
    require(specs.nonEmpty, "applySpecs needs at least one spec")
    val keys = array(specs.map(s => lit(s.key)): _*)
    chunks
      .select(
        col("path"),
        posexplode(array(specs.map(s =>
          coalesce(array_max(s.compile(col("chunk"))), lit(""))): _*)).as(Seq("pos", "value")))
      .groupBy(col("path"), col("pos"))
      .agg(max(col("value")).as("value"))
      .select(col("path"), element_at(keys, col("pos") + 1).as("extractor"), col("value"))
  }

  /** ONE lake pass for EVERY attribute's selected specs — the
    * k-invariance applySpecs gives within an attribute, extended
    * across attributes: a 35-attribute OpenIE run costs ONE scan of
    * the 100 TB lake, not 35. The combined keyword filter (one
    * broadcast cross join + one (doc, attribute) window) reproduces
    * the per-attribute filter exactly — scoring and capping are
    * independent per attribute — and each chunk×attribute row
    * evaluates ONLY that attribute's specs: the `when` gates compile
    * to lazy codegen branches, so other attributes' specs cost
    * nothing on the row.
    *
    * Output: (path, attribute, extractor, value), '' = abstain, one
    * row per (doc, attribute-spec) with a surviving candidate chunk —
    * byte-identical to running [[applySpecs]] per attribute over
    * [[graft.lake.ChunkFilter.keywordChunkFilter]].
    */
  def applySpecsAll(chunks: DataFrame, specsByAttr: Seq[(String, Seq[ExtractorSpec])]): DataFrame = {
    require(specsByAttr.nonEmpty && specsByAttr.forall(_._2.nonEmpty), "applySpecsAll needs specs per attribute")
    val attrsDf  = spark.createDataFrame(specsByAttr.map(p => Tuple1(p._1))).toDF("attribute")
    val filtered = ChunkFilter.keywordChunkFilter(chunks, attrsDf, "path")
    val indexed  = specsByAttr.flatMap { case (a, specs) => specs.map(s => (a, s)) }
    val keys     = array(indexed.map { case (_, s) => lit(s.key) }: _*)
    val attrs    = array(indexed.map { case (a, _) => lit(a) }: _*)
    filtered
      .select(
        col("path"),
        posexplode(array(indexed.map { case (a, s) =>
          when(col("attribute") === a, coalesce(array_max(s.compile(col("chunk"))), lit("")))
            .otherwise(lit(null))
        }: _*)).as(Seq("pos", "value")))
      .filter(col("value").isNotNull)
      .groupBy(col("path"), col("pos"))
      .agg(max(col("value")).as("value"))
      .select(
        col("path"),
        element_at(attrs, col("pos") + 1).as("attribute"),
        element_at(keys, col("pos") + 1).as("extractor"),
        col("value"))
  }

  /** Score specs against the sample gold and keep the top-k
    * (`evaluate` + `get_topk_scripts_per_field`). Also returns the
    * sample-gold extraction fraction — `combine_extractions`
    * (`profiler.py:126-131`) reads it off the metrics and uses it to
    * decide whether abstains are dropped before the lake-wide vote.
    */
  def selectSpecs(
      attribute: String,
      specs: Seq[ExtractorSpec],
      sampleChunks: DataFrame,
      gold: DataFrame,
      doEndToEnd: Boolean): (Seq[ExtractorSpec], Double) = {
    if (specs.isEmpty) return (Seq.empty, 0.0)
    val preds = applySpecs(keywordFiltered(sampleChunks, attribute), specs)
    val scored = preds
      .join(gold, Seq("path"))
      .select(col("extractor"), col("value").as("pred"), col("gold"))
    val metricRows = Score
      .f1Metrics(
        scored,
        Seq("extractor"),
        useAbstention = true,
        extractionFractionThresh = cfg.extractionFractionThresh)
      .select(col("extractor"), col("avg_f1"), col("med_f1"), col("extraction_fraction"))
      .collect()
    // gold-measured, so identical on every row (reference grabs the first)
    val frac = metricRows.headOption.map(_.getAs[Double]("extraction_fraction")).getOrElse(0.0)
    import spark.implicits._
    val metrics = metricRows.toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toDF("extractor", "avg_f1", "med_f1")
    val keep = Score
      .topkScripts(metrics, cfg.numTopK, goldKey = "gold_llm", keepThresh = cfg.keepThresh, doEndToEnd = doEndToEnd)
      .collect()
      .map(_.getString(0))
      .toSet
    (specs.filter(s => keep.contains(s.key)), frac)
  }

  /** Sample-side half of one attribute's cascade: synthesis → gold →
    * scoring/top-k. Returns (selected specs, sample-gold extraction
    * fraction). The expensive lake pass is NOT here — callers batch
    * it ([[applySpecsAll]]) or run it per attribute
    * ([[profileAttribute]]).
    */
  def selectSpecsForAttribute(
      sampleChunks: DataFrame,
      attribute: String,
      doEndToEnd: Boolean): (Seq[ExtractorSpec], Double) =
    selectSpecsForAttribute(sampleChunks, attribute, doEndToEnd, preChunks = None)

  /** [[selectSpecsForAttribute]] with an optional pre-collected
    * synthesis context ([[synthesisChunks]]) so the parallel fan-out
    * pays the sample collect once, not once per attribute.
    */
  private[graft] def selectSpecsForAttribute(
      sampleChunks: DataFrame,
      attribute: String,
      doEndToEnd: Boolean,
      preChunks: Option[Seq[String]]): (Seq[ExtractorSpec], Double) = {
    // per-attribute error scope: the bail counter lives and dies with
    // this cascade, matching the reference's per-attribute loop.
    // Token accounting wraps OUTSIDE the bail client: synthesis and
    // gold bill to separate stages (`token_used["get_extract_
    // functions"]` vs the direct-extract gold, `main.py:103-135`)
    // while sharing the one per-attribute failure counter.
    val cl    = new BailingLlmClient(client, cfg.maxConsecutiveLlmErrors)
    val specs = preChunks match {
      case Some(cs) => synthesizeSpecsFrom(attribute, cs, stageClient("synthesis", cl))
      case None     => synthesizeSpecs(attribute, sampleChunks, stageClient("synthesis", cl))
    }
    val gold  = goldOnSample(attribute, sampleChunks, stageClient("gold_sample", cl))
    selectSpecs(attribute, specs, sampleChunks, gold, doEndToEnd)
  }

  /** Full per-attribute cascade over the lake. Returns the long
    * extraction relation (path, attribute, value).
    */
  def profileAttribute(
      chunks: DataFrame,
      sampleChunks: DataFrame,
      attribute: String,
      doEndToEnd: Boolean): DataFrame = {
    val (selected, frac) = selectSpecsForAttribute(sampleChunks, attribute, doEndToEnd)
    if (selected.isEmpty) {
      emptyExtractions
    } else {
      val votes = applySpecs(keywordFiltered(chunks, attribute), selected)
        .withColumn("value", Clean.cleanPrediction(col("value"), lit(attribute)))
      combineVotes(votes, attribute, frac)
        .select(col("path"), lit(attribute).as("attribute"), col("value"))
    }
  }

  /** All attribute cascades in two phases: sample-side selection
    * (synthesis, gold, scoring) runs `cfg.attrParallelism` attributes
    * at a time on a driver thread pool — Spark schedules concurrent
    * jobs from separate threads, FAIR mode (Sessions.local) keeps
    * them from head-of-line blocking — then the whole-lake APPLY runs
    * as ONE combined scan for every selected attribute
    * ([[applySpecsAll]], mv/top_k combiners) or per attribute
    * (ws/pick_value). Result order is attrsAll order regardless of
    * completion order, so the output is deterministic.
    */
  def profileAttributes(
      chunks: DataFrame,
      sampleChunks: DataFrame,
      attrsAll: Seq[String],
      doEndToEnd: Boolean): DataFrame =
    profileAttributesChecked(chunks, sampleChunks, attrsAll, doEndToEnd)._1

  /** [[profileAttributes]] with the failure report: the second member
    * lists attributes whose cascade failed or timed out — each is
    * excluded from the result (contributes no extractions) instead of
    * sinking the run, the reference's per-attribute bail
    * (`profiler.py:474-477`). A cascade gets `cfg.attrTimeoutSec`
    * of wall clock once its await begins (earlier awaits overlap its
    * computation, so the bound is per-attribute, not cumulative); on
    * timeout its running Spark jobs are cancelled through the
    * attribute's job group and its worker thread is interrupted
    * (Future.cancel(true)), reclaiming the pool slot for queued
    * attributes. Applies at every attrParallelism, including 1.
    */
  def profileAttributesChecked(
      chunks: DataFrame,
      sampleChunks: DataFrame,
      attrsAll: Seq[String],
      doEndToEnd: Boolean): (DataFrame, Seq[String]) = {
    import java.util.concurrent.{Callable, TimeoutException, TimeUnit}
    import scala.util.{Failure, Try}
    // PHASE 1 — sample-side selection per attribute (synthesis, gold,
    // scoring), parallel + bounded. One code path for serial and
    // parallel: par == 1 is just a single-thread pool, so the
    // per-attribute timeout protects the serial configuration too (a
    // wedged client must never hang the run).
    val par = math.max(1, math.min(cfg.attrParallelism, attrsAll.size))
    // the synthesis context is attribute-independent — collect it ONCE
    // here instead of once per pooled cascade (r18: N−1 fewer sample
    // jobs; at attrParallelism they serialized on the scheduler floor).
    // A failure of this shared collect falls back to the per-attribute
    // path so an infrastructure hiccup degrades exactly as before.
    val sharedChunks: Option[Seq[String]] =
      scala.util.Try(synthesisChunks(sampleChunks)).toOption
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      par,
      (r: Runnable) => { val t = new Thread(r, "graft-attr"); t.setDaemon(true); t })
    val selections: Seq[(String, Try[(Seq[ExtractorSpec], Double)])] =
      try {
        val futs = attrsAll.zipWithIndex.map { case (a, i) =>
          pool.submit(new Callable[(Seq[ExtractorSpec], Double)] {
            def call(): (Seq[ExtractorSpec], Double) = {
              // FAIR mode schedules fairly ACROSS pools, while jobs
              // inside one pool (including 'default') queue FIFO — so
              // each attribute's jobs get their own pool, created on
              // demand by name; without this the FAIR config is inert
              spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"graft-attr-${i % par}")
              spark.sparkContext.setJobGroup(s"graft-attr-$a", s"profile attribute $a", interruptOnCancel = true)
              try selectSpecsForAttribute(sampleChunks, a, doEndToEnd, sharedChunks)
              finally {
                spark.sparkContext.clearJobGroup()
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
              }
            }
          })
        }
        attrsAll.zip(futs).map { case (a, fut) =>
          a -> (Try(fut.get(cfg.attrTimeoutSec, TimeUnit.SECONDS)) match {
            case Failure(_: TimeoutException) =>
              // cancel(true) interrupts the worker thread, so the pool
              // slot is RECLAIMED for queued attributes (a wedged
              // client costs one attribute, not every attribute behind
              // it); job-group cancel reclaims the executors. A client
              // that swallows interrupts keeps its thread until pool
              // shutdown — queued work still proceeds on the others.
              fut.cancel(true)
              spark.sparkContext.cancelJobGroup(s"graft-attr-$a")
              Failure(new TimeoutException(s"attribute $a exceeded ${cfg.attrTimeoutSec}s"))
            case Failure(e: java.util.concurrent.ExecutionException) if e.getCause != null =>
              Failure(e.getCause)
            case other => other
          })
        }
      } finally pool.shutdownNow()
    val failed = selections.collect { case (a, Failure(e)) =>
      org.slf4j.LoggerFactory
        .getLogger(classOf[Profiler])
        .warn(s"attribute cascade failed: $a (${e.getClass.getSimpleName}: ${e.getMessage})")
      a
    }
    val ok = selections.collect {
      case (a, scala.util.Success((specs, frac))) if specs.nonEmpty => (a, specs, frac)
    }
    if (ok.isEmpty) return (emptyExtractions, failed)

    // the whole-lake APPLY spends ZERO LLM tokens (specs compile to
    // native expressions) — register the stage so the report carries
    // that zero as a row, not an absence
    ledger.foreach(_.touch("apply_lake"))
    // PHASE 2 — the lake pass. Majority-vote combiners run ONE
    // combined scan for every attribute (applySpecsAll); the
    // LLM-backed and WS combiners keep the per-attribute pass (their
    // vote-combine step is itself attribute-scoped and LLM/driver
    // bound, so there is no scan to save proportionally).
    val extractions = cfg.combiner match {
      case "mv" | "top_k" =>
        val votes = applySpecsAll(chunks, ok.map(t => (t._1, t._2)))
          .withColumn("value", Clean.cleanPrediction(col("value"), col("attribute")))
        // abstain handling is a per-attribute scalar decision (frac vs
        // thresh), so attributes split into two groups and each group
        // votes in ONE aggregation — 2 passes over the extraction
        // relation regardless of attribute count ("top_k" forces
        // fraction 0: nothing drops abstains)
        val dropAbstains = ok.collect {
          case (a, _, frac) if cfg.combiner == "mv" && frac >= cfg.extractionFractionThresh => a
        }.toSet
        val groups = Seq(
          (dropAbstains, 1.0, 0.0), // force the drop-abstain branch
          (ok.map(_._1).toSet -- dropAbstains, 0.0, 1.0)) // force plain MV
        groups
          .collect { case (attrs, frac, thresh) if attrs.nonEmpty =>
            Combiners
              .majorityVoteAbstainAware(
                votes.filter(col("attribute").isin(attrs.toSeq: _*)),
                Seq("path", "attribute"),
                "value",
                extractionFraction = frac,
                thresh = thresh)
              .select(col("path"), col("attribute"), col("value"))
          }
          .reduce(_ unionByName _)
      case _ =>
        ok.map { case (a, specs, frac) =>
          val votes = applySpecs(keywordFiltered(chunks, a), specs)
            .withColumn("value", Clean.cleanPrediction(col("value"), lit(a)))
          combineVotes(votes, a, frac)
            .select(col("path"), lit(a).as("attribute"), col("value"))
        }.reduce(_ unionByName _)
    }
    (extractions, failed)
  }

  /** Empty (path, attribute, value) frame — a failed/specless
    * attribute's contribution.
    */
  private def emptyExtractions: DataFrame =
    spark.emptyDataFrame
      .select()
      .withColumn("path", lit(null).cast("string"))
      .withColumn("attribute", lit(null).cast("string"))
      .withColumn("value", lit(null).cast("string"))
      .limit(0)

  /** Vote → value per doc, dispatching on `cfg.combiner`
    * (`combine_extractions`, `profiler.py:115-185`). The measured
    * sample-gold extraction fraction governs abstain handling: at or
    * above the threshold, empty votes are dropped before the vote and
    * all-abstain docs elect `''`.
    */
  private def combineVotes(votes: DataFrame, attribute: String, frac: Double): DataFrame =
    cfg.combiner match {
      case "top_k" =>
        // naive setting: fraction forced to 0.0, abstains never dropped
        // (`evaluate_profiler.py:210-212`)
        Combiners.majorityVoteAbstainAware(
          votes, Seq("path"), "value",
          extractionFraction = 0.0, thresh = cfg.extractionFractionThresh)
      case "ws" =>
        Combiners.wsCombine(votes, "path")
      case "pick_value" =>
        pickValueCombine(votes.withColumn("attribute", lit(attribute)), "path")
      case _ =>
        Combiners.majorityVoteAbstainAware(
          votes, Seq("path"), "value",
          extractionFraction = frac, thresh = cfg.extractionFractionThresh)
    }

  /** OpenIE attribute validity check (`check_remove_attribute`,
    * `profiler.py:49-112`): drop an attribute when its extractions
    * are constant/empty (relational aggregates), or when an LLM
    * majority vote over sample values says they could not be values
    * of that attribute. Returns the attributes to REMOVE.
    */
  def checkRemoveAttributes(extractions: DataFrame): Seq[String] = {
    val agg = SchemaId
      .attrValidityAgg(extractions.select(col("attribute"), col("value")))
      .collect()
    val (autoDrop, toAsk) = agg.partition(_.getAs[Boolean]("drop_attr"))
    // ONE windowed job for every borderline attribute's LLM sample
    // (r18, guide §2.4): the old form ran a separate
    // filter-orderBy-limit(5)-collect per attribute — |borderline|
    // corpus-extraction passes. row_number over (value asc) per
    // attribute keeps the 5 lexicographically-smallest values, the
    // exact multiset the per-attribute limit produced (ties between
    // equal values are interchangeable), read back in the same sorted
    // order.
    val askAttrs = toAsk.map(_.getAs[String]("attribute")).toSeq
    val samplesByAttr: Map[String, Seq[String]] =
      if (askAttrs.isEmpty) Map.empty
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("attribute")).orderBy(col("value"))
        extractions
          .filter(col("attribute").isin(askAttrs: _*) && length(col("value")) > 0)
          .select(col("attribute"), col("value"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .collect()
          .groupBy(_.getString(0))
          .map { case (a, rows) =>
            a -> rows.sortBy(_.getAs[Int]("rn")).map(_.getString(1)).toSeq
          }
      }
    val llmDrop = toAsk.flatMap { r =>
      val attr = r.getAs[String]("attribute")
      val samples = samplesByAttr.getOrElse(attr, Seq.empty)
      if (samples.isEmpty) Some(attr)
      else {
        // 3-vote LLM majority, like the reference's repeated check.
        // An erroring client keeps the attribute (extraction evidence
        // already exists; dropping on infrastructure failure would
        // silently shrink the schema) rather than sinking OpenIE.
        scala.util.Try {
          val answers =
            stageClient("attr_validity").complete(Iterator.fill(3)(Prompts.attrValidity(attr, samples))).toSeq
          val yes     = answers.count(_.trim.toLowerCase.startsWith("y"))
          if (yes * 2 < answers.size) Some(attr) else None
        }.getOrElse(None)
      }
    }
    (autoDrop.map(_.getAs[String]("attribute")) ++ llmDrop).toSeq.sorted
  }

  /** LLM pick-value combiner (`prompts` pick-value path): where
    * extractors disagree, ask the model to choose among candidates;
    * unanimous rows never reach the LLM (cost control).
    */
  def pickValueCombine(votes: DataFrame, keyCol: String): DataFrame = {
    val grouped = votes
      .groupBy(col(keyCol), col("attribute"))
      .agg(sort_array(array_distinct(collect_list(col("value")))).as("cands"))
    val unanimous = grouped
      .filter(size(col("cands")) <= 1)
      .select(col(keyCol), col("attribute"), coalesce(element_at(col("cands"), 1), lit("")).as("value"))
    val disputed = grouped.filter(size(col("cands")) > 1)
    val cl       = stageClient("pick_value")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(keyCol, disputed.schema(keyCol).dataType),
      org.apache.spark.sql.types.StructField("attribute", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType)))
    // fixed-size prompt batches (not a whole-partition buffer): the
    // disputed relation is doc-count-sized, so a partition of it can
    // be arbitrarily large at scale
    val resolved = disputed.mapPartitions { rows =>
      rows.grouped(Profiler.LlmBatchSize).flatMap { batch =>
        val answers = cl.complete(batch.iterator.map { r =>
          Prompts.pickValue(r.getAs[String]("attribute"), r.getAs[scala.collection.Seq[String]]("cands").toSeq)
        })
        batch.iterator.zip(answers).map { case (r, a) =>
          org.apache.spark.sql.Row(r.get(0), r.getAs[String]("attribute"), a.trim)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    unanimous.unionByName(resolved)
  }

  /** E2E run: ClosedIE when `attributes` given, OpenIE otherwise.
    * Returns the wide structured view (D9). OpenIE runs the
    * post-hoc attribute validity filter.
    */
  def run(lake: DataFrame, attributes: Seq[String] = Seq.empty): DataFrame = {
    // fresh OpaqueEval state per run: counters/kill-switches are
    // per-run in the reference (num_timeouts) and must not leak from
    // an earlier run in this JVM; accumulators give the driver
    // cluster-true totals afterwards
    OpaqueEval.installAccumulators(spark.sparkContext)
    OpaqueEval.resetCounters()
    val chunks = prepare(lake)
    // persist the SAMPLE chunks (trainSize docs — tiny), not the lake:
    // the sample's lineage runs the chunker over the whole lake (the
    // semi-join can't prune the scan by content-hash order), and every
    // sample-side action — schema id, per-attribute synthesis collects,
    // gold-on-sample, spec scoring — would re-chunk the entire lake
    // without this. The lake-sized `chunks` is deliberately NOT
    // persisted: it is scanned once per attribute APPLY, and at 100 TB
    // caching it would evict everything else for no reuse win.
    val sample = sampleDocs(chunks, cfg.trainSize).persist()
    val doEnd  = attributes.isEmpty
    try {
      val attrsAll =
        if (attributes.nonEmpty) attributes
        else
          // OpenIE: frequency-ranked candidates, then the 3-round LLM
          // rerank (reference E1 step 3) decides the final order/cut
          rerankSchema(identifySchema(sample))
            .orderBy(col("rank"))
            .collect()
            .map(_.getAs[String]("field"))
            .toSeq
      if (attrsAll.isEmpty)
        // nothing discovered (prose-only lake): the view is just the
        // file universe, no attribute columns
        return lake.select(col("path")).distinct()
      runWith(lake, chunks, sample, attrsAll, doEnd)
    } finally
      // the returned view's lineage is chunks-only (selection was
      // eager inside the cascade), so dropping the sample cache here
      // is safe for later consumption
      sample.unpersist(false)
  }

  private def runWith(
      lake: DataFrame,
      chunks: DataFrame,
      sample: DataFrame,
      attrsAll: Seq[String],
      doEnd: Boolean): DataFrame = {
    val extractionsAll = profileAttributes(chunks, sample, attrsAll, doEnd)
    val (attrs, extractions) =
      if (!doEnd) (attrsAll, extractionsAll)
      else {
        // OpenIE's validity filter runs several actions over the
        // extraction relation (the aggregate check + one sample
        // collect per borderline attribute) and the final pivot reads
        // it once more — without a persist each action re-executes
        // the WHOLE lake APPLY. The relation is extraction-sized
        // (docs × attributes), far smaller than the lake; it stays
        // cached for the returned view's consumption (evictable, like
        // the CC label cache).
        val cached  = extractionsAll.persist()
        val dropped = checkRemoveAttributes(cached).toSet
        (attrsAll.filterNot(dropped), cached.filter(!col("attribute").isin(dropped.toSeq: _*)))
      }
    // every lake file appears in the view — docs with no extraction
    // carry nulls (abstention), they don't vanish from the index
    lake
      .select(col("path"))
      .distinct()
      .join(StructuredView.pivotView(extractions, "path", "attribute", "value", attrs), Seq("path"), "left")
  }

  /** mapPartitions LLM stage over chunks → (path, chunk, completion).
    * Dataset.mapPartitions keeps the stage streaming-compatible, like
    * DirectExtract and Encode.embed. Prompts flow in fixed-size
    * batches ([[Profiler.LlmBatchSize]]) instead of buffering the
    * whole partition: memory is bounded by batch size regardless of
    * how many chunk rows a 100 TB partition holds, and batching
    * clients still see multi-prompt calls for connection reuse.
    */
  private def llmMap(chunks: DataFrame, mkPrompt: String => String, cl0: LlmClient = client): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      chunks.schema.fields :+ org.apache.spark.sql.types.StructField("completion", org.apache.spark.sql.types.StringType))
    val cl = cl0
    val fn = mkPrompt
    chunks.mapPartitions { rows =>
      rows.grouped(Profiler.LlmBatchSize).flatMap { batch =>
        val answers = cl.complete(batch.iterator.map(r => fn(r.getAs[String]("chunk"))))
        batch.iterator.zip(answers).map(r => org.apache.spark.sql.Row.fromSeq(r._1.toSeq :+ r._2))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
