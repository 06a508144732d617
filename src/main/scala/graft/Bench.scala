package graft



/** Per-round benchmark main: times every SparkEntry query at the
  * given scale factor on local[32] and prints ONE JSON line.
  *
  * A warm-up pass (flagship entry + one tiny action per table) runs
  * first so JIT/codegen/session setup cost doesn't land on the first
  * timed query — the numbers reflect steady-state per-query cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-bench")

    // warm-up: JIT, codegen caches, parquet footers
    try {
      Seq("documents", "events", "embeddings", "lineitem", "orders")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
      SparkEntry.entry(spark).count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }

    // force FULL evaluation of every output column: a bare count()
    // lets Catalyst prune computed columns and measures only the scan.
    // Hashing all columns into one aggregated value defeats pruning
    // (and legitimately drops the oracle-parity output sort).
    def evalAll(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.functions._
      // max/min (not sum: ANSI long overflow) over a hash of all columns
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("h")).agg(max("h"), min("h")).head()
      df.columns.length.toLong
    }
    // Steady-state timing (JMH-style): one untimed warm-up execution
    // per query triggers Janino codegen + JIT compilation of that
    // query's generated classes, then MEDIAN-OF-3 timed runs measure
    // the plan's real execution cost. Single-run timing produced 2-4×
    // phantom swings on byte-identical code across rounds (r5-r7:
    // q_dedup_keep_best 2.11→4.96 s with zero code change) — the
    // median of three suppresses one-off GC/scheduler/page-cache
    // outliers in either direction. At deployment scale the one-time
    // compile amortizes to zero, so steady state is the number that
    // predicts 100 TB cost.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def medianOf3(run: () => Unit): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t0) / 1e9
        // GC between reps so one rep's garbage doesn't bill the next
        System.gc()
        sec
      }.sorted
      times(times.length / 2)
    }
    // constant-work calibration probe (r13 VERDICT #6): a fixed
    // CPU-bound query — 6B xxhash64 rows from range(), zero IO, no
    // SF dependence — timed with the same medianOf3 protocol. The box
    // this bench runs on drifts ±13% through the day (three separate
    // r13 forensic notes); the probe's reading lets bench_diff.py
    // normalize round-over-round ratios by machine speed instead of
    // re-litigating uniform shifts by hand. Probed at start AND end
    // so intra-run drift is visible too.
    def calibProbe(): Double = {
      import org.apache.spark.sql.functions._
      def once(): Unit = {
        spark.range(0L, 6144000000L)
          .select(xxhash64(org.apache.spark.sql.functions.col("id")).as("h"))
          .agg(max("h"), min("h")).head()
        ()
      }
      once(); once() // two untimed reps: the probe must gauge the BOX, not JIT maturity
      medianOf3(() => once())
    }
    val calibStart = try calibProbe() catch { case _: Throwable => 0.0 }

    // CONTENTION self-identification (r15 VERDICT #3): the start/end
    // calibProbe pair corrects BOX SPEED but cannot flag co-located
    // load arriving mid-run — r15's committed artifact carried ~1.5×
    // inflation on 42 untouched keys that forensic archaeology, not
    // the artifact, had to diagnose. Short constant-work probes
    // interleaved through the main loop make a dirty run
    // self-identify: spread = (max-min)/min over the readings, and
    // `contended: true` when it exceeds 15% (steady boxes read <10%).
    def shortProbe(): Double = {
      import org.apache.spark.sql.functions._
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 3072000000L)
          .select(xxhash64(org.apache.spark.sql.functions.col("id")).as("h"))
          .agg(max("h"), min("h")).head()
        (System.nanoTime() - t0) / 1e9
      }
      // median of 3 of a ~0.6 s run: the first r16 shakedown used a
      // single ~0.4 s run and read a 50% max/min range on an
      // otherwise-idle box (fixed per-job scheduling overhead is a
      // large, variable share of a sub-half-second reading); halving
      // the overhead share and taking the median damps exactly that
      Seq(once(), once(), once()).sorted.apply(1)
    }
    val probeReadings = scala.collection.mutable.ArrayBuffer.empty[Double]
    try { shortProbe(); probeReadings += shortProbe() } // one untimed JIT warm-up
    catch { case _: Throwable => () }
    // SUSTAINED elevation, not max/min range: (median − min)/min.
    // The r15 contamination signature was most-of-the-run inflation
    // (42 keys 1.4-2.1×); a single outlier probe reading — one GC
    // burst, one host hiccup — must not brand the whole artifact.
    // Minimum THREE readings (r16 ADVICE): with exactly two, the
    // median IS the max and the damping degenerates to (max−min)/min
    // — a narrow SPARK_GRAFT_ONLY run would let one noisy end-of-run
    // probe brand the artifact contended
    def probeSpread: Double = {
      if (probeReadings.size < 3 || probeReadings.min <= 0) return 0.0
      val sorted = probeReadings.toSeq.sorted
      val median = sorted(sorted.size / 2)
      (median - sorted.head) / sorted.head
    }
    def contended: Boolean = probeSpread > 0.15
    // per-PROBE elevation vs the run's cleanest reading: the segment
    // localizer behind suspect_keys (r16 VERDICT #2 — detect AND act:
    // a contended artifact separates clean keys from suspect ones so
    // bench_diff compares only the clean set)
    def probeElevated(i: Int): Boolean =
      probeReadings.size >= 3 && probeReadings.min > 0 && i >= 0 &&
        i < probeReadings.size && probeReadings(i) > probeReadings.min * 1.15

    // optional comma-separated query filter for local profiling runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Locale.ROOT: the f-interpolator is locale-sensitive and would
    // emit comma decimals (invalid JSON) under e.g. a German default
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // every printed metric line is ALSO persisted to a file artifact:
    // the driver keeps only a ~2,000-char tail of stdout, which
    // truncated r11's per-query map out of BENCH_r11.json and nearly
    // cost the round its per-query regression check. The file is the
    // durable record; the stdout lines remain the driver's contract.
    val emitted = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(line: String): Unit = { println(line); emitted += line }
    // INCREMENTAL artifact (r17 VERDICT #1a): each query's median goes
    // out as its own JSON line the moment it is measured, so a run
    // killed mid-loop still yields per-query ground truth (r17's rc=124
    // runs produced ZERO evidence because everything was emitted at the
    // end). Additions-only: the aggregate "queries" map line and the
    // compact total line below are unchanged.
    def emitQuery(name: String, sec: Double, ok: Boolean): Unit =
      emit(s"""{"metric":"query","name":"$name","sec":${num(sec)},"ok":$ok,"sf":"$sfDir"}""")
    // wall-clock budget for the whole main (r17 VERDICT #1b): the 3-SF
    // scaling sweep is the largest optional block; when the gated loop
    // + extras already consumed the budget (a 1.5x-slow co-tenant box),
    // the sweep truncates per query instead of blowing the driver's
    // window with no artifact at all. Default 2400 s leaves headroom
    // inside a ~60-min driver window even with sbt/JVM startup.
    val benchT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchT0) / 1e9
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET", "2400").toDouble
    // queries that threw at ANY scale factor (current or sibling):
    // excluded from EVERY point of the scaling fit so family sums
    // always compare the same query composition across SFs
    val failed = scala.collection.mutable.Set.empty[String]
    // query name -> index of the probe reading taken BEFORE it (the
    // reading after it is at index+1 once the next interleaved or
    // end-of-run probe lands); suspect = either bounding probe
    // elevated, resolved AFTER all probes are in
    val probeEpochOf = scala.collection.mutable.Map.empty[String, Int]
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .zipWithIndex
      .map { case ((name, fn), idx) =>
      // interleaved contention probe every ~40 queries (≈5 readings
      // across the 233-query loop)
      if (idx > 0 && idx % 40 == 0)
        try probeReadings += shortProbe() catch { case _: Throwable => () }
      probeEpochOf(name) = probeReadings.size - 1
      val ok =
        try { evalAll(fn(spark, sfDir)); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      val sec = if (ok) medianOf3(() => evalAll(fn(spark, sfDir))) else 0.0
      if (!ok) { failed += name; System.err.println(s"[bench] $name FAILED") }
      emitQuery(name, sec, ok)
      // drop persisted frames a query leaves behind (e.g. the CC
      // label cache): queries are independent, so any surviving cache
      // entry is pure storage-memory pressure on every later query —
      // this is what inflated round-2 numbers (q_dedup_clusters read
      // 13.4s in the full run vs 4.2s in isolation)
      spark.catalog.clearCache()
      // collect the previous query's garbage OUTSIDE the next timed
      // window: without this, allocation-heavy queries charge their
      // GC debt to whichever query runs next (observed 1.6s → 6.3s
      // swings on q_ann_kmeans purely from run order)
      System.gc()
      name -> sec
    }
    // provisional total the moment the gated loop ends (r17 VERDICT
    // #1): a run killed during the e2e extras or the sweep still
    // leaves a parsable sum of every gated query. The headline
    // "total" line (gated + e2e/sink entries) follows unchanged.
    emit(s"""{"metric":"total_main","value":${num(results.map(_._2).sum)},"unit":"sec","queries_n":${results.size},"note":"gated queries only, emitted before e2e/sink extras; the headline total line follows","sf":"$sfDir"}""")
    // flagship end-to-end at the bench SF (same warm-up-then-time
    // protocol as the queries): the full mock-LLM spine — scan →
    // chunk → keyword filter → direct extract → clean → vote → pivot
    // — so the composed path has a tracked wall-time, not just its
    // unit queries
    def timeE2e(name: String, mk: () => org.apache.spark.sql.DataFrame): Option[(String, Double)] =
      if (only.forall(_.contains(name))) {
        probeEpochOf(name) = probeReadings.size - 1
        val ok =
          try { evalAll(mk()); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
        val sec = if (ok) medianOf3(() => evalAll(mk())) else 0.0
        spark.catalog.clearCache()
        System.gc()
        emitQuery(name, sec, ok)
        if (ok) Some(name -> sec) else None
      } else None
    // sink-shaped entries: the run WRITES (returns a row count), so
    // each rep gets a fresh temp dir, removed afterwards — timing
    // covers the write path itself, not a scan proxy
    def timeSink(name: String, run: String => Long): Option[(String, Double)] =
      if (only.forall(_.contains(name))) {
        probeEpochOf(name) = probeReadings.size - 1
        def deleteRec(p: java.nio.file.Path): Unit = {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(p)) {
            java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
              .foreach(f => java.nio.file.Files.deleteIfExists(f))
          }
        }
        def once(): Unit = {
          val out = java.nio.file.Files.createTempDirectory("graft-bench-sink")
          try { run(out.toString); () }
          finally deleteRec(out)
        }
        val ok =
          try { once(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
        val sec = if (ok) medianOf3(() => once()) else 0.0
        spark.catalog.clearCache()
        System.gc()
        emitQuery(name, sec, ok)
        if (ok) Some(name -> sec) else None
      } else None
    // composed graph family over ONE persisted co-purchase edge
    // relation (r14 VERDICT #2): the gated q_triangle_count /
    // q_triangle_sampled / q_kcore / q_graph_profile cards each
    // re-derive coOccurrenceEdges(lineitem) independently — 5
    // identical Σ|basket|² derivations, ~19% of the r14 bench. A
    // production run materializes the edges ONCE and reads every card
    // from the cache; this entry times that composition per stage.
    // The census-stage exact/sampled ratio is the DOULION tier's
    // honest saving: end-to-end per-card both tiers pay the
    // basket→pair corpus pass (ratio ~1.2×), but from the cache the
    // p=0.1 sampled census skips ~p^1.5 of the wedge work — the
    // at-scale shape, where the edge relation is materialized anyway.
    // derive is a SINGLE timed materialization (the cache fill);
    // card stages use the standard medianOf3 protocol on the cache.
    val graphStages: Option[(Double, Double, Double, Double, Double, Double, Double)] =
      if (only.forall(_.contains("graph_e2e"))) {
        probeEpochOf("graph_e2e") = probeReadings.size - 1
        val out =
          try {
            // one untimed evalAll per stage first (r15 ADVICE): the
            // per-query protocol warms codegen/JIT before timing;
            // without it a REPS=1/2 run bills Janino compile cost to
            // the stage, contradicting the medianOf3 steady-state
            // contract
            def stage(df: => org.apache.spark.sql.DataFrame): Double = {
              evalAll(df)
              medianOf3(() => { evalAll(df); () })
            }
            val edges = graft.relops.GraphOps.coOccurrenceEdges(
              graft.lake.Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey", maxBasket = 50)
              .persist()
            val t0      = System.nanoTime()
            edges.count()
            val tDerive = (System.nanoTime() - t0) / 1e9
            val tExact   = stage(graft.relops.GraphOps.triangleStats(edges))
            val tSampled = stage(graft.relops.GraphOps.triangleStatsSampled(edges, p = 0.1, seed = 7L))
            val tKcore   = stage(graft.relops.GraphOps.kCore(edges, k = 80))
            val tProfile = stage(graft.relops.GraphOps.degreeProfile(edges))
            // HITS off the SAME persisted relation (r15 VERDICT #8):
            // the last graph card joins the one-derivation story
            val tHits    = stage(graft.relops.GraphOps.hits(edges, "pa", "pb"))
            // the SCHEDULING FLOOR, measured not blamed (r15 VERDICT
            // #4): the same census job chain on a 100-edge path graph
            // is pure per-job overhead — data-bound wedge work is
            // nil. SCALE.md's "sampled census is floor-bound at bench
            // SF" claim divides by this number.
            val tiny = spark.range(0L, 100L)
              .selectExpr("id AS pa", "id + 1 AS pb").persist()
            tiny.count()
            val tFloor = stage(graft.relops.GraphOps.triangleStats(tiny))
            Some((tDerive, tExact, tSampled, tKcore, tProfile, tHits, tFloor))
          } catch {
            case e: Throwable => System.err.println(s"[bench] graph_e2e: ${e.getMessage}"); None
          }
        // unconditionally, ALSO on the failure path: a mid-stage throw
        // must not leak the edge cache into the next entry's timing
        // (the q_dedup_clusters 4.2s->13.4s lesson)
        spark.catalog.clearCache()
        System.gc()
        out
      } else None
    val graphE2e: Option[(String, Double)] =
      graphStages.map { case (d, ex, sa, kc, pr, hi, _) =>
        emitQuery("graph_e2e", d + ex + sa + kc + pr + hi, ok = true)
        "graph_e2e" -> (d + ex + sa + kc + pr + hi)
      }
    val all = results ++ graphE2e ++
      timeE2e("entry_e2e", () => SparkEntry.entryOn(spark, sfDir)) ++
      timeE2e("cascade_e2e", () => SparkEntry.cascadeOn(spark, sfDir)) ++
      timeE2e("openie_e2e", () => SparkEntry.openieOn(spark, sfDir)) ++
      timeE2e("html_cascade_e2e", () => SparkEntry.htmlCascadeOn(spark, sfDir)) ++
      timeE2e("curation_e2e", () => SparkEntry.curationOn(spark, sfDir)) ++
      // the batch operator IS retrieval_e2e since round 9 (the
      // per-query plan loop it replaced lives on as
      // SparkEntry.retrievalLoopOn for the A/B equality specs)
      timeE2e("retrieval_e2e", () => SparkEntry.retrievalOn(spark, sfDir)) ++
      timeE2e("direct_retrieval_e2e", () => SparkEntry.directRetrievalOn(spark, sfDir)) ++
      // spec-gated ops with no oracle — visible to the perf record as
      // timing + row count (VERDICT r10 #8)
      timeE2e("compression_ratio", () => SparkEntry.compressionRatioOn(spark, sfDir)) ++
      timeE2e("mmr_rerank", () => SparkEntry.mmrRerankOn(spark, sfDir)) ++
      timeE2e("ann_recall_gauge", () => SparkEntry.recallGaugeOn(spark, sfDir)) ++
      timeE2e("pca_whiten", () => SparkEntry.pcaWhitenOn(spark, sfDir)) ++
      timeE2e("unigram_train", () => SparkEntry.unigramTrainOn(spark, sfDir)) ++
      timeSink("zorder_sink", out => SparkEntry.zOrderWriteOn(spark, sfDir, out))
    // bounding probe for the e2e/sink segment: without it those
    // entries' "after" probe would be the end-of-run reading on the
    // far side of the ~25-min scaling sweep, and contention arriving
    // only during scaling would mark them suspect
    try probeReadings += shortProbe() catch { case _: Throwable => () }
    val qs    = all.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    // COMPOSED entries re-time work the per-query entries already
    // timed (graph_e2e re-runs the four gated graph cards off one
    // cache) — folding them into the headline total double-counts
    // and makes total_calib_adjusted composition-unstable across
    // rounds (r15 ADVICE). They keep their own metric lines; the
    // total sums everything else.
    val composedExcluded = Set("graph_e2e")
    val total = all.collect { case (k, v) if !composedExcluded.contains(k) => v }.sum
    // emit protocol: the driver's capture window can clip the head of
    // a single ~4 KB line (r3's bench parsed as null that way), so the
    // short total line goes out FIRST, the bulky per-query map on its
    // own second line, and the total line again LAST — whichever end
    // of the stream the window keeps, an intact compact line is in it.
    // drift-normalized total (r14 VERDICT #7): calibRef is the fixed
    // reference box speed (SCALE.md's r14 same-code probe reading);
    // total × calibRef/calib is directly comparable across rounds
    // without re-deriving the correction by hand. The compact line
    // uses the start probe (the end probe hasn't run yet); the final
    // calibration line re-emits it against the mean probe.
    val calibRef = 0.973
    // a failed probe (calib 0) must read JSON null, not silently pass
    // the RAW total off as drift-normalized (bench_diff's regex skips
    // null and degrades to its calibration-missing path)
    def adjTotal(calib: Double): String =
      if (calib > 0) num(total * calibRef / calib) else "null"
    val compact = s"""{"metric":"total","value":${num(total)},"unit":"sec","sf":"$sfDir","queries_n":${all.size},"composed_excluded":["graph_e2e"],"calib":${num(calibStart)},"total_calib_adjusted":${adjTotal(calibStart)},"calib_ref":$calibRef,"probe_spread":${num(probeSpread)},"contended":$contended}"""
    emit(compact)
    graphStages.foreach { case (d, ex, sa, kc, pr, hi, fl) =>
      emit(
        s"""{"metric":"graph_e2e","derive":${num(d)},"exact_census":${num(ex)},"sampled_census":${num(
            sa)},"census_ratio":${num(if (sa > 0) ex / sa else 0.0)},"offfloor_ratio":${num(
            if (sa > fl && ex > fl) (ex - fl) / (sa - fl) else 0.0)},"kcore":${num(kc)},"profile":${num(
            pr)},"hits":${num(hi)},"floor_sec":${num(
            fl)},"value":${num(d + ex + sa + kc + pr + hi)},"unit":"sec","note":"all cards from ONE persisted edge relation (hits stage since r16); census_ratio = exact/sampled census stage cost on the cache; offfloor_ratio = (exact-floor)/(sampled-floor), the same ratio with the measured scheduling floor removed from both tiers - the residual gap is the linear edge scan both tiers pay; floor_sec = the same census job chain on a 100-edge graph (pure scheduling floor, excluded from value)","sf":"$sfDir"}""")
    }
    // the sampled tier's END-TO-END economics next to the exact card
    // (r14 VERDICT #1): both per-card tiers pay the basket->pair
    // derivation, so this ratio is bounded by the derive share; the
    // census-stage ratio above is the amortized-derivation number
    locally {
      val qmap = results.toMap
      for {
        ex <- qmap.get("q_triangle_count")
        sa <- qmap.get("q_triangle_sampled")
        if ex > 0 && sa > 0
      } emit(
        s"""{"metric":"triangle_sampled","exact_sec":${num(ex)},"sampled_sec":${num(sa)},"e2e_ratio":${num(
            ex / sa)},"sf":"$sfDir"}""")
    }
    // key_notes: operator-identity changes behind a stable key, so
    // historical series stay interpretable (a swapped operator is
    // not a perf delta) — retrieval_e2e timed the 8-branch per-query
    // plan loop through round 8 and the batch ivfPqTopKBatch
    // operator from round 9 on
    val notes =
      """{"graph_e2e":"since r16: +hits stage off the same persisted relation, floor_sec measured, EXCLUDED from the headline total (it re-times the gated graph cards); r14-r15 summed 5 stages into total",""" +
        """"retrieval_e2e":"batch ivfPqTopKBatch since r9; rounds<=8 timed the per-query plan loop (now retrievalLoopOn)",""" +
        """"direct_retrieval_e2e":"new in r11 - retrieval-augmented Evaporate-Direct (embed chunks once, top-1 chunk per (file,attr) by cosine, prompt only that chunk)",""" +
        """"compression_ratio":"new in r11 - spec-gated deflate quality signal, timing+rows only (no DuckDB oracle: no deflate there)",""" +
        """"zorder_sink":"new in r11 - Morton-layout write of documents on (n_chars,doc_id) to a temp dir; times the WRITE path",""" +
        """"mmr_rerank":"new in r11 - spec-gated MMR diversified top-20 over 100 candidates (greedy loop is sequential, no SQL oracle)",""" +
        """"ann_recall_gauge":"new in r17 - spec-gated recall-drift gauge for the streaming PQ index (8 sampled probes, batched ADC + batched brute force, one scan each); times fit+encode+gauge",""" +
        """"pca_whiten":"new in r11 - spec-gated PCA whitening of all embeddings (treeAggregate moments + Jacobi eigen, no SQL oracle)",""" +
        """"unigram_train":"new in r11 - spec-gated unigram-LM tokenizer training, vocab 64 (one word-table job + driver Viterbi-EM; q_sp_seed_vocab gates the distributed stage)",""" +
        """"direct_whole_lake":"since r12 the reference-exact Direct baseline: EVERY (chunk, attribute) pair, NO keyword filter (main.py:71 passes file2chunks unfiltered), chunkSize 128 so bench docs split into ~3 chunks; r11 and earlier measured keyword-filtered single-chunk pairs at chunkSize 1000 - totals not comparable across that boundary",""" +
        """"direct_retrieval_total":"llm_tokens key; since r12 measured at chunkSize 128 on the SAME chunk table as direct_whole_lake, so the top-1-chunk saving (factor = chunks-per-doc) is visible at bench SF; r11 measured both legs single-chunk (equal totals)"}"""
    emit(s"""{"metric":"queries","queries":$qs,"key_notes":$notes,"sf":"$sfDir"}""")
    // the cascade's token economics at this SF (single measured run,
    // not timed): per-stage LLM token cost of the ClosedIE cascade +
    // the whole-lake Direct baseline on the same lake/attributes —
    // the reference's headline `total_tokens_prompted` bookkeeping
    // (main.py:25-26,97-98) as a bench artifact. `apply_lake` is the
    // checked ZERO; ratio = direct tokens / cascade tokens (the
    // Code+-vs-Direct reduction, growing with lake size).
    if (only.isEmpty) try {
      val rows = SparkEntry.tokenCostOn(spark, sfDir).collect()
      val stages = rows
        .map(r => "\"" + r.getString(0) + "\":" + r.getLong(4))
        .mkString("{", ",", "}")
      // cascade_total keeps its r<=10 meaning (cascade-only stages):
      // both Direct baselines are excluded, so the series stays
      // comparable; the retrieval-direct middle point gets its own key
      val directStages = Set("direct_whole_lake", "direct_retrieval")
      val direct  = rows.filter(_.getString(0) == "direct_whole_lake").map(_.getLong(4)).sum
      val retr    = rows.filter(_.getString(0) == "direct_retrieval").map(_.getLong(4)).sum
      val cascade = rows.filter(r => !directStages.contains(r.getString(0))).map(_.getLong(4)).sum
      val ratio   = if (cascade > 0) direct.toDouble / cascade else 0.0
      emit(
        s"""{"metric":"llm_tokens","stages":$stages,"cascade_total":$cascade,"direct_total":$direct,"direct_retrieval_total":$retr,"direct_over_cascade":${num(
            ratio)},"sf":"$sfDir"}""")
    } catch { case e: Throwable => System.err.println(s"[bench] llm_tokens: ${e.getMessage}") }
    // cross-SF scaling line (VERDICT r10 #4): time every query at
    // each sibling SF dir with the SAME medianOf3 steady-state
    // protocol the current SF uses (one untimed codegen warm-up, then
    // median of timed reps — mixed methodologies skewed fitted slopes,
    // ADVICE r11), aggregate per operator family, fit the log-log
    // slope, flag superlinear families. A query that failed at ANY SF
    // is excluded from EVERY point (including the current SF's) so
    // family sums stay composition-consistent. Disable with
    // SPARK_GRAFT_SCALING=0.
    if (only.isEmpty && sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0") try {
      val m = java.util.regex.Pattern.compile("(.*sf)([0-9.]+)/?$").matcher(sfDir)
      if (m.matches()) {
        val base = m.group(1)
        val cur  = m.group(2).toDouble
        val siblings = Seq("0.001", "0.01", "0.1")
          .map(s => (base + s, s.toDouble))
          .filter { case (d, sf) => sf != cur && new java.io.File(d).isDirectory }
        val times = scala.collection.mutable.Map.empty[(String, Double), Double]
        results.foreach { case (name, sec) => times((name, cur)) = sec }
        // budget truncation (r17 VERDICT #1b): a query the budget cut
        // off at ANY sibling SF is excluded from EVERY point of the
        // fit, exactly like `failed`, so family sums keep comparing
        // the same query composition across SFs.
        val budgetSkipped = scala.collection.mutable.Set.empty[String]
        siblings.foreach { case (dir, sf) =>
          SparkEntry.queries.foreach { case (name, fn) =>
            if (elapsedSec > budgetSec || budgetSkipped.contains(name)) {
              budgetSkipped += name
            } else {
              try {
                evalAll(fn(spark, dir)) // codegen/JIT warm-up, untimed
                times((name, sf)) = medianOf3(() => evalAll(fn(spark, dir)))
                // streamed per-point line: a killed sweep still leaves
                // partial cross-SF evidence (r17 VERDICT #1a)
                emit(s"""{"metric":"query_sf","name":"$name","sf_point":${num(sf)},"sec":${num(times((name, sf)))},"sf":"$sfDir"}""")
              } catch { case e: Throwable =>
                failed += name
                System.err.println(s"[bench] scaling $name@$sf: ${e.getMessage}")
              }
              // the FULL current-SF protocol, per query: leftover
              // persisted frames and GC debt otherwise contaminate the
              // next query's sibling reading exactly as they did the
              // main loop's (the r2 q_dedup_clusters 13.4s-vs-4.2s
              // lesson), skewing fitted slopes
              spark.catalog.clearCache()
              System.gc()
            }
          }
        }
        val sfs = (siblings.map(_._2) :+ cur).sorted
        val famTimes: Map[String, Seq[(Double, Double)]] = times.toSeq
          .filter { case ((n, _), _) => !failed.contains(n) && !budgetSkipped.contains(n) }
          .groupBy { case ((n, _), _) => Scaling.familyOf(n) }
          .map { case (f, xs) =>
            f -> sfs.map(s => (s, xs.collect { case ((_, s2), t) if s2 == s => t }.sum))
          }
        val flagged = Scaling.flagged(famTimes)
        val famJson = famTimes.toSeq.sortBy(_._1).map { case (f, pts) =>
          val ts = pts.map(p => num(p._2)).mkString("[", ",", "]")
          s""""$f":{"t":$ts,"slope":${num(Scaling.fitSlope(pts))}}"""
        }.mkString("{", ",", "}")
        val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
        val excluded = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
        emit(
          s"""{"metric":"scaling","sfs":${sfs.map(num).mkString("[", ",", "]")},"families":$famJson,"flagged":$flaggedJson,"excluded":$excluded,"truncated":${budgetSkipped.nonEmpty},"budget_skipped_n":${budgetSkipped.size},"budget_sec":${num(budgetSec)},"elapsed_sec":${num(elapsedSec)},"sf":"$sfDir"}""")
      }
    } catch { case e: Throwable => System.err.println(s"[bench] scaling: ${e.getMessage}") }
    // end-of-run probe: start-vs-end gap is the intra-run drift; the
    // mean is what bench_diff.py divides by
    try probeReadings += shortProbe() catch { case _: Throwable => () }
    // contention record, emitted AFTER the last probe so suspect
    // resolution sees the full series (r16 VERDICT #2): each query
    // carries the index of the probe taken before it; it is SUSPECT
    // when either bounding probe reads >15% above the run's cleanest
    // probe — co-located load landed in its segment, so its time
    // carries inflation the calibration probe cannot correct.
    // bench_diff.py excludes suspect keys from regression flagging.
    locally {
      val suspect = probeEpochOf.toSeq.collect {
        case (name, e) if probeElevated(e) || probeElevated(e + 1) => name
      }.sorted
      val suspectJson = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
      emit(
        s"""{"metric":"contention","probes":${probeReadings.map(num).mkString("[", ",", "]")},"spread":${num(
            probeSpread)},"contended":$contended,"band":0.15,"suspect_keys":$suspectJson,"work":"range(3072e6) xxhash64 max/min, median of 3; spread = (median-min)/min; suspect = a bounding probe >15% above the run min","sf":"$sfDir"}""")
    }
    val calibEnd = try calibProbe() catch { case _: Throwable => 0.0 }
    val calibMean =
      if (calibStart > 0 && calibEnd > 0) (calibStart + calibEnd) / 2
      else math.max(calibStart, calibEnd)
    emit(
      s"""{"metric":"calibration","start":${num(calibStart)},"end":${num(calibEnd)},"value":${num(
          calibMean)},"unit":"sec","work":"range(6144e6) xxhash64 max/min, medianOf3","total_calib_adjusted":${adjTotal(
          calibMean)},"calib_ref":$calibRef,"probe_spread":${num(probeSpread)},"contended":$contended,"sf":"$sfDir"}""")
    println(compact)
    // durable artifact: a JSON array of every metric line this run
    // emitted, written where the driver (and the round-over-round
    // diff script, scripts/bench_diff.py) can always read it.
    // A SPARK_GRAFT_ONLY profiling run writes a .partial file
    // instead — a 1-query isolation run once silently clobbered the
    // committed full-round baseline and blinded the next round's
    // regression diff (r14 review finding).
    val defaultOut =
      if (only.isDefined) "bench_results.partial.json" else "bench_results.json"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    try
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath),
        emitted.mkString("[\n", ",\n", "\n]\n"))
    catch { case e: Throwable => System.err.println(s"[bench] artifact write: ${e.getMessage}") }
    spark.stop()
  }
}
