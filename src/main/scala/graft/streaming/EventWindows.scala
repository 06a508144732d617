package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Fixed (tumbling) event-time window aggregation over an event
  * stream or table — the other standard event-analytics primitive
  * next to gap sessions (graft.streaming.Sessionize). The reference
  * has no event analytics (SURVEY §2.9); north-star operator on
  * Spark built-ins.
  *
  * Batch path: the built-in `window()` grouping — epoch-aligned
  * tumbling buckets, one hash aggregation with map-side combine
  * (partials collapse each scan split's rows before the single keyed
  * shuffle). At 100 TB the group count is (windows × keys), tiny
  * next to the input — the aggregation is the classic reduce shape.
  *
  * Streaming path: identical grouping + a watermark; state is one
  * row per open (window, key) and evicted when the watermark passes
  * the window end.
  *
  * Cross-engine parity: sums run over DECIMAL-quantized values
  * (order-free addition), cast back to double at the edge — the same
  * trade every decimal-sum operator here makes.
  */
object EventWindows {

  /** Per (tumbling window, key) counts and value sums. Output:
    * window_start/window_end timestamps, key, n_events, sum_value
    * (6dp-rounded double).
    */
  def tumblingStats(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowLen: String): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast("decimal(27,6)")).cast("double"), 6).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col(keyCol),
        col("n_events"),
        col("sum_value"))

  /** Binned interval self-join (range join): for each anchor event,
    * count and value-sum the OTHER events of the same key within
    * ±windowSec of the anchor's timestamp — "activity around the
    * purchase", the canonical event-analytics interval join.
    *
    * Spark has no range-join strategy; the naive plan is an equi-join
    * on the key alone followed by the time predicate, which
    * materializes per-key event² pairs (a heavy user's timeline blows
    * up quadratically). The scale-safe shape implemented here is
    * time-bucket binning: non-anchors land in bucket
    * floor(ts/windowSec); anchors fan out to buckets {b−1, b, b+1}
    * (every event within ±windowSec of the anchor is in one of those
    * three), the join runs on (key, bucket) — pruning candidates to
    * the anchor's immediate time neighborhood — and the exact |Δts| ≤
    * window predicate filters the survivors. Candidate volume scales
    * with events-per-window, not events-per-key. Anchors with no
    * neighbors are restored by a final left join (count 0, sum 0.0).
    *
    * Cross-engine parity: timestamps compare in integral epoch
    * micros; value sums are decimal-quantized (order-free).
    */
  def nearbyEventStats(
      events: DataFrame,
      idCol: String,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      anchorPred: Column,
      windowSec: Int): DataFrame = {
    val binUs = windowSec.toLong * 1000000L
    val base = events.select(
      col(idCol),
      col(keyCol),
      unix_micros(col(tsCol)).as("ts_us"),
      col(valueCol).as("ev_value"),
      anchorPred.as("is_anchor"))
    // exact floor division (ts_us ≥ 0 here, but keep the pmod form —
    // same reasoning as Tables.events' nanos→micros conversion)
    val bucketOf = expr(s"(ts_us - pmod(ts_us, ${binUs}L)) div ${binUs}L")
    val others = base.select(
      col(keyCol),
      col(idCol).as("nb_id"),
      col("ts_us").as("nb_ts_us"),
      col("ev_value"),
      bucketOf.as("bucket"))
    val anchors = base
      .filter(col("is_anchor"))
      .select(col(idCol), col(keyCol), col("ts_us"), bucketOf.as("b0"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
    val stats = anchors
      .join(others, Seq(keyCol, "bucket"))
      .filter(
        col("nb_id") =!= col(idCol) &&
          abs(col("nb_ts_us") - col("ts_us")) <= binUs)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_nearby"),
        round(sum(col("ev_value").cast("decimal(27,6)")).cast("double"), 6).as("sum_nearby_value"))
    base
      .filter(col("is_anchor"))
      .select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_nearby"), lit(0)).as("n_nearby"),
        coalesce(col("sum_nearby_value"), lit(0.0)).as("sum_nearby_value"))
  }

  /** Streaming equivalent: same tumbling aggregation with
    * watermark-bounded state (append mode emits a window once the
    * watermark passes its end). Valid on a streaming DF.
    */
  def streamingTumblingStats(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast("decimal(27,6)")).cast("double"), 6).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col(keyCol),
        col("n_events"),
        col("sum_value"))

  /** Ordered conversion funnel: how many users complete stage k of
    * `stages` STRICTLY after their stage k−1 completion (first
    * qualifying event each). The event-analytics staple next to
    * sessions/windows. Semantics: t₁ = min ts of a stage-1 event;
    * tₖ = min ts of a stage-k event with ts > tₖ₋₁ — strict event-time
    * order, engine-replayable (no tie heuristics).
    *
    * One job: per-stage reached-frames chain through broadcast-able
    * per-user join keys (each frame is ≤ one row per user — the
    * working set shrinks every stage), then a single aggregation
    * counts all stages at once; the k output rows are in-plan
    * literal selects, no driver loop over count() jobs.
    *
    * Output: (stage, event_type, n_users, conv_overall, conv_prev).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val perStage = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (st, _)) =>
        val hits = events.filter(col(typeCol) === st)
        val reached = prev match {
          case None =>
            hits.groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
          case Some(p) =>
            hits
              .join(p.select(col(userCol), col("t").as("t_prev")), Seq(userCol))
              .filter(col(tsCol) > col("t_prev"))
              .groupBy(col(userCol))
              .agg(min(col(tsCol)).as("t"))
        }
        Some(reached)
    }.flatten
    // one wide row of stage counts, then k literal stage rows
    val wide = perStage.zipWithIndex
      .map { case (df, i) => df.agg(count(lit(1)).as(s"n$i")) }
      .reduce(_ crossJoin _)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      val n       = col(s"n$i")
      val nFirst  = col("n0")
      val nPrev   = if (i == 0) col("n0") else col(s"n${i - 1}")
      val safeDiv = (a: Column, b: Column) => when(b === 0, 0.0).otherwise(round(a.cast("double") / b, 6))
      wide.select(
        lit(i + 1).as("stage"),
        lit(st).as("event_type"),
        n.as("n_users"),
        safeDiv(n, nFirst).as("conv_overall"),
        safeDiv(n, nPrev).as("conv_prev"))
    }
    rows.reduce(_ unionByName _).orderBy(col("stage"))
  }

  /** Trailing 7-day active users per day (rolling WAU): sliding
    * DISTINCT counts can't ride a window frame (distinct doesn't
    * decompose over frames), so this uses the standard expand trick —
    * each distinct (user, day) contributes itself to the 7 window
    * days it stays "active" for, then one exact distinct count per
    * window day. Cost is a 7× row expand of the ALREADY-collapsed
    * (user, day) relation (tiny next to raw events), not of the
    * event stream; at wider windows swap the exact distinct for the
    * KMV sketch aggregate (graft.expressions.KmvSketchAgg).
    *
    * Output: (day, n_active) for every day with ≥1 active user in
    * its trailing window.
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String, days: Int = 7): DataFrame = {
    // integral `div` truncates toward zero, and so does DuckDB's `//`
    // on integers (verified: -5 // 2 = -2) — the two engines agree on
    // every input, including pre-1970 negatives, and staying integral
    // removes the double-rounding risk of divide-then-cast. NOTE this
    // is truncation, not floor: a bucket op that needs true
    // floor-to-boundary semantics for negative epochs must use the
    // pmod-subtract form (nearbyEventStats, Tables.scala:27).
    val day = expr(s"unix_micros($tsCol) div 86400000000L")
    events
      .select(col(userCol), day.as("day"))
      .distinct()
      .select(col(userCol), explode(sequence(col("day"), col("day") + (days - 1))).as("wday"))
      .groupBy(col("wday").as("day"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .orderBy(col("day"))
  }

  /** Weekly cohort retention: users bucketed by the absolute epoch
    * week (floor(unix_micros/week)) of their FIRST event; for each
    * cohort and week-offset k, the fraction of the cohort active in
    * week cohort+k. Integer epoch-week math (not calendar
    * date_trunc) so both engines bucket identically.
    *
    * Scale shape: distinct (user, week) first — the raw event volume
    * collapses before anything else; first-week and the join reuse
    * the user-key exchange; the final (cohort, k) aggregation is
    * tiny. Three keyed shuffles total, each over shrinking data.
    *
    * Output: (cohort_wk, week_k, n_active, cohort_size, retention).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wk = expr(s"unix_micros($tsCol) div 604800000000L")
    val uw = events.select(col(userCol), wk.as("wk")).distinct()
    val first = uw.groupBy(col(userCol)).agg(min(col("wk")).as("cohort_wk"))
    val sizes = first.groupBy(col("cohort_wk")).agg(count(lit(1)).as("cohort_size"))
    uw.join(first, Seq(userCol))
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).cast("int").as("week_k"))
      .groupBy(col("cohort_wk"), col("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_wk"))
      .withColumn("retention", round(col("n_active").cast("double") / col("cohort_size"), 6))
      .orderBy(col("cohort_wk"), col("week_k"))
  }

  /** RFM segmentation (recency / frequency / monetary quartiles) —
    * the classic behavioral-cohort cut of an event stream. Tiles are
    * assigned against exact-percentile CUTPOINTS broadcast from a
    * one-row aggregate, NOT a global-window ntile: a global ntile
    * collapses every user row into one window partition (the
    * single-reducer trap), while three cutpoints per metric cost one
    * tiny extra aggregation and the assignment stays a per-row
    * comparison. Tile 1 = most recent / most frequent / highest
    * spend. Determinism: the monetary sum goes through
    * DECIMAL(27,6) (order-independent), cutpoints and values round
    * to 6, and tile assignment is integer sums of comparisons —
    * engine-exact under the DuckDB gate.
    *
    * Output: (user, recency_days, frequency, monetary, r/f/m tiles,
    * segment).
    */
  def rfmSegments(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val per = events
      .groupBy(col(userCol))
      .agg(
        max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("frequency"),
        round(sum(col(valueCol).cast("decimal(27,6)")).cast("double"), 6).as("monetary"))
      .crossJoin(broadcast(events.agg(max(col(tsCol)).as("anchor"))))
      .withColumn("recency_days", datediff(col("anchor"), col("last_ts")))
      // micro-units keep the monetary percentile on the integer side:
      // dyadic quantiles (0.25/0.5/0.75) of integers are IEEE-exact
      // under every interpolation arrangement, so both engines land
      // on the same cutpoint bit for bit
      .withColumn("monetary_u", round(col("monetary") * 1e6, 0).cast("long"))
      .select(col(userCol), col("recency_days"), col("frequency"), col("monetary"), col("monetary_u"))
    val cuts = per.agg(
      expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("rc"),
      expr("percentile(frequency,    array(0.25, 0.5, 0.75))").as("fc"),
      expr("percentile(monetary_u,   array(0.25, 0.5, 0.75))").as("mc"))
    // tile 1 = best: for ascending-is-worse metrics count cutpoints
    // passed going up; for descending-is-worse count going down
    def tileAsc(v: Column, c: Column): Column =
      lit(1) + (v > element_at(c, 1)).cast("int") + (v > element_at(c, 2)).cast("int") + (v > element_at(c, 3)).cast("int")
    def tileDesc(v: Column, c: Column): Column =
      lit(1) + (v < element_at(c, 3)).cast("int") + (v < element_at(c, 2)).cast("int") + (v < element_at(c, 1)).cast("int")
    per
      .crossJoin(broadcast(cuts))
      .withColumn("r_tile", tileAsc(col("recency_days").cast("double"), col("rc")))
      .withColumn("f_tile", tileDesc(col("frequency").cast("double"), col("fc")))
      .withColumn("m_tile", tileDesc(col("monetary_u").cast("double"), col("mc")))
      .withColumn("segment", concat_ws("", col("r_tile"), col("f_tile"), col("m_tile")))
      .select(
        col(userCol), col("recency_days"), col("frequency"), col("monetary"),
        col("r_tile"), col("f_tile"), col("m_tile"), col("segment"))
  }

  /** Burst-day detection: flag (event_type, day) buckets whose count
    * exceeds `factor` × that type's median daily count — the
    * integer-robust anomaly cut (a stddev z-score needs
    * order-sensitive float sums of squares; a median of integer
    * counts replays exactly). Daily buckets use the same
    * engine-matched integral division as the other epoch-day ops
    * here (truncating on both engines — see rollingActiveUsers).
    * Per-type medians are a tiny aggregate broadcast back over the
    * daily counts.
    *
    * Output: (event_type, day_start, n_events, median_daily, burst).
    */
  def burstDays(
      events: DataFrame,
      typeCol: String,
      tsCol: String,
      factor: Double = 3.0): DataFrame = {
    val day = expr(s"unix_micros($tsCol) div 86400000000L")
    val daily = events
      .groupBy(col(typeCol), day.as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily
      .groupBy(col(typeCol))
      .agg(round(expr("percentile(n_events, 0.5)"), 6).as("median_daily"))
    daily
      .join(broadcast(med), Seq(typeCol))
      .withColumn("day_start", timestamp_micros(col("day") * lit(86400000000L)))
      .withColumn("burst", col("n_events").cast("double") > lit(factor) * col("median_daily"))
      .select(col(typeCol), col("day_start"), col("n_events"), col("median_daily"), col("burst"))
  }

  /** Carried state for [[transitionsStream]]: the last event seen per
    * user (event-time micros, id tiebreak, type).
    */
  final case class LastEvent(ts_us: Long, event_id: Long, event_type: String)

  /** One emitted transition edge. */
  final case class TransitionEdge(user_id: Long, prev_type: String, next_type: String)

  /** Streaming twin of [[eventTransitions]]: emit (prev → next)
    * transition edges as events arrive, INCLUDING the edge that spans
    * a trigger boundary — the one a per-batch lag window structurally
    * cannot see. State per user is exactly one event (the last seen);
    * with `idleTimeoutMs > 0` idle users evict on the processing-time
    * clock (same opt-in pattern as runningMajority), otherwise state
    * is one entry per user ever seen.
    *
    * Ordering: events inside a trigger sort by (event time, id), so
    * a single-trigger replay equals the batch operator; an event that
    * arrives in a LATER trigger but is event-time OLDER than the
    * stored last event is DROPPED (emitting from it would fabricate a
    * time-reversed edge and corrupt the matrix) — the standard
    * late-data trade, since the already-emitted edge cannot be
    * retracted in append mode.
    */
  def transitionsStream(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      idleTimeoutMs: Long = 0L): Dataset[TransitionEdge] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(
        col(userCol).cast("long"),
        unix_micros(col(tsCol)),
        col(idCol).cast("long"),
        col(typeCol).cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, TransitionEdge](
        OutputMode.Append, timeoutConf) {
        (user: Long, it: Iterator[(Long, Long, Long, String)], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e._2, e._3))
            val out    = scala.collection.mutable.ArrayBuffer.empty[TransitionEdge]
            var prev   = state.getOption
            sorted.foreach { e =>
              val isLate =
                prev.exists(p => p.ts_us > e._2 || (p.ts_us == e._2 && p.event_id >= e._3))
              if (!isLate) {
                prev.foreach(p => out += TransitionEdge(user, p.event_type, e._4))
                prev = Some(LastEvent(e._2, e._3, e._4))
              }
            }
            prev.foreach(state.update)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  /** First-order Markov transition matrix of event types: within
    * each user's time-ordered stream, count (previous type → type)
    * transitions and normalize per source state — the behavioral
    * fingerprint card (which action follows which) and the input to
    * next-event prediction baselines.
    *
    * Scale shape: ONE window shuffle keyed by user (the same key
    * sessionization uses — at 1000 executors each user's stream
    * sorts locally within its partition), then a |types|²-sized
    * aggregation and a per-source-state window over those cells.
    * Deterministic tie order inside a timestamp via the id column.
    *
    * Output: (prev_type, next_type, n, p) — p = n / Σ_next n.
    */
  def eventTransitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val cells = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(
        col("prev_type"),
        col("next_type"),
        col("n").cast("bigint").as("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
  }
}
