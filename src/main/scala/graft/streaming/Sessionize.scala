package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream or table.
  *
  * Training-data pipelines sessionize interaction logs before
  * converting them into examples; the reference has no event
  * analytics (SURVEY §2.9), so this is a north-star operator built
  * on Spark primitives only.
  *
  * Batch path: a per-user window — `lag` marks a session boundary
  * whenever the gap to the previous event exceeds `gapSeconds`, a
  * running sum of boundary flags numbers the sessions. One shuffle
  * on the user key; WindowExec processes each user's events in ts
  * order. At 100 TB the shuffle is the unavoidable co-location of a
  * user's events; no global sort, no driver state.
  *
  * Streaming path: the built-in `session_window` grouping — state
  * is per (user, open session) and evicted by the watermark.
  *
  * Deterministic: ties broken by the event id everywhere.
  */
object Sessionize {

  /** Per-event session assignment: adds `session_idx` (1-based per
    * user, in time order). Both windows partition directly on the
    * user column (an intermediate alias would hide the partitioning
    * from downstream operators and force a second exchange — the
    * per-session aggregate reuses this one shuffle).
    */
  def assignSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame = {
    val w      = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    val boundary =
      when(prevUs.isNull || unix_micros(col(tsCol)) - prevUs > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("__new_sess", boundary)
      .withColumn("session_idx", sum(col("__new_sess")).over(w).cast("int"))
      .drop("__new_sess")
  }

  /** Per-session aggregate: (user, session_idx, n_events, start/end,
    * duration_sec).
    */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame =
    assignSessions(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"))
      .withColumn(
        "duration_sec",
        expr("(unix_micros(end_ts) - unix_micros(start_ts)) div 1000000"))

  /** Streaming equivalent: session event counts via the built-in
    * session_window; watermark bounds the open-session state store.
    * Valid on a streaming DF (append/update mode after watermark).
    */
  def streamingSessionCounts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gap: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("start_ts"),
        col("session_window.end").as("end_ts"),
        col("n_events"))
}
