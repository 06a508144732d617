package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
