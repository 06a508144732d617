package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // user 1: two sessions (gap 2h > 1h); user 2: one session
  private val eventsDf = Seq(
    (1L, 10L, ts("2026-01-01 00:00:00")),
    (2L, 10L, ts("2026-01-01 00:30:00")),
    (3L, 10L, ts("2026-01-01 02:30:00")),
    (4L, 20L, ts("2026-01-01 05:00:00")))
    .toDF("event_id", "user_id", "ts")

  test("assignSessions splits on gaps > gapSeconds, numbers from 1") {
    val got = Sessionize
      .assignSessions(eventsDf, "user_id", "ts", "event_id", gapSeconds = 3600L)
      .select(col("event_id"), col("session_idx"))
    assert(rows(got.orderBy(col("event_id"))) == Seq(Seq(1L, 1), Seq(2L, 1), Seq(3L, 2), Seq(4L, 1)))
  }

  test("sessionStats aggregates per session with exact durations") {
    val got = Sessionize
      .sessionStats(eventsDf, "user_id", "ts", "event_id", gapSeconds = 3600L)
      .orderBy(col("user_id"), col("session_idx"))
      .select(col("user_id"), col("session_idx"), col("n_events"), col("duration_sec"))
    assert(rows(got) == Seq(Seq(10L, 1, 2L, 1800L), Seq(10L, 2, 1L, 0L), Seq(20L, 1, 1L, 0L)))
  }

  test("streamingSessionCounts is a valid watermarked streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = Sessionize.streamingSessionCounts(
      in.toDF().toDF("user_id", "ts"), "user_id", "ts", gap = "30 minutes", watermark = "1 minute")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("sess_out").start()
    in.addData((10L, ts("2026-01-01 00:00:00")), (10L, ts("2026-01-01 00:10:00")), (10L, ts("2026-01-01 03:00:00")))
    q.processAllAvailable()
    q.stop()
    // two sessions for user 10: [00:00,00:10] (2 events) and [03:00] (1)
    val got = spark.table("sess_out")
    assert(got.count() == 2)
    assert(got.agg(sum("n_events")).head.getLong(0) == 3L)
  }
}
