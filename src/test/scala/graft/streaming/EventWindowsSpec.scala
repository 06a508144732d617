package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val eventsDf = Seq(
    (ts("2026-01-01 00:10:00"), "click", 1.5),
    (ts("2026-01-01 00:50:00"), "click", 2.5),
    (ts("2026-01-01 00:20:00"), "view", 10.0),
    (ts("2026-01-01 01:05:00"), "click", 4.0))
    .toDF("ts", "event_type", "value")

  test("tumblingStats buckets by epoch-aligned windows with exact decimal sums") {
    val got = EventWindows
      .tumblingStats(eventsDf, "ts", "event_type", "value", windowLen = "1 hour")
      .select(
        date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("w"), col("event_type"))
    assert(rows(got) == Seq(
      Seq("00:00", "click", 2L, 4.0),
      Seq("00:00", "view", 1L, 10.0),
      Seq("01:00", "click", 1L, 4.0)))
  }

  test("window_end = window_start + length") {
    val got = EventWindows
      .tumblingStats(eventsDf, "ts", "event_type", "value", windowLen = "1 hour")
      .filter(unix_micros(col("window_end")) - unix_micros(col("window_start")) =!= 3600000000L)
    assert(got.count() == 0)
  }

  test("streamingTumblingStats is a valid watermarked streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = EventWindows.streamingTumblingStats(
      in.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", windowLen = "1 hour", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    in.addData(
      (ts("2026-01-01 00:10:00"), "click", 1.0),
      (ts("2026-01-01 00:40:00"), "click", 2.0),
      (ts("2026-01-01 02:00:00"), "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("win_out")
    assert(got.count() == 2)
    assert(got.filter(col("event_type") === "click").head.getAs[Long]("n_events") == 2L)
  }

  test("funnel: strict ordering, drop-off per stage, out-of-order events don't count") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1 completes all three in order
      (1L, ts("2026-01-01 00:00:00"), "signup"),
      (2L, ts("2026-01-01 01:00:00"), "click"),
      (3L, ts("2026-01-01 02:00:00"), "purchase"),
      // u2 clicks BEFORE signing up — click must not count; no purchase
      (4L, ts("2026-01-01 00:30:00"), "click"),
      (5L, ts("2026-01-01 01:30:00"), "signup"),
      // u3 signs up only
      (6L, ts("2026-01-01 00:00:00"), "signup"),
      // u4 purchases without ever signing up — enters no stage
      (7L, ts("2026-01-01 00:00:00"), "purchase"))
      .zipWithIndex
      .map { case ((id, t, et), i) => (id, Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L)(i), t, et) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventWindows
      .funnel(events, "user_id", "event_type", "ts", Seq("signup", "click", "purchase"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1, "signup", 3L, 1.0, 1.0),
      (2, "click", 1L, 0.333333, 0.333333),
      (3, "purchase", 1L, 0.333333, 1.0)))
  }

  test("cohortRetention: cohorts by first epoch-week, per-offset active fractions") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // epoch weeks: 1970-01-01 is week 0 (Thu-anchored buckets); use
    // relative spacing only — a & b first seen week W, b returns W+1;
    // c first seen W+1
    val events = Seq(
      (1L, ts("2026-01-01 00:00:00")), // a, week W
      (1L, ts("2026-01-01 05:00:00")), // a again same week (distinct collapses)
      (2L, ts("2026-01-02 00:00:00")), // b, week W
      (2L, ts("2026-01-09 00:00:00")), // b, week W+1
      (3L, ts("2026-01-09 01:00:00"))) // c, week W+1
      .toDF("user_id", "ts")
    val got = EventWindows.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))) // drop abs cohort id
    assert(got.toSeq == Seq(
      (0, 2L, 2L, 1.0),   // cohort W: both active at offset 0
      (1, 1L, 2L, 0.5),   // cohort W: only b at offset 1
      (0, 1L, 1L, 1.0)))  // cohort W+1: c
  }

  test("nearbyEventStats finds neighbors across bucket boundaries, not beyond the window") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // anchor at 00:01:59 — bucket 1 (60s bins)
      (1L, 7L, ts("2026-01-01 00:01:59"), "purchase", 10.0),
      (2L, 7L, ts("2026-01-01 00:02:30"), "click", 1.0),  // +31s, bucket 2 → neighbor
      (3L, 7L, ts("2026-01-01 00:01:10"), "view", 2.0),   // −49s, bucket 1 → neighbor
      (4L, 7L, ts("2026-01-01 00:03:05"), "click", 4.0),  // +66s → outside window
      (5L, 9L, ts("2026-01-01 00:02:00"), "click", 8.0),  // other user → excluded
      (6L, 9L, ts("2026-01-01 05:00:00"), "purchase", 3.0) // isolated anchor
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventWindows
      .nearbyEventStats(events, "event_id", "user_id", "ts", "value",
        anchorPred = col("event_type") === "purchase", windowSec = 60)
      .orderBy("event_id").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1L && got(0).getAs[Int]("n_nearby") == 2)
    assert(got(0).getAs[Double]("sum_nearby_value") == 3.0)
    assert(got(1).getLong(0) == 6L && got(1).getAs[Int]("n_nearby") == 0)
    assert(got(1).getAs[Double]("sum_nearby_value") == 0.0)
  }

  test("eventTransitions: per-user ordered lag, per-source-state normalization") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1: a -> b -> a       user 2: a -> c
      (1L, 1L, ts("2026-01-01 00:00:01"), "a"),
      (2L, 1L, ts("2026-01-01 00:00:02"), "b"),
      (3L, 1L, ts("2026-01-01 00:00:03"), "a"),
      (4L, 2L, ts("2026-01-01 00:00:01"), "a"),
      (5L, 2L, ts("2026-01-01 00:00:02"), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventWindows.eventTransitions(events, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)),
      ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("transitionsStream emits the trigger-spanning edge a per-batch lag cannot see") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val edges = EventWindows.transitionsStream(
      in.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type")
    val q = edges.writeStream.outputMode("append").format("memory").queryName("trans_out").start()
    // trigger 1: user 1 does a then b (out of arrival order — event
    // time must win inside the batch)
    in.addData((1L, ts("2026-01-01 00:00:02"), 2L, "b"), (1L, ts("2026-01-01 00:00:01"), 1L, "a"))
    q.processAllAvailable()
    // trigger 2: user 1 does c — the b->c edge spans the trigger
    in.addData((1L, ts("2026-01-01 00:00:03"), 3L, "c"))
    q.processAllAvailable()
    // trigger 3: a LATE event (event-time before the stored last)
    // must be DROPPED — emitting would fabricate a time-reversed
    // c->z edge and regress the state
    in.addData((1L, ts("2026-01-01 00:00:00"), 0L, "z"))
    q.processAllAvailable()
    // trigger 4: state must still be c, not z
    in.addData((1L, ts("2026-01-01 00:00:04"), 4L, "d"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_out").collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", "b"), ("b", "c"), ("c", "d")), s"got $got")
  }
}
