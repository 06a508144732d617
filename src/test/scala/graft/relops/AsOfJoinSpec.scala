package graft.relops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq( // right: (sym, qts, px)
    ("A", ts("2026-01-01 00:00:10"), 10.0),
    ("A", ts("2026-01-01 00:00:20"), 20.0),
    ("B", ts("2026-01-01 00:00:15"), 99.0))
    .toDF("sym", "qts", "px")

  private val trades = Seq( // left: (trade_id, sym, tts)
    (1L, "A", ts("2026-01-01 00:00:05")), // before any quote → null
    (2L, "A", ts("2026-01-01 00:00:10")), // tie with quote ts → inclusive
    (3L, "A", ts("2026-01-01 00:00:15")), // between quotes → 10.0
    (4L, "A", ts("2026-01-01 00:00:59")), // after all → 20.0
    (5L, "B", ts("2026-01-01 00:00:30")), // other key → B's quote only
    (6L, "C", ts("2026-01-01 00:00:30"))) // key with no right rows
    .toDF("trade_id", "sym", "tts")

  test("asof: inclusive ties, nulls before first right row, per-key isolation") {
    val got = AsOfJoin
      .asof(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
      .orderBy(col("trade_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, null), (2L, 10.0), (3L, 10.0), (4L, 20.0), (5L, 99.0), (6L, null)))
  }

  test("asof preserves every left row and all left columns") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "tts", "qts", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("trade_id", "sym", "tts", "px"))
  }

  test("asof rejects colliding payload column names") {
    val bad = quotes.withColumnRenamed("px", "tts2").withColumnRenamed("tts2", "trade_id")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(trades, bad, Seq("sym"), "tts", "qts", Seq("trade_id"))
    }
  }
}
