package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L) // no prior right row
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 900L),
      (1L, ts("2024-01-01 10:00:00"), 901L), // same instant as left 100
      (1L, ts("2024-01-01 11:59:00"), 902L),
      (2L, ts("2024-01-01 09:30:00"), 903L)  // after left 102
    ).toDF("user_id", "ts", "click_event_id")

    val got = AsOf.join(left, right, "user_id", "ts",
        tie = "click_event_id", rightVals = Seq("click_event_id"))
      .select($"event_id", $"click_event_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got(100L) == 901L) // <= semantics: same-ts right row wins
    assert(got(101L) == 902L)
    assert(got(102L) == -1L)  // left outer: no prior right → null
  }

  test("range join: window bounds are [ts-window, ts) across bin edges") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L),  // exactly -60m → included
      (1L, ts("2024-01-01 08:59:59"), 11L),  // just outside
      (1L, ts("2024-01-01 09:59:59"), 12L),  // inside, same bin
      (1L, ts("2024-01-01 09:01:00"), 13L),  // inside, previous bin
      (1L, ts("2024-01-01 10:00:00"), 14L),  // == left ts → excluded
      (2L, ts("2024-01-01 09:30:00"), 15L)   // other key
    ).toDF("user_id", "ts", "event_id")
    val got = operators.RangeJoin.countTrailing(left, right, "user_id", 60)
      .select($"n_recent").head().getLong(0)
    assert(got == 3L)
  }

  test("ties among right rows at one instant resolve to highest tie column") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L),
      (1L, ts("2024-01-01 09:00:00"), 11L)
    ).toDF("user_id", "ts", "click_event_id")
    val got = AsOf.join(left, right, "user_id", "ts",
        "click_event_id", Seq("click_event_id"))
      .select($"click_event_id").head().getLong(0)
    assert(got == 11L)
  }
}
