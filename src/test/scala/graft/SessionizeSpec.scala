package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap strictly greater than 30 minutes starts a new session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, 1.0), // exactly 30m → same session
      (1L, ts("2024-01-01 11:00:00.000001"), 3L, 1.0), // 30m + 1µs → new
      (2L, ts("2024-01-01 10:00:00"), 4L, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val sessions = Sessionize.sessions(events).collect()
    assert(sessions.length == 3)
    val u1 = sessions.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(4)).toSeq == Seq(2L, 1L)) // n_events per session
  }

  test("sessionStats: capped length buckets with shares and cumulative") {
    // user 1: a 3-event session, then (31-min gap) a 1-event session;
    // user 2: a 25-event marathon -> the capped 20 bucket
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2L, 1.0),
      (1L, ts("2024-01-01 10:10:00"), 3L, 1.0),
      (1L, ts("2024-01-01 11:00:00"), 4L, 1.0)) ++
      (1 to 25).map(i =>
        (2L, ts(f"2024-01-01 10:${i % 60}%02d:00"), 100L + i, 1.0))
    val events = rows.toDF("user_id", "ts", "event_id", "value")
    val got = Sessionize.sessionStats(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    def g(n: Long, d: Long) = (n * 1000000L / d).toDouble / 1e6
    assert(got == Map(
      1L -> ((1L, g(1, 3), g(1, 3))),
      3L -> ((1L, g(1, 3), g(2, 3))),
      20L -> ((1L, g(1, 3), g(3, 3)))), s"got $got")
  }

  test("paths: ordered session journeys, shared across users, truncated at maxLen") {
    // users 1 and 2 walk the same 3-step journey; user 1 opens a SECOND
    // session (31-min gap) of one step; user 3 walks 10 steps → cut at 8
    // with the marker so it can never alias an exact 8-step path
    def ev(uid: Long, t: String, eid: Long, typ: String) =
      (uid, ts(t), eid, typ)
    val events = (Seq(
      ev(1L, "2024-01-01 10:00:00", 1L, "view"),
      ev(1L, "2024-01-01 10:01:00", 2L, "click"),
      ev(1L, "2024-01-01 10:02:00", 3L, "purchase"),
      ev(1L, "2024-01-01 11:00:00", 4L, "view"), // 58m gap → new session
      ev(2L, "2024-01-01 09:00:00", 5L, "view"),
      ev(2L, "2024-01-01 09:10:00", 6L, "click"),
      ev(2L, "2024-01-01 09:20:00", 7L, "purchase")) ++
      (1 to 10).map(i =>
        ev(3L, f"2024-01-01 12:00:$i%02d", 100L + i, s"s$i")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.paths(events, maxLen = 8, k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("view > click > purchase") == 2L)
    assert(got("view") == 1L)
    assert(got("s1 > s2 > s3 > s4 > s5 > s6 > s7 > s8 > ...") == 1L)
    assert(got.size == 3, s"paths: ${got.keySet}")
    // maxLen exactly the session length: NO marker
    val exact = Sessionize.paths(events, maxLen = 10, k = 20)
      .collect().map(_.getString(0)).toSet
    assert(exact.contains("s1 > s2 > s3 > s4 > s5 > s6 > s7 > s8 > s9 > s10"))
  }

  test("pathConversion: whole-session outcome, truncated label still counts") {
    def ev(uid: Long, t: String, eid: Long, typ: String) =
      (uid, ts(t), eid, typ)
    // user 3's purchase sits at step 10 — PAST the maxLen-8 label cut —
    // and must still mark the truncated journey as converted
    val events = (Seq(
      ev(1L, "2024-01-01 10:00:00", 1L, "view"),
      ev(1L, "2024-01-01 10:01:00", 2L, "click"),
      ev(1L, "2024-01-01 10:02:00", 3L, "purchase"),
      ev(2L, "2024-01-01 09:00:00", 4L, "view"),
      ev(2L, "2024-01-01 09:10:00", 5L, "click"),
      ev(2L, "2024-01-01 09:20:00", 6L, "error"),
      ev(4L, "2024-01-01 08:00:00", 7L, "view")) ++
      ((1 to 9).map(i =>
        ev(3L, f"2024-01-01 12:00:$i%02d", 100L + i, s"s$i")) :+
        ev(3L, "2024-01-01 12:00:10", 110L, "purchase")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.pathConversion(events, maxLen = 8, k = 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("view > click > purchase") == (1L, 1L, 1.0))
    assert(got("view > click > error") == (1L, 0L, 0.0))
    assert(got("view") == (1L, 0L, 0.0))
    // the cut journey: label truncated at 8 steps, outcome from step 10
    assert(got("s1 > s2 > s3 > s4 > s5 > s6 > s7 > s8 > ...") == (1L, 1L, 1.0),
      s"got ${got.keySet}")
  }

  test("lastN keeps exactly the most recent N per key") {
    val events = (1 to 12).map(i =>
      (1L, ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val kept = Sessionize.lastN(events, 5).select($"event_id")
      .as[Long].collect().toSet
    assert(kept == Set(8L, 9L, 10L, 11L, 12L))
  }

  test("session ids are dense and ordered per user") {
    val t = sources.Tables(spark, sfDir)
    val s = Sessionize.sessions(t.events)
    val perUser = s.groupBy($"user_id")
      .agg(min($"session_idx").as("mn"), max($"session_idx").as("mx"),
        count(lit(1)).as("n"))
    val bad = perUser.filter($"mn" =!= 0 || $"mx" =!= $"n" - 1).count()
    assert(bad == 0)
  }

  test("trailing-24h RANGE frame: boundary inclusive, same-second peers") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, ts("2024-01-02 00:00:00"), 2L, 2.0),  // exactly 24h later → IN frame
      (1L, ts("2024-01-02 00:00:01"), 3L, 4.0),  // 24h+1s after e1 → e1 out
      // same-second PEERS: each sees the other regardless of order
      (2L, ts("2024-01-01 12:00:00"), 4L, 1.0),
      (2L, ts("2024-01-01 12:00:00"), 5L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = operators.Relational.trailingDaily(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == (1L, 1.0))
    assert(got(2L) == (2L, 3.0), s"24h boundary must be inclusive: ${got(2L)}")
    assert(got(3L) == (2L, 6.0), s"e1 must age out: ${got(3L)}")
    assert(got(4L) == (2L, 3.0) && got(5L) == (2L, 3.0),
      s"same-second events are peers: ${got(4L)} ${got(5L)}")
  }

  test("gap fill: contiguous hourly grid, zeros only where no events") {
    val t = sources.Tables(spark, sfDir)
    val gf = operators.Relational.gapFillHourly(t, maxUserId = 10).collect()
    assert(gf.nonEmpty)
    // per user the grid is strictly consecutive hours, no holes
    gf.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val hours = rows.map(_.getTimestamp(1).getTime).sorted
      assert(hours.zip(hours.tail).forall { case (a, b) =>
        b - a == 3600 * 1000L }, s"user $u grid has holes")
    }
    // non-zero rows are exactly the plain hourly aggregate; the rest fill
    val nonzero = gf.count(_.getLong(2) > 0)
    val plain = t.events.filter($"user_id" < 10)
      .groupBy($"user_id", date_trunc("hour", $"ts")).count().count()
    assert(nonzero == plain)
    assert(gf.exists(_.getLong(2) == 0), "expected at least one filled gap")
  }
}
