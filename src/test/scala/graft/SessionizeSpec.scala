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
