package graft

import java.sql.Timestamp

import graft.operators.Feedback

class FeedbackSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // four identical two-slot result pages: item 100 always at position 1,
  // item 200 always at position 2; 100 clicked twice, 200 once; user 6
  // scrolls 12 deep (tests the maxPos cap); user 5 clicks without a view
  // (log anomaly → dropped); user 1 re-views item 100 (one impression,
  // first position wins)
  private def log() = {
    var eid = 0L
    def ev(uid: Long, t: String, typ: String, item: Long) = {
      eid += 1
      (uid, ts(t), eid, typ, s"""{"k": $item}""")
    }
    (Seq(
      ev(1L, "2024-01-01 10:00:00", "view", 100),
      ev(1L, "2024-01-01 10:01:00", "view", 200),
      ev(1L, "2024-01-01 10:02:00", "click", 100),
      ev(1L, "2024-01-01 10:03:00", "view", 100), // dup view, same session
      ev(2L, "2024-01-01 10:00:00", "view", 100),
      ev(2L, "2024-01-01 10:01:00", "view", 200),
      ev(2L, "2024-01-01 10:02:00", "click", 100),
      ev(3L, "2024-01-01 10:00:00", "view", 100),
      ev(3L, "2024-01-01 10:01:00", "view", 200),
      ev(3L, "2024-01-01 10:02:00", "click", 200),
      ev(4L, "2024-01-01 10:00:00", "view", 100),
      ev(4L, "2024-01-01 10:01:00", "view", 200),
      ev(5L, "2024-01-01 10:00:00", "click", 300)) ++
      (1 to 12).map(i =>
        ev(6L, f"2024-01-01 10:$i%02d:00", "view", 300L + i)))
      .toDF("user_id", "ts", "event_id", "event_type", "props")
  }

  test("positionBias: raw examination curve with the maxPos cap") {
    val got = Feedback.positionBias(log()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // pos 1: items 100 (users 1-4) + user 6's first → 5 views, 2 clicks
    assert(got(1L) == ((5L, 2L, 0.4)), s"pos1: ${got(1L)}")
    // pos 2: items 200 (users 1-4) + user 6's second → 5 views, 1 click
    assert(got(2L) == ((5L, 1L, 0.2)), s"pos2: ${got(2L)}")
    // user 6 depths 3..9 are singleton views; 10, 11, 12 cap to 10
    (3L to 9L).foreach(p => assert(got(p) == ((1L, 0L, 0.0))))
    assert(got(10L) == ((3L, 0L, 0.0)), s"cap bucket: ${got(10L)}")
    assert(!got.contains(11L) && !got.contains(12L))
  }

  test("clickModel: IPS equalizes items whose CTR gap is pure position") {
    val got = Feedback.clickModel(log()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // item 100 (always slot 1): CTR 0.5; item 200 (always slot 2): 0.25
    val (imp100, clk100, ctr100, rel100) = got(100L)
    val (imp200, clk200, ctr200, rel200) = got(200L)
    assert((imp100, clk100, ctr100) == ((4L, 2L, 0.5)))
    assert((imp200, clk200, ctr200) == ((4L, 1L, 0.25)))
    // the 2× raw-CTR gap is EXACTLY the examination gap (w1 = 5e6/2,
    // w2 = 5e6), so the debiased relevances agree: 2·2.5e6 = 1·5e6 →
    // rel_grid 5e6, rel = 5e6 DIV (100·4) / 1e4 = 1.25 for both
    assert(rel100 == 1.25 && rel200 == 1.25,
      s"IPS must equalize: $rel100 vs $rel200")
    // click with no view of its item never becomes an impression
    assert(!got.contains(300L), "view-less click must drop")
    // user 6's deep singleton views: zero clicks, zero estimates
    assert(got(301L) == ((1L, 0L, 0.0, 0.0)))
  }

  test("prefPairs: mines the pair a raw-CTR pairer gets backwards") {
    // the planted confound: item 100 sits at slot 1 with raw CTR 0.5,
    // item 200 at slot 2 with raw CTR 0.25 — raw CTR prefers 100. But
    // slot 1's log-wide examination rate is dragged high by item 300
    // (4/4 clicks at slot 1) while slot 2's is dragged low by item 400
    // (0/4 at slot 2): w1 = 8e6 DIV 6 = 1333333, w2 = 8e6 DIV 1 = 8e6,
    // so IPS rel(100) = 2·1333333 DIV 400 / 1e4 = 0.6666 and
    // rel(200) = 1·8e6 DIV 400 / 1e4 = 2.0 — the debiased order FLIPS.
    var eid = 0L
    def ev(uid: Long, t: String, typ: String, item: Long) = {
      eid += 1
      (uid, ts(t), eid, typ, s"""{"k": $item}""")
    }
    def page(uid: Long, a: Long, b: Long, click: Option[Long]) = Seq(
      ev(uid, "2024-01-01 10:00:00", "view", a),
      ev(uid, "2024-01-01 10:01:00", "view", b)) ++
      click.map(c => ev(uid, "2024-01-01 10:02:00", "click", c))
    val events = (
      page(1L, 100, 200, Some(100)) ++ page(2L, 100, 200, Some(100)) ++
        page(3L, 100, 200, Some(200)) ++ page(4L, 100, 200, None) ++
        (5L to 8L).flatMap(u => page(u, 300, 400, Some(300))))
      .toDF("user_id", "ts", "event_id", "event_type", "props")
    val got = Feedback.prefPairs(events).collect()
    // exactly ONE pair: user 3 clicked 200 with 100 skipped above it.
    // Users 1/2 clicked the TOP slot (nothing skipped above), the
    // 300-click sessions skip nothing above slot 1.
    assert(got.length == 1, got.mkString("; "))
    val r = got.head
    assert(r.getLong(0) == 200L && r.getLong(1) == 100L) // winner, loser
    assert(r.getLong(2) == 1L)                           // session support
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 0.6666,
      s"IPS rel: ${r.getDouble(3)} vs ${r.getDouble(4)}")
    assert(r.getDouble(5) == 0.25 && r.getDouble(6) == 0.5)
    // the flag: raw position-confounded CTR orders this pair BACKWARDS
    assert(r.getBoolean(7), "ctr_flipped must mark the confounded pair")
    assert(r.getDouble(6) > r.getDouble(5),
      "sanity: a raw-CTR pairer would have emitted (100, 200)")
    // the margin gate: demand more than the planted 1.3334 rel gap
    assert(Feedback.prefPairs(events, marginGrid = 14000L).isEmpty)
  }
}
