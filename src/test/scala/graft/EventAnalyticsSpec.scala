package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Sessionize}
import graft.sources.Tables

/** Pins the subtle window/join semantics of the event-analytics family:
  * funnel stage chaining (strictly-after, zero-stage rows), attribution's
  * lookback boundary and tie-breaks, retention's cohort arithmetic. */
class EventAnalyticsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, String, Long, Double)*): DataFrame = {
    val sess = spark
    import sess.implicits._
    rows.toSeq
      .map { case (uid, typ, t, eid, v) => (eid, ts(t), uid, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  // --- active users ---

  test("activeUsers: DAU, trailing-7-day WAU, stickiness") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "view", "2024-01-01 11:00:00", 2L, 0.0), // same user+day: once
      (2L, "view", "2024-01-01 12:00:00", 3L, 0.0),
      (1L, "view", "2024-01-02 10:00:00", 4L, 0.0),
      (3L, "view", "2024-01-09 10:00:00", 5L, 0.0)) // beyond day-2's reach
    val got = graft.operators.EventAnalytics.activeUsers(ev)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // day 1: users {1,2}; window [dec 26, jan 1] sees only them
    assert(got("2024-01-01") == (2L, 2L, 1.0))
    // day 2: DAU {1}; trailing window still holds {1,2}
    assert(got("2024-01-02") == (1L, 2L, 0.5))
    // day 9: windows from days 1-2 reach at most day 8 — only user 3
    assert(got("2024-01-09") == (1L, 1L, 1.0))
    // no rows for silent days (the inner join against DAU)
    assert(got.size == 3, s"days: ${got.keySet}")
    // windowDays = 1 degenerates to DAU == WAU everywhere
    graft.operators.EventAnalytics.activeUsers(ev, windowDays = 1)
      .collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  // --- funnel ---

  test("funnel counts strictly-ordered stage reaches") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "click", "2024-01-01 11:00:00", 2L, 0.0),
      (1L, "purchase", "2024-01-01 12:00:00", 3L, 5.0),
      // user 2 clicks BEFORE viewing: reaches view, not click
      (2L, "click", "2024-01-01 09:00:00", 4L, 0.0),
      (2L, "view", "2024-01-01 10:00:00", 5L, 0.0))
    val out = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "view", 2L), (2L, "click", 1L),
      (3L, "purchase", 1L)))
  }

  test("funnel emits n_users=0 rows for stages nobody reaches") {
    val ev = events((1L, "view", "2024-01-01 10:00:00", 1L, 0.0))
    val out = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(("view", 1L, 1.0), ("click", 0L, 0.0),
      ("purchase", 0L, 0.0)))
  }

  test("funnel with an empty stage 1 emits 0.0 conversions, never NaN") {
    val ev = events((1L, "click", "2024-01-01 10:00:00", 1L, 0.0))
    val out = EventAnalytics.funnel(ev, Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(("view", 0L, 0.0), ("click", 0L, 0.0)))
  }

  test("funnel same-timestamp event does NOT advance a stage (strictly after)") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "click", "2024-01-01 10:00:00", 2L, 0.0))
    val out = EventAnalytics.funnel(ev, Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("view", 1L), ("click", 0L)))
  }

  test("windowed funnel drops steps outside the gap; boundary is inside") {
    val ev = events(
      // user 1: click exactly 24h after view — boundary is INSIDE
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "click", "2024-01-02 10:00:00", 2L, 0.0),
      // user 2: click one second past the gap — dropped
      (2L, "view", "2024-01-01 10:00:00", 3L, 0.0),
      (2L, "click", "2024-01-02 10:00:01", 4L, 0.0))
    val out = EventAnalytics.funnel(ev, Seq("view", "click"),
        maxGapHours = 24).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("view", 2L), ("click", 1L)))
  }

  // --- attribution ---

  test("attribution credits the last touch inside the window") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "click", "2024-01-02 10:00:00", 2L, 0.0),
      (1L, "purchase", "2024-01-03 10:00:00", 3L, 10.0))
    val out = EventAnalytics.attribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("click", 1L, 10.0)))
  }

  test("attribution window boundary: touch exactly windowDays old still counts") {
    val ev = events(
      // touch exactly 7 days (to the second) before the conversion: the
      // contract is ts <= touch_ts + 7 days, so the boundary is INSIDE
      (1L, "click", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "purchase", "2024-01-08 10:00:00", 2L, 3.0),
      // one second past the boundary: falls to "none"
      (2L, "click", "2024-01-01 10:00:00", 3L, 0.0),
      (2L, "purchase", "2024-01-08 10:00:01", 4L, 4.0))
    val out = EventAnalytics.attribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("click", 1L, 3.0), ("none", 1L, 4.0)))
  }

  test("attribution with no prior touch lands in the none bucket") {
    val ev = events(
      (1L, "purchase", "2024-01-03 10:00:00", 1L, 7.0),
      // later touch must NOT be credited (frame ends 1 row before)
      (1L, "view", "2024-01-04 10:00:00", 2L, 0.0))
    val out = EventAnalytics.attribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("none", 1L, 7.0)))
  }

  test("attribution same-second touches tie-break by event_id") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 5L, 0.0),
      (1L, "click", "2024-01-01 10:00:00", 6L, 0.0), // higher id wins
      (1L, "purchase", "2024-01-01 11:00:00", 7L, 2.0),
      (2L, "click", "2024-01-01 10:00:00", 9L, 0.0), // higher id wins
      (2L, "view", "2024-01-01 10:00:00", 8L, 0.0),
      (2L, "purchase", "2024-01-01 11:00:00", 10L, 4.0))
    val out = EventAnalytics.attribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("click", 2L, 6.0)))
  }

  // --- retention ---

  test("retention cohorts by first-seen day with exact fractions") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "view", "2024-01-02 10:00:00", 2L, 0.0),
      (2L, "view", "2024-01-01 09:00:00", 3L, 0.0),
      (3L, "view", "2024-01-02 09:00:00", 4L, 0.0))
    val out = EventAnalytics.retention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5),
      ("2024-01-02", 0L, 1L, 1L, 1.0)))
  }

  test("retention drops offsets beyond maxOffset") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "view", "2024-01-20 10:00:00", 2L, 0.0))
    val out = EventAnalytics.retention(ev, maxOffset = 14)
    assert(out.agg(max(col("day_offset"))).head.getLong(0) === 0L)
  }

  // --- transitions ---

  test("transitions counts consecutive same-user pairs with row-normalized p") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "click", "2024-01-01 11:00:00", 2L, 0.0),
      (1L, "view", "2024-01-01 12:00:00", 3L, 0.0),
      (1L, "purchase", "2024-01-01 13:00:00", 4L, 1.0),
      // user 2's single event produces no transition
      (2L, "view", "2024-01-01 10:00:00", 5L, 0.0))
    val out = EventAnalytics.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "purchase", 1L, 0.5)))
  }

  test("transitions never cross users and tie-break same-second by event_id") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 2L, 0.0),
      (1L, "click", "2024-01-01 10:00:00", 1L, 0.0), // click first by id
      (2L, "purchase", "2024-01-01 11:00:00", 3L, 1.0))
    val out = EventAnalytics.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("click", "view", 1L)))
  }

  // --- rfm ---

  test("rfm computes recency/frequency/monetary with deterministic quintiles") {
    val ev = events(
      (1L, "purchase", "2024-01-30 10:00:00", 1L, 10.0),
      (1L, "purchase", "2024-01-10 10:00:00", 2L, 5.0),
      (2L, "purchase", "2024-01-20 10:00:00", 3L, 50.0),
      (3L, "purchase", "2024-01-05 10:00:00", 4L, 1.0),
      // non-purchase events are ignored entirely
      (3L, "view", "2024-01-29 10:00:00", 5L, 99.0))
    val out = EventAnalytics.rfm(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(7)))
    // value-based cuts: ties SHARE a bucket (users 2 and 3 both have
    // frequency 1 → both f-quintile 2; no row-order tie-break exists)
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 15.0, "112"),   // most recent, most frequent, 2nd $
      (2L, 11L, 1L, 50.0, "221"),  // 2nd recent, tied freq, top $
      (3L, 26L, 1L, 1.0, "424")))
  }

  test("rfm quintiles are value-deterministic under repartitioning") {
    val ev = events((1L to 60L).map(i =>
      (i, "purchase", f"2024-01-${(i % 28) + 1}%02d 10:00:00", i,
        (i % 9) * 3.5)): _*)
    val a = EventAnalytics.rfm(ev).collect().map(_.toSeq).toSeq
    val b = EventAnalytics.rfm(ev.repartition(13)).collect()
      .map(_.toSeq).toSeq
    assert(a === b)
    // quintile arithmetic: every quintile in 1..5, ties share buckets
    a.foreach { r =>
      Seq(4, 5, 6).foreach(i => assert(r(i).asInstanceOf[Long] >= 1L &&
        r(i).asInstanceOf[Long] <= 5L))
    }
    // equal metric values always land in the same quintile
    val byFreq = a.groupBy(_(2)).values
    byFreq.foreach(rows => assert(rows.map(_(5)).distinct.size === 1,
      "tied frequencies split across f-quintiles"))
  }

  // --- anomalies ---

  test("anomalies flags far outliers per type; zero variance emits z=0") {
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 1.0),
      (2L, "view", "2024-01-01 10:01:00", 2L, 1.0),
      (3L, "view", "2024-01-01 10:02:00", 3L, 1.0),
      (4L, "view", "2024-01-01 10:03:00", 4L, 1.0),
      (5L, "view", "2024-01-01 10:04:00", 5L, 1.0),
      (6L, "view", "2024-01-01 10:05:00", 6L, 1.0),
      (7L, "view", "2024-01-01 10:06:00", 7L, 1.0),
      (8L, "view", "2024-01-01 10:07:00", 8L, 1.0),
      (9L, "view", "2024-01-01 10:08:00", 9L, 1.0),
      (10L, "view", "2024-01-01 10:09:00", 10L, 1.0),
      (11L, "view", "2024-01-01 10:10:00", 11L, 1000.0), // the outlier
      // constant-valued type: sd = 0, z = 0, never flagged
      (12L, "click", "2024-01-01 10:00:00", 12L, 7.0),
      (13L, "click", "2024-01-01 10:01:00", 13L, 7.0))
    val out = EventAnalytics.anomalies(ev).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(11L)._2, s"outlier not flagged: ${out(11L)}")
    assert((1L to 10L).forall(!out(_)._2), "inliers must not flag")
    assert(out(12L) === ((0.0, false)) && out(13L) === ((0.0, false)))
    // z is a real standardized score for the outlier (~sqrt(n-1) shape)
    assert(out(11L)._1 > 3.0)
  }

  test("anomalies is partition-layout-proof (decimal moments)") {
    val ev = events((1L to 50L).map(i =>
      (i % 7, "view", f"2024-01-01 10:${i % 60}%02d:00", i, i * 1.37)): _*)
    val a = EventAnalytics.anomalies(ev).collect().map(_.toSeq).toSeq
    val b = EventAnalytics.anomalies(ev.repartition(13)).collect()
      .map(_.toSeq).toSeq
    assert(a === b)
  }

  test("seasonality buckets by hour-of-week with exact shares") {
    // 2024-01-01 is a MONDAY (dow 1 under the Sunday=0 epoch formula);
    // 10:00 UTC events land in cell (1, 10), a Sunday event in (0, 9)
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 2.0),
      (2L, "view", "2024-01-01 10:59:59", 2L, 3.0),
      (3L, "view", "2024-01-07 09:30:00", 3L, 5.0)) // Sunday
    val got = EventAnalytics.seasonality(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set((1L, 10L), (0L, 9L)), got.keySet)
    assert(got((1L, 10L)) == ((2L, 5.0, 0.666666)))
    assert(got((0L, 9L)) == ((1L, 5.0, 0.333333)))
  }

  test("conversionLag buckets first-view to first-purchase, capped") {
    val ev = events(
      // user 1: converts in 30 min -> bucket 0
      (1L, "view", "2024-01-01 10:00:00", 1L, 1.0),
      (1L, "purchase", "2024-01-01 10:30:00", 2L, 9.0),
      // user 2: converts in 5h -> bucket 5; later events irrelevant
      (2L, "view", "2024-01-01 00:00:00", 3L, 1.0),
      (2L, "purchase", "2024-01-01 05:00:01", 4L, 9.0),
      (2L, "purchase", "2024-01-02 00:00:00", 5L, 9.0),
      // user 3: converts after 3 days -> overflow bucket 48
      (3L, "view", "2024-01-01 00:00:00", 6L, 1.0),
      (3L, "purchase", "2024-01-04 00:00:00", 7L, 9.0),
      // user 4: purchase BEFORE any view -> not a conversion
      (4L, "purchase", "2024-01-01 00:00:00", 8L, 9.0),
      (4L, "view", "2024-01-02 00:00:00", 9L, 1.0),
      // user 5: never purchases
      (5L, "view", "2024-01-01 00:00:00", 10L, 1.0))
    val got = EventAnalytics.conversionLag(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(0L, 5L, 48L), got.keySet)
    assert(got(0L) == ((1L, 0.333333)))
    assert(got(5L) == ((1L, 0.333333)))
    assert(got(48L) == ((1L, 0.333333)))
  }

  test("gapStats buckets per-user consecutive deltas with exact cum share") {
    val ev = events(
      // user 1: gaps of 90s (bucket 1) and 3600s (bucket 60)
      (1L, "view", "2024-01-01 10:00:00", 1L, 1.0),
      (1L, "view", "2024-01-01 10:01:30", 2L, 1.0),
      (1L, "view", "2024-01-01 11:01:30", 3L, 1.0),
      // user 2: one 10-day gap -> overflow bucket 120
      (2L, "view", "2024-01-01 00:00:00", 4L, 1.0),
      (2L, "view", "2024-01-11 00:00:00", 5L, 1.0),
      // user 3: single event -> contributes NO gap
      (3L, "view", "2024-01-01 00:00:00", 6L, 1.0))
    val got = EventAnalytics.gapStats(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 60L, 120L), got.keySet)
    assert(got(1L) == ((1L, 0.333333, 0.333333)))
    assert(got(60L) == ((1L, 0.333333, 0.666666)))
    assert(got(120L) == ((1L, 0.333333, 1.0)))
  }

  test("cohortLtv folds purchase revenue onto (cohort_week, age_week)") {
    // 2024-01-01 = epoch day 19723 -> cohort_week 2817 (19723 div 7);
    // user 1 cohorts on day 19723, buys same day and 8 days later
    // (age weeks 0 and 1); user 2 cohorts a week later, buys once
    val ev = events(
      (1L, "view", "2024-01-01 09:00:00", 1L, 1.0),
      (1L, "purchase", "2024-01-01 10:00:00", 2L, 10.0),
      (1L, "purchase", "2024-01-09 10:00:00", 3L, 5.5),
      (2L, "signup", "2024-01-08 09:00:00", 4L, 1.0),
      (2L, "purchase", "2024-01-08 10:00:00", 5L, 2.25))
    val got = EventAnalytics.cohortLtv(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val w1 = 19723L / 7  // user 1's cohort week
    val w2 = 19730L / 7  // user 2's
    assert(got.keySet == Set((w1, 0L), (w1, 1L), (w2, 0L)), got.keySet)
    assert(got((w1, 0L)) == ((1L, 10.0, 10.0)))
    assert(got((w1, 1L)) == ((1L, 5.5, 15.5)))   // cumulative 10 + 5.5
    assert(got((w2, 0L)) == ((1L, 2.25, 2.25)))
  }

  test("revenueConcentration: whales dominate the revenue share, not the user share") {
    // three buyers: 0.40 (bucket 0), 1.50 (bucket 1), 100.00 (bucket 6)
    // — one view row must not count; total = 101.90 = 10190 cents
    val ev = events(
      (1L, "purchase", "2024-01-01 10:00:00", 1L, 0.40),
      (2L, "purchase", "2024-01-01 10:01:00", 2L, 1.50),
      (3L, "purchase", "2024-01-01 10:02:00", 3L, 60.0),
      (3L, "purchase", "2024-01-01 10:03:00", 4L, 40.0),
      (4L, "view", "2024-01-01 10:04:00", 5L, 999.0))
    val got = EventAnalytics.revenueConcentration(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    def g(n: Long, d: Long) = (n * 1000000L / d).toDouble / 1e6
    val u = g(1, 3) // each bucket holds one user
    assert(got == Map(
      0L -> ((1L, 0.40, u, g(40, 10190), g(40, 10190))),
      1L -> ((1L, 1.50, u, g(150, 10190), g(190, 10190))),
      6L -> ((1L, 100.0, u, g(10000, 10190), g(10190, 10190)))),
      s"got $got")
  }

  test("madOutliers: the spike can't drag its own baseline") {
    // 1..10 plus a 1000.0 spike: median = 6 (lower median of 11),
    // deviations 0,1,1,2,2,3,3,4,4,5,994 -> MAD = 3; only the spike
    // exceeds 3*MAD. A mean/sd z-score would have its baseline dragged
    // to ~96 by the same spike — the robustness this operator exists for.
    val ev = events(((1 to 10).map(i =>
      (i.toLong, "view", f"2024-01-01 10:${i}%02d:00", i.toLong, i.toDouble))
      :+ (11L, "view", "2024-01-01 10:11:00", 11L, 1000.0)): _*)
    val got = EventAnalytics.madOutliers(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("view") == ((11L, 6.0, 3.0, 1L, 0.090909)), got("view"))
  }

  test("madOutliers: constant values read zero MAD, zero outliers") {
    val ev = events(
      (1L, "click", "2024-01-01 10:00:00", 1L, 7.0),
      (2L, "click", "2024-01-01 10:01:00", 2L, 7.0),
      (3L, "click", "2024-01-01 10:02:00", 3L, 7.0))
    val got = EventAnalytics.madOutliers(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    // every deviation is 0 and 0 > 3*0 is false: nothing flags
    assert(got("click") == ((3L, 7.0, 0.0, 0L, 0.0)), got("click"))
  }

  test("madOutliers: the grid is capped by construction, not by the data") {
    // a high-cardinality value column — unique floats far beyond the
    // documented [0, 1000] range (the shape that made cells ∝ corpus
    // before the clamp: think timestamps-as-values). Every row lands in
    // the overflow bucket, so the histogram holds ONE cell, the median
    // reads the cap, and MAD/outliers are zero — bounded state instead
    // of an unbounded grid plus a corpus-sized per-type sort.
    val ev = events((1 to 50).map(i => (i.toLong, "view",
      f"2024-01-01 10:${i % 60}%02d:00", i.toLong, 1e9 + i * 1.7)): _*)
    val got = EventAnalytics.madOutliers(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got("view") == ((50L, 1000.0, 0.0, 0L, 0.0)), got("view"))
    // negatives clamp into the 0 floor bucket the same way
    val neg = events((1 to 9).map(i => (i.toLong, "err",
      f"2024-01-01 11:0${i % 10}%1d:00", 100L + i, -1e6 - i)): _*)
    val gotNeg = EventAnalytics.madOutliers(neg).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(gotNeg("err") == ((9L, 0.0, 0.0, 0L, 0.0)), gotNeg("err"))
  }

  test("robustStats: one spike moves the mean, not the robust pair") {
    // 19 ones and a 1000.0 spike: n=20, lo=1 — the plain mean reads
    // 50.95, the 5% trimmed and winsorized means both read 1.0 (the
    // spike is trimmed away / pinned to the rank-19 value)
    val ev = events(((1 to 19).map(i =>
      (i.toLong, "view", f"2024-01-01 10:${i}%02d:00", i.toLong, 1.0))
      :+ (20L, "view", "2024-01-01 10:20:00", 20L, 1000.0)): _*)
    val got = EventAnalytics.robustStats(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got("view") == ((20L, 50.95, 1.0, 1.0, 1.0, 1.0)), got("view"))
  }

  test("robustStats: below the trim floor the three means coincide") {
    // n=10 -> lo = 10*5 div 100 = 0: nothing trims, the quantile
    // columns read the min and max
    val ev = events((1 to 10).map(i => (i.toLong, "click",
      f"2024-01-01 10:${i}%02d:00", i.toLong, i.toDouble)): _*)
    val got = EventAnalytics.robustStats(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got("click") == ((10L, 5.5, 5.5, 5.5, 1.0, 10.0)), got("click"))
  }

  test("robustStats: trims count rows, and interior mass stays exact") {
    // 40 rows: 1.0 x10, 2.0 x10, 3.0 x10, 4.0 x10; lo = 2 trims two
    // rows from each tail INSIDE the boundary cells: trimmed sum =
    // (10-2)*1 + 10*2 + 10*3 + (10-2)*4 = 90 over 36 rows = 2.5;
    // winsorized adds 2 copies of each trim quantile (1.0 and 4.0)
    val ev = events((1 to 40).map(i => (i.toLong, "buy",
      f"2024-01-01 10:${i % 60}%02d:00", i.toLong, ((i - 1) / 10 + 1).toDouble)): _*)
    val got = EventAnalytics.robustStats(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got("buy") == ((40L, 2.5, 2.5, 2.5, 1.0, 4.0)), got("buy"))
  }

  test("sessionGapSweep: each cut replays the sessionizer's boundary rule") {
    // user 1: gaps of 10 and 45 min; user 2: one event.
    // T=5  -> both gaps split: 3 + 1 sessions
    // T=15 -> only the 45-min gap splits: 2 + 1
    // T=30 -> same (45 > 30): 2 + 1
    // T=60 -> nothing splits: 1 + 1
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "view", "2024-01-01 10:10:00", 2L, 0.0),
      (1L, "view", "2024-01-01 10:55:00", 3L, 0.0),
      (2L, "view", "2024-01-01 10:00:00", 4L, 0.0))
    val got = EventAnalytics.sessionGapSweep(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(5L) == ((4L, 1.0)), got(5L))
    assert(got(15L) == ((3L, 1.333333)), got(15L))
    assert(got(30L) == ((3L, 1.333333)), got(30L))
    assert(got(60L) == ((2L, 2.0)), got(60L))
    // the T=30 point IS the sessionizer: session counts must agree
    val sessions = Sessionize.sessions(ev).count()
    assert(got(30L)._1 == sessions, s"sweep ${got(30L)._1} vs $sessions")
  }

  test("sessionGapSweep: the 30-minute point equals q_sessionize at SF") {
    val ev = Tables(spark, sfDir).events
    val got = EventAnalytics.sessionGapSweep(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(30L) == Sessionize.sessions(ev).count())
    // monotone: a larger gap threshold never creates more sessions
    val cuts = Seq(5L, 15L, 30L, 60L).map(got)
    assert(cuts.zip(cuts.tail).forall { case (a, b) => a >= b }, cuts)
  }

  test("cooccurrence: distinct sets, exact lift and audience jaccard") {
    // u1 {view, click} (view twice — sets, not bags), u2 {view},
    // u3 {view, click, purchase}
    val ev = events(
      (1L, "view", "2024-01-01 10:00:00", 1L, 0.0),
      (1L, "view", "2024-01-01 10:05:00", 2L, 0.0),
      (1L, "click", "2024-01-01 10:01:00", 3L, 0.0),
      (2L, "view", "2024-01-01 10:02:00", 4L, 0.0),
      (3L, "view", "2024-01-01 10:03:00", 5L, 0.0),
      (3L, "click", "2024-01-01 10:04:00", 6L, 0.0),
      (3L, "purchase", "2024-01-01 10:06:00", 7L, 0.0))
    val got = EventAnalytics.cooccurrence(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7)))).toMap
    // lift(click,view) = 2·3/(2·3) = 1; jaccard = 2/(2+3-2)
    assert(got(("click", "view")) == ((2L, 2L, 3L, 3L, 1.0, 0.666666)),
      got(("click", "view")))
    // lift(click,purchase) = 1·3/(2·1) = 1.5 — purchasers over-index
    assert(got(("click", "purchase")) == ((1L, 2L, 1L, 3L, 1.5, 0.5)),
      got(("click", "purchase")))
    assert(got(("purchase", "view")) == ((1L, 1L, 3L, 3L, 1.0, 0.333333)),
      got(("purchase", "view")))
    assert(got.size == 3, s"${got.size} pairs")
  }

  // --- grouping sets ---

  test("revenueGroupingSets matches a recomputed lattice at sf0.001") {
    val t = Tables(spark, sfDir)
    val out = operators.Relational.revenueGroupingSets(t).collect()
    val fine = out.filter(_.getLong(2) == 0L)
    val byFlag = out.filter(_.getLong(2) == 1L)
    val total = out.filter(_.getLong(2) == 3L)
    assert(total.length === 1)
    assert(fine.map(_.getLong(4)).sum === total.head.getLong(4))
    assert(byFlag.map(_.getLong(4)).sum === total.head.getLong(4))
    assert(math.abs(fine.map(_.getDouble(3)).sum - total.head.getDouble(3)) < 1e-6)
    // every by-flag row aggregates exactly its fine rows
    byFlag.foreach { r =>
      val flag = r.getString(0)
      val mine = fine.filter(_.getString(0) == flag)
      assert(mine.map(_.getLong(4)).sum === r.getLong(4))
      assert(math.abs(mine.map(_.getDouble(3)).sum - r.getDouble(3)) < 1e-6)
    }
  }
}
