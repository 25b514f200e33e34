package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed re-expression of the reference's in-memory session store
  * (reference: utils/session_manager.py — 30-minute inactivity timeout,
  * keep-last-5 history).
  *
  * Batch form: gap-based sessionization via window functions — one shuffle
  * on the session key, everything else map-side. The streaming twin lives
  * in [[graft.streaming.SessionStream]].
  */
object Sessionize {

  /** Adds `session_idx`: 0-based session ordinal per key, where a new
    * session starts when the gap since the previous event exceeds `gap`.
    * `tieCol` makes the intra-key order total (deterministic).
    */
  def withSessionIdx(df: DataFrame, key: Column, ts: Column, tieCol: Column,
                     gap: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieCol)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull || ts > prev + expr(s"INTERVAL $gap"), 1)
      .otherwise(0)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
  }

  /** Per-session rollup: bounds, event count, exact (decimal) value sum. */
  def sessions(events: DataFrame, gap: String = "30 MINUTES"): DataFrame = {
    val withIdx = withSessionIdx(
      events, col("user_id"), col("ts"), col("event_id"), gap)
    withIdx
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Session-length distribution: sessions bucketed by event count
    * (capped — the overflow bucket absorbs marathon sessions so the
    * output domain is fixed at ≤ capLen cells) with counts, shares and
    * the cumulative share — the engagement-shape profile read next to
    * [[sessions]] (that lists sessions; this says whether the corpus is
    * drive-by singletons or long journeys, the number a sessionization
    * gap is tuned against).
    *
    * Scale shape: sessionization's one user-keyed shuffle, a 1-row-per-
    * session aggregate on the SAME key (co-partitioned), then a
    * map-side fold onto the ≤ capLen bucket domain; the cumulative
    * window runs over that bounded derived grid (PlanDoctor-admitted).
    * Shares are integer DIVs on the 1e-6 grid. */
  def sessionStats(events: DataFrame, gap: String = "30 MINUTES",
                   capLen: Int = 20): DataFrame = {
    val perSession = withSessionIdx(
      events, col("user_id"), col("ts"), col("event_id"), gap)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"))
    val buckets = perSession
      .select(least(col("n_events"), lit(capLen.toLong)).as("session_len"))
      .groupBy(col("session_len"))
      .agg(count(lit(1)).as("n_sessions"))
    val total = buckets.agg(sum(col("n_sessions")).as("total"))
    val cum = Window.orderBy(col("session_len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets.crossJoin(broadcast(total))
      .withColumn("cum_n", sum(col("n_sessions")).over(cum))
      .select(col("session_len"), col("n_sessions"),
        expr("cast(n_sessions as decimal(38,0)) * 1000000 div total")
          .cast("double") / 1e6 as "share",
        expr("cast(cum_n as decimal(38,0)) * 1000000 div total")
          .cast("double") / 1e6 as "cum_share")
      .transform(graft.Determinism.sorted(_)(col("session_len")))
  }

  /** Top user-journey paths — the session-path (sankey) mining companion
    * to [[graft.operators.EventAnalytics.transitions]] (the Markov
    * matrix sees one step; this sees whole journeys): each session's
    * ordered event-type sequence rendered `a > b > c`, truncated to its
    * first `maxLen` steps (with a ` > ...` marker so a cut journey never
    * aliases an exact one), counted corpus-wide, top-`k` by session
    * count with lexicographic ties.
    *
    * Scale shape: sessionization's one user-keyed shuffle, then a
    * per-session window + aggregate on the SAME key — and the per-
    * session buffer is bounded BY CONSTRUCTION: events past `maxLen`
    * collect as nulls (skipped by collect_list), so a pathological
    * session costs `maxLen` structs, never its event count. Path
    * counting is a map-side-combined groupBy on the path string
    * (bounded by the type-alphabet^maxLen domain, vocabulary-profile
    * shuffle), ranking a TakeOrdered. */
  def paths(events: DataFrame, gap: String = "30 MINUTES", maxLen: Int = 8,
            k: Int = 20): DataFrame = {
    require(maxLen >= 1 && k >= 1, "maxLen and k must be ≥ 1")
    pathsFromCells(sessionPathCells(events, gap, maxLen, "purchase"), k)
  }

  /** The per-session `(path, conv)` cells behind [[paths]] /
    * [[pathConversion]] — batch/stream-shared: one row per CLOSED
    * session carrying its rendered (truncated) path label and whether
    * any event in the WHOLE session matched `convType`.
    * [[graft.streaming.PathsStream]] produces the same cells by
    * emitting each session on close (gap exceeded or event-time
    * timeout — the SessionStream contract) from a state buffer that is
    * `maxLen` types by construction, exactly like the when(rn <= maxLen)
    * collect here. `conv` is computed unconditionally; [[paths]] never
    * references it, so Catalyst prunes it off that plan entirely. */
  private[graft] def sessionPathCells(events: DataFrame, gap: String,
                                      maxLen: Int,
                                      convType: String): DataFrame = {
    val withIdx = withSessionIdx(
      events, col("user_id"), col("ts"), col("event_id"), gap)
    val w = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    withIdx
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("len"),
        max(when(col("event_type") === convType, 1L).otherwise(0L))
          .as("conv"),
        sort_array(collect_list(when(col("rn") <= maxLen,
          struct(col("rn"), col("event_type"))))).as("evs"))
      .select(concat(
        array_join(transform(col("evs"), e => e.getField("event_type")),
          " > "),
        when(col("len") > maxLen, lit(" > ...")).otherwise(lit("")))
        .as("path"),
        col("conv"))
  }

  /** [[paths]] finished from cells: map-side-combined path counting
    * (bounded by the type-alphabet^maxLen domain), top-k ranking. */
  private[graft] def pathsFromCells(cells: DataFrame, k: Int): DataFrame =
    cells.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)

  /** [[pathConversion]] finished from cells — same fold plus the
    * conversion share (one integer÷integer IEEE-exact division). */
  private[graft] def pathConversionFromCells(cells: DataFrame,
                                             k: Int): DataFrame =
    cells.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("conv")).as("n_converted"))
      .select(col("path"), col("n_sessions"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_sessions").cast("double"))
          .as("conversion"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)

  /** [[paths]] with per-journey CONVERSION: for each top path the share
    * of its sessions containing a `convType` event — the number a
    * growth team reads off the sankey (which journeys convert, which
    * stall). The conversion flag is evaluated over the WHOLE session
    * (a purchase past the `maxLen` truncation still counts — the path
    * label is truncated, the outcome is not); the rate is one
    * integer÷integer IEEE-exact division. Same bounded dataflow as
    * [[paths]] plus one per-session max. */
  def pathConversion(events: DataFrame, gap: String = "30 MINUTES",
                     maxLen: Int = 8, k: Int = 20,
                     convType: String = "purchase"): DataFrame = {
    require(maxLen >= 1 && k >= 1, "maxLen and k must be ≥ 1")
    pathConversionFromCells(
      sessionPathCells(events, gap, maxLen, convType), k)
  }

  /** Keep-last-N history per key (reference keeps the last 5 exchanges). */
  def lastN(events: DataFrame, n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("recency", row_number().over(w).cast("long"))
      .filter(col("recency") <= n)
      .select(col("user_id"), col("event_id"), col("ts"), col("recency"))
      .orderBy(col("user_id"), col("recency"))
  }

  /** Prompt-context assembly (reference: services/qa_service.py:76-82):
    * the last `n` exchanges per key, oldest-first, rendered as
    * "Q: ...\nA: ..." lines under a "Previous conversation:" header.
    *
    * One shuffle (the last-N window); the string assembly is a map-side
    * aggregate. Ordering inside the group is made deterministic by
    * collecting (ts, tie, line) structs and `array_sort`ing them —
    * `collect_list` alone has no order guarantee after a shuffle. The
    * numeric answer goes through DECIMAL(18,2) so the rendering is
    * engine-portable (double→string repr differs between engines).
    */
  def qaContext(events: DataFrame, n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val line = concat(
      lit("Q: "), col("event_type"), lit(" "), col("event_id").cast("string"),
      lit("\nA: "), col("value").cast("decimal(18,2)").cast("string"))
    events
      .withColumn("recency", row_number().over(w))
      .filter(col("recency") <= n)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_exchanges"),
        concat(lit("Previous conversation:\n"),
          array_join(
            transform(
              array_sort(collect_list(
                struct(col("ts"), col("event_id"), line.as("line")))),
              x => x.getField("line")),
            "\n")).as("context"))
      .orderBy(col("user_id"))
  }
}
