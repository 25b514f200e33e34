package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Implicit-feedback label mining: turn the raw interaction log into
  * position-bias-corrected relevance estimates — the training labels a
  * retrieval/ranking stack actually learns from (the reference serves
  * ranked hits, reference: controllers/search_controller.py:27-41; a
  * deployment closes the loop by mining its click log for the next
  * model's labels).
  *
  * Model: the standard position-based model (PBM) first-order estimate.
  * A view's POSITION is its view-rank within the session (the list the
  * user actually scanned); the examination propensity of position `r` is
  * estimated by the log-wide CTR at `r`; an item's debiased relevance is
  * the inverse-propensity-weighted click rate
  * `rel(i) = (1/n_i) · Σ_impressions clicked · 1/p_pos`, which undoes the
  * "items shown first get clicked more" confound that raw CTR bakes in.
  *
  * Determinism: propensities and IPS weights live on integer grids
  * (`w_r = ⌊1e6·v_r/c_r⌋` as BIGINT), every sum is an integer sum, and
  * the only double appears at the final 1e-4 floor — so the DuckDB
  * oracle replays the arithmetic bit-for-bit, the same discipline as
  * the retrieval-eval DCG grids.
  *
  * Scale shape: sessionization's ONE user-keyed shuffle; the session
  * window and both (user, session, item) collapses reuse that
  * partitioning (HashPartitioning(user) already clusters every finer
  * key — no second corpus-sized exchange); everything after is
  * vocabulary-profile (items × positions, then items) with the ≤
  * `maxPos`-row propensity table riding a broadcast. At 100 TB of log
  * the wire cost is the one user shuffle — the same bound as
  * sessionize itself.
  */
object Feedback {

  private val propsK =
    from_json(col("props"), StructType(Seq(StructField("k", LongType))))
      .getField("k")

  /** One impression per (user, session, item): the item's FIRST view
    * position in the session (view-rank among views, capped at `maxPos`
    * so deep-scroll tails share one propensity bucket) plus whether the
    * session clicked the item. A click with no view of its item in the
    * session is a log anomaly (attribution has nothing examined to
    * credit) and drops out by the join direction. */
  private[graft] def impressions(events: DataFrame, gap: String,
                                 maxPos: Int): DataFrame =
    impressionsWithSession(events, gap, maxPos)
      .select(col("user_id"), col("item"), col("pos"), col("clicked"))

  /** [[impressions]] keeping the session key — the per-context form
    * [[prefPairs]] pairs within. */
  private[graft] def impressionsWithSession(events: DataFrame, gap: String,
                                            maxPos: Int): DataFrame = {
    val typed = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), propsK.as("item"))
      .filter(col("event_type").isin("view", "click") &&
        col("item").isNotNull)
    val withIdx = Sessionize.withSessionIdx(
      typed, col("user_id"), col("ts"), col("event_id"), gap)
    // view-rank: cumulative count of view rows in (ts, event_id) order —
    // a view row's own rank is the position the user examined it at
    val w = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = withIdx.withColumn("vrn",
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(w))
    // ONE (user, session, item) collapse folds both branches — the
    // first-view position and the any-click flag are per-group MIN/MAX,
    // so no view/click split, no join, and no second exchange: the
    // aggregate sits directly under the user-keyed window and
    // HashPartitioning(user_id) already clusters the finer key
    // (StageProbe at sf0.01: one 3988-record shuffle, nothing after it)
    ranked
      .groupBy(col("user_id"), col("session_idx"), col("item"))
      .agg(
        min(when(col("event_type") === "view", col("vrn"))).as("first_vrn"),
        max((col("event_type") === "click").cast("int")).as("any_click"))
      // an item clicked but never viewed in its session has no examined
      // impression to credit — the log-anomaly drop
      .filter(col("first_vrn").isNotNull)
      .select(col("user_id"), col("session_idx"), col("item"),
        least(col("first_vrn"), lit(maxPos.toLong)).as("pos"),
        (col("any_click") === 1).as("clicked"))
  }

  /** The raw examination curve: per view-position, impressions, clicks
    * and CTR — the propensity table [[clickModel]] corrects with, and
    * the first chart any ranking team draws from its log. */
  def positionBias(events: DataFrame, gap: String = "30 MINUTES",
                   maxPos: Int = 10): DataFrame =
    positionBiasFrom(impressions(events, gap, maxPos))

  /** [[positionBias]] from an already-built `(item, pos, clicked)`
    * impression table — the shared fold the streaming twin
    * ([[graft.streaming.ClickModelStream]]) feeds with its accumulated
    * marks, so batch and serve paths cannot diverge. */
  def positionBiasFrom(imp: DataFrame): DataFrame =
    imp
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n_views"),
        sum(col("clicked").cast("long")).as("n_clicks"))
      .select(col("pos"), col("n_views"), col("n_clicks"),
        // integer DIV keeps the 1e-4 grid exact (long / long in Spark
        // is a DOUBLE divide — the one thing the oracle can't replay)
        (expr("(n_clicks * 10000) DIV n_views").cast("double") / 1e4)
          .as("ctr"))
      .transform(graft.Determinism.sorted(_)(col("pos")))

  /** Per-item debiased relevance: impressions, clicks, raw CTR and the
    * IPS estimate on the shared integer grid (see object doc). Items the
    * log never exposed do not appear — there is nothing to debias. */
  def clickModel(events: DataFrame, gap: String = "30 MINUTES",
                 maxPos: Int = 10): DataFrame =
    clickModelFrom(impressions(events, gap, maxPos))

  /** [[clickModel]] from an `(item, pos, clicked)` impression table —
    * see [[positionBiasFrom]]. */
  def clickModelFrom(impressions: DataFrame): DataFrame =
    modelGrid(impressions)
      .select(col("item"), col("n_imp"), col("n_clicks"),
        (col("ctr_u").cast("double") / 1e4).as("ctr"),
        (col("rel_u").cast("double") / 1e4).as("rel_ips"))
      .transform(graft.Determinism.sorted(_)(col("item")))

  /** The click model on its INTEGER grids — `(item, n_imp, n_clicks,
    * ctr_u, rel_u)` with `ctr_u = (clicks·1e4) DIV imps` and `rel_u` the
    * 1e-4-grid IPS relevance — the one implementation [[clickModelFrom]]
    * presents as doubles and [[prefPairs]] compares exactly (comparing
    * the grid longs, not their double renderings, is what lets the
    * oracle replay the pair verdicts bit-for-bit). */
  private def modelGrid(impressions: DataFrame): DataFrame = {
    // one impression table, two consumers (propensities + item rollup)
    val imp = Barrier(impressions)
    // w_r = ⌊1e6 · views_r / clicks_r⌋ — the integer IPS weight; a
    // position with zero clicks contributes nothing anywhere (no item
    // has a click there), so its weight is an inert 0
    val prop = imp.groupBy(col("pos"))
      .agg(count(lit(1)).as("v_r"),
        sum(col("clicked").cast("long")).as("c_r"))
      .select(col("pos"),
        when(col("c_r") > 0L, expr("(v_r * 1000000) DIV c_r"))
          .otherwise(0L).as("w_r"))
    val byItemPos = imp.groupBy(col("item"), col("pos"))
      .agg(count(lit(1)).as("n_imp"),
        sum(col("clicked").cast("long")).as("n_clk"))
    byItemPos.join(broadcast(prop), Seq("pos"))
      .groupBy(col("item"))
      .agg(sum(col("n_imp")).as("n_imp"),
        sum(col("n_clk")).as("n_clicks"),
        sum(col("n_clk") * col("w_r")).as("rel_grid"))
      .select(col("item"), col("n_imp"), col("n_clicks"),
        expr("(n_clicks * 10000) DIV n_imp").as("ctr_u"),
        expr("rel_grid DIV (100 * n_imp)").as("rel_u"))
  }

  /** Preference-pair mining — the PAIRWISE training-data product of the
    * feedback family (the pointwise product is [[clickModel]]'s IPS
    * label): per-context (winner, loser) pairs from the click log,
    * debiased by the model.
    *
    * Candidate generation is per SESSION (the context): winner = an item
    * the session clicked, loser = an item the session viewed ABOVE the
    * winner (first-view position strictly smaller) and did not click —
    * the classic skip-above pair, where the examination confound is
    * controlled by construction (the user provably examined the loser
    * before reaching the winner). Pairs aggregate to (winner, loser)
    * with their session support, then the model renders the verdict:
    * only pairs whose IPS-grid relevance margin `rel_u(w) − rel_u(l)`
    * meets `marginGrid` survive, and `ctr_flipped` marks the pairs raw
    * position-confounded CTR orders BACKWARDS (`ctr_u(w) ≤ ctr_u(l)`) —
    * exactly the pairs a raw-CTR pairer would get wrong, and the most
    * valuable ones to train on.
    *
    * Scale shape: the session self-join reuses sessionize's user-keyed
    * clustering and its output is Σ_sessions clicked×skipped — bounded
    * by session size, linear in the log (never |items|²); the model
    * grids ride a broadcast (the item catalog is vocabulary-profile);
    * every comparison is on the shared integer grids so the oracle
    * replays each verdict bit-for-bit. */
  def prefPairs(events: DataFrame, gap: String = "30 MINUTES",
                maxPos: Int = 10, marginGrid: Long = 100L): DataFrame =
    prefPairsFrom(impressionsWithSession(events, gap, maxPos), marginGrid)

  /** [[prefPairs]] from a `(user_id, session_idx, item, pos, clicked)`
    * session-impression table — the shared fold the streaming twin
    * ([[graft.streaming.ClickModelStream.prefPairs]]) feeds with its
    * accumulated session marks (any per-session-unique `session_idx`
    * key gives the identical pair table: the key only scopes the
    * self-join and drops out of the (winner, loser) rollup). */
  def prefPairsFrom(sessionImpressions: DataFrame,
                    marginGrid: Long = 100L): DataFrame = {
    val simp = Barrier(sessionImpressions)
    val winners = simp.filter(col("clicked"))
      .select(col("user_id"), col("session_idx"),
        col("item").as("winner"), col("pos").as("wpos"))
    val losers = simp.filter(!col("clicked"))
      .select(col("user_id"), col("session_idx"),
        col("item").as("loser"), col("pos").as("lpos"))
    val pairs = winners.join(losers, Seq("user_id", "session_idx"))
      .filter(col("lpos") < col("wpos"))
      .groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("n_sessions"))
    val model = modelGrid(
      simp.select(col("item"), col("pos"), col("clicked")))
    val mw = model.select(col("item").as("winner"),
      col("rel_u").as("rel_u_w"), col("ctr_u").as("ctr_u_w"))
    val ml = model.select(col("item").as("loser"),
      col("rel_u").as("rel_u_l"), col("ctr_u").as("ctr_u_l"))
    pairs
      .join(broadcast(mw), Seq("winner"))
      .join(broadcast(ml), Seq("loser"))
      .filter(col("rel_u_w") - col("rel_u_l") >= marginGrid)
      .select(col("winner"), col("loser"), col("n_sessions"),
        (col("rel_u_w").cast("double") / 1e4).as("rel_winner"),
        (col("rel_u_l").cast("double") / 1e4).as("rel_loser"),
        (col("ctr_u_w").cast("double") / 1e4).as("ctr_winner"),
        (col("ctr_u_l").cast("double") / 1e4).as("ctr_loser"),
        (col("ctr_u_w") <= col("ctr_u_l")).as("ctr_flipped"))
      .transform(graft.Determinism.sorted(_)(col("winner"), col("loser")))
  }
}
