package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.cosine_similarity

/** Model-evaluation statistics a training-data pipeline gates on before
  * shipping a classifier's keep/drop verdicts or an experiment's winner:
  * exact tie-aware ROC-AUC, score calibration (reliability bins), the
  * hashed-assignment A/B two-proportion z-test, and the two-sample
  * Kolmogorov–Smirnov drift test. The reference's eval surface stops at
  * accuracy-style reports (its index serves labels next to vectors,
  * `services/index_service.py`); these are the ranking/statistical
  * counterparts every large-scale labeler run needs.
  *
  * Scale design, shared across all four: NO corpus-sized sort anywhere.
  * Each statistic is computed from a domain-bounded HISTOGRAM — the only
  * corpus-wide operation is one groupBy onto that bounded key space
  * (score grid / bin / variant / length), which partial-aggregates
  * map-side; the windows and cumulative sums that a textbook
  * implementation would run over the corpus run here over the histogram
  * (≤ |grid| × |class| rows). That is the difference between "sort 100 TB
  * per class to rank scores" and "shuffle a few million counter cells".
  *
  * Determinism across engines: scores land on the 1e-6 integer grid
  * BEFORE any ranking (identical tie groups both sides); every ratio is
  * an integer `DIV` on a scaled grid; z only composes IEEE-exact ops
  * (integer-valued doubles, division, sqrt) so its floor is stable.
  */
object MlEval {

  /** One-vs-rest scored table behind [[auc]] and [[calibration]]:
    * held-out vectors (`vec_id % heldoutMod == 0`) scored against EVERY
    * class centroid trained on the rest — `(vec_id, class, s_grid, pos)`
    * with `s_grid = floor(cosine·1e6)` (long) and `pos = 1` iff the true
    * label is `class`. The n_classes×dim centroid table broadcasts
    * (kilobytes); scoring is a narrow map-side pass — same shape as
    * [[Classifier.classify]] before its argmin. */
  def scoredOneVsRest(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame = {
    val train = embeddings.filter(pmod(col("vec_id"), lit(heldoutMod)) =!= 0)
    val test = embeddings.filter(pmod(col("vec_id"), lit(heldoutMod)) === 0)
    test.crossJoin(broadcast(Classifier.centroids(train)))
      .select(col("vec_id"),
        col("pred_label").as("class"),
        floor(cosine_similarity(col("embedding"), col("cv")) * 1e6)
          .cast("long").as("s_grid"),
        (col("label").cast("long") === col("pred_label"))
          .cast("long").as("pos"))
  }

  /** Exact tie-aware one-vs-rest ROC-AUC per class, from score
    * HISTOGRAMS instead of a per-class rank: group the scored table by
    * (class, grid score) into (positives, negatives) cells, then fold the
    * Mann–Whitney U over the cells — for each cell,
    * `U2 += p_g · (2·negatives_below + n_g)` (the `n_g` term is the ½
    * tie credit, kept integral by working with 2U). AUC = U2 / (2·P·N)
    * on the 1e-6 DIV grid. The cumulative window runs over the bounded
    * histogram (≤ 2e6 grid values × classes), not the corpus; the
    * integer algebra goes through DECIMAL(38,0) so 2·P·N·1e6 cannot
    * overflow at corpus scale. Classes with no positives or no negatives
    * report NULL (AUC undefined). */
  def auc(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame =
    aucFromScored(scoredOneVsRest(embeddings, heldoutMod))

  /** The bounded (class, grid-score) HISTOGRAM every ML-eval statistic
    * folds over — `(class, s_grid, p_g, n_g)` with p_g/n_g the positive/
    * negative counts at that cell. ≤ grid × classes rows however large
    * the corpus; the one corpus-wide shuffle in the family. The
    * streaming twin ([[graft.streaming.MlEvalStream]]) maintains exactly
    * this table as its state, so batch and stream serve the same folds. */
  def scoreHistogram(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("class"), col("s_grid"))
      .agg(sum(col("pos")).as("p_g"),
        (count(lit(1)) - sum(col("pos"))).as("n_g"))

  /** [[auc]] over ANY `(class, s_grid, pos)` scored table — the seam the
    * property suite drives with synthetic score distributions. */
  def aucFromScored(scored: DataFrame): DataFrame =
    aucFromCells(scoreHistogram(scored))

  /** [[auc]] folded from histogram CELLS — the batch/stream-shared fold:
    * the streaming twin's state store holds these cells and serves the
    * statistic on demand through this exact plan. */
  def aucFromCells(h: DataFrame): DataFrame = {
    val below = Window.partitionBy(col("class")).orderBy(col("s_grid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("n_below", coalesce(sum(col("n_g")).over(below), lit(0L)))
      .groupBy(col("class"))
      .agg(sum(col("p_g").cast("decimal(38,0)") *
          (lit(2L) * col("n_below") + col("n_g"))).as("u2"),
        sum(col("p_g")).as("n_pos"), sum(col("n_g")).as("n_neg"))
      .select(col("class").as("label"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("cast(cast(u2 as decimal(38,0)) * 1000000 div " +
            "(2 * cast(n_pos as decimal(38,0)) * n_neg) as double)") / 1e6)
          .as("auc"))
      .transform(graft.Determinism.sorted(_)(col("label")))
  }

  /** Reliability diagram over the same one-vs-rest scores: cosine in
    * [-1, 1] cut into 10 equal bins, per (class, bin) the count, the mean
    * score and the empirical positive rate — the table a pipeline reads
    * to decide whether the classifier's scores can be thresholded as
    * probabilities. One groupBy onto the bounded (class, bin) key; the
    * mean goes through the +1e6 OFFSET grid so the integer `DIV` never
    * sees a negative numerator. */
  def calibration(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame =
    calibrationFromScored(scoredOneVsRest(embeddings, heldoutMod))

  /** [[calibration]] over ANY `(class, s_grid, pos)` scored table — the
    * seam `SparkEntry` serves from the memoized one-vs-rest scoring pass
    * so the three ML-eval gate rows cost ONE corpus scan between them. */
  def calibrationFromScored(scored: DataFrame): DataFrame =
    calibrationFromCells(scoreHistogram(scored))

  /** [[calibration]] folded from histogram cells: n / n_pos / s_sum are
    * integer sums of per-cell products, so the fold is EXACTLY the
    * per-row aggregate (same integers, same one DIV at the end). */
  def calibrationFromCells(h: DataFrame): DataFrame =
    h
      // clamp at the grid floor: float cosine can undershoot -1.0 by an
      // ulp, making s_grid = -1000001 — without the clamp the offset
      // numerator goes negative and Spark's truncating `div` and
      // DuckDB's flooring `//` would bin that cell differently
      .select(col("class"), col("p_g"), (col("p_g") + col("n_g")).as("c_g"),
        least(expr("(greatest(s_grid, -1000000) + 1000000) div 200000"),
          lit(9L)).as("bin"),
        (greatest(col("s_grid"), lit(-1000000L)) + lit(1000000L)).as("s_off"))
      .groupBy(col("class"), col("bin"))
      // the per-cell product rides decimal(38,0) from the first multiply
      // — a plain LONG s_sum (s_off ≤ 2e6 per scored row) would wrap
      // silently past ~4.6e12 rows in non-ANSI Spark while the DuckDB
      // oracle widens to HUGEINT (the f1Report/abTest discipline)
      .agg(sum(col("c_g")).as("n"), sum(col("p_g")).as("n_pos"),
        sum(col("s_off").cast("decimal(38,0)") * col("c_g")).as("s_sum"))
      .select(col("class").as("label"), col("bin"), col("n"), col("n_pos"),
        (expr("cast(s_sum as decimal(38,0)) div n").cast("double") - 1e6) /
          1e6 as "mean_score",
        expr("cast(n_pos as decimal(38,0)) * 1000000 div n")
          .cast("double") / 1e6 as "pos_rate")
      .transform(graft.Determinism.sorted(_)(col("label"), col("bin")))

  /** Expected calibration error per class — the one-number summary of
    * [[calibration]]'s reliability table (the metric a model card
    * publishes; the per-bin table says WHERE scores lie, ECE says HOW
    * MUCH, weighted by bin mass): ECE = Σ_bins (n_b/N)·|pos_rate_b −
    * mean_score_b| over the same 10 bins.
    *
    * Exactness: both rates stay on their integer 1e-6 grids with the
    * SAME +1e6 offset (so the offsets cancel inside the absolute
    * difference and no DIV ever sees a negative numerator); the
    * mass-weighted sum rides DECIMAL — the fold is exactly the
    * calibration table's algebra, never a float re-composition of its
    * output doubles. Served from the same memoized scoring pass as the
    * other ML-eval rows (one corpus scan between them). */
  def eceFromScored(scored: DataFrame): DataFrame =
    eceFromCells(scoreHistogram(scored))

  /** [[eceFromScored]] folded from histogram cells (batch/stream-shared
    * — the `MlEvalStream` store serves this fold too). */
  private[graft] def eceFromCells(h: DataFrame): DataFrame =
    h
      .select(col("class"), col("p_g"), (col("p_g") + col("n_g")).as("c_g"),
        least(expr("(greatest(s_grid, -1000000) + 1000000) div 200000"),
          lit(9L)).as("bin"),
        (greatest(col("s_grid"), lit(-1000000L)) + lit(1000000L)).as("s_off"))
      .groupBy(col("class"), col("bin"))
      .agg(sum(col("c_g")).as("n"), sum(col("p_g")).as("n_pos"),
        sum(col("s_off").cast("decimal(38,0)") * col("c_g")).as("s_sum"))
      .select(col("class"), col("n"),
        abs(expr("cast(n_pos as decimal(38,0)) * 1000000 div n + 1000000" +
          " - cast(s_sum as decimal(38,0)) div n")).as("diff_g"))
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n_bins"), sum(col("n")).as("n"),
        sum(expr("cast(diff_g as decimal(38,0)) * n")).as("werr"))
      .select(col("class").as("label"), col("n_bins"), col("n"),
        expr("werr div n").cast("double") / 1e6 as "ece")
      .transform(graft.Determinism.sorted(_)(col("label")))

  /** Precision/recall operating points at the 10 calibration-bin
    * thresholds, folded from the SAME (class, grid-score) histogram as
    * [[auc]] — predicted-positive and true-positive masses are sums over
    * the cells at or above each threshold, so the whole curve costs one
    * histogram × 10 join instead of 10 corpus passes (and no corpus
    * sort). Thresholds with no scores at or above them emit no row
    * (nothing is predicted positive there — both engines agree by
    * construction). `prec`/`recall` on the DIV grid, NULL-guarded. */
  def prCurve(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame =
    prCurveFromScored(scoredOneVsRest(embeddings, heldoutMod))

  /** [[prCurve]] over ANY `(class, s_grid, pos)` scored table — the
    * memoized-pass seam, like [[aucFromScored]]. */
  def prCurveFromScored(scored: DataFrame): DataFrame =
    prCurveFromCells(scoreHistogram(scored))

  /** [[prCurve]] folded from histogram cells — batch/stream-shared. */
  def prCurveFromCells(h: DataFrame): DataFrame = {
    val spark = h.sparkSession
    val thr = spark.range(10).select(col("id").as("bin"),
      (lit(-1000000L) + col("id") * 200000L).as("thr"))
    val tot = h.groupBy(col("class")).agg(sum(col("p_g")).as("n_pos"))
    h.join(broadcast(thr), col("s_grid") >= col("thr"))
      .groupBy(col("class"), col("bin"), col("thr"))
      .agg(sum(col("p_g")).as("tp"),
        sum(col("p_g") + col("n_g")).as("n_pred"))
      .join(broadcast(tot), Seq("class"))
      .select(col("class").as("label"), col("bin"),
        (col("thr").cast("double") / 1e6).as("threshold"),
        col("n_pred"), col("tp"),
        when(col("n_pred") > 0,
          expr("cast(tp as decimal(38,0)) * 1000000 div n_pred")
            .cast("double") / 1e6).as("prec"),
        when(col("n_pos") > 0,
          expr("cast(tp as decimal(38,0)) * 1000000 div n_pos")
            .cast("double") / 1e6).as("recall"))
      .transform(graft.Determinism.sorted(_)(col("label"), col("bin")))
  }

  /** Hashed-assignment A/B test over the event log: every user lands in
    * variant `fnv1a64(user_id) mod 2` (the stable, coordination-free
    * assignment a 1000-executor experiment uses — no assignment table,
    * no join), converts if they ever fire a high-value `purchase`
    * (value > minValue), and the summary row carries both arms' counts,
    * DIV-grid rates, and the pooled two-proportion z-score. One
    * user-keyed shuffle (the conversion collapse), then a 2-row → 1-row
    * fold; z composes only integer-valued doubles, IEEE division and
    * sqrt, so its 1e-6 floor is engine-stable. Degenerate pools (0% or
    * 100%) report NULL z. */
  def abTest(events: DataFrame, minValue: Double = 150.0): DataFrame =
    armTotals(events, minValue)
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        // decimal(38,0) like aucFromScored: conv * 1e6 past ~9.2e12
        // users would silently wrap Long in non-ANSI Spark while the
        // oracle's HUGEINT path widens — same arithmetic both engines
        expr("cast(conv_a as decimal(38,0)) * 1000000 div n_a")
          .cast("double") / 1e6 as "rate_a",
        expr("cast(conv_b as decimal(38,0)) * 1000000 div n_b")
          .cast("double") / 1e6 as "rate_b",
        floor(zScore * 1e6) / 1e6 as "z")

  /** The one-row `(n_a, conv_a, n_b, conv_b)` arm-totals table behind
    * [[abTest]] and [[abPower]] — one user-keyed conversion collapse,
    * FNV-hashed 50/50 assignment, 2-row → 1-row fold. */
  private def armTotals(events: DataFrame, minValue: Double): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase" &&
        col("value") > minValue).cast("long")).as("conv"))
      .select(pmod(graft.functions.fnv1a64(col("user_id").cast("string")),
        lit(2L)).as("variant"), col("conv"))
    perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .agg(sum(when(col("variant") === 0, col("n"))).as("n_a"),
        sum(when(col("variant") === 0, col("c"))).as("conv_a"),
        sum(when(col("variant") === 1, col("n"))).as("n_b"),
        sum(when(col("variant") === 1, col("c"))).as("conv_b"))
  }

  /** Experiment POWER readout next to [[abTest]]'s significance test:
    * the minimum detectable effect (absolute rate difference) at 80%
    * power / two-sided α = 0.05 for the experiment's CURRENT sample
    * sizes and pooled rate — MDE = (z₀.₉₇₅ + z₀.₈)·√(p̂(1−p̂)(1/n_a +
    * 1/n_b)) with the z-sum as ONE literal (2.801585; summing two
    * literals could differ in the last ulp between engines) — plus
    * whether the observed difference clears it. The question a team
    * asks BEFORE reading z: "could this experiment even see the effect
    * size we care about?"
    *
    * Same one-pass arm-totals table as [[abTest]]; MDE composes only
    * integer-valued doubles, IEEE division and sqrt, floored at 1e-6 —
    * the z-score discipline. Degenerate pools (0% / 100%) report NULL
    * MDE and powered = false. */
  def abPower(events: DataFrame, minValue: Double = 150.0): DataFrame = {
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val mde = when(pp > 0 && pp < 1,
      floor(lit(2.801585) * sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double"))) * 1e6) / 1e6)
    armTotals(events, minValue)
      .withColumn("rate_a",
        expr("cast(conv_a as decimal(38,0)) * 1000000 div n_a")
          .cast("double") / 1e6)
      .withColumn("rate_b",
        expr("cast(conv_b as decimal(38,0)) * 1000000 div n_b")
          .cast("double") / 1e6)
      .withColumn("mde_abs", mde)
      .withColumn("powered",
        coalesce(abs(col("rate_b") - col("rate_a")) > col("mde_abs"),
          lit(false)))
  }

  /** The two-proportion z composed exactly as the oracle writes it —
    * shared structure keeps every IEEE op in the same order. */
  private def zScore = {
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    when(pp > 0 && pp < 1,
      (pb - pa) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double"))))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between every pair of
    * sources' document-length distributions — the distribution-drift
    * test behind "did this crawl's length profile shift?" (complements
    * `q_source_kl`, which needs binned densities; KS is binning-free).
    * KS = max |F_a − F_b| over the merged support, computed
    * division-free as max |cum_a·n_b − cum_b·n_a| then one DIV at the
    * end. The corpus collapses to a (source, length) histogram first —
    * the only wide shuffle; the pair table is |sources|² (broadcast) and
    * the cumulative window runs over histogram cells. */
  def ksTest(docs: DataFrame): DataFrame = {
    val h = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val tot = h.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val pairs = tot.select(col("source").as("source_a"), col("n").as("n_a"))
      .crossJoin(tot.select(col("source").as("source_b"), col("n").as("n_b")))
      .filter(col("source_a") < col("source_b"))
    val cells = h.join(broadcast(pairs),
        h("source") === col("source_a") || h("source") === col("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_chars"))
      .agg(sum(when(col("source") === col("source_a"), col("c"))
          .otherwise(lit(0L))).as("ca"),
        sum(when(col("source") === col("source_b"), col("c"))
          .otherwise(lit(0L))).as("cb"))
    val cum = Window.partitionBy(col("source_a"), col("source_b"))
      .orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_a", sum(col("ca")).over(cum))
      .withColumn("cum_b", sum(col("cb")).over(cum))
      .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
      .agg(max(abs(col("cum_a").cast("decimal(38,0)") * col("n_b") -
        col("cum_b").cast("decimal(38,0)") * col("n_a"))).as("d2"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        expr("cast(d2 as decimal(38,0)) * 1000000 div " +
          "(cast(n_a as decimal(38,0)) * n_b)").cast("double") / 1e6 as "ks")
      .transform(graft.Determinism.sorted(_)(col("source_a"), col("source_b")))
  }
}
