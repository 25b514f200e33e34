package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions._
import graft.operators.Barrier.BarrierOps

/** Data-SELECTION operators: which documents (and how much of each
  * source) go into the training mix. The quality gates
  * ([[Pipeline.curate]]) answer "is this document acceptable"; these
  * answer "is this document the kind of data we want more of" —
  * importance resampling against a target distribution (DSIR-style,
  * hashed-n-gram likelihood ratios) and temperature-flattened source
  * weighting (the multilingual-mix convention).
  *
  * Scale shapes (100 TB):
  *  - dsir: the model is a FIXED 4096-bucket grid (two longs per
  *    bucket), so the weight table broadcasts at any corpus size; the
  *    corpus contributes one tokenize pass and one (doc, bucket)
  *    groupBy whose partial counts combine map-side. The keep cut is an
  *    order statistic over the DISTINCT 1e-4-floored scores — a domain
  *    bounded by the score grid, not the corpus.
  *  - temperature mix: per-source aggregates (sources ≪ corpus), pure
  *    arithmetic after one narrow scan.
  */
object Selection {

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the log-likelihood ratio of a TARGET unigram model to
    * the RAW-pool unigram model, both estimated over a fixed hashed
    * feature space, then keep the top quarter by score.
    *
    * Mechanics: tokens hash into `buckets` = 4096 FNV-1a buckets
    * (hashing bounds the model at any vocabulary — DSIR's own trick, and
    * at 100 TB the reason the weight table is kilobytes); target counts
    * come from the `lang = targetLang` slice, raw counts from the whole
    * pool; per-bucket weight w_b = ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B))
    * (add-one smoothing on both models); doc score = Σ m_b·w_b / n_tokens.
    *
    * Determinism across engines: the per-doc sum folds over bucket ids in
    * SORTED order (`sort_array` + ordered fold — bucket ids are unique
    * per doc), both engines evaluate the same `ln` on the same doubles,
    * and the final average is floored to the 1e-4 grid. The keep cut is
    * an ORDER-STATISTIC (the largest floored score with ≥ N/4 docs at or
    * above it — `cum·4 ≥ n` stays in integers), so no interpolated
    * doubles cross the engine seam. Docs with no tokens score 0.0 and
    * face the same cut.
    *
    * The broadcast is safe BY CONSTRUCTION (≤ `buckets` rows — a fixed
    * bound, unlike the corpus-growing vocabulary joins that must stay
    * un-hinted, see [[Pipeline.boilerplateFrom]]). */
  def dsirScores(docs: DataFrame, targetLang: String = "en",
                 buckets: Int = 4096): DataFrame = {
    val docB = bucketCounts(docs, buckets)
    val grid = docB.groupBy(col("b"))
      .agg(sum(when(col("lang") === targetLang, col("m")).otherwise(0L))
        .as("ct"),
        sum(col("m")).as("cr"))
    val totals = docB.agg(
      sum(when(col("lang") === targetLang, col("m")).otherwise(0L)).as("nt"),
      sum(col("m")).as("nr"))
    val scored = docB
      .join(broadcast(grid), Seq("b")) // ≤ `buckets` rows, fixed bound
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        sort_array(collect_list(
          struct(col("b"), col("m"), col("ct"), col("cr")))).as("cs"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        scoreOf(col("cs"), col("n_tokens"), col("nt"), col("nr"), buckets)
          .as("score"))
      .barrier() // read twice: cut derivation + the output join
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(keepCut(scored)))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0.0)).as("dsir_score"),
        (coalesce(col("score"), lit(0.0)) >= col("cut")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** `(doc_id, lang, bucket, multiplicity)` — the one corpus pass every
    * DSIR path shares, materialized. */
  private def bucketCounts(docs: DataFrame, buckets: Int): DataFrame = {
    require((buckets & (buckets - 1)) == 0 && buckets > 0,
      "buckets must be a power of two: the oracle's unsigned-mod and " +
        "Spark's signed pmod agree only when buckets divides 2^64")
    docs
      .select(col("doc_id"), col("lang"),
        explode(tokens(preprocess(col("text")))).as("tk"))
      .select(col("doc_id"), col("lang"),
        pmod(fnv1a64(col("tk")), lit(buckets.toLong)).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("m"))
      .barrier() // read three ways: bucket grid, totals, scoring fold
  }

  /** The per-doc log-likelihood-ratio score: ordered fold over the
    * sorted `(b, m, ct, cr)` structs, averaged and floored to 1e-4 —
    * ONE implementation shared by the self-trained batch path and the
    * frozen-model serve path, so there is no second copy of the
    * arithmetic to drift. */
  private def scoreOf(cs: org.apache.spark.sql.Column,
                      nTokens: org.apache.spark.sql.Column,
                      nt: org.apache.spark.sql.Column,
                      nr: org.apache.spark.sql.Column,
                      buckets: Int): org.apache.spark.sql.Column = {
    val bLit = lit(buckets.toLong)
    val fold = aggregate(cs, lit(0.0), (acc, e) =>
      acc + e.getField("m").cast("double") *
        (log((e.getField("ct") + lit(1L)).cast("double") /
            (nt + bLit).cast("double")) -
          log((e.getField("cr") + lit(1L)).cast("double") /
            (nr + bLit).cast("double"))))
    floor(fold / nTokens.cast("double") * 1e4) / 1e4
  }

  /** The top-quarter order-statistic cut over a `(…, score)` table:
    * largest floored score with `cum·4 ≥ n` (ties inclusive), 0.0 on an
    * empty input. The window runs over the DISTINCT floored scores — a
    * domain bounded by the 1e-4 grid, not the corpus. */
  private def keepCut(scored: DataFrame): DataFrame =
    scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("score").desc)))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n"))))
      .agg(coalesce(max(when(col("cum") * 4 >= col("n"), col("score"))),
        lit(0.0)).as("cut"))

  /** The FROZEN form of the DSIR scorer — the train/serve seam
    * ([[graft.streaming.SelectionStream]] applies it per micro-batch the
    * way [[graft.streaming.CurationStream]] applies its frozen gates):
    * the bucket grid (≤ `buckets` rows, materialized), the two corpus
    * totals, and the keep threshold trained on the corpus snapshot.
    * nt/nr/cut are BOUNDED single-row collects (the IVF-centroid class),
    * never corpus-sized. */
  final case class DsirModel(grid: DataFrame, nt: Long, nr: Long,
                             cut: Double, buckets: Int)

  /** One batch pass over the corpus → frozen model. The scoring fold and
    * cut derivation are the SAME code [[dsirScores]] runs, so the frozen
    * threshold equals the batch query's threshold on the same corpus. */
  def trainDsir(docs: DataFrame, targetLang: String = "en",
                buckets: Int = 4096): DsirModel = {
    val docB = bucketCounts(docs, buckets)
    val grid = docB.groupBy(col("b"))
      .agg(sum(when(col("lang") === targetLang, col("m")).otherwise(0L))
        .as("ct"),
        sum(col("m")).as("cr"))
      .barrier() // ≤ `buckets` rows, re-read on every serve batch
    val t = docB.agg(
      sum(when(col("lang") === targetLang, col("m")).otherwise(0L)).as("nt"),
      sum(col("m")).as("nr")).collect()(0) // BOUNDED: one stats row
    val (nt, nr) = (if (t.isNullAt(0)) 0L else t.getLong(0),
      if (t.isNullAt(1)) 0L else t.getLong(1))
    val scored = docB
      .join(broadcast(grid), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        sort_array(collect_list(
          struct(col("b"), col("m"), col("ct"), col("cr")))).as("cs"))
      .select(col("doc_id"), col("n_tokens"),
        scoreOf(col("cs"), col("n_tokens"), lit(nt), lit(nr), buckets)
          .as("score"))
    DsirModel(grid, nt, nr,
      keepCut(scored).collect()(0).getDouble(0), buckets) // BOUNDED: 1 row
  }

  /** Score a (micro-)batch against a FROZEN model — no corpus access.
    * Buckets unseen at freeze time smooth gracefully (ct=0/cr=0, the
    * add-one floor). For any batch ⊆ the training corpus the output rows
    * are IDENTICAL to [[dsirScores]] over that corpus (spec-proved): the
    * grid join finds every bucket, the fold is the same code in the same
    * order, and the threshold was trained by the same cut. The grid join
    * is an explicit broadcast — safe at any corpus size because the grid
    * is bounded by `buckets`, not the corpus. */
  def dsirApply(batch: DataFrame, model: DsirModel): DataFrame = {
    val scored = batch
      .select(col("doc_id"),
        explode(tokens(preprocess(col("text")))).as("tk"))
      .select(col("doc_id"),
        pmod(fnv1a64(col("tk")), lit(model.buckets.toLong)).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("m"))
      .join(broadcast(model.grid), Seq("b"), "left")
      .select(col("doc_id"), col("b"), col("m"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"),
        sort_array(collect_list(
          struct(col("b"), col("m"), col("ct"), col("cr")))).as("cs"))
      .select(col("doc_id"), col("n_tokens"),
        scoreOf(col("cs"), col("n_tokens"), lit(model.nt), lit(model.nr),
          model.buckets).as("score"))
    batch.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0.0)).as("dsir_score"),
        (coalesce(col("score"), lit(0.0)) >= lit(model.cut)).as("keep"))
  }

  /** Quality-WEIGHTED reproducible sampling (the Efraimidis–Spirakis
    * exponential race, keyed deterministically): per source, keep the k
    * docs with the smallest `−ln(u)/w` where `u` is a uniform hash of
    * the doc id and `w = quality_score + 1e-4`. Higher quality ⇒ larger
    * w ⇒ stochastically smaller key ⇒ more likely sampled — a weighted
    * sample without replacement that any engine reproduces bit-for-bit
    * (no RNG state; the "randomness" is FNV-1a, the same trick as
    * [[Pipeline.stratifiedSample]]'s unweighted reservoir).
    *
    * Scale shape: quality is one narrow scan, the per-source top-k is a
    * `WindowGroupLimit` map-side rank cap — never a global sort.
    * Determinism: u = signed_hash/2^64 + 0.5 ∈ [0,1) (exact power-of-two
    * scaling), clamped to ≥ 2^-64 before `ln` (both operands exact in
    * binary); key ordering compares identical doubles in both engines,
    * ties break on doc_id; the reported key floors to the 1e-6 grid. */
  def weightedSample(docs: DataFrame, k: Int = 10): DataFrame = {
    val two64 = math.pow(2, 64) // exact: a power of two
    val u = fnv1a64(col("doc_id").cast("string")).cast("double") /
      lit(two64) + lit(0.5)
    val key = -log(greatest(u, lit(1.0) / lit(two64))) /
      (col("quality_score") + lit(0.0001))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("sample_key"), col("doc_id"))
    graft.operators.TextAnalysis
      .qualityScores(docs, carry = Seq("source"), sorted = false)
      .select(col("source"), col("doc_id"), col("quality_score"),
        key.as("sample_key"))
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= k)
      .select(col("source"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("quality_score"),
        (floor(col("sample_key") * 1e6) / 1e6).as("sample_key"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Temperature-flattened source weights — the multilingual-mix
    * convention (sampling probability ∝ n_s^α): small sources are
    * up-weighted relative to their natural share so the mix is not
    * dominated by the largest crawl. α is FIXED at 0.5 (temperature 2)
    * because `sqrt` is correctly rounded under IEEE 754 in both engines
    * while a general `pow` is libm-dependent — the one α where the
    * cross-engine hash check is exact. Outputs per source: natural token
    * share, the temperature weight, and the implied up/down-sampling
    * boost (weight / share).
    *
    * Determinism: the flattened masses are floored to the 1e-6 grid and
    * summed as DECIMAL (order-free), every ratio divides two identical
    * doubles, and each output ratio is floored back to the grid. */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source"),
        size(tokens(preprocess(col("text")))).cast("long").as("ntok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .barrier() // |sources| rows; read twice (totals + output) — without
    // this the totals branch re-runs the whole tokenize scan
    val flat = perSrc.select(col("source"), col("n_docs"), col("n_tokens"),
      (floor(sqrt(col("n_tokens").cast("double")) * 1e6) / 1e6)
        .cast("decimal(28,6)").as("q"))
    val totals = flat.agg(sum(col("q")).as("qt"), sum(col("n_tokens")).as("tt"))
    flat.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (floor(col("n_tokens").cast("double") / col("tt").cast("double")
          * 1e6) / 1e6).as("nat_share"),
        (floor(col("q").cast("double") / col("qt").cast("double")
          * 1e6) / 1e6).as("temp_weight"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("nat_share"), col("temp_weight"),
        when(col("nat_share") > 0,
          floor(col("temp_weight") / col("nat_share") * 1e4) / 1e4)
          .otherwise(0.0).as("boost"))
      .orderBy(col("source"))
  }
}
