package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions._
import graft.functions.TextFunctions._
import graft.operators.Pipeline
import graft.operators.Barrier.BarrierOps

/** Streaming curation — the per-micro-batch twin of
  * [[graft.operators.Pipeline.curate]], in the shape a production
  * pipeline actually deploys: corpus statistics are a MODEL, trained by
  * one batch pass and FROZEN; the stream applies the gates against them.
  *
  * The split matters at 100 TB: four of the five gates are corpus-
  * relative (boilerplate df, hot duplicated windows, the bigram LM,
  * the benchmark gram set), and recomputing any of them per micro-batch
  * would re-read the corpus on every trigger. Frozen, each batch's
  * verdicts are embarrassingly parallel — tokenization plus joins
  * against the stat tables, no cross-batch state at all (the state-FUL
  * streaming problems live in the other twins; curation is deliberately
  * the stateless one). Re-freeze on a cadence (weekly, per corpus
  * snapshot) exactly like re-training the IVF centroids
  * ([[IndexMaintenance]] keeps serving between rebuilds).
  *
  * Broadcast posture: only the BENCHMARK gram set carries an explicit
  * broadcast hint (bounded by contract — an eval suite). The four
  * corpus-relative stat tables grow with corpus vocabulary/content, and
  * a forced hint would override Spark's size threshold and fail the job
  * at the broadcast hard limit on a large freeze — the exact hazard the
  * `autoBroadcast` gates close in `Dedup.incrementalProbe` and
  * `Relational.mergeOrders`. Their joins are left un-hinted: AQE picks
  * a runtime broadcast while the tables are small and a shuffled join
  * once they aren't.
  *
  * Fidelity contract (spec-proved): gates applied with stats frozen
  * from corpus C produce, for any batch ⊆ C, verdicts IDENTICAL to the
  * batch [[Pipeline.curate]] over C — the gate arithmetic below mirrors
  * each batch gate term for term, and unseen-at-freeze bigrams/grams
  * degrade gracefully (add-one smoothing with cb=0/cu=0; a gram absent
  * from the frozen df table is simply not boilerplate). */
object CurationStream {

  /** The frozen corpus statistics (all [[graft.operators.Barrier]]-materialized — each table
    * is re-read on every micro-batch):
    *  - `hotGrams` (gh): boilerplate grams with df ≥ minDf at freeze;
    *  - `hotWindows` (wh): k-token windows occurring ≥ 2× at freeze;
    *  - `bigrams` (bg, cb) / `prefixes` (w1, cu) / `vocabSize`: the
    *    add-one bigram LM;
    *  - `benchGrams` (gram): the decontamination benchmark set. */
  final case class FrozenStats(hotGrams: DataFrame, hotWindows: DataFrame,
                               bigrams: DataFrame, prefixes: DataFrame,
                               vocabSize: Long, benchGrams: DataFrame)

  /** One batch pass over the corpus (and the benchmark set) → frozen
    * stats. Mirrors the stat-building halves of the batch gates. */
  def freezeStats(docs: DataFrame, bench: DataFrame, boilerN: Int = 5,
                  boilerMinDf: Int = 3, windowK: Int = 5,
                  decontamN: Int = 8): FrozenStats = {
    val toks = docs
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .barrier()
    val hotGrams = toks
      .select(col("doc_id"), array_distinct(shingles(col("toks"), boilerN)).as("gs"))
      .barrier() // barrier: Generate re-evaluation (see boilerplate)
      .select(explode(col("gs")).as("gram"))
      .select(fnv1a64(col("gram")).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= boilerMinDf)
      .select(col("gh"))
      .barrier()
    val hotWindows = toks
      .select(col("doc_id"), shingles(col("toks"), windowK).as("ws"))
      .barrier()
      .select(explode(col("ws")).as("w"))
      .select(fnv1a64(col("w")).as("wh"))
      .groupBy(col("wh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("wh"))
      .barrier()
    val bigrams = toks
      .select(explode(shingles(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      .barrier()
    val prefixes = bigrams
      .select(split(col("bg"), " ").getItem(0).as("w1"), col("cb"))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
      .barrier()
    val vocabSize = toks
      .select(explode(col("toks")).as("tk"))
      .distinct() // two-level exact distinct (see Pipeline.cardAssemble)
      .count()
    val benchGrams = bench
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .select(col("doc_id"), array_distinct(shingles(col("toks"), decontamN)).as("grams"))
      .barrier()
      .select(explode(col("grams")).as("gram")).distinct()
      .barrier()
    FrozenStats(hotGrams, hotWindows, bigrams, prefixes, vocabSize, benchGrams)
  }

  /** Apply all five gates to one (micro-)batch with frozen stats.
    * Output = [[Pipeline.curate]]'s verdict schema.
    *
    * Every gate runs the BATCH operator's own code, parameterized by the
    * frozen stat table (the `hotGrams`/`hotWindows`/`model`/
    * `frozenBenchGrams` seams) — there is no second implementation of
    * any gate's arithmetic to drift from the batch semantics; the
    * corpus-equality spec in StreamingSpec pins the composition. */
  def applyGates(batch: DataFrame, st: FrozenStats,
                 maxAvgNll: Double = 10.0, boilerN: Int = 5,
                 boilerMaxFrac: Double = 0.5, windowK: Int = 5,
                 windowMaxFrac: Double = 0.5, decontamN: Int = 8)
      : DataFrame = {
    val toks = batch
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .barrier()
    val g = Pipeline.gopherStatsFrom(toks)
      .select(col("doc_id"), col("keep").as("keep_gopher"))
    val l = graft.operators.TextAnalysis.lmScoresFrom(toks, maxAvgNll,
        model = Some(graft.operators.TextAnalysis.LmModel(
          st.bigrams, st.prefixes, st.vocabSize)))
      .select(col("doc_id"), col("keep").as("keep_lm"))
    val b = Pipeline.boilerplateFrom(toks, boilerN, maxFrac = boilerMaxFrac,
        hotGrams = Some(st.hotGrams))
      .select(col("doc_id"), col("keep").as("keep_boiler"))
    val w = graft.operators.Dedup.windowDupCoverageFrom(toks, windowK,
        windowMaxFrac, hotWindows = Some(st.hotWindows))
      .select(col("doc_id"), col("keep").as("keep_windows"))
    val d = Pipeline.decontaminateFrom(toks, toks.limit(0), decontamN,
        frozenBenchGrams = Some(st.benchGrams))
      .select(col("doc_id"), (!col("contaminated")).as("keep_decontam"))
    g.join(l, Seq("doc_id")).join(b, Seq("doc_id")).join(w, Seq("doc_id"))
      .join(d, Seq("doc_id"))
      .select(col("doc_id"), col("keep_gopher"), col("keep_lm"),
        col("keep_boiler"), col("keep_windows"), col("keep_decontam"),
        (col("keep_gopher") && col("keep_lm") && col("keep_boiler") &&
          col("keep_windows") && col("keep_decontam")).as("keep"))
  }

  /** Run the frozen-stats funnel over a document stream, appending
    * verdict rows to `outPath` per micro-batch. */
  def start(spark: SparkSession, docStream: DataFrame, st: FrozenStats,
            outPath: String, checkpoint: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyGates(batch, st)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
