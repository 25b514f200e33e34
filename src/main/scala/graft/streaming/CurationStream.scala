package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions._
import graft.functions.TextFunctions._
import graft.operators.Pipeline

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
  * against bounded broadcast stat tables, no cross-batch state at all
  * (the state-FUL streaming problems live in the other twins; curation
  * is deliberately the stateless one). Re-freeze on a cadence (weekly,
  * per corpus snapshot) exactly like re-training the IVF centroids
  * ([[IndexMaintenance]] keeps serving between rebuilds).
  *
  * Fidelity contract (spec-proved): gates applied with stats frozen
  * from corpus C produce, for any batch ⊆ C, verdicts IDENTICAL to the
  * batch [[Pipeline.curate]] over C — the gate arithmetic below mirrors
  * each batch gate term for term, and unseen-at-freeze bigrams/grams
  * degrade gracefully (add-one smoothing with cb=0/cu=0; a gram absent
  * from the frozen df table is simply not boilerplate). */
object CurationStream {

  /** The frozen corpus statistics (all `localCheckpoint`ed — each table
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
      .localCheckpoint()
    val hotGrams = toks
      .select(col("doc_id"), array_distinct(shingles(col("toks"), boilerN)).as("gs"))
      .localCheckpoint() // barrier: Generate re-evaluation (see boilerplate)
      .select(explode(col("gs")).as("gram"))
      .select(fnv1a64(col("gram")).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= boilerMinDf)
      .select(col("gh"))
      .localCheckpoint()
    val hotWindows = toks
      .select(col("doc_id"), shingles(col("toks"), windowK).as("ws"))
      .localCheckpoint()
      .select(explode(col("ws")).as("w"))
      .select(fnv1a64(col("w")).as("wh"))
      .groupBy(col("wh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("wh"))
      .localCheckpoint()
    val bigrams = toks
      .select(explode(shingles(col("toks"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      .localCheckpoint()
    val prefixes = bigrams
      .select(split(col("bg"), " ").getItem(0).as("w1"), col("cb"))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
      .localCheckpoint()
    val vocabSize = toks
      .select(explode(col("toks")).as("tk"))
      .agg(count_distinct(col("tk"))).head.getLong(0)
    val benchGrams = bench
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .select(col("doc_id"), array_distinct(shingles(col("toks"), decontamN)).as("grams"))
      .localCheckpoint()
      .select(explode(col("grams")).as("gram")).distinct()
      .localCheckpoint()
    FrozenStats(hotGrams, hotWindows, bigrams, prefixes, vocabSize, benchGrams)
  }

  /** Apply all five gates to one (micro-)batch with frozen stats.
    * Output = [[Pipeline.curate]]'s verdict schema. */
  def applyGates(batch: DataFrame, st: FrozenStats,
                 maxAvgNll: Double = 10.0, boilerN: Int = 5,
                 boilerMaxFrac: Double = 0.5, windowK: Int = 5,
                 windowMaxFrac: Double = 0.5, decontamN: Int = 8)
      : DataFrame = {
    val toks = batch
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .localCheckpoint()
    val g = Pipeline.gopherStatsFrom(toks)
      .select(col("doc_id"), col("keep").as("keep_gopher"))

    // bigram-LM score under the FROZEN model (cb/cu/V from freeze time;
    // unseen bigrams score with cb=0/cu=0 — pure add-one smoothing)
    val docBg = toks
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val scored = docBg
      .join(broadcast(st.bigrams), Seq("bg"), "left")
      .join(broadcast(st.prefixes),
        split(col("bg"), " ").getItem(0) === col("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        sort_array(collect_list(struct(col("bg"), col("m"),
          coalesce(col("cb"), lit(0L)).as("cb"),
          coalesce(col("cu"), lit(0L)).as("cu")))).as("cs"))
    val nll = aggregate(col("cs"), lit(0.0), (acc, e) =>
      acc + e.getField("m").cast("double") *
        log((e.getField("cu") + lit(st.vocabSize)).cast("double") /
          (e.getField("cb") + lit(1L)).cast("double")))
    val l = toks.select(col("doc_id"))
      .join(scored.select(col("doc_id"),
        ((nll / col("n_bigrams").cast("double")) <= maxAvgNll).as("keep_lm")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("keep_lm"), lit(true)).as("keep_lm"))

    // boilerplate share vs the frozen hot-gram set
    val docGh = toks
      .select(col("doc_id"), array_distinct(shingles(col("toks"), boilerN)).as("gs"))
      .localCheckpoint()
      .select(col("doc_id"), explode(col("gs")).as("gram"))
      .select(col("doc_id"), fnv1a64(col("gram")).as("gh"))
    val bPer = docGh
      .join(broadcast(st.hotGrams.withColumn("__hot", lit(1))), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__hot").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
    val bFrac = when(col("n_grams") > 0,
      col("n_boiler").cast("double") / col("n_grams").cast("double"))
      .otherwise(lit(0.0))
    val b = toks.select(col("doc_id")).join(bPer, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_boiler"))
      .select(col("doc_id"), (bFrac <= boilerMaxFrac).as("keep_boiler"))

    // duplicated-window coverage vs the frozen hot-window set (the
    // interval union over dup positions, as in windowDupCoverage)
    val wTab = toks
      .select(col("doc_id"), size(col("toks")).as("n_tok"),
        shingles(col("toks"), windowK).as("ws"))
      .localCheckpoint()
    val wpos = wTab
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), fnv1a64(col("w")).as("wh"))
    val dup = wpos.join(broadcast(st.hotWindows), Seq("wh"))
      .select(col("doc_id"), col("pos"))
    val nextPos = lead(col("pos"), 1).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos")))
    val wPer = dup
      .select(col("doc_id"), col("pos"),
        least(lit(windowK), coalesce(nextPos - col("pos"), lit(windowK)))
          .as("cov"))
      .groupBy(col("doc_id")).agg(sum(col("cov")).as("covered"))
    val wFrac = when(col("n_tok") > 0,
      coalesce(col("covered"), lit(0L)).cast("double") /
        col("n_tok").cast("double")).otherwise(lit(0.0))
    val w = wTab.select(col("doc_id"), col("n_tok"))
      .join(wPer, Seq("doc_id"), "left")
      .select(col("doc_id"), (wFrac <= windowMaxFrac).as("keep_windows"))

    // decontamination vs the frozen benchmark gram set
    val hits = toks
      .select(col("doc_id"), array_distinct(shingles(col("toks"), decontamN)).as("grams"))
      .localCheckpoint()
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(st.benchGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val d = toks.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("nsh"), lit(0L)) === 0L).as("keep_decontam"))

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
