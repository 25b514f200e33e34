package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Pipeline
import graft.operators.Barrier.BarrierOps

/** Streaming dataset card — the serve-path twin of
  * [[graft.operators.Pipeline.datasetCard]]: the release summary a
  * training-data consumer reads, kept current as document micro-batches
  * land, without ever re-reading the corpus.
  *
  * The decomposition mirrors the card's math: every constituent except
  * the vocabulary and the exact-dup group count is DOCUMENT-LOCAL
  * ([[Pipeline.cardDocStats]] — token count, text hash, language
  * verdict, quality, gopher keep, PII bit), so each micro-batch appends
  * its per-doc contribution rows (bytes per doc) to a stats store. The
  * two corpus-relative counts are distinct-key counts, and a distinct
  * is append-friendly: the batch's DISTINCT tokens append to a token
  * store (its union re-deduped at read — the same append-then-dedup
  * shape as [[IncrementalDedupStream]]'s signature store), and the dup
  * groups are the distinct `text_hash`es already in the stats store.
  * [[card]] then assembles the SAME one-row summary from the stores —
  * the corpus itself is read exactly once, incrementally, by the
  * stream.
  *
  * Replay safety: `foreachBatch` parquet appends are at-least-once — a
  * recovered query can append a batch's rows twice. Contributions are
  * deterministic per doc, so [[card]] collapses replays with ONE
  * `dropDuplicates(doc_id)` over the compact stats store (and the token
  * store is deduped by construction); the emitted card is exact either
  * way the stream dies.
  *
  * Fidelity contract (spec-proved in StreamingSpec): after streaming a
  * corpus in any batching, [[card]] equals the batch
  * [[Pipeline.datasetCardFrom]] over the same corpus, bit for bit. */
object DatasetCardStream {

  /** Run the card-contribution funnel over a document stream: per
    * micro-batch, append per-doc stats to `statsPath` and the batch's
    * distinct tokens to `tokensPath`. */
  def start(docStream: DataFrame, statsPath: String, tokensPath: String,
            checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val clean = batch
          .select(col("doc_id"), preprocess(col("text")).as("clean"))
          .barrier() // one normalization pass per batch (see batch card)
        val toks = clean
          .select(col("doc_id"), tokens(col("clean")).as("toks"))
          .barrier()
        Pipeline.cardDocStats(batch, clean, toks)
          .write.mode("append").parquet(statsPath)
        toks.select(explode(col("toks")).as("tk")).distinct()
          .write.mode("append").parquet(tokensPath)
        ()
      }
      .start()

  /** The release card served from the stores: identical to the batch
    * card over the union of every streamed batch. */
  def card(spark: SparkSession, statsPath: String,
           tokensPath: String): DataFrame =
    Pipeline.cardAssemble(
      spark.read.parquet(statsPath).dropDuplicates("doc_id"),
      spark.read.parquet(tokensPath))
}
