package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions.preprocess
import graft.operators.Rag

/** Streaming context-packing serve path — the per-micro-batch twin of
  * [[graft.operators.Rag.contextPack]], completing the RAG serve family
  * next to [[RetrievalStream]] (BM25) and [[RerankStream]] (two-stage
  * dense): the chunk store (vectors + token costs off ONE barriered
  * chunk pass) is built by a batch pass and FROZEN
  * ([[Rag.buildChunkStore]]), and each arriving micro-batch of raw
  * queries is cleaned, embedded, shortlisted against the frozen chunks,
  * and packed under the token budget through the SAME
  * [[Rag.contextPackFrom]] prefix-budget rule the batch path uses.
  *
  * Per-trigger cost: one chunk-store scan for the shortlist (swap the
  * IVF form in for a pruned scan) + work bounded by `batch queries ×
  * shortlist` for the cost attach and prefix window. Queries are
  * stateless across batches (a packing depends only on the query vector
  * and the frozen store) — no watermark, no state store; re-freeze on
  * the index-rebuild cadence.
  *
  * Fidelity contract (spec-proved): for any query batch, streamed
  * packings are identical to the batch `contextPack` over the same
  * corpus — same dataflow, parameterized by the frozen store. */
object ContextPackStream {

  /** Pack a stream of raw `(query_id, text)` queries against a frozen
    * chunk store, appending `(query_id, rank, vec_id, score, n_tokens,
    * cum_tokens, kept)` rows to `outPath` per batch. Queries whose
    * cleaned text is empty are dropped (the batch path's retrievable-
    * universe rule — a zero vector has no cosine ranking). */
  def start(spark: SparkSession, queryStream: DataFrame,
            store: Rag.ChunkStore, outPath: String, checkpoint: String,
            budget: Long = 150, shortlist: Int = 5): StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val qs = batch
          .filter(length(trim(preprocess(col("text")))) > 0)
          .select(col("query_id"),
            graft.functions.hash_embed(preprocess(col("text")), 64).as("qv"))
        Rag.contextPackFrom(qs, store, budget, shortlist)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
