package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Rerank

/** Streaming two-stage retrieval serve path — the per-micro-batch twin
  * of [[graft.operators.Rerank.rerankedSearch]], completing the dense
  * stack the way [[RetrievalStream]] does for BM25: the corpus side
  * (cleaned text + the embeddings derived from it) is built by ONE batch
  * pass and FROZEN ([[Rerank.frozenBase]]), and each arriving
  * micro-batch of raw queries is cleaned, embedded, shortlisted against
  * the frozen corpus, and re-ranked through the SAME
  * [[Rerank.PairScorer]] seam the batch path uses.
  *
  * Per-trigger cost: one corpus scan for the shortlist (the stage-1
  * contract — swap the IVF form in for a pruned scan) + work bounded by
  * `batch queries × shortlist` for everything after. Queries are
  * stateless across batches (a ranking depends only on the query text
  * and the frozen corpus), so there is no watermark or state store —
  * re-freeze on the index-rebuild cadence.
  *
  * Fidelity contract (spec-proved): scoring runs [[Rerank.rerankFrom]] —
  * the SAME dataflow the batch path uses, parameterized by the frozen
  * base — so for any query batch, streamed rankings are identical to the
  * batch rerank over the same corpus. */
object RerankStream {

  /** Re-rank a stream of raw `(query_id, text)` queries against a frozen
    * corpus base, appending `(query_id, rank, doc_id, ce_score,
    * ret_score)` rows to `outPath` per batch. */
  def start(spark: SparkSession, queryStream: DataFrame, base: DataFrame,
            outPath: String, checkpoint: String, shortlist: Int = 20,
            k: Int = 5, scorer: Rerank.PairScorer = Rerank.OverlapScorer)
      : StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Rerank.rerankFrom(Rerank.cleanQueries(batch), base,
            shortlist, k, scorer)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
