package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Bm25

/** Streaming retrieval serve path — the per-micro-batch twin of
  * [[graft.operators.Bm25.topK]]: the inverted index and corpus stats
  * are built by ONE batch pass and FROZEN ([[Bm25.buildIndex]]
  * materializes both), and each arriving micro-batch of parsed queries
  * (`(query_id, term)` rows) is scored against them.
  *
  * The split matters at 100 TB exactly as it does for the curation
  * funnel ([[CurationStream]]) and the IVF serve path
  * ([[IndexMaintenance]]): the index is the corpus-sized artifact, and
  * re-deriving it per trigger would re-scan the corpus; frozen, a
  * micro-batch costs `postings matching the batch's terms` — the
  * broadcast query-term semi-join prunes the postings scan before any
  * scoring, so latency is bounded by the batch's term selectivity, not
  * the corpus. Queries are stateless across batches (a query's ranking
  * depends only on its own terms and the frozen index), so there is no
  * watermark or state store — re-freeze on the index-rebuild cadence.
  *
  * Fidelity contract (spec-proved): scoring runs [[Bm25.topKFrom]] —
  * the SAME arithmetic the batch path uses, parameterized by the frozen
  * index — so for any query batch, streamed rankings are identical to
  * batch [[Bm25.topK]] over the same corpus. */
object RetrievalStream {

  /** Score a stream of parsed queries against a frozen index, appending
    * `(query_id, rank, doc_id, score)` rows to `outPath` per batch. */
  def start(spark: SparkSession, queryStream: DataFrame, index: Bm25.Bm25Index,
            outPath: String, checkpoint: String, topK: Int = 10)
      : StreamingQuery =
    queryStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Bm25.topKFrom(index, batch, topK = topK)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
