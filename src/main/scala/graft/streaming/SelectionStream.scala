package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Selection
import graft.operators.Selection.DsirModel

/** Streaming data selection — the serve twin of
  * [[graft.operators.Selection.dsirScores]], deployed the way
  * [[CurationStream]] deploys the curation gates: the importance model
  * (bucket grid, corpus totals, keep threshold) is TRAINED by one batch
  * pass and FROZEN; each micro-batch scores against it with zero corpus
  * access.
  *
  * The split matters at 100 TB for the same reason as curation: the
  * model is corpus-relative (target/raw counts and the quarter cut),
  * and re-deriving it per trigger would re-read the corpus. Frozen, a
  * batch costs one tokenize pass plus a broadcast join against a table
  * bounded by `buckets` (kilobytes at ANY corpus size — DSIR's hashed
  * feature space is exactly what makes the serve path this cheap).
  * Re-freeze on a corpus-snapshot cadence like the IVF centroids
  * ([[IndexMaintenance]]) and the curation stats.
  *
  * Fidelity contract (spec-proved): for any batch ⊆ the training
  * corpus, [[Selection.dsirApply]] emits rows IDENTICAL to the batch
  * [[Selection.dsirScores]] over that corpus — same fold code, same
  * grid rows, same frozen threshold. Unseen-at-freeze buckets smooth
  * gracefully (add-one with ct=0/cr=0). */
object SelectionStream {

  /** Run the frozen-model scorer over a document stream, appending
    * verdict rows (`doc_id, n_tokens, dsir_score, keep`) per
    * micro-batch. */
  def start(spark: SparkSession, docStream: DataFrame, model: DsirModel,
            outPath: String, checkpoint: String): StreamingQuery =
    docStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Selection.dsirApply(batch, model)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
