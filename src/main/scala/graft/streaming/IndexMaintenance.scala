package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions._
import graft.functions.TextFunctions.preprocess

/** Incremental index maintenance: the streaming form of the reference's
  * POST /refresh-index (controllers/index_controller.py — there, a full
  * rebuild; here, new documents are embedded, assigned to the persisted
  * centroids, and appended to the partitioned posting lists as they
  * arrive). `IvfIndex.searchPersisted` over the growing index stays
  * correct because search prunes by partition directory, not by file
  * manifest.
  */
object IndexMaintenance {

  /** Start appending a document stream (`doc_id`, `text`) to a persisted
    * IVF index at `indexPath` (must already contain `/centroids`).
    * foreachBatch keeps the write idempotent per micro-batch and lets the
    * assignment reuse the batch DataFrame machinery. */
  def start(spark: SparkSession, docStream: DataFrame, indexPath: String,
            dim: Int = 64): StreamingQuery = {
    val cents = spark.read.parquet(s"$indexPath/centroids")
    docStream
      .select(col("doc_id").as("vec_id"),
        hash_embed(preprocess(col("text")), dim).as("embedding"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexPath/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("centroid_id"),
            (lit(1.0) - cosine_similarity(col("embedding"), col("cv")))
              .as("dist"))
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("centroid_id"), col("embedding")))
            .as("best"))
          .select(col("vec_id"), col("best.embedding").as("embedding"),
            col("best.centroid_id").as("centroid_id"))
          .write.mode("append").partitionBy("centroid_id")
          .parquet(s"$indexPath/postings")
        ()
      }
      .start()
  }
}
