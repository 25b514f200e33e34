package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions.preprocess
import graft.operators.Search
import graft.sources.Tables

/** API-level facade: the reference's HTTP surface re-expressed as batch
  * operators over DataFrames.
  *
  * | reference endpoint            | here            |
  * |-------------------------------|-----------------|
  * | POST /refresh-index           | [[buildIndex]]  |
  * | GET /search?q=&k=             | [[search]]      |
  * | /qa context retrieval (top-1, dist<0.4) | [[qaContext]] |
  * | GET /health                   | [[healthCheck]] |
  *
  * Embeddings use the deterministic hashing-trick encoder standing in for
  * the reference's sentence-transformer model; the search path (broadcast
  * query × corpus scan × bounded top-k) is the part that must scale.
  */
final class SearchEngine(spark: SparkSession, dir: String, dim: Int = 64) {
  private val t = Tables(spark, dir)

  /** Clean + embed every document (reference: init_index_service /
    * refresh_index, services/index_service.py:55-114). */
  def buildIndex(): DataFrame =
    t.documents.select(
      col("doc_id"),
      preprocess(col("text")).as("clean_text"),
      hash_embed(preprocess(col("text")), dim).as("embedding"))

  private def corpus: DataFrame =
    buildIndex().select(col("doc_id").as("vec_id"), col("embedding"))

  /** Reference: controllers/search_controller.py — k capped at 20, query
    * length capped at 500 chars, score = 1 - cosine distance. */
  def search(queryText: String, k: Int = 3): DataFrame = {
    require(queryText.trim.nonEmpty, "Query parameter 'q' is required")
    require(queryText.length <= 500, "Query text is too long (max 500 characters)")
    val kk = math.min(k, 20)
    val q = spark.range(1).select(
      col("id").as("query_id"),
      hash_embed(preprocess(lit(queryText)), dim).as("qv"))
    Search.bruteForceTopK(q, corpus, kk)
      .join(t.documents.select(col("doc_id").as("vec_id"), col("text")), Seq("vec_id"))
      .select(col("rank"), col("vec_id").as("doc_id"), col("score"),
        col("text").as("description"))
      .orderBy(col("rank"))
  }

  /** Reference: qa_service.get_product_context_from_query — best match,
    * kept only when cosine distance < 0.4. */
  def qaContext(queryText: String): DataFrame = {
    val q = spark.range(1).select(
      col("id").as("query_id"),
      hash_embed(preprocess(lit(queryText)), dim).as("qv"))
    Search.thresholdRetrieval(q, corpus, maxDistance = 0.4)
  }

  /** Reference: controllers/health_controller.py — data reachable and
    * index non-empty. */
  def healthCheck(): Boolean =
    !t.documents.isEmpty && !corpus.isEmpty
}
