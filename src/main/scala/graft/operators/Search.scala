package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Similarity search over embedding columns — the Spark-native form of the
  * reference's HNSW index + `knn_query`
  * (reference: services/index_service.py:102-108,
  * controllers/search_controller.py:27-41).
  *
  * Brute force is EXACT and embarrassingly parallel: one scan of the
  * corpus, queries broadcast, per-partition bounded top-k heaps partially
  * aggregated map-side (shuffle volume = partitions × k × queries,
  * independent of corpus size). This is the 100 TB baseline; the
  * partition-pruned approximate path is [[IvfIndex]].
  */
object Search {

  /** Exact top-k: `queries(query_id, qv)` × `corpus(vec_id, embedding)` →
    * (query_id, rank, vec_id, score). Scores floored at 1e-6 for
    * engine-portable output; ties broken by vec_id asc. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val sims = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("qv"), col("embedding")).as("sim"))
    explodeTopK(
      sims.groupBy(col("query_id"))
        .agg(top_k_by_score(col("sim"), col("vec_id"), k).as("topk")))
  }

  /** Fused top-k via the custom physical operator
    * [[graft.plans.VectorTopKJoinExec]]: one corpus scan, per-query bounded
    * heaps, no (corpus × query) row ever materialized. Same contract and
    * output as [[bruteForceTopK]]. */
  def fusedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val spark = corpus.sparkSession
    bridge.installStrategy(spark, graft.plans.VectorTopKStrategy)
    bridge.installOptimization(spark, graft.plans.PushThresholdIntoVectorTopK)
    bridge.ofRows(spark, graft.plans.VectorTopKJoin(
      bridge.planOf(queries.select(col("query_id"), col("qv"))),
      bridge.planOf(corpus.select(col("vec_id"), col("embedding"))),
      k))
  }

  /** Install the auto-fusion rule: after this, the DECLARATIVE
    * [[bruteForceTopK]] pattern (aggregate over cross join) is planned as
    * the fused operator automatically — users keep the DataFrame form,
    * the engine substitutes [[graft.plans.VectorTopKAggExec]]. */
  def installAutoFusion(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.bridge
    bridge.installStrategy(spark, graft.plans.VectorTopKAggStrategy)
    bridge.installOptimization(spark, graft.plans.AutoFuseTopK)
  }

  /** Uninstall removes only the REWRITE rule. The strategy stays: it is
    * shared by [[installSqlAutoFusion]]'s window rule (removing it while
    * the other rule is live leaves un-plannable [[graft.plans.VectorTopKAgg]]
    * nodes), and with no rule emitting those nodes it is inert. */
  def uninstallAutoFusion(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.bridge
    bridge.uninstallOptimization(spark, graft.plans.AutoFuseTopK)
  }

  /** Install auto-fusion for the SQL surface: after this, the WINDOW
    * top-k pattern (`ROW_NUMBER() OVER (PARTITION BY q ORDER BY
    * cosine_similarity(...) DESC, id) ... WHERE rn <= k` over a cross
    * join) is planned as [[graft.plans.VectorTopKAggExec]] — pure
    * declarative SQL, fused physical operator. */
  def installSqlAutoFusion(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.bridge
    bridge.installStrategy(spark, graft.plans.VectorTopKAggStrategy)
    bridge.installOptimization(spark, graft.plans.AutoFuseWindowTopK)
  }

  /** Rule-only removal — see [[uninstallAutoFusion]] for why the shared
    * strategy stays installed. */
  def uninstallSqlAutoFusion(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.bridge
    bridge.uninstallOptimization(spark, graft.plans.AutoFuseWindowTopK)
  }

  /** array<struct<score,id>> "topk" column → (query_id, rank, vec_id, score). */
  private[graft] def explodeTopK(grouped: DataFrame): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as("vec_id"),
        (floor(col("hit.score") * 1e6) / 1e6).as("score"))
      .orderBy(col("query_id"), col("rank"))

  /** Exact top-k over an int8-quantized corpus: the corpus is stored as
    * `quantize8(embedding)` (4× smaller at rest, in cache, and on the
    * wire) and dequantized on the fly inside the scan — the memory-lean
    * configuration for a 100 TB corpus. Same output contract as
    * [[bruteForceTopK]]; scores differ only by the quantization error
    * (cosine fidelity > 0.999 per the round-trip audit). */
  def quantizedTopK(queries: DataFrame, quantizedCorpus: DataFrame,
                    k: Int): DataFrame = {
    val sims = quantizedCorpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("qv"), dequantize8(col("qcodes"))).as("sim"))
    explodeTopK(
      sims.groupBy(col("query_id"))
        .agg(top_k_by_score(col("sim"), col("vec_id"), k).as("topk")))
  }

  /** Top-1 with acceptance gate: the reference keeps the best match only if
    * cosine distance < `maxDistance` (qa_service.py:150-168, threshold 0.4).
    * Every query keeps its row; `accepted` carries the gate. */
  def thresholdRetrieval(queries: DataFrame, corpus: DataFrame,
                         maxDistance: Double = 0.4): DataFrame = {
    val sims = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("qv"), col("embedding")).as("sim"))
    sims.groupBy(col("query_id"))
      .agg(top_k_by_score(col("sim"), col("vec_id"), 1).as("topk"))
      .select(col("query_id"),
        col("topk").getItem(0).getField("id").as("best_id"),
        (floor(col("topk").getItem(0).getField("score") * 1e6) / 1e6).as("best_score"),
        (lit(1.0) - col("topk").getItem(0).getField("score") < maxDistance)
          .as("accepted"))
      .orderBy(col("query_id"))
  }

  /** Topic-change detection: cosine of each vector vs the previous one in
    * its stream; change when similarity < `threshold`
    * (reference: qa_service.py:170-196, threshold 0.75). First element of a
    * stream has no context → change = true, sim = null. */
  def topicChanges(vectors: DataFrame, streamKey: Column, order: Column,
                   threshold: Double = 0.75): DataFrame = {
    val w = Window.partitionBy(streamKey).orderBy(order)
    vectors
      .withColumn("prev", lag(col("embedding"), 1).over(w))
      .select(streamKey, order,
        (floor(cosine_similarity(col("prev"), col("embedding")) * 1e6) / 1e6)
          .as("sim_to_prev"),
        coalesce(
          cosine_similarity(col("prev"), col("embedding")) < threshold,
          lit(true)).as("topic_change"))
  }
}
