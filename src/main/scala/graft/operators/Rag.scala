package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions.preprocess
import graft.operators.Barrier.BarrierOps

/** RAG prompt assembly: the step between retrieval and generation. The
  * reference assembles its QA prompt from the retrieved context plus
  * history (`services/qa_service.py:150-168` keeps the best match,
  * `q_qa_context` renders the history window); at corpus scale the
  * context side is a CHUNK shortlist packed under the model's token
  * budget — this operator is that packing decision as data.
  */
object Rag {

  /** Multi-vector LATE-INTERACTION retrieval (the ColBERT MaxSim family,
    * at chunk granularity — the long-document form): a document is its
    * SET of chunk vectors, a query is its set of chunk vectors, and
    * `score(q, d) = Σ_{qc ∈ q} max_{dc ∈ d} cos(qc, dc)` — each query
    * aspect independently finds its best-matching passage, which is
    * exactly what single-vector pooling destroys (spec plants a
    * two-topic query that MaxSim ranks correctly and mean-pooled
    * single-vector retrieval cannot).
    *
    * Determinism: the per-(query-chunk, doc) max is order-free; each max
    * is floored to a 1e-6 INTEGER before the Σ, so the cross-aspect sum
    * is exact integer addition (never an order-dependent float sum).
    * Ranking is per query by the integer `msum` (the query's chunk count
    * is constant within a query, so sum-rank = mean-rank), doc_id ties.
    *
    * Scale shape: ONE chunk scan (barriered, shared with the query
    * side); the bounded query-chunk set BROADCASTS into the corpus-chunk
    * scan; the max collapses the doc-chunk dimension map-side (partial
    * max combine — shuffle rows ∝ query_chunks × docs, never chunks);
    * the final top-k is a bounded per-query heap. */
  def lateInteraction(docs: DataFrame, k: Int = 5,
                      queryMaxId: Long = 3): DataFrame = {
    val cv = TextAnalysis.chunks(docs)
      .select(col("doc_id"), col("chunk_id"),
        hash_embed(col("chunk_text"), 64).as("v"))
      .barrier() // read 2×: corpus side + query side
    val qcv = cv.filter(col("doc_id") < queryMaxId)
      .select(col("doc_id").as("query_id"), col("chunk_id").as("qc"),
        col("v").as("qv"))
    val perAspect = cv.crossJoin(broadcast(qcv))
      .select(col("query_id"), col("qc"), col("doc_id"),
        cosine_similarity(col("qv"), col("v")).as("sim"))
      .groupBy(col("query_id"), col("qc"), col("doc_id"))
      .agg(max(col("sim")).as("m"))
    val scored = perAspect
      .select(col("query_id"), col("doc_id"),
        floor(col("m") * 1e6).cast("long").as("im"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("im")).as("msum"))
    scored
      .groupBy(col("query_id"))
      .agg(top_k_by_score(col("msum").cast("double"), col("doc_id"), k)
        .as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as("doc_id"),
        (col("hit.score") / 1e6).as("sum_maxsim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Token-budget context packing over the chunked-retrieval shortlist
    * (`q_rag_search`'s composition): per query, the top-`shortlist`
    * chunks in rank order annotated with their token cost, the running
    * prefix total, and the `kept` verdict — a chunk is kept while the
    * PREFIX fits (`cum_tokens ≤ budget`; truncate-at-overflow, the
    * standard prompt-window rule — rank order is relevance order, so a
    * later smaller chunk never jumps an overflowing better one).
    *
    * Scale shape: one chunk pass (barriered — embeddings and token
    * costs share it), ONE corpus scan for the shortlist
    * ([[Search.bruteForceTopK]]), then the bounded shortlist BROADCASTS
    * into a hash-join probe of the chunk token table and the prefix
    * window runs over ≤ `shortlist` rows per query. */
  def contextPack(docs: DataFrame, budget: Long = 150, shortlist: Int = 5,
                  queryMaxId: Long = 3): DataFrame = {
    val store = buildChunkStore(docs)
    val qs = docs
      .filter(col("doc_id") < queryMaxId &&
        length(trim(preprocess(col("text")))) > 0)
      .select(col("doc_id").as("query_id"),
        hash_embed(preprocess(col("text")), 64).as("qv"))
    contextPackFrom(qs, store, budget, shortlist)
  }

  /** The frozen corpus side of the packing serve path: chunk vectors
    * and chunk token costs derived from ONE barriered chunk pass —
    * build once per corpus snapshot, re-freeze on the index-rebuild
    * cadence (the [[graft.operators.Bm25.buildIndex]] convention). */
  final case class ChunkStore(corpus: DataFrame, costs: DataFrame)

  def buildChunkStore(docs: DataFrame): ChunkStore = {
    val ch = TextAnalysis.chunks(docs)
      .barrier() // read 2×: chunk embeddings + chunk token costs
    val key = (col("doc_id") * lit(4294967296L) + col("chunk_id")).as("vec_id")
    ChunkStore(
      ch.select(key, hash_embed(col("chunk_text"), 64).as("embedding")),
      ch.select(key, col("n_tok")))
  }

  /** [[contextPack]] for a PRE-EMBEDDED query table `(query_id, qv)`
    * against a [[ChunkStore]] — the serve-path entry the streaming twin
    * calls per micro-batch, so there is exactly one implementation of
    * the shortlist + prefix-budget rule. Queries are stateless (a
    * packing depends only on the query vector and the frozen store), so
    * batch and streamed results are identical by construction. */
  def contextPackFrom(queries: DataFrame, store: ChunkStore,
                      budget: Long = 150, shortlist: Int = 5): DataFrame = {
    val sl = Search.bruteForceTopK(queries, store.corpus, shortlist)
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    store.costs.join(broadcast(sl), Seq("vec_id"))
      .withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("score"), col("n_tok").as("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("kept"))
      .orderBy(col("query_id"), col("rank"))
  }
}
