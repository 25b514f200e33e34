package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{preprocess, tokens}

/** Okapi BM25 keyword retrieval — the lexical half of a hybrid search
  * stack (the reference serves only the vector half through hnswlib;
  * production retrieval fuses both, see [[Search.rrfFuse]]).
  *
  * Scale shape (100 TB): the inverted-index build is ONE tokenization
  * scan plus one (doc_id, term) groupBy whose partial counts combine
  * map-side — the same cost class as any token-statistics pass, and the
  * only corpus-sized shuffle here. The corpus stats (N, avgdl) derive
  * from the materialized postings (Σtf ≡ Σdl) plus a column-pruned
  * count(*) — NO second tokenize pass ([[statsFromPostings]]; the
  * tokenization regex chain is the measured wall of the build, so
  * running it once, not twice, halves the build). Everything after is bounded by the
  * QUERY set: term postings are restricted by a broadcast semi-join on
  * the query terms before df/idf are even computed, so document
  * frequency, scoring, and ranking touch `docs-matching-query-terms`
  * rows, never the corpus. The final per-query top-k rides the shared
  * bounded-heap aggregate (shuffle = partitions × k × queries).
  *
  * Determinism across engines: k1/b default to DYADIC doubles
  * (1.25 / 0.75) so every literal subexpression (k1+1, 1−b) is exact;
  * per-term scores are floored to the 1e-6 grid and summed as
  * DECIMAL(18,6), making the document score independent of the order
  * floating-point addition happens to visit the matched terms — the
  * same discipline as the curation funnel's decimal folds. The only
  * transcendental is `ln` on identical double inputs in both engines.
  */
object Bm25 {

  /** The inverted index: one row per (doc_id, term) with the term
    * frequency and the document length carried inline (dl is
    * functionally dependent on doc_id, so keeping it in the groupBy key
    * costs nothing and saves the corpus-sized dl join at score time). */
  def invertedIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** The frozen form of the index: postings (doc_id, dl, term, tf) plus
    * the one-row corpus stats (n_docs, avgdl) — everything a scoring
    * pass needs, with the corpus itself out of the picture. The batch
    * path assembles it lazily per query; the serve path
    * ([[graft.streaming.RetrievalStream]]) materializes it once and
    * scores every micro-batch against it, re-freezing on the same
    * cadence the IVF index rebuilds. */
  final case class Bm25Index(postings: DataFrame, stats: DataFrame)

  /** Build and MATERIALIZE the index — ONE tokenization scan: the
    * postings are barriered, and the stats derive from them plus a
    * token-free doc count (see [[statsFromPostings]]). The build-once
    * half of build-once/search-many. */
  def buildIndex(docs: DataFrame): Bm25Index = {
    import graft.operators.Barrier.BarrierOps
    val postings = invertedIndex(docs).barrier()
    Bm25Index(postings, statsFromPostings(docs, postings).barrier())
  }

  /** Corpus stats for the BM25 normalizer: doc count and average doc
    * length over ALL docs (empty docs count toward both — dl values are
    * integral doubles, so the sum is exact and order-invariant). An
    * EMPTY corpus yields `(0, 1.0)` instead of a NULL avgdl (sum/0):
    * scoring output is empty either way (no postings match), but a
    * stats consumer gets a well-typed row, not a silent NULL that
    * cross-joins into every score expression.
    *
    * Derived WITHOUT a second tokenization pass (the r18 q_bm25 plan
    * carried two full normalize+tokenize scans; tokenization is the
    * measured wall of the whole index build): Σdl ≡ Σtf over the
    * postings — each doc's length is by definition the sum of its term
    * frequencies, and an empty doc contributes 0 to both — so the token
    * mass reads off the (materialized) postings in one tiny aggregate,
    * and `n_docs` comes from a count(*) scan that prunes every column
    * (parquet answers it from row-group metadata, no text decode, no
    * regex). Exact equality with the old two-scan form: both sums fold
    * the same integers. */
  private[graft] def statsFromPostings(docs: DataFrame,
                                       postings: DataFrame): DataFrame =
    docs.groupBy().agg(count(lit(1)).as("n_docs"))
      .crossJoin(
        postings.agg(coalesce(sum(col("tf")), lit(0L)).as("sum_dl")))
      .select(col("n_docs"),
        when(col("n_docs") === 0L, lit(1.0))
          .otherwise(col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))

  /** Persist the frozen index to parquet — the lexical twin of
    * `IvfIndex.persist`'s build-once/search-many contract. Postings are
    * REPARTITIONED BY TERM and sorted within partitions, so (a) each
    * parquet row group covers a narrow term range and min/max stats
    * prune per-term lookups (`WHERE term IN (…)`), and (b) a future
    * scoring join against a term list touches term-clustered files
    * instead of a corpus-shuffled scatter. Stats are one row. */
  def persist(docs: DataFrame, path: String): Unit = {
    import graft.operators.Barrier.BarrierOps
    // one tokenize scan: the barriered postings feed both the
    // term-clustered write and the stats aggregate (statsFromPostings)
    val postings = invertedIndex(docs).barrier()
    postings
      .repartition(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/postings")
    statsFromPostings(docs, postings)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load a [[persist]]ed index — no corpus access on the search path. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Bm25Index =
    Bm25Index(spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/stats"))

  /** Top-k BM25 retrieval: `queryTerms(query_id, term)` (a bounded,
    * broadcastable table — a parsed query string per query_id) against
    * the documents corpus → (query_id, rank, doc_id, score). Ties break
    * by doc_id asc on the exact decimal score. */
  def topK(docs: DataFrame, queryTerms: DataFrame, k1: Double = 1.25,
           b: Double = 0.75, topK: Int = 10,
           excludeSelfDoc: Boolean = false): DataFrame =
    topKFrom(buildIndex(docs), queryTerms, k1, b, topK, excludeSelfDoc)

  /** [[topK]] against a pre-built (frozen) index — the seam the
    * streaming serve path scores through, so there is exactly one
    * implementation of the BM25 arithmetic.
    *
    * `excludeSelfDoc` is the leave-one-out evaluation convention
    * ([[RetrievalEval]], "more-like-this" queries whose query_id IS a
    * doc_id): the query's own document is dropped AFTER df/idf are
    * fixed — corpus statistics stay intact, the self-match just never
    * occupies a heap slot. */
  def topKFrom(index: Bm25Index, queryTerms: DataFrame, k1: Double = 1.25,
               b: Double = 0.75, topK: Int = 10,
               excludeSelfDoc: Boolean = false): DataFrame = {
    // postings restricted to query terms FIRST: df/idf and scoring see
    // only matched rows. df per term is invariant under this restriction
    // (it counts docs per term, and the filter is on term).
    val matched = index.postings
      .join(broadcast(queryTerms.distinct()), Seq("term"))
    val dfTab = matched.select(col("term"), col("doc_id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scoreBase =
      if (excludeSelfDoc) matched.filter(col("doc_id") =!= col("query_id"))
      else matched
    val scored = scoreBase
      .join(broadcast(dfTab), Seq("term"))
      .crossJoin(broadcast(index.stats))
    val nd = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    // idf: ln((N - df + 0.5)/(df + 0.5) + 1)  [the +1 keeps it positive]
    val idf = log(((nd - dfd) + lit(0.5)) / (dfd + lit(0.5)) + lit(1.0))
    // tf normalizer: tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    val denom = tfd + lit(k1) * ((lit(1.0) - lit(b)) +
      (lit(b) * dld) / col("avgdl"))
    val termScore = idf * ((tfd * (lit(k1) + lit(1.0))) / denom)
    val perDoc = scored
      .select(col("query_id"), col("doc_id"),
        (floor(termScore * 1e6) / 1e6).cast("decimal(18,6)").as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s")).as("sdec"))
    // bounded per-partition heaps, not a per-query window sort: the
    // 1e-6-grid decimal → double map is injective at these magnitudes,
    // so heap order (score desc, id asc) equals exact decimal order
    perDoc
      .select(col("query_id"), col("doc_id"),
        col("sdec").cast("double").as("score"))
      .groupBy(col("query_id"))
      .agg(graft.functions.top_k_by_score(col("score"), col("doc_id"), topK)
        .as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").as("score"))
      .orderBy(col("query_id"), col("rank"))
  }
}
