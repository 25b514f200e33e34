package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._
import graft.functions.TextFunctions._
import graft.operators.Barrier.BarrierOps

/** Corpus-statistics-aware embeddings: hashing-trick TF-IDF.
  *
  * Unlike [[graft.functions.HashEmbed]] (pure term frequency, one pass, no
  * corpus state), TF-IDF needs document frequencies — a groupBy over the
  * exploded token table. Dataflow: tokens → tf per (doc, token) → df per
  * token DERIVED FROM tf (tf already holds exactly one row per
  * (doc, token), so df is a count over its `tok` groups — the separate
  * `distinct()` pass over the raw token stream that used to feed df was
  * a whole extra shuffle of the corpus) → weight = tf·ln(1 + N/df) →
  * hash-bucket sums → dense L2-normalized vector via the
  * [[graft.functions.ScatterVector]] expression. All shuffles are on
  * token/doc keys, and every one partial-aggregates map-side.
  *
  * The tf⋈df join is a plain shuffle join on `tok` — NEVER a broadcast:
  * the document-frequency table is vocabulary-sized, unbounded in corpus
  * size (a 100 TB corpus has billions of distinct tokens), and
  * broadcasting it would OOM every executor. Both sides are token-keyed
  * aggregates, so the join co-partitions on the shuffle key; AQE may still
  * downgrade to a runtime broadcast when the measured vocabulary is small,
  * which is the correct adaptive behavior (gated in PlanSpec: no static
  * broadcast hint in the logical plan).
  */
object Embeddings {

  /** (doc_id, embedding array<float> dim) with TF-IDF weights. */
  def tfidfVectors(docs: DataFrame, dim: Int = 64): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(preprocess(col("text"))).as("toks"))
      .barrier() // barrier: Generate re-evals codegen'd children
    // corpus size N (ALL docs, token-less included) counted off the
    // materialized checkpoint blocks — not a second scan of the corpus
    val n = base.count()
    val toks = base.select(col("doc_id"), explode(col("toks")).as("tok"))
    // materialized: df reads tf again — without the barrier the whole
    // explode→groupBy subtree would execute once per consumer
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .barrier()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // FNV bucket hash (not an engine-internal hash): public and
    // SQL-replayable, so the correctness oracle can rebuild the vectors
    val weighted = tf.join(df, Seq("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.fnv1a64(col("tok")), lit(dim.toLong)).as("bucket"),
        (col("tf") * log(lit(1.0) + lit(n.toDouble) / col("df"))).as("w"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("w")).as("w"))
    weighted.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("bucket"), col("w"))).as("entries"))
      .select(col("doc_id"),
        scatter_vector(col("entries"), dim).as("embedding"))
      .orderBy(col("doc_id"))
  }
}
