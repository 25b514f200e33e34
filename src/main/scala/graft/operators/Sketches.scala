package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.fnv1a64
import graft.functions.TextFunctions.{preprocess, tokens}
import graft.operators.Barrier.BarrierOps

/** Streaming-friendly frequency sketches over the token stream.
  *
  * The exact vocabulary aggregation (`q_token_topk`) shuffles one row per
  * DISTINCT token — at web-corpus scale that is billions of rows. A
  * count-min sketch replaces it with a FIXED d×w counter grid: map-side
  * partial aggregation collapses every partition to ≤ d·w cells before the
  * wire, so the shuffle is a few kilobytes regardless of corpus size, and
  * the grids of any two corpus shards merge by cell-wise addition (the
  * same property the KMV sketch exploits in `q_distinct_sketch`).
  *
  * Estimates are biased UP only (collisions add, never subtract):
  * `exact ≤ cms ≤ exact + εN` with ε ≈ e/w at the standard depth. The
  * checked query reports the exact count next to the estimate for the
  * top-k tokens, making the one-sided error an auditable column.
  */
object Sketches {

  /** Row-`d` bucket of a token: FNV-1a over `"d:" + tok` mod `width` —
    * d independent hash rows from one hash family, replayed verbatim by
    * the DuckDB oracle. */
  private def bucketOf(tok: Column, d: Int, width: Int): Column =
    pmod(fnv1a64(concat(lit(s"$d:"), tok)), lit(width.toLong))

  /** One `(d, bucket)` struct per sketch row for a token column — shared
    * with the streaming twin ([[graft.streaming.SketchStream]]) so batch
    * and stream hash identically by construction. */
  private[graft] def gridCoords(tok: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(
      d => struct(lit(d).as("d"), bucketOf(tok, d, width).as("bucket"))): _*))

  /** Top-`k` tokens with exact counts AND their count-min estimates:
    * `(tok, n_exact, n_cms)`, heaviest first. */
  def cmsTokenTopK(docs: DataFrame, depth: Int = 4, width: Int = 1024,
                   k: Int = 20): DataFrame = {
    val toks = docs
      .select(tokens(preprocess(col("text"))).as("toks"))
      // barrier: Generate re-evaluates a codegen'd child per OUTPUT row
      // (see SparkEntry q_token_topk); keeps the scan's parallelism — a
      // literal repartition width would coalesce a 100 TB tokenize
      .barrier()
      .select(explode(col("toks")).as("tok"))
      // second barrier: the token stream is read twice (grid + exact audit)
      .barrier()
    // the sketch: one pass, partial-aggregated into ≤ depth×width cells
    val grid = toks.select(gridCoords(col("tok"), depth, width).as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    // the audit side: exact top-k (at true scale this pass is what the
    // sketch REPLACES; it is kept here precisely to expose the error)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok")).limit(k)
    // probe: k×depth lookups against the broadcast grid
    exact
      .select(col("tok"), col("n_exact"),
        gridCoords(col("tok"), depth, width).as("db"))
      .join(broadcast(grid),
        col("db.d") === col("d") && col("db.bucket") === col("bucket"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
      .orderBy(col("n_exact").desc, col("tok"))
  }
}
