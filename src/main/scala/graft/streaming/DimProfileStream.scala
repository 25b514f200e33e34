package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Embeddings

/** Streaming per-dimension embedding monitoring — the stateful twin of
  * the batch `q_emb_dim_profile` audit: running per-coordinate moment
  * cells `(dim, n, sx, sxx, mn, mx)` over an embedding stream, served
  * on demand through the SAME fold as the batch operator
  * ([[Embeddings.dimProfileFromCells]] — means, variances and energy
  * shares are all integer algebra over the cells).
  *
  * The state is a plain streaming aggregation whose key domain is the
  * embedding DIMENSIONALITY (d cells total — corpus-independent by
  * construction, the SketchStream discipline): long counts/sums/extrema
  * plus one DECIMAL second-moment sum per coordinate. After any prefix
  * of the stream the cells equal [[Embeddings.dimCells]] over the same
  * rows — asserted bit-for-bit in the streaming spec under both state
  * backends. */
object DimProfileStream {

  /** Embedding stream → running per-dimension moment cells (update mode). */
  def cells(embeddings: DataFrame): DataFrame =
    Embeddings.dimCells(embeddings)
}
