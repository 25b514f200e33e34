package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Embeddings

/** Streaming anisotropy monitoring — the stateful twin of the batch
  * `q_emb_anisotropy` gate: running per-dimension resultant/self-mass
  * cells `(pos, cnt, sd, self_d)` over an embedding stream, served on
  * demand through the SAME fold as the batch operator
  * ([[Embeddings.anisotropyFromCells]] — the sum identity collapses the
  * quadratic pair integral to d cells, so the stream state is d rows
  * forever, the SketchStream discipline). Catches the encoder starting
  * to emit collapsed directions WHILE a backfill runs, not after.
  *
  * After any prefix of the stream the cells equal
  * [[Embeddings.anisotropyCells]] over the same rows — asserted
  * bit-for-bit in the streaming spec under both state backends. */
object AnisotropyStream {

  /** Embedding stream → running per-dimension cells (update mode). */
  def cells(embeddings: DataFrame): DataFrame =
    Embeddings.anisotropyCells(embeddings)
}
