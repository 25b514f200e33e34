package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{preprocess, tokens}

/** Streaming heavy-hitter tracking — the stateful twin of the batch
  * count-min sketch (`q_cms_topk`): a running d×w counter grid over a
  * document stream.
  *
  * The grid is a plain streaming aggregation on the cell keys, so the
  * state store holds ONE count per cell — ≤ depth·width longs forever, no
  * matter how many documents stream through (the same bounded-state
  * property as [[VocabularyStream]]'s KMV set). Cell hashing is shared
  * with the batch operator ([[graft.operators.Sketches.gridCoords]]), so
  * after any prefix of the stream the grid equals the batch grid over the
  * same rows — asserted in the streaming spec — and any token's frequency
  * estimate is `min` over its `depth` cells at read time.
  */
object SketchStream {

  /** `(doc_id, text, …)` stream → running `(d, bucket, c)` grid cells
    * (update mode: refreshed cells per micro-batch). */
  def grid(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame =
    docs
      .select(explode(tokens(preprocess(col("text")))).as("tok"))
      .select(graft.operators.Sketches.gridCoords(col("tok"), depth, width)
        .as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
}
