package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.cosine_similarity
import graft.operators.{Classifier, MlEval}

/** Streaming ML-eval monitoring — the stateful twin of the batch
  * `q_auc` / `q_calibration` / `q_pr_curve` trio: a running
  * (class, grid-score) histogram over a stream of scored held-out
  * vectors, served on demand through the SAME folds the batch operators
  * use ([[MlEval.aucFromCells]] / [[MlEval.calibrationFromCells]] /
  * [[MlEval.prCurveFromCells]]).
  *
  * The histogram is a plain streaming aggregation on the bounded
  * (class, s_grid) key, so the state store holds ONE (p_g, n_g) counter
  * pair per cell — ≤ 2·10⁶ grid values × |classes| cells forever, no
  * matter how many vectors stream through (the [[SketchStream]]
  * fixed-state discipline). Centroids are FROZEN from a batch training
  * pass ([[freezeCentroids]], the [[CurationStream]] train/serve
  * contract): scoring in the stream is the same broadcast-probe narrow
  * pass as [[MlEval.scoredOneVsRest]], so after any prefix of the
  * stream the cells equal [[MlEval.scoreHistogram]] over the same rows —
  * asserted bit-for-bit in the streaming spec under both state backends.
  */
object MlEvalStream {

  /** The frozen per-class prototype table (`pred_label`, `cv`) trained
    * on the batch split — compute once, broadcast into every
    * micro-batch. Same split contract as [[MlEval.scoredOneVsRest]]. */
  def freezeCentroids(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame =
    Classifier.centroids(
      embeddings.filter(pmod(col("vec_id"), lit(heldoutMod)) =!= 0))

  /** Score a stream of held-out `(vec_id, label, embedding)` vectors
    * against the frozen centroids: `(vec_id, class, s_grid, pos)` — the
    * stream-static broadcast join form of [[MlEval.scoredOneVsRest]]'s
    * scoring pass (stateless; the only state lives in [[histogram]]). */
  def score(heldout: DataFrame, centroids: DataFrame): DataFrame =
    heldout.withColumn("one", lit(1))
      .join(broadcast(centroids.withColumn("one", lit(1))), Seq("one"))
      .select(col("vec_id"),
        col("pred_label").as("class"),
        floor(cosine_similarity(col("embedding"), col("cv")) * 1e6)
          .cast("long").as("s_grid"),
        (col("label").cast("long") === col("pred_label"))
          .cast("long").as("pos"))

  /** Scored stream → running `(class, s_grid, p_g, n_g)` histogram
    * cells (update mode: refreshed cells per micro-batch). Identical
    * aggregation to [[MlEval.scoreHistogram]], so the final cells equal
    * the batch histogram over the same rows. */
  def histogram(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("class"), col("s_grid"))
      .agg(sum(col("pos")).as("p_g"),
        (count(lit(1)) - sum(col("pos"))).as("n_g"))
}
