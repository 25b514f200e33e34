package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.cosine_similarity
import graft.operators.Barrier.BarrierOps

/** Nearest-centroid (Rocchio) classification over the embedding column —
  * the shape of a FastText/FineWeb-Edu-style quality or domain
  * classifier applied at corpus scale: train a per-class prototype from
  * labeled vectors, then score every document against the (tiny) set of
  * prototypes. The reference stores labels alongside its hnswlib vectors
  * (services/index_service.py persists id→document maps keyed by the
  * same ids the index serves); this is the classification counterpart a
  * training-data pipeline runs with those labels.
  *
  * Scale shape (100 TB): training is ONE pass over the labeled split —
  * the [[graft.functions.VectorAvg]] typed aggregator shuffles one
  * (sum, count) buffer per label per partition, never the member
  * vectors — and inference is a NARROW pass: the n_labels × dim centroid
  * table broadcasts (kilobytes), each vector scores against all
  * prototypes map-side, argmin by (distance, label) picks the class. No
  * corpus-sized shuffle anywhere; the only wide op is the label-count
  * aggregate inside training.
  *
  * Determinism across engines: centroid components are double sums
  * finished as REAL (float) — the cast swallows partition-order ulps,
  * the same discipline [[IvfIndex.kmeansCentroids]] established; the
  * assignment distance is one double cosine against identical inputs,
  * floored to the 1e-6 grid only for presentation (ranking uses the
  * exact double, ties by label ascending).
  */
object Classifier {

  /** Per-label prototype vectors: (pred_label, cv) — element-wise mean
    * of the labeled split's embeddings. */
  def centroids(train: DataFrame): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    train.select(col("label").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.VectorAvg.toColumn.name("cv"))
      .toDF("pred_label", "cv")
  }

  /** Classify the held-out split (`vec_id % heldoutMod == 0`) against
    * centroids trained on the rest: (vec_id, label, predicted, dist,
    * correct). The same deterministic-modulus split discipline as the
    * library's hash samplers — reproducible, partition-invariant. */
  def classify(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame = {
    val train = embeddings.filter(pmod(col("vec_id"), lit(heldoutMod)) =!= 0)
    val test = embeddings.filter(pmod(col("vec_id"), lit(heldoutMod)) === 0)
    val cents = centroids(train)
    test.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        (lit(1.0) - cosine_similarity(col("embedding"), col("cv")))
          .as("dist"),
        col("pred_label"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("dist"), col("pred_label"))).as("best"))
      .select(col("vec_id"), col("label"),
        col("best.pred_label").as("predicted"),
        // clamp: cos(v,v) can exceed 1 by an ulp and floor() would turn
        // the resulting -2e-16 distance into -1e-6
        (floor(greatest(col("best.dist"), lit(0.0)) * 1e6) / 1e6).as("dist"),
        (col("label") === col("best.pred_label")).as("correct"))
      .orderBy(col("vec_id"))
  }

  /** The audit over [[classify]]: per-true-label support, hits, and
    * recall (n_correct/n on the 1e-6 grid) plus macro row ordering by
    * label — the number a pipeline gates on before trusting the
    * classifier's keep/drop verdicts. Costs one n_labels-row aggregate
    * over the classification table. */
  def evalReport(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame =
    evalReportFrom(classify(embeddings, heldoutMod))

  /** [[evalReport]] over an ALREADY-classified table — the seam
    * `SparkEntry` serves from the memoized classification pass so the
    * classify trio costs one scoring scan between them. */
  def evalReportFrom(classified: DataFrame): DataFrame =
    classified
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("correct").cast("long")).as("n_correct"))
      .select(col("label"), col("n"), col("n_correct"),
        (floor(col("n_correct").cast("double") / col("n").cast("double")
          * 1e6) / 1e6).as("recall"))
      .orderBy(col("label"))

  /** Per-class precision/recall/F1 from the one-vs-rest confusion cells
    * — [[evalReport]] sees only the truth side (recall); this adds the
    * prediction side, so an over-predicted class shows its false-
    * positive cost. Classes appearing only as predictions still get a
    * row (full-outer, the langidEval discipline). F1 stays INTEGER all
    * the way: F1 = 2·tp/(2·tp+fp+fn) = 2·tp/(n_true+n_pred), one DIV on
    * the 1e-6 grid — no float precision/recall composition to disagree
    * at a floor boundary. Costs two bounded |labels|-row aggregates
    * over one barriered classification pass. */
  def f1Report(embeddings: DataFrame, heldoutMod: Int = 5): DataFrame =
    f1ReportFrom(classify(embeddings, heldoutMod))

  /** [[f1Report]] over an ALREADY-classified table (the memoized-pass
    * seam, like [[evalReportFrom]]). */
  def f1ReportFrom(classified: DataFrame): DataFrame = {
    val scored = classified
      .select(col("label"), col("predicted"),
        col("correct").cast("long").as("hit"))
      .barrier() // read twice: truth-side and prediction-side aggregates
    val truth = scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n_true"), sum(col("hit")).as("tp"))
    val pred = scored.groupBy(col("predicted").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    truth.join(pred, Seq("label"), "full")
      .na.fill(0L, Seq("n_true", "tp", "n_pred"))
      .select(col("label"), col("n_true"), col("n_pred"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_true") - col("tp")).as("fn"),
        // decimal(38,0) like aucFromScored/prCurve: 2·tp·1e6 past
        // ~4.6e12 rows would silently wrap Long in non-ANSI Spark while
        // the oracle's HUGEINT path widens — same arithmetic both engines
        when(col("n_pred") > 0,
          expr("cast(tp as decimal(38,0)) * 1000000 div n_pred")
            .cast("double") / 1e6).as("prec"),
        when(col("n_true") > 0,
          expr("cast(tp as decimal(38,0)) * 1000000 div n_true")
            .cast("double") / 1e6).as("recall"),
        when(col("n_true") + col("n_pred") > 0,
          expr("2 * cast(tp as decimal(38,0)) * 1000000 div (n_true + n_pred)")
            .cast("double") / 1e6).as("f1"))
      .transform(graft.Determinism.sorted(_)(col("label")))
  }

  /** Label-cohesion audit: per class, member count, MEAN and MIN cosine
    * of members to their own class centroid — the label-noise signal a
    * training-data pipeline reads before trusting labels (a low-cohesion
    * class is mislabeled, multi-modal, or polluted; the MIN points at
    * the single worst member). Centroids here are over ALL rows of the
    * class (no held-out split — this audits the LABELS, not a model).
    *
    * Scale shape: one [[centroids]] pass (|labels| rows, broadcast),
    * then ONE corpus scan scoring each vector against ITS OWN centroid
    * only (an equi-join on the label, not the one-vs-rest crossJoin),
    * folded map-side onto |labels| rows.
    *
    * Determinism: per-row cosine floors to the 1e-6 LONG grid at the
    * scan; mean = integer DIV over the +1e6 OFFSET sums (cosine can be
    * negative; truncating `div` and flooring `//` agree only at
    * non-negative numerators); MIN is exact on the grid. */
  def classCohesion(embeddings: DataFrame): DataFrame = {
    val cents = centroids(embeddings)
    embeddings
      .select(col("label").cast("long").as("label"), col("embedding"))
      .join(broadcast(cents), col("label") === col("pred_label"))
      .select(col("label"),
        (floor(cosine_similarity(col("embedding"), col("cv")) * 1e6)
          .cast("long") + lit(1000000L)).as("s_off"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("s_off")).as("sum_off"),
        min(col("s_off")).as("min_off"))
      .select(col("label"), col("n"),
        (expr("sum_off div n").cast("double") - 1e6) / 1e6 as "mean_cos",
        ((col("min_off") - lit(1000000L)).cast("double") / 1e6).as("min_cos"))
      .transform(graft.Determinism.sorted(_)(col("label")))
  }
}
