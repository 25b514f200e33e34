package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-maintenance operators for the warehouse layer under the
  * pipeline — the reference persists its id→document maps as flat
  * current-state stores (`services/index_service.py`); at corpus scale
  * the curation metadata around them (a user's state, a document's
  * latest gate verdict) needs HISTORY, and SCD type 2 is the standard
  * shape: one row per (key, version) with a validity interval.
  */
object Warehouse {

  /** Build the type-2 slowly-changing dimension from an event stream:
    * collapse each user's event history to its CHANGE rows (state ≠
    * previous state), stamp versions, and derive `[valid_from,
    * valid_to)` intervals with `lead`; the open interval (`valid_to`
    * NULL) is the current row.
    *
    * Scale shape: ONE user-keyed exchange feeds all three window passes
    * — `lag` (change detection), `row_number` (version) and `lead`
    * (interval close) all share `HashPartitioning(user_id)`, so the
    * filter between them re-sorts within partitions but never
    * re-shuffles. Order inside a user is total ((ts, event_id) — same
    * tie-break as the sessionizer), so versions are deterministic under
    * any partitioning. */
  def scd2(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"),
        row_number().over(byUser).cast("long").as("version"),
        col("event_type").as("state"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(byUser).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .transform(graft.Determinism.sorted(_)(col("user_id"), col("version")))
  }

  /** Row-level change-data-capture feed between two corpus snapshots:
    * (doc_id, op ∈ insert/delete/update) with both sides' lengths as the
    * change evidence — the feed `q_upsert`-style merges consume, and the
    * row-level companion to `q_snapshot_diff`'s per-source churn rollup
    * (which tells you HOW MUCH moved; this tells you WHICH rows).
    *
    * Scale shape: ONE doc_id-keyed full-outer join (both sides hash on
    * the key — co-partitioned, no second exchange); unchanged rows are
    * dropped before anything downstream, so the feed is proportional to
    * CHURN, not corpus size. Document BODIES never enter the join: each
    * side projects `(doc_id, poly_fingerprint(text), length(text))` AT
    * THE SCAN — the same 64-bit content-identity contract
    * [[Governance.snapshotDiff]] documents — so the two Exchanges carry
    * ~16 bytes/row instead of the corpus. `update` = (fingerprint,
    * length) mismatch (raw text, not normalized: CDC reports byte-level
    * edits, where the governance rollup keys on normalized content).
    * Comparing the PAIR eliminates every different-length fingerprint
    * collision for free; the residual false-negative is a same-length
    * 64-bit collision on the same doc_id — P ≈ churn·2⁻⁶⁴ for organic
    * edits (the polynomial hash is NOT adversarially collision-proof;
    * a hostile corpus needs a cryptographic digest here). */
  def cdc(base: DataFrame, cur: DataFrame): DataFrame = {
    def fp(df: DataFrame, tag: String) = df.select(col("doc_id"),
      graft.functions.poly_fingerprint(col("text")).as(s"fp_$tag"),
      length(col("text")).cast("long").as(s"n_chars_$tag"))
    fp(base, "base").join(fp(cur, "cur"), Seq("doc_id"), "full")
      .select(col("doc_id"),
        when(col("fp_base").isNull, lit("insert"))
          .when(col("fp_cur").isNull, lit("delete"))
          .when(col("fp_base") =!= col("fp_cur") ||
            col("n_chars_base") =!= col("n_chars_cur"), lit("update"))
          .as("op"),
        coalesce(col("n_chars_base"), lit(0L)).as("n_chars_base"),
        coalesce(col("n_chars_cur"), lit(0L)).as("n_chars_cur"))
      .filter(col("op").isNotNull)
      .transform(graft.Determinism.sorted(_)(col("doc_id")))
  }

  /** Persist a release snapshot PAIR bucketed by `doc_id` — the layout
    * that makes every snapshot-pair operator Exchange-free: both
    * releases arrive hash-bucketed on the join key, so [[cdc]]'s
    * full-outer SMJ (and [[Governance.snapshotDiff]]'s) reads co-located
    * buckets with ZERO input exchanges — the
    * `Relational.persistBucketedFacts` lever applied to governance. At
    * 100 TB each release lands bucketed ONCE at publish time and every
    * diff/CDC run against it is shuffle-free on the corpus. */
  def persistSnapshotPair(base: DataFrame, cur: DataFrame,
                          baseTable: String, curTable: String,
                          path: String, nBuckets: Int = 8): Unit = {
    base.write.mode("overwrite").bucketBy(nBuckets, "doc_id")
      .sortBy("doc_id").option("path", s"$path/base").saveAsTable(baseTable)
    cur.write.mode("overwrite").bucketBy(nBuckets, "doc_id")
      .sortBy("doc_id").option("path", s"$path/cur").saveAsTable(curTable)
  }

  /** [[cdc]] served from the [[persistSnapshotPair]] layout. The LAYOUT
    * must never change the answer — same output and oracle as the raw
    * pair; the plan is gated (zero doc_id exchanges) in the spec. */
  def cdcBucketed(spark: SparkSession, baseTable: String,
                  curTable: String): DataFrame =
    cdc(spark.table(baseTable), spark.table(curTable))
}
