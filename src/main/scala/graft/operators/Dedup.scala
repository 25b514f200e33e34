package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Deduplication operators for LLM-data pipelines.
  *
  * Exact dedup = one hash-shuffle groupBy on the normalized-text digest:
  * at 100 TB this is the cheapest possible form (map-side partial
  * aggregation collapses duplicates before the shuffle).
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 of the normalized text:
    * canonical (min) doc id + multiplicity per group. */
  def exactGroups(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"),
        md5(preprocess(col("text")).cast("binary")).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
           count(lit(1)).as("dup_count"))
      .orderBy(col("text_hash"))
}
