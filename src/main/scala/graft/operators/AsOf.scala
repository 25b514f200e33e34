package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key — an operator Spark lacks.
  *
  * Implemented as the union/last-value composition rather than a custom
  * physical operator: tag both sides, union, and take `last_value(ignore
  * nulls)` over one (key, time)-sorted window. ONE shuffle on the key,
  * no join at all — at 100 TB this beats any join-based formulation
  * because the right side never fans out and skewed keys stay mergeable.
  */
object AsOf {

  /** `left` and `right` must share `key` and `ts` columns; `rightVals` are
    * the right-side columns to carry (null when no prior right row). Right
    * rows are deduped to one per (key, ts) — latest `tie` wins — so the
    * result is deterministic when timestamps collide. */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           tie: String, rightVals: Seq[String]): DataFrame = {
    val dedupW = Window.partitionBy(col(key), col(ts))
      .orderBy(col(tie).desc)
    val rightOne = right
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")

    val leftTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        left.columns.filterNot(Seq(key, ts).contains).map(col) ++
        rightVals.map(c => lit(null).cast(rightOne.schema(c).dataType)
          .as(s"__r_$c")): _*)
    val rightTagged = rightOne
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        left.columns.filterNot(Seq(key, ts).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)

    // right rows sort before left rows at equal ts => `<=` semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    leftTagged.unionByName(rightTagged)
      .select(Seq(col(key), col(ts), col("__side")) ++
        left.columns.filterNot(Seq(key, ts).contains).map(col) ++
        rightVals.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
