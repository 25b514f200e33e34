package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: "for each left row, right rows of the same key
  * within a trailing time window" — a non-equi join Spark would otherwise
  * plan as a broadcast-nested-loop (O(L×R) comparisons per key).
  *
  * The bin trick makes it an EQUI-join: bucket right rows by
  * `floor(ts / window)`, explode each left row to its two candidate bins
  * (a trailing window can only span two buckets), join on (key, bin), and
  * apply the exact range predicate as a residual filter. Shuffle volume is
  * 2×|L| + |R| and every comparison happens inside a hash bucket — the
  * standard large-scale range-join shape.
  */
object RangeJoin {

  /** Count right events per left event with `r.ts ∈ [l.ts - window, l.ts)`
    * on the same key. Output: left key/ts/id + `n_recent` (0 when none). */
  def countTrailing(left: DataFrame, right: DataFrame, key: String,
                    windowMinutes: Long = 60): DataFrame = {
    require(windowMinutes > 0, s"bad window: $windowMinutes")
    val winUs = windowMinutes * 60L * 1000000L
    val window = s"$windowMinutes MINUTES"
    // epoch-micros ~1.7e15 and the quotient both fit double's 53-bit
    // mantissa exactly; cast-to-long truncation == floor for positives
    def binOf(ts: Column): Column =
      (unix_micros(ts) / lit(winUs)).cast("long")

    val l = left.select(col(key).as("__k"), col("ts").as("__lts"),
      col("event_id").as("__lid"))
    val r = right.select(col(key).as("__k"), col("ts").as("__rts"))
      .withColumn("__bin", binOf(col("__rts")))
    val lBinned = l.withColumn("__bin",
      explode(array(binOf(col("__lts")), binOf(col("__lts")) - 1)))

    val counts = lBinned.join(r, Seq("__k", "__bin"))
      .filter(col("__rts") >= col("__lts") - expr(s"INTERVAL $window") &&
              col("__rts") < col("__lts"))
      .groupBy(col("__lid"))
      .agg(count(lit(1)).as("n_recent"))

    l.join(counts, Seq("__lid"), "left")
      .na.fill(0L, Seq("n_recent"))
      .select(col("__k").as(key), col("__lts").as("ts"),
        col("__lid").as("event_id"), col("n_recent"))
      .orderBy(col("event_id"))
  }
}
