package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join. When one join key carries a pathological
  * share of the rows (a viral document, a null-ish default key), a plain
  * hash join sends that key's entire volume to one task. Salting splits
  * the hot side into `salts` subkeys and replicates the small side once
  * per salt — turning one straggler task into `salts` even ones.
  *
  * AQE's skew-join handles sort-merge cases adaptively; explicit salting
  * remains the tool for aggregations and broadcast-ineligible joins at
  * 100 TB, so the engine ships one.
  */
object Salting {

  /** Inner-join `big` (skewed) with `small` on `key`; result equals the
    * plain join, but the big side's rows spread over `salts` subkeys.
    * The salt is derived from the big side's full row hash: deterministic,
    * no RNG in the plan. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toSeq.map(col): _*)), lit(salts)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigSalted.join(smallReplicated,
        bigSalted(key) === smallReplicated(key) &&
          bigSalted("__salt") === smallReplicated("__salt"))
      .drop(smallReplicated(key))
      .drop(bigSalted("__salt")).drop(smallReplicated("__salt"))
  }
}
