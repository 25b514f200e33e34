package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Table profiling: the per-column statistics pass (row count, null
  * count, exact distinct count, min/max) every ingestion pipeline runs
  * before trusting a new data drop — the engine-side equivalent of the
  * reference operator's manual "inspect the collection" step before an
  * index build (reference: services/index_service.py:14-53 assumes
  * non-null `_id`/`description`; this is the table that would have told
  * it).
  *
  * Values profile in CANONICAL form so both engines agree bit-for-bit:
  * integers as-is, doubles floored to a fixed grid (longs), timestamps
  * rendered to a second-precision string, strings as-is. Each column
  * contributes EITHER `val_num` (long) or `val_str` — min/max land in
  * the matching typed pair and the other pair is null.
  *
  * Scale shape: ONE pass — the per-row unpivot (explode over a
  * |columns|-element struct array, a cheap Generate over scan output)
  * feeds a (col, value)-keyed groupBy that collapses map-side to
  * per-partition distinct values, so the shuffle is Σ_col |distinct
  * values| — the exact-distinct lower bound — and the second aggregate
  * reduces to |columns| rows. At 100 TB select [[profileSketch]]
  * instead: the KMV sketch replaces the exact distinct and the shuffle
  * drops to |columns| × (sketch + 6 scalars) per map partition —
  * corpus-independent. Both are gate rows; [[profile]] stays the
  * default because its distinct counts are exact. */
object Profile {

  /** Generic core: profile `df` over canonicalized numeric columns
    * (`numSpecs`: name → long-valued canonical expression) and string
    * columns (`strSpecs`: name → string-valued canonical expression). */
  /** The |columns|-struct unpivot both the batch profile and
    * [[graft.streaming.ProfileStream]] fold over: one
    * `(col_name, val_num, val_str)` row per (input row, column). */
  private[graft] def unpivot(df: DataFrame, numSpecs: Seq[(String, Column)],
                             strSpecs: Seq[(String, Column)]): DataFrame = {
    val entries =
      numSpecs.map { case (nm, c) =>
        struct(lit(nm).as("col_name"), c.cast("long").as("val_num"),
          lit(null).cast("string").as("val_str"))
      } ++ strSpecs.map { case (nm, c) =>
        struct(lit(nm).as("col_name"), lit(null).cast("long").as("val_num"),
          c.cast("string").as("val_str"))
      }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.val_num").as("val_num"),
        col("e.val_str").as("val_str"))
  }

  def profile(df: DataFrame, numSpecs: Seq[(String, Column)],
              strSpecs: Seq[(String, Column)]): DataFrame = {
    val collapsed = unpivot(df, numSpecs, strSpecs)
      .groupBy(col("col_name"), col("val_num"), col("val_str"))
      .agg(count(lit(1)).as("c"))
    val isNull = col("val_num").isNull && col("val_str").isNull
    collapsed.groupBy(col("col_name"))
      .agg(sum(col("c")).as("n"),
        sum(when(isNull, col("c")).otherwise(0L)).as("n_null"),
        sum(when(isNull, 0L).otherwise(1L)).as("n_distinct"),
        min(col("val_num")).as("min_num"), max(col("val_num")).as("max_num"),
        min(col("val_str")).as("min_str"), max(col("val_str")).as("max_str"))
      .orderBy(col("col_name"))
  }

  /** The 100 TB form of [[profile]] — the sketch-backed path the object
    * doc promises, selectable exactly like the exact form (same specs,
    * same output shape, `est_distinct`+`kth_min` in place of
    * `n_distinct`): ONE aggregate straight off the unpivot, no
    * (col, value) distinct shuffle at all. Each map partition ships
    * |columns| partials of six scalars + ≤ k hash minima, so the
    * shuffle is corpus-INDEPENDENT (the exact form's is Σ distinct
    * values — fine until a high-cardinality key column at 10¹¹ rows).
    *
    * Value hashing is [[graft.streaming.ProfileStream.valueHash]]'s
    * domain verbatim — `fnv1a64(coalesce(cast(val_num as string),
    * val_str))` — so batch sketch, streaming twin and the DuckDB
    * replay fold the same 64-bit points; under k distinct values the
    * KMV set IS the distinct set and `est_distinct` equals the exact
    * count (kth_min = 0), above it the bottom-k estimator is pure
    * integer arithmetic (BigInt / HUGEINT) and replays bit-for-bit. */
  def profileSketch(df: DataFrame, numSpecs: Seq[(String, Column)],
                    strSpecs: Seq[(String, Column)],
                    k: Int = 256): DataFrame = {
    val isNull = col("val_num").isNull && col("val_str").isNull
    unpivot(df, numSpecs, strSpecs)
      .select(col("col_name"), col("val_num"), col("val_str"),
        graft.functions.fnv1a64(
          coalesce(col("val_num").cast("string"), col("val_str"))).as("h"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n"),
        sum(when(isNull, 1L).otherwise(0L)).as("n_null"),
        // null hashes are skipped by the aggregate (null-value rows
        // must not contribute a distinct point)
        graft.functions.kmv_distinct(col("h"), k).as("sk"),
        min(col("val_num")).as("min_num"), max(col("val_num")).as("max_num"),
        min(col("val_str")).as("min_str"), max(col("val_str")).as("max_str"))
      .select(col("col_name"), col("n"), col("n_null"),
        col("sk.est_distinct").as("est_distinct"),
        col("sk.kth_min").as("kth_min"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))
  }

  /** The gate instance of [[profileSketch]]: the same orders
    * canonicalization as [[ordersProfile]]. `k = 8` forces BOTH
    * regimes at any SF: the 2-to-5-distinct status/priority columns
    * take the exact path (kth_min = 0), the key/date columns exercise
    * the integer estimator. */
  def ordersProfileSketch(t: Tables, k: Int = 8): DataFrame =
    profileSketch(t.orders,
      numSpecs = Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_totalprice" -> floor(col("o_totalprice") * 100)),
      strSpecs = Seq(
        "o_orderstatus" -> col("o_orderstatus"),
        "o_orderpriority" -> col("o_orderpriority"),
        "o_orderdate" -> date_format(col("o_orderdate"),
          "yyyy-MM-dd HH:mm:ss")),
      k = k)

  /** The gate instance: profile of the `orders` table. Money floors to
    * the cent grid; the order date renders at second precision (the
    * canonical forms both engines print identically). */
  def ordersProfile(t: Tables): DataFrame =
    profile(t.orders,
      numSpecs = Seq(
        "o_orderkey" -> col("o_orderkey"),
        "o_custkey" -> col("o_custkey"),
        "o_totalprice" -> floor(col("o_totalprice") * 100)),
      strSpecs = Seq(
        "o_orderstatus" -> col("o_orderstatus"),
        "o_orderpriority" -> col("o_orderpriority"),
        "o_orderdate" -> date_format(col("o_orderdate"),
          "yyyy-MM-dd HH:mm:ss")))

  /** Profile DIFF between two slices of the same schema — the
    * distribution-drift half of a data-contract check (null-rate moves,
    * cardinality moves, range expansion): per column both slices' row /
    * distinct counts, null fractions on the 1e-6 grid, and a null-safe
    * `range_expanded` flag (the current slice's min/max escaping the
    * base envelope, over whichever typed pair the column profiles
    * into). Two [[profile]] passes + a |columns|-row join. */
  def profileDiff(base: DataFrame, current: DataFrame,
                  numSpecs: Seq[(String, Column)],
                  strSpecs: Seq[(String, Column)]): DataFrame = {
    def side(df: DataFrame, tag: String) =
      profile(df, numSpecs, strSpecs).select(
        col("col_name"), col("n").as(s"n_$tag"),
        col("n_null").as(s"nn_$tag"), col("n_distinct").as(s"nd_$tag"),
        col("min_num").as(s"mn_$tag"), col("max_num").as(s"mx_$tag"),
        col("min_str").as(s"ms_$tag"), col("max_str").as(s"xs_$tag"))
    def nullFrac(tag: String): Column =
      floor(col(s"nn_$tag").cast("double") / col(s"n_$tag").cast("double")
        * 1e6) / 1e6
    val expanded =
      coalesce(col("mn_c") < col("mn_b"), lit(false)) ||
        coalesce(col("mx_c") > col("mx_b"), lit(false)) ||
        coalesce(col("ms_c") < col("ms_b"), lit(false)) ||
        coalesce(col("xs_c") > col("xs_b"), lit(false))
    side(base, "b").join(side(current, "c"), Seq("col_name"))
      .select(col("col_name"),
        col("n_b").as("n_base"), col("n_c").as("n_current"),
        col("nd_b").as("n_distinct_base"), col("nd_c").as("n_distinct_current"),
        nullFrac("b").as("null_frac_base"), nullFrac("c").as("null_frac_current"),
        expanded.as("range_expanded"))
      .orderBy(col("col_name"))
  }

  /** The gate instance of [[profileDiff]]: `events` split at a time cut
    * (the before/after of a pipeline deploy). The timestamp profiles as
    * its second-precision string, so its inevitable `range_expanded` is
    * the planted positive. */
  def eventsProfileDiff(t: Tables,
                        cut: String = "2024-01-16 00:00:00"): DataFrame = {
    val ev = t.events
    val specsNum: Seq[(String, Column)] = Seq(
      "user_id" -> col("user_id"),
      "value" -> floor(col("value") * 100))
    val specsStr: Seq[(String, Column)] = Seq(
      "event_type" -> col("event_type"),
      "ts" -> date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    val c = lit(cut).cast("timestamp")
    profileDiff(ev.filter(col("ts") < c), ev.filter(col("ts") >= c),
      specsNum, specsStr)
  }

  /** Great-Expectations-style data-contract gate: a declarative rule
    * table evaluated against a [[profile]] — per rule the observed
    * statistic and the pass verdict. Rule names encode direction
    * (`*_max` → observed ≤ threshold, otherwise ≥):
    * `null_frac_max` (1e-6 grid), `distinct_min`/`distinct_max` (raw
    * count), `distinct_frac_min` (uniqueness: distinct/rows, 1e-6
    * grid), `min_num_min` (domain lower bound). The profile is
    * |columns| rows and the rule table is a literal — the join is
    * broadcast-trivial at any corpus size; the corpus cost is the one
    * profile pass. */
  def expectations(profiled: DataFrame,
                   rules: Seq[(String, String, Double)],
                   spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val r = rules.toDF("col_name", "rule", "threshold")
    val observed =
      when(col("rule") === "null_frac_max",
        floor(col("n_null").cast("double") / col("n").cast("double") * 1e6) / 1e6)
        .when(col("rule") === "distinct_min" || col("rule") === "distinct_max",
          col("n_distinct").cast("double"))
        .when(col("rule") === "distinct_frac_min",
          floor(col("n_distinct").cast("double") / col("n").cast("double") * 1e6) / 1e6)
        .when(col("rule") === "min_num_min", col("min_num").cast("double"))
    profiled.join(r, Seq("col_name"))
      .select(col("col_name"), col("rule"), col("threshold"),
        observed.as("observed"),
        when(col("rule").endsWith("_max"), observed <= col("threshold"))
          .otherwise(observed >= col("threshold")).as("pass"))
      .orderBy(col("col_name"), col("rule"))
  }

  /** The gate instance: scale-free expectations over [[ordersProfile]]
    * (key non-null + unique, money non-negative, bounded status
    * domain). */
  def ordersExpectations(t: Tables,
                         spark: org.apache.spark.sql.SparkSession): DataFrame =
    expectations(ordersProfile(t), Seq(
      ("o_orderkey", "null_frac_max", 0.0),
      ("o_orderkey", "distinct_frac_min", 1.0),
      ("o_custkey", "null_frac_max", 0.0),
      ("o_totalprice", "min_num_min", 0.0),
      ("o_orderstatus", "distinct_min", 2.0),
      ("o_orderstatus", "distinct_max", 5.0),
      ("o_orderdate", "null_frac_max", 0.0)), spark)
}
