package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational core: the scan/filter/join/agg/window engine underneath the
  * reference API's data access (reference: services/database_service.py is a
  * full-collection scan; everything else here is the standard analytics
  * surface a Spark engine must provide).
  *
  * Scale notes (100 TB):
  *  - dims (`region`, `nation`, `supplier`) are broadcast — no shuffle of
  *    the fact table for star joins;
  *  - all money math is DECIMAL-exact then cast to double at the boundary,
  *    so results are independent of partition count / merge order (floats
  *    sums are not associative; decimals are);
  *  - every query carries a total ORDER BY with unique tie-breaks so output
  *    is deterministic under any parallelism.
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H-Q1-style pricing summary. */
  def pricingSummary(t: Tables): DataFrame = {
    val li = t.lineitem.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
          * (lit(1) + dec(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Star join: revenue per nation; dims broadcast. */
  def revenueByNation(t: Tables): DataFrame = {
    val rev = (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(rev).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-10 revenue orders: eager aggregation — revenue is a function of
    * lineitem alone, so aggregate 4:1 BEFORE the join instead of dragging
    * order columns through the wide shuffle; the join then runs on the
    * collapsed (one row per order) side and AQE broadcasts the smaller
    * input. The global top-k is a TakeOrdered, never a full sort. */
  def topOrders(t: Tables, k: Int = 10): DataFrame = {
    val rev = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
    rev.join(t.orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Window functions: per-supplier running quantity + price rank. */
  def supplierWindows(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRank = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    t.lineitem
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity")))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_qty"),
        row_number().over(wRank).cast("long").as("price_rank"))
      // oracle-determinism sort only: no consumer needs this global order,
      // and at scale it is a full range Exchange of the corpus-sized output
      .transform(graft.Determinism.sorted(_)(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber")))
  }

  /** Semi + anti join: customers with orders but no line over `priceCap`. */
  def reliableCustomers(t: Tables, priceCap: Double = 90000.0): DataFrame = {
    val expensive = t.lineitem
      .filter(col("l_extendedprice") > priceCap)
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"))
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(expensive, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Selective filter + agg — the predicate-pushdown showcase. */
  def forecastRevenue(t: Tables): DataFrame = {
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  /** Correlated-subquery pattern: parts priced above their brand's mean —
    * decorrelated as a window average (one shuffle, no rescan). */
  def premiumParts(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
    t.part
      .withColumn("brand_avg",
        (sum(dec(col("p_retailprice"))).over(w).cast("double") /
          count(lit(1)).over(w)))
      .filter(col("p_retailprice") > col("brand_avg"))
      .select(col("p_partkey"), col("p_brand"),
        col("p_retailprice"),
        (floor(col("brand_avg") * 10000.0) / 10000.0).as("brand_avg"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H-Q13-style distribution: how many customers placed N orders
    * (zero-order customers included via left join). */
  def orderCountDistribution(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  /** Per-group argmax: each nation's top supplier by account balance
    * (struct-max keeps it one aggregation, ties broken by suppkey asc
    * via negated key inside the max struct). */
  def topSupplierPerNation(t: Tables): DataFrame =
    t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(max(struct(col("s_acctbal").as("bal"),
        (-col("s_suppkey")).as("negkey"))).as("best"))
      .select(col("n_name"), (-col("best.negkey")).cast("long").as("s_suppkey"),
        col("best.bal").as("s_acctbal"))
      .orderBy(col("n_name"))

  /** Set operations: customers in BUILDING or AUTOMOBILE segments minus
    * those who ever bought a part priced over 1800. */
  def setOpsCustomers(t: Tables): DataFrame = {
    val seg = (s: String) =>
      t.customer.filter(col("c_mktsegment") === s).select(col("c_custkey"))
    val bigSpenders = t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(col("p_retailprice") > 1800.0)
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c_custkey"))
    seg("BUILDING").union(seg("AUTOMOBILE")).distinct()
      .except(bigSpenders.distinct())
      .orderBy(col("c_custkey"))
  }

  /** Region → nation rollup of revenue (multi-level aggregation in one
    * pass; grouping-set nulls folded to 'ALL' for engine-portable output). */
  def revenueRollup(t: Tables): DataFrame = {
    val rev = (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    // two-level: collapse to the finest grain FIRST (decimal sums are
    // associative, so re-aggregating partials is exact), then rollup the
    // tiny grouped result — Expand multiplies 25 rows by 3, not the fact
    // table
    val base = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(rev).as("rev"), count(lit(1)).as("n"))
    base.rollup(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
           sum(col("n")).as("n_items"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("revenue"), col("n_items"))
      .orderBy(col("region"), col("nation"))
  }

  /** Full grouping-sets lattice (CUBE over region × market segment):
    * every subtotal combination in one pass. Same two-level discipline as
    * [[revenueRollup]] — collapse to the finest grain FIRST (decimal sums
    * re-aggregate exactly), then Expand multiplies the tiny grouped
    * result by 4, never the fact table. */
  def revenueCube(t: Tables): DataFrame = {
    val rev = (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    val base = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("c_mktsegment"))
      .agg(sum(rev).as("rev"), count(lit(1)).as("n"))
    base.cube(col("r_name"), col("c_mktsegment"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
           sum(col("n")).as("n_items"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("revenue"), col("n_items"))
      .orderBy(col("region"), col("segment"))
  }

  /** Explicit GROUPING SETS — the general lattice rollup and cube are
    * special cases of: here `((flag, status), (flag), ())`, i.e. the
    * detail grain plus one chosen subtotal axis plus the grand total,
    * WITHOUT the `(status)` slice a full cube would also pay for. Same
    * two-level discipline as [[revenueRollup]]: collapse to the finest
    * grain first, so Expand multiplies the ~6-row grouped result by 3,
    * never the fact table. `grouping_id` disambiguates a real NULL key
    * from a subtotal row — the engine-portable marker. */
  def revenueGroupingSets(t: Tables): DataFrame = {
    val rev = (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    val base = t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(rev).as("rev"), count(lit(1)).as("n"))
    base.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty[org.apache.spark.sql.Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("rev")).cast("double").as("revenue"),
        sum(col("n")).as("n_items"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("revenue"), col("n_items"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))
  }

  /** Grouped top-k (top `k` parts by retail price per brand) via a rank
    * window + filter — the shape Spark rewrites into `WindowGroupLimit`:
    * each map task keeps only its local top-k per group BEFORE the
    * exchange, so the shuffle carries ≤ k·groups·partitions rows instead
    * of the whole table. The 100 TB version of "top 3 per category"
    * (gated in PlanSpec: the rewrite must appear in the physical plan). */
  def topPartsPerBrand(t: Tables, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t.part
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
      .select(col("p_brand"), col("rnk").cast("long").as("rnk"),
        col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** Histogram-sketch quantiles: equi-width bins (width 8 over the value
    * domain) → per-group bin counts → cumulative scan → the lower edge of
    * the first bin whose CDF crosses p. Where [[graft.SparkEntry]]'s
    * q_percentiles shuffles EVERY value to sort it (exact, but a corpus
    * sort at 100 TB), this shuffles ≤ groups × bins cells regardless of
    * row count — the same fixed-state trade as the KMV and count-min
    * sketches, with error bounded by the bin width. */
  def histogramQuantiles(t: Tables, binWidth: Double = 8.0): DataFrame = {
    val binned = t.events
      .groupBy(col("event_type"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("event_type"))
    binned
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(tot))
      .groupBy(col("event_type"), col("n"))
      .agg(
        min(when(col("cum") >= col("n") * 0.5, col("bin"))).as("p50_bin"),
        min(when(col("cum") >= col("n") * 0.95, col("bin"))).as("p95_bin"))
      .select(col("event_type"), col("n"),
        (col("p50_bin") * binWidth).cast("double").as("p50_lo"),
        (col("p95_bin") * binWidth).cast("double").as("p95_lo"))
      .orderBy(col("event_type"))
  }

  /** Time-series gap fill: resample each user's activity onto a REGULAR
    * hourly grid between their first and last event, zero-filling silent
    * hours — the prep step for any model that assumes regularly-sampled
    * series. The grid comes from a narrow `sequence()` explode of each
    * user's (lo, hi) span (2 timestamps per user cross the wire, never
    * the grid), and the fill is one equi-join back onto the hourly
    * aggregate. */
  def gapFillHourly(t: Tables, maxUserId: Long = 50): DataFrame = {
    val hourly = t.events.filter(col("user_id") < maxUserId)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("hour"))
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .na.fill(0L, Seq("n")).na.fill(0.0, Seq("sum_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Tumbling 1-hour windowed aggregation over events (batch twin of the
    * structured-streaming job in [[graft.streaming.EventWindows]]). */
  def eventHourly(t: Tables): DataFrame = {
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Write `orders` and `lineitem` as catalog tables BUCKETED (and
    * sorted) on the join key — the co-located layout for the one join a
    * warehouse runs constantly and can never broadcast: fact × fact.
    * Build once; every subsequent orderkey join reads both sides already
    * hash-distributed, so the join plans with NO Exchange (the sort may
    * remain when a bucket spans several files — cheap and local, the
    * network move is what the layout deletes). At 100 TB this is the
    * difference between shuffling the two largest tables per query and
    * never shuffling them again. */
  def persistBucketedFacts(t: Tables, ordersTable: String,
                           lineitemTable: String, path: String,
                           nBuckets: Int = 8): Unit = {
    t.orders.write.mode("overwrite")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$path/orders").saveAsTable(ordersTable)
    t.lineitem.write.mode("overwrite")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$path/lineitem").saveAsTable(lineitemTable)
  }

  /** The fact-fact join served from the [[persistBucketedFacts]] layout:
    * per-priority order counts and revenue. The LAYOUT must never change
    * the answer — the oracle is the same query over the raw parquet. The
    * only shuffle left in the plan is the final 5-row priority rollup;
    * the orderkey join itself is Exchange-free (gated in PlanSpec). */
  def bucketedOrderRevenue(spark: org.apache.spark.sql.SparkSession,
                           ordersTable: String,
                           lineitemTable: String): DataFrame = {
    val o = spark.table(ordersTable)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = spark.table(lineitemTable)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    // MERGE hint: without it the planner happily broadcasts the smaller
    // fact at test scale and never touches the bucketed layout — the
    // exact plan this operator exists to demonstrate. At 100 TB neither
    // fact broadcasts and SMJ-over-buckets is the only sane plan anyway.
    l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Time-RANGE framed window: per event, the count and exact decimal sum
    * of the SAME USER's events in the trailing 24 hours (inclusive). The
    * rest of the window family here is ROWS-framed ([[supplierWindows]],
    * `lastN`) — RANGE frames are the time-series form: the frame is
    * defined by the ORDER-BY VALUE, so same-second events are peers and
    * enter each other's frames regardless of arrival order, which is what
    * makes the result partition-order-proof. One shuffle on user_id;
    * Spark's WindowExec keeps the sliding frame incremental (it never
    * rescans 24 h per row). */
  def trailingDaily(events: DataFrame): DataFrame = {
    val base = events.select(col("event_id"), col("user_id"),
      col("ts").cast("long").as("sec"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-86400, Window.currentRow)
    base.select(col("event_id"), col("user_id"), col("sec"),
        count(lit(1)).over(w).as("trailing_n"),
        sum(dec(col("value"))).over(w).cast("double").as("trailing_sum"))
      .orderBy(col("event_id"))
  }

  /** MERGE-style upsert without a table format: `base ⟕̸ updates ∪ updates`
    * — rows whose key appears in the update batch are replaced, everyone
    * else survives, new keys insert. With `autoBroadcast=true` (default)
    * the anti-join carries a BROADCAST hint on the update side: a daily
    * CDC batch is orders of magnitude smaller than the base, so the
    * 100 TB base never shuffles for the merge (broadcast-hash LEFT ANTI)
    * and the union is a zero-shuffle concatenation.
    *
    * SIZE CONTRACT: an explicit broadcast hint OVERRIDES Spark's
    * threshold — an update batch past the broadcast hard limit fails the
    * job rather than falling back. For oversized batches (a backfill
    * replaying weeks of CDC at once) pass `autoBroadcast=false`: the
    * un-hinted join lets AQE pick a runtime broadcast when the measured
    * batch is small and a shuffled join otherwise — and with a bucketed
    * base ([[persistBucketedFacts]]) that shuffled join still moves only
    * the update side. Returns the merged table; callers aggregate or
    * write. */
  def mergeOrders(base: DataFrame, updates: DataFrame,
                  autoBroadcast: Boolean = true): DataFrame = {
    val keys = updates.select(col("o_orderkey"))
    base
      .join(if (autoBroadcast) broadcast(keys) else keys,
        Seq("o_orderkey"), "left_anti")
      .unionByName(updates)
  }

  /** The checked upsert summary: a deterministic update batch (every
    * 100th orderkey re-statused 'U') merged into orders, rolled up per
    * status — counts AND decimal-exact revenue move between statuses iff
    * the merge replaced exactly the right rows. */
  def upsertSummary(t: Tables): DataFrame = {
    val updates = t.orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderstatus", lit("U"))
    mergeOrders(t.orders, updates)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Write events Hive-partitioned by day — the time-series layout every
    * event warehouse lands on: a day-ranged query must open only that
    * day's directories, never list-then-filter the full history. At
    * 100 TB (years of events) partition pruning is the difference
    * between scanning ~0.1% and scanning everything. */
  def persistPartitionedEvents(t: Tables, path: String): Unit =
    t.events.withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)

  /** One day's per-type rollup served from the [[persistPartitionedEvents]]
    * layout. The date predicate lands in the scan's PartitionFilters
    * (gated in PlanSpec) — directory-level pruning, zero data filtering —
    * and the layout never changes the answer: the oracle is the same
    * day-filter over the raw table. */
  def prunedDailyEvents(spark: org.apache.spark.sql.SparkSession,
                        path: String, day: String = "2024-01-15"): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_date") === lit(day).cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"))
}
