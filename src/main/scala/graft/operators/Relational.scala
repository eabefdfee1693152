package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational analytics core (SURVEY.md §2 B-suite): 14 query
  * shapes covering scan/filter/agg, shuffle + broadcast joins, star
  * joins, windows, rollup, semi/anti, sessionization.
  *
  * Scale notes (100 TB design intent):
  *  - every query is declarative DataFrame API → Catalyst pushes
  *    filters/projections into the parquet scan (verified via
  *    `.explain` → PushedFilters / ReadSchema, see PERF.md);
  *  - dimension tables (region/nation/supplier/customer-at-dim-size)
  *    are joined with explicit `broadcast()` hints so fact scans never
  *    shuffle for them;
  *  - aggregates are partial (map-side combine) by construction;
  *  - all money sums round at the END, never inside the aggregation.
  *
  * Determinism-for-oracle rules (SURVEY.md §4): every query ends in a
  * total-order ORDER BY; doubles rounded; timestamps truncated and
  * emitted as strings or epoch BIGINTs.
  */
object Relational {

  private def ntz(y: Int, m: Int, d: Int): Column =
    lit(LocalDateTime.of(y, m, d, 0, 0, 0))

  /** q1: TPC-H Q1-style pricing summary — scan → filter → groupBy
    * aggregate. The canonical partial-agg shape: 6 aggregates over 2
    * low-cardinality keys means the shuffle carries ~8 rows per task.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= ntz(1998, 9, 1))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2: highly selective filter + narrow projection — exists to prove
    * predicate + column pushdown reach the scan (PushedFilters on
    * l_shipdate/l_discount/l_quantity, ReadSchema of 6 of 11 cols).
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ntz(1997, 1, 1) && col("l_shipdate") < ntz(1998, 1, 1)
        && col("l_discount") > lit(0.06) && col("l_quantity") < lit(5.0))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      // lineitem has NO unique key in this dataset ((orderkey,
      // linenumber) repeats) — order by every output column so the
      // row order is total up to full-duplicate rows (which hash
      // identically anyway). Same rule in the oracle SQL.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))

  /** q3: TPC-H Q3-style 3-table join + agg + top-N. customer is the
    * small side at dim scale → broadcast; orders⨝lineitem is the real
    * shuffle join on orderkey.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < ntz(1998, 1, 1)),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate_s"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)

  /** q4: broadcast (map-side) join of a 25-row dim onto the fact —
    * zero shuffle for the join itself; only the 25-group agg shuffles.
    */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("n_name"))

  /** q5: TPC-H Q5-style 6-table star join — region/nation broadcast,
    * customer⨝orders⨝lineitem shuffle on their keys, supplier joined
    * with the local-supplier constraint (s_nationkey = c_nationkey).
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    Tables.customer(spark, dir)
      .join(broadcast(nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** q6: window functions — rank + running sum per customer. Both
    * windows share one partitioning (custkey) so Spark plans a single
    * shuffle + sort for both.
    */
  def q6Window(spark: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir).filter(col("o_custkey") < 200)
      .select(col("o_orderkey"), col("o_custkey"),
        rank().over(byPrice).cast("long").as("rnk"),
        round(sum(col("o_totalprice")).over(byDate), 2).as("run_spend"))
      .orderBy(col("o_orderkey"))
  }

  /** q7: exact distinct aggregation (count distinct custkey per
    * priority). The approx (HLL) variant lives in
    * `approxDistinct` below — spec-checked, not oracle-checked,
    * since HLL sketches aren't cross-engine comparable.
    */
  def q7DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_ord"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority"))

  /** approx_count_distinct companion to q7 (2% rsd HLL). At 100 TB the
    * exact distinct is a full shuffle of the key; the sketch is a
    * constant-size partial aggregate — this is the scale path.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("n_cust_approx"))
      .orderBy(col("o_orderpriority"))

  /** q8: left-semi (EXISTS) + left-anti (NOT EXISTS) in one result:
    * customers with vs without orders per market segment.
    */
  def q8SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir).select(col("o_custkey"))
    val withOrd = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with"))
    val without = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
    withOrd.join(without, Seq("c_mktsegment"), "full_outer")
      .na.fill(0L, Seq("n_with", "n_without"))
      .orderBy(col("c_mktsegment"))
  }

  /** q9: GROUP BY ROLLUP(region, nation) hierarchy aggregate; NULL
    * grouping keys rewritten to 'ALL' for a stable total order.
    */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"), col("sum_bal"))
      .orderBy(col("region_name"), col("nation_name"))

  /** q20: CUBE grouping — all four grouping sets of (priority,
    * status) in one pass; with rollup (q9) this completes the OLAP
    * grouping family. Spark expands the cube map-side and
    * partial-aggregates, so the shuffle carries ≤ 4 × |groups| rows
    * regardless of fact size. Null group keys coalesce to 'ALL'
    * before the ORDER BY so both engines sort identical values
    * (engine null-ordering defaults differ).
    */
  def q20Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_ord"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_ord"), col("sum_price"))
      .orderBy(col("priority"), col("status"))

  /** q10: global top-k — Spark plans this as per-partition top-k then
    * a single k-row merge on the driver side of the exchange
    * (TakeOrderedAndProject), i.e. no full sort of 100 TB.
    */
  def q10TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))
      .limit(100)

  /** q11: tumbling-window event aggregation — the batch analogue of
    * the streaming windowed agg (streaming/StreamingAgg.scala), using
    * the same `window()` semantics.
    */
  def q11EventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** q12: gap-based sessionization (30-min inactivity gap) via
    * lag + cumulative-sum of session-start flags — one shuffle on
    * user_id, everything after is within-partition window work.
    */
  def q12Sessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Tables.events(spark, dir), gapSeconds = 1800)

  /** q13: conditional (pivot-style) aggregation per user. */
  def q13CaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "click", lit(1))).as("n_click"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 2)
          .as("purchase_value"),
        round(sum(when(col("event_type") === "error", col("value")).otherwise(lit(0.0))), 2)
          .as("error_value"))
      .orderBy(col("user_id"))

  /** q15: correlated scalar subquery (items well above their part's
    * average quantity — TPC-H Q17 family), rewritten as a window
    * aggregate: one shuffle on partkey, no self-join, which is the
    * plan Catalyst's DecorrelateInnerQuery ultimately wants anyway.
    */
  def q15ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val byPart = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_quantity"),
        round(avg(col("l_quantity")).over(byPart), 6).as("avg_qty"))
      .filter(col("l_quantity") > lit(1.8) * col("avg_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
  }

  /** q16: interpolated percentiles per group (median + p90 order
    * value) — exact `percentile` here for oracle parity; the 100 TB
    * path is [[approxPercentile]] (same API shape).
    */
  def q16Percentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n_ord"))
      .orderBy(col("o_orderpriority"))

  /** approx_percentile companion to q16 (the q7/approxDistinct design
    * rule applied to percentiles). Exact `percentile` buffers EVERY
    * group value in its aggregation state — the one aggregate in this
    * suite whose partials are O(group size), which at 100 TB means
    * the agg state of a hot priority is the priority's row count. The
    * sketch (Greenwald-Khanna ε-approximate quantile summary) keeps
    * constant-size partials that merge associatively, restoring the
    * map-side-combine shape every other aggregate here has. accuracy
    * = 1/ε: 10⁴ bounds the rank error at 0.01% of each group —
    * spec-checked against the exact path within tolerance.
    */
  def approxPercentile(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr(s"approx_percentile(o_totalprice, 0.5, $accuracy)"), 4).as("p50_approx"),
        round(expr(s"approx_percentile(o_totalprice, 0.9, $accuracy)"), 4).as("p90_approx"),
        count(lit(1)).as("n_ord"))
      .orderBy(col("o_orderpriority"))

  /** q19: semi-structured extraction — pull a typed field out of a
    * JSON string column and aggregate it. `get_json_object` is a
    * codegen'd path expression over the raw string (no UDF, no
    * full-document parse into a struct), so at 100 TB the extraction
    * runs at scan speed; the aggregate is an ordinary partial-agg
    * shuffle of one row per event_type. avg is emitted fixed-point
    * (floor(1e4·sum/n)) for cross-engine bit parity.
    */
  def q19JsonAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        floor(lit(10000.0) * sum(col("k")) / count(lit(1))).as("avg_k_fs"))
      .orderBy(col("event_type"))

  /** q14: correlated EXISTS predicate (customers having a >300k
    * order) — rewritten as a left-semi join, which is exactly what
    * Catalyst does to a correlated EXISTS subquery.
    */
  def q14ExistsSubquery(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > lit(300000.0))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))

  /** q22: offset + tile window functions — lag/lead (previous/next
    * order's price along each customer's order history) and ntile
    * spend quartiles, completing the window family beyond q6's
    * rank/running-sum. Both window specs partition on o_custkey, so
    * the plan carries ONE shuffle: lag/lead fuse into a single
    * WindowExec (same spec), and the ntile WindowExec reuses the
    * existing hash partitioning with only an intra-partition re-sort
    * (plan-audited: one Exchange before the windows, none between).
    *
    * Determinism: the intra-partition order ties on (o_orderdate,
    * o_orderkey) — a total key, so lag/lead/ntile agree across
    * engines; prices round at the end.
    */
  def q22WindowOffsets(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir).filter(col("o_custkey") < 200)
      .select(col("o_orderkey"), col("o_custkey"),
        round(lag(col("o_totalprice"), 1).over(byDate), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(byDate), 2).as("next_price"),
        ntile(4).over(byPrice).cast("long").as("spend_quartile"))
      .orderBy(col("o_orderkey"))
  }

  /** q21: unpivot/melt — lineitem's four measure columns become
    * (measure, value) rows via Spark's native `Dataset.unpivot`
    * (Catalyst `Expand`: each input row emits one row per measure in
    * the SAME scan pass — no self-union, no extra shuffle), then a
    * per-measure aggregate.
    *
    * Oracle determinism: double sums are accumulation-ORDER-dependent
    * across engines, so values convert to exact integer cents
    * (round(v·100) — bit-identical IEEE multiply + half-up round both
    * sides) BEFORE summing; sums and the derived fixed-point mean are
    * then exact BIGINT arithmetic.
    */
  def q21Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_quantity").as("quantity"), col("l_extendedprice").as("extendedprice"),
        col("l_discount").as("discount"), col("l_tax").as("tax"))
      .unpivot(Array.empty[Column],
        Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        "measure", "value")
      .select(col("measure"), round(col("value") * 100).cast("long").as("v_fs"))
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), sum(col("v_fs")).as("total_fs"))
      .withColumn("mean_fs", floor(lit(100.0) * col("total_fs") / col("n")))
      .orderBy(col("measure"))

  /** q23: pivot — q21's inverse reshape. Status columns per priority
    * row via `RelationalGroupedDataset.pivot` with EXPLICIT values:
    * Catalyst plans one (priority, status) partial aggregate and one
    * pivot_first aggregate on top — a single scan and two exchanges
    * that carry ≤ |priorities|×|values| partially-aggregated rows, no
    * per-value passes over the fact table. (Without explicit values
    * Spark runs an extra distinct-collect JOB to discover them —
    * never do that at 100 TB.)
    *
    * Oracle determinism: integer cents BEFORE the sums (q21's rule);
    * a (priority, status) cell with no orders is NULL in both the
    * pivot and the oracle's conditional sum.
    */
  def q23Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_fs"))
      .groupBy(col("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("price_fs")))
      .select(col("priority"), col("F").as("f_total_fs"),
        col("O").as("o_total_fs"), col("P").as("p_total_fs"))
      .orderBy(col("priority"))

  /** q24: set operators — INTERSECT/EXCEPT as native Catalyst
    * operators (semi/anti hash joins over distinct inputs, partial
    * aggregation on both sides — never a row-by-row comparison).
    * Customers ordering in both 1995 and 1996 vs only in 1995, tagged
    * and unioned into one frame.
    */
  def q24SetOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def custsIn(y: Int) =
      orders.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    val c95 = custsIn(1995)
    val c96 = custsIn(1996)
    c95.intersect(c96).withColumn("tag", lit("both"))
      .unionByName(c95.except(c96).withColumn("tag", lit("only_1995")))
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** q25: explicit GROUPING SETS — the general form [[q9Rollup]] and
    * [[q20Cube]] are shortcuts for: here ONLY the two one-dimensional
    * marginals, a set list neither shortcut can express (rollup would
    * add the hierarchy prefix, cube the pairwise cell). Same plan
    * family: one map-side Expand over the set list, one aggregate
    * pass, one shuffle — the set count multiplies mapper output rows,
    * never the number of passes over 100 TB.
    */
  def q25GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_ord"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_ord"), col("sum_price"))
      .orderBy(col("priority"), col("status"))

  /** q26: correlated LATERAL top-n — "for every nation, its three
    * highest-balance customers", the `FROM nation, LATERAL (SELECT …
    * ORDER BY … LIMIT 3)` shape (Spark 4's `Dataset.lateralJoin` with
    * an `.outer()` correlated reference). Catalyst DECORRELATES the
    * per-key limit into a rank-filtered window join rather than
    * re-running the subquery per outer row — the plan a hand-written
    * [[q10TopK]]-per-group would need anyway, with the declarative
    * form keeping the correlation visible to the optimizer.
    */
  def q26LateralTopN(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
      .lateralJoin(
        Tables.customer(spark, dir)
          .filter(col("c_nationkey") === col("n_nationkey").outer())
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .limit(3)
          .select(col("c_custkey"), col("c_acctbal")))
      .select(col("n_name"), col("c_custkey"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("n_name"), col("c_custkey"))
}
