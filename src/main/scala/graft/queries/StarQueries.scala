package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Engine surface beyond the reference's single-fact rollups: joins,
  * analytic windows, set operations, grouping sets, top-k — the
  * operators SURVEY.md §2.3/§2.5/§2.6/§2.7 lists as "engine surface,
  * out of strict parity" — exercised over the driver's TPC-H-ish star
  * schema.
  *
  * Scale design:
  *  - Dimension tables (region 5 rows … customer 1.5k·sf) are
  *    broadcast explicitly (`broadcast(dim)`): at 100 TB the fact
  *    tables shuffle-join each other only when both sides are large
  *    (lineitem ⋈ orders), where sort-merge with AQE is correct.
  *  - Aggregations sit above joins so Catalyst's partial aggregation
  *    cuts shuffle volume; filters are placed on raw columns so they
  *    reach the parquet scans.
  *  - Top-k uses orderBy+limit → `TakeOrderedAndProject` (per-partition
  *    heap, no global sort materialization).
  */
object StarQueries {

  /** TPC-H Q1-style pricing summary: scan-heavy single-table
    * aggregation — the classic map-side-partial benchmark query.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Revenue per nation per year: lineitem ⋈ orders (big-big,
    * sort-merge) ⋈ customer ⋈ nation (broadcast dims). The join-order/
    * broadcast shape is the one a 1000-executor cluster wants: the two
    * fact tables hash-shuffle on the join key once; dims never shuffle.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("order_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("nation"), col("order_year"))
  }

  /** Top-10 customers by revenue — join + agg + orderBy().limit()
    * (physical: `TakeOrderedAndProject`, no full global sort).
    */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    ord.groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("order_cnt"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("order_cnt"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Left-semi join (EXISTS): customers that placed at least one
    * F-status order; counts per market segment.
    */
  def segmentActiveCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val fOrders = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    cust.join(fOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("active_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): customers that never placed an
    * urgent-priority order (non-empty at every fixture scale).
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Analytic window functions: rank each customer's 3 most expensive
    * orders (row_number) and attach a per-customer running total
    * ordered by date — `ROW_NUMBER`/frame specs the reference never
    * uses (SURVEY.md §2.5) but the engine must offer.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(byPrice))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Per-customer running order total (cumulative frame). */
  def runningCustomerTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("running_total"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  /** ROLLUP grouping-sets over nation × market segment (SURVEY.md
    * §2.4 lists cube/rollup as engine surface).
    */
  def rollupNationSegment(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name").as("nation"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("nation").asc_nulls_first, col("segment").asc_nulls_first)
  }

  /** Arbitrary GROUPING SETS — the general form `rollup`/`cube` are
    * shorthands for: independent per-nation and per-segment rollups in
    * ONE pass over the join (Expand multiplies rows by the set count
    * map-side; a naive twin would scan and join twice and union).
    * `grouping()` flags disambiguate which set each output row belongs
    * to — the standard way consumers tell a real NULL key from a
    * rolled-up one.
    */
  def groupingSetsMix(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name")), Seq(col("c_mktsegment"))),
        col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"),
        grouping(col("n_name")).cast("long").as("g_nation"),
        grouping(col("c_mktsegment")).cast("long").as("g_segment"))
      .orderBy(col("n_name").asc_nulls_first,
        col("c_mktsegment").asc_nulls_first)
  }

  /** Set operations (union / intersect / except — SURVEY.md §2.7):
    * customer keys segmented by behavior.
    */
  def setOpsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val highValue = ord.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val both = highValue.intersect(urgent).withColumn("bucket", lit("both"))
    val either = highValue.union(urgent).distinct().withColumn("bucket", lit("either"))
    val onlyHigh = highValue.except(urgent).withColumn("bucket", lit("high_only"))
    both.union(either).union(onlyHigh)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("customers"))
      .orderBy(col("bucket"))
  }

  /** Distribution statistics per group: exact interpolated percentiles
    * (`percentile`), sample stddev, extremes — the numeric-profiling
    * surface (DuckDB twin uses the same continuous-quantile
    * definition, `quantile_cont`).
    */
  def valueStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("median_value"),
        round(expr("percentile(value, 0.95)"), 4).as("p95_value"),
        round(stddev_samp(col("value")), 4).as("stddev_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy(col("event_type"))

  /** [[revenueByNation]] with the fact⋈fact join FORCED to
    * shuffle-hash via the hint API (`hint("shuffle_hash")`): skips
    * SMJ's two sorts — the right call when neither side fits a
    * broadcast but one side's per-partition build fits memory.
    * SketchesSpec asserts `ShuffledHashJoin` actually planned.
    *
    * The revenue aggregates EXACT integer cents (per-row round, then
    * integer sum), not `round(sum(double))`: changing the join
    * strategy changes double-summation order, and a same-run
    * experiment landed one group a cent across the rounding boundary
    * vs the SMJ plan. A gate asserting "hints don't change results"
    * must aggregate order-invariantly, or it asserts something floats
    * don't promise.
    */
  def revenueByNationShuffleHash(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir).hint("shuffle_hash")
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("order_year"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
        .cast("long")).as("revenue_cents"))
      .orderBy(col("nation"), col("order_year"))
  }

  /** Bag-semantics set operations (`EXCEPT ALL` / `INTERSECT ALL` —
    * multiplicity-preserving, unlike the distinct forms the
    * `star_setops_customers` gate covers): urgent-order customer keys
    * vs finished-order customer keys, WITH duplicates (a customer
    * with three urgent orders and one finished order survives
    * EXCEPT ALL twice). Both ops plan as one keyed shuffle with
    * count-difference arithmetic — no distinct collapse, no join
    * explosion.
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val a = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val b = ord.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    a.exceptAll(b).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
      .unionByName(
        a.intersectAll(b).agg(count(lit(1)).as("n"))
          .select(lit("intersect_all").as("op"), col("n")))
      .orderBy(col("op"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "star_setops_all" -> (setOpsAll _),
    "stats_value_by_type" -> (valueStats _),
    "star_pricing_summary" -> (pricingSummary _),
    "star_revenue_by_nation" -> (revenueByNation _),
    "star_revenue_shuffle_hash" -> (revenueByNationShuffleHash _),
    "star_top_customers" -> (topCustomers _),
    "star_segment_active" -> (segmentActiveCustomers _),
    "star_customers_no_orders" -> (customersWithoutOrders _),
    "star_top_orders_per_customer" -> (topOrdersPerCustomer _),
    "star_running_total" -> (runningCustomerTotal _),
    "star_rollup_nation_segment" -> (rollupNationSegment _),
    "star_grouping_sets" -> (groupingSetsMix _),
    "star_setops_customers" -> (setOpsCustomers _)
  )

  private val RevenueOracle: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The hinted twin's oracle sums exact per-row cents — see
    * [[revenueByNationShuffleHash]] for why the hint gate cannot use
    * the `round(sum(double))` form. */
  private val RevenueCentsOracle: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
      |                     AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "star_setops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |           WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'except_all' AS op, count(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'intersect_all', count(*)
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |ORDER BY op""".stripMargin,
    "star_grouping_sets" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS total_bal,
        |       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        |       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY 1, 2""".stripMargin,
    "stats_value_by_type" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS median_value,
        |       round(quantile_cont(value, 0.95), 4) AS p95_value,
        |       round(stddev_samp(value), 4) AS stddev_value,
        |       round(min(value), 2) AS min_value,
        |       round(max(value), 2) AS max_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "star_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 2) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "star_revenue_by_nation" -> RevenueOracle,
    "star_revenue_shuffle_hash" -> RevenueCentsOracle,
    "star_top_customers" ->
      """SELECT c_custkey, c_name, revenue, order_cnt
        |FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue,
        |             count(*) AS order_cnt
        |      FROM orders GROUP BY 1)
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "star_segment_active" ->
      """SELECT c_mktsegment, count(*) AS active_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "star_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "star_top_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "star_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_total
        |FROM orders ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "star_rollup_nation_segment" ->
      """SELECT n_name AS nation, c_mktsegment AS segment,
        |       count(*) AS customers, round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY nation NULLS FIRST, segment NULLS FIRST""".stripMargin,
    "star_setops_customers" ->
      """WITH high AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
        |     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |     labeled AS (
        |       SELECT 'both' AS bucket, * FROM (SELECT * FROM high INTERSECT SELECT * FROM urgent)
        |       UNION ALL
        |       SELECT 'either', * FROM (SELECT DISTINCT * FROM (SELECT * FROM high UNION ALL SELECT * FROM urgent))
        |       UNION ALL
        |       SELECT 'high_only', * FROM (SELECT * FROM high EXCEPT SELECT * FROM urgent))
        |SELECT bucket, count(*) AS customers FROM labeled
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
