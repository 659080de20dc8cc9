package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational corpus (SURVEY.md §2.C: scan/project/filter, joins of
  * every flavor, aggregation) over the TPC-H-ish driver tables.
  *
  * Conventions shared by the whole corpus:
  *  - every computed double aggregate is `round(..., n)`-ed identically in
  *    the DataFrame and the oracle SQL so cross-engine float summation
  *    order cannot flip the driver's hash compare;
  *  - every query with `limit`/top-k sorts on a deterministic key chain
  *    (ties broken by a unique id);
  *  - output column names are aliased identically on both sides.
  */
object CoreQueries {
  import Tables._

  private val ts = (s: String) => lit(s).cast("timestamp")

  /** TPC-H Q1 analog: pricing summary. The flagship query. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 analog: unshipped-order revenue, top 10. Exercises the
    * fact-fact sort-merge join (orders⋈lineitem) plus a selective dim
    * filter; at scale AQE turns the filtered customer side into a
    * broadcast. */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = ts("1997-06-30 00:00:00")
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 analog: revenue per nation within one year. Star join:
    * region/nation broadcast, customer⋈orders⋈lineitem⋈supplier with the
    * local-supplier constraint (c_nationkey = s_nationkey). */
  def q5RegionRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1997-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  /** Left-semi join (EXISTS): orders having any near-full-quantity line. */
  def qSemiExists(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") >= 48),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** Left-anti join (NOT EXISTS): customers with no early-1995 order. */
  def qAntiNoOrders(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderdate") < ts("1995-07-01 00:00:00")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("c_mktsegment"))

  /** Left-outer join with null-aware aggregation over the optional side. */
  def qOuterCustomerOrders(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_cust"),
        count(col("o_orderkey")).as("n_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("sum_total"))
      .orderBy(col("c_mktsegment"))

  /** Per-group top-k via ranking window: 3 biggest orders per customer. */
  def qTopOrdersPerCust(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      // rn cast to long: DuckDB row_number() yields BIGINT and the driver
      // compares schemas, so the corpus pins ranking outputs to 64-bit.
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Broadcast-dim star: customer stats per region/nation. */
  def qNationBalance(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"),
        round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))

  /** TPC-H Q18 analog (round 13): customers whose single order carries a
    * >300-unit basket — the classic "aggregate, filter, then rejoin the
    * facts" shape. The basket rollup is map-side combined and the >300
    * filter leaves a sliver, so BOTH rejoins broadcast the sliver and
    * stream the big table past it: orders never shuffles, customer never
    * shuffles. Quantities are integer-valued doubles; casting each to
    * long BEFORE the sum keeps the rollup exact in both engines. */
  def qLargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 300)
    val hits = orders(s, d)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100).cast("long").as("total_cents"),
        col("total_qty"))
    customer(s, d)
      .join(broadcast(hits), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("total_cents"), col("total_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q7 analog (round 13): bilateral trade volume between two
    * nations per ship year — the 6-table star whose plan quality IS the
    * operator: both nation dims broadcast, customer/supplier hash-join
    * the fact stream, and the shipdate band prunes at the parquet scan.
    * Revenue sums exact cents: floor of the double product is
    * bit-identical across engines (the decayed-engagement device). */
  def qTradeVolume(s: SparkSession, d: String): DataFrame = {
    val n1 = broadcast(nation(s, d)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(nation(s, d)
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation")))
    lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("snk"))
      .join(n2, col("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
        (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** TPC-H Q21 shape adapted to the available columns (round 13): for
    * multi-supplier orders, which supplier shipped LAST (the shipment
    * that closed the order) — the blame report Q21 computes with
    * commit/receipt dates. One order-keyed window picks the closing
    * line deterministically ((shipdate, suppkey) desc), a groupBy-HAVING
    * sliver marks multi-supplier orders and joins back broadcast, and
    * the supplier dim broadcasts onto the per-supplier rollup. */
  def qMultiSupplierOrders(s: SparkSession, d: String): DataFrame = {
    // round-18 (guide §2.4): ONE order-keyed aggregation replaces the
    // old three-pass shape (distinct-count rollup + semi-join back onto
    // a second full lineitem scan + per-order row_number window — 12
    // Exchanges). The closing line under ORDER BY (l_shipdate DESC,
    // l_suppkey DESC) is exactly the lexicographic max of the
    // (l_shipdate, l_suppkey) struct, so the window collapses into
    // max(struct(..)) computed in the same pass as the distinct
    // supplier count. Identical output by construction.
    Tables.spread(lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate")))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        max(struct(col("l_shipdate"), col("l_suppkey"))).as("closing"))
      .filter(col("n_supp") >= 2)
      .groupBy(col("closing.l_suppkey").as("l_suppkey"))
      .agg(count(lit(1)).as("n_closed"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_closed"))
      .orderBy(col("n_closed").desc, col("s_suppkey"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_trade_volume" -> qTradeVolume,
    "q_multi_supplier_orders" -> qMultiSupplierOrders,
    "q_large_orders" -> qLargeOrders,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_region_revenue" -> q5RegionRevenue,
    "q_semi_exists" -> qSemiExists,
    "q_anti_no_orders" -> qAntiNoOrders,
    "q_outer_customer_orders" -> qOuterCustomerOrders,
    "q_top_orders_per_cust" -> qTopOrdersPerCust,
    "q_nation_balance" -> qNationBalance,
  )

  val oracles: Map[String, String] = Map(
    "q_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    "q_multi_supplier_orders" ->
      """WITH multi AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY 1 HAVING count(DISTINCT l_suppkey) >= 2
        |), closing AS (
        |  SELECT l_suppkey FROM (
        |    SELECT l.l_suppkey,
        |      row_number() OVER (PARTITION BY l.l_orderkey
        |        ORDER BY l.l_shipdate DESC, l.l_suppkey DESC) AS rn
        |    FROM lineitem l JOIN multi m ON m.l_orderkey = l.l_orderkey)
        |  WHERE rn = 1
        |)
        |SELECT s.s_suppkey, s.s_name, count(*) AS n_closed
        |FROM closing c JOIN supplier s ON s.s_suppkey = c.l_suppkey
        |GROUP BY 1, 2
        |ORDER BY n_closed DESC, s.s_suppkey LIMIT 10""".stripMargin,
    "q_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        |)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        |  CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_cents,
        |  b.total_qty
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN big b ON b.l_orderkey = o.o_orderkey
        |ORDER BY total_cents DESC, o.o_orderkey LIMIT 100""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_semi_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_anti_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_outer_customer_orders" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(o_orderkey) AS n_orders,
        |  round(sum(coalesce(o_totalprice, 0)), 2) AS sum_total
        |FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_nation_balance" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS sum_bal,
        |  round(avg(c_acctbal), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
  )
}
