package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SQL-text surface (spark.sql through the full Catalyst parser /
  * analyzer over registered views) and non-parquet source round-trips
  * (CSV/JSON sinks + schema-enforced reads). The reference exposes no
  * SQL parser of its own — exactly like it, we delegate the whole SQL
  * stack to the engine underneath (SURVEY.md §0).
  */
object SqlSourceQueries {
  import Tables._

  private def view(s: SparkSession, d: String, name: String): String = {
    val vname = s"graft_${name}_v"
    table(s, d, name).createOrReplaceTempView(vname)
    vname
  }

  /** TPC-H Q6 analog through spark.sql. */
  def qSqlRevenueFilter(s: SparkSession, d: String): DataFrame = {
    val li = view(s, d, "lineitem")
    s.sql(
      s"""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
         |       count(*) AS n
         |FROM $li
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.02 AND 0.04
         |  AND l_quantity < 24""".stripMargin)
  }

  /** GROUP BY + HAVING + join through spark.sql. */
  def qSqlHaving(s: SparkSession, d: String): DataFrame = {
    val (o, c) = (view(s, d, "orders"), view(s, d, "customer"))
    s.sql(
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |       round(sum(o_totalprice), 2) AS total
         |FROM $o JOIN $c ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |HAVING count(*) > 100
         |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Correlated EXISTS subquery through spark.sql. */
  def qSqlExistsSubquery(s: SparkSession, d: String): DataFrame = {
    val (su, li) = (view(s, d, "supplier"), view(s, d, "lineitem"))
    s.sql(
      s"""SELECT s_nationkey, count(*) AS n_supp
         |FROM $su s
         |WHERE EXISTS (SELECT 1 FROM $li l
         |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
         |GROUP BY s_nationkey
         |ORDER BY s_nationkey""".stripMargin)
  }

  /** Explicit GROUPING SETS (beyond rollup/cube) through spark.sql. */
  def qSqlGroupingSets(s: SparkSession, d: String): DataFrame = {
    val li = view(s, d, "lineitem")
    s.sql(
      s"""SELECT coalesce(l_returnflag, '(all)') AS rflag,
         |       coalesce(l_linestatus, '(all)') AS lstatus,
         |       sum(l_quantity) AS sum_qty, count(*) AS n
         |FROM $li
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY rflag, lstatus""".stripMargin)
  }

  /** Correlated SCALAR subqueries in a WHERE — Catalyst decorrelates
    * each into an aggregate + join (no per-row subplan execution, which
    * is what makes the shape survive scale): customers whose balance
    * beats their nation's average. Above-average is tested in exact
    * integer cents — `cents·n > Σcents` — because a raw double
    * avg() is summation-order engine-private; floor(x·100) per element
    * is deterministic IEEE. */
  def qSqlCorrelatedScalar(s: SparkSession, d: String): DataFrame = {
    val c = view(s, d, "customer")
    s.sql(
      s"""SELECT c_nationkey, count(*) AS n_above,
         |       round(max(c_acctbal), 2) AS max_bal
         |FROM $c outer_c
         |WHERE CAST(floor(c_acctbal * 100) AS BIGINT) *
         |      (SELECT count(*) FROM $c i1
         |       WHERE i1.c_nationkey = outer_c.c_nationkey)
         |    > (SELECT sum(CAST(floor(c_acctbal * 100) AS BIGINT)) FROM $c i2
         |       WHERE i2.c_nationkey = outer_c.c_nationkey)
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  /** LATERAL correlated subquery — per nation, its top-2 customers by
    * balance through the SQL LATERAL surface (planned as a ranked
    * window under the hood, not a per-row re-scan). */
  def qSqlLateralTopn(s: SparkSession, d: String): DataFrame = {
    val (n, c) = (view(s, d, "nation"), view(s, d, "customer"))
    s.sql(
      s"""SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS bal
         |FROM $n n,
         |LATERAL (SELECT c_custkey, c_acctbal FROM $c
         |         WHERE c_nationkey = n.n_nationkey
         |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         |ORDER BY n.n_name, bal DESC, t.c_custkey""".stripMargin)
  }

  /** Null-safe equality (<=> / IS NOT DISTINCT FROM) over an outer join
    * product, where plain '=' and null-safe '=' genuinely differ. */
  def qNullSafeEq(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderdate") < ts9596),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("eq_f"),
        sum(when(col("o_orderstatus") <=> lit(null), 1L).otherwise(0L)).as("nullsafe_null"),
        sum(when(col("o_orderstatus") <=> "F", 1L).otherwise(0L)).as("nullsafe_f"))
      .orderBy(col("c_mktsegment"))

  private val ts9596 = lit("1995-07-01 00:00:00").cast("timestamp")

  /** CSV sink + schema-enforced CSV source round-trip. */
  def qCsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
    val dir = Files.createTempDirectory("graft_csv_").toString + "/orders"
    src.write.mode("overwrite").option("header", "true").csv(dir)
    s.read.schema(src.schema).option("header", "true").csv(dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** ORC sink + schema-enforced ORC source round-trip (the second
    * columnar format next to parquet). */
  def qOrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_returnflag"))
    val dir = Files.createTempDirectory("graft_orc_").toString + "/lineitem"
    src.write.mode("overwrite").orc(dir)
    s.read.schema(src.schema).orc(dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).as("min_key"), max(col("l_orderkey")).as("max_key"))
      .orderBy(col("l_returnflag"))
  }

  /** Plain-text sink + line source round-trip (spark.read.text — the
    * raw-corpus ingestion format every crawl pipeline starts from).
    * The corpus text is newline-free, so one document = one line and
    * the line stats below pin content integrity exactly. */
  def qTextRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("text"))
    val dir = Files.createTempDirectory("graft_text_").toString + "/docs"
    src.write.mode("overwrite").text(dir)
    s.read.text(dir)
      .select(col("value"), length(col("value")).cast("long").as("len"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("value")).as("n_distinct"),
        sum(col("len")).as("total_chars"),
        min(col("len")).as("min_len"), max(col("len")).as("max_len"))
  }

  /** JSON-lines sink + schema-enforced JSON source round-trip. */
  def qJsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val src = customer(s, d)
    val dir = Files.createTempDirectory("graft_json_").toString + "/customer"
    src.write.mode("overwrite").json(dir)
    s.read.schema(src.schema).json(dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Recursive CTE (round 13; Spark 4.1's WITH RECURSIVE) — BFS
    * reachability with hop counts over the nation-level trade graph
    * (edge = "a supplier in nation X supplied an order of a customer
    * in nation Y"). The recursion is scale-safe BY CONSTRUCTION: it
    * runs over a dimension-sized graph (≤ 25² edges at any corpus
    * scale — the corpus-sized joins happen ONCE to build the edge
    * view), bounded at 3 hops, and the UNION ALL path fan-out is
    * capped by 25³ before the min-hop rollup. Both engines execute
    * the identical iteration, so hop counts match exactly. */
  def qSqlRecursive(s: SparkSession, d: String): DataFrame = {
    val (li, o, c, su) = (view(s, d, "lineitem"), view(s, d, "orders"),
      view(s, d, "customer"), view(s, d, "supplier"))
    // MATERIALIZE the dimension-sized edge set (≤ 25² rows) before the
    // recursion (round-18, guide §2.4/§3.3): UnionLoop re-executes its
    // step subtree every iteration, and with `edges` as a plain CTE the
    // step subtree embedded the corpus-sized 4-table join — the plan
    // ran lineitem ⋈ orders ⋈ customer ⋈ supplier once per hop. A
    // localCheckpoint truncates the lineage so each hop joins 25²
    // materialized rows instead.
    s.sql(
      s"""SELECT DISTINCT su.s_nationkey AS src, c.c_nationkey AS dst
         |FROM $li l
         |JOIN $o o ON o.o_orderkey = l.l_orderkey
         |JOIN $c c ON c.c_custkey = o.o_custkey
         |JOIN $su su ON su.s_suppkey = l.l_suppkey
         |WHERE su.s_nationkey <> c.c_nationkey""".stripMargin)
      .localCheckpoint()
      .createOrReplaceTempView("graft_sql_recursive_edges")
    s.sql(
      s"""SELECT nk, min(d) AS hops, count(*) AS n_paths
         |FROM (
         |  WITH RECURSIVE reach(nk, d) AS (
         |    SELECT CAST(0 AS BIGINT) AS nk, 0 AS d
         |    UNION ALL
         |    SELECT CAST(e.dst AS BIGINT), r.d + 1
         |    FROM reach r JOIN graft_sql_recursive_edges e ON e.src = r.nk
         |    WHERE r.d < 3
         |  )
         |  SELECT nk, d FROM reach
         |)
         |GROUP BY nk ORDER BY nk""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_recursive" -> qSqlRecursive,
    "q_sql_revenue_filter" -> qSqlRevenueFilter,
    "q_sql_having" -> qSqlHaving,
    "q_sql_exists_subquery" -> qSqlExistsSubquery,
    "q_sql_grouping_sets" -> qSqlGroupingSets,
    "q_null_safe_eq" -> qNullSafeEq,
    "q_sql_correlated_scalar" -> qSqlCorrelatedScalar,
    "q_sql_lateral_topn" -> qSqlLateralTopn,
    "q_csv_roundtrip" -> qCsvRoundtrip,
    "q_json_roundtrip" -> qJsonRoundtrip,
    "q_orc_roundtrip" -> qOrcRoundtrip,
    "q_text_roundtrip" -> qTextRoundtrip,
  )

  val oracles: Map[String, String] = Map(
    "q_sql_recursive" ->
      """WITH edges AS (
        |  SELECT DISTINCT su.s_nationkey AS src, c.c_nationkey AS dst
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN supplier su ON su.s_suppkey = l.l_suppkey
        |  WHERE su.s_nationkey <> c.c_nationkey
        |)
        |SELECT nk, min(d) AS hops, count(*) AS n_paths
        |FROM (
        |  WITH RECURSIVE reach(nk, d) AS (
        |    SELECT CAST(0 AS BIGINT) AS nk, 0 AS d
        |    UNION ALL
        |    SELECT CAST(e.dst AS BIGINT), r.d + 1
        |    FROM reach r JOIN edges e ON e.src = r.nk
        |    WHERE r.d < 3
        |  )
        |  SELECT nk, d FROM reach
        |)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "q_sql_correlated_scalar" ->
      """SELECT c_nationkey, count(*) AS n_above,
        |  round(max(c_acctbal), 2) AS max_bal
        |FROM customer outer_c
        |WHERE CAST(floor(c_acctbal * 100) AS BIGINT) *
        |      (SELECT count(*) FROM customer i1
        |       WHERE i1.c_nationkey = outer_c.c_nationkey)
        |    > (SELECT sum(CAST(floor(c_acctbal * 100) AS BIGINT)) FROM customer i2
        |       WHERE i2.c_nationkey = outer_c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_sql_lateral_topn" ->
      """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS bal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, bal DESC, t.c_custkey""".stripMargin,
    "q_sql_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin,
    "q_sql_having" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |HAVING count(*) > 100
        |ORDER BY c_mktsegment""".stripMargin,
    "q_sql_exists_subquery" ->
      """SELECT s_nationkey, count(*) AS n_supp
        |FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,
    "q_sql_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
        |       coalesce(l_linestatus, '(all)') AS lstatus,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rflag, lstatus""".stripMargin,
    "q_null_safe_eq" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS eq_f,
        |  CAST(sum(CASE WHEN o_orderstatus IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_null,
        |  CAST(sum(CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_f
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders
        |           WHERE o_orderdate < TIMESTAMP '1995-07-01 00:00:00') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
        |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_json_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_text_roundtrip" ->
      """SELECT count(*) AS n_lines,
        |  count(DISTINCT text) AS n_distinct,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(min(length(text)) AS BIGINT) AS min_len,
        |  CAST(max(length(text)) AS BIGINT) AS max_len
        |FROM documents""".stripMargin,
  )
}
