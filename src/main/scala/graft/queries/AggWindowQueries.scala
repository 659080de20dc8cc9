package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation variants (rollup/cube/distinct/approx/collect/percentile),
  * set operations, and window-function coverage (SURVEY.md §2.C).
  *
  * Cross-engine pinning rules used throughout: DuckDB integer `sum`
  * returns HUGEINT and ranking fns return BIGINT, so Spark outputs are
  * cast to long and DuckDB sums to BIGINT; rollup/cube NULL group keys
  * are coalesced to a sentinel so null-vs-null compare never matters.
  */
object AggWindowQueries {
  import Tables._

  def qRollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy(col("rflag"), col("lstatus"))

  def qCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .cube(col("yr"), col("o_orderstatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_total"))
      .select(coalesce(col("yr"), lit(-1L)).as("yr"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("gid"), col("n"), col("sum_total"))
      .orderBy(col("yr"), col("status"))

  def qDistinctAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))

  /** HLL sketch with a tolerance-gated oracle (round-11): the raw
    * estimate differs from DuckDB's HLL so it can't be hashed, but the
    * EXACT distinct counts can, and the |approx−exact|/exact ≤ 5%
    * gates are deterministic booleans both engines agree on as long as
    * the sketch honors its error bound (rsd = 0.01 leaves a 5× margin,
    * so the gate verifies the estimator without pretending it's
    * exact). This is the full-oracle form of the old rows-only entry. */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("ao"),
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("ap"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05)
          .as("orders_within_5pct"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
          .as("parts_within_5pct"))
      .orderBy(col("l_returnflag"))

  /** Approximate quantiles (t-digest-class sketch) gated against the
    * exact answer — the [[qApproxDistinct]] device applied to the
    * other classic streaming sketch: `approx_percentile` (Spark's
    * KLL/GK-family sketch, a one-pass mergeable summary — the only
    * viable quantile at 100 TB) rides next to the EXACT percentile,
    * the hashed projection is the exact value plus a relative-error
    * tolerance boolean, and the sketch's engine-private internals
    * never reach the oracle. */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("ex50"),
        expr("percentile(o_totalprice, 0.95)").as("ex95"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
        expr("approx_percentile(o_totalprice, 0.95, 1000)").as("ap95"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"),
        round(col("ex50"), 4).as("exact_p50"),
        round(col("ex95"), 4).as("exact_p95"),
        col("n"),
        (abs(col("ap50") - col("ex50")) <= abs(col("ex50")) * 0.02)
          .as("p50_within_2pct"),
        (abs(col("ap95") - col("ex95")) <= abs(col("ex95")) * 0.02)
          .as("p95_within_2pct"))
      .orderBy(col("o_orderstatus"))

  /** Exact WEIGHTED median per group — the percentile the built-in
    * `percentile()` cannot express (each row counts l_quantity times):
    * under the total order (price, orderkey, linenumber), the first row
    * whose cumulative integer weight reaches half the group total.
    *
    * Computed by HISTOGRAM SELECTION, not a per-group global sort: a
    * window partitioned by a 3-value key serializes each group's sort
    * into one task (measured 4.5× at 10× data), so instead (1) one
    * map-side-combined (group, bucket) rollup over 1024 range buckets
    * finds the bucket holding the median plus the exact weight mass
    * below it, and (2) only that bucket's rows — 1/1024 of the group —
    * are sorted. Bucketing is a Spark-internal routing detail (floor
    * over doubles, deterministic); the RESULT equals the naive
    * sorted-cumsum definition, which is what the DuckDB oracle states.
    * Weights are integral doubles cast to BIGINT so every cumulative
    * sum is exact. */
  def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    val B = 1024
    // integer-exact metrics (qty sums, price min/max): spread the
    // unsplittable one-task scan so the bucket pass and both windows
    // read a parallel cache instead of one serial partition
    val base = QueryCaches.track(Tables.spread(lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty")))
      .persist())
    val stats = base.groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"), sum(col("qty")).as("tot"))
    val bucketed = base.join(broadcast(stats), "l_returnflag")
      .withColumn("bucket", when(col("mx") === col("mn"), lit(0)).otherwise(
        least(lit(B - 1), floor((col("l_extendedprice") - col("mn"))
          * B / (col("mx") - col("mn"))).cast("int"))))
    val wb = Window.partitionBy(col("l_returnflag")).orderBy(col("bucket"))
    val target = bucketed.groupBy(col("l_returnflag"), col("bucket"), col("tot"))
      .agg(sum(col("qty")).as("bq"))
      .withColumn("cum", sum(col("bq")).over(
        wb.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") * 2 >= col("tot"))
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("bucket").as("tb"),
        (col("cum") - col("bq")).as("below"), col("tot").as("tott"))
    val win = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    bucketed.drop("tot").join(broadcast(target),
        Seq("l_returnflag")).filter(col("bucket") === col("tb"))
      .withColumn("cum", col("below") +
        sum(col("qty")).over(win.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") * 2 >= col("tott"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"),
        col("l_extendedprice").as("weighted_median_price"),
        col("tott").as("total_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** k-anonymity audit (k=5) over the (nation, market-segment)
    * quasi-identifier pair — the privacy-governance pass a dataset
    * release runs before publication: any equivalence class smaller
    * than k re-identifies its members. One map-side-combined rollup
    * over the quasi-identifier key; the report is
    * O(|key combinations|), never O(rows). */
  def qKAnonymity(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        (col("n") < 5).as("reidentification_risk"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  /** collect_set → sorted CSV so the set-valued agg is order-stable. */
  def qCollectSet(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  def qPercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_total"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_total"),
        min(col("o_totalprice")).as("min_total"),
        max(col("o_totalprice")).as("max_total"),
        round(avg(col("o_totalprice")), 4).as("avg_total"),
        round(stddev(col("o_totalprice")), 4).as("sd_total"))
      .orderBy(col("o_orderstatus"))

  private def custsOfYear(s: SparkSession, d: String, y: Int): DataFrame =
    orders(s, d).filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()

  def qUnionDistinct(s: SparkSession, d: String): DataFrame =
    custsOfYear(s, d, 1995).union(custsOfYear(s, d, 1996))
      .distinct().orderBy(col("o_custkey"))

  def qIntersect(s: SparkSession, d: String): DataFrame =
    custsOfYear(s, d, 1995).intersect(custsOfYear(s, d, 1996))
      .orderBy(col("o_custkey"))

  def qExcept(s: SparkSession, d: String): DataFrame =
    custsOfYear(s, d, 1995).except(custsOfYear(s, d, 1996))
      .orderBy(col("o_custkey"))

  /** Frame-based analytics: running sum, 3-row moving avg, lag/lead. */
  def qRunningFrames(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
      sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("running_qty"),
      round(avg(col("l_quantity")).over(w.rowsBetween(-2, 0)), 4).as("mov_avg_qty"),
      lag(col("l_quantity"), 1).over(w).as("prev_qty"),
      lead(col("l_quantity"), 1).over(w).as("next_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
  }

  /** Ranking battery: rank / dense_rank / ntile / percent_rank / cume_dist. */
  def qRankFunctions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(
      col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      ntile(10).over(w).cast("long").as("decile"),
      round(percent_rank().over(w), 6).as("prank"),
      round(cume_dist().over(w), 6).as("cdist"))
      .orderBy(col("o_orderstatus"), col("rnk"))
  }

  /** Relational PIVOT: order counts per year spread across status
    * columns. The value list is explicit (F/O/P), so Catalyst plans a
    * single pass with no value-discovery job. Empty cells are
    * coalesced to 0 to match SQL conditional counts. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("yr"))

  /** UNPIVOT/melt: wide part attributes to (key, attr, val) rows. */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
        "attr", "val")
      .orderBy(col("p_partkey"), col("attr"))

  /** 2-D Pareto frontier / skyline (round 13): the orders no other order
    * beats on BOTH price and recency — maximize (total_cents, order_day).
    *
    * A naive skyline is a global sort-window over the corpus — the
    * serialized-sort class GlobalWindowLintSpec exists to kill. The
    * scale shape here is the local-prune/global-verify split skyline
    * papers use, rebuilt on value-domain histograms:
    *  1. collapse to one row per DISTINCT cents (max day) — map-side
    *     combined, dominance within equal price falls out for free;
    *  2. a (cents div 65536) bucket rollup (≤ price-domain/65536 rows,
    *     ~770 for TPC-H prices — BOUNDED BY THE VALUE DOMAIN, never by
    *     the corpus) takes a suffix-max scan, and a row survives only
    *     if it beats every strictly-higher bucket's best day;
    *  3. the exact window runs over SURVIVORS only.
    * Pruning is lossless in both directions (induction over buckets: a
    * pruned row's dominator chain always ends at an unpruned dominator,
    * and no true frontier point can be pruned), so the oracle can run
    * the textbook single-window form. Survivor count is data-dependent
    * (worst case: every order in the top bucket), so step 3 sits behind
    * `graft.pareto.budget` (default 2²¹) with a loud refusal — the
    * pair-budget house pattern. */
  def qParetoFrontier(s: SparkSession, d: String): DataFrame = {
    val pts = QueryCaches.track(orders(s, d)
      .select(floor(col("o_totalprice") * 100).cast("long").as("cents"),
        datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("cents")).agg(max(col("day")).as("day"))
      .persist())
    val buck = pts.groupBy(expr("cents div 65536").as("b"))
      .agg(max(col("day")).as("bmax"))
    // suffix max over STRICTLY higher buckets; unpartitioned window over
    // the value-domain-bounded rollup (GlobalWindowLintSpec allowlisted)
    val wSuf = Window.orderBy(col("b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val suf = buck.withColumn("hi_max", max(col("bmax")).over(wSuf))
      .select(col("b"), col("hi_max"))
    val surv = QueryCaches.track(pts
      .join(broadcast(suf), expr("cents div 65536") === col("b"))
      .filter(col("hi_max").isNull || col("day") > col("hi_max"))
      .select(col("cents"), col("day"))
      .persist())
    val budget = s.conf.get("graft.pareto.budget", (1L << 21).toString).toLong
    if (budget > 0) {
      val n = surv.count()
      if (n > budget) throw new IllegalStateException(
        s"q_pareto_frontier: $n candidate rows survive histogram pruning " +
          s"(budget $budget) — the frontier verify window would serialize " +
          "them through one task. Raise graft.pareto.budget or narrow the " +
          "input.")
    }
    val wHi = Window.orderBy(col("cents"))
      .rangeBetween(1, Window.unboundedFollowing)
    surv.withColumn("mx_hi", max(col("day")).over(wHi))
      .filter(col("mx_hi").isNull || col("day") > col("mx_hi"))
      .select(col("cents").as("price_cents"), col("day").as("order_day"))
      .orderBy(col("price_cents").desc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pareto_frontier" -> qParetoFrontier,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_distinct_agg" -> qDistinctAgg,
    "q_approx_distinct" -> qApproxDistinct,
    "q_approx_quantile" -> qApproxQuantile,
    "q_collect_set" -> qCollectSet,
    "q_percentiles" -> qPercentiles,
    "q_weighted_median" -> qWeightedMedian,
    "q_k_anonymity" -> qKAnonymity,
    "q_union_distinct" -> qUnionDistinct,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept,
    "q_running_frames" -> qRunningFrames,
    "q_rank_functions" -> qRankFunctions,
  )

  val oracles: Map[String, String] = Map(
    // textbook single-window skyline — pruning is proven lossless, so
    // the oracle skips it
    "q_pareto_frontier" ->
      """WITH pts AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE))) AS day
        |  FROM orders GROUP BY 1
        |), sky AS (
        |  SELECT cents, day, max(day) OVER (ORDER BY cents
        |    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mx_hi
        |  FROM pts
        |)
        |SELECT cents AS price_cents, CAST(day AS BIGINT) AS order_day
        |FROM sky WHERE mx_hi IS NULL OR day > mx_hi
        |ORDER BY price_cents DESC""".stripMargin,
    "q_weighted_median" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(CAST(l_quantity AS BIGINT)) OVER (
        |      PARTITION BY l_returnflag) AS tot
        |  FROM lineitem
        |), sel AS (
        |  SELECT l_returnflag, l_extendedprice, tot,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
        |  FROM c WHERE cum * 2 >= tot)
        |SELECT l_returnflag, l_extendedprice AS weighted_median_price,
        |  CAST(tot AS BIGINT) AS total_qty
        |FROM sel WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(*) < 5 AS reidentification_risk
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS orders_within_5pct,
        |  TRUE AS parts_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT year(o_orderdate) AS yr,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, attr""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rflag,
        |  coalesce(l_linestatus, '(all)') AS lstatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(yr, -1) AS yr, coalesce(o_orderstatus, '(all)') AS status,
        |  GROUPING(yr, o_orderstatus) AS gid, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_total
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus, o_totalprice FROM orders)
        |GROUP BY CUBE(yr, o_orderstatus)
        |ORDER BY yr, status""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_collect_set" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // same tolerance-gate convention as q_approx_distinct: the exact
    // columns hash, the booleans assert the sketch landed inside the
    // bound (Spark's percentile interpolates like quantile_cont)
    "q_approx_quantile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(o_totalprice, 0.95), 4) AS exact_p95,
        |  count(*) AS n,
        |  TRUE AS p50_within_2pct,
        |  TRUE AS p95_within_2pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS median_total,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90_total,
        |  min(o_totalprice) AS min_total,
        |  max(o_totalprice) AS max_total,
        |  round(avg(o_totalprice), 4) AS avg_total,
        |  round(stddev(o_totalprice), 4) AS sd_total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |UNION
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "q_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "q_running_frames" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
        |  round(avg(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg_qty,
        |  lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS prev_qty,
        |  lead(l_quantity, 1) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS next_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_rank_functions" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(10) OVER w AS decile,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, rnk""".stripMargin,
  )
}
