package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Remaining join shapes + the UDF/UDAF surface (SURVEY.md §2.C).
  *
  * The range join keeps an equi component (customer key) so Catalyst
  * plans a sort-merge join with the range as a post-condition — the
  * shape that survives 100 TB. The pure theta join is deliberately on
  * two tiny dims: broadcast-nested-loop is only ever acceptable when one
  * side is broadcastable.
  */
object JoinExtraQueries {
  import Tables._

  /** Range join: per order, how many other orders the same customer
    * placed in the preceding 30 days. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val o1 = orders(s, d)
    val o2 = orders(s, d).select(col("o_orderkey").as("k2"),
      col("o_custkey").as("c2"), col("o_orderdate").as("d2"))
    o1.join(o2,
      col("c2") === col("o_custkey") &&
        col("d2") >= col("o_orderdate") - expr("INTERVAL 30 DAYS") &&
        col("d2") < col("o_orderdate"), "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(count(col("k2")).as("n_prior"))
      .orderBy(col("o_orderkey"))
  }

  /** Pure theta join (no equi key) on two broadcastable dims. */
  def qThetaJoin(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(broadcast(region(s, d)), col("r_regionkey") < col("n_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_smaller_regions"))
      .orderBy(col("n_name"))

  /** Bucketed-table names per corpus dir, built at most once: the table
    * writes are SETUP (at scale, tables are bucketed at ingest), so they
    * must not be charged to — or race inside — every join invocation.
    * Unique suffixes keep concurrent sessions off each other's catalog
    * entries; computeIfAbsent makes create-once atomic per JVM. */
  private val bucketedTables = new SessionMemo[(String, String)]()

  /** Public setup hook for [[Corpus.prepare]]. */
  def prepareBucketed(s: SparkSession, d: String): Unit = { ensureBucketed(s, d); () }

  private[queries] val bucketedBuilds = new java.util.concurrent.atomic.AtomicInteger

  /** Session-memoized + cross-session persisted (round-17, the IVF
    * reattach contract): a fresh driver re-REGISTERS external bucketed
    * tables over the already-written bucket files (bucket ids ride the
    * file-name suffix, so an external `CLUSTERED BY` table reads them
    * natively) instead of rewriting both fact copies. */
  private def ensureBucketed(s: SparkSession, d: String): (String, String) =
    bucketedTables.getOrBuild(s, d) {
      val (kind, tables) = ("bucketed-v1", Seq("orders", "lineitem"))
      val id = java.lang.Long.toHexString(System.nanoTime())
      val (to, tl) = (s"graft_bkt_orders_$id", s"graft_bkt_lineitem_$id")
      IndexStore.resolve(s, d, "bucketed", tables, kind) match {
        case Some((dataDir, meta)) =>
          s.sql(s"CREATE TABLE $to (${meta("orders_ddl")}) USING parquet " +
            "CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey) INTO 8 " +
            s"BUCKETS LOCATION '${dataDir.resolve("orders")}'")
          s.sql(s"CREATE TABLE $tl (${meta("lineitem_ddl")}) USING parquet " +
            "CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) INTO 8 " +
            s"BUCKETS LOCATION '${dataDir.resolve("lineitem")}'")
          (to, tl)
        case None =>
          bucketedBuilds.incrementAndGet()
          val dataDir = IndexStore.newDataDir(s, d, "bucketed")
          orders(s, d).write.format("parquet")
            .option("path", dataDir.resolve("orders").toString)
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable(to)
          lineitem(s, d).write.format("parquet")
            .option("path", dataDir.resolve("lineitem").toString)
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable(tl)
          IndexStore.publish(s, d, "bucketed", tables, kind, dataDir,
            Map("orders_ddl" -> orders(s, d).schema.toDDL,
              "lineitem_ddl" -> lineitem(s, d).schema.toDDL))
          (to, tl)
      }
    }

  /** Bucketed co-located join: both fact tables bucketed+sorted on the
    * join key into the same bucket count, so the join needs NO shuffle
    * of either side (BucketedJoinSpec asserts the plan is
    * exchange-free). At 100 TB this is the difference between a join
    * that moves both tables and one that moves nothing. */
  def qBucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (bktOrders, bktLineitem) = ensureBucketed(s, d)
    s.table(bktOrders)
      .join(s.table(bktLineitem), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Scalar Scala UDF (the API surface demo — built-ins are preferred
    * in every hot path, see SURVEY.md §7.3). */
  def qUdfScalar(s: SparkSession, d: String): DataFrame = {
    val vowels = udf((str: String) => str.count(c => "aeiou".contains(c)))
    part(s, d).select(
      col("p_partkey"),
      vowels(col("p_name")).cast("long").as("n_vowels"),
      (length(col("p_name")) - vowels(col("p_name"))).cast("long").as("n_other"))
      .orderBy(col("p_partkey"))
  }

  /** Typed Aggregator UDAF: geometric mean via (Σ ln, n) buffer. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  def qUdafGeomean(s: SparkSession, d: String): DataFrame = {
    val geomean = udaf(GeoMean)
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(round(geomean(col("o_totalprice")), 4).as("geomean_total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** Market-basket affinity — association-rule mining's core statistic:
    * for part pairs co-occurring in ≥ 2 orders (the threshold a random-basket corpus supports at every SF), exact integer lift in
    * permyriad, `(10000·N·n_ab) div (n_a·n_b)` (> 10000 ⇔ the pair
    * attracts). Baskets assemble in ONE order-keyed shuffle as sorted
    * distinct-part arrays; pairs then generate basket-locally from the
    * array (bounded by basket size — TPC-H orders hold ≤ 7 parts), so
    * the pair stream is O(orders·k²) with no self-join. For unbounded
    * baskets the standard per-basket cap applies BEFORE pair
    * generation: `graft.marketBasket.capK` (default 64, far above
    * TPC-H's max 7 so the oracle is unaffected) keeps each basket's K
    * smallest part keys — a deterministic cut, so capped runs are
    * reproducible — making the pair stream O(orders·K²) at ANY basket
    * distribution. The cap mirrors the modal dedups' pair-budget
    * gates: a bounded-resource conf with a spec driving the tiny-cap
    * path (MarketBasketCapSpec).
    * Every term is a BIGINT count, so both engines agree bit-for-bit. */
  def qMarketBasket(s: SparkSession, d: String): DataFrame = {
    val capK = s.conf.getOption("graft.marketBasket.capK")
      .map(_.toInt).getOrElse(64)
    // round-16 scale rewrite: ONE order-keyed shuffle builds each
    // basket as a sorted distinct-part array capped at the K smallest
    // keys (the same deterministic cut the old row_number window made,
    // minus the window's global sort and the distinct's extra
    // shuffle), and the O(orders·K²) pair stream generates
    // BASKET-LOCALLY from the array — the self-join (1.2 GB reshuffle
    // of the item table at sf10, the probe's dominant stage) is gone.
    val baskets = QueryCaches.track(Tables.spread(
      lineitem(s, d).select(col("l_orderkey"), col("l_partkey")))
      .groupBy(col("l_orderkey"))
      .agg(slice(sort_array(collect_set(col("l_partkey"))), 1, capK)
        .as("parts"))
      .persist())
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val partCounts = baskets.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_p"))
    // ascending distinct arrays make pa < pb by construction. The pair
    // stream is the query's dominant shuffle (O(orders·K²) rows, mostly
    // unique so partial aggregation cannot shrink it) — when every part
    // key fits 31 bits (checked from the cached baskets' sorted arrays:
    // one tiny agg), the pair rides as ONE packed long `pa·2³² + pb`
    // instead of a two-long struct, roughly a third off the shuffled
    // bytes and a single-word group key for the hash aggregate. Keys
    // past the bound (or negative) keep the two-column spelling —
    // identical output either way, so the oracle cannot tell.
    val bounds = baskets.filter(size(col("parts")) > 0).agg(
      min(element_at(col("parts"), 1)).as("lo"),
      max(element_at(col("parts"), size(col("parts")))).as("hi")).head
    val packable = !bounds.isNullAt(0) && bounds.getLong(0) >= 0L &&
      bounds.getLong(1) < (1L << 31)
    val pairExpr =
      if (packable) "pb -> pa * 4294967296L + pb" else "pb -> struct(pa, pb)"
    val exploded = baskets.select(explode(expr(
      "flatten(transform(parts, (pa, i) -> " +
        s"transform(slice(parts, i + 2, size(parts)), $pairExpr)))"))
      .as("pr"))
    val pairs =
      (if (packable)
        exploded.groupBy(col("pr")).agg(count(lit(1)).as("n_ab"))
          .select(expr("pr div 4294967296").as("pa"),
            expr("pr % 4294967296").as("pb"), col("n_ab"))
      else
        exploded.select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
          .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab")))
      .filter(col("n_ab") >= 2)
    pairs
      .join(partCounts.select(col("l_partkey").as("pa"), col("n_p").as("n_a")), "pa")
      .join(partCounts.select(col("l_partkey").as("pb"), col("n_p").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(10000 * n_orders * n_ab) div (n_a * n_b)").as("lift_permyriad"))
      .orderBy(col("lift_permyriad").desc, col("pa"), col("pb"))
      .limit(25)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> qRangeJoin,
    "q_theta_join" -> qThetaJoin,
    "q_bucketed_join" -> qBucketedJoin,
    "q_udf_scalar" -> qUdfScalar,
    "q_udaf_geomean" -> qUdafGeomean,
    "q_market_basket" -> qMarketBasket,
  )

  val oracles: Map[String, String] = Map(
    "q_range_join" ->
      """SELECT o1.o_orderkey, count(o2.o_orderkey) AS n_prior
        |FROM orders o1
        |LEFT JOIN orders o2
        |  ON o2.o_custkey = o1.o_custkey
        | AND o2.o_orderdate >= o1.o_orderdate - INTERVAL 30 DAY
        | AND o2.o_orderdate < o1.o_orderdate
        |GROUP BY o1.o_orderkey
        |ORDER BY o1.o_orderkey""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_theta_join" ->
      """SELECT n_name, count(*) AS n_smaller_regions
        |FROM nation JOIN region ON r_regionkey < n_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_udf_scalar" ->
      """SELECT p_partkey,
        |  length(regexp_replace(p_name, '[^aeiou]', '', 'g')) AS n_vowels,
        |  length(p_name) - length(regexp_replace(p_name, '[^aeiou]', '', 'g')) AS n_other
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), norders AS (
        |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
        |), pc AS (
        |  SELECT l_partkey, count(*) AS n_p FROM items GROUP BY l_partkey
        |), prs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pa, pb, n_ab, ca.n_p AS n_a, cb.n_p AS n_b,
        |  CAST((10000 * n.n_orders * n_ab) // (ca.n_p * cb.n_p) AS BIGINT)
        |    AS lift_permyriad
        |FROM prs JOIN pc ca ON ca.l_partkey = pa
        |JOIN pc cb ON cb.l_partkey = pb, norders n
        |ORDER BY lift_permyriad DESC, pa, pb LIMIT 25""".stripMargin,
    "q_udaf_geomean" ->
      """SELECT o_orderstatus,
        |  round(exp(avg(ln(o_totalprice))), 4) AS geomean_total,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
