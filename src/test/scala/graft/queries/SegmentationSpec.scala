package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.functions._

/** Structural invariants for the market-basket, Markov, and RFM
  * operators. */
class SegmentationSpec extends LakeSuite
    with org.scalatest.BeforeAndAfterEach {

  private val d = "/root/testdata/sf0.001"

  override def afterEach(): Unit = {
    QueryCaches.clear() // qMarketBasket registers a persisted DataFrame
    super.afterEach()
  }

  test("market basket: support floor, symmetric bounds, lift formula") {
    val rows = JoinExtraQueries.qMarketBasket(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val n = Tables.lineitem(spark, d)
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { r =>
      val (pa, pb, nab, na, nb, lift) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pa < pb, "pairs must be canonical (pa < pb)")
      assert(nab >= 2L && nab <= math.min(na, nb),
        s"co-count outside its bounds: $r")
      assert(lift == 10000L * n * nab / (na * nb), s"lift drift: $r")
    }
    val lifts = rows.map(_.getLong(5)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("market basket: capK keeps each basket's K smallest parts (tiny-cap path)") {
    spark.conf.set("graft.marketBasket.capK", "2")
    try {
      val got = JoinExtraQueries.qMarketBasket(spark, d)
      // independent formulation of the same cap: per order, the sorted
      // distinct part list sliced to 2 (collect_list+slice, not a
      // window), then the identical pair/lift pipeline
      val capped = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .groupBy(col("l_orderkey"))
        .agg(slice(sort_array(collect_list(col("l_partkey"))), 1, 2).as("ps"))
        .select(col("l_orderkey"), explode(col("ps")).as("l_partkey"))
      capped.createOrReplaceTempView("mb_capped")
      val want = spark.sql(
        """WITH n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM mb_capped),
          |pc AS (SELECT l_partkey, count(*) AS n_p FROM mb_capped GROUP BY 1),
          |pr AS (
          |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
          |  FROM mb_capped a JOIN mb_capped b USING (l_orderkey)
          |  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING count(*) >= 2)
          |SELECT pa, pb, n_ab, ca.n_p AS n_a, cb.n_p AS n_b,
          |  (10000 * n.n_orders * n_ab) div (ca.n_p * cb.n_p) AS lift_permyriad
          |FROM pr JOIN pc ca ON ca.l_partkey = pa
          |        JOIN pc cb ON cb.l_partkey = pb CROSS JOIN n
          |ORDER BY lift_permyriad DESC, pa, pb LIMIT 25""".stripMargin)
      val diff = got.except(want).union(want.except(got)).collect()
      assert(diff.isEmpty, s"capped run diverges: ${diff.take(5).mkString(", ")}")
      // and the cap actually binds: no basket contributes more than 1
      // pair, so every pair count is bounded by the order count
      assert(got.collect().forall(_.getLong(2) >= 2L))
    } finally spark.conf.unset("graft.marketBasket.capK")
  }

  test("markov: complete rows sum to 1000-ish permille, counts conserved") {
    val rows = EventQueries.qEvMarkov(spark, d).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (f, rs) =>
      val tot = rs.map(_.getLong(2)).sum
      rs.foreach(r => assert(r.getLong(3) == 1000L * r.getLong(2) / tot,
        s"permille drift in row $r"))
      // floor rounding loses < 1 per cell
      val pm = rs.map(_.getLong(3)).sum
      assert(pm > 1000L - rs.length && pm <= 1000L, s"row $f sums to $pm")
    }
    // transition count total = events minus one per user (the last event
    // of each user has no successor)
    val nEvents = Tables.events(spark, d).count()
    val nUsers = Tables.events(spark, d).select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
  }

  test("rfm: quintiles balanced, recency/monetary consistent with raw data") {
    val rows = EventQueries.qEvRfm(spark, d).collect()
    assert(rows.nonEmpty)
    Seq(4, 5, 6).foreach { i =>
      val bands = rows.map(_.getLong(i))
      assert(bands.forall(b => b >= 1L && b <= 5L))
      // ntile balance: band sizes differ by at most 1
      val sizes = bands.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"unbalanced quintiles at col $i")
    }
    rows.foreach { r =>
      assert(r.getString(7) ==
        s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}")
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 1L)
    }
    // better recency (smaller days) never gets a worse band than an
    // equal-recency peer — monotone banding under the total order
    val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    val rbands = sorted.map(_.getLong(4))
    assert(rbands.toSeq == rbands.sorted.toSeq, "recency banding not monotone")
  }
}
