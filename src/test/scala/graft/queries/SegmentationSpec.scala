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
