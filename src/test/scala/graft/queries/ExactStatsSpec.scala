package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.functions._

/** Structural invariants for the decayed-engagement, Gini, and
  * weighted-median operators. */
class ExactStatsSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("decayed engagement: bounded by undecayed mass, decay engages") {
    val rows = EventQueries.qEvDecayedEngagement(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val scores = rows.map(_.getLong(2))
    assert(scores.toSeq == scores.sorted.reverse.toSeq)
    // per user: decayed score ≤ raw cents sum, and strictly less for
    // anyone with an event older than a week (decay actually applied)
    val raw = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("raw_cents"),
        max(to_date(col("ts"))).as("last")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) <= raw(r.getLong(0)), s"decayed > raw: $r")
    }
    assert(rows.exists(r => r.getLong(2) < raw(r.getLong(0))),
      "no event aged past a week — decay untested by fixture")
  }

  test("gini: permyriad in range, agrees with direct computation") {
    val row = TextQueries.qSourceBalanceGini(spark, d).collect().head
    val (n, tot, g) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n == 20 && tot > 0L)
    assert(g >= 0L && g < 10000L)
    val toks = Tables.documents(spark, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("k"))
      .groupBy(col("source")).agg(sum(col("k")).as("t")).collect().map(_.getLong(1))
    val diff = (for (a <- toks; b <- toks) yield math.abs(a - b)).sum
    assert(g == 10000L * diff / (2L * n * toks.sum))
  }

  test("weighted median: the balance-point property holds per group") {
    val rows = AggWindowQueries.qWeightedMedian(spark, d).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("q")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val (flag, m, tot) = (r.getString(0), r.getDouble(1), r.getLong(2))
      val grp = li(flag)
      assert(tot == grp.map(_.getLong(2)).sum)
      // mass strictly below the median < half ≤ mass at-or-below it —
      // the defining property, checked against raw data (value-level:
      // row-level tie-breaks cannot shift value mass)
      val below = grp.filter(_.getDouble(1) < m).map(_.getLong(2)).sum
      val atOrBelow = grp.filter(_.getDouble(1) <= m).map(_.getLong(2)).sum
      assert(below * 2 < tot && atOrBelow * 2 >= tot,
        s"median $m is not the weighted balance point for $flag")
    }
  }
}
