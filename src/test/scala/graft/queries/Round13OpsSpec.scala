package graft.queries

import graft.lake.LakeSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the round-13 second-wave operators that the
  * DuckDB oracle (which pins exact values) does not state: estimator
  * identities recomputed independently from raw data, dominance
  * correctness for the skyline, and the pareto budget gate's refusal
  * contract. */
class Round13OpsSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("autocorr: Cauchy-Schwarz bound and independent lag-1 recompute") {
    val rows = EventQueries.qEvAutocorr(spark, d).collect()
    QueryCaches.clear()
    assert(rows.nonEmpty)
    // |Σ dv_i·dv_{i+k}| ≤ Σ dv_i² ⟹ |acf| ≤ 1000 exactly
    rows.foreach(r => assert(math.abs(r.getLong(2)) <= 1000L, s"CS bound: $r"))
    // every type × lag 1..7 present (30-day series, den > 0 everywhere)
    assert(rows.length == 5 * 7)

    // independent lag-1 recompute for one type from the raw daily counts
    val daily = Tables.events(spark, d)
      .filter(col("event_type") === "view")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length.toLong
    val s0 = daily.sum
    val dv = daily.map(y => n * y - s0)
    val den = dv.map(v => BigInt(v) * BigInt(v)).sum
    val num = dv.dropRight(1).zip(dv.drop(1))
      .map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val expected = ((BigInt(1000) * num) / den).toLong // BigInt / truncates like div
    val got = rows.find(r => r.getString(0) == "view" && r.getLong(1) == 1L).get.getLong(2)
    assert(got == expected, s"lag-1 view acf: got $got expected $expected")
  }

  test("changepoint: |cusum| identity and independent max recompute") {
    val rows = EventQueries.qEvChangepoint(spark, d).collect()
    QueryCaches.clear()
    assert(rows.length == 5)
    rows.foreach(r =>
      assert(math.abs(r.getLong(2)) == r.getLong(3), s"abs identity: $r"))
    // independent recompute for one type: cusum trajectory ends at 0 and
    // the reported peak matches
    val daily = Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length.toLong
    val s0 = daily.sum
    val traj = daily.scanLeft(0L)((acc, y) => acc + (n * y - s0)).drop(1)
    assert(traj.last == 0L, "n-scaled cusum must return to zero")
    val got = rows.find(_.getString(0) == "purchase").get.getLong(3)
    assert(got == traj.map(math.abs).max, s"peak |cusum| drift for purchase")
  }

  test("seq patterns: support identity recomputed from raw event times") {
    val rows = EventQueries.qEvSeqPatterns(spark, d).collect()
    QueryCaches.clear()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val nUsers = byUser.size.toLong
    rows.foreach { r =>
      val (ta, tb, cnt, pm) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      val expected = byUser.values.count { es =>
        val as = es.filter(_._2 == ta).map(_._3)
        val bs = es.filter(_._2 == tb).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      }.toLong
      assert(cnt == expected, s"support drift for ($ta,$tb)")
      assert(pm == 1000L * cnt / nUsers)
    }
  }

  test("paths: 3-token shape and session-count bound") {
    val rows = EventQueries.qEvPaths(spark, d).collect()
    QueryCaches.clear()
    assert(rows.nonEmpty)
    val types = Set("signup", "click", "error", "view", "purchase")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length == 3 && parts.forall(types.contains), s"path shape: $r")
      assert(r.getLong(1) >= 1L)
    }
    // Σ counted paths ≤ total session count (≥3-event sessions only)
    val totalSessions = EventQueries.qEvSessionize(spark, d)
      .agg(sum(col("n_sessions"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum <= totalSessions)
    // top-10 ordering is (n desc, path asc)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (c, p) => (-c, p) }))
  }

  test("pareto frontier: brute-force dominance check and budget gate") {
    val out = AggWindowQueries.qParetoFrontier(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    QueryCaches.clear()
    assert(out.nonEmpty)
    val pts = Tables.orders(spark, d)
      .select(floor(col("o_totalprice") * 100).cast("long").as("c"),
        datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("dd"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)
    val brute = pts.filter(p => !pts.exists(q => dominates(q, p)))
      .distinct.sortBy(p => -p._1)
    assert(out.toSeq == brute.toSeq, "skyline differs from brute force")

    // a 1-row budget refuses loudly; budget 0 disables the gate
    spark.conf.set("graft.pareto.budget", "1")
    try {
      val e = intercept[IllegalStateException] {
        AggWindowQueries.qParetoFrontier(spark, d).collect()
      }
      assert(e.getMessage.contains("graft.pareto.budget"))
    } finally {
      spark.conf.unset("graft.pareto.budget")
      QueryCaches.clear()
    }
    spark.conf.set("graft.pareto.budget", "0")
    try {
      val ungated = AggWindowQueries.qParetoFrontier(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(ungated.toSeq == out.toSeq)
    } finally {
      spark.conf.unset("graft.pareto.budget")
      QueryCaches.clear()
    }
  }

  test("cuped: theta recomputed from raw per-user sums in BigInt") {
    val rows = EventQueries.qEvCuped(spark, d).collect()
    QueryCaches.clear()
    assert(rows.length == 2)
    val minDay = Tables.events(spark, d)
      .agg(min(to_date(col("ts")))).head().getDate(0).toLocalDate
    val per = Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().groupBy(_.getLong(0)).map { case (u, rs) =>
        val x = rs.filter(r => r.getString(2) == "purchase" &&
          java.time.temporal.ChronoUnit.DAYS.between(
            minDay, r.getDate(1).toLocalDate) < 15).map(_.getLong(3)).sum
        val y = rs.filter(r => r.getString(2) == "purchase" &&
          java.time.temporal.ChronoUnit.DAYS.between(
            minDay, r.getDate(1).toLocalDate) >= 15).map(_.getLong(3)).sum
        (u, x, y)
      }.toSeq
    val n = BigInt(per.size)
    val sx = per.map(p => BigInt(p._2)).sum
    val sy = per.map(p => BigInt(p._3)).sum
    val sxx = per.map(p => BigInt(p._2) * p._2).sum
    val sxy = per.map(p => BigInt(p._2) * p._3).sum
    val theta = (BigInt(1000) * (n * sxy - sx * sy)) / (n * sxx - sx * sx)
    rows.foreach(r => assert(r.getLong(4) == theta.toLong, s"theta drift: $r"))
    // adjusted-mean closed form per variant
    rows.foreach { r =>
      val vu = per.filter(p => p._1 % 2 == r.getLong(0))
      val nv = BigInt(vu.size)
      val sxv = vu.map(p => BigInt(p._2)).sum
      val syv = vu.map(p => BigInt(p._3)).sum
      val adj = (BigInt(1000) * n * syv - theta * (n * sxv - nv * sx)) / (n * nv)
      assert(r.getLong(5) == adj.toLong, s"mean_adj drift: $r")
    }
  }

  test("seasonality: per-type indices recomputed and mass-balanced") {
    val rows = EventQueries.qEvSeasonality(spark, d).collect()
    QueryCaches.clear()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val mine = daily.filter(_._1 == tpe)
      val nd = mine.length.toLong
      val sy = mine.map(_._3).sum
      rs.foreach { r =>
        val dow = r.getLong(1)
        val sub = mine.filter(_._2.getDayOfWeek.getValue - 1 == dow)
        assert(r.getLong(2) == sub.length.toLong, s"n_days drift: $r")
        val idx = (1000L * nd * sub.map(_._3).sum) / (sub.length * sy)
        assert(r.getLong(3) == idx, s"idx drift: $r")
      }
      // mass balance: day-count-weighted mean of the exact ratio is 1 —
      // the truncated permilles must straddle 1000
      assert(rs.map(_.getLong(3)).min <= 1000L && rs.map(_.getLong(3)).max >= 999L)
    }
  }

  test("survival: monotone nonincreasing, risk-set accounting exact") {
    val rows = EventQueries.qEvSurvival(spark, d).collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getLong(3))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a }, "S(t) must not rise")
    assert(s.head <= 1000000L && s.forall(_ >= 0L))
    // at-risk counts strictly decrease along reported ts and every
    // reported conversion count fits inside its risk set
    val n = rows.map(_.getLong(1))
    assert(n.zip(n.tail).forall { case (a, b) => b < a })
    rows.foreach(r => assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(1)))
  }

  test("large orders: threshold and basket identity") {
    val rows = CoreQueries.qLargeOrders(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(5) > 300L, s"threshold: $r"))
    // recompute one basket independently
    val key = rows.head.getLong(2)
    val qty = Tables.lineitem(spark, d).filter(col("l_orderkey") === key)
      .agg(sum(col("l_quantity").cast("long"))).head().getLong(0)
    assert(qty == rows.head.getLong(5))
  }
}
