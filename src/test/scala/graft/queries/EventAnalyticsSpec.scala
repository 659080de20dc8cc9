package graft.queries

import graft.lake.LakeSuite

/** Structural invariants of the cohort-retention matrix and the ordered
  * funnel that the DuckDB oracle (which pins the exact cell values)
  * does not state explicitly: monotonicity, anchor-cell identity, and
  * the strictly-ordered-sequence semantics the per-type independent
  * mins would get wrong. */
class EventAnalyticsSpec extends LakeSuite {

  private val d = "/root/testdata/sf0.001"

  test("cohort retention: offset-0 cell IS the cohort size, permille exact") {
    val rows = EventQueries.qEvCohortRetention(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, n, size, pm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 1L && n <= size, s"cell exceeds cohort: $r")
      assert(pm == 1000L * n / size, s"permille drift: $r")
      if (off == 0L) assert(n == size && pm == 1000L,
        s"anchor cell must be the cohort size: $r")
    }
    // a user's first-active day is active by construction, so every
    // cohort present in ANY cell carries its offset-0 anchor
    val cohorts = rows.map(_.getDate(0)).distinct
    val anchors = rows.filter(_.getLong(1) == 0L).map(_.getDate(0))
    assert(cohorts.sorted.sameElements(anchors.sorted))
  }

  test("MAD anomalies: estimator identities and breakdown robustness") {
    import org.apache.spark.sql.functions._
    val rows = EventQueries.qEvAnomalyMad(spark, d).collect()
    assert(rows.length == 5)
    val vals = Tables.events(spark, d)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val (tpe, n, med, mad, out) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val sorted = vals(tpe)
      assert(n == sorted.length)
      // the reported median IS the lower-median element of the raw data
      assert(med == sorted(((n + 1) / 2 - 1).toInt), s"median drift: $r")
      assert(mad >= 0.0)
      // outlier count computed independently from raw data
      val expected = sorted.count(v => math.abs(v - med) > mad * 3)
      assert(out == expected, s"outlier count drift: $r vs $expected")
    }
  }

  test("rolling WAU: window dominance and day-1 identity") {
    import org.apache.spark.sql.functions._
    val rows = EventQueries.qEvRollingWau(spark, d).collect()
    assert(rows.nonEmpty)
    // WAU(day) >= DAU(day), and >= WAU is bounded by total users
    val dau = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val totalUsers = Tables.events(spark, d)
      .select(col("user_id")).distinct().count()
    rows.foreach { r =>
      val (day, wau) = (r.getDate(0).toString, r.getLong(1))
      assert(wau >= dau(day), s"WAU below DAU on $day")
      assert(wau <= totalUsers)
    }
    // the first day's trailing window contains only itself
    val first = rows.minBy(_.getDate(0).toString)
    assert(first.getLong(1) == dau(first.getDate(0).toString),
      "first-day WAU must equal first-day DAU")
  }

  test("funnel: monotone steps, strict ordering semantics, permille exact") {
    val rows = EventQueries.qEvFunnel(spark, d).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val n = rows.map(_.getLong(2))
    assert(n(0) >= n(1) && n(1) >= n(2), "funnel must shrink monotonically")
    assert(n(0) > 0L, "nobody entered the funnel — fixture mismatch")
    rows.foreach(r => assert(r.getLong(3) == 1000L * r.getLong(2) / n(0)))

    // strictly-ordered semantics: step-3 conversions (purchase after the
    // step-2 CLICK) are a subset of the order-insensitive variant
    // (purchase any time after the first view, click ordering ignored) —
    // the two differ exactly on sequences the ordered funnel must reject
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, d)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v"))
    def after(tpe: String) = e.filter(col("event_type") === tpe)
      .join(v, "user_id")
      .filter(col("ts") > col("v") && col("ts") <= col("v") + expr("INTERVAL 7 DAYS"))
      .select(col("user_id")).distinct()
    val unordered3 = after("click").join(after("purchase"), "user_id").count()
    assert(n(2) <= unordered3,
      s"ordered step-3 (${n(2)}) exceeded the unordered bound ($unordered3)")
  }
}
