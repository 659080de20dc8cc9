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
