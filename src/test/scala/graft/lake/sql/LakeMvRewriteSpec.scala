package graft.lake.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._

import graft.lake.{LakeCatalog, LakePredicate, LakeSuite}

/** Transparent MV rewrite ([[LakeMvRewrite]], round-18 verdict ask #3):
  * a GROUP BY over the lake base — never naming the view — re-plans
  * onto a FRESH matching materialized view; a stale view (base commit
  * after the last refresh) falls back to the base scan; subset group
  * keys roll the view up instead of scanning the base; the conf kill
  * switch restores the base plan. Every assertion is double-sided:
  * plan shape (which table the optimized plan scans) AND result
  * equality against the rewrite-disabled run. */
class LakeMvRewriteSpec extends LakeSuite {

  private var n = 0
  private def sqlCat(): (String, String) = {
    n += 1
    val wh = freshWarehouse()
    val cat = s"mvrw$n"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.fact_t (${ordersDF.schema.toDDL})")
    (cat, wh)
  }

  /** Table names the optimized plan scans (post-pushdown relations). */
  private def scanned(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.relation.table.name()
      case r: DataSourceV2Relation => r.table.name()
    }

  private def noRewrite[T](body: => T): T = {
    spark.conf.set(LakeMvRewrite.ConfKey, "false")
    try body finally spark.conf.set(LakeMvRewrite.ConfKey, "true")
  }

  private type Row = org.apache.spark.sql.Row

  test("exact-match GROUP BY rewrites onto the fresh view; stale falls back") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "fact_t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.v_roll AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  min(CAST(floor(o_totalprice * 100) AS LONG)) AS min_cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.fact_t GROUP BY o_orderpriority""".stripMargin)
    def q(): DataFrame = spark.sql(
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  max(CAST(floor(o_totalprice * 100) AS LONG)) AS max_cents
         |FROM $cat.ns.fact_t GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)
    // fresh: the plan reads the VIEW, not the base
    val s1 = scanned(q())
    assert(s1.exists(_.contains("v_roll")) && !s1.exists(_.contains("fact_t")),
      s"fresh query must scan the view, scanned: $s1")
    assert(q().collect().toSeq == noRewrite(q().collect().toSeq),
      "rewritten result diverged from the base plan")
    // STALE: one base commit after the refresh -> base scan, fresh rows
    t.refresh().deleteWhere(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    val s2 = scanned(q())
    assert(s2.exists(_.contains("fact_t")) && !s2.exists(_.contains("v_roll")),
      s"stale view must not be consulted, scanned: $s2")
    assert(q().collect().toSeq == noRewrite(q().collect().toSeq))
    // a refresh restores the fast path
    spark.sql(s"CALL $cat.system.refresh_agg_view('ns.v_roll')").collect()
    val s3 = scanned(q())
    assert(s3.exists(_.contains("v_roll")) && !s3.exists(_.contains("fact_t")),
      s"refreshed view must serve again, scanned: $s3")
    assert(q().collect().toSeq == noRewrite(q().collect().toSeq))
  }

  test("subset group keys ROLL the view up; global rollup included") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "fact_t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.v_two AS
         |SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  min(CAST(floor(o_totalprice * 100) AS LONG)) AS min_cents
         |FROM $cat.ns.fact_t
         |GROUP BY o_orderpriority, o_orderstatus""".stripMargin)
    def qSub(): DataFrame = spark.sql(
      s"""SELECT o_orderstatus, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents,
         |  min(CAST(floor(o_totalprice * 100) AS LONG)) AS min_cents
         |FROM $cat.ns.fact_t GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin)
    def qGlobal(): DataFrame = spark.sql(
      s"SELECT count(*) AS cnt, sum(CAST(floor(o_totalprice * 100) AS LONG)) " +
        s"AS cents FROM $cat.ns.fact_t")
    for ((qf, label) <- Seq(qSub _ -> "subset", qGlobal _ -> "global")) {
      val s = scanned(qf())
      assert(s.exists(_.contains("v_two")) && !s.exists(_.contains("fact_t")),
        s"$label rollup must scan the view, scanned: $s")
      assert(qf().collect().toSeq == noRewrite(qf().collect().toSeq),
        s"$label rollup diverged")
    }
    // avg rollup re-derives from the exact slot/nn pair
    spark.sql(s"DROP TABLE $cat.ns.v_two")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.v_avg AS
         |SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
         |  avg(o_orderkey) AS avg_key
         |FROM $cat.ns.fact_t
         |GROUP BY o_orderpriority, o_orderstatus""".stripMargin)
    def qAvg(): DataFrame = spark.sql(
      s"""SELECT o_orderpriority, count(*) AS cnt, avg(o_orderkey) AS avg_key
         |FROM $cat.ns.fact_t GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)
    val sAvg = scanned(qAvg())
    assert(sAvg.exists(_.contains("v_avg")) && !sAvg.exists(_.contains("fact_t")),
      s"avg rollup must scan the view, scanned: $sAvg")
    val got = qAvg().collect().toSeq
    val want = noRewrite(qAvg().collect().toSeq)
    assert(got.map(_.getString(0)) == want.map(_.getString(0)))
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(1) == w.getLong(1))
      assert(math.abs(g.getDouble(2) - w.getDouble(2)) < 1e-9,
        s"avg rollup diverged: $g vs $w")
    }
  }

  test("WHERE must match the stored predicate; mismatches fall back") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "fact_t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.v_f AS
         |SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.fact_t WHERE o_orderstatus = 'F'
         |GROUP BY o_orderpriority""".stripMargin)
    def q(where: String): DataFrame = spark.sql(
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |  sum(CAST(floor(o_totalprice * 100) AS LONG)) AS cents
         |FROM $cat.ns.fact_t WHERE $where
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    val sm = scanned(q("o_orderstatus = 'F'"))
    assert(sm.exists(_.contains("v_f")) && !sm.exists(_.contains("fact_t")),
      s"matching WHERE must rewrite, scanned: $sm")
    assert(q("o_orderstatus = 'F'").collect().toSeq ==
      noRewrite(q("o_orderstatus = 'F'").collect().toSeq))
    // a DIFFERENT predicate must not be served by the filtered view
    val sx = scanned(q("o_orderstatus = 'O'"))
    assert(sx.exists(_.contains("fact_t")) && !sx.exists(_.contains("v_f")),
      s"mismatched WHERE must scan the base, scanned: $sx")
    // an UNfiltered query must not be served by the filtered view
    val su = scanned(spark.sql(
      s"SELECT o_orderpriority, count(*) AS cnt FROM $cat.ns.fact_t " +
        "GROUP BY o_orderpriority"))
    assert(su.exists(_.contains("fact_t")) && !su.exists(_.contains("v_f")),
      s"unfiltered query must scan the base, scanned: $su")
  }

  test("count(DISTINCT) rewrites exact, refuses rollup; kill switch works") {
    val (cat, wh) = sqlCat()
    val t = LakeCatalog.open(wh).loadTable("ns", "fact_t")
    t.appendData(ordersDF, numFiles = 2)
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $cat.ns.v_dc AS
         |SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
         |  count(DISTINCT o_custkey) AS n_cust
         |FROM $cat.ns.fact_t
         |GROUP BY o_orderpriority, o_orderstatus""".stripMargin)
    def qExact(): DataFrame = spark.sql(
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
         |  count(DISTINCT o_custkey) AS n_cust
         |FROM $cat.ns.fact_t GROUP BY o_orderpriority, o_orderstatus
         |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
    val se = scanned(qExact())
    assert(se.exists(_.contains("v_dc")) && !se.exists(_.contains("fact_t")),
      s"exact distinct must rewrite, scanned: $se")
    assert(qExact().collect().toSeq == noRewrite(qExact().collect().toSeq))
    // rollup over a distinct count is NOT additive -> base scan
    val sr = scanned(spark.sql(
      s"SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust " +
        s"FROM $cat.ns.fact_t GROUP BY o_orderpriority"))
    assert(sr.exists(_.contains("fact_t")) && !sr.exists(_.contains("v_dc")),
      s"distinct rollup must scan the base, scanned: $sr")
    // kill switch
    val sk = noRewrite(scanned(qExact()))
    assert(sk.exists(_.contains("fact_t")) && !sk.exists(_.contains("v_dc")),
      s"disabled rewrite must scan the base, scanned: $sk")
  }
}
