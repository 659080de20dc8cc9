package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, LakeTable}

/** ANALYZE → DSv2 column statistics → CBO: NDV/null/length stats from
  * one aggregation pass land in table properties; the scan builder
  * serves them through `Statistics.columnStats()` with manifest-fresh
  * bounds, and Spark's cost-based optimizer sees per-attribute stats. */
class ColStatsSpec extends LakeSuite {

  test("analyze_table stores stats; relation reports attribute stats under CBO") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.cst", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.cst.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE cst.ns")
      spark.sql(s"CREATE TABLE cst.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      t.appendData(ordersDF)

      val row = spark.sql(
        "CALL cst.system.analyze_table('ns.t', 'o_orderkey,o_orderstatus')").head
      assert(row.getInt(1) === 2)
      val json = t.refresh().metadata.properties(LakeTable.ColStatsProperty)
      val parsed = LakeTable.parseColStats(json)
      val nKeys = ordersDF.select("o_orderkey").distinct().count()
      // HLL approximate: within 10% of exact
      assert(math.abs(parsed("o_orderkey")._1 - nKeys) <= nKeys / 10)
      assert(parsed("o_orderstatus")._1 <= 5L) // 3 distinct statuses
      assert(parsed("o_orderkey")._2 === 0L) // no nulls
      assert(parsed("o_orderstatus")._3.exists(_ >= 1L)) // string avgLen

      // the optimized relation carries per-attribute stats under CBO
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val plan = spark.table("cst.ns.t").queryExecution.optimizedPlan
        val stats = plan.stats
        assert(stats.rowCount.exists(_.toLong === ordersDF.count()))
        val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
        assert(byName.contains("o_orderkey"), s"attributeStats: ${byName.keys}")
        val ks = byName("o_orderkey")
        assert(ks.distinctCount.exists(d =>
          math.abs(d.toLong - nKeys) <= nKeys / 10))
        assert(ks.nullCount.exists(_.toLong === 0L))
        // bounds are manifest-fresh, not stored: exact min/max
        assert(ks.min.contains(0L) && ks.max.contains(1499L))
      } finally spark.conf.unset("spark.sql.cbo.enabled")

      // analyze with no column list covers the whole schema
      spark.sql("CALL cst.system.analyze_table('ns.t', '')")
      val all = LakeTable.parseColStats(
        t.refresh().metadata.properties(LakeTable.ColStatsProperty))
      assert(all.keySet === ordersDF.schema.fieldNames.toSet)
    } finally {
      spark.conf.unset("spark.sql.catalog.cst")
      spark.conf.unset("spark.sql.catalog.cst.warehouse")
    }
  }
}
