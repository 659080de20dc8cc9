package graft.lake.sql

import org.apache.spark.sql.functions._
import graft.lake.{LakeCatalog, LakeSuite, LakeTable}

/** ANALYZE → DSv2 column statistics → CBO: NDV/null/length stats from
  * one aggregation pass land in a per-snapshot stats file (the Puffin
  * analog, round-11); the scan builder serves them through
  * `Statistics.columnStats()` with manifest-fresh bounds, and Spark's
  * cost-based optimizer sees per-attribute stats. Old snapshots keep
  * their own stats for time travel, and repeated ANALYZE adds one
  * small ref per run instead of re-inflating the metadata document. */
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
      val json = t.refresh().colStatsJson.get
      val parsed = LakeTable.parseColStats(json)
      val nKeys = ordersDF.select("o_orderkey").distinct().count()
      // HLL approximate: within 10% of exact
      assert(math.abs(parsed("o_orderkey")._1 - nKeys) <= nKeys / 10)
      assert(parsed("o_orderstatus")._1 <= 5L) // 3 distinct statuses
      assert(parsed("o_orderkey")._2 === 0L) // no nulls
      assert(parsed("o_orderstatus")._3.exists(_ >= 1L)) // string avgLen
      // file form: a stats doc referenced from metadata, not a property
      assert(t.metadata.statsFiles.nonEmpty)
      assert(!t.metadata.properties.contains(LakeTable.ColStatsProperty))

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

      // analyze with no column list covers the whole schema — and the
      // procedure reports the ACTUAL analyzed count, not schema width
      val allRow = spark.sql("CALL cst.system.analyze_table('ns.t', '')").head
      val all = LakeTable.parseColStats(t.refresh().colStatsJson.get)
      assert(all.keySet === ordersDF.schema.fieldNames.toSet)
      assert(allRow.getInt(1) === all.size)
    } finally {
      spark.conf.unset("spark.sql.catalog.cst")
      spark.conf.unset("spark.sql.catalog.cst.warehouse")
    }
  }

  test("per-snapshot stats files: metadata stays flat, time travel keeps its own stats") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns2", "t2", ordersDF.schema)
    t.appendData(ordersDF.filter(col("o_orderkey") < 500), numFiles = 2)
    t.refresh().analyzeColumns(spark, Seq("o_orderkey"))
    val snap1 = t.currentSnapshotId
    val ndv1 = LakeTable.parseColStats(t.colStatsJson.get)("o_orderkey")._1

    // repeated ANALYZE on the SAME snapshot replaces its entry — the
    // metadata document does not grow with analyze repetitions
    val sizeAfterFirst = graft.lake.MetadataJson.write(t.metadata).length
    (1 to 3).foreach(_ => t.refresh().analyzeColumns(spark, Seq("o_orderkey")))
    assert(t.metadata.statsFiles.size === 1)
    val sizeAfterRepeats = graft.lake.MetadataJson.write(t.metadata).length
    assert(math.abs(sizeAfterRepeats - sizeAfterFirst) <= 8,
      s"metadata grew across repeated ANALYZE: $sizeAfterFirst -> $sizeAfterRepeats")

    // a second snapshot with different data, analyzed again
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") >= 500))
    t.refresh().analyzeColumns(spark, Seq("o_orderkey"))
    val snap2 = t.currentSnapshotId
    assert(snap2 !== snap1)
    assert(t.metadata.statsFiles.size === 2)
    val ndv2 = LakeTable.parseColStats(t.colStatsJson.get)("o_orderkey")._1
    assert(ndv2 > ndv1 * 2, s"snapshot-2 NDV $ndv2 should dwarf snapshot-1 $ndv1")

    // each snapshot serves ITS OWN blob; an unanalyzed snapshot serves none
    assert(LakeTable.parseColStats(
      t.colStatsJsonFor(snap1).get)("o_orderkey")._1 === ndv1)
    assert(LakeTable.parseColStats(
      t.colStatsJsonFor(snap2).get)("o_orderkey")._1 === ndv2)
    assert(t.colStatsJsonFor(snap1 - 999).isEmpty)

    // survives a cold reopen (the list is in the metadata document)
    val t2 = LakeCatalog.open(wh).loadTable("ns2", "t2")
    assert(t2.metadata.statsFiles.size === 2)
    assert(LakeTable.parseColStats(
      t2.colStatsJsonFor(snap1).get)("o_orderkey")._1 === ndv1)
  }

  test("expiry dereferences a dropped snapshot's stats file; the sweep reclaims it") {
    val wh = freshWarehouse()
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns3", "t3", ordersDF.schema)
    t.appendData(ordersDF.filter(col("o_orderkey") < 500))
    t.refresh().analyzeColumns(spark, Seq("o_orderkey"))
    val snap1 = t.currentSnapshotId
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") >= 500))
    t.refresh().analyzeColumns(spark, Seq("o_orderkey"))
    assert(t.metadata.statsFiles.size === 2)
    val oldDoc = t.metadata.statsFiles.find(_.snapshotId == snap1).get.name

    // expiring snapshot 1 drops its stats entry in the same commit...
    assert(t.expireSnapshots(keepLast = 1) === Seq(snap1))
    assert(t.metadata.statsFiles.map(_.snapshotId) === Seq(t.currentSnapshotId))
    assert(t.colStatsJsonFor(snap1).isEmpty)
    // ...and the dereferenced document becomes sweepable
    val removed = t.removeOrphanFiles()
    assert(removed.exists(_.endsWith(oldDoc)), s"expected $oldDoc in $removed")
    // the surviving snapshot's stats doc is untouched and still serves
    assert(t.colStatsJson.isDefined)
  }

  test("AS OF handles serve pinned-snapshot stats and bounds, not current") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.cst2", classOf[LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.cst2.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("CREATE NAMESPACE cst2.ns")
      spark.sql(s"CREATE TABLE cst2.ns.t (${ordersDF.schema.toDDL})")
      val t = LakeCatalog.open(wh).loadTable("ns", "t")
      t.appendData(ordersDF.filter(col("o_orderkey") < 500))
      t.refresh().analyzeColumns(spark, Seq("o_orderkey"))
      val snap1 = t.currentSnapshotId
      t.refresh().appendData(ordersDF.filter(col("o_orderkey") >= 500))
      t.refresh().analyzeColumns(spark, Seq("o_orderkey"))

      def keyStats(df: org.apache.spark.sql.DataFrame) = {
        val byName = df.queryExecution.optimizedPlan.stats.attributeStats
          .map { case (a, s) => a.name -> s }
        byName.get("o_orderkey")
      }
      // historical read: NDV ~ 500 and manifest bounds of the PINNED
      // snapshot (max 499), not the current table's 1499
      val hist = keyStats(
        spark.sql(s"SELECT * FROM cst2.ns.t VERSION AS OF $snap1"))
      assert(hist.exists(_.max.contains(499L)),
        s"historical bounds should end at 499, got ${hist.map(_.max)}")
      assert(hist.exists(_.distinctCount.exists(d =>
        math.abs(d.toLong - 500L) <= 50L)))
      // current read still sees the full span
      val cur = keyStats(spark.table("cst2.ns.t"))
      assert(cur.exists(_.max.contains(1499L)))
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.catalog.cst2")
      spark.conf.unset("spark.sql.catalog.cst2.warehouse")
    }
  }
}
