package graft.lake

import org.apache.spark.sql.functions._

/** Merge-on-read positional deletes: deleteWhereMoR writes (file_path,
  * pos) tombstones instead of rewriting data files; scans subtract them
  * with a broadcast anti-join; compact() materializes them back into
  * clean files. This is the path that moves the reference's delete-file
  * meters (totalDeleteFiles / totalPositionalDeletes,
  * IntegrationTest.java:109,112,115) off zero. */
class MoRDeleteSpec extends LakeSuite {

  private def statuses(t: LakeTable) =
    t.refresh().newScan().toDF(spark)

  test("MoR delete: tombstones instead of rewrites; scans subtract; time travel survives") {
    val metrics = new SimpleMetrics
    val cat = LakeCatalog.open(freshWarehouse(), metrics)
    val t = cat.createTable("ns", "mor", ordersDF.schema)
    val first = t.appendData(ordersDF, numFiles = 4)
    val before = t.refresh().metadata.currentFiles.map(_.path).sorted
    val expectedDeleted = ordersDF.filter(col("o_orderstatus") === "F").count()

    val report = t.deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))

    // NOT copy-on-write: every data file survives untouched
    assert(t.refresh().metadata.currentFiles.map(_.path).sorted === before)
    // the delete meters are REAL now
    assert(report.totalDeleteFiles >= 1L)
    assert(report.totalPositionalDeletes === expectedDeleted)
    assert(metrics.counterValue("lake.commitReport.totalPositionalDeletes", "ns.mor")
      === expectedDeleted)
    // scans subtract the tombstoned rows...
    assert(statuses(t).filter(col("o_orderstatus") === "F").count() === 0L)
    assert(statuses(t).count() === ordersDF.count() - expectedDeleted)
    // ...stats pruning still works on the survivors
    assert(t.newScan(LakePredicate.Eq("o_orderstatus", "O")).toDF(spark).count()
      === ordersDF.filter(col("o_orderstatus") === "O").count())
    // time travel to the pre-delete snapshot sees every row
    assert(t.asOf(first.snapshotId).toDF(spark).count() === ordersDF.count())
  }

  test("stacked MoR deletes stay minimal and exact; CoW ops do not resurrect") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mor2", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    // second delete OVERLAPS the first (all F rows have totalprice too):
    // already-tombstoned coordinates must not be re-recorded
    val r2 = t.refresh().deleteWhereMoR(spark,
      LakePredicate.Ge("o_totalprice", Double.box(300000.0)))
    val survivors = ordersDF.filter(
      !(col("o_orderstatus") === "F" || col("o_totalprice") >= 300000.0))
    assert(r2.totalPositionalDeletes === ordersDF.count() - survivors.count())
    assert(statuses(t).count() === survivors.count())

    // a copy-on-write UPDATE over files carrying tombstones must apply
    // them while rewriting — a raw rewrite would resurrect deleted rows
    t.refresh().updateWhere(spark, LakePredicate.Eq("o_orderstatus", "O"),
      Map("o_orderpriority" -> lit("9-MOR")))
    val after = statuses(t)
    assert(after.count() === survivors.count())
    assert(after.filter(col("o_orderstatus") === "F").count() === 0L)
    assert(after.filter(col("o_orderstatus") === "O")
      .filter(col("o_orderpriority") =!= "9-MOR").count() === 0L)
  }

  test("compact materializes tombstones: clean files, delete meters back to 0") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mor3", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 4)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    val expected = ordersDF.filter(col("o_orderstatus") =!= "F")

    val report = t.refresh().compact(spark, targetFiles = 2)
    assert(report.totalDeleteFiles === 0L)
    assert(report.totalPositionalDeletes === 0L)
    assert(statuses(t).count() === expected.count())
    assert(statuses(t).filter(col("o_orderstatus") === "F").count() === 0L)
    // the tombstone parquet files are unreferenced after expiry: the
    // orphan sweep reclaims them
    t.expireSnapshots(keepLast = 1)
    assert(t.removeOrphanFiles().nonEmpty)
    assert(statuses(t).count() === expected.count())
  }

  test("changesSince and mergeInto respect live tombstones") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mor4", ordersDF.schema)
    val first = t.appendData(ordersDF.filter(col("o_orderkey") % 2 === 0))
    t.refresh().appendData(ordersDF.filter(col("o_orderkey") % 2 === 1))
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    // the CDC feed of post-snapshot files must not deliver rows a later
    // MoR delete tombstoned
    val changed = t.refresh().changesSince(spark, first.snapshotId)
    assert(changed.filter(col("o_orderstatus") === "F").count() === 0L)
    assert(changed.count() === ordersDF
      .filter(col("o_orderkey") % 2 === 1 && col("o_orderstatus") =!= "F").count())
    // a keyed merge over tombstone-carrying files keeps them deleted
    val upd = ordersDF.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.refresh().mergeInto(spark, upd, Seq("o_orderkey"))
    val out = statuses(t)
    // merged-in keys exist (upserted whatever their status); everything
    // else that was F stays gone
    assert(out.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 10 =!= 0)
      .count() === 0L)
    assert(out.filter(col("o_orderkey") % 10 === 0).count() === upd.count())
  }

  test("SQL scans subtract live tombstones: positional, equality, time travel") {
    val wh = freshWarehouse()
    spark.conf.set("spark.sql.catalog.sqlmor", classOf[sql.LakeSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqlmor.warehouse", wh)
    spark.sql("CREATE NAMESPACE sqlmor.ns")
    spark.sql(s"CREATE TABLE sqlmor.ns.t (${ordersDF.schema.toDDL})")
    val t = LakeCatalog.open(wh).loadTable("ns", "t")
    t.appendData(ordersDF, numFiles = 2)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    val survivors = ordersDF.filter(col("o_orderstatus") =!= "F").count()

    // the substitution rule re-plans the relation onto readLive: SQL
    // reads are correct WHILE the tombstones are live — no compact
    assert(spark.sql("SELECT count(*) FROM sqlmor.ns.t").head.getLong(0) === survivors)
    assert(spark.sql(
      "SELECT count(*) FROM sqlmor.ns.t WHERE o_orderstatus = 'F'").head.getLong(0) === 0L)
    // filters + projection resolve and push through the substituted plan
    assert(spark.sql(
      """SELECT o_orderstatus, count(*) AS n FROM sqlmor.ns.t
        |WHERE o_totalprice >= 0 GROUP BY o_orderstatus""".stripMargin)
      .collect().map(_.getString(0)).sorted === Array("O", "P"))

    // equality tombstones: a MoR upsert's replacements win in SQL too
    val upd = ordersDF.filter(col("o_orderkey") % 10 === 0 && col("o_orderstatus") =!= "F")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.refresh().mergeIntoMoR(spark, upd, Seq("o_orderkey"))
    val viaSql = spark.sql("SELECT sum(o_totalprice) FROM sqlmor.ns.t").head.getDouble(0)
    val viaApi = t.refresh().newScan().toDF(spark)
      .agg(org.apache.spark.sql.functions.sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(viaSql - viaApi) <= 1e-9 * math.abs(viaApi))
    assert(spark.sql("SELECT count(*) FROM sqlmor.ns.t").head.getLong(0) === survivors)

    // VERSION AS OF a tombstoned snapshot stays MoR-aware even after
    // compact() has materialized the current snapshot clean
    val tombstoned = t.refresh().currentSnapshotId
    t.refresh().compact(spark, targetFiles = 1)
    assert(spark.sql("SELECT count(*) FROM sqlmor.ns.t").head.getLong(0) === survivors)
    assert(spark.sql(
      s"SELECT count(*) FROM sqlmor.ns.t VERSION AS OF $tombstoned").head.getLong(0)
      === survivors)
  }

  test("without the extensions the scan builder still refuses live tombstones") {
    val cat = LakeCatalog.open(freshWarehouse())
    val t = cat.createTable("ns", "mor5", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 2)
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    // the raw DSv2 builder path (what a session WITHOUT
    // LakeSqlExtensions would run) must keep the loud refusal — handing
    // file paths to the parquet source would resurrect deleted rows.
    // The refusal fires when the scan is consumed AS A BATCH (toBatch):
    // build() itself stays lazy so a STREAMING read over the same
    // table — which tails appends and never reads tombstoned files —
    // starts without paying batch planning or hitting this refusal.
    val scan = new sql.LakeSqlTable(t.refresh())
      .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build()
    val e = intercept[UnsupportedOperationException](scan.toBatch)
    assert(e.getMessage.contains("LakeSqlExtensions"))
  }

  test("MoR deletes survive a warehouse path with URL-encodable characters") {
    // manifest paths render unencoded (FileStatus) while the reader's
    // _metadata.file_path renders url-encoded — on a path with a space
    // an unnormalized join resurrects every MoR-deleted row silently
    val wh = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(freshWarehouse(), "my lake")).toString
    val cat = LakeCatalog.open(wh)
    val t = cat.createTable("ns", "sp", ordersDF.schema)
    t.appendData(ordersDF, numFiles = 3)
    val nF = ordersDF.filter(org.apache.spark.sql.functions
      .col("o_orderstatus") === "F").count()
    // positional tombstones
    t.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    assert(t.refresh().newScan().toDF(spark).count() === ordersDF.count() - nF)
    // equality tombstones (strictly-older seq scoping joins on paths too)
    val upd = ordersDF.filter(org.apache.spark.sql.functions
      .col("o_orderstatus") === "O").limit(5)
      .withColumn("o_totalprice", org.apache.spark.sql.functions.lit(1.0))
    t.refresh().mergeIntoMoR(spark, upd, Seq("o_orderkey"))
    val got = t.refresh().newScan().toDF(spark)
      .filter(org.apache.spark.sql.functions.col("o_totalprice") === 1.0).count()
    assert(got === 5L, "equality tombstones must apply under an encodable path")
    assert(t.refresh().newScan().toDF(spark).count() === ordersDF.count() - nF)
    // DV bitmaps too
    val tv = cat.createTable("ns", "spdv", ordersDF.schema)
    tv.setProperty("write.delete.vector.enabled", "true")
    tv.refresh().appendData(ordersDF, numFiles = 3)
    tv.refresh().deleteWhereMoR(spark, LakePredicate.Eq("o_orderstatus", "F"))
    assert(tv.refresh().newScan().toDF(spark).count() === ordersDF.count() - nF)
  }
}
